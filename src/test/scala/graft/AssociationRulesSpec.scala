package graft

import graft.operators.AssociationRules
import graft.operators.AssociationRules.Params
import org.apache.spark.sql.functions._

/** Golden-trace methodology mirrored from the reference's
  * `validate_results.py:19-170` / `simple_validation.py:35-229`: recompute
  * one rule's metrics from first-principles counts and assert the operator
  * reproduces them, plus the invariants the reference states. */
class AssociationRulesSpec extends SparkSpec {
  import spark.implicits._

  // 8 baskets; items A,B co-occur in 4; A appears in 6; B in 5.
  private def fixture = Seq(
    (1L, "A"), (1L, "B"), (1L, "C"),
    (2L, "A"), (2L, "B"),
    (3L, "A"), (3L, "B"), (3L, "D"),
    (4L, "A"), (4L, "B"),
    (5L, "A"), (5L, "C"),
    (6L, "A"), (6L, "D"),
    (7L, "B"), (7L, "C"),
    (8L, "C"), (8L, "D")
  ).toDF("basket_id", "item")

  test("golden trace: support/confidence/lift from first principles") {
    val rules = AssociationRules.rules(fixture, "basket_id", "item",
      Params(minSupport = 0.0, minConfidence = 0.0, maxRules = 100))
    val ab = rules.where($"item_a" === "A" && $"item_b" === "B").head()
    // support = 4/8, confidence = 4/6, lift = (4/6)/(5/8)
    assert(ab.getAs[Long]("pair_baskets") == 4L)
    assert(math.abs(ab.getAs[Double]("support") - 0.5) < 1e-9)
    assert(math.abs(ab.getAs[Double]("confidence") - 4.0 / 6.0) < 1e-6)
    assert(math.abs(ab.getAs[Double]("lift") - (4.0 / 6.0) / (5.0 / 8.0))
      < 1e-6)
  }

  test("invariants: 0 <= support <= confidence <= 1, lift >= 0") {
    val rows = AssociationRules.rules(fixture, "basket_id", "item",
      Params(0.0, 0.0, 100)).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (s, c, l) = (r.getAs[Double]("support"),
        r.getAs[Double]("confidence"), r.getAs[Double]("lift"))
      assert(s >= 0 && s <= c + 1e-9 && c <= 1 + 1e-9 && l >= 0)
    }
  }

  test("bothDirections skips the reverse rule when confidences are equal") {
    // views.py:310 bug-compatible: b->a emitted only if conf_b != conf_a
    val raw = AssociationRules.rulesRaw(fixture, "basket_id", "item",
      Params(0.0, 0.0, 100))
    val both = AssociationRules.bothDirections(raw, 0.0)
    // C,D: pair 1; C in 4 baskets, D in 3 -> conf differ -> both directions
    assert(both.where($"antecedent" === "C" && $"consequent" === "D")
      .count() == 1)
    assert(both.where($"antecedent" === "D" && $"consequent" === "C")
      .count() == 1)
    // symmetric-confidence pair emits once: craft one
    val sym = Seq((1L, "X"), (1L, "Y"), (2L, "X"), (2L, "Y"))
      .toDF("basket_id", "item")
    val symBoth = AssociationRules.bothDirections(
      AssociationRules.rulesRaw(sym, "basket_id", "item",
        Params(0.0, 0.0, 10)), 0.0)
    assert(symBoth.count() == 1)
  }

  test("pairCounts equals per-basket combinations") {
    val pc = AssociationRules.pairCounts(fixture, "basket_id", "item")
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2))
      .toMap
    assert(pc(("A", "B")) == 4L && pc(("A", "C")) == 2L
      && pc(("C", "D")) == 1L)
  }

  test("maxBasketSize caps pathological baskets") {
    val big = (1 to 50).map(i => (1L, s"I$i")) ++ Seq((2L, "A"), (2L, "B"))
    val pc = AssociationRules.pairCounts(big.toDF("basket_id", "item"),
      "basket_id", "item", maxBasketSize = 10)
    assert(pc.count() == 1) // only basket 2 survives the cap
  }

  test("tripleRules equals FP-Growth's 2-antecedent slice exactly") {
    // the two implementations share NO code path (relational triples vs
    // MLlib's PFP tree traversal) — agreement cross-validates both. On
    // this fixture every basket has 2-3 items, so neither side's
    // basket-size filter binds and the totals coincide.
    def key(ant: Seq[String], cons: Seq[String]) =
      (ant.sorted.mkString(","), cons.mkString(","))
    val fp = AssociationRules.fpGrowthRules(fixture, "basket_id", "item",
        Params(minSupport = 0.1, minConfidence = 0.05))
      .where(size($"antecedent") === 2 && size($"consequent") === 1)
      .collect().map { r =>
        key(r.getSeq[String](0), r.getSeq[String](1)) ->
          (r.getAs[Double]("support"), r.getAs[Double]("confidence"),
            r.getAs[Double]("lift"))
      }.toMap
    val tr = AssociationRules.tripleRules(fixture, "basket_id", "item",
        Params(minSupport = 0.1, minConfidence = 0.05, maxRules = 1000))
      .collect().map { r =>
        key(r.getSeq[String](0), r.getSeq[String](1)) ->
          (r.getAs[Double]("support"), r.getAs[Double]("confidence"),
            r.getAs[Double]("lift"))
      }.toMap
    assert(tr.keySet == fp.keySet, s"rule sets differ: $tr vs $fp")
    assert(tr.nonEmpty)
    tr.foreach { case (k, (s, c, l)) =>
      val (fs, fc, fl) = fp(k)
      assert(math.abs(s - fs) < 1e-6 && math.abs(c - fc) < 1e-6 &&
        math.abs(l - fl) < 1e-6, s"metrics differ at $k")
    }
  }

  test("rulesFamily reproduces rules/bothDirections/rulesAmongEligible " +
      "exactly, family by family") {
    import graft.functions.ColumnFns.stableRound
    val p = Params(0.0, 0.0, 100, 2000, 500)
    def key(rows: Array[org.apache.spark.sql.Row]) = rows.map(r =>
      (r.getAs[String]("antecedent"), r.getAs[String]("consequent")) ->
        (r.getAs[Double]("support"), r.getAs[Double]("confidence"),
          r.getAs[Double]("lift"))).toMap
    val fam = AssociationRules.rulesFamily(fixture, "basket_id", "item",
      2L, 3, p).cache()
    val fwd = key(fam.where($"family" === "fwd").collect())
    val rev = key(fam.where($"family" === "rev").collect())
    val elig = key(fam.where($"family" === "eligible").collect())
    val wantFwd = key(AssociationRules.rules(fixture, "basket_id", "item", p)
      .select($"item_a".as("antecedent"), $"item_b".as("consequent"),
        $"support", $"confidence", $"lift").collect())
    val both = AssociationRules.bothDirections(
      AssociationRules.rulesRaw(fixture, "basket_id", "item", p), 0.0)
      .select($"antecedent", $"consequent",
        stableRound($"support", 6).as("support"),
        stableRound($"confidence", 6).as("confidence"),
        stableRound($"lift", 6).as("lift")).collect()
    val wantRev = key(both).view
      .filterKeys(k => !wantFwd.contains(k)).toMap
    val wantElig = key(AssociationRules.rulesAmongEligible(fixture,
      "basket_id", "item", 2L, 3, p)
      .select($"item_a".as("antecedent"), $"item_b".as("consequent"),
        $"support", $"confidence", $"lift").collect())
    assert(fwd == wantFwd)
    assert(rev == wantRev)
    assert(elig == wantElig)
    fam.unpersist()
  }

  test("fpGrowthPairRules equals MLlib FP-Growth's 1-antecedent slice " +
      "exactly") {
    // the native relational plan and MLlib's PFP traversal share NO code
    // path — agreement cross-validates both (the tripleRules precedent).
    // Every metric compared at full double precision: both sides divide
    // the same exact integer counts.
    val p = Params(minSupport = 0.1, minConfidence = 0.05)
    def key(a: String, b: String) = (a, b)
    val fp = AssociationRules.fpGrowthRules(fixture, "basket_id", "item", p)
      .where(size($"antecedent") === 1 && size($"consequent") === 1)
      .collect().map { r =>
        key(r.getSeq[String](0).head, r.getSeq[String](1).head) ->
          (r.getAs[Double]("support"), r.getAs[Double]("confidence"),
            r.getAs[Double]("lift"))
      }.toMap
    val nat = AssociationRules.fpGrowthPairRules(fixture, "basket_id",
        "item", p)
      .collect().map { r =>
        key(r.getAs[String]("antecedent"), r.getAs[String]("consequent")) ->
          (r.getAs[Double]("support"), r.getAs[Double]("confidence"),
            r.getAs[Double]("lift"))
      }.toMap
    assert(nat.keySet == fp.keySet, s"rule sets differ: $nat vs $fp")
    assert(nat.nonEmpty)
    nat.foreach { case (k, (s, c, l)) =>
      val (fs, fc, fl) = fp(k)
      assert(s == fs && c == fc && l == fl, s"metrics differ at $k")
    }
  }

  test("FPGrowth agrees with pairwise confidence on single-item antecedents") {
    val fp = AssociationRules.fpGrowthRules(fixture, "basket_id", "item",
      Params(minSupport = 0.1, minConfidence = 0.1))
      .where(size($"antecedent") === 1 && size($"consequent") === 1)
      .select(element_at($"antecedent", 1).as("a"),
        element_at($"consequent", 1).as("b"), $"confidence")
    val ab = fp.where($"a" === "A" && $"b" === "B").head()
    assert(math.abs(ab.getAs[Double]("confidence") - 4.0 / 6.0) < 1e-6)
  }
}
