package graft.operators

import org.apache.spark.ml.fpm.FPGrowth
import graft.functions.ColumnFns.stableRound
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Association-rule mining — the reference's signature workload
  * (SURVEY §2.10 R1–R4; `Website/market/dunnhumby/views.py:133-348`,
  * `analytics.py:15-184`).
  *
  * Metric definitions (identical across the reference's three
  * implementations, `views.py:271-339`):
  *   support    = pair_baskets / total_baskets
  *   confidence = pair_baskets / antecedent_baskets
  *   lift       = confidence / (consequent_baskets / total_baskets)
  *
  * Spark-first design: instead of the reference's O(rows²) SQL self-join on
  * basket_id (`views.py:206-216` J2), we group once per basket
  * (`collect_set`) and explode ordered combinations with native array
  * lambdas — ONE shuffle on the basket key, map-side partial aggregation on
  * the pair key, and no join until the (tiny, broadcast) per-item counts
  * attach. Per-basket combination count is bounded by basket size²;
  * `maxBasketSize` caps pathological baskets (SURVEY §7.5#8) the way the
  * reference caps candidates (TOP 2000, `views.py:199`).
  */
object AssociationRules {

  final case class Params(
      minSupport: Double = 0.01,
      minConfidence: Double = 0.2,
      maxRules: Int = 100,
      pairLimit: Int = 2000,
      maxBasketSize: Int = 500)

  /** Distinct (basket, item) pairs — the grain at which the reference counts
    * support (DISTINCT basket join, `views.py:218-233`). */
  def itemsets(tx: DataFrame, basket: String, item: String): DataFrame =
    tx.select(col(basket).as("basket"), col(item).as("item"))
      .where(col(item).isNotNull)
      .distinct()

  /** Per-basket sorted distinct item arrays — the reference's streamed
    * per-basket state machine (`views.py:461-479`) collapses to one
    * `groupBy(basket).agg(collect_set)`. */
  def basketItems(tx: DataFrame, basket: String, item: String,
                  maxBasketSize: Int = 500): DataFrame =
    itemsets(tx, basket, item)
      .groupBy(col("basket"))
      .agg(array_sort(collect_set(col("item"))).as("items"))
      .where(size(col("items")).between(2, maxBasketSize))

  /** Ordered-pair counts: for each basket explode all combinations (a < b)
    * of its sorted item set — the Spark-native form of the reference's
    * `itertools.combinations` loop (`views.py:456-459`) and of its
    * pair-mining self-join (J2). Pure array lambdas → stays in whole-stage
    * codegen; no UDF, no Generator class. */
  def pairCounts(tx: DataFrame, basket: String, item: String,
                 maxBasketSize: Int = 500): DataFrame =
    explodePairs(basketItems(tx, basket, item, maxBasketSize))

  /** Per-item distinct-basket counts (`views.py:218-233` J3 inputs). */
  def itemBasketCounts(tx: DataFrame, basket: String, item: String): DataFrame =
    itemsets(tx, basket, item)
      .groupBy(col("item"))
      .agg(count(lit(1)).as("item_baskets"))

  /** Unrounded rule metrics plus the raw counts, a→b direction only.
    * All ratio inputs are exact integer counts, so the double arithmetic is
    * bit-deterministic. */
  def rulesRaw(tx: DataFrame, basket: String, item: String,
               params: Params = Params()): DataFrame = {
    // One materialization of the (basket, item) grain feeds all three
    // consumers (total count, pair counts, item counts) — without the cache
    // this input would be scanned and shuffled three times (a 3× tax at
    // 100 TB). Spark LRU-evicts the block when memory is needed.
    val is = itemsets(tx, basket, item).cache()
    val totalBaskets = is.select(col("basket")).distinct().count()
    // min_basket_count = max(1, floor(total * minSupport)) — views.py:163-189
    val minPair =
      math.max(1L, math.floor(totalBaskets * params.minSupport).toLong)

    val baskets = is
      .groupBy(col("basket"))
      .agg(array_sort(collect_set(col("item"))).as("items"))
      .where(size(col("items")).between(2, params.maxBasketSize))
    val pairs = explodePairs(baskets)
      .where(col("pair_baskets") >= minPair)
      .orderBy(col("pair_baskets").desc, col("item_a").asc, col("item_b").asc)
      .limit(params.pairLimit)
    val counts = is.groupBy(col("item")).agg(count(lit(1)).as("item_baskets"))

    val tot = lit(totalBaskets)
    pairs
      .join(broadcast(counts.toDF("item_a", "a_baskets")), Seq("item_a"))
      .join(broadcast(counts.toDF("item_b", "b_baskets")), Seq("item_b"))
      .withColumn("total_baskets", tot)
      .withColumn("support", col("pair_baskets").cast("double") / tot)
      .withColumn("confidence",
        col("pair_baskets").cast("double") / col("a_baskets"))
      .withColumn("confidence_rev",
        col("pair_baskets").cast("double") / col("b_baskets"))
      .withColumn("lift",
        (col("pair_baskets").cast("double") / col("a_baskets")) /
          (col("b_baskets").cast("double") / tot))
      .withColumn("lift_rev",
        (col("pair_baskets").cast("double") / col("b_baskets")) /
          (col("a_baskets").cast("double") / tot))
  }

  /** Explode each basket's sorted item array into ordered (a < b) pairs and
    * count — shared by [[pairCounts]] and [[rulesRaw]]. */
  private def explodePairs(baskets: DataFrame): DataFrame =
    baskets
      .select(explode(expr(
        """flatten(transform(items, (x, i) ->
          |  transform(slice(items, i + 2, size(items)), y ->
          |    named_struct('item_a', x, 'item_b', y))))""".stripMargin))
        .as("p"))
      .select(col("p.item_a"), col("p.item_b"))
      .groupBy(col("item_a"), col("item_b"))
      .agg(count(lit(1)).as("pair_baskets"))

  /** R1 — pairwise rules at any item granularity (product / commodity /
    * department = whatever `item` column the caller passes,
    * `analytics.py:50`), a→b direction, rounded, sorted by lift desc with
    * deterministic tiebreaks, top maxRules (`views.py:341-344` T4). */
  def rules(tx: DataFrame, basket: String, item: String,
            params: Params = Params()): DataFrame =
    rulesRaw(tx, basket, item, params)
      .where(col("confidence") >= params.minConfidence)
      .select(col("item_a"), col("item_b"),
        col("pair_baskets"), col("a_baskets"), col("b_baskets"),
        stableRound(col("support"), 6).as("support"),
        stableRound(col("confidence"), 6).as("confidence"),
        stableRound(col("lift"), 6).as("lift"))
      .orderBy(col("lift").desc, col("item_a").asc, col("item_b").asc)
      .limit(params.maxRules)

  /** T3/R2 — eligible-item prefilter: items appearing in at least
    * `minBaskets` baskets, top `limit` by basket count (the reference's
    * support-pushdown before dept/commodity pair streaming,
    * `views.py:414-428`, caps `views.py:368-369`). An explicit exploitation
    * of Apriori downward closure that Catalyst cannot invent (SURVEY §4). */
  def eligibleItems(tx: DataFrame, basket: String, item: String,
                    minBaskets: Long, limit: Int): DataFrame =
    itemBasketCounts(tx, basket, item)
      .where(col("item_baskets") >= minBaskets)
      .orderBy(col("item_baskets").desc, col("item").asc)
      .limit(limit)

  /** R2 — rules restricted to an eligible-item set: the (basket, item)
    * grain is semi-joined against the broadcast eligible list BEFORE any
    * pair explosion. */
  def rulesAmongEligible(tx: DataFrame, basket: String, item: String,
                         minBaskets: Long, eligibleLimit: Int,
                         params: Params = Params()): DataFrame = {
    val eligible = eligibleItems(tx, basket, item, minBaskets, eligibleLimit)
      .select(col("item").as(item))
    val restricted = tx.join(broadcast(eligible), Seq(item), "left_semi")
    rules(restricted, basket, item, params)
  }

  /** Dual-direction emission: the reference emits a→b always and b→a only
    * when the two confidences differ (`views.py:310`, `views.py:502` —
    * bug-compatible per SURVEY §7.5#3). Input: `rulesRaw` output. */
  def bothDirections(raw: DataFrame, minConfidence: Double): DataFrame = {
    // the union's two branches would otherwise each recompute the whole
    // mining pipeline behind `raw`; the rule table is ≤ pairLimit rows,
    // so pinning it costs nothing and halves the work
    raw.cache()
    val fwd = raw.select(
      col("item_a").as("antecedent"), col("item_b").as("consequent"),
      col("support"), col("confidence"), col("lift"))
    val rev = raw
      .where(col("confidence_rev") =!= col("confidence"))
      .select(
        col("item_b").as("antecedent"), col("item_a").as("consequent"),
        col("support"),
        col("confidence_rev").as("confidence"),
        col("lift_rev").as("lift"))
    fwd.unionByName(rev).where(col("confidence") >= minConfidence)
  }

  /** Explode each basket's sorted item array into ordered (a < b < c)
    * triples and count — the 3-item analogue of [[explodePairs]], same
    * codegen'd array-lambda shape. Size-2 baskets contribute nothing. */
  private def explodeTriples(baskets: DataFrame): DataFrame =
    baskets
      .select(explode(expr(
        """flatten(transform(items, (x, i) ->
          |  flatten(transform(slice(items, i + 2, size(items)), (y, j) ->
          |    transform(slice(items, i + j + 3, size(items)), z ->
          |      named_struct('item_a', x, 'item_b', y, 'item_c', z))))))"""
          .stripMargin))
        .as("t"))
      .select(col("t.item_a"), col("t.item_b"), col("t.item_c"))
      .groupBy(col("item_a"), col("item_b"), col("item_c"))
      .agg(count(lit(1)).as("triple_baskets"))

  /** R3' — 2-antecedent rules `[a,b] → c` from per-basket triples, the
    * FP-Growth rule shape (`analytics.py:15-184` mines multi-item
    * antecedents) computed with plain relational algebra so it stays
    * ANSI-SQL-expressible (unlike MLlib FP-Growth's traversal order):
    *   confidence = triple_baskets / pair_baskets(a,b)
    *   lift       = confidence / (c_baskets / total_baskets)
    * Same minSupport floor as [[rulesRaw]]
    * (`max(1, floor(total·minSupport))`), top `maxRules` by triple count
    * with full-key tiebreaks. Triple explosion is bounded by
    * `maxBasketSize`³/6 per basket; at coarse item grains (brand /
    * department, the reference's levels) baskets hold a handful of
    * distinct items, so the stream stays linear-ish. */
  def tripleRules(tx: DataFrame, basket: String, item: String,
                  params: Params = Params()): DataFrame = {
    val is = itemsets(tx, basket, item).cache()
    val totalBaskets = is.select(col("basket")).distinct().count()
    val minTriple =
      math.max(1L, math.floor(totalBaskets * params.minSupport).toLong)
    val baskets = is.groupBy(col("basket"))
      .agg(array_sort(collect_set(col("item"))).as("items"))
      .where(size(col("items")).between(2, params.maxBasketSize))
    val pairs = explodePairs(baskets)
    val counts = is.groupBy(col("item")).agg(count(lit(1)).as("item_baskets"))
    val tot = lit(totalBaskets)
    // every orientation of a frequent triple (a<b<c) is a rule — each
    // member as consequent with the other two as antecedent, exactly
    // FP-Growth's emission (tested equal in AssociationRulesSpec). The
    // two antecedents stay sorted in all three cases.
    val oriented = explodeTriples(baskets)
      .where(col("triple_baskets") >= minTriple)
      .select(explode(array(
          struct(col("item_a").as("ant1"), col("item_b").as("ant2"),
            col("item_c").as("cons")),
          struct(col("item_a").as("ant1"), col("item_c").as("ant2"),
            col("item_b").as("cons")),
          struct(col("item_b").as("ant1"), col("item_c").as("ant2"),
            col("item_a").as("cons")))).as("o"),
        col("triple_baskets"))
      .select(col("o.ant1"), col("o.ant2"), col("o.cons"),
        col("triple_baskets"))
    oriented
      .join(pairs.toDF("ant1", "ant2", "pair_baskets"), Seq("ant1", "ant2"))
      .join(broadcast(counts.toDF("cons", "c_baskets")), Seq("cons"))
      .withColumn("confidence",
        col("triple_baskets").cast("double") / col("pair_baskets"))
      .withColumn("lift",
        (col("triple_baskets").cast("double") / col("pair_baskets")) /
          (col("c_baskets").cast("double") / tot))
      .where(col("confidence") >= params.minConfidence)
      .orderBy(col("triple_baskets").desc, col("ant1").asc,
        col("ant2").asc, col("cons").asc)
      .limit(params.maxRules)
      .select(array(col("ant1"), col("ant2")).as("antecedent"),
        array(col("cons")).as("consequent"),
        col("triple_baskets"),
        stableRound(col("triple_baskets").cast("double") / tot, 6)
          .as("support"),
        stableRound(col("confidence"), 6).as("confidence"),
        stableRound(col("lift"), 6).as("lift"))
  }

  /** R3 — full multi-itemset mining via MLlib's parallel FP-Growth
    * (Han et al. SIGMOD'00; PFP, Li et al. RecSys'08) replacing the
    * reference's in-memory Apriori (`analytics.py:15-184`). */
  def fpGrowthRules(tx: DataFrame, basket: String, item: String,
                    params: Params = Params()): DataFrame = {
    val baskets = basketItems(tx, basket, item, params.maxBasketSize)
    new FPGrowth()
      .setItemsCol("items")
      .setMinSupport(params.minSupport)
      .setMinConfidence(params.minConfidence)
      .fit(baskets)
      .associationRules
  }
}
