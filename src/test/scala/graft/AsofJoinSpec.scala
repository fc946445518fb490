package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.functions._

import graft.operators.AsofJoin

/** [[graft.operators.AsofJoin]] — semantics pinned against a brute-force
  * range-join-then-pick mirror (the O(|L|·|R|) plan the operator exists to
  * avoid), plus the deterministic-ties, tolerance, forward-direction and
  * single-exchange plan-shape contracts. */
class AsofJoinSpec extends SparkSpec {
  import spark.implicits._

  private def left =
    Seq((1L, 100L, 10L), (1L, 200L, 11L), (1L, 50L, 12L),
        (2L, 100L, 20L), (3L, 100L, 30L))
      .toDF("k", "ts", "lid")

  private def right =
    Seq((1L, 90L, 1L, 9.0), (1L, 100L, 2L, 10.0), (1L, 100L, 3L, 11.0),
        (1L, 150L, 4L, 15.0), (2L, 300L, 5L, 30.0))
      .toDF("k", "ts", "rid", "v")
      .select(col("k"), col("ts"), col("rid"),
        col("ts").as("m_ts"), col("rid").as("m_rid"), col("v").as("m_v"))

  private def run(direction: String, tolOpt: Option[Long]) =
    AsofJoin.asofJoin(left, right, Seq("k"), "ts", "ts", "rid",
        Seq("m_ts", "m_rid", "m_v"), direction,
        tolOpt.map(lit(_)))
      .orderBy("k", "lid")
      .collect()
      .map(r => (r.getLong(0), r.getLong(2),
        if (r.isNullAt(4)) -1L else r.getLong(4)))

  test("backward: nearest at-or-before, greatest-rid tie, null miss") {
    // k=1 ts=100: rights at 90,100,100 → at-or-before picks ts=100, tie
    // rid 2 vs 3 → 3. ts=200 → ts=150 rid 4. ts=50 → none. k=2 ts=100:
    // right only at 300 (after) → null. k=3: no rights → null.
    assert(run("backward", None).toSeq ===
      Seq((1L, 10L, 3L), (1L, 11L, 4L), (1L, 12L, -1L),
          (2L, 20L, -1L), (3L, 30L, -1L)))
  }

  test("forward: nearest at-or-after, greatest-rid tie") {
    // k=1 ts=100 → at-or-after {100(2),100(3),150} → ts=100 tie → rid 3;
    // ts=200 → none; ts=50 → ts=90 rid 1. k=2 ts=100 → ts=300 rid 5.
    assert(run("forward", None).toSeq ===
      Seq((1L, 10L, 3L), (1L, 11L, -1L), (1L, 12L, 1L),
          (2L, 20L, 5L), (3L, 30L, -1L)))
  }

  test("tolerance nulls matches farther than the bound, keeps the row") {
    // backward tol=40: lid=11 (ts=200, match ts=150, gap 50) drops to
    // null; lid=10 (gap 0) survives. Row count unchanged (left outer).
    assert(run("backward", Some(40L)).toSeq ===
      Seq((1L, 10L, 3L), (1L, 11L, -1L), (1L, 12L, -1L),
          (2L, 20L, -1L), (3L, 30L, -1L)))
    // forward tol=40: lid=12 (ts=50 → 90, gap 40) still in (inclusive);
    // k=2 (gap 200) out.
    assert(run("forward", Some(40L)).toSeq ===
      Seq((1L, 10L, 3L), (1L, 11L, -1L), (1L, 12L, 1L),
          (2L, 20L, -1L), (3L, 30L, -1L)))
  }

  test("matches brute-force range-join mirror on random data") {
    val rnd = new scala.util.Random(7)
    val l = (1 to 300).map(i =>
      (rnd.nextInt(10).toLong, rnd.nextInt(1000).toLong, i.toLong))
      .toDF("k", "ts", "lid")
    val r = (1 to 300).map(i =>
      (rnd.nextInt(10).toLong, rnd.nextInt(1000).toLong, i.toLong,
        rnd.nextDouble()))
      .toDF("k", "ts", "rid", "v")
      .select(col("k"), col("ts"), col("rid"),
        col("rid").as("m_rid"), col("v").as("m_v"))
    val tol = 100L
    val got = AsofJoin.asofJoin(l, r, Seq("k"), "ts", "ts", "rid",
        Seq("m_rid", "m_v"), "backward", Some(lit(tol)))
      .select("k", "lid", "m_rid")
      .collect().map(x =>
        (x.getLong(0), x.getLong(1), if (x.isNullAt(2)) -1L else x.getLong(2)))
      .toSet
    // mirror: range join, pick max (ts, rid) per left row
    val rs = r.collect().map(x => (x.getLong(0), x.getLong(1), x.getLong(2)))
    val want = l.collect().map { x =>
      val (k, ts, lid) = (x.getLong(0), x.getLong(1), x.getLong(2))
      val cands = rs.filter(c => c._1 == k && c._2 <= ts && c._2 >= ts - tol)
      val pick = if (cands.isEmpty) -1L
        else cands.maxBy(c => (c._2, c._3))._3
      (k, lid, pick)
    }.toSet
    assert(got === want)
  }

  test("plan: exactly one exchange, no join operator") {
    val df = AsofJoin.asofJoin(left, right, Seq("k"), "ts", "ts", "rid",
      Seq("m_ts", "m_rid", "m_v"))
    // Execute first: exchanges are inserted by EnsureRequirements (absent
    // from sparkPlan), and under AQE the pre-execution executedPlan is a
    // single opaque AdaptiveSparkPlanExec leaf. After collect() the
    // adaptive plan prints its final tree.
    df.collect()
    // The adaptive string repeats the tree under "== Initial Plan ==" —
    // count only the final section.
    val plan = df.queryExecution.executedPlan.toString
      .split("== Initial Plan ==").head
    assert("Exchange hashpartitioning".r.findAllIn(plan).size === 1,
      s"want ONE key exchange in:\n$plan")
    assert(!plan.contains("Join") && !plan.contains("Cartesian"),
      s"as-of must not plan a join:\n$plan")
  }
}
