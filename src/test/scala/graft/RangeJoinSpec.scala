package graft

import org.apache.spark.sql.functions._

import graft.operators.RangeJoin

/** [[graft.operators.RangeJoin]] — semantics pinned against the
  * brute-force cross-join-filter mirror it exists to avoid, plus
  * boundary inclusivity, the exactly-once guarantee for intervals that
  * span many buckets, keyed joins, and the equi-join (no
  * nested-loop/cartesian) plan-shape contract. */
class RangeJoinSpec extends SparkSpec {
  import spark.implicits._

  test("boundary inclusivity and exactly-once across bucket spans") {
    // interval [10, 95] spans many width-10 buckets; points at the exact
    // start, inside, at the exact end, and one off each end.
    val pts = Seq(9L, 10L, 50L, 95L, 96L).map(Tuple1(_)).toDF("p")
    val ivs = Seq((10L, 95L, 1L), (200L, 200L, 2L)).toDF("s", "e", "iid")
    val got = RangeJoin.rangeJoin(pts, ivs, Nil, "p", "s", "e", 10L)
      .select("p", "iid").collect().map(r => (r.getLong(0), r.getLong(1)))
      .toSeq.sorted
    // each in-range point matches ONCE despite the interval living in 10
    // bucket copies; 9 and 96 miss; the degenerate [200,200] matches none
    assert(got === Seq((10L, 1L), (50L, 1L), (95L, 1L)))
  }

  test("matches brute-force cross-filter mirror on random keyed data") {
    val rnd = new scala.util.Random(11)
    val pts = (1 to 400).map(i =>
      (rnd.nextInt(5).toLong, rnd.nextInt(1000).toLong, i.toLong))
      .toDF("k", "p", "pid")
    val ivs = (1 to 200).map { i =>
      val s = rnd.nextInt(1000).toLong
      (rnd.nextInt(5).toLong, s, s + rnd.nextInt(80).toLong, i.toLong)
    }.toDF("k", "s", "e", "iid")
    val got = RangeJoin.rangeJoin(pts, ivs, Seq("k"), "p", "s", "e", 32L)
      .select("pid", "iid").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val is = ivs.collect().map(r =>
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val want = pts.collect().flatMap { r =>
      val (k, p, pid) = (r.getLong(0), r.getLong(1), r.getLong(2))
      is.filter(c => c._1 == k && c._2 <= p && p <= c._3)
        .map(c => (pid, c._4))
    }.toSet
    assert(got === want)
    assert(want.nonEmpty)
  }

  test("mirror holds without keys (global temporal join)") {
    val rnd = new scala.util.Random(13)
    val pts = (1 to 100).map(i => (rnd.nextInt(500).toLong, i.toLong))
      .toDF("p", "pid")
    val ivs = (1 to 60).map { i =>
      val s = rnd.nextInt(500).toLong
      (s, s + rnd.nextInt(50).toLong, i.toLong)
    }.toDF("s", "e", "iid")
    val got = RangeJoin.rangeJoin(pts, ivs, Nil, "p", "s", "e", 64L)
      .select("pid", "iid").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val is = ivs.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val want = pts.collect().flatMap { r =>
      val (p, pid) = (r.getLong(0), r.getLong(1))
      is.filter(c => c._1 <= p && p <= c._2).map(c => (pid, c._3))
    }.toSet
    assert(got === want)
  }

  test("negative bounds: floor-division buckets keep origin-straddlers") {
    // interval [-15, 14] straddles the origin; truncating `div` would put
    // -15 in bucket -1 (or 0) and 14 in bucket 1 inconsistently with the
    // points' buckets and drop matches. Mirror over negatives pins it.
    val pts = Seq(-16L, -15L, -10L, -1L, 0L, 14L, 15L).map(Tuple1(_))
      .toDF("p")
    val ivs = Seq((-15L, 14L, 1L), (-40L, -30L, 2L)).toDF("s", "e", "iid")
    val got = RangeJoin.rangeJoin(pts, ivs, Nil, "p", "s", "e", 10L)
      .select("p", "iid").collect().map(r => (r.getLong(0), r.getLong(1)))
      .toSeq.sorted
    assert(got === Seq((-15L, 1L), (-10L, 1L), (-1L, 1L), (0L, 1L),
      (14L, 1L)))
  }

  test("plan: equi join, no nested-loop or cartesian") {
    val pts = Seq((1L, 10L)).toDF("k", "p")
    val ivs = Seq((1L, 5L, 15L)).toDF("k", "s", "e")
    val df = RangeJoin.rangeJoin(pts, ivs, Seq("k"), "p", "s", "e", 10L)
    // sparkPlan (pre-AQE) is where join strategy choice is visible
    val plan = df.queryExecution.sparkPlan.toString
    assert(!plan.contains("BroadcastNestedLoop") && !plan.contains("Cartesian"),
      s"range join must plan as an equi join:\n$plan")
    assert(plan.contains("Join"), s"expected a join operator in:\n$plan")
  }
}
