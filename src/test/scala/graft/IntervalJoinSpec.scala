package graft

import org.apache.spark.sql.functions._

import graft.operators.IntervalJoin

/** [[graft.operators.IntervalJoin]] — exactly-once across many shared
  * buckets, touch-at-endpoint inclusivity, keyed + global brute-force
  * mirrors, equi-plan contract. */
class IntervalJoinSpec extends SparkSpec {
  import spark.implicits._

  test("exactly-once for long co-resident intervals; endpoints touch") {
    // a=[0,95] and b=[5,90] share ten width-10 buckets → ONE pair.
    // c=[95,100] touches a at 95 (closed intervals overlap) but not b.
    val l = Seq((0L, 95L, 1L)).toDF("ls", "le", "lid")
    val r = Seq((5L, 90L, 10L), (95L, 100L, 11L), (101L, 200L, 12L))
      .toDF("rs", "re", "rid")
    val got = IntervalJoin.intervalJoin(l, r, Nil, "ls", "le", "rs", "re", 10L)
      .select("lid", "rid").collect().map(x => (x.getLong(0), x.getLong(1)))
      .toSeq.sorted
    assert(got === Seq((1L, 10L), (1L, 11L)))
  }

  test("matches brute-force mirror on random keyed intervals") {
    val rnd = new scala.util.Random(29)
    def mk(n: Int, prefix: String) = (1 to n).map { i =>
      val s = rnd.nextInt(800).toLong
      (rnd.nextInt(4).toLong, s, s + rnd.nextInt(120).toLong, i.toLong)
    }
    val ls = mk(150, "l"); val rs = mk(150, "r")
    val got = IntervalJoin.intervalJoin(
        ls.toDF("k", "ls", "le", "lid"), rs.toDF("k", "rs", "re", "rid"),
        Seq("k"), "ls", "le", "rs", "re", 50L)
      .select("lid", "rid").collect()
      .map(x => (x.getLong(0), x.getLong(1)))
    val want = for {
      (lk, lsx, lex, lid) <- ls
      (rk, rsx, rex, rid) <- rs
      if lk == rk && lsx <= rex && rsx <= lex
    } yield (lid, rid)
    // exactly-once: compare as multisets via sorted seqs
    assert(got.toSeq.sorted === want.sorted)
    assert(want.nonEmpty)
  }

  test("negative bounds: exactly-once with floor-division buckets") {
    // overlap regions starting at negative epochs: the responsibility
    // bucket must use floor division or pairs whose greatest(start)
    // lands left of the origin are emitted zero (or two) times.
    val rnd = new scala.util.Random(31)
    def mk(n: Int) = (1 to n).map { i =>
      val s = rnd.nextInt(400).toLong - 200L
      (s, s + rnd.nextInt(60).toLong, i.toLong)
    }
    val ls = mk(80); val rs = mk(80)
    val got = IntervalJoin.intervalJoin(
        ls.toDF("ls", "le", "lid"), rs.toDF("rs", "re", "rid"),
        Nil, "ls", "le", "rs", "re", 25L)
      .select("lid", "rid").collect()
      .map(x => (x.getLong(0), x.getLong(1)))
    val want = for {
      (lsx, lex, lid) <- ls
      (rsx, rex, rid) <- rs
      if lsx <= rex && rsx <= lex
    } yield (lid, rid)
    assert(got.toSeq.sorted === want.sorted)
    assert(want.nonEmpty)
  }

  test("plan: equi join, no nested-loop or cartesian") {
    val l = Seq((1L, 0L, 5L)).toDF("k", "ls", "le")
    val r = Seq((1L, 3L, 9L)).toDF("k", "rs", "re")
    val df = IntervalJoin.intervalJoin(l, r, Seq("k"), "ls", "le",
      "rs", "re", 10L)
    val plan = df.queryExecution.sparkPlan.toString
    assert(!plan.contains("BroadcastNestedLoop") && !plan.contains("Cartesian"),
      s"interval join must plan as an equi join:\n$plan")
    assert(plan.contains("Join"), s"expected a join operator in:\n$plan")
  }
}
