package graft

import org.apache.spark.sql.functions._

import graft.operators.Sessionize

/** [[graft.operators.Sessionize]] — boundary semantics (exactly-gap
  * stays, gap+1 splits), tie safety, brute-force mirror on random data,
  * agreement with the streaming sessionizer's split rule, and the
  * one-exchange plan contract. */
class SessionizeSpec extends SparkSpec {
  import spark.implicits._

  test("exactly-gap stays in session; gap+1 starts a new one; ties merge") {
    // key 1: 0,100 (gap 100 = gap stays), 201 (gap 101 > 100 splits),
    //        201 duplicate ts (tie, same session)
    // key 2: single event
    val ev = Seq((1L, 0L), (1L, 100L), (1L, 201L), (1L, 201L), (2L, 5L))
      .toDF("k", "ts")
    val got = Sessionize.sessionize(ev, Seq("k"), "ts", 100L)
      .orderBy("k", "session_idx")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5)))
    assert(got.toSeq === Seq(
      (1L, 1L, 0L, 100L, 2L, 100L),
      (1L, 2L, 201L, 201L, 2L, 0L),
      (2L, 1L, 5L, 5L, 1L, 0L)))
  }

  test("matches brute-force per-key scan on random data") {
    val rnd = new scala.util.Random(17)
    val rows = (1 to 500).map(_ =>
      (rnd.nextInt(8).toLong, rnd.nextInt(2000).toLong))
    val got = Sessionize.sessionize(rows.toDF("k", "ts"), Seq("k"), "ts", 50L)
      .select("k", "session_idx", "session_start", "session_end", "n_events")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4))).toSet
    // driver-side mirror: sort each key's timestamps, split on gap > 50
    val want = rows.groupBy(_._1).flatMap { case (k, ts) =>
      val sorted = ts.map(_._2).sorted
      val sessions = sorted.tail.foldLeft(Vector(Vector(sorted.head))) {
        (acc, t) =>
          if (t - acc.last.last > 50L) acc :+ Vector(t)
          else acc.init :+ (acc.last :+ t)
      }
      sessions.zipWithIndex.map { case (s, i) =>
        (k, (i + 1).toLong, s.head, s.last, s.size.toLong)
      }
    }.toSet
    assert(got === want)
  }

  test("plan: one exchange, windows and aggregation share it") {
    val ev = Seq((1L, 0L), (1L, 10L)).toDF("k", "ts")
    val df = Sessionize.sessionize(ev, Seq("k"), "ts", 5L)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
      .split("== Initial Plan ==").head
    assert("Exchange hashpartitioning".r.findAllIn(plan).size === 1,
      s"want ONE key exchange in:\n$plan")
  }
}
