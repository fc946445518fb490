package graft

import org.apache.spark.sql.functions._

import graft.operators.Resample

/** [[graft.operators.Resample]] — dense per-key grid over the observed
  * range only, last-in-bucket pick with deterministic ties, forward fill
  * through empty buckets, key isolation, brute-force mirror. */
class ResampleSpec extends SparkSpec {
  import spark.implicits._

  test("grid spans the key's own range; fill carries through gaps") {
    // key 1: obs in buckets 1 (two rows — last wins), 4. Grid 1..4,
    // buckets 2-3 filled with bucket-1's last value.
    // key 2: single obs → single grid row. No global calendar bleed.
    val df = Seq((1L, 10L, 1L, 1.0), (1L, 15L, 2L, 2.0),
        (1L, 45L, 3L, 9.0), (2L, 100L, 4L, 5.0))
      .toDF("k", "ts", "eid", "v")
    val got = Resample.resampleLocf(df, Seq("k"), "ts", "eid", "v", 10L)
      .orderBy("k", "bkt")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2),
        r.getBoolean(3)))
    assert(got.toSeq === Seq(
      (1L, 1L, 2.0, true),   // last of the two bucket-1 rows (eid 2)
      (1L, 2L, 2.0, false),  // carried
      (1L, 3L, 2.0, false),  // carried
      (1L, 4L, 9.0, true),
      (2L, 10L, 5.0, true)))
  }

  test("negative timestamps bucket by floor division (no origin merge)") {
    // ts -15 and ts 5: truncating `div` would give buckets -1 (or 0) and
    // 0 — merging across the origin; floor gives -2 and 0 with the empty
    // bucket -1 forward-filled between them.
    val df = Seq((1L, -15L, 1L, 1.0), (1L, 5L, 2L, 2.0))
      .toDF("k", "ts", "eid", "v")
    val got = Resample.resampleLocf(df, Seq("k"), "ts", "eid", "v", 10L)
      .orderBy("k", "bkt")
      .collect().map(r => (r.getLong(1), r.getDouble(2), r.getBoolean(3)))
    assert(got.toSeq === Seq((-2L, 1.0, true), (-1L, 1.0, false),
      (0L, 2.0, true)))
  }

  test("within-bucket tie on ts resolves to greatest tieBreak") {
    val df = Seq((1L, 10L, 7L, 1.0), (1L, 10L, 9L, 2.0), (1L, 10L, 8L, 3.0))
      .toDF("k", "ts", "eid", "v")
    val got = Resample.resampleLocf(df, Seq("k"), "ts", "eid", "v", 10L)
      .collect()
    assert(got.length === 1 && got(0).getDouble(2) === 2.0)
  }

  test("null-valued observation resets the fill and still marks observed") {
    // bucket 0: v=1.0; bucket 1: real row with NULL value; bucket 3:
    // v=7.0. The null observation is observed=true, carries its null
    // through the bucket-2 gap (NOT the stale 1.0), and 7.0 resumes.
    val df = Seq((1L, 5L, 1L, Option(1.0)), (1L, 15L, 2L, None),
        (1L, 35L, 3L, Option(7.0)))
      .toDF("k", "ts", "eid", "v")
    val got = Resample.resampleLocf(df, Seq("k"), "ts", "eid", "v", 10L)
      .orderBy("bkt")
      .collect().map(r => (r.getLong(1),
        if (r.isNullAt(2)) Double.NaN else r.getDouble(2), r.getBoolean(3)))
    assert(got(0) === ((0L, 1.0, true)))
    assert(got(1)._1 === 1L && got(1)._2.isNaN && got(1)._3 === true)
    assert(got(2)._1 === 2L && got(2)._2.isNaN && got(2)._3 === false)
    assert(got(3) === ((3L, 7.0, true)))
  }

  test("matches brute-force mirror on random data") {
    val rnd = new scala.util.Random(23)
    val rows = (1 to 300).map(i =>
      (rnd.nextInt(6).toLong, rnd.nextInt(500).toLong, i.toLong,
        rnd.nextDouble()))
    val got = Resample.resampleLocf(rows.toDF("k", "ts", "eid", "v"),
        Seq("k"), "ts", "eid", "v", 25L)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2),
        r.getBoolean(3))).toSet
    val want = rows.groupBy(_._1).flatMap { case (k, rs) =>
      val byBkt = rs.groupBy(_._2 / 25L)
      val lastV = byBkt.map { case (b, g) =>
        b -> g.maxBy(x => (x._2, x._3))._4
      }
      val (mn, mx) = (byBkt.keys.min, byBkt.keys.max)
      var carry = 0.0
      (mn to mx).map { b =>
        val obs = lastV.contains(b)
        if (obs) carry = lastV(b)
        (k, b, carry, obs)
      }
    }.toSet
    assert(got === want)
  }
}
