package graft.operators

import org.apache.spark.sql.functions._

/** Pins [[TimeBuckets.floorBkt]] (package-private, hence this suite
  * lives in graft.operators): exact floor division over the ENTIRE
  * Long domain, including the `Long.MinValue + k` band where the old
  * `(e - pmod(e, w)) div w` form wrapped before dividing (round-12
  * advice). */
class TimeBucketsSpec extends graft.SparkSpec {
  import spark.implicits._

  test("floorBkt is exact floor division across the Long domain, " +
      "including within w of Long.MinValue") {
    val w = 86400L
    val es = Seq(
      Long.MinValue, Long.MinValue + 1, Long.MinValue + w - 1,
      Long.MinValue + w, -w - 1, -w, -1L, 0L, 1L, w - 1, w, w + 1,
      Long.MaxValue - 1, Long.MaxValue)
    val got = es.toDF("e")
      .select(col("e"), expr(TimeBuckets.floorBkt("e", w)).as("b"))
      .as[(Long, Long)].collect().toMap
    es.foreach { e =>
      // reference floor division without overflow: BigInt floorDiv
      val want = java.lang.Math.floorDiv(e, w)
      assert(got(e) == want, s"floorBkt($e, $w): got ${got(e)}, " +
        s"want $want")
    }
  }
}
