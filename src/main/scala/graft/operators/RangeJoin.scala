package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Point-in-interval range join — the second canonical temporal operator
  * (beside [[AsofJoin]]) the reference's market-data workload family
  * implies but its SQL never reaches (SURVEY §2.3: every reference join
  * is equi). Each point row is matched to every interval row, optionally
  * under shared equi keys, with `start <= point <= end` (inclusive both
  * ends).
  *
  * Spark-first plan: Spark plans a bare non-equi condition as
  * BroadcastNestedLoopJoin — O(|P|·|I|) work and a broadcast of a whole
  * side, the classic scale-killer. Instead both sides are mapped onto
  * fixed-width buckets of the point axis: an interval explodes to the
  * bucket ids it covers (`sequence(start div w, end div w)`), a point
  * belongs to exactly ONE bucket — so the join becomes a plain EQUI
  * shuffle join on (keys…, bucket) with the range predicate left as a
  * residual filter, and each qualifying (point, interval) pair appears
  * exactly once (no post-join dedup). Catalyst sees an ordinary
  * equi-join: AQE sizing, broadcast-if-small, and skew splitting all
  * apply.
  *
  * Bucket width is the one tuning knob: candidate work per point is
  * O(intervals overlapping its bucket), and interval replication is
  * `len/w + 1` copies. Pick `w` near the TYPICAL interval length —
  * replication stays ~2× while a bucket holds only same-epoch intervals.
  * A pathologically wide outlier interval replicates `len/w + 1` times;
  * at 100 TB cap outliers upstream (or split the long tail into its own
  * broadcast-side pass) rather than shrinking `w` for everyone.
  *
  * Contract: `pointCol`, `startCol`, `endCol` must be integral
  * (day numbers, epoch seconds/micros — cast timestamps first); negative
  * values are handled correctly (bucket ids use exact FLOOR division,
  * [[TimeBuckets.floorBkt]] — plain `div` truncates toward zero and
  * would silently merge the two sides of the origin into bucket 0).
  * `start <= end` per row (violators explode `sequence` downward —
  * filter upstream).
  * Interval column names must not collide with point column names
  * (pre-alias). Inner semantics: points with no interval drop — compose
  * a left join downstream for outer shapes (see q_range_join).
  */
object RangeJoin {

  def rangeJoin(points: DataFrame, intervals: DataFrame, keys: Seq[String],
                pointCol: String, startCol: String, endCol: String,
                bucketWidth: Long): DataFrame = {
    require(bucketWidth > 0, s"bucketWidth must be positive: $bucketWidth")
    // SQL `div` (exact integer division), NOT `/`: float division of
    // epoch-scale longs truncates off-by-one near bucket boundaries.
    val p = points.withColumn("__bkt",
      expr(TimeBuckets.floorBkt(s"`$pointCol`", bucketWidth)))
    val iv = intervals.withColumn("__bkt",
      explode(sequence(
        expr(TimeBuckets.floorBkt(s"`$startCol`", bucketWidth)),
        expr(TimeBuckets.floorBkt(s"`$endCol`", bucketWidth)))))
    p.join(iv, keys :+ "__bkt")
      .where(col(pointCol) >= col(startCol) && col(pointCol) <= col(endCol))
      .drop("__bkt")
  }
}
