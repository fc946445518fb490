package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Interval-overlap join — the interval×interval member of the temporal
  * family ([[AsofJoin]] point×point, [[RangeJoin]] point×interval):
  * match every pair of rows, optionally under shared equi keys, whose
  * closed intervals overlap (`s1 <= e2 AND s2 <= e1`) — concurrent
  * sessions, overlapping shipment windows, double-booked resources.
  *
  * Spark-first plan: like [[RangeJoin]], both sides explode onto
  * fixed-width buckets of the time axis and meet in a plain EQUI
  * shuffle join on (keys…, bucket) with the overlap predicate as a
  * residual filter. Unlike the point case, two intervals can co-occupy
  * MANY buckets, so each qualifying pair would surface once per shared
  * bucket; the dedup is algebraic, not a `distinct`: a pair's overlap
  * region starts at `greatest(s1, s2)`, which lies in exactly ONE
  * bucket — the join keeps a candidate only where
  * `bucket == greatest(s1, s2) div w` (the "responsibility bucket"), so
  * every overlapping pair is emitted exactly once with zero
  * post-join aggregation. Catalyst sees an ordinary equi-join: AQE
  * sizing, broadcast-if-small, and skew splitting all apply; no
  * BroadcastNestedLoopJoin, no |L|·|R| explosion, no distinct exchange.
  *
  * Bucket width trades interval replication (`len/w + 1` copies per
  * side) against per-bucket candidate density, exactly as in
  * [[RangeJoin]] — pick `w` near the typical interval length; cap or
  * side-channel pathological outliers upstream.
  *
  * Contract: bound columns integral (negative values handled — bucket
  * ids use exact floor division, [[TimeBuckets.floorBkt]]), `start <=
  * end` per row, column names disjoint across the two sides
  * (pre-alias). Inner semantics; self-joins should
  * pre-alias one side and filter `id1 < id2` downstream to halve the
  * symmetric pairs.
  */
object IntervalJoin {

  def intervalJoin(left: DataFrame, right: DataFrame, keys: Seq[String],
                   leftStart: String, leftEnd: String,
                   rightStart: String, rightEnd: String,
                   bucketWidth: Long): DataFrame = {
    require(bucketWidth > 0, s"bucketWidth must be positive: $bucketWidth")
    def bucketed(df: DataFrame, s: String, e: String) = df.withColumn(
      "__bkt", explode(sequence(
        expr(TimeBuckets.floorBkt(s"`$s`", bucketWidth)),
        expr(TimeBuckets.floorBkt(s"`$e`", bucketWidth)))))
    bucketed(left, leftStart, leftEnd)
      .join(bucketed(right, rightStart, rightEnd), keys :+ "__bkt")
      .where(col(leftStart) <= col(rightEnd) &&
        col(rightStart) <= col(leftEnd) &&
        col("__bkt") === expr(TimeBuckets.floorBkt(
          s"greatest(`$leftStart`, `$rightStart`)", bucketWidth)))
      .drop("__bkt")
  }
}
