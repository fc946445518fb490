package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Time-series resampling with last-observation-carried-forward — the
  * third canonical temporal operator (beside [[AsofJoin]] and
  * [[RangeJoin]]): regularize each key's irregular event stream onto a
  * fixed-width grid over the key's own observed range, carrying the
  * latest observation forward through empty buckets (daily bars from
  * ticks, LOCF feature snapshots, state-at-time-t training frames).
  *
  * Spark-first plan — ONE scan, no join, no calendar:
  *  1. per (keys, bucket) the LAST observation is a `max(struct(ts,
  *     tieBreak, value))` aggregate — map-side combinable, one exchange,
  *     never a sort of the raw stream;
  *  2. each observed bucket GAP-EXPLODES to the grid rows it covers:
  *     `sequence(bkt, next_observed_bkt - 1)` via one `lead` window per
  *     key (second, bucket-grain-to-key-grain exchange). Grid rows are
  *     generated next to their key — the global date-spine × keys cross
  *     join, the classic blow-up, never exists — and the carried value
  *     rides along in the same row, so there is no spine⟕buckets join
  *     and no second pass over the aggregate (an earlier
  *     spine-join-fill form computed the bucket aggregate twice; Spark
  *     does not share common subplans).
  * Grid cardinality is Σ_key(range_key/width) — bounded by the data's
  * own span, independent of how sparse the observations are.
  *
  * Semantics: `<v>_ff` is the value of the key's most recent observed
  * bucket — LOCF in the literal sense: a null-VALUED observation is
  * still an observation and carries its null (resets the fill) rather
  * than exposing an older value as if it were current; `observed` marks
  * buckets that had a real row, independent of the value's nullity.
  *
  * Determinism: within a bucket the kept row is the greatest
  * (ts, tieBreak) — `tieBreak` must be unique per (keys, ts) (an event
  * id) so an engine-independent `row_number() … ORDER BY ts DESC,
  * tieBreak DESC` oracle matches bit-for-bit; observed buckets are
  * unique per key so the lead window has no ties at all.
  *
  * Contract: `tsCol` integral event time (epoch micros; negative values
  * handled — bucket ids use exact floor division,
  * [[TimeBuckets.floorBkt]]), `bucketWidth` > 0. Output: one row per
  * (keys…, bucket) of the dense per-key grid.
  */
object Resample {

  def resampleLocf(df: DataFrame, keys: Seq[String], tsCol: String,
                   tieBreak: String, valueCol: String,
                   bucketWidth: Long): DataFrame = {
    require(bucketWidth > 0, s"bucketWidth must be positive: $bucketWidth")
    val lastRow = df
      .withColumn("__bkt",
        expr(TimeBuckets.floorBkt(s"`$tsCol`", bucketWidth)))
      .groupBy((keys.map(col) :+ col("__bkt")): _*)
      .agg(max(struct(col(tsCol), col(tieBreak), col(valueCol))).as("__m"))
      .select(keys.map(col) ++ Seq(col("__bkt"),
        col(s"__m.$valueCol").as(valueCol)): _*)
    val w = Window.partitionBy(keys.map(col): _*).orderBy(col("__bkt"))
    lastRow
      .withColumn("__gap_end",
        coalesce(lead(col("__bkt"), 1).over(w) - 1, col("__bkt")))
      .select(keys.map(col) ++ Seq(
        explode(sequence(col("__bkt"), col("__gap_end"))).as("bkt"),
        col("__bkt").as("__src"), col(valueCol)): _*)
      .select(keys.map(col) ++ Seq(col("bkt"),
        col(valueCol).as(s"${valueCol}_ff"),
        (col("bkt") === col("__src")).as("observed")): _*)
  }
}
