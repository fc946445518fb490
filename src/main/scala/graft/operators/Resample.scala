package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Time-series resampling with last-observation-carried-forward — the
  * third canonical temporal operator (beside [[AsofJoin]] and
  * [[RangeJoin]]): regularize each key's irregular event stream onto a
  * fixed-width grid over the key's own observed range, carrying the
  * latest value forward through empty buckets (daily bars from ticks,
  * LOCF feature snapshots, state-at-time-t training frames).
  *
  * Spark-first plan, all key-clustered:
  *  1. per (keys, bucket) the LAST observation is a `max(struct(ts,
  *     tieBreak, value))` aggregate — map-side combinable, ONE exchange,
  *     never a sort of the raw stream;
  *  2. the per-key spine is `sequence(min(bkt), max(bkt))` exploded from
  *     a one-row-per-key aggregate — grid rows are GENERATED next to
  *     their key, not cross-joined from a global calendar (the global
  *     date-spine × keys cross join is the classic blow-up);
  *  3. spine ⟕ buckets is an equi join on (keys, bucket);
  *  4. the forward fill is one running `last(ignoreNulls)` window per
  *     key over the dense grid.
  * Grid cardinality is Σ_key(range_key/width) — bounded by the data's
  * own span, independent of how sparse the observations are.
  *
  * Determinism: within a bucket the kept row is the greatest
  * (ts, tieBreak) — `tieBreak` must be unique per (keys, ts) (an event
  * id) so an engine-independent `row_number() … ORDER BY ts DESC,
  * tieBreak DESC` oracle matches bit-for-bit; grid buckets are unique
  * per key so the fill window has no ties at all.
  *
  * Contract: `tsCol` integral non-negative event time (epoch micros;
  * `div` truncates toward zero), `bucketWidth` > 0. Output: one row per
  * (keys…, bucket) of the dense per-key grid, with `<v>_ff` (the carried
  * value, null only before a key's first observation in-range — the
  * spine starts AT the first observation, so never in practice) and
  * `observed` (whether the bucket had a real row).
  */
object Resample {

  def resampleLocf(df: DataFrame, keys: Seq[String], tsCol: String,
                   tieBreak: String, valueCol: String,
                   bucketWidth: Long): DataFrame = {
    require(bucketWidth > 0, s"bucketWidth must be positive: $bucketWidth")
    val e = df.withColumn("bkt", expr(s"`$tsCol` div $bucketWidth"))
    val lastRow = e.groupBy((keys.map(col) :+ col("bkt")): _*)
      .agg(max(struct(col(tsCol), col(tieBreak), col(valueCol))).as("__m"))
      .select(keys.map(col) ++ Seq(col("bkt"),
        col(s"__m.$valueCol").as(valueCol)): _*)
    val spine = lastRow.groupBy(keys.map(col): _*)
      .agg(min(col("bkt")).as("__mn"), max(col("bkt")).as("__mx"))
      .select(keys.map(col) :+
        explode(sequence(col("__mn"), col("__mx"))).as("bkt"): _*)
    val w = Window.partitionBy(keys.map(col): _*).orderBy(col("bkt"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    spine.join(lastRow, keys :+ "bkt", "left")
      .select(keys.map(col) ++ Seq(col("bkt"),
        last(col(valueCol), ignoreNulls = true).over(w)
          .as(s"${valueCol}_ff"),
        col(valueCol).isNotNull.as("observed")): _*)
  }
}
