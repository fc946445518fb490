package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Window-function operators (SURVEY §2.5 W1–W2, W4).
  *
  * All windows here are PARTITIONED (by sample bucket or by customer), so
  * they scale: one shuffle on the partition key, per-partition sort,
  * no global single-task window anywhere.
  */
object Windows {

  /** W1 — stratified window sample: `ROW_NUMBER() OVER (PARTITION BY bucket
    * ORDER BY <random>)` then `rn <= perBucket` (`ml_models.py:294-311`,
    * which uses ORDER BY NEWID()). The reference's NEWID() is unseeded;
    * for reproducibility we order by a deterministic multiplicative-hash
    * "pseudo-random" of the row key (Knuth 2654435761) with the key itself
    * as tiebreak — same distributional effect, exactly replayable. */
  def stratifiedSample(df: DataFrame, bucket: Column, rowKey: Column,
                       perBucket: Int): DataFrame = {
    // reduce the key BEFORE multiplying: rowKey * 2654435761 overflows
    // Long (ANSI error) for keys >= ~3.5e9 — routine at surrogate-key scale
    val prand = (pmod(rowKey, lit(1000003L)) * lit(2654435761L)) %
      lit(1000003L)
    df.withColumn("bucket", bucket)
      .withColumn("rn", row_number().over(
          Window.partitionBy(col("bucket")).orderBy(prand.asc, rowKey.asc))
        .cast("long"))
      .where(col("rn") <= perBucket)
  }

  /** W2 — purchase-gap: per key, mean gap between consecutive DISTINCT
    * activity days (`analytics.py:483-486` pandas `diff()`), via lag over
    * a per-key window. Returns (key, avg_gap, n_gaps); keys with a single
    * active day drop out (no gaps), matching pandas' NaN-mean drop. */
  def purchaseGaps(df: DataFrame, key: String, day: Column): DataFrame = {
    val days = df.select(col(key), day.as("__day")).distinct()
    val w = Window.partitionBy(col(key)).orderBy(col("__day").asc)
    val isDate = days.schema("__day").dataType match {
      case _: org.apache.spark.sql.types.NumericType => false
      case _ => true
    }
    val gap =
      if (isDate) datediff(col("__day"), lag(col("__day"), 1).over(w))
      else col("__day") - lag(col("__day"), 1).over(w)
    days.withColumn("__gap", gap.cast("long"))
      .where(col("__gap").isNotNull)
      .groupBy(col(key))
      .agg(
        (sum(col("__gap")) / count(lit(1))).as("avg_gap"),
        count(lit(1)).as("n_gaps"))
  }

  /** W4 — customer lifetime: per key max(day) − min(day)
    * (`churn_data_assessment.py:75-78`); an aggregation, not a window. */
  def lifetime(df: DataFrame, key: String, day: Column): DataFrame = {
    val isDate = df.select(day).schema.head.dataType match {
      case _: org.apache.spark.sql.types.NumericType => false
      case _ => true
    }
    val span =
      if (isDate) datediff(max(day), min(day))
      else max(day) - min(day)
    df.groupBy(col(key)).agg(span.cast("long").as("lifetime_days"))
  }

  /** T5/T8 — top-k rows per group by metric desc with deterministic
    * tiebreak (`views.py:1592-1688`, `views.py:1459-1461`). */
  def topKPerGroup(df: DataFrame, group: Column, metric: Column,
                   tiebreak: Column, k: Int): DataFrame =
    df.withColumn("rn", row_number()
        .over(Window.partitionBy(group).orderBy(metric.desc, tiebreak.asc))
        .cast("long"))
      .where(col("rn") <= k)
}
