package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Time-window analytics (SURVEY §2.2 P5, §2.4 A17–A18, §2.8 F9;
  * `Website/market/dunnhumby/views.py:146-161`, `views.py:694-729`,
  * `views.py:769-782`, `views.py:1943-1964`).
  *
  * The reference's time axis is an integer `day`; the testdata's is a
  * date/timestamp. Operators take the day column as a [[Column]] so either
  * axis works. "Last N days" is a predicate (P5), not a sliding window —
  * it pushes to the parquet scan once the max-day literal is resolved (one
  * tiny agg job, then a pushed filter).
  */
object Trends {

  /** P5 — the reference's period window: `day >= max_day - N + 1`
    * (`views.py:146-161`). Resolves max(day) eagerly (single-row agg) so
    * the main scan gets a pushable literal predicate instead of a
    * non-pushable scalar subquery. */
  def lastNDays(df: DataFrame, dayCol: Column, n: Int): DataFrame = {
    val maxDay = df.agg(max(dayCol.cast("date"))).head().getDate(0)
    df.where(dayCol.cast("date") >= date_sub(lit(maxDay), n - 1))
  }

  /** A18 — monthly trend buckets over a date axis: per-month counts, sales,
    * distinct actors (`views.py:769-782` uses `((day-352)/30)+1`; on dates
    * the bucket is the calendar month). */
  def monthlyTrend(df: DataFrame, dayCol: Column, sales: Column,
                   actor: Column, basket: Column): DataFrame =
    df.groupBy(date_trunc("month", dayCol).cast("date").as("month"))
      .agg(
        count(lit(1)).as("n_rows"),
        round(sum(sales), 2).as("total_sales"),
        countDistinct(actor).as("n_actors"),
        countDistinct(basket).as("n_baskets"))

  /** A17/F1 — quarter-bucket rollup: group by (category, quarter-of-year)
    * (`views.py:1943-1964`). */
  def quarterRollup(df: DataFrame, category: Column, dayCol: Column,
                    sales: Column): DataFrame =
    df.groupBy(category.as("category"),
        concat(lit("Q"), quarter(dayCol)).as("quarter"))
      .agg(count(lit(1)).as("n_rows"), round(sum(sales), 2).as("total_sales"))

  /** F9 — period-over-period KPI: recent window vs the previous window of
    * equal length, percent change with zero-guard (`views.py:694-729`).
    * Single pass: conditional aggregation over one scan (A7 shape,
    * `ml_models.py:806-813`) instead of two separate scans. */
  def periodComparison(df: DataFrame, dayCol: Column, sales: Column,
                       n: Int): DataFrame = {
    val maxDay = df.agg(max(dayCol.cast("date"))).head().getDate(0)
    val d = dayCol.cast("date")
    val recentLo = date_sub(lit(maxDay), n - 1)
    val prevLo = date_sub(lit(maxDay), 2 * n - 1)
    val recent = round(sum(when(d >= recentLo, sales).otherwise(lit(0.0))), 2)
    val prev = round(sum(
      when(d >= prevLo && d < recentLo, sales).otherwise(lit(0.0))), 2)
    df.where(d >= prevLo).agg(
      recent.as("recent_sales"),
      prev.as("prev_sales"),
      round(when(prev =!= 0, (recent - prev) / prev * 100)
        .otherwise(lit(0.0)), 6).as("pct_change"))
  }
}
