package graft.operators

import graft.functions.ColumnFns.moneySum
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Basket-level analytics (SURVEY §2.4 A1–A4, §2.6 T1).
  *
  * Re-expresses the reference's dashboard aggregations
  * (`Website/market/dunnhumby/views.py:876-930`, `views.py:90-95`) as
  * single-pass declarative aggregations. All of these are one
  * shuffle-on-the-group-key hash aggregations with map-side partials —
  * the shape that scales linearly with executors at 100 TB. Distinct
  * counts are exact (the reference's semantic baseline, SURVEY §2.4);
  * callers can swap `countDistinct` for `approx_count_distinct` at scale.
  * Money sums go through [[graft.functions.ColumnFns.moneySum]] so the
  * result is exact and partitioning-independent.
  */
object BasketAnalytics {

  /** A1 — whole-table stats: COUNT, COUNT DISTINCT basket/product/household,
    * SUM/AVG of sales (`views.py:876-888`). One job, no joins. */
  def tableStats(tx: DataFrame, basket: String, item: String,
                 customer: String, sales: String): DataFrame = {
    val totalSales = moneySum(col(sales))
    tx.agg(
      count(lit(1)).as("n_rows"),
      countDistinct(col(basket)).as("n_baskets"),
      countDistinct(col(item)).as("n_items"),
      countDistinct(col(customer)).as("n_customers"),
      totalSales.as("total_sales"),
      (totalSales / count(lit(1))).as("avg_sales"))
  }

  /** [[tableStats]] with HyperLogLog++ distinct counts — the documented
    * 100 TB swap-in (see the object scaladoc): `approx_count_distinct`
    * keeps the whole-table stats a single map-side-partial pass whose
    * per-partition state is a fixed-size sketch (vs an exact distinct's
    * per-key hash state), at a relative error bounded by `rsd`. Counts
    * and money sums stay exact. The q_table_stats_approx gate REQUIREs
    * every approx distinct within ±2% of the exact gate's value on the
    * same data, making the swap-in claim a tested property rather than
    * a scaladoc promise. */
  def tableStatsApprox(tx: DataFrame, basket: String, item: String,
                       customer: String, sales: String,
                       rsd: Double = 0.01): DataFrame = {
    val totalSales = moneySum(col(sales))
    tx.agg(
      count(lit(1)).as("n_rows"),
      approx_count_distinct(col(basket), rsd).as("n_baskets"),
      approx_count_distinct(col(item), rsd).as("n_items"),
      approx_count_distinct(col(customer), rsd).as("n_customers"),
      totalSales.as("total_sales"),
      (totalSales / count(lit(1))).as("avg_sales"))
  }

  /** A2 + T1 — per-basket totals, top-k by value (`views.py:890-903`).
    * Group key is the basket id, so the single shuffle partitions by the
    * natural key; ties broken by basket id for deterministic top-k. */
  def basketTotals(tx: DataFrame, basket: String, qty: String,
                   sales: String, item: String): DataFrame =
    tx.groupBy(col(basket))
      .agg(
        sum(col(qty)).as("total_items"),
        moneySum(col(sales)).as("total_value"),
        countDistinct(col(item)).as("n_products"),
        count(lit(1)).as("n_lines"))

  /** A3 — per-category sales after dimension enrichment (`views.py:905-919`).
    * `dim` is broadcast (product table ≈ 92K rows in the reference —
    * SURVEY §2.3 J1). */
  def categorySales(tx: DataFrame, dim: DataFrame, key: String,
                    category: String, sales: String, qty: String): DataFrame =
    tx.join(broadcast(dim.select(col(key), col(category))), Seq(key), "left")
      .groupBy(col(category))
      .agg(
        count(lit(1)).as("n_tx"),
        moneySum(col(sales)).as("total_sales"),
        sum(col(qty)).as("total_qty"),
        countDistinct(col(key)).as("n_products"))

  /** A4 — per-product frequency / totals / derived average
    * (`views.py:921-930`: `Sum/Count` expression alias). */
  def productStats(tx: DataFrame, item: String, sales: String,
                   qty: String): DataFrame = {
    val total = moneySum(col(sales))
    tx.groupBy(col(item))
      .agg(
        count(lit(1)).as("frequency"),
        total.as("total_sales"),
        sum(col(qty)).as("total_qty"),
        (total / count(lit(1))).as("avg_sales"))
  }

  /** T1/T2-style deterministic top-k: order by metric desc with the group
    * key as tiebreak, then limit (`views.py:890-930` `ORDER BY ... DESC
    * TOP N`). */
  def topK(df: DataFrame, metric: String, key: String, k: Int): DataFrame =
    df.orderBy(col(metric).desc, col(key).asc).limit(k)
}
