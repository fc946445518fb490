package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** RFM customer segmentation (SURVEY §2.11;
  * `Website/market/dunnhumby/analytics.py:196-313`).
  *
  * Pipeline: per-customer base aggregates → quintile scores → 11-way
  * ordered segment rule chain. The reference round-trips through pandas
  * (`qcut`); here the whole thing is one aggregation plus three window
  * functions plus a `when` chain — no driver materialization.
  *
  * Scale note: `ntile` over a global ORDER BY is a single-partition window
  * — fine for the reference's 2.5K households, a bottleneck at 10⁹
  * customers. At that scale swap `scoreByNtile` for quantile-edge scoring
  * (`approxQuantile` edges + a `when` chain), which is embarrassingly
  * parallel. Tie semantics of qcut vs ntile are documented in SURVEY §7.5#1;
  * the F score uses rank(method='first') in the reference = our row_number
  * ordering, so ntile matches it exactly given a deterministic tiebreak.
  */
object Rfm {

  /** A5 — base aggregates: last-activity, distinct-trip frequency, monetary
    * (`analytics.py:198-206`). One hash aggregation on the customer key. */
  def base(tx: DataFrame, customer: String, basket: String, sales: String,
           day: String): DataFrame =
    tx.groupBy(col(customer).as("customer"))
      .agg(
        max(col(day)).as("last_day"),
        countDistinct(col(basket)).as("frequency"),
        round(sum(col(sales)), 2).as("monetary"))

  /** Quintile score 1..5 by `ntile(5)` with a deterministic tiebreak
    * (`analytics.py:223-230` W3). `reversed` flips labels — the reference
    * scores recency 5=most recent. */
  def scoreByNtile(order: Column, tiebreak: Column, reversed: Boolean): Column = {
    val n = ntile(5).over(Window.orderBy(order, tiebreak))
    if (reversed) lit(6) - n else n
  }

  /** Full RFM scoring: recency (days since last activity, lower = better),
    * frequency, monetary → r/f/m scores 1..5 (`analytics.py:208-230`). */
  def scores(tx: DataFrame, customer: String, basket: String, sales: String,
             day: String): DataFrame = {
    val b = base(tx, customer, basket, sales, day)
    val maxDay = b.agg(max(col("last_day"))).head().get(0)
    // recency = max_day - last_day (analytics.py:219-220); works on either an
    // integer day axis (the reference) or a date/timestamp axis (testdata)
    val recency = b.schema("last_day").dataType match {
      case _: org.apache.spark.sql.types.NumericType => lit(maxDay) - col("last_day")
      case _ => datediff(lit(maxDay).cast("date"), col("last_day").cast("date"))
    }
    b.withColumn("recency", recency)
      // R: small recency → high score (labels [5..1] on ascending recency)
      .withColumn("r_score",
        scoreByNtile(col("recency").asc, col("customer").asc, reversed = true))
      // F: rank(method='first') ascending → ntile ascending
      .withColumn("f_score",
        scoreByNtile(col("frequency").asc, col("customer").asc, reversed = false))
      .withColumn("m_score",
        scoreByNtile(col("monetary").asc, col("customer").asc, reversed = false))
  }

  /** 11-way ordered segment assignment — MUST keep the reference's exact
    * rule order including the unreachable "Can't Lose Them" branch shadowed
    * by "At Risk" (`analytics.py:243-290`, SURVEY §7.5#3). */
  def segmentExpr(r: Column, f: Column, m: Column): Column =
    when(r >= 4 && f >= 4 && m >= 4, "Champions")
      .when(f >= 4 && m >= 3, "Loyal Customers")
      .when(r >= 4 && f >= 3, "Potential Loyalists")
      .when(r >= 4 && f <= 2, "New Customers")
      .when(m >= 4, "Big Spenders")
      .when(f >= 3 && r >= 3, "Regular Customers")
      .when(r <= 2 && f >= 3 && m >= 3, "Need Attention")
      .when(r <= 2 && f >= 2 && m >= 2, "At Risk")
      // unreachable: f>=4 && m>=4 is caught by "Loyal Customers" above —
      // kept in the reference's exact order (SURVEY §7.5#3)
      .when(r <= 2 && f >= 4 && m >= 4, "Can't Lose Them")
      .when(r <= 2, "Hibernating")
      .otherwise("Lost")

  /** End-to-end: scores + segment + avg basket value with div-0 guard
    * (`analytics.py:312`). */
  def segments(tx: DataFrame, customer: String, basket: String, sales: String,
               day: String): DataFrame =
    scores(tx, customer, basket, sales, day)
      .withColumn("rfm_segment",
        segmentExpr(col("r_score"), col("f_score"), col("m_score")))
      .withColumn("avg_basket_value",
        round(when(col("frequency") > 0, col("monetary") / col("frequency"))
          .otherwise(lit(0.0)), 6))
}
