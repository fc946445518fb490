package graft.operators

import graft.functions.ColumnFns.moneySum
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Time-aware churn feature engineering (SURVEY §2.12;
  * `Website/market/dunnhumby/analytics.py:438-512`).
  *
  * Leak-free design copied from the reference: pick a prediction point in
  * the past (`max_day − offset`), build ALL features from history
  * (`day <= prediction_date`) and the label from the future
  * (`day > prediction_date`, U3 set membership).
  *
  * Spark-first: the reference makes three pandas passes over history
  * (RFM agg, gap diff, variety) plus two merges; here recency / frequency /
  * monetary / variety collapse into ONE hash aggregation, gaps are a
  * partitioned lag window, and the label is a broadcast left join on the
  * distinct future key set — three shuffles total on the customer key,
  * each linear in input. */
object Churn {

  /** Feature frame: one row per customer seen in history with
    * recency / frequency / monetary / product_variety / avg_purchase_gap /
    * is_churn, plus optional demographics (inner join, J5). `day` must be
    * a date column. */
  def features(tx: DataFrame, customer: String, item: String, sales: String,
               day: Column, offsetDays: Int,
               demographics: Option[(DataFrame, String, Seq[String])] = None)
      : DataFrame = {
    // Branch on the axis dtype: the reference's axis is an integer day
    // (`analytics.py:456-461`), the testdata's is a date/timestamp.
    val isNumeric = tx.select(day).schema.head.dataType
      .isInstanceOf[org.apache.spark.sql.types.NumericType]
    val (d, predLit, recencyAgg) =
      if (isNumeric) {
        // parse via double: the axis may be fractional (Double/Decimal day)
        val maxDay = tx.agg(max(day)).head().get(0).toString.toDouble
        val pred = maxDay - offsetDays
        (day, lit(pred), (lit(pred) - max(day)).cast("long"))
      } else {
        val maxDay = tx.agg(max(day.cast("date"))).head().getDate(0)
        val pred = java.sql.Date.valueOf(
          maxDay.toLocalDate.minusDays(offsetDays.toLong))
        (day.cast("date"), lit(pred),
          datediff(lit(pred), max(day.cast("date"))).cast("long"))
      }
    val history = tx.where(d <= predLit)
    val future = tx.where(d > predLit)

    val base = history.groupBy(col(customer)).agg(
      recencyAgg.as("recency"),
      countDistinct(d).as("frequency"),
      moneySum(col(sales)).as("monetary"),
      countDistinct(col(item)).as("product_variety"))

    val gaps = Windows.purchaseGaps(history, customer, d)
      .select(col(customer), col("avg_gap"))

    val labeled = Joins.absenceLabel(
      base.join(gaps, Seq(customer), "left")
        .withColumn("avg_purchase_gap", coalesce(col("avg_gap"), lit(0.0)))
        .drop("avg_gap"),
      customer, future, "is_churn")

    demographics match {
      case Some((dim, dimKey, cols)) =>
        labeled.join(
          broadcast(dim.select((col(dimKey).as(customer) +: cols.map(col)): _*)),
          Seq(customer), "inner")
      case None => labeled
    }
  }
}
