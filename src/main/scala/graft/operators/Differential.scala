package graft.operators

import graft.functions.ColumnFns.{moneySum, stableRound}
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Differential analysis — EP-4, the reference's widest endpoint
  * (SURVEY §3; `Website/market/dunnhumby/views.py:1531-2574`, dispatcher
  * `views.py:2550-2557`).
  *
  * All four comparison modes (time/quarter, customer segment, store,
  * season) follow the same shape: build per-(group, basket) value totals,
  * cap each group's sample (2,500 per time range / 4,000 per store,
  * `views.py:1708-1754`), then run the statistical tests of
  * `compute_statistics` ([[Stats]]) on two selected groups. Here the
  * pyramid is one aggregation + a partitioned sample window + the three
  * test aggregations, all declarative.
  */
object Differential {

  /** Per-(group, basket) money totals — the stat-test input grain
    * (`views.py:1708-1716`). */
  def basketTotalsByGroup(tx: DataFrame, group: Column, basket: Column,
                          sales: Column): DataFrame =
    tx.groupBy(group.as("g"), basket.as("b"))
      .agg(moneySum(sales).as("v"))

  /** Deterministic per-group sample cap (the reference's TOP-2500 pulls;
    * reproducible ordering instead of arbitrary row order). */
  def cappedSample(totals: DataFrame, perGroup: Int): DataFrame =
    Windows.stratifiedSample(totals, col("g"), col("b"), perGroup)
      .select(col("g"), col("b"), col("v"))

  /** Run Welch t, Mann-Whitney U, and 2-sample KS between two groups of
    * the capped totals; one row per test:
    * (test_name, statistic, effect_size, n1, n2, tie_term). `tie_term`
    * carries Σ(t³−t) for the Mann-Whitney sigma tie correction (0 for the
    * other tests). */
  def compare(capped: DataFrame, g1: String, g2: String): DataFrame = {
    val welch = Stats.welchT(capped, col("g"), col("v"), g1, g2)
      .select(lit("welch_t").as("test_name"),
        col("t_stat").as("statistic"),
        col("cohens_d").as("effect_size"), col("n1"), col("n2"),
        lit(0L).as("tie_term"))
    val mwu = Stats.mannWhitneyU(capped, col("g"), col("v"), g1, g2)
      .select(lit("mann_whitney_u").as("test_name"),
        col("u_stat").as("statistic"),
        col("rank_biserial").as("effect_size"), col("n1"), col("n2"),
        col("tie_term"))
    val ks = Stats.ks2(capped, col("g"), col("v"), g1, g2)
      .select(lit("ks_2samp").as("test_name"),
        col("ks_stat").as("statistic"),
        lit(0.0).as("effect_size"), col("n1"), col("n2"),
        lit(0L).as("tie_term"))
    welch.unionByName(mwu).unionByName(ks).orderBy(col("test_name"))
  }

  /** Full quarter-mode pipeline (`views.py:1943-2054` analyze_quarters):
    * per-quarter basket totals → cap → tests between two quarters. */
  def compareQuarters(tx: DataFrame, day: Column, basket: Column,
                      sales: Column, q1: String, q2: String,
                      perGroup: Int = 2500): DataFrame = {
    val totals = basketTotalsByGroup(tx,
      concat(lit("Q"), quarter(day)), basket, sales)
    compare(cappedSample(totals, perGroup), q1, q2)
  }

  /** Driver-side p-values for a [[compare]] result (the scipy boundary). */
  def pValues(results: Array[org.apache.spark.sql.Row],
              welchDof: Double): Map[String, Double] =
    results.map { r =>
      val name = r.getAs[String]("test_name")
      val stat = r.getAs[Double]("statistic")
      val (n1, n2) = (r.getAs[Long]("n1"), r.getAs[Long]("n2"))
      name -> (name match {
        case "welch_t" => Stats.tPValue(stat, welchDof)
        case "mann_whitney_u" =>
          Stats.mannWhitneyPValue(stat, n1, n2, r.getAs[Long]("tie_term"))
        case "ks_2samp" => Stats.ksPValue(stat, n1, n2)
      })
    }.toMap
}
