package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  * All queries live in [[Queries.specs]]; this object just adapts them to
  * the driver's shape. */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001: end-to-end association-rule
    * mining (scan → window → per-basket itemsets → pair explode → counts →
    * metrics → top-k), the reference's signature workload (SURVEY §2.10). */
  def entry(spark: SparkSession): DataFrame =
    operators.AssociationRules.rules(
      spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet"),
      "l_orderkey", "l_partkey",
      operators.AssociationRules.Params(
        minSupport = 0.0, minConfidence = 0.0, maxRules = 100))

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    Queries.specs.map(sp => sp.name -> sp.fn).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    Queries.specs.flatMap(sp => sp.oracle.map(sp.name -> _)).toMap
}
