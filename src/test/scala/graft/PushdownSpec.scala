package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Scan-efficiency guard: filters and projections must REACH the parquet
  * scan, not run as post-scan Spark filters over full-width rows. The
  * brief's test — ".explain shows PushedFilters / ReadSchema" — made
  * mechanical: representative operators are built on sf0.001 and their
  * FileSourceScan metadata is asserted to carry (a) the pushed
  * predicates and (b) a ReadSchema pruned to the touched columns. A
  * refactor that breaks pushdown (e.g. wrapping the filter column in a
  * non-pushable expression, or materializing before filtering) fails
  * here at test time instead of as a 100 TB full scan.
  */
class PushdownSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"
  private def t = graft.sources.Tables(spark, dir)

  private def meta(df: DataFrame, key: String): Seq[String] = {
    // simpleString truncates, so pull full metadata off the scan nodes;
    // use the pre-adaptive physical plan — AQE wraps any plan containing
    // an exchange and hides its scans from collect() until execution
    import org.apache.spark.sql.execution.FileSourceScanExec
    df.queryExecution.sparkPlan.collect {
      case s: FileSourceScanExec => s.metadata.getOrElse(key, "")
    }
  }

  test("range filter pushes its bounds into the lineitem scan") {
    val df = graft.operators.TableService.rangeFilter(t.lineitem,
      Map("l_quantity" -> (Some(10.0), Some(20.0))))
    val pushed = meta(df, "PushedFilters").mkString(" ")
    assert(pushed.contains("GreaterThanOrEqual(l_quantity,10.0)") &&
      pushed.contains("LessThanOrEqual(l_quantity,20.0)"), pushed)
  }

  test("projection prunes the orders scan to the touched columns") {
    val df = t.orders.select(col("o_orderkey"), col("o_custkey"))
    val schema = meta(df, "ReadSchema").mkString(" ")
    assert(schema.contains("o_orderkey") && schema.contains("o_custkey"))
    assert(!schema.contains("o_totalprice") && !schema.contains("o_comment"),
      schema)
  }

  test("equality predicate on documents pushes and prunes together") {
    val df = t.documents.where(col("source") === "src0")
      .select(col("doc_id"))
    val pushed = meta(df, "PushedFilters").mkString(" ")
    val schema = meta(df, "ReadSchema").mkString(" ")
    assert(pushed.contains("EqualTo(source,src0)"), pushed)
    // the scan must read only the filter column + the projected column,
    // never the wide text body
    assert(!schema.contains("text"), schema)
  }

  test("IsNotNull from a join key reaches the scan side") {
    val df = graft.operators.AssociationRules.itemsets(
      t.lineitem, "l_orderkey", "l_partkey")
    val pushed = meta(df, "PushedFilters").mkString(" ")
    assert(pushed.contains("IsNotNull(l_partkey)"), pushed)
    val schema = meta(df, "ReadSchema").mkString(" ")
    assert(!schema.contains("l_comment") && !schema.contains("l_shipdate"),
      schema)
  }

  test("deterministic mixing is map-only over a pruned documents scan") {
    val df = graft.operators.Mixing.sampleByRates(t.documents,
      "doc_id", "source", Map("src0" -> 500), 600)
      .select(col("doc_id"), col("source"))
    // rate sampling is a per-row hash predicate: the plan must contain
    // NO exchange (a shuffle here would be a scale bug) and the scan
    // must never read the wide text body
    val plan = df.queryExecution.sparkPlan
    import org.apache.spark.sql.execution.exchange.Exchange
    assert(plan.collect { case e: Exchange => e }.isEmpty, plan.toString)
    val schemas = meta(df, "ReadSchema").filter(_.nonEmpty)
    assert(schemas.nonEmpty)
    schemas.foreach(s => assert(!s.contains("text"), s))
  }
}
