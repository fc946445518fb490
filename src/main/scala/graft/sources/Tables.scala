package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Parquet table loaders for the driver test-data layout
  * (`{dir}/{name}.parquet`, see /root/repo/TESTDATA.md).
  *
  * Mirrors the reference's table-scan surface (SURVEY §2.1 S2:
  * `Website/market/dunnhumby/analytics.py:448-449`,
  * `collab_filter.py:28-31`) — every analysis starts from a full-table
  * scan that the storage engine prunes. On Spark the parquet reader gives
  * us column pruning + predicate pushdown for free as long as callers keep
  * plans declarative (no early collect), so these loaders return lazy
  * DataFrames and never cache.
  *
  * Scale note (100 TB): at cluster scale these would be catalog tables
  * (partitioned by date / bucketed by join key). The loader API is the
  * single seam where that swap happens — operators only ever see
  * DataFrames.
  */
final case class Tables(spark: SparkSession, dir: String) {
  def table(name: String): DataFrame = Tables.cached(spark, s"$dir/$name.parquet")

  // TPC-H-ish star schema
  def region: DataFrame = table("region")
  def nation: DataFrame = table("nation")
  def customer: DataFrame = table("customer")
  def supplier: DataFrame = table("supplier")
  def part: DataFrame = table("part")
  def orders: DataFrame = table("orders")
  def lineitem: DataFrame = table("lineitem")

  // Event stream table. Driver generations have written `ts` three ways:
  // parquet TIMESTAMP(NANOS) (Spark's vectorized reader rejects it — read
  // as nanos-long via the legacy conf and rebuilt with integer `div`; a
  // double division would lose precision at 1e18 nanos), TIMESTAMP(MICROS,
  // isAdjustedToUTC=false) (read natively as TIMESTAMP_NTZ), and plain
  // TIMESTAMP. All three are canonicalized to TimestampType here so every
  // downstream consumer — including type-strict ones like `unix_micros`
  // in the streaming backlog writer — sees one stable schema across data
  // generations. The session timezone is pinned to UTC, so the NTZ→LTZ
  // cast preserves the naive wall-clock values DuckDB sees.
  def events: DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val df = table("events")
    import org.apache.spark.sql.functions.{col, expr, timestamp_micros}
    df.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        df.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case org.apache.spark.sql.types.TimestampType => df
      case _ => df.withColumn("ts", col("ts").cast("timestamp"))
    }
  }

  // training-data pipeline tables
  def documents: DataFrame = table("documents")
  def embeddings: DataFrame = table("embeddings")
}

object Tables {
  /** Per-path SCHEMA cache. Every schema-less `spark.read.parquet`
    * call runs a schema-inference job (one footer read — ~0.02–0.1 s
    * even warm), and a typical registered query loads 2–4 tables, often
    * the same one twice — at 150 bench queries × several draws that is
    * seconds of pure footer re-reads per pass (the stage ledgers show
    * 2–4 `parquet at Tables.scala` jobs leading every query). Caching
    * the inferred `StructType` (immutable, session-free — unlike a
    * cached DataFrame, whose `Dataset.sparkSession` field would pin the
    * session and leak plans for JVM lifetime in multi-session JVMs such
    * as the test suite) and re-reading with `.schema(...)` skips the
    * inference job entirely while building a fresh session-local plan
    * per call. The loader serves these dirs only, and they are
    * immutable test data (the 100 TB deployment swaps this seam for
    * catalog tables, which carry their own metastore schema — same
    * effect). */
  private val schemaCache =
    new java.util.concurrent.ConcurrentHashMap[
      String, org.apache.spark.sql.types.StructType]()

  private def cached(spark: SparkSession, path: String): DataFrame = {
    val schema = schemaCache.computeIfAbsent(
      path, p => spark.read.parquet(p).schema)
    spark.read.schema(schema).parquet(path)
  }

  /** S9 — JDBC source seam (the reference's tables live in SQL Server,
    * `Website/market/market/settings.py:79-92`). Partitioned read so the
    * scan parallelizes across executors; parquet remains the primary
    * format — this exists so a reference deployment can point the engine
    * at its live database without an export step. Tested against an
    * embedded Derby database (SinksAndMlSpec): 4-way partitioned scan,
    * range predicates pushed to the database. */
  def jdbc(spark: SparkSession, url: String, table: String,
           partitionColumn: String, lowerBound: Long, upperBound: Long,
           numPartitions: Int,
           props: java.util.Properties = new java.util.Properties)
      : DataFrame =
    spark.read.option("partitionColumn", partitionColumn)
      .option("lowerBound", lowerBound).option("upperBound", upperBound)
      .option("numPartitions", numPartitions)
      .jdbc(url, table, props)
}
