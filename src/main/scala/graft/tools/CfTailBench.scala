package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** In-JVM A/B of the r18 CF-family anti-join change: the purchased
  * left-anti join's build side target-filtered + broadcast
  * ([[graft.operators.Collab.scoreFromSym]] `antiFilter`) vs the pre-r18
  * SortMergeJoin shape. Conditions INTERLEAVE in one process (the
  * CfBisect discipline — this box drifts by more than typical effect
  * sizes between JVMs), outputs are checksummed (count + Σ xxhash64,
  * order-free) and REQUIREd identical per rep.
  *
  * Usage: `runMain graft.tools.CfTailBench` with the usual
  * `SPARK_GRAFT_SF_DIR` / `SPARK_GRAFT_CPUS` / `SPARK_GRAFT_REPS` env.
  */
object CfTailBench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR",
      "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val reps = sys.env.getOrElse("SPARK_GRAFT_REPS", "4").toInt
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    import graft.operators.{AssociationRules, Collab}
    val t = graft.sources.Tables(spark, sfDir)

    // exactly the q_cf_family registration (same ingest, same
    // rulesParams), with only the anti-join shape toggled
    def family(antiBroadcast: Boolean): DataFrame = {
      val tx = t.lineitem
        .select(col("l_orderkey").as("o_orderkey"), col("l_partkey"),
          col("l_extendedprice"), col("l_quantity"))
        .join(t.orders.select(col("o_orderkey"), col("o_custkey"),
          col("o_orderdate")), Seq("o_orderkey"))
      Collab.cfFamily(
        Collab.userItemCounts(
          tx.repartition(spark.sparkContext.defaultParallelism,
            col("o_custkey"), col("l_partkey")),
          "o_custkey", "l_partkey"),
        AssociationRules.rulesRaw(t.lineitem,
          "l_orderkey", "l_partkey",
          AssociationRules.Params(minSupport = 0.0, minConfidence = 0.0,
            maxRules = 500, pairLimit = 2000, maxBasketSize = 500)),
        5, 0.6, u => u % 50 === 0,
        antiBroadcast = antiBroadcast)
    }

    // order-free checksum: count + Σ xxhash64 over every column
    def sig(df: DataFrame): (Long, java.math.BigDecimal) = {
      val cols = df.columns.map(col).toSeq
      val r = df.agg(count(lit(1)).as("n"),
        coalesce(sum(xxhash64(cols: _*).cast("decimal(38,0)")),
          lit(0).cast("decimal(38,0)")).as("h")).head()
      (r.getLong(0), r.getDecimal(1))
    }

    def cleanup(): Unit = {
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.values
        .foreach(_.unpersist(blocking = false))
    }

    // warm-up: one draw per condition (JIT + file listing)
    Seq(true, false).foreach { v => family(v).count(); cleanup() }

    val walls = scala.collection.mutable.Map[Boolean,
      scala.collection.mutable.ArrayBuffer[Double]]()
      .withDefault(_ => scala.collection.mutable.ArrayBuffer.empty)
    var firstSig: Option[(Long, java.math.BigDecimal)] = None
    // alternate the within-rep order so neither condition always runs
    // in the warmer second slot (pass-adjacency bias, see CfBisect)
    for (r <- 1 to reps;
         v <- if (r % 2 == 1) Seq(true, false) else Seq(false, true)) {
      val t0 = System.nanoTime()
      val s = sig(family(v))
      val dt = (System.nanoTime() - t0) / 1e9
      cleanup()
      firstSig match {
        case None => firstSig = Some(s)
        case Some(f) => require(f == s,
          s"variant antiBroadcast=$v rep$r diverged: $s vs $f")
      }
      val buf = walls(v); buf += dt; walls(v) = buf
      println(f"[cftail] antiBroadcast=$v rep$r wall=$dt%.3f s " +
        f"rows=${s._1} hash=${s._2}")
    }
    Seq(true, false).foreach { v =>
      val w = walls(v)
      println(f"[cftail] antiBroadcast=$v min=${w.min}%.3f s " +
        f"median=${w.sorted.apply(w.size / 2)}%.3f s n=${w.size}")
    }
    spark.stop()
  }
}
