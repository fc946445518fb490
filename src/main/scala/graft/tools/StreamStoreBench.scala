package graft.tools

import org.apache.spark.sql.SparkSession

/** In-JVM A/B of the streaming state-store provider for the five
  * registered q_stream_* queries (r17 judge ask #4): HDFS-backed
  * in-memory (the default) vs RocksDB
  * (`spark.sql.streaming.stateStore.providerClass`, read per query
  * start, so it can be flipped between runs inside one JVM). The
  * streaming queries' residual cost is micro-batch machinery — one
  * state store (open + snapshot + commit) per partition per batch per
  * stateful operator — which is exactly what the provider choice
  * prices. Conditions interleave, order alternates per rep (CfBisect
  * discipline); row counts are REQUIREd equal across providers (the
  * aggregations are exact, so any divergence is a bug).
  *
  * Usage: `runMain graft.tools.StreamStoreBench` with the usual
  * `SPARK_GRAFT_SF_DIR` / `SPARK_GRAFT_CPUS` / `SPARK_GRAFT_REPS`.
  */
object StreamStoreBench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR",
      "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val reps = sys.env.getOrElse("SPARK_GRAFT_REPS", "3").toInt
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val providers = Seq(
      "hdfs" -> ("org.apache.spark.sql.execution.streaming" +
        ".state.HDFSBackedStateStoreProvider"),
      "rocksdb" -> ("org.apache.spark.sql.execution.streaming" +
        ".state.RocksDBStateStoreProvider"))
    val queries = Seq("q_stream_windows", "q_stream_join",
      "q_stream_dedup", "q_stream_sessions", "q_stream_neardup")

    val mins = scala.collection.mutable.Map[(String, String), Double]()
      .withDefaultValue(Double.MaxValue)
    val rows = scala.collection.mutable.Map[(String, String), Long]()
    // warm-up: one pass per provider
    for ((_, cls) <- providers; q <- queries) {
      spark.conf.set("spark.sql.streaming.stateStore.providerClass", cls)
      graft.SparkEntry.queries(q)(spark, sfDir).count()
    }
    for (r <- 1 to reps;
         (pname, cls) <- if (r % 2 == 1) providers else providers.reverse;
         q <- queries) {
      spark.conf.set("spark.sql.streaming.stateStore.providerClass", cls)
      val t0 = System.nanoTime()
      val n = graft.SparkEntry.queries(q)(spark, sfDir).count()
      val dt = (System.nanoTime() - t0) / 1e9
      val k = (q, pname)
      mins(k) = math.min(mins(k), dt)
      rows.get(k) match {
        case None => rows(k) = n
        case Some(p) => require(p == n, s"$q/$pname row drift: $n vs $p")
      }
      println(f"[streamstore] $q $pname rep$r wall=$dt%.3f s rows=$n")
    }
    for (q <- queries) {
      require(rows((q, "hdfs")) == rows((q, "rocksdb")),
        s"$q providers disagree on rows")
      println(f"[streamstore] $q: hdfs_min=${mins((q, "hdfs"))}%.3f s " +
        f"rocksdb_min=${mins((q, "rocksdb"))}%.3f s")
    }
    spark.stop()
  }
}
