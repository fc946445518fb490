package graft

import org.apache.spark.sql.SparkSession

/** Times a single registered query (optionally printing its formatted
  * plan) — the per-query drill-down companion to [[Bench]].
  *
  * Usage: `runMain graft.Profile <query_name> [sfDir]`; set
  * `GRAFT_EXPLAIN=1` to dump the formatted physical plan, `GRAFT_REPS=n`
  * to run it n times (warm-cache timings).
  */
object Profile {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val reps = sys.env.getOrElse("GRAFT_REPS", "1").toInt
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val fn = SparkEntry.queries(name)
    (1 to reps).foreach { i =>
      if (sys.env.contains("GRAFT_CLEARCACHE")) spark.catalog.clearCache()
      val t0 = System.nanoTime()
      val df = fn(spark, sfDir)
      if (sys.env.contains("GRAFT_EXPLAIN") && i == 1) df.explain("formatted")
      val n = df.count()
      val dt = (System.nanoTime() - t0) / 1e9
      println(f"[profile] $name rep $i: $n rows in $dt%.2f s")
    }
    spark.stop()
  }
}
