package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.operators.{Dedup, NearDup}

/** Connected-components A/B: plain min-label propagation vs adaptive
  * pointer-jumping (r16 judge ask #6 — the 10× fixture showed the
  * propagation fixpoint depth growing with cluster size, 34→52 jobs;
  * before 100× a diameter-linear block count becomes the family's
  * floor multiplier). Runs the exact q_neardup_components input (LSH
  * edges over the fixture corpus, same parameters as the registered
  * query) through `Dedup.connectedComponents` with `doubling` on and
  * off, printing wall seconds and Spark job counts per rep, plus the
  * number of label rows, so SCALE.md can record the keep-or-revert
  * decision with same-day measurements.
  *
  * Usage: `runMain graft.tools.CcBench <sfDir> [reps]`.
  */
object CcBench {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val reps = if (args.length > 1) args(1).toInt else 3
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val jobs = new java.util.concurrent.atomic.AtomicInteger(0)
    spark.sparkContext.addSparkListener(
      new org.apache.spark.scheduler.SparkListener {
        override def onJobStart(
            js: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
          jobs.incrementAndGet(); ()
        }
      })

    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    // same recipe as the q_neardup_components registration
    def edges() = NearDup.minHashPortableUnsorted(
      docs, "doc_id", "text", 3, 0.05, 16, 4)
      .select(col("id_a"), col("id_b"))
    val nodes = docs.select(col("doc_id").as("id"))

    for (doubling <- Seq(true, false); r <- 1 to reps) {
      val j0 = jobs.get()
      val t0 = System.nanoTime()
      val n = Dedup.connectedComponents(nodes, edges(),
        maxIter = 60, doubling = doubling).count()
      val dt = (System.nanoTime() - t0) / 1e9
      val dj = jobs.get() - j0
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.values
        .foreach(_.unpersist(blocking = false))
      println(f"[cc] doubling=$doubling rep$r wall=$dt%.2f s " +
        f"jobs=$dj rows=$n")
    }
    spark.stop()
  }
}
