package graft.tools

import org.apache.spark.sql.SparkSession
import scala.jdk.CollectionConverters._

/** Diagnostic main for the q_cf_recommendations round-over-round
  * oscillation (round-10 and round-12 judge ask: bisect the
  * standalone-vs-family delta — r10 6.24 s, r11 5.70 s, r12 6.18 s on
  * identical code for the standalone plan).
  *
  * Design: the suspect is NOT the plan (bench_details.json "jobs" shows
  * the min draw submits the same 19 jobs whether the query runs alone or
  * after the family queries), so the delta must be environmental — JVM
  * heap/GC debt left by the immediately-preceding q_cf_family draw
  * (alphabetical pass order puts it directly before q_cf_recommendations
  * in every timed pass), or plain ambient drift between captures.
  * Back-to-back single-query bench runs cannot separate the two: this
  * box drifts by more than the effect size between runs (measured
  * 2026-08-15: the same 4-query plain configuration scored 6.12 s and
  * then 8.23 s twenty minutes apart, sentinels clean in both). So this
  * main INTERLEAVES the two conditions in one process — draw pairs
  * (isolated rec) vs (family, then rec) in alternation — which cancels
  * slow drift, and records per-draw GC wall time so a heap-debt
  * explanation is measurable rather than asserted.
  *
  * Findings land in SCALE.md#adjudicated-q_cf_recommendations. */
object CfBisect {
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
    val rec = graft.SparkEntry.queries("q_cf_recommendations")
    val fam = graft.SparkEntry.queries("q_cf_family")
    val gcBeans =
      java.lang.management.ManagementFactory.getGarbageCollectorMXBeans
    def gcMs: Long = gcBeans.asScala.map(_.getCollectionTime).sum

    def draw(fn: (SparkSession, String) => org.apache.spark.sql.DataFrame,
             dir: String): (Double, Long) = {
      val g0 = gcMs
      val t0 = System.nanoTime()
      fn(spark, dir).count()
      val dt = (System.nanoTime() - t0) / 1e9
      val dg = gcMs - g0
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.values
        .foreach(_.unpersist(blocking = false))
      (dt, dg)
    }
    // same two-tier warm-up discipline as graft.Bench. Order matters:
    // the warm-up must END on a rec draw so the first loop iteration's
    // "isolated" sample really follows a rec draw (ending on fam would
    // put 1/reps of the isolated samples in the adjacent condition and
    // deflate the measured delta).
    for (d <- Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01")
         if new java.io.File(d).isDirectory) {
      draw(fam, d); draw(rec, d)
    }
    draw(fam, sfDir); draw(rec, sfDir) // untimed C2 warm at target SF
    // third condition: family draw, then an explicit drain (blocking
    // unpersist + a 1 s idle window for the async ContextCleaner /
    // shuffle-file deletion to finish) before the rec draw. If the
    // adjacency tax vanishes here, the debt is TRANSIENT background
    // work, not persistent state (page cache, allocator).
    def drain(): Unit = {
      spark.sparkContext.getPersistentRDDs.values
        .foreach(_.unpersist(blocking = true))
      Thread.sleep(1000)
    }
    val iso = Vector.newBuilder[(Double, Long)]
    val adj = Vector.newBuilder[(Double, Long)]
    val drn = Vector.newBuilder[(Double, Long)]
    for (i <- 1 to reps) {
      val a = draw(rec, sfDir) // follows a rec draw: light debt
      val f = draw(fam, sfDir)
      val b = draw(rec, sfDir) // follows the family draw: heavy debt
      val f2 = draw(fam, sfDir)
      drain()
      val c = draw(rec, sfDir) // follows family + explicit drain
      iso += a; adj += b; drn += c
      println(f"[cfbisect] pair $i: isolated=${a._1}%.3fs gc=${a._2}ms " +
        f"family=${f._1}%.3fs adjacent=${b._1}%.3fs gc=${b._2}ms " +
        f"family2=${f2._1}%.3fs drained=${c._1}%.3fs gc=${c._2}ms")
    }
    def report(tag: String, v: Vector[(Double, Long)]): Unit = {
      val t = v.map(_._1)
      println(f"[cfbisect] $tag min=${t.min}%.3f " +
        f"median=${t.sorted.apply(t.size / 2)}%.3f " +
        f"gc_ms=${v.map(_._2).mkString(",")}")
    }
    report("isolated", iso.result())
    report("adjacent", adj.result())
    report("drained ", drn.result())
    spark.stop()
  }
}
