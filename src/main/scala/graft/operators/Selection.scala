package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Score-based corpus selection: keep the best `frac` of documents by a
  * quality score — the final cut a curation pipeline makes once every
  * document carries one (heuristic quality, distilled-classifier
  * probability, LM perplexity, DSIR weight).
  *
  * Two backends with the same contract, mirroring the RFM qcut pair:
  *  - [[keepTopFraction]] — EXACT: the ⌈frac·n⌉ best rows under the
  *    total order (score desc, id asc). Plans as a per-partition partial
  *    top-k merged once (`TakeOrderedAndProject`) — no single-partition
  *    window over the corpus, but the k merged rows do pass through one
  *    task, so this is the oracle/gate path and the right call whenever
  *    k is selection-sized (top 100k of a corpus), not corpus-sized.
  *  - [[keepAboveQuantile]] — SCALABLE: threshold at the approximate
  *    (1−frac) score quantile, broadcast back as a map-side filter. One
  *    linear aggregation + one map-only pass, no global sort at all;
  *    keep-rate lands within the sketch's rank error of `frac` (the
  *    ±ε·n documents nearest the cut are the only ones that can differ
  *    from the exact answer).
  *
  * No reference counterpart — LLM-training-data surface from the brief.
  */
object Selection {

  /** Exact top-`frac` selection: ⌈frac·n⌉ rows, best-first total order
    * (score desc, id asc). One scalar count (driver probe, same class as
    * the engine's max-day probes) sizes the limit. */
  def keepTopFraction(docs: DataFrame, id: String, score: String,
                      frac: Double): DataFrame = {
    require(frac > 0.0 && frac <= 1.0, "frac must be in (0, 1]")
    val n = docs.count()
    val k = math.ceil(frac * n).toLong
    require(k <= Int.MaxValue, "selection too large for the exact path — " +
      "use keepAboveQuantile")
    docs.orderBy(col(score).desc, col(id).asc).limit(k.toInt)
  }

  /** Scalable quantile-threshold selection: keeps every row with
    * `score >= approx (1-frac) quantile`. `accuracy` is Spark's
    * `percentile_approx` knob (1/accuracy ≈ relative rank error). Fully
    * lazy — the threshold is a 1-row broadcast, never a driver value. */
  def keepAboveQuantile(docs: DataFrame, id: String, score: String,
                        frac: Double, accuracy: Int = 10000): DataFrame = {
    require(frac > 0.0 && frac <= 1.0, "frac must be in (0, 1]")
    val th = docs.agg(percentile_approx(col(score),
      lit(1.0 - frac), lit(accuracy)).as("__th"))
    docs.crossJoin(broadcast(th))
      .where(col(score) >= col("__th"))
      .drop("__th")
  }
}
