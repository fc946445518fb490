package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
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

  /** ADAPTIVE per-group top-`frac` (FineWeb-style: each crawl dump /
    * source keeps its own best quarter, so a uniformly-verbose source
    * cannot crowd out the rest the way one global threshold lets it):
    * within each group keep the ⌈frac·n_group⌉ best rows under the total
    * order (score desc, id asc).
    *
    * ONE exchange on the group key: the rank and the group size are two
    * window functions over the same partitioning, so Catalyst plans a
    * single shuffle with both Window operators riding it. The sort is
    * per-GROUP, never global — groups are sources/dumps (thousands at
    * most), each sorting its own slice in parallel. For a group too
    * large to sort, [[keepAboveQuantileByGroup]] is the threshold form
    * of the same cut. */
  def keepTopFractionByGroup(docs: DataFrame, id: String, score: String,
                             group: String, frac: Double): DataFrame = {
    require(frac > 0.0 && frac <= 1.0, "frac must be in (0, 1]")
    val byGroup = Window.partitionBy(col(group))
    docs
      .withColumn("__rn", row_number()
        .over(byGroup.orderBy(col(score).desc, col(id).asc)).cast("long"))
      .withColumn("__n", count(lit(1)).over(byGroup))
      // ceil(frac · n): double product of an exact integer — the same
      // IEEE steps on any engine, so the cut row is engine-independent
      .where(col("__rn") <= ceil(lit(frac) * col("__n")).cast("long"))
      .drop("__rn", "__n")
  }

  /** Scalable per-group threshold: each group keeps rows at or above its
    * own approximate (1−frac) score quantile. One linear aggregation at
    * the group grain (sketches merge map-side), broadcast back as a
    * map-only filter — no per-group sort at all; keep-rate per group
    * lands within the sketch's rank error of `frac`. */
  def keepAboveQuantileByGroup(docs: DataFrame, id: String, score: String,
                               group: String, frac: Double,
                               accuracy: Int = 10000): DataFrame = {
    require(frac > 0.0 && frac <= 1.0, "frac must be in (0, 1]")
    val th = docs.groupBy(col(group)).agg(percentile_approx(col(score),
      lit(1.0 - frac), lit(accuracy)).as("__th"))
    docs.join(broadcast(th), Seq(group))
      .where(col(score) >= col("__th"))
      .drop("__th")
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

  /** Absolute per-group cap (the FineWeb/crawl "domain cap": no source
    * may contribute more than `n` documents, whatever its size): within
    * each group keep the `n` best rows under the total order
    * (score desc, id asc). One exchange + per-group sort — the parity
    * path, right when no group is too large to sort in one task. */
  def capPerGroup(docs: DataFrame, id: String, score: String,
                  group: String, n: Int): DataFrame = {
    require(n >= 1, "cap must be >= 1")
    docs
      .withColumn("__rn", row_number()
        .over(Window.partitionBy(col(group))
          .orderBy(col(score).desc, col(id).asc)).cast("long"))
      .where(col("__rn") <= n)
      .drop("__rn")
  }

  /** [[capPerGroup]] for SKEWED groups — EXACT, unlike the quantile
    * fallbacks: a boilerplate-heavy domain with 10⁹ documents would
    * serialize [[capPerGroup]]'s window through one task, so this runs
    * the standard two-phase top-n instead. Phase 1 takes the per-
    * (group, salt) top n — `nSalts` parallel sorts of ~1/nSalts of each
    * group — which provably keeps every global top-n row (a row beaten
    * n times within its own salt is beaten n times in the full group);
    * phase 2 re-ranks the ≤ nSalts·n survivors per group, a frame
    * bounded by groups·nSalts·n rows regardless of corpus size.
    * Bit-equal to [[capPerGroup]] under the same total order — gated by
    * the same oracle SQL. The salt is md5-derived from the id
    * (deterministic, engine-portable), never a partition id — and from
    * its OWN domain-tagged digest, not [[Mixing.bucket1000]]: a corpus
    * already filtered by the library's bucket1000-based samplers (e.g.
    * `sampleByRates` at 50‰ keeps only buckets 0–49) would collapse a
    * bucket-derived salt onto a few values and quietly hand the hot
    * group back to one task (the same independence argument as
    * [[Splits.trainingShards]]' ")s("/")p(" tags). */
  def capPerGroupSalted(docs: DataFrame, id: String, score: String,
                        group: String, n: Int,
                        nSalts: Int = 32): DataFrame = {
    require(n >= 1 && nSalts >= 1, "cap and nSalts must be >= 1")
    val salted = docs.withColumn("__salt",
      pmod(conv(substring(md5(concat(lit(")cap("),
          col(id).cast("string"))), 1, 15), 16, 10).cast("long"),
        lit(nSalts.toLong)))
    val phase1 = salted
      .withColumn("__rn", row_number()
        .over(Window.partitionBy(col(group), col("__salt"))
          .orderBy(col(score).desc, col(id).asc)).cast("long"))
      .where(col("__rn") <= n)
      .drop("__rn", "__salt")
    capPerGroup(phase1, id, score, group, n)
  }
}
