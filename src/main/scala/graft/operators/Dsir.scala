package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** DSIR-style importance resampling for data selection (Xie et al.,
  * "Data Selection for Language Models via Importance Resampling",
  * NeurIPS 2023): score every raw-corpus document by the log-likelihood
  * ratio of a target-distribution bag-of-hashed-unigrams model vs the raw
  * distribution, then keep the top-scoring documents. Documents that look
  * like the target (e.g. a curated eval/reference split) score high.
  *
  * Exactness contract: per-bucket log weights are rounded to integer
  * MICRO-units (×1e6) first, and each document's score is then an exact
  * BIGINT sum of those integers — order-free across partitions, so the
  * score is reproducible cross-engine (a raw double sum would depend on
  * reduction order). Word hashing reuses the md5-derived portable hash.
  *
  * 100 TB shape: the fitted model is V bucket weights (V = `numBuckets`,
  * thousands) — a broadcast dimension; scoring is a map-side hash join
  * over the raw word stream plus ONE shuffle at the doc grain. Fitting is
  * two bucket-grain aggregations (V distinct keys). Nothing ever pairs
  * documents. No reference counterpart; part of the LLM-training-data
  * surface the brief adds.
  */
object Dsir {

  /** Portable word→bucket hash: first 15 hex digits of md5 mod
    * `numBuckets` (same digest trick as [[NearDup.minHashPortable]]),
    * computed by the native [[graft.plans.Md5Prefix60]] expression —
    * bit-equal to the `conv(substr(md5(w), 1, 15), 16, 10)` hex-route
    * SQL the oracle keeps. */
  private def bucketExpr(numBuckets: Int): String =
    s"md5_prefix60(w) % $numBuckets"

  /** (id, bucket) per word OCCURRENCE — the multiset, map-only. */
  def wordBuckets(docs: DataFrame, id: String, text: String,
                  numBuckets: Int): DataFrame = {
    graft.plans.GraftExtensions.register(docs.sparkSession)
    docs.select(col(id).as("id"),
        explode(split(trim(col(text)), "\\s+")).as("w"))
      .select(col("id"), expr(bucketExpr(numBuckets)).as("b"))
  }

  /** Fitted per-bucket importance weights in micro-units:
    * `round(1e6 · (ln p̂_target(b) − ln p̂_raw(b)))` with add-one
    * smoothing, `p̂(b) = (count(b)+1)/(N+V)`. V rows — broadcastable. */
  def bucketWeights(raw: DataFrame, target: DataFrame, id: String,
                    text: String, numBuckets: Int): DataFrame = {
    val tb = wordBuckets(target, id, text, numBuckets)
    val rb = wordBuckets(raw, id, text, numBuckets)
    val tc = tb.groupBy(col("b")).agg(count(lit(1)).as("ct"))
    val rc = rb.groupBy(col("b")).agg(count(lit(1)).as("cr"))
    val totals = tb.agg(count(lit(1)).as("nt"))
      .crossJoin(rb.agg(count(lit(1)).as("nr")))
    val v = lit(numBuckets.toDouble)
    tc.join(rc, Seq("b"), "full_outer")
      .crossJoin(broadcast(totals))
      .select(col("b"),
        floor((log((coalesce(col("ct"), lit(0L)) + lit(1.0)) /
            (col("nt") + v)) -
          log((coalesce(col("cr"), lit(0L)) + lit(1.0)) /
            (col("nr") + v))) * 1e6 + 0.5)
          .cast("long").as("wm"))
  }

  /** Per-document importance scores over the raw corpus: exact BIGINT sum
    * of the micro-unit bucket weights of every word occurrence. */
  def importanceScores(raw: DataFrame, target: DataFrame, id: String,
                       text: String, numBuckets: Int = 1024): DataFrame = {
    val wts = bucketWeights(raw, target, id, text, numBuckets)
    wordBuckets(raw, id, text, numBuckets)
      .join(broadcast(wts), Seq("b"))
      .groupBy(col("id"))
      .agg(count(lit(1)).as("n_words"), sum(col("wm")).as("score_micro"))
      .select(col("id").as(id), col("n_words"), col("score_micro"))
  }

  /** Top-`k` most-target-like raw documents — the selection step. */
  def selectTopK(raw: DataFrame, target: DataFrame, id: String,
                 text: String, k: Int, numBuckets: Int = 1024): DataFrame =
    importanceScores(raw, target, id, text, numBuckets)
      .orderBy(col("score_micro").desc, col(id))
      .limit(k)
}
