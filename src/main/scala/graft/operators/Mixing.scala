package graft.operators

import graft.operators.TextAnalysis.tokenCountEstimate
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Corpus mixing for training-data assembly: per-source down-sampling,
  * epoch-style up-sampling, and token-budget truncation — the knobs a
  * Pile/Dolma-style mixture spec turns.
  *
  * All sampling here is DETERMINISTIC: membership depends only on the
  * document id (an md5-derived bucket, portable digest arithmetic
  * expressible in any SQL engine), never on partitioning, task retries,
  * or a seed stream.
  * That is the property that matters at 100 TB — a retry-safe, resumable
  * sample whose membership can be re-derived by any engine auditing the
  * mix. Everything is map-only except the budget cumsum (one shuffle on
  * the source key).
  *
  * No counterpart exists in the reference; part of the LLM-training-data
  * surface the brief adds.
  */
object Mixing {

  /** Deterministic per-id bucket in [0, 1000): first 15 hex digits of
    * `md5(cast(id as string))` mod 1000 — the same portable digest trick
    * as [[Dsir]]/[[NearDup.minHashPortable]], expressible in any SQL
    * engine (`('0x' || substr(md5(...), 1, 15))::BIGINT % 1000`).
    *
    * Why a digest and not an LCG: a multiplicative step `id·a + c mod m`
    * reaches only `m / gcd(a, m)` buckets — the previous constants
    * (1103515245, mod 1000) shared a factor 5 and hit just 200 of the
    * 1000 buckets, quantizing every sampling rate to 5‰ steps with upward
    * bias. The md5 bucket reaches all 1000 uniformly, has no overflow for
    * any id (the digest input is the decimal string), and is safe for
    * negative ids (no pmod-vs-% sign divergence — the digest value is
    * always non-negative). */
  def bucket1000(idCol: Column): Column =
    pmod(conv(substring(md5(idCol.cast("string")), 1, 15), 16, 10)
      .cast("long"), lit(1000L))

  /** Per-source Bernoulli down-sampling at `permille(source)`/1000,
    * deterministic in the id. Sources absent from the map keep
    * `defaultPermille`/1000 of their documents. */
  def sampleByRates(docs: DataFrame, id: String, source: String,
                    permille: Map[String, Int],
                    defaultPermille: Int): DataFrame = {
    require((defaultPermille +: permille.values.toSeq)
      .forall(r => r >= 0 && r <= 1000), "rates are permille in [0,1000]")
    val rate = permille.foldLeft(lit(defaultPermille)) {
      case (acc, (src, r)) => when(col(source) === src, lit(r)).otherwise(acc)
    }
    docs.where(bucket1000(col(id)) < rate)
  }

  /** Epoch-style up-sampling: each document of source `s` appears
    * `epochs(s)` times (default 1), tagged with an `epoch` ordinal —
    * the "wiki ×3" trick of curated training mixes. Map-only explode;
    * row-count inflation is the caller's explicit choice. */
  def upsampleEpochs(docs: DataFrame, source: String,
                     epochs: Map[String, Int],
                     defaultEpochs: Int = 1): DataFrame = {
    require((defaultEpochs +: epochs.values.toSeq).forall(_ >= 1),
      "epoch counts are >= 1")
    val n = epochs.foldLeft(lit(defaultEpochs)) {
      case (acc, (src, e)) => when(col(source) === src, lit(e)).otherwise(acc)
    }
    docs.withColumn("epoch",
      explode(sequence(lit(1L), n.cast("long"))))
  }

  /** Token-budget truncation: per source, keep documents in ascending-id
    * order while the running token estimate stays within `budgetTokens`.
    * One shuffle (partition by source) + one in-partition sort; the token
    * estimate is the BPE-ish [[TextAnalysis.tokenCountEstimate]]. A doc
    * that crosses the budget line is dropped, as are all after it. */
  def takeByTokenBudget(docs: DataFrame, id: String, text: String,
                        source: String, budgetTokens: Long): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(source)).orderBy(col(id))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
        org.apache.spark.sql.expressions.Window.currentRow)
    docs.withColumn("est_tokens", tokenCountEstimate(col(text)))
      .withColumn("cum_tokens", sum(col("est_tokens")).over(w))
      .where(col("cum_tokens") <= budgetTokens)
  }
}
