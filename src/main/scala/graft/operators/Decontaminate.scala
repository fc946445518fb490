package graft.operators

import graft.functions.ColumnFns.stableRound
import graft.plans.GraftExtensions
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Benchmark decontamination for a training corpus — remove every corpus
  * document that shares at least one character k-gram with a held-out
  * evaluation/benchmark set (the GPT-3 appendix-C / PaLM style overlap
  * filter, done here with exact k-gram matching rather than fuzzy
  * containment).
  *
  * 100 TB shape: both sides reduce to DISTINCT (id, digest(k-gram))
  * streams — the join key is the native codegen'd 8-byte `md5_prefix60`
  * digest, never the text (and never a 32-char hex string), so the
  * shuffle carries ~16 bytes per gram regardless of document size. A
  * 60-bit collision can only FALSELY MATCH a gram, i.e. conservatively
  * drop an extra corpus document — the safe direction for
  * decontamination (at 10^12 corpus grams expect ~400 spurious gram
  * matches; contaminated docs usually share many grams, so the marginal
  * doc loss is noise). The benchmark side is a
  * dimension table (eval suites are millions of grams at most): Spark's
  * AQE broadcasts it, making the contamination check a map-side semi join
  * over the corpus gram stream. The corpus-side `distinct` is a partial
  * (map-side) aggregate first, so repeated grams within a partition never
  * reach the shuffle.
  *
  * No counterpart exists in the reference (its corpus is transactional);
  * this is part of the LLM-training-data surface the brief adds.
  */
object Decontaminate {

  /** (id, digest-of-k-gram) per document, distinct when `dedup`.
    * Documents shorter than `k` characters contribute nothing. The
    * 8-byte gram digest (not the gram) is what flows into every
    * downstream shuffle. `dedup = false` skips the per-doc distinct
    * aggregate — correct (and measurably cheaper) whenever the consumer
    * is duplicate-insensitive, like the semi-join probe side in
    * [[contaminatedIds]]: the probe stream never shuffles, so the
    * distinct would pay a full hash aggregate to save nothing. */
  def gramHashes(docs: DataFrame, id: String, text: String,
                 k: Int, dedup: Boolean = true): DataFrame = {
    GraftExtensions.register(docs.sparkSession)
    // fused native gram+hash ([[graft.plans.CharGramHashes]]): same
    // values as transform(sequence, i -> substring) → md5_prefix60,
    // without the interpreted substring lambda and the k-char copy per
    // position (a 30-gram re-copies every char ~30×; the digest reads
    // byte slices of the original buffer). Short docs yield an empty
    // array — the explode drops them like the length(text) >= k gate.
    val g = docs.select(col(id).as("id"),
      explode(call_function("char_gram_hashes", col(text), lit(k)))
        .as("h"))
    if (dedup) g.distinct() else g
  }

  /** Distinct (id, digest-of-w-word-gram) per document — the GPT-3
    * appendix-C unit (13-gram word overlap). Reuses the near-dup
    * shingle stream; documents shorter than `w` words contribute
    * nothing. */
  def wordGramHashes(docs: DataFrame, id: String, text: String,
                     w: Int, dedup: Boolean = true): DataFrame = {
    GraftExtensions.register(docs.sparkSession)
    // fused native shingle+hash ([[graft.plans.WordShingleHashes]]):
    // same values as rawShingles → md5_prefix60, without materializing
    // a 13-word gram STRING per position (13-grams re-copy each word
    // ~13×; the digest streams the token bytes instead)
    val g = docs.select(col(id).as("id"),
      explode(call_function("word_shingle_hashes", col(text), lit(w)))
        .as("h"))
    if (dedup) g.distinct() else g
  }

  private def overlapIds(corpusGrams: DataFrame, benchGrams: DataFrame,
                         id: String): DataFrame =
    corpusGrams
      .join(benchGrams.select(col("h")).distinct(), Seq("h"), "left_semi")
      .select(col("id").as(id))
      .distinct()

  /** Corpus ids sharing ≥1 character k-gram with `bench`. */
  def contaminatedIds(corpus: DataFrame, bench: DataFrame, id: String,
                      text: String, k: Int): DataFrame =
    overlapIds(gramHashes(corpus, id, text, k, dedup = false),
      gramHashes(bench, id, text, k), id)

  /** Corpus ids sharing ≥1 w-word gram with `bench` (GPT-3 style;
    * w = 13 in the paper). */
  def contaminatedIdsWordGrams(corpus: DataFrame, bench: DataFrame,
                               id: String, text: String,
                               w: Int = 13): DataFrame =
    overlapIds(wordGramHashes(corpus, id, text, w, dedup = false),
      wordGramHashes(bench, id, text, w), id)

  /** The corpus with every document sharing a w-word gram with `bench`
    * removed. */
  def decontaminateWordGrams(corpus: DataFrame, bench: DataFrame,
                             id: String, text: String,
                             w: Int = 13): DataFrame =
    corpus.join(contaminatedIdsWordGrams(corpus, bench, id, text, w),
      Seq(id), "left_anti")

  /** The corpus with every benchmark-contaminated document removed. */
  def decontaminate(corpus: DataFrame, bench: DataFrame, id: String,
                    text: String, k: Int): DataFrame =
    corpus.join(contaminatedIds(corpus, bench, id, text, k),
      Seq(id), "left_anti")

  /** Per-source contamination report: documents checked, documents hit,
    * contamination rate. */
  def contaminationStats(corpus: DataFrame, bench: DataFrame, id: String,
                         text: String, source: String, k: Int): DataFrame = {
    val bad = contaminatedIds(corpus, bench, id, text, k)
      .withColumn("contaminated", lit(1L))
    corpus.select(col(id), col(source))
      .join(bad, Seq(id), "left_outer")
      .groupBy(col(source))
      .agg(count(lit(1)).as("n_docs"),
        coalesce(sum(col("contaminated")), lit(0L)).as("n_contaminated"))
      .select(col(source), col("n_docs"), col("n_contaminated"),
        stableRound(col("n_contaminated").cast("double") / col("n_docs"), 6)
          .as("contamination_rate"))
  }
}
