package graft.operators

import graft.functions.ColumnFns.stableRound
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text-analysis operators for a document corpus — training-data pipeline
  * surface: quality scoring, token counting, language ID, fingerprinting.
  * Everything is a codegen'd column expression over one scan; at 100 TB
  * these run as a single map-only stage (no shuffle at all until an
  * aggregation is asked for).
  */
object TextAnalysis {

  private val stopwords = Seq("the", "a", "an", "of", "and", "or", "in",
    "to", "is", "it", "on", "for", "with", "as", "at", "by")

  /** Whitespace tokens. */
  def tokens(text: Column): Column = split(trim(text), "\\s+")

  /** BPE-ish subword count estimate: whitespace tokens plus an extra token
    * per 4 chars of long words (a deterministic stand-in for a real BPE
    * vocab, which would be a broadcast lookup at the same plumbing). */
  def tokenCountEstimate(text: Column): Column = {
    val words = tokens(text)
    aggregate(words, lit(0L),
      (acc, w) => acc + greatest(lit(1L),
        ceil(length(w).cast("double") / 4.0).cast("long")))
  }

  /** Per-document quality metrics (length / punctuation / stopword /
    * digit ratios — the standard pre-training quality filters). */
  def qualityMetrics(docs: DataFrame, id: String, text: String): DataFrame = {
    val t = col(text)
    val w = tokens(t)
    val nChars = length(t).cast("long")
    val nWords = size(w).cast("long")
    val stopArr = array(stopwords.map(lit): _*)
    docs.select(col(id).as("id"),
      nChars.as("n_chars"),
      nWords.as("n_words"),
      stableRound(nChars.cast("double") / nWords, 6).as("avg_word_len"),
      stableRound(length(regexp_replace(t, "[^.,;:!?]", "")).cast("double")
        / nChars, 6).as("punct_ratio"),
      stableRound(length(regexp_replace(t, "[^0-9]", "")).cast("double")
        / nChars, 6).as("digit_ratio"),
      stableRound(size(filter(w, x => array_contains(stopArr, x))).cast("double")
        / nWords, 6).as("stopword_ratio"),
      tokenCountEstimate(t).as("token_estimate"))
  }

  /** Composite quality score in [0,1]: length sweet-spot × stopword
    * presence × punctuation sanity (the usual heuristic-filter shape). */
  def qualityScore(docs: DataFrame, id: String, text: String): DataFrame =
    qualityMetrics(docs, id, text).select(col("id"),
      stableRound(
        least(col("n_words").cast("double") / 50.0, lit(1.0)) *
          least(col("stopword_ratio") * 5.0 + 0.5, lit(1.0)) *
          (lit(1.0) - least(col("punct_ratio") * 5.0, lit(1.0)) * 0.5),
        6).as("quality_score"))

  /** Language ID by stopword-profile voting: score each candidate language
    * by the fraction of tokens in its profile, pick the argmax
    * (n-gram-heuristic class; profiles are tiny broadcast literals). */
  def languageId(docs: DataFrame, id: String, text: String): DataFrame = {
    val profiles: Seq[(String, Seq[String])] = Seq(
      "en" -> Seq("the", "a", "of", "and", "in", "to", "is", "it", "for"),
      "de" -> Seq("der", "die", "das", "und", "ist", "ein", "zu", "mit"),
      "fr" -> Seq("le", "la", "les", "et", "est", "un", "une", "dans"),
      "es" -> Seq("el", "la", "los", "y", "es", "un", "una", "en", "de"),
      "zh" -> Seq("de", "le", "shi", "zai", "he", "you"))
    val w = lower(col(text))
    val toks = tokens(w)
    val scores = profiles.map { case (lang, words) =>
      val arr = array(words.map(lit): _*)
      (size(filter(toks, x => array_contains(arr, x))).cast("double")
        / size(toks)).as(s"score_$lang")
    }
    val scored = docs.select((col(id).as("id") +: scores): _*)
    val best = profiles.map(_._1).foldLeft(
      (lit(""), lit(-1.0))) { case ((bl, bs), lang) =>
      val s = col(s"score_$lang")
      (when(s > bs, lit(lang)).otherwise(bl), greatest(s, bs))
    }
    scored.select(col("id"), best._1.as("lang_pred"),
      stableRound(best._2, 6).as("lang_score"))
  }

  /** Document fingerprints: full-content MD5 plus the minimum shingle MD5
    * (a 1-hash MinHash — the rolling-hash fingerprint class). Both are
    * engine-portable hex strings. */
  def fingerprints(docs: DataFrame, id: String, text: String,
                   w: Int = 3): DataFrame = {
    val sh = NearDup.shingles(docs, id, text, w)
      .groupBy(col("id")).agg(min(md5(col("s"))).as("min_shingle_md5"))
    docs.select(col(id).as("id"), md5(col(text)).as("content_md5"))
      .join(sh, Seq("id"), "left")
  }
}
