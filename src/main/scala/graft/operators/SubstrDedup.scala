package graft.operators

import graft.plans.GraftExtensions
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Exact-substring duplicate-span detection and removal — the ExactSubstr
  * stage of Lee et al. 2022, "Deduplicating Training Data Makes Language
  * Models Better" (arXiv:2107.06499), re-expressed relationally: instead
  * of a parallel suffix array, a duplicated SPAN is recovered as a maximal
  * run of word positions whose k-word grams each occur ≥2 times in the
  * corpus. Any substring of ≥ k words that appears twice anywhere (across
  * documents or within one) makes every gram it contains duplicated, so
  * the maximal runs are exactly the paper's ≥ k-token duplicate spans;
  * tokenization here is a plain single-space word split (normalize
  * whitespace upstream if the corpus needs it — the oracle mirrors the
  * same split).
  *
  * 100 TB shape: the gram stream is (id, position, 8-byte digest) — the
  * gram TEXT never leaves the map side. Finding duplicated digests is one
  * digest-keyed shuffle with map-side partial counts; marking positions is
  * a semi join on the digest (AQE broadcasts when the duplicated set is
  * small); run-merging is one window at the duplicated-position grain
  * (tiny relative to the corpus — only duplicated positions survive to
  * it). The strip never shuffles word grains at all: spans aggregate to
  * doc grain and the rebuild is a map-side array filter. A 60-bit digest
  * collision can only FALSELY mark a gram duplicated — the conservative
  * direction for dedup (drops a little extra data, never keeps a dup).
  *
  * No counterpart in the reference (its corpus is transactional); part of
  * the LLM-training-data surface the brief adds.
  */
object SubstrDedup {

  /** (id, i, h): the 8-byte digest of the k-word gram starting at 1-based
    * word position `i`, for every position of every document with ≥ k
    * words. */
  def gramPositions(docs: DataFrame, id: String, text: String,
                    k: Int): DataFrame = {
    GraftExtensions.register(docs.sparkSession)
    docs.select(col(id).as("id"), split(col(text), " ").as("ws"))
      .where(size(col("ws")) >= k)
      .select(col("id"),
        explode(sequence(lit(1), size(col("ws")) - (k - 1))).as("i"),
        col("ws"))
      .select(col("id"), col("i"),
        call_function("md5_prefix60",
          concat_ws(" ", slice(col("ws"), col("i"), lit(k)))).as("h"))
  }

  /** Maximal contiguous duplicated word regions per document: the union
    * of the word intervals `[i, i+k-1]` of every duplicated gram start
    * `i`, merged into maximal contiguous runs (1-based, inclusive).
    * Returns (id, span_start, span_end, n_words).
    *
    * Gaps-and-islands over the duplicated gram starts — but merged on
    * INTERVAL contiguity, not start adjacency: two duplicated grams whose
    * starts differ by ≤ k cover overlapping or touching word ranges (a
    * start `i` with `i − prev ≤ k−1` overlaps the previous gram's words;
    * `i − prev = k` touches them), so a new island begins only when
    * `i − prev > k`. */
  def duplicateSpans(docs: DataFrame, id: String, text: String,
                     k: Int): DataFrame = {
    val grams = gramPositions(docs, id, text, k)
    val dup = grams.groupBy(col("h")).agg(count(lit(1)).as("c"))
      .where(col("c") >= 2).select(col("h"))
    val dupPos = grams.join(dup, Seq("h"), "left_semi")
    val w = Window.partitionBy(col("id")).orderBy(col("i"))
    dupPos
      .withColumn("brk",
        when(col("i") - lag(col("i"), 1).over(w) > k, 1L).otherwise(0L))
      .withColumn("grp", sum(col("brk"))
        .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy(col("id"), col("grp"))
      .agg(min(col("i")).as("span_start"),
        (max(col("i")) + (k - 1)).cast("long").as("span_end"))
      .select(col("id").as(id), col("span_start").cast("long"),
        col("span_end"),
        (col("span_end") - col("span_start") + 1).as("n_words"))
  }

  /** The corpus with every duplicated span removed from every document —
    * ALL occurrences go, not all-but-one: removal is then a pure
    * per-document decision (no cross-document coordination at rebuild
    * time), deterministic under retries and re-partitioning; the paper's
    * keep-one policy is a consumer-side exemption of the min-(id, start)
    * occurrence if a copy must survive. Documents emptied by the strip
    * stay, with empty text (token-budget accounting downstream sees the
    * doc). Returns (id, text, n_kept, n_removed) in word counts. */
  def stripDuplicateSpans(docs: DataFrame, id: String, text: String,
                          k: Int): DataFrame = {
    val spans = duplicateSpans(docs, id, text, k)
      .groupBy(col(id))
      .agg(collect_list(struct(col("span_start").as("s"),
        col("span_end").as("e"))).as("__spans"))
    docs.join(spans, Seq(id), "left_outer")
      .select(col(id), split(col(text), " ").as("ws"), col("__spans"))
      .select(col(id), col("ws"),
        filter(col("ws"), (_, i0) => col("__spans").isNull ||
          !exists(col("__spans"),
            s => i0 + 1 >= s.getField("s") && i0 + 1 <= s.getField("e")))
          .as("kept"))
      .select(col(id), concat_ws(" ", col("kept")).as(text),
        size(col("kept")).cast("long").as("n_kept"),
        (size(col("ws")) - size(col("kept"))).cast("long").as("n_removed"))
  }
}
