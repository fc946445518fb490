package graft.operators

import graft.plans.GraftExtensions
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** C4/CCNet-style line-level boilerplate removal: lines that recur across
  * many distinct documents (navigation headers, cookie banners, footers,
  * "subscribe" calls-to-action) are corpus noise, and the standard
  * curation move (C4 §2.2 of Raffel et al. 2020; CCNet paragraph dedup of
  * Wenzek et al. 2020) is to drop every occurrence of any line seen in
  * ≥ `minDocs` documents while keeping each document's remaining lines in
  * their original order.
  *
  * Scale shape (the part that matters at 100 TB):
  *  - the frequent-line table is found with a DIGEST-grain aggregation —
  *    `md5_prefix60(line)` (the native codegen'd 60-bit digest) is the
  *    group key, so the shuffle carries 8-byte keys with map-side partial
  *    `count_distinct` collapse, never line bodies;
  *  - the surviving-digest set is tiny relative to the corpus (heavy
  *    hitters only) and joins back BROADCAST, so the per-line filter is a
  *    broadcast hash anti-join, not a repartition of the corpus;
  *  - reassembly groups the kept lines by document — the one body-grain
  *    shuffle, the same cost class as every other whole-corpus rewrite
  *    (and avoidable entirely when the consumer wants line grain).
  *
  * No counterpart in the reference (its corpus is relational rows); part
  * of the LLM-training-data surface the brief adds.
  */
object Boilerplate {

  /** One row per (doc, line position): `id, pos, line`. `split` with
    * limit -1 keeps trailing empty lines, matching DuckDB's `str_split`
    * exactly — an off-by-one here silently shifts every position. */
  private def lineGrain(docs: DataFrame, id: String, text: String): DataFrame =
    docs.select(col(id).as("id"),
      posexplode(split(col(text), "\n", -1)).as(Seq("pos", "line")))

  /** The frequent-line (boilerplate) table: every line occurring in at
    * least `minDocs` distinct documents, with its document count. The
    * representative line text rides along as `min(line)` per digest — the
    * partial agg keeps one candidate per digest per partition, so bodies
    * never fan into the shuffle. */
  def frequentLines(docs: DataFrame, id: String, text: String,
                    minDocs: Long): DataFrame = {
    GraftExtensions.register(docs.sparkSession)
    require(minDocs >= 2, "minDocs < 2 would flag every line as boilerplate")
    lineGrain(docs, id, text)
      .withColumn("h", call_function("md5_prefix60", col("line")))
      .groupBy(col("h"))
      .agg(min(col("line")).as("line"),
        count_distinct(col("id")).as("n_docs"))
      .where(col("n_docs") >= minDocs)
      .drop("h")
  }

  /** Strips every frequent line from every document and reassembles the
    * survivors in original order: `id, n_lines, n_kept, clean_text`.
    * Documents whose every line is boilerplate survive with
    * `n_kept = 0, clean_text = ''` (dropping them is the caller's policy
    * decision, one `where` away). */
  def stripFrequentLines(docs: DataFrame, id: String, text: String,
                         minDocs: Long): DataFrame = {
    GraftExtensions.register(docs.sparkSession)
    val lines = lineGrain(docs, id, text)
      .withColumn("h", call_function("md5_prefix60", col("line")))
    val bad = lines.groupBy(col("h"))
      .agg(count_distinct(col("id")).as("n_docs"))
      .where(col("n_docs") >= minDocs)
      .select(col("h"))
    val kept = lines.join(broadcast(bad), Seq("h"), "left_anti")
      .groupBy(col("id"))
      .agg(count(lit(1)).as("n_kept"),
        concat_ws("\n", transform(
          array_sort(collect_list(struct(col("pos"), col("line")))),
          s => s.getField("line"))).as("clean_text"))
    docs.select(col(id).as("id"),
        size(split(col(text), "\n", -1)).cast("long").as("n_lines"))
      .join(kept, Seq("id"), "left")
      .select(col("id"), col("n_lines"),
        coalesce(col("n_kept"), lit(0L)).as("n_kept"),
        coalesce(col("clean_text"), lit("")).as("clean_text"))
  }
}
