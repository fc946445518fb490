package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.ColumnFns.stableRound

/** CCNet-style n-gram language-model perplexity filtering (Wenzek et al.,
  * "CCNet: Extracting High Quality Monolingual Datasets from Web Crawl
  * Data", LREC 2020): fit a bigram LM with Stupid Backoff smoothing
  * (Brants et al., EMNLP 2007) on a small curated target split, score
  * every raw document by its per-token cross-entropy under that model,
  * and keep the low-perplexity (target-like) head. The classic third
  * quality signal next to heuristic rules ([[TextAnalysis.gopherQuality]])
  * and importance resampling ([[Dsir]]); no reference counterpart — part
  * of the LLM-training-data surface the brief adds.
  *
  * Exactness contract (the [[Dsir]] discipline): every per-transition
  * log-probability is rounded to integer MICRO-units (×1e6) first, and a
  * document's score is then an exact BIGINT sum of those integers —
  * order-free across partitions and bit-reproducible cross-engine. Words
  * hash to `numBuckets` ids via the portable md5-derived
  * [[graft.plans.Md5Prefix60]] expression, mirroring the oracle's
  * `('0x' || substr(md5(w), 1, 15))::BIGINT % V` hex route.
  *
  * 100 TB shape: the model is fitted on the TARGET split (a curated
  * reference corpus — small by construction), giving ≤|target tokens|
  * bigram rows and ≤V unigram rows; Catalyst broadcasts both when they
  * fit and falls back to linear shuffle joins when they don't (no forced
  * `broadcast()` — the bigram table is data-bounded, not V-bounded).
  * Raw-side scoring is MAP-ONLY bigram formation inside the token array
  * (`zip_with` over two slices — the corpus token stream is never
  * shuffled), the model joins, and ONE doc-grain aggregation. Nothing
  * pairs documents.
  */
object NgramLm {

  /** Per-document hashed token-bucket array — map-only. Empty/blank text
    * yields the single bucket of "" (DuckDB's `string_split_regex`
    * agrees), so downstream arithmetic never sees an empty array. */
  def tokenBuckets(docs: DataFrame, id: String, text: String,
                   numBuckets: Int): DataFrame = {
    graft.plans.GraftExtensions.register(docs.sparkSession)
    // w = 1 shingles = per-word hashes, via the fused native expression
    // (one split + tight digest loop per document instead of an
    // interpreted md5 lambda per token); the remaining HOF lambda is a
    // single integer mod
    docs.select(col(id).as("id"),
      transform(
        call_function("word_shingle_hashes", col(text), lit(1)),
        h => h % numBuckets).as("bs"))
  }

  /** One row per ADJACENT token pair `(id, b1, b2)` — still map-only:
    * bigrams are zipped inside the token array, so no shuffle touches
    * the corpus word stream. Single-token documents emit no rows. */
  def transitions(docs: DataFrame, id: String, text: String,
                  numBuckets: Int): DataFrame = {
    val bs = col("bs")
    val pairs = when(size(bs) >= 2, zip_with(
      slice(bs, lit(1), size(bs) - 1),
      slice(bs, lit(2), size(bs) - 1),
      (x, y) => struct(x.as("b1"), y.as("b2"))))
      .otherwise(array().cast("array<struct<b1:bigint,b2:bigint>>"))
    tokenBuckets(docs, id, text, numBuckets)
      .select(col("id"), explode(pairs).as("p"))
      .select(col("id"), col("p.b1"), col("p.b2"))
  }

  /** Fitted model: `(unigrams (b, c1), bigrams (b1, b2, c2), n1 total)`.
    * Two aggregations over the target token stream; both frames are
    * grouped to at most V / V² keys but sized by the observed target. */
  def fit(target: DataFrame, id: String, text: String,
          numBuckets: Int): (DataFrame, DataFrame) = {
    val tk = tokenBuckets(target, id, text, numBuckets)
      .select(col("id"), explode(col("bs")).as("b"))
    val uni = tk.groupBy(col("b")).agg(count(lit(1)).as("c1"))
    val bi = transitions(target, id, text, numBuckets)
      .groupBy(col("b1"), col("b2")).agg(count(lit(1)).as("c2"))
    (uni, bi)
  }

  /** Per-document cross-entropy + perplexity of `raw` under the bigram
    * Stupid-Backoff model fitted on `target`:
    * `p(b2|b1) = c2(b1,b2)/c1(b1)` when the bigram was seen, else
    * `0.4 · (c1(b2)+1)/(n1+V)` (α=0.4 per Brants et al., add-one-smoothed
    * unigram backoff). Output: `(id, n_trans, lp_micro, ppl)` for every
    * raw document with ≥2 tokens, where `lp_micro` is the exact BIGINT
    * sum of micro-rounded log-probs and
    * `ppl = exp(−lp_micro/1e6/n_trans)` rounded to 4 decimals. */
  def perplexity(raw: DataFrame, target: DataFrame, id: String,
                 text: String, numBuckets: Int = 4096): DataFrame = {
    val (uni, bi) = fit(target, id, text, numBuckets)
    val n1 = uni.agg(sum(col("c1")).as("n1"))
    val tr = transitions(raw, id, text, numBuckets)
    val p = when(col("c2").isNotNull,
      col("c2").cast("double") / col("u1c").cast("double"))
      .otherwise(lit(0.4) * (coalesce(col("u2c"), lit(0L)) + lit(1.0)) /
        (col("n1") + lit(numBuckets.toDouble)))
    tr.join(bi, Seq("b1", "b2"), "left")
      .join(uni.select(col("b").as("b1"), col("c1").as("u1c")),
        Seq("b1"), "left")
      .join(uni.select(col("b").as("b2"), col("c1").as("u2c")),
        Seq("b2"), "left")
      .crossJoin(broadcast(n1))
      .select(col("id"),
        floor(log(p) * 1e6 + 0.5).cast("long").as("lpm"))
      .groupBy(col("id"))
      .agg(count(lit(1)).as("n_trans"), sum(col("lpm")).as("lp_micro"))
      .select(col("id").as(id), col("n_trans"), col("lp_micro"),
        stableRound(
          exp(-(col("lp_micro").cast("double") / 1e6) / col("n_trans")),
          4).as("ppl"))
  }

  /** The filter: keep raw documents whose per-token cross-entropy is at
    * most `slack ×` the POOLED corpus cross-entropy
    * `−Σ lp_micro / 10⁶ / Σ n_trans` — self-calibrating (CCNet cuts at
    * score quantiles; a corpus-relative cut needs only ONE scalar
    * aggregate broadcast back, no global sort, so it survives 100 TB).
    * Pooled rather than a per-document mean deliberately: both sums are
    * exact BIGINTs, so the cut is ONE division both engines compute
    * bit-identically — an `avg` over per-doc double ratios would be
    * partition-order-dependent and could flip boundary documents between
    * runs. `slack` = 1.0 keeps the target-like (below-average-entropy)
    * side. */
  def keepBelowPooledCe(raw: DataFrame, target: DataFrame, id: String,
                        text: String, numBuckets: Int = 4096,
                        slack: Double = 1.0): DataFrame = {
    // one materialization of the doc-grain scored frame serves both the
    // cut aggregate and the filtered output — without it the whole
    // corpus-side LM scoring subplan executes twice. localCheckpoint
    // (lazy), not cache(): the checkpoint rides the cut aggregate's own
    // job (no separate materialization action) and does not wrap the
    // plan in an InMemoryRelation, which blocks exchange reuse and AQE
    // sizing (r10 ledger discipline; measured equal-or-better here)
    val scored = perplexity(raw, target, id, text, numBuckets)
      .localCheckpoint(false)
    val ce = -(col("lp_micro").cast("double") / 1e6) / col("n_trans")
    val cut = scored.agg(
      (-(sum(col("lp_micro")).cast("double") / 1e6) /
        sum(col("n_trans"))).as("pooled_ce"))
    scored.crossJoin(broadcast(cut))
      .where(ce <= col("pooled_ce") * slack)
      .drop("pooled_ce")
  }
}
