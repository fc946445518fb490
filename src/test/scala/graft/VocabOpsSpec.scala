package graft

import graft.operators.{HeavyHitters, NearDup, Terms}
import org.apache.spark.sql.functions._

/** Round-14 corpus-vocabulary + incremental-near-dup operators:
  * Misra–Gries exact heavy hitters, the vocab-coverage curve, the
  * blocked inverted index, and the persisted-signature incremental
  * near-dup. The cross-engine oracles gate values; these tests pin the
  * ALGORITHMIC contracts (superset guarantee, block bounds, index
  * persistence roundtrip) on fixtures built to stress them. */
class VocabOpsSpec extends SparkSpec {
  import spark.implicits._

  /** Zipf-ish skewed corpus: "hot" 40%, "warm" 20%, tail of singletons.
    * 1000 tokens across 20 docs (50 tokens each). */
  private def skewed = {
    val toks = Array.tabulate(1000) { i =>
      if (i % 5 < 2) "hot" else if (i % 5 == 2) "warm"
      else s"tail${i}"
    }
    toks.grouped(50).zipWithIndex
      .map { case (g, i) => (i.toLong, g.mkString(" ")) }
      .toSeq.toDF("doc_id", "text")
  }

  test("heavy hitters: MG scale path is bit-equal to the parity path " +
      "on a skewed corpus, and keeps exactly the >1/denom terms") {
    val parity = HeavyHitters.frequentTerms(skewed, "text", 8)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
    val mg = HeavyHitters.frequentTermsMG(skewed, "text", 8)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
    assert(parity.toSeq == mg.toSeq)
    // exact membership: hot (400/1000 > 1/8) and warm (200/1000 > 1/8)
    // pass; every tail singleton fails
    assert(parity.map(_._1).toSet == Set("hot", "warm"))
    assert(parity.find(_._1 == "hot").get._2 == 400L)
  }

  test("heavy hitters: MG path equality is partitioning-invariant " +
      "(candidate sets may differ, output may not)") {
    val wide = skewed.repartition(13)
    val narrow = skewed.coalesce(1)
    val a = HeavyHitters.frequentTermsMG(wide, "text", 8)
      .collect().map(_.toSeq)
    val b = HeavyHitters.frequentTermsMG(narrow, "text", 8)
      .collect().map(_.toSeq)
    assert(a.toSeq == b.toSeq)
  }

  test("heavy hitters: threshold is strict (a term at exactly 1/denom " +
      "is excluded)") {
    // 4 tokens, "x" appears 2 = exactly 1/2 of total: 2·2 > 4 is false
    val df = Seq((1L, "x x y z")).toDF("doc_id", "text")
    assert(HeavyHitters.frequentTerms(df, "text", 2).count() == 0L)
    assert(HeavyHitters.frequentTermsMG(df, "text", 2).count() == 0L)
  }

  test("vocab coverage: minCount=1 row covers the whole corpus and the " +
      "curve is monotone") {
    val rows = Terms.vocabCoverage(skewed, "doc_id", "text", 1L)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getDouble(4)))
    // ordered min_count DESC → vocab_size and tokens_covered ascend
    assert(rows.map(_._3).toSeq == rows.map(_._3).sorted.toSeq)
    assert(rows.map(_._4).toSeq == rows.map(_._4).sorted.toSeq)
    val last = rows.last // min_count = 1: everything covered
    assert(last._1 == 1L && last._4 == 1000L && last._5 == 1.0)
    // hot=400, warm=200, 400 singletons → vocab at min_count≥200 is 2
    assert(rows.find(_._1 == 200L).get._3 == 2L)
  }

  test("inverted index: df telescopes over blocks, every block is " +
      "within the cap, postings ascend") {
    val idx = Terms.invertedIndex(skewed, "doc_id", "text", 3)
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getString(4)))
    // "hot" appears in every doc (20 docs, cap 3 → 7 blocks)
    val hot = idx.filter(_._1 == "hot")
    assert(hot.length == 7 && hot.map(_._4).sum == 20L)
    assert(hot.forall(_._2 == 20L) && hot.forall(_._4 <= 3L))
    assert(hot.map(_._3).sorted.toSeq == (0L until 7L))
    // postings within a block ascend, and blocks don't overlap
    val allIds = hot.sortBy(_._3)
      .flatMap(_._5.split(",").map(_.toLong))
    assert(allIds.toSeq == allIds.sorted.toSeq && allIds.distinct.length == 20)
    // a singleton term gets exactly one block of one doc
    val tails = idx.filter(_._1.startsWith("tail"))
    assert(tails.forall(t => t._2 == 1L && t._3 == 0L && t._4 == 1L))
  }

  test("incremental near-dup: a persisted-and-reloaded index matches an " +
      "exact batch copy at 16/16 and never matches a fresh doc") {
    val corp = Seq(
      (1L, "alpha bravo charlie delta echo foxtrot golf hotel india " +
        "juliet kilo lima mike november oscar papa"),
      (2L, "totally different corpus document about spark plans and " +
        "shuffle exchange reuse in catalyst land")
    ).toDF("id", "text")
    val dirPath = java.nio.file.Files.createTempDirectory("graft_nd_idx")
    val dir = dirPath.toString
    try {
      NearDup.minHashSignatures(corp, "id", "text")
        .write.mode("overwrite").parquet(dir)
      val index = spark.read.parquet(dir) // the standing, persisted index
      val batch = Seq(
        (101L, corp.where($"id" === 1L).head().getString(1)), // exact copy
        (102L, "entirely fresh text with no overlap at all whatsoever " +
          "none zero zilch nada nothing here matches")
      ).toDF("id", "text")
      val out = NearDup.minHashIncremental(index,
          NearDup.minHashSignatures(batch, "id", "text"))
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      assert(out.contains((101L, 1L, 16L)))
      assert(!out.exists(_._1 == 102L))
    } finally { // r14 advice: the temp index leaked a dir per test run
      import java.nio.file.{Files, Path}
      import scala.jdk.CollectionConverters._
      Files.walk(dirPath).iterator().asScala.toSeq.reverse
        .foreach((p: Path) => Files.deleteIfExists(p))
    }
  }

  test("incremental near-dup: a one-word tail edit survives the " +
      "8/16-component threshold") {
    val base = "alpha bravo charlie delta echo foxtrot golf hotel india " +
      "juliet kilo lima mike november oscar papa quebec romeo sierra " +
      "tango uniform victor whiskey xray yankee zulu"
    val corp = Seq((1L, base)).toDF("id", "text")
    val batch = Seq((101L, base + " appended")).toDF("id", "text")
    val out = NearDup.minHashIncremental(
        NearDup.minHashSignatures(corp, "id", "text"),
        NearDup.minHashSignatures(batch, "id", "text"))
      .collect()
    assert(out.length == 1 && out.head.getLong(2) >= 8L)
  }

  test("index search: conjunctive retrieval through the blocked index " +
      "equals the direct answer, including multi-block terms") {
    // blockSize 2 forces "hot" (20 docs) across 10 blocks — retrieval
    // must union a term's blocks before intersecting
    val idx = Terms.invertedIndex(skewed, "doc_id", "text", 2)
    val hit = Terms.searchIndex(idx, Seq("hot", "tail3"))
      .collect().map(_.getLong(0))
    // tail3 occurs once, in the doc holding global token 3 (doc 0)
    assert(hit.toSeq == Seq(0L))
    // all-docs term alone returns every doc
    assert(Terms.searchIndex(idx, Seq("hot")).count() == 20L)
    // duplicate query terms must not double-count
    assert(Terms.searchIndex(idx, Seq("hot", "hot", "tail3"))
      .collect().map(_.getLong(0)).toSeq == Seq(0L))
    // an absent term empties the conjunction
    assert(Terms.searchIndex(idx, Seq("hot", "nosuchterm")).count() == 0L)
  }

  test("heavy hitters MG plan: the recount joins THROUGH a broadcast " +
      "(candidates are never shuffled against the token stream)") {
    val plan = HeavyHitters.frequentTermsMG(skewed, "text", 8)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin") ||
      plan.contains("BroadcastNestedLoopJoin"))
  }

  test("index search: an empty conjunction is rejected loudly, not " +
      "answered with zero rows") {
    val idx = Terms.invertedIndex(skewed, "doc_id", "text", 2)
    intercept[IllegalArgumentException] {
      Terms.searchIndex(idx, Seq.empty)
    }
  }

  test("heavy hitters parity plan: the token total rides the term " +
      "aggregate's exchange (one tokenize scan, ReusedExchange)") {
    // r14 derived the total from a second full tokenize of the corpus
    // (the advice's finding); the fix sums the vocab aggregate itself,
    // sharing the term-hash exchange — pinned here so a refactor can't
    // silently reintroduce the extra corpus scan. AQE materializes the
    // reuse at execution (the initial plan carries two structurally
    // equal exchanges), so the query runs before the plan is read.
    val q = HeavyHitters.frequentTerms(skewed, "text", 8)
    q.collect()
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("ReusedExchange"), plan)
  }
}
