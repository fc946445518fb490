package graft

import graft.operators.{Decontaminate, Dedup, Mixing}
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
}
