package graft.operators

import org.apache.spark.ml.feature.{HashingTF, MinHashLSH}
import graft.functions.ColumnFns.stableRound
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Near-duplicate detection for a document corpus — the training-data
  * pipeline surface (brief requirement; exact-dedup lives in [[Dedup]]).
  *
  * Three detectors, in increasing scale-friendliness:
  *  1. [[jaccardPairs]] — EXACT w-shingle Jaccard via shingle self-join.
  *     O(Σ per-shingle doc-count²): correct but quadratic in hot shingles;
  *     the ground-truth baseline the approximate paths are judged against.
  *  2. [[minHashCandidates]] — MinHash + banded LSH
  *     (`ml.feature.MinHashLSH`, Broder '97): shuffle is
  *     (doc, band-bucket) pairs only; candidate pairs then exact-verified.
  *     THE 100 TB path: no all-pairs stage, skew bounded by bucket size.
  *  3. [[simHash]] — 64-bit SimHash (Charikar '02) per doc; near-dups have
  *     small Hamming distance; candidates found by exact match on rotated
  *     16-bit bands (4 bands ⇒ Hamming ≤ 3 guaranteed candidate).
  *
  * All shingling is native array-lambda expressions (codegen-friendly,
  * no UDF).
  */
object NearDup {

  /** Distinct word w-shingles per doc: (id, shingle). Docs shorter than
    * `w` words drop out. */
  def shingles(docs: DataFrame, id: String, text: String,
               w: Int = 3): DataFrame = {
    val words = docs.select(col(id).as("id"),
      split(trim(col(text)), "\\s+").as("wa"))
    words.where(size(col("wa")) >= w)
      .select(col("id"), explode(expr(
        s"""transform(sequence(1, size(wa) - ${w - 1}), i ->
           |  concat_ws(' ', ${(0 until w).map(j => s"element_at(wa, i + $j)")
             .mkString(", ")}))""".stripMargin)).as("s"))
      .distinct()
  }

  /** Exact pairwise Jaccard over shingle sets: self-join on shingle →
    * intersection counts → |A∩B| / (|A|+|B|−|A∩B|). Keep pairs with
    * jaccard ≥ `minJaccard`, top `limit` by similarity. */
  def jaccardPairs(docs: DataFrame, id: String, text: String, w: Int = 3,
                   minJaccard: Double = 0.0, limit: Int = 200): DataFrame = {
    val sh = shingles(docs, id, text, w).cache()
    val sizes = sh.groupBy(col("id")).agg(count(lit(1)).as("sz"))
    val inter = sh.toDF("id_a", "s")
      .join(sh.toDF("id_b", "s"), Seq("s"))
      .where(col("id_a") < col("id_b"))
      .groupBy(col("id_a"), col("id_b"))
      .agg(count(lit(1)).as("inter"))
    inter
      .join(broadcast(sizes.toDF("id_a", "sz_a")), Seq("id_a"))
      .join(broadcast(sizes.toDF("id_b", "sz_b")), Seq("id_b"))
      .select(col("id_a"), col("id_b"),
        stableRound(col("inter").cast("double") /
          (col("sz_a") + col("sz_b") - col("inter")), 6).as("jaccard"))
      .where(col("jaccard") >= minJaccard)
      .orderBy(col("jaccard").desc, col("id_a"), col("id_b"))
      .limit(limit)
  }

  /** MinHash-LSH candidate pairs with exact-Jaccard verification of the
    * candidates. `numHashTables` = LSH bands; more tables → higher recall.
    * Returns (id_a, id_b, jaccard) for candidates with jaccard ≥
    * `minJaccard`. Scale shape: shingle→sparse-vector, per-band bucket
    * join, candidate verify — never all-pairs. */
  def minHashCandidates(docs: DataFrame, id: String, text: String,
                        w: Int = 3, minJaccard: Double = 0.5,
                        numHashTables: Int = 8,
                        seed: Long = 42L): DataFrame = {
    val sh = shingles(docs, id, text, w)
      .groupBy(col("id")).agg(collect_list(col("s")).as("sh"))
    val tf = new HashingTF().setInputCol("sh").setOutputCol("features")
      .setNumFeatures(1 << 18).setBinary(true)
    val vecs = tf.transform(sh).select(col("id"), col("features"))
    val lsh = new MinHashLSH().setInputCol("features").setOutputCol("mh")
      .setNumHashTables(numHashTables).setSeed(seed)
    val model = lsh.fit(vecs)
    model.approxSimilarityJoin(vecs, vecs, 1.0 - minJaccard, "dist")
      .select(col("datasetA.id").as("id_a"), col("datasetB.id").as("id_b"),
        stableRound(lit(1.0) - col("dist"), 6).as("jaccard"))
      .where(col("id_a") < col("id_b"))
      .orderBy(col("jaccard").desc, col("id_a"), col("id_b"))
  }

  /** 64-bit SimHash per doc from word-token hashes: each token votes ±1 on
    * every bit position of its xxhash64; the sign of the vote sum is the
    * fingerprint bit. Backed by the native [[graft.plans.SimHash64]]
    * expression — the equivalent `aggregate(zip_with(...))` HOF form costs
    * tokens×64 interpreted lambda calls per document. */
  def simHash(docs: DataFrame, id: String, text: String): DataFrame = {
    graft.plans.GraftExtensions.register(docs.sparkSession)
    docs.select(col(id).as("id"),
        split(trim(col(text)), "\\s+").as("wa"))
      .where(size(col("wa")) > 0)
      .select(col("id"),
        call_function("simhash64", col("wa")).as("simhash"))
  }

  /** SimHash near-dup candidates: docs agreeing on any 16-bit band of the
    * fingerprint (guarantees candidacy for Hamming ≤ 3), verified by exact
    * Hamming ≤ `maxHamming`. Bucket join per band — linear shuffle. */
  def simHashPairs(docs: DataFrame, id: String, text: String,
                   maxHamming: Int = 3): DataFrame = {
    val fp = simHash(docs, id, text).cache()
    val banded = fp.select(col("id"), col("simhash"),
        explode(expr(
          """transform(sequence(0, 3), b -> named_struct(
            |  'band', b,
            |  'key', (simhash >> (b * 16)) & 65535L))""".stripMargin))
          .as("bk"))
      .select(col("id"), col("simhash"), col("bk.band"), col("bk.key"))
    val cand = banded.toDF("id_a", "sh_a", "band", "key")
      .join(banded.toDF("id_b", "sh_b", "band", "key"), Seq("band", "key"))
      .where(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"), col("sh_a"), col("sh_b"))
      .distinct()
    cand
      .withColumn("hamming",
        expr("CAST(bit_count(sh_a ^ sh_b) AS BIGINT)"))
      .where(col("hamming") <= maxHamming)
      .select(col("id_a"), col("id_b"), col("hamming"))
      .orderBy(col("hamming"), col("id_a"), col("id_b"))
  }
}
