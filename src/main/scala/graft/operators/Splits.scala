package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Deterministic train/validation/test corpus splits: each document's
  * split follows from the md5-derived [[Mixing.bucket1000]] of its id
  * alone — never from partitioning, task retries, or a seed stream — so
  * membership is reproducible by any engine auditing the corpus and
  * stable across re-runs, the property an eval holdout MUST have (a doc
  * drifting between train and test silently contaminates the eval). The
  * principled form of the ad-hoc `id % 10` holdouts used elsewhere in
  * the gates. Map-only; no reference counterpart — part of the
  * LLM-training-data surface the brief adds.
  */
object Splits {

  /** Adds a `split` column: buckets `[0, trainPermille)` → "train",
    * `[trainPermille, trainPermille+valPermille)` → "val", the rest →
    * "test". Permille thresholds give exact, auditable boundaries. */
  def assignSplit(docs: DataFrame, id: String,
                  trainPermille: Int = 900,
                  valPermille: Int = 50): DataFrame = {
    require(trainPermille >= 0 && valPermille >= 0 &&
      trainPermille + valPermille <= 1000,
      "permille thresholds must be non-negative and sum to <= 1000")
    val b = Mixing.bucket1000(col(id))
    docs.withColumn("split",
      when(b < trainPermille, lit("train"))
        .when(b < trainPermille + valPermille, lit("val"))
        .otherwise(lit("test")))
  }

  /** The one-line eval-holdout filter: keep only the named split. */
  def onlySplit(docs: DataFrame, id: String, split: String,
                trainPermille: Int = 900, valPermille: Int = 50): DataFrame =
    assignSplit(docs, id, trainPermille, valPermille)
      .where(col("split") === split).drop("split")

  /** Deterministic global training shuffle, sharded: the data-loader
    * manifest a training run consumes. Every document gets a `shard`
    * in [0, nShards) and a contiguous `pos` (0-based) within its shard;
    * reading the shards in (shard, pos) order IS a uniform global
    * shuffle of the corpus, and a different `epoch` re-derives a fresh
    * independent permutation — all three columns follow from the
    * md5 of (epoch, id) alone, so the order is reproducible by any
    * engine, immune to partitioning and task retries (the property
    * [[assignSplit]] establishes for membership, extended to ORDER —
    * a seed-stream `rand()` shuffle has neither).
    *
    * Scale shape: one exchange on `shard` (nShards ≫ cores at scale,
    * so the per-shard rank windows run wide in parallel and no shard
    * outgrows a task: shards are corpus/nShards by hash uniformity);
    * the shard hash and the order hash are INDEPENDENT digests (")s("
    * vs ")p(" domain tags), so within-shard order does not correlate
    * with shard assignment. */
  def trainingShards(docs: DataFrame, id: String, nShards: Int,
                     epoch: Int = 0): DataFrame = {
    require(nShards >= 1, "nShards must be >= 1")
    def h(tag: String) = conv(substring(md5(
        concat(lit(epoch.toString), lit(tag), col(id).cast("string"))),
      1, 15), 16, 10).cast("long")
    docs
      .withColumn("shard", pmod(h(")s("), lit(nShards.toLong)))
      .withColumn("__h", h(")p("))
      .withColumn("pos", (row_number()
        .over(org.apache.spark.sql.expressions.Window
          .partitionBy(col("shard"))
          .orderBy(col("__h"), col(id))) - 1).cast("long"))
      .drop("__h")
  }
}
