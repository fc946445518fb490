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
}
