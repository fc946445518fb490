package graft.ml

import org.apache.spark.ml.{Pipeline, PipelineModel}
import org.apache.spark.ml.classification._
import org.apache.spark.ml.evaluation.MulticlassClassificationEvaluator
import org.apache.spark.ml.feature._
import org.apache.spark.ml.functions.vector_to_array
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** ML pipelines (SURVEY §2.12–2.13;
  * `Website/market/dunnhumby/ml_models.py:231-596`, churn
  * `ml_models.py:1139-1223`).
  *
  * The reference trains a 16-model scikit-learn zoo (4 horizons × 4
  * models) plus an XGBoost churn model. MLlib mapping, with the
  * reference's quirks preserved deliberately (SURVEY §7.5):
  *  - "gradient_boost" is ACTUALLY a second RandomForest in the reference
  *    (`ml_models.py:541`) — reproduced bug-compatibly; a real GBT is also
  *    exposed as "gbt".
  *  - no RBF-kernel SVM in MLlib → LinearSVC on a capped sample
  *    (`ml_models.py:549-553` trains SVC on 5K rows), divergence recorded.
  *  - LabelEncoder-unseen→class-0 ≈ StringIndexer(handleInvalid="keep").
  *  - stratified 80/20 split, seed 42 (`ml_models.py:528-529`) via
  *    per-label sampleBy.
  */
object Models {

  /** Feature preprocessing: index+one-hot categoricals, assemble with
    * numerics, standard-scale (`ml_models.py:416-430`, 535-536). */
  def featureStages(numericCols: Seq[String], categoricalCols: Seq[String])
      : Array[org.apache.spark.ml.PipelineStage] = {
    val indexers = categoricalCols.map(c =>
      new StringIndexer().setInputCol(c).setOutputCol(s"${c}_idx")
        .setHandleInvalid("keep"))
    val encoder =
      if (categoricalCols.nonEmpty)
        Seq(new OneHotEncoder()
          .setInputCols(categoricalCols.map(c => s"${c}_idx").toArray)
          .setOutputCols(categoricalCols.map(c => s"${c}_oh").toArray)
          .setDropLast(true))
      else Seq.empty
    val assembler = new VectorAssembler()
      .setInputCols((numericCols ++ categoricalCols.map(c => s"${c}_oh"))
        .toArray)
      .setOutputCol("rawFeatures")
    val scaler = new StandardScaler().setInputCol("rawFeatures")
      .setOutputCol("features").setWithMean(true).setWithStd(true)
    (indexers ++ encoder ++ Seq(assembler, scaler)).toArray
  }

  /** Stratified train/test split (seed 42): exact per-label fractions via
    * sampleBy + anti-join for the complement. */
  def stratifiedSplit(df: DataFrame, labelCol: String, trainFrac: Double,
                      seed: Long = 42L): (DataFrame, DataFrame) = {
    // cache + materialize: monotonically_increasing_id and sampleBy depend
    // on partition layout, so the sample and its anti-join complement must
    // read the SAME materialization or rows could land in both/neither
    val keyed = df.withColumn("__row_id", monotonically_increasing_id())
      .cache()
    keyed.count()
    val labels = keyed.select(col(labelCol)).distinct().collect()
      .map(_.get(0))
    val train = keyed.stat.sampleBy(labelCol,
      labels.map(l => l -> trainFrac).toMap, seed)
    val test = keyed.join(train.select("__row_id"), Seq("__row_id"),
      "left_anti")
    (train.drop("__row_id"), test.drop("__row_id"))
  }

  /** The model zoo (`ml_models.py:538-543`), MLlib estimators keyed by the
    * reference's names. */
  def zoo(featureCount: Int, seed: Long = 42L)
      : Map[String, org.apache.spark.ml.PipelineStage] = Map(
    "neural_network" -> new MultilayerPerceptronClassifier()
      .setLayers(Array(featureCount, 16, 8, 2)).setMaxIter(100)
      .setSeed(seed).setFeaturesCol("features").setLabelCol("label"),
    "random_forest" -> new RandomForestClassifier().setNumTrees(150)
      .setMaxDepth(15).setMinInstancesPerNode(5).setSeed(seed)
      .setFeaturesCol("features").setLabelCol("label"),
    // bug-compatible: the reference's "gradient_boost" is a 2nd RF
    "gradient_boost" -> new RandomForestClassifier().setNumTrees(150)
      .setMaxDepth(15).setMinInstancesPerNode(5).setSeed(seed + 1)
      .setFeaturesCol("features").setLabelCol("label"),
    "gbt" -> new GBTClassifier().setMaxIter(50).setSeed(seed)
      .setFeaturesCol("features").setLabelCol("label"),
    "svm" -> new LinearSVC().setMaxIter(50)
      .setFeaturesCol("features").setLabelCol("label"))

  /** Churn pipeline (§2.12): preprocess + GBT (closest in-box analogue of
    * the reference's XGBoost binary:logistic, 100 estimators). */
  def churnPipeline(numericCols: Seq[String], categoricalCols: Seq[String],
                    seed: Long = 42L, maxIter: Int = 100): Pipeline =
    new Pipeline().setStages(
      featureStages(numericCols, categoricalCols) :+
        (new GBTClassifier().setMaxIter(maxIter).setSeed(seed)
          .setFeaturesCol("features").setLabelCol("label")
          : org.apache.spark.ml.PipelineStage))

  /** Accuracy + weighted precision/recall/F1 on a scored frame
    * (`ml_models.py:559-567`). */
  def evaluate(scored: DataFrame): Map[String, Double] = {
    val ev = new MulticlassClassificationEvaluator()
      .setLabelCol("label").setPredictionCol("prediction")
    Seq("accuracy", "weightedPrecision", "weightedRecall", "f1")
      .map(mn => mn -> ev.setMetricName(mn).evaluate(scored)).toMap
  }

  /** S8 — persist per-(horizon, model) metrics as JSON next to the saved
    * models (the reference's `model_metrics.json`, `ml_models.py:101-178`). */
  def saveMetrics(metrics: Map[String, Map[String, Double]],
                  path: String): Unit = {
    val json = metrics.toSeq.sortBy(_._1).map { case (k, ms) =>
      "\"" + k + "\": {" + ms.toSeq.sortBy(_._1)
        .map { case (m, v) => "\"" + m + "\": " + v }.mkString(", ") + "}"
    }.mkString("{", ", ", "}")
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(path)
      .getParent)
    java.nio.file.Files.writeString(java.nio.file.Paths.get(path), json)
  }

  /** Train the churn model and score every row with churn_probability
    * (P(class 1)), the reference's `predict_proba[:,1]`
    * (`update_churn_probabilities.py:36-63`). */
  def churnScores(features: DataFrame, numericCols: Seq[String],
                  categoricalCols: Seq[String], labelCol: String,
                  maxIter: Int = 100)
      : (PipelineModel, DataFrame) = {
    val df = features.withColumn("label", col(labelCol).cast("double"))
      .cache() // GBT iterates over this frame maxIter times
    val model = churnPipeline(numericCols, categoricalCols,
      maxIter = maxIter).fit(df)
    val scored = model.transform(df).withColumn("churn_probability",
      vector_to_array(col("probability")).getItem(1))
    (model, scored)
  }
}
