package graft.ml

import org.apache.spark.ml.{Estimator, Model}
import org.apache.spark.ml.param.{Param, ParamMap, Params, StringArrayParam}
import org.apache.spark.ml.util.{DefaultParamsReadable, DefaultParamsWritable, Identifiable}
import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, StructType}

/** sklearn-`LabelEncoder` parity (`ml_models.py:416-430`):
  *  - the reference first does `astype(str)`, which turns missing values
  *    into the literal string `'nan'` — so nulls here are encoded as
  *    `"nan"` at BOTH fit and transform time, and `'nan'` sorts into
  *    `classes_` like any other string (a null-bearing column therefore
  *    shifts the codes of everything that sorts after `"nan"`);
  *  - classes are the SORTED distinct string values seen at fit time
  *    (`np.unique` sorts), index = rank in that order;
  *  - at transform time an unseen value (including a null when no null
  *    was seen at fit) maps to CLASS 0 — the reference remaps unknowns
  *    to `encoder.classes_[0]` before `transform`, NOT to a fresh index
  *    (which is what MLlib's `StringIndexer(handleInvalid="keep")` would
  *    do — the round-3 divergence this class closes).
  *
  * Output is the double-valued code, fed directly (no one-hot) into the
  * feature vector exactly as the reference feeds integer codes to its
  * scaler. Both halves persist via `DefaultParamsWritable` (the fitted
  * classes live in a `StringArrayParam`), so pipelines containing them
  * survive the S8 model-store round trip.
  */
trait LabelEncoderParams extends Params {
  final val inputCol = new Param[String](this, "inputCol", "input column")
  final val outputCol = new Param[String](this, "outputCol", "output column")
  final def getInputCol: String = $(inputCol)
  final def getOutputCol: String = $(outputCol)
}

class LabelEncoder(override val uid: String)
    extends Estimator[LabelEncoderModel] with LabelEncoderParams
    with DefaultParamsWritable {

  def this() = this(Identifiable.randomUID("graftLabelEnc"))
  def setInputCol(v: String): this.type = set(inputCol, v)
  def setOutputCol(v: String): this.type = set(outputCol, v)

  override def fit(ds: Dataset[_]): LabelEncoderModel = {
    // pandas astype(str) parity: null → the literal string "nan", which
    // participates in the sorted class list like any other value
    val classes = ds
      .select(coalesce(col($(inputCol)).cast("string"), lit("nan")))
      .distinct()
      .collect().map(_.getString(0)).sorted
    require(classes.nonEmpty, s"LabelEncoder: no values in ${$(inputCol)}")
    val m = new LabelEncoderModel(uid).setClasses(classes).setParent(this)
    copyValues(m)
  }

  override def transformSchema(schema: StructType): StructType =
    schema.add($(outputCol), DoubleType, nullable = false)
  override def copy(extra: ParamMap): LabelEncoder = defaultCopy(extra)
}

object LabelEncoder extends DefaultParamsReadable[LabelEncoder]

class LabelEncoderModel(override val uid: String)
    extends Model[LabelEncoderModel] with LabelEncoderParams
    with DefaultParamsWritable {

  def this() = this(Identifiable.randomUID("graftLabelEncModel"))

  final val classes =
    new StringArrayParam(this, "classes", "fitted classes, sorted")
  def setClasses(v: Array[String]): this.type = set(classes, v)
  def getClasses: Array[String] = $(classes)
  def setInputCol(v: String): this.type = set(inputCol, v)
  def setOutputCol(v: String): this.type = set(outputCol, v)

  override def transform(ds: Dataset[_]): DataFrame = {
    val codeMap = map($(classes).zipWithIndex.flatMap { case (c, i) =>
      Seq(lit(c), lit(i.toDouble))
    }: _*)
    // null → "nan" first (pandas astype(str)); an unseen value — which
    // includes "nan" itself when fit saw no nulls — falls back to class 0
    // (reference classes_[0])
    ds.withColumn($(outputCol),
      coalesce(
        element_at(codeMap,
          coalesce(col($(inputCol)).cast("string"), lit("nan"))),
        lit(0.0)))
  }

  override def transformSchema(schema: StructType): StructType =
    schema.add($(outputCol), DoubleType, nullable = false)
  override def copy(extra: ParamMap): LabelEncoderModel =
    copyValues(new LabelEncoderModel(uid), extra).setParent(parent)
}

object LabelEncoderModel extends DefaultParamsReadable[LabelEncoderModel]
