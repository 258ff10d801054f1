package graft.ml

import graft.preprocess.Preprocessor
import org.apache.spark.ml.{Estimator, Model}
import org.apache.spark.ml.param.{DoubleParam, LongParam, Param, ParamMap, Params}
import org.apache.spark.ml.util.Identifiable
import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.types.{BooleanType, DoubleType, IntegerType, StringType, StructField, StructType}

/** spark.ml wrapper over the preprocess lifecycle so the engine composes
  * with MLlib `Pipeline`s (the reference's sklearn-style fit/transform
  * split IS the Estimator/Model shape — SURVEY §3 E2).
  *
  *   new GraftPreprocessor().setKeyCol("k").setValueCol("v")
  *     .fit(train)            // Estimator: train-only statistics
  *     .transform(heldOut)    // Model: leakage-free application
  */
private[ml] trait GraftPreprocessorParams extends Params {
  final val keyCol = new Param[String](this, "keyCol", "measurement key column")
  final val valueCol = new Param[String](this, "valueCol", "value column")
  final val normalizer = new Param[String](this, "normalizer",
    "any NumericModels-registered normalizer name (std|quantile built in) or none")
  final val outlierDetector = new Param[String](this, "outlierDetector",
    "any NumericModels-registered outlier detector name (viod built in) or none")
  final val minValidVocabElementObservations = new LongParam(this,
    "minValidVocabElementObservations", "per-key min observation count")
  final val minUniqueNumericalObservations = new LongParam(this,
    "minUniqueNumericalObservations",
    "distinct-value threshold below which a key becomes categorical")
  final val maxNumericalValueFrequency = new DoubleParam(this,
    "maxNumericalValueFrequency",
    "mode-frequency threshold above which a key becomes categorical")
  setDefault(keyCol -> "key", valueCol -> "value", normalizer -> "std",
    outlierDetector -> "none",
    minValidVocabElementObservations -> 10L,
    minUniqueNumericalObservations -> 20L,
    maxNumericalValueFrequency -> 0.5)

  protected def graftConfig: Preprocessor.Config = Preprocessor.Config.counts(
    minValidVocabElementObservations =
      $(minValidVocabElementObservations),
    minUniqueNumericalObservations = $(minUniqueNumericalObservations),
    maxNumericalValueFrequency = $(maxNumericalValueFrequency),
    outlierDetector =
      Some($(outlierDetector)).filter(_ != "none"),
    normalizer = Some($(normalizer)).filter(_ != "none"))

  protected def outputSchema(schema: StructType): StructType =
    StructType(schema.fields ++ Seq(
      StructField("final_key", StringType, nullable = true),
      StructField("value_clean", DoubleType, nullable = true),
      StructField("is_inlier", BooleanType, nullable = true),
      StructField("value_norm", DoubleType, nullable = true),
      StructField("key_idx", IntegerType, nullable = false)))
}

class GraftPreprocessor(override val uid: String)
    extends Estimator[GraftPreprocessorModel] with GraftPreprocessorParams {

  def this() = this(Identifiable.randomUID("graftPreproc"))

  def setKeyCol(v: String): this.type = set(keyCol, v)
  def setValueCol(v: String): this.type = set(valueCol, v)
  def setNormalizer(v: String): this.type = set(normalizer, v)
  def setOutlierDetector(v: String): this.type = set(outlierDetector, v)
  def setMinValidVocabElementObservations(v: Long): this.type =
    set(minValidVocabElementObservations, v)
  def setMinUniqueNumericalObservations(v: Long): this.type =
    set(minUniqueNumericalObservations, v)
  def setMaxNumericalValueFrequency(v: Double): this.type =
    set(maxNumericalValueFrequency, v)

  override def fit(dataset: Dataset[_]): GraftPreprocessorModel = {
    val fit = Preprocessor.fit(dataset.toDF(), $(keyCol), $(valueCol),
      graftConfig)
    val model = new GraftPreprocessorModel(uid, fit)
    copyValues(model).setParent(this)
  }

  override def transformSchema(schema: StructType): StructType =
    outputSchema(schema)

  override def copy(extra: ParamMap): GraftPreprocessor =
    defaultCopy(extra)
}

class GraftPreprocessorModel(override val uid: String,
    private[ml] val fitResult: Preprocessor.Fit)
    extends Model[GraftPreprocessorModel] with GraftPreprocessorParams {

  /** Fit state as DataFrames — persist with plain parquet writes. */
  def perKeyMetadata: DataFrame = fitResult.perKey
  def vocabulary: DataFrame = fitResult.vocab

  override def transform(dataset: Dataset[_]): DataFrame =
    Preprocessor.transform(dataset.toDF(), $(keyCol), $(valueCol),
      fitResult)

  override def transformSchema(schema: StructType): StructType =
    outputSchema(schema)

  override def copy(extra: ParamMap): GraftPreprocessorModel =
    copyValues(new GraftPreprocessorModel(uid, fitResult)).setParent(parent)
}
