package graft.core

/** Schema/type system for measurements.
  *
  * Semantics follow the reference's enum definitions
  * (/root/reference/EventStream/EventStreamData/types.py:37-133) re-expressed
  * as Scala sealed ADTs. Each measurement declares WHERE it lives
  * (temporality), WHAT it is (modality) and, for numeric measurements, HOW the
  * numbers should be treated after type inference (numeric subtype).
  */
sealed abstract class TemporalityType(val name: String)
object TemporalityType {
  /** Lives on the subjects table; one value per subject, constant in time. */
  case object Static extends TemporalityType("static")
  /** Lives on the measurements table; many-per-event, varies in time. */
  case object Dynamic extends TemporalityType("dynamic")
  /** Computed column on the events table from (timestamp, subject statics). */
  case object FunctionalTimeDependent
      extends TemporalityType("functional_time_dependent")
  val all: Seq[TemporalityType] =
    Seq(Static, Dynamic, FunctionalTimeDependent)
  def fromString(s: String): TemporalityType =
    all.find(_.name == s).getOrElse(
      throw new IllegalArgumentException(s"unknown temporality: $s"))
}

sealed abstract class DataModality(val name: String)
object DataModality {
  case object SingleLabelClassification
      extends DataModality("single_label_classification")
  case object MultiLabelClassification
      extends DataModality("multi_label_classification")
  /** EAV pair: a key column plus a values column. */
  case object MultivariateRegression
      extends DataModality("multivariate_regression")
  case object UnivariateRegression
      extends DataModality("univariate_regression")
  case object Dropped extends DataModality("dropped")
  val all: Seq[DataModality] = Seq(
    SingleLabelClassification, MultiLabelClassification,
    MultivariateRegression, UnivariateRegression, Dropped)
  def fromString(s: String): DataModality =
    all.find(_.name == s).getOrElse(
      throw new IllegalArgumentException(s"unknown modality: $s"))
}

/** Inferred per-key numeric value type
  * (types.py:110-133; inference rules event_stream_dataset.py:1216-1277). */
sealed abstract class NumericValueType(val name: String)
object NumericValueType {
  case object IntegerT extends NumericValueType("integer")
  case object FloatT extends NumericValueType("float")
  /** Numeric column re-encoded as category strings "key__EQ_{round(v)}". */
  case object CategoricalInteger extends NumericValueType("categorical_integer")
  /** Numeric column re-encoded as category strings "key__EQ_{v}". */
  case object CategoricalFloat extends NumericValueType("categorical_float")
  case object DroppedT extends NumericValueType("dropped")
  val all: Seq[NumericValueType] =
    Seq(IntegerT, FloatT, CategoricalInteger, CategoricalFloat, DroppedT)
  def fromString(s: String): NumericValueType =
    all.find(_.name == s).getOrElse(
      throw new IllegalArgumentException(s"unknown value type: $s"))
}

/** A threshold expressed either as an absolute count (Left) or a proportion of
  * a total (Right) — reference `count_or_proportion` utils.py:11-26, which
  * resolves a proportion as `int(p * N)`: TRUNCATION toward zero, not
  * rounding or ceiling. */
final case class CountOrProportion(value: Either[Long, Double]) {
  def resolve(total: Long): Long = value match {
    case Left(n)  => n
    case Right(p) =>
      require(p > 0 && p < 1, s"proportion must be in (0,1): $p")
      (p * total).toLong
  }
}
object CountOrProportion {
  def count(n: Long): CountOrProportion = CountOrProportion(Left(n))
  def proportion(p: Double): CountOrProportion = CountOrProportion(Right(p))
}

/** Per-measurement configuration (reference config.py:44-283). Fit state
  * (vocabulary, per-key metadata) is carried as DATA in DataFrames — never
  * mutated in place; `FittedMeasurement` in the preprocess package holds the
  * post-fit truth, mirroring the reference's passed/inferred config split
  * (event_stream_dataset.py:958-964). */
final case class MeasurementConfig(
    name: String,
    temporality: TemporalityType,
    modality: DataModality,
    /** For MultivariateRegression: the column holding values keyed by `name`. */
    valuesColumn: Option[String] = None,
    /** Pinned functor class name for FunctionalTimeDependent measurements. */
    functor: Option[String] = None) {

  def validated: MeasurementConfig = {
    // Validity rules cross-linking temporality×modality (config.py:158-200).
    if (temporality == TemporalityType.Static)
      require(
        modality != DataModality.UnivariateRegression &&
          modality != DataModality.MultivariateRegression,
        s"$name: static numeric measurements unsupported")
    if (temporality == TemporalityType.Dynamic &&
      modality == DataModality.UnivariateRegression)
      require(false, s"$name: dynamic univariate regression unsupported")
    if (modality == DataModality.MultivariateRegression)
      require(valuesColumn.nonEmpty, s"$name: values column required")
    if (temporality == TemporalityType.FunctionalTimeDependent)
      require(functor.nonEmpty, s"$name: functor required")
    this
  }

  def toJson: String = JsonUtil.obj(
    "name" -> JsonUtil.str(name),
    "temporality" -> JsonUtil.str(temporality.name),
    "modality" -> JsonUtil.str(modality.name),
    "values_column" -> valuesColumn.map(JsonUtil.str).getOrElse("null"),
    "functor" -> functor.map(JsonUtil.str).getOrElse("null"))
}

/** Dataset-level preprocessing thresholds (reference config.py:285-402). */
final case class DatasetConfig(
    measurements: Seq[MeasurementConfig] = Nil,
    minValidColumnObservations: Option[CountOrProportion] = None,
    minValidVocabElementObservations: Option[CountOrProportion] = None,
    minTrueFloatFrequency: Option[Double] = None,
    minUniqueNumericalObservations: Option[CountOrProportion] = None,
    maxNumericalValueFrequency: Option[Double] = None,
    /** "std" (standard score) or "quantile" (ECDF interpolation). */
    normalizer: Option[String] = Some("std"),
    /** "viod" (variance-impact outlier detector) or none. */
    outlierDetector: Option[String] = None) {
  def toJson: String = {
    def cop(c: Option[CountOrProportion]): String = c match {
      case Some(CountOrProportion(Left(n)))  => n.toString
      case Some(CountOrProportion(Right(p))) => p.toString
      case None                              => "null"
    }
    JsonUtil.obj(
      "measurements" ->
        measurements.map(_.toJson).mkString("[", ",", "]"),
      "min_valid_column_observations" -> cop(minValidColumnObservations),
      "min_valid_vocab_element_observations" ->
        cop(minValidVocabElementObservations),
      "min_true_float_frequency" ->
        minTrueFloatFrequency.map(_.toString).getOrElse("null"),
      "min_unique_numerical_observations" ->
        cop(minUniqueNumericalObservations),
      "max_numerical_value_frequency" ->
        maxNumericalValueFrequency.map(_.toString).getOrElse("null"),
      "normalizer" -> normalizer.map(JsonUtil.str).getOrElse("null"),
      "outlier_detector" ->
        outlierDetector.map(JsonUtil.str).getOrElse("null"))
  }
}

/** Minimal hand-rolled JSON emit (no deps allowed beyond Spark). */
object JsonUtil {
  def str(s: String): String = "\"" + s.flatMap {
    case '"'          => "\\\""
    case '\\'         => "\\\\"
    case '\n'         => "\\n"
    case '\r'         => "\\r"
    case '\t'         => "\\t"
    case c if c < ' ' => f"\\u${c.toInt}%04x"
    case c            => c.toString
  } + "\""
  def obj(fields: (String, String)*): String =
    fields.map { case (k, v) => s"${str(k)}: $v" }.mkString("{", ", ", "}")
}
