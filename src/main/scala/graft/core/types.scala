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

object MeasurementConfig {
  def fromJson(json: String): MeasurementConfig =
    fromFields(JsonUtil.parse(json).asInstanceOf[Map[String, Any]])

  private[core] def fromFields(m: Map[String, Any]): MeasurementConfig =
    MeasurementConfig(
      name = m("name").asInstanceOf[String],
      temporality =
        TemporalityType.fromString(m("temporality").asInstanceOf[String]),
      modality =
        DataModality.fromString(m("modality").asInstanceOf[String]),
      valuesColumn =
        Option(m.getOrElse("values_column", null))
          .map(_.asInstanceOf[String]),
      functor =
        Option(m.getOrElse("functor", null)).map(_.asInstanceOf[String]))
      .validated
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

object DatasetConfig {
  /** The reference's `from_simple_args` convenience builder
    * (config.py:404-471): expand a compact column spec into full
    * `MeasurementConfig`s —
    *
    *   - a bare dynamic column name      → DYNAMIC multi-label
    *   - a (name, valuesColumn) pair     → DYNAMIC multivariate regression
    *   - a static column name            → STATIC single-label
    *   - a (name, functor) pair          → FUNCTIONAL_TIME_DEPENDENT with
    *                                       the functor's output modality
    *                                       (config.py:180)
    *
    * `base` carries every other `DatasetConfig` field (the reference's
    * `**kwargs` passthrough); its `measurements` are replaced.
    * `import DatasetConfig._` brings the Left/Right conversions in scope
    * so call sites read like the reference's mixed list. */
  def fromSimpleArgs(
      dynamicMeasurementColumns: Seq[Either[String, (String, String)]] = Nil,
      staticMeasurementColumns: Seq[String] = Nil,
      timeDependentMeasurementColumns:
        Seq[(String, graft.functors.TimeDependentFunctor)] = Nil,
      base: DatasetConfig = DatasetConfig()): DatasetConfig = {
    val dynamic = dynamicMeasurementColumns.map {
      case Left(name) => MeasurementConfig(name, TemporalityType.Dynamic,
        DataModality.MultiLabelClassification).validated
      case Right((name, valCol)) => MeasurementConfig(name,
        TemporalityType.Dynamic, DataModality.MultivariateRegression,
        valuesColumn = Some(valCol)).validated
    }
    val static = staticMeasurementColumns.map(n =>
      MeasurementConfig(n, TemporalityType.Static,
        DataModality.SingleLabelClassification).validated)
    val ftd = timeDependentMeasurementColumns.map { case (n, f) =>
      MeasurementConfig(n, TemporalityType.FunctionalTimeDependent,
        f.outputModality, functor = Some(f.name)).validated
    }
    base.copy(measurements = dynamic ++ static ++ ftd)
  }

  /** Conversions so `fromSimpleArgs` call sites can mix bare names and
    * (name, valuesColumn) pairs like the reference's union-typed list. */
  implicit def simpleDynamicName(s: String)
      : Either[String, (String, String)] = Left(s)
  implicit def simpleDynamicPair(p: (String, String))
      : Either[String, (String, String)] = Right(p)

  /** JSON round-trip (the reference persists configs as JSON,
    * config.py:250-283 / utils.py:95-116). Threshold numbers follow the
    * reference's count-or-proportion convention: an INTEGRAL literal is a
    * count, a fractional one a proportion (utils.py:11-26). */
  def fromJson(json: String): DatasetConfig = {
    val m = JsonUtil.parse(json).asInstanceOf[Map[String, Any]]
    def cop(key: String): Option[CountOrProportion] =
      Option(m.getOrElse(key, null)).map {
        case n: Long   => CountOrProportion.count(n)
        case d: Double => CountOrProportion.proportion(d)
        case other => throw new IllegalArgumentException(
          s"$key: expected number, got $other")
      }
    def dbl(key: String): Option[Double] =
      Option(m.getOrElse(key, null)).map {
        case d: Double => d
        case n: Long   => n.toDouble
        case other => throw new IllegalArgumentException(
          s"$key: expected number, got $other")
      }
    def str(key: String): Option[String] =
      Option(m.getOrElse(key, null)).map(_.asInstanceOf[String])
    // ABSENT key ≠ explicit null: an externally-authored JSON that omits
    // a field gets the case-class DEFAULT (toJson always emits every key,
    // so round-trips are unaffected); an explicit null means None.
    def strOrDefault(key: String, default: Option[String]): Option[String] =
      if (m.contains(key)) str(key) else default
    DatasetConfig(
      measurements = Option(m.getOrElse("measurements", null))
        .map(_.asInstanceOf[List[Any]]
          .map(f => MeasurementConfig.fromFields(
            f.asInstanceOf[Map[String, Any]])))
        .getOrElse(Nil),
      minValidColumnObservations = cop("min_valid_column_observations"),
      minValidVocabElementObservations =
        cop("min_valid_vocab_element_observations"),
      minTrueFloatFrequency = dbl("min_true_float_frequency"),
      minUniqueNumericalObservations =
        cop("min_unique_numerical_observations"),
      maxNumericalValueFrequency = dbl("max_numerical_value_frequency"),
      normalizer = strOrDefault("normalizer", Some("std")),
      outlierDetector = strOrDefault("outlier_detector", None))
  }
}

/** Minimal hand-rolled JSON emit + strict recursive-descent parse (no
  * deps allowed beyond Spark). Parse maps: object → Map[String, Any],
  * array → List[Any], string → String, integral number → Long,
  * fractional → Double, true/false → Boolean, null → null. The
  * Long/Double split is SEMANTIC here — it distinguishes
  * count-vs-proportion thresholds exactly as the reference's
  * count_or_proportion does. */
object JsonUtil {

  def parse(s: String): Any = {
    val p = new Parser(s)
    val v = p.value()
    p.skipWs()
    require(p.eof, s"trailing content at offset ${p.pos}")
    v
  }

  private final class Parser(s: String) {
    var pos = 0
    def eof: Boolean = pos >= s.length
    def skipWs(): Unit =
      while (!eof && Character.isWhitespace(s.charAt(pos))) pos += 1
    private def expect(c: Char): Unit = {
      require(!eof && s.charAt(pos) == c,
        s"expected '$c' at offset $pos in: ${s.take(80)}")
      pos += 1
    }
    def value(): Any = {
      skipWs()
      require(!eof, "unexpected end of input")
      s.charAt(pos) match {
        case '{' => obj()
        case '[' => arr()
        case '"' => string()
        case 't' => lit("true", true)
        case 'f' => lit("false", false)
        case 'n' => lit("null", null)
        case _   => number()
      }
    }
    private def lit(word: String, v: Any): Any = {
      require(s.regionMatches(pos, word, 0, word.length),
        s"bad literal at offset $pos")
      pos += word.length
      v
    }
    private def obj(): Map[String, Any] = {
      expect('{'); skipWs()
      val b = Map.newBuilder[String, Any]
      if (!eof && s.charAt(pos) == '}') { pos += 1; return b.result() }
      var done = false
      while (!done) {
        skipWs()
        val k = string()
        skipWs(); expect(':')
        b += k -> value()
        skipWs()
        if (!eof && s.charAt(pos) == ',') pos += 1
        else { expect('}'); done = true }
      }
      b.result()
    }
    private def arr(): List[Any] = {
      expect('['); skipWs()
      val b = List.newBuilder[Any]
      if (!eof && s.charAt(pos) == ']') { pos += 1; return b.result() }
      var done = false
      while (!done) {
        b += value()
        skipWs()
        if (!eof && s.charAt(pos) == ',') pos += 1
        else { expect(']'); done = true }
      }
      b.result()
    }
    private def string(): String = {
      expect('"')
      val sb = new StringBuilder
      while (!eof && s.charAt(pos) != '"') {
        val c = s.charAt(pos)
        if (c == '\\') {
          pos += 1
          require(!eof, "unterminated escape")
          s.charAt(pos) match {
            case '"'  => sb += '"'
            case '\\' => sb += '\\'
            case '/'  => sb += '/'
            case 'n'  => sb += '\n'
            case 'r'  => sb += '\r'
            case 't'  => sb += '\t'
            case 'b'  => sb += '\b'
            case 'f'  => sb += '\f'
            case 'u' =>
              require(pos + 4 < s.length, "truncated \\u escape")
              sb += Integer.parseInt(s.substring(pos + 1, pos + 5), 16)
                .toChar
              pos += 4
            case e => throw new IllegalArgumentException(s"bad escape \\$e")
          }
        } else sb += c
        pos += 1
      }
      expect('"')
      sb.result()
    }
    private def number(): Any = {
      val start = pos
      if (!eof && s.charAt(pos) == '-') pos += 1
      while (!eof && (Character.isDigit(s.charAt(pos)) ||
        "+-.eE".indexOf(s.charAt(pos)) >= 0)) pos += 1
      val tok = s.substring(start, pos)
      require(tok.nonEmpty && tok != "-", s"bad number at offset $start")
      if (tok.exists(c => c == '.' || c == 'e' || c == 'E')) tok.toDouble
      else tok.toLong
    }
  }

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
