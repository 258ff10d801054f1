package graft

import graft.core._
import org.scalatest.funsuite.AnyFunSuite

/** Type-system semantics (reference types.py:37-133, config.py:155-200,
  * utils.py:11-26). */
class CoreSpec extends AnyFunSuite {

  test("countOrProportion resolves counts and proportions") {
    // reference utils.py:11-26: int passes through; float p →
    // int(p*total) — TRUNCATION toward zero, not ceil/round
    assert(CountOrProportion.count(5).resolve(1000) == 5)
    assert(CountOrProportion.proportion(0.1).resolve(1000) == 100)
    assert(CountOrProportion.proportion(0.001).resolve(1500) == 1) // trunc
    intercept[IllegalArgumentException](
      CountOrProportion.proportion(1.5).resolve(10))
  }

  test("enum round-trip") {
    for (t <- TemporalityType.all)
      assert(TemporalityType.fromString(t.name) == t)
    for (m <- DataModality.all)
      assert(DataModality.fromString(m.name) == m)
    for (v <- NumericValueType.all)
      assert(NumericValueType.fromString(v.name) == v)
    intercept[IllegalArgumentException](TemporalityType.fromString("nope"))
  }

  test("measurement config validity rules (config.py:158-200)") {
    // static numeric unsupported (:165-168)
    intercept[IllegalArgumentException](MeasurementConfig(
      "m", TemporalityType.Static,
      DataModality.UnivariateRegression).validated)
    // dynamic univariate regression unsupported (:172-175)
    intercept[IllegalArgumentException](MeasurementConfig(
      "m", TemporalityType.Dynamic,
      DataModality.UnivariateRegression).validated)
    // multivariate regression requires values column
    intercept[IllegalArgumentException](MeasurementConfig(
      "m", TemporalityType.Dynamic,
      DataModality.MultivariateRegression).validated)
    // functional time-dependent requires functor
    intercept[IllegalArgumentException](MeasurementConfig(
      "m", TemporalityType.FunctionalTimeDependent,
      DataModality.UnivariateRegression).validated)
    // valid combos pass
    MeasurementConfig("m", TemporalityType.Dynamic,
      DataModality.MultivariateRegression,
      valuesColumn = Some("v")).validated
    MeasurementConfig("m", TemporalityType.Static,
      DataModality.SingleLabelClassification).validated
  }

  test("config JSON emit is well-formed") {
    val cfg = DatasetConfig(
      measurements = Seq(MeasurementConfig("m", TemporalityType.Dynamic,
        DataModality.MultivariateRegression, valuesColumn = Some("v"))),
      minValidColumnObservations = Some(CountOrProportion.count(10)),
      minTrueFloatFrequency = Some(0.1))
    val json = cfg.toJson
    assert(json.contains("\"min_valid_column_observations\": 10"))
    assert(json.contains("\"values_column\": \"v\""))
    // escaping
    assert(JsonUtil.str("a\"b\\c\nd") == "\"a\\\"b\\\\c\\nd\"")
  }

  test("config JSON ROUND-TRIP: counts stay counts, proportions stay " +
    "proportions, options survive (config.py:250-283 parity)") {
    val cfg = DatasetConfig(
      measurements = Seq(
        MeasurementConfig("vals", TemporalityType.Dynamic,
          DataModality.MultivariateRegression, valuesColumn = Some("v")),
        MeasurementConfig("grp", TemporalityType.Static,
          DataModality.SingleLabelClassification),
        MeasurementConfig("age", TemporalityType.FunctionalTimeDependent,
          DataModality.UnivariateRegression, functor = Some("age"))),
      minValidColumnObservations = Some(CountOrProportion.count(10)),
      minValidVocabElementObservations =
        Some(CountOrProportion.proportion(0.25)),
      minTrueFloatFrequency = Some(0.1),
      minUniqueNumericalObservations = None,
      maxNumericalValueFrequency = Some(0.5),
      normalizer = Some("quantile"),
      outlierDetector = Some("viod"))
    assert(DatasetConfig.fromJson(cfg.toJson) == cfg)
    val empty = DatasetConfig(normalizer = None)
    assert(DatasetConfig.fromJson(empty.toJson) == empty)
    // escaped strings survive the round-trip
    val weird = MeasurementConfig("a\"b\\c\nd", TemporalityType.Dynamic,
      DataModality.SingleLabelClassification)
    assert(MeasurementConfig.fromJson(weird.toJson) == weird)
    // parser distinguishes integral vs fractional literals
    assert(JsonUtil.parse("10") == 10L)
    assert(JsonUtil.parse("0.25") == 0.25)
    assert(JsonUtil.parse("""{"a": [1, 2.5, "x", null, true]}""") ==
      Map("a" -> List(1L, 2.5, "x", null, true)))
    // ABSENT key → case-class default; explicit null → None
    val omitted = DatasetConfig.fromJson("""{"measurements": []}""")
    assert(omitted.normalizer == Some("std"))
    assert(omitted.outlierDetector == None)
    val explicit =
      DatasetConfig.fromJson("""{"normalizer": null}""")
    assert(explicit.normalizer == None)
    assert(DatasetConfig.fromJson("""{"measurements": null}""")
      .measurements == Nil)
  }

  test("fromSimpleArgs expands compact specs (reference test_config.py:445-496)") {
    import DatasetConfig._
    import graft.functors.AgeFunctor
    // the reference's first case: dynamic ['A_key', ('B_key','B_val')],
    // static ['C'], time-dependent [('D', AgeFunctor('dob'))], one kwarg
    val got = DatasetConfig.fromSimpleArgs(
      dynamicMeasurementColumns = Seq("A_key", ("B_key", "B_val")),
      staticMeasurementColumns = Seq("C"),
      timeDependentMeasurementColumns = Seq(("D", AgeFunctor("dob"))),
      base = DatasetConfig(
        minValidColumnObservations = Some(CountOrProportion.count(10))))
    val want = DatasetConfig(
      measurements = Seq(
        MeasurementConfig("A_key", TemporalityType.Dynamic,
          DataModality.MultiLabelClassification),
        MeasurementConfig("B_key", TemporalityType.Dynamic,
          DataModality.MultivariateRegression, valuesColumn = Some("B_val")),
        MeasurementConfig("C", TemporalityType.Static,
          DataModality.SingleLabelClassification),
        MeasurementConfig("D", TemporalityType.FunctionalTimeDependent,
          DataModality.UnivariateRegression, functor = Some("age"))),
      minValidColumnObservations = Some(CountOrProportion.count(10)))
    assert(got == want)
    // the reference's second case: dynamic-only
    val got2 = DatasetConfig.fromSimpleArgs(
      dynamicMeasurementColumns = Seq("A_key", ("B_key", "B_val")),
      base = DatasetConfig(
        minValidColumnObservations = Some(CountOrProportion.count(10))))
    assert(got2.measurements == want.measurements.take(2))
    assert(got2.minValidColumnObservations ==
      Some(CountOrProportion.count(10)))
    // builder output survives the JSON round-trip
    assert(DatasetConfig.fromJson(got.toJson) == got)
    // functor output modality drives the FTD modality (config.py:180)
    val tod = DatasetConfig.fromSimpleArgs(
      timeDependentMeasurementColumns =
        Seq(("tod", graft.functors.TimeOfDayFunctor())))
    assert(tod.measurements.head.modality ==
      DataModality.SingleLabelClassification)
  }
}
