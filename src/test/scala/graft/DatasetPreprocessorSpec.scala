package graft

import graft.core._
import graft.functors.TimeOfDayFunctor
import graft.ingest.EventDataset
import graft.preprocess.{DatasetPreprocessor, Preprocessor}
import org.apache.spark.sql.functions._
import java.sql.Timestamp

/** Source routing across temporalities (reference
  * event_stream_dataset.py:930-1013, 1302-1308). */
class DatasetPreprocessorSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("routes dynamic / static / time-dependent measurements by config") {
    val events = Seq(
      (0L, 1L, ts("2024-01-01 05:00:00"), "A"),
      (1L, 1L, ts("2024-01-01 13:00:00"), "A"),
      (2L, 2L, ts("2024-01-01 22:00:00"), "B"))
      .toDF("event_id", "subject_id", "timestamp", "event_type")
    val meas = Seq(
      (0L, 0L, "A", 1L, "lab", "hr", Some(60.0)),
      (1L, 1L, "A", 1L, "lab", "hr", Some(80.0)),
      (2L, 2L, "B", 2L, "lab", "hr", Some(70.0)),
      (3L, 0L, "A", 1L, "dx", "flu", None),
      (4L, 2L, "B", 2L, "dx", "cold", None))
      .toDF("metadata_id", "event_id", "event_type", "subject_id",
        "measurement", "key", "value")
    val subjects = Seq((1L, "F"), (2L, "M")).toDF("subject_id", "sex")
    val ds = EventDataset(events, meas, subjects)
    val splits = Seq((1L, "train"), (2L, "held_out"))
      .toDF("subject_id", "split")
    val cfg = DatasetConfig(measurements = Seq(
      MeasurementConfig("lab", TemporalityType.Dynamic,
        DataModality.MultivariateRegression, valuesColumn = Some("value")),
      MeasurementConfig("dx", TemporalityType.Dynamic,
        DataModality.MultiLabelClassification),
      MeasurementConfig("sex", TemporalityType.Static,
        DataModality.SingleLabelClassification)))
    // thresholds live on the DatasetConfig now (None = rule disabled,
    // reference semantics); pcfg carries only engine-side knobs
    val pcfg = Preprocessor.Config()
    val fit = DatasetPreprocessor.fit(ds, splits, cfg, Nil, pcfg)

    // numeric fit saw ONLY subject 1 (train): mean of (60, 80) = 70
    val hrStats = fit.dynamic("lab").perKey
      .select("key", "norm_mean").as[(String, Double)].collect().toMap
    assert(hrStats("hr") == 70.0)
    // dx vocab from train only: 'flu' present, 'cold' absent
    val dxVocab = fit.dynamicCategorical("dx")
      .select("element").as[String].collect().toSet
    assert(dxVocab.contains("flu") && !dxVocab.contains("cold"))
    // static vocab from train subjects only: 'F' present, 'M' folded later
    val sexVocab = fit.static("sex")
      .select("element").as[String].collect().toSet
    assert(sexVocab.contains("F") && !sexVocab.contains("M"))

    // transform ALL splits with train params
    val (tm, _, tsubj) = DatasetPreprocessor.transform(ds, fit)
    val rows = tm.filter(col("measurement") === "lab")
      .select("metadata_id", "value_norm")
      .as[(Long, Option[Double])].collect().toMap
    assert(rows(2L).isDefined) // held-out row normalized with train stats
    // unknown held-out dx key 'cold' → UNK 0
    val dxIdx = tm.filter(col("measurement") === "dx")
      .select("key", "key_idx").as[(String, Int)].collect().toMap
    assert(dxIdx("cold") == 0 && dxIdx("flu") > 0)
    // static lookup on subjects
    val sexIdx = tsubj.select("subject_id", "sex_idx")
      .as[(Long, Int)].collect().toMap
    assert(sexIdx(1L) > 0 && sexIdx(2L) == 0)
  }

  test("missing-column measurements drop instead of failing analysis " +
    "(reference :1310-1312)") {
    val events = Seq((0L, 1L, ts("2024-01-01 05:00:00"), "A"))
      .toDF("event_id", "subject_id", "timestamp", "event_type")
    val meas = Seq((0L, 0L, "A", 1L, "lab", "hr", Some(60.0)))
      .toDF("metadata_id", "event_id", "event_type", "subject_id",
        "measurement", "key", "value")
    val subjects = Seq((1L, "F")).toDF("subject_id", "sex")
    val ds = EventDataset(events, meas, subjects)
    val splits = Seq((1L, "train")).toDF("subject_id", "split")
    val cfg = DatasetConfig(measurements = Seq(
      MeasurementConfig("sex", TemporalityType.Static,
        DataModality.SingleLabelClassification),
      MeasurementConfig("blood_type", TemporalityType.Static,
        DataModality.SingleLabelClassification), // absent from subjects
      MeasurementConfig("age", TemporalityType.FunctionalTimeDependent,
        DataModality.UnivariateRegression))) // no functor supplied
    val fit = DatasetPreprocessor.fit(ds, splits, cfg, Nil)
    assert(fit.dropped == Set("blood_type", "age"))
    assert(fit.static.keySet == Set("sex"))
    // transform still runs on the surviving config
    val (_, _, subj) = DatasetPreprocessor.transform(ds, fit, Nil)
    assert(subj.columns.contains("sex_idx"))
  }

  test("observation-count drop rule removes under-observed measurements") {
    val events = (0L until 10L).map(i =>
      (i, 1L, ts(f"2024-01-01 0$i:00:00"), "A"))
      .toDF("event_id", "subject_id", "timestamp", "event_type")
    val meas = ((0L until 8L).map(i =>
      (i, i, "A", 1L, "common", "k", Some(i.toDouble))) :+
      (8L, 0L, "A", 1L, "rare", "k", Some(1.0)))
      .toDF("metadata_id", "event_id", "event_type", "subject_id",
        "measurement", "key", "value")
    val ds = EventDataset(events, meas, Seq(Tuple1(1L)).toDF("subject_id"))
    val splits = Seq((1L, "train")).toDF("subject_id", "split")
    val cfg = DatasetConfig(
      measurements = Seq(
        MeasurementConfig("common", TemporalityType.Dynamic,
          DataModality.MultivariateRegression,
          valuesColumn = Some("value")),
        MeasurementConfig("rare", TemporalityType.Dynamic,
          DataModality.MultivariateRegression,
          valuesColumn = Some("value"))),
      // 0.5 of 10 train events = 5 observations required
      minValidColumnObservations =
        Some(CountOrProportion.proportion(0.5)))
    val pcfg = Preprocessor.Config()
    val fit = DatasetPreprocessor.fit(ds, splits, cfg, Nil, pcfg)
    assert(fit.dropped == Set("rare"))
    assert(fit.dynamic.keySet == Set("common"))
    val (tm, _, _) = DatasetPreprocessor.transform(ds, fit)
    assert(tm.filter(col("measurement") === "rare").count() == 0)
    assert(tm.filter(col("measurement") === "common").count() == 8)
  }

  test("transform with ALL measurements dropped: stable schema, no rows") {
    // regression: the union base must be the augmented untouched frame,
    // not raw measurements — dropped rows excluded, output columns present
    val events = (0L until 10L).map(i =>
      (i, 1L, ts(f"2024-01-01 0$i:00:00"), "A"))
      .toDF("event_id", "subject_id", "timestamp", "event_type")
    val meas = Seq((0L, 0L, "A", 1L, "rare", "k", Some(1.0)))
      .toDF("metadata_id", "event_id", "event_type", "subject_id",
        "measurement", "key", "value")
    val ds = EventDataset(events, meas, Seq(Tuple1(1L)).toDF("subject_id"))
    val splits = Seq((1L, "train")).toDF("subject_id", "split")
    val cfg = DatasetConfig(
      measurements = Seq(MeasurementConfig("rare",
        TemporalityType.Dynamic, DataModality.MultivariateRegression,
        valuesColumn = Some("value"))),
      minValidColumnObservations = Some(CountOrProportion.count(5)))
    val fit = DatasetPreprocessor.fit(ds, splits, cfg)
    assert(fit.dropped == Set("rare") && fit.dynamic.isEmpty)
    val (tm, _, _) = DatasetPreprocessor.transform(ds, fit)
    assert(tm.count() == 0) // dropped rows excluded even with no fits
    // schema is stable: the transform output columns exist
    for (c <- Seq("final_key", "value_clean", "is_inlier", "value_norm",
        "key_idx"))
      assert(tm.columns.contains(c), s"missing $c")
  }

  test("functional-time-dependent measurement fit+transform") {
    val events = Seq(
      (0L, 1L, ts("2024-01-01 05:00:00"), "A"),
      (1L, 1L, ts("2024-01-01 13:00:00"), "A"))
      .toDF("event_id", "subject_id", "timestamp", "event_type")
    val ds = EventDataset(events,
      Seq.empty[(Long, Long, String, Long, String, String, Option[Double])]
        .toDF("metadata_id", "event_id", "event_type", "subject_id",
          "measurement", "key", "value"),
      Seq(Tuple1(1L)).toDF("subject_id"))
    val splits = Seq((1L, "train")).toDF("subject_id", "split")
    // hour-of-day as a univariate numeric time-dependent measurement
    val hourFunctor = new graft.functors.TimeDependentFunctor {
      val name = "evt_hour"
      val outputModality = DataModality.UnivariateRegression
      def expr = hour(col("timestamp")).cast("double")
    }
    val cfg = DatasetConfig(measurements = Seq(
      MeasurementConfig("evt_hour",
        TemporalityType.FunctionalTimeDependent,
        DataModality.UnivariateRegression,
        functor = Some("evt_hour"))))
    // thresholds live on the DatasetConfig now (None = rule disabled,
    // reference semantics); pcfg carries only engine-side knobs
    val pcfg = Preprocessor.Config()
    val fit = DatasetPreprocessor.fit(ds, splits, cfg, Seq(hourFunctor),
      pcfg)
    val (_, tev, _) = DatasetPreprocessor.transform(ds, fit,
      Seq(hourFunctor))
    val normed = tev.select("event_id", "evt_hour_norm")
      .as[(Long, Double)].collect().toMap
    // hours 5, 13: mean 9, sample std sqrt(32) → z = ∓0.7071...
    assert(math.abs(normed(0L) + math.sqrt(0.5)) < 1e-12)
    assert(math.abs(normed(1L) - math.sqrt(0.5)) < 1e-12)
  }
}
