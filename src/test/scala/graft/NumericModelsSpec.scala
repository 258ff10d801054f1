package graft

import graft.preprocess.{NumericModels, Preprocessor}
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** The METADATA_MODELS-style pluggable numeric-model registry
  * (reference event_stream_dataset.py:48-54, model specs
  * config.py:330-342), exercised the way the reference's own tests do —
  * by registering dummy models and checking the orchestrator fits and
  * applies them (tests/EventStreamData/test_event_stream_dataset.py:24-47,
  * `DummySklearn` records mean/max/min/count). */
class NumericModelsSpec extends SparkSpec {
  import spark.implicits._

  /** Scala twin of the reference's DummySklearn fit: params record
    * mean (rounded 5), max, min, count; transform recenters by the
    * fitted mean. */
  class DummyNormalizer extends NumericModels.NormalizerModel {
    def fitParams(train: DataFrame, keyCol: String, valCol: String)
        : DataFrame =
      train.groupBy(col(keyCol)).agg(map(
        lit("mean"), round(avg(col(valCol)), 5),
        lit("max"), max(col(valCol)),
        lit("min"), min(col(valCol)),
        lit("count"), count(col(valCol)).cast("double")).as("params"))
    def transformExpr(v: Column, params: Column): Column =
      v - element_at(params, "mean")
  }

  /** Fixed-bounds detector: every key gets the same exclusive (lo, hi). */
  class FixedBoundsDetector(lo: Double, hi: Double)
      extends NumericModels.OutlierDetectorModel {
    def fitBounds(train: DataFrame, keyCol: String, valCol: String)
        : DataFrame =
      train.groupBy(col(keyCol))
        .agg(lit(lo).as("lo"), lit(hi).as("hi"))
  }

  NumericModels.registerNormalizer("dummy", new DummyNormalizer)
  NumericModels.registerOutlierDetector("fixed05", new FixedBoundsDetector(0.0, 5.0))

  test("custom normalizer: params fitted on train, applied everywhere") {
    val train = Seq(("a", 1.0), ("a", 2.0), ("a", 3.0),
      ("b", 10.0), ("b", 20.0)).toDF("k", "v")
    val all = train.union(Seq(("a", 100.0)).toDF("k", "v"))
    val fit = Preprocessor.fit(train, "k", "v",
      Preprocessor.Config.counts(
        minValidVocabElementObservations = 1,
        minUniqueNumericalObservations = 2,
        maxNumericalValueFrequency = 0.9,
        normalizer = Some("dummy")))
    // params-as-data: the DummySklearn quartet is readable off the fit
    val params = fit.perKey
      .select(col("key"), col("norm_name"), col("norm_params"))
      .as[(String, String, Map[String, Double])].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    assert(params("a")._1 == "dummy")
    assert(params("a")._2 == Map(
      "mean" -> 2.0, "max" -> 3.0, "min" -> 1.0, "count" -> 3.0))
    assert(params("b")._2 == Map(
      "mean" -> 15.0, "max" -> 20.0, "min" -> 10.0, "count" -> 2.0))
    // transform dispatches to the registered model — with TRAIN params
    // (the held-out 100.0 recenters by the train mean, leakage rule)
    val out = Preprocessor.transform(all, "k", "v", fit)
      .select("v", "value_norm").as[(Double, Double)].collect().toMap
    assert(out(1.0) == -1.0)
    assert(out(3.0) == 1.0)
    assert(out(100.0) == 98.0)
    assert(out(10.0) == -5.0)
  }

  test("custom outlier detector: exclusive bounds null values pre-normalizer") {
    val train = Seq(("a", 1.0), ("a", 2.0), ("a", 3.0), ("a", 7.0))
      .toDF("k", "v")
    val fit = Preprocessor.fit(train, "k", "v",
      Preprocessor.Config.counts(
        minValidVocabElementObservations = 1,
        minUniqueNumericalObservations = 2,
        maxNumericalValueFrequency = 0.9,
        outlierDetector = Some("fixed05"),
        normalizer = None))
    val out = Preprocessor.transform(train, "k", "v", fit)
      .select("v", "is_inlier", "value_norm")
      .as[(Double, Boolean, Option[Double])].collect()
    assert(out.filter(_._1 == 7.0).forall(r => !r._2 && r._3.isEmpty))
    assert(out.filter(_._1 == 2.0).forall(r => r._2 && r._3.contains(2.0)))
  }

  test("custom detector + custom normalizer compose: params fit on inliers only") {
    val train = Seq(("a", 1.0), ("a", 2.0), ("a", 3.0), ("a", 7.0))
      .toDF("k", "v")
    val fit = Preprocessor.fit(train, "k", "v",
      Preprocessor.Config.counts(
        minValidVocabElementObservations = 1,
        minUniqueNumericalObservations = 2,
        maxNumericalValueFrequency = 0.9,
        outlierDetector = Some("fixed05"),
        normalizer = Some("dummy")))
    val params = fit.perKey.select(col("key"), col("norm_params"))
      .as[(String, Map[String, Double])].collect().toMap
    // 7.0 is outside (0,5): excluded from the normalizer's fit
    assert(params("a") == Map(
      "mean" -> 2.0, "max" -> 3.0, "min" -> 1.0, "count" -> 3.0))
  }

  test("registry built-ins standalone: std and quantile round-trip") {
    val train = Seq(("a", 1.0), ("a", 2.0), ("a", 3.0)).toDF("k", "v")
    val std = NumericModels.normalizer("std")
    val p = std.fitParams(train, "k", "v")
    val out = train.join(broadcast(p), Seq("k"))
      .select(std.transformExpr(col("v"), col("params")).as("n"))
      .as[Double].collect().sorted
    assert(out sameElements Array(-1.0, 0.0, 1.0))
    val q = NumericModels.normalizer("quantile")
    val qp = q.fitParams(train, "k", "v")
    val qo = train.join(broadcast(qp), Seq("k"))
      .select(round(q.transformExpr(col("v"), col("params")), 6).as("n"))
      .as[Double].collect().sorted
    assert(qo sameElements Array(0.0, 0.5, 1.0))
  }

  test("unknown model names fail loudly") {
    val train = Seq(("a", 1.0)).toDF("k", "v")
    intercept[IllegalArgumentException] {
      Preprocessor.fit(train, "k", "v",
        Preprocessor.Config.counts(normalizer = Some("no_such_model"),
          minValidVocabElementObservations = 1,
          minUniqueNumericalObservations = 1,
          maxNumericalValueFrequency = 0.9))
    }
    intercept[IllegalArgumentException] {
      NumericModels.outlierDetector("no_such_model")
    }
  }
}
