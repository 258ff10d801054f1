package graft.preprocess

import scala.collection.concurrent.TrieMap

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Pluggable numeric-model registry — the reference's `METADATA_MODELS`
  * (/root/reference/EventStream/EventStreamData/event_stream_dataset.py:48-54)
  * with `outlier_detector_config` / `normalizer_config` model specs
  * (config.py:330-342): users swap the outlier-detector / normalizer fitted
  * on numeric measurements by NAME, exactly as the reference's own tests do
  * with dummy sklearn-API models
  * (tests/EventStreamData/test_event_stream_dataset.py:24-47).
  *
  * Spark-first re-expression of the sklearn API: a model is not a pickled
  * object but (a) a FIT that maps train observations to one small per-key
  * params row, and (b) a pure Column TRANSFORM over those params — so
  * fitted state stays params-as-data (plain DataFrame columns, parquet
  * round-trippable, reference save/load discipline) and transform stays
  * inside whole-stage codegen. The registry itself is process-level
  * runtime state, the analogue of the reference's class-attribute dict:
  * a model name is resolvable at transform time iff the same model is
  * registered, just as unpickling a reference dataset needs the model
  * class importable.
  */
object NumericModels {

  /** Outlier-detector API (`event_stream_dataset.py:48-51`,
    * sklearn-style `fit` + `predict`): fit per-key EXCLUSIVE bounds from
    * train values. Returns one row per key: (keyCol, lo DOUBLE, hi
    * DOUBLE); a value v is an inlier iff lo < v < hi (the reference VIOD's
    * exclusive-bounds predict). */
  trait OutlierDetectorModel extends Serializable {
    def fitBounds(train: DataFrame, keyCol: String, valCol: String)
        : DataFrame
  }

  /** Normalizer API (`event_stream_dataset.py:52-54`, sklearn-style
    * `fit` + `transform`): fit per-key params from train INLIER values —
    * one row per key: (keyCol, params MAP<STRING,DOUBLE>) — and transform
    * a value column with a pure expression over that params column. */
  trait NormalizerModel extends Serializable {
    def fitParams(train: DataFrame, keyCol: String, valCol: String)
        : DataFrame
    def transformExpr(v: Column, params: Column): Column
  }

  private val detectors = TrieMap.empty[String, OutlierDetectorModel]
  private val normalizers = TrieMap.empty[String, NormalizerModel]

  def registerOutlierDetector(name: String, m: OutlierDetectorModel): Unit =
    detectors.put(name, m)
  def registerNormalizer(name: String, m: NormalizerModel): Unit =
    normalizers.put(name, m)

  def outlierDetector(name: String): OutlierDetectorModel =
    detectors.getOrElse(name, throw new IllegalArgumentException(
      s"unknown outlier detector '$name'; registered: " +
        detectors.keys.toSeq.sorted.mkString(", ")))
  def normalizer(name: String): NormalizerModel =
    normalizers.getOrElse(name, throw new IllegalArgumentException(
      s"unknown normalizer '$name'; registered: " +
        normalizers.keys.toSeq.sorted.mkString(", ")))

  /** Registered custom normalizers in deterministic order, for building
    * the transform dispatch chain. The fused built-ins are excluded: their
    * params live in dedicated perKey columns, not the generic map. */
  def customNormalizers: Seq[(String, NormalizerModel)] =
    normalizers.toSeq.filterNot(e => builtinNormalizers(e._1))
      .sortBy(_._1)

  val builtinNormalizers: Set[String] = Set("std", "quantile")

  // ── built-ins, registered at class load ──────────────────────────────

  /** The reference's `variance_impact_outlier_detector`
    * (`event_stream_dataset.py:50`): delegates to the exact-port fit in
    * [[Viod]]. */
  final class ViodDetector extends OutlierDetectorModel {
    def fitBounds(train: DataFrame, keyCol: String, valCol: String)
        : DataFrame = Viod.fitPerKey(train, keyCol, valCol)
  }

  /** Standard scaler as a standalone registry model (the fused fit inside
    * [[Preprocessor.fit]] is the production path — this form exists so
    * `NormalizerModel` is a complete API, and for composition outside the
    * orchestrator). Params: mean, std (ddof=1). */
  final class StdNormalizer extends NormalizerModel {
    def fitParams(train: DataFrame, keyCol: String, valCol: String)
        : DataFrame =
      train.filter(col(valCol).isNotNull)
        .groupBy(col(keyCol))
        .agg(map(
          lit("mean"), avg(col(valCol)),
          lit("std"), stddev_samp(col(valCol))).as("params"))
    def transformExpr(v: Column, params: Column): Column =
      NumericKernel.applyStandardScaler(v,
        element_at(params, "mean"), element_at(params, "std"))
  }

  /** Quantile (interpolated-ECDF) transformer as a standalone registry
    * model; the fused frequency-weighted fit in [[Preprocessor.fit]] is
    * the production path. Params: q0..q{n-1} (map keys are index
    * strings — maps carry the ragged quantile vector where a fixed-width
    * params row cannot). */
  final class QuantileNormalizer(nQuantiles: Int = 101)
      extends NormalizerModel {
    def fitParams(train: DataFrame, keyCol: String, valCol: String)
        : DataFrame = {
      val ps = array((0 until nQuantiles)
        .map(i => lit(i.toDouble / (nQuantiles - 1))): _*)
      train.filter(col(valCol).isNotNull)
        .groupBy(col(keyCol))
        .agg(percentile(col(valCol), ps).as("__qs"))
        .select(col(keyCol),
          map_from_arrays(
            transform(sequence(lit(0), lit(nQuantiles - 1)),
              i => concat(lit("q"), i.cast("string"))),
            col("__qs")).as("params"))
    }
    def transformExpr(v: Column, params: Column): Column =
      NumericKernel.applyQuantileTransform(v,
        transform(sequence(lit(0), lit(nQuantiles - 1)),
          i => element_at(params, concat(lit("q"), i.cast("string")))))
  }

  registerOutlierDetector("viod", new ViodDetector)
  registerNormalizer("std", new StdNormalizer)
  registerNormalizer("quantile", new QuantileNormalizer())
}
