package graft.preprocess

import graft.core.{CountOrProportion, Vocabulary}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Train-only fit / all-splits transform orchestrator — the reference's E2
  * lifecycle (/root/reference/EventStream/EventStreamData/
  * event_stream_dataset.py:930-1595) with the mutable inferred-config state
  * re-expressed as immutable DataFrames:
  *
  *   fit:  train observations → per-key `measurement_metadata`
  *         (value_type, VIOD bounds, normalizer params) + vocabulary
  *   transform: any split's observations ⋈ broadcast(metadata) → one
  *         narrow `select` (re-encode, drop/censor-free value cleanup,
  *         inlier flag, normalize, vocab index)
  *
  * The leakage rule is structural: `fit` only ever sees the frame the
  * caller passes (the train split — event_stream_dataset.py:1043,1125,
  * 1304-1308); `transform` applies those params to anything.
  *
  * Scale shape: each fit statistic is one groupBy(key) with map-side
  * partial aggregation; transform is a broadcast join + pure expressions
  * (whole-stage codegen, zero extra shuffles).
  */
object Preprocessor {

  final case class Config(
      minValidVocabElementObservations: Long = 10,
      minTrueFloatFrequency: Double = 0.25,
      minUniqueNumericalObservations: Long = 20,
      maxNumericalValueFrequency: Double = 0.5,
      /** None | Some("viod") */
      outlierDetector: Option[String] = None,
      /** None | Some("std") | Some("quantile") */
      normalizer: Option[String] = Some("std"),
      nQuantiles: Int = 101,
      /** Fold vocab elements rarer than this into UNK. */
      minValidVocabFold: Option[CountOrProportion] = None)

  /** Fit result: per-key numeric metadata + final-key vocabulary, both
    * plain DataFrames (persistable as parquet — no pickles). */
  final case class Fit(perKey: DataFrame, vocab: DataFrame)

  /** Fit numeric + categorical metadata on TRAIN observations.
    * `obs` must carry (keyCol STRING, valCol DOUBLE). */
  def fit(trainObs: DataFrame, keyCol: String, valCol: String,
      cfg: Config): Fit = {
    val obs = trainObs.select(col(keyCol).cast("string").as("key"),
      col(valCol).cast("double").as("v"))

    // 1. per-key value-type inference (one groupBy pass).
    val types = NumericKernel.inferValueTypes(obs, "key", "v",
      cfg.minValidVocabElementObservations,
      cfg.minTrueFloatFrequency,
      cfg.minUniqueNumericalObservations,
      cfg.maxNumericalValueFrequency)
      .select(col("key"), col("value_type"))

    // 2. type-adjusted values for downstream numeric fits (INTEGER keys
    //    round; categorical/dropped keys contribute no numeric values).
    val adjusted = obs.join(types, Seq("key"))
      .withColumn("v1", NumericKernel.reencodeValue(col("v"),
        col("value_type")))
      .filter(col("value_type").isin("integer", "float") &&
        col("v1").isNotNull)

    // 3. optional VIOD outlier bounds per key + all-outliers drop guard
    //    (event_stream_dataset.py:1198-1208).
    val withViod = cfg.outlierDetector match {
      case Some("viod") =>
        val bounds = Viod.fitPerKey(adjusted, "key", "v1")
        val inlierCounts = adjusted.join(bounds, Seq("key"))
          .filter(col("v1") > col("viod_lo") && col("v1") < col("viod_hi"))
          .groupBy("key").agg(count(lit(1)).as("n_inliers"))
        types.join(bounds, Seq("key"), "left")
          .join(inlierCounts, Seq("key"), "left")
          .withColumn("value_type",
            when(col("viod_lo").isNotNull &&
              coalesce(col("n_inliers"), lit(0L)) === 0, lit("dropped"))
              .otherwise(col("value_type")))
          .drop("n_inliers")
      case _ =>
        types.withColumn("viod_lo", lit(null).cast("double"))
          .withColumn("viod_hi", lit(null).cast("double"))
    }

    // 4. normalizer fit on train inliers only (:1208 — outliers are nulled
    //    before the normalizer sees them).
    val inliers = adjusted.join(withViod.select("key", "viod_lo", "viod_hi"),
        Seq("key"), "left")
      .filter(NumericKernel.isInlier(col("v1"), col("viod_lo"),
        col("viod_hi")))
    val withNorm = cfg.normalizer match {
      case Some("std") =>
        withViod.join(NumericKernel.fitStandardScaler(inliers, "key", "v1"),
          Seq("key"), "left")
          .withColumn("quantiles",
            lit(null).cast("array<double>"))
      case Some("quantile") =>
        withViod.join(NumericKernel.fitQuantiles(inliers, "key", "v1",
            cfg.nQuantiles), Seq("key"), "left")
          .withColumn("norm_mean", lit(null).cast("double"))
          .withColumn("norm_std", lit(null).cast("double"))
      case _ =>
        withViod.withColumn("norm_mean", lit(null).cast("double"))
          .withColumn("norm_std", lit(null).cast("double"))
          .withColumn("quantiles", lit(null).cast("array<double>"))
    }

    // 5. vocabulary over the FINAL key space (categorical keys re-encoded
    //    to "key__EQ_v" — event_stream_dataset.py:288-368 — so the vocab
    //    indexes exactly what transform emits). value_type='dropped' keys
    //    are excluded: in the reference they fall below
    //    min_valid_vocab_element_observations during categorical processing
    //    and fold into UNK (:1279-1310), so transform must emit key_idx=0
    //    for them regardless of the fold config.
    // join against withViod (not types): the all-outliers guard can flip a
    // key to 'dropped' after inference, and that key must fold too.
    val finalKeys = obs.join(withViod.select("key", "value_type"), Seq("key"))
      .filter(col("value_type") =!= "dropped")
      .select(NumericKernel.reencodeKey(col("key"), col("v"),
        col("value_type")).as("final_key"))
    val rawVocab = Vocabulary.fit(finalKeys, "final_key")
    val vocab = cfg.minValidVocabFold match {
      case Some(m) =>
        val total = finalKeys.filter(col("final_key").isNotNull).count()
        Vocabulary.filterRare(rawVocab, m, total)
      case None => rawVocab
    }
    // Fit state is per-key-cardinality small but its LINEAGE scans the full
    // train set — materialize via localCheckpoint so repeated transforms
    // (or multi-split application) don't re-run the fit aggregations per
    // use. localCheckpoint rather than cache(): CacheManager entries tax
    // plan lookup for every later query in long sessions.
    Fit(withNorm.localCheckpoint(true), vocab.localCheckpoint(true))
  }

  /** Apply a fit to any split's observations: broadcast-join the per-key
    * metadata + vocab, then pure column expressions. Appends
    * (final_key, value_clean, is_inlier, value_norm, key_idx). */
  def transform(obs: DataFrame, keyCol: String, valCol: String,
      fit: Fit): DataFrame = {
    val meta = fit.perKey.withColumnRenamed("key", "__k")
    val joined = obs.join(broadcast(meta),
      obs(keyCol).cast("string") === col("__k"), "left")
    // Keys never seen at fit time get NULLED values (the reference nulls
    // values whose key is outside the fitted space,
    // event_stream_dataset.py:1408) — NOT identity passthrough.
    val seen = col("__k").isNotNull
    val vt = coalesce(col("value_type"), lit("float"))
    val v = col(valCol).cast("double")
    val finalKey = NumericKernel.reencodeKey(
      col(keyCol).cast("string"), v, vt)
    val v1 = when(seen, NumericKernel.reencodeValue(v, vt))
    val isInlier = NumericKernel.isInlier(v1, col("viod_lo"),
      col("viod_hi"))
    val vInlier = when(isInlier, v1)
    val vNorm =
      when(col("norm_mean").isNotNull,
        NumericKernel.applyStandardScaler(vInlier, col("norm_mean"),
          col("norm_std")))
        .when(col("quantiles").isNotNull,
          NumericKernel.applyQuantileTransform(vInlier, col("quantiles")))
        .otherwise(vInlier)
    val stage = joined
      .withColumn("final_key", finalKey)
      .withColumn("value_clean", vInlier)
      .withColumn("is_inlier", seen && v1.isNotNull && isInlier)
      .withColumn("value_norm", vNorm)
      .drop("__k", "value_type", "viod_lo", "viod_hi", "norm_mean",
        "norm_std", "quantiles")
    Vocabulary.lookup(stage, "final_key", fit.vocab, "key_idx")
  }
}
