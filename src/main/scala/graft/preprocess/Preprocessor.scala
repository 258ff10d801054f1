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

  /** Thresholds use the reference's shapes (config.py:285-402): each rule
    * is DISABLED when `None`, and count thresholds may be proportions
    * (`CountOrProportion.proportion`), resolved as the reference does —
    * min-valid-vocab against the column's total observations,
    * min-unique against each key's value count. */
  final case class Config(
      minValidVocabElementObservations: Option[CountOrProportion] =
        Some(CountOrProportion.count(10)),
      minTrueFloatFrequency: Option[Double] = Some(0.25),
      minUniqueNumericalObservations: Option[CountOrProportion] =
        Some(CountOrProportion.count(20)),
      maxNumericalValueFrequency: Option[Double] = Some(0.5),
      /** None | Some("viod") */
      outlierDetector: Option[String] = None,
      /** None | Some("std") | Some("quantile") */
      normalizer: Option[String] = Some("std"),
      nQuantiles: Int = 101,
      /** Fold vocab elements rarer than this into UNK. */
      minValidVocabFold: Option[CountOrProportion] = None)

  object Config {
    /** Convenience: plain-count thresholds. */
    def counts(minValidVocabElementObservations: Long = 10,
        minTrueFloatFrequency: Double = 0.25,
        minUniqueNumericalObservations: Long = 20,
        maxNumericalValueFrequency: Double = 0.5,
        outlierDetector: Option[String] = None,
        normalizer: Option[String] = Some("std"),
        nQuantiles: Int = 101,
        minValidVocabFold: Option[CountOrProportion] = None): Config =
      Config(
        Some(CountOrProportion.count(minValidVocabElementObservations)),
        Some(minTrueFloatFrequency),
        Some(CountOrProportion.count(minUniqueNumericalObservations)),
        Some(maxNumericalValueFrequency),
        outlierDetector, normalizer, nQuantiles, minValidVocabFold)
  }

  /** Fit result: per-key numeric metadata + final-key vocabulary, both
    * plain DataFrames (persistable as parquet — no pickles). */
  final case class Fit(perKey: DataFrame, vocab: DataFrame)

  /** Fit numeric + categorical metadata on TRAIN observations.
    * `obs` must carry (keyCol STRING, valCol DOUBLE).
    *
    * Scan discipline (the fit statistics are all per-key-small; the train
    * scans are the cost): pass 1 infers value types (one wide aggregation);
    * pass 2 (only when VIOD is enabled) fits outlier bounds; pass 3 is ONE
    * fused groupBy(key, final_key) that simultaneously produces the
    * normalizer statistics (over VIOD inliers), the all-outliers drop
    * guard's inlier counts, and the final-key vocabulary counts. Everything
    * downstream assembles from those tiny aggregates — 2 train scans
    * without VIOD, 3 with (previously 3-5). */
  def fit(trainObs: DataFrame, keyCol: String, valCol: String,
      cfg: Config): Fit = {
    val obs = trainObs.select(col(keyCol).cast("string").as("key"),
      col(valCol).cast("double").as("v"))

    // 1. per-key value-type inference (one wide pass; tiny result).
    //    Checkpointed: three consumers below broadcast it.
    val types = NumericKernel.inferValueTypesCfg(obs, "key", "v",
      cfg.minValidVocabElementObservations,
      cfg.minTrueFloatFrequency,
      cfg.minUniqueNumericalObservations,
      cfg.maxNumericalValueFrequency)
      .select(col("key"), col("value_type"))
      .localCheckpoint(true)

    // 2. optional VIOD outlier bounds per key (its own pass: the typed
    //    Aggregator needs the raw values; event_stream_dataset.py:1198).
    val bounds = cfg.outlierDetector match {
      case Some("viod") =>
        val adjusted = obs.join(broadcast(types), Seq("key"))
          .withColumn("v1", NumericKernel.reencodeValue(col("v"),
            col("value_type")))
          .filter(col("value_type").isin("integer", "float") &&
            col("v1").isNotNull)
        Viod.fitPerKey(adjusted, "key", "v1")
      case _ =>
        types.select(col("key"), lit(null).cast("double").as("viod_lo"),
          lit(null).cast("double").as("viod_hi")).limit(0)
    }
    val typesB = types.join(bounds, Seq("key"), "left")
      .localCheckpoint(true)

    // 3. the fused pass: one scan, one shuffle keyed by (key, final_key).
    //    Per group: vocab count, inlier count (drop guard), and the
    //    normalizer moments/quantiles over inlier values. For numeric keys
    //    final_key == key, so their group row carries the per-key stats.
    val numeric = col("value_type").isin("integer", "float")
    val v1 = when(numeric,
      NumericKernel.reencodeValue(col("v"), col("value_type")))
    val inlier = NumericKernel.isInlier(col("v1"), col("viod_lo"),
      col("viod_hi"))
    val vIn = when(col("__inlier"), col("v1"))
    val normAggs = cfg.normalizer match {
      case Some("std") => Seq(
        avg(vIn).as("norm_mean"), stddev_samp(vIn).as("norm_std"))
      case Some("quantile") =>
        val ps = array((0 until cfg.nQuantiles)
          .map(i => lit(i.toDouble / (cfg.nQuantiles - 1))): _*)
        Seq(percentile(vIn, ps).as("quantiles"))
      case _ => Seq.empty
    }
    val statAggs = Seq(
      count(when(col("final_key").isNotNull, lit(1))).as("n_fk"),
      count(when(col("__inlier") && col("v1").isNotNull, lit(1)))
        .as("n_inliers")) ++ normAggs
    val grouped = obs.join(broadcast(typesB), Seq("key"))
      .withColumn("final_key", NumericKernel.reencodeKey(col("key"),
        col("v"), col("value_type")))
      .withColumn("v1", v1)
      .withColumn("__inlier", inlier)
      .groupBy(col("key"), col("value_type"), col("final_key"))
      .agg(statAggs.head, statAggs.tail: _*)
      .localCheckpoint(true)

    // all-outliers drop guard (event_stream_dataset.py:1198-1208): a key
    // whose every value is a VIOD outlier drops entirely. Per-key verdict
    // from the numeric keys' own group rows (final_key == key).
    val guard = grouped.filter(numeric)
      .join(typesB.select("key", "viod_lo"), Seq("key"), "left")
      .filter(col("viod_lo").isNotNull && col("n_inliers") === 0)
      .select(col("key"), lit("dropped").as("__guard_vt"))
    val perKey = typesB.join(broadcast(guard), Seq("key"), "left")
      .withColumn("value_type",
        coalesce(col("__guard_vt"), col("value_type")))
      .drop("__guard_vt")
    val normCols = grouped.filter(numeric)
      .drop("final_key", "value_type", "n_fk", "n_inliers")
    val withNorm = (cfg.normalizer match {
      case Some("std") =>
        perKey.join(normCols, Seq("key"), "left")
          .withColumn("quantiles", lit(null).cast("array<double>"))
      case Some("quantile") =>
        perKey.join(normCols, Seq("key"), "left")
          .withColumn("norm_mean", lit(null).cast("double"))
          .withColumn("norm_std", lit(null).cast("double"))
      case _ =>
        perKey.withColumn("norm_mean", lit(null).cast("double"))
          .withColumn("norm_std", lit(null).cast("double"))
          .withColumn("quantiles", lit(null).cast("array<double>"))
    })

    // 4. vocabulary over the FINAL key space (categorical keys re-encoded
    //    to "key__EQ_v" — event_stream_dataset.py:288-368 — so the vocab
    //    indexes exactly what transform emits), straight from the fused
    //    pass's counts: no re-scan. value_type='dropped' keys (inference
    //    OR the all-outliers guard) are excluded: in the reference they
    //    fall below min_valid_vocab_element_observations during
    //    categorical processing and fold into UNK (:1279-1310), so
    //    transform must emit key_idx=0 for them.
    // the anti-join against perKey's dropped keys covers BOTH inference-
    // dropped and guard-dropped keys (perKey's value_type is the coalesced
    // verdict) — no additional row-level filter needed
    val fkCounts = grouped
      .join(broadcast(perKey.filter(col("value_type") === "dropped")
        .select(col("key"))), Seq("key"), "left_anti")
      .select(col("final_key").as("element"), col("n_fk").as("n"))
    val rawVocab = Vocabulary.fitFromCounts(fkCounts)
    val vocab = cfg.minValidVocabFold match {
      case Some(m) =>
        val total = fkCounts.agg(coalesce(sum("n"), lit(0L)))
          .collect().head.getLong(0)
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
