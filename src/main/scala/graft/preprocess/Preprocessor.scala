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
      /** None | Some(name registered in [[NumericModels]]) — "viod"
        * built-in. */
      outlierDetector: Option[String] = None,
      /** None | Some(name registered in [[NumericModels]]) — "std" and
        * "quantile" built-in (fused single-scan fit); other names fit via
        * their model's own pass over the inlier train values. */
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
    * Scan discipline: the train observations are scanned ONCE, into the
    * per-(key, value) counts table (`NumericKernel.perValueCounts`) — the
    * same aggregation type inference needs anyway. That table is
    * checkpointed and every other fit statistic derives from it:
    * value-type inference, the fused per-(key, final_key) vocab/normalizer
    * aggregation (frequency-weighted), and the quantile fit (Spark's
    * `percentile` takes a frequency column). VIOD alone re-scans the
    * observations (it consumes the raw value multiset; expanding the
    * counts back out would blow up on high-multiplicity values).
    * At 100 TB the counts table is at worst input-sized (all-distinct float
    * keys) but 3 columns wide — every downstream pass reads THAT instead of
    * re-scanning the full-width input.
    *
    * Job discipline (the MLlib-model idiom — StringIndexerModel holds its
    * labels on the driver): the per-key statistics and the vocabulary are
    * COLLECTED and assembled driver-side, and the returned Fit frames are
    * LocalTableScan relations. Fit state destined for broadcast joins must
    * fit in memory anyway, and local relations cost zero cluster jobs per
    * consumer — the whole fit is 3 actions (counts checkpoint, type
    * collect, stats collect; +1 with VIOD) instead of a dozen checkpoint/
    * broadcast/rank jobs. Driver-side sorts reproduce Spark ordering
    * exactly (UTF-8 tie-break — Vocabulary.utf8Lt). */
  def fit(trainObs: DataFrame, keyCol: String, valCol: String,
      cfg: Config): Fit = {
    val spark = trainObs.sparkSession
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types._
    import scala.jdk.CollectionConverters._
    val obs = trainObs.select(col(keyCol).cast("string").as("key"),
      col(valCol).cast("double").as("v"))

    // 1. THE scan: per-(key, value) counts, checkpointed for every
    //    downstream consumer.
    val perValue = NumericKernel.perValueCounts(obs, "key", "v")
      .localCheckpoint(true)

    // 2. per-key value-type inference — a tiny aggregation over the
    //    checkpointed counts, collected. k_shift is the per-key raw
    //    weighted mean, the variance shift below.
    val typesRows: Array[(String, String, Option[Double])] =
      NumericKernel.inferValueTypesFromCounts(perValue,
        cfg.minValidVocabElementObservations,
        cfg.minTrueFloatFrequency,
        cfg.minUniqueNumericalObservations,
        cfg.maxNumericalValueFrequency)
        .select(col("key"), col("value_type"), col("k_shift"))
        .collect()
        .map(r => (r.getString(0), r.getString(1),
          if (r.isNullAt(2)) None else Some(r.getDouble(2))))
    val typesSchema = StructType(Seq(
      StructField("key", StringType),
      StructField("value_type", StringType),
      StructField("k_shift", DoubleType)))
    val typesLocal = spark.createDataFrame(
      typesRows.toSeq.map { case (k, vt, ks) =>
        Row(k, vt, ks.map(Double.box).orNull) }.asJava, typesSchema)

    // 3. optional VIOD outlier bounds per key — the one statistic that
    //    needs the raw value MULTISET, so it re-scans the observations
    //    (broadcast-joined to the local types table) rather than
    //    re-expanding the counts: an array_repeat expansion would
    //    materialize cnt-sized arrays (ANSI overflow past 2^31, executor
    //    OOM long before) on high-multiplicity values
    //    (event_stream_dataset.py:1198).
    val viodBounds: Map[String, (Double, Double)] =
      cfg.outlierDetector match {
        case Some(name) =>
          // resolved via the METADATA_MODELS-style registry — "viod" maps
          // to the exact-port Viod.fitPerKey; custom detectors plug in by
          // name with the same (key, lo, hi) contract
          val adjusted = obs.join(broadcast(typesLocal), Seq("key"))
            .withColumn("v1", NumericKernel.reencodeValue(col("v"),
              col("value_type")))
            .filter(col("value_type").isin("integer", "float") &&
              col("v1").isNotNull)
          NumericModels.outlierDetector(name)
            .fitBounds(adjusted, "key", "v1").collect()
            .map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2)))
            .toMap
        case None => Map.empty
      }
    val typesBLocal = spark.createDataFrame(
      typesRows.toSeq.map { case (k, vt, ks) =>
        val b = viodBounds.get(k)
        Row(k, vt, ks.map(Double.box).orNull,
          b.map(x => Double.box(x._1)).orNull,
          b.map(x => Double.box(x._2)).orNull) }.asJava,
      typesSchema
        .add(StructField("viod_lo", DoubleType))
        .add(StructField("viod_hi", DoubleType)))

    // 4. the fused aggregation over the counts table, keyed by
    //    (key, final_key), frequency-weighted, collected. For numeric keys
    //    final_key == key, so their single group row carries the per-key
    //    normalizer statistics: shifted moments for std (centering on
    //    k_shift ≈ mean removes the naive sum-of-squares cancellation),
    //    frequency-weighted exact percentile for quantile.
    val numeric = col("value_type").isin("integer", "float")
    val v1 = when(numeric,
      NumericKernel.reencodeValue(col("v"), col("value_type")))
    val inlier = NumericKernel.isInlier(col("v1"), col("viod_lo"),
      col("viod_hi"))
    val cnt = col("cnt")
    val normAggs = cfg.normalizer match {
      case Some("std") => Seq(
        sum(when(col("__vin").isNotNull, cnt)).as("__n_in"),
        sum(when(col("__vin").isNotNull,
          (col("__vin") - col("k_shift")) * cnt)).as("__s1c"),
        sum(when(col("__vin").isNotNull,
          (col("__vin") - col("k_shift")) * (col("__vin") - col("k_shift"))
            * cnt)).as("__s2c"))
      case Some("quantile") =>
        val ps = array((0 until cfg.nQuantiles)
          .map(i => lit(i.toDouble / (cfg.nQuantiles - 1))): _*)
        Seq(percentile(col("__vin"), ps, cnt).as("quantiles"))
      case _ => Seq.empty
    }
    val statAggs = Seq(
      sum(when(col("final_key").isNotNull, cnt).otherwise(lit(0L)))
        .as("n_fk"),
      sum(when(col("__inlier") && col("v1").isNotNull, cnt)
        .otherwise(lit(0L))).as("n_inliers")) ++ normAggs
    val groupedRows = perValue.join(broadcast(typesBLocal), Seq("key"))
      .withColumn("final_key", NumericKernel.reencodeKey(col("key"),
        col("v"), col("value_type")))
      .withColumn("v1", v1)
      .withColumn("__inlier", inlier)
      .withColumn("__vin", when(col("__inlier"), col("v1")))
      .groupBy(col("key"), col("value_type"), col("final_key"))
      .agg(statAggs.head, statAggs.tail: _*)
      .collect()
    val gKey = (r: Row) => r.getString(0)
    val gVt = (r: Row) => r.getString(1)
    val gFk = (r: Row) => r.getString(2)
    val gNFk = (r: Row) => r.getLong(3)
    val gNIn = (r: Row) => r.getLong(4)
    val isNum = (vt: String) => vt == "integer" || vt == "float"

    // all-outliers drop guard (event_stream_dataset.py:1198-1208): a key
    // whose every value is a VIOD outlier drops entirely.
    val guardSet: Set[String] = groupedRows.iterator
      .filter(r => isNum(gVt(r)) && viodBounds.contains(gKey(r)) &&
        gNIn(r) == 0L)
      .map(gKey).toSet

    // per-key normalizer params from the numeric keys' own group rows.
    //   mean = k + Σc(v−k)/n        (exact)
    //   var  = (Σc(v−k)² − (Σc(v−k))²/n) / (n−1)   (shift-centered)
    // n==1 → NaN (stddev_samp semantics), n==0 → null.
    val kShift = typesRows.map(t => t._1 -> t._3).toMap
    val normByKey: Map[String, (Option[Double], Option[Double],
        Option[Seq[Double]])] =
      groupedRows.iterator.filter(r => isNum(gVt(r))).map { r =>
        cfg.normalizer match {
          case Some("std") =>
            val nIn = if (r.isNullAt(5)) 0L else r.getLong(5)
            val s1c = if (r.isNullAt(6)) 0.0 else r.getDouble(6)
            val s2c = if (r.isNullAt(7)) 0.0 else r.getDouble(7)
            val k = kShift(gKey(r)).getOrElse(0.0)
            val mean = if (nIn > 0) Some(k + s1c / nIn) else None
            val std =
              if (nIn >= 2)
                Some(math.sqrt(math.max(
                  (s2c - s1c * s1c / nIn) / (nIn - 1), 0.0)))
              else if (nIn == 1) Some(Double.NaN)
              else None
            gKey(r) -> ((mean, std, None))
          case Some("quantile") =>
            val q = if (r.isNullAt(5)) None else Some(r.getSeq[Double](5))
            gKey(r) -> ((None, None, q))
          case _ => gKey(r) -> ((None, None, None))
        }
      }.toMap

    val finalVt: Map[String, String] = typesRows.iterator.map {
      case (k, vt, _) => k -> (if (guardSet(k)) "dropped" else vt) }.toMap

    // 4b. CUSTOM registry normalizer (any name outside the fused
    //     built-ins): the model fits per-key params with its own pass over
    //     the INLIER train values — the same frame the fused aggregation
    //     weights by counts, re-expanded from the raw observations because
    //     a custom model's statistics need not be frequency-decomposable.
    //     Params land in a generic MAP<STRING,DOUBLE> column
    //     (params-as-data; the model name rides along for the transform
    //     dispatch).
    val customName: Option[String] =
      cfg.normalizer.filterNot(NumericModels.builtinNormalizers)
    val customParams: Map[String, Map[String, Double]] = customName match {
      case Some(name) =>
        val model = NumericModels.normalizer(name)
        val inliers = obs.join(broadcast(typesBLocal), Seq("key"))
          .withColumn("v1", NumericKernel.reencodeValue(col("v"),
            col("value_type")))
          .withColumn("__inl", NumericKernel.isInlier(col("v1"),
            col("viod_lo"), col("viod_hi")))
          .filter(col("value_type").isin("integer", "float") &&
            col("v1").isNotNull && col("__inl") &&
            (if (guardSet.isEmpty) lit(true)
             else !col("key").isin(guardSet.toSeq: _*)))
        model.fitParams(inliers, "key", "v1").collect()
          .map(r => r.getString(0) ->
            r.getMap[String, Double](1).toMap).toMap
      case None => Map.empty
    }

    val perKeySchema = StructType(Seq(
      StructField("key", StringType),
      StructField("value_type", StringType),
      StructField("viod_lo", DoubleType),
      StructField("viod_hi", DoubleType),
      StructField("norm_mean", DoubleType),
      StructField("norm_std", DoubleType),
      StructField("quantiles", ArrayType(DoubleType)),
      StructField("norm_name", StringType),
      StructField("norm_params", MapType(StringType, DoubleType))))
    val perKeyDf = spark.createDataFrame(
      typesRows.toSeq.map { case (k, _, _) =>
        val b = viodBounds.get(k)
        val nrm = normByKey.getOrElse(k, (None, None, None))
        val cp = customParams.get(k)
        Row(k, finalVt(k),
          b.map(x => Double.box(x._1)).orNull,
          b.map(x => Double.box(x._2)).orNull,
          nrm._1.map(Double.box).orNull,
          nrm._2.map(Double.box).orNull,
          nrm._3.orNull,
          cp.flatMap(_ => customName).orNull,
          cp.orNull) }.asJava, perKeySchema)

    // 5. vocabulary over the FINAL key space (categorical keys re-encoded
    //    to "key__EQ_v" — event_stream_dataset.py:288-368 — so the vocab
    //    indexes exactly what transform emits), straight from the fused
    //    rows. value_type='dropped' keys (inference OR the guard) are
    //    excluded: in the reference they fall below
    //    min_valid_vocab_element_observations during categorical processing
    //    and fold into UNK (:1279-1310), so transform emits key_idx=0.
    val fkCounts: Seq[(String, Long)] = groupedRows.iterator
      .filter(r => finalVt(gKey(r)) != "dropped" && gFk(r) != null)
      .map(r => gFk(r) -> gNFk(r)).toSeq
    val rawTuples = Vocabulary.vocabTuplesFromCounts(fkCounts)
    val vocabTuples = cfg.minValidVocabFold match {
      case Some(m) =>
        Vocabulary.foldRareTuples(rawTuples, m, fkCounts.map(_._2).sum)
      case None => rawTuples
    }
    Fit(perKeyDf, Vocabulary.vocabDfFromTuples(spark, vocabTuples))
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
    // custom registry normalizers dispatch on the fitted model name — a
    // when-chain over the registered models (the reference resolves the
    // pickled model class the same way: by what's importable at load time).
    // A fitted norm_name with no registered model is a deploy error, not a
    // value: fail loudly (the reference's unpickle would raise on a missing
    // class), never silently pass the unnormalized value through.
    val unregistered = raise_error(
      concat(lit("unregistered normalizer: "), col("norm_name"))).cast("double")
    val customNorm = NumericModels.customNormalizers.foldLeft(unregistered) {
      case (acc, (name, m)) =>
        when(col("norm_name") === name,
          m.transformExpr(vInlier, col("norm_params"))).otherwise(acc)
    }
    val vNorm =
      when(col("norm_mean").isNotNull,
        NumericKernel.applyStandardScaler(vInlier, col("norm_mean"),
          col("norm_std")))
        .when(col("quantiles").isNotNull,
          NumericKernel.applyQuantileTransform(vInlier, col("quantiles")))
        .when(col("norm_params").isNotNull, customNorm)
        .otherwise(vInlier)
    val stage = joined
      .withColumn("final_key", finalKey)
      .withColumn("value_clean", vInlier)
      .withColumn("is_inlier", seen && v1.isNotNull && isInlier)
      .withColumn("value_norm", vNorm)
      .drop("__k", "value_type", "viod_lo", "viod_hi", "norm_mean",
        "norm_std", "quantiles", "norm_name", "norm_params")
    Vocabulary.lookup(stage, "final_key", fit.vocab, "key_idx")
  }
}
