package graft.preprocess

import graft.core.{DataModality, DatasetConfig, MeasurementConfig, TemporalityType, Vocabulary}
import graft.functors.TimeDependentFunctor
import graft.ingest.{EventDataset, Splits}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Dataset-level preprocessing orchestration — the reference's
  * `preprocess_metadata` (event_stream_dataset.py:930-1013) driving the
  * per-measurement source routing of §2.8 (:1302-1308):
  *
  *   DYNAMIC measurements           → train rows of the measurements table
  *   STATIC measurements            → train rows of the subjects table
  *   FUNCTIONAL_TIME_DEPENDENT      → functor columns computed on train
  *                                    events (⋈ broadcast subjects)
  *
  * All fits see ONLY the train split (leakage rule, :1043/:1125/:1304);
  * transform applies the fitted params to every split. The fitted state is
  * a map of small DataFrames (see Preprocessor.Fit) — the immutable
  * analogue of the reference's `inferred_measurement_configs`.
  */
object DatasetPreprocessor {

  final case class FittedDataset(
      dynamic: Map[String, Preprocessor.Fit],
      dynamicCategorical: Map[String, DataFrame],
      static: Map[String, DataFrame],
      timeDependent: Map[String, Preprocessor.Fit],
      /** Measurements dropped by the observation-count rule
        * (event_stream_dataset.py:1048-1050,1346-1348). */
      dropped: Set[String] = Set.empty)

  def fit(ds: EventDataset, splits: DataFrame, cfg: DatasetConfig,
      functors: Seq[TimeDependentFunctor] = Nil,
      basePcfg: Preprocessor.Config = Preprocessor.Config()): FittedDataset = {
    // The DatasetConfig is AUTHORITATIVE for the four inference thresholds
    // (config.py:347-351, every default None = rule disabled: None here
    // means the rule is OFF, not "inherit") AND for the model names — the
    // reference's outlier_detector_config/normalizer_config 'cls' keys
    // (config.py:330-342), resolved through the NumericModels registry.
    // basePcfg contributes only the remaining engine-side knobs (quantile
    // count, vocab fold).
    val pcfg = basePcfg.copy(
      minValidVocabElementObservations = cfg.minValidVocabElementObservations,
      minTrueFloatFrequency = cfg.minTrueFloatFrequency,
      minUniqueNumericalObservations = cfg.minUniqueNumericalObservations,
      maxNumericalValueFrequency = cfg.maxNumericalValueFrequency,
      normalizer = cfg.normalizer,
      outlierDetector = cfg.outlierDetector)
    val trainMeasAll = Splits.forSplit(ds.measurements, splits, "train")
    val trainSubj = Splits.forSplit(ds.subjects, splits, "train")
    val trainEvents = Splits.forSplit(
      TimeDependentFunctor.addColumns(ds.events, ds.subjects, functors),
      splits, "train")

    // Column-drop rule: a DYNAMIC measurement observed fewer than
    // minValidColumnObservations times on train (count or proportion of
    // train events) is dropped before any fitting.
    val dropped: Set[String] = cfg.minValidColumnObservations match {
      case Some(m) =>
        // count train events WITHOUT the functor/subjects join — only the
        // row count matters here
        val totalTrainEvents =
          Splits.forSplit(ds.events, splits, "train").count()
        val observed = trainMeasAll.groupBy("measurement")
          .agg(count(lit(1)).as("n")).collect()
          .map(r => r.getString(0) -> r.getLong(1)).toMap
        val minN = m.resolve(totalTrainEvents)
        cfg.measurements.collect {
          case mc if mc.temporality == TemporalityType.Dynamic &&
            observed.getOrElse(mc.name, 0L) < minN => mc.name
        }.toSet
      case None => Set.empty
    }
    // Missing-column drop (event_stream_dataset.py:1310-1312): a STATIC
    // measurement whose column is absent from subjects, or an FTD
    // measurement whose functor column is absent from the events frame,
    // is dropped rather than failing analysis. (Dynamic measurements
    // live in the long layout, where "column absent" is just zero rows —
    // the observation-count rule above covers them.)
    val schemaDropped: Set[String] = cfg.measurements.collect {
      case m if m.temporality == TemporalityType.Static &&
        !ds.subjects.columns.contains(m.name) => m.name
      case m if m.temporality == TemporalityType.FunctionalTimeDependent &&
        !trainEvents.columns.contains(m.name) => m.name
    }.toSet
    val keptMeasurements = cfg.measurements
      .filterNot(m => dropped.contains(m.name) ||
        schemaDropped.contains(m.name))

    // Per-measurement fits are independent — run them CONCURRENTLY.
    // Each fit is a short chain of eager jobs (checkpointed aggregates);
    // serial execution leaves the cluster idle between a measurement's
    // jobs. Spark job submission is thread-safe; a dataset with dozens of
    // measurements fits in the wall-clock of its widest one.
    import scala.concurrent.{Await, Future}
    import scala.concurrent.ExecutionContext.Implicits.global
    import scala.concurrent.duration.Duration

    val dynamicF = keptMeasurements.collect {
      case m if m.temporality == TemporalityType.Dynamic &&
          m.modality == DataModality.MultivariateRegression =>
        val obs = trainMeasAll.filter(col("measurement") === m.name)
        m.name -> Future(Preprocessor.fit(obs, "key", "value", pcfg))
    }

    val dynamicCategoricalF = keptMeasurements.collect {
      case m if m.temporality == TemporalityType.Dynamic &&
          (m.modality == DataModality.SingleLabelClassification ||
            m.modality == DataModality.MultiLabelClassification) =>
        val obs = trainMeasAll.filter(col("measurement") === m.name)
        // fitLocal: the vocab is broadcast-joined at transform time, so it
        // must be memory-small anyway — the LocalTableScan form costs zero
        // cluster jobs per consumer (no checkpoint, no rank jobs)
        m.name -> Future(Vocabulary.fitLocal(obs, "key"))
    }

    val staticF = keptMeasurements.collect {
      case m if m.temporality == TemporalityType.Static =>
        m.name -> Future(Vocabulary.fitLocal(trainSubj, m.name))
    }

    val timeDependentF = keptMeasurements.collect {
      case m if m.temporality == TemporalityType.FunctionalTimeDependent =>
        // univariate: the functor column under a constant key
        val obs = trainEvents.select(lit(m.name).as("key"),
          col(m.name).cast("double").as("value"))
        m.name -> Future(Preprocessor.fit(obs, "key", "value", pcfg))
    }

    def await[A](fs: Seq[(String, Future[A])]): Map[String, A] =
      fs.map { case (n, f) => n -> Await.result(f, Duration.Inf) }.toMap

    FittedDataset(await(dynamicF), await(dynamicCategoricalF),
      await(staticF), await(timeDependentF), dropped ++ schemaDropped)
  }

  /** Transform every split with train-fit params.
    * Returns (measurements with per-measurement transforms applied,
    * events with functor columns + normalized FTD values,
    * subjects with per-static-measurement vocab indices). */
  def transform(ds: EventDataset, fit: FittedDataset,
      functors: Seq[TimeDependentFunctor] = Nil)
      : (DataFrame, DataFrame, DataFrame) = {
    // dynamic numeric: transform each measurement's slice, union back.
    // Dropped measurements' rows are removed entirely (the reference drops
    // the column).
    val untouched = ds.measurements.filter(
      !col("measurement").isin(
        (fit.dynamic.keySet ++ fit.dynamicCategorical.keySet ++
          fit.dropped).toSeq: _*))
    val numericParts = fit.dynamic.map { case (name, f) =>
      Preprocessor.transform(
        ds.measurements.filter(col("measurement") === name),
        "key", "value", f)
    }
    val catParts = fit.dynamicCategorical.map { case (name, vocab) =>
      Vocabulary.lookup(
        ds.measurements.filter(col("measurement") === name),
        "key", vocab, "key_idx")
        .withColumn("final_key", col("key"))
        .withColumn("value_clean", lit(null).cast("double"))
        .withColumn("is_inlier", lit(true))
        .withColumn("value_norm", lit(null).cast("double"))
    }
    // The augmented untouched frame is ALWAYS the base (so dropped
    // measurements are excluded and the output schema is stable even when
    // no measurement was fitted); fitted parts union into it.
    val untouchedAugmented = untouched
      .withColumn("final_key", col("key"))
      .withColumn("value_clean", col("value"))
      .withColumn("is_inlier", lit(true))
      .withColumn("value_norm", col("value"))
      .withColumn("key_idx", lit(0))
    val transformedMeas = (numericParts ++ catParts)
      .foldLeft(untouchedAugmented)(_.unionByName(_))

    // events: functor columns + FTD normalization
    val withFunctors =
      TimeDependentFunctor.addColumns(ds.events, ds.subjects, functors)
    val transformedEvents = fit.timeDependent.foldLeft(withFunctors) {
      case (ev, (name, f)) =>
        val obs = ev.select(col("*"), lit(name).as("__ftd_key"))
        Preprocessor.transform(obs, "__ftd_key", name, f)
          .withColumnRenamed("value_norm", s"${name}_norm")
          .drop("__ftd_key", "final_key", "value_clean", "is_inlier",
            "key_idx")
    }

    // subjects: static vocab indices
    val transformedSubjects = fit.static.foldLeft(ds.subjects) {
      case (subj, (name, vocab)) =>
        Vocabulary.lookup(subj, name, vocab, s"${name}_idx")
    }
    (transformedMeas, transformedEvents, transformedSubjects)
  }
}
