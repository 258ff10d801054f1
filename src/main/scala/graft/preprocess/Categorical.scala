package graft.preprocess

import graft.core.{CountOrProportion, Vocabulary}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Categorical measurement preprocessing (reference
  * event_stream_dataset.py:1279-1364 + vocabulary.py).
  *
  * Fit is train-split only (the reference's leakage rule, :1304-1308): the
  * caller passes the TRAIN observations. One groupBy per measurement; the
  * resulting vocab table is tiny and broadcast at transform time.
  */
object Categorical {

  final case class VocabFit(
      vocab: DataFrame,
      observationFrequency: Double,
      dropped: Boolean)

  /** Fit a vocabulary over an observation column, with the reference's drop
    * rules:
    *  - column dropped when observed count < minValidColumnObservations
    *    (event_stream_dataset.py:1346-1348);
    *  - rare elements folded into UNK (vocabulary.py:84-112);
    *  - column dropped when vocab collapses to [UNK] (:1355-1364).
    * `totalPossible` is the denominator for observation_frequency
    * (:1341-1343) — e.g. total train events for a dynamic measurement. */
  def fitVocab(
      trainObs: DataFrame, obsCol: String, totalPossible: Long,
      minValidColumnObservations: Option[CountOrProportion] = None,
      minValidVocabElementObservations: Option[CountOrProportion] = None)
      : VocabFit = {
    // ONE distributed aggregation: per-element counts. The observed count
    // is their sum, the vocabulary is assembled driver-side
    // (Vocabulary.fromCountsLocal — broadcast-destined fit state), and the
    // rare-fold + degeneracy checks run on the collected tuples: one
    // cluster action for the whole fit instead of count + fit + fold +
    // degeneracy jobs.
    val spark = trainObs.sparkSession
    val counts = trainObs.filter(col(obsCol).isNotNull)
      .groupBy(col(obsCol).cast("string").as("element"))
      .agg(count(lit(1)).as("n"))
      .collect().toSeq.map(r => r.getString(0) -> r.getLong(1))
    val observed = counts.map(_._2).sum
    val colDrop = minValidColumnObservations.exists(m =>
      observed < m.resolve(totalPossible))
    if (colDrop)
      return VocabFit(spark.emptyDataFrame, 0.0, dropped = true)
    val base = Vocabulary.vocabTuplesFromCounts(counts)
    val tuples = minValidVocabElementObservations match {
      case Some(m) => Vocabulary.foldRareTuples(base, m, observed)
      case None    => base
    }
    val obsFreq =
      if (totalPossible == 0) 0.0 else observed.toDouble / totalPossible
    val degenerate = !tuples.exists(_._1 != Vocabulary.UNK)
    VocabFit(Vocabulary.vocabDfFromTuples(spark, tuples), obsFreq,
      dropped = degenerate)
  }
}
