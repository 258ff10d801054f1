package graft

import graft.core.CountOrProportion
import graft.preprocess.Categorical

/** Categorical fit rules (reference event_stream_dataset.py:1279-1364). */
class CategoricalSpec extends SparkSpec {
  import spark.implicits._

  test("fitVocab: observation frequency + column-drop rule") {
    val obs = Seq("a", "a", "b", null).toDF("el")
    val fit = Categorical.fitVocab(obs, "el", totalPossible = 10)
    assert(!fit.dropped)
    assert(fit.observationFrequency == 0.3) // 3 non-null of 10 possible
    assert(fit.vocab.count() == 3) // UNK + a + b

    // below min column observations → dropped without fitting
    val dropped = Categorical.fitVocab(obs, "el", totalPossible = 10,
      minValidColumnObservations = Some(CountOrProportion.count(5)))
    assert(dropped.dropped)
  }

  test("fitVocab: degenerate vocab after rare-folding → dropped") {
    val obs = Seq("a", "b", "c").toDF("el")
    val fit = Categorical.fitVocab(obs, "el", totalPossible = 3,
      minValidVocabElementObservations = Some(CountOrProportion.count(2)))
    assert(fit.dropped) // every element rare → [UNK] only
  }
}
