package graft

import graft.preprocess.Preprocessor
import org.apache.spark.sql.functions._

/** End-to-end fit/transform lifecycle (reference
  * event_stream_dataset.py:930-1595): train-only statistics, re-encode,
  * outlier nulling, normalization, vocab indexing. */
class PreprocessorSpec extends SparkSpec {
  import spark.implicits._

  test("std pipeline: train-only stats applied to all rows") {
    // train mean/std of key 'a' = 2.0 / 1.0; the held-out value 10.0 must
    // be normalized with TRAIN params (leakage rule), not its own.
    val train = Seq(("a", 1.0), ("a", 2.0), ("a", 3.0)).toDF("k", "v")
    val all = train.union(Seq(("a", 10.0)).toDF("k", "v"))
    val fit = Preprocessor.fit(train, "k", "v",
      Preprocessor.Config.counts(
        minValidVocabElementObservations = 1,
        minUniqueNumericalObservations = 2,
        maxNumericalValueFrequency = 0.9,
        normalizer = Some("std")))
    val out = Preprocessor.transform(all, "k", "v", fit)
      .select("v", "value_norm").as[(Double, Double)].collect().toMap
    assert(out(2.0) == 0.0)
    assert(out(10.0) == 8.0) // (10-2)/1 with train params
  }

  test("viod pipeline: planted outlier nulled before normalization") {
    val r = new scala.util.Random(9)
    val clean = Seq.fill(500)(("a", r.nextGaussian()))
    val train = (clean :+ (("a", 1000.0))).toDF("k", "v")
    val fit = Preprocessor.fit(train, "k", "v",
      Preprocessor.Config.counts(
        minValidVocabElementObservations = 1,
        outlierDetector = Some("viod"),
        normalizer = Some("std")))
    val out = Preprocessor.transform(train, "k", "v", fit)
    val outlierRow = out.filter(col("v") === 1000.0)
      .select("is_inlier", "value_norm")
      .as[(Boolean, Option[Double])].collect().head
    assert(!outlierRow._1 && outlierRow._2.isEmpty)
    // normalizer fit excluded the outlier: clean rows stay ~standard
    val maxAbs = out.filter(col("v") =!= 1000.0)
      .agg(max(abs(col("value_norm")))).as[Double].collect().head
    assert(maxAbs < 10.0)
  }

  test("categorical re-encode pipeline: key__EQ_v + vocab over final keys") {
    val train = (1 to 30).map(i => ("qty", (i % 3 + 1).toDouble))
      .toDF("k", "v")
    val fit = Preprocessor.fit(train, "k", "v",
      Preprocessor.Config.counts(
        minValidVocabElementObservations = 1,
        minUniqueNumericalObservations = 10, // 3 distinct < 10 → categorical
        normalizer = None))
    val out = Preprocessor.transform(train, "k", "v", fit)
      .select("final_key", "value_clean", "key_idx")
      .as[(String, Option[Double], Int)].collect()
    assert(out.forall(_._1.startsWith("qty__EQ_")))
    assert(out.forall(_._2.isEmpty)) // values nulled for categorical
    assert(out.forall(_._3 > 0)) // every re-encoded key in vocab
    // unknown key at transform time → UNK index 0
    val unk = Preprocessor.transform(
      Seq(("newkey", 1.0)).toDF("k", "v"), "k", "v", fit)
      .select("key_idx").as[Int].collect().head
    assert(unk == 0)
  }

  test("quantile pipeline: normalized output spans [0,1]") {
    val train = (1 to 101).map(i => ("a", i.toDouble)).toDF("k", "v")
    val fit = Preprocessor.fit(train, "k", "v",
      Preprocessor.Config.counts(
        minValidVocabElementObservations = 1,
        normalizer = Some("quantile"), nQuantiles = 11))
    val out = Preprocessor.transform(train, "k", "v", fit)
      .agg(min("value_norm"), max("value_norm"))
      .as[(Double, Double)].collect().head
    assert(out._1 == 0.0 && out._2 == 1.0)
  }
}
