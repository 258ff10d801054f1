package graft

import graft.ml.GraftPreprocessor
import graft.ops.Similarity
import org.apache.spark.ml.Pipeline
import org.apache.spark.sql.functions._

/** spark.ml integration: the engine's Estimator/Model inside an MLlib
  * Pipeline, and the KMeans-backed IVF ANN path. */
class MlSpec extends SparkSpec {
  import spark.implicits._

  test("GraftPreprocessor works inside an MLlib Pipeline") {
    val train = Seq(("a", 1.0), ("a", 2.0), ("a", 3.0)).toDF("k", "v")
    val heldOut = Seq(("a", 10.0), ("zzz", 4.0)).toDF("k", "v")
    val stage = new GraftPreprocessor()
      .setKeyCol("k").setValueCol("v").setNormalizer("std")
      .setMinValidVocabElementObservations(1L)
      .setMinUniqueNumericalObservations(2L)
      .setMaxNumericalValueFrequency(0.9)
    val model = new Pipeline().setStages(Array(stage)).fit(train)
    val out = model.transform(heldOut)
      .select("k", "value_norm", "key_idx")
      .as[(String, Option[Double], Int)].collect()
      .map(t => t._1 -> (t._2, t._3)).toMap
    assert(out("a")._1.contains(8.0)) // (10-2)/1 with TRAIN params
    assert(out("zzz")._2 == 0) // unknown key → UNK
    // fit state is inspectable DataFrames
    val m = model.stages.head
      .asInstanceOf[graft.ml.GraftPreprocessorModel]
    assert(m.perKeyMetadata.count() == 1)
    assert(m.vocabulary.count() == 2) // UNK + 'a'
  }

  test("KMeans IVF: centroids split clusters, topK finds in-cluster nns") {
    val r = new scala.util.Random(5)
    // two well-separated clusters in 8-d
    def near(base: Double) = Seq.fill(8)((base + r.nextGaussian() * 0.01).toFloat)
    val corpus = ((0L until 20L).map(i => (i, near(1.0))) ++
      (20L until 40L).map(i => (i, near(-1.0)))).toDF("vec_id", "embedding")
    val centroids = Similarity.fitIvfCentroids(corpus, "embedding", k = 2)
    assert(centroids.count() == 2)
    val queries = Seq((100L, near(1.0)), (101L, near(-1.0)))
      .toDF("q_id", "q_vec")
    val top = Similarity.ivfTopK(corpus, queries, "vec_id", "embedding",
      "q_id", "q_vec", centroids, k = 3, nProbe = 1)
      .select("q_id", "vec_id").as[(Long, Long)].collect()
    // query near cluster A only returns cluster-A ids, and vice versa
    top.foreach { case (q, v) =>
      if (q == 100L) assert(v < 20L) else assert(v >= 20L)
    }
  }
}
