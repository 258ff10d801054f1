package graft

import graft.ingest.Splits
import graft.ml.{GroupedSplitAssigner, NumericPreprocessor, NumericPreprocessorModel}
import graft.preprocess.Preprocessor
import org.apache.spark.ml.Pipeline
import org.apache.spark.sql.functions._

/** spark.ml wrapper layer (SURVEY §7 step 8): the Estimator/Transformer
  * adapters must be semantics-preserving over the direct operator calls
  * and must persist by the params-as-data rule. */
class MlPipelineSpec extends SparkSpec {
  import spark.implicits._

  private def obs = (0 until 200).map { i =>
    (i.toLong, s"k${i % 3}", math.sin(i * 0.37) * 10)
  }.toDF("id", "key", "value")

  test("NumericPreprocessor inside a Pipeline == direct " +
    "Preprocessor.fit/transform, column for column") {
    val train = obs.filter($"id" % 5 < 4)
    val model = new Pipeline().setStages(Array(
      new NumericPreprocessor().setKeyCol("key").setValueCol("value")))
      .fit(train)
    val viaMl = model.transform(obs)
      .select("id", "final_key", "value_norm", "key_idx")
      .collect().map(r => r.getLong(0) -> r.toSeq.tail).toMap
    val fit = Preprocessor.fit(train, "key", "value",
      Preprocessor.Config())
    val direct = Preprocessor.transform(obs, "key", "value", fit)
      .select("id", "final_key", "value_norm", "key_idx")
      .collect().map(r => r.getLong(0) -> r.toSeq.tail).toMap
    assert(viaMl == direct)
  }

  test("NumericPreprocessorModel save/load round-trip: identical " +
    "transform, params restored, fit frames local") {
    val train = obs.filter($"id" % 5 < 4)
    val model = new NumericPreprocessor()
      .setKeyCol("key").setValueCol("value")
      .setNormalizer("quantile").setNQuantiles(11)
      .fit(train)
    val path = java.nio.file.Files
      .createTempDirectory("graft_ml_model").toString + "/m"
    model.write.overwrite().save(path)
    val loaded = NumericPreprocessorModel.load(path)
    assert(loaded.getOrDefault(loaded.normalizer) == "quantile")
    assert(loaded.getOrDefault(loaded.nQuantiles) == 11)
    val before = model.transform(obs)
      .select("id", "final_key", "value_norm", "key_idx")
      .collect().map(_.toSeq).toSet
    val after = loaded.transform(obs)
      .select("id", "final_key", "value_norm", "key_idx")
      .collect().map(_.toSeq).toSet
    assert(before == after)
  }

  test("NumericPreprocessor estimator persistence (DefaultParams) " +
    "round-trips the threshold encoding") {
    val est = new NumericPreprocessor()
      .setKeyCol("key").setValueCol("value")
      .setMinValidVocabObs(0.3) // proportion encoding
      .setOutlierDetector("viod")
    val path = java.nio.file.Files
      .createTempDirectory("graft_ml_est").toString + "/e"
    est.write.overwrite().save(path)
    val back = NumericPreprocessor.load(path)
    assert(back.getOrDefault(back.minValidVocabObs) == 0.3)
    assert(back.getOrDefault(back.outlierDetector) == "viod")
  }

  test("GroupedSplitAssigner == Splits.groupedSplit; missing group " +
    "column fails schema validation") {
    val df = (0 until 100).map(i => (i.toLong, s"d${i % 7}.com"))
      .toDF("id", "domain")
    val viaMl = new GroupedSplitAssigner().setGroupCol("domain")
      .setFractions(Array(0.6, 0.2)).setSplitNames(
        Array("train", "val", "test")).setSeed(11L)
      .transform(df)
      .collect().map(r => r.getLong(0) -> r.getString(2)).toMap
    val direct = Splits.groupedSplit(df, "domain", Seq(0.6, 0.2),
      Seq("train", "val", "test"), 11L)
      .collect().map(r => r.getLong(0) -> r.getString(2)).toMap
    assert(viaMl == direct)
    val e = intercept[IllegalArgumentException] {
      new GroupedSplitAssigner().setGroupCol("nope")
        .transformSchema(df.schema)
    }
    assert(e.getMessage.contains("nope"))
  }

  test("VocabIndexer: UNK-pinned indexing == Vocabulary.fit+lookup; " +
    "unseen folds to 0; rare folding; persistence round-trip") {
    val train = Seq("a", "a", "a", "b", "b", "c").zipWithIndex
      .map { case (k, i) => (i.toLong, k) }.toDF("id", "k")
    val applyTo = Seq("a", "b", "c", "zz").zipWithIndex
      .map { case (k, i) => (i.toLong, k) }.toDF("id", "k")
    val model = new graft.ml.VocabIndexer()
      .setInputCol("k").setOutputCol("kidx").fit(train)
    val got = model.transform(applyTo)
      .collect().map(r => r.getString(1) -> r.getInt(2)).toMap
    // frequency order: a(3)→1, b(2)→2, c(1)→3; unseen zz → UNK 0
    assert(got == Map("a" -> 1, "b" -> 2, "c" -> 3, "zz" -> 0))
    val direct = graft.core.Vocabulary.lookup(applyTo, "k",
        graft.core.Vocabulary.fit(train, "k"), "kidx")
      .collect().map(r => r.getString(1) -> r.getInt(2)).toMap
    assert(got == direct)
    // fold: count threshold 2 folds c into UNK
    val folded = new graft.ml.VocabIndexer()
      .setInputCol("k").setOutputCol("kidx").setMinFold(2.0)
      .fit(train).transform(applyTo)
      .collect().map(r => r.getString(1) -> r.getInt(2)).toMap
    assert(folded == Map("a" -> 1, "b" -> 2, "c" -> 0, "zz" -> 0))
    // persistence
    val path = java.nio.file.Files
      .createTempDirectory("graft_vocab").toString + "/v"
    model.write.overwrite().save(path)
    val loaded = graft.ml.VocabIndexerModel.load(path)
    val after = loaded.transform(applyTo)
      .collect().map(r => r.getString(1) -> r.getInt(2)).toMap
    assert(after == got)
  }

  test("Whitener == Linalg.whitenTopK coordinate for coordinate; " +
    "model save/load round-trips") {
    val rnd = new scala.util.Random(13L)
    val rows = (0 until 200).map { i =>
      (i.toLong, Seq((3.0 * rnd.nextGaussian()).toFloat,
        rnd.nextGaussian().toFloat, (0.3 * rnd.nextGaussian()).toFloat))
    }
    val df = rows.toDF("id", "v")
    val model = new graft.ml.Whitener()
      .setInputCol("v").setK(3).setIters(40).fit(df)
    val viaMl = model.transform(df)
      .select(col("id"), col("whitened"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Double](1)).toMap
    val direct = graft.ops.Linalg.whitenTopK(spark, df, "id", "v",
        k = 3, iters = 40)
      .collect().groupBy(_.getLong(0))
      .map { case (id, rs) =>
        id -> rs.sortBy(_.getLong(1)).map(_.getDouble(2)).toSeq
      }
    assert(viaMl == direct)
    val path = java.nio.file.Files
      .createTempDirectory("graft_whitener").toString + "/w"
    model.write.overwrite().save(path)
    val loaded = graft.ml.WhitenerModel.load(path)
    val after = loaded.transform(df)
      .select(col("id"), col("whitened"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Double](1)).toMap
    assert(after == viaMl)
  }

  test("two-stage Pipeline composes: split stamp then preprocess") {
    val df = obs.withColumn("domain",
      concat(lit("d"), ($"id" % 11).cast("string")))
    val split = new GroupedSplitAssigner().setGroupCol("domain")
      .setFractions(Array(0.8)).setSplitNames(Array("train", "held_out"))
      .setSeed(3L)
    val prep = new NumericPreprocessor()
      .setKeyCol("key").setValueCol("value")
    // canonical leakage discipline: fit the pipeline on the train
    // slice (split precomputed by stage 1's own logic), transform all
    val stamped = split.transform(df)
    val model = new Pipeline().setStages(Array(split, prep))
      .fit(stamped.filter($"split" === "train").drop("split"))
    val out = model.transform(df)
    assert(out.columns.contains("split") &&
      out.columns.contains("value_norm") &&
      out.columns.contains("key_idx"))
    assert(out.count() == df.count())
  }

  test("KMeansClusterer.fit input pinning is plan-gated: a bare " +
    "columnar scan (± project/filter) is NOT checkpointed, a " +
    "wide/generating chain is") {
    import graft.ml.KMeansClusterer
    def cheap(df: org.apache.spark.sql.DataFrame): Boolean =
      KMeansClusterer.cheapRescan(df.queryExecution.analyzed)
    val dir = java.nio.file.Files
      .createTempDirectory("kmeans-pin").toString
    val vecs = (0 until 32)
      .map(i => (i.toLong, Array(i * 0.5, 1.0 - i * 0.25)))
      .toDF("id", "embedding")
    vecs.write.mode("overwrite").parquet(dir)
    val scan = spark.read.parquet(dir)
    // bare scan, projected scan, filtered scan: re-scan is the
    // cheapest pass — fit must NOT materialize corpus-sized vectors
    assert(cheap(scan))
    assert(cheap(scan.select("embedding")))
    assert(cheap(scan.filter($"id" % 2 === 0).select("embedding")))
    // a generating / aggregating chain re-pays real dataflow per
    // re-scan — fit pins it once
    assert(!cheap(scan.groupBy("id")
      .agg(first($"embedding").as("embedding"))))
    assert(!cheap(scan.select(explode(sequence(lit(0), lit(1))),
      $"embedding")))
    assert(!cheap(scan.join(scan.select("id"), "id")))
    // and the pinned fit is semantics-preserving: same centroids from
    // the chain input as from its materialized twin
    val chain = scan.groupBy("id")
      .agg(first($"embedding").as("embedding"))
    val km = new KMeansClusterer().setInputCol("embedding")
      .setOutputCol("cid").setK(2).setIters(2)
    val viaChain = km.fit(chain).transform(vecs)
      .select("id", "cid").collect().map(r => r.getLong(0) -> r.get(1))
    val viaFlat = km.fit(chain.localCheckpoint(true)).transform(vecs)
      .select("id", "cid").collect().map(r => r.getLong(0) -> r.get(1))
    assert(viaChain.toMap == viaFlat.toMap)
  }
}
