package graft

import graft.ingest.EventDataset
import graft.preprocess.Preprocessor
import java.nio.file.Files
import java.sql.Timestamp

/** Save/load: the reference dill-pickles its dataset object
  * (event_stream_dataset.py:42-44); our engine persists plain parquet per
  * table + fit params as DataFrames — no binary pickles (SURVEY §2.1). */
class PersistenceSpec extends SparkSpec {
  import spark.implicits._

  test("EventDataset round-trips through parquet") {
    val dir = Files.createTempDirectory("graft-persist").toString
    val raw = Seq(
      (0L, Timestamp.valueOf("2024-01-01 10:00:00"), 1L, "A", 1.5, ""),
      (1L, Timestamp.valueOf("2024-01-02 10:00:00"), 2L, "B", 2.5, ""))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val ds = EventDataset.fromRawEvents(raw)
    EventDataset.save(ds, dir)
    val back = EventDataset.load(spark, dir)
    assert(back.events.collect().toSet == ds.events.collect().toSet)
    assert(back.measurements.collect().toSet ==
      ds.measurements.collect().toSet)
    // parquet relaxes nullability — compare names + types, not flags
    assert(back.events.schema.fields.map(f => (f.name, f.dataType)).toSeq
      == ds.events.schema.fields.map(f => (f.name, f.dataType)).toSeq)
  }

  test("Preprocessor fit round-trips through parquet (no pickles)") {
    val dir = Files.createTempDirectory("graft-fit").toString
    val train = Seq(("a", 1.0), ("a", 2.0), ("a", 3.0), ("b", 5.0),
      ("b", 7.0)).toDF("k", "v")
    val fit = Preprocessor.fit(train, "k", "v",
      Preprocessor.Config.counts(minValidVocabElementObservations = 1,
        minUniqueNumericalObservations = 2,
        maxNumericalValueFrequency = 0.9))
    fit.perKey.write.parquet(s"$dir/perKey")
    fit.vocab.write.parquet(s"$dir/vocab")
    val back = Preprocessor.Fit(
      spark.read.parquet(s"$dir/perKey"),
      spark.read.parquet(s"$dir/vocab"))
    val a = Preprocessor.transform(train, "k", "v", fit)
      .select("k", "v", "value_norm", "key_idx").collect().toSet
    val b = Preprocessor.transform(train, "k", "v", back)
      .select("k", "v", "value_norm", "key_idx").collect().toSet
    assert(a == b)
  }

  test("AnnIndex save/load round-trips the layered ANN index; the " +
    "recall audit against the RELOADED adjacency matches the " +
    "in-memory one; a torn save (no manifest) refuses to load") {
    import graft.ops.{Hnsw, Similarity}
    import org.apache.spark.sql.functions.col
    val corpus = (0 until 240).map { i =>
      val c = i % 8
      (i.toLong, Array.tabulate(8)(j =>
        (if (j == c) 1.0f else 0.0f) +
          (math.sin(i * 7.31 + j) * 0.05).toFloat).toSeq)
    }.toDF("id", "v")
    val bf = Hnsw.defaultBucketFn(nPlanes = 3, dim = 8, seed = 9)
    val knn = Hnsw.buildKnn(corpus, "id", "v", 9, 2, 6, 2, bf)
    val adj = Hnsw.adjacencyFromKnn(knn, corpus, "id", "v")
    val dir = Files.createTempDirectory("graft-ann-index").toString +
      "/idx"
    graft.ops.AnnIndex.save(dir,
      Map("knn" -> knn, "adjacency" -> adj),
      Map("seed" -> "9", "max_level" -> "2", "m" -> "6",
        "bands" -> "2", "n_planes" -> "3", "kind" -> "hnsw"))
    val (parts, params) = graft.ops.AnnIndex.load(spark, dir)
    assert(parts.keySet == Set("knn", "adjacency"))
    assert(params("m") == "6" && params("kind") == "hnsw")
    assert(parts("knn").collect().map(_.toSeq).toSet ==
      knn.collect().map(_.toSeq).toSet)
    // q231-shape audit against the PERSISTED index: search the
    // reloaded adjacency and compare recall to the in-memory run
    val queries = (0 until 8).map { i =>
      (1000L + i, Array.tabulate(8)(j =>
        (if (j == i % 8) 1.0f else 0.0f)).toSeq)
    }.toDF("qid", "qv")
    def recall(a: org.apache.spark.sql.DataFrame): Set[Seq[Any]] = {
      val exact = Similarity.bruteForceTopK(corpus, queries, "id", "v",
        "qid", "qv", k = 3)
      val approx = Hnsw.searchTopK(a, corpus, "id", "v", queries,
        "qid", "qv", 9, 2, 2, 6, 3)
      Similarity.recallAtK(approx, exact, "qid", "id", k = 3)
        .collect().map(_.toSeq).toSet
    }
    val fromDisk = recall(parts("adjacency"))
    assert(fromDisk == recall(adj))
    assert(fromDisk.nonEmpty &&
      fromDisk.forall(_(1).asInstanceOf[Double] > 0.0))
    // torn-save protection: a directory without a manifest refuses
    intercept[Exception] {
      graft.ops.AnnIndex.load(spark, dir + "_nope")
    }
  }
}
