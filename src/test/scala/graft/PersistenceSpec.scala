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
}
