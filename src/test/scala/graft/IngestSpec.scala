package graft

import graft.ingest.{EventDataset, Splits}
import org.apache.spark.sql.functions._
import java.sql.Timestamp

/** Ingest / dataset-construction semantics
  * (reference event_stream_dataset.py:370-870). */
class IngestSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  private def rawEvents = Seq(
    (0L, ts("2024-01-01 10:00:00"), 1L, "A", 1.0, ""),
    (1L, ts("2024-01-01 09:00:00"), 1L, "B", 2.0, ""),
    (2L, ts("2024-01-01 10:00:00"), 2L, "A", 3.0, ""),
    (3L, ts("2024-01-01 10:00:00"), 1L, "A", 4.0, "") // dup (subj,ts,type)
  ).toDF("event_id", "ts", "user_id", "event_type", "value", "props")

  test("fromRawEvents builds the 3-table model") {
    val ds = EventDataset.fromRawEvents(rawEvents)
    assert(ds.events.columns.toSeq ==
      Seq("event_id", "subject_id", "timestamp", "event_type"))
    assert(ds.measurements.count() == 4)
    assert(ds.subjects.count() == 2)
  }

  test("propsToMeasurements: JSON map → long-layout rows, malformed " +
    "yields none") {
    val raw = Seq(
      (1L, 10L, "A", """{"hr": 72.5, "bp": 120}"""),
      (2L, 10L, "B", """{"hr": 80}"""),
      (3L, 11L, "A", "not json"),
      (4L, 11L, "A", "")).toDF("event_id", "user_id", "event_type", "props")
    val m = EventDataset.propsToMeasurements(raw)
      .select("event_id", "key", "value")
      .as[(Long, String, Double)].collect().toSet
    assert(m == Set((1L, "hr", 72.5), (1L, "bp", 120.0), (2L, "hr", 80.0)))
  }

  test("eventsOrdered ranks within subject by (timestamp, event_id)") {
    val ds = EventDataset.fromRawEvents(rawEvents)
    val idx = ds.eventsOrdered
      .select("event_id", "event_idx").as[(Long, Int)].collect().toMap
    assert(idx(1L) == 1) // 09:00 first for subject 1
    assert(idx(0L) == 2) // same ts as 3 → event_id tiebreak
    assert(idx(3L) == 3)
    assert(idx(2L) == 1) // subject 2's only event
  }

  test("aggByTimeType merges duplicate (subject,ts,type) and remaps FKs") {
    // reference event_stream_dataset.py:673-700: no numeric aggregation —
    // all measurements retained on the merged event
    val ds = EventDataset.fromRawEvents(rawEvents).aggByTimeType
    assert(ds.events.count() == 3) // events 0 and 3 merged
    // dense 0-based ids ordered by (subject, ts, type)
    assertSameRows(ds.events.select("event_id", "subject_id", "event_type"),
      Seq(Seq(0L, 1L, "B"), Seq(1L, 1L, "A"), Seq(2L, 2L, "A")))
    // both measurements of the merged event point at new id 1
    val meas = ds.measurements.groupBy("event_id").count()
    assertSameRows(meas, Seq(Seq(0L, 1L), Seq(1L, 2L), Seq(2L, 1L)))
    assert(ds.measurements.count() == 4) // nothing lost
  }

  test("eventsPerSubject zero-fills event-less subjects") {
    val ds = EventDataset.fromRawEvents(rawEvents)
    val withExtra = ds.copy(subjects =
      ds.subjects.union(Seq(99L).toDF("subject_id")))
    assertSameRows(withExtra.eventsPerSubject,
      Seq(Seq(1L, 3L), Seq(2L, 1L), Seq(99L, 0L)))
  }

  test("interEventMinutes = per-subject lag delta") {
    val ds = EventDataset.fromRawEvents(rawEvents)
    val d = ds.interEventMinutes
      .select("event_id", "delta_min").as[(Long, Option[Double])]
      .collect().toMap
    assert(d(1L).isEmpty) // first event for subject 1
    assert(d(0L).contains(60.0))
    assert(d(3L).contains(0.0))
    assert(d(2L).isEmpty)
  }

  test("nested view round-trips through explode") {
    val ds = EventDataset.fromRawEvents(rawEvents)
    val nested = ds.eventsWithMetadata
    assert(nested.count() == 4)
    val flat = EventDataset.explodeNested(nested)
    assert(flat.count() == 4)
    assert(flat.columns.contains("metadata_id"))
  }

  test("event type frequency ordering") {
    val ds = EventDataset.fromRawEvents(rawEvents)
    assertSameRows(ds.eventTypes, Seq(Seq("A", 3L), Seq("B", 1L)))
  }

  test("splits partition subjects deterministically by fraction") {
    val subjects = (1L to 1000L).toDF("subject_id")
    val s1 = Splits.subjectSplits(subjects, Seq(0.8),
      Seq("train", "held_out"), seed = 42)
    val s2 = Splits.subjectSplits(subjects, Seq(0.8),
      Seq("train", "held_out"), seed = 42)
    // deterministic
    assert(s1.collect().toSet == s2.collect().toSet)
    val counts = s1.groupBy("split").count().as[(String, Long)]
      .collect().toMap
    assert(counts("train") == 800 && counts("held_out") == 200)
    // different seed → different assignment
    val s3 = Splits.subjectSplits(subjects, Seq(0.8),
      Seq("train", "held_out"), seed = 7)
    assert(s1.collect().toSet != s3.collect().toSet)
    // forSplit semi-join restricts
    val ev = Seq((1L, "x"), (999L, "y")).toDF("subject_id", "payload")
    val trainEv = Splits.forSplit(ev, s1, "train")
    assert(trainEv.count() ==
      ev.join(s1.filter($"split" === "train"), "subject_id").count())
  }

  test("groupedSplit: every row of a group lands in the SAME split " +
    "(leakage-safe); expected fractions roughly hold; deterministic") {
    val rows = (1L to 2000L).map(i => (i, s"dom${i % 100}"))
      .toDF("id", "dom")
    val s1 = Splits.groupedSplit(rows, "dom", Seq(0.8, 0.1),
      Seq("train", "val", "test"), seed = 3)
    // leakage guard: one split per group, always
    val perGroup = s1.groupBy("dom")
      .agg(countDistinct("split").as("k"))
      .agg(max("k")).as[Long].head()
    assert(perGroup == 1L)
    // fractions are expected, not exact — 100 groups at 80/10/10
    val byGroup = s1.select("dom", "split").distinct()
      .groupBy("split").count().as[(String, Long)].collect().toMap
    assert(byGroup("train") > 60 && byGroup("train") < 95)
    assert(byGroup.values.sum == 100L)
    // pure function of (group, seed): stable across partitionings
    val s2 = Splits.groupedSplit(rows.repartition(13), "dom",
      Seq(0.8, 0.1), Seq("train", "val", "test"), seed = 3)
    assert(s2.collect().toSet == s1.collect().toSet)
  }
}
