package graft

import graft.ops.EventAnalytics
import java.sql.Timestamp

/** Transition / retention / funnel semantics on a hand-built timeline. */
class EventAnalyticsSpec extends SparkSpec {
  import spark.implicits._

  private def ts(day: Int, sec: Int): Timestamp =
    Timestamp.valueOf(f"2024-01-${day}%02d 00:00:$sec%02d")

  // subject 1: A(d1) -> B(d1) -> C(d2); subject 2: B(d1) -> A(d3);
  // subject 3: A only (d1)
  private lazy val events = Seq(
    (1L, ts(1, 1), 10L, "A"), (1L, ts(1, 2), 11L, "B"),
    (1L, ts(2, 1), 12L, "C"),
    (2L, ts(1, 5), 20L, "B"), (2L, ts(3, 1), 21L, "A"),
    (3L, ts(1, 9), 30L, "A")
  ).toDF("subj", "ts", "eid", "etype")

  test("typeTransitions: per-subject consecutive pairs, id tie-break") {
    val got = EventAnalytics.typeTransitions(events, "subj", "ts",
        "eid", "etype")
      .as[(String, String, Long)].collect()
      .map(r => (r._1, r._2) -> r._3).toMap
    assert(got == Map(("A", "B") -> 1L, ("B", "C") -> 1L,
      ("B", "A") -> 1L))
    // same-timestamp events order by id: plant a tie
    val tie = Seq((9L, ts(1, 1), 2L, "X"), (9L, ts(1, 1), 1L, "Y"))
      .toDF("subj", "ts", "eid", "etype")
    val t2 = EventAnalytics.typeTransitions(tie, "subj", "ts", "eid",
        "etype").as[(String, String, Long)].collect()
    assert(t2.toSeq == Seq(("Y", "X", 1L))) // id 1 before id 2
  }

  test("retentionCurve: day-k fractions over all subjects, chatty " +
      "days count once") {
    val got = EventAnalytics.retentionCurve(events, "subj", "ts")
      .as[(Long, Long, Double)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    // day 0: all 3; day 1: subject 1 (C on d2); day 2: subject 2
    assert(got == Map(
      0L -> ((3L, 1.0)),
      1L -> ((1L, math.rint(1.0 / 3 * 1e6) / 1e6)),
      2L -> ((1L, math.rint(1.0 / 3 * 1e6) / 1e6))))
  }

  test("eventMotifs: triples count across subjects; rank ties break " +
      "types-asc; k gates") {
    val ts0 = Timestamp.valueOf("2024-01-01 00:00:00")
    def at(m: Int) = Timestamp.valueOf(f"2024-01-01 00:$m%02d:00")
    val ev = Seq(
      (1L, at(0), 10L, "A"), (1L, at(1), 11L, "B"),
      (1L, at(2), 12L, "C"), (1L, at(3), 13L, "A"),
      (2L, at(0), 20L, "A"), (2L, at(1), 21L, "B"),
      (2L, at(2), 22L, "C"))
      .toDF("subj", "ts", "event_id", "etype")
    val got = EventAnalytics.eventMotifs(ev, "subj", "ts", "event_id",
        "etype", k = 2)
      .as[(Int, String, String, String, Long)].collect().toSeq
      .sortBy(_._1)
    // ABC twice (both subjects); BCA once — ties under it break asc
    assert(got == Seq((1, "A", "B", "C", 2L), (2, "B", "C", "A", 1L)))
    val _ = ts0
  }

  test("nextEventPairs: context windows trail the label by up to " +
      "ctxLen; first event emits nothing; id tie-break orders " +
      "same-timestamp events") {
    val ts0 = Timestamp.valueOf("2024-01-01 00:00:00")
    val ev = Seq(
      (1L, ts0, 10L, "A"), (1L, ts0, 11L, "B"), // same ts → id order
      (1L, Timestamp.valueOf("2024-01-01 01:00:00"), 12L, "C"),
      (1L, Timestamp.valueOf("2024-01-01 02:00:00"), 13L, "D"),
      (2L, ts0, 20L, "X")) // single event → no pairs
      .toDF("subj", "ts", "event_id", "etype")
    val got = EventAnalytics.nextEventPairs(ev, "subj", "ts",
        "event_id", "etype", ctxLen = 2)
      .as[(Long, Long, Seq[String], String)].collect()
      .map(r => (r._1, r._2) -> ((r._3, r._4))).toMap
    assert(got == Map(
      (1L, 2L) -> ((Seq("A"), "B")),
      (1L, 3L) -> ((Seq("A", "B"), "C")),
      (1L, 4L) -> ((Seq("B", "C"), "D")))) // window slides, len = 2
  }

  test("funnel: strict ordering — steps before the anchor don't " +
      "qualify") {
    val got = EventAnalytics.funnel(events, "subj", "ts", "etype",
        Seq("A", "B", "C"))
      .as[(Int, String, Long, Double)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    // A: subjects 1,2,3. A->B: only subject 1 (subject 2's B PRECEDES
    // its A). A->B->C: subject 1.
    assert(got == Map(
      1 -> (("A", 3L, 1.0)),
      2 -> (("B", 1L, math.rint(1.0 / 3 * 1e6) / 1e6)),
      3 -> (("C", 1L, math.rint(1.0 / 3 * 1e6) / 1e6))))
  }
}
