package graft

import graft.ops.AsofJoin
import java.sql.Timestamp

/** As-of join semantics: inclusive ties, carry-forward, per-key
  * isolation, null before the first right row. */
class AsofJoinSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("asofJoin: latest right row with ts <= left ts, per key") {
    val left = Seq(
      (1L, 10L, ts("2024-01-01 00:00:00")), // before any right → null
      (2L, 10L, ts("2024-01-01 00:05:00")), // exactly at right ts → inclusive
      (3L, 10L, ts("2024-01-01 00:07:00")), // between rights → carry 1.0
      (4L, 10L, ts("2024-01-01 00:20:00")), // after second right → 2.0
      (5L, 99L, ts("2024-01-01 00:30:00"))  // other key, no rights → null
    ).toDF("event_id", "subject_id", "ts2")
    val right = Seq(
      (10L, ts("2024-01-01 00:05:00"), 1.0),
      (10L, ts("2024-01-01 00:10:00"), 2.0)
    ).toDF("subject_id", "ts2", "p_val")
    val out = AsofJoin.asofJoin(left, right, "subject_id", "ts2",
        Seq("p_val"))
      .select("event_id", "p_val")
      .as[(Long, Option[Double])].collect().toMap
    assert(out == Map(
      1L -> None, 2L -> Some(1.0), 3L -> Some(1.0), 4L -> Some(2.0),
      5L -> None))
  }

  test("asofJoin: matched right row's NULL value is returned (not an " +
    "older non-null), and null-ts right rows match nothing") {
    val left = Seq(
      (1L, 10L, ts("2024-01-01 00:15:00")), // latest right has NULL value
      (2L, 20L, ts("2024-01-01 00:15:00"))  // only right has null ts
    ).toDF("event_id", "subject_id", "ts2")
    val right = Seq(
      (10L, Some(ts("2024-01-01 00:05:00")), Some(1.0)),
      (10L, Some(ts("2024-01-01 00:10:00")), None), // matched, value NULL
      (20L, None, Some(5.0)) // ts NULL: never visible
    ).toDF("subject_id", "ts2", "p_val")
    val out = AsofJoin.asofJoin(left, right, "subject_id", "ts2",
        Seq("p_val"))
      .select("event_id", "p_val")
      .as[(Long, Option[Double])].collect().toMap
    assert(out == Map(1L -> None, 2L -> None))
  }

  test("asofJoin: multiple value columns come from the SAME matched row") {
    val left = Seq((1L, 10L, ts("2024-01-01 00:15:00")))
      .toDF("event_id", "subject_id", "ts2")
    val right = Seq(
      (10L, ts("2024-01-01 00:05:00"), Some(1.0), Some("a")),
      (10L, ts("2024-01-01 00:10:00"), None, Some("b"))
    ).toDF("subject_id", "ts2", "v1", "v2")
    val out = AsofJoin.asofJoin(left, right, "subject_id", "ts2",
        Seq("v1", "v2"))
      .select("v1", "v2").as[(Option[Double], Option[String])].head()
    // NOT the blended (1.0, "b") the per-column carry would produce
    assert(out == (None, Some("b")))
  }

  test("asofJoin: randomized equivalence with the brute-force reference") {
    val r = new scala.util.Random(48)
    // duplicate left timestamps, ties with right timestamps, sparse keys
    val left = (0 until 400).map { i =>
      (i.toLong, r.nextInt(8).toLong,
        new Timestamp(1700000000000L + r.nextInt(500) * 1000L))
    }
    val right = scala.util.Random.shuffle(
      (0 until 200).map { _ =>
        (r.nextInt(10).toLong,
          new Timestamp(1700000000000L + r.nextInt(500) * 1000L))
      }.distinct).map { case (k, t) => (k, t, r.nextDouble()) }
    val expected: Map[Long, Option[Double]] = left.map { case (id, k, t) =>
      val m = right.filter(x => x._1 == k && !x._2.after(t))
      id -> (if (m.isEmpty) None
             else Some(m.maxBy(_._2.getTime)._3))
    }.toMap
    val out = AsofJoin.asofJoin(
      left.toDF("event_id", "subject_id", "ts2"),
      right.toDF("subject_id", "ts2", "p_val"),
      "subject_id", "ts2", Seq("p_val"))
      .select("event_id", "p_val")
      .as[(Long, Option[Double])].collect().toMap
    assert(out.size == 400)
    assert(out == expected)
  }

  test("asofJoin tolerance: stale matches null out, rows survive " +
    "(randomized vs brute force)") {
    val r = new scala.util.Random(77)
    val left = (0 until 300).map { i =>
      (i.toLong, r.nextInt(6).toLong,
        new Timestamp(1700000000000L + r.nextInt(400) * 1000L))
    }
    val right = scala.util.Random.shuffle(
      (0 until 150).map { _ =>
        (r.nextInt(8).toLong,
          new Timestamp(1700000000000L + r.nextInt(400) * 1000L))
      }.distinct).map { case (k, t) => (k, t, r.nextDouble()) }
    val tol = 60.0 // seconds
    val expected: Map[Long, Option[Double]] = left.map { case (id, k, t) =>
      val m = right.filter(x => x._1 == k && !x._2.after(t))
      id -> (if (m.isEmpty) None
             else {
               val best = m.maxBy(_._2.getTime)
               if ((t.getTime - best._2.getTime) / 1000.0 <= tol)
                 Some(best._3)
               else None
             })
    }.toMap
    val out = AsofJoin.asofJoin(
      left.toDF("event_id", "subject_id", "ts2"),
      right.toDF("subject_id", "ts2", "p_val"),
      "subject_id", "ts2", Seq("p_val"), toleranceSeconds = Some(tol))
      .select("event_id", "p_val")
      .as[(Long, Option[Double])].collect().toMap
    assert(out.size == 300) // every left row survives
    assert(out == expected)
  }

  test("asofJoin keeps every left row and all left columns") {
    val left = Seq((1L, 5L, ts("2024-01-01 00:00:00"), "extra"))
      .toDF("event_id", "subject_id", "ts2", "note")
    val right = Seq((5L, ts("2023-12-31 00:00:00"), 7.0))
      .toDF("subject_id", "ts2", "p_val")
    val out = AsofJoin.asofJoin(left, right, "subject_id", "ts2",
      Seq("p_val"))
    assert(out.columns.toSeq ==
      Seq("event_id", "subject_id", "ts2", "note", "p_val"))
    assert(out.count() == 1)
    assert(out.select("note").as[String].head() == "extra")
  }
}
