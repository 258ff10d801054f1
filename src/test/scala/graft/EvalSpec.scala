package graft

import graft.ops.Eval
import org.apache.spark.sql.functions._

/** Rank-based evaluation metrics (ops/Eval.scala). */
class EvalSpec extends SparkSpec {
  import spark.implicits._

  private def auc(rows: Seq[(Double, Boolean)]): (Long, Long, Option[Double]) =
    Eval.rankAuc(rows.toDF("s", "y"), "s", "y")
      .as[(Long, Long, Option[Double])].collect().head

  test("rankAuc: perfect separation 1.0, inverted 0.0, ties average") {
    assert(auc(Seq((0.9, true), (0.8, true), (0.2, false), (0.1, false)))
      == ((2L, 2L, Some(1.0))))
    assert(auc(Seq((0.1, true), (0.2, true), (0.8, false), (0.9, false)))
      == ((2L, 2L, Some(0.0))))
    // all scores identical → AUC = 0.5 exactly (tie-averaged ranks)
    assert(auc(Seq((0.5, true), (0.5, false), (0.5, true), (0.5, false)))
      == ((2L, 2L, Some(0.5))))
  }

  test("rankAuc: textbook hand computation with a partial tie") {
    // scores: pos {0.8, 0.5}, neg {0.5, 0.2}
    // ranks: 0.2→1, 0.5→avg(2,3)=2.5, 0.8→4
    // R+ = 4 + 2.5 = 6.5 → AUC = (6.5 − 3)/4 = 0.875
    assert(auc(Seq((0.8, true), (0.5, true), (0.5, false), (0.2, false)))
      == ((2L, 2L, Some(0.875))))
  }

  test("rankAuc: degenerate single-class input yields null auc; " +
    "null scores and labels drop") {
    assert(auc(Seq((0.9, true), (0.1, true))) == ((2L, 0L, None)))
    val got = Eval.rankAuc(
      Seq((Some(0.9), Some(true)), (None, Some(false)),
        (Some(0.1), None), (Some(0.2), Some(false)))
        .toDF("s", "y"), "s", "y")
      .as[(Long, Long, Option[Double])].collect().head
    assert(got == ((1L, 1L, Some(1.0))))
  }

  test("rankAucBy: per-group walks are independent; one degenerate " +
    "group nulls without touching the others") {
    val rows = Seq(
      ("a", 0.9, true), ("a", 0.8, true), ("a", 0.2, false),
      ("a", 0.1, false), // perfect within a
      ("b", 0.1, true), ("b", 0.9, false), // inverted within b
      ("c", 0.5, true), ("c", 0.6, true)) // single-class
      .toDF("g", "s", "y")
    val got = Eval.rankAucBy(rows, "g", "s", "y")
      .as[(String, Long, Long, Option[Double])].collect()
      .map(r => r._1 -> r).toMap
    assert(got("a") == (("a", 2L, 2L, Some(1.0))))
    assert(got("b") == (("b", 1L, 1L, Some(0.0))))
    assert(got("c") == (("c", 2L, 0L, None)))
    // grouped result ≡ running rankAuc per slice
    val solo = Eval.rankAuc(rows.filter($"g" === "a"), "s", "y")
      .as[(Long, Long, Option[Double])].collect().head
    assert((got("a")._2, got("a")._3, got("a")._4) == solo)
  }

  test("rankAuc: partition-invariant (dyadic-exact rank sums)") {
    val rows = (1 to 200).map(i =>
      ((i % 13).toDouble / 7.0, i % 3 == 0))
    val a = auc(rows)
    val b = Eval.rankAuc(rows.toDF("s", "y").repartition(17), "s", "y")
      .as[(Long, Long, Option[Double])].collect().head
    assert(a == b)
  }

  /** Brute-force Mann–Whitney oracle: mean over all (pos, neg) pairs of
    * [s⁺ > s⁻] + ½[s⁺ = s⁻] — the definition the rank form must equal. */
  private def bruteAuc(rows: Seq[(Double, Boolean)])
      : (Long, Long, Option[Double]) = {
    val pos = rows.filter(_._2).map(_._1)
    val neg = rows.filterNot(_._2).map(_._1)
    val aucOpt =
      if (pos.isEmpty || neg.isEmpty) None
      else {
        val wins = (for (p <- pos; n <- neg)
          yield if (p > n) 1.0 else if (p == n) 0.5 else 0.0).sum
        Some(math.rint(wins / (pos.size.toDouble * neg.size) * 1e6) / 1e6)
      }
    (pos.size.toLong, neg.size.toLong, aucOpt)
  }

  test("rankAuc: distributed two-pass ranking == brute-force pairwise " +
    "AUC on seeded random corpora (continuous + heavily-tied + skewed " +
    "partitionings)") {
    val rnd = new scala.util.Random(20260814L)
    val cases = Seq(
      // continuous scores: distinct ≈ rows — the shape that motivated
      // the range-ranking (every row its own rank-walk entry)
      (1 to 300).map(_ => (rnd.nextDouble(), rnd.nextBoolean())),
      // heavy ties: 5 distinct scores over 300 rows
      (1 to 300).map(_ => ((rnd.nextInt(5) * 10).toDouble,
        rnd.nextInt(3) == 0)),
      // adversarial: all positives share one score inside the negs' range
      (1 to 100).map(i => if (i % 4 == 0) (0.5, true)
        else (rnd.nextDouble(), false)),
      // tiny input across many partitions (empty range partitions)
      Seq((1.0, true), (0.0, false), (0.5, true)))
    for ((rows, i) <- cases.zipWithIndex;
         nPart <- Seq(1, 7)) {
      val df = rows.toDF("s", "y").repartition(nPart)
      val got = Eval.rankAuc(df, "s", "y")
        .as[(Long, Long, Option[Double])].collect().head
      assert(got == bruteAuc(rows),
        s"case $i nPart=$nPart: got $got want ${bruteAuc(rows)}")
    }
  }

  test("rankAucBy: dominant group with 10^6 distinct scores auto-routes " +
    "to the two-pass range walk; answer identical to the window path " +
    "and to the closed form; no single task gets the full walk") {
    val n = 1000000L
    // big group: strictly increasing scores, alternating labels →
    // closed-form AUC = (n/2 − 1) / (2·(n/2)) · 2 … computed exactly:
    // R⁺ = (n/2)², AUC = ((n/2)² − (n/2)(n/2+1)/2) / (n/2)² = 0.499999
    val big = spark.range(n)
      .select(lit("big").as("g"), col("id").cast("double").as("s"),
        (col("id") % 2 === 0).as("y"))
    val small = Seq(
      ("a", 0.9, true), ("a", 0.8, true), ("a", 0.2, false),
      ("a", 0.1, false),
      ("b", 0.1, true), ("b", 0.9, false)).toDF("g", "s", "y")
    val rows = big.unionByName(small)
    val routed = Eval.rankAucBy(rows, "g", "s", "y",
        bigGroupThreshold = 100000L)
      .as[(String, Long, Long, Option[Double])].collect()
      .map(r => r._1 -> r).toMap
    assert(routed("big") == (("big", 500000L, 500000L, Some(0.499999))))
    assert(routed("a")._4.contains(1.0))
    assert(routed("b")._4.contains(0.0))
    // routing never changes the answer: forced window path agrees
    val windowed = Eval.rankAucBy(rows, "g", "s", "y",
        bigGroupThreshold = Long.MaxValue)
      .as[(String, Long, Long, Option[Double])].collect()
      .map(r => r._1 -> r).toMap
    assert(routed == windowed)
    // structural guarantee: the big-group rank window is partitioned by
    // (pid, grp) — each task ranks only its own contiguous range slice,
    // never the group's full walk
    val g = rows.filter($"g" === "big")
      .groupBy(col("g").as("grp"), col("s"))
      .agg(count(lit(1)).as("n"),
        sum(when(col("y"), 1L).otherwise(0L)).as("np"))
    // AQE off so the executed-plan walk can't vacuously pass (the
    // WindowCapacitySpec rule)
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    val windows =
      try Eval.rankedByGroupRange(g).queryExecution.executedPlan.collect {
        case w: org.apache.spark.sql.execution.window.WindowExec => w
      }
      finally spark.conf.set("spark.sql.adaptive.enabled", "true")
    assert(windows.nonEmpty)
    windows.foreach(w => assert(w.partitionSpec.size == 2,
      s"big-group rank window must partition by (pid, grp), got " +
        s"${w.partitionSpec}"))
  }
}
