package graft

import graft.ops.Sampling
import org.apache.spark.sql.functions._

/** Deterministic sampling: partition-layout independence is the point. */
class SamplingSpec extends SparkSpec {
  import spark.implicits._

  test("deterministicSample: stable across partitionings, ~fraction") {
    val ids = (1L to 2000L).toDF("id")
    val a = Sampling.deterministicSample(ids, "id", 0.25, seed = 7)
      .as[Long].collect().toSet
    val b = Sampling.deterministicSample(ids.repartition(13), "id", 0.25,
      seed = 7).as[Long].collect().toSet
    assert(a == b) // rand(seed) would fail this
    assert(math.abs(a.size / 2000.0 - 0.25) < 0.05)
    // disjoint-ish under a different seed
    val c = Sampling.deterministicSample(ids, "id", 0.25, seed = 8)
      .as[Long].collect().toSet
    assert(c != a)
    // fraction bounds honored
    assert(Sampling.deterministicSample(ids, "id", 0.0, 7).count() == 0)
    assert(Sampling.deterministicSample(ids, "id", 1.0, 7).count() >= 1999)
  }

  test("stratifiedSample: exactly n per stratum, layout-independent") {
    val rows = (1L to 300L).map(i => (i, s"s${i % 3}")).toDF("id", "grp")
    val s1 = Sampling.stratifiedSample(rows, "grp", "id", 10, seed = 42)
    assert(s1.groupBy("grp").count().as[(String, Long)].collect()
      .toMap.values.toSet == Set(10L))
    val s2 = Sampling.stratifiedSample(rows.repartition(7), "grp", "id",
      10, seed = 42)
    assert(s1.select("id").as[Long].collect().toSet ==
      s2.select("id").as[Long].collect().toSet)
    // n larger than the stratum → whole stratum, no padding
    val tiny = Seq((1L, "a"), (2L, "a"), (3L, "b")).toDF("id", "grp")
    assert(Sampling.stratifiedSample(tiny, "grp", "id", 5, 1L)
      .count() == 3)
    // md5 rank variant is a pure function of (id, seed) too
    val m1 = Sampling.stratifiedSample(rows, "grp", "id", 10,
      Sampling.md5Rank(col("id"), 7)).select("id").as[Long].collect()
    val m2 = Sampling.stratifiedSample(rows.repartition(5), "grp", "id",
      10, Sampling.md5Rank(col("id"), 7)).select("id").as[Long].collect()
    assert(m1.toSet == m2.toSet)
  }

  test("temperatureRates: alpha<1 up-weights small domains; rates cap " +
      "at 1") {
    val rows = ((1L to 900L).map(i => (i, "big")) ++
      (901L to 1000L).map(i => (i, "small"))).toDF("id", "dom")
    val rates = Sampling.temperatureRates(rows, "dom", alpha = 0.5,
      targetRows = 300)
      .as[(String, Double)].collect().toMap
    // w_big = sqrt(900)=30, w_small = 10 -> rates 300*(30/40)/900 = 0.25
    // vs 300*(10/40)/100 = 0.75 (neither caps)
    assert(math.abs(rates("big") - 300.0 * 30 / 40 / 900) < 1e-12)
    assert(math.abs(rates("small") - 300.0 * 10 / 40 / 100) < 1e-12)
    // small domain kept at a HIGHER rate than its share (flattening)
    assert(rates("small") > rates("big"))
    // huge target -> all rates capped at 1
    val capped = Sampling.temperatureRates(rows, "dom", 0.5, 100000)
      .as[(String, Double)].collect().toMap
    assert(capped.values.forall(_ == 1.0))
  }

  test("temperatureSample: deterministic, layout-independent, " +
      "xxhash and md5 paths both track their rates") {
    val rows = ((1L to 900L).map(i => (i, "big")) ++
      (901L to 1000L).map(i => (i, "small"))).toDF("id", "dom")
    for (replayable <- Seq(false, true)) {
      val a = Sampling.temperatureSample(rows, "dom", "id", 0.5, 500,
        seed = 3, replayable = replayable)
        .select("id").as[Long].collect().toSet
      val b = Sampling.temperatureSample(rows.repartition(11), "dom",
        "id", 0.5, 500, seed = 3, replayable = replayable)
        .select("id").as[Long].collect().toSet
      assert(a == b) // pure function of (id, seed, rates)
      // expected ~417 big + ~125 small kept; loose tolerance
      val kept = rows.filter(col("id").isin(a.toSeq: _*))
        .groupBy("dom").count().as[(String, Long)].collect().toMap
      assert(math.abs(kept("big") - 500.0 * 30 / 40) < 60)
      assert(math.abs(kept("small") - 500.0 * 10 / 40) < 40)
    }
    // rate >= 1 keeps everything (replayable branch edge)
    assert(Sampling.temperatureSample(rows, "dom", "id", 0.5, 100000,
      seed = 3, replayable = true).count() == 1000)
  }

  test("deterministicShuffle: dense 0..n-1 permutation, stable across " +
      "layouts, seed changes the order") {
    val ids = (1L to 500L).toDF("id")
    val a = Sampling.deterministicShuffle(ids, "id", seed = 9)
      .select("id", "shuffle_rank").as[(Long, Long)].collect().toMap
    assert(a.values.toSeq.sorted == (0L until 500L))
    val b = Sampling.deterministicShuffle(ids.repartition(13), "id", 9)
      .select("id", "shuffle_rank").as[(Long, Long)].collect().toMap
    assert(a == b)
    val c = Sampling.deterministicShuffle(ids, "id", seed = 10)
      .select("id", "shuffle_rank").as[(Long, Long)].collect().toMap
    assert(c != a) // different permutation
    assert(c.values.toSeq.sorted == (0L until 500L))
  }

  test("capPerKey: equals the window form, partition-invariant, " +
      "under-full keys kept whole") {
    val rows = (1L to 300L).map { i =>
      (if (i <= 280) "hot" else if (i <= 295) "warm" else "cold", i)
    }.toDF("dom", "id")
    val got = Sampling.capPerKey(rows, "dom", "id", n = 5, seed = 3)
      .select("dom", "id", "rank").as[(String, Long, Int)]
      .collect().toSet
    // window-form reference over the same md5 order
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("dom").orderBy(
        conv(substring(Sampling.md5Rank(col("id"), 3L), 1, 12), 16, 10)
          .cast("double").asc, col("id").asc)
    val want = rows.withColumn("rank", row_number().over(w).cast("int"))
      .filter(col("rank") <= 5)
      .select("dom", "id", "rank").as[(String, Long, Int)]
      .collect().toSet
    assert(got == want)
    // every key capped at 5; the 5-row key survives in full
    val byDom = got.groupBy(_._1).view.mapValues(_.size).toMap
    assert(byDom == Map("hot" -> 5, "warm" -> 5, "cold" -> 5))
    // partition invariance (merge-order cannot change a total-order top-k)
    val re = Sampling.capPerKey(rows.repartition(17), "dom", "id", 5, 3)
      .select("dom", "id", "rank").as[(String, Long, Int)]
      .collect().toSet
    assert(re == got)
  }

  test("materializeMixture: integer base copies + remainder fraction " +
    "via the md5 uniform; zero-copy groups drop; deterministic " +
    "across partitionings") {
    val docs = (1L to 20L).map(i => (i, if (i <= 10) "x" else "y"))
      .toDF("doc_id", "grp")
    // grp x: 2.5 epochs (base 2, half the docs get a 3rd copy);
    // grp y: target 0 → every doc drops
    val plan = Seq(("x", 10L, 25L), ("y", 10L, 0L))
      .toDF("grp", "n_tokens", "target_tokens")
    val got = Sampling.materializeMixture(docs, "doc_id", "grp", plan,
      seed = 5L)
      .select("grp", "doc_id", "n_copies", "copy_idx")
      .as[(String, Long, Long, Long)].collect()
    assert(got.forall(_._1 == "x"))
    val byDoc = got.groupBy(_._2).view
      .mapValues(rs => (rs.head._3, rs.map(_._4).sorted.toSeq)).toMap
    assert(byDoc.keySet == (1L to 10L).toSet)
    byDoc.foreach { case (id, (n, idxs)) =>
      assert(n == 2L || n == 3L, s"doc $id copies $n")
      assert(idxs == (0L until n), s"doc $id idxs $idxs")
    }
    // remainder fraction ≈ 1/2 of docs get the extra copy — exact set
    // is deterministic, so just re-run on a different partitioning
    val re = Sampling.materializeMixture(docs.repartition(13), "doc_id",
        "grp", plan, seed = 5L)
      .select("grp", "doc_id", "n_copies", "copy_idx")
      .as[(String, Long, Long, Long)].collect()
    assert(re.toSet == got.toSet)
  }
}
