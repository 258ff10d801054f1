package graft

import graft.ops.Sketch
import org.apache.spark.sql.functions._

/** Count-Min sketch: one-pass grid, merge-correct, est ≥ exact. */
class SketchSpec extends SparkSpec {
  import spark.implicits._

  private val docs = Seq(
    (0L, "the cat sat on the mat"),
    (1L, "the dog sat"),
    (2L, "cat cat cat"),
    (3L, ""),
    (4L, "the")).toDF("doc_id", "text")

  test("estimates upper-bound exact counts; exact at ample width") {
    val hh = Sketch.heavyHitters(docs, "text", k = 10)
      .as[(String, Long, Long)].collect()
    assert(hh.nonEmpty)
    assert(hh.forall { case (_, exact, est) => est >= exact })
    // width 1<<16 with 8 distinct terms → collision-free, est == exact
    val wide = Sketch.heavyHitters(docs, "text", k = 10, width = 1 << 16)
      .as[(String, Long, Long)].collect().toList
    assert(wide.forall { case (_, exact, est) => est == exact })
    assert(wide.map(r => r._1 -> r._2).toMap ==
      Map("the" -> 4L, "cat" -> 4L, "sat" -> 2L, "on" -> 1L,
        "mat" -> 1L, "dog" -> 1L))
  }

  test("forced collisions still upper-bound (width 2)") {
    val hh = Sketch.heavyHitters(docs, "text", k = 10, width = 2)
      .as[(String, Long, Long)].collect()
    assert(hh.forall { case (_, exact, est) => est >= exact })
    // 6 terms in 2 buckets per row: someone must share a bucket in
    // every one of the 4 rows
    assert(hh.exists { case (_, exact, est) => est > exact })
  }

  test("grid is partition-layout invariant (merge correctness)") {
    val a = Sketch.cmsTable(docs, "text")
      .as[(Long, Long, Long)].collect().toSet
    val b = Sketch.cmsTable(docs.repartition(7), "text")
      .as[(Long, Long, Long)].collect().toSet
    assert(a == b)
    // total mass per hash row = total token instances (6+3+3+0+1)
    val rowMass = Sketch.cmsTable(docs, "text")
      .groupBy("j").agg(sum("cnt").as("m"))
      .select("m").as[Long].collect().toList
    assert(rowMass == List.fill(4)(13L))
  }

  test("bloomDecontaminate finds shared 5-grams, only for real matches") {
    val evalSet = Seq(
      (100L, "the quick brown fox jumps over the lazy dog")).toDF(
      "doc_id", "text")
    val train = Seq(
      (0L, "we saw the quick brown fox jumps too"), // shares one 5-gram
      (1L, "completely unrelated words here nothing shared at all"),
      (2L, "quick brown fox jumps over the lazy dog indeed") // shares 4
    ).toDF("doc_id", "text")
    val r = graft.ops.Sketch.bloomDecontaminate(train, evalSet,
      "doc_id", "text", n = 5)
      .select("id", "n_bloom", "n_matched")
      .as[(Long, Long, Long)].collect()
      .map { case (k, b, m) => k -> (b, m) }.toMap
    assert(r.contains(0L) && r(0L)._2 == 1L)
    assert(r.contains(2L) && r(2L)._2 == 4L)
    assert(!r.keySet.contains(1L) ||
      r(1L)._2 == 0L) // doc 1 may bloom-FP but never exact-matches
    assert(r.values.forall { case (b, m) => b >= m })
  }

  test("production xx family matches the same real grams") {
    val evalSet = Seq(
      (100L, "the quick brown fox jumps over the lazy dog")).toDF(
      "doc_id", "text")
    val train = Seq(
      (0L, "we saw the quick brown fox jumps too"),
      (2L, "quick brown fox jumps over the lazy dog indeed")).toDF(
      "doc_id", "text")
    val xx = graft.ops.Sketch.bloomDecontaminate(train, evalSet,
      "doc_id", "text", n = 5, replayable = false)
      .select("id", "n_matched").as[(Long, Long)].collect().toMap
    assert(xx == Map(0L -> 1L, 2L -> 4L))
  }

  test("linearCountDistinct: near-exact when sparse, null at saturation") {
    val vals = (0 until 50).map(i => ("g1", s"v$i")) ++
      Seq(("g2", "a"), ("g2", "a"), ("g2", "b"))
    val df = vals.toDF("grp", "v")
    val r = Sketch.linearCountDistinct(df, "grp", "v", m = 4096)
      .as[(String, Long, Option[Double])].collect()
      .map(x => x._1 -> ((x._2, x._3))).toMap
    // sparse occupancy: estimate within 2% of the true cardinality
    assert(math.abs(r("g1")._2.get - 50.0) / 50.0 < 0.02)
    assert(math.abs(r("g2")._2.get - 2.0) < 0.1)
    // duplicates don't add occupancy
    assert(r("g2")._1 == 2L)
    // saturation: m=2 with >2 distinct bucket values → null estimate
    val sat = Sketch.linearCountDistinct(
      (0 until 40).map(i => ("g", s"w$i")).toDF("grp", "v"),
      "grp", "v", m = 2)
      .as[(String, Long, Option[Double])].collect().head
    assert(sat._2 == 2L && sat._3.isEmpty)
  }

  test("grid save/load round-trips data and params as data") {
    val dir = java.nio.file.Files.createTempDirectory("grid").toString
    val grid = Sketch.cmsTable(docs, "text", width = 128)
    val params = Sketch.GridParams(Sketch.defaultBases, 128, 8, "poly")
    Sketch.saveGrid(grid, params, dir)
    val (loaded, p2) = Sketch.loadGrid(spark, dir)
    assert(p2 == params)
    assert(loaded.as[(Long, Long, Long)].collect().toSet ==
      grid.as[(Long, Long, Long)].collect().toSet)
  }

  test("incremental curation: a reloaded grid probes identically to " +
    "the in-session one") {
    // "yesterday": build + persist the eval-gram grid
    val evalSet = Seq(
      (100L, "the quick brown fox jumps over the lazy dog")).toDF(
      "doc_id", "text")
    val grams = graft.ops.Sketch.wordNgrams(evalSet, "doc_id", "text", 5)
      .select("gram").distinct()
    val params = Sketch.GridParams(Sketch.defaultBases, 1 << 17, 16,
      "poly")
    val grid = grams
      .agg(graft.expressions.AggregateFunctions.cmsSketch(col("gram"),
        params.bases, params.width, split = false, cap = params.cap)
        .as("sk"))
      .select(posexplode(col("sk")).as(Seq("slot", "cnt")))
      .filter(col("cnt") > 0)
      .select(expr(s"slot DIV ${params.width}").as("j"),
        (col("slot") % params.width).cast("long").as("bucket"),
        col("cnt"))
    val dir = java.nio.file.Files.createTempDirectory("inc").toString
    Sketch.saveGrid(grid, params, dir)
    // "today": load and probe a new batch — identical to in-session
    val (loaded, p) = Sketch.loadGrid(spark, dir)
    assert(p == params)
    val probe = graft.ops.Sketch.wordNgrams(
        Seq((0L, "we saw the quick brown fox jumps too")).toDF(
          "doc_id", "text"), "doc_id", "text", 5)
      .select(col("id"), col("gram"),
        posexplode(array(p.bases.map(b =>
          graft.expressions.TextExpressions.strPolyHash(col("gram"), b,
            p.cap) % p.width): _*)).as(Seq("j", "bucket")))
      .select(col("id"), col("gram"), col("j").cast("long").as("j"),
        col("bucket"))
    val hits = probe.join(loaded.select("j", "bucket"), Seq("j",
        "bucket"))
      .groupBy("id", "gram").count()
      .filter(col("count") === p.bases.length)
      .select("gram").as[String].collect().toSet
    assert(hits.contains("the quick brown fox jumps"))
  }

  test("grouped sketches: one grid per group key, each group exact") {
    val byLang = Seq(
      ("en", "the cat"), ("en", "the dog"), ("fr", "le chat"))
      .toDF("lang", "text")
      .groupBy("lang")
      .agg(graft.expressions.AggregateFunctions
        .cmsSketch(col("text"), Sketch.defaultBases, 64).as("sk"))
      .select(col("lang"), expr(
        "aggregate(sk, CAST(0 AS BIGINT), (a, x) -> a + x)").as("mass"))
      .as[(String, Long)].collect().toMap
    // per-group token mass × 4 hash rows: en = 4 tokens, fr = 2
    assert(byLang == Map("en" -> 16L, "fr" -> 8L))
  }

  test("null and empty text contribute nothing") {
    val withNull = docs.unionByName(
      Seq((5L, null.asInstanceOf[String])).toDF("doc_id", "text"))
    val a = Sketch.cmsTable(docs, "text").as[(Long, Long, Long)]
      .collect().toSet
    val b = Sketch.cmsTable(withNull, "text").as[(Long, Long, Long)]
      .collect().toSet
    assert(a == b)
  }

  test("bottomKQuantiles: driver-side reference, partition-invariant, " +
      "under-full groups use the whole group (= exact)") {
    import graft.ops.Sampling
    import org.apache.spark.sql.functions._
    val rows = (1L to 400L).map(i =>
      (if (i <= 360) "big" else "small", i, (i * 7) % 1000))
      .toDF("g", "id", "v")
    val got = Sketch.bottomKQuantiles(rows, "g", "v", "id", k = 64,
        probs = Seq(0.1, 0.5, 0.9), seed = 3)
      .select("g", "p", "est", "n_sample")
      .as[(String, Double, Long, Long)].collect().toSet
    // driver-side reference: same md5 rank, bottom-64, nearest-rank
    val ranked = rows.select(col("g"), col("v").cast("long"),
        conv(substring(Sampling.md5Rank(col("id"), 3L), 1, 12), 16, 10)
          .cast("double").as("rk"))
      .as[(String, Long, Double)].collect()
    val want = (for {
      g <- Seq("big", "small")
      sample = ranked.filter(_._1 == g)
        .sortBy(r => (r._3, r._2)).take(64).map(_._2).sorted
      p <- Seq(0.1, 0.5, 0.9)
    } yield (g, p, sample(math.floor(p * (sample.length - 1)).toInt),
      sample.length.toLong)).toSet
    assert(got == want)
    // the 40-row group is fully sampled → estimates are EXACT
    // nearest-rank quantiles of the group
    assert(got.filter(_._1 == "small").forall(_._4 == 40L))
    // partition invariance (bottom-k under a total order is
    // merge-order-free)
    val re = Sketch.bottomKQuantiles(rows.repartition(13), "g", "v",
        "id", 64, Seq(0.1, 0.5, 0.9), 3)
      .select("g", "p", "est", "n_sample")
      .as[(String, Double, Long, Long)].collect().toSet
    assert(re == got)
  }

  test("hllRegisters: registers are the elementwise max of any split " +
      "(merge correctness) and partition-layout invariant") {
    val vals = (1L to 3000L).map(i => ("g", s"tok$i"))
      .toDF("grp", "term")
    val whole = Sketch.hllRegisters(vals, "grp", "term")
      .as[(String, Long, Long)].collect().toSet
    // duplicate-insensitive: re-inserting every value changes nothing
    val dup = Sketch.hllRegisters(vals.unionByName(vals), "grp", "term")
      .as[(String, Long, Long)].collect().toSet
    assert(dup == whole)
    // mergeable: max of the two halves' registers == whole registers
    val h1 = Sketch.hllRegisters(vals.limit(1500), "grp", "term")
      .as[(String, Long, Long)].collect()
    val h2 = Sketch.hllRegisters(
        vals.except(vals.limit(1500)), "grp", "term")
      .as[(String, Long, Long)].collect()
    val merged = (h1 ++ h2).groupBy(r => (r._1, r._2))
      .map { case (k, rs) => (k._1, k._2, rs.map(_._3).max) }.toSet
    assert(merged == whole)
    val re = Sketch.hllRegisters(vals.repartition(17), "grp", "term")
      .as[(String, Long, Long)].collect().toSet
    assert(re == whole)
  }

  test("hllEstimate: within the expected error envelope at m=64, " +
      "linear-counting branch engages on small groups") {
    val vals = ((1L to 5000L).map(i => ("big", s"value-$i")) ++
        (1L to 30L).map(i => ("tiny", s"value-$i")))
      .toDF("grp", "term")
    val est = Sketch.hllEstimate(
        Sketch.hllRegisters(vals, "grp", "term"))
      .select("grp", "est_distinct").as[(String, Double)]
      .collect().toMap
    // 1.04/sqrt(64) ≈ 13% std error; allow 3 sigma
    assert(math.abs(est("big") - 5000.0) / 5000.0 < 0.4,
      s"big est ${est("big")}")
    // 30 distinct ≪ 2.5m=160 → linear-counting correction branch;
    // it is near-exact well below saturation
    assert(math.abs(est("tiny") - 30.0) < 10.0,
      s"tiny est ${est("tiny")}")
  }
}
