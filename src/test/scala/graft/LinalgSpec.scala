package graft

import graft.expressions.AggregateFunctions
import graft.ops.{Linalg, Similarity}
import org.apache.spark.sql.functions._

/** One-pass Gramian moments + the driver-side solvers built on them
  * (covariance EAV, power-iteration PCA, ridge probe) and the exact
  * embedding decontamination audit. */
class LinalgSpec extends SparkSpec {
  import spark.implicits._

  test("gram_moments: exact buffer on a known 2-vector corpus") {
    // rows (1,2) and (3,4): n=2, Σx=(4,6), Σxx upper = (1+9, 2+12, 4+16)
    val df = Seq(Seq(1.0f, 2.0f), Seq(3.0f, 4.0f)).toDF("v")
    val m = df.agg(AggregateFunctions.gramMoments(col("v")))
      .head().getSeq[Double](0)
    assert(m == Seq(2.0, 4.0, 6.0, 10.0, 14.0, 20.0))
  }

  test("gram_moments: null rows skipped; all-null group → null; " +
    "partition merge exact") {
    val df = Seq(
      ("a", Some(Seq(1.0, 0.0))), ("a", None), ("a", Some(Seq(0.0, 1.0))),
      ("b", None)).toDF("g", "v").repartition(4)
    val rows = df.groupBy("g")
      .agg(AggregateFunctions.gramMoments(col("v")).as("m"))
      .collect().map(r => r.getString(0) ->
        Option(r.getSeq[Double](1)).map(_.toSeq)).toMap
    assert(rows("a").contains(Seq(2.0, 1.0, 1.0, 1.0, 0.0, 1.0)))
    assert(rows("b").isEmpty)
  }

  test("gram_moments: in-group dimension mismatch throws") {
    val df = Seq(Seq(1.0f), Seq(1.0f, 2.0f)).toDF("v").coalesce(1)
    val e = intercept[org.apache.spark.SparkException] {
      df.agg(AggregateFunctions.gramMoments(col("v"))).collect()
    }
    assert(e.getMessage != null)
  }

  test("covarianceEav matches the definitional sample covariance") {
    val data = Seq(
      Seq(1.0f, 10.0f, -1.0f), Seq(2.0f, 8.0f, 0.0f),
      Seq(3.0f, 9.0f, 1.0f), Seq(4.0f, 7.0f, 2.5f))
    val got = Linalg.covarianceEav(spark, data.toDF("v"), "v")
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2))
      .toMap
    val n = data.length
    val cols = data.head.length
    for (i <- 0 until cols; j <- i until cols) {
      val xi = data.map(_(i).toDouble); val xj = data.map(_(j).toDouble)
      val mi = xi.sum / n; val mj = xj.sum / n
      val want = xi.zip(xj).map { case (a, b) => (a - mi) * (b - mj) }
        .sum / (n - 1)
      assert(math.abs(got((i, j)) - want) < 1e-6,
        s"cov($i,$j): got ${got((i, j))}, want $want")
    }
  }

  test("powerIterate finds the dominant eigenvector of [[2,1],[1,2]]") {
    val v = Linalg.powerIterate(
      Array(Array(2.0, 1.0), Array(1.0, 2.0)), iters = 30)
    val s = 1.0 / math.sqrt(2.0)
    assert(math.abs(v(0) - s) < 1e-9 && math.abs(v(1) - s) < 1e-9)
  }

  test("pcaProjectTop1 recovers projection onto the stretched axis") {
    // anisotropic cloud: x-axis variance 25x the y-axis → PC1 ≈ ±e_x
    val rows = (0 until 40).map { i =>
      val t = (i - 19.5) / 19.5
      (i.toLong, Seq((5.0 * t).toFloat, (t * math.pow(-1, i)).toFloat))
    }
    val out = Linalg.pcaProjectTop1(spark, rows.toDF("id", "v"),
      "id", "v", iters = 25)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    rows.foreach { case (id, v) =>
      assert(math.abs(math.abs(out(id)) - math.abs(v(0))) < 0.02,
        s"id $id: |pc1|=${out(id)} vs |x|=${v(0)}")
    }
    // sign canonicalization: Σv ≥ 0 ⇒ pc1 has the sign of x
    val pos = rows.filter(_._2(0) > 1.0f)
    assert(pos.forall { case (id, v) => out(id) * v(0) > 0 })
  }

  test("ridgeFit recovers a noiseless linear model (λ=0)") {
    // y = 2·x0 − 1·x1, unit-bounded features, λ=0, enough steps
    val rows = (0 until 50).map { i =>
      val a = math.sin(i * 0.7); val b = math.cos(i * 1.3)
      (Seq(a.toFloat, b.toFloat), 2.0 * a - 1.0 * b)
    }
    val (n, beta) = Linalg.ridgeFit(rows.toDF("v", "y"), "v", "y",
      lambda = 0.0, eta = 0.5, iters = 400)
    assert(n == 50)
    assert(math.abs(beta(0) - 2.0) < 1e-3 &&
      math.abs(beta(1) + 1.0) < 1e-3, beta.toSeq.toString)
  }

  test("ridgeScore: score is the fitted dot product; keep respects " +
    "the threshold") {
    val rows = (0 until 30).map { i =>
      val a = math.sin(i * 0.9); val b = math.cos(i * 0.4)
      (i.toLong, Seq(a.toFloat, b.toFloat), a - b)
    }
    val out = Linalg.ridgeScore(rows.toDF("id", "v", "y"), "id", "v", "y",
      lambda = 0.01, eta = 0.5, iters = 200, threshold = 0.0)
      .collect().map(r => r.getLong(0) -> (r.getDouble(1), r.getBoolean(2)))
      .toMap
    rows.foreach { case (id, _, y) =>
      val (s, keep) = out(id)
      // regularized fit tracks the noiseless target closely
      assert(math.abs(s - y) < 0.1, s"id $id: score $s vs y $y")
      assert(keep == (s >= 0.0))
    }
  }

  test("pcaTopK: recovers the spectrum of a diagonal covariance and " +
    "component 0 equals powerIterate") {
    val cov = Array(
      Array(4.0, 0.0, 0.0, 0.0), Array(0.0, 3.0, 0.0, 0.0),
      Array(0.0, 0.0, 2.0, 0.0), Array(0.0, 0.0, 0.0, 1.0))
    val (comps, lams) = Linalg.pcaTopK(cov, k = 4, iters = 60)
    for (c <- 0 until 4) {
      assert(math.abs(lams(c) - (4.0 - c)) < 1e-6,
        s"eigval $c: ${lams(c)}")
      for (j <- 0 until 4)
        assert(math.abs(math.abs(comps(c)(j)) -
          (if (j == c) 1.0 else 0.0)) < 1e-4,
          s"comp $c loading $j: ${comps(c)(j)}")
    }
    // deflation starts where the single-component solver starts
    assert(comps(0).toSeq ==
      Linalg.powerIterate(cov, 60).map(v => math.rint(v * 1e9) / 1e9).toSeq)
  }

  test("pcaTopK: components mutually orthogonal on a random PSD matrix") {
    val rnd = new scala.util.Random(7L)
    val d = 8
    val a = Array.fill(d, d)(rnd.nextGaussian())
    val cov = Array.tabulate(d, d)((i, j) =>
      (0 until d).map(k => a(k)(i) * a(k)(j)).sum)
    val (comps, lams) = Linalg.pcaTopK(cov, k = 4, iters = 80)
    assert(lams(0) >= lams(1) && lams(1) >= lams(2) && lams(2) >= lams(3))
    for (c1 <- 0 until 4; c2 <- c1 + 1 until 4) {
      val d12 = comps(c1).zip(comps(c2)).map { case (x, y) => x * y }.sum
      assert(math.abs(d12) < 1e-4, s"comps $c1 x $c2 = $d12")
    }
  }

  test("whitenTopK: whitened coordinates have unit sample variance " +
    "per component on an anisotropic cloud") {
    val rnd = new scala.util.Random(11L)
    val rows = (0 until 400).map { i =>
      val z = Array.fill(3)(rnd.nextGaussian())
      (i.toLong, Seq((5.0 * z(0)).toFloat, (2.0 * z(1)).toFloat,
        (0.5 * z(2)).toFloat))
    }
    val out = Linalg.whitenTopK(spark, rows.toDF("id", "v"), "id", "v",
        k = 3, iters = 40)
      .collect().map(r => (r.getLong(1), r.getDouble(2)))
    for (c <- 0L until 3L) {
      val ws = out.filter(_._1 == c).map(_._2)
      assert(ws.length == 400)
      val mean = ws.sum / ws.length
      val v = ws.map(w => (w - mean) * (w - mean)).sum / (ws.length - 1)
      // sample covariance fit → whitened sample variance ≈ 1
      assert(math.abs(v - 1.0) < 0.05, s"comp $c variance $v")
    }
  }

  test("anisotropyAudit: concentrated cloud shows a dominant lam1 " +
    "share; isotropic cloud spreads the spectrum") {
    val rnd = new scala.util.Random(5L)
    val aniso = (0 until 300).map { i =>
      val z = rnd.nextGaussian()
      (i.toLong, Seq((10.0 * z).toFloat,
        rnd.nextGaussian().toFloat * 0.1f,
        rnd.nextGaussian().toFloat * 0.1f,
        rnd.nextGaussian().toFloat * 0.1f))
    }
    val a = Linalg.anisotropyAudit(spark, aniso.toDF("id", "v"), "v",
      k = 2, iters = 40).collect()(0)
    assert(a.getLong(0) == 300)
    assert(a.getDouble(4) > 0.95, s"lam1_share ${a.getDouble(4)}")
    val iso = (0 until 300).map(i =>
      (i.toLong, Seq.fill(4)(rnd.nextGaussian().toFloat)))
    val b = Linalg.anisotropyAudit(spark, iso.toDF("id", "v"), "v",
      k = 2, iters = 40).collect()(0)
    // 4-d isotropic: each share ≈ 1/4 (sampling noise bounded)
    assert(b.getDouble(4) < 0.5, s"iso lam1_share ${b.getDouble(4)}")
    assert(b.getDouble(5) > b.getDouble(4)) // top-2 ≥ top-1
  }

  test("labelScatter: separable labels → high Fisher ratio, " +
    "label-blind embeddings → near zero; bit-exact under " +
    "repartitioning (integer/decimal arithmetic)") {
    val rnd = new scala.util.Random(3L)
    val separable = (0 until 200).map { i =>
      val c = i % 4
      (i.toLong, Seq.tabulate(4)(j =>
        ((if (j == c) 2.0 else 0.0) + rnd.nextGaussian() * 0.1).toFloat),
        c)
    }.toDF("id", "v", "label")
    val sep = Linalg.labelScatter(separable, "v", "label")
      .collect().map(r => r.getInt(0) ->
        (r.getDouble(2), r.getDouble(3), r.getDouble(4))).toMap
    assert(sep.size == 4)
    sep.foreach { case (l, (b, w, f)) =>
      assert(f > 10.0, s"label $l fisher $f (between $b within $w)")
    }
    val blind = (0 until 200).map { i =>
      (i.toLong, Seq.fill(4)(rnd.nextGaussian().toFloat), i % 4)
    }.toDF("id", "v", "label")
    val bl = Linalg.labelScatter(blind, "v", "label")
      .collect().map(r => r.getInt(0) -> r.getDouble(4)).toMap
    bl.foreach { case (l, f) => assert(f < 0.2, s"label $l fisher $f") }
    // order-invariance to the bit: every scatter term is integer/
    // decimal until the final divisions
    val a = Linalg.labelScatter(separable, "v", "label")
      .collect().map(_.toSeq).toSet
    val b = Linalg.labelScatter(separable.repartition(13), "v", "label")
      .collect().map(_.toSeq).toSet
    assert(a == b)
  }

  test("ridgeFitStd: intercept converges to the label mean; " +
    "standardized fit recovers a feature-aligned signal") {
    val rows = (0 until 200).map { i =>
      val a = math.sin(i * 0.7); val b = math.cos(i * 1.3)
      (i.toLong, Seq(a.toFloat, b.toFloat),
        if (i % 4 == 0) 1.0 else 0.0)
    }
    val (n, b0, beta, mu, sig) = Linalg.ridgeFitStd(
      rows.toDF("id", "v", "y"), "v", "y",
      lambda = 0.1, eta = 0.5, iters = 50)
    assert(n == 200)
    // β₀ ← β₀ − η(β₀ − ȳ) decouples: after 50 halvings it IS ȳ (9dp)
    assert(math.abs(b0 - 0.25) < 1e-9, s"intercept $b0")
    assert(mu.length == 2 && sig.length == 2 && beta.length == 2)
    assert(sig.forall(_ > 0))
    // scores center on ȳ and keep mirrors the rounded-score threshold
    val out = Linalg.ridgeScoreStd(rows.toDF("id", "v", "y"), "id", "v",
        "y", lambda = 0.1, eta = 0.5, iters = 50, threshold = 0.25)
      .collect().map(r => (r.getDouble(1), r.getBoolean(2)))
    val meanScore = out.map(_._1).sum / out.length
    assert(math.abs(meanScore - 0.25) < 1e-3, s"mean score $meanScore")
    out.foreach { case (s, keep) => assert(keep == (s >= 0.25)) }
  }

  test("decontaminateByEmbedding: exact nearest eval + threshold flag " +
    "+ tie toward larger eval id") {
    val corpus = Seq(
      (0L, Seq(1.0f, 0.0f)),    // = eval 10 exactly
      (1L, Seq(0.9f, 0.1f)),    // near eval 10
      (2L, Seq(0.0f, 1.0f)),    // = eval 11 AND eval 12 (tie) → eid 12
      (3L, Seq(-1.0f, 0.0f))    // far from everything
    ).toDF("doc_id", "emb")
    val eval = Seq(
      (10L, Seq(1.0f, 0.0f)), (11L, Seq(0.0f, 1.0f)),
      (12L, Seq(0.0f, 2.0f))).toDF("eval_id", "eval_emb")
    val out = Similarity.decontaminateByEmbedding(corpus, eval,
      "doc_id", "emb", "eval_id", "eval_emb", threshold = 0.95)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getDouble(2), r.getBoolean(3))).toMap
    assert(out(0L) == ((10L, 1.0, true)))
    assert(out(1L)._1 == 10L && out(1L)._3 == true && out(1L)._2 > 0.95)
    assert(out(2L) == ((12L, 1.0, true)))  // tie breaks to larger eid
    assert(out(3L)._3 == false && out(3L)._2 <= 0.0)
  }

  test("decontaminateByEmbedding: oversized eval set auto-routes to " +
    "the bucketed equi-join — no broadcast-NL join in the plan, every " +
    "corpus row survives, reported cosines exact, flags conservative") {
    val corpusRows = Seq(
      (0L, Seq(1.0f, 0.05f)), (1L, Seq(-1.0f, -0.05f)),
      (2L, Seq(0.05f, 1.0f)), (3L, Seq(-0.05f, -1.0f)))
    val evalRows = Seq(
      (10L, Seq(1.0f, 0.1f)), (11L, Seq(0.9f, 0.2f)),
      (12L, Seq(-0.9f, -0.3f)), (13L, Seq(0.1f, 0.9f)),
      (14L, Seq(-0.2f, -0.8f)))
    val corpus = corpusRows.toDF("doc_id", "emb")
    val eval = evalRows.toDF("eval_id", "eval_emb")
    // cap 3 < 5 eval rows → bucketed path
    val routed = Similarity.decontaminateByEmbedding(corpus, eval,
      "doc_id", "emb", "eval_id", "eval_emb", threshold = 0.95,
      maxBroadcastEval = 3, nPlanes = 2, dim = 2, seed = 7)
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    val nlJoins =
      try routed.queryExecution.executedPlan.collect {
        case b: org.apache.spark.sql.execution.joins
          .BroadcastNestedLoopJoinExec => b
      }
      finally spark.conf.set("spark.sql.adaptive.enabled", "true")
    assert(nlJoins.isEmpty, "bucketed path must not cross-product")
    val got = routed.collect().map(r => r.getLong(0) ->
      (Option(r.get(1)).map(_.asInstanceOf[Long]),
        Option(r.get(2)).map(_.asInstanceOf[Double]),
        r.getBoolean(3))).toMap
    assert(got.keySet == corpusRows.map(_._1).toSet,
      "every corpus row must appear, candidates or not")
    // exact-path reference (default cap → broadcast-NL)
    val exact = Similarity.decontaminateByEmbedding(corpus, eval,
      "doc_id", "emb", "eval_id", "eval_emb", threshold = 0.95)
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    def cos(a: Seq[Float], b: Seq[Float]): Double = {
      val d = a.zip(b).map { case (x, y) => x.toDouble * y }.sum
      val na = math.sqrt(a.map(x => x.toDouble * x).sum)
      val nb = math.sqrt(b.map(x => x.toDouble * x).sum)
      math.rint(d / (na * nb) * 1e6) / 1e6
    }
    got.foreach { case (id, (eidOpt, cosOpt, flag)) =>
      (eidOpt, cosOpt) match {
        case (Some(eid), Some(c)) =>
          // reported cosine is the EXACT pair cosine, and can only
          // miss candidates, never invent a closer one
          val pair = cos(corpusRows.find(_._1 == id).get._2,
            evalRows.find(_._1 == eid).get._2)
          assert(math.abs(c - pair) < 1e-9, s"id $id: $c vs $pair")
          assert(c <= exact(id) + 1e-9)
          assert(flag == (c >= 0.95))
        case (None, None) =>
          assert(!flag, s"id $id: empty bucket must flag false")
        case other => fail(s"id $id: half-null candidate $other")
      }
    }
  }

  test("embeddingDriftEav: identical snapshots → zero deltas; a shifted/" +
    "widened dimension shows exactly there; null vectors excluded") {
    val a = Seq(
      (1L, Array(1.0f, 0.0f)), (2L, Array(3.0f, 0.0f)),
      (3L, Array(5.0f, 0.0f)), (4L, null.asInstanceOf[Array[Float]]))
      .toDF("vec_id", "embedding")
    val same = Linalg.embeddingDriftEav(spark, a, a, "embedding")
      .as[(Long, Double, Double, Double, Double, Double, Double)]
      .collect().sortBy(_._1)
    assert(same.map(_._1).toSeq == Seq(0L, 1L))
    same.foreach { r => assert(r._4 == 0.0 && r._7 == 0.0) }
    // dim0: mean 3, population var ((1+9+25)/3 - 9) = 35/3 - 9
    assert(same(0)._2 == 3.0)
    assert(math.abs(same(0)._5 - (35.0 / 3 - 9)) < 1e-6)
    // shift dim 0 by +2 and widen it; dim 1 untouched
    val b = Seq((1L, Array(1.0f, 0.0f)), (2L, Array(5.0f, 0.0f)),
      (3L, Array(9.0f, 0.0f))).toDF("vec_id", "embedding")
    val drift = Linalg.embeddingDriftEav(spark, a, b, "embedding")
      .as[(Long, Double, Double, Double, Double, Double, Double)]
      .collect().sortBy(_._1)
    assert(drift(0)._4 == 2.0) // mean_delta dim0
    assert(drift(0)._7 > 0.0) // var widened
    assert(drift(1)._4 == 0.0 && drift(1)._7 == 0.0)
  }

  test("lattice moments state: merged incremental state is BIT-identical " +
    "to a full recompute at any split; stats read off exactly") {
    val r = new scala.util.Random(31)
    val all = (0L until 50L).map(i =>
      (i, Array.fill(4)((r.nextGaussian() * 2).toFloat)))
      .toDF("vec_id", "embedding")
    val full = Linalg.statsFromLatticeState(
      Linalg.momentsLatticeState(all, "embedding"))
      .as[(Long, Long, Double, Double)].collect().toSet
    // two different history/delta splits, both must equal the full pass
    for (m <- Seq(2L, 7L)) {
      val merged = Linalg.statsFromLatticeState(Linalg.mergeMomentsState(
        Linalg.momentsLatticeState(
          all.filter(col("vec_id") % m === 0), "embedding"),
        Linalg.momentsLatticeState(
          all.filter(col("vec_id") % m =!= 0), "embedding")))
        .as[(Long, Long, Double, Double)].collect().toSet
      assert(merged == full, s"split %$m diverged")
    }
    // hand-check one dim: vectors [(1,.),(3,.)] → mean 2, var 1
    val tiny = Seq((1L, Array(1.0f)), (2L, Array(3.0f)))
      .toDF("vec_id", "embedding")
    val got = Linalg.statsFromLatticeState(
      Linalg.momentsLatticeState(tiny, "embedding"))
      .as[(Long, Long, Double, Double)].collect().head
    assert(got == ((0L, 2L, 2.0, 1.0)))
  }

  test("pcaLeverage: a planted far-out-of-distribution vector scores " +
    "far above the bulk and only it flags") {
    val r = new scala.util.Random(47)
    // bulk: correlated 8-d cloud; one planted point far along PC1
    val bulk = (0L until 200L).map { i =>
      val t = r.nextGaussian()
      (i, Array.tabulate(8)(j =>
        (t * (if (j < 4) 1.0 else 0.2) + r.nextGaussian() * 0.1).toFloat))
    }
    val outlier = (999L,
      Array.tabulate(8)(j => if (j < 4) 20.0f else 4.0f))
    val df = (bulk :+ outlier).toDF("vec_id", "embedding")
    val got = Linalg.pcaLeverage(spark, df, "vec_id", "embedding",
      k = 2, iters = 15, threshold = 50.0)
      .as[(Long, Double, Boolean)].collect()
    val byId = got.map(g => g._1 -> g).toMap
    assert(byId(999L)._3, s"planted outlier not flagged: ${byId(999L)}")
    val bulkScores = got.filter(_._1 != 999L)
    assert(bulkScores.forall(!_._3),
      s"bulk rows flagged: ${bulkScores.filter(_._3).take(3).toSeq}")
    assert(byId(999L)._2 >
      bulkScores.map(_._2).max * 5)
  }
}
