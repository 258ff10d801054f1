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
}
