package graft

import graft.expressions.VectorFunctions
import graft.ops.Similarity
import org.apache.spark.sql.functions._

/** Vector similarity: native cosine expression + ANN operators. */
class SimilaritySpec extends SparkSpec {
  import spark.implicits._

  test("cosine expression: correctness, nulls, length mismatch") {
    val df = Seq(
      (Seq(1.0f, 0.0f), Seq(1.0f, 0.0f), Some(1.0)),
      (Seq(1.0f, 0.0f), Seq(0.0f, 1.0f), Some(0.0)),
      (Seq(1.0f, 1.0f), Seq(1.0f, 1.0f), Some(1.0)),
      (Seq(1.0f, 0.0f), Seq(-1.0f, 0.0f), Some(-1.0)),
      (Seq(0.0f, 0.0f), Seq(1.0f, 1.0f), Some(0.0)) // zero norm → 0
    ).toDF("a", "b", "want")
    df.select(col("want"),
      VectorFunctions.cosineSimilarity(col("a"), col("b")).as("got"))
      .as[(Option[Double], Option[Double])].collect()
      .foreach { case (want, got) =>
        assert(got.isDefined && math.abs(got.get - want.get) < 1e-9) }
    // length mismatch → null
    val bad = Seq((Seq(1.0f), Seq(1.0f, 2.0f))).toDF("a", "b")
      .select(VectorFunctions.cosineSimilarity(col("a"), col("b")).as("c"))
      .as[Option[Double]].collect()
    assert(bad.head.isEmpty)
    // null input → null
    val nul = Seq((Some(Seq(1.0f)), Option.empty[Seq[Float]]))
      .toDF("a", "b")
      .select(VectorFunctions.cosineSimilarity(col("a"), col("b")).as("c"))
      .as[Option[Double]].collect()
    assert(nul.head.isEmpty)
  }

  test("cosine expression matches a double-precision reference") {
    val r = new scala.util.Random(1)
    val rows = Seq.fill(50)((Seq.fill(16)(r.nextFloat()),
      Seq.fill(16)(r.nextFloat())))
    val got = rows.toDF("a", "b")
      .select(VectorFunctions.cosineSimilarity(col("a"), col("b")).as("c"))
      .as[Double].collect()
    rows.zip(got).foreach { case ((a, b), c) =>
      val dot = a.zip(b).map { case (x, y) => x.toDouble * y.toDouble }.sum
      val na = math.sqrt(a.map(x => x.toDouble * x.toDouble).sum)
      val nb = math.sqrt(b.map(x => x.toDouble * x.toDouble).sum)
      assert(math.abs(c - dot / (na * nb)) < 1e-12)
    }
  }

  test("bruteForceTopK: self is rank 1, k respected, ties by id") {
    val r = new scala.util.Random(2)
    val vecs = (0L until 20L).map(i => (i, Seq.fill(8)(r.nextFloat())))
    val corpus = vecs.toDF("vec_id", "embedding")
    val queries = vecs.take(3)
      .map { case (i, v) => (i, v) }.toDF("q_id", "q_vec")
    val top = Similarity.bruteForceTopK(corpus, queries,
      "vec_id", "embedding", "q_id", "q_vec", k = 5)
    val byQ = top.select("q_id", "vec_id", "rank")
      .as[(Long, Long, Int)].collect().groupBy(_._1)
    assert(byQ.keySet == Set(0L, 1L, 2L))
    byQ.foreach { case (q, rows) =>
      assert(rows.length == 5)
      assert(rows.find(_._3 == 1).get._2 == q) // self first (cos=1)
    }
  }

  test("ivfAssign routes vectors to nearest centroid") {
    val corpus = Seq(
      (1L, Seq(1.0f, 0.0f)), (2L, Seq(0.9f, 0.1f)),
      (3L, Seq(0.0f, 1.0f))).toDF("vec_id", "embedding")
    val centroids = Seq((10L, Seq(1.0f, 0.0f)), (20L, Seq(0.0f, 1.0f)))
      .toDF("c_id", "c_vec")
    val assigned = Similarity.ivfAssign(corpus, "vec_id", "embedding",
      centroids, "c_id", "c_vec", nProbe = 1)
      .select("vec_id", "c_id").as[(Long, Long)].collect().toMap
    assert(assigned(1L) == 10L && assigned(2L) == 10L &&
      assigned(3L) == 20L)
  }

  test("TopKByScoreAgg ranking == the row_number window form it " +
    "replaced (ties, ranks, partition-invariance)") {
    import org.apache.spark.sql.expressions.Window
    val r = new scala.util.Random(17)
    // duplicated vectors force exact cosine ties at the k boundary
    val base = (0L until 60L)
      .map(i => (i, Seq.fill(8)(((r.nextInt(9) - 4) / 4.0).toFloat)))
    val corpus = (base ++ base.map { case (i, v) => (i + 60L, v) })
      .toDF("vec_id", "embedding")
    val queries = base.take(4)
      .map { case (i, v) => (i, v) }.toDF("q_id", "q_vec")
    def windowForm(k: Int) = {
      val scored = corpus.crossJoin(broadcast(queries))
        .select(col("q_id"), col("vec_id"),
          graft.expressions.VectorFunctions.cosineSimilarity(
            col("q_vec"), col("embedding")).as("cos"))
      val w = Window.partitionBy("q_id").orderBy(desc("cos"),
        col("vec_id"))
      scored.withColumn("rank", row_number().over(w))
        .filter(col("rank") <= k)
        .select(col("q_id"), col("vec_id"), col("cos"),
          col("rank").cast("int").as("rank"))
    }
    for (k <- Seq(1, 5, 17)) {
      val want = windowForm(k).as[(Long, Long, Double, Int)]
        .collect().sortBy(x => (x._1, x._4)).toSeq
      val got = Similarity.bruteForceTopK(corpus, queries, "vec_id",
          "embedding", "q_id", "q_vec", k)
        .select("q_id", "vec_id", "cos", "rank")
        .as[(Long, Long, Double, Int)]
        .collect().sortBy(x => (x._1, x._4)).toSeq
      assert(got == want, s"k=$k")
      // merge-order invariance: different partitioning, same rows
      val got13 = Similarity.bruteForceTopK(corpus.repartition(13),
          queries, "vec_id", "embedding", "q_id", "q_vec", k)
        .select("q_id", "vec_id", "cos", "rank")
        .as[(Long, Long, Double, Int)]
        .collect().sortBy(x => (x._1, x._4)).toSeq
      assert(got13 == want, s"k=$k repartitioned")
    }
  }

  test("topKByScoreDistinct == dropDuplicates + topKByScore (the " +
    "two-exchange pattern it folds into one stage), partition-invariant") {
    import graft.expressions.AggregateFunctions
    val r = new scala.util.Random(23)
    // duplicate (grp, id) rows with IDENTICAL scores (the ANN candidate
    // stream shape: score is a pure function of the id's vector), plus
    // score ties ACROSS ids to exercise the (score DESC, id ASC) order
    val rows = for {
      g <- 0L until 5L
      id <- 0L until 40L
      dup <- 0 until (1 + r.nextInt(3))
    } yield (g, id, (id % 7).toDouble, dup)
    val df = rows.toDF("grp", "id", "score", "dup")
      .drop("dup")
    def explode_(c: org.apache.spark.sql.Column) =
      org.apache.spark.sql.functions.explode(c)
    for (k <- Seq(1, 3, 11)) {
      def flat(agged: org.apache.spark.sql.DataFrame) = agged
        .select(col("grp"), explode_(col("t")).as("e"))
        .select(col("grp"), col("e.id").as("id"),
          col("e.score").as("score"))
        .as[(Long, Long, Double)].collect().sortBy(x => (x._1, x._2))
        .toSeq
      val want = flat(df.dropDuplicates("grp", "id").groupBy("grp")
        .agg(AggregateFunctions.topKByScore(col("score"), col("id"), k)
          .as("t")))
      val got = flat(df.groupBy("grp")
        .agg(AggregateFunctions.topKByScoreDistinct(col("score"),
          col("id"), k).as("t")))
      assert(got == want, s"k=$k")
      // merge-order invariance (partial buffers dedup across merges)
      val got13 = flat(df.repartition(13).groupBy("grp")
        .agg(AggregateFunctions.topKByScoreDistinct(col("score"),
          col("id"), k).as("t")))
      assert(got13 == want, s"k=$k repartitioned")
    }
  }

  test("ivfAssign narrow projection == the crossJoin+window form it " +
    "replaced (order, ties, probe ranks)") {
    // the reference form: expand by k, rank per vector id — the shape
    // ivfAssign used before NearestCentroids; semantics must agree
    // bit-for-bit including the (cos DESC, centroid_id ASC) tie-break.
    import org.apache.spark.sql.expressions.Window
    val r = new scala.util.Random(11)
    val corpus = (0L until 200L)
      .map(i => (i, Seq.fill(8)(((r.nextInt(9) - 4) / 4.0).toFloat)))
      .toDF("vec_id", "embedding")
    // duplicate centroids force cosine ties; ids deliberately unsorted
    val cents = Seq(
      (30L, Seq(1.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0)),
      (10L, Seq(0.0, 1.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0)),
      (20L, Seq(1.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0)),
      (40L, Seq(0.5, 0.5, 0.5, 0.5, -0.5, 0.5, 0.5, 0.5)))
      .toDF("centroid_id", "c_vec")
    def reference(nProbe: Int) = {
      val scored = corpus.crossJoin(broadcast(cents))
        .withColumn("cdist",
          -graft.expressions.VectorFunctions.cosineSimilarity(
            col("embedding"), col("c_vec")))
      val w = Window.partitionBy("vec_id")
        .orderBy(col("cdist"), col("centroid_id"))
      scored.withColumn("probe_rank", row_number().over(w))
        .filter(col("probe_rank") <= nProbe)
        .select(col("vec_id"), col("centroid_id"),
          col("probe_rank").cast("int").as("probe_rank"))
    }
    for (nProbe <- Seq(1, 2, 4)) {
      val got = Similarity.ivfAssign(corpus, "vec_id", "embedding",
          cents, "centroid_id", "c_vec", nProbe)
        .select("vec_id", "centroid_id", "probe_rank")
        .as[(Long, Long, Int)].collect().sortBy(x => (x._1, x._3))
      val want = reference(nProbe)
        .as[(Long, Long, Int)].collect().sortBy(x => (x._1, x._3))
      assert(got.toSeq == want.toSeq, s"nProbe=$nProbe")
    }
  }

  test("lshTopK finds identical vector in same bucket") {
    val r = new scala.util.Random(3)
    val vecs = (0L until 50L).map(i => (i, Seq.fill(16)(r.nextFloat())))
    val corpus = vecs.toDF("vec_id", "embedding")
    val queries = Seq((0L, vecs.head._2)).toDF("q_id", "q_vec")
    val top = Similarity.lshTopK(corpus, queries, "vec_id", "embedding",
      "q_id", "q_vec", k = 3, nPlanes = 4, dim = 16)
      .select("vec_id", "rank").as[(Long, Int)].collect()
    assert(top.find(_._2 == 1).map(_._1).contains(0L)) // self in bucket
  }

  test("lshTopK bucketFn override swaps the bucket family, keeps the pipeline") {
    val r = new scala.util.Random(5)
    val vecs = (0L until 40L).map(i => (i, Seq.fill(8)(r.nextFloat())))
    val corpus = vecs.toDF("vec_id", "embedding")
    val queries = Seq((0L, vecs.head._2), (7L, vecs(7)._2))
      .toDF("q_id", "q_vec")
    // a 2-bucket family on the first component's sign-ish split: every
    // query shares its bucket with ~half the corpus
    val bucketFn: org.apache.spark.sql.Column => org.apache.spark.sql.Column =
      v => (element_at(v, 1) >= 0.5f).cast("long")
    val top = Similarity.lshTopK(corpus, queries, "vec_id", "embedding",
      "q_id", "q_vec", k = 3, bucketFn = Some(bucketFn))
      .select("q_id", "vec_id", "rank").as[(Long, Long, Int)].collect()
    // self lands rank 1 for both queries (identical vector, same bucket)
    assert(top.filter(_._3 == 1).map(t => t._1 -> t._2).toMap ==
      Map(0L -> 0L, 7L -> 7L))
    // every returned candidate really is in the query's bucket
    val bucketOf = vecs.map { case (i, v) => i -> (v.head >= 0.5f) }.toMap
    assert(top.forall { case (q, c, _) => bucketOf(q) == bucketOf(c) })
  }

  test("hyperplaneBucket fails loud on vectors shorter than dim") {
    val short = Seq((1L, Seq.fill(8)(0.5f))).toDF("vec_id", "embedding")
    val ex = intercept[Exception] {
      short.select(Similarity.hyperplaneBucket(col("embedding"),
        nPlanes = 4, dim = 16, seed = 7)).collect()
    }
    def msgs(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(e => e.getMessage +: msgs(e.getCause))
    assert(msgs(ex).exists(m => m != null && m.contains("expected >= 16")))
  }

  test("recallAtK: perfect, partial, and empty-approx recall") {
    def topk(rows: (Long, Long, Int)*) =
      rows.toSeq.toDF("q", "id", "rank")
    val exact = topk((1L, 10L, 1), (1L, 11L, 2), (2L, 20L, 1), (2L, 21L, 2))
    val perfect = Similarity.recallAtK(exact, exact, "q", "id", k = 2)
      .as[(Long, Double)].collect().toMap
    assert(perfect == Map(1L -> 1.0, 2L -> 1.0))
    // query 1 found one of two; query 2 absent from approx entirely
    val approx = topk((1L, 10L, 1), (1L, 99L, 2))
    val partial = Similarity.recallAtK(approx, exact, "q", "id", k = 2)
      .as[(Long, Double)].collect().toMap
    assert(partial == Map(1L -> 0.5, 2L -> 0.0))
  }

  test("QuantizedSignBucket == the composable 256-term literal form it " +
    "replaced (incl. Spark round() half-up semantics)") {
    val nPlanes = 4
    val dim = 16
    val rnd = new scala.util.Random(11)
    val signs = Seq.fill(nPlanes * dim)(if (rnd.nextBoolean()) 1 else -1)
    // values engineered to hit .5-quantization boundaries: k/2e6 lands
    // exactly on round(x*1e6) halves where floor(x+0.5) vs BigDecimal
    // HALF_UP can disagree
    val vecs = (1L to 50L).map { i =>
      i -> Array.tabulate(dim)(d =>
        ((i * 7 + d * 13) % 41 - 20).toFloat / 2e6f)
    }
    val df = vecs.toDF("id", "v")
    val native = df.select(col("id"),
        graft.expressions.VectorFunctions
          .quantizedSignBucket(col("v"), signs, nPlanes).as("b"))
      .as[(Long, Long)].collect().toMap
    val composable = (0 until nPlanes).map { p =>
      val dot = (0 until dim).map { i =>
        round(element_at(col("v"), i + 1).cast("double") * 1e6)
          .cast("long") * lit(signs(p * dim + i).toLong)
      }.reduce(_ + _)
      when(dot >= 0, lit(1L << (nPlanes - 1 - p))).otherwise(lit(0L))
    }.reduce(_ + _)
    val old = df.select(col("id"), composable.as("b"))
      .as[(Long, Long)].collect().toMap
    assert(native == old)
  }

  test("PQ encode/LUT/ADC agree with a driver-side reference " +
    "(argmin ties → lowest code; ADC = Σ_s lut[codes[s]])") {
    val m = 2; val ksub = 4; val dsub = 4
    val cbs = Array.tabulate(m, ksub, dsub)((s, c, i) =>
      ((s * 5 + c * 3 + i) % 7 - 3) / 2.0)
    val cbDf = (for (s <- 0 until m; c <- 0 until ksub)
      yield (s, c, cbs(s)(c).toSeq)).toDF("subspace", "code", "c_vec")
    val r = new scala.util.Random(23)
    // quarter-integer components force exact distance ties regularly
    val vecs = (0L until 40L)
      .map(i => (i, Seq.fill(m * dsub)((r.nextInt(9) - 4) / 4.0f)))
    val df = vecs.toDF("vec_id", "embedding")
    def refEncode(v: Seq[Float]): Seq[Int] =
      (0 until m).map { s =>
        (0 until ksub).minBy { c =>
          val d = (0 until dsub).map { i =>
            val t = v(s * dsub + i).toDouble - cbs(s)(c)(i); t * t
          }.sum
          (d, c) // strict-'<' walk == min by (dist, code)
        }
      }
    val got = Similarity.pqEncode(df, "vec_id", "embedding", cbDf)
      .as[(Long, Seq[Int])].collect().toMap
    vecs.foreach { case (id, v) =>
      assert(got(id) == refEncode(v), s"encode vec $id") }
    // ADC against hand-computed LUT sums, every (query, doc) pair
    val queries = vecs.take(3).toDF("q_id", "q_vec")
    val top = Similarity.pqAdcTopK(df, queries, "vec_id", "embedding",
      "q_id", "q_vec", cbDf, k = 40)
      .select("q_id", "vec_id", "adc", "rank")
      .as[(Long, Long, Double, Int)].collect()
    assert(top.length == 3 * 40)
    def refAdc(q: Seq[Float], codes: Seq[Int]): Double =
      (0 until m).map { s =>
        val cv = cbs(s)(codes(s))
        (0 until dsub).map { i =>
          val t = q(s * dsub + i).toDouble - cv(i); t * t
        }.sum
      }.sum
    val qv = vecs.take(3).toMap
    top.foreach { case (q, id, adc, _) =>
      assert(math.abs(adc - refAdc(qv(q), got(id))) < 1e-12) }
    // ranks follow (adc ASC, id ASC) within each query
    top.groupBy(_._1).values.foreach { rows =>
      val byRank = rows.sortBy(_._4).map(r => (r._3, r._2))
      assert(byRank.sameElements(byRank.sortBy(identity)))
    }
    // partition invariance
    val got13 = Similarity.pqAdcTopK(df.repartition(13), queries,
      "vec_id", "embedding", "q_id", "q_vec", cbDf, k = 40)
      .select("q_id", "vec_id", "adc", "rank")
      .as[(Long, Long, Double, Int)].collect()
    assert(got13.sortBy(r => (r._1, r._4)).toSeq ==
      top.sortBy(r => (r._1, r._4)).toSeq)
  }

  test("fitPqCodebooks: shape, determinism, centroid round-trip") {
    val r = new scala.util.Random(31)
    val df = (0L until 300L)
      .map(i => (i, Seq.fill(8)(r.nextFloat()))).toDF("vec_id", "embedding")
    val cb1 = Similarity.fitPqCodebooks(df, "embedding", m = 2, ksub = 4,
      seed = 9)
    val rows1 = cb1.select("subspace", "code", "c_vec")
      .as[(Int, Int, Seq[Double])].collect().sortBy(t => (t._1, t._2))
    assert(rows1.length == 8 && rows1.forall(_._3.length == 4))
    assert(rows1.map(t => (t._1, t._2)).toSeq ==
      (for (s <- 0 until 2; c <- 0 until 4) yield (s, c)))
    // deterministic across re-fits (no RNG anywhere)
    val rows2 = Similarity.fitPqCodebooks(df, "embedding", m = 2,
      ksub = 4, seed = 9).select("subspace", "code", "c_vec")
      .as[(Int, Int, Seq[Double])].collect().sortBy(t => (t._1, t._2))
    assert(rows1.toSeq == rows2.toSeq)
    // a vector assembled FROM codebook rows encodes to those codes
    // (distance 0 to its own sub-centroid)
    val byKey = rows1.map(t => (t._1, t._2) -> t._3).toMap
    val lifted = Seq((99L, byKey((0, 1)) ++ byKey((1, 3))))
      .toDF("vec_id", "embedding")
    val codes = Similarity.pqEncode(lifted, "vec_id", "embedding", cb1)
      .as[(Long, Seq[Int])].collect().head._2
    assert(codes == Seq(1, 3))
  }

  test("ivfPqTopK: candidates come only from probed cells; ADC agrees " +
    "with the unpartitioned scan inside them") {
    val m = 2; val ksub = 4; val dsub = 4
    val cbDf = (for (s <- 0 until m; c <- 0 until ksub)
      yield (s, c, Seq.tabulate(dsub)(i => ((s + c * 3 + i) % 5 - 2) / 2.0)))
      .toDF("subspace", "code", "c_vec")
    // two well-separated cells on the first axis
    val cents = Seq(
      (0L, Seq(1.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0)),
      (1L, Seq(-1.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0)))
      .toDF("centroid_id", "c_vec")
    val r = new scala.util.Random(53)
    val vecs = (0L until 40L).map { i =>
      val sign = if (i % 2 == 0) 1.0f else -1.0f
      (i, (sign * (1f + r.nextFloat())) +: Seq.fill(7)(r.nextFloat()))
    }
    val corpus = vecs.toDF("vec_id", "embedding")
    val queries = vecs.take(4).toDF("q_id", "q_vec")
    val got = Similarity.ivfPqTopK(corpus, queries, "vec_id",
      "embedding", "q_id", "q_vec", cents, cbDf, k = 10, nProbe = 1)
      .select("q_id", "vec_id", "adc", "rank")
      .as[(Long, Long, Double, Int)].collect()
    // nProbe=1 on separated cells: candidates share the query's sign
    got.foreach { case (q, id, _, _) =>
      assert(q % 2 == id % 2, s"query $q probed the wrong cell ($id)") }
    // inside the probed cell, ranks == the brute ADC scan restricted
    // to that cell (same codes, same LUT, same tie-break)
    val half = vecs.filter(_._1 % 2 == 0).toDF("vec_id", "embedding")
    val qHalf = vecs.take(4).filter(_._1 % 2 == 0).toDF("q_id", "q_vec")
    val brute = Similarity.pqAdcTopK(half, qHalf, "vec_id", "embedding",
      "q_id", "q_vec", cbDf, k = 10)
      .select("q_id", "vec_id", "adc", "rank")
      .as[(Long, Long, Double, Int)].collect()
      .filter(t => Set(0L, 2L).contains(t._1))
    val gotEven = got.filter(t => Set(0L, 2L).contains(t._1))
    assert(gotEven.sortBy(t => (t._1, t._4)).toSeq ==
      brute.sortBy(t => (t._1, t._4)).toSeq)
  }

  test("quantizeInt8: exact code formula, zero vector, scale") {
    val df = Seq(
      (1L, Seq(1.0f, -0.5f, 0.25f, 0.0f)),
      (2L, Seq(0.0f, 0.0f, 0.0f, 0.0f))).toDF("vec_id", "embedding")
    val got = Similarity.quantizeInt8(df, "vec_id", "embedding")
      .select(col("vec_id"), col("codes").cast("array<int>"), col("scale"))
      .as[(Long, Seq[Int], Double)].collect().sortBy(_._1)
    // maxabs=1: floor(127.5)=127, floor(-63.0)=-63, floor(32.25)=32
    assert(got(0)._2 == Seq(127, -63, 32, 0))
    assert(math.abs(got(0)._3 - 1.0 / 127) < 1e-15)
    assert(got(1)._2 == Seq(0, 0, 0, 0) && got(1)._3 == 0.0)
  }

  test("int8TopK: self is rank 1, ranks track exact cosine") {
    val r = new scala.util.Random(41)
    val vecs = (0L until 30L).map(i => (i, Seq.fill(16)(r.nextFloat())))
    val corpus = vecs.toDF("vec_id", "embedding")
    val queries = vecs.take(3).toDF("q_id", "q_vec")
    val got = Similarity.int8TopK(corpus, queries, "vec_id", "embedding",
      "q_id", "q_vec", k = 5)
      .select("q_id", "vec_id", "rank").as[(Long, Long, Int)].collect()
    val byQ = got.groupBy(_._1)
    assert(byQ.keySet == Set(0L, 1L, 2L))
    byQ.foreach { case (q, rows) =>
      assert(rows.length == 5)
      assert(rows.find(_._3 == 1).get._2 == q, s"self not rank 1 for $q")
    }
    // quantization distortion is bounded: top-5 overlap with exact
    // brute-force top-5 is at least 4 of 5 per query on smooth data
    val exact = Similarity.bruteForceTopK(corpus, queries, "vec_id",
      "embedding", "q_id", "q_vec", k = 5)
      .select("q_id", "vec_id").as[(Long, Long)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    byQ.foreach { case (q, rows) =>
      assert(rows.map(_._2).toSet.intersect(exact(q)).size >= 4, s"q=$q")
    }
  }

  test("knnGraph: per-bucket brute-force agreement, self excluded") {
    val r = new scala.util.Random(5)
    val vecs = (0L until 40L).map(i =>
      (i, Seq.fill(8)(r.nextFloat() * 2 - 1))).toDF("vec_id", "embedding")
    val got = graft.ops.Similarity.knnGraph(vecs, "vec_id", "embedding",
        k = 3, nPlanes = 2, dim = 8, seed = 3)
      .select("src_id", "dst_id", "rank").as[(Long, Long, Int)]
      .collect().toSet
    // reference: same bucket expression, per-bucket all-pairs ranking
    import graft.expressions.VectorFunctions
    val bk = vecs.select($"vec_id",
        VectorFunctions.hyperplaneBucket($"embedding", 2, 8, 3).as("b"))
      .as[(Long, Long)].collect().toMap
    val data = vecs.as[(Long, Seq[Float])].collect().toMap
    def cos(a: Seq[Float], b: Seq[Float]): Double = {
      val d = a.zip(b).map { case (x, y) => x.toDouble * y }.sum
      val na = math.sqrt(a.map(x => x.toDouble * x).sum)
      val nb = math.sqrt(b.map(x => x.toDouble * x).sum)
      if (na == 0 || nb == 0) 0.0 else d / (na * nb)
    }
    val want = (for {
      s <- 0L until 40L
      ranked = (0L until 40L)
        .filter(d => d != s && bk(d) == bk(s))
        .map(d => (d, cos(data(s), data(d))))
        .sortBy { case (d, c) => (-c, d) }.take(3)
      ((d, _), idx) <- ranked.zipWithIndex
    } yield (s, d, idx + 1)).toSet
    assert(got == want)
    assert(!got.exists { case (s, d, _) => s == d })
  }

  test("kmeansStep: matches driver-side reference, partition-invariant") {
    // 2-d toy corpus with an obvious 2-cluster structure under cosine
    val vecs = Seq(
      (0L, Seq(1.0f, 0.1f)), (1L, Seq(1.0f, -0.1f)), (2L, Seq(0.9f, 0.0f)),
      (3L, Seq(0.1f, 1.0f)), (4L, Seq(-0.1f, 1.0f)), (5L, Seq(0.0f, 0.8f))
    ).toDF("vec_id", "embedding")
    val cents = Seq((0L, Seq(1.0, 0.0)), (1L, Seq(0.0, 1.0)))
      .toDF("centroid_id", "c_vec")
    val got = Similarity.kmeansStep(vecs, "vec_id", "embedding", cents)
      .select("centroid_id", "dim", "n", "qsum", "mean")
      .as[(Long, Int, Long, Long, Double)].collect().sortBy(r => (r._1, r._2))
    // driver-side reference: cosine argmax assignment, lattice sums
    val data = Map(0L -> Seq(1.0f, 0.1f), 1L -> Seq(1.0f, -0.1f),
      2L -> Seq(0.9f, 0.0f), 3L -> Seq(0.1f, 1.0f), 4L -> Seq(-0.1f, 1.0f),
      5L -> Seq(0.0f, 0.8f))
    val cvs = Map(0L -> Seq(1.0, 0.0), 1L -> Seq(0.0, 1.0))
    def cos(a: Seq[Double], b: Seq[Double]): Double = {
      val d = a.zip(b).map { case (x, y) => x * y }.sum
      val na = math.sqrt(a.map(x => x * x).sum)
      val nb = math.sqrt(b.map(x => x * x).sum)
      if (na == 0 || nb == 0) 0.0 else d / (na * nb)
    }
    val assign = data.view.mapValues { v =>
      cvs.toSeq.sortBy { case (cid, cv) =>
        (-cos(v.map(_.toDouble), cv), cid) }.head._1
    }.toMap
    val want = (for {
      cid <- Seq(0L, 1L); dim <- 0 until 2
      members = data.filter { case (id, _) => assign(id) == cid }
      if members.nonEmpty
      qs = members.values.map(v =>
        math.floor(v(dim).toDouble * 1e6 + 0.5).toLong)
    } yield (cid, dim, members.size.toLong, qs.sum,
      qs.sum.toDouble / (1e6 * members.size))).sortBy(r => (r._1, r._2))
    assert(got.toSeq == want)
    // partition invariance: lattice sums are order-exact
    val re = Similarity.kmeansStep(vecs.repartition(7), "vec_id",
        "embedding", cents)
      .select("centroid_id", "dim", "n", "qsum", "mean")
      .as[(Long, Int, Long, Long, Double)].collect().sortBy(r => (r._1, r._2))
    assert(re.toSeq == want)
  }

  test("kmeansIterate: centroids move to cluster means and converge") {
    val vecs = Seq(
      (0L, Seq(2.0f, 0.0f)), (1L, Seq(4.0f, 0.0f)),
      (2L, Seq(0.0f, 1.0f)), (3L, Seq(0.0f, 3.0f))
    ).toDF("vec_id", "embedding")
    val cents0 = Seq((0L, Seq(1.0, 0.01)), (1L, Seq(0.01, 1.0)))
      .toDF("centroid_id", "c_vec")
    val out = Similarity.kmeansIterate(vecs, "vec_id", "embedding",
        cents0, iters = 2)
      .as[(Long, Seq[Double])].collect().toMap
    // cell 0 = {(2,0),(4,0)} → lattice mean (3.0, 0.0); cell 1 =
    // {(0,1),(0,3)} → (0.0, 2.0); a second iteration re-assigns
    // identically (cosine ignores scale), so the fixpoint holds
    assert(out(0L) == Seq(3.0, 0.0))
    assert(out(1L) == Seq(0.0, 2.0))
  }

  test("hardNegatives: same-label neighbors never consume rank slots, " +
      "ranks follow cosine within the other-label pool") {
    // one bucket (constant bucketFn); anchor 0 is closest to 1 (same
    // label — must NOT appear), then 2, then 3 (other label)
    val vecs = Seq(
      (0L, Seq(1.0f, 0.0f), 7),
      (1L, Seq(0.99f, 0.1f), 7),   // nearest overall, same label
      (2L, Seq(0.9f, 0.4f), 8),
      (3L, Seq(0.0f, 1.0f), 9)
    ).toDF("vec_id", "embedding", "label")
    val got = Similarity.hardNegatives(vecs, "vec_id", "embedding",
        "label", k = 2, bucketFn = Some(_ => lit(0L)))
      .as[(Long, Long, Int)].collect()
      .filter(_._1 == 0L).sortBy(_._3)
    assert(got.map(r => (r._2, r._3)).toSeq == Seq((2L, 1), (3L, 2)))
  }

  test("dimMeansLattice: exact integer-lattice means, hand values, " +
      "negative components, partition invariance to the bit") {
    val vecs = Seq(
      (1L, Seq(1.0f, -2.0f)),
      (2L, Seq(2.0f, 4.0f)),
      (3L, Seq(0.5f, -0.25f))).toDF("vec_id", "embedding")
    val got = Similarity.dimMeansLattice(vecs, "vec_id", "embedding")
      .as[(Int, Double)].collect().toMap
    // dim 0: (1 + 2 + 0.5)/3; dim 1: (−2 + 4 − 0.25)/3 — exact on the
    // 1e6 lattice
    assert(got(0) == 3.5e6 / (3 * 1e6))
    assert(got(1) == 1.75e6 / (3 * 1e6))
    val re = Similarity.dimMeansLattice(vecs.repartition(7), "vec_id",
      "embedding").as[(Int, Double)].collect().toMap
    assert(re == got) // integer sums are order-free
  }

  test("ivfPqResidualTopK: a vector whose residual IS a codebook entry " +
      "self-reconstructs at ADC 0 and ranks itself first") {
    // 2 cells at +e1/−e1; residual codebook: subspace entries so that
    // corpus vectors are exactly centroid + (code-vec per subspace)
    val cents = Seq(
      (0L, Seq(8.0, 0.0, 0.0, 0.0)),
      (1L, Seq(-8.0, 0.0, 0.0, 0.0))).toDF("centroid_id", "c_vec")
    val cb = Seq(
      (0, 0, Seq(0.5, 0.0)), (0, 1, Seq(0.0, -0.5)),
      (1, 0, Seq(0.25, 0.0)), (1, 1, Seq(0.0, -0.25)))
      .toDF("subspace", "code", "c_vec")
    // corpus: centroid ± exact codebook residuals (float-exact values)
    val corpus = Seq(
      (10L, Seq(8.5f, 0.0f, 0.25f, 0.0f)),   // cell 0, codes (0,0)
      (11L, Seq(8.0f, -0.5f, 0.0f, -0.25f)), // cell 0, codes (1,1)
      (12L, Seq(-7.5f, 0.0f, 0.25f, 0.0f)),  // cell 1, codes (0,0)
      (13L, Seq(-8.0f, -0.5f, 0.0f, -0.25f)) // cell 1, codes (1,1)
    ).toDF("vec_id", "embedding")
    val queries = corpus.select(col("vec_id").as("q_vec_id"),
      col("embedding").as("q_vec"))
    val got = Similarity.ivfPqResidualTopK(corpus, queries, "vec_id",
        "embedding", "q_vec_id", "q_vec", cents, cb, k = 1, nProbe = 1)
      .as[(Long, Long, Double, Int)].collect()
      .map(r => r._1 -> (r._2, r._3)).toMap
    // every query's own row reconstructs exactly: ADC 0, rank 1
    // (ties on ADC 0 break to the smallest id among exact-duplicates —
    // none here)
    got.foreach { case (q, (id, adc)) =>
      assert(id == q && adc == 0.0, s"q $q -> ($id, $adc)")
    }
  }

  test("refineTopK over a candidate superset reproduces brute-force " +
      "exactly (the refine contract: repair, never distort)") {
    val corpus = (0 until 40).map(i =>
      (i.toLong, Seq(math.sin(i * 0.7).toFloat, math.cos(i * 1.1).toFloat,
        math.sin(i * 0.3).toFloat))).toDF("vec_id", "embedding")
    val queries = (0 until 4).map(i =>
      (100L + i, Seq(math.cos(i * 0.9).toFloat, math.sin(i * 0.5).toFloat,
        0.5f))).toDF("q_vec_id", "q_vec")
    // candidates = EVERYTHING (rank over full corpus) → refine must
    // equal bruteForceTopK bit for bit
    val allCand = Similarity.bruteForceTopK(corpus, queries, "vec_id",
      "embedding", "q_vec_id", "q_vec", k = 40)
    val refined = Similarity.refineTopK(allCand, corpus, queries,
        "vec_id", "embedding", "q_vec_id", "q_vec", k = 3)
      .as[(Long, Long, Double, Int)].collect().toSet
    val brute = Similarity.bruteForceTopK(corpus, queries, "vec_id",
        "embedding", "q_vec_id", "q_vec", k = 3)
      .as[(Long, Long, Double, Int)].collect().toSet
    assert(refined == brute)
  }

  test("autoNPlanes: smallest plane count holding expected bucket " +
      "population at the target; capped at 30") {
    assert(Similarity.autoNPlanes(0L) == 0)
    assert(Similarity.autoNPlanes(256L, 256L) == 0)
    assert(Similarity.autoNPlanes(257L, 256L) == 1)
    assert(Similarity.autoNPlanes(1024L, 256L) == 2)
    assert(Similarity.autoNPlanes(1L << 40, 256L) == 30) // cap
    for (target <- Seq(64L, 256L, 1000L); corpus <- Seq(1000L, 123456L)) {
      val p = Similarity.autoNPlanes(corpus, target)
      assert((corpus >> p) <= target, s"corpus=$corpus target=$target p=$p")
      if (p > 0) // minimality: one fewer plane would overflow the target
        assert(math.ceil(corpus / math.pow(2, p - 1)).toLong > target)
    }
  }

  test("autoK: smallest k holding expected cluster population at the " +
      "target (ceil(n/target)); kMin floor; monotone in n") {
    assert(Similarity.autoK(0L) == 1)
    assert(Similarity.autoK(1024L, 1024L) == 1)
    assert(Similarity.autoK(1025L, 1024L) == 2)
    assert(Similarity.autoK(10240L, 1024L) == 10)
    assert(Similarity.autoK(100L, 1024L, kMin = 8) == 8)
    for (target <- Seq(64L, 1024L); n <- Seq(1000L, 123456L)) {
      val k = Similarity.autoK(n, target)
      assert(n <= k.toLong * target, s"n=$n target=$target k=$k")
      if (k > 1) // minimality: one fewer cluster would overflow
        assert(n > (k - 1).toLong * target)
    }
    // 10× the corpus ≈ 10× the clusters — expected population flat
    assert(Similarity.autoK(20000L, 1024L) == 20)
    assert(Similarity.autoK(200000L, 1024L) == 196)
  }

  test("autoK production SemDeDup holds pairs-per-row ~flat at 4x the " +
      "corpus while fixed demo-k grows it ~4x (kmeansPairWork prices " +
      "both without running the quadratic stage)") {
    import graft.ops.Dedup
    val r = new scala.util.Random(7)
    def corpus(n: Int) = (0L until n.toLong).map { i =>
      (i, Array.fill(8)(r.nextGaussian().toFloat))
    }.toDF("vec_id", "embedding")
    val small = corpus(800).cache()
    val big = corpus(3200).cache()
    def pairsPerRow(vecs: org.apache.spark.sql.DataFrame, n: Long,
        k: Int): Double = {
      val cents = Similarity.kmeansIterate(vecs, "vec_id", "embedding",
        Similarity.fitIvfCentroids(vecs, "embedding", k, seed = 5),
        iters = 2)
      val pairs = Dedup.kmeansPairWork(vecs, "vec_id", "embedding",
        cents).agg(sum("cand_pairs")).as[Long].head()
      pairs.toDouble / n
    }
    val target = 100L
    val autoSmall = pairsPerRow(small, 800, Similarity.autoK(800, target))
    val autoBig = pairsPerRow(big, 3200, Similarity.autoK(3200, target))
    val fixedSmall = pairsPerRow(small, 800, 8)
    val fixedBig = pairsPerRow(big, 3200, 8)
    // fixed k: expected population 4x → pairs-per-row ~4x
    assert(fixedBig / fixedSmall > 2.5,
      s"fixed-k should grow ~4x: $fixedSmall -> $fixedBig")
    // autoK: expected population flat → pairs-per-row ~flat (Lloyd's
    // imbalance allowed for, but nowhere near the 4x of fixed k)
    assert(autoBig / autoSmall < 2.0,
      s"autoK should stay ~flat: $autoSmall -> $autoBig")
    assert(autoBig < fixedBig / 2,
      s"autoK must undercut fixed k at scale: $autoBig vs $fixedBig")
  }

  test("semanticDedupKmeansAuto: planted exact duplicates collapse to " +
      "min-id survivors; centroid count follows autoK; corpusSize " +
      "short-circuit gives the identical answer") {
    import graft.ops.Dedup
    val r = new scala.util.Random(11)
    val base = (0L until 300L).map { i =>
      (i, Array.fill(8)(r.nextGaussian().toFloat))
    }
    // ids 300..309 duplicate ids 0..9 exactly — same cluster always
    val dups = (0L until 10L).map(i => (300L + i, base(i.toInt)._2))
    val vecs = (base ++ dups).toDF("vec_id", "embedding")
    val (survivors, cents) = Dedup.semanticDedupKmeansAuto(vecs,
      "vec_id", "embedding", threshold = 0.999999,
      targetClusterSize = 64L, seed = 3)
    val kept = survivors.select("vec_id").as[Long].collect().toSet
    assert(kept.size == 300)
    (0L until 10L).foreach { i =>
      assert(kept.contains(i) && !kept.contains(300L + i)) }
    assert(cents.count() <= Similarity.autoK(310, 64L))
    val (s2, _) = Dedup.semanticDedupKmeansAuto(vecs, "vec_id",
      "embedding", threshold = 0.999999, targetClusterSize = 64L,
      corpusSize = 310L, seed = 3)
    assert(s2.select("vec_id").as[Long].collect().toSet == kept)
  }

  test("kCenterGreedy: farthest-point order, decreasing coverage radius, " +
      "duplicate of a selected center never chosen while distinct " +
      "points remain, ties toward smaller id") {
    import spark.implicits._
    // seed 0=+x; 1≈−x (farthest, d≈2); 2=+y and its exact duplicate 4
    // (d=1 from seed); 3≈+x (d≈0)
    val vecs = Seq(
      (0L, Array(1f, 0f, 0f, 0f)),
      (1L, Array(-1f, 0.01f, 0f, 0f)),
      (2L, Array(0f, 1f, 0f, 0f)),
      (3L, Array(1f, 0.01f, 0f, 0f)),
      (4L, Array(0f, 1f, 0f, 0f))).toDF("vec_id", "embedding")
    val out = Similarity.kCenterGreedy(vecs, "vec_id", "embedding",
      k = 4, seedId = 0L).as[(Int, Long, Double)].collect()
      .sortBy(_._1)
    // rank 3 is a tie between 2 and its duplicate 4 → smaller id;
    // rank 4 must be 3 (d>0), never 4 (d=0 once 2 is in)
    assert(out.map(_._2).toSeq == Seq(0L, 1L, 2L, 3L))
    val radii = out.map(_._3)
    assert(radii(0) == 0.0 && radii(1) > 1.9 &&
      radii(2) > 0.9 && radii(2) < 1.1 && radii(3) < 0.001)
    // coverage curve decreases after the seed row
    assert(radii.drop(1).sliding(2).forall(w => w(0) >= w(1)))
  }

  test("kCenterGreedy: exactly ONE Spark job per selection round " +
      "(the argmax aggregate carries the winner's vector — no second " +
      "lookup scan)") {
    import spark.implicits._
    val vecs = (0L until 32L)
      .map(i => (i, Array.tabulate(4)(j => math.sin(i * 7.0 + j).toFloat)))
      .toDF("vec_id", "embedding")
    def countJobs(group: String)(body: => Unit): Int = {
      spark.sparkContext.setJobGroup(group, group)
      try body finally spark.sparkContext.clearJobGroup()
      // the status store ingests listener events asynchronously —
      // poll until the count is stable
      var n = spark.sparkContext.statusTracker
        .getJobIdsForGroup(group).length
      var same = 0
      val deadline = System.nanoTime + 15L * 1000 * 1000 * 1000
      while (same < 5 && System.nanoTime < deadline) {
        Thread.sleep(50)
        val cur = spark.sparkContext.statusTracker
          .getJobIdsForGroup(group).length
        if (cur == n) same += 1 else { n = cur; same = 0 }
      }
      n
    }
    val j2 = countJobs("kcenter-k2") {
      Similarity.kCenterGreedy(vecs, "vec_id", "embedding", 2, 0L)
        .collect()
    }
    val j5 = countJobs("kcenter-k5") {
      Similarity.kCenterGreedy(vecs, "vec_id", "embedding", 5, 0L)
        .collect()
    }
    // fixed per-call overhead (checkpoint + seed lookup + result
    // collect) cancels in the delta: 3 extra rounds must cost exactly
    // 3 extra jobs
    assert(j5 - j2 == 3, s"jobs k=5: $j5, k=2: $j2")
  }

  test("rrfFuse: both-list ids beat single-list ids, exact 1/(K+r) " +
      "sums in list order, rounded-score ties break by id; " +
      "rankByScore matches (score DESC, id ASC)") {
    import spark.implicits._
    // list A ranks 1..3 = ids 10,11,12; list B ranks 1..3 = ids 11,13,10
    val a = Seq((10L, 1), (11L, 2), (12L, 3)).toDF("doc_id", "rank")
    val b = Seq((11L, 1), (13L, 2), (10L, 3)).toDF("doc_id", "rank")
    val out = Similarity.rrfFuse(Seq(a, b), "doc_id", "rank",
      kConst = 60, topN = 10)
      .as[(Long, Double, Int)].collect().sortBy(_._3)
    def c(r: Int) = 1.0 / (60.0 + r)
    val want = Map( // fused score per id, rounded to 6dp
      10L -> (c(1) + c(3)), 11L -> (c(2) + c(1)),
      12L -> c(3), 13L -> c(2))
      .view.mapValues(v => math.rint(v * 1e6) / 1e6).toMap
    assert(out.map(r => r._1 -> r._2).toMap == want)
    // 11 (ranks 2+1) ties 10 (ranks 1+3) at the raw level? No:
    // c(2)+c(1) > c(1)+c(3); both-list ids outrank single-list ids
    assert(out.map(_._1).toSeq == Seq(11L, 10L, 13L, 12L))
    // rankByScore: rank on score DESC, id ASC — equal scores → id
    val scored = Seq((5L, 2.0), (3L, 2.0), (9L, 7.0), (1L, 1.0))
      .toDF("id", "s")
    val ranked = Similarity.rankByScore(scored, "id", "s", k = 3)
      .as[(Long, Double, Int)].collect().sortBy(_._3)
    assert(ranked.map(r => (r._1, r._3)).toSeq ==
      Seq((9L, 1), (3L, 2), (5L, 3)))
  }

  test("contrastiveTriplets: positive = nearest same-label over the " +
    "threshold, negative = hardest other-label, both in-bucket; anchors " +
    "missing a side drop") {
    // everything lands in ONE bucket via a constant bucket fn, so the
    // semantics under test are the label/threshold/rank rules
    val one: org.apache.spark.sql.Column => org.apache.spark.sql.Column =
      _ => lit(0L)
    val a = Array(1.0, 0.0, 0.0)
    val aNear = Array(0.98, 0.2, 0.0) // same label, cos ~ .98
    val aFar = Array(0.5, 0.86, 0.0) // same label, cos ~ .5
    val nHard = Array(0.9, 0.0, 0.44) // other label, cos ~ .9
    val nEasy = Array(0.0, 0.0, 1.0) // other label, cos 0
    val lone = Array(-1.0, 0.0, 0.0) // label with no same-label peer
    val df = Seq(
      (1L, a, "x"), (2L, aNear, "x"), (3L, aFar, "x"),
      (4L, nHard, "y"), (5L, nEasy, "y"), (9L, lone, "z"))
      .toDF("vec_id", "embedding", "label")
    val got = Similarity.contrastiveTriplets(df, "vec_id", "embedding",
        "label", posThreshold = 0.4, bucketFn = Some(one))
      .as[(Long, Long, Long, Double, Double, Double)].collect()
      .map(t => t._1 -> t).toMap
    // anchor 1: positive is the NEAREST same-label (2, not 3);
    // negative is the HARDEST other-label (4, not 5)
    assert(got(1L)._2 == 2L && got(1L)._3 == 4L)
    assert(got(1L)._6 == got(1L)._4 - got(1L)._5)
    // anchor 9 has no same-label peer → no triplet
    assert(!got.contains(9L))
    // anchor 3's positive must clear the threshold: cos(3,1)=.5 ≥ .4 ok
    assert(got.contains(3L))
  }
}
