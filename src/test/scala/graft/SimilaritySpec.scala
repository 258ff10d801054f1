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
}
