package graft.ops

import graft.expressions.VectorFunctions
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Approximate-nearest-neighbor search over an embedding column
  * (north-star extension).
  *
  * Baseline: brute-force cosine top-k — a broadcast of the (small) query set
  * against the full corpus: embarrassingly parallel, zero shuffle on the
  * corpus side, one shuffle for the per-query top-k. Scale path: IVF — a
  * coarse k-means-style partition by nearest centroid so each query probes
  * only its closest `nProbe` cells — and random-hyperplane LSH bucketing.
  */
object Similarity {

  /** Per-query top-k of a scored candidate relation via the
    * map-side-combinable [[graft.expressions.TopKByScoreAgg]]: the map
    * side keeps ≤ k pairs per query per partition, so the ONE exchange
    * carries ≤ partitions×|queries|×k rows — independent of candidate
    * count. The window form this replaces (`row_number() OVER
    * (PARTITION BY query ORDER BY cos DESC, id)`) shuffled EVERY scored
    * candidate to its query's reducer first — |corpus|×|queries| wire
    * rows for the brute-force path. Output rows are identical (top-k
    * under the total order (cos DESC, id ASC) is merge-order-invariant;
    * spec-pinned); the one divergence is null scores, which the window
    * form could surface at the tail of under-full groups and the
    * aggregate skips — null cosines only arise from mixed-dimension
    * corpora, which are a data bug. */
  private def rankTopK(scored: DataFrame, qIdCol: String, idCol: String,
      k: Int): DataFrame =
    scored.groupBy(qIdCol)
      .agg(graft.expressions.AggregateFunctions
        .topKByScore(col("cos"), col(idCol).cast("long"), k).as("__top"))
      .select(col(qIdCol),
        posexplode(col("__top")).as(Seq("__pos", "__s")))
      .select(col(qIdCol), col("__s.id").as(idCol),
        col("__s.score").as("cos"),
        (col("__pos") + 1).cast("int").as("rank"))

  /** Brute-force cosine top-k: for each query vector, the k nearest corpus
    * vectors. Queries must be small enough to broadcast (the usual shape:
    * thousands of queries against billions of corpus rows).
    *
    * Plan at scale: `broadcast(queries)` → BroadcastNestedLoopJoin (a pure
    * map-side cross product, corpus scanned once, no corpus shuffle) → the
    * native CosineSimilarity expression (codegen) → per-query top-k via
    * [[rankTopK]]: one k-bounded partial-aggregated exchange whose key
    * cardinality = |queries| and whose wire volume is
    * corpus-size-independent.
    */
  def bruteForceTopK(corpus: DataFrame, queries: DataFrame,
      idCol: String, vecCol: String, qIdCol: String, qVecCol: String,
      k: Int): DataFrame = {
    val scored = corpus.crossJoin(broadcast(queries))
      .select(col(qIdCol), col(idCol),
        VectorFunctions.cosineSimilarity(col(qVecCol), col(vecCol))
          .as("cos"))
    rankTopK(scored, qIdCol, idCol, k)
  }

  /** Recall@k of an approximate ANN result against exact ground truth —
    * the standard index-quality metric (what an IVF/LSH tuning loop
    * optimizes). Both inputs follow the topK contract (qIdCol, idCol,
    * rank); queries are few by construction, so the join is
    * broadcast-sized. Ground-truth queries missing entirely from `approx`
    * (empty probe bucket) still report recall 0 via the left join. */
  def recallAtK(approx: DataFrame, exact: DataFrame, qIdCol: String,
      idCol: String, k: Int): DataFrame =
    exact.filter(col("rank") <= k).select(col(qIdCol), col(idCol))
      .join(approx.filter(col("rank") <= k)
          .select(col(qIdCol), col(idCol), lit(1L).as("__hit")),
        Seq(qIdCol, idCol), "left")
      .groupBy(qIdCol)
      .agg((sum(coalesce(col("__hit"), lit(0L))).cast("double") / k)
        .as("recall"))

  /** Sign-bucket of `nPlanes` pseudo-random hyperplane dot products.
    * Hyperplane components are seeded xxhash64 draws mapped to ±1 — fully
    * deterministic, no stored model, identical on every executor. Native
    * expression with the sign table precomputed (bit-identical to the
    * composable aggregate-over-sequence form, which paid nPlanes×dim
    * interpreted lambda evaluations per row). */
  def hyperplaneBucket(v: Column, nPlanes: Int, dim: Int, seed: Long)
      : Column =
    VectorFunctions.hyperplaneBucket(v, nPlanes, dim, seed)

  /** LSH-bucketed ANN: corpus and queries bucketed by hyperplane signs; each
    * query joins only its bucket (equi-join, hash-partitioned — the 100 TB
    * path when queries are too many to broadcast). Recall is tunable via
    * nPlanes (fewer planes → bigger buckets → higher recall, more compute).
    * Returns per-query top-k within the probed bucket.
    *
    * `bucketFn` overrides the bucketing family (default: the seeded
    * xxhash64 hyperplane signs). The override exists for engine-portable
    * REPLAYABLE families (the q75/q78/q79 twin discipline): a bucket
    * derived from integer-only replayable hashes lets an external oracle
    * reproduce the bucketing bit-for-bit, so the whole lshTopK pipeline is
    * hash-checkable — everything downstream of the bucket column is
    * identical production code. */
  def lshTopK(corpus: DataFrame, queries: DataFrame,
      idCol: String, vecCol: String, qIdCol: String, qVecCol: String,
      k: Int, nPlanes: Int = 8, dim: Int = 64, seed: Long = 7,
      bucketFn: Option[Column => Column] = None)
      : DataFrame = {
    val bucket: Column => Column =
      bucketFn.getOrElse(v => hyperplaneBucket(v, nPlanes, dim, seed))
    val c = corpus.withColumn("bucket", bucket(col(vecCol)))
    val q = queries.withColumn("bucket", bucket(col(qVecCol)))
    val scored = q.join(c, Seq("bucket"))
      .select(col(qIdCol), col(idCol),
        VectorFunctions.cosineSimilarity(col(qVecCol), col(vecCol))
          .as("cos"))
    rankTopK(scored, qIdCol, idCol, k)
  }

  /** Fit IVF centroids — the coarse quantizer. The FAISS training idiom:
    * ONE distributed job draws a deterministic sample (xxhash64-ranked
    * TakeOrdered — no RNG, stable across runs/partitionings), then
    * Lloyd's iterations run on the DRIVER over that sample. Cluster-side
    * k-means (MLlib) costs 1-2 jobs PER ITERATION; at any corpus size the
    * quantizer only ever needs a bounded sample (centroid quality is a
    * property of the distribution, not the corpus cardinality), so the
    * scan is the only distributed work. Returns a small local table
    * (centroid_id LONG, c_vec ARRAY<DOUBLE>) that broadcasts into
    * `ivfAssign` with zero extra jobs. */
  def fitIvfCentroids(vecs: DataFrame, vecCol: String, k: Int,
      seed: Long = 42, maxIter: Int = 20, maxSample: Int = 1 << 16)
      : DataFrame = {
    val sample: Array[Array[Double]] = vecs
      .select(col(vecCol).cast("array<double>").as("v"))
      .filter(col("v").isNotNull)
      .orderBy(xxhash64(lit(seed), col("v")))
      .limit(maxSample)
      .collect()
      .map(_.getSeq[Double](0).toArray)
    require(sample.nonEmpty, "fitIvfCentroids: no non-null vectors")
    val dim = sample.head.length
    val kk = math.min(k, sample.length)
    // splitmix-seeded DISTINCT initial sample indices (plan-free
    // determinism): walk the stream skipping repeats — raw modulo draws
    // collide, which would leave permanently-duplicated centroids (a
    // duplicate center attracts no points under strict '<' and never
    // moves).
    val usedIdx = scala.collection.mutable.LinkedHashSet.empty[Int]
    var draw = 0L
    while (usedIdx.size < kk) {
      val h = graft.core.Hashing.splitmix64(seed + draw)
      usedIdx += (((h % sample.length) + sample.length) % sample.length)
        .toInt
      draw += 1
    }
    val centers = usedIdx.toArray.map(i => sample(i).clone)
    var iter = 0
    var moved = true
    while (iter < maxIter && moved) {
      val sums = Array.fill(kk)(new Array[Double](dim))
      val counts = new Array[Long](kk)
      sample.foreach { v =>
        var best = 0; var bestD = Double.MaxValue
        var c = 0
        while (c < kk) {
          var d = 0.0; var j = 0
          while (j < dim) { val t = v(j) - centers(c)(j); d += t * t; j += 1 }
          if (d < bestD) { bestD = d; best = c }
          c += 1
        }
        counts(best) += 1
        var j = 0
        while (j < dim) { sums(best)(j) += v(j); j += 1 }
      }
      moved = false
      var c = 0
      while (c < kk) {
        if (counts(c) > 0) {
          var j = 0
          while (j < dim) {
            val m = sums(c)(j) / counts(c)
            if (m != centers(c)(j)) { centers(c)(j) = m; moved = true }
            j += 1
          }
        }
        c += 1
      }
      iter += 1
    }
    import scala.jdk.CollectionConverters._
    vecs.sparkSession.createDataFrame(
      centers.toIndexedSeq.zipWithIndex.map { case (c, i) =>
        org.apache.spark.sql.Row(i.toLong, c.toIndexedSeq) }.asJava,
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("centroid_id",
          org.apache.spark.sql.types.LongType, nullable = false),
        org.apache.spark.sql.types.StructField("c_vec",
          org.apache.spark.sql.types.ArrayType(
            org.apache.spark.sql.types.DoubleType)))))
  }

  /** IVF (inverted-file) index: assign every corpus vector to its nearest
    * of `centroids` (a small table (centroid_id, vec)); queries probe
    * their `nProbe` nearest cells only. Centroids typically come from a
    * sample + k-means (`fitIvfCentroids`); any small table works.
    *
    * Plan shape: the quantizer is k-sized BY CONSTRUCTION (k cells, a
    * distribution property — never corpus-sized), so it is collected
    * once and embedded in the native [[graft.expressions.NearestCentroids]]
    * expression: assignment is a pure narrow projection, ZERO exchanges.
    * The previous crossJoin(broadcast)+window form expanded the corpus
    * k-fold and shuffled that expansion by vector id just to rank k
    * rows born co-located — wire volume that dwarfs the assignment
    * arithmetic at 100 TB. Ordering/tie-break (cos DESC, centroid_id
    * ASC) and FP accumulation match the window form bit-for-bit
    * (equivalence spec-pinned; q126 replays it in SQL). Rows with null
    * vectors are dropped (the window form ranked them via null
    * cosines — an accident, not a contract). */
  def ivfAssign(vecs: DataFrame, idCol: String, vecCol: String,
      centroids: DataFrame, cIdCol: String, cVecCol: String,
      nProbe: Int = 1): DataFrame = {
    val rows = centroids
      .select(col(cIdCol).cast("long"),
        col(cVecCol).cast("array<double>"))
      .collect()
      .sortBy(_.getLong(0)) // id-sorted iteration = id-ASC tie-break
    require(rows.nonEmpty, "ivfAssign: empty centroid table")
    val ids = rows.map(_.getLong(0))
    val cvs = rows.map(_.getSeq[Double](1).toArray)
    vecs
      .select(col("*"),
        posexplode(VectorFunctions.nearestCentroids(col(vecCol), ids,
          cvs, nProbe)).as(Seq("__probe_pos", cIdCol)))
      .withColumn("probe_rank", (col("__probe_pos") + 1).cast("int"))
      .drop("__probe_pos")
  }

  /** Full IVF ANN: corpus in 1 cell each, queries probe `nProbe` cells,
    * exact cosine + top-k inside the probed cells only — the shuffle is an
    * equi-join on centroid_id instead of a corpus-wide cross product. */
  def ivfTopK(corpus: DataFrame, queries: DataFrame,
      idCol: String, vecCol: String, qIdCol: String, qVecCol: String,
      centroids: DataFrame, k: Int, nProbe: Int = 2): DataFrame = {
    val c = ivfAssign(corpus, idCol, vecCol, centroids, "centroid_id",
      "c_vec", nProbe = 1).drop("probe_rank")
    val q = ivfAssign(queries, qIdCol, qVecCol, centroids, "centroid_id",
      "c_vec", nProbe = nProbe).drop("probe_rank")
    val scored = q.join(c, Seq("centroid_id"))
      .select(col(qIdCol), col(idCol),
        VectorFunctions.cosineSimilarity(col(qVecCol), col(vecCol))
          .as("cos"))
    rankTopK(scored, qIdCol, idCol, k)
  }
}
