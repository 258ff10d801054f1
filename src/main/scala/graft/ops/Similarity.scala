package graft.ops

import graft.expressions.VectorFunctions
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
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

  /** Brute-force cosine top-k: for each query vector, the k nearest corpus
    * vectors. Queries must be small enough to broadcast (the usual shape:
    * thousands of queries against billions of corpus rows).
    *
    * Plan at scale: `broadcast(queries)` → BroadcastNestedLoopJoin (a pure
    * map-side cross product, corpus scanned once, no corpus shuffle) → the
    * native CosineSimilarity expression (codegen) → per-query top-k via
    * row_number over a window partitioned by query id: ONE shuffle whose key
    * cardinality = |queries|.
    */
  def bruteForceTopK(corpus: DataFrame, queries: DataFrame,
      idCol: String, vecCol: String, qIdCol: String, qVecCol: String,
      k: Int): DataFrame = {
    val scored = corpus.crossJoin(broadcast(queries))
      .select(col(qIdCol), col(idCol),
        VectorFunctions.cosineSimilarity(col(qVecCol), col(vecCol))
          .as("cos"))
    val w = Window.partitionBy(qIdCol).orderBy(desc("cos"), col(idCol))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
  }

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
    * Returns per-query top-k within the probed bucket. */
  def lshTopK(corpus: DataFrame, queries: DataFrame,
      idCol: String, vecCol: String, qIdCol: String, qVecCol: String,
      k: Int, nPlanes: Int = 8, dim: Int = 64, seed: Long = 7)
      : DataFrame = {
    val c = corpus.withColumn("bucket",
      hyperplaneBucket(col(vecCol), nPlanes, dim, seed))
    val q = queries.withColumn("bucket",
      hyperplaneBucket(col(qVecCol), nPlanes, dim, seed))
    val scored = q.join(c, Seq("bucket"))
      .select(col(qIdCol), col(idCol),
        VectorFunctions.cosineSimilarity(col(qVecCol), col(vecCol))
          .as("cos"))
    val w = Window.partitionBy(qIdCol).orderBy(desc("cos"), col(idCol))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
  }

  /** Fit IVF centroids with MLlib KMeans over (a sample of) the corpus —
    * the standard coarse quantizer. Returns a small driver-built table
    * (centroid_id LONG, c_vec ARRAY<DOUBLE>) ready to broadcast into
    * `ivfAssign`. At 100 TB fit on `vecs.sample(...)`; KMeans cost is
    * O(sample × k × iters) and the model is k×dim doubles. */
  def fitIvfCentroids(vecs: DataFrame, vecCol: String, k: Int,
      seed: Long = 42, maxIter: Int = 20): DataFrame = {
    import org.apache.spark.ml.clustering.KMeans
    import org.apache.spark.ml.functions.array_to_vector
    val feats = vecs.select(
      array_to_vector(col(vecCol).cast("array<double>")).as("features"))
    val model = new KMeans().setK(k).setSeed(seed).setMaxIter(maxIter)
      .fit(feats)
    val spark = vecs.sparkSession
    import spark.implicits._
    model.clusterCenters.zipWithIndex
      .map { case (c, i) => (i.toLong, c.toArray) }.toSeq
      .toDF("centroid_id", "c_vec")
  }

  /** IVF (inverted-file) index: assign every corpus vector to its nearest
    * of `centroids` (a small broadcast table (centroid_id, vec)); queries
    * probe their `nProbe` nearest cells only. Centroids typically come from
    * a sample + k-means (`fitIvfCentroids`); any small table works. */
  def ivfAssign(vecs: DataFrame, idCol: String, vecCol: String,
      centroids: DataFrame, cIdCol: String, cVecCol: String,
      nProbe: Int = 1): DataFrame = {
    val scored = vecs.crossJoin(broadcast(centroids))
      .withColumn("cdist",
        -VectorFunctions.cosineSimilarity(col(vecCol), col(cVecCol)))
    val w = Window.partitionBy(idCol).orderBy(col("cdist"), col(cIdCol))
    scored.withColumn("probe_rank", row_number().over(w))
      .filter(col("probe_rank") <= nProbe)
      .drop(cVecCol, "cdist")
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
    val w = Window.partitionBy(qIdCol).orderBy(desc("cos"), col(idCol))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
  }
}
