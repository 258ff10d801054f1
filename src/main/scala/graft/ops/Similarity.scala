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

  /** Global top-k rank by (`scoreCol` DESC, `idCol` ASC) via the same
    * k-bounded aggregate — the single-list form of [[rankTopK]] for
    * ranking a retrieval result without a corpus-wide unpartitioned
    * window: the map side keeps ≤ k rows per partition, the one
    * exchange carries ≤ partitions×k rows. Pass an already-rounded
    * score when cross-engine rank stability matters (the q222 rule). */
  def rankByScore(df: DataFrame, idCol: String, scoreCol: String,
      k: Int): DataFrame =
    rankTopK(df.select(lit(1L).as("__q"), col(idCol),
        col(scoreCol).cast("double").as("cos")), "__q", idCol, k)
      .select(col(idCol), col("cos").as(scoreCol), col("rank"))

  /** Reciprocal Rank Fusion (Cormack, Clarke & Büttcher, SIGIR 2009):
    * fuse N ranked retrieval lists by Σ_lists 1/(K + rank) — the
    * standard hybrid-search combiner (sparse BM25 ⊕ dense ANN) because
    * it needs no score calibration, only ranks. Each input carries
    * (`idCol`, `rankCol`); absent ids contribute 0 from that list.
    *
    * Determinism: contributions are summed in FIXED list order over a
    * full-outer join fold (no data-order FP accumulation), the fused
    * score is rounded to 6 dp, and the output rank runs on the ROUNDED
    * score (ties → id ASC) via the k-bounded aggregate — no
    * unpartitioned window, and the joins are k·|lists|-row sized
    * regardless of corpus size. */
  def rrfFuse(lists: Seq[DataFrame], idCol: String, rankCol: String,
      kConst: Int = 60, topN: Int = 10): DataFrame = {
    require(lists.nonEmpty, "rrfFuse needs at least one ranked list")
    val prepared = lists.zipWithIndex.map { case (df, i) =>
      df.select(col(idCol),
        (lit(1.0) / (lit(kConst.toDouble) + col(rankCol).cast("double")))
          .as(s"__c$i"))
    }
    val joined = prepared.reduce(_.join(_, Seq(idCol), "full_outer"))
    val fused = joined.select(col(idCol),
      round(prepared.indices
          .map(i => coalesce(col(s"__c$i"), lit(0.0))).reduce(_ + _), 6)
        .as("rrf"))
    rankByScore(fused, idCol, "rrf", topN)
  }

  /** Greedy k-center / farthest-point traversal (Gonzalez, TCS 1985 —
    * the 2-approximation; the coreset-style DIVERSITY selection used to
    * pick maximally-spread exemplars from an embedded corpus, dual to
    * SemDeDup's remove-the-close): start from `seedId`, repeatedly add
    * the point FARTHEST (cosine distance, 1 − cos) from everything
    * selected so far. Returns the selection trace
    * (sel_rank, center_id, radius): radius at rank r is the max-min
    * coverage distance BEFORE adding that center — the classic
    * decreasing coverage curve.
    *
    * Scale shape: ONE Spark job per selection round (k−1 rounds; spec-
    * pinned by SimilaritySpec's job-counter test) over a
    * localCheckpointed narrow (id, vec) projection — the argmax is a
    * single reduce whose payload CARRIES the winner's vector, so no
    * second lookup scan exists and the per-round driver traffic is ≤ 1
    * row per partition (an SQL aggregate would be the same scan but
    * AQE materializes its exchange as an extra job). Selection state
    * is k vectors (never a cached corpus-sized structure); each scan
    * is a narrow projection (min over ≤k broadcast-literal cosines,
    * exact picks — no FP accumulation across rows). Cosines round to
    * 6 dp BEFORE 1−cos and the argmax (the q222 rule); argmax ties
    * break toward the smaller id on both engine sides (ordering by
    * (d, −id) ≡ rank by d DESC, id ASC). */
  def kCenterGreedy(vecs: DataFrame, idCol: String, vecCol: String,
      k: Int, seedId: Long): DataFrame = {
    require(k >= 1, s"kCenterGreedy: k must be >= 1: $k")
    val spark = vecs.sparkSession
    import spark.implicits._
    // materialized ONCE: every selection round re-scans this relation,
    // so without the checkpoint each round would re-read the source
    val e = vecs.filter(col(vecCol).isNotNull)
      .select(col(idCol).cast("long").as("__id"),
        col(vecCol).cast("array<double>").as("__v"))
      .localCheckpoint(true)
    def vecOf(id: Long): Array[Double] = {
      val rows = e.filter(col("__id") === id).select("__v").head(1)
      require(rows.nonEmpty, s"kCenterGreedy: no row with $idCol=$id")
      rows.head.getSeq[Double](0).toArray
    }
    var selected = Vector((seedId, vecOf(seedId), 0.0))
    while (selected.length < k) {
      val dmin = selected
        .map { case (_, c, _) =>
          lit(1.0) - round(VectorFunctions.cosineSimilarity(col("__v"),
            typedLit(c.toSeq)), 6)
        }
        .reduce(least(_, _))
      // jobs-per-round = 1: winner id, radius AND vector come back in
      // one reduce job (max by (d, −id) — farthest first, ties to the
      // smaller id, exactly rankByScore's (score DESC, id ASC) rule)
      val win = e.select(dmin.as("d"), col("__id"), col("__v"))
        .as[(Double, Long, Array[Double])]
        .rdd
        .max()(Ordering.by((t: (Double, Long, Array[Double])) =>
          (t._1, -t._2)))
      selected :+= ((win._2, win._3, win._1))
    }
    selected.zipWithIndex
      .map { case ((id, _, r), i) => (i + 1, id, r) }
      .toDF("sel_rank", "center_id", "radius")
  }

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

  /** Embedding-space eval-set decontamination: for every corpus row,
    * the nearest eval vector by cosine and a contamination flag at
    * `threshold` — the semantic companion to n-gram/Bloom decontam
    * (a paraphrased benchmark item shares no 8-gram but sits next to
    * its source in embedding space).
    *
    * 100 TB shape: eval suites are SMALL by construction (benchmark
    * items, not corpora), so the eval side broadcasts and the corpus
    * never moves — `crossJoin(broadcast(...))` scans each corpus
    * partition in place; the only exchange is the final per-corpus-row
    * max (one compact row per corpus row, hash-combined map-side). The
    * result is EXACT (no LSH recall loss), which is what a removal
    * audit needs. Ties on cosine break toward the larger eval id via
    * the max-over-struct total order.
    *
    * Engine-portability: the cosine is rounded to 6 dp INSIDE the
    * max struct, so the argmax, the reported max_cos, and the
    * threshold compare all see the same rounded value — an ulp-level
    * accumulation difference between engines (index-order fold here
    * vs another engine's vectorized sum) can no longer flip
    * `near_eval_id` or `contaminated` near the threshold; ties at
    * equal rounded cosine break deterministically via eval id.
    *
    * Size routing: the broadcast-NL plan is O(|corpus|·|eval|) dot
    * products and ships the whole eval set to every task — the right
    * plan ONLY while the eval side is eval-suite-sized. Above
    * `maxBroadcastEval` rows (default 2¹⁷ ≈ 33 MB of 64-dim floats)
    * the operator routes itself through the hyperplane-bucket
    * machinery instead: both sides bucket by seeded hyperplane signs,
    * candidates meet in an EQUI-join (hash-partitioned — never a
    * cross product), and the per-row max is exact over the candidate
    * set. That path is approximate in coverage (a cross-bucket
    * nearest neighbor is missed — the LSH recall trade, tunable via
    * `nPlanes`) but every reported cosine is exact, and corpus rows
    * with an empty probe bucket still surface with a null max_cos
    * and `contaminated = false` rather than disappearing. */
  def decontaminateByEmbedding(corpus: DataFrame, evalSet: DataFrame,
      idCol: String, vecCol: String, evalIdCol: String,
      evalVecCol: String, threshold: Double,
      maxBroadcastEval: Long = 1L << 17, nPlanes: Int = 8,
      dim: Int = 64, seed: Long = 7): DataFrame = {
    def argmax(pairs: DataFrame, evalId: Column, cos: Column): DataFrame =
      pairs
        .select(col(idCol),
          struct(round(cos, 6).as("cos"), evalId.as("eid")).as("p"))
        .groupBy(idCol)
        .agg(max(col("p")).as("m"))
    if (evalSet.count() <= maxBroadcastEval) {
      argmax(corpus.crossJoin(broadcast(evalSet)),
        col(evalIdCol),
        VectorFunctions.cosineSimilarity(col(vecCol), col(evalVecCol)))
        .select(col(idCol), col("m.eid").as("near_eval_id"),
          col("m.cos").as("max_cos"),
          (col("m.cos") >= threshold).as("contaminated"))
    } else {
      val c = corpus.withColumn("__bkt",
        hyperplaneBucket(col(vecCol), nPlanes, dim, seed))
      val e = evalSet.withColumn("__bkt",
        hyperplaneBucket(col(evalVecCol), nPlanes, dim, seed))
      val scored = argmax(c.join(e, Seq("__bkt")),
        col(evalIdCol),
        VectorFunctions.cosineSimilarity(col(vecCol), col(evalVecCol)))
      // no-candidate corpus rows re-enter via the id-keyed left join
      // (the third and last exchange of this path: bucket join,
      // candidate collapse, id join — the honest cost of an eval set
      // too big to broadcast)
      corpus.select(col(idCol))
        .join(scored, Seq(idCol), "left")
        .select(col(idCol), col("m.eid").as("near_eval_id"),
          col("m.cos").as("max_cos"),
          coalesce(col("m.cos") >= threshold, lit(false))
            .as("contaminated"))
    }
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

  /** k-NN GRAPH over a vector corpus (the SemDeDup / clustering /
    * graph-dedup prerequisite — every vector's k nearest neighbors,
    * not a query set's): bucket by hyperplane signs, cosine top-k
    * INSIDE each bucket per source vector, self excluded. The
    * self-join is an equi-join on the bucket key — never an all-pairs
    * product — and the rank is the map-side-combinable top-k
    * aggregate, so the one exchange carries ≤ partitions·|V|·k rows.
    * Recall follows the LSH-band profile (cross-bucket neighbors are
    * missed — [[recallAtK]] measures the trade); bucket population is
    * corpus/2^nPlanes, the in-bucket quadratic cost lever. */
  /** Per-dimension corpus means on the integer lattice (the
    * [[kmeansStep]] M-step idiom applied to the whole corpus): each
    * component quantizes to floor(x·scale + 0.5) and sums as exact
    * integers — order-invariant across any partitioning, so the means
    * are bit-replayable where a naive FP sum drifts with merge order.
    * ONE partial-aggregatable (dim) exchange, ≤ dim rows out; the
    * result broadcasts into centering/whitening transforms (mean
    * subtraction is the standard ANN-quality fix for embedding
    * corpora with a dominant common direction). */
  def dimMeansLattice(vecs: DataFrame, idCol: String, vecCol: String,
      scale: Double = 1e6): DataFrame =
    vecs.select(posexplode(col(vecCol)).as(Seq("dim", "x")))
      .groupBy("dim")
      .agg(sum(floor(col("x").cast("double") * scale + 0.5)
          .cast("long")).as("qsum"),
        count(lit(1)).as("n"))
      .select(col("dim"),
        (col("qsum").cast("double") / (col("n").cast("double") * scale))
          .as("mean"))

  /** Size the in-bucket cost lever instead of guessing it: smallest
    * nPlanes whose EXPECTED bucket population corpus/2^nPlanes is ≤
    * `targetBucket`. The corpus-self shapes ([[knnGraph]],
    * [[hardNegatives]]) pay |bucket|² per bucket, so holding the
    * bucket population CONSTANT as the corpus grows keeps per-bucket
    * work flat and total work linear — the measured sf0.1→sf1
    * super-linear scaling of both queries is exactly a fixed nPlanes
    * letting buckets grow 10×. Callers pass the corpus count (a
    * 1-row agg they usually already have); recall shifts with nPlanes,
    * so [[recallAtK]] re-measures after a re-size. */
  def autoNPlanes(corpusSize: Long, targetBucket: Long = 256L): Int = {
    require(targetBucket >= 1, s"targetBucket must be >= 1: $targetBucket")
    var p = 0
    var pop = math.max(0L, corpusSize)
    while (pop > targetBucket && p < 30) { pop = (pop + 1) / 2; p += 1 }
    p
  }

  /** Size the k-means cluster count instead of guessing it — the
    * production parameterization of every within-cluster-quadratic
    * consumer ([[graft.ops.Dedup.embeddingNearDupsKmeans]] first):
    * smallest k whose EXPECTED cluster population corpusSize/k is ≤
    * `targetClusterSize`, i.e. ceil(n / target). With fixed k the
    * per-cluster pair work grows quadratically in the corpus (measured
    * 99.6× pairs at 10× data for the q239 demo-k); holding the
    * expected population constant holds pairs-per-row ~constant
    * ((target−1)/2 under balance) and total pair work ~linear — the
    * SemDeDup paper's own regime (Abbas et al. 2303.09540 run k ≈ √n
    * scale-ups for exactly this reason). `kMin` floors the answer for
    * corpora smaller than one target cluster. The companion exact
    * work counter is [[graft.ops.Dedup.kmeansPairWork]]; recall/dup-
    * coverage shifts with k, so re-measure after a re-size (the
    * [[autoNPlanes]] discipline). */
  def autoK(corpusSize: Long, targetClusterSize: Long = 1024L,
      kMin: Int = 1): Int = {
    require(targetClusterSize >= 1,
      s"targetClusterSize must be >= 1: $targetClusterSize")
    require(kMin >= 1, s"kMin must be >= 1: $kMin")
    val n = math.max(0L, corpusSize)
    val k = (n + targetClusterSize - 1) / targetClusterSize
    math.max(kMin.toLong, math.min(k, Int.MaxValue.toLong)).toInt
  }

  def knnGraph(vecs: DataFrame, idCol: String, vecCol: String, k: Int,
      nPlanes: Int = 8, dim: Int = 64, seed: Long = 7,
      bucketFn: Option[Column => Column] = None): DataFrame = {
    val bucket: Column => Column =
      bucketFn.getOrElse(v => hyperplaneBucket(v, nPlanes, dim, seed))
    val c = vecs.select(col(idCol), col(vecCol))
      .withColumn("bucket", bucket(col(vecCol)))
    val a = c.select(col("bucket"), col(idCol).as("src_id"),
      col(vecCol).as("__sv"))
    val b = c.select(col("bucket"), col(idCol).as("dst_id"),
      col(vecCol).as("__dv"))
    val scored = a.join(b, Seq("bucket"))
      .filter(col("src_id") =!= col("dst_id"))
      .select(col("src_id"), col("dst_id"),
        VectorFunctions.cosineSimilarity(col("__sv"), col("__dv"))
          .as("cos"))
    rankTopK(scored, "src_id", "dst_id", k)
  }

  /** Hard-negative mining for contrastive training (the DPR/SimCSE
    * data-prep stage): for each anchor, the k most-SIMILAR vectors
    * carrying a DIFFERENT label — the negatives a contrastive loss
    * learns most from, vs the uninformative random negatives uniform
    * sampling yields. Exactly [[knnGraph]]'s never-all-pairs shape
    * (bucket equi-join bounds candidates, map-side-combinable top-k
    * bounds the rank exchange) with the label-mismatch predicate
    * applied BEFORE ranking, so same-label neighbors never consume
    * rank slots. Returns (anchor_id, neg_id, rank). */
  def hardNegatives(vecs: DataFrame, idCol: String, vecCol: String,
      labelCol: String, k: Int, nPlanes: Int = 8, dim: Int = 64,
      seed: Long = 7, bucketFn: Option[Column => Column] = None)
      : DataFrame = {
    val bucket: Column => Column =
      bucketFn.getOrElse(v => hyperplaneBucket(v, nPlanes, dim, seed))
    val c = vecs.select(col(idCol), col(vecCol), col(labelCol))
      .withColumn("bucket", bucket(col(vecCol)))
    val a = c.select(col("bucket"), col(idCol).as("anchor_id"),
      col(vecCol).as("__av"), col(labelCol).as("__al"))
    val b = c.select(col("bucket"), col(idCol).as("neg_id"),
      col(vecCol).as("__nv"), col(labelCol).as("__nl"))
    val scored = a.join(b, Seq("bucket"))
      .filter(col("__al") =!= col("__nl"))
      .select(col("anchor_id"), col("neg_id"),
        VectorFunctions.cosineSimilarity(col("__av"), col("__nv"))
          .as("cos"))
    rankTopK(scored, "anchor_id", "neg_id", k)
      .select("anchor_id", "neg_id", "rank")
  }

  /** Contrastive TRIPLET mining — the training-pair construction step
    * for embedding-model fine-tuning (SimCSE/SBERT data prep): per
    * anchor, pair its nearest SAME-label in-bucket neighbor at
    * `round6(cos) ≥ posThreshold` (the positive) with its hardest
    * DIFFERENT-label in-bucket neighbor ([[hardNegatives]], the
    * negative that actually carries gradient), emitting both cosines
    * and the triplet margin. Anchors missing either side drop — a
    * triplet needs both. Candidate generation is the same LSH
    * bucket equi-join as q154/q171 (never all-pairs); the positive
    * rank orders on the ALREADY-ROUNDED cosine (the q222 rule), id
    * ASC ties. */
  def contrastiveTriplets(vecs: DataFrame, idCol: String,
      vecCol: String, labelCol: String, posThreshold: Double,
      nPlanes: Int = 8, dim: Int = 64, seed: Long = 7,
      bucketFn: Option[Column => Column] = None): DataFrame = {
    val bucket: Column => Column =
      bucketFn.getOrElse(v => hyperplaneBucket(v, nPlanes, dim, seed))
    val c = vecs.select(col(idCol), col(vecCol), col(labelCol))
      .withColumn("bucket", bucket(col(vecCol)))
    val a = c.select(col("bucket"), col(idCol).as("anchor_id"),
      col(vecCol).as("__av"), col(labelCol).as("__al"))
    val p = c.select(col("bucket"), col(idCol).as("pos_id"),
      col(vecCol).as("__pv"), col(labelCol).as("__pl"))
    val posScored = a.join(p, Seq("bucket"))
      .filter(col("__al") === col("__pl") &&
        col("anchor_id") =!= col("pos_id"))
      .select(col("anchor_id"), col("pos_id"),
        round(VectorFunctions.cosineSimilarity(col("__av"), col("__pv")),
          6).as("pos_cos"))
      .filter(col("pos_cos") >= posThreshold)
    val pos = rankTopK(posScored.withColumnRenamed("pos_cos", "cos"),
        "anchor_id", "pos_id", 1)
      .filter(col("rank") === 1)
      .select(col("anchor_id"), col("pos_id"), col("cos").as("pos_cos"))
    val neg = hardNegatives(vecs, idCol, vecCol, labelCol, k = 1,
        nPlanes, dim, seed, bucketFn)
      .filter(col("rank") === 1)
      .select(col("anchor_id"), col("neg_id"))
    val vlook = vecs.select(col(idCol), col(vecCol))
    pos.join(neg, Seq("anchor_id"))
      .join(vlook.select(col(idCol).as("anchor_id"),
        col(vecCol).as("__av2")), Seq("anchor_id"))
      .join(vlook.select(col(idCol).as("neg_id"),
        col(vecCol).as("__nv2")), Seq("neg_id"))
      .select(col("anchor_id"), col("pos_id"), col("neg_id"),
        col("pos_cos"),
        round(VectorFunctions.cosineSimilarity(col("__av2"),
          col("__nv2")), 6).as("neg_cos"))
      .withColumn("margin", col("pos_cos") - col("neg_cos"))
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
    val sample = sampleVectors(vecs, vecCol, seed, maxSample)
    require(sample.nonEmpty, "fitIvfCentroids: no non-null vectors")
    val centers = lloyd(sample, k, seed, maxIter)
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

  /** One DISTRIBUTED Lloyd's step over the FULL corpus — the
    * complement to [[fitIvfCentroids]]'s bounded-sample driver fit.
    * At 100 TB a 64k sample under-represents tail domains; when the
    * cluster structure itself is the product (SemDeDup-style
    * cluster-then-dedup, corpus domain discovery) the E/M steps must
    * see every row. Shape per step: assignment is the ZERO-exchange
    * narrow [[ivfAssign]] projection (the centroid table rides into
    * codegen as a model-sized object), and the M-step is ONE
    * partial-aggregatable exchange on (centroid_id, dim) — map-side
    * combine reduces each partition to ≤ k·dim rows before the wire.
    *
    * Replayability discipline (the q132 rule): double summation is
    * order-sensitive, so each coordinate is quantized to the integer
    * lattice floor(x·Q + 0.5) BEFORE summation. Integer sums are exact
    * in any order (partial aggregation, AQE re-plans, DuckDB — all
    * agree bit-for-bit) and the mean is ONE exact divide qsum/(Q·n).
    * Assignment is cosine (spherical k-means — the embedding-space
    * standard), which is scale-invariant, so the UNnormalized lattice
    * mean is a valid next-round centroid as-is.
    *
    * Returns (centroid_id, dim, n, qsum, mean); empty cells simply
    * produce no rows (standard Lloyd's — the cell count can shrink). */
  def kmeansStep(vecs: DataFrame, idCol: String, vecCol: String,
      centroids: DataFrame, cIdCol: String = "centroid_id",
      cVecCol: String = "c_vec", quantum: Double = 1e6): DataFrame = {
    require(quantum > 0, s"quantum must be positive: $quantum")
    val assigned = ivfAssign(vecs, idCol, vecCol, centroids, cIdCol,
      cVecCol, nProbe = 1).drop("probe_rank")
    assigned
      .select(col(cIdCol), posexplode(expr(
        s"transform(cast($vecCol as array<double>), " +
          s"x -> cast(floor(x * ${quantum}d + 0.5d) as bigint))"))
        .as(Seq("dim", "qv")))
      .groupBy(col(cIdCol), col("dim"))
      .agg(count(lit(1)).as("n"), sum("qv").as("qsum"))
      .select(col(cIdCol), col("dim"), col("n"), col("qsum"),
        (col("qsum").cast("double") /
          (lit(quantum) * col("n").cast("double"))).as("mean"))
  }

  /** Full-corpus k-means: `iters` × ([[kmeansStep]] → rebuild the
    * model-sized centroid table from the lattice means). Each
    * iteration is one narrow pass + one (k·dim)-bounded exchange; the
    * inter-iteration state is k·dim doubles — params-as-data, never a
    * corpus-sized structure. Cells that go empty drop out (their rows
    * vanish from the step output), matching textbook Lloyd's. */
  def kmeansIterate(vecs: DataFrame, idCol: String, vecCol: String,
      centroids0: DataFrame, iters: Int, cIdCol: String = "centroid_id",
      cVecCol: String = "c_vec", quantum: Double = 1e6): DataFrame = {
    require(iters >= 1, s"iters must be >= 1: $iters")
    var cents = centroids0
    var it = 0
    while (it < iters) {
      cents = kmeansStep(vecs, idCol, vecCol, cents, cIdCol, cVecCol,
          quantum)
        .groupBy(col(cIdCol))
        .agg(expr("transform(array_sort(collect_list(" +
          "struct(dim, mean))), s -> s.mean)").as(cVecCol))
      it += 1
    }
    cents
  }

  /** ONE distributed job draws the deterministic quantizer-training
    * sample (xxhash64-ranked TakeOrdered — no RNG, stable across runs
    * and partitionings). Shared by the IVF and PQ fitters. */
  private def sampleVectors(vecs: DataFrame, vecCol: String, seed: Long,
      maxSample: Int): Array[Array[Double]] =
    vecs
      .select(col(vecCol).cast("array<double>").as("v"))
      .filter(col("v").isNotNull)
      .orderBy(xxhash64(lit(seed), col("v")))
      .limit(maxSample)
      .collect()
      .map(_.getSeq[Double](0).toArray)

  /** Driver-side Lloyd's over the bounded sample (the FAISS training
    * idiom — see [[fitIvfCentroids]]'s scaladoc for why cluster-side
    * k-means loses here). Init draws splitmix-seeded DISTINCT sample
    * indices (raw modulo draws collide, which would leave
    * permanently-duplicated centroids — a duplicate center attracts no
    * points under strict '<' and never moves). Returns min(k, |sample|)
    * centers in init order (deterministic). */
  private def lloyd(sample: Array[Array[Double]], k: Int, seed: Long,
      maxIter: Int): Array[Array[Double]] = {
    val dim = sample.head.length
    val kk = math.min(k, sample.length)
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
    centers
  }

  /** Fit product-quantization codebooks (Jégou et al. TPAMI 2011): the
    * sample is drawn ONCE (one distributed job — same discipline as
    * [[fitIvfCentroids]]), then an independent Lloyd's runs per subspace
    * over that sample's slices. Returns a small table
    * (subspace INT, code INT, c_vec ARRAY<DOUBLE>) — m·ksub rows of
    * dsub doubles, a model-size object at any corpus scale — that feeds
    * [[pqEncode]]/[[pqAdcTopK]] with zero extra jobs. Vectors whose
    * length isn't divisible by `m` fail fast (a schema bug, not data
    * skew). */
  def fitPqCodebooks(vecs: DataFrame, vecCol: String, m: Int,
      ksub: Int = 256, seed: Long = 42, maxIter: Int = 20,
      maxSample: Int = 1 << 16): DataFrame = {
    val sample = sampleVectors(vecs, vecCol, seed, maxSample)
    require(sample.nonEmpty, "fitPqCodebooks: no non-null vectors")
    val dim = sample.head.length
    require(dim % m == 0, s"fitPqCodebooks: dim $dim not divisible by m=$m")
    val dsub = dim / m
    val rows = (0 until m).flatMap { s =>
      val slices = sample.map(v => java.util.Arrays.copyOfRange(
        v, s * dsub, (s + 1) * dsub))
      lloyd(slices, ksub, seed + s, maxIter).zipWithIndex.map {
        case (cv, c) =>
          org.apache.spark.sql.Row(s, c, cv.toIndexedSeq)
      }
    }
    import scala.jdk.CollectionConverters._
    vecs.sparkSession.createDataFrame(rows.asJava,
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("subspace",
          org.apache.spark.sql.types.IntegerType, nullable = false),
        org.apache.spark.sql.types.StructField("code",
          org.apache.spark.sql.types.IntegerType, nullable = false),
        org.apache.spark.sql.types.StructField("c_vec",
          org.apache.spark.sql.types.ArrayType(
            org.apache.spark.sql.types.DoubleType)))))
  }

  /** Collect a codebook table into the m × ksub × dsub reference array
    * the native PQ expressions embed. The table is model-sized BY
    * CONSTRUCTION (m·ksub rows); ragged or non-contiguous
    * (subspace, code) keys fail fast. */
  def collectPqCodebooks(codebooks: DataFrame, sCol: String = "subspace",
      cCol: String = "code", vCol: String = "c_vec")
      : Array[Array[Array[Double]]] = {
    val rows = codebooks
      .select(col(sCol).cast("int"), col(cCol).cast("int"),
        col(vCol).cast("array<double>"))
      .collect()
      .map(r => (r.getInt(0), r.getInt(1), r.getSeq[Double](2).toArray))
      .sortBy(r => (r._1, r._2))
    require(rows.nonEmpty, "collectPqCodebooks: empty codebook table")
    val m = rows.map(_._1).max + 1
    val grouped = Array.tabulate(m) { s =>
      val g = rows.filter(_._1 == s).map(_._3)
      require(g.nonEmpty, s"collectPqCodebooks: no codes for subspace $s")
      g
    }
    require(grouped.forall(_.length == grouped(0).length),
      "collectPqCodebooks: ragged ksub across subspaces")
    grouped
  }

  /** PQ-encode a corpus: one NARROW projection (native [[PqEncode]]
    * expression, zero exchanges) adding `codes ARRAY<INT>` — m small
    * ints replacing 4·dim float bytes. This is the table a 100 TB ANN
    * deployment persists and scans; rows with null/mis-sized vectors
    * are dropped (they can never be ADC-scored). */
  def pqEncode(vecs: DataFrame, idCol: String, vecCol: String,
      codebooks: DataFrame): DataFrame = {
    val cbs = collectPqCodebooks(codebooks)
    vecs.select(col(idCol),
        graft.expressions.VectorFunctions.pqEncode(col(vecCol), cbs)
          .as("codes"))
      .filter(col("codes").isNotNull)
  }

  /** PQ/ADC ANN scan: corpus as codes (narrow encode), queries carry a
    * per-query distance lookup table (narrow [[PqLut]]), every
    * (query, code-row) pair scores via m table lookups — no float
    * vector is read corpus-side. Broadcast queries → the corpus is
    * scanned once with zero shuffle; the only exchange is [[rankTopK]]'s
    * k-bounded per-query reduction. Rank order: ADC distance ASC, id
    * ASC (ADC approximates squared L2 — smaller is nearer). Compose
    * with [[ivfAssign]] for the classic IVF-PQ: coarse cells bound the
    * scan, ADC ranks inside the probed cells. */
  def pqAdcTopK(corpus: DataFrame, queries: DataFrame,
      idCol: String, vecCol: String, qIdCol: String, qVecCol: String,
      codebooks: DataFrame, k: Int): DataFrame = {
    val cbs = collectPqCodebooks(codebooks)
    val coded = corpus.select(col(idCol),
        graft.expressions.VectorFunctions.pqEncode(col(vecCol), cbs)
          .as("__codes"))
      .filter(col("__codes").isNotNull)
    val luts = queries.select(col(qIdCol),
        graft.expressions.VectorFunctions.pqLut(col(qVecCol), cbs)
          .as("__lut"))
      .filter(col("__lut").isNotNull)
    // rankTopK keeps the LARGEST scores; negate the distance so the
    // nearest (smallest-ADC) codes win. Negation is FP-exact, so the
    // recovered `adc` replays bit-for-bit.
    val scored = coded.crossJoin(broadcast(luts))
      .select(col(qIdCol), col(idCol),
        (-graft.expressions.VectorFunctions.pqAdcScore(col("__codes"),
          col("__lut"))).as("cos"))
    rankTopK(scored, qIdCol, idCol, k)
      .select(col(qIdCol), col(idCol), (-col("cos")).as("adc"),
        col("rank"))
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

  /** IVF-PQ (the FAISS IVFPQ layout, flat-encoding variant): the coarse
    * quantizer bounds the scan to `nProbe` cells per query
    * ([[ivfAssign]] — zero-exchange narrow assignment), ADC ranks
    * inside the probed cells ([[PqEncode]] codes joined against
    * [[PqLut]] tables on the cell equi-join key). This is the
    * many-queries 100 TB shape: no broadcast of the query set, the one
    * wide stage is a hash equi-join on centroid_id + the k-bounded rank
    * reduction. Codes encode the RAW vectors (not residuals — residual
    * encoding needs a per-cell codebook transform; the flat variant is
    * what keeps the codebook a single model-sized object). */
  def ivfPqTopK(corpus: DataFrame, queries: DataFrame,
      idCol: String, vecCol: String, qIdCol: String, qVecCol: String,
      centroids: DataFrame, codebooks: DataFrame, k: Int,
      nProbe: Int = 2): DataFrame = {
    val cbs = collectPqCodebooks(codebooks)
    val c = ivfAssign(corpus, idCol, vecCol, centroids, "centroid_id",
        "c_vec", nProbe = 1).drop("probe_rank")
      .select(col("centroid_id"), col(idCol),
        graft.expressions.VectorFunctions.pqEncode(col(vecCol), cbs)
          .as("__codes"))
      .filter(col("__codes").isNotNull)
    val q = ivfAssign(queries, qIdCol, qVecCol, centroids, "centroid_id",
        "c_vec", nProbe = nProbe).drop("probe_rank")
      .select(col("centroid_id"), col(qIdCol),
        graft.expressions.VectorFunctions.pqLut(col(qVecCol), cbs)
          .as("__lut"))
      .filter(col("__lut").isNotNull)
    val scored = q.join(c, Seq("centroid_id"))
      .select(col(qIdCol), col(idCol),
        (-graft.expressions.VectorFunctions.pqAdcScore(col("__codes"),
          col("__lut"))).as("cos"))
    rankTopK(scored, qIdCol, idCol, k)
      .select(col(qIdCol), col(idCol), (-col("cos")).as("adc"),
        col("rank"))
  }

  /** IVF-PQ with RESIDUAL encoding (the full FAISS IVFPQ: codes
    * quantize x − centroid(x), not x) — residuals concentrate around
    * the origin regardless of which cell a vector lives in, so ONE
    * model-sized codebook set serves every cell with the accuracy a
    * flat encoding only gets near the centroid mean. The cost is
    * query-side: the ADC lookup table must be rebuilt per PROBED CELL
    * (LUT of q − c for each probed centroid) instead of once per
    * query — nProbe small LUTs, still narrow arithmetic before the
    * cell equi-join. Corpus-side cost is one broadcast join against
    * the k-row centroid table plus a codegen'd `zip_with` subtraction
    * feeding [[graft.expressions.PqEncode]] — the corpus still never
    * shuffles for the encode. Rank contract matches [[ivfPqTopK]]:
    * ADC ascending, id ascending. */
  def ivfPqResidualTopK(corpus: DataFrame, queries: DataFrame,
      idCol: String, vecCol: String, qIdCol: String, qVecCol: String,
      centroids: DataFrame, codebooks: DataFrame, k: Int,
      nProbe: Int = 2): DataFrame = {
    val cbs = collectPqCodebooks(codebooks)
    val cvt = broadcast(
      centroids.select(col("centroid_id"), col("c_vec")))
    def residual(v: Column): Column =
      zip_with(v.cast("array<double>"), col("c_vec"), (a, b) => a - b)
    val c = ivfAssign(corpus, idCol, vecCol, centroids, "centroid_id",
        "c_vec", nProbe = 1).drop("probe_rank")
      .join(cvt, Seq("centroid_id"))
      .select(col("centroid_id"), col(idCol),
        graft.expressions.VectorFunctions.pqEncode(residual(col(vecCol)),
          cbs).as("__codes"))
      .filter(col("__codes").isNotNull)
    val q = ivfAssign(queries, qIdCol, qVecCol, centroids, "centroid_id",
        "c_vec", nProbe = nProbe).drop("probe_rank")
      .join(cvt, Seq("centroid_id"))
      .select(col("centroid_id"), col(qIdCol),
        graft.expressions.VectorFunctions.pqLut(residual(col(qVecCol)),
          cbs).as("__lut"))
      .filter(col("__lut").isNotNull)
    val scored = q.join(c, Seq("centroid_id"))
      .select(col(qIdCol), col(idCol),
        (-graft.expressions.VectorFunctions.pqAdcScore(col("__codes"),
          col("__lut"))).as("cos"))
    rankTopK(scored, qIdCol, idCol, k)
      .select(col(qIdCol), col(idCol), (-col("cos")).as("adc"),
        col("rank"))
  }

  /** Exact re-rank REFINEMENT (the FAISS refine stage): take an
    * approximate candidate list (any producer following the topK
    * contract — ADC, LSH, HNSW), join the TRUE vectors back for the
    * ≤ |queries|·R surviving candidates only, and re-rank by exact
    * cosine to top-k. The id-keyed join touches R rows per query —
    * corpus-size-independent wire — and repairs exactly the ADC
    * quantization error the candidate stage accepted for speed. */
  def refineTopK(candidates: DataFrame, corpus: DataFrame,
      queries: DataFrame, idCol: String, vecCol: String,
      qIdCol: String, qVecCol: String, k: Int): DataFrame = {
    val scored = candidates.select(col(qIdCol), col(idCol))
      .join(corpus.select(col(idCol), col(vecCol)), Seq(idCol))
      .join(broadcast(queries.select(col(qIdCol), col(qVecCol))),
        Seq(qIdCol))
      .select(col(qIdCol), col(idCol),
        VectorFunctions.cosineSimilarity(col(qVecCol), col(vecCol))
          .as("cos"))
    rankTopK(scored, qIdCol, idCol, k)
  }

  /** Int8 scalar quantization: per-vector symmetric max-abs scaling,
    * `code_i = floor(v_i·127/maxabs + 0.5)` ∈ [-127, 127] stored as
    * TINYINT — the standard 4× embedding-table compression (8× vs
    * doubles) every vector store ships. The floor(x+0.5) form is used
    * in BOTH engines instead of round() so no rounding-mode ambiguity
    * exists to replay. A pure narrow projection; a 100 TB deployment
    * persists (id, codes, scale) and scans it instead of the floats.
    *
    * Key property driving [[int8TopK]]: the per-vector scales CANCEL in
    * cosine — cos(s_a·a, s_b·b) = cos(a, b) — so quantized-cosine
    * ranking needs only the integer codes, and the integer dot/norm
    * sums are EXACT in doubles (|Σ| < 2^53), making the whole scan
    * bit-replayable. All-zero vectors quantize to all-zero codes
    * (scale 0). */
  def quantizeInt8(vecs: DataFrame, idCol: String, vecCol: String)
      : DataFrame = {
    val v = col(vecCol).cast("array<double>")
    val maxabs = array_max(transform(v, x => abs(x)))
    vecs.filter(v.isNotNull).select(col(idCol),
      when(maxabs === 0d, transform(v, _ => lit(0d)))
        .otherwise(transform(v,
          x => floor(x * lit(127d) / maxabs + lit(0.5d))))
        .cast("array<tinyint>").as("codes"),
      (maxabs / 127d).as("scale"))
  }

  /** Brute-force top-k over int8-quantized vectors: quantize corpus and
    * queries, rank by cosine over the integer codes (scale-invariant —
    * see [[quantizeInt8]]). Same plan shape as [[bruteForceTopK]]
    * (broadcast queries, zero corpus shuffle, k-bounded rank exchange)
    * but the corpus side reads 8× narrower data — the scan-throughput
    * lever at 100 TB. */
  def int8TopK(corpus: DataFrame, queries: DataFrame,
      idCol: String, vecCol: String, qIdCol: String, qVecCol: String,
      k: Int): DataFrame = {
    val c = quantizeInt8(corpus, idCol, vecCol)
      .select(col(idCol), col("codes").cast("array<double>").as("__cv"))
    val q = quantizeInt8(queries, qIdCol, qVecCol)
      .select(col(qIdCol), col("codes").cast("array<double>").as("__qv"))
    val scored = c.crossJoin(broadcast(q))
      .select(col(qIdCol), col(idCol),
        VectorFunctions.cosineSimilarity(col("__qv"), col("__cv"))
          .as("cos"))
    rankTopK(scored, qIdCol, idCol, k)
  }
}
