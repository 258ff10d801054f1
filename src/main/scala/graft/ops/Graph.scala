package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Iterative link-graph analytics for crawl curation — PageRank as the
  * canonical host/page quality prior (Page et al. 1999; the Common
  * Crawl/C4-era pipelines rank hosts exactly this way before deciding
  * crawl depth and per-domain quotas).
  *
  * Everything here is declarative DataFrame joins — one rank⋈edges
  * equi-join plus one dst-keyed aggregation per iteration, the classic
  * two-exchange power-iteration shape. At cluster scale both exchanges
  * hash on graph keys, so pre-bucketing `edges` by `src` (see
  * [[graft.ingest.Bucketing]]) removes the join exchange from EVERY
  * iteration; rank state is one (node, long) row per vertex — never
  * adjacency in memory.
  */
object Graph {

  /** PageRank in deterministic FIXED-POINT arithmetic: ranks are BIGINT
    * micro-units summing to ≈ `scale`, updated as
    *
    *   r'(v) = (3·(scale div N)) div 20
    *         + (17 · Σ_{u→v} (r(u) div outdeg(u))) div 20
    *
    * — the textbook 0.15/0.85 damping with every operation an integer
    * div/mul/add. The FP formulation's partial sums would drift with
    * Spark's aggregation order; integer sums are associative, so the
    * result is bit-identical across partitionings, retries, AND
    * external replay (a recursive-CTE engine reproduces every rank
    * exactly — the q75 VIOD discipline applied to graph iteration).
    * Truncation loses < outdeg·20 micro-units per node per step —
    * noise at scale=10^12 — and, like real dangling-mass handling,
    * total mass is allowed to dip slightly below `scale`.
    *
    * Nodes with no in-edges converge to the teleport floor; nodes with
    * no out-edges leak their damped mass (the simplest dangling-node
    * policy; add explicit sink edges upstream for redistribution).
    * Lineage is truncated every 3 iterations (localCheckpoint — the
    * README cache discipline), keeping plan depth constant in `iters`.
    *
    * Returns (node, rank_fp). */
  def pageRankFixedPoint(edges: DataFrame, srcCol: String,
      dstCol: String, iters: Int,
      scale: Long = 1000000000000L): DataFrame = {
    require(iters >= 1, s"iters must be >= 1: $iters")
    val nodes = edges.select(col(srcCol).as("node"))
      .unionByName(edges.select(col(dstCol).as("node")))
      .distinct()
      .localCheckpoint(true)
    // one scalar to the driver (the sanctioned cardinality-sized
    // collect): the initial mass split needs |V|
    val n = nodes.count()
    val r0 = scale / n
    val teleport = 3L * r0 / 20L
    val deg = edges.groupBy(col(srcCol).as("__src"))
      .agg(count(lit(1)).as("__deg"))
    val ed = edges.select(col(srcCol).as("__src"), col(dstCol).as("__dst"))
      .join(deg, Seq("__src"))
      .localCheckpoint(true)
    var ranks = nodes.select(col("node"), lit(r0).as("rank_fp"))
    for (i <- 1 to iters) {
      val sums = ranks.join(ed, col("node") === col("__src"))
        .select(col("__dst").as("node"),
          expr("rank_fp DIV __deg").as("__c"))
        .groupBy("node").agg(sum("__c").as("__s"))
      ranks = nodes.join(sums, Seq("node"), "left")
        .select(col("node"),
          (lit(teleport) +
            expr("17 * coalesce(__s, CAST(0 AS BIGINT)) DIV 20"))
            .as("rank_fp"))
      if (i % 3 == 0 && i < iters) ranks = ranks.localCheckpoint(true)
    }
    ranks
  }
}
