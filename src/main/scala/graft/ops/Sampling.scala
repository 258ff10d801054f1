package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic sampling for training-data pipelines.
  *
  * `df.sample()` / `rand(seed)` draw per-PARTITION streams: the selected
  * set changes with partitioning, task retries, and AQE re-plans — a
  * repeatability hazard for dataset curation. These operators key every
  * decision off a content hash of the row's id, so the sample is a pure
  * function of (id, seed): stable across runs, cluster layouts, and
  * engines (the md5 key variant is replayable in any SQL engine, same
  * pattern as [[graft.ingest.Splits.md5SplitKey]]).
  */
object Sampling {

  /** Production hash rank: xxhash64(id, seed) — codegen'd, cheapest. */
  def hashRank(idCol: Column, seed: Long): Column =
    xxhash64(idCol, lit(seed))

  /** SQL-replayable rank: md5 hex of "id:seed" (engine-portable). */
  def md5Rank(idCol: Column, seed: Long): Column =
    md5(concat(idCol.cast("string"), lit(":" + seed)).cast("binary"))

  /** Keep ~`fraction` of rows: those whose 63-bit hash falls below the
    * threshold. Narrow (a filter — pushes past joins, no shuffle);
    * deterministic per id. */
  def deterministicSample(df: DataFrame, idCol: String, fraction: Double,
      seed: Long): DataFrame = {
    require(fraction >= 0 && fraction <= 1, s"fraction in [0,1]: $fraction")
    // abs via bitmask (ANSI-safe: no Math.abs(Long.MinValue) overflow)
    val h = hashRank(col(idCol), seed).bitwiseAND(lit(Long.MaxValue))
    df.filter(h < lit((fraction * Long.MaxValue).toLong))
  }

  /** Exactly-n-per-stratum deterministic sample (balanced class /
    * per-source quotas): rank rows within each stratum by (rankKey, id)
    * and keep the first n. One shuffle on the stratum column; for a
    * hot stratum at 100 TB, pre-filter with [[deterministicSample]] at a
    * generous fraction first so the window sees bounded input. */
  def stratifiedSample(df: DataFrame, stratumCol: String, idCol: String,
      n: Int, rankKey: Column): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(stratumCol)).orderBy(rankKey.asc, col(idCol).asc)
    df.withColumn("__rk", row_number().over(w))
      .filter(col("__rk") <= n)
      .drop("__rk")
  }

  def stratifiedSample(df: DataFrame, stratumCol: String, idCol: String,
      n: Int, seed: Long): DataFrame =
    stratifiedSample(df, stratumCol, idCol, n, hashRank(col(idCol), seed))

  /** Deterministic global shuffle for training order: a dense
    * 0-based rank over a seeded content-hash permutation of the ids.
    * `orderBy(rand(seed))` re-deals on every retry/re-plan and a
    * row_number window funnels the corpus through one partition;
    * this ranks by (hash, id) with range-partition + per-partition
    * zipWithIndex ([[graft.ingest.Ids.denseIdsBy]]) — a pure function
    * of (id, seed), one range exchange, no single-partition stage.
    * Readers consume in rank order (or range-bucket it into shards). */
  def deterministicShuffle(df: DataFrame, idCol: String, seed: Long,
      rank: Column = null): DataFrame = {
    val key = if (rank != null) rank else hashRank(col(idCol), seed)
    graft.ingest.Ids.denseIdsBy(
      df.withColumn("__shuffle_key", key),
      "shuffle_rank", Seq(col("__shuffle_key"), col(idCol)))
      .drop("__shuffle_key")
  }

  /** Per-domain keep rates for TEMPERATURE-flattened mixture sampling
    * (the multilingual/multi-domain pretraining recipe: sample domain d
    * with probability ∝ n_d^α, α<1 up-weighting small domains). For a
    * target corpus of `targetRows`, the per-domain keep rate is
    * rate_d = min(1, targetRows · w_d / n_d) with w_d = n_d^α / Σ n_e^α.
    *
    * α = 0.5 routes through `sqrt` — IEEE-exact, so the rate is
    * bit-identical in any engine (the DuckDB oracle replays it);
    * other α use `pow`, correct to 1 ulp but not engine-pinned.
    * One aggregation over the corpus; the rate table is
    * domain-cardinality-sized — broadcast it back. */
  def temperatureRates(df: DataFrame, domainCol: String, alpha: Double,
      targetRows: Long): DataFrame = {
    require(alpha > 0, s"alpha must be positive: $alpha")
    val counts = df.groupBy(col(domainCol).as("domain"))
      .agg(count(lit(1)).cast("double").as("n_d"))
    val weight =
      if (alpha == 0.5) sqrt(col("n_d")) else pow(col("n_d"), alpha)
    val weighted = counts.withColumn("w", weight)
    val z = weighted.agg(sum(col("w")).as("__z"))
    weighted.crossJoin(broadcast(z))
      .select(col("domain"),
        least(lit(1.0),
          lit(targetRows.toDouble) * col("w") / col("__z") / col("n_d"))
          .as("rate"))
  }

  /** Apply [[temperatureRates]]: keep a row iff its deterministic
    * per-id hash fraction falls under its domain's rate. Production
    * path: xxhash64 (codegen'd). Replayable path (`replayable = true`):
    * compare the first 8 md5 hex chars against the rate rendered as an
    * 8-hex-digit threshold — lowercase-hex string order IS numeric
    * order, so any engine with md5/hex replays the exact row set
    * (same discipline as [[md5Rank]] / Splits.md5SplitKey). */
  def temperatureSample(df: DataFrame, domainCol: String, idCol: String,
      alpha: Double, targetRows: Long, seed: Long,
      replayable: Boolean = false): DataFrame = {
    val rates = temperatureRates(df, domainCol, alpha, targetRows)
      .withColumnRenamed("domain", "__dom")
    val joined = df.join(broadcast(rates),
      col(domainCol) === col("__dom"))
    val keep =
      if (replayable) {
        // floor(rate·2^32) as 8 lowercase hex digits; rate = 1 keeps all
        val thr = lpad(lower(hex(
          floor(col("rate") * lit(4294967296.0)).cast("long"))), 8, "0")
        col("rate") >= 1.0 ||
          substring(md5Rank(col(idCol), seed), 1, 8) < thr
      } else {
        val h = hashRank(col(idCol), seed).bitwiseAND(lit(Long.MaxValue))
        h.cast("double") < col("rate") * lit(Long.MaxValue.toDouble)
      }
    joined.filter(keep).drop("__dom", "rate")
  }

  /** Weighted sampling WITHOUT replacement (Efraimidis & Spirakis,
    * IPL 2006 "A-ES"): each row draws u_i uniform in (0, 1] and the
    * k rows with the largest u_i^(1/w_i) form an exact weighted
    * sample — the one-pass, shuffle-light way to take "10k docs,
    * probability proportional to length/quality" for data mixing.
    * Ranking by ln(u)/w (monotone in u^(1/w)) avoids pow's domain
    * edges. The uniform comes from the md5 discipline above — first
    * 12 hex digits of md5("id:seed") as an integer v, u = (v+1)/2^48 —
    * so the draw is a pure function of (id, seed) and any engine with
    * md5 replays the exact sample (ln is within 1 ulp across IEEE
    * libms; keys are continuous so ties at the k-boundary are
    * probability-zero). Plan: narrow key computation + TakeOrdered
    * top-k — no global sort materialization, no single-partition
    * window. Rows with non-positive or null weight are excluded (a
    * zero-weight row can never be sampled). */
  /** Per-key document quota (the C4/Gopher per-host cap: no single
    * domain may contribute more than `n` documents): keep each key's
    * first `n` rows under the deterministic md5 order — a pure function
    * of (id, seed), so the kept set survives re-runs, repartitioning,
    * and engine changes.
    *
    * Shape: the per-key window form (`row_number() OVER (PARTITION BY
    * key ORDER BY hash)`) shuffles AND SORTS every row of every key;
    * this uses the map-side-combinable
    * [[graft.expressions.TopKByScoreAgg]] instead, so each partition
    * reduces a key to ≤ n candidates before the wire — the exchange
    * carries ≤ partitions·keys·n rows however hot the hottest domain
    * is (the crawl's head domains are exactly the skew case).
    *
    * Score is the NEGATED 48-bit md5 prefix (exact in a double), so
    * (score DESC, id ASC) = (md5 ASC, id ASC) — replayable verbatim.
    * Returns (keyCol, idCol, rank) with rank 1..n in kept order. */
  def capPerKey(df: DataFrame, keyCol: String, idCol: String, n: Int,
      seed: Long): DataFrame = {
    require(n > 0, s"n must be positive: $n")
    val v = conv(substring(md5Rank(col(idCol), seed), 1, 12), 16, 10)
      .cast("double")
    df.select(col(keyCol), col(idCol))
      .groupBy(col(keyCol))
      .agg(graft.expressions.AggregateFunctions
        .topKByScore(-v, col(idCol).cast("long"), n).as("__top"))
      .select(col(keyCol), posexplode(col("__top")).as(Seq("__r", "__p")))
      .select(col(keyCol), col("__p.id").as(idCol),
        (col("__r") + 1).cast("int").as("rank"))
  }

  def weightedSampleK(df: DataFrame, idCol: String, weightCol: String,
      k: Int, seed: Long): DataFrame = {
    require(k > 0, s"k must be positive: $k")
    val v = conv(substring(md5Rank(col(idCol), seed), 1, 12), 16, 10)
      .cast("double")
    val u = (v + lit(1.0)) / lit(281474976710656.0) // 2^48
    df.filter(col(weightCol).isNotNull && col(weightCol) > 0)
      .withColumn("__es_key", log(u) / col(weightCol).cast("double"))
      .orderBy(desc("__es_key"), col(idCol).asc)
      .limit(k)
  }

  /** Token-budget mixture plan — the "epochs per source" table every
    * pretraining paper publishes (Llama-style static mixtures; the
    * planning half of [[temperatureSample]]/q92's row-level executor):
    * given per-group token inventories and INTEGER mixture weights,
    * split a total token budget proportionally and report how many
    * passes (epochs) over each group that implies — epochs > 1 flags
    * the groups that will repeat, the quantity data-constrained-scaling
    * analyses care about.
    *
    * `target_tokens = budget·w div Σw` is exact integer arithmetic
    * (the div remainder — < Σw tokens — is deliberately dropped, never
    * FP-redistributed); `epochs` is one deterministic FP division,
    * round-6. Inputs are post-aggregation group tables (one row per
    * source/lang/domain) — everything here is broadcast-sized by
    * construction.
    *
    * Returns (grp, n_tokens, weight, target_tokens, epochs). */
  /** EXECUTE a [[mixturePlan]]: repeat each document `epochs` times —
    * the materialization step between the planning table and the
    * training-order writer. Per group, every doc gets
    * `target_tokens DIV n_tokens` base copies (exact integer floor of
    * the group's epochs), plus ONE extra copy for the deterministic
    * md5-uniform fraction of docs matching the remainder
    * `(target MOD n_tokens)/n_tokens` — so expected materialized
    * tokens per group hit the target without any FP epoch arithmetic
    * deciding row counts (the only FP is the remainder comparison,
    * one division per side, replayable bit-for-bit). Output one row
    * per (doc, copy_idx) via an output-sized sequence explode — the
    * plan broadcasts, nothing shuffles at any corpus size. Docs in
    * groups with zero copies drop (a group can be down-weighted to
    * extinction; the plan table records it). */
  def materializeMixture(docs: DataFrame, idCol: String, grpCol: String,
      plan: DataFrame, seed: Long): DataFrame = {
    // A zero-token plan group can't be materialized (its DIV would be
    // an ANSI DIVIDE_BY_ZERO) — filter it out of the broadcast side so
    // such groups' docs drop through the inner join, the same graceful
    // drop the scaladoc promises for groups missing from the plan.
    val p = broadcast(plan.select(col("grp"), col("n_tokens"),
      col("target_tokens")).filter(col("n_tokens") > 0))
    val v = conv(substring(md5Rank(col(idCol), seed), 1, 12), 16, 10)
      .cast("double")
    val u = (v + lit(1.0)) / lit(281474976710656.0) // 2^48
    val frac = (col("target_tokens") % col("n_tokens")).cast("double") /
      col("n_tokens").cast("double")
    docs.select(col(idCol), col(grpCol).as("grp"))
      .join(p, Seq("grp"))
      .withColumn("n_copies",
        expr("target_tokens DIV n_tokens") +
          when(u < frac, 1L).otherwise(0L))
      .filter(col("n_copies") > 0)
      .select(col("grp"), col(idCol), col("n_copies"),
        explode(sequence(lit(0L), col("n_copies") - 1)).as("copy_idx"))
  }

  def mixturePlan(counts: DataFrame, grpCol: String, tokCol: String,
      weights: DataFrame, wGrpCol: String, wCol: String,
      budget: Long): DataFrame = {
    require(budget > 0, s"budget must be > 0: $budget")
    val joined = counts
      .select(col(grpCol).as("grp"), col(tokCol).cast("long")
        .as("n_tokens"))
      .join(broadcast(weights.select(col(wGrpCol).as("grp"),
        col(wCol).cast("long").as("weight"))), Seq("grp"))
      .localCheckpoint(true)
    joined
      .crossJoin(broadcast(joined.agg(sum(col("weight")).as("__tw"))))
      .select(col("grp"), col("n_tokens"), col("weight"),
        expr(s"$budget * weight DIV __tw").as("target_tokens"),
        round((expr(s"$budget * weight DIV __tw")).cast("double") /
          col("n_tokens").cast("double"), 6).as("epochs"))
  }
}
