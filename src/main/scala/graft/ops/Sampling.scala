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
}
