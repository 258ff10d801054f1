package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Skew mitigation for hot keys (SURVEY §4: "AQE skew-join handling (hot
  * subjects)" plus explicit salting when AQE can't help).
  *
  * AQE splits skewed SHUFFLE partitions automatically, but two cases need
  * explicit salt: (a) a broadcast-ineligible join where one key holds a
  * double-digit percentage of rows, and (b) holistic aggregations
  * (collect_list) where one group exceeds executor memory. */
object SkewTools {

  /** Salted equi-join: the skewed (big) side gets a random salt in
    * [0, factor); the small side is replicated `factor` times so every
    * (key, salt) bucket finds its match. Row multiplication is factor×|small|
    * — use for moderately-sized right sides that miss the broadcast
    * threshold but have hot join keys on the left. */
  def saltedJoin(big: DataFrame, small: DataFrame, key: String,
      factor: Int, joinType: String = "inner"): DataFrame = {
    val saltedBig = big.withColumn("__salt",
      (pmod(xxhash64(monotonically_increasing_id()), lit(factor)))
        .cast("int"))
    val replicated = small.withColumn("__salt",
      explode(sequence(lit(0), lit(factor - 1))))
    saltedBig.join(replicated, Seq(key, "__salt"), joinType)
      .drop("__salt")
  }

  /** Two-phase salted collect_list: pre-collect per (key, salt) then
    * flatten per key — caps any single task's group size at ~1/factor of
    * the hot key. Ordering within the final array follows the struct sort
    * of `orderField` so results stay deterministic. */
  /** Key-skew audit — the measurement that decides whether a join/agg
    * key needs [[saltedJoin]] at all (guessing costs either a needless
    * salt explode or a straggler reducer at 100 TB): per-key row
    * counts reduced to the distribution numbers a skew decision reads —
    * max/mean ratio (the straggler factor: how much longer the hottest
    * reducer runs than the average) and the share of all rows owned by
    * the hottest `topK` keys (whether salting a HANDFUL of keys
    * suffices, the cheap fix, or the key is uniformly heavy). One
    * partial-aggregatable count + one bounded top-k; the per-key count
    * table never leaves the executors unsorted.
    *
    * Returns one row: (n_keys, n_rows, max_key_rows, max_mean_ratio
    * round-6, topk_share round-6). */
  def skewReport(df: DataFrame, key: String, topK: Int = 10)
      : DataFrame = {
    val counts = df.groupBy(col(key)).agg(count(lit(1)).as("__c"))
    counts.agg(
        count(lit(1)).as("n_keys"),
        sum("__c").as("n_rows"),
        max("__c").as("max_key_rows"),
        graft.expressions.AggregateFunctions
          .topKByScore(col("__c").cast("double"), col("__c"), topK)
          .as("__top"))
      .select(col("n_keys"), col("n_rows"), col("max_key_rows"),
        round(col("max_key_rows").cast("double") /
          (col("n_rows").cast("double") / col("n_keys")), 6)
          .as("max_mean_ratio"),
        round(expr("aggregate(transform(__top, s -> s.id), " +
          "CAST(0 AS BIGINT), (a, x) -> a + x)").cast("double") /
          col("n_rows").cast("double"), 6).as("topk_share"))
  }

  def saltedCollectList(df: DataFrame, key: String, orderField: String,
      payloadFields: Seq[String], factor: Int): DataFrame = {
    val salted = df.withColumn("__salt",
      pmod(xxhash64(col(orderField)), lit(factor)).cast("int"))
    val partial = salted
      .groupBy(col(key), col("__salt"))
      .agg(collect_list(struct((orderField +: payloadFields)
        .map(col): _*)).as("__part"))
    partial
      .groupBy(col(key))
      .agg(sort_array(flatten(collect_list(col("__part")))).as("items"))
  }
}
