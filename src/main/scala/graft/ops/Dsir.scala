package graft.ops

import graft.expressions.TextExpressions
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** DSIR-style data selection via importance resampling (Xie et al.,
  * NeurIPS 2023, arXiv:2302.03169): score every raw document by how
  * target-like its hashed n-gram profile is, then keep the top slice.
  *
  *   - **Features**: unigram + bigram token hashes folded into
  *     `nBuckets` buckets (the paper's hashed n-gram generative model).
  *     Hashes are the SQL-replayable base-257 first-8-byte polynomials
  *     (q78/q79 family); a bigram folds as `(h1·31 + h2) mod 1e9+7` —
  *     all arithmetic stays < 2^63, so an external engine replays it.
  *   - **Fit**: bucket unigram+bigram instance counts for the target
  *     and raw corpora (two B-bounded aggregates), add-α smoothed into
  *     log-ratio weights λ_b = ln p̂_target(b) − ln p̂_raw(b).
  *   - **Score**: per-doc Σ count_b·λ_b, computed as an instance-level
  *     broadcast join (λ is B rows) + one per-doc aggregate — the
  *     corpus is read twice (fit, score), shuffled once per pass on
  *     the doc key, and nothing larger than B rows ever concentrates.
  *
  * Selection is deterministic top-k on (round-6 logw desc, id asc) —
  * the replayable stand-in for the paper's Gumbel-top-k (which would
  * need engine-portable noise; see Sampling.temperatureSample for the
  * seeded-hash discipline that could supply it).
  */
object Dsir {

  private val M = 1000000007L

  /** Hashed feature instances (id, bucket): one row per unigram and
    * per adjacent bigram. Callers feed ASCII-projected lowercased
    * text (hash replayability). */
  def featureBuckets(docs: DataFrame, idCol: String, textCol: String,
      nBuckets: Int): DataFrame = {
    val th = docs.select(col(idCol), posexplode(
        TextExpressions.wsTokenPolyHashes(col(textCol), 257L))
      .as(Seq("idx", "h")))
    val bi = th
      .withColumn("h2",
        lead(col("h"), 1).over(Window.partitionBy(idCol).orderBy("idx")))
      .filter(col("h2").isNotNull)
    th.select(col(idCol), (col("h") % nBuckets).as("bucket"))
      .unionByName(bi.select(col(idCol),
        ((col("h") * 31 + col("h2")) % M % nBuckets).as("bucket")))
  }

  /** Per-document importance scores: (id, n_feats, logw) with logw
    * rounded to 6 places (FP-order portability). Documents with no
    * tokens have no features and are absent. */
  def importanceWeights(raw: DataFrame, target: DataFrame, idCol: String,
      textCol: String, nBuckets: Int = 4096, alpha: Double = 1.0)
      : DataFrame = {
    val rf = featureBuckets(raw, idCol, textCol, nBuckets)
    val tf = featureBuckets(target, idCol, textCol, nBuckets)
    // B-bounded fit tables; checkpoint cuts the explode lineage so the
    // totals aggregate below doesn't re-read the corpus
    val rc = rf.groupBy("bucket").agg(count(lit(1)).as("rc"))
      .localCheckpoint(true)
    val tc = tf.groupBy("bucket").agg(count(lit(1)).as("tc"))
      .localCheckpoint(true)
    val tots = rc.agg(sum("rc").cast("double").as("rtot"))
      .crossJoin(tc.agg(sum("tc").cast("double").as("ttot")))
    val lam = rc.join(tc, Seq("bucket"), "left")
      .crossJoin(broadcast(tots))
      .select(col("bucket"),
        (log((coalesce(col("tc"), lit(0L)).cast("double") + alpha) /
            (col("ttot") + alpha * nBuckets)) -
          log((col("rc").cast("double") + alpha) /
            (col("rtot") + alpha * nBuckets))).as("lam"))
    rf.join(broadcast(lam), Seq("bucket"))
      .groupBy(idCol)
      .agg(count(lit(1)).as("n_feats"),
        round(sum("lam"), 6).as("logw"))
  }

  /** Deterministic importance resampling: top-`k` docs by (logw desc,
    * id asc). */
  def resample(raw: DataFrame, target: DataFrame, idCol: String,
      textCol: String, k: Int, nBuckets: Int = 4096,
      alpha: Double = 1.0): DataFrame =
    importanceWeights(raw, target, idCol, textCol, nBuckets, alpha)
      .orderBy(desc("logw"), asc(idCol)).limit(k)
}
