package graft.ingest

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Subject-level train/tune/held-out splits.
  *
  * Reference semantics (event_stream_dataset.py:702-740): a seeded random
  * permutation of subject ids is cut at cumulative fractions; the final
  * fraction may be implicit (remainder). Bit-compat with numpy's permutation
  * is impossible and not required (SURVEY §4 randomness note) — the contract
  * is set-level: splits partition the subject set, sizes match the requested
  * fractions, assignment is a pure function of (subject_id, seed).
  *
  * Implementation: order subjects by a seeded pseudo-random key and cut by
  * ntile-style fraction boundaries computed from the total count. One tiny
  * shuffle over the distinct-subject table (subjects ≪ events); the result
  * joins back to events/measurements as a broadcast or semi-join.
  */
object Splits {

  /** Returns (subject_id, split) with split ∈ splitNames. `fracs` may sum to
    * < 1; a final remainder split gets the last name (reference behavior:
    * fracs=[0.8] + names=['train','held_out'] → 80/20). */
  def subjectSplits(subjects: DataFrame, fracs: Seq[Double],
      splitNames: Seq[String], seed: Long): DataFrame =
    subjectSplitsByKey(subjects, fracs, splitNames,
      xxhash64(col("subject_id"), lit(seed)))

  /** SQL-replayable split key: md5 hex of "subject_id:seed". Slower than
    * xxhash64 but reproducible in any engine with md5 (the DuckDB oracle
    * replays it verbatim) — use when split assignments must be audited
    * outside Spark. Same rank-and-cut operator either way. */
  def md5SplitKey(seed: Long): Column =
    md5(concat(col("subject_id").cast("string"), lit(":" + seed))
      .cast("binary"))

  /** Key-parameterized core: rank subjects by (key, subject_id) and cut at
    * the cumulative-fraction boundaries. */
  def subjectSplitsByKey(subjects: DataFrame, fracs: Seq[Double],
      splitNames: Seq[String], key: Column): DataFrame = {
    require(splitNames.length == fracs.length ||
      splitNames.length == fracs.length + 1,
      "need one split name per fraction (+1 for the remainder)")
    val f = if (splitNames.length == fracs.length) fracs
            else fracs :+ (1.0 - fracs.sum)
    require(math.abs(f.sum - 1.0) < 1e-9, s"fractions must sum to 1: $f")
    val cum = f.scanLeft(0.0)(_ + _).tail

    // Seeded pseudo-random but reproducible key per subject — stable across
    // runs and partitionings, unlike rand(seed) which depends on partition
    // layout. Materialize the keyed subject table once (it is ≪ events but
    // can still be hundreds of millions of rows at 100 TB), then rank it
    // with range-partition + zipWithIndex — a global row_number() window
    // would funnel every subject through one partition.
    val keyed = subjects.select(col("subject_id"))
      .distinct()
      .withColumn("rk", key)
      .localCheckpoint(true)
    val total = keyed.count()
    val ranked = Ids
      .denseIdsBy(keyed, "rn0", Seq(col("rk"), col("subject_id")))
      .withColumn("rn", col("rn0") + 1L)
    val boundaries = cum.map(c => math.round(c * total))
    val splitExpr = splitNames.zip(boundaries).reverse
      .foldLeft(lit(splitNames.last)) { case (acc, (name, b)) =>
        when(col("rn") <= b, lit(name)).otherwise(acc)
      }
    ranked.select(col("subject_id"), splitExpr.as("split"))
  }

  /** Restrict a frame carrying subject_id to one split via broadcast
    * semi-join — the reference's isin-mask filters (§2.2) at scale. */
  def forSplit(df: DataFrame, splits: DataFrame, split: String): DataFrame =
    df.join(
      broadcast(splits.filter(col("split") === split).select("subject_id")),
      Seq("subject_id"), "left_semi")

  /** LEAKAGE-safe grouped split: the split is a pure function of the
    * GROUP key (URL domain, crawl source, subject), so the
    * near-duplicates and templated pages that cluster within a group
    * can never straddle train/test — the doc-level split that inflates
    * held-out scores. Pure hash-threshold on the md5 uniform of
    * "group:seed" (the q124 digit-walk construction, engine-replayable):
    * fractions are EXPECTED, not exact counts — the zero-coordination
    * trade. [[subjectSplits]] is the exact-size rank-and-cut variant
    * when counts must match to the row; this one is a narrow
    * projection with no distinct, no count, no rank — it composes
    * under any join/filter at any scale. */
  def groupedSplit(df: DataFrame, grpCol: String, fracs: Seq[Double],
      splitNames: Seq[String], seed: Long): DataFrame = {
    require(splitNames.length == fracs.length ||
      splitNames.length == fracs.length + 1,
      "need one split name per fraction (+1 for the remainder)")
    val f = if (splitNames.length == fracs.length) fracs
            else fracs :+ (1.0 - fracs.sum)
    require(math.abs(f.sum - 1.0) < 1e-9, s"fractions must sum to 1: $f")
    val cum = f.scanLeft(0.0)(_ + _).tail
    val v = conv(substring(
      md5(concat(col(grpCol).cast("string"), lit(":" + seed))
        .cast("binary")), 1, 12), 16, 10).cast("double")
    val u = (v + lit(1.0)) / lit(281474976710656.0) // 2^48
    val splitExpr = splitNames.zip(cum).reverse
      .foldLeft(lit(splitNames.last)) { case (acc, (name, c)) =>
        when(u <= c, lit(name)).otherwise(acc)
      }
    // A NULL group key yields a NULL md5 uniform, which would fall
    // through every `when` into the LAST split unaudited — for a
    // leakage-safety primitive that silent clustering is a trap. Emit
    // a NULL split instead: null-keyed rows are visibly unassigned and
    // the caller decides (filter, quarantine split, or require()).
    df.withColumn("split",
      when(col(grpCol).isNotNull, splitExpr))
  }
}
