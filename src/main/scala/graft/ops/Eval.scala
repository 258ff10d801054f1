package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Rank-based evaluation metrics for the in-engine classifiers and
  * quality scores (the q99 Naive Bayes, q25's quality heuristics,
  * q96/q110/q190's LM scores) — a filter pipeline that can't measure
  * its own filters against labels is flying blind.
  */
object Eval {

  /** ROC AUC via the Mann–Whitney U statistic with tie-AVERAGED ranks
    * (the textbook estimator: AUC = (R⁺ − n⁺(n⁺+1)/2) / (n⁺·n⁻)).
    *
    * No global sort of the corpus and NO single-partition stage at any
    * cardinality: rows collapse to a DISTINCT-score table first (one
    * partial-aggregatable exchange), and because a CONTINUOUS score
    * makes that table corpus-sized (distinct ≈ rows), the cumulative
    * rank walk itself is distributed — a two-pass range ranking. Pass
    * 1 range-partitions the distinct scores (partition p's scores all
    * precede partition p+1's) and freezes the layout with an eager
    * localCheckpoint; per-partition row totals (≤
    * `spark.sql.shuffle.partitions` rows — config-bounded, never
    * data-bounded) collect to the driver and prefix-sum into per-
    * partition base offsets. Pass 2 runs the rank window WITHIN each
    * range partition and adds the broadcast base offset, so global
    * ranks emerge with every partition working in parallel. Every
    * intermediate term is a dyadic rational represented exactly in
    * doubles (counts and half-integer average ranks), so the rank sums
    * are order-invariant and bit-replayable regardless of the range
    * partitioner's sampling; the ONLY inexact step is the final
    * division, round-6.
    *
    * Returns one row: (n_pos, n_neg, auc). Null scores/labels are
    * dropped. Degenerate inputs (no positives or no negatives) yield
    * a null auc rather than a division error. */
  /** [[rankAuc]] per group — the fairness/segment audit ("is the
    * quality score as discriminative for Swahili as for English?"):
    * the same tie-averaged Mann–Whitney estimator with the group key
    * carried through every stage, so each group gets its own exact
    * rank walk. Same scale shape: one partial-aggregatable
    * (group, score) collapse, the rank window partitioned BY GROUP
    * over the checkpointed distinct-score table (per-partition rows =
    * that group's score cardinality, never its row count), one
    * group-keyed reduction. Degenerate groups yield null auc.
    *
    * Skew note: the per-group window is the right shape when groups
    * are numerous (the audit's usual regime — work self-distributes
    * across groups). If ONE group dominates AND its scores are
    * continuous (its distinct-score table ≈ its rows), filter to that
    * group and use [[rankAuc]] — its two-pass range ranking
    * distributes a single group's walk. */
  def rankAucBy(df: DataFrame, grpCol: String, scoreCol: String,
      labelCol: String): DataFrame = {
    val g = df
      .select(col(grpCol).as("grp"),
        col(scoreCol).cast("double").as("s"),
        col(labelCol).cast("boolean").as("y"))
      .filter(col("s").isNotNull && col("y").isNotNull)
      .groupBy("grp", "s")
      .agg(count(lit(1)).as("n"),
        sum(when(col("y"), 1L).otherwise(0L)).as("np"))
      .localCheckpoint(true)
    val w = Window.partitionBy("grp").orderBy("s")
      .rowsBetween(Window.unboundedPreceding, -1)
    val ranked = g
      .withColumn("cb", coalesce(sum("n").over(w), lit(0L)))
      .withColumn("avg_rank",
        col("cb").cast("double") + (col("n").cast("double") + 1.0) / 2.0)
    ranked.groupBy("grp")
      .agg(sum(col("np")).as("n_pos"),
        sum(col("n") - col("np")).as("n_neg"),
        sum(col("np").cast("double") * col("avg_rank"))
          .as("rank_sum_pos"))
      .select(col("grp"), col("n_pos"), col("n_neg"),
        when(col("n_pos") > 0 && col("n_neg") > 0,
          round((col("rank_sum_pos") -
            col("n_pos").cast("double") *
              (col("n_pos").cast("double") + 1.0) / 2.0) /
            (col("n_pos").cast("double") * col("n_neg").cast("double")),
            6)).as("auc"))
  }

  def rankAuc(df: DataFrame, scoreCol: String, labelCol: String)
      : DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val g = df
      .select(col(scoreCol).cast("double").as("s"),
        col(labelCol).cast("boolean").as("y"))
      .filter(col("s").isNotNull && col("y").isNotNull)
      .groupBy("s")
      .agg(count(lit(1)).as("n"),
        sum(when(col("y"), 1L).otherwise(0L)).as("np"))
      // range layout for the distributed rank walk; eager checkpoint
      // freezes partition ids so the offsets below stay consistent
      .repartitionByRange(col("s"))
      .withColumn("pid", spark_partition_id())
      .localCheckpoint(true)
    // per-range-partition totals → global prefix offsets; the collect
    // is ≤ shuffle-partitions rows by construction (config-bounded)
    val totals = g.groupBy("pid").agg(sum("n").as("pn"))
      .collect().map(r => (r.getInt(0), r.getLong(1))).sortBy(_._1)
    var acc = 0L
    val offsets = totals.map { case (pid, pn) =>
      val base = acc; acc += pn; (pid, base)
    }.toSeq.toDF("pid", "base")
    val w = Window.partitionBy("pid").orderBy("s")
      .rowsBetween(Window.unboundedPreceding, -1)
    val ranked = g
      .withColumn("cb_local", coalesce(sum("n").over(w), lit(0L)))
      .join(broadcast(offsets), Seq("pid"))
      .withColumn("cb", col("cb_local") + col("base"))
      .withColumn("avg_rank",
        col("cb").cast("double") + (col("n").cast("double") + 1.0) / 2.0)
    ranked
      .agg(sum(col("np")).as("n_pos"),
        sum(col("n") - col("np")).as("n_neg"),
        sum(col("np").cast("double") * col("avg_rank"))
          .as("rank_sum_pos"))
      .select(col("n_pos"), col("n_neg"),
        when(col("n_pos") > 0 && col("n_neg") > 0,
          round((col("rank_sum_pos") -
            col("n_pos").cast("double") *
              (col("n_pos").cast("double") + 1.0) / 2.0) /
            (col("n_pos").cast("double") * col("n_neg").cast("double")),
            6)).as("auc"))
  }
}
