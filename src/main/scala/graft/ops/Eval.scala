package graft.ops

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{IntegerType, LongType, StructField, StructType}

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
    * Skew note — AUTO-ROUTED: the per-group window is the right shape
    * when groups are numerous (the audit's usual regime — work
    * self-distributes across groups), but ONE dominant group with
    * continuous scores (its distinct-score table ≈ its rows) would
    * funnel that group's whole cumulative walk through a single window
    * task. The operator routes around its own failure mode: after the
    * (grp, s) collapse, a cheap count of distinct scores per group
    * (one agg over the already-checkpointed table) splits groups at
    * `bigGroupThreshold`; small groups keep the per-group window, big
    * groups take the [[rankAuc]]-style two-pass range ranking with
    * PER-GROUP prefix offsets — (grp, s) range layout, per-(pid, grp)
    * totals (≤ partitions + #big-groups rows collected; at most
    * rows/threshold groups can exceed the threshold, so the collect is
    * bounded by construction), broadcast base offsets, rank window
    * within each (pid, grp) slice. Both paths compute the identical
    * exact tie-averaged ranks, so routing never changes the answer —
    * only the task shape. */
  def rankAucBy(df: DataFrame, grpCol: String, scoreCol: String,
      labelCol: String, bigGroupThreshold: Long = 1L << 17): DataFrame = {
    val g = df
      .select(col(grpCol).as("grp"),
        col(scoreCol).cast("double").as("s"),
        col(labelCol).cast("boolean").as("y"))
      .filter(col("s").isNotNull && col("y").isNotNull)
      .groupBy("grp", "s")
      .agg(count(lit(1)).as("n"),
        sum(when(col("y"), 1L).otherwise(0L)).as("np"))
      .localCheckpoint(true)
    val bigKeys = g.groupBy("grp")
      .agg(count(lit(1)).as("__ds"))
      .filter(col("__ds") >= bigGroupThreshold)
      .select("grp")
    val ranked =
      if (bigKeys.isEmpty) rankedByGroupWindow(g)
      else {
        val bk = broadcast(bigKeys.withColumnRenamed("grp", "__bgrp"))
        val small = g.join(bk, g("grp") <=> bk("__bgrp"), "left_anti")
        val big = g.join(bk, g("grp") <=> bk("__bgrp"), "left_semi")
        rankedByGroupWindow(small).unionByName(rankedByGroupRange(big))
      }
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

  /** Tie-averaged ranks over a distinct (grp, s, n, np) table via the
    * per-group cumulative window — the many-small-groups shape. */
  private[graft] def rankedByGroupWindow(g: DataFrame): DataFrame = {
    val w = Window.partitionBy("grp").orderBy("s")
      .rowsBetween(Window.unboundedPreceding, -1)
    g.withColumn("cb", coalesce(sum("n").over(w), lit(0L)))
      .select(col("grp"), col("n"), col("np"),
        (col("cb").cast("double") +
          (col("n").cast("double") + 1.0) / 2.0).as("avg_rank"))
  }

  /** Tie-averaged ranks over a distinct (grp, s, n, np) table via the
    * two-pass range ranking, per group — the dominant-group shape: a
    * (grp, s) range layout distributes each big group's walk across
    * many partitions; per-(pid, grp) totals prefix-sum driver-side
    * into per-slice base offsets (range partitioning keeps each
    * partition to a contiguous (grp, s) span, so the collected table
    * has ≤ partitions + #groups rows); pass 2 ranks WITHIN each
    * (pid, grp) slice and adds the broadcast base. Every intermediate
    * is an exact-in-doubles count, so the result is bit-identical to
    * the window path regardless of the range partitioner's sampling. */
  private[graft] def rankedByGroupRange(big: DataFrame): DataFrame = {
    val spark = big.sparkSession
    val b = big.repartitionByRange(col("grp"), col("s"))
      .withColumn("pid", spark_partition_id())
      .localCheckpoint(true)
    val grpField = b.schema("grp")
    val totals = b.groupBy("pid", "grp").agg(sum("n").as("pn")).collect()
    val offsetRows = totals.groupBy(r => r.get(1)).toSeq.flatMap {
      case (_, rs) =>
        var acc = 0L
        rs.sortBy(_.getInt(0)).map { r =>
          val base = acc
          acc += r.getLong(2)
          Row(r.getInt(0), r.get(1), base)
        }
    }
    val schema = StructType(Seq(StructField("pid", IntegerType),
      grpField.copy(name = "__ogrp"), StructField("base", LongType)))
    val offsets = spark.createDataFrame(
      spark.sparkContext.parallelize(offsetRows, 1), schema)
    val w = Window.partitionBy("pid", "grp").orderBy("s")
      .rowsBetween(Window.unboundedPreceding, -1)
    b.withColumn("cb_local", coalesce(sum("n").over(w), lit(0L)))
      .join(broadcast(offsets),
        b("pid") === offsets("pid") && b("grp") <=> offsets("__ogrp"))
      .select(b("grp"), col("n"), col("np"),
        ((col("cb_local") + col("base")).cast("double") +
          (col("n").cast("double") + 1.0) / 2.0).as("avg_rank"))
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
