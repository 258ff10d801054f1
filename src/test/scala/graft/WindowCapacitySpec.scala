package graft

import org.apache.spark.sql.execution.window.{WindowExec, WindowGroupLimitExec}

/** Capacity guard for single-partition windows: a `Window.orderBy` with no
  * `partitionBy` plans as a SinglePartition WindowExec — ALL rows funnel
  * through one task, the canonical 100 TB scale killer (the r08 `rankAuc`
  * finding). This spec walks EVERY contract query's executed plan and
  * asserts that any unpartitioned WindowExec appears only in queries on
  * the allowlist below, each with a documented proof that the window's
  * input is BOUNDED (model-sized by construction — vocab/type/calendar
  * tables, never corpus-sized). A new `rankAuc`-shaped operator cannot
  * land silently: its query fails here until its input is argued bounded.
  *
  * Static-plan limitation, stated: windows inside earlier jobs hidden
  * behind `localCheckpoint` boundaries are not visible in the final plan;
  * those sites are covered by the per-operator PlanShapeSpec ratchets and
  * the round-close WindowExec-warning log scan.
  */
class WindowCapacitySpec extends SparkSpec {

  private val sfDir = "/root/testdata/sf0.001"

  /** query → why its unpartitioned window input is provably bounded. */
  private val bounded: Map[String, String] = Map(
    "q203_zipf_audit" ->
      "rank over the vocab-bounded checkpointed word-count table",
    "q204_event_motifs" ->
      "top-k over the |event_types|^3-bounded motif-count table"
  )

  test("every unpartitioned WindowExec sits over a documented bounded " +
    "table (all contract queries)") {
    // AQE must be OFF: with it on, executedPlan is an opaque
    // AdaptiveSparkPlanExec LEAF and collect() would scan nothing —
    // the spec would vacuously pass (the PlanShapeSpec discipline).
    val prev = spark.conf.get("spark.sql.adaptive.enabled", "true")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    val flagged =
      try SparkEntry.queries.toSeq.sortBy(_._1).flatMap {
        case (name, fn) =>
          val plan =
            try fn(spark, sfDir).queryExecution.executedPlan
            catch { case e: Throwable =>
              fail(s"$name failed to plan at $sfDir: ${e.getMessage}")
            }
          val hits = plan.collect {
            case w: WindowExec if w.partitionSpec.isEmpty => w
            case w: WindowGroupLimitExec if w.partitionSpec.isEmpty => w
          }
          if (hits.nonEmpty) Some(name) else None
      }.toSet
      finally spark.conf.set("spark.sql.adaptive.enabled", prev)
    val undocumented = flagged -- bounded.keySet
    val stale = bounded.keySet -- flagged
    assert(undocumented.isEmpty,
      s"single-partition window over an UNDOCUMENTED input in: " +
        s"${undocumented.toSeq.sorted.mkString(", ")} — either " +
        "distribute it (the rankAuc two-pass range ranking) or prove " +
        "the input bounded and add it to the allowlist with rationale.")
    assert(stale.isEmpty,
      s"allowlist rows no longer matching any plan (stale): " +
        s"${stale.toSeq.sorted.mkString(", ")} — prune them so the " +
        "list stays an exact inventory.")
  }
}
