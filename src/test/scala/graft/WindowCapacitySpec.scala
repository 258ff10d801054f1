package graft

import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
import org.apache.spark.sql.execution.window.{WindowExec, WindowGroupLimitExec}
import org.apache.spark.sql.execution.QueryExecution
import org.apache.spark.sql.util.QueryExecutionListener

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
  * Two complementary tests close both observation channels:
  *  - the STATIC test walks each query's final executed plan (AQE off);
  *  - the RUNTIME test registers a QueryExecutionListener and replays
  *    every query's CONSTRUCTION, which eagerly runs the operator-internal
  *    checkpoint jobs — exactly the windows the final plan hides behind
  *    `localCheckpoint` boundaries (the ones that surface as
  *    "Moving all data to a single partition" WindowExec warnings in a
  *    verify log).
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

  /** query → why the unpartitioned window RUN DURING ITS CONSTRUCTION
    * (an operator-internal job behind a checkpoint) is bounded. */
  private val boundedRuntime: Map[String, String] = Map(
    "q203_zipf_audit" ->
      "rank over the vocab-bounded checkpointed word-count table",
    "q204_event_motifs" ->
      "top-k over the |event_types|^3-bounded motif-count table"
  )

  /** Descend through adaptive wrappers (leaves to TreeNode.collect). */
  private def unpartitionedWindows(p: SparkPlan): Seq[SparkPlan] =
    p.collect {
      case w: WindowExec if w.partitionSpec.isEmpty => Seq(w: SparkPlan)
      case w: WindowGroupLimitExec if w.partitionSpec.isEmpty =>
        Seq(w: SparkPlan)
      case a: AdaptiveSparkPlanExec => unpartitionedWindows(a.executedPlan)
      case q: QueryStageExec => unpartitionedWindows(q.plan)
    }.flatten

  test("no query EXECUTES an undocumented unpartitioned window in any " +
    "internal job (runtime audit via QueryExecutionListener)") {
    val hits = new java.util.concurrent.ConcurrentHashMap[String, String]()
    @volatile var current = "<warmup>"
    val listener = new QueryExecutionListener {
      override def onSuccess(funcName: String, qe: QueryExecution,
          durationNs: Long): Unit = {
        val ws = try unpartitionedWindows(qe.executedPlan)
          catch { case _: Throwable => Seq.empty }
        if (ws.nonEmpty) hits.put(current, ws.head.nodeName)
      }
      override def onFailure(funcName: String, qe: QueryExecution,
          exception: Exception): Unit = ()
    }
    spark.listenerManager.register(listener)
    try {
      SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
        current = name
        // construction fires the eager operator-internal jobs
        // (localCheckpoints); the noop write then executes the final
        // plan under the verify-run configuration (AQE on), so the
        // audit sees every job a real run would — internal AND final
        try fn(spark, sfDir).write.mode("overwrite").format("noop").save()
        catch { case e: Throwable =>
          fail(s"$name failed to run at $sfDir: ${e.getMessage}")
        }
        org.apache.spark.GraftTestHooks.flushListenerBus(spark.sparkContext)
      }
    } finally spark.listenerManager.unregister(listener)
    val flagged = {
      import scala.jdk.CollectionConverters._
      hits.keySet.asScala.toSet - "<warmup>"
    }
    val undocumented = flagged -- boundedRuntime.keySet
    assert(undocumented.isEmpty,
      s"UNDOCUMENTED unpartitioned window executed during construction " +
        s"of: ${undocumented.toSeq.sorted.mkString(", ")} — distribute " +
        "it (two-pass range ranking) or prove the input bounded and " +
        "allowlist it with rationale.")
    val stale = boundedRuntime.keySet -- flagged
    assert(stale.isEmpty,
      s"runtime allowlist rows that no longer fire (stale): " +
        s"${stale.toSeq.sorted.mkString(", ")}")
  }
}
