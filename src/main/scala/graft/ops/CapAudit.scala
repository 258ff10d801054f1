package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.execution.QueryExecution
import org.apache.spark.sql.functions._
import org.apache.spark.sql.util.QueryExecutionListener

/** Audit trail for bounded candidate-generation ops (posting/block/bucket
  * caps in [[Dedup]]): every cap that silently drops candidate keys emits
  * an observed metric (`Dataset.observe` — a CollectMetrics node, computed
  * in-stream at zero extra cost) so a capped run is DISTINGUISHABLE from a
  * complete one. A per-session QueryExecutionListener logs the metrics on
  * query completion: WARN when keys were actually dropped, DEBUG otherwise.
  * Programmatic consumers read the same values from
  * `df.queryExecution.observedMetrics` or a registered listener — the
  * metric travels with the query, never a side channel.
  */
object CapAudit {

  private val log = org.slf4j.LoggerFactory.getLogger(getClass)
  private val seq = new java.util.concurrent.atomic.AtomicLong()
  private val hooked =
    java.util.Collections.newSetFromMap(
      new java.util.WeakHashMap[SparkSession, java.lang.Boolean]())

  val Prefix = "graft.capped."

  private def ensureListener(spark: SparkSession): Unit =
    hooked.synchronized {
      if (hooked.add(spark)) {
        spark.listenerManager.register(new QueryExecutionListener {
          override def onSuccess(funcName: String, qe: QueryExecution,
              durationNs: Long): Unit =
            qe.observedMetrics.foreach { case (name, row) =>
              if (name.startsWith(Prefix)) {
                val dropped = Option(row.getAs[Any]("capped_keys"))
                  .fold(0L)(_.toString.toLong)
                val rows = Option(row.getAs[Any]("capped_rows"))
                  .fold(0L)(_.toString.toLong)
                val mx = Option(row.getAs[Any]("max_key_size"))
                  .fold(0L)(_.toString.toLong)
                if (dropped > 0)
                  log.warn(s"$name: dropped $dropped oversized key(s) " +
                    s"spanning $rows rows (largest=$mx) — results are " +
                    "CAPPED, not the uncapped definition")
                else
                  log.debug(s"$name: no keys over cap (largest=$mx)")
              }
            }
          override def onFailure(funcName: String, qe: QueryExecution,
              exception: Exception): Unit = ()
        })
      }
    }

  /** The shared oversized-key pattern: group `df` by `keyCol`, observe
    * how many keys exceed `cap` (and how many rows they span), and return
    * the oversized keys for the caller's anti-join. The `#n` suffix keeps
    * CollectMetrics names unique when one query plan calls the same op
    * more than once. */
  def oversizedKeys(df: DataFrame, keyCol: String, cap: Int,
      op: String): DataFrame =
    oversizedKeys(df, Seq(keyCol), cap, op)

  def oversizedKeys(df: DataFrame, keyCols: Seq[String], cap: Int,
      op: String): DataFrame = {
    ensureListener(df.sparkSession)
    df.groupBy(keyCols.map(col): _*)
      .agg(count(lit(1)).as("__kn"))
      .observe(s"$Prefix$op#${seq.incrementAndGet()}",
        coalesce(sum(when(col("__kn") > cap, lit(1L)).otherwise(lit(0L))),
          lit(0L)).as("capped_keys"),
        coalesce(sum(when(col("__kn") > cap, col("__kn"))
          .otherwise(lit(0L))), lit(0L)).as("capped_rows"),
        coalesce(max(col("__kn")), lit(0L)).as("max_key_size"))
      .filter(col("__kn") > cap)
      .select(keyCols.head, keyCols.tail: _*)
  }
}
