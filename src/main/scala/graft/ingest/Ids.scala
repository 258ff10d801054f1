package graft.ingest

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StructField, StructType}

/** Dense, deterministic id assignment at scale.
  *
  * The reference assigns dense np.arange ids on every events write
  * (event_stream_dataset.py:644-649) — trivial in one pandas process, a trap
  * on a cluster. A global `row_number()` window would funnel 100 TB through
  * one partition; `monotonically_increasing_id` is scalable but sparse.
  * When density matters (FK remaps after aggByTimeType), the scalable
  * pattern is range-partition + sortWithinPartitions + zipWithIndex: two
  * narrow jobs, no single-partition stage, deterministic for a fixed
  * ordering key.
  */
object Ids {

  /** Attach a dense 0-based `idCol` ordered by `orderCols` (which must be a
    * unique key for determinism). */
  def denseIds(df: DataFrame, idCol: String, orderCols: Seq[String])
      : DataFrame =
    denseIdsBy(df, idCol, orderCols.map(col))

  /** Column-expression variant: `orderExprs` may carry sort direction
    * (e.g. `col("n").desc`). `repartitionByRange` + `sortWithinPartitions`
    * both honor the direction, so descending global ranks need no negation
    * tricks.
    *
    * `prePartitioned = true` skips the range exchange: for callers whose
    * upstream is ALREADY range-partitioned on `orderExprs` (e.g. an
    * aggregation run directly on a repartitionByRange — range partitioning
    * satisfies the agg's clustered-distribution requirement, so Spark
    * inserts no further exchange and partitions stay range-disjoint).
    * Intra-partition order is re-established here either way. */
  def denseIdsBy(df: DataFrame, idCol: String,
      orderExprs: Seq[org.apache.spark.sql.Column],
      prePartitioned: Boolean = false): DataFrame = {
    val spark = df.sparkSession
    val ordered = (if (prePartitioned) df
      else df.repartitionByRange(orderExprs: _*))
      .sortWithinPartitions(orderExprs: _*)
    val withId = ordered.rdd.zipWithIndex().map { case (row, i) =>
      Row.fromSeq(row.toSeq :+ i)
    }
    spark.createDataFrame(withId,
      StructType(ordered.schema.fields :+
        StructField(idCol, LongType, nullable = false)))
  }
}
