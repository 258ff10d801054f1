package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of (point-in-time) join — the canonical event-stream temporal join
  * the reference lacks (SURVEY §2.11): for every left row, attach the
  * value columns of the LATEST right row with `right.ts <= left.ts` within
  * the same key (last-observation-carried-forward, the EHR/market-data
  * staple).
  *
  * Spark-first shape: NOT a range join (whose equi+inequality plan
  * degenerates to a per-key nested loop and re-scans right rows per left
  * row) but the union + ordered carry-forward pattern:
  *
  *   1. tag and UNION the two inputs (narrow),
  *   2. one hash shuffle on the key,
  *   3. per key, sort by (ts, side, tiebreak) and carry the last non-null
  *      right values forward with `last(_, ignoreNulls)` over an
  *      unbounded-preceding running window,
  *   4. keep the left rows.
  *
  * ONE shuffle total, O(n log n) per key, no row re-scanning — the same
  * shape a 100 TB backfill wants. Right rows sort BEFORE left rows at
  * equal timestamps, so the join is INCLUSIVE (a right row at exactly
  * left.ts is visible), matching DuckDB/kdb ASOF semantics.
  *
  * `right` must be unique per (key, ts) — pre-aggregate duplicates on the
  * caller side (otherwise "the" latest row at a timestamp is undefined).
  */
object AsofJoin {

  /** @param toleranceSeconds bounded staleness: a right row older than
    *   this (left.ts − right.ts > tolerance) does NOT match and the
    *   value columns come back null — the kdb `wj`/pandas
    *   `merge_asof(tolerance=)` semantics. None = unbounded LOCF. The
    *   plan is unchanged (same single shuffle + running carry); the
    *   matched right timestamp rides inside the carried struct and one
    *   narrow post-filter nulls stale matches. */
  def asofJoin(left: DataFrame, right: DataFrame, keyCol: String,
      tsCol: String, valueCols: Seq[String],
      toleranceSeconds: Option[Double] = None): DataFrame = {
    val leftCols = left.columns.toSeq
    require(!valueCols.contains(keyCol) && !valueCols.contains(tsCol),
      "valueCols must not include the key/ts columns")
    require(leftCols.intersect(valueCols).isEmpty,
      s"left already has columns ${leftCols.intersect(valueCols)}")
    // The right row travels as ONE nullable struct (__rv): the carried
    // last(__rv, ignoreNulls) then yields the values of the single
    // MATCHED right row — including that row's own null values. Carrying
    // each value column independently would skip legitimate nulls and
    // blend columns from different right rows. Right rows with a null
    // timestamp are dropped first: `left.ts >= null` is never true
    // (DuckDB/kdb ASOF semantics).
    val lTagged = left
      .withColumn("__side", lit(1))
      .withColumn("__rv", lit(null).cast(
        org.apache.spark.sql.types.StructType(
          org.apache.spark.sql.types.StructField("__rts",
            right.schema(tsCol).dataType) +:
          valueCols.map(c =>
            org.apache.spark.sql.types.StructField(c,
              right.schema(c).dataType)))))
      .select(leftCols.map(col) :+ col("__side") :+ col("__rv"): _*)
    val rTagged = right
      .filter(col(tsCol).isNotNull)
      .withColumn("__side", lit(0))
      .withColumn("__rv",
        struct(col(tsCol).as("__rts") +: valueCols.map(col): _*))
      .select(leftCols.map(c =>
        if (c == keyCol || c == tsCol) col(c)
        else lit(null).cast(left.schema(c).dataType).as(c)) :+
        col("__side") :+ col("__rv"): _*)
    val u = lTagged.unionByName(rTagged)
    // (ts, side) ordering makes equal-ts right rows visible to left rows;
    // the running last() is the carry-forward
    val w = Window.partitionBy(keyCol)
      .orderBy(col(tsCol), col("__side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val carried = u.withColumn("__rv",
      last(col("__rv"), ignoreNulls = true).over(w))
    val matched = toleranceSeconds match {
      case Some(tol) =>
        // stale matches are nulled, not dropped: the left row survives
        // with null value columns (merge_asof tolerance semantics)
        carried.withColumn("__rv",
          when(col(tsCol).cast("double") -
            col("__rv").getField("__rts").cast("double") <= tol,
            col("__rv")))
      case None => carried
    }
    valueCols.foldLeft(matched.filter(col("__side") === 1)) {
      case (df, c) => df.withColumn(c, col("__rv").getField(c))
    }.drop("__side", "__rv")
  }
}
