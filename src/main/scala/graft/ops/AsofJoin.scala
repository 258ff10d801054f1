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

  def asofJoin(left: DataFrame, right: DataFrame, keyCol: String,
      tsCol: String, valueCols: Seq[String]): DataFrame = {
    val leftCols = left.columns.toSeq
    require(!valueCols.contains(keyCol) && !valueCols.contains(tsCol),
      "valueCols must not include the key/ts columns")
    require(leftCols.intersect(valueCols).isEmpty,
      s"left already has columns ${leftCols.intersect(valueCols)}")
    // left rows carry null value slots; right rows carry null left slots
    val lTagged = left
      .withColumn("__side", lit(1))
      .select((leftCols.map(col) :+ col("__side")) ++
        valueCols.map(c => lit(null).cast(
          right.schema(c).dataType).as(c)): _*)
    val rTagged = right
      .withColumn("__side", lit(0))
      .select(leftCols.map(c =>
        if (c == keyCol || c == tsCol) col(c)
        else lit(null).cast(left.schema(c).dataType).as(c)) ++
        (col("__side") +: valueCols.map(col)): _*)
    val u = lTagged.unionByName(rTagged)
    // (ts, side) ordering makes equal-ts right rows visible to left rows;
    // the running last() is the carry-forward
    val w = Window.partitionBy(keyCol)
      .orderBy(col(tsCol), col("__side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val carried = valueCols.foldLeft(u) { case (df, c) =>
      df.withColumn(c, last(col(c), ignoreNulls = true).over(w))
    }
    carried.filter(col("__side") === 1).drop("__side")
  }
}
