package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Multi-dimensional storage layout for data skipping — the Z-order /
  * Morton curve (Morton 1966; the Delta/Iceberg OPTIMIZE ZORDER idiom)
  * re-expressed as plain Spark: an interleaved-bit sort key computed by
  * a static codegen'd expression tree, written through
  * `partitionBy`/sort so BOTH pruning tiers work — directory-level
  * partition pruning on the coarse z-prefix and parquet row-group
  * min/max skipping on the fine key.
  *
  * Why it matters at 100 TB: a linear sort on one column makes every
  * OTHER column's predicate a full scan. The z-key is monotonic in
  * each dimension, so a rectangular box query maps to ONE z-range
  * (corner-to-corner) and touches only the partitions/row-groups whose
  * z-interval intersects it — multi-column skipping from a single sort
  * order, no index structure to maintain.
  */
object Layout {

  /** Morton interleave of two non-negative dimensions, `bits` bits
    * each (x in even positions, y in odd): a static tree of
    * shift/and/or Columns — whole-stage-codegen'd, no lambdas, and
    * arithmetic an external engine replays verbatim. Values are taken
    * mod 2^bits (callers cap or bucket wider domains). */
  def zOrderKey2(x: Column, y: Column, bits: Int = 16): Column = {
    require(bits >= 1 && bits <= 31, s"bits must be in [1,31]: $bits")
    (0 until bits).map { i =>
      shiftleft(shiftrightunsigned(x.cast("long"), i)
          .bitwiseAND(lit(1L)), 2 * i)
        .bitwiseOR(shiftleft(shiftrightunsigned(y.cast("long"), i)
          .bitwiseAND(lit(1L)), 2 * i + 1))
    }.reduce(_ bitwiseOR _)
  }

  /** Driver-side twin of [[zOrderKey2]] for computing query-box corner
    * keys (pure arithmetic, no Spark). */
  def zOrderKey2(x: Long, y: Long, bits: Int): Long =
    (0 until bits).map { i =>
      (((x >>> i) & 1L) << (2 * i)) | (((y >>> i) & 1L) << (2 * i + 1))
    }.reduce(_ | _)

  /** Write `df` in z-order layout over (`xCol`, `yCol`): `zkey` is the
    * fine sort key, `z_prefix` (top `prefixBits` of the interleave) is
    * a Hive partition directory — ≤ 2^prefixBits directories, each
    * internally zkey-sorted so row-group min/max stats stay tight.
    * Box queries filter `z_prefix` BETWEEN the two corner prefixes
    * (sound: the interleave is monotonic per dimension, so every box
    * point's key lies in the corner-to-corner interval) plus the exact
    * per-dimension predicates. */
  def writeZOrdered(df: DataFrame, xCol: String, yCol: String,
      path: String, bits: Int = 16, prefixBits: Int = 6,
      numTasks: Int = 0): Unit = {
    require(prefixBits >= 1 && prefixBits <= 2 * bits,
      s"prefixBits must be in [1, ${2 * bits}]: $prefixBits")
    val keyed = df
      .withColumn("zkey", zOrderKey2(col(xCol), col(yCol), bits))
      .withColumn("z_prefix",
        shiftrightunsigned(col("zkey"), 2 * bits - prefixBits))
    // one range exchange clusters contiguous z-intervals per task, so
    // each task feeds 1-2 prefix directories and row-group zkey ranges
    // don't overlap across files
    val ranged = if (numTasks > 0)
      keyed.repartitionByRange(numTasks, col("zkey"))
    else keyed.repartitionByRange(col("zkey"))
    ranged.sortWithinPartitions("zkey")
      .write.mode("overwrite").partitionBy("z_prefix").parquet(path)
  }
}
