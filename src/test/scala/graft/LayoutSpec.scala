package graft

import graft.ops.Layout
import org.apache.spark.sql.functions._

/** Z-order layout: interleave correctness vs a bit-loop reference, and
  * the two-tier pruning proof — a box query must scan only the
  * z-prefix directories its corner-to-corner z-interval touches. */
class LayoutSpec extends SparkSpec {
  import spark.implicits._

  test("zOrderKey2 column expression == driver-side reference; " +
      "monotone per dimension") {
    val pts = for (x <- 0L until 40L; y <- 0L until 40L) yield (x, y)
    val got = pts.toDF("x", "y")
      .select(col("x"), col("y"),
        Layout.zOrderKey2(col("x"), col("y"), 16).as("z"))
      .as[(Long, Long, Long)].collect()
    got.foreach { case (x, y, z) =>
      assert(z == Layout.zOrderKey2(x, y, 16), s"($x,$y)")
    }
    // monotonic in each dimension (the property box-pruning rests on)
    val byXY = got.map { case (x, y, z) => (x, y) -> z }.toMap
    for (x <- 0L until 39L; y <- 0L until 39L) {
      assert(byXY((x, y)) < byXY((x + 1, y)))
      assert(byXY((x, y)) < byXY((x, y + 1)))
    }
  }

  test("box query scans only the intersecting z-prefix directories " +
      "and loses no rows") {
    val tmp = java.nio.file.Files.createTempDirectory("graft-zorder")
      .toString
    val grid = (for (x <- 0L until 64L; y <- 0L until 64L)
      yield (x, y)).toDF("x", "y")
    Layout.writeZOrdered(grid, "x", "y", tmp, bits = 6, prefixBits = 6,
      numTasks = 8)
    def partitionsTouched(df: org.apache.spark.sql.DataFrame): Int = {
      val scan = df.queryExecution.executedPlan.collect {
        case f: org.apache.spark.sql.execution.FileSourceScanExec => f
      }.head
      scan.relation.location
        .listFiles(scan.partitionFilters, scan.dataFilters).length
    }
    val read = spark.read.parquet(tmp)
    // aligned 8x8 box at (16..23)^2: its z-interval is exactly 64
    // consecutive keys -> ONE of the 64 prefix directories
    val pLo = Layout.zOrderKey2(16L, 16L, 6) >>> 6
    val pHi = Layout.zOrderKey2(23L, 23L, 6) >>> 6
    val pruned = read
      .filter(col("z_prefix") >= pLo && col("z_prefix") <= pHi)
      .filter(col("x").between(16L, 23L) && col("y").between(16L, 23L))
    assert(pLo == pHi)
    assert(partitionsTouched(pruned) == 1)
    assert(pruned.count() == 64)
    // same rows as the unpruned scan (pruning is lossless)
    val full = read
      .filter(col("x").between(16L, 23L) && col("y").between(16L, 23L))
    assert(partitionsTouched(full) == 64)
    assert(pruned.select("x", "y").as[(Long, Long)].collect().toSet ==
      full.select("x", "y").as[(Long, Long)].collect().toSet)
    // unaligned box: corner-interval pruning still sound, still strict
    val qLo = Layout.zOrderKey2(13L, 21L, 6) >>> 6
    val qHi = Layout.zOrderKey2(27L, 36L, 6) >>> 6
    val un = read
      .filter(col("z_prefix") >= qLo && col("z_prefix") <= qHi)
      .filter(col("x").between(13L, 27L) && col("y").between(21L, 36L))
    val unFull = read
      .filter(col("x").between(13L, 27L) && col("y").between(21L, 36L))
    assert(partitionsTouched(un) < 64)
    assert(un.count() == unFull.count())
  }
}
