package graft

import graft.ops.Graph
import org.apache.spark.sql.functions._

/** Fixed-point PageRank: exact vs a driver-side replay of the same
  * integer recurrence, structural sanity, partition invariance. */
class GraphSpec extends SparkSpec {
  import spark.implicits._

  /** The operator's exact recurrence, replayed with plain Scala maps. */
  private def reference(edges: Seq[(Long, Long)], iters: Int,
      scale: Long = 1000000000000L): Map[Long, Long] = {
    val nodes = (edges.map(_._1) ++ edges.map(_._2)).distinct.sorted
    val n = nodes.length
    val r0 = scale / n
    val tp = 3L * r0 / 20L
    val deg = edges.groupBy(_._1).map { case (s, es) =>
      s -> es.length.toLong }
    var r = nodes.map(_ -> r0).toMap
    (1 to iters).foreach { _ =>
      val sums = edges.groupBy(_._2).map { case (dst, es) =>
        dst -> es.map { case (src, _) => r(src) / deg(src) }.sum
      }
      r = nodes.map(v => v -> (tp + 17L * sums.getOrElse(v, 0L) / 20L))
        .toMap
    }
    r
  }

  test("matches the driver-side integer replay exactly; hub outranks " +
      "spokes; no-in-edge node sits at the teleport floor") {
    // 0 is a hub: everyone links to 0, 0 links to 1; 5 links out only
    val edges = Seq(1L -> 0L, 2L -> 0L, 3L -> 0L, 4L -> 0L, 0L -> 1L,
      5L -> 0L, 5L -> 1L)
    val got = Graph.pageRankFixedPoint(edges.toDF("src", "dst"),
        "src", "dst", iters = 6)
      .as[(Long, Long)].collect().toMap
    assert(got == reference(edges, 6))
    // hub 0 (5 in-edges) and its sole successor 1 (which inherits the
    // hub's whole out-mass) both outrank the plain spokes
    assert(got(0L) > got(2L) && got(1L) > got(2L))
    // node 5 has no in-edges: teleport floor after iteration 1
    val r0 = 1000000000000L / 6
    assert(got(5L) == 3L * r0 / 20L)
    // spokes 2,3,4 are symmetric
    assert(got(2L) == got(3L) && got(3L) == got(4L))
  }

  test("bit-identical across partition layouts (integer sums are " +
      "order-free)") {
    val edges = (0L until 200L).flatMap { i =>
      Seq(i -> ((i + 1) % 200), i -> ((i * 7 + 3) % 200))
    }.filter { case (a, b) => a != b }
    val df = edges.toDF("src", "dst")
    val a = Graph.pageRankFixedPoint(df, "src", "dst", 8)
      .as[(Long, Long)].collect().toSet
    val b = Graph.pageRankFixedPoint(df.repartition(17), "src", "dst", 8)
      .as[(Long, Long)].collect().toSet
    assert(a == b)
    assert(a == reference(edges, 8).toSet)
  }
}
