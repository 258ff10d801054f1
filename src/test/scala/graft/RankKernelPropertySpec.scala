package graft

import graft.expressions.{NearestCentroids, TopKBuf}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.scalatest.funsuite.AnyFunSuite
import scala.util.Random

/** Property-style specs for the round-7 rank kernels, driver-side (no
  * SparkSession): TopKBuf (the TopKByScoreAgg buffer) and
  * NearestCentroids.compute against brute-force sort references, across
  * sizes, duplication rates and merge splits — the determinism-grid
  * idiom of ViodPropertySpec. */
class RankKernelPropertySpec extends AnyFunSuite {

  private def refTopK(pairs: Seq[(Double, Long)], k: Int): Seq[Long] =
    pairs.sortBy { case (s, id) => (-s, id) }.take(k).map(_._2)

  test("TopKBuf insert-all == sort-based reference across sizes, " +
    "k values and heavy ties") {
    for {
      seed <- 1L to 8L
      n <- Seq(0, 1, 7, 100, 500)
      k <- Seq(1, 5, 64)
      dup <- Seq(1, 4) // dup > 1 → many exact score ties
    } {
      val r = new Random(seed * 31 + n + k + dup)
      val pairs = (0 until n).map { i =>
        ((r.nextInt(n / dup + 1)).toDouble, r.nextLong())
      }.distinct // distinct ids not guaranteed by nextLong but near-so
      val buf = new TopKBuf(k)
      pairs.foreach { case (s, id) => buf.insert(s, id) }
      val got = buf.sortedIdx.map(i => buf.ids(i)).toSeq
      assert(got == refTopK(pairs, k),
        s"seed=$seed n=$n k=$k dup=$dup")
    }
  }

  test("TopKBuf merge is split-invariant: any partition of the input " +
    "merged pairwise equals the global top-k") {
    for (seed <- 1L to 6L; splits <- Seq(2, 5, 13)) {
      val r = new Random(seed)
      val pairs = (0 until 300).map(i =>
        (r.nextInt(40).toDouble, i.toLong)) // dense ties
      val k = 17
      val parts = pairs.grouped(math.max(1, pairs.size / splits)).toSeq
      val bufs = parts.map { p =>
        val b = new TopKBuf(k)
        p.foreach { case (s, id) => b.insert(s, id) }
        b
      }
      val merged = bufs.reduce { (a, b) =>
        var i = 0
        while (i < b.n) { a.insert(b.scores(i), b.ids(i)); i += 1 }
        a
      }
      val got = merged.sortedIdx.map(i => merged.ids(i)).toSeq
      assert(got == refTopK(pairs, k), s"seed=$seed splits=$splits")
    }
  }

  test("NearestCentroids.compute == brute-force cosine rank reference " +
    "(duplicate centroids force ties)") {
    def cos(a: Array[Double], b: Array[Double]): Double = {
      var dot = 0.0; var na = 0.0; var nb = 0.0
      var i = 0
      while (i < a.length) {
        dot += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i); i += 1
      }
      if (na == 0.0 || nb == 0.0) 0.0
      else dot / (math.sqrt(na) * math.sqrt(nb))
    }
    for (seed <- 1L to 10L; k <- Seq(1, 3, 8); nProbe <- Seq(1, 2, 8)) {
      val r = new Random(seed)
      val dim = 6
      val base = Array.fill(k)(Array.fill(dim)((r.nextInt(9) - 4) / 4.0))
      // duplicate the first centroid under a LARGER id: the tie must
      // resolve to the lower id
      val cvs = base :+ base.head.clone
      val ids = (0 until cvs.length).map(i => i.toLong * 10).toArray
      val v = Array.fill(dim)((r.nextInt(9) - 4) / 4.0)
      val got = NearestCentroids
        .compute(new GenericArrayData(v), isFloat = false, ids, cvs,
          nProbe)
        .toLongArray().toSeq
      val want = ids.zip(cvs)
        .map { case (id, cv) => (cos(v, cv), id) }
        .sortBy { case (s, id) => (-s, id) }
        .take(nProbe).map(_._2).toSeq
      assert(got == want, s"seed=$seed k=$k nProbe=$nProbe")
    }
  }

  test("NearestCentroids.compute skips dimension-mismatched centroids " +
    "and bounds output at the valid count") {
    val ids = Array(1L, 2L, 3L)
    val cvs = Array(Array(1.0, 0.0), Array(1.0, 0.0, 0.0), Array(0.0, 1.0))
    val v = new GenericArrayData(Array(1.0, 0.5))
    val got = NearestCentroids.compute(v, isFloat = false, ids, cvs, 5)
      .toLongArray().toSeq
    assert(got == Seq(1L, 3L)) // centroid 2 (dim 3) skipped entirely
  }
}
