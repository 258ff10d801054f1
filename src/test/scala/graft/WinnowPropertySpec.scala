package graft

import org.apache.spark.sql.functions._
import scala.util.Random

/** Property check: the O(len) rolling-hash + monotone-deque winnowing
  * expression equals a brute-force O(len·k·w) reference on random
  * strings (ASCII and multi-codepoint), across k/w combinations. */
class WinnowPropertySpec extends SparkSpec {
  import spark.implicits._

  private val M = 1000000007L
  private val B = 257L

  /** Direct per-gram polynomial hash + per-window min scan. */
  private def brute(s: String, k: Int, w: Int): Seq[Long] = {
    val cps = s.codePoints().toArray
    val nH = cps.length - k + 1
    if (nH <= 0) return Seq.empty
    val hs = (0 until nH).map { i =>
      (0 until k).foldLeft(0L)((h, j) => (h * B + cps(i + j)) % M)
    }
    val sel =
      if (nH <= w) Seq(hs.min)
      else (0 to nH - w).map(i => hs.slice(i, i + w).min)
    sel.distinct.sorted
  }

  private val alphabet =
    ('a' to 'z') ++ ('0' to '9') ++ Seq(' ', '.', 'é', 'ü', '中', '文')

  test("winnowFingerprints ≡ brute-force reference on random strings") {
    val rnd = new Random(42)
    val cases = (0 until 80).map { _ =>
      val n = rnd.nextInt(120)
      (0 until n).map(_ => alphabet(rnd.nextInt(alphabet.length)))
        .mkString
    } ++ Seq("", "a", "a" * 7, "a" * 8, "a" * 30, "ab" * 40)
    for (k <- Seq(3, 8); w <- Seq(1, 4, 16)) {
      val got = cases.toDF("t")
        .select(col("t"), graft.expressions.TextExpressions
          .winnowFingerprints(col("t"), k, w).as("f"))
        .as[(String, Seq[Long])].collect()
      got.foreach { case (t, f) =>
        assert(f == brute(t, k, w),
          s"mismatch for k=$k w=$w text=${t.take(40)}")
      }
    }
  }
}
