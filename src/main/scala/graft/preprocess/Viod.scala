package graft.preprocess

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Encoder, Encoders}
import scala.collection.mutable.ArrayBuffer

/** Variance-Impact Outlier Detector (VIOD).
  *
  * Exact port of the scalar fit algorithm in
  * /root/reference/EventStream/VarianceImpactOutlierDetector/
  * variance_impact_outlier_detector.py:53-216 — including its quirks
  * (the min-side endpoint scan at :179-183 also breaks on the max-side run
  * boundary; ties between sides go to the max side at :204). The property
  * tests in tests/VarianceImpactOutlierDetector/ are the spec: clean
  * Normal/LogNormal/Exponential draws yield ~no outliers; planted extremes
  * are flagged and only they.
  *
  * Distribution strategy (SURVEY §2.7): the fit is inherently sequential per
  * key but keys are independent, so we run the scalar loop inside a typed
  * `Aggregator` whose buffer accumulates values (running-moment arithmetic —
  * the reference's DataStats trick — keeps the trim loop O(maxL) per round
  * without rescanning). Per-key value counts bound the buffer; for 100 TB
  * mode cap with a documented sample (`maxValuesPerKey`).
  */
object Viod {

  val DefaultSubsampleFrac = 0.1
  val DefaultMaxProbOfExclusion = 0.05

  /** Default threshold 10/N^0.6 (variance_impact_outlier_detector.py:51). */
  def defaultStdDeltaThresh(n: Long): Double = 10.0 * math.pow(n.toDouble, -0.6)

  final case class Thresholds(lo: Double, hi: Double) {
    /** Inlier ⟺ strictly inside bounds (predict, :218-223). */
    def isInlier(v: Double): Boolean = v > lo && v < hi
  }

  private final case class Stats(n: Long, sumX: Double, sumX2: Double) {
    def mean: Double = sumX / n
    def variance: Double = sumX2 / n - mean * mean
    def std: Double = math.sqrt(variance)
    def remove(v: Double, copies: Long): Stats =
      Stats(n - copies, sumX - v * copies, sumX2 - v * v * copies)
  }

  /** `_max_L` (:98-117): largest excludable-subset size whose full exclusion
    * from an iid subsample of fraction r has probability ≤ p. */
  private def maxL(n: Long, r: Double, p: Double): Long =
    math.min(n - 1,
      math.floor(n * (1 - math.pow(p, 1.0 / (r * n)))).toLong)

  /** `_max_deviation_factor` (:119-155). */
  private def maxDeviationFactor(n: Long, thresh: Long => Double): Double = {
    val delta = thresh(n + 1)
    if (math.abs(delta - 1) >= math.sqrt((n + 1).toDouble / n))
      Double.PositiveInfinity
    else
      (n + 1) * math.sqrt(
        1.0 / (n * (1 - delta) * (1 - delta)) - 1.0 / (n + 1))
  }

  /** `_std_delta_for_side` (:170-191). X must be ascending-sorted.
    * Returns (stdDelta, extremeVal, newStats); lo/hi are the current live
    * window into X ([lo, hi) exclusive-end). */
  private def stdDeltaForSide(
      x: Array[Double], lo: Int, hi: Int, isMin: Boolean, maxLv: Long,
      cur: Stats): (Double, Double, Stats) = {
    var l = 1L
    var found = false
    // Verbatim quirk: the min-side scan also terminates on the max-side run
    // boundary (reference :180 uses `or` unconditionally).
    while (!found && l < maxLv) {
      val minBreak = isMin && x(lo + l.toInt) != x(lo + l.toInt - 1)
      val maxBreak = x(hi - l.toInt) != x(hi - l.toInt - 1)
      if (minBreak || maxBreak) found = true else l += 1
    }
    if (!found) (0.0, 0.0, cur)
    else {
      val extremeVal = if (isMin) x(lo + l.toInt - 1) else x(hi - l.toInt)
      val next = cur.remove(extremeVal, l)
      val stdDelta = math.abs(cur.std - next.std) / cur.std
      (stdDelta, extremeVal, next)
    }
  }

  /** `fit` (:193-216) over an unsorted array; returns exclusive bounds. */
  def fitArray(
      values: Array[Double],
      subsampleFrac: Double = DefaultSubsampleFrac,
      maxProbOfExclusion: Double = DefaultMaxProbOfExclusion,
      thresh: Long => Double = defaultStdDeltaThresh): Thresholds = {
    val x = values.clone().sorted
    var cur = Stats(x.length.toLong, x.sum, x.map(v => v * v).sum)
    val maxDev = maxDeviationFactor(cur.n, thresh)
    var threshLarge = cur.mean + cur.std * maxDev
    var threshSmall = cur.mean - cur.std * maxDev
    var lo = 0
    var hi = x.length
    var done = false
    while (cur.n > 1 && !done) {
      val maxLv = maxL(cur.n, subsampleFrac, maxProbOfExclusion)
      val minSide = stdDeltaForSide(x, lo, hi, isMin = true, maxLv, cur)
      val maxSide = stdDeltaForSide(x, lo, hi, isMin = false, maxLv, cur)
      val minMoreExtreme = minSide._1 > maxSide._1
      val (stdDelta, extremeVal, next) =
        if (minMoreExtreme) minSide else maxSide
      if (stdDelta > thresh(cur.n)) {
        if (minMoreExtreme) { threshSmall = extremeVal; lo = hi - next.n.toInt }
        else { threshLarge = extremeVal; hi = lo + next.n.toInt }
        cur = next
      } else done = true
    }
    Thresholds(threshSmall, threshLarge)
  }

  /** SQL-replayable twin of [[fitArray]]: identical trim loop, but the
    * window statistics come from PREFIX-SUM DIFFERENCES over the sorted
    * array (S(b)−S(a−1), Q(b)−Q(a−1)) instead of the reference's
    * incremental running-moment removal. Left-to-right prefix sums are
    * exactly what a SQL engine's cumulative window aggregate computes, so
    * an external oracle (DuckDB recursive CTE) replays every comparison
    * bit-for-bit — the arithmetic ORDER is pinned, not just the math.
    * Results differ from fitArray only by FP round-off in the moments
    * (same trim decisions on any non-adversarial data). */
  def fitArrayPrefix(
      values: Array[Double],
      subsampleFrac: Double = DefaultSubsampleFrac,
      maxProbOfExclusion: Double = DefaultMaxProbOfExclusion,
      thresh: Long => Double = defaultStdDeltaThresh): Thresholds = {
    val x = values.clone().sorted
    val n0 = x.length
    if (n0 == 0)
      return Thresholds(Double.NegativeInfinity, Double.PositiveInfinity)
    val s = new Array[Double](n0 + 1)
    val q = new Array[Double](n0 + 1)
    var i = 0
    while (i < n0) {
      s(i + 1) = s(i) + x(i)
      q(i + 1) = q(i) + x(i) * x(i)
      i += 1
    }
    // 1-based inclusive window [a, b]
    def std(a: Int, b: Int): Double = {
      val n = b - a + 1
      val sw = s(b) - s(a - 1)
      val qw = q(b) - q(a - 1)
      val mean = sw / n
      math.sqrt(qw / n - mean * mean)
    }
    val maxDev = maxDeviationFactor(n0.toLong, thresh)
    var tSmall = s(n0) / n0 - std(1, n0) * maxDev
    var tLarge = s(n0) / n0 + std(1, n0) * maxDev
    var a = 1
    var b = n0
    var done = false
    while (b - a + 1 > 1 && !done) {
      val n = b - a + 1
      val maxLv = maxL(n.toLong, subsampleFrac, maxProbOfExclusion)
      // joint scan (verbatim quirk: min side also stops at the max-side
      // run boundary); v[i] 1-based = x(i-1) 0-based
      var lMin = 0
      var l = 1
      while (lMin == 0 && l < maxLv) {
        if (x(a + l - 1) != x(a + l - 2) || x(b - l) != x(b - l - 1)) lMin = l
        else l += 1
      }
      var lMax = 0
      l = 1
      while (lMax == 0 && l < maxLv) {
        if (x(b - l) != x(b - l - 1)) lMax = l
        else l += 1
      }
      val curStd = std(a, b)
      val dMin =
        if (lMin == 0) 0.0
        else math.abs(curStd - std(a + lMin, b)) / curStd
      val dMax =
        if (lMax == 0) 0.0
        else math.abs(curStd - std(a, b - lMax)) / curStd
      val minMore = dMin > dMax
      if ((if (minMore) dMin else dMax) > thresh(n.toLong)) {
        if (minMore) { tSmall = x(a + lMin - 2); a += lMin }
        else { tLarge = x(b - lMax); b -= lMax }
      } else done = true
    }
    Thresholds(tSmall, tLarge)
  }

  /** splitmix64 finalizer over the value's raw bits — a deterministic,
    * order-free rank for the sampling cap (shared graft.core.Hashing). */
  private def hashRank(v: Double): Long =
    graft.core.Hashing.doubleRank(v)

  /** Typed Aggregator: per-key VIOD fit in one groupBy pass. Buffer holds the
    * key's values; with a cap, the kept subset is the `maxValuesPerKey`
    * SMALLEST values by splitmix64(bits(v)) rank — a deterministic uniform
    * sample independent of partition layout and reduce/merge order (equal
    * values are interchangeable, so multiset truncation at ties is stable).
    * Buffers are allowed to grow to 2× the cap between prunings so the
    * amortized cost stays O(1) per value. */
  class ViodAggregator(maxValuesPerKey: Int = Int.MaxValue,
      prefixStats: Boolean = false)
      extends Aggregator[Double, ArrayBuffer[Double], Thresholds] {
    private def prune(b: ArrayBuffer[Double]): ArrayBuffer[Double] =
      if (b.length <= maxValuesPerKey) b
      else {
        val kept = b.toArray.sortBy(v => (hashRank(v), v))
          .take(maxValuesPerKey)
        b.clear()
        b ++= kept
      }
    private def maybePrune(b: ArrayBuffer[Double]): ArrayBuffer[Double] =
      if (maxValuesPerKey < Int.MaxValue / 2 &&
        b.length >= 2 * maxValuesPerKey) prune(b)
      else b
    def zero: ArrayBuffer[Double] = ArrayBuffer.empty
    def reduce(b: ArrayBuffer[Double], v: Double): ArrayBuffer[Double] =
      maybePrune(b += v)
    def merge(a: ArrayBuffer[Double], b: ArrayBuffer[Double])
        : ArrayBuffer[Double] = maybePrune(a ++= b)
    def finish(b: ArrayBuffer[Double]): Thresholds =
      if (b.isEmpty) Thresholds(Double.NegativeInfinity,
        Double.PositiveInfinity)
      else if (prefixStats) fitArrayPrefix(prune(b).toArray)
      else fitArray(prune(b).toArray)
    def bufferEncoder: Encoder[ArrayBuffer[Double]] =
      Encoders.kryo[ArrayBuffer[Double]]
    def outputEncoder: Encoder[Thresholds] = Encoders.product[Thresholds]
  }

  /** DataFrame-level per-key fit: (key, viod_lo, viod_hi). */
  def fitPerKey(kv: DataFrame, keyCol: String, valCol: String,
      maxValuesPerKey: Int = Int.MaxValue,
      prefixStats: Boolean = false): DataFrame = {
    val agg = udaf(new ViodAggregator(maxValuesPerKey, prefixStats))
    kv.filter(col(valCol).isNotNull)
      .groupBy(col(keyCol).as("key"))
      .agg(agg(col(valCol).cast("double")).as("viod"))
      .select(col("key"), col("viod.lo").as("viod_lo"),
        col("viod.hi").as("viod_hi"))
  }
}
