package graft

import graft.preprocess.Viod
import scala.util.Random

/** VIOD statistical properties — the reference's own spec
  * (tests/VarianceImpactOutlierDetector/
  * test_variance_impact_outlier_detector.py:11-114): clean seeded draws
  * from standard families yield ~no outliers; planted extremes are flagged
  * and only they. */
class ViodSpec extends SparkSpec {
  import spark.implicits._

  private def outlierFrac(xs: Array[Double]): Double = {
    val t = Viod.fitArray(xs)
    xs.count(v => !t.isInlier(v)).toDouble / xs.length
  }

  test("clean normal draws: ~no outliers") {
    val r = new Random(42)
    val xs = Array.fill(2000)(r.nextGaussian())
    assert(outlierFrac(xs) < 0.01, s"flagged ${outlierFrac(xs)}")
  }

  test("clean lognormal draws: ~no outliers") {
    val r = new Random(43)
    val xs = Array.fill(2000)(math.exp(r.nextGaussian()))
    assert(outlierFrac(xs) < 0.02, s"flagged ${outlierFrac(xs)}")
  }

  test("clean exponential draws: ~no outliers") {
    val r = new Random(44)
    val xs = Array.fill(2000)(-math.log(r.nextDouble()))
    assert(outlierFrac(xs) < 0.02, s"flagged ${outlierFrac(xs)}")
  }

  test("planted extreme outliers are flagged, and only they") {
    val r = new Random(45)
    val clean = Array.fill(2000)(r.nextGaussian())
    val planted = Array(50.0, -40.0, 60.0)
    val t = Viod.fitArray(clean ++ planted)
    planted.foreach(v => assert(!t.isInlier(v), s"$v not flagged"))
    val falsePos = clean.count(v => !t.isInlier(v))
    assert(falsePos <= clean.length / 100, s"$falsePos false positives")
  }

  test("inlier bounds are exclusive (predict :218-223)") {
    val t = Viod.Thresholds(0.0, 10.0)
    assert(!t.isInlier(0.0) && !t.isInlier(10.0) && t.isInlier(5.0))
  }

  test("degenerate inputs: constant data flags all (drop-guard upstream)") {
    // Reference semantics: std=0 makes the bounds degenerate, every value
    // is "outlier", and the caller's all-outliers guard drops the column
    // (event_stream_dataset.py:1203-1206) — mirrored here.
    val t = Viod.fitArray(Array(7.0, 7.0, 7.0, 7.0))
    assert(!t.isInlier(7.0))
    // DataFrame path with empty-value key
    val df = Seq(("a", Some(1.0)), ("a", Some(2.0)), ("a", Some(100.0)),
      ("b", None)).toDF("k", "v")
    val fit = Viod.fitPerKey(df, "k", "v")
    assert(fit.count() == 1) // null-only key has no rows after filter
  }

  test("fitArrayPrefix: same trim decisions as the verbatim port") {
    val r = new Random(47)
    val clean = Array.fill(800)(r.nextGaussian())
    val planted = clean ++ Array(55.0, -60.0, 62.0)
    for (xs <- Seq(clean, planted)) {
      val verbatim = Viod.fitArray(xs)
      val prefix = Viod.fitArrayPrefix(xs)
      // identical paths → identical bounds up to moment round-off; on a
      // trimmed side the bound is an exact data value, so exact equality
      assert(math.abs(verbatim.lo - prefix.lo) <
        1e-9 * math.max(1.0, math.abs(verbatim.lo)))
      assert(math.abs(verbatim.hi - prefix.hi) <
        1e-9 * math.max(1.0, math.abs(verbatim.hi)))
    }
    val t = Viod.fitArrayPrefix(planted)
    assert(!t.isInlier(55.0) && !t.isInlier(-60.0) && !t.isInlier(62.0))
    // empty input → unbounded
    val e = Viod.fitArrayPrefix(Array.empty[Double])
    assert(e.lo.isNegInfinity && e.hi.isPosInfinity)
  }

  test("fitPerKey flags planted outlier per key independently") {
    val r = new Random(46)
    val rows =
      Array.fill(500)(("a", r.nextGaussian())) ++
        Array(("a", 99.0)) ++
        Array.fill(500)(("b", 1000 + r.nextGaussian()))
    val df = rows.toSeq.toDF("k", "v")
    val fit = Viod.fitPerKey(df, "k", "v")
      .as[(String, Double, Double)].collect()
      .map(t => t._1 -> (t._2, t._3)).toMap
    val (aLo, aHi) = fit("a")
    assert(!(99.0 > aLo && 99.0 < aHi), "planted outlier inside bounds")
    // key b's clean data unaffected by key a's outlier
    val (bLo, bHi) = fit("b")
    assert(1000.0 > bLo && 1000.0 < bHi)
  }
}
