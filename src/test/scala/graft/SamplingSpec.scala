package graft

import graft.ops.Sampling
import org.apache.spark.sql.functions._

/** Deterministic sampling: partition-layout independence is the point. */
class SamplingSpec extends SparkSpec {
  import spark.implicits._

  test("deterministicSample: stable across partitionings, ~fraction") {
    val ids = (1L to 2000L).toDF("id")
    val a = Sampling.deterministicSample(ids, "id", 0.25, seed = 7)
      .as[Long].collect().toSet
    val b = Sampling.deterministicSample(ids.repartition(13), "id", 0.25,
      seed = 7).as[Long].collect().toSet
    assert(a == b) // rand(seed) would fail this
    assert(math.abs(a.size / 2000.0 - 0.25) < 0.05)
    // disjoint-ish under a different seed
    val c = Sampling.deterministicSample(ids, "id", 0.25, seed = 8)
      .as[Long].collect().toSet
    assert(c != a)
    // fraction bounds honored
    assert(Sampling.deterministicSample(ids, "id", 0.0, 7).count() == 0)
    assert(Sampling.deterministicSample(ids, "id", 1.0, 7).count() >= 1999)
  }

  test("stratifiedSample: exactly n per stratum, layout-independent") {
    val rows = (1L to 300L).map(i => (i, s"s${i % 3}")).toDF("id", "grp")
    val s1 = Sampling.stratifiedSample(rows, "grp", "id", 10, seed = 42)
    assert(s1.groupBy("grp").count().as[(String, Long)].collect()
      .toMap.values.toSet == Set(10L))
    val s2 = Sampling.stratifiedSample(rows.repartition(7), "grp", "id",
      10, seed = 42)
    assert(s1.select("id").as[Long].collect().toSet ==
      s2.select("id").as[Long].collect().toSet)
    // n larger than the stratum → whole stratum, no padding
    val tiny = Seq((1L, "a"), (2L, "a"), (3L, "b")).toDF("id", "grp")
    assert(Sampling.stratifiedSample(tiny, "grp", "id", 5, 1L)
      .count() == 3)
    // md5 rank variant is a pure function of (id, seed) too
    val m1 = Sampling.stratifiedSample(rows, "grp", "id", 10,
      Sampling.md5Rank(col("id"), 7)).select("id").as[Long].collect()
    val m2 = Sampling.stratifiedSample(rows.repartition(5), "grp", "id",
      10, Sampling.md5Rank(col("id"), 7)).select("id").as[Long].collect()
    assert(m1.toSet == m2.toSet)
  }
}
