package graft

import graft.ops.SkewTools
import graft.serve.TemporalEncoding
import org.apache.spark.sql.functions._

/** Scale utilities: salted join/collect equivalence + temporal encoding. */
class ScaleToolsSpec extends SparkSpec {
  import spark.implicits._

  test("saltedJoin produces the same rows as a plain join") {
    // hot key: 900 of 1000 rows share key 1
    val big = ((1 to 900).map(i => (1L, i)) ++
      (1 to 100).map(i => (2L, i))).toDF("k", "payload")
    val small = Seq((1L, "one"), (2L, "two"), (3L, "three"))
      .toDF("k", "name")
    val plain = big.join(small, Seq("k")).collect().toSet
    val salted = SkewTools.saltedJoin(big, small, "k", factor = 8)
      .collect().toSet
    assert(salted.map(_.toSeq.toList) == plain.map(_.toSeq.toList))
    assert(salted.size == 1000)
  }

  test("saltedCollectList matches direct sorted collect per key") {
    val df = (1 to 500).map(i => (i % 3L, i.toLong, s"p$i"))
      .toDF("k", "ord", "payload")
    val direct = df.groupBy("k")
      .agg(sort_array(collect_list(struct(col("ord"), col("payload"))))
        .as("items"))
      .select("k", "items").collect()
      .map(r => r.getLong(0) -> r.getSeq[Any](1)).toMap
    val salted = SkewTools.saltedCollectList(df, "k", "ord",
      Seq("payload"), factor = 4)
      .select("k", "items").collect()
      .map(r => r.getLong(0) -> r.getSeq[Any](1)).toMap
    assert(salted == direct)
  }

  test("temporal encoding: sin/cos pairs, unit norm per pair") {
    val df = Seq(0.0, 1.0, 1440.0).toDF("t")
    val enc = TemporalEncoding.withEncoding(df, "t", dim = 8)
      .select("t", "time_enc").as[(Double, Seq[Double])].collect().toMap
    assert(enc(0.0) == Seq(0.0, 1.0, 0.0, 1.0, 0.0, 1.0, 0.0, 1.0))
    // each (sin, cos) pair is unit-norm for any t
    for ((_, v) <- enc; i <- 0 until 4)
      assert(math.abs(v(2 * i) * v(2 * i) + v(2 * i + 1) * v(2 * i + 1)
        - 1.0) < 1e-12)
    // frequencies decay: later pairs move less for the same t
    val e = enc(1.0)
    assert(math.abs(e(0)) > math.abs(e(6)))
  }

  test("skewReport: hand-counted distribution, hot key dominates " +
      "ratio and topk share") {
    import spark.implicits._
    import graft.ops.SkewTools
    // key 0: 60 rows; keys 1..20: 2 rows each → 100 rows, 21 keys
    val rows = ((1 to 60).map(_ => 0L) ++
      (1L to 20L).flatMap(k => Seq(k, k))).toDF("k")
    val got = SkewTools.skewReport(rows, "k", topK = 3)
      .as[(Long, Long, Long, Double, Double)].collect().head
    val mean = 100.0 / 21
    assert(got._1 == 21L && got._2 == 100L && got._3 == 60L)
    assert(got._4 == math.rint(60.0 / mean * 1e6) / 1e6)
    // top-3 = 60 + 2 + 2
    assert(got._5 == math.rint(64.0 / 100 * 1e6) / 1e6)
    // partition invariance
    val re = SkewTools.skewReport(rows.repartition(7), "k", topK = 3)
      .as[(Long, Long, Long, Double, Double)].collect().head
    assert(re == got)
  }
}
