package graft

import graft.ops.Dsir
import org.apache.spark.sql.functions._

/** DSIR importance resampling: target-like docs outrank raw-like. */
class DsirSpec extends SparkSpec {
  import spark.implicits._

  test("docs matching the target profile score higher") {
    // raw corpus mixes two token families; the target only has "aa"s
    val raw = Seq(
      (0L, "aa aa aa aa"), (1L, "bb bb bb bb"),
      (2L, "aa aa bb bb"), (3L, "aa bb aa bb")).toDF("doc_id", "text")
    val target = Seq((10L, "aa aa aa aa aa aa")).toDF("doc_id", "text")
    val w = Dsir.importanceWeights(raw, target, "doc_id", "text")
      .select("doc_id", "logw").as[(Long, Double)].collect().toMap
    assert(w(0L) > w(2L) && w(0L) > w(3L) && w(2L) > w(1L))
    // pure-target doc beats everything containing "bb"
    assert(w.values.max == w(0L))
  }

  test("n_feats = unigrams + bigrams; tokenless docs absent") {
    val raw = Seq((0L, "x y z"), (1L, ""), (2L, "x")).toDF("doc_id",
      "text")
    val target = Seq((9L, "x")).toDF("doc_id", "text")
    val nf = Dsir.importanceWeights(raw, target, "doc_id", "text")
      .select("doc_id", "n_feats").as[(Long, Long)].collect().toMap
    assert(nf == Map(0L -> 5L, 2L -> 1L)) // 3+2 and 1+0; doc 1 absent
  }

  test("scores are partition-layout invariant; resample is top-k") {
    val raw = (0L until 60L).map(i =>
      (i, if (i % 3 == 0) "aa aa aa" else "bb cc dd"))
      .toDF("doc_id", "text")
    val target = Seq((99L, "aa aa")).toDF("doc_id", "text")
    val a = Dsir.importanceWeights(raw, target, "doc_id", "text")
      .as[(Long, Long, Double)].collect().toSet
    val b = Dsir.importanceWeights(raw.repartition(7), target, "doc_id",
      "text").as[(Long, Long, Double)].collect().toSet
    assert(a == b)
    val top = Dsir.resample(raw, target, "doc_id", "text", k = 20)
      .select("doc_id").as[Long].collect().toSet
    assert(top == (0L until 60L).filter(_ % 3 == 0).toSet)
  }
}
