package graft

import graft.serve.EmbeddingGather
import org.apache.spark.sql.functions._

/** DataEmbeddingLayer relational semantics
  * (reference data_embedding_layer.py:45-397). */
class EmbeddingGatherSpec extends SparkSpec {
  import spark.implicits._

  private def embTable(rows: (Long, Seq[Double])*) =
    rows.toSeq.toDF("eid", "vec")

  test("joint gather: weighted sum, null weight → 1, padding idx 0 " +
    "skipped") {
    val items = Seq(
      (1L, 1L, Some(2.0)), // weight 2 on e1
      (1L, 2L, None), // categorical → weight 1 on e2
      (1L, 0L, Some(9.0))) // padding — contributes nothing
      .toDF("bag", "idx", "w")
    val emb = embTable(1L -> Seq(1.0, 0.0), 2L -> Seq(0.0, 1.0))
    val out = EmbeddingGather.gather(items, "bag", "idx", "w",
      emb, "eid", "vec").as[(Long, Seq[Double])].collect().toMap
    assert(out(1L) == Seq(2.0, 1.0))
  }

  test("prependStatic: static embedding becomes sequence position 0 " +
    "(:395-396)") {
    val dynSeq = Seq(
      (1L, 1, Seq(1.0, 2.0)),
      (1L, 2, Seq(3.0, 4.0)),
      (2L, 1, Seq(5.0, 6.0)))
      .toDF("subject", "seq_pos", "emb")
    val statics = Seq(
      (1L, Seq(9.0, 9.0)),
      (2L, Seq(8.0, 8.0)))
      .toDF("subject", "emb")
    val out = EmbeddingGather.prependStatic(dynSeq, statics, "subject",
        "seq_pos")
      .as[(Long, Int, Seq[Double])].collect()
      .map { case (s, p, e) => (s, p) -> e }.toMap
    assert(out((1L, 0)) == Seq(9.0, 9.0)) // static prepended
    assert(out((1L, 1)) == Seq(1.0, 2.0)) // dynamic untouched
    assert(out((1L, 2)) == Seq(3.0, 4.0))
    assert(out((2L, 0)) == Seq(8.0, 8.0))
    assert(out.size == 5) // L+1 positions per subject
  }

  test("splitGather: cw·cat + nw·num with values_mask semantics " +
    "(:249-273)") {
    val items = Seq(
      (1L, 1L, Some(3.0)), // valued → cat weight 1 AND num weight 3
      (1L, 2L, None), // unvalued → cat only (num weight 0)
      (2L, 1L, None), // bag with no valued obs → cw·cat
      (3L, 0L, None)) // all-padding bag → zero vector, row kept
      .toDF("bag", "idx", "v")
    val catEmb = embTable(1L -> Seq(1.0, 0.0), 2L -> Seq(0.0, 2.0))
    val numEmb = embTable(1L -> Seq(10.0, 0.0), 2L -> Seq(0.0, 10.0))
    val out = EmbeddingGather.splitGather(items, "bag", "idx", "v",
      catEmb, "eid", "vec", numEmb, "eid", "vec",
      categoricalWeight = 0.5, numericalWeight = 0.5)
      .as[(Long, Seq[Double])].collect().toMap
    // bag 1: 0.5*[1,2] + 0.5*(3*[10,0] + 0*[0,10]) = [15.5, 1.0]
    assert(out(1L) == Seq(15.5, 1.0))
    // bag 2: num sum is the zero vector → 0.5*[1,0]
    assert(out(2L) == Seq(0.5, 0.0))
    // bag 3: all items are padding — reference emits a zero embedding
    // row, not a missing one (batch alignment)
    assert(out(3L) == Seq(0.0, 0.0))
  }

  test("measurement-index normalization: equal mass per distinct " +
    "measurement (:200-230)") {
    val items = Seq(
      (1L, 1L, 10L), // meas 10 ×2
      (1L, 2L, 10L),
      (1L, 3L, 20L), // meas 20 ×1
      (1L, 0L, 0L)) // padding
      .toDF("bag", "idx", "meas")
    val out = EmbeddingGather
      .withMeasurementNormalization(items, "bag", "meas")
      .select("idx", "__meas_norm").as[(Long, Double)].collect().toMap
    // reference: 1/cnt per position → [.5,.5,1,0], row-sum 2 →
    // [.25,.25,.5,0]
    assert(out(1L) == 0.25 && out(2L) == 0.25)
    assert(out(3L) == 0.5)
    assert(out(0L) == 0.0)
    // total mass 1
    assert(math.abs(
      out.values.sum - 1.0) < 1e-12)
  }

  test("concatStatic: dims concatenate, missing static zero-fills") {
    val dyn = Seq((1L, Seq(1.0, 2.0)), (2L, Seq(3.0, 4.0)))
      .toDF("bag", "emb")
    val stat = Seq((1L, Seq(9.0, 8.0, 7.0))).toDF("bag", "emb")
    val out = EmbeddingGather.concatStatic(dyn, stat, "bag", staticDim = 3)
      .as[(Long, Seq[Double])].collect().toMap
    assert(out(1L) == Seq(1.0, 2.0, 9.0, 8.0, 7.0))
    assert(out(2L) == Seq(3.0, 4.0, 0.0, 0.0, 0.0))
  }
}
