package graft

import graft.ml._
import org.apache.spark.sql.functions._

/** Degenerate-input matrix for the `graft.ml` stage family (the r10
  * follow-through on commit 8c6222c's direction): every stage ×
  * {empty input, null input rows, dim mismatch, all-null labels} must
  * produce its DOCUMENTED answer or a diagnostic `require` — never an
  * NPE, never a silent wrong answer. */
class MlFuzzSpec extends SparkSpec {
  import spark.implicits._

  private def corpus = {
    val r = new scala.util.Random(7)
    (0L until 40L).map(i =>
      (i, Seq.fill(6)((r.nextGaussian()).toFloat),
        if (i % 2 == 0) 1.0 else 0.0))
      .toDF("vec_id", "embedding", "y")
  }
  private def emptyVecs = Seq.empty[(Long, Seq[Float], Double)]
    .toDF("vec_id", "embedding", "y")
  private def allNullVecs = Seq((1L, Option.empty[Seq[Float]], 1.0),
    (2L, Option.empty[Seq[Float]], 0.0)).toDF("vec_id", "embedding", "y")

  // ---- fit-side: empty / all-null input must be a diagnostic require

  test("KMeansClusterer/RidgeProbe/Whitener fit on empty or all-null " +
      "input: diagnostic IllegalArgumentException, never an NPE") {
    for (df <- Seq(emptyVecs, allNullVecs)) {
      val e1 = intercept[IllegalArgumentException] {
        new KMeansClusterer().setInputCol("embedding").fit(df)
      }
      assert(e1.getMessage.contains("no non-null"))
      val e2 = intercept[IllegalArgumentException] {
        new RidgeProbe().setInputCol("embedding").setLabelCol("y")
          .setIters(3).fit(df)
      }
      assert(e2.getMessage.contains("no non-null"))
      val e3 = intercept[IllegalArgumentException] {
        new Whitener().setInputCol("embedding").setK(2).fit(df)
      }
      assert(e3.getMessage.contains("no non-null"))
    }
  }

  test("RidgeProbe fit with ALL-NULL labels: diagnostic require " +
      "naming the label column, not NaN coefficients") {
    val df = corpus.withColumn("y",
      lit(null).cast("double"))
    val e = intercept[IllegalArgumentException] {
      new RidgeProbe().setInputCol("embedding").setLabelCol("y")
        .setIters(3).fit(df)
    }
    assert(e.getMessage.contains("y"))
  }

  test("fit-side dim mismatch (a shorter vector mid-corpus): " +
      "diagnostic error naming the length conflict, never an NPE") {
    val mixed = corpus.unionByName(
      Seq((99L, Seq(1.0f, 2.0f), 1.0)).toDF("vec_id", "embedding", "y"))
    for (fit <- Seq[org.apache.spark.sql.DataFrame => Any](
        df => new Whitener().setInputCol("embedding").setK(2).fit(df),
        df => new RidgeProbe().setInputCol("embedding").setLabelCol("y")
          .setIters(3).fit(df))) {
      val e = intercept[Throwable] { fit(mixed) }
      def chain(t: Throwable): Seq[Throwable] =
        if (t == null) Nil else t +: chain(t.getCause)
      val msgs = chain(e).map(t => s"${t.getClass.getName}: " +
        s"${Option(t.getMessage).getOrElse("")}")
      assert(!chain(e).exists(_.isInstanceOf[NullPointerException]),
        s"NPE in: $msgs")
      assert(msgs.exists(m => m.contains("gram_moments") ||
        m.contains("length")), s"undiagnostic failure: $msgs")
    }
  }

  // ---- transform-side: rows preserved, nulls propagate, no crashes

  test("KMeansClustererModel/WhitenerModel/RidgeProbeModel transform " +
      "on null or dim-mismatched vectors: row preserved, null output") {
    val km = new KMeansClusterer().setInputCol("embedding")
      .setK(3).setIters(1).fit(corpus)
    val wh = new Whitener().setInputCol("embedding").setK(2).fit(corpus)
    val rp = new RidgeProbe().setInputCol("embedding").setLabelCol("y")
      .setIters(5).fit(corpus)
    val weird = corpus.limit(2).unionByName(
      Seq((100L, Option.empty[Seq[Float]], 0.0),
        (101L, Some(Seq(9.0f)), 0.0)) // wrong dimensionality
        .toDF("vec_id", "embedding", "y"))
    val k = km.transform(weird).select("vec_id", "centroid_id")
      .collect().map(r => r.getLong(0) ->
        (if (r.isNullAt(1)) None else Some(r.getLong(1)))).toMap
    assert(k.size == 4)
    assert(k(100L).isEmpty && k(101L).isEmpty)
    assert(k.filterKeys(_ < 100).values.forall(_.nonEmpty))
    val w = wh.transform(weird).select("vec_id", "whitened")
      .collect().map(r => r.getLong(0) -> r.isNullAt(1)).toMap
    assert(w.size == 4 && w(100L) && w(101L) &&
      !w.filterKeys(_ < 100).values.exists(identity))
    val s = rp.transform(weird).select("vec_id", "score", "keep")
      .collect().map(r => r.getLong(0) ->
        (r.isNullAt(1), r.isNullAt(2))).toMap
    assert(s.size == 4)
    assert(s(100L) == ((true, true)))
    assert(s.filterKeys(_ < 100).values.forall(_ == ((false, false))))
  }

  test("stateless transformers on EMPTY input: empty output with the " +
      "declared schema, no jobs failing") {
    val noDocs = Seq.empty[(Long, String)].toDF("doc_id", "text")
    val he = new HashedEmbedder().setIdCol("doc_id")
      .setInputCol("text").setDim(8).setFamily("md5")
      .transform(noDocs)
    assert(he.count() == 0 &&
      he.schema.fieldNames.toSeq == Seq("doc_id", "dim", "val"))
    val noEav = Seq.empty[(Long, Int, Double)]
      .toDF("doc_id", "dim", "val")
    assert(new EavToVector().setIdCol("doc_id").setDim(4)
      .transform(noEav).count() == 0)
    val noRows = Seq.empty[(Long, String)].toDF("id", "domain")
    val split = new GroupedSplitAssigner().setGroupCol("domain")
      .transform(noRows)
    assert(split.count() == 0 &&
      split.schema.fieldNames.contains("split"))
  }

  test("HashedEmbedder: null/empty text rows vanish (no tokens — the " +
      "documented empty-doc semantics), others unaffected") {
    val docs = Seq((1L, Some("alpha beta")), (2L, None), (3L, Some("")))
      .toDF("doc_id", "text")
    val out = new HashedEmbedder().setIdCol("doc_id")
      .setInputCol("text").setDim(8).setFamily("md5").transform(docs)
      .select("doc_id").as[Long].collect().toSet
    assert(out == Set(1L))
  }

  test("GroupedSplitAssigner: null group keys get a NULL split " +
      "(visibly unassigned), never silently clustered") {
    val rows = Seq((1L, Some("a.com")), (2L, None), (3L, Some("b.org")))
      .toDF("id", "domain")
    val out = new GroupedSplitAssigner().setGroupCol("domain")
      .transform(rows)
      .select("id", "split").collect()
      .map(r => r.getLong(0) -> Option(r.getString(1))).toMap
    assert(out(2L).isEmpty && out(1L).nonEmpty && out(3L).nonEmpty)
  }

  test("VocabIndexer: fit on empty/all-null input yields a UNK-only " +
      "model (everything indexes to 0); null rows at transform time " +
      "index to UNK as well") {
    val empty = Seq.empty[(Long, String)].toDF("id", "key")
    val m = new VocabIndexer().setInputCol("key").setOutputCol("ki")
      .fit(empty)
    val applied = m.transform(
        Seq((1L, Some("x")), (2L, None)).toDF("id", "key"))
      .select("id", "ki").collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(applied == Map(1L -> 0, 2L -> 0))
  }
}
