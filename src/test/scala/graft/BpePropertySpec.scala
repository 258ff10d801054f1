package graft

import graft.ops.Bpe
import org.apache.spark.sql.functions._
import scala.util.Random

/** The relational gaps-and-islands merge against a straight per-word
  * reference BPE (the obvious left-to-right loop), on a deterministic
  * grid of random corpora over a 2-letter alphabet — maximal self-pair
  * / overlapping-occurrence stress, the case the island parity logic
  * exists for. (No scalatest↔scalacheck bridge in this repo;
  * determinism beats shrinkage — ViodPropertySpec's convention.) */
class BpePropertySpec extends SparkSpec {
  import spark.implicits._

  /** Reference greedy-leftmost merge of (a,b) over one symbol seq. */
  private def refMerge(syms: List[String], a: String, b: String)
      : List[String] = {
    val out = scala.collection.mutable.ListBuffer[String]()
    var i = 0
    while (i < syms.length) {
      if (i + 1 < syms.length && syms(i) == a && syms(i + 1) == b) {
        out += (a + b); i += 2
      } else { out += syms(i); i += 1 }
    }
    out.toList
  }

  /** Reference fit: per-round argmax by (weighted count desc, lhs, rhs)
    * then reference merge of every word. */
  private def refFit(words: Map[String, Long], nMerges: Int)
      : List[(String, String, Long)] = {
    var tabs = words.toList.map { case (w, f) =>
      (w.toList.map(_.toString), f) }
    val merges =
      scala.collection.mutable.ListBuffer[(String, String, Long)]()
    var done = false
    while (merges.size < nMerges && !done) {
      val counts = scala.collection.mutable.Map[(String, String), Long]()
      tabs.foreach { case (syms, f) =>
        syms.zip(syms.tail).foreach(p =>
          counts(p) = counts.getOrElse(p, 0L) + f)
      }
      if (counts.isEmpty) done = true
      else {
        val ((a, b), c) = counts.toList
          .sortBy { case ((x, y), n) => (-n, x, y) }.head
        merges += ((a, b, c))
        tabs = tabs.map { case (s, f) => (refMerge(s, a, b), f) }
      }
    }
    merges.toList
  }

  private def corpus(seed: Int): List[String] = {
    val r = new Random(seed)
    List.fill(1 + r.nextInt(12))(
      List.fill(1 + r.nextInt(8))(
        if (r.nextBoolean()) 'a' else 'b').mkString)
  }

  test("fit == reference BPE on random aa/ab corpora (self-pair runs)") {
    (1 to 12).foreach { seed =>
      val c = corpus(seed)
      val docs = c.zipWithIndex
        .map { case (w, i) => (i.toLong, w) }.toDF("doc_id", "text")
      val got = Bpe.fit(docs, "text", 4)
        .select("lhs", "rhs", "pair_count")
        .as[(String, String, Long)].collect().toList
      val words = c.groupBy(identity).view.mapValues(_.size.toLong).toMap
      assert(got == refFit(words, 4), s"seed $seed corpus $c")
    }
  }

  test("applyMerges (native BpeApplyExpr walk) == the per-rank " +
    "relational mergeStep chain it replaced, on fit-derived merge " +
    "tables over self-pair-heavy corpora") {
    (21 to 28).foreach { seed =>
      val c = corpus(seed)
      val docs = c.zipWithIndex
        .map { case (w, i) => (i.toLong, w) }.toDF("doc_id", "text")
      val merges = Bpe.fit(docs, "text", 4)
      def segs(df: org.apache.spark.sql.DataFrame) = df
        .groupBy("w", "freq")
        .agg(collect_list(struct(col("i"), col("sym"))).as("ss"))
        .select(col("w"), col("freq"),
          expr("transform(array_sort(ss), x -> x.sym)").as("syms"))
        .as[(String, Long, Seq[String])].collect().sortBy(_._1).toList
      // the relational chain applyMerges replaced
      var rel = Bpe.initialSymbols(docs, "text").localCheckpoint(true)
      merges.select("rank", "lhs", "rhs").orderBy("rank").collect()
        .foreach { r =>
          rel = Bpe.mergeStep(rel, r.getString(1), r.getString(2))
            .localCheckpoint(true)
        }
      assert(segs(Bpe.applyMerges(docs, "text", merges)) == segs(rel),
        s"seed $seed corpus $c")
    }
  }

  test("mergeStep == reference merge for a forced self-pair") {
    (13 to 20).foreach { seed =>
      val c = corpus(seed)
      val docs = c.zipWithIndex
        .map { case (w, i) => (i.toLong, w) }.toDF("doc_id", "text")
      val merged = Bpe.mergeStep(
          Bpe.initialSymbols(docs, "text"), "a", "a")
        .groupBy("w").agg(collect_list(struct(col("i"), col("sym")))
          .as("ss"))
        .select(col("w"),
          expr("transform(array_sort(ss), x -> x.sym)").as("syms"))
        .as[(String, Seq[String])].collect().toMap
      c.distinct.foreach { w =>
        assert(merged(w).toList ==
          refMerge(w.toList.map(_.toString), "a", "a"),
          s"seed $seed word $w")
      }
    }
  }
}
