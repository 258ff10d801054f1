package graft

import graft.ops.Bpe
import org.apache.spark.sql.functions._

/** BPE vocabulary learning: the Sennrich fit loop done relationally. */
class BpeSpec extends SparkSpec {
  import spark.implicits._

  test("fit learns the classic merges in order with lexicographic ties") {
    // Sennrich-style corpus: {low:5, lower:2, newest:6, widest:3}.
    val docs = (Seq.fill(5)("low") ++ Seq.fill(2)("lower") ++
      Seq.fill(6)("newest") ++ Seq.fill(3)("widest"))
      .zipWithIndex.map { case (w, i) => (i.toLong, w) }
      .toDF("doc_id", "text")
    val merges = Bpe.fit(docs, "text", 5)
      .select("rank", "lhs", "rhs", "pair_count")
      .as[(Int, String, String, Long)].collect().toList
    // (e,s)=9 ties (s,t)=9 → lexicographic s1 picks (e,s); then es+t,
    // l+o ties o+w at 7 → l first, then lo+w, then (e,w)=6 among the
    // 6-count tie {(e,w),(n,e),(w,est)}.
    assert(merges == List(
      (1, "e", "s", 9L), (2, "es", "t", 9L), (3, "l", "o", 7L),
      (4, "lo", "w", 7L), (5, "e", "w", 6L)))
  }

  test("mergeStep is greedy-leftmost on self-pair runs") {
    val docs = Seq((0L, "aaaa"), (1L, "aaa")).toDF("doc_id", "text")
    val merged = Bpe.mergeStep(Bpe.initialSymbols(docs, "text"), "a", "a")
      .groupBy("w").agg(collect_list(struct(col("i"), col("sym")))
        .as("ss"))
      .select(col("w"), expr("transform(array_sort(ss), x -> x.sym)")
        .as("syms"))
      .as[(String, Seq[String])].collect().toMap
    // "a a a a" + merge(a,a) → "aa aa"; "a a a" → "aa a" (NOT "a aa")
    assert(merged("aaaa") == Seq("aa", "aa"))
    assert(merged("aaa") == Seq("aa", "a"))
  }

  test("fit stops early when no pair remains") {
    val docs = Seq((0L, "ab ab")).toDF("doc_id", "text")
    val merges = Bpe.fit(docs, "text", 10)
      .select("lhs", "rhs").as[(String, String)].collect().toList
    assert(merges == List(("a", "b")))
  }

  test("applyMerges: saved merges encode a NEW corpus (tokenizer " +
    "save/load as data)") {
    val train = (Seq.fill(5)("low") ++ Seq.fill(2)("lower") ++
      Seq.fill(6)("newest") ++ Seq.fill(3)("widest"))
      .zipWithIndex.map { case (w, i) => (i.toLong, w) }
      .toDF("doc_id", "text")
    val dir = java.nio.file.Files.createTempDirectory("bpe").toString
    Bpe.saveMerges(Bpe.fit(train, "text", 4), dir)
    // encode unseen words with the reloaded merges: "lowest" uses the
    // learned lo/low/es/est pieces; OOV "zzz" stays characters
    val fresh = Seq((0L, "lowest zzz")).toDF("doc_id", "text")
    val enc = Bpe.applyMerges(fresh, "text", Bpe.loadMerges(spark, dir))
      .groupBy("w").agg(collect_list(struct(col("i"), col("sym")))
        .as("ss"))
      .select(col("w"), expr("transform(array_sort(ss), x -> x.sym)")
        .as("syms"))
      .as[(String, Seq[String])].collect().toMap
    // merges learned: (e,s),(es,t),(l,o),(lo,w) → lowest = low|est
    assert(enc("lowest") == Seq("low", "est"))
    assert(enc("zzz") == Seq("z", "z", "z"))
  }

  test("segment reassembles every word exactly") {
    val docs = (Seq.fill(5)("low") ++ Seq.fill(2)("lower") ++
      Seq.fill(6)("newest") ++ Seq.fill(3)("widest"))
      .zipWithIndex.map { case (w, i) => (i.toLong, w) }
      .toDF("doc_id", "text")
    val bad = Bpe.segment(docs, "text", 4)
      .groupBy("w").agg(collect_list(struct(col("i"), col("sym")))
        .as("ss"))
      .select(col("w"), expr(
        "array_join(transform(array_sort(ss), x -> x.sym), '')")
        .as("joined"))
      .filter(col("w") =!= col("joined"))
    assert(bad.count() == 0)
    // 4 merges: "low" is a single symbol, "newest" is n|e|w|est
    val segs = Bpe.segment(docs, "text", 4)
      .groupBy("w").agg(collect_list(struct(col("i"), col("sym")))
        .as("ss"))
      .select(col("w"), expr("transform(array_sort(ss), x -> x.sym)")
        .as("syms"))
      .as[(String, Seq[String])].collect().toMap
    assert(segs("low") == Seq("low"))
    assert(segs("newest") == Seq("n", "e", "w", "est"))
  }
}
