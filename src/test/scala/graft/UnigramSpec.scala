package graft

import graft.ops.Unigram
import org.apache.spark.sql.functions._

class UnigramSpec extends SparkSpec {
  import spark.implicits._

  private def vocabDf(rows: (String, Long)*) =
    rows.toDF("piece", "cnt")

  test("unigramViterbi: hand-computed DP — multiplicative scores, " +
      "argmax over segmentations") {
    // p: ab=0.4, a=0.1, b=0.2, c=0.3 (literal probs via cnt/total=10)
    val vocab = Unigram.withProbs(
      vocabDf("ab" -> 4L, "a" -> 1L, "b" -> 2L, "c" -> 3L))
    val words = Seq(("ab", 1L), ("abc", 1L), ("ba", 1L))
      .toDF("w", "freq")
    val got = Unigram.segmentWords(words, vocab)
      .select($"w", concat_ws("|", $"pieces"), $"score")
      .as[(String, String, Double)]
      .collect().map(r => r._1 -> (r._2, r._3)).toMap
    // "ab": piece ab (0.4) beats a|b (0.02)
    assert(got("ab") == ("ab", 0.4))
    // "abc": ab|c = 0.4*0.3 = 0.12 beats a|b|c = 0.006
    assert(got("abc")._1 == "ab|c")
    assert(got("abc")._2 == 0.4 * 0.3)
    // "ba": only b|a
    assert(got("ba") == ("b|a", 0.2 * 0.1))
  }

  test("unigramViterbi: exact ties keep the smallest split start " +
      "(longest final piece); unsegmentable words drop") {
    // dyadic probs: aa = 0.25, a = 0.5 -> "aa" vs "a|a" tie at 0.25
    val vocab = Unigram.withProbs(vocabDf("aa" -> 1L, "a" -> 2L, "z" -> 1L))
    val words = Seq(("aa", 1L), ("aq", 1L)).toDF("w", "freq")
    val got = Unigram.segmentWords(words, vocab)
      .select($"w", concat_ws("|", $"pieces"))
      .as[(String, String)].collect().toMap
    assert(got("aa") == "aa") // tie -> single piece
    assert(!got.contains("aq")) // 'q' uncovered -> dropped
  }

  test("seedVocab: all single codepoints kept, top-M multis by " +
      "(weighted count desc, piece asc); weights are word freqs") {
    val wt = Seq(("aba", 3L), ("ab", 2L)).toDF("w", "freq")
    val got = Unigram.seedVocab(wt, maxPieceLen = 2, topM = 2)
      .as[(String, Long)].collect().toMap
    // singles: a occurs 2*3+1*2=8, b occurs 3+2=5
    assert(got("a") == 8L && got("b") == 5L)
    // multis: ab 3+2=5, ba 3 -> top2 keeps both
    assert(got("ab") == 5L && got("ba") == 3L)
    val top1 = Unigram.seedVocab(wt, maxPieceLen = 2, topM = 1)
      .as[(String, Long)].collect().toMap
    assert(top1.contains("ab") && !top1.contains("ba"))
  }

  test("hardEmStep: integer Viterbi counts weighted by word freq; " +
      "unused pieces prune; corpus stays segmentable") {
    val wt = Seq(("abab", 5L), ("ab", 2L)).toDF("w", "freq")
    val seed = Unigram.withProbs(Unigram.seedVocab(wt, 3, 50))
    val c1 = Unigram.hardEmStep(wt, seed)
    val counts = c1.as[(String, Long)].collect().toMap
    // total piece mass conserved <= original codepoint mass
    assert(counts.values.forall(_ > 0))
    // refit and re-segment: every word still segmentable
    val v1 = Unigram.withProbs(c1)
    val seg2 = Unigram.segmentWords(wt, v1)
    assert(seg2.count() == 2)
  }

  test("saveVocab/loadVocab round-trip: reloaded vocab tokenizes an " +
      "unseen corpus identically (params-as-data, no pickles)") {
    val docs = Seq((1L, "ab ab ba"), (2L, "ab cc")).toDF("doc_id", "text")
    val vocab = Unigram.fit(docs, "text", 2, 20, iters = 1)
    val tmp = java.nio.file.Files
      .createTempDirectory("graft-unigram").toString
    Unigram.saveVocab(vocab, tmp)
    val re = Unigram.loadVocab(spark, tmp)
    val fresh = Seq((9L, "ba ab")).toDF("doc_id", "text")
    val a = Unigram.tokenize(fresh, "doc_id", "text", vocab)
      .as[(Long, Seq[String])].collect().toMap
    val b = Unigram.tokenize(fresh, "doc_id", "text", re)
      .as[(Long, Seq[String])].collect().toMap
    assert(a == b && a.contains(9L))
  }

  test("fit + tokenize: end-to-end on a toy corpus; per-doc piece " +
      "arrays in word order; partition invariance") {
    val docs = Seq((1L, "ab ab ba"), (2L, "ab cc"), (3L, "ba cc cc"))
      .toDF("doc_id", "text")
    val vocab = Unigram.fit(docs, "text", maxPieceLen = 2, topM = 20,
      iters = 2)
    val toks = Unigram.tokenize(docs, "doc_id", "text", vocab)
      .as[(Long, Seq[String])].collect().toMap
    assert(toks.keySet == Set(1L, 2L, 3L))
    // reassembly preserves word order: doc 1 tokens rebuild "ababba"
    assert(toks(1L).mkString == "ababba")
    assert(toks(3L).mkString == "bacccc")
    val toks2 = Unigram.tokenize(docs.repartition(5), "doc_id", "text",
        vocab)
      .as[(Long, Seq[String])].collect().toMap
    assert(toks2 == toks)
  }
}
