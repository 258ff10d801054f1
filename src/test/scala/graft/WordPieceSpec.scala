package graft

import graft.ops.{Unigram, WordPiece}
import org.apache.spark.sql.functions._

class WordPieceSpec extends SparkSpec {
  import spark.implicits._

  private def vocabDf(rows: (String, Boolean, Long)*) =
    rows.toDF("piece", "cont", "cnt")

  test("greedy longest-match-first with positional vocab and ## prefix") {
    // start: un, u, a, b; cont: able, ab, a, b, l, e, n
    val vocab = vocabDf(
      ("un", false, 9L), ("u", false, 1L), ("a", false, 1L),
      ("b", false, 1L),
      ("able", true, 5L), ("ab", true, 2L), ("a", true, 1L),
      ("b", true, 1L), ("l", true, 1L), ("e", true, 1L), ("n", true, 1L))
    val words = Seq(("unable", 1L), ("aab", 1L), ("ba", 1L))
      .toDF("w", "freq")
    val got = WordPiece.segmentWords(words, vocab)
      .select($"w", concat_ws("|", $"pieces"))
      .as[(String, String)].collect().toMap
    // longest-first: "un" then "##able" (not ##ab|##l|##e)
    assert(got("unable") == "un|##able")
    // at pos 1, "ab" (cont, len 2) beats "a"
    assert(got("aab") == "a|##ab")
    assert(got("ba") == "b|##a")
  }

  test("start vs continuation sets are disjoint lookups") {
    // "ab" exists ONLY as a continuation — word starting with it must
    // fall back to the start single "a"
    val vocab = vocabDf(
      ("a", false, 1L), ("ab", true, 5L), ("b", true, 1L))
    val words = Seq(("abb", 1L)).toDF("w", "freq")
    val got = WordPiece.segmentWords(words, vocab)
      .select(concat_ws("|", $"pieces")).as[String].collect()
    assert(got.toSeq == Seq("a|##b|##b"))
  }

  test("out-of-vocabulary position collapses the word to [UNK]") {
    val vocab = vocabDf(("a", false, 1L), ("a", true, 1L))
    val words = Seq(("aa", 1L), ("ax", 1L), ("xa", 1L))
      .toDF("w", "freq")
    val got = WordPiece.segmentWords(words, vocab)
      .select($"w", concat_ws("|", $"pieces"))
      .as[(String, String)].collect().toMap
    assert(got("aa") == "a|##a")
    assert(got("ax") == "[UNK]") // stuck at pos 1
    assert(got("xa") == "[UNK]") // stuck at pos 0
  }

  test("fit on own corpus never yields [UNK]; vocab counts positional") {
    val docs = Seq("the cat sat", "the cat ran", "a cat").toDF("text")
    val wt = Unigram.words(docs, "text")
    val v = WordPiece.vocab(wt, maxPieceLen = 4, topM = 3)
    // positional split: 't' appears both word-start (the) and as
    // continuation (cat, sat); both forms must exist
    val forms = v.select("piece", "cont").as[(String, Boolean)]
      .collect().toSet
    assert(forms.contains(("t", false)) && forms.contains(("t", true)))
    val segs = WordPiece.segmentWords(wt, v)
      .select(concat_ws("|", $"pieces")).as[String].collect()
    assert(segs.nonEmpty && !segs.exists(_.contains("[UNK]")))
  }

  test("vocab round-trips through parquet (params as data)") {
    val docs = Seq("aa ab ba").toDF("text")
    val wt = Unigram.words(docs, "text")
    val v = WordPiece.vocab(wt, maxPieceLen = 2, topM = 5)
    val dir = java.nio.file.Files
      .createTempDirectory("wp_vocab").toString
    WordPiece.saveVocab(v, dir)
    val re = WordPiece.loadVocab(spark, dir)
    val a = v.select("piece", "cont", "cnt")
      .as[(String, Boolean, Long)].collect().sorted
    val b = re.select("piece", "cont", "cnt")
      .as[(String, Boolean, Long)].collect().sorted
    assert(a.toSeq == b.toSeq)
    // reloaded vocab segments identically
    val s1 = WordPiece.segmentWords(wt, v)
      .select($"w", concat_ws("|", $"pieces"))
      .as[(String, String)].collect().sorted
    val s2 = WordPiece.segmentWords(wt, re)
      .select($"w", concat_ws("|", $"pieces"))
      .as[(String, String)].collect().sorted
    assert(s1.toSeq == s2.toSeq)
  }
}
