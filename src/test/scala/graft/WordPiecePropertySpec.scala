package graft

import graft.ops.{Unigram, WordPiece}
import org.apache.spark.sql.functions._
import scala.util.Random

/** The native greedy walk + relational positional vocab against a
  * straight per-word reference WordPiece (longest-match loop over
  * (piece, cont) sets), on a deterministic grid of random corpora over
  * a 3-letter alphabet — maximal piece-overlap stress where greedy vs
  * optimal segmentations diverge and the start/continuation split
  * matters. (Determinism beats shrinkage — ViodPropertySpec's
  * convention.) */
class WordPiecePropertySpec extends SparkSpec {
  import spark.implicits._

  /** Reference greedy longest-match-first segmentation. */
  private def refSegment(w: String, start: Set[String],
      cont: Set[String], maxLen: Int): List[String] = {
    val out = scala.collection.mutable.ListBuffer[String]()
    var pos = 0
    while (pos < w.length) {
      val set = if (pos == 0) start else cont
      var l = math.min(maxLen, w.length - pos)
      var hit: String = null
      while (l >= 1 && hit == null) {
        val s = w.substring(pos, pos + l)
        if (set.contains(s)) hit = s else l -= 1
      }
      if (hit == null) return List("[UNK]")
      out += (if (pos == 0) hit else "##" + hit)
      pos += hit.length
    }
    out.toList
  }

  /** Reference positional vocab: all singles + topM multis under
    * (cnt desc, piece asc, cont asc). */
  private def refVocab(words: Map[String, Long], maxLen: Int, topM: Int)
      : (Set[String], Set[String]) = {
    val cnt = scala.collection.mutable.Map[(String, Boolean), Long]()
    words.foreach { case (w, f) =>
      for (i <- 0 until w.length;
           j <- i until math.min(i + maxLen, w.length)) {
        val k = (w.substring(i, j + 1), i > 0)
        cnt(k) = cnt.getOrElse(k, 0L) + f
      }
    }
    val singles = cnt.keys.filter(_._1.length == 1).toSet
    val multis = cnt.toList.filter(_._1._1.length > 1)
      .sortBy { case ((p, c), n) => (-n, p, c) }
      .take(topM).map(_._1).toSet
    val all = singles ++ multis
    (all.filter(!_._2).map(_._1), all.filter(_._2).map(_._1))
  }

  test("fitSegment matches the reference on random 3-letter corpora") {
    for (seed <- 1 to 6) {
      val rnd = new Random(seed)
      val words = (1 to 30).map { _ =>
        (1 to (2 + rnd.nextInt(7)))
          .map(_ => ('a' + rnd.nextInt(3)).toChar).mkString
      }.groupBy(identity).view.mapValues(_.size.toLong).toMap
      val docs = words.flatMap { case (w, f) =>
        Seq.fill(f.toInt)(w) }.mkString(" ")
      val (maxLen, topM) = (2 + rnd.nextInt(3), 3 + rnd.nextInt(8))
      val wt = Unigram.words(Seq(docs).toDF("text"), "text")
      val got = WordPiece.segmentWords(wt,
          WordPiece.vocab(wt, maxLen, topM))
        .select($"w", concat_ws("|", $"pieces"))
        .as[(String, String)].collect().toMap
      val (start, cont) = refVocab(words, maxLen, topM)
      words.keys.foreach { w =>
        val want = refSegment(w, start, cont, maxLen).mkString("|")
        assert(got(w) == want,
          s"seed=$seed w=$w maxLen=$maxLen topM=$topM: " +
            s"got ${got(w)}, want $want")
      }
    }
  }
}
