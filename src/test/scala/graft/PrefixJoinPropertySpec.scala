package graft

import graft.ops.Dedup
import org.apache.spark.sql.functions._
import scala.util.Random

/** Property check: the prefix-filtered exact similarity join loses
  * NOTHING versus brute-force all-pairs enumeration — the pigeonhole
  * prefix bound is result-preserving at any threshold — on random
  * corpora engineered to contain near-dups, exact dups, disjoint docs,
  * and short docs. */
class PrefixJoinPropertySpec extends SparkSpec {
  import spark.implicits._

  private val vocab = Vector("alpha", "beta", "gamma", "delta", "eps",
    "zeta", "eta", "theta", "iota", "kappa", "lam", "mu", "nu", "xi")

  private def randomCorpus(rng: Random, nDocs: Int): Seq[(Long, String)] =
    (0 until nDocs).map { i =>
      val base = Seq.fill(4 + rng.nextInt(10))(
        vocab(rng.nextInt(vocab.size)))
      val words = rng.nextInt(4) match {
        case 0 => base // fresh doc
        case 1 => base // will collide with its own copy below
        case 2 => base.updated(rng.nextInt(base.size),
          vocab(rng.nextInt(vocab.size))) // near-variant
        case _ => Seq.fill(2 + rng.nextInt(3))(
          vocab(rng.nextInt(vocab.size))) // short doc
      }
      (i.toLong, words.mkString(" "))
    } ++ Seq((nDocs.toLong, vocab.take(6).mkString(" ")),
      (nDocs + 1L, vocab.take(6).mkString(" "))) // planted exact dup

  test("prefixJaccardPairs == one-block brute force on random corpora " +
      "across thresholds") {
    val rng = new Random(20250813L)
    for (trial <- 1 to 3; threshold <- Seq(0.2, 0.5, 0.8)) {
      val docs = randomCorpus(rng, 40).toDF("doc_id", "text")
      val fast = Dedup.prefixJaccardPairs(docs, "doc_id", "text",
        n = 2, threshold = threshold)
        .select("id_a", "id_b", "jaccard")
        .as[(Long, Long, Double)].collect().toSet
      val brute = Dedup.ngramJaccardPairs(
        docs.withColumn("blk", lit(1)), "doc_id", "text", "blk",
        n = 2, threshold = threshold)
        .select("id_a", "id_b", "jaccard")
        .as[(Long, Long, Double)].collect().toSet
      assert(fast == brute,
        s"trial=$trial threshold=$threshold: " +
          s"missing=${brute -- fast} extra=${fast -- brute}")
      // the planted exact dup must always survive
      assert(fast.exists(p => p._1 == 40L && p._2 == 41L && p._3 == 1.0))
    }
  }
}
