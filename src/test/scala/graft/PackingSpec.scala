package graft

import graft.serve.Packing
import org.apache.spark.sql.functions._

/** Concat-and-chunk sequence packing: placement math and invariants. */
class PackingSpec extends SparkSpec {
  import spark.implicits._

  test("packSequences: known-answer placement within one shard") {
    // ctx=10; docs of 4,3,5,10,1 tokens at offsets 0,4,7,12,22
    val docs = Seq((1L, 4), (2L, 3), (3L, 5), (4L, 10), (5L, 1))
      .toDF("id", "n_tok").withColumn("shard", lit(0))
    val out = Packing.packSequences(docs, "id", "n_tok", ctxLen = 10,
      shardCol = "shard")
      .select("id", "off", "first_seq", "offset_in_seq", "n_seqs")
      .as[(Long, Long, Long, Long, Long)].collect()
      .map(r => r._1 -> (r._2, r._3, r._4, r._5)).toMap
    assert(out(1L) == (0L, 0L, 0L, 1L))
    assert(out(2L) == (4L, 0L, 4L, 1L))
    assert(out(3L) == (7L, 0L, 7L, 2L)) // straddles windows 0 and 1
    assert(out(4L) == (12L, 1L, 2L, 2L)) // 12..21 spans windows 1,2
    assert(out(5L) == (22L, 2L, 2L, 1L))
  }

  test("packSequences: shards pack independently; empty docs excluded") {
    val docs = Seq((1L, 0, 6), (2L, 0, 6), (3L, 1, 6), (4L, 1, 0))
      .toDF("id", "shard", "n_tok")
    val out = Packing.packSequences(docs, "id", "n_tok", ctxLen = 4,
      shardCol = "shard")
    assert(out.count() == 3) // zero-token doc 4 occupies no window
    val byId = out.select("id", "off").as[(Long, Long)].collect().toMap
    assert(byId(1L) == 0L && byId(2L) == 6L)
    assert(byId(3L) == 0L) // shard 1 restarts at offset 0
    // invariant: every doc's offset equals the sum of its predecessors
    // regardless of input partitioning
    val shuffled = Packing.packSequences(docs.repartition(7), "id",
      "n_tok", ctxLen = 4, shardCol = "shard")
      .select("id", "off").as[(Long, Long)].collect().toMap
    assert(shuffled == byId)
  }

  test("chunkDocs: stride windows cover every token, overlap right") {
    val docs = Seq((1L, 10L), (2L, 4L), (3L, 3L), (4L, 0L), (5L, 9L))
      .toDF("id", "n_tok")
    val ch = Packing.chunkDocs(docs, "id", "n_tok", maxLen = 4,
      stride = 3)
      .select("id", "chunk_idx", "tok_start", "tok_end")
      .as[(Long, Long, Long, Long)].collect()
      .groupBy(_._1).view.mapValues(_.sortBy(_._2)
        .map(r => (r._3, r._4)).toList).toMap
    // n=10, L=4, S=3: starts 0,3,6 → last covers [6,10)
    assert(ch(1L) == List((0L, 4L), (3L, 7L), (6L, 10L)))
    assert(ch(2L) == List((0L, 4L))) // n == L: single window
    assert(ch(3L) == List((0L, 3L))) // n < L: single short window
    assert(!ch.contains(4L))         // zero-token doc excluded
    // n=9: starts 0,3,6 → final window is shorter, ends at n
    assert(ch(5L) == List((0L, 4L), (3L, 7L), (6L, 9L)))
    // coverage invariant: union of [start,end) == [0,n) for every doc
    ch.foreach { case (_, spans) =>
      val covered = spans.flatMap { case (s, e) => s until e }.toSet
      assert(covered == (0L until spans.last._2).toSet)
    }
  }

  test("shardWindows: ceil(token/ctx) windows per shard") {
    val docs = Seq((1L, 0, 6), (2L, 0, 6), (3L, 1, 4)).toDF(
      "id", "shard", "n_tok")
    val packed = Packing.packSequences(docs, "id", "n_tok", 4, "shard")
    val w = Packing.shardWindows(packed, 4)
      .select("shard", "total_tokens", "n_windows")
      .as[(Int, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    assert(w == Map(0 -> ((12L, 3L)), 1 -> ((4L, 1L))))
  }

  test("lengthBucketStats: pow2 ceilings, boundary values, batch " +
      "ceil-div, waste accounting, zero-length drop") {
    // 16 is the floor; 17 rounds to 32; exact powers stay put
    val docs = Seq(1L, 16L, 17L, 32L, 33L, 100L, 128L, 129L, 0L)
      .toDF("n_tok")
    val got = Packing.lengthBucketStats(docs, "n_tok", batchSize = 2)
      .select("bucket", "n_docs", "n_tokens", "n_batches", "waste_frac")
      .as[(Long, Long, Long, Long, Double)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4, r._5))).toMap
    assert(got.keySet == Set(16L, 32L, 64L, 128L, 256L))
    assert(got(16L) == ((2L, 17L, 1L,
      math.rint((1.0 - 17.0 / 32) * 1e6) / 1e6)))
    assert(got(32L) == ((2L, 49L, 1L,
      math.rint((1.0 - 49.0 / 64) * 1e6) / 1e6)))
    assert(got(64L) == ((1L, 33L, 1L,
      math.rint((1.0 - 33.0 / 64) * 1e6) / 1e6)))
    assert(got(128L) == ((2L, 228L, 1L,
      math.rint((1.0 - 228.0 / 256) * 1e6) / 1e6)))
    assert(got(256L) == ((1L, 129L, 1L,
      math.rint((1.0 - 129.0 / 256) * 1e6) / 1e6)))
    // batch ceil-div: 3 docs at batchSize 2 -> 2 batches
    val b3 = Packing.lengthBucketStats(
        Seq(5L, 6L, 7L).toDF("n_tok"), "n_tok", batchSize = 2)
      .select("n_batches").as[Long].collect()
    assert(b3.toSeq == Seq(2L))
  }
}
