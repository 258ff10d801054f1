package graft

import graft.ops.{Hnsw, Similarity}
import org.apache.spark.sql.functions._

/** HNSW-style layered ANN (ops/Hnsw.scala): replayable level walk,
  * banded-bucket layered adjacency, fixed-step batch beam search. */
class HnswSpec extends SparkSpec {
  import spark.implicits._

  // a clusterable corpus: 8 well-separated unit directions in 8-d, each
  // with 30 jittered members — the regime a graph index is FOR
  private def clustered = (0 until 240).map { i =>
    val c = i % 8
    val v = Array.tabulate(8)(j =>
      (if (j == c) 1.0f else 0.0f) +
        (math.sin(i * 7.31 + j) * 0.05).toFloat)
    (i.toLong, v.toSeq)
  }

  test("assignLevels: deterministic, bounded, geometric-ish halving") {
    val df = spark.range(4000).select(col("id"))
    val lv = Hnsw.assignLevels(df, "id", seed = 9, maxLevel = 3)
      .groupBy("level").count().collect()
      .map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(lv.keySet.subsetOf(Set(0, 1, 2, 3)))
    // P(level ≥ 1) = 1/2, ≥2 = 1/4, ≥3 = 1/8 (level 3 absorbs the tail)
    val ge1 = lv.filterKeys(_ >= 1).values.sum.toDouble / 4000
    val ge3 = lv.getOrElse(3, 0L).toDouble / 4000
    assert(math.abs(ge1 - 0.5) < 0.05, s"P(>=1)=$ge1")
    assert(math.abs(ge3 - 0.125) < 0.03, s"P(>=3)=$ge3")
    // replay: identical on a second run (pure function of (id, seed))
    val again = Hnsw.assignLevels(df, "id", seed = 9, maxLevel = 3)
      .groupBy("level").count().collect()
      .map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(again == lv)
  }

  test("buildAdjacency: symmetric, self-loop-free, members-only, " +
    "vectors embedded") {
    val corpus = clustered.toDF("id", "v")
    val adj = Hnsw.buildAdjacency(corpus, "id", "v", seed = 9,
      maxLevel = 2, m = 4, bands = 2,
      Hnsw.defaultBucketFn(nPlanes = 3, dim = 8, seed = 9))
    val edges = adj.select("lvl", "src", "dst").collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2))).toSet
    assert(edges.nonEmpty)
    assert(edges.forall { case (_, s, d) => s != d }, "self loop")
    assert(edges.forall { case (l, s, d) => edges.contains((l, d, s)) },
      "reverse edge missing")
    // layer ℓ edges only among level ≥ ℓ members
    val lv = Hnsw.assignLevels(corpus.select(col("id")), "id", 9, 2)
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(edges.forall { case (l, s, d) => lv(s) >= l && lv(d) >= l })
    // embedded vector is the destination's corpus vector
    val one = adj.limit(1).collect()(0)
    val dvec = one.getSeq[Float](3)
    assert(dvec == clustered.find(_._1 == one.getLong(2)).get._2)
  }

  test("searchTopK: contract shape, determinism, cosine bounded by " +
    "brute-force, high recall on a clusterable corpus") {
    val corpus = clustered.toDF("id", "v")
    val queries = (0 until 16).map { i =>
      val c = i % 8
      (1000L + i, Array.tabulate(8)(j =>
        (if (j == c) 1.0f else 0.0f) +
          (math.cos(i * 3.7 + j) * 0.05).toFloat).toSeq)
    }.toDF("qid", "qv")
    def run() = Hnsw.hnswTopK(corpus, queries, "id", "v", "qid", "qv",
      k = 3, seed = 9, maxLevel = 2, m = 6, bands = 2, steps = 2,
      ef = 6, nPlanes = 3, dim = 8)
    val out = run().collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3)))
    // shape: ≤k ranked rows per query, ranks contiguous, cos descending
    val byQ = out.groupBy(_._1)
    assert(byQ.size == 16)
    byQ.values.foreach { rows =>
      val sorted = rows.sortBy(_._4)
      assert(sorted.map(_._4).toSeq == (1 to rows.length))
      assert(sorted.map(_._3).toSeq == sorted.map(_._3).sortBy(-_).toSeq)
    }
    // determinism: bit-identical second run
    val again = run().collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3)))
    assert(out.toSet == again.toSet)
    // never better than exact, and on clusterable data the top-1 IS the
    // exact nearest for nearly every query
    val exact = Similarity.bruteForceTopK(corpus, queries, "id", "v",
        "qid", "qv", k = 1)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2)))
      .toMap
    val top1 = byQ.view.mapValues(_.minBy(_._4)).toMap
    top1.foreach { case (q, (_, id, c, _)) =>
      assert(c <= exact(q)._2 + 1e-6, s"q $q: $c > exact ${exact(q)._2}")
    }
    val hit = top1.count { case (q, (_, id, _, _)) => id == exact(q)._1 }
    assert(hit >= 13, s"recall@1 on clustered corpus: $hit/16")
  }

  test("hnswTopK production path auto-scales planes and levels with " +
    "the corpus (linear-build guardrail) and still answers well") {
    val corpus = clustered.toDF("id", "v")
    val queries = (0 until 8).map { i =>
      (1000L + i, Array.tabulate(8)(j =>
        (if (j == i % 8) 1.0f else 0.0f)).toSeq)
    }.toDF("qid", "qv")
    // tiny targets force the auto path well past the defaults:
    // 240 rows / bucketTarget 8 → 5 planes; headTarget 32 → 3 levels
    val out = Hnsw.hnswTopK(corpus, queries, "id", "v", "qid", "qv",
      k = 2, seed = 9, maxLevel = 1, m = 6, bands = 2, steps = 2,
      ef = 6, nPlanes = 1, dim = 8, bucketTarget = 8, headTarget = 32)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2),
        r.getInt(3)))
    assert(out.groupBy(_._1).size == 8)
    val exact = Similarity.bruteForceTopK(corpus, queries, "id", "v",
        "qid", "qv", k = 1)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val hit = out.filter(_._4 == 1)
      .count { case (q, id, _, _) => exact(q) == id }
    assert(hit >= 6, s"auto-path recall@1: $hit/8")
  }
}
