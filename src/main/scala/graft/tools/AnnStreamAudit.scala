package graft.tools

import graft.ops.{AnnIndex, Hnsw, Similarity}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Delta-sized-maintenance audit for the persisted ANN index: seed an
  * index with 90% of the corpus (PRODUCTION auto-scaled params —
  * [[Similarity.autoNPlanes]] sizes planes/levels), then drive a
  * GEOMETRIC SWEEP of insert batch sizes through exactly the chain
  * [[graft.streaming.StreamOps.annIndexMaintenanceStream]]'s
  * foreachBatch runs (load → [[Hnsw.insertKnnDelta]] →
  * [[AnnIndex.append]]), measuring per batch:
  *
  *  - `delta_rows` / `delta_frac`: the storage claim, QUANTIFIED — a
  *    batch touches ≈ its banded bucket footprint, so the delta (and
  *    the append write) is PROPORTIONAL TO THE BATCH, saturating at
  *    the full index only when batch·bands ≳ bucket count. With
  *    auto-scaled planes the bucket count is n/bucketTarget, so the
  *    production regime (daily batch ≪ corpus/bucketTarget/bands —
  *    e.g. 1M arrivals against a 25B-vector index) sits far down the
  *    proportional part of the curve; the sweep makes the whole curve
  *    visible instead of asserting one point.
  *  - `insert_wall_sec` / `append_wall_sec`: compute/storage walls at
  *    batch granularity (vs `seed_build_save_sec`, the rebuild cost
  *    an overwrite-save would re-pay every day).
  *  - a final count check: the loaded index's row count equals the
  *    from-scratch build over seed + all inserted arrivals
  *    (row-level equality is spec-pinned in PersistenceSpec /
  *    StreamingSpec — the audit adds the at-scale cost numbers the
  *    specs can't).
  *
  * Usage: runMain graft.tools.AnnStreamAudit [sfDir] [outPath]
  */
object AnnStreamAudit {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/tmp/sf1")
    val outPath = args.lift(1).getOrElse("ANN_STREAM_AUDIT.json")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def timeSec(body: => Unit): Double = {
      val t0 = System.nanoTime()
      body
      (System.nanoTime() - t0) / 1e9
    }
    def r3(x: Double): Double = math.rint(x * 1000) / 1000

    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
      .select("vec_id", "embedding").localCheckpoint(true)
    val seedVecs = emb.filter(col("vec_id") % 10 =!= 0)
    val n = seedVecs.count()
    val planes = math.max(4, Similarity.autoNPlanes(n, 256L))
    val ml = math.min(40, math.max(3, Similarity.autoNPlanes(n, 4096L)))
    val bf = Hnsw.defaultBucketFn(planes, 64, 9L)
    val idx = java.nio.file.Files
      .createTempDirectory("graft-ann-stream-audit").toString + "/idx"
    val seedSec = timeSec {
      AnnIndex.save(idx,
        Map("knn" -> Hnsw.buildKnn(seedVecs, "vec_id", "embedding",
            9L, ml, 10, 4, bf),
          "vectors" -> seedVecs),
        Map("seed" -> "9", "planes" -> planes.toString,
          "max_level" -> ml.toString, "kind" -> "hnsw"),
        keys = Map("knn" -> Seq("lvl", "src")))
    }
    // arrival pool ranked by vec_id; batches are consecutive slices of
    // geometrically growing size so the delta∝batch curve is visible
    val pool = emb.filter(col("vec_id") % 10 === 0)
      .withColumn("__rk", row_number().over(
        org.apache.spark.sql.expressions.Window.orderBy("vec_id")))
      .localCheckpoint(true)
    val poolN = pool.count()
    val sizes = Iterator.iterate(16L)(_ * 4)
      .takeWhile(_ <= poolN).toSeq
    var used = 0L
    val batches = sizes.zipWithIndex.map { case (sz, bnum) =>
      val take = math.min(sz, poolN - used)
      val arrivals = pool
        .filter(col("__rk") > used && col("__rk") <= used + take)
        .drop("__rk")
      used += take
      val nb = take
      var deltaRows = 0L
      var indexRows = 0L
      var delta: DataFrame = null
      val insertSec = timeSec {
        val (parts, _) = AnnIndex.load(spark, idx)
        delta = Hnsw.insertKnnDelta(parts("knn"), parts("vectors"),
            arrivals, "vec_id", "embedding", 9L, ml, 10, 4, bf)
          .localCheckpoint(true)
        deltaRows = delta.count()
        indexRows = parts("knn").count()
      }
      val appendSec = timeSec {
        AnnIndex.append(idx,
          Map("knn" -> delta, "vectors" -> arrivals))
      }
      s"""{"batch":$bnum,"arrivals":$nb,"delta_rows":$deltaRows,""" +
        s""""index_rows_before":$indexRows,""" +
        s""""delta_frac":${r3(deltaRows.toDouble / indexRows)},""" +
        s""""insert_wall_sec":${r3(insertSec)},""" +
        s""""append_wall_sec":${r3(appendSec)}}"""
    }
    val finalRows = AnnIndex.load(spark, idx)._1("knn").count()
    val insertedAll = seedVecs.unionByName(
      pool.filter(col("__rk") <= used).drop("__rk"))
    val fullRows = Hnsw.buildKnn(insertedAll, "vec_id", "embedding",
      9L, ml, 10, 4, bf).count()
    val json = s"""{"sf":"$sfDir","n_seed":$n,"planes":$planes,""" +
      s""""max_level":$ml,"seed_build_save_sec":${r3(seedSec)},""" +
      s""""batches":[${batches.mkString(",")}],""" +
      s""""final_loaded_rows":$finalRows,""" +
      s""""full_rebuild_rows":$fullRows,""" +
      s""""rows_match":${finalRows == fullRows}}"""
    try java.nio.file.Files.writeString(
      java.nio.file.Paths.get(outPath), json + "\n")
    catch { case e: Throwable =>
      System.err.println(s"[ann-stream-audit] could not write " +
        s"$outPath: ${e.getMessage}")
    }
    println(json)
    spark.stop()
  }
}
