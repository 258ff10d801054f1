package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Params-as-data persistence for ANN index artifacts — the
  * first-class save/load surface the index family was missing: the
  * HNSW directed kNN / adjacency ([[Hnsw]]), IVF centroids, PQ
  * codebooks and int8 scale tables are all plain DataFrames, so an
  * index "file" is a directory of parquet part tables plus a string
  * params table, mirroring the `graft.ml` stages' persistence pattern
  * (everything the loader needs is DATA; no JVM serialization, any
  * engine can read an index back).
  *
  * Layout: `path/<part>/` parquet per part table, `path/_params/`
  * (param, value) strings, `path/_manifest/` (part) names — written
  * LAST, so a torn save has no manifest and `load` fails loudly
  * instead of returning a partial index.
  *
  * 100 TB posture: saving is one parquet write per part (the kNN
  * table, the big one, is (lvl, src, dst, c) rows — ~levels·M rows per
  * corpus vector); loading is lazy parquet scans, so a recall audit
  * against a reloaded index reads only what the search touches. */
object AnnIndex {

  private val partName = "[A-Za-z0-9_]+".r

  def save(path: String, parts: Map[String, DataFrame],
      params: Map[String, String]): Unit = {
    require(parts.nonEmpty, "AnnIndex.save: no part tables")
    parts.keys.foreach(n => require(partName.matches(n) &&
      !n.startsWith("_"), s"AnnIndex part name '$n' must be " +
      "alphanumeric/underscore and not start with '_'"))
    val spark = parts.head._2.sparkSession
    import spark.implicits._
    parts.foreach { case (name, df) =>
      df.write.mode("overwrite").parquet(s"$path/$name")
    }
    params.toSeq.sortBy(_._1).toDF("param", "value")
      .coalesce(1).write.mode("overwrite").parquet(s"$path/_params")
    parts.keys.toSeq.sorted.toDF("part")
      .coalesce(1).write.mode("overwrite").parquet(s"$path/_manifest")
  }

  def load(spark: SparkSession, path: String)
      : (Map[String, DataFrame], Map[String, String]) = {
    val names = spark.read.parquet(s"$path/_manifest")
      .collect().map(_.getString(0))
    val parts = names.map(n =>
      n -> spark.read.parquet(s"$path/$n")).toMap
    val params = spark.read.parquet(s"$path/_params")
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    (parts, params)
  }
}
