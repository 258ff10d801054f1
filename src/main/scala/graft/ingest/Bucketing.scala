package graft.ingest

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Bucketed persistence for co-located subject-local queries.
  *
  * Every sequence-building query in this engine is subject-local (SURVEY
  * §4): events⋈measurements group to events then to subjects. Persisting
  * both tables bucketed by their join/group key lets Spark satisfy the
  * required hash distribution from storage — groupBy/join over bucketed
  * tables runs with ZERO exchanges (verified by BucketingSpec on the
  * physical plan). At 100 TB that removes the two biggest shuffles of the
  * flagship query; the one-time bucketing cost amortizes across every
  * downstream read.
  */
object Bucketing {

  /** Persist as a bucketed table (Hive-style layout in the session
    * warehouse). `buckets` should target HDFS-block-sized files at the
    * expected data scale: e.g. 100 TB / (32 buckets × ~256 MB) is wrong —
    * size buckets so each holds 128–512 MB per partition-file. */
  def writeBucketed(df: DataFrame, table: String, bucketCol: String,
      buckets: Int, sortCols: Seq[String] = Nil): Unit = {
    val spark = df.sparkSession
    // Idempotent across sessions: a prior session's managed-table
    // directory with no catalog entry (in-memory catalog died with the
    // JVM) fails CREATE with LOCATION_ALREADY_EXISTS — drop both.
    spark.sql(s"DROP TABLE IF EXISTS `$table`")
    val loc = new org.apache.hadoop.fs.Path(
      spark.conf.get("spark.sql.warehouse.dir"), table.toLowerCase)
    val fs = loc.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(loc)) fs.delete(loc, true)
    val w = df.write.mode(SaveMode.Overwrite)
      .bucketBy(buckets, bucketCol)
    val sorted = if (sortCols.nonEmpty) w.sortBy(sortCols.head,
      sortCols.tail: _*) else w
    sorted.format("parquet").saveAsTable(table)
  }

  def readTable(spark: SparkSession, table: String): DataFrame =
    spark.table(table)
}
