package graft.tools

import graft.SparkEntry
import org.apache.spark.sql.SparkSession

/** Dump formatted physical plans for the driver-contract queries —
  * the "is this the plan you'd want at 100 TB" review loop.
  * Usage: runMain graft.tools.Plans <sfDir> [query ...] */
object Plans {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val which = args.drop(1).toSet
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", 4)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      if (which.isEmpty || which.contains(name)) {
        println(s"\n━━━━━━━━ $name ━━━━━━━━")
        try fn(spark, sfDir).explain("formatted")
        catch { case e: Throwable =>
          println(s"PLAN FAILED: ${e.getMessage}")
        }
      }
    }
    spark.stop()
  }
}
