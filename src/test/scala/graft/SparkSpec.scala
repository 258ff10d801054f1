package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.scalatest.funsuite.AnyFunSuite

/** Shared local SparkSession for all specs (one JVM, one context). */
object SparkTestSession {
  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("graft-test")
    .config("spark.sql.shuffle.partitions", 4)
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    // bucketed test tables land in scratch, never the repo cwd
    .config("spark.sql.warehouse.dir",
      s"${System.getProperty("java.io.tmpdir")}/graft_test_warehouse")
    .withExtensions(new graft.GraftExtensions)
    .getOrCreate()
}

trait SparkSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkTestSession.spark
  spark.sparkContext.setLogLevel("ERROR")

  /** Order-insensitive DataFrame compare on a sorted-collect. */
  def assertSameRows(actual: DataFrame, expected: Seq[Seq[Any]]): Unit = {
    val got = actual.collect().map(_.toSeq).sortBy(_.mkString("|")).toSeq
    val want = expected.sortBy(_.mkString("|"))
    assert(got == want, s"\n got: ${got.mkString("\n      ")}" +
      s"\nwant: ${want.mkString("\n      ")}")
  }
}
