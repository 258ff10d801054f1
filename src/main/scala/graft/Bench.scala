package graft
import org.apache.spark.sql.SparkSession
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // Full materialization: the noop v2 sink evaluates every row and column
    // of the final projection. A bare .count() lets Catalyst prune the
    // expensive projections of non-aggregating queries (and EliminateSorts
    // their orderBy) down to a parquet row count — that's not the workload.
    def run(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.mode("overwrite").format("noop").save()
    // Warm up the session (codegen compiler, parquet footer cache, shuffle
    // machinery) so the first timed query isn't charged with JVM startup.
    spark.range(1000).selectExpr("sum(id)").collect()
    // Parquet footer/schema first-touch is a per-table constant otherwise
    // charged to whichever query reads the table first.
    Seq("region", "nation", "customer", "supplier", "part", "orders",
      "lineitem", "events", "documents", "embeddings").foreach { n =>
      try {
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        spark.read.parquet(s"$sfDir/$n.parquet").selectExpr("count(1)")
          .collect()
      } catch { case _: Throwable => () }
    }
    try run(SparkEntry.entry(spark)) catch { case _: Throwable => () }
    // A failed query must NOT report its (fast) time-to-failure as if it
    // were a result — record it as -1 so regressions are visible.
    // Local-iteration filter (the driver never sets this): run only the
    // queries whose name matches the regex.
    val only = sys.env.get("SPARK_GRAFT_ONLY").map(_.r)
    // Steady-state timing: each query runs `reps` times, report the MIN.
    // A single cold pass charges whichever queries JIT/codegen-compile
    // their operators first with multi-second one-time costs (measured
    // swings of 0.5 s ↔ 8 s on identical plans); min-of-2 measures the
    // recurring cost of the PLAN, which is what a 100 TB projection
    // scales from.
    val reps = sys.env.getOrElse("SPARK_GRAFT_REPS", "2").toInt.max(1)
    val results = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (n, _) => only.forall(_.findFirstIn(n).isDefined) }
      .map {
      case (name, fn) =>
        val times = (1 to reps).map { _ =>
          val t0 = System.nanoTime()
          val ok =
            try { run(fn(spark, sfDir)); true }
            catch { case e: Throwable =>
              System.err.println(s"[bench] $name FAILED: ${e.getMessage}")
              false
            }
          if (ok) (System.nanoTime() - t0) / 1e9 else -1.0
        }
        // any failed rep fails the query (plans are deterministic — a
        // pass/fail flicker would mean nondeterminism worth surfacing)
        name -> (if (times.exists(_ < 0)) -1.0 else times.min)
    }.toMap
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    // -1.0 failure sentinels must not reduce the total
    val total = results.values.filter(_ >= 0).sum
    val nFailed = results.values.count(_ < 0)
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"n_failed":$nFailed,"sf":"$sfDir"}""")
    spark.stop()
  }
}
