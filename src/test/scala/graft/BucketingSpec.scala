package graft

import graft.ingest.Bucketing
import org.apache.spark.sql.functions._

/** Physical-plan proof that bucketed persistence removes exchanges for
  * subject-local aggregation and co-located joins. */
class BucketingSpec extends SparkSpec {
  import spark.implicits._

  private def physicalPlan(df: org.apache.spark.sql.DataFrame): String =
    df.queryExecution.executedPlan.toString

  test("bucketed tables aggregate and join without exchanges") {
    // clean slate: drop tables AND stale warehouse dirs (a crashed run can
    // leave files behind that the metastore no longer knows about)
    for (tbl <- Seq("ev_bkt", "ms_bkt")) {
      spark.sql(s"DROP TABLE IF EXISTS $tbl")
      val loc = new java.io.File(
        spark.conf.get("spark.sql.warehouse.dir")
          .stripPrefix("file:"), tbl)
      if (loc.exists())
        org.apache.commons.io.FileUtils.deleteDirectory(loc)
    }
    val events = (1L to 1000L)
      .map(i => (i % 50, i, s"t${i % 5}")).toDF("subject_id", "event_id",
        "event_type")
    val meas = (1L to 1000L)
      .map(i => (i % 50, i, i * 0.5)).toDF("subject_id", "event_id",
        "value")
    Bucketing.writeBucketed(events, "ev_bkt", "subject_id", 4)
    Bucketing.writeBucketed(meas, "ms_bkt", "subject_id", 4)
    val ev = Bucketing.readTable(spark, "ev_bkt")
    val ms = Bucketing.readTable(spark, "ms_bkt")

    // a shuffle in plan text is "Exchange hashpartitioning(...)";
    // BroadcastExchange is not a shuffle.
    def shuffles(p: String): Boolean = p.contains("Exchange hashpartitioning")

    // groupBy on the bucket key: no shuffle exchange
    val agg = ev.groupBy("subject_id").agg(count(lit(1)))
    agg.collect()
    assert(!shuffles(physicalPlan(agg)),
      s"groupBy plan still shuffles:\n${physicalPlan(agg)}")

    // equi-join on the bucket key: disable broadcast so the planner must
    // pick sort-merge — co-located buckets mean zero shuffle on either side
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val joined = ev.join(ms, "subject_id")
      joined.collect()
      assert(!shuffles(physicalPlan(joined)),
        s"join plan still shuffles:\n${physicalPlan(joined)}")

      // the same join over unbucketed data DOES shuffle (the baseline)
      val plain = events.join(meas, "subject_id")
      plain.collect()
      assert(shuffles(physicalPlan(plain)))
    } finally spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
  }
}
