package graft.functors

import graft.core.DataModality
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Functional time-dependent measurements: computed columns on the events
  * table from (timestamp, subject statics) — the reference's
  * `TimeDependentFunctor` ABC (/root/reference/EventStream/EventStreamData/
  * time_dependent_functor.py:9-44), re-expressed as Column expressions so
  * they stay inside whole-stage codegen. The subjects side arrives via one
  * broadcast join (events ⋈ subjects, event_stream_dataset.py:937-945).
  */
trait TimeDependentFunctor extends Serializable {
  def name: String
  def outputModality: DataModality
  /** Expression over the joined (events ⋈ subjects) frame. */
  def expr: Column
  /** True when `expr` references subject static columns — drives the
    * events⋈subjects broadcast join in `addColumns`. */
  def requiresStatics: Boolean = false
}

/** Age in years at event time (time_dependent_functor.py:47-57): exact
  * reference arithmetic — timestamp delta divided by 365 days. */
final case class AgeFunctor(dobCol: String) extends TimeDependentFunctor {
  val name = "age"
  val outputModality: DataModality = DataModality.UnivariateRegression
  override val requiresStatics = true
  def expr: Column =
    (col("timestamp").cast("double") - col(dobCol).cast("double")) /
      (365.0 * 24 * 3600)
}

/** Time-of-day bucketing (time_dependent_functor.py:59-72): hour < 6 →
  * EARLY_AM, < 12 → AM, < 21 → PM, else LATE_PM. */
final case class TimeOfDayFunctor() extends TimeDependentFunctor {
  val name = "time_of_day"
  val outputModality: DataModality = DataModality.SingleLabelClassification
  def expr: Column = {
    val h = hour(col("timestamp"))
    when(h < 6, "EARLY_AM").when(h < 12, "AM").when(h < 21, "PM")
      .otherwise("LATE_PM")
  }
}

object TimeDependentFunctor {
  /** Registry — the reference's "UDF surface" (SURVEY §2.11). User functors
    * plug in by providing a Column expression. */
  def addColumns(events: DataFrame, subjects: DataFrame,
      functors: Seq[TimeDependentFunctor]): DataFrame = {
    val needsSubjects = functors.exists(_.requiresStatics)
    val base =
      if (needsSubjects)
        events.join(broadcast(subjects), Seq("subject_id"), "left")
      else events
    functors.foldLeft(base)((df, f) => df.withColumn(f.name, f.expr))
  }
}
