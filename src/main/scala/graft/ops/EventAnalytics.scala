package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Subject-timeline analytics over the event stream — the
  * process-mining / product-analytics trio (transition mining,
  * retention, funnels) every event-sourced store grows, built on the
  * same subject-ordered shape as
  * [[graft.ingest.EventDataset.eventsOrdered]] (reference:
  * EventStreamData's subject-grouped, time-sorted frame).
  *
  * All three ops shuffle ONCE on the subject key (the window / groupBy
  * partition key) and reduce to tiny outputs — transition matrices are
  * |types|², curves are |days|, funnels are one row. At 100 TB the
  * subject shuffle is the whole cost, so bucketed event storage
  * ([[graft.ingest.Bucketing]]) removes it entirely.
  */
object EventAnalytics {

  /** Event-type transition counts (the order-1 Markov / process-mining
    * table): consecutive-event pairs within each subject's timeline,
    * counted globally. Ordering is (ts, eventId) — the id tie-break
    * makes the walk deterministic under same-timestamp events.
    * Returns (type_a, type_b, n). */
  def typeTransitions(events: DataFrame, subjCol: String, tsCol: String,
      idCol: String, typeCol: String): DataFrame = {
    val w = Window.partitionBy(subjCol).orderBy(col(tsCol), col(idCol))
    events
      .select(col(subjCol), col(tsCol), col(idCol),
        col(typeCol).as("type_a"),
        lead(col(typeCol), 1).over(w).as("type_b"))
      .filter(col("type_b").isNotNull)
      .groupBy("type_a", "type_b").agg(count(lit(1)).as("n"))
  }

  /** Day-k retention curve: of all subjects, what fraction has ANY
    * activity exactly k days after their first event. The
    * subject-first-day table is one agg; day offsets dedup per
    * (subject, k) so a chatty subject counts once per day. Returns
    * (day_k, n_subjects, retention round-6) for observed offsets. */
  def retentionCurve(events: DataFrame, subjCol: String, tsCol: String)
      : DataFrame = {
    val firsts = events.groupBy(col(subjCol).as("__s"))
      .agg(min(to_date(col(tsCol))).as("__d0"))
    val active = events
      .join(firsts, col(subjCol) === col("__s"))
      .select(col(subjCol),
        datediff(to_date(col(tsCol)), col("__d0")).cast("long")
          .as("day_k"))
      .distinct()
      .localCheckpoint(true)
    val total = firsts.count()
    active.groupBy("day_k")
      .agg(countDistinct(col(subjCol)).as("n_subjects"))
      .select(col("day_k"), col("n_subjects"),
        round(col("n_subjects").cast("double") / total.toDouble, 6)
          .as("retention"))
  }

  /** Strictly-ordered funnel: subjects who did step 1, then step 2
    * AFTER their first step 1, then step 3 after that first
    * qualifying step 2 (each stage anchors on the EARLIEST qualifying
    * time — the standard product-analytics semantics). One
    * subject-keyed agg per stage, each feeding a broadcast-sized
    * subject table into the next filter. Returns one row per stage:
    * (stage, step, n_subjects, conversion round-6 vs stage 1). */
  def funnel(events: DataFrame, subjCol: String, tsCol: String,
      typeCol: String, steps: Seq[String]): DataFrame = {
    require(steps.size >= 2, s"funnel needs >= 2 steps: $steps")
    val stages = steps.zipWithIndex.foldLeft(
      List.empty[(Int, String, DataFrame)]) {
      case (acc, (step, i)) =>
        val prev = acc.headOption.map(_._3)
        val base = events.filter(col(typeCol) === step)
        val qualified = prev match {
          case None => base
          case Some(p) =>
            base.join(p.select(col("__s"), col("__t").as("__pt")),
              col(subjCol) === col("__s"))
              .filter(col(tsCol) > col("__pt"))
              .drop("__s", "__pt")
        }
        val stage = qualified.groupBy(col(subjCol).as("__s"))
          .agg(min(col(tsCol)).as("__t"))
          .localCheckpoint(true)
        (i + 1, step, stage) :: acc
    }.reverse
    val n1 = stages.head._3.count().toDouble
    val spark = events.sparkSession
    import spark.implicits._
    stages.map { case (i, step, df) =>
      val n = df.count()
      (i, step, n, math.rint(n / n1 * 1e6) / 1e6)
    }.toDF("stage", "step", "n_subjects", "conversion")
  }

  /** Top-k event-sequence motifs (order-2 extension of
    * [[typeTransitions]] — the 3-event patterns process mining calls
    * frequent paths): consecutive type triples within each subject's
    * (ts, eventId)-ordered timeline, counted globally, ranked with the
    * (n desc, types asc) exact-tie rule. The motif table is bounded by
    * |types|³ regardless of corpus size, so the rank window runs over
    * a checkpointed model-sized table — the corpus pays one subject
    * window + one partial-aggregatable count. */
  def eventMotifs(events: DataFrame, subjCol: String, tsCol: String,
      idCol: String, typeCol: String, k: Int): DataFrame = {
    require(k >= 1, s"k must be >= 1: $k")
    val w = Window.partitionBy(subjCol).orderBy(col(tsCol), col(idCol))
    val counts = events
      .select(col(subjCol), col(typeCol).as("t1"),
        lead(col(typeCol), 1).over(w).as("t2"),
        lead(col(typeCol), 2).over(w).as("t3"))
      .filter(col("t3").isNotNull)
      .groupBy("t1", "t2", "t3").agg(count(lit(1)).as("n"))
      .localCheckpoint(true)
    val rw = Window.orderBy(col("n").desc, col("t1").asc,
      col("t2").asc, col("t3").asc)
    counts.withColumn("rank", row_number().over(rw))
      .filter(col("rank") <= k)
      .select(col("rank"), col("t1"), col("t2"), col("t3"), col("n"))
  }

  /** Next-event training pairs — the (context window, label) rows a
    * next-event-prediction model trains on (the generative-pretraining
    * objective over event streams, which is the reference's whole
    * model-side reason to exist; this is its data-prep form). Per
    * subject, events order by (ts, eventId); every position i ≥ 2
    * (1-based) emits the previous `ctxLen` event types as the context
    * and type_i as the label. One subject-keyed shuffle (the one
    * bucketed storage removes); the context/label carve-out is
    * array-slice math over the per-subject sequence — `slice` and the
    * per-event `transform` are interpreted per ELEMENT, which is fine
    * at per-event granularity (sequences are maxSeqLen-bounded; the
    * per-character ban does not apply). Returns
    * (subject_id, idx, context, label). */
  def nextEventPairs(events: DataFrame, subjCol: String, tsCol: String,
      idCol: String, typeCol: String, ctxLen: Int): DataFrame = {
    require(ctxLen >= 1, s"ctxLen must be >= 1: $ctxLen")
    val seqs = events
      .groupBy(col(subjCol).as("subject_id"))
      .agg(sort_array(collect_list(struct(col(tsCol).as("t"),
        col(idCol).as("i"), col(typeCol).as("y")))).as("s"))
      .select(col("subject_id"),
        expr("transform(s, e -> e.y)").as("types"))
    seqs
      .select(col("subject_id"),
        posexplode(col("types")).as(Seq("pos0", "label")),
        col("types"))
      .withColumn("idx", col("pos0") + 1) // 1-based position
      .filter(col("idx") >= 2)
      .select(col("subject_id"), col("idx").cast("long").as("idx"),
        slice(col("types"), greatest(lit(1), col("idx") - ctxLen),
          least(col("idx") - 1, lit(ctxLen))).as("context"),
        col("label"))
  }
}
