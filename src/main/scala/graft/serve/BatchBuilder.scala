package graft.serve

import graft.ingest.EventDataset
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sequence/batch construction — the "SELECT" of this engine (SURVEY §2.9;
  * reference event_stream_pytorch_dataset.py:250-442).
  *
  * Produces one row per subject (or per task row): ragged arrays
  *   time                        ARRAY<DOUBLE>   minutes from sequence start
  *   dynamic_indices             ARRAY<ARRAY<LONG>>   unified-vocab ids
  *   dynamic_values              ARRAY<ARRAY<DOUBLE>>
  *   dynamic_measurement_indices ARRAY<ARRAY<LONG>>
  *   static_indices              ARRAY<LONG>
  * Padding to rectangular [B,L,M] tensors is a collate-time concern kept out
  * of the cluster (reference pads in its DataLoader; SURVEY §1.3).
  *
  * Plan shape at 100 TB: one shuffle groups measurements to events, one
  * shuffle groups events to subjects — both hash-partitioned on their key;
  * everything after is narrow array expressions inside codegen. The vocab /
  * offsets tables broadcast.
  */
object BatchBuilder {

  /** Unified vocabulary offsets (event_stream_pytorch_dataset.py:124-153):
    * global padding id 0; `event_type` measurement pinned at measurement
    * index 1 with offset 1; further measurements in deterministic declared
    * order, each vocabulary a contiguous block (per-vocab idx 0 = UNK). */
  final case class MeasurementOffset(measurement: String,
      measurementIdx: Int, offset: Long, vocabSize: Long)

  def buildOffsets(vocabSizes: Seq[(String, Long)]): Seq[MeasurementOffset] = {
    val ordered = vocabSizes.sortBy {
      case ("event_type", _) => (0, "")
      case (m, _)            => (1, m)
    }
    var off = 1L
    var idx = 1
    ordered.map { case (m, size) =>
      val mo = MeasurementOffset(m, idx, off, size)
      off += size
      idx += 1
      mo
    }
  }

  /** Flagship subject-sequence query.
    *
    * @param events        (event_id, subject_id, timestamp, event_type, ...)
    * @param measIndexed   measurements already carrying `unified_idx` LONG,
    *                      `measurement_idx` LONG, `value` DOUBLE (null for
    *                      categorical observations → masked downstream)
    * @param maxSeqLen     random contiguous window cap (reference
    *                      event_stream_pytorch_dataset.py:299-304)
    * @param minSeqLen     subject admission threshold (:119-122)
    * @param seed          window-sampling seed
    * @param windowU       optional per-subject uniform-[0,1) expression
    *                      driving the window start (replaces the default
    *                      xxhash64(subject_id, seed) draw) — the
    *                      md5SplitKey pattern: supply an SQL-replayable
    *                      key so an external oracle can replay the slice
    *                      bit-for-bit
    */
  def subjectSequences(
      events: DataFrame, measIndexed: DataFrame,
      maxSeqLen: Int = Int.MaxValue, minSeqLen: Int = 1,
      seed: Long = 1, windowU: Option[Column] = None): DataFrame = {

    // Per-event ragged triples: one shuffle on event_id. When the
    // measurement frame carries the subject key (denormalized layout /
    // subject-bucketed tables), the subject rides the grouping and join
    // keys: result-identical (event_id determines subject_id), but a
    // HashPartitioning(subject_id) from storage then satisfies EVERY
    // stage's clustered distribution and the whole pipeline plans with
    // zero exchanges (Bench SPARK_GRAFT_BUCKETED=1 measures it).
    val hasSubj = measIndexed.columns.contains("subject_id")
    val groupKeys = if (hasSubj) Seq("subject_id", "event_id")
      else Seq("event_id")
    val perEvent = measIndexed
      .groupBy(groupKeys.map(col): _*)
      .agg(
        collect_list(struct(col("unified_idx"), col("value"),
          col("measurement_idx"))).as("ms"))

    // Attach to events and group per subject: one shuffle on subject_id.
    val perSubject = events
      .join(perEvent, groupKeys, "left")
      .groupBy("subject_id")
      .agg(sort_array(collect_list(struct(
        col("timestamp").cast("double").as("ts"),
        col("event_id"),
        coalesce(col("ms"),
          array().cast("array<struct<unified_idx:bigint,value:double," +
            "measurement_idx:bigint>>")).as("ms")))).as("evs"))
      .filter(size(col("evs")) >= minSeqLen)

    // Random contiguous window when over-long (:299-304): seeded per-subject
    // via xxhash64 so the slice is reproducible and partition-independent.
    val windowed =
      if (maxSeqLen == Int.MaxValue) perSubject
      else {
        val n = size(col("evs"))
        val u = windowU.getOrElse(
          pmod(xxhash64(col("subject_id"), lit(seed)), lit(1000000L))
            .cast("double") / 1000000.0)
        val start = when(n <= maxSeqLen, lit(1)).otherwise(
          (floor(u * (n - lit(maxSeqLen) + 1)) + 1).cast("int"))
        perSubject.withColumn("evs",
          slice(col("evs"), start, lit(maxSeqLen)))
      }

    // Time in minutes from sequence start (:296,309-310) + ragged arrays.
    windowed.select(
      col("subject_id"),
      transform(col("evs"),
        e => (e("ts") - element_at(col("evs"), 1)("ts")) / 60.0).as("time"),
      transform(col("evs"), e => transform(e("ms"), m => m("unified_idx")))
        .as("dynamic_indices"),
      transform(col("evs"), e => transform(e("ms"), m => m("value")))
        .as("dynamic_values"),
      transform(col("evs"),
        e => transform(e("ms"), m => m("measurement_idx")))
        .as("dynamic_measurement_indices"))
  }

  /** Log-TTE-normalized cumulative time
    * (event_stream_pytorch_dataset.py:312-321): per subject,
    * Δ' = exp((log(Δ_minutes + 1) − μ)/σ) with the first event's undefined
    * delta as 0 (the reference's fillna(0)), t' = running sum of Δ'.
    * μ/σ are the train-split log-TTE moments (EventDataset.tteStats).
    * One window over the subject partition — no extra shuffle when the
    * frame is already subject-partitioned. */
  def logTteNormalizedTime(events: DataFrame, meanLogTte: Column,
      stdLogTte: Column): DataFrame = {
    val w = Window.partitionBy("subject_id").orderBy("timestamp", "event_id")
    val deltaMin = (col("timestamp").cast("double") -
      lag(col("timestamp").cast("double"), 1).over(w)) / 60.0
    val deltaNorm = when(deltaMin.isNull, lit(0.0))
      .otherwise(exp((log(deltaMin + 1) - meanLogTte) / stdLogTte))
    events.withColumn("t_norm",
      sum(deltaNorm).over(w.rowsBetween(Window.unboundedPreceding,
        Window.currentRow)))
  }

  /** Task-conditioned extraction (event_stream_pytorch_dataset.py:239-246,
    * 288-292): one output row per task row, events restricted to
    * [start_time, end_time]. Equi key + range predicate — Catalyst runs it
    * as a hash join on subject_id with a residual interval filter, which is
    * the right plan (tasks ≪ events; no custom as-of operator needed,
    * SURVEY §2.4). */
  def taskWindows(events: DataFrame, tasks: DataFrame): DataFrame =
    events.join(tasks,
      events("subject_id") === tasks("task_subject_id") &&
        events("timestamp") >= tasks("start_time") &&
        events("timestamp") <= tasks("end_time"))

  /** Optional rectangularization for consumers that want dense [L] arrays:
    * right-pad `arr` with nulls to `len` (reference collate,
    * event_stream_pytorch_dataset.py:444-567; padding side configurable). */
  def padTo(arr: Column, len: Int, leftPad: Boolean = false): Column =
    padToCol(arr, lit(len), leftPad)

  /** Column-length overload: pad to a length computed inside the plan
    * (e.g. a broadcast 1-row `max(count)` aggregate) so batch padding
    * needs no driver-side collect. */
  def padToCol(arr: Column, len: Column, leftPad: Boolean = false)
      : Column = {
    val pad = array_repeat(lit(null), len.cast("int") - size(arr))
    if (leftPad) concat(pad, arr) else concat(arr, pad)
  }

  /** Attach `static_indices` / `static_measurement_indices` to per-subject
    * sequence rows (event_stream_pytorch_dataset.py:411-442): for each
    * declared static measurement, the subject's value is looked up in that
    * measurement's vocabulary (unknown/null → UNK 0) and shifted by its
    * unified-vocab offset; the companion array carries the measurement
    * index. Broadcast lookups + one broadcast join — the subjects table is
    * small by definition. */
  def withStaticIndices(seqs: DataFrame, subjects: DataFrame,
      statics: Seq[(String, DataFrame, MeasurementOffset)]): DataFrame = {
    val indexed = statics.foldLeft(subjects) { case (s, (c, vocab, _)) =>
      graft.core.Vocabulary.lookup(s, c, vocab, s"__sidx_$c")
    }
    val staticArr = array(statics.map { case (c, _, off) =>
      col(s"__sidx_$c").cast("long") + off.offset
    }: _*)
    val measArr = array(statics.map { case (_, _, off) =>
      lit(off.measurementIdx.toLong)
    }: _*)
    seqs.join(
      broadcast(indexed.select(col("subject_id"),
        staticArr.as("static_indices"),
        measArr.as("static_measurement_indices"))),
      Seq("subject_id"), "left")
  }
}
