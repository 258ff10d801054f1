package graft.serve

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Task-label normalization (reference event_stream_pytorch_dataset.py:
  * 61-81, 155-175): every non-key column of a task frame is typed by its
  * dtype and normalized —
  *
  *   integer  → multi_class_classification, identity
  *   string   → multi_class_classification, dense code in lexicographic
  *              category order (pandas `.astype('category').cat.codes`
  *              sorts object categories lexicographically)
  *   boolean  → binary_classification, cast to double
  *   float    → regression, identity
  *
  * String coding is a broadcast join against the (tiny) sorted-distinct
  * label table built with the engine's range-partitioned rank — no
  * driver-side dictionaries, no single-partition window. */
object TaskLabels {

  final case class NormalizedTasks(
      df: DataFrame,
      taskTypes: Map[String, String],
      /** multi-class string tasks → (label, code) vocabulary tables */
      vocabs: Map[String, DataFrame])

  val KeyCols: Seq[String] = Seq("subject_id", "start_time", "end_time",
    "task_subject_id")

  def normalize(taskDf: DataFrame,
      ignore: Seq[String] = KeyCols): NormalizedTasks = {
    val tasks = taskDf.schema.fields.filterNot(f => ignore.contains(f.name))
    var df = taskDf
    val types = scala.collection.mutable.Map[String, String]()
    val vocabs = scala.collection.mutable.Map[String, DataFrame]()
    tasks.foreach { f =>
      f.dataType match {
        case ByteType | ShortType | IntegerType | LongType =>
          types(f.name) = "multi_class_classification"
        case StringType =>
          types(f.name) = "multi_class_classification"
          val vocab = graft.ingest.Ids.denseIdsBy(
            taskDf.select(col(f.name).as("label"))
              .filter(col("label").isNotNull).distinct()
              .localCheckpoint(true),
            "code", Seq(col("label")))
          vocabs(f.name) = vocab
          val v = broadcast(vocab.select(
            col("label").as(s"__lbl_${f.name}"),
            col("code").as(s"__code_${f.name}")))
          df = df
            .join(v, df(f.name) === col(s"__lbl_${f.name}"), "left")
            .withColumn(f.name, col(s"__code_${f.name}"))
            .drop(s"__lbl_${f.name}", s"__code_${f.name}")
        case BooleanType =>
          types(f.name) = "binary_classification"
          df = df.withColumn(f.name, col(f.name).cast("double"))
        case FloatType | DoubleType =>
          types(f.name) = "regression"
        case other =>
          throw new IllegalArgumentException(
            s"can't process task label '${f.name}' of type ${other.sql}")
      }
    }
    NormalizedTasks(df, types.toMap, vocabs.toMap)
  }
}
