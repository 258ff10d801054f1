package graft.ml

import graft.core.{CountOrProportion, Vocabulary}
import org.apache.spark.ml.{Estimator, Model}
import org.apache.spark.ml.param.{DoubleParam, Param, ParamMap}
import org.apache.spark.ml.util.{DefaultParamsReadable, DefaultParamsWritable, Identifiable, MLReadable, MLReader, MLWritable, MLWriter}
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{IntegerType, StructType}

private[ml] trait VocabIndexerParams
    extends org.apache.spark.ml.param.Params {
  final val inputCol = new Param[String](this, "inputCol",
    "categorical column (cast to string)")
  final val outputCol = new Param[String](this, "outputCol",
    "integer index output column")
  final val minFold = new DoubleParam(this, "minFold",
    "rare-element UNK folding threshold: <=0 disabled; (0,1) " +
      "proportion of total observations; >=1 absolute count")
  setDefault(inputCol -> "key", outputCol -> "key_idx", minFold -> 0.0)

  protected def validateAndTransformSchema(schema: StructType)
      : StructType = {
    require(schema.fieldNames.contains($(inputCol)),
      s"input is missing inputCol '${$(inputCol)}'")
    schema.add($(outputCol), IntegerType)
  }
}

/** `spark.ml` Estimator over the engine's [[Vocabulary]] semantics —
  * the third `graft.ml` stage, and deliberately NOT MLlib's
  * `StringIndexer`: UNK is PINNED at index 0 (unseen elements at
  * transform time index to 0 instead of erroring or being dropped),
  * ranking is frequency-desc with an explicit UTF-8 tie-break, and
  * rare elements can fold INTO UNK at fit time (count or proportion
  * threshold — the reference's vocabulary cutoff). Fit is one
  * distributed count aggregation assembled driver-side (the
  * StringIndexerModel idiom: broadcast-destined state, zero cluster
  * jobs per consumer); transform is one broadcast lookup join. */
class VocabIndexer(override val uid: String)
    extends Estimator[VocabIndexerModel] with VocabIndexerParams
    with DefaultParamsWritable {

  def this() = this(Identifiable.randomUID("graftVocabIndexer"))

  def setInputCol(v: String): this.type = set(inputCol, v)
  def setOutputCol(v: String): this.type = set(outputCol, v)
  def setMinFold(v: Double): this.type = set(minFold, v)

  override def fit(dataset: Dataset[_]): VocabIndexerModel = {
    transformSchema(dataset.schema)
    val counts = dataset.toDF()
      .filter(col($(inputCol)).isNotNull)
      .groupBy(col($(inputCol)).cast("string").as("element"))
      .agg(count(lit(1)).as("n"))
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    var tuples = Vocabulary.vocabTuplesFromCounts(counts)
    val fold = $(minFold)
    if (fold > 0) {
      val total = counts.map(_._2).sum
      val cop =
        if (fold < 1) CountOrProportion.proportion(fold)
        else CountOrProportion.count(fold.toLong)
      tuples = Vocabulary.foldRareTuples(tuples, cop, total)
    }
    copyValues(new VocabIndexerModel(uid, tuples).setParent(this))
  }

  override def transformSchema(schema: StructType): StructType =
    validateAndTransformSchema(schema)

  override def copy(extra: ParamMap): VocabIndexer = defaultCopy(extra)
}

object VocabIndexer extends DefaultParamsReadable[VocabIndexer]

/** Fitted vocabulary: the (element, n, idx, freq) table, UNK at 0. */
class VocabIndexerModel private[ml] (override val uid: String,
    private[ml] val vocab: Seq[(String, Long, Int, Double)])
    extends Model[VocabIndexerModel] with VocabIndexerParams
    with MLWritable {

  override def transform(dataset: Dataset[_]): DataFrame = {
    transformSchema(dataset.schema)
    val vdf = Vocabulary.vocabDfFromTuples(
      dataset.sparkSession, vocab)
    Vocabulary.lookup(dataset.toDF(), $(inputCol), vdf, $(outputCol))
  }

  override def transformSchema(schema: StructType): StructType =
    validateAndTransformSchema(schema)

  override def copy(extra: ParamMap): VocabIndexerModel =
    copyValues(new VocabIndexerModel(uid, vocab), extra)
      .setParent(parent)

  override def write: MLWriter = new MLWriter {
    override protected def saveImpl(path: String): Unit = {
      val mode = if (shouldOverwrite) "overwrite" else "errorifexists"
      Vocabulary.vocabDfFromTuples(sparkSession, vocab)
        .coalesce(1).write.mode(mode).parquet(s"$path/vocab")
      val spark = sparkSession
      import spark.implicits._
      params.toSeq.filter(p => isSet(p))
        .map(p => (p.name, get(p).get.toString))
        .toDF("param", "value")
        .coalesce(1).write.mode(mode).parquet(s"$path/params")
    }
  }
}

object VocabIndexerModel extends MLReadable[VocabIndexerModel] {
  override def read: MLReader[VocabIndexerModel] =
    new MLReader[VocabIndexerModel] {
      override def load(path: String): VocabIndexerModel = {
        val spark = SparkSession.active
        val tuples = spark.read.parquet(s"$path/vocab")
          .select("element", "n", "idx", "freq").collect()
          .map(r => (r.getString(0), r.getLong(1), r.getInt(2),
            r.getDouble(3))).toSeq
        val m = new VocabIndexerModel(
          Identifiable.randomUID("graftVocabIndexer"), tuples)
        spark.read.parquet(s"$path/params").collect().foreach { r =>
          val p = m.getParam(r.getString(0))
          val raw = r.getString(1)
          val v: Any =
            if (p.isInstanceOf[DoubleParam]) raw.toDouble else raw
          m.set(p.asInstanceOf[Param[Any]], v)
        }
        m
      }
    }
}
