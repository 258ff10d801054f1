package graft.ml

import graft.ingest.Splits
import org.apache.spark.ml.Transformer
import org.apache.spark.ml.param.{DoubleArrayParam, LongParam, Param, ParamMap, StringArrayParam}
import org.apache.spark.ml.util.{DefaultParamsReadable, DefaultParamsWritable, Identifiable}
import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.types.{StringType, StructType}

/** `spark.ml` Transformer over [[Splits.groupedSplit]]: stamps the
  * leakage-safe `split` column (a pure hash-threshold function of the
  * GROUP key — domain/source/subject — so intra-group near-dups never
  * straddle splits). Stateless and narrow: no distinct, no count, no
  * rank — it composes under any join/filter at any scale, which is
  * exactly what a Pipeline's first stage should be. Null group keys
  * yield a NULL split (visibly unassigned, never silently clustered
  * into the last split). */
class GroupedSplitAssigner(override val uid: String)
    extends Transformer with DefaultParamsWritable {

  def this() = this(Identifiable.randomUID("graftGroupedSplit"))

  final val groupCol = new Param[String](this, "groupCol",
    "leakage-group key column (domain / source / subject)")
  final val fractions = new DoubleArrayParam(this, "fractions",
    "expected split fractions; may omit the remainder")
  final val splitNames = new StringArrayParam(this, "splitNames",
    "one name per fraction (+1 when fractions omit the remainder)")
  final val seed = new LongParam(this, "seed", "hash seed")

  setDefault(fractions -> Array(0.8), splitNames ->
    Array("train", "held_out"), seed -> 42L)

  def setGroupCol(v: String): this.type = set(groupCol, v)
  def setFractions(v: Array[Double]): this.type = set(fractions, v)
  def setSplitNames(v: Array[String]): this.type = set(splitNames, v)
  def setSeed(v: Long): this.type = set(seed, v)

  override def transform(dataset: Dataset[_]): DataFrame = {
    transformSchema(dataset.schema)
    Splits.groupedSplit(dataset.toDF(), $(groupCol),
      $(fractions).toSeq, $(splitNames).toSeq, $(seed))
  }

  override def transformSchema(schema: StructType): StructType = {
    require(schema.fieldNames.contains($(groupCol)),
      s"input is missing groupCol '${$(groupCol)}'")
    schema.add("split", StringType)
  }

  override def copy(extra: ParamMap): GroupedSplitAssigner =
    defaultCopy(extra)
}

object GroupedSplitAssigner
    extends DefaultParamsReadable[GroupedSplitAssigner]
