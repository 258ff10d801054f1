package graft.ml

import graft.ops.TextOps
import org.apache.spark.ml.Transformer
import org.apache.spark.ml.param.{IntParam, LongParam, Param, ParamMap}
import org.apache.spark.ml.util.{DefaultParamsReadable, DefaultParamsWritable, Identifiable}
import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.types.{DoubleType, IntegerType, StructField, StructType}

/** Stateless `spark.ml` Transformer over the engine's feature-hashed
  * text embeddings ([[TextOps.hashedEmbedding]] — the q236 dataflow,
  * the hashing-trick / fastText bag shape with no trained table): one
  * narrow token scan + two partial-aggregatable exchanges, unit-L2
  * EAV out `(idCol, dim, val)`. No fit state, so a plain Transformer —
  * it drops into a Pipeline ahead of the vector-world stages
  * ([[KMeansClusterer]], [[RidgeProbe]], the ANN/dedup operators).
  * Wrapper semantics are CONTRACTUAL: q245 runs THIS stage against
  * q236's oracle SQL string verbatim. */
class HashedEmbedder(override val uid: String)
    extends Transformer with DefaultParamsWritable {

  def this() = this(Identifiable.randomUID("graftHashedEmbedder"))

  final val idCol = new Param[String](this, "idCol",
    "document id column (carried through to the EAV output)")
  final val inputCol = new Param[String](this, "inputCol",
    "text column to tokenize and hash")
  final val dim = new IntParam(this, "dim", "embedding dimensionality")
  final val seed = new LongParam(this, "seed", "hash seed")
  final val family = new Param[String](this, "family",
    "hash family: xxhash (production) | md5 (engine-portable replay)")
  setDefault(idCol -> "doc_id", inputCol -> "text", dim -> 64,
    seed -> 7L, family -> "xxhash")

  def setIdCol(v: String): this.type = set(idCol, v)
  def setInputCol(v: String): this.type = set(inputCol, v)
  def setDim(v: Int): this.type = set(dim, v)
  def setSeed(v: Long): this.type = set(seed, v)
  def setFamily(v: String): this.type = set(family, v)

  override def transform(dataset: Dataset[_]): DataFrame = {
    transformSchema(dataset.schema)
    TextOps.hashedEmbedding(dataset.toDF(), $(idCol), $(inputCol),
      $(dim), $(seed), $(family))
  }

  override def transformSchema(schema: StructType): StructType = {
    require(schema.fieldNames.contains($(idCol)),
      s"input is missing idCol '${$(idCol)}'")
    require(schema.fieldNames.contains($(inputCol)),
      s"input is missing inputCol '${$(inputCol)}'")
    StructType(Seq(schema($(idCol)),
      StructField("dim", IntegerType, nullable = true),
      StructField("val", DoubleType, nullable = true)))
  }

  override def copy(extra: ParamMap): HashedEmbedder = defaultCopy(extra)
}

object HashedEmbedder extends DefaultParamsReadable[HashedEmbedder]
