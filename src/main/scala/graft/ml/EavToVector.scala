package graft.ml

import org.apache.spark.ml.Transformer
import org.apache.spark.ml.param.{IntParam, Param, ParamMap}
import org.apache.spark.ml.util.{DefaultParamsReadable, DefaultParamsWritable, Identifiable}
import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{ArrayType, DoubleType, StructField, StructType}

/** Stateless `spark.ml` Transformer pivoting an EAV relation
  * `(idCol, dimCol, valCol)` into dense zero-filled `array<double>`
  * vectors — the shape adapter between [[HashedEmbedder]]'s sparse
  * unit-L2 output and the vector-world stages ([[KMeansClusterer]],
  * [[RidgeProbe]], the ANN/dedup/linalg operators). Two partial-agg
  * exchanges — a (id, dim) SUM first (which makes duplicate EAV rows
  * well-defined: they add, the natural semantics of the upstream
  * embedder's signed counts, instead of crashing `map_from_entries`
  * under Spark's EXCEPTION map-key-dedup policy), then the per-id
  * pivot — followed by a bounded `dim`-element fill per row; the
  * higher-order lambda runs per DOCUMENT, not per token, so the
  * interpreted-lambda ban on hot loops doesn't bite. Both aggregations
  * combine map-side, so the wire volume is ≤ distinct (id, dim) pairs
  * twice. Ids with no EAV rows don't exist in the output (nothing to
  * pivot), matching the upstream embedder's empty-doc semantics. */
class EavToVector(override val uid: String)
    extends Transformer with DefaultParamsWritable {

  def this() = this(Identifiable.randomUID("graftEavToVector"))

  final val idCol = new Param[String](this, "idCol", "entity id column")
  final val dimCol = new Param[String](this, "dimCol",
    "attribute column (int index in [0, dim))")
  final val valCol = new Param[String](this, "valCol",
    "value column (double)")
  final val outputCol = new Param[String](this, "outputCol",
    "dense vector output column (array<double>, zero-filled)")
  final val dim = new IntParam(this, "dim", "vector dimensionality")
  setDefault(idCol -> "doc_id", dimCol -> "dim", valCol -> "val",
    outputCol -> "embedding", dim -> 64)

  def setIdCol(v: String): this.type = set(idCol, v)
  def setDimCol(v: String): this.type = set(dimCol, v)
  def setValCol(v: String): this.type = set(valCol, v)
  def setOutputCol(v: String): this.type = set(outputCol, v)
  def setDim(v: Int): this.type = set(dim, v)

  override def transform(dataset: Dataset[_]): DataFrame = {
    transformSchema(dataset.schema)
    dataset.toDF()
      // a null attribute index would crash map_from_entries; a null
      // value carries nothing — both drop (an id with ONLY null rows
      // then vanishes, like an id with no rows)
      .filter(col($(dimCol)).isNotNull && col($(valCol)).isNotNull)
      // deterministic duplicate handling BEFORE the pivot: repeated
      // (id, dim) rows sum, so map_from_entries always sees unique keys
      .groupBy(col($(idCol)), col($(dimCol)).cast("int").as("__d"))
      .agg(sum(col($(valCol)).cast("double")).as("__v"))
      .groupBy(col($(idCol)))
      .agg(map_from_entries(collect_list(struct(
        col("__d"), col("__v")))).as("__m"))
      .select(col($(idCol)),
        expr(s"transform(sequence(0, ${$(dim) - 1}), i -> " +
          "coalesce(element_at(__m, CAST(i AS INT)), " +
          "CAST(0.0 AS DOUBLE)))").as($(outputCol)))
  }

  override def transformSchema(schema: StructType): StructType = {
    Seq($(idCol), $(dimCol), $(valCol)).foreach(c =>
      require(schema.fieldNames.contains(c),
        s"input is missing column '$c'"))
    StructType(Seq(schema($(idCol)),
      StructField($(outputCol), ArrayType(DoubleType, containsNull = false),
        nullable = false)))
  }

  override def copy(extra: ParamMap): EavToVector = defaultCopy(extra)
}

object EavToVector extends DefaultParamsReadable[EavToVector]
