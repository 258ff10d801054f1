package graft.ml

import graft.ops.Linalg
import org.apache.spark.ml.{Estimator, Model}
import org.apache.spark.ml.param.{IntParam, Param, ParamMap}
import org.apache.spark.ml.util.{DefaultParamsReadable, DefaultParamsWritable, Identifiable, MLReadable, MLReader, MLWritable, MLWriter}
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{ArrayType, DoubleType, StructType}

/** Shared Params for the whitening fit/transform pair. */
private[ml] trait WhitenerParams extends org.apache.spark.ml.param.Params {
  final val inputCol = new Param[String](this, "inputCol",
    "embedding column (array<float|double>)")
  final val outputCol = new Param[String](this, "outputCol",
    "whitened-coordinates output column (array<double>, length k)")
  final val k = new IntParam(this, "k", "number of principal components")
  final val iters = new IntParam(this, "iters",
    "fixed power-iteration steps per component")
  setDefault(inputCol -> "embedding", outputCol -> "whitened",
    k -> 4, iters -> 15)

  protected def validateAndTransformSchema(schema: StructType)
      : StructType = {
    require(schema.fieldNames.contains($(inputCol)),
      s"input is missing inputCol '${$(inputCol)}'")
    schema.add($(outputCol), ArrayType(DoubleType, containsNull = false))
  }
}

/** `spark.ml` Estimator over the [[Linalg]] whitening fit: ONE corpus
  * pass through the gram-moments aggregate, a driver-side deflated
  * power iteration for the top-k eigenpairs, and a model whose
  * transform appends the k decorrelated unit-variance coordinates as
  * one array column (k broadcast-literal dot products inside a single
  * scan — zero shuffles). The second REAL estimator of the `graft.ml`
  * layer next to [[NumericPreprocessor]]: learned state is the (k×d)
  * component matrix + eigenvalues, persisted as parquet
  * params-as-data exactly like the fit frames elsewhere. */
class Whitener(override val uid: String)
    extends Estimator[WhitenerModel] with WhitenerParams
    with DefaultParamsWritable {

  def this() = this(Identifiable.randomUID("graftWhitener"))

  def setInputCol(v: String): this.type = set(inputCol, v)
  def setOutputCol(v: String): this.type = set(outputCol, v)
  def setK(v: Int): this.type = set(k, v)
  def setIters(v: Int): this.type = set(iters, v)

  override def fit(dataset: Dataset[_]): WhitenerModel = {
    transformSchema(dataset.schema)
    val (n, sums, prods) =
      Linalg.collectMoments(dataset.toDF(), $(inputCol))
    val (comps, lams) = Linalg.pcaTopK(
      Linalg.covarianceFromMoments(n, sums, prods), $(k), $(iters))
    lams.zipWithIndex.foreach { case (l, c) =>
      require(l > 0.0, s"whitener: eigenvalue $c is $l (component " +
        "space exhausted — lower k)")
    }
    copyValues(new WhitenerModel(uid, comps, lams).setParent(this))
  }

  override def transformSchema(schema: StructType): StructType =
    validateAndTransformSchema(schema)

  override def copy(extra: ParamMap): Whitener = defaultCopy(extra)
}

object Whitener extends DefaultParamsReadable[Whitener]

/** Fitted whitening model: top-k components (9 dp) + eigenvalues. */
class WhitenerModel private[ml] (override val uid: String,
    private[ml] val components: Array[Array[Double]],
    private[ml] val eigenvalues: Array[Double])
    extends Model[WhitenerModel] with WhitenerParams with MLWritable {

  override def transform(dataset: Dataset[_]): DataFrame = {
    transformSchema(dataset.schema)
    def round9(v: Double): Double = math.rint(v * 1e9) / 1e9
    val coords = components.zip(eigenvalues).map { case (vv, lam) =>
      val s = round9(1.0 / math.sqrt(lam))
      round(Linalg.dot(col($(inputCol)), vv) * s, 6)
    }
    // row count preserved; a null or dim-mismatched vector has no
    // projection — null output array, never an array of null coords
    val d = components.headOption.map(_.length).getOrElse(0)
    dataset.toDF().withColumn($(outputCol),
      when(col($(inputCol)).isNotNull &&
          size(col($(inputCol))) === d, array(coords: _*))
        .otherwise(lit(null).cast(s"array<double>")))
  }

  override def transformSchema(schema: StructType): StructType =
    validateAndTransformSchema(schema)

  override def copy(extra: ParamMap): WhitenerModel =
    copyValues(new WhitenerModel(uid, components, eigenvalues), extra)
      .setParent(parent)

  override def write: MLWriter = new MLWriter {
    override protected def saveImpl(path: String): Unit = {
      val mode = if (shouldOverwrite) "overwrite" else "errorifexists"
      val spark = sparkSession
      import spark.implicits._
      val rows = for {
        c <- components.indices
        j <- components(c).indices
      } yield (c, j, components(c)(j), eigenvalues(c))
      rows.toDF("comp", "j", "loading", "eigval")
        .coalesce(1).write.mode(mode).parquet(s"$path/components")
      params.toSeq.filter(p => isSet(p))
        .map(p => (p.name, get(p).get.toString))
        .toDF("param", "value")
        .coalesce(1).write.mode(mode).parquet(s"$path/params")
    }
  }
}

object WhitenerModel extends MLReadable[WhitenerModel] {
  override def read: MLReader[WhitenerModel] =
    new MLReader[WhitenerModel] {
      override def load(path: String): WhitenerModel = {
        val spark = SparkSession.active
        val rows = spark.read.parquet(s"$path/components").collect()
        val byComp = rows.groupBy(_.getInt(0))
        val kk = byComp.keySet.max + 1
        val comps = Array.tabulate(kk) { c =>
          byComp(c).sortBy(_.getInt(1)).map(_.getDouble(2))
        }
        val lams = Array.tabulate(kk)(c => byComp(c).head.getDouble(3))
        val m = new WhitenerModel(
          Identifiable.randomUID("graftWhitener"), comps, lams)
        spark.read.parquet(s"$path/params").collect().foreach { r =>
          val p = m.getParam(r.getString(0))
          val raw = r.getString(1)
          val v: Any =
            if (p.isInstanceOf[IntParam]) raw.toInt else raw
          m.set(p.asInstanceOf[Param[Any]], v)
        }
        m
      }
    }
}
