package graft.ml

import graft.ops.Linalg
import org.apache.spark.ml.{Estimator, Model}
import org.apache.spark.ml.param.{DoubleParam, IntParam, Param, ParamMap}
import org.apache.spark.ml.util.{DefaultParamsReadable, DefaultParamsWritable, Identifiable, MLReadable, MLReader, MLWritable, MLWriter}
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{BooleanType, DoubleType, StructType}

/** Shared Params for the ridge-probe fit/score pair. */
private[ml] trait RidgeProbeParams
    extends org.apache.spark.ml.param.Params {
  final val inputCol = new Param[String](this, "inputCol",
    "embedding column (array<float|double>)")
  final val labelCol = new Param[String](this, "labelCol",
    "probe target column (castable to double)")
  final val scoreCol = new Param[String](this, "scoreCol",
    "probe-score output column (double, 6 dp)")
  final val keepCol = new Param[String](this, "keepCol",
    "threshold-flag output column (boolean)")
  final val lambda = new DoubleParam(this, "lambda",
    "L2 regularization strength")
  final val eta = new DoubleParam(this, "eta", "GD step size")
  final val iters = new IntParam(this, "iters", "fixed GD iterations")
  final val threshold = new DoubleParam(this, "threshold",
    "keep = (6dp-rounded score >= threshold)")
  setDefault(inputCol -> "embedding", labelCol -> "y",
    scoreCol -> "score", keepCol -> "keep",
    lambda -> 0.1, eta -> 0.5, iters -> 50, threshold -> 0.1)

  protected def validateAndTransformSchema(schema: StructType)
      : StructType = {
    require(schema.fieldNames.contains($(inputCol)),
      s"input is missing inputCol '${$(inputCol)}'")
    schema.add($(scoreCol), DoubleType, nullable = true)
      .add($(keepCol), BooleanType, nullable = true)
  }
}

/** `spark.ml` Estimator over the engine's standardized ridge probe
  * ([[Linalg.ridgeFitStd]] — the q228 dataflow, the fastText/
  * FineWeb-Edu quality-filter recipe): ONE gram-moments corpus pass,
  * driver-side GD on 9dp-rounded reductions with an unregularized
  * intercept over standardized coordinates. Learned state =
  * (β₀, β, μ, σ); the model's transform folds standardization into a
  * single broadcast-literal dot product plus a constant — one narrow
  * scan, zero shuffles at any corpus size. Wrapper semantics are
  * CONTRACTUAL: q244 runs THIS stage against q228's oracle SQL string
  * verbatim, and the spec pins ≡ [[Linalg.ridgeScoreStd]] row-for-row. */
class RidgeProbe(override val uid: String)
    extends Estimator[RidgeProbeModel] with RidgeProbeParams
    with DefaultParamsWritable {

  def this() = this(Identifiable.randomUID("graftRidgeProbe"))

  def setInputCol(v: String): this.type = set(inputCol, v)
  def setLabelCol(v: String): this.type = set(labelCol, v)
  def setScoreCol(v: String): this.type = set(scoreCol, v)
  def setKeepCol(v: String): this.type = set(keepCol, v)
  def setLambda(v: Double): this.type = set(lambda, v)
  def setEta(v: Double): this.type = set(eta, v)
  def setIters(v: Int): this.type = set(iters, v)
  def setThreshold(v: Double): this.type = set(threshold, v)

  override def fit(dataset: Dataset[_]): RidgeProbeModel = {
    transformSchema(dataset.schema)
    require(dataset.schema.fieldNames.contains($(labelCol)),
      s"fit input is missing labelCol '${$(labelCol)}'")
    val (_, beta0, beta, mu, sig) = Linalg.ridgeFitStd(dataset.toDF(),
      $(inputCol), $(labelCol), $(lambda), $(eta), $(iters))
    copyValues(new RidgeProbeModel(uid, beta0, beta, mu, sig)
      .setParent(this))
  }

  override def transformSchema(schema: StructType): StructType =
    validateAndTransformSchema(schema)

  override def copy(extra: ParamMap): RidgeProbe = defaultCopy(extra)
}

object RidgeProbe extends DefaultParamsReadable[RidgeProbe]

/** Fitted probe: (β₀, β, μ, σ) — k·4 doubles of params-as-data. */
class RidgeProbeModel private[ml] (override val uid: String,
    private[ml] val beta0: Double,
    private[ml] val beta: Array[Double],
    private[ml] val mu: Array[Double],
    private[ml] val sig: Array[Double])
    extends Model[RidgeProbeModel] with RidgeProbeParams
    with MLWritable {

  /** The q228 apply algebra, replayed EXACTLY: `a_j = round9(β_j/σ_j)`,
    * `c₀ = round9(β₀ − Σ a_j μ_j)` (sum first, subtract once),
    * `score = round(c₀ + x·a, 6)`, keep from the ROUNDED score. */
  override def transform(dataset: Dataset[_]): DataFrame = {
    transformSchema(dataset.schema)
    val a = Array.tabulate(beta.length)(j =>
      Linalg.round9(beta(j) / sig(j)))
    var acc = 0.0
    var j = 0
    while (j < a.length) { acc += a(j) * mu(j); j += 1 }
    val c0 = Linalg.round9(beta0 - acc)
    val s = round(lit(c0) + Linalg.dot(col($(inputCol)), a), 6)
    dataset.toDF()
      .withColumn($(scoreCol), s)
      .withColumn($(keepCol), col($(scoreCol)) >= $(threshold))
  }

  override def transformSchema(schema: StructType): StructType =
    validateAndTransformSchema(schema)

  override def copy(extra: ParamMap): RidgeProbeModel =
    copyValues(new RidgeProbeModel(uid, beta0, beta, mu, sig), extra)
      .setParent(parent)

  override def write: MLWriter = new MLWriter {
    override protected def saveImpl(path: String): Unit = {
      val mode = if (shouldOverwrite) "overwrite" else "errorifexists"
      val spark = sparkSession
      import spark.implicits._
      // EAV params-as-data: one row per (vector, j); β₀ as its own row
      val rows = (Seq(("beta0", -1, beta0)) ++
        beta.indices.flatMap(j => Seq(
          ("beta", j, beta(j)), ("mu", j, mu(j)), ("sig", j, sig(j)))))
      rows.toDF("part", "j", "v")
        .coalesce(1).write.mode(mode).parquet(s"$path/fit")
      params.toSeq.filter(p => isSet(p))
        .map(p => (p.name, get(p).get.toString))
        .toDF("param", "value")
        .coalesce(1).write.mode(mode).parquet(s"$path/params")
    }
  }
}

object RidgeProbeModel extends MLReadable[RidgeProbeModel] {
  override def read: MLReader[RidgeProbeModel] =
    new MLReader[RidgeProbeModel] {
      override def load(path: String): RidgeProbeModel = {
        val spark = SparkSession.active
        val rows = spark.read.parquet(s"$path/fit").collect()
          .map(r => (r.getString(0), r.getInt(1), r.getDouble(2)))
        def vec(part: String): Array[Double] =
          rows.filter(_._1 == part).sortBy(_._2).map(_._3)
        val m = new RidgeProbeModel(
          Identifiable.randomUID("graftRidgeProbe"),
          rows.find(_._1 == "beta0").get._3,
          vec("beta"), vec("mu"), vec("sig"))
        spark.read.parquet(s"$path/params").collect().foreach { r =>
          val p = m.getParam(r.getString(0))
          val raw = r.getString(1)
          val v: Any =
            if (p.isInstanceOf[IntParam]) raw.toInt
            else if (p.isInstanceOf[DoubleParam]) raw.toDouble
            else raw
          m.set(p.asInstanceOf[Param[Any]], v)
        }
        m
      }
    }
}
