package graft.ml

import graft.expressions.VectorFunctions
import graft.ops.Similarity
import org.apache.spark.ml.{Estimator, Model}
import org.apache.spark.ml.param.{IntParam, Param, ParamMap}
import org.apache.spark.ml.util.{DefaultParamsReadable, DefaultParamsWritable, Identifiable, MLReadable, MLReader, MLWritable, MLWriter}
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StructType}

/** Shared Params for the k-means fit/assign pair. */
private[ml] trait KMeansClustererParams
    extends org.apache.spark.ml.param.Params {
  final val inputCol = new Param[String](this, "inputCol",
    "embedding column (array<float|double>)")
  final val outputCol = new Param[String](this, "outputCol",
    "assigned-cluster output column (long)")
  final val k = new IntParam(this, "k", "number of clusters")
  final val iters = new IntParam(this, "iters",
    "fixed Lloyd's iterations")
  setDefault(inputCol -> "embedding", outputCol -> "centroid_id",
    k -> 8, iters -> 2)

  protected def validateAndTransformSchema(schema: StructType)
      : StructType = {
    require(schema.fieldNames.contains($(inputCol)),
      s"input is missing inputCol '${$(inputCol)}'")
    // nullable: a null input vector maps to a null cluster id
    schema.add($(outputCol), LongType, nullable = true)
  }
}

/** `spark.ml` Estimator over the engine's replayable Lloyd's fit
  * ([[Similarity.kmeansIterate]] — the q238 dataflow): deterministic
  * dyadic init (the q126 literal formula, no RNG), `iters` fixed
  * assign→integer-lattice-M-step rounds (ONE (centroid,dim) exchange
  * each), learned state = the ≤k surviving centroid vectors. The
  * model's transform appends the nearest-centroid id via the
  * zero-exchange native [[graft.expressions.NearestCentroids]]
  * projection (cos DESC, centroid_id ASC tie-break — the q126 rule);
  * centroids persist as parquet params-as-data. Wrapper semantics are
  * CONTRACTUAL: q243 runs THIS stage against q238's unrolled SQL
  * replay, and the spec pins ≡ kmeansIterate+ivfAssign row-for-row. */
class KMeansClusterer(override val uid: String)
    extends Estimator[KMeansClustererModel] with KMeansClustererParams
    with DefaultParamsWritable {

  def this() = this(Identifiable.randomUID("graftKMeans"))

  def setInputCol(v: String): this.type = set(inputCol, v)
  def setOutputCol(v: String): this.type = set(outputCol, v)
  def setK(v: Int): this.type = set(k, v)
  def setIters(v: Int): this.type = set(iters, v)

  /** The q126/q238 literal dyadic start: c[j][i] = ((j·31+i·7) mod 17
    * − 8)/8 — exactly representable, identical across engines. */
  private def dyadicInit(spark: SparkSession, dim: Int): DataFrame =
    spark.range($(k)).select(col("id").as("centroid_id"),
      expr(s"transform(sequence(0, ${dim - 1}), " +
        "i -> CAST((id * 31 + i * 7) % 17 - 8 AS DOUBLE) / 8.0)")
        .as("c_vec"))

  override def fit(dataset: Dataset[_]): KMeansClustererModel = {
    transformSchema(dataset.schema)
    val df0 = dataset.toDF()
    // fit re-scans its input iters+1 times (the dim probe plus one
    // Lloyd's pass per iteration). When the input is a bare columnar
    // scan (± project/filter) each re-scan is the cheapest possible
    // pass and pinning would materialize corpus-sized vectors — a
    // loss at 100 TB. When the input carries a WIDE or generating
    // chain (the q246 Pipeline: tokenize → explode → hash-agg pivot),
    // every re-scan re-pays that chain — pin the projected vectors
    // ONCE (guide §5: persist only when reuse beats recompute; the
    // decision reads the PLAN, not a constant). Only the input column
    // is pinned, never the caller's full row.
    val slim = df0.select(col($(inputCol)))
    // the ANALYZED plan (not the parsed one): a generator in a select
    // list only surfaces as a Generate node after analysis
    val df =
      if (KMeansClusterer.cheapRescan(df0.queryExecution.analyzed)) slim
      else slim.localCheckpoint(true)
    val first = df.filter(col($(inputCol)).isNotNull)
      .select(size(col($(inputCol)))).head(1)
    require(first.nonEmpty, s"k-means fit: no non-null ${$(inputCol)}")
    // idCol is part of kmeansIterate's signature but unused by the
    // zero-exchange assignment projection — no such column needed here
    val cents = Similarity.kmeansIterate(df, "__fit_id", $(inputCol),
      dyadicInit(df.sparkSession, first.head.getInt(0)), $(iters))
    val rows = cents
      .select(col("centroid_id").cast("long"),
        col("c_vec").cast("array<double>"))
      .collect().sortBy(_.getLong(0))
    copyValues(new KMeansClustererModel(uid,
      rows.map(_.getLong(0)),
      rows.map(_.getSeq[Double](1).toArray)).setParent(this))
  }

  override def transformSchema(schema: StructType): StructType =
    validateAndTransformSchema(schema)

  override def copy(extra: ParamMap): KMeansClusterer = defaultCopy(extra)
}

object KMeansClusterer extends DefaultParamsReadable[KMeansClusterer] {
  /** The fit-input cost signal: true iff re-scanning the plan is as
    * cheap as reading it back — every node is a leaf relation, a
    * projection, a filter or an alias. Any other INNER node (an
    * aggregate/pivot, join, generate/explode, window, union …) means
    * a re-scan re-executes real dataflow, so [[KMeansClusterer.fit]]
    * pins the projected input once instead. A bare parquet scan MUST
    * come back true — checkpointing it would materialize corpus-sized
    * vectors to win nothing (pinned by MlPipelineSpec). */
  private[graft] def cheapRescan(
      plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan)
      : Boolean =
    plan.find {
      case _: org.apache.spark.sql.catalyst.plans.logical.Project |
          _: org.apache.spark.sql.catalyst.plans.logical.Filter |
          _: org.apache.spark.sql.catalyst.plans.logical.SubqueryAlias
          => false
      case p => p.children.nonEmpty // any other inner node = dataflow
    }.isEmpty
}

/** Fitted clustering model: id-sorted surviving centroids. */
class KMeansClustererModel private[ml] (override val uid: String,
    private[ml] val centroidIds: Array[Long],
    private[ml] val centroids: Array[Array[Double]])
    extends Model[KMeansClustererModel] with KMeansClustererParams
    with MLWritable {

  override def transform(dataset: Dataset[_]): DataFrame = {
    transformSchema(dataset.schema)
    // spark.ml convention: transform preserves row count — a null
    // input vector yields a null cluster id instead of silently
    // shrinking the table under a Pipeline consumer that counts or
    // re-joins rows. `get` (0-based, null on out-of-bounds) instead of
    // ANSI element_at: a dim-mismatched vector matches NO centroid
    // (nearestCentroids skips them), and its empty selection must read
    // as an unassignable row (null id), not an array-index error.
    dataset.toDF()
      .withColumn($(outputCol),
        when(col($(inputCol)).isNotNull,
          org.apache.spark.sql.functions.get(
            VectorFunctions.nearestCentroids(col($(inputCol)),
              centroidIds, centroids, 1), lit(0)))
          .otherwise(lit(null).cast("long")))
  }

  override def transformSchema(schema: StructType): StructType =
    validateAndTransformSchema(schema)

  override def copy(extra: ParamMap): KMeansClustererModel =
    copyValues(new KMeansClustererModel(uid, centroidIds, centroids),
      extra).setParent(parent)

  override def write: MLWriter = new MLWriter {
    override protected def saveImpl(path: String): Unit = {
      val mode = if (shouldOverwrite) "overwrite" else "errorifexists"
      val spark = sparkSession
      import spark.implicits._
      val rows = for {
        c <- centroids.indices
        j <- centroids(c).indices
      } yield (centroidIds(c), j, centroids(c)(j))
      rows.toDF("centroid_id", "j", "v")
        .coalesce(1).write.mode(mode).parquet(s"$path/centroids")
      params.toSeq.filter(p => isSet(p))
        .map(p => (p.name, get(p).get.toString))
        .toDF("param", "value")
        .coalesce(1).write.mode(mode).parquet(s"$path/params")
    }
  }
}

object KMeansClustererModel extends MLReadable[KMeansClustererModel] {
  override def read: MLReader[KMeansClustererModel] =
    new MLReader[KMeansClustererModel] {
      override def load(path: String): KMeansClustererModel = {
        val spark = SparkSession.active
        val rows = spark.read.parquet(s"$path/centroids").collect()
        val byId = rows.groupBy(_.getLong(0))
        val ids = byId.keySet.toArray.sorted
        val cvs = ids.map(i =>
          byId(i).sortBy(_.getInt(1)).map(_.getDouble(2)))
        val m = new KMeansClustererModel(
          Identifiable.randomUID("graftKMeans"), ids, cvs)
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
