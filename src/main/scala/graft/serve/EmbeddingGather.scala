package graft.serve

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.expressions.AggregateFunctions.weightedVecSum

/** Relational form of the reference's DataEmbeddingLayer
  * (/root/reference/EventStream/EventStreamData/data_embedding_layer.py:
  * 45-397): `EmbeddingBag(mode='sum', padding_idx=0)` with
  * per-sample weights = numeric values (1.0 for categorical) is exactly
  *
  *   explode(bag) ⋈ embedding_table ⋈ groupBy(bag_id).sum(weight * vec)
  *
  * expressed as ONE shuffle: a broadcast hash join observations →
  * embedding rows, then a per-bag weighted vector-sum aggregate
  * (`WeightedVecSumAgg`, a native TypedImperativeAggregate over ArrayData —
  * see expressions/AggregateExpressions.scala for why not an
  * Aggregator/udaf). Partial aggregation makes the wire traffic
  * |bags| × dim doubles per map task — the same as the old by-dimension
  * form, but without materializing |items| × dim exploded rows through a
  * first exchange and a second regrouping exchange.
  */
object EmbeddingGather {

  /** Weighted-sum gather.
    * @param items  observation rows: one per bag element
    * @param emb    embedding table (embIdCol LONG, vecCol ARRAY<FLOAT|DOUBLE>)
    * @return one row per bag id: (idCol, emb ARRAY<DOUBLE>)
    */
  def gather(items: DataFrame, idCol: String, idxCol: String,
      weightCol: String, emb: DataFrame, embIdCol: String,
      vecCol: String): DataFrame = {
    items
      // padding_idx=0 contributes nothing (reference bag layers :174-198)
      .filter(col(idxCol) =!= 0)
      .select(col(idCol), col(idxCol),
        coalesce(col(weightCol), lit(1.0)).as("__w"))
      .join(broadcast(emb.select(col(embIdCol).as("__eid"),
        col(vecCol).cast("array<double>").as("__vec"))),
        col(idxCol) === col("__eid"))
      .groupBy(col(idCol))
      .agg(weightedVecSum(col("__w"), col("__vec")).as("emb"))
  }

  /** DataEmbeddingLayer static mode CONCAT (data_embedding_layer.py:
    * 245-397, `StaticEmbeddingMode`): the static measurements are embedded
    * as their own bag and the result is CONCATENATED onto the dynamic
    * embedding (output dim = dynamic dim + static dim), vs mode SUM where
    * static items union into one bag. Relationally: two independent
    * gathers joined on the bag id. Subjects with no static observations
    * get a zero block of `staticDim` (EmbeddingBag of an empty bag).
    * Broadcast-sized right side per bag id → left join, narrow after the
    * gathers' own shuffles. */
  def concatStatic(dyn: DataFrame, staticBags: DataFrame, idCol: String,
      staticDim: Int, embCol: String = "emb"): DataFrame = {
    val zeros = array_repeat(lit(0.0), staticDim)
    dyn.join(
        staticBags.select(col(idCol), col(embCol).as("__s_emb")),
        Seq(idCol), "left")
      .withColumn(embCol, concat(col(embCol), coalesce(col("__s_emb"), zeros)))
      .drop("__s_emb")
  }

  /** DataEmbeddingLayer static mode PREPEND (data_embedding_layer.py:
    * 395-396): `torch.cat([static_embedded, embedded], dim=1)` — the
    * static embedding becomes an extra SEQUENCE position 0 ahead of the
    * per-event dynamic embeddings (output length L+1), vs CONCAT which
    * widens the feature dim. Relationally: the static bag rows union in
    * with position 0. `dynSeq` must carry 1-based positions (its
    * position 1 is the reference's post-prepend index 1). Narrow — a
    * union, no shuffle. */
  def prependStatic(dynSeq: DataFrame, staticBags: DataFrame,
      idCol: String, posCol: String, embCol: String = "emb"): DataFrame =
    staticBags
      .select(col(idCol), lit(0).cast("int").as(posCol), col(embCol))
      .unionByName(
        dynSeq.select(col(idCol), col(posCol).cast("int").as(posCol),
          col(embCol)))

  /** Measurement-index normalization
    * (data_embedding_layer.py:200-230, `do_normalize_by_measurement_index`):
    * each observation's weight is scaled by
    * `(1 / count of its measurement within the bag) / Σ_j (1/count_j)`;
    * since each distinct measurement's positions sum to exactly 1, the
    * denominator is simply the bag's distinct-measurement count — every
    * measurement contributes equal total mass regardless of how many
    * observations it has. Returns `items` + a `__meas_norm` column
    * (0 for padding measurement_idx 0) for composition with `gather`. */
  def withMeasurementNormalization(items: DataFrame, idCol: String,
      measIdxCol: String): DataFrame = {
    // Single-exchange form (was: two groupBy aggs + two joins — four
    // shuffles of the items table). The bag-level window exchanges on
    // idCol; the (bag, measurement) window's ClusteredDistribution is
    // already satisfied by hashpartitioning(idCol), so Spark inserts only
    // a local sort for it — one shuffle total, no joins.
    val byBag = Window.partitionBy(col(idCol))
    val byBagMeas = Window.partitionBy(col(idCol), col(measIdxCol))
    items
      .withColumn("__n_meas",
        size(collect_set(when(col(measIdxCol) =!= 0, col(measIdxCol)))
          .over(byBag)))
      .withColumn("__meas_cnt", count(lit(1)).over(byBagMeas))
      .withColumn("__meas_norm",
        // NULL measurement idx gets 0.0 like padding — the pre-rewrite
        // join form never matched null keys, so nulls carried zero weight
        when(col(measIdxCol) === 0 || col(measIdxCol).isNull, lit(0.0))
          .otherwise(lit(1.0) /
            (col("__meas_cnt") * col("__n_meas"))))
      .drop("__meas_cnt", "__n_meas")
  }

  /** Split categorical/numerical gather
    * (data_embedding_layer.py:249-273, SPLIT_CATEGORICAL_NUMERICAL):
    * every observation contributes weight 1 to a CATEGORICAL embedding
    * table, valued observations additionally contribute weight `value` to
    * a NUMERICAL embedding table (unvalued → 0, the reference's
    * values_mask), and the result is the convex combination
    * `cw·cat + nw·num` with the weights normalized to sum 1 (:171-172).
    * The two tables stand in for the reference's per-mode
    * EmbeddingBag+Linear stacks (projections are learned model state —
    * callers supply pre-projected tables). Bags with no valued
    * observations get `cw·cat` (their numerical sum is the zero vector).
    */
  def splitGather(items: DataFrame, idCol: String, idxCol: String,
      valueCol: String,
      catEmb: DataFrame, catIdCol: String, catVecCol: String,
      numEmb: DataFrame, numIdCol: String, numVecCol: String,
      categoricalWeight: Double = 0.5, numericalWeight: Double = 0.5)
      : DataFrame = {
    val cw = categoricalWeight / (categoricalWeight + numericalWeight)
    val nw = numericalWeight / (categoricalWeight + numericalWeight)
    val cat = gather(
      items.withColumn("__one", lit(1.0)),
      idCol, idxCol, "__one", catEmb, catIdCol, catVecCol)
      .withColumnRenamed("emb", "__cat")
    val num = gather(
      items.withColumn("__numw", coalesce(col(valueCol), lit(0.0))),
      idCol, idxCol, "__numw", numEmb, numIdCol, numVecCol)
      .withColumnRenamed("emb", "__num")
    // anchor on the DISTINCT bag ids: a bag whose items are all padding
    // never reaches either gather (idx 0 is filtered), but the reference
    // still emits a zero-vector row for it — batch-row alignment must
    // survive. The output dimension comes from the (broadcast) embedding
    // table itself.
    val bags = items.select(col(idCol)).distinct()
    val dim = broadcast(
      catEmb.select(size(col(catVecCol)).as("__dim")).limit(1))
    bags.crossJoin(dim)
      .join(cat, Seq(idCol), "left")
      .join(num, Seq(idCol), "left")
      .select(col(idCol),
        when(col("__cat").isNull,
          array_repeat(lit(0.0), col("__dim")))
          .when(col("__num").isNull,
            transform(col("__cat"), x => lit(cw) * x))
          .otherwise(zip_with(col("__cat"), col("__num"),
            (x, y) => lit(cw) * x + lit(nw) * y)).as("emb"))
  }
}
