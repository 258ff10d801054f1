package graft.serve

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Relational form of the reference's DataEmbeddingLayer
  * (/root/reference/EventStream/EventStreamData/data_embedding_layer.py:
  * 45-397): `EmbeddingBag(mode='sum', padding_idx=0)` with
  * per-sample weights = numeric values (1.0 for categorical) is exactly
  *
  *   explode(bag) ⋈ embedding_table ⋈ groupBy(bag_id).sum(weight * vec)
  *
  * expressed as two codegen-friendly shuffles:
  *   1. hash join observations → embedding rows (broadcast when the
  *      embedding table is small, which it usually is: |vocab| × dim);
  *   2. explode the vector by dimension and sum per (bag, dim) — partial
  *      aggregation makes the wire traffic |bags| × dim doubles.
  * The final collect back to an array column is a narrow re-group of
  * already-partitioned data.
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
    val joined = items
      // padding_idx=0 contributes nothing (reference bag layers :174-198)
      .filter(col(idxCol) =!= 0)
      .select(col(idCol), col(idxCol),
        coalesce(col(weightCol), lit(1.0)).as("__w"))
      .join(broadcast(emb.select(col(embIdCol).as("__eid"),
        col(vecCol).as("__vec"))), col(idxCol) === col("__eid"))
    val byDim = joined
      .select(col(idCol), col("__w"),
        posexplode(col("__vec")).as(Seq("__pos", "__comp")))
      .groupBy(col(idCol), col("__pos"))
      .agg(sum(col("__w") * col("__comp").cast("double")).as("__s"))
    byDim
      .groupBy(col(idCol))
      .agg(transform(
        sort_array(collect_list(struct(col("__pos"), col("__s")))),
        e => e("__s")).as("emb"))
  }
}
