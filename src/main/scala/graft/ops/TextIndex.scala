package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Persisted, incrementally-maintained BM25 inverted index — the
  * text-retrieval twin of the [[AnnIndex]]+[[Hnsw]] maintenance
  * lifecycle (Robertson et al., Okapi at TREC-3 1994; identical
  * scoring to [[TextOps.bm25]]/[[TextOps.bm25Search]], spec-pinned).
  * A growing RAG/retrieval corpus should not re-tokenize 100 TB to
  * refresh df and avg-length every day: every BM25 statistic is a sum
  * of per-batch integers, so the index stores ADDITIVE deltas in the
  * same batch-directory parquet store [[AnnIndex]] uses (the store is
  * generic parts + params + manifest-written-last; nothing in it is
  * ANN-specific), and a query resolves them with vocabulary-bounded
  * rollups — never a corpus rescan.
  *
  * Parts (all un-keyed — plain batch unions, append cost = the delta):
  *  - `postings` (idCol, term, tf, dl): one row per distinct
  *    (doc, term), with the doc length DENORMALIZED onto the posting
  *    (the Lucene norms idiom) so scoring never joins a doc table;
  *  - `docs` (idCol, dl): the stored-id set — the maintenance
  *    stream's re-arrival anti-join target, and the CDC hook a
  *    delete/compact pass would rewrite;
  *  - `termdf` (term, df_delta): per-batch document frequencies —
  *    exact because re-arrivals are dropped before the delta is
  *    computed, so SUM(df_delta) IS df;
  *  - `stats` (n_docs, len_sum): ONE row per batch; N and avg_dl come
  *    from summing this batches-sized table. len_sum is an exact
  *    integer sum, so len_sum/N equals the double-avg of
  *    integer-valued lengths ([[TextOps.bm25]]'s q94 invariant) in
  *    every summation order.
  *
  * Query plan shape at 100 TB: `search` filters `postings` and
  * `termdf` on the query's terms BEFORE any join or agg — parquet
  * min/max + dictionary pushdown prunes the scan to the query
  * vocabulary, the df/stats rollups are ≤ |terms|- and
  * ≤ |batches|-sized broadcasts, and the only wide stage is the
  * per-doc score agg over matched postings (map-side combinable,
  * k-bounded output). That is the difference between BM25-as-a-
  * nightly-batch-job and BM25-as-a-service.
  */
object TextIndex {
  private val Kind = "bm25"

  /** The four delta parts for a batch of NEW documents (caller
    * guarantees ids are not already stored — the maintenance stream
    * anti-joins against `docs` first). Rows with empty/whitespace text
    * are excluded from every statistic, matching [[TextOps.bm25]]. */
  def deltaParts(docs: DataFrame, idCol: String, textCol: String)
      : Map[String, DataFrame] = {
    val d = docs.filter(length(trim(col(textCol))) > 0)
      .select(col(idCol), col(textCol))
    val lens = d.select(col(idCol),
      TextOps.tokenCount(col(textCol)).cast("long").as("dl"))
    val tf = d
      .select(col(idCol),
        explode(TextOps.tokens(lower(col(textCol)))).as("term"))
      .groupBy(col(idCol), col("term"))
      .agg(count(lit(1)).as("tf"))
    val postings = tf.join(lens, Seq(idCol))
      .select(col(idCol), col("term"), col("tf"), col("dl"))
    val termdf = tf.groupBy(col("term"))
      .agg(count(lit(1)).as("df_delta"))
    val stats = lens.agg(count(lit(1)).as("n_docs"),
      coalesce(sum(col("dl")), lit(0L)).as("len_sum"))
    Map("postings" -> postings, "docs" -> lens,
      "termdf" -> termdf, "stats" -> stats)
  }

  /** Build and persist the index from scratch (the seed save the
    * maintenance stream grows from). The empty `deleted` part is the
    * live-docs exclusion list [[delete]] appends to. */
  def save(path: String, docs: DataFrame, idCol: String,
      textCol: String): Unit =
    AnnIndex.save(path,
      deltaParts(docs, idCol, textCol) +
        ("deleted" -> docs.select(col(idCol)).limit(0)),
      Map("kind" -> Kind, "id_col" -> idCol, "text_col" -> textCol))

  /** Delete documents — the Lucene live-docs semantics: the ids land
    * on an exclusion list ([[search]] anti-joins matched postings
    * against it), while their contribution to df and N stays in the
    * statistics until [[compact]] physically merges them out. The
    * write is |ids|-sized; nothing scans the index. A deleted id
    * cannot be re-inserted until a compact frees it ([[append]] treats
    * it as still stored — re-using external ids across a delete
    * without compacting is the one unsupported order, as in Lucene,
    * where internal doc numbers make it a non-question). */
  def delete(spark: SparkSession, path: String, ids: DataFrame,
      idCol: String): Unit = {
    val (_, params) = AnnIndex.load(spark, path)
    require(params.get("kind").contains(Kind),
      s"TextIndex.delete: index at $path has kind " +
        s"${params.getOrElse("kind", "?")}, expected $Kind")
    AnnIndex.append(path,
      Map("deleted" -> ids.select(col(idCol)).distinct()))
  }

  /** Fold the index to single-batch form AND physically apply the
    * deletion list — the Lucene merge, computed entirely FROM THE
    * INDEX (no text is ever re-tokenized): surviving postings are an
    * anti-join, df is re-counted from them (one vocabulary-bounded
    * agg over index rows), stats re-derive from the surviving doc
    * list, and the deleted part empties — freeing those ids for
    * re-insertion. After this, search's df/N are exact again
    * (equality with save(survivors) is spec-pinned). `dst` must
    * differ from `src`, as in [[AnnIndex.compact]]. */
  def compact(spark: SparkSession, srcPath: String, dstPath: String)
      : Unit = {
    require(srcPath != dstPath,
      "TextIndex.compact: dstPath must differ from srcPath")
    val (parts, params) = AnnIndex.load(spark, srcPath)
    require(params.get("kind").contains(Kind),
      s"TextIndex.compact: index at $srcPath has kind " +
        s"${params.getOrElse("kind", "?")}, expected $Kind")
    val idCol = params("id_col")
    val dead = parts("deleted").select(idCol).distinct()
      .localCheckpoint(true)
    val docs = parts("docs").join(dead, Seq(idCol), "left_anti")
      .localCheckpoint(true)
    val postings = parts("postings")
      .join(dead, Seq(idCol), "left_anti")
      .localCheckpoint(true)
    val termdf = postings.groupBy(col("term"))
      .agg(count(lit(1)).as("df_delta"))
    val stats = docs.agg(count(lit(1)).as("n_docs"),
      coalesce(sum(col("dl")), lit(0L)).as("len_sum"))
    AnnIndex.save(dstPath,
      Map("postings" -> postings, "docs" -> docs, "termdf" -> termdf,
        "stats" -> stats, "deleted" -> docs.select(col(idCol)).limit(0)),
      params)
  }

  /** Append a batch of documents as one more batch directory per part
    * (manifest bumped last — a torn append is invisible). Re-arrivals
    * of stored ids are dropped HERE so df_delta stays exact no matter
    * the caller. Exact replays within a batch (same id, same text)
    * collapse; two DIFFERENT texts under one id are a data bug and
    * FAIL LOUDLY — a silent arbitrary winner would make the index
    * partition-order dependent. Returns the number of genuinely-new
    * docs appended.
    *
    * Scale shape: the stored-id overlap check collects the batch's
    * ids to the driver (bounded by the micro-batch, the trigger-sized
    * quantity) and probes the `docs` part with an `id IN (...)`
    * predicate — parquet row-group stats/dictionary pruning keeps the
    * probe ∝ matching row groups instead of re-scanning the stored
    * corpus per batch (raise
    * `spark.sql.parquet.pushdown.inFilterThreshold` above the batch
    * size so large batches keep the In-pushdown instead of degrading
    * to a min/max range). */
  def append(spark: SparkSession, path: String, docs: DataFrame,
      idCol: String, textCol: String): Long = {
    val (parts, params) = AnnIndex.load(spark, path)
    require(params.get("kind").contains(Kind),
      s"TextIndex.append: index at $path has kind " +
        s"${params.getOrElse("kind", "?")}, expected $Kind")
    val arriving = docs.select(col(idCol), col(textCol))
      .dropDuplicates(idCol, textCol)
      .localCheckpoint(true)
    val conflicts = arriving.groupBy(col(idCol))
      .agg(count(lit(1)).as("__n")).filter(col("__n") > 1)
      .select(col(idCol)).limit(5).collect().map(_.get(0))
    require(conflicts.isEmpty,
      s"TextIndex.append: conflicting texts for id(s) " +
        s"${conflicts.mkString(", ")} within one batch — an " +
        "arbitrary winner would be partition-order dependent; " +
        "resolve upstream (or delete + re-insert as a CDC update)")
    val ids = arriving.select(col(idCol)).collect().map(_.get(0))
    if (ids.isEmpty) return 0L
    val stored = parts("docs").select(col(idCol))
      .filter(col(idCol).isin(ids.toIndexedSeq: _*))
    val fresh = arriving.join(stored, Seq(idCol), "left_anti")
      .localCheckpoint(true)
    val n = fresh.count()
    if (n > 0)
      AnnIndex.append(path, deltaParts(fresh, idCol, textCol))
    n
  }

  /** BM25 top-`k` from the persisted index: (idCol, n_hit, score) by
    * (round-6 score desc, id asc) — the [[TextOps.bm25Search]]
    * contract, answered from disk with term-pruned scans. */
  def search(spark: SparkSession, path: String, query: String, k: Int,
      k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    val qt = query.trim.toLowerCase.split("\\s+")
      .filter(_.nonEmpty).distinct.toSeq
    require(qt.nonEmpty, "TextIndex.search needs a non-empty query")
    val (parts, params) = AnnIndex.load(spark, path)
    require(params.get("kind").contains(Kind),
      s"TextIndex.search: index at $path has kind " +
        s"${params.getOrElse("kind", "?")}, expected $Kind")
    val idCol = params("id_col")
    // batches-sized and |terms|-sized rollups — broadcast into the
    // posting scan so the only wide stage is the per-doc score agg
    val stats = parts("stats")
      .agg(sum(col("n_docs")).cast("double").as("__n_docs"),
        (sum(col("len_sum")).cast("double") /
          sum(col("n_docs")).cast("double")).as("__avg_dl"))
    val df = parts("termdf")
      .filter(col("term").isin(qt: _*))
      .groupBy(col("term"))
      .agg(sum(col("df_delta")).as("df"))
    // live-docs exclusion: deleted docs never score, but their df/N
    // contribution persists until compact (the Lucene semantics); the
    // list is deletions-since-last-compact — broadcast-sized
    val dead = parts("deleted").select(idCol).distinct()
    parts("postings")
      .filter(col("term").isin(qt: _*))
      .join(broadcast(dead), Seq(idCol), "left_anti")
      .join(broadcast(df), Seq("term"))
      .crossJoin(broadcast(stats))
      .select(col(idCol),
        (log(lit(1.0) + (col("__n_docs") - col("df") + 0.5) /
            (col("df") + 0.5)) *
          (col("tf") * (k1 + 1.0)) /
          (col("tf") + lit(k1) * (lit(1.0 - b) +
            lit(b) * col("dl").cast("double") / col("__avg_dl"))))
          .as("bm25"))
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_hit"),
        round(sum(col("bm25")), 6).as("score"))
      .orderBy(desc("score"), asc(idCol)).limit(k)
  }
}
