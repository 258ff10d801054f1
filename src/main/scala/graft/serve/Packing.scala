package graft.serve

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sequence packing for LLM pretraining: lay documents end-to-end and
  * cut the concatenated token stream into fixed-length context windows
  * ("concat-and-chunk" — the standard way pretraining corpora become
  * fixed-shape training sequences; see also the batch collation path in
  * [[BatchBuilder]] for the padded per-subject variant).
  *
  * A GLOBAL concatenation order would funnel the whole corpus through
  * one partition for the running-offset window. Real pipelines pack
  * WITHIN SHARDS (a hash bucket or file split of documents): each
  * shard's token stream is independent, so the cumulative sum is a
  * window over (shard) — one shuffle, parallelism = shard count, and
  * adding shards is how the op absorbs 100 TB. Determinism: placement
  * is a pure function of (shard, order-key, token counts) — stable
  * across runs and partitionings, like everything in [[graft.ops.Sampling]].
  */
object Packing {

  /** Per-doc placement in the packed stream: for each document, the
    * index of the first context window it lands in (`first_seq`,
    * shard-local), its token offset inside that window
    * (`offset_in_seq`), and how many windows it spans (`n_seqs` —
    * long docs straddle window boundaries; real loaders either split
    * them across sequences, exactly this math, or drop the tail).
    *
    * Zero-token documents are excluded (they occupy no window).
    * Output: (shard, id, n_tok, off, first_seq, offset_in_seq, n_seqs)
    * with `off` the doc's absolute token offset in its shard's stream.
    */
  def packSequences(docs: DataFrame, idCol: String, tokCol: String,
      ctxLen: Int, shardCol: String): DataFrame = {
    require(ctxLen > 0, s"ctxLen must be positive: $ctxLen")
    val w = Window.partitionBy(col("shard")).orderBy(col("id"))
      .rowsBetween(Window.unboundedPreceding, -1)
    docs.select(col(shardCol).as("shard"), col(idCol).as("id"),
        col(tokCol).cast("long").as("n_tok"))
      .filter(col("n_tok") > 0)
      .withColumn("off", coalesce(sum(col("n_tok")).over(w), lit(0L)))
      // floor(x / c) written explicitly: Column./ is DOUBLE division in
      // both Spark and DuckDB, so floor() is the engine-portable integer
      // quotient (exact for offsets < 2^53)
      .withColumn("first_seq", floor(col("off") / ctxLen))
      .withColumn("offset_in_seq", col("off") % ctxLen)
      .withColumn("n_seqs",
        floor((col("off") + col("n_tok") - 1) / ctxLen) -
          col("first_seq") + 1L)
  }

  /** Split LONG documents into fixed-length context windows with
    * stride (the within-doc dual of [[packSequences]]' across-doc
    * concat): window k covers tokens [k·stride, min(k·stride + maxLen,
    * n)); with stride ≤ maxLen every token is covered and consecutive
    * windows overlap by maxLen − stride — the `return_overflowing_
    * tokens` truncation idiom of HF tokenizers. Entirely NARROW: one
    * `sequence()` explode per doc, no shuffle at any scale.
    *
    * Output: (id, chunk_idx, tok_start, tok_end, n_chunk_tok);
    * zero-token docs are excluded; a doc with n ≤ maxLen yields one
    * window [0, n). */
  def chunkDocs(docs: DataFrame, idCol: String, tokCol: String,
      maxLen: Int, stride: Int): DataFrame = {
    require(maxLen > 0 && stride > 0 && stride <= maxLen,
      s"need 0 < stride <= maxLen: $stride, $maxLen")
    docs.select(col(idCol).as("id"),
        col(tokCol).cast("long").as("n_tok"))
      .filter(col("n_tok") > 0)
      // last window index: ceil(max(n - maxLen, 0) / stride) — double
      // division + floor/ceil is the engine-portable integer quotient
      // (exact below 2^53)
      .withColumn("__nk", ceil(
        greatest(col("n_tok") - maxLen, lit(0L)).cast("double") / stride)
        .cast("long"))
      .select(col("id"), col("n_tok"),
        explode(sequence(lit(0L), col("__nk"))).as("chunk_idx"))
      .select(col("id"), col("chunk_idx"),
        (col("chunk_idx") * stride).as("tok_start"),
        least(col("chunk_idx") * stride + maxLen, col("n_tok"))
          .as("tok_end"))
      .withColumn("n_chunk_tok", col("tok_end") - col("tok_start"))
  }

  /** Windows-per-shard summary (the training-step count a scheduler
    * needs): total tokens and ⌈tokens/ctxLen⌉ full-or-partial windows
    * per shard. One aggregation over the packing output. */
  def shardWindows(packed: DataFrame, ctxLen: Int): DataFrame =
    packed.groupBy("shard")
      .agg(sum(col("n_tok")).as("total_tokens"))
      .withColumn("n_windows",
        floor((col("total_tokens") + ctxLen - 1) / ctxLen))

  /** Length-bucketed batching plan (the dynamic-batching alternative to
    * concat-and-chunk, standard for finetuning/eval loaders): each
    * sequence goes to the smallest power-of-two bucket ≥ its token
    * count (floor `minBucket`), batches form within a bucket, and
    * every sequence pads only to its BUCKET length — the padding-waste
    * accounting this produces is exactly what max-length padding
    * destroys (pad-to-global-max wastes `1 − mean/max`, typically
    * >50%; pow2 bucketing bounds per-row waste below 50% and in
    * practice single digits).
    *
    * The pow2 ceiling is `1 << bitlen(n−1)` — computed via the binary
    * bit-length (`bin()` string length), the q158 discipline, so an
    * external engine replays the bucket boundaries exactly. One
    * aggregation, map-side combinable; nothing wider than a bucket row
    * survives the exchange.
    *
    * Returns one row per bucket: (bucket, n_docs, n_tokens, n_batches
    * = ⌈n_docs/batchSize⌉, waste_frac = 1 − n_tokens/(n_docs·bucket),
    * round-6). */
  def lengthBucketStats(docs: DataFrame, tokCol: String,
      batchSize: Int, minBucket: Int = 16): DataFrame = {
    require(batchSize >= 1, s"batchSize must be >= 1: $batchSize")
    require(minBucket >= 1 && (minBucket & (minBucket - 1)) == 0,
      s"minBucket must be a power of two: $minBucket")
    docs.select(col(tokCol).cast("long").as("__n"))
      .filter(col("__n") > 0)
      .select(when(col("__n") <= minBucket, lit(minBucket.toLong))
        .otherwise(expr(
          "shiftleft(CAST(1 AS BIGINT), CAST(length(bin(__n - 1)) AS INT))"))
        .as("bucket"), col("__n"))
      .groupBy("bucket")
      .agg(count(lit(1)).as("n_docs"), sum("__n").as("n_tokens"))
      .select(col("bucket"), col("n_docs"), col("n_tokens"),
        expr(s"(n_docs + ${batchSize - 1}) DIV $batchSize")
          .as("n_batches"),
        round(lit(1.0) - col("n_tokens").cast("double") /
          (col("n_docs") * col("bucket")).cast("double"), 6)
          .as("waste_frac"))
  }
}
