package graft.ops

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Byte-pair-encoding vocabulary learning (Sennrich et al., "Neural
  * Machine Translation of Rare Words with Subword Units", ACL 2016) —
  * the tokenizer-fit stage of a training-data pipeline, run IN-ENGINE.
  *
  * The classic fit loop: words become character-symbol sequences; each
  * round counts adjacent symbol pairs (weighted by word frequency),
  * merges the most frequent pair corpus-wide, and repeats. Two
  * standard structural moves make this cluster-shaped:
  *
  *   - **Distinct-word compression**: pair statistics only depend on
  *     the (word, freq) table, whose size follows the vocabulary (Zipf)
  *     rather than the corpus — the 100 TB corpus collapses to one
  *     narrow groupBy before any per-character work happens.
  *   - **Relational greedy merge**: BPE's leftmost-first merge of
  *     overlapping occurrences (\"a a a\" + merge(a,a) → \"aa a\", not
  *     \"a aa\") is a gaps-and-islands computation, NOT a regex pass:
  *     consecutive matching positions form islands (only possible when
  *     the pair is a self-pair), and within an island the 1st, 3rd, …
  *     positions merge. That keeps every step a window/join — no UDF,
  *     no lookaround regex (so an RE2-based oracle can replay it).
  *
  * The per-round argmax is a 1-row collect — the fit is inherently
  * sequential in the merge rank (same driver-scalar discipline as IVF's
  * Lloyd iterations); each round localCheckpoints the symbol table to
  * cut the iterative lineage.
  *
  * Reference surface: the engine's reference has no tokenizer-fit
  * operator; this extends the north-star text stack (TESTDATA
  * documents table) the way `bpeishTokenCount` gestures at.
  */
object Bpe {

  /** One greedy merge of pair (a,b) over a symbol table
    * (w, freq, i, sym) with 0-based dense positions per word. Returns
    * the same shape with positions re-densified. */
  def mergeStep(syms: DataFrame, a: String, b: String): DataFrame = {
    val byWord = Window.partitionBy("w").orderBy("i")
    val withNext = syms.withColumn("__nxt", lead(col("sym"), 1).over(byWord))
    val hits = withNext
      .filter(col("sym") === a && col("__nxt") === b)
      .select(col("w"), col("i"))
    // islands of CONSECUTIVE hit positions (only self-pairs produce
    // them); greedy-leftmost keeps the odd-ranked members of each island
    val grouped = hits.withColumn("__g",
      col("i") - row_number().over(Window.partitionBy("w").orderBy("i")))
    val starts = grouped
      .withColumn("__r",
        row_number().over(Window.partitionBy("w", "__g").orderBy("i")))
      .filter(col("__r") % 2 === 1)
      .select(col("w").as("__mw"), col("i").as("__mi"))
    val consumed = starts.select(col("__mw").as("__cw"),
      (col("__mi") + 1).as("__ci"))
    withNext
      .join(starts, col("w") === col("__mw") && col("i") === col("__mi"),
        "left")
      .join(consumed, col("w") === col("__cw") && col("i") === col("__ci"),
        "left")
      .filter(col("__cw").isNull) // drop the consumed right halves
      .select(col("w"), col("freq"), col("i"),
        when(col("__mw").isNotNull, concat(col("sym"), col("__nxt")))
          .otherwise(col("sym")).as("sym"))
      .withColumn("i",
        row_number().over(Window.partitionBy("w").orderBy("i")) - 1)
  }

  /** Adjacent-pair frequencies of a symbol table: (s1, s2, c) where c
    * sums word frequencies. */
  def pairCounts(syms: DataFrame): DataFrame = {
    val byWord = Window.partitionBy("w").orderBy("i")
    syms.withColumn("__nxt", lead(col("sym"), 1).over(byWord))
      .filter(col("__nxt").isNotNull)
      .groupBy(col("sym").as("s1"), col("__nxt").as("s2"))
      .agg(sum("freq").as("c"))
  }

  /** Initial symbol table from a corpus: distinct lowercased whitespace
    * words with frequencies, exploded to one row per character.
    * Char-split via `split(w, "(?!^)(?=[\\s\\S])")` — a zero-width
    * boundary at every INTERIOR position: `(?!^)` rejects the start,
    * `(?=[\s\S])` rejects the end (Spark's split keeps trailing empty
    * strings for any limit ≤ 0, so the end position must not match).
    * The regex engine only matches at code-point boundaries, so this
    * equals the per-codepoint substring walk, including astral chars.
    * Replaces `transform(sequence(...), i -> substring(w, i, 1))`: the
    * HOF form is CodegenFallback — interpreted per element, the
    * SCALE.md hot-loop smell — where split is a single codegen'd call
    * per word. (q100's rep-1 compile cost measured unchanged either
    * way — it lives in the window/agg stage codegen, not here.) */
  def initialSymbols(docs: DataFrame, textCol: String): DataFrame =
    docs.select(explode(TextOps.tokens(lower(col(textCol)))).as("w"))
      .filter(col("w") =!= "")
      .groupBy("w").agg(count(lit(1)).as("freq"))
      .select(col("w"), col("freq"),
        posexplode(split(col("w"), "(?!^)(?=[\\s\\S])"))
          .as(Seq("i", "sym")))

  /** Learn `nMerges` BPE merges. Returns (rank, lhs, rhs, pair_count) —
    * rank is 1-based merge order; ties break on (count desc, lhs, rhs).
    * Stops early if no pair remains. */
  def fit(docs: DataFrame, textCol: String, nMerges: Int): DataFrame = {
    val spark = docs.sparkSession
    var syms = initialSymbols(docs, textCol).localCheckpoint(true)
    val merges = scala.collection.mutable.ArrayBuffer[Row]()
    var exhausted = false
    var rank = 1
    while (rank <= nMerges && !exhausted) {
      val top = pairCounts(syms)
        .orderBy(desc("c"), asc("s1"), asc("s2")).limit(1).collect()
      if (top.isEmpty) exhausted = true
      else {
        val (a, b, c) = (top(0).getString(0), top(0).getString(1),
          top(0).getLong(2))
        merges += Row(rank, a, b, c)
        syms = mergeStep(syms, a, b).localCheckpoint(true)
        rank += 1
      }
    }
    val schema = StructType(Seq(
      StructField("rank", IntegerType, nullable = false),
      StructField("lhs", StringType, nullable = false),
      StructField("rhs", StringType, nullable = false),
      StructField("pair_count", LongType, nullable = false)))
    import scala.jdk.CollectionConverters._
    spark.createDataFrame(merges.toList.asJava, schema)
  }

  /** Apply an already-learned merge table (rank, lhs, rhs, …) to a
    * corpus: replay the merges in rank order over the distinct-word
    * symbol table. This is the tokenizer-APPLY half — fit once, save
    * the merges as data, encode any corpus later; words whose pieces
    * never merged stay as character symbols (the OOV fallback).
    * Encoding full text is then a broadcast join of its words against
    * the returned (w → ordered syms) table — the distinct-word trick
    * again. */
  def applyMerges(docs: DataFrame, textCol: String, merges: DataFrame)
      : DataFrame = {
    // The merge table is model-sized params-as-data — collect it once
    // and run the whole rank-ordered greedy walk as ONE narrow
    // expression over the distinct-word table
    // (graft.expressions.BpeApplyExpr — exact [[mergeStep]] semantics,
    // spec-pinned), where the former per-rank relational loop cost ~3
    // exchanges + a blocking localCheckpoint PER MERGE (nMerges + 1
    // sequential jobs; measured 2.7–3.9 s per contract query at sf0.1
    // for an 8-merge table).
    val ms = merges.select("rank", "lhs", "rhs").orderBy("rank")
      .collect()
    val lhs = ms.map(_.getString(1)).toIndexedSeq
    val rhs = ms.map(_.getString(2)).toIndexedSeq
    docs
      .select(explode(TextOps.tokens(lower(col(textCol)))).as("w"))
      .filter(col("w") =!= "")
      .groupBy("w").agg(count(lit(1)).as("freq"))
      .select(col("w"), col("freq"),
        posexplode(graft.expressions.TextExpressions.bpeApply(col("w"),
          lhs, rhs)).as(Seq("i", "sym")))
  }

  /** Persist learned merges AS DATA (plain parquet — the fit-state
    * discipline of the whole engine; no serialized tokenizer
    * objects). */
  def saveMerges(merges: DataFrame, path: String): Unit =
    merges.write.mode("overwrite").parquet(path)

  def loadMerges(spark: org.apache.spark.sql.SparkSession, path: String)
      : DataFrame = spark.read.parquet(path)

  /** Final word segmentation after [[fit]]'s merges: (w, freq, i, sym). */
  def segment(docs: DataFrame, textCol: String, nMerges: Int): DataFrame =
    applyMerges(docs, textCol, fit(docs, textCol, nMerges))
}
