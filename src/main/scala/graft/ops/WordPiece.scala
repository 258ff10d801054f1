package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** WordPiece subword tokenizer (Wu et al., arXiv:1609.08144 — the BERT
  * tokenizer), the THIRD tokenizer family next to [[Bpe]] (merge-rule
  * greedy) and [[Unigram]] (Viterbi LM): a positional piece vocabulary
  * — word-START pieces vs `##` CONTINUATION pieces — applied by greedy
  * longest-match-first.
  *
  * Cluster shape mirrors the other two fits:
  *
  *   - **Distinct-word compression** ([[Unigram.words]]): everything
  *     runs over the (word, freq) table, vocabulary-sized by Zipf.
  *   - **Vocabulary** as ONE relational substring count keyed by
  *     (piece, is_continuation): a substring starting at codepoint 1
  *     is a word-start form, anywhere later a continuation form —
  *     exactly the positional split BERT's vocab encodes with the `##`
  *     prefix. All single-codepoint forms are kept unconditionally
  *     (the coverage rule: a corpus word can then always fall back to
  *     characters, so `[UNK]` is reserved for OUT-of-corpus input),
  *     plus the top-M multi-codepoint forms (count DESC, piece ASC,
  *     cont ASC — a total order, so the cut is deterministic).
  *   - **Segmentation** as the native
  *     [[graft.expressions.WordPieceExpr]] with both model-sized
  *     vocabularies embedded — a pure narrow projection, zero
  *     exchanges at any corpus scale. No floats anywhere in the walk,
  *     so the greedy segmentation replays in portable SQL verbatim
  *     (q141) — the same twin discipline as q137's Viterbi DP.
  */
object WordPiece {

  /** Positional piece vocabulary over a (w, freq) word table:
    * (piece, cont, cnt). The nested-transform explode runs over the
    * DISTINCT-WORD table only (SCALE.md's sanctioned HOF case). */
  def vocab(wordTable: DataFrame, maxPieceLen: Int = 4,
      topM: Int = 120): DataFrame = {
    require(maxPieceLen >= 1, s"maxPieceLen must be >= 1: $maxPieceLen")
    val subs = wordTable.select(col("freq"),
        explode(expr(
          "flatten(transform(sequence(1, length(w)), i -> " +
            s"transform(sequence(i, least(i + ${maxPieceLen - 1}, " +
            "length(w))), j -> " +
            "struct(substring(w, i, j - i + 1) AS piece, " +
            "i > 1 AS cont))))")).as("pc"))
      .select(col("pc.piece").as("piece"), col("pc.cont").as("cont"),
        col("freq"))
      .groupBy("piece", "cont").agg(sum("freq").as("cnt"))
    val singles = subs.filter(length(col("piece")) === 1)
    // bounded top-M: plans as TakeOrderedAndProject, no global sort
    val multiTop = subs.filter(length(col("piece")) > 1)
      .orderBy(desc("cnt"), asc("piece"), asc("cont")).limit(topM)
    singles.unionByName(multiTop)
  }

  /** Greedy-segment each distinct word: (w, freq, pieces). The
    * (piece, cont) vocabulary is collected — model-sized by
    * construction — and embedded in the native expression. */
  def segmentWords(wordTable: DataFrame, vocabTable: DataFrame)
      : DataFrame = {
    val rows = vocabTable.select(col("piece"), col("cont"))
      .collect().sortBy(r => (r.getBoolean(1), r.getString(0)))
    val start = rows.filter(!_.getBoolean(1)).map(_.getString(0))
    val cont = rows.filter(_.getBoolean(1)).map(_.getString(0))
    wordTable.select(col("w"), col("freq"),
        graft.expressions.TextExpressions.wordPiece(col("w"), start,
          cont).as("pieces"))
      .filter(col("pieces").isNotNull)
  }

  /** Fit + segment the corpus's own distinct words in one call:
    * (w, freq, pieces). */
  def fitSegment(docs: DataFrame, textCol: String, maxPieceLen: Int = 4,
      topM: Int = 120): DataFrame = {
    val wt = Unigram.words(docs, textCol).localCheckpoint(true)
    segmentWords(wt, vocab(wt, maxPieceLen, topM))
  }

  /** Vocabulary persistence as DATA (piece, cont, cnt) — the
    * params-as-data discipline: a reload is a parquet read, never a
    * pickle. */
  def saveVocab(vocabTable: DataFrame, path: String): Unit =
    vocabTable.select("piece", "cont", "cnt")
      .coalesce(1).write.mode("overwrite").parquet(path)

  def loadVocab(spark: org.apache.spark.sql.SparkSession,
      path: String): DataFrame = spark.read.parquet(path)
}
