package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Unigram-LM subword tokenizer (Kudo, "Subword Regularization",
  * arXiv:1804.10959 — the SentencePiece unigram model), the second
  * tokenizer family next to [[Bpe]], run IN-ENGINE.
  *
  * Structure mirrors the BPE fit's cluster shape:
  *
  *   - **Distinct-word compression** (shared with [[Bpe]]): every stage
  *     works over the (word, freq) table, vocabulary-sized by Zipf —
  *     the 100 TB corpus collapses to one narrow groupBy first.
  *   - **Seed vocabulary** as a relational substring count: all
  *     codepoint substrings of length ≤ maxPieceLen, weighted by word
  *     frequency; all single codepoints are kept unconditionally (the
  *     coverage guarantee — SentencePiece's required-chars rule), plus
  *     the topM multi-codepoint pieces (count desc, piece asc). The
  *     reference SentencePiece seeds from an enhanced suffix array;
  *     the bounded-length substring count is the relational
  *     equivalent and the length cap is what keeps the explode
  *     distinct-word-bounded, never corpus-bounded.
  *   - **Viterbi segmentation** as a native expression
  *     ([[graft.expressions.UnigramViterbiExpr]]) with the model-sized
  *     piece table embedded — a pure narrow projection, zero
  *     exchanges, at any corpus scale.
  *   - **Hard-EM** (Viterbi counts) instead of full Baum-Welch
  *     E-steps: the standard EM approximation whose M-step counts are
  *     INTEGERS, which is what makes the whole fit SQL-replayable
  *     (q137/q138) — a soft E-step's log-sum-exp accumulation order
  *     could never be. Probabilities are exact binary64 rationals
  *     cnt/total (one correctly-rounded IEEE divide), so downstream
  *     Viterbi scores replay bit-for-bit too.
  *
  * Coverage across rounds: a piece survives a hard-EM step iff some
  * word's best segmentation uses it, and that segmentation's pieces
  * all survive by construction — so the corpus the fit runs on stays
  * segmentable round over round (unused seed pieces pruning away is
  * SentencePiece's behavior as well).
  */
object Unigram {

  /** Distinct lowercased whitespace words with corpus frequencies —
    * the same distinct-word compression [[Bpe.initialSymbols]] uses. */
  def words(docs: DataFrame, textCol: String): DataFrame =
    docs.select(explode(TextOps.tokens(lower(col(textCol)))).as("w"))
      .filter(col("w") =!= "")
      .groupBy("w").agg(count(lit(1)).as("freq"))

  /** Seed piece vocabulary over a (w, freq) word table: (piece, cnt).
    * The nested-transform explode is interpreted per element but runs
    * over the DISTINCT-WORD table only (the SCALE.md HOF rule's
    * sanctioned case). */
  def seedVocab(wordTable: DataFrame, maxPieceLen: Int = 4,
      topM: Int = 200): DataFrame = {
    val subs = wordTable.select(col("freq"),
        explode(expr(
          "flatten(transform(sequence(1, length(w)), i -> " +
            s"transform(sequence(i, least(i + ${maxPieceLen - 1}, " +
            "length(w))), j -> substring(w, i, j - i + 1))))"))
          .as("piece"))
      .groupBy("piece").agg(sum("freq").as("cnt"))
    val singles = subs.filter(length(col("piece")) === 1)
    // bounded top-M: plans as TakeOrderedAndProject, no global sort
    val multiTop = subs.filter(length(col("piece")) > 1)
      .orderBy(desc("cnt"), asc("piece")).limit(topM)
    singles.unionByName(multiTop)
  }

  /** Attach exact-rational probabilities p = cnt / Σcnt (single IEEE
    * divide of exact integers — engine-portable by construction). The
    * total rides in as a broadcast 1-row aggregate, no driver collect. */
  def withProbs(vocab: DataFrame): DataFrame =
    vocab.crossJoin(broadcast(vocab.agg(sum(col("cnt")).as("__t"))))
      .select(col("piece"), col("cnt"),
        (col("cnt").cast("double") / col("__t").cast("double")).as("p"))

  /** Viterbi-segment each distinct word: (w, freq, score, pieces).
    * The (piece, p) table is collected — model-sized by construction —
    * and embedded in the native expression; unsegmentable words (none
    * with a seeded vocab over the same corpus) drop. */
  def segmentWords(wordTable: DataFrame, vocab: DataFrame): DataFrame = {
    val rows = vocab.select(col("piece"), col("p").cast("double"))
      .collect().sortBy(_.getString(0))
    val pieces = rows.map(_.getString(0))
    val probs = rows.map(_.getDouble(1))
    wordTable.select(col("w"), col("freq"),
        graft.expressions.TextExpressions.unigramViterbi(col("w"),
          pieces, probs).as("__v"))
      .filter(col("__v").isNotNull)
      .select(col("w"), col("freq"),
        col("__v.score").as("score"), col("__v.pieces").as("pieces"))
  }

  /** One hard-EM step: re-count pieces over every word's best
    * segmentation, weighted by word frequency. Integer counts; unused
    * pieces prune away. */
  def hardEmStep(wordTable: DataFrame, vocab: DataFrame): DataFrame =
    segmentWords(wordTable, vocab)
      .select(col("freq"), explode(col("pieces")).as("piece"))
      .groupBy("piece").agg(sum("freq").as("cnt"))

  /** Full fit: seed → iters × (hard-EM recount → renormalize).
    * Returns (piece, cnt, p). Each round's vocab is model-sized, so
    * the loop's only cluster work is one narrow segmentation pass +
    * one piece-keyed agg per iteration. */
  def fit(docs: DataFrame, textCol: String, maxPieceLen: Int = 4,
      topM: Int = 200, iters: Int = 2): DataFrame = {
    val wt = words(docs, textCol).localCheckpoint(true)
    var vocab = withProbs(seedVocab(wt, maxPieceLen, topM))
    var it = 0
    while (it < iters) {
      vocab = withProbs(hardEmStep(wt, vocab))
      it += 1
    }
    vocab
  }

  /** Vocab persistence as DATA (piece, cnt, p) — the params-as-data
    * discipline ([[Bpe.saveMerges]], `Sketch.saveGrid`): no pickles,
    * splittable parquet, reload feeds [[segmentWords]]/[[tokenize]]
    * unchanged. */
  def saveVocab(vocab: DataFrame, path: String): Unit =
    vocab.write.mode("overwrite").parquet(path)

  def loadVocab(spark: org.apache.spark.sql.SparkSession, path: String)
      : DataFrame = spark.read.parquet(path)

  /** Tokenize a corpus with a fitted vocab: distinct words segment
    * once (narrow), then join back to the positional token stream and
    * reassemble per-doc piece arrays in word order. One word-keyed
    * join + one doc-keyed agg. */
  def tokenize(docs: DataFrame, idCol: String, textCol: String,
      vocab: DataFrame): DataFrame = {
    val toks = docs.select(col(idCol),
        posexplode(TextOps.tokens(lower(col(textCol))))
          .as(Seq("pos", "w")))
      .filter(col("w") =!= "")
    val seg = segmentWords(
      toks.groupBy("w").agg(count(lit(1)).as("freq")), vocab)
      .select(col("w"), col("pieces"))
    toks.join(seg, Seq("w"))
      .groupBy(col(idCol))
      .agg(flatten(transform(
        array_sort(collect_list(struct(col("pos").as("i"),
          col("pieces").as("ps")))),
        x => x.getField("ps"))).as("tokens"))
  }
}
