package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.FunctionRegistry.FunctionBuilder
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}

/** SparkSessionExtensions entry point: registers the engine's native
  * Catalyst expressions as SQL functions, so `spark.sql` users (and BI
  * tools speaking SQL to a Thrift/Connect endpoint) reach the same
  * codegen-friendly kernels as the Scala API — no UDF registration, no
  * interpreted fallback.
  *
  * Activate with
  * `.config("spark.sql.extensions", "graft.GraftExtensions")` or
  * `withExtensions(new GraftExtensions)`; idempotent per session.
  *
  * Registered functions:
  *   graft_cosine(a, b)             cosine similarity (doGenCode)
  *   graft_jaccard_sorted(a, b)     merge-walk Jaccard of sorted long arrays
  *   graft_char_shingle_hashes(s,n) sorted distinct n-gram hashes
  *   graft_minhash_sig(hashes, k)   k-permutation MinHash signature
  *   graft_simhash(s)               64-bit SimHash of whitespace tokens
  *   graft_winnow_fp(s, k, w)       winnowing fingerprints (rolling hash)
  *   graft_interp_ecdf(v, qs)       interpolated ECDF (quantile transform)
  *   graft_cdc_boundaries(s, k, d)  content-defined chunk cut positions
  *   graft_str_poly_hash(s, b, cap) replayable whole-string poly hash
  *   graft_cms_sketch(s, width)     Count-Min grid AGGREGATE (4×width)
  *   graft_weighted_vec_sum(w, v)   weighted vector-sum AGGREGATE
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  private def litInt(e: Expression, fn: String, arg: String): Int = e match {
    case Literal(v: Int, _) => v
    case other => throw new IllegalArgumentException(
      s"$fn: $arg must be an integer literal, got $other")
  }

  private def arity(fn: String, args: Seq[Expression], n: Int): Unit =
    if (args.length != n) throw new IllegalArgumentException(
      s"$fn expects $n arguments, got ${args.length}")

  // ExpressionInfo(className, db, name, usage, arguments, examples, note,
  //   group, since, deprecated, source) — db is the SECOND slot
  private[graft] def info(name: String, usage: String) =
    new ExpressionInfo(classOf[GraftExtensions].getName, null, name, usage,
      "", "", "", "", "", "", "built-in")

  private[graft] def fns: Seq[(String, String, FunctionBuilder)] = Seq(
    ("graft_nfc_normalize", "Unicode NFC canonical composition (UAX #15)",
      (args: Seq[Expression]) => {
        arity("graft_nfc_normalize", args, 1)
        expressions.NfcNormalizeExpr(args(0))
      }),
    ("graft_cosine", "cosine similarity of two numeric arrays",
      (args: Seq[Expression]) => {
        arity("graft_cosine", args, 2)
        expressions.CosineSimilarity(args(0), args(1))
      }),
    ("graft_jaccard_sorted",
      "Jaccard similarity of two SORTED DISTINCT array<long>",
      (args: Seq[Expression]) => {
        arity("graft_jaccard_sorted", args, 2)
        expressions.SortedLongJaccard(args(0), args(1))
      }),
    ("graft_char_shingle_hashes",
      "sorted distinct xxhash64 char n-gram shingle hashes",
      (args: Seq[Expression]) => {
        arity("graft_char_shingle_hashes", args, 2)
        expressions.CharShingleHashExpr(args(0),
          litInt(args(1), "graft_char_shingle_hashes", "n"))
      }),
    ("graft_minhash_sig", "k-permutation MinHash signature of array<long>",
      (args: Seq[Expression]) => {
        arity("graft_minhash_sig", args, 2)
        expressions.MinHashSigExpr(args(0),
          litInt(args(1), "graft_minhash_sig", "k"))
      }),
    ("graft_simhash", "64-bit SimHash of whitespace tokens",
      (args: Seq[Expression]) => {
        arity("graft_simhash", args, 1)
        expressions.SimHashSigExpr(expressions.WsTokenHashExpr(args(0)))
      }),
    ("graft_winnow_fp",
      "winnowing fingerprints: k-gram rolling hash, window-w minima",
      (args: Seq[Expression]) => {
        arity("graft_winnow_fp", args, 3)
        expressions.WinnowFingerprintExpr(args(0),
          litInt(args(1), "graft_winnow_fp", "k"),
          litInt(args(2), "graft_winnow_fp", "w"))
      }),
    ("graft_interp_ecdf",
      "interpolated ECDF of v against sorted quantiles array",
      (args: Seq[Expression]) => {
        arity("graft_interp_ecdf", args, 2)
        expressions.InterpolateEcdf(args(0), args(1))
      }),
    ("graft_cdc_boundaries",
      "content-defined chunk cut positions: k-gram rolling hash " +
        "≡ 0 (mod divisor)",
      (args: Seq[Expression]) => {
        arity("graft_cdc_boundaries", args, 3)
        expressions.CdcBoundaryExpr(args(0),
          litInt(args(1), "graft_cdc_boundaries", "k"),
          litInt(args(2), "graft_cdc_boundaries", "divisor"))
      }),
    ("graft_str_poly_hash",
      "replayable whole-string base-b polynomial hash of the first " +
        "cap bytes, mod 1e9+7",
      (args: Seq[Expression]) => {
        arity("graft_str_poly_hash", args, 3)
        expressions.StrPolyHashExpr(args(0),
          litInt(args(1), "graft_str_poly_hash", "base").toLong,
          litInt(args(2), "graft_str_poly_hash", "cap"))
      }),
    ("graft_cms_sketch",
      "Count-Min sketch aggregate: flat 4×width token-frequency grid " +
        "(replayable poly-hash rows)",
      (args: Seq[Expression]) => {
        arity("graft_cms_sketch", args, 2)
        expressions.CmsSketchAgg(args(0),
          graft.ops.Sketch.defaultBases,
          litInt(args(1), "graft_cms_sketch", "width"))
          .toAggregateExpression()
      }),
    ("graft_weighted_vec_sum",
      "per-group weighted element-wise vector sum Σ w·vec",
      (args: Seq[Expression]) => {
        arity("graft_weighted_vec_sum", args, 2)
        expressions.WeightedVecSumAgg(args(0), args(1))
          .toAggregateExpression()
      }))

  override def apply(ext: SparkSessionExtensions): Unit =
    fns.foreach { case (name, usage, builder) =>
      ext.injectFunction(
        (FunctionIdentifier(name), info(name, usage), builder))
    }
}

object GraftExtensions {

  /** Register the same function set into an ALREADY-BUILT session (the
    * `spark.sql.extensions` conf only applies at build time; a session
    * handed in by a host — notebook kernels, the driver contract —
    * can't be rebuilt). Same builders, same names, idempotent:
    * re-registration replaces the identical entry. */
  def register(spark: org.apache.spark.sql.SparkSession): Unit = {
    val inst = new GraftExtensions
    val reg = spark.sessionState.functionRegistry
    inst.fns.foreach { case (name, usage, builder) =>
      reg.registerFunction(FunctionIdentifier(name),
        inst.info(name, usage), builder)
    }
  }
}
