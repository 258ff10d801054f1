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
  private def info(name: String, usage: String) =
    new ExpressionInfo(classOf[GraftExtensions].getName, null, name, usage,
      "", "", "", "", "", "", "built-in")

  private def fns: Seq[(String, String, FunctionBuilder)] = Seq(
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
      }))

  override def apply(ext: SparkSessionExtensions): Unit =
    fns.foreach { case (name, usage, builder) =>
      ext.injectFunction(
        (FunctionIdentifier(name), info(name, usage), builder))
    }
}
