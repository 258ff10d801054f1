package graft.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Shared byte-stream helpers for the hashing expressions below — one
  * tokenizer and one sort/dedup epilogue so the copies can't drift. All
  * allocation-free per element (primitive long arrays, grown
  * geometrically). */
private[expressions] object ByteTextUtil {

  /** Java-regex-\s whitespace set (the `split(text, "\\s+")` twin). */
  def isWs(b: Byte): Boolean =
    b == ' ' || b == '\t' || b == '\n' || b == '\r' ||
      b == '\f' || b == 0x0B

  /** xxhash64 (seed 42 — bit-identical to `xxhash64(token_string)`) of
    * each whitespace-separated token's bytes; empty tokens cannot occur
    * (separator runs are skipped). Returns a packed primitive array. */
  def tokenHashes(bytes: Array[Byte]): Array[Long] = {
    var buf = new Array[Long](16)
    var cnt = 0
    var i = 0
    val len = bytes.length
    while (i < len) {
      while (i < len && isWs(bytes(i))) i += 1
      val start = i
      while (i < len && !isWs(bytes(i))) i += 1
      if (i > start) {
        if (cnt == buf.length)
          buf = java.util.Arrays.copyOf(buf, buf.length * 2)
        buf(cnt) = org.apache.spark.sql.catalyst.expressions.XXH64
          .hashUnsafeBytes(bytes,
            org.apache.spark.unsafe.Platform.BYTE_ARRAY_OFFSET + start,
            i - start, 42L)
        cnt += 1
      }
    }
    if (cnt == buf.length) buf else java.util.Arrays.copyOf(buf, cnt)
  }

  /** SQL-replayable token hash: base-257 polynomial mod 1e9+7 over the
    * FIRST 8 bytes of each whitespace token (duplicates kept). The 8-byte
    * cap keeps an external engine's replay to a fixed coefficient vector
    * (powers of 257 mod M) instead of per-step modular reduction; callers
    * feed ASCII-projected text so byte == codepoint. */
  def tokenPolyHashes(bytes: Array[Byte], base: Long = 257L)
      : Array[Long] = {
    val M = 1000000007L
    var buf = new Array[Long](16)
    var cnt = 0
    var i = 0
    val len = bytes.length
    while (i < len) {
      while (i < len && isWs(bytes(i))) i += 1
      val start = i
      while (i < len && !isWs(bytes(i))) i += 1
      if (i > start) {
        if (cnt == buf.length)
          buf = java.util.Arrays.copyOf(buf, buf.length * 2)
        var h = 0L
        var j = start
        val end = math.min(i, start + 8)
        while (j < end) { h = (h * base + (bytes(j) & 0xffL)) % M; j += 1 }
        buf(cnt) = h
        cnt += 1
      }
    }
    if (cnt == buf.length) buf else java.util.Arrays.copyOf(buf, cnt)
  }

  /** SQL-replayable whole-string hash: base-`base` polynomial mod 1e9+7
    * over the FIRST `cap` bytes (no tokenization — the input IS the
    * unit, e.g. a word n-gram string). Same coefficient-replay argument
    * as [[tokenPolyHashes]]; cap ≤ 16 keeps the unreduced replay sum
    * < 2^63. */
  def strPolyHash(bytes: Array[Byte], base: Long, cap: Int): Long = {
    val M = 1000000007L
    var h = 0L
    var i = 0
    val end = math.min(bytes.length, cap)
    while (i < end) { h = (h * base + (bytes(i) & 0xffL)) % M; i += 1 }
    h
  }

  /** Sort the first `m` entries ascending and dedup in place; returns the
    * distinct prefix (the input array when nothing was dropped). */
  def sortedDistinct(hs: Array[Long], m: Int): Array[Long] = {
    if (m == 0) return Array.empty[Long]
    java.util.Arrays.sort(hs, 0, m)
    var w = 0
    var r = 1
    while (r < m) {
      if (hs(r) != hs(w)) { w += 1; hs(w) = hs(r) }
      r += 1
    }
    if (w + 1 == hs.length) hs else java.util.Arrays.copyOf(hs, w + 1)
  }
}

/** Native character-n-gram shingle expression.
  *
  * The composable form — `transform(sequence(1, length-n+1), i =>
  * substr(s, i, n))` + `array_distinct` — pays Spark's interpreted
  * higher-order-function cost per CHARACTER (~10µs/element measured on the
  * driver corpus: 13s for 5000 small docs), and `substr` on UTF8 strings is
  * an O(len) scan per call, making the composed operator O(len²).
  *
  * This expression walks the UTF-8 byte stream once, records codepoint
  * boundaries, and emits each distinct shingle as a byte-range copy —
  * O(len·n) with a single JVM call per row (CodegenFallback; the per-row
  * work utterly dominates the one virtual call, unlike the per-element
  * interpreted lambda it replaces).
  */
case class CharShingleExpr(child: Expression, n: Int)
    extends UnaryExpression with CodegenFallback with Serializable {

  require(n >= 1, s"shingle size must be >= 1: $n")

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullable: Boolean = true

  override protected def nullSafeEval(input: Any): Any = {
    val s = input.asInstanceOf[UTF8String]
    val bytes = s.getBytes
    // Codepoint start offsets (UTF-8: continuation bytes are 10xxxxxx).
    val offsets = new Array[Int](bytes.length + 1)
    var nChars = 0
    var i = 0
    while (i < bytes.length) {
      if ((bytes(i) & 0xC0) != 0x80) { offsets(nChars) = i; nChars += 1 }
      i += 1
    }
    offsets(nChars) = bytes.length
    if (nChars < n) return new GenericArrayData(Array.empty[Any])
    val seen = new java.util.LinkedHashSet[UTF8String]()
    var c = 0
    while (c + n <= nChars) {
      val from = offsets(c)
      val until = offsets(c + n)
      seen.add(UTF8String.fromBytes(bytes, from, until - from))
      c += 1
    }
    val out = new Array[Any](seen.size)
    val it = seen.iterator()
    var j = 0
    while (it.hasNext) { out(j) = it.next(); j += 1 }
    new GenericArrayData(out)
  }

  override protected def withNewChildInternal(newChild: Expression)
      : CharShingleExpr = copy(child = newChild)
}

/** Count of elements of a string-array column contained in a static set
  * (duplicates counted), optionally lowercasing each element first.
  *
  * Replaces `size(filter(arr, t => lower(t).isin(set)))`, whose
  * interpreted lambda walks a |set|-long Or-chain per ELEMENT (~2 ms/row
  * measured for the quality+langid stack on the driver corpus). One
  * hash-set probe per element, single JVM call per row. */
case class CountInSetExpr(child: Expression, set: Seq[String],
    lowercase: Boolean)
    extends UnaryExpression with CodegenFallback with Serializable {

  @transient private lazy val lookup: java.util.HashSet[UTF8String] = {
    val s = new java.util.HashSet[UTF8String](set.size * 2)
    // normalize the set the same way as the probes — a mixed-case set
    // entry with lowercase=true must still match
    set.foreach(e => s.add(UTF8String.fromString(
      if (lowercase) e.toLowerCase else e)))
    s
  }

  override def dataType: DataType =
    org.apache.spark.sql.types.IntegerType
  override def nullable: Boolean = true

  override protected def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[
      org.apache.spark.sql.catalyst.util.ArrayData]
    var c = 0
    var i = 0
    val n = arr.numElements()
    while (i < n) {
      if (!arr.isNullAt(i)) {
        val e = arr.getUTF8String(i)
        val probe = if (lowercase) e.toLowerCase else e
        if (lookup.contains(probe)) c += 1
      }
      i += 1
    }
    c
  }

  override protected def withNewChildInternal(newChild: Expression)
      : CountInSetExpr = copy(child = newChild)
}

/** Distinct character-n-gram shingle HASHES (xxhash64 of the shingle's
  * UTF-8 bytes, seed 42 — bit-identical to `xxhash64(shingle_string)`)
  * as a SORTED array<long>.
  *
  * The string-emitting CharShingleExpr above allocates one UTF8String per
  * shingle (~15M allocations per 5k-doc corpus pass) only for downstream
  * `xxhash64(s)` to hash the bytes and discard the string. This walks the
  * byte stream once and hashes each codepoint window in place: zero
  * per-shingle allocation. Sorting makes the distinct step an in-place
  * dedup and gives downstream set ops a canonical order. */
case class CharShingleHashExpr(child: Expression, n: Int)
    extends UnaryExpression with CodegenFallback with Serializable {

  require(n >= 1, s"shingle size must be >= 1: $n")

  override def dataType: DataType =
    ArrayType(org.apache.spark.sql.types.LongType, containsNull = false)
  override def nullable: Boolean = true

  override protected def nullSafeEval(input: Any): Any = {
    val s = input.asInstanceOf[UTF8String]
    val bytes = s.getBytes
    val offsets = new Array[Int](bytes.length + 1)
    var nChars = 0
    var i = 0
    while (i < bytes.length) {
      if ((bytes(i) & 0xC0) != 0x80) { offsets(nChars) = i; nChars += 1 }
      i += 1
    }
    offsets(nChars) = bytes.length
    if (nChars < n) return new GenericArrayData(Array.empty[Long])
    val m = nChars - n + 1
    val hs = new Array[Long](m)
    var c = 0
    while (c < m) {
      val from = offsets(c)
      hs(c) = org.apache.spark.sql.catalyst.expressions.XXH64
        .hashUnsafeBytes(bytes,
          org.apache.spark.unsafe.Platform.BYTE_ARRAY_OFFSET + from,
          offsets(c + n) - from, 42L)
      c += 1
    }
    new GenericArrayData(ByteTextUtil.sortedDistinct(hs, m))
  }

  override protected def withNewChildInternal(newChild: Expression)
      : CharShingleHashExpr = copy(child = newChild)
}

/** Hashes of whitespace-separated tokens (xxhash64 of each token's UTF-8
  * bytes, seed 42 — bit-identical to exploding `split(text, '\\s+')` and
  * hashing each NON-EMPTY token), duplicates KEPT (SimHash weights by
  * occurrence). One byte-stream walk, zero per-token allocation. NOTE:
  * unlike split(), separator-only or empty input yields an EMPTY array
  * (split returns a single "" token there) — callers treat zero-token
  * docs as having no signature. */
/** SQL-replayable whole-string poly hash (ByteTextUtil.strPolyHash):
  * the scalar probe-side twin of CmsSketchAgg's split=false mode. */
case class StrPolyHashExpr(child: Expression, base: Long, cap: Int)
    extends UnaryExpression with CodegenFallback with Serializable {

  override def dataType: DataType = org.apache.spark.sql.types.LongType
  override def nullable: Boolean = true

  override protected def nullSafeEval(input: Any): Any =
    ByteTextUtil.strPolyHash(
      input.asInstanceOf[UTF8String].getBytes, base, cap)

  override protected def withNewChildInternal(newChild: Expression)
      : StrPolyHashExpr = copy(child = newChild)
}

case class WsTokenHashExpr(child: Expression)
    extends UnaryExpression with CodegenFallback with Serializable {

  override def dataType: DataType =
    ArrayType(org.apache.spark.sql.types.LongType, containsNull = false)
  override def nullable: Boolean = true

  override protected def nullSafeEval(input: Any): Any =
    new GenericArrayData(
      ByteTextUtil.tokenHashes(input.asInstanceOf[UTF8String].getBytes))

  override protected def withNewChildInternal(newChild: Expression)
      : WsTokenHashExpr = copy(child = newChild)
}

/** SQL-replayable whitespace-token hashes (ByteTextUtil.tokenPolyHashes):
  * base-257 polynomial mod 1e9+7 over each token's first 8 bytes. The
  * replayable twin of WsTokenHashExpr for oracle-checked pipelines. */
case class WsTokenPolyHashExpr(child: Expression, base: Long = 257L)
    extends UnaryExpression with CodegenFallback with Serializable {

  override def dataType: DataType =
    ArrayType(org.apache.spark.sql.types.LongType, containsNull = false)
  override def nullable: Boolean = true

  override protected def nullSafeEval(input: Any): Any =
    new GenericArrayData(ByteTextUtil.tokenPolyHashes(
      input.asInstanceOf[UTF8String].getBytes, base))

  override protected def withNewChildInternal(newChild: Expression)
      : WsTokenPolyHashExpr = copy(child = newChild)
}

/** MinHash signature of an array<long> of element hashes: for each of k
  * seeded permutations, the min over elements of
  * xxhash64(seed_const_i, element) — BIT-IDENTICAL to the SQL form
  * `min(xxhash64(lit(splitmix64(i)), h))` used by the explode+aggregate
  * path (XxHash64 chains children: hashLong(h, hashLong(const_i, 42))),
  * but with the per-permutation prefix hash precomputed once and the
  * whole signature built in one tight loop per document — no 15M-row
  * explode, no 64-buffer hash aggregation, no shuffle. Null for an empty
  * element set (such docs have no signature and join into no candidate
  * pairs, matching the explode path where groupBy simply never sees
  * them). */
case class MinHashSigExpr(child: Expression, k: Int)
    extends UnaryExpression with CodegenFallback with Serializable {

  require(k >= 1, s"signature length must be >= 1: $k")

  override def dataType: DataType =
    ArrayType(org.apache.spark.sql.types.LongType, containsNull = false)
  override def nullable: Boolean = true

  // xxhash64(lit(c), h) == hashLong(h, hashLong(c, 42)); the inner term
  // depends only on the permutation index — precompute it. splitmix64 is
  // the shared graft.core.Hashing definition (bit-compat with Dedup's
  // explode-path constants is load-bearing).
  @transient private lazy val seeds: Array[Long] =
    Array.tabulate(k)(i => org.apache.spark.sql.catalyst.expressions.XXH64
      .hashLong(graft.core.Hashing.splitmix64(i.toLong), 42L))

  override protected def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[
      org.apache.spark.sql.catalyst.util.ArrayData]
    val m = arr.numElements()
    if (m == 0) return null
    val mins = new Array[Long](k)
    java.util.Arrays.fill(mins, Long.MaxValue)
    var j = 0
    while (j < m) {
      val h = arr.getLong(j)
      var i = 0
      while (i < k) {
        val v = org.apache.spark.sql.catalyst.expressions.XXH64
          .hashLong(h, seeds(i))
        if (v < mins(i)) mins(i) = v
        i += 1
      }
      j += 1
    }
    new GenericArrayData(mins)
  }

  override protected def withNewChildInternal(newChild: Expression)
      : MinHashSigExpr = copy(child = newChild)
}

/** SimHash signature of an array<long> of token hashes (duplicates
  * weighted): bit i of the result is set iff the majority of tokens have
  * bit i set in their hash — identical semantics to the 64-aggregation
  * sum(±1) > 0 form, one tight loop per document, no explode/shuffle.
  * Zero tokens → signature 0 (the explode path dropped such docs; callers
  * keep behavior by filtering empties before pairing). */
case class SimHashSigExpr(child: Expression)
    extends UnaryExpression with CodegenFallback with Serializable {

  override def dataType: DataType = org.apache.spark.sql.types.LongType
  override def nullable: Boolean = true

  override protected def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[
      org.apache.spark.sql.catalyst.util.ArrayData]
    val m = arr.numElements()
    val counts = new Array[Int](64)
    var j = 0
    while (j < m) {
      val h = arr.getLong(j)
      var i = 0
      while (i < 64) {
        if (((h >>> i) & 1L) == 1L) counts(i) += 1 else counts(i) -= 1
        i += 1
      }
      j += 1
    }
    var sig = 0L
    var i = 0
    while (i < 64) {
      if (counts(i) > 0) sig |= (1L << i)
      i += 1
    }
    sig
  }

  override protected def withNewChildInternal(newChild: Expression)
      : SimHashSigExpr = copy(child = newChild)
}

/** Sorted distinct hashes of word n-gram shingles: tokenize the (already
  * lowercased/normalized) string on whitespace runs, hash each token's
  * bytes (xxhash64 seed 42), then chain each n-token window's hashes
  * (acc = hashLong(tokenHash, acc) from seed 42). Set-equivalent to the
  * composable `array_distinct(transform(... concat_ws(' ', slice(...))))`
  * form — token tuples map injectively to chains modulo 64-bit collisions
  * — so Jaccard over these equals Jaccard over the string shingles, at
  * zero per-shingle string allocation and no interpreted lambdas.
  * Fewer than n tokens → empty array. */
case class WordShingleHashExpr(child: Expression, n: Int)
    extends UnaryExpression with CodegenFallback with Serializable {

  require(n >= 1, s"shingle size must be >= 1: $n")

  override def dataType: DataType =
    ArrayType(org.apache.spark.sql.types.LongType, containsNull = false)
  override def nullable: Boolean = true

  override protected def nullSafeEval(input: Any): Any = {
    val tok = ByteTextUtil.tokenHashes(
      input.asInstanceOf[UTF8String].getBytes)
    val m = tok.length - n + 1
    if (m <= 0) return new GenericArrayData(Array.empty[Long])
    val hs = new Array[Long](m)
    var j = 0
    while (j < m) {
      var acc = 42L
      var w = 0
      while (w < n) {
        acc = org.apache.spark.sql.catalyst.expressions.XXH64
          .hashLong(tok(j + w), acc)
        w += 1
      }
      hs(j) = acc
      j += 1
    }
    new GenericArrayData(ByteTextUtil.sortedDistinct(hs, m))
  }

  override protected def withNewChildInternal(newChild: Expression)
      : WordShingleHashExpr = copy(child = newChild)
}

/** Winnowing document fingerprints (Schleimer/Wilkerson/Aiken, SIGMOD'03 —
  * the MOSS algorithm): polynomial rolling hash over every k-codepoint
  * gram (base 257 mod 1e9+7, exact in int64 — DELIBERATELY SQL-portable so
  * the DuckDB oracle can replay it, unlike xxhash64), then the minimum of
  * each w-hash sliding window is selected; returns the SORTED DISTINCT
  * selected fingerprints. Two docs sharing any sufficiently-long substring
  * share fingerprints regardless of alignment — the guarantee windowed
  * min-sampling adds over plain k-gram sampling.
  *
  * O(len) per doc: the gram hash rolls (h←(h−cp_out·B^{k−1})·B+cp_in mod M)
  * and the window min uses a monotone deque. Fewer grams than w → one
  * window over all grams; fewer than k codepoints → empty. */
case class WinnowFingerprintExpr(child: Expression, k: Int, w: Int)
    extends UnaryExpression with CodegenFallback with Serializable {

  require(k >= 1 && w >= 1, s"k and w must be >= 1: k=$k w=$w")

  private val M = 1000000007L
  private val B = 257L
  // B^(k-1) mod M — the out-rolling coefficient
  private val pTop: Long = {
    var p = 1L; var i = 0
    while (i < k - 1) { p = p * B % M; i += 1 }
    p
  }

  override def dataType: DataType =
    ArrayType(org.apache.spark.sql.types.LongType, containsNull = false)
  override def nullable: Boolean = true

  override protected def nullSafeEval(input: Any): Any = {
    val cps = input.asInstanceOf[UTF8String].toString
      .codePoints().toArray
    val nH = cps.length - k + 1
    if (nH <= 0) return new GenericArrayData(Array.empty[Long])
    val hs = new Array[Long](nH)
    var h = 0L
    var i = 0
    while (i < k) { h = (h * B + cps(i)) % M; i += 1 }
    hs(0) = h
    while (i < cps.length) {
      h = ((h - cps(i - k) * pTop % M + M) * B + cps(i)) % M
      hs(i - k + 1) = h
      i += 1
    }
    if (nH <= w) {
      var m = hs(0); var j = 1
      while (j < nH) { if (hs(j) < m) m = hs(j); j += 1 }
      return new GenericArrayData(Array(m))
    }
    // monotone deque sliding-window min (indices, increasing values)
    val nW = nH - w + 1
    val sel = new Array[Long](nW)
    val dq = new Array[Int](nH)
    var head = 0; var tail = 0 // [head, tail)
    var j = 0
    while (j < nH) {
      while (tail > head && hs(dq(tail - 1)) >= hs(j)) tail -= 1
      dq(tail) = j; tail += 1
      if (dq(head) <= j - w) head += 1
      if (j >= w - 1) sel(j - w + 1) = hs(dq(head))
      j += 1
    }
    new GenericArrayData(ByteTextUtil.sortedDistinct(sel, nW))
  }

  override protected def withNewChildInternal(newChild: Expression)
      : WinnowFingerprintExpr = copy(child = newChild)
}

/** Content-defined-chunking boundaries: 1-based start positions of the
  * k-grams whose rolling hash ≡ 0 (mod divisor) — the rsync/CDC cut
  * rule. Same O(len) rolling recurrence (and therefore the same
  * coefficient-replay SQL twin) as [[WinnowFingerprintExpr]]; fewer
  * than k codepoints → empty (callers emit one whole-doc chunk). */
case class CdcBoundaryExpr(child: Expression, k: Int, divisor: Int)
    extends UnaryExpression with CodegenFallback with Serializable {

  require(k >= 1 && divisor >= 1,
    s"k and divisor must be >= 1: k=$k divisor=$divisor")

  private val M = 1000000007L
  private val B = 257L
  private val pTop: Long = {
    var p = 1L; var i = 0
    while (i < k - 1) { p = p * B % M; i += 1 }
    p
  }

  override def dataType: DataType =
    ArrayType(org.apache.spark.sql.types.IntegerType, containsNull = false)
  override def nullable: Boolean = true

  override protected def nullSafeEval(input: Any): Any = {
    val cps = input.asInstanceOf[UTF8String].toString
      .codePoints().toArray
    val nH = cps.length - k + 1
    if (nH <= 0) return new GenericArrayData(Array.empty[Int])
    var out = new Array[Int](8)
    var cnt = 0
    var h = 0L
    var i = 0
    while (i < k) { h = (h * B + cps(i)) % M; i += 1 }
    if (h % divisor == 0) { out(0) = 1; cnt = 1 }
    while (i < cps.length) {
      h = ((h - cps(i - k) * pTop % M + M) * B + cps(i)) % M
      if (h % divisor == 0) {
        if (cnt == out.length) out = java.util.Arrays.copyOf(out, cnt * 2)
        out(cnt) = i - k + 2 // 1-based gram start
        cnt += 1
      }
      i += 1
    }
    new GenericArrayData(
      if (cnt == out.length) out else java.util.Arrays.copyOf(out, cnt))
  }

  override protected def withNewChildInternal(newChild: Expression)
      : CdcBoundaryExpr = copy(child = newChild)
}

/** Word n-gram repetition statistics in one narrow pass: total n-gram
  * occurrences, the modal n-gram's count, and the occurrence mass of
  * n-grams appearing more than once — the inputs to the Gopher-style
  * repetition quality signals (top-n-gram fraction, duplicate-n-gram
  * fraction; Rae et al. 2021 §A1.1). Tokens are whitespace runs (the
  * `split(trim(s), "\\s+")` twin); each n-gram is counted by the xxhash64
  * of its single-space-joined byte form — counts are exact modulo 64-bit
  * hash collisions, which are negligible at per-document cardinalities.
  * Per-row work in one JVM call (CodegenFallback), no shuffle: at corpus
  * scale the alternative (explode tokens + lead window + two groupBys)
  * shuffles every token twice.
  */
case class WordNgramStatsExpr(child: Expression, n: Int)
    extends UnaryExpression with CodegenFallback with Serializable {

  require(n >= 1, s"n-gram size must be >= 1: $n")

  override def dataType: DataType = org.apache.spark.sql.types.StructType(
    Seq(
      org.apache.spark.sql.types.StructField("total",
        org.apache.spark.sql.types.LongType, nullable = false),
      org.apache.spark.sql.types.StructField("max_cnt",
        org.apache.spark.sql.types.LongType, nullable = false),
      org.apache.spark.sql.types.StructField("dup_cnt",
        org.apache.spark.sql.types.LongType, nullable = false)))
  override def nullable: Boolean = true

  override protected def nullSafeEval(input: Any): Any = {
    val bytes = input.asInstanceOf[UTF8String].getBytes
    // token byte ranges
    var starts = new Array[Int](16)
    var ends = new Array[Int](16)
    var nTok = 0
    var i = 0
    val len = bytes.length
    while (i < len) {
      while (i < len && ByteTextUtil.isWs(bytes(i))) i += 1
      val s0 = i
      while (i < len && !ByteTextUtil.isWs(bytes(i))) i += 1
      if (i > s0) {
        if (nTok == starts.length) {
          starts = java.util.Arrays.copyOf(starts, starts.length * 2)
          ends = java.util.Arrays.copyOf(ends, ends.length * 2)
        }
        starts(nTok) = s0; ends(nTok) = i; nTok += 1
      }
    }
    val zero = new org.apache.spark.sql.catalyst.expressions
      .GenericInternalRow(Array[Any](0L, 0L, 0L))
    if (nTok < n) return zero
    // hash each n-gram's single-space-joined bytes via a scratch buffer
    val scratch = new Array[Byte](len)
    val counts = new java.util.HashMap[java.lang.Long, Array[Long]]()
    var g = 0
    while (g + n <= nTok) {
      var p = 0
      var j = g
      while (j < g + n) {
        if (j > g) { scratch(p) = ' '; p += 1 }
        val tl = ends(j) - starts(j)
        System.arraycopy(bytes, starts(j), scratch, p, tl)
        p += tl
        j += 1
      }
      val h = org.apache.spark.sql.catalyst.expressions.XXH64
        .hashUnsafeBytes(scratch,
          org.apache.spark.unsafe.Platform.BYTE_ARRAY_OFFSET, p, 42L)
      val slot = counts.get(h)
      if (slot == null) counts.put(h, Array(1L)) else slot(0) += 1L
      g += 1
    }
    val total = (nTok - n + 1).toLong
    var maxCnt = 0L
    var dupCnt = 0L
    val it = counts.values().iterator()
    while (it.hasNext) {
      val c = it.next()(0)
      if (c > maxCnt) maxCnt = c
      if (c > 1) dupCnt += c
    }
    new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
      Array[Any](total, maxCnt, dupCnt))
  }

  override protected def withNewChildInternal(newChild: Expression)
      : WordNgramStatsExpr = copy(child = newChild)
}

/** Viterbi segmentation under a unigram piece LM (the SentencePiece
  * decode DP, Kudo arXiv:1804.10959 §3.2) against a FIXED piece table
  * embedded in the expression — model-sized by construction, the
  * [[VectorExpressions]] NearestCentroids idiom, so segmentation is a
  * pure narrow projection at any corpus scale.
  *
  * dp[i] = max over j of dp[j] · p(word[j..i)) for codepoint spans of
  * length ≤ maxLen present in the table; j scans ASCENDING with strict
  * improvement, so equal scores keep the SMALLEST j (longest final
  * piece) — a total, engine-portable tie rule. The MULTIPLICATIVE
  * domain is deliberate: probabilities arrive as exact binary64
  * rationals (cnt/total) and IEEE multiply/compare replay bit-for-bit
  * in any engine (q137's DuckDB oracle matches raw doubles), where the
  * usual ln form would hang the argmax on libm last-ulp differences.
  *
  * Null for null/empty input and unsegmentable words (some codepoint
  * covered by no piece). Returns struct(score, pieces). */
/** Per-document character-distribution statistics — the
  * entropy/uniqueness quality signal (low char entropy flags repeated-
  * character gibberish, high flags base64/binary blobs; the CCNet/
  * Dolma-family filter dimension next to the word-level q69 signals).
  * One narrow pass per row, zero exchanges at any corpus scale: counts
  * accumulate in a codepoint-keyed map, and the entropy sum runs in
  * CODEPOINT-ASCENDING order so the double is a deterministic function
  * of the string (engines replaying with their own summation order
  * agree after the round-6 discipline — the terms are ≤ few hundred,
  * so order noise is ~1e-14). Returns struct(entropy_bits, n_unique,
  * n_chars); null/empty input → null. */
case class CharStatsExpr(child: Expression)
    extends UnaryExpression with CodegenFallback with Serializable {

  override def dataType: DataType = org.apache.spark.sql.types.StructType(
    Seq(
      org.apache.spark.sql.types.StructField("entropy_bits",
        org.apache.spark.sql.types.DoubleType, nullable = false),
      org.apache.spark.sql.types.StructField("n_unique",
        org.apache.spark.sql.types.IntegerType, nullable = false),
      org.apache.spark.sql.types.StructField("n_chars",
        org.apache.spark.sql.types.IntegerType, nullable = false)))
  override def nullable: Boolean = true

  override protected def nullSafeEval(input: Any): Any = {
    val cps = input.asInstanceOf[UTF8String].toString
      .codePoints().toArray
    val n = cps.length
    if (n == 0) return null
    java.util.Arrays.sort(cps)
    var h = 0.0
    var uniq = 0
    var i = 0
    while (i < n) {
      var j = i
      while (j < n && cps(j) == cps(i)) j += 1
      val p = (j - i).toDouble / n
      h -= p * math.log(p)
      uniq += 1
      i = j
    }
    org.apache.spark.sql.catalyst.InternalRow(
      h / math.log(2.0), uniq, n)
  }

  override protected def withNewChildInternal(newChild: Expression)
      : CharStatsExpr = copy(child = newChild)

  override def prettyName: String = "char_stats"
}

/** Unicode NFC normalization (canonical composition). The text-hygiene
  * step ahead of every fingerprint/dedup stage: `é` typed as
  * U+0065 U+0301 (decomposed) and U+00E9 (composed) are DIFFERENT byte
  * strings, so without canonicalization every decomposed copy of a
  * document hashes as a distinct file and survives exact dedup (q23),
  * splits differently under the content-hash samplers, and double-counts
  * in vocabulary fits. Wraps the JDK's `java.text.Normalizer` (Unicode
  * UAX #15) as a pure narrow projection with REAL codegen — one static
  * call, no UDF, stays inside the whole-stage span. Portable: DuckDB's
  * `nfc_normalize` implements the same UAX #15 algorithm, so the full
  * output string is hash-checkable (q180). NFC (not NFKC) on purpose —
  * compatibility folding (① → 1, ﬁ → fi) is lossy and corpus-policy,
  * canonical composition is identity-preserving and always safe. */
case class NfcNormalizeExpr(child: Expression)
    extends UnaryExpression with Serializable {

  override def dataType: DataType = StringType

  override protected def nullSafeEval(input: Any): Any =
    UTF8String.fromString(java.text.Normalizer.normalize(
      input.asInstanceOf[UTF8String].toString,
      java.text.Normalizer.Form.NFC))

  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
      : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"UTF8String.fromString(java.text.Normalizer.normalize(" +
        s"$c.toString(), java.text.Normalizer.Form.NFC))")

  override protected def withNewChildInternal(newChild: Expression)
      : NfcNormalizeExpr = copy(child = newChild)

  override def prettyName: String = "nfc_normalize"
}

/** WordPiece greedy longest-match-first segmentation (Wu et al. 2016,
  * the BERT tokenizer apply rule; reference framing: the third
  * tokenizer family next to BPE `ops/Bpe.scala` and unigram-LM
  * [[UnigramViterbiExpr]]). Two model-sized vocabularies ride into the
  * expression — word-START pieces and CONTINUATION pieces (the `##`
  * forms) — so segmentation is a pure narrow projection, zero
  * exchanges at any corpus scale. Greedy walk: at each position take
  * the LONGEST vocab piece matching (position 0 consults the start
  * set, later positions the continuation set); continuations are
  * emitted with the `##` prefix; if no piece matches at some position
  * the whole word collapses to `["[UNK]"]` (the HuggingFace WordPiece
  * contract). Codepoint-indexed throughout, like the Viterbi DP. No
  * floats anywhere — the walk replays in portable SQL verbatim. */
case class WordPieceExpr(child: Expression, startPieces: Array[String],
    contPieces: Array[String])
    extends UnaryExpression with CodegenFallback with Serializable {

  require(startPieces.nonEmpty, "empty word-start vocabulary")

  @transient private lazy val startSet = {
    val s = new java.util.HashSet[String](startPieces.length * 2)
    startPieces.foreach(s.add)
    s
  }
  @transient private lazy val contSet = {
    val s = new java.util.HashSet[String](contPieces.length * 2)
    contPieces.foreach(s.add)
    s
  }
  @transient private lazy val maxLen =
    (startPieces.iterator ++ contPieces.iterator)
      .map(p => p.codePointCount(0, p.length)).max

  override def dataType: DataType =
    ArrayType(StringType, containsNull = false)
  override def nullable: Boolean = true

  private val UNK = UTF8String.fromString("[UNK]")

  override protected def nullSafeEval(input: Any): Any = {
    val cps = input.asInstanceOf[UTF8String].toString
      .codePoints().toArray
    val n = cps.length
    if (n == 0) return null
    val out = new java.util.ArrayList[Any](4)
    var pos = 0
    while (pos < n) {
      val set = if (pos == 0) startSet else contSet
      var l = math.min(maxLen, n - pos)
      var hit: String = null
      while (l >= 1 && hit == null) {
        val s = new String(cps, pos, l)
        if (set.contains(s)) hit = s else l -= 1
      }
      if (hit == null)
        return new GenericArrayData(Array[Any](UNK))
      out.add(UTF8String.fromString(
        if (pos == 0) hit else "##" + hit))
      pos += l
    }
    new GenericArrayData(out.toArray)
  }

  override protected def withNewChildInternal(newChild: Expression)
      : WordPieceExpr = copy(child = newChild)

  override def prettyName: String = "word_piece"
}

case class UnigramViterbiExpr(child: Expression, pieces: Array[String],
    probs: Array[Double])
    extends UnaryExpression with CodegenFallback with Serializable {

  require(pieces.nonEmpty && pieces.length == probs.length,
    s"pieces/probs mismatch: ${pieces.length} vs ${probs.length}")

  @transient private lazy val table = {
    val m = new java.util.HashMap[String, java.lang.Double](
      pieces.length * 2)
    var i = 0
    while (i < pieces.length) { m.put(pieces(i), probs(i)); i += 1 }
    m
  }
  @transient private lazy val maxLen =
    pieces.iterator.map(p => p.codePointCount(0, p.length)).max

  override def dataType: DataType = org.apache.spark.sql.types.StructType(
    Seq(
      org.apache.spark.sql.types.StructField("score",
        org.apache.spark.sql.types.DoubleType, nullable = false),
      org.apache.spark.sql.types.StructField("pieces",
        ArrayType(StringType, containsNull = false), nullable = false)))
  override def nullable: Boolean = true

  override protected def nullSafeEval(input: Any): Any = {
    val cps = input.asInstanceOf[UTF8String].toString
      .codePoints().toArray
    val n = cps.length
    if (n == 0) return null
    val dp = new Array[Double](n + 1)
    val bk = new Array[Int](n + 1)
    java.util.Arrays.fill(dp, -1.0)
    dp(0) = 1.0
    var i = 1
    while (i <= n) {
      var best = -1.0
      var bj = -1
      var j = math.max(0, i - maxLen)
      while (j < i) {
        if (dp(j) >= 0.0) {
          val p = table.get(new String(cps, j, i - j))
          if (p != null) {
            val cand = dp(j) * p.doubleValue()
            if (cand > best) { best = cand; bj = j }
          }
        }
        j += 1
      }
      dp(i) = best
      bk(i) = bj
      i += 1
    }
    if (dp(n) < 0.0) return null
    var cnt = 0
    var pos = n
    while (pos > 0) { cnt += 1; pos = bk(pos) }
    val segs = new Array[Any](cnt)
    pos = n
    var k = cnt - 1
    while (pos > 0) {
      val j = bk(pos)
      segs(k) = UTF8String.fromString(new String(cps, j, pos - j))
      k -= 1
      pos = j
    }
    org.apache.spark.sql.catalyst.InternalRow(dp(n),
      new GenericArrayData(segs))
  }

  override protected def withNewChildInternal(newChild: Expression)
      : UnigramViterbiExpr = copy(child = newChild)
}

/** Greedy BPE merge application over ONE word: the `nMerges`
  * sequential [[graft.ops.Bpe.mergeStep]] relational passes (each a
  * per-word window + island rank + two positional joins + a renumber
  * window — ~3 exchanges and a blocking localCheckpoint PER MERGE),
  * collapsed into one narrow expression walk (the
  * [[UnigramViterbiExpr]]/[[WordPieceExpr]] embed-the-model idiom,
  * applied to the BPE merge table — guide §1.2: fix the pass count
  * first).
  *
  * Exact semantics of the relational walk, per merge rank: hits are
  * the positions where (sym(i), sym(i+1)) = (lhs, rhs) BEFORE any
  * merge of this rank applies; islands of consecutive hits (only
  * self-pairs produce them) keep their odd-ranked members — which is
  * precisely a left-to-right scan that merges on match and skips past
  * the consumed right half. Char split matches `initialSymbols`'s
  * `split(w, "(?!^)(?=[\s\S])")` (one symbol per Java regex boundary —
  * BpeSpec/BpePropertySpec pin equality against the relational form).
  * O(nMerges · |word|) per row; merge tables are model-sized
  * (params-as-data), embedded as literals like every other trained
  * tokenizer expression here. */
case class BpeApplyExpr(child: Expression, lhs: Seq[String],
    rhs: Seq[String])
    extends UnaryExpression with CodegenFallback with Serializable {

  require(lhs.length == rhs.length,
    s"bpe_apply: ${lhs.length} lhs vs ${rhs.length} rhs halves")

  override def dataType: DataType =
    ArrayType(StringType, containsNull = false)
  override def nullable: Boolean = true

  override protected def nullSafeEval(input: Any): Any = {
    val w = input.asInstanceOf[UTF8String].toString
    var syms = w.split("(?!^)(?=[\\s\\S])")
    var m = 0
    while (m < lhs.length) {
      val a = lhs(m)
      val b = rhs(m)
      // left-to-right greedy scan; only rewrite when a hit exists
      var j = 0
      var hits = 0
      while (j < syms.length - 1) {
        if (syms(j) == a && syms(j + 1) == b) { hits += 1; j += 2 }
        else j += 1
      }
      if (hits > 0) {
        val out = new Array[String](syms.length - hits)
        var i = 0
        var o = 0
        while (i < syms.length) {
          if (i < syms.length - 1 && syms(i) == a && syms(i + 1) == b) {
            out(o) = a + b; o += 1; i += 2
          } else { out(o) = syms(i); o += 1; i += 1 }
        }
        syms = out
      }
      m += 1
    }
    val out = new Array[Any](syms.length)
    var i = 0
    while (i < syms.length) {
      out(i) = UTF8String.fromString(syms(i)); i += 1
    }
    new GenericArrayData(out)
  }

  override protected def withNewChildInternal(newChild: Expression)
      : BpeApplyExpr = copy(child = newChild)
}

object TextExpressions {
  /** Distinct character n-gram shingles of a string column (insertion
    * order = first occurrence, matching the composable form's
    * `array_distinct` semantics). */
  def charShingles(s: Column, n: Int): Column =
    Bridge.toColumn(CharShingleExpr(Bridge.toExpression(s), n))

  /** Count of array elements present in `set` (duplicates counted). */
  def countInSet(arr: Column, set: Seq[String],
      lowercase: Boolean = false): Column =
    Bridge.toColumn(CountInSetExpr(Bridge.toExpression(arr), set,
      lowercase))

  /** Sorted distinct xxhash64 hashes of the string's char n-gram
    * shingles. */
  def charShingleHashes(s: Column, n: Int): Column =
    Bridge.toColumn(CharShingleHashExpr(Bridge.toExpression(s), n))

  /** xxhash64 hashes of whitespace tokens (duplicates kept). */
  def wsTokenHashes(s: Column): Column =
    Bridge.toColumn(WsTokenHashExpr(Bridge.toExpression(s)))

  /** SQL-replayable token hashes (base-`base` poly mod 1e9+7, first 8
    * bytes per whitespace token, duplicates kept). */
  def wsTokenPolyHashes(s: Column, base: Long = 257L): Column =
    Bridge.toColumn(WsTokenPolyHashExpr(Bridge.toExpression(s), base))

  /** SQL-replayable whole-string poly hash (first `cap` bytes, no
    * tokenization). */
  def strPolyHash(s: Column, base: Long, cap: Int = 16): Column =
    Bridge.toColumn(StrPolyHashExpr(Bridge.toExpression(s), base, cap))

  /** k-permutation MinHash signature of an array<long> of element
    * hashes; null for empty input. */
  def minhashSig(hashes: Column, k: Int): Column =
    Bridge.toColumn(MinHashSigExpr(Bridge.toExpression(hashes), k))

  /** 64-bit SimHash majority-vote signature of an array<long> of token
    * hashes (duplicates weighted). */
  def simhashSig(hashes: Column): Column =
    Bridge.toColumn(SimHashSigExpr(Bridge.toExpression(hashes)))

  /** Sorted distinct hashes of word n-gram shingles of a (pre-lowercased)
    * string. */
  def wordShingleHashes(s: Column, n: Int): Column =
    Bridge.toColumn(WordShingleHashExpr(Bridge.toExpression(s), n))

  /** Sorted distinct winnowing fingerprints (k-gram rolling hash, window
    * w min-sampling). */
  def winnowFingerprints(s: Column, k: Int, w: Int): Column =
    Bridge.toColumn(WinnowFingerprintExpr(Bridge.toExpression(s), k, w))

  /** 1-based starts of k-grams whose rolling hash ≡ 0 (mod divisor) —
    * content-defined chunk boundaries. */
  def cdcBoundaries(s: Column, k: Int, divisor: Int): Column =
    Bridge.toColumn(CdcBoundaryExpr(Bridge.toExpression(s), k, divisor))

  /** struct(total, max_cnt, dup_cnt) of word n-gram occurrences. */
  def wordNgramStats(s: Column, n: Int): Column =
    Bridge.toColumn(WordNgramStatsExpr(Bridge.toExpression(s), n))

  /** Unicode NFC canonical composition (UAX #15); null-preserving. */
  def nfcNormalize(s: Column): Column =
    Bridge.toColumn(NfcNormalizeExpr(Bridge.toExpression(s)))

  /** struct(score, pieces): Viterbi segmentation of a word under a
    * unigram piece LM embedded in the expression. */
  def unigramViterbi(word: Column, pieces: Array[String],
      probs: Array[Double]): Column =
    Bridge.toColumn(UnigramViterbiExpr(Bridge.toExpression(word),
      pieces, probs))

  /** struct(entropy_bits, n_unique, n_chars): per-document character
    * distribution stats in one narrow pass. */
  def charStats(text: Column): Column =
    Bridge.toColumn(CharStatsExpr(Bridge.toExpression(text)))

  /** ARRAY<STRING>: WordPiece greedy longest-match-first segmentation
    * of a word under (word-start, continuation) piece vocabularies
    * embedded in the expression; continuations carry the `##` prefix,
    * unsegmentable words collapse to `[UNK]`. */
  def wordPiece(word: Column, startPieces: Array[String],
      contPieces: Array[String]): Column =
    Bridge.toColumn(WordPieceExpr(Bridge.toExpression(word),
      startPieces, contPieces))

  /** ARRAY<STRING>: greedy BPE merge application over one word under
    * a rank-ordered merge table embedded in the expression (the
    * relational per-rank walk, one narrow pass). */
  def bpeApply(word: Column, lhs: Seq[String], rhs: Seq[String])
      : Column =
    Bridge.toColumn(BpeApplyExpr(Bridge.toExpression(word), lhs, rhs))
}
