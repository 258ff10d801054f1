package graft.expressions

import java.nio.ByteBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}
import org.apache.spark.sql.graftbridge.Bridge

/** Per-bag weighted vector sum, `Σ w·vec` element-wise — the aggregate half
  * of the reference's `EmbeddingBag(mode='sum')` gather
  * (/root/reference/EventStream/EventStreamData/data_embedding_layer.py:174-244).
  *
  * Native `TypedImperativeAggregate` replacing the earlier typed
  * `Aggregator`/`udaf` form: that path deserialized every input row's vector
  * through an ExpressionEncoder into `Seq[Double]` (boxing each component)
  * and re-encoded the `Array[Double]` buffer per partial-aggregation row.
  * Here update() reads the incoming `ArrayData` buffer directly — zero
  * boxing, one primitive fused loop — and the buffer ser/de between
  * partial and final aggregation is a flat little-endian byte copy.
  *
  * Semantics (unchanged from the udaf, plus loud length validation):
  *   - null vectors and null weights contribute nothing;
  *   - a group whose inputs were ALL null/absent evaluates to null;
  *   - a vector whose length differs from the established buffer length
  *     throws (mixed-dimension embedding tables are a data bug — silently
  *     truncating or padding would corrupt the gather without signal).
  */
case class WeightedVecSumAgg(
    weight: Expression,
    vec: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[Array[Double]] with Serializable {

  override def children: Seq[Expression] = Seq(weight, vec)
  override def nullable: Boolean = true
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    val vecOk = vec.dataType match {
      case ArrayType(FloatType, _) | ArrayType(DoubleType, _) => true
      case _                                                  => false
    }
    if (weight.dataType == DoubleType && vecOk)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"weighted_vec_sum needs (double, array<float|double>), got " +
          s"${weight.dataType.sql}, ${vec.dataType.sql}")
  }

  @transient private lazy val vecIsFloat: Boolean = vec.dataType match {
    case ArrayType(FloatType, _) => true
    case _                       => false
  }

  override def createAggregationBuffer(): Array[Double] =
    Array.emptyDoubleArray

  override def update(buffer: Array[Double], input: InternalRow)
      : Array[Double] = {
    val w = weight.eval(input)
    val v = vec.eval(input)
    if (w == null || v == null) return buffer
    val arr = v.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val buf =
      if (buffer.length == 0) new Array[Double](n)
      else if (buffer.length != n)
        throw new IllegalArgumentException(
          s"weighted_vec_sum: vector of length $n in a group whose " +
            s"previous vectors had length ${buffer.length}")
      else buffer
    val wd = w.asInstanceOf[Double]
    val f = vecIsFloat
    var i = 0
    while (i < n) {
      buf(i) += wd * (if (f) arr.getFloat(i).toDouble else arr.getDouble(i))
      i += 1
    }
    buf
  }

  override def merge(a: Array[Double], b: Array[Double]): Array[Double] =
    if (a.length == 0) b
    else if (b.length == 0) a
    else if (a.length != b.length)
      throw new IllegalArgumentException(
        s"weighted_vec_sum: merging buffers of lengths " +
          s"${a.length} and ${b.length}")
    else {
      var i = 0
      while (i < a.length) { a(i) += b(i); i += 1 }
      a
    }

  override def eval(buffer: Array[Double]): Any =
    if (buffer.length == 0) null else new GenericArrayData(buffer)

  override def serialize(buffer: Array[Double]): Array[Byte] = {
    val bb = ByteBuffer.allocate(buffer.length * 8)
    var i = 0
    while (i < buffer.length) { bb.putDouble(buffer(i)); i += 1 }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Double] = {
    val bb = ByteBuffer.wrap(bytes)
    val out = new Array[Double](bytes.length / 8)
    var i = 0
    while (i < out.length) { out(i) = bb.getDouble(); i += 1 }
    out
  }

  override def withNewMutableAggBufferOffset(newOffset: Int)
      : WeightedVecSumAgg = copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int)
      : WeightedVecSumAgg = copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): WeightedVecSumAgg =
    copy(weight = newChildren(0), vec = newChildren(1))

  override def prettyName: String = "weighted_vec_sum"
}

/** Count-Min sketch of whitespace-token frequencies (Cormode &
  * Muthukrishnan, J. Algorithms 2005) built in ONE pass over document
  * text: each input row's tokens bump `d` counters (one per hash row)
  * in a flat `d×width` Long buffer.
  *
  * This is the 100 TB shape for frequency estimation: the corpus never
  * explodes to token rows — partial aggregation keeps a constant-size
  * buffer per task (width=2048, d=4 → 64 KB) and only those buffers
  * merge across the exchange, so the shuffle is O(partitions), not
  * O(tokens).
  *
  * The hash family is the SQL-replayable base-`b` polynomial mod 1e9+7
  * over each token's first 8 bytes (ByteTextUtil.tokenPolyHashes — the
  * q78/q79 twin discipline); callers feed ASCII-projected lowercased
  * text so byte == codepoint and an external engine replays the bucket
  * assignment exactly. Row `j`'s bucket is `hash_bases(j)(token) %
  * width`; all `d` hashes accumulate in one walk over the byte array.
  */
case class CmsSketchAgg(
    text: Expression,
    bases: Seq[Long],
    width: Int,
    split: Boolean = true,
    cap: Int = 8,
    family: String = "poly",
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[Array[Long]] with Serializable {

  require(bases.nonEmpty && width > 0,
    s"cms_sketch needs >=1 hash row and positive width: $bases, $width")
  require(cap >= 1 && cap <= 16,
    s"cms_sketch hash cap in [1,16] (coefficient replay < 2^63): $cap")
  // "poly" = replayable capped polynomial (the oracle family);
  // "xx" = full-string xxhash64 rows seeded like MinHashSigExpr —
  // the production family (no prefix cap, so no shared-prefix
  // collisions), bit-matched by `xxhash64(lit(splitmix64(j)), s)`
  // on the probe side. Whole-string mode only.
  require(family == "poly" || (family == "xx" && !split),
    s"cms_sketch family '$family' (xx requires split=false)")

  override def children: Seq[Expression] = Seq(text)
  override def nullable: Boolean = false
  override def dataType: DataType =
    ArrayType(org.apache.spark.sql.types.LongType, containsNull = false)

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (text.dataType == org.apache.spark.sql.types.StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"cms_sketch needs a string column, got ${text.dataType.sql}")

  private val d = bases.length
  @transient private lazy val basesArr: Array[Long] = bases.toArray
  // xx-family per-row seeds: seed_j = xxhash64's running hash after the
  // lit(splitmix64(j)) child — the MinHashSigExpr convention, so the
  // probe expression xxhash64(lit(splitmix64(j)), s) replays the grid.
  @transient private lazy val xxSeeds: Array[Long] =
    Array.tabulate(d)(j =>
      org.apache.spark.sql.catalyst.expressions.XXH64
        .hashLong(graft.core.Hashing.splitmix64(j.toLong), 42L))

  override def createAggregationBuffer(): Array[Long] =
    new Array[Long](d * width)

  override def update(buffer: Array[Long], input: InternalRow)
      : Array[Long] = {
    val t = text.eval(input)
    if (t == null) return buffer
    val u = t.asInstanceOf[org.apache.spark.unsafe.types.UTF8String]
    if (!split) {
      // whole-string mode: the row IS the unit (e.g. a word n-gram)
      val isXx = family == "xx"
      val polyBytes = if (isXx) null else u.getBytes
      var j = 0
      while (j < d) {
        val bucket =
          if (isXx)
            java.lang.Math.floorMod(
              org.apache.spark.sql.catalyst.expressions.XXH64
                .hashUnsafeBytes(u.getBaseObject, u.getBaseOffset,
                  u.numBytes, xxSeeds(j)),
              width.toLong).toInt
          else
            (ByteTextUtil.strPolyHash(polyBytes, basesArr(j), cap)
              % width).toInt
        buffer(j * width + bucket) += 1L
        j += 1
      }
      return buffer
    }
    val bytes = u.getBytes
    val M = 1000000007L
    val len = bytes.length
    var i = 0
    while (i < len) {
      while (i < len && ByteTextUtil.isWs(bytes(i))) i += 1
      val start = i
      while (i < len && !ByteTextUtil.isWs(bytes(i))) i += 1
      if (i > start) {
        val end = math.min(i, start + cap)
        var j = 0
        while (j < d) {
          var h = 0L
          var p = start
          val b = basesArr(j)
          while (p < end) { h = (h * b + (bytes(p) & 0xffL)) % M; p += 1 }
          buffer(j * width + (h % width).toInt) += 1L
          j += 1
        }
      }
    }
    buffer
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    var i = 0
    while (i < a.length) { a(i) += b(i); i += 1 }
    a
  }

  override def eval(buffer: Array[Long]): Any =
    new GenericArrayData(buffer)

  override def serialize(buffer: Array[Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(buffer.length * 8)
    var i = 0
    while (i < buffer.length) { bb.putLong(buffer(i)); i += 1 }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val bb = ByteBuffer.wrap(bytes)
    val out = new Array[Long](bytes.length / 8)
    var i = 0
    while (i < out.length) { out(i) = bb.getLong(); i += 1 }
    out
  }

  override def withNewMutableAggBufferOffset(newOffset: Int)
      : CmsSketchAgg = copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int)
      : CmsSketchAgg = copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): CmsSketchAgg =
    copy(text = newChildren(0))

  override def prettyName: String = "cms_sketch"
}

/** Bounded top-k buffer: ≤ k (score, id) pairs with the index of the
  * current worst tracked for O(1) reject / O(k) replace. */
final class TopKBuf(val k: Int) extends Serializable {
  val scores = new Array[Double](k)
  val ids = new Array[Long](k)
  var n: Int = 0

  /** (s, id) beats (s2, id2) under (score DESC, id ASC)? */
  @inline private def beats(s: Double, id: Long, s2: Double,
      id2: Long): Boolean = s > s2 || (s == s2 && id < id2)

  private def worstIdx: Int = {
    var w = 0
    var i = 1
    while (i < n) {
      if (beats(scores(w), ids(w), scores(i), ids(i))) w = i
      i += 1
    }
    w
  }

  def insert(s: Double, id: Long): Unit =
    if (n < k) { scores(n) = s; ids(n) = id; n += 1 }
    else {
      val w = worstIdx
      if (beats(s, id, scores(w), ids(w))) { scores(w) = s; ids(w) = id }
    }

  /** [[insert]] with per-id dedup: an id already tracked keeps its
    * best score instead of occupying a second slot (O(k) scan — k is
    * small by construction in every ANN use). Makes top-k-DISTINCT
    * a single partial-aggregatable stage: callers that previously
    * needed `dropDuplicates(group, id)` BEFORE the top-k agg (one
    * extra full exchange of the candidate stream) fold the dedup into
    * the aggregation buffer. Exact whenever per-id scores are unique
    * (the ANN family's case — the score is a pure function of the id's
    * stored vector); with genuinely differing per-id scores the result
    * is top-k over per-id best, still associative/commutative. */
  def insertDistinct(s: Double, id: Long): Unit = {
    var i = 0
    while (i < n) {
      if (ids(i) == id) {
        if (s > scores(i)) scores(i) = s
        return
      }
      i += 1
    }
    insert(s, id)
  }

  /** Indices 0..n-1 ordered by (score DESC, id ASC). */
  def sortedIdx: Array[Int] =
    Array.range(0, n).sortWith { (a, b) =>
      beats(scores(a), ids(a), scores(b), ids(b))
    }
}

/** Per-group top-k (id, score) pairs under (score DESC, id ASC) — the
  * ANN rank stage as a PARTIAL-AGGREGATABLE aggregate.
  *
  * The window form (`row_number() OVER (PARTITION BY query ORDER BY
  * cos DESC, id)` then `rank <= k`) must SHUFFLE every scored
  * candidate row to its query's reducer before any ranking happens —
  * for brute-force ANN that is |corpus|×|queries| rows on the wire.
  * As a TypedImperativeAggregate the map side keeps only k pairs per
  * query per partition, so the exchange carries ≤ partitions×|queries|
  * ×k rows — corpus-size-independent. Top-k under a TOTAL order
  * (score ties broken by id) is associative/commutative, so the merge
  * order cannot change the result: output rows are identical to the
  * window form's (spec-pinned).
  *
  * Returns ARRAY<STRUCT<id: LONG, score: DOUBLE>> ordered by
  * (score DESC, id ASC); null scores/ids contribute nothing; an
  * all-null group yields an empty array. */
case class TopKByScoreAgg(
    score: Expression,
    id: Expression,
    k: Int,
    distinctIds: Boolean = false,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[TopKBuf] with Serializable {

  require(k >= 1, s"top_k_by_score: k must be >= 1: $k")

  override def children: Seq[Expression] = Seq(score, id)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(
    org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("id",
        org.apache.spark.sql.types.LongType, nullable = false),
      org.apache.spark.sql.types.StructField("score", DoubleType,
        nullable = false))),
    containsNull = false)

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (score.dataType == DoubleType &&
      id.dataType == org.apache.spark.sql.types.LongType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult
        .TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult
        .TypeCheckFailure(
          s"top_k_by_score needs (double, bigint), got " +
            s"${score.dataType.sql}, ${id.dataType.sql}")

  override def createAggregationBuffer(): TopKBuf = new TopKBuf(k)

  override def update(buffer: TopKBuf, input: InternalRow): TopKBuf = {
    val s = score.eval(input)
    val i = id.eval(input)
    if (s != null && i != null) {
      if (distinctIds)
        buffer.insertDistinct(s.asInstanceOf[Double], i.asInstanceOf[Long])
      else buffer.insert(s.asInstanceOf[Double], i.asInstanceOf[Long])
    }
    buffer
  }

  override def merge(a: TopKBuf, b: TopKBuf): TopKBuf = {
    var i = 0
    if (distinctIds)
      while (i < b.n) { a.insertDistinct(b.scores(i), b.ids(i)); i += 1 }
    else
      while (i < b.n) { a.insert(b.scores(i), b.ids(i)); i += 1 }
    a
  }

  override def eval(buffer: TopKBuf): Any = {
    val order = buffer.sortedIdx
    val rows = new Array[Any](order.length)
    var i = 0
    while (i < order.length) {
      rows(i) = InternalRow(buffer.ids(order(i)), buffer.scores(order(i)))
      i += 1
    }
    new GenericArrayData(rows)
  }

  override def serialize(buffer: TopKBuf): Array[Byte] = {
    val bb = ByteBuffer.allocate(4 + buffer.n * 16)
    bb.putInt(buffer.n)
    var i = 0
    while (i < buffer.n) {
      bb.putDouble(buffer.scores(i)); bb.putLong(buffer.ids(i)); i += 1
    }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): TopKBuf = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt()
    val buf = new TopKBuf(k)
    var i = 0
    while (i < n) {
      // direct fill: deserialized pairs are already a valid ≤k set
      buf.scores(i) = bb.getDouble(); buf.ids(i) = bb.getLong(); i += 1
    }
    buf.n = n
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int)
      : TopKByScoreAgg = copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int)
      : TopKByScoreAgg = copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): TopKByScoreAgg =
    copy(score = newChildren(0), id = newChildren(1))

  override def prettyName: String =
    if (distinctIds) "top_k_by_score_distinct" else "top_k_by_score"
}

/** One-pass raw second moments of a vector column: the buffer holds
  * `[n, Σx(d), Σ x_i·x_j (upper triangle, row-major)]` — the Gramian
  * shape Spark MLlib's `RowMatrix.computeGramianMatrix` tree-aggregates
  * (spark/mllib/linalg/distributed/RowMatrix.scala, public source).
  *
  * This is the 100 TB design for covariance/PCA/least-squares: the
  * corpus is read ONCE, each task folds its rows into a constant
  * `1+d+d(d+1)/2`-double buffer (d=64 → 17 KB), and only those buffers
  * cross the exchange — the shuffle is O(partitions), independent of
  * row count. Everything downstream (covariance, eigenvector, ridge
  * normal equations) is driver-side arithmetic on the collected
  * moments, i.e. model-sized params-as-data.
  *
  * Null vectors contribute nothing; an all-null group evaluates to
  * null; a length mismatch inside a group throws (mixed-dimension
  * embedding tables are a data bug, not a fold case). */
case class GramMomentsAgg(
    vec: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[Array[Double]] with Serializable {

  override def children: Seq[Expression] = Seq(vec)
  override def nullable: Boolean = true
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    vec.dataType match {
      case ArrayType(FloatType, _) | ArrayType(DoubleType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult
          .TypeCheckSuccess
      case t =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult
          .TypeCheckFailure(
            s"gram_moments needs array<float|double>, got ${t.sql}")
    }

  @transient private lazy val vecIsFloat: Boolean = vec.dataType match {
    case ArrayType(FloatType, _) => true
    case _                       => false
  }

  override def createAggregationBuffer(): Array[Double] =
    Array.emptyDoubleArray

  override def update(buffer: Array[Double], input: InternalRow)
      : Array[Double] = {
    val v = vec.eval(input)
    if (v == null) return buffer
    val arr = v.asInstanceOf[ArrayData]
    val d = arr.numElements()
    val len = 1 + d + d * (d + 1) / 2
    val buf =
      if (buffer.length == 0) new Array[Double](len)
      else if (buffer.length != len)
        throw new IllegalArgumentException(
          s"gram_moments: vector of length $d in a group whose previous " +
            s"vectors implied buffer length ${buffer.length}, not $len")
      else buffer
    val f = vecIsFloat
    // one local copy so the triangle loop reads primitives, not ArrayData
    val x = new Array[Double](d)
    var i = 0
    while (i < d) {
      x(i) = if (f) arr.getFloat(i).toDouble else arr.getDouble(i)
      i += 1
    }
    buf(0) += 1.0
    var k = 1 + d
    i = 0
    while (i < d) {
      buf(1 + i) += x(i)
      val xi = x(i)
      var j = i
      while (j < d) { buf(k) += xi * x(j); j += 1; k += 1 }
      i += 1
    }
    buf
  }

  override def merge(a: Array[Double], b: Array[Double]): Array[Double] =
    if (a.length == 0) b
    else if (b.length == 0) a
    else if (a.length != b.length)
      throw new IllegalArgumentException(
        s"gram_moments: merging buffers of lengths ${a.length} and " +
          s"${b.length}")
    else {
      var i = 0
      while (i < a.length) { a(i) += b(i); i += 1 }
      a
    }

  override def eval(buffer: Array[Double]): Any =
    if (buffer.length == 0) null else new GenericArrayData(buffer)

  override def serialize(buffer: Array[Double]): Array[Byte] = {
    val bb = ByteBuffer.allocate(buffer.length * 8)
    var i = 0
    while (i < buffer.length) { bb.putDouble(buffer(i)); i += 1 }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Double] = {
    val bb = ByteBuffer.wrap(bytes)
    val out = new Array[Double](bytes.length / 8)
    var i = 0
    while (i < out.length) { out(i) = bb.getDouble(); i += 1 }
    out
  }

  override def withNewMutableAggBufferOffset(newOffset: Int)
      : GramMomentsAgg = copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int)
      : GramMomentsAgg = copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): GramMomentsAgg =
    copy(vec = newChildren(0))

  override def prettyName: String = "gram_moments"
}

object AggregateFunctions {
  /** Column-level API: per-group weighted vector sum `Σ w·vec`. */
  def weightedVecSum(w: Column, v: Column): Column =
    Bridge.toColumn(
      WeightedVecSumAgg(Bridge.toExpression(w), Bridge.toExpression(v))
        .toAggregateExpression())

  /** Column-level API: per-group top-k (id, score) pairs under
    * (score DESC, id ASC) — map-side-combinable ANN ranking. */
  def topKByScore(score: Column, id: Column, k: Int): Column =
    Bridge.toColumn(
      TopKByScoreAgg(Bridge.toExpression(score), Bridge.toExpression(id),
        k).toAggregateExpression())

  /** [[topKByScore]] with per-id dedup INSIDE the aggregation buffer
    * (ids keep their best score) — replaces the
    * `dropDuplicates(group, id)` + top-k two-exchange pattern with ONE
    * map-side-combinable stage. Exact replacement whenever duplicate
    * ids carry identical scores (the ANN candidate streams: the score
    * is a pure 6dp function of the id's stored vector). */
  def topKByScoreDistinct(score: Column, id: Column, k: Int): Column =
    Bridge.toColumn(
      TopKByScoreAgg(Bridge.toExpression(score), Bridge.toExpression(id),
        k, distinctIds = true).toAggregateExpression())

  /** Column-level API: flat `bases.length × width` Count-Min sketch of
    * whitespace-token counts over a text column; `split = false`
    * sketches whole rows (first `cap` bytes) instead of tokens. */
  def cmsSketch(text: Column, bases: Seq[Long], width: Int,
      split: Boolean = true, cap: Int = 8,
      family: String = "poly"): Column =
    Bridge.toColumn(
      CmsSketchAgg(Bridge.toExpression(text), bases, width, split, cap,
        family).toAggregateExpression())

  /** Column-level API: one-pass raw moments `[n, Σx, Σ x_i·x_j]` of a
    * vector column (upper-triangle Gramian — see [[GramMomentsAgg]]). */
  def gramMoments(v: Column): Column =
    Bridge.toColumn(
      GramMomentsAgg(Bridge.toExpression(v)).toAggregateExpression())
}
