package graft.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{DataType, DoubleType, FloatType, ArrayType}
import org.apache.spark.sql.graftbridge.Bridge

/** Native Catalyst expression for cosine similarity between two float-vector
  * columns.
  *
  * Rationale (brief: "Functions, not UDFs… a native Expression with doGenCode
  * beats a Scala UDF"): the composable alternative
  * `aggregate(zip_with(a, b, _*_), ...)` materializes an intermediate array
  * per row and evaluates three lambda loops; at 100 TB-scale ANN sweeps the
  * dot product is THE hot loop. This expression runs one fused primitive
  * loop over the two ArrayData buffers with no allocation, and generates
  * straight-line Java inside whole-stage codegen.
  *
  * Null/semantics: null if either side is null or lengths differ; 0.0 when
  * either norm is 0.
  */
case class CosineSimilarity(left: Expression, right: Expression)
    extends BinaryExpression with Serializable {

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    def ok(t: DataType): Boolean = t match {
      case ArrayType(FloatType, _) | ArrayType(DoubleType, _) => true
      case _                                                  => false
    }
    if (ok(left.dataType) && ok(right.dataType))
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"cosine_similarity needs array<float|double> inputs, got " +
          s"${left.dataType.sql}, ${right.dataType.sql}")
  }

  private def isFloat(e: Expression): Boolean = e.dataType match {
    case ArrayType(FloatType, _) => true
    case _                       => false
  }

  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    val n = a.numElements()
    if (n != b.numElements()) return null
    var dot = 0.0; var na = 0.0; var nb = 0.0
    val lf = isFloat(left); val rf = isFloat(right)
    var i = 0
    while (i < n) {
      val x = if (lf) a.getFloat(i).toDouble else a.getDouble(i)
      val y = if (rf) b.getFloat(i).toDouble else b.getDouble(i)
      dot += x * y; na += x * x; nb += y * y
      i += 1
    }
    if (na == 0.0 || nb == 0.0) 0.0
    else dot / (math.sqrt(na) * math.sqrt(nb))
  }

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode = {
    val lGet = if (isFloat(left)) "getFloat" else "getDouble"
    val rGet = if (isFloat(right)) "getFloat" else "getDouble"
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val dot = ctx.freshName("dot")
      val na = ctx.freshName("na")
      val nb = ctx.freshName("nb")
      s"""
         |int $n = $a.numElements();
         |if ($n != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  double $dot = 0.0, $na = 0.0, $nb = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    double x = (double) $a.$lGet($i);
         |    double y = (double) $b.$rGet($i);
         |    $dot += x * y; $na += x * x; $nb += y * y;
         |  }
         |  ${ev.value} = ($na == 0.0 || $nb == 0.0)
         |    ? 0.0 : $dot / (java.lang.Math.sqrt($na) * java.lang.Math.sqrt($nb));
         |}
       """.stripMargin
    })
  }

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): CosineSimilarity =
    copy(left = newLeft, right = newRight)
}

/** Count of positions where two ARRAY<LONG> columns hold equal values —
  * the MinHash signature-agreement estimator's hot loop. The composable
  * `aggregate(zip_with(a, b, _===_), ...)` form pays interpreted-lambda
  * cost per component per row (k×|pairs| evals across an LSH candidate
  * set); this is one fused primitive loop inside whole-stage codegen.
  * Null if either side is null or lengths differ. */
case class ArrayLongEqCount(left: Expression, right: Expression)
    extends BinaryExpression with Serializable {

  override def dataType: DataType =
    org.apache.spark.sql.types.IntegerType
  override def nullable: Boolean = true

  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    val n = a.numElements()
    if (n != b.numElements()) return null
    var c = 0
    var i = 0
    while (i < n) {
      if (a.getLong(i) == b.getLong(i)) c += 1
      i += 1
    }
    c
  }

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val c = ctx.freshName("c")
      s"""
         |int $n = $a.numElements();
         |if ($n != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  int $c = 0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    if ($a.getLong($i) == $b.getLong($i)) $c++;
         |  }
         |  ${ev.value} = $c;
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): ArrayLongEqCount =
    copy(left = newLeft, right = newRight)
}

/** Interpolated-ECDF transform (sklearn QuantileTransformer forward,
  * uniform output): map `v` to [0,1] by linear interpolation between the
  * fitted quantiles. Exact single-loop twin of the composable
  * `NumericKernel.applyQuantileTransform` formula —
  *   idx   = |{q : q <= v}| - 1, clamped to [0, n-2]
  *   pos   = (idx + clamp((v-q_lo)/(q_hi-q_lo), 0, 1)) / (n-1)
  * — which pays an interpreted lambda per QUANTILE per row in HOF form
  * (~101 evals/row for the reference's default n_quantiles). Null if
  * either input is null or the quantile array has < 2 elements. */
case class InterpolateEcdf(left: Expression, right: Expression)
    extends BinaryExpression
    with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
    with Serializable {

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true

  override def nullSafeEval(l: Any, r: Any): Any = {
    val v = l.asInstanceOf[Double]
    val qs = r.asInstanceOf[ArrayData]
    val n = qs.numElements()
    if (n < 2) return null
    var cnt = 0
    var i = 0
    while (i < n) {
      if (!qs.isNullAt(i) && qs.getDouble(i) <= v) cnt += 1
      i += 1
    }
    val loIdx = math.max(math.min(cnt - 1, n - 2), 0)
    val qlo = qs.getDouble(loIdx)
    val qhi = qs.getDouble(loIdx + 1)
    val frac = if (qhi == qlo) 0.0 else (v - qlo) / (qhi - qlo)
    val pos = (loIdx + math.min(math.max(frac, 0.0), 1.0)) / (n - 1)
    math.min(math.max(pos, 0.0), 1.0)
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): InterpolateEcdf =
    copy(left = newLeft, right = newRight)
}

/** Exact Jaccard similarity of two SORTED DISTINCT long arrays via a
  * single merge walk — O(m+n), zero allocation. The composable
  * `array_intersect`/`array_union` pair builds two hash sets and two
  * result arrays per row, which dominates the near-dup verify hot loop.
  * Returns 0.0 when both sides are empty (matching Dedup.jaccard); null
  * if either side is null. Inputs MUST be sorted distinct (the
  * *ShingleHashExpr family guarantees it). */
case class SortedLongJaccard(left: Expression, right: Expression)
    extends BinaryExpression
    with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
    with Serializable {

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true

  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    val m = a.numElements()
    val n = b.numElements()
    if (m + n == 0) return 0.0
    var i = 0; var j = 0; var inter = 0
    while (i < m && j < n) {
      val x = a.getLong(i); val y = b.getLong(j)
      if (x == y) { inter += 1; i += 1; j += 1 }
      else if (x < y) i += 1
      else j += 1
    }
    inter.toDouble / (m + n - inter)
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): SortedLongJaccard =
    copy(left = newLeft, right = newRight)
}

/** Random-hyperplane LSH bucket: sign bits of `nPlanes` dot products with
  * ±1-component pseudo-random hyperplanes. BIT-IDENTICAL to the
  * composable form
  * `aggregate(sequence(0, nPlanes-1), 0L, (acc,p) => acc*2 + (dot>=0))`
  * with `h_p[i] = pmod(xxhash64(p, i, seed), 2) == 0 ? 1 : -1` — but the
  * sign table depends only on (p, i, seed), so it's precomputed once and
  * each row costs nPlanes×dim multiply-adds instead of nPlanes×dim
  * interpreted lambda evaluations (~512/row for the 8×64 default). */
case class HyperplaneBucket(child: Expression, nPlanes: Int, dim: Int,
    seed: Long)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression
    with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
    with Serializable {

  override def dataType: DataType = org.apache.spark.sql.types.LongType
  override def nullable: Boolean = true

  // xxhash64(p, i, seed) == hashLong(seed, hashInt(i, hashInt(p, 42)))
  // (XxHash64 chains children left-to-right from seed 42; p and i are
  // IntegerType in the composable form).
  @transient private lazy val signs: Array[Double] =
    Array.tabulate(nPlanes * dim) { pi =>
      import org.apache.spark.sql.catalyst.expressions.XXH64.{hashInt, hashLong}
      val p = pi / dim
      val i = pi % dim
      val h = hashLong(seed, hashInt(i, hashInt(p, 42L)))
      // pmod(h, 2) == 0  ⟺  h even
      if ((h & 1L) == 0L) 1.0 else -1.0
    }

  private def isFloat: Boolean = child.dataType match {
    case ArrayType(FloatType, _) => true
    case _                       => false
  }

  override protected def nullSafeEval(input: Any): Any = {
    val v = input.asInstanceOf[ArrayData]
    // fail LOUD on a dim mismatch: the composable element_at form errored
    // under ANSI; silently bucketing a truncated dot product would send
    // vectors to recall-degraded buckets with no signal.
    if (v.numElements() < dim)
      throw new IllegalArgumentException(
        s"hyperplane_bucket: vector has ${v.numElements()} components, " +
          s"expected >= $dim")
    val n = dim
    val f = isFloat
    var bucket = 0L
    var p = 0
    while (p < nPlanes) {
      var dot = 0.0
      val base = p * dim
      var i = 0
      while (i < n) {
        val x = if (f) v.getFloat(i).toDouble else v.getDouble(i)
        dot += x * signs(base + i)
        i += 1
      }
      bucket = bucket * 2 + (if (dot >= 0) 1L else 0L)
      p += 1
    }
    bucket
  }

  override protected def withNewChildInternal(newChild: Expression)
      : HyperplaneBucket = copy(child = newChild)
}

/** Replay twin of [[HyperplaneBucket]] for CALLER-SUPPLIED ±1 sign
  * families (the q82/q83 md5-parity oracle family): integer-quantized
  * dot products — round(x·1e6) as long, exact Spark `round` semantics
  * via BigDecimal HALF_UP — so the bucket is bit-replayable in any
  * engine with the same decimal rounding. The signs travel as ONE
  * array field of the expression: the previous composable form built a
  * 256-term literal tree per plane set, which serialized into ~1.8 MiB
  * task binaries (attributed to q82/q83 in the round-5 bench tail). */
case class QuantizedSignBucket(child: Expression, signs: Seq[Int],
    nPlanes: Int)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression
    with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
    with Serializable {

  require(signs.nonEmpty && signs.length % nPlanes == 0,
    s"signs (${signs.length}) must split evenly across $nPlanes planes")
  private val dim = signs.length / nPlanes
  @transient private lazy val s: Array[Int] = signs.toArray

  override def dataType: DataType = org.apache.spark.sql.types.LongType
  override def nullable: Boolean = true

  private def isFloat: Boolean = child.dataType match {
    case ArrayType(FloatType, _) => true
    case _                       => false
  }

  override protected def nullSafeEval(input: Any): Any = {
    val v = input.asInstanceOf[ArrayData]
    if (v.numElements() < dim)
      throw new IllegalArgumentException(
        s"quantized_sign_bucket: vector has ${v.numElements()} " +
          s"components, expected >= $dim")
    val f = isFloat
    var bucket = 0L
    var p = 0
    while (p < nPlanes) {
      var dot = 0L
      val base = p * dim
      var i = 0
      while (i < dim) {
        val x = if (f) v.getFloat(i).toDouble else v.getDouble(i)
        // Spark round() semantics exactly: shortest-decimal BigDecimal,
        // HALF_UP — floor(x + 0.5) diverges on ...49999999999999994-style
        // doubles and would silently de-sync from the SQL oracle.
        val q = java.math.BigDecimal.valueOf(x * 1e6)
          .setScale(0, java.math.RoundingMode.HALF_UP).longValue()
        dot += q * s(base + i)
        i += 1
      }
      if (dot >= 0) bucket += 1L << (nPlanes - 1 - p)
      p += 1
    }
    bucket
  }

  override protected def withNewChildInternal(newChild: Expression)
      : QuantizedSignBucket = copy(child = newChild)
}

/** Nearest-centroid ids of a vector against a SMALL embedded centroid
  * table — IVF coarse assignment as one narrow projection.
  *
  * The composable form (`crossJoin(broadcast(centroids))` + window
  * `row_number` per vector id) expands the corpus k-fold and then
  * SHUFFLES that expansion by vector id just to rank k candidate rows
  * that were born co-located — at 100 TB the exchange wire volume
  * dwarfs the assignment arithmetic. The quantizer table is k-sized by
  * construction (a property of the data distribution, not the corpus),
  * so it rides into codegen as a reference object and assignment costs
  * exactly one k×dim scan per row, zero exchanges.
  *
  * Returns ARRAY<LONG>: the `nProbe` centroid ids ordered by cosine
  * similarity DESC, ties by centroid id ASC (iteration follows the
  * table's row order, which builders keep id-sorted) — identical
  * ordering to the window form it replaces, and the accumulation order
  * matches [[CosineSimilarity]] exactly so ranks agree bit-for-bit.
  * Null vector → null. Centroids whose dimension differs from the
  * input are skipped (the window form made them rank via a null
  * cosine — nonsense either way; builders guarantee equal dims). */
case class NearestCentroids(child: Expression, centroidIds: Array[Long],
    centroidVecs: Array[Array[Double]], nProbe: Int)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression
    with Serializable {

  require(centroidIds.length == centroidVecs.length && centroidIds.nonEmpty,
    "centroid ids/vecs must be non-empty and aligned")
  require(nProbe >= 1, s"nProbe must be >= 1: $nProbe")

  override def dataType: DataType =
    ArrayType(org.apache.spark.sql.types.LongType, containsNull = false)
  override def nullable: Boolean = true

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(FloatType, _) | ArrayType(DoubleType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult
          .TypeCheckSuccess
      case t =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult
          .TypeCheckFailure(
            s"nearest_centroids needs array<float|double>, got ${t.sql}")
    }

  private def isFloat: Boolean = child.dataType match {
    case ArrayType(FloatType, _) => true
    case _                       => false
  }

  override def nullSafeEval(v: Any): Any =
    NearestCentroids.compute(v.asInstanceOf[ArrayData], isFloat,
      centroidIds, centroidVecs, nProbe)

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode = {
    val idsRef = ctx.addReferenceObj("centIds", centroidIds, "long[]")
    val vecsRef =
      ctx.addReferenceObj("centVecs", centroidVecs, "double[][]")
    nullSafeCodeGen(ctx, ev, a =>
      s"""${ev.value} = graft.expressions.NearestCentroids$$.MODULE$$
         |  .compute($a, $isFloat, $idsRef, $vecsRef, $nProbe);
       """.stripMargin)
  }

  override protected def withNewChildInternal(newChild: Expression)
      : NearestCentroids = copy(child = newChild)
}

object NearestCentroids {
  /** One k×dim scan + top-nProbe selection; called per row from the
    * generated code (a single static call keeps the projection inside
    * the whole-stage span while the selection logic stays compiled
    * Scala, not string-built Java). */
  def compute(a: ArrayData, isFloat: Boolean, ids: Array[Long],
      cvs: Array[Array[Double]], nProbe: Int): ArrayData = {
    val n = a.numElements()
    val k = ids.length
    val cos = new Array[Double](k)
    val valid = new Array[Boolean](k)
    var c = 0
    while (c < k) {
      val cv = cvs(c)
      if (cv.length == n) {
        var dot = 0.0; var na = 0.0; var nb = 0.0
        var i = 0
        while (i < n) {
          val x = if (isFloat) a.getFloat(i).toDouble else a.getDouble(i)
          val y = cv(i)
          dot += x * y; na += x * x; nb += y * y
          i += 1
        }
        cos(c) = if (na == 0.0 || nb == 0.0) 0.0
          else dot / (math.sqrt(na) * math.sqrt(nb))
        valid(c) = true
      }
      c += 1
    }
    val m = math.min(nProbe, k)
    val out = new Array[Long](m)
    val used = new Array[Boolean](k)
    var filled = 0
    var continueSel = true
    while (filled < m && continueSel) {
      var best = -1
      var bestCos = Double.NegativeInfinity
      var j = 0
      while (j < k) {
        // ascending-id iteration + strict '>' keeps the lowest id on
        // ties — the window form's (cos DESC, centroid_id ASC) order
        if (valid(j) && !used(j) && cos(j) > bestCos) {
          best = j; bestCos = cos(j)
        }
        j += 1
      }
      if (best < 0) continueSel = false
      else {
        used(best) = true
        out(filled) = ids(best)
        filled += 1
      }
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(
      if (filled == m) out else out.take(filled))
  }
}

/** Product-quantization encode: split the vector into `m` contiguous
  * subspaces of `dsub` dims each and emit, per subspace, the index of the
  * nearest (squared-L2) codebook row — the FAISS PQ code layout
  * (Jégou et al., "Product Quantization for Nearest Neighbor Search",
  * TPAMI 2011). `codebooks` is m × ksub × dsub, a model-size object
  * (m·ksub·dsub doubles — KBs at any corpus size), so it rides into
  * codegen as a reference object and encoding is a pure NARROW
  * projection: one m·ksub·dsub fused loop per row, zero exchanges. At
  * 100 TB this is the point of PQ — the corpus re-expressed as m bytes
  * per vector (vs 4·dim for floats) that all later ANN scans read
  * instead of the raw embeddings.
  *
  * Ties keep the LOWEST code (ascending-c iteration, strict '<') —
  * the order `ORDER BY dist ASC, c ASC` replays in SQL. Null vector or
  * a length ≠ m·dsub → null (mirrors [[CosineSimilarity]]'s mismatch
  * contract). */
case class PqEncode(child: Expression,
    codebooks: Array[Array[Array[Double]]])
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression
    with Serializable {

  require(codebooks.nonEmpty && codebooks.forall(_.nonEmpty),
    "codebooks must be non-empty m × ksub × dsub")

  override def dataType: DataType =
    ArrayType(org.apache.spark.sql.types.IntegerType, containsNull = false)
  override def nullable: Boolean = true

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(FloatType, _) | ArrayType(DoubleType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult
          .TypeCheckSuccess
      case t =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult
          .TypeCheckFailure(
            s"pq_encode needs array<float|double>, got ${t.sql}")
    }

  private def isFloat: Boolean = child.dataType match {
    case ArrayType(FloatType, _) => true
    case _                       => false
  }

  override def nullSafeEval(v: Any): Any =
    PqEncode.compute(v.asInstanceOf[ArrayData], isFloat, codebooks)

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode = {
    val cbRef = ctx.addReferenceObj("pqCodebooks", codebooks, "double[][][]")
    nullSafeCodeGen(ctx, ev, a => s"""
       |${ev.value} = graft.expressions.PqEncode$$.MODULE$$
       |  .compute($a, $isFloat, $cbRef);
       |${ev.isNull} = (${ev.value} == null);
     """.stripMargin)
  }

  override protected def withNewChildInternal(newChild: Expression)
      : PqEncode = copy(child = newChild)
}

object PqEncode {
  def compute(a: ArrayData, isFloat: Boolean,
      cbs: Array[Array[Array[Double]]]): ArrayData = {
    val m = cbs.length
    val dsub = cbs(0)(0).length
    if (a.numElements() != m * dsub) return null
    val codes = new Array[Int](m)
    var s = 0
    while (s < m) {
      val cb = cbs(s)
      val base = s * dsub
      var best = 0
      var bestD = Double.MaxValue
      var c = 0
      while (c < cb.length) {
        val cv = cb(c)
        var d = 0.0
        var i = 0
        while (i < dsub) {
          val x = if (isFloat) a.getFloat(base + i).toDouble
                  else a.getDouble(base + i)
          val t = x - cv(i)
          d += t * t
          i += 1
        }
        if (d < bestD) { bestD = d; best = c }
        c += 1
      }
      codes(s) = best
      s += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(codes)
  }
}

/** Per-query ADC lookup table: a flat m·ksub array where entry
  * s·ksub + c is the squared-L2 distance between the query's subspace-s
  * slice and codebook row (s, c). Computed ONCE per query (queries are
  * broadcast-small by the ANN contract), then every corpus code row is
  * scored by m table lookups in [[PqAdcScore]] — the asymmetric-distance
  * computation of Jégou et al. §IV.A: the corpus side never touches
  * floats. Accumulation is i-ascending per entry, so the values replay
  * bit-for-bit as an ordered SQL sum. */
case class PqLut(child: Expression,
    codebooks: Array[Array[Array[Double]]])
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression
    with Serializable {

  require(codebooks.nonEmpty && codebooks.forall(_.nonEmpty),
    "codebooks must be non-empty m × ksub × dsub")

  override def dataType: DataType =
    ArrayType(DoubleType, containsNull = false)
  override def nullable: Boolean = true

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(FloatType, _) | ArrayType(DoubleType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult
          .TypeCheckSuccess
      case t =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult
          .TypeCheckFailure(
            s"pq_lut needs array<float|double>, got ${t.sql}")
    }

  private def isFloat: Boolean = child.dataType match {
    case ArrayType(FloatType, _) => true
    case _                       => false
  }

  override def nullSafeEval(v: Any): Any =
    PqLut.compute(v.asInstanceOf[ArrayData], isFloat, codebooks)

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode = {
    val cbRef = ctx.addReferenceObj("pqCodebooks", codebooks, "double[][][]")
    nullSafeCodeGen(ctx, ev, a => s"""
       |${ev.value} = graft.expressions.PqLut$$.MODULE$$
       |  .compute($a, $isFloat, $cbRef);
       |${ev.isNull} = (${ev.value} == null);
     """.stripMargin)
  }

  override protected def withNewChildInternal(newChild: Expression)
      : PqLut = copy(child = newChild)
}

object PqLut {
  def compute(a: ArrayData, isFloat: Boolean,
      cbs: Array[Array[Array[Double]]]): ArrayData = {
    val m = cbs.length
    val ksub = cbs(0).length
    val dsub = cbs(0)(0).length
    if (a.numElements() != m * dsub) return null
    val lut = new Array[Double](m * ksub)
    var s = 0
    while (s < m) {
      val cb = cbs(s)
      val base = s * dsub
      var c = 0
      while (c < ksub) {
        val cv = cb(c)
        var d = 0.0
        var i = 0
        while (i < dsub) {
          val x = if (isFloat) a.getFloat(base + i).toDouble
                  else a.getDouble(base + i)
          val t = x - cv(i)
          d += t * t
          i += 1
        }
        lut(s * ksub + c) = d
        c += 1
      }
      s += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(lut)
  }
}

/** ADC score: Σ_s lut[s·ksub + codes[s]] — the PQ approximate squared-L2
  * distance between a query (via its [[PqLut]] table) and a PQ-encoded
  * corpus vector. THE hot loop of a PQ scan (m lookups per corpus row
  * per query, no float math), fully inlined into whole-stage codegen.
  * s-ascending accumulation replays as an ordered SQL sum. Null if
  * either side is null or the lut length isn't a multiple of the code
  * length; a code outside [0, ksub) → null (corrupt input, not a
  * distance). */
case class PqAdcScore(left: Expression, right: Expression)
    extends BinaryExpression with Serializable {

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(org.apache.spark.sql.types.IntegerType, _),
            ArrayType(DoubleType, _)) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult
          .TypeCheckSuccess
      case (l, r) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult
          .TypeCheckFailure(
            s"pq_adc_score needs (array<int> codes, array<double> lut), " +
              s"got ${l.sql}, ${r.sql}")
    }

  override def nullSafeEval(l: Any, r: Any): Any = {
    val codes = l.asInstanceOf[ArrayData]
    val lut = r.asInstanceOf[ArrayData]
    val m = codes.numElements()
    if (m == 0 || lut.numElements() % m != 0) return null
    val ksub = lut.numElements() / m
    var acc = 0.0
    var s = 0
    while (s < m) {
      val c = codes.getInt(s)
      if (c < 0 || c >= ksub) return null
      acc += lut.getDouble(s * ksub + c)
      s += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (codes, lut) => {
      val m = ctx.freshName("m")
      val ksub = ctx.freshName("ksub")
      val acc = ctx.freshName("acc")
      val s = ctx.freshName("s")
      val c = ctx.freshName("c")
      val bad = ctx.freshName("bad")
      s"""
         |int $m = $codes.numElements();
         |if ($m == 0 || $lut.numElements() % $m != 0) {
         |  ${ev.isNull} = true;
         |} else {
         |  int $ksub = $lut.numElements() / $m;
         |  double $acc = 0.0;
         |  boolean $bad = false;
         |  for (int $s = 0; $s < $m; $s++) {
         |    int $c = $codes.getInt($s);
         |    if ($c < 0 || $c >= $ksub) { $bad = true; break; }
         |    $acc += $lut.getDouble($s * $ksub + $c);
         |  }
         |  if ($bad) { ${ev.isNull} = true; } else { ${ev.value} = $acc; }
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): PqAdcScore =
    copy(left = newLeft, right = newRight)
}

object VectorFunctions {
  /** Column-level API: cosine similarity of two vector columns. */
  def cosineSimilarity(a: Column, b: Column): Column =
    Bridge.toColumn(CosineSimilarity(
      Bridge.toExpression(a), Bridge.toExpression(b)))

  /** Column-level API: # of equal components of two long-array columns. */
  def arrayLongEqCount(a: Column, b: Column): Column =
    Bridge.toColumn(ArrayLongEqCount(
      Bridge.toExpression(a), Bridge.toExpression(b)))

  /** Column-level API: interpolated-ECDF quantile transform. */
  def interpolateEcdf(v: Column, quantiles: Column): Column =
    Bridge.toColumn(InterpolateEcdf(
      Bridge.toExpression(v), Bridge.toExpression(quantiles)))

  /** Column-level API: merge-walk Jaccard of sorted distinct long
    * arrays. */
  def sortedLongJaccard(a: Column, b: Column): Column =
    Bridge.toColumn(SortedLongJaccard(
      Bridge.toExpression(a), Bridge.toExpression(b)))

  /** Column-level API: random-hyperplane LSH bucket. */
  def hyperplaneBucket(v: Column, nPlanes: Int, dim: Int, seed: Long)
      : Column =
    Bridge.toColumn(HyperplaneBucket(Bridge.toExpression(v), nPlanes, dim,
      seed))

  /** Column-level API: top-nProbe nearest-centroid ids (IVF coarse
    * assignment as a narrow projection). `ids`/`vecs` must be aligned
    * and id-sorted (tie-break order). */
  def nearestCentroids(v: Column, ids: Array[Long],
      vecs: Array[Array[Double]], nProbe: Int): Column =
    Bridge.toColumn(NearestCentroids(Bridge.toExpression(v), ids, vecs,
      nProbe))

  /** Column-level API: quantized caller-signed LSH bucket (replay). */
  def quantizedSignBucket(v: Column, signs: Seq[Int], nPlanes: Int)
      : Column =
    Bridge.toColumn(QuantizedSignBucket(Bridge.toExpression(v), signs,
      nPlanes))

  /** Column-level API: PQ codes (m nearest-subcentroid indices). */
  def pqEncode(v: Column, codebooks: Array[Array[Array[Double]]]): Column =
    Bridge.toColumn(PqEncode(Bridge.toExpression(v), codebooks))

  /** Column-level API: per-query ADC lookup table (flat m·ksub). */
  def pqLut(v: Column, codebooks: Array[Array[Array[Double]]]): Column =
    Bridge.toColumn(PqLut(Bridge.toExpression(v), codebooks))

  /** Column-level API: ADC approximate squared-L2 from codes + lut. */
  def pqAdcScore(codes: Column, lut: Column): Column =
    Bridge.toColumn(PqAdcScore(Bridge.toExpression(codes),
      Bridge.toExpression(lut)))
}
