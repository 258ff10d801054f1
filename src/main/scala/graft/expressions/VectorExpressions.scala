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

object VectorFunctions {
  /** Column-level API: cosine similarity of two vector columns. */
  def cosineSimilarity(a: Column, b: Column): Column =
    Bridge.toColumn(CosineSimilarity(
      Bridge.toExpression(a), Bridge.toExpression(b)))

  /** Column-level API: # of equal components of two long-array columns. */
  def arrayLongEqCount(a: Column, b: Column): Column =
    Bridge.toColumn(ArrayLongEqCount(
      Bridge.toExpression(a), Bridge.toExpression(b)))
}
