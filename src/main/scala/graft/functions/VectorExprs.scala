package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graft.ColumnShim
import org.apache.spark.sql.types._

/** Native codegen dot product over two `array<float>` columns, accumulated
  * in double left-to-right (same fold order as the DuckDB oracle's
  * `list_dot_product(CAST(… AS DOUBLE[]), …)`, so results hash-compare).
  *
  * This replaces the `aggregate(zip_with(…))` higher-order-function
  * formulation in the similarity hot path: HOFs are CodegenFallback
  * (interpreted, per-element lambda dispatch), which made the brute-force
  * 250k-pair cosine scan ~100× slower than this loop. A custom Expression
  * with doGenCode is the preferred extension point before any UDF.
  */
case class FloatVecDot(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType

  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (ArrayType(FloatType, _), ArrayType(FloatType, _)) => TypeCheckResult.TypeCheckSuccess
    case _ => TypeCheckResult.TypeCheckFailure(
      s"float_vec_dot expects (array<float>, array<float>), got (${left.dataType}, ${right.dataType})")
  }

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var s = 0.0
    var i = 0
    while (i < n) { s += x.getFloat(i).toDouble * y.getFloat(i).toDouble; i += 1 }
    s
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (x, y) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val s = ctx.freshName("s")
      s"""
         |int $n = Math.min($x.numElements(), $y.numElements());
         |double $s = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $s += ((double) $x.getFloat($i)) * ((double) $y.getFloat($i));
         |}
         |${ev.value} = $s;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): FloatVecDot =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "float_vec_dot"
}

/** Native codegen dot product of an `array<float>` column against an
  * `array<double>` column (in practice a literal hyperplane/centroid),
  * accumulated in double left-to-right — bit-identical to the
  * `aggregate(zip_with(...))` HOF formulation it replaces (each float is
  * promoted to double before the multiply, partial sums fold in index
  * order) and to the DuckDB oracle's
  * `list_dot_product(CAST(e AS DOUBLE[]), CAST([literals] AS DOUBLE[]))`.
  *
  * Exists for the LSH-bucket / IVF-cell assignment projections: their dots
  * ran through `aggregate(zip_with(...))`, which is CodegenFallback — per
  * element, two lambda-variable boxes and an interpreted multiply-add. At 8
  * planes (or 16 centroids) × 64 dims that is ~1k interpreted lambda
  * dispatches per row in what should be a map-only projection. */
case class FloatDoubleVecDot(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType

  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (ArrayType(FloatType, _), ArrayType(DoubleType, _)) => TypeCheckResult.TypeCheckSuccess
    case _ => TypeCheckResult.TypeCheckFailure(
      s"float_double_vec_dot expects (array<float>, array<double>), got (${left.dataType}, ${right.dataType})")
  }

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var s = 0.0
    var i = 0
    while (i < n) { s += x.getFloat(i).toDouble * y.getDouble(i); i += 1 }
    s
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (x, y) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val s = ctx.freshName("s")
      s"""
         |int $n = Math.min($x.numElements(), $y.numElements());
         |double $s = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $s += ((double) $x.getFloat($i)) * $y.getDouble($i);
         |}
         |${ev.value} = $s;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): FloatDoubleVecDot =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "float_double_vec_dot"
}

object VectorFunctions {
  /** dot(a, b) for array<float> columns — whole-stage-codegen'd. */
  def fdot(a: Column, b: Column): Column =
    ColumnShim.column(FloatVecDot(ColumnShim.expression(a), ColumnShim.expression(b)))

  /** dot(a: array<float>, b: array<double>) — whole-stage-codegen'd, double
    * accumulation in index order (see [[FloatDoubleVecDot]]). */
  def fddot(a: Column, b: Column): Column =
    ColumnShim.column(FloatDoubleVecDot(ColumnShim.expression(a), ColumnShim.expression(b)))

  /** L2 norm of an array<float> column. */
  def fnorm(a: Column): Column = org.apache.spark.sql.functions.sqrt(fdot(a, a))
}
