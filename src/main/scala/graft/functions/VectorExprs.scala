package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Native Catalyst expressions for the embedding hot paths.
  *
  * The similarity family (SimilarityOps) originally computed dot
  * products with `aggregate(zip_with(...))`: Spark evaluates
  * higher-order-function lambdas interpreted, per array element, per
  * row — measured 122.6 s to verify candidates from a 2,000-vector
  * corpus at sf0.1. These expressions run the identical sequential
  * fold (same element order, same double arithmetic, so results stay
  * bit-exact against the DuckDB oracles) as a compiled while-loop
  * inside whole-stage codegen.
  *
  * The oracle twins mirror the fold as PER-ROW list folds
  * (`list_sum(list_transform(...))` over the array), not as SQL
  * `SUM()` over unnested element rows: a parallel hash aggregation
  * gives no accumulation-order guarantee, and IEEE addition is
  * non-associative — an unordered sum can drift by an ulp run-to-run
  * and flip a sign-bit bucket or a rounding boundary. A per-row list
  * fold is single-threaded and index-ordered by construction.
  */
abstract class BinaryVectorFold extends BinaryExpression {
  override def dataType: DataType = DoubleType

  // A null array ELEMENT nulls the result even when both array inputs
  // are non-nullable, so the default left.nullable || right.nullable
  // would under-report: codegen would pin isNull to a FalseLiteral and
  // the `isNull = true` assignment below would reference an undeclared
  // variable (janino compile failure), while the interpreted fallback
  // would hand null to a non-nullable projection slot.
  override def nullable: Boolean = true

  private def elemType(e: Expression): Option[DataType] = e.dataType match {
    case ArrayType(t @ (FloatType | DoubleType), _) => Some(t)
    case _                                          => None
  }

  override def checkInputDataTypes(): TypeCheckResult =
    if (elemType(left).isDefined && elemType(right).isDefined)
      TypeCheckResult.TypeCheckSuccess
    else
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires two array<float|double> arguments, " +
          s"got ${left.dataType.sql} and ${right.dataType.sql}")

  /** One fold step on a pair of elements (already widened to double). */
  protected def combine(x: Double, y: Double): Double

  /** Java source for [[combine]]; `x`/`y` are double-typed variables. */
  protected def combineCode(x: String, y: String): String

  // A null ELEMENT nulls the whole result — the semantics of folding a
  // null through `acc + v` in the HOF formulation this replaces.
  override def nullSafeEval(a: Any, b: Any): Any = {
    val arr1 = a.asInstanceOf[ArrayData]
    val arr2 = b.asInstanceOf[ArrayData]
    val float1 = elemType(left).contains(FloatType)
    val float2 = elemType(right).contains(FloatType)
    val n = math.min(arr1.numElements(), arr2.numElements())
    var acc = 0.0
    var i = 0
    while (i < n) {
      if (arr1.isNullAt(i) || arr2.isNullAt(i)) return null
      val x = if (float1) arr1.getFloat(i).toDouble else arr1.getDouble(i)
      val y = if (float2) arr2.getFloat(i).toDouble else arr2.getDouble(i)
      acc += combine(x, y)
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (arr1, arr2) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      val x = ctx.freshName("x")
      val y = ctx.freshName("y")
      val get1 =
        if (elemType(left).contains(FloatType)) s"(double) $arr1.getFloat($i)"
        else s"$arr1.getDouble($i)"
      val get2 =
        if (elemType(right).contains(FloatType)) s"(double) $arr2.getFloat($i)"
        else s"$arr2.getDouble($i)"
      s"""
         |final int $n = java.lang.Math.min($arr1.numElements(), $arr2.numElements());
         |double $acc = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  if ($arr1.isNullAt($i) || $arr2.isNullAt($i)) { ${ev.isNull} = true; break; }
         |  final double $x = $get1;
         |  final double $y = $get2;
         |  $acc += ${combineCode(x, y)};
         |}
         |${ev.value} = $acc;
         |""".stripMargin
    })
}

/** Sequential-fold dot product: Σ aᵢ·bᵢ (elements widened to double). */
case class DotProduct(left: Expression, right: Expression) extends BinaryVectorFold {
  override def prettyName: String = "graft_dot"
  override protected def combine(x: Double, y: Double): Double = x * y
  override protected def combineCode(x: String, y: String): String = s"$x * $y"
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Sequential-fold squared Euclidean distance: Σ (aᵢ−bᵢ)². */
case class SquaredL2(left: Expression, right: Expression) extends BinaryVectorFold {
  override def prettyName: String = "graft_sql2"
  override protected def combine(x: Double, y: Double): Double = (x - y) * (x - y)
  override protected def combineCode(x: String, y: String): String =
    s"($x - $y) * ($x - $y)"
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object VectorFunctions {
  import org.apache.spark.sql.graftbridge.ColumnBridge

  /** Compiled Σ aᵢ·bᵢ over two array<float|double> columns. */
  def dotProduct(a: Column, b: Column): Column =
    ColumnBridge.column(DotProduct(ColumnBridge.expression(a),
      ColumnBridge.expression(b)))

  /** Compiled Σ (aᵢ−bᵢ)² over two array<float|double> columns. */
  def squaredL2(a: Column, b: Column): Column =
    ColumnBridge.column(SquaredL2(ColumnBridge.expression(a),
      ColumnBridge.expression(b)))
}
