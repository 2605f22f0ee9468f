package graft.functions

import org.apache.spark.sql.{Column, GraftBridge}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{DataType, DoubleType}

/** Native Catalyst expression for the embedding hot path: a codegen'd
  * sequential dot product over two `array<double>` columns.
  *
  * Spark's higher-order functions (`aggregate`/`zip_with`) are
  * CodegenFallback — every lambda step is interpreted, which made the
  * HOF-based fold the bottleneck of the ANN/near-dup operators. This
  * expression generates a tight primitive loop inside whole-stage codegen
  * instead. Summation stays strictly sequential (element 0..n-1), the same
  * fold order as the interpreted version and the DuckDB oracle's
  * `list_reduce`, so results are bit-identical.
  */
case class DotProduct(left: Expression, right: Expression)
    extends BinaryExpression {

  // call sites guarantee array<double> inputs (explicit cast of the vector
  // columns); no ImplicitCastInputTypes — AbstractDataType is private[sql]
  override def dataType: DataType = DoubleType
  override def prettyName: String = "dot_product"

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var s = 0.0
    var i = 0
    while (i < n) {
      if (!x.isNullAt(i) && !y.isNullAt(i)) s += x.getDouble(i) * y.getDouble(i)
      i += 1
    }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val s = ctx.freshName("s")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $s = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  if (!$a.isNullAt($i) && !$b.isNullAt($i)) {
         |    $s += $a.getDouble($i) * $b.getDouble($i);
         |  }
         |}
         |${ev.value} = $s;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DotProduct =
    copy(left = newLeft, right = newRight)
}

object VectorFunctions {
  /** Column wrapper: dot product of two double-array columns. */
  def dot_product(a: Column, b: Column): Column =
    GraftBridge.column(DotProduct(GraftBridge.expression(a), GraftBridge.expression(b)))
}
