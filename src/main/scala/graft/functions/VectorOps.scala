package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{DataType, DoubleType}

/** Native Catalyst expressions for embedding arithmetic over
  * Array[Float] columns: `vec_dot(a, b)` and `vec_dist2(a, b)`.
  *
  * Why expressions and not HOFs/UDFs: `aggregate(zip_with(...))` is
  * interpreted per element (a lambda call per float), and a Scala UDF
  * boxes each array into Seq[Float] per row — both are order-of-magnitude
  * slower on multi-million-pair joins. These run a primitive while-loop
  * directly over the columnar ArrayData inside whole-stage codegen, so a
  * similarity join stays one fused codegen stage end to end.
  *
  * Float determinism (hash parity with the DuckDB oracle): each element
  * is widened to DOUBLE and the products/squares are folded strictly
  * LEFT-TO-RIGHT — the same IEEE754 op sequence as the oracle's
  * list_reduce, so results are bit-identical, never merely close.
  */
case class VecDot(left: Expression, right: Expression) extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "vec_dot"

  override protected def nullSafeEval(a: Any, b: Any): Any =
    VectorOps.dot(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    // call through the companion MODULE$ (no static forwarder is emitted
    // for methods, and a bare class ref fails Janino → silent interpreted
    // fallback — the PolyHash lesson)
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.functions.VectorOps$$.MODULE$$.dot($a, $b);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): VecDot =
    copy(left = newLeft, right = newRight)
}

case class VecDist2(left: Expression, right: Expression) extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "vec_dist2"

  override protected def nullSafeEval(a: Any, b: Any): Any =
    VectorOps.dist2(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.functions.VectorOps$$.MODULE$$.dist2($a, $b);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): VecDist2 =
    copy(left = newLeft, right = newRight)
}

object VectorOps {
  /** Left-to-right double fold of elementwise products (== the oracle's
    * list_reduce over CAST(a[i] AS DOUBLE) * CAST(b[i] AS DOUBLE)). */
  def dot(a: ArrayData, b: ArrayData): Double = {
    val n = math.min(a.numElements(), b.numElements())
    var s = 0.0
    var i = 0
    while (i < n) { s += a.getFloat(i).toDouble * b.getFloat(i).toDouble; i += 1 }
    s
  }

  /** Left-to-right double fold of squared differences. */
  def dist2(a: ArrayData, b: ArrayData): Double = {
    val n = math.min(a.numElements(), b.numElements())
    var s = 0.0
    var i = 0
    while (i < n) {
      val d = a.getFloat(i).toDouble - b.getFloat(i).toDouble
      s += d * d
      i += 1
    }
    s
  }

  /** Register `vec_dot(a, b)` / `vec_dist2(a, b)` for expr()/SQL use.
    * Idempotent per session. */
  def register(spark: SparkSession): Unit = {
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "vec_dot", exprs => VecDot(exprs.head, exprs(1)), "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "vec_dist2", exprs => VecDist2(exprs.head, exprs(1)), "built-in")
  }
}
