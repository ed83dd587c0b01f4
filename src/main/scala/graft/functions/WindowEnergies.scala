package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, BinaryType, DataType, LongType}

/** Per-window audio energy over a binary payload: out[k] = Σ amp² over
  * window k's bytes, amp = (byte & 0xff) − 128 (centered PCM), windows
  * of `window` bytes with a partial tail — i.e. equivalent to q230's
  *   transform(sequence(1, n), i -> conv(substr(hex(b), 2i−1, 2)) − 128)
  *   → slice per window → aggregate(…, acc + a·a)
  * but ONE pass over the raw bytes instead of two string ops per byte
  * on a 2n-char hex rendering (the round-9 plan audit called that out
  * as the remaining q230 cost). The hex detour existed only because no
  * built-in folds bytes; the byte loop IS the semantics.
  *
  * Window is an expression argument (foldable, evaluated at plan time —
  * `window_energies(bin, 64)`), so one parameter-free registration
  * serves every call site, the [[RollingHashes]] discipline. Codegen
  * calls the companion's eval via MODULE$ (no static forwarder is
  * emitted for a method named `eval` — the PolyHash Janino lesson), so
  * the surrounding stage stays whole-stage codegen. */
case class WindowEnergies(child: Expression, window: Int)
    extends UnaryExpression {
  require(window > 0, s"window_energies window must be positive, got $window")

  // analysis-time type error for a non-binary child (e.g. a string
  // column missing its encode()) instead of an executor-side
  // ClassCastException (ExpectsInputTypes is private[sql]-typed, so
  // the check is spelled directly)
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == BinaryType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"window_energies requires a BINARY child, got ${child.dataType.simpleString}")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "window_energies"

  override protected def nullSafeEval(input: Any): Any =
    WindowEnergies.eval(input.asInstanceOf[Array[Byte]], window)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.WindowEnergies$$.MODULE$$.eval($c, $window);")

  override protected def withNewChildInternal(newChild: Expression): WindowEnergies =
    copy(child = newChild)
}

object WindowEnergies {
  /** The one-pass byte fold both eval paths share. An empty payload
    * yields an empty array (no windows), matching the n > 0 filter the
    * caller applies either way. */
  def eval(bytes: Array[Byte], window: Int): GenericArrayData = {
    val n = bytes.length
    if (n == 0) return new GenericArrayData(Array.emptyLongArray)
    val out = new Array[Long]((n + window - 1) / window)
    var i = 0
    while (i < n) {
      val amp = (bytes(i) & 0xff) - 128L
      out(i / window) += amp * amp
      i += 1
    }
    new GenericArrayData(out)
  }

  def fromExprs(exprs: Seq[Expression]): WindowEnergies = {
    require(exprs.length == 2,
      s"window_energies(bin, window) requires 2 arguments, got ${exprs.length}")
    require(exprs(1).foldable,
      s"window_energies window must be a constant (foldable) expression, got: ${exprs(1).sql}")
    WindowEnergies(exprs.head,
      exprs(1).eval().asInstanceOf[Number].intValue())
  }

  /** Register `window_energies(bin, window)` for expr()/SQL.
    * Parameter-free and idempotent per session. */
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "window_energies", fromExprs, "built-in")
}
