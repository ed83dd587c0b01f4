package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** Character-level rolling window hashes: out[i] = poly_hash of the
  * W-code-point window starting at code point i, for every position
  * (stride 1), i.e. equivalent to
  *   transform(sequence(1, n-W+1), i -> poly_hash(substr(text, i, W)))
  * but O(n) instead of O(n·W): each next window's hash is derived from
  * the previous by subtracting the departing code point's base^(W-1)
  * term and appending the arriving one (the Rabin-Karp update). The
  * same accumulate step as [[PolyHash]] (code points, not UTF-16 units)
  * keeps parity with the oracle's per-window list_reduce.
  *
  * Window/base/modulus are EXPRESSION arguments (foldable, evaluated at
  * plan time — `rolling_hashes(text, 40, 31, 1000000007)`), so a single
  * parameter-free registration serves every call site; two queries in
  * one session with different windows can never clash on registration
  * state (each plan carries its own constants).
  *
  * Codegen: the O(n) roll runs inside the generated projection via the
  * companion's `eval` (MODULE$ call — Scala emits no static forwarder
  * for a method named `eval`, the PolyHash Janino lesson), so the
  * surrounding stage stays whole-stage codegen instead of dropping to
  * the interpreted CodegenFallback path per row.
  *
  * Strings shorter than W code points yield an EMPTY array (there is no
  * complete window), unlike ShingleHashes' whole-text fallback —
  * exact-substring semantics has no meaningful partial window.
  */
case class RollingHashes(child: Expression, window: Int, base: Long, modulus: Long)
    extends UnaryExpression {
  require(window > 0, s"rolling_hashes window must be positive, got $window")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "rolling_hashes"

  override protected def nullSafeEval(input: Any): Any =
    RollingHashes.eval(input.asInstanceOf[UTF8String].toString, window, base, modulus)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.RollingHashes$$.MODULE$$.eval(" +
        s"$c.toString(), $window, ${base}L, ${modulus}L);")

  override protected def withNewChildInternal(newChild: Expression): RollingHashes =
    copy(child = newChild)
}

object RollingHashes {
  /** The O(n) Rabin-Karp roll both eval paths share. */
  def eval(s: String, window: Int, base: Long, modulus: Long): GenericArrayData = {
    // decode once: code-point array (the roll steps over code points)
    val cps = s.codePoints().toArray
    val n = cps.length
    if (n < window) return new GenericArrayData(Array.emptyLongArray)
    // base^(W-1) mod p, for the departing term
    var powW1 = 1L
    var e = 0
    while (e < window - 1) { powW1 = (powW1 * base) % modulus; e += 1 }
    val out = new Array[Long](n - window + 1)
    var acc = 0L
    var i = 0
    while (i < window) { acc = (acc * base + cps(i)) % modulus; i += 1 }
    out(0) = acc
    var p = 1
    while (p <= n - window) {
      // remove cps(p-1), append cps(p+window-1); keep everything in [0, p)
      val dep = (cps(p - 1) * powW1) % modulus
      acc = ((acc - dep) % modulus + modulus) % modulus
      acc = (acc * base + cps(p + window - 1)) % modulus
      out(p) = acc
      p += 1
    }
    new GenericArrayData(out)
  }

  def fromExprs(exprs: Seq[Expression]): RollingHashes = {
    require(exprs.length == 4,
      s"rolling_hashes(text, window, base, modulus) requires 4 arguments, got ${exprs.length}")
    // the parameters are eval()'d at plan time, which is only sound for
    // foldable expressions — reject a column reference here with a clear
    // message instead of an opaque unresolved-attribute eval crash
    exprs.drop(1).zip(Seq("window", "base", "modulus")).foreach { case (e, n) =>
      require(e.foldable,
        s"rolling_hashes $n must be a constant (foldable) expression, got: ${e.sql}")
    }
    RollingHashes(exprs.head,
      exprs(1).eval().asInstanceOf[Number].intValue(),
      exprs(2).eval().asInstanceOf[Number].longValue(),
      exprs(3).eval().asInstanceOf[Number].longValue())
  }

  /** Register `rolling_hashes(str, window, base, mod)` for expr()/SQL.
    * Parameter-free and idempotent per session. */
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "rolling_hashes", fromExprs, "built-in")
}
