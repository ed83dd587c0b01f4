package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
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
  * Strings shorter than W code points yield an EMPTY array (there is no
  * complete window), unlike ShingleHashes' whole-text fallback —
  * exact-substring semantics has no meaningful partial window.
  */
case class RollingHashes(child: Expression, window: Int, base: Long, modulus: Long)
    extends UnaryExpression with CodegenFallback {
  require(window > 0, s"rolling_hashes window must be positive, got $window")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "rolling_hashes"

  override protected def nullSafeEval(input: Any): Any = {
    val s = input.asInstanceOf[UTF8String].toString
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

  override protected def withNewChildInternal(newChild: Expression): RollingHashes =
    copy(child = newChild)
}

object RollingHashes {
  def register(spark: SparkSession, window: Int, base: Long, modulus: Long): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "rolling_hashes",
      exprs => RollingHashes(exprs.head, window, base, modulus),
      "built-in")
}
