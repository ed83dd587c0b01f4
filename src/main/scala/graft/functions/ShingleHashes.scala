package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** Word-shingle hashes in one pass: equivalent to
  *   transform(<3-word shingles of split(text,' ')>, s -> poly_hash(s))
  * but with ZERO intermediate strings.
  *
  * Works because a k-word shingle re-joined with single spaces is exactly
  * the original substring spanning those words: split(' ') segments are
  * the substrings between single-space separators (consecutive spaces
  * yield empty segments, and concat_ws keeps them, reproducing the
  * original spacing). So each shingle hash is a fold over a char range
  * of the source text. Fewer than k words -> one shingle = whole text,
  * matching the composed form's greatest(n-k+1, 1) convention.
  */
case class ShingleHashes(child: Expression, words: Int, base: Long, modulus: Long)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "shingle_hashes"

  override protected def nullSafeEval(input: Any): Any = {
    val s = input.asInstanceOf[UTF8String].toString
    // segment boundaries under split(' ') semantics
    val starts = scala.collection.mutable.ArrayBuffer(0)
    var i = 0
    while (i < s.length) {
      if (s.charAt(i) == ' ') starts += i + 1
      i += 1
    }
    val nSeg = starts.length
    val segEnd = (k: Int) => if (k + 1 < nSeg) starts(k + 1) - 1 else s.length
    val nShingles = math.max(nSeg - words + 1, 1)
    val out = new Array[Long](nShingles)
    var k = 0
    while (k < nShingles) {
      val lo = starts(k)
      val hi = segEnd(math.min(k + words - 1, nSeg - 1))
      var acc = 0L
      var j = lo
      while (j < hi) {
        val cp = s.codePointAt(j)
        acc = (acc * base + cp) % modulus
        j += Character.charCount(cp)
      }
      out(k) = acc
      k += 1
    }
    new GenericArrayData(out)
  }

  override protected def withNewChildInternal(newChild: Expression): ShingleHashes =
    copy(child = newChild)
}

object ShingleHashes {
  def register(spark: SparkSession, words: Int, base: Long, modulus: Long): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "shingle_hashes",
      exprs => ShingleHashes(exprs.head, words, base, modulus),
      "built-in")
}
