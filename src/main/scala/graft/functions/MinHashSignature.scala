package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** MinHash signature in ONE pass: given an array of base hashes, return
  * [min_k (a_k*h + b_k) mod p] for all k hash functions simultaneously.
  *
  * The SQL-composable form — k separate array_min(transform(hs, ...)) —
  * walks the array k times through interpreted lambdas; this walks it
  * once with a primitive inner loop (the sketch cost at corpus scale is
  * exactly this loop). CodegenFallback: the expression itself is one
  * virtual call per row around a hand-written JVM loop, so whole-stage
  * codegen would only save the call overhead, not the loop.
  */
case class MinHashSignature(child: Expression,
    coefsA: Array[Long], coefsB: Array[Long], modulus: Long)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "minhash_sig"

  override protected def nullSafeEval(input: Any): Any = {
    val hs = input.asInstanceOf[ArrayData].toLongArray()
    val k = coefsA.length
    val mins = Array.fill(k)(Long.MaxValue)
    var i = 0
    while (i < hs.length) {
      val h = hs(i)
      var j = 0
      while (j < k) {
        val v = (coefsA(j) * h + coefsB(j)) % modulus
        if (v < mins(j)) mins(j) = v
        j += 1
      }
      i += 1
    }
    new GenericArrayData(mins)
  }

  override protected def withNewChildInternal(newChild: Expression): MinHashSignature =
    copy(child = newChild)
}

object MinHashSignature {
  /** Register `minhash_sig(hs)` with the engine's standard coefficients
    * (graft.ext.Dedup). Idempotent per session. */
  def register(spark: SparkSession, coefsA: Array[Long], coefsB: Array[Long],
               modulus: Long): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "minhash_sig",
      exprs => MinHashSignature(exprs.head, coefsA, coefsB, modulus),
      "built-in")
}
