package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** Per-string character histogram moments in ONE pass:
  * `char_simpson(text)` = [n, Σ c²] over the code-point frequency
  * histogram c — the exact-rational basis of the Gini–Simpson diversity
  * index 1 − Σc²/n². Shannon entropy is the textbook diversity signal
  * but its log never hash-matches across engines; the Simpson collision
  * probability carries the same low-diversity ordering as a pure integer
  * pair, so the gate can be exact.
  *
  * The relational equivalent (explode one row per CHARACTER, then a
  * (doc, char) aggregate) puts n rows per document through a generator
  * and a corpus-character-sized shuffle — at 100 TB that's the whole
  * corpus exploded ~500×. This expression folds the histogram inside
  * the projection: O(n) per row, zero intermediate rows, ASCII counted
  * in a flat 128-slot array (the hot path — almost all pretraining text)
  * with a spill map for the rest.
  *
  * Codegen: the fold runs inside the generated projection via the
  * companion's MODULE$ call (the PolyHash/RollingHashes Janino lesson),
  * keeping the surrounding stage whole-stage-codegen.
  */
case class CharSimpson(child: Expression) extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "char_simpson"

  override protected def nullSafeEval(input: Any): Any =
    CharSimpson.eval(input.asInstanceOf[UTF8String].toString)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.CharSimpson$$.MODULE$$.eval($c.toString());")

  override protected def withNewChildInternal(newChild: Expression): CharSimpson =
    copy(child = newChild)
}

object CharSimpson {
  /** One-pass code-point histogram → [n, Σ c²]. */
  def eval(s: String): GenericArrayData = {
    val ascii = new Array[Long](128)
    var other: java.util.HashMap[Integer, Long] = null
    var n = 0L
    var i = 0
    while (i < s.length) {
      val cp = s.codePointAt(i)
      if (cp < 128) ascii(cp) += 1
      else {
        if (other == null) other = new java.util.HashMap[Integer, Long]()
        other.merge(cp, 1L, (a, b) => a + b)
      }
      n += 1
      i += Character.charCount(cp)
    }
    var c2 = 0L
    i = 0
    while (i < 128) { c2 += ascii(i) * ascii(i); i += 1 }
    if (other != null) other.values.forEach(v => c2 += v * v)
    new GenericArrayData(Array(n, c2))
  }

  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "char_simpson", exprs => CharSimpson(exprs.head), "built-in")
}
