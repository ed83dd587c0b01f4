package graft.functions

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.expressions.Aggregator

import scala.util.hashing.MurmurHash3

/** Mergeable count-min sketch over a string stream — the classic
  * heavy-hitter primitive for corpora too large to shuffle every token.
  *
  * The sketch is a depth x width matrix of counters; each update
  * increments one counter per row (row i's bucket chosen by an
  * independent hash). Point estimates take the MIN across rows, which
  * can only OVER-estimate (collisions add, never subtract) — so a
  * "candidates = estimate >= T" filter has no false negatives, and an
  * exact second pass over just the candidates recovers the true heavy
  * hitters. That two-pass shape is what makes this scale: pass 1
  * shuffles depth*width longs per partition (map-side partial merge,
  * data-size independent), pass 2 shuffles only tokens that survive the
  * broadcast-sketch prefilter instead of the whole stream.
  *
  * Buffer layout is one flat Array[Long] (row i bucket j at i*width+j)
  * so Spark's ObjectHashAggregate merges it without boxing.
  */
object CountMinSketch {

  /** Per-row hash seeds — arbitrary distinct constants, fixed so the
    * sketch is deterministic across runs and JVMs (MurmurHash3's output
    * is platform-stable for string input). */
  private val Seeds = Array(0x9747b28c, 0x1b873593, 0x85ebca6b, 0xc2b2ae35)

  def bucket(s: String, row: Int, width: Int): Int = {
    val h = MurmurHash3.stringHash(s, Seeds(row))
    // floorMod: stringHash is signed
    java.lang.Math.floorMod(h, width)
  }

  def update(sketch: Array[Long], s: String, depth: Int, width: Int): Unit = {
    var i = 0
    while (i < depth) { sketch(i * width + bucket(s, i, width)) += 1; i += 1 }
  }

  /** Point estimate: min across rows; >= the true count, always. */
  def estimate(sketch: Array[Long], s: String, depth: Int, width: Int): Long = {
    var mn = Long.MaxValue
    var i = 0
    while (i < depth) {
      val c = sketch(i * width + bucket(s, i, width))
      if (c < mn) mn = c
      i += 1
    }
    mn
  }

  /** Typed Aggregator form: reduce = update, merge = elementwise sum
    * (the sketch is a commutative monoid — partition-order invariant,
    * which the spec asserts). */
  final class Agg(depth: Int, width: Int)
      extends Aggregator[String, Array[Long], Array[Long]] {
    require(depth >= 1 && depth <= Seeds.length, s"depth 1..${Seeds.length}")
    override def zero: Array[Long] = new Array[Long](depth * width)
    override def reduce(b: Array[Long], s: String): Array[Long] = {
      update(b, s, depth, width); b
    }
    override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
      var i = 0
      while (i < a.length) { a(i) += b(i); i += 1 }
      a
    }
    override def finish(b: Array[Long]): Array[Long] = b
    // ExpressionEncoder for both: primitive long arrays serialize as
    // UnsafeArrayData (no boxing, no java serialization in the shuffle)
    override def bufferEncoder: Encoder[Array[Long]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
    override def outputEncoder: Encoder[Array[Long]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
  }
}
