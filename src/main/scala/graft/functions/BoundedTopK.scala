package graft.functions

import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.{Column, Encoder}
import org.apache.spark.sql.functions.udaf

/** One scored candidate: similarity + id. Comparator everywhere is
  * (cos DESC, id ASC) — a strict total order (ids are unique), so the
  * aggregation result is independent of partial-merge order. */
case class ScoredCand(cos: Double, id: Long)

/** Bounded-heap top-k by score: a typed Aggregator whose buffer is a
  * DESC-sorted list of at most k candidates.
  *
  * Why this beats a `row_number` window for per-query top-k (q17):
  * WindowExec must hash-partition and SORT the full scored relation —
  * |Q|·|C| rows through one range/sort shuffle, spilling at scale. This
  * aggregator reduces each scan task's pairs into k-row partials
  * map-side (ObjectHashAggregate partial → final), so the shuffle
  * carries |Q|·k rows instead of |Q|·|C| and nothing is ever sorted but
  * k-element buffers. State per key is O(k) regardless of corpus size —
  * the same bounded-memory argument as q34's TakeOrderedAndProject,
  * applied per key.
  *
  * Determinism: insertion and merge respect the (cos DESC, id ASC)
  * total order, so any partial grouping yields the same top-k — no
  * dependence on row arrival order (asserted by the merge-invariance
  * spec). */
class TopKByScore(k: Int)
    extends Aggregator[ScoredCand, List[ScoredCand], Seq[ScoredCand]] {
  require(k > 0, s"top-k needs k > 0, got $k")

  // TOTAL order via Double.compare, not the IEEE > operator: a NaN
  // score (0/0 cosine from a zero-norm vector) compares false under >
  // in both directions, which would wedge it at buf.last and silently
  // drop every later candidate. Double.compare ranks NaN greatest —
  // the same total order Spark's own DESC sort and the DuckDB oracle
  // use — so degenerate vectors rank first instead of corrupting the
  // heap, and parity with the window formulation this replaced holds.
  private def better(a: ScoredCand, b: ScoredCand): Boolean = {
    val c = java.lang.Double.compare(a.cos, b.cos)
    c > 0 || (c == 0 && a.id < b.id)
  }

  override def zero: List[ScoredCand] = Nil

  override def reduce(buf: List[ScoredCand], in: ScoredCand): List[ScoredCand] = {
    // skip the common case without allocation: buffer full and the new
    // candidate loses to the current k-th
    if (buf.lengthCompare(k) >= 0 && !better(in, buf.last)) buf
    else {
      val (keep, rest) = buf.span(better(_, in))
      (keep ::: in :: rest).take(k)
    }
  }

  override def merge(a: List[ScoredCand], b: List[ScoredCand]): List[ScoredCand] = {
    // merge of two DESC-sorted lists, truncated at k
    val out = List.newBuilder[ScoredCand]
    var (x, y, n) = (a, b, 0)
    while (n < k && (x.nonEmpty || y.nonEmpty)) {
      if (y.isEmpty || (x.nonEmpty && better(x.head, y.head))) {
        out += x.head; x = x.tail
      } else { out += y.head; y = y.tail }
      n += 1
    }
    out.result()
  }

  override def finish(buf: List[ScoredCand]): Seq[ScoredCand] = buf

  override def bufferEncoder: Encoder[List[ScoredCand]] =
    ExpressionEncoder[List[ScoredCand]]()
  override def outputEncoder: Encoder[Seq[ScoredCand]] =
    ExpressionEncoder[Seq[ScoredCand]]()
}

/** One scored term: score + the term text. Comparator is
  * (score DESC, term ASC) — unique terms per group make it a strict
  * total order, so results are partial-merge-order independent. */
case class ScoredTerm(score: Double, term: String)

/** String-payload sibling of [[TopKByScore]] (same bounded-heap shape,
  * same shuffle argument: k-row partials map-side, |groups|·k rows
  * through the exchange, nothing sorts the scored relation). Exists
  * because the (Double, Long) buffer can't carry a token — and hashing
  * the token to a long would need a join back to recover it, which is
  * exactly the extra shuffle this aggregator removes. */
class TopTermsByScore(k: Int)
    extends Aggregator[ScoredTerm, List[ScoredTerm], Seq[ScoredTerm]] {
  require(k > 0, s"top-k needs k > 0, got $k")

  // Double.compare total order (NaN greatest) + String compareTo: same
  // rationale as TopKByScore; String order is binary/UTF-16 code-unit,
  // which equals DuckDB's default binary collation on ASCII tokens.
  private def better(a: ScoredTerm, b: ScoredTerm): Boolean = {
    val c = java.lang.Double.compare(a.score, b.score)
    c > 0 || (c == 0 && a.term < b.term)
  }

  override def zero: List[ScoredTerm] = Nil

  override def reduce(buf: List[ScoredTerm], in: ScoredTerm): List[ScoredTerm] =
    if (buf.lengthCompare(k) >= 0 && !better(in, buf.last)) buf
    else {
      val (keep, rest) = buf.span(better(_, in))
      (keep ::: in :: rest).take(k)
    }

  override def merge(a: List[ScoredTerm], b: List[ScoredTerm]): List[ScoredTerm] = {
    val out = List.newBuilder[ScoredTerm]
    var (x, y, n) = (a, b, 0)
    while (n < k && (x.nonEmpty || y.nonEmpty)) {
      if (y.isEmpty || (x.nonEmpty && better(x.head, y.head))) {
        out += x.head; x = x.tail
      } else { out += y.head; y = y.tail }
      n += 1
    }
    out.result()
  }

  override def finish(buf: List[ScoredTerm]): Seq[ScoredTerm] = buf

  override def bufferEncoder: Encoder[List[ScoredTerm]] =
    ExpressionEncoder[List[ScoredTerm]]()
  override def outputEncoder: Encoder[Seq[ScoredTerm]] =
    ExpressionEncoder[Seq[ScoredTerm]]()
}

object BoundedTopK {
  /** Column function: `topK(k)(cosCol, idCol)` aggregates to
    * array<struct<cos,id>> of the k best, DESC by (cos, id ASC).
    * A null score coalesces to -Infinity (ranks last, like a DESC
    * NULLS LAST window) instead of failing the non-nullable encoder;
    * NaN ranks first per the total order above. */
  def topK(k: Int): (Column, Column) => Column = {
    val f = udaf(new TopKByScore(k))
    (cos: Column, id: Column) =>
      f(org.apache.spark.sql.functions.coalesce(
          cos, org.apache.spark.sql.functions.lit(Double.NegativeInfinity)), id)
  }

  /** Column function: `topTerms(k)(scoreCol, termCol)` aggregates to
    * array<struct<score,term>> of the k best, DESC by (score, term ASC).
    * Null handling mirrors [[topK]]. */
  def topTerms(k: Int): (Column, Column) => Column = {
    val f = udaf(new TopTermsByScore(k))
    (score: Column, term: Column) =>
      f(org.apache.spark.sql.functions.coalesce(
          score, org.apache.spark.sql.functions.lit(Double.NegativeInfinity)), term)
  }
}
