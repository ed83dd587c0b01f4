package graft.functions

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.expressions.Aggregator

/** Mergeable Misra-Gries frequent-items summary — the DETERMINISTIC
  * heavy-hitter primitive next to [[CountMinSketch]]'s probabilistic one:
  * where a CMS carries depth x width counters and answers point estimates
  * with one-sided probabilistic error, an MG summary carries at most k
  * (item, weight) entries and makes a hard combinatorial promise with no
  * hash, no randomness and no failure probability:
  *
  *   every item with true count > n / (k + 1) is IN the summary,
  *   and each stored weight undercounts by at most n / (k + 1).
  *
  * That coverage guarantee is what the exact second pass leans on: recount
  * ONLY the <= k candidates (a broadcast-filter over the stream — never a
  * full token shuffle) and keep those whose exact count clears n/(k+1);
  * the result is precisely the true heavy hitters, independent of
  * partitioning and fold order even though the intermediate summary itself
  * is order-sensitive. The summary merge is the Agarwal et al. (2012,
  * "Mergeable Summaries") rule — pointwise sum, then subtract the
  * (k+1)-th largest weight and drop non-positives — which keeps the
  * additive-error budget of its inputs, so partial summaries from 1000
  * executors combine with the same guarantee as a sequential pass.
  * State per partition: <= k entries, data-size independent.
  *
  * Buffer layout mirrors [[CountMinSketch.Agg]]: two flat parallel arrays
  * (slot i = token i / weight i, empty slot = null) mutated in place, so
  * the per-row reduce is an allocation-free O(k) scan (k is small — the
  * point of MG is that k ~ 1/support, not vocabulary size) and Spark
  * serializes the buffer only at partition boundaries.
  */
object MisraGries {

  /** Classic streaming update: known item increments; a new item either
    * occupies a free slot or decrements EVERY counter (the new arrival
    * annihilates one unit of k existing items — the charging argument
    * behind the n/(k+1) bound), freeing zeroed slots. */
  def update(toks: Array[String], cnts: Array[Long], tok: String): Unit = {
    var i = 0
    var free = -1
    while (i < toks.length) {
      if (toks(i) == null) { if (free < 0) free = i }
      else if (toks(i) == tok) { cnts(i) += 1; return }
      i += 1
    }
    if (free >= 0) { toks(free) = tok; cnts(free) = 1L }
    else {
      i = 0
      while (i < toks.length) {
        cnts(i) -= 1
        if (cnts(i) == 0) toks(i) = null
        i += 1
      }
    }
  }

  /** Mergeable-summaries combine: pointwise sum, then renormalize back to
    * <= k entries by subtracting the (k+1)-th largest weight (everything
    * at or below the cut dies, so at most k survive; error adds and the
    * bound holds). */
  def mergeSummaries(a: Map[String, Long], b: Map[String, Long], k: Int): Map[String, Long] = {
    val sum = collection.mutable.Map.empty[String, Long]
    a.foreach { case (t, c) => sum.update(t, sum.getOrElse(t, 0L) + c) }
    b.foreach { case (t, c) => sum.update(t, sum.getOrElse(t, 0L) + c) }
    if (sum.size <= k) sum.toMap
    else {
      val cut = sum.values.toArray.sorted(Ordering[Long].reverse).apply(k)
      sum.iterator.collect { case (t, c) if c > cut => t -> (c - cut) }.toMap
    }
  }

  /** Aggregator buffer: fixed-k parallel slot arrays (null = empty). */
  case class Buf(toks: Array[String], cnts: Array[Long])

  private def toMap(b: Buf): Map[String, Long] =
    b.toks.iterator.zip(b.cnts.iterator)
      .collect { case (t, c) if t != null && c > 0 => t -> c }.toMap

  /** Typed Aggregator over a token stream; final value = the <= k
    * candidate (token, residual weight) entries. */
  final class Agg(k: Int) extends Aggregator[String, Buf, Map[String, Long]] {
    require(k >= 1, "k >= 1")
    override def zero: Buf = Buf(new Array[String](k), new Array[Long](k))
    override def reduce(b: Buf, tok: String): Buf = {
      update(b.toks, b.cnts, tok); b
    }
    override def merge(a: Buf, b: Buf): Buf = {
      val m = mergeSummaries(toMap(a), toMap(b), k)
      val out = zero
      var i = 0
      m.foreach { case (t, c) => out.toks(i) = t; out.cnts(i) = c; i += 1 }
      out
    }
    override def finish(b: Buf): Map[String, Long] = toMap(b)
    override def bufferEncoder: Encoder[Buf] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Buf]()
    override def outputEncoder: Encoder[Map[String, Long]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Map[String, Long]]()
  }
}
