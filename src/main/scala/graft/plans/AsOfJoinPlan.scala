package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{DataFrame, GraftPlanBridge}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, BindReferences, Expression, GenericInternalRow, JoinedRow, SortOrder, UnsafeProjection}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning}
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}
import org.apache.spark.sql.types.LongType

/** AS-OF JOIN as a FIRST-CLASS PHYSICAL OPERATOR — the full custom-plan
  * stack the builder brief lists as preference (c): a logical
  * [[AsOfJoinNode]], a planner [[AsOfJoinStrategy]], and a physical
  * [[AsOfJoinExec]] whose `requiredChildDistribution` /
  * `requiredChildOrdering` make EnsureRequirements co-partition both
  * sides on the key and sort them by (key, time) — after which the join
  * itself is ONE streaming merge pass per partition, zero extra memory
  * beyond the single buffered right row.
  *
  * Relationship to `operators/AsOfJoin` (q25): same semantics — for each
  * left row, the latest right row of the same key with rightTime <=
  * leftTime — but the union-window composition materializes L+R rows
  * through the window machinery and carries null-padded columns through
  * the union; the physical operator streams both inputs once. At 100 TB
  * both plans are one exchange per side; the exec trades the window
  * operator's buffering for a two-pointer merge, and its declared
  * ordering lets downstream per-key operators reuse the sort. Keys and
  * times are LongType by contract (ids, epoch micros) — enforced at
  * construction, not silently miscompared.
  *
  * q139 gates the exec against DuckDB's native ASOF LEFT JOIN (q25's
  * oracle), so the custom operator meets the same bar as every built-in
  * composition: hash-identical results at both fixture scales.
  */
case class AsOfJoinNode(
    left: LogicalPlan, right: LogicalPlan,
    leftKey: Expression, leftTime: Expression,
    rightKey: Expression, rightTime: Expression) extends BinaryNode {
  require(Seq(leftKey, leftTime, rightKey, rightTime)
    .forall(_.dataType == LongType), "as-of keys/times must be LongType")
  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))
  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): AsOfJoinNode =
    copy(left = newLeft, right = newRight)
}

object AsOfJoinNode {
  /** Build the as-of DataFrame. The right side's columns are re-aliased
    * with an `r_` prefix (fresh exprIds — the custom node gets none of
    * the analyzer's self-join deduplication, so a right side derived
    * from the same scan as the left must not share attribute ids). */
  def asof(left: DataFrame, right: DataFrame,
           key: String, leftTime: String, rightTime: String): DataFrame = {
    val spark = left.sparkSession
    val cur = spark.experimental.extraStrategies
    if (!cur.contains(AsOfJoinStrategy))
      spark.experimental.extraStrategies = cur :+ AsOfJoinStrategy
    val rFresh = right.select(right.columns.toSeq
      .map(c => org.apache.spark.sql.functions.col(c).as(s"r_$c")): _*)
    val lp = GraftPlanBridge.analyzed(left)
    val rp = GraftPlanBridge.analyzed(rFresh)
    def attr(p: LogicalPlan, n: String): Attribute =
      p.output.find(_.name == n).getOrElse(
        throw new IllegalArgumentException(s"no column $n in ${p.output.map(_.name)}"))
    GraftPlanBridge.ofRows(spark, AsOfJoinNode(lp, rp,
      attr(lp, key), attr(lp, leftTime),
      attr(rp, s"r_$key"), attr(rp, s"r_$rightTime")))
  }
}

/** Planner rule: [[AsOfJoinNode]] → [[AsOfJoinExec]]. Registered per
  * session via `spark.experimental.extraStrategies` (done by
  * [[AsOfJoinNode.asof]]) and via `GraftExtensions.injectPlannerStrategy`
  * for `spark.sql.extensions` users — the same dual registration as
  * [[RewriteCosineNearDups]]. */
object AsOfJoinStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case AsOfJoinNode(l, r, lk, lt, rk, rt) =>
      AsOfJoinExec(planLater(l), planLater(r), lk, lt, rk, rt) :: Nil
    case _ => Nil
  }
}

/** Streaming-merge as-of join: children arrive co-partitioned on the key
  * and sorted by (key, time) — declared, so EnsureRequirements inserts
  * the exchanges and sorts — and each partition is joined by a forward
  * two-pointer pass holding exactly ONE buffered right row. */
case class AsOfJoinExec(
    left: SparkPlan, right: SparkPlan,
    leftKey: Expression, leftTime: Expression,
    rightKey: Expression, rightTime: Expression) extends BinaryExecNode {

  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))

  override def requiredChildDistribution: Seq[Distribution] =
    Seq(ClusteredDistribution(Seq(leftKey)), ClusteredDistribution(Seq(rightKey)))

  override def requiredChildOrdering: Seq[Seq[SortOrder]] =
    Seq(Seq(SortOrder(leftKey, Ascending), SortOrder(leftTime, Ascending)),
        Seq(SortOrder(rightKey, Ascending), SortOrder(rightTime, Ascending)))

  override def outputPartitioning: Partitioning = left.outputPartitioning

  override def outputOrdering: Seq[SortOrder] =
    Seq(SortOrder(leftKey, Ascending), SortOrder(leftTime, Ascending))

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): AsOfJoinExec =
    copy(left = newLeft, right = newRight)

  override protected def doExecute(): RDD[InternalRow] = {
    val lOut = left.output
    val rOut = right.output
    val out = output
    val lkB = BindReferences.bindReference(leftKey, lOut)
    val ltB = BindReferences.bindReference(leftTime, lOut)
    val rkB = BindReferences.bindReference(rightKey, rOut)
    val rtB = BindReferences.bindReference(rightTime, rOut)
    left.execute().zipPartitions(right.execute()) { (lIter, rIter) =>
      // bind against nullable right attrs: the null-padded row must be
      // read through null-checking accessors
      val proj = UnsafeProjection.create(
        out, lOut ++ rOut.map(_.withNullability(true)))
      val nullRight = new GenericInternalRow(rOut.size)
      val joined = new JoinedRow
      var rCur: InternalRow = if (rIter.hasNext) rIter.next() else null
      var last: InternalRow = null
      var lastKey = 0L
      lIter.map { l =>
        val lk = lkB.eval(l).asInstanceOf[Long]
        val lt = ltB.eval(l).asInstanceOf[Long]
        var scanning = true
        while (rCur != null && scanning) {
          val rk = rkB.eval(rCur).asInstanceOf[Long]
          val rt = rtB.eval(rCur).asInstanceOf[Long]
          if (rk < lk || (rk == lk && rt <= lt)) {
            // sort iterators reuse row objects: buffer a copy
            last = rCur.copy(); lastKey = rk
            rCur = if (rIter.hasNext) rIter.next() else null
          } else scanning = false
        }
        val r = if (last != null && lastKey == lk) last else nullRight
        proj(joined(l, r))
      }
    }
  }
}
