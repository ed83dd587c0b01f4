package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Exact order statistics from a BOUNDED-domain integer column — the
  * one shared definition behind q225's likelihood tertiles and q227's
  * conformal threshold (q128's exact-quantile idea packaged as a
  * reusable step).
  *
  * The trick: when the scored column's domain is bounded (ppm scores in
  * [0, 1e6], basis points in [0, 1e4]), the VALUE-COUNTS relation is
  * bounded at domain size AT ANY CORPUS SIZE, so a single-partition
  * cumsum window over it is a constant-size step — never a corpus sort.
  * Callers pass rank expressions over `n` (the total count); each comes
  * back as the smallest value whose cumulative count reaches the rank.
  */
object OrderStats {

  /** One row with a MIN-threshold column per (name, rankExprOverN)
    * entry; rank expressions may reference `n`. `values` must hold the
    * bounded integer column `valueCol`. */
  def boundedOrderStats(values: DataFrame, valueCol: String,
                        ranks: Seq[(String, String)]): DataFrame = {
    val vc = values.groupBy(valueCol).agg(count(lit(1)).as("c"))
    val nTot = vc.agg(sum(col("c")).as("n"))
    val cumW = Window.orderBy(valueCol)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val thresholds = ranks.map { case (name, rankExpr) =>
      min(when(col("cum") >= expr(rankExpr), col(valueCol))).as(name)
    }
    vc.crossJoin(broadcast(nTot))
      .withColumn("cum", sum(col("c")).over(cumW))
      .agg(thresholds.head, thresholds.tail: _*)
  }
}
