package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of join — an operator Spark lacks natively (SURVEY.md §2.5 lists it
  * as an engine-surface extension; preference order from the builder
  * brief: compose built-ins BEFORE custom plans).
  *
  * Composition: tag and union both sides, sort per key by (time, tag)
  * with the right side first at equal timestamps (>= semantics, matching
  * DuckDB's ASOF), then propagate the latest right-side values with
  * last(ignoreNulls) over an unbounded-preceding frame and keep left
  * rows. ONE shuffle on the key — never a range cross-product — and the
  * per-key ordering is the window's own sort, so at 100 TB this is a
  * single exchange + linear in-partition pass; skewed keys fall under
  * AQE like any other window.
  */
object AsOfJoin {

  /** For each left row, attach the latest right row of the same `key`
    * with rightTime <= leftTime (nulls when no prior right row exists).
    * Right payload columns are emitted as `asof_<name>`.
    *
    * Ties: a right row at exactly leftTime IS matched; multiple right
    * rows at the same (key, time) resolve to the last one in (time, tag)
    * order — callers needing total determinism there should make
    * rightTime unique (e.g. append a sequence component).
    */
  def asofPrior(left: DataFrame, right: DataFrame, key: String,
                leftTime: String, rightTime: String,
                payload: Seq[String]): DataFrame = {
    val leftCols = left.columns.toSeq
    val l = left.select(
      (leftCols.map(col) :+ col(leftTime).as("__t") :+ lit(1).as("__tag")) ++
        payload.map(c => lit(null).as(s"__r_$c")): _*)
    val r = right.select(
      (leftCols.map(c => if (c == key) col(key) else lit(null).as(c)) :+
        col(rightTime).as("__t") :+ lit(0).as("__tag")) ++
        payload.map(c => col(c).as(s"__r_$c")): _*)
    val w = Window.partitionBy(col(key))
      .orderBy(col("__t"), col("__tag"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val filled = payload.foldLeft(l.unionByName(r)) { (df, c) =>
      df.withColumn(s"__asof_$c", last(col(s"__r_$c"), ignoreNulls = true).over(w))
    }
    filled.filter(col("__tag") === 1)
      .select(leftCols.map(col) ++
        payload.map(c => col(s"__asof_$c").as(s"asof_$c")): _*)
  }
}
