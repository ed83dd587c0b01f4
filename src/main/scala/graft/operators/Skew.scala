package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-mitigation utilities for hot-key aggregations (builder brief:
  * "skewed keys → salting or AQE skew-join").
  *
  * AQE's skew handling covers sort-merge JOINS; a skewed GROUP BY with
  * non-algebraic aggregates can still funnel one hot key into one task.
  * Two-phase salted aggregation splits each key across `saltBuckets`
  * partial groups, aggregates, then merges — turning a single hot
  * reducer into `saltBuckets` parallel ones. Only worth it for genuinely
  * hot keys; for algebraic aggregates Spark's partial aggregation
  * already does map-side combine, so this targets the shuffle-partition
  * imbalance itself.
  */
object Skew {

  /** Salted distributed count per key: semantically identical to
    * groupBy(key).count() but the shuffle spreads each key over
    * `saltBuckets` partitions before a cheap second-stage merge. */
  def saltedCount(df: DataFrame, key: Column, saltBuckets: Int): DataFrame =
    df.withColumn("__salt", pmod(spark_partition_id() + monotonically_increasing_id(),
        lit(saltBuckets)))
      .groupBy(key.as("key"), col("__salt"))
      .agg(count(lit(1)).as("partial_n"))
      .groupBy(col("key"))
      .agg(sum(col("partial_n")).as("n"))

  /** Salted sum: same two-phase shape for a numeric column. */
  def saltedSum(df: DataFrame, key: Column, value: Column, saltBuckets: Int): DataFrame =
    df.withColumn("__salt", pmod(spark_partition_id() + monotonically_increasing_id(),
        lit(saltBuckets)))
      .groupBy(key.as("key"), col("__salt"))
      .agg(sum(value).as("partial_s"))
      .groupBy(col("key"))
      .agg(sum(col("partial_s")).as("s"))

  /** Salted count + sum in ONE two-phase pass (one shuffle of
    * key x saltBuckets partials, one tiny merge) — the shape q88 gates
    * against the plain group-by oracle. Value must be an exact
    * (integer) column: the merge re-sums partials, which is only
    * order-independent for associative-exact arithmetic. */
  def saltedStats(df: DataFrame, key: Column, value: Column, saltBuckets: Int): DataFrame =
    df.withColumn("__salt", pmod(spark_partition_id() + monotonically_increasing_id(),
        lit(saltBuckets)))
      .groupBy(key.as("key"), col("__salt"))
      .agg(count(lit(1)).as("partial_n"), sum(value).as("partial_s"))
      .groupBy(col("key"))
      .agg(sum(col("partial_n")).as("n"), sum(col("partial_s")).as("s"))
}
