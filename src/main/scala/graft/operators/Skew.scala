package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
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

  // --------------------------------------------------------------- q110
  /** The q110 skewed join, LAZY (caller owns the AQE confs): 90% of
    * events funneled onto ONE join key (the manufactured hot user), then
    * a plain shuffle join to the customer dimension + per-key stats.
    * Semantically just a join — the skew is the physical story. */
  private[graft] def skewedJoinFrame(spark: SparkSession, dir: String): DataFrame = {
    // repartition(16): AQE splits a skewed reduce partition at MAPPER
    // granularity, and the fixture's single-row-group parquet collapses
    // the scan to ONE effective mapper (nothing to split however low
    // the thresholds go). A 100 TB scan has thousands of mappers
    // naturally; this restores that shape at fixture scale.
    val ev = graft.Tables.events(spark, dir).select(
        when(col("user_id") % 10 =!= 0, lit(1L)).otherwise(col("user_id")).as("k"),
        round(col("value") * 100).cast("long").as("cents"))
      .repartition(16)
    val cust = graft.Tables.customer(spark, dir)
      .select(col("c_custkey").as("k"), col("c_mktsegment").as("segment"))
    ev.join(cust, "k")
      .groupBy("k", "segment")
      .agg(count(lit(1)).as("n_events"), sum(col("cents")).as("sum_cents"))
  }

  /** q110: AQE SKEW-JOIN handling, oracle-gated — the builder brief's
    * "skewed keys → salting or AQE skew-join", second half (q88 gates
    * the salting half). The join runs as a sort-merge join (broadcast
    * disabled) with the skew thresholds lowered to fixture scale, so
    * AQE's OptimizeSkewedJoin must SPLIT the hot key's oversized
    * shuffle partition into parallel sub-partitions at runtime — the
    * plan-level proof lives in PlanSpec (`skew=true` on the executed
    * join); THIS gate proves the split is semantically invisible (the
    * result equals the plain-join oracle bit for bit).
    *
    * The frame is materialized INSIDE the conf window (a lazily
    * returned frame would execute after the finally-restore, under the
    * session's normal confs) and read back ordered. At 100 TB these
    * thresholds are the defaults — 256 MB partitions — and the same
    * mechanism absorbs the hot-key partition without a manual salt. */
  /** The fixture-scale AQE tuning the q110 gate AND its PlanSpec twin
    * share (ONE definition — a drifted copy would let the plan test
    * assert skew=true under a configuration the gate no longer runs):
    * broadcast off (force the SMJ), small input splits (AQE splits a
    * skewed reduce partition at MAPPER granularity, and a single-split
    * fixture scan leaves nothing to split — emulate the thousands of
    * mappers a 100 TB scan has naturally), skew thresholds at fixture
    * bytes, and forceOptimizeSkewedJoin because the downstream
    * aggregate could reuse the join's partitioning, so the split costs
    * an extra exchange — at scale one straggler task dominates that
    * cost. */
  val SkewDemoConfs: Seq[(String, String)] = Seq(
    "spark.sql.autoBroadcastJoinThreshold" -> "-1",
    "spark.sql.files.maxPartitionBytes" -> "32768",
    "spark.sql.files.openCostInBytes" -> "0",
    "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "2",
    "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "2048",
    "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "1024",
    "spark.sql.adaptive.forceOptimizeSkewedJoin" -> "true")

  /** Run `body` with [[SkewDemoConfs]] applied, restoring prior values. */
  private[graft] def withSkewConfs[T](spark: SparkSession)(body: => T): T = {
    val prev = SkewDemoConfs.map { case (k, _) => k -> spark.conf.getOption(k) }
    SkewDemoConfs.foreach { case (k, v) => spark.conf.set(k, v) }
    try body
    finally prev.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  /** Output DIRS cached per fixture (one tree in /tmp per fixture,
    * registered for exit cleanup) — but the join itself re-executes on
    * EVERY call, overwriting that dir. Caching the result instead would
    * make bench repetitions time a tiny parquet read-back while
    * reporting it as the runtime AQE skew split. */
  private val skewOutCache =
    new java.util.concurrent.ConcurrentHashMap[String, String]()

  def skewJoinStats(spark: SparkSession, dir: String): DataFrame = {
    val out = skewOutCache.computeIfAbsent(dir,
      _ => graft.TempDirs.create("graft-skewjoin").toString)
    // the frame is materialized INSIDE the conf window — a lazily
    // returned frame would execute after the restore, under the
    // session's normal confs
    withSkewConfs(spark) {
      skewedJoinFrame(spark, dir).write.mode("overwrite").parquet(out)
    }
    spark.read.parquet(out).orderBy("k", "segment")
  }

  val skewJoinStatsSql: String =
    """WITH ev AS (
      |  SELECT CASE WHEN user_id % 10 != 0 THEN 1 ELSE user_id END AS k,
      |         CAST(round(value * 100) AS BIGINT) AS cents
      |  FROM events),
      |c AS (SELECT c_custkey AS k, c_mktsegment AS segment FROM customer)
      |SELECT ev.k, c.segment, COUNT(*) AS n_events,
      |  CAST(SUM(cents) AS BIGINT) AS sum_cents
      |FROM ev JOIN c ON ev.k = c.k
      |GROUP BY ev.k, c.segment
      |ORDER BY ev.k, c.segment""".stripMargin

  // --------------------------------------------------------------- q154
  /** q154: NULL-SKEW JOIN SPLIT — the THIRD skew mechanism next to
    * q88's salting and q110's AQE split, and the one neither of those
    * covers: an OUTER join whose probe side is mostly NULL keys. Inner
    * joins drop null keys at the scan (Catalyst's inferred isnotnull),
    * but a LEFT join must KEEP them — and every null-key row hashes to
    * the same shuffle partition, so at 100 TB the "80% of events have
    * no attribution key" join puts 80 TB through one reducer. AQE's
    * skew split subdivides that partition but still shuffles the
    * bytes; the static fix is cheaper: null keys can never match, so
    * they bypass the join entirely — only the non-null slice (with the
    * inferred isnotnull now valid) is shuffled, and the null slice
    * unions back with null-extended dimension columns, exchange-free.
    *
    * Fixture: purchase events attribute to their user; every other
    * event carries a null attribution key (~80%). The dimension is the
    * per-user first-seen-day relation. The GATED query runs the SPLIT
    * path; the oracle is the naive LEFT JOIN in SQL — semantic
    * invisibility is the hash gate, the plan contrast is PlanSpec's. */
  private def attributionSides(spark: SparkSession, dir: String)
      : (DataFrame, DataFrame) = {
    val ev = graft.Tables.events(spark, dir).select(
      expr("CASE WHEN event_type = 'purchase' THEN user_id END").as("attr_key"),
      round(col("value") * 100).cast("long").as("cents"))
    val dim = graft.Tables.events(spark, dir)
      .groupBy(col("user_id"))
      .agg(expr("min(unix_micros(ts) div 86400000000)").as("first_day"))
    (ev, dim)
  }

  /** The naive formulation — nulls flood the join — for PlanSpec. */
  private[graft] def naiveNullJoin(spark: SparkSession, dir: String): DataFrame = {
    val (ev, dim) = attributionSides(spark, dir)
    nullJoinAgg(ev.join(dim, ev("attr_key") === dim("user_id"), "left"))
  }

  /** The split formulation — the gated q154 path. */
  def nullSkewJoin(spark: SparkSession, dir: String): DataFrame = {
    val (ev, dim) = attributionSides(spark, dir)
    val matched = ev.filter(col("attr_key").isNotNull)
      .join(dim, ev("attr_key") === dim("user_id"), "left")
    val bypassed = ev.filter(col("attr_key").isNull)
      .withColumn("user_id", lit(null).cast("long"))
      .withColumn("first_day", lit(null).cast("long"))
    nullJoinAgg(matched.unionByName(bypassed))
  }

  private def nullJoinAgg(joined: DataFrame): DataFrame =
    joined
      .groupBy(coalesce(col("attr_key"), lit(-1L)).as("attr_user"))
      .agg(count(lit(1)).as("n_events"), sum(col("cents")).as("sum_cents"),
        max(col("first_day")).as("first_day"))
      .orderBy("attr_user")

  val nullSkewJoinSql: String =
    """WITH ev AS (
      |  SELECT CASE WHEN event_type = 'purchase' THEN user_id END AS attr_key,
      |    CAST(round(value * 100) AS BIGINT) AS cents
      |  FROM events),
      |dim AS (
      |  SELECT user_id, MIN(epoch_us(ts) // 86400000000) AS first_day
      |  FROM events GROUP BY user_id)
      |SELECT coalesce(ev.attr_key, -1) AS attr_user,
      |  COUNT(*) AS n_events, CAST(SUM(ev.cents) AS BIGINT) AS sum_cents,
      |  CAST(MAX(dim.first_day) AS BIGINT) AS first_day
      |FROM ev LEFT JOIN dim ON ev.attr_key = dim.user_id
      |GROUP BY 1
      |ORDER BY attr_user""".stripMargin
}
