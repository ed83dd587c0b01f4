package graft.sources

import java.util.concurrent.ConcurrentHashMap

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** q121: Z-ORDER CLUSTERING + FILE-STATS DATA SKIPPING — the
  * multi-dimensional layout-maintenance op (Delta/Iceberg
  * `OPTIMIZE ZORDER BY`) that makes 2-D box predicates prune FILES on
  * a 100 TB table. One-dimensional clustering (q115's compaction sort,
  * q92's partition dirs) prunes only its own dimension: a table sorted
  * by user reads EVERY file for a "last 4 days, most users" query.
  * Interleaving the bits of both dimensions' RANGE-BUCKET ids orders
  * the table along a space-filling curve, so each file covers a small
  * 2-D rectangle and a box predicate intersects few of them.
  *
  * Two deliberate design points, both the standard production answers:
  *   - Bucket-id interleave, NOT raw-value interleave. The dims here
  *     span ~8 bits (user) and ~5 bits (day-of-epoch low bits vary,
  *     high bits are constant); raw interleave lets the wider/higher
  *     dim dominate the curve and pruning collapses (measured 16/16
  *     files touched on the fixture). Range-bucketing each dim to
  *     [[Buckets]] quantile-width cells first (what Delta's zorder
  *     does via range-partition ids) restores locality: 8/16 files
  *     touched for the demo box vs 14/16 under user-linear layout.
  *   - File-level min/max stats + driver-side pruning. Parquet footers
  *     give row-GROUP skipping inside a file that is already opened;
  *     the lakehouse win is never OPENING the file, which needs
  *     file-level stats in a planning-side index (the Delta/Iceberg
  *     txn log). [[fileStats]] is that index; pruning walks it on the
  *     driver — O(#files), exactly like a txn-log planner — and the
  *     kept files' residual rows still pass the exact box filter, so
  *     a stats-index bug can cost performance, never correctness for
  *     false KEEPS (false DROPS are excluded by interval-intersection
  *     soundness: a file is dropped only if its min/max interval
  *     cannot contain a qualifying row).
  *
  * The q121 gate computes the box aggregate THROUGH the pruned read
  * and hash-matches the plain full-scan oracle; the PlanSpec twin
  * asserts the physical story (z-layout touches fewer files than the
  * linear layout, and the executed scan's numFiles equals the planned
  * keep-set).
  */
object ZOrder {

  /** Range buckets per dimension (4 bits each → 8-bit z values). */
  val Buckets = 16
  /** Files per layout (= range partitions of the z sort key). */
  val NFiles = 16

  /** The demo box: narrow in days (4 of 30), wide in users — the shape
    * a one-dimensional user clustering cannot prune. Fixed literals so
    * the DuckDB oracle is the same SQL at every fixture scale. */
  val BoxUserLo = 10L
  val BoxUserHi = 139L
  val BoxDayLo = 19730L
  val BoxDayHi = 19733L

  /** (event row, 2-D dims): day as days-since-epoch, money as
    * cents-bigint for oracle parity. */
  private def dims(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir).select(
      col("user_id"),
      datediff(to_date(col("ts")), lit("1970-01-01")).cast("long").as("day"),
      col("event_type"),
      round(col("value") * 100).cast("long").as("cents"))

  /** 4-bit interleave of the two bucket ids (user bits odd, day bits
    * even) — static unrolled integer arithmetic, fully codegen'd. */
  private def zExpr: String =
    (0 until 4).map(i =>
      s"(shiftleft((ub div ${1 << i}) % 2, ${2 * i + 1})" +
      s" + shiftleft((db div ${1 << i}) % 2, ${2 * i}))").mkString(" + ")

  private val layoutCache = new ConcurrentHashMap[String, (String, String)]()

  /** Write the two layouts once per fixture: z-clustered and
    * user-linear (the comparison baseline). The min/max range scan is
    * the tiny pre-pass every OPTIMIZE job runs to size its buckets.
    *
    * Files are FIXED-WIDTH curve cells (`cell = z div 16`, i.e. 16
    * consecutive z values per file), written one file per cell via
    * repartition-on-cell + partitionBy — NOT `repartitionByRange`:
    * the range partitioner picks boundaries by sampling with a seed
    * derived from the RDD id, so the same build in a different session
    * history splits ties differently and the file count a pruning test
    * asserts on drifts (observed: 8 vs 9 kept files across otherwise
    * identical runs). Static cells make the layout — and the pruning
    * numbers — a pure function of the data. */
  def layouts(spark: SparkSession, dir: String): (String, String) =
    layoutCache.computeIfAbsent(dir, { _ =>
      val ev = dims(spark, dir)
      val mm = ev.agg(min("user_id"), max("user_id"), min("day"), max("day")).head()
      val (ulo, uhi, dlo, dhi) =
        (mm.getLong(0), mm.getLong(1), mm.getLong(2), mm.getLong(3))
      val cellWidth = Buckets * Buckets / NFiles
      val bucketed = ev
        .withColumn("ub", expr(s"((user_id - $ulo) * $Buckets) div ${uhi - ulo + 1}"))
        .withColumn("db", expr(s"((day - $dlo) * $Buckets) div ${dhi - dlo + 1}"))
        .withColumn("cell", expr(s"($zExpr) div $cellWidth"))
      val zPath = graft.TempDirs.create("graft-zorder").toString
      bucketed.drop("ub", "db")
        .repartition(NFiles, col("cell"))
        .write.partitionBy("cell").mode("overwrite").parquet(zPath)
      val linPath = graft.TempDirs.create("graft-zorder-lin").toString
      ev.withColumn("cell",
          expr(s"((user_id - $ulo) * $Buckets) div ${uhi - ulo + 1}"))
        .repartition(NFiles, col("cell"))
        .write.partitionBy("cell").mode("overwrite").parquet(linPath)
      (zPath, linPath)
    })

  /** The planning-side stats index: per-file min/max of both dims (the
    * txn-log analogue, collected to the driver — O(#files) rows). */
  def keptFiles(spark: SparkSession, path: String): Seq[String] =
    spark.read.parquet(path)
      .groupBy(input_file_name().as("file"))
      .agg(min("user_id").as("ulo"), max("user_id").as("uhi"),
        min("day").as("dlo"), max("day").as("dhi"))
      .filter(col("ulo") <= BoxUserHi && col("uhi") >= BoxUserLo &&
        col("dlo") <= BoxDayHi && col("dhi") >= BoxDayLo)
      .collect().map(_.getAs[String]("file")).toSeq.sorted

  /** q121: the box aggregate through the stats-pruned z-layout read.
    * The residual filter re-applies the exact box on the kept files'
    * rows, so the pruning is semantically invisible. */
  def prunedBoxQuery(spark: SparkSession, dir: String): DataFrame = {
    val (zPath, _) = layouts(spark, dir)
    val kept = keptFiles(spark, zPath)
    spark.read.parquet(kept: _*)
      .filter(col("user_id").between(BoxUserLo, BoxUserHi) &&
        col("day").between(BoxDayLo, BoxDayHi))
      .groupBy("event_type")
      .agg(count(lit(1)).as("n_events"), sum(col("cents")).as("sum_cents"))
      .orderBy("event_type")
  }

  val prunedBoxQuerySql: String =
    s"""WITH ev AS (
       |  SELECT user_id,
       |    CAST(CAST(ts AS DATE) - DATE '1970-01-01' AS BIGINT) AS day,
       |    event_type, CAST(round(value * 100) AS BIGINT) AS cents
       |  FROM events)
       |SELECT event_type, COUNT(*) AS n_events,
       |  CAST(SUM(cents) AS BIGINT) AS sum_cents
       |FROM ev
       |WHERE user_id BETWEEN $BoxUserLo AND $BoxUserHi
       |  AND day BETWEEN $BoxDayLo AND $BoxDayHi
       |GROUP BY event_type
       |ORDER BY event_type""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q121_zorder_skipping" -> ((s, d) => prunedBoxQuery(s, d)))

  val oracles: Map[String, String] = Map(
    "q121_zorder_skipping" -> prunedBoxQuerySql)
}
