package graft.sources

import java.nio.file.Files
import java.util.concurrent.ConcurrentHashMap

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Hive-partitioned storage layout + partition pruning, oracle-gated
  * (q92).
  *
  * At 100 TB the single most important scan optimization is not reading
  * the data at all: laying the corpus out as `source=<v>/` directories
  * means a query filtering on `source` touches only the matching
  * directories — the FILTER becomes a LISTING decision, before any
  * parquet footer is opened. The gate writes the documents fixture
  * partitioned by source (once per fixture dir, cached like the
  * streaming gate's staged dirs), reads it back with a two-source
  * filter, and aggregates; the oracle runs the same filter over the
  * ORIGINAL unpartitioned table. Green proves the round trip preserves
  * rows exactly and the pruned scan computes the same answer; the
  * PlanSpec twin asserts the pruning actually happened (PartitionFilters
  * on the scan node, not a post-read Filter).
  */
object Partitioned {

  /** The sources the gate keeps — 2 of the fixture's 20. */
  val KeepSources: Seq[String] = Seq("src3", "src7")

  private val layoutCache = new ConcurrentHashMap[String, String]()

  /** Write documents partitioned by source; idempotent per fixture dir. */
  def partitionedLayout(spark: SparkSession, dir: String): String =
    layoutCache.computeIfAbsent(dir, { _ =>
      val out = Files.createTempDirectory("graft-docs-by-source")
      out.toFile.deleteOnExit()
      // repartition on the partition column first: one shuffle partition
      // per source → exactly one file per partition directory, whatever
      // the input split count (also the at-scale idiom — partitionBy on
      // an unshuffled input writes #input-splits × #sources small files)
      Tables.documents(spark, dir)
        .repartition(col("source"))
        .write.mode("overwrite")
        .partitionBy("source")
        .parquet(out.toString)
      out.toString
    })

  /** Pruned scan + aggregate over the partitioned layout. The filter is
    * on the PARTITION column, so it resolves during file listing —
    * 18 of 20 directories are never opened. */
  def prunedScan(spark: SparkSession, dir: String): DataFrame = {
    val layout = partitionedLayout(spark, dir)
    spark.read.parquet(layout)
      .filter(col("source").isin(KeepSources: _*))
      .groupBy("source", "lang")
      .agg(count(lit(1)).as("n_docs"),
           sum(col("n_chars")).as("sum_chars"),
           sum(expr("size(split(text, ' '))")).as("sum_tokens"))
      .orderBy("source", "lang")
  }

  val prunedScanSql: String = {
    val keep = KeepSources.map(s => s"'$s'").mkString(", ")
    s"""SELECT source, lang, COUNT(*) AS n_docs,
       |  CAST(SUM(n_chars) AS BIGINT) AS sum_chars,
       |  CAST(SUM(len(string_split(text, ' '))) AS BIGINT) AS sum_tokens
       |FROM documents
       |WHERE source IN ($keep)
       |GROUP BY source, lang
       |ORDER BY source, lang""".stripMargin
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q92_partition_pruning" -> ((s, d) => prunedScan(s, d)))

  val oracles: Map[String, String] = Map(
    "q92_partition_pruning" -> prunedScanSql)
}
