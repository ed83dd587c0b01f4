package graft
import org.apache.spark.sql.{SparkSession, DataFrame}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every implemented operator from SURVEY.md §2 is exposed as a named query
  * over the driver's parquet fixtures; each query with SQL-expressible
  * semantics also ships a DuckDB oracle with IDENTICAL column names and
  * row ordering (the driver hash-compares values).
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    queries("q06_join5")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    graft.queries.VideoQueries.queries ++
    graft.queries.Relational.queries ++
    graft.ext.Dedup.queries ++
    graft.ext.Similarity.queries ++
    graft.ext.TextAnalysis.queries ++
    graft.ext.Lm.queries ++
    graft.ext.Curation.queries ++
    graft.ext.Multimodal.queries ++
    graft.ext.Mixture.queries ++
    graft.ext.Sketches.queries ++
    graft.sources.Jsonl.queries ++
    graft.sources.Partitioned.queries ++
    graft.sources.Compaction.queries ++
    graft.sources.ZOrder.queries ++
    graft.sources.TokenIndex.queries ++
    graft.sources.DynamicOverwrite.queries ++
    graft.sources.Robustness.queries ++
    graft.streaming.StreamingGate.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    graft.queries.VideoQueries.oracles ++
    graft.queries.Relational.oracles ++
    graft.ext.Dedup.oracles ++
    graft.ext.Similarity.oracles ++
    graft.ext.TextAnalysis.oracles ++
    graft.ext.Lm.oracles ++
    graft.ext.Curation.oracles ++
    graft.ext.Multimodal.oracles ++
    graft.ext.Mixture.oracles ++
    graft.ext.Sketches.oracles ++
    graft.sources.Jsonl.oracles ++
    graft.sources.Partitioned.oracles ++
    graft.sources.Compaction.oracles ++
    graft.sources.ZOrder.oracles ++
    graft.sources.TokenIndex.oracles ++
    graft.sources.DynamicOverwrite.oracles ++
    graft.sources.Robustness.oracles ++
    graft.streaming.StreamingGate.oracles
}
