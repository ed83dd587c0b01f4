package graft.sources

import java.nio.file.Path
import java.util.concurrent.ConcurrentHashMap

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** q115: SNAPSHOT COMPACTION — the small-files maintenance op every
  * long-running 100 TB table needs. A streaming ingest (q98) or
  * unshuffled partitioned write accumulates one small file per
  * (task × partition); left alone, scan cost becomes dominated by file
  * OPENS (footer reads, listing RPCs) rather than bytes. Compaction
  * rewrites the accumulated table into right-sized files and publishes
  * the rewrite ATOMICALLY: write a NEW version directory next to the
  * old one (v0, v1, … — q98's copy-on-write versioned-dir discipline,
  * [[graft.streaming.StreamingGate.latestSnapshotBefore]]), never
  * mutate what a concurrent reader may hold open; readers resolve
  * last-write-wins (highest version). A production publish would gate
  * the flip on the writer's commit marker; the fixture keeps q98's
  * exact discipline — a version exists once its directory write
  * completed.
  *
  * Sizing uses Spark's own rolling-writer mechanism: one shuffle
  * partition per table partition (`repartition($"source")`) and
  * `maxRecordsPerFile`, so the per-directory file count is EXACTLY
  * ceil(rows / target) — records standing in for the production byte
  * target at the fixture's fixed-ish row width. The rewrite also sorts
  * within partitions by (source, doc_id): compaction is the natural
  * moment to restore clustering, so post-compaction files hold
  * contiguous id ranges and range predicates prune at the row-group
  * level.
  *
  * The correctness gate proves pre/post CONTENT IDENTITY (the
  * compacted read-back equals the original table row for row against
  * the DuckDB oracle); the PlanSpec twin proves the physical effect
  * (per-dir file counts hit the target, the prior version's files are
  * untouched, the resolver flips to the new version).
  */
object Compaction {

  /** Fixture-scale stand-in for the production byte target (256 MB–1 GB
    * per file); records proxy bytes at fixed row width. */
  val TargetRecords = 10L

  /** Input splits used to fragment v0 — an unshuffled partitionBy
    * writes ≤ #splits files per partition directory, the accumulation
    * shape this operator exists to repair. */
  val FragmentSplits = 8

  private val rootCache = new ConcurrentHashMap[String, Path]()

  /** Versioned table root whose v0 is deliberately FRAGMENTED (many
    * small files per `source=` dir); idempotent per fixture. */
  def fragmentedRoot(spark: SparkSession, dir: String): Path =
    rootCache.computeIfAbsent(dir, { _ =>
      val root = graft.TempDirs.create("graft-compact")
      Tables.documents(spark, dir)
        .repartition(FragmentSplits)
        .write.mode("overwrite").partitionBy("source")
        .parquet(root.resolve("v0").toString)
      root
    })

  /** Last-write-wins version resolution — q98's lookup at id = ∞. */
  def latestVersion(root: Path): Path = Path.of(
    graft.streaming.StreamingGate.latestSnapshotBefore(root, Long.MaxValue)
      .getOrElse(sys.error(s"no published version under $root")))

  /** Compact the latest version into the NEXT version directory and
    * return it. The source version is only read, never touched; the
    * new version is complete before any resolver can pick it. */
  def compact(spark: SparkSession, root: Path,
              targetRecords: Long = TargetRecords): Path = {
    val cur = latestVersion(root)
    val next = root.resolve(s"v${cur.getFileName.toString.drop(1).toLong + 1}")
    spark.read.parquet(cur.toString)
      .repartition(col("source"))
      .sortWithinPartitions("source", "doc_id")
      .write.mode("overwrite")
      .option("maxRecordsPerFile", targetRecords)
      .partitionBy("source")
      .parquet(next.toString)
    next
  }

  /** The q115 gate: run a REAL compaction (every call — a cached
    * read-back would let bench repetitions time a parquet read, the
    * q110 lesson), then read the newly published version back in full.
    * Content identity with the original table is exactly what the
    * oracle checks.
    *
    * The record target is sized TO THE DATA (~100 right-sized files
    * corpus-wide, floored at [[TargetRecords]]), the way a production
    * compactor sizes to a byte target — a fixed fixture constant would
    * mis-size at any other scale (at 10x the fixture, 10-records-a-file
    * would FRAGMENT the table it is meant to repair). */
  private val rowsCache = new ConcurrentHashMap[String, java.lang.Long]()

  def compactedDocs(spark: SparkSession, dir: String): DataFrame = {
    val root = fragmentedRoot(spark, dir)
    // Sizing input memoized per fixture (r15): compaction preserves
    // content, so every version's row count equals v0's — the count is
    // table METADATA for the sizing heuristic, not part of the gated
    // work (the real compact + full read-back still run every call).
    val rows: Long = rowsCache.computeIfAbsent(dir, _ =>
      Long.box(spark.read.parquet(latestVersion(root).toString).count()))
    compact(spark, root, math.max(TargetRecords, rows / 100))
    spark.read.parquet(latestVersion(root).toString)
      .select("doc_id", "text", "lang", "source", "n_chars")
      .orderBy("doc_id")
  }

  val compactedDocsSql: String =
    """SELECT doc_id, text, lang, source, n_chars
      |FROM documents ORDER BY doc_id""".stripMargin

  // ------------------------------------------------------ q142 vacuum
  /** Versions kept by the q142 retention pass (current + one rollback
    * target — the production "retention window" in version units). */
  val RetainVersions = 2

  /** All published version dirs under `root`, oldest first. */
  def versions(root: Path): Seq[Path] = {
    val s = java.nio.file.Files.list(root)
    try s.toArray.toSeq.map(_.asInstanceOf[Path])
      .filter(p => p.getFileName.toString.matches("v\\d+"))
      .sortBy(_.getFileName.toString.drop(1).toLong)
    finally s.close()
  }

  /** VACUUM: delete every published version older than the newest
    * [[RetainVersions]] — the retention op that keeps a copy-on-write
    * table's storage bounded (without it, q115's discipline leaks one
    * full table copy per compaction forever). Deletes only WHOLE
    * versions strictly older than the retention window, so no resolver
    * can observe a half-deleted version: the newest version is always
    * retained (guarded), and q98's last-write-wins lookup never returns
    * a vacuumed dir. Returns the deleted version dirs. */
  def vacuum(root: Path, retain: Int = RetainVersions): Seq[Path] = {
    require(retain >= 1, "vacuum must retain at least the current version")
    val vs = versions(root)
    val doomed = vs.dropRight(retain)
    doomed.foreach(graft.TempDirs.deleteTree)
    doomed
  }

  private val vacuumRootCache = new ConcurrentHashMap[String, Path]()

  /** q142's own versioned tree — DELIBERATELY not [[fragmentedRoot]]:
    * vacuum destroys old versions, and q115's gate/spec assert v0 stays
    * byte-untouched on ITS tree; a shared root would make the two
    * maintenance ops' results depend on execution order. */
  def vacuumRoot(spark: SparkSession, dir: String): Path =
    vacuumRootCache.computeIfAbsent(dir, { _ =>
      val root = graft.TempDirs.create("graft-vacuum")
      Tables.documents(spark, dir)
        .repartition(FragmentSplits)
        .write.mode("overwrite").partitionBy("source")
        .parquet(root.resolve("v0").toString)
      root
    })

  /** The q142 gate: compact (so at least two versions exist and, from
    * the second call on, the pass has something to reclaim), vacuum to
    * the retention window, then read the table THROUGH the resolver —
    * content identity with the original relation proves retention never
    * touched live data. The spec pins the physical side: old dirs gone,
    * retained dirs' files byte-identical, resolver unchanged. */
  def vacuumedDocs(spark: SparkSession, dir: String): DataFrame = {
    val root = vacuumRoot(spark, dir)
    val rows = spark.read.parquet(latestVersion(root).toString).count()
    compact(spark, root, math.max(TargetRecords, rows / 100))
    vacuum(root)
    spark.read.parquet(latestVersion(root).toString)
      .select("doc_id", "text", "lang", "source", "n_chars")
      .orderBy("doc_id")
  }

  // ------------------------------------------------- q144 time travel
  private val travelRootCache = new ConcurrentHashMap[String, Path]()

  /** Versioned tree with real HISTORY — unlike q115/q142's trees, the
    * versions here differ in CONTENT: v0 is the full corpus, v1 is a
    * copy-on-write DELETE of the lexicographically-first source (the
    * "bad crawl batch retracted" maintenance event; deterministic so
    * the oracle can mirror it). v0 is only ever read — the delete
    * writes a new version, never touches history. */
  def travelRoot(spark: SparkSession, dir: String): Path =
    travelRootCache.computeIfAbsent(dir, { _ =>
      val root = graft.TempDirs.create("graft-travel")
      val docs = Tables.documents(spark, dir)
      docs.write.mode("overwrite").parquet(root.resolve("v0").toString)
      val doomed = docs.agg(min(col("source"))).head().getString(0)
      spark.read.parquet(root.resolve("v0").toString)
        .filter(col("source") =!= doomed)
        .write.mode("overwrite").parquet(root.resolve("v1").toString)
      root
    })

  /** Read the table AS OF a pinned version — the rollback / audit /
    * reproduce-last-week's-training-set read. Same resolver family as
    * [[latestVersion]], with the version pinned instead of maxed. */
  def readAt(spark: SparkSession, root: Path, version: Long): DataFrame = {
    val p = root.resolve(s"v$version")
    require(java.nio.file.Files.isDirectory(p),
      s"version v$version does not exist under $root (vacuumed, or never published?)")
    spark.read.parquet(p.toString)
  }

  /** Per-row 40-bit content fingerprint. The SUM is worst-case exact in
    * a Long only to 2^23 ≈ 8.4 M rows ([[FpMaxRows]], enforced loudly in
    * the gate — the packGuard discipline); past that the fingerprint
    * narrows (or becomes a proper xor-fold) as an explicit decision,
    * never a silent wrap that DuckDB's HUGEINT promotion would not
    * mirror. */
  val FpMaxRows: Long = Long.MaxValue >> 40
  private val fpExpr =
    "cast(conv(substr(md5(concat_ws(':', cast(doc_id as string), text)), 1, 10), 16, 10) as bigint)"

  /** The q144 gate: summarize EVERY version through the version-pinned
    * read path — count, source count, char sum, and a content
    * fingerprint per version. The oracle recomputes both versions'
    * summaries from the original relation (v1 via the same delete
    * predicate), so a time-travel read that leaks current rows into a
    * historical version — or vice versa — moves a fingerprint and
    * fails the hash. The q134 diff is the row-level complement; this is
    * the read-path gate. */
  def timeTravelSummary(spark: SparkSession, dir: String): DataFrame = {
    val root = travelRoot(spark, dir)
    versions(root).map { v =>
      val ver = v.getFileName.toString.drop(1).toLong
      readAt(spark, root, ver).agg(
          count(lit(1)).as("n_docs"),
          countDistinct(col("source")).as("n_sources"),
          sum(col("n_chars")).as("sum_chars"),
          sum(expr(fpExpr)).as("fp"))
        .select(lit(ver).cast("int").as("version"), col("n_docs"),
          col("n_sources"), col("sum_chars"),
          when(col("n_docs") > FpMaxRows,
            raise_error(concat(
              lit(s"timeTravelSummary: n_docs exceeds the exact-Long fp-sum bound $FpMaxRows: "),
              col("n_docs").cast("string"))))
            .otherwise(col("fp")).as("fp"))
    }.reduce(_ union _).orderBy("version")
  }

  val timeTravelSummarySql: String =
    """WITH f AS (
      |  SELECT source, n_chars,
      |    ('0x' || substr(md5(CAST(doc_id AS VARCHAR) || ':' || text), 1, 10))::BIGINT AS fp
      |  FROM documents),
      |v0 AS (
      |  SELECT 0 AS version, COUNT(*) AS n_docs,
      |    COUNT(DISTINCT source) AS n_sources,
      |    SUM(n_chars) AS sum_chars, SUM(fp) AS fp
      |  FROM f),
      |v1 AS (
      |  SELECT 1 AS version, COUNT(*) AS n_docs,
      |    COUNT(DISTINCT source) AS n_sources,
      |    SUM(n_chars) AS sum_chars, SUM(fp) AS fp
      |  FROM f WHERE source <> (SELECT MIN(source) FROM documents))
      |SELECT CAST(version AS INT) AS version, CAST(n_docs AS BIGINT) AS n_docs,
      |  CAST(n_sources AS BIGINT) AS n_sources,
      |  CAST(sum_chars AS BIGINT) AS sum_chars, CAST(fp AS BIGINT) AS fp
      |FROM (SELECT * FROM v0 UNION ALL SELECT * FROM v1)
      |ORDER BY version""".stripMargin

  // ---------------------------------------------- q160 orphan-file GC
  private val orphanRootCache = new ConcurrentHashMap[String, Path]()

  /** q160's own versioned tree (two live versions via a real compact). */
  def orphanRoot(spark: SparkSession, dir: String): Path =
    orphanRootCache.computeIfAbsent(dir, { _ =>
      val root = graft.TempDirs.create("graft-orphangc")
      Tables.documents(spark, dir)
        .repartition(FragmentSplits)
        .write.mode("overwrite").partitionBy("source")
        .parquet(root.resolve("v0").toString)
      compact(spark, root)
      root
    })

  /** Plant the crash debris a long-running table accumulates: a failed
    * job's `_temporary` attempt tree at the root, a half-published
    * version directory that never got its `v<N>` name, and task-attempt
    * debris INSIDE a live version (which parquet readers skip by the
    * underscore convention — invisible to queries, but storage leaks
    * forever without GC). Returns the planted roots. */
  private[graft] def plantDebris(root: Path): Seq[Path] = {
    val t1 = root.resolve("_temporary").resolve("attempt_000")
    val t2 = root.resolve("v99.inprogress")
    val t3 = latestVersion(root).resolve("_temporary")
    Seq(t1, t2, t3).map { d =>
      java.nio.file.Files.createDirectories(d)
      java.nio.file.Files.write(d.resolve("part-orphan.bin"),
        "debris".getBytes("UTF-8"))
      d
    }
    Seq(root.resolve("_temporary"), t2, t3)
  }

  /** ORPHAN GC: delete every top-level entry that is not a published
    * `v<N>` version, and every `_`-prefixed debris tree inside live
    * versions. Published data is NEVER touched — the deletion predicate
    * is structural (name-based), so a concurrent reader holding any
    * published version open is unaffected. Returns deleted roots. */
  def orphanGc(root: Path): Seq[Path] = {
    val live = versions(root).map(_.getFileName.toString).toSet
    val top = {
      val s = java.nio.file.Files.list(root)
      try s.toArray.toSeq.map(_.asInstanceOf[Path])
      finally s.close()
    }
    val topOrphans = top.filterNot(p => live(p.getFileName.toString))
    // inside live versions only `_temporary` attempt trees are debris —
    // `_SUCCESS` is the job-commit MARKER and must survive GC (systems
    // gate downstream reads on it)
    val innerOrphans = versions(root).flatMap { v =>
      val s = java.nio.file.Files.list(v)
      try s.toArray.toSeq.map(_.asInstanceOf[Path])
        .filter(_.getFileName.toString == "_temporary")
      finally s.close()
    }
    val doomed = topOrphans ++ innerOrphans
    doomed.foreach(graft.TempDirs.deleteTree)
    doomed
  }

  /** The q160 gate: plant fresh debris EVERY call (bench honesty — the
    * GC must do real work per repetition), collect it, then read the
    * table through the resolver. Content identity with the original
    * relation proves GC never touched published data; the PlanSpec twin
    * pins the physical side (debris gone, live files byte-untouched,
    * second pass a no-op). */
  def orphanGcDocs(spark: SparkSession, dir: String): DataFrame = {
    val root = orphanRoot(spark, dir)
    plantDebris(root)
    orphanGc(root)
    spark.read.parquet(latestVersion(root).toString)
      .select("doc_id", "text", "lang", "source", "n_chars")
      .orderBy("doc_id")
  }

  // ------------------------------------- q178 multi-table transaction
  private val txnRootCache = new ConcurrentHashMap[String, Path]()

  /** Write one transaction's DATA for both tables (no commit yet). */
  private def writeTxnData(spark: SparkSession, root: Path, n: Long,
                           docs: DataFrame): Unit = {
    val t = root.resolve(s"t$n")
    docs.select("doc_id", "source", "n_chars").coalesce(1)
      .write.mode("overwrite").parquet(t.resolve("docs").toString)
    docs.groupBy("source")
      .agg(count(lit(1)).as("n_docs"), sum(col("n_chars")).as("char_sum"))
      .coalesce(1)
      .write.mode("overwrite").parquet(t.resolve("stats").toString)
  }

  /** COMMIT: publish manifest m<n> by atomic rename of a staged temp
    * file — the single indivisible step both tables' visibility hangs
    * on. Package-private so the spec can complete a "crashed" commit. */
  private[graft] def txnCommit(root: Path, n: Long): Unit = {
    val mdir = root.resolve("manifests")
    java.nio.file.Files.createDirectories(mdir)
    val tmp = mdir.resolve(s".tmp-m$n")
    java.nio.file.Files.write(tmp, s"t$n".getBytes("UTF-8"))
    java.nio.file.Files.move(tmp, mdir.resolve(s"m$n"),
      java.nio.file.StandardCopyOption.ATOMIC_MOVE)
  }

  /** Published transactions = m<N> manifest files (a staged `.tmp-` is
    * an in-flight commit, not a published one). */
  private[graft] def txnPublished(root: Path): Seq[Long] = {
    val mdir = root.resolve("manifests")
    if (!java.nio.file.Files.isDirectory(mdir)) return Seq.empty
    val s = java.nio.file.Files.list(mdir)
    try s.toArray.toSeq.map(_.asInstanceOf[Path].getFileName.toString)
      .filter(_.matches("m\\d+")).map(_.drop(1).toLong).sorted
    finally s.close()
  }

  /** Rebuild the transactional store from scratch: txn 1 = full corpus
    * (committed), txn 2 = min-source retraction applied to BOTH tables
    * (committed), txn 3 = a further change whose data is fully written
    * but whose commit CRASHED mid-flight (staged manifest never
    * renamed). Rebuilt on EVERY gate call — the crash must be replanted
    * per repetition (q160's bench-honesty lesson). */
  private[graft] def txnRoot(spark: SparkSession, dir: String): Path = {
    val root = txnRootCache.computeIfAbsent(dir,
      _ => graft.TempDirs.create("graft-txn"))
    graft.TempDirs.deleteTree(root.resolve("manifests"))
    val docs = Tables.documents(spark, dir)
    val doomed = docs.agg(min(col("source"))).head().getString(0)
    writeTxnData(spark, root, 1, docs)
    txnCommit(root, 1)
    val retracted = docs.filter(col("source") =!= doomed)
    writeTxnData(spark, root, 2, retracted)
    txnCommit(root, 2)
    // txn 3 crashes between data write and manifest rename
    writeTxnData(spark, root, 3, retracted.filter(col("doc_id") % 2 === 0))
    java.nio.file.Files.createDirectories(root.resolve("manifests"))
    java.nio.file.Files.write(root.resolve("manifests").resolve(".tmp-m3"),
      "t3".getBytes("UTF-8"))
    root
  }

  /** q178: ATOMIC MULTI-TABLE TRANSACTION — the cross-table commit a
    * training-data platform needs (corpus + its stats/index tables must
    * flip TOGETHER or a reader joins this week's docs against last
    * week's stats) and that single-table formats don't give you: the
    * Percolator/Nessie catalog-pointer discipline reduced to its core.
    * Both tables' data files stage invisibly under t<N>/; the ONLY
    * commit step is one atomic manifest rename, so every reader
    * resolves one manifest and sees a consistent cross-table snapshot —
    * there is no interleaving in which table A shows txn N and table B
    * txn N−1. The gate writes two committed transactions plus one that
    * CRASHES between data-write and commit (staged manifest left), then
    * summarizes every PUBLISHED transaction through the resolver:
    * count + 40-bit fingerprint sum per (txn, table). The crashed
    * txn's fully-written data must be invisible — a resolver that
    * lists data directories instead of manifests fails the hash. The
    * oracle recomputes both committed states from the fixture (the
    * retraction predicate is deterministic); the PlanSpec twin
    * completes the crashed commit with the SAME atomic rename and
    * proves both tables flip together. */
  def txnSummary(spark: SparkSession, dir: String): DataFrame = {
    val root = txnRoot(spark, dir)
    val docsFp = "cast(conv(substr(md5(concat_ws(':', cast(doc_id as string), " +
      "source, cast(n_chars as string))), 1, 10), 16, 10) as bigint)"
    val statsFp = "cast(conv(substr(md5(concat_ws(':', source, " +
      "cast(n_docs as string), cast(char_sum as string))), 1, 10), 16, 10) as bigint)"
    txnPublished(root).flatMap { n =>
      val t = root.resolve(s"t$n")
      Seq(
        spark.read.parquet(t.resolve("docs").toString)
          .agg(count(lit(1)).as("n_rows"), sum(expr(docsFp)).as("fp_sum"))
          .select(lit(n).as("txn"), lit("docs").as("table_name"),
            col("n_rows"), col("fp_sum")),
        spark.read.parquet(t.resolve("stats").toString)
          .agg(count(lit(1)).as("n_rows"), sum(expr(statsFp)).as("fp_sum"))
          .select(lit(n).as("txn"), lit("stats").as("table_name"),
            col("n_rows"), col("fp_sum")))
    }.reduce(_ unionByName _).orderBy("txn", "table_name")
  }

  val txnSummarySql: String =
    """WITH base AS (SELECT doc_id, source, n_chars FROM documents),
      |doomed AS (SELECT MIN(source) AS s FROM documents),
      |t1 AS (SELECT * FROM base),
      |t2 AS (SELECT * FROM base, doomed WHERE source <> s),
      |d AS (
      |  SELECT 1 AS txn, 'docs' AS table_name, COUNT(*) AS n_rows,
      |    SUM(('0x' || substr(md5(CAST(doc_id AS VARCHAR) || ':' || source
      |      || ':' || CAST(n_chars AS VARCHAR)), 1, 10))::BIGINT) AS fp_sum
      |  FROM t1
      |  UNION ALL
      |  SELECT 2, 'docs', COUNT(*),
      |    SUM(('0x' || substr(md5(CAST(doc_id AS VARCHAR) || ':' || source
      |      || ':' || CAST(n_chars AS VARCHAR)), 1, 10))::BIGINT)
      |  FROM t2),
      |s1 AS (SELECT source, COUNT(*) AS n_docs, SUM(n_chars) AS char_sum
      |       FROM t1 GROUP BY source),
      |s2 AS (SELECT source, COUNT(*) AS n_docs, SUM(n_chars) AS char_sum
      |       FROM t2 GROUP BY source),
      |s AS (
      |  SELECT 1 AS txn, 'stats' AS table_name, COUNT(*) AS n_rows,
      |    SUM(('0x' || substr(md5(source || ':' || CAST(n_docs AS VARCHAR)
      |      || ':' || CAST(char_sum AS VARCHAR)), 1, 10))::BIGINT) AS fp_sum
      |  FROM s1
      |  UNION ALL
      |  SELECT 2, 'stats', COUNT(*),
      |    SUM(('0x' || substr(md5(source || ':' || CAST(n_docs AS VARCHAR)
      |      || ':' || CAST(char_sum AS VARCHAR)), 1, 10))::BIGINT)
      |  FROM s2)
      |SELECT CAST(txn AS BIGINT) AS txn, table_name,
      |  CAST(n_rows AS BIGINT) AS n_rows, CAST(fp_sum AS BIGINT) AS fp_sum
      |FROM (SELECT * FROM d UNION ALL SELECT * FROM s)
      |ORDER BY txn, table_name""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q115_compaction" -> ((s, d) => compactedDocs(s, d)),
    "q142_vacuum" -> ((s, d) => vacuumedDocs(s, d)),
    "q144_time_travel" -> ((s, d) => timeTravelSummary(s, d)),
    "q160_orphan_gc" -> ((s, d) => orphanGcDocs(s, d)),
    "q178_multi_table_txn" -> ((s, d) => txnSummary(s, d)))

  val oracles: Map[String, String] = Map(
    "q115_compaction" -> compactedDocsSql,
    "q142_vacuum" -> compactedDocsSql, // same bar: the original relation
    "q144_time_travel" -> timeTravelSummarySql,
    "q160_orphan_gc" -> compactedDocsSql, // same bar: the original relation
    "q178_multi_table_txn" -> txnSummarySql)
}
