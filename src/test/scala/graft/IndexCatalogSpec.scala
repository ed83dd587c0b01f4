package graft

import org.apache.spark.sql.functions._

import graft.ext.Dedup
import graft.sources.{IndexCatalog, TokenIndex}

/** The persistent-index contract: a fresh session LOADS a stored index
  * by content fingerprint instead of rebuilding it. "Fresh session" is
  * simulated by dropping every in-memory memo ([[IndexCatalog
  * .resetMemory]] / [[TokenIndex.resetMemory]]) while the on-disk
  * catalog entries — the part that survives a real JVM exit — stay in
  * place; the build/load counters then prove which path ran. */
class IndexCatalogSpec extends SparkSpec {

  /** Catalog entry paths are fully-qualified Hadoop URIs (file:/...);
    * java.nio needs them parsed as URIs, not as path strings. */
  private def localPath(entry: String): java.nio.file.Path =
    java.nio.file.Paths.get(java.net.URI.create(entry))

  /** Isolated catalog root per test run: prior sbt runs must not
    * pre-seed the entries these assertions count. */
  private def withFreshRoot[A](body: => A): A = {
    val dir = TempDirs.create("graft-catalog-spec").toString
    spark.conf.set("spark.graft.index.root", dir)
    IndexCatalog.resetMemory()
    TokenIndex.resetMemory()
    try body
    finally {
      spark.conf.unset("spark.graft.index.root")
      IndexCatalog.resetMemory()
      TokenIndex.resetMemory()
    }
  }

  test("q186 stored LSH index: fresh session loads from disk, result hash-identical") {
    withFreshRoot {
      val docs = Tables.documents(spark, sf)
      val b0 = IndexCatalog.builds.get()
      val first = Dedup.incrementalNearDup(docs).collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSeq
      assert(IndexCatalog.builds.get() == b0 + 1,
        "first ingest against a fresh root must BUILD the band index")
      val key = Dedup.lshIndexKey(docs)
      val path = localPath(Dedup.lshIndexPathForTest(key))
      assert(java.nio.file.Files.isRegularFile(
        path.resolve("_graft_manifest.json")),
        "catalog entry carries its manifest")

      // "fresh JVM": all in-memory state gone, disk entry intact
      IndexCatalog.resetMemory()
      TokenIndex.resetMemory()
      val b1 = IndexCatalog.builds.get()
      val l1 = IndexCatalog.loads.get()
      val second = Dedup.incrementalNearDup(Tables.documents(spark, sf))
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
      assert(IndexCatalog.builds.get() == b1,
        "a fresh session must NOT rebuild the stored index")
      assert(IndexCatalog.loads.get() == l1 + 1,
        "a fresh session must LOAD the stored index from disk")
      assert(second == first, "loaded-index ingest is hash-identical to built-index ingest")
    }
  }

  test("q137 stored gram index: fresh session loads layout and index, lookup hash-identical") {
    withFreshRoot {
      val b0 = IndexCatalog.builds.get()
      val (path1, idx1) = TokenIndex.layoutAndIndex(spark, sf)
      val first = TokenIndex.probedLookup(spark, sf).collect().map(_.toSeq).toSeq
      assert(IndexCatalog.builds.get() == b0 + 1,
        "first lookup against a fresh root must BUILD layout + gram index")

      IndexCatalog.resetMemory()
      TokenIndex.resetMemory()
      val b1 = IndexCatalog.builds.get()
      val l1 = IndexCatalog.loads.get()
      val (path2, idx2) = TokenIndex.layoutAndIndex(spark, sf)
      val second = TokenIndex.probedLookup(spark, sf).collect().map(_.toSeq).toSeq
      assert(IndexCatalog.builds.get() == b1,
        "a fresh session must NOT re-shard or re-index")
      assert(IndexCatalog.loads.get() >= l1 + 1,
        "a fresh session must LOAD the stored entry")
      assert(path2 == path1, "the loaded layout is the SAME on-disk table")
      assert(idx2 == idx1, "the reloaded (shard, bucket) set is identical")
      assert(second == first, "lookup through the loaded index is hash-identical")
    }
  }

  test("q155 stored IVF index: fresh session loads the cell assignment, result hash-identical") {
    withFreshRoot {
      val emb = Tables.embeddings(spark, sf)
      val b0 = IndexCatalog.builds.get()
      val first = graft.ext.Similarity.incrementalIvf(emb)
        .collect().map(_.toSeq).toSeq
      assert(IndexCatalog.builds.get() == b0 + 1,
        "first ingest against a fresh root must BUILD the cell assignment")

      IndexCatalog.resetMemory()
      val b1 = IndexCatalog.builds.get()
      val l1 = IndexCatalog.loads.get()
      val second = graft.ext.Similarity
        .incrementalIvf(Tables.embeddings(spark, sf))
        .collect().map(_.toSeq).toSeq
      assert(IndexCatalog.builds.get() == b1,
        "a fresh session must NOT re-assign the base")
      assert(IndexCatalog.loads.get() == l1 + 1,
        "a fresh session must LOAD the stored assignment")
      assert(second == first, "loaded-index ingest is hash-identical")
    }
  }

  test("catalog: regenerated source content moves the fingerprint, stale entry never probed") {
    withFreshRoot {
      import spark.implicits._
      val dir = TempDirs.create("graft-catalog-regen").toString
      Seq((1L, "a"), (2L, "b")).toDF("doc_id", "text")
        .write.mode("overwrite").parquet(dir)
      val fp1 = IndexCatalog.contentFingerprint(spark.read.parquet(dir))
      // regenerate at the SAME path with different content
      Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("doc_id", "text")
        .write.mode("overwrite").parquet(dir)
      val fp2 = IndexCatalog.contentFingerprint(spark.read.parquet(dir))
      assert(fp1 != fp2, "fingerprint must move when content is regenerated")

      var built = 0
      def entryFor(fp: String) =
        IndexCatalog.getOrBuild(spark, "spec-kind-v1", fp) { out =>
          built += 1
          Seq(built.toLong).toDF("v").write.parquet(s"$out/data")
        }
      val e1 = entryFor(fp1)
      val e2 = entryFor(fp2)
      assert(e1 != e2 && built == 2, "distinct fingerprints get distinct slots")
      IndexCatalog.resetMemory()
      assert(entryFor(fp2) == e2 && built == 2,
        "reload resolves the CURRENT fingerprint's slot without rebuilding")
      assert(spark.read.parquet(s"$e2/data").as[Long].head() == 2L,
        "the loaded payload is the current build, not the stale one")

      // vacuum: the orphaned fp1 slot is reclaimed, the live fp2 slot
      // survives both by keep-set and by in-JVM-use protection
      assert(IndexCatalog.vacuum(spark, "spec-kind-v1", Set(fp2)) == 1,
        "exactly the orphaned slot is vacuumed")
      assert(!java.nio.file.Files.exists(localPath(e1)),
        "the stale slot is gone")
      assert(spark.read.parquet(s"$e2/data").as[Long].head() == 2L,
        "the kept slot still loads")
      assert(IndexCatalog.vacuum(spark, "spec-kind-v1", Set.empty) == 0,
        "a memoized (in-use) entry is never vacuumed even outside the keep set")
    }
  }

  test("catalog: a reaped payload file invalidates the entry — fresh session rebuilds, never loads truncated") {
    withFreshRoot {
      import spark.implicits._
      var built = 0
      def entry() = IndexCatalog.getOrBuild(spark, "spec-reap-v1", "fp-const") { out =>
        built += 1
        Seq(1L, 2L, 3L).toDF("v").repartition(2).write.parquet(s"$out/data")
      }
      val e1 = entry()
      assert(built == 1)

      // the age-based /tmp reaper shape: one part-file gone, manifest
      // (recently re-read, atime fresh) survives
      IndexCatalog.resetMemory()
      val walk = java.nio.file.Files.walk(localPath(e1))
      val part =
        try walk.toArray.toSeq.map(_.asInstanceOf[java.nio.file.Path])
          .filter(p => java.nio.file.Files.isRegularFile(p) &&
            p.getFileName.toString.endsWith(".parquet")).head
        finally walk.close()
      java.nio.file.Files.delete(part)

      val e2 = entry()
      assert(built == 2, "a damaged payload must REBUILD, not load truncated")
      assert(spark.read.parquet(s"$e2/data").count() == 3,
        "the rebuilt entry is complete")
    }
  }
}
