package graft.sources

import java.nio.charset.StandardCharsets
import java.util.concurrent.ConcurrentHashMap
import java.util.concurrent.atomic.AtomicLong

import org.apache.hadoop.fs.{FileSystem, Path => HPath}
import org.apache.spark.sql.{DataFrame, SparkSession}

/** PERSISTENT INDEX CATALOG — the "index once, probe forever" store the
  * incremental operators plug into. q186's LSH band postings, q137's
  * gram index, and q155's IVF cell assignment are ingest-time
  * artifacts: at 100 TB the build is a full corpus pass, so rebuilding
  * one per JVM (the pre-round-10 behavior — a process-lifetime
  * `ConcurrentHashMap` in front of a [[graft.TempDirs]] tree that a
  * shutdown hook deletes) throws the whole economy of incremental
  * maintenance away. The catalog makes the stored index a real TABLE: a
  * content fingerprint of the source data keys a parquet directory
  * under a durable root, a tiny manifest records which fingerprint the
  * payload was built from, and a fresh session LOADS on manifest hit
  * instead of rebuilding.
  *
  * Layout (one entry):
  * {{{
  *   <root>/<kind>/<sha256(fingerprint).take(16)>/
  *     _graft_manifest.json   // {"kind", "fingerprint", "payload"}
  *     ... payload parquet (builder-defined; may be subdirs) ...
  * }}}
  * The `_`-prefixed manifest name keeps Spark's parquet reader from
  * treating it as data (the `_SUCCESS` convention). The manifest's
  * `payload` field is a stamp of the payload file set (count, total
  * bytes, sha-256 of the sorted relative-path#size list): a load
  * re-stamps the directory and treats ANY mismatch as no-entry —
  * without it, an age-based /tmp reaper that deletes part-files but
  * leaves the (recently re-read) manifest would hand a fresh session a
  * silently truncated index.
  *
  * Publish protocol: build into a `.tmp-` sibling, write the manifest
  * LAST, then atomically rename into place — a reader can never see a
  * half-built index (no manifest ⇒ no entry), and a lost cross-process
  * race (the rename fails because the winner's directory is already
  * there) deletes its own tmp tree and loads the winner after verifying
  * its manifest. Stale entries are never probed: a REGENERATED source
  * changes (length, mtime) per input file, so its fingerprint — and
  * therefore its catalog slot — moves; orphaned slots are storage
  * garbage for [[vacuum]] (the q142 discipline), never a correctness
  * hazard.
  *
  * In-memory fixtures (no input files) get a `mem:`-prefixed identity
  * fingerprint — those are NEVER persisted (an identity hash outlives
  * its meaning at JVM exit); they build into a [[graft.TempDirs]] tree
  * exactly as before and are dropped by [[resetMemory]].
  *
  * Root resolution: `spark.graft.index.root` conf, else the
  * `GRAFT_INDEX_ROOT` env, else `${java.io.tmpdir}/graft-index-catalog`
  * (production points this at durable shared storage; the default keeps
  * local runs self-contained).
  */
object IndexCatalog {

  /** In-JVM memo (kind#fingerprint → payload path): the fast path that
    * skips even the manifest read. [[resetMemory]] clears it to
    * simulate a fresh session in tests. */
  private val memo = new ConcurrentHashMap[String, String]()

  /** Observability for specs and ops: how many catalog entries this
    * JVM BUILT vs LOADED from a pre-existing on-disk entry. A fresh
    * session re-running the same pipeline should move `loads`, not
    * `builds` — that is the whole catalog contract, and the spec pins
    * it. */
  val builds = new AtomicLong(0L)
  val loads = new AtomicLong(0L)

  /** Drop every in-memory memo entry (on-disk entries untouched) —
    * the "fresh JVM" simulation hook. */
  def resetMemory(): Unit = { memo.clear(); fpMemo.clear() }

  /** Test hook: the memoized payload path for (kind, fingerprint),
    * null if this JVM has not resolved it. */
  private[graft] def pathForTest(kind: String, fingerprint: String): String =
    memo.get(s"$kind#$fingerprint")

  /** Maintenance: drop every on-disk entry of `kind` whose fingerprint
    * is not in `keep` — the vacuum op for slots orphaned by source
    * regeneration (a regenerated dataset moves its fingerprint, so the
    * old slot is unreachable garbage; nothing ever probes it, this just
    * reclaims the storage). Returns the number of entries removed.
    * Production runs this from the same maintenance window as table
    * compaction (the q142 discipline); entries currently memoized by
    * this JVM are never vacuumed even if absent from `keep`. */
  def vacuum(spark: SparkSession, kind: String, keep: Set[String]): Int = {
    val (fs, rp) = rootFs(spark)
    val kindDir = new HPath(rp, kind)
    if (!fs.exists(kindDir)) return 0
    val inUse = {
      import scala.jdk.CollectionConverters._
      memo.values.asScala.toSet
    }
    fs.listStatus(kindDir).count { st =>
      val drop = st.isDirectory &&
        // a concurrent getOrBuild's in-flight build dir has no manifest
        // YET — deleting it would crash the builder mid-write
        !st.getPath.getName.startsWith(".tmp-") &&
        !inUse.contains(st.getPath.toString) &&
        !manifestFingerprint(fs, st.getPath, kind).exists(keep.contains)
      if (drop) fs.delete(st.getPath, true)
      drop
    }
  }

  def root(spark: SparkSession): String =
    spark.conf.getOption("spark.graft.index.root")
      .orElse(sys.env.get("GRAFT_INDEX_ROOT"))
      .getOrElse(s"${System.getProperty("java.io.tmpdir")}/graft-index-catalog")

  /** The root's OWN Hadoop filesystem plus its fully-qualified path —
    * every catalog operation (manifest IO, stamping, rename, vacuum)
    * AND every payload path handed to Spark goes through this one
    * resolution, so the catalog and the engine can never split across
    * filesystems (a scheme-less root on a cluster whose default FS is
    * HDFS would otherwise have Spark writing parquet to HDFS while the
    * driver stamped an empty local directory). Scheme-less roots
    * resolve against the DEFAULT filesystem, and the returned entry
    * paths are fully qualified (e.g. `file:/...`), which Spark reads
    * back verbatim. Rename-based publish is atomic on local and HDFS
    * roots; object stores without atomic rename (raw S3) need a
    * rename-capable layer in front. */
  private def rootFs(spark: SparkSession): (FileSystem, HPath) = {
    val rp = new HPath(root(spark))
    val fs = rp.getFileSystem(spark.sparkContext.hadoopConfiguration)
    (fs, fs.makeQualified(rp))
  }

  /** Content fingerprint of a DataFrame's source files: path + length +
    * mtime per input file, sorted — regenerated data at the same paths
    * moves the fingerprint instead of silently aliasing a stale index.
    * Frames with no files (in-memory fixtures) get a session identity
    * key, marked `mem:` so [[getOrBuild]] knows not to persist it. */
  def contentFingerprint(df: DataFrame): String = {
    val files = df.inputFiles
    if (files.nonEmpty) {
      // memoized per sorted file LIST: q155/q186 fingerprint on every
      // query call, and one getFileStatus per file per call is a real
      // driver metadata-RPC cost on a many-file layout. Same staleness
      // trade as the pre-catalog caches (files regenerated WITHIN one
      // JVM are not re-detected); cleared by [[resetMemory]].
      val key = files.sorted.mkString(",")
      fpMemo.computeIfAbsent(key, { _ =>
        val conf = df.sparkSession.sparkContext.hadoopConfiguration
        files.sorted.map { f =>
          val p = new org.apache.hadoop.fs.Path(f)
          val st = p.getFileSystem(conf).getFileStatus(p)
          s"$f#${st.getLen}#${st.getModificationTime}"
        }.mkString(",")
      })
    } else s"mem:${System.identityHashCode(df)}"
  }

  private val fpMemo = new ConcurrentHashMap[String, String]()

  private def slot(sparkRoot: HPath, kind: String, fingerprint: String): HPath =
    new HPath(new HPath(sparkRoot, kind), sha16(fingerprint))

  private def sha16(s: String): String = {
    val md = java.security.MessageDigest.getInstance("SHA-256")
    md.digest(s.getBytes(StandardCharsets.UTF_8))
      .map("%02x".format(_)).mkString.take(16)
  }

  /** Stamp of a payload directory: count, total bytes, and sha-256 of
    * the sorted relative-path#size list of every regular file except
    * the manifest itself. Size-based (no content hash) — the threat is
    * a reaper or partial copy DELETING or truncating files, which the
    * (path, size) set catches; defending against in-place bit flips is
    * parquet's checksum's job. */
  private def payloadStamp(fs: FileSystem, dir: HPath): String = {
    val it = fs.listFiles(dir, true)
    val entries = scala.collection.mutable.ArrayBuffer.empty[String]
    while (it.hasNext) {
      val f = it.next()
      if (f.isFile && f.getPath.getName != "_graft_manifest.json")
        entries += s"${dir.toUri.relativize(f.getPath.toUri)}#${f.getLen}"
    }
    val sortedE = entries.sorted
    s"${sortedE.size}:${sha16(sortedE.mkString(","))}"
  }

  private def esc(s: String) = s.flatMap {
    case '"' => "\\\""; case '\\' => "\\\\"; case c => c.toString
  }

  private def manifestJson(kind: String, fingerprint: String, payload: String): String =
    s"""{"kind":"${esc(kind)}","fingerprint":"${esc(fingerprint)}","payload":"${esc(payload)}"}"""

  /** The slot's recorded fingerprint, IF its manifest parses, matches
    * `kind`, and the payload stamp still matches the directory — any
    * mismatch (reaped part-file, partial copy, foreign kind) reads as
    * "no entry here". */
  private def manifestFingerprint(fs: FileSystem, dir: HPath, kind: String): Option[String] = {
    val m = new HPath(dir, "_graft_manifest.json")
    if (!fs.isFile(m)) return None
    val in = fs.open(m)
    val text =
      try new String(in.readAllBytes(), StandardCharsets.UTF_8)
      finally in.close()
    // the manifest is machine-written by manifestJson above; rebuild the
    // expected rendering from candidate fields instead of JSON-parsing
    val re = """\{"kind":"(.*)","fingerprint":"(.*)","payload":"(.*)"\}""".r
    text match {
      case re(k, fp, pay) =>
        def unesc(s: String) = s.replace("\\\"", "\"").replace("\\\\", "\\")
        val (ku, fpu, payu) = (unesc(k), unesc(fp), unesc(pay))
        if (ku == kind && payu == payloadStamp(fs, dir)) Some(fpu) else None
      case _ => None
    }
  }

  /** Return the payload directory for (kind, fingerprint), building it
    * with `build` only when no verified on-disk entry exists. `build`
    * receives the directory to write its parquet payload into. */
  def getOrBuild(spark: SparkSession, kind: String, fingerprint: String)
                (build: String => Unit): String =
    memo.computeIfAbsent(s"$kind#$fingerprint", { _ =>
      if (fingerprint.startsWith("mem:")) {
        // ephemeral: identity keys die with the JVM, so must the entry
        val p = graft.TempDirs.create(s"graft-$kind").toString
        build(p); builds.incrementAndGet(); p
      } else {
        val (fs, rp) = rootFs(spark)
        val dst = slot(rp, kind, fingerprint)
        if (manifestFingerprint(fs, dst, kind).contains(fingerprint)) {
          loads.incrementAndGet(); dst.toString
        } else {
          if (fs.exists(dst)) // partial/reaped entry or hash collision
            fs.delete(dst, true)
          val tmp = new HPath(dst.getParent,
            s".tmp-${java.util.UUID.randomUUID().toString.take(13)}")
          fs.mkdirs(tmp)
          build(tmp.toString)
          val out = fs.create(new HPath(tmp, "_graft_manifest.json"))
          try out.write(manifestJson(kind, fingerprint, payloadStamp(fs, tmp))
            .getBytes(StandardCharsets.UTF_8))
          finally out.close()
          // Hadoop rename refuses an existing non-empty destination on
          // both local and HDFS (returns false) — false = lost a
          // cross-process race: keep the winner, drop ours
          if (fs.rename(tmp, dst)) builds.incrementAndGet()
          else {
            fs.delete(tmp, true)
            if (!manifestFingerprint(fs, dst, kind).contains(fingerprint))
              sys.error(s"IndexCatalog: $dst exists with a foreign or " +
                "damaged manifest (fingerprint-hash collision?) — vacuum " +
                "the slot and retry")
            loads.incrementAndGet()
          }
          dst.toString
        }
      }
    })
}
