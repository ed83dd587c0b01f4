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
  * content fingerprint of the source data keys the entry, a tiny
  * manifest records which fingerprint the payload was built from, and a
  * fresh session LOADS on manifest hit instead of rebuilding.
  *
  * Layout (one entry — the OBJECT-STORE-SAFE shape):
  * {{{
  *   <root>/<kind>/<sha16(fingerprint)>.manifest.json   // commit point
  *   <root>/<kind>/<sha16(fingerprint)>-<nonce>/        // immutable payload
  *     ... payload parquet (builder-defined; may be subdirs) ...
  * }}}
  * The payload directory is NONCE-NAMED and immutable: nothing
  * references it until the manifest names it, so a half-built payload
  * is invisible by construction — no directory rename, no window where
  * a reader can list a partially-copied tree. The commit point is the
  * single manifest FILE: written complete to a `.tmp-` sibling and
  * moved into place with a single-file rename (atomic on local/HDFS;
  * on object-store connectors a single-file "rename" is a server-side
  * full-object copy, so the manifest still appears complete-or-absent —
  * the property directory rename does NOT have there, which is why the
  * round-10 dir-rename protocol was replaced). A reader that somehow
  * observes a torn manifest (no real filesystem shows one, but the
  * non-atomic-rename shim in IndexCatalogSpec simulates it) fails the
  * parse or the stamp check and treats the slot as "no entry" —
  * fail-safe in every world.
  *
  * The manifest's `stamp` field is a stamp of the payload file set
  * (count + sha-256 of the sorted relative-path#size list): a load
  * re-stamps the directory and treats ANY mismatch as no-entry —
  * without it, an age-based /tmp reaper that deletes part-files but
  * leaves the (recently re-read) manifest would hand a fresh session a
  * silently truncated index. All manifest values are base64-encoded, so
  * decoding is the exact inverse of encoding for EVERY fingerprint
  * (backslash-laden Windows paths and exotic URIs included — the
  * round-10 escape/unescape pair was not an inverse for those, and such
  * entries rebuilt on every fresh session).
  *
  * Race arbitration: rename-to-existing fails on Hadoop filesystems, so
  * a lost cross-process publish race deletes its own payload + tmp
  * manifest and loads the winner after verifying it. Stale entries are
  * never probed: a REGENERATED source changes (length, mtime) per input
  * file, so its fingerprint — and therefore its manifest slot — moves;
  * orphaned payloads (crashed builders, lost races, retired entries)
  * are storage garbage for [[vacuum]] (the q142 discipline), never a
  * correctness hazard.
  *
  * In-memory fixtures (no input files) get a `mem:`-prefixed
  * fingerprint from a MONOTONIC per-frame id (a weak identity map, so
  * an id is never recycled after GC the way an identityHashCode can
  * be) — those are NEVER persisted; they build into a [[graft.TempDirs]]
  * tree exactly as before and are dropped by [[resetMemory]].
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
  def resetMemory(): Unit = memo.clear()

  /** Test hook: the memoized payload path for (kind, fingerprint),
    * null if this JVM has not resolved it. */
  private[graft] def pathForTest(kind: String, fingerprint: String): String =
    memo.get(s"$kind#$fingerprint")

  /** Test hook: where (kind, fingerprint)'s manifest file lives. */
  private[graft] def manifestPathForTest(spark: SparkSession, kind: String,
                                         fingerprint: String): String = {
    val (_, rp) = rootFs(spark)
    manifestPath(rp, kind, fingerprint).toString
  }

  /** Maintenance: drop every on-disk entry of `kind` whose fingerprint
    * is not in `keep`, plus any UNREFERENCED leftovers (crashed-builder
    * payload dirs, lost-race tmp manifests, damaged manifests) older
    * than `orphanAgeMs` — the vacuum op for slots orphaned by source
    * regeneration (a regenerated dataset moves its fingerprint, so the
    * old slot is unreachable garbage; nothing ever probes it, this just
    * reclaims the storage). Returns the number of items removed.
    * Production runs this from the same maintenance window as table
    * compaction (the q142 discipline); entries currently memoized by
    * this JVM are never vacuumed even if absent from `keep`, and the
    * age threshold keeps an IN-FLIGHT build's not-yet-referenced
    * payload safe (its files are seconds old; the default is a day).
    *
    * RETENTION CONTRACT (cross-process): the `inUse` guard covers only
    * THIS JVM's memo. A session in ANOTHER process that resolved an
    * entry keeps serving queries from its payload path with no lease on
    * disk, so a keep-set-driven vacuum can retire that entry mid-query:
    * the other session's reads then fail (FileNotFoundException from
    * the scan) and its next lookup/getOrBuild rebuilds — fail-safe,
    * never a wrong result, but a full-corpus rebuild. Operationally:
    * `orphanAgeMs` must exceed the maximum session lifetime, and the
    * keep set must include every fingerprint a live session may still
    * hold (IndexCatalogSpec pins the failure-then-rebuild behavior).
    *
    * Transient-IO discipline: a manifest whose probe hits a transient
    * IOException is skipped in pass 1 (never retired), and because its
    * payload reference could not be harvested, pass 2 skips every item
    * under that manifest's NAME PREFIX (publish() names the payload
    * `<sha16>-<nonce>` after its `<sha16>.manifest.json`) — otherwise
    * pass 2 would read the healthy-but-unprobeable entry's payload as
    * an unreferenced orphan and delete it past the age threshold,
    * stranding a manifest that points at nothing (the exact
    * full-rebuild outcome the skip exists to prevent). The rest of the
    * kind keeps reclaiming normally, so a chronically unreadable
    * manifest (bad ACL, per-object throttling) defers reclamation of
    * ITS slot only, never the whole kind's.
    *
    * Residual of that skip: everything under the unprobeable
    * manifest's sha16 prefix is shielded — including its own
    * `.tmp-<nonce>` publish remnants and superseded duplicate payloads
    * from lost publish races on the same fingerprint — so a
    * chronically bad slot (e.g. a permanent ACL wedge) accumulates
    * unreclaimed garbage without bound until the manifest becomes
    * probeable or is removed out-of-band. Bounded by construction to
    * one slot's worth of publish attempts, but not by this method;
    * every window therefore COUNTS the shielded items and reports them
    * on stderr, so a slot that never reclaims is visible to an
    * operator as a repeating `skipped_by_prefix` line rather than
    * silent disk growth. */
  def vacuum(spark: SparkSession, kind: String, keep: Set[String],
             orphanAgeMs: Long = 24L * 3600 * 1000): Int = {
    val (fs, rp) = rootFs(spark)
    val kd = kindDir(rp, kind)
    if (!fs.exists(kd)) return 0
    val inUse = {
      import scala.jdk.CollectionConverters._
      memo.values.asScala.toSet
    }
    var removed = 0
    // pass 1: manifests — retire unkept entries (manifest FIRST, so no
    // new reader can acquire the dying payload), keep note of every
    // payload a surviving manifest references
    val referenced = scala.collection.mutable.Set.empty[String]
    val unprobeablePrefixes = scala.collection.mutable.Set.empty[String]
    for (st <- fs.listStatus(kd)
         if st.isFile && st.getPath.getName.endsWith(".manifest.json")) {
      // a transient IO error while probing must SKIP the entry, never
      // retire it — deleting a healthy kept manifest on a store hiccup
      // would cost the next session a full-corpus rebuild. One retry
      // (transient means the next attempt may answer); if that fails
      // too the entry's payload reference is UNKNOWN — but its SHAPE
      // is not: publish() names the payload `<sha16>-<nonce>` after
      // its manifest `<sha16>.manifest.json`, so pass 2 below protects
      // everything under the unprobeable manifest's name prefix and
      // keeps reclaiming the REST of the kind (a chronically
      // unreadable manifest — bad ACL, per-object throttling — must
      // not disable orphan reclamation for the whole kind forever).
      val probed =
        try Some(verifiedEntry(fs, rp, kind, st.getPath))
        catch {
          case _: java.io.IOException =>
            try Some(verifiedEntry(fs, rp, kind, st.getPath))
            catch { case _: java.io.IOException => None }
        }
      probed match {
        case Some(Some((fp, payload)))
            if keep.contains(fp) || inUse.contains(payload.toString) =>
          referenced += payload.getName
        case Some(Some((_, payload))) =>
          fs.delete(st.getPath, false)
          fs.delete(payload, true)
          removed += 1
        case Some(None) => // definitively damaged/stale; payload ages out below
          fs.delete(st.getPath, false)
          removed += 1
        case None => // transient: leave the entry AND its prefix-named
          // payload for the next maintenance window
          unprobeablePrefixes += st.getPath.getName.stripSuffix(".manifest.json")
      }
    }
    // pass 2: unreferenced leftovers past the age threshold. Items
    // sharing an unprobeable manifest's name prefix are skipped — that
    // manifest's payload reference was never harvested into
    // `referenced`, so its (healthy, aged) payload would otherwise be
    // deleted out from under the surviving manifest. Reclamation of
    // the skipped prefix resumes the next window; everything else in
    // the kind reclaims normally even while one manifest stays
    // unreadable.
    val now = System.currentTimeMillis()
    var skippedByPrefix = 0
    for (st <- fs.listStatus(kd)
         if !st.getPath.getName.endsWith(".manifest.json") &&
           !referenced.contains(st.getPath.getName) &&
           !inUse.contains(st.getPath.toString) &&
           now - st.getModificationTime >= orphanAgeMs) {
      if (unprobeablePrefixes.exists(st.getPath.getName.startsWith))
        skippedByPrefix += 1 // shielded: see the residual note above
      else {
        fs.delete(st.getPath, true)
        removed += 1
      }
    }
    if (skippedByPrefix > 0)
      System.err.println(s"[index-catalog] vacuum($kind): skipped_by_prefix=" +
        s"$skippedByPrefix aged item(s) shielded by ${unprobeablePrefixes.size} " +
        "unprobeable manifest prefix(es); reclamation deferred to a window " +
        "where the manifest probes (a repeating line here = a slot that " +
        "never reclaims)")
    removed
  }

  def root(spark: SparkSession): String =
    spark.conf.getOption("spark.graft.index.root")
      .orElse(sys.env.get("GRAFT_INDEX_ROOT"))
      .getOrElse(s"${System.getProperty("java.io.tmpdir")}/graft-index-catalog")

  /** The root's OWN Hadoop filesystem plus its fully-qualified path —
    * every catalog operation (manifest IO, stamping, vacuum) AND every
    * payload path handed to Spark goes through this one resolution, so
    * the catalog and the engine can never split across filesystems (a
    * scheme-less root on a cluster whose default FS is HDFS would
    * otherwise have Spark writing parquet to HDFS while the driver
    * stamped an empty local directory). Scheme-less roots resolve
    * against the DEFAULT filesystem, and the returned entry paths are
    * fully qualified (e.g. `file:/...`), which Spark reads back
    * verbatim. */
  private def rootFs(spark: SparkSession): (FileSystem, HPath) = {
    val rp = new HPath(root(spark))
    val fs = rp.getFileSystem(spark.sparkContext.hadoopConfiguration)
    (fs, fs.makeQualified(rp))
  }

  /** Content fingerprint of a DataFrame's source files: path + length +
    * mtime per input file, sorted — regenerated data at the same paths
    * moves the fingerprint instead of silently aliasing a stale index.
    * Re-stats on EVERY call (data regenerated in place at the same file
    * names — external writers; Spark's own overwrite randomizes part
    * names, but nothing guarantees every writer does — must move the
    * fingerprint WITHIN a JVM too; the round-10 per-file-list memo did
    * not re-detect that, the round-11 ADVICE regression). The re-stat
    * is batched to one `listStatus` per parent DIRECTORY per call, so a
    * many-file layout pays directory-count metadata RPCs, not
    * file-count. Frames with no files (in-memory fixtures) get a
    * monotonic per-frame identity key, marked `mem:` so [[getOrBuild]]
    * knows not to persist it. */
  def contentFingerprint(df: DataFrame): String = {
    val files = df.inputFiles
    if (files.isEmpty)
      return s"mem:${memIds.computeIfAbsent(df, _ => memIdGen.incrementAndGet())}"
    val conf = df.sparkSession.sparkContext.hadoopConfiguration
    val sorted = files.sorted
    val byParent: Map[HPath, Map[String, (Long, Long)]] =
      sorted.iterator.map(f => new HPath(f).getParent).distinct.map { parent =>
        parent -> parent.getFileSystem(conf).listStatus(parent).iterator
          .map(st => st.getPath.getName ->
            (st.getLen, st.getModificationTime)).toMap
      }.toMap
    sorted.map { f =>
      val p = new HPath(f)
      val (len, mtime) = byParent(p.getParent).getOrElse(p.getName, {
        // name absent from the batch listing (deleted mid-call, or a
        // listing-vs-inputFiles qualification quirk): a direct stat
        // either answers or throws the honest FileNotFoundException
        val st = p.getFileSystem(conf).getFileStatus(p)
        (st.getLen, st.getModificationTime)
      })
      s"$f#$len#$mtime"
    }.mkString(",")
  }

  /** Monotonic ids for file-less in-memory frames: a weak identity map
    * (a GC'd frame's id is simply never handed out again) instead of
    * `System.identityHashCode`, whose value a NEW frame can legally
    * reuse after the old one is collected — which would alias the new
    * frame onto the old frame's catalog entry. */
  private val memIdGen = new AtomicLong(0L)
  private val memIds = java.util.Collections.synchronizedMap(
    new java.util.WeakHashMap[DataFrame, java.lang.Long]())

  private def kindDir(rootP: HPath, kind: String): HPath = new HPath(rootP, kind)

  private def manifestPath(rootP: HPath, kind: String, fingerprint: String): HPath =
    new HPath(kindDir(rootP, kind), s"${sha16(fingerprint)}.manifest.json")

  private def sha16(s: String): String = {
    val md = java.security.MessageDigest.getInstance("SHA-256")
    md.digest(s.getBytes(StandardCharsets.UTF_8))
      .map("%02x".format(_)).mkString.take(16)
  }

  private def nonce(): String = java.util.UUID.randomUUID().toString.take(13)

  /** Stamp of a payload directory: count and sha-256 of the sorted
    * relative-path#size list of every regular file. Size-based (no
    * content hash) — the threat is a reaper or partial copy DELETING or
    * truncating files, which the (path, size) set catches; defending
    * against in-place bit flips is parquet's checksum's job. */
  private def payloadStamp(fs: FileSystem, dir: HPath): String = {
    val it = fs.listFiles(dir, true)
    val entries = scala.collection.mutable.ArrayBuffer.empty[String]
    while (it.hasNext) {
      val f = it.next()
      if (f.isFile)
        entries += s"${dir.toUri.relativize(f.getPath.toUri)}#${f.getLen}"
    }
    val sortedE = entries.sorted
    s"${sortedE.size}:${sha16(sortedE.mkString(","))}"
  }

  // base64 every manifest value: decode is the exact inverse of encode
  // for ANY string, and the charset ([A-Za-z0-9+/=]) can never collide
  // with the JSON framing — no escaping to get wrong
  private def b64(s: String): String = java.util.Base64.getEncoder
    .encodeToString(s.getBytes(StandardCharsets.UTF_8))
  private def unb64(s: String): String =
    new String(java.util.Base64.getDecoder.decode(s), StandardCharsets.UTF_8)

  private def manifestJson(kind: String, fingerprint: String,
                           payloadDirName: String, stamp: String): String =
    s"""{"v":2,"kind":"${b64(kind)}","fingerprint":"${b64(fingerprint)}",""" +
      s""""payload_dir":"${b64(payloadDirName)}","stamp":"${b64(stamp)}"}"""

  private val ManifestRe =
    ("""\{"v":2,"kind":"([A-Za-z0-9+/=]*)","fingerprint":"([A-Za-z0-9+/=]*)",""" +
      """"payload_dir":"([A-Za-z0-9+/=]*)","stamp":"([A-Za-z0-9+/=]*)"\}""").r

  /** The one payload-directory name shape [[publish]] ever generates:
    * sha16(fingerprint) + "-" + a 13-char UUID-prefix nonce. Every
    * consumer of a DECODED payload_dir validates against this before
    * resolving it under the kind dir — a manifest that parses but whose
    * payload_dir decodes to "..", "", or a multi-segment path must read
    * as damage, because retire()/vacuum recursively DELETE the resolved
    * path and a traversal value would aim that delete at the catalog
    * root's parent instead of one payload. */
  private val PayloadDirRe = "^[0-9a-f]{16}-[0-9a-f-]{1,16}$".r

  /** Decode a manifest body: None on ANY malformation — including
    * base64 that passes the regex's charset but fails to decode
    * (mis-padded / length-invalid values throw IllegalArgumentException,
    * which must read as damage, not crash a probe), and a decoded
    * payload_dir outside the generated single-segment shape
    * ([[PayloadDirRe]] — the recursive-delete traversal guard). */
  private def parseManifest(text: String): Option[(String, String, String, String)] =
    text match {
      case ManifestRe(k, fp, pd, st) =>
        try {
          val pdDec = unb64(pd)
          if (PayloadDirRe.findFirstIn(pdDec).isEmpty) None
          else Some((unb64(k), unb64(fp), pdDec, unb64(st)))
        } catch { case _: IllegalArgumentException => None }
      case _ => None
    }

  /** Parse + verify the manifest at `m`: Some((fingerprint, payload
    * path)) iff it parses, names this `kind`, its payload directory
    * exists, and the payload stamp still matches — any DEFINITIVE
    * mismatch (torn write, reaped part-file, partial copy, foreign
    * kind) reads as "no entry here", as does FileNotFoundException
    * (something deleted the file between list and open). Any OTHER
    * IOException (object-store throttling, a transient store error)
    * PROPAGATES: a transient hiccup must never read as a missing index
    * — the caller would rebuild a full-corpus artifact — nor as damage
    * — vacuum would retire a healthy entry. */
  private def verifiedEntry(fs: FileSystem, rootP: HPath, kind: String,
                            m: HPath): Option[(String, HPath)] =
    try {
      if (!fs.isFile(m)) return None
      val in = fs.open(m)
      val text =
        try new String(in.readAllBytes(), StandardCharsets.UTF_8)
        finally in.close()
      parseManifest(text) match {
        case Some((k, fp, pd, st)) =>
          val payload = new HPath(kindDir(rootP, kind), pd)
          if (k == kind && fs.exists(payload) &&
            st == payloadStamp(fs, payload))
            Some((fp, payload))
          else None
        case None => None
      }
    } catch {
      case _: java.io.FileNotFoundException => None
      // a checksummed local FS surfacing manifest rot: definitive
      // damage (retire + rebuild), not a transient to retry
      case _: org.apache.hadoop.fs.ChecksumException => None
    }

  /** Read-only probe: the verified payload path for (kind,
    * fingerprint), if a committed entry exists. Never builds, never
    * memoizes — the concurrent-reader path (and its spec). Fail-safe
    * on EVERY IO error: a reader that can't probe simply has no entry. */
  def lookup(spark: SparkSession, kind: String, fingerprint: String): Option[String] =
    try {
      val (fs, rp) = rootFs(spark)
      verifiedEntry(fs, rp, kind, manifestPath(rp, kind, fingerprint))
        .collect { case (fp, payload) if fp == fingerprint => payload.toString }
    } catch { case _: java.io.IOException => None }

  /** Retire a stale slot: manifest FIRST (so no new reader can acquire
    * the dying payload), then the payload directory it referenced.
    * Losing this delete to a concurrent retirer is harmless — deletes
    * are idempotent. A non-FNF IOException propagates (an entry must
    * never be half-retired on a transient error the caller can retry).
    * The payload delete trusts parseManifest's [[PayloadDirRe]] shape
    * guard: a damaged manifest whose payload_dir decodes to a traversal
    * value parses as None here, so only the manifest is dropped and the
    * real payload (if any) ages out through vacuum's orphan pass. */
  private def retire(fs: FileSystem, rootP: HPath, kind: String, m: HPath): Unit = {
    val payloadName =
      try {
        if (!fs.isFile(m)) return
        val in = fs.open(m)
        val text =
          try new String(in.readAllBytes(), StandardCharsets.UTF_8)
          finally in.close()
        parseManifest(text).map(_._3)
      } catch {
        case _: java.io.FileNotFoundException => return
        // damaged beyond reading: drop the manifest; its payload (if
        // any) ages out through vacuum's orphan pass
        case _: org.apache.hadoop.fs.ChecksumException => None
      }
    fs.delete(m, false)
    payloadName.foreach(n => fs.delete(new HPath(kindDir(rootP, kind), n), true))
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
      } else publish(spark, kind, fingerprint)(build)
    })

  /** The non-memoized load-or-publish body — what two PROCESSES racing
    * on the same slot each execute (the in-JVM memo above serializes
    * same-key callers, so only the spec can drive this reentrantly;
    * IndexCatalogSpec's race tests call it directly to simulate the
    * rival process). */
  private[graft] def publish(spark: SparkSession, kind: String,
                             fingerprint: String)
                            (build: String => Unit): String = {
    val (fs, rp) = rootFs(spark)
    val mpath = manifestPath(rp, kind, fingerprint)
    def verifiedPayload(): Option[String] =
      verifiedEntry(fs, rp, kind, mpath)
        .collect { case (fp, payload) if fp == fingerprint => payload.toString }
    verifiedPayload() match {
      case Some(p) => loads.incrementAndGet(); p
      case None =>
        // stale slot (reaped payload, torn manifest, or a
        // fingerprint-hash collision's foreign entry): retire it so
        // our commit rename can land
        retire(fs, rp, kind, mpath)
        val payload = new HPath(kindDir(rp, kind),
          s"${sha16(fingerprint)}-${nonce()}")
        fs.mkdirs(payload)
        try build(payload.toString)
        catch { case e: Throwable => fs.delete(payload, true); throw e }
        val stamp = payloadStamp(fs, payload)
        // a same-fingerprint entry may have been committed while we
        // built: ADOPT it rather than replace it — this keeps the
        // POSIX replace-race window at probe→rename milliseconds
        // instead of the whole build
        verifiedPayload() match {
          case Some(p) =>
            fs.delete(payload, true)
            loads.incrementAndGet(); p
          case None =>
            // commit = the manifest FILE appearing complete: written to
            // a tmp name, then a SINGLE-FILE rename (atomic on
            // local/HDFS; complete-or-absent even as an object-store
            // copy — and a torn read still fails the parse, see class
            // doc). rename-to-existing FAILS on HDFS but silently
            // REPLACES on POSIX/local (rename(2) semantics), so a true
            // return does not prove we won a concurrent race: the
            // arbitration is the READ-BACK below — whatever payload the
            // commit point names after our rename IS the entry; a
            // publisher whose payload lost deletes its own and adopts
            // the winner's. The residual — a replace landing between
            // two publishers' read-backs — leaves one UNREFERENCED
            // payload for vacuum's age threshold, never a wrong result.
            val tmp = new HPath(kindDir(rp, kind),
              s"${mpath.getName}.tmp-${nonce()}")
            val out = fs.create(tmp, false)
            try out.write(
              manifestJson(kind, fingerprint, payload.getName, stamp)
                .getBytes(StandardCharsets.UTF_8))
            finally out.close()
            if (!fs.rename(tmp, mpath)) fs.delete(tmp, false)
            verifiedEntry(fs, rp, kind, mpath) match {
              case Some((fp, won))
                  if fp == fingerprint && won.getName == payload.getName =>
                builds.incrementAndGet(); payload.toString
              case Some((fp, won)) if fp == fingerprint =>
                // lost (rename refused on HDFS, or a later rename
                // replaced ours on POSIX): drop our payload, adopt
                // the winner's
                fs.delete(payload, true)
                loads.incrementAndGet(); won.toString
              case _ =>
                fs.delete(payload, true)
                sys.error(s"IndexCatalog: $mpath holds a foreign or " +
                  "damaged manifest after publish (fingerprint-hash " +
                  "collision?) — vacuum the slot and retry")
            }
        }
    }
  }
}
