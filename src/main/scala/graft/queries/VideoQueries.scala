package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.functions.VideoFns
import graft.operators.{StubProber, VideoPipeline}

/** The reference's verbs (build / update / merge / variant report) exposed
  * as driver-checkable queries (SURVEY.md §2.8 Q1–Q4).
  *
  * The file listing is synthesized deterministically from the `documents`
  * fixture (path embeds the doc_id as "/f<id>/"), so the StubProber's
  * arithmetic derivations are reproducible in the DuckDB oracle while the
  * Spark side still exercises the REAL pipeline: scan filters → typed
  * mapPartitions probe → quarantine → column derivation → subtitle join →
  * global sort. Only the presentation strings whose rounding Spark/DuckDB
  * can't both express (hms, humanized sizes) stay out of the oracle — they
  * are pinned by unit tests instead.
  */
object VideoQueries {

  // ------------------------------------------------- synthetic listing
  private def did: Column = col("doc_id")

  /** Path = /vol<v>/<dir>/f<id>/[<year>] Movie <id%59><tags>.<ext> */
  def syntheticListing(s: SparkSession, dir: String): DataFrame = {
    val exts = Seq("mkv", "mp4", "avi", "webm", "txt", "mov", "srt", "wmv", "flv", "mpg")
    val dir1 = when(did % 23 === 0, "Trailers")
      .when(did % 23 === 1, "Extras")
      .otherwise(concat(lit("d"), (did % 7).cast("string")))
    val tag = when(did % 7 === 0, " [4K]")
      .when(did % 7 === 1, " [3D][AV1]")
      .otherwise("")
    val path = concat(
      lit("/vol"), (did % 3).cast("string"), lit("/"), dir1,
      lit("/f"), did.cast("string"),
      lit("/["), (lit(1980) + did % 40).cast("string"), lit("] Movie "),
      (did % 59).cast("string"), tag, lit("."),
      element_at(array(exts.map(lit): _*), (did % 10).cast("int") + 1))
    Tables.documents(s, dir).select(
      path.as("path"),
      (col("n_chars") * 2048 + did).as("sizeBytes"),
      concat(lit("vol"), (did % 3).cast("string")).as("volume"))
  }

  /** Sibling .srt listing: every 3rd doc has an .en.srt, every 6th also an
    * .en.hi.srt — drives the subtitle left-join (U2). */
  def syntheticSrtListing(s: SparkSession, dir: String): DataFrame = {
    val base = syntheticListing(s, dir)
      .withColumn("doc_id", regexp_extract(col("path"), "/f(\\d+)/", 1).cast("long"))
    val srt = base.filter(col("doc_id") % 3 === 0).select(
      VideoFns.siblingPath(col("path"), ".en.srt").as("path"),
      (col("sizeBytes") - col("doc_id")) / 2048 * 3 cast "long" as "size_bytes")
    val hi = base.filter(col("doc_id") % 6 === 0).select(
      VideoFns.siblingPath(col("path"), ".en.hi.srt").as("path"),
      (col("sizeBytes") - col("doc_id")) / 2048 * 4 cast "long" as "size_bytes")
    srt.unionByName(hi)
  }

  private def builtDf(s: SparkSession, dir: String): DataFrame =
    VideoPipeline.build(syntheticListing(s, dir), syntheticSrtListing(s, dir),
                        new StubProber)

  private val outCols = Seq(
    "path", "size_bytes", "volume", "video_codec", "width", "height",
    "nb_streams", "container", "duration_s", "title",
    "compression_candidate", "audio_codec", "audio_channels",
    "srt_avail", "srt_size", "srt_hi_avail", "srt_hi_size", "path_on_volume")

  // ------------------------------------------------------------- q01
  /** BUILD: the full 18-column metadata projection, globally sorted. */
  def q01Build(s: SparkSession, dir: String): DataFrame =
    VideoPipeline.globalSortDesc(builtDf(s, dir))
      .select(outCols.map(col): _*)

  /** A5: quarantine/failure report. */
  def q01Failures(s: SparkSession, dir: String): DataFrame =
    VideoPipeline.failures(syntheticListing(s, dir), new StubProber)
      .orderBy("path")

  // ------------------------------------------------------------- q02
  /** Variant report: group by F9-parsed title, HAVING count > 1. */
  def q02Variants(s: SparkSession, dir: String): DataFrame =
    VideoPipeline.variants(builtDf(s, dir))

  /** A1 detail rows: every duplicated title's per-variant tuples in the
    * reference's reverse-report order. */
  def q02VariantDetail(s: SparkSession, dir: String): DataFrame =
    VideoPipeline.variantDetails(builtDf(s, dir))

  // ------------------------------------------------------------- q03
  /** MERGE: per-volume slices re-unioned + globally re-sorted (the
    * reference's concat-files-then-OS-sort, as one metadata-only union). */
  def q03Merge(s: SparkSession, dir: String): DataFrame = {
    val b = builtDf(s, dir)
    val slices = Seq("vol0", "vol1", "vol2").map(v => b.filter(col("volume") === v))
    VideoPipeline.merge(slices)
      .select("path", "size_bytes", "volume", "width", "height")
      .orderBy(col("size_bytes").desc, col("path"))
  }

  // ------------------------------------------------------------- q04
  /** UPDATE: anti-join novel files against the existing db, probe only
    * the novel ones (existing = docs with id % 4 != 3). */
  def q04Update(s: SparkSession, dir: String): DataFrame = {
    val listing = VideoPipeline.scanFilters(syntheticListing(s, dir))
    val existing = listing
      .withColumn("doc_id", regexp_extract(col("path"), "/f(\\d+)/", 1).cast("long"))
      .filter(col("doc_id") % 4 =!= 3)
      .select("path")
    val novel = VideoPipeline.novelFiles(listing, existing)
    val probed = VideoPipeline.probeStage(novel, new StubProber)
      .filter(col("probe_error").isNull)
    VideoPipeline.deriveColumns(probed)
      .select("path", "size_bytes", "title", "duration_s")
      .orderBy("path")
  }

  // ------------------------------------------------------------ oracles
  /** Shared CTE: the synthetic listing + stub probe, derived from doc_id
    * arithmetic (mirrors syntheticListing + StubProber exactly). */
  private val listingCte =
    """WITH l AS (
      |  SELECT doc_id, n_chars,
      |    CASE WHEN doc_id % 23 = 0 THEN 'Trailers'
      |         WHEN doc_id % 23 = 1 THEN 'Extras'
      |         ELSE 'd' || CAST(doc_id % 7 AS VARCHAR) END AS dir1,
      |    (['mkv','mp4','avi','webm','txt','mov','srt','wmv','flv','mpg'])[CAST(doc_id % 10 AS INT) + 1] AS ext,
      |    CASE WHEN doc_id % 7 = 0 THEN ' [4K]'
      |         WHEN doc_id % 7 = 1 THEN ' [3D][AV1]' ELSE '' END AS tag
      |  FROM documents),
      |paths AS (
      |  SELECT doc_id, n_chars,
      |    '/vol' || CAST(doc_id % 3 AS VARCHAR) || '/' || dir1 || '/f' ||
      |      CAST(doc_id AS VARCHAR) || '/[' || CAST(1980 + doc_id % 40 AS VARCHAR) ||
      |      '] Movie ' || CAST(doc_id % 59 AS VARCHAR) || tag || '.' || ext AS path,
      |    n_chars * 2048 + doc_id AS size_bytes,
      |    'vol' || CAST(doc_id % 3 AS VARCHAR) AS volume
      |  FROM l
      |  WHERE doc_id % 23 NOT IN (0, 1) AND doc_id % 10 NOT IN (4, 6)),
      |probed AS (
      |  SELECT *,
      |    (['H.265 / HEVC (High Efficiency Video Coding)','Alliance for Open Media AV1','H.264 / AVC / MPEG-4 AVC / MPEG-4 part 10','MPEG-4 part 2'])[CAST(doc_id % 4 AS INT) + 1] AS video_codec,
      |    CASE WHEN doc_id % 11 = 0 THEN NULL ELSE ([640,1280,1920,3840])[CAST(doc_id % 4 AS INT) + 1] END AS width,
      |    CASE WHEN doc_id % 11 = 0 THEN NULL ELSE ([360,720,1080,2160])[CAST(doc_id % 4 AS INT) + 1] END AS height,
      |    CAST(2 + doc_id % 3 AS INT) AS nb_streams,
      |    (['Matroska / WebM','QuickTime / MOV','AVI (Audio Video Interleaved)'])[CAST(doc_id % 3 AS INT) + 1] AS container,
      |    CASE WHEN doc_id % 17 = 0 THEN NULL ELSE (doc_id % 9000) + 30 END AS duration_s,
      |    CASE WHEN doc_id % 5 = 0 THEN '<Title Not Set>' ELSE 'Movie ' || CAST(doc_id % 59 AS VARCHAR) END AS title,
      |    CASE WHEN doc_id % 4 IN (0, 1) THEN 'N' ELSE 'Y' END AS compression_candidate,
      |    CASE WHEN doc_id % 13 = 0 THEN NULL ELSE 'AAC (Advanced Audio Coding)' END AS audio_codec,
      |    CASE WHEN doc_id % 13 = 0 THEN NULL ELSE ([2,6,8])[CAST(doc_id % 3 AS INT) + 1] END AS audio_channels,
      |    CASE WHEN doc_id % 3 = 0 THEN 'Y' ELSE 'N' END AS srt_avail,
      |    CASE WHEN doc_id % 3 = 0 THEN n_chars * 3 ELSE NULL END AS srt_size,
      |    CASE WHEN doc_id % 6 = 0 THEN 'Y' ELSE 'N' END AS srt_hi_avail,
      |    CASE WHEN doc_id % 6 = 0 THEN n_chars * 4 ELSE NULL END AS srt_hi_size,
      |    path AS path_on_volume
      |  FROM paths
      |  WHERE doc_id % 29 <> 0)
      |""".stripMargin

  val q01Sql: String = listingCte +
    """SELECT path, size_bytes, volume, video_codec, width, height, nb_streams,
      |  container, duration_s, title, compression_candidate, audio_codec,
      |  audio_channels, srt_avail, srt_size, srt_hi_avail, srt_hi_size,
      |  path_on_volume
      |FROM probed
      |ORDER BY width DESC NULLS LAST, height DESC NULLS LAST, path""".stripMargin

  val q01FailuresSql: String =
    """WITH l AS (
      |  SELECT doc_id,
      |    CASE WHEN doc_id % 23 = 0 THEN 'Trailers'
      |         WHEN doc_id % 23 = 1 THEN 'Extras'
      |         ELSE 'd' || CAST(doc_id % 7 AS VARCHAR) END AS dir1,
      |    (['mkv','mp4','avi','webm','txt','mov','srt','wmv','flv','mpg'])[CAST(doc_id % 10 AS INT) + 1] AS ext,
      |    CASE WHEN doc_id % 7 = 0 THEN ' [4K]'
      |         WHEN doc_id % 7 = 1 THEN ' [3D][AV1]' ELSE '' END AS tag
      |  FROM documents)
      |SELECT '/vol' || CAST(doc_id % 3 AS VARCHAR) || '/' || dir1 || '/f' ||
      |    CAST(doc_id AS VARCHAR) || '/[' || CAST(1980 + doc_id % 40 AS VARCHAR) ||
      |    '] Movie ' || CAST(doc_id % 59 AS VARCHAR) || tag || '.' || ext AS path,
      |  'simulated ffprobe failure' AS probe_error
      |FROM l
      |WHERE doc_id % 23 NOT IN (0, 1) AND doc_id % 10 NOT IN (4, 6)
      |  AND doc_id % 29 = 0
      |ORDER BY path""".stripMargin

  val q02Sql: String = listingCte +
    """SELECT 'Movie ' || CAST(doc_id % 59 AS VARCHAR) AS parsed_title,
      |  COUNT(*) AS n_variants,
      |  MIN(size_bytes) AS min_size,
      |  MAX(size_bytes) AS max_size,
      |  COUNT(DISTINCT 1980 + doc_id % 40) AS n_years
      |FROM probed
      |GROUP BY 1
      |HAVING COUNT(*) > 1
      |ORDER BY parsed_title""".stripMargin

  val q02DetailSql: String = listingCte +
    """, titled AS (
      |  SELECT 'Movie ' || CAST(doc_id % 59 AS VARCHAR) AS parsed_title,
      |    width, height, duration_s, size_bytes, volume, path,
      |    COUNT(*) OVER (PARTITION BY doc_id % 59) AS n_variants
      |  FROM probed)
      |SELECT parsed_title, width, height, duration_s, size_bytes, volume, path
      |FROM titled
      |WHERE n_variants > 1
      |ORDER BY parsed_title, width ASC NULLS FIRST, height ASC NULLS FIRST,
      |  path DESC""".stripMargin

  val q03Sql: String = listingCte +
    """SELECT path, size_bytes, volume, width, height
      |FROM probed
      |ORDER BY size_bytes DESC, path""".stripMargin

  val q04Sql: String = listingCte +
    """SELECT path, size_bytes, title, duration_s
      |FROM probed
      |WHERE doc_id % 4 = 3
      |ORDER BY path""".stripMargin

  // ------------------------------------------------------------ wiring
  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q01_build"     -> (q01Build _),
    "q01_failures"  -> (q01Failures _),
    "q02_variants"  -> (q02Variants _),
    "q02_variant_detail" -> (q02VariantDetail _),
    "q03_merge"     -> (q03Merge _),
    "q04_update"    -> (q04Update _))

  val oracles: Map[String, String] = Map(
    "q01_build"    -> q01Sql,
    "q01_failures" -> q01FailuresSql,
    "q02_variants" -> q02Sql,
    "q02_variant_detail" -> q02DetailSql,
    "q03_merge"    -> q03Sql,
    "q04_update"   -> q04Sql)
}
