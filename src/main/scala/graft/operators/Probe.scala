package graft.operators

import scala.sys.process._
import scala.util.control.NonFatal

/** One probed file's metadata — the union of the reference's two ffprobe
  * invocations (video_metadata_db.py:596-634) plus an error side-channel.
  * Absent values are None (nullable columns), NEVER omitted fields: the
  * reference's ragged-row TSV quirk is reproduced only at the export edge.
  */
case class ProbeResult(
    videoCodec: Option[String] = None,
    width: Option[Int] = None,
    height: Option[Int] = None,
    nbStreams: Option[Int] = None,
    container: Option[String] = None,
    durationRaw: Option[String] = None,
    title: Option[String] = None,
    audioCodec: Option[String] = None,
    audioChannels: Option[Int] = None,
    probeError: Option[String] = None)

/** Pluggable probe boundary (SURVEY.md §2.2). Implementations must be
  * Serializable — they ship to executors and run inside mapPartitions,
  * one instance per partition, NOT one process fork per row setup.
  */
trait Prober extends Serializable {
  def probe(path: String): ProbeResult
}

/** Real ffprobe prober. ONE invocation per file fetches both the video and
  * audio entries (the reference runs ffprobe twice per file by its own
  * admission, video_metadata_db.py:593-594 — fusing them halves process
  * forks, the dominant cost of the probe stage).
  *
  * Per-row failures are captured into `probeError` (P3) so one corrupt
  * file never fails a 100 TB job; the quarantine set is a filter away.
  */
final class FfprobeProber(timeoutSec: Int = 30) extends Prober {

  private def run(cmd: Seq[String]): Seq[String] = {
    val out = new StringBuilder
    val err = new StringBuilder
    val proc = Process(cmd).run(ProcessLogger(l => out.append(l).append('\n'),
                                              l => err.append(l).append('\n')))
    // bounded wait — a wedged probe (truncated container, dead NFS) must
    // quarantine the ROW, not hang the task slot
    val done = new java.util.concurrent.CompletableFuture[Int]()
    val waiter = new Thread(() => done.complete(proc.exitValue()))
    waiter.setDaemon(true)
    waiter.start()
    val status =
      try done.get(timeoutSec.toLong, java.util.concurrent.TimeUnit.SECONDS)
      catch {
        case _: java.util.concurrent.TimeoutException =>
          proc.destroy()
          throw new RuntimeException(s"ffprobe timeout after ${timeoutSec}s")
      }
    if (status != 0) throw new RuntimeException(
      s"ffprobe exit $status: ${err.toString.trim.take(200)}")
    out.toString.split('\n').toSeq.filter(_.nonEmpty)
  }

  override def probe(path: String): ProbeResult =
    try {
      // Positional output parity with video_metadata_db.py:218-225:
      // codec_long_name, width, height, nb_streams, format_long_name,
      // duration, [title]
      val v = run(Seq("ffprobe", "-v", "error", "-select_streams", "v:0",
        "-show_entries",
        "format_tags=title:format=nb_streams,format_long_name:stream=codec_long_name,width,height:format=duration",
        "-print_format", "default=noprint_wrappers=1:nokey=1", "-i", path))
      // Audio entries (video_metadata_db.py:227-229): codec_long_name,
      // channels; absence detected by line count != 2 (ref :320-339).
      val a = try run(Seq("ffprobe", "-v", "error", "-select_streams", "a:0",
        "-show_entries", "stream=channels,codec_long_name",
        "-print_format", "default=noprint_wrappers=1:nokey=1", "-i", path))
      catch { case NonFatal(_) => Seq.empty }
      ProbeResult(
        videoCodec = v.lift(0),
        width = v.lift(1).flatMap(_.toIntOption),
        height = v.lift(2).flatMap(_.toIntOption),
        nbStreams = v.lift(3).flatMap(_.toIntOption),
        container = v.lift(4),
        durationRaw = v.lift(5),
        title = v.lift(6),
        audioCodec = if (a.length == 2) Some(a(0)) else None,
        audioChannels = if (a.length == 2) a(1).toIntOption else None)
    } catch {
      case NonFatal(e) => ProbeResult(probeError = Some(e.getMessage))
    }
}

/** Deterministic stub prober: derives every field arithmetically from a
  * numeric file id embedded in the path as "/f<id>/" (the test listings
  * put it there). Lets correctness tests and the DuckDB oracle reproduce
  * probe output without ffmpeg — the Spark-side plumbing (mapPartitions,
  * schema, quarantine) is identical to production.
  */
final class StubProber extends Prober {
  private val FileId = ".*/f(\\d+)/.*".r

  override def probe(path: String): ProbeResult = path match {
    case FileId(idStr) =>
      val id = idStr.toLong
      if (id % 29 == 0)
        ProbeResult(probeError = Some("simulated ffprobe failure"))
      else {
        val widths  = Array(640, 1280, 1920, 3840)
        val heights = Array(360, 720, 1080, 2160)
        val codecs = Array(
          "H.265 / HEVC (High Efficiency Video Coding)",
          "Alliance for Open Media AV1",
          "H.264 / AVC / MPEG-4 AVC / MPEG-4 part 10",
          "MPEG-4 part 2")
        val containers = Array(
          "Matroska / WebM", "QuickTime / MOV",
          "AVI (Audio Video Interleaved)")
        val noDim = id % 11 == 0
        val noAudio = id % 13 == 0
        ProbeResult(
          videoCodec = Some(codecs((id % 4).toInt)),
          width = if (noDim) None else Some(widths((id % 4).toInt)),
          height = if (noDim) None else Some(heights((id % 4).toInt)),
          nbStreams = Some(2 + (id % 3).toInt),
          container = Some(containers((id % 3).toInt)),
          durationRaw = if (id % 17 == 0) Some("N/A")
                        else Some(((id % 9000) + 30).toString),
          title = if (id % 5 == 0) None else Some(s"Movie ${id % 59}"),
          audioCodec = if (noAudio) None
                       else Some("AAC (Advanced Audio Coding)"),
          audioChannels = if (noAudio) None
                          else Some(Array(2, 6, 8)((id % 3).toInt)))
      }
    case _ => ProbeResult(probeError = Some(s"unparseable stub path: $path"))
  }
}
