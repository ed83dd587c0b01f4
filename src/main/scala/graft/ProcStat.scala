package graft

/** /proc-based attribution primitives shared by the measurement mains
  * ([[Bench]], [[GateFloor]]): window-scoped CPU/IO shares that answer
  * "is this wall-clock reading impeached by co-tenant CPU or storage
  * stalls?" mechanically, at measurement time, instead of via
  * post-commit forensics. Extracted from Bench in round 15 so the gate
  * floors are produced under the SAME attribution discipline as the
  * suite rows they are subtracted from (the round-14 verdict's one
  * defective artifact was GateFloor measuring without sidecars).
  *
  * All reads are plain procfs text (Linux-only — the only driver
  * environment); any failure degrades to -1 fields, never a crash.
  */
object ProcStat {

  /** (busy, total, iowait) jiffies from /proc/stat's cpu line. iowait
    * is carried SEPARATELY because it is deliberately not in `busy`:
    * other_cpu answers "was a CPU co-tenant stealing cycles?" and a
    * disk-stalled core steals nothing. `io_wait` in the sidecar closes
    * the trichotomy: wall spike + quiet other_cpu + high io_wait =
    * storage contention, dismissible in one line (the q155 round-14
    * lesson). First 8 fields only (user nice system idle iowait irq
    * softirq steal): the kernel folds guest/guest_nice into user/nice,
    * so summing all 10 double-counts guest time on a VM-hosting box
    * (round-13 ADVICE). */
  def busyTotalIoWait(): (Long, Long, Long) =
    try {
      val line = java.nio.file.Files.readAllLines(
        java.nio.file.Paths.get("/proc/stat")).get(0)
      val f = line.trim.split("\\s+").drop(1).take(8).map(_.toLong)
      val iow = if (f.length > 4) f(4) else 0L
      val idle = f(3) + iow
      (f.sum - idle, f.sum, iow)
    } catch { case scala.util.control.NonFatal(_) => (-1L, -1L, -1L) }

  /** This process's utime+stime jiffies (in local mode the executors
    * are this JVM, so this is "our" share of the window). */
  def selfJiffies(): Long =
    try {
      val s = new String(java.nio.file.Files.readAllBytes(
        java.nio.file.Paths.get("/proc/self/stat")), "UTF-8")
      // comm may contain spaces/parens: fields restart after last ')'
      val rest = s.substring(s.lastIndexOf(')') + 2).split(" ")
      rest(11).toLong + rest(12).toLong // utime + stime
    } catch { case scala.util.control.NonFatal(_) => -1L }

  def loadAvg(): Double =
    java.lang.management.ManagementFactory.getOperatingSystemMXBean
      .getSystemLoadAverage

  /** One window's attribution: shares of the box's jiffies during a
    * measurement, split into this JVM's work, everyone else's, and
    * storage stall. -1 fields mean procfs was unreadable. */
  case class Window(otherCpu: Double, ownCpu: Double, ioWait: Double,
                    load: Double) {
    /** The round-14 verdict's row-wise quiet rule: a reading whose own
      * window shows co-tenant CPU above ~0.05 or storage stall above
      * ~0.02 impeaches itself and should be re-taken, not published
      * then dismissed post-commit. Unjudgeable (-1) windows are NOT
      * impeached — there is nothing to retry against. */
    def impeached: Boolean =
      otherCpu > ImpeachOtherCpu || ioWait > ImpeachIoWait
  }

  /** Impeachment thresholds (round-14 verdict "Next round" #2): chosen
    * from three rounds of forensics — every dismissed-after-commit
    * band read other_cpu 0.078–0.154, every isolated quiet rep read
    * ≤ 0.03; io_wait quiet reps read ≤ 0.01. */
  val ImpeachOtherCpu = 0.05
  val ImpeachIoWait = 0.02

  /** Run `body`, returning (its result, the window's attribution). */
  def windowed[A](body: => A): (A, Window) = {
    val (b0, t0, w0) = busyTotalIoWait(); val s0 = selfJiffies()
    val r = body
    val (b1, t1, w1) = busyTotalIoWait(); val s1 = selfJiffies()
    val bad = b0 < 0 || b1 < 0 || s0 < 0 || s1 < 0 || t1 <= t0
    val win =
      if (bad) Window(-1.0, -1.0, -1.0, loadAvg())
      else {
        val tot = (t1 - t0).toDouble
        Window(math.max(0L, (b1 - b0) - (s1 - s0)) / tot,
               math.max(0L, s1 - s0) / tot,
               math.max(0L, w1 - w0) / tot, loadAvg())
      }
    (r, win)
  }
}
