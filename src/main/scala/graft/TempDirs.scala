package graft

import java.nio.file.{Files, Path}

/** JVM-exit cleanup for the temp directories the engine caches under
  * /tmp (skew-join output, dimension/bucketed layouts, JSONL exports).
  * `File.deleteOnExit` is a no-op for a non-empty directory, so those
  * parquet trees would otherwise persist across JVM runs — one dir per
  * process. One shutdown hook deletes every registered tree
  * recursively, best-effort (exit-time IO failures are swallowed). */
object TempDirs {
  private val registered =
    java.util.concurrent.ConcurrentHashMap.newKeySet[Path]()

  private lazy val hookInstalled: Unit =
    Runtime.getRuntime.addShutdownHook(new Thread(() => {
      registered.forEach(deleteRecursively)
    }, "graft-tempdir-cleanup"))

  /** Register an existing directory for recursive deletion at exit. */
  def register(p: Path): Path = { hookInstalled; registered.add(p); p }

  /** Create a temp directory already registered for exit cleanup. */
  def create(prefix: String): Path =
    register(Files.createTempDirectory(prefix))

  /** Immediate recursive delete (the q142 vacuum path) — same
    * best-effort semantics as the exit hook. */
  def deleteTree(p: Path): Unit = deleteRecursively(p)

  private def deleteRecursively(p: Path): Unit = {
    try {
      if (Files.isDirectory(p)) {
        val children = Files.list(p)
        try children.forEach(deleteRecursively)
        finally children.close()
      }
      Files.deleteIfExists(p)
    } catch { case _: java.io.IOException => () }
  }
}
