package graft

import java.nio.file.{Files, Path, Paths, StandardCopyOption}

/** Per-run scratch locations and race-safe shared fixtures.
  *
  * Query outputs, warehouse dirs, and registered table names must be
  * unique per engine process: two concurrent runs (or two users on one
  * host) sharing `/tmp/graft_...` would clobber each other's data and
  * produce spurious verification failures. Deterministic FIXTURES stay
  * shared across runs (they are cached on content-identical paths), but
  * are published atomically (write to a per-run temp name, then rename)
  * so a reader can never observe a half-written file.
  */
object RunPaths {

  /** Stable within one JVM, unique across concurrent runs on a host. */
  val runId: String = java.lang.ProcessHandle.current().pid().toString

  private def tmpRoot: Path = Paths.get(System.getProperty("java.io.tmpdir"))

  /** Per-run scratch directory (created on first use). */
  lazy val scratchDir: Path = {
    val d = tmpRoot.resolve(s"graft_run_$runId")
    Files.createDirectories(d)
    d
  }

  /** A per-run scratch path for query/bench outputs. */
  def scratch(name: String): String = scratchDir.resolve(name).toString

  /** A per-run suffix for global names (catalog tables, view names). */
  def suffixed(name: String): String = s"${name}_$runId"

  /** Filesystem-safe key for parameterizing a shared fixture on an
    * input directory (sf0.01 vs sf0.1 fixtures must not collide).
    */
  def keyFor(dir: String): String = dir.replaceAll("[^A-Za-z0-9.]", "_")

  /** Create-once shared fixture with atomic publish: `write` produces
    * the fixture at a per-run temp path, which is renamed into place.
    * Concurrent creators race benignly — exactly one rename wins, the
    * others' temps are discarded — and readers only ever see a complete
    * file (or directory).
    */
  def sharedFixture(name: String)(write: String => Unit): String = {
    val p = tmpRoot.resolve(name)
    if (!Files.exists(p)) {
      val tmp = tmpRoot.resolve(s"$name.tmp_$runId")
      write(tmp.toString)
      try Files.move(tmp, p, StandardCopyOption.ATOMIC_MOVE)
      catch {
        case _: java.nio.file.FileAlreadyExistsException |
            _: java.nio.file.FileSystemException =>
          // another run published first — keep theirs, drop ours
          deleteRecursively(tmp)
      }
    }
    p.toString
  }

  private def deleteRecursively(p: Path): Unit = {
    if (Files.isDirectory(p, java.nio.file.LinkOption.NOFOLLOW_LINKS)) {
      Files.list(p).forEach(deleteRecursively(_))
    }
    Files.deleteIfExists(p)
  }
}
