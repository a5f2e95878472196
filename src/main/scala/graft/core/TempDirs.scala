package graft.core

import java.nio.file.{Files, Path}

/** Scratch directories for per-JVM memoized fixtures (the persisted-store
  * queries' parquet round-trips, q248's audit buckets). One place owns the
  * lifecycle: every directory handed out here is recursively deleted by a
  * single JVM shutdown hook, so a long-lived driver JVM running many
  * sessions does not accumulate orphaned fixture trees in `java.io.tmpdir`
  * (round-9 ADVICE: the audit fixture's temp dir was never cleaned up).
  *
  * Deletion is deliberately shutdown-scoped, NOT session-scoped: the
  * fixtures are memoized per (JVM, sf-dir) precisely so a second
  * SparkSession in the same JVM can re-read the bytes, so they must
  * outlive any one session.
  */
object TempDirs {
  private val registered = new java.util.concurrent.ConcurrentLinkedQueue[Path]

  locally {
    sys.addShutdownHook {
      registered.forEach { root =>
        // Files.walk's lazy traversal surfaces I/O problems as
        // UncheckedIOException, not IOException — catch NonFatal so one
        // bad root cannot abort best-effort cleanup of the rest.
        try deleteRecursively(root)
        catch { case scala.util.control.NonFatal(_) => () }
      }
    }
  }

  private def deleteRecursively(root: Path): Unit =
    if (Files.exists(root)) {
      val stream = Files.walk(root)
      try {
        stream.sorted(java.util.Comparator.reverseOrder[Path]())
          .forEach(p => Files.deleteIfExists(p))
      } finally stream.close()
    }

  /** Create a fresh scratch directory whose tree is deleted on JVM exit. */
  def scratch(prefix: String): String = {
    val dir = Files.createTempDirectory(prefix)
    registered.add(dir)
    dir.toString
  }

  /** Test seam: run the shutdown hook's per-root body against ONE root
    * now (same recursive, best-effort semantics). Scoped to a single
    * directory — NOT the whole queue — so a unit test can verify the
    * hook's deletion logic without destroying other suites' memoized
    * fixtures mid-run. Deletion is idempotent; a vanished root is a
    * no-op, matching the hook's exit-time behavior.
    */
  private[graft] def deleteTreeNow(root: Path): Unit =
    try deleteRecursively(root)
    catch { case scala.util.control.NonFatal(_) => () }
}
