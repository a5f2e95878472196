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
        try deleteRecursively(root)
        catch { case _: java.io.IOException => () } // best-effort at exit
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
}
