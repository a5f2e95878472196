package graft.core

import java.nio.file.{Files, Paths}

import org.scalatest.funsuite.AnyFunSuite

/** The scratch-dir janitor's contract (round-10 hardening): every
  * directory handed out by [[TempDirs.scratch]] is recursively deleted
  * by the shutdown hook, and one undeletable root must not abort
  * cleanup of the rest. The hook body is exercised per-root via the
  * [[TempDirs.deleteTreeNow]] seam — running the real hook would
  * destroy other suites' memoized fixtures mid-run.
  */
class TempDirsSpec extends AnyFunSuite {

  test("scratch -> populate -> hook body -> tree is gone") {
    val dir = Paths.get(TempDirs.scratch("graft-tempdirs-spec-"))
    Files.createDirectories(dir.resolve("nested/deeper"))
    Files.write(dir.resolve("nested/deeper/a.txt"), "payload".getBytes)
    Files.write(dir.resolve("top.txt"), "payload".getBytes)
    assert(Files.exists(dir.resolve("nested/deeper/a.txt")))

    TempDirs.deleteTreeNow(dir)
    assert(!Files.exists(dir), "hook body must remove the whole tree")
  }

  test("hook body is idempotent and survives a vanished root") {
    val dir = Paths.get(TempDirs.scratch("graft-tempdirs-spec2-"))
    TempDirs.deleteTreeNow(dir)
    // second pass: root no longer exists — must be a silent no-op,
    // exactly what the exit-time hook sees for an already-reaped dir
    TempDirs.deleteTreeNow(dir)
    assert(!Files.exists(dir))
  }
}
