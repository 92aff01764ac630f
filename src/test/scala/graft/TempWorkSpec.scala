package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.core.TempWork

/** [[graft.core.TempWork]] — the managed scratch root: eager deletes
  * stay inside the root, and the snapshot-scoped sweep (the Bench
  * between-repeats hygiene hook) removes exactly the trees created
  * since the snapshot, never pre-existing ones (ADVICE r13: make the
  * "this query's scratch" invariant structural). */
class TempWorkSpec extends AnyFunSuite {

  test("sweepCreatedSince deletes only trees created after the snapshot") {
    val keep = TempWork.dir("twspec-keep")
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(keep, "f.txt"), "stay")
    val snap = TempWork.snapshot()
    val doomed = TempWork.dir("twspec-doomed")
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(doomed, "g.txt"), "go")
    TempWork.sweepCreatedSince(snap)
    assert(java.nio.file.Files.exists(
      java.nio.file.Paths.get(keep, "f.txt")),
      "pre-snapshot scratch must survive the scoped sweep")
    assert(!java.nio.file.Files.exists(java.nio.file.Paths.get(doomed)),
      "post-snapshot scratch must be swept")
    TempWork.delete(keep)
    assert(!java.nio.file.Files.exists(java.nio.file.Paths.get(keep)))
  }

  test("delete refuses paths outside the managed root") {
    val outside = java.nio.file.Files.createTempDirectory("twspec-out")
    try {
      TempWork.delete(outside.toString) // must be a no-op
      assert(java.nio.file.Files.exists(outside))
    } finally java.nio.file.Files.deleteIfExists(outside)
  }
}
