package graft.core

import java.nio.file.{Files, Path}
import scala.collection.mutable

/** Managed scratch directories for queries that persist intermediate
  * state (chunk partials, persisted indexes) as part of their contract.
  * Every directory is created under ONE per-JVM root that a shutdown
  * hook deletes recursively — repeated correctness/bench runs inside a
  * long-lived session no longer leak parquet trees under /tmp (each
  * `Files.createTempDirectory` call used to strand one per invocation).
  *
  * On a cluster these paths would be a real filesystem workDir owned by
  * the orchestrator (the reference's HDFS temp layout); the JVM-scoped
  * root is the local-mode stand-in, not a distributed-FS abstraction.
  */
object TempWork {

  private lazy val root: Path = {
    val r = Files.createTempDirectory("graft-work")
    Runtime.getRuntime.addShutdownHook(new Thread(() => deleteTree(r)))
    r
  }

  private val counter = new java.util.concurrent.atomic.AtomicLong(0)

  /** A fresh scratch directory under the managed root. */
  def dir(prefix: String): String =
    Files.createDirectory(
      root.resolve(s"$prefix-${counter.getAndIncrement()}")).toString

  /** Eagerly delete a scratch tree under the managed root — for
    * operators whose intermediate state is superseded long before JVM
    * shutdown (e.g. the chunked triangle close's oriented scratch table
    * once every partial has landed: deleting it halves the operator's
    * peak disk footprint). No-op for paths outside the root, so a
    * caller can never aim this at real data. */
  def delete(path: String): Unit = {
    val p = java.nio.file.Paths.get(path).normalize()
    if (p.startsWith(root)) deleteTree(p)
  }

  /** Delete EVERY scratch tree under the managed root — the between-
    * queries hygiene hook for a long session running many independent
    * queries (graft.Bench): once a query's terminal action has run, its
    * scratch has no reader, and leaving 200+ queries' trees on disk
    * turns the tail of a long run into writeback of the head's dirty
    * pages (measured on the round-13 box — OPTIMIZATION_r13.md, full-run
    * vs isolated numbers). Callers must only invoke this BETWEEN
    * queries, never while any frame that scans scratch is still live —
    * the same contract as [[delete]], applied to everything at once. */
  def sweepAll(): Unit = {
    val s = Files.list(root)
    val entries = scala.collection.mutable.ListBuffer.empty[Path]
    try s.forEach(p => entries += p) finally s.close()
    entries.foreach(deleteTree)
  }

  private def deleteTree(p: Path): Unit = {
    val stack = mutable.Stack(p)
    val toDelete = mutable.ListBuffer.empty[Path]
    while (stack.nonEmpty) {
      val cur = stack.pop()
      toDelete.prepend(cur)
      if (Files.isDirectory(cur)) {
        val s = Files.list(cur)
        try s.forEach(c => stack.push(c)) finally s.close()
      }
    }
    toDelete.foreach(f => try Files.deleteIfExists(f) catch {
      case _: java.io.IOException => ()
    })
  }
}
