package graft

/** Per-run unique scratch roots for queries that CREATE MUTABLE tables
  * (GDX directories, streaming sinks, checkpoints).
  *
  * The engine's queries declare a run-concurrently contract
  * (SparkEntry): two concurrent invocations of the SAME query must not
  * interfere. A mutable table root keyed only by the dataset directory
  * breaks that — each run wipes/overwrites the shared root and deletes
  * the other's live table mid-stream. The fix is the one
  * stream_dedup_ingest established: every MUTABLE root gets a per-run
  * unique directory (`Files.createTempDirectory`), while DETERMINISTIC
  * WRITE-ONCE layouts (LSH/IVF serving indexes, registered MV
  * generations) stay shared — their content is a pure function of the
  * input, so concurrent builders produce identical bytes and the
  * tag-marker skip makes rebuilds free.
  *
  * A JVM shutdown hook deletes every root RECURSIVELY, so a long-lived
  * JVM (bench: warmup + two timed passes) never leaks roots past its
  * own lifetime — `File.deleteOnExit` would not do: it removes a
  * directory only when EMPTY, and the table trees written under a
  * scratch root are never registered with it, so every sf0.1 bench
  * run would strand full GDX/MV/checkpoint trees in /tmp. */
object Scratch {
  private val roots =
    java.util.concurrent.ConcurrentHashMap.newKeySet[java.io.File]()

  Runtime.getRuntime.addShutdownHook(new Thread(() => {
    roots.forEach { root =>
      try {
        import java.nio.file.{Files, Path}
        import java.util.Comparator
        if (root.exists()) {
          val s = Files.walk(root.toPath)
          try s.sorted(Comparator.reverseOrder[Path]())
            .forEach(p => { Files.deleteIfExists(p); () })
          finally s.close()
        }
      } catch { case _: Throwable => () } // best-effort at exit
    }
  }, "graft-scratch-cleanup"))

  /** A fresh, per-invocation scratch directory. */
  def dir(prefix: String): java.io.File = {
    val f = java.nio.file.Files.createTempDirectory(prefix).toFile
    roots.add(f)
    f
  }

  /** A fresh scratch path for a single mutable table: `<tmp>/<child>`
    * under a per-invocation unique root. */
  def tablePath(prefix: String, child: String = "table"): String =
    new java.io.File(dir(prefix), child).getPath
}
