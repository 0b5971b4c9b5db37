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
  * deleteOnExit keeps a long-lived JVM (bench: warmup + two timed
  * passes) from leaking roots past its own lifetime; within the run
  * each invocation's root is simply its own. */
object Scratch {
  /** A fresh, per-invocation scratch directory. */
  def dir(prefix: String): java.io.File = {
    val f = java.nio.file.Files.createTempDirectory(prefix).toFile
    f.deleteOnExit()
    f
  }

  /** A fresh scratch path for a single mutable table: `<tmp>/<child>`
    * under a per-invocation unique root. */
  def tablePath(prefix: String, child: String = "table"): String =
    new java.io.File(dir(prefix), child).getPath
}
