package graft.pipeline

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileSystem, Path}

/** Crash-safe promote of a freshly-written table directory over a live
  * one without a transactional format: the live table is renamed ASIDE
  * (never deleted first), tmp is promoted, then the set-aside copy is
  * removed. Any crash leaves at least one complete copy: before the
  * promote `.old` is restorable, after it the new table is live.
  * `recover` must run before READING a table that may have crashed
  * mid-swap (live missing, `.old` present) — writers below call it.
  *
  * Substrate: the Hadoop `FileSystem` API, so the same protocol runs on
  * the local FS (`file://`), HDFS, or any mounted Hadoop filesystem —
  * pass the job's `hadoopConfiguration` so scheme resolution and
  * credentials match the Spark session's. On HDFS both renames are
  * atomic namenode operations. OBJECT-STORE CAVEAT: S3/GCS "rename" is
  * copy+delete — neither atomic nor O(1) — so this protocol does NOT
  * give crash safety there; on object stores promote via a manifest /
  * versioned-directory commit (write to `t/v=N/`, then flip a
  * single-key pointer) or a table format with a real commit protocol.
  *
  * The swap is two renames, not one atomic operation: a concurrent
  * reader can hit a missing path in the instant between them. That is a
  * read retry, not data loss; a serialized writer topology (one
  * streaming query, one maintenance job) is the supported shape.
  * Plain throws — never assert, which -Xelide-below would strip. */
object TableSwap {

  private def fsFor(p: Path, conf: Configuration): FileSystem =
    p.getFileSystem(conf)

  /** True if the table directory exists (recover first if it may have
    * crashed mid-swap). */
  def exists(tablePath: String,
             conf: Configuration = new Configuration()): Boolean = {
    val live = new Path(tablePath)
    fsFor(live, conf).exists(live)
  }

  /** Restore a half-swapped table: if the live path is gone but the
    * set-aside copy exists, put it back. Returns true if restored. */
  def recover(tablePath: String,
              conf: Configuration = new Configuration()): Boolean = {
    val live = new Path(tablePath)
    val old = new Path(tablePath + ".old")
    val fs = fsFor(live, conf)
    if (!fs.exists(live) && fs.exists(old)) {
      if (!fs.rename(old, live))
        throw new java.io.IOException(s"cannot restore $old -> $live")
      true
    } else false
  }

  def promote(tablePath: String, tmpPath: String,
              conf: Configuration = new Configuration()): Unit = {
    val tmp = new Path(tmpPath)
    val live = new Path(tablePath)
    val old = new Path(tablePath + ".old")
    val fs = fsFor(live, conf)
    // a leftover .old with no live table is a previous crash mid-swap:
    // the .old copy is the ONLY data — restore it, never delete it
    recover(tablePath, conf)
    if (fs.exists(old) && !fs.delete(old, true))
      throw new java.io.IOException(s"cannot clear stale $old")
    // every rename below targets a non-existent destination — required:
    // HDFS rename onto an existing directory moves the source INTO it
    if (fs.exists(live) && !fs.rename(live, old))
      throw new java.io.IOException(s"cannot set aside $live -> $old")
    if (!fs.rename(tmp, live)) {
      if (fs.exists(old)) fs.rename(old, live) // roll back to the old copy
      throw new java.io.IOException(s"cannot promote $tmp -> $live")
    }
    if (fs.exists(old) && !fs.delete(old, true))
      throw new java.io.IOException(s"cannot drop set-aside $old")
  }
}
