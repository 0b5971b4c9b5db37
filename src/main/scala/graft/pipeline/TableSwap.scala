package graft.pipeline

/** Crash-safe promote of a freshly-written table directory over a live
  * one without a transactional format: the live table is renamed ASIDE
  * (never deleted first), tmp is promoted, then the set-aside copy is
  * removed. Any crash leaves at least one complete copy: before the
  * promote `.old` is restorable, after it the new table is live.
  * `recover` must run before READING a table that may have crashed
  * mid-swap (live missing, `.old` present) — writers below call it.
  *
  * The swap is two renames, not one atomic operation: a concurrent
  * reader can hit a missing path in the instant between them. That is a
  * read retry, not data loss; a serialized writer topology (one
  * streaming query, one maintenance job) is the supported shape.
  * Plain throws — never assert, which -Xelide-below would strip. */
object TableSwap {

  /** Restore a half-swapped table: if the live path is gone but the
    * set-aside copy exists, put it back. Returns true if restored. */
  def recover(tablePath: String): Boolean = {
    val live = new java.io.File(tablePath)
    val old = new java.io.File(tablePath + ".old")
    if (!live.exists() && old.exists()) {
      if (!old.renameTo(live))
        throw new java.io.IOException(s"cannot restore $old -> $live")
      true
    } else false
  }

  def promote(tablePath: String, tmpPath: String): Unit = {
    val tmp = new java.io.File(tmpPath)
    val live = new java.io.File(tablePath)
    val old = new java.io.File(tablePath + ".old")
    // a leftover .old with no live table is a previous crash mid-swap:
    // the .old copy is the ONLY data — restore it, never delete it
    recover(tablePath)
    if (old.exists()) delete(old)
    if (live.exists() && !live.renameTo(old))
      throw new java.io.IOException(s"cannot set aside $live -> $old")
    if (!tmp.renameTo(live)) {
      if (old.exists()) old.renameTo(live) // roll back to the old copy
      throw new java.io.IOException(s"cannot promote $tmp -> $live")
    }
    if (old.exists()) delete(old)
  }

  def delete(f: java.io.File): Unit = {
    Option(f.listFiles()).toSeq.flatten.foreach(delete)
    f.delete(); ()
  }
}
