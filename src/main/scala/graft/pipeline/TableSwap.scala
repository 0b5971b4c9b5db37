package graft.pipeline

/** Crash-safe promote of a freshly-written table directory over a live
  * one without a transactional format: the live table is renamed ASIDE
  * (never deleted first), tmp is promoted, then the set-aside copy is
  * removed. Any crash leaves at least one complete copy: before the
  * promote `.old` is restorable, after it the new table is live. Plain
  * throws — never assert, which -Xelide-below would strip. */
object TableSwap {

  def promote(tablePath: String, tmpPath: String): Unit = {
    val tmp = new java.io.File(tmpPath)
    val live = new java.io.File(tablePath)
    val old = new java.io.File(tablePath + ".old")
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
