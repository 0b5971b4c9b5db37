package graft.pipeline

import org.apache.hadoop.fs.{FileStatus, Path}
import org.apache.spark.sql.SparkSession

/** Table maintenance for the parquet warehouse — the operations a
  * long-running ingest needs that no query expresses.
  *
  * Small-file compaction: streaming/micro-batch sinks and fine-grained
  * partitioning accrete files far below the scan-efficient size; at
  * 100 TB a table of 4 MB files makes every scan pay orders of
  * magnitude more open/seek/footer costs and floods the driver with
  * listing work. `compact` rewrites a table directory to
  * ceil(bytes / targetBytes) files in one narrow repartition pass and
  * promotes the rewrite atomically (TableSwap), so concurrent readers
  * see either the old or the new layout, both complete.
  *
  * All file metadata goes through the Hadoop `FileSystem` resolved from
  * the session's `hadoopConfiguration`, so the same code compacts
  * `file://`, HDFS, or any mounted Hadoop filesystem (TableSwap
  * documents the object-store commit caveat). */
object Maintenance {

  /** Rewrite `path` to ~targetBytes-sized parquet files, preserving a
    * Hive-partitioned (`col=value` directory) layout if present — the
    * rewrite repartitions BY the partition columns so each output task
    * holds few partition values, and writes with partitionBy, keeping
    * partition pruning intact. Returns (filesBefore, filesAfter). */
  def compact(spark: SparkSession, path: String,
              targetBytes: Long = 128L * 1024 * 1024): (Int, Int) = {
    val conf = spark.sparkContext.hadoopConfiguration
    TableSwap.recover(path, conf) // heal a previous crash mid-swap first
    val root = new Path(path)
    val fs = root.getFileSystem(conf)
    def parquetFiles(dir: Path): Seq[FileStatus] = {
      val buf = scala.collection.mutable.ArrayBuffer.empty[FileStatus]
      val it = fs.listFiles(dir, true) // recursive, one listing stream
      while (it.hasNext) {
        val f = it.next()
        if (f.getPath.getName.endsWith(".parquet")) buf += f
      }
      buf.toSeq
    }
    // partition columns from the directory chain: path/k=v/[j=w/...]
    def partCols(dir: Path): Seq[String] =
      fs.listStatus(dir).toSeq
        .find(d => d.isDirectory && d.getPath.getName.contains("="))
        .map(d => d.getPath.getName.takeWhile(_ != '=') +: partCols(d.getPath))
        .getOrElse(Seq.empty)
    val before = parquetFiles(root)
    val parts = partCols(root)
    val totalBytes = before.map(_.getLen).sum
    val nOut = math.max(1, math.ceil(totalBytes.toDouble / targetBytes).toInt)
    val tmp = path + ".compact_tmp"
    val df = spark.read.parquet(path)
    val repartitioned =
      if (parts.isEmpty) df.repartition(nOut)
      else df.repartition(nOut,
        parts.map(org.apache.spark.sql.functions.col): _*)
    val writer = repartitioned.write.mode("overwrite")
    (if (parts.isEmpty) writer else writer.partitionBy(parts: _*)).parquet(tmp)
    TableSwap.promote(path, tmp, conf)
    (before.length, parquetFiles(root).length)
  }

  /** Object-store-safe compaction over a VERSIONED table root
    * (`root/v=N` + commit markers, see TableSwap): reads the live
    * version, writes the compacted copy DIRECTLY into the next version
    * slot (nobody reads it yet — no tmp dir, no rename), then commits
    * with one marker PUT and vacuums old versions down to `keepLast`.
    * A crash at any point leaves the live version untouched; a crashed
    * half-written slot is an invisible orphan whose number is burned.
    * Returns (filesBefore, filesAfter). */
  def compactVersioned(spark: SparkSession, tableRoot: String,
                       targetBytes: Long = 128L * 1024 * 1024,
                       keepLast: Int = 2): (Int, Int) = {
    val conf = spark.sparkContext.hadoopConfiguration
    val live = TableSwap.liveVersionPath(tableRoot, conf).getOrElse(
      throw new IllegalArgumentException(
        s"compactVersioned: no committed version under $tableRoot"))
    val fs = new Path(tableRoot).getFileSystem(conf)
    def parquetCount(dir: String): Int = {
      var n = 0
      val it = fs.listFiles(new Path(dir), true)
      while (it.hasNext) { if (it.next().getPath.getName.endsWith(".parquet")) n += 1 }
      n
    }
    val before = parquetCount(live)
    val totalBytes = {
      var b = 0L
      val it = fs.listFiles(new Path(live), true)
      while (it.hasNext) { val f = it.next(); if (f.getPath.getName.endsWith(".parquet")) b += f.getLen }
      b
    }
    val nOut = math.max(1, math.ceil(totalBytes.toDouble / targetBytes).toInt)
    val (v, dst) = TableSwap.nextVersion(tableRoot, conf)
    spark.read.parquet(live).repartition(nOut)
      .write.mode("overwrite").parquet(dst)
    TableSwap.commitVersion(tableRoot, v, conf)
    TableSwap.vacuumVersions(tableRoot, conf, keepLast)
    (before, parquetCount(dst))
  }
}
