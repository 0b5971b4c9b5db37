package graft.pipeline

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
  * see either the old or the new layout, both complete. */
object Maintenance {

  /** Rewrite `path` to ~targetBytes-sized parquet files, preserving a
    * Hive-partitioned (`col=value` directory) layout if present — the
    * rewrite repartitions BY the partition columns so each output task
    * holds few partition values, and writes with partitionBy, keeping
    * partition pruning intact. Returns (filesBefore, filesAfter). */
  def compact(spark: SparkSession, path: String,
              targetBytes: Long = 128L * 1024 * 1024): (Int, Int) = {
    TableSwap.recover(path) // heal a previous crash mid-swap first
    def parquetFiles(dir: java.io.File): Seq[java.io.File] = {
      val kids = Option(dir.listFiles()).toSeq.flatten
      kids.filter(f => f.isFile && f.getName.endsWith(".parquet")) ++
        kids.filter(_.isDirectory).flatMap(parquetFiles)
    }
    // partition columns from the directory chain: path/k=v/[j=w/...]
    def partCols(dir: java.io.File): Seq[String] =
      Option(dir.listFiles()).toSeq.flatten
        .find(d => d.isDirectory && d.getName.contains("="))
        .map(d => d.getName.takeWhile(_ != '=') +: partCols(d))
        .getOrElse(Seq.empty)
    val root = new java.io.File(path)
    val before = parquetFiles(root)
    val parts = partCols(root)
    val totalBytes = before.map(_.length()).sum
    val nOut = math.max(1, math.ceil(totalBytes.toDouble / targetBytes).toInt)
    val tmp = path + ".compact_tmp"
    val df = spark.read.parquet(path)
    val repartitioned =
      if (parts.isEmpty) df.repartition(nOut)
      else df.repartition(nOut,
        parts.map(org.apache.spark.sql.functions.col): _*)
    val writer = repartitioned.write.mode("overwrite")
    (if (parts.isEmpty) writer else writer.partitionBy(parts: _*)).parquet(tmp)
    TableSwap.promote(path, tmp)
    (before.length, parquetFiles(root).length)
  }
}
