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

  /** Rewrite `path` to ~targetBytes-sized parquet files. Returns
    * (filesBefore, filesAfter). */
  def compact(spark: SparkSession, path: String,
              targetBytes: Long = 128L * 1024 * 1024): (Int, Int) = {
    def parquetFiles(dir: java.io.File): Seq[java.io.File] = {
      val kids = Option(dir.listFiles()).toSeq.flatten
      kids.filter(f => f.isFile && f.getName.endsWith(".parquet")) ++
        kids.filter(_.isDirectory).flatMap(parquetFiles)
    }
    val before = parquetFiles(new java.io.File(path))
    val totalBytes = before.map(_.length()).sum
    val nOut = math.max(1, math.ceil(totalBytes.toDouble / targetBytes).toInt)
    val tmp = path + ".compact_tmp"
    spark.read.parquet(path)
      .repartition(nOut)
      .write.mode("overwrite").parquet(tmp)
    TableSwap.promote(path, tmp)
    (before.length, parquetFiles(new java.io.File(path)).length)
  }
}
