package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** File-level min/max data skipping — the stats-manifest pattern every
  * table format (Delta/Iceberg/Hudi) uses to avoid listing + opening
  * files that cannot match a predicate.
  *
  * Parquet row-group stats already prune WITHIN a file, but only after
  * the footer of every file has been opened — at 100 TB that is millions
  * of S3 GETs per query. A manifest holds one (file, min, max, rows) row
  * per file, built in ONE distributed scan and written next to the data;
  * the planner then reads the KB-sized manifest and hands Spark only the
  * files whose interval intersects the predicate. Combined with a
  * range-clustered layout (`Maintenance.compact` / `Layout.zorderWrite`)
  * the candidate set shrinks to O(matching range), not O(table).
  *
  * The candidate file list is collected on the driver — that is the same
  * object every table-format planner materializes (Delta's
  * DataSkippingReader, Iceberg's manifest scan): file-level, ~100 bytes
  * per file, millions of files = a few hundred MB worst case, and it
  * never grows with row count.
  */
object Skipping {

  /** Per-file [min, max, rows] stats for `column` over every parquet file
    * under `tableDir`, computed in one scan of that column only (column
    * pruning reaches the reader) and written as a single-file manifest. */
  def writeManifest(spark: SparkSession, tableDir: String, column: String,
                    manifestDir: String): Unit =
    spark.read.parquet(tableDir)
      .groupBy(input_file_name().as("file"))
      .agg(min(col(column)).as("min_v"), max(col(column)).as("max_v"),
        count(lit(1)).as("n_rows"))
      .coalesce(1) // file-level rows: KBs; one file IS the manifest contract
      .write.mode("overwrite").parquet(manifestDir)

  /** Files whose [min_v, max_v] interval intersects [lo, hi] — a superset
    * of the files holding matching rows (skipping is sound, not exact;
    * the caller keeps its row filter). */
  def candidateFiles(spark: SparkSession, manifestDir: String,
                     lo: Any, hi: Any): Seq[String] =
    spark.read.parquet(manifestDir)
      .filter(col("max_v") >= lit(lo) && col("min_v") <= lit(hi))
      .select("file")
      .collect().map(_.getString(0)).toSeq.sorted

  /** Scan restricted to the manifest's candidate files for
    * `column BETWEEN lo AND hi`; the residual row filter is re-applied so
    * the result is exactly the full-scan answer. */
  def prunedRead(spark: SparkSession, tableDir: String, manifestDir: String,
                 column: String, lo: Any, hi: Any): DataFrame = {
    val files = candidateFiles(spark, manifestDir, lo, hi)
    if (files.isEmpty)
      spark.read.parquet(tableDir).filter(lit(false))
    else
      spark.read.parquet(files: _*)
        .filter(col(column) >= lit(lo) && col(column) <= lit(hi))
  }
}
