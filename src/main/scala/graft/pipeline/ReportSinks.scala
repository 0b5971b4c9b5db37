package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Report fan-out sinks (SURVEY.md §2.9 C4, §2.2 K5/K6): one report
  * DataFrame → JSON + per-currency CSV + TXT, mirroring
  * /root/reference/src/analyze.py:164-203.
  *
  * Report results are ≤1 row per currency, so driver-side materialization
  * of the FINAL struct is safe by construction (SURVEY §3.2); everything
  * upstream of it stays distributed.
  */
object ReportSinks {

  /** K6: nested report struct as a single JSON document (non-ASCII
    * preserved — Spark's to_json emits UTF-8 unescaped). */
  def reportJson(structReport: DataFrame): String =
    structReport.select(to_json(struct(structReport.columns.map(col): _*)))
      .collect().head.getString(0)

  /** K5: per-currency one-row CSV files + a general summary CSV. */
  def writeCsvReports(perCurrency: DataFrame, outDir: String): Unit = {
    perCurrency.cache()
    perCurrency.select("cc").distinct().collect().map(_.getString(0))
      .foreach { cc =>
        perCurrency.filter(col("cc") === cc)
          .coalesce(1).write.mode("overwrite")
          .option("header", "true")
          .csv(s"$outDir/${cc.toLowerCase}_report")
      }
    perCurrency.agg(countDistinct(col("cc")).as("num_currencies"))
      .coalesce(1).write.mode("overwrite")
      .option("header", "true").csv(s"$outDir/general_report")
    perCurrency.unpersist()
    ()
  }
}
