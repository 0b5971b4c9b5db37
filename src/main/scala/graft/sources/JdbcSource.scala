package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** S6 — JDBC table scan/sink (the reference reads its warehouse via a
  * Postgres connection, `/root/reference/dags/currency_etl.py:29,86`).
  *
  * The engine boundary is `spark.read/write.format("jdbc")`; this wrapper
  * pins the options that matter at scale:
  *
  *  - **reads are partitioned** when a numeric `partitionColumn` is
  *    given: Spark issues `numPartitions` range-bounded queries in
  *    parallel instead of one executor streaming the whole table through
  *    a single connection — the difference between minutes and a day on
  *    a big warehouse table;
  *  - **predicate pushdown stays on** (default `pushDownPredicate`), so
  *    filters on the frame become WHERE clauses server-side;
  *  - `fetchsize` batches the cursor (drivers default to tiny values —
  *    Postgres 0 = all rows in memory, others 10 rows per round trip);
  *  - writes batch inserts (`batchsize`) and never create indexes — bulk
  *    load first, index after, like any warehouse load.
  *
  * Verified end-to-end against embedded Derby (the only engine in the
  * container) in JdbcSpec; the options are engine-neutral.
  */
object JdbcSource {

  /** Read a whole table over one connection (small dimension tables). */
  def read(spark: SparkSession, url: String, table: String,
           driver: String): DataFrame =
    spark.read.format("jdbc")
      .option("url", url)
      .option("dbtable", table)
      .option("driver", driver)
      .option("fetchsize", 1000)
      .load()

  /** Range-partitioned parallel read (the 100 TB-side shape). */
  def readPartitioned(spark: SparkSession, url: String, table: String,
                      driver: String, partitionColumn: String,
                      lowerBound: Long, upperBound: Long,
                      numPartitions: Int): DataFrame =
    spark.read.format("jdbc")
      .option("url", url)
      .option("dbtable", table)
      .option("driver", driver)
      .option("partitionColumn", partitionColumn)
      .option("lowerBound", lowerBound)
      .option("upperBound", upperBound)
      .option("numPartitions", numPartitions)
      .option("fetchsize", 1000)
      .load()

  /** Append/overwrite a frame into a JDBC table with batched inserts. */
  def write(df: DataFrame, url: String, table: String, driver: String,
            mode: SaveMode = SaveMode.Overwrite): Unit =
    df.write.format("jdbc")
      .option("url", url)
      .option("dbtable", table)
      .option("driver", driver)
      .option("batchsize", 1000)
      .mode(mode)
      .save()
}
