package graft.streaming

import graft.pipeline.CurrencyPipeline
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** Streaming upsert topology (SURVEY.md §2.10): file-source stream over
  * the raw landing zone → transform → foreachBatch last-write-wins merge
  * into the warehouse table. This is the reference's daily
  * extract→transform→load collapsed into one incremental query: each new
  * landed file becomes a micro-batch, and re-delivered files converge by
  * C2 merge semantics instead of duplicating.
  *
  * Scale notes: foreachBatch receives a normal DataFrame, so the merge
  * reuses the batch `CurrencyPipeline.merge` unchanged (streaming = batch
  * code). The table rewrite below is whole-table (fine for the
  * rates-sized table); a 100 TB table would partition by exchangedate
  * month and rewrite only partitions present in the micro-batch (dynamic
  * partition overwrite), keeping each batch O(touched partitions).
  */
object StreamMerge {

  /** Start the incremental ingest: returns the query; stop via
    * Trigger.AvailableNow semantics (terminates when caught up). */
  def run(spark: SparkSession, rawDir: String, tablePath: String)
      : org.apache.spark.sql.streaming.StreamingQuery = {
    val raw = spark.readStream
      .schema(CurrencyPipeline.rawSchema)
      .option("multiLine", value = true)
      .option("pathGlobFilter", "*.json")
      .json(s"$rawDir/ingest_date=*")
    CurrencyPipeline.transform(raw)
      .writeStream
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val stamped = batch.withColumn("ingest_ts",
          expr(s"timestamp_micros(${batchId}L)"))
        val existing = existingTable(spark, tablePath, stamped)
        val merged = CurrencyPipeline.merge(existing, stamped)
        // write-then-swap for atomicity without a transactional format
        // (crash-safety contract documented on TableSwap.promote)
        val tmp = tablePath + ".tmp"
        merged.write.mode("overwrite").parquet(tmp)
        graft.pipeline.TableSwap.promote(tablePath, tmp,
          spark.sparkContext.hadoopConfiguration)
        ()
      }
      .trigger(Trigger.AvailableNow())
      .option("checkpointLocation", tablePath + ".checkpoint")
      .start()
  }

  private def existingTable(spark: SparkSession, path: String,
                            like: DataFrame): DataFrame = {
    // a crash between the swap's two renames leaves the table only in
    // .old — restore it BEFORE reading, or this merge would see an
    // empty warehouse and the next promote would discard the history
    val conf = spark.sparkContext.hadoopConfiguration
    graft.pipeline.TableSwap.recover(path, conf)
    if (graft.pipeline.TableSwap.exists(path, conf))
      spark.read.schema(like.schema).parquet(path)
    else like.limit(0)
  }

}
