package graft

import graft.pipeline.{Maintenance, TableSwap}
import org.apache.spark.sql.functions._

/** Small-file compaction + atomic table swap semantics. */
class MaintenanceSpec extends SparkSuite {
  import spark.implicits._

  test("compact merges small files and preserves every row") {
    val dir = java.nio.file.Files.createTempDirectory("graft_compact")
      .resolve("t").toString
    // 40 tiny files
    spark.range(10000).select(col("id"), (col("id") % 7).as("k"))
      .repartition(40).write.parquet(dir)
    val checksumBefore = spark.read.parquet(dir)
      .agg(sum("id"), count(lit(1))).as[(Long, Long)].head()
    val (before, after) = Maintenance.compact(spark, dir, targetBytes = 1L << 20)
    assert(before === 40)
    assert(after < before, s"expected fewer files, got $before -> $after")
    val checksumAfter = spark.read.parquet(dir)
      .agg(sum("id"), count(lit(1))).as[(Long, Long)].head()
    assert(checksumAfter === checksumBefore)
    assert(!new java.io.File(dir + ".compact_tmp").exists())
    assert(!new java.io.File(dir + ".old").exists())
  }

  test("promote replaces the live table and rolls cleanly from no-table") {
    val base = java.nio.file.Files.createTempDirectory("graft_swap")
    val live = base.resolve("t").toString
    def writeTag(path: String, tag: Long): Unit =
      Seq(tag).toDF("tag").write.mode("overwrite").parquet(path)
    // first promote: no live table yet
    writeTag(live + ".tmp", 1L)
    TableSwap.promote(live, live + ".tmp")
    assert(spark.read.parquet(live).as[Long].head() === 1L)
    // second promote replaces content
    writeTag(live + ".tmp", 2L)
    TableSwap.promote(live, live + ".tmp")
    assert(spark.read.parquet(live).as[Long].head() === 2L)
    assert(!new java.io.File(live + ".old").exists())
  }
}
