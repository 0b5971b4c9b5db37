package graft

import graft.pipeline.Skipping
import org.apache.spark.sql.functions._

/** Manifest-driven file skipping: the candidate list must actually
  * shrink on a range-clustered layout, stay a sound superset (pruned
  * read ≡ full-scan filter), and handle the empty-band edge. */
class SkippingSpec extends SparkSuite {

  private def layOut(): (String, String, Long) = {
    val base = java.nio.file.Files.createTempDirectory("graft_skip")
    val (tbl, man) = (base.resolve("t").toString, base.resolve("m").toString)
    Tables.orders(spark, sf())
      .repartitionByRange(16, col("o_totalprice"))
      .sortWithinPartitions("o_totalprice")
      .write.parquet(tbl)
    Skipping.writeManifest(spark, tbl, "o_totalprice", man)
    val nFiles = spark.read.parquet(man).count()
    (tbl, man, nFiles)
  }

  test("manifest covers every file and every row") {
    val (tbl, man, nFiles) = layOut()
    assert(nFiles === 16)
    val rows = spark.read.parquet(man).agg(sum("n_rows")).head().getLong(0)
    assert(rows === Tables.orders(spark, sf()).count())
  }

  test("range probe opens only intersecting files; result is exact") {
    val (tbl, man, nFiles) = layOut()
    val cand = Skipping.candidateFiles(spark, man, 30000.0, 60000.0)
    assert(cand.nonEmpty && cand.size < nFiles / 2,
      s"range-clustered layout must prune: ${cand.size} of $nFiles files")
    val pruned = Skipping
      .prunedRead(spark, tbl, man, "o_totalprice", 30000.0, 60000.0)
      .select("o_orderkey").orderBy("o_orderkey").collect().toSeq
    val full = spark.read.parquet(tbl)
      .filter(col("o_totalprice").between(30000.0, 60000.0))
      .select("o_orderkey").orderBy("o_orderkey").collect().toSeq
    assert(pruned === full)
  }

  test("band outside the domain prunes everything and returns empty") {
    val (tbl, man, _) = layOut()
    assert(Skipping.candidateFiles(spark, man, -2e9, -1e9).isEmpty)
    assert(Skipping.prunedRead(spark, tbl, man, "o_totalprice", -2e9, -1e9)
      .count() === 0L)
  }
}
