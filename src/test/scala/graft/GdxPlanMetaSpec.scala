package graft

import org.apache.spark.sql.functions._
import graft.sources.GdxSource

/** Distributed metadata planning: above the
  * `spark.gdx.plan.distributedMinBytes` threshold, snapshot-entry
  * resolution parses the manifest chain's entry lines as a Spark job
  * instead of a driver loop — with BYTE-IDENTICAL results (entries,
  * stats, DVs, generation tags, name order), and a loud-path fallback
  * whenever the chain holds anything exotic. */
class GdxPlanMetaSpec extends SparkSuite {
  import spark.implicits._

  private val fmt = "graft.sources.GdxSource"
  private def freshDir(tag: String): String =
    java.nio.file.Files.createTempDirectory(s"gdxpm_$tag").toString + "/t"
  private def conf = GdxSource.driverConf()

  test("distributed entry parsing equals the driver loop across a " +
      "delta chain with DVs, stats, and generation tags") {
    val dir = freshDir("eq")
    // checkpoint + deltas + a DV + a recluster generation
    (0L until 2000L).map(k => (k, s"v$k")).toDF("k", "v").repartition(4)
      .write.format(fmt).option("path", dir).mode("overwrite").save()
    (2000L until 2500L).map(k => (k, s"d$k")).toDF("k", "v").coalesce(1)
      .write.format(fmt).option("path", dir).mode("append").save()
    GdxSource.delete(spark, dir, col("k") % 100 === 7)
    GdxSource.setClusterBy(dir, Seq("k"))
    GdxSource.optimizeClustered(spark, dir, Seq("k"), 4)
    (2500L until 2600L).map(k => (k, s"e$k")).toDF("k", "v").coalesce(1)
      .write.format(fmt).option("path", dir).mode("append").save()
    val band = Seq(org.apache.spark.sql.sources
      .GreaterThanOrEqual("k", 2400L: Any))
    def plannedAt(minBytes: String, v: Int = -1,
                  fl: Seq[org.apache.spark.sql.sources.Filter] = band) = {
      val s = Sessions.pinned(spark,
        "spark.gdx.plan.distributedMinBytes" -> minBytes)
      Sessions.withActive(s)(
        GdxSource.plannedEntries(dir, conf, v, fl))
    }
    val driver = plannedAt(Long.MaxValue.toString)
    val dist = plannedAt("1")
    assert(dist === driver,
      "distributed plan must be byte-identical to the driver loop")
    assert(dist.nonEmpty && dist.size <
      GdxSource.committedEntries(dir, conf).size,
      "the band filter should keep a strict, non-empty subset")
    // the unfiltered plan agrees too (zero-row drop semantics only)
    assert(plannedAt("1", fl = Nil) ===
      plannedAt(Long.MaxValue.toString, fl = Nil))
    assert(plannedAt("1", fl = Nil)
      .exists(_.gen.isDefined),
      "the chain should carry at least one generation-tagged entry")
    // version-pinned plans agree as well (pre-recluster snapshot)
    assert(plannedAt("1", v = 2) === plannedAt(Long.MaxValue.toString,
      v = 2))
  }

  test("a production DSv2 read engages the distributed planner above " +
      "the threshold, plans the identical file set, and answers " +
      "identically") {
    val dir = freshDir("scan")
    // range layout: per-file k-ranges are disjoint, so the band prune
    // provably keeps a strict subset
    (0L until 3000L).map(k => (k, s"v$k")).toDF("k", "v")
      .repartitionByRange(4, col("k"))
      .write.format(fmt).option("path", dir).mode("overwrite").save()
    (3000L until 3500L).map(k => (k, s"d$k")).toDF("k", "v").coalesce(1)
      .write.format(fmt).option("path", dir).mode("append").save()
    GdxSource.delete(spark, dir, col("k") % 50 === 3)
    val expected =
      (0L until 3500L).filter(k => k >= 2900L && k % 50 != 3)
    // baseline answer through the classic driver loop
    val sBig = Sessions.pinned(spark,
      "spark.gdx.plan.distributedMinBytes" -> Long.MaxValue.toString)
    val viaDriver = Sessions.withActive(sBig) {
      sBig.read.format(fmt).option("path", dir).load()
        .filter(col("k") >= 2900L).select("k")
        .as[Long](org.apache.spark.sql.Encoders.scalaLong)
        .collect().sorted.toSeq
    }
    // distributed path: threshold 1 byte forces the Spark-job planner
    val sJob = Sessions.pinned(spark,
      "spark.gdx.plan.distributedMinBytes" -> "1")
    val before = GdxSource.distributedPlanCount.get()
    val viaJob = Sessions.withActive(sJob) {
      sJob.read.format(fmt).option("path", dir).load()
        .filter(col("k") >= 2900L).select("k")
        .as[Long](org.apache.spark.sql.Encoders.scalaLong)
        .collect().sorted.toSeq
    }
    assert(GdxSource.distributedPlanCount.get() > before,
      "the DSv2 scan must resolve entries through the distributed " +
        "planner above the threshold")
    assert(viaJob === viaDriver && viaJob === expected)
    // identical FILE SET: the planner's survivors equal the driver
    // loop's prune of the full snapshot
    val band = Seq(org.apache.spark.sql.sources
      .GreaterThanOrEqual("k", 2900L: Any))
    val jobSet = Sessions.withActive(sJob)(
      GdxSource.plannedEntries(dir, conf, -1, band))
    val drvSet = GdxSource.pruneByStats(
      GdxSource.committedEntries(dir, conf), band)
    assert(jobSet === drvSet)
    assert(jobSet.nonEmpty &&
      jobSet.size < GdxSource.committedEntries(dir, conf).size)
  }
}
