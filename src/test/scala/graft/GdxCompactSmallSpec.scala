package graft

import org.apache.spark.sql.functions._
import graft.sources.GdxSource

/** Bin-packing OPTIMIZE (sources/GdxSource.compactSmall; SQL
  * `OPTIMIZE t BINPACK <bytes>`): rewrite ONLY the small-file tail
  * and DV-carrying files, carry large files by reference without
  * ever opening them, compact each partition directory within
  * itself, and fold deletion vectors away — the maintenance whose
  * cost tracks the tail, not the table. */
class GdxCompactSmallSpec extends SparkSuite {
  import spark.implicits._

  private val fmt = "graft.sources.GdxSource"
  private def freshDir(tag: String): String =
    java.nio.file.Files.createTempDirectory(s"gdxcs_$tag").toString + "/t"
  private def conf = GdxSource.driverConf()
  private def read(dir: String) =
    spark.read.format(fmt).option("path", dir).load()
  private def names(dir: String): Seq[String] =
    GdxSource.committedEntries(dir, conf).map(_.name)

  test("only the small tail rewrites; the large file is carried by " +
      "reference and NEVER OPENED (corrupted-file proof)") {
    val dir = freshDir("tail")
    // one big file + four tiny appends
    (0L until 5000L).map(k => (k, s"v$k")).toDF("k", "v").coalesce(1)
      .write.format(fmt).option("path", dir).mode("overwrite").save()
    for (i <- 0 until 4)
      Seq((10000L + i, "tiny")).toDF("k", "v").coalesce(1)
        .write.format(fmt).option("path", dir).mode("append").save()
    val big = GdxSource.committedEntries(dir, conf)
      .maxBy(e => new java.io.File(dir, e.name).length())
    val bigBytes = new java.io.File(dir, big.name).length()
    // corrupt the big file BEFORE the compaction (SAME length — the
    // size partition must still see it as large): a bin-pack that
    // tried to read it would fail on the stale checksum
    val bigBackup = java.nio.file.Files.readAllBytes(
      new java.io.File(dir, big.name).toPath)
    java.nio.file.Files.write(new java.io.File(dir, big.name).toPath,
      Array.fill[Byte](bigBackup.length)('x'))
    val (before, after) = GdxSource.compactSmall(spark, dir, bigBytes)
    assert(before === 5 && after === 2, s"($before, $after)")
    assert(names(dir).contains(big.name), "large file carried by name")
    // restore the big file: the table reads whole again, tail merged
    java.nio.file.Files.write(
      new java.io.File(dir, big.name).toPath, bigBackup)
    assert(read(dir).count() === 5004L)
    assert(read(dir).filter(col("v") === "tiny").count() === 4L)
  }

  test("DV-carrying files fold their deletions; clean groups at or " +
      "under target are untouched (no-op returns)") {
    val dir = freshDir("dv")
    (0L until 100L).map(k => (k, s"v$k")).toDF("k", "v").coalesce(1)
      .write.format(fmt).option("path", dir).mode("overwrite").save()
    GdxSource.delete(spark, dir, col("k") < 10L)
    assert(GdxSource.committedEntries(dir, conf).exists(_.dv.isDefined))
    val (b, a) = GdxSource.compactSmall(spark, dir, smallBytes = 1L)
    // smallBytes=1 means nothing is small - the DV alone qualifies it
    assert(b === 1 && a === 1)
    assert(GdxSource.committedEntries(dir, conf).forall(_.dv.isEmpty))
    assert(read(dir).count() === 90L)
    // second run: single clean file per group - a true no-op, no commit
    val v = GdxSource.listVersions(dir, conf).max
    assert(GdxSource.compactSmall(spark, dir, 1L) === ((1, 1)))
    assert(GdxSource.listVersions(dir, conf).max === v)
  }

  test("the threshold doubles as the target bin size: an oversized " +
      "tail splits instead of merging unbounded; a no-gain group is " +
      "a no-op") {
    val dir = freshDir("bins")
    for (i <- 0 until 4)
      (0L until 1000L).map(k => (i * 10000L + k, s"v$k")).toDF("k", "v")
        .coalesce(1).write.format(fmt).option("path", dir)
        .mode(if (i == 0) "overwrite" else "append").save()
    val s0 = GdxSource.committedEntries(dir, conf)
      .map(e => new java.io.File(dir, e.name).length()).max
    // threshold ≈ 2 files: the 4-file tail packs into 2 bins, not 1
    val (b, a) = GdxSource.compactSmall(spark, dir, 2 * s0)
    assert(b === 4 && a === 2, s"($b, $a)")
    assert(read(dir).count() === 4000L)
    // threshold ≈ 1 file: 2 clean files of ~2 bins each — rewriting
    // would not shrink, so nothing happens and no version publishes
    val v = GdxSource.listVersions(dir, conf).max
    assert(GdxSource.compactSmall(spark, dir, s0 + 1) === ((2, 2)))
    assert(GdxSource.listVersions(dir, conf).max === v)
  }

  test("partitioned layouts compact WITHIN their directories: names " +
      "keep proving keys, slices and layout survive") {
    val dir = freshDir("part")
    for (i <- 0 until 3)
      (0L until 60L).map(k => (300L * i + k, s"r$k", k % 3))
        .toDF("k", "v", "p").repartition(3)
        .write.format(fmt).option("path", dir)
        .option("partitionBy", "p").mode(
          if (i == 0) "overwrite" else "append").save()
    val nBefore = names(dir).size
    val (b, a) = GdxSource.compactSmall(spark, dir, 1L << 20)
    assert(b === nBefore && a === 3, s"($b, $a) from $nBefore")
    // every rewritten file still lives under its p= directory
    assert(names(dir).forall(_.matches("p=\\d+/.*")), names(dir).toString)
    assert(read(dir).count() === 180L)
    // the slice machinery (which refuses unproven-key files) still
    // works - proof the layout genuinely survived the bin-pack
    val (cb, ca) = GdxSource.compactWhere(spark, dir, "p = 1")
    assert(cb >= 0 && ca >= 0)
  }

  test("clone refs are NEVER rewritten into the source directory: " +
      "BINPACK localizes them under the clone's own root, keeping " +
      "the partition component") {
    val src = freshDir("clsrc")
    (0L until 60L).map(k => (k, s"v$k", k % 2)).toDF("k", "v", "p")
      .repartition(3).write.format(fmt).option("path", src)
      .option("partitionBy", "p").mode("overwrite").save()
    val clone = freshDir("cldst")
    GdxSource.cloneShallow(src, clone)
    // clone-local DV attached to ABSOLUTE (source-referencing) entries
    GdxSource.delete(spark, clone, col("k") < 5L)
    def srcListing: Set[String] = {
      def walk(d: java.io.File): Seq[String] =
        Option(d.listFiles()).toSeq.flatten.flatMap(f =>
          if (f.isDirectory) walk(f) else Seq(f.getPath))
      walk(new java.io.File(src)).toSet
    }
    val srcBefore = srcListing
    val (b, a) = GdxSource.compactSmall(spark, clone, 1L << 20)
    assert(b >= a && a === 2, s"($b, $a)") // one localized file per p=
    // the clone-local DVs folded away with the localization
    assert(GdxSource.committedEntries(clone, conf).forall(_.dv.isEmpty))
    // the source directory gained NOTHING - the rewrite landed in the
    // clone, where its files are referenced and vacuum-safe
    assert(srcListing === srcBefore)
    val ns = names(clone)
    assert(ns.forall(n => !GdxSource.isAbsoluteName(n) &&
      n.matches("p=\\d+/.*")), ns.toString)
    assert(read(clone).count() === 55L)
    // the decisive check: a routine source-side VACUUM reaps nothing
    // (the bug wrote upd files into src, unreferenced by src manifests)
    assert(GdxSource.vacuum(src, conf) === 0)
    assert(read(clone).count() === 55L)
    assert(read(src).count() === 60L)
  }

  test("SQL front door: OPTIMIZE t BINPACK n; refused with WHERE or " +
      "ZORDER") {
    val dir = freshDir("sql")
    val s = org.apache.spark.sql.graft.ColumnBridge
      .sessionWithExtensions(spark, new GraftExtensions())
    s.sql(s"""CREATE TABLE gdxcs_t (k BIGINT, v STRING)
      USING $fmt OPTIONS (path '$dir')""")
    try {
      for (i <- 0 until 3)
        s.sql(s"INSERT INTO gdxcs_t VALUES ($i, 'x$i')")
      val r = s.sql("OPTIMIZE gdxcs_t BINPACK 1048576").head
      assert(r.getLong(0) === 3L && r.getLong(1) === 1L)
      assert(s.sql("SELECT count(*) FROM gdxcs_t").head.getLong(0) === 3L)
      val e = intercept[Exception](
        s.sql("OPTIMIZE gdxcs_t WHERE k = 1 BINPACK 100"))
      assert(e.getMessage.contains("BINPACK"), e.getMessage)
    } finally s.sql("DROP TABLE IF EXISTS gdxcs_t")
  }
}
