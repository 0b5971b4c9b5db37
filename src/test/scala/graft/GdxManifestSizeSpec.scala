package graft

import org.apache.spark.sql.functions._
import graft.sources.GdxSource

/** A spy filesystem that records every getFileStatus target — the
  * proof that size-consuming planners run METADATA-ONLY on manifests
  * that carry `b:` file sizes (at 100 TB an O(files) stat storm per
  * plan is what separates a usable table format from a LIST bill). */
class SpyFileSystem extends org.apache.hadoop.fs.RawLocalFileSystem {
  override def getScheme: String = "spyfs"
  override def getUri: java.net.URI = java.net.URI.create("spyfs:///")
  override def getFileStatus(f: org.apache.hadoop.fs.Path)
      : org.apache.hadoop.fs.FileStatus = {
    // RawLocalFileSystem implements listStatus by statting every
    // child — on a real object store a LIST is ONE call, so a stat
    // issued from inside our own listStatus is not a per-file RPC
    if (!SpyFileSystem.inList.get()) SpyFileSystem.statCalls.add(f.toString)
    super.getFileStatus(f)
  }
  override def listStatus(f: org.apache.hadoop.fs.Path)
      : Array[org.apache.hadoop.fs.FileStatus] = {
    SpyFileSystem.inList.set(true)
    try super.listStatus(f) finally SpyFileSystem.inList.set(false)
  }
}
/** FileContext twin (the CAS publish path resolves an
  * AbstractFileSystem): delegate to the same spy. */
class SpyAbstractFs(uri: java.net.URI,
                    conf: org.apache.hadoop.conf.Configuration)
    extends org.apache.hadoop.fs.DelegateToFileSystem(
      uri, new SpyFileSystem(), conf, "spyfs", false)

object SpyFileSystem {
  val statCalls =
    new java.util.concurrent.ConcurrentLinkedQueue[String]()
  val inList = new ThreadLocal[java.lang.Boolean] {
    override def initialValue(): java.lang.Boolean = false
  }
  def dataFileStats(): Seq[String] = {
    val it = statCalls.iterator()
    val out = Seq.newBuilder[String]
    while (it.hasNext) {
      val p = it.next()
      if (p.endsWith(".gdx")) out += p
    }
    out.result()
  }
}

/** Manifest-carried file sizes (`b:<bytes>` trailing field): both
  * writers record the exact byte count at commit time, and the three
  * size consumers — `estimateStatistics`, DESCRIBE DETAIL, bin-pack
  * sizing — prefer it, issuing ZERO per-data-file stat RPCs on a
  * stats-bearing snapshot. Legacy entries without the field fall back
  * to a live stat. */
class GdxManifestSizeSpec extends SparkSuite {
  import spark.implicits._

  private val fmt = "graft.sources.GdxSource"

  test("writers record exact sizes; estimateStatistics and DESCRIBE " +
      "DETAIL stat no data file on a stats-bearing snapshot") {
    spark.sparkContext.hadoopConfiguration.set("fs.spyfs.impl",
      classOf[SpyFileSystem].getName)
    spark.sparkContext.hadoopConfiguration.set(
      "fs.AbstractFileSystem.spyfs.impl", classOf[SpyAbstractFs].getName)
    val local = java.nio.file.Files.createTempDirectory("gdxsz_")
    val dir = "spyfs://" + local.toString + "/t"
    (1L to 400L).map(k => (k, s"v$k")).toDF("k", "v").repartition(4)
      .write.format(fmt).option("path", dir).mode("overwrite").save()
    // a DML rewrite path writes sized entries too
    GdxSource.update(spark, dir, col("k") <= 5L,
      Map("v" -> lit("u")))
    val conf = GdxSource.driverConf()
    val entries = GdxSource.committedEntries(dir, conf)
    assert(entries.nonEmpty)
    assert(entries.forall(_.stats.exists(_.bytes.isDefined)),
      "every committed entry must carry its byte size")
    // the carried sizes are EXACT (match a live stat)
    val fs = new org.apache.hadoop.fs.Path(dir).getFileSystem(conf)
    entries.foreach { e =>
      val real = fs.getFileStatus(
        GdxSource.entryPath(dir, e.name)).getLen
      assert(e.stats.get.bytes.get === real,
        s"${e.name}: carried ${e.stats.get.bytes.get} != stat $real")
    }
    // ZERO data-file stats during planning / DETAIL / bin-pack sizing
    SpyFileSystem.statCalls.clear()
    val plan = spark.read.format(fmt).option("path", dir).load()
      .queryExecution.optimizedPlan
    val size = plan.stats.sizeInBytes
    assert(size > 0 && size < Long.MaxValue)
    assert(SpyFileSystem.dataFileStats().isEmpty,
      s"estimateStatistics stat'd: ${SpyFileSystem.dataFileStats()}")
    SpyFileSystem.statCalls.clear()
    val detail = GdxSource.describeDetail(spark, dir).head
    assert(detail.getLong(detail.fieldIndex("size_bytes")) ===
      entries.flatMap(_.stats).flatMap(_.bytes).sum)
    assert(SpyFileSystem.dataFileStats().isEmpty,
      s"describeDetail stat'd: ${SpyFileSystem.dataFileStats()}")
    // fold the DVs away so the next pass has nothing to rewrite,
    // then check the SIZING decision itself is metadata-only (the
    // rewrite pass above legitimately opens files to move rows)
    GdxSource.compactSmall(spark, dir, smallBytes = 1L << 20)
    SpyFileSystem.statCalls.clear()
    val (b, a) = GdxSource.compactSmall(spark, dir, smallBytes = 1L)
    assert(b === a, "sizing-only pass must not rewrite")
    assert(SpyFileSystem.dataFileStats().isEmpty,
      s"compactSmall sizing stat'd: ${SpyFileSystem.dataFileStats()}")
    // rows intact after everything
    assert(spark.read.format(fmt).option("path", dir).load().count()
      === 400L)
  }

  test("a legacy entry without b: falls back to a live stat and " +
      "planning still sizes correctly") {
    val dir = java.nio.file.Files
      .createTempDirectory("gdxsz_legacy_").toString + "/t"
    Seq((1L, "a"), (2L, "b")).toDF("k", "v").coalesce(1)
      .write.format(fmt).option("path", dir).mode("overwrite").save()
    val conf = GdxSource.driverConf()
    // strip the b: field from the manifest, simulating a legacy era
    val fs = new org.apache.hadoop.fs.Path(dir).getFileSystem(conf)
    def strip(p: org.apache.hadoop.fs.Path): Unit = {
      val src = scala.io.Source.fromInputStream(fs.open(p), "UTF-8")
      val lines = try src.getLines().toList finally src.close()
      val out = fs.create(p, true)
      try lines.foreach { l =>
        val cleaned = l.split('\t').filterNot(_.startsWith("b:"))
          .mkString("\t")
        out.write((cleaned + "\n").getBytes("UTF-8"))
      } finally out.close()
    }
    val mdir = new org.apache.hadoop.fs.Path(dir)
    fs.listStatus(mdir)
      .filter(_.getPath.getName.startsWith("_manifest"))
      .foreach(st => strip(st.getPath))
    val entries = GdxSource.committedEntries(dir, conf)
    assert(entries.forall(_.stats.exists(_.bytes.isEmpty)))
    val plan = spark.read.format(fmt).option("path", dir).load()
      .queryExecution.optimizedPlan
    assert(plan.stats.sizeInBytes > 0)
    assert(GdxSource.describeDetail(spark, dir).head.getLong(
      GdxSource.describeDetail(spark, dir).head
        .fieldIndex("size_bytes")) > 0L)
  }
}
