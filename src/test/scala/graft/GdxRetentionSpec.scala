package graft

import org.apache.spark.sql.functions._
import graft.sources.GdxSource

/** Age-based retention (`VACUUM ... RETAIN n HOURS`) and the opt-in
  * crash-orphan sweep (`... SWEEP ORPHANS OLDER THAN n HOURS`):
  * retention clauses only ever WIDEN the kept set (age ∪ keepLast ∪
  * tags ∪ branches), and the sweep reaps only aged `*.tmp` strays —
  * never an in-flight write, never committed data. */
class GdxRetentionSpec extends SparkSuite {
  import spark.implicits._

  private val fmt = "graft.sources.GdxSource"
  private def freshDir(tag: String): String =
    java.nio.file.Files.createTempDirectory(s"gdxret_$tag").toString + "/t"
  private def conf = GdxSource.driverConf()
  private def read(dir: String) =
    spark.read.format(fmt).option("path", dir).load()

  private def commit(dir: String, k: Long): Unit =
    Seq((k, s"v$k")).toDF("k", "v").coalesce(1)
      .write.format(fmt).option("path", dir)
      .mode(if (k == 0) "overwrite" else "append").save()

  private def setManifestAge(dir: String, v: Int, ageHours: Double): Unit = {
    val f = new java.io.File(dir, f"_manifest-$v%08d")
    assert(f.exists, s"no manifest $v under $dir")
    assert(f.setLastModified(
      System.currentTimeMillis() - (ageHours * 3600 * 1000).toLong))
  }

  test("RETAIN n HOURS keeps the age window plus the newest; a tagged " +
      "old version survives the cutoff") {
    val dir = freshDir("age")
    (0L to 4L).foreach(commit(dir, _)) // v1..v5
    // v1, v2 are 10 days old; v3 is 100 h; v4, v5 are fresh
    setManifestAge(dir, 1, 240); setManifestAge(dir, 2, 240)
    setManifestAge(dir, 3, 100)
    GdxSource.createTag(dir, "keepme", 2) // pins the 10-day-old v2
    GdxSource.vacuum(dir, conf, retainHours = Some(168))
    // kept: v3 (inside 168 h), v4, v5 (fresh), v2 (tagged); v1 gone
    assert(GdxSource.listVersions(dir, conf) === Seq(2, 3, 4, 5))
    // the tagged snapshot still reads whole
    assert(spark.read.format(fmt).option("path", dir)
      .option("version", "keepme").load().count() === 2L)
    assert(read(dir).count() === 5L)
  }

  test("RETAIN n HOURS with everything fresh keeps everything; with " +
      "everything stale keeps only the newest") {
    val dir = freshDir("edges")
    (0L to 2L).foreach(commit(dir, _)) // v1..v3, all fresh
    GdxSource.vacuum(dir, conf, retainHours = Some(1))
    assert(GdxSource.listVersions(dir, conf) === Seq(1, 2, 3))
    (1 to 3).foreach(setManifestAge(dir, _, 48))
    GdxSource.vacuum(dir, conf, retainHours = Some(24))
    assert(GdxSource.listVersions(dir, conf) === Seq(3))
    assert(read(dir).count() === 3L)
  }

  test("the orphan sweep reaps only AGED tmp strays: a fresh in-flight " +
      "tmp and all committed data survive") {
    val dir = freshDir("orphan")
    commit(dir, 0); commit(dir, 1) // v1, v2
    val dataBefore = read(dir).collect().toSet
    // a crashed writer's strays: an aged data tmp + its bloom sidecar
    // + an aged dot-manifest tmp
    val stale = new java.io.File(dir, "part-dead.gdx.tmp")
    val staleBloom = new java.io.File(dir, "part-dead.gdx.tmp.bfx")
    val staleMani = new java.io.File(dir, "._manifest-00000009.tmp-xyz")
    val fresh = new java.io.File(dir, "part-live.gdx.tmp")
    Seq(stale, staleBloom, staleMani, fresh).foreach { f =>
      java.nio.file.Files.write(f.toPath, "junk".getBytes)
    }
    val old = System.currentTimeMillis() - 72L * 3600 * 1000
    Seq(stale, staleBloom, staleMani).foreach(f =>
      assert(f.setLastModified(old)))
    // no sweep option -> orphans untouched (opt-in contract)
    GdxSource.vacuum(dir, conf, keepLast = 2)
    assert(stale.exists && fresh.exists)
    // swept at 48 h: aged strays go, the fresh tmp survives
    val n = GdxSource.vacuum(dir, conf, keepLast = 2,
      sweepOrphanHours = Some(48))
    assert(n >= 2, s"swept $n") // data tmp + manifest tmp (bloom uncounted)
    assert(!stale.exists && !staleBloom.exists && !staleMani.exists)
    assert(fresh.exists, "a young in-flight tmp must never be reaped")
    assert(read(dir).collect().toSet === dataBefore)
    fresh.delete()
  }

  test("DRY RUN prices the statement and touches nothing; the real " +
      "run then reclaims exactly the priced count") {
    val dir = freshDir("dry")
    // four OVERWRITE commits: only v4's file stays referenced
    (0L to 3L).foreach(k => Seq((k, s"v$k")).toDF("k", "v").coalesce(1)
      .write.format(fmt).option("path", dir).mode("overwrite").save())
    // a stale crash orphan the sweep would also price
    val orphan = new java.io.File(dir, "dead.gdx.tmp")
    java.nio.file.Files.writeString(orphan.toPath, "x")
    assert(orphan.setLastModified(
      System.currentTimeMillis() - 10 * 3600 * 1000))
    val before = new java.io.File(dir).listFiles().map(_.getName).toSet
    val vsBefore = GdxSource.listVersions(dir, conf)
    val dry = GdxSource.vacuum(dir, conf, keepLast = 1,
      sweepOrphanHours = Some(1.0), dryRun = true)
    // nothing moved: same files, same manifests
    assert(new java.io.File(dir).listFiles().map(_.getName).toSet
      === before)
    assert(GdxSource.listVersions(dir, conf) === vsBefore)
    assert(dry === 4L) // v1..v3's three data files + the orphan
    val real = GdxSource.vacuum(dir, conf, keepLast = 1,
      sweepOrphanHours = Some(1.0))
    assert(real === dry)
    assert(!orphan.exists)
    assert(read(dir).count() === 1L)
  }

  test("SQL front door: RETAIN HOURS and SWEEP ORPHANS forms") {
    val dir = freshDir("sql")
    val s = org.apache.spark.sql.graft.ColumnBridge
      .sessionWithExtensions(spark, new GraftExtensions())
    (0L to 2L).foreach(commit(dir, _)) // v1..v3
    val tbl = "gdxret_t_" +
      java.util.UUID.randomUUID().toString.replace("-", "")
    s.sql(s"""CREATE TABLE $tbl (k BIGINT, v STRING)
      USING $fmt OPTIONS (path '$dir')""")
    try {
      val stray = new java.io.File(dir, "part-stray.gdx.tmp")
      java.nio.file.Files.write(stray.toPath, "junk".getBytes)
      assert(stray.setLastModified(
        System.currentTimeMillis() - 10L * 3600 * 1000))
      (1 to 2).foreach(setManifestAge(dir, _, 24))
      val removed = s.sql(
        s"VACUUM $tbl RETAIN 12 HOURS SWEEP ORPHANS OLDER THAN 5 HOURS")
        .head.getLong(0)
      assert(removed >= 1L, s"removed $removed")
      assert(!stray.exists)
      assert(GdxSource.listVersions(dir, conf) === Seq(3))
      assert(s.sql(s"SELECT count(*) FROM $tbl").head.getLong(0) === 3L)
      // the classic VERSIONS form still parses
      s.sql(s"VACUUM $tbl RETAIN 1 VERSIONS")
      assert(GdxSource.listVersions(dir, conf) === Seq(3))
    } finally s.sql(s"DROP TABLE IF EXISTS $tbl")
  }
}
