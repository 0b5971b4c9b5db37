package graft

import org.apache.spark.sql.functions._
import graft.sources.GdxSource

/** Snapshot tags on the GDX format (sources/GdxSource.createTag):
  * immutable named refs to versions — `FOR VERSION AS OF 'name'`
  * replays the exact tagged file set, VACUUM keeps tagged snapshots
  * alive (materializing stranded deltas) while untagged history ages
  * out, and DROP TAG releases the pin. The reproducible-dataset
  * contract a training pipeline cites in a model card. */
class GdxTagSpec extends SparkSuite {

  private val fmt = "graft.sources.GdxSource"
  private def freshDir(tag: String): String =
    java.nio.file.Files.createTempDirectory(s"gdxtag_$tag").toString + "/t"
  private def conf = GdxSource.driverConf()
  private def read(dir: String) =
    spark.read.format(fmt).option("path", dir).load()

  private def seed(dir: String, lo: Long, hi: Long,
                   mode: String = "append"): Unit = {
    import spark.implicits._
    (lo until hi).map(k => (k, s"v$k")).toDF("k", "v").coalesce(1)
      .write.format(fmt).option("path", dir).mode(mode).save()
  }

  test("create/list/drop; duplicates refuse; reads resolve names " +
      "through option(version)") {
    val dir = freshDir("basic")
    seed(dir, 0, 10, "overwrite") // v1
    seed(dir, 10, 20)             // v2
    assert(GdxSource.createTag(dir, "train_v1", 1) === 1)
    assert(GdxSource.createTag(dir, "latest") === 2) // default = max
    assert(GdxSource.listTags(dir, conf) ===
      Map("train_v1" -> 1, "latest" -> 2))
    // immutable: re-pointing is DROP + CREATE
    val e = intercept[Exception](GdxSource.createTag(dir, "train_v1", 2))
    assert(e.getMessage.contains("immutable"), e.getMessage)
    // name resolution in the read option — identical to the number pin
    assert(spark.read.format(fmt).option("path", dir)
      .option("version", "train_v1").load().count() === 10L)
    assert(spark.read.format(fmt).option("path", dir)
      .option("version", "1").load().count() === 10L)
    // unknown refs are loud and name the live tags
    val e2 = intercept[Exception] {
      spark.read.format(fmt).option("path", dir)
        .option("version", "nope").load().count()
    }
    assert(e2.getMessage.contains("neither a version number nor a tag"),
      e2.getMessage)
    assert(GdxSource.dropTag(dir, "train_v1"))
    assert(!GdxSource.dropTag(dir, "train_v1")) // already gone
    assert(GdxSource.listTags(dir, conf) === Map("latest" -> 2))
    // a tag can never point outside retained history
    intercept[Exception](GdxSource.createTag(dir, "bad", 99))
    // ...and never be all digits: '7' would resolve as version 7 on
    // read, not as the tag — refused at creation, loudly
    val e3 = intercept[Exception](GdxSource.createTag(dir, "7", 1))
    assert(e3.getMessage.contains("all digits"), e3.getMessage)
  }

  test("VACUUM keeps tagged snapshots (files AND manifests), " +
      "materializes stranded deltas, and reclaims after DROP TAG") {
    val dir = freshDir("vac")
    seed(dir, 0, 10, "overwrite") // v1 (full)
    seed(dir, 10, 20)             // v2 (delta)
    seed(dir, 20, 30)             // v3 (delta)
    seed(dir, 30, 40)             // v4 (delta)
    GdxSource.createTag(dir, "train_v2", 2)
    val removed = GdxSource.vacuum(dir, conf, keepLast = 1)
    // v1's file is referenced by the tagged v2; v3's delta file is
    // referenced by v4 — every file stays referenced, so nothing
    // is reclaimable yet
    assert(GdxSource.listVersions(dir, conf) === Seq(2, 4))
    // the tagged v2 was a DELTA whose base (v1) is gone — it must have
    // been materialized and still read exactly
    assert(spark.read.format(fmt).option("path", dir)
      .option("version", "train_v2").load().count() === 20L)
    assert(read(dir).count() === 40L)
    assert(removed === 0)
    // drop the tag: the next vacuum ages v2 out and reclaims the
    // files only it referenced (none here — v2's files are v4's too),
    // so prove reclamation on a truncate history instead
    GdxSource.dropTag(dir, "train_v2")
    seed(dir, 100, 105, "overwrite") // v5: truncate — v4's files orphan
    val removed2 = GdxSource.vacuum(dir, conf, keepLast = 1)
    assert(GdxSource.listVersions(dir, conf) === Seq(5))
    assert(removed2 > 0)
    assert(read(dir).count() === 5L)
  }

  test("a tagged snapshot survives a truncate-overwrite vacuum: the " +
      "tag holds the ONLY reference to its era's files") {
    val dir = freshDir("only")
    seed(dir, 0, 25, "overwrite")  // v1
    GdxSource.createTag(dir, "frozen", 1)
    seed(dir, 50, 60, "overwrite") // v2: truncate — v1 files orphaned
    val removed = GdxSource.vacuum(dir, conf, keepLast = 1)
    assert(removed === 0, "tagged era's files must never be reclaimed")
    assert(GdxSource.listVersions(dir, conf).sorted === Seq(1, 2))
    assert(spark.read.format(fmt).option("path", dir)
      .option("version", "frozen").load().count() === 25L)
    assert(read(dir).count() === 10L)
  }

  test("SQL front door: CREATE TAG / DROP TAG / FOR VERSION AS OF " +
      "'name' / .tags metadata table through the catalog") {
    val wh = java.nio.file.Files.createTempDirectory("gdxtag_cat").toString
    val cat = s"gtag${java.util.UUID.randomUUID().toString.take(8)}"
    val s = org.apache.spark.sql.graft.ColumnBridge
      .sessionWithExtensions(spark, new GraftExtensions())
    s.conf.set(s"spark.sql.catalog.$cat", "graft.sources.GdxCatalog")
    s.conf.set(s"spark.sql.catalog.$cat.warehouse", wh)
    s.sql(s"CREATE NAMESPACE $cat.lab")
    s.sql(s"CREATE TABLE $cat.lab.t (k BIGINT, v STRING)")
    s.sql(s"INSERT INTO $cat.lab.t SELECT id, concat('a', id) " +
      "FROM range(0, 8)")
    s.sql(s"INSERT INTO $cat.lab.t SELECT 100 + id, concat('b', id) " +
      "FROM range(0, 4)")
    // catalog CREATE TABLE committed v1 (empty); the first INSERT is v2
    assert(s.sql(s"ALTER TABLE $cat.lab.t CREATE TAG rel-1 " +
      "VERSION AS OF 2").head.getLong(0) === 2L)
    // read back BY NAME through Spark's native time-travel syntax
    assert(s.sql(
      s"SELECT count(*) FROM $cat.lab.t FOR VERSION AS OF 'rel-1'")
      .head.getLong(0) === 8L)
    assert(s.sql(s"SELECT count(*) FROM $cat.lab.t").head.getLong(0)
      === 12L)
    // the .tags metadata table lists the ref
    assert(s.sql(s"SELECT tag, version FROM $cat.lab.t.tags")
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq ===
      Seq(("rel-1", 2L)))
    // every other VERSION AS OF surface resolves the same refs:
    // changefeed windows anchored at a tag...
    assert(s.sql(s"SHOW CHANGES $cat.lab.t FROM 'rel-1'")
      .filter("change_type = 'insert'").count() === 4L)
    // ...zero-copy forks of the tagged snapshot...
    val cdir = java.nio.file.Files
      .createTempDirectory("gdxtag_clone").toString + "/fork"
    s.sql(s"""CREATE TABLE gdxtag_fork SHALLOW CLONE $cat.lab.t
      VERSION AS OF 'rel-1' LOCATION '$cdir'""")
    try assert(s.sql("SELECT count(*) FROM gdxtag_fork")
      .head.getLong(0) === 8L)
    finally s.sql("DROP TABLE IF EXISTS gdxtag_fork")
    // ...tags aliasing tags...
    s.sql(s"ALTER TABLE $cat.lab.t CREATE TAG rel-1-alias " +
      "VERSION AS OF 'rel-1'")
    assert(GdxSource.listTags(s"$wh/lab/t", conf)("rel-1-alias") === 2)
    s.sql(s"ALTER TABLE $cat.lab.t DROP TAG rel-1-alias")
    // ...and RESTORE: roll the live table back to the tagged snapshot
    // by NAME
    val r = s.sql(s"RESTORE TABLE $cat.lab.t TO VERSION AS OF 'rel-1'")
      .head
    assert(r.getLong(0) === 2L)
    assert(s.sql(s"SELECT count(*) FROM $cat.lab.t").head.getLong(0)
      === 8L)
    assert(s.sql(s"ALTER TABLE $cat.lab.t DROP TAG rel-1")
      .head.getBoolean(0))
    assert(s.sql(s"SELECT count(*) FROM $cat.lab.t.tags")
      .head.getLong(0) === 0L)
  }
}
