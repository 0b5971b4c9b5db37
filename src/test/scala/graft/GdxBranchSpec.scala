package graft

import org.apache.spark.sql.functions._
import graft.sources.GdxSource

/** Branches + write-audit-publish (sources/GdxSource.createBranch /
  * publishBranch / dropBranch; SQL `ALTER TABLE ... CREATE/DROP/
  * PUBLISH BRANCH`): a branch is a zero-copy clone inside the table
  * (`_branches/<name>.t/`) whose ref file pins its base version
  * against VACUUM; writes to the branch are invisible on main; publish
  * fast-forwards main to the audited head as ONE CAS'd metadata
  * commit, and a concurrent main commit forces the loud conflict
  * path. */
class GdxBranchSpec extends SparkSuite {
  import spark.implicits._

  private val fmt = "graft.sources.GdxSource"
  private def freshDir(tag: String): String =
    java.nio.file.Files.createTempDirectory(s"gdxbr_$tag").toString + "/t"
  private def conf = GdxSource.driverConf()
  private def read(dir: String) =
    spark.read.format(fmt).option("path", dir).load()

  private def seed(dir: String, n: Int): Unit =
    (0L until n.toLong).map(k => (k, s"v$k")).toDF("k", "v").coalesce(1)
      .write.format(fmt).option("path", dir).mode("overwrite").save()

  test("branch writes are invisible on main; branch reads see base + " +
      "branch commits; publish fast-forwards main in one metadata " +
      "commit") {
    val dir = freshDir("wap")
    seed(dir, 100) // v1
    val base = GdxSource.createBranch(dir, "dev")
    assert(base === 1)
    // WRITE: append restatements + DELETE on the branch only
    Seq((1000L, "branch-new")).toDF("k", "v").coalesce(1)
      .write.format(fmt).option("path", dir).option("branch", "dev")
      .mode("append").save()
    GdxSource.delete(spark, GdxSource.branchDir(dir, "dev"),
      col("k") < 10L)
    // AUDIT: branch sees 91 rows, main still 100 at version 1
    val branchView = spark.read.format(fmt).option("path", dir)
      .option("branch", "dev").load()
    assert(branchView.count() === 91L)
    assert(read(dir).count() === 100L)
    assert(GdxSource.listVersions(dir, conf).max === 1)
    // PUBLISH: one metadata commit; main now serves the audited head
    val v = GdxSource.publishBranch(dir, "dev")
    assert(v === 2)
    assert(GdxSource.listVersions(dir, conf) === Seq(1, 2))
    assert(read(dir).count() === 91L)
    assert(read(dir).filter(col("v") === "branch-new").count() === 1L)
    // the pre-publish snapshot still time-travels
    assert(spark.read.format(fmt).option("path", dir)
      .option("version", "1").load().count() === 100L)
    // the branch stays readable, now protected at the published version
    assert(GdxSource.listBranches(dir, conf) === Map("dev" -> 2))
  }

  test("a concurrent main commit forces the documented conflict path") {
    val dir = freshDir("conflict")
    seed(dir, 10) // v1
    GdxSource.createBranch(dir, "risky")
    Seq((100L, "on-branch")).toDF("k", "v").coalesce(1)
      .write.format(fmt).option("path", dir).option("branch", "risky")
      .mode("append").save()
    // main moves underneath the branch
    Seq((200L, "on-main")).toDF("k", "v").coalesce(1)
      .write.format(fmt).option("path", dir).mode("append").save() // v2
    val e = intercept[graft.sources.GdxConcurrentModificationException] {
      GdxSource.publishBranch(dir, "risky")
    }
    assert(e.getMessage.contains("advanced") &&
      e.getMessage.contains("rebase"), e.getMessage)
    // nothing published: main keeps its own row, not the branch's
    assert(read(dir).filter(col("v") === "on-branch").count() === 0L)
    assert(read(dir).count() === 11L)
  }

  test("VACUUM retains the branch's base version like a tag; DROP " +
      "BRANCH releases it") {
    val dir = freshDir("vac")
    seed(dir, 50) // v1
    GdxSource.createBranch(dir, "hold") // pins v1
    // two more main commits so v1 would age out of keepLast=1
    Seq((500L, "x")).toDF("k", "v").coalesce(1)
      .write.format(fmt).option("path", dir).mode("append").save() // v2
    Seq((501L, "y")).toDF("k", "v").coalesce(1)
      .write.format(fmt).option("path", dir).mode("append").save() // v3
    GdxSource.vacuum(dir, conf, keepLast = 1)
    // v1 survived for the branch; the branch's absolute refs still read
    assert(GdxSource.listVersions(dir, conf).contains(1))
    assert(spark.read.format(fmt).option("path", dir)
      .option("branch", "hold").load().count() === 50L)
    assert(GdxSource.dropBranch(dir, "hold"))
    GdxSource.vacuum(dir, conf, keepLast = 1)
    assert(GdxSource.listVersions(dir, conf) === Seq(3))
  }

  test("dropBranch never tears adopted files out of main: the working " +
      "dir survives while referenced and reclaims after OPTIMIZE + " +
      "VACUUM") {
    val dir = freshDir("drop")
    seed(dir, 20) // v1
    GdxSource.createBranch(dir, "adopted")
    Seq((900L, "br")).toDF("k", "v").coalesce(1)
      .write.format(fmt).option("path", dir).option("branch", "adopted")
      .mode("append").save()
    GdxSource.publishBranch(dir, "adopted") // main references _branches/
    val wdir = new java.io.File(GdxSource.branchDir(dir, "adopted"))
    assert(GdxSource.dropBranch(dir, "adopted"))
    // ref released, but the dir MUST survive: main v2 references it
    assert(wdir.exists, "referenced working dir must not be deleted")
    assert(read(dir).count() === 21L)
    assert(read(dir).filter(col("v") === "br").count() === 1L)
    // localize: full OPTIMIZE materializes main's rows into its root;
    // vacuum ages out the referencing manifests and reclaims the dir
    GdxSource.compact(spark, dir, target = 1)
    GdxSource.vacuum(dir, conf, keepLast = 1)
    assert(!wdir.exists, "unreferenced working dir must be reclaimed")
    assert(read(dir).count() === 21L)
    assert(read(dir).filter(col("v") === "br").count() === 1L)
  }

  test("SQL front door: CREATE/PUBLISH/DROP BRANCH + branch-addressed " +
      "audit reads; unknown branch is loud") {
    val dir = freshDir("sql")
    val s = org.apache.spark.sql.graft.ColumnBridge
      .sessionWithExtensions(spark, new GraftExtensions())
    seed(dir, 30)
    val tbl = "gdxbr_t_" +
      java.util.UUID.randomUUID().toString.replace("-", "")
    s.sql(s"""CREATE TABLE $tbl (k BIGINT, v STRING)
      USING $fmt OPTIONS (path '$dir')""")
    try {
      assert(s.sql(s"ALTER TABLE $tbl CREATE BRANCH wap").head.getLong(0)
        === 1L)
      Seq((777L, "audited")).toDF("k", "v").coalesce(1)
        .write.format(fmt).option("path", dir).option("branch", "wap")
        .mode("append").save()
      assert(s.sql(s"SELECT count(*) FROM $tbl").head.getLong(0) === 30L)
      // the audit query stays IN SQL: VERSION AS OF a branch name
      // reads the branch head while main is untouched
      assert(s.sql(s"SELECT count(*) FROM $tbl VERSION AS OF 'wap'")
        .head.getLong(0) === 31L)
      assert(s.sql(s"SELECT v FROM $tbl VERSION AS OF 'wap' " +
        "WHERE k = 777").head.getString(0) === "audited")
      // a TAG with the same machinery keeps priority over branches
      // and numbers keep resolving as main-history versions
      s.sql(s"ALTER TABLE $tbl CREATE TAG pinned VERSION AS OF 1")
      assert(s.sql(s"SELECT count(*) FROM $tbl VERSION AS OF 'pinned'")
        .head.getLong(0) === 30L)
      assert(s.sql(s"SELECT count(*) FROM $tbl VERSION AS OF 1")
        .head.getLong(0) === 30L)
      // an unknown name is still the loud tag error, not a silent scan
      intercept[Exception](
        s.sql(s"SELECT count(*) FROM $tbl VERSION AS OF 'ghost'")
          .collect())
      assert(s.sql(s"ALTER TABLE $tbl PUBLISH BRANCH wap").head.getLong(0)
        === 2L)
      assert(s.sql(s"SELECT count(*) FROM $tbl").head.getLong(0) === 31L)
      val e = intercept[Exception] {
        spark.read.format(fmt).option("path", dir)
          .option("branch", "nope").load()
      }
      assert(e.getMessage.contains("no branch 'nope'"), e.getMessage)
      // publish of a vanished branch is loud too
      val e2 = intercept[Exception](
        s.sql(s"ALTER TABLE $tbl PUBLISH BRANCH nope"))
      assert(e2.getMessage.contains("no branch"), e2.getMessage)
    } finally s.sql(s"DROP TABLE IF EXISTS $tbl")
  }

  test("branch schema evolution publishes with the branch") {
    val dir = freshDir("evo")
    seed(dir, 5) // v1
    GdxSource.createBranch(dir, "schema")
    val bdir = GdxSource.branchDir(dir, "schema")
    GdxSource.addColumn(bdir, "score", org.apache.spark.sql.types.DoubleType)
    Seq((50L, "n", 1.5)).toDF("k", "v", "score").coalesce(1)
      .write.format(fmt).option("path", bdir).mode("append").save()
    // main's schema is untouched during the audit
    assert(read(dir).schema.fieldNames.toSeq === Seq("k", "v"))
    GdxSource.publishBranch(dir, "schema")
    assert(read(dir).schema.fieldNames.toSeq === Seq("k", "v", "score"))
    assert(read(dir).filter(col("score") === 1.5).count() === 1L)
    assert(read(dir).count() === 6L)
  }
}
