package graft

import org.apache.spark.sql.functions._
import graft.sources.GdxSource

/** SQL front doors for the changefeed and shallow clones:
  * `SHOW CHANGES t FROM a [TO b]` resolves to the DISTRIBUTED
  * [[GdxSource.tableChanges]] plan (never a driver-collected command),
  * and `CREATE TABLE dst SHALLOW CLONE src [VERSION AS OF n]
  * [LOCATION '…']` publishes one absolute-path manifest with zero
  * bytes copied. */
class GdxCloneCdfSqlSpec extends SparkSuite {
  import spark.implicits._

  private lazy val s = org.apache.spark.sql.graft.ColumnBridge
    .sessionWithExtensions(spark, new GraftExtensions())

  private val fmt = "graft.sources.GdxSource"

  private def freshDir(tag: String): String =
    java.nio.file.Files.createTempDirectory(s"gdxcc_$tag").toString + "/t"

  test("SHOW CHANGES ≡ tableChanges across insert, delete, and DV eras") {
    val dir = freshDir("cdf")
    Seq((1L, "a"), (2L, "b")).toDF("k", "v")
      .write.format(fmt).option("path", dir).mode("overwrite").save() // v1
    Seq((3L, "c")).toDF("k", "v")
      .write.format(fmt).option("path", dir).mode("append").save() // v2
    GdxSource.delete(s, dir, col("k") === 1L) // v3: DV delta
    s.sql(s"""CREATE TABLE gdxcc_t (k BIGINT, v STRING)
      USING graft.sources.GdxSource OPTIONS (path '$dir')""")
    try {
      def canon(df: org.apache.spark.sql.DataFrame) =
        df.select("version", "change_type", "k", "v")
          .collect().map(r => (r.getInt(0), r.getString(1), r.getLong(2),
            r.getString(3))).toSeq.sorted
      val sqlRows = canon(s.sql("SHOW CHANGES gdxcc_t FROM 1"))
      assert(sqlRows === canon(GdxSource.tableChanges(s, dir, 1, 3)))
      assert(sqlRows.map(t => (t._1, t._2, t._3)) ===
        Seq((2, "insert", 3L), (3, "delete", 1L)))
      // explicit window + the VERSION keyword form
      assert(canon(s.sql("SHOW CHANGES gdxcc_t FROM VERSION 1 TO VERSION 2"))
        === canon(GdxSource.tableChanges(s, dir, 1, 2)))
      // the statement is a real scan: aggregable, and its physical plan
      // is a distributed RDD scan — not a LocalTableScan of command rows
      val feed = s.sql("SHOW CHANGES gdxcc_t FROM 1")
      assert(feed.queryExecution.executedPlan.toString()
        .contains("Scan ExistingRDD"),
        feed.queryExecution.executedPlan.toString())
      assert(feed.groupBy("change_type").count().collect()
        .map(r => (r.getString(0), r.getLong(1))).toMap
        === Map("insert" -> 1L, "delete" -> 1L))
    } finally s.sql("DROP TABLE IF EXISTS gdxcc_t")
  }

  test("SHOW CHANGES refuses non-GDX tables loudly") {
    s.range(3).createOrReplaceTempView("gdxcc_view")
    val e = intercept[Exception] {
      s.sql("SHOW CHANGES gdxcc_view FROM 1")
    }
    assert(e.getMessage.contains("not a GDX table"), e.getMessage)
  }

  test("SHALLOW CLONE into a GDX catalog: zero data files copied, " +
      "divergence stays clone-local") {
    val dir = freshDir("clsrc")
    Seq((1L, "a"), (2L, "b")).toDF("k", "v")
      .write.format(fmt).option("path", dir).mode("overwrite").save() // v1
    Seq((3L, "c")).toDF("k", "v")
      .write.format(fmt).option("path", dir).mode("append").save() // v2
    val wh = java.nio.file.Files.createTempDirectory("gdxcc_wh").toString
    val c = Sessions.pinned(s,
      "spark.sql.catalog.gdxcs" -> "graft.sources.GdxCatalog",
      "spark.sql.catalog.gdxcs.warehouse" -> wh)
    c.sql("CREATE NAMESPACE gdxcs.lab")
    c.sql(s"""CREATE TABLE gdxcc_src (k BIGINT, v STRING)
      USING graft.sources.GdxSource OPTIONS (path '$dir')""")
    try {
      val res = c.sql(
        "CREATE TABLE gdxcs.lab.fork SHALLOW CLONE gdxcc_src " +
          "VERSION AS OF 1").head
      assert(res.getLong(1) > 0L)
      val cloneDir = res.getString(2)
      assert(cloneDir.contains("lab") && cloneDir.endsWith("fork"))
      // zero bytes copied: the clone dir holds ONLY a manifest
      val files = new java.io.File(cloneDir).listFiles().map(_.getName)
      assert(files.forall(_.contains("manifest")),
        s"clone dir must hold only manifests: ${files.toSeq}")
      // reads the pinned version
      assert(c.sql("SELECT k FROM gdxcs.lab.fork ORDER BY k")
        .collect().map(_.getLong(0)).toSeq === Seq(1L, 2L))
      // divergence: append to the fork; the source never moves
      Sessions.insertInto(c,
        Seq((9L, "z")).toDF("k", "v"), "gdxcs.lab.fork")
      assert(c.sql("SELECT count(*) FROM gdxcs.lab.fork").head.getLong(0)
        === 3L)
      assert(c.sql("SELECT count(*) FROM gdxcc_src").head.getLong(0) === 3L)
      assert(GdxSource.listVersions(dir, GdxSource.driverConf()).max === 2)
      // a second clone into the same slot is refused
      intercept[Exception] {
        c.sql("CREATE TABLE gdxcs.lab.fork SHALLOW CLONE gdxcc_src")
      }
    } finally c.sql("DROP TABLE IF EXISTS gdxcc_src")
  }

  test("SHOW CHANGES on a never-committed table fails loudly, not " +
      "with a raw empty.max") {
    val dir = freshDir("empty")
    s.sql(s"""CREATE TABLE gdxcc_empty (k BIGINT, v STRING)
      USING graft.sources.GdxSource OPTIONS (path '$dir')""")
    try {
      val e = intercept[Exception] {
        s.sql("SHOW CHANGES gdxcc_empty FROM 0").collect()
      }
      assert(e.getMessage.contains("SHOW CHANGES") &&
        e.getMessage.contains("no committed snapshot"), e.getMessage)
    } finally s.sql("DROP TABLE IF EXISTS gdxcc_empty")
  }

  test("a LOCATION containing a quote registers the clone safely " +
      "(no malformed or injectable registration SQL)") {
    val dir = freshDir("clq")
    Seq((1L, "a")).toDF("k", "v")
      .write.format(fmt).option("path", dir).mode("overwrite").save()
    s.sql(s"""CREATE TABLE gdxcc_srcq (k BIGINT, v STRING)
      USING graft.sources.GdxSource OPTIONS (path '$dir')""")
    val loc = java.nio.file.Files.createTempDirectory("gdxcc_q")
      .toString + "/it's a fork"
    try {
      // the command is exercised directly: the quote lives in the
      // RESOLVED location, which is where the old interpolation broke
      graft.plans.GdxCloneCommand(
        Seq("gdxcc_forkq"), Seq("gdxcc_srcq"), None, Some(loc)).run(s)
      assert(s.sql("SELECT v FROM gdxcc_forkq").head.getString(0) === "a")
    } finally {
      s.sql("DROP TABLE IF EXISTS gdxcc_forkq")
      s.sql("DROP TABLE IF EXISTS gdxcc_srcq")
    }
  }

  test("TRUNCATE TABLE publishes an empty commit; history and the " +
      "partition layout survive") {
    val dir = freshDir("trunc")
    (0 until 60).map(i => (i.toLong, s"r$i", (i % 3).toLong))
      .toDF("k", "v", "p").coalesce(2)
      .write.format(fmt).option("path", dir).option("partitionBy", "p")
      .mode("overwrite").save()
    val tbl = "gdxcc_tr_" +
      java.util.UUID.randomUUID().toString.replace("-", "")
    s.sql(s"""CREATE TABLE $tbl (k BIGINT, v STRING, p BIGINT)
      USING graft.sources.GdxSource OPTIONS (path '$dir')""")
    try {
      s.sql(s"TRUNCATE TABLE $tbl")
      assert(s.sql(s"SELECT count(*) FROM $tbl").head.getLong(0) === 0L)
      // nothing deleted: the pre-truncate snapshot still time-travels
      assert(spark.read.format(fmt).option("path", dir)
        .option("version", "1").load().count() === 60L)
      // the layout survives: the next append demuxes into p= dirs
      Seq((100L, "x", 1L)).toDF("k", "v", "p").coalesce(1)
        .write.format(fmt).option("path", dir).mode("append").save()
      assert(GdxSource.committedEntries(dir, GdxSource.driverConf())
        .forall(_.name.startsWith("p=")))
      assert(s.sql(s"SELECT count(*) FROM $tbl").head.getLong(0) === 1L)
    } finally s.sql(s"DROP TABLE IF EXISTS $tbl")
  }

  test("SHALLOW CLONE with LOCATION registers a queryable table; " +
      "ordinary CREATE TABLE still delegates") {
    val dir = freshDir("clloc")
    Seq((1L, "a")).toDF("k", "v")
      .write.format(fmt).option("path", dir).mode("overwrite").save()
    s.sql(s"""CREATE TABLE gdxcc_src2 (k BIGINT, v STRING)
      USING graft.sources.GdxSource OPTIONS (path '$dir')""")
    val loc = freshDir("cldst")
    try {
      s.sql(s"CREATE TABLE gdxcc_fork2 SHALLOW CLONE gdxcc_src2 " +
        s"LOCATION '$loc'")
      assert(s.sql("SELECT v FROM gdxcc_fork2").head.getString(0) === "a")
      // a clone without LOCATION into the session catalog is refused
      val e = intercept[Exception] {
        s.sql("CREATE TABLE gdxcc_fork3 SHALLOW CLONE gdxcc_src2")
      }
      assert(e.getMessage.contains("LOCATION"), e.getMessage)
      // the CREATE TABLE grammar is otherwise untouched
      s.sql("CREATE TABLE gdxcc_plain (x INT) USING parquet " +
        s"LOCATION '${freshDir("plain")}'")
      s.sql("DROP TABLE gdxcc_plain")
    } finally {
      s.sql("DROP TABLE IF EXISTS gdxcc_fork2")
      s.sql("DROP TABLE IF EXISTS gdxcc_src2")
    }
  }
}
