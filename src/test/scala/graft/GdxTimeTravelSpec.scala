package graft

import org.apache.spark.sql.functions._

/** SQL time travel for GDX tables (plans/GdxTimeTravel.scala):
  * `VERSION AS OF` / `TIMESTAMP AS OF` resolve to the same pinned
  * snapshots as the `version`/`asOf` read options, non-GDX targets
  * keep Spark's native failure, and a time-travel relation never
  * matches a materialized-view summary. */
class GdxTimeTravelSpec extends SparkSuite {
  import spark.implicits._

  private lazy val s = org.apache.spark.sql.graft.ColumnBridge
    .sessionWithExtensions(spark, new GraftExtensions())

  private val fmt = "graft.sources.GdxSource"

  test("VERSION/TIMESTAMP AS OF pin the same snapshots as the options") {
    val dir = java.nio.file.Files.createTempDirectory("gdxtt_sql")
      .toString + "/t"
    Seq((1L, "a"), (2L, "b")).toDF("k", "v")
      .write.format(fmt).option("path", dir).mode("overwrite").save() // v1
    val t1 = System.currentTimeMillis
    Thread.sleep(60) // manifest mtimes straddle t1 unambiguously
    Seq((3L, "c")).toDF("k", "v")
      .write.format(fmt).option("path", dir).mode("append").save() // v2
    s.sql(s"""CREATE TABLE gdxtt_t (k BIGINT, v STRING)
      USING graft.sources.GdxSource OPTIONS (path '$dir')""")
    try {
      def rows(df: org.apache.spark.sql.DataFrame) =
        df.orderBy("k").collect().map(r => (r.getLong(0), r.getString(1)))
          .toSeq
      // VERSION AS OF ≡ option("version")
      assert(rows(s.sql("SELECT k, v FROM gdxtt_t VERSION AS OF 1")) ===
        Seq((1L, "a"), (2L, "b")))
      assert(rows(s.sql("SELECT k, v FROM gdxtt_t VERSION AS OF 1")) ===
        rows(s.read.format(fmt).option("path", dir)
          .option("version", "1").load()))
      // FOR-prefixed form and qualified references also resolve
      assert(rows(s.sql(
        "SELECT t.k, t.v FROM gdxtt_t FOR VERSION AS OF 2 t")) ===
        Seq((1L, "a"), (2L, "b"), (3L, "c")))
      // TIMESTAMP AS OF a literal between the commits reads v1
      assert(rows(s.sql(
        s"SELECT k, v FROM gdxtt_t TIMESTAMP AS OF $t1")) ===
        Seq((1L, "a"), (2L, "b")))
      // the live read is unaffected
      assert(s.sql("SELECT count(*) FROM gdxtt_t").head.getLong(0) === 3L)
      // a vacuumed-away / future version stays a loud error
      intercept[Exception] {
        s.sql("SELECT k FROM gdxtt_t VERSION AS OF 99").collect()
      }
    } finally s.sql("DROP TABLE IF EXISTS gdxtt_t")
  }

  test("non-GDX time travel keeps Spark's native failure") {
    val dir = java.nio.file.Files.createTempDirectory("gdxtt_pq").toString
    Seq((1L, "a")).toDF("k", "v").write.mode("overwrite").parquet(dir)
    s.sql("DROP TABLE IF EXISTS gdxtt_plain")
    s.sql(s"CREATE TABLE gdxtt_plain (k BIGINT, v STRING) USING parquet " +
      s"LOCATION '$dir'")
    try {
      // Spark's own verdict (UNSUPPORTED_FEATURE.TIME_TRAVEL), not an
      // engine-raised refusal
      val e = intercept[Exception] {
        s.sql("SELECT k FROM gdxtt_plain VERSION AS OF 1").collect()
      }
      assert(e.getMessage.contains("TIME_TRAVEL"), e.getMessage)
      assert(!e.getMessage.contains("is not a GDX table"), e.getMessage)
      // and a missing table errors natively too
      val e2 = intercept[Exception] {
        s.sql("SELECT k FROM gdxtt_missing VERSION AS OF 1").collect()
      }
      assert(e2.getMessage.contains("TABLE_OR_VIEW_NOT_FOUND") ||
        e2.getMessage.contains("cannot be found"), e2.getMessage)
    } finally { s.sql("DROP TABLE IF EXISTS gdxtt_plain"); () }
  }

  test("time travel over a VIEW is refused natively, never silently " +
      "widened to the base table") {
    val dir = java.nio.file.Files.createTempDirectory("gdxtt_view")
      .toString + "/t"
    Seq((1L, "a"), (2L, "b"), (9L, "c")).toDF("k", "v")
      .write.format(fmt).option("path", dir).mode("overwrite").save()
    s.sql(s"""CREATE TABLE gdxtt_vt (k BIGINT, v STRING)
      USING graft.sources.GdxSource OPTIONS (path '$dir')""")
    try {
      // a filtered/projected view over the GDX table: resolving its
      // time travel to a pinned scan of the WHOLE base would silently
      // drop the view's filter and projection — Spark's native
      // "time travel on view" error is the correct outcome
      s.sql("CREATE OR REPLACE TEMP VIEW gdxtt_v AS " +
        "SELECT k FROM gdxtt_vt WHERE k > 5")
      val e = intercept[Exception] {
        s.sql("SELECT * FROM gdxtt_v VERSION AS OF 1").collect()
      }
      assert(e.getMessage.contains("TIME_TRAVEL"), e.getMessage)
      // the direct table still time-travels
      assert(s.sql("SELECT count(*) FROM gdxtt_vt VERSION AS OF 1")
        .head.getLong(0) === 3L)
    } finally {
      s.catalog.dropTempView("gdxtt_v")
      s.sql("DROP TABLE IF EXISTS gdxtt_vt")
      ()
    }
  }

  test("a time-travel relation never rewrites onto an MV summary") {
    val root = java.nio.file.Files.createTempDirectory("gdxtt_mv").toString
    val dir = s"$root/t"
    Seq((1L, "a"), (2L, "b")).toDF("k", "v")
      .write.format(fmt).option("path", dir).mode("overwrite").save() // v1
    Seq((3L, "b")).toDF("k", "v")
      .write.format(fmt).option("path", dir).mode("append").save() // v2
    s.sql(s"""CREATE TABLE gdxtt_mvt (k BIGINT, v STRING)
      USING graft.sources.GdxSource OPTIONS (path '$dir')""")
    try {
      val mvPath = s"$root/mv"
      plans.MvRewrite.materialize(s,
        s.read.format(fmt).option("path", dir).load(),
        Seq("v"), Seq("k"), mvPath)
      // the live aggregate rewrites...
      val live = s.sql(
        "SELECT v, count(*) AS n FROM gdxtt_mvt GROUP BY v")
      assert(live.queryExecution.optimizedPlan.collectLeaves()
        .flatMap(plans.MvRewrite.relationIdentity)
        .forall(_.contains(mvPath)),
        s"live aggregate must use the MV; plan=" +
          s"${live.queryExecution.optimizedPlan.treeString} analyzed=" +
          s"${live.queryExecution.analyzed.treeString}")
      // ...the SQL time-travel aggregate must NOT (historical ≠ current)
      val hist = s.sql(
        "SELECT v, count(*) AS n FROM gdxtt_mvt VERSION AS OF 1 GROUP BY v")
      assert(!hist.queryExecution.optimizedPlan.collectLeaves()
        .flatMap(plans.MvRewrite.relationIdentity)
        .exists(_.contains(mvPath)),
        s"time travel rewrote onto the summary: " +
          s"${hist.queryExecution.optimizedPlan}")
      assert(hist.orderBy("v").collect().map(_.toSeq) ===
        Array(Seq("a", 1L), Seq("b", 1L)))
    } finally {
      s.sql("DROP TABLE IF EXISTS gdxtt_mvt")
      plans.MvRewrite.clear()
    }
  }
}
