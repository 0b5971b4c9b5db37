package graft

import org.apache.spark.sql.functions._
import graft.sources.{GdxConstraintViolationException, GdxSource}

/** CHECK constraints on the GDX format: validated against existing
  * rows at ADD time, enforced row-level on every future batch and
  * streaming write, carried by every manifest like the schema, and
  * era-correct under RESTORE. A violating write job must abort with
  * NOTHING committed. */
class GdxConstraintSpec extends SparkSuite {
  import spark.implicits._

  private val fmt = "graft.sources.GdxSource"

  private def freshDir(tag: String): String =
    java.nio.file.Files.createTempDirectory(s"gdxck_$tag").toString

  private def read(dir: String) =
    spark.read.format(fmt).option("path", dir).load()

  private def write(dir: String, rows: Seq[(Long, String)]): Unit =
    rows.toDF("k", "v").coalesce(1)
      .write.format(fmt).option("path", dir).mode("append").save()

  test("writes enforce the constraint; violations commit nothing") {
    val dir = freshDir("enf")
    write(dir, Seq((1L, "a"), (2L, "b")))
    GdxSource.addConstraint(spark, dir, "k_pos", "k > 0")
    GdxSource.addConstraint(spark, dir, "v_short", "length(v) <= 3")
    // a conforming append passes (int literal coerces against BIGINT k)
    write(dir, Seq((3L, "ccc")))
    assert(read(dir).count() === 3L)
    val vBefore = GdxSource.listVersions(dir, GdxSource.driverConf()).max
    // a violating append fails the job...
    val e = intercept[Exception] { write(dir, Seq((-7L, "x"))) }
    assert(Iterator.iterate(e: Throwable)(_.getCause).takeWhile(_ != null)
      .take(8).exists(_.isInstanceOf[GdxConstraintViolationException]),
      s"expected a constraint violation, got $e")
    // ...and commits NOTHING: same version, same rows
    assert(GdxSource.listVersions(dir, GdxSource.driverConf()).max
      === vBefore)
    assert(read(dir).count() === 3L)
    // NULL passes (SQL CHECK semantics) — v_short over null v
    write(dir, Seq((4L, null)))
    assert(read(dir).count() === 4L)
  }

  test("ADD CONSTRAINT validates existing rows and refuses violators") {
    val dir = freshDir("val")
    write(dir, Seq((1L, "a"), (200L, "b")))
    val ex = intercept[GdxConstraintViolationException] {
      GdxSource.addConstraint(spark, dir, "k_small", "k < 100")
    }
    assert(ex.getMessage.contains("1 existing row"))
    // the refused constraint left no metadata behind
    assert(GdxSource.committedConstraints(dir,
      GdxSource.driverConf()).isEmpty)
    // an unresolvable expression fails at ADD, not at first write
    intercept[Exception] {
      GdxSource.addConstraint(spark, dir, "bad", "no_such_col > 0")
    }
  }

  test("constraints ride manifests: carried, dropped, era-correct " +
      "under RESTORE, enforced on streaming epochs") {
    val dir = freshDir("life")
    write(dir, Seq((1L, "a")))
    val vAdd = GdxSource.addConstraint(spark, dir, "k_pos", "k > 0")
    write(dir, Seq((2L, "b")))                       // append carries it
    GdxSource.compact(spark, dir, target = 1)        // truncate carries it
    assert(GdxSource.committedConstraints(dir, GdxSource.driverConf())
      === Seq("k_pos" -> "k > 0"))
    GdxSource.dropConstraint(dir, "k_pos")
    assert(GdxSource.committedConstraints(dir,
      GdxSource.driverConf()).isEmpty)
    write(dir, Seq((-5L, "ok-now")))                 // no longer enforced
    assert(read(dir).count() === 3L)
    // RESTORE to the constrained era resurrects the constraint
    GdxSource.restoreSnapshot(dir, vAdd)
    assert(GdxSource.committedConstraints(dir, GdxSource.driverConf())
      === Seq("k_pos" -> "k > 0"))
    intercept[Exception] { write(dir, Seq((-6L, "x"))) }
    // streaming epochs enforce too: a violating micro-batch aborts
    val srcDir = freshDir("src")
    Seq((10L, "s"), (-1L, "bad")).toDF("k", "v").coalesce(1)
      .write.format(fmt).option("path", srcDir).mode("overwrite").save()
    val q = spark.readStream.format(fmt).option("path", srcDir).load()
      .writeStream.format(fmt).option("path", dir)
      .option("checkpointLocation", freshDir("ckpt"))
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    val se = intercept[Exception] { q.awaitTermination() }
    assert(Iterator.iterate(se: Throwable)(_.getCause).takeWhile(_ != null)
      .take(12).exists(_.isInstanceOf[GdxConstraintViolationException]))
  }

  test("UPDATE's rewrite path enforces constraints too") {
    val dir = freshDir("upd")
    write(dir, Seq((1L, "a"), (2L, "b")))
    GdxSource.addConstraint(spark, dir, "v_short", "length(v) <= 3")
    val vBefore = GdxSource.listVersions(dir, GdxSource.driverConf()).max
    val e = intercept[GdxConstraintViolationException] {
      GdxSource.update(spark, dir, col("k") === 1L,
        Map("v" -> lit("waytoolong")))
    }
    assert(e.getMessage.contains("v_short"))
    // nothing committed: version and content untouched
    assert(GdxSource.listVersions(dir, GdxSource.driverConf()).max
      === vBefore)
    assert(read(dir).filter(col("k") === 1L).select("v")
      .as[String].head() === "a")
    // a conforming update still lands
    GdxSource.update(spark, dir, col("k") === 1L, Map("v" -> lit("ok")))
    assert(read(dir).filter(col("k") === 1L).select("v")
      .as[String].head() === "ok")
  }

  test("constraints on evolved columns: absent column reads as NULL " +
      "for classic-prefix appends") {
    val dir = freshDir("evo")
    write(dir, Seq((10L, "a"), (20L, "b")))
    GdxSource.addColumn(dir, "w", org.apache.spark.sql.types.DoubleType)
    // mixed constraint: the w half is NULL for every existing row, the
    // k half holds — validation passes
    GdxSource.addConstraint(spark, dir, "mixed", "w > 0 AND k > 5")
    // a classic (k, v) append substitutes NULL for w: k=9 gives
    // (NULL AND true) = NULL -> passes; k=3 gives (NULL AND false) =
    // FALSE -> violation
    write(dir, Seq((9L, "ok")))
    assert(read(dir).count() === 3L)
    intercept[Exception] { write(dir, Seq((3L, "no"))) }
    assert(read(dir).count() === 3L)
    // an evolved 3-col write enforces the w half directly
    intercept[Exception] {
      Seq((30L, "x", -1.0)).toDF("k", "v", "w").coalesce(1)
        .write.format(fmt).option("path", dir).mode("append").save()
    }
    Seq((30L, "x", 2.5)).toDF("k", "v", "w").coalesce(1)
      .write.format(fmt).option("path", dir).mode("append").save()
    assert(read(dir).count() === 4L)
  }

  test("a constraint added while a write is in flight conflicts the " +
      "commit instead of publishing unvalidated rows") {
    val dir = freshDir("race")
    write(dir, Seq((1L, "a")))
    // writer A: factory created BEFORE the constraint exists — its
    // tasks enforce nothing, and its row (k=5) would violate k < 3
    val bw = new graft.sources.GdxBatchWrite(dir, replace = false)
    val w = bw.createBatchWriterFactory(null).createWriter(0, 0L)
    w.write(org.apache.spark.sql.catalyst.InternalRow(5L,
      org.apache.spark.unsafe.types.UTF8String.fromString("z")))
    val msg = w.commit()
    // the constraint lands mid-flight: existing rows (k=1) validate,
    // A's uncommitted row is invisible to the validation scan
    GdxSource.addConstraint(spark, dir, "k_small", "k < 3")
    val vBefore = GdxSource.listVersions(dir, GdxSource.driverConf()).max
    val e = intercept[graft.sources.GdxConcurrentModificationException] {
      bw.commit(Array(msg))
    }
    assert(e.getMessage.contains("k_small"))
    // nothing committed: same version, the unvalidated row never lands
    assert(GdxSource.listVersions(dir, GdxSource.driverConf()).max
      === vBefore)
    assert(read(dir).count() === 1L)
  }

  test("vacuum never deletes an in-flight write's tmp bloom sidecar") {
    val dir = freshDir("vactmp")
    write(dir, Seq((1L, "a")))
    write(dir, Seq((2L, "b")))
    val fs = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(GdxSource.driverConf())
    def p(n: String) = new org.apache.hadoop.fs.Path(dir, n)
    // an in-flight write: tmp data file + its bloom sidecar — the
    // driver commit hasn't renamed them yet
    val sfx = graft.sources.GdxBloom.Suffix
    fs.create(p("part-0-deadbeef.gdx.tmp"), false).close()
    fs.create(p("part-0-deadbeef.gdx.tmp" + sfx), false).close()
    // ...and a stray sidecar for an unreferenced COMMITTED-shape file,
    // which retention must still reap
    fs.create(p("v00000099-part-9-dead.gdx" + sfx), false).close()
    GdxSource.vacuum(dir, GdxSource.driverConf(), keepLast = 1)
    assert(fs.exists(p("part-0-deadbeef.gdx.tmp")),
      "tmp data file must survive vacuum")
    assert(fs.exists(p("part-0-deadbeef.gdx.tmp" + sfx)),
      "tmp bloom sidecar must survive vacuum like its data file")
    assert(!fs.exists(p("v00000099-part-9-dead.gdx" + sfx)),
      "an unreferenced committed-shape sidecar is still reaped")
  }

  test("a multi-line expression is rejected (one-line manifest header)") {
    val dir = freshDir("ml")
    write(dir, Seq((1L, "a")))
    intercept[IllegalArgumentException] {
      GdxSource.addConstraint(spark, dir, "bad", "k > 0\n AND k < 10")
    }
    assert(GdxSource.committedConstraints(dir,
      GdxSource.driverConf()).isEmpty)
  }

  test("ALTER CONSTRAINT on a non-GDX table reaches Spark's own DDL") {
    // Spark 4.1 ships native ANSI constraint DDL (AddConstraint /
    // DropConstraint v2 commands) — the wrapper parser intercepts the
    // statement shape, so a non-GDX target must be re-dispatched to
    // Spark's grammar at run time, NOT refused with the engine's
    // "not a GDX table" error (that would break constraint DDL for
    // every other provider in the session)
    val s = org.apache.spark.sql.graft.ColumnBridge
      .sessionWithExtensions(spark, new GraftExtensions())
    s.sql("DROP TABLE IF EXISTS gdxck_plain")
    s.sql("CREATE TABLE gdxck_plain (k BIGINT) USING parquet")
    try {
      val e = intercept[Exception] {
        s.sql("ALTER TABLE gdxck_plain ADD CONSTRAINT k_pos CHECK (k > 0)")
          .collect()
      }
      // Spark's own verdict on a v1 parquet table — whatever it is, it
      // must be SPARK's, not the engine's refusal
      assert(!e.getMessage.contains("is not a GDX table"), e.getMessage)
      val e2 = intercept[Exception] {
        s.sql("ALTER TABLE gdxck_plain DROP CONSTRAINT k_pos").collect()
      }
      assert(!e2.getMessage.contains("is not a GDX table"), e2.getMessage)
    } finally { s.sql("DROP TABLE IF EXISTS gdxck_plain"); () }
  }

  test("ALTER TABLE ADD/DROP CONSTRAINT drive through SQL") {
    val s = org.apache.spark.sql.graft.ColumnBridge
      .sessionWithExtensions(spark, new GraftExtensions())
    val dir = freshDir("sql") + "/t"
    s.sql(s"""CREATE TABLE gdxck_t (k BIGINT, v STRING)
      USING graft.sources.GdxSource OPTIONS (path '$dir')""")
    try {
      s.sql("INSERT INTO gdxck_t VALUES (1, 'a'), (2, 'b')")
      val v = s.sql(
        "ALTER TABLE gdxck_t ADD CONSTRAINT k_pos CHECK (k > 0)")
        .head.getLong(0)
      assert(v >= 2L)
      intercept[Exception] {
        s.sql("INSERT INTO gdxck_t VALUES (-1, 'x')")
      }
      assert(s.sql("SELECT count(*) FROM gdxck_t").head.getLong(0) === 2L)
      s.sql("ALTER TABLE gdxck_t DROP CONSTRAINT k_pos")
      s.sql("INSERT INTO gdxck_t VALUES (-1, 'x')")
      assert(s.sql("SELECT count(*) FROM gdxck_t").head.getLong(0) === 3L)
      // other ALTER TABLE forms still reach Spark's grammar and run
      s.sql("ALTER TABLE gdxck_t SET TBLPROPERTIES ('a'='b')")
      // a newline between keywords still parses (keyword-token fast
      // path, not a fixed-width prefix)
      s.sql("ALTER\nTABLE gdxck_t ADD CONSTRAINT ws_ok CHECK (k > -100)")
      s.sql("ALTER TABLE gdxck_t DROP CONSTRAINT ws_ok")
      // a multi-line CHECK containing a string literal is refused —
      // collapsing the break would rewrite the literal's bytes
      val mlEx = intercept[Exception] {
        s.sql("ALTER TABLE gdxck_t ADD CONSTRAINT ml CHECK (v <> 'a\nb')")
      }
      assert(mlEx.getMessage.contains("one line"), mlEx.getMessage)
      ()
    } finally {
      s.sql("DROP TABLE IF EXISTS gdxck_t"); ()
    }
  }
}
