package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.sources.GdxSource

/** Column INITIAL DEFAULTS (the Iceberg initial-default / Spark
  * EXISTS_DEFAULT contract): `ADD COLUMN ... DEFAULT <lit>` is one
  * metadata commit whose default lives in the schema line, so it rides
  * every commit path and is era-correct under time travel; rows in
  * pre-evolution files read the default, an explicit NULL written
  * after stays NULL, and the analyzer fills INSERTs that omit the
  * column through Spark's own CURRENT_DEFAULT machinery. */
class GdxDefaultsSpec extends SparkSuite {
  import spark.implicits._

  private val fmt = "graft.sources.GdxSource"
  private def freshDir(tag: String): String =
    java.nio.file.Files.createTempDirectory(s"gdxdf_$tag").toString + "/t"
  private def conf = GdxSource.driverConf()
  private def read(dir: String) =
    spark.read.format(fmt).option("path", dir).load()

  test("era rows read the default; post-add explicit NULL stays NULL; " +
      "time travel to the pre-add snapshot has no column") {
    val dir = freshDir("era")
    Seq((1L, "a"), (2L, "b")).toDF("k", "v")
      .write.format(fmt).option("path", dir).mode("overwrite").save() // v1
    val v = GdxSource.addColumn(dir, "score", LongType,
      default = Some("7")) // v2
    Seq((3L, "c", java.lang.Long.valueOf(9)),
        (4L, "d", null.asInstanceOf[java.lang.Long]))
      .toDF("k", "v", "score")
      .write.format(fmt).option("path", dir).mode("append").save() // v3
    val back = read(dir).orderBy("k").collect()
    assert(back.map(r => Option(r.get(2)).map(_.toString).orNull).toSeq
      === Seq("7", "7", "9", null))
    // DML substrate + changefeed agree with the scan's era fill
    assert(GdxSource.tableChanges(spark, dir, 0, v)
      .filter(col("change_type") === "insert")
      .select("score").collect().map(_.getLong(0)).toSeq
      === Seq(7L, 7L))
    val pre = spark.read.format(fmt).option("path", dir)
      .option("version", "1").load()
    assert(!pre.columns.contains("score"))
  }

  test("defaults survive the rewrite paths: OPTIMIZE materializes the " +
      "value, a keyed DELETE rewrite keeps untouched era rows filled") {
    val dir = freshDir("rw")
    Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("k", "v")
      .write.format(fmt).option("path", dir).mode("overwrite").save()
    GdxSource.addColumn(dir, "d", DateType, default = Some("19723"))
    GdxSource.delete(spark, dir, col("k") === 2L)
    val after = read(dir).orderBy("k").collect()
    assert(after.map(_.getLong(0)).toSeq === Seq(1L, 3L))
    assert(after.forall(_.getDate(2) ===
      java.sql.Date.valueOf(java.time.LocalDate.ofEpochDay(19723)
        .toString)))
    GdxSource.compact(spark, dir)
    val opt = read(dir).orderBy("k").collect()
    assert(opt.forall(!_.isNullAt(2)))
    // the schema line still carries the default after every commit
    val f = GdxSource.committedSchema(dir, conf).fields.find(_.name == "d")
    assert(f.exists(_.metadata.getString("gdx.default") === "19723"))
  }

  test("catalog SQL: ADD COLUMN ... DEFAULT era-fills, CREATE TABLE " +
      "defaults fill INSERTs that omit the column") {
    val wh = graft.Scratch.tablePath("gdxdf_sql_")
    val cat = "gdx_dflt"
    val s = graft.Sessions.pinned(
      org.apache.spark.sql.graft.ColumnBridge
        .sessionWithExtensions(spark, new GraftExtensions()),
      s"spark.sql.catalog.$cat" -> "graft.sources.GdxCatalog",
      s"spark.sql.catalog.$cat.warehouse" -> wh)
    s.sql(s"CREATE NAMESPACE $cat.lab")
    s.sql(s"CREATE TABLE $cat.lab.t (k BIGINT, v STRING)")
    s.sql(s"INSERT INTO $cat.lab.t VALUES (1, 'a'), (2, 'b')")
    s.sql(s"ALTER TABLE $cat.lab.t ADD COLUMN score BIGINT DEFAULT 42")
    val got = s.table(s"$cat.lab.t").orderBy("k")
      .select("score").collect().map(_.getLong(0)).toSeq
    assert(got === Seq(42L, 42L))
    // CREATE-time default: never era-fills (no pre-evolution files)
    // but the analyzer fills an INSERT omitting the column
    s.sql(s"""CREATE TABLE $cat.lab.t2 (k BIGINT,
      tag STRING DEFAULT 'unset')""")
    s.sql(s"INSERT INTO $cat.lab.t2 (k) VALUES (5)")
    s.sql(s"INSERT INTO $cat.lab.t2 VALUES (6, 'set')")
    assert(s.table(s"$cat.lab.t2").orderBy("k")
      .select("tag").collect().map(_.getString(0)).toSeq
      === Seq("unset", "set"))
  }

  test("a bracket-bearing string default never corrupts the schema " +
      "line: later ADD COLUMNs still parse") {
    val dir = freshDir("brak")
    Seq((1L, "a")).toDF("k", "v")
      .write.format(fmt).option("path", dir).mode("overwrite").save()
    // an UNBALANCED '(' in the default text must not skew the
    // parser's bracket depth for fields appended after it
    GdxSource.addColumn(dir, "c", StringType,
      default = Some("n/a (unknown"))
    GdxSource.addColumn(dir, "score", LongType, default = Some("7"))
    val sch = GdxSource.committedSchema(dir, conf)
    assert(sch.fieldNames.toSeq === Seq("k", "v", "c", "score"))
    assert(sch("c").metadata.getString("gdx.default") === "n/a (unknown")
    val row = read(dir).orderBy("k").collect().head
    assert(row.getString(2) === "n/a (unknown" && row.getLong(3) === 7L)
    // angle brackets and decimals after the default keep parsing too
    GdxSource.addColumn(dir, "tags",
      MapType(StringType, StringType))
    GdxSource.addColumn(dir, "amt", DecimalType(12, 2),
      default = Some("1.50"))
    val sch2 = GdxSource.committedSchema(dir, conf)
    assert(sch2.fieldNames.toSeq ===
      Seq("k", "v", "c", "score", "tags", "amt"))
    assert(read(dir).count() === 1L)
  }

  test("loud refusals: unparseable default cell, ',' in a string " +
      "default, DEFAULT on a map column, DEFAULT NULL via catalog") {
    val dir = freshDir("bad")
    Seq((1L, "a")).toDF("k", "v")
      .write.format(fmt).option("path", dir).mode("overwrite").save()
    intercept[IllegalArgumentException] {
      GdxSource.addColumn(dir, "n", LongType, default = Some("abc"))
    }
    intercept[IllegalArgumentException] {
      GdxSource.addColumn(dir, "s2", StringType, default = Some("a,b"))
    }
    intercept[IllegalArgumentException] {
      GdxSource.addColumn(dir, "m",
        MapType(StringType, StringType), default = Some("x=1"))
    }
  }
}
