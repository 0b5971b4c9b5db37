package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.sources.GdxSource

/** MAP<STRING,STRING> columns: canonical key-sorted `k=v,k=v` cell
  * encoding (equal maps are equal bytes), ""-means-empty-map, NULL
  * cells via the marker, loud refusals for the vocabulary the decoder
  * cannot invert, the DML substrate over map cells, and schema
  * evolution era reads. */
class GdxMapColumnSpec extends SparkSuite {
  import spark.implicits._

  private val fmt = "graft.sources.GdxSource"
  private def freshDir(tag: String): String =
    java.nio.file.Files.createTempDirectory(s"gdxmp_$tag").toString + "/t"
  private def read(dir: String) =
    spark.read.format(fmt).option("path", dir).load()

  test("maps round-trip: null cell, empty map, canonical key order " +
      "regardless of construction order, '=' allowed in values") {
    val dir = freshDir("rt")
    val rows = Seq(
      (1L, Map("b" -> "2", "a" -> "x=y")), // non-sorted, '=' in value
      (2L, Map.empty[String, String]),
      (3L, null.asInstanceOf[Map[String, String]]))
      .toDF("k", "meta")
    rows.write.format(fmt).option("path", dir).mode("overwrite").save()
    val back = read(dir)
    assert(back.schema("meta").dataType ===
      MapType(StringType, StringType))
    assert(back.filter(col("k") === 1)
      .select(element_at(col("meta"), "a")).head.getString(0) === "x=y")
    assert(back.filter(col("k") === 2)
      .select(size(col("meta"))).head.getInt(0) === 0)
    assert(back.filter(col("k") === 3).select(col("meta").isNull)
      .head.getBoolean(0))
    // canonical bytes: the same map written in two entry orders lands
    // identically (file cells are key-sorted)
    val dir2 = freshDir("rt2")
    Seq((1L, Map("a" -> "x=y", "b" -> "2")))
      .toDF("k", "meta")
      .write.format(fmt).option("path", dir2).mode("overwrite").save()
    def cellText(d: String): String =
      new java.io.File(d).listFiles().toSeq
        .filter(_.getName.endsWith(".gdx"))
        .flatMap(f => scala.io.Source.fromFile(f).getLines().toList)
        .find(_.startsWith("1\t")).get
    assert(cellText(dir).split('\t')(1) === cellText(dir2).split('\t')(1))
    // escape-era canonical bytes: the value's '=' is escape-encoded so
    // the entry separator stays the only raw '='
    assert(cellText(dir).split('\t')(1) === "a=x\\ey,b=2")
  }

  test("escape era: ','/'='/parens in keys and values round-trip; " +
      "NULL keys or values still refuse loudly") {
    val dir = freshDir("bad")
    // the old vocabulary refusals are gone — structural characters in
    // keys/values escape-encode and round-trip exactly
    val m = Map("a,b" -> "1", "a=b" -> "2", "p(q)" -> "x,y=z")
    Seq((1L, m)).toDF("k", "meta").coalesce(1)
      .write.format(fmt).option("path", dir).mode("overwrite").save()
    assert(read(dir).select(col("meta")).head
      .getMap[String, String](0).toMap === m)
    // NULL entries keep refusing (the k=v encoding has no entry-null)
    intercept[Exception] {
      Seq((1L, Map("a" -> null))).toDF("k", "meta").coalesce(1)
        .write.format(fmt).option("path", dir)
        .mode("overwrite").save()
    }
  }

  test("DML over map cells: UPDATE map_concat adds an entry, DELETE " +
      "filters on element_at; the changefeed carries map rows") {
    val dir = freshDir("dml")
    Seq((1L, Map("lang" -> "en")), (2L, Map("lang" -> "de")),
      (3L, Map("lang" -> "en")))
      .toDF("k", "meta")
      .write.format(fmt).option("path", dir).mode("overwrite").save()
    val s = org.apache.spark.sql.graft.ColumnBridge
      .sessionWithExtensions(spark, new GraftExtensions())
    val tbl = "gdxmp_t_" +
      java.util.UUID.randomUUID().toString.replace("-", "").take(8)
    s.sql(s"""CREATE TABLE $tbl (k BIGINT, meta MAP<STRING,STRING>)
      USING $fmt OPTIONS (path '$dir')""")
    try {
      s.sql(s"""UPDATE $tbl SET meta = map_concat(meta,
        map('flag', 'y')) WHERE k = 1""")
      s.sql(s"DELETE FROM $tbl WHERE element_at(meta, 'lang') = 'de'")
      val back = read(dir).orderBy("k").collect()
      assert(back.map(_.getLong(0)).toSeq === Seq(1L, 3L))
      assert(back.head.getMap[String, String](1).toMap ===
        Map("lang" -> "en", "flag" -> "y"))
      val changes = GdxSource.tableChanges(spark, dir, 1, 2)
        .filter(col("change_type") === "insert").collect()
      assert(changes.length === 1)
    } finally s.sql(s"DROP TABLE IF EXISTS $tbl")
  }

  test("schema evolution: ADD COLUMN meta MAP<STRING,STRING> is one " +
      "metadata commit; era rows read NULL maps") {
    val dir = freshDir("evo")
    Seq((1L, "a")).toDF("k", "v")
      .write.format(fmt).option("path", dir).mode("overwrite").save()
    GdxSource.addColumn(dir, "meta", MapType(StringType, StringType))
    Seq((2L, "b", Map("x" -> "1"))).toDF("k", "v", "meta")
      .write.format(fmt).option("path", dir).mode("append").save()
    val back = read(dir).orderBy("k").collect()
    assert(back(0).isNullAt(2))
    assert(back(1).getMap[String, String](2).toMap === Map("x" -> "1"))
  }
}
