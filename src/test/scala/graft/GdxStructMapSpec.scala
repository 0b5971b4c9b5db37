package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.sources.GdxSource

/** STRUCT-VALUED MAPS (`scores: map<string,struct<v,n>>`) — the
  * named-annotation shape: entries encode as key-sorted
  * `key=(sub,sub)` text (the value's parens make entry boundaries
  * depth-trackable), values follow the positional struct codec
  * including trailing-field evolution and era-correct drop, and the
  * refusal vocabulary carries over (no NULL keys/values, key
  * vocabulary, value leaf vocabulary). */
class GdxStructMapSpec extends SparkSuite {
  import spark.implicits._

  private val fmt = "graft.sources.GdxSource"
  private def freshDir(tag: String): String =
    java.nio.file.Files.createTempDirectory(s"gdxsm_$tag").toString + "/t"
  private def read(dir: String) =
    spark.read.format(fmt).option("path", dir).load()

  private val score = StructType(Seq(
    StructField("v", DoubleType), StructField("n", LongType)))
  private val schema = StructType(Seq(
    StructField("k", LongType),
    StructField("scores", MapType(StringType, score))))

  import org.apache.spark.sql.Row

  private def df(rows: Seq[Row]) =
    spark.createDataFrame(spark.sparkContext.parallelize(rows, 1), schema)

  test("struct-valued maps round-trip: multi-entry, empty map, NULL " +
      "cell, null value leaves; cells are key-sorted canonical text") {
    val dir = freshDir("rt")
    df(Seq(
      Row(1L, Map("tox" -> Row(0.1, 5L), "edu" -> Row(0.9, 3L))),
      Row(2L, Map.empty[String, Row]),
      Row(3L, null),
      Row(4L, Map("q" -> Row(null, 7L)))))
      .write.format(fmt).option("path", dir).mode("overwrite").save()
    val back = read(dir).orderBy("k").collect()
    val m1 = back(0).getMap[String, Row](1)
    assert(m1("tox") === Row(0.1, 5L) && m1("edu") === Row(0.9, 3L))
    assert(back(1).getMap[String, Row](1).isEmpty)
    assert(back(2).isNullAt(1))
    assert(back(3).getMap[String, Row](1)("q").isNullAt(0))
    val lines = new java.io.File(dir).listFiles().toSeq
      .filter(_.getName.endsWith(".gdx"))
      .flatMap(f => scala.io.Source.fromFile(f).getLines().toList)
    def cell(k: String) =
      lines.find(_.startsWith(k + "\t")).get.split("\t", -1)(1)
    assert(cell("1") === "edu=(0.9,3),tox=(0.1,5)") // key-sorted
    assert(cell("2") === "")
    assert(cell("3") === "\\N")
    assert(cell("4") === "q=(\\N,7)")
    assert(GdxSource.schemaSpec(
      GdxSource.committedSchema(dir, GdxSource.driverConf())) ===
      "k:long,scores:map<string,struct<v:double,n:long>>")
  }

  test("map_values/explode reads aggregate; evolution adds and drops " +
      "a trailing value leaf era-correctly") {
    val dir = freshDir("evo")
    df((1L to 20L).map(i => Row(i, Map(
      "tox" -> Row(i / 100.0, i),
      "edu" -> Row(i / 10.0, i * 2)))))
      .write.format(fmt).option("path", dir).mode("overwrite").save()
    val agg = read(dir)
      .select(explode(col("scores")).as(Seq("name", "s")))
      .groupBy("name").agg(sum(col("s.n")).as("n"))
      .orderBy("name").collect()
    assert(agg.map(r => (r.getString(0), r.getLong(1))).toSeq ===
      Seq(("edu", 420L), ("tox", 210L)))
    // trailing evolution inside the VALUE struct
    GdxSource.addNestedField(dir, "scores", "src", StringType)
    val score2 = StructType(score.fields :+ StructField("src", StringType))
    spark.createDataFrame(spark.sparkContext.parallelize(Seq(
      Row(99L, Map("tox" -> Row(0.5, 1L, "model")))), 1),
      StructType(Seq(StructField("k", LongType),
        StructField("scores", MapType(StringType, score2)))))
      .write.format(fmt).option("path", dir).mode("append").save()
    val got = read(dir).select(col("k"),
      col("scores.tox.src").as("src")).orderBy("k").collect()
    assert(got.init.forall(_.isNullAt(1)), "era values read NULL src")
    assert(got.last.getString(1) === "model")
    // era-correct DROP through the value struct
    val preDrop = GdxSource.listVersions(dir,
      GdxSource.driverConf()).max
    GdxSource.dropNestedField(spark, dir, "scores.src")
    assert(read(dir).schema("scores").dataType.asInstanceOf[MapType]
      .valueType.asInstanceOf[StructType].fieldNames.toSeq ===
      Seq("v", "n"))
    assert(read(dir).count() === 21L)
    assert(spark.read.format(fmt).option("path", dir)
      .option("version", preDrop.toString).load()
      .filter(col("scores.tox.src") === "model").count() === 1L)
  }

  test("string-valued maps keep their paren-tolerant vocabulary: " +
      "unbalanced parens in values round-trip (the depth splitter is " +
      "struct-valued only)") {
    val dir = freshDir("parens")
    spark.createDataFrame(spark.sparkContext.parallelize(Seq(
      Row(1L, Map("a" -> "x(y", "b" -> "z)w", "c" -> "plain"))), 1),
      StructType(Seq(StructField("k", LongType),
        StructField("m", MapType(StringType, StringType)))))
      .write.format(fmt).option("path", dir).mode("overwrite").save()
    val m = read(dir).head.getMap[String, String](1)
    assert(m("a") === "x(y" && m("b") === "z)w" && m("c") === "plain")
    // a paren-bearing KEY in a STRUCT-valued map escape-encodes (the
    // depth splitter never sees a raw paren) and round-trips
    df(Seq(Row(1L, Map("a(b" -> Row(0.1, 1L)))))
      .write.format(fmt).option("path", dir).mode("overwrite").save()
    assert(read(dir).head.getMap[String, Row](1).keys.toSeq ===
      Seq("a(b"))
  }

  test("NULL values stay refused; structural characters in keys and " +
      "value leaves round-trip under the escape era") {
    val dir = freshDir("refuse")
    intercept[Exception] {
      df(Seq(Row(1L, Map("a" -> null))))
        .write.format(fmt).option("path", dir)
        .mode("overwrite").save()
    }
    // keys carrying ','/'=' and leaves carrying commas escape-encode
    df(Seq(Row(1L, Map("a,b" -> Row(0.1, 1L), "a=b" -> Row(0.2, 2L)))))
      .write.format(fmt).option("path", dir).mode("overwrite").save()
    assert(read(dir).head.getMap[String, Row](1).keys.toSet ===
      Set("a,b", "a=b"))
    val sv = StructType(Seq(StructField("s", StringType)))
    spark.createDataFrame(spark.sparkContext.parallelize(Seq(
      Row(1L, Map("a" -> Row("x,y")))), 1),
      StructType(Seq(StructField("k", LongType),
        StructField("m", MapType(StringType, sv)))))
      .write.format(fmt).option("path", dir).mode("overwrite").save()
    assert(read(dir).head.getMap[String, Row](1)
      .apply("a").getString(0) === "x,y")
  }
}
