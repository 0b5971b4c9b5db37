package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.sources.GdxSource

/** ARRAY<STRUCT<...>> columns — the conversation/SFT-record shape
  * (`messages: array<struct<role,content>>`): recursive type names in
  * the schema line, comma-joined parenthesized element cells (empty
  * array = "", NULL cell via the marker, `\N` element sub-nulls),
  * nested element pruning through the DSv2 reader, explode-based
  * reads, DML keyed on element predicates (`exists(messages, ...)`),
  * trailing ELEMENT-field evolution with per-element era null-fill,
  * time travel preserving the pre-evolution shape, and loud refusals
  * for the vocabulary the positional encoding cannot invert. */
class GdxArrayStructSpec extends SparkSuite {
  import spark.implicits._

  private val fmt = "graft.sources.GdxSource"
  private def freshDir(tag: String): String =
    java.nio.file.Files.createTempDirectory(s"gdxas_$tag").toString + "/t"
  private def read(dir: String) =
    spark.read.format(fmt).option("path", dir).load()

  private val turn = StructType(Seq(
    StructField("role", StringType),
    StructField("content", StringType)))
  private val schema = StructType(Seq(
    StructField("k", LongType),
    StructField("v", StringType),
    StructField("messages", ArrayType(turn))))

  import org.apache.spark.sql.Row

  private def df(rows: Seq[Row]) =
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 1), schema)

  test("array<struct> round-trips: turns, the empty array, a NULL " +
      "cell, NULL element leaves; cells are canonical element text") {
    val dir = freshDir("rt")
    df(Seq(
      Row(1L, "a", Seq(Row("user", "hi"), Row("assistant", "yo"))),
      Row(2L, "b", Seq.empty[Row]),
      Row(3L, "c", null),
      Row(4L, "d", Seq(Row("tool", null)))))
      .write.format(fmt).option("path", dir).mode("overwrite").save()
    val back = read(dir).orderBy("k").collect()
    val m1 = back(0).getSeq[Row](2)
    assert(m1.map(r => (r.getString(0), r.getString(1))) ===
      Seq(("user", "hi"), ("assistant", "yo")))
    assert(back(1).getSeq[Row](2).isEmpty)
    assert(back(2).isNullAt(2))
    assert(back(3).getSeq[Row](2).head.isNullAt(1))
    // the raw cells are the canonical comma-joined parenthesized form
    val lines = new java.io.File(dir).listFiles().toSeq
      .filter(_.getName.endsWith(".gdx"))
      .flatMap(f => scala.io.Source.fromFile(f).getLines().toList)
    def cell(k: String) = // keep the trailing empty cell (empty array)
      lines.find(_.startsWith(k + "\t")).get.split("\t", -1)(2)
    assert(cell("1") === "(user,hi),(assistant,yo)")
    assert(cell("2") === "")
    assert(cell("3") === "\\N")
    assert(cell("4") === "(tool,\\N)")
    // the schema line carries the recursive type name
    assert(GdxSource.schemaSpec(
      GdxSource.committedSchema(dir, GdxSource.driverConf())) ===
      "k:long,v:string,messages:array<struct<role:string,content:string>>")
  }

  test("typed element leaves (long/double/nested struct) round-trip; " +
      "explode-based reads aggregate correctly") {
    val dir = freshDir("typed")
    val span = StructType(Seq(StructField("s", LongType),
      StructField("e", LongType)))
    val ann = StructType(Seq(StructField("label", StringType),
      StructField("conf", DoubleType), StructField("at", span)))
    val sch = StructType(Seq(StructField("k", LongType),
      StructField("anns", ArrayType(ann))))
    spark.createDataFrame(spark.sparkContext.parallelize(
      (1L to 20L).map(i => Row(i, Seq(
        Row("per", i / 10.0, Row(i, i + 3L)),
        Row("loc", 0.5, Row(i * 2, i * 2 + 1L))))), 1), sch)
      .write.format(fmt).option("path", dir).mode("overwrite").save()
    val agg = read(dir)
      .select(explode(col("anns")).as("a"))
      .groupBy(col("a.label"))
      .agg(count(lit(1)).as("n"), sum(col("a.at.e") - col("a.at.s")).as("w"))
      .orderBy("label").collect()
    assert(agg.map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
      .toSeq === Seq(("loc", 20L, 20L), ("per", 20L, 60L)))
  }

  test("nested element pruning: a role-only read narrows the element " +
      "struct in the scan and values survive the projection") {
    val dir = freshDir("prune")
    df((1L to 30L).map(i => Row(i, s"v$i",
      Seq(Row(s"role$i", s"content$i"), Row("x", "y")))))
      .write.format(fmt).option("path", dir).mode("overwrite").save()
    val q = read(dir).select(col("k"), col("messages.role").as("roles"))
    assert(q.orderBy("k").collect().map(_.getSeq[String](1).head)
      .toSeq === (1L to 30L).map(i => s"role$i"))
    val readSchemas = q.queryExecution.executedPlan.collect {
      case b: org.apache.spark.sql.execution.datasources.v2
          .BatchScanExec => b.scan.readSchema()
    }
    assert(readSchemas.nonEmpty)
    readSchemas.head.find(_.name == "messages").map(_.dataType) match {
      case Some(ArrayType(el: StructType, _)) =>
        assert(el.fieldNames.toSeq === Seq("role"),
          s"expected the element struct narrowed to role: $el")
      case other => fail(s"messages not read as array<struct>: $other")
    }
  }

  test("DML keyed on an element predicate: exists() DELETE, and the " +
      "changefeed carries array<struct> cells") {
    val dir = freshDir("dml")
    df((1L to 20L).map(i => Row(i, s"v$i", Seq(
      Row("user", s"q$i"),
      Row(if (i % 4 == 0) "tool" else "assistant", s"a$i")))))
      .write.format(fmt).option("path", dir).mode("overwrite").save()
    val (_, n) = GdxSource.delete(spark, dir,
      expr("exists(messages, m -> m.role = 'tool')"))
    assert(n === 5L)
    assert(read(dir).count() === 15L)
    assert(read(dir).filter(
      expr("exists(messages, m -> m.role = 'tool')")).count() === 0L)
    // time travel still serves the pre-delete corpus
    assert(spark.read.format(fmt).option("path", dir)
      .option("version", "1").load().count() === 20L)
    // the changefeed surfaces the deletes with decodable cells
    val feed = GdxSource.tableChanges(spark, dir, 1, 2)
    assert(feed.filter(col("change_type") === "delete").count() === 5L)
    assert(feed.filter(col("change_type") === "delete")
      .select(explode(col("messages")).as("m"))
      .filter(col("m.role") === "tool").count() === 5L)
  }

  test("trailing ELEMENT-field evolution: ADD inside the element " +
      "struct null-fills old elements per element; time travel keeps " +
      "the old shape; rename is metadata-only") {
    val dir = freshDir("evo")
    df(Seq(Row(1L, "a", Seq(Row("user", "hi"))))).coalesce(1)
      .write.format(fmt).option("path", dir).mode("overwrite").save()
    GdxSource.addNestedField(dir, "messages", "ts", LongType)
    // new writes carry the leaf; old elements read NULL for it
    val turn2 = StructType(turn.fields :+ StructField("ts", LongType))
    spark.createDataFrame(spark.sparkContext.parallelize(Seq(
      Row(2L, "b", Seq(Row("assistant", "yo", 42L)))), 1),
      StructType(Seq(StructField("k", LongType),
        StructField("v", StringType),
        StructField("messages", ArrayType(turn2)))))
      .write.format(fmt).option("path", dir).mode("append").save()
    val got = read(dir).select(col("k"),
      explode(col("messages")).as("m")).orderBy("k").collect()
    assert(got(0).getStruct(1).isNullAt(2), "era element must read NULL ts")
    assert(got(1).getStruct(1).getLong(2) === 42L)
    // time travel to the pre-evolution snapshot sees the OLD shape
    val old = spark.read.format(fmt).option("path", dir)
      .option("version", "1").load()
    assert(old.schema("messages").dataType.asInstanceOf[ArrayType]
      .elementType.asInstanceOf[StructType].fieldNames.toSeq ===
      Seq("role", "content"))
    // rename inside the element struct: cells never move
    GdxSource.renameNestedField(dir, "messages.content", "text")
    assert(read(dir).select(explode(col("messages")).as("m"))
      .filter(col("m.text").isNotNull).count() === 2L)
    // DROP inside the element struct: era-correct rewrite — the live
    // elements lose ts, the pre-drop snapshot still reads it
    val preDrop = GdxSource.listVersions(dir,
      GdxSource.driverConf()).max
    GdxSource.dropNestedField(spark, dir, "messages.ts")
    val el = read(dir).schema("messages").dataType
      .asInstanceOf[ArrayType].elementType.asInstanceOf[StructType]
    assert(el.fieldNames.toSeq === Seq("role", "text"))
    assert(read(dir).select(explode(col("messages")).as("m"))
      .filter(col("m.text").isNotNull).count() === 2L)
    assert(spark.read.format(fmt).option("path", dir)
      .option("version", preDrop.toString).load()
      .select(explode(col("messages")).as("m"))
      .filter(col("m.ts") === 42L).count() === 1L)
  }

  test("array<struct> cells flow through the STREAMING sink " +
      "exactly-once and read back decodable") {
    val dir = freshDir("stream")
    val src = java.nio.file.Files
      .createTempDirectory("gdxas_stream_").toString + "/in"
    // JSON source rows with the turn-list column — the stream builds
    // the array<struct> shape and sinks it through GdxStreamingWrite
    (1L to 30L).map(i => (i, s"q$i", s"a$i")).toDF("k", "q", "a")
      .write.json(src)
    val ckpt = java.nio.file.Files
      .createTempDirectory("gdxas_ckpt_").toString
    val stream = spark.readStream
      .schema("k BIGINT, q STRING, a STRING").json(src)
      .select(col("k"), lit("conv").as("v"),
        when(col("k") % 3 === 0, array(
          struct(lit("user").as("role"), col("q").as("content")),
          struct(lit("assistant").as("role"), col("a").as("content"))))
          .otherwise(array(
            struct(lit("user").as("role"), col("q").as("content"))))
          .as("messages"))
      .writeStream.format(fmt).option("path", dir)
      .option("checkpointLocation", ckpt)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    stream.awaitTermination(60000)
    val back = read(dir)
    assert(back.count() === 30L)
    assert(back.select(explode(col("messages")).as("m"))
      .count() === 40L) // 20 single-turn + 10 two-turn
    assert(back.filter(col("k") % 3 === 0)
      .select(explode(col("messages")).as("m"))
      .filter(col("m.role") === "assistant" &&
        col("m.content").startsWith("a")).count() === 10L)
  }

  test("tool-call traces: collections nest inside element structs — " +
      "array<struct<role, content, tool_calls: array<struct<name, " +
      "args>>>> round-trips, prunes, and takes element-predicate DML") {
    val dir = freshDir("toolcalls")
    val callT = StructType(Seq(
      StructField("name", StringType),
      StructField("args", StringType)))
    val turnT = StructType(Seq(
      StructField("role", StringType),
      StructField("content", StringType),
      StructField("tool_calls", ArrayType(callT))))
    val sch = StructType(Seq(StructField("k", LongType),
      StructField("lang", StringType),
      StructField("messages", ArrayType(turnT))))
    def row(k: Long, calls: Seq[Row]) = Row(k, "en", Seq(
      Row("user", s"find docs, please (k=$k)", Seq.empty[Row]),
      Row("assistant", "on it; calling tools", calls)))
    val rows = Seq(
      row(1L, Seq(Row("search", """{"q": "spark, sql"}"""),
        Row("fetch", "url=(http://x)"))),
      row(2L, Seq.empty),
      row(3L, Seq(Row("search", "plain"))))
    spark.createDataFrame(spark.sparkContext.parallelize(rows, 1), sch)
      .write.format(fmt).option("path", dir).mode("overwrite").save()
    val back = read(dir)
    // full round-trip, punctuation in the INNER args included
    val m1 = back.filter(col("k") === 1)
      .select(explode(col("messages")).as("m"))
      .filter(col("m.role") === "assistant")
      .select(explode(col("m.tool_calls")).as("c"))
      .orderBy("c.name").collect()
      .map(r => (r.getStruct(0).getString(0), r.getStruct(0).getString(1)))
    assert(m1.toSeq === Seq(
      ("fetch", "url=(http://x)"),
      ("search", """{"q": "spark, sql"}""")))
    // empty inner array vs present
    assert(back.filter(col("k") === 2)
      .select(explode(col("messages")).as("m"))
      .filter(col("m.role") === "assistant")
      .select(size(col("m.tool_calls"))).head.getInt(0) === 0)
    // nested pruning: selecting only the inner name decodes by the
    // stored layout and projects
    assert(back.select(explode(col("messages")).as("m"))
      .select(explode(col("m.tool_calls")).as("c"))
      .select(col("c.name")).collect().map(_.getString(0)).sorted
      === Array("fetch", "search", "search"))
    // element-predicate DML on the INNER array: drop conversations
    // that ever called `fetch`
    GdxSource.delete(spark, dir, expr(
      "exists(messages, m -> exists(m.tool_calls, c -> c.name = 'fetch'))"))
    assert(read(dir).select("k").collect().map(_.getLong(0)).sorted
      === Array(2L, 3L))
    // changefeed (external decode surface) carries the nested shape
    val cdf = GdxSource.tableChanges(spark, dir, 0, 1)
      .filter(col("k") === 3)
      .select(explode(col("messages")).as("m"))
      .filter(col("m.role") === "assistant")
      .select(explode(col("m.tool_calls")).as("c"))
      .select("c.args").head.getString(0)
    assert(cdf === "plain")
  }

  test("NULL elements stay refused; element strings with commas/" +
      "parens/newlines round-trip under the escape era") {
    val dir = freshDir("refuse")
    val e = intercept[Exception] {
      df(Seq(Row(1L, "a", Seq(Row("user", "hi"), null))))
        .write.format(fmt).option("path", dir)
        .mode("overwrite").save()
    }
    assert(Iterator.iterate(e: Throwable)(_.getCause)
      .takeWhile(_ != null).take(8)
      .exists(t => t.getMessage != null &&
        t.getMessage.contains("must not")), e.getMessage)
    // REAL chat content — commas, parens, '=' and newlines — lives in
    // element struct leaves now (the escape layer encodes them)
    val msg = "Hi, how are you? (thanks)\nx = y"
    df(Seq(Row(1L, "a", Seq(Row("user", msg)))))
      .write.format(fmt).option("path", dir).mode("overwrite").save()
    assert(read(dir).select(explode(col("messages")).as("m"))
      .select(col("m.content")).head.getString(0) === msg)
  }
}
