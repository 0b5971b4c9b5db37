package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.sources.GdxSource

/** VARIANT columns + shredding: the semi-structured escape hatch.
  * Cells store the value's canonical JSON (escape-encoded), decode
  * through Spark's own parser, and a declared SHREDDED shadow column
  * derives at every write, carries ordinary zone-map stats, and
  * answers variant_get calls via the optimizer rewrite. */
class GdxVariantSpec extends SparkSuite {
  import spark.implicits._

  private lazy val s = org.apache.spark.sql.graft.ColumnBridge
    .sessionWithExtensions(spark, new GraftExtensions())

  private val fmt = "graft.sources.GdxSource"
  private def freshDir(tag: String): String =
    java.nio.file.Files.createTempDirectory(s"gdxvar_$tag").toString + "/t"

  test("variant round-trip: nested JSON with structural characters, " +
      "JSON null vs SQL NULL, cell text is escaped canonical JSON") {
    val dir = freshDir("rt")
    val df = Seq(
      (1L, """{"lang": "uk", "note": "hi, (ok)=\nnext", "q": 0.5,
              "tags": ["a", "b"], "deep": {"x": [1, 2, {"y": true}]}}"""),
      (2L, "null"), // variant NULL value — not a SQL NULL
      (3L, null: String))
      .toDF("k", "j")
      .select(col("k"), when(col("j").isNotNull,
        parse_json(col("j"))).otherwise(lit(null)).as("v"))
    df.write.format(fmt).option("path", dir).mode("overwrite").save()
    val back = spark.read.format(fmt).option("path", dir).load()
    assert(back.schema("v").dataType === VariantType)
    val got = back.orderBy("k")
      .select(col("k"),
        variant_get(col("v"), "$.lang", "string").as("lang"),
        variant_get(col("v"), "$.note", "string").as("note"),
        variant_get(col("v"), "$.deep.x[2].y", "boolean").as("y"),
        col("v").isNull.as("sqlnull"),
        is_variant_null(col("v")).as("vnull"))
      .collect()
    assert(got(0).getString(1) === "uk")
    assert(got(0).getString(2) === "hi, (ok)=\nnext")
    assert(got(0).getBoolean(3) === true)
    assert(!got(0).getBoolean(4) && !got(0).getBoolean(5))
    assert(!got(1).getBoolean(4) && got(1).getBoolean(5)) // JSON null
    assert(got(2).getBoolean(4))                          // SQL NULL
    // the stored cell is escaped JSON — no raw structural characters
    val lines = new java.io.File(dir).listFiles().toSeq
      .filter(_.getName.endsWith(".gdx"))
      .flatMap(f => scala.io.Source.fromFile(f).getLines().toList)
    val c1 = lines.find(_.startsWith("1\t")).get.split("\t", -1)(1)
    assert(c1.contains("\\c") && c1.contains("\\p") && c1.contains("\\n"))
    assert(!c1.contains("(") && !c1.contains(","))
    assert(GdxSource.schemaSpec(
      GdxSource.committedSchema(dir, GdxSource.driverConf())) ===
      "k:long,v:variant")
  }

  test("variant DML: DELETE by variant_get predicate (DV commit); " +
      "restatement re-renders unchanged variants byte-identically") {
    val dir = freshDir("dml")
    Seq((1L, """{"lang":"uk","n":1}"""), (2L, """{"lang":"de","n":2}"""),
        (3L, """{"lang":"uk","n":3}"""))
      .toDF("k", "j").select(col("k"), parse_json(col("j")).as("v"))
      .write.format(fmt).option("path", dir).mode("overwrite").save()
    val (_, n) = GdxSource.delete(s, dir,
      expr("variant_get(v, '$.lang', 'string') = 'de'"))
    assert(n === 1)
    val back = spark.read.format(fmt).option("path", dir).load()
      .select(col("k"), variant_get(col("v"), "$.n", "long").as("n"))
      .orderBy("k").collect()
    assert(back.map(r => (r.getLong(0), r.getLong(1))).toSeq ===
      Seq((1L, 1L), (3L, 3L)))
  }

  test("shredded column: derived at write (generated-always), " +
      "schema-line round-trip, INSERT may omit it") {
    val wh = java.nio.file.Files.createTempDirectory("gdxvar_wh").toString
    s.conf.set("spark.sql.catalog.gdxvs", "graft.sources.GdxCatalog")
    s.conf.set("spark.sql.catalog.gdxvs.warehouse", wh)
    s.sql("CREATE NAMESPACE IF NOT EXISTS gdxvs.ns")
    s.sql("""CREATE TABLE gdxvs.ns.docs
      (k BIGINT, meta VARIANT, meta_lang STRING, meta_q DOUBLE)
      TBLPROPERTIES ('gdx.shred.meta_lang' = 'meta:lang',
                     'gdx.shred.meta_q'    = 'meta:quality')""")
    // INSERT omits the shreds entirely — analyzer fills NULL, the
    // writer overwrites with the derived values
    s.sql("""INSERT INTO gdxvs.ns.docs (k, meta) VALUES
      (1, parse_json('{"lang": "uk", "quality": 0.9}')),
      (2, parse_json('{"lang": "de", "quality": 0.2}')),
      (3, parse_json('{"quality": "bad"}'))""")
    // and user-SUPPLIED shred values are overwritten (generated-always)
    s.sql("""INSERT INTO gdxvs.ns.docs VALUES
      (4, parse_json('{"lang": "fr"}'), 'WRONG', 9.9)""")
    val got = s.sql("""SELECT k, meta_lang, meta_q
      FROM gdxvs.ns.docs ORDER BY k""").collect()
    assert(got(0).getString(1) === "uk" && got(0).getDouble(2) === 0.9)
    assert(got(1).getString(1) === "de" && got(1).getDouble(2) === 0.2)
    assert(got(2).isNullAt(1) && got(2).isNullAt(2)) // absent/uncastable
    assert(got(3).getString(1) === "fr" && got(3).isNullAt(2))
    // the annotation rides the schema line through commits
    val dir = s"$wh/ns/docs"
    val spec = GdxSource.schemaSpec(
      GdxSource.committedSchema(dir, GdxSource.driverConf()))
    assert(spec ===
      "k:long,meta:variant,meta_lang:string^meta.lang," +
        "meta_q:double^meta.quality")
  }

  test("shred rewrite: variant_get plans onto the shadow column and " +
      "the predicate PRUNES files by the shadow's string bounds") {
    val dir = freshDir("prune")
    // range layout on the shredded value → narrow per-file lang windows
    val langs = Seq("de", "en", "fr", "uk", "zh")
    val rows = (0L until 400L).map { i =>
      (i, s"""{"lang": "${langs((i % 5).toInt)}", "n": $i}""")
    }.toDF("k", "j").select(col("k"), parse_json(col("j")).as("v"))
      .withColumn("v_lang", lit(null).cast("string"))
    val schema = StructType(Seq(StructField("k", LongType),
      StructField("v", VariantType),
      GdxSource.withShred(StructField("v_lang", StringType), "v", "lang")))
    // declare via createTable-equivalent: write the empty table first
    GdxSource.commitFiles(dir, GdxSource.driverConf(), replace = true,
      Seq.empty, expectedBase = 0, writeSchema = schema)
    rows.repartitionByRange(8, col("k"))
      .write.format(fmt).option("path", dir).mode("append").save()
    // derived at write despite the null placeholder
    val q = s.read.format(fmt).option("path", dir).load()
      .filter(expr("variant_get(v, '$.lang', 'string') = 'uk'"))
    assert(q.count() === 80L)
    // the optimizer rewrote variant_get onto the shadow
    val opt = q.queryExecution.optimizedPlan.toString
    assert(!opt.toLowerCase.contains("variant_get"),
      s"variant_get survived the rewrite:\n$opt")
    // and the shadow's zone maps prune: a value beyond every bound
    // plans zero files, a real value plans a subset... here every file
    // carries all 5 langs (k-ranged layout), so re-lay by lang instead
    val dir2 = freshDir("prune2")
    GdxSource.commitFiles(dir2, GdxSource.driverConf(), replace = true,
      Seq.empty, expectedBase = 0, writeSchema = schema)
    rows.withColumn("lv",
        expr("variant_get(v, '$.lang', 'string')"))
      .repartitionByRange(5, col("lv")).drop("lv")
      .write.format(fmt).option("path", dir2).mode("append").save()
    import org.apache.spark.sql.sources.EqualTo
    val (kept, all) = GdxSource.plannedFiles(dir2,
      Seq(EqualTo("v_lang", "uk")))
    assert(kept > 0 && kept < all, s"no pruning: kept=$kept all=$all")
    val cnt = s.read.format(fmt).option("path", dir2).load()
      .filter(expr("try_variant_get(v, '$.lang', 'string') = 'uk'"))
      .count()
    assert(cnt === 80L)
  }

  test("UPDATE on the variant source re-derives the shadow " +
      "(generated-always through the DML restatement path)") {
    val dir = freshDir("upd")
    val schema = StructType(Seq(StructField("k", LongType),
      StructField("v", VariantType),
      GdxSource.withShred(StructField("v_lang", StringType), "v", "lang")))
    GdxSource.commitFiles(dir, GdxSource.driverConf(), replace = true,
      Seq.empty, expectedBase = 0, writeSchema = schema)
    Seq((1L, """{"lang":"uk"}"""), (2L, """{"lang":"de"}"""))
      .toDF("k", "j")
      .select(col("k"), parse_json(col("j")).as("v"),
        lit(null).cast("string").as("v_lang"))
      .write.format(fmt).option("path", dir).mode("append").save()
    GdxSource.update(s, dir, col("k") === 1L,
      Map("v" -> parse_json(lit("""{"lang":"fr"}"""))))
    val got = spark.read.format(fmt).option("path", dir).load()
      .select(col("k"), col("v_lang")).orderBy("k").collect()
    assert(got(0).getString(1) === "fr") // re-derived, not stale 'uk'
    assert(got(1).getString(1) === "de")
    // and the changefeed decodes the variant through the external
    // surface (the UPDATE's inserted row carries the new lang)
    val cdf = GdxSource.tableChanges(s, dir, 2, 3)
      .filter(col("change_type") === "insert")
      .select(expr("variant_get(v, '$.lang', 'string')")).collect()
    assert(cdf.map(_.getString(0)).toSeq === Seq("fr"))
  }

  test("renaming or dropping a shred SOURCE refuses loudly at the " +
      "DDL commit (the schema-line cross-check)") {
    val wh = java.nio.file.Files.createTempDirectory("gdxvar_wh2").toString
    s.conf.set("spark.sql.catalog.gdxvs2", "graft.sources.GdxCatalog")
    s.conf.set("spark.sql.catalog.gdxvs2.warehouse", wh)
    s.sql("CREATE NAMESPACE IF NOT EXISTS gdxvs2.ns")
    // meta sits PAST the protected core slots (0/1), so the refusal
    // under test is the shred cross-check, not the core-column guard
    s.sql("""CREATE TABLE gdxvs2.ns.t (k BIGINT, v STRING, meta VARIANT,
      meta_lang STRING)
      TBLPROPERTIES ('gdx.shred.meta_lang' = 'meta:lang')""")
    val rn = intercept[Exception] {
      s.sql("ALTER TABLE gdxvs2.ns.t RENAME COLUMN meta TO meta2")
    }
    assert(rn.getMessage.contains("not a variant column") ||
      rn.getMessage.toLowerCase.contains("shred"))
    val dr = intercept[Exception] {
      s.sql("ALTER TABLE gdxvs2.ns.t DROP COLUMN meta")
    }
    assert(dr.getMessage.contains("not a variant column") ||
      dr.getMessage.toLowerCase.contains("shred"))
    // dropping the SHADOW itself is fine (the annotation leaves with it)
    s.sql("ALTER TABLE gdxvs2.ns.t DROP COLUMN meta_lang")
    assert(GdxSource.schemaSpec(GdxSource.committedSchema(
      s"$wh/ns/t", GdxSource.driverConf())) ===
      "k:long,v:string,meta:variant")
  }

  test("CTAS honors shred declarations: the staged write derives the " +
      "shadows and the one publish commits the annotated schema line") {
    val wh = java.nio.file.Files.createTempDirectory("gdxvar_wh3").toString
    s.conf.set("spark.sql.catalog.gdxvs3", "graft.sources.GdxCatalog")
    s.conf.set("spark.sql.catalog.gdxvs3.warehouse", wh)
    s.sql("CREATE NAMESPACE IF NOT EXISTS gdxvs3.ns")
    s.sql("""CREATE TABLE gdxvs3.ns.ctas
      TBLPROPERTIES ('gdx.shred.meta_lang' = 'meta:lang')
      AS SELECT id AS k,
        parse_json('{"lang": "l' || CAST(id % 3 AS STRING) || '"}')
          AS meta,
        CAST(NULL AS STRING) AS meta_lang
      FROM range(30)""")
    val got = s.sql("""SELECT meta_lang, count(*) AS n
      FROM gdxvs3.ns.ctas GROUP BY 1 ORDER BY 1""").collect()
    assert(got.map(r => (r.getString(0), r.getLong(1))).toSeq ===
      Seq(("l0", 10L), ("l1", 10L), ("l2", 10L)))
    assert(GdxSource.schemaSpec(GdxSource.committedSchema(
      s"$wh/ns/ctas", GdxSource.driverConf())) ===
      "k:long,meta:variant,meta_lang:string^meta.lang")
  }

  test("variant nests inside struct cells (a variant leaf of a typed " +
      "record) and round-trips through the positional codec") {
    val dir = freshDir("nest")
    val df = Seq(
      (1L, "a", """{"x": 1, "tags": ["p, q", "(r)"]}"""),
      (2L, "b", null: String))
      .toDF("k", "name", "j")
      .select(col("k"), struct(col("name"),
        when(col("j").isNotNull, parse_json(col("j")))
          .otherwise(lit(null)).as("meta")).as("rec"))
    df.write.format(fmt).option("path", dir).mode("overwrite").save()
    val got = spark.read.format(fmt).option("path", dir).load()
      .select(col("k"), col("rec.name"),
        variant_get(col("rec.meta"), "$.x", "long").as("x"),
        variant_get(col("rec.meta"), "$.tags[0]", "string").as("t0"))
      .orderBy("k").collect()
    assert(got(0).getString(1) === "a" && got(0).getLong(2) === 1L &&
      got(0).getString(3) === "p, q")
    assert(got(1).getString(1) === "b" && got(1).isNullAt(2))
    assert(GdxSource.schemaSpec(GdxSource.committedSchema(dir,
      GdxSource.driverConf())) ===
      "k:long,rec:struct<name:string,meta:variant>")
  }

  test("staged txn INSERT derives shreds at COMMIT (omitted column " +
      "fills NULL at stage, the claim write derives)") {
    val wh = java.nio.file.Files.createTempDirectory("gdxvar_wh4").toString
    s.conf.set("spark.sql.catalog.gdxvs4", "graft.sources.GdxCatalog")
    s.conf.set("spark.sql.catalog.gdxvs4.warehouse", wh)
    s.sql("CREATE NAMESPACE IF NOT EXISTS gdxvs4.ns")
    s.sql("""CREATE TABLE gdxvs4.ns.t (k BIGINT, meta VARIANT,
      meta_lang STRING)
      TBLPROPERTIES ('gdx.shred.meta_lang' = 'meta:lang')""")
    s.sql("BEGIN TRANSACTION")
    s.sql("""INSERT INTO gdxvs4.ns.t (k, meta) VALUES
      (1, parse_json('{"lang": "uk"}'))""")
    s.sql("""INSERT INTO gdxvs4.ns.t (k, meta) VALUES
      (2, parse_json('{"lang": "de"}'))""")
    s.sql("COMMIT")
    val got = s.sql("SELECT k, meta_lang FROM gdxvs4.ns.t ORDER BY k")
      .collect()
    assert(got.map(r => (r.getLong(0), r.getString(1))).toSeq ===
      Seq((1L, "uk"), (2L, "de")))
  }

  test("the streaming sink derives shreds too (same per-row " +
      "projection as the batch writer) and variants ride micro-batches") {
    val dir = freshDir("stream")
    val schema = StructType(Seq(StructField("k", LongType),
      StructField("v", VariantType),
      GdxSource.withShred(StructField("v_lang", StringType), "v", "lang")))
    GdxSource.commitFiles(dir, GdxSource.driverConf(), replace = true,
      Seq.empty, expectedBase = 0, writeSchema = schema)
    val src = java.nio.file.Files
      .createTempDirectory("gdxvar_src").toString + "/j"
    (1L to 20L).map(i => (i, s"l${i % 4}")).toDF("k", "lang")
      .write.json(src)
    val ckpt = java.nio.file.Files
      .createTempDirectory("gdxvar_ckpt").toString
    val stream = spark.readStream
      .schema("k BIGINT, lang STRING").json(src)
      .select(col("k"),
        parse_json(to_json(struct(col("lang")))).as("v"),
        lit(null).cast("string").as("v_lang"))
      .writeStream.format(fmt).option("path", dir)
      .option("checkpointLocation", ckpt)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    stream.awaitTermination(60000)
    val got = spark.read.format(fmt).option("path", dir).load()
      .groupBy("v_lang").count().orderBy("v_lang").collect()
    assert(got.map(r => (r.getString(0), r.getLong(1))).toSeq ===
      Seq(("l0", 5L), ("l1", 5L), ("l2", 5L), ("l3", 5L)))
  }

  test("schema evolution: ALTER TABLE ADD a variant column — era rows " +
      "read NULL, new rows carry variants, time travel era-correct") {
    val dir = freshDir("evo")
    Seq((1L, "a"), (2L, "b")).toDF("k", "v")
      .write.format(fmt).option("path", dir).mode("overwrite").save()
    GdxSource.addColumn(dir, "meta",
      org.apache.spark.sql.types.VariantType)
    Seq((3L, "c", """{"tag": "new"}"""))
      .toDF("k", "v", "j")
      .select(col("k"), col("v"), parse_json(col("j")).as("meta"))
      .write.format(fmt).option("path", dir).mode("append").save()
    val got = spark.read.format(fmt).option("path", dir).load()
      .select(col("k"),
        variant_get(col("meta"), "$.tag", "string").as("tag"))
      .orderBy("k").collect()
    assert(got(0).isNullAt(1) && got(1).isNullAt(1)) // era null-fill
    assert(got(2).getString(1) === "new")
    // the pre-evolution snapshot keeps its own era's schema
    val v1 = spark.read.format(fmt).option("path", dir)
      .option("version", "1").load()
    assert(!v1.columns.contains("meta"))
  }

  test("post-hoc shred declaration refuses: ALTER TABLE SET " +
      "TBLPROPERTIES is not a shred door (era rows would read a NULL " +
      "shadow the rewrite would then serve as answers)") {
    val wh = java.nio.file.Files.createTempDirectory("gdxvar_wh5").toString
    s.conf.set("spark.sql.catalog.gdxvs5", "graft.sources.GdxCatalog")
    s.conf.set("spark.sql.catalog.gdxvs5.warehouse", wh)
    s.sql("CREATE NAMESPACE IF NOT EXISTS gdxvs5.ns")
    s.sql("CREATE TABLE gdxvs5.ns.t (k BIGINT, meta VARIANT, x STRING)")
    val e = intercept[Exception] {
      s.sql("""ALTER TABLE gdxvs5.ns.t
        SET TBLPROPERTIES ('gdx.shred.x' = 'meta:lang')""")
    }
    assert(e.getMessage.toLowerCase.contains("unsupported"))
    // and the schema line stayed annotation-free
    assert(GdxSource.schemaSpec(GdxSource.committedSchema(
      s"$wh/ns/t", GdxSource.driverConf())) ===
      "k:long,meta:variant,x:string")
  }

  test("shred declaration refusals: non-variant source, bad key, " +
      "bad target type, DEFAULT on a shredded column") {
    val f = StructField("x", StringType)
    intercept[IllegalArgumentException] {
      GdxSource.schemaSpec(StructType(Seq(StructField("k", LongType),
        GdxSource.withShred(f, "k", "lang")))) // k is not variant
    }
    intercept[IllegalArgumentException] {
      GdxSource.withShred(f, "v", "a.b") // not a simple key
    }
    intercept[IllegalArgumentException] {
      GdxSource.withShred(StructField("x", BooleanType), "v", "lang")
    }
    intercept[IllegalArgumentException] {
      GdxSource.withDefaultCell(
        GdxSource.withShred(f, "v", "lang"), "dflt")
    }
  }
}
