package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.sources.GdxSource

/** First-class typed columns in the GDX format (DATE, TIMESTAMP,
  * BOOLEAN, DECIMAL(p,s) beyond the classic {long,string,double}):
  * canonical order-preserving cell encodings (epoch-day, epoch-micros,
  * true/false, plain decimal text), zone-map stats and pruning in each
  * type's own comparison domain, null round-trips, the DML substrate
  * (UPDATE/DELETE rewrite files through the external-Row path), the
  * changefeed, and schema evolution with era-correct reads. */
class GdxTypedColumnsSpec extends SparkSuite {
  import spark.implicits._

  private val fmt = "graft.sources.GdxSource"
  private def freshDir(tag: String): String =
    java.nio.file.Files.createTempDirectory(s"gdxty_$tag").toString + "/t"
  private def conf = GdxSource.driverConf()
  private def read(dir: String) =
    spark.read.format(fmt).option("path", dir).load()

  private val typedSchema = "k BIGINT, d DATE, ts TIMESTAMP, " +
    "amt DECIMAL(10,2), flag BOOLEAN, v STRING"

  private def typedRows(n: Int) = {
    val df = spark.range(n.toLong).toDF("k")
    df.select(col("k"),
      date_add(lit(java.sql.Date.valueOf("2024-01-01")),
        col("k").cast("int")).as("d"),
      (lit(java.sql.Timestamp.valueOf("2024-01-01 00:00:00"))
        + expr("make_interval(0,0,0,0,0,0, k * 61)")).as("ts"),
      concat(col("k").cast("string"), lit(".25"))
        .cast("decimal(10,2)").as("amt"),
      (col("k") % 3 === 0).as("flag"),
      concat(lit("r"), col("k")).as("v"))
  }

  test("all typed cells round-trip exactly, including NULLs in every " +
      "typed column") {
    val dir = freshDir("rt")
    val rows = typedRows(100)
      // every 10th row nulls the typed columns (k must stay non-null)
      .select(col("k"),
        when(col("k") % 10 =!= 0, col("d")).as("d"),
        when(col("k") % 10 =!= 0, col("ts")).as("ts"),
        when(col("k") % 10 =!= 0, col("amt")).as("amt"),
        when(col("k") % 10 =!= 0, col("flag")).as("flag"),
        col("v"))
    rows.write.format(fmt).option("path", dir).mode("overwrite").save()
    val back = read(dir)
    assert(back.schema.fields.map(f => (f.name, f.dataType)).toSeq ===
      Seq("k" -> LongType, "d" -> DateType, "ts" -> TimestampType,
        "amt" -> DecimalType(10, 2), "flag" -> BooleanType,
        "v" -> StringType))
    assert(back.except(rows).count() === 0L)
    assert(rows.except(back).count() === 0L)
    assert(back.filter(col("d").isNull).count() === 10L)
  }

  test("zone maps prune in each type's own domain: date, timestamp, " +
      "decimal, and boolean predicates all skip files") {
    val dir = freshDir("prune")
    typedRows(1000).repartitionByRange(10, col("k"))
      .write.format(fmt).option("path", dir).mode("overwrite").save()
    import org.apache.spark.sql.sources.{EqualTo, LessThan, GreaterThan}
    def planned(f: org.apache.spark.sql.sources.Filter): (Int, Int) =
      GdxSource.plannedFiles(dir, Seq(f))
    // k-clustered means every typed column is clustered too (all are
    // monotone in k by construction) — each predicate must prove skips
    val (dKept, total) = planned(
      LessThan("d", java.sql.Date.valueOf("2024-02-01")))
    assert(dKept < total, s"date: $dKept/$total")
    val (tsKept, _) = planned(GreaterThan("ts",
      java.sql.Timestamp.valueOf("2024-01-01 16:00:00")))
    assert(tsKept < total, s"ts: $tsKept/$total")
    val (amtKept, _) = planned(LessThan("amt",
      new java.math.BigDecimal("100.00")))
    assert(amtKept < total, s"amt: $amtKept/$total")
    // boolean stats: a file holding only k%3!=0 rows proves flag=false
    val dir2 = freshDir("bool")
    typedRows(90).repartitionByRange(3, col("flag"))
      .write.format(fmt).option("path", dir2).mode("overwrite").save()
    val (bKept, bTotal) = GdxSource.plannedFiles(dir2,
      Seq(EqualTo("flag", java.lang.Boolean.TRUE)))
    assert(bKept < bTotal, s"flag: $bKept/$bTotal")
    // and the pruned scans still return exactly the right rows
    assert(read(dir).filter(col("d") < lit("2024-02-01").cast("date"))
      .count() === 31L)
    assert(read(dir2).filter(col("flag")).count() === 30L)
  }

  test("typed DML rewrites through the substrate: UPDATE on a date " +
      "predicate, DELETE on a decimal compare, changefeed shows typed " +
      "rows") {
    val dir = freshDir("dml")
    typedRows(200).coalesce(2)
      .write.format(fmt).option("path", dir).mode("overwrite").save()
    GdxSource.update(spark, dir,
      col("d") < lit("2024-03-01").cast("date"),
      Map("flag" -> not(col("flag"))))
    GdxSource.delete(spark, dir,
      col("amt") > lit(new java.math.BigDecimal("150.00")))
    val live = read(dir)
    assert(live.count() === 150L)
    // the UPDATE flipped exactly the pre-March rows (k < 60)
    assert(live.filter(col("k") < 60 && col("flag")).count() ===
      typedRows(60).filter(!(col("k") % 3 === 0)).count())
    // changefeed carries the typed columns through the external path
    val maxV = GdxSource.listVersions(dir, conf).max
    val ch = GdxSource.tableChanges(spark, dir, 1, maxV)
    assert(ch.schema("d").dataType === DateType)
    assert(ch.schema("amt").dataType === DecimalType(10, 2))
    // the DELETE commit's own feed rows (the UPDATE before it emits
    // its own delete+insert pairs) carry exactly the amt > 150 keys
    assert(ch.filter(col("change_type") === "delete" &&
      col("version") === maxV &&
      col("amt") <= lit(new java.math.BigDecimal("150.00"))).count()
      === 0L)
    assert(ch.filter(col("change_type") === "delete" &&
      col("version") === maxV).count() === 50L)
  }

  test("schema evolution adds typed columns metadata-only; era reads " +
      "null-fill and time travel keeps the old schema") {
    val dir = freshDir("evo")
    Seq((1L, "a"), (2L, "b")).toDF("k", "v")
      .write.format(fmt).option("path", dir).mode("overwrite").save() // v1
    val v1 = GdxSource.listVersions(dir, conf).max
    GdxSource.addColumn(dir, "d", DateType)          // v2
    GdxSource.addColumn(dir, "amt", DecimalType(8, 3)) // v3
    Seq((3L, "c", java.sql.Date.valueOf("2025-06-01"),
        new java.math.BigDecimal("1.500")))
      .toDF("k", "v", "d", "amt")
      .write.format(fmt).option("path", dir).mode("append").save()
    val back = read(dir).orderBy("k").collect()
    assert(back.length === 3)
    assert(back(0).isNullAt(2) && back(0).isNullAt(3)) // pre-evolution
    assert(back(2).getDate(2) === java.sql.Date.valueOf("2025-06-01"))
    assert(back(2).getDecimal(3) ===
      new java.math.BigDecimal("1.500"))
    // the old era still reads under its own 2-column schema
    val old = spark.read.format(fmt).option("path", dir)
      .option("version", v1.toString).load()
    assert(old.schema.fieldNames.toSeq === Seq("k", "v"))
    assert(old.count() === 2L)
  }

  test("decimal stats survive the manifest round-trip as plain text " +
      "and compare exactly (no double rounding)") {
    val dir = freshDir("dec")
    // values whose double image would collide: 0.1 + 0.2 style edges
    Seq((1L, new java.math.BigDecimal("9007199254740993.01")),
        (2L, new java.math.BigDecimal("9007199254740993.02")))
      .toDF("k", "amt").withColumn("amt", col("amt").cast("decimal(20,2)"))
      .coalesce(1)
      .write.format(fmt).option("path", dir).mode("overwrite").save()
    val e = GdxSource.committedEntries(dir, conf).head
    val (mn, mx) = e.stats.get.cols("amt")
    assert(mn === "9007199254740993.01" && mx === "9007199254740993.02")
    // a predicate BETWEEN the two double-identical values still prunes
    // correctly through exact decimal compare
    val (kept, _) = GdxSource.plannedFiles(dir,
      Seq(org.apache.spark.sql.sources.GreaterThan("amt",
        new java.math.BigDecimal("9007199254740993.02"))))
    assert(kept === 0, "exact compare must prove the miss")
  }

  test("unsupported types and typed partition columns are refused " +
      "loudly") {
    val dir = freshDir("refuse")
    val e1 = intercept[Exception] {
      Seq((1L, Seq(1, 2))).toDF("k", "arr")
        .write.format(fmt).option("path", dir).mode("overwrite").save()
    }
    assert(e1.getMessage.contains("unsupported column type"),
      e1.getMessage)
    val e2 = intercept[Exception] {
      typedRows(10).write.format(fmt).option("path", freshDir("pd"))
        .option("partitionBy", "d").mode("overwrite").save()
    }
    assert(e2.getMessage.contains("partition column"), e2.getMessage)
  }

  test("numeric ARRAY columns round-trip bit-identically (floats via " +
      "shortest-roundtrip text); empty arrays, NULL cells, and the " +
      "DML rewrite path all work; NULL elements are refused") {
    val dir = freshDir("arr")
    val rows = Seq(
      (1L, Seq(1.5f, -2.25f, 3.125f), Seq(10L, 20L), "a"),
      (2L, Seq.empty[Float], Seq.empty[Long], "b"),
      (3L, Seq(0.1f, 0.2f), Seq(7L), "c"))
      .toDF("k", "emb", "toks", "v")
    val withNull = rows.withColumn("emb",
      when(col("k") === 2L, lit(null)).otherwise(col("emb")))
    withNull.coalesce(1)
      .write.format(fmt).option("path", dir).mode("overwrite").save()
    val back = read(dir)
    assert(back.schema("emb").dataType ===
      ArrayType(FloatType, containsNull = true))
    assert(back.schema("toks").dataType ===
      ArrayType(LongType, containsNull = true))
    assert(back.except(withNull).count() === 0L)
    assert(withNull.except(back).count() === 0L)
    assert(back.filter(col("k") === 3L).head.getSeq[Float](1) ===
      Seq(0.1f, 0.2f)) // bit-identical floats
    // UPDATE rewrites array cells through the external-Row path
    GdxSource.update(spark, dir, col("k") === 3L,
      Map("toks" -> expr("array(8L, 9L)")))
    assert(read(dir).filter(col("k") === 3L).head.getSeq[Long](2)
      === Seq(8L, 9L))
    // NULL elements are refused loudly (no element-null marker)
    val e = intercept[Exception] {
      Seq((9L, Seq[java.lang.Long](1L, null), Seq.empty[Long], "x"))
        .toDF("k", "emb", "toks", "v")
        .select(col("k"), col("emb").cast("array<float>").as("emb"),
          col("toks"), col("v"))
        .write.format(fmt).option("path", dir).mode("append").save()
    }
    assert(e.getMessage.contains("NULL") ||
      Option(e.getCause).exists(_.getMessage.contains("NULL")),
      e.getMessage)
  }

  test("catalog DDL accepts the typed vocabulary and refuses the rest") {
    val wh = java.nio.file.Files.createTempDirectory("gdxty_wh").toString
    val c = Sessions.pinned(spark,
      "spark.sql.catalog.gdxty" -> "graft.sources.GdxCatalog",
      "spark.sql.catalog.gdxty.warehouse" -> wh)
    c.sql("CREATE NAMESPACE gdxty.lab")
    c.sql(s"CREATE TABLE gdxty.lab.t ($typedSchema)")
    Sessions.insertInto(c, typedRows(20), "gdxty.lab.t")
    assert(c.sql("SELECT count(*) FROM gdxty.lab.t").head.getLong(0)
      === 20L)
    assert(c.sql("SELECT amt FROM gdxty.lab.t WHERE k = 3").head
      .getDecimal(0) === new java.math.BigDecimal("3.25"))
    // string-string maps are first-class since c39; non-string maps
    // stay out of the vocabulary
    val e = intercept[Exception] {
      c.sql("CREATE TABLE gdxty.lab.bad (k BIGINT, m MAP<STRING,BIGINT>)")
    }
    assert(e.getMessage.contains("unsupported column type"), e.getMessage)
  }
}
