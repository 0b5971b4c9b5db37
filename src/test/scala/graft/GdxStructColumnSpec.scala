package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.sources.GdxSource

/** Nested STRUCT columns: recursive `struct<a:long,...>` type names in
  * the schema line, canonical parenthesized positional cells (`\N`
  * sub-nulls never collide with NULL cells), nested schema pruning
  * through the DSv2 reader, zone maps on numeric LEAF fields under
  * their dotted names, the DML substrate over struct cells, trailing
  * nested-field evolution with era null-fill, and loud refusals for
  * the vocabulary the positional decoder cannot invert. */
class GdxStructColumnSpec extends SparkSuite {
  import spark.implicits._

  private val fmt = "graft.sources.GdxSource"
  private def freshDir(tag: String): String =
    java.nio.file.Files.createTempDirectory(s"gdxst_$tag").toString + "/t"
  private def conf = GdxSource.driverConf()
  private def read(dir: String) =
    spark.read.format(fmt).option("path", dir).load()

  private val meta = StructType(Seq(
    StructField("score", DoubleType),
    StructField("src", StructType(Seq(
      StructField("url", StringType),
      StructField("domain", StringType)))),
    StructField("tokens", LongType)))

  private def df(rows: Seq[org.apache.spark.sql.Row]) =
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 1),
      StructType(Seq(StructField("k", LongType),
        StructField("v", StringType), StructField("meta", meta))))

  import org.apache.spark.sql.Row

  test("structs round-trip: nested struct, null struct, null leaves, " +
      "decimal/date leaves; cells are canonical parenthesized text") {
    val dir = freshDir("rt")
    df(Seq(
      Row(1L, "a", Row(0.9, Row("http://x/1", "x"), 42L)),
      Row(2L, "b", Row(null, Row(null, "y"), 7L)),
      Row(3L, "c", null)))
      .write.format(fmt).option("path", dir).mode("overwrite").save()
    val back = read(dir).orderBy("k").collect()
    assert(back(0).getStruct(2).getDouble(0) === 0.9)
    assert(back(0).getStruct(2).getStruct(1).getString(0) === "http://x/1")
    assert(back(0).getStruct(2).getLong(2) === 42L)
    assert(back(1).getStruct(2).isNullAt(0))
    assert(back(1).getStruct(2).getStruct(1).isNullAt(0))
    assert(back(1).getStruct(2).getStruct(1).getString(1) === "y")
    assert(back(2).isNullAt(2))
    // the raw cell is the canonical parenthesized form
    val line1 = new java.io.File(dir).listFiles().toSeq
      .filter(_.getName.endsWith(".gdx"))
      .flatMap(f => scala.io.Source.fromFile(f).getLines().toList)
      .find(_.startsWith("1\t")).get
    assert(line1.split('\t')(2) === "(0.9,(http://x/1,x),42)")
    // typed leaves beyond the basics survive the round trip
    val dir2 = freshDir("rt2")
    val st2 = StructType(Seq(StructField("d", DateType),
      StructField("amt", DecimalType(10, 2)),
      StructField("ok", BooleanType)))
    spark.createDataFrame(
      spark.sparkContext.parallelize(Seq(Row(1L, "a",
        Row(java.sql.Date.valueOf("2024-03-01"),
          new java.math.BigDecimal("12.50"), true))), 1),
      StructType(Seq(StructField("k", LongType),
        StructField("v", StringType), StructField("t", st2))))
      .write.format(fmt).option("path", dir2).mode("overwrite").save()
    val r2 = read(dir2).select("t.d", "t.amt", "t.ok").head
    assert(r2.getDate(0) === java.sql.Date.valueOf("2024-03-01"))
    assert(r2.getDecimal(1) === new java.math.BigDecimal("12.50"))
    assert(r2.getBoolean(2))
  }

  test("nested schema pruning: a leaf-only select plans a narrowed " +
      "struct and reads correct values") {
    val dir = freshDir("prune")
    df((1L to 50L).map(i =>
      Row(i, s"v$i", Row(i / 10.0, Row(s"http://x/$i", "x"), i))))
      .write.format(fmt).option("path", dir).mode("overwrite").save()
    val q = read(dir).select(col("k"), col("meta.tokens"))
    // Catalyst's nested schema pruning narrows the struct to the
    // requested leaf; the reader decodes by the STORED layout and
    // projects — values must match either way
    assert(q.orderBy("k").collect().map(_.getLong(1)).toSeq ===
      (1L to 50L).toSeq)
    val readSchemas = q.queryExecution.executedPlan.collect {
      case b: org.apache.spark.sql.execution.datasources.v2
          .BatchScanExec => b.scan.readSchema()
    }
    assert(readSchemas.nonEmpty)
    val metaRead = readSchemas.head("meta").dataType
      .asInstanceOf[StructType]
    assert(metaRead.fieldNames.toSeq === Seq("tokens"),
      s"expected the struct narrowed to the requested leaf: $metaRead")
  }

  test("zone maps on numeric struct leaves prune files under dotted " +
      "names; a leaf predicate never loses rows") {
    val dir = freshDir("zm")
    // 4 files with disjoint meta.tokens ranges
    (0 until 4).foreach { b =>
      df((1L to 25L).map { i =>
        val t = b * 1000L + i
        Row(b * 25L + i, s"v$i", Row(t / 10.0, Row(s"u$i", "x"), t))
      }).coalesce(1)
        .write.format(fmt).option("path", dir).mode("append").save()
    }
    val (kept, all) = GdxSource.plannedFiles(dir, Seq(
      org.apache.spark.sql.sources.GreaterThan("meta.tokens", 3000L)))
    assert(all === 4 && kept === 1, s"expected 1/4 files, got $kept/$all")
    val (keptD, _) = GdxSource.plannedFiles(dir, Seq(
      org.apache.spark.sql.sources.LessThan("meta.score", 100.0)))
    assert(keptD === 1, s"double leaf lane: expected 1, got $keptD")
    // correctness through the engine: the filter result matches a
    // full-scan filter (skipping is an overlay, not the boundary)
    val got = read(dir).filter(col("meta.tokens") > 3000L).count()
    assert(got === 25L)
  }

  test("DML on a nested predicate: UPDATE and DELETE keyed on a leaf; " +
      "the changefeed carries struct cells") {
    val dir = freshDir("dml")
    df((1L to 20L).map(i =>
      Row(i, s"v$i", Row(i / 10.0, Row(s"u$i", if (i % 2 == 0) "even"
        else "odd"), i))))
      .write.format(fmt).option("path", dir).mode("overwrite").save()
    GdxSource.update(spark, dir,
      col("meta.src.domain") === "even",
      Map("v" -> lit("flagged")))
    assert(read(dir).filter(col("v") === "flagged").count() === 10L)
    val (delV, _) = GdxSource.delete(spark, dir, col("meta.tokens") <= 5L)
    assert(read(dir).count() === 15L)
    // the feed surfaces an UPDATE as delete(pre) + insert(post): 10
    // update pre-images + 5 true deletes (whose pre-images for k=2,4
    // carry the updated v); struct leaves are readable on every row
    val feed = GdxSource.tableChanges(spark, dir, 0, delV)
    assert(feed.filter(col("change_type") === "delete").count() === 15L)
    assert(feed.filter(col("change_type") === "delete")
      .filter(col("meta.tokens") <= 5L)
      .filter(col("v") =!= "flagged").count() === 5L)
    assert(feed.filter(col("change_type") === "insert")
      .filter(col("v") === "flagged")
      .filter(col("meta.src.domain") === "even").count() === 10L)
  }

  test("addNestedField: era rows null-fill the trailing leaf, new " +
      "writes carry it, time travel sees the old shape") {
    val dir = freshDir("evo")
    df(Seq(Row(1L, "a", Row(0.5, Row("u1", "x"), 10L))))
      .write.format(fmt).option("path", dir).mode("overwrite").save()
    val v2 = GdxSource.addNestedField(dir, "meta", "lang", StringType)
    val evolved = GdxSource.committedSchema(dir, conf)
    val metaT = evolved("meta").dataType.asInstanceOf[StructType]
    assert(metaT.fieldNames.toSeq ===
      Seq("score", "src", "tokens", "lang"))
    // era read: the pre-evolution cell has 3 sub-cells; lang is NULL
    assert(read(dir).select("meta.lang").head.isNullAt(0))
    // nested-nested: add under meta.src too
    GdxSource.addNestedField(dir, "meta.src", "tld", StringType)
    assert(read(dir).select("meta.src.tld").head.isNullAt(0))
    // a new write carries the evolved shape end-to-end
    val metaT3 = GdxSource.committedSchema(dir, conf)("meta")
      .dataType.asInstanceOf[StructType]
    spark.createDataFrame(
      spark.sparkContext.parallelize(Seq(Row(2L, "b",
        Row(0.7, Row("u2", "y", "com"), 20L, "en"))), 1),
      StructType(Seq(StructField("k", LongType),
        StructField("v", StringType), StructField("meta", metaT3))))
      .write.format(fmt).option("path", dir).mode("append").save()
    val r = read(dir).filter(col("k") === 2L)
      .select("meta.lang", "meta.src.tld").head
    assert(r.getString(0) === "en" && r.getString(1) === "com")
    // time travel to the pre-evolution snapshot: old struct shape
    val tt = spark.read.format(fmt).option("path", dir)
      .option("version", (v2 - 1).toString).load()
    assert(tt.schema("meta").dataType.asInstanceOf[StructType]
      .fieldNames.toSeq === Seq("score", "src", "tokens"))
    // refusals: missing path, non-struct path, duplicate field
    intercept[IllegalArgumentException](
      GdxSource.addNestedField(dir, "nope", "x", LongType))
    intercept[IllegalArgumentException](
      GdxSource.addNestedField(dir, "meta.tokens", "x", LongType))
    intercept[IllegalArgumentException](
      GdxSource.addNestedField(dir, "meta", "lang", StringType))
  }

  test("renameNestedField: metadata-only, positional cells untouched, " +
      "stale leaf stats degrade to no-prune") {
    val dir = freshDir("ren")
    df((1L to 40L).map(i =>
      Row(i, s"v$i", Row(i / 10.0, Row(s"u$i", "x"), i * 100L))))
      .write.format(fmt).option("path", dir).mode("overwrite").save()
    // leaf zone maps exist under the OLD dotted name
    val (k0, a0) = GdxSource.plannedFiles(dir, Seq(
      org.apache.spark.sql.sources.GreaterThan("meta.tokens", 100000L)))
    assert(k0 === 0 && a0 === 1) // everything under the cutoff
    GdxSource.renameNestedField(dir, "meta.tokens", "n_tok")
    val metaT = GdxSource.committedSchema(dir, conf)("meta")
      .dataType.asInstanceOf[StructType]
    assert(metaT.fieldNames.toSeq === Seq("score", "src", "n_tok"))
    // cells decode under the new name; values untouched
    assert(read(dir).select(sum(col("meta.n_tok"))).head.getLong(0)
      === (1L to 40L).map(_ * 100L).sum)
    // old-name stats cannot prune under the new name: conservative
    val (k1, a1) = GdxSource.plannedFiles(dir, Seq(
      org.apache.spark.sql.sources.GreaterThan("meta.n_tok", 100000L)))
    assert(k1 === a1, "stale leaf stats must degrade to keep-all")
    // a fresh write re-publishes stats under the new name
    val metaT2 = GdxSource.committedSchema(dir, conf)("meta")
      .dataType.asInstanceOf[StructType]
    spark.createDataFrame(
      spark.sparkContext.parallelize(Seq(Row(41L, "w",
        Row(0.1, Row("u", "x"), 500000L))), 1),
      StructType(Seq(StructField("k", LongType),
        StructField("v", StringType), StructField("meta", metaT2))))
      .write.format(fmt).option("path", dir).mode("append").save()
    val (k2, a2) = GdxSource.plannedFiles(dir, Seq(
      org.apache.spark.sql.sources.GreaterThan("meta.n_tok", 100000L)))
    assert(a2 === 2 && k2 === 2, // old file kept (no proof), new kept
      s"got $k2/$a2")
    val (k3, _) = GdxSource.plannedFiles(dir, Seq(
      org.apache.spark.sql.sources.GreaterThan("meta.n_tok", 600000L)))
    assert(k3 === 1,
      "the fresh file's new-name stats must prune it (max 500k); only " +
        "the stats-stale old file survives")
    // deep rename + refusals
    GdxSource.renameNestedField(dir, "meta.src.domain", "site")
    assert(read(dir).filter(col("meta.src.site") === "x").count() === 41L)
    intercept[IllegalArgumentException](
      GdxSource.renameNestedField(dir, "meta", "m2")) // not nested
    intercept[IllegalArgumentException](
      GdxSource.renameNestedField(dir, "meta.nope", "x"))
    intercept[IllegalArgumentException](
      GdxSource.renameNestedField(dir, "meta.score", "n_tok")) // dup
  }

  test("catalog SQL: CREATE TABLE with STRUCT, nested ADD COLUMN, " +
      "UPDATE keyed on a nested field") {
    val wh = graft.Scratch.tablePath("gdxst_sql_")
    val cat = "gdx_st"
    val s = graft.Sessions.pinned(
      org.apache.spark.sql.graft.ColumnBridge
        .sessionWithExtensions(spark, new GraftExtensions()),
      s"spark.sql.catalog.$cat" -> "graft.sources.GdxCatalog",
      s"spark.sql.catalog.$cat.warehouse" -> wh)
    s.sql(s"CREATE NAMESPACE $cat.lab")
    s.sql(s"""CREATE TABLE $cat.lab.docs (k BIGINT, v STRING,
      meta STRUCT<score: DOUBLE, src: STRUCT<url: STRING,
        domain: STRING>, tokens: BIGINT>)""")
    s.sql(s"""INSERT INTO $cat.lab.docs VALUES
      (1, 'a', named_struct('score', 0.9,
        'src', named_struct('url', 'http://x/1', 'domain', 'x'),
        'tokens', 42L)),
      (2, 'b', named_struct('score', 0.2,
        'src', named_struct('url', 'http://y/2', 'domain', 'y'),
        'tokens', 7L))""")
    assert(s.sql(s"SELECT meta.src.domain FROM $cat.lab.docs " +
      "WHERE meta.tokens > 10").head.getString(0) === "x")
    s.sql(s"ALTER TABLE $cat.lab.docs ADD COLUMN meta.lang STRING")
    assert(s.table(s"$cat.lab.docs").schema("meta").dataType
      .asInstanceOf[StructType].fieldNames.contains("lang"))
    // nested RENAME through Spark's native ALTER grammar
    s.sql(s"ALTER TABLE $cat.lab.docs RENAME COLUMN meta.tokens TO n_tok")
    assert(s.sql(s"SELECT meta.n_tok FROM $cat.lab.docs WHERE k = 1")
      .head.getLong(0) === 42L)
    // nested DROP through Spark's native ALTER grammar — era-correct
    // rewrite (positional cells shift in the NEW files only)
    s.sql(s"ALTER TABLE $cat.lab.docs DROP COLUMN meta.lang")
    assert(!s.table(s"$cat.lab.docs").schema("meta").dataType
      .asInstanceOf[StructType].fieldNames.contains("lang"))
    assert(s.sql(s"SELECT meta.n_tok FROM $cat.lab.docs WHERE k = 1")
      .head.getLong(0) === 42L)
    s.sql(s"UPDATE $cat.lab.docs SET v = 'low' WHERE meta.score < 0.5")
    assert(s.sql(s"SELECT v FROM $cat.lab.docs WHERE k = 2")
      .head.getString(0) === "low")
  }

  test("OPTIMIZE carries struct cells byte-identically and re-publishes " +
      "leaf zone maps; time travel keeps the pre-compaction snapshot") {
    val dir = freshDir("opt")
    (0 until 4).foreach { b =>
      df((1L to 25L).map { i =>
        val t = b * 1000L + i
        Row(b * 25L + i, s"v$i", Row(t / 10.0, Row(s"u$i", "x"), t))
      }).coalesce(1)
        .write.format(fmt).option("path", dir).mode("append").save()
    }
    val before = read(dir).orderBy("k").collect()
    GdxSource.compact(spark, dir, target = 2)
    val after = read(dir).orderBy("k").collect()
    assert(after.toSeq === before.toSeq,
      "struct cells must survive the rewrite byte-identically")
    // leaf zone maps re-published on the compacted files
    val (kept, all) = GdxSource.plannedFiles(dir, Seq(
      org.apache.spark.sql.sources.GreaterThan("meta.tokens", 3000L)))
    assert(all === 2 && kept < all, s"expected leaf pruning, got $kept/$all")
    // the pre-compaction snapshot still time-travels whole
    val vs = GdxSource.listVersions(dir, conf)
    assert(spark.read.format(fmt).option("path", dir)
      .option("version", (vs.max - 1).toString).load().count() === 100L)
  }

  test("CLUSTER BY a struct leaf: writes range-cluster on the leaf, " +
      "leaf-band scans prune, renames carry the declaration") {
    val dir = freshDir("clst")
    df(Seq.empty[Row]).write.format(fmt).option("path", dir)
      .mode("overwrite").save()
    GdxSource.setClusterBy(dir, Seq("meta.tokens"))
    assert(GdxSource.clusterByOf(dir, conf) === Seq("meta.tokens"))
    assert(GdxSource.effectiveClusterBy(dir, conf) === Seq("meta.tokens"))
    // a value-scattered write: the declared leaf ordering must place
    // each file on a narrow tokens band
    val cw = Sessions.pinned(spark,
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "8192",
      "spark.sql.adaptive.coalescePartitions.minPartitionSize" -> "4096")
    val rows = spark.range(4000).select(col("id").as("k"),
      lit("x").as("v"),
      struct(((col("id") * 7919L) % 100L).cast("double").as("score"),
        struct(lit("d").as("domain")).as("src"),
        ((col("id") * 7919L) % 4000L).as("tokens")).as("meta"))
      .repartition(8)
    Sessions.rebind(rows, cw).write.format(fmt)
      .option("path", dir).mode("append").save()
    val band = Seq(
      org.apache.spark.sql.sources
        .GreaterThanOrEqual("meta.tokens", 1000L),
      org.apache.spark.sql.sources.LessThan("meta.tokens", 1400L))
    // write-time ordering already narrows ranges (the AQE rebalance
    // may split some, so this bound is the weak one)
    val (kept, all) = GdxSource.plannedFiles(dir, band)
    assert(all >= 3 && kept < all,
      s"leaf-clustered write must prune ($kept/$all)")
    // OPTIMIZE under the leaf declaration: the first pass tidies any
    // same-range splits the rebalance produced; afterwards ranges are
    // disjoint (strong pruning bound) and a repeat is a provable no-op
    GdxSource.optimizeClustered(spark, dir,
      GdxSource.effectiveClusterBy(dir, conf), 8)
    val (keptOpt, allOpt) = GdxSource.plannedFiles(dir, band)
    assert(keptOpt * 2 < allOpt,
      s"reclustered layout must prune hard ($keptOpt/$allOpt)")
    val (b, a) = GdxSource.optimizeClustered(spark, dir,
      GdxSource.effectiveClusterBy(dir, conf), 8)
    assert(b === a, s"second leaf recluster must be a no-op ($b -> $a)")
    // nested rename carries the declaration; dropping the column
    // clears it through the validated accessor
    GdxSource.renameNestedField(dir, "meta.tokens", "n_tok")
    assert(GdxSource.clusterByOf(dir, conf) === Seq("meta.n_tok"))
    assert(GdxSource.effectiveClusterBy(dir, conf) === Seq("meta.n_tok"))
    // unorderable leaf refused loudly
    intercept[IllegalArgumentException](
      GdxSource.setClusterBy(dir, Seq("meta.src.domain")))
    // the SQL front door accepts the dotted form too
    val s = org.apache.spark.sql.graft.ColumnBridge
      .sessionWithExtensions(spark, new GraftExtensions())
    val tbl = "gdxst_cl_" +
      java.util.UUID.randomUUID.toString.replace("-", "").take(8)
    s.sql(s"""CREATE TABLE $tbl (k BIGINT, v STRING,
      meta STRUCT<score: DOUBLE, src: STRUCT<domain: STRING>,
        n_tok: BIGINT>) USING $fmt OPTIONS (path '$dir')""")
    try {
      s.sql(s"ALTER TABLE $tbl CLUSTER BY (meta.score)")
      assert(GdxSource.clusterByOf(dir, conf) === Seq("meta.score"))
    } finally s.sql(s"DROP TABLE IF EXISTS $tbl")
  }

  test("CHECK constraints on nested leaves: existing data validated, " +
      "violating writes abort, NULL passes (SQL semantics)") {
    val dir = freshDir("chk")
    df(Seq(
      Row(1L, "a", Row(0.9, Row("u1", "x"), 10L)),
      Row(2L, "b", Row(null, Row("u2", "y"), 20L)), // NULL leaf passes
      Row(3L, "c", null)))                           // NULL struct passes
      .write.format(fmt).option("path", dir).mode("overwrite").save()
    GdxSource.addConstraint(spark, dir, "score_band",
      "meta.score >= 0.0 AND meta.score <= 1.0")
    // a violating write aborts with nothing committed
    val vBefore = GdxSource.listVersions(dir, conf).max
    intercept[Exception] {
      df(Seq(Row(4L, "d", Row(7.5, Row("u4", "z"), 40L)))).coalesce(1)
        .write.format(fmt).option("path", dir).mode("append").save()
    }
    assert(GdxSource.listVersions(dir, conf).max === vBefore)
    // a conforming write (including NULL leaves) lands
    df(Seq(Row(5L, "e", Row(0.5, Row("u5", "w"), 50L)),
        Row(6L, "f", Row(null, Row("u6", "w"), 60L)))).coalesce(1)
      .write.format(fmt).option("path", dir).mode("append").save()
    assert(read(dir).count() === 5L)
    // a constraint the existing data violates is refused at ADD time
    intercept[Exception] {
      GdxSource.addConstraint(spark, dir, "tokens_tiny",
        "meta.tokens < 30")
    }
  }

  test("struct cells flow through the streaming changefeed: each " +
      "commit's batch carries decodable nested values") {
    val dir = freshDir("stream")
    df(Seq(Row(1L, "a", Row(0.9, Row("u1", "x"), 10L))))
      .write.format(fmt).option("path", dir).mode("overwrite").save()
    val qn = "gdxst_feed_" +
      java.util.UUID.randomUUID.toString.replace("-", "").take(8)
    val q = spark.readStream.format(fmt).option("path", dir).load()
      .select(col("k"), col("meta.src.domain").as("domain"),
        col("meta.tokens").as("tokens"))
      .writeStream.format("memory").queryName(qn).start()
    try {
      q.processAllAvailable()
      df(Seq(Row(2L, "b", Row(0.2, Row("u2", "y"), 20L)),
          Row(3L, "c", null)))
        .write.format(fmt).option("path", dir).mode("append").save()
      q.processAllAvailable()
      val got = spark.sql(s"SELECT k, domain, tokens FROM $qn")
        .collect().map(r => (r.getLong(0),
          if (r.isNullAt(1)) null else r.getString(1),
          if (r.isNullAt(2)) null else r.getLong(2))).toSeq.sortBy(_._1)
      assert(got === Seq((1L, "x", 10L), (2L, "y", 20L),
        (3L, null, null)))
    } finally q.stop()
  }

  test("nested DROP: a MIDDLE leaf drops by rewrite — later leaves " +
      "keep their values, time travel reads the dropped leaf, and " +
      "refusals are loud") {
    val dir = freshDir("drop")
    df((1L to 20L).map(i =>
      Row(i, s"v$i", Row(i / 10.0, Row(s"u$i", "x"), i * 100L))))
      .write.format(fmt).option("path", dir).mode("overwrite").save()
    val preV = GdxSource.listVersions(dir, conf).max
    // drop the MIDDLE top-level leaf of the struct: positions after
    // it shift in the rewritten files — the exact case the positional
    // encoding could not drop metadata-only
    val (b, a) = GdxSource.dropNestedField(spark, dir, "meta.src")
    assert(b >= 1 && a >= 1)
    val live = read(dir).orderBy("k").collect()
    val metaT = live.head.schema("meta").dataType
      .asInstanceOf[StructType]
    assert(metaT.fieldNames.toSeq === Seq("score", "tokens"))
    // the trailing leaf kept its VALUES across the positional shift
    assert(live.map(r => r.getStruct(2).getLong(1)).toSeq ===
      (1L to 20L).map(_ * 100L))
    assert(live.map(r => r.getStruct(2).getDouble(0)).toSeq ===
      (1L to 20L).map(_ / 10.0))
    // era-correct: the pre-drop snapshot still reads the leaf
    val old = spark.read.format(fmt).option("path", dir)
      .option("version", preV.toString).load()
    assert(old.select(col("meta.src.domain")).distinct().collect()
      .map(_.getString(0)).toSeq === Seq("x"))
    // drop INSIDE a nested struct works too (on the old-shape table)
    val dir2 = freshDir("drop2")
    df(Seq(Row(1L, "a", Row(0.5, Row("u", "dom"), 7L))))
      .write.format(fmt).option("path", dir2).mode("overwrite").save()
    GdxSource.dropNestedField(spark, dir2, "meta.src.url")
    val r2 = read(dir2).select(col("meta.src.domain")).head
    assert(r2.getString(0) === "dom")
    // refusals: last field of a struct, missing field, constraint ref
    intercept[IllegalArgumentException](
      GdxSource.dropNestedField(spark, dir2, "meta.src.domain"))
    intercept[IllegalArgumentException](
      GdxSource.dropNestedField(spark, dir2, "meta.nope"))
    GdxSource.addConstraint(spark, dir2, "pos", "meta.score >= 0")
    val e = intercept[IllegalArgumentException](
      GdxSource.dropNestedField(spark, dir2, "meta.score"))
    assert(e.getMessage.contains("pos"), e.getMessage)
  }

  test("escape era: ','/parens/'\\N' in string leaves round-trip; " +
      "DEFAULT on a struct and empty struct still refuse") {
    intercept[IllegalArgumentException](GdxSource.typeNameOf(
      StructType(Seq.empty)))
    intercept[IllegalArgumentException](GdxSource.typeNameOf(
      StructType(Seq(StructField("a:b", LongType)))))
    val dir = freshDir("bad")
    // the old positional-vocabulary refusals are gone: structural
    // characters (and a literal "\N") escape-encode and round-trip
    def roundTrip(s: String): Unit = {
      df(Seq(Row(1L, "a", Row(0.1, Row(s, "d"), 1L)))).coalesce(1)
        .write.format(fmt).option("path", dir).mode("overwrite").save()
      assert(read(dir).select(col("meta.src.url")).head
        .getString(0) === s)
    }
    roundTrip("has,comma")
    roundTrip("has(paren) and = sign")
    roundTrip("\\N")
    roundTrip("multi\nline\ttabbed")
    intercept[IllegalArgumentException] {
      GdxSource.withDefaultCell(StructField("m", meta), "x")
    }
    // the schema-line round trip is exact for nested names
    val spec = GdxSource.schemaSpec(StructType(Seq(
      StructField("k", LongType), StructField("meta", meta))))
    assert(GdxSource.parseSchemaSpec(spec).apply("meta").dataType === meta)
  }
}
