package graft

import org.apache.spark.sql.functions._
import graft.sources.GdxSource

/** Temporal/truncation partition transforms on the GDX format
  * (sources/GdxSource.GdxDaysPart/GdxTruncPart): `days(ts)` buckets an
  * epoch-millis BIGINT column by day ordinal, `trunc(w, col)` by
  * floorDiv width — Iceberg-style HIDDEN partitioning: queries filter
  * on the raw column, and range predicates prune whole directories
  * because the transforms are monotone. */
class GdxTemporalPartSpec extends SparkSuite {

  private val fmt = "graft.sources.GdxSource"
  private def freshDir(tag: String): String =
    java.nio.file.Files.createTempDirectory(s"gdxtp_$tag").toString + "/t"
  private def read(dir: String) =
    spark.read.format(fmt).option("path", dir).load()

  private val Day = GdxSource.DayMillis

  test("days(ts) demuxes by day ordinal; raw-ts ranges prune; " +
      "appends inherit") {
    import spark.implicits._
    val dir = freshDir("days")
    // 6 days × 10 rows, ts = epoch millis inside each day
    val rows = for (d <- 0 until 6; i <- 0 until 10)
      yield (d * 10L + i, 20000L * Day + d * Day + i * 1000L, s"d$d-$i")
    rows.toDF("k", "ts", "v").repartition(4)
      .write.format(fmt).option("path", dir)
      .option("partitionBy", "days(ts)").mode("overwrite").save()
    assert(GdxSource.committedPartitionCol(dir, GdxSource.driverConf())
      .contains("days(ts)"))
    val entries = GdxSource.committedEntries(dir, GdxSource.driverConf())
    assert(entries.nonEmpty &&
      entries.forall(_.name.matches("ts_day=\\d+/.*")),
      s"files must land under ts_day=<ord>/: ${entries.map(_.name)}")
    // the RANGE distribution landed each day in few files (not
    // tasks × days): 6 days over 4 input partitions must stay ≤ 8
    assert(entries.size <= 8, s"range-clustered write, got " +
      s"${entries.size} files: ${entries.map(_.name)}")
    assert(read(dir).count() === 60L)
    // append WITHOUT the option inherits the layout
    Seq((999L, 20000L * Day + 2 * Day + 1L, "late")).toDF("k", "ts", "v")
      .coalesce(1).write.format(fmt).option("path", dir)
      .mode("append").save()
    assert(GdxSource.committedEntries(dir, GdxSource.driverConf())
      .forall(_.name.matches("ts_day=\\d+/.*")))
    // HIDDEN pruning, end-to-end: corrupt every file of days 0-1 and
    // 4-5 on disk — a raw-ts range query over days 2-3 must still
    // succeed (those directories are never opened) and be exact
    val lo = 20000L * Day + 2 * Day
    val hi = 20000L * Day + 4 * Day
    GdxSource.committedEntries(dir, GdxSource.driverConf())
      .filterNot(e => {
        val day = e.name.substring("ts_day=".length,
          e.name.indexOf('/')).toLong
        day >= 20002 && day <= 20003
      })
      .foreach(e => java.nio.file.Files.write(
        new java.io.File(dir, e.name).toPath,
        "corrupt".getBytes("UTF-8")))
    val got = read(dir).filter(col("ts") >= lo && col("ts") < hi)
      .agg(count(lit(1)), sum("k")).head
    assert(got.getLong(0) === 21L) // 2×10 + the late append in day 2
    // and a whole-table read of the DATA does fail (count() alone is
    // answered metadata-only from the manifests — by design it never
    // opens a file, so it is NOT the corruption probe)
    intercept[Exception](read(dir).select("k", "v").collect())
  }

  test("trunc(w, col) truncation layout: equality and range prune") {
    import spark.implicits._
    val dir = freshDir("trunc")
    (0L until 400L).map(k => (k, s"v$k")).toDF("k", "v").repartition(4)
      .write.format(fmt).option("path", dir)
      .option("partitionBy", "trunc(100,k)").mode("overwrite").save()
    val entries = GdxSource.committedEntries(dir, GdxSource.driverConf())
    assert(entries.forall(_.name.matches("k_trunc=\\d+/.*")),
      s"expected k_trunc=<key>/ dirs: ${entries.map(_.name)}")
    assert(entries.map(_.name.substring("k_trunc=".length).takeWhile(
      _ != '/')).distinct.sorted === Seq("0", "1", "2", "3"))
    // corrupt everything outside [200, 300): equality + range queries
    // scoped there must still answer
    entries.filterNot(_.name.startsWith("k_trunc=2/")).foreach(e =>
      java.nio.file.Files.write(new java.io.File(dir, e.name).toPath,
        "corrupt".getBytes("UTF-8")))
    assert(read(dir).filter(col("k") === 250L).count() === 1L)
    assert(read(dir).filter(col("k") >= 210L && col("k") < 260L)
      .count() === 50L)
    intercept[Exception](read(dir).select("k", "v").collect())
  }

  test("CREATE TABLE PARTITIONED BY (days(ts)) declares through the " +
      "GDX catalog; SQL range queries prune; SPJ stands down") {
    // Spark's session catalog only converts identity/bucket transforms
    // to its v1 partitioning — arbitrary transforms need a real
    // TableCatalog, so the SQL front door for days()/truncate() is the
    // GDX catalog plugin (the path API takes option("partitionBy"))
    val wh = java.nio.file.Files.createTempDirectory("gdxtp_cat").toString
    val cat = s"gtpc${java.util.UUID.randomUUID().toString.take(8)}"
    val s = Sessions.pinned(spark,
      s"spark.sql.catalog.$cat" -> "graft.sources.GdxCatalog",
      s"spark.sql.catalog.$cat.warehouse" -> wh)
    s.sql(s"CREATE NAMESPACE $cat.lab")
    s.sql(s"""CREATE TABLE $cat.lab.days_t (k BIGINT, ts BIGINT,
      v STRING) PARTITIONED BY (days(ts))""")
    val dir = s"$wh/lab/days_t"
    s.sql(s"""INSERT INTO $cat.lab.days_t SELECT id, ${20000L * Day} +
      id * ${Day / 10}, concat('r', id) FROM range(0, 50)""")
    assert(GdxSource.committedPartitionCol(dir, GdxSource.driverConf())
      .contains("days(ts)"))
    // 50 rows at Day/10 spacing span days 20000-20004
    val hi = 20000L * Day + 3 * Day
    val n = s.sql(s"""SELECT count(*) FROM $cat.lab.days_t
      WHERE ts >= ${20000L * Day + Day} AND ts < $hi""")
      .head.getLong(0)
    assert(n === 20L)
    // the declared transform round-trips through the table's reported
    // partitioning (days, not a false identity claim)
    val t = new graft.sources.GdxTable(dir,
      GdxSource.committedSchema(dir, GdxSource.driverConf()),
      declaredPartition = Some("days(ts)"))
    assert(t.partitioning().map(_.name).toSeq === Seq("days"))
    // a self-join under the SPJ switch must stay CORRECT (the scan
    // refuses KeyGroupedPartitioning for a days layout — grouping by
    // day is NOT grouping by ts, so it stands down to a shuffle)
    val spj = Sessions.pinned(s,
      "spark.sql.sources.v2.bucketing.enabled" -> "true")
    val joined = spj.sql(s"""SELECT count(*) FROM $cat.lab.days_t a
      JOIN $cat.lab.days_t b ON a.ts = b.ts""").head.getLong(0)
    assert(joined === 50L)
  }

  test("NULL partition values land in __null__ and survive pruning; " +
      "layout contradictions refuse") {
    import spark.implicits._
    val dir = freshDir("null")
    Seq((1L, Some(20000L * Day + 5L), "a"), (2L, None, "b"))
      .toDF("k", "ts", "v").coalesce(1)
      .write.format(fmt).option("path", dir)
      .option("partitionBy", "days(ts)").mode("overwrite").save()
    val entries = GdxSource.committedEntries(dir, GdxSource.driverConf())
    assert(entries.exists(_.name.startsWith("ts_day=__null__/")),
      entries.map(_.name).toString)
    // a range query must still SEE the null-day file (kept, filtered
    // row-level) and return only the real match
    assert(read(dir).filter(col("ts") >= 20000L * Day).count() === 1L)
    // an append declaring a DIFFERENT layout refuses
    val e = intercept[Exception] {
      Seq((3L, 1L, "c")).toDF("k", "ts", "v").coalesce(1)
        .write.format(fmt).option("path", dir)
        .option("partitionBy", "trunc(1000,ts)").mode("append").save()
    }
    assert(e.getMessage.contains("contradicts"), e.getMessage)
  }

  test("hours(ts) on a real TIMESTAMP column: micros-scaled keys, " +
      "typed-literal pruning proven by corrupted out-of-window files") {
    import spark.implicits._
    val dir = freshDir("hours")
    // 8 hours × 5 rows on a TIMESTAMP column
    val base = java.sql.Timestamp.valueOf("2025-03-01 00:00:00")
    val rows = for (h <- 0 until 8; i <- 0 until 5)
      yield (h * 5L + i,
        new java.sql.Timestamp(base.getTime + h * 3600000L + i * 1000L),
        s"h$h-$i")
    rows.toDF("k", "ts", "v").repartition(3)
      .write.format(fmt).option("path", dir)
      .option("partitionBy", "hours(ts)").mode("overwrite").save()
    val entries = GdxSource.committedEntries(dir, GdxSource.driverConf())
    assert(entries.nonEmpty &&
      entries.forall(_.name.matches("ts_hour=\\d+/.*")),
      entries.map(_.name).toString)
    // the directory key is the MICROS hour ordinal (the column's
    // canonical repr), never the millis one
    val expectHour = base.getTime * 1000L / GdxSource.HourMicros
    assert(entries.exists(_.name.startsWith(s"ts_hour=$expectHour/")),
      s"expected hour $expectHour in ${entries.map(_.name)}")
    // corrupt everything outside hours 2-3: a typed-literal window
    // query must never open those directories
    entries.filterNot { e =>
      val h = e.name.substring("ts_hour=".length,
        e.name.indexOf('/')).toLong - expectHour
      h >= 2 && h <= 3
    }.foreach(e => java.nio.file.Files.write(
      new java.io.File(dir, e.name).toPath, "CORRUPT".getBytes))
    val got = read(dir)
      .filter(col("ts") >= lit(new java.sql.Timestamp(
        base.getTime + 2 * 3600000L)) &&
        col("ts") < lit(new java.sql.Timestamp(
          base.getTime + 4 * 3600000L)))
      .count()
    assert(got === 10L)
  }

  test("months/years on DATE and the BIGINT epoch-millis back-compat " +
      "all key and prune correctly") {
    import spark.implicits._
    // months(DATE): calendar keys
    val mDir = freshDir("months")
    val days = Seq("2023-11-15", "2023-12-01", "2024-01-10", "2024-02-20")
    days.zipWithIndex.map { case (s0, i) =>
      (i.toLong, java.sql.Date.valueOf(s0), s0)
    }.toDF("k", "dt", "v").coalesce(1)
      .write.format(fmt).option("path", mDir)
      .option("partitionBy", "months(dt)").mode("overwrite").save()
    val mEntries = GdxSource.committedEntries(mDir, GdxSource.driverConf())
    // 2023-11 -> 2023*12+10 = 24286
    assert(mEntries.exists(_.name.startsWith("dt_month=24286/")),
      mEntries.map(_.name).toString)
    assert(mEntries.map(_.name.takeWhile(_ != '/')).distinct.size === 4)
    assert(read(mDir)
      .filter(col("dt") >= lit(java.sql.Date.valueOf("2024-01-01")))
      .count() === 2L)
    // years(DATE)
    val yDir = freshDir("years")
    days.zipWithIndex.map { case (s0, i) =>
      (i.toLong, java.sql.Date.valueOf(s0), s0)
    }.toDF("k", "dt", "v").coalesce(1)
      .write.format(fmt).option("path", yDir)
      .option("partitionBy", "years(dt)").mode("overwrite").save()
    val yKeys = GdxSource.committedEntries(yDir, GdxSource.driverConf())
      .map(_.name.takeWhile(_ != '/')).distinct.sorted
    assert(yKeys === Seq("dt_year=2023", "dt_year=2024"), yKeys.toString)
    // BIGINT epoch-millis back-compat: hours/months on a LONG column
    // keep the historical millis divisors
    val lDir = freshDir("longms")
    Seq((1L, 20000L * Day + 3 * GdxSource.HourMillis, "a"))
      .toDF("k", "ts", "v").coalesce(1)
      .write.format(fmt).option("path", lDir)
      .option("partitionBy", "hours(ts)").mode("overwrite").save()
    val lKey = 20000L * 24 + 3
    assert(GdxSource.committedEntries(lDir, GdxSource.driverConf())
      .forall(_.name.startsWith(s"ts_hour=$lKey/")))
  }

  test("hours(DATE) refuses loudly; evolvePartitionSpec validates the " +
      "new transforms; catalog DDL accepts PARTITIONED BY (hours(ts))") {
    import spark.implicits._
    val dir = freshDir("refuse")
    val e = intercept[Exception] {
      Seq((1L, java.sql.Date.valueOf("2024-01-01"), "a"))
        .toDF("k", "dt", "v").coalesce(1)
        .write.format(fmt).option("path", dir)
        .option("partitionBy", "hours(dt)").mode("overwrite").save()
    }
    assert(e.getMessage.contains("BIGINT or TIMESTAMP"), e.getMessage)
    // evolve a days(BIGINT) table to months(BIGINT): one metadata
    // commit, era-correct layouts
    val eDir = freshDir("evolve")
    Seq((1L, 20000L * Day + 5L, "a")).toDF("k", "ts", "v").coalesce(1)
      .write.format(fmt).option("path", eDir)
      .option("partitionBy", "days(ts)").mode("overwrite").save()
    GdxSource.evolvePartitionSpec(eDir, "months(ts)")
    Seq((2L, 20030L * Day + 5L, "b")).toDF("k", "ts", "v").coalesce(1)
      .write.format(fmt).option("path", eDir).mode("append").save()
    val names = GdxSource.committedEntries(eDir, GdxSource.driverConf())
      .map(_.name)
    assert(names.exists(_.startsWith("ts_day=")) &&
      names.exists(_.startsWith("ts_month=")), names.toString)
    assert(read(eDir).count() === 2L)
    // catalog DDL with a TIMESTAMP hours transform
    val wh = java.nio.file.Files.createTempDirectory("gdxtp_wh").toString
    val c = Sessions.pinned(spark,
      "spark.sql.catalog.gdxtph" -> "graft.sources.GdxCatalog",
      "spark.sql.catalog.gdxtph.warehouse" -> wh)
    c.sql("CREATE NAMESPACE gdxtph.lab")
    c.sql("CREATE TABLE gdxtph.lab.h (k BIGINT, ts TIMESTAMP, v STRING) " +
      "PARTITIONED BY (hours(ts))")
    Sessions.insertInto(c,
      Seq((1L, java.sql.Timestamp.valueOf("2025-03-01 07:30:00"), "x"))
        .toDF("k", "ts", "v"), "gdxtph.lab.h")
    assert(c.sql("SELECT count(*) FROM gdxtph.lab.h").head.getLong(0)
      === 1L)
    assert(GdxSource.committedEntries(s"$wh/lab/h",
      GdxSource.driverConf()).forall(_.name.startsWith("ts_hour=")))
  }
}
