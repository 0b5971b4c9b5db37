package graft

import org.apache.spark.sql.functions._
import graft.sources.GdxSource

/** Partition-spec evolution on the GDX format
  * (sources/GdxSource.evolvePartitionSpec): one metadata commit
  * changes the layout for FUTURE writes, former specs ride the
  * `#partition cur;former` history tail, each era's files keep
  * pruning under their own transform, and the consumers that need
  * one directory key = one meaning (SPJ, grouped metadata
  * aggregates, replaceWhere / OPTIMIZE WHERE) stand down exactly
  * when a former spec collides with the current directory key. */
class GdxPartEvolutionSpec extends SparkSuite {

  private val fmt = "graft.sources.GdxSource"
  private def freshDir(tag: String): String =
    java.nio.file.Files.createTempDirectory(s"gdxpe_$tag").toString + "/t"
  private def read(dir: String) =
    spark.read.format(fmt).option("path", dir).load()
  private def conf = GdxSource.driverConf()
  private val Day = GdxSource.DayMillis

  /** identity(p) era-1 + days(ts) era-2 over disjoint key ranges. */
  private def mixedTable(tag: String): String = {
    import spark.implicits._
    val dir = freshDir(tag)
    val era1 = for (p <- 0 until 4; i <- 0 until 10)
      yield (p * 10L + i, 20000L * Day + (i % 3) * Day + i, p.toLong, s"a$i")
    era1.toDF("k", "ts", "p", "v").repartition(4)
      .write.format(fmt).option("path", dir)
      .option("partitionBy", "p").mode("overwrite").save()
    GdxSource.evolvePartitionSpec(dir, "days(ts)")
    val era2 = for (d <- 0 until 6; i <- 0 until 5)
      yield (1000L + d * 5 + i, 20000L * Day + d * Day + i, (d % 4).toLong,
        s"b$i")
    era2.toDF("k", "ts", "p", "v").repartition(4)
      .write.format(fmt).option("path", dir).mode("append").save()
    dir
  }

  test("evolution is a metadata-only commit; each era demuxes under " +
      "its own layout; reads span both") {
    val dir = mixedTable("mix")
    // the evolution commit itself copied the file set verbatim
    val v = GdxSource.listVersions(dir, conf).max
    val preEvolve = GdxSource.committedEntries(dir, conf, v - 2)
    val atEvolve = GdxSource.committedEntries(dir, conf, v - 1)
    assert(preEvolve.map(_.name).sorted === atEvolve.map(_.name).sorted)
    assert(GdxSource.committedPartitionCol(dir, conf, v - 1)
      .contains("days(ts);p"))
    // era-1 files stay in p=, era-2 landed in ts_day=
    val entries = GdxSource.committedEntries(dir, conf)
    val era1 = entries.filter(_.name.startsWith("p="))
    val era2 = entries.filter(_.name.startsWith("ts_day="))
    assert(era1.nonEmpty && era2.nonEmpty &&
      era1.size + era2.size === entries.size, entries.map(_.name).toString)
    assert(read(dir).count() === 70L)
    // time travel to the pre-evolution snapshot sees its own header
    assert(GdxSource.committedPartitionCol(dir, conf, v - 2).contains("p"))
    assert(spark.read.format(fmt).option("path", dir)
      .option("version", (v - 2).toString).load().count() === 40L)
  }

  test("old era prunes under its former spec, new era under the " +
      "current one - proven with corrupted files") {
    val dir = mixedTable("prune")
    val entries = GdxSource.committedEntries(dir, conf)
    // query: ts in days [1, 3) — era-2 directories outside those days
    // are never planned even though the CURRENT layout is only part of
    // the story; era-1 files cannot prove a day and stay planned
    val lo = 20000L * Day + 1 * Day
    val hi = 20000L * Day + 3 * Day
    entries.filter(e => GdxSource.partKeyOf("days(ts)", e.name)
        .flatten.exists(d => d < 20001L || d > 20003L))
      .foreach(e => java.nio.file.Files.write(
        new java.io.File(dir, e.name).toPath,
        "corrupt".getBytes("UTF-8")))
    // era-1: i%3 ∈ {1,2} → 2 of 3 day-values per p-dir ⇒ rows with
    // i ∈ {1,2,4,5,7,8} (24 rows); era-2: days 1-2 × 5 rows = 10
    assert(read(dir).filter(col("ts") >= lo && col("ts") < hi)
      .count() === 34L)
    // and the former identity(p) spec still prunes ITS era: zone maps
    // collapse p to v..v per p= file, so corrupting every p≠2 era-1
    // file must not break a p = 2 query (era-2 files hold mixed p and
    // stay planned - fresh table to keep them clean)
    val dir2 = mixedTable("prune2")
    GdxSource.committedEntries(dir2, conf)
      .filter(e => GdxSource.partKeyOf("p", e.name)
        .flatten.exists(_ != 2L))
      .foreach(e => java.nio.file.Files.write(
        new java.io.File(dir2, e.name).toPath,
        "corrupt".getBytes("UTF-8")))
    // era-1: the p=2 directory's 10 rows; era-2: d%4==2 → d=2 → 5 rows
    assert(read(dir2).filter(col("p") === 2L).count() === 15L)
  }

  test("bucket width change is DIRECTORY-KEY AMBIGUOUS: pruning, SPJ " +
      "and grouped metadata aggregates stand down but stay correct") {
    import spark.implicits._
    val dir = freshDir("buck")
    (0L until 40L).map(k => (k, s"v$k")).toDF("k", "v").repartition(4)
      .write.format(fmt).option("path", dir)
      .option("partitionBy", "bucket(4,k)").mode("overwrite").save()
    GdxSource.evolvePartitionSpec(dir, "bucket(8,k)")
    (40L until 80L).map(k => (k, s"v$k")).toDF("k", "v").repartition(4)
      .write.format(fmt).option("path", dir).mode("append").save()
    val raw = GdxSource.committedPartitionCol(dir, conf).get
    assert(raw === "bucket(8,k);bucket(4,k)")
    assert(GdxSource.partDirAmbiguous(raw))
    // every k_bucket= key now means two things — equality reads must
    // NOT bucket-prune (all files planned, rows filtered row-level)
    for (k <- Seq(0L, 17L, 39L, 40L, 63L, 79L))
      assert(read(dir).filter(col("k") === k).count() === 1L, s"k=$k")
    // SPJ must stand down (a grouped claim would co-schedule wrong
    // rows) while the join stays correct
    val spj = Sessions.pinned(spark,
      "spark.sql.sources.v2.bucketing.enabled" -> "true")
    val t = spj.read.format(fmt).option("path", dir).load()
    assert(t.as("a").join(t.as("b"), "k").count() === 80L)
    // grouped-by-partition metadata aggregate: bucket heads never
    // grouped by a column name, and the ungrouped COUNT(*) stays
    // manifest-exact
    assert(read(dir).count() === 80L)
    // a full OPTIMIZE on an ALREADY-COMPACT evolved table must still
    // rewrite: it is the advertised remedy for the ambiguity, so the
    // at-target short-circuit cannot leave the history tail in place
    GdxSource.compact(spark, dir, target = 32)
    assert(GdxSource.committedPartitionCol(dir, conf)
      .contains("bucket(8,k)"))
    assert(!GdxSource.partDirAmbiguous(
      GdxSource.committedPartitionCol(dir, conf).get))
    assert(read(dir).count() === 80L)
  }

  test("replaceWhere and OPTIMIZE WHERE refuse on a mixed table; a " +
      "full OPTIMIZE materializes the layout and clears the history") {
    import spark.implicits._
    val dir = freshDir("mat")
    (0L until 40L).map(k => (k, k % 4, s"v$k")).toDF("k", "p", "v")
      .repartition(2).write.format(fmt).option("path", dir)
      .option("partitionBy", "trunc(10,k)").mode("overwrite").save()
    GdxSource.evolvePartitionSpec(dir, "p")
    // two appends so the p=1 slice is fragmented (2 files) and the
    // partial-compaction no-op check cannot short-circuit the contract
    (40L until 60L).map(k => (k, k % 4, s"v$k")).toDF("k", "p", "v")
      .repartition(2).write.format(fmt).option("path", dir)
      .mode("append").save()
    (60L until 80L).map(k => (k, k % 4, s"v$k")).toDF("k", "p", "v")
      .repartition(2).write.format(fmt).option("path", dir)
      .mode("append").save()
    // the mixed snapshot has era-1 (k_trunc) files that cannot prove
    // a p key — the slice contract refuses loudly instead of losing
    // their p-matching rows
    val e = intercept[Exception] {
      Seq((5L, 1L, "x")).toDF("k", "p", "v").coalesce(1)
        .write.format(fmt).option("path", dir)
        .option("replaceWhere", "p IN (1)").mode("overwrite").save()
    }
    assert(e.getMessage.contains("replaceWhere"), e.getMessage)
    intercept[Exception] {
      GdxSource.compactWhere(spark, dir, "p = 1")
    }
    // full OPTIMIZE: everything lands under the CURRENT identity
    // layout and the history tail is gone — the migration materialized
    GdxSource.compact(spark, dir, target = 4)
    val raw = GdxSource.committedPartitionCol(dir, conf).get
    assert(raw === "p", raw)
    assert(GdxSource.committedEntries(dir, conf)
      .forall(_.name.matches("p=\\d+/.*")))
    assert(read(dir).count() === 80L)
    // ...and the slice machinery works again on the clean layout
    val (b, a) = GdxSource.compactWhere(spark, dir, "p = 1")
    assert(b >= 0 && a >= 0)
  }

  test("dropping a FORMER spec's column strips it from the history; " +
      "the current spec's column stays protected") {
    import spark.implicits._
    val dir = freshDir("drop")
    // p and ts sit BEHIND the classic (k, v) core slots — slots 0/1
    // are never renamable/droppable regardless of partitioning
    (0L until 20L).map(k => (k, s"v$k", k % 4, 20000L * Day + k))
      .toDF("k", "v", "p", "ts").coalesce(2)
      .write.format(fmt).option("path", dir)
      .option("partitionBy", "p").mode("overwrite").save()
    GdxSource.evolvePartitionSpec(dir, "days(ts)")
    assert(GdxSource.committedPartitionCol(dir, conf)
      .contains("days(ts);p"))
    // current spec column: refused like Delta
    val e = intercept[Exception] {
      GdxSource.dropColumn(spark, dir, "ts")
    }
    assert(e.getMessage.contains("partition column"), e.getMessage)
    // former spec column: the drop succeeds and takes the dead spec
    // out of the tail (its files stop pruning - absence is safe)
    GdxSource.dropColumn(spark, dir, "p")
    assert(GdxSource.committedPartitionCol(dir, conf)
      .contains("days(ts)"))
    assert(read(dir).count() === 20L)
  }

  test("SQL front door: ALTER TABLE ... SET PARTITION SPEC evolves a " +
      "catalog table; partitionBy write options refuse histories and " +
      "contradictions") {
    import spark.implicits._
    // the ALTER ... SET PARTITION SPEC statement lives in the injected
    // parser — parser extension points bind at session construction
    val wh = java.nio.file.Files.createTempDirectory("gdxpe_cat").toString
    val cat = s"gpec${java.util.UUID.randomUUID().toString.take(8)}"
    val s = org.apache.spark.sql.graft.ColumnBridge
      .sessionWithExtensions(spark, new GraftExtensions())
    s.conf.set(s"spark.sql.catalog.$cat", "graft.sources.GdxCatalog")
    s.conf.set(s"spark.sql.catalog.$cat.warehouse", wh)
    s.sql(s"CREATE NAMESPACE $cat.lab")
    s.sql(s"""CREATE TABLE $cat.lab.ev (k BIGINT, ts BIGINT, v STRING)
      PARTITIONED BY (k)""")
    s.sql(s"""INSERT INTO $cat.lab.ev SELECT id % 4, ${20000L * Day} +
      id * ${Day / 10}, concat('r', id) FROM range(0, 40)""")
    val dir = s"$wh/lab/ev"
    val v = s.sql(
      s"ALTER TABLE $cat.lab.ev SET PARTITION SPEC (days(ts))")
      .head.getLong(0)
    assert(v > 0)
    assert(GdxSource.committedPartitionCol(dir, conf)
      .contains("days(ts);k"))
    s.sql(s"""INSERT INTO $cat.lab.ev SELECT 100 + id, ${20000L * Day} +
      id * ${Day / 10}, concat('n', id) FROM range(0, 10)""")
    assert(s.sql(s"SELECT count(*) FROM $cat.lab.ev").head.getLong(0)
      === 50L)
    // a write option can neither declare a history nor contradict the
    // evolved layout
    val e1 = intercept[Exception] {
      Seq((1L, 1L, "x")).toDF("k", "ts", "v").coalesce(1)
        .write.format(fmt).option("path", dir)
        .option("partitionBy", "days(ts);k").mode("append").save()
    }
    assert(e1.getMessage.contains("ONE spec"), e1.getMessage)
    val e2 = intercept[Exception] {
      Seq((1L, 1L, "x")).toDF("k", "ts", "v").coalesce(1)
        .write.format(fmt).option("path", dir)
        .option("partitionBy", "k").mode("append").save()
    }
    assert(e2.getMessage.contains("contradicts"), e2.getMessage)
    // evolving BACK promotes the former spec out of the tail
    GdxSource.evolvePartitionSpec(dir, "k")
    assert(GdxSource.committedPartitionCol(dir, conf)
      .contains("k;days(ts)"))
  }
}
