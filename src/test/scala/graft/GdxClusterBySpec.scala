package graft

import org.apache.spark.sql.functions._
import graft.sources.{GdxFileEntry, GdxFileStats, GdxSource}

/** Declared clustering columns (`ALTER TABLE ... CLUSTER BY`): a layout
  * preference stored in the `_cluster` sidecar — every INSERT-path
  * write asks the planner for a range exchange + sort on the columns
  * (zone-map ranges come out narrow write by write), a bare OPTIMIZE
  * re-clusters history, and zero-row files never survive planning. */
class GdxClusterBySpec extends SparkSuite {
  import spark.implicits._

  private val fmt = "graft.sources.GdxSource"
  private def freshDir(tag: String): String =
    java.nio.file.Files.createTempDirectory(s"gdxcl_$tag").toString + "/t"
  private def conf = GdxSource.driverConf()

  private def scattered(n: Int) =
    spark.range(n.toLong).select(col("id").as("k"),
      ((col("id") * 7919L) % 1000L).cast("double").as("w"),
      lit("x").as("v")).repartition(8)

  test("clustered writes produce range-prunable files; the control " +
      "without the declaration does not") {
    val dir = freshDir("cl"); val ctl = freshDir("ctl")
    val cw = Sessions.pinned(spark,
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "8192",
      "spark.sql.adaptive.coalescePartitions.minPartitionSize" -> "4096")
    scattered(4000).limit(0).write.format(fmt).option("path", dir)
      .mode("overwrite").save()
    GdxSource.setClusterBy(dir, Seq("w"))
    assert(GdxSource.clusterByOf(dir, conf) === Seq("w"))
    Sessions.rebind(scattered(4000), cw).write.format(fmt)
      .option("path", dir).mode("append").save()
    scattered(4000).write.format(fmt).option("path", ctl)
      .mode("overwrite").save()
    val band = Seq(
      org.apache.spark.sql.sources.GreaterThanOrEqual("w", 100.0: Any),
      org.apache.spark.sql.sources.LessThan("w", 200.0: Any))
    val (kept, all) = GdxSource.plannedFiles(dir, band)
    val (ck, ca) = GdxSource.plannedFiles(ctl, band)
    assert(all >= 3, s"expected several clustered files, got $all")
    assert(kept * 2 < all, s"clustered kept $kept of $all")
    assert(ck === ca, "value-scattered control must keep every file")
    // rows identical either way
    assert(spark.read.format(fmt).option("path", dir).load().count()
      === spark.read.format(fmt).option("path", ctl).load().count())
  }

  test("bare OPTIMIZE under a declaration re-clusters history; " +
      "CLUSTER BY NONE clears it; refusals are loud") {
    val dir = freshDir("opt")
    scattered(2000).write.format(fmt).option("path", dir)
      .mode("overwrite").save() // unclustered history
    GdxSource.setClusterBy(dir, Seq("w"))
    val s = org.apache.spark.sql.graft.ColumnBridge
      .sessionWithExtensions(spark, new GraftExtensions())
    val tbl = "gdxcl_" +
      java.util.UUID.randomUUID.toString.replace("-", "").take(8)
    s.sql(s"""CREATE TABLE $tbl (k BIGINT, w DOUBLE, v STRING)
      USING $fmt OPTIONS (path '$dir')""")
    try {
      s.sql(s"OPTIMIZE $tbl")
      val band = Seq(
        org.apache.spark.sql.sources.LessThan("w", 100.0: Any))
      val (kept, all) = GdxSource.plannedFiles(dir, band)
      assert(all > 1 && kept < all,
        s"re-clustered table must prune ($kept/$all)")
      s.sql(s"ALTER TABLE $tbl CLUSTER BY NONE")
      assert(GdxSource.clusterByOf(dir, conf).isEmpty)
      s.sql(s"ALTER TABLE $tbl CLUSTER BY (w)")
      assert(GdxSource.clusterByOf(dir, conf) === Seq("w"))
    } finally s.sql(s"DROP TABLE IF EXISTS $tbl")
    intercept[IllegalArgumentException](
      GdxSource.setClusterBy(dir, Seq("nope")))
    intercept[IllegalArgumentException](
      GdxSource.setClusterBy(dir, Seq("v"))) // string: no zone-map lane
    // a partitioned table refuses the declaration loudly (its writes
    // already demux by the partition spec — never a silent no-op)
    val pdir = freshDir("part")
    scattered(100).write.format(fmt).option("path", pdir)
      .option("partitionBy", "k").mode("overwrite").save()
    intercept[IllegalArgumentException](
      GdxSource.setClusterBy(pdir, Seq("w")))
  }

  test("schema DDL keeps the _cluster sidecar honest: rename carries, " +
      "drop clears, partition-spec evolution voids, stale registry " +
      "degrades bare OPTIMIZE to compaction") {
    val dir = freshDir("ddl")
    scattered(200).write.format(fmt).option("path", dir)
      .mode("overwrite").save()
    // cluster on an EVOLVED column (core slots 0/1 are not renameable)
    GdxSource.addColumn(dir, "s",
      org.apache.spark.sql.types.DoubleType)
    GdxSource.setClusterBy(dir, Seq("s"))
    // rename carries the declaration to the new name
    GdxSource.renameColumn(spark, dir, "s", "weight")
    assert(GdxSource.clusterByOf(dir, conf) === Seq("weight"))
    assert(GdxSource.effectiveClusterBy(dir, conf) === Seq("weight"))
    // drop removes the column; nothing left -> sidecar gone
    GdxSource.dropColumn(spark, dir, "weight")
    assert(GdxSource.clusterByOf(dir, conf).isEmpty)
    // a stale sidecar (e.g. restored from backup naming a dead column)
    // must degrade bare OPTIMIZE to plain compaction, not fail
    val fs = new org.apache.hadoop.fs.Path(dir).getFileSystem(conf)
    val out = fs.create(
      new org.apache.hadoop.fs.Path(dir, "_cluster"), true)
    out.write("ghost_column\n".getBytes("UTF-8")); out.close()
    assert(GdxSource.clusterByOf(dir, conf) === Seq("ghost_column"))
    assert(GdxSource.effectiveClusterBy(dir, conf).isEmpty)
    val s = org.apache.spark.sql.graft.ColumnBridge
      .sessionWithExtensions(spark, new GraftExtensions())
    val tbl = "gdxcl_" +
      java.util.UUID.randomUUID.toString.replace("-", "").take(8)
    s.sql(s"""CREATE TABLE $tbl (k BIGINT, w DOUBLE, v STRING)
      USING $fmt OPTIONS (path '$dir')""")
    try {
      s.sql(s"OPTIMIZE $tbl") // compaction path: must not throw
      assert(s.table(tbl).count() === 200L)
    } finally s.sql(s"DROP TABLE IF EXISTS $tbl")
    // CLUSTER BY then a later partition spec: the evolution clears
    // the declaration (the reverse order is refused by setClusterBy)
    val dir2 = freshDir("ddl2")
    scattered(100).write.format(fmt).option("path", dir2)
      .mode("overwrite").save()
    GdxSource.setClusterBy(dir2, Seq("w"))
    GdxSource.evolvePartitionSpec(dir2, "k")
    assert(GdxSource.clusterByOf(dir2, conf).isEmpty)
  }

  test("incremental recluster: a second OPTIMIZE after one clean pass " +
      "+ one small append rewrites only the overlap, carrying the " +
      "clean files by reference") {
    val dir = freshDir("inc")
    scattered(4000).write.format(fmt).option("path", dir)
      .mode("overwrite").save()
    GdxSource.setClusterBy(dir, Seq("w"))
    // first pass: everything overlaps (scattered) → full rewrite
    val (b1, a1) = GdxSource.optimizeClustered(spark, dir, Seq("w"), 8)
    assert(a1 <= 8 && b1 >= a1)
    val clean = GdxSource.committedEntries(dir, conf).map(_.name).toSet
    // already clustered: a repeat pass is a provable NO-OP
    val (b2, a2) = GdxSource.optimizeClustered(spark, dir, Seq("w"), 8)
    assert((b2, a2) === (a1, a1), "clean layout must not rewrite")
    assert(GdxSource.committedEntries(dir, conf).map(_.name).toSet
      === clean)
    // one NARROW append overlapping (at most) one clean file's range
    spark.range(50).select((col("id") + 100000L).as("k"),
      (col("id") % 5L + 100L).cast("double").as("w"),
      lit("x").as("v")).coalesce(1)
      .write.format(fmt).option("path", dir).mode("append").save()
    val (b3, a3) = GdxSource.optimizeClustered(spark, dir, Seq("w"), 8)
    assert(b3 === a1 + 1)
    val after = GdxSource.committedEntries(dir, conf).map(_.name).toSet
    val untouched = clean.intersect(after)
    // the delta recluster carries ≥ all-but-one clean file untouched
    assert(untouched.size >= clean.size - 1,
      s"expected ≥${clean.size - 1} carried files, got ${untouched.size}")
    assert(a3 <= b3)
    // layout invariant: after the pass every file's w-range is
    // disjoint again (a band predicate keeps pruning)
    val band = Seq(
      org.apache.spark.sql.sources.GreaterThanOrEqual("w", 500.0: Any),
      org.apache.spark.sql.sources.LessThan("w", 600.0: Any))
    val (kept, all) = GdxSource.plannedFiles(dir, band)
    assert(kept * 2 < all, s"clustered layout must prune ($kept/$all)")
    // rows survive every pass
    assert(spark.read.format(fmt).option("path", dir).load().count()
      === 4050L)
  }

  test("recluster converges with all-NULL cluster cells: rangeless " +
      "files merge once, then a lone one is carried as steady state") {
    val dir = freshDir("nulls")
    scattered(1000).write.format(fmt).option("path", dir)
      .mode("overwrite").save()
    GdxSource.setClusterBy(dir, Seq("w"))
    GdxSource.optimizeClustered(spark, dir, Seq("w"), 4) // clean pass
    // three appends whose w is entirely NULL: no zone-map lane entry
    (1 to 3).foreach { i =>
      spark.range(1).select((col("id") + 50000L * i).as("k"),
        lit(null).cast("double").as("w"), lit("n").as("v")).coalesce(1)
        .write.format(fmt).option("path", dir).mode("append").save()
    }
    val n0 = GdxSource.committedEntries(dir, conf).size
    val (b1, a1) = GdxSource.optimizeClustered(spark, dir, Seq("w"), 4)
    assert(b1 === n0 && a1 < n0, "the null tail must merge")
    // steady state: ONE rangeless file carried, repeat is a no-op
    val (b2, a2) = GdxSource.optimizeClustered(spark, dir, Seq("w"), 4)
    assert((b2, a2) === (a1, a1),
      s"lone rangeless file must not retrigger rewrites ($b2 -> $a2)")
    assert(spark.read.format(fmt).option("path", dir).load().count()
      === 1003L)
    assert(spark.read.format(fmt).option("path", dir).load()
      .filter(col("w").isNull).count() === 3L)
  }

  test("two-column CLUSTER BY: a full pass converges to non-" +
      "interleaved trailing ranges, the incremental pass doesn't undo " +
      "it, and DESCRIBE DETAIL counts the interleave") {
    val dir = freshDir("twocol")
    // a = coarse group (4 values), b = fine; scattered across files
    def rows(offset: Long, n: Long) =
      spark.range(n).select((col("id") + offset).as("k"),
        ((col("id") + offset) % 4L).as("a"),
        (((col("id") + offset) * 7919L) % 1000L).as("b"))
    rows(0L, 4000L).repartition(8)
      .write.format(fmt).option("path", dir).mode("overwrite").save()
    GdxSource.setClusterBy(dir, Seq("a", "b"))
    def closure = GdxSource.clusterOverlapClosure(
      GdxSource.committedEntries(dir, conf), Seq("a", "b"))
    assert(closure.nonEmpty, "scattered layout must interleave")
    GdxSource.optimizeClustered(spark, dir, Seq("a", "b"), 8)
    // lexicographic convergence: NO two files interleave on (a, b) —
    // in particular, files sharing an `a` value have non-interleaved
    // b ranges (the trailing-column quality the full pass must buy)
    assert(closure.isEmpty,
      "full pass must converge to lex-disjoint (a,b) ranges")
    val clean = GdxSource.committedEntries(dir, conf).map(_.name).toSet
    // the incremental pass must not undo it: append a NARROW (a,b)
    // block (one a value, a small b band), re-OPTIMIZE, and the
    // layout is lex-disjoint again with the clean tail carried
    spark.range(64).select((col("id") + 100000L).as("k"),
      lit(1L).as("a"), (col("id") % 16L + 100L).as("b")).coalesce(1)
      .write.format(fmt).option("path", dir).mode("append").save()
    assert(closure.nonEmpty, "the append must interleave somewhere")
    // observability: DESCRIBE DETAIL's counter = the closure size
    val detail = GdxSource.describeDetail(spark, dir).head
    assert(detail.getLong(detail.fieldIndex("cluster_interleaved_files"))
      === closure.size.toLong)
    GdxSource.optimizeClustered(spark, dir, Seq("a", "b"), 8)
    // convergence: the pass restores provably lex-disjoint ranges (a
    // 4-value leading column chains head-straddling files, so THIS
    // incremental pass legitimately escalates toward a full rewrite —
    // exactness over delta size; the single-column test above pins the
    // delta-carry behavior of the realistic near-unique-head case)
    assert(closure.isEmpty,
      "incremental pass must restore lex-disjoint ranges")
    val d2 = GdxSource.describeDetail(spark, dir).head
    assert(d2.getLong(d2.fieldIndex("cluster_interleaved_files")) === 0L)
    // steady state: the follow-up pass is a provable no-op (the
    // generation provenance proves the rewrite's own outputs clean
    // even where their boxes straddle a head value)
    val stable = GdxSource.committedEntries(dir, conf).map(_.name).toSet
    val (b2, a2) = GdxSource.optimizeClustered(spark, dir,
      Seq("a", "b"), 8)
    assert(b2 === a2)
    assert(GdxSource.committedEntries(dir, conf).map(_.name).toSet
      === stable)
    assert(spark.read.format(fmt).option("path", dir).load().count()
      === 4064L)
    assert(clean.nonEmpty) // silence the unused-val lint honestly
  }

  test("lexicographic-prefix cleanliness proof: head-boundary files " +
      "with disjoint trailing ranges are provably clean; overlapping " +
      "or unprovable trailing ranges co-rewrite") {
    def entry(name: String, a: (String, String),
              b: Option[(String, String)]): GdxFileEntry =
      GdxFileEntry(name, Some(GdxFileStats(10L, 0L, 9L,
        Map("a" -> a) ++ b.map("b" -> _).toMap)), None)
    val by = Seq("a", "b")
    // touch at head=5 with DISJOINT b there → finer than head-only:
    // provably clean, nothing to rewrite
    assert(GdxSource.clusterOverlapClosure(Seq(
      entry("f1", ("1", "5"), Some(("0", "9"))),
      entry("f2", ("5", "9"), Some(("20", "30")))), by).isEmpty)
    // touch at head=5 with OVERLAPPING b → both co-rewrite
    assert(GdxSource.clusterOverlapClosure(Seq(
      entry("f1", ("1", "5"), Some(("0", "9"))),
      entry("f2", ("5", "9"), Some(("5", "8")))), by)
      .map(_.name).sorted === Seq("f1", "f2"))
    // a truncated trailing range is ±∞ — conservative merge
    assert(GdxSource.clusterOverlapClosure(Seq(
      entry("f1", ("1", "5"), Some(("0", "9"))),
      entry("f2", ("5", "9"), None)), by)
      .map(_.name).sorted === Seq("f1", "f2"))
    // strictly disjoint heads stay clean regardless of b
    assert(GdxSource.clusterOverlapClosure(Seq(
      entry("f1", ("1", "4"), Some(("0", "900"))),
      entry("f2", ("5", "9"), Some(("0", "900")))), by).isEmpty)
  }

  test("generation provenance is scoped to its cluster spec: after " +
      "ALTER ... CLUSTER BY changes the columns, same-gen files " +
      "re-enter the closure and OPTIMIZE actually re-clusters") {
    // unit level: one generation tag proven under spec "a" exempts
    // only under byC = a — under byC = b the same cluster co-rewrites
    def entry(name: String, a: (String, String), b: (String, String),
              gen: Option[String]): GdxFileEntry =
      GdxFileEntry(name, Some(GdxFileStats(10L, 0L, 9L,
        Map("a" -> a, "b" -> b))), None, gen)
    val tag = "deadbeef0000@" + GdxSource.genClusterSpec(Seq("a"))
    val onA = Seq(
      entry("f1", ("1", "5"), ("0", "900"), Some(tag)),
      entry("f2", ("5", "9"), ("0", "900"), Some(tag)))
    // proven under the SAME spec → exempt (head-straddle tolerated)
    assert(GdxSource.clusterOverlapClosure(onA, Seq("a")).isEmpty)
    // the DECLARED columns changed → the proof no longer applies
    assert(GdxSource.clusterOverlapClosure(onA, Seq("b"))
      .map(_.name).sorted === Seq("f1", "f2"))
    // legacy tags (no spec suffix) prove nothing
    val legacy = onA.map(_.copy(gen = Some("cafecafe0000")))
    assert(GdxSource.clusterOverlapClosure(legacy, Seq("a"))
      .map(_.name).sorted === Seq("f1", "f2"))

    // end to end: recluster on w, re-declare on w2, and the second
    // OPTIMIZE must rewrite (not silently no-op on stale provenance).
    // Both columns are LOW-SELECTIVITY mod residues, so files proven
    // disjoint on one provably interleave on the other.
    val dir = freshDir("respec")
    spark.range(4000L).select(col("id").as("k"),
        ((col("id") * 7919L) % 1000L).cast("double").as("w"),
        ((col("id") * 31L) % 97L).cast("double").as("w2"))
      .repartition(8)
      .write.format(fmt).option("path", dir).mode("overwrite").save()
    GdxSource.setClusterBy(dir, Seq("w"))
    GdxSource.optimizeClustered(spark, dir, Seq("w"), 4)
    val afterW = GdxSource.committedEntries(dir, conf).map(_.name).toSet
    // same spec: converged — a second pass is a no-op
    val (b2, a2) = GdxSource.optimizeClustered(spark, dir, Seq("w"), 4)
    assert(b2 == a2 &&
      GdxSource.committedEntries(dir, conf).map(_.name).toSet == afterW)
    // new spec: the w-proven generation may interleave on w2 freely —
    // OPTIMIZE must see through the stale tag and rewrite
    GdxSource.setClusterBy(dir, Seq("w2"))
    GdxSource.optimizeClustered(spark, dir, Seq("w2"), 4)
    assert(GdxSource.committedEntries(dir, conf).map(_.name).toSet
      != afterW, "re-clustering on the new columns must rewrite")
    // and the w2-pass converges under its own provenance
    val afterW2 = GdxSource.committedEntries(dir, conf).map(_.name).toSet
    val (b3, a3) = GdxSource.optimizeClustered(spark, dir, Seq("w2"), 4)
    assert(b3 == a3 &&
      GdxSource.committedEntries(dir, conf).map(_.name).toSet == afterW2)
  }

  test("zero-row files are planned away unconditionally") {
    val dir = freshDir("zero")
    Seq((1L, "a")).toDF("k", "v").coalesce(1)
      .write.format(fmt).option("path", dir).mode("overwrite").save()
    Seq.empty[(Long, String)].toDF("k", "v").coalesce(1)
      .write.format(fmt).option("path", dir).mode("append").save()
    val entries = GdxSource.committedEntries(dir, conf)
    val (kept, all) = GdxSource.plannedFiles(dir, Seq.empty)
    assert(kept <= entries.count(!_.stats.exists(_.rows == 0L)))
    assert(kept < all || entries.forall(_.stats.forall(_.rows > 0)))
    assert(spark.read.format(fmt).option("path", dir).load().count() === 1L)
  }
}
