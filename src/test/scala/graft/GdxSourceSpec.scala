package graft

import org.apache.spark.sql.functions._

/** GDX connector protocol: manifest-gated commit visibility and filter
  * pushdown (see sources/GdxSource.scala). */
class GdxSourceSpec extends SparkSuite {
  import spark.implicits._

  private def freshDir(tag: String): String =
    java.nio.file.Files.createTempDirectory(s"gdx_$tag").toString

  private def write(dir: String, rows: Seq[(Long, String)]): Unit =
    rows.toDF("k", "v").repartition(2)
      .write.format("graft.sources.GdxSource")
      .option("path", dir).mode("append").save()

  private def read(dir: String) =
    spark.read.format("graft.sources.GdxSource").option("path", dir).load()

  test("round-trip preserves rows; commit publishes a manifest") {
    val dir = freshDir("rt")
    write(dir, Seq((1L, "a"), (2L, "b"), (3L, "a")))
    assert(new java.io.File(dir, "_manifest").exists())
    assert(read(dir).as[(Long, String)].collect().toSet ===
      Set((1L, "a"), (2L, "b"), (3L, "a")))
  }

  test("uncommitted files are invisible (manifest gates the read)") {
    val dir = freshDir("gate")
    write(dir, Seq((1L, "a")))
    // a crashed task's leftover tmp AND a non-manifest final file
    java.nio.file.Files.writeString(
      java.nio.file.Path.of(dir, "part-99999-0.gdx.tmp"), "666\tghost\n")
    java.nio.file.Files.writeString(
      java.nio.file.Path.of(dir, "part-99998-0.gdx"), "667\tstray\n")
    assert(read(dir).as[(Long, String)].collect().toSet ===
      Set((1L, "a")), "only manifest-listed files may be read")
  }

  test("append commits union with the previous snapshot") {
    val dir = freshDir("append")
    write(dir, Seq((1L, "old")))
    write(dir, Seq((2L, "new")))
    assert(read(dir).as[(Long, String)].collect().toSet ===
      Set((1L, "old"), (2L, "new")))
  }

  test("time travel: a pinned version is immune to later commits") {
    val dir = freshDir("tt")
    write(dir, Seq((1L, "a")))                       // v1
    write(dir, Seq((2L, "b")))                       // v2 = v1 + delta
    Seq((9L, "c")).toDF("k", "v")
      .write.format("graft.sources.GdxSource")
      .option("path", dir).mode("overwrite").save()  // v3 = fresh
    val conf = graft.sources.GdxSource.driverConf()
    assert(graft.sources.GdxSource.listVersions(dir, conf) === Seq(1, 2, 3))
    def at(v: Int) = spark.read.format("graft.sources.GdxSource")
      .option("path", dir).option("version", v.toString).load()
      .as[(Long, String)].collect().toSet
    assert(at(1) === Set((1L, "a")))
    assert(at(2) === Set((1L, "a"), (2L, "b")))
    assert(at(3) === Set((9L, "c")))
    assert(read(dir).as[(Long, String)].collect().toSet === Set((9L, "c")),
      "no version option = latest snapshot")
    intercept[Exception] {
      spark.read.format("graft.sources.GdxSource").option("path", dir)
        .option("version", "7").load().collect()
    }
  }

  test("vacuum drops old manifests and unreferenced data files only") {
    val dir = freshDir("vac")
    write(dir, Seq((1L, "a")))                       // v1
    Seq((2L, "b")).toDF("k", "v")
      .write.format("graft.sources.GdxSource")
      .option("path", dir).mode("overwrite").save()  // v2 orphans v1's file
    val conf = graft.sources.GdxSource.driverConf()
    val deleted = graft.sources.GdxSource.vacuum(dir, conf, keepLast = 1)
    assert(deleted >= 1, "v1's data file is unreferenced and must go")
    assert(graft.sources.GdxSource.listVersions(dir, conf) === Seq(2))
    assert(read(dir).as[(Long, String)].collect().toSet === Set((2L, "b")),
      "the retained snapshot still reads intact after vacuum")
  }

  test("mode(overwrite) is accepted via SupportsTruncate") {
    val dir = freshDir("trunc")
    write(dir, Seq((1L, "old")))
    Seq((9L, "ow")).toDF("k", "v")
      .write.format("graft.sources.GdxSource")
      .option("path", dir).mode("overwrite").save()
    assert(read(dir).as[(Long, String)].collect().toSet === Set((9L, "ow")))
  }

  test("ungrouped count/min/max collapse to per-file partials") {
    val dir = freshDir("agg")
    write(dir, (1L to 100L).map(i => (i, if (i % 2 == 0) "e" else "o")))
    val df = read(dir).filter(col("v") === "e")
      .agg(count(lit(1)).as("n"), min("k").as("mn"), max("k").as("mx"))
    val plan = df.queryExecution.executedPlan.toString()
    assert(plan.contains("agg=[count_0, min_1, max_2]") ||
      plan.contains("agg=["), s"aggregates must reach the scan:\n" +
      plan.take(1500))
    assert(df.collect().head.toSeq === Seq(50L, 2L, 100L))
    // empty match: count 0, NULL min/max (not Long sentinels)
    val none = read(dir).filter(col("v") === "zzz")
      .agg(count(lit(1)), min("k"), max("k")).collect().head
    assert(none.getLong(0) === 0L && none.isNullAt(1) && none.isNullAt(2))
  }

  test("pushed limit caps per-partition reads") {
    val dir = freshDir("limit")
    write(dir, (1L to 100L).map(i => (i, "x")))
    val df = read(dir).limit(7)
    val plan = df.queryExecution.executedPlan.toString()
    assert(plan.contains("limit=7"), plan.take(1200))
    assert(df.count() === 7)
  }

  test("supported predicates are pushed; others stay post-scan") {
    val dir = freshDir("push")
    write(dir, (1L to 100L).map(i => (i, if (i % 2 == 0) "e" else "o")))
    val df = read(dir).filter(col("k") >= 10 && col("k") < 20 &&
      col("v") === "e" && length(col("v")) === 1)
    val plan = df.queryExecution.executedPlan.toString()
    assert(plan.contains("GdxScan pushed=["), plan.take(1200))
    assert(plan.contains("LessThan(k,20"), plan.take(1200))
    assert(plan.contains("EqualTo(v,e)"), plan.take(1200))
    // length() is not pushable — must remain a post-scan Filter
    assert(plan.contains("Filter"), plan.take(1200))
    assert(df.as[(Long, String)].collect().map(_._1).sorted.toSeq ===
      Seq(10L, 12L, 14L, 16L, 18L))
  }
}
