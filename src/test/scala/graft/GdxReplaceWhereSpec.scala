package graft

import org.apache.spark.sql.functions._
import graft.sources.GdxSource

/** Partial overwrite (`option("replaceWhere", "p = n")`) and
  * `OPTIMIZE ... WHERE`: one atomic commit replaces ONLY the
  * predicate's partition files (the rest carried by reference), every
  * written row must satisfy the predicate, and unproven-key files or
  * bucket layouts refuse loudly. */
class GdxReplaceWhereSpec extends SparkSuite {
  import spark.implicits._

  private val fmt = "graft.sources.GdxSource"

  private def freshDir(tag: String): String =
    java.nio.file.Files.createTempDirectory(s"gdxrw_$tag").toString + "/t"

  private def read(dir: String) =
    spark.read.format(fmt).option("path", dir).load()

  private def entryNames(dir: String): Set[String] =
    GdxSource.committedEntries(dir, GdxSource.driverConf())
      .map(_.name).toSet

  /** 300 rows over partitions p ∈ {0,1,2}. */
  private def seed(dir: String): Unit =
    (0 until 300).map(i => (i.toLong, s"r$i", (i % 3).toLong))
      .toDF("k", "v", "p").repartition(4)
      .write.format(fmt).option("path", dir).option("partitionBy", "p")
      .mode("overwrite").save()

  test("first-run replaceWhere on a never-committed table creates the " +
      "declared layout (the idempotent-backfill shape)") {
    val dir = freshDir("first")
    Seq((1L, "a", 3L), (2L, "b", 3L)).toDF("k", "v", "p").coalesce(1)
      .write.format(fmt).option("path", dir)
      .option("partitionBy", "p").option("replaceWhere", "p = 3")
      .mode("overwrite").save()
    assert(GdxSource.committedPartitionCol(dir,
      GdxSource.driverConf()).contains("p"))
    assert(read(dir).count() === 2L)
    // and the second run of the same job restates the same slice
    Seq((9L, "z", 3L)).toDF("k", "v", "p").coalesce(1)
      .write.format(fmt).option("path", dir)
      .option("partitionBy", "p").option("replaceWhere", "p = 3")
      .mode("overwrite").save()
    assert(read(dir).collect().map(_.getLong(0)).toSeq === Seq(9L))
  }

  test("replaceWhere swaps one partition's files; the rest are carried " +
      "by reference and the old snapshot time-travels") {
    val dir = freshDir("swap")
    seed(dir)
    val before = entryNames(dir)
    Seq((1000L, "fresh", 1L), (1001L, "fresh", 1L)).toDF("k", "v", "p")
      .coalesce(1)
      .write.format(fmt).option("path", dir)
      .option("replaceWhere", "p = 1")
      .mode("overwrite").save()
    val after = entryNames(dir)
    // p=0 / p=2 entries are IDENTICAL strings (carried, not rewritten)
    assert(before.filter(n => n.startsWith("p=0/") || n.startsWith("p=2/"))
      === after.filter(n => n.startsWith("p=0/") || n.startsWith("p=2/")))
    assert(after.filter(_.startsWith("p=1/")).size === 1)
    assert(before.filter(_.startsWith("p=1/"))
      .forall(n => !after.contains(n)))
    // content: p=1 holds exactly the new rows, the others are untouched
    assert(read(dir).filter(col("p") === 1L).select("k").as[Long]
      .collect().toSet === Set(1000L, 1001L))
    assert(read(dir).filter(col("p") =!= 1L).count() === 200L)
    // snapshot isolation: the pre-replace version still has old p=1
    val v1 = spark.read.format(fmt).option("path", dir)
      .option("version", "1").load()
    assert(v1.filter(col("p") === 1L).count() === 100L)
  }

  test("replaceWhere IN replaces several partitions at once") {
    val dir = freshDir("in")
    seed(dir)
    Seq((2000L, "x", 0L), (2001L, "x", 2L)).toDF("k", "v", "p")
      .coalesce(1)
      .write.format(fmt).option("path", dir)
      .option("replaceWhere", "p IN (0, 2)")
      .mode("overwrite").save()
    assert(read(dir).filter(col("p").isin(0L, 2L)).count() === 2L)
    assert(read(dir).filter(col("p") === 1L).count() === 100L)
  }

  test("a written row outside the predicate refuses the whole commit; " +
      "the table is unchanged") {
    val dir = freshDir("escape")
    seed(dir)
    val before = entryNames(dir)
    val e = intercept[Exception] {
      Seq((3000L, "bad", 2L)).toDF("k", "v", "p").coalesce(1)
        .write.format(fmt).option("path", dir)
        .option("replaceWhere", "p = 1")
        .mode("overwrite").save()
    }
    val msgs = Iterator.iterate(e: Throwable)(_.getCause)
      .takeWhile(_ != null).map(t => Option(t.getMessage).getOrElse(""))
      .mkString(" | ")
    assert(msgs.contains("outside the predicate"), msgs)
    assert(entryNames(dir) === before, "a refused commit must not publish")
    assert(read(dir).count() === 300L)
  }

  test("NULL-partition files are always carried (the predicate never " +
      "matches NULL)") {
    val dir = freshDir("null")
    seed(dir)
    Seq((5000L, "n", Option.empty[Long])).toDF("k", "v", "p").coalesce(1)
      .write.format(fmt).option("path", dir).mode("append").save()
    Seq((5001L, "f", 1L)).toDF("k", "v", "p").coalesce(1)
      .write.format(fmt).option("path", dir)
      .option("replaceWhere", "p = 1").mode("overwrite").save()
    assert(read(dir).filter(col("p").isNull).select("k").as[Long]
      .collect().toSeq === Seq(5000L))
    assert(read(dir).filter(col("p") === 1L).count() === 1L)
  }

  test("unproven-key files (pre-partitioning era) refuse replaceWhere") {
    val dir = freshDir("legacy")
    // v1: unpartitioned (root-level files), then partitioned appends
    Seq((1L, "old", 0L)).toDF("k", "v", "p").coalesce(1)
      .write.format(fmt).option("path", dir).mode("overwrite").save()
    Seq((2L, "new", 1L)).toDF("k", "v", "p").coalesce(1)
      .write.format(fmt).option("path", dir).option("partitionBy", "p")
      .mode("append").save()
    val e = intercept[Exception] {
      Seq((3L, "x", 1L)).toDF("k", "v", "p").coalesce(1)
        .write.format(fmt).option("path", dir)
        .option("replaceWhere", "p = 1").mode("overwrite").save()
    }
    assert(e.toString.contains("provable partition key") ||
      Option(e.getCause).exists(_.toString.contains(
        "provable partition key")), e.toString)
  }

  test("replaceWhere refuses append mode, non-partition columns, and " +
      "rich predicates") {
    val dir = freshDir("refuse")
    seed(dir)
    def attempt(opts: (String, String)*)(mode: String): Exception =
      intercept[Exception] {
        var w = Seq((1L, "x", 1L)).toDF("k", "v", "p").coalesce(1)
          .write.format(fmt).option("path", dir)
        opts.foreach { case (k2, v2) => w = w.option(k2, v2) }
        w.mode(mode).save()
      }
    assert(attempt("replaceWhere" -> "p = 1")("append")
      .toString.contains("Overwrite"))
    assert(attempt("replaceWhere" -> "v = 1")("overwrite")
      .toString.contains("partition column"))
    assert(attempt("replaceWhere" -> "p > 1")("overwrite")
      .toString.contains("unsupported partition predicate"))
  }

  test("a concurrent commit INSIDE the slice conflicts the " +
      "restatement; outside-slice commits are carried through") {
    val dir = freshDir("conc")
    seed(dir)
    val conf = GdxSource.driverConf()
    def slice(p: Long): Set[(String, Option[String])] =
      GdxSource.committedEntries(dir, conf)
        .filter(_.name.startsWith(s"p=$p/")).map(e => (e.name, e.dv)).toSet
    // observation taken, then a writer lands rows INSIDE the slice
    val stale = slice(1L)
    Seq((8000L, "raced", 1L)).toDF("k", "v", "p").coalesce(1)
      .write.format(fmt).option("path", dir).mode("append").save()
    intercept[graft.sources.GdxConcurrentModificationException] {
      GdxSource.commitFiles(dir, conf, replace = false, Seq.empty,
        replaceWhere = Some(GdxSource.GdxReplaceWhere("p", Set(1L), stale)))
    }
    assert(read(dir).filter(col("k") === 8000L).count() === 1L,
      "the raced append must survive the refused restatement")
    // a DV grown inside the slice is a conflict too
    val stale2 = slice(1L)
    GdxSource.delete(spark, dir, col("k") === 8000L)
    intercept[graft.sources.GdxConcurrentModificationException] {
      GdxSource.commitFiles(dir, conf, replace = false, Seq.empty,
        replaceWhere = Some(GdxSource.GdxReplaceWhere("p", Set(1L),
          stale2)))
    }
    // an outside-slice commit between observation and publish is
    // benign: the restatement carries it and replaces only its slice
    val fresh = slice(1L)
    Seq((8001L, "other", 0L)).toDF("k", "v", "p").coalesce(1)
      .write.format(fmt).option("path", dir).mode("append").save()
    GdxSource.commitFiles(dir, conf, replace = false, Seq.empty,
      replaceWhere = Some(GdxSource.GdxReplaceWhere("p", Set(1L), fresh)))
    assert(read(dir).filter(col("p") === 1L).count() === 0L,
      "the slice is replaced by the (empty) payload")
    assert(read(dir).filter(col("k") === 8001L).count() === 1L,
      "the outside-slice append is carried")
  }

  test("Spark's native INSERT INTO ... REPLACE WHERE and " +
      "writeTo.overwrite route to the same slice commit") {
    val dir = freshDir("native")
    seed(dir)
    val before = entryNames(dir)
    val tbl = "gdxrw_nat_" +
      java.util.UUID.randomUUID().toString.replace("-", "")
    spark.sql(s"""CREATE TABLE $tbl (k BIGINT, v STRING, p BIGINT)
      USING graft.sources.GdxSource OPTIONS (path '$dir')""")
    try {
      spark.sql(s"INSERT INTO $tbl REPLACE WHERE p = 1 " +
        "SELECT CAST(7000 AS BIGINT), 'sql', CAST(1 AS BIGINT)")
      assert(read(dir).filter(col("p") === 1L).select("k").as[Long]
        .collect().toSeq === Seq(7000L))
      assert(read(dir).filter(col("p") =!= 1L).count() === 200L)
      assert(entryNames(dir)
        .filter(n => n.startsWith("p=0/") || n.startsWith("p=2/")) ===
        before.filter(n => n.startsWith("p=0/") || n.startsWith("p=2/")),
        "untouched partitions carried by reference")
      // DataFrameWriterV2.overwrite(condition) — same machinery
      Seq((7001L, "dfv2", 2L)).toDF("k", "v", "p")
        .writeTo(tbl).overwrite(col("p") === 2L)
      assert(read(dir).filter(col("p") === 2L).select("k").as[Long]
        .collect().toSeq === Seq(7001L))
      assert(read(dir).filter(col("p") === 1L).count() === 1L)
      // a non-slice condition is refused, never approximated
      val e = intercept[Exception] {
        spark.sql(s"INSERT INTO $tbl REPLACE WHERE p > 1 " +
          "SELECT CAST(1 AS BIGINT), 'x', CAST(2 AS BIGINT)")
      }
      assert(e.toString.contains("unsupported condition") ||
        Option(e.getCause).exists(_.toString.contains(
          "unsupported condition")), e.toString)
    } finally spark.sql(s"DROP TABLE IF EXISTS $tbl")
  }

  test("OPTIMIZE ... WHERE compacts only the slice, folds its DVs, " +
      "and leaves other partitions byte-identical") {
    val s = org.apache.spark.sql.graft.ColumnBridge
      .sessionWithExtensions(spark, new GraftExtensions())
    val dir = freshDir("optw")
    seed(dir)
    // accrete small files in p=1 and plant a DV there and in p=2
    (0 until 3).foreach { i =>
      Seq((9000L + i, "acc", 1L)).toDF("k", "v", "p").coalesce(1)
        .write.format(fmt).option("path", dir).mode("append").save()
    }
    GdxSource.delete(s, dir, col("k") === 1L || col("k") === 2L) // p∈{1,2}
    val rowsBefore = read(dir).orderBy("k").collect().toSeq
    val p2Before = entryNames(dir).filter(_.startsWith("p=2/"))
    val tbl = "gdxrw_opt_" +
      java.util.UUID.randomUUID().toString.replace("-", "")
    s.sql(s"""CREATE TABLE $tbl (k BIGINT, v STRING, p BIGINT)
      USING graft.sources.GdxSource OPTIONS (path '$dir')""")
    try {
      val res = s.sql(s"OPTIMIZE $tbl WHERE p = 1").head
      assert(res.getLong(0) > 1L && res.getLong(1) === 1L,
        s"expected many->1 for p=1, got ${res.getLong(0)}->${res.getLong(1)}")
      val after = entryNames(dir)
      assert(after.filter(_.startsWith("p=1/")).size === 1)
      assert(after.filter(_.startsWith("p=2/")) === p2Before,
        "untouched partitions carry their files (DVs included)")
      // the p=1 rewrite folded its DV (no dv on the new entry)
      assert(GdxSource.committedEntries(dir, GdxSource.driverConf())
        .filter(_.name.startsWith("p=1/")).forall(_.dv.isEmpty))
      assert(read(dir).orderBy("k").collect().toSeq === rowsBefore)
      // WHERE + ZORDER BY is refused loudly
      val e = intercept[Exception] {
        s.sql(s"OPTIMIZE $tbl WHERE p = 1 ZORDER BY (k)")
      }
      assert(e.getMessage.contains("cannot be combined"), e.getMessage)
    } finally s.sql(s"DROP TABLE IF EXISTS $tbl")
  }
}
