package graft

import org.apache.spark.sql.functions._
import graft.sources.GdxSource

/** TopN pushdown on the GDX scan (`SupportsPushDownTopN`): `ORDER BY k
  * LIMIT n` skips every file whose zone map cannot reach the top n,
  * Spark's global TakeOrderedAndProject stays above (partial push), and
  * the overlay stands down — never goes wrong — under filters, DVs, or
  * non-key orders. */
class GdxTopNSpec extends SparkSuite {
  import spark.implicits._

  private val fmt = "graft.sources.GdxSource"

  private def freshDir(tag: String): String =
    java.nio.file.Files.createTempDirectory(s"gdxtn_$tag").toString + "/t"

  private def read(dir: String) =
    spark.read.format(fmt).option("path", dir).load()

  /** 800 rows in 8 files with EXACT disjoint k ranges ([0..99],
    * [100..199], …) — appended one at a time so the layout is
    * deterministic (repartitionByRange samples its boundaries). */
  private def clustered(dir: String): Unit =
    (0 until 8).foreach { b =>
      (b * 100 until (b + 1) * 100).map(i => (i.toLong, s"r${i % 7}"))
        .toDF("k", "v").coalesce(1)
        .write.format(fmt).option("path", dir)
        .mode(if (b == 0) "overwrite" else "append").save()
    }

  private def plannedOf(plan: String): (Int, Int) = {
    val m = "files=(\\d+)/(\\d+)".r.findFirstMatchIn(plan)
    assert(m.isDefined, s"topn files marker missing in:\n$plan")
    (m.get.group(1).toInt, m.get.group(2).toInt)
  }

  test("ORDER BY k DESC LIMIT n plans only the top files; result exact") {
    val dir = freshDir("desc")
    clustered(dir)
    val q = read(dir).orderBy(col("k").desc).limit(25)
    val plan = q.queryExecution.executedPlan.toString()
    assert(plan.contains("topn=k DESC,25"), plan)
    val (kept, total) = plannedOf(plan)
    assert(total === 8 && kept === 1, s"expected 1/8 files, got $kept/$total")
    assert(q.select("k").as[Long].collect().toSeq ===
      (775L until 800L).reverse)
  }

  test("ORDER BY k ASC LIMIT n mirrors from the bottom") {
    val dir = freshDir("asc")
    clustered(dir)
    val q = read(dir).orderBy(col("k")).limit(25)
    val plan = q.queryExecution.executedPlan.toString()
    assert(plan.contains("topn=k ASC,25"), plan)
    val (kept, total) = plannedOf(plan)
    assert(total === 8 && kept === 1, s"expected 1/8 files, got $kept/$total")
    assert(q.select("k").as[Long].collect().toSeq === (0L until 25L))
  }

  test("limit spanning several files keeps exactly the covering prefix") {
    val dir = freshDir("span")
    clustered(dir) // 100 rows per file
    val q = read(dir).orderBy(col("k").desc).limit(150)
    val (kept, total) = plannedOf(q.queryExecution.executedPlan.toString())
    assert(total === 8 && kept === 2, s"expected 2/8 files, got $kept/$total")
    assert(q.select("k").as[Long].collect().toSeq ===
      (650L until 800L).reverse)
  }

  test("a pushed filter voids the row-count guarantee: no file skip, " +
      "result still exact") {
    val dir = freshDir("filt")
    clustered(dir)
    // v = 'r3' keeps 1-in-7 rows; taking top-10 of the filtered set
    // needs rows from deeper files than the unfiltered threshold admits
    val q = read(dir).filter(col("v") === "r3")
      .orderBy(col("k").desc).limit(10)
    val plan = q.queryExecution.executedPlan.toString()
    if (plan.contains("topn=")) {
      val (kept, total) = plannedOf(plan)
      assert(kept === total, s"filtered topn must not skip ($kept/$total)")
    }
    val expect = (0 until 800).filter(_ % 7 == 3).map(_.toLong)
      .sorted.reverse.take(10)
    assert(q.select("k").as[Long].collect().toSeq === expect)
  }

  test("deletion vectors drop a file from the proof pool but it stays " +
      "skippable; result reflects the deletes") {
    val dir = freshDir("dv")
    clustered(dir)
    // delete most of the TOP file's rows: its manifest row count (100)
    // may no longer cover the limit, so the threshold must not lean on it
    GdxSource.delete(spark, dir, col("k") >= 710L && col("k") =!= 799L)
    val q = read(dir).orderBy(col("k").desc).limit(20)
    val expect = (Seq(799L) ++ (691L to 709L).reverse).toSeq
    assert(q.select("k").as[Long].collect().toSeq === expect)
    val (kept, total) = plannedOf(q.queryExecution.executedPlan.toString())
    assert(kept < total, s"clustered layout must still skip ($kept/$total)")
  }

  test("duplicate keys at the threshold boundary are never lost") {
    val dir = freshDir("ties")
    // two files: [0..49] and fifty copies of k=49 — the threshold lands
    // ON 49 and the first file's maxK == threshold, so it must be kept
    val a = (0 until 50).map(i => (i.toLong, "a")).toDF("k", "v")
      .coalesce(1)
    val b = Seq.fill(50)((49L, "b")).toDF("k", "v").coalesce(1)
    a.write.format(fmt).option("path", dir).mode("overwrite").save()
    b.write.format(fmt).option("path", dir).mode("append").save()
    val q = read(dir).orderBy(col("k").desc).limit(51)
    val got = q.select("k").as[Long].collect().toSeq
    assert(got === Seq.fill(51)(49L))
  }

  test("non-key orders are refused: no marker, result exact") {
    val dir = freshDir("nonk")
    clustered(dir)
    val q = read(dir).orderBy(col("v").desc, col("k").desc).limit(5)
    assert(!q.queryExecution.executedPlan.toString().contains("topn="))
    val expect = (0 until 800).map(i => (i.toLong, s"r${i % 7}"))
      .sortBy { case (k, v) => (v, k) }.reverse.take(5)
    assert(q.select("k", "v").as[(Long, String)].collect().toSeq === expect)
  }

  test("plain LIMIT still rides the reader row cap (no topn marker)") {
    val dir = freshDir("lim")
    clustered(dir)
    val q = read(dir).limit(5)
    val plan = q.queryExecution.executedPlan.toString()
    assert(!plan.contains("topn=") && plan.contains("limit=5"), plan)
    assert(q.count() === 5L)
  }
}
