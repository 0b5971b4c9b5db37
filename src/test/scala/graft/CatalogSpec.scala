package graft

import org.apache.spark.sql.functions._

/** Catalog-tier engine surface: cost-based-optimizer statistics and the
  * cache manager — the session-level features a resident analytics
  * service leans on (saved tables with stats drive join selection;
  * cached hot dimensions serve repeated dashboards from memory). */
class CatalogSpec extends SparkSuite {

  test("ANALYZE TABLE computes stats the optimizer can read") {
    spark.sql("DROP TABLE IF EXISTS cat_sup")
    // a previous aborted run may have left the managed location behind
    val wh = new java.io.File("spark-warehouse/cat_sup")
    if (wh.exists()) {
      def rm(f: java.io.File): Unit = {
        if (f.isDirectory) f.listFiles().foreach(rm)
        f.delete(); ()
      }
      rm(wh)
    }
    Tables.supplier(spark, sf()).write.mode("overwrite")
      .saveAsTable("cat_sup")
    spark.sql("ANALYZE TABLE cat_sup COMPUTE STATISTICS")
    // row counts reach plan Statistics only under the cost-based
    // optimizer — the consumer these stats exist for
    spark.conf.set("spark.sql.cbo.enabled", "true")
    val stats =
      try spark.table("cat_sup").queryExecution.optimizedPlan.stats
      finally spark.conf.set("spark.sql.cbo.enabled", "false")
    assert(stats.rowCount.exists(_.toLong > 0L),
      s"expected a row count from ANALYZE, got $stats")
    assert(stats.sizeInBytes > 0)
    // column-level stats feed ndv-based join estimates
    spark.sql("ANALYZE TABLE cat_sup COMPUTE STATISTICS FOR COLUMNS s_nationkey")
    val cols = spark.sql("DESCRIBE EXTENDED cat_sup s_nationkey")
      .collect().map(r => (r.getString(0), r.getString(1))).toMap
    assert(cols.get("distinct_count").exists(_.toLong > 0),
      cols.toString)
    spark.sql("DROP TABLE cat_sup")
  }

  test("cacheTable serves repeat reads from InMemoryRelation") {
    Tables.nation(spark, sf()).createOrReplaceTempView("cat_nat")
    spark.catalog.cacheTable("cat_nat")
    try {
      val df = spark.table("cat_nat").groupBy("n_regionkey").count()
      assert(df.count() > 0) // materialize the cache
      val p = df.queryExecution.executedPlan.toString()
      assert(p.contains("InMemoryRelation"), p.take(1500))
      assert(spark.catalog.isCached("cat_nat"))
    } finally {
      spark.catalog.uncacheTable("cat_nat")
      assert(!spark.catalog.isCached("cat_nat"))
    }
  }
}
