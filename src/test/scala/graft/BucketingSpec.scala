package graft

import org.apache.spark.sql.functions._

/** Storage-layout scale proof: bucketing both join sides on the join key
  * makes the big-big join zero-shuffle (SURVEY.md §2.6 / README "one
  * shuffle per logical step" — at 100 TB the lineitem⋈orders join is THE
  * dominant exchange, and bucketed layout removes it entirely). */
class BucketingSpec extends SparkSuite {

  test("bucketed big-big join plans without a shuffle exchange") {
    // warehouse dir is a static conf — tables land in ./spark-warehouse
    // (gitignored) and are dropped below
    spark.conf.set("spark.sql.sources.bucketing.enabled", "true")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // force SMJ

    Tables.lineitem(spark, sf()).write.mode("overwrite")
      .bucketBy(8, "l_orderkey").sortBy("l_orderkey")
      .saveAsTable("li_bucketed")
    Tables.orders(spark, sf()).write.mode("overwrite")
      .bucketBy(8, "o_orderkey").sortBy("o_orderkey")
      .saveAsTable("o_bucketed")

    val joined = spark.table("li_bucketed")
      .join(spark.table("o_bucketed"), col("l_orderkey") === col("o_orderkey"))
      .groupBy("o_orderpriority").agg(count(lit(1)).as("n"))
    val plan = joined.queryExecution.executedPlan.toString()
    val joinSection = plan.split("HashAggregate").last // below the agg
    assert(!joinSection.contains("Exchange hashpartitioning"),
      s"bucketed join must not shuffle its inputs:\n$plan")
    assert(joined.count() > 0)

    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
    spark.sql("DROP TABLE IF EXISTS li_bucketed")
    spark.sql("DROP TABLE IF EXISTS o_bucketed")
  }
}
