package graft

import graft.sources.JdbcSource
import org.apache.spark.sql.functions._

/** S6 end-to-end: write the rates table through the JDBC sink into an
  * embedded Derby database, read it back through the JDBC scan (whole
  * table and range-partitioned), and prove the round-trip is lossless —
  * the same path the reference drives against Postgres
  * (`dags/currency_etl.py:29,86`). */
class JdbcSpec extends SparkSuite {
  import spark.implicits._

  private val driver = "org.apache.derby.iapi.jdbc.AutoloadedDriver"
  private def url(db: String) = s"jdbc:derby:$db;create=true"

  private def rates = Seq(
    ("USD", java.sql.Date.valueOf("2024-01-02"), 37.98, 1L),
    ("USD", java.sql.Date.valueOf("2024-01-03"), 38.05, 2L),
    ("EUR", java.sql.Date.valueOf("2024-01-02"), 41.55, 3L),
    ("EUR", java.sql.Date.valueOf("2024-01-03"), 41.72, 4L)
  ).toDF("cc", "exchangedate", "rate", "row_id")

  test("JDBC write → read round-trips the rates table (embedded Derby)") {
    val db = java.nio.file.Files.createTempDirectory("graft_jdbc")
      .resolve("ratesdb").toString
    JdbcSource.write(rates, url(db), "exchange_rates", driver)
    val back = JdbcSource.read(spark, url(db), "exchange_rates", driver)
      .orderBy("row_id")
    assert(back.count() === 4L)
    assert(back.columns.map(_.toLowerCase).sorted ===
      Array("cc", "exchangedate", "rate", "row_id"))
    val got = back.select(col("cc"), col("exchangedate").cast("string"),
      col("rate"), col("row_id")).as[(String, String, Double, Long)].collect()
    assert(got === Array(
      ("USD", "2024-01-02", 37.98, 1L),
      ("USD", "2024-01-03", 38.05, 2L),
      ("EUR", "2024-01-02", 41.55, 3L),
      ("EUR", "2024-01-03", 41.72, 4L)))
  }

  test("partitioned JDBC read splits the scan and preserves all rows") {
    val db = java.nio.file.Files.createTempDirectory("graft_jdbc")
      .resolve("partdb").toString
    JdbcSource.write(rates, url(db), "exchange_rates", driver)
    val back = JdbcSource.readPartitioned(spark, url(db), "exchange_rates",
      driver, partitionColumn = "row_id", lowerBound = 1L, upperBound = 5L,
      numPartitions = 2)
    assert(back.rdd.getNumPartitions === 2)
    assert(back.count() === 4L)
    assert(back.agg(sum("row_id")).as[Long].head() === 10L)
  }
}
