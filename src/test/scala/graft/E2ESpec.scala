package graft

import graft.operators.Dedup
import graft.pipeline.{CurrencyPipeline, Ingest, ReportSinks}

/** End-to-end goldens: landed fixture → backfill → report JSON (SURVEY
  * §5.4), plus dedup cluster survivor selection, plus format round-trips. */
class E2ESpec extends SparkSuite {
  import spark.implicits._

  test("full pipeline golden: land → backfill → report JSON") {
    val rawDir = java.nio.file.Files.createTempDirectory("graft_e2e").toFile
    rawDir.deleteOnExit()
    val fixture = getClass.getResource("/nbu_sample.json").getPath
    Ingest.landRaw(spark, fixture, rawDir.getPath, "2025-09-19")
    val table = Ingest.backfill(spark, rawDir.getPath)
    val per = CurrencyPipeline.reportPerCurrency(table,
      java.sql.Date.valueOf("2025-09-19"))
    val json = ReportSinks.reportJson(CurrencyPipeline.reportStruct(per))
    // single-day history: change clamps to oldest row (= 0.0), year
    // range and all-time avg collapse to the day's rate
    val expected =
      """{"usd":{"last":41.2563,"change_month":0.0,""" +
        """"range_year":{"min":41.2563,"max":41.2563},""" +
        """"avg_all_time":41.2563,"days":1},""" +
      """"eur":{"last":48.6712,"change_month":0.0,""" +
        """"range_year":{"min":48.6712,"max":48.6712},""" +
        """"avg_all_time":48.6712,"days":1},""" +
      """"general":{"num_currencies":2}}"""
    assert(json === expected)
  }

  test("connected components cluster candidates; survivors keep min id") {
    val pairs = Seq((0L, 1L), (1L, 2L), (5L, 6L)).toDF("doc_a", "doc_b")
    val docs = (0L to 7L).map(Tuple1(_)).toDF("doc_id")
    val s = Dedup.survivors(docs, pairs)
      .as[(Long, Long, Boolean)].collect().sortBy(_._1)
    val byId = s.map(t => t._1 -> (t._2, t._3)).toMap
    assert(byId(0L) === (0L, true) && byId(1L) === (0L, false) &&
      byId(2L) === (0L, false), "transitive cluster 0-1-2 collapses to 0")
    assert(byId(5L) === (5L, true) && byId(6L) === (5L, false))
    assert(byId(3L) === (3L, true) && byId(7L) === (7L, true))
    assert(s.count(_._3) === 5) // 0, 3, 4, 5, 7 survive
  }

  test("csv / orc / json round-trips preserve the rates table") {
    val dir = java.nio.file.Files.createTempDirectory("graft_fmt").toFile
    dir.deleteOnExit()
    val rates = Seq(("USD", "2025-09-19", 41.2563, 4125.63),
                    ("EUR", "2025-09-19", 48.6712, 4867.12))
      .toDF("cc", "exchangedate", "rate", "rate_per_100")
    def readBack(fmt: String): Set[(String, String, Double, Double)] = {
      val path = s"${dir.getPath}/$fmt"
      rates.write.mode("overwrite").format(fmt)
        .option("header", "true").save(path)
      val r = spark.read.format(fmt)
        .option("header", "true").option("inferSchema", "true").load(path)
      r.select("cc", "exchangedate", "rate", "rate_per_100")
        .as[(String, String, Double, Double)].collect().toSet
    }
    val expected = rates.as[(String, String, Double, Double)].collect().toSet
    Seq("csv", "orc", "json").foreach(f => assert(readBack(f) === expected, f))
  }
}
