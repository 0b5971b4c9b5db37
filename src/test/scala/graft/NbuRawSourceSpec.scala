package graft

import org.apache.spark.sql.functions._

/** DataSourceV2 source: parallel per-file parse of pretty-printed JSON
  * arrays must agree with the multiLine JSON reader, prune columns, and
  * plan one partition per file. */
class NbuRawSourceSpec extends SparkSuite with PruneAuditHelper {

  private def landTwo(): String = {
    val dir = java.nio.file.Files.createTempDirectory("nbu_dsv2").toFile
    dir.deleteOnExit()
    val fixture = java.nio.file.Paths.get(
      getClass.getResource("/nbu_sample.json").getPath)
    java.nio.file.Files.createDirectories(
      java.nio.file.Paths.get(dir.getPath, "ingest_date=2025-09-19"))
    java.nio.file.Files.createDirectories(
      java.nio.file.Paths.get(dir.getPath, "ingest_date=2025-09-20"))
    java.nio.file.Files.copy(fixture, java.nio.file.Paths.get(
      dir.getPath, "ingest_date=2025-09-19", "response.json"))
    java.nio.file.Files.copy(fixture, java.nio.file.Paths.get(
      dir.getPath, "ingest_date=2025-09-20", "response.json"))
    dir.getPath
  }

  test("matches the multiLine JSON reader row-for-row") {
    val dir = landTwo()
    val dsv2 = spark.read.format("graft.sources.NbuRawSource")
      .option("path", dir).load()
      .orderBy("cc", "exchangedate")
    val builtin = spark.read.option("multiLine", value = true)
      .schema(graft.pipeline.CurrencyPipeline.rawSchema)
      .json(s"$dir/ingest_date=*")
      .select(dsv2.columns.map(col): _*)
      .orderBy("cc", "exchangedate")
    assert(dsv2.collect().toSeq === builtin.collect().toSeq)
  }

  test("JSON null values become SQL NULL, matching the built-in reader") {
    val dir = java.nio.file.Files.createTempDirectory("nbu_nulls").toFile
    dir.deleteOnExit()
    val sub = java.nio.file.Paths.get(dir.getPath, "ingest_date=2025-09-19")
    java.nio.file.Files.createDirectories(sub)
    java.nio.file.Files.write(sub.resolve("response.json"),
      """[
        |  {"r030": null, "txt": null, "rate": null, "cc": "USD", "exchangedate": null},
        |  {"r030": 978, "txt": "x", "rate": 48.1, "cc": null, "exchangedate": "19.09.2025"}
        |]""".stripMargin.getBytes("UTF-8"))
    val dsv2 = spark.read.format("graft.sources.NbuRawSource")
      .option("path", dir.getPath).load().orderBy("r030")
    val builtin = spark.read.option("multiLine", value = true)
      .schema(graft.pipeline.CurrencyPipeline.rawSchema)
      .json(s"${dir.getPath}/ingest_date=*")
      .select(dsv2.columns.map(col): _*).orderBy("r030")
    assert(dsv2.collect().toSeq === builtin.collect().toSeq)
    val nullRow = dsv2.filter(col("cc") === "USD").collect().head
    assert(nullRow.isNullAt(nullRow.fieldIndex("rate")))
    assert(nullRow.isNullAt(nullRow.fieldIndex("txt")))
  }

  test("one input partition per file; pruning reaches the reader") {
    val dir = landTwo()
    val df = spark.read.format("graft.sources.NbuRawSource")
      .option("path", dir).load()
    assert(df.rdd.getNumPartitions === 2)
    val pruned = df.select("cc", "rate")
    val plan = pruned.queryExecution.executedPlan.toString()
    assert(plan.contains("ReadSchema") || plan.contains("cc"), plan)
    assert(pruned.columns.toSeq === Seq("cc", "rate"))
    assert(pruned.count() === 8)
    // transform composes directly on the custom source
    val t = graft.pipeline.CurrencyPipeline.transform(df)
    assert(t.count() === 4) // 2 files × (USD, EUR)
  }

  test("column pruning: every subset and order matches readSchema") {
    val dir = landTwo()
    auditColumnPruning(() => spark.read
      .format("graft.sources.NbuRawSource").option("path", dir).load())
  }
}
