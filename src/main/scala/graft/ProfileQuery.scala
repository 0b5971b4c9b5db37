package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart, SparkListenerStageCompleted}

/** Measurement harness (guide §1): run one named query warm, then once
  * more under a listener that records every Spark job's wall span, and
  * print the job timeline plus the DRIVER GAPS between jobs — the
  * split that says whether a query's time goes to task execution or to
  * driver-side work (planning, manifest I/O, commit protocol) between
  * jobs. Not part of the driver contract; a profiling tool only.
  *
  * Usage: ProfileQuery <queryName> [sfDir] [reps]
  */
object ProfileQuery {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val reps = if (args.length > 2) args(2).toInt else 1
    val spark = GraftSession.builder(32)
      .config("spark.sql.adaptive.coalescePartitions.parallelismFirst",
        "false")
      .config("spark.sql.adaptive.advisoryPartitionSizeInBytes", "64m")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val fn = SparkEntry.queries(name)
    // warmup
    fn(spark, sfDir).count()
    fn(spark, sfDir).count()

    final case class J(id: Int, desc: String, start: Long, var end: Long,
                       var stages: Int, var tasks: Int)
    val jobs = new java.util.concurrent.ConcurrentHashMap[Int, J]()
    val order = java.util.Collections.synchronizedList(
      new java.util.ArrayList[J]())
    val listener = new SparkListener {
      override def onJobStart(e: SparkListenerJobStart): Unit = {
        val j = J(e.jobId,
          Option(e.properties.getProperty("spark.job.description"))
            .orElse(Option(e.properties.getProperty("callSite.short")))
            .getOrElse(""),
          e.time, -1L, e.stageInfos.size, 0)
        jobs.put(e.jobId, j); order.add(j)
      }
      override def onStageCompleted(e: SparkListenerStageCompleted): Unit =
        ()
      override def onJobEnd(e: SparkListenerJobEnd): Unit = {
        val j = jobs.get(e.jobId); if (j != null) j.end = e.time
      }
    }
    spark.sparkContext.addSparkListener(listener)
    var r = 0
    while (r < reps) {
      order.clear(); jobs.clear()
      val t0 = System.nanoTime()
      fn(spark, sfDir).count()
      val wall = (System.nanoTime() - t0) / 1e6
      Thread.sleep(300) // let the listener bus drain
      val js = {
        val it = order.iterator(); val b = Seq.newBuilder[J]
        while (it.hasNext) b += it.next(); b.result().sortBy(_.start)
      }
      val jobTotal = js.map(j => math.max(0L, j.end - j.start)).sum
      println(f"== $name rep$r wall=${wall}%.0f ms, ${js.size} jobs, " +
        f"sum(job spans)=$jobTotal ms ==")
      var cursor = if (js.nonEmpty) js.head.start else 0L
      var gapTotal = 0L
      js.foreach { j =>
        val gap = j.start - cursor
        if (gap > 1) { println(f"   [driver gap ${gap}%5d ms]"); gapTotal += gap }
        val dur = j.end - j.start
        println(f"  job ${j.id}%3d ${dur}%5d ms  stages=${j.stages}  ${j.desc.take(90)}")
        cursor = math.max(cursor, j.end)
      }
      println(f"== gaps total: $gapTotal ms (pre-first-job time not counted) ==")
      r += 1
    }
    spark.stop()
  }
}
