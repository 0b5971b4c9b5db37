package graft

import org.apache.spark.sql.SparkSession

/** Per-query timing harness for iterating on a single operator without a
  * full Bench sweep: `QTime name1 name2 …` times each named query
  * REPS (default 3) times on SPARK_GRAFT_SF_DIR. Session conf mirrors
  * Bench's AQE settings but defaults to local[32] (the driver's Bench
  * invocation) where bare Bench defaults to local[4] — set
  * SPARK_GRAFT_CPUS explicitly when comparing against a Bench run. */
object QTime {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val reps = sys.env.getOrElse("SPARK_GRAFT_REPS", "3").toInt
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.parallelismFirst", "false")
      .config("spark.sql.adaptive.advisoryPartitionSizeInBytes", "64m")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    for (q <- args; i <- 1 to reps) {
      val t0 = System.nanoTime()
      val n = SparkEntry.queries(q)(spark, sfDir).count()
      println(f"$q run$i ${(System.nanoTime() - t0) / 1e9}%.2f s ($n rows)")
    }
    spark.stop()
  }
}
