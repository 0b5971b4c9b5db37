package graft

import org.apache.spark.sql.SparkSession

/** Local smoke runner: mirrors the driver's t1 check (entry rows > 0) and
  * prints the physical plan so per-operator plan shape can be inspected.
  * Usage: Smoke [queryName [sfDir]] — no args runs `entry`. */
object Smoke {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    // engine session factory: extensions active, same plans as Verify/Bench
    val spark = GraftSession.builder(cpus.toInt).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val df = args.toList match {
      case name :: rest =>
        val dir = rest.headOption.getOrElse("/root/testdata/sf0.001")
        SparkEntry.queries(name)(spark, dir)
      case Nil => SparkEntry.entry(spark)
    }
    df.explain("formatted")
    val rows = df.limit(20).collect()
    println(s"rows (first ${rows.length}):")
    rows.foreach(r => println("  " + r))
    println(s"total: ${df.count()}")
    spark.stop()
  }
}
