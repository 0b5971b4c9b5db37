package graft

import org.apache.spark.sql.SparkSession

/** Driver-run benchmark: one JSON line with per-query steady-state
  * seconds over SparkEntry.queries on SPARK_GRAFT_SF_DIR.
  *
  * A full untimed warmup pass runs first so the timed pass measures query
  * execution rather than one-time JVM/classloader/codegen costs — the
  * numbers then reflect what a long-lived cluster session would see,
  * which is the regime the 100 TB design targets. */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    // the engine's own session factory (extensions active — the bench
    // measures the plans a library user gets, auto-replans included),
    // plus AQE coalesce tuning: let AQE shrink tiny shuffles below the
    // slot count — task-scheduling overhead dominates sub-64MB
    // exchanges at high parallelism
    val spark = GraftSession.builder(cpus.toInt)
      .config("spark.sql.adaptive.coalescePartitions.parallelismFirst", "false")
      .config("spark.sql.adaptive.advisoryPartitionSizeInBytes", "64m")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // optional subset for local A/B timing: SPARK_GRAFT_ONLY=q1,q2,...
    val queries = sys.env.get("SPARK_GRAFT_ONLY") match {
      case Some(list) =>
        val keep = list.split(",").map(_.trim).toSet
        SparkEntry.queries.filter { case (k, _) => keep(k) }
      case None => SparkEntry.queries
    }
    // A query that throws ANYWHERE (warmup or timed) is a bench
    // failure, not a fast query: its time-to-crash is meaningless, so
    // every error is recorded per-query, reported in the JSON line, and
    // fails the run loudly — a crash can never masquerade as a
    // measurement again.
    val errors = scala.collection.mutable.LinkedHashMap.empty[String, String]
    def describe(t: Throwable): String = {
      val root = Iterator.iterate(t)(_.getCause).takeWhile(_ != null)
        .toSeq.last
      s"${root.getClass.getSimpleName}: ${Option(root.getMessage).getOrElse("").linesIterator.take(1).mkString.take(200)}"
    }
    // warmup: exercise every plan once (JIT, codegen cache, file listing)
    queries.foreach { case (name, fn) =>
      try fn(spark, sfDir).count() catch {
        case t: Throwable => errors.getOrElseUpdate(name, describe(t))
      }
    }
    // two timed passes, report the min per query (drops scheduler noise)
    def timedPass(): Map[String, Double] =
      queries.map { case (name, fn) =>
        val t0 = System.nanoTime()
        try { fn(spark, sfDir).count() } catch {
          case t: Throwable => errors.getOrElseUpdate(name, describe(t))
        }
        name -> (System.nanoTime() - t0) / 1e9
      }
    val (p1, p2) = (timedPass(), timedPass())
    val results = p1.map { case (k, v) => k -> math.min(v, p2(k)) }
    val total = if (results.nonEmpty) results.values.sum else 0.0
    // locale-pinned: the default-locale f"" interpolator would emit a
    // comma decimal separator on some JVMs, breaking the JSON contract
    def fmt(v: Double): String =
      String.format(java.util.Locale.ROOT, "%.3f", Double.box(v))
    def dict(m: Seq[(String, Double)]): String =
      m.map { case (k, v) => "\"" + k + "\":" + fmt(v) }.mkString("{", ",", "}")
    // Full per-query map goes to a sidecar file; the stdout line keeps only
    // the 24 most expensive queries so the whole line fits inside the
    // driver's bounded output-tail capture and stays machine-parseable.
    val all = results.toSeq.sortBy(-_._2)
    def jstr(s: String): String =
      "\"" + s.flatMap {
        case '"' => "\\\""; case '\\' => "\\\\"
        case c if c < ' ' => f"\\u${c.toInt}%04x"; case c => c.toString
      } + "\""
    val errJson = errors.map { case (k, v) => jstr(k) + ":" + jstr(v) }
      .mkString("{", ",", "}")
    val fullPath = "bench_full.json"
    val pw = new java.io.PrintWriter(fullPath)
    try pw.println(s"""{"metric":"total","value":${fmt(total)},"unit":"sec","n_queries":${all.size},"queries":${dict(all)},"errors":$errJson,"sf":"$sfDir"}""")
    finally pw.close()
    println(s"""{"metric":"total","value":${fmt(total)},"unit":"sec","n_queries":${all.size},"queries":${dict(all.take(24))},"errors":$errJson,"sf":"$sfDir","full":"$fullPath"}""")
    spark.stop()
    if (errors.nonEmpty) {
      System.err.println(
        s"BENCH FAILED: ${errors.size} quer${if (errors.size == 1) "y" else "ies"} raised - timings above are invalid for these")
      errors.foreach { case (k, v) => System.err.println(s"  FAILED $k: $v") }
      sys.exit(1)
    }
  }
}
