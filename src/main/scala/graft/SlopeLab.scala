package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scaling-slope laboratory: synthesizes an N× copy of the driver
  * testdata (events cohorts and word-shuffled document replicas —
  * shuffling destroys the 5-gram shingles, so replicas are NOT
  * near-dups and the candidate-pair regime stays realistic) and runs
  * the GDX snapshot-count experiment. The point of every slope run is
  * to EXCLUDE a super-linear regime empirically: a quadratic path
  * prints ~N², a healthy one tracks N or the key count.
  *
  * Usage:
  *   runMain graft.SlopeLab gen [srcDir] [outDir] [factor]
  *     — write {events,documents}.parquet at factor× into outDir
  *       (single-file layout matching the driver testdata; every other
  *       table symlinked), then `SPARK_GRAFT_SF_DIR=outDir runMain
  *       graft.Bench` times any query family at N×.
  *   runMain graft.SlopeLab gdx [workDir]
  *     — snapshot-count scaling for the GDX changefeed lane: fixed
  *       total rows committed as 10 vs 50 vs 100 append snapshots;
  *       reports full-drain streaming read time and manifest bytes per
  *       commit count (retained, and after vacuum to one snapshot).
  *       The expected shape: drain time tracks TOTAL FILES (each
  *       snapshot's adds are planned once); with delta manifests an
  *       append commit writes O(files added), checkpoints every
  *       [[graft.sources.GdxSource.CheckpointInterval]] commits keep
  *       reconstruction bounded, and vacuumed metadata is O(total
  *       files) — this experiment is what exposed the old
  *       full-list-per-commit O(N²) growth.
  */
object SlopeLab {
  /** Recursive scratch-dir delete shared by every lane. */
  private def rm(f: java.io.File): Unit = {
    if (f.isDirectory) Option(f.listFiles()).foreach(_.foreach(rm))
    f.delete(); ()
  }

  def main(args: Array[String]): Unit = {
    val mode = args.headOption.getOrElse("gen")
    val spark = GraftSession
      .builder(sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    mode match {
      case "gen" => gen(spark,
        args.lift(1).getOrElse("/root/testdata/sf0.1"),
        args.lift(2).getOrElse("/tmp/graft_slope10x"),
        args.lift(3).map(_.toInt).getOrElse(10))
      case "gdx" => gdxSnapshots(spark,
        args.lift(1).getOrElse("/tmp/graft_slope_gdx"))
      case "dv" => dvDelete(spark,
        args.lift(1).getOrElse("/tmp/graft_slope_dv"))
      case "mv" => mvWin(spark,
        args.lift(1).getOrElse("/root/testdata/sf0.1"))
      case "zorder" => zorder(spark,
        args.lift(1).getOrElse("/tmp/graft_slope_zorder"))
      case "spj" => spj(spark,
        args.lift(1).getOrElse("/tmp/graft_slope_spj"))
      case "topn" => topn(spark,
        args.lift(1).getOrElse("/tmp/graft_slope_topn"))
      case "evo" => evo(spark,
        args.lift(1).getOrElse("/tmp/graft_slope_evo"))
      case "cluster" => clusterLane(spark,
        args.lift(1).getOrElse("/tmp/graft_slope_cluster"))
      case "merge" => mergeScope(spark,
        args.lift(1).getOrElse("/tmp/graft_slope_merge"))
      case "recluster" => reclusterLane(spark,
        args.lift(1).getOrElse("/tmp/graft_slope_recluster"))
      case "planmeta" => planMeta(spark,
        args.lift(1).getOrElse("/tmp/graft_slope_planmeta"))
      case "shred" => shredLane(spark,
        args.lift(1).getOrElse("/tmp/graft_slope_shred"))
      case other => sys.error(s"unknown SlopeLab mode: $other")
    }
    spark.stop()
  }

  /** Write `df` as ONE parquet file at exactly `target` (the driver
    * testdata is single-file-per-table; eventsStream's pathGlobFilter
    * depends on the file being named events.parquet). */
  private def writeSingleFile(df: DataFrame, target: String): Unit = {
    val tmp = target + "_tmpdir"
    df.coalesce(1).write.mode("overwrite").parquet(tmp)
    val part = new java.io.File(tmp).listFiles()
      .find(_.getName.endsWith(".parquet"))
      .getOrElse(sys.error(s"no part file under $tmp"))
    Files.deleteIfExists(Paths.get(target))
    Files.move(part.toPath, Paths.get(target))
    new java.io.File(tmp).listFiles().foreach(_.delete())
    Files.deleteIfExists(Paths.get(tmp))
  }

  def gen(spark: SparkSession, src: String, out: String,
          factor: Int): Unit = {
    new java.io.File(out).mkdirs()

    // events: `factor` user cohorts over the SAME time span — state
    // cardinality (keys × watermark) scales with users, raw volume
    // with rows, exactly the axis the streaming-state slope measures
    val ev = spark.read.parquet(s"$src/events.parquet")
    val evMax = ev.agg(max("event_id")).head.getLong(0) + 1
    val evN = (0 until factor).map { c =>
      ev.select(
        (col("event_id") + lit(c * evMax)).as("event_id"), col("ts"),
        (col("user_id") + lit(c * 10000000L)).as("user_id"),
        col("event_type"), col("value"), col("props"))
    }.reduce(_ unionAll _)
    writeSingleFile(evN, s"$out/events.parquet")

    // documents: word-shuffled replicas (id-offset; shuffle seeded by
    // replica doc_id so the corpus is deterministic run to run).
    // n_chars is preserved exactly — a space-join of the same words.
    val shuffleWords = udf { (text: String, seed: Long) =>
      new scala.util.Random(seed).shuffle(text.split(" ").toList)
        .mkString(" ")
    }
    val docs = spark.read.parquet(s"$src/documents.parquet")
    val dMax = docs.agg(max("doc_id")).head.getLong(0) + 1
    val docsN = (0 until factor).map { c =>
      val id = col("doc_id") + lit(c * dMax)
      docs.select(id.as("doc_id"),
        (if (c == 0) col("text") else shuffleWords(col("text"), id))
          .as("text"),
        col("lang"), col("source"), col("n_chars"))
    }.reduce(_ unionAll _)
    writeSingleFile(docsN, s"$out/documents.parquet")

    // everything else rides along via symlink — dimension joins keep
    // their real shapes without copying bytes
    Tables.names.filterNot(n => n == "events" || n == "documents")
      .foreach { n =>
        val link = Paths.get(out, s"$n.parquet")
        Files.deleteIfExists(link)
        Files.createSymbolicLink(link, Paths.get(src, s"$n.parquet"))
      }
    println(s"""{"slope_gen":"$out","factor":$factor,""" +
      s""""events":${evN.count()},"documents":${docsN.count()}}""")
  }

  /** Changefeed snapshot scaling: same total rows, committed as V
    * append snapshots of F files each; measure full-drain stream read
    * and manifest growth. */
  def gdxSnapshots(spark: SparkSession, work: String): Unit = {
    import spark.implicits._
    val fmt = "graft.sources.GdxSource"
    for (commits <- Seq(10, 50, 100)) {
      val dir = s"$work/v$commits"
      val rowsPerCommit = 20000 / commits
      rm(new java.io.File(dir))
      for (c <- 0 until commits) {
        (0 until rowsPerCommit).map(i =>
          (c.toLong * rowsPerCommit + i, s"v$c")).toDF("k", "v")
          .repartition(2)
          .write.format(fmt).option("path", dir).mode("append").save()
      }
      val manifestBytes = new java.io.File(dir).listFiles()
        .filter(_.getName.startsWith("_manifest")).map(_.length()).sum
      def drain(): Double = {
        val t0 = System.nanoTime()
        val q = spark.readStream.format(fmt).option("path", dir).load()
          .groupBy("v").agg(count(lit(1)).as("n"))
        val got = graft.streaming.StreamingOps
          .runToMemory(spark, q, s"slope_gdx_$commits")
        require(got.count() == commits,
          s"drain saw ${got.count()} groups, want $commits")
        (System.nanoTime() - t0) / 1e9
      }
      val t = Seq(drain(), drain()).min
      // the retention end-state: vacuum to one snapshot and re-measure —
      // with delta manifests + checkpoints this is O(total files), the
      // bound a long-lived 100 TB table actually lives at
      graft.sources.GdxSource.vacuum(dir,
        graft.sources.GdxSource.driverConf(), keepLast = 1)
      val vacuumedBytes = new java.io.File(dir).listFiles()
        .filter(_.getName.startsWith("_manifest")).map(_.length()).sum
      println(f"""{"gdx_snapshots":$commits,"rows":${commits * rowsPerCommit},"drain_sec":$t%.3f,"manifest_bytes":$manifestBytes,"manifest_bytes_vacuumed":$vacuumedBytes}""")
    }
  }

  /** Deletion-vector scaling: delete a fixed 1% by predicate from a
    * table at 1× and 10× rows. The claims under test: delete cost is
    * ONE linear scan (candidate parse + sidecar writes — a quadratic
    * or rewrite-bound path would print ≫10× at 10×), sidecar bytes
    * track DELETED rows only (not table size — the reason a sparse
    * 100 TB delete costs kilobytes), and the post-delete read tax is
    * one bitmap probe per row. */
  def dvDelete(spark: SparkSession, work: String): Unit = {
    import spark.implicits._
    val fmt = "graft.sources.GdxSource"
    for (n <- Seq(200000, 2000000)) {
      val dir = s"$work/n$n"
      rm(new java.io.File(dir))
      spark.range(0, n.toLong).select(col("id").as("k"),
          concat(lit("payload_"), col("id")).as("v"))
        .repartition(10)
        .write.format(fmt).option("path", dir).mode("append").save()
      def timeIt[A](f: => A): (A, Double) = {
        val t0 = System.nanoTime()
        val a = f
        (a, (System.nanoTime() - t0) / 1e9)
      }
      val (_, tReadPre) = timeIt(
        spark.read.format(fmt).option("path", dir).load().count())
      val ((_, deleted), tDel) = timeIt(graft.sources.GdxSource
        .delete(spark, dir, col("k") % 100 === 7))
      val dvBytes = new java.io.File(dir).listFiles()
        .filter(_.getName.endsWith(".dvx")).map(_.length()).sum
      val dataBytes = new java.io.File(dir).listFiles()
        .filter(_.getName.endsWith(".gdx")).map(_.length()).sum
      val (cnt, tReadPost) = timeIt(
        spark.read.format(fmt).option("path", dir).load().count())
      require(cnt == n - deleted, s"post-delete count $cnt")
      println(f"""{"dv_rows":$n,"deleted":$deleted,"delete_sec":$tDel%.3f,"read_pre_sec":$tReadPre%.3f,"read_post_sec":$tReadPost%.3f,"dv_bytes":$dvBytes,"data_bytes":$dataBytes}""")
    }
  }

  /** Z-order clustering scaling: a (k, v, p, sp) table at 1× and 10×
    * rows, p/sp decorrelated from k. Claims under test: the OPTIMIZE
    * rewrite is one quantile sample + one range shuffle (≈linear —
    * a super-linear regime prints ≫10×), and the 2-D-box planned-file
    * FRACTION is scale-invariant (skipping effectiveness is a property
    * of the layout, not the table size — the property that makes the
    * 100 TB dashboard slice touch the same share of files as the
    * harness-scale one). */
  def zorder(spark: SparkSession, work: String): Unit = {
    import spark.implicits._
    import org.apache.spark.sql.sources.{GreaterThanOrEqual, LessThan}
    val fmt = "graft.sources.GdxSource"
    val gdx = graft.sources.GdxSource
    for (n <- Seq(600000, 6000000)) {
      val dir = s"$work/n$n"
      rm(new java.io.File(dir))
      Seq((0L, "seed")).toDF("k", "v").coalesce(1)
        .write.format(fmt).option("path", dir).mode("overwrite").save()
      gdx.addColumn(dir, "p", org.apache.spark.sql.types.LongType)
      gdx.addColumn(dir, "sp", org.apache.spark.sql.types.LongType)
      spark.range(0, n.toLong).select(col("id").as("k"),
          concat(lit("r"), col("id") % 5).as("v"),
          ((col("id") * 7919L) % 100000L).as("p"),
          ((col("id") * 104729L) % 10000L).as("sp"))
        .repartitionByRange(32, col("k"))
        .write.format(fmt).option("path", dir).mode("overwrite").save()
      val box = Seq(GreaterThanOrEqual("p", 10000L), LessThan("p", 30000L),
        GreaterThanOrEqual("sp", 1000L), LessThan("sp", 3000L))
      val (preKept, preTotal) = gdx.plannedFiles(dir, box)
      val t0 = System.nanoTime()
      gdx.optimizeZOrder(spark, dir, Seq("p", "sp"), target = 32)
      val tOpt = (System.nanoTime() - t0) / 1e9
      val (postKept, postTotal) = gdx.plannedFiles(dir, box)
      def timeIt[A](f: => A): Double = {
        val t = System.nanoTime(); f; (System.nanoTime() - t) / 1e9
      }
      val scan = timeIt(spark.read.format(fmt).option("path", dir).load()
        .filter(col("p") >= 10000L && col("p") < 30000L &&
          col("sp") >= 1000L && col("sp") < 3000L).count())
      println(f"""{"zorder_rows":$n,"optimize_sec":$tOpt%.3f,"box_files_pre":"$preKept/$preTotal","box_files_post":"$postKept/$postTotal","box_scan_sec":$scan%.3f}""")
    }
  }

  /** The storage-partitioned-join win, measured: a fact table and a
    * 10%-sized delta, both hive-partitioned on p = k % 64, joined on
    * (p, k) and rolled up — timed with the SPJ session switches ON
    * (KeyGroupedPartitioning honored: ZERO exchanges) vs OFF (classic:
    * both sides shuffle) at 1× and 10× rows. The expected shape: both
    * regimes track N (nothing super-linear), the ON path saves the
    * full shuffle write+read of BOTH tables — the constant that
    * dominates a 100 TB fact⋈fact join — and the exchange counts pin
    * the plans actually measured. */
  /** The range-scoped MERGE win, measured: a point-update MERGE whose
    * ON carries static key bounds (`t.k = s.k AND t.k >= a AND t.k <
    * b`) touches the WINDOW's files, not the table's — its cost must
    * stay ~flat across a 10× scale-up of the target, while the
    * pruning-defeated control (an inert `WHEN NOT MATCHED BY SOURCE
    * AND 1 = 0 THEN DELETE` clause — semantically a no-op, but NMBS
    * must test every live row, so the whole table joins) tracks table
    * size. This is the 100 TB point-update story: the day's
    * correction merge costs the day, not the decade. */
  /** CLUSTER BY scaling: a fixed 2%-of-range band query against a
    * table whose writes were planner-range-clustered on `w` (declared
    * CLUSTER BY) vs an identically-sized value-scattered control, at
    * 1× and 10× rows. Healthy shape: the clustered read tracks the
    * BAND (files planned stays a small constant fraction, seconds
    * near-flat), the control tracks the TABLE (every file planned).
    * The write-side cost of the declaration (the range exchange) is
    * reported too — that is the trade the layout buys its reads
    * with. Both sides target ~32 files so the comparison prices
    * pruning, not file-count skew. */
  def clusterLane(spark: SparkSession, work: String): Unit = {
    val fmt = "graft.sources.GdxSource"
    val gdx = graft.sources.GdxSource
    for (n <- Seq(600000L, 6000000L)) {
      val cdir = s"$work/cl_n$n"; val udir = s"$work/un_n$n"
      Seq(cdir, udir).foreach(d => rm(new java.io.File(d)))
      def rows = spark.range(0, n).select(col("id").as("k"),
        ((col("id") * 7919L) % 1000000L).cast("double").as("w"),
        concat(lit("r"), col("id") % 5).as("v"))
      val advisory = math.max(65536L, n * 15L / 32L).toString
      val cw = Sessions.pinned(spark,
        "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> advisory,
        "spark.sql.adaptive.coalescePartitions.minPartitionSize" ->
          "65536")
      rows.limit(0).write.format(fmt).option("path", cdir)
        .mode("overwrite").save()
      gdx.setClusterBy(cdir, Seq("w"))
      val w0 = System.nanoTime()
      Sessions.rebind(rows, cw).write.format(fmt).option("path", cdir)
        .mode("append").save()
      val wc = (System.nanoTime() - w0) / 1e9
      val u0 = System.nanoTime()
      rows.repartition(32).write.format(fmt).option("path", udir)
        .mode("overwrite").save()
      val wu = (System.nanoTime() - u0) / 1e9
      val band = Seq(
        org.apache.spark.sql.sources
          .GreaterThanOrEqual("w", 500000.0: Any),
        org.apache.spark.sql.sources.LessThan("w", 520000.0: Any))
      def q(dir: String): Double = {
        val t0 = System.nanoTime()
        spark.read.format(fmt).option("path", dir).load()
          .filter(col("w") >= 500000.0 && col("w") < 520000.0)
          .agg(count(lit(1)), sum("w")).collect()
        (System.nanoTime() - t0) / 1e9
      }
      q(cdir); q(udir) // warm codegen/classloading off the 1× column
      val (tc, tu) = (q(cdir), q(udir))
      val (ck, ca) = gdx.plannedFiles(cdir, band)
      val (uk, ua) = gdx.plannedFiles(udir, band)
      println(f"""{"cluster_rows":$n,"clustered_sec":$tc%.3f,"scattered_sec":$tu%.3f,"clustered_files":"$ck/$ca","scattered_files":"$uk/$ua","clustered_write_sec":$wc%.2f,"scattered_write_sec":$wu%.2f}""")
    }
  }

  /** Variant-shredding lane: the same JSON corpus stored twice — once
    * with a declared shadow (`meta_lang` shredded from `$.lang`, range
    * layout on the derived value) and once as a bare variant column in
    * the identical layout. The slice query arrives as
    * `variant_get(meta, '$.lang', 'string') = <v>` on BOTH tables; on
    * the shredded one the optimizer rewrite + the shadow's truncated
    * string bounds turn it into a pruned column filter, so its cost
    * must track the SLICE (near-flat across a 10× corpus scale-up),
    * while the bare table must scan and JSON-parse every row and
    * scales with the corpus. plannedFiles(kept/all) is the witness
    * that the win is file-skipping, not caching. */
  def shredLane(spark: SparkSession, work: String): Unit = {
    val fmt = "graft.sources.GdxSource"
    val gdx = graft.sources.GdxSource
    import org.apache.spark.sql.types.{LongType, StringType, StructField,
      StructType, VariantType}
    for (n <- Seq(300000L, 3000000L)) {
      val sdir = s"$work/sh_n$n"; val bdir = s"$work/bare_n$n"
      Seq(sdir, bdir).foreach(d => rm(new java.io.File(d)))
      // realistic document weight: a ~300-char text field makes the
      // bare table's full-corpus JSON parse the dominant cost, which
      // is exactly what shredding exists to avoid
      def rows = spark.range(0, n).select(col("id").as("k"),
        parse_json(to_json(struct(
          concat(lit("l"), lpad((col("id") % 1024).cast("string"),
            4, "0")).as("lang"),
          (col("id") % 97).as("n"),
          concat(lit("body "), lpad(col("id").cast("string"), 290, "x"))
            .as("text")))).as("meta"))
      val shredded = StructType(Seq(StructField("k", LongType),
        StructField("meta", VariantType),
        gdx.withShred(StructField("meta_lang", StringType),
          "meta", "lang")))
      gdx.commitFiles(sdir, gdx.driverConf(), replace = true, Seq.empty,
        expectedBase = 0, writeSchema = shredded)
      val langOf = expr("variant_get(meta, '$.lang', 'string')")
      rows.withColumn("meta_lang", lit(null).cast("string"))
        .repartitionByRange(32, langOf, col("k"))
        .write.format(fmt).option("path", sdir).mode("append").save()
      rows.repartitionByRange(32, langOf, col("k"))
        .write.format(fmt).option("path", bdir).mode("overwrite").save()
      def frame(dir: String, v: String) =
        spark.read.format(fmt).option("path", dir).load()
          .filter(expr(
            s"variant_get(meta, '$$.lang', 'string') = '$v'"))
          .agg(count(lit(1)),
            sum(expr("variant_get(meta, '$.n', 'long')")))
      def q(dir: String, v: String): Double = {
        val t0 = System.nanoTime()
        frame(dir, v).collect()
        (System.nanoTime() - t0) / 1e9
      }
      // witness that the optimizer rewrote the PREDICATE onto the
      // shadow (the projection's $.n variant_get legitimately stays)
      val rewrote = !frame(sdir, "l0011").queryExecution.optimizedPlan
        .collect { case f: org.apache.spark.sql.catalyst.plans.logical
            .Filter => f }
        .exists(_.condition.exists {
          case _: org.apache.spark.sql.catalyst.expressions.variant
              .VariantGet => true
          case _ => false
        })
      q(sdir, "l0007"); q(bdir, "l0007") // warm codegen off the column
      val (ts, tb) = (q(sdir, "l0011"), q(bdir, "l0011"))
      val (sk, sa) = gdx.plannedFiles(sdir, Seq(
        org.apache.spark.sql.sources.EqualTo("meta_lang", "l0011")))
      println(f"""{"shred_rows":$n,"shredded_sec":$ts%.3f,"bare_sec":$tb%.3f,"shredded_files":"$sk/$sa","rewrote":$rewrote}""")
    }
  }

  /** Incremental-recluster lane: a CLEAN clustered snapshot takes a
    * FIXED-SIZE narrow append, then `optimizeClustered` runs. The
    * incremental path rewrites only the overlap closure (the delta
    * plus at most its one neighbouring file), so its cost must stay
    * FLAT across a 10× base scale-up, while the pruning-defeated
    * control (a value-scattered base — every file overlaps every
    * other, the overlap closure IS the snapshot, i.e. exactly what a
    * full recluster pays) grows with the base. The untouched-file
    * count is the PruneAudit-style witness. */
  def reclusterLane(spark: SparkSession, work: String): Unit = {
    val fmt = "graft.sources.GdxSource"
    val gdx = graft.sources.GdxSource
    val deltaRows = 60000L // fixed: the day's append, not the decade
    for (n <- Seq(600000L, 6000000L)) {
      def base = spark.range(0, n).select(col("id").as("k"),
        ((col("id") * 7919L) % 1000000L).cast("double").as("w"),
        concat(lit("r"), col("id") % 5).as("v"))
      // the day's delta: a NARROW w band (overlaps ~1 clustered file)
      def delta = spark.range(0, deltaRows).select(
        (col("id") + 100000000L).as("k"),
        (lit(500000.0) + (col("id") % 10000L).cast("double")).as("w"),
        lit("d").as("v"))
      def build(dir: String, clustered: Boolean): Unit = {
        rm(new java.io.File(dir))
        if (clustered) {
          base.repartitionByRange(16, col("w"))
            .sortWithinPartitions("w")
            .write.format(fmt).option("path", dir)
            .mode("overwrite").save()
        } else {
          base.repartition(16)
            .write.format(fmt).option("path", dir)
            .mode("overwrite").save()
        }
        delta.coalesce(1).write.format(fmt).option("path", dir)
          .mode("append").save()
      }
      def run(dir: String): (Double, Int, Int, Int) = {
        val before = gdx.committedEntries(dir, gdx.driverConf())
          .map(_.name).toSet
        val t0 = System.nanoTime()
        val (b, a) = gdx.optimizeClustered(spark, dir, Seq("w"), 16)
        val sec = (System.nanoTime() - t0) / 1e9
        val after = gdx.committedEntries(dir, gdx.driverConf())
          .map(_.name).toSet
        (sec, b, a, before.intersect(after).size)
      }
      val inc = s"$work/inc_n$n"; val ctl = s"$work/ctl_n$n"
      build(inc, clustered = true); build(ctl, clustered = false)
      val (ti, bi, ai, ui) = run(inc)
      val (tc, bc, ac, uc) = run(ctl)
      println(f"""{"recluster_rows":$n,"incremental_sec":$ti%.2f,"incremental_files":"$bi->$ai","incremental_untouched":$ui,"full_control_sec":$tc%.2f,"control_files":"$bc->$ac","control_untouched":$uc}""")
    }
  }

  /** Distributed-metadata-planning lane: a FABRICATED checkpoint
    * manifest of N stat-bearing entries (planning never opens a data
    * file, so the lane measures metadata work alone — the 100M-file
    * regime scaled down), timed as snapshot-entry resolution + zone-map
    * prune through the DRIVER loop vs the DISTRIBUTED path (the
    * `spark.gdx.plan.distributedMinBytes` threshold forced high/low).
    * Healthy shape: the driver loop tracks N; the distributed path
    * amortizes across executors and stays near-flat across the 10×. */
  def planMeta(spark: SparkSession, work: String): Unit = {
    val gdx = graft.sources.GdxSource
    for (n <- Seq(250000, 2500000)) {
      val dir = s"$work/n$n"
      rm(new java.io.File(dir))
      new java.io.File(dir).mkdirs()
      val pw = new java.io.PrintWriter(
        new java.io.BufferedWriter(new java.io.FileWriter(
          s"$dir/_manifest-00000001"), 1 << 20))
      pw.println("#schema k:long,v:string")
      var i = 0
      while (i < n) {
        val lo = i * 100L
        pw.println(s"f$i.gdx\t100\t$lo\t${lo + 99}\tb:4096")
        i += 1
      }
      pw.close()
      val band = Seq(org.apache.spark.sql.sources
        .GreaterThanOrEqual("k", n * 99L: Any)) // keep ~1% of files —
        // the selective dashboard slice a 100M-file table plans
      def planOnce(minBytes: String): (Double, Int) = {
        val s = Sessions.pinned(spark,
          "spark.gdx.plan.distributedMinBytes" -> minBytes)
        Sessions.withActive(s) {
          val t0 = System.nanoTime()
          val kept = gdx.plannedEntries(dir, gdx.driverConf(), -1,
            band).size
          ((System.nanoTime() - t0) / 1e9, kept)
        }
      }
      // the PRODUCTION surface: a spark.read scan whose physical
      // planning (planInputPartitions) resolves entries through the
      // same threshold switch — `.rdd.getNumPartitions` forces the
      // partition planning without launching a job (the fabricated
      // files hold no data), so the lane times exactly what a real
      // query's planning pays
      def scanOnce(minBytes: String): (Double, Int) = {
        val s = Sessions.pinned(spark,
          "spark.gdx.plan.distributedMinBytes" -> minBytes)
        Sessions.withActive(s) {
          val t0 = System.nanoTime()
          val parts = s.read.format("graft.sources.GdxSource")
            .option("path", dir).load()
            .filter(org.apache.spark.sql.functions.col("k") >= n * 99L)
            .rdd.getNumPartitions
          ((System.nanoTime() - t0) / 1e9, parts)
        }
      }
      // warm both paths once (classloading, FS page cache), then min-of-2
      planOnce(Long.MaxValue.toString); planOnce("1")
      val (tDrv, kDrv) = Seq(planOnce(Long.MaxValue.toString),
        planOnce(Long.MaxValue.toString)).minBy(_._1)
      val (tDist, kDist) = Seq(planOnce("1"), planOnce("1"))
        .minBy(_._1)
      require(kDrv == kDist, s"paths disagree: $kDrv vs $kDist")
      scanOnce(Long.MaxValue.toString); scanOnce("1")
      val (rDrv, pDrv) = Seq(scanOnce(Long.MaxValue.toString),
        scanOnce(Long.MaxValue.toString)).minBy(_._1)
      val before = gdx.distributedPlanCount.get()
      val (rDist, pDist) = Seq(scanOnce("1"), scanOnce("1")).minBy(_._1)
      require(gdx.distributedPlanCount.get() > before,
        "spark.read did not engage the distributed planner")
      require(pDrv == pDist, s"scan paths disagree: $pDrv vs $pDist")
      println(f"""{"planmeta_entries":$n,"kept":$kDrv,"driver_sec":$tDrv%.3f,"distributed_sec":$tDist%.3f,"scan_planned_files":$pDrv,"scan_driver_sec":$rDrv%.3f,"scan_distributed_sec":$rDist%.3f}""")
    }
  }

  def mergeScope(spark: SparkSession, work: String): Unit = {
    val fmt = "graft.sources.GdxSource"
    val gdx = graft.sources.GdxSource
    for (n <- Seq(600000L, 6000000L)) {
      val srcView = s"slope_mrg_src_$n"
      spark.range(0, 1000).select((col("id") * 50L).as("k"),
          lit("upd").as("nv"))
        .createOrReplaceTempView(srcView)
      def run(scoped: Boolean): (Double, Int, Int) = {
        val dir = s"$work/m${if (scoped) "s" else "c"}_n$n"
        rm(new java.io.File(dir))
        spark.range(0, n).select(col("id").as("k"),
            concat(lit("r"), col("id") % 5).as("v"))
          .repartitionByRange(32, col("k"))
          .write.format(fmt).option("path", dir).mode("overwrite").save()
        val before = gdx.committedEntries(dir, gdx.driverConf())
          .map(e => (e.name, e.dv)).toSet
        val tbl = s"slope_mrg_${if (scoped) "s" else "c"}_$n"
        spark.sql(s"""CREATE TABLE $tbl (k BIGINT, v STRING)
          USING $fmt OPTIONS (path '$dir')""")
        val onTail = if (scoped) " AND t.k >= 0 AND t.k < 50000" else ""
        val nmbs = if (scoped) ""
          else "\nWHEN NOT MATCHED BY SOURCE AND 1 = 0 THEN DELETE"
        val t0 = System.nanoTime()
        spark.sql(
          s"""MERGE INTO $tbl t USING $srcView s ON t.k = s.k$onTail
            WHEN MATCHED THEN UPDATE SET v = s.nv
            WHEN NOT MATCHED THEN INSERT (k, v) VALUES (s.k, s.nv)""" +
            nmbs)
        val sec = (System.nanoTime() - t0) / 1e9
        val carried = gdx.committedEntries(dir, gdx.driverConf())
          .map(e => (e.name, e.dv)).toSet.intersect(before).size
        spark.sql(s"DROP TABLE $tbl")
        (sec, carried, before.size)
      }
      // one untimed pass per variant first: the MERGE path's codegen
      // and classloading would otherwise pollute the 1× column
      run(scoped = true); run(scoped = false)
      val (ts, cs, total) = run(scoped = true)
      val (tc, cc, _) = run(scoped = false)
      println(f"""{"merge_rows":$n,"scoped_sec":$ts%.3f,"control_sec":$tc%.3f,"scoped_carried":"$cs/$total","control_carried":"$cc/$total"}""")
    }
  }

  def spj(spark: SparkSession, work: String): Unit = {
    val fmt = "graft.sources.GdxSource"
    for (n <- Seq(600000L, 6000000L)) {
      val (dirA, dirB) = (s"$work/fact_n$n", s"$work/delta_n$n")
      Seq(dirA, dirB).foreach(d => rm(new java.io.File(d)))
      spark.range(0, n).select(col("id").as("k"),
          concat(lit("r"), col("id") % 5).as("v"),
          (col("id") % 64L).as("p"))
        .write.format(fmt).option("path", dirA)
        .option("partitionBy", "p").mode("overwrite").save()
      spark.range(0, n / 10).select((col("id") * 10L).as("k"),
          lit("d").as("v"), ((col("id") * 10L) % 64L).as("p"))
        .write.format(fmt).option("path", dirB)
        .option("partitionBy", "p").mode("overwrite").save()
      def q(session: SparkSession): DataFrame = {
        val a = session.read.format(fmt).option("path", dirA).load()
        val b = session.read.format(fmt).option("path", dirB).load()
          .withColumnRenamed("v", "bv")
        a.join(b, Seq("p", "k")).groupBy("p")
          .agg(count(lit(1)).as("n"), sum("k").as("sum_k"))
      }
      val on = Sessions.pinned(spark,
        "spark.sql.sources.v2.bucketing.enabled" -> "true",
        "spark.sql.autoBroadcastJoinThreshold" -> "-1",
        "spark.sql.requireAllClusterKeysForCoPartition" -> "false")
      val off = Sessions.pinned(spark,
        "spark.sql.sources.v2.bucketing.enabled" -> "false",
        "spark.sql.autoBroadcastJoinThreshold" -> "-1")
      def exchanges(session: SparkSession): Int =
        "Exchange".r.findAllIn(
          q(session).queryExecution.executedPlan.toString()).length
      def bestOf3(session: SparkSession): Double = (1 to 3).map { _ =>
        val t0 = System.nanoTime()
        q(session).collect()
        (System.nanoTime() - t0) / 1e9
      }.min
      val (exOn, exOff) = (exchanges(on), exchanges(off))
      val (tOn, tOff) = (bestOf3(on), bestOf3(off))
      println(f"""{"spj_rows":$n,"join_spj_sec":$tOn%.3f,"join_shuffle_sec":$tOff%.3f,"spj_exchanges":$exOn,"shuffle_exchanges":$exOff}""")
    }
  }

  /** The TopN-pushdown win, measured: `ORDER BY k DESC LIMIT 50` on a
    * range-clustered table at 1× and 10× rows. The expected shape:
    * planned files and query time are FLAT across the scale-up (the
    * threshold proof needs one covering file regardless of snapshot
    * size — the property that makes a latest-N query on a 100 TB
    * key-clustered fact metadata-cost), while the same query with the
    * skip inert (a residual filter voids the row-count guarantee)
    * tracks total rows. */
  def topn(spark: SparkSession, work: String): Unit = {
    val fmt = "graft.sources.GdxSource"
    for (n <- Seq(600000L, 6000000L)) {
      val dir = s"$work/n$n"
      rm(new java.io.File(dir))
      spark.range(0, n).select(col("id").as("k"),
          concat(lit("r"), col("id") % 5).as("v"))
        .repartitionByRange(32, col("k"))
        .write.format(fmt).option("path", dir).mode("overwrite").save()
      def read() = spark.read.format(fmt).option("path", dir).load()
      val q = read().orderBy(col("k").desc).limit(50)
      val planned = "files=(\\d+)/(\\d+)".r
        .findFirstMatchIn(q.queryExecution.executedPlan.toString())
        .map(m => s"${m.group(1)}/${m.group(2)}").getOrElse("?")
      def bestOf3(f: => Unit): Double = (1 to 3).map { _ =>
        val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
      }.min
      val tSkip = bestOf3(q.collect())
      // control: the filter keeps every row but voids the guarantee,
      // so the same TopN drains the full snapshot
      val tFull = bestOf3(read().filter(col("v") =!= "never")
        .orderBy(col("k").desc).limit(50).collect())
      println(f"""{"topn_rows":$n,"planned_files":"$planned","topn_skip_sec":$tSkip%.3f,"topn_full_sec":$tFull%.3f}""")
    }
  }

  /** Partition-spec evolution lane: HALF the rows (even ids, spanning
    * the full key range) written under identity(p) (16 entity
    * directories), the spec EVOLVED to trunc(w, k) (32 key-range
    * directories) in one metadata commit, the other half (odd ids,
    * same full range) written under the new layout. The probe — an
    * entity filter AND a 1/8th key range — prunes EACH era under its
    * own era's transform: era-1 keeps only the p=3 directory (its
    * files span the whole key range, so only the identity layout can
    * drop them), era-2 keeps only the covered trunc directories (its
    * files hold every p, so only the key bounds can drop them). The
    * scale claims: planned files track covered DIRECTORIES, not rows,
    * and the pruned probe's time stays scheduling-dominated while the
    * unpruned control tracks total rows — the property that makes the
    * layout migration free for a 100 TB dashboard instead of a
    * rewrite. */
  def evo(spark: SparkSession, work: String): Unit = {
    val fmt = "graft.sources.GdxSource"
    val gdx = graft.sources.GdxSource
    for (n <- Seq(600000L, 6000000L)) {
      val dir = s"$work/n$n"
      rm(new java.io.File(dir))
      val w = n / 32
      // p derives from id/2 so BOTH parities (eras) hold every entity
      def rows(parity: Int) = spark.range(0, n)
        .filter(col("id") % 2 === parity)
        .select(col("id").as("k"), expr("(id div 2) % 16").as("p"),
          concat(lit("r"), col("id") % 5).as("v"))
      rows(0).repartition(16)
        .write.format(fmt).option("path", dir)
        .option("partitionBy", "p").mode("overwrite").save()
      gdx.evolvePartitionSpec(dir, s"trunc($w,k)")
      rows(1).repartitionByRange(16, col("k"))
        .write.format(fmt).option("path", dir).mode("append").save()
      def read() = spark.read.format(fmt).option("path", dir).load()
      // entity 3 across a 1/8th key range: rows live in BOTH eras
      val q = read().filter(col("p") === 3 &&
        col("k") >= n / 2 && col("k") < n / 2 + n / 8)
      val planned = "files=(\\d+)/(\\d+)".r
        .findFirstMatchIn(q.queryExecution.executedPlan.toString())
        .map(m => s"${m.group(1)}/${m.group(2)}").getOrElse("?")
      def bestOf3(f: => Unit): Double = (1 to 3).map { _ =>
        val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
      }.min
      val tPruned = bestOf3(q.agg(count(lit(1)), sum("k")).collect())
      // control: the SAME predicate inside a conditional aggregate —
      // no Filter exists to push (x+0 shapes would just constant-fold
      // back), so no directory key or zone map can prune and the scan
      // drains every era row-level
      val cond = col("p") === 3 &&
        col("k") >= n / 2 && col("k") < n / 2 + n / 8
      val tFull = bestOf3(read()
        .agg(count(when(cond, 1)), sum(when(cond, col("k"))))
        .collect())
      println(f"""{"evo_rows":$n,"planned_files":"$planned","evo_pruned_sec":$tPruned%.3f,"evo_full_sec":$tFull%.3f}""")
    }
  }

  /** The MV-rewrite win, measured: the same rollup query timed against
    * the registered summary vs the raw base at sf0.1 — the rewrite's
    * value is this ratio, and it widens linearly with base size (the
    * MV side is O(groups) regardless). */
  def mvWin(spark: SparkSession, sf: String): Unit = {
    val base = Tables.lineitem(spark, sf)
    val mvPath = "/tmp/graft_slope_mv"
    def q() = base.groupBy("l_returnflag")
      .agg(count(lit(1)).as("n"), sum("l_quantity").as("sum_qty"),
        avg("l_quantity").as("avg_qty"), max("l_quantity").as("max_qty"))
    def bestOf3(f: => Long): Double = (1 to 3).map { _ =>
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }.min
    graft.plans.MvRewrite.clear()
    graft.plans.MvRewrite.install(spark)
    val tBase = bestOf3(q().count())
    val t0 = System.nanoTime()
    graft.plans.MvRewrite.materialize(spark, base,
      Seq("l_returnflag", "l_linestatus"), Seq("l_quantity"), mvPath)
    val tBuild = (System.nanoTime() - t0) / 1e9
    val tMv = bestOf3(q().count())
    println(f"""{"mv_base_sec":$tBase%.3f,"mv_rewritten_sec":$tMv%.3f,"mv_build_sec":$tBuild%.3f,"speedup":${tBase / tMv}%.1f}""")
    graft.plans.MvRewrite.clear()
  }
}
