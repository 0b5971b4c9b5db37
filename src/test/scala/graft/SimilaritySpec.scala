package graft

import graft.functions.VectorFunctions._
import org.apache.spark.sql.functions._

/** Vector math correctness + ANN recall against brute force on the real
  * sf0.001 embeddings. */
class SimilaritySpec extends SparkSuite {
  import spark.implicits._

  test("cosine matches hand-computed value") {
    val df = Seq((Array(1.0, 0.0, 1.0), Array(1.0, 1.0, 0.0)))
      .toDF("a", "b")
    val c = df.select(cosine(col("a"), col("b"))).as[Double].head()
    assert(math.abs(c - 0.5) < 1e-12) // dot=1, norms=sqrt2*sqrt2=2
  }

  test("l2 distance matches hand-computed value") {
    val df = Seq((Array(0.0, 3.0), Array(4.0, 0.0))).toDF("a", "b")
    assert(df.select(l2(col("a"), col("b"))).as[Double].head() === 5.0)
  }

  test("native codegen cosine == interpreted HOF cosine, bit for bit") {
    val e = Tables.embeddings(spark, sf())
      .select(col("vec_id"), asDouble(col("embedding")).as("emb"))
    val a = e.select(col("vec_id").as("ia"), col("emb").as("ea")).filter(col("ia") < 50)
    val b = e.select(col("vec_id").as("ib"), col("emb").as("eb")).filter(col("ib") >= 50)
    val diffs = a.crossJoin(b)
      .select((cosine(col("ea"), col("eb")) - cosineHof(col("ea"), col("eb"))).as("d"))
      .filter(col("d") =!= 0.0).count()
    assert(diffs === 0L, "native expression must match the HOF spec exactly")
  }

  test("native expressions usable from SQL after registration") {
    org.apache.spark.sql.graft.ColumnBridge.registerFunction(spark,
      "cosine_sim", exprs => graft.functions.CosineSimilarity(exprs.head, exprs(1)))
    val c = spark.sql(
      "SELECT cosine_sim(CAST(array(1.0,0.0,1.0) AS ARRAY<DOUBLE>), " +
        "CAST(array(1.0,1.0,0.0) AS ARRAY<DOUBLE>)) AS c")
      .as[Double].head()
    assert(math.abs(c - 0.5) < 1e-12)
  }

  test("brute-force top-k is exact and LSH ANN finds same-bucket truth") {
    val topk = SparkEntry.queries("sim_topk")(spark, sf())
      .select("q_id", "c_id", "rk").as[(Long, Long, Long)].collect()
    assert(topk.length === 15) // 3 probes × 5
    // rank-1 neighbor must have the max cosine — recompute independently
    val e = Tables.embeddings(spark, sf())
      .select(col("vec_id"), asDouble(col("embedding")).as("emb"))
    val q0 = e.filter(col("vec_id") === 0).select(col("emb").as("q")).crossJoin(e)
      .filter(col("vec_id") =!= 0)
      .select(col("vec_id"), cosine(col("q"), col("emb")).as("cos"))
      .orderBy(desc("cos")).limit(1).select("vec_id").as[Long].head()
    assert(topk.filter(t => t._1 == 0 && t._3 == 1).head._2 === q0)
    // raw ANN path returns rows and only valid ids (the query entry now
    // emits the exact counterpart + recall claim; the raw path is the
    // library function)
    val ann = graft.operators.Similarity.lshAnnInline(e)
      .select("q_id", "c_id").as[(Long, Long)].collect()
    assert(ann.nonEmpty && ann.forall(t => t._1 != t._2))
    // and the gated query output carries the claim TRUE
    val gated = SparkEntry.queries("sim_lsh_ann")(spark, sf())
    assert(gated.select("recall_ok").distinct().as[Boolean].collect()
      .toSeq === Seq(true))
  }

  test("ANN recall@3 vs exact ground truth stays above a fixed floor") {
    val e = Tables.embeddings(spark, sf())
      .select(col("vec_id"), asDouble(col("embedding")).as("emb"))
    val q = e.filter(col("vec_id") < 10)
      .select(col("vec_id").as("q_id"), col("emb").as("q_emb"))
    val w = org.apache.spark.sql.expressions.Window.partitionBy("q_id")
      .orderBy(desc("cos"), col("c_id"))
    val truth = q.crossJoin(e.select(col("vec_id").as("c_id"), col("emb")))
      .filter(col("c_id") =!= col("q_id"))
      .withColumn("cos", round(cosine(col("q_emb"), col("emb")), 6))
      .withColumn("rk", row_number().over(w)).filter(col("rk") <= 3)
      .select("q_id", "c_id").as[(Long, Long)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    def recall(ann: org.apache.spark.sql.DataFrame): Double = {
      val got = ann.select("q_id", "c_id").as[(Long, Long)].collect()
        .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
      val hits = truth.map { case (qid, t) =>
        (got.getOrElse(qid, Set.empty[Long]) & t).size }.sum
      hits.toDouble / truth.values.map(_.size).sum
    }
    import graft.operators.Similarity
    val lsh = recall(Similarity.lshAnnInline(e))
    val ivf = recall(Similarity.ivfAnnInline(e))
    val pq = recall(Similarity.pqAnn(e, probeMax = 10, shortlist = 32,
      k = 3))
    info(f"recall@3: lsh=$lsh%.2f ivf=$ivf%.2f pq=$pq%.2f")
    // measured on the near-random synthetic embeddings (top-1 cos ≈ 0.37,
    // the hardest regime for sign LSH): lsh=0.77, ivf=0.57. On real
    // near-dup corpora (cos ≥ 0.9) per-table collision rises from ~0.14
    // to ~0.54 and recall approaches 1.
    assert(lsh >= 0.60, f"multi-table LSH recall@3 $lsh%.2f below floor 0.60")
    assert(ivf >= 0.50, f"IVF nprobe=4 recall@3 $ivf%.2f below floor 0.50")
    // PQ-ADC re-ranks an exact-cosine shortlist; with shortlist=32 over
    // the 50-vector sf0.001 corpus the miss risk is pure quantization
    assert(pq >= 0.80, f"PQ-ADC recall@3 $pq%.2f below floor 0.80")
  }

  test("MIPS norm-augmentation: augmented-cosine ranking == dot ranking") {
    // append sqrt(M^2 - |x|^2) to corpus vectors and 0 to the query:
    // cosine on the augmented space orders candidates exactly like the
    // raw inner product, so any cosine index can serve MIPS
    val e = Tables.embeddings(spark, sf())
      .select(col("vec_id"), asDouble(col("embedding")).as("emb"))
    val m2 = e.select(max(dot(col("emb"), col("emb")))).as[Double].head()
    val aug = e.withColumn("aug",
      concat(col("emb"), array(sqrt(lit(m2) - dot(col("emb"), col("emb"))))))
    val q = e.filter(col("vec_id") === 0)
      .select(col("emb").as("q_emb"),
        concat(col("emb"), array(lit(0.0))).as("q_aug"))
    val ranked = aug.crossJoin(broadcast(q))
      .filter(col("vec_id") =!= 0)
      .select(col("vec_id"),
        dot(col("q_emb"), col("emb")).as("ip"),
        cosine(col("q_aug"), col("aug")).as("aug_cos"))
      .collect()
    val byIp = ranked.sortBy(r => (-r.getDouble(1), r.getLong(0))).map(_.getLong(0))
    val byAug = ranked.sortBy(r => (-r.getDouble(2), r.getLong(0))).map(_.getLong(0))
    // full ordering agreement on the head (ties beyond fp noise absent)
    assert(byIp.take(20).toSeq === byAug.take(20).toSeq,
      s"ip=${byIp.take(20).toSeq} aug=${byAug.take(20).toSeq}")
  }

  test("native PqEncode equals the builtin-composition formulation") {
    val rnd = new scala.util.Random(17)
    val e = (0L until 40L).map(i => (i, Array.fill(64)(rnd.nextGaussian())))
      .toDF("vec_id", "emb")
    val books = graft.operators.Similarity.pqCodebooks(e, sampleN = 40)
    val native = e.select(col("vec_id"),
      graft.operators.Similarity.pqEncode(col("emb"), books).as("c"))
    val hof = e.select(col("vec_id"),
      graft.operators.Similarity.pqEncodeHof(col("emb"), books).as("c"))
    assert(native.exceptAll(hof).isEmpty && hof.exceptAll(native).isEmpty)
  }

  test("PQ-ADC retrieves planted near-duplicates as top-1") {
    // the semantically meaningful regime: true near-dups (cos > 0.99) in
    // a sea of independent gaussians — ADC must surface the planted
    // neighbor even before the exact re-rank widens the shortlist
    val rnd = new scala.util.Random(13)
    def gauss(): Array[Double] = Array.fill(64)(rnd.nextGaussian())
    def jitter(v: Array[Double]): Array[Double] =
      v.map(_ + rnd.nextGaussian() * 0.02)
    val a = gauss(); val b = gauss()
    val rows = Seq((0L, a), (1L, b), (100L, jitter(a)), (101L, jitter(b))) ++
      (200L until 260L).map(i => (i, gauss()))
    val e = rows.toDF("vec_id", "emb")
    val top1 = graft.operators.Similarity
      .pqAnn(e, probeMax = 2, shortlist = 16, k = 1)
      .select("q_id", "c_id").as[(Long, Long)].collect().toMap
    assert(top1(0L) === 100L && top1(1L) === 101L)
  }

  test("LSH bucket layout: probe == query-time ANN and the scan is " +
    "partition-pruned") {
    import graft.operators.Similarity
    val e = Tables.embeddings(spark, sf())
      .select(col("vec_id"), asDouble(col("embedding")).as("emb"))
    val dir = java.nio.file.Files.createTempDirectory("graft_lsh")
      .resolve("layout").toString
    Similarity.writeLshLayout(e, dir)
    val q = e.filter(col("vec_id") < 10)
      .select(col("vec_id").as("q_id"), col("emb").as("q_emb"))
    val probed = Similarity.lshProbe(spark, dir, q)
    val got = probed.collect().map(r =>
      (r.getLong(0), r.getLong(1), r.getDouble(2), r.getLong(3))).toSeq
    val direct = Similarity.lshAnnInline(e).orderBy("q_id", "rk")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getLong(3)))
      .toSeq
    assert(got === direct,
      "layout-served ANN must equal the query-time LSH path")
    // the layout scan must carry literal partition filters on both
    // partition columns — that is what makes a probe touch only its
    // buckets instead of the whole corpus
    val plan = probed.queryExecution.executedPlan.toString
    val pf = "PartitionFilters: \\[[^\\]]*tbl[^\\]]*bucket[^\\]]*\\]".r
    assert(pf.findFirstIn(plan).isDefined,
      s"expected non-empty PartitionFilters on the layout scan in:\n$plan")
  }

  test("IVF layout: probe == query-time IVF ANN and the scan is " +
    "partition-pruned") {
    import graft.operators.Similarity
    val e = Tables.embeddings(spark, sf())
      .select(col("vec_id"), asDouble(col("embedding")).as("emb"))
    val dir = java.nio.file.Files.createTempDirectory("graft_ivf")
      .resolve("layout").toString
    Similarity.writeIvfLayoutOnce(e, dir, tag = "spec")
    val q = e.filter(col("vec_id") < 10)
      .select(col("vec_id").as("q_id"), col("emb").as("q_emb"))
    val probed = Similarity.ivfProbe(spark, dir, q)
    val got = probed.collect().map(r =>
      (r.getLong(0), r.getLong(1), r.getDouble(2), r.getLong(3))).toSeq
    val direct = Similarity.ivfAnnInline(e).orderBy("q_id", "rk")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getLong(3)))
      .toSeq
    assert(got === direct,
      "layout-served IVF must equal the query-time IVF path (the index " +
        "build is deterministic end to end)")
    val plan = probed.queryExecution.executedPlan.toString
    val pf = "PartitionFilters: \\[[^\\]]*cluster[^\\]]*\\]".r
    assert(pf.findFirstIn(plan).isDefined,
      s"expected non-empty PartitionFilters on the IVF layout scan in:\n$plan")
  }

  test("IVF incremental append: frozen-quantizer batch extends the " +
    "layout without retraining or rescanning history") {
    import graft.operators.Similarity
    val e = Tables.embeddings(spark, sf())
      .select(col("vec_id"), asDouble(col("embedding")).as("emb"))
    val hist = e.filter(col("vec_id") < 300)
    val batch = e.filter(col("vec_id") >= 300)
    val dir = java.nio.file.Files.createTempDirectory("graft_ivf_inc")
      .resolve("layout").toString
    // day 0: layout built (and quantizer trained) on history only
    val (assignedHist, cents) = Similarity.ivfIndex(hist)
    assignedHist.write.mode("overwrite").partitionBy("cluster").parquet(dir)
    cents.write.mode("overwrite").parquet(s"$dir/_centroids")
    // nightly: the new batch rides ONE frozen-centroid codegen map and
    // lands as appended files inside the existing cluster directories
    Similarity.ivfAssignFrozen(batch,
        spark.read.parquet(s"$dir/_centroids"))
      .write.mode("append").partitionBy("cluster").parquet(dir)
    // the extended layout == assigning the whole corpus under the SAME
    // frozen centroids (what a full rebuild would produce)
    val got = spark.read.parquet(dir)
      .select(col("vec_id"), col("cluster").cast("int").as("cluster"))
      .collect().map(r => (r.getLong(0), r.getInt(1))).toSet
    val want = Similarity.ivfAssignFrozen(e,
        spark.read.parquet(s"$dir/_centroids"))
      .select(col("vec_id"), col("cluster").cast("int").as("cluster"))
      .collect().map(r => (r.getLong(0), r.getInt(1))).toSet
    assert(got === want)
    // probes over the extended layout see appended vectors exactly
    val q = e.filter(col("vec_id") < 5)
      .select(col("vec_id").as("q_id"), col("emb").as("q_emb"))
    val probed = Similarity.ivfProbe(spark, dir, q).collect()
    assert(probed.nonEmpty)
    val newIds = batch.select("vec_id").collect().map(_.getLong(0)).toSet
    // at least the probe machinery can SURFACE appended ids; equality
    // of the whole frame vs a from-scratch union layout:
    val dir2 = java.nio.file.Files.createTempDirectory("graft_ivf_inc2")
      .resolve("layout").toString
    Similarity.ivfAssignFrozen(e, spark.read.parquet(s"$dir/_centroids"))
      .write.mode("overwrite").partitionBy("cluster").parquet(dir2)
    spark.read.parquet(s"$dir/_centroids")
      .write.mode("overwrite").parquet(s"$dir2/_centroids")
    val probed2 = Similarity.ivfProbe(spark, dir2, q).collect()
    assert(probed.map(_.toSeq).toSeq === probed2.map(_.toSeq).toSeq,
      "incrementally-extended layout must probe identically to a full " +
        "rebuild under the same centroids")
    assert((got.map(_._1) & newIds) === newIds,
      "every appended vector is in the layout")
  }

  test("LSH layout build is write-once per corpus tag") {
    import graft.operators.Similarity
    val e = Tables.embeddings(spark, sf())
      .select(col("vec_id"), asDouble(col("embedding")).as("emb"))
    val dir = java.nio.file.Files.createTempDirectory("graft_lsh_once")
      .resolve("layout").toString
    Similarity.writeLshLayoutOnce(e, dir, tag = "v1")
    // plant a sentinel: a rebuild (overwrite) would delete it
    val sentinel = new java.io.File(dir, "sentinel.txt")
    assert(sentinel.createNewFile())
    Similarity.writeLshLayoutOnce(e, dir, tag = "v1")
    assert(sentinel.exists(), "same tag must not rebuild the layout")
    Similarity.writeLshLayoutOnce(e, dir, tag = "v2")
    assert(!sentinel.exists(), "a new corpus tag must rebuild the layout")
  }

  test("IVF fit stays inside the train budget yet assigns the full corpus") {
    val e = Tables.embeddings(spark, sf())
      .select(col("vec_id"), asDouble(col("embedding")).as("emb"))
    val n = e.count()
    // budget 8 ≪ corpus forces the sample-fit path; every row must still
    // get a cluster and exactly k centroids must come back
    val (assigned, centroids) =
      graft.operators.Similarity.ivfIndex(e, k = 4, trainPerCluster = 2)
    assert(n > 8, "corpus must exceed the train budget for this test")
    assert(assigned.count() === n)
    assert(centroids.count() === 4L)
    assert(assigned.select("cluster").distinct().count() <= 4L)
  }

  test("IVF ANN is bounded by brute force and returns per-probe top-3") {
    val bf = SparkEntry.queries("sim_topk")(spark, sf())
      .filter(col("rk") === 1)
      .select("q_id", "cos").as[(Long, Double)].collect().toMap
    val e9 = Tables.embeddings(spark, sf())
      .select(col("vec_id"), asDouble(col("embedding")).as("emb"))
    val ivf = graft.operators.Similarity.ivfAnnInline(e9)
      .select("q_id", "c_id", "cos", "rk")
      .as[(Long, Long, Double, Long)].collect()
    assert(ivf.nonEmpty)
    val byProbe = ivf.groupBy(_._1)
    byProbe.foreach { case (_, rows) =>
      assert(rows.map(_._4).sorted.toSeq === (1L to rows.length))
    }
    // approximate results can never beat the exact max cosine
    byProbe.collect { case (q, rows) if bf.contains(q) =>
      assert(rows.map(_._3).max <= bf(q) + 1e-9)
    }
  }
}
