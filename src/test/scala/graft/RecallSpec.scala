package graft

import graft.operators.{Dedup, Multimodal, Similarity}
import graft.functions.TextFunctions.{shingles, tokens}
import graft.functions.VectorFunctions.{asDouble, cosine}
import org.apache.spark.sql.functions._

/** Real-corpus agreement checks for the rows-only (`no_oracle`) queries
  * (VERDICT r5 item 3): each probabilistic/engine-specific path is held
  * against an EXACT reference computation on the driver's own sf0.001
  * testdata — the same corpus the correctness gate runs on — not just
  * planted fixtures. Floors are set below the deterministically measured
  * values so the tests fail on regressions, not on noise (every input
  * and every hash is deterministic here).
  */
class RecallSpec extends SparkSuite {
  import org.apache.spark.sql.graft.ColumnBridge.{column, expression}

  private lazy val docs = Tables.documents(spark, sf()).cache()

  /** Exact ≥ τ 5-shingle Jaccard pairs via brute force (no LSH, no caps). */
  private def exactJaccardPairs(tau: Double): Set[(Long, Long)] = {
    val sets = docs.select(col("doc_id"),
      array_distinct(shingles(tokens(col("text")), 5)).as("s"))
    sets.as("a").join(sets.as("b"), col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"),
        column(graft.functions.JaccardSets(
          expression(col("a.s")), expression(col("b.s")))).as("j"))
      .filter(col("j") >= tau)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
  }

  test("minhash-LSH candidates cover every exact >=0.8 Jaccard pair (sf0.001)") {
    val truth = exactJaccardPairs(0.8)
    assert(truth.nonEmpty, "corpus has no >=0.8 pairs — fixture changed?")
    val cand = Dedup.minhashCandidates(docs)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val missed = truth -- cand
    assert(missed.isEmpty,
      s"LSH missed ${missed.size}/${truth.size} true pairs: ${missed.take(5)}")
  }

  test("simhash band pairs: full recall at Hamming<=3 (pigeonhole) and " +
    "measured floor on the <=6 ball of the real corpus") {
    val sigs = Dedup.simhashSignatures(docs)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    // exact Hamming pairs, computed driver-side over the 500 signatures
    def ball(d: Int): Set[(Long, Long)] = (for {
      (ia, sa) <- sigs.iterator
      (ib, sb) <- sigs.iterator
      if ia < ib && java.lang.Long.bitCount(sa ^ sb) <= d
    } yield (ia, ib)).toSet
    val found = Dedup.cappedSelfJoin(
        Dedup.simhashBands(Dedup.simhashSignatures(docs)),
        payload = Seq("simhash"))
      .filter(expr("bit_count(simhash_a ^ simhash_b)") <= 6)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val guaranteed = ball(3)
    assert((guaranteed -- found).isEmpty,
      s"banding must catch ALL Hamming<=3 pairs; missed ${(guaranteed -- found).size}")
    val b6 = ball(6)
    assert(b6.nonEmpty)
    val recall = (b6 & found).size.toDouble / b6.size
    // 4 bands × 16 bits guarantee recall only through Hamming 3; a d = 4-6
    // pair escapes when its differing bits cover all four bands. Measured
    // 0.628 on this corpus (deterministic) — the floor guards regression
    // without overstating what the scale-correct 4×16 banding delivers.
    assert(recall >= 0.55, f"Hamming<=6 recall $recall%.3f below 0.55 floor")
  }

  test("semantic dedup agrees with brute-force cosine on the real corpus") {
    val e = Tables.embeddings(spark, sf())
      .select(col("vec_id"), asDouble(col("embedding")).as("emb")).cache()
    def truthAt(tau: Double): Set[(Long, Long)] =
      e.as("a").join(e.as("b"), col("a.vec_id") < col("b.vec_id"))
        .select(col("a.vec_id").as("va"), col("b.vec_id").as("vb"),
          cosine(col("a.emb"), col("b.emb")).as("cos"))
        .filter(col("cos") >= tau)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // (a) at the production threshold the real corpus has NO near-dups
    // (brute-force max cosine ≈ 0.48) — the query must agree: every vec
    // its own singleton component, zero removed.
    assert(truthAt(0.96).isEmpty)
    val comp96 = Dedup.semanticSurvivors(e).select("vec_id", "component")
      .collect().map(r => r.getLong(0) -> r.getLong(1))
    assert(comp96.forall { case (v, c) => v == c },
      "brute force finds zero cos>=0.96 pairs but SemDeDup merged some")
    // (b) plant 20 true near-dups ON TOP of the real 500-vec background
    // (clone vec_id < 20 as id+10000 scaled by 1.001 ⇒ cos ≈ 1) and
    // re-run at the production threshold: the cluster-bounded path must
    // co-component nearly all planted pairs amid real data. (A clone can
    // only split from its source on a k-means Voronoi boundary — rare
    // and deterministic here.) NOTE cos-0.45 pairs are deliberately NOT
    // a recall target: 60°-apart vectors are different points and
    // k-means separating them is the design, not a miss.
    val planted = e.filter(col("vec_id") < 20)
      .select((col("vec_id") + 10000).as("vec_id"),
        transform(col("emb"), x => x * 1.001).as("emb"))
    val comp = Dedup.semanticSurvivors(e.unionByName(planted))
      .select("vec_id", "component")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val together = (0L until 20L).count(v => comp(v) == comp(v + 10000))
    assert(together >= 18,
      s"only $together/20 planted near-dup pairs co-componented over the real corpus")
  }

  test("aHash buckets agree with exact pixel dedup on the query corpus") {
    // ids k and k+256 render pixel-identical gradients (dims repeat at 16
    // and 8, blue channel at 256 — all divide 256), so exact pixel dedup
    // groups by id mod 256; aHash being coarser may merge groups but must
    // NEVER split one. Computed with the same kernels the query maps.
    val hashes = (0L until 500L).map(id =>
      id -> Multimodal.aHash64(Multimodal.pngBytes(id))).toMap
    (0L until 244L).foreach { k =>
      assert(hashes(k) == hashes(k + 256),
        s"pixel-identical images $k and ${k + 256} landed in different buckets")
    }
  }

  test("HLL estimates within 5% of exact distinct counts (sf0.001 lineitem)") {
    val li = Tables.lineitem(spark, sf())
    val exact = li.agg(
      countDistinct(col("l_partkey")).as("p"),
      countDistinct(col("l_orderkey")).as("o")).head()
    val est = li.agg(
      approx_count_distinct(col("l_partkey")).as("p"),
      approx_count_distinct(col("l_orderkey")).as("o")).head()
    // Spark's HLL++ default rsd is 5% (one standard deviation) — a
    // specific column can land outside it; measured 6.4% worst on this
    // data. 8% keeps the estimate honest without flaking on a 1-sigma
    // bound.
    def relErr(e: Long, x: Long) = math.abs(e - x).toDouble / x
    assert(relErr(est.getLong(0), exact.getLong(0)) <= 0.08)
    assert(relErr(est.getLong(1), exact.getLong(1)) <= 0.08)
  }

  test("approx_percentile within 2% of exact percentiles (sf0.001 lineitem)") {
    val li = Tables.lineitem(spark, sf())
    val Array(e50, e90) = li.stat.approxQuantile("l_extendedprice",
      Array(0.5, 0.9), 0.0) // relativeError 0 => exact
    val r = li.agg(expr(
      "approx_percentile(l_extendedprice, array(0.5, 0.9), 1000)").as("pq"))
      .select(element_at(col("pq"), 1), element_at(col("pq"), 2)).head()
    assert(math.abs(r.getDouble(0) - e50) / e50 <= 0.02)
    assert(math.abs(r.getDouble(1) - e90) / e90 <= 0.02)
  }

  test("t_compress_ratio's features and claims agree with an " +
      "independent Deflater run") {
    val out = graft.operators.TextAnalysis
      .queries("t_compress_ratio")(spark, sf())
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(2), r.getBoolean(3), r.getBoolean(4)))).toMap
    val texts = docs.select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val deflater = new java.util.zip.Deflater(6)
    val buf = new Array[Byte](1 << 16)
    val refRatio = texts.map { case (id, text) =>
      val in = text.getBytes("UTF-8")
      deflater.reset(); deflater.setInput(in); deflater.finish()
      var n = 0L
      while (!deflater.finished()) n += deflater.deflate(buf)
      // byte-length feature is exact row-for-row
      assert(out(id)._1 == in.length.toLong,
        s"doc $id: n_bytes ${out(id)._1} != ${in.length}")
      id -> n.toDouble / in.length
    }
    deflater.end()
    // the claims must agree with this INDEPENDENT deflate: sanity
    // (every reference ratio in the pinned band) and discrimination
    // (below-average-uniqueness docs compress better), both of which
    // the query asserted engine-side and pinned TRUE
    assert(out.values.forall(_._2), "ratio_sane must be TRUE")
    assert(out.values.forall(_._3),
      "compress_discriminates must be TRUE")
    assert(refRatio.values.forall(r => r > 0 && r <= 1.5),
      "independent deflate violates the sanity band the claim pins")
  }
}
