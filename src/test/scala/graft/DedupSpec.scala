package graft

import graft.operators.Dedup._
import org.apache.spark.sql.functions._

/** Semantics of the hash-based dedup operators (rows-only in the oracle):
  * planted near-duplicates MUST surface as candidates; unrelated docs
  * must not flood the candidate set. */
class DedupSpec extends SparkSuite {
  import spark.implicits._

  private val base = "the quick brown fox jumps over the lazy dog and then " +
    "runs far away into the deep dark forest to hide from all the hunters " +
    "who chase it every single day without any rest at all for many years"

  private def corpus = {
    // doc 1 = doc 0 with one word changed (near-dup); doc 2 = exact dup of
    // doc 0; docs 10+ are unrelated shuffles of a different vocabulary
    val rnd = new scala.util.Random(7)
    val other = (0 until 30).map { i =>
      val words = Seq("alpha", "beta", "gamma", "delta", "epsilon", "zeta",
        "eta", "theta", "iota", "kappa", s"w$i", s"x$i", s"y$i", s"z$i")
      (10L + i, rnd.shuffle(words ++ words ++ words).mkString(" "))
    }
    (Seq((0L, base), (1L, base.replace("quick", "swift")), (2L, base)) ++
      other).toDF("doc_id", "text")
  }

  test("minhash LSH surfaces planted near-dups and the exact dup") {
    val cand = minhashCandidates(corpus).as[(Long, Long)].collect().toSet
    assert(cand.contains((0L, 1L)), "near-dup pair (0,1) must collide")
    assert(cand.contains((0L, 2L)), "exact dup pair (0,2) must collide")
    assert(cand.contains((1L, 2L)))
  }

  test("verifyJaccard separates near-dups from unrelated candidates") {
    val pairs = Seq((0L, 1L), (0L, 10L)).toDF("doc_a", "doc_b")
    val j = verifyJaccard(pairs, corpus).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    assert(j((0L, 1L)) > 0.5, s"near-dup jaccard ${j((0L, 1L))} should be high")
    assert(j((0L, 10L)) < 0.05, "unrelated jaccard should be ~0")
  }

  test("native JaccardSets equals the array_intersect formulation") {
    import org.apache.spark.sql.graft.ColumnBridge.{column, expression}
    val sets = corpus.select(col("doc_id"),
      array_distinct(split(col("text"), " ")).as("s"))
    val pairs = sets.select(col("doc_id").as("ia"), col("s").as("sa"))
      .crossJoin(sets.select(col("doc_id").as("ib"), col("s").as("sb")))
      .filter(col("ia") < col("ib"))
    val diffs = pairs.select(
      (column(graft.functions.JaccardSets(expression(col("sa")),
        expression(col("sb")))) -
        size(array_intersect(col("sa"), col("sb"))).cast("double") /
          (size(col("sa")) + size(col("sb")) -
            size(array_intersect(col("sa"), col("sb"))))).as("d"))
      .filter(abs(col("d")) > 1e-12).count()
    assert(diffs === 0L)
  }

  test("native MinHash64 equals the min(xxhash64(h,i)) aggregate, slot " +
    "for slot") {
    import graft.functions.TextFunctions.{shingles, tokens}
    import org.apache.spark.sql.graft.ColumnBridge.{column, expression}
    val native = corpus.select(col("doc_id"),
      column(graft.functions.MinHash64(
        expression(shingles(tokens(col("text")), 5)))).as("sig"))
    val sh = corpus
      .select(col("doc_id"), explode(shingles(tokens(col("text")), 5)).as("s"))
      .select(col("doc_id"), xxhash64(col("s")).as("h"))
    val slots = (0 until 64).map(i => min(xxhash64(col("h"), lit(i))).as(s"m$i"))
    val agg = sh.groupBy("doc_id").agg(slots.head, slots.tail: _*)
    val bad = native.join(agg, "doc_id")
      .filter((0 until 64).map(i =>
        col("sig").getItem(i) =!= col(s"m$i")).reduce(_ || _))
      .count()
    assert(bad === 0L, "native signature must match the aggregate bit-for-bit")
  }

  test("simhash: near-dups within small Hamming distance, unrelated far") {
    val sig = simhashSignatures(corpus)
      .as[(Long, Long)].collect().toMap
    def hamming(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    assert(sig(0L) === sig(2L), "exact dup must have identical simhash")
    assert(hamming(sig(0L), sig(1L)) <= 6, "near-dup within Hamming ball")
    assert(hamming(sig(0L), sig(15L)) > 6, "unrelated doc outside ball")
  }

  test("hot LSH bucket is star-capped: no quadratic pair blow-up, " +
    "clones still clustered") {
    // 1000 identical boilerplate docs: every band bucket holds all 1000,
    // so uncapped all-pairs would emit 1000*999/2 ≈ 500k pairs. The cap
    // must reduce that to a star (999 hub pairs) while keeping every
    // clone connected to the hub so the component stage dedups them.
    val boiler = (0L until 1000L).map(i => (i, base)).toDF("doc_id", "text")
    val cand = minhashCandidates(boiler, maxBucket = 256)
    val n = cand.count()
    assert(n === 999L, s"expected 999 star pairs, got $n")
    assert(cand.agg(min("doc_a"), max("doc_a")).as[(Long, Long)].head() ===
      ((0L, 0L)), "all pairs must anchor at the hub (min doc_id)")
    val surv = survivors(boiler, cand).filter(col("is_survivor")).count()
    assert(surv === 1L, "exact clones must collapse to a single survivor")
  }

  test("simhash band join is star-capped on a degenerate bucket, " +
    "signature payload rides through") {
    // 1000 identical docs put all 1000 in every 16-bit band bucket:
    // uncapped, the band self-join emits ~500k pairs; the shared
    // cappedSelfJoin must bound it to the 999-pair hub star, and the
    // simhash payload must survive so the Hamming filter needs no
    // re-join against the signature frame
    val boiler = (0L until 1000L).map(i => (i, base)).toDF("doc_id", "text")
    val pairs = cappedSelfJoin(simhashBands(simhashSignatures(boiler)),
      payload = Seq("simhash"))
    val n = pairs.count()
    assert(n === 999L, s"expected 999 star pairs, got $n")
    assert(pairs.columns.toSet ===
      Set("doc_a", "doc_b", "simhash_a", "simhash_b"))
    assert(pairs.filter(expr("bit_count(simhash_a ^ simhash_b)") =!= 0)
      .count() === 0L, "identical docs must carry identical signatures")
  }

  test("cappedSelfJoin boundary: == maxBucket is all-pairs, +1 is the star") {
    // pins the cap's comparison direction — an off-by-one drift would
    // either quadratically explode the first over-cap bucket or
    // needlessly star-degrade the largest legal one
    val atCap = (0L until 256L).map(i => (i, base)).toDF("doc_id", "text")
    assert(minhashCandidates(atCap, maxBucket = 256).count() ===
      256L * 255 / 2)
    val overCap = (0L until 257L).map(i => (i, base)).toDF("doc_id", "text")
    assert(minhashCandidates(overCap, maxBucket = 256).count() === 256L)
  }

  test("connected components converge on a long chain (pointer jumping)") {
    // a 200-link chain has diameter 200: one-hop propagation would need
    // 200 rounds and silently mislabel at maxIter=10; path halving must
    // converge within 10 and put every node in component 0
    val chain = (0L until 200L).map(i => (i, i + 1)).toDF("doc_a", "doc_b")
    // driverMaxEdges = 0 forces the distributed pointer-jump loop — the
    // thing under test; the small-graph fast path has its own check below
    val comp = connectedComponents(chain, maxIter = 10, driverMaxEdges = 0)
    assert(comp.select(countDistinct("component")).as[Long].head() === 1L)
    assert(comp.agg(max("component")).as[Long].head() === 0L)
  }

  test("incremental classifier is re-delivery idempotent") {
    // the production failure mode: the SAME batch arrives twice (file
    // re-delivered, stream replayed past its checkpoint). After the
    // accepted index absorbed the first delivery's kept docs, the replay
    // must classify every doc IDENTICALLY — same statuses, same attach
    // targets — because a doc's identical signature collides only with
    // its own index entry (self-pairs excluded by doc_a < doc_b) and
    // with the same neighbors as before.
    val docs = Tables.documents(spark, sf())
    val maxId = docs.agg(max("doc_id")).head.getLong(0)
    val b = (maxId + 1) * 4 / 5
    val batch = docs.filter(col("doc_id") >= b)
    val index = frozenIndexSig(spark, sf(), b)
    val first = classifyIncrement(index, batch, docs, b)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
      .sortBy(_._1).toSeq
    val kept = first.filter(_._3 == "kept").map(_._1).toSet
    val grown = index.unionByName(
      minhashSignatures(batch)
        .filter(col("doc_id").isInCollection(kept)))
    val replay = classifyIncrement(grown, batch, docs, b)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
      .sortBy(_._1).toSeq
    assert(first.nonEmpty)
    assert(replay === first)
  }

  test("driver union-find fast path labels exactly like the distributed loop") {
    // multi-component graph with shuffled edge order and a chain long
    // enough to stress path compression; both paths must agree row-for-row
    val edges = ((0L until 150L).map(i => (i, i + 1)) ++           // chain 0-150
      Seq((500L, 600L), (600L, 700L), (700L, 500L)) ++             // triangle
      Seq((900L, 901L))).reverse.toDF("doc_a", "doc_b")
    val fast = connectedComponents(edges).orderBy("id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    val dist = connectedComponents(edges, driverMaxEdges = 0).orderBy("id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(fast === dist)
    assert(fast.filter(_._1 >= 500L).filter(_._1 < 800L).forall(_._2 == 500L))
  }

  test("exact dedup keeps lowest doc_id per content group") {
    val res = corpus.groupBy(md5(col("text")).as("h"))
      .agg(min("doc_id").as("keep"), count(lit(1)).as("n"))
      .filter(col("n") > 1).collect()
    assert(res.length === 1 && res.head.getAs[Long]("keep") === 0L &&
      res.head.getAs[Long]("n") === 2L)
  }

  test("semantic dedup collapses planted embedding near-dups only") {
    // two planted duplicate groups (cos > 0.99 within group) in a sea of
    // independent gaussian vectors (pairwise cos ~ 0 at dim 16): SemDeDup
    // must put each group in one component with the min id surviving, and
    // must not merge any of the unrelated vectors
    val rnd = new scala.util.Random(11)
    def gauss(): Array[Double] = Array.fill(16)(rnd.nextGaussian())
    def jitter(v: Array[Double]): Array[Double] =
      v.map(_ + rnd.nextGaussian() * 0.01)
    val a = gauss(); val b = gauss()
    val rows = Seq((0L, a), (1L, jitter(a)), (2L, jitter(a)),
      (10L, b), (11L, jitter(b))) ++
      (100L until 130L).map(i => (i, gauss()))
    val e = rows.toDF("vec_id", "emb")
    val got = semanticSurvivors(e, k = 4)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getBoolean(2)))
      .toMap
    assert(Seq(0L, 1L, 2L).map(got(_)._1).distinct === Seq(0L),
      "group A must share component 0")
    assert(Seq(10L, 11L).map(got(_)._1).distinct === Seq(10L),
      "group B must share component 10")
    assert(got(0L)._2 && !got(1L)._2 && !got(2L)._2 &&
      got(10L)._2 && !got(11L)._2)
    val unrelated = (100L until 130L).map(got(_))
    assert(unrelated.forall(_._2), "independent vectors must all survive")
  }

  test("native IntersectSizeSorted equals size(array_intersect) on sorted sets") {
    import org.apache.spark.sql.graft.ColumnBridge.{column, expression}
    val pairs = Seq(
      (Seq("a", "b", "c"), Seq("b", "c", "d")), // partial overlap
      (Seq("a", "b"), Seq("c", "d")),           // disjoint
      (Seq("a", "b", "c"), Seq("a", "b", "c")), // identical
      (Seq.empty[String], Seq("a")),            // empty side
      (Seq("aa", "ab"), Seq("ab", "b"))         // shared prefixes
    ).toDF("xs", "ys")
      .select(array_sort(col("xs")).as("xs"), array_sort(col("ys")).as("ys"))
    val got = pairs.select(column(graft.functions.IntersectSizeSorted(
      expression(col("xs")), expression(col("ys")))).as("i"))
      .as[Int].collect().toSeq
    val want = pairs.select(size(array_intersect(col("xs"), col("ys"))))
      .as[Int].collect().toSeq
    assert(got === want && got === Seq(2, 0, 3, 0, 1))
  }
}
