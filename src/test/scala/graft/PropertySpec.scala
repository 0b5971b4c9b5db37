package graft

import graft.pipeline.CurrencyPipeline
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Property-based semantics (SURVEY.md §5.3): upsert idempotence and
  * replay-order invariance, rolling mean vs brute force — over generated
  * histories, not hand-picked examples. */
class PropertySpec extends SparkSuite {

  /** scalatestplus isn't in the offline cache: drive Gen directly with
    * fixed seeds (deterministic across runs). */
  private def samples[T](g: Gen[T], n: Int): Seq[T] =
    (0 until n).flatMap(i => g.apply(Gen.Parameters.default, Seed(42L + i)))

  import spark.implicits._

  private val ratesGen: Gen[List[(String, Int, Double, Int)]] =
    Gen.listOfN(30, for {
      cc <- Gen.oneOf("USD", "EUR")
      day <- Gen.choose(1, 20)
      rate <- Gen.choose(100, 9999).map(_ / 100.0)
      ingest <- Gen.choose(1, 5)
    } yield (cc, day, rate, ingest))

  private def toDf(rows: List[(String, Int, Double, Int)]) =
    rows.toDF("cc", "day", "rate", "ingest")
      .select(col("cc"), col("rate"),
        expr("date_add(DATE '2025-01-01', day)").as("exchangedate"),
        expr("timestamp_micros(CAST(ingest AS LONG) * 1000000 + " +
          "CAST(rate * 100 AS LONG))").as("ingest_ts"))

  test("statistic queries respect their mathematical ranges") {
    import org.apache.spark.sql.functions._
    // Oracle equivalence can't catch a formula wrong the SAME way in
    // both engines; analytic range invariants can.
    val ks = SparkEntry.queries("a25_ks_drift")(spark, sf())
      .select("ks_d").as[Double].head()
    assert(ks >= 0.0 && ks <= 1.0, s"KS statistic out of [0,1]: $ks")
    val gini = SparkEntry.queries("a28_gini")(spark, sf())
      .select("gini").as[Double].head()
    assert(gini >= 0.0 && gini <= 1.0, s"Gini out of [0,1]: $gini")
    val badCorr = SparkEntry.queries("w18_rolling_corr")(spark, sf())
      .filter(col("corr7").isNotNull && abs(col("corr7")) > 1.0 + 1e-9)
      .count()
    assert(badCorr === 0L, "rolling correlation outside [-1,1]")
    val scores = SparkEntry.queries("t_quality_classifier")(spark, sf())
      .agg(min("score"), max("score")).head()
    assert(scores.getDouble(0) > 0.0 && scores.getDouble(1) < 1.0,
      s"sigmoid scores must stay inside (0,1): $scores")
    // weighted mean of the seasonal index is 1 by construction
    val si = SparkEntry.queries("w20_seasonal_index")(spark, sf())
    val m = si.select(
        sum(col("seasonal_index") * col("n_days")).as("w"),
        sum("n_days").as("n"))
      .head()
    assert(math.abs(m.getDouble(0) / m.getLong(1) - 1.0) < 1e-3,
      s"day-weighted seasonal index mean must be ~1: $m")
    // Benford expectations are a probability distribution
    val bp = SparkEntry.queries("a27_benford")(spark, sf())
      .agg(sum("benford_p")).head().getDouble(0)
    assert(math.abs(bp - 1.0) < 1e-6, s"Benford shares must sum to 1: $bp")
  }

  test("merge is idempotent and replay-order independent") {
    samples(ratesGen, 10).filter(_.nonEmpty).foreach { rows =>
      {
        val df = toDf(rows)
        val (a, b) = (toDf(rows.take(rows.length / 2)),
          toDf(rows.drop(rows.length / 2)))
        def rowsOf(d: org.apache.spark.sql.DataFrame) =
          d.select("cc", "exchangedate", "rate")
            .as[(String, java.sql.Date, Double)].collect().toSet
        val merged = CurrencyPipeline.merge(a, b)
        // idempotent: merging the result with either input is a no-op
        assert(rowsOf(CurrencyPipeline.merge(merged, merged)) === rowsOf(merged))
        // replay-order independent (ingest_ts ties broken by rate inside
        // the generated ts, so ordering is total)
        assert(rowsOf(CurrencyPipeline.merge(b, a)) === rowsOf(merged))
        // one row per key
        val keys = merged.select("cc", "exchangedate").collect()
        assert(keys.length === keys.distinct.length)
        assert(rowsOf(merged) === rowsOf(CurrencyPipeline.merge(df, df.limit(0))))
      }
    }
  }

  test("connected components equal driver-side union-find on random graphs") {
    val edgeGen: Gen[List[(Long, Long)]] = Gen.listOfN(60, for {
      a <- Gen.choose(0L, 39L)
      b <- Gen.choose(0L, 39L) if a != b
    } yield (math.min(a, b), math.max(a, b)))
    samples(edgeGen, 8).filter(_.nonEmpty).foreach { edges =>
      // driverMaxEdges = 0: the DISTRIBUTED pointer-jump loop is the
      // thing compared against the reference here — without it every
      // random graph (60 edges) would take the small-graph fast path,
      // which is itself a union-find and would make this test circular
      val got = graft.operators.Dedup
        .connectedComponents(edges.toDF("doc_a", "doc_b"), driverMaxEdges = 0)
        .as[(Long, Long)].collect().toMap
      // reference: plain union-find with path compression
      val parent = scala.collection.mutable.Map.empty[Long, Long]
      def find(x: Long): Long = {
        val p = parent.getOrElse(x, x)
        if (p == x) x else { val r = find(p); parent(x) = r; r }
      }
      edges.foreach { case (a, b) =>
        val (ra, rb) = (find(a), find(b))
        if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
      }
      val nodes = edges.flatMap(e => Seq(e._1, e._2)).distinct
      nodes.foreach { n =>
        assert(got(n) === find(n),
          s"node $n: spark=${got(n)} union-find=${find(n)} edges=$edges")
      }
    }
  }

  test("chunking covers every token exactly; overlap = window - stride") {
    // over random doc lengths: chunks tile [0, n) with stride steps,
    // every chunk is non-empty and ≤ window long, consecutive chunks
    // overlap by exactly window - stride except a shorter tail
    val window = 16
    val stride = 12
    samples(Gen.choose(1, 200), 40).foreach { n =>
      val starts = (0 until n by stride).toList
      val chunks = starts.map(s => (s, math.min(window, n - s)))
      assert(chunks.forall { case (_, len) => len >= 1 && len <= window })
      // coverage: union of [s, s+len) is exactly [0, n)
      val covered = chunks.flatMap { case (s, l) => s until (s + l) }.toSet
      assert(covered === (0 until n).toSet)
      chunks.sliding(2).foreach {
        case List((s1, l1), (s2, _)) =>
          val overlap = (s1 + l1) - s2
          assert(overlap == window - stride || s1 + l1 >= n)
        case _ =>
      }
    }
  }

  test("pageRank conserves bounded mass and hits the teleport floor") {
    import graft.operators.Graph
    val edgeGen = Gen.listOfN(40, for {
      a <- Gen.choose(0L, 19L); b <- Gen.choose(0L, 19L) if a != b
    } yield (a, b))
    samples(edgeGen, 5).filter(_.nonEmpty).foreach { es =>
      val edges = es.distinct.toDF("src", "dst")
      val nodes = (0L to 19L).toDF("id")
      val ranks = Graph.pageRank(edges, nodes, iters = 3)
        .as[(Long, Double)].collect()
      assert(ranks.length === 20)
      // every node keeps at least the teleport share; total mass can
      // only leak at sinks, never grow
      assert(ranks.forall(_._2 >= 0.15 / 20 - 1e-12))
      assert(ranks.map(_._2).sum <= 1.0 + 1e-9)
    }
  }

  test("interval merge equals driver-side sweep on random intervals") {
    val ivGen: Gen[List[(Long, Long, Long)]] = Gen.listOfN(40, for {
      key <- Gen.choose(0L, 3L)
      start <- Gen.choose(0L, 200L)
      len <- Gen.choose(1L, 30L)
    } yield (key, start, start + len))
    samples(ivGen, 8).filter(_.nonEmpty).foreach { ivs =>
      val merged = graft.operators.WindowOps.mergeIntervals(
          ivs.toDF("k", "s", "f"), key = "k", start = "s", fin = "f")
        .select("k", "merge_start", "merge_end", "n_events")
        .as[(Long, Long, Long, Long)].collect().toSet
      // driver-side sweep: sort per key, extend while start <= max end
      val expected = ivs.groupBy(_._1).flatMap { case (k, rows) =>
        val sorted = rows.map { case (_, s, f) => (s, f) }.sorted
        val out = scala.collection.mutable.ArrayBuffer
          .empty[(Long, Long, Long, Long)]
        var (cs, cf, n) = (sorted.head._1, sorted.head._2, 1L)
        for ((s, f) <- sorted.tail) {
          if (s <= cf) { cf = math.max(cf, f); n += 1 }
          else { out += ((k, cs, cf, n)); cs = s; cf = f; n = 1 }
        }
        out += ((k, cs, cf, n))
        out
      }.toSet
      assert(merged === expected)
      // invariant: merged spans per key are pairwise disjoint
      merged.groupBy(_._1).foreach { case (_, spans) =>
        val ss = spans.toSeq.sortBy(_._2)
        ss.zip(ss.drop(1)).foreach { case (a, b) => assert(a._3 < b._2) }
      }
    }
  }

  test("max(struct(quality, -id)) argmax matches driver-side selection") {
    val rowGen: Gen[List[(Long, Long, Long)]] = Gen.listOfN(50, for {
      grp <- Gen.choose(0L, 5L)
      id <- Gen.choose(0L, 99L)
      q <- Gen.choose(0L, 9L) // narrow range forces quality ties
    } yield (grp, id, q))
    samples(rowGen, 8).filter(_.nonEmpty).foreach { rows =>
      val distinctRows = rows.distinct
      val got = distinctRows.toDF("grp", "id", "q")
        .groupBy("grp")
        .agg(max(struct(col("q"), (-col("id")).as("neg_id"))).as("best"))
        .select(col("grp"), (-col("best.neg_id")).as("kept"),
          col("best.q").as("kq"))
        .as[(Long, Long, Long)].collect().toSet
      val expected = distinctRows.groupBy(_._1).map { case (g, rs) =>
        val best = rs.map { case (_, id, q) => (q, -id) }.max
        (g, -best._2, best._1)
      }.toSet
      assert(got === expected)
    }
  }

  test("delta-join IVM equals full recompute for any old/new split") {
    // the c10 algebra over generated universes: Δ(A⋈B) needs ALL THREE
    // delta terms; dropping any one must be caught by some sample
    val factGen = Gen.listOfN(40, for {
      k <- Gen.choose(1, 8)
      m <- Gen.choose(1L, 100L)
      isNew <- Gen.oneOf(true, false)
    } yield (k, m, isNew))
    val dimGen = Gen.listOfN(12, for {
      k <- Gen.choose(1, 8)
      g <- Gen.oneOf("x", "y")
      isNew <- Gen.oneOf(true, false)
    } yield (k, g, isNew))
    samples(Gen.zip(factGen, dimGen), 8).foreach { case (facts, dims) =>
      val a = facts.toDF("k", "m", "newA")
      val b = dims.toDF("k", "g", "newB")
      def agg(x: org.apache.spark.sql.DataFrame) =
        x.groupBy("g").agg(sum("m").as("s"), count(lit(1)).as("n"))
      val full = agg(a.join(b, "k"))
        .as[(String, Long, Long)].collect().toSet
      val parts = Seq(
        agg(a.filter(!col("newA")).join(b.filter(!col("newB")), "k")),
        agg(a.filter(col("newA")).join(b.filter(!col("newB")), "k")),
        agg(a.filter(!col("newA")).join(b.filter(col("newB")), "k")),
        agg(a.filter(col("newA")).join(b.filter(col("newB")), "k")))
      val inc = parts.reduce(_ unionByName _)
        .groupBy("g").agg(sum("s").as("s"), sum("n").as("n"))
        .as[(String, Long, Long)].collect().toSet
      assert(inc === full, s"facts=$facts dims=$dims")
    }
  }

  test("rolling 7-row mean equals brute force over any history") {
    samples(Gen.listOfN(25, Gen.choose(1, 10000).map(_ / 100.0)), 10)
        .filter(_.nonEmpty).foreach { values =>
      {
        val df = values.zipWithIndex.map { case (v, i) => ("USD", i, v) }
          .toDF("cc", "idx", "rate")
          .select(col("cc"), col("rate"),
            expr("date_add(DATE '2025-01-01', idx)").as("exchangedate"))
        val got = CurrencyPipeline.forecast(df, horizon = 1)
          .select("forecast_rate").as[Double].head()
        val last7 = values.takeRight(7)
        val expected = last7.map(BigDecimal(_)).sum / last7.length
        assert(math.abs(got - expected.toDouble) < 1e-9)
      }
    }
  }
}
