package graft.operators

import graft.{QueryModule, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Link-analysis operators — the graph tier of a web-scale curation
  * pipeline (domain authority, crawl prioritization, link-farm
  * detection all reduce to power iteration over an edge list).
  *
  * Scale design: each PageRank iteration is ONE propagation join
  * (edges ⋈ ranks on src) + ONE aggregation (sum of contributions per
  * dst) — the canonical shuffle-pair that Pregel/GraphX execute per
  * superstep, expressed as DataFrames so Catalyst handles partial
  * aggregation (map-side combine of contributions) and AQE handles
  * skewed hubs. The edge list is persisted once with its out-degrees
  * attached (degree join hoisted OUT of the loop); each iteration's
  * rank frame is `localCheckpoint`ed so round k's plan doesn't re-plan
  * rounds 1..k-1 (same lineage discipline as
  * [[Dedup.connectedComponents]]). At 100 TB the edge list would be
  * pre-partitioned by src (bucketed table) so the per-round join is
  * shuffle-free on the edge side; ranks alone move.
  *
  * Determinism contract (QueryModule scaladoc): the test graph gives
  * every node in-degree ≤ 2, so the per-dst contribution sum is a sum
  * of at most two doubles — order-independent by commutativity — and
  * every other arithmetic step (division by out-degree, damping affine
  * map) is a fixed IEEE expression shape both engines evaluate
  * identically. Ranks are normalized to mean 1 and rounded AFTER the
  * final iteration.
  */
object Graph extends QueryModule {

  /** Fixed-iteration damped PageRank over (src, dst) edges.
    * No dangling-mass redistribution (rank leaks at sinks) — the
    * oracle implements the identical formula, and at corpus scale the
    * leaked mass only rescales ranks uniformly per component.
    * Returns (id, rank). */
  def pageRank(edges: DataFrame, nodes: DataFrame, iters: Int = 3,
               damping: Double = 0.85, teleport: Double = 0.15): DataFrame = {
    // teleport is a SEPARATE literal, not computed as 1.0 - damping:
    // IEEE (1.0 - 0.85) = 0.15000000000000002 ≠ the double the oracle's
    // 0.15 literal parses to — the formula must use the same constant
    // bit pattern on both engines.
    // The loop runs at a LOW pinned shuffle width — the same sizing
    // rule as Dedup.connectedComponents and streaming state: each
    // iteration pays a fixed per-partition task/checkpoint charge, so
    // partition count should track rank-frame bytes, not the session's
    // scan parallelism. At web scale raise it with |nodes|; the loop is
    // width-agnostic. The pin lives on a PRIVATE session clone
    // (Sessions.pinned), so a query planning concurrently against the
    // shared session can never inherit the loop's width.
    val shuffleKey = "spark.sql.shuffle.partitions"
    val loopWidth = math.min(4,
      edges.sparkSession.conf.get(shuffleKey).toInt).toString
    val scoped = graft.Sessions.pinned(edges.sparkSession,
      shuffleKey -> loopWidth)
    val sEdges = graft.Sessions.rebind(edges, scoped)
    val sNodes = graft.Sessions.rebind(nodes, scoped)
    // one scalar action: N calibrates the teleport term; everything
    // else stays declarative/distributed
    val n = sNodes.count()
    val deg = sEdges.groupBy("src").agg(count(lit(1)).as("outdeg"))
    val e = sEdges.join(deg, Seq("src"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    e.count() // materialize before the loop: every iteration scans it
    // handle-based checkpoint tracking (same discipline as
    // Dedup.connectedComponents): each round's localCheckpoint releases
    // the PREVIOUS round's blocks deterministically — never by diffing
    // global persistent-RDD state, and the final frame's blocks are
    // retained for the caller (ContextCleaner reclaims them on drop)
    var prevCkpt: Seq[org.apache.spark.rdd.RDD[_]] = Nil
    def checkpointTracked(df: DataFrame): DataFrame = {
      val out = df.localCheckpoint()
      val fresh = out.queryExecution.analyzed.collect {
        case l: org.apache.spark.sql.execution.LogicalRDD => l.rdd
      }
      prevCkpt.foreach(_.unpersist(blocking = false))
      prevCkpt = fresh
      out
    }
    var pr = checkpointTracked(
      sNodes.select(col("id")).withColumn("rank", lit(1.0 / n)))
    for (_ <- 1 to iters) {
      val contrib = e
        .join(pr.withColumnRenamed("id", "src"), Seq("src"))
        .select(col("dst").as("id"), (col("rank") / col("outdeg")).as("c"))
        .groupBy("id").agg(sum("c").as("in_mass"))
      pr = checkpointTracked(pr.select("id")
        .join(contrib, Seq("id"), "left")
        .select(col("id"),
          (lit(teleport / n) +
            lit(damping) * coalesce(col("in_mass"), lit(0.0))).as("rank")))
    }
    e.unpersist()
    pr
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // ORACLE-verified power iteration: a deterministic 2-out graph
    // (each doc links to the next and next-but-one doc_id in its
    // (lang, source) group) run through 3 damped iterations. In-degree
    // ≤ 2 keeps double sums order-free; the oracle unrolls the same 3
    // iterations as plain CTEs.
    "graph_pagerank" -> ((s, d) => {
      val docs = Tables.documents(s, d).select("doc_id", "lang", "source")
      val w = Window.partitionBy("lang", "source").orderBy("doc_id")
      val base = docs
        .withColumn("n1", lead("doc_id", 1).over(w))
        .withColumn("n2", lead("doc_id", 2).over(w))
      val edges = base
        .select(col("doc_id").as("src"), col("n1").as("dst"))
        .filter(col("dst").isNotNull)
        .unionAll(base.select(col("doc_id").as("src"), col("n2").as("dst"))
          .filter(col("dst").isNotNull))
      val nodes = docs.select(col("doc_id").as("id"))
      // normalize via a broadcast scalar (j2 pattern) — a partition-less
      // count window here would funnel the whole rank frame through one
      // task at corpus scale
      val nTotal = broadcast(nodes.agg(count(lit(1)).as("n_total")))
      pageRank(edges, nodes)
        .crossJoin(nTotal)
        .withColumn("pr_norm", round(col("rank") * col("n_total"), 6))
        .select(col("id").as("doc_id"), col("pr_norm"))
        .orderBy("doc_id")
    }),

    // TRIANGLE counting (the clustering-coefficient/link-farm-density
    // primitive) over the same deterministic 2-out graph: edges are
    // already oriented (src < dst by construction — the distributed
    // algorithm's degree-orientation step, which bounds the wedge join),
    // so each triangle is counted exactly once as a wedge
    // (a→b, b→c) closed by the edge (a→c). Two shuffles: the wedge
    // join on b, then the closing semi-join on (a, c) — the canonical
    // MapReduce triangle plan; no node ever materializes its full
    // neighborhood. Every (lang, source) chain group of size g yields
    // exactly g-2 triangles — closed-form, so the oracle is both a
    // cross-engine AND an analytic check.
    "graph_triangles" -> ((s, d) => {
      val docs = Tables.documents(s, d).select("doc_id", "lang", "source")
      val w = Window.partitionBy("lang", "source").orderBy("doc_id")
      val base = docs
        .withColumn("n1", lead("doc_id", 1).over(w))
        .withColumn("n2", lead("doc_id", 2).over(w))
      // pin the edge list ONCE: it feeds three join legs below, and
      // without the checkpoint each leg re-runs the scan+window subtree
      // (3 window shuffles instead of 1)
      val edges = base
        .select(col("lang"), col("source"),
          col("doc_id").as("src"), col("n1").as("dst"))
        .filter(col("dst").isNotNull)
        .unionAll(base.select(col("lang"), col("source"),
          col("doc_id").as("src"), col("n2").as("dst"))
          .filter(col("dst").isNotNull))
        .localCheckpoint()
      val plain = edges.select("src", "dst")
      edges.as("e1")
        .join(plain.as("e2"), col("e1.dst") === col("e2.src"))
        .join(plain.as("e3"),
          col("e1.src") === col("e3.src") && col("e2.dst") === col("e3.dst"),
          "left_semi")
        .groupBy(col("e1.lang").as("lang"), col("e1.source").as("source"))
        .agg(count(lit(1)).as("n_triangles"))
        .orderBy("lang", "source")
    }))

  def oracles: Map[String, String] = Map(
    // inner join closes the wedge (edges are unique pairs, so inner ≡
    // semi); count per chain group must equal g-2
    "graph_triangles" ->
      """WITH d AS (SELECT doc_id, lang, source FROM documents),
        |base AS (SELECT doc_id, lang, source,
        |  lead(doc_id, 1) OVER (PARTITION BY lang, source ORDER BY doc_id) AS n1,
        |  lead(doc_id, 2) OVER (PARTITION BY lang, source ORDER BY doc_id) AS n2
        |  FROM d),
        |e0 AS (SELECT lang, source, doc_id AS src, n1 AS dst FROM base
        |    WHERE n1 IS NOT NULL
        |  UNION ALL
        |  SELECT lang, source, doc_id AS src, n2 AS dst FROM base
        |    WHERE n2 IS NOT NULL)
        |SELECT e1.lang AS lang, e1.source AS source,
        |  count(*) AS n_triangles
        |FROM e0 e1
        |JOIN e0 e2 ON e1.dst = e2.src
        |JOIN e0 e3 ON e3.src = e1.src AND e3.dst = e2.dst
        |GROUP BY 1, 2 ORDER BY lang, source""".stripMargin,
    "graph_pagerank" ->
      """WITH d AS (SELECT doc_id, lang, source FROM documents),
        |base AS (SELECT doc_id,
        |  lead(doc_id, 1) OVER (PARTITION BY lang, source ORDER BY doc_id) AS n1,
        |  lead(doc_id, 2) OVER (PARTITION BY lang, source ORDER BY doc_id) AS n2
        |  FROM d),
        |e0 AS (SELECT doc_id AS src, n1 AS dst FROM base WHERE n1 IS NOT NULL
        |  UNION ALL
        |  SELECT doc_id AS src, n2 AS dst FROM base WHERE n2 IS NOT NULL),
        |deg AS (SELECT src, count(*) AS outdeg FROM e0 GROUP BY src),
        |e AS (SELECT e0.src, e0.dst, deg.outdeg FROM e0 JOIN deg USING (src)),
        |n AS (SELECT count(*) AS c FROM d),
        |p0 AS (SELECT doc_id AS id, 1.0 / (SELECT c FROM n) AS rank FROM d),
        |p1 AS (SELECT p0.id,
        |    0.15 / (SELECT c FROM n) + 0.85 * coalesce(i.v, 0) AS rank
        |  FROM p0 LEFT JOIN (SELECT e.dst AS id, sum(p0.rank / e.outdeg) AS v
        |    FROM e JOIN p0 ON p0.id = e.src GROUP BY e.dst) i USING (id)),
        |p2 AS (SELECT p1.id,
        |    0.15 / (SELECT c FROM n) + 0.85 * coalesce(i.v, 0) AS rank
        |  FROM p1 LEFT JOIN (SELECT e.dst AS id, sum(p1.rank / e.outdeg) AS v
        |    FROM e JOIN p1 ON p1.id = e.src GROUP BY e.dst) i USING (id)),
        |p3 AS (SELECT p2.id,
        |    0.15 / (SELECT c FROM n) + 0.85 * coalesce(i.v, 0) AS rank
        |  FROM p2 LEFT JOIN (SELECT e.dst AS id, sum(p2.rank / e.outdeg) AS v
        |    FROM e JOIN p2 ON p2.id = e.src GROUP BY e.dst) i USING (id))
        |SELECT id AS doc_id, round(rank * (SELECT c FROM n), 6) AS pr_norm
        |FROM p3 ORDER BY doc_id""".stripMargin)
}
