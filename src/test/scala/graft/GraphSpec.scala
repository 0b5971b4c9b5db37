package graft

import graft.operators.Dedup
import graft.operators.Graph
import org.apache.spark.sql.functions._

/** PageRank pinned against hand-computed closed forms on graphs small
  * enough to iterate on paper — the oracle query checks the big frame;
  * these pin the per-iteration formula itself. */
class GraphSpec extends SparkSuite {
  import spark.implicits._

  test("2-cycle is a fixed point at rank 1/2") {
    val edges = Seq((1L, 2L), (2L, 1L)).toDF("src", "dst")
    val nodes = Seq(1L, 2L).toDF("id")
    val got = Graph.pageRank(edges, nodes, iters = 3)
      .orderBy("id").as[(Long, Double)].collect()
    // r' = 0.15/2 + 0.85 * r with r = 1/2 stays exactly 1/2
    assert(got.toSeq == Seq((1L, 0.5), (2L, 0.5)))
  }

  test("sink chain converges to the hand-iterated values") {
    // a -> b only: r_a falls to the teleport floor 0.075; r_b follows
    // one step behind: 0.075 + 0.85 * 0.075 = 0.13875 from iter 2 on.
    val edges = Seq((1L, 2L)).toDF("src", "dst")
    val nodes = Seq(1L, 2L).toDF("id")
    val got = Graph.pageRank(edges, nodes, iters = 3)
      .orderBy("id").as[(Long, Double)].collect().toMap
    assert(got(1L) == 0.075)
    assert(got(2L) == 0.075 + 0.85 * 0.075)
  }

  test("rank mass concentrates on a hub") {
    // star: 1..4 all link to 5; 5 links back to 1. The hub must hold
    // strictly more rank than every spoke after 3 iterations.
    val edges = (1L to 4L).map(i => (i, 5L)).toDF("src", "dst")
      .unionAll(Seq((5L, 1L)).toDF("src", "dst"))
    val nodes = (1L to 5L).toDF("id")
    val got = Graph.pageRank(edges, nodes, iters = 3)
      .orderBy("id").as[(Long, Double)].collect().toMap
    assert((1L to 4L).forall(i => got(5L) > got(i)))
  }

  test("sorted-neighborhood surfaces a planted near-dup pair") {
    // two docs of equal length differing in one token land in the same
    // 16-char band, adjacent in (n_chars, doc_id) order -> paired with
    // jaccard > 0.8; the unrelated long doc never pairs with them.
    val docs = Seq(
      (10L, "a1 b2 c3 d4 e5 f6 g7 h8 i9 j10", "xx", "s", 35L),
      (11L, "a1 b2 c3 d4 e5 f6 g7 h8 i9 ZZZ", "xx", "s", 35L),
      (90L, ("lorem " * 40).trim, "xx", "s", ("lorem " * 40).trim.length.toLong)
    ).toDF("doc_id", "text", "lang", "source", "n_chars")
    val tmp = java.nio.file.Files.createTempDirectory("snb").toString
    docs.write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    val out = SparkEntry.queries("dedup_sorted_neighborhood")(spark, tmp)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(out.exists { case (a, b, j) => a == 10L && b == 11L && j > 0.8 })
    assert(!out.exists { case (a, b, _) => b == 90L || a == 90L })
  }
}
