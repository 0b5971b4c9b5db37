package graft

import graft.functions.RollingMinHash
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.ColumnBridge.{column, expression}

/** RollingMinHash semantics: matches a BigInt-exact reference model and is
  * stable under content shifts (the winnowing property). */
class TextSpec extends SparkSuite {
  import spark.implicits._

  private val Mod = BigInt((1L << 61) - 1)
  private def refModel(s: String, k: Int): Long =
    if (s.length < k) -1L
    else (0 to s.length - k).map { i =>
      s.substring(i, i + k).foldLeft(BigInt(0))((h, c) =>
        (h * 257 + c.toInt) mod Mod)
    }.min.toLong

  private def fp(texts: Seq[String], k: Int): Seq[Long] =
    texts.toDF("text")
      .select(column(RollingMinHash(expression(col("text")), k)))
      .as[Long].collect().toSeq

  test("matches the BigInt reference model") {
    val texts = Seq(
      "the quick brown fox jumps over the lazy dog",
      "aaaaaaaaaaaaaaaaaaaaaa",
      "short", // < k → -1 sentinel
      "spark sql whole stage codegen pipelines are fused")
    assert(fp(texts, 16) === texts.map(refModel(_, 16)))
    assert(fp(texts, 4) === texts.map(refModel(_, 4)))
  }

  test("compression ratio discriminates repetition and is deterministic") {
    val tmp = java.nio.file.Files.createTempDirectory("czr").toString
    val docs = Seq(
      (1L, ("spam " * 60).trim, "xx", "s", 299L),
      (2L, (0 until 60).map(i => s"w${i * 7919 % 977}").mkString(" "),
        "xx", "s", 299L)
    ).toDF("doc_id", "text", "lang", "source", "n_chars")
    docs.write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    def run() = SparkEntry.queries("t_compress_ratio")(spark, tmp)
      .collect().map(r => (r.getLong(0), r.getLong(2),
        r.getBoolean(3), r.getBoolean(4))).toSeq
    val r = run()
    // the discrimination claim must hold on this engineered corpus:
    // doc 1 is maximally repetitive (uniq_frac 1/60), doc 2 maximally
    // varied (1.0) — a correct deflate orders their ratios
    assert(r.forall(_._3), "ratio_sane must pin TRUE")
    assert(r.forall(_._4),
      "repetitive text must compress better than varied text")
    // deterministic features: byte lengths exact and rerun-stable
    assert(r.map(x => (x._1, x._2)).toMap ===
      Map(1L -> ("spam " * 60).trim.getBytes("UTF-8").length.toLong,
        2L -> (0 until 60).map(i => s"w${i * 7919 % 977}")
          .mkString(" ").getBytes("UTF-8").length.toLong))
    assert(run() === r, "query output must be deterministic across runs")
  }

  test("BPE training reproduces the hand-computed Sennrich merge sequence") {
    // the classic corpus: low×5 lower×2 newest×6 widest×3. Pair counts
    // over {l o w </w>, l o w e r </w>, n e w e s t </w>, w i d e s t </w>}
    // peak at 9 for (e,s), (s,t), (t,</w>); the (freq desc, pair asc)
    // rule picks (e,s), then (es,t), then (est,</w>)
    val text = (Seq.fill(5)("low") ++ Seq.fill(2)("lower") ++
      Seq.fill(6)("newest") ++ Seq.fill(3)("widest")).mkString(" ")
    val docs = Seq((0L, text)).toDF("doc_id", "text")
    val merges = graft.operators.TextAnalysis.bpeTrain(docs, merges = 3)
    assert(merges === Seq(
      (1, "e", "s", "es", 9L),
      (2, "es", "t", "est", 9L),
      (3, "est", "</w>", "est</w>", 9L)))
  }

  test("BPE greedy left-to-right replacement handles overlapping pairs") {
    // "aaa" = a a a </w>: the pair (a,a) occurs twice OVERLAPPING, and
    // BPE pair statistics count both (8 = 2×4 docs) while replacement is
    // greedy non-overlapping (→ [aa, a, </w>]), matching subword-nmt
    val docs = Seq((0L, Seq.fill(4)("aaa").mkString(" "))).toDF("doc_id", "text")
    val merges = graft.operators.TextAnalysis.bpeTrain(docs, merges = 2)
    assert(merges.head === ((1, "a", "a", "aa", 8L)))
    // after merge 1 the word is [aa, a, </w>]: candidate pairs (aa,a)
    // and (a,</w>) both at 4; (a,</w>) wins on left asc
    assert(merges(1) === ((2, "a", "</w>", "a</w>", 4L)))
  }

  test("BPE apply segments words under the trained merges") {
    import org.apache.spark.sql.graft.ColumnBridge.{column, expression}
    // merges from the Sennrich corpus: es, est, est</w>. Applying to
    // fresh words: "newest" → n e w est</w>; "west" → w est</w>;
    // "low" (no merge applies) → l o w </w>
    val merges = Array(("e", "s"), ("es", "t"), ("est", "</w>"))
    val out = Seq((0L, Seq("newest", "west", "low")))
      .toDF("id", "words")
      .select(column(graft.functions.BpeApply(
        expression(col("words")), merges)).as("sub"))
      .as[Seq[String]].head()
    assert(out === Seq("n", "e", "w", "est</w>",
      "w", "est</w>", "l", "o", "w", "</w>"))
  }

  test("dup-span islands: overlap merges, touch merges, gaps split") {
    val tmp = java.nio.file.Files.createTempDirectory("spans").toString
    def toks(p: String, n: Int) = (1 to n).map(i => s"$p$i").mkString(" ")
    val sA = toks("a", 8); val sB = toks("b", 8)   // 8-token shared blocks
    val sS = toks("s", 8); val sC = toks("c", 8)
    val sT = toks("t", 9)                          // 9 tokens → 2 overlapping grams
    val docs = Seq(
      (1L, s"$sS ${toks("u", 10)} $sC"),           // two separated blocks
      (2L, s"$sS ${toks("v", 10)} $sC"),
      (3L, s"$sT ${toks("w", 5)}"),                // overlap: pos 0,1 → one span
      (4L, s"${toks("x", 3)} $sT"),
      (7L, s"$sA $sB"),                            // touch: pos 0,8 → one span
      (8L, s"$sB ${toks("y", 3)} $sA")             // gap: pos 0,11 → two spans
    ).map { case (id, t) => (id, t, "xx", "s", t.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    docs.write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    val r = SparkEntry.queries("dedup_dup_spans")(spark, tmp)
      .select("doc_id", "n_dup_spans", "dup_words", "dup_frac")
      .as[(Long, Long, Long, Double)].collect()
      .map(t => t._1 -> ((t._2, t._3, t._4))).toMap
    assert(r(1L) === ((2L, 16L, 0.615385)), "separated blocks stay two spans")
    assert(r(2L) === ((2L, 16L, 0.615385)))
    assert(r(3L) === ((1L, 9L, 0.642857)), "overlapping grams merge")
    assert(r(4L) === ((1L, 9L, 0.75)))
    assert(r(7L) === ((1L, 16L, 1.0)), "touching windows merge to full doc")
    assert(r(8L) === ((2L, 16L, 0.842105)), "an 11-position gap splits")

    // first-wins removal on the same fixture: the earliest doc holding a
    // gram keeps its text; later holders lose the covered words
    val c = SparkEntry.queries("t_strip_dup_spans")(spark, tmp)
      .select("doc_id", "n_removed_words", "cleaned_text")
      .as[(Long, Long, String)].collect()
      .map(t => t._1 -> ((t._2, t._3))).toMap
    assert(c(1L)._1 === 0L, "first holder keeps everything")
    assert(c(2L) === ((16L, toks("v", 10))), "both copied blocks stripped")
    assert(c(3L)._1 === 0L)
    assert(c(4L) === ((9L, toks("x", 3))), "9-token overlap span stripped")
    assert(c(7L)._1 === 0L, "doc 7 owns both blocks (7 < 8)")
    assert(c(8L) === ((16L, toks("y", 3))), "later doc loses both blocks")
  }

  test("shift-stable: prefix insertion far from the min window keeps fp") {
    val core = "zzz unique rare window payload qqq and lots of filler text"
    // the minimal 16-gram lives inside `core`; shifting it right by a
    // prefix must not change the minimum unless the prefix wins
    val a = refModel("AAAA " + core, 16)
    val b = refModel("BBBBBBBB " + core, 16)
    val direct = refModel(core, 16)
    assert(a == direct || b == direct || a == b,
      "min k-gram should usually survive shifts for distinctive cores")
    val Seq(fa, fb) = fp(Seq("AAAA " + core, "BBBBBBBB " + core), 16)
    assert(fa === a && fb === b)
  }
}
