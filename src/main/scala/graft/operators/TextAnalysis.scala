package graft.operators

import graft.{QueryModule, Sql, Tables}
import graft.functions.TextFunctions._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Text-analysis operators over `documents` — the training-data-pipeline
  * extension tier (BASELINE.json north_star): token counting, quality
  * scoring, language-ID heuristic, document fingerprinting.
  *
  * All are single-pass, shuffle-free map operations over the scan (verify
  * with .explain: one WholeStageCodegen over the parquet scan, no
  * Exchange) — exactly the shape that scales to 100 TB: cost is O(bytes
  * scanned), embarrassingly parallel, no skew sensitivity.
  *
  * Fingerprints use md5 (bit-stable across engines) rather than engine
  * hashes, so they are oracle-verifiable; the MinHash pipeline in
  * Dedup.scala uses xxhash64 where cross-engine stability isn't needed.
  */
object TextAnalysis extends QueryModule {

  private val stopwords = Seq("the", "a")

  /** Per-doc statistical LM quality score: corpus bigram counts with
    * add-one smoothing, mean log10 P(w2|w1) per doc. One explode feeds
    * both count shuffles; log terms are rounded to 9 before the exact-
    * decimal mean so the score hash-matches across engines. Shared by
    * `t_bigram_lm` (the raw score) and `t_lm_bucket_sample` (the
    * stratified-sampling composite). Emits (doc_id, n_bigrams,
    * avg_logp), unordered. */
  def bigramLmScores(s: SparkSession, d: String): DataFrame = {
    val t = Tables.documents(s, d)
      .select(col("doc_id"), tokens(col("text")).as("ts"))
      .filter(size(col("ts")) >= 2)
    val bi = t.select(col("doc_id"), explode(expr(
        "transform(sequence(0, size(ts) - 2), " +
          "i -> struct(ts[i] AS w1, concat(ts[i], ' ', ts[i+1]) AS bg))"))
        .as("b"))
      .select(col("doc_id"), col("b.w1").as("w1"), col("b.bg").as("bg"))
    val cb = bi.groupBy("bg").agg(count(lit(1)).as("cb"))
    val c1 = bi.groupBy("w1").agg(count(lit(1)).as("c1"))
    val v = t.select(explode(col("ts")).as("w"))
      .agg(count_distinct(col("w")).as("v"))
    bi.join(cb, "bg").join(c1, "w1").crossJoin(broadcast(v))
      .withColumn("lp", round(log10(
        (col("cb") + lit(1)).cast("double") / (col("c1") + col("v"))), 9))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_bigrams"),
        round(Sql.davg(col("lp"), 9), 6).as("avg_logp"))
  }

  /** Full BPE merge-training loop (Sennrich et al. 2016, "Neural Machine
    * Translation of Rare Words with Subword Units"). The corpus-scale
    * pass is the distributed word-frequency count, capped to the top
    * `maxVocab` words by (count desc, word asc) — the merge loop then
    * runs driver-side over that bounded dictionary, exactly the
    * substrate real tokenizer trainers (subword-nmt, HF tokenizers) use:
    * pair statistics over a word-frequency dict are invariant to corpus
    * size, so at 100 TB only the counting stage grows and it is one
    * shuffle + a TakeOrdered cap. Deterministic end to end: merge picks
    * (freq desc, left asc, right asc); in-word replacement is greedy
    * left-to-right. Returns one row per merge:
    * (step, left, right, merged, freq). */
  def bpeTrain(docs: DataFrame, merges: Int = 20,
               maxVocab: Int = 4096): Seq[(Int, String, String, String, Long)] = {
    val wordFreq = docs.select(explode(tokens(col("text"))).as("w"))
      .groupBy("w").agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("w")).limit(maxVocab)
      .collect().map(r => (r.getString(0), r.getLong(1)))
    var words: Array[(Array[String], Long)] =
      wordFreq.map { case (w, n) => (w.map(_.toString).toArray :+ "</w>", n) }
    val out = scala.collection.mutable.ArrayBuffer
      .empty[(Int, String, String, String, Long)]
    var step = 1
    while (step <= merges) {
      val pc = scala.collection.mutable.HashMap
        .empty[(String, String), Long]
      for ((syms, n) <- words; i <- 0 until syms.length - 1)
        pc.updateWith((syms(i), syms(i + 1)))(v => Some(v.getOrElse(0L) + n))
      if (pc.isEmpty) step = merges + 1
      else {
        val ((l, r), f) = pc.minBy { case ((a, b), n) => (-n, a, b) }
        out += ((step, l, r, l + r, f))
        words = words.map { case (syms, n) =>
          val nb = scala.collection.mutable.ArrayBuffer.empty[String]
          var i = 0
          while (i < syms.length) {
            if (i < syms.length - 1 && syms(i) == l && syms(i + 1) == r) {
              nb += l + r; i += 2
            } else { nb += syms(i); i += 1 }
          }
          (nb.toArray, n)
        }
        step += 1
      }
    }
    out.toSeq
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // token + char counting
    "t_tokens" -> ((s, d) =>
      Tables.documents(s, d)
        .select(col("doc_id"),
          size(tokens(col("text"))).cast("long").as("n_tokens"),
          length(col("text")).cast("long").as("len_chars"),
          col("n_chars"))
        .orderBy("doc_id")),

    // INVERTED INDEX build: term -> (document frequency, collection
    // frequency, sorted postings list) — the retrieval-side structure a
    // corpus search / BM25 / contamination-lookup service is built on.
    // ONE shuffle, keyed by term; df and cf come from the same exchange
    // as the postings (count_distinct folds into the groupBy). At 100 TB
    // the only change is sharding hot terms' postings by a composite
    // (term, doc_id DIV block) key — same plan, finer key — and
    // delta-encoding each block; the single-shuffle shape is already the
    // scale shape.
    // (postings serialized to CSV: the harness hash cannot sort raw
    // array cells — the agg_collect precedent)
    "t_inverted_index" -> ((s, d) =>
      Tables.documents(s, d)
        .select(col("doc_id"), explode(tokens(col("text"))).as("term"))
        .groupBy("term")
        .agg(count_distinct(col("doc_id")).as("df"),
          count(lit(1)).as("cf"),
          array_join(sort_array(collect_set(col("doc_id"))), ",")
            .as("postings_csv"))
        .orderBy("term")),

    // BM25 retrieval scoring for a fixed query term set — what the
    // inverted index above is FOR. Corpus stats (N, avgdl) and per-term
    // df are report-scale frames broadcast against the tf stream; the
    // only big exchange is the (doc, term) tf groupBy, already filtered
    // to query terms AT THE SCAN (the filter precedes the shuffle, so
    // the exchange carries query-term postings, not the corpus). Scoring
    // doubles follow the t_bigram_lm discipline: per-term contribution
    // rounded to 9 before the exact-decimal per-doc sum, so libm ulp
    // drift can't break cross-engine equality.
    "t_bm25" -> ((s, d) => {
      val qterms = Seq("spark", "query", "fast")
      val docs = Tables.documents(s, d)
      val dls = docs.select(col("doc_id"),
        size(tokens(col("text"))).cast("long").as("dl"))
      val stats = dls.agg(count(lit(1)).as("n_docs"),
        sum(col("dl")).as("sum_dl"))
      val tf = docs
        .select(col("doc_id"), explode(tokens(col("text"))).as("term"))
        .filter(col("term").isin(qterms: _*))
        .groupBy("doc_id", "term").agg(count(lit(1)).as("tf"))
      val df = tf.groupBy("term").agg(count_distinct(col("doc_id")).as("df"))
      tf.join(broadcast(df), "term").join(dls, "doc_id")
        .crossJoin(broadcast(stats))
        .withColumn("avgdl", col("sum_dl").cast("double") / col("n_docs"))
        .withColumn("contrib", round(
          log((col("n_docs") - col("df") + lit(0.5)) /
              (col("df") + lit(0.5)) + lit(1)) *
            col("tf") * lit(2.2) /
            (col("tf") + lit(1.2) *
              (lit(0.25) + lit(0.75) * col("dl") / col("avgdl"))), 9))
        .groupBy("doc_id")
        .agg(count(lit(1)).as("n_terms"),
          round(Sql.dsum(col("contrib"), 9), 6).as("bm25"))
        .orderBy("doc_id")
    }),

    // quality scoring: word stats + stopword ratio
    "t_quality" -> ((s, d) => {
      val toks = tokens(col("text"))
      val nTok = size(toks).cast("long")
      val stops = size(filter(toks, t => t.isin(stopwords: _*))).cast("long")
      Tables.documents(s, d)
        .select(col("doc_id"),
          nTok.as("n_tokens"),
          stops.as("n_stopwords"),
          (stops.cast("double") / nTok).as("stopword_ratio"),
          ((length(col("text")).cast("long") - (nTok - 1)).cast("double") / nTok)
            .as("avg_word_len"))
        .orderBy("doc_id")
    }),

    // language-ID heuristic: stopword-hit based n-gram scoring
    "t_langid" -> ((s, d) => {
      val toks = tokens(col("text"))
      val hits = size(filter(toks, t => t.isin(stopwords: _*))).cast("long")
      val nTok = size(toks).cast("long")
      Tables.documents(s, d)
        .select(col("doc_id"), col("lang"), hits.as("en_hits"),
          when(hits * 20 >= nTok, "en")
            .when(hits > 0, "en_low")
            .otherwise("unk").as("lang_guess"))
        .orderBy("doc_id")
    }),

    // CLASSIFIER EVALUATION for the language-ID heuristic: the full
    // confusion matrix (label × guess) plus per-label accuracy — the
    // audit that decides whether a filter model is good enough to gate
    // the corpus. One groupBy; the labeled `lang` column is the truth
    // set every labeled corpus carries.
    "t_langid_eval" -> ((s, d) => {
      val toks = tokens(col("text"))
      val hits = size(filter(toks, t => t.isin(stopwords: _*))).cast("long")
      val nTok = size(toks).cast("long")
      Tables.documents(s, d)
        .select(col("lang"),
          when(hits * 20 >= nTok, "en").when(hits > 0, "en_low")
            .otherwise("unk").as("lang_guess"))
        .groupBy("lang", "lang_guess")
        .agg(count(lit(1)).as("n"))
        .orderBy("lang", "lang_guess")
    }),

    // repetition ratio (Gopher-style quality signal): share of duplicate
    // word 2-grams — high values mark degenerate/boilerplate text
    "t_repetition" -> ((s, d) => {
      val grams = shinglesStrict(tokens(col("text")), 2)
      Tables.documents(s, d)
        .select(col("doc_id"),
          size(grams).cast("long").as("n_2grams"),
          size(array_distinct(grams)).cast("long").as("n_distinct_2grams"))
        .withColumn("dup_ratio",
          when(col("n_2grams") > 0,
            lit(1.0) - col("n_distinct_2grams").cast("double") / col("n_2grams"))
            .otherwise(0.0))
        .orderBy("doc_id")
    }),

    // benchmark decontamination: docs sharing any 8-gram with the
    // "benchmark set" (docs 0-4) — the shingle-hash semi-join that runs
    // contamination checks at corpus scale (benchmark side broadcasts)
    "t_contamination" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      val sh = docs.select(col("doc_id"),
        explode(array_distinct(shinglesStrict(tokens(col("text")), 8))).as("sh"))
      val bench = sh.filter(col("doc_id") < 5).select("sh").distinct()
      val counts = sh.filter(col("doc_id") >= 5)
        .join(broadcast(bench), Seq("sh"))
        .groupBy("doc_id").agg(count(lit(1)).as("n"))
      docs.filter(col("doc_id") >= 5).select("doc_id")
        .join(counts, Seq("doc_id"), "left")
        .select(col("doc_id"), coalesce(col("n"), lit(0L)).as("n_shared_8grams"))
        .orderBy("doc_id")
    }),

    // cross-doc exact SPAN dedup (the span-level complement of whole-doc
    // dedup): an 8-token span occurring in more than one document marks
    // boilerplate/duplication the doc-level hash can't see. One shingle
    // explode, one groupBy(span) — the shuffle partitions BY SPAN, which
    // is the distributed suffix-scan substitute; at corpus scale the
    // group key would be xxhash64(span) (8 bytes instead of the text),
    // same plan. Verified exactly: the span key here is the raw string.
    "dedup_span_8gram" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      val sh = docs.select(col("doc_id"),
        explode(array_distinct(shinglesStrict(tokens(col("text")), 8)))
          .as("sh"))
      val dup = sh.groupBy("sh")
        .agg(count(lit(1)).as("nd")) // per-doc distinct ⇒ count = #docs
        .filter(col("nd") > 1).select("sh")
      val counts = sh.join(dup, Seq("sh"))
        .groupBy("doc_id").agg(count(lit(1)).as("n_dup_spans"))
      docs.select("doc_id").join(counts, Seq("doc_id"), "left")
        .select(col("doc_id"),
          coalesce(col("n_dup_spans"), lit(0L)).as("n_dup_spans"))
        .orderBy("doc_id")
    }),

    // MAXIMAL duplicated-span extraction — the exact-substring dedup
    // shape (Lee et al. 2022, "Deduplicating Training Data Makes
    // Language Models Better") at span granularity: positions of
    // 8-grams that occur in >1 document, merged per doc into maximal
    // contiguous spans (union of [pos, pos+7] intervals via
    // gaps-and-islands), reported as span count / covered words /
    // duplicated fraction. The distributed suffix-array substitute:
    // ONE positional explode, one shuffle BY GRAM (high-cardinality,
    // skew-free) to find cross-doc grams, one shuffle BY DOC for the
    // per-doc interval merge — both keys scale; no driver state. At
    // corpus scale the gram key becomes xxhash64(gram); the raw string
    // here keeps it oracle-verifiable.
    "dedup_dup_spans" -> ((s, d) => {
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("doc_id").orderBy("pos")
      val wRun = w.rowsBetween(
        org.apache.spark.sql.expressions.Window.unboundedPreceding,
        org.apache.spark.sql.expressions.Window.currentRow)
      val docs = Tables.documents(s, d)
      val base = docs.select(col("doc_id"),
        posexplode(shinglesStrict(tokens(col("text")), 8))
          .as(Seq("pos", "sh")))
      val dup = base.groupBy("sh")
        .agg(count_distinct(col("doc_id")).as("nd"))
        .filter(col("nd") > 1).select("sh")
      val pos = base.join(dup, Seq("sh")).select("doc_id", "pos")
      // islands: a position extends the current span when its 8-word
      // window [pos, pos+7] overlaps-or-touches the previous one
      val spans = pos
        .withColumn("brk",
          when(col("pos") <= lag("pos", 1).over(w) + 8, 0L).otherwise(1L))
        .withColumn("island", sum("brk").over(wRun))
        .groupBy("doc_id", "island")
        .agg(min("pos").as("s"), max("pos").as("e"))
      val per = spans.groupBy("doc_id")
        .agg(count(lit(1)).as("n_dup_spans"),
          sum(col("e") - col("s") + lit(8L)).as("dup_words"))
      docs.select(col("doc_id"),
          size(tokens(col("text"))).cast("long").as("n_words"))
        .join(per, Seq("doc_id"), "left")
        .select(col("doc_id"),
          coalesce(col("n_dup_spans"), lit(0L)).as("n_dup_spans"),
          coalesce(col("dup_words"), lit(0L)).as("dup_words"),
          round(coalesce(col("dup_words").cast("double"), lit(0.0)) /
            col("n_words"), 6).as("dup_frac"))
        .orderBy("doc_id")
    }),

    // duplicated-span REMOVAL — the curation step dedup_dup_spans only
    // measures: tokens inside a cross-document 8-gram window whose
    // FIRST occurrence (min doc_id over docs containing that gram) lies
    // in an earlier document are stripped; the earliest holder keeps its
    // text intact. Exact-substring corpus cleaning with deterministic
    // first-wins ownership. Plan: gram shuffle for per-gram min owner,
    // coverage explode (≤8 rows per removed position), one doc-keyed
    // anti join of token positions against covered indexes, ordered
    // reassembly via sorted struct collect — every shuffle key is
    // doc_id or gram, both high-cardinality; no driver state.
    "t_strip_dup_spans" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      val base = docs.select(col("doc_id"),
        posexplode(shinglesStrict(tokens(col("text")), 8))
          .as(Seq("pos", "sh")))
      val owner = base.groupBy("sh").agg(min("doc_id").as("own"))
      val removed = base.join(owner, Seq("sh"))
        .filter(col("own") < col("doc_id"))
        .select(col("doc_id"),
          explode(sequence(col("pos"), col("pos") + 7)).as("widx"))
        .distinct()
      val toks = docs.select(col("doc_id"),
        posexplode(tokens(col("text"))).as(Seq("widx", "w")))
      val kept = toks.join(removed, Seq("doc_id", "widx"), "left_anti")
        .groupBy("doc_id")
        .agg(count(lit(1)).as("n_kept"),
          concat_ws(" ", transform(
            array_sort(collect_list(struct(col("widx"), col("w")))),
            x => x.getField("w"))).as("cleaned_text"))
      docs.select(col("doc_id"),
          size(tokens(col("text"))).cast("long").as("n_words"))
        .join(kept, Seq("doc_id"), "left")
        .select(col("doc_id"),
          (col("n_words") - coalesce(col("n_kept"), lit(0L)))
            .as("n_removed_words"),
          coalesce(col("cleaned_text"), lit("")).as("cleaned_text"))
        .orderBy("doc_id")
    }),

    // composed quality-filter funnel: the per-stage survivor counts a
    // curation run reports. ONE scan computes every cumulative flag;
    // thresholds are integer-arithmetic comparisons so both engines
    // agree exactly (no float ratio compares at the boundary).
    "t_filter_pipeline" -> ((s, d) => {
      val toks = tokens(col("text"))
      val nTok = size(toks).cast("long")
      val stops = size(filter(toks, t => t.isin(stopwords: _*))).cast("long")
      val g2 = shinglesStrict(toks, 2)
      val f1 = nTok >= lit(20L)                       // length floor
      val f2 = f1 && stops * 10 >= nTok               // stopword ratio ≥ .1
      val f3 = f2 && size(array_distinct(g2)).cast("long") * 5 >=
        size(g2).cast("long") * 4                     // dup-2gram ≤ .2
      Tables.documents(s, d)
        .agg(count(lit(1)).as("n0"),
          sum(when(f1, 1L).otherwise(0L)).as("n1"),
          sum(when(f2, 1L).otherwise(0L)).as("n2"),
          sum(when(f3, 1L).otherwise(0L)).as("n3"))
        .selectExpr("""stack(4,
          '0_all', n0, '1_minlen', n1, '2_stopword', n2, '3_repetition', n3)
          AS (stage, n_docs)""")
        .orderBy("stage")
    }),

    // PII redaction: regex scrub of emails/long digit runs (synthesized
    // onto the corpus so the redaction actually fires)
    "t_redact_pii" -> ((s, d) => {
      val withPii = concat(col("text"), lit(" contact: "), col("source"),
        lit("@example.com id 1234567890"))
      Tables.documents(s, d)
        .filter(col("doc_id") < 100)
        .select(col("doc_id"),
          regexp_replace(
            regexp_replace(withPii,
              "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+", "<EMAIL>"),
            "\\d{6,}", "<NUM>").as("redacted"))
        .orderBy("doc_id")
    }),

    // stratified per-language cap: first N docs per lang — the
    // deterministic form of language-balanced corpus sampling
    "t_stratified_cap" -> ((s, d) => {
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("lang").orderBy("doc_id")
      Tables.documents(s, d)
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") <= 20)
        .select(col("doc_id"), col("lang"), col("rn").cast("long").as("rn"))
        .orderBy("lang", "rn")
    }),

    // sequence packing: assign docs to training packs by cumulative token
    // budget (2048): pack_id = floor(exclusive-prefix-tokens / budget).
    // The exact global running sum is computed as a DISTRIBUTED prefix
    // sum — range-partition by doc_id, per-partition local prefix
    // window, plus a broadcast exclusive offset per partition (one tiny
    // row per partition; the offset window runs over #partitions rows,
    // not data rows). No single-reducer stage at any corpus size.
    "t_pack_sequences" -> ((s, d) => {
      val W = org.apache.spark.sql.expressions.Window
      // materialized ONCE (localCheckpoint): the offsets aggregate and
      // the main branch below both read `pid`, and spark_partition_id is
      // only consistent between them if they read the SAME physical
      // partitioning — two independent evaluations of the range
      // repartition could be coalesced differently by AQE and silently
      // attach offsets to the wrong partitions
      val toks = Tables.documents(s, d)
        .withColumn("n_tok", size(tokens(col("text"))).cast("long"))
        .select(col("doc_id"), col("n_tok"))
        .repartitionByRange(col("doc_id"))
        .withColumn("pid", spark_partition_id())
        .localCheckpoint()
      val wLocal = W.partitionBy("pid").orderBy("doc_id")
        .rowsBetween(W.unboundedPreceding, -1)
      val offsets = toks.groupBy("pid").agg(sum("n_tok").as("ptot"))
        .withColumn("offset", coalesce(sum("ptot").over(
          W.orderBy("pid").rowsBetween(W.unboundedPreceding, -1)), lit(0L)))
        .select("pid", "offset")
      toks.join(broadcast(offsets), "pid")
        .withColumn("prev_cum",
          coalesce(sum("n_tok").over(wLocal), lit(0L)) + col("offset"))
        .select(col("doc_id"), col("n_tok"),
          floor(col("prev_cum") / 2048).as("pack_id"))
        .orderBy("doc_id")
    }),

    // CHAT TEMPLATING — render `messages: array<struct<role,content>>`
    // (the c45 conversation shape) into the single role-tagged string a
    // tokenizer consumes (`<|user|>...<|end|><|assistant|>...<|end|>`),
    // via the higher-order `aggregate` fold over the turn array — the
    // codegen'd primitive every SFT data pipeline runs before packing;
    // zero shuffles, one narrow map over the corpus, and the rendered
    // text feeds t_pack_sequences' token budgeter unchanged. Turn lists
    // are variable-length (every third doc carries a follow-up turn)
    // and the reply role varies, so the fold is exercised, not
    // decorative.
    "t_chat_template" -> ((s, d) => {
      val userTurn = struct(lit("user").as("role"),
        concat(lit("u_"), col("doc_id") % 50).as("content"))
      val replyTurn = struct(
        when(col("doc_id") % 4 === 0, "tool").otherwise("assistant")
          .as("role"),
        concat(lit("a_"), col("doc_id") % 31).as("content"))
      val followTurn = struct(lit("user").as("role"),
        concat(lit("u2_"), col("doc_id") % 13).as("content"))
      Tables.documents(s, d)
        .select(col("doc_id").as("k"), col("lang"),
          when(col("doc_id") % 3 === 0,
            array(userTurn, replyTurn, followTurn))
            .otherwise(array(userTurn, replyTurn)).as("messages"))
        .select(col("k"), col("lang"),
          aggregate(col("messages"), lit(""), (acc, m) =>
            concat(acc, lit("<|"), m.getField("role"), lit("|>"),
              m.getField("content"), lit("<|end|>"))).as("text"),
          size(col("messages")).cast("long").as("n_turns"))
        .withColumn("n_chars", length(col("text")).cast("long"))
        .orderBy("k")
    }),

    // BPE-style merge-pair counting — ONE round of the tokenizer-training
    // loop: count adjacent token pairs corpus-wide, rank the merge
    // candidates. zip_with over two slices forms the pairs without a
    // positional self-join; one shuffle (pair groupBy) + TakeOrdered.
    // Real BPE iterates this with a vocabulary rewrite between rounds —
    // each round is exactly this plan.
    "t_bpe_pairs" -> ((s, d) => {
      val t = tokens(col("text"))
      val n1 = greatest(size(t) - 1, lit(0))
      val pairs = zip_with(slice(t, lit(1), n1), slice(t, lit(2), n1),
        (a, b) => concat(a, lit(" "), b))
      Tables.documents(s, d)
        .select(explode(pairs).as("pair"))
        .groupBy("pair").agg(count(lit(1)).as("n"))
        .orderBy(col("n").desc, col("pair")).limit(20)
    }),

    // BPE merge TRAINING — the full iterative loop t_bpe_pairs is one
    // round of: distributed word-frequency count (capped), then 20
    // deterministic merges over the bounded dictionary (see bpeTrain).
    // ORACLE-checked against a 20-step UNROLLED DuckDB reimplementation
    // (bpeTrainOracle); TextSpec additionally pins the merge sequence on
    // the Sennrich corpus against hand-computed truth.
    "t_bpe_train" -> ((s, d) => {
      import s.implicits._
      bpeTrain(Tables.documents(s, d))
        .toDF("step", "left", "right", "merged", "freq")
        .select(col("step").cast("long").as("step"), col("left"),
          col("right"), col("merged"), col("freq"))
        .orderBy("step")
    }),

    // BPE tokenizer APPLY — the trained merge table (t_bpe_train) pushed
    // through the native BpeApply expression over every document: one
    // narrow map pass, merge table rides the plan as a constant. Output
    // is the per-doc subword count and fertility (subwords/word), the
    // number every tokenizer-budget estimate needs. ORACLE-checked
    // against the unrolled train+apply SQL reimplementation
    // (bpeApplyOracle); TextSpec pins segmentations on the Sennrich
    // corpus.
    "t_bpe_apply" -> ((s, d) => {
      import org.apache.spark.sql.graft.ColumnBridge.{column, expression}
      val docs = Tables.documents(s, d)
      val merges = bpeTrain(docs).map(m => (m._2, m._3)).toArray
      val sub = column(graft.functions.BpeApply(
        expression(tokens(col("text"))), merges))
      docs.select(col("doc_id"),
          size(tokens(col("text"))).cast("long").as("n_words"),
          size(sub).cast("long").as("n_subwords"))
        .withColumn("fertility",
          round(col("n_subwords") / col("n_words"), 6))
        .orderBy("doc_id")
    }),

    // language-mixture sampling weights: per-language doc share and the
    // temperature-rebalanced (alpha = 0.5) sampling share every
    // multilingual training mix uses to up-weight low-resource
    // languages. Two tiny aggregates over the lang dictionary — the
    // corpus is scanned once.
    "t_mix_weights" -> ((s, d) => {
      val byLang = Tables.documents(s, d)
        .groupBy("lang").agg(count(lit(1)).as("n_docs"))
      // the normalizer sums IRRATIONAL sqrt terms: route it through the
      // decimal path (round each term to 9 places, sum exactly) so the
      // total is summation-order-free — a raw double sum could differ
      // in the last ulp between engines/partitionings and flip
      // round(...,6) at a boundary
      val tot = byLang.agg(sum("n_docs").as("n_total"),
        sum(round(sqrt(col("n_docs")), 9).cast("decimal(28,9)")).as("z"))
      byLang.crossJoin(broadcast(tot))
        .select(col("lang"), col("n_docs"),
          round(col("n_docs") / col("n_total"), 6).as("raw_share"),
          round(sqrt(col("n_docs")) / col("z"), 6).as("temp_share"))
        .orderBy("lang")
    }),

    // deterministic train/val/test assignment — the reproducible-split
    // contract every training pipeline needs: membership is a pure
    // function of the stable doc_id (first md5 byte, lexicographic hex
    // compare ≈ 90/5/5), so re-runs, engines, and cluster sizes all
    // agree, and no shuffle is needed to ASSIGN (only the small audit
    // rollup aggregates). Never use random() or row position: both
    // change under re-partitioning.
    // Native UDTF: the ShingleExplode Generator streams (pos, shingle)
    // rows from each document in one fused pass — unlike the builtin
    // transform(sequence…)+posexplode composition, the full shingle
    // array (k× the document bytes) is never materialized per row.
    // Exercised here through the DataFrame generator path (multi-alias
    // select → Generate node); SessionSpec drives the same expression
    // from SQL via LATERAL VIEW. Oracle = DuckDB range unnest.
    "t_shingle_explode" -> ((s, d) => {
      import org.apache.spark.sql.graft.ColumnBridge.{column, expression}
      Tables.documents(s, d)
        .filter(col("doc_id") < 50)
        .select(col("doc_id"),
          column(graft.functions.ShingleExplode(expression(col("text")), 3))
            .as(Seq("pos", "shingle")))
        .orderBy("doc_id", "pos")
    }),

    // END-TO-END curation funnel in ONE job — the composition the
    // individual stages exist for: quality floor (t_filter_pipeline's
    // length gate) → corpus-wide exact dedup keeping the first
    // occurrence (dedup_exact's md5 keyed on the full text — the
    // shuffle key is high-cardinality, so partitions stay even at any
    // scale) → deterministic md5 split assignment (t_split_assign) →
    // per-(split, lang) corpus manifest. One dedup shuffle + one
    // manifest aggregation; every stage is individually oracle-verified
    // elsewhere, and this entry verifies their composition.
    "t_curate_e2e" -> ((s, d) => {
      val wDup = org.apache.spark.sql.expressions.Window
        .partitionBy("h").orderBy("doc_id")
      val b = substring(md5(col("doc_id").cast("string")), 1, 2)
      Tables.documents(s, d)
        .withColumn("n_tok", size(tokens(col("text"))).cast("long"))
        .filter(col("n_tok") >= 20L)
        .withColumn("h", md5(col("text")))
        .withColumn("rn", row_number().over(wDup))
        .filter(col("rn") === 1)
        .withColumn("split",
          when(b < "e6", "train").when(b < "f2", "val").otherwise("test"))
        .groupBy("split", "lang")
        .agg(count(lit(1)).as("n_docs"),
          sum("n_tok").as("sum_tokens"),
          sum("n_chars").cast("long").as("sum_chars"))
        .orderBy("split", "lang")
    }),

    // GOPHER-STYLE QUALITY RULE BATTERY (Rae et al. 2021, "Scaling
    // Language Models: ... Gopher", Appendix A) — the standard
    // pre-training quality gate as ONE battery: word count band, mean
    // word length band, minimum stopword evidence, alphabetic-word
    // ratio, and a top-token repetition cap (the single-line corpus
    // analog of Gopher's duplicate-n-gram rules; dedup_* handles the
    // cross-doc family). Every rule is INTEGER-ARITHMETIC
    // (cross-multiplied thresholds, never a float ratio) so both
    // engines agree doc for doc. Shape: one explode + one (doc, tok)
    // shuffle + one doc shuffle — the per-token regroup is what makes
    // the repetition cap computable in the same pass as the length
    // stats; nothing here grows faster than token count.
    "t_gopher_rules" -> ((s, d) => {
      val perTok = Tables.documents(s, d)
        .select(col("doc_id"), explode(split(col("text"), " ")).as("tok"))
        .groupBy("doc_id", "tok")
        .agg(count(lit(1)).as("cnt"))
      val doc = perTok.groupBy("doc_id").agg(
        sum("cnt").cast("long").as("n_words"),
        sum(col("cnt") * length(col("tok"))).cast("long").as("sum_len"),
        max("cnt").cast("long").as("max_freq"),
        count(when(col("tok").isin("the", "a", "of", "to", "and"), 1))
          .as("n_stop"),
        sum(when(col("tok").rlike("[a-zA-Z]"), col("cnt"))
          .otherwise(lit(0L))).cast("long").as("n_alpha"))
      doc.select(col("doc_id"), col("n_words"),
          (col("n_words") >= 20 && col("n_words") <= 100000)
            .as("ok_word_count"),
          (col("sum_len") >= col("n_words") * 3 &&
            col("sum_len") <= col("n_words") * 10).as("ok_mean_word_len"),
          (col("n_stop") >= 2).as("ok_stopwords"),
          (col("n_alpha") * 5 >= col("n_words") * 4).as("ok_alpha_words"),
          (col("max_freq") * 5 <= col("n_words")).as("ok_repetition"))
        .withColumn("keep", col("ok_word_count") &&
          col("ok_mean_word_len") && col("ok_stopwords") &&
          col("ok_alpha_words") && col("ok_repetition"))
        .orderBy("doc_id")
    }),

    // DSIR IMPORTANCE WEIGHTS (Xie et al., NeurIPS 2023, "Data
    // Selection for Language Models via Importance Resampling"): score
    // every raw doc by how target-like it is under bag-of-hashed-token
    // models — log w(doc) = Σ_tokens [log p_target(bucket) −
    // log p_raw(bucket)], add-one smoothed over B=1024 md5 buckets
    // (the t_feature_hash vocabulary-free hash, so two engines and two
    // runs agree bucket for bucket). Target here = the `en` slice; in
    // production it is the high-quality reference corpus and the raw
    // side is the crawl. Per-token log terms are rounded-9 then
    // DECIMAL-summed (t_bigram_lm discipline) — engine-portable
    // despite libm logs. Shape: one token scan builds the B-row model
    // (conditional counts, one ≤B-key shuffle), the model broadcasts
    // back to a second token scan, one doc shuffle sums — the model
    // never grows with the corpus, and the weights feed the
    // TopKPerKey / A-Res samplers (t_weighted_sample) for the actual
    // resample step.
    "t_dsir_weights" -> ((s, d) => {
      val buckets = 1024
      val tok = Tables.documents(s, d)
        .select(col("doc_id"), col("lang"),
          explode(split(col("text"), " ")).as("tok"))
        .withColumn("bucket",
          conv(substring(md5(col("tok")), 1, 4), 16, 10).cast("long")
            % buckets)
      val model = tok
        .groupBy("bucket")
        .agg(count(when(col("lang") === "en", 1)).as("ct"),
          count(lit(1)).as("cr"))
        .crossJoin(broadcast(tok.agg(
          count(when(col("lang") === "en", 1)).as("tt"),
          count(lit(1)).as("tn"))))
        .select(col("bucket"), round(
          log10((col("ct") + 1).cast("double") / (col("tt") + buckets)) -
            log10((col("cr") + 1).cast("double") / (col("tn") + buckets)),
          9).as("llr"))
      tok.join(broadcast(model), "bucket")
        .groupBy("doc_id")
        .agg(count(lit(1)).as("n_tokens"),
          round(Sql.dsum(col("llr"), 9), 6).as("log_weight"))
        .orderBy("doc_id")
    }),

    // ZIPF-law fit — the corpus-statistics profile op: OLS slope of
    // log10(freq) on log10(rank) over the frequency-ranked vocabulary
    // (a healthy natural-language corpus slopes ≈ −1; a flat or broken
    // slope flags templated/synthetic text). Ranks come from the
    // t_vocab distributed sort+zipWithIndex shape; the regression is
    // a16's exact-moment OLS with the round-9-then-decimal-sum
    // discipline on the log terms, so the fit is engine-portable
    // despite libm logs. One count shuffle + one global sort + one
    // five-slot aggregate.
    "t_zipf_fit" -> ((s, d) => {
      import s.implicits._
      val ranked = Tables.documents(s, d)
        .select(explode(split(col("text"), " ")).as("word"))
        .groupBy("word").agg(count(lit(1)).as("freq"))
        .orderBy(col("freq").desc, col("word"))
        .as[(String, Long)]
        .rdd.zipWithIndex()
        .map { case ((w, f), i) => (w, f, i + 1L) }
        .toDF("word", "freq", "rank")
      val d38 = org.apache.spark.sql.types.DecimalType(38, 18)
      ranked
        .select(round(log10(col("rank").cast("double")), 9).as("x"),
          round(log10(col("freq").cast("double")), 9).as("y"))
        .agg(count(lit(1)).as("n"),
          sum(col("x").cast(Sql.dec(9))).cast("double").as("sx"),
          sum(col("y").cast(Sql.dec(9))).cast("double").as("sy"),
          sum((col("x") * col("x")).cast(d38)).cast("double").as("sxx"),
          sum((col("x") * col("y")).cast(d38)).cast("double").as("sxy"))
        .withColumn("slope_raw",
          (col("n") * col("sxy") - col("sx") * col("sy")) /
            (col("n") * col("sxx") - col("sx") * col("sx")))
        .select(col("n").as("n_words"),
          round(col("slope_raw"), 6).as("zipf_slope"),
          round((col("sy") - col("slope_raw") * col("sx")) / col("n"), 6)
            .as("intercept"))
    }),

    // EPOCH-order global shuffle — the op that turns a corpus into a
    // reproducible random read order per training epoch: key =
    // md5(epoch ':' doc_id), so each epoch is a DIFFERENT but fully
    // deterministic permutation (stable under re-runs and cluster
    // re-sizing — the key is content-derived, not partition-derived).
    // The global position comes from a real sort (range exchange +
    // per-partition sorts) + zipWithIndex, the t_vocab shape — never a
    // single-partition rank window. At 100 TB this IS the write-the-
    // epoch-order pass every trainer's data loader consumes.
    "t_epoch_shuffle" -> ((s, d) => {
      import s.implicits._
      Tables.documents(s, d)
        .select(col("doc_id"),
          md5(concat_ws(":", lit(2), col("doc_id"))).as("shuffle_key"))
        .orderBy("shuffle_key")
        .as[(Long, String)]
        .rdd.zipWithIndex()
        .map { case ((id, k), i) => (id, k, i + 1L) }
        .toDF("doc_id", "shuffle_key", "pos")
        .orderBy("pos")
    }),

    // DETERMINISTIC TOKEN DROPOUT — the denoising-objective /
    // augmentation corruption (drop ~10% of tokens), made a PURE
    // FUNCTION of (doc, position, token) via md5 instead of RNG state:
    // the same corruption reproduces across re-runs, engines,
    // partitionings, and epochs change it by salting the key — the
    // t_split_assign reproducibility discipline applied to
    // augmentation. One explode + one per-doc regroup; surviving text
    // rides as md5 (the t_chunk_overlap contract).
    "t_token_dropout" -> ((s, d) => {
      val keyHash = conv(substring(md5(concat_ws(":",
        col("doc_id").cast("string"), col("pos").cast("string"),
        col("tok"))), 1, 4), 16, 10).cast("long")
      Tables.documents(s, d)
        .select(col("doc_id"),
          posexplode(split(col("text"), " ")).as(Seq("pos", "tok")))
        .withColumn("keep", keyHash >= 6554) // P(drop) ≈ 6554/65536 ≈ 10%
        .groupBy("doc_id")
        .agg(count(lit(1)).as("n_tokens"),
          sum(when(col("keep"), 0L).otherwise(1L)).as("n_dropped"),
          md5(array_join(transform(sort_array(collect_list(
              when(col("keep"), struct(col("pos"), col("tok"))))),
            x => x.getField("tok")), " ")).as("kept_md5"))
        .orderBy("doc_id")
    }),

    // MODEL-BASED QUALITY FILTERING — the frozen-classifier gate every
    // curation stack runs after the rule battery (t_filter_pipeline):
    // a linear model over cheap text features, scored in-plan. Weights
    // are FROZEN constants (training is offline; serving is this
    // projection), so the whole scorer is one narrow codegen'd map —
    // no UDF, no model server round-trip, shuffle-free. Determinism:
    // the logit is rounded(9) BEFORE the sigmoid so both engines
    // exponentiate the identical double; the final round(6) absorbs
    // libm's last-ulp exp() drift (the t_bigram_lm discipline).
    "t_quality_classifier" -> ((s, d) => {
      val toks = tokens(col("text"))
      val nTok = size(toks).cast("long")
      val stops = size(filter(toks, t => t.isin(stopwords: _*))).cast("long")
      val score = lit(1.0) / (lit(1.0) + exp(-col("z")))
      Tables.documents(s, d)
        .select(col("doc_id"), nTok.as("n_tokens"),
          (stops.cast("double") / nTok).as("stop_ratio"),
          ((length(col("text")).cast("long") - (nTok - 1)).cast("double") /
            nTok).as("awl"))
        .withColumn("z", round(
          lit(-0.35) + lit(4.0) * col("stop_ratio") +
            lit(0.01) * least(col("n_tokens"), lit(200L)).cast("double") -
            lit(0.1) * col("awl"), 9))
        .select(col("doc_id"), col("n_tokens"),
          round(col("stop_ratio"), 6).as("stop_ratio"),
          round(score, 6).as("score"),
          (score >= 0.5).as("keep"))
        .orderBy("doc_id")
    }),

    // FILL-IN-THE-MIDDLE transform (Bavarian et al., 2022) — the
    // prefix/middle/suffix document split infilling-capable model
    // training runs over its corpus. Split points are pure md5
    // functions of doc_id (the t_split_assign discipline): stable
    // under re-runs, engines, partitionings — no RNG state anywhere.
    // Narrow per-row string kernel, zero shuffles; spans are verified
    // in-plan by re-concatenation (`reassembles`). Segment CONTENT
    // rides as md5 (the t_chunk_overlap contract).
    "t_fim_split" -> ((s, d) => {
      def h(tag: String) = conv(substring(
        md5(concat(col("doc_id").cast("string"), lit(tag))), 1, 4), 16, 10)
        .cast("long")
      Tables.documents(s, d)
        .withColumn("p1", h(":a") % length(col("text")))
        .withColumn("p2", h(":b") % length(col("text")))
        .withColumn("lo", least(col("p1"), col("p2")))
        .withColumn("hi", greatest(col("p1"), col("p2")))
        .withColumn("prefix", expr("substr(text, 1, lo)"))
        .withColumn("middle", expr("substr(text, lo + 1, hi - lo)"))
        .withColumn("suffix", expr("substr(text, hi + 1)"))
        .select(col("doc_id"), col("lo"), col("hi"),
          md5(col("prefix")).as("prefix_md5"),
          md5(col("middle")).as("middle_md5"),
          md5(col("suffix")).as("suffix_md5"),
          (md5(concat(col("prefix"), col("middle"), col("suffix"))) ===
            md5(col("text"))).as("reassembles"))
        .orderBy("doc_id")
    }),

    // FEATURE HASHING (the Weinberger hashing trick) — bag-of-words
    // folded into a FIXED 64-bucket vector: bucket and sign are pure
    // functions of md5(token), so the feature space never needs a
    // driver-side vocabulary, new tokens never resize anything, and any
    // two runs (or engines — the oracle recomputes it) agree bucket for
    // bucket. Signed counts cancel collision bias (Weinberger et al.,
    // ICML'09). Shape: one explode + one (doc, bucket) count shuffle +
    // one per-doc regroup; the sparse vector serializes as "b:v" text
    // because raw array cells can't ride the harness hash. At prod scale
    // the bucket count is 2^18+ — same plan, wider key space.
    "t_feature_hash" -> ((s, d) => {
      val h = md5(col("tok"))
      Tables.documents(s, d)
        .select(col("doc_id"), explode(split(col("text"), " ")).as("tok"))
        .withColumn("bucket",
          conv(substring(h, 1, 4), 16, 10).cast("long") % 64)
        .withColumn("sign",
          when(conv(substring(h, 5, 1), 16, 10).cast("long") % 2 === 0, 1L)
            .otherwise(-1L))
        .groupBy("doc_id", "bucket")
        .agg(count(lit(1)).as("cnt"), sum("sign").as("v"))
        .groupBy("doc_id")
        .agg(sum("cnt").cast("long").as("n_tokens"),
          count(lit(1)).as("nnz"),
          array_join(transform(
            sort_array(collect_list(struct(col("bucket"), col("v")))),
            x => concat(x.getField("bucket").cast("string"), lit(":"),
              x.getField("v").cast("string"))), " ").as("vec"))
        .orderBy("doc_id")
    }),

    "t_split_assign" -> ((s, d) => {
      val b = substring(md5(col("doc_id").cast("string")), 1, 2)
      Tables.documents(s, d)
        .withColumn("split",
          when(b < "e6", "train").when(b < "f2", "val").otherwise("test"))
        .groupBy("split", "lang")
        .agg(count(lit(1)).as("n_docs"),
          sum("n_chars").cast("long").as("sum_chars"))
        .orderBy("split", "lang")
    }),

    // Population-stability drift (PSI) between the deterministic train
    // split and the rest — the drift monitor a training pipeline runs
    // when a new crawl lands. Feature = n_chars in fixed-width bins;
    // PSI term per bin = (pa - pb) * ln(pa / pb). One pass: a single
    // groupBy(bin) with conditional counts (no per-split scans), share
    // division is exact-count double division, and ln-derived terms are
    // ROUNDED per determinism rules (libm last-ulp drift). Bins empty
    // on either side yield NULL psi (the standard epsilon dodge is a
    // policy choice; surfacing NULL is honest). Scale: one shuffle on
    // ≤10 bin keys after map-side partial counts.
    "t_psi_drift" -> ((s, d) => {
      val split = when(
        substring(md5(col("doc_id").cast("string")), 1, 2) < "e6", "a")
        .otherwise("b")
      val binned = Tables.documents(s, d)
        .withColumn("bin", least(lit(9L), expr("n_chars DIV 32")))
        .withColumn("split", split)
      val counts = binned.groupBy("bin")
        .agg(sum(when(col("split") === "a", 1L).otherwise(0L)).as("na"),
          sum(when(col("split") === "b", 1L).otherwise(0L)).as("nb"))
      val totals = broadcast(counts.agg(
        sum("na").as("ta"), sum("nb").as("tb")))
      counts.crossJoin(totals)
        .select(col("bin"), col("na"), col("nb"),
          round(col("na").cast("double") / col("ta"), 6).as("pa"),
          round(col("nb").cast("double") / col("tb"), 6).as("pb"),
          round(when(col("na") > 0 && col("nb") > 0,
            (col("na").cast("double") / col("ta") -
              col("nb").cast("double") / col("tb")) *
              log(col("na").cast("double") / col("ta") /
                (col("nb").cast("double") / col("tb")))), 6).as("psi_term"))
        .orderBy("bin")
    }),

    // Token co-occurrence mining (market-basket over documents): which
    // word pairs appear together in ≥ 3 docs. Pair generation is
    // PER-DOC and map-side — sort+distinct the token array, emit all
    // (a < b) pairs with a higher-order transform over slices — so the
    // only shuffle is the final (tok_a, tok_b) count with map-side
    // partial aggregation. The naive alternative (explode + self-join
    // on doc_id) shuffles the exploded corpus twice and re-pairs via
    // join; this shape never joins at all. Pairs per doc are O(t²) in
    // DISTINCT tokens — bounded by doc length, and at corpus scale the
    // min-support threshold prunes the long tail after the partial
    // aggregate.
    "t_cooccur" -> ((s, d) =>
      // fanned out: the O(k²) per-doc pair generation is the rare
      // CPU-bound kernel heavy enough to beat the repartition cost of a
      // one-file scan (see Tables.fanOut)
      Tables.fanOut(Tables.documents(s, d))
        .select(array_sort(array_distinct(tokens(col("text")))).as("toks"))
        .select(explode(expr(
          """flatten(transform(toks, (x, i) ->
            |  transform(slice(toks, i + 2, size(toks) - i - 1),
            |    y -> struct(x AS a, y AS b))))""".stripMargin)).as("p"))
        .groupBy(col("p.a").as("tok_a"), col("p.b").as("tok_b"))
        .agg(count(lit(1)).as("n_docs"))
        .filter(col("n_docs") >= 3)
        .orderBy(col("n_docs").desc, col("tok_a"), col("tok_b"))
        .limit(100)),

    // ASSOCIATION RULES from the co-occurrence counts: support,
    // confidence (both directions folded to a->b with a<b kept), and
    // LIFT — the market-basket readout over the same map-side pair
    // kernel as t_cooccur. Item doc-frequencies are vocabulary-sized
    // and broadcast twice; N is a scalar. Lift > 1 = genuinely
    // associated tokens, not just two common ones.
    "t_assoc_rules" -> ((s, d) => {
      val docs = Tables.fanOut(Tables.documents(s, d))
        .select(array_sort(array_distinct(tokens(col("text")))).as("toks"))
        .localCheckpoint()
      val pairs = docs
        .select(explode(expr(
          """flatten(transform(toks, (x, i) ->
            |  transform(slice(toks, i + 2, size(toks) - i - 1),
            |    y -> struct(x AS a, y AS b))))""".stripMargin)).as("p"))
        .groupBy(col("p.a").as("tok_a"), col("p.b").as("tok_b"))
        .agg(count(lit(1)).as("n_ab"))
        .filter(col("n_ab") >= 50)
      val items = docs.select(explode(col("toks")).as("tok"))
        .groupBy("tok").agg(count(lit(1)).as("n_tok"))
      val total = docs.agg(count(lit(1)).as("n_docs"))
      pairs
        .join(broadcast(items.select(col("tok").as("tok_a"),
          col("n_tok").as("n_a"))), Seq("tok_a"))
        .join(broadcast(items.select(col("tok").as("tok_b"),
          col("n_tok").as("n_b"))), Seq("tok_b"))
        .crossJoin(broadcast(total))
        .select(col("tok_a"), col("tok_b"), col("n_ab"),
          round(col("n_ab") / col("n_docs"), 6).as("support"),
          round(col("n_ab") / col("n_a"), 6).as("confidence"),
          round(col("n_ab").cast("double") * col("n_docs") /
            (col("n_a") * col("n_b")), 6).as("lift"))
        .orderBy("tok_a", "tok_b")
    }),

    // Long-document chunking with overlap — the context-window prep op:
    // window 16 tokens, stride 12 (prod: 2048/1536 — same arithmetic).
    // Pure per-row explode: sequence() generates chunk starts, slice()
    // takes each window, md5 pins the exact chunk CONTENT (not just
    // boundaries) against the oracle's list slicing. Zero shuffles
    // before the output sort; chunks inherit the doc's partition.
    "t_chunk_overlap" -> ((s, d) => {
      val window = 16
      val stride = 12
      Tables.documents(s, d)
        .select(col("doc_id"), tokens(col("text")).as("toks"))
        .withColumn("n", size(col("toks")))
        .select(col("doc_id"), col("toks"), col("n"),
          posexplode(sequence(lit(0), col("n") - 1, lit(stride))))
        .select(col("doc_id"), col("pos").cast("long").as("chunk_idx"),
          col("col").cast("long").as("start_tok"),
          least(lit(window), col("n") - col("col")).cast("long").as("len_tok"),
          md5(concat_ws(" ",
            slice(col("toks"), col("col") + 1,
              least(lit(window), col("n") - col("col"))))).as("chunk_md5"))
        .orderBy("doc_id", "chunk_idx")
    }),

    // Compression-ratio quality signal — the classic cheap proxy for
    // boilerplate/repetition (low ratio) vs natural text: deflate each
    // doc with ONE per-partition Deflater instance (the batch-kernel
    // shape — codec allocated once, rows streamed through it). zlib
    // BYTES depend on the library build, so the raw compressed size
    // can never be oracle-hashed — instead the VERIFIED OUTPUT is the
    // sketch-query pattern: deterministic per-doc features (UTF-8
    // byte length, dumped and hash-compared) plus BOUND CLAIMS pinned
    // TRUE against properties any correct zlib must satisfy —
    // `ratio_sane` (every ratio in (0, 1.5] — deflate never balloons
    // a real document) and `compress_discriminates` (docs with
    // below-average distinct-token fraction — the repetitive half —
    // compress strictly better on average than the varied half, the
    // discriminative ordering that makes the signal worth computing).
    // TextSpec keeps the per-doc determinism/ordering checks. At
    // corpus scale this is a shuffle-free narrow map feeding the same
    // threshold filters as t_quality.
    "t_compress_ratio" -> ((s, d) => {
      import s.implicits._
      val rated = Tables.documents(s, d)
        .select(col("doc_id"), col("lang"), col("text"),
          (size(array_distinct(tokens(col("text")))).cast("double") /
            greatest(size(tokens(col("text"))), lit(1)).cast("double"))
            .as("uniq_frac"))
        .as[(Long, String, String, Double)]
        .mapPartitions { rows =>
          val deflater = new java.util.zip.Deflater(6)
          val buf = new Array[Byte](1 << 16)
          rows.map { case (id, lang, text, uniq) =>
            val in = text.getBytes("UTF-8")
            deflater.reset(); deflater.setInput(in); deflater.finish()
            var n = 0L
            while (!deflater.finished()) n += deflater.deflate(buf)
            (id, lang, in.length.toLong,
              math.round(n.toDouble / in.length * 1e6) / 1e6, uniq)
          } ++ { deflater.end(); Iterator.empty } // release native memory
        }
        .toDF("doc_id", "lang", "n_bytes", "ratio", "uniq_frac")
        .localCheckpoint() // one deflate pass feeds all three reads
      val sane = rated
        .filter(col("ratio") <= 0.0 || col("ratio") > 1.5).count() == 0
      val cut = rated.agg(avg(col("uniq_frac"))).head.getDouble(0)
      val sides = rated.agg(
        avg(when(col("uniq_frac") < cut, col("ratio"))).as("rep"),
        avg(when(col("uniq_frac") >= cut, col("ratio"))).as("var"))
        .head
      // an empty side (all docs share one uniq_frac, or a single-doc
      // corpus) means the ordering claim is unsupported, not an NPE:
      // avg(when(...)) is NULL there — the claim defaults to false
      val discriminates = !sides.isNullAt(0) && !sides.isNullAt(1) &&
        sides.getDouble(0) < sides.getDouble(1)
      rated.select(col("doc_id"), col("lang"), col("n_bytes"))
        .withColumn("ratio_sane", lit(sane))
        .withColumn("compress_discriminates", lit(discriminates))
        .orderBy("doc_id")
    }),

    // Deterministic weighted sampling (A-Res): 5 docs per language,
    // inclusion probability ∝ n_chars, via priority u^(1/w) with u a
    // PURE-ARITHMETIC hash of doc_id (Knuth multiplicative — both
    // engines compute the identical BIGINT expression; no engine RNG,
    // so the "random" sample is reproducible across engines, reruns,
    // and repartitionings). Priorities are rounded BEFORE ranking;
    // selection runs through the TopKPerKey operator — bounded heaps,
    // no per-stratum sort — so this also exercises the custom plan
    // path on a second query shape.
    "t_weighted_sample" -> ((s, d) => {
      val u = (col("doc_id") * lit(2654435761L)) % lit(2147483648L) /
        lit(2147483648.0)
      val prio = Tables.documents(s, d)
        .select(col("doc_id"), col("lang"), col("n_chars"),
          round(pow(u, lit(1.0) / col("n_chars")), 9).as("priority"))
      graft.plans.TopK.topKPerKey(prio, Seq("lang"), "priority",
          "doc_id", k = 5)
        .select(col("lang"), col("doc_id"), col("n_chars"), col("priority"))
        .orderBy("lang", "doc_id")
    }),

    // Vocabulary coverage / OOV rate per language — the tokenizer-fit
    // check: what fraction of token OCCURRENCES a top-20 vocabulary
    // covers. Vocab = one count shuffle + top-k (total order: count
    // desc, token asc — deterministic); coverage = a broadcast semi-
    // probe of the token stream + one conditional-count pass per lang.
    // At corpus scale the vocab is always broadcast-sized (it's a
    // vocabulary), so the big table never shuffles twice.
    "t_oov_rate" -> ((s, d) => {
      val tok = Tables.documents(s, d)
        .select(col("lang"), explode(tokens(col("text"))).as("tok"))
      val vocab = tok.groupBy("tok").agg(count(lit(1)).as("n"))
        .orderBy(col("n").desc, col("tok")).limit(20)
      tok.join(broadcast(vocab.select(col("tok"),
          lit(true).as("in_vocab"))), Seq("tok"), "left")
        .groupBy("lang")
        .agg(count(lit(1)).as("n_tokens"),
          sum(when(col("in_vocab"), 1L).otherwise(0L)).as("n_covered"))
        .withColumn("oov_rate",
          round(lit(1.0) - col("n_covered").cast("double") / col("n_tokens"), 6))
        .orderBy("lang")
    }),

    // TF-IDF top term per document — the canonical corpus-statistics op.
    // tf/df from one tokenize pass; N rides as a broadcast scalar; the
    // score is ROUNDED BEFORE ranking so both engines rank identical
    // values (ln differs in the last ulp across libm implementations).
    // Scale: two shuffles (doc-term, term) + per-doc window; at corpus
    // scale df would be freq-pruned then broadcast.
    "t_tfidf_top" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      val tf = docs
        .select(col("doc_id"), explode(tokens(col("text"))).as("word"))
        .groupBy("doc_id", "word").agg(count(lit(1)).as("tf"))
      val df = tf.groupBy("word").agg(count(lit(1)).as("df"))
      val n = docs.agg(count(lit(1)).as("n"))
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("doc_id").orderBy(col("score").desc, col("word"))
      tf.join(df, "word").crossJoin(broadcast(n))
        .withColumn("score",
          round(col("tf") * log(col("n").cast("double") / col("df")), 6))
        .withColumn("rk", row_number().over(w))
        .filter(col("rk") === 1)
        .select(col("doc_id"), col("word").as("top_word"), col("score"))
        .orderBy("doc_id")
    }),

    // Bigram language-model scoring — the statistical quality signal a
    // curation pipeline ranks documents with (low mean log-probability
    // = unnatural/garbled text): corpus bigram counts with add-one
    // smoothing, P(w2|w1) = (C(w1w2)+1)/(C(w1·)+V), per-doc mean log10.
    // Three aggregates off ONE bigram explode (bigram counts, context
    // counts, vocab size) joined back map-side; per-bigram logs rounded
    // to 9 then decimal-summed so the per-doc mean is order-free and
    // engine-identical (the a9 sqrt discipline). At 100 TB the count
    // tables are exactly the LM-training shape: key-partitioned
    // aggregates, no global state beyond the broadcast V scalar.
    "t_bigram_lm" -> ((s, d) => bigramLmScores(s, d).orderBy("doc_id")),

    // LM-SCORE-STRATIFIED SAMPLING — the "perplexity bucketing" step of
    // a curation pipeline: score every doc with the corpus bigram LM,
    // cut the score distribution into quartiles (distributed exact
    // quantiles — no value map, no global sort), then keep a fixed
    // per-bucket budget chosen by a deterministic hash priority through
    // the bounded-heap TopKPerKey operator. The exchange after scoring
    // carries ≤ k rows per bucket per partition — sampling cost is
    // output-bounded even when one bucket holds half the corpus.
    "t_lm_bucket_sample" -> ((s, d) => {
      val scored = bigramLmScores(s, d).localCheckpoint()
      val edges = Quantiles.exactQuantilesRounded6(
        scored, "avg_logp", Seq(0.25, 0.5, 0.75))
      val bucket = edges.map(e =>
        when(col("avg_logp") > e, 1).otherwise(0)).reduce(_ + _)
      val u = (col("doc_id") * lit(2654435761L)) % lit(2147483648L) /
        lit(2147483648.0)
      val prio = scored.withColumn("bucket", bucket.cast("long"))
        .withColumn("priority", round(u, 9))
      graft.plans.TopK.topKPerKey(prio, Seq("bucket"), "priority",
          "doc_id", k = 30)
        .select(col("bucket"), col("doc_id"), col("avg_logp"),
          col("priority"))
        .orderBy("bucket", "doc_id")
    }),

    // BPE-ish regex tokenization (robust to punctuation/whitespace runs)
    "t_tokens_bpe" -> ((s, d) =>
      Tables.documents(s, d)
        .select(col("doc_id"),
          size(tokensWs(col("text"))).cast("long").as("n_tokens_ws"),
          size(array_distinct(tokensWs(col("text")))).cast("long")
            .as("n_unique_ws"))
        .orderBy("doc_id")),

    // winnowing-style rolling-hash fingerprint (native RollingMinHash
    // expression; shift-stable local fingerprint). Rows-only: the
    // Karp-Rabin constants are engine-internal; TextSpec pins semantics.
    "t_fingerprint_roll" -> ((s, d) => {
      import org.apache.spark.sql.graft.ColumnBridge.{column, expression}
      Tables.documents(s, d)
        .select(col("doc_id"),
          column(graft.functions.RollingMinHash(expression(col("text")), 16))
            .as("fp_roll16"))
        .orderBy("doc_id")
    }),

    // document fingerprinting: whole-doc, prefix, and min-word-hash
    // (md5-based so the oracle can reproduce it bit-for-bit)
    "t_fingerprint" -> ((s, d) =>
      Tables.documents(s, d)
        .select(col("doc_id"),
          md5(col("text")).as("fp_doc"),
          md5(substring(col("text"), 1, 64)).as("fp_prefix"),
          array_min(transform(tokens(col("text")), w => md5(w)))
            .as("fp_minword"))
        .orderBy("doc_id")))

  private val stopList = stopwords.map(s => s"'$s'").mkString("[", ",", "]")

  /** The BPE trainer's DuckDB oracle: the 20-round merge loop UNROLLED
    * as 20 chained CTE blocks — a genuinely independent second
    * implementation, not a golden snapshot. Per round: pair counts over
    * the word dict (weighted by word freq), argmax by (freq desc, left,
    * right), then GREEDY LEFT-TO-RIGHT NON-OVERLAPPING replacement via
    * gaps-and-islands — consecutive match positions form a run, and
    * greedy keeps exactly the even offsets within each maximal run
    * (a chosen pair consumes its right symbol, blocking the next
    * position). State CTEs are MATERIALIZED: DuckDB inlines CTEs per
    * reference, and words_k feeds two consumers per round — uninlined
    * the scan tree fans out 2^20.
    * Matches bpeTrain (Sennrich merge loop) symbol for symbol. */
  private def bpeTrainOracle: String =
    s"$bpeTrainCtes\n${(1 to 20).map(k =>
      s"""SELECT CAST($k AS BIGINT) AS step, l AS "left", r AS "right",
         |  l || r AS merged, f AS freq FROM best_$k""".stripMargin)
      .mkString("\nUNION ALL\n")}\nORDER BY step"

  private def bpeTrainCtes: String = {
    def step(k: Int): String = {
      val p = s"words_${k - 1}"
      s"""pc_$k AS (
         |  SELECT l, r, CAST(sum(n) AS BIGINT) AS f FROM (
         |    SELECT syms[i] AS l, syms[i+1] AS r, n
         |    FROM (SELECT w, n, syms, unnest(range(1, len(syms))) AS i
         |          FROM $p))
         |  GROUP BY l, r),
         |best_$k AS MATERIALIZED (
         |  SELECT l, r, f FROM pc_$k ORDER BY f DESC, l, r LIMIT 1),
         |m_$k AS (
         |  SELECT w, n, pos, syms[pos] AS sym, b.l AS ml, b.r AS mr,
         |    (pos < len(syms) AND syms[pos] = b.l AND syms[pos+1] = b.r)
         |      AS mt
         |  FROM (SELECT w, n, syms, unnest(range(1, len(syms) + 1)) AS pos
         |        FROM $p)
         |  CROSS JOIN best_$k b),
         |r_$k AS (
         |  SELECT *, (mt AND
         |      (pos - min(pos) OVER (PARTITION BY w, mt, grp)) % 2 = 0)
         |      AS ch
         |  FROM (SELECT *,
         |      pos - ROW_NUMBER() OVER (PARTITION BY w, mt ORDER BY pos)
         |        AS grp
         |    FROM m_$k)),
         |words_$k AS MATERIALIZED (
         |  SELECT w, n,
         |    list(CASE WHEN ch THEN ml || mr ELSE sym END ORDER BY pos)
         |      AS syms
         |  FROM (SELECT *,
         |      COALESCE(lag(ch) OVER (PARTITION BY w ORDER BY pos), FALSE)
         |        AS cons
         |    FROM r_$k)
         |  WHERE NOT cons GROUP BY w, n)""".stripMargin
    }
    val head =
      """WITH words_0 AS MATERIALIZED (
        |  SELECT w, n, list_append(string_split(w, ''), '</w>') AS syms
        |  FROM (
        |    SELECT w, count(*) AS n FROM (
        |      SELECT unnest(string_split(text, ' ')) AS w FROM documents)
        |    GROUP BY w ORDER BY n DESC, w LIMIT 4096))""".stripMargin
    val steps = (1 to 20).map(step).mkString(",\n")
    s"$head,\n$steps"
  }

  /** The BPE APPLY oracle: the trainer CTEs above (the rule table must
    * come from the same SQL reimplementation, not a snapshot) + the
    * subword-nmt application loop unrolled 8 steps over the DISTINCT
    * vocabulary. Apply semantics differ from training: each round
    * rewrites the LOWEST-RANK pair PRESENT IN THAT WORD (per-word
    * argmin over the rule table, not a global argmax), greedy
    * left-to-right, until no rule applies — so applied ranks need not
    * be monotone (a later rule can create an earlier rule's pair). The
    * unroll depth bounds per-word iterations; each iteration removes
    * ≥1 symbol, so depth 8 covers every word up to 8 chars — the
    * fixture vocabulary's max (guarded: longer words would surface as
    * a row mismatch, not silent truncation, since unfinished words
    * still carry reducible pairs). Words already irreducible fall
    * through each round via the anti-join branch. */
  private def bpeApplyOracle: String = {
    def step(k: Int): String = {
      val p = s"a_${k - 1}"
      s"""ch_$k AS MATERIALIZED (
         |  SELECT w, min(rk) AS rk FROM (
         |    SELECT s.w, ru.rk FROM (
         |      SELECT w, syms[i] AS l, syms[i+1] AS r
         |      FROM (SELECT w, syms, unnest(range(1, len(syms))) AS i
         |            FROM $p)) s
         |    JOIN rules ru ON ru.l = s.l AND ru.r = s.r)
         |  GROUP BY w),
         |ap_$k AS (
         |  SELECT px.w, px.pos, px.syms[px.pos] AS sym,
         |    ru.l AS ml, ru.r AS mr,
         |    (px.pos < px.nsym AND px.syms[px.pos] = ru.l AND
         |     px.syms[px.pos + 1] = ru.r) AS mt
         |  FROM (SELECT w, syms, len(syms) AS nsym,
         |          unnest(range(1, len(syms) + 1)) AS pos FROM $p) px
         |  JOIN ch_$k c ON c.w = px.w
         |  JOIN rules ru ON ru.rk = c.rk),
         |g_$k AS (
         |  SELECT *, (mt AND
         |      (pos - min(pos) OVER (PARTITION BY w, mt, grp)) % 2 = 0)
         |      AS chn
         |  FROM (SELECT *,
         |      pos - ROW_NUMBER() OVER (PARTITION BY w, mt ORDER BY pos)
         |        AS grp
         |    FROM ap_$k)),
         |a_$k AS MATERIALIZED (
         |  SELECT w,
         |    list(CASE WHEN chn THEN ml || mr ELSE sym END ORDER BY pos)
         |      AS syms
         |  FROM (SELECT *,
         |      COALESCE(lag(chn) OVER (PARTITION BY w ORDER BY pos), FALSE)
         |        AS cons
         |    FROM g_$k)
         |  WHERE NOT cons GROUP BY w
         |  UNION ALL
         |  SELECT w, syms FROM $p
         |  WHERE w NOT IN (SELECT w FROM ch_$k))""".stripMargin
    }
    val rules = "rules AS MATERIALIZED (" + (1 to 20).map(k =>
      s"SELECT ${k - 1} AS rk, l, r FROM best_$k").mkString("\nUNION ALL\n") +
      ")"
    val a0 =
      """a_0 AS MATERIALIZED (
        |  SELECT w, list_append(string_split(w, ''), '</w>') AS syms
        |  FROM (
        |    SELECT DISTINCT unnest(string_split(text, ' ')) AS w
        |    FROM documents))""".stripMargin
    val steps = (1 to 8).map(step).mkString(",\n")
    s"""$bpeTrainCtes,
       |$rules,
       |$a0,
       |$steps,
       |sub AS MATERIALIZED (SELECT w, len(syms) AS n_sub FROM a_8)
       |SELECT doc_id, CAST(count(*) AS BIGINT) AS n_words,
       |  CAST(sum(n_sub) AS BIGINT) AS n_subwords,
       |  round(CAST(sum(n_sub) AS DOUBLE) / count(*), 6) AS fertility
       |FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS w
       |      FROM documents) dw
       |JOIN sub USING (w)
       |GROUP BY doc_id ORDER BY doc_id""".stripMargin
  }

  def oracles: Map[String, String] = Map(
    "t_bpe_train" -> bpeTrainOracle,
    "t_bpe_apply" -> bpeApplyOracle,
    // the deterministic half of the compression signal: UTF-8 byte
    // lengths hash-compared; the zlib-dependent ratios stay engine-
    // side, pinned by the two bound claims (sanity + discrimination)
    "t_compress_ratio" ->
      """SELECT doc_id, lang,
        |  CAST(octet_length(CAST(text AS BLOB)) AS BIGINT) AS n_bytes,
        |  TRUE AS ratio_sane, TRUE AS compress_discriminates
        |FROM documents ORDER BY doc_id""".stripMargin,
    "t_bm25" ->
      s"""WITH tk AS (SELECT doc_id, string_split(text, ' ') AS ts
         |  FROM documents),
         |dls AS (SELECT doc_id, CAST(len(ts) AS BIGINT) AS dl FROM tk),
         |st AS (SELECT CAST(count(*) AS BIGINT) AS n_docs,
         |    CAST(sum(dl) AS BIGINT) AS sum_dl FROM dls),
         |t AS (SELECT doc_id, unnest(ts) AS term FROM tk),
         |tf AS (SELECT doc_id, term, CAST(count(*) AS BIGINT) AS tf
         |  FROM t WHERE term IN ('spark', 'query', 'fast')
         |  GROUP BY doc_id, term),
         |df AS (SELECT term, CAST(count(DISTINCT doc_id) AS BIGINT) AS df
         |  FROM tf GROUP BY term),
         |j AS (SELECT tf.doc_id, tf.tf, df.df, dls.dl,
         |    st.n_docs, CAST(st.sum_dl AS DOUBLE) / st.n_docs AS avgdl
         |  FROM tf JOIN df ON tf.term = df.term
         |  JOIN dls ON tf.doc_id = dls.doc_id CROSS JOIN st),
         |c AS (SELECT doc_id,
         |    round(ln((n_docs - df + 0.5) / (df + 0.5) + 1) * tf * 2.2 /
         |      (tf + 1.2 * (0.25 + 0.75 * dl / avgdl)), 9) AS contrib
         |  FROM j)
         |SELECT doc_id, CAST(count(*) AS BIGINT) AS n_terms,
         |  round(${Sql.oSum("contrib", 9)}, 6) AS bm25
         |FROM c GROUP BY doc_id ORDER BY doc_id""".stripMargin,
    "t_inverted_index" ->
      """WITH t AS (SELECT doc_id, unnest(string_split(text, ' ')) AS term
        |  FROM documents),
        |s AS (SELECT term, CAST(count(DISTINCT doc_id) AS BIGINT) AS df,
        |    CAST(count(*) AS BIGINT) AS cf
        |  FROM t GROUP BY term),
        |p AS (SELECT term,
        |    array_to_string(list(doc_id ORDER BY doc_id), ',')
        |      AS postings_csv
        |  FROM (SELECT DISTINCT term, doc_id FROM t) GROUP BY term)
        |SELECT s.term, df, cf, postings_csv
        |FROM s JOIN p ON s.term = p.term ORDER BY s.term""".stripMargin,
    "t_gopher_rules" ->
      """WITH t AS (SELECT doc_id, unnest(string_split(text, ' ')) AS tok
        |  FROM documents),
        |c AS (SELECT doc_id, tok, count(*) AS cnt FROM t GROUP BY 1, 2),
        |d AS (SELECT doc_id,
        |    CAST(sum(cnt) AS BIGINT) AS n_words,
        |    CAST(sum(cnt * len(tok)) AS BIGINT) AS sum_len,
        |    CAST(max(cnt) AS BIGINT) AS max_freq,
        |    count(CASE WHEN tok IN ('the','a','of','to','and') THEN 1 END)
        |      AS n_stop,
        |    CAST(sum(CASE WHEN regexp_matches(tok, '[a-zA-Z]') THEN cnt
        |      ELSE 0 END) AS BIGINT) AS n_alpha
        |  FROM c GROUP BY doc_id)
        |SELECT doc_id, n_words,
        |  n_words >= 20 AND n_words <= 100000 AS ok_word_count,
        |  sum_len >= n_words * 3 AND sum_len <= n_words * 10
        |    AS ok_mean_word_len,
        |  n_stop >= 2 AS ok_stopwords,
        |  n_alpha * 5 >= n_words * 4 AS ok_alpha_words,
        |  max_freq * 5 <= n_words AS ok_repetition,
        |  (n_words >= 20 AND n_words <= 100000
        |   AND sum_len >= n_words * 3 AND sum_len <= n_words * 10
        |   AND n_stop >= 2 AND n_alpha * 5 >= n_words * 4
        |   AND max_freq * 5 <= n_words) AS keep
        |FROM d ORDER BY doc_id""".stripMargin,
    "t_dsir_weights" ->
      """WITH t AS (SELECT doc_id, lang,
        |    unnest(string_split(text, ' ')) AS tok FROM documents),
        |h AS (SELECT doc_id, lang,
        |    CAST(CAST('0x' || substr(md5(tok), 1, 4) AS INTEGER) % 1024
        |      AS BIGINT) AS bucket FROM t),
        |tot AS (SELECT count(CASE WHEN lang = 'en' THEN 1 END) AS tt,
        |    count(*) AS tn FROM h),
        |bc AS (SELECT bucket,
        |    count(CASE WHEN lang = 'en' THEN 1 END) AS ct,
        |    count(*) AS cr FROM h GROUP BY 1),
        |m AS (SELECT bucket,
        |    round(log10(CAST(ct + 1 AS DOUBLE) / (tt + 1024))
        |      - log10(CAST(cr + 1 AS DOUBLE) / (tn + 1024)), 9) AS llr
        |  FROM bc CROSS JOIN tot)
        |SELECT doc_id, count(*) AS n_tokens,
        |  round(CAST(SUM(CAST(llr AS DECIMAL(18,9))) AS DOUBLE), 6)
        |    AS log_weight
        |FROM h JOIN m USING (bucket) GROUP BY doc_id
        |ORDER BY doc_id""".stripMargin,
    "t_zipf_fit" ->
      """WITH f AS (SELECT word, count(*) AS freq
        |  FROM (SELECT unnest(string_split(text, ' ')) AS word
        |        FROM documents) GROUP BY word),
        |r AS (SELECT freq, ROW_NUMBER() OVER (ORDER BY freq DESC, word)
        |    AS rank FROM f),
        |xy AS (SELECT round(log10(CAST(rank AS DOUBLE)), 9) AS x,
        |    round(log10(CAST(freq AS DOUBLE)), 9) AS y FROM r),
        |m AS (SELECT count(*) AS n,
        |  CAST(sum(CAST(x AS DECIMAL(18,9))) AS DOUBLE) AS sx,
        |  CAST(sum(CAST(y AS DECIMAL(18,9))) AS DOUBLE) AS sy,
        |  CAST(sum(CAST(x * x AS DECIMAL(38,18))) AS DOUBLE) AS sxx,
        |  CAST(sum(CAST(x * y AS DECIMAL(38,18))) AS DOUBLE) AS sxy
        |  FROM xy),
        |s AS (SELECT *, (n * sxy - sx * sy) / (n * sxx - sx * sx)
        |    AS slope_raw FROM m)
        |SELECT n AS n_words, round(slope_raw, 6) AS zipf_slope,
        |  round((sy - slope_raw * sx) / n, 6) AS intercept
        |FROM s""".stripMargin,
    "t_shingle_explode" ->
      """WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks
        |  FROM documents WHERE doc_id < 50),
        |s AS (SELECT doc_id, unnest(range(0, len(toks) - 2)) AS pos, toks
        |  FROM t WHERE len(toks) >= 3)
        |SELECT doc_id, CAST(pos AS INT) AS pos,
        |  array_to_string(toks[pos + 1 : pos + 3], ' ') AS shingle
        |FROM s ORDER BY doc_id, pos""".stripMargin,
    "t_curate_e2e" ->
      """WITH t AS (SELECT doc_id, lang, n_chars, text,
        |    CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tok
        |  FROM documents),
        |f AS (SELECT * FROM t WHERE n_tok >= 20),
        |dd AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY md5(text)
        |    ORDER BY doc_id) AS rn FROM f),
        |k AS (SELECT *,
        |    CASE WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 2) < 'e6'
        |           THEN 'train'
        |         WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 2) < 'f2'
        |           THEN 'val'
        |         ELSE 'test' END AS split
        |  FROM dd WHERE rn = 1)
        |SELECT split, lang, count(*) AS n_docs,
        |  CAST(sum(n_tok) AS BIGINT) AS sum_tokens,
        |  CAST(sum(n_chars) AS BIGINT) AS sum_chars
        |FROM k GROUP BY 1, 2 ORDER BY split, lang""".stripMargin,
    "t_epoch_shuffle" ->
      """WITH k AS (SELECT doc_id,
        |  md5('2:' || CAST(doc_id AS VARCHAR)) AS shuffle_key
        |  FROM documents)
        |SELECT doc_id, shuffle_key,
        |  CAST(ROW_NUMBER() OVER (ORDER BY shuffle_key) AS BIGINT) AS pos
        |FROM k ORDER BY pos""".stripMargin,
    // adjacent pairs via a positional self-join on unnested tokens
    // (DuckDB's lateral-free subscript idiom)
    "t_bpe_pairs" ->
      """WITH toks AS (SELECT doc_id,
        |  unnest(string_split(text, ' ')) AS w,
        |  generate_subscripts(string_split(text, ' '), 1) AS i
        |FROM documents)
        |SELECT a.w || ' ' || b.w AS pair, count(*) AS n
        |FROM toks a JOIN toks b ON a.doc_id = b.doc_id AND b.i = a.i + 1
        |GROUP BY 1 ORDER BY n DESC, pair LIMIT 20""".stripMargin,
    // first-wins span removal: per-gram min-doc ownership, 8-wide
    // coverage union, anti-join reassembly with ordered string_agg
    "t_strip_dup_spans" ->
      """WITH toks AS (SELECT doc_id, string_split(text, ' ') AS l
        |  FROM documents),
        |sh AS (SELECT doc_id, CAST(i - 1 AS INT) AS pos,
        |    array_to_string(l[i:i+7], ' ') AS sh
        |  FROM toks, unnest(range(1, len(l) - 6)) AS t(i)
        |  WHERE len(l) >= 8),
        |own AS (SELECT sh, MIN(doc_id) AS own FROM sh GROUP BY sh),
        |rem AS (SELECT DISTINCT s.doc_id, s.pos + o.off AS widx
        |  FROM (SELECT s2.doc_id, s2.pos FROM sh s2
        |      JOIN own USING (sh) WHERE own.own < s2.doc_id) s,
        |    unnest(range(0, 8)) AS o(off)),
        |tok2 AS (SELECT doc_id,
        |    generate_subscripts(l, 1) - 1 AS widx, unnest(l) AS w
        |  FROM toks),
        |keep AS (SELECT t.doc_id,
        |    COUNT(*) AS n_kept,
        |    string_agg(t.w, ' ' ORDER BY t.widx) AS cleaned_text
        |  FROM tok2 t LEFT JOIN rem r
        |    ON t.doc_id = r.doc_id AND t.widx = r.widx
        |  WHERE r.widx IS NULL GROUP BY t.doc_id)
        |SELECT d.doc_id,
        |  CAST(len(string_split(d.text, ' '))
        |    - COALESCE(k.n_kept, 0) AS BIGINT) AS n_removed_words,
        |  COALESCE(k.cleaned_text, '') AS cleaned_text
        |FROM documents d LEFT JOIN keep k ON d.doc_id = k.doc_id
        |ORDER BY d.doc_id""".stripMargin,
    // positional 8-gram spans: same lateral-unnest shape as
    // dedup_span_8gram plus the gaps-and-islands interval merge
    "dedup_dup_spans" ->
      """WITH toks AS (SELECT doc_id, string_split(text, ' ') AS l
        |  FROM documents),
        |sh AS (SELECT doc_id, CAST(i - 1 AS INT) AS pos,
        |    array_to_string(l[i:i+7], ' ') AS sh
        |  FROM toks, unnest(range(1, len(l) - 6)) AS t(i)
        |  WHERE len(l) >= 8),
        |dup AS (SELECT sh FROM sh GROUP BY sh
        |  HAVING count(DISTINCT doc_id) > 1),
        |pos AS (SELECT doc_id, pos FROM sh JOIN dup USING (sh)),
        |isl AS (SELECT doc_id, pos,
        |    CASE WHEN pos <= LAG(pos) OVER
        |        (PARTITION BY doc_id ORDER BY pos) + 8
        |      THEN 0 ELSE 1 END AS brk
        |  FROM pos),
        |isl2 AS (SELECT doc_id, pos,
        |    SUM(brk) OVER (PARTITION BY doc_id ORDER BY pos
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS island
        |  FROM isl),
        |spans AS (SELECT doc_id, island, MIN(pos) AS s, MAX(pos) AS e
        |  FROM isl2 GROUP BY doc_id, island),
        |per AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_dup_spans,
        |    CAST(SUM(e - s + 8) AS BIGINT) AS dup_words
        |  FROM spans GROUP BY doc_id)
        |SELECT d.doc_id,
        |  CAST(COALESCE(p.n_dup_spans, 0) AS BIGINT) AS n_dup_spans,
        |  CAST(COALESCE(p.dup_words, 0) AS BIGINT) AS dup_words,
        |  round(COALESCE(CAST(p.dup_words AS DOUBLE), 0.0)
        |    / len(string_split(d.text, ' ')), 6) AS dup_frac
        |FROM documents d LEFT JOIN per p ON d.doc_id = p.doc_id
        |ORDER BY d.doc_id""".stripMargin,
    "dedup_span_8gram" ->
      """WITH toks AS (SELECT doc_id, string_split(text, ' ') AS l
        |  FROM documents),
        |sh AS (SELECT DISTINCT doc_id, array_to_string(l[i:i+7], ' ') AS sh
        |  FROM toks, unnest(range(1, len(l) - 6)) AS t(i)
        |  WHERE len(l) >= 8),
        |dup AS (SELECT sh FROM sh GROUP BY sh HAVING count(*) > 1),
        |cnt AS (SELECT doc_id, count(*) AS n_dup_spans
        |  FROM sh JOIN dup USING (sh) GROUP BY doc_id)
        |SELECT d.doc_id,
        |  CAST(COALESCE(cnt.n_dup_spans, 0) AS BIGINT) AS n_dup_spans
        |FROM documents d LEFT JOIN cnt ON d.doc_id = cnt.doc_id
        |ORDER BY d.doc_id""".stripMargin,
    "t_filter_pipeline" ->
      s"""WITH t AS (SELECT string_split(text, ' ') AS l FROM documents),
        |f AS (SELECT len(l) AS n_tok,
        |  len(list_filter(l, x -> list_contains($stopList, x))) AS stops,
        |  CASE WHEN len(l) >= 2 THEN
        |    list_transform(range(1, len(l)), i -> array_to_string(l[i:i+1], ' '))
        |  ELSE [] END AS g2 FROM t),
        |g AS (SELECT n_tok >= 20 AS f1,
        |  n_tok >= 20 AND stops * 10 >= n_tok AS f2,
        |  n_tok >= 20 AND stops * 10 >= n_tok
        |    AND len(list_distinct(g2)) * 5 >= len(g2) * 4 AS f3 FROM f),
        |a AS (SELECT count(*) AS n0,
        |  CAST(sum(CASE WHEN f1 THEN 1 ELSE 0 END) AS BIGINT) AS n1,
        |  CAST(sum(CASE WHEN f2 THEN 1 ELSE 0 END) AS BIGINT) AS n2,
        |  CAST(sum(CASE WHEN f3 THEN 1 ELSE 0 END) AS BIGINT) AS n3 FROM g)
        |SELECT '0_all' AS stage, n0 AS n_docs FROM a
        |UNION ALL SELECT '1_minlen', n1 FROM a
        |UNION ALL SELECT '2_stopword', n2 FROM a
        |UNION ALL SELECT '3_repetition', n3 FROM a
        |ORDER BY stage""".stripMargin,
    // parallel unnests zip (pos, tok); same md5 keep key and threshold
    "t_token_dropout" ->
      """WITH t AS (SELECT doc_id, string_split(text, ' ') AS l
        |  FROM documents),
        |x AS (SELECT doc_id, unnest(range(0, len(l))) AS pos,
        |    unnest(l) AS tok
        |  FROM t),
        |k AS (SELECT doc_id, pos, tok,
        |    CAST('0x' || substr(md5(doc_id || ':' || pos || ':' || tok),
        |      1, 4) AS INTEGER) >= 6554 AS keep
        |  FROM x)
        |SELECT doc_id, count(*) AS n_tokens,
        |  CAST(sum(CASE WHEN keep THEN 0 ELSE 1 END) AS BIGINT)
        |    AS n_dropped,
        |  md5(COALESCE(string_agg(CASE WHEN keep THEN tok END, ' '
        |    ORDER BY pos), '')) AS kept_md5
        |FROM k GROUP BY doc_id ORDER BY doc_id""".stripMargin,
    // identical feature arithmetic and logit term order; z rounded(9)
    // before the sigmoid on both sides
    "t_quality_classifier" ->
      s"""WITH f AS (SELECT doc_id,
         |    CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
         |    CAST(len(list_filter(string_split(text, ' '),
         |      x -> list_contains($stopList, x))) AS BIGINT) AS stops,
         |    CAST(length(text) AS BIGINT) AS n_ch
         |  FROM documents),
         |g AS (SELECT doc_id, n_tokens,
         |    CAST(stops AS DOUBLE) / n_tokens AS stop_ratio,
         |    CAST(n_ch - (n_tokens - 1) AS DOUBLE) / n_tokens AS awl
         |  FROM f),
         |z AS (SELECT doc_id, n_tokens, stop_ratio,
         |    round(-0.35 + 4.0 * stop_ratio +
         |      0.01 * CAST(least(n_tokens, 200) AS DOUBLE) -
         |      0.1 * awl, 9) AS z
         |  FROM g)
         |SELECT doc_id, n_tokens, round(stop_ratio, 6) AS stop_ratio,
         |  round(1.0 / (1.0 + exp(-z)), 6) AS score,
         |  1.0 / (1.0 + exp(-z)) >= 0.5 AS keep
         |FROM z ORDER BY doc_id""".stripMargin,
    // same md5-derived pivots and 1-based substr spans
    "t_fim_split" ->
      """WITH b AS (SELECT doc_id, text,
        |    CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR) || ':a'), 1, 4)
        |      AS INTEGER) % length(text) AS p1,
        |    CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR) || ':b'), 1, 4)
        |      AS INTEGER) % length(text) AS p2
        |  FROM documents),
        |c AS (SELECT doc_id, text,
        |    CAST(least(p1, p2) AS BIGINT) AS lo,
        |    CAST(greatest(p1, p2) AS BIGINT) AS hi
        |  FROM b),
        |s AS (SELECT doc_id, lo, hi,
        |    substr(text, 1, CAST(lo AS INTEGER)) AS prefix,
        |    substr(text, CAST(lo + 1 AS INTEGER),
        |      CAST(hi - lo AS INTEGER)) AS middle,
        |    substr(text, CAST(hi + 1 AS INTEGER)) AS suffix, text
        |  FROM c)
        |SELECT doc_id, lo, hi, md5(prefix) AS prefix_md5,
        |  md5(middle) AS middle_md5, md5(suffix) AS suffix_md5,
        |  md5(prefix || middle || suffix) = md5(text) AS reassembles
        |FROM s ORDER BY doc_id""".stripMargin,
    // same md5-derived bucket/sign arithmetic; vec re-serialized with
    // the same "bucket:value" text contract
    "t_feature_hash" ->
      """WITH t AS (SELECT doc_id, unnest(string_split(text, ' ')) AS tok
        |  FROM documents),
        |h AS (SELECT doc_id,
        |    CAST(CAST('0x' || substr(md5(tok), 1, 4) AS INTEGER) % 64
        |      AS BIGINT) AS bucket,
        |    CASE WHEN CAST('0x' || substr(md5(tok), 5, 1) AS INTEGER) % 2
        |      = 0 THEN 1 ELSE -1 END AS sign
        |  FROM t),
        |c AS (SELECT doc_id, bucket, count(*) AS cnt,
        |    CAST(sum(sign) AS BIGINT) AS v
        |  FROM h GROUP BY 1, 2)
        |SELECT doc_id, CAST(sum(cnt) AS BIGINT) AS n_tokens,
        |  count(*) AS nnz,
        |  string_agg(bucket || ':' || v, ' ' ORDER BY bucket) AS vec
        |FROM c GROUP BY doc_id ORDER BY doc_id""".stripMargin,
    "t_split_assign" ->
      """WITH s AS (SELECT lang, n_chars,
        |  CASE WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 2) < 'e6'
        |         THEN 'train'
        |       WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 2) < 'f2'
        |         THEN 'val'
        |       ELSE 'test' END AS split
        |  FROM documents)
        |SELECT split, lang, count(*) AS n_docs,
        |  CAST(sum(n_chars) AS BIGINT) AS sum_chars
        |FROM s GROUP BY 1, 2 ORDER BY split, lang""".stripMargin,
    "t_chunk_overlap" ->
      """WITH s AS (SELECT doc_id, string_split(text, ' ') AS toks
        |  FROM documents),
        |c AS (SELECT doc_id, toks, len(toks) AS n,
        |    unnest(range(0, len(toks), 12)) AS start
        |  FROM s)
        |SELECT doc_id, CAST(start // 12 AS BIGINT) AS chunk_idx,
        |  CAST(start AS BIGINT) AS start_tok,
        |  CAST(least(16, n - start) AS BIGINT) AS len_tok,
        |  md5(array_to_string(
        |    toks[start + 1 : start + least(16, n - start)], ' ')) AS chunk_md5
        |FROM c ORDER BY doc_id, chunk_idx""".stripMargin,
    "t_weighted_sample" ->
      """WITH p AS (SELECT lang, doc_id, n_chars,
        |    round(pow((doc_id * 2654435761) % 2147483648 / 2147483648.0,
        |      1.0 / n_chars), 9) AS priority
        |  FROM documents),
        |r AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY lang
        |    ORDER BY priority DESC, doc_id ASC) AS rk FROM p)
        |SELECT lang, doc_id, n_chars, priority
        |FROM r WHERE rk <= 5 ORDER BY lang, doc_id""".stripMargin,
    "t_oov_rate" ->
      """WITH tk AS (SELECT lang, unnest(string_split(text, ' ')) AS tok
        |  FROM documents),
        |v AS (SELECT tok FROM (SELECT tok, count(*) AS n FROM tk GROUP BY tok
        |  ORDER BY n DESC, tok LIMIT 20)),
        |m AS (SELECT lang, tk.tok, v.tok IS NOT NULL AS in_vocab
        |  FROM tk LEFT JOIN v ON tk.tok = v.tok)
        |SELECT lang, count(*) AS n_tokens,
        |  CAST(sum(CASE WHEN in_vocab THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_covered,
        |  round(1.0 - CAST(sum(CASE WHEN in_vocab THEN 1 ELSE 0 END)
        |    AS DOUBLE) / count(*), 6) AS oov_rate
        |FROM m GROUP BY lang ORDER BY lang""".stripMargin,
    "t_psi_drift" ->
      """WITH s AS (SELECT least(9, n_chars // 32) AS bin,
        |  CASE WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 2) < 'e6'
        |       THEN 'a' ELSE 'b' END AS split
        |  FROM documents),
        |c AS (SELECT bin,
        |  CAST(sum(CASE WHEN split = 'a' THEN 1 ELSE 0 END) AS BIGINT) AS na,
        |  CAST(sum(CASE WHEN split = 'b' THEN 1 ELSE 0 END) AS BIGINT) AS nb
        |  FROM s GROUP BY bin),
        |t AS (SELECT CAST(sum(na) AS BIGINT) AS ta,
        |             CAST(sum(nb) AS BIGINT) AS tb FROM c)
        |SELECT bin, na, nb,
        |  round(CAST(na AS DOUBLE) / ta, 6) AS pa,
        |  round(CAST(nb AS DOUBLE) / tb, 6) AS pb,
        |  round(CASE WHEN na > 0 AND nb > 0 THEN
        |    (CAST(na AS DOUBLE) / ta - CAST(nb AS DOUBLE) / tb)
        |      * ln(CAST(na AS DOUBLE) / ta / (CAST(nb AS DOUBLE) / tb))
        |    END, 6) AS psi_term
        |FROM c, t ORDER BY bin""".stripMargin,
    "t_cooccur" ->
      """WITH tk AS (SELECT doc_id,
        |    unnest(list_distinct(string_split(text, ' '))) AS tok
        |  FROM documents)
        |SELECT a.tok AS tok_a, b.tok AS tok_b, count(*) AS n_docs
        |FROM tk a JOIN tk b ON b.doc_id = a.doc_id AND b.tok > a.tok
        |GROUP BY 1, 2 HAVING count(*) >= 3
        |ORDER BY n_docs DESC, tok_a, tok_b LIMIT 100""".stripMargin,
    "t_assoc_rules" ->
      """WITH tk AS (SELECT doc_id,
        |    unnest(list_distinct(string_split(text, ' '))) AS tok
        |  FROM documents),
        |p AS (SELECT a.tok AS tok_a, b.tok AS tok_b, count(*) AS n_ab
        |  FROM tk a JOIN tk b ON b.doc_id = a.doc_id AND b.tok > a.tok
        |  GROUP BY 1, 2 HAVING count(*) >= 50),
        |it AS (SELECT tok, count(*) AS n_tok FROM tk GROUP BY tok),
        |n AS (SELECT count(*) AS n_docs FROM documents)
        |SELECT tok_a, tok_b, n_ab,
        |  round(n_ab / n_docs, 6) AS support,
        |  round(n_ab / ia.n_tok, 6) AS confidence,
        |  round(CAST(n_ab AS DOUBLE) * n_docs / (ia.n_tok * ib.n_tok), 6)
        |    AS lift
        |FROM p
        |JOIN it ia ON ia.tok = p.tok_a
        |JOIN it ib ON ib.tok = p.tok_b
        |CROSS JOIN n
        |ORDER BY tok_a, tok_b""".stripMargin,
    "t_mix_weights" ->
      """WITH l AS (SELECT lang, count(*) AS n_docs FROM documents GROUP BY lang),
        |t AS (SELECT SUM(n_docs) AS n_total,
        |  SUM(CAST(round(sqrt(n_docs), 9) AS DECIMAL(28,9))) AS z FROM l)
        |SELECT lang, n_docs,
        |  round(n_docs / n_total, 6) AS raw_share,
        |  round(sqrt(n_docs) / z, 6) AS temp_share
        |FROM l, t ORDER BY lang""".stripMargin,
    "t_tokens" ->
      """SELECT doc_id, CAST(len(string_split(text,' ')) AS BIGINT) AS n_tokens,
        |  CAST(length(text) AS BIGINT) AS len_chars, n_chars
        |FROM documents ORDER BY doc_id""".stripMargin,
    "t_quality" ->
      s"""WITH t AS (SELECT doc_id,
         |  CAST(len(string_split(text,' ')) AS BIGINT) AS n_tokens,
         |  CAST(len(list_filter(string_split(text,' '),
         |    x -> list_contains($stopList, x))) AS BIGINT) AS n_stopwords,
         |  CAST(length(text) AS BIGINT) AS n_ch
         |FROM documents)
         |SELECT doc_id, n_tokens, n_stopwords,
         |  CAST(n_stopwords AS DOUBLE) / n_tokens AS stopword_ratio,
         |  CAST(n_ch - (n_tokens - 1) AS DOUBLE) / n_tokens AS avg_word_len
         |FROM t ORDER BY doc_id""".stripMargin,
    "t_langid" ->
      s"""WITH t AS (SELECT doc_id, lang,
         |  CAST(len(list_filter(string_split(text,' '),
         |    x -> list_contains($stopList, x))) AS BIGINT) AS en_hits,
         |  CAST(len(string_split(text,' ')) AS BIGINT) AS n_tokens
         |FROM documents)
         |SELECT doc_id, lang, en_hits,
         |  CASE WHEN en_hits * 20 >= n_tokens THEN 'en'
         |       WHEN en_hits > 0 THEN 'en_low' ELSE 'unk' END AS lang_guess
         |FROM t ORDER BY doc_id""".stripMargin,
    "t_langid_eval" ->
      s"""WITH t AS (SELECT lang,
         |  CAST(len(list_filter(string_split(text,' '),
         |    x -> list_contains($stopList, x))) AS BIGINT) AS en_hits,
         |  CAST(len(string_split(text,' ')) AS BIGINT) AS n_tokens
         |FROM documents)
         |SELECT lang,
         |  CASE WHEN en_hits * 20 >= n_tokens THEN 'en'
         |       WHEN en_hits > 0 THEN 'en_low' ELSE 'unk' END AS lang_guess,
         |  count(*) AS n
         |FROM t GROUP BY 1, 2 ORDER BY lang, lang_guess""".stripMargin,
    "t_redact_pii" ->
      """SELECT doc_id,
        |  regexp_replace(
        |    regexp_replace(
        |      text || ' contact: ' || source || '@example.com id 1234567890',
        |      '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+', '<EMAIL>', 'g'),
        |    '\d{6,}', '<NUM>', 'g') AS redacted
        |FROM documents WHERE doc_id < 100 ORDER BY doc_id""".stripMargin,
    "t_stratified_cap" ->
      """WITH r AS (SELECT doc_id, lang,
        |  ROW_NUMBER() OVER (PARTITION BY lang ORDER BY doc_id) AS rn
        |FROM documents)
        |SELECT doc_id, lang, CAST(rn AS BIGINT) AS rn
        |FROM r WHERE rn <= 20 ORDER BY lang, rn""".stripMargin,
    "t_pack_sequences" ->
      """WITH t AS (SELECT doc_id,
        |  CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tok
        |FROM documents)
        |SELECT doc_id, n_tok,
        |  CAST(floor(COALESCE(SUM(n_tok) OVER (ORDER BY doc_id
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
        |    / 2048) AS BIGINT) AS pack_id
        |FROM t ORDER BY doc_id""".stripMargin,
    // the rendered template recomputed by concatenating the SAME
    // deterministic turns in order (the fold is left-to-right string
    // concatenation, so plain || chains reproduce it exactly)
    "t_chat_template" ->
      """WITH t AS (SELECT doc_id AS k, lang,
        |  '<|user|>u_' || (doc_id % 50) || '<|end|>' ||
        |  '<|' || CASE WHEN doc_id % 4 = 0 THEN 'tool'
        |               ELSE 'assistant' END || '|>' ||
        |  'a_' || (doc_id % 31) || '<|end|>' ||
        |  CASE WHEN doc_id % 3 = 0
        |       THEN '<|user|>u2_' || (doc_id % 13) || '<|end|>'
        |       ELSE '' END AS text,
        |  CAST(CASE WHEN doc_id % 3 = 0 THEN 3 ELSE 2 END AS BIGINT)
        |    AS n_turns
        |  FROM documents)
        |SELECT k, lang, text, n_turns,
        |  CAST(length(text) AS BIGINT) AS n_chars
        |FROM t ORDER BY k""".stripMargin,
    "t_bigram_lm" ->
      """WITH t AS (SELECT doc_id, string_split(text, ' ') AS ts
        |  FROM documents WHERE len(string_split(text, ' ')) >= 2),
        |bi AS (SELECT doc_id, unnest(list_transform(range(1, len(ts)),
        |    i -> {'w1': ts[i], 'bg': ts[i] || ' ' || ts[i+1]})) AS z FROM t),
        |b2 AS (SELECT doc_id, (z).w1 AS w1, (z).bg AS bg FROM bi),
        |cb AS (SELECT bg, count(*) AS cb FROM b2 GROUP BY bg),
        |c1 AS (SELECT w1, count(*) AS c1 FROM b2 GROUP BY w1),
        |v AS (SELECT count(DISTINCT w) AS v
        |  FROM (SELECT unnest(ts) AS w FROM t)),
        |sc AS (SELECT doc_id,
        |  round(log10(CAST(cb + 1 AS DOUBLE) / (c1 + v)), 9) AS lp
        |  FROM b2 JOIN cb USING (bg) JOIN c1 USING (w1) CROSS JOIN v)
        |SELECT doc_id, count(*) AS n_bigrams,
        |  round(CAST(SUM(CAST(lp AS DECIMAL(18,9))) AS DOUBLE) / COUNT(*), 6)
        |    AS avg_logp
        |FROM sc GROUP BY doc_id ORDER BY doc_id""".stripMargin,
    "t_lm_bucket_sample" ->
      """WITH t AS (SELECT doc_id, string_split(text, ' ') AS ts
        |  FROM documents WHERE len(string_split(text, ' ')) >= 2),
        |bi AS (SELECT doc_id, unnest(list_transform(range(1, len(ts)),
        |    i -> {'w1': ts[i], 'bg': ts[i] || ' ' || ts[i+1]})) AS z FROM t),
        |b2 AS (SELECT doc_id, (z).w1 AS w1, (z).bg AS bg FROM bi),
        |cb AS (SELECT bg, count(*) AS cb FROM b2 GROUP BY bg),
        |c1 AS (SELECT w1, count(*) AS c1 FROM b2 GROUP BY w1),
        |v AS (SELECT count(DISTINCT w) AS v
        |  FROM (SELECT unnest(ts) AS w FROM t)),
        |sc AS (SELECT doc_id,
        |  round(log10(CAST(cb + 1 AS DOUBLE) / (c1 + v)), 9) AS lp
        |  FROM b2 JOIN cb USING (bg) JOIN c1 USING (w1) CROSS JOIN v),
        |lm AS (SELECT doc_id,
        |  round(CAST(SUM(CAST(lp AS DECIMAL(18,9))) AS DOUBLE) / COUNT(*), 6)
        |    AS avg_logp
        |  FROM sc GROUP BY doc_id),
        |e AS (SELECT round(quantile_cont(avg_logp, 0.25), 6) AS q1,
        |    round(quantile_cont(avg_logp, 0.50), 6) AS q2,
        |    round(quantile_cont(avg_logp, 0.75), 6) AS q3 FROM lm),
        |b AS (SELECT doc_id, avg_logp,
        |    CAST((CASE WHEN avg_logp > q1 THEN 1 ELSE 0 END)
        |       + (CASE WHEN avg_logp > q2 THEN 1 ELSE 0 END)
        |       + (CASE WHEN avg_logp > q3 THEN 1 ELSE 0 END) AS BIGINT)
        |      AS bucket,
        |    round((doc_id * 2654435761) % 2147483648 / 2147483648.0, 9)
        |      AS priority
        |  FROM lm, e),
        |r AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY bucket
        |    ORDER BY priority DESC, doc_id ASC) AS rk FROM b)
        |SELECT bucket, doc_id, avg_logp, priority
        |FROM r WHERE rk <= 30 ORDER BY bucket, doc_id""".stripMargin,
    "t_tfidf_top" ->
      """WITH w AS (SELECT doc_id, unnest(string_split(text, ' ')) AS word
        |  FROM documents),
        |tf AS (SELECT doc_id, word, count(*) AS tf FROM w GROUP BY 1, 2),
        |df AS (SELECT word, count(*) AS df FROM tf GROUP BY word),
        |n AS (SELECT count(*) AS n FROM documents),
        |sc AS (SELECT doc_id, tf.word AS word,
        |  round(tf * ln(CAST(n AS DOUBLE) / df), 6) AS score
        |  FROM tf JOIN df ON tf.word = df.word CROSS JOIN n),
        |r AS (SELECT doc_id, word, score, ROW_NUMBER() OVER
        |  (PARTITION BY doc_id ORDER BY score DESC, word) AS rk FROM sc)
        |SELECT doc_id, word AS top_word, score FROM r WHERE rk = 1
        |ORDER BY doc_id""".stripMargin,
    "t_repetition" ->
      """WITH g AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
        |r AS (SELECT doc_id, CASE WHEN len(t) >= 2 THEN
        |    list_transform(range(1, len(t)), i -> array_to_string(t[i:i+1], ' '))
        |  ELSE [] END AS grams FROM g)
        |SELECT doc_id, CAST(len(grams) AS BIGINT) AS n_2grams,
        |  CAST(len(list_distinct(grams)) AS BIGINT) AS n_distinct_2grams,
        |  CASE WHEN len(grams) > 0 THEN
        |    1.0 - CAST(len(list_distinct(grams)) AS DOUBLE) / len(grams)
        |  ELSE 0.0 END AS dup_ratio
        |FROM r ORDER BY doc_id""".stripMargin,
    "t_contamination" ->
      """WITH g AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
        |sh AS (SELECT doc_id, unnest(list_distinct(CASE WHEN len(t) >= 8 THEN
        |    list_transform(range(1, len(t) - 6),
        |      i -> array_to_string(t[i:i+7], ' '))
        |  ELSE [] END)) AS s FROM g),
        |bench AS (SELECT DISTINCT s FROM sh WHERE doc_id < 5),
        |cnt AS (SELECT sh.doc_id, count(*) AS n FROM sh
        |  JOIN bench USING (s) WHERE sh.doc_id >= 5 GROUP BY sh.doc_id)
        |SELECT d.doc_id, COALESCE(cnt.n, 0) AS n_shared_8grams
        |FROM documents d LEFT JOIN cnt ON d.doc_id = cnt.doc_id
        |WHERE d.doc_id >= 5 ORDER BY d.doc_id""".stripMargin,
    "t_tokens_bpe" ->
      """SELECT doc_id,
        |  CAST(len(list_filter(string_split_regex(text, '\W+'),
        |    x -> len(x) > 0)) AS BIGINT) AS n_tokens_ws,
        |  CAST(len(list_distinct(list_filter(string_split_regex(text, '\W+'),
        |    x -> len(x) > 0))) AS BIGINT) AS n_unique_ws
        |FROM documents ORDER BY doc_id""".stripMargin,
    "t_fingerprint" ->
      """SELECT doc_id, md5(text) AS fp_doc,
        |  md5(substr(text, 1, 64)) AS fp_prefix,
        |  list_min(list_transform(string_split(text,' '), w -> md5(w)))
        |    AS fp_minword
        |FROM documents ORDER BY doc_id""".stripMargin,
    // RollingMinHash reproduced exactly: min over every 16-char window of
    // the polynomial hash sum(char * 257^j) mod 2^61-1. Each term
    // multiplies a code point by the PRE-REDUCED power (257^j mod p, a
    // compile-time constant) in HUGEINT — per-term products stay < 2^68
    // and the 16-term sum < 2^65, so nothing overflows 128-bit before
    // the final mod. Window positions come from a constant 1..4096
    // series joined on i <= len-15 (DuckDB's generate_series takes no
    // correlated bound; documents max length is 553 at the oracle SF,
    // and the fixture text is pure ASCII so DuckDB code points ==
    // JVM UTF-16 code units). LEFT JOIN + CASE keeps sub-16-char docs
    // at the kernel's -1 sentinel.
    "t_fingerprint_roll" ->
      """SELECT d.doc_id,
        |  CASE WHEN length(d.text) < 16 THEN CAST(-1 AS BIGINT)
        |    ELSE CAST(MIN((
        |      ord(substr(d.text, g.i + 0, 1)) * HUGEINT '2239439901988634850' % 2305843009213693951
        |      + ord(substr(d.text, g.i + 1, 1)) * HUGEINT '1426313756255845444' % 2305843009213693951
        |      + ord(substr(d.text, g.i + 2, 1)) * HUGEINT '1925590341354032494' % 2305843009213693951
        |      + ord(substr(d.text, g.i + 3, 1)) * HUGEINT '1990338114309651345' % 2305843009213693951
        |      + ord(substr(d.text, g.i + 4, 1)) * HUGEINT '851126774242789427' % 2305843009213693951
        |      + ord(substr(d.text, g.i + 5, 1)) * HUGEINT '1788769982909602668' % 2305843009213693951
        |      + ord(substr(d.text, g.i + 6, 1)) * HUGEINT '312013355238035786' % 2305843009213693951
        |      + ord(substr(d.text, g.i + 7, 1)) * HUGEINT '584403925891549193' % 2305843009213693951
        |      + ord(substr(d.text, g.i + 8, 1)) * HUGEINT '74051159531521793' % 2305843009213693951
        |      + ord(substr(d.text, g.i + 9, 1)) * HUGEINT '288136807515649' % 2305843009213693951
        |      + ord(substr(d.text, g.i + 10, 1)) * HUGEINT '1121154893057' % 2305843009213693951
        |      + ord(substr(d.text, g.i + 11, 1)) * HUGEINT '4362470401' % 2305843009213693951
        |      + ord(substr(d.text, g.i + 12, 1)) * HUGEINT '16974593' % 2305843009213693951
        |      + ord(substr(d.text, g.i + 13, 1)) * HUGEINT '66049' % 2305843009213693951
        |      + ord(substr(d.text, g.i + 14, 1)) * HUGEINT '257' % 2305843009213693951
        |      + ord(substr(d.text, g.i + 15, 1)) * HUGEINT '1' % 2305843009213693951
        |      ) % 2305843009213693951) AS BIGINT) END AS fp_roll16
        |FROM documents d
        |LEFT JOIN generate_series(1, 4096) g(i)
        |  ON g.i <= length(d.text) - 15
        |GROUP BY d.doc_id, length(d.text)
        |ORDER BY d.doc_id""".stripMargin)
}
