package graft.queries

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

import graft.functions.{TextFunctions => T}

/** §2.5 — text analysis over `documents`.
  *
  * All scoring stays in exact integer arithmetic until a final
  * division, so Spark and DuckDB agree bit-for-bit.
  */
object TextQueries {

  private val markers: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "a"),
    "es" -> Seq("el", "la", "los"),
    "de" -> Seq("der", "und", "die"),
    "fr" -> Seq("le", "les", "et"))

  private def markerCount(toks: Column, words: Seq[String]): Column =
    size(filter(toks, t => t.isin(words.map(x => x: Any): _*))).cast("long")

  /** t2's per-doc quality signals (unrounded score; source retained)
    * — shared by t2 and the t28 signal-agreement report.
    */
  private def qualityScores(
      s: org.apache.spark.sql.SparkSession, dir: String): org.apache.spark.sql.DataFrame =
    table(s, dir, "documents")
      .withColumn("toks", T.tokens(col("text")))
      .withColumn("n_tok", size(col("toks")).cast("long"))
      .withColumn("stop_cnt", markerCount(col("toks"), Seq("the", "a")))
      .withColumn("sum_len", graft.functions.toklenSum(col("toks")))
      .withColumn("stop_ratio", col("stop_cnt").cast("double") / col("n_tok"))
      .withColumn("avg_len", col("sum_len").cast("double") / col("n_tok"))
      .withColumn("score",
        least(col("n_tok"), lit(100)).cast("double") / 100.0 * 0.5 +
          col("stop_ratio") * 0.3 +
          when(col("avg_len") >= 3.0 && col("avg_len") <= 8.0, 0.2).otherwise(0.0))

  /** t13's per-doc unigram-LM mean log-prob — shared by t13 and t28. */
  private def lmScores(
      s: org.apache.spark.sql.SparkSession, dir: String): org.apache.spark.sql.DataFrame = {
    val toksAll = table(s, dir, "documents")
      .select(col("doc_id"), explode(T.tokens(col("text"))).as("token"))
    val cc = toksAll.groupBy("token").agg(count(lit(1)).as("c"))
    val tot = toksAll.agg(count(lit(1)).as("tot"))
    toksAll.join(cc, "token")
      .crossJoin(broadcast(tot))
      .groupBy("doc_id")
      .agg(
        count(lit(1)).as("n_tok"),
        sum(log(col("c").cast("double") / col("tot"))).as("lp"))
      .select(
        col("doc_id"), col("n_tok"),
        round(col("lp") / col("n_tok"), 4).as("avg_logprob"))
  }

  val queries: Map[String, Q] = Map(
    // stopword-profile language ID with a fixed priority order
    "t1_langid" -> ((s, dir) => {
      table(s, dir, "documents")
        .withColumn("toks", T.tokens(col("text")))
        .select(col("doc_id") +: markers.map { case (l, ws) =>
          markerCount(col("toks"), ws).as(s"c_$l")
        }: _*)
        .withColumn("pred_lang",
          when(col("c_en") >= greatest(col("c_es"), col("c_de"), col("c_fr")), "en")
            .when(col("c_es") >= greatest(col("c_de"), col("c_fr")), "es")
            .when(col("c_de") >= col("c_fr"), "de")
            .otherwise("fr"))
        .orderBy("doc_id")
    }),

    // classifier evaluation over the labeled corpus: t1's language
    // heuristic scored against the ground-truth lang column as a
    // confusion matrix with per-cell share of the actual class — the
    // quality-control report a pipeline runs before trusting a filter
    // model at 100 TB. One aggregate over the prediction pass; the
    // per-class totals come from a window over the (≤16-row)
    // confusion relation, not a second corpus scan.
    "t23_langid_eval" -> ((s, dir) => {
      val preds = table(s, dir, "documents")
        .withColumn("toks", T.tokens(col("text")))
        .select(col("lang") +: markers.map { case (l, ws) =>
          markerCount(col("toks"), ws).as(s"c_$l")
        }: _*)
        .withColumn("pred_lang",
          when(col("c_en") >= greatest(col("c_es"), col("c_de"), col("c_fr")), "en")
            .when(col("c_es") >= greatest(col("c_de"), col("c_fr")), "es")
            .when(col("c_de") >= col("c_fr"), "de")
            .otherwise("fr"))
      val wCls = org.apache.spark.sql.expressions.Window.partitionBy("lang")
      preds.groupBy("lang", "pred_lang").agg(count(lit(1)).as("n"))
        .withColumn("class_share",
          round(col("n").cast("double") / sum("n").over(wCls), 4))
        .orderBy("lang", "pred_lang")
    }),

    // doc quality: token count, stopword ratio, mean token length
    "t2_quality" -> ((s, dir) =>
      qualityScores(s, dir)
        .select(
          col("doc_id"), col("n_tok"),
          round(col("stop_ratio"), 4).as("stop_ratio"),
          round(col("avg_len"), 4).as("avg_len"),
          round(col("score"), 4).as("score"))
        .orderBy("doc_id")),

    // per-source token accounting: whitespace tokens + 4-char subword units
    "t3_token_stats" -> ((s, dir) => {
      table(s, dir, "documents")
        .withColumn("toks", T.tokens(col("text")))
        .withColumn("n_ws", size(col("toks")).cast("long"))
        .withColumn("n_sub",
          aggregate(transform(col("toks"), t => (length(t) + 3).cast("long") / 4),
            lit(0L), (acc, x) => acc + x.cast("long")))
        .groupBy("source")
        .agg(
          count(lit(1)).as("n_docs"),
          sum("n_ws").as("n_ws_tokens"),
          sum("n_sub").as("n_sub_tokens"),
          round(sum("n_ws").cast("double") / count(lit(1)), 3).as("avg_tokens"))
        .orderBy("source")
    }),

    // deterministic hash-split: stable train/eval assignment by id —
    // reproducible across runs, engines, and cluster sizes (no RNG)
    "t5_train_split" -> ((s, dir) => {
      val bucket = conv(substring(md5(col("doc_id").cast("string")), 1, 7), 16, 10)
        .cast("long") % 100
      table(s, dir, "documents")
        .withColumn("bucket", bucket)
        .withColumn("split",
          when(col("bucket") < 80, "train")
            .when(col("bucket") < 90, "dev")
            .otherwise("test"))
        .groupBy("split", "lang")
        .agg(count(lit(1)).as("n_docs"), sum("n_chars").as("n_chars"))
        .orderBy("split", "lang")
    }),

    // corpus frequency analysis: top-10 tokens per language. The
    // (lang, token) count relation is vocabulary-sized at 100 TB and
    // lang has a handful of values, so a plain per-lang window would
    // sort each lang's whole vocab in ONE task — cappedRowNumber
    // ranks per (partition, lang) first and only the ≤ P·10
    // survivors per lang reach the global rank.
    "t6_top_tokens" -> ((s, dir) => {
      val counts = table(s, dir, "documents")
        .select(col("lang"), explode(T.tokens(col("text"))).as("token"))
        .groupBy("lang", "token")
        .agg(count(lit(1)).as("n"))
      graft.operators.ScalableWindow
        .cappedRowNumber(counts, Seq("lang"),
          Seq(col("n").desc, col("token")), k = 10, rnCol = "rn")
        .select("lang", "rn", "token", "n")
        .orderBy("lang", "rn")
    }),

    // Zipf-fit corpus diagnostic: regress ln(count) on ln(rank) over
    // the top-1000 tokens — the tokenizer-planning QC that says
    // whether a corpus has a natural long-tail shape (slope ≈ -1)
    // or is degenerate (templated/synthetic text). Scale plan: the
    // top cut is orderBy+limit (TakeOrderedAndProject — map-side
    // 1000-row heaps, the a6 pattern), ranking happens on the
    // ≤1000-row survivor relation, and the regression sums are EXACT
    // decimal(18,9) sums of quantized ln values — order-independent,
    // so the result is partitioning-invariant and replayable by the
    // oracle. Sums are rounded to scale 6 before the double cast
    // (scaled integers < 2^53 → the conversion is exact in both
    // engines); the closed-form slope/r² then run in IEEE doubles on
    // bit-identical inputs.
    "t24_zipf_report" -> ((s, dir) => {
      val counts = table(s, dir, "documents")
        .select(explode(T.tokens(col("text"))).as("token"))
        .groupBy("token").agg(count(lit(1)).as("n"))
      val totals = counts.agg(
        count(lit(1)).as("vocab_size"), sum(col("n")).as("total_tokens"))
      val top = counts.orderBy(col("n").desc, col("token")).limit(1000)
      val ranked = top.withColumn("rk",
        row_number().over(org.apache.spark.sql.expressions.Window
          .orderBy(col("n").desc, col("token"))).cast("long"))
      val q = ranked.select(
        round(log(col("rk").cast("double")), 9).cast("decimal(18,9)").as("x"),
        round(log(col("n").cast("double")), 9).cast("decimal(18,9)").as("y"))
      val sums = q.agg(
        count(lit(1)).as("m"),
        round(sum(col("x")), 6).cast("double").as("sx"),
        round(sum(col("y")), 6).cast("double").as("sy"),
        round(sum(col("x") * col("y")), 6).cast("double").as("sxy"),
        round(sum(col("x") * col("x")), 6).cast("double").as("sxx"),
        round(sum(col("y") * col("y")), 6).cast("double").as("syy"))
      val md = col("m").cast("double")
      val cov = md * col("sxy") - col("sx") * col("sy")
      val varx = md * col("sxx") - col("sx") * col("sx")
      val vary = md * col("syy") - col("sy") * col("sy")
      sums.crossJoin(totals) // one-row aggregate join, never data-sized
        .select(
          round(cov / varx, 6).as("zipf_slope"),
          round((cov * cov) / (varx * vary), 6).as("r2"),
          col("m").as("n_top"), col("vocab_size"), col("total_tokens"))
    }),

    // tokenizer vocab coverage: per language, how much of the token
    // stream the top-16 vocabulary covers — the OOV-rate QC run
    // before freezing a tokenizer. The vocab cut reuses
    // ScalableWindow.cappedRowNumber (per-lang top-k without a
    // one-task-per-lang vocab sort), the ≤ langs·16-row vocab
    // broadcasts back onto the count relation, and coverage is a
    // ratio of exact longs — one final deterministic division.
    "t25_vocab_coverage" -> ((s, dir) => {
      val counts = table(s, dir, "documents")
        .select(col("lang"), explode(T.tokens(col("text"))).as("token"))
        .groupBy("lang", "token")
        .agg(count(lit(1)).as("n"))
      val vocab = graft.operators.ScalableWindow
        .cappedRowNumber(counts, Seq("lang"),
          Seq(col("n").desc, col("token")), k = 16, rnCol = "rk")
        .select(col("lang"), col("token"), lit(1L).as("in_vocab"))
      counts.join(broadcast(vocab), Seq("lang", "token"), "left")
        .groupBy("lang")
        .agg(
          sum(col("n")).as("total_tokens"),
          sum(when(col("in_vocab").isNotNull, col("n")).otherwise(0L))
            .as("covered_tokens"),
          count(lit(1)).as("vocab_size"))
        .withColumn("oov_rate",
          round(lit(1.0) - col("covered_tokens").cast("double") /
            col("total_tokens").cast("double"), 6))
        .select("lang", "total_tokens", "covered_tokens", "vocab_size", "oov_rate")
        .orderBy("lang")
    }),

    // deterministic mixture sampling: per-source keep-rate by hash
    // bucket (even sources 30%, odd 70%) — reproducible re-weighting
    "t7_mixture_sample" -> ((s, dir) => {
      val bucket = conv(substring(md5(col("doc_id").cast("string")), 1, 7), 16, 10)
        .cast("long") % 100
      val srcNum = regexp_extract(col("source"), "([0-9]+)$", 1).cast("long")
      val weight = when(srcNum % 2 === 0, 30L).otherwise(70L)
      table(s, dir, "documents")
        .withColumn("kept", (bucket < weight).cast("long"))
        .groupBy("source")
        .agg(
          count(lit(1)).as("n_total"),
          sum("kept").as("n_kept"))
        .orderBy("source")
    }),

    // temperature-flattened mixture resampling — the data-mixing knob
    // between natural (α=1) and uniform (α=0) source shares
    // (multilingual-LM standard: target p_s ∝ n_s^α). With the
    // smallest source kept whole, the per-source keep probability is
    // q_s = (n_min/n_s)^(1-α); at α = 1/2 the deterministic md5 gate
    // bucket/10^6 < sqrt(n_min/n_s) is evaluated SQUARED —
    // bucket²/10^12 < n_min/n_s — two IEEE divisions of exact
    // integers, no transcendental, so Spark and DuckDB keep
    // identical docs. Stateless map-side gate over one broadcast
    // count relation: per-doc fate is replayable and batch≡stream
    // (t7/st27's posture), and nothing corpus-sized shuffles.
    "t30_temperature_mix" -> ((s, dir) => {
      val docs = table(s, dir, "documents")
      val counts = docs.groupBy("source").agg(count(lit(1)).as("n_src"))
      val nMin = counts.agg(min("n_src").as("n_min"))
      val bucket = conv(substring(md5(col("doc_id").cast("string")), 1, 7), 16, 10)
        .cast("long") % 1000000L
      docs.join(broadcast(counts), "source")
        .crossJoin(broadcast(nMin))
        .withColumn("kept",
          ((bucket * bucket).cast("double") / lit(1e12) <
            col("n_min").cast("double") / col("n_src").cast("double")).cast("long"))
        .groupBy("source")
        .agg(count(lit(1)).as("n_total"), sum("kept").as("n_kept"))
        .orderBy("source")
    }),

    // C4-style cross-document repeated-sentence removal: a sentence
    // whose fingerprint occurs in MORE THAN ONE document is
    // boilerplate (nav chrome, license banners, templated intros) and
    // drops from every document; per-doc report of sentences seen /
    // kept / surviving chars. Text leaves the scan once: the shuffle
    // carries (doc_id, md5-fp, sentence length) only — duplicate
    // detection is one fp-grain groupBy with map-side partials, the
    // verdict joins back on fp. At 100 TB both wide ops key on
    // sentence fingerprints (high cardinality, no skew); document
    // text never shuffles.
    "t33_line_dedup" -> ((s, dir) => {
      val sents = table(s, dir, "documents")
        .select(col("doc_id"), explode(split(col("text"), "\\. ")).as("raw"))
        .withColumn("sent", trim(col("raw")))
        .where(length(col("sent")) > 0)
        .select(col("doc_id"), md5(col("sent")).as("fp"),
          length(col("sent")).cast("long").as("slen"))
      val dupFps = sents.groupBy("fp")
        .agg(count_distinct(col("doc_id")).as("n_docs"))
        .where(col("n_docs") > 1)
        .select(col("fp"), lit(true).as("dup"))
      sents.join(dupFps, Seq("fp"), "left")
        .groupBy("doc_id")
        .agg(count(lit(1)).as("n_sents"),
          sum(when(col("dup").isNull, 1L).otherwise(0L)).as("n_kept"),
          sum(when(col("dup").isNull, col("slen")).otherwise(0L)).as("kept_chars"))
        .orderBy("doc_id")
    }),

    // PII scrubbing: regex redaction of emails + IPv4s. The corpus is
    // synthetic, so deterministic PII is injected from doc_id first —
    // the scrub machinery (count, redact, fingerprint) is then fully
    // oracle-checked end-to-end.
    "t8_pii_scrub" -> ((s, dir) => {
      val injected = concat(
        col("text"), lit(" contact user"), col("doc_id"),
        lit("@example.com or admin@test.org from 10."),
        pmod(col("doc_id"), lit(256)), lit(".0."),
        pmod(col("doc_id"), lit(100)), lit(" port 8080"))
      table(s, dir, "documents")
        .withColumn("p", graft.functions.TextFunctions.piiScrub(injected))
        .select(
          col("doc_id"),
          col("p.n_emails").as("n_emails"),
          col("p.n_ips").as("n_ips"),
          md5(col("p.scrubbed")).as("scrubbed_md5"))
        .orderBy("doc_id")
    }),

    // Gopher-style repetition quality filter: duplicate word-bigram
    // fraction + most-common-bigram share per document. One shuffle on
    // (doc_id, bigram) with map-side partial counts — never the text.
    "t9_repetition" -> ((s, dir) => {
      val bigrams = graft.functions.gramsWs(col("toks"), 2)
      table(s, dir, "documents")
        .withColumn("toks", T.tokens(col("text")))
        .where(size(col("toks")) >= 2)
        .select(col("doc_id"), explode(bigrams).as("g"))
        .groupBy("doc_id", "g")
        .agg(count(lit(1)).as("n"))
        .groupBy("doc_id")
        .agg(
          sum("n").as("n_bigrams"),
          count(lit(1)).as("n_distinct"),
          max("n").as("max_count"))
        .select(
          col("doc_id"), col("n_bigrams"), col("n_distinct"),
          round(lit(1.0) - col("n_distinct").cast("double") / col("n_bigrams"), 4)
            .as("dup_frac"),
          round(col("max_count").cast("double") / col("n_bigrams"), 4)
            .as("top_frac"),
          (lit(1.0) - col("n_distinct").cast("double") / col("n_bigrams") > 0.2)
            .as("flagged"))
        .orderBy("doc_id")
    }),

    // deterministic stratified sampling: equalize language mixture by
    // downsampling every language to the rarest one's count via hash
    // buckets — per-stratum rates from a broadcast-joined tiny agg,
    // no RNG, identical on any cluster size
    "t11_stratified_sample" -> ((s, dir) => {
      val docs = table(s, dir, "documents")
      val counts = docs.groupBy("lang").agg(count(lit(1)).as("n_lang"))
      val target = counts.agg(min("n_lang").as("target"))
      val bucket = conv(substring(md5(col("doc_id").cast("string")), 1, 7), 16, 10)
        .cast("long") % 1000000L
      docs
        .join(broadcast(counts), "lang")
        .crossJoin(broadcast(target))
        .withColumn("kept", (bucket * col("n_lang") < col("target") * 1000000L).cast("long"))
        .groupBy("lang")
        .agg(
          count(lit(1)).as("n_total"),
          sum("kept").as("n_kept"))
        .orderBy("lang")
    }),

    // weight-proportional subsampling via PRIORITY SAMPLING
    // (Duffield–Lund–Thorup, JACM 2007): each doc draws a
    // deterministic pseudo-uniform u from its id's md5 and gets
    // priority u/w (w = n_chars) — the n lowest-priority docs form a
    // weighted sample without replacement whose inclusion odds scale
    // with w (the quality-/length-weighted subsample a mixture
    // schedule draws). Plans as TakeOrderedAndProject: every
    // partition surrenders at most n rows map-side, nothing
    // corpus-sized moves. The priority division is a single IEEE
    // binary64 op on exact integers, so Spark and DuckDB order — and
    // hash — identically; rounding is display-only, after the cut.
    "t29_priority_sample" -> ((s, dir) => {
      val u = conv(substring(md5(col("doc_id").cast("string")), 1, 7), 16, 10)
        .cast("long")
      table(s, dir, "documents")
        .select(
          col("doc_id"), col("source"), col("n_chars"),
          (u.cast("double") / greatest(col("n_chars"), lit(1L)).cast("double"))
            .as("priority"))
        .orderBy(col("priority"), col("doc_id"))
        .limit(50)
        .withColumn("priority", round(col("priority"), 6))
        .orderBy("doc_id")
    }),

    // TF-IDF top terms per doc: term frequencies shuffle once on
    // (doc, token); document frequencies are a second small agg
    // broadcast back; top-3 via per-doc window on the scored pairs
    "t12_tfidf" -> ((s, dir) => {
      val docs = table(s, dir, "documents")
      val tf = docs
        .select(col("doc_id"), explode(T.tokens(col("text"))).as("token"))
        .groupBy("doc_id", "token")
        .agg(count(lit(1)).as("tf"))
      val dfreq = tf.groupBy("token").agg(count(lit(1)).as("df"))
      val nDocs = docs.agg(count(lit(1)).as("n_docs"))
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("doc_id").orderBy(col("score").desc, col("token"))
      tf.join(dfreq, "token")
        .crossJoin(broadcast(nDocs))
        .withColumn("score",
          col("tf") * log((col("n_docs") + 1).cast("double") / (col("df") + 1)))
        .withColumn("rn", row_number().over(w).cast("long"))
        .where(col("rn") <= 3)
        .select(col("doc_id"), col("rn"), col("token"), col("tf"), col("df"),
          round(col("score"), 4).as("score"))
        .orderBy("doc_id", "rn")
    }),

    // unigram LM scoring (the shape of perplexity-based quality
    // filtering): corpus token frequencies → per-doc mean log-prob.
    // Corpus stats are one agg broadcast back over the token stream.
    "t13_lm_score" -> ((s, dir) => lmScores(s, dir).orderBy("doc_id")),

    // CCNet-style perplexity bucketing: per language, rank docs by
    // the t13 unigram LM score (best = "head") and split head /
    // middle / tail thirds — the pre-training corpus partition that
    // trains on the head and discards or down-weights the tail.
    // Bucket boundaries use INTEGER arithmetic (rank0*3 div n_lang,
    // the front-loaded NTILE split) so both engines agree exactly.
    // The rank comes from ScalableWindow.prefixSum — range-partition
    // by (lang, score), local cumsum, broadcast per-partition offsets
    // — NOT a Window.partitionBy(lang): with a handful of languages a
    // plain window sorts the whole corpus in ~4 tasks at 100 TB,
    // while this shape's parallelism tracks data size
    "t34_perplexity_buckets" -> ((s, dir) => {
      val scored = lmScores(s, dir)
        .join(table(s, dir, "documents").select("doc_id", "lang"), "doc_id")
      val ranked = graft.operators.ScalableWindow.prefixSum(
        scored, Seq("lang"),
        Seq(col("avg_logprob").desc, col("doc_id")), lit(1L), "rank0")
      ranked
        .join(broadcast(scored.groupBy("lang").agg(count(lit(1)).as("n_lang"))), "lang")
        .withColumn("bucket",
          element_at(array(lit("head"), lit("middle"), lit("tail")),
            expr("cast(rank0 * 3 div n_lang as int)") + 1))
        .groupBy("lang", "bucket")
        .agg(count(lit(1)).as("n_docs"), sum("n_tok").as("n_tokens"),
          min("avg_logprob").as("min_lp"), max("avg_logprob").as("max_lp"))
        .orderBy("lang", "bucket")
    }),

    // quality-signal agreement: per-source Pearson correlation between
    // the t2 heuristic score and the t13 LM log-prob — the "do our
    // filter signals agree, and where do they diverge" QC run before
    // trusting either as a training-data gate. Both signals enter as
    // their 4-dp-rounded values cast to exact decimals, so the five
    // moment sums are order-independent; the closed-form r runs in
    // IEEE doubles on bit-identical inputs (the t24 posture, grouped)
    "t28_signal_corr" -> ((s, dir) => {
      val x = qualityScores(s, dir)
        .select(col("doc_id"), col("source"),
          round(col("score"), 4).cast("decimal(18,6)").as("x"))
      val y = lmScores(s, dir)
        .select(col("doc_id"),
          col("avg_logprob").cast("decimal(18,6)").as("y"))
      val sums = x.join(y, "doc_id")
        .groupBy("source")
        .agg(
          count(lit(1)).as("m"),
          round(sum(col("x")), 6).cast("double").as("sx"),
          round(sum(col("y")), 6).cast("double").as("sy"),
          round(sum(col("x") * col("y")), 6).cast("double").as("sxy"),
          round(sum(col("x") * col("x")), 6).cast("double").as("sxx"),
          round(sum(col("y") * col("y")), 6).cast("double").as("syy"))
      val md = col("m").cast("double")
      val cov = md * col("sxy") - col("sx") * col("sy")
      val varx = md * col("sxx") - col("sx") * col("sx")
      val vary = md * col("syy") - col("sy") * col("sy")
      sums.select(
          col("source"), col("m"),
          when(varx * vary <= 0.0, lit(null).cast("double"))
            .otherwise(round(cov / sqrt(varx * vary), 6)).as("pearson_r"))
        .orderBy("source")
    }),

    // bigram LM doc scoring — t13's conditional upgrade (the stronger
    // perplexity-filter shape): P(cur|prev) with add-one smoothing
    // over the corpus-fitted bigram table, (c2+1)/(c1+V). Bigrams are
    // derived narrowly from the token array (no window, no per-doc
    // shuffle); the count table attaches c1 to the vocab²-sized c2
    // relation FIRST, so the corpus-sized bigram stream shuffles
    // twice total (count join + doc re-agg), not three times; V is a
    // broadcast one-row total. All counts are exact longs; the only
    // fp is the final ln and its 4-dp-rounded mean (t13's posture).
    "t26_bigram_lm" -> ((s, dir) => {
      val toks = table(s, dir, "documents")
        .select(col("doc_id"), T.tokens(col("text")).as("t"))
      // materialized once (the d2 shingle pattern): the count table,
      // the smoothing denominator, and the probe side all read this
      // relation — without the checkpoint each consumer re-explodes
      // the corpus (4 scan+tokenize passes measured in the plan)
      val big = toks
        .select(col("doc_id"), explode(expr(
          "transform(sequence(2, size(t)), i -> struct(element_at(t, i - 1) AS prev, element_at(t, i) AS cur))"))
          .as("b"))
        .select(col("doc_id"), col("b.prev").as("prev"), col("b.cur").as("cur"))
        .localCheckpoint(eager = true) // eager: lock-inversion hardening (OPTIMIZATION_r18 deadlock note)
      val c2 = big.groupBy("prev", "cur").agg(count(lit(1)).as("c2"))
      // c1 folds from the vocab²-sized c2 relation, not a third
      // corpus-wide explode: sum over cur of c2(prev,·) ≡ count(prev)
      val c1 = c2.groupBy("prev").agg(sum(col("c2")).as("c1"))
      // V = the bigram model's own vocabulary (distinct prev ∪ cur),
      // folded from the vocab²-sized count table — no extra corpus pass
      val vocab = c2
        .select(explode(array(col("prev"), col("cur"))).as("token"))
        .agg(count_distinct(col("token")).as("v"))
      val counts = c2.join(c1, "prev").crossJoin(broadcast(vocab))
      big.join(counts, Seq("prev", "cur"))
        .groupBy("doc_id")
        .agg(
          count(lit(1)).as("n_big"),
          sum(log((col("c2") + lit(1.0)) / (col("c1") + col("v")))).as("lp"))
        .select(
          col("doc_id"), col("n_big"),
          round(col("lp") / col("n_big"), 4).as("avg_logprob"))
        .orderBy("doc_id")
    }),

    // skip-gram co-occurrence + PMI: the word2vec-style association
    // table (forward window ±2) — top-pairs-by-PMI is the
    // collocation/templating QC a corpus report runs (boilerplate
    // shows as impossibly-high-PMI pairs). Pair derivation is narrow
    // (two shifted transforms per doc, no window function); counts
    // are exact longs; PMI's doubles are the same IEEE expression
    // both engines; the top-40 cut is orderBy+limit
    // (TakeOrderedAndProject — map-side partial top-k, the a6 shape).
    "t27_pmi_cooc" -> ((s, dir) => {
      val toks = table(s, dir, "documents").select(T.tokens(col("text")).as("t"))
      def shifted(d: Int) = toks.where(size(col("t")) > d)
        .select(explode(expr(
          s"transform(sequence(1, size(t) - $d), i -> struct(element_at(t, i) AS w1, element_at(t, i + $d) AS w2))"))
          .as("p"))
        .select(col("p.w1").as("w1"), col("p.w2").as("w2"))
      val pairs = shifted(1).unionAll(shifted(2)).localCheckpoint(eager = true) // eager: lock-inversion hardening (OPTIMIZATION_r18 deadlock note)
      val uni = table(s, dir, "documents")
        .select(explode(T.tokens(col("text"))).as("w"))
        .groupBy("w").agg(count(lit(1)).as("c"))
        .localCheckpoint(eager = true) // eager: lock-inversion hardening (OPTIMIZATION_r18 deadlock note)
      val totals = broadcast(
        uni.agg(sum(col("c")).as("n_tok"))
          .crossJoin(pairs.agg(count(lit(1)).as("n_pair"))))
      pairs.groupBy("w1", "w2").agg(count(lit(1)).as("c12"))
        .where(col("c12") >= 30)
        .join(uni.toDF("w1", "c1"), Seq("w1"))
        .join(uni.toDF("w2", "c2"), Seq("w2"))
        .crossJoin(totals)
        .select(col("w1"), col("w2"), col("c12"),
          round(log(
            (col("c12") * lit(1.0) / col("n_pair")) /
              ((col("c1") * lit(1.0) / col("n_tok")) *
                (col("c2") * lit(1.0) / col("n_tok")))), 4).as("pmi"))
        .orderBy(col("pmi").desc, col("w1"), col("w2"))
        .limit(40)
    }),

    // training-window chunking: split each doc into 64-token windows
    // with stride 48 (16-token overlap) — the seq-len shaping step
    // before packing. Narrow explode per doc, no shuffle.
    "t14_chunking" -> ((s, dir) => {
      val win = 64
      val stride = 48
      // last start = (n - win + stride - 1) rounded down to the stride
      // grid, min 1 — pmod keeps everything integer-typed (int `/` is
      // double in Spark) and floor-consistent with DuckDB's `//`
      val x = size(col("toks")) - win + stride - 1
      val starts = sequence(
        lit(1),
        greatest(lit(1), x - pmod(x, lit(stride)) + 1),
        lit(stride))
      table(s, dir, "documents")
        .withColumn("toks", T.tokens(col("text")))
        .select(col("doc_id"), col("toks"), explode(starts).as("start"))
        .select(
          col("doc_id"),
          ((col("start") - 1) / stride).cast("long").as("chunk_idx"),
          slice(col("toks"), col("start"), lit(win)).as("chunk"))
        .select(
          col("doc_id"), col("chunk_idx"),
          size(col("chunk")).cast("long").as("n_tokens"),
          md5(concat_ws(" ", col("chunk"))).as("chunk_md5"))
        .orderBy("doc_id", "chunk_idx")
    }),

    // greedy sequence packing: cumulative token counts per source
    // (ordered by doc_id) div the per-bin budget → pack id.
    // Deterministic bin assignment on any cluster; the running total
    // is ScalableWindow.prefixSum — a plain per-source window would
    // accumulate each source's whole corpus slice in ONE task, the
    // q15 ceiling (source cardinality is tiny, the relation is not).
    "t15_pack_bins" -> ((s, dir) => {
      val budget = 2048L
      val toks = table(s, dir, "documents")
        .withColumn("n_tok", size(T.tokens(col("text"))).cast("long"))
        .select("source", "doc_id", "n_tok")
      graft.operators.ScalableWindow
        .prefixSum(toks, Seq("source"), Seq(col("doc_id")), col("n_tok"), "cum_before")
        .withColumn("bin", expr(s"cum_before div $budget"))
        .groupBy("source", "bin")
        .agg(
          count(lit(1)).as("n_docs"),
          sum("n_tok").as("n_tokens"),
          min("doc_id").as("first_doc"))
        .orderBy("source", "bin")
    }),

    // training-export sharding: deterministic md5 shard assignment
    // (cluster-size invariant), per-shard manifest with an id
    // checksum — the accounting side of ParquetLake.exportShards
    "t16_export_shards" -> ((s, dir) => {
      table(s, dir, "documents")
        .select(
          col("doc_id"),
          graft.functions.hashShard(col("doc_id"), 8).as("shard"),
          size(T.tokens(col("text"))).cast("long").as("n_toks"))
        .groupBy("shard")
        .agg(
          count(lit(1)).as("n_docs"),
          sum("n_toks").as("n_tokens"),
          min("doc_id").as("min_id"),
          max("doc_id").as("max_id"),
          md5(concat_ws(",",
            transform(sort_array(collect_list(col("doc_id"))), _.cast("string")))).as("ids_md5"))
        .orderBy("shard")
    }),

    // Gopher-style quality rule suite (Rae et al. 2021,
    // arXiv:2112.11446 — public): four deterministic document rules
    // in exact integer arithmetic (no fp thresholds): ≥ 40 tokens,
    // mean word length in [3,10] (as 3n ≤ Σlen ≤ 10n), ≥ 2
    // stopwords, and no single token above 20% of the doc
    // (5·max_cnt ≤ n). One narrow explode + two hash aggregates on
    // doc_id — no joins, nothing wide beyond the per-doc rollup.
    "t17_gopher_rules" -> ((s, dir) => {
      val tc = table(s, dir, "documents")
        .select(col("doc_id"), explode(T.tokens(col("text"))).as("t"))
        .groupBy("doc_id", "t").agg(count(lit(1)).as("cnt"))
      tc.groupBy("doc_id")
        .agg(
          sum("cnt").as("n_tok"),
          sum(col("cnt") * length(col("t"))).as("sum_len"),
          sum(when(col("t").isin("the", "a"), col("cnt")).otherwise(lit(0L))).as("n_stop"),
          max("cnt").as("max_cnt"))
        .select(
          col("doc_id"),
          col("n_tok"),
          when(col("n_tok") >= 40, 1L).otherwise(0L).as("r_len"),
          when(col("sum_len") >= col("n_tok") * 3 &&
            col("sum_len") <= col("n_tok") * 10, 1L).otherwise(0L).as("r_wlen"),
          when(col("n_stop") >= 2, 1L).otherwise(0L).as("r_stop"),
          when(col("max_cnt") * 5 <= col("n_tok"), 1L).otherwise(0L).as("r_rep"))
        .withColumn("pass", col("r_len") * col("r_wlen") * col("r_stop") * col("r_rep"))
        .orderBy("doc_id")
    }),

    // DSIR-style importance weighting (Xie et al. 2023,
    // arXiv:2302.03169 — public): hashed-unigram bag features; a
    // doc's weight is the mean log-likelihood ratio of its feature
    // buckets under the target distribution (here: the lang='en'
    // slice) vs the raw corpus, add-one smoothed. All counts are
    // exact integers from two hash aggregates; the only fp is the
    // per-bucket ln and its rounded mean (t13's contract). The λ
    // table is B=128 rows regardless of corpus size — it broadcasts,
    // so scoring is map-side; at 100 TB the whole operator is two
    // bounded aggregates plus one narrow pass.
    "t18_dsir_sample" -> ((s, dir) => {
      val B = 128
      val toks = table(s, dir, "documents")
        .select(col("doc_id"), col("lang"), explode(T.tokens(col("text"))).as("t"))
        .select(col("doc_id"), col("lang"),
          (conv(substring(md5(col("t")), 1, 7), 16, 10).cast("long") % B).as("b"))
      // raw and target bucket counts in ONE aggregate pass (count +
      // conditional sum) — not two separate groupBys that would each
      // re-derive the token relation. The scoring join below is the
      // only other consumer of toks; its re-derivation is deliberate:
      // tokenizing map-side twice beats materializing a token-grain
      // (corpus-sized) checkpoint at 100 TB.
      val dict = toks.groupBy("b").agg(
          count(lit(1)).as("r"),
          sum(when(col("lang") === "en", 1L).otherwise(0L)).as("tc"))
        .localCheckpoint(eager = true) // feeds totals and the λ table
      val totals = dict.agg(sum("r").as("rt"), sum("tc").as("tt"))
      val lam = dict.crossJoin(broadcast(totals))
        .select(col("b"),
          (log((col("tc") + 1).cast("double") / (col("tt") + B).cast("double")) -
            log((col("r") + 1).cast("double") / (col("rt") + B).cast("double"))).as("lam"))
      toks.join(broadcast(lam), Seq("b"))
        .groupBy("doc_id")
        .agg(count(lit(1)).as("n_tok"), sum("lam").as("s"))
        .select(col("doc_id"), col("n_tok"),
          // + 0.0 folds IEEE -0.0 to +0.0 (a doc whose λs cancel
          // exactly would otherwise hash-differ across engines)
          (round(col("s") / col("n_tok"), 4) + lit(0.0)).as("dsir_score"),
          when(round(col("s") / col("n_tok"), 4) > 0, 1L).otherwise(0L).as("keep"))
        .orderBy("doc_id")
    }),

    // deterministic training-order shuffle — operators/Shuffle.scala:
    // reproducible salted-md5 permutation, global rank via
    // prefix-bucket + per-bucket row_number + broadcast cumulative
    // offsets (never a single-partition window). The default 4-hex
    // bucket width bounds the per-task rank sort to ~corpus/65536;
    // the permutation is width-invariant (spec-pinned).
    "t19_global_shuffle" -> ((s, dir) => {
      graft.operators.Shuffle.globalPermutation(
          table(s, dir, "documents"), "doc_id", "epoch0")
        .orderBy("doc_id")
    }),

    // contamination-aware train split: t5's deterministic hash split
    // composed with d6's decontamination — corpus docs sharing any
    // word-3-gram shingle with the held-out benchmark slice land in
    // a "quarantine" split instead of train/dev/test. The bench
    // shingle set broadcasts (d6's shape); the split assignment stays
    // pure hash arithmetic; one aggregate over (split, lang).
    "t20_decon_split" -> ((s, dir) => {
      val isBench = col("doc_id") % 97 === 0
      // shingle ONCE into a checkpointed relation (d6's shape); the
      // bench and corpus sides partition it disjointly. The final
      // metadata join reads the column-pruned parquet scan directly —
      // no text there.
      val sh = table(s, dir, "documents")
        .repartition(s.sparkContext.defaultParallelism)
        .select(col("doc_id"), T.wordShingles(T.tokens(col("text"))).as("ss"))
        // eager: broadcast(benchShingles) embeds this relation in a
        // broadcast subtree — a lazy first materialization there races
        // the corpus side's stage submission into the checkpoint
        // lock-inversion deadlock (see d6 / Dedup.lshRecallEval)
        .localCheckpoint(eager = true)
      val benchShingles = sh.where(isBench)
        .select(explode(col("ss")).as("sng")).distinct()
      val contaminated = sh.where(!isBench)
        .select(col("doc_id"), explode(col("ss")).as("sng"))
        .join(broadcast(benchShingles), "sng")
        .select("doc_id").distinct()
        .withColumn("contam", lit(1))
      val bucket = conv(substring(md5(col("doc_id").cast("string")), 1, 7), 16, 10)
        .cast("long") % 100
      table(s, dir, "documents")
        .select(col("doc_id"), col("lang"), col("n_chars"))
        .where(!isBench)
        .join(contaminated, Seq("doc_id"), "left")
        .withColumn("split",
          when(col("contam").isNotNull, "quarantine")
            .when(bucket < 80, "train")
            .when(bucket < 90, "dev")
            .otherwise("test"))
        .groupBy("split", "lang")
        .agg(count(lit(1)).as("n_docs"), sum("n_chars").as("n_chars"))
        .orderBy("split", "lang")
    }),

    // per-source corpus report: the pipeline dashboard row — doc and
    // token accounting, duplicate share (bag-of-words fingerprints
    // appearing more than once corpus-wide), and mean quality score
    // (t2's formula), one aggregate per source. The dup-fingerprint
    // set is corpus-output-sized but only (fp) strings broadcast; all
    // ratios computed in exact integers until the final division.
    "t21_corpus_report" -> ((s, dir) => {
      val docs = table(s, dir, "documents")
        .withColumn("toks", T.tokens(col("text")))
        .withColumn("n_tok", size(col("toks")).cast("long"))
        .withColumn("stop_cnt", markerCount(col("toks"), Seq("the", "a")))
        .withColumn("sum_len", graft.functions.toklenSum(col("toks")))
        .withColumn("score",
          least(col("n_tok"), lit(100)).cast("double") / 100.0 * 0.5 +
            col("stop_cnt").cast("double") / col("n_tok") * 0.3 +
            when(col("sum_len").cast("double") / col("n_tok") >= 3.0 &&
              col("sum_len").cast("double") / col("n_tok") <= 8.0, 0.2).otherwise(0.0))
        .withColumn("fp", T.bowFingerprint(col("text")))
        .localCheckpoint(eager = true) // feeds the dup-fp set and the report agg
      val dupFps = docs.groupBy("fp").agg(count(lit(1)).as("n"))
        .where(col("n") > 1).select(col("fp"), lit(1L).as("isdup"))
      docs.join(broadcast(dupFps), Seq("fp"), "left")
        .groupBy("source")
        .agg(
          count(lit(1)).as("n_docs"),
          sum("n_tok").as("n_tokens"),
          sum(coalesce(col("isdup"), lit(0L))).as("dup_docs"),
          round(sum(coalesce(col("isdup"), lit(0L))).cast("double") / count(lit(1)), 4).as("dup_frac"),
          round(avg("score"), 4).as("mean_score"))
        .orderBy("source")
    }),

    // BPE merge learning (tokenizer fitting): one corpus pass builds
    // word frequencies, then 16 deterministic pair-merge rounds over
    // the vocab-sized relation. Fully oracle-checked: the rounds
    // unroll as 16 chained CTE steps in the DuckDB replay (bpeCtes).
    "t22_bpe_merges" -> ((s, dir) =>
      graft.operators.Bpe.learnMerges(table(s, dir, "documents"), "text", 16)
        .orderBy("merge_rank")),

    // BPE tokenizer APPLY (t22's other half — learn → ENCODE): the
    // merge fold runs over the vocab-sized distinct-word relation,
    // the corpus pays one broadcast join from words to their token
    // counts, so per-lang token mass under the learned tokenizer
    // costs a word aggregate, never a corpus-through-the-fold pass.
    // The compression column (chars per BPE token) is the number a
    // pretraining budget actually needs. Fully oracle-checked: the
    // DuckDB replay's round-16 vocab state IS each word's encoding
    // (round fold ≡ rank-ordered apply — the parity TextOpsSpec pins).
    "t35_bpe_encode" -> ((s, dir) => {
      val docs = table(s, dir, "documents")
      val merges = graft.operators.Bpe.learnMerges(docs, "text", 16)
      val words = docs
        .select(col("lang"), explode(T.tokens(col("text"))).as("w"))
        .where(length(col("w")) > 0)
      val enc = graft.operators.Bpe.encodeVocab(words.select("w"), "w", merges)
        .select(col("w"), size(col("syms")).as("n_syms"))
      words.join(broadcast(enc), Seq("w"))
        .groupBy("lang").agg(
          count(lit(1)).as("n_words"),
          sum(col("n_syms").cast("long")).as("n_tokens"),
          sum(length(col("w")).cast("long")).as("n_chars"))
        .withColumn("chars_per_token",
          round(col("n_chars").cast("double") / col("n_tokens"), 4))
        .orderBy("lang")
    }),

    // REAL model-free document embedding (t36): the feature-hashing
    // trick — token → md5 dimension with a ±1 sign hash, vector =
    // signed term-frequency sums. Integer arithmetic end to end, so
    // the embedding itself (not a proxy) hash-matches the DuckDB
    // replay; emitted sparse (one integer triple per nonzero
    // (doc, dim)) — the shuffle never carries text
    "t36_hash_embed" -> ((s, dir) =>
      T.hashEmbedSparse(table(s, dir, "documents"), "text", "doc_id")
        .orderBy("id", "dim")),

    // order-insensitive content fingerprint (bag-of-words md5)
    "t4_fingerprint" -> ((s, dir) => {
      table(s, dir, "documents")
        .groupBy(T.bowFingerprint(col("text")).as("fingerprint"))
        .agg(min("doc_id").as("keep_id"), count(lit(1)).as("n_docs"))
        .orderBy("fingerprint")
    }),

    // Heaps-law type growth at the 3-gram grain: how many NEW shingle
    // types each corpus decile contributes, and the cumulative type
    // count — the sublinearity diagnostic behind tokenizer sizing and
    // "is more data still adding types?" calls (Heaps 1978; 3-grams
    // rather than unigrams because a corpus' unigram vocabulary
    // saturates almost immediately while the n-gram type space keeps
    // growing — the curve a dedup/mixture planner actually reads).
    // One explode + one type-keyed min (map-side combined); the
    // decile relation is 10 rows, so the cumulative window is free.
    // The max id rides a broadcast, never a driver collect.
    "t38_vocab_growth" -> ((s, dir) => {
      val docs = table(s, dir, "documents")
      val first = docs
        .select(col("doc_id"),
          explode(T.wordShingles(T.tokens(col("text")))).as("token"))
        .groupBy("token").agg(min("doc_id").as("fd"))
      val w = org.apache.spark.sql.expressions.Window.orderBy("bucket")
        .rowsBetween(
          org.apache.spark.sql.expressions.Window.unboundedPreceding,
          org.apache.spark.sql.expressions.Window.currentRow)
      first.crossJoin(broadcast(docs.agg(max("doc_id").as("mx"))))
        .groupBy(expr("(fd * 10) div (mx + 1)").as("bucket"))
        .agg(count(lit(1)).as("new_tokens"))
        .withColumn("vocab_size", sum("new_tokens").over(w))
        .orderBy("bucket")
    }),

    // compression-ratio quality signal (the CCNet/RedPajama-style
    // low-entropy filter): per doc, zstd(text) bytes / text bytes —
    // boilerplate and template spam compress far below prose, random
    // noise barely compresses at all. One native codegen'd ZstdBytes
    // pass per row (bytes stay partition-local; only the per-source
    // aggregate shuffles — at 100 TB this is a map-side scan). No SQL
    // oracle (compressed size is zstd-library-specific) → rows-only +
    // TextOpsSpec (repetitive ≪ prose < digest-noise ordering,
    // determinism, ratio bounds).
    "t39_compress_ratio" -> ((s, dir) => {
      val bytes = col("text").cast("binary")
      val ratio = octet_length(graft.functions.graft_zstd(bytes))
        .cast("double") / octet_length(bytes)
      table(s, dir, "documents")
        .where(length(col("text")) > 0)
        .select(col("source"), ratio.as("r"))
        .groupBy("source")
        .agg(count(lit(1)).as("n_docs"),
          (floor(avg(col("r")) * 10000d + 0.5d) / 10000d).as("mean_ratio"),
          sum(when(col("r") < 0.25, 1L).otherwise(0L)).as("n_low_entropy"),
          sum(when(col("r") > 0.9, 1L).otherwise(0L)).as("n_high_entropy"))
        .orderBy("source")
    }),

    // duplicated-n-gram fraction (the FineWeb/Gopher inter-document
    // duplication signal): per doc, the fraction of its DISTINCT
    // 3-word shingles that also occur in at least one other doc —
    // reported as a decile histogram. Shingles shuffle as 52-bit
    // md5-derived hashes (engine-replayable, and a fixed-width key
    // instead of arbitrary-length strings — at 100 TB the shuffle is
    // 8 bytes/shingle, not the text). Two linear shuffles (by hash,
    // by doc); bucket = integer floor division, engine-stable.
    "t37_dup_fraction" -> ((s, dir) => {
      val sh = table(s, dir, "documents")
        .select(col("doc_id"),
          explode(T.wordShingles(T.tokens(col("text")))).as("sng"))
        .select(col("doc_id"),
          conv(substring(md5(col("sng")), 1, 13), 16, 10)
            .cast("long").as("h"))
      // r18: the shared-shingle flag comes from a count window over
      // the (h, doc_id)-grouped relation instead of joining the
      // instance stream back to a per-h countDistinct — after the
      // grouping there is exactly one row per (h, doc), so rows-per-h
      // IS countDistinct(doc_id), and the instance multiplicities
      // ride along as c. Drops one full instance-stream exchange and
      // the sort-merge join; the groupBy's map-side partial agg also
      // shrinks what the first exchange carries. Identical result
      // (oracle re-verified): n_sh = Σc, n_dup = Σc over shared hs.
      val g = sh.groupBy("h", "doc_id").agg(count(lit(1)).as("c"))
      g.withColumn("nd",
          count(lit(1)).over(org.apache.spark.sql.expressions.Window.partitionBy("h")))
        .groupBy("doc_id")
        .agg(sum(col("c")).as("n_sh"),
          sum(when(col("nd") >= 2, col("c")).otherwise(0L)).as("n_dup"))
        .groupBy(expr("(n_dup * 10) div n_sh").as("bucket"))
        .agg(count(lit(1)).as("n_docs"), sum("n_sh").as("sum_shingles"))
        .orderBy("bucket")
    }))

  val oracleSql: Map[String, String] = Map(
    // the 16 deterministic merge rounds unroll as chained CTE steps
    // (the s15_mmr_rerank technique applied to the BPE learner): each
    // round is one pair-count + one argmax (count desc, "l r" string
    // asc — identical to the Spark tie-break) + one merge-apply, and
    // the merge-apply is a plain left-to-right non-overlapping
    // replace over a tab-wrapped symbolization string (symbols come
    // from whitespace tokens, so tabs cannot occur inside them and
    // the wrapper is unambiguous; replace ≡ the pend-fold)
    "t22_bpe_merges" -> (bpeCtes(16) + "\n" +
      (1 to 16).map(t =>
        s"SELECT $t::INTEGER AS merge_rank, l AS lhs, r AS rhs, n AS pair_count FROM b$t")
        .mkString("\nUNION ALL ") +
      "\nORDER BY merge_rank"),
    // t22's final vocab state IS each word's encoding (the learner's
    // round fold ≡ rank-ordered apply, the parity TextOpsSpec pins),
    // so the per-lang report joins the corpus words to the round-16
    // symbol counts; chars_per_token replicates Spark's
    // BigDecimal-on-shortest-repr HALF_UP rounding via the
    // VARCHAR→DECIMAL hop (s15's trick)
    "t35_bpe_encode" -> (bpeCtes(16) + """,
        |enc AS (
        |  SELECT w, len(string_split(trim(ws, chr(9)), chr(9)||chr(9)))::BIGINT AS n_syms FROM v16
        |), words AS (
        |  SELECT lang, unnest(string_split(trim(regexp_replace(lower(text), '\s+', ' ', 'g')), ' ')) AS w
        |  FROM documents
        |)
        |SELECT lang, count(*)::BIGINT AS n_words, sum(n_syms)::BIGINT AS n_tokens,
        |  sum(length(w))::BIGINT AS n_chars,
        |  round((sum(length(w))::DOUBLE / sum(n_syms))::VARCHAR::DECIMAL(38,20), 4)::DOUBLE AS chars_per_token
        |FROM words JOIN enc USING (w)
        |WHERE length(w) > 0
        |GROUP BY lang ORDER BY lang""".stripMargin),
    // same tokenizer split; decile = pure integer division; the
    // cumulative window runs over 10 rows in both engines
    "t38_vocab_growth" ->
      """WITH toks AS (
        |  SELECT doc_id, string_split(trim(regexp_replace(lower(text), '\s+', ' ', 'g')), ' ') AS t FROM documents
        |), sh AS (
        |  SELECT doc_id, list_distinct(CASE WHEN len(t) < 3 THEN [array_to_string(t, ' ')]
        |    ELSE list_transform(generate_series(1, len(t)-2), i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2]) END) AS s
        |  FROM toks
        |), ex AS (
        |  SELECT doc_id, unnest(s) AS token FROM sh
        |), f AS (
        |  SELECT token, min(doc_id) AS fd FROM ex GROUP BY 1
        |), m AS (
        |  SELECT max(doc_id) AS mx FROM documents
        |), b AS (
        |  SELECT ((fd * 10) // (mx + 1))::BIGINT AS bucket,
        |    count(*)::BIGINT AS new_tokens
        |  FROM f, m GROUP BY 1
        |)
        |SELECT bucket, new_tokens,
        |sum(new_tokens) OVER (ORDER BY bucket)::BIGINT AS vocab_size
        |FROM b ORDER BY bucket""".stripMargin,
    // same tokenizer split / shingle construction / 52-bit md5 hash
    // as the Spark side; bucket arithmetic is pure integer division
    "t37_dup_fraction" ->
      """WITH toks AS (
        |  SELECT doc_id, string_split(trim(regexp_replace(lower(text), '\s+', ' ', 'g')), ' ') AS t FROM documents
        |), sh AS (
        |  SELECT doc_id, list_distinct(CASE WHEN len(t) < 3 THEN [array_to_string(t, ' ')]
        |    ELSE list_transform(generate_series(1, len(t)-2), i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2]) END) AS s
        |  FROM toks
        |), hx AS (
        |  SELECT doc_id, ('0x' || substr(md5(unnest(s)), 1, 13))::BIGINT AS h FROM sh
        |), nd AS (
        |  SELECT h, count(DISTINCT doc_id) AS nd FROM hx GROUP BY 1
        |), per AS (
        |  SELECT doc_id, count(*)::BIGINT AS n_sh,
        |    sum(CASE WHEN nd >= 2 THEN 1 ELSE 0 END)::BIGINT AS n_dup
        |  FROM hx JOIN nd USING (h) GROUP BY 1
        |)
        |SELECT ((n_dup * 10) // n_sh)::BIGINT AS bucket,
        |count(*)::BIGINT AS n_docs, sum(n_sh)::BIGINT AS sum_shingles
        |FROM per GROUP BY 1 ORDER BY 1""".stripMargin,
    // bit-exact replay of the feature-hashed embedding: same
    // tokenizer split, same md5 dimension/sign hashes, integer sums
    "t36_hash_embed" ->
      """WITH tok AS (
        |  SELECT doc_id, unnest(string_split(trim(regexp_replace(lower(text), '\s+', ' ', 'g')), ' ')) AS tok
        |  FROM documents),
        |h AS (
        |  SELECT doc_id,
        |    ('0x' || substr(md5(tok), 1, 7))::BIGINT % 64 AS dim,
        |    1 - 2 * (('0x' || substr(md5(tok), 8, 1))::BIGINT % 2) AS sgn
        |  FROM tok)
        |SELECT doc_id AS id, dim, sum(sgn)::BIGINT AS weight
        |FROM h GROUP BY 1, 2 HAVING sum(sgn) <> 0
        |ORDER BY id, dim""".stripMargin,
    "t34_perplexity_buckets" ->
      """WITH toks AS (
        |  SELECT doc_id, unnest(string_split(trim(regexp_replace(lower(text), '\s+', ' ', 'g')), ' ')) AS token
        |  FROM documents
        |), cc AS (
        |  SELECT token, count(*) AS c FROM toks GROUP BY 1
        |), tot AS (
        |  SELECT count(*) AS tot FROM toks
        |), lp AS (
        |  SELECT doc_id, count(*) AS n_tok,
        |  round(sum(ln(c::DOUBLE / tot)) / count(*), 4) AS avg_logprob
        |  FROM toks JOIN cc USING (token) CROSS JOIN tot GROUP BY 1
        |), sc AS (
        |  SELECT d.lang, l.doc_id, l.n_tok, l.avg_logprob
        |  FROM lp l JOIN documents d USING (doc_id)
        |), r AS (
        |  SELECT lang, n_tok, avg_logprob,
        |  row_number() OVER (PARTITION BY lang ORDER BY avg_logprob DESC, doc_id) - 1 AS rank0,
        |  count(*) OVER (PARTITION BY lang) AS n_lang FROM sc
        |)
        |SELECT lang,
        |CASE (rank0 * 3) // n_lang WHEN 0 THEN 'head' WHEN 1 THEN 'middle'
        |  ELSE 'tail' END AS bucket,
        |count(*)::BIGINT AS n_docs, sum(n_tok)::BIGINT AS n_tokens,
        |min(avg_logprob) AS min_lp, max(avg_logprob) AS max_lp
        |FROM r GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "t33_line_dedup" ->
      """WITH sents AS (
        |  SELECT doc_id, trim(s) AS sent
        |  FROM (SELECT doc_id, unnest(string_split(text, '. ')) AS s FROM documents)
        |  WHERE length(trim(s)) > 0
        |), fps AS (
        |  SELECT doc_id, md5(sent) AS fp, length(sent) AS slen FROM sents
        |), dup AS (
        |  SELECT fp FROM fps GROUP BY fp HAVING count(DISTINCT doc_id) > 1
        |)
        |SELECT f.doc_id, count(*)::BIGINT AS n_sents,
        |sum(CASE WHEN d.fp IS NULL THEN 1 ELSE 0 END)::BIGINT AS n_kept,
        |sum(CASE WHEN d.fp IS NULL THEN f.slen ELSE 0 END)::BIGINT AS kept_chars
        |FROM fps f LEFT JOIN dup d ON f.fp = d.fp
        |GROUP BY f.doc_id ORDER BY f.doc_id""".stripMargin,
    "t21_corpus_report" ->
      """WITH x AS (
        |  SELECT doc_id, source, string_split(trim(regexp_replace(lower(text), '\s+', ' ', 'g')), ' ') AS t,
        |  md5(array_to_string(list_sort(string_split(trim(regexp_replace(lower(text), '\s+', ' ', 'g')), ' ')), ' ')) AS fp
        |  FROM documents
        |), m AS (
        |  SELECT doc_id, source, fp, len(t) AS n_tok,
        |  len(list_filter(t, w -> w IN ('the', 'a'))) AS stop_cnt,
        |  list_sum(list_transform(t, s -> length(s)))::BIGINT AS sum_len
        |  FROM x
        |), dup AS (
        |  SELECT fp, 1 AS isdup FROM m GROUP BY fp HAVING count(*) > 1
        |), sc AS (
        |  SELECT source, n_tok,
        |  coalesce(isdup, 0) AS isdup,
        |  least(n_tok, 100)::DOUBLE / 100.0 * 0.5 + stop_cnt::DOUBLE / n_tok * 0.3 +
        |    (CASE WHEN sum_len::DOUBLE / n_tok >= 3.0 AND sum_len::DOUBLE / n_tok <= 8.0
        |     THEN 0.2 ELSE 0.0 END) AS score
        |  FROM m LEFT JOIN dup USING (fp)
        |)
        |SELECT source, count(*) AS n_docs, sum(n_tok)::BIGINT AS n_tokens,
        |sum(isdup)::BIGINT AS dup_docs,
        |round(sum(isdup)::DOUBLE / count(*), 4) AS dup_frac,
        |round(avg(score), 4) AS mean_score
        |FROM sc GROUP BY 1 ORDER BY 1""".stripMargin,
    "t20_decon_split" ->
      """WITH toks AS (
        |  SELECT doc_id, lang, n_chars, string_split(trim(regexp_replace(lower(text), '\s+', ' ', 'g')), ' ') AS t
        |  FROM documents
        |), sh AS (
        |  SELECT doc_id, lang, n_chars,
        |  list_distinct(CASE WHEN len(t) < 3 THEN [array_to_string(t, ' ')]
        |    ELSE list_transform(generate_series(1, len(t)-2), i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2]) END) AS s
        |  FROM toks
        |), bench AS (
        |  SELECT DISTINCT unnest(s) AS sng FROM sh WHERE doc_id % 97 = 0
        |), contam AS (
        |  SELECT DISTINCT doc_id FROM (SELECT doc_id, unnest(s) AS sng FROM sh WHERE doc_id % 97 <> 0) x
        |  JOIN bench USING (sng)
        |), lbl AS (
        |  SELECT d.doc_id, d.lang, d.n_chars,
        |  CASE WHEN c.doc_id IS NOT NULL THEN 'quarantine'
        |       WHEN ('0x' || substr(md5(d.doc_id::VARCHAR), 1, 7))::BIGINT % 100 < 80 THEN 'train'
        |       WHEN ('0x' || substr(md5(d.doc_id::VARCHAR), 1, 7))::BIGINT % 100 < 90 THEN 'dev'
        |       ELSE 'test' END AS split
        |  FROM documents d LEFT JOIN contam c USING (doc_id)
        |  WHERE d.doc_id % 97 <> 0
        |)
        |SELECT split, lang, count(*) AS n_docs, sum(n_chars)::BIGINT AS n_chars
        |FROM lbl GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "t19_global_shuffle" ->
      """WITH h AS (
        |  SELECT doc_id, md5(doc_id::VARCHAR || ':epoch0') AS h FROM documents
        |), r AS (
        |  SELECT doc_id, row_number() OVER (ORDER BY h, doc_id) AS shuffle_rank FROM h
        |)
        |SELECT doc_id, shuffle_rank, (shuffle_rank - 1) // 64 AS chunk
        |FROM r ORDER BY doc_id""".stripMargin,
    "t17_gopher_rules" ->
      """WITH toks AS (
        |  SELECT doc_id, unnest(string_split(trim(regexp_replace(lower(text), '\s+', ' ', 'g')), ' ')) AS t
        |  FROM documents
        |), tc AS (
        |  SELECT doc_id, t, count(*) AS cnt FROM toks GROUP BY 1, 2
        |), per AS (
        |  SELECT doc_id, sum(cnt) AS n_tok, sum(cnt * len(t)) AS sum_len,
        |    sum(CASE WHEN t IN ('the', 'a') THEN cnt ELSE 0 END) AS n_stop,
        |    max(cnt) AS max_cnt
        |  FROM tc GROUP BY 1
        |), flags AS (
        |  SELECT doc_id, n_tok::BIGINT AS n_tok,
        |    (CASE WHEN n_tok >= 40 THEN 1 ELSE 0 END)::BIGINT AS r_len,
        |    (CASE WHEN sum_len >= 3 * n_tok AND sum_len <= 10 * n_tok THEN 1 ELSE 0 END)::BIGINT AS r_wlen,
        |    (CASE WHEN n_stop >= 2 THEN 1 ELSE 0 END)::BIGINT AS r_stop,
        |    (CASE WHEN max_cnt * 5 <= n_tok THEN 1 ELSE 0 END)::BIGINT AS r_rep
        |  FROM per
        |)
        |SELECT doc_id, n_tok, r_len, r_wlen, r_stop, r_rep,
        |r_len * r_wlen * r_stop * r_rep AS pass
        |FROM flags ORDER BY doc_id""".stripMargin,
    "t18_dsir_sample" ->
      """WITH toks AS (
        |  SELECT doc_id, lang, unnest(string_split(trim(regexp_replace(lower(text), '\s+', ' ', 'g')), ' ')) AS t
        |  FROM documents
        |), hb AS (
        |  SELECT doc_id, lang, ('0x' || substr(md5(t), 1, 7))::BIGINT % 128 AS b FROM toks
        |), raw AS (
        |  SELECT b, count(*) AS r FROM hb GROUP BY 1
        |), tgt AS (
        |  SELECT b, count(*) AS tc FROM hb WHERE lang = 'en' GROUP BY 1
        |), dict AS (
        |  SELECT raw.b AS b, r, coalesce(tc, 0) AS tc FROM raw LEFT JOIN tgt ON raw.b = tgt.b
        |), tot AS (
        |  SELECT sum(r) AS rt, sum(tc) AS tt FROM dict
        |), lam AS (
        |  SELECT b, ln((tc + 1)::DOUBLE / (tt + 128)) - ln((r + 1)::DOUBLE / (rt + 128)) AS lam
        |  FROM dict CROSS JOIN tot
        |), per AS (
        |  SELECT doc_id, count(*) AS n_tok, sum(lam) AS s FROM hb JOIN lam USING (b) GROUP BY 1
        |)
        |SELECT doc_id, n_tok, round(s / n_tok, 4) + 0.0 AS dsir_score,
        |(CASE WHEN round(s / n_tok, 4) > 0 THEN 1 ELSE 0 END)::BIGINT AS keep
        |FROM per ORDER BY doc_id""".stripMargin,
    "t16_export_shards" ->
      """WITH sh AS (
        |  SELECT doc_id,
        |  ('0x' || substr(md5(doc_id::VARCHAR), 1, 7))::BIGINT % 8 AS shard,
        |  len(string_split(trim(regexp_replace(lower(text), '\s+', ' ', 'g')), ' '))::BIGINT AS n_toks
        |  FROM documents
        |)
        |SELECT shard, count(*) AS n_docs, sum(n_toks)::BIGINT AS n_tokens,
        |min(doc_id) AS min_id, max(doc_id) AS max_id,
        |md5(string_agg(doc_id::VARCHAR, ',' ORDER BY doc_id)) AS ids_md5
        |FROM sh GROUP BY 1 ORDER BY 1""".stripMargin,
    "t6_top_tokens" ->
      """WITH x AS (
        |  SELECT lang, unnest(string_split(trim(regexp_replace(lower(text), '\s+', ' ', 'g')), ' ')) AS token
        |  FROM documents
        |), c AS (
        |  SELECT lang, token, count(*) AS n FROM x GROUP BY 1, 2
        |), r AS (
        |  SELECT lang, token, n, row_number() OVER (PARTITION BY lang ORDER BY n DESC, token) AS rn FROM c
        |)
        |SELECT lang, rn, token, n FROM r WHERE rn <= 10 ORDER BY lang, rn""".stripMargin,
    "t24_zipf_report" ->
      """WITH tok AS (
        |  SELECT unnest(string_split(trim(regexp_replace(lower(text), '\s+', ' ', 'g')), ' ')) AS token
        |  FROM documents
        |), c AS (
        |  SELECT token, count(*) AS n FROM tok GROUP BY 1
        |), tot AS (
        |  SELECT count(*)::BIGINT AS vocab_size, sum(n)::BIGINT AS total_tokens FROM c
        |), top AS (
        |  SELECT token, n, row_number() OVER (ORDER BY n DESC, token) AS rk
        |  FROM c ORDER BY n DESC, token LIMIT 1000
        |), q AS (
        |  SELECT round(ln(rk), 9)::DECIMAL(18,9) AS x, round(ln(n), 9)::DECIMAL(18,9) AS y FROM top
        |), s AS (
        |  SELECT count(*)::BIGINT AS m,
        |  round(sum(x), 6)::DOUBLE AS sx, round(sum(y), 6)::DOUBLE AS sy,
        |  round(sum(x*y), 6)::DOUBLE AS sxy, round(sum(x*x), 6)::DOUBLE AS sxx,
        |  round(sum(y*y), 6)::DOUBLE AS syy FROM q
        |)
        |SELECT
        |round((m::DOUBLE * sxy - sx * sy) / (m::DOUBLE * sxx - sx * sx), 6)::DOUBLE AS zipf_slope,
        |round(((m::DOUBLE * sxy - sx * sy) * (m::DOUBLE * sxy - sx * sy))
        |      / ((m::DOUBLE * sxx - sx * sx) * (m::DOUBLE * syy - sy * sy)), 6)::DOUBLE AS r2,
        |m AS n_top, vocab_size, total_tokens
        |FROM s, tot""".stripMargin,
    "t25_vocab_coverage" ->
      """WITH x AS (
        |  SELECT lang, unnest(string_split(trim(regexp_replace(lower(text), '\s+', ' ', 'g')), ' ')) AS token
        |  FROM documents
        |), c AS (
        |  SELECT lang, token, count(*) AS n FROM x GROUP BY 1, 2
        |), v AS (
        |  SELECT lang, token FROM (
        |    SELECT lang, token, row_number() OVER (PARTITION BY lang ORDER BY n DESC, token) AS rk FROM c
        |  ) WHERE rk <= 16
        |), agg AS (
        |  SELECT c.lang,
        |  sum(c.n)::BIGINT AS total_tokens,
        |  sum(CASE WHEN v.token IS NOT NULL THEN c.n ELSE 0 END)::BIGINT AS covered_tokens,
        |  count(*) AS vocab_size
        |  FROM c LEFT JOIN v ON c.lang = v.lang AND c.token = v.token
        |  GROUP BY 1
        |)
        |SELECT lang, total_tokens, covered_tokens, vocab_size,
        |round(1.0 - covered_tokens::DOUBLE / total_tokens::DOUBLE, 6)::DOUBLE AS oov_rate
        |FROM agg ORDER BY lang""".stripMargin,
    "t7_mixture_sample" ->
      """WITH x AS (
        |  SELECT source,
        |  ('0x' || substr(md5(doc_id::VARCHAR), 1, 7))::BIGINT % 100 AS bucket,
        |  CASE WHEN regexp_extract(source, '([0-9]+)$', 1)::BIGINT % 2 = 0 THEN 30 ELSE 70 END AS weight
        |  FROM documents
        |)
        |SELECT source, count(*) AS n_total,
        |sum(CASE WHEN bucket < weight THEN 1 ELSE 0 END)::BIGINT AS n_kept
        |FROM x GROUP BY 1 ORDER BY 1""".stripMargin,
    "t1_langid" ->
      """WITH x AS (
        |  SELECT doc_id, string_split(trim(regexp_replace(lower(text), '\s+', ' ', 'g')), ' ') AS t FROM documents
        |), c AS (
        |  SELECT doc_id,
        |  len(list_filter(t, w -> w IN ('the', 'a'))) AS c_en,
        |  len(list_filter(t, w -> w IN ('el', 'la', 'los'))) AS c_es,
        |  len(list_filter(t, w -> w IN ('der', 'und', 'die'))) AS c_de,
        |  len(list_filter(t, w -> w IN ('le', 'les', 'et'))) AS c_fr
        |  FROM x
        |)
        |SELECT doc_id, c_en, c_es, c_de, c_fr,
        |CASE WHEN c_en >= greatest(c_es, c_de, c_fr) THEN 'en'
        |     WHEN c_es >= greatest(c_de, c_fr) THEN 'es'
        |     WHEN c_de >= c_fr THEN 'de' ELSE 'fr' END AS pred_lang
        |FROM c ORDER BY doc_id""".stripMargin,
    "t23_langid_eval" ->
      """WITH x AS (
        |  SELECT lang, string_split(trim(regexp_replace(lower(text), '\s+', ' ', 'g')), ' ') AS t FROM documents
        |), c AS (
        |  SELECT lang,
        |  len(list_filter(t, w -> w IN ('the', 'a'))) AS c_en,
        |  len(list_filter(t, w -> w IN ('el', 'la', 'los'))) AS c_es,
        |  len(list_filter(t, w -> w IN ('der', 'und', 'die'))) AS c_de,
        |  len(list_filter(t, w -> w IN ('le', 'les', 'et'))) AS c_fr
        |  FROM x
        |), p AS (
        |  SELECT lang,
        |  CASE WHEN c_en >= greatest(c_es, c_de, c_fr) THEN 'en'
        |       WHEN c_es >= greatest(c_de, c_fr) THEN 'es'
        |       WHEN c_de >= c_fr THEN 'de' ELSE 'fr' END AS pred_lang
        |  FROM c
        |), m AS (
        |  SELECT lang, pred_lang, count(*) AS n FROM p GROUP BY 1, 2
        |)
        |SELECT lang, pred_lang, n,
        |round(n::DOUBLE / sum(n) OVER (PARTITION BY lang), 4) AS class_share
        |FROM m ORDER BY lang, pred_lang""".stripMargin,
    "t2_quality" ->
      """WITH x AS (
        |  SELECT doc_id, string_split(trim(regexp_replace(lower(text), '\s+', ' ', 'g')), ' ') AS t FROM documents
        |), m AS (
        |  SELECT doc_id, len(t) AS n_tok,
        |  len(list_filter(t, w -> w IN ('the', 'a'))) AS stop_cnt,
        |  list_sum(list_transform(t, s -> length(s)))::BIGINT AS sum_len
        |  FROM x
        |), r AS (
        |  SELECT doc_id, n_tok,
        |  stop_cnt::DOUBLE / n_tok AS stop_ratio,
        |  sum_len::DOUBLE / n_tok AS avg_len
        |  FROM m
        |)
        |SELECT doc_id, n_tok, round(stop_ratio, 4) AS stop_ratio, round(avg_len, 4) AS avg_len,
        |round(least(n_tok, 100)::DOUBLE / 100.0 * 0.5 + stop_ratio * 0.3 +
        |  (CASE WHEN avg_len >= 3.0 AND avg_len <= 8.0 THEN 0.2 ELSE 0.0 END), 4) AS score
        |FROM r ORDER BY doc_id""".stripMargin,
    "t3_token_stats" ->
      """WITH x AS (
        |  SELECT source, string_split(trim(regexp_replace(lower(text), '\s+', ' ', 'g')), ' ') AS t FROM documents
        |), m AS (
        |  SELECT source, len(t) AS n_ws,
        |  list_sum(list_transform(t, s -> (length(s) + 3) // 4))::BIGINT AS n_sub
        |  FROM x
        |)
        |SELECT source, count(*) AS n_docs, sum(n_ws)::BIGINT AS n_ws_tokens,
        |sum(n_sub)::BIGINT AS n_sub_tokens,
        |round(sum(n_ws)::DOUBLE / count(*), 3) AS avg_tokens
        |FROM m GROUP BY 1 ORDER BY 1""".stripMargin,
    "t5_train_split" ->
      """WITH x AS (
        |  SELECT lang, n_chars,
        |  ('0x' || substr(md5(doc_id::VARCHAR), 1, 7))::BIGINT % 100 AS bucket
        |  FROM documents
        |)
        |SELECT CASE WHEN bucket < 80 THEN 'train' WHEN bucket < 90 THEN 'dev' ELSE 'test' END AS split,
        |lang, count(*) AS n_docs, sum(n_chars)::BIGINT AS n_chars
        |FROM x GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "t4_fingerprint" ->
      """SELECT md5(array_to_string(list_sort(string_split(trim(regexp_replace(lower(text), '\s+', ' ', 'g')), ' ')), ' ')) AS fingerprint,
        |min(doc_id) AS keep_id, count(*) AS n_docs
        |FROM documents GROUP BY 1 ORDER BY 1""".stripMargin,
    "t8_pii_scrub" ->
      """WITH x AS (
        |  SELECT doc_id,
        |  text || ' contact user' || doc_id || '@example.com or admin@test.org from 10.'
        |    || (doc_id % 256) || '.0.' || (doc_id % 100) || ' port 8080' AS t
        |  FROM documents
        |)
        |SELECT doc_id,
        |len(regexp_extract_all(t, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}'))::BIGINT AS n_emails,
        |len(regexp_extract_all(t, '[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}'))::BIGINT AS n_ips,
        |md5(regexp_replace(regexp_replace(t, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
        |  '[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}', '<IP>', 'g')) AS scrubbed_md5
        |FROM x ORDER BY doc_id""".stripMargin,
    "t9_repetition" ->
      """WITH toks AS (
        |  SELECT doc_id, string_split(trim(regexp_replace(lower(text), '\s+', ' ', 'g')), ' ') AS t FROM documents
        |), bg AS (
        |  SELECT doc_id, unnest(list_transform(generate_series(1, len(t)-1), i -> t[i] || ' ' || t[i+1])) AS g
        |  FROM toks WHERE len(t) >= 2
        |), c AS (
        |  SELECT doc_id, g, count(*) AS n FROM bg GROUP BY 1, 2
        |), m AS (
        |  SELECT doc_id, sum(n)::BIGINT AS n_bigrams, count(*) AS n_distinct, max(n)::BIGINT AS max_count
        |  FROM c GROUP BY 1
        |)
        |SELECT doc_id, n_bigrams, n_distinct,
        |round(1.0 - n_distinct::DOUBLE / n_bigrams, 4) AS dup_frac,
        |round(max_count::DOUBLE / n_bigrams, 4) AS top_frac,
        |(1.0 - n_distinct::DOUBLE / n_bigrams > 0.2) AS flagged
        |FROM m ORDER BY doc_id""".stripMargin,
    "t14_chunking" ->
      """WITH toks AS (
        |  SELECT doc_id, string_split(trim(regexp_replace(lower(text), '\s+', ' ', 'g')), ' ') AS t FROM documents
        |), x AS (
        |  SELECT doc_id, t, len(t) AS n FROM toks
        |), st AS (
        |  SELECT doc_id, t,
        |  unnest(generate_series(1, greatest(1, ((n - 64 + 47) // 48) * 48 + 1), 48)) AS start
        |  FROM x
        |), ch AS (
        |  SELECT doc_id, (start - 1) // 48 AS chunk_idx, list_slice(t, start, start + 63) AS chunk
        |  FROM st
        |)
        |SELECT doc_id, chunk_idx, len(chunk)::BIGINT AS n_tokens,
        |md5(array_to_string(chunk, ' ')) AS chunk_md5
        |FROM ch ORDER BY doc_id, chunk_idx""".stripMargin,
    "t15_pack_bins" ->
      """WITH x AS (
        |  SELECT source, doc_id,
        |  len(string_split(trim(regexp_replace(lower(text), '\s+', ' ', 'g')), ' '))::BIGINT AS n_tok
        |  FROM documents
        |), c AS (
        |  SELECT source, doc_id, n_tok,
        |  coalesce(sum(n_tok) OVER (PARTITION BY source ORDER BY doc_id
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)::BIGINT AS cum_before
        |  FROM x
        |)
        |SELECT source, cum_before // 2048 AS bin, count(*) AS n_docs,
        |sum(n_tok)::BIGINT AS n_tokens, min(doc_id) AS first_doc
        |FROM c GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    // same two shifted pair derivations; PMI written as the identical
    // double expression; top-40 by (pmi DESC, w1, w2)
    "t27_pmi_cooc" ->
      """WITH toks AS (
        |  SELECT string_split(trim(regexp_replace(lower(text), '\s+', ' ', 'g')), ' ') AS t
        |  FROM documents
        |), p1 AS (
        |  SELECT t[i] AS w1, t[i+1] AS w2
        |  FROM (SELECT t, unnest(generate_series(1, len(t) - 1)) AS i FROM toks WHERE len(t) > 1)
        |), p2 AS (
        |  SELECT t[i] AS w1, t[i+2] AS w2
        |  FROM (SELECT t, unnest(generate_series(1, len(t) - 2)) AS i FROM toks WHERE len(t) > 2)
        |), pairs AS (
        |  SELECT * FROM p1 UNION ALL SELECT * FROM p2
        |), uni AS (
        |  SELECT w, count(*) AS c FROM (SELECT unnest(t) AS w FROM toks) GROUP BY 1
        |), tot AS (
        |  SELECT (SELECT sum(c)::BIGINT FROM uni) AS n_tok, (SELECT count(*) FROM pairs) AS n_pair
        |), cp AS (
        |  SELECT w1, w2, count(*) AS c12 FROM pairs GROUP BY 1, 2 HAVING count(*) >= 30
        |)
        |SELECT w1, w2, c12,
        |round(ln((c12 * 1.0 / n_pair) / ((u1.c * 1.0 / n_tok) * (u2.c * 1.0 / n_tok))), 4) AS pmi
        |FROM cp JOIN uni u1 ON cp.w1 = u1.w JOIN uni u2 ON cp.w2 = u2.w CROSS JOIN tot
        |ORDER BY pmi DESC, w1, w2 LIMIT 40""".stripMargin,
    // bigram replay: t[i-1]/t[i] via an index unnest; (c2+1.0)/(c1+v)
    // is the same double division on the same exact longs both sides
    "t26_bigram_lm" ->
      """WITH toks AS (
        |  SELECT doc_id, string_split(trim(regexp_replace(lower(text), '\s+', ' ', 'g')), ' ') AS t
        |  FROM documents
        |), ex AS (
        |  SELECT doc_id, unnest(generate_series(2, len(t))) AS i, t FROM toks
        |), big AS (
        |  SELECT doc_id, t[i-1] AS prev, t[i] AS cur FROM ex
        |), c2 AS (
        |  SELECT prev, cur, count(*) AS c2 FROM big GROUP BY 1, 2
        |), c1 AS (
        |  SELECT prev, sum(c2)::BIGINT AS c1 FROM c2 GROUP BY 1
        |), v AS (
        |  SELECT count(DISTINCT t) AS v
        |  FROM (SELECT prev AS t FROM c2 UNION ALL SELECT cur FROM c2)
        |)
        |SELECT doc_id, count(*) AS n_big,
        |round(sum(ln((c2 + 1.0) / (c1 + v))) / count(*), 4) AS avg_logprob
        |FROM big JOIN c2 USING (prev, cur) JOIN c1 USING (prev) CROSS JOIN v
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    // t2 + t13 replayed, 4-dp values → exact decimal moment sums →
    // closed-form r in doubles (the t24 posture, grouped by source)
    "t28_signal_corr" ->
      """WITH tk AS (
        |  SELECT doc_id, source, string_split(trim(regexp_replace(lower(text), '\s+', ' ', 'g')), ' ') AS t FROM documents
        |), qm AS (
        |  SELECT doc_id, source, len(t) AS n_tok,
        |  len(list_filter(t, w -> w IN ('the', 'a')))::DOUBLE / len(t) AS stop_ratio,
        |  (list_sum(list_transform(t, s -> length(s)))::BIGINT)::DOUBLE / len(t) AS avg_len
        |  FROM tk
        |), xq AS (
        |  SELECT doc_id, source,
        |  round(least(n_tok, 100)::DOUBLE / 100.0 * 0.5 + stop_ratio * 0.3 +
        |    (CASE WHEN avg_len >= 3.0 AND avg_len <= 8.0 THEN 0.2 ELSE 0.0 END), 4)::DECIMAL(18,6) AS x
        |  FROM qm
        |), toks AS (
        |  SELECT doc_id, unnest(t) AS token FROM tk
        |), cc AS (
        |  SELECT token, count(*) AS c FROM toks GROUP BY 1
        |), tot AS (
        |  SELECT count(*) AS tot FROM toks
        |), yq AS (
        |  SELECT doc_id, round(sum(ln(c::DOUBLE / tot)) / count(*), 4)::DECIMAL(18,6) AS y
        |  FROM toks JOIN cc USING (token) CROSS JOIN tot GROUP BY 1
        |), s AS (
        |  SELECT source, count(*) AS m,
        |  round(sum(x), 6)::DOUBLE AS sx, round(sum(y), 6)::DOUBLE AS sy,
        |  round(sum(x * y), 6)::DOUBLE AS sxy,
        |  round(sum(x * x), 6)::DOUBLE AS sxx,
        |  round(sum(y * y), 6)::DOUBLE AS syy
        |  FROM xq JOIN yq USING (doc_id) GROUP BY 1
        |)
        |SELECT source, m,
        |CASE WHEN (m * sxx - sx * sx) * (m * syy - sy * sy) <= 0.0 THEN NULL
        |ELSE round((m * sxy - sx * sy) / sqrt((m * sxx - sx * sx) * (m * syy - sy * sy)), 6) END AS pearson_r
        |FROM s ORDER BY source""".stripMargin,
    "t13_lm_score" ->
      """WITH toks AS (
        |  SELECT doc_id, unnest(string_split(trim(regexp_replace(lower(text), '\s+', ' ', 'g')), ' ')) AS token
        |  FROM documents
        |), cc AS (
        |  SELECT token, count(*) AS c FROM toks GROUP BY 1
        |), tot AS (
        |  SELECT count(*) AS tot FROM toks
        |)
        |SELECT doc_id, count(*) AS n_tok,
        |round(sum(ln(c::DOUBLE / tot)) / count(*), 4) AS avg_logprob
        |FROM toks JOIN cc USING (token) CROSS JOIN tot
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "t12_tfidf" ->
      """WITH toks AS (
        |  SELECT doc_id, unnest(string_split(trim(regexp_replace(lower(text), '\s+', ' ', 'g')), ' ')) AS token
        |  FROM documents
        |), tf AS (
        |  SELECT doc_id, token, count(*) AS tf FROM toks GROUP BY 1, 2
        |), dfreq AS (
        |  SELECT token, count(*) AS df FROM tf GROUP BY 1
        |), n AS (
        |  SELECT count(*) AS n_docs FROM documents
        |), scored AS (
        |  SELECT tf.doc_id, tf.token, tf.tf, dfreq.df,
        |  tf.tf * ln((n.n_docs + 1)::DOUBLE / (dfreq.df + 1)) AS score
        |  FROM tf JOIN dfreq USING (token) CROSS JOIN n
        |), r AS (
        |  SELECT doc_id, token, tf, df, score,
        |  row_number() OVER (PARTITION BY doc_id ORDER BY score DESC, token) AS rn FROM scored
        |)
        |SELECT doc_id, rn, token, tf, df, round(score, 4) AS score
        |FROM r WHERE rn <= 3 ORDER BY doc_id, rn""".stripMargin,
    "t11_stratified_sample" ->
      """WITH counts AS (
        |  SELECT lang, count(*) AS n_lang FROM documents GROUP BY 1
        |), tgt AS (
        |  SELECT min(n_lang) AS target FROM counts
        |), x AS (
        |  SELECT d.lang,
        |  CASE WHEN (('0x' || substr(md5(d.doc_id::VARCHAR), 1, 7))::BIGINT % 1000000) * c.n_lang
        |       < t.target * 1000000 THEN 1 ELSE 0 END AS kept
        |  FROM documents d JOIN counts c ON d.lang = c.lang CROSS JOIN tgt t
        |)
        |SELECT lang, count(*) AS n_total, sum(kept)::BIGINT AS n_kept
        |FROM x GROUP BY 1 ORDER BY 1""".stripMargin,
    "t30_temperature_mix" ->
      """WITH c AS (
        |  SELECT source, count(*) AS n_src FROM documents GROUP BY 1
        |), t AS (
        |  SELECT min(n_src) AS n_min FROM c
        |), x AS (
        |  SELECT d.source, c.n_src,
        |    (('0x' || substr(md5(d.doc_id::VARCHAR), 1, 7))::BIGINT % 1000000) AS b
        |  FROM documents d JOIN c ON d.source = c.source
        |)
        |SELECT source, count(*) AS n_total,
        |  sum(CASE WHEN (b * b)::DOUBLE / 1e12 < t.n_min::DOUBLE / n_src::DOUBLE
        |      THEN 1 ELSE 0 END)::BIGINT AS n_kept
        |FROM x CROSS JOIN t GROUP BY 1 ORDER BY 1""".stripMargin,
    "t29_priority_sample" ->
      """WITH x AS (
        |  SELECT doc_id, source, n_chars,
        |    ('0x' || substr(md5(doc_id::VARCHAR), 1, 7))::BIGINT::DOUBLE
        |      / greatest(n_chars, 1)::DOUBLE AS priority
        |  FROM documents
        |), s AS (
        |  SELECT * FROM x ORDER BY priority, doc_id LIMIT 50
        |)
        |SELECT doc_id, source, n_chars, round(priority, 6) AS priority
        |FROM s ORDER BY doc_id""".stripMargin)

  /** Chained-CTE replay of [[graft.operators.Bpe.learnMerges]]'s k
    * deterministic merge rounds (DuckDB side of t22/t35). State per
    * round: the vocab as (w, ws, freq) where `ws` is the word's
    * symbolization wrapped in tabs — `\t sym \t\t sym \t`. Tokens are
    * whitespace-split, so no symbol can contain a tab and the wrapper
    * is unambiguous; a left-to-right non-overlapping
    * `replace(ws, \t l \t\t r \t → \t lr \t)` is exactly the BPE
    * pend-fold (consumed matches end on the boundary the next match
    * starts from, so [a,b,a,b] → [ab,ab] and [a,a,a] → [aa,a]).
    * Argmax tie-break is (count DESC, l||' '||r ASC) — bytewise equal
    * to the Spark side's pair-string ordering because symbols contain
    * no chars below 0x21. Emits CTEs w0, v0, b1..bk, v1..vk; the
    * caller appends the final SELECT.
    */
  private def bpeCtes(k: Int): String = {
    val base =
      """WITH w0 AS (
        |  SELECT token AS w, count(*)::BIGINT AS freq FROM (
        |    SELECT unnest(string_split(trim(regexp_replace(lower(text), '\s+', ' ', 'g')), ' ')) AS token
        |    FROM documents)
        |  WHERE length(token) > 0 GROUP BY 1
        |), v0 AS MATERIALIZED (
        |  SELECT w, chr(9) || array_to_string(list_transform(generate_series(1, length(w)), i -> substr(w, i, 1)), chr(9)||chr(9)) || chr(9) AS ws, freq
        |  FROM w0
        |)""".stripMargin
    val steps = (1 to k).map { t =>
      val p = t - 1
      s"""b$t AS MATERIALIZED (
         |  SELECT sy[i] AS l, sy[i+1] AS r, sum(freq)::BIGINT AS n FROM (
         |    SELECT sy, freq, unnest(generate_series(1, len(sy) - 1)) AS i
         |    FROM (SELECT string_split(trim(ws, chr(9)), chr(9)||chr(9)) AS sy, freq FROM v$p))
         |  GROUP BY 1, 2 ORDER BY n DESC, l || ' ' || r LIMIT 1
         |), v$t AS MATERIALIZED (
         |  SELECT w, coalesce(replace(ws, chr(9)||b.l||chr(9)||chr(9)||b.r||chr(9), chr(9)||b.l||b.r||chr(9)), ws) AS ws, freq
         |  FROM v$p LEFT JOIN b$t b ON true
         |)""".stripMargin
    }
    (base +: steps).mkString(",\n")
  }
}
