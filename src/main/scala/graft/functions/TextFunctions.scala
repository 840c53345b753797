package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-pipeline primitives, composed entirely from codegen'd
  * built-ins (no UDFs): normalization, tokenization, shingling,
  * fingerprints, MinHash signatures.
  *
  * Cross-engine notes: md5 hex and binary string ordering are
  * identical in Spark and DuckDB, which is what makes the MinHash
  * "permutations" (lexicographic min over seeded md5) oracle-checkable.
  */
object TextFunctions {

  /** lower-case, collapse whitespace runs, trim. Derived from the
    * token array (identity: normalize = join(tokens, " ") — tokens
    * never contain separators, and both yield "" on empty input), so
    * the fast tokenizer serves both forms with one scan.
    */
  def normalize(c: Column): Column =
    when(c.isNotNull, concat_ws(" ", tokens(c))) // null in, null out (concat_ws would yield "")

  /** whitespace tokens of the normalized text — the codegen'd
    * single-pass [[TokenizeOps]] scan; exact parity with the
    * relational split(trim(regexp_replace(lower(c), "\s+", " ")), " ")
    * form the DuckDB oracles replay (parity spec in TextSpec).
    */
  def tokens(c: Column): Column = graft.functions.tokenizeWs(c)

  /** Content fingerprint: md5 of the normalized text (exact dedup key). */
  def contentFingerprint(c: Column): Column = md5(normalize(c))

  /** Bag-of-words fingerprint: md5 over the sorted token list —
    * invariant to word order (catches shuffled duplicates).
    */
  def bowFingerprint(c: Column): Column =
    md5(concat_ws(" ", array_sort(tokens(c))))

  /** Distinct n-word shingles; a single joined shingle for texts
    * shorter than n tokens. Native one-pass expression ([[ShingleOps]]);
    * exact parity with the relational
    * array_distinct(transform(sequence, concat_ws)) form the oracles
    * replay is pinned in TextOpsSpec.
    */
  def wordShingles(toks: Column, n: Int = 3): Column =
    graft.functions.shinglesWs(toks, n)

  /** Exact word-n-gram Jaccard similarity between two shingle arrays
    * (integer set sizes → exact rational → engine-stable).
    */
  def jaccard(a: Column, b: Column): Column =
    size(array_intersect(a, b)).cast("double") /
      size(array_union(a, b)).cast("double")

  /** ROW-LOCAL Gopher-style quality flags — the same four rules (and
    * thresholds) as the batch t17 query, computed per row from array
    * expressions instead of a token-explode + groupBy. That makes the
    * gate usable where a shuffle is not: streaming ingest admission,
    * map-side pre-filters before an expensive operator. Returns a
    * struct `(n_tok, r_len, r_wlen, r_stop, r_rep, pass)`; parity
    * with t17 is spec-pinned per doc (TextOpsSpec).
    *
    * Cost note: `r_rep`'s max token count is O(distinct · n_tok) per
    * row — the row-local price of the relational `max(cnt)`; bounded
    * by document length, independent of corpus size, and shuffle-free,
    * which is the right trade for an admission gate.
    */
  def qualityFlags(
      text: Column, stopwords: Seq[String] = Seq("the", "a")): Column = {
    val toks = tokens(text)
    val nTok = size(toks).cast("long")
    val sumLen = aggregate(toks, lit(0L), (acc, t) => acc + length(t).cast("long"))
    val nStop = size(filter(toks,
      t => t.isin(stopwords.map(x => x: Any): _*))).cast("long")
    val maxCnt = coalesce(
      array_max(transform(array_distinct(toks),
        d => size(filter(toks, x => x === d)).cast("long"))),
      lit(0L))
    val rLen = when(nTok >= 40, 1L).otherwise(0L)
    val rWlen = when(sumLen >= nTok * 3 && sumLen <= nTok * 10, 1L).otherwise(0L)
    val rStop = when(nStop >= 2, 1L).otherwise(0L)
    val rRep = when(maxCnt * 5 <= nTok, 1L).otherwise(0L)
    struct(
      nTok.as("n_tok"), rLen.as("r_len"), rWlen.as("r_wlen"),
      rStop.as("r_stop"), rRep.as("r_rep"),
      (rLen * rWlen * rStop * rRep).as("pass"))
  }

  val EmailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val Ipv4Re = "[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}"

  /** t8/st28: PII scrub — emails and IPv4 literals replaced by
    * placeholders, with per-row match counts for the audit trail.
    * Pure codegen'd regex built-ins, strictly ROW-LOCAL: cost is
    * bounded by the row's text length, never corpus size, so the
    * same expression is a map-only pass in a batch job (t8) or a
    * stateless micro-batch gate (st28) — a doc scrubs identically on
    * either path. Returns struct(n_emails, n_ips, scrubbed).
    */
  def piiScrub(c: Column): Column = struct(
    size(regexp_extract_all(c, lit(EmailRe), lit(0))).cast("long").as("n_emails"),
    size(regexp_extract_all(c, lit(Ipv4Re), lit(0))).cast("long").as("n_ips"),
    regexp_replace(regexp_replace(c, EmailRe, "<EMAIL>"), Ipv4Re, "<IP>")
      .as("scrubbed"))

  /** t36: a REAL model-free document embedding via the feature-
    * hashing trick (Weinberger et al. 2009, the sklearn
    * HashingVectorizer family) — NOT the md5 stand-in of the m5
    * inference plumbing: each token hashes to a dimension
    * (md5 % dims) with a ±1 sign hash to unbias collisions, and a
    * document's vector is the signed term-frequency sum per
    * dimension. Every number is an INTEGER sum of ±1s, so the
    * embedding is bit-replayable in SQL — unlike a neural encoder —
    * while still being a genuine embedding: cosine over it IS
    * unigram similarity, so it feeds the whole s-family (kNN,
    * dedup, clustering) with zero model dependency. Emitted sparse
    * as (id, dim, weight ≠ 0): a shuffle carries one integer triple
    * per distinct (doc, dim), never text, and map-side combine
    * collapses repeated tokens at the scan.
    */
  def hashEmbedSparse(
      df: org.apache.spark.sql.DataFrame, textCol: String, idCol: String,
      dims: Int = 64): org.apache.spark.sql.DataFrame = {
    val h = md5(col("tok"))
    df.select(col(idCol).as("id"), explode(tokens(col(textCol))).as("tok"))
      .select(col("id"),
        pmod(conv(substring(h, 1, 7), 16, 10).cast("long"), lit(dims.toLong)).as("dim"),
        (lit(1L) - lit(2L) * pmod(conv(substring(h, 8, 1), 16, 10).cast("long"), lit(2L))).as("sgn"))
      .groupBy("id", "dim")
      .agg(sum(col("sgn")).as("weight"))
      .where(col("weight") =!= 0)
  }
}
