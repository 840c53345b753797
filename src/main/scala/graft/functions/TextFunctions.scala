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
}
