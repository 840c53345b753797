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

  /** lower-case, collapse whitespace runs, trim. */
  def normalize(c: Column): Column = trim(regexp_replace(lower(c), "\\s+", " "))

  /** whitespace tokens of the normalized text. */
  def tokens(c: Column): Column = split(normalize(c), " ")

  /** Content fingerprint: md5 of the normalized text (exact dedup key). */
  def contentFingerprint(c: Column): Column = md5(normalize(c))

  /** Bag-of-words fingerprint: md5 over the sorted token list —
    * invariant to word order (catches shuffled duplicates).
    */
  def bowFingerprint(c: Column): Column =
    md5(concat_ws(" ", array_sort(tokens(c))))

  /** Distinct n-word shingles; a single joined shingle for texts
    * shorter than n tokens.
    */
  def wordShingles(toks: Column, n: Int = 3): Column = {
    val shingle = transform(
      sequence(lit(0), size(toks) - n),
      i => concat_ws(" ", (1 to n).map(k => element_at(toks, i + k)): _*))
    array_distinct(when(size(toks) < n, array(concat_ws(" ", toks))).otherwise(shingle))
  }

  /** Exact word-n-gram Jaccard similarity between two shingle arrays
    * (integer set sizes → exact rational → engine-stable).
    */
  def jaccard(a: Column, b: Column): Column =
    size(array_intersect(a, b)).cast("double") /
      size(array_union(a, b)).cast("double")
}
