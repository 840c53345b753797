package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.{cosine, simhash64, TextFunctions => T}

/** Deduplication operators for training-data pipelines (SURVEY §2.3).
  *
  * Scale design: every operator shuffles *keys or signatures*, never
  * raw text. Exact dedup groups on a 128-bit fingerprint; MinHash-LSH
  * generates candidates with one equi-join on (band, bucket-hash);
  * SimHash buckets on 16-bit chunks (pigeonhole: hamming ≤ 3 pairs
  * must collide in ≥ 1 of 4 chunks). Only the exact-verify stages
  * touch pairs, and only candidate pairs, never the cross product.
  */
object Dedup {

  /** Single-file parquet inputs arrive as one partition; fan compute-
    * heavy per-row work (md5 permutations, shingling) across cores.
    * On a real cluster input splits provide this for free; the
    * round-robin repartition costs one narrow pass over (id, text).
    */
  private def spread(df: DataFrame): DataFrame =
    df.repartition(df.sparkSession.sparkContext.defaultParallelism)

  /** Exact dedup by normalized-content fingerprint: one row per
    * distinct content, keeping the minimum id.
    */
  def exact(df: DataFrame, textCol: String, idCol: String): DataFrame =
    df.groupBy(T.contentFingerprint(col(textCol)).as("fingerprint"))
      .agg(min(col(idCol)).as("keep_id"), count(lit(1)).as("n_copies"))

  /** MinHash permutation constants: perm p of a 28-bit base hash b is
    * (PermA(p)*b + PermB(p)) mod PermMod — affine "permutations" over
    * one md5-derived base per shingle, so each shingle is hashed once
    * regardless of numPerms. Mirrored verbatim in the DuckDB oracle.
    */
  private[graft] val PermMod = 2147483647L
  private[graft] def permA(p: Int): Long = 2654435761L + 2L * p
  private[graft] def permB(p: Int): Long = 7919L * p + 13

  /** Per-doc MinHash LSH band keys: (id, band, h).
    *
    * Formulated as explode → hash-aggregate so shingling runs once
    * per document (lambda subtrees are exempt from Spark's
    * subexpression elimination, so the array-of-array_min form would
    * re-shingle once per permutation) and the per-permutation mins
    * combine map-side — the shuffle carries one signature row per
    * document, never shingle sets.
    */
  private def bandKeys(
      df: DataFrame, textCol: String, idCol: String,
      numPerms: Int, bands: Int): DataFrame =
    bandKeysFromShingles(
      spread(df).select(
        col(idCol).as("id"),
        explode(T.wordShingles(T.tokens(col(textCol)))).as("sng")),
      numPerms, bands)

  /** Band keys from an exploded (id, sng: string) shingle relation.
    *
    * Callers must pass the shingles either already exploded from the
    * raw text (generator child = full expression) or from a persisted
    * relation: exploding a *computed array attribute* of an uncached
    * plan looks harmless, but InferFiltersFromGenerate then plants a
    * `size(s) > 0` filter whose substituted shingling expression is
    * pushed below the repartition — re-shingling the whole corpus
    * serially on the input partition (measured 4.5× on d2).
    */
  private def bandKeysFromShingles(
      exploded: DataFrame, numPerms: Int, bands: Int): DataFrame = {
    val r = numPerms / bands
    val base = exploded
      .select(col("id"),
        conv(substring(md5(col("sng")), 1, 7), 16, 10).cast("long").as("b"))
    val minCols = (0 until numPerms).map(p =>
      min((col("b") * permA(p) + permB(p)) % PermMod).as(s"m$p"))
    val sig = base.groupBy("id").agg(minCols.head, minCols.tail: _*)
    val bandCols = (0 until bands).map(b =>
      struct(
        lit(b).as("band"),
        md5(concat_ws("|",
          (0 until r).map(k => col(s"m${b * r + k}").cast("string")): _*)).as("h")))
    sig.select(col("id"), explode(array(bandCols: _*)).as("bh"))
      .select(col("id"), col("bh.band").as("band"), col("bh.h").as("h"))
  }

  /** MinHash + LSH near-duplicate *candidate* pairs: docs sharing at
    * least one of `bands` band keys. Returns (id_a, id_b, n_bands)
    * with id_a < id_b. The only wide op is the band-key equi-join.
    */
  def minhashCandidates(
      df: DataFrame, textCol: String, idCol: String,
      numPerms: Int = 12, bands: Int = 4): DataFrame = {
    val keys = bandKeys(df, textCol, idCol, numPerms, bands)
    val a = keys.toDF("id_a", "band", "h")
    val b = keys.toDF("id_b", "band", "h")
    a.join(b, Seq("band", "h"))
      .where(col("id_a") < col("id_b"))
      .groupBy("id_a", "id_b")
      .agg(count(lit(1)).as("n_bands"))
  }

  /** Per-doc 64-bit SimHash fingerprint (hex). */
  def simhashFingerprints(df: DataFrame, textCol: String, idCol: String): DataFrame =
    spread(df).select(
      col(idCol).as("id"),
      lpad(hex(simhash64(T.tokens(col(textCol)))), 16, "0").as("simhash"))

  /** SimHash near-dup pairs with Hamming distance ≤ maxHamming,
    * bucketed on the four 16-bit chunks (exact for maxHamming ≤ 3;
    * high-recall heuristic above that).
    */
  def simhashPairs(
      df: DataFrame, textCol: String, idCol: String, maxHamming: Int): DataFrame = {
    val withHash = spread(df).select(
      col(idCol).as("id"), simhash64(T.tokens(col(textCol))).as("sh"))
    val chunked = withHash.select(
      col("id"), col("sh"),
      explode(array((0 until 4).map(c =>
        struct(lit(c).as("chunk"), shiftrightunsigned(col("sh"), c * 16)
          .bitwiseAND(lit(0xffffL)).as("ck"))): _*)).as("b"))
      .select(col("id"), col("sh"), col("b.chunk"), col("b.ck"))
    val a = chunked.toDF("id_a", "sh_a", "chunk", "ck")
    val b = chunked.toDF("id_b", "sh_b", "chunk", "ck")
    a.join(b, Seq("chunk", "ck"))
      .where(col("id_a") < col("id_b"))
      .select("id_a", "id_b", "sh_a", "sh_b").distinct()
      .withColumn("hamming", bit_count(col("sh_a").bitwiseXOR(col("sh_b"))))
      .where(col("hamming") <= maxHamming)
      .select("id_a", "id_b", "hamming")
  }

  /** Exact word-n-gram Jaccard pairs ≥ threshold. Brute-force verify
    * tool for small/blocked sets — at scale, feed it
    * [[minhashCandidates]] output instead of the cross product. A
    * size-ratio prefilter (|A|/|B| ≥ t implied by J ≥ t) prunes pairs
    * before the set intersection without changing the result.
    */
  def jaccardPairs(
      df: DataFrame, textCol: String, idCol: String, threshold: Double): DataFrame = {
    val sh = spread(df).select(
      col(idCol).as("id"),
      T.wordShingles(T.tokens(col(textCol))).as("s"))
      .withColumn("ns", size(col("s")))
    val a = sh.toDF("id_a", "s_a", "ns_a")
    val b = sh.toDF("id_b", "s_b", "ns_b")
    a.join(b,
      col("id_a") < col("id_b") &&
        col("ns_a") * lit(threshold) <= col("ns_b") &&
        col("ns_b") * lit(threshold) <= col("ns_a"))
      .withColumn("jaccard", T.jaccard(col("s_a"), col("s_b")))
      .where(col("jaccard") >= threshold)
      .select(col("id_a"), col("id_b"), round(col("jaccard"), 4).as("jaccard"))
  }

  /** Exact Jaccard over MinHash-LSH candidates — the scalable
    * near-dup pipeline: candidates come from the band equi-join
    * (never the cross product), then only those pairs pay the exact
    * set intersection. Recall is the LSH capture probability
    * 1-(1-J^r)^b, ≈ 1 for J near 1 (12 perms / 4 bands: 99.98% at
    * J=0.9).
    */
  def jaccardVerified(
      df: DataFrame, textCol: String, idCol: String, threshold: Double,
      numPerms: Int = 12, bands: Int = 4): DataFrame = {
    // One shingling pass feeds BOTH the MinHash signatures and the
    // exact verification. Lazy localCheckpoint, not persist: same
    // shared materialization (memory+disk), but the plan truncates to
    // a leaf (no InferFiltersFromGenerate re-inlining) and the blocks
    // are GC'd with the DataFrame — persist() entries live in the
    // session CacheManager forever and accumulate across queries.
    val sh = spread(df).select(
      col(idCol).as("id"),
      T.wordShingles(T.tokens(col(textCol))).as("s"))
      .localCheckpoint(eager = false)
    val keys = bandKeysFromShingles(
      sh.select(col("id"), explode(col("s")).as("sng")), numPerms, bands)
    val a = keys.toDF("id_a", "band", "h")
    val b = keys.toDF("id_b", "band", "h")
    val cands = a.join(b, Seq("band", "h"))
      .where(col("id_a") < col("id_b"))
      .select("id_a", "id_b").distinct()
    // Gather both sides' shingles with ONE shingling pass: unpivot the
    // pair to (pair, side, id), join the shingle relation once, fold
    // back. Only candidate docs' shingle sets ever shuffle.
    val long = cands.select(
      concat_ws("_", col("id_a"), col("id_b")).as("pk"),
      explode(array(
        struct(lit("a").as("side"), col("id_a").as("id")),
        struct(lit("b").as("side"), col("id_b").as("id")))).as("x"))
      .select(col("pk"), col("x.side").as("side"), col("x.id").as("id"))
    long.join(sh, "id")
      .groupBy("pk")
      .agg(
        first(when(col("side") === "a", col("id")), ignoreNulls = true).as("id_a"),
        first(when(col("side") === "b", col("id")), ignoreNulls = true).as("id_b"),
        first(when(col("side") === "a", col("s")), ignoreNulls = true).as("s_a"),
        first(when(col("side") === "b", col("s")), ignoreNulls = true).as("s_b"))
      .withColumn("jaccard", T.jaccard(col("s_a"), col("s_b")))
      .where(col("jaccard") >= threshold)
      .select(col("id_a"), col("id_b"), round(col("jaccard"), 4).as("jaccard"))
  }

  /** Embedding-cosine near-dup pairs ≥ minCos (brute force; the ANN
    * path for large N is Similarity.lshKnn's bucketing).
    */
  def embeddingPairs(
      df: DataFrame, vecCol: String, idCol: String, minCos: Double): DataFrame = {
    val e = spread(df).select(col(idCol).as("id"), col(vecCol).as("v"))
    val a = e.toDF("id_a", "v_a")
    val b = e.toDF("id_b", "v_b")
    a.join(b, col("id_a") < col("id_b"))
      .withColumn("cos_sim", cosine(col("v_a"), col("v_b")))
      .where(col("cos_sim") >= minCos)
      .select(col("id_a"), col("id_b"), round(col("cos_sim"), 4).as("cos_sim"))
  }
}
