package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.{TextFunctions => T}

/** Byte-pair-encoding merge learning (Sennrich et al. 2016) — the
  * tokenizer-fitting step of a training-data pipeline, as an
  * iterative DataFrame computation.
  *
  * Scale shape: the corpus is touched ONCE (tokens → word-frequency
  * aggregate); every Lloyd-style merge round after that runs on the
  * WORD-FREQUENCY relation, whose size is the vocabulary — millions
  * of rows at 100 TB, not the corpus — so the per-round cost is a
  * vocab-sized pair explode + one groupBy plus a single-row argmax
  * action. Each round re-materializes the symbolized vocab (lazy
  * localCheckpoint) so lineage doesn't compound, exactly like
  * [[Similarity.kmeansCentroids]].
  *
  * Determinism: the best pair maximizes (count, then lexicographic
  * (left, right) ASCENDING as the tie-break) — no RNG, no
  * partitioning sensitivity, so the learned merge table is
  * reproducible on any cluster. The merge-apply is a left-to-right
  * non-overlapping fold (aaa + (a,a) → [aa, a]), the standard BPE
  * semantics.
  */
object Bpe {

  /** Left-to-right non-overlapping merge of adjacent (l, r) symbol
    * pairs: fold carrying a pending symbol; vocab-sized input, so the
    * interpreted higher-order fold is deliberate (documented tax on a
    * small relation — the corpus never runs through it).
    */
  private def mergePair(syms: Column, l: Column, r: Column): Column = {
    val folded = aggregate(
      syms,
      struct(
        array().cast("array<string>").as("out"),
        lit(null).cast("string").as("pend")),
      (acc, s) =>
        when(acc("pend").isNull, struct(acc("out").as("out"), s.as("pend")))
          .when(acc("pend") === l && s === r,
            struct(concat(acc("out"), array(concat(l, r))).as("out"),
              lit(null).cast("string").as("pend")))
          .otherwise(
            struct(concat(acc("out"), array(acc("pend"))).as("out"), s.as("pend"))))
    when(folded("pend").isNull, folded("out"))
      .otherwise(concat(folded("out"), array(folded("pend"))))
  }

  /** Learn `numMerges` BPE merges over the corpus' whitespace words.
    * Returns (merge_rank, lhs, rhs, pair_count) — rank 1 is the first
    * (highest-count) merge. Words shorter than 2 symbols stop
    * contributing automatically (no pairs).
    */
  def learnMerges(
      df: DataFrame, textCol: String, numMerges: Int): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    // the ONLY corpus-wide pass: word frequencies
    var vocab = df
      .select(explode(T.tokens(col(textCol))).as("w"))
      .where(length(col("w")) > 0)
      .groupBy("w").agg(count(lit(1)).as("freq"))
      // char symbolization: split strictly BETWEEN characters — the
      // (?=.) guard stops the lookahead matching at end-of-string,
      // which under Spark's limit=-1 split would append a trailing
      // empty symbol (and "" would then enter the pair counts)
      .select(split(col("w"), "(?!^)(?=.)").as("syms"), col("freq"))
      .localCheckpoint(eager = false)
    val merges = scala.collection.mutable.ArrayBuffer.empty[(Int, String, String, Long)]
    var rank = 1
    while (rank <= numMerges) {
      // adjacent symbol pairs via the native positional 2-gram
      // builder (overlaps included, matching reference BPE counting);
      // the " "-joined pair string splits back unambiguously because
      // symbols come from whitespace tokens and merges only
      // concatenate them
      val best = vocab
        .where(size(col("syms")) >= 2)
        .select(col("freq"),
          explode(graft.functions.gramsWs(col("syms"), 2)).as("pair"))
        .groupBy("pair").agg(sum(col("freq")).as("n"))
        .orderBy(col("n").desc, col("pair").asc)
        .limit(1)
        .collect()
      if (best.isEmpty) rank = numMerges + 1
      else {
        val pairStr = best(0).getString(0)
        val n = best(0).getLong(1)
        val sp = pairStr.indexOf(' ') // symbols never contain spaces (whitespace tokens)
        val (lS, rS) = (pairStr.substring(0, sp), pairStr.substring(sp + 1))
        merges += ((rank, lS, rS, n))
        vocab = vocab
          .select(mergePair(col("syms"), lit(lS), lit(rS)).as("syms"), col("freq"))
          .localCheckpoint(eager = false)
        rank += 1
      }
    }
    merges.toSeq.toDF("merge_rank", "lhs", "rhs", "pair_count")
  }
}
