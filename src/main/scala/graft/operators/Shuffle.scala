package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deterministic global training-order shuffle: a reproducible
  * permutation (ORDER BY a salted md5 of the id — no RNG, identical
  * on any cluster size) with a dense global rank assigned WITHOUT a
  * single-partition window.
  *
  * Scale shape: bucket on the first `prefixHexChars` hex chars of the
  * hash (a prefix of the sort key, so bucket-major order IS the
  * global order), `row_number` within each bucket, then add the
  * broadcast table of cumulative bucket offsets. Each bucket's rank
  * stage is ONE task sorting ~corpus/16^prefixHexChars rows, so the
  * width bounds the per-task sort: at 100 TB of ids+hashes (~4 TB of
  * key data), 2 hex chars = 256 buckets ≈ 16 GB/task (spills), the
  * default 4 = 65536 buckets ≈ 64 MB/task; the offsets table is at
  * most 16^prefixHexChars rows of (long, long) — broadcast-class at
  * any supported width (≤ 6). The permutation itself is
  * width-INVARIANT: width only re-partitions the rank computation.
  */
object Shuffle {

  /** (idCol, shuffle_rank, chunk) for every input row; `salt` makes
    * distinct epochs produce independent permutations.
    */
  def globalPermutation(
      df: DataFrame, idCol: String, salt: String,
      prefixHexChars: Int = 4, chunkSize: Int = 64): DataFrame = {
    require(prefixHexChars >= 1 && prefixHexChars <= 6,
      s"prefixHexChars must be in [1,6], got $prefixHexChars")
    val b = df
      .select(col(idCol),
        md5(concat(col(idCol).cast("string"), lit(":" + salt))).as("h"))
      .withColumn("bkt",
        conv(substring(col("h"), 1, prefixHexChars), 16, 10).cast("long"))
    val offs = b.groupBy("bkt").agg(count(lit(1)).as("n"))
      .withColumn("off",
        coalesce(sum("n").over(
          Window.orderBy("bkt").rowsBetween(Window.unboundedPreceding, -1)),
          lit(0L)))
      .select("bkt", "off")
    b.join(broadcast(offs), Seq("bkt"))
      .withColumn("r_in_b", row_number().over(
        Window.partitionBy("bkt").orderBy(col("h"), col(idCol))).cast("long"))
      .select(col(idCol),
        (col("off") + col("r_in_b")).as("shuffle_rank"))
      .withColumn("chunk",
        ((col("shuffle_rank") - 1) / chunkSize).cast("long"))
  }
}
