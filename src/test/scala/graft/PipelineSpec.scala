package graft

import org.apache.spark.sql.functions._

import graft.functions.{TextFunctions => T}
import graft.operators.{ConnectedComponents, Dedup}

/** End-to-end composition: the operators chain into the standard
  * training-data pipeline — quality filter → exact dedup → near-dup
  * clustering (keep one per cluster) → decontamination → split →
  * sharded export — with exact row accounting at every stage.
  */
class PipelineSpec extends SparkSpec {

  test("quality → dedup → cluster → decontaminate → split → export, with exact accounting") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val total = docs.count()
    assert(total > 0)

    // 1. quality filter: ≥ 10 tokens
    val quality = docs
      .withColumn("n_tok", size(T.tokens(col("text"))))
      .where(col("n_tok") >= 10)
      .drop("n_tok")
    val nQuality = quality.count()
    assert(nQuality > 0 && nQuality <= total)

    // 2. exact dedup: keep min doc_id per normalized content
    val keepExact = Dedup.exact(quality, "text", "doc_id")
      .select(col("keep_id").as("doc_id"))
    val afterExact = quality.join(keepExact, "doc_id")
    val nExact = afterExact.count()
    assert(nExact <= nQuality)

    // 3. near-dup clusters → keep the cluster representative (min id)
    val pairs = Dedup.jaccardVerified(afterExact, "text", "doc_id", 0.5)
      .select(col("id_a").as("src"), col("id_b").as("dst"))
    val comp = ConnectedComponents.run(pairs)
    val dropNearDup = comp.where(col("id") =!= col("component"))
      .select(col("id").as("doc_id"))
    val afterNear = afterExact.join(dropNearDup, Seq("doc_id"), "left_anti")
    val nNear = afterNear.count()
    val nDropped = dropNearDup.count()
    assert(nNear === nExact - nDropped)

    // 4. decontaminate against the doc_id % 97 == 0 "benchmark" slice
    val benchShingles = docs.where(col("doc_id") % 97 === 0)
      .select(explode(T.wordShingles(T.tokens(col("text")))).as("s")).distinct()
    val contaminated = afterNear.where(col("doc_id") % 97 =!= 0)
      .select(col("doc_id"), explode(T.wordShingles(T.tokens(col("text")))).as("s"))
      .join(broadcast(benchShingles), "s")
      .select("doc_id").distinct()
    val clean = afterNear.where(col("doc_id") % 97 =!= 0)
      .join(contaminated, Seq("doc_id"), "left_anti")
    val nClean = clean.count()
    assert(nClean === afterNear.where(col("doc_id") % 97 =!= 0).count() - contaminated.count())

    // 5. deterministic split partitions the survivors exactly
    val bucket = conv(substring(md5(col("doc_id").cast("string")), 1, 7), 16, 10)
      .cast("long") % 100
    val split = clean.withColumn("split",
      when(bucket < 80, "train").when(bucket < 90, "dev").otherwise("test"))
    val counts = split.groupBy("split").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(counts.values.sum === nClean)
    assert(counts.getOrElse("train", 0L) >= counts.getOrElse("test", 0L))

    // pipeline is deterministic end-to-end
    val again = split.groupBy("split").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(again === counts)

    // 6. sharded export of the train split: nothing lost, nothing
    // duplicated, shard assignment reproducible
    val exportDir = java.nio.file.Files.createTempDirectory("graft_pipe_export").toString
    val train = split.where(col("split") === "train").drop("split")
    val manifest = graft.sources.ParquetLake.exportShards(train, "doc_id", exportDir, 4)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(manifest.values.sum === counts.getOrElse("train", 0L))
    val reread = spark.read.parquet(exportDir)
    assert(reread.select("doc_id").distinct().count() === counts.getOrElse("train", 0L))
  }
}
