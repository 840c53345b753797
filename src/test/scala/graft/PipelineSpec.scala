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

  test("pipeline_wap: stage → audit-reject → re-stage → publish → incremental stats → pruned reads → health → incremental consume") {
    import java.nio.file.Files
    import graft.sources.ParquetLake
    import graft.queries.events
    // the running lake: one committed snapshot with footer stats
    val dir = Files.createTempDirectory("graft_pipe_lake").toString
    ParquetLake.writePartitioned(
      events(spark, sf).select("event_id", "user_id", "event_type", "ts_ms"),
      dir, "ts_ms", sortCols = Seq("ts_ms"))
    val v1 = ParquetLake.snapshotManifest(spark, dir)
    ParquetLake.buildFileStats(spark, dir, Seq("ts_ms"))
    val baseCount = ParquetLake.countManifested(spark, dir)
    // W: tonight's batch arrives with corrupt rows (negative ts)
    val base = ParquetLake.readManifested(spark, dir)
    val good = base.where(col("event_id") % 5 === 0)
      .withColumn("event_id", col("event_id") + 50000000L)
    val bad = good.limit(7).withColumn("ts_ms", lit(-1L))
    ParquetLake.stageAppend(spark, dir, good.unionByName(bad), "nightly", Some("p_date"))
    // A: the audit catches the corrupt rows while readers see nothing
    val audited = ParquetLake.readStaged(spark, dir, "nightly")
    assert(audited.where(col("ts_ms") < 0).count() === 7)
    assert(ParquetLake.countManifested(spark, dir) === baseCount)
    // reject: abandon, re-stage the cleaned batch, audit passes
    ParquetLake.abandonStaged(spark, dir, "nightly")
    ParquetLake.stageAppend(spark, dir, good, "nightly", Some("p_date"))
    assert(ParquetLake.readStaged(spark, dir, "nightly")
      .where(col("ts_ms") < 0).count() === 0)
    // P: one atomic flip
    val v2 = ParquetLake.publishStaged(spark, dir, "nightly")
    assert(v2 > v1)
    val goodCount = good.count()
    assert(ParquetLake.countManifested(spark, dir) === baseCount + goodCount)
    // maintenance proportional to churn: only the staged files harvest
    val churn = (ParquetLake.readManifest(spark, dir, Some(v2)).get.toSet --
      ParquetLake.readManifest(spark, dir, Some(v1)).get.toSet).size
    assert(ParquetLake.buildFileStatsIncremental(spark, dir, Seq("ts_ms")) === churn)
    // reads keep their contracts through the new version
    val lo = events(spark, sf).agg(min("ts_ms")).head().getLong(0) + 3L * 86400000L
    val hi = lo + 2L * 86400000L
    val pruned = ParquetLake.readManifestedPruned(spark, dir, "ts_ms", lo, hi)
    assert(pruned.collect().map(_.toString).sorted.toSeq ===
      ParquetLake.readManifested(spark, dir)
        .where(col("ts_ms").between(lo, hi))
        .collect().map(_.toString).sorted.toSeq)
    // the health report drives compaction; contracts survive it
    val flagged = ParquetLake.lakeHealth(spark, dir)
      .where(col("needs_compaction")).count()
    assert(flagged > 0) // the append fragmented partitions
    ParquetLake.compactManifested(spark, dir, targetFileBytes = 1L << 30)
    assert(ParquetLake.countManifested(spark, dir) === baseCount + goodCount)
    assert(ParquetLake.lakeHealth(spark, dir)
      .where(col("needs_compaction")).count() === 0)
    // a downstream incremental consumer sees exactly the nightly rows
    assert(ParquetLake.readIncremental(spark, dir, v1, Some(v2)).count() === goodCount)
  }
}
