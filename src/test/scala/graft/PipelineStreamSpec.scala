package graft

import java.nio.file.Files

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.DataStreamWriter

import graft.operators.Dedup
import graft.sources.{CloudWatchLogs, ParquetLake}
import graft.streaming.LogStream

/** Streaming face of the training pipeline: the corpus arrives as
  * CloudWatch-payload records on a stream → st1 parse → st12
  * idempotent exactly-once sink into a lake → lk2 small-file
  * compaction → the batch dedup/split/export stages over the drained
  * lake. The gate: the streamed corpus must produce the SAME export
  * shard manifest and the same exported rows as running the batch
  * path directly on the source table — exact accounting across the
  * stream/batch boundary.
  */
class PipelineStreamSpec extends SparkSpec {

  test("stream → idempotent lake → compact → dedup/split/export matches the batch path") {
    GraftSession.ensureRegistered(spark)
    val docs = spark.read.parquet(s"$sf/documents.parquet").select("doc_id", "text")
    val total = docs.count()
    assert(total > 0)

    // the corpus as a stream of gzip'd CloudWatch payloads, ~50 docs each
    val srcDir = Files.createTempDirectory("graft_ps_src").toString
    docs.select(
        expr("doc_id div 50").as("payload"),
        struct(
          col("doc_id").cast("string").as("id"),
          col("doc_id").as("timestamp"),
          col("text").as("message"),
          map().cast("map<string,string>").as("extractedFields")).as("ev"))
      .groupBy("payload").agg(collect_list("ev").as("logEvents"))
      .select(CloudWatchLogs.encodePayload(
        lit(CloudWatchLogs.DataMessage), col("logEvents")).as("data"))
      .write.mode("overwrite").parquet(srcDir)

    // st1 parse over the stream, drained through the st12 idempotent sink
    val lakeDir = Files.createTempDirectory("graft_ps_lake").toString
    val ckpt = Files.createTempDirectory("graft_ps_ckpt").toString
    val records = spark.readStream
      .schema(spark.read.parquet(srcDir).schema).parquet(srcDir)
    val flat = LogStream.parse(records)
    val drained = LogStream.drainAvailable[Row](flat, (w: DataStreamWriter[Row]) =>
      w.foreachBatch(LogStream.idempotentBatchWriter(lakeDir))
        .option("checkpointLocation", ckpt).outputMode("append"))
    assert(drained, "stream did not drain to completion")

    // lk2 compaction over the batch_id= partitions the sink produced
    def lakeFiles(): Int = new java.io.File(lakeDir).listFiles()
      .filter(d => d.isDirectory && d.getName.startsWith("batch_id="))
      .map(_.listFiles().count(_.getName.startsWith("part-"))).sum
    val before = lakeFiles()
    ParquetLake.compact(
      spark, lakeDir, targetFileBytes = 1L << 30, partitionPrefix = "batch_id=")
    assert(lakeFiles() <= before)

    // exact accounting across the boundary: every doc, exactly once
    val streamed = spark.read.parquet(lakeDir)
      .select(col("log_id").cast("long").as("doc_id"), col("message").as("text"))
    assert(streamed.count() === total)

    // identical downstream pipeline on both corpora
    def export(corpus: DataFrame): (Map[Long, Long], Seq[String]) = {
      val keep = Dedup.exact(corpus, "text", "doc_id")
        .select(col("keep_id").as("doc_id"))
      val deduped = corpus.join(keep, "doc_id")
      val bucket = conv(substring(md5(col("doc_id").cast("string")), 1, 7), 16, 10)
        .cast("long") % 100
      val train = deduped.where(bucket < 80)
      val dir = Files.createTempDirectory("graft_ps_export").toString
      val manifest = ParquetLake.exportShards(train, "doc_id", dir, 4)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      val rows = spark.read.parquet(dir)
        .select(col("doc_id"), col("text"), col("shard").cast("long"))
        .collect().map(_.toString).sorted.toSeq
      (manifest, rows)
    }
    val (streamManifest, streamRows) = export(streamed)
    val (batchManifest, batchRows) = export(docs)
    assert(streamManifest === batchManifest)
    assert(streamRows === batchRows)
    assert(streamManifest.values.sum > 0)
  }
}
