package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Partitioned-parquet lake layout: the write side of the engine.
  *
  * At 100 TB the table layout IS the query plan: date-partitioned
  * directories give free partition pruning on the time predicates
  * every log query carries (the reference's `--start-time` becomes a
  * directory-level skip, not a scan+filter), and sorting within
  * partitions clusters row groups so min/max statistics prune I/O
  * below the partition grain.
  */
object ParquetLake {

  /** Write `df` date-partitioned on `tsMsCol` (epoch millis →
    * `p_date=YYYY-MM-DD` directories), sorted within partitions by
    * `sortCols` for row-group min/max skipping.
    */
  def writePartitioned(
      df: DataFrame, path: String, tsMsCol: String, sortCols: Seq[String]): Unit =
    df.withColumn("p_date", to_date(timestamp_millis(col(tsMsCol))).cast("string"))
      .repartition(col("p_date"))
      .sortWithinPartitions(sortCols.map(col): _*)
      .write.mode("overwrite")
      .partitionBy("p_date")
      .parquet(path)

  /** Read back with an inclusive date range that prunes at the
    * directory level (shows as PartitionFilters in the plan, not a
    * post-scan Filter).
    */
  def readRange(spark: SparkSession, path: String, fromDate: String, toDate: String): DataFrame =
    spark.read.parquet(path)
      .where(col("p_date") >= fromDate && col("p_date") <= toDate)

  /** Deterministic hash-sharded training export: rows land in
    * `shard=0..k-1` directories by md5(id) % k
    * ([[graft.functions.hashShard]]) — cluster-size invariant, so an
    * export is reproducible shard-for-shard on any cluster, and a
    * downstream trainer can address shards stably. Returns the
    * per-shard manifest read back FROM THE WRITTEN FILES (truthful
    * accounting, not a parallel recompute); the t16_export_shards
    * query is the oracle-checked twin of this manifest.
    */
  def exportShards(df: DataFrame, idCol: String, path: String, k: Int): DataFrame = {
    df.withColumn("shard", graft.functions.hashShard(col(idCol), k))
      .repartition(col("shard"))
      .write.mode("overwrite").partitionBy("shard").parquet(path)
    df.sparkSession.read.parquet(path)
      // directory-inferred partition columns come back as int
      .groupBy(col("shard").cast("long").as("shard"))
      .agg(count(lit(1)).as("n_docs"))
      .orderBy("shard")
  }

  case class CompactionStat(partition: String, filesBefore: Int, filesAfter: Int)

  /** Small-file compaction — the lake maintenance op a streaming
    * ingest needs at scale: every micro-batch appends a file per
    * partition, and a 100 TB table read slows linearly with file
    * count (driver listing, per-file open cost, tiny row groups).
    * Rewrites each `p_date=` partition whose data files exceed
    * ceil(bytes / targetFileBytes) into exactly that many files,
    * optionally re-sorting (`sortCols`) to restore row-group min/max
    * clustering. Partitions are independent — on a cluster this
    * driver loop parallelizes trivially (one job per partition; jobs
    * don't overlap files). The swap is write-aside + rename, the
    * standard pre-table-format pattern: crash between delete and
    * rename loses no data (compacted copy exists under
    * `.compact_*`), though readers can briefly see both — a real
    * deployment layers a table format's atomic commit on top.
    */
  def compact(
      spark: SparkSession, path: String,
      targetFileBytes: Long = 128L << 20,
      sortCols: Seq[String] = Nil): Seq[CompactionStat] = {
    import org.apache.hadoop.fs.Path
    val root = new Path(path)
    val fs = root.getFileSystem(spark.sessionState.newHadoopConf())
    val parts = fs.listStatus(root)
      .filter(s => s.isDirectory && s.getPath.getName.startsWith("p_date="))
    parts.toSeq.sortBy(_.getPath.getName).flatMap { p =>
      val files = fs.listStatus(p.getPath)
        .filter(f => f.isFile && f.getPath.getName.startsWith("part-"))
      val bytes = files.map(_.getLen).sum
      val nOut = math.max(1, math.ceil(bytes.toDouble / targetFileBytes).toInt)
      if (files.length <= nOut) None
      else {
        val tmp = new Path(p.getPath.getParent, s".compact_${p.getPath.getName}")
        fs.delete(tmp, true)
        val part = spark.read.parquet(p.getPath.toString).repartition(nOut)
        val sorted =
          if (sortCols.isEmpty) part else part.sortWithinPartitions(sortCols.map(col): _*)
        sorted.write.mode("overwrite").parquet(tmp.toString)
        files.foreach(f => fs.delete(f.getPath, false))
        fs.listStatus(tmp)
          .filter(f => f.isFile && f.getPath.getName.startsWith("part-"))
          .foreach(f => fs.rename(f.getPath, new Path(p.getPath, f.getPath.getName)))
        fs.delete(tmp, true)
        Some(CompactionStat(p.getPath.getName, files.length, nOut))
      }
    }
  }
}
