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
}
