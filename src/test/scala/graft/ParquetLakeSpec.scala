package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.queries.events
import graft.sources.ParquetLake

/** Lake layout: partitioned write, directory-level pruning on read. */
class ParquetLakeSpec extends SparkSpec {

  private lazy val lakeDir: String = {
    val dir = Files.createTempDirectory("graft_lake").toString
    ParquetLake.writePartitioned(
      events(spark, sf).select("event_id", "user_id", "event_type", "ts_ms"),
      dir, "ts_ms", sortCols = Seq("user_id"))
    dir
  }

  test("write produces p_date=... directories") {
    val dirs = new java.io.File(lakeDir).listFiles().filter(_.isDirectory).map(_.getName)
    assert(dirs.nonEmpty)
    assert(dirs.forall(_.startsWith("p_date=")))
  }

  test("date-range read prunes partitions in the plan and keeps counts right") {
    val from = "2024-01-10"
    val to = "2024-01-12"
    val pruned = ParquetLake.readRange(spark, lakeDir, from, to)
    val plan = pruned.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters"))
    // the range predicate must be a partition filter, not a data filter
    assert(!plan.contains("PushedFilters: [IsNotNull(p_date)"))
    val expected = events(spark, sf)
      .where(to_date(timestamp_millis(col("ts_ms"))).cast("string").between(from, to))
      .count()
    assert(pruned.count() === expected)
    assert(expected > 0)
  }

  test("roundtrip preserves every row") {
    assert(spark.read.parquet(lakeDir).count() === events(spark, sf).count())
  }
}
