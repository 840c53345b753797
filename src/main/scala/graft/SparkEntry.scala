package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.queries._

/** Driver contract — see /root/repo/SURVEY.md §2 (inventory) and §7. */
object SparkEntry {
  /** Flagship: the reference's full read pipeline (gunzip → parse →
    * DATA_MESSAGE filter → flatten), roundtripped over sf0.001 events.
    */
  def entry(spark: SparkSession): DataFrame =
    ReferenceQueries.r1CwlParse(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    ReferenceQueries.queries ++
      AnalyticsQueries.queries ++
      DedupQueries.queries ++
      TextQueries.queries ++
      SimilarityQueries.queries ++
      MultimodalQueries.queries

  /** DuckDB-runnable oracle SQL for each hash-verifiable query. */
  def oracleSql: Map[String, String] =
    ReferenceQueries.oracleSql ++
      AnalyticsQueries.oracleSql ++
      DedupQueries.oracleSql ++
      TextQueries.oracleSql ++
      SimilarityQueries.oracleSql ++
      MultimodalQueries.oracleSql
}
