package graft

import org.apache.spark.sql.SparkSession

/** Storage-block hygiene for long-lived, many-query sessions.
  *
  * Graft operators materialize shared intermediates with
  * `localCheckpoint(eager = true)` (see the InferFiltersFromGenerate
  * and project-collapse notes in Dedup): the blocks live at
  * MEMORY_AND_DISK and are reclaimed by the ContextCleaner only when
  * the owning RDD object is garbage-collected on the driver. A driver
  * that runs many queries back-to-back without heap pressure never
  * GCs, so finished queries' checkpoint blocks pile up in storage
  * memory; once the storage pool is full, the *next* query's
  * checkpoint blocks go straight to disk and its scans fight the
  * leftovers for unified memory. That is exactly the round-3 bench
  * pathology: d6_decontaminate measured 6.8s late in the suite with
  * ~30 dead queries' blocks resident, vs 1.8s standalone.
  *
  * A real 100 TB deployment hits the same mechanism between pipeline
  * stages sharing a session — call [[freeBlocks]] at stage
  * boundaries.
  */
object BlockHygiene {

  /** Point-in-time view of the session's persisted/checkpoint blocks. */
  case class StorageSnapshot(nRdds: Int, memBytes: Long, diskBytes: Long)

  def snapshot(spark: SparkSession): StorageSnapshot = {
    val infos = spark.sparkContext.getRDDStorageInfo
    StorageSnapshot(infos.length, infos.map(_.memSize).sum, infos.map(_.diskSize).sum)
  }

  /** Drop every cached relation and persisted/checkpoint block in the
    * session. Returns the snapshot taken just before freeing (what
    * was resident).
    *
    * The direct unpersist is the whole fix for checkpoint-block
    * accumulation (the round-3 d6 pathology): blocks are freed
    * deterministically without waiting for the driver to GC the
    * owning RDD objects. `gc = true` additionally forces a full GC so
    * the ContextCleaner also reaps unreferenced broadcast/shuffle
    * state — do NOT do that between benchmarked queries: a G1 full GC
    * uncommits heap back to the OS, and the next allocation-heavy
    * query pays the re-expansion (measured ~10-20% across the suite,
    * worst on the dedup family).
    *
    * ONLY safe when no live DataFrame still depends on a checkpointed
    * relation: `localCheckpoint` truncates lineage, so a dropped
    * block cannot be recomputed. Call between independent queries or
    * pipeline stages, never mid-query.
    */
  def freeBlocks(spark: SparkSession, gc: Boolean = false): StorageSnapshot = {
    val before = snapshot(spark)
    spark.catalog.clearCache()
    spark.sparkContext.getPersistentRDDs.valuesIterator
      .foreach(_.unpersist(blocking = true))
    if (gc) System.gc()
    before
  }
}
