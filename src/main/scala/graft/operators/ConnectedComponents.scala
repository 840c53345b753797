package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Connected components by iterative min-label propagation — the
  * clustering step of a near-dup pipeline: candidate pairs (edges)
  * become duplicate *clusters* (components), and a pipeline keeps one
  * representative per cluster.
  *
  * Each round every node adopts the smallest label among itself and
  * its neighbors; convergence takes at most `diameter` rounds
  * (near-dup clusters are shallow — a handful). Each round is one
  * shuffle-join + aggregate, all DataFrame ops: at 100 TB this is the
  * same iterate-to-fixpoint shape GraphX/GraphFrames use, with the
  * per-round `count()` acting as the convergence barrier. Labels are
  * re-persisted per round and lineage stays flat (each round reads
  * the previous round's materialized labels, not a growing DAG).
  *
  * For adversarial graphs (long chains) swap the propagation step for
  * alternating large-star/small-star (Kiveris et al., "Connected
  * Components in MapReduce"), which converges in O(log n) rounds —
  * same join-aggregate machinery.
  */
object ConnectedComponents {

  /** edges: (src, dst) long pairs, undirected semantics. Returns
    * (id, component) for every node appearing in an edge, where
    * component = min node id reachable.
    */
  def run(edges: DataFrame, maxIter: Int = 25): DataFrame = {
    var und = edges.select(col("src").cast("long").as("src"), col("dst").cast("long").as("dst"))
      .union(edges.select(col("dst").cast("long").as("src"), col("src").cast("long").as("dst")))
      .distinct()
      .persist(StorageLevel.MEMORY_AND_DISK)
    // small-graph fast path: near-dup edge sets are usually tiny
    // relative to the corpus; below ~100k edges the per-round shuffle
    // is pure task-scheduling overhead, so run the fixpoint in one
    // partition (the distributed path is unchanged above the cutoff)
    if (und.count() < 100000L) und = und.coalesce(1)

    // localCheckpoint (not just persist) each round: persisting caches
    // rows but the *logical plan* still compounds per iteration —
    // after ~10 rounds plan rendering alone OOMs. Checkpointing
    // truncates lineage so every round starts from a leaf relation
    // (on a cluster with a checkpoint dir, `checkpoint()` adds
    // executor-failure tolerance on top).
    var labels = und.select(col("src").as("id")).distinct()
      .withColumn("component", col("id"))
      .localCheckpoint()

    var changed = 1L
    var i = 0
    while (changed > 0 && i < maxIter) {
      val neighborMin = und
        .join(labels.withColumnRenamed("id", "src"), "src")
        .groupBy(col("dst").as("id"))
        .agg(min("component").as("nmin"))
      val proposed = labels
        .join(neighborMin, Seq("id"), "left")
        .select(
          col("id"),
          col("component").as("old"),
          least(col("component"), coalesce(col("nmin"), col("component"))).as("component"))
        .localCheckpoint()
      changed = proposed.where(col("component") < col("old")).count()
      labels = proposed.select("id", "component")
      i += 1
    }
    und.unpersist(blocking = false)
    labels
  }
}
