package graft

import org.apache.spark.sql.SparkSession

import org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain
import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate

import graft.functions.{CosineSimilarity, DotProduct, GunzipBytes, GzipBytes, SimHash64, UnzstdBytes, ZstdBytes}

/** Session bootstrap for the graft engine.
  *
  * Registers graft's native Catalyst expressions in the session's
  * function registry so operators can use them via `call_function`
  * (and users via SQL). Idempotent; every public operator calls
  * [[ensureRegistered]] so a plain driver-created SparkSession works.
  */
object GraftSession {
  def ensureRegistered(spark: SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    reg.createOrReplaceTempFunction(
      "graft_gzip", es => GzipBytes(es.head), "built-in")
    reg.createOrReplaceTempFunction(
      "graft_gunzip", es => GunzipBytes(es.head), "built-in")
    reg.createOrReplaceTempFunction(
      "graft_zstd", es => ZstdBytes(es.head), "built-in")
    reg.createOrReplaceTempFunction(
      "graft_unzstd", es => UnzstdBytes(es.head), "built-in")
    reg.createOrReplaceTempFunction(
      "graft_cosine", es => CosineSimilarity(es(0), es(1)), "built-in")
    reg.createOrReplaceTempFunction(
      "graft_dot", es => DotProduct(es(0), es(1)), "built-in")
    reg.createOrReplaceTempFunction(
      "graft_simhash64", es => SimHash64(es.head), "built-in")
    // Spark's runtime-filter bloom expressions are not in the public
    // registry; expose them for explicit bloom prefilters (d9). The
    // agg takes xxhash64(value) longs; might_contain probes the
    // serialized sketch with the same hash.
    reg.createOrReplaceTempFunction(
      "graft_bloom_agg", {
        case Seq(child) => new BloomFilterAggregate(child)
        case Seq(child, n) => new BloomFilterAggregate(child, n)
        case es => new BloomFilterAggregate(es(0), es(1), es(2))
      }, "built-in")
    reg.createOrReplaceTempFunction(
      "graft_might_contain", es => BloomFilterMightContain(es(0), es(1)), "built-in")
  }

  /** Local-mode builder with scale-appropriate defaults (AQE on,
    * shuffle partitions sized to cores, UTC).
    */
  def builder(cores: Int = Runtime.getRuntime.availableProcessors()): SparkSession.Builder =
    SparkSession.builder()
      .master(s"local[$cores]")
      .config("spark.sql.shuffle.partitions", cores.toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      // runtime bloom-filter pushdown: shuffle-join probe sides get a
      // bloom filter built from the build side's join keys, pruning
      // fact rows before the shuffle — free selectivity at 100 TB
      .config("spark.sql.optimizer.runtime.bloomFilter.enabled", "true")
      // a long-lived many-query session generates more codegen units
      // than the default 100-entry class cache holds; evictions mean
      // multi-second Janino recompiles of the biggest pipelines
      .config("spark.sql.codegen.cache.maxEntries", "2000")
      // ObjectHashAggregate (every TypedImperativeAggregate: graft_topk,
      // approx sketches) falls back to SORT-based aggregation once a
      // partition sees this many distinct keys — default 128, which
      // made the kNN join's partial top-k SORT its 130M scored rows
      // (8 GB spill per pass, measured at sf1) instead of folding
      // them into 20k bounded heaps. graft's object agg buffers are
      // all size-bounded (k-entry heaps, fixed-size sketches), so a
      // large hash map of them is safe; raise the fallback far above
      // any realistic per-partition group count.
      .config("spark.sql.objectHashAggregate.sortBased.fallbackThreshold", "10000000")
      .config("spark.ui.enabled", "false")
}
