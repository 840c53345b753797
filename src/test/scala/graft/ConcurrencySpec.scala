package graft

/** A library session serves many queries at once: concurrent
  * execution must give the same answers as serial, with no
  * cross-query interference from operator-internal materialization
  * (localCheckpoint blocks, broadcast cleanup, AQE re-planning).
  */
class ConcurrencySpec extends SparkSpec {

  private val names = Seq(
    "d1_exact_dedup", "d2_minhash_lsh", "q1_pricing_summary",
    "t2_quality", "m3_quantize", "s1_knn_brute",
    // d9 exercises concurrent function registration + the per-call
    // uniquified bench view behind its bloom scalar subquery; d10
    // runs eager CC jobs inside query construction; q26 a multi-agg;
    // t18 a localCheckpoint dict + broadcast λ; m5 a mapPartitions
    // encoder with per-partition digest state; s6 a salted
    // checkpointed self-join
    "d9_decontaminate_bloom", "q26_retention_cohorts", "d10_semdedup",
    "t18_dsir_sample", "m5_embed_batched", "s6_knn_join")

  test("twelve queries running concurrently match their serial results") {
    import java.util.concurrent.{Callable, Executors, TimeUnit}
    val serial = names.map(n =>
      n -> SparkEntry.queries(n)(spark, sf).collect().map(_.toString).sorted.toSeq).toMap
    val pool = Executors.newFixedThreadPool(names.size)
    try {
      val futures = names.map { n =>
        n -> pool.submit(new Callable[Seq[String]] {
          override def call(): Seq[String] =
            SparkEntry.queries(n)(spark, sf).collect().map(_.toString).sorted.toSeq
        })
      }
      futures.foreach { case (n, f) =>
        assert(f.get(300, TimeUnit.SECONDS) === serial(n), s"query $n diverged under concurrency")
      }
    } finally {
      pool.shutdownNow()
      ()
    }
  }
}
