package graft

import org.apache.spark.sql.SparkSession

object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.optimizer.runtime.bloomFilter.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val ordered = SparkEntry.queries.toSeq.sortBy(_._1)
    // JIT/codegen warmup: run the suite once at the smallest SF so the
    // measured pass reflects steady-state throughput, not first-call
    // class-generation cost (on a real cluster the JVMs are long-lived).
    val warmDir = {
      val d = new java.io.File(sfDir).getParentFile
      val tiny = new java.io.File(d, "sf0.001")
      if (tiny.isDirectory) tiny.getPath else sfDir
    }
    ordered.foreach { case (_, fn) =>
      try fn(spark, warmDir).write.mode("overwrite").format("noop").save()
      catch { case _: Throwable => () }
    }
    // two measured passes, min per query: scheduler/GC noise between
    // runs exceeds per-query cost at this scale, and the metric
    // claims steady-state throughput. A query that throws is tracked
    // separately — its (near-zero) time-to-failure must not make the
    // total look faster.
    val failed = scala.collection.mutable.TreeSet.empty[String]
    def once(fn: (SparkSession, String) => org.apache.spark.sql.DataFrame, name: String): Double = {
      val t0 = System.nanoTime()
      // noop sink: materializes every output column (count() would let
      // Catalyst prune the computed columns of map-only queries)
      try fn(spark, sfDir).write.mode("overwrite").format("noop").save()
      catch {
        case e: Throwable =>
          failed += name
          System.err.println(s"[bench] $name: ${e.getMessage}")
      }
      (System.nanoTime() - t0) / 1e9
    }
    val pass1 = ordered.map { case (name, fn) => name -> once(fn, name) }
    val pass2 = ordered.map { case (name, fn) => name -> once(fn, name) }.toMap
    val results = pass1.map { case (name, t1) => name -> math.min(t1, pass2(name)) }
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    // total covers succeeding queries only; failures are listed, not
    // averaged in as near-zero times
    val total = results.collect { case (n, v) if !failed(n) => v }.sum
    val failedArr = failed.map("\"" + _ + "\"").mkString("[", ",", "]")
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,""" +
      s""""n_failed":${failed.size},"failed":$failedArr,""" +
      s""""method":"min-of-2-passes-after-sf0.001-warmup","sf":"$sfDir"}""")
    spark.stop()
  }
}
