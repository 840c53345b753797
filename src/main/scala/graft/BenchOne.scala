package graft

/** Dev utility: time individual queries. Args: name dir [name dir ...] */
object BenchOne {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.builder(32).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    args.sliding(2, 2).foreach { case Array(name, dir) =>
      val t0 = System.nanoTime()
      val df = SparkEntry.queries(name)(spark, dir)
      df.write.mode("overwrite").format("noop").save()
      println(f"BENCHONE $name t=${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    spark.stop()
  }
}
