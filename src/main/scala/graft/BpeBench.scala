package graft

/** Dev utility: measure the BPE round-strategy trade-off and the
  * auto-crossover switch point on a real corpus.
  * Args: sfDir numMerges [crossoverFrac...]
  * Prints one line per strategy: name, seconds, (switch rank).
  */
object BpeBench {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val n = args(1).toInt
    val fracs = args.drop(2).map(_.toDouble).toSeq match {
      case Nil => Seq(0.1)
      case fs  => fs
    }
    val spark = GraftSession.builder(32).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    def time[A](f: => A): (A, Double) = {
      val t0 = System.nanoTime()
      val r = f
      (r, (System.nanoTime() - t0) / 1e9)
    }
    val (recount, tR) = time(
      operators.Bpe.learnMerges(docs, "text", n).collect().toSeq)
    println(f"BPEBENCH recount     n=$n t=$tR%.1f s")
    val (incr, tI) = time(
      operators.Bpe.learnMerges(docs, "text", n, incremental = true).collect().toSeq)
    println(f"BPEBENCH incremental n=$n t=$tI%.1f s parity=${incr == recount}")
    fracs.foreach { frac =>
      val ((df, switched), tA) = time {
        val (d, s) = operators.Bpe.learnMergesAutoWithSwitch(docs, "text", n, frac)
        (d.collect().toSeq, s)
      }
      println(f"BPEBENCH auto($frac%.2f)  n=$n t=$tA%.1f s switch=$switched parity=${df == recount}")
    }
    spark.stop()
  }
}
