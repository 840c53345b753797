package graft

import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec

/** Dev utility (guide §1/§7 substitute for the disabled Spark UI):
  * run the named queries through the noop sink, then walk the FINAL
  * adaptive plan and print every node with its populated SQLMetrics —
  * the per-operator time/rows/spill evidence the UI's SQL tab would
  * show. Args: name dir [name dir ...]; SPARK_GRAFT_PROFILE_CPUS
  * overrides core count (default 32).
  */
object ProfileOne {
  private def walk(p: SparkPlan, depth: Int, sb: StringBuilder): Unit = {
    val m = p.metrics.toSeq
      .map { case (k, v) => s"$k=${v.value}" }
      .sorted.mkString(", ")
    sb.append("  " * depth).append(p.nodeName)
    if (m.nonEmpty) sb.append("  [").append(m).append("]")
    sb.append('\n')
    val kids = p match {
      case a: AdaptiveSparkPlanExec => Seq(a.executedPlan)
      case q: org.apache.spark.sql.execution.adaptive.QueryStageExec => Seq(q.plan)
      case r: org.apache.spark.sql.execution.adaptive.AQEShuffleReadExec => r.children ++ r.subqueries
      case _ => p.children ++ p.subqueries
    }
    kids.foreach(walk(_, depth + 1, sb))
  }

  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_PROFILE_CPUS", "32").toInt
    val spark = Bench.withScratchDir(GraftSession.builder(cpus)).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    args.sliding(2, 2).foreach { case Array(name, dir) =>
      // one warm pass (JIT/codegen), then the measured+profiled pass
      val passes = sys.env.getOrElse("SPARK_GRAFT_PROFILE_PASSES", "2").toInt
      var qe: org.apache.spark.sql.execution.QueryExecution = null
      var best = Double.MaxValue
      (1 to passes).foreach { _ =>
        val df = SparkEntry.queries(name)(spark, dir)
        val t0 = System.nanoTime()
        df.write.mode("overwrite").format("noop").save()
        val sec = (System.nanoTime() - t0) / 1e9
        if (sec < best) best = sec
        qe = df.queryExecution
        // executedPlan of THIS DataFrame was not the one the write ran;
        // execute it directly so its metrics populate for the dump
        qe.executedPlan.execute().foreach(_ => ())
      }
      val sb = new StringBuilder
      sb.append(f"===== PROFILE $name best=${best}%.2f s =====\n")
      walk(qe.executedPlan, 0, sb)
      println(sb.result())
    }
    spark.stop()
  }
}
