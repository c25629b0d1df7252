package graft

/** Scratch: time/explain named SparkEntry queries (diagnostics). */
object TimeQ {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val spark = Bench.session(32)
    args.drop(1).foreach { name =>
      if (sys.env.contains("TIMEQ_EXPLAIN"))
        println(SparkEntry.queries(name)(spark, sfDir)
          .queryExecution.executedPlan.toString.take(4000))
      val t0 = System.nanoTime()
      val n = SparkEntry.queries(name)(spark, sfDir).count()
      println(f"[timeq] $name: ${(System.nanoTime()-t0)/1e9}%.2fs rows=$n")
    }
    spark.stop()
  }
}
