package graft

import graft.index.IndexPaths

/** Scratch: session-restart cost + pair scaling measurement.
  * usage: runMain graft.ScalingDiag <docs> <cpusA> <cpusB>
  */
object ScalingDiag {
  def main(args: Array[String]): Unit = {
    val docs = args(0).toLong
    val a = args(1).toInt
    val b = args(2).toInt
    def fresh(cpus: Int): org.apache.spark.sql.SparkSession = {
      org.apache.spark.sql.SparkSession.clearActiveSession()
      org.apache.spark.sql.SparkSession.clearDefaultSession()
      Bench.session(cpus)
    }
    // JVM warmup: small build
    var s = fresh(b)
    Bench.buildBench(s, 15000L, "/tmp/graft_sdiag/warm")
    s.stop()
    for (cpus <- Seq(a, b); rep <- 0 until 2) {
      s = fresh(cpus)
      val (dps, secs) = Bench.buildBench(s, docs, s"/tmp/graft_sdiag/i$cpus$rep")
      println(f"[sdiag] cpus=$cpus rep=$rep secs=$secs%.1f dps=$dps%.0f")
      s.stop()
    }
  }
}
