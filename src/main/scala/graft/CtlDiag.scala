package graft

/** Scratch: in-JVM embarrassingly-parallel hashing throughput at
  * several thread counts — the machine ceiling measurement.
  */
object CtlDiag {
  def main(args: Array[String]): Unit = {
    Bench.cpuControl(4) // JIT warmup
    for (t <- Seq(2, 4, 8, 16, 32); _ <- 0 until 2) {
      val r = Bench.cpuControl(t)
      println(f"[ctl] threads=$t hps=${r / 1e6}%.1fM")
    }
  }
}
