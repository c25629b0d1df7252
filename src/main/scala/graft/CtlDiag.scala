package graft

/** Scratch: machine ceiling controls at several thread counts —
  * cache-resident hashing (pure CPU) vs memory-streaming sum (DRAM
  * bandwidth). A Spark build streams GBs through memory; the
  * bandwidth control is the honest ceiling for it.
  */
object CtlDiag {
  def memControl(threads: Int): Double = {
    val words = 64 * 1024 * 1024 // 512 MB per thread
    val arrays = (0 until threads).map { _ =>
      val a = new Array[Long](words)
      var i = 0
      while (i < words) { a(i) = i; i += 1 }
      a
    }
    val t0 = System.nanoTime()
    val ts = arrays.map { a =>
      new Thread(new Runnable {
        def run(): Unit = {
          var acc = 0L
          var rep = 0
          while (rep < 4) {
            var i = 0
            while (i < a.length) { acc += a(i); i += 1 }
            rep += 1
          }
          if (acc == 42L) println("")
        }
      })
    }
    ts.foreach(_.start()); ts.foreach(_.join())
    threads.toDouble * words * 4 * 8 / ((System.nanoTime() - t0) / 1e9) / 1e9
  }

  def main(args: Array[String]): Unit = {
    Bench.cpuControl(4); memControl(2) // warmup
    for (t <- Seq(2, 4, 8, 16)) {
      val cpu = Bench.cpuControl(t)
      val mem = memControl(t)
      println(f"[ctl] threads=$t cpu=${cpu / 1e6}%.0fM hashes/s mem=$mem%.1f GB/s")
    }
  }
}
