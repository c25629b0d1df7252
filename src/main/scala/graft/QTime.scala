package graft

import graft.query.{QuerySpec, Searcher}

/** Scratch: in-JVM repeated engine-query timing against an index dir
  * (diagnostics — JVM/session startup excluded, unlike the CLI).
  * Usage: runMain graft.QTime <indexDir> <reps> <query...>
  */
object QTime {
  def main(args: Array[String]): Unit = {
    val idx = args(0)
    val reps = args(1).toInt
    val q = args.drop(2).mkString(" ")
    val spark = Bench.session(16)
    (0 until reps).foreach { i =>
      val t0 = System.nanoTime()
      val hits = Searcher.search(spark, idx, Seq(QuerySpec(0L, q)), 10,
        Searcher.Or, numRanges = 4).collect()
      println(f"[qtime] rep $i: ${(System.nanoTime() - t0) / 1e9}%.3fs " +
        s"hits=${hits.length}")
    }
    spark.stop()
  }
}
