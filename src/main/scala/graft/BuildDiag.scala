package graft

import graft.data.PagesGen
import graft.index._

/** Scaling diagnosis: run the REAL build at (cpus, shufflePartitions,
  * docs) and print wall time. Not part of the driver contract.
  * usage: runMain graft.BuildDiag <cpus> <docs> [shufP]
  */
object BuildDiag {
  def main(args: Array[String]): Unit = {
    val cpus = args(0).toInt
    val nDocs = if (args.length > 1) args(1).toLong else 20000L
    val shufP = if (args.length > 2) args(2).toInt else 2 * cpus
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", shufP.toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    val pagesDir = s"/tmp/graft_bench/pages_$nDocs"
    if (!IndexPaths.exists(spark, s"$pagesDir/_SUCCESS"))
      PagesGen.pages(spark, nDocs, partitions = 64)
        .write.mode("overwrite").parquet(pagesDir)
    val outDir = s"/tmp/graft_diag/c${cpus}p$shufP"
    IndexPaths.delete(spark, outDir)
    val pages = spark.read.parquet(pagesDir).as[graft.data.PageRow]
    val reps = sys.env.getOrElse("SPARK_GRAFT_DIAG_REPS", "1").toInt
    for (r <- 0 until reps) {
      IndexPaths.delete(spark, outDir)
      val t0 = System.nanoTime()
      val docs = DocIds.fromPages(pages, shufP, useExtractor = true)
      IndexBuilder.build(docs, outDir,
        IndexBuilder.Config(numBuckets = 32, blockSize = 128,
          numGroups = sys.env.getOrElse("SPARK_GRAFT_DIAG_GROUPS","1").toInt,
          saltTarget = math.max(2000L, nDocs / 20),
          shufflePartitions = shufP),
        buildId = "diag", lineage = pagesDir)
      val secs = (System.nanoTime() - t0) / 1e9
      docs.unpersist()
      println(f"[diag cpus=$cpus shufP=$shufP docs=$nDocs rep=$r] " +
        f"build=$secs%.1fs (${nDocs / secs}%.0f docs/sec)")
    }
    spark.stop()
  }
}
