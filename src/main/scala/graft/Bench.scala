package graft

import org.apache.spark.sql.SparkSession

import graft.data.{PagesGen, QuerySet}
import graft.index.{DocIds, IndexBuilder, IndexPaths}
import graft.query.Searcher

/** Benchmark main. Emits ONE JSON line:
  * {"metric":"total","value":N,"unit":"sec","queries":{...},"sf":...}
  * plus (unless SPARK_GRAFT_BENCH_SCALING=0) the north-rule scaling
  * evidence — the same index build at local[8] (N) and local[32] (4N)
  * on the same input, reported as docs/sec + efficiency — appended to
  * BENCH/BASELINE.md.
  */
object Bench {

  def session(cpus: Int): SparkSession = {
    val s = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName(s"graft-bench-$cpus")
      .config("spark.sql.shuffle.partitions", cpus.toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    s
  }

  private def time[T](f: => T): (T, Double) = {
    val t0 = System.nanoTime()
    val r = f
    (r, (System.nanoTime() - t0) / 1e9)
  }

  /** One full index build over freshly generated pages; returns
    * (docs/sec, buildSecs).
    */
  def buildBench(spark: SparkSession, nDocs: Long, dir: String): (Double, Double) = {
    IndexPaths.delete(spark, dir)
    // one shared input per size: all configs build from the SAME files
    val pagesDir = s"/tmp/graft_bench/pages_$nDocs"
    if (!IndexPaths.exists(spark, s"$pagesDir/_SUCCESS"))
      PagesGen.pages(spark, nDocs, partitions = 64)
        .write.mode("overwrite").parquet(pagesDir)
    import spark.implicits._
    val pages = spark.read.parquet(pagesDir).as[graft.data.PageRow]
    val (_, secs) = time {
      val docs = DocIds.fromPages(pages,
        spark.sessionState.conf.numShufflePartitions, useExtractor = true)
      IndexBuilder.build(docs, dir,
        IndexBuilder.Config(numBuckets = 32, blockSize = 128,
          numGroups = 4, saltTarget = math.max(2000L, nDocs / 20)),
        buildId = "bench", lineage = pagesDir)
    }
    (nDocs / secs, secs)
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val nDocs = sys.env.get("SPARK_GRAFT_BENCH_DOCS").map(_.toLong)
      .getOrElse(if (sfDir.contains("0.1")) 40000L
                 else if (sfDir.contains("0.01")) 10000L else 2000L)
    val doScaling = sys.env.getOrElse("SPARK_GRAFT_BENCH_SCALING", "1") == "1"

    val spark = session(cpus)
    // 1. SparkEntry operator queries at the sf dir
    val results = scala.collection.mutable.LinkedHashMap.empty[String, Double]
    SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      val (_, secs) = time {
        try fn(spark, sfDir).count()
        catch { case e: Throwable =>
          System.err.println(s"[bench] $name failed: ${e.getMessage}"); -1L }
      }
      results(name) = secs
    }

    // 2. index build throughput + query latency at the bench size
    val benchRoot = s"/tmp/graft_bench/${nDocs}"
    val (dps, buildSecs) = buildBench(spark, nDocs, s"$benchRoot/idx$cpus")
    results("index_build") = buildSecs
    val qs = QuerySet.queries()
    val latencies = qs.map { q =>
      val (_, secs) = time {
        Searcher.search(spark, s"$benchRoot/idx$cpus", Seq(q), 10,
          Searcher.Or, numRanges = 4).collect()
      }
      secs
    }.sorted
    val p50 = latencies(latencies.size / 2)
    val p95 = latencies(math.min(latencies.size - 1,
      (latencies.size * 0.95).toInt))
    results("query_p50") = p50
    results("query_p95") = p95
    spark.stop()
    org.apache.spark.sql.SparkSession.clearActiveSession()
    org.apache.spark.sql.SparkSession.clearDefaultSession()

    // 3. scaling protocol: N=8 vs 4N=32 cores, same input. Use a size
    // where compute dominates fixed job overhead — the criterion is
    // about throughput scaling, not constant costs.
    var scalingJson = ""
    if (doScaling) {
      val sDocs = math.max(nDocs, 20000L)
      val sRoot = s"/tmp/graft_bench/$sDocs"
      val s8 = session(8)
      val (dps8, secs8) = buildBench(s8, sDocs, s"$sRoot/idxN")
      s8.stop()
      org.apache.spark.sql.SparkSession.clearActiveSession()
      org.apache.spark.sql.SparkSession.clearDefaultSession()
      val s32 = session(32)
      val (dps32, secs32) = buildBench(s32, sDocs, s"$sRoot/idx4N")
      val eff = (dps32 / dps8) / 4.0
      scalingJson = f""","scaling":{"docs":$sDocs,"docs_per_sec_N8":$dps8%.1f,"docs_per_sec_4N32":$dps32%.1f,"efficiency":$eff%.3f}"""
      writeScalingReport(s32, sDocs, dps8, secs8, dps32, secs32, eff, p50, p95)
      s32.stop()
    }

    val qJson = results.map { case (k, v) => f""""$k":$v%.3f""" }
      .mkString("{", ",", "}")
    val total = results.values.filter(_ > 0).sum
    println(f"""{"metric":"total","value":$total%.3f,"unit":"sec","queries":$qJson,"sf":"$sfDir","docs_per_sec":$dps%.1f$scalingJson}""")
  }

  private def writeScalingReport(spark: SparkSession, nDocs: Long,
      dps8: Double, secs8: Double, dps32: Double, secs32: Double,
      eff: Double, p50: Double, p95: Double): Unit = {
    val md =
      f"""# BENCH — scaling evidence (north rule)
         |
         |Same index build job, same input (synthetic webtext, seed 42,
         |$nDocs docs, avgdl ≈ 275), two parallelism levels in this
         |sandbox (no real cluster): local[8] = N, local[32] = 4N.
         |
         || Config | Build secs | docs/sec |
         ||---|---|---|
         || local[8] (N) | $secs8%.1f | $dps8%.1f |
         || local[32] (4N) | $secs32%.1f | $dps32%.1f |
         |
         |Scaling efficiency (throughput_4N / throughput_N) / 4 = **$eff%.3f**
         |(target ≥ 0.8).
         |
         |Query latency over the committed query set (k=10, OR/WAND,
         |local[32]): p50 = ${p50 * 1000}%.0f ms, p95 = ${p95 * 1000}%.0f ms.
         |""".stripMargin
    IndexPaths.writeString(spark, "/root/repo/BENCH/BASELINE.md", md)
  }
}
