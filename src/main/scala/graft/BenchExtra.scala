package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart, SparkListenerStageCompleted, SparkListenerTaskEnd}
import org.apache.spark.sql.SparkSession

/** Scratch: per-query diagnostics for the optimization rounds — NOT
  * part of the frozen driver contract (Bench.scala is the measured
  * harness; this main exists so per-operator claims in
  * OPTIMIZATION_r*.md carry their own evidence).
  *
  * For each selected SparkEntry query it reports, via a listener:
  *   wall seconds, #jobs, #stages, #tasks, summed task time, summed
  *   JVM GC time, shuffle bytes written — enough to tell scheduling
  *   floors (many near-empty tasks) from real compute.
  *
  * It also writes `.explain("formatted")` for each query to
  * plans/<tag>/<query>_<suffix>.txt when SPARK_GRAFT_PLAN_DIR is set.
  *
  * Usage:
  *   SPARK_GRAFT_QUERIES=dedup_ngram,ex_dump_jsonl \
  *   SPARK_GRAFT_PLAN_DIR=plans/r06 SPARK_GRAFT_PLAN_SUFFIX=before \
  *   sbt "runMain graft.BenchExtra"
  */
object BenchExtra {

  final class Agg extends SparkListener {
    @volatile var jobs = 0
    @volatile var stages = 0
    @volatile var tasks = 0
    @volatile var taskTimeMs = 0L
    @volatile var gcTimeMs = 0L
    @volatile var shuffleWrite = 0L
    @volatile var input = 0L
    override def onJobStart(j: SparkListenerJobStart): Unit =
      synchronized { jobs += 1 }
    override def onJobEnd(j: SparkListenerJobEnd): Unit = ()
    override def onStageCompleted(s: SparkListenerStageCompleted): Unit =
      synchronized {
        stages += 1
        tasks += s.stageInfo.numTasks
        val m = s.stageInfo.taskMetrics
        if (m != null) {
          taskTimeMs += m.executorRunTime
          gcTimeMs += m.jvmGCTime
          shuffleWrite += m.shuffleWriteMetrics.bytesWritten
          input += m.inputMetrics.bytesRead
        }
      }
    override def onTaskEnd(t: SparkListenerTaskEnd): Unit = ()
    def reset(): Unit = synchronized {
      jobs = 0; stages = 0; tasks = 0; taskTimeMs = 0; gcTimeMs = 0
      shuffleWrite = 0; input = 0
    }
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val wanted = sys.env.get("SPARK_GRAFT_QUERIES")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSeq)
    val planDir = sys.env.get("SPARK_GRAFT_PLAN_DIR")
    val planSuffix = sys.env.getOrElse("SPARK_GRAFT_PLAN_SUFFIX", "before")
    val reps = sys.env.getOrElse("SPARK_GRAFT_EXTRA_REPS", "1").toInt

    val spark = Bench.session(cpus)
    val agg = new Agg
    spark.sparkContext.addSparkListener(agg)

    // same untimed warmups as the frozen bench
    try SparkEntry.queries("ft_doclen")(spark, sfDir).count()
    catch { case _: Throwable => () }
    try SparkEntry.queries("st_stream_agg")(spark, sfDir).count()
    catch { case _: Throwable => () }
    try EntryIndex.ensure(spark, sfDir) catch { case _: Throwable => () }
    try EntryIndex.ensureSplit(spark, sfDir) catch { case _: Throwable => () }
    try EntryIndex.ensureStream(spark, sfDir) catch { case _: Throwable => () }
    try {
      graft.pipeline.AnnIndex.ensureIvf(spark, sfDir, 16, trainIters = 2)
      graft.pipeline.AnnIndex.ensureLsh(spark, sfDir, 6, 4, 42L)
      graft.pipeline.AnnIndex.ensureIvfSplit(spark, sfDir, 16, 350L)
    } catch { case _: Throwable => () }

    val names = wanted.getOrElse(SparkEntry.queries.keys.toSeq.sorted)
    println(f"${"query"}%-20s ${"secs"}%8s ${"jobs"}%5s ${"stages"}%6s " +
      f"${"tasks"}%6s ${"taskSec"}%8s ${"gcSec"}%6s ${"shufMB"}%7s ${"inMB"}%7s")
    names.foreach { name =>
      SparkEntry.queries.get(name) match {
        case None => System.err.println(s"[extra] unknown query: $name")
        case Some(fn) =>
          (0 until math.max(1, reps)).foreach { r =>
            // fresh construction per rep — the contract queries
            // materialize internally, so construction is part of the cost
            agg.reset()
            spark.sparkContext.setJobDescription(s"extra:$name")
            val t0 = System.nanoTime()
            val df =
              try { val d = fn(spark, sfDir); d.count(); Some(d) }
              catch { case e: Throwable =>
                System.err.println(s"[extra] $name failed: ${e.getMessage}")
                None }
            val secs = (System.nanoTime() - t0) / 1e9
            spark.sparkContext.setJobDescription(null)
            // listener events drain asynchronously; give them a beat
            Thread.sleep(300L)
            println(f"$name%-20s $secs%8.2f ${agg.jobs}%5d ${agg.stages}%6d " +
              f"${agg.tasks}%6d ${agg.taskTimeMs / 1e3}%8.2f " +
              f"${agg.gcTimeMs / 1e3}%6.2f " +
              f"${agg.shuffleWrite / 1e6}%7.1f ${agg.input / 1e6}%7.1f")
            if (r == 0) (planDir, df) match {
              case (Some(pd), Some(d)) =>
                val out = d.queryExecution.explainString(
                  org.apache.spark.sql.execution.FormattedMode)
                val p = java.nio.file.Paths.get(pd)
                java.nio.file.Files.createDirectories(p)
                java.nio.file.Files.write(
                  p.resolve(s"${name}_$planSuffix.txt"),
                  out.getBytes("UTF-8"))
              case _ => ()
            }
          }
      }
    }
    spark.stop()
  }
}
