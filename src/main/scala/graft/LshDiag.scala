package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart, SparkListenerStageCompleted}
import scala.collection.mutable

/** Scratch: per-job task breakdown for one SparkEntry query — which
  * jobs carry the task count (scan? shuffle? listing?). NOT part of
  * the frozen driver contract; delete-safe.
  */
object LshDiag {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val qnames = sys.env.getOrElse("SPARK_GRAFT_QUERY", "sim_lsh_ann")
      .split(",").map(_.trim).filter(_.nonEmpty)
    val reps = sys.env.getOrElse("SPARK_GRAFT_EXTRA_REPS", "2").toInt
    val spark = Bench.session(32)
    val jobs = mutable.LinkedHashMap.empty[Int, (String, Int, Long)]
    val stageToJob = mutable.HashMap.empty[Int, Int]
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit = synchronized {
        val desc = Option(j.properties)
          .flatMap(p => Option(p.getProperty("spark.job.description")))
          .orElse(j.stageInfos.lastOption.map(_.name)).getOrElse("?")
        jobs(j.jobId) = (desc.take(90), 0, 0L)
        j.stageIds.foreach(s => stageToJob(s) = j.jobId)
      }
      override def onStageCompleted(s: SparkListenerStageCompleted): Unit =
        synchronized {
          stageToJob.get(s.stageInfo.stageId).foreach { jid =>
            val (d, t, ms) = jobs(jid)
            val m = s.stageInfo.taskMetrics
            jobs(jid) = (d + " | " + s.stageInfo.name.take(60),
              t + s.stageInfo.numTasks,
              ms + (if (m != null) m.executorRunTime else 0L))
          }
        }
    })
    try SparkEntry.queries("ft_doclen")(spark, sfDir).count()
    catch { case _: Throwable => () }
    qnames.foreach { qname =>
      val fn = SparkEntry.queries(qname)
      (0 until reps).foreach { r =>
        jobs.clear(); stageToJob.clear()
        val t0 = System.nanoTime()
        fn(spark, sfDir).count()
        val secs = (System.nanoTime() - t0) / 1e9
        Thread.sleep(400L)
        println(f"== rep $r: $qname $secs%.2f s, ${jobs.size} jobs")
        jobs.foreach { case (jid, (desc, tasks, ms)) =>
          println(f"  job $jid%3d tasks=$tasks%4d taskMs=$ms%6d  $desc")
        }
      }
    }
    spark.stop()
  }
}
