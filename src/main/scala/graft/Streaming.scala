package graft

import java.util.concurrent.atomic.AtomicInteger

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** Structured-Streaming operators (SURVEY §2.8). The reference has no
  * stream processing — its incremental machinery is change detection +
  * resumable jobs (/root/reference/packages/core/spheraform_core/adapters/base.py:171-199);
  * here the same events table is processed as a bounded stream through
  * readStream → agg → memory sink, proving the plan also runs
  * incrementally (file-source streaming == Iceberg incremental read at
  * scale).
  */
object Streaming {

  private val counter = new AtomicInteger(0)

  /** The file streaming source requires a DIRECTORY — stage the single
    * events file into one (at scale the source would be an Iceberg
    * incremental read / a landing directory already).
    */
  private def stageDir(spark: SparkSession, dir: String): String = synchronized {
    val h = java.security.MessageDigest.getInstance("MD5")
      .digest(dir.getBytes("UTF-8")).map(b => f"$b%02x").mkString
    val out = s"/tmp/graft_stream_src/$h"
    if (!graft.index.IndexPaths.exists(spark, s"$out/events.parquet")) {
      val fs = graft.index.IndexPaths.fs(spark, out)
      fs.mkdirs(new org.apache.hadoop.fs.Path(out))
      org.apache.hadoop.fs.FileUtil.copy(
        fs, new org.apache.hadoop.fs.Path(s"$dir/events.parquet"),
        fs, new org.apache.hadoop.fs.Path(s"$out/events.parquet"),
        false, spark.sparkContext.hadoopConfiguration)
    }
    out
  }

  /** Aggregate events via an actual streaming query (complete mode,
    * memory sink), drained synchronously. Result is batch-identical —
    * that identity IS the correctness check (oracle: plain GROUP BY).
    */
  def streamAgg(spark: SparkSession, dir: String): DataFrame = {
    val schema = spark.read.parquet(s"$dir/events.parquet").schema
    val name = s"graft_stream_agg_${counter.incrementAndGet()}"
    val q = spark.readStream.schema(schema)
      .parquet(stageDir(spark, dir))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("user_id")).as("sum_users"))
      .writeStream.outputMode("complete")
      .format("memory").queryName(name)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination(120000L)
    spark.table(name).orderBy("event_type")
  }

  /** Open-session state carried between micro-batches. */
  case class SessionState(lastTsMs: Long, sessionId: Long, nEvents: Long)

  /** Per-user sessionization with a gap timeout, via
    * `flatMapGroupsWithState` — the KeyValueGroupedDataset
    * custom-state operator. Sessions close when the gap between
    * consecutive events (event-time order, event_id tie-break)
    * exceeds `gapMinutes`; output is one row per session
    * (user_id, session_id, n_events). State carries the open session
    * across micro-batches; the bounded AvailableNow drain ends the
    * stream, so the trailing open session is final by construction
    * and is emitted in the same invocation (a continuous deployment
    * would hold it in state and emit on an event-time timeout).
    * Batch-identical to the lag-plus-cumulative-breaks SQL oracle.
    */
  def sessionize(spark: SparkSession, dir: String,
                 gapMinutes: Int = 30): DataFrame = {
    import spark.implicits._
    import org.apache.spark.sql.streaming.{GroupStateTimeout, OutputMode, GroupState}
    val schema = spark.read.parquet(s"$dir/events.parquet").schema
    val name = s"graft_stream_sess_${counter.incrementAndGet()}"
    val gapMs = gapMinutes.toLong * 60000L
    val q = spark.readStream.schema(schema)
      .parquet(stageDir(spark, dir))
      .select(col("user_id").cast("long"),
        col("ts").cast("timestamp"), col("event_id").cast("long"))
      .as[(Long, java.sql.Timestamp, Long)]
      .groupByKey(_._1)
      .flatMapGroupsWithState(OutputMode.Append(),
        GroupStateTimeout.NoTimeout()) {
        (uid: Long, it: Iterator[(Long, java.sql.Timestamp, Long)],
         state: GroupState[SessionState]) =>
          val evs = it.toArray.sortBy(e => (e._2.getTime, e._3))
          var st = state.getOption.getOrElse(
            SessionState(Long.MinValue, 0L, 0L))
          val out = scala.collection.mutable.ArrayBuffer
            .empty[(Long, Long, Long)]
          evs.foreach { e =>
            val t = e._2.getTime
            if (st.lastTsMs == Long.MinValue || t - st.lastTsMs > gapMs) {
              if (st.nEvents > 0) { // close the previous session
                out += ((uid, st.sessionId, st.nEvents))
              }
              st = SessionState(t, st.sessionId + 1, 1L)
            } else st = st.copy(lastTsMs = t, nEvents = st.nEvents + 1)
          }
          state.update(st)
          // bounded drain: the stream ends after this batch, so the
          // open session is final — emit it too
          if (st.nEvents > 0) out += ((uid, st.sessionId, st.nEvents))
          out.iterator
      }
      .toDF("user_id", "session_id", "n_events")
      .writeStream.outputMode("append")
      .format("memory").queryName(name)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination(120000L)
    spark.table(name).orderBy("user_id", "session_id")
  }

  /** Tumbling event-time window aggregation with a watermark — the
    * canonical streaming shape; used by StreamingSpec.
    */
  def windowedCounts(spark: SparkSession, dir: String): DataFrame = {
    val schema = spark.read.parquet(s"$dir/events.parquet").schema
    val name = s"graft_stream_win_${counter.incrementAndGet()}"
    val q = spark.readStream.schema(schema)
      .parquet(stageDir(spark, dir))
      // watermarks require TIMESTAMP (tz-aware); the table is NTZ —
      // session tz is pinned UTC so the cast is value-preserving
      .withColumn("ts", col("ts").cast("timestamp"))
      .withWatermark("ts", "1 hour")
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"))
      .writeStream.outputMode("complete")
      .format("memory").queryName(name)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination(120000L)
    spark.table(name)
      .select(date_format(col("window.start"), "yyyy-MM-dd HH:mm:ss")
        .as("hr"), col("event_type"), col("n"))
      .orderBy("hr", "event_type")
  }
}
