package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

class StreamingSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  val dir = "/root/testdata/sf0.001"

  test("streaming agg == batch agg (exactly-once over bounded input)") {
    val streamed = Streaming.streamAgg(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).sorted
    val batch = spark.read.parquet(s"$dir/events.parquet")
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("user_id")).as("sum_users"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
      .sorted
    assert(streamed.toSeq == batch.toSeq && streamed.nonEmpty)
  }

  test("sessionize across micro-batches: no duplicates, == batch sessions") {
    import spark.implicits._
    // three time-ordered files → three micro-batches under
    // maxFilesPerTrigger=1. Sessions deliberately SPAN file boundaries
    // (the round-2 bug emitted those twice: once partial, once full)
    // and others end mid-stream so the event-time timeout fires.
    val gapMin = 30
    val base = 1700000000000L
    def ev(uid: Long, minute: Long, eid: Long) =
      (uid, new java.sql.Timestamp(base + minute * 60000L), eid)
    val batches = Seq(
      // file 0: minutes 0-59
      Seq(ev(1, 0, 1), ev(1, 10, 2), ev(1, 55, 3),
        ev(2, 5, 4), ev(2, 20, 5),
        ev(3, 50, 6)),
      // file 1: minutes 60-119; u1's m55→m70 gap=15 CONTINUES the
      // session across the batch boundary; u2 idle >30m → timeout
      // mid-stream; u3 m50→m100 gap=50 → new session
      Seq(ev(1, 70, 7), ev(1, 80, 8),
        ev(3, 100, 9), ev(3, 110, 10)),
      // file 2: minutes 120-179; u1 gap>30 → new trailing session,
      // u2 reappears after its timeout-closed session. u4's event is
      // BACKDATED (m95 < file 1's max m110) but within the watermark
      // slack — out-of-order arrival, normal for a landing directory;
      // the old hardcoded 0-second watermark silently dropped it
      Seq(ev(1, 150, 11),
        ev(2, 160, 12), ev(2, 170, 13),
        ev(4, 95, 14)))
    val srcDir = SparkTestSession.tmpDir("graft_sess_mb")
    batches.zipWithIndex.foreach { case (evs, i) =>
      evs.toDF("user_id", "ts", "event_id").coalesce(1)
        .write.parquet(s"$srcDir/f$i")
    }
    // flatten the per-batch subdirs into one source dir of 3 files
    val fs = graft.index.IndexPaths.fs(spark, srcDir)
    val flat = SparkTestSession.tmpDir("graft_sess_mb_flat")
    fs.mkdirs(new org.apache.hadoop.fs.Path(flat))
    (0 until 3).foreach { i =>
      val part = fs.globStatus(
        new org.apache.hadoop.fs.Path(s"$srcDir/f$i/part-*.parquet")).head
      fs.rename(part.getPath,
        new org.apache.hadoop.fs.Path(s"$flat/b$i.parquet"))
    }
    val got = Streaming.sessionize(spark, dir = "unused",
      gapMinutes = gapMin, maxFilesPerTrigger = 1,
      srcOverride = Some(flat)).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    // no duplicate (user, session) — the round-2 failure mode
    assert(got.map(x => (x._1, x._2)).distinct.size == got.size,
      s"duplicate session rows: $got")
    // expected sessions from a plain batch pass
    val all = batches.flatten.sortBy(e => (e._1, e._2.getTime, e._3))
    val want = all.groupBy(_._1).toSeq.flatMap { case (uid, evs) =>
      val sorted = evs.sortBy(e => (e._2.getTime, e._3))
      var sid = 0L; var n = 0L; var last = Long.MinValue
      val out = scala.collection.mutable.ArrayBuffer.empty[(Long, Long, Long)]
      sorted.foreach { e =>
        val t = e._2.getTime
        if (last == Long.MinValue || t - last > gapMin * 60000L) {
          if (n > 0) out += ((uid, sid, n))
          sid += 1; n = 1
        } else n += 1
        last = t
      }
      if (n > 0) out += ((uid, sid, n))
      out
    }.sortBy(x => (x._1, x._2))
    assert(got.sortBy(x => (x._1, x._2)) == want, s"got=$got want=$want")
  }

  test("sessionize no-retraction rule: a bridging late arrival opens a later session") {
    import spark.implicits._
    // u9: m0 and m40 in batch 1 (gap 40 > 30 closes+emits {m0}), then
    // a backdated m29 in batch 2 — inside the watermark slack
    // (watermark = 40 − 30 = m10), so it is NOT dropped. Batch
    // recomputation over {0, 29, 40} would merge everything into ONE
    // session of 3; append-mode streaming cannot retract the emitted
    // {m0}, so the arrival extends the open session instead. This
    // pins the DOCUMENTED divergence (emitted sessions are final);
    // losing the event entirely (the old 0-second watermark) is the
    // failure mode this guards against.
    val base = 1700000000000L
    def ev(minute: Long, eid: Long) =
      (9L, new java.sql.Timestamp(base + minute * 60000L), eid)
    val srcDir = SparkTestSession.tmpDir("graft_sess_late")
    Seq(Seq(ev(0, 1), ev(40, 2)), Seq(ev(29, 3))).zipWithIndex.foreach {
      case (evs, i) =>
        evs.toDF("user_id", "ts", "event_id").coalesce(1)
          .write.parquet(s"$srcDir/f$i")
    }
    val fs = graft.index.IndexPaths.fs(spark, srcDir)
    val flat = SparkTestSession.tmpDir("graft_sess_late_flat")
    fs.mkdirs(new org.apache.hadoop.fs.Path(flat))
    (0 until 2).foreach { i =>
      val part = fs.globStatus(
        new org.apache.hadoop.fs.Path(s"$srcDir/f$i/part-*.parquet")).head
      fs.rename(part.getPath,
        new org.apache.hadoop.fs.Path(s"$flat/b$i.parquet"))
    }
    val got = Streaming.sessionize(spark, dir = "unused",
      gapMinutes = 30, maxFilesPerTrigger = 1,
      srcOverride = Some(flat)).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
      .sortBy(_._2)
    assert(got == Seq((9L, 1L, 1L), (9L, 2L, 2L)),
      s"late bridging arrival mishandled: $got")
  }

  test("windowed streaming counts == batch window agg") {
    val streamed = Streaming.windowedCounts(spark, dir).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2))).sorted
    val batch = spark.read.parquet(s"$dir/events.parquet")
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"))
      .select(date_format(col("window.start"), "yyyy-MM-dd HH:mm:ss"),
        col("event_type"), col("n"))
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2)))
      .sorted
    assert(streamed.toSeq == batch.toSeq && streamed.nonEmpty)
  }
}
