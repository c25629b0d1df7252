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
    *
    * The cache key fingerprints the source CONTENT (name/len/mtime,
    * the EntryIndex rule: a changed table must never silently reuse a
    * stale copy — keying on the path alone would stream old data
    * against a fresh oracle), and the copy goes through a tmp name +
    * rename so a crash mid-copy can never leave a truncated file that
    * passes the exists check forever.
    */
  private def stageDir(spark: SparkSession, dir: String): String = synchronized {
    val srcPath = new org.apache.hadoop.fs.Path(s"$dir/events.parquet")
    val sfs = graft.index.IndexPaths.fs(spark, dir)
    val h = graft.index.IndexPaths.contentTag(spark, srcPath.toString)
    val out = s"/tmp/graft_stream_src/$h"
    // stale-key sweep (the retired-cache rule): copies whose staged
    // file is old belong to retired keys or regenerated sources and
    // can never be read again — age-based, so concurrently-staged
    // OTHER tables (different sf dirs in one session) are untouched
    val root = new org.apache.hadoop.fs.Path("/tmp/graft_stream_src")
    val rfs = graft.index.IndexPaths.fs(spark, root.toString)
    if (rfs.exists(root)) {
      val now = System.currentTimeMillis()
      rfs.listStatus(root)
        .filter(s => s.getPath.getName != h &&
          now - s.getModificationTime > 6L * 3600 * 1000)
        .foreach(s => rfs.delete(s.getPath, true))
    }
    val fin = new org.apache.hadoop.fs.Path(s"$out/events.parquet")
    if (!graft.index.IndexPaths.exists(spark, fin.toString)) {
      val fs = graft.index.IndexPaths.fs(spark, out)
      fs.mkdirs(new org.apache.hadoop.fs.Path(out))
      val tmp = new org.apache.hadoop.fs.Path(
        s"$out/.events.parquet.tmp")
      fs.delete(tmp, true)
      org.apache.hadoop.fs.FileUtil.copy(sfs, srcPath, fs, tmp,
        false, spark.sparkContext.hadoopConfiguration)
      if (!fs.rename(tmp, fin) && !fs.exists(fin))
        throw new java.io.IOException(s"staging commit failed: $fin")
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
    // Stateful streaming fixes its state-store count to the shuffle
    // setting at query start (the sessionize rule): the aggregation
    // state here is one row per event_type — session-width state
    // stores are pure per-batch commit overhead. Scoped to query
    // construction + the synchronous drain; restored after. (At real
    // scale this knob belongs to the deployment, sized to state
    // bytes/executor.)
    val prevShuffle = spark.conf.get("spark.sql.shuffle.partitions")
    val q =
      try {
        spark.conf.set("spark.sql.shuffle.partitions",
          sys.env.getOrElse("GRAFT_SESS_SHUFFLE", "4"))
        val q0 = spark.readStream.schema(schema)
          .parquet(stageDir(spark, dir))
          .groupBy(col("event_type"))
          .agg(count(lit(1)).as("n"), sum(col("user_id")).as("sum_users"))
          .writeStream.outputMode("complete")
          .format("memory").queryName(name)
          .trigger(Trigger.AvailableNow())
          .start()
        // a timed-out drain must FAIL, not silently serve the
        // half-populated memory sink as if it were the final answer
        require(q0.awaitTermination(120000L), "streamAgg drain timed out")
        q0
      } finally spark.conf.set("spark.sql.shuffle.partitions", prevShuffle)
    spark.table(name).orderBy("event_type")
  }

  /** Open-session state carried between micro-batches. */
  case class SessionState(lastTsMs: Long, sessionId: Long, nEvents: Long)

  /** Per-user sessionization with a gap timeout, via
    * `flatMapGroupsWithState` + `EventTimeTimeout` — deployable
    * continuously, correct across micro-batches. Sessions close when
    * the gap between consecutive events (event-time order, event_id
    * tie-break) exceeds `gapMinutes`; output is one row per session
    * (user_id, session_id, n_events).
    *
    * Multi-batch correctness (the round-2 version emitted the open
    * session EVERY batch while also keeping it in state — duplicate
    * rows as soon as the source split into several micro-batches):
    *  - a batch emits only sessions CLOSED by a later event inside it;
    *  - an open session stays solely in state, with an event-time
    *    timeout at lastTs + gap: when the watermark passes that point
    *    no future event can extend the session (anything older is
    *    dropped as late), so the timeout callback emits it exactly
    *    once and zeroes the open state — the per-user session counter
    *    is retained so later sessions keep monotone ids;
    *  - sessions still open when the bounded drain ends (their
    *    timeout is beyond the final watermark by construction) are
    *    recovered by reading the state store after termination — the
    *    "final flush" — so the result is batch-identical to the SQL
    *    lag-plus-cumulative-breaks oracle.
    *
    * `maxFilesPerTrigger` > 0 forces multi-batch processing (the spec
    * uses it to prove the no-duplicate invariant); 0 = drain freely.
    */
  def sessionize(spark: SparkSession, dir: String,
                 gapMinutes: Int = 30,
                 maxFilesPerTrigger: Int = 0,
                 srcOverride: Option[String] = None,
                 watermarkDelay: Option[String] = None): DataFrame = {
    import spark.implicits._
    import org.apache.spark.sql.streaming.{GroupStateTimeout, OutputMode, GroupState}
    val srcDir = srcOverride.getOrElse(stageDir(spark, dir))
    val schema = spark.read.parquet(srcDir).schema
    // Watermark slack for out-of-order ARRIVAL (a landing directory's
    // files are rarely in strict event-time order): an event in a
    // later micro-batch at or below (max seen − delay) is dropped as
    // late by FlatMapGroupsWithStateExec — with the old hardcoded
    // "0 seconds" ANY backdated arrival was silently lost. Default
    // slack = the session gap. Honest limit of append-mode
    // sessionization: an emitted session is FINAL — a backdated
    // arrival inside the slack is never lost, but if it lands in a
    // gap whose session was already closed and emitted by an
    // in-batch successor event, it extends/opens a LATER session
    // instead of retroactively merging the closed one (batch
    // recomputation over the same events would merge). Larger slack
    // narrows the drop window, not the no-retraction rule.
    val wmDelay = watermarkDelay.getOrElse(s"$gapMinutes minutes")
    val name = s"graft_stream_sess_${counter.incrementAndGet()}"
    // per-run checkpoint (memory sink cannot recover from a previous
    // JVM's checkpoint); nanoTime disambiguates across processes
    val ckpt = s"/tmp/graft_stream_ckpt/${name}_${System.nanoTime()}"
    // Stateful streaming fixes its state-store count to the shuffle
    // partition setting at query start; 32 stores × (data batch +
    // no-data timeout batch + commit each) is pure fixed overhead at
    // this key cardinality. 4 is plenty wide for the state volume
    // (measured: 8 → 4 shaves ~0.4s/run at sf0.1 with identical
    // output) — restore the session setting afterwards. (At real
    // scale this knob belongs to the deployment, sized to state
    // bytes / executor.)
    val prevShuffle = spark.conf.get("spark.sql.shuffle.partitions")
    val gapMs = gapMinutes.toLong * 60000L
    // the try/finally must cover query CONSTRUCTION too — an analysis
    // or start() failure would otherwise leave the whole session pinned
    // to 8 shuffle partitions for every later query
    try {
    spark.conf.set("spark.sql.shuffle.partitions",
      sys.env.getOrElse("GRAFT_SESS_SHUFFLE", "4"))
    val reader0 = spark.readStream.schema(schema)
    val reader =
      if (maxFilesPerTrigger > 0)
        reader0.option("maxFilesPerTrigger", maxFilesPerTrigger)
      else reader0
    val q = reader
      .parquet(srcDir)
      .select(col("user_id").cast("long"),
        col("ts").cast("timestamp").as("ts"), col("event_id").cast("long"))
      .withWatermark("ts", wmDelay)
      .as[(Long, java.sql.Timestamp, Long)]
      .groupByKey(_._1)
      .flatMapGroupsWithState(OutputMode.Append(),
        GroupStateTimeout.EventTimeTimeout()) {
        (uid: Long, it: Iterator[(Long, java.sql.Timestamp, Long)],
         state: GroupState[SessionState]) =>
          if (state.hasTimedOut) {
            // watermark passed lastTs + gap: the open session is final.
            // Keep the id counter in state (zeroed session) so later
            // sessions of this user continue monotone numbering.
            val st = state.get
            state.update(SessionState(Long.MinValue, st.sessionId, 0L))
            if (st.nEvents > 0) Iterator.single((uid, st.sessionId, st.nEvents))
            else Iterator.empty
          } else {
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
              } else st = st.copy(lastTsMs = math.max(st.lastTsMs, t),
                nEvents = st.nEvents + 1)
            }
            state.update(st)
            if (st.nEvents > 0)
              // must be strictly beyond the current watermark; an old
              // straggler session whose natural timeout already passed
              // fires on the next batch boundary
              state.setTimeoutTimestamp(math.max(st.lastTsMs + gapMs,
                state.getCurrentWatermarkMs() + 1))
            out.iterator
          }
      }
      .toDF("user_id", "session_id", "n_events")
      .writeStream.outputMode("append")
      .format("memory").queryName(name)
      .option("checkpointLocation", ckpt)
      .trigger(Trigger.AvailableNow())
      .start()
    require(q.awaitTermination(120000L), "sessionize drain timed out")
    } finally spark.conf.set("spark.sql.shuffle.partitions", prevShuffle)
    // final flush: sessions still open at end-of-stream live only in
    // the state store (their event-time timeout never fired — the
    // final watermark is max event time, which is < lastTs + gap).
    // The state source reads them without a custom side channel.
    val open = spark.read.format("statestore").load(ckpt)
      // state source schema: key = struct(grouping key), value =
      // struct(groupState: SessionState, timeoutTimestamp)
      .select(col("key").getField("value").cast("long").as("user_id"),
        col("value").getField("groupState").getField("sessionId")
          .cast("long").as("session_id"),
        col("value").getField("groupState").getField("nEvents")
          .cast("long").as("n_events"))
      .filter(col("n_events") > 0)
    val merged = spark.table(name).unionByName(open)
    // DISTRIBUTED final flush (retires the round-3/4 watch item): the
    // union of the sink table and the state-source read writes
    // straight to a parquet sink — closed AND still-open sessions
    // reach durable storage without a driver collect. (The memory
    // sink itself is driver-held by construction in this local
    // harness; a deployment writes the stream to a real sink and the
    // state-source flush below is the only extra job.) Per-run sink
    // dirs are swept by age, like the staging cache.
    val outRoot = "/tmp/graft_stream_sess_out"
    val rfs = graft.index.IndexPaths.fs(spark, outRoot)
    val rootP = new org.apache.hadoop.fs.Path(outRoot)
    if (rfs.exists(rootP)) {
      val now = System.currentTimeMillis()
      rfs.listStatus(rootP)
        .filter(s => now - s.getModificationTime > 6L * 3600 * 1000)
        .foreach(s => rfs.delete(s.getPath, true))
    }
    val outDir = s"$outRoot/${name}_${System.nanoTime()}"
    merged.write.mode("overwrite").parquet(outDir)
    spark.catalog.dropTempView(name)
    graft.index.IndexPaths.delete(spark, ckpt)
    spark.read.parquet(outDir).orderBy("user_id", "session_id")
  }

  // ---------------------------------------------------------- indexing

  private def genDirFor(indexRoot: String, bid: Long): String =
    f"$indexRoot/gen$bid%05d"

  /** Committed index generations under `indexRoot`, in batch order —
    * dirs named gen<NNNNN> whose build COMPLETED. stats.json presence
    * alone is NOT the commit marker: multi-group builds write it
    * BEFORE the segments group loop, so a crash mid-groups would leave
    * a generation that lists as committed with missing posting buckets
    * (searchMulti would silently drop their postings — wrong top-k, no
    * error). A generation counts as committed only when every expected
    * segments-group checkpoint is COMPLETE — the EntryIndex.ensure
    * rule, derived here from the layout knobs the build bakes into
    * every checkpoint's lineage.
    */
  def listGenerations(spark: SparkSession, indexRoot: String): Seq[String] = {
    val p = new org.apache.hadoop.fs.Path(indexRoot)
    val fs = graft.index.IndexPaths.fs(spark, indexRoot)
    if (!fs.exists(p)) return Seq.empty
    fs.listStatus(p).map(_.getPath)
      .filter(_.getName.matches("gen\\d+"))
      .map(_.toString)
      .filter(g => isCommittedGen(spark, g))
      // numeric order: a string sort would misplace gen100000 before
      // gen99999 once batch ids outgrow the zero-padding
      .sortBy(genIdOf).toSeq
  }

  /** True iff `dir` holds a COMPLETED build: stats sidecar present and
    * all segments bucket-group checkpoints committed. The expected
    * group count comes from the `;b=<buckets>;g=<groups>` knobs in the
    * checkpoint lineage (groups whose bucket range is empty never
    * commit — mirror IndexBuilder's loop bounds exactly). Checkpoints
    * without the knobs (foreign layout) fall back to stats-presence.
    */
  private def isCommittedGen(spark: SparkSession, dir: String): Boolean = {
    if (!graft.index.IndexPaths.exists(spark, s"$dir/stats.json"))
      return false
    val segs = new graft.index.CheckpointStore(spark, dir).list()
      .filter(c => c.stage == "segments" && c.status == "COMPLETE")
    if (segs.isEmpty) return false
    def knob(key: String): Option[Int] =
      s";$key=(\\d+)".r.findFirstMatchIn(segs.head.lineage)
        .map(_.group(1).toInt)
    (knob("g"), knob("b")) match {
      case (Some(g), Some(b)) if g > 0 && b > 0 =>
        val bpg = math.max(1, math.ceil(b.toDouble / g).toInt)
        val expected =
          (0 until g).count(gi => gi * bpg < math.min(b, gi * bpg + bpg))
        segs.map(_.unit).distinct.size >= expected
      case _ => true
    }
  }

  private def genIdOf(dir: String): Long =
    dir.split('/').last.stripPrefix("gen").toLong

  /** Shared scaffolding for the continuous-indexing surfaces: a
    * file-source stream over `srcDir`, drained with AvailableNow, each
    * micro-batch handed to `handle(batch, batchId)`. The stream
    * checkpoint (under the index root) makes ingestion EXACTLY-ONCE
    * across restarts: committed batches never replay; the one
    * uncommitted batch replays with the SAME files and `handle` must
    * be idempotent for it (both callers are — a generation dir is
    * keyed by batchId and deterministically rebuilt). Re-running after
    * new files land in `srcDir` indexes only the new files — the
    * harvest loop as a restartable stream.
    */
  private def runIndexStream(spark: SparkSession, srcDir: String,
                             indexRoot: String, maxFilesPerTrigger: Int)
                            (handle: (DataFrame, Long) => Unit): Seq[String] = {
    val schema = spark.read.parquet(srcDir).schema
    val q = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", math.max(1, maxFilesPerTrigger))
      .parquet(srcDir)
      .writeStream
      .foreachBatch { (batch: DataFrame, bid: Long) =>
        if (!batch.isEmpty) handle(batch, bid)
        ()
      }
      .option("checkpointLocation", s"$indexRoot/_stream_ckpt")
      .trigger(Trigger.AvailableNow())
      .start()
    // unbounded wait BY DESIGN: a deep landing-dir backlog is many
    // builds long (a wall bound here would abort a healthy 100 TB
    // drain mid-stream); build failures still propagate as
    // StreamingQueryException, and a killed drain resumes from the
    // checkpoint
    q.awaitTermination()
    listGenerations(spark, indexRoot)
  }

  /** CONTINUOUS INDEXING over a landing directory of page files — the
    * reference's harvest→index loop run as one restartable Structured
    * Streaming job (ancestor: resumable chunked ingest,
    * /root/reference/packages/core/spheraform_core/adapters/base.py:171-199;
    * here the chunk ledger is the stream checkpoint). Each micro-batch
    * of page files becomes ONE committed index generation:
    *  - batch 0 (no earlier generations): a full [[IndexBuilder]]
    *    build with url-rank docIds;
    *  - later batches: [[graft.index.Incremental.buildDelta]] over the
    *    STRICTLY-EARLIER generations (numbering above their maxDocId;
    *    base list keyed by batchId, not by what happens to be on disk,
    *    so a replayed batch rebuilds identically), re-crawled urls
    *    tombstoning their earlier versions.
    * Serving needs no pause: [[graft.query.Searcher.searchMulti]] over
    * [[listGenerations]] at any point sees every committed generation
    * with exact global-stats merge; [[graft.index.Compaction]] folds
    * generations back into one when the tail grows. At scale the
    * landing dir is the crawler's output (or an Iceberg incremental
    * read) and `maxFilesPerTrigger` bounds per-batch build size.
    */
  def continuousIndexPages(spark: SparkSession, pagesDir: String,
                           indexRoot: String,
                           cfg: graft.index.IndexBuilder.Config,
                           maxFilesPerTrigger: Int = 1,
                           allowRecrawl: Boolean = true): Seq[String] = {
    import spark.implicits._
    runIndexStream(spark, pagesDir, indexRoot, maxFilesPerTrigger) {
      (batch, bid) =>
        val pages = batch.select(
            col("url"), col("warc_ts"), col("html"), col("text"),
            col("lang")).as[graft.data.PageRow]
        val genDir = genDirFor(indexRoot, bid)
        val bases = listGenerations(spark, indexRoot)
          .filter(genIdOf(_) < bid)
        if (bases.isEmpty) {
          graft.index.IndexBuilder.build(
            graft.index.DocIds.fromPages(pages,
              spark.sessionState.conf.numShufflePartitions,
              useExtractor = true),
            genDir, cfg, buildId = s"stream$bid", resume = true,
            lineage = s"stream:$pagesDir#$bid")
          ()
        } else {
          graft.index.Incremental.buildDelta(pages, bases, genDir, cfg,
            buildId = s"stream$bid", allowRecrawl = allowRecrawl)
          ()
        }
    }
  }

  /** [[continuousIndexPages]] for PRE-ASSIGNED docIds: streams files
    * of (docId, url, text) rows and builds one generation per batch
    * with the ids as given (globally unique by contract — the
    * documents-table shape). No tombstones, no offset numbering; the
    * contract surface behind the ft_bm25_stream oracle query.
    */
  def continuousIndexDocs(spark: SparkSession, docsDir: String,
                          indexRoot: String,
                          cfg: graft.index.IndexBuilder.Config,
                          maxFilesPerTrigger: Int = 1): Seq[String] = {
    import spark.implicits._
    runIndexStream(spark, docsDir, indexRoot, maxFilesPerTrigger) {
      (batch, bid) =>
        graft.index.IndexBuilder.build(
          batch.select(col("docId").cast("long").as("docId"),
            col("url"), col("text")).as[graft.index.Doc],
          genDirFor(indexRoot, bid), cfg,
          buildId = s"stream$bid", resume = true,
          lineage = s"stream:$docsDir#$bid")
        ()
    }
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
    require(q.awaitTermination(120000L), "windowedCounts drain timed out")
    spark.table(name)
      .select(date_format(col("window.start"), "yyyy-MM-dd HH:mm:ss")
        .as("hr"), col("event_type"), col("n"))
      .orderBy("hr", "event_type")
  }
}
