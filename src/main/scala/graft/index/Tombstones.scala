package graft.index

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Strided tombstone sidecar + the serve-path mask.
  *
  * Small tombstone sets (the common transient window between a delta
  * and its compaction) are served as a broadcast hash set — one driver
  * collect, O(1) per-posting checks. A FULL re-crawl, though, can
  * tombstone an O(corpus) docId set; collecting that into a driver Set
  * and shipping it to every task is the OOM the round-2 advice
  * flagged. Above [[broadcastThreshold]] the mask switches to a
  * strided sidecar, the Lucene-deletes shape on the [[Norms]] stride
  * grid: `<gen>/tombstones_strided/s<strideId>.bin` holds the SORTED
  * tombstoned docIds of that docId stride as raw big-endian longs, and
  * a gather task loads only the strides its docId window [lo, hi)
  * overlaps — per-task memory is the range's own tombstones, never the
  * corpus's. Exactness is preserved in both modes (hash/binary-search
  * membership, no bloom false positives — a false positive would
  * silently drop a live doc from rankings).
  *
  * Commit protocol: stride files are written to a tmp name and
  * renamed; `manifest.json` (count + stride list) is written LAST by
  * the driver and is the commit marker — readers that find tombstone
  * parquet but no manifest fall back to the parquet, never to a
  * half-written sidecar.
  */
object Tombstones {

  def dirOf(indexDir: String): String = s"$indexDir/tombstones_strided"

  /** Default switch point: below this, a broadcast Set is cheaper than
    * per-task stride loads; above it, the Set is a driver/executor
    * memory hazard. Override per session with
    * `graft.tombstones.broadcastThreshold` (tests use 0 to force the
    * strided path on small data).
    */
  val DefaultBroadcastThreshold = 1000000L

  def broadcastThreshold(spark: SparkSession): Long =
    spark.conf.getOption("graft.tombstones.broadcastThreshold")
      .map(_.toLong).getOrElse(DefaultBroadcastThreshold)

  /** Write the strided sidecar for one generation from its tombstoned
    * docIds. Distributed: each stride is owned by one task (groupByKey
    * on the stride id), which writes its sorted ids tmp-then-rename;
    * the driver then commits with the manifest.
    */
  def write(ids: Dataset[Long], indexDir: String): Unit = {
    val spark = ids.sparkSession
    import spark.implicits._
    val dir = dirOf(indexDir)
    // retract the commit marker FIRST (the Norms.write rule): a
    // rewrite into a reused dir that crashes mid-stride must leave NO
    // valid manifest — the old one would commit a mask mixing new and
    // stale stride files
    val mp = s"$dir/manifest.json"
    if (IndexPaths.exists(spark, mp)) {
      val f = IndexPaths.fs(spark, mp)
      f.delete(new Path(mp), false)
    }
    val conf = new Norms.SerConf(spark.sparkContext.hadoopConfiguration)
    val bc = spark.sparkContext.broadcast(conf)
    val strides = ids.groupByKey(Norms.strideOf)
      .mapGroups { (sid: Long, it: Iterator[Long]) =>
        val arr = it.toArray
        java.util.Arrays.sort(arr)
        val buf = java.nio.ByteBuffer.allocate(arr.length * 8)
        arr.foreach(buf.putLong)
        // attempt-unique tmp: a speculative/retried twin sharing the
        // tmp name could truncate this attempt's in-flight bytes
        val attempt = Option(org.apache.spark.TaskContext.get())
          .map(_.taskAttemptId()).getOrElse(0L)
        val tmp = new Path(s"$dir/.tmp_s$sid.bin.$attempt")
        val fin = new Path(s"$dir/s$sid.bin")
        val fs = tmp.getFileSystem(bc.value.value)
        val out = fs.create(tmp, true)
        try out.write(buf.array()) finally out.close()
        // delete-then-rename: Hadoop rename fails when dest exists, and
        // a dest left by a previous run into a reused dir holds STALE
        // ids — only an identical twin (same deterministic bytes) can
        // race the re-create, so any winner commits correct content
        if (fs.exists(fin)) fs.delete(fin, false)
        if (!fs.rename(tmp, fin)) {
          require(fs.exists(fin), s"tombstone stride commit failed: $fin")
          fs.delete(tmp, false)
        }
        (sid, arr.length.toLong)
      }
      .collect()
    val count = strides.map(_._2).sum
    val list = strides.map(_._1).sorted.mkString("[", ",", "]")
    IndexPaths.writeString(spark, s"$dir/manifest.json",
      s"""{"count":$count,"strides":$list}""")
  }

  /** Generation manifest: (total count, stride ids); None = no
    * committed sidecar.
    */
  def readManifest(spark: SparkSession,
                   indexDir: String): Option[(Long, Array[Long])] = {
    val p = s"${dirOf(indexDir)}/manifest.json"
    if (!IndexPaths.exists(spark, p)) None
    else {
      val m = IndexPaths.readString(spark, p)
      val count = "\"count\"\\s*:\\s*(\\d+)".r.findFirstMatchIn(m)
        .map(_.group(1).toLong).getOrElse(0L)
      val strides = "\"strides\"\\s*:\\s*\\[([^\\]]*)\\]".r
        .findFirstMatchIn(m).map(_.group(1)).getOrElse("")
      val arr =
        if (strides.trim.isEmpty) Array.empty[Long]
        else strides.split(",").map(_.trim.toLong)
      Some((count, arr))
    }
  }

  /** The serve-path mask, chosen per query batch. Serializable — ships
    * inside task closures; the strided variant loads stride files
    * lazily and caches a bounded number per task.
    */
  sealed trait Mask extends Serializable {
    def isEmpty: Boolean
    /** null when empty — the evaluators take null as "no mask". */
    def fn: Long => Boolean
  }

  case object EmptyMask extends Mask {
    def isEmpty = true
    def fn: Long => Boolean = null
  }

  final case class SetMask(ids: Set[Long]) extends Mask {
    def isEmpty: Boolean = ids.isEmpty
    def fn: Long => Boolean = ids.contains _
  }

  /** dirsWithStrides: per generation dir, the stride ids it committed
    * (from manifests, read once on the driver). A docId is masked if
    * ANY generation tombstoned it.
    */
  final case class StridedMask(dirsWithStrides: Array[(String, Array[Long])],
                               conf: Norms.SerConf,
                               maxCached: Int = 8) extends Mask {
    def isEmpty = false
    @transient private lazy val strideSets: Array[java.util.HashSet[java.lang.Long]] =
      dirsWithStrides.map { case (_, ss) =>
        val h = new java.util.HashSet[java.lang.Long](ss.length * 2)
        ss.foreach(h.add(_)); h
      }
    // The mask is BROADCAST: one instance is shared by every task
    // thread in an executor JVM, so the stride cache must be
    // per-thread — an access-order LinkedHashMap rewires its links on
    // every get() and corrupts under concurrent use (hangs/lost
    // entries). Per-thread duplication is cheap for the cache sizes
    // here, but the broadcast itself is LONG-LIVED: without cleanup a
    // dense stride array (up to 8 MB at full-re-crawl density) ×
    // maxCached × task threads would stay pinned until the broadcast
    // is GC'd — so each task registers a completion listener that
    // drops its thread's cache (tasks have docId-window locality; the
    // cache never pays off across tasks anyway).
    @transient private lazy val cacheTL =
      new ThreadLocal[java.util.LinkedHashMap[(Int, Long), Array[Long]]] {
        override def initialValue() =
          new java.util.LinkedHashMap[(Int, Long), Array[Long]](
            16, 0.75f, true) {
            override def removeEldestEntry(
                e: java.util.Map.Entry[(Int, Long), Array[Long]]): Boolean =
              size() > maxCached
          }
      }
    @transient private lazy val registeredFor =
      new ThreadLocal[java.lang.Long]

    private def load(g: Int, sid: Long): Array[Long] = {
      val tc = org.apache.spark.TaskContext.get()
      if (tc != null) {
        val id = java.lang.Long.valueOf(tc.taskAttemptId())
        if (!id.equals(registeredFor.get())) {
          tc.addTaskCompletionListener[Unit](_ => cacheTL.remove())
          registeredFor.set(id)
        }
      }
      val cache = cacheTL.get()
      val key = (g, sid)
      var arr = cache.get(key)
      if (arr == null) {
        val p = new Path(s"${dirOf(dirsWithStrides(g)._1)}/s$sid.bin")
        val fs = p.getFileSystem(conf.value)
        val len = fs.getFileStatus(p).getLen
        val in = fs.open(p)
        try {
          val bytes = new Array[Byte](len.toInt)
          in.readFully(0L, bytes)
          val bb = java.nio.ByteBuffer.wrap(bytes)
          arr = Array.fill((len / 8).toInt)(bb.getLong)
        } finally in.close()
        cache.put(key, arr)
      }
      arr
    }

    def fn: Long => Boolean = { docId =>
      val sid = Norms.strideOf(docId)
      var g = 0
      var hit = false
      while (!hit && g < dirsWithStrides.length) {
        if (strideSets(g).contains(sid) &&
            java.util.Arrays.binarySearch(load(g, sid), docId) >= 0)
          hit = true
        g += 1
      }
      hit
    }
  }

  /** Build the mask for a set of generations: manifest counts decide
    * broadcast-Set vs strided; generations without a committed sidecar
    * fall back to their (small, pre-sidecar) tombstone parquet.
    */
  def maskFor(spark: SparkSession, indexDirs: Seq[String]): Mask = {
    val thr = broadcastThreshold(spark)
    val manifests = indexDirs.map(d => d -> readManifest(spark, d))
    val total = manifests.map {
      case (d, Some((n, _))) => n
      case (d, None) => Incremental.tombstoneParquetCount(spark, d)
    }.sum
    if (total == 0) EmptyMask
    else if (total <= thr)
      SetMask(indexDirs
        .flatMap(d => Incremental.readTombstones(spark, d)).toSet)
    else {
      // strided for every generation that committed a sidecar; a
      // legacy generation without one contributes through a small
      // parquet set folded in as extra "strides"? No — keep exact and
      // simple: require the sidecar where it matters. A generation
      // over threshold always has one (buildDelta writes it); legacy
      // small generations ride along as a SetMask union.
      val strided = manifests.collect {
        case (d, Some((n, ss))) if n > 0 => (d, ss)
      }.toArray
      // a manifest-less generation rides along as a broadcast Set ONLY
      // if its own count is under the threshold — collecting a large
      // set here (e.g. a full-re-crawl delta that died before its
      // sidecar committed) would silently recreate the O(corpus)
      // driver Set this whole mechanism exists to prevent
      manifests.foreach {
        case (d, None) =>
          val c = Incremental.tombstoneParquetCount(spark, d)
          require(c <= thr,
            s"$d has $c tombstones but no committed strided sidecar " +
              s"(> broadcast threshold $thr) — rerun Tombstones.write " +
              "for it before serving")
        case _ => ()
      }
      val legacySmall = manifests.collect {
        case (d, None) => d
      }.flatMap(d => Incremental.readTombstones(spark, d)).toSet
      val conf = new Norms.SerConf(spark.sparkContext.hadoopConfiguration)
      if (legacySmall.isEmpty) StridedMask(strided, conf)
      else CombinedMask(StridedMask(strided, conf), SetMask(legacySmall))
    }
  }

  final case class CombinedMask(a: Mask, b: Mask) extends Mask {
    def isEmpty: Boolean = a.isEmpty && b.isEmpty
    def fn: Long => Boolean = {
      val fa = a.fn; val fb = b.fn
      if (fa == null) fb
      else if (fb == null) fa
      else (d: Long) => fa(d) || fb(d)
    }
  }
}
