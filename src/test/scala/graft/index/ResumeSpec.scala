package graft.index

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession
import graft.data.PagesGen

/** Resume fixture (FIXTURES.md §6): a build that crashes after M of P
  * groups must, when resumed, (a) skip the completed groups and (b)
  * produce exactly the same segment content as an uninterrupted build.
  */
class ResumeSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  val cfg = IndexBuilder.Config(numBuckets = 8, blockSize = 32,
    numGroups = 4, saltTarget = 400L, shufflePartitions = 6)

  private def segmentFingerprint(dir: String): Seq[String] = {
    import spark.implicits._
    spark.read.parquet(s"$dir/segments")
      .as[SegmentBlock].collect()
      .map(b => s"${b.bucket}|${b.termHash}|${b.skey}|${b.blockId}|" +
        s"${b.n}|${b.firstDocId}|${b.lastDocId}|${b.maxTf}|${b.minDl}|" +
        s"${b.docIdsEnc.mkString(",")}|${b.tfsEnc.mkString(",")}|" +
        s"${b.posEnc.mkString(",")}")
      .sorted.toSeq
  }

  test("crash after group 1, resume → identical segments") {
    val docs = DocIds.fromPages(PagesGen.pages(spark, 900L), 6)
    docs.cache().count()

    val cleanDir = SparkTestSession.tmpDir("graft_clean")
    IndexBuilder.build(docs, cleanDir, cfg, buildId = "clean")

    val crashDir = SparkTestSession.tmpDir("graft_crash")
    intercept[RuntimeException] {
      IndexBuilder.build(docs, crashDir,
        cfg.copy(failAfterGroup = 1), buildId = "crash")
    }
    // only groups 0..1 committed
    val before = new CheckpointStore(spark, crashDir).list()
    assert(before.count(_.stage == "segments") == 2)

    IndexBuilder.build(docs, crashDir, cfg, buildId = "crash",
      resume = true)
    val after = new CheckpointStore(spark, crashDir).list()
    assert(after.count(_.stage == "segments") == cfg.numGroups)
    // resume must not have re-run groups 0..1 (same finishedMs)
    val g01Before = before.filter(c => c.stage == "segments")
      .map(c => c.unit -> c.finishedMs).toMap
    val g01After = after.filter(c => c.stage == "segments" && c.unit <= 1)
      .map(c => c.unit -> c.finishedMs).toMap
    assert(g01After == g01Before.view.filterKeys(_ <= 1).toMap)

    assert(segmentFingerprint(crashDir) == segmentFingerprint(cleanDir))
  }

  test("fused single-group build == staged multi-group build, byte-identical") {
    // numGroups=1 skips the staged-postings parquet and encodes
    // straight from the posting stream; the segment CONTENT must be
    // exactly what the staged path produces — same blocks, same bytes
    // (block boundaries are a pure function of each skey's run).
    val docs = DocIds.fromPages(PagesGen.pages(spark, 700L), 6)
    docs.cache().count()
    val fusedDir = SparkTestSession.tmpDir("graft_fused")
    val stagedDir = SparkTestSession.tmpDir("graft_staged")
    val posCfg = cfg.copy(withPositions = true)
    IndexBuilder.build(docs, fusedDir, posCfg.copy(numGroups = 1), "f")
    IndexBuilder.build(docs, stagedDir, posCfg.copy(numGroups = 4), "s")
    assert(segmentFingerprint(fusedDir) == segmentFingerprint(stagedDir))
    // the fused path must have written no staging parquet at all
    assert(!IndexPaths.exists(spark, s"$fusedDir/postings_staged"))
    assert(IndexPaths.exists(spark, s"$stagedDir/postings_staged"))
    // and both checkpoints exist so resume skips the fused build whole
    val ck = new CheckpointStore(spark, fusedDir)
    assert(ck.isComplete("postings", 0) && ck.isComplete("segments", 0))
  }

  test("recompacting DIFFERENT generations into a reused outDir recomputes") {
    import spark.implicits._
    val basePages = PagesGen.pages(spark, 400L)
    val d1Pages = spark.createDataset((0 until 80).map(i =>
      PagesGen.row(17L, 40000L + i)))
    val d2Pages = spark.createDataset((0 until 60).map(i =>
      PagesGen.row(19L, 50000L + i)))
    val baseDir = SparkTestSession.tmpDir("graft_lin_base")
    val d1Dir = SparkTestSession.tmpDir("graft_lin_d1")
    val d2Dir = SparkTestSession.tmpDir("graft_lin_d2")
    IndexBuilder.build(DocIds.fromPages(basePages, 4), baseDir, cfg, "b")
    Incremental.buildDelta(d1Pages, Seq(baseDir), d1Dir, cfg,
      useExtractor = false)
    Incremental.buildDelta(d2Pages, Seq(baseDir, d1Dir), d2Dir, cfg,
      useExtractor = false)

    val out = SparkTestSession.tmpDir("graft_lin_out")
    Compaction.compact(spark, Seq(baseDir, d1Dir), out, cfg)
    // resume=true default + COMPLETE checkpoints from the 2-gen run:
    // without lineage validation every stage would skip and d2's docs
    // would silently be missing from the "compacted" index
    val stats3 = Compaction.compact(spark,
      Seq(baseDir, d1Dir, d2Dir), out, cfg)
    val cleanDir = SparkTestSession.tmpDir("graft_lin_clean")
    val statsClean = Compaction.compact(spark,
      Seq(baseDir, d1Dir, d2Dir), cleanDir, cfg)
    assert(stats3.numDocs == statsClean.numDocs)
    assert(segmentFingerprint(out) == segmentFingerprint(cleanDir),
      "reused-outDir recompaction served stale artifacts")
  }

  test("compaction crash after group 1, resume → identical segments") {
    val basePages = PagesGen.pages(spark, 500L)
    val deltaPages = {
      import spark.implicits._
      spark.createDataset((0 until 120).map(i =>
        PagesGen.row(13L, 30000L + i)))
    }
    val baseDir = SparkTestSession.tmpDir("graft_cres_base")
    val deltaDir = SparkTestSession.tmpDir("graft_cres_delta")
    IndexBuilder.build(DocIds.fromPages(basePages, 4), baseDir, cfg,
      "base")
    Incremental.buildDelta(deltaPages, Seq(baseDir), deltaDir, cfg,
      useExtractor = false)

    val cleanDir = SparkTestSession.tmpDir("graft_cres_clean")
    Compaction.compact(spark, Seq(baseDir, deltaDir), cleanDir, cfg)

    val crashDir = SparkTestSession.tmpDir("graft_cres_crash")
    intercept[RuntimeException] {
      Compaction.compact(spark, Seq(baseDir, deltaDir), crashDir,
        cfg.copy(failAfterGroup = 1))
    }
    val before = new CheckpointStore(spark, crashDir).list()
    assert(before.count(_.stage == "segments") == 2)
    assert(before.count(_.stage == "stats") == 1)

    Compaction.compact(spark, Seq(baseDir, deltaDir), crashDir, cfg)
    val after = new CheckpointStore(spark, crashDir).list()
    assert(after.count(_.stage == "segments") == cfg.numGroups)
    // completed groups and the whole front half must NOT re-run
    val fBefore = before.map(c => (c.stage, c.unit) -> c.finishedMs).toMap
    val fAfter = after.map(c => (c.stage, c.unit) -> c.finishedMs).toMap
    fBefore.foreach { case (k, v) =>
      assert(fAfter(k) == v, s"$k re-ran on resume")
    }
    assert(segmentFingerprint(crashDir) == segmentFingerprint(cleanDir),
      "resumed compaction != uninterrupted compaction")

    // cache-vs-recompute knob: graft.compaction.cacheDecoded=false
    // re-decodes the posting stream per consumer instead of persisting
    // it for the run — output must be byte-identical to cached mode
    val recompDir = SparkTestSession.tmpDir("graft_cres_recomp")
    spark.conf.set("graft.compaction.cacheDecoded", "false")
    try Compaction.compact(spark, Seq(baseDir, deltaDir), recompDir, cfg)
    finally spark.conf.unset("graft.compaction.cacheDecoded")
    assert(segmentFingerprint(recompDir) == segmentFingerprint(cleanDir),
      "recompute-mode compaction != cached-mode compaction")
  }
}
