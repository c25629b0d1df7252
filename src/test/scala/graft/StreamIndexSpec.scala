package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.data.{PagesGen, QuerySet}
import graft.index.{DocIds, IndexBuilder, IndexPaths}
import graft.query.Searcher

/** Continuous indexing (Streaming.continuousIndexPages): a landing
  * directory of page files drained as a Structured Stream, one
  * committed generation per micro-batch — must answer queries
  * rank-identically (by url + exact score) to a full rebuild, keep
  * exactly-once semantics across re-drains, and upsert re-crawled
  * urls via tombstones.
  */
class StreamIndexSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  val cfg = IndexBuilder.Config(numBuckets = 8, blockSize = 32,
    numGroups = 2, saltTarget = 300L, shufflePartitions = 6)

  private def byUrl(dirs: Seq[String],
                    hits: Array[graft.query.SearchHit]) = {
    import spark.implicits._
    val urls = dirs.flatMap { d =>
      spark.read.parquet(s"$d/docs")
        .filter($"docId".isin(hits.map(_.docId).distinct: _*))
        .select($"docId", $"url").as[(Long, String)].collect()
    }.toMap
    hits.map(x => (x.queryId, urls(x.docId),
        BigDecimal(x.score).setScale(9, BigDecimal.RoundingMode.HALF_UP)))
      .sortBy(t => (t._1, t._2)).toSeq
  }

  test("streamed generations == full rebuild; re-drain is exactly-once; " +
      "re-crawl upserts") {
    import spark.implicits._
    val all = PagesGen.pages(spark, 900L).cache()
    val landing = SparkTestSession.tmpDir("graft_stream_landing")
    val root = SparkTestSession.tmpDir("graft_stream_root")
    all.repartition(3).write.mode("overwrite").parquet(landing)

    val gens = Streaming.continuousIndexPages(spark, landing, root, cfg,
      maxFilesPerTrigger = 1)
    assert(gens.size >= 2, s"expected multiple generations, got $gens")
    assert(gens == Streaming.listGenerations(spark, root))
    // generation docId ranges are disjoint and increasing
    val statsList = gens.map(IndexPaths.readStats(spark, _))
    statsList.sliding(2).foreach {
      case Seq(a, b) => assert(b.minDocId > a.maxDocId)
      case _ => ()
    }
    assert(statsList.map(_.numDocs).sum == 900L)

    val fullDir = SparkTestSession.tmpDir("graft_stream_full")
    IndexBuilder.build(DocIds.fromPages(all, 6), fullDir, cfg, "full")
    val queries = QuerySet.queries().take(20)
    val multi = Searcher.searchMulti(spark, gens, queries, 10,
      Searcher.Or, numRanges = 4).collect()
    val full = Searcher.search(spark, fullDir, queries, 10,
      Searcher.Or, numRanges = 4).collect()
    assert(byUrl(gens, multi) == byUrl(Seq(fullDir), full),
      "streamed generations != full rebuild")

    // re-drain with no new files: exactly-once — nothing new indexed
    val again = Streaming.continuousIndexPages(spark, landing, root, cfg,
      maxFilesPerTrigger = 1)
    assert(again == gens, "re-drain without new files added generations")

    // new files land: 100 re-crawled urls (new text, newer ts) — only
    // they are indexed; their old versions must be tombstone-masked
    // urls end in "/<i>" — pick i < 100. The indexed text comes from
    // the EXTRACTOR over html (the per-row invariant), so a re-crawl
    // must change the html body, not just the text column.
    val idx = element_at(split(col("url"), "/"), -1).cast("long")
    def freshen(p: graft.data.PageRow): graft.data.PageRow = p.copy(
      text = "freshly recrawled body " + p.text,
      html = new String(p.html, "UTF-8")
        .replace("<p>", "<p>freshly recrawled body ").getBytes("UTF-8"),
      warc_ts = new java.sql.Timestamp(p.warc_ts.getTime + 864000000L))
    val recrawled = all.filter(idx < 100)
    assert(recrawled.count() == 100L)
    recrawled.map(freshen(_))
      .repartition(1).write.mode("append").parquet(landing)
    val gens2 = Streaming.continuousIndexPages(spark, landing, root, cfg,
      maxFilesPerTrigger = 1)
    assert(gens2.size == gens.size + 1,
      s"expected one new generation, got ${gens2.size - gens.size}")
    val newDocs =
      gens2.filterNot(gens.contains(_))
        .map(IndexPaths.readStats(spark, _)).map(_.numDocs).sum
    assert(newDocs == 100L, s"re-drain indexed $newDocs docs, want 100")

    // the replaced base versions are tombstoned: they never surface,
    // while the fresh versions are searchable
    val newGen = gens2.filterNot(gens.contains(_))
    val tombs = newGen
      .flatMap(graft.index.Incremental.readTombstones(spark, _)).toSet
    assert(tombs.size == 100, s"expected 100 tombstones, got ${tombs.size}")
    val multi2 = Searcher.searchMulti(spark, gens2,
      queries :+ graft.query.QuerySpec(990L, "freshly recrawled body"),
      10, Searcher.Or, numRanges = 4).collect()
    assert(multi2.forall(h => !tombs.contains(h.docId)),
      "a tombstoned docId surfaced from the streamed generations")
    assert(multi2.exists(_.queryId == 990L),
      "re-crawled content not found in streamed generations")

    // compaction folds the generation tail (dead docs dropped) — must
    // equal a full rebuild over the latest-version corpus exactly
    val latest = all.filter(idx >= 100)
      .unionByName(recrawled.map(freshen(_)))
    val full2Dir = SparkTestSession.tmpDir("graft_stream_full2")
    IndexBuilder.build(DocIds.fromPages(latest, 6), full2Dir, cfg, "full2")
    val compDir = SparkTestSession.tmpDir("graft_stream_comp")
    graft.index.Compaction.compact(spark, gens2, compDir, cfg)
    val comp = Searcher.search(spark, compDir, queries, 10,
      Searcher.Or, numRanges = 4).collect()
    val full2 = Searcher.search(spark, full2Dir, queries, 10,
      Searcher.Or, numRanges = 4).collect()
    assert(byUrl(Seq(compDir), comp) == byUrl(Seq(full2Dir), full2),
      "compacted streamed generations != latest-version rebuild")
    all.unpersist(false)
  }

  test("a multi-group build crashed mid-segments is NOT a committed " +
      "generation (stats.json alone is not the commit marker)") {
    import spark.implicits._
    val root = SparkTestSession.tmpDir("graft_stream_crashgen")
    val genDir = s"$root/gen00000"
    val pages = PagesGen.pages(spark, 200L)
    val docs = DocIds.fromPages(pages, 4)
    // numGroups=2: stats.json is written BEFORE the group loop; kill
    // the build after group 0 commits — the generation must NOT list
    intercept[RuntimeException] {
      IndexBuilder.build(docs, genDir, cfg.copy(failAfterGroup = 0),
        buildId = "crash", resume = true, lineage = "crashgen")
    }
    assert(IndexPaths.exists(spark, s"$genDir/stats.json"),
      "precondition: the crash window leaves stats.json behind")
    assert(Streaming.listGenerations(spark, root).isEmpty,
      "a generation with missing segment groups listed as committed")
    // resuming the build completes the remaining group — now it lists
    IndexBuilder.build(docs, genDir, cfg,
      buildId = "crash", resume = true, lineage = "crashgen")
    assert(Streaming.listGenerations(spark, root)
      .map(_.stripPrefix("file:")) == Seq(genDir))
  }
}
