package graft.index

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.SparkTestSession
import graft.data.{PagesGen, QuerySet}
import graft.query.Searcher

/** Incremental build correctness: base(1200 docs) + delta(new 400)
  * must answer queries rank-identically (by url and exact score) to a
  * full rebuild over all 1600 — the hard part is that N, avgdl, and
  * every df change when the delta lands, and the base segments must
  * remain exactly usable under the NEW stats.
  */
class IncrementalSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  val cfg = IndexBuilder.Config(numBuckets = 8, blockSize = 32,
    numGroups = 2, saltTarget = 300L, shufflePartitions = 6)

  test("base + delta == full rebuild (rank-identical by url + score)") {
    import spark.implicits._
    val all = PagesGen.pages(spark, 1600L).cache()
    // warc_ts is monotone in i: cutoff at i=1200
    val cutoff = new java.sql.Timestamp(PagesGen.Epoch + 1199L * 37000L)
    val baseDir = SparkTestSession.tmpDir("graft_inc_base")
    val deltaDir = SparkTestSession.tmpDir("graft_inc_delta")
    val fullDir = SparkTestSession.tmpDir("graft_inc_full")

    val basePages = all.filter($"warc_ts" <= lit(cutoff))
    IndexBuilder.build(DocIds.fromPages(basePages, 6), baseDir, cfg, "base")
    Incremental.writeWatermark(spark, baseDir, cutoff)

    // change detection: only the appended pages enter the delta
    val fresh = Incremental.newPages(all,
      Incremental.readWatermark(spark, baseDir))
    assert(fresh.count() == 400L)
    Incremental.buildDelta(fresh, Seq(baseDir), deltaDir, cfg,
      useExtractor = false)

    IndexBuilder.build(DocIds.fromPages(all, 6), fullDir, cfg, "full")

    // delta docIds sit strictly above the base generation
    val deltaStats = IndexPaths.readStats(spark, deltaDir)
    val baseStats = IndexPaths.readStats(spark, baseDir)
    assert(deltaStats.maxDocId > baseStats.maxDocId)

    val queries = QuerySet.queries().take(25)
    val multi = Searcher.searchMulti(spark, Seq(baseDir, deltaDir),
      queries, 10, Searcher.Or, numRanges = 4)
    val full = Searcher.search(spark, fullDir, queries, 10,
      Searcher.Or, numRanges = 4)
    // docId numbering differs between the two worlds — compare by url
    def byUrl(dir: Seq[String],
              hits: org.apache.spark.sql.Dataset[graft.query.SearchHit]) = {
      val h = hits.collect()
      val urls = dir.flatMap { d =>
        spark.read.parquet(s"$d/docs")
          .filter($"docId".isin(h.map(_.docId).distinct: _*))
          .select($"docId", $"url").as[(Long, String)].collect()
      }.toMap
      h.map(x => (x.queryId, urls(x.docId),
          BigDecimal(x.score).setScale(9, BigDecimal.RoundingMode.HALF_UP)))
        .sortBy(t => (t._1, t._2)).toSeq
    }
    val a = byUrl(Seq(baseDir, deltaDir), multi)
    val b = byUrl(Seq(fullDir), full)
    assert(a == b, s"incremental != full rebuild")

    // compaction merges the generations WITHOUT re-tokenizing and
    // must be bit-identical to multi-gen search (docIds preserved)
    val compDir = SparkTestSession.tmpDir("graft_inc_comp")
    Compaction.compact(spark, Seq(baseDir, deltaDir), compDir, cfg)
    val compact = Searcher.search(spark, compDir, queries, 10,
      Searcher.Or, numRanges = 4).collect()
      .map(h => (h.queryId, h.rank, h.docId, h.score)).sortBy(x => (x._1, x._2))
    val multiRaw = multi.collect()
      .map(h => (h.queryId, h.rank, h.docId, h.score)).sortBy(x => (x._1, x._2))
    assert(compact.toSeq == multiRaw.toSeq, "compaction != multi-gen search")
  }
}
