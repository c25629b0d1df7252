package graft

import scala.io.Source

import org.scalatest.funsuite.AnyFunSuite

import graft.data.{MakeGoldens, PagesGen, QuerySet}
import graft.functions.TextExtractor
import graft.index.{DocIds, IndexBuilder}
import graft.query.Searcher

/** The committed golden files are the durable correctness contract:
  * generated ONCE by the scalar oracle (MakeGoldens) and checked in —
  * the distributed engine must reproduce them exactly, so engine and
  * oracle cannot silently co-drift.
  */
class GoldenSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  private def resource(name: String): Seq[String] = {
    val src = Source.fromURL(getClass.getResource(s"/$name"), "UTF-8")
    try src.getLines().drop(1).toList finally src.close()
  }

  lazy val indexDir: String = {
    val dir = SparkTestSession.tmpDir("graft_golden")
    val docs = DocIds.fromPages(
      PagesGen.pages(spark, MakeGoldens.NumDocs, partitions = 5), 5,
      useExtractor = true)
    IndexBuilder.build(docs, dir,
      IndexBuilder.Config(numBuckets = 8, blockSize = 32, numGroups = 2,
        saltTarget = 300L, shufflePartitions = 6), "golden")
    dir
  }

  test("engine reproduces committed top-k goldens bit-exactly") {
    val golden = resource("topk_golden.tsv").map { line =>
      val f = line.split('\t')
      (f(0).toLong, f(1), f(2).toInt, f(3).toLong, f(4), f(5).toDouble)
    }
    val queries = QuerySet.queries()
    Seq("or" -> Searcher.Or, "and" -> Searcher.And).foreach {
      case (modeName, mode) =>
        val hits = Searcher.search(spark, indexDir, queries, 10, mode,
          numRanges = 4).collect()
          .map(h => (h.queryId, h.rank) -> (h.docId, h.score)).toMap
        val want = golden.filter(_._2 == modeName)
        assert(want.nonEmpty)
        want.foreach { case (qid, _, rank, docId, url, score) =>
          val got = hits.get((qid, rank))
          assert(got.contains((docId, score)),
            s"$modeName q$qid rank$rank: golden=($docId,$score,$url) got=$got")
        }
        // and no extra hits beyond the goldens
        assert(hits.size == want.size,
          s"$modeName: engine returned ${hits.size} hits, golden has ${want.size}")
    }
  }

  test("extractor reproduces committed per-url sha256 goldens") {
    val md = java.security.MessageDigest.getInstance("SHA-256")
    val byUrl = (0L until 500L).map { i =>
      val p = PagesGen.row(42L, i)
      p.url -> p
    }.toMap
    resource("extract_golden.tsv").foreach { line =>
      val Array(url, sha) = line.split('\t')
      md.reset()
      val got = md.digest(
        TextExtractor.extract(byUrl(url).html).getBytes("UTF-8"))
        .map(b => f"$b%02x").mkString
      assert(got == sha, s"extract drifted for $url")
    }
  }
}
