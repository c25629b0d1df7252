package graft.index

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession
import graft.data.PagesGen

class DocIdsSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  test("docIds are the global url rank, stable across parallelism") {
    import spark.implicits._
    val expected = (0L until 800L).map(i => PagesGen.row(42L, i))
      .map(p => (p.url, p.text)).sortBy(_._1).zipWithIndex
      .map { case ((u, _), r) => (u, r.toLong) }.toMap

    Seq(2, 5, 11).foreach { parts =>
      val pages = PagesGen.pages(spark, 800L, partitions = 3)
      val got = DocIds.fromPages(pages, numPartitions = parts)
        .collect().map(d => d.url -> d.docId).toMap
      assert(got == expected, s"docId mapping differs at P=$parts")
    }
  }

  test("docIds are dense 0..n-1") {
    val pages = PagesGen.pages(spark, 300L)
    val ids = DocIds.fromPages(pages, 4).collect().map(_.docId).sorted
    assert(ids.toSeq == (0L until 300L))
  }

  test("duplicate urls collapse to one deterministic doc, ranks stay dense") {
    import spark.implicits._
    val base = (0L until 100L).map(i => PagesGen.row(42L, i))
    // one exact duplicate row + one same-url content variant
    val dupExact = base(7)
    val dupVariant = base(13).copy(text = base(13).text + " variant")
    val pages = spark.createDataset(
      scala.util.Random.shuffle(base ++ Seq(dupExact, dupVariant)))
    val docs = DocIds.fromPages(pages, 5).collect()
    // exactly one row per url, ranks dense over DISTINCT urls — a
    // duplicate capture must never mint a second docId (it would be
    // double-scored by WAND with no error anywhere)
    assert(docs.length == 100)
    assert(docs.map(_.docId).sorted.toSeq == (0L until 100L))
    assert(docs.map(_.url).distinct.length == 100)
    // winner among content variants is deterministic (max content
    // hash): a re-run over a reshuffled copy picks the same rows
    val winner = docs.find(_.url == dupVariant.url).get.text
    assert(Seq(base(13).text, dupVariant.text).contains(winner))
    val rerun = DocIds.fromPages(spark.createDataset(
        scala.util.Random.shuffle(base ++ Seq(dupExact, dupVariant))), 3)
      .collect().map(d => d.url -> (d.docId, d.text)).toMap
    assert(docs.map(d => d.url -> (d.docId, d.text)).toMap == rerun)
    // and the mapping matches a run on the pre-deduped input
    val clean = DocIds.fromPages(spark.createDataset(
      base.updated(13, base(13).copy(text = winner))), 5)
      .collect().map(d => d.url -> (d.docId, d.text)).toMap
    assert(docs.map(d => d.url -> (d.docId, d.text)).toMap == clean)
  }

  test("extractor path produces identical docs to text column") {
    val pages = PagesGen.pages(spark, 200L)
    val a = DocIds.fromPages(pages, 3, useExtractor = true).collect()
      .map(d => d.docId -> d.text).toMap
    val b = DocIds.fromPages(pages, 3, useExtractor = false).collect()
      .map(d => d.docId -> d.text).toMap
    assert(a == b)
  }
}
