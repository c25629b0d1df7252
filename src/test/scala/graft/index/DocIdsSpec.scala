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

  test("extractor path produces identical docs to text column") {
    val pages = PagesGen.pages(spark, 200L)
    val a = DocIds.fromPages(pages, 3, useExtractor = true).collect()
      .map(d => d.docId -> d.text).toMap
    val b = DocIds.fromPages(pages, 3, useExtractor = false).collect()
      .map(d => d.docId -> d.text).toMap
    assert(a == b)
  }
}
