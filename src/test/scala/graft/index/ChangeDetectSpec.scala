package graft.index

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession
import graft.data.PagesGen

/** Multi-method change detection: the cost-ordered tri-state probe
  * ladder (watermark → count → checksum) must catch each change class
  * with the CHEAPEST decisive probe, and declare Unchanged only from
  * the checksum.
  */
class ChangeDetectSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import graft.index.Incremental._

  lazy val dir: String = {
    val d = SparkTestSession.tmpDir("graft_cd")
    val pages = PagesGen.pages(spark, 200L)
    // index content irrelevant here — only the sidecars are probed
    writeWatermark(spark, d,
      new java.sql.Timestamp(PagesGen.Epoch + 199L * 37000L))
    writeFingerprint(pages, d)
    d
  }

  test("identical source → Unchanged, decided by the checksum rung") {
    val (v, trail) = detectChange(PagesGen.pages(spark, 200L), dir)
    assert(v == Unchanged)
    assert(trail == Seq(("watermark", Unknown), ("count", Unknown),
      ("checksum", Unchanged)))
  }

  test("appended rows → Changed via the cheap watermark probe alone") {
    val (v, trail) = detectChange(PagesGen.pages(spark, 230L), dir)
    assert(v == Changed)
    assert(trail == Seq(("watermark", Changed)))
  }

  test("same-count same-ts in-place edit → only the checksum sees it") {
    import spark.implicits._
    val edited = PagesGen.pages(spark, 200L)
      .map(p => if (p.url.endsWith("/7")) p.copy(text = p.text + " edited")
                else p)
    val (v, trail) = detectChange(edited, dir)
    assert(v == Changed)
    assert(trail == Seq(("watermark", Unknown), ("count", Unknown),
      ("checksum", Changed)))
  }

  test("count change with clamped timestamps → the count probe decides") {
    import spark.implicits._
    val fewer = PagesGen.pages(spark, 150L)
    val (v, trail) = detectChange(fewer, dir)
    assert(v == Changed)
    assert(trail == Seq(("watermark", Unknown), ("count", Changed)))
  }

  test("no sidecars → Unknown with a full Unknown trail") {
    val empty = SparkTestSession.tmpDir("graft_cd_empty")
    val (v, trail) = detectChange(PagesGen.pages(spark, 10L), empty)
    assert(v == Unknown)
    assert(trail.map(_._2).forall(_ == Unknown))
  }
}
