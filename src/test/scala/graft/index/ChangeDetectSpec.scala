package graft.index

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession
import graft.data.PagesGen

/** Multi-method change detection: the cost-ordered tri-state probe
  * ladder (watermark → count → sampled checksum → full checksum) must
  * catch each change class with the CHEAPEST decisive probe, and
  * declare Unchanged only from the full checksum.
  */
class ChangeDetectSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import graft.index.Incremental._

  /** Urls in the deterministic 1-in-SampleMod probe sample. */
  def sampledUrls(n: Long): Set[String] = {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    PagesGen.pages(spark, n).toDF()
      .filter(pmod(xxhash64(col("url")), lit(SampleMod)) === 0)
      .select("url").as[String].collect().toSet
  }

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
      ("sample", Unknown), ("checksum", Unchanged)))
  }

  test("edit on a SAMPLED url → the sample probe decides; full checksum never runs") {
    import spark.implicits._
    val inSample = sampledUrls(200L)
    assert(inSample.nonEmpty, "precondition: sample non-empty at n=200")
    val target = inSample.min
    val edited = PagesGen.pages(spark, 200L)
      .map(p => if (p.url == target) p.copy(text = p.text + " edited")
                else p)
    val (v, trail) = detectChange(edited, dir)
    assert(v == Changed)
    assert(trail == Seq(("watermark", Unknown), ("count", Unknown),
      ("sample", Changed)),
      s"full checksum must not run after a decisive sample: $trail")
  }

  test("appended rows → Changed via the cheap watermark probe alone") {
    val (v, trail) = detectChange(PagesGen.pages(spark, 230L), dir)
    assert(v == Changed)
    assert(trail == Seq(("watermark", Changed)))
  }

  test("same-count same-ts edit OUTSIDE the sample → only the full checksum sees it") {
    import spark.implicits._
    val inSample = sampledUrls(200L)
    val target = PagesGen.pages(spark, 200L).collect()
      .map(_.url).filterNot(inSample.contains).min
    val edited = PagesGen.pages(spark, 200L)
      .map(p => if (p.url == target) p.copy(text = p.text + " edited")
                else p)
    val (v, trail) = detectChange(edited, dir)
    assert(v == Changed)
    assert(trail == Seq(("watermark", Unknown), ("count", Unknown),
      ("sample", Unknown), ("checksum", Changed)))
  }

  test("count change with clamped timestamps → the count probe decides") {
    import spark.implicits._
    val fewer = PagesGen.pages(spark, 150L)
    val (v, trail) = detectChange(fewer, dir)
    assert(v == Changed)
    assert(trail == Seq(("watermark", Unknown), ("count", Changed)))
  }

  test("changedPages selects exactly the edited/new rows (same-ts edits)") {
    import spark.implicits._
    // edited row keeps its warc_ts — the watermark filter would select
    // NOTHING (the round-2 silent-loss bug); the hash diff must select
    // exactly the edit plus genuinely new urls, and skip a re-crawl
    // whose content is unchanged
    val edited = PagesGen.pages(spark, 200L)
      .map { p =>
        if (p.url.endsWith("/7")) p.copy(text = p.text + " edited")
        else if (p.url.endsWith("/9"))
          p.copy(warc_ts = new java.sql.Timestamp(
            p.warc_ts.getTime + 86400000L)) // newer ts, SAME content
        else p
      }
    val plusNew = edited.union(spark.createDataset(
      Seq(PagesGen.row(5L, 90000L))))
    val got = changedPages(plusNew, dir).get.collect().map(_.url).toSet
    val wantEdited = PagesGen.pages(spark, 200L).collect()
      .filter(_.url.endsWith("/7")).map(_.url).toSet
    assert(got == wantEdited + PagesGen.row(5L, 90000L).url,
      s"selected $got")
    // watermark filter alone would have missed the edit entirely
    val viaWm = newPages(plusNew,
      readWatermark(spark, dir)).collect().map(_.url).toSet
    assert(!viaWm.exists(wantEdited.contains),
      "precondition: the edit is invisible to the watermark rung")
  }

  test("same-ts edit converges: the next run probes the delta, not the base") {
    import spark.implicits._
    val base = SparkTestSession.tmpDir("graft_cd_conv_base")
    val delta = SparkTestSession.tmpDir("graft_cd_conv_delta")
    val maxTs = new java.sql.Timestamp(PagesGen.Epoch + 49L * 37000L)
    val orig = PagesGen.pages(spark, 50L)
    writeWatermark(spark, base, maxTs)
    writeFingerprint(orig, base)
    val edited = orig.map(p =>
      if (p.url.endsWith("/3")) p.copy(text = p.text + " x") else p)
    // run 1 of the delta flow: checksum rung fires, delta gets stamped
    // with the CURRENT source; its watermark ties the base's (the edit
    // kept warc_ts — the case max-by-watermark probe selection loses)
    assert(detectChange(edited, probeTarget(spark, Seq(base)))._1 == Changed)
    writeFingerprint(edited, delta)
    writeWatermark(spark, delta, maxTs)
    // run 2: the probe target must be the delta; probing the base's
    // stale fingerprint would report Changed and re-ingest the same
    // edit forever
    val probe = probeTarget(spark, Seq(base, delta))
    assert(probe == delta, s"probed $probe")
    assert(detectChange(edited, probe)._1 == Unchanged)
  }

  test("legacy fingerprint without sample fields → sample rung Unknown, checksum decides") {
    val d = SparkTestSession.tmpDir("graft_cd_legacy")
    val pages = PagesGen.pages(spark, 50L)
    writeFingerprint(pages, d)
    val fp = IndexPaths.parseFlatJson(
      IndexPaths.readString(spark, s"$d/fingerprint.json"))
    IndexPaths.writeString(spark, s"$d/fingerprint.json",
      s"""{"count":${fp("count")},"checksum":"${fp("checksum")}"}""")
    val (v, trail) = detectChange(pages, d)
    assert(v == Unchanged)
    assert(trail == Seq(("watermark", Unknown), ("count", Unknown),
      ("sample", Unknown), ("checksum", Unchanged)))
  }

  test("no sidecars → Unknown with a full Unknown trail") {
    val empty = SparkTestSession.tmpDir("graft_cd_empty")
    val (v, trail) = detectChange(PagesGen.pages(spark, 10L), empty)
    assert(v == Unknown)
    assert(trail.map(_._2).forall(_ == Unknown))
  }
}
