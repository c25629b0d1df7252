package graft.pipeline

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession
import graft.data.MultimodalFixtures

/** Frame sampling over binary columns: hand-computed expectations,
  * partition invariance, and the maxFrames row bound that keeps
  * downstream work bounded at scale.
  */
class MultimodalSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  private def sample(parts: Int): Seq[(Long, Long, Int, Int, String)] = {
    import spark.implicits._
    Multimodal.frameSample(
      spark.createDataset(MultimodalFixtures.videos).repartition(parts)
        .toDF("fixture_id", "payload"),
      "fixture_id", "payload", maxFrames = 4)
      .as[(Long, Long, Int, Int, String)]
      .collect().sortBy(r => (r._1, r._2)).toSeq
  }

  test("sampled frames == hand-computed expectations, any partitioning") {
    val want = MultimodalFixtures.expected
      .sortBy(r => (r._1, r._2))
    assert(sample(1) == want)
    assert(sample(5) == want)
  }

  test("resize planning == hand-computed dims; silent on malformed") {
    import spark.implicits._
    val got = Multimodal.resizeDims(
      spark.createDataset(MultimodalFixtures.videos)
        .toDF("fixture_id", "payload"),
      "fixture_id", "payload", maxSide = 8)
      .as[(Long, Int, Int, Int, Int)]
      .collect().sortBy(_._1).toSeq
    assert(got == MultimodalFixtures.expectedResize)
    // downscale floor: a 1xN sliver never collapses to 0
    val sliver = {
      val out = new java.io.ByteArrayOutputStream()
      out.write("GVID".getBytes("US-ASCII"))
      out.write(Array[Byte](0, 1, 1, 0, 0, 0)) // w=1, h=256, 0 frames
      out.toByteArray
    }
    val r = Multimodal.resizeDims(
      Seq((0L, sliver)).toDF("fixture_id", "payload"),
      "fixture_id", "payload", maxSide = 8)
      .as[(Long, Int, Int, Int, Int)].collect().head
    assert(r == ((0L, 1, 256, 1, 8)))
  }

  test("row bound: a long video yields at most maxFrames rows") {
    import spark.implicits._
    // 1000 frames, frame i = 8 bytes of (i & 0xff)
    val out = new java.io.ByteArrayOutputStream()
    out.write("GVID".getBytes("US-ASCII"))
    out.write(Array[Byte](0, 64, 0, 32)) // w=64 h=32
    out.write(Array[Byte](0x03, 0xe8.toByte)) // 1000 frames
    (0 until 1000).foreach(i => out.write(Array.fill(8)(i.toByte)))
    val rows = Multimodal.frameSample(
      Seq((0L, out.toByteArray)).toDF("fixture_id", "payload"),
      "fixture_id", "payload", maxFrames = 7)
      .as[(Long, Long, Int, Int, String)].collect()
    assert(rows.length <= 7 && rows.nonEmpty)
    // uniform stride from frame 0
    val stride = (1000 + 6) / 7
    assert(rows.map(_._2).toSeq == (0 until 1000 by stride).map(_.toLong))
    assert(rows.forall(r => r._3 == 64 && r._4 == 32))
  }
}
