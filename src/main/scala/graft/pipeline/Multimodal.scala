package graft.pipeline

import org.apache.spark.sql.DataFrame

/** Multimodal frame sampling over opaque binary columns.
  *
  * The engine treats video/image/audio payloads as `binary` columns
  * with typed metadata (the reference's raster/attachment handling,
  * /root/reference/packages/core/spheraform_core/adapters/arcgis.py:409-412
  * keyword/metadata extraction pattern). The DECODE step is a STUB —
  * no codec libraries exist in this environment — over a small
  * deterministic container format, but everything Spark-side is the
  * real shape a production frame sampler has:
  *
  *  - typed `mapPartitions` over (id, payload) rows: one pass, no
  *    UDF, constant per-task memory (a reused header buffer; frame
  *    payloads are visited by offset, never copied wholesale),
  *  - one OUTPUT row per sampled frame (the explode happens inside
  *    the iterator, so a 10^4-frame video never materializes a frame
  *    array),
  *  - uniform-stride sampling: stride = ceil(frames / maxFrames), so
  *    at most `maxFrames` frames survive regardless of input length —
  *    the property that bounds downstream work at 100 TB,
  *  - malformed/truncated payloads degrade to fewer (or zero) rows,
  *    never an error: corrupt web-scale media is the common case.
  *
  * Stub container format ("GVID"): magic `GVID` (4 bytes) + width u16
  * + height u16 + frameCount u16, big-endian, then frameCount 8-byte
  * frame payloads. The stub "feature" per sampled frame is the hex of
  * its 8 payload bytes (a real system would decode + embed here —
  * swap [[frameFeature]] for the codec call).
  */
object Multimodal {

  val Magic: Array[Byte] = "GVID".getBytes("US-ASCII")
  val HeaderLen = 10
  val FrameLen = 8

  private def u16(b: Array[Byte], off: Int): Int =
    ((b(off) & 0xff) << 8) | (b(off + 1) & 0xff)

  /** STUB decode: a production sampler calls the image/video codec
    * here; the plumbing around it does not change.
    */
  private def frameFeature(payload: Array[Byte], off: Int): String = {
    val hexC = "0123456789abcdef".toCharArray
    val cs = new Array[Char](FrameLen * 2)
    var i = 0
    while (i < FrameLen) {
      cs(2 * i) = hexC((payload(off + i) >> 4) & 0xf)
      cs(2 * i + 1) = hexC(payload(off + i) & 0xf)
      i += 1
    }
    new String(cs)
  }

  /** Resize planning over the same container headers: the
    * aspect-ratio-preserving target dimensions a downsampling pass
    * would decode into. Real semantics (the math every thumbnailer
    * runs), stubbed decode: only the header is read — the pixel
    * transform itself would sit in the codec slot. scale = maxSide /
    * max(w, h) when the longer side exceeds maxSide, else 1; output
    * dims are round-half-up with a floor of 1. Rows with a bad
    * magic/short header/null payload yield nothing (zero declared
    * frames still have valid dimensions and DO yield a row).
    */
  def resizeDims(df: DataFrame, idCol: String, binCol: String,
                 maxSide: Int): DataFrame = {
    require(maxSide >= 1, s"maxSide must be >= 1, got $maxSide")
    val spark = df.sparkSession
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    df.select(col(idCol).cast("long"), col(binCol))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.flatMap { case (id, payload) =>
          if (payload == null || payload.length < HeaderLen ||
              !(0 until Magic.length).forall(i => payload(i) == Magic(i)))
            Iterator.empty
          else {
            val w = u16(payload, 4)
            val h = u16(payload, 6)
            val longSide = math.max(w, h)
            if (longSide <= 0) Iterator.empty
            else {
              val scale =
                if (longSide <= maxSide) 1.0 else maxSide.toDouble / longSide
              Iterator.single((id, w, h,
                math.max(1L, math.round(w * scale)).toInt,
                math.max(1L, math.round(h * scale)).toInt))
            }
          }
        }
      }
      .toDF(idCol, "width", "height", "out_w", "out_h")
  }

  /** Sampled frames of every row's payload:
    * (id, frame_idx, width, height, frame_sig) — at most `maxFrames`
    * rows per input, uniform stride over the COMPLETE frames present
    * (a truncated tail frame is dropped, a bad magic or short header
    * yields no rows).
    */
  def frameSample(df: DataFrame, idCol: String, binCol: String,
                  maxFrames: Int): DataFrame = {
    require(maxFrames >= 1, s"maxFrames must be >= 1, got $maxFrames")
    val spark = df.sparkSession
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    df.select(col(idCol).cast("long"), col(binCol))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.flatMap { case (id, payload) =>
          if (payload == null || payload.length < HeaderLen ||
              !(0 until Magic.length).forall(i => payload(i) == Magic(i)))
            Iterator.empty
          else {
            val w = u16(payload, 4)
            val h = u16(payload, 6)
            val declared = u16(payload, 8)
            // only COMPLETE frames count (truncated media is normal)
            val present = math.min(declared,
              (payload.length - HeaderLen) / FrameLen)
            if (present <= 0) Iterator.empty
            else {
              val stride =
                math.max(1, (present + maxFrames - 1) / maxFrames)
              Iterator.range(0, present, stride).map { f =>
                (id, f.toLong, w, h,
                  frameFeature(payload, HeaderLen + f * FrameLen))
              }
            }
          }
        }
      }
      .toDF(idCol, "frame_idx", "width", "height", "frame_sig")
  }
}
