package graft.data

import java.sql.Timestamp

import org.apache.spark.sql.{Dataset, SparkSession}

import graft.Det
import graft.functions.TextExtractor

/** One row of the Common-Crawl-style input table — exactly the shape
  * mandated by BASELINE.json `input_hint`:
  * (url string, warc_ts timestamp, html binary, text string, lang string).
  */
case class PageRow(
    url: String,
    warc_ts: Timestamp,
    html: Array[Byte],
    text: String,
    lang: String)

/** Deterministic synthetic webtext generator (FIXTURES.md §1).
  *
  * Every field of row `i` is a pure function of `(seed, i)` via
  * counter-based hashing ([[graft.Det]]), so the generated table is
  * identical at any parallelism — the property that makes the
  * rank-identical golden assertions possible. Token ranks are sampled
  * Zipfian (s ≈ 1.07) from a 50 000-word synthetic vocabulary
  * (`term000000`…); the top ~30 ranks behave as stopwords, exercising
  * the skew/salting path.
  *
  * Ancestor: the reference tests against canned deterministic fixtures
  * (/root/reference/tests/conftest.py:160-258) rather than live
  * sources; we do the same with generated data, no external inputs.
  */
object PagesGen {

  val DefaultSeed = 42L
  val VocabSize = 50000
  val ZipfS = 1.07
  val Epoch = 1735689600000L // 2025-01-01T00:00:00Z

  /** Cumulative Zipf distribution over vocabulary ranks. */
  private lazy val zipfCum: Array[Double] = {
    val w = new Array[Double](VocabSize)
    var i = 0
    var sum = 0.0
    while (i < VocabSize) {
      sum += 1.0 / math.pow(i + 1.0, ZipfS)
      w(i) = sum
      i += 1
    }
    var j = 0
    while (j < VocabSize) { w(j) /= sum; j += 1 }
    w
  }

  def word(rank: Int): String = f"term$rank%06d"

  /** Sample a vocabulary rank from the Zipf distribution. */
  def sampleRank(u: Double): Int = {
    var lo = 0
    var hi = VocabSize - 1
    while (lo < hi) {
      val mid = (lo + hi) >>> 1
      if (zipfCum(mid) < u) lo = mid + 1 else hi = mid
    }
    lo
  }

  /** Build row `i` deterministically. */
  def row(seed: Long, i: Long): PageRow = {
    val len = 50 + (Math.floorMod(Det.h(seed, i, 1), 450L)).toInt
    val sb = new StringBuilder(len * 8)
    var j = 0
    while (j < len) {
      if (j > 0) sb.append(' ')
      sb.append(word(sampleRank(Det.unit(Det.h(seed, i, 1000L + j)))))
      j += 1
    }
    val text = sb.toString
    val p0 = word(sampleRank(Det.unit(Det.h(seed, i, 2))))
    val p1 = word(sampleRank(Det.unit(Det.h(seed, i, 3))))
    val url = s"https://site${i % 1000}.example/$p0/$p1/$i"
    val title = s"$p0 $p1"
    val html =
      (s"<html><head><title>${TextExtractor.escape(title)}</title></head>" +
        s"<body><p>${TextExtractor.escape(text)}</p></body></html>")
        .getBytes("UTF-8")
    val lang = Math.floorMod(Det.h(seed, i, 4), 20L) match {
      case 18 => "de"
      case 19 => "fr"
      case _  => "en"
    }
    new PageRow(url, new Timestamp(Epoch + i * 37000L), html, text, lang)
  }

  /** Distributed generation: `spark.range` gives each row its counter
    * `i`; the map is pure, so partitioning never changes content.
    */
  def pages(spark: SparkSession, n: Long, seed: Long = DefaultSeed,
            partitions: Int = 0): Dataset[PageRow] = {
    import spark.implicits._
    val base =
      if (partitions > 0) spark.range(0L, n, 1L, partitions) else spark.range(n)
    base.map(i => row(seed, i))
  }
}
