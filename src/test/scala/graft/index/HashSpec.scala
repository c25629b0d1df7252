package graft.index

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.SparkTestSession

/** The driver-side Scala hashes MUST agree exactly with the column
  * functions the build uses — query-time segment lookup depends on it.
  */
class HashSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  test("Scala xxhash == Spark xxhash64 column (strings)") {
    import spark.implicits._
    val terms = Seq("term000001", "the#3", "", "ünïcode", "a b c",
      "term049999#12")
    val fromSpark = terms.toDF("t")
      .select($"t", xxhash64($"t")).as[(String, Long)]
      .collect().toMap
    terms.foreach { t =>
      assert(IndexBuilder.xxhash(t) == fromSpark(t), s"mismatch for '$t'")
    }
  }

  test("Scala saltOf == Spark pmod(xxhash64(docId), saltCount)") {
    import spark.implicits._
    val ids = (0L until 500L).toSeq
    val fromSpark = ids.toDF("id")
      .select($"id", pmod(xxhash64($"id"), lit(7L))).as[(Long, Long)]
      .collect().toMap
    ids.foreach { id =>
      assert(IndexBuilder.saltOf(id, 7).toLong == fromSpark(id))
    }
  }

  test("bucketOf is monotone in signed termHash and in range") {
    val hashes = Seq(Long.MinValue, -1L, 0L, 1L, Long.MaxValue) ++
      (0 until 100).map(i => graft.Det.mix(i.toLong))
    Seq(1, 2, 8, 32, 256).foreach { p =>
      val sorted = hashes.sorted
      val buckets = sorted.map(h => IndexBuilder.bucketOf(h, p))
      assert(buckets == buckets.sorted, s"not monotone at p=$p")
      assert(buckets.forall(b => b >= 0 && b < p), s"out of range at p=$p")
    }
    // and the column form used in the build agrees
    import spark.implicits._
    val fromSpark = hashes.toDF("h")
      .select($"h", shiftrightunsigned(
        $"h".bitwiseXOR(lit(Long.MinValue)), 64 - 5).cast("int"))
      .as[(Long, Int)].collect().toMap
    hashes.foreach { h =>
      assert(IndexBuilder.bucketOf(h, 32) == fromSpark(h))
    }
  }
}
