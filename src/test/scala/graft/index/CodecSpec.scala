package graft.index

import org.scalatest.funsuite.AnyFunSuite

import scala.util.Random

class CodecSpec extends AnyFunSuite {

  test("varbyte round-trips arbitrary non-negative longs") {
    val rnd = new Random(42)
    (0 until 200).foreach { _ =>
      val n = rnd.nextInt(500)
      val arr = Array.fill(n)(rnd.nextLong() & Long.MaxValue)
      val enc = Codec.encodeVarByte(arr)
      assert(Codec.decodeVarByte(enc, n).toSeq == arr.toSeq)
    }
  }

  test("varbyte boundary values") {
    val edges = Array(0L, 1L, 127L, 128L, 16383L, 16384L,
      Int.MaxValue.toLong, Long.MaxValue)
    val enc = Codec.encodeVarByte(edges)
    assert(Codec.decodeVarByte(enc, edges.length).toSeq == edges.toSeq)
  }

  test("delta+varbyte round-trips sorted docID runs") {
    val rnd = new Random(7)
    (0 until 200).foreach { _ =>
      val n = 1 + rnd.nextInt(400)
      val sorted = Array.fill(n)(rnd.nextLong() & ((1L << 40) - 1)).sorted
      val base = sorted.head
      val enc = Codec.encodeDeltas(sorted, base)
      assert(Codec.decodeDeltas(enc, n, base).toSeq == sorted.toSeq)
    }
  }

  test("delta encoding of dense runs is compact (~1 byte/gap)") {
    val run = Array.tabulate(1000)(i => 100000L + i * 3)
    val enc = Codec.encodeDeltas(run, run.head)
    assert(enc.length <= 1005)
  }

  test("varbyte rejects negatives") {
    intercept[IllegalArgumentException] {
      Codec.encodeVarByte(Array(-1L))
    }
  }
}
