package graft.pipeline

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.SparkTestSession

class PipelineSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import org.apache.spark.sql.DataFrame

  def docsDf(rows: Seq[(Long, String)]): DataFrame = {
    import spark.implicits._
    rows.toDF("doc_id", "text")
  }

  test("exact dedup groups identical texts") {
    val df = docsDf(Seq(1L -> "a b c", 2L -> "a b c", 3L -> "x y z"))
    val got = Dedup.exact(df, "doc_id", "text").collect()
      .map(r => (r.getLong(1), r.getLong(2))).sortBy(_._2)
    assert(got.toSeq == Seq((2L, 1L), (1L, 3L)))
  }

  test("minhash LSH finds planted near-dups and skips unrelated") {
    val base = (1 to 40).map(i => s"tok$i").mkString(" ")
    val nearDup = (1 to 40).map(i => s"tok$i").updated(5, "CHANGED")
      .mkString(" ")
    val other = (100 to 140).map(i => s"tok$i").mkString(" ")
    val df = docsDf(Seq(1L -> base, 2L -> nearDup, 3L -> other))
    val pairs = Dedup.minhashLsh(df, "doc_id", "text", 16, 4, 0.2)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(pairs.toSeq == Seq((1L, 2L)))
  }

  test("ngram jaccard matches hand computation") {
    val a = "a b c d e" // shingles: abc bcd cde
    val b = "a b c d x" // shingles: abc bcd cdx -> inter 2, union 4
    val df = docsDf(Seq(1L -> a, 2L -> b))
    val got = Dedup.ngramJaccard(df, "doc_id", "text", 0.1).collect()
    assert(got.length == 1)
    assert(got(0).getDouble(2) == 0.5)
  }

  test("simhash: identical text → identical hash; near → close") {
    def ham(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    val t1 = (1 to 60).map(i => s"tok$i").mkString(" ")
    val t2 = (1 to 60).map(i => s"tok$i").updated(3, "x").mkString(" ")
    val far = (200 to 260).map(i => s"tok$i").mkString(" ")
    val h1 = TextOps.simhash64(t1.split(" ").toSeq)
    val h1b = TextOps.simhash64(t1.split(" ").toSeq)
    val h2 = TextOps.simhash64(t2.split(" ").toSeq)
    val h3 = TextOps.simhash64(far.split(" ").toSeq)
    assert(h1 == h1b)
    assert(ham(h1, h2) < ham(h1, h3))
  }

  test("cosine top-k matches naive double computation") {
    import spark.implicits._
    val vecs = (0 until 30).map { i =>
      (i.toLong, Array.tabulate(8)(d =>
        (graft.Det.unit(graft.Det.h(3L, i, d)) * 2 - 1).toFloat))
    }
    val df = vecs.toDF("vec_id", "embedding")
    val got = Similarity.cosineTopK(df, "vec_id", "embedding", 0L, 5)
      .collect().map(r => (r.getLong(0), r.getDouble(1)))
    val q = vecs.head._2
    def cos(a: Array[Float], b: Array[Float]): Double = {
      val dot = a.zip(b).map { case (x, y) => x.toDouble * y.toDouble }.sum
      val na = math.sqrt(a.map(x => x.toDouble * x.toDouble).sum)
      val nb = math.sqrt(b.map(x => x.toDouble * x.toDouble).sum)
      dot / (na * nb)
    }
    val want = vecs.tail
      .map { case (id, v) =>
        (id, BigDecimal(cos(q, v)).setScale(4,
          BigDecimal.RoundingMode.HALF_UP).toDouble) }
      .sortBy { case (id, c) => (-c, id) }.take(5)
    assert(got.map(_._1).toSeq == want.map(_._1))
  }

  test("LSH ANN returns a subset of brute-force candidates with same scores") {
    import spark.implicits._
    val vecs = (0 until 200).map { i =>
      (i.toLong, Array.tabulate(16)(d =>
        (graft.Det.unit(graft.Det.h(9L, i, d)) * 2 - 1).toFloat))
    }
    val df = vecs.toDF("vec_id", "embedding").cache()
    val exact = Similarity.cosineTopK(df, "vec_id", "embedding", 1L, 200)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val approx = Similarity.lshTopK(df, "vec_id", "embedding", 1L, 10,
      numPlanes = 4).collect().map(r => (r.getLong(0), r.getDouble(1)))
    assert(approx.nonEmpty)
    approx.foreach { case (id, c) =>
      assert(exact(id) == c, s"vec $id score differs from brute force")
    }
  }

  test("langid picks marker-dominant language") {
    val df = docsDf(Seq(
      1L -> "the cat is of the mat and to in",
      2L -> "der hund und die katze ist",
      3L -> "le chat et la maison est",
      4L -> "xyz abc qqq"))
    val got = Dedup.simhash _ // touch nothing; compute langid:
    val res = df.select(col("doc_id"),
      TextOps.langId(col("text")).as("l")).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(res == Map(1L -> "en", 2L -> "de", 3L -> "fr", 4L -> "und"))
  }
}
