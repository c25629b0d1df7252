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

  test("snippet: token window around first query-term hit") {
    import spark.implicits._
    val df = Seq(
      (1L, "a b c data e f g h"),      // interior hit, window 2
      (2L, "data x y z"),              // hit at position 1 (left clamp)
      (3L, "nothing relevant here"),   // no hit → empty
      (4L, "x join y data z")          // min position across terms wins
    ).toDF("doc_id", "text")
    val got = df.select(col("doc_id"),
      TextOps.snippet(col("text"), Seq("data", "join"), 2).as("s"))
      .as[(Long, String)].collect().toMap
    assert(got(1L) == "b c data e f")
    assert(got(2L) == "data x y")
    assert(got(3L) == "")
    assert(got(4L) == "x join y data") // window around 'join' (pos 2)
    // single-term query (least() needs >= 2 children — must not
    // crash at analysis time) and duplicate terms collapsing to one
    val one = df.select(col("doc_id"),
      TextOps.snippet(col("text"), Seq("data", "data"), 1).as("s"))
      .as[(Long, String)].collect().toMap
    assert(one(1L) == "c data e")
    assert(one(3L) == "")
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

  test("simhash pairs == brute-force hamming filter; salt-invariant") {
    import spark.implicits._
    // near-dup clusters: shared long prefix with one-token edits, plus
    // unrelated docs — guarantees some pairs with hamming <= 3 and
    // some chunk-collision candidates that fail the verify
    val base = (1 to 80).map(i => s"tok$i")
    val docs = ((0 until 6).map { k =>
      (k.toLong, base.updated(40, s"edit$k").mkString(" "))
    } ++ (6 until 20).map { k =>
      (k.toLong, (1 to 60).map(i => s"w${k}_$i").mkString(" "))
    }).toDF("doc_id", "text")
    val sigs = Dedup.simhash(docs, "doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    def ham(a: String, b: String) = java.lang.Long.bitCount(
      java.lang.Long.parseUnsignedLong(a, 16) ^
        java.lang.Long.parseUnsignedLong(b, 16))
    val chunkEq = (a: String, b: String) =>
      (0 until 4).exists(c => a.substring(4 * c, 4 * c + 4) ==
        b.substring(4 * c, 4 * c + 4))
    val ids = sigs.keys.toSeq.sorted
    val want = (for {
      i <- ids; j <- ids if i < j
      if chunkEq(sigs(i), sigs(j)) && ham(sigs(i), sigs(j)) <= 3
    } yield (i, j, ham(sigs(i), sigs(j)).toLong)).sorted
    assert(want.nonEmpty, "fixture must produce near-dup pairs")
    for (cells <- Seq(1, 3)) {
      val got = Dedup.simhashPairs(docs, "doc_id", "text",
        maxHamming = 3, saltCells = cells).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
      assert(got == want, s"saltCells=$cells")
    }
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
    // compare SCORES too, not just ids: every ANN test downstream
    // checks "exact scores" against cosineTopK's own output, so this
    // is the one place the VALUE of the cosine is pinned against an
    // independent computation — ids alone would let an
    // order-preserving distortion ship green
    assert(got.toSeq == want)
  }

  test("LSH ANN multiprobe: recall@20 >= 0.8 vs brute force, exact scores") {
    import spark.implicits._
    val vecs = (0 until 400).map { i =>
      (i.toLong, Array.tabulate(16)(d =>
        (graft.Det.unit(graft.Det.h(9L, i, d)) * 2 - 1).toFloat))
    }
    val df = vecs.toDF("vec_id", "embedding").cache()
    val exact = Similarity.cosineTopK(df, "vec_id", "embedding", 1L, 400)
      .collect().map(r => r.getLong(0) -> r.getDouble(1))
    val exactTop20 = exact.take(20).map(_._1).toSet
    val exactScores = exact.toMap
    val approx = Similarity.lshTopK(df, "vec_id", "embedding", 1L, 20,
      numPlanes = 4, multiprobe = 2).collect()
      .map(r => (r.getLong(0), r.getDouble(1)))
    assert(approx.nonEmpty)
    approx.foreach { case (id, c) =>
      assert(exactScores(id) == c, s"vec $id score differs from brute force")
    }
    val recall = approx.count(x => exactTop20.contains(x._1)) / 20.0
    assert(recall >= 0.8, s"recall@20 = $recall < 0.8")
    // OR-of-tables union: 4 seed-mixed tables must lift recall to
    // >= 0.9 (the single-table multiprobe floor above is 0.8)
    val multi = Similarity.lshTopK(df, "vec_id", "embedding", 1L, 20,
      numPlanes = 4, multiprobe = 2, numTables = 4).collect()
      .map(r => (r.getLong(0), r.getDouble(1)))
    multi.foreach { case (id, c) =>
      assert(exactScores(id) == c, s"vec $id score differs (multi-table)")
    }
    val recall4 = multi.count(x => exactTop20.contains(x._1)) / 20.0
    assert(recall4 >= 0.9, s"multi-table recall@20 = $recall4 < 0.9")
    assert(recall4 >= recall,
      s"more tables reduced recall: $recall4 < $recall")
  }

  test("IVF ANN: exact scores, subset of brute force, recall reported") {
    import spark.implicits._
    val vecs = (0 until 300).map { i =>
      (i.toLong, Array.tabulate(16)(d =>
        (graft.Det.unit(graft.Det.h(11L, i, d)) * 2 - 1).toFloat))
    }
    val df = vecs.toDF("vec_id", "embedding").cache()
    val exact = Similarity.cosineTopK(df, "vec_id", "embedding", 2L, 300)
      .collect().map(r => r.getLong(0) -> r.getDouble(1))
    val exactScores = exact.toMap
    val exactTop10 = exact.take(10).map(_._1).toSet
    val approx = Similarity.ivfTopK(df, "vec_id", "embedding", 2L, 10,
      numCentroids = 12, probes = 4).collect()
      .map(r => (r.getLong(0), r.getDouble(1)))
    assert(approx.nonEmpty)
    approx.foreach { case (id, c) =>
      assert(exactScores(id) == c, s"vec $id score differs from brute force")
    }
    val recall = approx.count(x => exactTop10.contains(x._1)) / 10.0
    assert(recall >= 0.5, s"recall@10 = $recall < 0.5 (probes=4/12)")
  }

  test("binary sniff classifies every hand-authored fixture") {
    import spark.implicits._
    val got = graft.data.ExtractFixtures.sniff
      .map { case (id, bytes, _) => (id, bytes) }
      .toDF("fixture_id", "payload")
      .select(org.apache.spark.sql.functions.col("fixture_id"),
        TextOps.sniffType(
          org.apache.spark.sql.functions.col("payload")).as("ct"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    graft.data.ExtractFixtures.sniff.foreach { case (id, _, want) =>
      assert(got(id) == want, s"fixture $id: got ${got(id)}, want $want")
    }
  }

  test("embedding block-pair join == naive all-pairs at threshold") {
    import spark.implicits._
    val vecs = (0 until 120).map { i =>
      (i.toLong, Array.tabulate(12)(d =>
        (graft.Det.unit(graft.Det.h(7L, i, d)) * 2 - 1).toFloat))
    }
    val df = vecs.toDF("vec_id", "embedding")
    def cosR(a: Array[Float], b: Array[Float]): Double = {
      var dot = 0.0; var na = 0.0; var nb = 0.0
      for (d <- a.indices) {
        dot += a(d).toDouble * b(d).toDouble
        na += a(d).toDouble * a(d).toDouble
        nb += b(d).toDouble * b(d).toDouble
      }
      java.math.BigDecimal.valueOf(dot / (math.sqrt(na) * math.sqrt(nb)))
        .setScale(4, java.math.RoundingMode.HALF_UP).doubleValue()
    }
    val want = (for {
      i <- vecs.indices; j <- (i + 1) until vecs.length
      c = cosR(vecs(i)._2, vecs(j)._2) if c >= 0.3
    } yield (vecs(i)._1, vecs(j)._1, c)).sortBy(x => (x._1, x._2))
    assert(want.nonEmpty, "test needs a nonempty expected pair set")
    for (blocks <- Seq(1, 4, 7)) {
      val got = Dedup.embeddingPairsExact(df, "vec_id", "embedding",
        0.3, numBlocks = blocks).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
      assert(got == want, s"numBlocks=$blocks differs from naive all-pairs")
    }
  }

  test("minhash salted cells: any saltCells gives identical pairs (skew)") {
    // one hot band value: 12 near-identical docs all share every band
    val base = (1 to 40).map(i => s"tok$i")
    val docs = (0 until 12).map(i => (i.toLong, base.mkString(" "))) ++
      Seq(100L -> (200 to 240).map(i => s"tok$i").mkString(" "))
    val df = docsDf(docs)
    val ref = Dedup.minhashLsh(df, "doc_id", "text", 16, 4, 0.2,
      saltCells = 1).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
    assert(ref.size == 12 * 11 / 2, "expected all hot-bucket pairs")
    for (s <- Seq(3, 5)) {
      val got = Dedup.minhashLsh(df, "doc_id", "text", 16, 4, 0.2,
        saltCells = s).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
      assert(got == ref, s"saltCells=$s changed the pair set")
    }
  }

  test("langid picks marker-dominant language") {
    val df = docsDf(Seq(
      1L -> "the cat is of the mat and to in",
      2L -> "der hund und die katze ist",
      3L -> "le chat et la maison est",
      4L -> "xyz abc qqq"))
    val res = df.select(col("doc_id"),
      TextOps.langId(col("text")).as("l")).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(res == Map(1L -> "en", 2L -> "de", 3L -> "fr", 4L -> "und"))
  }
}
