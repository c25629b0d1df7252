package graft.query

import org.scalatest.funsuite.AnyFunSuite

import scala.util.Random

import graft.index.{Codec, SegmentBlock}

/** Property tests: block-max WAND must return exactly the same top-k
  * (docIds AND scores) as exhaustive evaluation, over randomized
  * posting lists, block sizes, k, and docId windows.
  */
class WandSpec extends AnyFunSuite {

  val avgdl = 100.0

  private def mkBlocks(skey: String, postings: Seq[(Long, Int, Int)],
                       blockSize: Int): Array[SegmentBlock] = {
    postings.sortBy(_._1).grouped(blockSize).zipWithIndex.map {
      case (chunk, bi) =>
        val ds = chunk.map(_._1).toArray
        val tfs = chunk.map(_._2.toLong).toArray
        SegmentBlock(0, 0L, skey, bi, ds.length, ds.head,
          ds.last, chunk.map(_._2).max, chunk.map(_._3).min,
          Codec.encodeDeltas(ds, ds.head),
          Codec.encodeVarByte(tfs),
          Array.emptyByteArray)
    }.toArray
  }

  /** dl lookup standing in for the norms sidecar. */
  private def dlOf(postings: Seq[(Long, Int, Int)]): Long => Long = {
    val m = postings.map(p => p._1 -> p._3.toLong).toMap
    d => m(d)
  }

  private def mkCursor(termIdx: Int, blocks: Array[SegmentBlock],
                       n: Long, df: Long, dl: Long => Long,
                       lo: Long = 0L,
                       hi: Long = Long.MaxValue): Cursor = {
    val idf = BM25.idf(n, df)
    new Cursor(termIdx, idf, blocks, avgdl, lo, hi, dl)
  }

  private def randPostings(rnd: Random, maxDoc: Long,
                           count: Int): Seq[(Long, Int, Int)] = {
    val docs = Iterator.continually(rnd.nextLong().abs % maxDoc)
      .take(count * 2).toSeq.distinct.take(count).sorted
    docs.map(d => (d, 1 + rnd.nextInt(5), 20 + rnd.nextInt(300)))
  }

  test("wandOr == exhaustiveOr across random cursor sets") {
    val rnd = new Random(1234)
    val n = 10000L
    (0 until 60).foreach { trial =>
      val numTerms = 1 + rnd.nextInt(4)
      val blockSize = 1 + rnd.nextInt(16)
      val k = 1 + rnd.nextInt(12)
      val cursorSets = (0 until numTerms).map { t =>
        val count = 1 + rnd.nextInt(300)
        val postings = randPostings(rnd, 2000L, count)
        val df = postings.size.toLong
        (mkBlocks(s"t$t", postings, blockSize), t, df, dlOf(postings))
      }
      def cursors() = cursorSets.map { case (bs, t, df, dl) =>
        mkCursor(t, bs, n, df, dl)
      }.toArray
      val a = Wand.exhaustiveOr(cursors(), k)
      val b = Wand.wandOr(cursors(), k)
      assert(a.toSeq == b.toSeq, s"trial $trial: wandOr != exhaustive")
    }
  }

  test("singleTermTopK == exhaustiveOr over salted sub-runs, windows, floors") {
    val rnd = new Random(4321)
    val n = 10000L
    (0 until 60).foreach { trial =>
      val blockSize = 1 + rnd.nextInt(16)
      val k = 1 + rnd.nextInt(12)
      val count = 1 + rnd.nextInt(400)
      val postings = randPostings(rnd, 2000L, count)
      val df = postings.size.toLong
      val idf = BM25.idf(n, df)
      val dl = dlOf(postings)
      // split into salted sub-runs by docId hash, like the builder
      val salts = 1 + rnd.nextInt(4)
      val subRuns = postings.groupBy(p => (p._1 % salts).toInt).toSeq
      val blocks = subRuns.flatMap { case (s, ps) =>
        mkBlocks(s"t0#$s", ps, blockSize)
      }.toArray
      val (lo, hi) =
        if (rnd.nextBoolean()) (0L, Long.MaxValue)
        else { val a = rnd.nextLong().abs % 2000L
               (a, a + rnd.nextLong().abs % 2000L) }
      def cursors() = subRuns.map { case (_, ps) =>
        mkCursor(0, mkBlocks("t0", ps, blockSize), n, df, dl, lo, hi)
      }.toArray
      val want = Wand.exhaustiveOr(cursors(), k)
      // exact kth score as the tightest valid floor (nextDown: ties
      // at the floor must survive, same contract as the probe)
      val floor =
        if (want.length >= k && rnd.nextBoolean())
          Math.nextDown(want.last._2)
        else Double.NegativeInfinity
      val got = Wand.singleTermTopK(blocks, idf, avgdl, k, lo, hi,
        floor, null, dl)
      assert(got.toSeq == want.toSeq,
        s"trial $trial: singleTermTopK != exhaustive " +
          s"(salts=$salts k=$k window=[$lo,$hi))")
    }
  }

  test("wandOr with the TIGHTEST valid floor (exact kth score) is exact") {
    val rnd = new Random(777)
    val n = 10000L
    (0 until 40).foreach { trial =>
      val numTerms = 1 + rnd.nextInt(4)
      val k = 1 + rnd.nextInt(10)
      val sets = (0 until numTerms).map { t =>
        val ps = randPostings(rnd, 1500L, 1 + rnd.nextInt(250))
        (mkBlocks(s"t$t", ps, 1 + rnd.nextInt(12)), t, ps.size.toLong,
          dlOf(ps))
      }
      def cursors() = sets.map { case (bs, t, df, dl) =>
        mkCursor(t, bs, n, df, dl) }.toArray
      val want = Wand.exhaustiveOr(cursors(), k)
      if (want.nonEmpty) {
        // the hardest floor that is still a valid lower bound on the
        // kth score — Searcher's θ₀ is always looser than this
        val floor = Math.nextDown(want.last._2)
        val got = Wand.wandOr(cursors(), k, floor)
        assert(got.toSeq == want.toSeq, s"trial $trial floored mismatch")
      }
    }
  }

  test("wandOr respects docId window [lo, hi)") {
    val rnd = new Random(99)
    val n = 5000L
    (0 until 30).foreach { trial =>
      val postings = randPostings(rnd, 1000L, 200)
      val blocks = mkBlocks("t0", postings, 8)
      val lo = rnd.nextInt(500).toLong
      val hi = lo + 1 + rnd.nextInt(500)
      val got = Wand.wandOr(
        Array(mkCursor(0, blocks, n, postings.size.toLong,
          dlOf(postings), lo, hi)), 50)
      val want = postings.filter(p => p._1 >= lo && p._1 < hi)
        .map { case (d, tf, dl) =>
          (d, BM25.score(tf.toLong, dl.toLong, avgdl,
            BM25.idf(n, postings.size.toLong)))
        }
        .sortBy { case (d, s) => (-s, d) }.take(50)
      assert(got.toSeq == want, s"trial $trial window [$lo,$hi)")
    }
  }

  test("intersectAnd == naive intersection") {
    val rnd = new Random(321)
    val n = 10000L
    (0 until 40).foreach { trial =>
      val numTerms = 2 + rnd.nextInt(3)
      val k = 1 + rnd.nextInt(10)
      val lists = (0 until numTerms).map { t =>
        randPostings(rnd, 400L, 30 + rnd.nextInt(200))
      }
      val groups = lists.zipWithIndex.sortBy(_._1.size).map {
        case (ps, t) =>
          Array(mkCursor(t, mkBlocks(s"t$t", ps, 7), n, ps.size.toLong,
            dlOf(ps)))
      }.toArray
      val got = Wand.intersectAnd(groups, k)
      // naive
      val common = lists.map(_.map(_._1).toSet).reduce(_ intersect _)
      val want = common.toSeq.map { d =>
        var s = 0.0
        lists.zipWithIndex.sortBy(_._2).foreach { case (ps, t) =>
          val hit = ps.find(_._1 == d).get
          s += BM25.score(hit._2.toLong, hit._3.toLong, avgdl,
            BM25.idf(n, ps.size.toLong))
        }
        (d, s)
      }.sortBy { case (d, s) => (-s, d) }.take(k)
      assert(got.toSeq == want, s"trial $trial AND mismatch")
    }
  }

  test("phraseDocs == naive substring over token streams") {
    val rnd = new Random(2024)
    // random docs over a tiny vocabulary so phrases repeat
    val vocab = Vector("a", "b", "c", "d", "e")
    (0 until 25).foreach { trial =>
      val nDocs = 30 + rnd.nextInt(40)
      val docs: Map[Long, Vector[String]] = (0 until nDocs).map { d =>
        d.toLong -> Vector.fill(3 + rnd.nextInt(40))(
          vocab(rnd.nextInt(vocab.size)))
      }.toMap
      val phraseLen = 2 + rnd.nextInt(3)
      val phrase = Vector.fill(phraseLen)(vocab(rnd.nextInt(vocab.size)))
      // per-term positional blocks
      def blocksFor(term: String, blockSize: Int): Array[SegmentBlock] = {
        val postings = docs.toSeq
          .map { case (d, ts) =>
            (d, ts.zipWithIndex.filter(_._1 == term).map(_._2).toArray)
          }
          .filter(_._2.nonEmpty).sortBy(_._1)
        postings.grouped(blockSize).zipWithIndex.map { case (chunk, bi) =>
          val ds = chunk.map(_._1).toArray
          val tfs = chunk.map(_._2.length.toLong).toArray
          val dls = chunk.map(x => docs(x._1).size.toLong).toArray
          val pos = new java.io.ByteArrayOutputStream()
          chunk.foreach(c => pos.write(Codec.encodePositions(c._2)))
          SegmentBlock(0, 0L, term, bi, ds.length, ds.head,
            ds.last, tfs.max.toInt, dls.min.toInt,
            Codec.encodeDeltas(ds, ds.head),
            Codec.encodeVarByte(tfs),
            pos.toByteArray)
        }.toArray
      }
      val bs = 1 + rnd.nextInt(8)
      val groups = phrase.map { t =>
        val blks = blocksFor(t, bs)
        if (blks.isEmpty) Array.empty[Cursor]
        else Array(new Cursor(0, 0.0, blks, avgdl, 0L, Long.MaxValue,
          _ => 1L))
      }.toArray
      val got = Wand.phraseDocs(groups).toSeq.sorted
      val needle = " " + phrase.mkString(" ") + " "
      val want = docs.toSeq.filter { case (_, ts) =>
        (" " + ts.mkString(" ") + " ").contains(needle)
      }.map(_._1).sorted
      assert(got == want,
        s"trial $trial phrase=${phrase.mkString(" ")}: got=$got want=$want")
    }
  }

  test("salted sub-runs of one term score identically to unsalted") {
    val rnd = new Random(555)
    val n = 8000L
    val postings = randPostings(rnd, 3000L, 600)
    val df = postings.size.toLong
    val whole = mkBlocks("t", postings, 16)
    // split by hash of docId into 3 sub-runs (as the builder salts)
    val subs = postings.groupBy(p =>
      graft.index.IndexBuilder.saltOf(p._1, 3))
      .toSeq.map { case (s, ps) => mkBlocks(s"t#$s", ps, 16) }
    val dl = dlOf(postings)
    val unsalted = Wand.wandOr(Array(mkCursor(0, whole, n, df, dl)), 20)
    val salted = Wand.wandOr(
      subs.map(bs => mkCursor(0, bs, n, df, dl)).toArray, 20)
    assert(unsalted.toSeq == salted.toSeq)
  }
}
