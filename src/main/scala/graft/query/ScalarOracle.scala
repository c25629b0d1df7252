package graft.query

import graft.functions.Tokenize

/** Slow, obviously-correct in-memory BM25 oracle. The distributed
  * engine must match its top-k docIDs AND scores bit-for-bit
  * (rank-identical gate of the north rule). Goldens for the committed
  * query set are produced by this oracle (FIXTURES.md §2; ancestor:
  * the reference's round-trip fidelity golden,
  * /root/reference/packages/core/tests/test_geoparquet_roundtrip.py:20-60).
  *
  * Determinism contract shared with the engine:
  *  - tokenizer = [[graft.functions.Tokenize]]
  *  - idf/score = [[BM25]]
  *  - per-doc score = sum of term contributions in ascending
  *    first-occurrence order of the query's unique terms
  *  - tie-break = score desc, docId asc
  */
object ScalarOracle {

  final case class Corpus(n: Long, avgdl: Double,
                          tf: Map[String, Map[Long, Int]],
                          dl: Map[Long, Int])

  def corpus(docs: Seq[(Long, String)]): Corpus = {
    val tf = scala.collection.mutable.Map.empty[String,
      scala.collection.mutable.Map[Long, Int]]
    val dl = scala.collection.mutable.Map.empty[Long, Int]
    docs.foreach { case (id, text) =>
      val toks = Tokenize.tokens(text)
      dl(id) = toks.length
      toks.foreach { t =>
        val m = tf.getOrElseUpdate(t, scala.collection.mutable.Map.empty)
        m(id) = m.getOrElse(id, 0) + 1
      }
    }
    val n = docs.size.toLong
    // integer sum / count — exact, matching the engine's stats stage
    val avgdl = if (n == 0) 0.0 else dl.values.map(_.toLong).sum.toDouble / n
    Corpus(n, avgdl, tf.map { case (k, v) => k -> v.toMap }.toMap,
      dl.toMap)
  }

  def topK(c: Corpus, query: String, k: Int,
           and: Boolean = false): Seq[(Long, Double)] = {
    val terms = Tokenize.tokens(query).distinct.toSeq
    if (terms.isEmpty) return Seq.empty
    val present = terms.filter(t => c.tf.contains(t))
    if (and && present.size != terms.size) return Seq.empty
    if (present.isEmpty) return Seq.empty
    val candidates: Set[Long] =
      if (and) present.map(t => c.tf(t).keySet).reduce(_ intersect _)
      else present.flatMap(t => c.tf(t).keySet).toSet
    val scored = candidates.toSeq.map { d =>
      var s = 0.0
      // ascending first-occurrence order — same as the engine
      present.foreach { t =>
        c.tf(t).get(d).foreach { f =>
          s += BM25.score(f.toLong, c.dl(d).toLong, c.avgdl,
            BM25.idf(c.n, c.tf(t).size.toLong))
        }
      }
      (d, s)
    }
    scored.sortBy { case (d, s) => (-s, d) }.take(k)
  }
}
