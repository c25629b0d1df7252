package graft.query

/** BM25 scoring (k1 = 1.2, b = 0.75 per the north rule), Lucene-style
  * non-negative idf. All three score consumers — the segment encoder
  * (block-max bounds), the distributed query engine, and the scalar
  * golden oracle — call exactly these functions, so scores are
  * bit-identical across them.
  */
object BM25 {
  val K1 = 1.2
  val B = 0.75

  def idf(numDocs: Long, df: Long): Double =
    math.log(1.0 + (numDocs - df + 0.5) / (df + 0.5))

  def score(tf: Long, dl: Long, avgdl: Double, idf: Double): Double =
    idf * tf * (K1 + 1.0) / (tf + K1 * (1.0 - B + B * dl / avgdl))
}
