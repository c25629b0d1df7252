package graft.data

import graft.Det

/** The committed "reference query set" (FIXTURES.md §2): ~50
  * deterministic queries over the synthetic vocabulary — single-term
  * (stopword and rare), multi-term AND-able, stopword-heavy, and
  * guaranteed no-hit queries. Derived purely from (seed, queryId) so
  * goldens are reproducible.
  */
object QuerySet {

  import graft.query.QuerySpec

  def queries(seed: Long = PagesGen.DefaultSeed): Seq[QuerySpec] = {
    def w(rank: Int) = PagesGen.word(rank)
    def zipfRank(qid: Long, j: Long): Int =
      PagesGen.sampleRank(Det.unit(Det.h(seed, 7000 + qid, j)))
    val qs = scala.collection.mutable.ArrayBuffer.empty[QuerySpec]
    var id = 0L
    def add(text: String): Unit = { qs += QuerySpec(id, text); id += 1 }
    // 10 single-term: 5 stopwords, 5 mid/rare ranks
    (0 until 5).foreach(i => add(w(i)))
    Seq(120, 850, 4200, 17000, 43000).foreach(r => add(w(r)))
    // 15 two-term mixes (stopword + content, content + content)
    (0 until 15).foreach { i =>
      add(s"${w(zipfRank(id, 1))} ${w(zipfRank(id, 2))}")
    }
    // 10 three-term
    (0 until 10).foreach { i =>
      add(s"${w(zipfRank(id, 1))} ${w(zipfRank(id, 2))} ${w(zipfRank(id, 3))}")
    }
    // 5 stopword-heavy (top ranks only — the skew torture case)
    (0 until 5).foreach { i =>
      add(s"${w(i % 3)} ${w((i + 1) % 5)} ${w((i + 2) % 7)}")
    }
    // 5 with punctuation / case noise (tokenizer exercise)
    add(s"${w(10).toUpperCase}, ${w(11)}!")
    add(s"  ${w(2)}\t${w(900)} ")
    add(s"${w(5)}-${w(6)}")
    add(s"<b>${w(30)}</b>")
    add(s"${w(1)}. ${w(1)} ${w(1)}") // duplicate terms collapse
    // 5 no-hit (tokens outside the vocab pattern)
    add("zzzznohit")
    add("qqqq wwww")
    add(s"${w(4)} zzzznohit") // mixed: OR hits, AND empty
    add("9999999")
    add("")
    qs.toSeq
  }
}
