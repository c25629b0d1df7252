package graft.query

import graft.index.{Codec, SegmentBlock}

/** One term-run cursor: decode-on-demand iteration over the compressed
  * posting blocks of a single storage key (a term, or one salted
  * sub-run of a hot term), restricted to a docId window [lo, hi).
  *
  * Blocks decode lazily: `advanceShallow` moves between blocks using
  * only (firstDocId, lastDocId, maxTf/minDl) metadata — the skip that
  * makes block-max WAND cheaper than exhaustive evaluation. Block
  * upper bounds are computed HERE from the current global stats
  * (idf, avgdl), so they stay exact across incremental index
  * generations.
  */
final class Cursor(val termIdx: Int, val idf: Double,
                   blocks: Array[SegmentBlock], avgdl: Double,
                   lo: Long, hi: Long,
                   dlOf: Long => Long = null) {

  /** Exact upper bound of a block under CURRENT stats: BM25 is
    * monotone ↑ in tf and ↓ in dl.
    */
  @inline private def blockUb(b: SegmentBlock): Double =
    BM25.score(b.maxTf.toLong, b.minDl.toLong, avgdl, idf)

  /** Term-level upper bound for WAND pivoting. */
  val ub: Double =
    if (blocks.isEmpty) 0.0 else blocks.map(blockUb).max

  private var bi = 0               // current block index
  private var docs: Array[Long] = _
  private var tfs: Array[Long] = _
  private var pi = 0               // position inside decoded block
  var curDoc: Long = -1L

  advanceTo(lo)

  def exhausted: Boolean = curDoc == Long.MaxValue

  /** Max score of the CURRENT block (block-max bound). */
  def blockMax: Double =
    if (bi < blocks.length) blockUb(blocks(bi)) else 0.0

  /** Last docId of the current block (skip target for block-max). */
  def blockLast: Long =
    if (bi < blocks.length) blocks(bi).lastDocId else Long.MaxValue

  private var poss: Array[Array[Int]] = _

  private def decode(): Unit = {
    val b = blocks(bi)
    docs = Codec.decodeDeltas(b.docIdsEnc, b.n, b.firstDocId)
    tfs = Codec.decodeVarByte(b.tfsEnc, b.n)
    poss = null // positions decode lazily — only phrase queries pay
    pi = 0
  }

  /** Token positions of the current posting (requires an index built
    * with `withPositions`; empty otherwise).
    */
  def positions: Array[Int] = {
    if (poss == null) {
      val b = blocks(bi)
      poss =
        if (b.posEnc == null || b.posEnc.isEmpty)
          Array.fill(b.n)(Array.empty[Int])
        else Codec.decodePositionsBlock(b.posEnc, b.n)
    }
    poss(pi)
  }

  /** Move block pointer (metadata only) to the first block whose
    * lastDocId >= target; returns false when exhausted.
    */
  def advanceShallow(target: Long): Boolean = {
    if (docs != null && bi < blocks.length && blocks(bi).lastDocId >= target)
      return true
    docs = null
    while (bi < blocks.length && blocks(bi).lastDocId < target) bi += 1
    bi < blocks.length
  }

  /** Advance to the first docId >= target (decodes the block). */
  def advanceTo(target0: Long): Long = {
    val target = math.max(target0, lo)
    if (curDoc != Long.MaxValue && curDoc >= target && curDoc >= lo &&
        docs != null) return curDoc
    if (!advanceShallow(target)) { curDoc = Long.MaxValue; return curDoc }
    if (docs == null) decode()
    while (pi < docs.length && docs(pi) < target) pi += 1
    while (pi >= docs.length) {
      bi += 1
      if (bi >= blocks.length) { curDoc = Long.MaxValue; return curDoc }
      decode()
    }
    curDoc = docs(pi)
    if (curDoc >= hi) curDoc = Long.MaxValue
    curDoc
  }

  def next(): Long = advanceTo(curDoc + 1)

  /** BM25 contribution of the current posting — dl comes from the
    * norms sidecar lookup, not the block (see [[graft.index.Norms]]).
    */
  def score: Double = BM25.score(tfs(pi), dlOf(docs(pi)), avgdl, idf)
}

/** Bounded min-heap of (score, docId) with the north rule's tie-break:
  * higher score wins; on equal score, LOWER docId wins. `threshold` is
  * the WAND θ — a candidate must beat the weakest kept entry.
  */
final class TopK(k: Int) {
  // k >= 1: with k = 0, threshold/offer would read scores(0) of a
  // zero-length array (callers guard k <= 0 with an early empty
  // return — this require turns a silent heap bug into a loud one)
  require(k >= 1, s"TopK needs k >= 1, got $k")
  // min-heap ordered by (score asc, docId desc) so the weakest entry
  // (lowest score, then highest docId) sits at the root.
  private val scores = new Array[Double](k)
  private val ids = new Array[Long](k)
  var size = 0

  private def worseThan(s1: Double, d1: Long, s2: Double, d2: Long): Boolean =
    s1 < s2 || (s1 == s2 && d1 > d2)

  def threshold: Double =
    if (size < k) Double.NegativeInfinity else scores(0)

  def offer(s: Double, d: Long): Unit = {
    if (size < k) {
      var i = size
      scores(i) = s; ids(i) = d; size += 1
      while (i > 0 && worseThan(scores(i), ids(i),
             scores((i - 1) / 2), ids((i - 1) / 2))) {
        swap(i, (i - 1) / 2); i = (i - 1) / 2
      }
    } else if (worseThan(scores(0), ids(0), s, d)) {
      scores(0) = s; ids(0) = d
      siftDown(0)
    }
  }

  private def swap(i: Int, j: Int): Unit = {
    val ts = scores(i); scores(i) = scores(j); scores(j) = ts
    val td = ids(i); ids(i) = ids(j); ids(j) = td
  }

  private def siftDown(i0: Int): Unit = {
    var i = i0
    var done = false
    while (!done) {
      val l = 2 * i + 1; val r = 2 * i + 2
      var m = i
      if (l < size && worseThan(scores(l), ids(l), scores(m), ids(m))) m = l
      if (r < size && worseThan(scores(r), ids(r), scores(m), ids(m))) m = r
      if (m == i) done = true else { swap(i, m); i = m }
    }
  }

  /** Drain best-first: (score desc, docId asc). */
  def result(): Array[(Long, Double)] = {
    val out = (0 until size).map(i => (ids(i), scores(i))).toArray
    out.sortBy { case (d, s) => (-s, d) }
  }
}

/** Block-max WAND top-k over a set of cursors (disjunctive OR
  * semantics — standard BM25 top-k), plus an exhaustive reference
  * evaluator and a conjunctive (AND) evaluator.
  *
  * The cursor sets for one (query, docId-range) task are built from
  * term-partitioned segments gathered by the scatter stage
  * (Searcher); salted sub-runs of one term appear as separate cursors
  * sharing `termIdx` — a doc lives in exactly one sub-run, so scores
  * stay exact.
  *
  * For bit-identical scores vs the scalar oracle, the final evaluation
  * sums per-term contributions in ascending `termIdx` order
  * (floating-point addition is not associative — SURVEY.md §7).
  */
object Wand {

  /** Deterministic-order sum of contributions at the pivot doc. */
  private def fullScore(matched: Array[Cursor], n: Int): Double = {
    java.util.Arrays.sort(matched, 0, n,
      Ordering.by((c: Cursor) => c.termIdx))
    var s = 0.0
    var i = 0
    while (i < n) { s += matched(i).score; i += 1 }
    s
  }

  /** Exhaustive disjunctive evaluation (document-at-a-time union).
    * `masked` docIds (tombstoned by a re-crawl delta) are never
    * offered to the heap.
    */
  def exhaustiveOr(cursors: Array[Cursor], k: Int,
                   masked: Long => Boolean = null): Array[(Long, Double)] = {
    val heap = new TopK(k)
    val buf = new Array[Cursor](cursors.length)
    var live = cursors.filterNot(_.exhausted)
    while (live.nonEmpty) {
      var min = Long.MaxValue
      live.foreach(c => if (c.curDoc < min) min = c.curDoc)
      var n = 0
      live.foreach { c => if (c.curDoc == min) { buf(n) = c; n += 1 } }
      if (masked == null || !masked(min)) {
        val s = fullScore(buf, n)
        heap.offer(s, min)
      }
      var i = 0
      while (i < n) { buf(i).next(); i += 1 }
      live = live.filterNot(_.exhausted)
    }
    heap.result()
  }

  /** Block-max WAND (Broder et al. WAND + Ding/Suel block-max skips).
    * Exact: returns the same top-k as [[exhaustiveOr]].
    *
    * `floor` seeds the threshold with a global lower bound on the
    * k-th score (MaxScore θ₀): a candidate below the floor cannot be
    * in the GLOBAL top-k, so partial top-k tasks may skip it even
    * while their own heap is not yet full. Pass NegativeInfinity for
    * the unseeded classic behavior.
    */
  /** Single-term top-k by IMPACT ORDER: when a task's entire cursor
    * set belongs to ONE term (the single-stopword query — each doc
    * appears in exactly one salted sub-run, so per-posting scores are
    * independent and no docId alignment is needed), process blocks in
    * upper-bound-descending order and stop as soon as the best
    * remaining bound cannot beat θ = max(heap floor, θ₀). wandOr on
    * the same input degenerates to an exhaustive docId-ordered merge
    * (every sub-run cursor re-sorted per pivot); here the heap floor
    * rises after the few highest-impact blocks and the Zipf tail is
    * skipped WITHOUT decoding — the q0 bench query (top stopword)
    * measured 2.4 s → ~0.3 s at 120k docs. Exactness: blocks with
    * ub == θ still decode (score ties break by docId), and ub < θ
    * implies every posting scores ≤ ub < θ ≤ kth-best, so nothing
    * prunable can reach the merged top-k.
    */
  def singleTermTopK(blocks: Array[SegmentBlock], idf: Double,
                     avgdl: Double, k: Int, lo: Long, hi: Long,
                     floor: Double = Double.NegativeInfinity,
                     masked: Long => Boolean = null,
                     dlOf: Long => Long): Array[(Long, Double)] = {
    val heap = new TopK(k)
    val inWindow = blocks.filter(b => b.lastDocId >= lo && b.firstDocId < hi)
    val ubs = inWindow.map(b =>
      BM25.score(b.maxTf.toLong, b.minDl.toLong, avgdl, idf))
    val order = ubs.indices.sortBy(i => -ubs(i))
    var oi = 0
    var done = false
    while (oi < order.length && !done) {
      val i = order(oi)
      val theta = math.max(heap.threshold, floor)
      if (ubs(i) < theta) done = true // sorted desc: the rest are lower
      else {
        val b = inWindow(i)
        val ds = Codec.decodeDeltas(b.docIdsEnc, b.n, b.firstDocId)
        val ts = Codec.decodeVarByte(b.tfsEnc, b.n)
        var j = 0
        while (j < b.n) {
          val d = ds(j)
          if (d >= lo && d < hi && (masked == null || !masked(d)))
            heap.offer(BM25.score(ts(j), dlOf(d), avgdl, idf), d)
          j += 1
        }
      }
      oi += 1
    }
    heap.result()
  }

  def wandOr(cursors0: Array[Cursor], k: Int,
             floor: Double = Double.NegativeInfinity,
             masked: Long => Boolean = null): Array[(Long, Double)] = {
    val heap = new TopK(k)
    var cursors = cursors0.filterNot(_.exhausted)
    val matchedBuf = new Array[Cursor](cursors0.length)
    while (cursors.nonEmpty) {
      // order by current docId
      java.util.Arrays.sort(cursors,
        Ordering.by((c: Cursor) => c.curDoc))
      // find pivot: first prefix whose UB sum exceeds θ
      val theta = math.max(heap.threshold, floor)
      var acc = 0.0
      var p = -1
      var i = 0
      while (p < 0 && i < cursors.length) {
        acc += cursors(i).ub
        if (acc > theta) p = i
        i += 1
      }
      if (p < 0) return heap.result() // no prefix can beat θ
      val pivotDoc = cursors(p).curDoc
      if (pivotDoc == Long.MaxValue) return heap.result()
      // extend the pivot prefix over ALL cursors parked on pivotDoc —
      // they contribute to its score, so the block-max check and the
      // skip bound must include them
      while (p + 1 < cursors.length && cursors(p + 1).curDoc == pivotDoc)
        p += 1
      if (cursors(0).curDoc == pivotDoc) {
        // all leading cursors aligned on pivot: block-max check
        var bmSum = 0.0
        var j = 0
        var minBlockLast = Long.MaxValue
        while (j <= p) {
          val c = cursors(j)
          c.advanceShallow(pivotDoc)
          bmSum += c.blockMax
          if (c.blockLast < minBlockLast) minBlockLast = c.blockLast
          j += 1
        }
        if (bmSum > theta) {
          // full evaluation at pivotDoc (masked docs advance past
          // without scoring — a tombstoned doc must never surface)
          var n = 0
          var j2 = 0
          while (j2 < cursors.length && cursors(j2).curDoc == pivotDoc) {
            matchedBuf(n) = cursors(j2); n += 1; j2 += 1
          }
          if (masked == null || !masked(pivotDoc)) {
            val s = fullScore(matchedBuf, n)
            heap.offer(s, pivotDoc)
          }
          var j3 = 0
          while (j3 < n) { matchedBuf(j3).advanceTo(pivotDoc + 1); j3 += 1 }
        } else {
          // No doc in [pivotDoc, min(blockLast)] ∩ (-∞, next cursor's
          // doc) can beat θ — jump past the earliest of those bounds.
          var target = minBlockLast + 1
          if (p + 1 < cursors.length)
            target = math.min(target, cursors(p + 1).curDoc)
          target = math.max(target, pivotDoc + 1)
          var j4 = 0
          while (j4 <= p) { cursors(j4).advanceTo(target); j4 += 1 }
        }
      } else {
        // advance the leading cursor with the largest UB up to pivot
        var best = 0
        var j5 = 0
        while (cursors(j5).curDoc < pivotDoc) {
          if (cursors(j5).ub > cursors(best).ub) best = j5
          j5 += 1
        }
        cursors(best).advanceTo(pivotDoc)
      }
      cursors = cursors.filterNot(_.exhausted)
    }
    heap.result()
  }

  /** Intersect sorted int array `a` with (`b` − `off`): the phrase
    * step — a candidate start position p survives slot k iff p + k is
    * a position of slot k's term.
    */
  private def intersectShift(a: Array[Int], b: Array[Int],
                             off: Int): Array[Int] = {
    val out = new scala.collection.mutable.ArrayBuilder.ofInt
    var i = 0
    var j = 0
    while (i < a.length && j < b.length) {
      val bv = b(j) - off
      if (a(i) == bv) { out += a(i); i += 1; j += 1 }
      else if (a(i) < bv) i += 1
      else j += 1
    }
    out.result()
  }

  /** Phrase matching: `slotGroups(k)` holds the cursors (salt
    * sub-runs, possibly across index generations) of the term at
    * phrase slot k — duplicated term objects for repeated words. A doc
    * matches iff some position p has slot k's term at p + k for every
    * k. Intersection gallops on slot 0's postings; positions decode
    * only for docs that already matched every slot (AND first, verify
    * second — the candidate set a full scan would never shrink).
    */
  /** AND-intersection without position verify: the full matching
    * docId set of a conjunctive term query (export / bulk retrieval
    * path — no scoring, no top-k heap, emits every match).
    */
  def andDocs(slotGroups: Array[Array[Cursor]]): Array[Long] =
    matchDocs(slotGroups, verifyPositions = false)

  def phraseDocs(slotGroups: Array[Array[Cursor]]): Array[Long] =
    matchDocs(slotGroups, verifyPositions = true)

  private def matchDocs(slotGroups: Array[Array[Cursor]],
                        verifyPositions: Boolean): Array[Long] = {
    if (slotGroups.isEmpty ||
        slotGroups.exists(g => g.isEmpty || g.forall(_.exhausted)))
      return Array.empty
    val out = new scala.collection.mutable.ArrayBuilder.ofLong
    val drv = slotGroups(0)
    val hits = new Array[Cursor](slotGroups.length)
    def drvMin: Long = {
      var m = Long.MaxValue
      drv.foreach(c => if (!c.exhausted && c.curDoc < m) m = c.curDoc)
      m
    }
    var cand = drvMin
    while (cand != Long.MaxValue) {
      var ok = true
      var k = 0
      while (ok && k < slotGroups.length) {
        val g = slotGroups(k)
        var hit: Cursor = null
        var ci = 0
        while (hit == null && ci < g.length) {
          val c = g(ci)
          if (!c.exhausted) {
            c.advanceTo(cand)
            if (c.curDoc == cand) hit = c
          }
          ci += 1
        }
        if (hit == null) ok = false else hits(k) = hit
        k += 1
      }
      if (ok) {
        if (!verifyPositions) out += cand
        else {
          // position verify
          var p = hits(0).positions
          var k2 = 1
          while (p.nonEmpty && k2 < slotGroups.length) {
            p = intersectShift(p, hits(k2).positions, k2)
            k2 += 1
          }
          if (p.nonEmpty) out += cand
        }
      }
      drv.foreach(c =>
        if (!c.exhausted && c.curDoc <= cand) c.advanceTo(cand + 1))
      cand = drvMin
    }
    out.result()
  }

  /** Conjunctive (AND) top-k: a doc qualifies only if every term group
    * matches it. `groups(t)` holds the cursors (salt sub-runs) of term
    * t. Driver list = the group with the smallest df; membership in
    * other groups checked by galloping `advanceTo` (the posting-list
    * intersection of SURVEY.md §2.3).
    *
    * Block-max pruning (the OR path's skip, adapted): once the heap is
    * full, bound any doc in [cand, L] by Σ_g max(blockMax over g's
    * cursors), where L = min over all live cursors' blockLast — each
    * cursor's block bound holds only up to its own block end, so the
    * window ends at the earliest one. If the bound can't beat θ, jump
    * the driver past L without decoding anything. θ₀-style floors are
    * NOT seeded for AND: result counts are unknown a priori, so no
    * safe global lower bound exists (SURVEY.md §2.5 tie-in).
    */
  def intersectAnd(groups: Array[Array[Cursor]], k: Int,
                   masked: Long => Boolean = null): Array[(Long, Double)] = {
    if (groups.isEmpty || groups.exists(_.forall(_.exhausted)))
      return Array.empty
    val heap = new TopK(k)
    // Caller passes groups sorted by df ascending: groups(0) drives.
    val drv = groups(0)
    val others = groups.drop(1)
    val matched = new Array[Cursor](groups.map(_.length).sum)
    def drvMin: Long = {
      var m = Long.MaxValue
      drv.foreach(c => if (!c.exhausted && c.curDoc < m) m = c.curDoc)
      m
    }
    var cand = drvMin
    while (cand != Long.MaxValue) {
      // block-max gate (metadata only, no decode)
      var skipTo = -1L
      if (heap.size >= k) {
        val theta = heap.threshold
        var bound = 0.0
        var minLast = Long.MaxValue
        var gi = 0
        var dead = false
        while (!dead && gi < groups.length) {
          val g = groups(gi)
          var gMax = 0.0
          var any = false
          var ci = 0
          while (ci < g.length) {
            val c = g(ci)
            if (!c.exhausted && c.advanceShallow(cand)) {
              any = true
              if (c.blockMax > gMax) gMax = c.blockMax
              if (c.blockLast < minLast) minLast = c.blockLast
            }
            ci += 1
          }
          if (!any) dead = true // a required term has no postings left
          bound += gMax
          gi += 1
        }
        if (dead) return heap.result()
        if (bound <= theta && minLast >= cand) skipTo = minLast + 1
      }
      if (skipTo > cand) {
        drv.foreach(c =>
          if (!c.exhausted && c.curDoc < skipTo) c.advanceTo(skipTo))
      } else {
        var ok = true
        var n = 0
        // a doc lives in exactly one salt sub-run of a term
        drv.foreach(c =>
          if (!c.exhausted && c.curDoc == cand) { matched(n) = c; n += 1 })
        var gi = 0
        while (ok && gi < others.length) {
          val g = others(gi)
          var hit: Cursor = null
          var ci = 0
          while (hit == null && ci < g.length) {
            val c = g(ci)
            if (!c.exhausted) {
              c.advanceTo(cand)
              if (c.curDoc == cand) hit = c
            }
            ci += 1
          }
          if (hit == null) ok = false else { matched(n) = hit; n += 1 }
          gi += 1
        }
        if (ok && (masked == null || !masked(cand)))
          heap.offer(fullScore(matched, n), cand)
        drv.foreach(c =>
          if (!c.exhausted && c.curDoc <= cand) c.advanceTo(cand + 1))
      }
      cand = drvMin
    }
    heap.result()
  }
}
