package graft.query

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.Tokenize
import graft.index.{IndexBuilder, IndexPaths, SegmentBlock, TermMeta}

case class QuerySpec(queryId: Long, text: String)
case class SearchHit(queryId: Long, rank: Int, docId: Long, score: Double)

/** Distributed BM25 top-k over the term-partitioned segment files —
  * the serve path of the loop (reference ancestor: `POST /search`,
  * /root/reference/packages/api/spheraform_api/routers/search.py:16-77,
  * re-expressed as a scatter/gather Spark job per the north rule).
  *
  * Plan for a batch of queries:
  *   1. driver: tokenize queries (same Tokenize as the build), look up
  *      per-term (df, saltCount) from the terms dictionary with a
  *      termHash pushdown filter (dictionary is range-sorted by
  *      termHash → row-group pruning),
  *   2. scan only touched segments: partition pruning on `bucket` +
  *      min/max pruning on `termHash` (blocks are sorted by termHash
  *      within files),
  *   3. scatter: each block is keyed by (queryId, docId-range); a
  *      stopword's giant posting list is thereby split across ranges
  *      so no single task owns it,
  *   4. gather: per (queryId, range) task builds cursors and runs
  *      block-max WAND (or conjunctive intersection) over a bounded
  *      min-heap → partial top-k,
  *   5. final merge per queryId: k·R tiny rows → exact global top-k
  *      with the (score desc, docId asc) tie-break.
  *
  * Exactness across ranges: ranges partition docId space; a block
  * straddling a boundary is sent to every range it overlaps and each
  * task's cursors mask docIds outside the task's window, so every doc
  * is scored exactly once with all its terms present.
  */
object Searcher {

  sealed trait Mode
  case object Or extends Mode  // disjunctive BM25 top-k (default)
  case object And extends Mode // conjunctive: doc must match all terms

  /** Per-index driver-side dictionary cache: term → Some(meta) or
    * None (negative entry). A serving deployment keeps this hot; at
    * web scale it holds only QUERIED terms, never the dictionary.
    * Bounded defensively; an index rebuild under the same path must
    * call [[invalidateTermCache]].
    */
  private val termCaches =
    new java.util.concurrent.ConcurrentHashMap[String,
      java.util.concurrent.ConcurrentHashMap[String, Option[TermMeta]]]()

  private def termCacheFor(dir: String) = {
    val c = termCaches.computeIfAbsent(dir,
      _ => new java.util.concurrent.ConcurrentHashMap[String,
        Option[TermMeta]]())
    if (c.size > 200000) c.clear() // crude bound; cache is advisory
    c
  }

  def invalidateTermCache(dir: String): Unit = termCaches.remove(dir)

  /** Per-generation pruned dictionary lookup through the shared
    * positive/negative term cache: one termHash-pushdown scan per
    * generation fetches only cache misses (the dictionary is
    * range-sorted by termHash, so the scan touches 1-2 row groups per
    * term, never the dictionary). Shared by the BM25 and match paths —
    * the logic is exactness-adjacent (negative caching, collision
    * filter), so exactly one copy exists.
    */
  private def lookupMetas(spark: SparkSession, indexDirs: Seq[String],
                          terms: Seq[String]): Seq[Map[String, TermMeta]] = {
    import spark.implicits._
    indexDirs.map { d =>
      val cache = termCacheFor(d)
      val missing = terms.filterNot(cache.containsKey)
      if (missing.nonEmpty) {
        val missingHashes = missing.map(IndexBuilder.xxhash)
        val fetched = spark.read.parquet(s"$d/terms")
          .filter($"termHash".isin(missingHashes: _*))
          .as[TermMeta].collect()
          .filter(t => missing.contains(t.term)) // hash-collision guard
          .map(t => t.term -> t).toMap
        missing.foreach(t =>
          cache.put(t, fetched.get(t))) // negative-cache absent terms
      }
      terms.flatMap(t =>
        Option(cache.get(t)).flatten.map(t -> _)).toMap
    }
  }

  /** Storage keys of a term in one generation: the salted sub-run keys
    * when the build split it, else the term itself. The salt layout is
    * per-generation (saltCount depends on that generation's df).
    */
  private def storageKeys(term: String, tm: TermMeta): Seq[String] =
    if (tm.saltCount > 1)
      (0 until tm.saltCount).map(s => IndexBuilder.saltKey(term, s))
    else Seq(term)

  /** docId → scatter range (floor split of [0, maxDoc) into `ranges`). */
  private def rangeOf(docId: Long, ranges: Int, maxDoc: Long): Int =
    math.min(ranges - 1, (docId * ranges / math.max(1L, maxDoc)).toInt)

  /** The EXACT preimage [lo, hi) of rangeOf(r): rangeOf floors
    * docId·R/M, whose preimage for range r is [ceil(r·M/R),
    * ceil((r+1)·M/R)). A floor-based lo/hi would mask out boundary
    * docIds when M % R != 0 — silent doc loss: a block ending exactly
    * on the boundary is scattered only to range r but the window
    * would exclude its last doc.
    */
  private def rangeWindow(r: Int, ranges: Int, maxDoc: Long): (Long, Long) = {
    val lo = (r.toLong * maxDoc + ranges - 1) / ranges
    val hi = if (r == ranges - 1) Long.MaxValue
             else ((r.toLong + 1) * maxDoc + ranges - 1) / ranges
    (lo, hi)
  }

  /** Driver-side query plan for one query. */
  private case class Plan(queryId: Long, terms: Seq[TermMeta],
                          termIdx: Map[String, Int])

  def search(spark: SparkSession, indexDir: String,
             queries: Seq[QuerySpec], k: Int = 10, mode: Mode = Or,
             numRanges: Int = 8, offset: Int = 0): Dataset[SearchHit] =
    searchMulti(spark, Seq(indexDir), queries, k, mode, numRanges,
      offset = offset)

  /** Search the union of several index generations (a base build plus
    * incremental deltas). Global stats combine exactly
    * (N = ΣnumDocs, avgdl = ΣtotalTokens / ΣnumDocs, df = Σdf per
    * term), and block bounds are derived from (maxTf, minDl) under
    * those CURRENT stats — so results are rank-identical to a full
    * rebuild over the union corpus (modulo docId numbering).
    */
  /** @param probeMinTotalDf queries whose summed df exceeds this run a
    *        θ₀ PROBE first: one batched job scores only each query's
    *        rarest term (single-term contributions lower-bound totals,
    *        so the k-th best is a safe, much tighter θ₀). Cheap
    *        queries skip the extra job; stopword-heavy ones — the
    *        scatter-volume hazard — pay ~one small scan to prune the
    *        big one.
    */
  /** @param offset serve-path pagination: skip the first `offset`
    *        ranked hits and return the next k (ranks continue —
    *        page 2 of k=10 carries ranks 11-20). Internally the job
    *        retrieves top (offset + k): every pruning bound (θ₀, df ≥
    *        k floors, heap size) must target the DEEPER cut or true
    *        page-2 hits would be pruned.
    */
  def searchMulti(spark: SparkSession, indexDirs: Seq[String],
                  queries: Seq[QuerySpec], k: Int = 10, mode: Mode = Or,
                  numRanges: Int = 8,
                  probeMinTotalDf: Long = 100000L,
                  offset: Int = 0): Dataset[SearchHit] =
    // The gather shuffle has EXACTLY |queries| × numRanges keys (and
    // the probe job |queries|): planning it wider than that is pure
    // per-task scheduling waste, and the whole computation runs
    // eagerly inside this call (partials.collect) — so the width clamp
    // is closed-scope. Clamped at the session setting: a big batch
    // keeps full cluster width.
    graft.Adaptive.withShuffleWidth(spark,
      queries.size.toLong * math.max(1, numRanges)) {
      searchMultiImpl(spark, indexDirs, queries, k, mode, numRanges,
        probeMinTotalDf, offset)
    }

  private def searchMultiImpl(spark: SparkSession, indexDirs: Seq[String],
                  queries: Seq[QuerySpec], k: Int, mode: Mode,
                  numRanges: Int,
                  probeMinTotalDf: Long,
                  offset: Int): Dataset[SearchHit] = {
    import spark.implicits._
    // k <= 0 is a valid degenerate ask (e.g. an empty pagination
    // window) — TopK(0) would crash in the gather tasks
    if (k <= 0) return spark.emptyDataset[SearchHit]
    val depth = k + math.max(0, offset) // the cut every bound targets
    // Empty generations (zero docs — e.g. a delta where change was
    // detected but the hash diff selected nothing) have no readable
    // terms/segments parquet; drop them from every scan. Their
    // TOMBSTONES still count (an empty generation can carry them), so
    // the mask below is built over the FULL dir list.
    val liveGens = indexDirs.map(d => d -> IndexPaths.readStats(spark, d))
      .filter(_._2.numDocs > 0)
    val tombMaskAll = graft.index.Tombstones.maskFor(spark, indexDirs)
    if (liveGens.isEmpty) return spark.emptyDataset[SearchHit]
    val liveDirs = liveGens.map(_._1)
    val statsList = liveGens.map(_._2)
    // Re-crawl tombstones: replaced base docIds are masked out of
    // every evaluator (the dead version never surfaces). Until
    // compaction, global stats still count the dead docs, so the free
    // θ₀ / probe floors (whose safety proof counts df docs) are
    // disabled — correctness over speed in the transient window.
    // Small sets broadcast; above the threshold the mask reads the
    // strided sidecar per docId window (never an O(corpus) driver Set).
    val tombMask = tombMaskAll
    val bcTomb = spark.sparkContext.broadcast(tombMask)
    val noTomb = tombMask.isEmpty
    // norms-sidecar routing: generation dirs + docId ranges + the
    // Hadoop conf (tasks open stride files lazily, 4 MB each)
    val bcGens = spark.sparkContext.broadcast(
      liveDirs.zip(statsList).map { case (d, st) =>
        graft.index.Norms.GenMeta(d, st.minDocId, st.maxDocId)
      }.toArray)
    val bcConf = spark.sparkContext.broadcast(
      new graft.index.Norms.SerConf(
        spark.sparkContext.hadoopConfiguration))
    val nTotal = statsList.map(_.numDocs).sum
    val tokTotal = statsList.map(_.totalTokens).sum
    val stats = statsList.head.copy(
      numDocs = nTotal,
      totalTokens = tokTotal,
      avgdl = if (statsList.size == 1) statsList.head.avgdl
              else if (nTotal == 0) 0.0 else tokTotal.toDouble / nTotal,
      maxDocId = statsList.map(_.maxDocId).max,
      // maxDl must cover EVERY generation: θ₀ = score(tf=1, dl=maxDl)
      // is only a safe lower bound under the global max dl. A
      // generation reporting 0 (an old stats.json) means "unknown" —
      // propagate 0 so theta0Free disables itself.
      maxDl = if (statsList.exists(_.maxDl <= 0)) 0L
              else statsList.map(_.maxDl).max)

    // 1. tokenize + dictionary lookup (driver; dictionaries pruned by
    //    termHash pushdown, not a full scan); df summed across
    //    generations for the global idf
    val qTerms: Map[Long, Seq[String]] = queries.map { q =>
      q.queryId -> Tokenize.tokens(q.text).distinct.toSeq
    }.toMap
    val allTerms = qTerms.values.flatten.toSeq.distinct
    if (allTerms.isEmpty) return spark.emptyDataset[SearchHit]
    // per index generation: term -> meta (salt layout is per-index),
    // via the shared cached pruned lookup
    val metaPerIndex: Seq[Map[String, TermMeta]] =
      lookupMetas(spark, liveDirs, allTerms)
    val metaByTerm: Map[String, TermMeta] = allTerms.flatMap { term =>
      val metas = metaPerIndex.flatMap(_.get(term))
      if (metas.isEmpty) None
      else Some(term -> metas.head.copy(df = metas.map(_.df).sum,
        cf = metas.map(_.cf).sum, maxTf = metas.map(_.maxTf).max,
        minDl = metas.map(_.minDl).min))
    }.toMap

    val plans: Seq[Plan] = queries.flatMap { q =>
      val metas = qTerms(q.queryId).flatMap(metaByTerm.get)
      val usable = mode match {
        case And => if (metas.size == qTerms(q.queryId).size) metas else Seq.empty
        case Or  => metas
      }
      if (usable.isEmpty) None
      else Some(Plan(q.queryId,
        usable.sortBy(_.df), // AND driver order: rarest first
        qTerms(q.queryId).zipWithIndex.toMap))
    }
    if (plans.isEmpty) return spark.emptyDataset[SearchHit]

    // 2a. MaxScore bounds (driver, from dictionary metadata alone):
    //     UB_t    = best possible contribution of term t (maxTf, minDl
    //               under CURRENT stats),
    //     θ₀(q)   = a SAFE lower bound on the final k-th score: any
    //               term with df ≥ k guarantees k docs each scoring at
    //               least its worst single-posting score (tf=1,
    //               dl = corpus maxDl). OR mode only — AND result
    //               counts are unknown a priori.
    //     θ₀'s real effect is seeding each gather task's WAND floor:
    //     a docId-range whose range-local bounds can't reach θ₀ is
    //     skipped without decoding anything (SCALE.md).
    //     residual(q,t) = θ₀(q) − Σ_{t'≠t} UB_{t'} additionally gates
    //     blocks BEFORE the scatter shuffle; with this free θ₀ the
    //     gate is provably inert (θ₀ ≤ UB of its justifying term) —
    //     it is the plug-in point for a tighter probed θ₀.
    val ubByTerm: Map[String, Double] = metaByTerm.map { case (term, t) =>
      term -> BM25.score(t.maxTf.toLong, t.minDl.toLong, stats.avgdl,
        BM25.idf(stats.numDocs, t.df))
    }
    val theta0Free: Map[Long, Double] = plans.map { p =>
      val t0 =
        if (mode != Or || stats.maxDl <= 0 || !noTomb)
          Double.NegativeInfinity
        else {
          val cands = p.terms.filter(_.df >= depth).map(t =>
            BM25.score(1L, stats.maxDl, stats.avgdl,
              BM25.idf(stats.numDocs, t.df)))
          if (cands.isEmpty) Double.NegativeInfinity
          // nextDown: ties at exactly θ₀ must survive (exactness)
          else Math.nextDown(cands.max)
        }
      p.queryId -> t0
    }.toMap

    // θ₀ probe: score ONLY the rarest term of the expensive queries
    // (one batched job over its blocks); k-th best single-term
    // contribution is a safe lower bound on the k-th total score and
    // is tight enough to make the pre-shuffle residual gate fire.
    val probed: Map[Long, Double] = {
      val probePlans = plans.filter { p =>
        noTomb &&
          mode == Or && p.terms.size >= 2 && p.terms.head.df >= depth &&
          // don't probe when even the rarest term is itself huge —
          // the probe scan would rival the query
          p.terms.head.df <= math.max(10L * probeMinTotalDf, 1000000L) &&
          p.terms.map(_.df).sum >= probeMinTotalDf
      }
      if (probePlans.isEmpty) Map.empty
      else {
        val avgdlP = stats.avgdl
        // rarest term per query → its storage keys per generation
        val probeUses: Map[String, Seq[(Long, Double)]] = probePlans
          .flatMap { p =>
            val t = p.terms.head // sorted by df asc
            val idf = BM25.idf(stats.numDocs, t.df)
            metaPerIndex.flatMap(_.get(t.term)).flatMap { tm =>
              storageKeys(t.term, tm).map(kk => kk -> ((p.queryId, idf)))
            }
          }
          .groupBy(_._1).map { case (kk, v) => kk -> v.map(_._2).distinct }
        val bcProbe = spark.sparkContext.broadcast(probeUses)
        val pBlocks = liveDirs.zip(statsList).map { case (d, st) =>
          val hs = probeUses.keys.map(IndexBuilder.xxhash).toSeq
          val bks = hs.map(h => IndexBuilder.bucketOf(h, st.numBuckets))
            .distinct
          spark.read.parquet(s"$d/segments")
            .filter($"bucket".isin(bks: _*) && $"termHash".isin(hs: _*))
            .as[SegmentBlock]
        }.reduce(_ union _)
        val kLocal = depth
        val bcGensP = bcGens
        val bcConfP = bcConf
        pBlocks.mapPartitions { it =>
          val norms = new graft.index.Norms.Reader(bcGensP.value,
            bcConfP.value)
          it.flatMap { b =>
            bcProbe.value.getOrElse(b.skey, Seq.empty).iterator.flatMap {
              case (qid, idf) =>
                val tfs = graft.index.Codec.decodeVarByte(b.tfsEnc, b.n)
                val ds = graft.index.Codec.decodeDeltas(b.docIdsEnc,
                  b.n, b.firstDocId)
                (0 until b.n).iterator.map(i =>
                  (qid, BM25.score(tfs(i), norms.dl(ds(i)), avgdlP, idf)))
            }
          }
        }
          .groupByKey(_._1)
          .mapGroups { (qid: Long, it: Iterator[(Long, Double)]) =>
            val h = new TopK(kLocal)
            it.foreach(x => h.offer(x._2, 0L))
            (qid, if (h.size >= kLocal) h.result().last._2
                  else Double.NegativeInfinity)
          }
          .collect()
          .map { case (q, s) =>
            q -> (if (s == Double.NegativeInfinity) s else Math.nextDown(s))
          }.toMap
      }
    }
    val theta0: Map[Long, Double] = theta0Free.map { case (q, v) =>
      q -> math.max(v, probed.getOrElse(q, Double.NegativeInfinity))
    }

    // 2b. storage keys (term or salted sub-runs) → touched buckets and
    //     hashes, PER index generation (salt layout is per-index; idf
    //     is global). The skey→(query, termIdx, idf, residual) map
    //     merges across generations — identical values for identical
    //     keys.
    val keyUses: Map[String, Seq[(Long, Int, Double, Double)]] = plans
      .flatMap { p =>
        val ubSum = p.terms.map(t => ubByTerm(t.term)).sum
        p.terms.flatMap { t =>
          val idf = BM25.idf(stats.numDocs, t.df)
          val residual = theta0(p.queryId) - (ubSum - ubByTerm(t.term))
          metaPerIndex.flatMap(_.get(t.term)).flatMap { tm =>
            storageKeys(t.term, tm).map(k =>
              k -> ((p.queryId, p.termIdx(t.term), idf, residual)))
          }
        }
      }
      .groupBy(_._1).map { case (k, v) => k -> v.map(_._2).distinct }
    val bcUses = spark.sparkContext.broadcast(keyUses)
    val bcTheta0 = spark.sparkContext.broadcast(theta0)
    val maxDoc = stats.maxDocId + 1
    val ranges = math.max(1, numRanges)

    // per-query df order for the AND driver choice
    val dfOrder: Map[Long, Seq[Int]] =
      plans.map(p => p.queryId -> p.terms.map(t => p.termIdx(t.term))).toMap
    val bcDfOrder = spark.sparkContext.broadcast(dfOrder)
    val isAnd = mode == And
    val avgdl = stats.avgdl

    // 3. scan touched segments of every generation (partition pruning
    //    on bucket + row-group pruning on termHash), union, scatter
    val blocks = liveDirs.zip(statsList).map { case (d, st) =>
      val idxMetas = metaPerIndex(liveDirs.indexOf(d))
      val idxKeys = plans.flatMap(_.terms.map(_.term)).distinct
        .flatMap(term => idxMetas.get(term).toSeq
          .flatMap(tm => storageKeys(term, tm)))
      val idxHashes = idxKeys.map(IndexBuilder.xxhash)
      val idxBuckets = idxHashes
        .map(h => IndexBuilder.bucketOf(h, st.numBuckets)).distinct
      spark.read.parquet(s"$d/segments")
        .filter($"bucket".isin(idxBuckets: _*) &&
          $"termHash".isin(idxHashes: _*))
        .as[SegmentBlock]
    }.reduce(_ union _)

    val scattered = blocks
      // BM25 never reads positions — blank posEnc before the scatter
      // replicates blocks per (query, range), or a positional index
      // pays 2-3x shuffle on every plain query
      .map(b => if (b.posEnc == null || b.posEnc.isEmpty) b
                else b.copy(posEnc = Array.emptyByteArray))
      .flatMap { b =>
      bcUses.value.getOrElse(b.skey, Seq.empty).iterator.flatMap {
        case (qid, tIdx, idf, residual) =>
          // MaxScore gate BEFORE the shuffle: the block's exact bound
          // under current stats vs this (query, term)'s residual
          val bound = BM25.score(b.maxTf.toLong, b.minDl.toLong,
            avgdl, idf)
          if (bound < residual) Iterator.empty
          else (rangeOf(b.firstDocId, ranges, maxDoc) to
                rangeOf(b.lastDocId, ranges, maxDoc)).iterator
            .map(r => (qid, r, tIdx, idf, b))
      }
    }

    // 4. gather: WAND per (queryId, range) → partial top-k
    val partials = scattered
      .groupByKey(x => (x._1, x._2))
      .flatMapGroups { (key: (Long, Int),
                        it: Iterator[(Long, Int, Int, Double, SegmentBlock)]) =>
        val (qid, r) = key
        // exact rangeOf preimage — the silent-doc-loss proof lives on
        // rangeWindow
        val (lo, hi) = rangeWindow(r, ranges, maxDoc)
        // group blocks per (termIdx, skey) → cursors
        val bySkey = it.toSeq.groupBy(x => (x._3, x._5.skey))
        // task-scoped reader: flatMapGroups runs once per GROUP and a
        // partition holds many (query, range) groups — a fresh Reader
        // per group would re-read the same 4 MB norms strides
        val norms = graft.index.Norms.taskReader(bcGens.value,
          bcConf.value)
        val cursors = bySkey.map { case ((tIdx, _), rows) =>
          val idf = rows.head._4
          val bs = rows.map(_._5).sortBy(_.firstDocId).toArray
          new Cursor(tIdx, idf, bs, avgdl, lo, hi, norms.dl)
        }.toArray
        val floor = bcTheta0.value.getOrElse(qid, Double.NegativeInfinity)
        val mask: Long => Boolean = bcTomb.value.fn
        val termIdxs = bySkey.keysIterator.map(_._1).toSet
        val top =
          if (!isAnd && termIdxs.size == 1) {
            // the whole task is ONE term (single-term query, possibly
            // many salted sub-runs): per-posting scores are
            // independent — impact-ordered block evaluation with
            // early termination replaces the degenerate WAND merge
            val rows = bySkey.valuesIterator.flatten.toArray
            Wand.singleTermTopK(rows.map(_._5), rows.head._4, avgdl,
              depth, lo, hi, floor, mask, norms.dl)
          } else if (isAnd) {
            val order = bcDfOrder.value(qid)
            // every term group must be present in this range's cursor
            // set is NOT required: absent group just means no match in
            // range — but correctness of AND requires knowing the term
            // exists somewhere; group by termIdx in df order:
            val groups = order.map(tI => cursors.filter(_.termIdx == tI))
              .toArray
            if (groups.exists(_.isEmpty)) Array.empty[(Long, Double)]
            else Wand.intersectAnd(groups, depth, mask)
          } else Wand.wandOr(cursors, depth, floor, mask)
        top.iterator.map { case (d, s) => (qid, d, s) }
      }

    // 5. final merge per query: k·R rows per query — tiny by
    // construction, so collect and merge on the driver rather than
    // paying another shuffle stage (measured ~30% of single-query
    // latency). This is the reference's serve-path shape too: workers
    // return partial top-k, the coordinator merges
    // (/root/reference/packages/api/spheraform_api/routers/search.py:61-64).
    val merged = partials.collect()
      .groupBy(_._1)
      .toSeq
      .flatMap { case (qid, rows) =>
        rows.sortBy { case (_, d, s) => (-s, d) }
          .slice(math.max(0, offset), depth).zipWithIndex
          .map { case ((_, d, s), i) =>
            SearchHit(qid, math.max(0, offset) + i + 1, d, s)
          }
      }
    spark.createDataset(merged)
  }

  /** Engine-backed phrase matching: posting-list AND-intersection plus
    * token-position adjacency verify, served from the positional tier
    * (an index built with `withPositions`). Returns the matching
    * docIds as a DISTRIBUTED dataset — callers that need the full hit
    * set (exports, joins) consume it without the result ever touching
    * the driver; interactive callers go through [[phraseSearch]],
    * which pages with a bounded scatter-gather. Matches the
    * substring-over-normalized-tokens semantics (" w1 w2 ... " in the
    * space-joined token stream) exactly — positions ARE token
    * indices. At web scale this is the difference between a per-query
    * full-corpus scan and touching only the phrase terms' posting
    * blocks (same scatter pruning as search: bucket partition +
    * termHash row groups + docId-range windows).
    */
  def phraseDocs(spark: SparkSession, indexDirs: Seq[String],
                 phrase: String, numRanges: Int = 8): Dataset[Long] =
    matchDocs(spark, indexDirs,
      Tokenize.tokens(phrase).toSeq, // order + duplicates kept
      verifyPositions = true, numRanges)

  /** Full matching docId set of a conjunctive (AND) term query — the
    * bulk-retrieval/export primitive: every doc containing ALL query
    * terms, as a distributed dataset, no scoring, no top-k cut. Works
    * on BM25-only indexes (no positional tier needed).
    */
  def conjunctiveDocs(spark: SparkSession, indexDirs: Seq[String],
                      query: String, numRanges: Int = 8): Dataset[Long] =
    matchDocs(spark, indexDirs,
      Tokenize.tokens(query).distinct.toSeq,
      verifyPositions = false, numRanges)

  private def matchDocs(spark: SparkSession, indexDirs: Seq[String],
                        slots: Seq[String], verifyPositions: Boolean,
                        numRanges: Int): Dataset[Long] = {
    import spark.implicits._
    if (slots.isEmpty) return spark.emptyDataset[Long]
    val distinctTerms = slots.distinct
    // empty generations have no readable terms/segments (their
    // tombstones still mask — maskFor below runs over the full list)
    val liveGens = indexDirs.map(d => d -> IndexPaths.readStats(spark, d))
      .filter(_._2.numDocs > 0)
    if (liveGens.isEmpty) return spark.emptyDataset[Long]
    val liveDirs = liveGens.map(_._1)
    val statsList = liveGens.map(_._2)
    // Fail fast on an index with NO positional tier anywhere: every
    // candidate would fail the position verify and the caller would
    // get an empty result indistinguishable from "phrase not
    // present" — wrong answers with no error. Mixed generations stay
    // allowed (docs from non-positional gens simply can't
    // phrase-match — documented partial semantics); legacy stats
    // without the flag (None) pass through, unknowable.
    if (verifyPositions && statsList.nonEmpty &&
        statsList.forall(_.positions.contains(false)))
      throw new IllegalArgumentException(
        "phrase search needs the positional tier, but every " +
          s"generation of ${indexDirs.mkString(",")} was built " +
          "without positions (Config.withPositions) — rebuild with " +
          "positions or use conjunctiveDocs/searchMulti")
    val maxDoc = statsList.map(_.maxDocId).max + 1
    // pruned dictionary lookups per generation (cache shared with
    // the BM25 path)
    val metaPerIndex: Seq[Map[String, TermMeta]] =
      lookupMetas(spark, liveDirs, distinctTerms)
    // every phrase term must exist in at least one generation
    if (distinctTerms.exists(t => metaPerIndex.forall(!_.contains(t))))
      return spark.emptyDataset[Long]
    // re-crawl tombstones mask phrase results too — a replaced
    // version must never surface from ANY evaluator
    val phMask = graft.index.Tombstones.maskFor(spark, indexDirs)
    val bcPhTombs = spark.sparkContext.broadcast(phMask)
    val tIdx: Map[String, Int] = distinctTerms.zipWithIndex.toMap
    // storage keys → distinct-term index (merged across generations)
    val keyUses: Map[String, Int] = metaPerIndex.flatMap { metas =>
      metas.toSeq.flatMap { case (term, tm) =>
        storageKeys(term, tm).map(_ -> tIdx(term))
      }
    }.toMap
    val bcUses = spark.sparkContext.broadcast(keyUses)
    val ranges = math.max(1, numRanges)
    val blocks = liveDirs.zip(statsList).map { case (d, st) =>
      val hs = metaPerIndex(liveDirs.indexOf(d)).toSeq.flatMap {
        case (term, tm) =>
          storageKeys(term, tm).map(IndexBuilder.xxhash)
      }
      val bks = hs.map(h => IndexBuilder.bucketOf(h, st.numBuckets)).distinct
      spark.read.parquet(s"$d/segments")
        .filter($"bucket".isin(bks: _*) && $"termHash".isin(hs: _*))
        .as[SegmentBlock]
    }.reduce(_ union _)
    val slotIdxs = slots.map(tIdx).toArray
    val nDistinct = distinctTerms.size
    val matched = blocks
      // the AND-only path never reads positions — blank posEnc before
      // the scatter shuffle (same reasoning as the BM25 path)
      .map(b => if (verifyPositions || b.posEnc == null ||
                    b.posEnc.isEmpty) b
                else b.copy(posEnc = Array.emptyByteArray))
      .flatMap { b =>
      bcUses.value.get(b.skey).iterator.flatMap { ti =>
        (rangeOf(b.firstDocId, ranges, maxDoc) to
         rangeOf(b.lastDocId, ranges, maxDoc)).iterator
          .map(r => (r, ti, b))
      }
    }
      .groupByKey(_._1)
      .flatMapGroups { (r: Int, it: Iterator[(Int, Int, SegmentBlock)]) =>
        val (lo, hi) = rangeWindow(r, ranges, maxDoc)
        val bySkey = it.toSeq.groupBy(x => (x._2, x._3.skey))
        val byTerm = Array.fill(nDistinct)(
          scala.collection.mutable.ArrayBuffer.empty[Cursor])
        bySkey.foreach { case ((ti, _), rows) =>
          val bs = rows.map(_._3).sortBy(_.firstDocId).toArray
          // phrase matching never scores → no norms lookup needed
          byTerm(ti) += new Cursor(ti, 0.0, bs, 1.0, lo, hi, _ => 1L)
        }
        val slotGroups = slotIdxs.map(ti => byTerm(ti).toArray)
        val m = bcPhTombs.value.fn
        val hits =
          (if (verifyPositions) Wand.phraseDocs(slotGroups)
           else Wand.andDocs(slotGroups)).iterator
        if (m == null) hits else hits.filterNot(m(_))
      }
    matched
  }

  /** Paged phrase search: docIds ascending, rows [offset, offset+limit).
    * Bounded end to end — each partition keeps only its (offset+limit)
    * smallest docIds in a max-heap, the driver merges
    * O(partitions × depth) candidates and slices the page. A stopword
    * phrase matching 10⁹ docs costs the driver `depth` longs per
    * partition, never the full hit set (round 2 collected ALL matches,
    * the serve path's last unbounded driver collect).
    */
  def phraseSearch(spark: SparkSession, indexDirs: Seq[String],
                   phrase: String, numRanges: Int = 8,
                   limit: Int = 1000, offset: Int = 0): Seq[Long] = {
    import spark.implicits._
    if (limit <= 0) return Seq.empty
    val off = math.max(0, offset)
    val depth = math.min(Int.MaxValue.toLong, off.toLong + limit).toInt
    val partTops = phraseDocs(spark, indexDirs, phrase, numRanges)
      .mapPartitions { it =>
        val pq = new java.util.PriorityQueue[java.lang.Long](
          16, java.util.Comparator.reverseOrder[java.lang.Long]())
        it.foreach { id =>
          if (pq.size < depth) pq.add(id)
          else if (id < pq.peek()) { pq.poll(); pq.add(id) }
        }
        val out = new Array[Long](pq.size)
        var i = 0
        while (!pq.isEmpty) { out(i) = pq.poll(); i += 1 }
        out.iterator
      }
    // docIds are unique across partitions (each doc lives in exactly
    // one docId-range group), so no distinct needed before the slice
    partTops.collect().sorted.slice(off, off + limit).toSeq
  }

  /** The term DICTIONARY of an index as a DataFrame (term, df, cf),
    * merged across live generations — the serve-side source for
    * dictionary features (fuzzy "did you mean", prefix autocomplete):
    * at 10⁹ docs these must read the ~10⁶-row terms artifact the
    * build already persists, never re-derive it from the corpus
    * (reference ancestor: serve queries hit the catalogue index, never
    * re-scan sources — /root/reference/packages/api/spheraform_api/
    * routers/search.py:38-46). Single generation skips the re-agg
    * shuffle (terms are unique within one build); multi-generation
    * df/cf sum across generations. Tombstoned docs' contribution is
    * NOT subtracted — df drift is acceptable for ranking suggestions
    * (compaction trues it up), same contract as searchMulti's global
    * stats.
    */
  def dictionary(spark: SparkSession, indexDirs: Seq[String]): org.apache.spark.sql.DataFrame = {
    import spark.implicits._
    val live = indexDirs
      .filter(d => IndexPaths.readStats(spark, d).numDocs > 0)
    if (live.isEmpty)
      return spark.emptyDataset[(String, Long, Long)]
        .toDF("term", "df", "cf")
    val per = live.map(d => spark.read.parquet(s"$d/terms")
      .select($"term", $"df", $"cf"))
    val u = per.reduce(_ union _)
    if (live.size == 1) u
    else u.groupBy("term")
      .agg(sum($"df").as("df"), sum($"cf").as("cf"))
  }

  /** Per-term metadata for an explicit term list, merged across
    * generations exactly as searchMulti merges (df/cf summed, maxTf
    * max, minDl min) — the pruned-dictionary lookup (termHash
    * pushdown + driver cache) exposed for serve features that need
    * df for a handful of known terms (e.g. more-like-this seed-term
    * selection) without a dictionary scan.
    */
  def termMetas(spark: SparkSession, indexDirs: Seq[String],
                terms: Seq[String]): Map[String, TermMeta] = {
    val distinctTerms = terms.distinct
    if (distinctTerms.isEmpty) return Map.empty
    val live = indexDirs
      .filter(d => IndexPaths.readStats(spark, d).numDocs > 0)
    if (live.isEmpty) return Map.empty
    val metaPerIndex = lookupMetas(spark, live, distinctTerms)
    distinctTerms.flatMap { term =>
      val metas = metaPerIndex.flatMap(_.get(term))
      if (metas.isEmpty) None
      else Some(term -> metas.head.copy(df = metas.map(_.df).sum,
        cf = metas.map(_.cf).sum, maxTf = metas.map(_.maxTf).max,
        minDl = metas.map(_.minDl).min))
    }.toMap
  }

  /** Posting membership for an explicit term list: (doc_id, term_idx)
    * rows decoded from ONLY those terms' posting blocks (bucket
    * partition pruning + termHash row groups — the ft_and_search scan
    * machinery without the intersection), tombstone-masked. The
    * candidate-generation primitive for OR-semantics serve features
    * (more-like-this counts shared seed terms per doc): corpus-side
    * cost is proportional to the chosen terms' posting lists, never a
    * corpus tokenize. term_idx = position in `terms` (deduplicated).
    */
  def termDocs(spark: SparkSession, indexDirs: Seq[String],
               terms: Seq[String]): org.apache.spark.sql.DataFrame = {
    import spark.implicits._
    val distinctTerms = terms.distinct
    val empty = spark.emptyDataset[(Long, Int)].toDF("doc_id", "term_idx")
    if (distinctTerms.isEmpty) return empty
    val liveGens = indexDirs.map(d => d -> IndexPaths.readStats(spark, d))
      .filter(_._2.numDocs > 0)
    if (liveGens.isEmpty) return empty
    val liveDirs = liveGens.map(_._1)
    val statsList = liveGens.map(_._2)
    val metaPerIndex = lookupMetas(spark, liveDirs, distinctTerms)
    val mask = graft.index.Tombstones.maskFor(spark, indexDirs)
    val bcMask = spark.sparkContext.broadcast(mask)
    val tIdx: Map[String, Int] = distinctTerms.zipWithIndex.toMap
    val keyUses: Map[String, Int] = metaPerIndex.flatMap { metas =>
      metas.toSeq.flatMap { case (term, tm) =>
        storageKeys(term, tm).map(_ -> tIdx(term))
      }
    }.toMap
    if (keyUses.isEmpty) return empty
    val bcUses = spark.sparkContext.broadcast(keyUses)
    val blocks = liveDirs.zip(statsList).map { case (d, st) =>
      val hs = metaPerIndex(liveDirs.indexOf(d)).toSeq.flatMap {
        case (term, tm) =>
          storageKeys(term, tm).map(IndexBuilder.xxhash)
      }
      val bks = hs.map(h => IndexBuilder.bucketOf(h, st.numBuckets))
        .distinct
      spark.read.parquet(s"$d/segments")
        .filter($"bucket".isin(bks: _*) && $"termHash".isin(hs: _*))
        .as[SegmentBlock]
    }.reduce(_ union _)
    blocks.flatMap { b =>
      bcUses.value.get(b.skey).iterator.flatMap { ti =>
        val ds = graft.index.Codec.decodeDeltas(b.docIdsEnc, b.n,
          b.firstDocId)
        val m = bcMask.value.fn
        ds.iterator.filter(id => m == null || !m(id)).map(id => (id, ti))
      }
    }.toDF("doc_id", "term_idx")
  }

  /** Back-join urls for a (small) hit set — docs table is range-sorted
    * by docId so the `isin` filter prunes row groups; the join itself
    * broadcasts the hits.
    */
  def withUrls(spark: SparkSession, indexDir: String,
               hits: Dataset[SearchHit]): Dataset[(Long, Int, Long, Double, String)] =
    withUrlsMulti(spark, Seq(indexDir), hits)

  def withUrlsMulti(spark: SparkSession, indexDirs: Seq[String],
                    hits: Dataset[SearchHit]): Dataset[(Long, Int, Long, Double, String)] = {
    import spark.implicits._
    val h = hits.collect()
    val ids = h.map(_.docId).distinct.toSeq
    val docs = indexDirs
      .filter(d => IndexPaths.readStats(spark, d).numDocs > 0)
      .flatMap { d =>
        spark.read.parquet(s"$d/docs")
          .filter($"docId".isin(ids: _*))
          .select($"docId", $"url").as[(Long, String)].collect()
      }.toMap
    spark.createDataset(h.toSeq.map(x =>
      (x.queryId, x.rank, x.docId, x.score, docs.getOrElse(x.docId, ""))))
  }
}
