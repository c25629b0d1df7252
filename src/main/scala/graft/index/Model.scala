package graft.index

/** Per-term dictionary entry. `termHash` is `xxhash64(term)` (Spark's
  * built-in, seed 42); `saltCount` > 1 marks a hot term whose postings
  * are split into `saltCount` sub-runs stored under salted keys
  * `term#0 .. term#saltCount-1` (north-rule stopword-skew defusal).
  * `maxTf`/`minDl` bound the term's best possible BM25 contribution
  * under any current stats (MaxScore pruning at the driver).
  */
case class TermMeta(term: String, termHash: Long, df: Long, cf: Long,
                    saltCount: Int, maxTf: Int, minDl: Int)

/** Document metadata for back-joins and length normalization. */
case class DocMeta(docId: Long, url: String, dl: Int)

/** A staged posting after tokenize+tf, salted and bucketed, ready for
  * the merge-by-term range shuffle. `skey` is the storage key (term or
  * salted sub-run `term#N`) — the raw term is NOT carried: the
  * tokenizer admits only [a-z0-9], so term == skey up to '#'
  * ([[termOfSkey]]), and df lives only in the dictionary. Every
  * redundant byte here multiplies by |postings| through the two
  * biggest shuffles and the at-rest format.
  */
case class StagedPosting(bucket: Int, termHash: Long, skey: String,
                         docId: Long, tf: Int,
                         dl: Int, posEnc: Array[Byte])

/** One compressed posting block: up to `blockSize` postings of one
  * storage key, sorted by docId; docIds delta+varbyte encoded against
  * `firstDocId`, tfs varbyte. Document lengths live in the per-docId
  * norms sidecar ([[Norms]]) — NOT per posting: ~1.5 B/posting saved
  * at rest and a third less decode per block; `minDl` metadata keeps
  * the block-max bound exact. `posEnc` (build flag
  * `withPositions`) concatenates per-posting token-position lists
  * ([count][delta positions], varbyte) in posting order — the
  * positional tier that serves phrase queries from the index; empty
  * when the build ran without positions. `maxTf`/`minDl` give the exact
  * block-max BM25 bound — BM25 is monotone increasing in tf and
  * decreasing in dl, so score(maxTf, minDl | CURRENT stats) bounds
  * every posting in the block. Storing the bound's INGREDIENTS rather
  * than a baked score keeps blocks valid when global stats move
  * (incremental appends change N/avgdl/df; a frozen score would stop
  * being an upper bound and break WAND exactness).
  *
  * Analog of the reference's lossy pre-aggregation tier (PMTiles
  * block metadata, /root/reference/packages/core/spheraform_core/storage/pmtiles_gen.py:31-131)
  * done losslessly: metadata that lets the reader skip work.
  */
case class SegmentBlock(bucket: Int, termHash: Long, skey: String,
                        blockId: Int, n: Int,
                        firstDocId: Long, lastDocId: Long,
                        maxTf: Int, minDl: Int, docIdsEnc: Array[Byte],
                        tfsEnc: Array[Byte],
                        posEnc: Array[Byte])

/** Global index statistics (the `stats.json` sidecar). `totalTokens`
  * makes stats exactly combinable across index generations:
  * avgdl(a ∪ b) = (tokens_a + tokens_b) / (docs_a + docs_b). `maxDl`
  * lower-bounds any posting's score (tf=1, dl=maxDl) — the free θ₀
  * seed for MaxScore pruning.
  */
case class IndexStats(buildId: String, numDocs: Long, avgdl: Double,
                      numTerms: Long, numBuckets: Int, blockSize: Int,
                      maxDocId: Long, totalTokens: Long,
                      maxDl: Long = 0L, minDocId: Long = 0L,
                      /** Some(true/false) = the generation does/does
                        * not carry the positional tier; None = legacy
                        * stats.json predating the flag (unknown).
                        * Phrase serve fails fast when every generation
                        * affirmatively lacks positions — a silent
                        * always-empty result is indistinguishable from
                        * "phrase not present". */
                      positions: Option[Boolean] = None)

/** Per-unit build checkpoint with lineage + metrics — the direct
  * descendant of the reference's resumable DownloadChunk
  * (/root/reference/packages/core/spheraform_core/models/job.py:115-167).
  */
object StagedPosting {
  /** Inverse of the salt-key encoding: term == skey up to the first
    * '#' (tokens are [a-z0-9]+, so '#' only ever comes from salting).
    */
  def termOfSkey(skey: String): String = {
    val i = skey.indexOf('#')
    if (i < 0) skey else skey.substring(0, i)
  }
}

case class Checkpoint(buildId: String, stage: String, unit: Int,
                      status: String, rowCount: Long, bytes: Long,
                      lineage: String, startedMs: Long, finishedMs: Long)
