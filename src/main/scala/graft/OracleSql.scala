package graft

import graft.pipeline.TextOps

/** DuckDB oracle SQL builders shared by SparkEntry.oracleSql. Every
  * builder mirrors EXACTLY the arithmetic/tokenization of the Spark
  * implementation (Tokenize.duckSql is the single tokenizer
  * definition; BM25 constants inlined from graft.query.BM25).
  */
object OracleSql {

  val toksExpr: String = graft.functions.Tokenize.duckSql("text")

  private def inList(ws: Seq[String]): String =
    ws.map(w => s"'$w'").mkString("(", ",", ")")

  /** Shared tokenization CTEs over `documents`. */
  val ftBase: String =
    s"""WITH toks AS (
       |  SELECT doc_id, unnest($toksExpr) AS term FROM documents),
       |tf AS (SELECT doc_id, term, count(*) AS tf
       |       FROM toks GROUP BY doc_id, term),
       |dl AS (SELECT doc_id, count(*) AS dl FROM toks GROUP BY doc_id)
       |""".stripMargin

  /** BM25 top-k (k1=1.2, b=0.75, Lucene idf) — the engine's scoring
    * formula expressed in SQL; rank/tie-break (score desc, doc_id).
    */
  /** Scoring CTE chain shared by the bm25 top-k and facet oracles. */
  private def bm25Sc(terms: Seq[String], and: Boolean): String = {
    val havingAll =
      if (and) s"HAVING count(*) = ${terms.distinct.size}" else ""
    s"""$ftBase,
       |stats AS (SELECT (SELECT count(*) FROM documents)::DOUBLE AS n,
       |  (SELECT count(*) FROM toks)::DOUBLE /
       |  (SELECT count(*) FROM documents) AS avgdl),
       |df AS (SELECT term, count(*)::DOUBLE AS df FROM tf GROUP BY term),
       |q(term) AS (VALUES ${terms.distinct.map(t => s"('$t')").mkString(",")}),
       |sc AS (SELECT tf.doc_id,
       |  sum( ln(1.0 + (n - df + 0.5)/(df + 0.5)) *
       |       tf::DOUBLE * (1.2 + 1.0) /
       |       (tf::DOUBLE + 1.2 * (1.0 - 0.75 + 0.75 * dl.dl / avgdl)) )
       |    AS score
       |  FROM tf JOIN q USING(term) JOIN df USING(term)
       |       JOIN dl USING(doc_id) CROSS JOIN stats
       |  GROUP BY tf.doc_id $havingAll)""".stripMargin
  }

  def bm25(terms: Seq[String], k: Int, and: Boolean,
           offset: Int = 0): String =
    s"""${bm25Sc(terms, and)}
       |SELECT CAST(row_number() OVER (ORDER BY score DESC, doc_id)
       |         AS BIGINT) AS rank,
       |       doc_id, round(score, 4) AS score_r
       |FROM sc ORDER BY score DESC, doc_id
       |LIMIT $k OFFSET $offset""".stripMargin

  /** Mirror of [[graft.pipeline.TextOps.snippet]] over the top-k hits
    * of a BM25 query: token-window highlight around the first
    * occurrence of any query term (1-based list arithmetic in both
    * engines).
    */
  def bm25Snippet(terms: Seq[String], k: Int, window: Int): String = {
    val posList = terms.distinct.map(w =>
      s"coalesce(list_position(t, '$w'), 2147483647)").mkString(", ")
    s"""${bm25Sc(terms, and = false)},
       |top AS (SELECT CAST(row_number() OVER (ORDER BY score DESC,
       |    doc_id) AS BIGINT) AS rank, doc_id
       |  FROM sc ORDER BY score DESC, doc_id LIMIT $k),
       |tok AS (SELECT doc_id, $toksExpr AS t FROM documents),
       |snip AS (SELECT doc_id,
       |    least($posList) AS pos, t FROM tok)
       |SELECT top.rank, top.doc_id,
       |  CASE WHEN pos = 2147483647 THEN ''
       |       ELSE array_to_string(
       |         t[greatest(pos - $window, 1) : pos + $window], ' ')
       |  END AS snippet
       |FROM top JOIN snip USING (doc_id)
       |ORDER BY rank""".stripMargin
  }

  /** Facets computed over the RESULT SET of a top-k query (the
    * reference serves facets over the filtered hits, not the corpus).
    */
  def bm25FacetLang(terms: Seq[String], k: Int): String =
    s"""${bm25Sc(terms, and = false)},
       |top AS (SELECT doc_id FROM sc
       |  ORDER BY score DESC, doc_id LIMIT $k)
       |SELECT d.lang, count(*) AS n
       |FROM top JOIN documents d USING (doc_id)
       |GROUP BY d.lang ORDER BY d.lang""".stripMargin

  val langId: String =
    s"""SELECT doc_id,
       |  CASE WHEN en=0 AND de=0 AND fr=0 THEN 'und'
       |       WHEN en>=de AND en>=fr THEN 'en'
       |       WHEN de>=fr THEN 'de' ELSE 'fr' END AS lang_pred
       |FROM (SELECT doc_id,
       |  len(list_filter(t, x -> x IN ${inList(TextOps.EnSw)})) AS en,
       |  len(list_filter(t, x -> x IN ${inList(TextOps.DeSw)})) AS de,
       |  len(list_filter(t, x -> x IN ${inList(TextOps.FrSw)})) AS fr
       | FROM (SELECT doc_id, $toksExpr AS t FROM documents))
       |ORDER BY doc_id""".stripMargin

  val quality: String =
    s"""SELECT doc_id,
       |  round(least(dl/100.0, 1.0)*0.5 + (stop/dl)*0.3 + (uniq/dl)*0.2, 4)
       |    AS quality
       |FROM (SELECT doc_id, len(t)::DOUBLE AS dl,
       |  len(list_filter(t, x -> x IN ${inList(TextOps.EnSw)}))::DOUBLE AS stop,
       |  len(list_distinct(t))::DOUBLE AS uniq
       | FROM (SELECT doc_id, $toksExpr AS t FROM documents)
       | WHERE len(t) > 0)
       |ORDER BY doc_id""".stripMargin

  /** Mirror of [[graft.pipeline.Dedup.simhash]] ([[TextOps.simhash64]]):
    * per token, the first 8 bytes of md5 (big-endian) give 64 bits;
    * each bit accumulates ±1 over all tokens (duplicates included);
    * output bit = majority (> 0). Bit b lives in hex char (63−b)/4+1
    * at in-nibble position b mod 4; the result assembles nibble-by-
    * nibble (DuckDB BIGINT raises on 1<<63, so no 64-bit shifts).
    */
  val simhash: String = {
    val bitSums = (0 until 64).map { b =>
      s"sum(CASE WHEN ((strpos('0123456789abcdef', " +
        s"substr(h, ${(63 - b) / 4 + 1}, 1)) - 1) >> ${b % 4}) & 1 = 1 " +
        s"THEN 1 ELSE -1 END) AS b$b"
    }.mkString(",\n  ")
    def nib(c: Int): String = {
      val base = 4 * (16 - c)
      (0 until 4).map(j =>
        s"(CASE WHEN x.b${base + j} > 0 THEN ${1 << j} ELSE 0 END)")
        .mkString("(", " + ", ")")
    }
    val fmt = "%x" * 16
    val args = (1 to 16).map(nib).mkString(", ")
    s"""WITH tok AS (SELECT doc_id, unnest($toksExpr) AS t FROM documents),
       |th AS (SELECT doc_id, md5(t) AS h FROM tok),
       |bits AS (SELECT doc_id,
       |  $bitSums
       |  FROM th GROUP BY doc_id)
       |SELECT d.doc_id,
       |  CASE WHEN x.doc_id IS NULL THEN '0000000000000000'
       |       ELSE printf('$fmt', $args) END AS simhash
       |FROM documents d LEFT JOIN bits x USING (doc_id)
       |ORDER BY doc_id""".stripMargin
  }

  /** Mirror of [[graft.pipeline.Dedup.simhashPairs]]: candidates from
    * equality on any of the 4 × 16-bit signature chunks, verified by
    * exact XOR-popcount hamming (DuckDB: hex → UBIGINT cast +
    * bit_count).
    */
  def simhashPairs(maxHamming: Int): String =
    s"""WITH sig AS (SELECT * FROM ($simhash)),
       |ch AS (SELECT doc_id, simhash, c, substr(simhash, 4*c + 1, 4) AS v
       |  FROM sig, range(4) t(c)),
       |cand AS (SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
       |  FROM ch a JOIN ch b ON a.c = b.c AND a.v = b.v
       |    AND a.doc_id < b.doc_id),
       |h AS (SELECT doc_a, doc_b,
       |    bit_count(xor(('0x' || sa.simhash)::UBIGINT,
       |                  ('0x' || sb.simhash)::UBIGINT)) AS hamm
       |  FROM cand JOIN sig sa ON sa.doc_id = doc_a
       |       JOIN sig sb ON sb.doc_id = doc_b)
       |SELECT doc_a, doc_b, CAST(hamm AS BIGINT) AS hamm FROM h
       |WHERE hamm <= $maxHamming ORDER BY doc_a, doc_b""".stripMargin

  /** Distinct word-3-gram shingles CTE (1-indexed lists in DuckDB). */
  val shinglesCte: String =
    s"""sh AS (
       |  SELECT doc_id, list_distinct(list_transform(
       |    generate_series(1, len(t)-2),
       |    i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2])) AS shs
       |  FROM (SELECT doc_id, $toksExpr AS t FROM documents)
       |  WHERE len(t) >= 3)""".stripMargin

  /** Mirror of [[graft.pipeline.Dedup.ngramJaccard]]: candidates via
    * shingles with df ≤ maxShingleDf (the hot-shingle guard), Jaccard
    * verified over the FULL shingle sets.
    */
  def ngramJaccard(threshold: Double, maxShingleDf: Long): String =
    s"""WITH $shinglesCte,
       |p AS (SELECT doc_id, unnest(shs) AS s FROM sh),
       |cool AS (SELECT s FROM p GROUP BY s
       |  HAVING count(*) <= $maxShingleDf),
       |pc AS (SELECT p.doc_id, p.s FROM p JOIN cool USING(s)),
       |cand AS (SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
       |  FROM pc a JOIN pc b ON a.s = b.s AND a.doc_id < b.doc_id),
       |j AS (SELECT doc_a, doc_b,
       |    len(list_filter(sa.shs, x -> list_contains(sb.shs, x)))::DOUBLE /
       |    (len(sa.shs) + len(sb.shs) -
       |     len(list_filter(sa.shs, x -> list_contains(sb.shs, x)))) AS jac
       |  FROM cand JOIN sh sa ON sa.doc_id = doc_a
       |       JOIN sh sb ON sb.doc_id = doc_b)
       |SELECT doc_a, doc_b, round(jac, 4) AS jac_r FROM j
       |WHERE jac >= $threshold ORDER BY doc_a, doc_b""".stripMargin

  /** Mirror of [[graft.pipeline.Dedup.minhashLsh]]: one md5 per
    * shingle; signature slot j = min over the hex digests rotated by
    * 2j chars; candidates from banded slot equality; exact Jaccard
    * verified over the md5-hashed shingle sets.
    */
  def minhashLsh(numHashes: Int, bands: Int, threshold: Double): String = {
    val rows = numHashes / bands
    val mhList = (0 until numHashes).map { j =>
      val cut = 2 * j
      if (cut == 0) "list_min(hs)"
      else "list_min(list_transform(hs, h -> " +
        s"substr(h, ${cut + 1}) || substr(h, 1, $cut)))"
    }.mkString("[", ", ", "]")
    val bandSelects = (0 until bands).map { b =>
      val bval = (0 until rows).map(r => s"mh[${b * rows + r + 1}]")
        .mkString(" || ',' || ")
      s"SELECT doc_id, $b AS band, $bval AS bval FROM sig"
    }.mkString("\n  UNION ALL ")
    s"""WITH $shinglesCte,
       |hb AS (SELECT doc_id, list_transform(shs, s -> md5(s)) AS hs
       |  FROM sh),
       |sig AS (SELECT doc_id, $mhList AS mh FROM hb),
       |banded AS (
       |  $bandSelects),
       |cand AS (SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
       |  FROM banded a JOIN banded b
       |    ON a.band = b.band AND a.bval = b.bval AND a.doc_id < b.doc_id),
       |j AS (SELECT doc_a, doc_b,
       |    len(list_filter(ha.hs, x -> list_contains(h2.hs, x)))::DOUBLE /
       |    (len(ha.hs) + len(h2.hs) -
       |     len(list_filter(ha.hs, x -> list_contains(h2.hs, x)))) AS jac
       |  FROM cand JOIN hb ha ON ha.doc_id = doc_a
       |       JOIN hb h2 ON h2.doc_id = doc_b)
       |SELECT doc_a, doc_b, round(jac, 4) AS jac_r FROM j
       |WHERE jac >= $threshold ORDER BY doc_a, doc_b""".stripMargin
  }

  /** Shared CTE list for union-find over a pair query: reachability
    * walk (recursive CTE, UNION dedup terminates it) → per-node min
    * reachable id = component min. `pairsSql` is any complete query
    * returning (doc_a, doc_b).
    */
  private def walkCtes(pairsSql: String): String =
    s"""WITH RECURSIVE pairs AS (SELECT doc_a, doc_b FROM ($pairsSql)),
       |nodes AS (SELECT doc_a AS id FROM pairs
       |  UNION SELECT doc_b FROM pairs),
       |edges AS (SELECT doc_a AS src, doc_b AS dst FROM pairs
       |  UNION ALL SELECT doc_b, doc_a FROM pairs),
       |walk(id, comp) AS (
       |  SELECT id, id FROM nodes
       |  UNION
       |  SELECT e.dst, w.comp FROM walk w JOIN edges e ON e.src = w.id),
       |lab AS (SELECT id, min(comp) AS comp FROM walk GROUP BY id)""".stripMargin

  /** Mirror of [[graft.pipeline.Dedup.clusters]]: exact union-find via
    * recursive reachability (tractable at oracle scale; the Spark side
    * runs large-star/small-star for the same fixpoint).
    */
  def clusters(pairsSql: String): String =
    s"""${walkCtes(pairsSql)}
       |SELECT id AS doc_id, comp AS cluster_id FROM lab
       |ORDER BY doc_id""".stripMargin

  /** Mirror of [[graft.pipeline.Dedup.dedupCorpus]]: drop every
    * non-keeper cluster member, keep the rest of the corpus.
    */
  def dedupCorpus(pairsSql: String): String =
    s"""${walkCtes(pairsSql)}
       |SELECT d.doc_id, md5(d.text) AS fp FROM documents d
       |WHERE d.doc_id NOT IN (SELECT id FROM lab WHERE id <> comp)
       |ORDER BY d.doc_id""".stripMargin

  /** Mirror of [[graft.pipeline.Taxonomy.rollup]] over `part` —
    * generated from the same Theme list (alias CASE order and
    * hierarchy VALUES share one source of truth).
    */
  def taxonomyRollup: String = {
    import graft.pipeline.Taxonomy
    // alias patterns and SQL literals come from the SAME escaping
    // helpers classify uses — the two sides can never drift on
    // metacharacter aliases or embedded quotes
    val cases = Taxonomy.Themes.filter(_.aliases.nonEmpty).map { t =>
      s"WHEN regexp_matches(lower(p_name), " +
        s"'${Taxonomy.sqlLit(Taxonomy.aliasPattern(t.aliases))}') " +
        s"THEN '${Taxonomy.sqlLit(t.code)}'"
    }.mkString("\n  ")
    val fallback = Taxonomy.Themes.find(_.aliases.isEmpty)
      .map(_.code).getOrElse("other")
    val vals = Taxonomy.Themes
      .map(t => s"('${Taxonomy.sqlLit(t.code)}','${Taxonomy.sqlLit(t.parent)}')")
      .mkString(",")
    // LEFT join + misc default mirrors Taxonomy.rollup: an unmatched
    // leaf (custom taxonomy without a fallback node) still rolls up
    s"""WITH lab AS (SELECT CASE
       |  $cases
       |  ELSE '${Taxonomy.sqlLit(fallback)}' END AS leaf FROM part),
       |tax(leaf, parent) AS (VALUES $vals),
       |j AS (SELECT l.leaf AS leaf, coalesce(t.parent, 'misc') AS parent
       |  FROM lab l LEFT JOIN tax t ON l.leaf = t.leaf)
       |SELECT coalesce(parent,'ALL') AS parent,
       |  coalesce(leaf,'ALL') AS leaf, count(*) AS n
       |FROM j
       |GROUP BY ROLLUP(parent, leaf)
       |ORDER BY parent, leaf""".stripMargin
  }

  def cosineTopK(queryId: Long, k: Int): String =
    s"""WITH q AS (SELECT embedding AS qv FROM embeddings
       |  WHERE vec_id = $queryId)
       |SELECT vec_id,
       |  round(list_cosine_similarity(embedding, qv), 4) AS cos_r
       |FROM embeddings CROSS JOIN q WHERE vec_id <> $queryId
       |ORDER BY cos_r DESC, vec_id LIMIT $k""".stripMargin

  /** Mirror of [[graft.pipeline.Similarity.ivfTopK]]: same centroid
    * set (vec_id < numCentroids), same ROUNDED-similarity assignment
    * with cid tie-break, same probe rule — the candidate set is
    * identical by construction, then exact rerank.
    */
  /** Mirror of the TRAINED quantizer ([[graft.pipeline.Similarity
    * .trainCentroids]]): the Lloyd iterations are UNROLLED into CTE
    * pairs (assign aN → means cN), means and init components rounded
    * to 6 dp and assignment similarities to 4 dp on BOTH engines, so
    * the final centroid set — and therefore the candidate rule — is
    * identical by construction despite float-order differences.
    * trainIters = 0 degrades to the untrained first-N-vectors rule
    * (raw float centroids, no 6 dp rounding — matching the Spark
    * untrained path exactly).
    */
  def ivfTopK(queryId: Long, k: Int, numCentroids: Int,
              probes: Int, trainIters: Int): String = {
    if (trainIters == 0)
      return s"""WITH cents AS (SELECT vec_id AS cid, embedding AS cvec
         |  FROM embeddings WHERE vec_id < $numCentroids),
         |q AS (SELECT embedding AS qv FROM embeddings
         |  WHERE vec_id = $queryId),""".stripMargin +
        ivfServeTail(queryId, k, probes)
    val init =
      s"""c0 AS (SELECT vec_id AS cid,
         |    list_transform(embedding, x -> round(CAST(x AS DOUBLE), 6))
         |      AS cvec
         |  FROM embeddings WHERE vec_id < $numCentroids)""".stripMargin
    val rounds = (1 to trainIters).map { i =>
      val p = i - 1
      s""",a$i AS (SELECT e.vec_id AS vid,
         |    (SELECT c.cid FROM c$p c
         |     ORDER BY round(list_cosine_similarity(e.embedding, c.cvec),
         |       4) DESC, c.cid LIMIT 1) AS cid
         |  FROM embeddings e),
         |x$i AS (SELECT a$i.cid AS cid,
         |    generate_subscripts(e.embedding, 1) AS d,
         |    unnest(e.embedding) AS x
         |  FROM a$i JOIN embeddings e ON a$i.vid = e.vec_id),
         |m$i AS (SELECT cid, d, round(avg(CAST(x AS DOUBLE)), 6) AS m
         |  FROM x$i GROUP BY cid, d),
         |g$i AS (SELECT cid, list(m ORDER BY d) AS cvec
         |  FROM m$i GROUP BY cid),
         |c$i AS (SELECT c$p.cid, coalesce(g$i.cvec, c$p.cvec) AS cvec
         |  FROM c$p LEFT JOIN g$i USING(cid))""".stripMargin
    }.mkString
    val cN = s"c$trainIters"
    s"""WITH $init$rounds,
       |cents AS (SELECT cid, cvec FROM $cN),
       |q AS (SELECT embedding AS qv FROM embeddings
       |  WHERE vec_id = $queryId),""".stripMargin +
      ivfServeTail(queryId, k, probes)
  }

  /** The serve phase shared by trained and untrained mirrors: probe
    * selection over `cents`, rounded-argmax assignment, pruned rerank.
    */
  private def ivfServeTail(queryId: Long, k: Int, probes: Int): String =
    s"""
       |prb AS (SELECT cid FROM cents CROSS JOIN q
       |  ORDER BY round(list_cosine_similarity(cvec, qv), 4) DESC, cid
       |  LIMIT $probes),
       |assign AS (SELECT e.vec_id AS vid,
       |    (SELECT c.cid FROM cents c
       |     ORDER BY round(list_cosine_similarity(e.embedding, c.cvec),
       |       4) DESC, c.cid LIMIT 1) AS cid
       |  FROM embeddings e),
       |cand AS (SELECT vid FROM assign
       |  WHERE cid IN (SELECT cid FROM prb) AND vid <> $queryId)
       |SELECT e.vec_id,
       |  round(list_cosine_similarity(e.embedding, qv), 4) AS cos_r
       |FROM embeddings e JOIN cand ON cand.vid = e.vec_id CROSS JOIN q
       |ORDER BY cos_r DESC, e.vec_id LIMIT $k""".stripMargin

  def knnJoin(numQueries: Int, k: Int): String =
    s"""SELECT qid, nid, cos_r, CAST(rank AS BIGINT) AS rank FROM (
       |  SELECT q.vec_id AS qid, e.vec_id AS nid,
       |    round(list_cosine_similarity(q.embedding, e.embedding), 4)
       |      AS cos_r,
       |    row_number() OVER (PARTITION BY q.vec_id
       |      ORDER BY round(list_cosine_similarity(q.embedding,
       |        e.embedding), 4) DESC, e.vec_id) AS rank
       |  FROM embeddings q JOIN embeddings e ON q.vec_id <> e.vec_id
       |  WHERE q.vec_id < $numQueries)
       |WHERE rank <= $k ORDER BY qid, rank""".stripMargin
}
