package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Det

/** Similarity search over an embedding column (array<float>):
  * brute-force cosine top-k as the exact baseline, a window-ranked
  * kNN join, and a random-hyperplane LSH-bucketed approximate path —
  * the scale story (bucket first, rerank within bucket: candidate set
  * shrinks by 2^planes, and buckets are independent partitions).
  */
object Similarity {

  /** Cosine similarity between two array columns, computed in double
    * with codegen'd higher-order functions (no UDF).
    */
  def cosine(a: Column, b: Column): Column = {
    val dot = aggregate(zip_with(a, b, (x, y) =>
      x.cast("double") * y.cast("double")), lit(0.0), (acc, v) => acc + v)
    val na = sqrt(aggregate(a, lit(0.0),
      (acc, v) => acc + v.cast("double") * v.cast("double")))
    val nb = sqrt(aggregate(b, lit(0.0),
      (acc, v) => acc + v.cast("double") * v.cast("double")))
    dot / (na * nb)
  }

  /** Exact top-k by cosine vs one query vector (excluded from
    * results). Output ordered by (rounded cosine desc, id asc) so
    * cross-engine double ulp differences cannot reorder rows.
    */
  def cosineTopK(emb: DataFrame, idCol: String, vecCol: String,
                 queryId: Long, k: Int): DataFrame = {
    val q = emb.filter(col(idCol) === queryId)
      .select(col(vecCol)).head().getSeq[Float](0)
    val qArr = array(q.map(v => lit(v)): _*)
    emb.filter(col(idCol) =!= queryId)
      .select(col(idCol),
        round(cosine(col(vecCol), qArr), 4).as("cos_r"))
      .orderBy(desc("cos_r"), col(idCol))
      .limit(k)
  }

  /** kNN join: for each query vector (id < numQueries), its top-k
    * neighbors by cosine — broadcast the small query side, then a
    * BOUNDED top-k instead of a window rank: a row_number window
    * forces a full sort of the corpus×queries scored set per qid
    * partition (O(n log n) and corpus-scale state), where each scan
    * task only ever needs its k best per query. Shape: per-partition
    * bounded heaps (numQueries × k entries of task state) → tiny
    * global merge (≤ k rows per partition per qid) via
    * sort_array+slice. Result rows, tie-breaks and ordering are
    * identical to the window formulation (same oracle).
    */
  def knnJoin(emb: DataFrame, idCol: String, vecCol: String,
              numQueries: Int, k: Int): DataFrame = {
    val spark = emb.sparkSession
    import spark.implicits._
    val q = emb.filter(col(idCol) < numQueries)
      .select(col(idCol).as("qid"), col(vecCol).as("qvec"))
    val scored = emb.select(col(idCol).as("nid"), col(vecCol).as("nvec"))
      .join(broadcast(q), col("nid") =!= col("qid"))
      .select(col("qid"), col("nid"),
        round(cosine(col("qvec"), col("nvec")), 4).as("cos_r"))
    val kk = k
    // Spark's SQL double ordering (nanSafeCompareDoubles): NaN sorts
    // largest, -0.0 == 0.0 — the heap must match it exactly or the
    // k-boundary tie-breaks could diverge from the window formulation
    def cmpD(x: Double, y: Double): Int =
      if (x < y) -1 else if (x > y) 1
      else {
        val nx = java.lang.Double.isNaN(x)
        val ny = java.lang.Double.isNaN(y)
        if (nx && ny) 0 else if (nx) 1 else if (ny) -1 else 0
      }
    val partials = scored.as[(Long, Long, Double)].mapPartitions { it =>
      // head = WORST kept (lowest cos_r; tie → highest nid): the
      // eviction comparator of a (cos_r desc, nid asc) top-k
      val worstFirst = new java.util.Comparator[(Long, Double)] {
        def compare(a: (Long, Double), b: (Long, Double)): Int = {
          val c = cmpD(a._2, b._2)
          if (c != 0) c else java.lang.Long.compare(b._1, a._1)
        }
      }
      val heaps = scala.collection.mutable.LongMap
        .empty[java.util.PriorityQueue[(Long, Double)]]
      it.foreach { case (qid, nid, cos) =>
        val h = heaps.getOrElseUpdate(qid,
          new java.util.PriorityQueue[(Long, Double)](kk + 1, worstFirst))
        if (h.size < kk) h.add((nid, cos))
        else if (worstFirst.compare((nid, cos), h.peek()) > 0) {
          h.poll(); h.add((nid, cos))
        }
      }
      heaps.iterator.flatMap { case (qid, h) =>
        scala.jdk.CollectionConverters.CollectionHasAsScala(h).asScala
          .map(e => (qid, e._1, e._2))
      }
    }.toDF("qid", "nid", "cos_r")
    // global merge: ≤ k rows per (partition, qid) — sort_array on
    // struct(cos_r, -nid) desc == (cos_r desc, nid asc), slice the
    // page, posexplode regenerates rank. No Window node in the plan.
    partials
      .groupBy(col("qid"))
      .agg(slice(sort_array(collect_list(
        struct(col("cos_r"), (-col("nid")).as("nn"))), asc = false),
        1, kk).as("top"))
      .select(col("qid"), posexplode(col("top")).as(Seq("i", "s")))
      .select(col("qid"), (-col("s.nn")).as("nid"),
        col("s.cos_r").as("cos_r"),
        (col("i") + 1).cast("long").as("rank"))
      .orderBy("qid", "rank")
  }

  /** Deterministic pseudo-random hyperplane component for (plane j,
    * dim d) in [-1, 1) — derived from counter-based hashing, so the
    * same planes exist on every executor with no shared state.
    */
  def planeComponent(seed: Long, j: Int, d: Int): Double =
    Det.unit(Det.h(seed, j.toLong * 100003L + d, 5L)) * 2.0 - 1.0

  /** Hyperplane matrix for one LSH table (tables are seed-mixed). */
  def planeMatrix(seed: Long, table: Int, numPlanes: Int,
                  dims: Int): Array[Array[Double]] =
    Array.tabulate(numPlanes, dims)((j, d) =>
      planeComponent(seed + table.toLong * 1000003L, j, d))

  /** Per-plane signed dots of one vector (double accumulation in dim
    * order — the arithmetic the DuckDB mirror reproduces).
    */
  def planeDots(vec: Array[Float], ps: Array[Array[Double]]): Array[Double] = {
    val out = new Array[Double](ps.length)
    var j = 0
    while (j < ps.length) {
      val p = ps(j)
      var dot = 0.0
      var d = 0
      while (d < p.length) { dot += vec(d).toDouble * p(d); d += 1 }
      out(j) = dot
      j += 1
    }
    out
  }

  /** Sign bucket of one vector: bit j set iff dot(vec, plane_j) >= 0.
    * Computed in a tight typed loop — the Column formulation chained
    * numPlanes×dims `element_at` terms, overflowed janino's 64KB
    * method limit, and silently fell back to interpreted evaluation.
    */
  def signBucket(vec: Array[Float], ps: Array[Array[Double]]): Long = {
    val dots = planeDots(vec, ps)
    var b = 0L
    var j = 0
    while (j < dots.length) { if (dots(j) >= 0) b |= (1L << j); j += 1 }
    b
  }

  /** (id, vec, bucket) dataset for one LSH table. */
  def bucketed(emb: DataFrame, idCol: String, vecCol: String,
               numPlanes: Int, seed: Long, table: Int = 0)
      : org.apache.spark.sql.Dataset[(Long, Seq[Float], Long)] = {
    val spark = emb.sparkSession
    import spark.implicits._
    val dims = emb.select(size(col(vecCol))).head().getInt(0)
    val np = numPlanes
    emb.select(col(idCol).cast("long"), col(vecCol))
      .as[(Long, Seq[Float])]
      .mapPartitions { it =>
        // planes derived deterministically on each task — no broadcast
        val ps = planeMatrix(seed, table, np, dims)
        it.map { case (id, v) => (id, v, signBucket(v.toArray, ps)) }
      }
  }

  /** Nearest-centroid assignment: per vector, argmax over centroids of
    * ROUNDED cosine (4 dp, tie → min cid) as a struct-max aggregate —
    * map-side combinable, no window sort; the centroid side broadcasts
    * (a coarse quantizer is small by design). Shared by the per-query
    * IVF, the artifact build, and the k-means trainer so the
    * assignment rule can never drift between them.
    */
  def assignCentroids(emb: DataFrame, idCol: String, vecCol: String,
                      cents: DataFrame): DataFrame =
    emb.select(col(idCol).cast("long").as("vid"), col(vecCol).as("vvec"))
      .crossJoin(broadcast(cents))
      .withColumn("csim", round(cosine(col("vvec"), col("cvec")), 4))
      .groupBy(col("vid"))
      .agg(max(struct(col("csim"), (-col("cid")).as("ncid"))).as("m"))
      .select(col("vid"), (-col("m.ncid")).cast("long").as("cid"))

  /** Train the IVF coarse quantizer with `iters` Lloyd iterations —
    * deterministic and SQL-mirrorable end to end (the reference's
    * analog is its size-adaptive structure selection,
    * /root/reference/packages/core/spheraform_core/services/download.py:38-79):
    *  - init: the first `numCentroids` vectors (components rounded to
    *    6 dp so both engines start from identical doubles);
    *  - each round: assign by the ROUNDED-cosine argmax above, then
    *    recompute each centroid as the element-wise mean of its list,
    *    rounded to 6 dp (the rounding pins Spark-vs-DuckDB float
    *    accumulation differences the same way the 4 dp assignment
    *    rounding does); an emptied list keeps its previous centroid.
    * Output: (cid, cvec array<double>). Shape at scale: each round is
    * one broadcast-assign + one posexplode aggregation — numCentroids
    * × dims grouped means, fully map-side combinable; no iteration
    * state on the driver beyond the loop counter.
    */
  /** @param init warm-start centroid set (cid, cvec) — compaction
    *        retrains from the BASE artifact's committed centroids
    *        instead of the first-N rule (None keeps first-N).
    */
  def trainCentroids(emb: DataFrame, idCol: String, vecCol: String,
                     numCentroids: Int, iters: Int,
                     init: Option[DataFrame] = None): DataFrame = {
    var cents = init.getOrElse(emb.filter(col(idCol) < numCentroids)
      .select(col(idCol).cast("long").as("cid"),
        transform(col(vecCol), v => round(v.cast("double"), 6)).as("cvec")))
    val vecs = emb.select(col(idCol).cast("long").as("vid"),
      col(vecCol).as("vec"))
    for (_ <- 0 until math.max(0, iters)) {
      val assigned = assignCentroids(emb, idCol, vecCol, cents)
      val means = assigned.join(vecs, "vid")
        .select(col("cid"), posexplode(col("vec")).as(Seq("d", "x")))
        .groupBy(col("cid"), col("d"))
        .agg(round(avg(col("x").cast("double")), 6).as("m"))
        .groupBy(col("cid"))
        .agg(transform(array_sort(collect_list(struct(col("d"), col("m")))),
          s => s.getField("m")).as("mvec"))
      cents = cents.join(means, Seq("cid"), "left")
        .select(col("cid"), coalesce(col("mvec"), col("cvec")).as("cvec"))
        // truncate per-round lineage growth (tiny data, deep plans)
        .localCheckpoint(true)
    }
    cents
  }

  /** IVF-flat approximate NN: a data-derived coarse quantizer (the
    * first `numCentroids` vectors — deterministic and SQL-mirrorable)
    * partitions the corpus by max-cosine centroid; a query probes its
    * top `probes` centroids and exact-reranks ONLY vectors assigned
    * there — the candidate set shrinks ~numCentroids/probes-fold and
    * each inverted list is an independent partition at scale.
    * Assignment compares similarities ROUNDED to 4 dp (ties → lower
    * centroid id): the rounding is what lets DuckDB reproduce the
    * exact candidate rule despite float-vs-double accumulation
    * differences, so the operator is equality-checked end to end even
    * though it is approximate vs brute force (recall measured by
    * test).
    */
  def ivfTopK(emb: DataFrame, idCol: String, vecCol: String,
              queryId: Long, k: Int, numCentroids: Int = 16,
              probes: Int = 4): DataFrame = {
    val cents = emb.filter(col(idCol) < numCentroids)
      .select(col(idCol).cast("long").as("cid"), col(vecCol).as("cvec"))
    // assignment: per vector, argmax_{c} round(cos, 4), tie → min cid.
    // struct-max instead of a window: map-side combinable, no
    // per-vector sort — the shape that survives 10^9 vectors.
    val sims = emb.select(col(idCol).cast("long").as("vid"),
        col(vecCol).as("vvec"))
      .crossJoin(broadcast(cents))
      .withColumn("csim", round(cosine(col("vvec"), col("cvec")), 4))
    val assigned = sims
      .groupBy(col("vid"))
      .agg(max(struct(col("csim"), (-col("cid")).as("ncid"))).as("m"))
      .select(col("vid"), (-col("m.ncid")).cast("long").as("cid"))
    val qVec = emb.filter(col(idCol) === queryId)
      .select(col(vecCol)).head().getSeq[Float](0)
    val qArr = array(qVec.map(v => lit(v)).toSeq: _*)
    val qProbes = cents
      .withColumn("qsim", round(cosine(col("cvec"), qArr), 4))
      .orderBy(desc("qsim"), col("cid"))
      .limit(probes).select(col("cid"))
      .collect().map(_.getLong(0)).toSeq
    assigned
      .filter(col("cid").isin(qProbes: _*) && col("vid") =!= queryId)
      .join(emb.select(col(idCol).cast("long").as("vid"),
        col(vecCol).as("vvec")), "vid")
      .select(col("vid").as("vec_id"),
        round(cosine(col("vvec"), qArr), 4).as("cos_r"))
      .orderBy(desc("cos_r"), col("vec_id"))
      .limit(k)
  }

  /** LSH-bucketed approximate NN: multiprobe + multiple tables.
    * Sign-bucket every vector by `numPlanes` hyperplanes per table
    * (tables are seed-mixed, so their plane sets are independent);
    * per table the query probes its own bucket PLUS the buckets
    * reached by flipping the 1-2 planes with the smallest |dot| margin
    * (the classic multiprobe recall recovery — a near neighbor lost to
    * one knife-edge plane is found in the flipped bucket). A vector is
    * a candidate if ANY table places it in a probed bucket — the
    * standard OR-of-tables union that drives recall toward 1 at linear
    * cost in tables — and candidates are exact-reranked. The bucketing
    * pass computes all tables' buckets in one scan (no per-table job,
    * no union/dedup shuffle: the membership test IS the dedup).
    * Approximate by construction (recall < 1) — validated by recall
    * tests, not an equality oracle.
    */
  def lshTopK(emb: DataFrame, idCol: String, vecCol: String,
              queryId: Long, k: Int, numPlanes: Int = 8,
              seed: Long = 42L, multiprobe: Int = 2,
              numTables: Int = 1): DataFrame = {
    val spark = emb.sparkSession
    import spark.implicits._
    val dims = emb.select(size(col(vecCol))).head().getInt(0)
    val qVec = emb.filter(col(idCol) === queryId)
      .select(col(vecCol)).head().getSeq[Float](0).toArray
    val nT = math.max(1, numTables)
    // per-table probe sets (driver: numTables × numPlanes dots)
    val probeSets: Array[Set[Long]] = Array.tabulate(nT) { t =>
      val ps = planeMatrix(seed, t, numPlanes, dims)
      val dots = planeDots(qVec, ps)
      var qBucket = 0L
      var j = 0
      while (j < dots.length) {
        if (dots(j) >= 0) qBucket |= (1L << j); j += 1
      }
      val nearest = dots.zipWithIndex.sortBy(x => math.abs(x._1))
        .take(math.max(0, multiprobe)).map(_._2)
      (Seq(qBucket) ++
        nearest.map(j => qBucket ^ (1L << j)) ++
        (if (nearest.length >= 2)
           Seq(qBucket ^ (1L << nearest(0)) ^ (1L << nearest(1)))
         else Seq.empty)).toSet
    }
    val np = numPlanes
    val sd = seed
    val qid = queryId
    val cands = emb.select(col(idCol).cast("long"), col(vecCol))
      .as[(Long, Seq[Float])]
      .mapPartitions { it =>
        // plane matrices derived deterministically per task
        val mats = Array.tabulate(nT)(t => planeMatrix(sd, t, np, dims))
        it.filter { case (id, v) =>
          id != qid && {
            val arr = v.toArray
            var t = 0
            var hit = false
            while (!hit && t < nT) {
              if (probeSets(t).contains(signBucket(arr, mats(t))))
                hit = true
              t += 1
            }
            hit
          }
        }
      }
      .toDF(idCol, vecCol)
    val qArr = array(qVec.map(v => lit(v)).toSeq: _*)
    cands
      .select(col(idCol),
        round(cosine(col(vecCol), qArr), 4).as("cos_r"))
      .orderBy(desc("cos_r"), col(idCol))
      .limit(k)
  }
}
