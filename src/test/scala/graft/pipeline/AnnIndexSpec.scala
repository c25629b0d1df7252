package graft.pipeline

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.SparkTestSession

/** Persisted ANN artifacts ([[AnnIndex]]): serve-equality with the
  * per-query formulations, partition-pruned serve plans, and lineage
  * fencing on rebuild.
  */
class AnnIndexSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  /** The CONTENT of every PartitionFilters list in the plan — a bare
    * `plan.contains("PartitionFilters")` is vacuous (partitioned scans
    * always print the header, even empty, and the column names appear
    * in ReadSchema regardless).
    */
  def partitionFilters(plan: String): String =
    "PartitionFilters: \\[([^\\]]*)\\]".r.findAllMatchIn(plan)
      .map(_.group(1)).mkString(";")

  def vecsDf(n: Int, dims: Int, seed: Long) = {
    import spark.implicits._
    (0 until n).map { i =>
      (i.toLong, Array.tabulate(dims)(d =>
        (graft.Det.unit(graft.Det.h(seed, i, d)) * 2 - 1).toFloat))
    }.toDF("vec_id", "embedding")
  }

  test("IVF artifact serve == per-query ivfTopK; scan prunes to probes") {
    val emb = vecsDf(120, 8, 11L)
    val dir = SparkTestSession.tmpDir("graft_ann_ivf")
    AnnIndex.buildIvf(emb, "vec_id", "embedding", dir,
      numCentroids = 8, lineage = "spec")
    val q = AnnIndex.lookupVec(emb, "vec_id", "embedding", 3L)
    val served = AnnIndex.ivfTopK(spark, dir, q, 3L, 10, probes = 3)
    val want = Similarity.ivfTopK(emb, "vec_id", "embedding", 3L, 10,
      numCentroids = 8, probes = 3)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(served.collect().map(r => (r.getLong(0), r.getDouble(1)))
      .toSeq == want)
    assert(want.nonEmpty)
    val plan = served.queryExecution.executedPlan.toString
    assert(partitionFilters(plan).contains("cid"),
      s"IVF serve not partition-pruned:\n$plan")
  }

  test("LSH artifact serve == per-query lshTopK; scan prunes buckets") {
    val emb = vecsDf(150, 8, 12L)
    val dir = SparkTestSession.tmpDir("graft_ann_lsh")
    AnnIndex.buildLsh(emb, "vec_id", "embedding", dir,
      numPlanes = 6, numTables = 3, seed = 42L, lineage = "spec")
    val q = AnnIndex.lookupVec(emb, "vec_id", "embedding", 5L)
    val served = AnnIndex.lshTopK(spark, dir, q, 5L, 10, multiprobe = 2)
    val want = Similarity.lshTopK(emb, "vec_id", "embedding", 5L, 10,
      numPlanes = 6, seed = 42L, multiprobe = 2, numTables = 3)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(served.collect().map(r => (r.getLong(0), r.getDouble(1)))
      .toSeq == want)
    assert(want.nonEmpty)
    val plan = served.queryExecution.executedPlan.toString
    assert(partitionFilters(plan).contains("bkt") &&
      partitionFilters(plan).contains("t"),
      s"LSH serve not partition-pruned:\n$plan")
  }

  test("IVF rebuild is skipped on same lineage, forced on change") {
    val emb = vecsDf(40, 4, 13L)
    val dir = SparkTestSession.tmpDir("graft_ann_line")
    AnnIndex.buildIvf(emb, "vec_id", "embedding", dir,
      numCentroids = 4, lineage = "gen1")
    val stats1 = graft.index.IndexPaths.readString(spark,
      s"$dir/ann_stats.json")
    val mtime1 = graft.index.IndexPaths.fs(spark, dir)
      .getFileStatus(new org.apache.hadoop.fs.Path(s"$dir/ann_stats.json"))
      .getModificationTime
    // same lineage: no rebuild (marker untouched)
    AnnIndex.buildIvf(emb, "vec_id", "embedding", dir,
      numCentroids = 4, lineage = "gen1")
    val mtime2 = graft.index.IndexPaths.fs(spark, dir)
      .getFileStatus(new org.apache.hadoop.fs.Path(s"$dir/ann_stats.json"))
      .getModificationTime
    assert(mtime2 == mtime1, "same-lineage rebuild rewrote the artifact")
    // changed lineage (new source generation): full rebuild
    AnnIndex.buildIvf(emb, "vec_id", "embedding", dir,
      numCentroids = 4, lineage = "gen2")
    val stats2 = graft.index.IndexPaths.readString(spark,
      s"$dir/ann_stats.json")
    assert(stats1.contains("gen1") && stats2.contains("gen2"))
  }

  /** Clustered embeddings with a DEGENERATE prefix: the first
    * `degenerateInit` ids all sit in cluster 0, so the untrained
    * first-N-vectors quantizer starts with every centroid inside one
    * cluster — the worst case its training exists to fix. Remaining
    * ids round-robin across well-separated cluster centers with small
    * deterministic noise.
    */
  def clusteredDf(n: Int, dims: Int, clusters: Int, seed: Long,
                  degenerateInit: Int) = {
    import spark.implicits._
    (0 until n).map { i =>
      val c = if (i < degenerateInit) 0 else i % clusters
      val center = Array.tabulate(dims)(d =>
        graft.Det.unit(graft.Det.h(seed, 9000L + c, d)) * 2 - 1)
      val noise = Array.tabulate(dims)(d =>
        (graft.Det.unit(graft.Det.h(seed, i, d)) * 2 - 1) * 0.15)
      (i.toLong,
        Array.tabulate(dims)(d => (center(d) + noise(d)).toFloat))
    }.toDF("vec_id", "embedding")
  }

  def listSizes(dir: String): Seq[Long] =
    spark.read.parquet(s"$dir/lists").groupBy("cid").count()
      .collect().map(_.getLong(1)).toSeq

  def recallAt(dir: String, emb: org.apache.spark.sql.DataFrame,
               qid: Long, k: Int, probes: Int): Double = {
    val q = AnnIndex.lookupVec(emb, "vec_id", "embedding", qid)
    val got = AnnIndex.ivfTopK(spark, dir, q, qid, k, probes)
      .collect().map(_.getLong(0)).toSet
    val truth = Similarity.cosineTopK(emb, "vec_id", "embedding", qid, k)
      .collect().map(_.getLong(0)).toSet
    got.intersect(truth).size.toDouble / truth.size
  }

  test("trained quantizer balances lists and lifts recall from a degenerate init") {
    val emb = clusteredDf(240, 16, 4, 21L, degenerateInit = 8)
    val untrained = SparkTestSession.tmpDir("graft_ann_ivf_u")
    val trained = SparkTestSession.tmpDir("graft_ann_ivf_t")
    AnnIndex.buildIvf(emb, "vec_id", "embedding", untrained,
      numCentroids = 8, lineage = "spec", trainIters = 0)
    AnnIndex.buildIvf(emb, "vec_id", "embedding", trained,
      numCentroids = 8, lineage = "spec", trainIters = 2)
    // balance: trained lists stay within 3x the mean; the degenerate
    // untrained build must not be better-balanced than the trained one
    val tSizes = listSizes(trained)
    val uSizes = listSizes(untrained)
    val tRatio = tSizes.max.toDouble * tSizes.size / tSizes.sum
    val uRatio = uSizes.max.toDouble * uSizes.size / uSizes.sum
    assert(tRatio <= 3.0, s"trained lists unbalanced: $tSizes")
    assert(tRatio <= uRatio,
      s"training worsened balance: trained $tSizes vs untrained $uSizes")
    // recall@20 at equal probes: trained >= untrained on every query
    val qids = Seq(33L, 50L, 101L)
    val tRec = qids.map(recallAt(trained, emb, _, 20, probes = 2))
    val uRec = qids.map(recallAt(untrained, emb, _, 20, probes = 2))
    assert(tRec.zip(uRec).forall { case (t, u) => t >= u },
      s"trained recall $tRec < untrained $uRec")
    assert(tRec.sum > uRec.sum || uRec.forall(_ == 1.0),
      s"training bought no recall: trained $tRec untrained $uRec")
  }

  test("IVF base + delta serves identically to a full rebuild") {
    val emb = vecsDf(120, 8, 14L)
    val base = emb.filter(col("vec_id") < 80)
    val fresh = emb.filter(col("vec_id") >= 80)
    val baseDir = SparkTestSession.tmpDir("graft_ann_ivf_base")
    val deltaDir = SparkTestSession.tmpDir("graft_ann_ivf_delta")
    val fullDir = SparkTestSession.tmpDir("graft_ann_ivf_full")
    AnnIndex.buildIvf(base, "vec_id", "embedding", baseDir,
      numCentroids = 8, lineage = "b1")
    AnnIndex.buildIvfDelta(fresh, "vec_id", "embedding", baseDir,
      deltaDir, lineage = "d1")
    AnnIndex.buildIvf(emb, "vec_id", "embedding", fullDir,
      numCentroids = 8, lineage = "f1")
    val q = AnnIndex.lookupVec(emb, "vec_id", "embedding", 3L)
    val gens = AnnIndex.ivfTopKMulti(spark, Seq(baseDir, deltaDir),
      q, 3L, 10, probes = 3)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    val full = AnnIndex.ivfTopK(spark, fullDir, q, 3L, 10, probes = 3)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(gens == full && full.nonEmpty)
    // delta hits actually surface (the delta half contains neighbors)
    assert(gens.exists(_._1 >= 80L),
      s"no delta-generation vector in the top-k: $gens")
    // a delta against a DIFFERENT base is refused
    val otherBase = SparkTestSession.tmpDir("graft_ann_ivf_base2")
    AnnIndex.buildIvf(base, "vec_id", "embedding", otherBase,
      numCentroids = 8, lineage = "b2")
    intercept[IllegalArgumentException] {
      AnnIndex.ivfTopKMulti(spark, Seq(otherBase, deltaDir), q, 3L, 10,
        probes = 3).collect()
    }
  }

  test("LSH base + delta serves identically to a full rebuild") {
    val emb = vecsDf(150, 8, 15L)
    val base = emb.filter(col("vec_id") < 100)
    val fresh = emb.filter(col("vec_id") >= 100)
    val baseDir = SparkTestSession.tmpDir("graft_ann_lsh_base")
    val deltaDir = SparkTestSession.tmpDir("graft_ann_lsh_delta")
    val fullDir = SparkTestSession.tmpDir("graft_ann_lsh_full")
    AnnIndex.buildLsh(base, "vec_id", "embedding", baseDir,
      numPlanes = 6, numTables = 3, seed = 42L, lineage = "b1")
    AnnIndex.buildLshDelta(fresh, "vec_id", "embedding", baseDir,
      deltaDir, lineage = "d1")
    AnnIndex.buildLsh(emb, "vec_id", "embedding", fullDir,
      numPlanes = 6, numTables = 3, seed = 42L, lineage = "f1")
    val q = AnnIndex.lookupVec(emb, "vec_id", "embedding", 5L)
    val gens = AnnIndex.lshTopKMulti(spark, Seq(baseDir, deltaDir),
      q, 5L, 10, multiprobe = 2)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    val full = AnnIndex.lshTopK(spark, fullDir, q, 5L, 10,
      multiprobe = 2)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(gens == full && full.nonEmpty)
  }

  test("hot lists split across salted writers without changing results") {
    val emb = vecsDf(120, 8, 16L)
    val one = SparkTestSession.tmpDir("graft_ann_salt1")
    val salted = SparkTestSession.tmpDir("graft_ann_salt2")
    AnnIndex.buildIvf(emb, "vec_id", "embedding", one,
      numCentroids = 4, lineage = "s1")
    AnnIndex.buildIvf(emb, "vec_id", "embedding", salted,
      numCentroids = 4, lineage = "s2", listSaltTarget = 8L)
    val q = AnnIndex.lookupVec(emb, "vec_id", "embedding", 7L)
    def serve(d: String) = AnnIndex.ivfTopK(spark, d, q, 7L, 10,
      probes = 2).collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(serve(one) == serve(salted) && serve(one).nonEmpty)
    // every >target list actually fanned out into multiple part files
    val f = graft.index.IndexPaths.fs(spark, salted)
    // partition-column cid infers as int on read-back — cast to long
    val hot = spark.read.parquet(s"$salted/lists")
      .groupBy(col("cid").cast("long").as("cid")).count()
      .collect().filter(_.getLong(1) > 8L).map(_.getLong(0))
    assert(hot.nonEmpty, "precondition: no list exceeded the salt target")
    hot.foreach { cid =>
      val parts = f.listStatus(new org.apache.hadoop.fs.Path(
        s"$salted/lists/cid=$cid"))
        .count(_.getPath.getName.startsWith("part-"))
      assert(parts > 1, s"hot list cid=$cid wrote a single file")
    }
  }

  test("serve refuses an uncommitted artifact dir") {
    val dir = SparkTestSession.tmpDir("graft_ann_none")
    intercept[IllegalArgumentException] {
      AnnIndex.ivfTopK(spark, dir, Seq(0.1f, 0.2f), 0L, 5, probes = 2)
    }
    intercept[IllegalArgumentException] {
      AnnIndex.lshTopK(spark, dir, Seq(0.1f, 0.2f), 0L, 5)
    }
  }

  test("compaction folds a chain into one base; the chain continues") {
    val emb = vecsDf(150, 8, 17L)
    val base = emb.filter(col("vec_id") < 80)
    val fresh = emb.filter(col("vec_id") >= 80 && col("vec_id") < 120)
    val fresh2 = emb.filter(col("vec_id") >= 120)
    val baseDir = SparkTestSession.tmpDir("graft_ann_cp_base")
    val deltaDir = SparkTestSession.tmpDir("graft_ann_cp_delta")
    val compDir = SparkTestSession.tmpDir("graft_ann_cp_comp")
    AnnIndex.buildIvf(base, "vec_id", "embedding", baseDir,
      numCentroids = 8, lineage = "cb1")
    AnnIndex.buildIvfDelta(fresh, "vec_id", "embedding", baseDir,
      deltaDir, lineage = "cd1")
    val q = AnnIndex.lookupVec(emb, "vec_id", "embedding", 3L)
    def topk(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    // no-retrain compaction: centroids and assignments are kept —
    // serving the folded artifact is EXACTLY the multi-gen serve
    AnnIndex.compactIvf(spark, Seq(baseDir, deltaDir), compDir, "c1")
    val multi = topk(AnnIndex.ivfTopKMulti(spark,
      Seq(baseDir, deltaDir), q, 3L, 10, probes = 3))
    val comp = topk(AnnIndex.ivfTopK(spark, compDir, q, 3L, 10,
      probes = 3))
    assert(comp == multi && comp.nonEmpty)
    // the chain CONTINUES off the compacted base: a new delta against
    // it serves == a full rebuild over all 150 (untrained centroid
    // rule is vec_id < 8, identical in both worlds)
    val delta2Dir = SparkTestSession.tmpDir("graft_ann_cp_d2")
    val fullDir = SparkTestSession.tmpDir("graft_ann_cp_full")
    AnnIndex.buildIvfDelta(fresh2, "vec_id", "embedding", compDir,
      delta2Dir, lineage = "cd2")
    AnnIndex.buildIvf(emb, "vec_id", "embedding", fullDir,
      numCentroids = 8, lineage = "cf1")
    assert(topk(AnnIndex.ivfTopKMulti(spark, Seq(compDir, delta2Dir),
        q, 3L, 10, probes = 3)) ==
      topk(AnnIndex.ivfTopK(spark, fullDir, q, 3L, 10, probes = 3)),
      "chain off the compacted base != full rebuild")
    // retrain-on-compact == a trained build over the merged corpus
    // (warm start == the trainer's first-N init for an untrained base)
    val compRt = SparkTestSession.tmpDir("graft_ann_cp_rt")
    val fullRt = SparkTestSession.tmpDir("graft_ann_cp_rtfull")
    AnnIndex.compactIvf(spark, Seq(baseDir, deltaDir), compRt, "c2",
      retrainIters = 2)
    AnnIndex.buildIvf(emb.filter(col("vec_id") < 120), "vec_id",
      "embedding", fullRt, numCentroids = 8, lineage = "cf2",
      trainIters = 2)
    assert(topk(AnnIndex.ivfTopK(spark, compRt, q, 3L, 10, probes = 3))
        == topk(AnnIndex.ivfTopK(spark, fullRt, q, 3L, 10, probes = 3)),
      "retrain-on-compact != trained rebuild over the merged corpus")

    // LSH: pure file consolidation — folded serve == multi-gen serve
    val lBase = SparkTestSession.tmpDir("graft_ann_cp_lb")
    val lDelta = SparkTestSession.tmpDir("graft_ann_cp_ld")
    val lComp = SparkTestSession.tmpDir("graft_ann_cp_lc")
    AnnIndex.buildLsh(base, "vec_id", "embedding", lBase,
      numPlanes = 6, numTables = 3, seed = 42L, lineage = "lb1")
    AnnIndex.buildLshDelta(fresh, "vec_id", "embedding", lBase,
      lDelta, lineage = "ld1")
    AnnIndex.compactLsh(spark, Seq(lBase, lDelta), lComp, "lc1")
    val qL = AnnIndex.lookupVec(emb, "vec_id", "embedding", 5L)
    assert(topk(AnnIndex.lshTopK(spark, lComp, qL, 5L, 10,
        multiprobe = 2)) ==
      topk(AnnIndex.lshTopKMulti(spark, Seq(lBase, lDelta), qL, 5L, 10,
        multiprobe = 2)),
      "LSH compaction != multi-gen serve")
  }
}
