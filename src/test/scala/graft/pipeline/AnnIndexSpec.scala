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

  test("serve refuses an uncommitted artifact dir") {
    val dir = SparkTestSession.tmpDir("graft_ann_none")
    intercept[IllegalArgumentException] {
      AnnIndex.ivfTopK(spark, dir, Seq(0.1f, 0.2f), 0L, 5, probes = 2)
    }
    intercept[IllegalArgumentException] {
      AnnIndex.lshTopK(spark, dir, Seq(0.1f, 0.2f), 0L, 5)
    }
  }
}
