package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.data.PagesGen
import graft.index.{DocIds, IndexBuilder}

/** Plan-quality assertions: the optimizations the engine depends on at
  * 100 TB must be visible in the physical plan, not assumed.
  */
class PlanSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  lazy val idxDir: String = {
    val dir = SparkTestSession.tmpDir("graft_plan")
    val docs = DocIds.fromPages(PagesGen.pages(spark, 400L), 4)
    IndexBuilder.build(docs, dir,
      IndexBuilder.Config(numBuckets = 8, blockSize = 32, numGroups = 2,
        saltTarget = 200L, shufflePartitions = 4), "plan")
    dir
  }

  test("segment scan prunes partitions by bucket and pushes termHash") {
    val h = IndexBuilder.xxhash("term000001")
    val b = IndexBuilder.bucketOf(h, 8)
    val plan = spark.read.parquet(s"$idxDir/segments")
      .filter(col("bucket") === b && col("termHash") === h)
      .queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") &&
      plan.contains("bucket"), s"no partition pruning in:\n$plan")
    assert(plan.contains("PushedFilters") && plan.contains("termHash"),
      s"no termHash pushdown in:\n$plan")
  }

  test("docs scan for doclen prunes to needed columns only") {
    val plan = spark.read.parquet(s"$idxDir/docs")
      .select(col("docId"), col("dl"))
      .queryExecution.executedPlan.toString
    assert(plan.contains("ReadSchema") && !plan.contains("url"),
      s"url not pruned from:\n$plan")
  }

  test("tokenize+tf pipeline stays in whole-stage codegen from parquet") {
    val pagesDir = SparkTestSession.tmpDir("graft_plan_pages")
    PagesGen.pages(spark, 50L).write.mode("overwrite").parquet(pagesDir)
    val agg = spark.read.parquet(pagesDir)
      .select(graft.functions.Tokenize.tokensCol(col("text")).as("toks"))
      .select(explode(col("toks")).as("term"))
      .groupBy("term").count()
    agg.collect() // finalize THIS query's adaptive plan
    // whole-stage codegen spans render as "*(n) Operator"
    val plan = agg.queryExecution.executedPlan.toString
    assert(plan.contains("*("), s"no codegen span in:\n$plan")
    // tf aggregation must have a map-side partial (combine before shuffle)
    assert(plan.contains("partial_count"), s"no partial agg in:\n$plan")
    // and the scan must prune to the text column only
    assert(plan.contains("ReadSchema") && !plan.contains("html"),
      s"html not pruned from tokenize scan:\n$plan")
  }

  test("back-join of tiny hit set broadcasts") {
    import spark.implicits._
    val hits = Seq((1L, 1), (2L, 2)).toDF("docId", "rank")
    val joined = spark.read.parquet(s"$idxDir/docs")
      .join(broadcast(hits), "docId")
    val plan = joined.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), plan)
  }

  test("dedup_embedding plans without a nested-loop join") {
    import spark.implicits._
    // the round-1 formulation planned a BroadcastNestedLoopJoin over
    // the full pair space; the block join must never regress to it
    val vecs = (0 until 50).map { i =>
      (i.toLong, Array.tabulate(8)(d =>
        (graft.Det.unit(graft.Det.h(5L, i, d)) * 2 - 1).toFloat))
    }.toDF("vec_id", "embedding")
    val plan = graft.pipeline.Dedup
      .embeddingPairsExact(vecs, "vec_id", "embedding", 0.3, 4)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("NestedLoop"),
      s"nested-loop join crept back into:\n$plan")
    assert(!plan.contains("CartesianProduct"),
      s"cartesian product crept back into:\n$plan")
  }

  test("dictionary serve queries never scan the documents table") {
    // ft_fuzzy / ft_prefix read the persisted terms/ artifact and
    // ft_mlt the seed terms' posting blocks — a documents.parquet
    // FileScan in any of these serve plans means the query regressed
    // to a per-query corpus tokenize (round-4 verdict weak #1/#2)
    for (q <- Seq("ft_fuzzy", "ft_prefix", "ft_mlt")) {
      val plan = SparkEntry.queries(q)(spark, "/root/testdata/sf0.001")
        .queryExecution.executedPlan.toString
      assert(!plan.contains("documents.parquet"),
        s"$q serve plan scans the corpus:\n$plan")
      assert(!plan.contains("SortMergeJoin"),
        s"$q serve plan shuffle-joins:\n$plan")
    }
  }

  test("more-like-this seed point read pushes the doc_id filter") {
    // the ONE documents read MLT is allowed — tokenizing the seed
    // doc — must be a pushed point lookup, not a table scan
    val scan = spark.read
      .parquet("/root/testdata/sf0.001/documents.parquet")
      .filter(col("doc_id") === 42L).select(col("text"))
      .queryExecution.executedPlan.toString
    assert(scan.contains("PushedFilters") && scan.contains("doc_id"),
      s"seed read not pushed:\n$scan")
  }

  test("IVF assignment plans as partial aggregation, not a window") {
    import spark.implicits._
    val vecs = (0 until 60).map { i =>
      (i.toLong, Array.tabulate(8)(d =>
        (graft.Det.unit(graft.Det.h(6L, i, d)) * 2 - 1).toFloat))
    }.toDF("vec_id", "embedding")
    val df = graft.pipeline.Similarity
      .ivfTopK(vecs, "vec_id", "embedding", 1L, 5, numCentroids = 8,
        probes = 3)
    val plan = df.queryExecution.executedPlan.toString
    // struct-max argmax = map-side combinable partial agg; a window
    // formulation would shuffle and sort every (vector, centroid) row
    // partial_max specifically — ANY stray partial_ aggregate
    // elsewhere in the plan would satisfy a looser check and leave
    // the map-side-combinable guard dead
    assert(plan.contains("partial_max"),
      s"no map-side partial max in IVF assignment:\n$plan")
    assert(!plan.contains("Window"),
      s"window crept into the IVF assignment:\n$plan")
    assert(plan.contains("BroadcastHashJoin") ||
      plan.contains("BroadcastNestedLoop"),
      s"centroid side not broadcast:\n$plan")
  }

  test("knnJoin plans bounded top-k, not a window rank") {
    import spark.implicits._
    val vecs = (0 until 60).map { i =>
      (i.toLong, Array.tabulate(8)(d =>
        (graft.Det.unit(graft.Det.h(7L, i, d)) * 2 - 1).toFloat))
    }.toDF("vec_id", "embedding")
    val df = graft.pipeline.Similarity
      .knnJoin(vecs, "vec_id", "embedding", numQueries = 5, k = 3)
    val plan = df.queryExecution.executedPlan.toString
    // the window formulation fully sorted the corpus×queries scored
    // set per qid; the bounded shape is per-partition heaps + a tiny
    // collect_list merge — no Window node may appear
    assert(!plan.contains("Window"),
      s"window crept back into knnJoin:\n$plan")
    assert(plan.contains("BroadcastHashJoin") ||
      plan.contains("BroadcastNestedLoop"),
      s"query side not broadcast:\n$plan")
  }
}
