package graft.index

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.SparkTestSession
import graft.data.QuerySet
import graft.query.{QuerySpec, ScalarOracle, Searcher}

/** Skew fixture (FIXTURES.md §4): a corpus where one term ("hot")
  * appears in ~40% of docs. Asserts (a) salting splits the hot run
  * into bounded sub-runs, (b) results are rank-identical with and
  * without salting.
  */
class SkewSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  val N = 3000L

  /** Deterministic skewed corpus: 40% of docs contain stopword-storm
    * term "hot" multiple times.
    */
  def skewedDocs(): org.apache.spark.sql.Dataset[Doc] = {
    import spark.implicits._
    spark.range(N).map { i =>
      val h = graft.Det.h(7L, i, 0)
      val base = Seq.tabulate(20)(j =>
        f"w${Math.floorMod(graft.Det.h(7L, i, j + 10), 800L)}%03d")
      val toks =
        if (Math.floorMod(h, 10L) < 4) Seq("hot", "hot", "hot") ++ base
        else base
      Doc(i, s"doc://$i", toks.mkString(" "))
    }
  }

  test("hot term is salted into bounded sub-runs; results identical") {
    import spark.implicits._
    val docs = skewedDocs().cache()
    docs.count()

    val saltedDir = SparkTestSession.tmpDir("graft_skew_salted")
    val plainDir = SparkTestSession.tmpDir("graft_skew_plain")
    val base = IndexBuilder.Config(numBuckets = 8, blockSize = 32,
      numGroups = 2, shufflePartitions = 6)
    IndexBuilder.build(docs, saltedDir, base.copy(saltTarget = 200L), "s")
    IndexBuilder.build(docs, plainDir,
      base.copy(saltTarget = Long.MaxValue), "p")

    // (a) hot term got salted; sub-runs bounded by ~saltTarget
    val hotMeta = spark.read.parquet(s"$saltedDir/terms")
      .filter($"term" === "hot").as[TermMeta].head()
    assert(hotMeta.saltCount > 1, "hot term must be salted")
    // segments carry only skey (term == skey up to '#')
    val subRunSizes = spark.read.parquet(s"$saltedDir/segments")
      .filter($"skey" === "hot" || $"skey".startsWith("hot#"))
      .groupBy($"skey").agg(sum($"n").as("postings"))
      .as[(String, Long)].collect().toMap
    assert(subRunSizes.size == hotMeta.saltCount)
    assert(subRunSizes.values.max <= 2 * 200L,
      s"sub-run exceeds 2x saltTarget: $subRunSizes")
    // plain index holds the whole run under one key
    val plainRun = spark.read.parquet(s"$plainDir/segments")
      .filter($"skey" === "hot").agg(sum($"n")).head().getLong(0)
    assert(plainRun == subRunSizes.values.sum)

    // (b) rank-identical results either way, incl. the hot query
    val queries = Seq(QuerySpec(0, "hot"), QuerySpec(1, "hot w001"),
      QuerySpec(2, "w005 w100 hot"), QuerySpec(3, "w010 w020"))
    val a = Searcher.search(spark, saltedDir, queries, 10).collect()
      .map(h => (h.queryId, h.rank, h.docId, h.score)).sortBy(x => (x._1, x._2))
    val b = Searcher.search(spark, plainDir, queries, 10).collect()
      .map(h => (h.queryId, h.rank, h.docId, h.score)).sortBy(x => (x._1, x._2))
    assert(a.toSeq == b.toSeq)

    // (c) and both match the scalar oracle
    val corpus = ScalarOracle.corpus(
      docs.collect().map(d => (d.docId, d.text)).toSeq)
    queries.foreach { q =>
      val want = ScalarOracle.topK(corpus, q.text, 10)
      val got = a.filter(_._1 == q.queryId).map(x => (x._3, x._4)).toSeq
      assert(got == want, s"query '${q.text}'")
    }
  }
}
