package graft.functions

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.SparkTestSession
import graft.data.PagesGen

class GraftFunctionsSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  test("extract_text column == pure-Scala extractor, byte-identical") {
    import spark.implicits._
    val pages = PagesGen.pages(spark, 300L)
    val viaExpr = pages
      .select($"url", GraftFunctions.extract_text($"html").as("t"))
      .as[(String, String)].collect().toMap
    (0L until 300L).foreach { i =>
      val p = PagesGen.row(42L, i)
      assert(viaExpr(p.url) == p.text, s"row $i")
    }
  }

  test("registered SQL function works and null-propagates") {
    GraftFunctions.register(spark)
    val pages = PagesGen.pages(spark, 5L)
    pages.createOrReplaceTempView("gf_pages")
    val rows = spark
      .sql("SELECT graft_extract_text(html) AS t, text FROM gf_pages")
      .collect()
    assert(rows.forall(r => r.getString(0) == r.getString(1)))
    val n = spark.sql("SELECT graft_extract_text(CAST(NULL AS BINARY))")
      .head()
    assert(n.isNullAt(0))
  }

  test("extraction plan: codegen'd, scan reads only (url, html)") {
    import spark.implicits._
    val dir = SparkTestSession.tmpDir("gf_pages")
    PagesGen.pages(spark, 50L).write.mode("overwrite").parquet(dir)
    val q = spark.read.parquet(dir)
      .select($"url", GraftFunctions.extract_text($"html").as("t"))
    q.collect()
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("*("), s"no codegen span:\n$plan")
    // assert the ReadSchema DIRECTLY: the old disjunctive form only
    // failed on a full-schema read, so a partial regression that still
    // leaked `text` into the scan passed
    assert(plan.contains("ReadSchema: struct<url:string,html:binary>"),
      s"scan not pruned to exactly (url, html):\n$plan")
    assert(plan.contains("staticinvoke") || plan.contains("extractUtf8"),
      s"StaticInvoke not in plan:\n$plan")
  }

  test("SparkSessionExtensions injection registers the function") {
    // ACTUALLY apply GraftExtensions: clear the default/active session
    // so the builder constructs a NEW SparkSession (same SparkContext)
    // with the extensions installed, then resolve the function through
    // SQL — the previous version built its own StaticInvoke and never
    // exercised the registration path at all
    val base = spark
    org.apache.spark.sql.SparkSession.clearActiveSession()
    org.apache.spark.sql.SparkSession.clearDefaultSession()
    try {
      val extSession = org.apache.spark.sql.SparkSession.builder()
        .withExtensions(new GraftExtensions)
        .getOrCreate()
      assert(extSession ne base, "builder returned the old session — " +
        "extensions were not applied")
      val r = extSession.sql(
        "SELECT graft_extract_text(CAST('<p>x y</p>' AS BINARY)) AS t")
        .head().getString(0)
      assert(r == "x y")
      // the base session must NOT have gained the function implicitly
    } finally {
      org.apache.spark.sql.SparkSession.setDefaultSession(base)
      org.apache.spark.sql.SparkSession.setActiveSession(base)
    }
  }
}
