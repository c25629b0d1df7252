package graft.pipeline

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.SparkTestSession

/** Hierarchical theme rollup ([[Taxonomy]]): alias matching, tie
  * order, hierarchy arithmetic, broadcast-join plan.
  */
class TaxonomySpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  def names(ns: String*) = {
    import spark.implicits._
    ns.zipWithIndex.map { case (n, i) => (i.toLong, n) }
      .toDF("id", "p_name")
  }

  test("aliases classify to their theme; declaration order breaks ties") {
    import spark.implicits._
    val df = names("red widget", "small gizmo", "old bolt", "hot gear",
      "tiny ring", "plain thing", "widget bolt")
    val got = df.select(col("p_name"),
      Taxonomy.classify(col("p_name")).as("leaf"))
      .as[(String, String)].collect().toMap
    assert(got("red widget") == "widget")
    assert(got("small gizmo") == "widget") // alias, not its own theme
    assert(got("old bolt") == "fastener")
    assert(got("hot gear") == "drive")
    assert(got("tiny ring") == "ring")
    assert(got("plain thing") == "other") // fallback node
    assert(got("widget bolt") == "widget") // first declared theme wins
  }

  test("rollup: parent subtotals equal the sum of their leaves") {
    import spark.implicits._
    val df = names("a widget", "b gizmo", "c bolt", "d nut", "e gear",
      "f ring", "g thing", "h thing")
    val rows = Taxonomy.rollup(df, "p_name")
      .as[(String, String, Long)].collect()
    val leaf = rows.filter(r => r._2 != "ALL").map(r => (r._1, r._2) -> r._3).toMap
    assert(leaf(("product", "widget")) == 2)
    assert(leaf(("hardware", "fastener")) == 2)
    assert(leaf(("hardware", "drive")) == 1)
    assert(leaf(("hardware", "ring")) == 1)
    assert(leaf(("misc", "other")) == 2)
    val sub = rows.filter(r => r._2 == "ALL" && r._1 != "ALL")
      .map(r => r._1 -> r._3).toMap
    assert(sub == Map("product" -> 2L, "hardware" -> 4L, "misc" -> 2L))
    val grand = rows.filter(r => r._1 == "ALL" && r._2 == "ALL").map(_._3)
    assert(grand.toSeq == Seq(8L))
  }

  test("aliases match whole words, not substrings") {
    import spark.implicits._
    // 'ring' must not classify 'spring'; 'nut' must not match 'minute'
    val got = names("steel spring", "last minute", "lone ring")
      .select(col("p_name"), Taxonomy.classify(col("p_name")).as("leaf"))
      .as[(String, String)].collect().toMap
    assert(got("steel spring") == "other")
    assert(got("last minute") == "other")
    assert(got("lone ring") == "ring")
  }

  test("metacharacter aliases match literally, not as regex") {
    import spark.implicits._
    val themes = Seq(
      Taxonomy.Theme("cpp", "lang", Seq("c++")),
      Taxonomy.Theme("dot", "sym", Seq("a.b")),
      Taxonomy.Theme("other", "misc", Seq.empty))
    val got = names("learn c++ now", "the a.b path", "axb route", "cxx")
      .select(col("p_name"),
        Taxonomy.classify(col("p_name"), themes).as("leaf"))
      .as[(String, String)].collect().toMap
    assert(got("learn c++ now") == "cpp") // '+' quoted, no regex error
    assert(got("the a.b path") == "dot")
    assert(got("axb route") == "other") // '.' is literal, not wildcard
    assert(got("cxx") == "other")
  }

  test("custom taxonomy without a fallback node keeps unmatched rows") {
    import spark.implicits._
    val themes = Seq(Taxonomy.Theme("widget", "product", Seq("widget")))
    val rows = Taxonomy.rollup(names("a widget", "plain thing"), "p_name",
      themes).as[(String, String, Long)].collect()
    // the unmatched row must appear under misc, not vanish
    val grand = rows.filter(r => r._1 == "ALL" && r._2 == "ALL").map(_._3)
    assert(grand.toSeq == Seq(2L))
    assert(rows.exists(r => r._1 == "misc" && r._2 == "other" && r._3 == 1L))
  }

  test("hierarchy resolution joins by broadcast, not shuffle") {
    val df = names("a widget", "c bolt")
    val plan = Taxonomy.rollup(df, "p_name")
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"),
      s"taxonomy join not broadcast:\n$plan")
  }
}
