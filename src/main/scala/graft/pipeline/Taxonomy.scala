package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Hierarchical theme taxonomy: leaf themes carry ALIAS lists and a
  * parent code (the reference's Theme model — aliases + parent_code
  * self-FK, /root/reference/packages/core/spheraform_core/models/theme.py:10-44);
  * classification matches any alias, and counts roll up the
  * hierarchy. The flat regex classifier (f1_classifier) is the
  * degenerate single-level case.
  *
  * Scale shape: the taxonomy is reference data — tiny next to the
  * corpus — so the leaf→parent resolution is a broadcast join against
  * the classified rows (never a shuffle of the corpus by label), and
  * the alias match compiles into one codegen'd CASE chain over the
  * scanned column.
  */
object Taxonomy {

  /** One theme node: leaf code, parent code, alias terms (any match
    * classifies; first theme in declaration order wins ties).
    */
  case class Theme(code: String, parent: String, aliases: Seq[String])

  /** The demo taxonomy over part names. `other` is the explicit
    * fallback node so unmatched rows still roll up (to `misc`).
    */
  val Themes: Seq[Theme] = Seq(
    Theme("widget", "product", Seq("widget", "gizmo")),
    Theme("fastener", "hardware", Seq("bolt", "nut", "screw")),
    Theme("drive", "hardware", Seq("gear", "cog")),
    Theme("ring", "hardware", Seq("ring")),
    Theme("other", "misc", Seq.empty))

  /** Escape regex metacharacters so an alias is matched LITERALLY —
    * char-by-char escaping (not \Q…\E) because the same pattern must
    * parse under both Java regex (Spark rlike) and RE2 (the DuckDB
    * oracle's regexp_matches).
    */
  private def escapeRegex(s: String): String =
    s.flatMap(c =>
      if ("\\.[]{}()*+?^$|".contains(c)) s"\\$c" else c.toString)

  private def isWordChar(c: Char): Boolean =
    c.isLetterOrDigit || c == '_'

  /** One theme's alias disjunction as a regex: each alias quoted and
    * anchored with word boundaries (`\b` — identical semantics in Java
    * regex and RE2), so alias `ring` matches the WORD ring, not the
    * substring inside `spring`, and metacharacter aliases can't break
    * the pattern. A side whose edge char is NOT a word char (`c++`)
    * gets no anchor there — `\b` between two non-word chars never
    * matches, so anchoring would make the alias unmatchable. Shared by
    * [[classify]] and the oracle-SQL generator — both sides match by
    * construction.
    */
  def aliasPattern(aliases: Seq[String]): String =
    aliases.map { a =>
      val pre = if (a.nonEmpty && isWordChar(a.head)) "\\b" else ""
      val post = if (a.nonEmpty && isWordChar(a.last)) "\\b" else ""
      pre + escapeRegex(a) + post
    }.mkString("|")

  /** Single-quote escaping for SQL string literals generated from
    * theme data (codes/aliases) — shared with the oracle generator.
    */
  def sqlLit(s: String): String = s.replace("'", "''")

  /** Leaf classification of a (lowercased) name column: first theme
    * whose alias disjunction matches. One whole-stage-codegen CASE —
    * no UDF, no per-alias pass.
    */
  def classify(name: Column, themes: Seq[Theme] = Themes): Column = {
    val fallback = themes.find(_.aliases.isEmpty).map(_.code)
      .getOrElse("other")
    themes.filter(_.aliases.nonEmpty).foldLeft(Option.empty[Column]) {
      case (acc, t) =>
        val cond = lower(name).rlike(aliasPattern(t.aliases))
        Some(acc match {
          case None => when(cond, lit(t.code))
          case Some(c) => c.when(cond, lit(t.code))
        })
    }.map(_.otherwise(lit(fallback))).getOrElse(lit(fallback))
  }

  /** The taxonomy as a (leaf, parent) DataFrame — the broadcast side
    * of the rollup join.
    */
  def themesDf(spark: SparkSession,
               themes: Seq[Theme] = Themes): DataFrame = {
    import spark.implicits._
    themes.map(t => (t.code, t.parent)).toDF("leaf", "parent")
  }

  /** Classify each row and roll counts up the hierarchy: one row per
    * (parent, leaf), plus per-parent subtotals and a grand total
    * (leaf/parent = 'ALL'), ordered.
    */
  def rollup(df: DataFrame, nameCol: String,
             themes: Seq[Theme] = Themes): DataFrame = {
    val spark = df.sparkSession
    df.select(classify(col(nameCol), themes).as("leaf"))
      // LEFT join + misc default: with a custom theme list lacking an
      // alias-less fallback node, classify's fallback code has no
      // hierarchy row — an inner join would silently drop every
      // unmatched row from all rollup totals
      .join(broadcast(themesDf(spark, themes)), Seq("leaf"), "left")
      .withColumn("parent", coalesce(col("parent"), lit("misc")))
      .rollup(col("parent"), col("leaf"))
      .agg(count(lit(1)).as("n"))
      .select(coalesce(col("parent"), lit("ALL")).as("parent"),
        coalesce(col("leaf"), lit("ALL")).as("leaf"), col("n"))
      .orderBy("parent", "leaf")
  }
}
