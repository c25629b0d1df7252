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

  /** Leaf classification of a (lowercased) name column: first theme
    * whose alias disjunction matches. One whole-stage-codegen CASE —
    * no UDF, no per-alias pass.
    */
  def classify(name: Column, themes: Seq[Theme] = Themes): Column = {
    val fallback = themes.find(_.aliases.isEmpty).map(_.code)
      .getOrElse("other")
    themes.filter(_.aliases.nonEmpty).foldLeft(Option.empty[Column]) {
      case (acc, t) =>
        val cond = lower(name).rlike(t.aliases.mkString("|"))
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
      .join(broadcast(themesDf(spark, themes)), "leaf")
      .rollup(col("parent"), col("leaf"))
      .agg(count(lit(1)).as("n"))
      .select(coalesce(col("parent"), lit("ALL")).as("parent"),
        coalesce(col("leaf"), lit("ALL")).as("leaf"), col("n"))
      .orderBy("parent", "leaf")
  }
}
