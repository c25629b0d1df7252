package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** The engine's single, versioned tokenizer. Every consumer — index
  * build, query parsing, the scalar golden oracle, and the DuckDB
  * oracle SQL — must use exactly this definition, or rank-identity
  * breaks (SURVEY.md §7 "hard parts").
  *
  * Definition (v1): lowercase; split on runs of characters outside
  * [a-z0-9]; drop empty tokens. No stemming, no stopword removal —
  * stopwords stay in the index and are defused by salting + block-max
  * pruning instead (north rule).
  *
  * Ancestor: the reference's keyword-extraction embryo
  * (/root/reference/packages/core/spheraform_core/adapters/arcgis.py:409-412).
  */
object Tokenize {

  val SplitPattern = "[^a-z0-9]+"

  /** Pure-Scala tokenizer — used by the query parser and the scalar
    * oracle. Must agree byte-for-byte with [[tokensCol]].
    */
  def tokens(text: String): Array[String] = {
    if (text == null) return Array.empty
    // Locale.ROOT: bare toLowerCase is default-locale-sensitive (a
    // tr_TR JVM maps I→ı), which would silently diverge from Spark's
    // locale-independent lower() and break query↔index agreement
    text.toLowerCase(java.util.Locale.ROOT)
      .split(SplitPattern).filter(_.nonEmpty)
  }

  /** Column form built from codegen'd Spark built-ins (no UDF): stays
    * inside whole-stage codegen on the build hot path. `array_remove`
    * (not the higher-order `filter`, whose lambda blocks WSCG) drops
    * the empty tokens a leading/trailing separator produces.
    */
  def tokensCol(text: Column): Column =
    array_remove(split(lower(text), SplitPattern), "")

  /** DuckDB-SQL fragment computing the same token array from a column
    * expression — used when authoring oracle SQL so both engines
    * tokenize identically.
    */
  def duckSql(col: String): String =
    s"list_filter(regexp_split_to_array(lower($col), '[^a-z0-9]+'), t -> t <> '')"
}
