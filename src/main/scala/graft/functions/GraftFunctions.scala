package graft.functions

import org.apache.spark.sql.{Column, SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.objects.StaticInvoke
import org.apache.spark.sql.types.{BinaryType, StringType}

/** Native Catalyst surface for the engine's scalar functions.
  *
  * `extract_text` is a real codegen'd expression (StaticInvoke emits a
  * direct static call in generated Java — no UDF serialization, no
  * codegen fallback), so html→text extraction runs inside whole-stage
  * codegen with the `html` column pruned straight off the parquet
  * scan. Preference order per the build rules: built-ins > native
  * Expression > UDF — the tokenizer is pure built-ins
  * ([[Tokenize.tokensCol]]); extraction needs this Expression because
  * no built-in parses html.
  */
object GraftFunctions {

  private def extractExpr(child: Expression): Expression =
    StaticInvoke(
      TextExtractor.getClass,
      StringType,
      "extractUtf8",
      Seq(child),
      inputTypes = Seq(BinaryType),
      propagateNull = true,
      returnNullable = false)

  /** Column form: deterministic html(binary) → text(string). */
  def extract_text(html: Column): Column =
    internal.wrap(extractExpr(internal.expr(html)))

  /** SQL registration: `SELECT graft_extract_text(html) FROM pages`. */
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_extract_text", exprs => extractExpr(exprs.head), "scala_udf")

  /** Column <-> Expression bridge (Spark 4 moved Column internals
    * behind private[sql]; see org.apache.spark.sql.graft.bridge). */
  private object internal {
    def expr(c: Column): Expression =
      org.apache.spark.sql.graft.bridge.expression(c)
    def wrap(e: Expression): Column =
      org.apache.spark.sql.graft.bridge.column(e)
  }
}

/** SparkSessionExtensions hook: registers the engine's native
  * functions at session build time —
  * `.withExtensions(new GraftExtensions)` or
  * `spark.sql.extensions=graft.functions.GraftExtensions`.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      new org.apache.spark.sql.catalyst.FunctionIdentifier("graft_extract_text"),
      new org.apache.spark.sql.catalyst.expressions.ExpressionInfo(
        classOf[GraftFunctions.type].getName, "graft_extract_text"),
      (exprs: Seq[Expression]) => StaticInvoke(
        TextExtractor.getClass,
        StringType,
        "extractUtf8",
        exprs,
        inputTypes = Seq(BinaryType),
        propagateNull = true,
        returnNullable = false)))
  }
}
