package graft.functions

import java.nio.charset.StandardCharsets

/** Deterministic html → text extractor.
  *
  * The per-row invariant of the engine (BASELINE.json `input_hint`) is
  * that extracted text is byte-identical per url across runs and
  * versions. The reference's ancestor invariant is coordinate
  * preservation through GeoParquet round-trips
  * (/root/reference/packages/core/tests/test_geoparquet_roundtrip.py:20-60);
  * its normalization pipeline is the pure, uniformly-applied transform
  * pattern we mirror (CRS transform,
  * /root/reference/packages/core/spheraform_core/adapters/arcgis.py:362-399).
  *
  * Spec (v1): concatenate the inner text of every `<p>...</p>` element
  * in document order, joined by a single space; strip any tags nested
  * inside; decode the five basic HTML entities. Pure function of the
  * bytes — no parser library, no locale, no regex backtracking.
  */
object TextExtractor {

  def extract(html: Array[Byte]): String =
    extractString(new String(html, StandardCharsets.UTF_8))

  /** UTF8String form — the static entry point the codegen'd Catalyst
    * expression calls (see [[GraftFunctions.extract_text]]): Scala
    * object methods compile to static forwarders, so StaticInvoke can
    * bind it directly in generated Java.
    */
  def extractUtf8(html: Array[Byte]): org.apache.spark.unsafe.types.UTF8String =
    org.apache.spark.unsafe.types.UTF8String.fromString(extract(html))

  def extractString(html: String): String = {
    val sb = new StringBuilder
    var i = 0
    var first = true
    while (i < html.length) {
      val open = indexOfIgnoreCaseAscii(html, "<p>", i)
      if (open < 0) { i = html.length }
      else {
        val close = indexOfIgnoreCaseAscii(html, "</p>", open + 3)
        val end = if (close < 0) html.length else close
        if (!first) sb.append(' ')
        appendStripped(sb, html, open + 3, end)
        first = false
        i = if (close < 0) html.length else close + 4
      }
    }
    sb.toString
  }

  /** Case-insensitive search for an ASCII literal WITHOUT building a
    * lowercased copy of the document: String.toLowerCase can CHANGE
    * LENGTH (U+0130 'İ' lowercases to two chars), so offsets found in
    * a lowered copy desynchronize from the original — indexing the
    * original with them garbles the extraction (or overflows) on any
    * page containing such characters, breaking the byte-identical
    * invariant. Tags are ASCII, so ASCII folding is exact.
    */
  private def indexOfIgnoreCaseAscii(s: String, lit: String,
                                     from: Int): Int = {
    val n = s.length
    val m = lit.length
    var i = math.max(0, from)
    while (i + m <= n) {
      var j = 0
      var ok = true
      while (ok && j < m) {
        val c = s.charAt(i + j)
        val lc = if (c >= 'A' && c <= 'Z') (c + 32).toChar else c
        if (lc != lit.charAt(j)) ok = false
        j += 1
      }
      if (ok) return i
      i += 1
    }
    -1
  }

  /** Append html[from, until) with tags removed and entities decoded. */
  private def appendStripped(sb: StringBuilder, s: String, from: Int, until: Int): Unit = {
    var i = from
    while (i < until) {
      val c = s.charAt(i)
      if (c == '<') {
        val gt = s.indexOf('>', i + 1)
        i = if (gt < 0 || gt >= until) until else gt + 1
      } else if (c == '&') {
        val (decoded, next) = decodeEntity(s, i, until)
        sb.append(decoded)
        i = next
      } else {
        sb.append(c)
        i += 1
      }
    }
  }

  private def decodeEntity(s: String, i: Int, until: Int): (String, Int) = {
    def is(lit: String): Boolean =
      i + lit.length <= until && s.regionMatches(i, lit, 0, lit.length)
    if (is("&amp;")) ("&", i + 5)
    else if (is("&lt;")) ("<", i + 4)
    else if (is("&gt;")) (">", i + 4)
    else if (is("&quot;")) ("\"", i + 6)
    else if (is("&#39;")) ("'", i + 5)
    else ("&", i + 1)
  }

  /** Inverse used by the synthetic generator so that
    * `extract(wrap(text)) == text` byte-identically.
    */
  def escape(text: String): String =
    text.replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")
}
