package graft.data

/** Hand-authored HTML fixtures with HAND-COMPUTED expected extraction
  * output (TextExtractor spec v1: concatenate inner text of every
  * `<p>…</p>` in document order joined by one space; strip nested
  * tags; decode the five basic entities; an unclosed `<p>` runs to
  * end of input). These pin the extractor against an expectation that
  * was NOT produced by the extractor itself — the generator-roundtrip
  * check (`extract(escape(text)) == text`) is true by construction
  * and proves nothing about edge cases.
  */
object ExtractFixtures {

  /** (fixture_id, html, expected extracted text) */
  val all: Seq[(Long, String, String)] = Seq(
    (0L, "<html><p>Hello world</p></html>", "Hello world"),
    (1L, "<p>a &amp; b &lt;c&gt;</p>", "a & b <c>"),
    (2L, "<p>first</p><div>skip this</div><p>second</p>", "first second"),
    (3L, "<p>outer <b>bold</b> text</p>", "outer bold text"),
    (4L, "<P>upper case tag</P>", "upper case tag"),
    (5L, "<p>unclosed until end", "unclosed until end"),
    (6L, "<p>nested <p>inner</p> tail", "nested inner"),
    (7L, "no paragraphs here", ""),
    (8L, "<p>quote: &quot;q&#39;s&quot;</p>", "quote: \"q's\""),
    (9L, "<p>amp alone & lt</p>", "amp alone & lt"),
    (10L, "<p>a</p><p></p><p>b</p>", "a  b"),
    (11L, "<p>tag <br/>line</p>", "tag line"),
    (12L, "<p>broken <tag without close</p>", "broken "),
    (13L, "<p>&lt;</p>", "<"),
    (14L, "<p>multi</p>\n<p>line</p>", "multi line"),
    (15L, "<p>entity cut &am</p>", "entity cut &am"),
    (16L, "<p>tab\tand  spaces</p>", "tab\tand  spaces"),
    (17L, "<p><a href=\"x\">link</a>!</p>", "link!"),
    (18L, "before<p>only this</p>after", "only this"),
    (19L, "<p>gt first &gt;&amp;&lt; mixed</p>", "gt first >&< mixed"))

  /** Binary sniff fixtures: (id, payload bytes, expected content
    * type). Magic-byte prefixes hand-encoded — gzip, png, jpeg, pdf,
    * zip, html, utf8-bom text, plain/unknown.
    */
  val sniff: Seq[(Long, Array[Byte], String)] = Seq(
    (0L, Array(0x1f, 0x8b, 0x08, 0x00).map(_.toByte), "gzip"),
    (1L, Array(0x89, 0x50, 0x4e, 0x47, 0x0d, 0x0a).map(_.toByte), "png"),
    (2L, Array(0xff, 0xd8, 0xff, 0xe0).map(_.toByte), "jpeg"),
    (3L, "%PDF-1.7 blah".getBytes("UTF-8"), "pdf"),
    (4L, Array(0x50, 0x4b, 0x03, 0x04, 0x14).map(_.toByte), "zip"),
    (5L, "<html><p>x</p></html>".getBytes("UTF-8"), "html"),
    (6L, "<!DOCTYPE html><html></html>".getBytes("UTF-8"), "html"),
    (7L, Array[Byte](0xef.toByte, 0xbb.toByte, 0xbf.toByte) ++
      "hello".getBytes("UTF-8"), "text-bom"),
    (8L, "just some plain bytes".getBytes("UTF-8"), "unknown"),
    (9L, Array[Byte](0x00, 0x01, 0x02), "unknown"),
    (10L, Array.emptyByteArray, "unknown"),
    (11L, "<HTML>UPPER</HTML>".getBytes("UTF-8"), "html"))

  def sniffOracleSql: String = {
    val rows = sniff.map { case (id, _, t) => s"($id, '$t')" }
      .mkString(", ")
    s"SELECT * FROM (VALUES $rows) AS t(fixture_id, content_type) " +
      "ORDER BY fixture_id"
  }

  /** DuckDB VALUES-list oracle over the SAME hand-authored expected
    * strings (no table involved — fixtures are committed constants).
    */
  def oracleSql: String = {
    def q(s: String): String =
      "'" + s.replace("'", "''").replace("\t", "' || chr(9) || '") + "'"
    val rows = all.map { case (id, _, exp) => s"($id, ${q(exp)})" }
      .mkString(", ")
    s"SELECT * FROM (VALUES $rows) AS t(fixture_id, text) " +
      "ORDER BY fixture_id"
  }
}
