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
