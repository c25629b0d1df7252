package graft.functions

import org.scalatest.funsuite.AnyFunSuite

import graft.data.PagesGen

class TokenizeExtractSpec extends AnyFunSuite {

  test("tokenizer: lowercase, split on non-alnum, drop empties") {
    assert(Tokenize.tokens("Hello, World! 42").toSeq ==
      Seq("hello", "world", "42"))
    assert(Tokenize.tokens("  a--b__?c  ").toSeq == Seq("a", "b", "c"))
    assert(Tokenize.tokens("").isEmpty)
    assert(Tokenize.tokens(null).isEmpty)
    assert(Tokenize.tokens("ÄÖÜ").isEmpty) // non-ascii folds to separators
  }

  test("extractor: byte-identical text per url on generated pages") {
    (0L until 500L).foreach { i =>
      val p = PagesGen.row(42L, i)
      assert(TextExtractor.extract(p.html) == p.text,
        s"extract(html) != text for row $i (${p.url})")
    }
  }

  test("extractor: multiple <p>, nested tags, entities") {
    val html = "<html><body><p>a &amp; b</p><div>skip</div>" +
      "<p>c <b>bold</b> d</p></body></html>"
    assert(TextExtractor.extractString(html) == "a & b c bold d")
  }

  test("extractor: length-expanding case mappings don't desync offsets") {
    // U+0130 'İ' lowercases to TWO chars — offsets found in a
    // toLowerCase copy would point past (or into the middle of) the
    // original's content; the ASCII-folding search must be immune
    val html = "İİİİ<p>hello İ world</p>İİ<P>two</P>"
    assert(TextExtractor.extractString(html) == "hello İ world two")
    // a page that is mostly expanding chars must not overflow
    val dense = "<p>" + ("İ" * 50) + "</p>"
    assert(TextExtractor.extractString(dense) == "İ" * 50)
  }

  test("generator is deterministic and unique-url") {
    val a = PagesGen.row(42L, 7L)
    val b = PagesGen.row(42L, 7L)
    assert(a.url == b.url && a.text == b.text &&
      a.html.toSeq == b.html.toSeq && a.warc_ts == b.warc_ts)
    val urls = (0L until 2000L).map(i => PagesGen.row(42L, i).url)
    assert(urls.distinct.size == urls.size)
  }

  test("zipf sampling: top ranks dominate (stopword behavior)") {
    val ranks = (0L until 20000L).map(i =>
      PagesGen.sampleRank(graft.Det.unit(graft.Det.h(42L, i, 99L))))
    val top30 = ranks.count(_ < 30).toDouble / ranks.size
    assert(top30 > 0.3, s"top-30 ranks carry $top30 of mass")
  }
}
