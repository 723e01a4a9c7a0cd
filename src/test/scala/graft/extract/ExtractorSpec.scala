package graft.extract

import org.scalatest.funsuite.AnyFunSuite

class ExtractorSpec extends AnyFunSuite {

  private val page =
    """<html><head><title>T</title><script>var x=1;</script></head><body>""" +
      """<nav><a href="/home">Home</a> <a href="/about">About</a></nav>""" +
      """<div class="main" id="main"><h1>Conversation record</h1>""" +
      """<p>the quick brown fox jumps over the lazy dog</p>""" +
      """<a href="/ord/1/2">details</a></div>""" +
      """<footer><p>copyright corp long footer text</p></footer>""" +
      """</body></html>"""

  test("boilerplate subtrees (head/nav/footer) are excluded; blocks joined by newline") {
    val r = Extractor.extract(page)
    assert(r.text == "Conversation record\nthe quick brown fox jumps over the lazy dog")
  }

  test("spans point back into the source document") {
    val r = Extractor.extract(page)
    assert(r.spans.nonEmpty)
    r.spans.foreach { s =>
      val sub = page.substring(s.start, s.end)
      assert(r.text.contains(graft.parser.Ascii.strip(sub)))
    }
    assert(r.spans.map(s => page.substring(s.start, s.end)).toSet ==
      Set("Conversation record", "the quick brown fox jumps over the lazy dog"))
  }

  test("link-heavy blocks are dropped (link density filter)") {
    val linksOnly = """<div><a href="/a">first link here</a> <a href="/b">second link here</a></div>"""
    assert(Extractor.extract(linksOnly).text == "")
    // same text not inside links survives
    val plain = """<div>first link here second link here</div>"""
    assert(Extractor.extract(plain).text == "first link here second link here")
  }

  test("short blocks are dropped; whitespace-only text ignored") {
    assert(Extractor.extract("<p>tiny</p>").text == "")
    assert(Extractor.extract("<p>   \n\t  </p>").text == "")
  }

  test("nNodes/nErrors from parse stats") {
    val r = Extractor.extract("<p><b>some longer content</p></b>")
    assert(r.nNodes > 0)
    assert(r.nErrors == 2) // forced-nonpair <b> + dropped stray </b>
  }

  test("block flush on br; adjacent text nodes concatenate within a block") {
    val r = Extractor.extract("<div>first part of content<br>second part of content</div>")
    assert(r.text == "first part of content\nsecond part of content")
  }

  test("deterministic: same input, same output") {
    val a = Extractor.extract(page)
    val b = Extractor.extract(page)
    assert(a == b)
  }

  test("random-soup fuzz: never throws; spans in-bounds, ordered, text-node-clean") {
    // the pipeline feeds the extractor arbitrary crawl bytes at scale —
    // the span contract must survive soup, not just well-formed pages
    import org.scalacheck.{Gen, rng}
    val soupChar: Gen[Char] = Gen.frequency(
      (8, Gen.alphaNumChar),
      (4, Gen.oneOf('<', '>', '/', '=', ' ')),
      (2, Gen.oneOf('\'', '"', '-', '!', '.')),
      (1, Gen.oneOf('\n', '\t', '&', ';')))
    val tagNames = Seq("div", "p", "a", "nav", "pre", "h1", "br", "script")
    val soup: Gen[String] = Gen.listOfN(40, Gen.frequency(
      (3, Gen.listOfN(12, soupChar).map(_.mkString)),
      (3, Gen.oneOf(tagNames).map(t => s"<$t>")),
      (3, Gen.oneOf(tagNames).map(t => s"</$t>")),
      (1, Gen.const("<!-- c -->")))).map(_.mkString)
    val cases = (0 until 500).flatMap(i =>
      soup(Gen.Parameters.default.withSize(200), rng.Seed(0xFACE + i)))
    cases.foreach { s =>
      val r = Extractor.extract(s)
      assert(r == Extractor.extract(s), s"nondeterministic on: $s")
      var prevEnd = -1
      r.spans.foreach { sp =>
        assert(sp.start >= 0 && sp.start < sp.end && sp.end <= s.length, s"bounds on: $s")
        // spans are emitted in document order and never overlap (each
        // covers a distinct text node)
        assert(sp.start >= prevEnd, s"overlap/disorder on: $s")
        prevEnd = sp.end
        val sub = s.substring(sp.start, sp.end)
        // a span covers a text-CLASSIFIED token. Its raw may legally
        // contain '<' (the lenient lexer emits unclosed-tag buffers as
        // text), but it must never itself classify as a tag, and it must
        // carry visible content (blank text nodes are skipped)
        assert(!graft.parser.HtmlNode.fromRaw(sub).isTag, s"tag-classified span on: $s")
        assert(graft.parser.Ascii.strip(sub).nonEmpty, s"blank span on: $s")
      }
      // every kept block's text is reconstructible from the source spans
      if (r.spans.nonEmpty) assert(r.text.nonEmpty)
    }
  }
}
