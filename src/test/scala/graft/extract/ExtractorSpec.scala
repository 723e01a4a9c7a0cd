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
}
