package graft.parser

import org.scalatest.funsuite.AnyFunSuite

/** Verbatim ports of the reference's main unittest block
  * (/root/reference/dhtmlparser.d:948-997). These are the primary oracle
  * (FIXTURES.md §2 u1-u5).
  */
class ReferenceUnittestSpec extends AnyFunSuite {

  private def dom1 = HtmlParser.parseString(
    "<div Id='xe' a='b'>obsah xe divu</div>  <!-- Id, not id :) -->\n\t\t <div id='xu' a='b'>obsah xu divu</div>"
  )

  test("u1: find by tagname+params, tagToString normalization (dhtmlparser.d:956-960)") {
    val dom = dom1
    val divXe = dom.find("div", Map("id" -> "xe")).head
    val divXu = dom.find("div", Map("id" -> "xu")).head
    assert(divXe.tagToString == """<div a="b" id="xe">""")
    assert(divXu.tagToString == """<div a="b" id="xu">""")
  }

  test("u2: toHtml round-trips the original raw string (dhtmlparser.d:963-964)") {
    val dom = dom1
    val divXe = dom.find("div", Map("id" -> "xe")).head
    val divXu = dom.find("div", Map("id" -> "xu")).head
    assert(divXe.toHtml == "<div Id='xe' a='b'>obsah xe divu</div>")
    assert(divXu.toHtml == "<div id='xu' a='b'>obsah xu divu</div>")
  }

  test("u3: getTagName/isComment/flags (dhtmlparser.d:967-977)") {
    val dom = dom1
    val divXe = dom.find("div", Map("id" -> "xe")).head
    val divXu = dom.find("div", Map("id" -> "xu")).head
    assert(divXe.getTagName == "div")
    assert(divXe.getTagName == divXu.getTagName)
    assert(!divXe.isComment)
    assert(divXe.isComment == divXu.isComment)
    assert(divXe.isNonPairTag != divXe.isOpeningTag)
    assert(divXe.isTag)
    assert(divXe.isTag == divXu.isTag)
  }

  test("u4: getContent exact text (dhtmlparser.d:979)") {
    assert(dom1.find("div", Map("id" -> "xe")).head.getContent == "obsah xe divu")
  }

  test("u5: DFS vs BFS ordering (dhtmlparser.d:982-995)") {
    val dom = HtmlParser.parseString("""
	<div id=first>
		First div.
		<div id=first.subdiv>
			Subdiv in first div.
		</div>
	</div>
	<div id=second>
		Second.
	</div>
	""")
    assert(Ascii.strip(dom.find("div")(1).getContent) == "Subdiv in first div.")
    assert(Ascii.strip(dom.findB("div")(1).getContent) == "Second.")
  }
}
