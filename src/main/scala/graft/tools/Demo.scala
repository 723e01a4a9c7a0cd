package graft.tools

import graft.parser._

/** Tiny driveable demo of the parser library surface (used by the verify
  * workflow; mirrors examples/find_links.d + remove_tag.d usage).
  */
object Demo {
  def main(args: Array[String]): Unit = {
    val pagePath =
      if (args.nonEmpty) args(0) else "src/test/resources/find_links_page.html"
    val page = scala.io.Source.fromFile(pagePath, "UTF-8").mkString
    val dom = HtmlParser.parseString(page)
    println("LINKS=" + dom.find("a").flatMap(_.params.get("href")).mkString("|"))
    println("TITLE=" + dom.find("title").head.getContent)

    val malformed = HtmlParser.parseString("<p><b>bold</p></b><br><div id='x' broken")
    println("MALFORMED_TOP=" + malformed.childs.length)

    val big = "<div class='c'>" + ("<span a=b>text</span>" * 20000) + "</div>"
    val t0 = System.nanoTime
    val bigDom = HtmlParser.parseString(big)
    println(f"BIG_PARSE_MS=${(System.nanoTime - t0) / 1e6}%.1f spans=${bigDom.find("span").length}")

    val rt = HtmlParser.parseString("<root><a>1</a><b>2</b></root>")
    rt.find("a").foreach(e => rt.removeChild(e))
    println("AFTER_REMOVE=" + rt.toHtml)

    println("PRETTIFY:")
    print(HtmlParser.parseString("<ul><li>one</li><li>two</li></ul>").prettify())
  }
}
