package graft.tools

import graft.extract.Extractor
import graft.spark.HtmlFunctions

/** Dumps parse outputs for the five Transcripts template variants so the
  * DuckDB oracle constants in SparkEntry.oracleSql can be written (and
  * hand-verified against the reference semantics cited in SURVEY.md §2.5).
  * Run: sbt "runMain graft.tools.VariantDump"
  */
object VariantDump {

  def template(variant: Int): String = {
    val dtext = "DTEXT"
    val okey = "OKEY"; val lnum = "LNUM"; val rf = "RF"; val ls = "LS"
    val vblock = variant match {
      case 1 => "<!-- note 11 -->"
      case 2 => "<br><hr><img src=\"/x.png\">"
      case 3 => "<section><section>nested</section>"
      case 4 => "<span title='say \"hi\" now'>q</span>"
      case 5 => "<pre> a  b </pre>"
      case 6 => "< /q3>"
      case 7 => "<em id=\"z2\" class=\"a1\">x</em>"
      case 8 => "<ul><li>one</li><li>two</li></ul>"
      case 9 => "<input disabled type=\"text\">"
      case 10 => "<table><tr><td>c1</td><td>c2</td></tr></table>"
      case _ => ""
    }
    "<html><head><title>conv</title><meta charset=\"utf-8\"></head><body>" +
      "<nav><a href=\"/home\">Home</a> <a href=\"/about\">About</a></nav>" +
      "<div class=\"main\" id=\"main\"><h1>Conversation record</h1>" +
      s"<p>$dtext</p>" +
      s"<p>order $okey line $lnum flag $rf status $ls</p>" +
      s"""<a href="/ord/$okey/$lnum">details</a></div>""" +
      "<footer><p>footer boilerplate text</p></footer>" +
      vblock +
      "</body></html>"
  }

  def main(args: Array[String]): Unit = {
    (0 to 10).foreach { v =>
      val html = template(v)
      println(s"===== variant $v =====")
      println(s"-- input:\n$html")
      val rt = HtmlFunctions.roundtrip(html)
      println(s"-- roundtrip == input: ${rt == html}")
      if (rt != html) println(s"-- roundtrip:\n$rt")
      println(s"-- node_count: ${HtmlFunctions.nodeCount(html)}")
      println("-- dom_tag_nodes (node_id,parent_id,pos,depth,kind,tagname,nonpair):")
      HtmlFunctions.domTagNodes(html).foreach(r => println(s"   $r"))
      println("-- bfs_tag_order (bfs_pos,tagname,is_end):")
      HtmlFunctions.bfsTagOrder(html).foreach(r => println(s"   $r"))
      println("-- prettify:")
      println(HtmlFunctions.prettifyHtml(html).replace("\n", "\\n\n"))
      val ex = Extractor.extract(html)
      println(s"-- extract_main text:\n${ex.text}")
      println(s"-- extract nNodes=${ex.nNodes} nErrors=${ex.nErrors}")
      println(s"-- remove nav,footer:\n${HtmlFunctions.removeTags(html, Seq("nav", "footer"))}")
      println(s"-- span tag_str: ${HtmlFunctions.firstTagString(html, "span", "title", "say \"hi\" now")}")
      println("-- find_nodes(a, href=/home):")
      HtmlFunctions.findNodes(html, "a", Map("href" -> "/home"))
        .foreach(r => println(s"   id=${r.node_id} tag=${r.tagname} params=${r.params}"))
      println()
    }
  }
}
