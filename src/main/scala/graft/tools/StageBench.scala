package graft.tools

import graft.parser.{HtmlNode, HtmlParser, Lexer}

/** Per-stage parse cost: lexer alone, lexer+classify, full parse. */
object StageBench {
  def main(args: Array[String]): Unit = {
    val doc = """<html><head><title>conv</title><meta charset="utf-8"></head><body>""" +
      """<nav><a href="/home">Home</a> <a href="/about">About</a></nav>""" +
      """<div class="main" id="main"><h1>Conversation record</h1>""" +
      """<p>""" + ("the quick brown fox jumps over the lazy dog " * 7) + """</p>""" +
      """<p>order 12345 line 3 flag N status O</p>""" +
      """<a href="/ord/12345/3">details</a></div>""" +
      """<footer><p>footer boilerplate text</p></footer></body></html>"""
    println(s"doc bytes: ${doc.length}")

    def run(tag: String, n: Int)(f: => Unit): Unit = {
      var i = 0
      while (i < n / 10) { f; i += 1 }
      val t0 = System.nanoTime()
      i = 0
      while (i < n) { f; i += 1 }
      val sec = (System.nanoTime() - t0) / 1e9
      println(f"[$tag] ${n / sec}%.0f docs/s, ${n.toLong * doc.length / sec / 1e6}%.1f MB/s, ${sec * 1e9 / n}%.0f ns/doc")
    }

    (1 to 2).foreach { round =>
      println(s"--- round $round ---")
      run("lex", 400000) { Lexer.rawSplitWithOffsets(doc) }
      run("lex+classify", 200000) {
        val (toks, _) = Lexer.rawSplitWithOffsets(doc)
        var i = 0
        while (i < toks.length) { HtmlNode.fromRaw(toks(i)); i += 1 }
      }
      run("full parse", 200000) { HtmlParser.parseString(doc) }
    }
  }
}
