package graft.tools

import graft.parser.HtmlParser
import graft.extract.Extractor

/** Single-threaded parser microbenchmark (no Spark). */
object MicroBench {
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
      while (i < n / 10) { f; i += 1 } // warmup
      val t0 = System.nanoTime()
      i = 0
      while (i < n) { f; i += 1 }
      val sec = (System.nanoTime() - t0) / 1e9
      println(f"[$tag] ${n / sec}%.0f docs/s, ${n.toLong * doc.length / sec / 1e6}%.1f MB/s, ${sec * 1e9 / n}%.0f ns/doc")
    }

    // two interleaved rounds; read the second (JIT + box noise damping)
    (1 to 2).foreach { round =>
      println(s"--- round $round ---")
      run("parse", 200000) { HtmlParser.parseString(doc) }
      run("parse+toHtml", 100000) { HtmlParser.parseString(doc).toHtml }
      run("parse+getContent(p)", 100000) {
        HtmlParser.parseString(doc).find("p").head.getContent
      }
      run("extract", 100000) { Extractor.extract(doc) }
    }
  }
}
