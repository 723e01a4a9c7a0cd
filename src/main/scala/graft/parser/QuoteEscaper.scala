package graft.parser

/** Backslash quote (un)escaping with the reference's exact semantics
  * (/root/reference/quote_escaper.d:8-40).
  *
  * `unescape`: a backslash immediately before the active quote char is
  * removed; a double backslash "toggles" escaping so `\\"` keeps its
  * backslashes (quote_escaper.d:14-24). Inputs shorter than 2 chars pass
  * through verbatim (quote_escaper.d:9-10).
  *
  * `escape`: inserts a backslash before every occurrence of the quote char
  * (quote_escaper.d:29-40).
  */
object QuoteEscaper {
  def unescape(input: String, quote: Char = '"'): String = {
    if (input.length < 2) return input
    val out = new java.lang.StringBuilder(input.length)
    var unesc = false
    var i = 0
    while (i < input.length) {
      val act = input.charAt(i)
      if (act == quote && unesc) out.setLength(out.length - 1)
      out.append(act)
      unesc = if (act == '\\') !unesc else false
      i += 1
    }
    out.toString
  }

  def escape(input: String, quote: Char = '"'): String = {
    val out = new java.lang.StringBuilder(input.length + 8)
    escapeInto(input, quote, out)
    out.toString
  }

  /** escape() appending into an existing builder (no intermediate String). */
  def escapeInto(input: String, quote: Char, out: java.lang.StringBuilder): Unit = {
    var i = 0
    while (i < input.length) {
      val c = input.charAt(i)
      if (c == quote) out.append('\\')
      out.append(c)
      i += 1
    }
  }
}
