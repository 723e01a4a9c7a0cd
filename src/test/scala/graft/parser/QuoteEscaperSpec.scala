package graft.parser

import org.scalatest.funsuite.AnyFunSuite

/** Ports of /root/reference/quote_escaper.d:42-51 unittest assertions. */
class QuoteEscaperSpec extends AnyFunSuite {
  import QuoteEscaper._

  test("unescape removes backslash before active quote only (quote_escaper.d:43)") {
    assert(unescape("""\' \\ \" \n""") == """\' \\ " \n""")
  }
  test("unescape with single-quote mode (quote_escaper.d:44)") {
    assert(unescape("""\' \\ \" \n""", '\'') == """' \\ \" \n""")
  }
  test("double backslash protects quote (quote_escaper.d:45-46)") {
    assert(unescape("""\' \\" \n""") == """\' \\" \n""")
  }
  test("unescape full statement (quote_escaper.d:47)") {
    assert(unescape("""printf(\"hello \t world\");""") == """printf("hello \t world");""")
  }
  test("escape doubles quotes (quote_escaper.d:49)") {
    assert(escape("""printf("hello world");""") == """printf(\"hello world\");""")
  }
  test("escape single quote mode (quote_escaper.d:50)") {
    assert(escape("'", '\'') == """\'""")
  }
  test("inputs shorter than 2 chars pass through (quote_escaper.d:9-10)") {
    assert(unescape("\"") == "\"")
    assert(unescape("") == "")
  }
}
