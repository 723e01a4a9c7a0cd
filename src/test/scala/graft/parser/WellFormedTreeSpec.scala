package graft.parser

import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.{Gen, Arbitrary}
import org.scalacheck.rng.Seed

/** FIXTURES.md §4 second generator: random well-formed trees built with
  * the constructor API — rendering with toHtml and re-parsing must
  * reproduce the tree (structure, names, params).
  */
class WellFormedTreeSpec extends AnyFunSuite {

  private val nameGen: Gen[String] =
    Gen.oneOf("div", "p", "b", "section", "item", "x1", "data")
  // param values from the quirk alphabet (incl. quotes that must survive
  // the escape round-trip); no backslashes — escape() is lossy for them
  // (quote_escaper.d:29-40, see ParserPropertySpec)
  private val valGen: Gen[String] =
    Gen.listOf(Gen.oneOf(Gen.alphaNumChar, Gen.oneOf('"', '\'', ' ', '&', ';', '<', '>')))
      .map(_.mkString).map(_.take(12))
  private val keyGen: Gen[String] =
    Gen.nonEmptyListOf(Gen.alphaLowerChar).map(_.mkString.take(8))
  private val paramsGen: Gen[Map[String, String]] =
    Gen.mapOf(Gen.zip(keyGen, valGen)).map(_.take(3))
  private val textGen: Gen[String] =
    Gen.nonEmptyListOf(Gen.oneOf(Gen.alphaNumChar, Gen.const(' ')))
      .map(_.mkString.take(20))
      // a lone text child must not look like markup and must be nonblank
      .filter(s => Ascii.strip(s).nonEmpty)

  private def treeGen(depth: Int): Gen[HtmlNode] =
    if (depth <= 0) textGen.map(HtmlNode.fromRaw)
    else Gen.frequency(
      (2, textGen.map(HtmlNode.fromRaw)),
      (3, for {
        name <- nameGen
        params <- paramsGen
        n <- Gen.choose(0, 3)
        kids <- Gen.listOfN(n, treeGen(depth - 1))
      } yield HtmlNode.create(name, params, kids))
    )

  private def shape(n: HtmlNode): String = {
    val sb = new StringBuilder
    def walk(x: HtmlNode): Unit = {
      if (x.isTag && !x.isEndTag && !x.isComment) {
        sb.append('<').append(x.getTagName).append('|')
          .append(x.params.toSeq.sortBy(_._1).mkString(";")).append('>')
        x.foreachChild(c => if (!c.isEndTag) walk(c))
        sb.append("</>")
      } else if (!x.isTag) {
        sb.append("T(").append(x.rawElement).append(')')
      }
    }
    walk(n)
    sb.toString
  }

  test("toHtml of a constructor-built tree re-parses to the same tree (300 cases)") {
    var checked = 0
    (0 until 600).foreach { i =>
      treeGen(3)(Gen.Parameters.default.withSize(50), Seed(0xF00D + i)).foreach { tree =>
        val root = HtmlNode.container(Seq(tree))
        val html = root.toHtml
        val reparsed = HtmlParser.parseString(html)
        assert(shape(root) == shape(reparsed),
          s"round-trip diverged for html: ${html.take(200)}")
        checked += 1
      }
    }
    assert(checked >= 300)
  }
}
