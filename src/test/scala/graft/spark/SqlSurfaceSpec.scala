package graft.spark

import org.apache.spark.sql.functions._

/** The registered SQL surface: every UDF must be callable from
  * spark.sql(...) so the library works for SQL-only users.
  */
class SqlSurfaceSpec extends SparkTestBase {
  import spark.implicits._

  test("all registered functions are usable from SQL") {
    HtmlFunctions.register(spark)
    Seq(("c1", 0, "<div id='m'><a href='/x'>go</a> some main content text</div>"))
      .toDF("conv_id", "turn_idx", "text").createOrReplaceTempView("turns")

    val row = spark.sql(
      """SELECT
        |  find_links(text) AS links,
        |  get_content(text, 'div') AS content,
        |  to_html(text) AS rt,
        |  node_count(text) AS n,
        |  prettify_html(text) AS pretty,
        |  first_tag_string(text, 'div', 'id', 'm') AS ts,
        |  extract_main(text)._1 AS extracted,
        |  size(parse_html(text)) AS n_nodes
        |FROM turns""".stripMargin).head

    assert(row.getSeq[String](row.fieldIndex("links")).toSeq == Seq("/x"))
    assert(row.getAs[String]("rt") == "<div id='m'><a href='/x'>go</a> some main content text</div>")
    assert(row.getAs[Int]("n") == 6)
    assert(row.getAs[String]("ts") == """<div id="m">""")
    assert(row.getAs[String]("extracted").contains("some main content text"))
    assert(row.getAs[Int]("n_nodes") == 7) // 6 tokens + container
  }

  test("spans_view: packed span columns unpack from SQL") {
    HtmlFunctions.register(spark)
    val packed = SpanCodec.packPos(3, 8)
    Seq((Array(packed), Array(SpanCodec.kindByte("text"))))
      .toDF("span_pos", "span_kind").createOrReplaceTempView("ex")
    val row = spark.sql(
      "SELECT inline(spans_view(span_pos, span_kind)) FROM ex").head
    assert(row.getAs[Int]("start") == 3 && row.getAs[Int]("end") == 8 &&
      row.getAs[String]("kind") == "text")
  }

  test("find_nodes: generic find(tag, params) from SQL, arena ids + DFS order") {
    HtmlFunctions.register(spark)
    Seq(("c1", 0,
      "<div><a href='/x' rel='me'>one</a><p><a href='/y'>two</a></p><a href='/x'>three</a></div>"))
      .toDF("conv_id", "turn_idx", "text").createOrReplaceTempView("turns2")

    // tag-only match: DFS pre-order, endtags excluded (reference find)
    val all = spark.sql(
      "SELECT find_nodes(text, 'a', map()) AS ns FROM turns2")
      .select(explode(col("ns")).as("n")).select("n.node_id", "n.tagname").as[(Int, String)]
      .collect().toSeq
    assert(all.map(_._2).forall(_ == "a") && all.size == 3)
    assert(all.map(_._1) == all.map(_._1).sorted) // pre-order ids ascend

    // params-subset match (Q21): only href=/x anchors
    val hx = spark.sql(
      "SELECT find_nodes(text, 'a', map('href', '/x')) AS ns FROM turns2")
      .select(explode(col("ns")).as("n"))
      .select(element_at(col("n.params"), "href")).as[String].collect().toSeq
    assert(hx == Seq("/x", "/x"))

    // ids are the parse arena's ids (match parse_html positions)
    val html = "<div><a href='/x' rel='me'>one</a><p><a href='/y'>two</a></p><a href='/x'>three</a></div>"
    val fids = HtmlFunctions.findNodes(html, "p", null).map(_.node_id)
    val pids = HtmlFunctions.parseNodes(html).filter(r => r.tagname == "p" && r.kind == 2).map(_.node_id)
    assert(fids == pids)
  }

  test("to_html_fixed merges comment-split tags; default surface reproduces the no-op (Q16)") {
    HtmlFunctions.register(spark)
    Seq(("c1", 0, "<HT<!-- c -->ML>payload</HTML>"))
      .toDF("conv_id", "turn_idx", "text").createOrReplaceTempView("turns3")
    val row = spark.sql(
      "SELECT to_html(text) AS faithful, to_html_fixed(text) AS fixed FROM turns3").head
    // faithful (Q16 no-op): "<HT" and "ML>" stay TEXT siblings around the
    // comment, and the stray </HTML> is dropped by parseDOM (Q18)
    assert(row.getAs[String]("faithful") == "<HT<!-- c -->ML>payload")
    // fixed: the split tag is merged into <HTML>, which pairs with </HTML>
    assert(row.getAs[String]("fixed") == "<HTML><!-- c -->payload</HTML>")
  }
}
