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
}
