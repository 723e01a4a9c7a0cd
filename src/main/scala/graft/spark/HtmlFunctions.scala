package graft.spark

import graft.extract.Extractor
import graft.parser.{HtmlNode, HtmlParser}
import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.functions.udf

/** The engine's scalar-function surface over HTML text columns.
  *
  * Design (SURVEY.md §4.3): the parser itself is a pure JVM function —
  * per-turn parse cost dominates, so a Scala UDF (codegen calls it with
  * UTF8String->String conversion only) is the right tier; no custom
  * Catalyst Expression needed in v1. Keep plans in the shape
  * `select(cols..., fn(col("text")))` so Catalyst column pruning still
  * reaches the parquet scan (never `Dataset.map` over whole rows).
  *
  * Every function here mirrors a reference operator (SURVEY.md §2.1):
  * parse_html (#1), find/findAll via node rows or find_links (#17-21),
  * get_content (#27), prettify (#28), to_html round-trip (#29),
  * tag_to_string (#25), plus extract_main (the north_rule extraction).
  */
object HtmlFunctions {

  /** Pre-order node numbering (the arena id assignment). */
  private def numberPreOrder(root: HtmlNode): java.util.IdentityHashMap[HtmlNode, Integer] = {
    val ids = new java.util.IdentityHashMap[HtmlNode, Integer]()
    var next = 0
    def number(n: HtmlNode): Unit = {
      ids.put(n, next); next += 1
      n.foreachChild(number) // lazy: never materializes a leaf's child buffer
    }
    number(root)
    ids
  }

  /** DOM -> flat pre-order arena of NodeRow (ids replace pointers). */
  def toRows(root: HtmlNode): Seq[NodeRow] =
    toRowsWithIds(root, numberPreOrder(root))

  private def toRowsWithIds(root: HtmlNode,
                            ids: java.util.IdentityHashMap[HtmlNode, Integer]): Seq[NodeRow] = {

    val out = Vector.newBuilder[NodeRow]
    def emit(n: HtmlNode, parent: Int, pos: Int, depth: Int): Unit = {
      val id = ids.get(n)
      val kind: Byte =
        if (!n.isTag) 0
        else if (n.isComment) 1
        else if (n.isEndTag) 3
        else 2
      val endId = if (n.endtag != null && ids.containsKey(n.endtag)) ids.get(n.endtag).intValue else -1
      val opId = if (n.openertag != null && ids.containsKey(n.openertag)) ids.get(n.openertag).intValue else -1
      val pm: Map[String, String] = if (n.hasParams) n.params.toMap else Map.empty
      out += NodeRow(id, parent, pos, depth, kind, n.getTagName, n.rawElement,
        pm, n.isNonPairTag, endId, opId, n.srcOffset)
      var i = 0
      n.foreachChild { c => emit(c, id, i, depth + 1); i += 1 }
    }
    emit(root, -1, 0, 0)
    out.result()
  }

  // ===== pure row-wise functions (also used by mapPartitions) =============

  def parseNodes(html: String): Seq[NodeRow] =
    if (html == null) Seq.empty else toRows(HtmlParser.parseString(html))

  /** The reference's generic `find(tag, params)` (dhtmlparser.d:150,
    * 623-647) as a SQL-facing function: DFS matches minus endtags, each
    * returned as its full arena NodeRow (node_id = pre-order position in
    * the parse arena, identical to parse_html's ids). A null/empty params
    * map means tag-name-only matching.
    */
  def findNodes(html: String, tag: String, params: Map[String, String]): Seq[NodeRow] = {
    if (html == null) return Seq.empty
    val dom = HtmlParser.parseString(html)
    val ids = numberPreOrder(dom)
    val rows = toRowsWithIds(dom, ids) // rows(i).node_id == i (pre-order)
    val pm = if (params == null || params.isEmpty) null else params
    dom.find(tag, pm).map(n => rows(ids.get(n).intValue)).toSeq
  }

  /** Constructor-built DOM (reference ctor surface, dhtmlparser.d:74-138
    * + closeElements 721-743, Q25): build `tag` with one param and one
    * text child, wrap in a container (which auto-closes the unclosed pair
    * tag and double-links the synthetic endtag), serialize with toHtml.
    */
  def buildTagHtml(tag: String, key: String, value: String, text: String): String = {
    if (tag == null) return null
    val el = HtmlNode.create(tag, Map(key -> value), Seq(HtmlNode.fromRaw(text)))
    HtmlNode.container(Seq(el)).toHtml
  }

  /** Round-trip with the repairTagsFixed stage enabled (the flagged
    * comment-split-tag merge the reference *documents* but never executes
    * — Q16; HtmlParser.repairTagsFixed). Diverges from the oracle by
    * design; exposed for pipeline users who want the documented intent.
    */
  def roundtripFixed(html: String): String =
    if (html == null) null
    else HtmlParser.parseWithStats(html, repairFixed = true)._1.toHtml

  def findLinks(html: String): Seq[String] =
    if (html == null) Seq.empty
    else HtmlParser.parseString(html).find("a").flatMap(_.params.get("href")).toSeq

  /** getContent of the first DFS match of `tag` (null if no match). */
  def getContentOf(html: String, tag: String): String = {
    if (html == null) return null
    val hits = HtmlParser.parseString(html).find(tag)
    if (hits.isEmpty) null else hits.head.getContent
  }

  /** getContent of every DFS match of `tag`, in document order. */
  def getContentsOf(html: String, tag: String): Seq[String] =
    if (html == null) Seq.empty
    else HtmlParser.parseString(html).find(tag).map(_.getContent).toSeq

  /** Normalized tagToString of the first match of tag[key=value]. */
  def firstTagString(html: String, tag: String, key: String, value: String): String = {
    if (html == null) return null
    val hits = HtmlParser.parseString(html).find(tag, Map(key -> value))
    if (hits.isEmpty) null else hits.head.tagToString
  }

  def roundtrip(html: String): String =
    if (html == null) null else HtmlParser.parseString(html).toHtml

  def prettifyHtml(html: String): String =
    if (html == null) null else HtmlParser.parseString(html).prettify()

  def nodeCount(html: String): Int =
    if (html == null) 0 else HtmlParser.parseWithStats(html)._2.nNodes

  /** Structural arena dump restricted to tag/comment/endtag nodes (text
    * omitted so the row set is input-independent for template oracles):
    * (node_id, parent_id, pos, depth, kind, tagname, nonpair).
    */
  def domTagNodes(html: String): Seq[(Int, Int, Int, Int, Int, String, Boolean)] =
    if (html == null) Seq.empty
    else parseNodes(html).filter(_.kind != 0).map(r =>
      (r.node_id, r.parent_id, r.pos, r.depth, r.kind.toInt, r.tagname, r.nonpair))

  /** BFS (findAllB with match-all fn) order of tag nodes:
    * (bfs_pos_among_tags, tagname, is_endtag).
    */
  def bfsTagOrder(html: String): Seq[(Int, String, Boolean)] =
    if (html == null) Seq.empty
    else HtmlParser.parseString(html)
      .findAllB(null, null, _ => true)
      .filter(_.isTag).zipWithIndex
      .map { case (n, i) => (i, n.getTagName, n.isEndTag) }.toSeq

  /** Remove every match of each tag name (removeChild incl. endtag),
    * then reconstruct (toHtml) — the remove_tag.d workflow as one op.
    */
  def removeTags(html: String, names: Seq[String]): String = {
    if (html == null) return null
    val dom = HtmlParser.parseString(html)
    names.foreach { n => dom.find(n).foreach(e => dom.removeChild(e)) }
    dom.toHtml
  }

  /** Q23 workflow: toggle isNonPairTag on every match of `tag` — setting
    * FALSE clears the node's endtag link and children (dhtmlparser.d:
    * 655-661), so on reconstruction the element renders as a bare opening
    * tag and its now-orphaned endtag sibling disappears (endtag nodes
    * serialize only through their opener's link).
    */
  def resetNonPair(html: String, tag: String): String = {
    if (html == null) return null
    val dom = HtmlParser.parseString(html)
    dom.find(tag).foreach { n => n.setNonPairTag(true); n.setNonPairTag(false) }
    dom.toHtml
  }

  /** Q24 workflow: replaceWith a constructor-built element on every match
    * of `tag` (dhtmlparser.d:668-681): the node takes the replacement's
    * normalized element string, (empty) children and null endtag, so the
    * old subtree and endtag vanish from the reconstruction.
    */
  def replaceTag(html: String, tag: String, newTag: String,
                 key: String, value: String): String = {
    if (html == null) return null
    val dom = HtmlParser.parseString(html)
    dom.find(tag).foreach(_.replaceWith(HtmlNode.create(newTag, Map(key -> value))))
    dom.toHtml
  }

  def extractTurn(conv: String, idx: Int, html: String): ExtractedTurn = {
    val r = Extractor.extract(if (html == null) "" else html)
    val (pos, kinds) = SpanCodec.pack(r.spans)
    ExtractedTurn(conv, idx, r.text, pos, kinds, r.nNodes, r.nErrors)
  }

  // ===== Column functions ==================================================

  val parse_html = udf(parseNodes _)
  val find_nodes = udf(findNodes _)
  val to_html_fixed = udf(roundtripFixed _)
  val build_tag = udf(buildTagHtml _)
  val dom_tag_nodes = udf(domTagNodes _)
  val bfs_tag_order = udf(bfsTagOrder _)
  val remove_tags = udf(removeTags _)
  val reset_nonpair = udf(resetNonPair _)
  val replace_tag = udf(replaceTag _)
  val find_links = udf(findLinks _)
  val get_content = udf(getContentOf _)
  val get_contents = udf(getContentsOf _)
  val first_tag_string = udf(firstTagString _)
  val to_html = udf(roundtrip _)
  val prettify_html = udf(prettifyHtml _)
  val node_count = udf(nodeCount _)
  val extract_main = udf((html: String) => {
    val r = Extractor.extract(if (html == null) "" else html)
    (r.text, r.spans.map(s => SpanRec(s.start, s.end, s.kind)), r.nNodes, r.nErrors)
  })

  /** Struct view over the packed span columns (SpanCodec wire format) —
    * for inspecting/oracle-checking pipeline output without re-parsing.
    */
  val spans_view = udf((pos: Array[Long], kinds: Array[Byte]) =>
    SpanCodec.unpack(pos, kinds))

  def extractMainText(c: Column): Column = extract_main(c).getField("_1")

  /** Register everything for spark.sql use. */
  def register(spark: SparkSession): Unit = {
    spark.udf.register("parse_html", parse_html)
    spark.udf.register("find_nodes", find_nodes)
    spark.udf.register("to_html_fixed", to_html_fixed)
    spark.udf.register("build_tag", build_tag)
    spark.udf.register("find_links", find_links)
    spark.udf.register("get_content", get_content)
    spark.udf.register("get_contents", get_contents)
    spark.udf.register("first_tag_string", first_tag_string)
    spark.udf.register("to_html", to_html)
    spark.udf.register("prettify_html", prettify_html)
    spark.udf.register("node_count", node_count)
    spark.udf.register("reset_nonpair", reset_nonpair)
    spark.udf.register("replace_tag", replace_tag)
    spark.udf.register("extract_main", extract_main)
    spark.udf.register("spans_view", spans_view)
  }
}
