package graft.spark.catalyst

import graft.parser.{HtmlNode, HtmlParser}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, Generator, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.ArrayBasedMapData
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst Generator: parse an HTML string and emit one output row
  * per DOM node, pre-order (the NodeRow arena of Schemas.scala), with NO
  * intermediate array materialization.
  *
  * Why a Generator and not `explode(udf(...))` (SURVEY.md §4.3 tiering,
  * ROADMAP item 5): the UDF path builds a Seq[NodeRow], encodes it into a
  * Catalyst ArrayData (one copy of every string/map), and then Generate
  * iterates that array. This expression walks the freshly parsed tree and
  * writes each node STRAIGHT into an InternalRow — per 10^12-turn corpora
  * that is one fewer materialization of the entire node arena per turn.
  * The parse itself dominates, so CodegenFallback (virtual eval call) is
  * the right tier; GenerateExec handles non-codegen generators.
  *
  * Output schema / semantics match HtmlFunctions.parseNodes exactly
  * (kept interchangeable; equivalence is pinned by GeneratorSpec):
  * node ids are pre-order positions, kind 0=text 1=comment 2=tag 3=endtag
  * (reference classifier semantics, dhtmlparser.d:287-351).
  */
case class ParseHtmlNodes(child: Expression)
    extends UnaryExpression with Generator with CodegenFallback {

  override def elementSchema: StructType = ParseHtmlNodes.Schema

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"parse_nodes requires a string column, got ${child.dataType.catalogString}")

  override def eval(input: InternalRow): IterableOnce[InternalRow] = {
    val v = child.eval(input)
    if (v == null) return Nil
    val html = v.asInstanceOf[UTF8String].toString
    val root = HtmlParser.parseString(html)

    // pre-order ids first (endtag/openertag links can point forward)
    val ids = new java.util.IdentityHashMap[HtmlNode, Integer]()
    var next = 0
    def number(n: HtmlNode): Unit = {
      ids.put(n, next); next += 1
      n.foreachChild(number)
    }
    number(root)

    val out = new scala.collection.mutable.ArrayBuffer[InternalRow](next)
    def emit(n: HtmlNode, parent: Int, pos: Int, depth: Int): Unit = {
      val id = ids.get(n).intValue
      val kind: Byte =
        if (!n.isTag) 0
        else if (n.isComment) 1
        else if (n.isEndTag) 3
        else 2
      val endId =
        if (n.endtag != null && ids.containsKey(n.endtag)) ids.get(n.endtag).intValue else -1
      val opId =
        if (n.openertag != null && ids.containsKey(n.openertag)) ids.get(n.openertag).intValue
        else -1
      val params =
        if (n.hasParams)
          ArrayBasedMapData(n.params,
            (k: Any) => UTF8String.fromString(k.asInstanceOf[String]),
            (x: Any) => UTF8String.fromString(x.asInstanceOf[String]))
        else ParseHtmlNodes.EmptyMap
      val row = new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(12)
      row.update(0, id)
      row.update(1, parent)
      row.update(2, pos)
      row.update(3, depth)
      row.update(4, kind)
      row.update(5, UTF8String.fromString(n.getTagName))
      row.update(6, UTF8String.fromString(n.rawElement))
      row.update(7, params)
      row.update(8, n.isNonPairTag)
      row.update(9, endId)
      row.update(10, opId)
      row.update(11, n.srcOffset)
      out += row
      var i = 0
      n.foreachChild { c => emit(c, id, i, depth + 1); i += 1 }
    }
    emit(root, -1, 0, 0)
    out
  }

  override def prettyName: String = "parse_nodes"
  override protected def withNewChildInternal(newChild: Expression): ParseHtmlNodes =
    copy(child = newChild)
}

object ParseHtmlNodes {
  /** Same field set as [[graft.spark.NodeRow]] (kept interchangeable). */
  val Schema: StructType = StructType(Seq(
    StructField("node_id", IntegerType, nullable = false),
    StructField("parent_id", IntegerType, nullable = false),
    StructField("pos", IntegerType, nullable = false),
    StructField("depth", IntegerType, nullable = false),
    StructField("kind", ByteType, nullable = false),
    StructField("tagname", StringType, nullable = false),
    StructField("raw", StringType, nullable = false),
    StructField("params", MapType(StringType, StringType, valueContainsNull = false),
      nullable = false),
    StructField("nonpair", BooleanType, nullable = false),
    StructField("endtag_id", IntegerType, nullable = false),
    StructField("opener_id", IntegerType, nullable = false),
    StructField("src_offset", IntegerType, nullable = false)))

  private val EmptyMap =
    ArrayBasedMapData(Array.empty[Any], Array.empty[Any])
}
