package graft.spark.catalyst

import graft.text.{Fingerprints, TextAnalysis}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, IntegerType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** BPE-ish subword token count as a native codegen'd expression — the
  * same doGenCode tier as [[WsTokenCount]]: the generated code calls
  * [[TextAnalysis.bpeishTokenCountUtf8]] straight on the UTF8String (no
  * UTF-16 decode, no String allocation, stays inside whole-stage
  * codegen). Char-level equivalence with the String form is
  * property-tested in TextSpec.
  */
case class BpeishTokenCount(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"bpeish_token_count requires a string column, got ${child.dataType.catalogString}")
  override def dataType: DataType = IntegerType

  override protected def nullSafeEval(input: Any): Any =
    TextAnalysis.bpeishTokenCountUtf8(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.text.TextAnalysis.bpeishTokenCountUtf8($c)")

  override def prettyName: String = "bpeish_token_count"
  override protected def withNewChildInternal(newChild: Expression): BpeishTokenCount =
    copy(child = newChild)
}

/** 64-bit Charikar SimHash as a native codegen'd expression over the raw
  * UTF-8 bytes ([[Fingerprints.simHashUtf8]] — bit-identical to the
  * String form). The dedup tier computes one of these per document
  * corpus-wide, so keeping it inside whole-stage codegen (vs the UDF's
  * per-row UTF8String->String copy) removes the dominant allocation on
  * the simhash scan.
  */
case class SimHash64(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"simhash64 requires a string column, got ${child.dataType.catalogString}")
  override def dataType: DataType = LongType

  override protected def nullSafeEval(input: Any): Any =
    Fingerprints.simHashUtf8(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.text.Fingerprints.simHashUtf8($c)")

  override def prettyName: String = "simhash64"
  override protected def withNewChildInternal(newChild: Expression): SimHash64 =
    copy(child = newChild)
}
