package graft.spark.catalyst

import org.apache.spark.sql.{Column, SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** SparkSessionExtensions entry point for the engine's native Catalyst
  * expressions. Enable on a fresh session with either
  *
  *   SparkSession.builder().withExtensions(new GraftSparkExtensions) ...
  *   // or, config-only (spark-submit):
  *   .config("spark.sql.extensions", "graft.spark.catalyst.GraftSparkExtensions")
  *
  * For a session that already exists (e.g. one handed to us by a driver),
  * [[GraftSparkExtensions.register]] installs the same builders into the
  * session's FunctionRegistry directly.
  */
class GraftSparkExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction(GraftSparkExtensions.parseNodesDescriptor)
    ext.injectFunction(GraftSparkExtensions.wsTokenCountDescriptor)
    ext.injectFunction(GraftSparkExtensions.bpeishTokenCountDescriptor)
    ext.injectFunction(GraftSparkExtensions.simHash64Descriptor)
    ext.injectFunction(GraftSparkExtensions.winnowFingerprintsDescriptor)
  }
}

object GraftSparkExtensions {

  private def parseNodesBuilder(args: Seq[Expression]): Expression = {
    require(args.length == 1, s"parse_nodes takes 1 argument, got ${args.length}")
    ParseHtmlNodes(args.head)
  }

  private[catalyst] val parseNodesDescriptor
      : (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) =
    (FunctionIdentifier("parse_nodes"),
      new ExpressionInfo(classOf[ParseHtmlNodes].getName, "parse_nodes"),
      parseNodesBuilder)

  private def wsTokenCountBuilder(args: Seq[Expression]): Expression = {
    require(args.length == 1, s"ws_token_count takes 1 argument, got ${args.length}")
    WsTokenCount(args.head)
  }

  private[catalyst] val wsTokenCountDescriptor
      : (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) =
    (FunctionIdentifier("ws_token_count"),
      new ExpressionInfo(classOf[WsTokenCount].getName, "ws_token_count"),
      wsTokenCountBuilder)

  private def bpeishTokenCountBuilder(args: Seq[Expression]): Expression = {
    require(args.length == 1, s"bpeish_token_count takes 1 argument, got ${args.length}")
    BpeishTokenCount(args.head)
  }

  private[catalyst] val bpeishTokenCountDescriptor
      : (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) =
    (FunctionIdentifier("bpeish_token_count"),
      new ExpressionInfo(classOf[BpeishTokenCount].getName, "bpeish_token_count"),
      bpeishTokenCountBuilder)

  private def simHash64Builder(args: Seq[Expression]): Expression = {
    require(args.length == 1, s"simhash64 takes 1 argument, got ${args.length}")
    SimHash64(args.head)
  }

  private[catalyst] val simHash64Descriptor
      : (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) =
    (FunctionIdentifier("simhash64"),
      new ExpressionInfo(classOf[SimHash64].getName, "simhash64"),
      simHash64Builder)

  private def winnowFingerprintsBuilder(args: Seq[Expression]): Expression = {
    require(args.length == 1, s"winnow_fingerprints takes 1 argument, got ${args.length}")
    WinnowFingerprints(args.head)
  }

  private[catalyst] val winnowFingerprintsDescriptor
      : (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) =
    (FunctionIdentifier("winnow_fingerprints"),
      new ExpressionInfo(classOf[WinnowFingerprints].getName, "winnow_fingerprints"),
      winnowFingerprintsBuilder)

  /** Install into an already-built session (driver-owned sessions). */
  def register(spark: SparkSession): Unit = {
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "parse_nodes", parseNodesBuilder, "scala_udf")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "ws_token_count", wsTokenCountBuilder, "scala_udf")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "bpeish_token_count", bpeishTokenCountBuilder, "scala_udf")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "simhash64", simHash64Builder, "scala_udf")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "winnow_fingerprints", winnowFingerprintsBuilder, "scala_udf")
  }

  /** DataFrame-side surface: `df.select(parse_nodes(col("text")))` plans a
    * Generate over the native expression (no UDF, no array encode).
    * Resolves through the session FunctionRegistry (the public
    * Column-from-Expression path is sql-private in Spark 4), so call
    * [[register]] — or build the session with [[GraftSparkExtensions]] —
    * first.
    */
  def parse_nodes(c: Column): Column =
    org.apache.spark.sql.functions.call_function("parse_nodes", c)

  /** Codegen'd whitespace token count (see [[WsTokenCount]]). */
  def ws_token_count(c: Column): Column =
    org.apache.spark.sql.functions.call_function("ws_token_count", c)

  /** Codegen'd BPE-ish subword token count (see [[BpeishTokenCount]]). */
  def bpeish_token_count(c: Column): Column =
    org.apache.spark.sql.functions.call_function("bpeish_token_count", c)

  /** Codegen'd 64-bit SimHash (see [[SimHash64]]). */
  def simhash64(c: Column): Column =
    org.apache.spark.sql.functions.call_function("simhash64", c)

  /** Winnowing-fingerprint Generator (see [[WinnowFingerprints]]). */
  def winnow_fingerprints(c: Column): Column =
    org.apache.spark.sql.functions.call_function("winnow_fingerprints", c)
}
