package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.spark.{Pipeline, Transcripts}

/** A/B probe: Pipeline.conversationTextsWithLossSpans (HashAggregate
  * collect_list -> array_sort -> array_join + interpreted in-row span
  * walk) vs a compiled repartition+sort+mapPartitions group walk, over
  * the exact q_masked_pipeline extraction input at sf0.1.
  * Run: sbt "runMain graft.tools.ConvAggProbe [sfDir]"
  */
object ConvAggProbe {
  final case class SpanLS(span_start: Long, span_end: Long)
  final case class ConvSpans(conv_id: String, conv_text: String,
                             loss_spans: Seq[SpanLS])

  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    val sf = args.headOption.getOrElse("/root/testdata/sf0.1")

    def t[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"$name%-26s ${(System.nanoTime() - t0) / 1e9}%.3f s")
      r
    }

    def ex = Pipeline.extractOnScanPartitions(Transcripts.derive(spark, sf))
      .select(col("conv_id"), col("turn_idx"),
        expr("CASE turn_idx % 3 WHEN 0 THEN 'user' WHEN 1 THEN 'assistant' ELSE 'tool' END")
          .as("role"),
        col("extracted_text"))

    def decl = Pipeline.conversationTextsWithLossSpans(ex.toDF())

    def compiled = {
      val parts = spark.conf.get("spark.sql.shuffle.partitions").toInt
      ex.toDF()
        .select(col("conv_id"), col("turn_idx"), col("role") === "assistant",
          col("extracted_text"))
        .as[(String, Int, Boolean, String)]
        .repartition(parts, col("conv_id"))
        .sortWithinPartitions(col("conv_id"), col("turn_idx"))
        .mapPartitions { it =>
          val in = it.buffered
          new Iterator[ConvSpans] {
            def hasNext: Boolean = in.hasNext
            def next(): ConvSpans = {
              val (cid, _, loss0, text0) = in.next()
              val sb = new java.lang.StringBuilder(text0)
              var pos = 0L
              var cpLen = cp(text0)
              val spans = Seq.newBuilder[SpanLS]
              if (loss0) spans += SpanLS(0L, cpLen)
              pos = cpLen + 1L
              while (in.hasNext && in.head._1 == cid) {
                val (_, _, loss, text) = in.next()
                sb.append('\n').append(text)
                val l = cp(text)
                if (loss) spans += SpanLS(pos, pos + l)
                pos += l + 1L
              }
              ConvSpans(cid, sb.toString, spans.result())
            }
          }
        }
        .toDF("conv_id", "conv_text", "loss_spans")
    }

    for (rep <- 1 to 3) {
      println(s"--- rep $rep ---")
      t("decl-noop") { decl.write.format("noop").mode("overwrite").save() }
      t("compiled-noop") { compiled.write.format("noop").mode("overwrite").save() }
    }
    // equivalence: order-insensitive full-row comparison
    val a = decl.select(col("conv_id"), col("conv_text"),
      to_json(col("loss_spans")).as("sp"))
    val b = compiled.select(col("conv_id"), col("conv_text"),
      to_json(col("loss_spans")).as("sp"))
    println(s"only_decl=${a.exceptAll(b).count()} only_comp=${b.exceptAll(a).count()}")
    spark.stop()
  }

  private def cp(s: String): Long = {
    var i = 0; var n = 0L
    while (i < s.length) {
      if (!Character.isLowSurrogate(s.charAt(i))) n += 1
      i += 1
    }
    n
  }
}
