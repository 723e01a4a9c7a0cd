package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.spark.{Chunking, Packing, Pipeline, Transcripts}

/** Phase attribution for the q_masked_pipeline composition: times each
  * materialization boundary separately so a slow run points at a stage,
  * not a guess. Run: sbt "runMain graft.tools.MaskProfile [sfDir]"
  */
object MaskProfile {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val sf = args.headOption.getOrElse("/root/testdata/sf0.1")

    def t[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"$name%-22s ${(System.nanoTime() - t0) / 1e9}%.3f s")
      r
    }

    for (rep <- 1 to 2) {
      println(s"--- rep $rep ---")
      val ex = Pipeline.extractOnScanPartitions(Transcripts.derive(spark, sf))
        .select(col("conv_id"), col("turn_idx"),
          expr("CASE turn_idx % 3 WHEN 0 THEN 'user' WHEN 1 THEN 'assistant' ELSE 'tool' END")
            .as("role"),
          col("extracted_text"))
      val convsP = t("extract+convagg+checkpoint") {
        Pipeline.conversationTextsWithLossSpans(ex.toDF())
          .filter(Chunking.wordCount(col("conv_text")) >= 100)
          .select(expr("CAST(substring(conv_id, 6) AS BIGINT)").as("conv_key"),
            col("conv_text"), col("loss_spans"))
          .localCheckpoint()
      }
      val chunks = t("chunks+checkpoint") {
        Chunking.chunkOffsetsMapped(convsP, maxTokens = 16, overlap = 4,
            textCol = "conv_text", idCol = "conv_key")
          .localCheckpoint()
      }
      val asg = Packing.packNextFitWithOffsets(chunks, capacity = 24,
        shard = col("conv_key"), idCol = "conv_key")
      val masks = convsP
        .select(col("conv_key"), explode(col("loss_spans")).as("sp"))
        .select(col("conv_key"), col("sp.span_start").as("span_start"),
          col("sp.span_end").as("span_end"))
      val n = t("remap+count") {
        Packing.remapSpansToSequences(chunks, asg, masks, idCol = "conv_key").count()
      }
      println(s"rows=$n")
      // contrast: compiled vs declarative chunkers over the same pinned convs
      t("chunkOffsetsMapped-count") {
        Chunking.chunkOffsetsMapped(convsP, maxTokens = 16, overlap = 4,
          textCol = "conv_text", idCol = "conv_key").count()
      }
      t("chunkOffsetsOnly-count") {
        Chunking.chunkOffsetsOnly(convsP, maxTokens = 16, overlap = 4,
          textCol = "conv_text", idCol = "conv_key").count()
      }
      t("chunkWithOffsets-count") {
        Chunking.chunkWithOffsets(convsP, maxTokens = 16, overlap = 4,
          textCol = "conv_text", idCol = "conv_key").count()
      }
    }
    spark.stop()
  }
}
