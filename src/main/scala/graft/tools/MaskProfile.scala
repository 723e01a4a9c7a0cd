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
      val ex = t("extract+checkpoint") {
        Pipeline.extractOnScanPartitions(Transcripts.derive(spark, sf))
          .select(col("conv_id"), col("turn_idx"), col("extracted_text"))
          .localCheckpoint()
      }
      val convs = Pipeline.conversationTexts(ex)
        .filter(Chunking.wordCount(col("conv_text")) >= 100)
        .select(col("conv_id"), col("conv_text"))
      val chunks = t("chunks+checkpoint") {
        Chunking.chunkOffsetsOnly(convs, maxTokens = 16, overlap = 4,
            textCol = "conv_text", idCol = "conv_id")
          .select(expr("CAST(substring(conv_id, 6) AS BIGINT)").as("conv_key"),
            col("chunk_idx"), col("n_tokens"), col("chunk_len"),
            col("char_start"))
          .localCheckpoint()
      }
      val asg = Packing.packNextFit(chunks, capacity = 24,
        shard = col("conv_key"), idCol = "conv_key")
      val masks = Pipeline.lossMaskSpans(ex.withColumn("role",
          expr("CASE turn_idx % 3 WHEN 0 THEN 'user' WHEN 1 THEN 'assistant' ELSE 'tool' END")))
        .filter(col("in_loss"))
        .select(expr("CAST(substring(conv_id, 6) AS BIGINT)").as("conv_key"),
          col("span_start"), col("span_end"))
      val n = t("remap+count") {
        Packing.remapSpansToSequences(chunks, asg, masks, idCol = "conv_key").count()
      }
      println(s"rows=$n")
      // contrast: chunk generator without the offset prefix scan
      t("plain-chunk-count") {
        Chunking.chunk(convs, maxTokens = 16, overlap = 4,
          textCol = "conv_text", idCol = "conv_id").count()
      }
      t("offset-chunk-count") {
        Chunking.chunkWithOffsets(convs, maxTokens = 16, overlap = 4,
          textCol = "conv_text", idCol = "conv_id").count()
      }
    }
    spark.stop()
  }
}
