package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.spark.{Chunking, Packing, Pipeline, Transcripts}
object PipeProfile {
  def main(args: Array[String]): Unit = {
    val sfDir = "/root/testdata/sf0.1"
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.local.dir", sys.env.getOrElse("SPARK_LOCAL_DIRS", "/dev/shm/graft-spark"))
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    def time(tag: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime(); f
      println(f"$tag: ${(System.nanoTime()-t0)/1e9}%.2f s")
    }
    def convs = Pipeline.conversations(
        Pipeline.extractOnScanPartitions(Transcripts.derive(spark, sfDir)))
      .filter(size(split(col("conv_text"), " ")) >= 100)
      .select(col("conv_id"), col("conv_text"))
    def chunks = Chunking.chunk(convs, 16, 4, textCol = "conv_text", idCol = "conv_id")
      .withColumn("conv_key", expr("CAST(substring(conv_id, 6) AS BIGINT)"))
    for (rep <- 1 to 2) {
      time("convs only")(noop(convs))
      time("chunks only")(noop(chunks.select(col("conv_key"), col("chunk_idx"), col("n_tokens"))))
      time("chunks with text")(noop(chunks))
      time("full with packing")(noop(
        Packing.packNextFit(chunks, 24, shard = col("conv_key"), idCol = "conv_key")))
    }
    spark.stop()
  }
}
