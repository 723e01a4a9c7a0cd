package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.spark.Dedup
object ContamPlan {
  def main(args: Array[String]): Unit = {
    val sfDir = "/root/testdata/sf0.01"
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val corpus = spark.read.parquet(s"$sfDir/documents.parquet").select(col("doc_id"), col("text"))
    val planted = corpus.filter(col("doc_id") % 10 === 0)
      .select((col("doc_id") + lit(5000000L)).as("doc_id"), col("text"))
    val out = Dedup.contamination(corpus, planted)
    out.collect()
    val p = out.queryExecution.executedPlan.toString
    println("generates=" + p.linesIterator.count(_.contains("winnow_fingerprints")))
    println("reused=" + p.linesIterator.count(_.contains("ReusedExchange")))
    println("exchanges=" + p.linesIterator.count(l => l.contains("Exchange hash") && !l.contains("Reused")))
    println("aqeShuffleReads=" + p.linesIterator.count(_.contains("AQEShuffleRead")))
    println(p.linesIterator.filter(l => l.contains("Exchange") || l.contains("Generate") || l.contains("HashAggregate(keys=[fingerprint")).take(40).mkString("\n"))
  }
}
