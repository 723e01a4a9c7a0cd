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
    Dedup.writeFingerprintIndex(corpus, "contam_idx_tool", nBuckets = 8)
    val out = Dedup.contaminationAgainstIndex(spark, "contam_idx_tool", planted)
    out.collect()
    val p = out.queryExecution.executedPlan.toString
    val fin = p.substring(0, math.max(p.indexOf("== Initial Plan =="), 1).max(1) match { case 1 => p.length; case i => i })
    println("FINAL-ONLY section chars=" + fin.length)
    println("generates=" + fin.linesIterator.count(_.contains("winnow_fingerprints")))
    println("bucketedScans=" + fin.linesIterator.count(_.contains("Bucketed: true")))
    println("exchanges=" + fin.linesIterator.count(l => l.contains("Exchange hash") && !l.contains("Reused")))
    println(fin.linesIterator.filter(l => l.contains("Exchange") || l.contains("Generate") || l.contains("FileScan") || l.contains("Bucketed")).mkString("\n").take(4000))
  }
}
