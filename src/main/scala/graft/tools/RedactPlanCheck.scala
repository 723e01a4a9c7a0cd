package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.spark.Filtering

/** One-question plan probe: when redactPii's count columns are projected
  * away, do the three regexp_extract_all passes get pruned from the
  * physical plan? (They are per-row regex scans — if they survive, the
  * curation pipelines pay for counters nobody reads.)
  */
object RedactPlanCheck {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[2]")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select(col("doc_id"), col("text"))
    val plan = Filtering.redactPii(docs).select(col("doc_id"), col("text"))
      .queryExecution.executedPlan.toString
    println("extract_all occurrences: " +
      "regexp_extract_all".r.findAllIn(plan).length)
    println("regexp_replace occurrences: " +
      "regexp_replace".r.findAllIn(plan).length)
    spark.stop()
  }
}
