package graft.tools

import graft.SparkEntry
import org.apache.spark.sql.SparkSession

/** Prints `explain("formatted")` for the queries whose physical shape is
  * load-bearing at scale — the audit trail for exchange counts, pushed
  * filters/ReadSchema, and WholeStageCodegen spans.
  * Run: sbt "runMain graft.tools.PlanDump [query ...]"
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val sf = "/root/testdata/sf0.001"
    val names =
      if (args.nonEmpty) args.toSeq
      else Seq("q_pipeline_extract", "q_embed_topk", "q_embed_ann",
        "q_neardup_pairs", "q_sessionize", "q_dom_nodes", "q_find_nodes",
        "q_conversations")
    names.foreach { n =>
      SparkEntry.queries.get(n).foreach { fn =>
        println(s"\n########## $n ##########")
        fn(spark, sf).explain("formatted")
      }
    }
    spark.stop()
  }
}
