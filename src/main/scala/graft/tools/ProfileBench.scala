package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.spark.{HtmlFunctions => H, Pipeline, Transcripts}

/** Scratch profiler: time individual stages in isolation with GC stats. */
object ProfileBench {
  def main(args: Array[String]): Unit = {
    val which = if (args.nonEmpty) args(0) else "all"
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def gcMs: Long = {
      import scala.jdk.CollectionConverters._
      java.lang.management.ManagementFactory.getGarbageCollectorMXBeans.asScala
        .map(_.getCollectionTime).sum
    }
    def timed(tag: String)(f: => Unit): Unit = {
      val g0 = gcMs; val t0 = System.nanoTime()
      f
      println(f"[$tag] ${(System.nanoTime() - t0) / 1e9}%.2f s, gc=${gcMs - g0} ms")
    }
    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()

    // materialize transcripts once so derive cost is excluded
    val tPath = "/tmp/graft-prof-transcripts"
    if (!new java.io.File(tPath).exists) {
      Transcripts.derive(spark, sfDir).write.mode("overwrite").parquet(tPath)
    }
    val t = spark.read.parquet(tPath).select("conv_id", "turn_idx", "text")

    timed("warmup-20k-to_html") { noop(t.limit(20000).select(H.to_html(col("text")))) }

    if (which == "all" || which == "derive") timed("derive-only") {
      noop(Transcripts.derive(spark, sfDir))
    }
    if (which == "all" || which == "parse") timed("node_count(parse only)") {
      noop(t.select(H.node_count(col("text"))))
    }
    if (which == "all" || which == "roundtrip") timed("to_html") {
      noop(t.select(H.to_html(col("text"))))
    }
    if (which == "all" || which == "extract") timed("extract_main") {
      noop(t.select(H.extractMainText(col("text"))))
    }
    if (which == "all" || which == "getcontent") timed("get_content") {
      noop(t.select(H.get_content(col("text"), lit("p"))))
    }
    if (which == "all" || which == "pipeline") timed("pipeline(extract+reassemble)") {
      noop(Pipeline.reassembled(Pipeline.extractTurns(t)).toDF())
    }
    if (which == "all" || which == "pipeline2") timed("pipeline extract only") {
      noop(Pipeline.extractTurns(t).toDF())
    }
    spark.stop()
  }
}
