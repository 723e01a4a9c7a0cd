package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.spark.Filtering

/** Stage attribution for the q_curation_pipeline composition — which
  * subtree owns the wall-clock at a given SF (PII redaction, Gopher
  * filter, exact dedup, hash sample, budget selection's three upstream
  * traversals, split assignment).
  */
object CurationProfile {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.local.dir", sys.env.getOrElse("SPARK_LOCAL_DIRS", "/dev/shm/graft-spark"))
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def time[T](tag: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"$tag: ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .select(col("doc_id"), col("text"))
    for (rep <- 1 to 2) {
      println(s"--- rep $rep")
      val red = Filtering.redactPii(docs).select(col("doc_id"), col("text"))
      time("redact")(red.count())
      // A/B: same gopher filter over a materialization barrier — if this
      // is fast, the composed plan re-evaluates the regex chain inside
      // the per-gram lambdas
      val redM = red.localCheckpoint()
      time("gopher over BARRIER")(Filtering.gopherRepetitionFilter(redM)
        .filter(col("keep")).count())
      val kept = Filtering.gopherRepetitionFilter(red)
        .filter(col("keep")).select(col("doc_id"), col("text"))
      time("redact+gopher")(kept.count())
      val deduped = kept.groupBy(md5(col("text")).as("h"))
        .agg(min_by(struct(col("doc_id"), col("text")), col("doc_id")).as("w"))
        .select(col("w.doc_id").as("doc_id"), col("w.text").as("text"))
      val sampled = Filtering.hashSample(deduped, col("doc_id"), 45875, salt = "graft")
      time("redact+gopher+dedup+sample")(sampled.count())
      val scored = sampled.select(col("doc_id"),
        (octet_length(col("text")) % 997).cast("int").as("score"),
        (lit(1) + octet_length(col("text"))
          - octet_length(translate(col("text"), " ", ""))).cast("int").as("tok"))
      val selected = time("selectToBudget (hist collect + plan)")(
        Filtering.selectToBudget(scored, col("score"), col("tok"), col("doc_id"), 6000L))
      time("selected action")(selected.count())
      val split = Filtering.assignSplit(selected, col("doc_id"),
        Seq("train" -> 58982, "val" -> 3277, "test" -> 3277), salt = "split")
      time("full composition action")(split.count())
    }
    spark.stop()
  }
}
