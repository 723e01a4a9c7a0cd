package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.spark.{Filtering, LmScore, SubstringDedup}

/** Stage attribution for the q_curation_pipeline_v2 composition (round
  * 6): which of the eight stages owns the wall-clock at a given SF —
  * the two eager pins (gopher survivors, exact-dedup survivors), the LM
  * train/score pass, the substring-dedup cut, the /tmp stage
  * checkpoint, and the budget-selection tail.
  * Run: sbt "runMain graft.tools.CurationV2Profile [sfDir]"
  */
object CurationV2Profile {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
      .config("spark.local.dir", sys.env.getOrElse("SPARK_LOCAL_DIRS", "/dev/shm/graft-spark"))
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def time[T](tag: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"$tag%-28s ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    for (rep <- 1 to 2) {
      println(s"--- rep $rep")
      val planted = spark.read.parquet(s"$sfDir/documents.parquet")
        .select(col("doc_id"), col("lang"),
          when(col("doc_id") % 7 === 0,
            concat(col("text"), lit(" shared boiler plate sentence appended to exercise span level dedup")))
            .otherwise(col("text")).as("text"))
      val red = Filtering.redactPii(planted)
        .select(col("doc_id"), col("lang"), col("text"))
      val gkept = time("redact+gopher+pin") {
        Filtering.gopherRepetitionFilter(
            red.filter(expr("length(text) - length(translate(text, ' ', '')) + 1 <= 110")))
          .filter(col("keep")).select(col("doc_id"), col("lang"), col("text"))
          .localCheckpoint(true)
      }
      val model = LmScore.trainBigramModel(
        gkept.filter(col("lang") === "en"), minCount = 2)
      val lmkept = LmScore.scoreAgainstModel(gkept, model)
        .filter(col("keep")).select(col("doc_id"))
        .join(gkept.select(col("doc_id"), col("text")), Seq("doc_id"))
      val deduped = time("lm train+score+dedup+pin") {
        lmkept.groupBy(md5(col("text")).as("h"))
          .agg(min_by(struct(col("doc_id"), col("text")), col("doc_id")).as("w"))
          .select(col("w.doc_id").as("doc_id"), col("w.text").as("text"))
          .localCheckpoint(true)
      }
      val cut = SubstringDedup.exactSubstringDedup(deduped, n = 8)
        .select(col("doc_id"), col("text"), col("n_spans"))
      val work = java.nio.file.Files.createTempDirectory(
        java.nio.file.Paths.get("/tmp"), "graft-curation2p").toString
      time("substr-dedup+parquet write") {
        cut.write.mode("overwrite").parquet(s"$work/cut")
      }
      val cutM = spark.read.parquet(s"$work/cut")
      val sampled = Filtering.hashSample(cutM, col("doc_id"), 45875, salt = "graft")
      val scored = sampled.select(col("doc_id"), col("n_spans"),
        (octet_length(col("text")) % 997).cast("int").as("score"),
        (lit(1) + octet_length(col("text"))
          - octet_length(translate(col("text"), " ", ""))).cast("int").as("tok"))
      val selected = time("selectToBudget hist")(
        Filtering.selectToBudget(scored, col("score"), col("tok"), col("doc_id"), 6000L))
      time("tail action") {
        Filtering.assignSplit(selected, col("doc_id"),
            Seq("train" -> 58982, "val" -> 3277, "test" -> 3277), salt = "split")
          .select(col("doc_id"), col("score"), col("tok"), col("n_spans"), col("split"))
          .write.format("noop").mode("overwrite").save()
      }
    }
    spark.stop()
  }
}
