package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.spark.Dedup

/** Stage attribution for the partial-inclusion contamination check —
  * which subtree owns the wall-clock at sf0.1 (winnow scans, df join,
  * prefix-filter window, candidate join, verification join).
  */
object PartialProfile {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.local.dir", sys.env.getOrElse("SPARK_LOCAL_DIRS", "/dev/shm/graft-spark"))
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def time[T](tag: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"$tag: ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    val corpus = spark.read.parquet(s"$sfDir/documents.parquet")
      .select(col("doc_id"), col("text"))
    val w = split(col("text"), " ")
    val prefixWords = floor(size(w) * lit(3) / lit(5)).cast("int")
    val planted = corpus.filter(col("doc_id") % 10 === 0)
      .select((col("doc_id") + lit(7000000L)).as("doc_id"),
        concat_ws(" ", array_join(slice(w, lit(1), prefixWords), " "),
          md5(col("text"))).as("text"))
    val clean = corpus.filter(col("doc_id") % 10 === 5)
      .select((col("doc_id") + lit(8000000L)).as("doc_id"),
        concat_ws(" ", md5(col("text")),
          md5(concat(col("text"), lit("x")))).as("text"))
    val testSet = planted.unionByName(clean)
    for (rep <- 1 to 2) {
      println(s"--- rep $rep")
      val cfp = Dedup.fingerprintTable(corpus).distinct()
      val tfp = Dedup.fingerprintTable(testSet).distinct()
        .withColumnRenamed("doc_id", "test_id")
      time("corpus winnow+distinct")(println("  cfp=" + cfp.count()))
      time("test winnow+distinct")(println("  tfp=" + tfp.count()))
      val dfreq = cfp.groupBy(col("fingerprint")).agg(count(lit(1)).as("doc_freq"))
      time("dfreq")(println("  df=" + dfreq.count()))
      val withDf = tfp.join(dfreq, Seq("fingerprint"), "left")
        .select(col("test_id"), col("fingerprint"),
          coalesce(col("doc_freq"), lit(0L)).as("df"))
      time("test-df join")(println("  wdf=" + withDf.count()))
      // replicate the prefix-filter internals to size each stage
      import org.apache.spark.sql.expressions.Window
      val tTotals = tfp.groupBy(col("test_id")).agg(count(lit(1)).as("n_fp_total"))
      val needed = ceil(col("n_fp_total") * lit(0.3)).cast("long")
      val wnd = Window.partitionBy(col("test_id")).orderBy(col("df"), col("fingerprint"))
      val probes = withDf.withColumn("rk", row_number().over(wnd))
        .join(tTotals, "test_id")
        .filter(col("rk") <= col("n_fp_total") - needed + lit(1L))
        .select(col("test_id"), col("fingerprint"))
      time("probes")(println("  probes=" + probes.count()))
      val postings = time("probe postings")(
        probes.join(cfp, "fingerprint").count())
      println("  postings=" + postings)
      val cand = probes.join(cfp, "fingerprint")
        .select(col("test_id"), col("doc_id")).distinct()
      time("cand distinct")(println("  cand=" + cand.count()))
      val verifyRows = time("verify join volume")(
        cand.join(tfp, "test_id").join(cfp, Seq("doc_id", "fingerprint")).count())
      println("  verifyRows=" + verifyRows)
      time("full partial")(println("  out=" +
        Dedup.contaminationPartial(corpus, testSet, minRatio = 0.3).count()))
    }
    spark.stop()
  }
}
