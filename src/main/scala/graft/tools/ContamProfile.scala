package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.spark.Dedup
object ContamProfile {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.local.dir", sys.env.getOrElse("SPARK_LOCAL_DIRS", "/dev/shm/graft-spark"))
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def time[T](tag: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"$tag: ${(System.nanoTime()-t0)/1e9}%.2f s"); r
    }
    val corpus = spark.read.parquet(s"$sfDir/documents.parquet").select(col("doc_id"), col("text"))
    val planted = corpus.filter(col("doc_id") % 10 === 0)
      .select((col("doc_id") + lit(5000000L)).as("doc_id"), col("text"))
    val clean = corpus.filter(col("doc_id") % 10 === 5)
      .select((col("doc_id") + lit(6000000L)).as("doc_id"),
        concat_ws(" ", md5(col("text")), md5(concat(col("text"), lit("x")))).as("text"))
    val testSet = planted.unionByName(clean)
    for (_ <- 1 to 2) {
      val cfp = Dedup.fingerprintTable(corpus).distinct()
      val tfp = Dedup.fingerprintTable(testSet).distinct().withColumnRenamed("doc_id","test_id")
      val matched = tfp.join(cfp, "fingerprint")
        .groupBy(col("test_id"), col("doc_id")).agg(count(lit(1)).as("n_fp"))
      time("join+groupBy")(println("  m=" + matched.count()))
      val totals = tfp.groupBy(col("test_id")).agg(count(lit(1)).as("t"))
      time("matched+totals+filter")(println("  o=" + matched.join(totals, "test_id")
        .filter(col("n_fp") === col("t")).count()))
      time("hot subtree alone")(println("  hot=" + Dedup.contaminationHotFingerprints(corpus).count()))
      time("full contamination")(println("  out=" + Dedup.contamination(corpus, testSet).count()))
    }
    spark.stop()
  }
}
