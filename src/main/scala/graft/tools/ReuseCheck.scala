package graft.tools

import org.apache.spark.sql.SparkSession
import graft.spark.{Dedup, Embeddings}

/** A/B evidence tool for the ADVICE-r3 cache-hygiene change: times
  * nearDupPairs / cosineNearDupPairs (now cache-free), prints whether
  * the executed plan reuses the canonicalization exchange, and asserts
  * the block manager holds no cached RDDs after the actions.
  *
  * Usage: sbt "runMain graft.tools.ReuseCheck /root/testdata/sf0.01"
  */
object ReuseCheck {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def time[T](f: => T): (T, Double) = {
      val t0 = System.nanoTime(); val r = f; (r, (System.nanoTime() - t0) / 1e9)
    }

    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")

    for (rep <- 1 to 3) {
      val nd = Dedup.nearDupPairs(Dedup.withPerturbed(docs), simThreshold = 0.5)
      val (n1, s1) = time(nd.count())
      val plan1 = nd.queryExecution.executedPlan.toString
      val cd = Embeddings.cosineNearDupPairs(
        Embeddings.withScaledSiblings(emb), threshold = 0.95, nbits = 8)
      val (n2, s2) = time(cd.count())
      val plan2 = cd.queryExecution.executedPlan.toString
      println(f"rep=$rep neardup n=$n1 sec=$s1%.2f reused=${plan1.contains("ReusedExchange") || plan1.contains("reuses")} " +
        f"cosine n=$n2 sec=$s2%.2f reused=${plan2.contains("ReusedExchange") || plan2.contains("reuses")}")
      if (rep == 1) {
        println("neardup exchanges: " +
          plan1.linesIterator.count(_.contains("Exchange")) +
          ", reused markers: " + plan1.linesIterator.count(l =>
            l.contains("ReusedExchange") || l.contains("reuses")))
      }
    }
    val cached = spark.sparkContext.getPersistentRDDs
    println(s"persistent_rdds=${cached.size}")
    spark.stop()
  }
}
