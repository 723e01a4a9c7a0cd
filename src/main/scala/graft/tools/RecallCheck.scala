package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.spark.Embeddings

/** Measures recall@5 of annTopK (by table count) and ivfTopK against
  * brute force — the evidence behind q_ann_recall's floor.
  * Usage: sbt "runMain graft.tools.RecallCheck /root/testdata/sf0.01"
  */
object RecallCheck {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
    val bf = Embeddings.bruteForceTopK(emb, k = 5, nQueries = 10)
    for (l <- Seq(8, 16)) {
      val r = Embeddings.recallAtK(
        Embeddings.annTopK(emb, k = 5, nQueries = 10, nbits = args.lift(1).map(_.toInt).getOrElse(4), nTables = l), bf)
        .head().getDouble(0)
      println(f"ann nbits=${args.lift(1).getOrElse("4")} tables=$l recall=$r%.2f")
    }
    for ((nc, np) <- Seq((8, 4))) {
      val r = Embeddings.recallAtK(
        Embeddings.ivfTopK(emb, k = 5, nQueries = 10, nCentroids = nc, nProbe = np), bf)
        .head().getDouble(0)
      println(f"ivf c=$nc probe=$np recall=$r%.2f")
    }
    spark.stop()
  }
}
