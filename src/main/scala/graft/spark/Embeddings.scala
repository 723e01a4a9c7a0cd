package graft.spark

import graft.text.Fingerprints
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Similarity search over an embedding column (Array[Float]).
  *
  * Two paths (SURVEY brief: brute-force baseline + bucketed scale path):
  *  - `bruteForceTopK`: broadcast the (small) query set, one scan of the
  *    corpus computing cosine, per-query top-k. The corpus side is never
  *    shuffled before scoring; only the tiny (query x k) result shuffles
  *    for the final rank.
  *  - `annTopK`: random-hyperplane LSH bucket per vector; candidates are
  *    corpus vectors sharing the query's bucket (join colocated on the
  *    bucket key), then exact cosine rank within candidates. Recall is
  *    tunable via nbits; at 100 TB this replaces the full scan with a
  *    bucket-local probe.
  */
object Embeddings {

  private val cosineUdf = udf((a: Seq[Float], b: Seq[Float]) =>
    Fingerprints.cosine(a.toArray, b.toArray))
  private def bucketUdf(nbits: Int) =
    udf((v: Seq[Float]) => Fingerprints.rhpBucket(v.toArray, nbits))

  /** Exact top-k neighbors for each of the first `nQueries` vectors.
    * Returns (query_id, neighbor_id, rank); cosine kept internally only
    * (floats don't hash-compare stably across engines).
    */
  def bruteForceTopK(emb: DataFrame, k: Int = 5, nQueries: Int = 10): DataFrame = {
    val queries = emb.filter(col("vec_id") < nQueries)
      .select(col("vec_id").as("query_id"), col("embedding").as("q_emb"))
    val scored = emb.crossJoin(broadcast(queries))
      .filter(col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("vec_id").as("neighbor_id"),
        cosineUdf(col("q_emb"), col("embedding")).as("sim"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("sim").desc, col("neighbor_id").asc)
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("neighbor_id"), col("rank"))
  }

  /** LSH-bucketed approximate top-k: candidates share the query's
    * random-hyperplane bucket.
    */
  def annTopK(emb: DataFrame, k: Int = 5, nQueries: Int = 10,
              nbits: Int = 8): DataFrame = {
    val bucketed = emb.select(col("vec_id"), col("embedding"),
      bucketUdf(nbits)(col("embedding")).as("bucket"))
    val queries = bucketed.filter(col("vec_id") < nQueries)
      .select(col("vec_id").as("query_id"), col("embedding").as("q_emb"), col("bucket"))
    val cand = bucketed.join(broadcast(queries), "bucket")
      .filter(col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("vec_id").as("neighbor_id"),
        cosineUdf(col("q_emb"), col("embedding")).as("sim"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("sim").desc, col("neighbor_id").asc)
    cand.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("neighbor_id"), col("rank"))
  }

  /** Embedding-cosine near-duplicate pairs: bucket join, exact cosine
    * verify >= threshold. (The embedding analog of Dedup.nearDupPairs.)
    */
  def cosineNearDupPairs(emb: DataFrame, threshold: Double = 0.95,
                         nbits: Int = 8): DataFrame = {
    val bucketed = emb.select(col("vec_id"), col("embedding"),
      bucketUdf(nbits)(col("embedding")).as("bucket"))
    bucketed.as("l").join(bucketed.as("r"),
        col("l.bucket") === col("r.bucket") && col("l.vec_id") < col("r.vec_id"))
      .select(col("l.vec_id").as("a"), col("r.vec_id").as("b"),
        cosineUdf(col("l.embedding"), col("r.embedding")).as("sim"))
      .filter(col("sim") >= threshold)
  }
}
