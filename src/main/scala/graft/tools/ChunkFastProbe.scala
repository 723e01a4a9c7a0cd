package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.spark.{Chunking, Pipeline, Transcripts}

/** A/B probe: [[Chunking.chunkOffsetsOnly]] (interpreted Catalyst
  * higher-order functions) vs a compiled mapPartitions chunker over the
  * exact q_masked_pipeline input (pinned >=100-word conversations at
  * sf0.1). Measure-first evidence for replacing the HOF arithmetic in
  * the hot path. Run: sbt "runMain graft.tools.ChunkFastProbe [sfDir]"
  */
object ChunkFastProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    val sf = args.headOption.getOrElse("/root/testdata/sf0.1")

    def t[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"$name%-26s ${(System.nanoTime() - t0) / 1e9}%.3f s")
      r
    }

    val ex = Pipeline.extractOnScanPartitions(Transcripts.derive(spark, sf))
    val convsP = Pipeline.conversationTexts(ex.toDF())
      .filter(Chunking.wordCount(col("conv_text")) >= 100)
      .select(expr("CAST(substring(conv_id, 6) AS BIGINT)").as("conv_key"),
        col("conv_text"))
      .localCheckpoint()
    println(s"convs=${convsP.count()}")

    // compiled chunker: one pass over the text per row, prefix sums over
    // word lengths, same layout contract as chunkOffsetsOnly
    def fast = {
      val maxTokens = 16; val overlap = 4; val step = maxTokens - overlap
      convsP.select(col("conv_key"), col("conv_text"))
        .as[(Long, String)]
        .mapPartitions { it =>
          it.flatMap { case (id, textOrNull) =>
            val text = if (textOrNull == null) "" else textOrNull
            // word lengths under split(t, " ", -1): boundaries at every space
            var nWords = 1
            var i = 0
            val L = text.length
            while (i < L) { if (text.charAt(i) == ' ') nWords += 1; i += 1 }
            val pre = new Array[Long](nWords + 1) // pre(k) = chars in words[0..k)
            var w = 0; var runStart = 0
            i = 0
            while (i < L) {
              if (text.charAt(i) == ' ') {
                pre(w + 1) = pre(w) + (i - runStart); w += 1; runStart = i + 1
              }
              i += 1
            }
            pre(w + 1) = pre(w) + (L - runStart)
            val lastStart = ((math.max(nWords - overlap, 1) + step - 1) / step - 1) * step
            val nChunks = lastStart / step + 1
            val out = new Array[(Long, Int, Int, Long, Long)](nChunks)
            var k = 0
            while (k < nChunks) {
              val s = k * step
              val nt = math.min(nWords - s, maxTokens)
              out(k) = (id, k, nt,
                pre(s + nt) - pre(s) + nt - 1L,
                pre(s) + s.toLong)
              k += 1
            }
            out.iterator
          }
        }
        .toDF("conv_key", "chunk_idx", "n_tokens", "chunk_len", "char_start")
    }

    def hof = Chunking.chunkOffsetsOnly(convsP, maxTokens = 16, overlap = 4,
      textCol = "conv_text", idCol = "conv_key")

    for (rep <- 1 to 3) {
      println(s"--- rep $rep ---")
      t("hof-count") { hof.count() }
      t("fast-count") { fast.count() }
      t("hof-noop") { hof.write.format("noop").mode("overwrite").save() }
      t("fast-noop") { fast.write.format("noop").mode("overwrite").save() }
    }
    // equivalence probe (full outer join on keys, compare all columns)
    val a = hof.withColumnRenamed("n_tokens", "nt_a")
      .withColumnRenamed("chunk_len", "cl_a").withColumnRenamed("char_start", "cs_a")
    val b = fast.withColumnRenamed("n_tokens", "nt_b")
      .withColumnRenamed("chunk_len", "cl_b").withColumnRenamed("char_start", "cs_b")
    val j = a.join(b, Seq("conv_key", "chunk_idx"), "full_outer")
      .filter(col("nt_a").isNull || col("nt_b").isNull ||
        col("nt_a") =!= col("nt_b") || col("cl_a") =!= col("cl_b") ||
        col("cs_a") =!= col("cs_b"))
    println(s"mismatches=${j.count()}")
    spark.stop()
  }
}
