package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Headline benchmark. Prints ONE JSON line:
  * {"metric":"total","value":N,"unit":"sec","queries":{...},"sf":...,
  *  "turns":N,"turns_per_sec":N,"cpus":N}
  *
  * Queries are forced through the `noop` sink — a bare count() would let
  * Catalyst prune the (deterministic) parse UDF columns and measure only
  * the scan.
  */
object Bench {
  def runQuery(df: DataFrame): Unit =
    df.write.format("noop").mode("overwrite").save()

  /** The headline subset (scan+parse heavy / shuffle heavy / join heavy). */
  val headline: Seq[String] = Seq(
    "q_pipeline_extract", "q_roundtrip", "q_find_links", "q_extract_main",
    "q_conversations", "q_get_content", "q_dedup_exact", "q_ngram_jaccard",
    "q_neardup_pairs", "q_embed_topk", "q_media_features", "q_token_count")

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.local.dir", sys.env.getOrElse("SPARK_LOCAL_DIRS", "/dev/shm/graft-spark"))
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val nTurns = spark.read.parquet(s"$sfDir/lineitem.parquet").count()

    // JIT warmup: drive the parser/extractor hot paths on a ~5% sample so
    // the first timed query doesn't absorb compilation cost. (limit()
    // would funnel through one task; a hash filter stays parallel.)
    locally {
      import org.apache.spark.sql.functions._
      val t = graft.spark.Transcripts.derive(spark, sfDir)
        .filter(pmod(hash(col("conv_id")), lit(20)) === 0)
        .select(col("conv_id"), col("turn_idx"), col("text"))
      runQuery(t.select(graft.spark.HtmlFunctions.to_html(col("text"))))
      runQuery(graft.spark.Pipeline.extractTurns(t).toDF())
    }

    val results = headline.flatMap { name =>
      SparkEntry.queries.get(name).map { fn =>
        val t0 = System.nanoTime()
        try runQuery(fn(spark, sfDir))
        catch { case e: Throwable => System.err.println(s"[bench] $name: $e") }
        name -> (System.nanoTime() - t0) / 1e9
      }
    }

    val qs = results.map { case (k, v) => "\"" + k + "\":" + f"$v%.3f" }
      .mkString("{", ",", "}")
    val total = results.map(_._2).sum
    val pipeSec = results.toMap.getOrElse("q_pipeline_extract", Double.NaN)
    val tps = if (pipeSec > 0) nTurns / pipeSec else 0.0
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir","turns":$nTurns,"turns_per_sec":${f"$tps%.1f"},"cpus":$cpus}""")
    spark.stop()
  }
}
