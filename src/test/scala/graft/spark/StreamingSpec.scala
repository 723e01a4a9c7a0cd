package graft.spark

import graft.extract.Extractor
import org.apache.spark.sql.functions._

class StreamingSpec extends SparkTestBase {
  import spark.implicits._

  private def turns(offset: Int, n: Int) = (0 until n).map { i =>
    Turn(f"sc-${offset + i}%04d", 0, "user",
      s"<div id='m'>streaming content number ${offset + i} here</div>", "",
      new java.sql.Timestamp(1700000000000L + offset + i))
  }

  test("AvailableNow processes current files, then only increments; per-turn oracle holds") {
    val dir = tmpDir("graft-stream")
    val in = s"$dir/in"
    val out = s"$dir/out"
    new java.io.File(in).mkdirs()

    spark.createDataset(turns(0, 30)).toDF().coalesce(1)
      .write.mode("append").parquet(in)
    val n1 = StreamingExtraction.runAvailableNow(spark, in, out)
    assert(n1 == 30)

    // rerun with nothing new: no duplicates
    val n2 = StreamingExtraction.runAvailableNow(spark, in, out)
    assert(n2 == 0)

    // land more files: only the increment processes
    spark.createDataset(turns(100, 20)).toDF().coalesce(1)
      .write.mode("append").parquet(in)
    val n3 = StreamingExtraction.runAvailableNow(spark, in, out)
    assert(n3 == 20)
    assert(StreamingExtraction.countOutput(spark, out) == 50)

    // per-turn equality vs the pure-function oracle
    val got = StreamingExtraction.readExtracted(spark, out)
      .select("conv_id", "extracted_text").as[(String, String)].collect().toMap
    (turns(0, 30) ++ turns(100, 20)).foreach { t =>
      assert(got(t.conv_id) == Extractor.extract(t.text).text)
    }
  }

  test("stateful streaming sessionize == batch sessionize; state continues across runs") {
    val dir = tmpDir("graft-sess")
    val in = s"$dir/in"; val out = s"$dir/out"
    val events = spark.read.parquet("/root/testdata/sf0.001/events.parquet")

    // first run: the earlier half of the stream (files landed so far)
    val tsUs = unix_micros(col("ts").cast("timestamp"))
    val cut = events.agg(expr("percentile_approx(unix_micros(cast(ts as timestamp)), 0.5)"))
      .head.getLong(0)
    events.filter(tsUs <= cut).write.mode("append").parquet(in)
    val n1 = StreamingSessions.runAvailableNow(spark, in, out)
    assert(n1 > 0)

    // second run: the rest lands later; state store continues numbering
    events.filter(tsUs > cut).write.mode("append").parquet(in)
    val n2 = StreamingSessions.runAvailableNow(spark, in, out)
    assert(n1 + n2 == events.count())

    // the two-run streaming assignment equals the one-shot batch operator
    // (each user's events are time-split across the runs, so this checks
    // genuine cross-batch state, not just per-batch folding)
    val streamed = StreamingSessions.readSessions(spark, out)
      .select("event_id", "session_idx").as[(Long, Long)].collect().toMap
    val batch = Events.sessionize(events, gapMinutes = 30)
      .select("event_id", "session_idx").as[(Long, Long)].collect().toMap
    assert(streamed == batch)
  }

  test("watermarked tumbling-window aggregation matches the batch equivalent") {
    val dir = tmpDir("graft-win")
    val in = s"$dir/in"
    val events = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    events.write.mode("append").parquet(in)

    val q = StreamingSessions.eventCountsPerWindow(
        spark.readStream.schema(StreamingSessions.eventSchema).parquet(in))
      .writeStream.format("memory").queryName("win_counts")
      .outputMode("append")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination()

    // Append emits only windows finalized by the watermark; every emitted
    // row must match the batch aggregation exactly
    val streamed = spark.table("win_counts")
      .as[(java.sql.Timestamp, String, Long)].collect()
      .map(r => (r._1.getTime, r._2) -> r._3).toMap
    val batch = events
      .groupBy(window(col("ts"), "1 day"), col("event_type"))
      .agg(count(lit(1)).as("n"))
      .select(col("window.start").cast("timestamp").cast("long") * 1000,
        col("event_type"), col("n"))
      .as[(Long, String, Long)].collect()
      .map(r => (r._1, r._2) -> r._3).toMap
    assert(streamed.nonEmpty)
    streamed.foreach { case (k, n) => assert(batch(k) == n, s"window $k") }
  }
}
