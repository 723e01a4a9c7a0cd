package graft.spark

import org.apache.spark.sql.{DataFrame, Dataset, Encoders, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode, Trigger}

/** One raw event row (matches the driver's events table schema). */
final case class Event(event_id: Long, ts: java.sql.Timestamp, user_id: Long,
                       event_type: String, value: Double, props: String)

/** Streaming output of [[StreamingSessions.runAvailableNow]]. */
final case class SessionAssign(event_id: Long, user_id: Long, session_idx: Long)

/** Per-user sessionization state carried across micro-batches. */
final case class SessState(lastTsUs: Long, sessionIdx: Long)

/** STATEFUL Structured Streaming: gap-based sessionization via
  * `flatMapGroupsWithState` — the streaming counterpart of
  * [[Events.sessionize]]. State per user is (last event micros, current
  * session index); a batch's events are ordered in-group by
  * (ts, event_id) before folding, so within any single AvailableNow run
  * the assignment equals the batch operator exactly. Across runs the
  * state store continues numbering where the previous run stopped —
  * late events older than the watermark are the usual streaming caveat.
  *
  * Also ships the canonical watermark + tumbling-window aggregation
  * ([[eventCountsPerWindow]]) to cover the windowed-agg streaming
  * surface.
  */
object StreamingSessions {

  val eventSchema = Encoders.product[Event].schema

  /** Full-microsecond epoch (Timestamp.getTime alone is millis and would
    * diverge from the batch operator's unix_micros on sub-ms data).
    */
  private def micros(t: java.sql.Timestamp): Long =
    t.getTime / 1000L * 1000000L + t.getNanos / 1000L

  private def assign(gapMinutes: Int)(
      userId: Long, events: Iterator[Event],
      state: GroupState[SessState]): Iterator[SessionAssign] = {
    val gapUs = gapMinutes.toLong * 60L * 1000000L
    val sorted = events.toArray.sortBy(e => (micros(e.ts), e.event_id))
    var st = state.getOption.getOrElse(SessState(Long.MinValue, 0L))
    val out = sorted.map { e =>
      val tsUs = micros(e.ts)
      val idx =
        if (st.lastTsUs == Long.MinValue || tsUs - st.lastTsUs > gapUs) st.sessionIdx + 1
        else st.sessionIdx
      st = SessState(tsUs, idx)
      SessionAssign(e.event_id, userId, idx)
    }
    state.update(st)
    out.iterator
  }

  /** Sessionize all currently-available event files into outDir; returns
    * rows written by this invocation.
    */
  def runAvailableNow(spark: SparkSession, inputPath: String, outDir: String,
                      gapMinutes: Int = 30): Long = {
    import spark.implicits._
    val before = countOutput(spark, outDir)

    val assigned: Dataset[SessionAssign] = spark.readStream
      .schema(eventSchema)
      .parquet(inputPath)
      .as[Event]
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout)(
        assign(gapMinutes))

    val q = assigned.writeStream
      .format("parquet")
      .option("path", s"$outDir/sessions")
      .option("checkpointLocation", s"$outDir/_stream_checkpoint")
      .outputMode(OutputMode.Append)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()

    countOutput(spark, outDir) - before
  }

  def countOutput(spark: SparkSession, outDir: String): Long = {
    val p = new org.apache.hadoop.fs.Path(s"$outDir/sessions")
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) 0L
    else {
      spark.catalog.refreshByPath(s"$outDir/sessions")
      spark.read.parquet(s"$outDir/sessions").count()
    }
  }

  def readSessions(spark: SparkSession, outDir: String): DataFrame = {
    spark.catalog.refreshByPath(s"$outDir/sessions")
    spark.read.parquet(s"$outDir/sessions")
  }

  /** Watermarked tumbling-window counts per event_type (streaming agg
    * surface: watermark bounds state; Append emits finalized windows).
    */
  def eventCountsPerWindow(events: DataFrame,
                           windowLen: String = "1 day",
                           watermark: String = "1 hour"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), windowLen), col("event_type"))
      .agg(count(lit(1)).as("n"))
      .select(col("window.start").as("win_start"), col("event_type"), col("n"))
}
