package graft.spark

import org.apache.spark.sql.functions._

/** Sessionization operators: the skew-safe two-pass shape must equal the
  * plain window shape on every input, including sessions that span
  * bucket boundaries, and must actually spread a monster user.
  */
class EventsSpec extends SparkTestBase {
  import spark.implicits._

  private def ts(us: Long) = new java.sql.Timestamp(us / 1000L)

  private def mkEvents(rows: Seq[(Long, Long, Long)]) = // (event_id, user_id, ts_us)
    rows.toDF("event_id", "user_id", "ts_us")
      .select(col("event_id"), col("user_id"),
        timestamp_micros(col("ts_us")).as("ts"),
        lit("t").as("event_type"), lit(0.0).as("value"), lit("").as("props"))

  private def collectAssign(df: org.apache.spark.sql.DataFrame) =
    df.select(col("event_id"), col("user_id"), col("session_idx").cast("long"))
      .as[(Long, Long, Long)].collect().toSet

  test("skew-safe == plain sessionize on the driver events table") {
    val events = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    val plain = collectAssign(Events.sessionize(events))
    // bucket sizes chosen to force MANY boundary decisions (1h buckets
    // against a 30min gap) and few (1 week)
    for (bucketMin <- Seq(60, 1440, 7 * 1440)) {
      val safe = collectAssign(Events.sessionizeSkewSafe(events, 30, bucketMin))
      assert(safe == plain, s"bucketMinutes=$bucketMin")
    }
  }

  test("skew-safe handles sessions spanning buckets and multi-bucket gaps") {
    val min = 60L * 1000000L
    val day = 1440L * min
    // user 1: session A spans the day-0/day-1 boundary (10min gap across
    // midnight); then a 3-DAY silence (empty buckets between); session B.
    // user 2: everything in one bucket, two sessions.
    val rows = Seq(
      (1L, 1L, day - 5 * min), (2L, 1L, day + 5 * min), // A: crosses boundary
      (3L, 1L, 4 * day), (4L, 1L, 4 * day + min),       // B: after empty buckets
      (5L, 2L, 10 * min), (6L, 2L, 200 * min))
    val e = mkEvents(rows)
    val plain = collectAssign(Events.sessionize(e))
    val safe = collectAssign(Events.sessionizeSkewSafe(e, 30, 1440))
    assert(safe == plain)
    val byId = safe.map(t => t._1 -> t._3).toMap
    assert(byId(1L) == 1 && byId(2L) == 1) // one session across midnight
    assert(byId(3L) == 2 && byId(4L) == 2)
    assert(byId(5L) == 1 && byId(6L) == 2)
  }

  test("monster user spreads over many partitions in the skew-safe shape") {
    val min = 60L * 1000000L
    // one user, 40 days of events (one per hour) — plain sessionize pins
    // all 960 rows to ONE reducer partition; skew-safe splits by day
    val rows = (0L until 960L).map(i => (i, 7L, i * 60L * min))
    val e = mkEvents(rows)
    val local = e.select(col("event_id"), col("user_id"),
        expr("unix_micros(ts)").as("ts_us"))
      .withColumn("bkt", floor(col("ts_us") / lit(1440L * min)))
      // the shape's event-side key; explicit count so AQE can't coalesce
      // this tiny test exchange into one partition
      .repartition(4, col("user_id"), col("bkt"))
      .select(spark_partition_id().as("p"))
      .distinct().count()
    assert(local > 1, "monster user must span multiple (user, bucket) partitions")
    // and the assignment is still the exact global one (one session per
    // hour gap > 30min => every event its own session)
    val safe = collectAssign(Events.sessionizeSkewSafe(e, 30, 1440))
    assert(safe == rows.map { case (id, u, _) => (id, u, id + 1L) }.toSet)
  }
}
