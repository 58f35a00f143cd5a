package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import org.apache.spark.sql.types._

/** Custom per-user running state for [[Streaming.userRunningStats]]. */
final case class UserState(n_events: Long, value_milli_sum: Long, last_epoch: Long)

/** One input event row for the stateful path (typed boundary). */
final case class UserEvent(user_id: Long, epoch: Long, value_milli: Long)

/** Emitted state row. */
final case class UserStats(user_id: Long, n_events: Long, value_milli_sum: Long, last_epoch: Long)

/** Structured Streaming surface over the `events` table (an extension —
  * the reference is fully synchronous request/response, SURVEY §2.2).
  * Every transform below is batch/stream agnostic: the same function
  * builds the batch plan (used by the oracle-checked queries) and the
  * streaming plan (used with `readStream` + a trigger).
  *
  * Scale/streaming design: tumbling windows + watermark bound state;
  * session windows use Spark's native `session_window` (state merges
  * per user key); sums are integer-exact (milli-units) so results are
  * reproducible regardless of partition/arrival order.
  */
object Streaming {

  /** events fixture schema (TESTDATA.md) — needed by `readStream`. `ts`
    * is declared LONG because the fixture stores TIMESTAMP(NANOS), which
    * Spark 4 only reads via the nanos-as-long legacy path (see
    * [[graft.Tables.events]]); [[eventsStream]] converts it. */
  val EventsSchema: StructType = StructType(Seq(
    StructField("event_id", LongType),
    StructField("ts", LongType),
    StructField("user_id", LongType),
    StructField("event_type", StringType),
    StructField("value", DoubleType),
    StructField("props", StringType)))

  /** Tumbling-window counts + exact milli-sums per event type. Output is
    * scalar (epoch seconds), deterministic across engines and across
    * batch/streaming execution. */
  def windowedCounts(
      events: DataFrame,
      windowDur: String = "10 minutes",
      watermark: Option[String] = None,
      slide: Option[String] = None): DataFrame = {
    val base = watermark.fold(events)(w => events.withWatermark("ts", w))
    val w = slide.fold(window(col("ts"), windowDur))(sl => window(col("ts"), windowDur, sl))
    base
      .groupBy(w.as("w"), col("event_type"))
      .agg(
        count(lit(1)).as("n_events"),
        sum(floor(col("value") * 1000).cast("long")).as("value_milli_sum"))
      .select(
        unix_timestamp(col("w.start")).as("window_start_epoch"),
        col("event_type"), col("n_events"), col("value_milli_sum"))
  }

  /** Per-user sessionization with a max-gap window (session ends after
    * `gap` of silence). Output: user_id, session start (epoch s), event
    * count. */
  def sessionize(
      events: DataFrame,
      gap: String = "30 minutes",
      watermark: Option[String] = None): DataFrame = {
    val base = watermark.fold(events)(w => events.withWatermark("ts", w))
    base
      .groupBy(session_window(col("ts"), gap).as("sw"), col("user_id"))
      .agg(count(lit(1)).as("n_events"))
      .select(
        col("user_id"),
        unix_timestamp(col("sw.start")).as("session_start_epoch"),
        col("n_events"))
  }

  /** Arbitrary stateful processing (`mapGroupsWithState`): a per-user
    * running aggregate the built-in windowed aggs can't express as-is
    * (count + exact milli-sum + last-seen, updated per micro-batch).
    * Works identically on a batch frame (Spark runs the state function
    * once per group) and a stream (state persists across batches) —
    * StreamingSpec asserts both paths agree. All state fields are exact
    * integers, so results are arrival-order independent. */
  def userRunningStats(events: DataFrame): Dataset[UserStats] = {
    val spark = events.sparkSession
    import spark.implicits._
    val typed = events.select(
      col("user_id"),
      unix_timestamp(col("ts")).as("epoch"),
      floor(col("value") * 1000).cast("long").as("value_milli"))
      .as[UserEvent]
    typed
      .groupByKey(_.user_id)
      .mapGroupsWithState[UserState, UserStats](GroupStateTimeout.NoTimeout) {
        (userId: Long, rows: Iterator[UserEvent], state: GroupState[UserState]) =>
          val prev = state.getOption.getOrElse(UserState(0L, 0L, Long.MinValue))
          var n = prev.n_events
          var s = prev.value_milli_sum
          var last = prev.last_epoch
          rows.foreach { e =>
            n += 1
            s += e.value_milli
            if (e.epoch > last) last = e.epoch
          }
          val next = UserState(n, s, last)
          state.update(next)
          UserStats(userId, next.n_events, next.value_milli_sum, next.last_epoch)
      }
  }

  /** Output mode required by [[userRunningStats]] under a stream. */
  val RunningStatsOutputMode: OutputMode = OutputMode.Update()

  /** Event-pair correlation: for each event, the events by the SAME user
    * within the following `withinSeconds` (exclusive of itself) — e.g.
    * "view followed by click". As a stream-stream self-join both sides
    * need watermarks and the join condition must time-bound both event
    * times (bounds the join state); the same function builds the batch
    * plan for the oracle-checked query. Output is scalar + exact. */
  def correlatedPairs(
      left: DataFrame,
      right: DataFrame,
      withinSeconds: Int): DataFrame = {
    val a = left.select(
      col("event_id").as("a_id"), col("user_id"),
      col("ts").as("a_ts"), col("event_type").as("a_type"))
    val b = right.select(
      col("event_id").as("b_id"), col("user_id").as("b_user"),
      col("ts").as("b_ts"), col("event_type").as("b_type"))
    a.join(b,
      col("user_id") === col("b_user") &&
        col("a_id") =!= col("b_id") &&
        col("b_ts") >= col("a_ts") &&
        col("b_ts") <= col("a_ts") + expr(s"INTERVAL $withinSeconds SECONDS"))
      .select(
        col("a_id"), col("b_id"), col("user_id"),
        col("a_type"), col("b_type"),
        (unix_micros(col("b_ts")) - unix_micros(col("a_ts"))).as("gap_micros"))
  }

  /** An events file stream over a DIRECTORY of parquet files — the real
    * streaming ingest shape (files arrive in a landing dir; each
    * micro-batch picks up new ones; `Trigger.AvailableNow` drains the
    * backlog like a batch). Spark's `FileStreamSource` cannot stream a
    * single bare file, so callers stage fixture files into a directory
    * first. nanos→µs conversion mirrors [[graft.Tables.events]]. */
  def eventsStream(spark: SparkSession, landingDir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.readStream
      .schema(EventsSchema)
      .parquet(landingDir)
      .withColumn("ts", timestamp_micros(expr("ts div 1000")))
  }
}
