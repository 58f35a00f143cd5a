package graft

import org.apache.spark.sql.functions._

import graft.operators.Temporal

/** As-of join semantics on a hand corpus: latest-at-or-before match,
  * inclusive boundary, highest-id tie-break at equal ts, null match for
  * rows with no prior right row, plus plan shape (one key shuffle, no
  * cartesian). */
class TemporalSpec extends SparkSpec {
  import spark.implicits._

  private def ts(epoch: Long) = new java.sql.Timestamp(epoch * 1000L)

  private lazy val left = Seq(
    (10L, 1L, ts(100)), // matches r2 (ts 100, inclusive boundary)
    (11L, 1L, ts(150)), // matches r2 (still latest at 150)
    (12L, 1L, ts(300)), // matches r4 (ties at 200 -> highest id wins)
    (13L, 2L, ts(50))   // no prior right row for user 2 -> nulls
  ).toDF("event_id", "user_id", "ts")

  private lazy val right = Seq(
    (1L, 1L, ts(40)),
    (2L, 1L, ts(100)),
    (3L, 1L, ts(200)),
    (4L, 1L, ts(200)), // same ts as 3: tie-break -> id 4
    (5L, 2L, ts(60))   // after left 13 -> must NOT match
  ).toDF("event_id", "user_id", "ts")

  private lazy val joined = Temporal.asofJoin(left, right, "user_id", "ts", "event_id")
    .select(col("event_id"), col("asof_event_id"))
    .collect()
    .map(r => r.getLong(0) -> (if (r.isNullAt(1)) None else Some(r.getLong(1))))
    .toMap

  test("as-of join: latest at-or-before match, inclusive boundary") {
    assert(joined(10L) == Some(2L), s"inclusive boundary failed: $joined")
    assert(joined(11L) == Some(2L))
  }

  test("as-of join: equal-ts right rows tie-break to the highest id") {
    assert(joined(12L) == Some(4L), s"tie-break failed: $joined")
  }

  test("as-of join: no prior right row yields a null match (left outer)") {
    assert(joined(13L) == None)
  }

  test("as-of join plans one key shuffle and no join operator at all") {
    val plan = Temporal.asofJoin(left, right, "user_id", "ts", "event_id")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Join"), s"as-of should be join-free (union+window):\n$plan")
    assert(plan.contains("Window"), s"missing the running-last window:\n$plan")
  }

  test("scd2: changes open intervals, repeats collapse, last interval stays open") {
    import spark.implicits._
    def ts(sec: Int) = java.sql.Timestamp.from(java.time.Instant.ofEpochSecond(sec))
    val events = Seq(
      (1L, 10L, ts(10), "free"),
      (1L, 11L, ts(20), "free"),   // repeat — collapses
      (1L, 12L, ts(30), "pro"),    // change
      (1L, 13L, ts(40), "free"),   // change back
      (2L, 20L, ts(15), "pro")
    ).toDF("user_id", "event_id", "ts", "plan")
    val got = Temporal.scd2History(events, "user_id", "ts", "plan", "event_id")
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2),
        if (r.isNullAt(3)) -1L else r.getLong(3))).toSet
    assert(got == Set(
      (1L, "free", 10000000L, 30000000L),
      (1L, "pro", 30000000L, 40000000L),
      (1L, "free", 40000000L, -1L),
      (2L, "pro", 15000000L, -1L)), got.toString)
  }

  test("scd2 intervals tile each key's timeline (no gaps, no overlaps)") {
    val got = Temporal.scd2History(Tables.events(spark, Sf0001),
      "user_id", "ts", "event_type", "event_id")
      .collect()
      .map(r => (r.getLong(0), r.getLong(2),
        if (r.isNullAt(3)) Long.MaxValue else r.getLong(3)))
    assert(got.nonEmpty)
    got.groupBy(_._1).foreach { case (u, ivs) =>
      val sorted = ivs.sortBy(_._2)
      sorted.sliding(2).foreach {
        case Array((_, _, to), (_, from, _)) =>
          assert(to == from, s"user $u: interval gap/overlap ($to vs $from)")
        case _ =>
      }
      assert(sorted.last._3 == Long.MaxValue, s"user $u: last interval closed")
    }
  }

  test("last-touch attribution: latest preceding touch wins, inclusive ties, no-touch is null") {
    import spark.implicits._
    def ts(sec: Int) = java.sql.Timestamp.from(java.time.Instant.ofEpochSecond(sec))
    val purchases = Seq((1L, ts(30), 500L), (2L, ts(10), 700L))
      .toDF("user_id", "ts", "value_milli")
    val touches = Seq(
      (1L, ts(10), 100L, "view"),
      (1L, ts(20), 101L, "click"),  // latest before 30 → wins
      (1L, ts(40), 102L, "view"),   // after the purchase → ignored
      (2L, ts(10), 103L, "view")    // same-ts as purchase → inclusive match
    ).toDF("user_id", "ts", "event_id", "event_type")
    val got = Temporal.asofJoin(purchases, touches, "user_id", "ts", "event_id")
      .select("user_id", "asof_event_type")
      .collect().map(r => r.getLong(0) -> Option(r.getString(1))).toMap
    assert(got == Map(1L -> Some("click"), 2L -> Some("view")))
    // a user with no touches at all attributes to null (LEFT OUTER)
    val lone = Seq((9L, ts(5), 100L)).toDF("user_id", "ts", "value_milli")
    val none = Temporal.asofJoin(lone, touches, "user_id", "ts", "event_id")
      .collect()
    assert(none.length == 1 && none(0).isNullAt(none(0).fieldIndex("asof_event_type")))
  }

  // ------------------------------------------------------------- funnel ---

  test("funnel: ordering, window, and pre-step events all gate conversion") {
    import spark.implicits._
    def ts(day: Int, h: Int = 0) =
      java.sql.Timestamp.valueOf(f"2024-01-$day%02d $h%02d:00:00")
    val events = Seq(
      // user 1: clean view -> click -> purchase inside the window
      (1L, ts(1), "view"), (1L, ts(2), "click"), (1L, ts(3), "purchase"),
      // user 2: click BEFORE the first view — must not convert step 2
      (2L, ts(2), "view"), (2L, ts(1), "click"),
      // user 3: purchase outside the 7-day window from first view
      (3L, ts(1), "view"), (3L, ts(2), "click"), (3L, ts(12), "purchase"),
      // user 4: never views — in no stage
      (4L, ts(1), "click"), (4L, ts(2), "purchase"),
      // user 5: same-timestamp view and click (>= boundary converts)
      (5L, ts(4), "view"), (5L, ts(4), "click")
    ).toDF("user_id", "ts", "event_type")
    val got = Temporal.funnelCounts(events, "user_id", "ts", "event_type",
      Seq("view", "click", "purchase"), windowDays = 7)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSeq
    assert(got == Seq((1L, "view", 4L), (2L, "click", 3L), (3L, "purchase", 1L)),
      got.toString)
  }

  test("retention: cohort assignment by first event, offsets count distinct weeks") {
    import spark.implicits._
    def ts(day: Int) = java.sql.Timestamp.valueOf(f"2024-01-$day%02d 10:00:00")
    // week boundaries: Mon 2024-01-01, Mon 2024-01-08, Mon 2024-01-15, Mon 2024-01-22
    val events = Seq(
      (1L, ts(2)), (1L, ts(3)), (1L, ts(9)), (1L, ts(16)),  // cohort wk0, active 0,1,2
      (2L, ts(4)),                                          // cohort wk0, active 0
      (3L, ts(10)), (3L, ts(22))                            // cohort wk1, active 0,2
    ).toDF("user_id", "ts").withColumn("event_type", lit("view"))
    val got = Temporal.retentionCohorts(events, "user_id", "ts", 8)
      .collect()
      .map(r => (r.getTimestamp(0).toString.take(10), r.getLong(1), r.getLong(2)))
      .toSeq
    assert(got == Seq(
      ("2024-01-01", 0L, 2L), ("2024-01-01", 1L, 1L), ("2024-01-01", 2L, 1L),
      ("2024-01-08", 0L, 1L), ("2024-01-08", 2L, 1L)), got.toString)
  }

  test("funnel counts are non-increasing on the real event log") {
    val got = Temporal.funnelCounts(Tables.events(spark, Sf0001),
      "user_id", "ts", "event_type", Seq("view", "click", "purchase"), 7)
      .collect().sortBy(_.getLong(0)).map(_.getLong(2))
    assert(got.length == 3 && got.sliding(2).forall(p => p(0) >= p(1)), got.toSeq)
    assert(got.head > 0)
  }
}
