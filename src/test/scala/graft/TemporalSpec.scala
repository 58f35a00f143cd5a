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
}
