package graft

import graft.operators.Profile

/** Column profiling against a hand-built fixture with nulls, ties, and
  * an all-null column. */
class ProfileSpec extends SparkSpec {

  test("profile: nulls, distincts, min/max, modal value with smallest-value tie-break") {
    import spark.implicits._
    val df = Seq(
      (Some(3L), Some("b")), (Some(1L), Some("a")), (Some(1L), Some("b")),
      (None, Some("a")), (Some(7L), None))
      .toDF("k", "s")
    val got = Profile.profile(df, Seq("k", "s"))
      .collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3),
        r.getString(4), r.getString(5), r.getString(6), r.getLong(7))).toMap
    assert(got("k") == ((5L, 1L, 3L, "1", "7", "1", 2L)))
    // "a" and "b" both occur twice -> smallest value string wins
    assert(got("s") == ((5L, 1L, 2L, "a", "b", "a", 2L)))
  }

  test("profile of an all-null column reports zero distincts and a null mode") {
    import spark.implicits._
    val df = Seq((1L, Option.empty[String]), (2L, Option.empty[String]))
      .toDF("k", "s")
    val row = Profile.profile(df, Seq("s")).collect()(0)
    assert(row.getLong(2) == 2L && row.getLong(3) == 0L)
    assert(row.isNullAt(4) && row.isNullAt(6) && row.getLong(7) == 0L)
  }
}
