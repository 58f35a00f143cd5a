package graft

import org.apache.spark.sql.functions._

import graft.operators.Layout

/** Z-order layout: Morton-code correctness against a bit-twiddling JVM
  * model, the data-skipping payoff vs a linear sort, and determinism. */
class LayoutSpec extends SparkSpec {

  private def mortonModel(a: Long, b: Long): Long = {
    var z = 0L
    for (i <- 0 until 16)
      z |= ((a >> i) & 1L) << (2 * i) | ((b >> i) & 1L) << (2 * i + 1)
    z
  }

  test("mortonCode matches the JVM bit-interleave model on a 16-bit grid sample") {
    import spark.implicits._
    val pairs = for (a <- 0 until 256; b <- Seq(0, 1, 7, 255, 256, 65535))
      yield (a.toLong, b.toLong)
    val got = pairs.toDF("a", "b")
      .select(col("a"), col("b"), Layout.mortonCode(col("a"), col("b")).as("z"))
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    pairs.foreach { case (a, b) =>
      assert(got((a, b)) == mortonModel(a, b), s"($a, $b)")
    }
    // injectivity on the sample (Morton is a bijection on 16-bit pairs)
    assert(got.values.toSet.size == pairs.distinct.size)
  }

  test("z-order buckets shrink the NON-leading column's span vs a linear sort") {
    val o = Tables.orders(spark, Sf0001).select(col("o_custkey"),
      datediff(col("o_orderdate"), lit("1970-01-01")).as("o_days"))
    def spans(df: org.apache.spark.sql.DataFrame): (Double, Double) = {
      val rows = df.collect()
      val a = rows.map(r => (r.getLong(2), r.getLong(3))).map(t => (t._2 - t._1).toDouble)
      val b = rows.map(r => (r.getLong(4), r.getLong(5))).map(t => (t._2 - t._1).toDouble)
      (a.sum / a.length, b.sum / b.length)
    }
    val (za, zb) = spans(Layout.zorderStats(o, "o_custkey", "o_days", 16))
    val (la, lb) = spans(Layout.linearStats(o, "o_custkey", "o_days", 16))
    info(f"avg bucket span custkey: linear $la%.0f vs zorder $za%.0f; " +
      f"days: linear $lb%.0f vs zorder $zb%.0f")
    // linear sort on custkey leaves o_days unclustered (span ~ full range);
    // z-order must cut it — that's the multi-predicate skipping payoff —
    // while giving up only part of the leading column's clustering
    assert(zb < lb * 0.7, f"z-order did not cluster the second column: $zb%.0f vs $lb%.0f")
    assert(za < lb, "z-order custkey spans should stay below the full range")
  }

  test("normalize16 fails loudly past the 2^46 range guard (no silent z-code corruption)") {
    import spark.implicits._
    val wide = Seq(0L, 1L << 50).toDF("v")
    val ex = intercept[Exception] {
      Layout.zorderStats(wide.withColumn("w", lit(1L)), "v", "w", 4).collect()
    }
    def messages(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(e => Option(e.getMessage).toSeq ++ messages(e.getCause))
    assert(messages(ex).exists(_.contains("pre-scale")),
      s"expected the range-guard raise_error, got: ${ex.getMessage}")
  }

  test("zorderStats is deterministic across repartitioning") {
    val o = Tables.orders(spark, Sf0001).select(col("o_custkey"),
      datediff(col("o_orderdate"), lit("1970-01-01")).as("o_days"))
    def run(df: org.apache.spark.sql.DataFrame) =
      Layout.zorderStats(df, "o_custkey", "o_days", 16)
        .collect().map(_.toSeq).toSeq
    assert(run(o) == run(o.repartition(13)))
  }
}
