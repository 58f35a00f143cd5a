package graft

import org.apache.spark.sql.functions._

import graft.functions.Metric

/** Metric semantics on hand vectors — mirrors the reference's
  * `test_similarity_metrics_select_same_best_vector`
  * (tests/test_v2_features.py:51-70): every metric must agree that
  * `[1,0]` beats `[0,1]` for query `[1,0]`, and unknown metrics throw. */
class MetricSpec extends SparkSpec {

  private def scores(metric: Metric): Map[Long, Double] = {
    val df = spark.range(1).select(
      typedLit(Seq(1.0, 0.0)).as("q"),
      typedLit(Seq(Seq(1.0, 0.0), Seq(0.0, 1.0))).as("vs"))
      .select(posexplode(col("vs")).as(Seq("id", "v")), col("q"))
      .select(col("id").cast("long"), metric.score(col("v"), col("q")).as("s"))
    df.collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
  }

  for (m <- Metric.all)
    test(s"${m.name}: [1,0] beats [0,1] for query [1,0]") {
      val s = scores(m)
      assert(s(0L) > s(1L), s"expected id 0 to win under ${m.name}: $s")
    }

  test("cosine of identical unit vectors ≈ 1") {
    assert(math.abs(scores(Metric.Cosine)(0L) - 1.0) < 1e-9)
  }

  test("euclidean similarity of identical vectors ≈ 1 (1/(1+0))") {
    assert(math.abs(scores(Metric.Euclidean)(0L) - 1.0) < 1e-9)
  }

  test("dispatch is case-insensitive (reference lowercases, index.py:37)") {
    assert(Metric.fromName("Cosine") == Metric.Cosine)
    assert(Metric.fromName("EUCLIDEAN") == Metric.Euclidean)
    assert(Metric.fromName("dot") == Metric.Dot)
  }

  test("unknown metric throws (reference index.py:45-46)") {
    intercept[IllegalArgumentException](Metric.fromName("manhattan"))
  }
}
