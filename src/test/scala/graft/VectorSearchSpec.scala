package graft

import org.apache.spark.sql.functions._

import graft.functions.Metric
import graft.operators.VectorSearch

/** Top-k and knn-join semantics: tie-break determinism, k-clamp
  * (reference api.py:121), empty input (api.py:107-108), self-exclusion,
  * and knnJoin == per-query topK agreement. */
class VectorSearchSpec extends SparkSpec {
  import spark.implicits._

  private lazy val emb = Tables.embeddings(spark, Sf0001).select("vec_id", "embedding").cache()
  private lazy val qv = Tables.embeddings(spark, Sf0001)
    .filter(col("vec_id") === 0).select(col("embedding").as("qvec"))

  test("tie-break: duplicate vectors rank by id ascending") {
    val dup = Seq(
      (10L, Seq(1.0, 0.0)), (2L, Seq(1.0, 0.0)), (7L, Seq(1.0, 0.0)),
      (5L, Seq(0.0, 1.0))).toDF("vec_id", "embedding")
    val q = Seq(Tuple1(Seq(1.0, 0.0))).toDF("qvec")
    val ids = VectorSearch.topK(dup, "embedding", "vec_id", q, "qvec", Metric.Cosine, 3)
      .select("vec_id").as[Long].collect().toSeq
    assert(ids == Seq(2L, 7L, 10L), s"tie-break order was $ids")
  }

  test("k > N clamps to N (reference api.py:121)") {
    val rows = VectorSearch.topK(emb.limit(3), "embedding", "vec_id", qv, "qvec",
      Metric.Dot, 50).count()
    assert(rows == 3)
  }

  test("empty input yields empty result (reference api.py:107-108)") {
    val rows = VectorSearch.topK(emb.filter(lit(false)), "embedding", "vec_id",
      qv, "qvec", Metric.Cosine, 5).count()
    assert(rows == 0)
  }

  test("knnJoin agrees with per-query topK for a sample query") {
    val joined = VectorSearch.knnJoin(
      emb.filter(col("vec_id") === 7), emb, "embedding", "vec_id",
      Metric.Cosine, k = 5, excludeSelf = true, broadcastData = true)
      .select("neighbor_id").as[Long].collect().toSeq
    val single = VectorSearch.topK(
      emb.filter(col("vec_id") =!= 7), "embedding", "vec_id",
      Tables.embeddings(spark, Sf0001).filter(col("vec_id") === 7)
        .select(col("embedding").as("qvec")),
      "qvec", Metric.Cosine, 5)
      .select("vec_id").as[Long].collect().toSeq
    assert(joined == single)
  }

  test("knnJoin excludes self and emits ranks 1..k per query") {
    val out = VectorSearch.knnJoin(emb.limit(20), emb, "embedding", "vec_id",
      Metric.Cosine, k = 5, excludeSelf = true, broadcastData = true)
    assert(out.filter(col("query_id") === col("neighbor_id")).count() == 0)
    val perQuery = out.groupBy("query_id")
      .agg(count(lit(1)).as("n"), min("rank").as("lo"), max("rank").as("hi"))
      .filter(col("n") =!= 5 || col("lo") =!= 1 || col("hi") =!= 5)
    assert(perQuery.count() == 0)
  }
}
