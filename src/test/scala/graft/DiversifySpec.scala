package graft

import org.apache.spark.sql.functions._

import graft.functions.Metric
import graft.operators.{Diversify, VectorSearch}

/** MMR diversification: degeneracy to pure relevance at λ=1, the
  * split-the-near-dup property that is MMR's whole point, and
  * determinism. */
class DiversifySpec extends SparkSpec {

  private lazy val emb =
    Tables.embeddings(spark, Sf0001).select("vec_id", "embedding").cache()
  private lazy val query = emb.filter(col("vec_id") === 0)
    .select(col("embedding").as("qvec"))

  private def run(lambda: Double, k: Int = 10) =
    Diversify.mmrSelect(spark, emb, "embedding", "vec_id", query, "qvec",
      Metric.Cosine, n = 50, k = k, lambda = lambda)
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getLong(2)))

  test("lambda = 1 degenerates to the relevance ranking") {
    val mmr = run(lambda = 1.0).sortBy(_._3).map(_._1).toSeq
    val rel = VectorSearch.topK(emb, "embedding", "vec_id", query, "qvec",
      Metric.Cosine, 10)
      .select("vec_id").collect().map(_.getLong(0)).toSeq
    assert(mmr == rel)
  }

  test("first pick is the relevance top-1; all picks come from the candidate pool") {
    val got = run(lambda = 0.7)
    val pool = VectorSearch.topK(emb, "embedding", "vec_id", query, "qvec",
      Metric.Cosine, 50)
      .select("vec_id").collect().map(_.getLong(0)).toSet
    assert(got.minBy(_._3)._1 == 0L) // vec 0 scores 1.0 against itself
    assert(got.map(_._1).toSet.subsetOf(pool))
    assert(got.map(_._3).sorted.toSeq == (1L to 10L))
  }

  test("MMR splits a planted near-duplicate pair that pure relevance keeps together") {
    import spark.implicits._
    // pool of 4: ids 1,2 are near-identical and most relevant; 3,4 differ
    val vecs = Seq(
      1L -> Array(1.0, 0.01, 0.0, 0.0),
      2L -> Array(1.0, 0.012, 0.0, 0.0),
      3L -> Array(0.6, 0.8, 0.0, 0.0),
      4L -> Array(0.6, 0.0, 0.8, 0.0))
    val df = vecs.toDF("vec_id", "embedding")
    val q = Seq(Tuple1(Array(1.0, 0.0, 0.0, 0.0))).toDF("qvec")
    val relTop2 = VectorSearch.topK(df, "embedding", "vec_id", q, "qvec",
      Metric.Cosine, 2).select("vec_id").collect().map(_.getLong(0)).toSet
    assert(relTop2 == Set(1L, 2L), s"fixture broken: $relTop2")
    val mmrTop2 = Diversify.mmrSelect(spark, df, "embedding", "vec_id", q, "qvec",
      Metric.Cosine, n = 4, k = 2, lambda = 0.5)
      .collect().map(_.getLong(0)).toSet
    assert(mmrTop2.contains(1L) && !mmrTop2.contains(2L),
      s"MMR kept the near-duplicate: $mmrTop2")
  }

  test("selection is deterministic across repartitioning") {
    val a = run(0.7).toSeq
    val b = Diversify.mmrSelect(spark, emb.repartition(13), "embedding", "vec_id",
      query, "qvec", Metric.Cosine, n = 50, k = 10, lambda = 0.7)
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getLong(2))).toSeq
    assert(a == b)
  }
}
