package graft


import org.apache.spark.sql.functions._

import graft.functions.Metric
import graft.operators.VectorSearch

/** Typed facade: result parity with the untyped plans, preserved codegen
  * kernels (the typed layer must not smuggle lambdas into the plan), and
  * the insert dim guard surviving the typed boundary. */
class TypedVectorTableSpec extends SparkSpec {
  import spark.implicits._

  private lazy val base = VectorTable(
    Tables.embeddings(spark, Sf0001),
    VectorTableConfig(dim = Tables.EmbeddingDim, metric = "cosine"))

  private lazy val typed = TypedVectorTable(base, spark)

  private lazy val queryVec: Seq[Double] =
    Tables.embeddings(spark, Sf0001).filter(col("vec_id") === 0)
      .select("embedding").collect()(0).getSeq[Double](0)

  test("typed search == untyped topK (same rows, same scores)") {
    val t = typed.search(queryVec, 10).collect()
      .map(s => s.vec_id -> s.score).toSeq
    val q = spark.range(1).select(typedlit(queryVec).as("qvec"))
    val u = VectorSearch.topK(base.df, "embedding", "vec_id", q, "qvec",
      Metric.Cosine, 10)
      .select("vec_id", "score").collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toSeq
    assert(t == u)
  }

  test("typed search keeps the codegen kernels (no lambda in the plan)") {
    val plan = typed.search(queryVec, 5).queryExecution.executedPlan.toString
    assert(plan.contains("vec_l2_normalize") || plan.contains("vec_dot"),
      s"typed path lost the codegen kernels:\n$plan")
    assert(!plan.contains("MapElements"),
      s"typed path introduced an opaque lambda operator:\n$plan")
    assert(plan.contains("TakeOrderedAndProject"),
      s"typed path lost the partial top-k plan:\n$plan")
  }

  test("typed insert enforces the dim guard through the typed boundary") {
    val badRow = Seq(VectorRecord(999999L, Seq(1.0, 2.0))).toDS()
    val ex = intercept[Exception] {
      typed.insert(badRow).ds.count()
    }
    assert(ex.getMessage.contains("dimension mismatch"))
  }

  test("typed normalized vectors have unit norm") {
    val norms = typed.normalized.ds.limit(20).collect()
      .map(r => math.sqrt(r.embedding.map(x => x * x).sum))
    norms.foreach(n => assert(math.abs(n - 1.0) < 1e-9, s"norm $n"))
  }
}
