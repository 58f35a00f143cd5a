package graft

import java.security.MessageDigest

import org.apache.spark.sql.functions._

import graft.operators.{Lexical, Rerank}

/** Two-stage retrieve-then-rerank: candidate-bounded scoring, stub
  * scorer model parity, and the broadcast-candidate plan shape. */
class RerankSpec extends SparkSpec {

  private val Terms = Seq("spark", "join", "window")
  private val Query = "spark window join"
  private lazy val docs = Tables.documents(spark, Sf0001).cache()

  /** JVM model of [[Rerank.crossEncoderScore]]. */
  private def ceModel(query: String, text: String): Double = {
    val hex = MessageDigest.getInstance("MD5")
      .digest((query + "\u0001" + text).getBytes("UTF-8"))
      .map("%02x".format(_)).mkString.take(15)
    java.lang.Long.parseLong(hex, 16).toDouble / 1152921504606846976.0
  }

  test("reranked top-k is a subset of the stage-1 candidate set") {
    val candIds = Lexical.bm25TopK(docs, "doc_id", "text", Terms, 50)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val got = Rerank.bm25ThenRerank(docs, "doc_id", "text", Terms, Query,
      n = 50, k = 10).collect()
    assert(got.length == 10)
    assert(got.map(_.getLong(0)).toSet.subsetOf(candIds),
      "reranker returned a document stage 1 never surfaced")
    // stage-1 ranks must point back into [1, 50]
    assert(got.map(_.getLong(1)).forall(r => r >= 1 && r <= 50))
  }

  test("cross-encoder stub matches the JVM model and stays in [0,1)") {
    val rows = docs.limit(20)
      .select(col("doc_id"), col("text"),
        Rerank.crossEncoderScore(lit(Query), col("text")).as("s"))
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val expect = ceModel(Query, r.getString(1))
      val got = r.getDouble(2)
      assert(got == expect, s"doc ${r.getLong(0)}: $got != $expect")
      assert(got >= 0.0 && got < 1.0)
    }
  }

  test("rerank order is ce-score descending, invariant to input partitioning") {
    val a = Rerank.bm25ThenRerank(docs, "doc_id", "text", Terms, Query, 50, 10)
      .collect().map(r => (r.getLong(0), r.getDouble(2))).toSeq
    val b = Rerank.bm25ThenRerank(docs.repartition(13), "doc_id", "text",
      Terms, Query, 50, 10)
      .collect().map(r => (r.getLong(0), r.getDouble(2))).toSeq
    assert(a == b, "rerank result depends on input partitioning")
    assert(a.map(-_._2).sorted.map(x => -x) == a.map(_._2),
      "output not sorted by ce_score desc")
  }

  test("serving stack: each stage's winners are a subset of the previous stage's") {
    import graft.functions.Metric
    import graft.operators.{Diversify, VectorSearch}
    // stage 1: fused pool (vector + lexical top-20 ids)
    val emb = Tables.embeddings(spark, Sf0001).select("vec_id", "embedding")
    val qv = emb.filter(col("vec_id") === 0).select(col("embedding").as("qvec"))
    val vecIds = VectorSearch.topK(emb, "embedding", "vec_id", qv, "qvec",
      Metric.Cosine, 20).select("vec_id").collect().map(_.getLong(0)).toSet
    val lexIds = Lexical.bm25TopK(docs, "doc_id", "text", Terms, 20)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val pool = vecIds ++ lexIds
    // stage 2: rerank a rank-stamped pool subset
    val w = org.apache.spark.sql.expressions.Window.orderBy(col("doc_id"))
    val cands = docs.filter(col("doc_id").isin(pool.toSeq: _*))
      .select(col("doc_id"))
      .withColumn("stage1_rank", row_number().over(w).cast("long"))
    val reranked = Rerank.rerank(cands, docs, "doc_id", "text", Query, 10)
      .collect().map(r => r.getLong(0) -> r.getDouble(2))
    assert(reranked.map(_._1).toSet.subsetOf(pool))
    // stage 3: MMR over the reranked 10 picks a 5-subset, rank 1 = ce top-1
    val mmr = Diversify.mmrOverCandidates(spark, emb, "embedding", "vec_id",
      reranked.toSeq, Metric.Cosine, 5, 0.7)
      .collect().map(r => (r.getLong(0), r.getLong(2)))
    assert(mmr.map(_._1).toSet.subsetOf(reranked.map(_._1).toSet))
    assert(mmr.minBy(_._2)._1 == reranked.maxBy(_._2)._1)
  }

  test("candidate fetch joins broadcast (corpus never shuffles for 50 ids)") {
    val plan = Rerank.bm25ThenRerank(docs, "doc_id", "text", Terms, Query,
      50, 10).queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), plan)
  }
}
