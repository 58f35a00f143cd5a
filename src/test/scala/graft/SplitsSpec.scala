package graft

import org.apache.spark.sql.functions._

import graft.operators.Splits

/** Deterministic splitting: full partition (every row exactly one
  * split), proportions near the weights, stability across partitioning
  * and runs, salt independence, and the nested-sample property. */
class SplitsSpec extends SparkSpec {

  private lazy val docs = Tables.documents(spark, Sf0001).cache()
  private val weights = Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1)

  test("every row lands in exactly one split, proportions near weights") {
    val counts = Splits.assignSplit(docs, "doc_id", "s", weights)
      .groupBy("split").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(counts.values.sum == docs.count())
    val n = docs.count().toDouble
    assert(math.abs(counts("train") / n - 0.8) < 0.08, s"train skew: $counts")
    assert(counts.keySet == Set("train", "val", "test"))
  }

  test("assignment is stable across repartitioning (no rand())") {
    def assign(df: org.apache.spark.sql.DataFrame) =
      Splits.assignSplit(df, "doc_id", "s", weights)
        .select("doc_id", "split").collect()
        .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(assign(docs) == assign(docs.repartition(13)))
  }

  test("different salts give (near-)independent assignments") {
    val a = Splits.assignSplit(docs, "doc_id", "s1", weights)
      .select(col("doc_id"), col("split").as("a"))
    val b = Splits.assignSplit(docs, "doc_id", "s2", weights)
      .select(col("doc_id"), col("split").as("b"))
    val agree = a.join(b, "doc_id").filter(col("a") === col("b")).count().toDouble
    val expected = 0.8 * 0.8 + 0.1 * 0.1 + 0.1 * 0.1 // = 0.66 if independent
    assert(math.abs(agree / docs.count() - expected) < 0.1,
      s"salt correlation suspicious: agreement ${agree / docs.count()}")
  }

  test("samples nest: the 5% sample is a subset of the 20% sample") {
    def ids(rate: Double) =
      Splits.sample(docs, "doc_id", "s", rate).select("doc_id")
        .collect().map(_.getLong(0)).toSet
    val s5 = ids(0.05)
    val s20 = ids(0.20)
    assert(s5.subsetOf(s20), s"nesting violated: ${(s5 -- s20).size} ids leak")
    assert(s5.nonEmpty && s20.size > s5.size)
  }

  test("k-fold assignment partitions rows, stays stable, and balances within 2x") {
    val emb = Tables.embeddings(spark, Sf0001).select("vec_id")
    def folds(df: org.apache.spark.sql.DataFrame) = df
      .select(col("vec_id"), (Splits.hashBucket(col("vec_id"), "fold") % 5).as("fold"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val a = folds(emb)
    assert(a == folds(emb.repartition(13)), "fold assignment not stable")
    assert(a.values.forall(f => f >= 0 && f < 5))
    val sizes = a.groupBy(_._2).values.map(_.size)
    assert(sizes.size == 5 && sizes.max <= 2 * sizes.min,
      s"fold imbalance: ${sizes.toSeq.sorted}")
  }
}
