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

  test("reservoirSample: exactly min(n, group size) rows per group, ranks contiguous") {
    val n = 20
    val sampled = Splits.reservoirSample(docs, "doc_id", "lang", "panel", n)
    val perGroup = sampled.groupBy("lang").agg(
        count(lit(1)).as("kept"), max("sample_rank").as("max_rk"),
        min("sample_rank").as("min_rk"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val sizes = docs.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(perGroup.length == sizes.size, "a group vanished")
    perGroup.foreach { case (lang, kept, maxRk, minRk) =>
      assert(kept == math.min(n.toLong, sizes(lang)), s"$lang kept $kept")
      assert(minRk == 1L && maxRk == kept, s"$lang ranks not 1..$kept")
    }
    // n above every group size degrades to a full passthrough with ranks
    val all = Splits.reservoirSample(docs, "doc_id", "lang", "panel", 100000)
    assert(all.count() == docs.count())
  }

  test("reservoirSample: samples nest and survive repartitioning") {
    def ids(df: org.apache.spark.sql.DataFrame, n: Int) =
      Splits.reservoirSample(df, "doc_id", "lang", "panel", n)
        .select("doc_id").collect().map(_.getLong(0)).toSet
    val s10 = ids(docs, 10)
    val s25 = ids(docs, 25)
    assert(s10.subsetOf(s25), s"nesting violated: ${(s10 -- s25).size} ids leak")
    assert(ids(docs.repartition(13), 10) == s10, "sample not partition-stable")
  }

  test("reservoirAppend equals a full recompute at any split point (mergeability)") {
    def full = Splits.reservoirSample(docs, "doc_id", "lang", "panel", 15)
      .select("doc_id", "lang", "sample_rank").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
    for (split <- Seq(1L, 100L, 499L)) {
      val base = Splits.reservoirSample(
        docs.filter(col("doc_id") < split), "doc_id", "lang", "panel", 15)
      val got = Splits.reservoirAppend(base,
          docs.filter(col("doc_id") >= split), "doc_id", "lang", "panel", 15)
        .select("doc_id", "lang", "sample_rank").collect()
        .map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
      assert(got == full, s"incremental != full at split $split")
    }
  }

  test("reservoirAppend survives a parquet round-trip of the persisted sample") {
    val dir = java.nio.file.Files.createTempDirectory("rs_panel").toString
    Splits.reservoirSample(docs.filter(col("doc_id") < 250), "doc_id", "lang", "panel", 15)
      .write.mode("overwrite").parquet(dir)
    val got = Splits.reservoirAppend(spark.read.parquet(dir),
        docs.filter(col("doc_id") >= 250), "doc_id", "lang", "panel", 15)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val full = Splits.reservoirSample(docs, "doc_id", "lang", "panel", 15)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(got == full)
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
