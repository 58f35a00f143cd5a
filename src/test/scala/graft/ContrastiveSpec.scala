package graft

import org.apache.spark.sql.functions._

import graft.functions.Metric
import graft.operators.{Contrastive, VectorSearch}

/** Contrastive pair mining: region correctness vs the exact knn join,
  * collision filtering, and partition invariance. */
class ContrastiveSpec extends SparkSpec {

  private lazy val emb =
    Tables.embeddings(spark, Sf0001).select("vec_id", "embedding").cache()

  private def mine(df: org.apache.spark.sql.DataFrame) =
    Contrastive.minePairs(df, "embedding", "vec_id", Metric.Cosine,
      anchorFilter = col("vec_id") % 10 === 0,
      nPos = 1, hardStart = 6, nHard = 5, nRandom = 5)

  test("positives and hard negatives are exactly knn ranks 1 and 6-10") {
    val ranked = VectorSearch.knnJoin(
      emb.filter(col("vec_id") % 10 === 0), emb,
      "embedding", "vec_id", Metric.Cosine, k = 10, excludeSelf = true)
      .select("query_id", "neighbor_id", "rank")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val expect = ranked.collect {
      case (a, o, 1L) => (a, o, "positive", 1L)
      case (a, o, r) if r >= 6 => (a, o, "hard_negative", r - 5)
    }.toSet
    val got = mine(emb).filter(col("pair_type") =!= "random_negative")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getLong(3))).toSet
    assert(got == expect)
  }

  test("random negatives: in range, never the anchor or its positive, <= 5 per anchor") {
    val n = emb.count()
    val rows = mine(emb).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getLong(3)))
    val pos = rows.collect { case (a, o, "positive", _) => a -> o }.toMap
    val rnd = rows.filter(_._3 == "random_negative")
    assert(rnd.nonEmpty)
    rnd.foreach { case (a, o, _, j) =>
      assert(o >= 0 && o < n, s"random id $o outside [0, $n)")
      assert(o != a, s"anchor $a sampled itself")
      assert(o != pos(a), s"anchor $a sampled its positive")
      assert(j >= 1 && j <= 5)
    }
    val perAnchor = rnd.groupBy(_._1).values.map(_.size)
    assert(perAnchor.forall(_ <= 5))
  }

  test("nPos > 1: no random negative collides with ANY positive rank") {
    val rows = Contrastive.minePairs(emb, "embedding", "vec_id", Metric.Cosine,
      anchorFilter = col("vec_id") % 10 === 0,
      nPos = 3, hardStart = 6, nHard = 5, nRandom = 50)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
    val pos = rows.collect { case (a, o, "positive") => (a, o) }.toSet
    assert(pos.nonEmpty)
    val clash = rows.collect { case (a, o, "random_negative") if pos((a, o)) => (a, o) }
    assert(clash.isEmpty,
      s"random negatives re-emitted positive pairs (mislabeled): ${clash.take(5).toSeq}")
  }

  test("mining is invariant to input partitioning") {
    val a = mine(emb).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getLong(3))).toSet
    val b = mine(emb.repartition(13)).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getLong(3))).toSet
    assert(a == b)
  }
}
