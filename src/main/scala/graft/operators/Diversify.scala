package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.Metric

/** Maximal-marginal-relevance diversification (Carbonell & Goldstein
  * 1998) — the standard serving-side answer to "the top-k are ten
  * copies of the same document": greedily pick the candidate
  * maximizing `λ·rel(c) − (1−λ)·max_{s∈selected} sim(c, s)`.
  *
  * Scale shape: retrieval (stage 1) is the distributed part — topK /
  * ANN cuts the corpus to N candidates. MMR itself is O(k·N) over
  * those N rows: a driver-side greedy over a dimension-sized frame (the
  * pqCodebooks/ivfCentroids collect contract — N is fixed by the
  * serving budget, independent of corpus size). The selection loop is
  * inherently sequential in k; distributing it would shuffle more than
  * it computes.
  *
  * Float parity: candidate relevances come off the Spark plan's codegen
  * kernels; pairwise sims fold in array order seeded 0.0 — the exact
  * kernel/oracle fold — and the MMR mix mirrors the oracle's
  * `λ·rel − (1−λ)·maxsim` operand order, so the greedy argmax (score
  * desc, id asc) is bit-deterministic cross-engine. */
object Diversify {

  /** Greedy MMR over collected candidates. `sims` must cover every
    * unordered candidate pair. Returns (id, mmrRank) in pick order. */
  def mmrGreedy(
      candidates: Seq[(Long, Double)], // (id, relevance), any order
      sims: Map[(Long, Long), Double],
      k: Int,
      lambda: Double): Seq[(Long, Long)] = {
    val rel = candidates.toMap
    val selected = scala.collection.mutable.ArrayBuffer[Long]()
    val remaining = scala.collection.mutable.SortedSet[Long]() ++ rel.keys
    while (selected.length < math.min(k, candidates.length)) {
      val pick =
        if (selected.isEmpty) remaining.minBy(id => (-rel(id), id))
        else remaining.minBy { id =>
          val maxSim = selected.map(s => sims(minMax(id, s))).max
          (-(lambda * rel(id) - (1.0 - lambda) * maxSim), id)
        }
      selected += pick
      remaining -= pick
    }
    selected.toSeq.zipWithIndex.map { case (id, i) => (id, (i + 1).toLong) }
  }

  private def minMax(a: Long, b: Long): (Long, Long) =
    if (a < b) (a, b) else (b, a)

  /** Retrieve-then-diversify: cosine top-`n` for the 1-row `query`
    * frame (distributed), then [[mmrGreedy]] down to `k`. Output:
    * `(idCol, rel DOUBLE, mmr_rank BIGINT)` in pick order. */
  def mmrSelect(
      spark: SparkSession,
      data: DataFrame,
      vecCol: String,
      idCol: String,
      query: DataFrame,
      queryVecCol: String,
      metric: Metric,
      n: Int,
      k: Int,
      lambda: Double): DataFrame = {
    val top = VectorSearch.topK(data, vecCol, idCol, query, queryVecCol, metric, n)
    val cands = top.select(col(idCol), col("score"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toSeq
    mmrOverCandidates(spark, data, vecCol, idCol, cands, metric, k, lambda)
  }

  /** MMR over an ALREADY-RETRIEVED candidate list (id, relevance) —
    * relevance may come from any upstream stage (cosine, BM25, a
    * reranker); pairwise sims come from `data`'s vectors. The serving
    * stack's final stage. Output: `(idCol, rel, mmr_rank)`. */
  def mmrOverCandidates(
      spark: SparkSession,
      data: DataFrame,
      vecCol: String,
      idCol: String,
      cands: Seq[(Long, Double)],
      metric: Metric,
      k: Int,
      lambda: Double): DataFrame = {
    val ids = cands.map(_._1)
    // normalized candidate vectors off the SAME kernel the oracle
    // mirrors; pairwise dots below fold in array order seeded 0.0
    val nvecs = data.filter(col(idCol).isin(ids: _*))
      .select(col(idCol), metric.prepare(col(vecCol)).as("nv"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Double](1).toArray).toMap
    val sims = (for {
      i <- ids; j <- ids if i < j
    } yield {
      val (a, b) = (nvecs(i), nvecs(j))
      var s = 0.0
      var x = 0
      while (x < a.length) { s += a(x) * b(x); x += 1 }
      (i, j) -> s
    }).toMap
    val picked = mmrGreedy(cands, sims, k, lambda)
    val relOf = cands.toMap
    import spark.implicits._
    picked.map { case (id, r) => (id, relOf(id), r) }
      .toDF(idCol, "rel", "mmr_rank")
  }
}
