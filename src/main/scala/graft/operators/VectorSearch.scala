package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.{Metric, VectorFunctions => VF}

/** Similarity search operators — the Spark-native form of the reference's
  * `search_vector` / `search_text` (api.py:105-168) and the batch
  * replacement for its HNSW ANN path (ann.py, dropped per BASELINE.json).
  *
  * Scale design:
  *  - [[topK]] plans as `TakeOrderedAndProject`: each partition keeps a
  *    local top-k, the driver merges k·numPartitions rows — no full sort,
  *    no full shuffle. This is the distributed analog of the reference's
  *    `np.argsort(-scores)[:k]` (api.py:139).
  *  - [[knnJoin]] normalizes each side ONCE per row (O(N·dim)) before the
  *    pairwise stage (O(N·M·dim)) — the norm never recomputes inside the
  *    pair loop. The small side is broadcast, so the only shuffle is the
  *    per-query-id window.
  *  - [[bucketedKnnJoin]] is the 100 TB path: deterministic sign-LSH
  *    (random-hyperplane) bucketing turns the all-pairs cross join into a
  *    per-bucket join, trading exactness for a ~2^bits reduction in pairs.
  *    Hyperplanes are arithmetic (no RNG) so the DuckDB oracle can replay
  *    them exactly.
  *
  * Determinism: every ordering ties-breaks on the id column
  * (SURVEY §2.4.2) — argsort on equal scores is arbitrary in the
  * reference too.
  */
object VectorSearch {

  /** Append a `score` column: every row of `data` scored against the single
    * row of `query` (columns `queryPrefix*`). Declarative cross-join against
    * a broadcast 1-row frame — no driver-side collect. Both sides are
    * metric-prepared (cosine → L2-normalized) once, outside the pair loop.
    */
  def scoreAgainst(
      data: DataFrame,
      vecCol: String,
      query: DataFrame,
      queryVecCol: String,
      metric: Metric): DataFrame = {
    val prepared = prepareColumn(data, vecCol, metric)
    val preparedQ = prepareColumn(query, queryVecCol, metric)
    prepared
      .crossJoin(broadcast(preparedQ))
      .withColumn("score",
        metric.scorePrenormalized(col(vecCol), col(queryVecCol)))
      .drop(queryVecCol)
  }

  /** Replace `vecCol` with its metric-prepared form, computing the norm as
    * its own column so it evaluates once per row, not once per element. */
  private def prepareColumn(df: DataFrame, vecCol: String, metric: Metric): DataFrame =
    metric match {
      case Metric.Cosine =>
        df.withColumn("__nrm", VF.l2Norm(col(vecCol)) + lit(VF.Eps))
          .withColumn(vecCol, VF.scaleBy(col(vecCol), col("__nrm")))
          .drop("__nrm")
      case _ => df
    }

  /** Top-k rows of `data` most similar to the 1-row `query` frame.
    * `orderBy(desc(score), id).limit(k)` → `TakeOrderedAndProject`.
    * k > N clamps naturally (reference api.py:121); empty input → empty
    * result (reference api.py:107-108). */
  def topK(
      data: DataFrame,
      vecCol: String,
      idCol: String,
      query: DataFrame,
      queryVecCol: String,
      metric: Metric,
      k: Int): DataFrame =
    scoreAgainst(data, vecCol, query, queryVecCol, metric)
      .orderBy(desc("score"), asc(idCol))
      .limit(k)

  /** Batch knn: for every row of `queries`, its top-k neighbors in `data`
    * (the at-scale form of per-query search; replaces the reference's HNSW
    * serving path). Output: one row per (query, neighbor) with `rank`.
    *
    * `data` is broadcast when small (dimension-table pattern); the
    * per-query top-k is a `row_number` window partitioned by the query id —
    * uniform key distribution, no salting needed. Self-matches
    * (same id on both sides) are excluded when `excludeSelf`.
    */
  def knnJoin(
      queries: DataFrame,
      data: DataFrame,
      vecCol: String,
      idCol: String,
      metric: Metric,
      k: Int,
      excludeSelf: Boolean = true,
      broadcastData: Boolean = true): DataFrame = {
    val q = prepareColumn(queries, vecCol, metric)
      .select(col(idCol).as("query_id"), col(vecCol).as("__qvec"))
    val d = prepareColumn(data, vecCol, metric)
      .select(col(idCol).as("neighbor_id"), col(vecCol).as("__dvec"))
    val dSide = if (broadcastData) broadcast(d) else d
    val pairs = q.crossJoin(dSide)
      .withColumn("score", metric.scorePrenormalized(col("__qvec"), col("__dvec")))
    val filtered =
      if (excludeSelf) pairs.filter(col("query_id") =!= col("neighbor_id"))
      else pairs
    val w = Window.partitionBy("query_id")
      .orderBy(desc("score"), asc("neighbor_id"))
    filtered
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("query_id", "neighbor_id", "score", "rank")
  }

  /** Deterministic sign-LSH bucket id over `bits` arithmetic hyperplanes.
    *
    * Hyperplane j (0-based), component i (0-based):
    * `h[j][i] = (((i+1) * (j+1) * 7919) mod 193) / 193.0 - 0.5`
    * — fixed pseudo-random-looking weights computable identically in any
    * SQL engine (no RNG, SURVEY §2.4). Bucket = Σ_j 2^j · [v·h_j > 0].
    */
  def lshBucket(vecCol: Column, dim: Int, bits: Int): Column = {
    val bitTerms: Seq[Column] = (0 until bits).map { j =>
      val proj: Column = (0 until dim).map { i =>
        val w = (((i + 1).toLong * (j + 1) * 7919L) % 193L).toDouble / 193.0 - 0.5
        element_at(vecCol, i + 1) * lit(w)
      }.reduce(_ + _)
      when(proj > lit(0.0), lit(1L << j)).otherwise(lit(0L))
    }
    bitTerms.reduce(_ + _).as("bucket")
  }

  /** Approximate knn join: pairs are only scored within the same LSH
    * bucket, turning O(N·M) pairs into O(N·M / 2^bits) expected — the
    * bucket equi-join shuffles both sides by bucket id instead of
    * broadcasting a cross product. Deterministic (arithmetic hyperplanes),
    * so exact-match verifiable against a SQL oracle replaying the same
    * bucketing. */
  def bucketedKnnJoin(
      queries: DataFrame,
      data: DataFrame,
      vecCol: String,
      idCol: String,
      metric: Metric,
      k: Int,
      dim: Int,
      bits: Int = 8,
      excludeSelf: Boolean = true): DataFrame = {
    val q = prepareColumn(queries, vecCol, metric)
      .select(col(idCol).as("query_id"), col(vecCol).as("__qvec"),
        lshBucket(col(vecCol), dim, bits).as("bucket"))
    val d = prepareColumn(data, vecCol, metric)
      .select(col(idCol).as("neighbor_id"), col(vecCol).as("__dvec"),
        lshBucket(col(vecCol), dim, bits).as("bucket"))
    val pairs = q.join(d, Seq("bucket"))
      .withColumn("score", metric.scorePrenormalized(col("__qvec"), col("__dvec")))
    val filtered =
      if (excludeSelf) pairs.filter(col("query_id") =!= col("neighbor_id"))
      else pairs
    val w = Window.partitionBy("query_id")
      .orderBy(desc("score"), asc("neighbor_id"))
    filtered
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("query_id", "neighbor_id", "score", "rank")
  }
}
