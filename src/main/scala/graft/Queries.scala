package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.{Metric, VectorFunctions => VF}
import graft.operators.VectorSearch

/** One declared, oracle-checked query. `oracle` is ANSI-ish SQL DuckDB runs
  * on the same parquet tables; None → driver records a weaker rows-only
  * check (reserved for genuinely non-SQL-expressible ops). */
final case class GraftQuery(
    name: String,
    run: (SparkSession, String) => DataFrame,
    oracle: Option[String])

/** The declared query inventory (SURVEY §2.3) — the unit of the driver's
  * DuckDB-oracle correctness gate. Every query is deterministic: literal
  * (non-random) query vectors, total-order tie-breakers on every ordered
  * op, and arithmetic identical to its oracle SQL (SURVEY §2.4).
  */
object Queries {
  import Tables.EmbeddingDim

  private val K = 10

  /** Query vector = the embedding of vec_id 0, as a broadcast 1-row frame
    * (self-join style — deterministic, SURVEY §2.3). */
  private def queryVecFrame(spark: SparkSession, dir: String): DataFrame =
    Tables.embeddings(spark, dir)
      .filter(col("vec_id") === 0)
      .select(col("embedding").as("qvec"))

  // ---------------------------------------------------------------- knn ---

  /** O9+O5: top-10 by cosine similarity vs the vec_id=0 embedding. */
  private def qKnnCosine(s: SparkSession, dir: String): DataFrame =
    VectorSearch.topK(
      Tables.embeddings(s, dir).select("vec_id", "embedding"),
      "embedding", "vec_id",
      queryVecFrame(s, dir), "qvec", Metric.Cosine, K)
      .select("vec_id", "score")

  private val qKnnCosineSql: String = {
    val score = Oracle.dot("n.nemb", "q.qemb", EmbeddingDim)
    s"""WITH ${Oracle.embeddingsCte},
       |${Oracle.normalizedCte},
       |q AS (SELECT nemb AS qemb FROM n WHERE vec_id = 0)
       |SELECT n.vec_id AS vec_id, $score AS score
       |FROM n CROSS JOIN q
       |ORDER BY score DESC, vec_id ASC LIMIT $K""".stripMargin
  }

  /** O9+O6: top-10 by raw dot product. */
  private def qKnnDot(s: SparkSession, dir: String): DataFrame =
    VectorSearch.topK(
      Tables.embeddings(s, dir).select("vec_id", "embedding"),
      "embedding", "vec_id",
      queryVecFrame(s, dir), "qvec", Metric.Dot, K)
      .select("vec_id", "score")

  private val qKnnDotSql: String = {
    val score = Oracle.dot("e.emb", "q.qemb", EmbeddingDim)
    s"""WITH ${Oracle.embeddingsCte},
       |q AS (SELECT emb AS qemb FROM e WHERE vec_id = 0)
       |SELECT e.vec_id AS vec_id, $score AS score
       |FROM e CROSS JOIN q
       |ORDER BY score DESC, vec_id ASC LIMIT $K""".stripMargin
  }

  /** O9+O7+O8: top-10 by euclidean similarity `1/(1+d)`. */
  private def qKnnEuclid(s: SparkSession, dir: String): DataFrame =
    VectorSearch.topK(
      Tables.embeddings(s, dir).select("vec_id", "embedding"),
      "embedding", "vec_id",
      queryVecFrame(s, dir), "qvec", Metric.Euclidean, K)
      .select("vec_id", "score")

  private val qKnnEuclidSql: String = {
    val score = Oracle.euclideanSimilarity("e.emb", "q.qemb", EmbeddingDim)
    s"""WITH ${Oracle.embeddingsCte},
       |q AS (SELECT emb AS qemb FROM e WHERE vec_id = 0)
       |SELECT e.vec_id AS vec_id, $score AS score
       |FROM e CROSS JOIN q
       |ORDER BY score DESC, vec_id ASC LIMIT $K""".stripMargin
  }

  /** O9 + metadata predicate (extension — the reference has no filters):
    * cosine top-10 restricted to label = 3. The `label = 3` predicate
    * pushes down to the parquet scan (PushedFilters), shrinking the scored
    * set before any vector math runs. */
  private def qFilterSearch(s: SparkSession, dir: String): DataFrame =
    VectorSearch.topK(
      Tables.embeddings(s, dir).filter(col("label") === 3)
        .select("vec_id", "embedding"),
      "embedding", "vec_id",
      queryVecFrame(s, dir), "qvec", Metric.Cosine, K)
      .select("vec_id", "score")

  private val qFilterSearchSql: String = {
    val score = Oracle.dot("n.nemb", "q.qemb", EmbeddingDim)
    s"""WITH ${Oracle.embeddingsCte},
       |${Oracle.normalizedCte},
       |q AS (SELECT nemb AS qemb FROM n WHERE vec_id = 0)
       |SELECT n.vec_id AS vec_id, $score AS score
       |FROM n CROSS JOIN q
       |WHERE n.label = 3
       |ORDER BY score DESC, vec_id ASC LIMIT $K""".stripMargin
  }

  // ---------------------------------------------------------- normalize ---

  /** O4: eps-guarded L2 normalization of every embedding. */
  private def qNormalize(s: SparkSession, dir: String): DataFrame =
    Tables.embeddings(s, dir)
      .withColumn("__nrm", VF.l2Norm(col("embedding")) + lit(VF.Eps))
      .select(col("vec_id"),
        VF.scaleBy(col("embedding"), col("__nrm")).as("normalized"))
      .orderBy("vec_id")

  private val qNormalizeSql: String =
    s"""WITH ${Oracle.embeddingsCte}
       |SELECT vec_id, ${Oracle.l2Normalize("emb")} AS normalized
       |FROM e ORDER BY vec_id""".stripMargin

  // ----------------------------------------------------------- registry ---

  val all: Seq[GraftQuery] = Seq(
    GraftQuery("q_knn_cosine", qKnnCosine, Some(qKnnCosineSql)),
    GraftQuery("q_knn_dot", qKnnDot, Some(qKnnDotSql)),
    GraftQuery("q_knn_euclid", qKnnEuclid, Some(qKnnEuclidSql)),
    GraftQuery("q_filter_search", qFilterSearch, Some(qFilterSearchSql)),
    GraftQuery("q_normalize", qNormalize, Some(qNormalizeSql)),
  )

  def queries: Map[String, (SparkSession, String) => DataFrame] =
    all.map(q => q.name -> q.run).toMap

  def oracleSql: Map[String, String] =
    all.flatMap(q => q.oracle.map(q.name -> _)).toMap
}
