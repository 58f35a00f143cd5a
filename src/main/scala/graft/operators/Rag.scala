package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.{VectorTable, VectorTableConfig}
import graft.functions.{Metric, VectorFunctions => VF}

/** RAG retrieve-and-assemble — the Spark-native form of the reference's
  * `answer_query` (rag.py:67-97): top-k chunks for a query, their texts
  * joined with `"\n---\n"` in score order, wrapped in the placeholder
  * answer template (rag.py:87-90).
  *
  * Determinism: the context join is order-sensitive, and `collect_list`
  * alone has no ordering guarantee after a shuffle — so the texts ride in
  * a `sort_array(collect_list(struct(-score, id, text)))`, giving exactly
  * the oracle's `string_agg(... ORDER BY score DESC, id)` order
  * (SURVEY §7.4.2). The aggregate runs over k rows (k tiny), so the
  * single-group agg is not a scale concern.
  */
object Rag {

  /** The reference's answer template prefix (rag.py:87-90). */
  val AnswerPrefix = "This is a placeholder answer. Relevant context:\n"

  /** The reference's context separator (rag.py:86). */
  val Separator = "\n---\n"

  /** O18 RAG index build (`build_rag_index`, rag.py:27-52): chunk every
    * document, embed each chunk deterministically (the SURVEY §2.4.3
    * stand-in for a model), and materialize a chunk-level [[VectorTable]]
    * carrying the reference's `doc_index`/`chunk_index` metadata. Chunk
    * ids are `doc_id·10⁴ + chunk_index` — deterministic, unlike the
    * reference's uuid4 (storage.py:17), so the table is oracle-safe.
    * One narrow pipeline: chunk explode → embed projection; no shuffle. */
  def buildIndex(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      chunkSize: Int = 300,
      dim: Int = 64): VectorTable = {
    val chunks = TextOps.chunkDocuments(docs, idCol, textCol, chunkSize)
      .select(
        (col(idCol) * 10000 + col("chunk_index")).as("vec_id"),
        col(idCol).as("doc_index"),
        col("chunk_index"),
        col("chunk_text").as("text"))
      .withColumn("embedding", VF.arithmeticEmbedding(col("text"), dim))
    VectorTable(chunks, VectorTableConfig(dim = dim, metric = "cosine"))
  }

  /** Top-k rows of `docs` (columns: idCol, textCol, vecCol) most similar
    * to the 1-row `query` frame (columns: queryVecCol), assembled into a
    * single row `(context STRING, answer STRING)`. */
  def answerQuery(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      vecCol: String,
      query: DataFrame,
      queryVecCol: String,
      metric: Metric,
      topK: Int): DataFrame = {
    val top = VectorSearch.topK(docs, vecCol, idCol, query, queryVecCol, metric, topK)
    assemble(top, idCol, textCol)
  }

  /** The reference's actual `answer_query` shape (rag.py:67-97): retrieve
    * over the CHUNK-level index built by [[buildIndex]] — embed the query
    * text, top-k chunks, assemble their texts in score order. The doc-level
    * [[answerQuery]] is the coarse variant; this is the end-to-end
    * chunk-granular path a reference user runs. */
  def answerFromIndex(
      spark: org.apache.spark.sql.SparkSession,
      index: VectorTable,
      textCol: String,
      queryText: String,
      topK: Int): DataFrame =
    assemble(index.searchText(spark, queryText, topK), index.config.idCol, textCol)

  /** Score-ordered context assembly shared by both retrieve paths: texts
    * ride in a `sort_array(collect_list(struct(-score, id, text)))` so the
    * join order is deterministic after the shuffle (see class doc). */
  private def assemble(top: DataFrame, idCol: String, textCol: String): DataFrame = {
    val ordered = sort_array(collect_list(struct(
      negate(col("score")).as("neg_score"),
      col(idCol).as("id"),
      col(textCol).as("text"))))
    top
      .agg(concat_ws(Separator, transform(ordered, c => c.getField("text"))).as("context"))
      .withColumn("answer", concat(lit(AnswerPrefix), col("context")))
  }
}
