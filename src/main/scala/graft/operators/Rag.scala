package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.Metric

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
    val ordered = sort_array(collect_list(struct(
      negate(col("score")).as("neg_score"),
      col(idCol).as("id"),
      col(textCol).as("text"))))
    top
      .agg(concat_ws(Separator, transform(ordered, c => c.getField("text"))).as("context"))
      .withColumn("answer", concat(lit(AnswerPrefix), col("context")))
  }
}
