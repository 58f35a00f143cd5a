package graft

import org.apache.spark.sql.SparkSession

/** The SQL registration surface: kernels callable from spark.sql, results
  * identical to the Column API, arity errors rejected. */
class SqlFunctionsSpec extends SparkSpec {

  private lazy val registered: SparkSession = {
    GraftFunctions.register(spark)
    Tables.embeddings(spark, Sf0001).createOrReplaceTempView("emb")
    spark
  }

  test("vec_cosine from SQL == Column API, including codegen kernels") {
    val viaSql = registered.sql(
      """SELECT e.vec_id,
        |       vec_cosine(e.embedding, q.embedding) AS score
        |FROM emb e CROSS JOIN (SELECT embedding FROM emb WHERE vec_id = 0) q
        |ORDER BY score DESC, vec_id LIMIT 5""".stripMargin)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    import org.apache.spark.sql.functions._
    val emb = Tables.embeddings(spark, Sf0001)
    val q = emb.filter(col("vec_id") === 0).select(col("embedding").as("qvec"))
    val viaCols = emb.crossJoin(broadcast(q))
      .select(col("vec_id"),
        graft.functions.VectorFunctions.cosine(col("embedding"), col("qvec")).as("s"))
      .orderBy(desc("s"), asc("vec_id")).limit(5)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(viaSql == viaCols)
  }

  test("vec_l2_normalize + vec_dot from SQL: self-cosine == 1") {
    val bad = registered.sql(
      """SELECT vec_id,
        |       vec_dot(vec_l2_normalize(embedding), vec_l2_normalize(embedding)) AS s
        |FROM emb""".stripMargin)
      .filter("abs(s - 1.0) > 1e-9").count()
    assert(bad == 0)
  }

  test("wrong arity is rejected with the function name") {
    val ex = intercept[Exception](
      registered.sql("SELECT vec_dot(embedding) FROM emb").collect())
    assert(ex.getMessage.contains("vec_dot"))
  }

  test("text_repetition_stats from SQL returns the kernel's struct") {
    val r = registered.sql(
      """SELECT s.n_tokens, s.n_bigrams, s.n_distinct_bigrams, s.top_token_n
        |FROM (SELECT text_repetition_stats('spam spam spam') AS s)""".stripMargin)
      .collect()(0)
    assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)) ===
      ((3L, 2L, 1L, 3L)))
  }

  test("platform_ln from SQL is the libm-parity kernel, not StrictMath") {
    // df=394 BM25 idf argument: the one measured input where
    // Math.log (libm-matching) and StrictMath.log differ by 1 ULP
    val arg = ((500.0 - 394) + 0.5) / (394 + 0.5) + 1.0
    val got = registered.sql(s"SELECT platform_ln(CAST($arg AS DOUBLE)) AS v")
      .collect()(0).getDouble(0)
    assert(java.lang.Double.doubleToLongBits(got) ==
      java.lang.Double.doubleToLongBits(java.lang.Math.log(arg)))
    assert(java.lang.Double.doubleToLongBits(got) !=
      java.lang.Double.doubleToLongBits(java.lang.StrictMath.log(arg)),
      "probe input no longer distinguishes the two logs — pick another")
  }
}
