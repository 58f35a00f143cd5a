package graft

import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String

import graft.expressions.TextExpressions

/** The one-pass TextRepetitionStats codegen kernel vs an independent
  * regex-based Scala model (the semantics of the HOF form it replaced:
  * tokens = split(trim(text), " +") with limit -1). */
class TextRepetitionSpec extends SparkSpec {
  import spark.implicits._

  /** Independent model: Java regex split, Scala collections. */
  private def model(text: String): (Long, Long, Long, Long) = {
    val toks = text.trim.split(" +", -1).toSeq
    val n = toks.length
    val bigrams = if (n >= 2) toks.sliding(2).map(_.mkString(" ")).toSeq else Seq.empty
    val top = toks.groupBy(identity).values.map(_.size).max
    (n.toLong, bigrams.length.toLong, bigrams.distinct.length.toLong, top.toLong)
  }

  private val edgeCases = Seq(
    "", " ", "   ", "solo", " padded  with   runs ",
    "tab\tis not a separator", "line\nbreaks neither",
    "spam spam spam", "a b a b a b a", "ü ü é é é",
    "的 是 的 是 的")

  test("kernel matches the regex model on edge cases (codegen path)") {
    val df = edgeCases.toDF("text")
      .select(col("text"), TextExpressions.repetitionStats(col("text")).as("s"))
      .select(col("text"), col("s.n_tokens"), col("s.n_bigrams"),
        col("s.n_distinct_bigrams"), col("s.top_token_n"))
    df.collect().foreach { r =>
      val got = (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))
      assert(got === model(r.getString(0)), s"mismatch on '${r.getString(0)}'")
    }
  }

  test("kernel matches the regex model on the document fixture (both eval paths)") {
    val texts = spark.read.parquet(s"$Sf0001/documents.parquet")
      .select("text").as[String].collect()
    assert(texts.nonEmpty)
    texts.foreach { t =>
      // interpreted path (direct eval)
      val row = TextExpressions.repStats(UTF8String.fromString(t))
      val got = (row.getLong(0), row.getLong(1), row.getLong(2), row.getLong(3))
      assert(got === model(t), s"interpreted mismatch on doc: ${t.take(60)}")
    }
    // codegen path over the same corpus
    val viaDf = spark.read.parquet(s"$Sf0001/documents.parquet")
      .select(col("doc_id"), col("text"),
        TextExpressions.repetitionStats(col("text")).as("s"))
      .select(col("text"), col("s.n_tokens"), col("s.n_bigrams"),
        col("s.n_distinct_bigrams"), col("s.top_token_n"))
      .collect()
    viaDf.foreach { r =>
      val got = (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))
      assert(got === model(r.getString(0)))
    }
  }

  test("null text yields null struct (nullIntolerant)") {
    val df = Seq(Some("a b"), None).toDF("text")
      .select(TextExpressions.repetitionStats(col("text")).as("s"))
    val rows = df.collect()
    assert(!rows(0).isNullAt(0) && rows(1).isNullAt(0))
  }
}
