package graft.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftglue.ColumnGlue
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native text kernels for the corpus-filter hot loops.
  *
  * Why: the HOF formulation of the repetition metrics (bigram build →
  * `array_distinct` → `array_sort` + `aggregate` run-scan) is
  * CodegenFallback — every document allocates interpreted Catalyst
  * arrays and walks Column-tree lambdas per element. This kernel does
  * one pass over the string inside whole-stage codegen (~2.1s → ~0.6s
  * over sf0.1, the largest non-ANN bench head after the r3 minhash
  * fix). Token semantics are IDENTICAL to the HOF form it replaced:
  * tokens = `split(trim(text), " +")` (ASCII space runs only, empty
  * text → one empty token), bigrams = adjacent token pairs, top token
  * = max multiplicity.
  */
object TextExpressions {

  /** One-pass repetition counters. Returns (n_tokens, n_bigrams,
    * n_distinct_bigrams, top_token_n) — all LONG, never null for
    * non-null input. Runtime body of [[TextRepetitionStats]]; static so
    * generated code can call it directly. */
  def repStats(s: UTF8String): InternalRow = {
    // trim = ASCII-space trim, matching Spark's `trim` (StringTrim)
    val str = s.trim.toString
    // split on runs of ' ' exactly like Java regex " +" with limit -1:
    // empty string yields one empty token; no other whitespace splits
    val tokens = new java.util.ArrayList[String]()
    var start = 0
    var i = 0
    val len = str.length
    while (i < len) {
      if (str.charAt(i) == ' ') {
        tokens.add(str.substring(start, i))
        while (i < len && str.charAt(i) == ' ') i += 1
        start = i
      } else i += 1
    }
    tokens.add(str.substring(start, len))
    val n = tokens.size()

    val tokenCounts = new java.util.HashMap[String, Integer]()
    var topTokenN = 0L
    i = 0
    while (i < n) {
      val t = tokens.get(i)
      val c = tokenCounts.merge(t, 1, (a, b) => a + b)
      if (c > topTokenN) topTokenN = c.toLong
      i += 1
    }

    val nBigrams = if (n >= 2) (n - 1).toLong else 0L
    val distinctBigrams = new java.util.HashSet[String]()
    i = 1
    while (i < n) {
      distinctBigrams.add(tokens.get(i - 1) + " " + tokens.get(i))
      i += 1
    }
    new GenericInternalRow(Array[Any](
      n.toLong, nBigrams, distinctBigrams.size.toLong, topTokenN))
  }

  /** Struct-returning codegen expression over a STRING column: the
    * repetition counters behind `TextOps.repetitionMetrics` /
    * `q_repetition`. Codegen is a single static call — the loop lives
    * in [[repStats]], and the expression stays inside whole-stage
    * codegen (no CodegenFallback, no interpreted array churn). */
  case class TextRepetitionStats(child: Expression) extends UnaryExpression {
    override def checkInputDataTypes(): TypeCheckResult =
      if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
      else TypeCheckResult.TypeCheckFailure(
        s"$prettyName expects STRING, got ${child.dataType.catalogString}")
    override def dataType: DataType = StructType(Seq(
      StructField("n_tokens", LongType, nullable = false),
      StructField("n_bigrams", LongType, nullable = false),
      StructField("n_distinct_bigrams", LongType, nullable = false),
      StructField("top_token_n", LongType, nullable = false)))
    override def nullIntolerant: Boolean = true
    override def prettyName: String = "text_repetition_stats"

    override protected def nullSafeEval(a: Any): Any =
      repStats(a.asInstanceOf[UTF8String])

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev,
        c => s"graft.expressions.TextExpressions$$.MODULE$$.repStats($c)")

    override protected def withNewChildInternal(newChild: Expression): TextRepetitionStats =
      copy(child = newChild)
  }

  // ------------------------------------------------------ Column surface ---

  def repetitionStats(text: Column): Column =
    ColumnGlue.column(TextRepetitionStats(ColumnGlue.expression(text)))
}
