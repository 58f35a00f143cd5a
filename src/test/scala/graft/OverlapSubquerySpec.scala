package graft

import org.apache.spark.sql.execution.ExplainMode
import org.apache.spark.sql.functions._

import graft.operators.Temporal

/** The prune-cost claim in ExpandOverlapJoin's scaladoc: the hull-bounds
  * filter and the bucket-bloom filter read the SAME scalar subquery
  * instance, so the interval-stats aggregate runs ONCE (ReuseSubquery),
  * not once per predicate. */
class OverlapSubquerySpec extends SparkSpec {

  test("both prune predicates share one interval-stats subquery (ReuseSubquery)") {
    val l = spark.range(0, 1000).select(
      (col("id") * 3).as("a_lo"), (col("id") * 3 + 2).as("a_hi"), col("id").as("aid"))
    val r = spark.range(0, 50).select(
      (col("id") * 60).as("b_lo"), (col("id") * 60 + 10).as("b_hi"), col("id").as("bid"))
    val df = Temporal.overlapJoin(l, "a_lo", "a_hi", r, "b_lo", "b_hi", 64)
    df.collect()
    val plan = df.queryExecution.explainString(ExplainMode.fromString("formatted"))
    // the executed plan must carry exactly ONE materialized subquery for
    // the interval stats; the second consumer shows as a reuse, not a
    // second aggregate job
    val subqueryCount = "(?m)^Subquery".r.findAllIn(plan).length
    val reuse = plan.contains("ReusedSubquery") ||
      "Subquery:.*\\[subquery#".r.findAllIn(plan).length == 1
    assert(plan.contains("might_contain"), plan)
    withClue(plan.linesIterator.filter(_.contains("Subquery")).mkString("\n")) {
      assert(subqueryCount <= 1 || plan.contains("ReusedSubquery"))
    }
    assert(reuse || subqueryCount <= 1)
  }
}
