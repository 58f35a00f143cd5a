package graft

import graft.operators.{Budget, Curation, Layout, Splits, Temporal, TextOps}
import graft.syntax._

/** The fluent facade must be a zero-cost delegation: identical analyzed
  * plans to the explicit operator calls (no extra nodes, no lambdas). */
class SyntaxSpec extends SparkSpec {

  private lazy val docs = Tables.documents(spark, Sf0001)

  private def samePlan(a: org.apache.spark.sql.DataFrame,
      b: org.apache.spark.sql.DataFrame): Boolean =
    a.queryExecution.analyzed.sameResult(b.queryExecution.analyzed)

  test("syntax methods produce the same analyzed plan as the explicit calls") {
    assert(samePlan(docs.dedupedExact(),
      TextOps.dedupExact(docs, "doc_id", "text")))
    assert(samePlan(docs.segmentDeduped(30),
      TextOps.segmentDedup(docs, "doc_id", "text", 30)))
    assert(samePlan(docs.quotaSampled("source", "s", 10),
      Splits.quotaSample(docs, "doc_id", "source", "s", 10)))
    assert(samePlan(docs.vocabTop(5),
      TextOps.vocabTopK(docs, "doc_id", "text", 5)))
    val events = Tables.events(spark, Sf0001)
    assert(samePlan(events.retention(8),
      Temporal.retentionCohorts(events, "user_id", "ts", 8)))
    val orders = Tables.orders(spark, Sf0001)
    assert(samePlan(orders.zorderLayout("o_orderkey", "o_custkey"),
      Layout.zorderStats(orders, "o_orderkey", "o_custkey", 16)))
    assert(samePlan(docs.reservoirSampled("lang", "s", 5),
      Splits.reservoirSample(docs, "doc_id", "lang", "s", 5)))
    assert(samePlan(docs.boilerplateScrubbed(30, 3),
      TextOps.scrubFrequentSegments(docs, "doc_id", "text", 30, 3)))
    assert(samePlan(docs.featureHashed(64),
      TextOps.featureHash(docs, "doc_id", "text", 64)))
    assert(samePlan(docs.qualityScored(64),
      TextOps.hashedLinearScore(docs, "doc_id", "text", 64)))
    assert(samePlan(docs.groupTop("lang", "n_chars", "doc_id", 5),
      Temporal.groupTopK(docs, "lang", "n_chars", "doc_id", 5)))
    // budgetCapped/shardAssigned delegate through withBucketBounds,
    // whose bounds localCheckpoint (r9) mints a fresh RDD per
    // invocation — plans are never sameResult across calls, so the
    // delegation is asserted by execution (the perplexityBucketed rule)
    assert(docs.budgetCapped(Seq("source"), "doc_id", "n_chars", 5000)
      .orderBy("doc_id").collect().toSeq ==
      Budget.domainBudget(docs, Seq("source"), "doc_id", "n_chars", 5000, 1L << 16)
        .orderBy("doc_id").collect().toSeq)
    assert(docs.shardAssigned("doc_id", "n_chars", 1L << 13)
      .orderBy("doc_id").collect().toSeq ==
      Budget.shardAssign(docs, "doc_id", "n_chars", 1L << 13, 1L << 16)
        .orderBy("doc_id").collect().toSeq)
    assert(samePlan(docs.bpeMergeCandidates(20),
      TextOps.bpeMergeCandidates(docs, "text", 20)))
    assert(samePlan(docs.pmiCollocations(5L, 20),
      TextOps.pmiBigrams(docs, "text", 5L, 20)))
    import org.apache.spark.sql.functions.col
    val stages = Seq("min_chars" -> (col("n_chars") >= 100))
    assert(samePlan(docs.funnelReported(stages),
      Curation.funnelReport(docs, stages)))
    // perplexityBucketed delegates through lmScore, whose localCheckpoint
    // mints a fresh RDD per invocation — plans are never sameResult
    // across calls, so the delegation is asserted by execution instead
    assert(docs.perplexityBucketed().collect().toSeq ==
      Curation.perplexityBuckets(docs, "doc_id", "text", "lang", 3).collect().toSeq)
    val target = docs.filter(col("doc_id") % 10 === 7)
    assert(samePlan(docs.dsirWeighted(target, 64),
      Curation.dsirWeights(docs, target, "doc_id", "text", 64)))
  }

  test("a chained pipeline composes and runs") {
    val out = docs
      .qualityFiltered()
      .segmentDeduped(30)
      .count()
    assert(out > 0)
  }

  test("a classifier-gated sampling pipeline composes and runs") {
    import org.apache.spark.sql.functions.col
    val kept = docs
      .join(docs.qualityScored(64).filter(col("label") === 1).select("doc_id"), "doc_id")
      .reservoirSampled("lang", "panel", 5)
      .boilerplateScrubbed(30, 3)
    assert(kept.count() > 0)
  }
}
