package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.operators.{Budget, TextOps}

/** The two-level running-sum decomposition equals the naive window forms
  * exactly — grouped and global — plus the budget edge cases (budget
  * below the first row, budget covering everything) and the shard
  * contract (contiguous ranges, ≥ budget fill except the last shard). */
class BudgetSpec extends SparkSpec {

  private lazy val docs = Tables.documents(spark, Sf0001)
    .select(col("doc_id"), col("source"),
      TextOps.tokenCount(col("text")).as("w"))
    .cache()

  private def naiveCum(groups: Seq[String]): DataFrame = {
    val w = Window.partitionBy(groups.map(col): _*).orderBy(col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    docs.withColumn("cum", sum(col("w")).over(w))
  }

  private def asMap(df: DataFrame): Map[Long, Long] =
    df.select("doc_id", "cum").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("grouped runningSum equals the naive per-group window") {
    val got = Budget.runningSum(docs, Seq("source"), "doc_id", "w", 32L, "cum")
    assert(asMap(got) == asMap(naiveCum(Seq("source"))))
  }

  test("global runningSum equals the naive single-partition window") {
    val got = Budget.runningSum(docs, Seq.empty, "doc_id", "w", 64L, "cum")
    assert(asMap(got) == asMap(naiveCum(Seq.empty)))
  }

  test("runningSum is bucket-width invariant") {
    val a = asMap(Budget.runningSum(docs, Seq("source"), "doc_id", "w", 8L, "cum"))
    val b = asMap(Budget.runningSum(docs, Seq("source"), "doc_id", "w", 1024L, "cum"))
    assert(a == b)
  }

  test("domainBudget keeps exactly the naive windowed-filter rows") {
    for (budget <- Seq(0L, 30L, 700L, 1000000L)) {
      val naive = naiveCum(Seq("source")).filter(col("cum") <= budget)
        .select("doc_id").collect().map(_.getLong(0)).toSet
      val got = Budget.domainBudget(docs, Seq("source"), "doc_id", "w", budget, 32L)
        .select("doc_id").collect().map(_.getLong(0)).toSet
      assert(got == naive, s"budget=$budget: ${got.size} vs ${naive.size}")
    }
  }

  test("domainBudget with budget >= group totals is the identity (no window path)") {
    val got = Budget.domainBudget(docs, Seq("source"), "doc_id", "w", 1L << 40, 32L)
    assert(got.count() == docs.count())
    assert(got.columns.sorted.sameElements(docs.columns.sorted))
  }

  test("shardAssign: shards are contiguous id ranges, filled to >= budget except the last") {
    val shards = Budget.shardAssign(docs, "doc_id", "w", 1024L, 64L)
      .groupBy("shard")
      .agg(sum("w").as("tokens"), min("doc_id").as("lo"), max("doc_id").as("hi"))
      .orderBy("shard")
      .collect()
    // contiguity: each shard's id range starts after the previous one ends
    shards.sliding(2).foreach {
      case Array(a, b) => assert(a.getAs[Long]("hi") < b.getAs[Long]("lo"))
      case _           =>
    }
    // greedy fill: a non-last shard spans from its first doc's start to
    // the next shard's first start, so it can miss the budget only by
    // less than one doc on each side
    val maxW = docs.agg(max("w")).collect()(0).getLong(0)
    shards.init.foreach { r =>
      assert(r.getAs[Long]("tokens") >= 1024L - 2 * maxW,
        s"shard ${r.getAs[Long]("shard")} underfilled: ${r.getAs[Long]("tokens")}")
    }
    val total = docs.agg(sum("w")).collect()(0).getLong(0)
    assert(shards.map(_.getAs[Long]("tokens")).sum == total)
  }

  test("shardAssign equals the naive global-window shard formula") {
    val naive = naiveCum(Seq.empty)
      .withColumn("shard", shiftright(col("cum") - col("w"), 10))
      .select("doc_id", "shard").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val got = Budget.shardAssign(docs, "doc_id", "w", 1024L, 64L)
      .select("doc_id", "shard").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == naive)
  }

  test("non-power-of-two widths are rejected") {
    intercept[IllegalArgumentException] {
      Budget.runningSum(docs, Seq.empty, "doc_id", "w", 100L, "cum")
    }
    intercept[IllegalArgumentException] {
      Budget.shardAssign(docs, "doc_id", "w", 1000L, 64L)
    }
  }
}
