package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.{Splits, TextOps, Web}

/** One-off diagnostic for q_pipeline_e2e — the one top-10 sf10 row
  * (39.7s r16, +6.5 round-over-round; 5.7s = slowest sf0.1 row) never
  * given an attribution pass (VERDICT r16 #6). The row composes six
  * operator families (URL gate → quality → exact dedup → split → BPE
  * learn on train → BPE fertility), each certified alone elsewhere;
  * this main times the CUMULATIVE prefixes of exactly that composition
  * (the [[PairsDiag]] methodology), so consecutive deltas attribute the
  * row's cost to one stage without changing any plan — Catalyst sees
  * the identical subtree a prefix shares with the full row. */
object PipelineDiag {
  private def force(df: DataFrame): Unit =
    df.queryExecution.toRdd.foreach(_ => ())

  private def timed(name: String, runs: Int)(fn: => DataFrame): Double = {
    force(fn) // warmup
    val ts = (1 to runs).map { _ =>
      val t0 = System.nanoTime()
      force(fn)
      (System.nanoTime() - t0) / 1e9
    }.sorted
    val med = ts(ts.length / 2)
    println(f"DIAG $name%-14s median=$med%7.1fs runs=${ts.map(t => f"$t%.1f").mkString(",")}")
    med
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val runs = sys.env.getOrElse("SPARK_GRAFT_BENCH_RUNS", "3").toInt
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    // the exact qPipelineE2e stages, as cumulative prefixes
    def docs = Tables.documents(spark, sfDir)
      .withColumn("url", Queries.syntheticUrl(col("doc_id"), col("source")))
    def urlKept = Web.urlFilter(docs, "url", Queries.BlockedHosts)
    def kept = {
      val okIds = TextOps.qualityMetrics(urlKept, "doc_id", "text", "n_chars")
        .filter(col("quality_ok") === 1)
        .select("doc_id")
      urlKept.join(okIds, "doc_id")
    }
    def dd = TextOps.dedupExact(kept, "doc_id", "text")
    def lab = Splits.assignSplit(dd, "doc_id", Queries.SplitSalt,
      Queries.SplitWeights)
    def mergesOf(l: DataFrame) = TextOps.bpeLearnMerges(
      l.filter(col("split") === "train"), "text", Queries.BpeMerges)
    def full = {
      val l = lab
      TextOps.tokenizerFertilityBpe(
        l.withColumn("cohort", concat_ws(":", col("split"), col("lang"))),
        "cohort", "text", "n_chars", mergesOf(l))
    }

    val t1 = timed("p1_url", runs)(urlKept)
    val t2 = timed("p2_quality", runs)(kept)
    val t3 = timed("p3_dedup", runs)(dd)
    val t4 = timed("p4_split", runs)(lab)
    // BPE learn is a driver-side loop of BpeMerges jobs over the train
    // split — time the prefix through the learned merges by forcing the
    // split frame after the merges are learned (the merges themselves
    // are a local Seq, so "forcing" them IS the loop)
    val t5 = timed("p5_bpe_learn", runs) { mergesOf(lab); lab }
    val t6 = timed("p6_fertility", runs)(full)
    println(f"DIAG deltas url=$t1%.1f quality=${t2 - t1}%.1f " +
      f"dedup=${t3 - t2}%.1f split=${t4 - t3}%.1f " +
      f"bpe_learn=${t5 - t4}%.1f fertility=${t6 - t5}%.1f total=$t6%.1f")
    spark.stop()
  }
}
