package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.Metric
import graft.operators.{Contrastive, VectorSearch}

/** One-off diagnostic for q_contrastive_pairs_scaled_2k — the 3rd-
  * heaviest r15 sweep row (117.0s at sf10) and the one expensive row
  * that never had an attribution pass (VERDICT r15 #5). Splits the
  * cost between (a) the anchors×corpus exact retrieval in BOTH
  * orientations — the default CartesianProduct (what the row runs
  * today) vs the broadcast-anchors BNLJ the recall rows use — and
  * (b) the candidate generation + anti-join tail, by timing the full
  * pipeline minus the ranked stage in each orientation. The stages
  * mirror [[Contrastive.minePairs]] exactly. */
object PairsDiag {
  private def force(df: DataFrame): Unit =
    df.queryExecution.toRdd.foreach(_ => ())

  private val only = sys.env.get("SPARK_GRAFT_DIAG_ONLY")
    .map(_.split(",").map(_.trim).toSeq)

  private def timed(name: String, runs: Int)(fn: => DataFrame): Unit = {
    if (!only.forall(_.exists(name.contains))) return
    force(fn) // warmup
    val ts = (1 to runs).map { _ =>
      val t0 = System.nanoTime()
      force(fn)
      (System.nanoTime() - t0) / 1e9
    }.sorted
    println(f"DIAG $name%-16s median=${ts(ts.length / 2)}%7.1fs runs=${ts.map(t => f"$t%.1f").mkString(",")}")
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

    val emb = Tables.embeddings(spark, sfDir).select("vec_id", "embedding")
    val n = emb.count()
    // the _2k bench point: ~2000 anchors (mod = scaledEvalMod / 2)
    val mod = math.max(20L, n / 1000L / 2L)
    println(s"DIAG n=$n mod=$mod anchors=${n / mod}")
    val anchorFilter = col("vec_id") % mod === 0

    // exact retrieval stage alone, both orientations
    timed("ranked_default", runs) {
      VectorSearch.knnJoin(emb.filter(anchorFilter), emb,
        "embedding", "vec_id", Metric.Cosine, k = 10, excludeSelf = true)
    }
    timed("ranked_bcast", runs) {
      VectorSearch.knnJoin(emb.filter(anchorFilter), emb,
        "embedding", "vec_id", Metric.Cosine, k = 10, excludeSelf = true,
        broadcastQueries = true)
    }
    // full pipeline, both orientations — (full − ranked) per orientation
    // is the candidate-generation + anti-join tail
    timed("full_default", runs) {
      Contrastive.minePairs(emb, "embedding", "vec_id", Metric.Cosine,
        anchorFilter = anchorFilter)
        .orderBy("anchor_id", "pair_type", "pair_rank")
    }
    timed("full_bcast", runs) {
      Contrastive.minePairs(emb, "embedding", "vec_id", Metric.Cosine,
        anchorFilter = anchorFilter, broadcastAnchors = true)
        .orderBy("anchor_id", "pair_type", "pair_rank")
    }
    spark.stop()
  }
}
