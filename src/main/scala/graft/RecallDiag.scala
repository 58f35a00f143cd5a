package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.Metric
import graft.operators.VectorSearch

/** One-off diagnostic for VERDICT r13 #5: where do
  * q_ann_recall_capped_scaled's engine seconds go at scale?
  * Times the row's three subplans separately (exact sample×corpus
  * ground truth, capped multiband ANN, the full recall join) with one
  * warmup pass each, median of `SPARK_GRAFT_BENCH_RUNS` (default 3). */
object RecallDiag {
  private def force(df: DataFrame): Unit =
    df.queryExecution.toRdd.foreach(_ => ())

  private def timed(name: String, runs: Int)(fn: => DataFrame): Unit = {
    force(fn) // warmup
    val ts = (1 to runs).map { _ =>
      val t0 = System.nanoTime()
      force(fn)
      (System.nanoTime() - t0) / 1e9
    }.sorted
    println(f"DIAG $name%-14s median=${ts(ts.length / 2)}%7.1fs runs=${ts.map(t => f"$t%.1f").mkString(",")}")
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
    val mod = Queries.scaledEvalMod(n)
    val bits = Queries.scaledLshBits(n)
    println(s"DIAG n=$n mod=$mod bits=$bits")
    val queries = emb.filter(col("vec_id") % mod === 0)

    timed("exact", runs) {
      VectorSearch.knnJoin(queries, emb, "embedding", "vec_id",
        Metric.Cosine, k = 5, excludeSelf = true)
    }
    timed("exact_bcast", runs) {
      // A/B: broadcast the corpus side (BroadcastNestedLoopJoin) vs the
      // default CartesianProduct — same pairs, same result, different
      // join operator and codegen boundary
      VectorSearch.knnJoin(queries, emb, "embedding", "vec_id",
        Metric.Cosine, k = 5, excludeSelf = true, broadcastData = true)
    }
    timed("ann_capped", runs) {
      VectorSearch.multibandKnnJoin(queries, emb, "embedding", "vec_id",
        Metric.Cosine, k = 5, dim = 64, bits = bits, bands = 8,
        maxBucketFactor = Some(4.0))
    }
    timed("full_row", runs) {
      Queries.annRecallCappedScaled(spark, sfDir, mod, bits, 4.0, bands = 8)
    }
    spark.stop()
  }
}
