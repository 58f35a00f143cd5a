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

  // SPARK_GRAFT_DIAG_ONLY=substr,substr — time only matching blocks
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
    timed("exact_bcastq", runs) {
      // A/B: broadcast the ~1000-row QUERY sample instead — corpus
      // becomes the streamed side, scanned once, never re-computed and
      // never moved (the only orientation that survives 100 TB)
      VectorSearch.knnJoin(queries, emb, "embedding", "vec_id",
        Metric.Cosine, k = 5, excludeSelf = true, broadcastQueries = true)
    }
    timed("ann_index", runs) {
      // corpus-side bucket table alone: 200k rows × bands×bits dots
      VectorSearch.lshBucketTable(emb, "embedding", "vec_id",
        Metric.Cosine, dim = 64, bits = bits, bands = 8)
    }
    timed("ann_index_dot", runs) {
      // same bucket table WITHOUT the cosine normalize step — isolates
      // whether the cost is the dots or a duplicated normalize/cast
      VectorSearch.lshBucketTable(emb, "embedding", "vec_id",
        Metric.Dot, dim = 64, bits = bits, bands = 8)
    }
    println(s"DIAG emb_partitions=${emb.rdd.getNumPartitions}")
    timed("ann_index_b1", runs) {
      // 1 band = 12 dots/row vs 8 bands = 96 dots/row: if wall time
      // scales ~8× the cost is per-dot compute; if flat it's a fixed
      // overhead (compilation, planning, scan)
      VectorSearch.lshBucketTable(emb, "embedding", "vec_id",
        Metric.Cosine, dim = 64, bits = bits, bands = 1)
    }
    timed("ann_index_b4", runs) {
      VectorSearch.lshBucketTable(emb, "embedding", "vec_id",
        Metric.Cosine, dim = 64, bits = bits, bands = 4)
    }
    timed("ann_index_spread", runs) {
      // same bucket table over a round-robin-spread corpus: isolates
      // task-parallelism starvation (few parquet splits on 32 cores)
      VectorSearch.lshBucketTable(
        graft.operators.Partitioning.spread(emb), "embedding", "vec_id",
        Metric.Cosine, dim = 64, bits = bits, bands = 8)
    }
    timed("ann_index_mat", runs) {
      // bucket table over a PRE-MATERIALIZED normalized corpus —
      // if this is fast while ann_index is slow, the normalize/cast
      // subtree is being re-evaluated per bucket expression
      import graft.functions.VectorFunctions
      val norm = emb.select(col("vec_id"),
        VectorFunctions.l2Normalize(col("embedding")).as("embedding"))
        .localCheckpoint()
      VectorSearch.lshBucketTable(norm, "embedding", "vec_id",
        Metric.Dot, dim = 64, bits = bits, bands = 8)
    }
    if (sys.env.contains("SPARK_GRAFT_DIAG_PLAN")) {
      println("===== ann_index executedPlan =====")
      println(VectorSearch.lshBucketTable(emb, "embedding", "vec_id",
        Metric.Cosine, dim = 64, bits = bits, bands = 8)
        .queryExecution.executedPlan.toString.take(8000))
    }
    timed("ann_nocap", runs) {
      VectorSearch.multibandKnnJoin(queries, emb, "embedding", "vec_id",
        Metric.Cosine, k = 5, dim = 64, bits = bits, bands = 8,
        maxBucketFactor = None)
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
