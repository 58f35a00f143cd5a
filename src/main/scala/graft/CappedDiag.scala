package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.Metric
import graft.operators.{Partitioning, VectorSearch}

/** One-off diagnostic for q_ann_capped_scaled — the sweep's top row
  * (186.9s idle median at sf10, r16) and the declared serving config's
  * price. Splits the capped multiband self-join into its three cost
  * stages and A/Bs the one untested lever: the candidate re-attach
  * joins run sort-merge today, which carries the 512-byte query vector
  * through a candidates-volume exchange (the r10 finding "candidate
  * exchanges dominate"); at sf10 the whole normalized vector table is
  * ~104 MB — above the 10 MB auto-broadcast threshold, so Catalyst
  * never tries a broadcast-hash re-attach, but trivially broadcastable
  * explicitly. If that wins, the operator gains a size-aware re-attach
  * branch (broadcast when count·rowBytes fits, shuffle otherwise —
  * the only shape that also survives 100 TB). Stages mirror
  * [[VectorSearch.multibandKnnJoin]] exactly. */
object CappedDiag {
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
    println(f"DIAG $name%-18s median=${ts(ts.length / 2)}%7.1fs runs=${ts.map(t => f"$t%.1f").mkString(",")}")
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
    val bits = Queries.scaledLshBits(n)
    val bands = 8
    val f = Queries.AnnCapFactor
    val dim = 64
    val k = 5
    println(s"DIAG n=$n bits=$bits bands=$bands cap=$f")

    // stage pieces, reproduced from multibandKnnJoin's self path
    def sharedIdx() = {
      val spread = Partitioning.spread(emb)
      VectorSearch.lshBucketTable(spread, "embedding", "vec_id",
        Metric.Cosine, dim, bits, bands).localCheckpoint()
    }
    def capped(idx: DataFrame) = {
      val di = idx.select(col("vec_id").as("neighbor_id"), col("band"), col("bucket"))
      val thr = di.groupBy("band", "bucket").agg(count(lit(1)).as("__n"))
        .agg(avg(col("__n")).as("__meanb"))
      val wB = Window.partitionBy("band", "bucket")
      di.withColumn("__bsz", count(lit(1)).over(wB))
        .crossJoin(broadcast(thr))
        .filter(col("__bsz").cast("double") <= lit(f) * col("__meanb"))
        .drop("__bsz", "__meanb")
    }
    def candidates(idx: DataFrame) = {
      val qi = idx.select(col("vec_id").as("query_id"), col("band"), col("bucket"))
      qi.join(capped(idx), Seq("band", "bucket"))
        .filter(col("query_id") =!= col("neighbor_id"))
        .select("query_id", "neighbor_id").distinct()
    }
    def vecs(alias: String) = {
      val prepared = emb.withColumn("embedding",
        Metric.Cosine.prepare(col("embedding")))
      prepared.select(col("vec_id").as(alias), col("embedding").as(s"__${alias}v"))
    }
    def rank(scored: DataFrame) = {
      val w = Window.partitionBy("query_id")
        .orderBy(desc("score"), asc("neighbor_id"))
      scored.withColumn("rank", row_number().over(w))
        .filter(col("rank") <= k)
        .select("query_id", "neighbor_id", "score", "rank")
    }

    timed("index_build", runs) { sharedIdx() }
    timed("candidates", runs) { candidates(sharedIdx()) }
    // the full row as shipped (sort-merge re-attach)
    timed("full_sortmerge", runs) {
      val cand = candidates(sharedIdx())
      rank(cand.join(vecs("query_id"), Seq("query_id"))
        .join(vecs("neighbor_id"), Seq("neighbor_id"))
        .withColumn("score", Metric.Cosine.scorePrenormalized(
          col("__query_idv"), col("__neighbor_idv"))))
    }
    // A/B: broadcast the (small-at-this-N) vector table into both
    // re-attach joins — no candidate-volume exchange at all
    timed("full_bcast", runs) {
      val cand = candidates(sharedIdx())
      rank(cand.join(broadcast(vecs("query_id")), Seq("query_id"))
        .join(broadcast(vecs("neighbor_id")), Seq("neighbor_id"))
        .withColumn("score", Metric.Cosine.scorePrenormalized(
          col("__query_idv"), col("__neighbor_idv"))))
    }
    // reference point: the declared row end to end
    timed("declared_row", runs) {
      VectorSearch.multibandKnnJoin(emb, emb, "embedding", "vec_id",
        Metric.Cosine, k = k, dim = dim, bits = bits, bands = bands,
        maxBucketFactor = Some(f)).orderBy("query_id", "rank")
    }
    spark.stop()
  }
}
