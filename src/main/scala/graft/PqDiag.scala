package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.expressions.VectorExpressions
import graft.functions.Metric
import graft.operators.VectorSearch

/** One-off diagnostic for the r14 PQ serving cost at scale: where do
  * q_pq_search_scaled's engine seconds go? The row is a 200k-row ADC
  * scan at sf10 — ~4k flops/row — yet benches 77.9s (~390µs/row), and
  * the fixture row (ksub=16) scales to it LINEARLY in ksub, the
  * signature of per-centroid interpretive overhead rather than the
  * fused kernel's constant-size loop. Times the row's subplans
  * separately: normalize-only scan, the m-kernel encode, the packed
  * encode, ADC scoring from precomputed codes, and the full row.
  * Pair with EXTRA_JAVA_OPTS=-XX:-DontCompileHugeMethods (run_main.sh)
  * for the JIT-cliff A/B from MIGRATION "Fused per-row kernels". */
object PqDiag {
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
    val ksub = Queries.scaledPqKsub(n)
    println(s"DIAG n=$n ksub=$ksub")
    val cbs = VectorSearch.pqCodebooks(emb, "embedding", "vec_id", 8, ksub,
      Metric.Cosine)
    val m = cbs.length
    val s = cbs.head.head._2.length

    val norm = emb.select(col("vec_id"),
      VectorExpressions.l2Normalize(col("embedding").cast("array<double>"))
        .as("nemb"))

    timed("normalize", runs)(norm)

    timed("encode_m", runs) {
      // the 8 per-subspace argmin kernels exactly as pqSearch composes them
      norm.select(col("vec_id") +: (0 until m).map { j =>
        element_at(
          VectorExpressions.nearestCentroids(
            slice(col("nemb"), j * s + 1, s),
            VectorExpressions.CentroidScore.EuclidDist,
            cbs(j).map { case (code, cvec) => (code.toLong, cvec) },
            n = 1), 1).getField("cid").as(s"__code_$j")
      }: _*)
    }

    timed("encode_packed", runs) {
      VectorSearch.pqEncode(emb, "embedding", "vec_id", cbs, Metric.Cosine)
    }

    // pqSearch internals, reproduced stage by stage so the 76s can be
    // attributed: codes projection -> broadcast cross join with the one
    // query row -> 8-term ADC score -> top-10
    def codesDf = norm.select(col("vec_id") +: (0 until m).map { j =>
      element_at(
        VectorExpressions.nearestCentroids(
          slice(col("nemb"), j * s + 1, s),
          VectorExpressions.CentroidScore.EuclidDist,
          cbs(j).map { case (code, cvec) => (code.toLong, cvec) },
          n = 1), 1).getField("cid").as(s"__code_$j")
    }: _*)
    def qDf = emb.filter(col("vec_id") === 0)
      .select(VectorExpressions.l2Normalize(
        col("embedding").cast("array<double>")).as("qvec"))
    def adc(qv: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
      (0 until m).map { j =>
        val qsub = slice(qv, j * s + 1, s)
        val cvecs = typedlit(cbs(j).map(_._2))
        VectorExpressions.dot(qsub,
          element_at(cvecs, (col(s"__code_$j") + 1).cast("int")))
      }.foldLeft(lit(0.0))(_ + _)

    timed("codes_join", runs) {
      codesDf.crossJoin(broadcast(qDf)).select(col("vec_id"), col("qvec"))
    }
    timed("join_score", runs) {
      codesDf.crossJoin(broadcast(qDf)).withColumn("score", adc(col("qvec")))
        .select(col("vec_id"), col("score"))
    }
    timed("join_score_k", runs) {
      codesDf.crossJoin(broadcast(qDf)).withColumn("score", adc(col("qvec")))
        .select(col("vec_id"), col("score"))
        .orderBy(desc("score"), col("vec_id").asc).limit(10)
    }
    timed("full_search", runs) {
      VectorSearch.pqSearch(emb, "embedding", "vec_id",
        emb.filter(col("vec_id") === 0).select(col("embedding").as("qvec")),
        "qvec", cbs, 10, Metric.Cosine)
    }

    spark.stop()
  }
}
