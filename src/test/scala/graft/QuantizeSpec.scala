package graft

import org.apache.spark.sql.functions._

import graft.functions.Metric
import graft.operators.{Quantize, VectorSearch}

/** int8 quantization: code range, reconstruction error bound (≤ s/2 per
  * dim by round-half-up), recall preservation of search over
  * reconstructed vectors, and zero-vector safety. */
class QuantizeSpec extends SparkSpec {
  import spark.implicits._

  private lazy val emb = Tables.embeddings(spark, Sf0001)
    .select("vec_id", "embedding").cache()

  test("codes are integral and within [-127, 127]") {
    val mm = emb.select(Quantize.codes(col("embedding")).as("c"))
      .select(array_min(col("c")).as("lo"), array_max(col("c")).as("hi"),
        array_max(transform(col("c"), x => abs(x - floor(x)))).as("frac"))
      .agg(min("lo"), max("hi"), max("frac")).collect()(0)
    assert(mm.getDouble(0) >= -127.0 && mm.getDouble(1) <= 127.0)
    assert(mm.getDouble(2) == 0.0, "codes must be integral-valued")
  }

  test("per-dim reconstruction error is bounded by scale/2") {
    val bad = Quantize.quantizeColumn(emb, "embedding")
      .join(emb.select(col("vec_id"), col("embedding").as("orig")), "vec_id")
      .select(array_max(zip_with(col("orig"), col("embedding"),
        (x, r) => abs(x - r))).as("maxerr"), col("qscale"))
      .filter(col("maxerr") > col("qscale") * 0.5 + lit(1e-12))
      .count()
    assert(bad == 0L)
  }

  test("VecQuantizeStats kernel == the HOF chain's stats, row for row") {
    val viaKernel = emb
      .select(col("vec_id"), graft.expressions.VectorExpressions
        .quantizeStatsCol(col("embedding")).as("q"))
      .select(col("vec_id"), col("q.scale_micro"), col("q.code_sum"),
        col("q.code_max"), col("q.err_micro"))
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    val viaHof = Quantize.quantizeColumn(emb, "embedding")
      .join(emb.select(col("vec_id"), col("embedding").as("__orig")), "vec_id")
      .select(
        col("vec_id"),
        floor(col("qscale") * 1e6).cast("long").as("sm"),
        aggregate(col("qcodes"), lit(0.0), (acc, c) => acc + c).cast("long").as("cs"),
        array_max(col("qcodes")).cast("long").as("cm"),
        floor(aggregate(
          zip_with(col("__orig"), col("embedding"), (x, r) => abs(x - r)),
          lit(0.0), (acc, e) => acc + e) * 1e6).cast("long").as("em"))
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    assert(viaKernel.size == viaHof.size)
    viaKernel.foreach { case (id, k) =>
      assert(k === viaHof(id), s"kernel/HOF mismatch on vec_id=$id")
    }
  }

  test("knn over reconstructed vectors keeps high recall vs exact") {
    val exact = VectorSearch.knnJoin(emb, emb, "embedding", "vec_id",
      Metric.Cosine, k = 5, excludeSelf = true, broadcastData = true)
      .select("query_id", "neighbor_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val deq = Quantize.quantizeColumn(emb, "embedding")
      .select("vec_id", "embedding")
    val approx = VectorSearch.knnJoin(deq, deq, "embedding", "vec_id",
      Metric.Cosine, k = 5, excludeSelf = true, broadcastData = true)
      .select("query_id", "neighbor_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (exact intersect approx).size.toDouble / exact.size
    info(f"int8 recall@5: $recall%.3f")
    assert(recall >= 0.9, f"quantization recall collapsed: $recall%.3f")
  }

  test("zero vectors quantize to all-zero codes, not NaN") {
    val z = Seq((1L, Seq.fill(8)(0.0)), (2L, Seq(1.0, -2.0, 0.5, 0.0, 0.0, 0.0, 0.0, 0.0)))
      .toDF("vec_id", "embedding")
    val codes = z.select(col("vec_id"), Quantize.codes(col("embedding")).as("c"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Double](1)).toMap
    assert(codes(1L).forall(_ == 0.0))
    assert(codes(2L).head == 64.0 || codes(2L).head == 63.0) // 1.0/(2/127)=63.5 → half-up 64
    assert(codes(2L)(1) == -127.0)
  }
}
