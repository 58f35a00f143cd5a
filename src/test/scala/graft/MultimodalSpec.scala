package graft

import org.apache.spark.sql.functions._

import graft.functions.Metric
import graft.operators.{Multimodal, VectorSearch}

/** Multimodal plumbing: asset schema, batched stub decode, feature shape,
  * and that the extracted features flow into the vector operators. */
class MultimodalSpec extends SparkSpec {

  private lazy val assets =
    Multimodal.assetsFromDocuments(Tables.documents(spark, Sf0001)).cache()
  private lazy val feats = Multimodal.extractFeatures(assets, 16).cache()

  test("asset table has the opaque-binary + typed-metadata schema") {
    val fields = assets.schema.fields.map(f => f.name -> f.dataType.simpleString).toMap
    assert(fields("payload") == "binary")
    assert(fields("meta") == "map<string,string>")
    assert(assets.select("kind").distinct().count() == 3)
  }

  test("feature extraction preserves row count and emits fixed-dim vectors") {
    assert(feats.count() == assets.count())
    val badDim = feats.filter(size(col("feature")) =!= 16).count()
    assert(badDim == 0)
  }

  test("stub decode is deterministic (same digest across runs)") {
    val d1 = feats.select("asset_id", "digest").collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val d2 = Multimodal.extractFeatures(assets.repartition(5), 16)
      .select("asset_id", "digest").collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(d1 == d2)
  }

  test("byte_len matches the payload length") {
    val bad = feats.join(assets, "asset_id")
      .filter(col("byte_len") =!= length(col("payload").cast("string"))).count()
    assert(bad == 0)
  }

  test("extracted features feed the vector search operators") {
    val table = feats.select(col("asset_id"), col("feature").as("embedding"))
    val q = table.filter(col("asset_id") === 0).select(col("embedding").as("qvec"))
    val top = VectorSearch.topK(table, "embedding", "asset_id", q, "qvec",
      Metric.Cosine, 5).collect()
    assert(top.length == 5)
    assert(top.head.getAs[Long]("asset_id") == 0L) // self is most similar
  }
}
