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

  test("codegen featureStats equals the mapPartitions decode path row for row") {
    // the declared query serves the projection; this equality keeps the
    // batch decode boundary (where a real codec plugs in) honest
    val cols = Seq("asset_id", "kind", "byte_len", "digest", "feat_sum")
    val viaStub = feats.select(cols.head, cols.tail: _*)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2),
        r.getString(3), r.getDouble(4))).toSet
    val viaProj = Multimodal.featureStats(assets, 16)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2),
        r.getString(3), r.getDouble(4))).toSet
    assert(viaProj == viaStub)
  }

  test("frame sampling: uniform spaced indices, correct slices, short assets dedup") {
    val frames = Multimodal.frameSample(assets, frameBytes = 32, k = 4)
      .collect().map(r => (r.getLong(0), r.getLong(2), r.getLong(3), r.getLong(4)))
    val byAsset = frames.groupBy(_._1)
    assert(byAsset.nonEmpty)
    byAsset.foreach { case (id, fs) =>
      val n = fs.head._3
      val expectIdx = (0 until 4).map(j => j * n / 4).distinct
      assert(fs.map(_._2).sorted.toSeq == expectIdx.sorted,
        s"asset $id: ${fs.map(_._2).toSeq} vs $expectIdx")
      assert(fs.length <= 4)
      // every frame except possibly the last is full-size
      fs.sortBy(_._2).dropRight(1).foreach { f =>
        assert(f._4 == 32, s"asset $id frame ${f._2} len ${f._4}")
      }
    }
    // JVM model spot check: frame digest == md5 of the text slice
    val one = Multimodal.frameSample(assets, 32, 4)
      .filter(col("asset_id") === 1 && col("frame_index") === 0)
      .select("frame_digest").collect()(0).getString(0)
    val text = Tables.documents(spark, Sf0001)
      .filter(col("doc_id") === 1).select("text").collect()(0).getString(0)
    val expect = java.security.MessageDigest.getInstance("MD5")
      .digest(text.take(32).getBytes("UTF-8")).map("%02x".format(_)).mkString
    assert(one == expect)
  }

  test("resize planning: aspect preserved within the box, exact integer geometry") {
    val rows = Multimodal.resizePlan(assets, 128, 96)
      .collect().map(r => (r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5)))
    assert(rows.nonEmpty)
    rows.foreach { case (sw, sh, ow, oh) =>
      assert(ow <= 128 && oh <= 96, s"($sw,$sh) -> ($ow,$oh) escapes the box")
      assert(ow == 128 || oh == 96, s"($sw,$sh) -> ($ow,$oh) under-fills the box")
      // integer-floor aspect: ow/oh within one unit of sw/sh ratio
      val expected = if (sw * 96 >= sh * 128) (128L, sh * 128 / sw)
      else (sw * 96 / sh, 96L)
      assert((ow, oh) == expected, s"($sw,$sh) -> ($ow,$oh), want $expected")
    }
  }
}
