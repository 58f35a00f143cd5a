package graft.operators

import java.security.MessageDigest

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** One opaque media asset: the multimodal data model (north star). The
  * payload is an opaque binary blob (image/audio/video bytes at 100 TB;
  * here a UTF-8 stand-in derived from the documents fixture) plus typed
  * metadata. */
final case class MediaAsset(
    asset_id: Long,
    kind: String,
    payload: Array[Byte],
    meta: Map[String, String])

/** Extracted per-asset features — the output schema of the decode/
  * feature-extract stage. `feature` is embedding-shaped so downstream
  * vector ops (knn join, near-dup) consume it unchanged. */
final case class MediaFeatures(
    asset_id: Long,
    kind: String,
    byte_len: Long,
    digest: String,
    feat_sum: Double,
    feature: Array[Double])

/** Multimodal column plumbing (north star): binary payload columns with
  * typed metadata, and a batched decode → feature-extract stage.
  *
  * The decode itself is a STUB — this container ships no image/audio
  * codecs — but everything Spark-side is real and tested: the asset
  * schema, the typed `Dataset[MediaAsset]` boundary, the
  * `mapPartitions` batch shape (the JVM analog of a vectorized /
  * `mapInPandas` UDF: decode libraries amortize per-batch setup), and
  * partition spreading so one task never owns the whole corpus. The
  * stub is deterministic (md5-derived), so the whole path stays under
  * the DuckDB oracle.
  */
object Multimodal {

  /** Batch size handed to the (stub) decoder — the unit a real codec or
    * model would process per call, exactly like a vectorized UDF batch. */
  val DecodeBatchSize = 64

  /** Build an asset table from the documents fixture: the text bytes
    * stand in for media payloads; `kind` cycles image/audio/text to
    * exercise per-kind handling. */
  def assetsFromDocuments(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id").as("asset_id"),
      when(col("doc_id") % 3 === 0, "image")
        .when(col("doc_id") % 3 === 1, "audio")
        .otherwise("text").as("kind"),
      col("text").cast("binary").as("payload"),
      map(lit("lang"), col("lang"), lit("source"), col("source")).as("meta"))

  /** STUB decoder: where a real pipeline would decode the payload
    * (image decode / resample / frame-sample) and run a feature model,
    * this derives `dim` deterministic pseudo-features from the payload's
    * md5 — hex digit i (cycled) scaled to [0,1]. Same shape, same cost
    * model (per-batch invocation), replayable in SQL. */
  private def stubDecode(asset: MediaAsset, dim: Int): MediaFeatures = {
    val md = MessageDigest.getInstance("MD5")
    val digest = md.digest(asset.payload).map("%02x".format(_)).mkString
    val feature = new Array[Double](dim)
    var sum = 0.0
    var i = 0
    while (i < dim) {
      val v = Character.digit(digest.charAt(i % 32), 16) / 15.0
      feature(i) = v
      sum += v
      i += 1
    }
    MediaFeatures(asset.asset_id, asset.kind, asset.payload.length.toLong,
      digest, sum, feature)
  }

  /** Decode + feature-extract over the asset table, batched per
    * partition. Output columns: asset_id, kind, byte_len, digest,
    * feat_sum, feature (ARRAY<DOUBLE>[dim]). */
  def extractFeatures(assets: DataFrame, dim: Int): DataFrame = {
    val spark = assets.sparkSession
    import spark.implicits._
    val ds: Dataset[MediaAsset] = Partitioning.spread(assets).as[MediaAsset]
    ds.mapPartitions { it =>
      // batch iteration: a real decoder initializes once per batch
      it.grouped(DecodeBatchSize).flatMap { batch =>
        batch.map(a => stubDecode(a, dim))
      }
    }.toDF()
  }
}
