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

  /** The scalar half of [[extractFeatures]] as a pure codegen projection:
    * same byte_len/digest/feat_sum math as the stub decoder, but as
    * declarative column expressions — no typed-Dataset deserialization,
    * no per-row case-class/payload-array allocation; the parquet scan
    * stays columnar and whole-stage codegen fuses the projection.
    * MultimodalSpec pins this equal to the mapPartitions path row for
    * row; [[extractFeatures]] remains the batch decode boundary a real
    * codec/model plugs into (where the per-row object cost is inherent
    * to handing bytes to a decoder). */
  def featureStats(assets: DataFrame, dim: Int): DataFrame = {
    val fold = assets.select(
      col("asset_id"), col("kind"),
      length(col("payload")).cast("long").as("byte_len"),
      md5(col("payload")).as("digest"))
    // fi cycles the 32 hex digits in ascending order — the exact fold
    // order of stubDecode's while loop (and the oracle's list_reduce)
    fold.select(col("asset_id"), col("kind"), col("byte_len"), col("digest"),
      aggregate(
        transform(sequence(lit(1), lit(dim)),
          fi => conv(col("digest").substr(((fi - 1) % 32 + 1).cast("int"), lit(1)),
            16, 10).cast("double") / 15.0),
        lit(0.0), (acc, x) => acc + x).as("feat_sum"))
  }

  /** Exact integer floor division for non-negative operands (the
    * [[Layout]] trick): `(a − a mod b) / b`. */
  private def intDiv(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) =
    ((a - pmod(a, b)) / b).cast("long")

  /** Frame sampling — the video/audio half of the decode story: treat
    * the opaque payload as `n = ceil(len/frameBytes)` fixed-size frames
    * and keep `k` uniformly spaced ones (`frame_index_j = ⌊j·n/k⌋`,
    * exactly what a video pipeline's uniform sampler computes), emitting
    * per-frame slices and digests. When n < k the arithmetic filter
    * `fi(j) ≠ fi(j−1)` drops duplicate indices PER ROW — no
    * dropDuplicates shuffle. Everything is substring/md5/integer
    * arithmetic: a per-row projection (explode bounded by k), zero
    * shuffle, SQL-replayable — a real frame decoder slots into the
    * [[extractFeatures]] batch boundary downstream of this selection.
    *
    * Output: `(asset_id, kind, frame_index, n_frames, frame_len,
    * frame_digest)`. */
  def frameSample(assets: DataFrame, frameBytes: Int = 32, k: Int = 4): DataFrame = {
    val n = greatest(lit(1L),
      intDiv(length(col("payload")) + lit(frameBytes - 1), lit(frameBytes)))
    def fi(j: org.apache.spark.sql.Column) = intDiv(j * col("n_frames"), lit(k))
    Partitioning.spread(assets)
      .select(col("asset_id"), col("kind"), col("payload"), n.as("n_frames"))
      .withColumn("j", explode(array((0 until k).map(j => lit(j.toLong)): _*)))
      .filter(col("j") === 0 || fi(col("j")) =!= fi(col("j") - 1))
      .withColumn("frame_index", fi(col("j")))
      .withColumn("frame",
        substring(col("payload"), (col("frame_index") * frameBytes + 1).cast("int"),
          lit(frameBytes)))
      .select(col("asset_id"), col("kind"), col("frame_index"), col("n_frames"),
        length(col("frame")).cast("long").as("frame_len"),
        md5(col("frame")).as("frame_digest"))
  }

  /** Aspect-preserving resize planning — the geometry half of a real
    * resize, in exact integer arithmetic: source dims come off the stub
    * decode (two digest bytes — a real decoder reads the header), and
    * the output box is the largest (w, h) fitting `maxW × maxH` with
    * aspect preserved: wider-than-target sources pin width
    * (`oh = ⌊h·maxW/w⌋`), taller ones pin height. The resized-payload
    * digest stands in for the pixel work (same stub contract as
    * [[stubDecode]]); the planning arithmetic IS what a real pipeline
    * computes, and it replays in SQL.
    *
    * Output: `(asset_id, kind, src_w, src_h, out_w, out_h,
    * resized_digest)`. */
  def resizePlan(assets: DataFrame, maxW: Int, maxH: Int): DataFrame = {
    val digest = md5(col("payload"))
    // source dims 16..271 from the first two digest bytes
    val srcW = (conv(substring(digest, 1, 2), 16, 10).cast("long") + 16).as("src_w")
    val srcH = (conv(substring(digest, 3, 2), 16, 10).cast("long") + 16).as("src_h")
    Partitioning.spread(assets)
      .select(col("asset_id"), col("kind"), digest.as("__d"), srcW, srcH)
      .withColumn("__wide",
        col("src_w") * maxH >= col("src_h") * maxW) // aspect vs target box
      .withColumn("out_w",
        when(col("__wide"), lit(maxW.toLong))
          .otherwise(intDiv(col("src_w") * maxH, col("src_h"))))
      .withColumn("out_h",
        when(col("__wide"), intDiv(col("src_h") * maxW, col("src_w")))
          .otherwise(lit(maxH.toLong)))
      .select(col("asset_id"), col("kind"), col("src_w"), col("src_h"),
        col("out_w"), col("out_h"),
        md5(concat(col("__d"), lit(":"), col("out_w"), lit("x"), col("out_h")))
          .as("resized_digest"))
  }
}
