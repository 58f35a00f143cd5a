package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sequence packing for pretraining batches: documents are concatenated
  * in a deterministic order and cut into fixed `contextLen`-token
  * training sequences (the GPT-style pack-then-split layout — documents
  * may cross sequence boundaries; the trainer masks attention across
  * them).
  *
  * Global concatenation is inherently sequential, so the corpus is first
  * SHARDED by document hash and each shard packs independently — exactly
  * how distributed packing runs in practice: one output stream per
  * writer task, and `shards` scales with the writer count (hundreds on a
  * real cluster; the token stream a single writer sorts is corpus/shards,
  * not the corpus). Within a shard, a running token total gives every
  * document its offset in the concatenated stream; everything else is
  * arithmetic on offsets.
  *
  * Determinism: the pack order is `(hash bucket, id)` — the same
  * engine-portable `md5(salt:id)` hash as [[Splits]], so the layout is
  * reproducible across runs, engines, and partitionings, and documents
  * added later perturb only their own shard.
  */
object Packing {

  /** Per-shard packing layout stats: documents, token totals, how many
    * `contextLen`-token sequences the shard cuts into, how many
    * documents straddle a sequence boundary, and the tokens wasted in
    * the final partial sequence ("tail waste" — what padding would cost).
    *
    * `contextLen` should be a power of two (it always is in practice:
    * 2048/4096/…): offset divisions are then exact in binary floating
    * point, which keeps the floor arithmetic bit-identical in any
    * engine.
    *
    * Output: `(shard, n_docs, total_tokens, n_sequences, n_boundary_docs,
    * tail_waste_tokens)`, all BIGINT. */
  def packingStats(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      salt: String,
      shards: Int,
      contextLen: Int): DataFrame = {
    require(contextLen > 0 && (contextLen & (contextLen - 1)) == 0,
      s"contextLen must be a power of two, got $contextLen")
    val bucket = Splits.hashBucket(col(idCol), salt)
    val base = Partitioning.spread(docs).select(
      col(idCol),
      bucket.as("__bucket"),
      (bucket % shards).as("shard"),
      TextOps.tokenCount(col(textCol)).as("__n_tok"))
    val w = Window.partitionBy("shard").orderBy(col("__bucket"), col(idCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val seqOf: Column => Column = off => floor(off / lit(contextLen.toDouble)).cast("long")
    val cum = base
      .withColumn("__end", sum("__n_tok").over(w))
      .withColumn("__start", col("__end") - col("__n_tok"))
    cum.groupBy("shard")
      .agg(
        count(lit(1)).as("n_docs"),
        max("__end").as("total_tokens"),
        // ceil(total/ctx) via floor((total + ctx - 1)/ctx)
        max(seqOf(col("__end") + (contextLen - 1))).as("n_sequences"),
        sum((seqOf(col("__start")) =!= seqOf(col("__end") - 1)).cast("long"))
          .as("n_boundary_docs"))
      .withColumn("tail_waste_tokens",
        col("n_sequences") * contextLen - col("total_tokens"))
      .withColumn("shard", col("shard").cast("long"))
  }
}
