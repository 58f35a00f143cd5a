package graft.examples

import org.apache.spark.sql.SparkSession

import graft.Tables
import graft.syntax._

/** The training-data pipeline as a user would write it with the fluent
  * facade: quality filter → segment-level dedup → temperature-balanced
  * mixture → packing layout, plus the two near-dup candidate reports.
  *
  * Run: `sbt "runMain graft.examples.TrainingDataPipeline [sfDir]"`.
  */
object TrainingDataPipeline {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val docs = Tables.documents(spark, sfDir)

    // corpus prep: quality gate, then cut every repeated 30-char segment
    val clean = docs.qualityFiltered().segmentDeduped(segSize = 30)
    println(s"quality+dedup kept ${clean.count()} of ${docs.count()} docs")

    // r6 stages: classifier gate (hashed-BoW keep/drop), corpus-wide
    // boilerplate cut, and an exact-20-per-language eval panel
    import org.apache.spark.sql.functions.col
    val gated = docs.join(
      docs.qualityScored(k = 256).filter(col("label") === 1).select("doc_id"),
      "doc_id")
    println(s"classifier kept ${gated.count()} docs")
    println(s"boilerplate scrub kept " +
      s"${gated.boilerplateScrubbed(segSize = 30, minDf = 3).count()} docs")
    docs.reservoirSampled("lang", salt = "demo", n = 20)
      .groupBy("lang").count().show()

    // mixture: α=0.5 temperature balance over languages, then the
    // per-shard sequence-packing layout for 256-token contexts
    val mixed = docs.temperatureSampled("lang", salt = "demo", targetTotal = 200)
    mixed.packingLayout(salt = "demo", shards = 4, contextLen = 256)
      .show(truncate = false)

    // near-dup reports: banded minhash candidates + winnowing pairs
    println(s"minhash candidate pairs: " +
      s"${docs.nearDupCandidates(k = 8, m = 16, bands = 4).count()}")
    println(s"winnowing fingerprint pairs: ${docs.fingerprintPairs().count()}")

    // r8 curation stages: the published-datasheet trio — the filter
    // funnel ledger, per-language tokenizer fertility, and the first
    // BPE merge candidates — then DSIR selection toward a target slice
    // and the remove-one-copy substring scrub
    docs.funnelReported(Seq(
      "min_chars" -> (col("n_chars") >= 100),
      "stopword" -> (col("text").contains(" the ")))).show()
    docs.perplexityBucketed().show(truncate = false)
    println("tokenizer fertility by language:")
    graft.operators.TextOps
      .tokenizerFertility(docs, "lang", "text", "n_chars").show()
    println("first BPE merges:")
    docs.bpeMergeCandidates(k = 5).show()
    val target = docs.filter(col("doc_id") % 10 === 7)
    println(s"DSIR top doc: " +
      docs.filter(col("doc_id") % 10 =!= 7)
        .dsirWeighted(target, k = 256)
        .orderBy(col("weight_micro").desc).limit(1).collect().mkString)
    val scrubbed = graft.operators.Sketches
      .scrubSharedSpans(docs, "doc_id", "text", k = 8)
    println(s"substring scrub removed " +
      scrubbed.agg(org.apache.spark.sql.functions.sum("n_tokens_removed"))
        .collect().head.getLong(0) + " duplicated tokens")

    spark.stop()
  }
}
