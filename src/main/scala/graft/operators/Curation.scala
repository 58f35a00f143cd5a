package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.expressions.VectorExpressions

/** Corpus-curation reporting operators: the filtering-funnel ablation
  * ledger every dataset paper publishes, and CCNet-style perplexity
  * bucketing (head/middle/tail per language).
  *
  * Reference scope note: the reference has no curation layer at all —
  * these are the training-data-pipeline extension surface
  * (BASELINE.json), composed from the same quality/LM primitives the
  * declared quality queries use.
  */
object Curation {

  /** Filtering-funnel ablation report — "how many documents does each
    * gate remove, applied in order": for each stage `i`, `n_in` = docs
    * surviving stages `1..i-1`, `n_kept` = docs surviving `1..i`,
    * `n_dropped = n_in - n_kept`. This is the ledger C4 / Gopher /
    * FineWeb-class pipelines publish to justify every filter.
    *
    * Stage conditions must be deterministic per-row predicates (they
    * are evaluated once, fused into a single projection).
    *
    * Scale shape: ONE pass — the survival depth (number of leading
    * satisfied gates) is a per-row `when` chain, and all `2·n` funnel
    * counters come from a single partial-final HashAggregate producing
    * ONE row, unpivoted driver-side-free via `stack`. No join, no
    * window, no second scan: the whole report costs one corpus scan
    * regardless of stage count. */
  def funnelReport(df: DataFrame, stages: Seq[(String, Column)]): DataFrame = {
    require(stages.nonEmpty, "funnelReport needs at least one stage")
    require(stages.forall(_._1.matches("[a-z0-9_]+")),
      "stage names must be [a-z0-9_]+ (they are embedded in a stack() expression)")
    // depth = number of leading satisfied gates: when the first failed
    // gate is i (0-based), depth = i; all gates pass -> depth = n
    val depth = stages.zipWithIndex.foldRight(lit(stages.size): Column) {
      case (((_, cond), i), rest) => when(!cond, lit(i)).otherwise(rest)
    }
    // SUM over zero rows is NULL — coalesce so an empty input yields a
    // genuinely all-zero ledger, not null counters (EmptyInputSpec pins
    // non-null, not just getAs[Long]'s silent 0L unboxing)
    val aggCols = stages.indices.flatMap { i =>
      Seq(
        coalesce(sum(when(col("__depth") >= i, 1L).otherwise(0L)), lit(0L))
          .as(s"__in$i"),
        coalesce(sum(when(col("__depth") >= i + 1, 1L).otherwise(0L)), lit(0L))
          .as(s"__kept$i"))
    }
    val one = df.select(depth.as("__depth"))
      .agg(aggCols.head, aggCols.tail: _*)
    val stackArgs = stages.zipWithIndex.map { case ((name, _), i) =>
      s"${i + 1}, '$name', __in$i, __kept$i"
    }.mkString(", ")
    one
      .select(expr(
        s"stack(${stages.size}, $stackArgs) as (stage, stage_name, n_in, n_kept)"))
      .withColumn("stage", col("stage").cast("int"))
      .withColumn("n_dropped", col("n_in") - col("n_kept"))
      .orderBy("stage")
  }

  /** DSIR importance weights (Xie et al., NeurIPS 2023 — "Data
    * Selection for Language Models via Importance Resampling"): score
    * every RAW document by the log-likelihood ratio of its hashed
    * bag-of-words features under the TARGET distribution vs the RAW
    * distribution — the cheap n-gram proxy for "how much does this doc
    * look like the high-quality target corpus", used to resample web
    * crawls toward a curated target.
    *
    * Per bucket `b` (add-one smoothed over `k` buckets):
    * `lr(b) = ln((cT(b)+1)/(nT+k)) − ln((cR(b)+1)/(nR+k))`; per doc,
    * `weight = Σ_features count(b)·lr(b)`. Each `ln` is floored to
    * integer MICROS separately (the lmScore trick) so `weight_micro`
    * is exact integer arithmetic cross-engine; `avg_weight` is one
    * final division. Output: `(idCol, n_feats, weight_micro,
    * avg_weight)` — every raw doc scored (its buckets are by
    * construction present in the raw counts).
    *
    * Scale shape: both bucket-count distributions aggregate map-side
    * to ≤`k` rows (model-sized — kilobytes even at k = 2²⁰); the
    * log-ratio MODEL table broadcasts, so the corpus-side probe is a
    * map-side BroadcastHashJoin over [[TextOps.featureHash]]'s single
    * (id, bucket) exchange — the corpus never reshuffles for the model
    * (the [[TextOps.hashedLinearScoreWeighted]] contract, with the
    * weights DERIVED from data instead of supplied). The two 1-row
    * total frames broadcast. */
  def dsirWeights(raw: DataFrame, target: DataFrame, idCol: String,
      textCol: String, k: Int): DataFrame = {
    val lnMicro = (x: Column) =>
      floor(VectorExpressions.platformLn(x.cast("double")) * lit(1e6))
        .cast("long")
    def bucketCounts(df: DataFrame) = df
      .select(explode(TextOps.tokens(col(textCol))).as("__token"))
      .groupBy((Sketches.shingleHash(col("__token")) % k).as("bucket"))
      .agg(count(lit(1)).as("__c"))
    val t = bucketCounts(target)
    val r = bucketCounts(raw)
    // sum over zero rows is NULL — coalesce so an EMPTY distribution
    // (e.g. an empty target delta) degrades to pure add-one smoothing
    // instead of null-poisoning every weight
    val tTot = t.agg(coalesce(sum("__c"), lit(0L)).as("__nt"))
    val rTot = r.agg(coalesce(sum("__c"), lit(0L)).as("__nr"))
    val model = r.select(col("bucket"), col("__c").as("__cr"))
      .join(t.select(col("bucket"), col("__c").as("__ct")), Seq("bucket"), "left")
      .crossJoin(broadcast(tTot))
      .crossJoin(broadcast(rTot))
      .select(col("bucket"),
        (lnMicro(coalesce(col("__ct"), lit(0L)) + 1)
          - lnMicro(col("__nt") + k)
          - lnMicro(col("__cr") + 1)
          + lnMicro(col("__nr") + k)).as("lr_micro"))
    TextOps.featureHash(raw, idCol, textCol, k)
      .join(broadcast(model), "bucket")
      .groupBy(col(idCol))
      .agg(
        sum("count").as("n_feats"),
        sum(col("count") * col("lr_micro")).as("weight_micro"))
      .withColumn("avg_weight",
        col("weight_micro").cast("double") / lit(1e6) / col("n_feats"))
  }

  /** CCNet-style perplexity bucketing: score every document with the
    * corpus-trained n-gram count LM ([[TextOps.lmScore]]), then cut
    * each language's score distribution into terciles — `head` (most
    * fluent: highest average log-probability), `middle`, `tail` — and
    * report per-(language, bucket) aggregates. The head/middle/tail
    * split is how CCNet (Wenzek et al., 2020) stratifies CommonCrawl
    * for downstream sampling.
    *
    * Cross-engine exactness: the per-doc score is `⌊avg_logprob·1000⌋`
    * — a deterministic BIGINT (avg_logprob is exact-integer-derived,
    * see [[TextOps.lmScore]]) — and the tercile thresholds are RANK
    * thresholds over the integer score HISTOGRAM: `q_hi` = the score of
    * the rank-⌈n/3⌉ doc (score desc), `q_lo` = rank ⌈2n/3⌉; ties share
    * their whole score. No interpolated percentile anywhere — Spark's
    * exact `percentile` and DuckDB's `quantile_cont` disagree by one
    * ulp at frac≈1 positions (symmetric vs lo+d·Δ weighting), which
    * flips boundary docs; integer ranks cannot.
    *
    * Scale shape: lmScore's documented shape (8-byte gram keys, partial
    * aggs), then a (lang, score) HISTOGRAM aggregate — bounded by the
    * milli-log score resolution, thousands of rows per language at any
    * corpus size — carries the cumulative-rank window (histogram-sized,
    * never a per-language window over the corpus); the thresholds
    * broadcast back and the bucket classify is map-side. Docs with
    * fewer than `n` tokens have no n-grams and are absent (same as
    * lmScore). */
  def perplexityBuckets(docs: DataFrame, idCol: String, textCol: String,
      langCol: String, n: Int): DataFrame = {
    val scored = TextOps.lmScore(docs, idCol, textCol, n)
      .join(docs.select(col(idCol), col(langCol)), idCol)
      .withColumn("__score", floor(col("avg_logprob") * 1000).cast("long"))
    val hist = scored.groupBy(col(langCol), col("__score"))
      .agg(count(lit(1)).as("__c"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(langCol).orderBy(desc("__score"))
    val cum = hist.withColumn("__cum", sum("__c").over(w))
    val totals = hist.groupBy(langCol).agg(sum("__c").as("__n"))
    val th = cum.join(totals, langCol)
      .groupBy(langCol)
      .agg(
        max(when(col("__cum") >= expr("(__n + 2) div 3"), col("__score")))
          .as("__q_hi"),
        max(when(col("__cum") >= expr("(2 * __n + 2) div 3"), col("__score")))
          .as("__q_lo"))
    scored.join(broadcast(th), langCol)
      .withColumn("bucket",
        when(col("__score") >= col("__q_hi"), lit("head"))
          .when(col("__score") >= col("__q_lo"), lit("middle"))
          .otherwise(lit("tail")))
      .groupBy(col(langCol), col("bucket"))
      .agg(
        count(lit(1)).as("n_docs"),
        sum("n_ngrams").as("sum_grams"),
        sum("__score").as("sum_score_milli"),
        min("__score").as("min_score_milli"),
        max("__score").as("max_score_milli"))
      .orderBy(col(langCol), col("bucket"))
  }
}
