package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Token-budget selection and budget-driven sharding — the "assemble the
  * training set under a budget" stage of an LLM data pipeline (per-domain
  * token caps in the FineWeb/Dolma mixing style; fixed-token-budget output
  * shards for the final training-shard write).
  *
  * Both operators are running-sum shapes, and the naive Spark form of a
  * running sum is a scale-killer in two different ways:
  *
  *   - a GLOBAL running sum (`Window.orderBy(k)` with no partitionBy)
  *     plans a SINGLE-partition window — the whole corpus funnels through
  *     one task;
  *   - a PER-DOMAIN running sum (`Window.partitionBy(domain).orderBy(p)`)
  *     funnels the corpus through a low-cardinality exchange — one task
  *     per domain, however large the domain.
  *
  * The fix here is the classic two-level decomposition: bucket the order
  * key into priority-monotonic coarse buckets, aggregate per-bucket
  * partial sums (map-side partial agg → a metadata-scale frame), compute
  * bucket PREFIX offsets with a window over that small frame, then join
  * offsets back and finish with a per-(group, bucket) window whose
  * partitions are bounded by the bucket width — a well-distributed,
  * skew-free shuffle. `runningSum(x) = bucketOffset(bucket(x)) +
  * localRunningSum(x within bucket)` exactly, because buckets are
  * monotonic in the order key.
  *
  * [[domainBudget]] goes one step further: the bucket-offset frame alone
  * classifies every bucket as keep-whole / boundary / drop, so the
  * per-row window runs ONLY over the single boundary bucket per group —
  * kept and dropped buckets are resolved by a join + filter with no
  * per-row state at all. */
object Budget {

  private def requirePow2(n: Long, what: String): Int = {
    require(n > 0 && (n & (n - 1)) == 0, s"$what must be a positive power of two, got $n")
    java.lang.Long.numberOfTrailingZeros(n)
  }

  /** Exact running sum of `weightCol` over rows ordered by `orderCol`
    * within each `groupCols` group (empty `groupCols` → one global
    * ordering), written to `outCol` — semantically identical to
    * `sum(weight) OVER (PARTITION BY group ORDER BY order
    * ROWS UNBOUNDED PRECEDING)` but never planning a corpus-wide or
    * domain-wide window partition.
    *
    * Requirements: `orderCol` is a NON-NEGATIVE long, unique within its
    * group (embed a tie-breaker if needed); `weightCol` is non-negative;
    * `bucketWidth` is a power of two. Bucket id = `orderCol >>
    * log2(bucketWidth)`, so buckets are contiguous, priority-monotonic
    * key ranges.
    *
    * Scale: the bucket-partials frame has `groups × buckets` rows —
    * size it via `bucketWidth` (e.g. 2^20-wide buckets over a 2^40 key
    * space → ~10^6 offsets rows corpus-wide). The offsets window runs
    * over that frame (per group, or single-partition when ungrouped —
    * metadata-scale either way); the offsets join is left to Catalyst/
    * AQE, which broadcasts it while it is small. The only corpus-scale
    * shuffle is the final per-(group, bucket) window — high-cardinality
    * partition keys, each partition at most `bucketWidth` distinct order
    * values. */
  def runningSum(
      df: DataFrame,
      groupCols: Seq[String],
      orderCol: String,
      weightCol: String,
      bucketWidth: Long,
      outCol: String): DataFrame = {
    val bits = requirePow2(bucketWidth, "bucketWidth")
    val joined = withBucketBounds(df, groupCols, orderCol, weightCol, bits)
    val wRow = Window
      .partitionBy((groupCols :+ "__bucket").map(col): _*)
      .orderBy(col(orderCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    joined
      .withColumn(outCol, col("__bbefore") + sum(col(weightCol)).over(wRow))
      .drop("__bucket", "__bsum", "__bbefore", "__bcum")
  }

  /** Budget-capped ordered take per group ("keep the best docs from each
    * domain until its token budget is spent"): keeps exactly the rows
    * whose running `weightCol` sum over `(group, priorityCol asc)` order
    * is ≤ `budget` — the rows a naive
    * `filter(sum(w) OVER (PARTITION BY group ORDER BY priority) <= B)`
    * would keep, without ever windowing the corpus.
    *
    * The bucket-bounds frame classifies each (group, bucket):
    * `bucketCum ≤ B` → keep every row (join + filter, no window);
    * `bucketBefore ≥ B` → drop every row; the at-most-one boundary
    * bucket per group → resolved by a per-row window over that bucket
    * alone, offset by `bucketBefore`. Same requirements as
    * [[runningSum]] (non-negative unique-within-group long priority,
    * non-negative weights, power-of-two `bucketWidth`). Output = input
    * rows that fit the budget, original columns only. */
  def domainBudget(
      df: DataFrame,
      groupCols: Seq[String],
      priorityCol: String,
      weightCol: String,
      budget: Long,
      bucketWidth: Long): DataFrame = {
    require(budget >= 0, s"budget must be non-negative, got $budget")
    val bits = requirePow2(bucketWidth, "bucketWidth")
    val joined = withBucketBounds(df, groupCols, priorityCol, weightCol, bits)
    val whole = joined.filter(col("__bcum") <= budget)
    val wRow = Window
      .partitionBy((groupCols :+ "__bucket").map(col): _*)
      .orderBy(col(priorityCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    // boundary iff __bbefore <= budget < __bcum: the <= matters for
    // zero-weight rows at a bucket whose prefix exactly exhausts the
    // budget — their cum == budget and they are kept
    val boundaryKept = joined
      .filter(col("__bbefore") <= budget && col("__bcum") > budget)
      .withColumn("__cum", col("__bbefore") + sum(col(weightCol)).over(wRow))
      .filter(col("__cum") <= budget)
      .drop("__cum")
    whole.unionByName(boundaryKept)
      .drop("__bucket", "__bsum", "__bbefore", "__bcum")
  }

  /** Budget-driven output sharding ("write ~`shardBudget` tokens per
    * training shard"): assigns each row the shard its global running
    * token offset starts in — `shard = (runningSum - weight) /
    * shardBudget` over `orderCol` order — so shards are contiguous key
    * ranges holding ≥ `shardBudget` tokens each (greedy fill; the last
    * doc of a shard may overflow it, the standard shard-writer
    * contract). Both widths must be powers of two. The global running
    * sum comes from [[runningSum]] with no group columns — the
    * two-level shape, not a single-partition window. */
  def shardAssign(
      df: DataFrame,
      orderCol: String,
      weightCol: String,
      shardBudget: Long,
      bucketWidth: Long): DataFrame = {
    val shardBits = requirePow2(shardBudget, "shardBudget")
    runningSum(df, Seq.empty, orderCol, weightCol, bucketWidth, "__cum")
      .withColumn("shard", shiftright(col("__cum") - col(weightCol), shardBits))
      .drop("__cum")
  }

  /** Shared first level: bucket each row, aggregate per-(group, bucket)
    * weight partials, window the partials into prefix bounds, and join
    * them back. Emits `__bucket`, `__bsum` (bucket total), `__bbefore`
    * (sum of all earlier buckets in the group), `__bcum`
    * (`__bbefore + __bsum`).
    *
    * RE-EXECUTION CONTRACT: the input subtree executes once for the
    * bounds aggregate (pruned to (group, bucket, weight), map-side
    * partial) and once per probe branch of the caller — twice total in
    * [[runningSum]]/[[shardAssign]], three times in [[domainBudget]]
    * (keep-whole + boundary branches). The BOUNDS frame is
    * `localCheckpoint`ed here: it is metadata-scale by the
    * `bucketWidth` contract, and checkpointing it (a) guarantees the
    * bounds aggregate runs exactly ONCE however many branches join it
    * — before this, each union branch re-planned the whole bounds
    * subtree, so the r8 shape executed the input 4× (measured: 8 scan
    * nodes in q_domain_budget's plan), with a silently doubled
    * expensive upstream as the failure mode ADVICE flagged — and
    * (b) pins its broadcast to one tiny materialized relation.
    * (A shared staging exchange for the PROBE sides cannot help:
    * per-branch column pruning makes the subtrees non-canonical-equal,
    * so ReuseExchange never fires, and pre-shuffling would forfeit
    * [[domainBudget]]'s shuffle-free keep/drop path.) Probe re-scans
    * remain — call with a NARROW, scan-cheap frame: project the
    * id/group/weight columns first, and persist or checkpoint an
    * expensive upstream (regex weights, joins) rather than paying it
    * per branch. PlanSpec pins the scan counts. */
  private def withBucketBounds(
      df: DataFrame,
      groupCols: Seq[String],
      orderCol: String,
      weightCol: String,
      bucketBits: Int): DataFrame = {
    val withB = df.withColumn("__bucket", shiftright(col(orderCol), bucketBits))
    val groupB: Seq[Column] = (groupCols :+ "__bucket").map(col)
    val wBucket = Window
      .partitionBy(groupCols.map(col): _*)
      .orderBy(col("__bucket"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val bounds = withB
      .groupBy(groupB: _*)
      .agg(sum(col(weightCol)).as("__bsum"))
      .withColumn("__bcum", sum(col("__bsum")).over(wBucket))
      .withColumn("__bbefore", col("__bcum") - col("__bsum"))
      // eager = false: construction stays job-free (merely building a
      // Budget frame must not trigger a Spark job — r9 ADVICE), while
      // the LogicalRDD wrapper still guarantees the bounds aggregate
      // plans ONCE however many union branches join it; the RDD is
      // materialized-and-cached by the first action that touches it.
      .localCheckpoint(eager = false)
    withB.join(broadcast(bounds), groupCols :+ "__bucket")
  }
}
