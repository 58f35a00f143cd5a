package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Multi-dimensional data layout: Z-order (Morton) clustering, the
  * technique behind Delta/Iceberg `OPTIMIZE ZORDER BY (a, b)` — lay
  * rows out so that BOTH columns are locally clustered, and per-file
  * min/max statistics prune scans on EITHER predicate. A linear sort
  * clusters only its leading column; the bit-interleaved code gives
  * every dimension half the locality, which is what makes data-skipping
  * work for multi-predicate workloads at 100 TB.
  *
  * Everything is exact integer arithmetic — normalization is integer
  * floor division against in-plan min/max bounds, the Morton code is a
  * 16-step shift/mask fold (stays inside whole-stage codegen), and
  * bucketing is arithmetic against exact bounds rather than a sampled
  * `RangePartitioner` — so layouts are deterministic and
  * oracle-replayable (a real table write would feed `z` to
  * `repartitionByRange` + sortWithinPartitions; the bucket stats here
  * ARE the per-file min/max a lakehouse would collect). */
object Layout {

  /** Exact integer floor division for non-negative `a`, positive `b`:
    * `(a − a mod b) / b` — the subtraction makes the double division
    * exact for any `a` < 2^53 (the normalized products below are ≤
    * 65535·range, far under). Mirrors DuckDB's `//`. */
  private def intDiv(a: Column, b: Column): Column =
    ((a - pmod(a, b)) / b).cast("long")

  /** Supported input domain: `hi − lo ≤ 2^53/65535` (≈ 1.37e11). The
    * BINDING constraint is [[intDiv]]'s exactness, which needs the
    * product `(v − lo)·65535` to stay within the double-exact 2^53 —
    * NOT the much looser BIGINT overflow at 2^63/65535 ≈ 2^47 (ranges
    * between the two pass arithmetic but produce off-by-one ranks that
    * diverge from an engine's exact integer division — verified by
    * counterexample). Beyond the bound the guard fails loudly instead
    * of silently corrupting z-codes. Columns with wider ranges should
    * be pre-scaled (e.g. `v div 2^16`) before layout; rank, not
    * magnitude, is what Z-ordering consumes. */
  val MaxRange: Long = (1L << 53) / 65535L

  /** Scale `v` ∈ [lo, hi] to a 16-bit integer rank:
    * `(v − lo)·65535 div (hi − lo)` (0 when the range is degenerate;
    * in-plan `raise_error` beyond [[MaxRange]] — one codegen branch per
    * row, never a wrong code). */
  def normalize16(v: Column, lo: Column, hi: Column): Column =
    when(hi === lo, lit(0L))
      .when(hi - lo > lit(MaxRange),
        raise_error(concat(lit("Layout.normalize16: column range "),
          (hi - lo).cast("string"),
          lit(s" exceeds 2^53/65535 — pre-scale the column before Z-ordering")))
          .cast("long"))
      .otherwise(intDiv((v - lo) * lit(65535L), hi - lo))

  /** Morton (Z-order) code of two 16-bit values: bit i of `a` lands at
    * position 2i, bit i of `b` at 2i+1 — a 32-bit code. Pure
    * shift/mask/or fold: codegen-friendly, no UDF. */
  def mortonCode(a16: Column, b16: Column): Column =
    (0 until 16).map { i =>
      shiftleft(shiftright(a16, i).bitwiseAND(lit(1L)), 2 * i)
        .bitwiseOR(shiftleft(shiftright(b16, i).bitwiseAND(lit(1L)), 2 * i + 1))
    }.reduceLeft(_.bitwiseOR(_))

  /** Z-order layout statistics: normalize `colA`/`colB` (must already
    * be integral) against their in-plan min/max, interleave into `z`,
    * split the z-range into `buckets` equal arithmetic slices (exact
    * bounds — deterministic, unlike a sampled range partitioner), and
    * return per-bucket row counts and per-column min/max — the
    * data-skipping statistics of the laid-out files. One aggregation
    * for bounds (broadcast 1-row), one for the stats: two shuffles of
    * stat-sized rows, never data-sized. */
  def zorderStats(
      df: DataFrame,
      colA: String,
      colB: String,
      buckets: Int): DataFrame = {
    val bounds = df.agg(
      min(col(colA)).cast("long").as("__alo"), max(col(colA)).cast("long").as("__ahi"),
      min(col(colB)).cast("long").as("__blo"), max(col(colB)).cast("long").as("__bhi"))
    df.select(col(colA).cast("long").as("__a"), col(colB).cast("long").as("__b"))
      .crossJoin(broadcast(bounds))
      .withColumn("__z", mortonCode(
        normalize16(col("__a"), col("__alo"), col("__ahi")),
        normalize16(col("__b"), col("__blo"), col("__bhi"))))
      // z ∈ [0, 2^32): arithmetic slice against the EXACT code-space
      // bound — what repartitionByRange approximates by sampling
      .withColumn("bucket",
        intDiv(col("__z") * lit(buckets.toLong), lit(4294967296L)))
      .groupBy("bucket")
      .agg(count(lit(1)).as("n_rows"),
        min("__a").as("a_min"), max("__a").as("a_max"),
        min("__b").as("b_min"), max("__b").as("b_max"))
      .orderBy("bucket")
  }

  /** The comparison baseline: the same per-bucket stats when rows are
    * laid out by a LINEAR sort on `colA` (equal-frequency buckets via
    * ntile — fine for a baseline, it only feeds the comparison). */
  def linearStats(
      df: DataFrame,
      colA: String,
      colB: String,
      buckets: Int): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window.orderBy(col("__a"), col("__b"))
    df.select(col(colA).cast("long").as("__a"), col(colB).cast("long").as("__b"))
      .withColumn("bucket", (ntile(buckets).over(w) - 1).cast("long"))
      .groupBy("bucket")
      .agg(count(lit(1)).as("n_rows"),
        min("__a").as("a_min"), max("__a").as("a_max"),
        min("__b").as("b_min"), max("__b").as("b_max"))
      .orderBy("bucket")
  }
}
