package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Column profiling — the data-quality pass (Deequ/Great-Expectations
  * family) a pipeline runs before training on a new drop: per-column
  * null counts, exact distincts, min/max, and the modal value.
  *
  * Scale shape: ALL per-column scalar stats compute in ONE aggregation
  * pass over the table (a single partial/final agg — no per-column
  * scans); the modal value is one groupBy per column over (value,
  * count) pairs, each reduced map-side. At 100 TB the exact
  * `countDistinct` is the piece you'd swap for `approx_count_distinct`
  * (the HLL sketch path [[Sketches.mergedDistinct]] already provides) —
  * kept exact here so the oracle replays it. Min/max/mode stringify;
  * callers profile integral/string columns (double→string formatting
  * is engine-specific — pre-scale money to cents first). */
object Profile {

  /** One row per profiled column:
    * `(column, n_rows, n_nulls, n_distinct, min_val, max_val,
    * top_value, top_count)` — `top_value` ties break to the SMALLEST
    * value string. */
  def profile(df: DataFrame, cols: Seq[String]): DataFrame = {
    // pass 1: row count + NATIVE-typed min/max per column, stringified
    // after the fact (string-min of ints would rank "9" > "10"); no
    // count-distinct here — a multi-column exact distinct would EXPAND
    // every row |cols|× inside one aggregate
    val scalarAggs = cols.flatMap { c =>
      Seq(
        min(col(c)).cast("string").as(s"__min_$c"),
        max(col(c)).cast("string").as(s"__max_$c"))
    }
    val totals = df.agg(count(lit(1)).as("__n"), scalarAggs: _*)
    val spark = df.sparkSession
    import spark.implicits._
    val scalarRows = totals.collect()(0)
    val n = scalarRows.getAs[Long]("__n")
    // pass 2: ONE melted (column, value, cnt) frame (explode a per-row
    // column→value map) feeds distincts, null counts AND the modal
    // value — materialized once; every aggregation over it is fully
    // partial (no per-column window sort, so a high-cardinality column
    // never pins a partition at scale)
    val melted = df.select(explode(map(
      cols.flatMap(c => Seq(lit(c), col(c).cast("string"))): _*))
      .as(Seq("column", "v")))
      .filter(col("v").isNotNull)
      .groupBy("column", "v").agg(count(lit(1)).as("cnt"))
      .localCheckpoint()
    val colStats = melted.groupBy("column")
      .agg(count(lit(1)).as("nd"), sum("cnt").as("nonnull"), max("cnt").as("mc"))
      .collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3)))
      .toMap
    val tops: Map[String, Option[(String, Long)]] = cols.map(_ -> Option
      .empty[(String, Long)]).toMap ++
      melted.groupBy("column").agg(max("cnt").as("cnt"))
        .join(melted, Seq("column", "cnt"))
        .groupBy("column", "cnt").agg(min("v").as("v"))
        .collect()
        .map(r => r.getString(0) ->
          Some((r.getString(2), r.getLong(1)))).toMap
    cols.map { c =>
      val (nd, nonnull, _) = colStats.getOrElse(c, (0L, 0L, 0L))
      (c, n,
        n - nonnull,
        nd,
        scalarRows.getAs[String](s"__min_$c"),
        scalarRows.getAs[String](s"__max_$c"),
        tops(c).map(_._1).orNull,
        tops(c).map(_._2).getOrElse(0L))
    }.toDF("column", "n_rows", "n_nulls", "n_distinct", "min_val", "max_val",
      "top_value", "top_count")
  }
}
