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
    val scalarAggs = cols.flatMap { c =>
      Seq(
        count(when(col(c).isNull, lit(1))).as(s"__nulls_$c"),
        countDistinct(col(c)).as(s"__nd_$c"),
        min(col(c)).cast("string").as(s"__min_$c"),
        max(col(c)).cast("string").as(s"__max_$c"))
    }
    val totals = df.agg(count(lit(1)).as("__n"), scalarAggs: _*)
    val spark = df.sparkSession
    import spark.implicits._
    val scalarRows = totals.collect()(0)
    val n = scalarRows.getAs[Long]("__n")
    val tops = cols.map { c =>
      val t = df.filter(col(c).isNotNull)
        .groupBy(col(c).cast("string").as("v"))
        .agg(count(lit(1)).as("cnt"))
        .orderBy(desc("cnt"), asc("v"))
        .limit(1)
        .collect()
      c -> t.headOption.map(r => (r.getString(0), r.getLong(1)))
    }.toMap
    cols.map { c =>
      (c, n,
        scalarRows.getAs[Long](s"__nulls_$c"),
        scalarRows.getAs[Long](s"__nd_$c"),
        scalarRows.getAs[String](s"__min_$c"),
        scalarRows.getAs[String](s"__max_$c"),
        tops(c).map(_._1).orNull,
        tops(c).map(_._2).getOrElse(0L))
    }.toDF("column", "n_rows", "n_nulls", "n_distinct", "min_val", "max_val",
      "top_value", "top_count")
  }
}
