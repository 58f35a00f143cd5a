package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.StructType

/** Source-format layer beyond parquet: schema-EXPLICIT CSV and JSON-lines
  * readers, plus the matching writers, for corpora that arrive as raw
  * dumps rather than columnar files.
  *
  * Scale rules encoded here (each one is a 100 TB cliff if violated):
  *  - **Never infer schema.** `inferSchema` (CSV) and Spark's JSON
  *    sampling both cost a full extra pass over the data before the real
  *    scan; at 100 TB that is a second 100 TB read. Every reader takes an
  *    explicit `StructType`.
  *  - **Keep malformed rows visible.** PERMISSIVE mode with a named
  *    `_corrupt_record` column (the default DROPMALFORMED silently
  *    deletes data — a dedup/training pipeline must account for every
  *    input row). Callers split good/bad with one filter.
  *  - **Splittability.** Uncompressed (or bzip2/zstd-seekable) text
  *    splits into many tasks; a single gzip file pins the whole read to
  *    one core. Writers here emit uncompressed parts.
  *
  * JSONL/CSV are ingest formats: the first pipeline stage should rewrite
  * them to parquet (partitioned, statistics, column pruning) — see
  * [[graft.VectorTable.save]].
  */
object Sources {

  val CorruptCol = "_corrupt_record"

  /** Schema-explicit CSV with header. Malformed rows land in
    * [[CorruptCol]] (appended to the schema) instead of vanishing. */
  def csv(spark: SparkSession, path: String, schema: StructType): DataFrame =
    spark.read
      .option("header", "true")
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", CorruptCol)
      .schema(schema.add(CorruptCol, "string"))
      .csv(path)

  /** Schema-explicit JSON-lines (one object per line — the splittable
    * JSON layout; multiline JSON is one task per file). */
  def jsonl(spark: SparkSession, path: String, schema: StructType): DataFrame =
    spark.read
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", CorruptCol)
      .schema(schema.add(CorruptCol, "string"))
      .json(path)

  /** Rows that parsed cleanly / rows that did not. NOTE: Spark refuses
    * raw-file plans whose pruned schema is ONLY the internal corrupt
    * column (`UNSUPPORTED_FEATURE.QUERY_ONLY_CORRUPT_RECORD_COLUMN`) —
    * e.g. `bad(df).count()` straight off a read. Use [[split]] for
    * that; these stay cheap for plans that also touch real columns. */
  def good(df: DataFrame): DataFrame =
    df.filter(df.col(CorruptCol).isNull).drop(CorruptCol)
  def bad(df: DataFrame): DataFrame =
    df.filter(df.col(CorruptCol).isNotNull)

  /** Split parsed/corrupt ONCE off a raw read: caches the parsed frame
    * (the documented remedy for the corrupt-column-only restriction —
    * the cached relation replaces the file scan, so pruning no longer
    * reaches the reader). At 100 TB prefer the one-pass form: read,
    * write good and bad out in the same job, then drop the cache. */
  def split(df: DataFrame): (DataFrame, DataFrame) = {
    val cached = df.cache()
    (good(cached), bad(cached))
  }

  def writeCsv(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").option("header", "true").csv(path)

  def writeJsonl(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").json(path)

  /** Snapshot reconciliation between two corpus crawls — the CDC-style
    * accounting every periodic re-crawl needs before incremental
    * processing: which documents were `added`, `removed`, `changed`
    * (same id, different content), or `unchanged`.
    *
    * Scale shape: both sides reduce to `(id, md5)` BEFORE the
    * reconciling full-outer join, so the exchange carries 40-byte rows
    * — never documents — and the join is a plain hash-keyed equi-join.
    * Changed/unchanged is a digest compare on the joined row. The result
    * keeps ids (status + id), so a downstream stage can semi-join back
    * to either snapshot to fetch content for exactly the rows it needs
    * (the added/changed set — the whole point of incremental runs).
    *
    * Output: `(idCol, status STRING)` with status ∈
    * {added, removed, changed, unchanged}. */
  def snapshotDiff(
      oldSnap: DataFrame,
      newSnap: DataFrame,
      idCol: String,
      textCol: String): DataFrame = {
    import org.apache.spark.sql.functions._
    val o = oldSnap.select(col(idCol),
      md5(col(textCol).cast("binary")).as("__oh"))
    val n = newSnap.select(col(idCol),
      md5(col(textCol).cast("binary")).as("__nh"))
    o.join(n, Seq(idCol), "full_outer")
      .select(col(idCol),
        when(col("__oh").isNull, lit("added"))
          .when(col("__nh").isNull, lit("removed"))
          .when(col("__oh") === col("__nh"), lit("unchanged"))
          .otherwise(lit("changed")).as("status"))
  }
}
