package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Fixture readers (TESTDATA.md / FIXTURES.md §2). Each is a plain parquet
  * scan — projections/filters applied downstream push into the scan via
  * Catalyst. `embeddings.embedding` is widened `ARRAY<FLOAT>` →
  * `ARRAY<DOUBLE>` at scan (SURVEY §2.4.4) so all score arithmetic is
  * double-precision, matching the DuckDB oracle's `::DOUBLE[]` cast.
  */
object Tables {
  private def read(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  /** `vec_id BIGINT, embedding ARRAY<DOUBLE>[64], label INT` */
  def embeddings(spark: SparkSession, dir: String): DataFrame =
    read(spark, dir, "embeddings")
      .withColumn("embedding", col("embedding").cast("array<double>"))

  /** `doc_id BIGINT, text STRING, lang STRING, source STRING, n_chars BIGINT` */
  def documents(spark: SparkSession, dir: String): DataFrame =
    read(spark, dir, "documents")

  def lineitem(spark: SparkSession, dir: String): DataFrame =
    read(spark, dir, "lineitem")
  def orders(spark: SparkSession, dir: String): DataFrame =
    read(spark, dir, "orders")
  def customer(spark: SparkSession, dir: String): DataFrame =
    read(spark, dir, "customer")
  def part(spark: SparkSession, dir: String): DataFrame =
    read(spark, dir, "part")
  def supplier(spark: SparkSession, dir: String): DataFrame =
    read(spark, dir, "supplier")
  def nation(spark: SparkSession, dir: String): DataFrame =
    read(spark, dir, "nation")
  def region(spark: SparkSession, dir: String): DataFrame =
    read(spark, dir, "region")
  /** The fixture stores `ts` as parquet TIMESTAMP(NANOS), which Spark 4
    * refuses to read as a timestamp (PARQUET_TYPE_ILLEGAL). Read nanos
    * as raw longs and convert with integer division (`div` keeps the
    * full 64 bits — a double roundtrip would lose precision above 2^53).
    * NOTE: `div` truncates toward ZERO, while DuckDB's ns→µs cast floors
    * toward −∞ — the two agree only for NON-NEGATIVE (post-epoch) nanos,
    * which the fixture guarantees; pre-epoch data would need
    * `floor`-division (`(ts - pmod(ts, 1000)) div 1000`). */
  def events(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    read(spark, dir, "events")
      .withColumn("ts", timestamp_micros(expr("ts div 1000")))
  }

  /** Embedding fixture width (FIXTURES.md §2). */
  val EmbeddingDim = 64
}
