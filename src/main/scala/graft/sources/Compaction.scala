package graft.sources

import org.apache.spark.sql.SparkSession

/** Small-files compaction — the maintenance op every long-running
  * ingest pipeline needs: streaming sinks and incremental appends leave
  * thousands of KB-sized parquet files, and at 100 TB that kills the
  * read path (one scheduler task + one footer read per file, slow
  * driver-side listing) long before it hurts storage.
  *
  * Sizing uses the optimizer's scan statistics (`sizeInBytes`), not a
  * driver-side file listing: the plan already knows the total bytes
  * from the same metadata the scheduler uses, so compaction needs no
  * extra filesystem pass. `repartition(n)` round-robins rows for even
  * output sizes (an accepted full shuffle — compaction IS a rewrite);
  * callers who need locality pass `partitionCols` for a hash layout
  * co-located with downstream joins instead. */
object Compaction {

  val DefaultTargetBytes: Long = 128L * 1024 * 1024

  /** Rewrite `inPath` into `outPath` as ~`targetBytes` files; returns
    * the file count written. */
  def compact(
      spark: SparkSession,
      inPath: String,
      outPath: String,
      targetBytes: Long = DefaultTargetBytes,
      partitionCols: Seq[String] = Nil): Int = {
    val df = spark.read.parquet(inPath)
    val bytes = df.queryExecution.optimizedPlan.stats.sizeInBytes.toLong
    val parts = math.max(1L, (bytes + targetBytes - 1) / targetBytes).toInt
    val shaped =
      if (partitionCols.nonEmpty)
        df.repartition(parts, partitionCols.map(df.col): _*)
      else df.repartition(parts)
    shaped.write.mode("overwrite").parquet(outPath)
    parts
  }
}
