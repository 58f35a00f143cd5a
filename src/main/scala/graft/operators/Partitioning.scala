package graft.operators

import org.apache.spark.sql.DataFrame

/** Partition-health helpers. */
object Partitioning {

  /** Round-robin repartition `df` up to the cluster's default parallelism
    * — but ONLY if it currently has fewer partitions. A well-partitioned
    * 100 TB input passes through untouched (no shuffle); a small or
    * single-file input (one parquet footer → one task) gets spread so a
    * downstream O(N·M) or per-row-heavy stage can use every core. The
    * shuffle this inserts is O(N) rows of input, always dominated by the
    * work it unlocks. */
  def spread(df: DataFrame): DataFrame = {
    val target = df.sparkSession.sparkContext.defaultParallelism
    if (df.rdd.getNumPartitions < target) df.repartition(target) else df
  }
}
