package graft

import org.apache.spark.sql.SparkSession

/** Diagnostic: print the formatted physical plan of declared queries —
  * `runMain graft.Explain <sfDir> [queryName ...]` (no names → all).
  * Used to audit scan pruning (`ReadSchema`/`PushedFilters`), codegen
  * spans, and that vector kernels appear once per row in the plan. */
object Explain {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val names = if (args.length > 1) args.drop(1).toSeq else Queries.all.map(_.name)
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    names.foreach { name =>
      println(s"\n========== $name ==========")
      Queries.queries(name)(spark, sfDir).explain("formatted")
    }
    spark.stop()
  }
}
