package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {
  def main(args: Array[String]): Unit = {
    val Array(sfDir, outDir) = args
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(outDir).mkdirs()
    // Local-iteration filter (driver leaves it unset → full run):
    // comma-separated query names to dump.
    val only = sys.env.get("SPARK_GRAFT_VERIFY_ONLY")
      .map(_.split(",").map(_.trim).toSet)
    val selected = SparkEntry.queries
      .filter { case (name, _) => only.forall(_.contains(name)) }
    val failed = scala.collection.mutable.ListBuffer.empty[String]
    // Per-query engine seconds (plan + execute + single-file write) —
    // tools/check_oracle.py merges these into its gate output so every
    // scale-gate row carries {spark_s, oracle_s} separately (VERDICT
    // r10 #3: a 1,519.9s combined reading for q_range_join at sf10 was
    // unattributable between engine and oracle).
    val times = scala.collection.mutable.LinkedHashMap.empty[String, Double]
    selected.foreach { case (name, fn) =>
      val t0 = System.nanoTime()
      try {
        fn(spark, sfDir).coalesce(1).write.mode("overwrite")
          .parquet(s"$outDir/$name")
        times(name) = (System.nanoTime() - t0) / 1e9
      } catch { case e: Throwable =>
        System.err.println(s"[verify] $name failed: ${e.getMessage}")
        failed += name
      }
    }
    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val json = SparkEntry.oracleSql
      .filter { case (k, _) => only.forall(_.contains(k)) }
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    // Loud-failure contract (VERDICT r6 #4): a thrown query must never
    // produce a silently smaller CORRECTNESS file. skipped.json is always
    // written (empty list when clean) so the driver's artifact dir is
    // self-auditing; any skip also exits non-zero — AFTER all dumps and
    // oracle_sql.json are on disk, so a tolerant driver still has every
    // completed result.
    Files.writeString(Paths.get(s"$outDir/skipped.json"),
      failed.sorted.map(q).mkString("[", ",", "]"))
    Files.writeString(Paths.get(s"$outDir/spark_times.json"),
      times.map { case (k, v) => s"${q(k)}: ${"%.1f".format(v)}" }
        .mkString("{", ",", "}"))
    spark.stop()
    if (failed.nonEmpty) {
      System.err.println(
        s"[verify] ${failed.size}/${selected.size} queries FAILED to dump: " +
          failed.sorted.mkString(", "))
      sys.exit(2)
    }
  }
}
