package graft

import org.apache.spark.sql.SparkSession

/** One-off diagnostic: run q_stream_pairs once and dump the streaming
  * progress breakdown (durationMs per phase, state operator metrics). */
object StreamDiag {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val builder = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
    // A/B knob (VERDICT r15 #7): SPARK_GRAFT_STATE_PROVIDER=rocksdb
    // swaps the state-store provider so the width-32 q_stream_pairs
    // bottleneck can be attributed between the HDFS-backed in-memory
    // store and RocksDB on the same fixture.
    sys.env.get("SPARK_GRAFT_STATE_PROVIDER").foreach {
      case "rocksdb" => builder.config(
        "spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
      case other => System.err.println(s"[diag] unknown provider '$other', using default")
    }
    // A/B knob #2 (VERDICT r17 #4): SPARK_GRAFT_JOIN_STATE_FORMAT=1|2|3
    // swaps the stream-stream join STATE FORMAT (1 = legacy two-store
    // layout, 2 = default KeyWithIndexToValue layout, 3 = single store
    // with virtual column families — RocksDB only), so the state-
    // insertion bottleneck can be attributed between provider and
    // format. Diagnosis-only: the declared query keeps Spark's default.
    sys.env.get("SPARK_GRAFT_JOIN_STATE_FORMAT").foreach { v =>
      builder.config("spark.sql.streaming.join.stateFormatVersion", v)
    }
    val spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    spark.streams.addListener(new org.apache.spark.sql.streaming.StreamingQueryListener {
      import org.apache.spark.sql.streaming.StreamingQueryListener._
      override def onQueryStarted(e: QueryStartedEvent): Unit = ()
      override def onQueryTerminated(e: QueryTerminatedEvent): Unit = ()
      override def onQueryProgress(e: QueryProgressEvent): Unit =
        println("PROGRESS " + e.progress.json)
    })
    val t0 = System.nanoTime()
    val df = Queries.queries("q_stream_pairs")(spark, sfDir)
    df.queryExecution.toRdd.foreach(_ => ())
    println(f"TOTAL ${(System.nanoTime() - t0) / 1e9}%.2f s")
    Thread.sleep(2000) // let listener drain
    spark.stop()
  }
}
