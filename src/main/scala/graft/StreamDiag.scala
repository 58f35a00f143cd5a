package graft

import org.apache.spark.sql.SparkSession

/** One-off diagnostic: run q_stream_pairs once and dump the streaming
  * progress breakdown (durationMs per phase, state operator metrics). */
object StreamDiag {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
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
