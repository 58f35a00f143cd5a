package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.operators.{Partitioning, Sketches}

/** One-off differential gate for the r18 skew-split
  * ([[Sketches.bandSelfPairs]]): at scale factors where hot buckets
  * actually exceed [[Sketches.SaltBucketRows]] (the driver fixtures and
  * sf1 never do — their max bucket is 631 ids — so the oracle gates
  * only exercise the G = 1 identity path), compare the SALTED pair
  * multiset against the naive `a < b` self-join on the SAME band table,
  * both ways, in one Spark session. Prints the per-bucket-size
  * histogram tail (the skew evidence), the two aggregate frames'
  * symmetric difference (must be 0 / 0), and row counts.
  * `runMain graft.SaltDiag` with SPARK_GRAFT_SF_DIR pointing at the
  * scale fixture. */
object SaltDiag {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "target/scaledata/sf10")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    // Spill profile (VERDICT r17 #6): per-job-description totals of
    // task time, spill, shuffle, and the max/median task-time skew of
    // the heaviest stage — printed as SPILL lines at exit.
    import org.apache.spark.scheduler._
    import scala.collection.mutable
    val jobOfStage = mutable.Map.empty[Int, String]
    case class Acc(var taskMs: Long = 0, var memSpill: Long = 0,
      var diskSpill: Long = 0, var shufWrite: Long = 0,
      var stageMax: mutable.Map[Int, (Long, mutable.ArrayBuffer[Long])] =
        mutable.Map.empty)
    val accs = mutable.LinkedHashMap.empty[String, Acc]
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit = {
        val desc = Option(j.properties)
          .flatMap(p => Option(p.getProperty("spark.job.description")))
          .getOrElse("unlabeled")
        j.stageIds.foreach(s => jobOfStage(s) = desc)
      }
      override def onTaskEnd(t: SparkListenerTaskEnd): Unit = synchronized {
        val desc = jobOfStage.getOrElse(t.stageId, "unlabeled")
        val a = accs.getOrElseUpdate(desc, Acc())
        val m = t.taskMetrics
        if (m != null) {
          a.taskMs += m.executorRunTime
          a.memSpill += m.memoryBytesSpilled
          a.diskSpill += m.diskBytesSpilled
          a.shufWrite += m.shuffleWriteMetrics.bytesWritten
          val (_, buf) = a.stageMax.getOrElseUpdate(t.stageId,
            (0L, mutable.ArrayBuffer.empty[Long]))
          buf += m.executorRunTime
        }
      }
    })
    def report(): Unit = accs.foreach { case (desc, a) =>
      val worst = a.stageMax.values.map(_._2).filter(_.nonEmpty)
        .maxByOption(_.sum)
      val skew = worst.map { b =>
        val s = b.sorted; f"max/med=${s.last.toDouble / math.max(1, s(s.length / 2))}%.1f"
      }.getOrElse("")
      println(f"SPILL $desc%-12s taskTime=${a.taskMs / 1000.0}%8.1fs " +
        f"memSpill=${a.memSpill / 1e9}%6.2fGB diskSpill=${a.diskSpill / 1e9}%6.2fGB " +
        f"shufWrite=${a.shufWrite / 1e9}%6.2fGB $skew")
    }

    val docs = Tables.documents(spark, sfDir)
    val sig = Sketches.minhashSignature(docs, "doc_id", "text",
      Queries.ShingleK, Queries.MinhashM).localCheckpoint()
    val bk = Sketches.minhashBands(sig, "doc_id",
      Queries.MinhashBands, Queries.MinhashM / Queries.MinhashBands)
      .localCheckpoint()

    // skew evidence: bucket-size histogram tail
    val sizes = bk.groupBy("band", "band_key").agg(count(lit(1)).as("n"))
      .localCheckpoint()
    val agg = sizes.agg(max("n").as("max"), avg("n").as("mean"),
      count(lit(1)).as("buckets"),
      sum(col("n") * col("n")).as("sum_sq")).collect()(0)
    println(s"BUCKETS max=${agg.get(0)} mean=${agg.get(1)} " +
      s"n_buckets=${agg.get(2)} sum_n_sq=${agg.get(3)}")
    sizes.filter(col("n") > 512).groupBy("n").agg(count(lit(1)).as("k"))
      .orderBy(desc("n")).collect()
      .foreach(r => println(s"HOTBUCKET size=${r.get(0)} count=${r.get(1)}"))

    def counted(df: org.apache.spark.sql.DataFrame) =
      df.groupBy("a_id", "b_id").agg(count(lit(1)).as("n_bands"))
    val naive = counted(
      bk.select(col("doc_id").as("a_id"), col("band"), col("band_key"))
        .join(bk.select(col("doc_id").as("b_id"), col("band"), col("band_key")),
          Seq("band", "band_key"))
        .filter(col("a_id") < col("b_id")))
    val salted = counted(Sketches.bandSelfPairs(bk, "doc_id"))
    def timedCount(label: String, df: org.apache.spark.sql.DataFrame): Long = {
      spark.sparkContext.setJobDescription(label)
      val t0 = System.nanoTime()
      val n = df.count()
      println(f"TIME $label%-8s ${(System.nanoTime() - t0) / 1e9}%.1fs")
      spark.sparkContext.setJobDescription(null)
      n
    }
    val nN = timedCount("naive", naive)
    val nS = timedCount("salted", salted)
    spark.sparkContext.setJobDescription("except")
    val d1 = naive.except(salted).count()
    val d2 = salted.except(naive).count()
    spark.sparkContext.setJobDescription(null)
    report()
    println(s"PAIRS naive=$nN salted=$nS naive_minus_salted=$d1 salted_minus_naive=$d2")
    println(if (d1 == 0 && d2 == 0 && nN == nS) "SALT DIFFERENTIAL PASS"
      else "SALT DIFFERENTIAL FAIL")
    spark.stop()
    if (d1 != 0 || d2 != 0 || nN != nS) sys.exit(2)
  }
}
