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
    val nN = naive.count(); val nS = salted.count()
    val d1 = naive.except(salted).count()
    val d2 = salted.except(naive).count()
    println(s"PAIRS naive=$nN salted=$nS naive_minus_salted=$d1 salted_minus_naive=$d2")
    println(if (d1 == 0 && d2 == 0 && nN == nS) "SALT DIFFERENTIAL PASS"
      else "SALT DIFFERENTIAL FAIL")
    spark.stop()
    if (d1 != 0 || d2 != 0 || nN != nS) sys.exit(2)
  }
}
