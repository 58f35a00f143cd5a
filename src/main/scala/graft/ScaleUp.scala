package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scale-sweep fixture generator (VERDICT r7 "Next round" #3).
  *
  * The driver ships fixtures only up to sf0.1 (TESTDATA.md), so the
  * "plans survive 100×" claims have only ever been plan-shape arguments.
  * This main replicates an existing fixture N× with key remapping into a
  * writable dir, so Bench/Verify can take one measured step up the scale
  * curve (default: sf0.1 × 10 ≈ sf1 — 6M lineitem rows, 1M events, 50k
  * docs/vectors) and catch any shape that only dies with data
  * (candidate-pair growth, propagation-round count, landing-dir fan-in).
  *
  * Replication is NOT naive row duplication — that would manufacture
  * pathologies the real data distribution doesn't have (10-identical-
  * vector LSH buckets → quadratic bucket joins; 10× uniform exact-dup
  * groups). Instead each replica k gets:
  *  - every primary/foreign key offset by k·10⁸ (FK joins stay intact
  *    WITHIN a replica; cross-replica keys never collide), while the
  *    shared dimension tables `region`/`nation` are written once and
  *    their small key space is left untouched — exactly how a real corpus
  *    grows: facts multiply, dimensions don't;
  *  - embeddings rotated left by k positions — norm- and distribution-
  *    preserving, so replicas are DISTINCT vectors that still fill the
  *    same space (LSH/IVF cell occupancy grows ~linearly, not
  *    quadratically in one bucket);
  *  - document text suffixed with a replica token (replicas are
  *    near-dups of each other — Jaccard ≈ 1 — so the near-dup family
  *    gets a genuine 10-clique stress test, while exact-dedup groups
  *    stay replica-local thanks to the suffix);
  *  - event ids/users offset, timestamps shifted by k·(span+1h) — and
  *    since r11 orders/lineitem dates by k·(shared span+7d) — so
  *    replicas EXTEND every time axis instead of densifying it: a 10×
  *    fixture covers ~10× the wall-clock, the way a real corpus grows,
  *    and interval joins / watermark sweeps measure plan scaling rather
  *    than a manufactured density² window (the r11 sf10 gate measured
  *    the dense-axis q_range_join match set at 18.5 billion pairs).
  *
  * Determinism: pure column arithmetic over the seed=42 fixture — no
  * rand(), so the scaled fixture is itself reproducible bit-for-bit.
  *
  * Usage: SPARK_GRAFT_SCALE_IN=/root/testdata/sf0.1
  *        SPARK_GRAFT_SCALE_OUT=target/scaledata/sf1
  *        SPARK_GRAFT_SCALE_FACTOR=10  sbt "runMain graft.ScaleUp"
  */
object ScaleUp {
  /** Key offset per replica: far above any fixture key (max observed key
    * at sf0.1 is ~6·10⁵) and far below 2⁶³/10, so offsets never collide
    * or overflow. */
  val ReplicaOffset = 100000000L

  def main(args: Array[String]): Unit = {
    val in = sys.env.getOrElse("SPARK_GRAFT_SCALE_IN", "/root/testdata/sf0.1")
    val out = sys.env.getOrElse("SPARK_GRAFT_SCALE_OUT", "target/scaledata/sf1")
    val factor = sys.env.getOrElse("SPARK_GRAFT_SCALE_FACTOR", "10").toInt
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    // chaining guard: applying ScaleUp to its OWN output collides keys —
    // replica offsets j·10⁸ added to already-offset keys k·10⁸ repeat
    // wherever j+k coincides (≈45% duplicate ids at 10×10), silently
    // corrupting every uniqueness-dependent query. Scale from the
    // ORIGINAL fixture with a larger factor instead (sf10 = sf0.1×100).
    val maxKeyRow = spark.read.parquet(s"$in/documents.parquet")
      .agg(max(col("doc_id"))).head()
    require(!maxKeyRow.isNullAt(0),
      s"input $in has an empty documents table (max(doc_id) is NULL) — " +
        "nothing to scale; point SPARK_GRAFT_SCALE_IN at a populated fixture")
    val maxKey = maxKeyRow.getLong(0)
    require(maxKey < ReplicaOffset,
      s"input $in already carries replica-offset keys (max doc_id $maxKey" +
        s" >= $ReplicaOffset): scale from the original fixture with a" +
        " larger factor instead of chaining ScaleUp")
    require(factor.toLong * ReplicaOffset < Long.MaxValue / 4,
      s"factor $factor would push keys toward overflow")

    def replicate(base: DataFrame)(per: (DataFrame, Int) => DataFrame): DataFrame =
      (0 until factor).map(k => per(base, k)).reduce(_ unionAll _)

    def off(c: String, k: Int) = col(c) + lit(k * ReplicaOffset)

    def write(df: DataFrame, name: String): Unit = {
      df.write.mode("overwrite").parquet(s"$out/$name.parquet")
      println(s"[scaleup] $name: ${spark.read.parquet(s"$out/$name.parquet").count()} rows")
    }

    // shared dimensions: written once, keys untouched
    write(Tables.nation(spark, in), "nation")
    write(Tables.region(spark, in), "region")

    write(replicate(Tables.customer(spark, in)) { (df, k) =>
      df.withColumn("c_custkey", off("c_custkey", k))
    }, "customer")

    write(replicate(Tables.supplier(spark, in)) { (df, k) =>
      df.withColumn("s_suppkey", off("s_suppkey", k))
    }, "supplier")

    write(replicate(Tables.part(spark, in)) { (df, k) =>
      df.withColumn("p_partkey", off("p_partkey", k))
    }, "part")

    // orders/lineitem replicas EXTEND the shared order-processing time
    // axis, exactly as events replicas do below (r10 extended events
    // only, and the r11 sf10 gate measured what that omission costs:
    // every replica's orders landed in the SAME months, so q_range_join's
    // March-1995 interval density grew 100× and its true match set hit
    // 18.5 BILLION pairs — factor² output growth no join strategy can
    // beat, a fixture artifact, not a plan cost; a real 100× corpus has
    // ~100× the matches). The span is computed across BOTH tables' date
    // columns and both shift by the same k·(span+7d), so within-replica
    // o_orderdate ↔ l_shipdate correlation (ship-within-days-of-order)
    // is preserved exactly; the 7-day gap keeps replica boundaries
    // beyond any interval join's reach (the declared row probes ±3d on
    // 4d buckets). NTZ in, NTZ out: the shift runs in unix micros under
    // the pinned-UTC session and casts back, so the parquet footer
    // contract (timestamp[us], no tz) is unchanged.
    val ordIn = Tables.orders(spark, in)
    val liIn = Tables.lineitem(spark, in)
    def micros(c: String) = unix_micros(col(c).cast("timestamp"))
    val odBounds = ordIn.agg(min(micros("o_orderdate")), max(micros("o_orderdate"))).head()
    val sdBounds = liIn.agg(min(micros("l_shipdate")), max(micros("l_shipdate"))).head()
    require(!odBounds.isNullAt(0) && !sdBounds.isNullAt(0),
      s"input $in has empty orders/lineitem date columns — nothing to scale")
    val orderSpanMicros = math.max(odBounds.getLong(1), sdBounds.getLong(1)) -
      math.min(odBounds.getLong(0), sdBounds.getLong(0)) + 7L * 86400L * 1000000L
    def shiftDate(c: String, k: Int) =
      timestamp_micros(micros(c) + lit(k * orderSpanMicros)).cast("timestamp_ntz")

    write(replicate(ordIn) { (df, k) =>
      df.withColumn("o_orderkey", off("o_orderkey", k))
        .withColumn("o_custkey", off("o_custkey", k))
        .withColumn("o_orderdate", shiftDate("o_orderdate", k))
    }, "orders")

    write(replicate(liIn) { (df, k) =>
      df.withColumn("l_orderkey", off("l_orderkey", k))
        .withColumn("l_partkey", off("l_partkey", k))
        .withColumn("l_suppkey", off("l_suppkey", k))
        .withColumn("l_shipdate", shiftDate("l_shipdate", k))
    }, "lineitem")

    write(replicate(Tables.documents(spark, in)) { (df, k) =>
      val tagged = if (k == 0) df.withColumn("text", col("text"))
        else df.withColumn("text", concat(col("text"), lit(s" rep$k")))
      tagged.withColumn("doc_id", off("doc_id", k))
        .withColumn("n_chars", length(col("text")).cast("bigint"))
    }, "documents")

    // rotate-left by k: slice(v, k+1, dim-k) ++ slice(v, 1, k); the
    // fixture embedding is ARRAY<FLOAT> pre-cast — keep the raw type so
    // the scaled fixture has the SAME footer contract as the original
    write(replicate(spark.read.parquet(s"$in/embeddings.parquet")) { (df, k) =>
      val dim = Tables.EmbeddingDim
      val rot = k % dim
      val rotated = if (rot == 0) col("embedding")
        else concat(slice(col("embedding"), rot + 1, dim - rot),
                    slice(col("embedding"), 1, rot))
      df.withColumn("vec_id", off("vec_id", k))
        .withColumn("embedding", rotated)
    }, "embeddings")

    // Replicas EXTEND the time axis instead of densifying it (VERDICT r9
    // "What's missing" #3): replica k's events shift by k·(span + 1h), so
    // a 10× fixture covers ~10× the wall-clock — how a real crawl grows —
    // and interval joins / sessionization / watermark sweeps measure plan
    // scaling, not a manufactured 100×-density window. The old k-ms
    // jitter densified one month: interval-join matches grew ~factor²/10
    // (q_range_join 57× at sf10 — a fixture artifact, not a plan cost).
    // The 1h gap keeps replica boundaries outside any session/window
    // reach (fixture sessions gap at 30min); offsets stay pure column
    // arithmetic over deterministic inputs, so the fixture remains
    // reproducible bit-for-bit.
    val evIn = Tables.events(spark, in)
    val spanRow = evIn.agg(
      min(unix_micros(col("ts"))), max(unix_micros(col("ts")))).head()
    require(!spanRow.isNullAt(0),
      s"input $in has an empty events table — nothing to scale")
    val spanMicros = spanRow.getLong(1) - spanRow.getLong(0) + 3600L * 1000000L
    write(replicate(evIn) { (df, k) =>
      df.withColumn("event_id", off("event_id", k))
        .withColumn("user_id", off("user_id", k))
        .withColumn("ts", timestamp_micros(unix_micros(col("ts")) + lit(k * spanMicros)))
    }, "events")

    spark.stop()
  }
}
