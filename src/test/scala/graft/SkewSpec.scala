package graft

import org.apache.spark.sql.functions._

import graft.operators.Skew

/** Salted join: result equivalence with the plain join, and the salt
  * actually spreads a hot key across (key, salt) groups. */
class SkewSpec extends SparkSpec {
  import spark.implicits._

  // 90% of left rows share one hot key
  private lazy val left = spark.range(1000)
    .select(col("id"),
      when(col("id") % 10 =!= 0, lit(7L)).otherwise(col("id") % 100).as("k"))
  private lazy val right = spark.range(100)
    .select(col("id").as("k"), concat(lit("v"), col("id")).as("payload"))

  test("salted join == plain join (same rows, any order)") {
    val plain = left.join(right, "k")
      .select("id", "payload").as[(Long, String)].collect().toSeq.sorted
    val salted = Skew.saltedJoin(left, right, "k", "id", 8)
      .select("id", "payload").as[(Long, String)].collect().toSeq.sorted
    assert(salted == plain)
    assert(plain.nonEmpty)
  }

  test("the hot key spreads across saltFactor groups") {
    val groups = left
      .withColumn("__salt", Skew.salt(col("id"), 8))
      .filter(col("k") === 7)
      .groupBy("__salt").count()
    val n = groups.count()
    assert(n >= 6, s"hot key landed in only $n of 8 salt groups")
    // no group owns more than half the hot rows
    val maxShare = groups.agg(max("count")).collect()(0).getLong(0)
    val total = left.filter(col("k") === 7).count()
    assert(maxShare < total / 2, s"salt imbalance: $maxShare of $total")
  }
}
