package graft

import org.apache.spark.sql.types._

/** The fixture TYPE CONTRACT, asserted loudly — the general form of the
  * round-6 lesson ([[EventsFixtureSpec]]): the driver regenerates
  * `/root/testdata` between rounds, and a silent physical-type drift
  * (events `ts` went int64-nanos → TIMESTAMP_MICROS) turned into 16 dark
  * queries because nothing NAMED the drift. This spec pins what the repo
  * actually relies on, so the next drift fails one test with the table
  * and column in the message instead of scattering analysis errors
  * across the suite.
  *
  * Deliberately permissive where a reader normalizes: numeric columns
  * accept any numeric type (Spark arithmetic coerces), `events.ts`
  * accepts the two encodings [[Tables.events]] branches on, and
  * `embeddings.embedding` accepts float or double elements (widened at
  * scan). Only genuinely load-bearing shapes are pinned.
  */
class FixtureContractSpec extends SparkSpec {

  // footer-faithful read — no reader normalization
  private def schemaOf(table: String): StructType = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.read.parquet(s"$Sf0001/$table.parquet").schema
  }

  private def assertCols(table: String, expected: Map[String, DataType => Boolean]): Unit = {
    val schema = schemaOf(table)
    val byName = schema.fields.map(f => f.name -> f.dataType).toMap
    expected.foreach { case (name, ok) =>
      val t = byName.getOrElse(name, fail(
        s"fixture contract drifted: $table.$name is MISSING " +
          s"(present: ${schema.fieldNames.mkString(", ")})"))
      assert(ok(t),
        s"fixture contract drifted: $table.$name is $t — update the " +
          s"reader in Tables.scala (see the events ts branch for the pattern)")
    }
  }

  private val anyNumeric: DataType => Boolean =
    t => t.isInstanceOf[NumericType]
  private val anyIntegral: DataType => Boolean = {
    case ByteType | ShortType | IntegerType | LongType => true
    case _ => false
  }
  private val isString: DataType => Boolean = _ == StringType

  test("documents: id/text/lang/source/n_chars shapes hold") {
    assertCols("documents", Map(
      "doc_id" -> anyIntegral,
      "text" -> isString,
      "lang" -> isString,
      "source" -> isString,
      "n_chars" -> anyIntegral))
  }

  test("embeddings: vec_id integral, embedding array<float|double>, label integral") {
    assertCols("embeddings", Map(
      "vec_id" -> anyIntegral,
      "label" -> anyIntegral,
      "embedding" -> {
        case ArrayType(FloatType | DoubleType, _) => true
        case _ => false
      }))
  }

  test("events: ts is one of the two encodings the reader branches on") {
    assertCols("events", Map(
      "event_id" -> anyIntegral,
      "user_id" -> anyIntegral,
      "event_type" -> isString,
      "value" -> anyNumeric,
      "props" -> isString,
      "ts" -> {
        case LongType => true // int64 nanos (legacy encoding)
        case _: TimestampType | _: TimestampNTZType => true
        case _ => false
      }))
  }

  test("relational tables: keys integral, measures numeric, temporal columns timestamp-or-date") {
    val temporal: DataType => Boolean = {
      case _: TimestampType | _: TimestampNTZType | DateType => true
      case _ => false
    }
    assertCols("lineitem", Map(
      "l_orderkey" -> anyIntegral, "l_partkey" -> anyIntegral,
      "l_quantity" -> anyNumeric, "l_extendedprice" -> anyNumeric,
      "l_discount" -> anyNumeric, "l_tax" -> anyNumeric,
      "l_returnflag" -> isString, "l_shipdate" -> temporal))
    assertCols("orders", Map(
      "o_orderkey" -> anyIntegral, "o_custkey" -> anyIntegral,
      "o_totalprice" -> anyNumeric, "o_orderdate" -> temporal,
      "o_orderstatus" -> isString))
    assertCols("customer", Map(
      "c_custkey" -> anyIntegral, "c_nationkey" -> anyIntegral,
      "c_acctbal" -> anyNumeric, "c_mktsegment" -> isString))
    assertCols("nation", Map(
      "n_nationkey" -> anyIntegral, "n_regionkey" -> anyIntegral,
      "n_name" -> isString))
    assertCols("region", Map(
      "r_regionkey" -> anyIntegral, "r_name" -> isString))
    assertCols("supplier", Map(
      "s_suppkey" -> anyIntegral, "s_nationkey" -> anyIntegral,
      "s_acctbal" -> anyNumeric))
    assertCols("part", Map(
      "p_partkey" -> anyIntegral, "p_brand" -> isString,
      "p_size" -> anyIntegral, "p_retailprice" -> anyNumeric))
  }

  test("centroid-cache fixture signature misses when a fixture is regenerated in place") {
    // VERDICT r12 #4: the centroid/codebook caches key on the fixture
    // DIRECTORY; without a content signature, regenerating a fixture
    // mid-session serves stale centroids to every IVF-family row. The
    // signature must move when a data file's length or mtime moves,
    // and must be one metadata listing (works on a plain directory).
    val dir = java.nio.file.Files.createTempDirectory("graft_sig").toFile
    try {
      val emb = new java.io.File(dir, "embeddings.parquet")
      assert(emb.mkdir())
      val part = new java.io.File(emb, "part-00000.parquet")
      java.nio.file.Files.write(part.toPath, Array[Byte](1, 2, 3))
      part.setLastModified(1000000000000L)
      val sig1 = Queries.fixtureSig(dir.getPath)
      assert(sig1 === Queries.fixtureSig(dir.getPath), "signature must be stable")
      // same length, newer mtime — an in-place rewrite
      part.setLastModified(1000000005000L)
      val sig2 = Queries.fixtureSig(dir.getPath)
      assert(sig2 !== sig1, "mtime change must change the signature")
      // longer file — appended/regenerated data
      java.nio.file.Files.write(part.toPath, Array[Byte](1, 2, 3, 4))
      part.setLastModified(1000000005000L)
      assert(Queries.fixtureSig(dir.getPath) !== sig2,
        "length change must change the signature")
    } finally {
      def rm(f: java.io.File): Unit = {
        Option(f.listFiles()).foreach(_.foreach(rm)); f.delete(); ()
      }
      rm(dir)
    }
  }
}
