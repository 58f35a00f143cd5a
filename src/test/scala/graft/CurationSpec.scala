package graft

import org.apache.spark.sql.functions._

import graft.operators.{Curation, TextOps}

/** Curation operators: the funnel ledger's counting contracts, the
  * rank-tercile bucket invariants, and the BPE/PMI count models checked
  * against hand-computed fixtures. */
class CurationSpec extends SparkSpec {

  private lazy val docs = Tables.documents(spark, Sf0001).cache()

  // ---------------------------------------------------------------- funnel

  private lazy val funnelStages = Seq(
    "min_chars" -> (col("n_chars") >= 100),
    "max_chars" -> (col("n_chars") <= 500),
    "en_only" -> (col("lang") === "en"))

  test("funnelReport: n_in chains and n_kept matches independent filters") {
    val rows = Curation.funnelReport(docs, funnelStages)
      .orderBy("stage").collect()
    assert(rows.length == funnelStages.size)
    assert(rows.head.getAs[Long]("n_in") == docs.count())
    rows.sliding(2).foreach {
      case Array(a, b) =>
        assert(b.getAs[Long]("n_in") == a.getAs[Long]("n_kept"))
      case _ =>
    }
    // n_kept at stage i == count of docs passing the conjunction 1..i
    funnelStages.indices.foreach { i =>
      val conj = funnelStages.take(i + 1).map(_._2).reduce(_ && _)
      assert(rows(i).getAs[Long]("n_kept") == docs.filter(conj).count(),
        s"stage ${i + 1} n_kept")
    }
    rows.foreach { r =>
      assert(r.getAs[Long]("n_dropped")
        == r.getAs[Long]("n_in") - r.getAs[Long]("n_kept"))
    }
  }

  test("funnelReport: a kill-all stage zeroes every later stage") {
    val rows = Curation.funnelReport(docs,
      Seq("all" -> lit(true), "none" -> lit(false), "after" -> lit(true)))
      .orderBy("stage").collect()
    assert(rows(0).getAs[Long]("n_kept") == docs.count())
    assert(rows(1).getAs[Long]("n_kept") == 0L)
    assert(rows(2).getAs[Long]("n_in") == 0L && rows(2).getAs[Long]("n_kept") == 0L)
  }

  // ------------------------------------------------------ perplexity buckets

  test("perplexityBuckets: buckets partition the scored docs at rank terciles") {
    val buckets = Curation.perplexityBuckets(docs, "doc_id", "text", "lang", 3)
      .collect()
    val scoredPerLang = TextOps.lmScore(docs, "doc_id", "text", 3)
      .join(docs.select("doc_id", "lang"), "doc_id")
      .groupBy("lang").agg(count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // bucket doc counts sum to the scored count per language
    val perLang = buckets.groupBy(_.getAs[String]("lang"))
    perLang.foreach { case (lang, rows) =>
      assert(rows.map(_.getAs[Long]("n_docs")).sum == scoredPerLang(lang), lang)
      // head holds at least ceil(n/3) docs (ties can only grow it), and
      // head scores sit strictly above middle scores
      val n = scoredPerLang(lang)
      val byBucket = rows.map(r => r.getAs[String]("bucket") -> r).toMap
      val head = byBucket("head")
      assert(head.getAs[Long]("n_docs") >= (n + 2) / 3, s"$lang head size")
      byBucket.get("middle").foreach { mid =>
        assert(head.getAs[Long]("min_score_milli")
          > mid.getAs[Long]("max_score_milli"), s"$lang head>middle")
        byBucket.get("tail").foreach { tail =>
          assert(mid.getAs[Long]("min_score_milli")
            > tail.getAs[Long]("max_score_milli"), s"$lang middle>tail")
        }
      }
    }
    assert(perLang.keySet == scoredPerLang.keySet)
  }

  // ------------------------------------------------------------------- bpe

  test("bpeMergeCandidates matches the hand-computed pair table") {
    import spark.implicits._
    // vocab: "aaa" f=2 (pair aa at 2 positions -> 2*2=4), "bb" f=1,
    // "ab" f=3, single-char "a" ignored
    val df = Seq("aaa bb ab a", "aaa ab", "ab").toDF("text")
    val got = TextOps.bpeMergeCandidates(df, "text", 10)
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(got.toSeq == Seq(("aa", 4L, 1L), ("ab", 3L, 1L), ("bb", 1L, 1L)))
  }

  test("bpeMergeCandidates: intra-word repeats count per position") {
    import spark.implicits._
    val got = TextOps.bpeMergeCandidates(Seq("abab").toDF("text"), "text", 10)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    // positions: ab, ba, ab -> ab:2, ba:1
    assert(got.toSeq == Seq(("ab", 2L, 1L), ("ba", 1L, 1L)))
  }

  // ------------------------------------------------------------------- pmi

  test("pmiBigrams reproduces the integer-micro PMI formula") {
    import spark.implicits._
    val df = Seq("x y x y z", "x y w", "z w").toDF("text")
    // unigrams: x:3 y:3 z:2 w:2 (N=10); bigrams: "x y":3 "y x":1 "y z":1
    // "y w":1 "z w":1
    val got = TextOps.pmiBigrams(df, "text", 1L, 10).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4)))
    def lnMicro(x: Long): Long = math.floor(math.log(x.toDouble) * 1e6).toLong
    def pmi(cab: Long, ca: Long, cb: Long): Long =
      lnMicro(cab) + lnMicro(10L) - lnMicro(ca) - lnMicro(cb)
    val expected = Seq(
      ("x y", 3L, 3L, 3L), ("y x", 1L, 3L, 3L), ("y z", 1L, 3L, 2L),
      ("y w", 1L, 3L, 2L), ("z w", 1L, 2L, 2L))
      .map { case (bg, cab, ca, cb) => (bg, cab, ca, cb, pmi(cab, ca, cb)) }
      .sortBy { case (bg, _, _, _, p) => (-p, bg) }
    assert(got.toSeq == expected)
  }

  test("pmiBigrams honours the minCount floor") {
    import spark.implicits._
    val df = Seq("x y x y z", "x y w", "z w").toDF("text")
    val got = TextOps.pmiBigrams(df, "text", 2L, 10).collect()
    assert(got.map(_.getString(0)).toSeq == Seq("x y"))
  }

  // -------------------------------------------------------------- fertility

  test("tokenizerFertility computes exact milli ratios") {
    import spark.implicits._
    val df = Seq(("en", "ab cd, ef", 9L), ("en", "gh 12", 5L))
      .toDF("lang", "text", "n_chars")
    // whitespace words 3 + 2 = 5; subword tokens ab|cd|,|ef + gh|12 = 6
    // fertility = 6000 div 5 = 1200; chars/bpe = 14000 div 6 = 2333
    val r = TextOps.tokenizerFertility(df, "lang", "text", "n_chars")
      .collect().head
    assert((r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
      r.getLong(4), r.getLong(5), r.getLong(6))
      == (("en", 2L, 5L, 6L, 14L, 1200L, 2333L)))
  }

  // ------------------------------------------------------------------ dsir

  test("dsirWeights matches a driver-side sequential model") {
    val k = 64
    val raw = docs.filter(col("doc_id") % 10 =!= 7)
    val target = docs.filter(col("doc_id") % 10 === 7)
    val got = Curation.dsirWeights(raw, target, "doc_id", "text", k)
      .collect()
      .map(r => r.getAs[Long]("doc_id")
        -> (r.getAs[Long]("n_feats"), r.getAs[Long]("weight_micro")))
      .toMap
    // independent model from the featureHash tables
    def rows(df: org.apache.spark.sql.DataFrame) =
      TextOps.featureHash(df, "doc_id", "text", k).collect()
        .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("bucket"),
          r.getAs[Long]("count")))
    val tb = rows(target).groupBy(_._2).map { case (b, rs) => b -> rs.map(_._3).sum }
    val rbRows = rows(raw)
    val rb = rbRows.groupBy(_._2).map { case (b, rs) => b -> rs.map(_._3).sum }
    val nt = tb.values.sum
    val nr = rb.values.sum
    def lnM(x: Long) = math.floor(math.log(x.toDouble) * 1e6).toLong
    def lr(b: Long) =
      lnM(tb.getOrElse(b, 0L) + 1) - lnM(nt + k) - lnM(rb(b) + 1) + lnM(nr + k)
    val expected = rbRows.groupBy(_._1).map { case (id, rs) =>
      id -> (rs.map(_._3).sum, rs.map(r => r._3 * lr(r._2)).sum)
    }
    assert(got == expected)
  }

  test("dsirWeights: a target-looking doc outweighs a raw-only doc") {
    import spark.implicits._
    // target vocabulary {aa}; raw corpus has one doc speaking target
    // and one speaking its own vocabulary {zz} — the target-like doc
    // must score strictly higher
    val raw = Seq((1L, "aa aa aa"), (2L, "zz zz zz")).toDF("doc_id", "text")
    val target = Seq((10L, "aa aa aa aa")).toDF("doc_id", "text")
    val got = Curation.dsirWeights(raw, target, "doc_id", "text", 64)
      .collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("weight_micro"))
      .toMap
    assert(got(1L) > got(2L))
  }
}
