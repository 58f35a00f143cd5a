package graft

import java.security.MessageDigest

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.operators.{Packing, Sketches, Splits, Temporal, TextOps}

/** Round-5 corpus operators, each checked against an independent Scala
  * model (not the SQL oracle — that runs in the driver's DuckDB gate):
  * segment-level dedup with reassembly, vocabulary heavy hitters,
  * per-group quota sampling, keep-first dedup, and sequence packing. */
class CorpusOpsSpec extends SparkSpec {

  private lazy val docs = Tables.documents(spark, Sf0001).cache()
  private lazy val docRows: Seq[(Long, String)] =
    docs.select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toSeq.sortBy(_._1)

  private def md5hex(s: String): String =
    MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString

  // ------------------------------------------------------ segmentDedup ---

  /** [[TextOps.chunk]] semantics: ceil(len/size) windows, empty → [""]. */
  private def segsOf(text: String, size: Int): Seq[String] =
    if (text.isEmpty) Seq("") else text.grouped(size).toSeq

  test("segmentDedup matches a sequential first-occurrence model") {
    val size = 30
    // model: first corpus occurrence by (doc_id, seg_index)
    val firstOcc = scala.collection.mutable.Map[String, (Long, Int)]()
    for ((id, text) <- docRows; (seg, i) <- segsOf(text, size).zipWithIndex)
      if (!firstOcc.contains(seg)) firstOcc(seg) = (id, i)
    val expected = docRows.flatMap { case (id, text) =>
      val kept = segsOf(text, size).zipWithIndex
        .filter { case (seg, i) => firstOcc(seg) == (id, i) }
      if (kept.isEmpty) None
      else Some(id -> (kept.size.toLong,
        kept.map(_._1.length.toLong).sum,
        kept.map(_._1).mkString))
    }.toMap

    val got = TextOps.segmentDedup(docs, "doc_id", "text", size)
      .collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getString(3)))
      .toMap
    assert(got == expected)
    // and the corpus genuinely repeats at this granularity — some doc lost a segment
    assert(got.exists { case (id, (_, chars, _)) =>
      chars < docRows.toMap.apply(id).length },
      "fixture has no duplicate segments at size 30 — the query certifies a no-op")
  }

  test("segmentDedup's first-occurrence vote is a HashAggregate (packed long), not a SortAggregate") {
    val plan = TextOps.segmentDedup(docs, "doc_id", "text", 30)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("SortAggregate"),
      s"vote fell back to sort-based aggregation:\n$plan")
  }

  test("segmentDedup drops nothing when every segment is unique") {
    import spark.implicits._
    val unique = Seq((1L, "aaaabbbb"), (2L, "ccccdddd")).toDF("doc_id", "text")
    val got = TextOps.segmentDedup(unique, "doc_id", "text", 4)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(1L -> 2L, 2L -> 2L))
  }

  test("segmentDedup collapses empty documents to the first one (empty -> one empty segment)") {
    import spark.implicits._
    val df = Seq((1L, ""), (2L, ""), (3L, "some real text here")).toDF("doc_id", "text")
    val got = TextOps.segmentDedup(df, "doc_id", "text", 4)
      .collect().map(r => r.getLong(0) -> r.getString(3)).toMap
    assert(got.keySet == Set(1L, 3L), s"got $got")
    assert(got(1L) == "")
  }

  test("segmentDedup erases a fully-duplicate later document") {
    import spark.implicits._
    val dup = Seq((1L, "xxxxyyyy"), (2L, "xxxxyyyy")).toDF("doc_id", "text")
    val got = TextOps.segmentDedup(dup, "doc_id", "text", 4)
      .collect().map(r => r.getLong(0)).toSet
    assert(got == Set(1L))
  }

  // ------------------------------------------- scrubFrequentSegments ---

  test("scrubFrequentSegments matches a sequential df-threshold model") {
    val size = 30
    val minDf = 3
    // model: df = DISTINCT docs containing the segment; cut every copy
    // of segments at/over the threshold (first occurrences included)
    val df = docRows
      .flatMap { case (id, text) => segsOf(text, size).distinct.map(_ -> id) }
      .groupBy(_._1).view.mapValues(_.map(_._2).distinct.size).toMap
    val expected = docRows.flatMap { case (id, text) =>
      val kept = segsOf(text, size).filter(df(_) < minDf)
      if (kept.isEmpty) None
      else Some(id -> (kept.size.toLong,
        kept.map(_.length.toLong).sum, kept.mkString))
    }.toMap

    val got = TextOps.scrubFrequentSegments(docs, "doc_id", "text", size, minDf)
      .collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getString(3)))
      .toMap
    assert(got == expected)
    // the threshold genuinely bites on the fixture
    assert(expected.values.map(_._1).sum <
      docRows.map(t => segsOf(t._2, size).size.toLong).sum,
      "fixture has no df>=3 segments at size 30 — the scrub certifies a no-op")
  }

  test("scrubFrequentSegments cuts EVERY copy (unlike segmentDedup's keep-first)") {
    import spark.implicits._
    // "xxxx" appears in 3 docs -> boilerplate at minDf=3, all 3 copies cut;
    // "yyyy"/"zzzz"/"wwww" are unique and survive; doc 3 (all boilerplate) vanishes
    val dup = Seq((1L, "xxxxyyyy"), (2L, "xxxxzzzz"), (3L, "xxxx"), (4L, "wwww"))
      .toDF("doc_id", "text")
    val got = TextOps.scrubFrequentSegments(dup, "doc_id", "text", 4, minDf = 3)
      .collect().map(r => r.getLong(0) -> r.getString(3)).toMap
    assert(got == Map(1L -> "yyyy", 2L -> "zzzz", 4L -> "wwww"), s"got $got")
  }

  test("scrubFrequentSegments counts df per DISTINCT doc (within-doc repeats don't trip it)") {
    import spark.implicits._
    // "abab" repeats 3x inside doc 1 but df=1 -> below minDf=2, survives
    val df = Seq((1L, "ababababab".take(8) + "abab"), (2L, "cdcd"))
      .toDF("doc_id", "text")
    val got = TextOps.scrubFrequentSegments(df, "doc_id", "text", 4, minDf = 2)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(1L -> 3L, 2L -> 1L), s"got $got")
  }

  // ------------------------------------------------------- featureHash ---

  test("featureHash matches a sequential hashing-trick model") {
    val k = 64
    // model mirrors Sketches.shingleHash: md5 -> first 15 hex -> mod P -> mod k
    def bucketOf(tok: String): Long = {
      val d = java.security.MessageDigest.getInstance("MD5")
        .digest(tok.getBytes("UTF-8")).map("%02x".format(_)).mkString
      (java.lang.Long.parseLong(d.take(15), 16) % Sketches.MinhashPrime) % k
    }
    val expected = docRows.flatMap { case (id, text) =>
      text.trim.split(" +", -1).toSeq.groupBy(bucketOf)
        .map { case (b, toks) => (id, b) -> toks.size.toLong }
    }.toMap
    val got = TextOps.featureHash(docs, "doc_id", "text", k)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(got == expected)
    // collisions genuinely occur at this k (the trick's defining behavior)
    assert(expected.keys.groupBy(_._1).exists(_._2.size < 64))
  }

  test("featureHash buckets are stable across partitionings and corpus slices") {
    val k = 64
    def vecs(df: org.apache.spark.sql.DataFrame) =
      TextOps.featureHash(df, "doc_id", "text", k)
        .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    val whole = vecs(docs)
    assert(vecs(docs.repartition(13)) == whole, "not partition-stable")
    // features computed on independent slices concatenate to the whole —
    // the vocabulary-free property (no shared dictionary to drift)
    val a = vecs(docs.filter(col("doc_id") < 250))
    val b = vecs(docs.filter(col("doc_id") >= 250))
    assert(a ++ b == whole, "slice features disagree with whole-corpus features")
  }

  test("groupTopK matches a sequential sort-take model and keeps small groups whole") {
    val langs = docs.select("doc_id", "lang", "n_chars").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    val expected = langs.groupBy(_._2).toSeq.flatMap { case (lang, rows) =>
      rows.sortBy(r => (-r._3, r._1)).take(4).zipWithIndex
        .map { case ((id, _, nc), i) => (id, lang, nc, i + 1L) }
    }.toSet
    val got = Temporal.groupTopK(docs, "lang", "n_chars", "doc_id", 4)
      .select("doc_id", "lang", "n_chars", "group_rank").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3))).toSet
    assert(got == expected)
    // n above the group sizes degrades to a full ranked passthrough
    assert(Temporal.groupTopK(docs, "lang", "n_chars", "doc_id", 100000).count()
      == docs.count())
    // smallest=false picks the other tail
    val shortest = Temporal.groupTopK(docs, "lang", "n_chars", "doc_id", 1,
      largest = false).collect().map(r => r.getAs[String]("lang") -> r.getAs[Long]("n_chars")).toMap
    val minByLang = langs.groupBy(_._2).view.mapValues(_.map(_._3).min).toMap
    assert(shortest == minByLang)
  }

  test("hashedLinearScore matches a sequential integer dot-product model") {
    val k = 64
    def bucketOf(tok: String): Long = {
      val d = java.security.MessageDigest.getInstance("MD5")
        .digest(tok.getBytes("UTF-8")).map("%02x".format(_)).mkString
      (java.lang.Long.parseLong(d.take(15), 16) % Sketches.MinhashPrime) % k
    }
    def w(b: Long): Long = (b + 1) * 7919 % 193 - 96
    val expected = docRows.map { case (id, text) =>
      val score = text.trim.split(" +", -1).map(t => w(bucketOf(t))).sum
      id -> (score, if (score >= 0) 1 else 0)
    }.toMap
    val got = TextOps.hashedLinearScore(docs, "doc_id", "text", k)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getInt(2))).toMap
    assert(got == expected)
    // the stand-in weights genuinely split the corpus (not a constant label)
    assert(got.values.map(_._2).toSet == Set(0, 1))
  }

  // --------------------------------------------------------- vocabTopK ---

  test("vocabTopK matches an exact word-count model") {
    val k = 10
    val counts = scala.collection.mutable.Map[String, (Long, Long)]()
    for ((_, text) <- docRows) {
      val toks = text.trim.split(" +").toSeq
      val tf = toks.groupBy(identity).map { case (t, xs) => t -> xs.size.toLong }
      for ((t, c) <- tf) {
        val (occ, df) = counts.getOrElse(t, (0L, 0L))
        counts(t) = (occ + c, df + 1)
      }
    }
    val expected = counts.toSeq
      .sortBy { case (t, (occ, _)) => (-occ, t) }.take(k)
      .map { case (t, (occ, df)) => (t, occ, df) }
    val got = TextOps.vocabTopK(docs, "doc_id", "text", k)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
    assert(got == expected)
  }

  test("ngramTopK matches an exact trigram-count model (short docs yield none)") {
    val k = 10
    val counts = scala.collection.mutable.Map[String, (Long, Long)]()
    for ((_, text) <- docRows) {
      val toks = text.trim.split(" +").toSeq
      val tris =
        if (toks.size < 3) Seq.empty
        else toks.sliding(3).map(_.mkString(" ")).toSeq
      val tf = tris.groupBy(identity).map { case (t, xs) => t -> xs.size.toLong }
      for ((t, c) <- tf) {
        val (occ, df) = counts.getOrElse(t, (0L, 0L))
        counts(t) = (occ + c, df + 1)
      }
    }
    val expected = counts.toSeq
      .sortBy { case (t, (occ, _)) => (-occ, t) }.take(k)
      .map { case (t, (occ, df)) => (t, occ, df) }
    val got = TextOps.ngramTopK(docs, "doc_id", "text", 3, k)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
    assert(got == expected)
  }

  test("lmScore matches hand-computed trigram log-probs on a tiny corpus") {
    import spark.implicits._
    val tiny = Seq(
      (1L, "a b c a b c"), // trigrams: "a b c"×2, "b c a", "c a b"
      (2L, "x y z"),       // one trigram
      (3L, "too short"))   // 2 tokens → absent
    val got = TextOps.lmScore(tiny.toDF("doc_id", "text"), "doc_id", "text", 3)
      .orderBy("doc_id")
      .select("doc_id", "n_ngrams", "logprob_micro")
      .as[(Long, Long, Long)].collect().toSeq
    // T = 5 total occurrences; ln in micros, floored
    val ln2 = math.floor(math.log(2.0) * 1e6).toLong // 693147
    val ln5 = math.floor(math.log(5.0) * 1e6).toLong // 1609437
    assert(got == Seq(
      (1L, 4L, 2 * ln2 - 4 * ln5), // two c=2 grams, two c=1 grams
      (2L, 1L, 0 - ln5)))
    assert(!got.exists(_._1 == 3L))
  }

  test("lmScore matches a sequential count-LM model on sf0.001") {
    // corpus trigram counts on the raw strings (60-bit hash collisions
    // would diverge here — none at this scale, which this test also pins)
    val counts = scala.collection.mutable.Map[String, Long]()
    val perDocTris = docRows.map { case (id, text) =>
      val toks = text.trim.split(" +").toSeq
      val tris =
        if (toks.size < 3) Seq.empty
        else toks.sliding(3).map(_.mkString(" ")).toSeq
      tris.foreach(t => counts(t) = counts.getOrElse(t, 0L) + 1)
      id -> tris
    }
    val total = counts.values.sum
    val lnT = math.floor(math.log(total.toDouble) * 1e6).toLong
    val expected = perDocTris.filter(_._2.nonEmpty).map { case (id, tris) =>
      val sumLnC = tris.map(t =>
        math.floor(math.log(counts(t).toDouble) * 1e6).toLong).sum
      (id, tris.size.toLong, sumLnC - tris.size * lnT)
    }
    val got = TextOps.lmScore(docs, "doc_id", "text", 3)
      .orderBy("doc_id")
      .select("doc_id", "n_ngrams", "logprob_micro")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(got == expected)
    // every score is a real log-prob: strictly negative (no gram covers
    // the whole corpus)
    assert(got.forall(_._3 < 0L))
  }

  test("lmScore's count join carries hashed grams, not n-gram strings") {
    val plan = TextOps.lmScore(docs, "doc_id", "text", 3)
      .queryExecution.executedPlan.toString
    // the count-table join is keyed on the 60-bit gh column
    assert(plan.contains("gh"))
    assert(!plan.toLowerCase.contains("cartesian"))
  }

  test("vocabTopK plans a TakeOrderedAndProject, not a global sort") {
    val plan = TextOps.vocabTopK(docs, "doc_id", "text", 10)
      .queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"), plan)
  }

  // ------------------------------------------------------- quotaSample ---

  test("quotaSample caps over-quota groups near the quota and keeps under-quota groups whole") {
    val quota = 10L
    val kept = Splits.quotaSample(docs, "doc_id", "source", "qs", quota)
      .groupBy("source").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val totals = docs.groupBy("source").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    for ((src, n) <- totals) {
      val k = kept.getOrElse(src, 0L)
      if (n <= quota) assert(k == n, s"$src under quota but trimmed: $k != $n")
      else {
        // rate-capped: expectation = quota, binomial spread around it
        assert(k <= 2 * quota && k >= 1, s"$src kept $k of $n at quota $quota")
      }
    }
  }

  test("quotaSample kept sets nest as the quota grows and survive repartitioning") {
    def ids(df: DataFrame, quota: Long): Set[Long] =
      Splits.quotaSample(df, "doc_id", "source", "qs", quota)
        .select("doc_id").collect().map(_.getLong(0)).toSet
    val q5 = ids(docs, 5)
    val q15 = ids(docs, 15)
    assert(q5.subsetOf(q15), s"${(q5 -- q15).size} ids leak when quota grows")
    assert(ids(docs.repartition(13), 5) == q5)
  }

  test("quotaSample plans a broadcast of the thresholds, not a shuffle of the corpus by group") {
    val plan = Splits.quotaSample(docs, "doc_id", "source", "qs", 10L)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), plan)
  }

  // -------------------------------------------- temperature / quantile ---

  test("temperatureSample flattens a skewed mixture toward sqrt weights") {
    val target = 200L
    val kept = Splits.temperatureSample(docs, "doc_id", "lang", "tm", target)
      .groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val totals = docs.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val wsum = totals.values.map(math.sqrt(_)).sum
    for ((lang, n) <- totals) {
      val expected = target * math.sqrt(n.toDouble) / wsum
      val k = kept.getOrElse(lang, 0L).toDouble
      // binomial spread: allow 3 sigma + rounding slack
      val sigma = math.sqrt(expected)
      assert(math.abs(k - expected) <= 3 * sigma + 2,
        s"$lang: kept $k, expected ~$expected (n=$n)")
    }
    // the big group's kept FRACTION must be strictly below a small group's
    val (big, small) = ("en", "de")
    assert(kept(big).toDouble / totals(big) < kept(small).toDouble / totals(small),
      s"temperature failed to upweight the tail: $kept vs $totals")
  }

  test("temperatureSample is deterministic across repartitioning") {
    def ids(df: DataFrame) =
      Splits.temperatureSample(df, "doc_id", "lang", "tm", 200L)
        .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(ids(docs) == ids(docs.repartition(13)))
  }

  test("quantileFilter keeps exactly the rows at or above the group quantile") {
    val got = Splits.quantileFilter(docs, "lang", "n_chars", 0.5)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    // model: per-lang exact interpolated median over the collected rows
    val byLang = docs.select("lang", "doc_id", "n_chars").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
      .groupBy(_._1)
    val expected = byLang.values.flatMap { rows =>
      val sorted = rows.map(_._3.toDouble).sorted
      val rank = 0.5 * (sorted.length - 1)
      val (lo, hi) = (sorted(rank.toInt), sorted(math.ceil(rank).toInt))
      val q = lo + (rank - rank.toInt) * (hi - lo)
      rows.filter(_._3 >= q).map(_._2)
    }.toSet
    assert(got == expected)
  }

  // --------------------------------------------------------- keepFirst ---

  test("keepFirst equals the window row_number()=1 form on events") {
    val ev = Tables.events(spark, Sf0001).select(
      col("user_id"), col("event_type"),
      unix_micros(col("ts")).as("us"),
      col("event_id"),
      col("value"))
    val got = Temporal.keepFirst(ev,
      keyCols = Seq("user_id", "event_type"),
      orderCols = Seq("us", "event_id"),
      payloadCols = Seq("value"))
      .collect()
      .map(r => (r.getLong(0), r.getString(1)) -> (r.getLong(2), r.getLong(3), r.getDouble(4)))
      .toMap
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("user_id", "event_type").orderBy("us", "event_id")
    val expected = ev.withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
      .collect()
      .map(r => (r.getLong(0), r.getString(1)) -> (r.getLong(2), r.getLong(3), r.getDouble(4)))
      .toMap
    assert(got == expected)
  }

  test("keepFirst plans a partial aggregate, no window sort of the duplicates") {
    import spark.implicits._
    val df = Seq((1L, 10L, "a"), (1L, 5L, "b"), (2L, 7L, "c"))
      .toDF("k", "ord", "payload")
    val plan = Temporal.keepFirst(df, Seq("k"), Seq("ord"), Seq("payload"))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Window"), s"keepFirst must not window:\n$plan")
    assert(plan.contains("partial_min") || plan.contains("partial min"),
      s"missing map-side combine:\n$plan")
  }

  // ------------------------------------------------------ packingStats ---

  test("packingStats conserves totals and computes exact per-shard layout") {
    val shards = 4
    val ctx = 64
    val got = Packing.packingStats(docs, "doc_id", "text", "pk", shards, ctx)
      .collect()
      .map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5)))
      .toMap

    // independent model: same hash, same order, plain Scala arithmetic
    val prime = graft.operators.Sketches.MinhashPrime
    def bucket(id: Long): Long =
      (java.lang.Long.parseLong(md5hex(s"pk:$id").take(15), 16) % prime) % Splits.Buckets
    def tokCount(text: String): Long = text.trim.split(" +").length.toLong
    val byShard = docRows
      .map { case (id, text) => (bucket(id) % shards, bucket(id), id, tokCount(text)) }
      .groupBy(_._1)
    val expected = byShard.map { case (shard, rows) =>
      val ordered = rows.sortBy { case (_, b, id, _) => (b, id) }
      val ends = ordered.scanLeft(0L)(_ + _._4).tail
      val starts = ends.zip(ordered).map { case (e, (_, _, _, n)) => e - n }
      val total = ends.last
      val nSeq = (total + ctx - 1) / ctx
      val boundary = starts.zip(ends).count { case (s, e) => s / ctx != (e - 1) / ctx }
      shard -> (rows.size.toLong, total, nSeq, boundary.toLong, nSeq * ctx - total)
    }
    assert(got == expected)
    assert(got.values.map(_._1).sum == docRows.size.toLong)
  }

  test("packingStats is stable across repartitioning") {
    val a = Packing.packingStats(docs, "doc_id", "text", "pk", 4, 64)
      .collect().map(_.toSeq).toSet
    val b = Packing.packingStats(docs.repartition(13), "doc_id", "text", "pk", 4, 64)
      .collect().map(_.toSeq).toSet
    assert(a == b)
  }

  test("packingStats rejects a non-power-of-two context") {
    intercept[IllegalArgumentException] {
      Packing.packingStats(docs, "doc_id", "text", "pk", 4, 100)
    }
  }

  // ------------------------------------------------------------- scrub ---

  test("scrub matches a sequential regex model: counts on original, replacements in order") {
    val pats = Seq("\\bcustomer\\b" -> "<pii>", "\\bkey\\b" -> "<pii>")
    val got = TextOps.scrub(docs, "text", pats)
      .select("doc_id", "scrubbed", "n_redactions")
      .collect().map(r => r.getLong(0) -> ((r.getString(1), r.getLong(2)))).toMap
    docRows.foreach { case (id, text) =>
      val hits = pats.map { case (p, _) => p.r.findAllIn(text).size.toLong }.sum
      val cleaned = pats.foldLeft(text) { case (t, (p, r)) => t.replaceAll(p, r) }
      assert(got(id) == ((cleaned, hits)), s"doc $id")
    }
  }

  test("scrub counts hits on the ORIGINAL text, not on earlier patterns' output") {
    import spark.implicits._
    // "b" first rewrites to "a c"; the "a c" pattern must still count 0
    // (it only exists post-replacement) while the replacement chain DOES
    // apply to the rewritten text.
    val df = Seq((1L, "x b y")).toDF("doc_id", "text")
    val row = TextOps.scrub(df, "text", Seq("b" -> "a c", "a c" -> "z"))
      .select("scrubbed", "n_redactions").collect().head
    assert(row.getString(0) == "x z y")
    assert(row.getLong(1) == 1L)
  }

  // --------------------------------------------- contaminationReport ---

  test("contaminationReport flags planted n-gram leaks, counts distinct shared grams, omits clean docs") {
    import spark.implicits._
    val n = 4
    val evalText = "alpha beta gamma delta epsilon"        // grams: a..d, b..e
    val train = Seq(
      // doc 1 copies BOTH eval 4-grams (the full 5-token window), and
      // repeats one of them — distinct counting must report 2, not 3
      (1L, s"$evalText and alpha beta gamma delta again"),
      (2L, "alpha beta gamma nope delta epsilon zeta eta"), // no shared 4-gram
      (3L, "one two three"),                                // shorter than n
      (4L, "beta gamma delta epsilon tail")                 // copies 1 gram
    ).toDF("doc_id", "text")
    val evalDocs = Seq((100L, evalText)).toDF("doc_id", "text")
    val got = TextOps.contaminationReport(train, evalDocs, "doc_id", "text", n)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(1L -> 2L, 4L -> 1L), s"got $got")
  }
}
