package graft

import org.apache.spark.sql.functions._

import graft.operators.Lexical

/** BM25 + RRF semantics on a hand corpus: rarer terms outweigh common
  * ones, length normalization penalizes long docs, absent-term docs
  * score zero rows, and fusion rewards presence in both lists. */
class LexicalSpec extends SparkSpec {
  import spark.implicits._

  private lazy val corpus = Seq(
    (1L, "cat dog cat fish"),
    (2L, "cat cat cat cat cat cat cat cat"),
    (3L, "dog bird"),
    (4L, "fish"),
    (5L, "tree rock water")).toDF("doc_id", "text").cache()

  test("rarer terms contribute more (idf monotone in rarity)") {
    // 'fish' appears in 2 docs, 'cat' in 2... use 'bird' (1 doc) vs 'cat' (2 docs)
    val bird = Lexical.bm25(corpus, "doc_id", "text", Seq("bird")).collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val cat = Lexical.bm25(corpus, "doc_id", "text", Seq("cat")).collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    // doc 3 has tf=1 of bird (len 2); doc 1 has tf=2 of cat (len 4) —
    // the rarer term must still win on idf despite lower tf
    assert(bird(3L) > cat(1L),
      s"idf ordering violated: bird@3=${bird(3L)} cat@1=${cat(1L)}")
  }

  test("docs without any query term are absent, not zero-scored rows") {
    val scored = Lexical.bm25(corpus, "doc_id", "text", Seq("cat", "dog"))
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(scored == Set(1L, 2L, 3L))
  }

  test("length normalization: same tf scores higher in the shorter doc") {
    val fish = Lexical.bm25(corpus, "doc_id", "text", Seq("fish")).collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    // doc 4 (len 1, tf 1) vs doc 1 (len 4, tf 1)
    assert(fish(4L) > fish(1L))
  }

  test("rrfFuse rewards docs present in both ranked lists") {
    val a = Seq((1L, 1L), (2L, 2L), (3L, 3L)).toDF("doc_id", "rank")
    val b = Seq((3L, 1L), (4L, 2L)).toDF("doc_id", "rank")
    val fused = Lexical.rrfFuse(Seq(a, b), "doc_id", c = 60, k = 10)
      .collect().map(r => r.getLong(0) -> r.getDouble(1))
    // doc 3 appears in both (ranks 3 and 1) -> top
    assert(fused.head._1 == 3L, s"got ${fused.toSeq}")
    assert(math.abs(fused.head._2 - (1.0 / 63 + 1.0 / 61)) < 1e-15)
  }

  test("bm25 matches a reference implementation on the fixture corpus") {
    val docs = Tables.documents(spark, Sf0001)
    val got = Lexical.bm25TopK(docs, "doc_id", "text",
      Seq("spark", "join", "window"), k = 3).collect()
      .map(r => (r.getLong(0), r.getDouble(1)))
    // independently hand-computed (python/libm) over sf0.001
    assert(got.map(_._1).toSeq == Seq(206L, 477L, 125L), s"got ${got.toSeq}")
    assert(math.abs(got.head._2 - 1.2756369851943024) < 1e-12)
  }

  test("phrase search: adjacency required, overlaps counted, order matters") {
    import spark.implicits._
    val docs = Seq(
      (1L, "a spark window join"),          // one occurrence
      (2L, "spark window spark window"),    // two occurrences
      (3L, "spark join window"),            // terms present, not adjacent
      (4L, "window spark"),                 // reversed order
      (5L, "spark spark spark")             // repeated-term phrase below
    ).toDF("doc_id", "text")
    val got = Lexical.phraseSearch(docs, "doc_id", "text",
      Seq("spark", "window"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(1L -> 1L, 2L -> 2L), got.toString)
    // a repeated-term phrase intersects a posting list with itself
    val rep = Lexical.phraseSearch(docs, "doc_id", "text",
      Seq("spark", "spark"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // doc 5 "spark spark spark": overlapping occurrences at 0-1 and 1-2
    assert(rep == Map(5L -> 2L), rep.toString)
  }

  test("phrase search agrees with a regex count on the real corpus") {
    val docs = Tables.documents(spark, Sf0001)
    val got = Lexical.phraseSearch(docs, "doc_id", "text",
      Seq("spark", "window"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // token-adjacency == whitespace-delimited phrase on this corpus
    // (distinct words — matches cannot overlap, so regexp_count agrees)
    val expect = docs
      .select(col("doc_id"),
        regexp_count(col("text"), lit("(?<=^| )spark window(?=$| )")).cast("long").as("n"))
      .filter(col("n") > 0)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == expect)
  }
}
