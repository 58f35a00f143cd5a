package graft

import org.apache.spark.sql.functions._

import graft.operators.TextOps

/** BPE learn/apply semantics against hand-computed fixtures: greedy
  * merge order, leftmost non-overlapping merge application, chained
  * rule composition, and the fertility rollup. */
class BpeSpec extends SparkSpec {
  import spark.implicits._

  test("bpeLearnMerges: greedy order by weighted count, stops when exhausted") {
    // vocab: aa f=2, ab f=3 -> pairs (a,b)=3, (a,a)=2
    val docs = Seq("aa aa ab", "ab ab").toDF("text")
    val merges = TextOps.bpeLearnMerges(docs, "text", 5)
    // round 1 merges (a,b); round 2 merges (a,a); then no pairs remain
    assert(merges == Seq(("a", "b"), ("a", "a")))
  }

  test("merge application is leftmost non-overlapping (the BPE scan order)") {
    // 'aaa' with merge (a,a): textbook BPE yields [aa, a], never [a, aa]
    val docs = Seq("aaa").toDF("text")
    val merges = TextOps.bpeLearnMerges(docs, "text", 1)
    assert(merges == Seq(("a", "a")))
    val seg = TextOps.bpeVocabSegmentation(docs, "text", merges, 10).collect()
    assert(seg.length == 1)
    assert(seg.head.getAs[String]("segmented") == "aa a" &&
      seg.head.getAs[Long]("n_subwords") == 2)
  }

  test("chained rules compose: a merged symbol participates in later rules") {
    val merged = Seq("abc").toDF("w")
      .select(
        TextOps.bpeSegment(TextOps.bpeApplySpaced(col("w"),
          Seq(("a", "b"), ("ab", "c")))).as("seg"),
        TextOps.bpeSubwordCount(TextOps.bpeApplySpaced(col("w"),
          Seq(("a", "b"), ("ab", "c")))).as("n"))
      .head()
    assert(merged.getAs[String]("seg") == "abc" && merged.getAs[Long]("n") == 1)
    // rule order matters: (ab,c) before (a,b) cannot fire on 'abc'
    val wrongOrder = Seq("abc").toDF("w")
      .select(TextOps.bpeSegment(TextOps.bpeApplySpaced(col("w"),
        Seq(("ab", "c"), ("a", "b")))).as("seg")).head()
    assert(wrongOrder.getAs[String]("seg") == "ab c")
  }

  test("tokenizerFertilityBpe: hand-computed fertility and compression") {
    // lang x: words 'ab ab cd' per doc; merge table merges only (a,b)
    val docs = Seq(
      ("x", "ab ab cd", 8L),
      ("x", "ab cd cd", 8L),
      ("y", "ef", 2L)).toDF("lang", "text", "n_chars")
    val out = TextOps.tokenizerFertilityBpe(docs, "lang", "text", "n_chars",
      Seq(("a", "b"))).orderBy("lang").collect()
    // x: 6 ws words; subwords: ab->1 (x3), cd->2 (x3) => 9 bpe tokens
    val x = out.head
    assert(x.getAs[Long]("ws_tokens") == 6 && x.getAs[Long]("bpe_tokens") == 9)
    assert(x.getAs[Long]("fertility_milli") == 1500)
    assert(x.getAs[Long]("chars_per_bpe_milli") == (16L * 1000) / 9)
    // y: 1 word 'ef' -> 2 subwords
    val y = out(1)
    assert(y.getAs[Long]("ws_tokens") == 1 && y.getAs[Long]("bpe_tokens") == 2 &&
      y.getAs[Long]("fertility_milli") == 2000)
  }

  test("empty corpus learns nothing; single-char vocab learns nothing") {
    val none = spark.emptyDataFrame.withColumn("text", lit(""))
      .filter(lit(false)).select("text")
    assert(TextOps.bpeLearnMerges(none, "text", 3).isEmpty)
    assert(TextOps.bpeLearnMerges(Seq("a b c").toDF("text"), "text", 3).isEmpty)
  }
}
