package graft

import org.apache.spark.sql.functions._

import graft.operators.TextOps

/** Chunking semantics vs the reference `_chunk_text` (rag.py:17-24),
  * including the empty-text → one-empty-chunk rule (rag.py:22-23) and the
  * reassembly property `concat(chunks) == text` (the
  * test_v3_features.py:49-65 analog). */
class ChunkSpec extends SparkSpec {
  import spark.implicits._

  private def chunksOf(texts: Seq[String], size: Int): Map[String, Seq[String]] =
    texts.toDF("text")
      .select(col("text"), TextOps.chunk(col("text"), size).as("chunks"))
      .collect()
      .map(r => r.getString(0) -> r.getSeq[String](1))
      .toMap

  test("empty text yields exactly one empty chunk (rag.py:22-23)") {
    assert(chunksOf(Seq(""), 300)("") == Seq(""))
  }

  test("text shorter than chunk_size yields itself") {
    assert(chunksOf(Seq("abc"), 300)("abc") == Seq("abc"))
  }

  test("exact multiple of chunk_size yields no trailing empty chunk") {
    val t = "abcdef"
    assert(chunksOf(Seq(t), 3)(t) == Seq("abc", "def"))
  }

  test("off-by-one lengths around the boundary") {
    assert(chunksOf(Seq("abcde"), 3)("abcde") == Seq("abc", "de"))
    assert(chunksOf(Seq("abcdefg"), 3)("abcdefg") == Seq("abc", "def", "g"))
  }

  test("property: concat(chunks) == text (seeded random strings)") {
    val rnd = new scala.util.Random(42)
    val texts = (0 until 50).map { _ =>
      val n = rnd.nextInt(1000)
      rnd.alphanumeric.take(n).mkString
    }.distinct
    for (size <- Seq(1, 7, 300)) {
      val m = chunksOf(texts, size)
      texts.foreach { t =>
        assert(m(t).mkString == t, s"reassembly failed for len=${t.length} size=$size")
        val expected = math.max(1, math.ceil(t.length.toDouble / size).toInt)
        assert(m(t).length == expected, s"chunk count for len=${t.length} size=$size")
      }
    }
  }

  test("chunkDocuments explodes with 0-based chunk_index in document order") {
    val out = TextOps.chunkDocuments(
      Seq((1L, "abcdef"), (2L, "")).toDF("doc_id", "text"), "doc_id", "text", 4)
      .orderBy("doc_id", "chunk_index")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
    assert(out.toSeq == Seq((1L, 0L, "abcd"), (1L, 1L, "ef"), (2L, 0L, "")))
  }

  test("multi-byte text chunks by CHARACTER, not byte (Arabic — the reference's corpus language)") {
    // 8 Arabic chars (16 UTF-8 bytes): char semantics give 2+2 chunks of
    // 3/3/2... with size 3 → 3 chunks; byte semantics would split inside
    // a codepoint and corrupt the text. Spark `length`/`substr` and
    // DuckDB `length`/`substr` both count characters, so the oracle
    // parity contract extends to non-ASCII corpora unchanged.
    val text = "عربية نص" // 8 chars incl. the space
    val m = chunksOf(Seq(text), 3)
    assert(m(text) == Seq("عرب", "ية ", "نص"))
    assert(m(text).mkString == text)
  }

  test("multi-byte text shingles/embeds by character (length is char count)") {
    import graft.functions.{VectorFunctions => VF}
    val df = Seq("عربية").toDF("text")
    // arithmeticEmbedding keys off length() = 5 CHARS (not 10 bytes)
    val emb = df.select(VF.arithmeticEmbedding(col("text"), 4).as("e"))
      .collect()(0).getSeq[Double](0)
    val expected = (1 to 4).map(i => ((5L * i) % 97).toDouble / 97.0)
    assert(emb == expected)
    // shingles are 2-char windows over codepoints
    val sh = df.select(graft.operators.Sketches.shingles(col("text"), 2).as("s"))
      .collect()(0).getSeq[String](0)
    assert(sh == Seq("عر", "رب", "بي", "ية"))
  }
}
