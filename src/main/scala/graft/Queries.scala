package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.{Metric, VectorFunctions => VF}
import graft.operators.{Rag, TextOps, VectorSearch}

/** One declared, oracle-checked query. `oracle` is ANSI-ish SQL DuckDB runs
  * on the same parquet tables; None → driver records a weaker rows-only
  * check (reserved for genuinely non-SQL-expressible ops). */
final case class GraftQuery(
    name: String,
    run: (SparkSession, String) => DataFrame,
    oracle: Option[String])

/** The declared query inventory (SURVEY §2.3) — the unit of the driver's
  * DuckDB-oracle correctness gate. Every query is deterministic: literal
  * (non-random) query vectors, total-order tie-breakers on every ordered
  * op, arithmetic identical to its oracle SQL (SURVEY §2.4) — and every
  * result column is SCALAR (the driver's pandas compare dies on arrays;
  * round-1 `q_normalize` failure).
  */
object Queries {
  import Tables.EmbeddingDim

  private val K = 10
  private val KnnJoinK = 5
  private val ChunkSize = 300
  private val NearDupTau = 0.3
  private val RagQueryText = "spark window join"
  private val RagTopK = 3

  /** Query vector = the embedding of vec_id 0, as a broadcast 1-row frame
    * (self-join style — deterministic, SURVEY §2.3). */
  private def queryVecFrame(spark: SparkSession, dir: String): DataFrame =
    Tables.embeddings(spark, dir)
      .filter(col("vec_id") === 0)
      .select(col("embedding").as("qvec"))

  /** 1-row frame embedding [[RagQueryText]] arithmetically — the O10 text
    * query path (api.py:164-168) with the SURVEY §2.4.3 deterministic
    * embedding. */
  private def textQueryFrame(spark: SparkSession): DataFrame =
    spark.range(1)
      .select(VF.arithmeticEmbedding(lit(RagQueryText), EmbeddingDim).as("qvec"))

  /** Oracle CTE for the normalized arithmetic query embedding:
    * `q(qemb)`. */
  private val textQueryCte: String = {
    val emb = Oracle.arithmeticEmbedding(s"'$RagQueryText'", EmbeddingDim)
    s"q AS (SELECT ${Oracle.l2Normalize(emb)} AS qemb)"
  }

  /** documents ⋈ embeddings on doc_id = vec_id — the corpus with both
    * text and vector columns (multimodal join shape). */
  private def corpus(s: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(s, dir)
    val emb = Tables.embeddings(s, dir).select("vec_id", "embedding")
    docs.join(emb, docs("doc_id") === emb("vec_id"))
      .select(docs("doc_id"), col("text"), col("source"), col("embedding"))
  }

  // ---------------------------------------------------------------- knn ---

  /** O9+O5: top-10 by cosine similarity vs the vec_id=0 embedding. */
  private def qKnnCosine(s: SparkSession, dir: String): DataFrame =
    VectorSearch.topK(
      Tables.embeddings(s, dir).select("vec_id", "embedding"),
      "embedding", "vec_id",
      queryVecFrame(s, dir), "qvec", Metric.Cosine, K)
      .select("vec_id", "score")

  private val qKnnCosineSql: String = {
    val score = Oracle.dot("n.nemb", "q.qemb", EmbeddingDim)
    s"""WITH ${Oracle.embeddingsCte},
       |${Oracle.normalizedCte},
       |q AS (SELECT nemb AS qemb FROM n WHERE vec_id = 0)
       |SELECT n.vec_id AS vec_id, $score AS score
       |FROM n CROSS JOIN q
       |ORDER BY score DESC, vec_id ASC LIMIT $K""".stripMargin
  }

  /** O9+O6: top-10 by raw dot product. */
  private def qKnnDot(s: SparkSession, dir: String): DataFrame =
    VectorSearch.topK(
      Tables.embeddings(s, dir).select("vec_id", "embedding"),
      "embedding", "vec_id",
      queryVecFrame(s, dir), "qvec", Metric.Dot, K)
      .select("vec_id", "score")

  private val qKnnDotSql: String = {
    val score = Oracle.dot("e.emb", "q.qemb", EmbeddingDim)
    s"""WITH ${Oracle.embeddingsCte},
       |q AS (SELECT emb AS qemb FROM e WHERE vec_id = 0)
       |SELECT e.vec_id AS vec_id, $score AS score
       |FROM e CROSS JOIN q
       |ORDER BY score DESC, vec_id ASC LIMIT $K""".stripMargin
  }

  /** O9+O7+O8: top-10 by euclidean similarity `1/(1+d)`. */
  private def qKnnEuclid(s: SparkSession, dir: String): DataFrame =
    VectorSearch.topK(
      Tables.embeddings(s, dir).select("vec_id", "embedding"),
      "embedding", "vec_id",
      queryVecFrame(s, dir), "qvec", Metric.Euclidean, K)
      .select("vec_id", "score")

  private val qKnnEuclidSql: String = {
    val score = Oracle.euclideanSimilarity("e.emb", "q.qemb", EmbeddingDim)
    s"""WITH ${Oracle.embeddingsCte},
       |q AS (SELECT emb AS qemb FROM e WHERE vec_id = 0)
       |SELECT e.vec_id AS vec_id, $score AS score
       |FROM e CROSS JOIN q
       |ORDER BY score DESC, vec_id ASC LIMIT $K""".stripMargin
  }

  /** O9 + metadata predicate (extension — the reference has no filters):
    * cosine top-10 restricted to label = 3. The `label = 3` predicate
    * pushes down to the parquet scan (PushedFilters), shrinking the scored
    * set before any vector math runs. */
  private def qFilterSearch(s: SparkSession, dir: String): DataFrame =
    VectorSearch.topK(
      Tables.embeddings(s, dir).filter(col("label") === 3)
        .select("vec_id", "embedding"),
      "embedding", "vec_id",
      queryVecFrame(s, dir), "qvec", Metric.Cosine, K)
      .select("vec_id", "score")

  private val qFilterSearchSql: String = {
    val score = Oracle.dot("n.nemb", "q.qemb", EmbeddingDim)
    s"""WITH ${Oracle.embeddingsCte},
       |${Oracle.normalizedCte},
       |q AS (SELECT nemb AS qemb FROM n WHERE vec_id = 0)
       |SELECT n.vec_id AS vec_id, $score AS score
       |FROM n CROSS JOIN q
       |WHERE n.label = 3
       |ORDER BY score DESC, vec_id ASC LIMIT $K""".stripMargin
  }

  /** O10+O15: text query — embed "$RagQueryText" arithmetically, cosine
    * top-10 (the reference's `search_text`, api.py:164-168). */
  private def qTextSearch(s: SparkSession, dir: String): DataFrame =
    VectorSearch.topK(
      Tables.embeddings(s, dir).select("vec_id", "embedding"),
      "embedding", "vec_id",
      textQueryFrame(s), "qvec", Metric.Cosine, K)
      .select("vec_id", "score")

  private val qTextSearchSql: String = {
    val score = Oracle.dot("n.nemb", "q.qemb", EmbeddingDim)
    s"""WITH ${Oracle.embeddingsCte},
       |${Oracle.normalizedCte},
       |$textQueryCte
       |SELECT n.vec_id AS vec_id, $score AS score
       |FROM n CROSS JOIN q
       |ORDER BY score DESC, vec_id ASC LIMIT $K""".stripMargin
  }

  /** Batch knn (O9 at scale; the exact replacement for the reference's
    * HNSW serving path ann.py:67-102): every vector's top-5 cosine
    * neighbors, self excluded. */
  private def qKnnJoin(s: SparkSession, dir: String): DataFrame = {
    val emb = Tables.embeddings(s, dir).select("vec_id", "embedding")
    VectorSearch.knnJoin(emb, emb, "embedding", "vec_id", Metric.Cosine,
      k = KnnJoinK, excludeSelf = true, broadcastData = true)
  }

  private val qKnnJoinSql: String = {
    val score = Oracle.dot("a.nemb", "b.nemb", EmbeddingDim)
    s"""WITH ${Oracle.embeddingsCte},
       |${Oracle.normalizedCte},
       |p AS (
       |  SELECT a.vec_id AS query_id, b.vec_id AS neighbor_id, $score AS score
       |  FROM n a CROSS JOIN n b
       |  WHERE a.vec_id <> b.vec_id),
       |r AS (
       |  SELECT query_id, neighbor_id, score,
       |         ROW_NUMBER() OVER (PARTITION BY query_id
       |                            ORDER BY score DESC, neighbor_id ASC) AS rank
       |  FROM p)
       |SELECT query_id, neighbor_id, score, rank
       |FROM r WHERE rank <= $KnnJoinK
       |ORDER BY query_id, rank""".stripMargin
  }

  // ---------------------------------------------------------- normalize ---

  /** O4: eps-guarded L2 normalization, emitted as SCALAR rows
    * `(vec_id, pos, value)` via posexplode — the driver's hash compare
    * cannot canonicalize array columns (round-1 failure). */
  private def qNormalize(s: SparkSession, dir: String): DataFrame =
    Tables.embeddings(s, dir)
      .select(col("vec_id"),
        posexplode(VF.l2Normalize(col("embedding"))).as(Seq("pos", "value")))
      .withColumn("pos", col("pos").cast("long"))
      .orderBy("vec_id", "pos")

  private val qNormalizeSql: String =
    s"""WITH ${Oracle.embeddingsCte},
       |${Oracle.normalizedCte}
       |SELECT vec_id, CAST(gs.i - 1 AS BIGINT) AS pos, nemb[gs.i] AS value
       |FROM n CROSS JOIN generate_series(1, $EmbeddingDim) gs(i)
       |ORDER BY vec_id, pos""".stripMargin

  // ----------------------------------------------------------- chunking ---

  /** O17/O18: fixed 300-char window chunking of documents (rag.py:17-24),
    * `(doc_id, chunk_index, chunk_text)`. */
  private def qChunks(s: SparkSession, dir: String): DataFrame =
    TextOps.chunkDocuments(Tables.documents(s, dir), "doc_id", "text", ChunkSize)
      .orderBy("doc_id", "chunk_index")

  /** Constant upper bound on chunks/doc for the uncorrelated series
    * (DuckDB 1.0 has no correlated `range` lateral); 32×300 = 9,600 chars
    * covers the fixture max (553). */
  private val MaxChunks = 32

  private val qChunksSql: String =
    s"""SELECT doc_id, CAST(gs.i AS BIGINT) AS chunk_index,
       |       substr(text, CAST(gs.i * $ChunkSize + 1 AS INTEGER), $ChunkSize) AS chunk_text
       |FROM documents CROSS JOIN generate_series(0, ${MaxChunks - 1}) gs(i)
       |WHERE gs.i < greatest(CAST(ceil(length(text) / $ChunkSize.0) AS BIGINT), 1)
       |ORDER BY doc_id, chunk_index""".stripMargin

  /** O19: RAG retrieve+assemble (rag.py:67-97) — top-3 docs for the text
    * query, contexts joined `"\n---\n"` in score order, placeholder
    * answer template. Single scalar row `(query, context, answer)`. */
  private def qRagContext(s: SparkSession, dir: String): DataFrame =
    Rag.answerQuery(
      corpus(s, dir).select("doc_id", "text", "embedding"),
      "doc_id", "text", "embedding",
      textQueryFrame(s), "qvec", Metric.Cosine, RagTopK)
      .select(lit(RagQueryText).as("query"), col("context"), col("answer"))

  private val qRagContextSql: String = {
    val score = Oracle.dot("n.nemb", "q.qemb", EmbeddingDim)
    val agg = s"string_agg(text, e'\\n---\\n' ORDER BY score DESC, doc_id ASC)"
    s"""WITH ${Oracle.embeddingsCte},
       |${Oracle.normalizedCte},
       |$textQueryCte,
       |top AS (
       |  SELECT d.doc_id, d.text, $score AS score
       |  FROM documents d JOIN n ON d.doc_id = n.vec_id CROSS JOIN q
       |  ORDER BY score DESC, d.doc_id ASC LIMIT $RagTopK)
       |SELECT '$RagQueryText' AS query,
       |       $agg AS context,
       |       'This is a placeholder answer. Relevant context:' || chr(10) || $agg AS answer
       |FROM top""".stripMargin
  }

  // -------------------------------------------------------- projections ---

  /** O22: items projection (`GET /items`, server.py:108-122) — metadata
    * columns only; the embedding column is never read. */
  private def qItems(s: SparkSession, dir: String): DataFrame =
    Tables.documents(s, dir)
      .select("doc_id", "lang", "source", "n_chars")
      .orderBy("doc_id")

  private val qItemsSql: String =
    "SELECT doc_id, lang, source, n_chars FROM documents ORDER BY doc_id"

  // --------------------------------------------------------- north star ---

  /** North-star exact dedup: duplicate groups by md5(text). */
  private def qDedupExact(s: SparkSession, dir: String): DataFrame =
    TextOps.dedupExactGroups(Tables.documents(s, dir), "doc_id", "text")

  private val qDedupExactSql: String =
    """SELECT md5(text) AS text_hash,
      |       CAST(count(*) AS BIGINT) AS n_copies,
      |       min(doc_id) AS keeper_id
      |FROM documents GROUP BY 1 ORDER BY text_hash""".stripMargin

  /** North-star near-dup: label-blocked cosine pairs ≥ τ. Blocking turns
    * the all-pairs cross join into a per-label equi-join (the shuffle key
    * is the block id) — the exact-scoring stage of a blocked/LSH dedup
    * pipeline. */
  private def qNearDupPairs(s: SparkSession, dir: String): DataFrame = {
    val n = Tables.embeddings(s, dir)
      .select(col("vec_id"), col("label"), VF.l2Normalize(col("embedding")).as("nemb"))
    val a = n.select(col("vec_id").as("a_id"), col("label"), col("nemb").as("a_emb"))
    val b = n.select(col("vec_id").as("b_id"), col("label"), col("nemb").as("b_emb"))
    a.join(b, "label")
      .filter(col("a_id") < col("b_id"))
      .withColumn("score", VF.dot(col("a_emb"), col("b_emb")))
      .filter(col("score") >= NearDupTau)
      .select("a_id", "b_id", "score")
      .orderBy("a_id", "b_id")
  }

  private val qNearDupPairsSql: String = {
    val score = Oracle.dot("a.nemb", "b.nemb", EmbeddingDim)
    s"""WITH ${Oracle.embeddingsCte},
       |${Oracle.normalizedCte},
       |p AS (
       |  SELECT a.vec_id AS a_id, b.vec_id AS b_id, $score AS score
       |  FROM n a JOIN n b ON a.label = b.label AND a.vec_id < b.vec_id)
       |SELECT a_id, b_id, score FROM p
       |WHERE score >= $NearDupTau
       |ORDER BY a_id, b_id""".stripMargin
  }

  /** North-star text analysis: per-language doc/char/token statistics. */
  private def qTextStats(s: SparkSession, dir: String): DataFrame =
    TextOps.textStats(Tables.documents(s, dir), "lang", "n_chars", "text")

  private val qTextStatsSql: String =
    """WITH t AS (
      |  SELECT lang, n_chars,
      |         CAST(length(string_split_regex(trim(text), ' +')) AS BIGINT) AS tok
      |  FROM documents)
      |SELECT lang,
      |       CAST(count(*) AS BIGINT) AS n_docs,
      |       CAST(sum(n_chars) AS BIGINT) AS sum_chars,
      |       CAST(sum(n_chars) AS DOUBLE) / count(*) AS avg_chars,
      |       CAST(sum(tok) AS BIGINT) AS sum_tokens,
      |       CAST(sum(tok) AS DOUBLE) / count(*) AS avg_tokens
      |FROM t GROUP BY lang ORDER BY lang""".stripMargin

  /** North-star multimodal: documents ⋈ embeddings (doc_id = vec_id)
    * equi-join + per-source best doc by cosine vs the vec_id=0 query. */
  private def qMultimodal(s: SparkSession, dir: String): DataFrame = {
    val scored = VectorSearch.scoreAgainst(
      corpus(s, dir).select("doc_id", "source", "embedding"),
      "embedding", queryVecFrame(s, dir), "qvec", Metric.Cosine)
    val w = Window.partitionBy("source").orderBy(desc("score"), asc("doc_id"))
    scored
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select("source", "doc_id", "score")
      .orderBy("source")
  }

  private val qMultimodalSql: String = {
    val score = Oracle.dot("n.nemb", "q.qemb", EmbeddingDim)
    s"""WITH ${Oracle.embeddingsCte},
       |${Oracle.normalizedCte},
       |q AS (SELECT nemb AS qemb FROM n WHERE vec_id = 0),
       |s AS (
       |  SELECT d.source, d.doc_id, $score AS score
       |  FROM documents d JOIN n ON d.doc_id = n.vec_id CROSS JOIN q),
       |r AS (
       |  SELECT source, doc_id, score,
       |         ROW_NUMBER() OVER (PARTITION BY source
       |                            ORDER BY score DESC, doc_id ASC) AS rn
       |  FROM s)
       |SELECT source, doc_id, score FROM r WHERE rn = 1 ORDER BY source""".stripMargin
  }

  // -------------------------------------------------------- persistence ---

  /** O20/O21 roundtrip: save embeddings as a VectorTable (parquet + config
    * sidecar), load it back, report scalar checksums + loaded config. */
  private def qSaveLoad(s: SparkSession, dir: String): DataFrame = {
    val safe = dir.replaceAll("[^A-Za-z0-9]", "_")
    val path = s"/root/repo/target/tmp/q_save_load_$safe"
    val vt = VectorTable(
      Tables.embeddings(s, dir),
      VectorTableConfig(dim = EmbeddingDim, metric = "cosine"))
    vt.save(path)
    val loaded = VectorTable.load(s, path)
    loaded.df.agg(
      count(lit(1)).as("n_rows"),
      sum("vec_id").as("id_sum"),
      sum("label").as("label_sum"))
      .withColumn("dim", lit(loaded.config.dim))
      .withColumn("metric_name", lit(loaded.config.metric))
  }

  private val qSaveLoadSql: String =
    s"""SELECT CAST(count(*) AS BIGINT) AS n_rows,
       |       CAST(sum(vec_id) AS BIGINT) AS id_sum,
       |       CAST(sum(label) AS BIGINT) AS label_sum,
       |       $EmbeddingDim AS dim,
       |       'cosine' AS metric_name
       |FROM embeddings""".stripMargin

  // ----------------------------------------------------------- registry ---

  val all: Seq[GraftQuery] = Seq(
    GraftQuery("q_knn_cosine", qKnnCosine, Some(qKnnCosineSql)),
    GraftQuery("q_knn_dot", qKnnDot, Some(qKnnDotSql)),
    GraftQuery("q_knn_euclid", qKnnEuclid, Some(qKnnEuclidSql)),
    GraftQuery("q_filter_search", qFilterSearch, Some(qFilterSearchSql)),
    GraftQuery("q_text_search", qTextSearch, Some(qTextSearchSql)),
    GraftQuery("q_knn_join", qKnnJoin, Some(qKnnJoinSql)),
    GraftQuery("q_normalize", qNormalize, Some(qNormalizeSql)),
    GraftQuery("q_chunks", qChunks, Some(qChunksSql)),
    GraftQuery("q_rag_context", qRagContext, Some(qRagContextSql)),
    GraftQuery("q_items", qItems, Some(qItemsSql)),
    GraftQuery("q_dedup_exact", qDedupExact, Some(qDedupExactSql)),
    GraftQuery("q_neardup_pairs", qNearDupPairs, Some(qNearDupPairsSql)),
    GraftQuery("q_text_stats", qTextStats, Some(qTextStatsSql)),
    GraftQuery("q_multimodal", qMultimodal, Some(qMultimodalSql)),
    GraftQuery("q_save_load", qSaveLoad, Some(qSaveLoadSql)),
  )

  def queries: Map[String, (SparkSession, String) => DataFrame] =
    all.map(q => q.name -> q.run).toMap

  def oracleSql: Map[String, String] =
    all.flatMap(q => q.oracle.map(q.name -> _)).toMap
}
