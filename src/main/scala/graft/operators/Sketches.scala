package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Document sketches for near-duplicate detection at scale — the
  * LLM-data-pipeline dedup toolkit (north star; no reference analog —
  * the reference's only similarity machinery is vector-based).
  *
  * Every sketch is built from MD5, the one cryptographic hash both the
  * engine and any SQL oracle compute identically over UTF-8 bytes — so
  * the whole pipeline (shingle → minhash → band → bucket-join) is
  * replayable bit-for-bit in DuckDB for the correctness gate. MD5 hex
  * strings compare lexicographically == numerically (fixed 32 chars), so
  * `min(md5(...))` is a valid uniform min-hash.
  *
  * Scale design: signatures are per-row aggregations (map-side partial
  * min/sum); the candidate join shuffles band keys (16-byte hashes), not
  * documents; the final pair set is a tiny fraction of N².
  */
object Sketches {

  /** Distinct character k-shingles of `text` in first-occurrence order.
    * Texts shorter than k yield the whole text as the single shingle. */
  def shingles(text: Column, k: Int): Column =
    array_distinct(transform(
      sequence(lit(1), greatest(length(text) - (k - 1), lit(1))),
      i => text.substr(i, lit(k))))

  /** Explode to one row per (id, shingle). The doc side is spread first:
    * the O(chars·m) hashing below parallelizes over input partitions, and
    * a single-file table would otherwise run it on one task. */
  def shingleRows(docs: DataFrame, idCol: String, textCol: String, k: Int): DataFrame =
    Partitioning.spread(docs)
      .select(col(idCol), explode(shingles(col(textCol), k)).as("shingle"))

  /** Modulus of the minhash hash families: the Mersenne prime 2³¹−1.
    * Family values live in [0, P) — comfortably inside BIGINT for the
    * multiply-add mixing below (a·h + b < 2⁶² — no overflow under
    * Spark's ANSI arithmetic or DuckDB's checked BIGINT ops). */
  val MinhashPrime: Long = 2147483647L

  /** Fixed (a, b) multiply-add constants of hash family j — Knuth's
    * multiplicative constant and the FNV-1a prime, scaled per family and
    * reduced mod [[MinhashPrime]]. The oracle-SQL builder inlines the
    * SAME values as literals, so cross-engine parity is by construction.
    * a ≠ 0 for all j (2654435761 is not a multiple of the prime). */
  def mixConstants(m: Int): Seq[(Long, Long)] =
    (0 until m).map { j =>
      val a = ((j + 1) * 2654435761L) % MinhashPrime
      val b = (j * 1099511628211L + 12820163L) % MinhashPrime
      (a, b)
    }

  /** One md5 per shingle → first 15 hex chars as a 60-bit BIGINT →
    * reduced mod [[MinhashPrime]]. ALL m minhash families derive from
    * this single digest by integer multiply-add (universal hashing):
    * 1/m-th the hashing of the md5-per-family form, and a fixed-width
    * LONG aggregation buffer, so Spark plans a HashAggregate instead of
    * sort-based aggregation over m string buffers (the round-2 verdict's
    * top cost: 16 md5/shingle through a SortAggregate, 66% of the
    * bench). */
  def shingleHash(shingle: Column): Column =
    conv(substring(md5(shingle), 1, 15), 16, 10).cast("long") % MinhashPrime

  /** The m min-hash aggregate expressions over a reduced-hash column
    * `hm` ([[shingleHash]]): `min((a_j·hm + b_j) mod P)` for family j —
    * all-integer, codegen'd, HashAggregate-friendly. */
  def minhashAggExprs(m: Int): Seq[Column] =
    mixConstants(m).zipWithIndex.map { case ((a, b), j) =>
      min(pmod(lit(a) * col("hm") + lit(b), lit(MinhashPrime))).as(s"mh_$j")
    }

  /** MinHash signature: for each of `m` universal-hash families j, the
    * minimum of `(a_j·shingleHash + b_j) mod P` over the document's
    * shingle set. Returns one row per id with columns `mh_0 … mh_{m-1}`
    * (BIGINT), plus `n_shingles` — the set size rides along in the SAME
    * aggregation pass so downstream Jaccard math needs no second scan. */
  def minhashSignature(
      docs: DataFrame, idCol: String, textCol: String, k: Int, m: Int): DataFrame = {
    val aggs = minhashAggExprs(m) :+ count(lit(1)).as("n_shingles")
    shingleRows(docs, idCol, textCol, k)
      .withColumn("hm", shingleHash(col("shingle")))
      .groupBy(idCol)
      .agg(aggs.head, aggs.tail: _*)
  }

  /** LSH banding of a minhash signature: `bands` bands of `rowsPerBand`
    * hashes, each compressed to one md5 band key. Output: one row per
    * (id, band, band_key) plus any `carry` columns from the signature —
    * the join key space for candidate pairs. */
  def minhashBands(
      signature: DataFrame, idCol: String, bands: Int, rowsPerBand: Int,
      carry: Seq[String] = Nil): DataFrame = {
    val bandStructs = (0 until bands).map { b =>
      val cols = (0 until rowsPerBand).map(r => col(s"mh_${b * rowsPerBand + r}"))
      struct(lit(b).as("band"), md5(concat_ws(",", cols: _*)).as("band_key"))
    }
    signature
      .select(col(idCol) +: carry.map(col) :+ explode(array(bandStructs: _*)).as("bk"): _*)
      .select(col(idCol) +: carry.map(col) :+ col("bk.band").as("band")
        :+ col("bk.band_key").as("band_key"): _*)
  }

  /** Hot-bucket threshold AND salted sub-group size for the UNCAPPED
    * band self-join ([[bandSelfPairs]]). 1024 rows ≙ ~0.5M generated
    * pairs per grid cell — far below a task's memory but big enough
    * that the fixtures' organic buckets (≤ ~64 at sf0.1) never salt and
    * the salted machinery only engages on genuinely pathological
    * cliques (the sf10 fixture grows multi-thousand-id boilerplate
    * buckets whose single-task pair generation was the top sweep row).
    * Scale-adaptive by construction: the threshold is a bucket ROW
    * count, never a core count. */
  private[graft] val SaltBucketRows = 1024L

  /** Self-join of a banded key table, emitting each unordered id pair
    * exactly once per shared (band, band_key) — the pair-generation
    * stage of every uncapped near-dup candidate query — with hot
    * buckets SKEW-SPLIT (guide §2.5: AQE's skew-join splitter keys on
    * shuffle-input bytes and cannot split one giant key, but a clique
    * bucket's cost is its QUADRATIC output, invisible to AQE — a
    * 6400-id bucket is ~300 KB of input and ~20M generated pairs in a
    * single task).
    *
    * Mechanism (triangle grid): every id gets a deterministic salt
    * `s = xxhash64(id) mod G` where `G = ceil(bucket_size / S)` (1 for
    * buckets ≤ S, so cold buckets reduce to the plain self-join). The
    * G×G pair grid's upper triangle is enumerated as cells (i ≤ j);
    * a row salted `s` replicates as the LEFT side of cells (s, j≥s) and
    * the RIGHT side of cells (i≤s, s) — G+1 copies, negligible next to
    * the G² cells' quadratic output — and the join key becomes
    * (band, band_key, i, j), so one clique bucket's pair generation
    * hash-spreads over G(G+1)/2 independent shuffle cells. Diagonal
    * cells keep `a < b`; off-diagonal cells are disjoint groups (all
    * pairs, ordered by least/greatest on output). Each unordered pair
    * lands in exactly one cell — (min(s_a,s_b), max(s_a,s_b)) — so the
    * emitted multiset is IDENTICAL to the naive `a < b` self-join
    * (SketchesSpec pins the equality on a skewed fixture), and the
    * salt never reaches the output: results are bit-for-bit those of
    * the unsalted plan, oracle unchanged.
    *
    * `carry` columns ride both sides and come back aligned to the
    * ordered ids as `a_<c>` / `b_<c>`. Bucket sizes come from one
    * aggregation over the 16-byte band keys plus a broadcast of the
    * (tiny) hot-bucket list — never a corpus exchange. */
  private[graft] def bandSelfPairs(
      bk: DataFrame, idCol: String, carry: Seq[String] = Nil): DataFrame = {
    // lazy checkpoint: the hot list (a handful of rows) feeds BOTH join
    // sides' broadcast — without it each side re-runs the bucket-size
    // aggregation over the full band table (the plan showed the
    // HashAggregate+Exchange subtree twice)
    val hot = bk.groupBy("band", "band_key").agg(count(lit(1)).as("__n"))
      .filter(col("__n") > SaltBucketRows)
      .localCheckpoint(eager = false)
    val salted = bk.join(broadcast(hot), Seq("band", "band_key"), "left")
      .withColumn("__g", coalesce(
        ((col("__n") + lit(SaltBucketRows - 1L)) / lit(SaltBucketRows))
          .cast("int"), lit(1)))
      .withColumn("__s", pmod(xxhash64(col(idCol)), col("__g")).cast("int"))
    val aSide = salted.select(
      col(idCol).as("__a") +: carry.map(c => col(c).as(s"__a_$c")) :+
        col("band") :+ col("band_key") :+ col("__s").as("__i") :+
        explode(sequence(col("__s"), col("__g") - 1)).as("__j"): _*)
    val bSide = salted.select(
      col(idCol).as("__b") +: carry.map(c => col(c).as(s"__b_$c")) :+
        col("band") :+ col("band_key") :+
        explode(sequence(lit(0), col("__s"))).as("__i") :+
        col("__s").as("__j"): _*)
    val joined = aSide.join(bSide, Seq("band", "band_key", "__i", "__j"))
      .filter(col("__i") =!= col("__j") || col("__a") < col("__b"))
    val ordered = col("__a") < col("__b")
    val outCols =
      when(ordered, col("__a")).otherwise(col("__b")).as("a_id") +:
        when(ordered, col("__b")).otherwise(col("__a")).as("b_id") +:
        carry.flatMap(c => Seq(
          when(ordered, col(s"__a_$c")).otherwise(col(s"__b_$c")).as(s"a_$c"),
          when(ordered, col(s"__b_$c")).otherwise(col(s"__a_$c")).as(s"b_$c")))
    joined.select(outCols: _*)
  }

  /** Candidate near-dup pairs: ids sharing ≥1 minhash band, with the
    * number of shared bands. The equi-join on (band, band_key) is the
    * scale path — only hash keys shuffle, and the pair set is bounded by
    * actual collisions, never N². Pair generation runs through
    * [[bandSelfPairs]], so pathological clique buckets skew-split
    * instead of serializing one task (the capped twin
    * [[minhashCandidatesCapped]] bounds buckets by construction and
    * keeps the plain join). */
  def minhashCandidates(
      docs: DataFrame, idCol: String, textCol: String,
      k: Int = 8, m: Int = 16, bands: Int = 4): DataFrame = {
    // The band SELF-join below feeds both sides from the same plan; without
    // materialization Spark recomputes the whole shingle→minhash subtree
    // once per side (round-2 verdict: the q_neardup_minhash plan showed the
    // signature pipeline twice). localCheckpoint is the in-query analog of
    // persisting the signature table as a pipeline stage at real scale.
    val sig = minhashSignature(docs, idCol, textCol, k, m).localCheckpoint()
    val bk = minhashBands(sig, idCol, bands, m / bands)
    bandSelfPairs(bk, idCol)
      .groupBy("a_id", "b_id")
      .agg(count(lit(1)).as("n_bands"))
  }

  /** [[minhashCandidates]] under the production bucket-size cap: every
    * (band, band_key) bucket holding more than `maxBucket` ids is
    * dropped BEFORE the self-join. Over-dense buckets are how LSH dies
    * at corpus scale — one boilerplate template shared by 10⁵ pages
    * makes a single bucket quadratic on its own (the sf1 scale fixture
    * already grows a 631-id bucket ≙ 198k pairs from one key; a real
    * CommonCrawl shard is worse). The cap bounds every bucket's pair
    * fan-out by maxBucket² BY CONSTRUCTION, making the join's output
    * budget linear in the number of buckets — the trade production
    * dedup pipelines make deliberately: a bucket that dense is either
    * boilerplate (better handled by exact/substring dedup, which this
    * toolkit also ships) or a collision cluster whose true near-dup
    * pairs the other bands still surface.
    *
    * Cost of the cap: ONE extra count over the 16-byte band keys,
    * computed as a window aggregate on exactly the (band, band_key)
    * partitioning the self-join shuffles to anyway — bucket sizing
    * never touches document text and adds no extra corpus exchange. */
  def minhashCandidatesCapped(
      docs: DataFrame, idCol: String, textCol: String,
      k: Int = 8, m: Int = 16, bands: Int = 4, maxBucket: Int = 20): DataFrame = {
    // same materialization contract as minhashCandidates: the band
    // self-join feeds both sides from this subtree
    val sig = minhashSignature(docs, idCol, textCol, k, m).localCheckpoint()
    val bk = minhashBands(sig, idCol, bands, m / bands)
    val bucketSize = org.apache.spark.sql.expressions.Window
      .partitionBy("band", "band_key")
    val kept = bk
      .withColumn("__bsz", count(lit(1)).over(bucketSize))
      .filter(col("__bsz") <= maxBucket)
      .drop("__bsz")
    val a = kept.select(col(idCol).as("a_id"), col("band"), col("band_key"))
    val b = kept.select(col(idCol).as("b_id"), col("band"), col("band_key"))
    a.join(b, Seq("band", "band_key"))
      .filter(col("a_id") < col("b_id"))
      .groupBy("a_id", "b_id")
      .agg(count(lit(1)).as("n_bands"))
  }

  /** Benchmark decontamination — the training-pipeline guard against
    * test-set leakage: for every `test` doc, how many of its distinct
    * character k-shingles also occur anywhere in `train` (n-gram
    * overlap, the standard contamination check). Output: one row per
    * test doc `(idCol, n_shingles, n_shared, contaminated)`.
    *
    * Scale shape: both sides reduce shingles to 31-bit integer hashes
    * ([[shingleHash]]) BEFORE the join, and the train side collapses to
    * a distinct hash set (map-side partial) — the join shuffles 8-byte
    * keys, never text, and its left side is the (small) test corpus.
    * Hash collisions can at worst overcount a shared shingle — the
    * standard sketch trade, and deterministic: an oracle replaying the
    * same hash gets the same counts. */
  def contamination(
      train: DataFrame,
      test: DataFrame,
      idCol: String,
      textCol: String,
      k: Int): DataFrame = {
    val trainSh = shingleRows(train, idCol, textCol, k)
      .select(shingleHash(col("shingle")).as("hm")).distinct()
    val testSh = shingleRows(test, idCol, textCol, k)
      .select(col(idCol), shingleHash(col("shingle")).as("hm")).distinct()
    testSh.join(trainSh.withColumn("__hit", lit(1)), Seq("hm"), "left")
      .groupBy(idCol)
      .agg(
        count(lit(1)).as("n_shingles"),
        count("__hit").as("n_shared"))
      .withColumn("contaminated", (col("n_shared") > 0).cast("int"))
  }

  /** Position capacity of the packed winnowing key: positions must stay
    * under 2²⁰ (1M chars/doc). `hm < 2³¹` ⇒ packed key < 2⁵¹ — safe in
    * BIGINT in both engines. */
  val WinnowPosRange: Long = 1L << 20

  /** Document fingerprinting by winnowing (Schleimer/Wilkerson/Aiken,
    * SIGMOD 2003 — the MOSS algorithm): hash every POSITIONAL k-gram
    * ([[shingleHash]]'s md5→BIGINT, no dedup — position matters), then
    * for each window of `w` consecutive gram hashes keep the minimum,
    * tie-breaking to the RIGHTMOST occurrence; the distinct selected
    * (position, hash) pairs are the fingerprint. Guarantees: any shared
    * substring of length ≥ k+w−1 yields at least one shared fingerprint,
    * and density is ~2/(w+1) of grams. Trailing partial windows are
    * included (deterministic, mirrored in the oracle).
    *
    * Engine shape: the min-with-rightmost-tie-break rides ONE packed
    * BIGINT — `hm·2²⁰ + (2²⁰−1−pos)` — and since r17 the sliding min is
    * computed INSIDE the document's own array domain (every gram of a
    * doc is born colocated and in position order from one text cell, so
    * a `Window(PARTITION BY doc ORDER BY pos)` would exchange and sort
    * the full gram volume only to re-establish an order the array
    * already has — guide §2.4, remove the shuffle outright):
    * `transform` packs the positioned gram hashes, a second `transform`
    * takes `array_min(slice(...))` per window (the same per-row O(w)
    * scan the window frame did), and `array_distinct` dedups per doc —
    * which IS the global distinct, because `key ↔ (fp_hash, fp_pos)` is
    * a bijection and fingerprints never cross documents. ZERO exchanges
    * where the r1–r16 shape had two (window hash + distinct hash); the
    * oracle mirrors the window form of the same math.
    * Output: (idCol, fp_pos, fp_hash) distinct, the winnowed sketch. */
  def fingerprint(
      docs: DataFrame, idCol: String, textCol: String,
      k: Int = 8, w: Int = 8): DataFrame = {
    val text = col(textCol)
    // hm_i·R + (R−1−i) for 1-based gram position i — one md5 per
    // positioned gram, exactly the window form's hash count
    val hmk = transform(
      sequence(lit(1), greatest(length(text) - (k - 1), lit(1))),
      i => shingleHash(text.substr(i, lit(k))) * WinnowPosRange
        + (lit(WinnowPosRange - 1) - i.cast("long")))
    // Per-doc memory bound (ADVICE r17): the whole document's sketch
    // evaluates in ONE projection row — the packed-hash array, the n
    // sliding-min results, and the array_distinct output are three
    // transient O(n_grams) arrays with no spill path. WinnowPosRange
    // already caps positions at 2²⁰ grams ≙ ~8 MB per array — a 1M-char
    // document peaks around 24 MB of row-transient buffers, fine for a
    // task; feed multi-GB blobs through a chunking pass first.
    //
    // Sliding min as a LEAST chain over w direct lookups rather than
    // array_min(slice(...)): slice allocates a w-element array per gram
    // (r17's "not yet optimized #6"); try_element_at returns null past
    // the array end — exactly the window frame's clamp — and least
    // ignores nulls, so the semantics are bit-identical (the w ≥ 1
    // offset-0 element is always present). Measured at sf10 (r18,
    // dedicated idle medians): 32.7s → 17.8s on q_fingerprint — the
    // per-gram array allocation was ~half the sketch's runtime.
    def slidingMin(i: Column): Column =
      least((0 until w).map(o => try_element_at(col("__hmk"), i + lit(o))): _*)
    Partitioning.spread(docs)
      // two selects: materialize the packed-hash array once, then the
      // sliding-min transform references the BOUND column — inlining it
      // would re-evaluate the md5 chain per window
      .select(col(idCol), hmk.as("__hmk"))
      .select(col(idCol), explode(array_distinct(transform(
        sequence(lit(1), size(col("__hmk"))),
        i => slidingMin(i)))).as("key"))
      .select(col(idCol),
        (col("key") / WinnowPosRange).cast("long").as("fp_hash"),
        (lit(WinnowPosRange - 1) - pmod(col("key"), lit(WinnowPosRange)))
          .cast("long").as("fp_pos"))
  }

  /** SimHash (32-bit) over whitespace tokens: bit b of the sketch is the
    * sign of Σ_tokens (bit b of md5(token) ? +1 : −1). Bit b of the hash
    * is read as "hex digit b of the md5 is ≥ 8" — the high bit of that
    * nibble — which any SQL engine can evaluate with substr + IN.
    * Near-dup docs differ in few bits (compare with
    * `bit_count(a ^ b)`). */
  def simhash(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val toks = Partitioning.spread(docs).select(col(idCol),
      explode(split(trim(col(textCol)), " +")).as("tok"))
      .withColumn("h", md5(col("tok")))
    val highHex = Seq("8", "9", "a", "b", "c", "d", "e", "f")
    val sums = (0 until 32).map { b =>
      sum(when(substring(col("h"), b + 1, 1).isInCollection(highHex), 1)
        .otherwise(-1)).as(s"s_$b")
    }
    val agg = toks.groupBy(idCol).agg(sums.head, sums.tail: _*)
    val hash = (0 until 32).map { b =>
      when(col(s"s_$b") > 0, lit(1L << b)).otherwise(lit(0L))
    }.reduce(_ + _)
    agg.select(col(idCol), hash.as("simhash"))
  }

  /** Winnowing-based near-dup candidate pairs — the MOSS pipeline's
    * join stage over [[fingerprint]]: pairs of documents sharing at
    * least `minShared` surviving fingerprints. Complements the
    * minhash-LSH path: fingerprints localize WHERE the overlap is
    * (shared substrings ≥ k+w−1 chars) rather than estimating global
    * Jaccard.
    *
    * Boilerplate control is load-bearing at scale: a fingerprint
    * appearing in more than `maxDocFreq` documents is dropped BEFORE
    * the self-join (it is evidence of boilerplate, not duplication, and
    * its pair blow-up is quadratic); singleton fingerprints can pair
    * with nothing and are dropped by the same frequency filter. The
    * join input therefore carries only (hash, id) rows whose per-hash
    * group is ≤ maxDocFreq — the per-bucket pair fan-out is bounded by
    * maxDocFreq², independent of corpus size, exactly like the LSH band
    * join. */
  def fingerprintPairs(
      docs: DataFrame, idCol: String, textCol: String,
      k: Int = 8, w: Int = 8,
      minShared: Int = 3, maxDocFreq: Int = 10): DataFrame = {
    val fp = fingerprint(docs, idCol, textCol, k, w)
      .select(col(idCol), col("fp_hash")).distinct()
    val usable = fp.groupBy("fp_hash").agg(count(lit(1)).as("__df"))
      .filter(col("__df").between(2, maxDocFreq))
      .select("fp_hash")
    // materialize the pruned (hash, id) table once — it feeds BOTH join
    // sides, and re-deriving it would run the whole winnowing window
    // twice (the minhashCandidates lesson); the frame is two longs/row
    val pruned = fp.join(usable, "fp_hash").localCheckpoint()
    val a = pruned.select(col("fp_hash"), col(idCol).as("a_id"))
    val b = pruned.select(col("fp_hash"), col(idCol).as("b_id"))
    a.join(b, "fp_hash")
      .filter(col("a_id") < col("b_id"))
      .groupBy("a_id", "b_id")
      .agg(count(lit(1)).as("n_shared"))
      .filter(col("n_shared") >= minShared)
  }

  /** Exact shared-substring spans between document pairs — the
    * EXACT-match half of Lee et al. 2022 ("Deduplicating Training Data
    * Makes Language Models Better"), which dedups on shared ≥50-token
    * substrings rather than whole-document similarity: for every doc
    * pair sharing at least one `k`-token window, report the LONGEST
    * run of consecutive shared windows — `span_tokens = k + run − 1`
    * exactly shared tokens — and where it starts in each doc.
    *
    * Mechanism (the matrix-diagonal trick, fully relational):
    * positioned `k`-token shingle hashes self-join on the hash; a match
    * `(a_pos, b_pos)` lies on diagonal `a_pos − b_pos`, and consecutive
    * shared windows share a diagonal with consecutive `a_pos` — so
    * maximal runs are islands (`a_pos − row_number` constant) within
    * each `(pair, diagonal)` group, and the longest shared span is the
    * max island per pair (ties → earliest `a_start`, then `b_start`).
    *
    * Scale shape: shingles reduce to `(id, pos, gh)` 24-byte rows
    * map-side (token text never shuffles); hashes outside doc-frequency
    * `[2, maxDocFreq]` are dropped BEFORE the self-join (the
    * [[fingerprintPairs]] boilerplate bound — per-hash fan-out ≤
    * maxDocFreq²); the positioned frame is materialized once for both
    * join sides; the island windows partition by `(a, b, diagonal)` —
    * partitions bounded by document length, never corpus-scale. Hash
    * collisions can only ADD a spurious match (conservative for dedup),
    * and the oracle replays the same hash. */
  def sharedRuns(docs: DataFrame, idCol: String, textCol: String,
      k: Int, maxDocFreq: Int = 10): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val wBest = Window.partitionBy("a_id", "b_id")
      .orderBy(desc("span_tokens"), asc("a_start"), asc("b_start"))
    allSharedRuns(docs, idCol, textCol, k, maxDocFreq)
      .withColumn("__rn", row_number().over(wBest))
      .filter(col("__rn") === 1)
      .select(col("a_id"), col("b_id"), col("span_tokens"),
        col("a_start"), col("b_start"))
  }

  /** EVERY maximal shared run (not just the longest per pair) —
    * `(a_id, b_id, span_tokens, a_start, b_start)`, the raw span
    * inventory [[sharedRuns]] takes its per-pair max over and
    * [[scrubSharedSpans]] cuts. Same mechanism and scale shape as
    * [[sharedRuns]]'s scaladoc describes. */
  def allSharedRuns(docs: DataFrame, idCol: String, textCol: String,
      k: Int, maxDocFreq: Int = 10): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val grams = Partitioning.spread(docs)
      .select(col(idCol), TextOps.tokens(col(textCol)).as("__toks"))
      .select(col(idCol),
        posexplode(TextOps.wordNgramsOfTokens(col("__toks"), k))
          .as(Seq("pos", "ngram")))
      .select(col(idCol), col("pos").cast("long").as("pos"),
        conv(substring(md5(col("ngram")), 1, 15), 16, 10).cast("long").as("gh"))
      .localCheckpoint()
    val usable = grams.select(col(idCol), col("gh")).distinct()
      .groupBy("gh").agg(count(lit(1)).as("__df"))
      .filter(col("__df").between(2, maxDocFreq))
      .select("gh")
    val pruned = grams.join(usable, "gh")
    val a = pruned.select(col("gh"), col(idCol).as("a_id"), col("pos").as("a_pos"))
    val b = pruned.select(col("gh"), col(idCol).as("b_id"), col("pos").as("b_pos"))
    val matches = a.join(b, "gh")
      .filter(col("a_id") < col("b_id"))
      .select(col("a_id"), col("b_id"), col("a_pos"), col("b_pos"),
        (col("a_pos") - col("b_pos")).as("__diag"))
    // within one (pair, diagonal), a_pos values are distinct (b_pos is
    // determined by the diagonal), so the island id is well-defined
    val wIsl = Window.partitionBy("a_id", "b_id", "__diag").orderBy("a_pos")
    matches
      .withColumn("__run", col("a_pos") - row_number().over(wIsl))
      .groupBy("a_id", "b_id", "__diag", "__run")
      .agg(count(lit(1)).as("__len"),
        min("a_pos").as("a_start"), min("b_pos").as("b_start"))
      .select(col("a_id"), col("b_id"),
        (col("__len") + (k - 1)).as("span_tokens"),
        col("a_start"), col("b_start"))
  }

  /** Apply-side of exact substring dedup — Lee et al. 2022 REMOVE one
    * copy of every duplicated substring rather than dropping whole
    * documents: under the deterministic keep-lowest-id policy, every
    * shared span is CUT from the higher-id doc of its pair. Per doc:
    * the b-side span intervals (deduped across pairs), merged where
    * they overlap (gaps-and-islands with a running max end — per-doc
    * partitions, document-length-bounded), then the surviving tokens
    * reassembled in order. Output:
    * `(idCol, n_tokens, n_tokens_removed, scrubbed)` for EVERY doc —
    * untouched docs pass through with 0 removed. `scrubbed` is
    * single-space-normalized (the token round-trip, mirrored by the
    * oracle).
    *
    * Scale: [[allSharedRuns]]'s shape, plus one interval-merge window
    * and one id-keyed join back to the corpus; the cut itself is a
    * per-row higher-order filter over the doc's own token array. */
  def scrubSharedSpans(docs: DataFrame, idCol: String, textCol: String,
      k: Int, maxDocFreq: Int = 10): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val spans = allSharedRuns(docs, idCol, textCol, k, maxDocFreq)
      .select(col("b_id").as(idCol), col("b_start").as("__s"),
        (col("b_start") + col("span_tokens")).as("__e"))
      .distinct()
    val wOrd = Window.partitionBy(idCol).orderBy("__s", "__e")
    val merged = spans
      .withColumn("__maxe", max("__e")
        .over(wOrd.rowsBetween(Window.unboundedPreceding, -1)))
      .withColumn("__new",
        (col("__maxe").isNull || col("__s") > col("__maxe")).cast("int"))
      .withColumn("__isl", sum("__new").over(wOrd))
      .groupBy(col(idCol), col("__isl"))
      .agg(min("__s").as("__s"), max("__e").as("__e"))
    val cuts = merged.groupBy(idCol)
      .agg(
        sort_array(collect_list(struct(col("__s"), col("__e")))).as("__cuts"),
        sum(col("__e") - col("__s")).as("__removed"))
    Partitioning.spread(docs)
      .join(cuts, Seq(idCol), "left")
      .withColumn("__toks", TextOps.tokens(col(textCol)))
      .select(col(idCol),
        size(col("__toks")).cast("long").as("n_tokens"),
        coalesce(col("__removed"), lit(0L)).as("n_tokens_removed"),
        when(col("__cuts").isNull, concat_ws(" ", col("__toks")))
          .otherwise(concat_ws(" ", filter(col("__toks"), (_, i) =>
            !exists(col("__cuts"), c =>
              i.cast("long") >= c("__s") && i.cast("long") < c("__e")))))
          .as("scrubbed"))
  }

  /** Mergeable distinct-count sketches (DataSketches HLL via Spark's
    * `hll_sketch_agg`/`hll_union_agg`): per-`subCol` sketches of
    * `valueCol`, then union-merged per `groupCol`. THIS shape — partial
    * sketch as persistable DATA, merged later — is what makes corpus
    * stats incremental at 100 TB: each ingest batch contributes a
    * KB-sized sketch row, and "distinct docs this month" is a union over
    * sketch rows, never a rescan (`approx_count_distinct` computes the
    * same estimate but its sketch lives only inside one aggregation).
    *
    * Output: one row per group — `(groupCol, merged_estimate BIGINT)`.
    * The sketches themselves stay an implementation column; callers
    * persisting them should store the binary `sk` from
    * [[sketchPerSub]]. */
  def mergedDistinct(
      df: DataFrame, groupCol: String, subCol: String, valueCol: String): DataFrame =
    sketchPerSub(df, groupCol, subCol, valueCol)
      .groupBy(groupCol)
      .agg(hll_sketch_estimate(hll_union_agg(col("sk"))).as("merged_estimate"))

  /** The partial stage of [[mergedDistinct]]: one binary HLL sketch per
    * (groupCol, subCol) — the row you'd persist per ingest batch. */
  def sketchPerSub(
      df: DataFrame, groupCol: String, subCol: String, valueCol: String): DataFrame =
    df.groupBy(col(groupCol), col(subCol))
      .agg(hll_sketch_agg(col(valueCol)).as("sk"))

  // ---------------------------------------------------------- Count-Min ---

  /** Count-Min sketch (Cormode & Muthukrishnan 2005) — the mergeable
    * FREQUENCY sketch next to [[mergedDistinct]]'s HLL distinct sketch:
    * d hash rows × w buckets of integer counts; `estimate(x) = min_i
    * cell[i][h_i(x)]` never underestimates and overshoots by ≤ εN with
    * probability 1−δ (w = ⌈e/ε⌉, d = ⌈ln 1/δ⌉).
    *
    * Hashing follows the minhash single-hash lesson: ONE md5 per value
    * reduced to a 60-bit base, the d rows derived arithmetically with
    * the [[mixConstants]] families — deterministic, SQL-replayable, one
    * hash invocation per value.
    *
    * The sketch is index-as-data: a `(row, bucket, cnt)` table of ≤ d·w
    * rows however large the input — partial map-side counts, a
    * (row, bucket)-keyed shuffle of integer cells, mergeable by
    * cell-wise SUM (the per-ingest-batch persistence shape). */
  def cmsBuild(
      values: DataFrame, valueCol: String, w: Int, d: Int): DataFrame = {
    val base = shingleHash(col(valueCol))
    val rows = mixConstants(d).zipWithIndex.map { case ((a, b), i) =>
      struct(lit(i.toLong).as("row"),
        pmod(pmod(lit(a) * base + lit(b), lit(MinhashPrime)), lit(w.toLong))
          .as("bucket"))
    }
    values
      .select(explode(array(rows: _*)).as("rb"))
      .groupBy(col("rb.row").as("row"), col("rb.bucket").as("bucket"))
      .agg(count(lit(1)).as("cnt"))
  }

  /** Point estimates for `probes` (`valueCol`) against a built sketch:
    * `(valueCol, cms_cnt)` — min over the d cells; values the sketch
    * never saw estimate ≥ 0 from whatever collides. The probe side
    * explodes to d (row, bucket) keys and equi-joins the ≤ d·w-row
    * sketch (broadcast-sized by construction). */
  def cmsEstimate(
      probes: DataFrame, valueCol: String, sketch: DataFrame,
      w: Int, d: Int): DataFrame = {
    val base = shingleHash(col(valueCol))
    val rows = mixConstants(d).zipWithIndex.map { case ((a, b), i) =>
      struct(lit(i.toLong).as("row"),
        pmod(pmod(lit(a) * base + lit(b), lit(MinhashPrime)), lit(w.toLong))
          .as("bucket"))
    }
    probes
      .select(col(valueCol), explode(array(rows: _*)).as("rb"))
      .select(col(valueCol), col("rb.row").as("row"), col("rb.bucket").as("bucket"))
      .join(broadcast(sketch), Seq("row", "bucket"), "left")
      .groupBy(col(valueCol))
      .agg(min(coalesce(col("cnt"), lit(0L))).as("cms_cnt"))
  }

  // -------------------------------------------------------------- Bloom ---

  /** The `k` Bloom bit positions of a key: double hashing
    * (Kirsch–Mitzenmacher 2006 — position_i = h1 + i·h2 mod m) over the
    * two 60-bit halves of one md5, so one hash invocation serves all k
    * probes (the minhash single-hash lesson). Deterministic and pure
    * integer arithmetic → replayable in the SQL oracle. Both halves
    * reduce mod m BEFORE the mix: i·h2 then stays < 2^63 for any sane
    * (k, m). */
  def bloomBitPositions(key: Column, mBits: Int, k: Int): Column = {
    val hex = md5(key.cast("string"))
    val h1 = conv(substring(hex, 1, 15), 16, 10).cast("long") % mBits
    val h2 = conv(substring(hex, 16, 15), 16, 10).cast("long") % mBits
    array((0 until k).map(i => pmod(h1 + lit(i.toLong) * h2, lit(mBits.toLong))): _*)
  }

  /** Build a Bloom filter over `keyCol`: the DISTINCT set bits as a
    * `(bit BIGINT)` table — ≤ m rows however large the build side is.
    * Sparse representation: semantics (and false-positive behavior) are
    * exactly the packed filter's; at scale the same artifact packs to
    * m/64 words for shipping — either way it is broadcast-sized BY
    * CONSTRUCTION, which is the whole point. Mergeable: the filter of a
    * union is the union of filters (tested in SketchesSpec). */
  def bloomBuild(keys: DataFrame, keyCol: String, mBits: Int, k: Int): DataFrame =
    keys.select(explode(bloomBitPositions(col(keyCol), mBits, k)).as("bit"))
      .distinct()

  /** Bits per packed word: 63 keeps every word a sum of distinct
    * powers ≤ 2^62, so the packed BIGINT never overflows sign. */
  val BloomWordBits = 63

  /** Pack a set-bit list into the dense word form for serving:
    * `word[w] = Σ 2^(bit mod 63)` over bits with `bit div 63 == w`,
    * ceil(m/63) longs however sparse the filter. */
  def bloomPackWords(bloom: Seq[Long], mBits: Int): Seq[Long] = {
    val words = new Array[Long]((mBits + BloomWordBits - 1) / BloomWordBits)
    bloom.foreach { b =>
      words((b / BloomWordBits).toInt) |= 1L << (b % BloomWordBits).toInt
    }
    words.toSeq
  }

  /** Probe-side membership as a per-row PROJECTION: the filter packs to
    * ceil(m/63) words in a literal array (a dimension-table artifact,
    * like IVF centroids), and each of the k probes is ONE O(1)
    * element_at + bitwise-AND — `maybe = ∀i word[pos_i div 63] AND
    * 2^(pos_i mod 63) ≠ 0` — inside codegen with zero shuffle and no
    * join, the shape Spark's own AQE runtime filters use (broadcast the
    * filter, prune at the scan). Pure integer ops → oracle-replayable.
    * No false negatives, tunable false positives: the classic pre-join
    * corpus cut at 100 TB. */
  def bloomMaybeContains(
      key: Column, bloom: Seq[Long], mBits: Int, k: Int): Column = {
    val words = typedlit(bloomPackWords(bloom, mBits))
    val pow2 = typedlit(Seq.tabulate(BloomWordBits)(1L << _))
    val pos = bloomBitPositions(key, mBits, k)
    (0 until k).map { i =>
      val p = element_at(pos, i + 1)
      // p < mBits ≤ 2^20: the double division is exact and the cast
      // truncates toward zero on positives — integer floor div
      val w = (p / lit(BloomWordBits)).cast("long")
      val mask = element_at(pow2, pmod(p, lit(BloomWordBits.toLong)).cast("int") + 1)
      element_at(words, w.cast("int") + 1).bitwiseAND(mask) =!= 0L
    }.reduceLeft(_ && _)
  }

  /** Collect a built filter to the driver-side literal form. */
  def bloomCollect(bloomDf: DataFrame): Seq[Long] =
    bloomDf.select(col("bit").cast("long")).collect().map(_.getLong(0)).toSeq
}
