package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Column-level vector math over `ARRAY<DOUBLE>` columns.
  *
  * Pure declarative `Column => Column` builders using Spark higher-order
  * functions (`transform` / `zip_with` / `aggregate`) so Catalyst sees the
  * whole expression tree: filters still push down, columns still prune, and
  * no UDF serialization boundary appears in the plan.
  *
  * Semantics mirror the reference engine exactly (bit-for-bit where the
  * driver's DuckDB oracle hash-compares):
  *  - L2 normalize is `v / (||v|| + 1e-12)` — eps-guarded, per
  *    reference `src/vectordb/index.py:4-8`.
  *  - cosine similarity normalizes BOTH sides first, then takes the dot
  *    product (reference `index.py:11-16`) — NOT `dot/(na*nb)`, which is a
  *    different float rounding.
  *  - euclidean is rescaled to a similarity as `1 / (1 + d)` (reference
  *    `index.py:40-43`).
  *  - all folds are left-to-right with a `0.0` initial accumulator, which
  *    matches DuckDB `list_reduce(list_prepend(0.0, ...))` exactly.
  *
  * Scale note: these are O(dim) per row and stay inside a single projection.
  * For pairwise work (knn join / near-dup) ALWAYS normalize once per row
  * first and use [[dot]] on the normalized arrays — never nest the norm
  * computation inside the pair loop (see `operators.VectorSearch`).
  */
object VectorFunctions {

  /** Epsilon guard for normalization (reference index.py:5-8). */
  val Eps: Double = 1e-12

  /** Cast an `ARRAY<FLOAT>` (fixture layout) to `ARRAY<DOUBLE>` at scan. */
  def asDouble(v: Column): Column = v.cast("array<double>")

  /** Sum of squares: left fold `0.0 + x1² + x2² + ...` in array order. */
  def sqSum(v: Column): Column =
    aggregate(v, lit(0.0), (acc, x) => acc + x * x)

  /** L2 norm `sqrt(Σ x²)`. */
  def l2Norm(v: Column): Column = sqrt(sqSum(v))

  /** Eps-guarded L2 normalize `v / (||v|| + 1e-12)`.
    *
    * Self-contained form: the norm subtree is nested inside the lambda and
    * re-evaluated per element — fine for one-off use, but for hot paths
    * precompute the norm as its own column and use [[scaleBy]]:
    * {{{
    *   df.withColumn("nrm", l2Norm($"emb") + lit(Eps))
    *     .withColumn("nemb", scaleBy($"emb", $"nrm"))
    * }}}
    */
  def l2Normalize(v: Column): Column =
    transform(v, x => x / (l2Norm(v) + lit(Eps)))

  /** `v / denom` elementwise, for a precomputed per-row denominator. */
  def scaleBy(v: Column, denom: Column): Column =
    transform(v, x => x / denom)

  /** Dot product: left fold of pairwise products (reference index.py:19-22). */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, x) => acc + x)

  /** Cosine similarity of two raw vectors (reference index.py:11-16).
    * Normalizes both sides inline — for pairwise loops use pre-normalized
    * arrays + [[dot]] instead. */
  def cosine(a: Column, b: Column): Column =
    dot(l2Normalize(a), l2Normalize(b))

  /** Euclidean distance `sqrt(Σ (x-y)²)` (reference index.py:25-29). */
  def euclideanDistance(a: Column, b: Column): Column =
    sqrt(aggregate(zip_with(a, b, (x, y) => (x - y) * (x - y)),
      lit(0.0), (acc, x) => acc + x))

  /** Euclidean distance rescaled to a similarity `1/(1+d)`
    * (reference index.py:40-43, api.py:91). */
  def euclideanSimilarity(a: Column, b: Column): Column =
    lit(1.0) / (lit(1.0) + euclideanDistance(a, b))

  /** Deterministic arithmetic text embedding (SURVEY §2.4.3).
    *
    * `v[i] = ((length(text) * (i+1)) mod 97) / 97.0` for i in 0..dim-1.
    * Replaces the reference's `DummyEmbeddings` (embeddings.py:17-27,
    * which seeds numpy's global RNG with `len(text)` — unportable), with
    * the same contract: a pure deterministic `String => Array[Double]` of
    * fixed width, computable identically in Spark and DuckDB.
    */
  def arithmeticEmbedding(text: Column, dim: Int): Column =
    transform(sequence(lit(1L), lit(dim.toLong)),
      i => (length(text).cast("long") * i % 97).cast("double") / lit(97.0))
}
