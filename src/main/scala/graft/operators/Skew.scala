package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation for joins whose key distribution is heavy-tailed.
  *
  * AQE's skew-join handling splits oversized SHUFFLE partitions at
  * runtime and is the first line of defense (left enabled everywhere).
  * Salting is the explicit fallback for the cases AQE can't fix — e.g.
  * a hot key whose rows must still meet every row of the other side:
  * the left side gets a random-but-deterministic salt in [0, saltFactor),
  * the right side is replicated saltFactor times, and the join key
  * becomes (key, salt) — the hot key's work spreads over saltFactor
  * reducers at the cost of replicating the (smaller) right side.
  */
object Skew {

  /** Deterministic per-row salt in [0, saltFactor): a hash of the whole
    * row's id column — stable across retries (no rand(), which would
    * break replay/determinism). */
  def salt(idCol: Column, saltFactor: Int): Column =
    pmod(hash(idCol), lit(saltFactor))

  /** Equi-join `left` with `right` on `key`, salted `saltFactor` ways.
    * `leftId` is any left column that distributes rows (used only to
    * derive the salt). Result columns = left columns ++ right columns
    * (minus the duplicate key). */
  def saltedJoin(
      left: DataFrame,
      right: DataFrame,
      key: String,
      leftId: String,
      saltFactor: Int): DataFrame = {
    val salted = left.withColumn("__salt", salt(col(leftId), saltFactor))
    val replicated = right
      .withColumn("__salt", explode(array((0 until saltFactor).map(lit): _*)))
    salted
      .join(replicated, Seq(key, "__salt"))
      .drop("__salt")
  }
}
