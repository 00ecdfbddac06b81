package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Skew mitigation for equi-joins. First line of defense is AQE's
  * runtime skew-join split (on by default; handles sort-merge joins).
  * Salting is the explicit fallback for shapes AQE cannot split —
  * stream-static joins, or when a replicated-dim broadcast is too big
  * but a single hot key still swamps one reducer.
  */
object SkewJoins {

  /** Salted inner equi-join: each left row gets a deterministic salt
    * derived from its full row content, the right side is replicated
    * `saltFactor`×, and the join key becomes (key, salt) — a hot key's
    * rows spread over `saltFactor` reducers instead of one. Shuffle
    * cost: right side grows `saltFactor`×, so use for large-left /
    * small-right with heavy left skew. Result is row-identical to the
    * plain inner join (property-tested). */
  def saltedEquiJoin(left: DataFrame, right: DataFrame, key: String,
                     saltFactor: Int): DataFrame = {
    require(saltFactor >= 1, "saltFactor must be >= 1")
    val salt = pmod(xxhash64(struct(left.columns.map(col): _*)), lit(saltFactor))
      .cast("int")
    val l = left.withColumn("__graft_salt", salt)
    val r = right.withColumn("__graft_salt",
      explode(array((0 until saltFactor).map(lit): _*)))
    l.join(r, Seq(key, "__graft_salt")).drop("__graft_salt")
  }
}
