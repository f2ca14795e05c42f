package graft.functions

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Manual key-salting for skewed equi-joins.
  *
  * AQE's skew-join handling (on by default in graft sessions) splits
  * oversized *shuffle partitions*; salting is the complementary technique
  * when a single join key is itself pathological (one user with 10^9
  * events joining a per-user dimension): the hot key's rows spread over
  * `salt` subkeys, the small side is replicated `salt`×, and no single
  * task ever owns the whole hot key.
  */
object SkewJoin {

  /** Inner equi-join of a skewed `big` side against a small `dim` side on
    * `key`. `big` rows are salted by row *position* (not content — a hot
    * key's rows are often byte-identical duplicates, and a content hash
    * would send them all to one subkey); `dim` rows are replicated across
    * all salts. Result equals `big.join(dim, key)` row-for-row.
    *
    * Determinism caveat: the position salt depends on partition layout,
    * so `big` should come from a deterministic lineage (a file scan, not
    * a round-robin repartition) for stable retries — the same constraint
    * Spark's own round-robin repartition operates under. For shuffle-skew
    * (as opposed to a pathological single key), prefer AQE's built-in
    * skew-join handling, which is on by default in graft sessions.
    */
  def saltedInner(big: DataFrame, dim: DataFrame, key: String, salt: Int = 8): DataFrame = {
    require(salt >= 1, s"salt must be >= 1, got $salt")
    require(!big.columns.contains("__salt") && !dim.columns.contains("__salt"),
      "inputs must not already have a __salt column")
    val bigS = big.withColumn("__salt",
      pmod(monotonically_increasing_id(), lit(salt.toLong)).cast("int"))
    val dimS = dim.withColumn("__salt",
      explode(sequence(lit(0), lit(salt - 1))))
    bigS.join(dimS, Seq(key, "__salt")).drop("__salt")
  }
}
