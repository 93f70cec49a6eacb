package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation for shuffle joins.
  *
  * AQE's skew-join splitting handles most hot keys at runtime; when a
  * key is so hot that even split partitions overwhelm executors (the
  * classic null-key / mega-customer case), salting spreads ONE
  * logical key over `factor` physical keys: the large side gets a
  * random-but-deterministic salt, the small side is replicated
  * `factor` times, and the join key becomes (key, salt).
  *
  * Replication multiplies the small side by `factor` — use for
  * big⋈medium joins where the medium side is too large to broadcast
  * but cheap to replicate 8–16×.
  */
object Skew {
  /** Deterministic per-row salt in [0, factor) derived from stable
    * `entropy` columns (NOT rand() — retries and verification need
    * reproducibility). */
  def salt(factor: Int, entropy: Column*): Column =
    pmod(xxhash64(entropy: _*), lit(factor.toLong)).cast("int")

  /** Salted equi-join: `big` ⋈ `small` on `key`, with `big`'s rows
    * spread across `factor` salted sub-keys and `small` replicated. */
  def saltedJoin(
      big: DataFrame, small: DataFrame, key: String, factor: Int,
      bigEntropy: Seq[Column], joinType: String = "inner"
  ): DataFrame = {
    // Replicating the small side is only sound when unmatched SMALL
    // rows never reach the output: "right"/"full"/"left_semi" on the
    // replicated side would emit each unmatched small row `factor`
    // times.
    require(joinType == "inner" || joinType == "left", s"unsupported joinType $joinType")
    val saltedBig = big.withColumn("__salt", salt(factor, bigEntropy: _*))
    val replicatedSmall = small.withColumn("__salt", explode(sequence(lit(0), lit(factor - 1))))
    saltedBig.join(replicatedSmall, Seq(key, "__salt"), joinType).drop("__salt")
  }
}
