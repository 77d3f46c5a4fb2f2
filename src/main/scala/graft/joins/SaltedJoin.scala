package graft.joins

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Salted equi-join for pathologically skewed keys.
  *
  * AQE's skew-join splitting handles most skew at runtime (enabled in
  * GraftSession); salting is the static escape hatch when one key dominates
  * so heavily that even split partitions won't fit: the big (skewed) side
  * gets a deterministic salt in [0, n), the small side is replicated n
  * times, and the join key becomes (key, salt) — fanning one hot partition
  * out to n.
  */
object SaltedJoin {

  /** `skewed` ⋈ `other` on `key`, with `other` replicated `n` times.
    * `saltBy` picks the salt deterministically (e.g. a row id column);
    * results are identical to the unsalted join, partitioning is not.
    *
    * Only `inner` and `left_outer` (skewed side preserved) are supported:
    * under `right_outer`/`full_outer` the replicated small side would emit
    * each unmatched right row n times, so those are rejected rather than
    * silently wrong.
    */
  def join(
      skewed: DataFrame,
      other: DataFrame,
      key: String,
      saltBy: Column,
      n: Int,
      joinType: String = "inner"
  ): DataFrame = {
    val jt = joinType.toLowerCase.replace("_", "")
    require(
      jt == "inner" || jt == "left" || jt == "leftouter",
      s"SaltedJoin supports inner/left_outer only (got $joinType): replicating the small side " +
        "n times would duplicate unmatched right-side rows under right/full outer joins")
    // n = 0 would pmod-by-zero (ANSI error) and salt the replicated side with
    // sequence(0,-1) = [0,-1]; a pre-existing _salt column would be silently
    // clobbered and then dropped from the output
    require(n > 0, s"salt fan-out n must be positive, got $n")
    require(!skewed.columns.contains("_salt") && !other.columns.contains("_salt"),
      "inputs already carry a _salt column")
    val l = skewed.withColumn("_salt", pmod(hash(saltBy), lit(n)))
    val r = other.withColumn("_salt", explode(sequence(lit(0), lit(n - 1))))
    l.join(r, Seq(key, "_salt"), joinType).drop("_salt")
  }
}
