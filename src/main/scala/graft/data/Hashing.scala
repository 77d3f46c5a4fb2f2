package graft.data

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Cross-engine-deterministic hash family for dedup/sketching.
  *
  * `hash60` maps a string to the first 60 bits of its md5 as a non-negative
  * long — identical in Spark (`conv(substring(md5(x),1,15),16,10)`) and
  * DuckDB (`CAST('0x'||substr(md5(x),1,15) AS BIGINT)`), which lets the
  * correctness oracle replay MinHash/SimHash exactly. Seeded variants give the
  * k independent hash functions a MinHash signature needs.
  *
  * (Spark's builtin xxhash64/murmur would be faster but has no DuckDB
  * equivalent; md5 here is verification-grade, swap the family for xxhash64
  * via the same interface when oracle parity is not required.)
  */
object Hashing {

  def hash60(c: Column): Column =
    graft.functions.Md5Hash60(c)

  /** The builtin-only formulation (kept for cross-checking the native
    * expression; bit-identical).
    */
  def hash60Builtin(c: Column): Column =
    conv(substring(md5(c), 1, 15), 16, 10).cast("long")

  def hash60Seeded(seed: Int, c: Column): Column =
    hash60(concat(lit(seed.toString), lit("#"), c))
}
