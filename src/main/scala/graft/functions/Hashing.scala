package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Cross-engine deterministic hashing.
  *
  * `xxhash64`/`hash` are Spark-private algorithms; to make sketch-based
  * operators (MinHash, SimHash, LSH) oracle-verifiable we derive a 60-bit
  * hash from md5, which every engine computes identically:
  *   Spark :  conv(substr(md5(x),1,15),16,10)::long
  *   DuckDB: ('0x' || substr(md5(x),1,15))::BIGINT
  * 15 hex digits = 60 bits, always non-negative, fits a signed 64-bit.
  *
  * Perf note: md5 is ~3× slower than xxhash64. The operators take the
  * hash as a parameter so production runs can swap in `xxhash64` (same
  * distribution properties) — the oracle-parity hash is the test
  * configuration, not a design constraint.
  */
object Hashing {
  /** 60-bit portable hash of a string column. */
  def hash60(c: Column): Column =
    conv(substring(md5(c), 1, 15), 16, 10).cast("long")

  /** Seeded variant: family of independent hash functions h_i. */
  def hash60(c: Column, seed: Int): Column =
    hash60(concat(c, lit("|" + seed)))

  /** DuckDB SQL for the same hash — keep in lockstep with hash60. */
  def sqlHash60(expr: String): String =
    s"(('0x' || substr(md5($expr), 1, 15))::BIGINT)"

  def sqlHash60(expr: String, seed: Int): String =
    sqlHash60(s"$expr || '|$seed'")
}
