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
  /** 60-bit portable hash of a string column — the native codegen
    * expression (see expressions.Hash60; bit-identical to
    * `conv(substr(md5(c),1,15),16,10)::long`, parity spec-asserted). */
  def hash60(c: Column): Column =
    org.apache.spark.sql.graftbridge.ColumnBridge.column(
      graft.expressions.Hash60(
        org.apache.spark.sql.graftbridge.ColumnBridge.expression(
          c.cast("binary"))))

  /** The composed built-in form of hash60 — the reference formulation
    * the native expression must match (kept for the parity spec). */
  def hash60Composed(c: Column): Column =
    conv(substring(md5(c), 1, 15), 16, 10).cast("long")

  /** Seeded variant: family of independent hash functions h_i. */
  def hash60(c: Column, seed: Int): Column =
    hash60(concat(c, lit("|" + seed)))

  /** DuckDB SQL for the same hash — keep in lockstep with hash60. */
  def sqlHash60(expr: String): String =
    s"(('0x' || substr(md5($expr), 1, 15))::BIGINT)"

  def sqlHash60(expr: String, seed: Int): String =
    sqlHash60(s"$expr || '|$seed'")

  /** JVM-side hash60 of a string — same value the column expression
    * produces; used to precompute constants (e.g. LSH plane weights) at
    * plan-build time instead of per row. */
  def hash60(s: String): Long = {
    val hex = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    java.lang.Long.parseLong(hex.substring(0, 15), 16)
  }

  /** Affine MinHash lane family over a 31-bit base hash:
    * h_i(x) = (a_i * (h(x) & 0x7FFFFFFF) + b_i) mod p, p = 2^31 - 1.
    * One md5 per element, k multiply-adds — the production-rate version
    * of k independent hashes (64× fewer md5 calls), still portable:
    * products stay under 2^62 so neither engine overflows. */
  val LaneP = 2147483647L // 2^31 - 1
  val Mask31 = 2147483647L

  // md5-derived lane constants: an LCG progression here produces
  // linearly-correlated lanes, which measurably degrades banded-LSH
  // recall (observed: a J≥0.8 twin missed at P≈2e-4 odds)
  def laneA(i: Int): Long = {
    val a = hash60(s"minhash-laneA|$i") % LaneP
    if (a == 0) 1L else a
  }
  def laneB(i: Int): Long = hash60(s"minhash-laneB|$i") % LaneP

  def lane(h31: org.apache.spark.sql.Column, i: Int): org.apache.spark.sql.Column =
    (lit(laneA(i)) * h31 + lit(laneB(i))) % lit(LaneP)

  def sqlLane(h31Expr: String, i: Int): String =
    s"((${laneA(i)} * $h31Expr + ${laneB(i)}) % $LaneP)"
}
