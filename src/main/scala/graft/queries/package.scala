package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

package object queries {
  /** A named query: (session, sf data dir) => result frame.
    * Contract: deterministic output (stable tie-breaks, no raw ns
    * timestamps — events.ts is ns in parquet, Spark truncates to µs while
    * DuckDB keeps ns, so results always pass through date_trunc).
    * Float aggregates are rounded at (or beyond) the decimal grid of the
    * mathematically-exact result so Spark and the DuckDB oracle agree
    * bit-for-bit despite different summation orders.
    */
  type Q = (SparkSession, String) => DataFrame
}
