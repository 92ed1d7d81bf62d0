package graft

/** Every registered query runs on sf0.001, returns rows, and has unique
  * column names (the driver's compare sorts columns by name — duplicates
  * would be ambiguous). Oracle-value correctness is checked by the
  * driver's DuckDB gate (pre-flighted via tools/check_correctness.py);
  * this spec guards execution and shape.
  */
class QueriesSmokeSpec extends SparkSpec {

  test("entry returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every oracle key has a query") {
    val missing = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(missing.isEmpty, s"oracles without queries: $missing")
  }

  for ((name, fn) <- SparkEntry.queries.toSeq.sortBy(_._1)) {
    test(s"$name runs non-empty with unique columns on sf0.001") {
      val df = fn(spark, sfDir)
      val cols = df.columns.toSeq
      assert(cols.distinct.size == cols.size, s"duplicate columns: $cols")
      assert(df.count() > 0)
    }
  }
}
