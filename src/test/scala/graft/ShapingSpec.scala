package graft

import org.apache.spark.sql.functions._
import graft.queries.Shaping

/** Structural invariants of the analytics reshapes beyond the oracle
  * restatement. Runs at sf0.001. */
class ShapingSpec extends SparkSpec {
  import spark.implicits._

  test("funnel stages are monotone in time and consistent with nulls") {
    val f = Shaping.funnel(spark, sfDir).cache()
    assert(f.filter($"t_view" < $"t_click").count() === 0)
    assert(f.filter($"t_purchase" < $"t_view").count() === 0)
    // stage number encodes exactly which times are present (a later
    // stage requires all earlier ones)
    assert(f.filter($"funnel_stage" === 3 && ($"t_purchase".isNull ||
      $"t_view".isNull || $"t_click".isNull)).count() === 0)
    assert(f.filter($"funnel_stage" === 2 && ($"t_view".isNull ||
      $"t_purchase".isNotNull)).count() === 0)
    assert(f.filter($"funnel_stage" === 0 && $"t_click".isNotNull)
      .count() === 0)
    f.unpersist()
  }

  test("rangeNtile is bit-identical to ntile for every k and skewed " +
    "inputs, with no unpartitioned window in the plan") {
    import org.apache.spark.sql.expressions.Window
    // skewed values (many ties) + unique tiebreak id, uneven total
    val n = 1237
    val df = spark.range(n).toDF("id")
      .withColumn("v", (col("id") * col("id") % 17).cast("int"))
      .cache()
    for (k <- Seq(1, 3, 4, 10, 64)) {
      val expected = df.select(col("id"),
        ntile(k).over(Window.orderBy(col("v"), col("id"))).as("b"))
      val got = graft.functions.ScaleWindows
        .rangeNtile(df, k, Seq(col("v").asc, col("id").asc), "b")
        .select(col("id"), col("b"))
      assert(got.except(expected).count() === 0 &&
        expected.except(got).count() === 0, s"mismatch at k=$k")
    }
    // plan hygiene: the scale form must not contain a global-order
    // window (the single-partition sort the naive ntile plan ships)
    val plan = graft.functions.ScaleWindows
      .rangeNtile(df, 10, Seq(col("v").asc, col("id").asc), "b")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Window [ntile"),
      "rangeNtile plan must not fall back to a global ntile window")
    df.unpersist()
  }

  test("rangeCumSums matches the global-window prefix sum exactly and " +
    "keeps the window partitioned") {
    import org.apache.spark.sql.expressions.Window
    val df = spark.range(997).toDF("id")
      .withColumn("k", (col("id") * 7 % 101).cast("long"))
      .withColumn("a", col("id") % 5)
      .withColumn("b", col("id") % 3)
      .groupBy("k").agg(sum(col("a")).as("a"), sum(col("b")).as("b"))
      .cache()
    val w = Window.orderBy(col("k"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val expected = df.select(col("k"),
      coalesce(sum(col("a")).over(w), lit(0L)).as("ca"),
      coalesce(sum(col("b")).over(w), lit(0L)).as("cb"))
    val got = graft.functions.ScaleWindows
      .rangeCumSums(df, Seq(col("k").asc),
        Seq(col("a") -> "ca", col("b") -> "cb"), parts = 7)
      .select(col("k"), col("ca"), col("cb"))
    assert(got.except(expected).count() === 0 &&
      expected.except(got).count() === 0)
    val plan = got.queryExecution.executedPlan.toString
    assert(plan.contains("__pid"),
      "cumsum window must be partitioned by the range-partition id")
    df.unpersist()
  }

  test("rangeLastCarry equals the global last-ignoreNulls window, " +
    "including leading nulls and cross-partition carries") {
    import org.apache.spark.sql.expressions.Window
    val df = spark.range(1000).toDF("id")
      .withColumn("v", when(col("id") % 97 === 5, col("id")))
    val w = Window.orderBy(col("id"))
      .rowsBetween(Window.unboundedPreceding, 0)
    val expected = df.select(col("id"),
      last(col("v"), ignoreNulls = true).over(w).as("lv"))
    val got = graft.functions.ScaleWindows
      .rangeLastCarry(df, Seq(col("id")), col("v"), "lv", parts = 9)
      .select(col("id"), col("lv"))
    assert(got.except(expected).count() === 0 &&
      expected.except(got).count() === 0)
  }

  test("distributed GCM isotonic fit equals the sequential PAV loop") {
    val rnd = new scala.util.Random(7)
    val data = (0 until 60).map(i =>
      (i.toLong, 1L + rnd.nextInt(5).toLong, rnd.nextInt(5).toLong))
    // reference: the textbook pool-adjacent-violators merge loop
    def pav(b: Seq[(Long, Long, Long)]): Map[Long, Long] = {
      case class Pool(var n: Long, var sy: Long,
        xs: scala.collection.mutable.ArrayBuffer[Long])
      val pools = scala.collection.mutable.ArrayBuffer.empty[Pool]
      for ((x, n, sy) <- b) {
        pools += Pool(n, sy, scala.collection.mutable.ArrayBuffer(x))
        while (pools.size >= 2 && {
          val a = pools(pools.size - 2); val c = pools.last
          a.sy * c.n >= c.sy * a.n // prev avg >= next avg: violator
        }) {
          val c = pools.remove(pools.size - 1); val a = pools.last
          a.n += c.n; a.sy += c.sy; a.xs ++= c.xs
        }
      }
      pools.flatMap(p =>
        p.xs.map(x => x -> (1000000L * p.sy / p.n))).toMap
    }
    val df = data.toDF("x", "n", "sy")
    val got = graft.functions.Isotonic.fit(df, parts = 7)
      .collect().map(r => r.getLong(0) -> r.getLong(3)).toMap
    assert(got === pav(data))
  }

  test("retention cohorts: offsets non-negative, day-0 equals cohort " +
    "size, users conserved") {
    val m = Shaping.retentionCohorts(spark, sfDir).cache()
    assert(m.filter($"day_offset" < 0).count() === 0)
    // every user appears in their cohort's day-0 cell by construction
    val day0 = m.filter($"day_offset" === 0)
      .agg(sum($"n_users")).as[Long].head()
    val users = graft.Tables(spark, sfDir, "events")
      .select($"user_id").distinct().count()
    assert(day0 === users,
      s"day-0 cells must partition the $users users, got $day0")
    m.unpersist()
  }
}
