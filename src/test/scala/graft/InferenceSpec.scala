package graft

import org.apache.spark.sql.functions._
import graft.queries.Inference

/** Semantic invariants for the inference batch (q408+). Value-level
  * correctness is the driver's DuckDB gate; these assert the
  * mathematical properties that must hold regardless of data.
  */
class InferenceSpec extends SparkSpec {
  import spark.implicits._

  test("q408 IV: n matches the join, slope finite and nonzero-sane") {
    val r = Inference.ivWald(spark, sfDir).collect().head
    val n = Tables(spark, sfDir, "lineitem")
      .join(Tables(spark, sfDir, "part"),
        $"l_partkey" === $"p_partkey").count()
    assert(r.getAs[Long]("n") == n)
    // price ~ quantity: both βIV and the first stage exist (cents scale
    // keeps |β| well under 1e12 micro even at tiny SF)
    assert(math.abs(r.getAs[Long]("beta_iv_micro")) < 1000000000000L)
    assert(!r.isNullAt(r.fieldIndex("gamma_micro")))
  }

  test("q409 Chow: segments partition the days; F non-negative") {
    val r = Inference.chowTest(spark, sfDir).collect().head
    val days = Tables(spark, sfDir, "orders")
      .select(to_date($"o_orderdate")).distinct().count()
    assert(r.getAs[Long]("n1") + r.getAs[Long]("n2") == days)
    assert(r.getAs[Long]("n1") > 2 && r.getAs[Long]("n2") > 2)
    // pooled SSR >= split SSRs by least-squares optimality => F >= 0
    assert(r.getAs[Long]("f_milli") >= 0)
  }

  test("q410 Brunner-Munzel: p-hat in [0,1], df positive") {
    val r = Inference.brunnerMunzel(spark, sfDir).collect().head
    val n1 = r.getAs[Long]("n1")
    val n2 = r.getAs[Long]("n2")
    val total = Tables(spark, sfDir, "orders").count()
    assert(n1 + n2 == total && n1 > 1 && n2 > 1)
    val p = r.getAs[Long]("p_hat_micro")
    assert(p >= 0 && p <= 1000000)
    // Welch-style df: min(n1,n2)-1 <= df <= n1+n2-2 (Brunner-Munzel
    // 2000, Satterthwaite bound)
    val df = r.getAs[Long]("df_milli")
    assert(df >= (math.min(n1, n2) - 1) * 1000 - 1000 &&
      df <= (n1 + n2 - 2) * 1000 + 1000)
  }

  test("q411 Page: L within the exact min/max over 7 ranks") {
    val r = Inference.pageTrend(spark, sfDir).collect().head
    val b = r.getAs[Long]("b_blocks")
    assert(b == 5)
    // per block, sum j*rk over a permutation of 1..7 is in
    // [sum j*(8-j), sum j*j] = [84, 140]
    val l = r.getAs[Long]("l_stat")
    assert(l >= 84 * b && l <= 140 * b)
  }

  test("q412 ERR: per-label ERR in [0, 1e6], counts positive") {
    val r = graft.queries.Analytics.errEval(spark, sfDir).collect()
    assert(r.nonEmpty)
    r.foreach { row =>
      // ERR is a sub-probability: sum over 10 ranks of P(stop at r)/r
      val e = row.getAs[Long]("err_micro")
      assert(e >= 0 && e <= 1000000)
      assert(row.getAs[Long]("n_queries") > 0)
    }
  }

  test("q413 Bartlett: chi2 non-negative, groups and n complete") {
    val r = Inference.bartlett(spark, sfDir).collect().head
    assert(r.getAs[Long]("k_groups") == 5)
    assert(r.getAs[Long]("n") ==
      Tables(spark, sfDir, "orders").count())
    // Jensen: (N-k)·ln(pooled) >= Σ(ni-1)·ln(si²); correction factor
    // C > 1, so the statistic stays non-negative (tiny quantization
    // slack)
    assert(r.getAs[Long]("chi2_milli") >= -1)
  }

  test("q414 Mood: median splits mass near half; chi2 non-negative") {
    val r = Inference.moodMedian(spark, sfDir).collect().head
    val total = Tables(spark, sfDir, "orders").count()
    assert(r.getAs[Long]("n") == total)
    assert(r.getAs[Long]("chi2_micro") >= 0)
    // the lower median must be an attained cents value with at least
    // half the mass at or below it
    val med = r.getAs[Long]("med_cents")
    val below = Tables(spark, sfDir, "orders")
      .filter(round($"o_totalprice" * 100).cast("long") <= med).count()
    val strictly = Tables(spark, sfDir, "orders")
      .filter(round($"o_totalprice" * 100).cast("long") < med).count()
    assert(2 * below >= total && 2 * strictly < total)
  }

  test("q415 CvM: T within the exact two-sample bounds") {
    val r = Inference.cvmTwoSample(spark, sfDir).collect().head
    val n = r.getAs[Long]("n")
    val m = r.getAs[Long]("m")
    val counts = Tables(spark, sfDir, "lineitem")
      .groupBy($"l_returnflag").count().collect()
      .map(x => x.getString(0) -> x.getLong(1)).toMap
    assert(n == counts("R") && m == counts("A"))
    // Anderson 1962: T in [(4nm-1)/(6(n+m)) shifted to 0 .. nm/(n+m)]
    // => after centering, 0 <= T <= (n+m)/6 roughly; assert the loose
    // sanity window T >= 0 (centering term is the exact minimum) and
    // T below the theoretical max nm(n+m)/(...) bound proxy
    val t = r.getAs[Long]("t_micro")
    assert(t >= -1)
    assert(t <= (n + m) * 1000000L / 6 + 1000000L)
  }

  test("q416 Ansari-Bradley: A within the exact score-sum bounds") {
    val r = Inference.ansariBradley(spark, sfDir).collect().head
    val n1 = r.getAs[Long]("n1")
    val n2 = r.getAs[Long]("n2")
    val total = Tables(spark, sfDir, "orders")
      .filter($"o_orderstatus".isin("F", "O")).count()
    assert(n1 + n2 == total && n1 > 1 && n2 > 1)
    // A is a sum of n1 scores, each in [1, ceil(N/2)]
    val a = r.getAs[Long]("a_stat")
    assert(a >= n1 && a <= n1 * ((n1 + n2 + 1) / 2))
  }

  test("q417 Quade: F non-negative; 5 blocks x 7 treatments") {
    val r = Inference.quadeTest(spark, sfDir).collect().head
    assert(r.getAs[Long]("b_blocks") == 5)
    assert(r.getAs[Long]("k_treatments") == 7)
    // A - B = sum of block-wise squared deviations around treatment
    // means >= 0 and B >= 0 => F >= 0
    assert(r.getAs[Long]("f_milli") >= 0)
  }

  test("q418 Lepage: L = zw^2 + za^2 within rounding") {
    val r = Inference.lepageTest(spark, sfDir).collect().head
    assert(r.getAs[Long]("n1") + r.getAs[Long]("n2") ==
      Tables(spark, sfDir, "lineitem").count())
    val zw = r.getAs[Long]("zw_milli") / 1000.0
    val za = r.getAs[Long]("za_milli") / 1000.0
    val l = r.getAs[Long]("l_milli") / 1000.0
    assert(l >= 0)
    // quantized components must reassemble to L within quantization
    // slack (each z carries <=0.5 milli rounding)
    assert(math.abs(l - (zw * zw + za * za)) <
      0.002 * (math.abs(zw) + math.abs(za)) + 0.002)
  }

  test("q419 Cucconi: C non-negative, U/V finite") {
    val r = Inference.cucconiTest(spark, sfDir).collect().head
    assert(r.getAs[Long]("n1") > 1 && r.getAs[Long]("n2") > 1)
    // C is a positive-definite quadratic form in (U, V): |rho| < 1
    assert(r.getAs[Long]("c_milli") >= 0)
    assert(math.abs(r.getAs[Long]("u_milli")) < 100000000L)
    assert(math.abs(r.getAs[Long]("v_milli")) < 100000000L)
  }

  test("q420 Yule-Walker: AR(2) stationary-region and variance ratio") {
    val r = Inference.yuleWalkerAr2(spark, sfDir).collect().head
    val days = Tables(spark, sfDir, "orders")
      .select(to_date($"o_orderdate")).distinct().count()
    assert(r.getAs[Long]("d_days") == days)
    val p1 = r.getAs[Long]("phi1_micro") / 1e6
    val p2 = r.getAs[Long]("phi2_micro") / 1e6
    // YW estimates from a true autocovariance sequence lie in the
    // stationarity triangle (|phi2| <= 1, phi2 +- phi1 < 1); allow
    // gap-induced slack at tiny SF
    assert(math.abs(p2) <= 1.5 && math.abs(p1) <= 2.5)
    // innovation variance cannot exceed the series variance
    val ir = r.getAs[Long]("innov_ratio_micro")
    assert(ir <= 1000001L)
  }

  test("q421 Cp/Cpk: per-brand, Cpk <= Cp, mean inside spec") {
    val rows = Inference.processCapability(spark, sfDir).collect()
    assert(rows.length == 25)
    rows.foreach { r =>
      assert(r.getAs[Long]("n") > 1)
      val mean = r.getAs[Long]("mean_milli")
      assert(mean >= 1000 && mean <= 50000)
      // Cpk = Cp - |centering penalty| <= Cp always
      assert(r.getAs[Long]("cpk_milli") <= r.getAs[Long]("cp_milli"))
      assert(r.getAs[Long]("cpk_milli") > 0)
    }
  }

  test("q422 MAP: per-label MAP in [0, 1e6], counts positive") {
    val r = graft.queries.Analytics.mapEval(spark, sfDir).collect()
    assert(r.nonEmpty)
    r.foreach { row =>
      // AP is an average of precisions, each in [0, 1]
      val m = row.getAs[Long]("map_micro")
      assert(m >= 0 && m <= 1000000)
      assert(row.getAs[Long]("n_queries") > 0)
    }
  }

  test("q423 BWS: B non-negative, counts match the R/A split") {
    val r = Inference.bwsTest(spark, sfDir).collect().head
    val counts = Tables(spark, sfDir, "lineitem")
      .groupBy($"l_returnflag").count().collect()
      .map(x => x.getString(0) -> x.getLong(1)).toMap
    assert(r.getAs[Long]("n") == counts("R"))
    assert(r.getAs[Long]("m") == counts("A"))
    // B is an average of squared standardized gaps
    assert(r.getAs[Long]("b_micro") >= 0)
  }

  test("q424 Dunn: 10 ordered pairs, z antisymmetry consistency") {
    val rows = Inference.dunnPosthoc(spark, sfDir).collect()
    assert(rows.length == 10)
    rows.foreach { row =>
      assert(row.getAs[String]("g_i") < row.getAs[String]("g_j"))
      assert(row.getAs[Long]("n_i") > 0 && row.getAs[Long]("n_j") > 0)
    }
    // total row count partitions across the 5 groups
    val seen = rows.flatMap(r => Seq(
      r.getAs[String]("g_i") -> r.getAs[Long]("n_i"),
      r.getAs[String]("g_j") -> r.getAs[Long]("n_j"))).toMap
    assert(seen.size == 5)
    assert(seen.values.sum ==
      Tables(spark, sfDir, "orders").count())
  }

  test("q425 Bradley-Terry: plain-Scala MM replay is bit-identical; " +
    "wins consistent with the pair frame") {
    val rows = Inference.bradleyTerry(spark, sfDir).collect()
    assert(rows.nonEmpty && rows.length <= 25)
    // rebuild the pair frame independently and replay the 3 MM steps
    // in plain Scala with the same integer micro arithmetic
    val ob = Tables(spark, sfDir, "lineitem")
      .join(Tables(spark, sfDir, "part")
        .select($"p_partkey", $"p_brand"), $"l_partkey" === $"p_partkey")
      .groupBy($"l_orderkey", $"p_brand")
      .agg(sum($"l_quantity".cast("long")).as("q"))
      .collect()
      .groupBy(_.getAs[Long]("l_orderkey"))
    val winCount = collection.mutable.Map.empty[(String, String), Long]
    ob.values.foreach { grp =>
      for (a <- grp; b <- grp) {
        val (ba, bb) = (a.getAs[String]("p_brand"),
          b.getAs[String]("p_brand"))
        if (ba != bb && a.getAs[Long]("q") > b.getAs[Long]("q"))
          winCount((ba, bb)) = winCount.getOrElse((ba, bb), 0L) + 1L
      }
    }
    val pairs = winCount.keySet.flatMap(p => Seq(p, (p._2, p._1)))
    val wij = pairs.map(p => p -> winCount.getOrElse(p, 0L)).toMap
    val nij = pairs.map(p =>
      p -> (wij(p) + wij((p._2, p._1)))).toMap
    // .toSeq before the value maps: these fold over PAIRS, and a Set
    // of mapped values would collapse equal counts
    val pairSeq = pairs.toSeq
    val brands = pairs.map(_._1)
    val wi = brands.map(b => b -> pairSeq.filter(_._1 == b)
      .map(wij).sum).toMap
    var s = brands.map(b => b -> 1000000L).toMap
    for (_ <- 1 to 3) {
      s = brands.map { b =>
        val den = pairSeq.filter(_._1 == b).map { p =>
          (BigInt(nij(p)) * BigInt("1000000000000000") /
            BigInt(s(p._1) + s(p._2))).toLong
        }.sum
        b -> math.max((BigInt(wi(b)) * BigInt("1000000000000000") /
          BigInt(den)).toLong, 1L)
      }.toMap
    }
    rows.foreach { r =>
      val b = r.getAs[String]("brand")
      assert(r.getAs[Long]("wins") == wi(b), s"wins mismatch for $b")
      assert(r.getAs[Long]("strength_micro") == s(b),
        s"MM replay mismatch for $b: engine " +
          s"${r.getAs[Long]("strength_micro")} vs scala ${s(b)}")
    }
    assert(rows.length == brands.size)

    // q426 rides the same pair frame: replay the transitivity audit
    // brute-force and assert the engine counts bit-for-bit
    val t = Inference.prefTransitivity(spark, sfDir).collect().head
    val dom = pairSeq.filter(p => wij(p) > wij((p._2, p._1))).toSet
    val ties = pairSeq.count(p =>
      wij(p) == wij((p._2, p._1))) / 2
    val bs = brands.toSeq.sorted
    val cyc = (for {
      i <- bs; j <- bs; k <- bs
      if i < j && i < k && j != k // each cycle once: smallest first
      if dom((i, j)) && dom((j, k)) && dom((k, i))
    } yield 1).size
    assert(t.getAs[Long]("n_items") == brands.size)
    assert(t.getAs[Long]("dominant_pairs") == dom.size)
    assert(t.getAs[Long]("tied_pairs") == ties)
    assert(t.getAs[Long]("circular_triads") == cyc,
      s"engine ${t.getAs[Long]("circular_triads")} vs scala $cyc")
  }
}
