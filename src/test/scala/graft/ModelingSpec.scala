package graft

import org.apache.spark.sql.functions._
import graft.queries.Modeling

/** Semantic invariants for the modeling batch (q346+). Value-level
  * correctness is the driver's DuckDB gate; these assert the
  * mathematical properties that must hold regardless of data.
  */
class ModelingSpec extends SparkSpec {
  import spark.implicits._

  test("q346 item CF: ranks contiguous from 1, cosine² within [0,1e12], symmetric support") {
    val r = Modeling.itemCfTopk(spark, sfDir)
    val rows = r.collect()
    assert(rows.nonEmpty)
    assert(rows.forall(x => x.getAs[Long]("cos2_micro2") >= 0 &&
      x.getAs[Long]("cos2_micro2") <= 1000000000000L))
    // per item: ranks are 1..k with k<=3 and scores non-increasing
    rows.groupBy(_.getAs[Long]("item")).foreach { case (_, g) =>
      val sorted = g.sortBy(_.getAs[Int]("rk"))
      assert(sorted.map(_.getAs[Int]("rk")).toSeq == (1 to g.length))
      val scores = sorted.map(_.getAs[Long]("cos2_micro2"))
      assert(scores.zip(scores.tail).forall { case (a, b) => a >= b })
    }
    // the symmetric union must contain each undirected pair both ways
    // before ranking; spot-check via a self-neighbor ban
    assert(rows.forall(x =>
      x.getAs[Long]("item") != x.getAs[Long]("neighbor")))
  }

  test("q347 ALS half-step: solution satisfies the 2x2 normal equations") {
    // reconstruct A and b for one user and check (A+λI)x ≈ b at the
    // unquantized solution — Cramer inversion must be the exact solve
    val rated = Tables(spark, sfDir, "lineitem")
      .join(Tables(spark, sfDir, "orders")
        .select($"o_orderkey", $"o_custkey"), $"l_orderkey" === $"o_orderkey")
      .select($"o_custkey".as("usr"),
        ($"l_partkey" % 7 - 3).cast("long").as("f1"),
        (expr("(l_partkey div 7) % 7").cast("long") - 3).as("f2"),
        $"l_quantity".cast("long").as("y"))
    val m = rated.groupBy($"usr").agg(
      sum($"f1" * $"f1").as("a11"), sum($"f1" * $"f2").as("a12"),
      sum($"f2" * $"f2").as("a22"), sum($"f1" * $"y").as("b1"),
      sum($"f2" * $"y").as("b2")).orderBy($"usr").first()
    val (a11, a12, a22) = (m.getLong(1), m.getLong(2), m.getLong(3))
    val (b1, b2) = (m.getLong(4), m.getLong(5))
    val det = (a11 + 10.0) * (a22 + 10.0) - a12.toDouble * a12
    val x1 = ((a22 + 10.0) * b1 - a12.toDouble * b2) / det
    val x2 = ((a11 + 10.0) * b2 - a12.toDouble * b1) / det
    assert(math.abs((a11 + 10.0) * x1 + a12 * x2 - b1) < 1e-6 * math.max(1.0, math.abs(b1)))
    assert(math.abs(a12 * x1 + (a22 + 10.0) * x2 - b2) < 1e-6 * math.max(1.0, math.abs(b2)))
    val r = Modeling.alsHalfStep(spark, sfDir).orderBy($"usr").first()
    assert(r.getAs[Long]("x1_milli") == math.round(1000.0 * x1))
    assert(r.getAs[Long]("x2_milli") == math.round(1000.0 * x2))
  }

  test("q348 t-closeness: tv2num within [0, 2·n_g·N]; group sizes sum to N") {
    val rows = Modeling.tCloseness(spark, sfDir).collect()
    assert(rows.nonEmpty)
    val nTotal = Tables(spark, sfDir, "customer").count()
    assert(rows.map(_.getAs[Long]("n_g")).sum == nTotal)
    rows.foreach { x =>
      val tv2 = x.getAs[Long]("tv2num")
      assert(tv2 >= 0 && tv2 <= 2L * x.getAs[Long]("n_g") * nTotal)
      val flag = x.getAs[Int]("violates_t")
      assert(flag == (if (5L * tv2 > 2L * x.getAs[Long]("n_g") * nTotal) 1 else 0))
    }
  }

  test("q349 Shapley: efficiency — the three 6·φ values sum to 6·v(full)") {
    val r = Modeling.shapleyAttribution(spark, sfDir).collect().head
    val conv = r.getAs[Long]("conversions")
    val sum6 = r.getAs[Long]("phi6_view") + r.getAs[Long]("phi6_click") +
      r.getAs[Long]("phi6_signup")
    assert(sum6 == 6L * conv, s"efficiency axiom: $sum6 != ${6L * conv}")
    assert(conv > 0)
  }

  test("q350 jackknife: se positive and theta equals the plain ratio") {
    val r = Modeling.jackknifeVariance(spark, sfDir).collect().head
    assert(r.getAs[Long]("n_groups") > 1)
    assert(r.getAs[Long]("se_micro") >= 0)
    val o = Tables(spark, sfDir, "orders")
      .join(Tables(spark, sfDir, "customer"), $"o_custkey" === $"c_custkey")
      .agg(count(lit(1)).as("n"),
        sum(round($"o_totalprice" * 100).cast("long")).as("s")).first()
    val expected = math.round(1e6 * o.getLong(1).toDouble / o.getLong(0))
    assert(r.getAs[Long]("theta_micro") == expected)
  }

  test("q352 AIPW: finite, and consistent with its own sum/count") {
    val r = Modeling.doublyRobustAte(spark, sfDir).collect().head
    val n = r.getAs[Long]("n")
    val sum = r.getAs[Long]("sum_phi_milli")
    assert(n == Tables(spark, sfDir, "orders").count())
    assert(r.getAs[Long]("ate_milli_cents") ==
      math.round(sum.toDouble / n))
  }

  test("q353 Fleiss kappa: matches a brute-force recomputation") {
    val r = Modeling.fleissKappa(spark, sfDir).collect().head
    val docs = Tables(spark, sfDir, "documents")
      .select($"text", $"n_chars").collect()
    val gs = docs.map { d =>
      val text = d.getString(0); val nc = d.getLong(1)
      (if (nc > 300) 1 else 0) +
        (if (text.count(_.isDigit) * 25 < nc) 1 else 0) +
        (if (text.count(_ == '.') >= 3) 1 else 0)
    }
    val nn = gs.length.toDouble
    val p = gs.sum / (3.0 * nn)
    val pBar = gs.map(g => (g * g + (3 - g) * (3 - g) - 3) / 6.0).sum / nn
    val pe = p * p + (1 - p) * (1 - p)
    val kappa = (pBar - pe) / (1 - pe)
    assert(r.getAs[Long]("kappa_micro") == math.round(1e6 * kappa))
  }

  test("q354 Murphy identity: REL - RES + UNC equals the direct Brier score") {
    val r = Modeling.brierDecomposition(spark, sfDir).collect().head
    val decomposed = r.getAs[Long]("rel_micro") -
      r.getAs[Long]("res_micro") + r.getAs[Long]("unc_micro")
    // direct Brier with the same bin-midpoint forecasts
    val rows = Tables(spark, sfDir, "orders")
      .join(Tables(spark, sfDir, "customer")
        .select($"c_custkey", $"c_acctbal"), $"o_custkey" === $"c_custkey")
      .select(round($"c_acctbal" * 100).cast("long").as("bal"),
        $"o_orderkey",
        when($"o_orderpriority" === "1-URGENT", 1.0).otherwise(0.0).as("o"))
      .collect().sortBy(x => (x.getAs[Long]("bal"), x.getAs[Long]("o_orderkey")))
    val n = rows.length
    val bs = rows.zipWithIndex.map { case (x, i) =>
      val p = ((i.toLong * 10 / n) * 100 + 50) / 1000.0
      math.pow(p - x.getAs[Double]("o"), 2)
    }.sum / n
    assert(math.abs(decomposed - math.round(1e6 * bs)) <= 3,
      s"identity violated: $decomposed vs ${math.round(1e6 * bs)}")
  }

  test("q355 PPS systematic: multiplicities telescope to exactly K=100") {
    val rows = Modeling.ppsSystematic(spark, sfDir).collect()
    assert(rows.map(_.getAs[Long]("m")).sum == 100L)
    assert(rows.forall(_.getAs[Long]("m") >= 1))
    // certainty units: anything heavier than one grid step S/K MUST be
    // selected (smaller units enter with probability w·K/S < 1, so no
    // guarantee for them — not even for the global maximum)
    val sized = Tables(spark, sfDir, "orders")
      .select($"o_orderkey", round($"o_totalprice" * 100).cast("long").as("w"))
      .collect()
    val s = sized.map(_.getLong(1)).sum
    val certain = sized.filter(x => x.getLong(1) * 100L > s).map(_.getLong(0))
    val selected = rows.map(_.getAs[Long]("o_orderkey")).toSet
    assert(certain.forall(selected.contains))
  }

  test("q356 Cochran-Armitage: matches a brute-force recomputation") {
    val r = Modeling.cochranArmitage(spark, sfDir).collect().head
    val rows = Tables(spark, sfDir, "orders")
      .join(Tables(spark, sfDir, "customer")
        .select($"c_custkey", $"c_acctbal"), $"o_custkey" === $"c_custkey")
      .select(floor(($"c_acctbal" + 1000.0) / 2200.0).cast("long").as("dose"),
        when($"o_orderpriority" === "1-URGENT", 1L).otherwise(0L).as("r"))
      .collect()
    val n = rows.length.toDouble
    val rr = rows.map(_.getLong(1)).sum.toDouble
    val swr = rows.map(x => x.getLong(0) * x.getLong(1)).sum.toDouble
    val swn = rows.map(_.getLong(0)).sum.toDouble
    val sw2n = rows.map(x => x.getLong(0) * x.getLong(0)).sum.toDouble
    val pbar = rr / n
    val z = (n * swr - rr * swn) /
      (n * math.sqrt(pbar * (1 - pbar) * (sw2n - swn * swn / n)))
    assert(math.abs(r.getAs[Long]("z_milli") - math.round(1000 * z)) <= 1)
  }

  test("q357 log-rank: matches a brute-force recomputation") {
    val r = Modeling.logRank(spark, sfDir).collect().head
    val e = Tables(spark, sfDir, "events")
    val entry = e.groupBy($"user_id").agg(min($"ts").as("entry"))
    val fp = e.filter($"event_type" === "purchase")
      .groupBy($"user_id").agg(min($"ts").as("conv"))
    val durs = entry.join(fp, Seq("user_id"), "left")
      .select($"user_id", ($"user_id" % 2).as("g"),
        datediff(to_date($"conv"), to_date($"entry")).as("rawd"))
      .collect()
      .map { x =>
        val raw = if (x.isNullAt(2)) Int.MaxValue else x.getInt(2)
        val d = math.min(raw, 7)
        (x.getAs[Long]("g"), d, if (raw <= 7) 1 else 0)
      }
    val eventDays = durs.filter(_._3 == 1).map(_._2).distinct.sorted
    var sumOme = 0.0; var sumV = 0.0
    for (tau <- eventDays) {
      val atRisk = durs.filter(_._2 >= tau)
      val r0 = atRisk.count(_._1 == 0).toDouble
      val r1 = atRisk.count(_._1 == 1).toDouble
      val d1 = durs.count(x => x._1 == 1 && x._2 == tau && x._3 == 1)
      val dd = durs.count(x => x._2 == tau && x._3 == 1).toDouble
      sumOme += d1 - dd * r1 / (r0 + r1)
      if (r0 + r1 > 1)
        sumV += dd * r0 * r1 * (r0 + r1 - dd) /
          ((r0 + r1) * (r0 + r1) * (r0 + r1 - 1))
    }
    val z = sumOme / math.sqrt(sumV)
    assert(math.abs(r.getAs[Long]("z_milli") - math.round(1000 * z)) <= 2)
  }

  test("q358 segmented regression: break on the candidate grid with margins") {
    val r = Modeling.segmentedRegression(spark, sfDir).collect()
    assert(r.length == 1)
    val c = r.head.getAs[Long]("break_day")
    assert(c % 90 == 0 && c >= 180)
    assert(r.head.getAs[Long]("sse_mega") >= 0)
  }

  test("q359 weighted Jaccard: bounded, complete pair grid, min<=max") {
    val rows = Modeling.weightedJaccard(spark, sfDir).collect()
    val sources = rows.flatMap(x => Seq(x.getString(0), x.getString(1)))
      .distinct.length
    assert(rows.length == sources * (sources - 1) / 2)
    rows.foreach { x =>
      val wj = x.getAs[Long]("wj_micro")
      assert(wj >= 0 && wj <= 1000000)
      assert(x.getAs[Long]("smin") <= x.getAs[Long]("smax"))
    }
  }

  test("q360 Kendall W: matches a brute-force recomputation and sits in [0,1]") {
    val r = Modeling.kendallW(spark, sfDir).collect().head
    val w = r.getAs[Long]("w_micro")
    assert(w >= 0 && w <= 1000000)
    // brute force on collected cells
    val cells = Tables(spark, sfDir, "orders")
      .join(Tables(spark, sfDir, "customer")
        .select($"c_custkey", $"c_nationkey"), $"o_custkey" === $"c_custkey")
      .groupBy(year(to_date($"o_orderdate")).cast("long").as("yr"),
        $"c_nationkey".as("nat"))
      .agg(sum(round($"o_totalprice" * 100).cast("long")).as("cents"))
      .collect()
      .map(x => (x.getLong(0), x.getAs[Int]("nat").toLong,
        x.getLong(2)))
    val years = cells.map(_._1).distinct
    val m = years.length
    val complete = cells.groupBy(_._2).filter(_._2.length == m).keySet
    val rankSums = scala.collection.mutable.Map.empty[Long, Long]
    for (y <- years) {
      val slate = cells.filter(x => x._1 == y && complete(x._2))
        .sortBy(x => (-x._3, x._2))
      slate.zipWithIndex.foreach { case (x, i) =>
        rankSums(x._2) = rankSums.getOrElse(x._2, 0L) + i + 1
      }
    }
    val n = rankSums.size
    val sd2 = rankSums.values.map { ri =>
      val d = 2 * ri - m.toLong * (n + 1); d * d
    }.sum
    val wBrute = 3.0 * sd2 / (m.toDouble * m * n * (n.toDouble * n - 1))
    assert(w == math.round(1e6 * wBrute))
  }

  test("q361 two-way FE: balanced panel (cells divisible by year count)") {
    val r = Modeling.twoWayFixedEffects(spark, sfDir).collect().head
    val nCells = r.getAs[Long]("n_cells")
    val nYears = Tables(spark, sfDir, "orders")
      .select(year(to_date($"o_orderdate"))).distinct().count()
    assert(nCells > 0 && nCells % nYears == 0)
  }

  test("q362 geometric mean: AM-GM — geo never exceeds the arithmetic mean") {
    val geo = Modeling.geoMean(spark, sfDir).collect()
      .map(x => x.getString(0) -> x.getAs[Long]("geo_cents")).toMap
    val am = Tables(spark, sfDir, "orders")
      .groupBy($"o_orderpriority")
      .agg(avg(round($"o_totalprice" * 100).cast("long")).as("am"))
      .collect().map(x => x.getString(0) -> x.getAs[Double]("am")).toMap
    geo.foreach { case (k, g) => assert(g <= am(k) + 1) }
    assert(geo.nonEmpty)
  }

  test("q363 negative sampling: draws telescope to exactly K=500") {
    val rows = Modeling.negativeSampling(spark, sfDir).collect()
    assert(rows.map(_.getAs[Long]("m")).sum == 500L)
    assert(rows.forall(_.getAs[Long]("m") >= 1))
    // heavier terms never get fewer draws than lighter ones ± 1 grid cell
    val byW = rows.sortBy(-_.getAs[Long]("w"))
    assert(byW.head.getAs[Long]("m") >= byW.last.getAs[Long]("m") - 1)
  }

  test("q364 PSM: matched subset of treated; ATT consistent") {
    val r = Modeling.psmAtt(spark, sfDir).collect().head
    val nT = r.getAs[Long]("n_treated")
    val nM = r.getAs[Long]("n_matched")
    assert(nM > 0 && nM <= nT)
    val nUrgent = Tables(spark, sfDir, "orders")
      .filter($"o_orderpriority" === "1-URGENT").count()
    assert(nT == nUrgent)
  }

  test("q365 grid DBSCAN: every cluster holds >=5 points per dense cell") {
    val rows = Modeling.gridDbscan(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach { x =>
      assert(x.getAs[Long]("n_points") >= 5 * x.getAs[Long]("n_cells"))
    }
    val total = Tables(spark, sfDir, "customer").count()
    assert(rows.map(_.getAs[Long]("n_points")).sum <= total)
  }

  test("q366 AD uniformity: matches a brute-force recomputation") {
    val r = Modeling.adUniform(spark, sfDir).collect().head
    val fracs = Tables(spark, sfDir, "orders")
      .select((round($"o_totalprice" * 100).cast("long") % 1000L)
        .as("f"), $"o_orderkey")
      .collect().sortBy(x => (x.getLong(0), x.getLong(1)))
      .map(_.getLong(0))
    val n = fracs.length
    val st = fracs.zipWithIndex.map { case (f, i0) =>
      val i = i0 + 1
      val x = (f + 0.5) / 1000.0
      math.round(1e6 * ((2.0 * i - 1) * math.log(x) +
        (2.0 * (n - i) + 1) * math.log(1 - x)))
    }.sum
    val a2 = -n.toDouble - st.toDouble / 1e6 / n
    assert(r.getAs[Long]("a2_milli") == math.round(1000 * a2))
  }

  test("q367 silhouette: scores bounded in [-1,1]; rows cover the table") {
    val rows = Modeling.silhouette(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach { x =>
      val m = x.getAs[Long]("mean_sil_micro")
      assert(m >= -1000000 && m <= 1000000)
    }
    assert(rows.map(_.getAs[Long]("n")).sum ==
      Tables(spark, sfDir, "embeddings").count())
  }

  test("q368 RANSAC: anchors on the grid, consensus non-trivial") {
    val r = Modeling.ransacLine(spark, sfDir).collect().head
    assert(r.getAs[Long]("x1") % 240 == 0 && r.getAs[Long]("x2") % 240 == 0)
    assert(r.getAs[Long]("x1") < r.getAs[Long]("x2"))
    assert(r.getAs[Long]("n_inliers") >= 2)
  }

  test("q369 EB shrinkage: every posterior sits between raw rate and grand mean") {
    val rows = Modeling.ebBetaShrinkage(spark, sfDir).collect()
    assert(rows.nonEmpty)
    val m = rows.map(_.getAs[Long]("r_micro")).sum.toDouble / rows.length
    rows.foreach { x =>
      val raw = x.getAs[Long]("r_micro").toDouble
      val eb = x.getAs[Long]("eb_micro").toDouble
      val lo = math.min(raw, m) - 1
      val hi = math.max(raw, m) + 1
      assert(eb >= lo && eb <= hi,
        s"${x.getString(0)}: eb=$eb outside [$lo, $hi]")
    }
  }

  test("q370 Hosmer-Lemeshow: ten groups, df 8, non-negative statistic") {
    val r = Modeling.hosmerLemeshow(spark, sfDir).collect().head
    assert(r.getAs[Long]("n_groups") == 10)
    assert(r.getAs[Long]("df") == 8)
    assert(r.getAs[Long]("hl_milli") >= 0)
  }

  test("q371 ICC: bounded above by 1, covers every document") {
    val r = Modeling.icc1(spark, sfDir).collect().head
    assert(r.getAs[Long]("icc_micro") <= 1000000)
    assert(r.getAs[Long]("n_docs") ==
      Tables(spark, sfDir, "documents").count())
  }

  test("q372 price index: Fisher is the geometric mean of L and P") {
    val r = Modeling.priceIndex(spark, sfDir).collect().head
    assert(r.getAs[Long]("n_parts") > 0)
    val l = r.getAs[Long]("laspeyres_micro")
    val p = r.getAs[Long]("paasche_micro")
    val f = r.getAs[Long]("fisher_micro")
    assert(f >= math.min(l, p) - 1 && f <= math.max(l, p) + 1)
    assert(math.abs(f - math.round(math.sqrt(l.toDouble * p))) <= 2)
  }

  test("q373 Weibull gaps: positive shape and scale") {
    val r = Modeling.weibullGaps(spark, sfDir).collect().head
    assert(r.getAs[Long]("n") > 0)
    assert(r.getAs[Long]("k_milli") > 0)
    assert(r.getAs[Long]("lambda_us") > 0)
  }

  test("q374 DFA: four scales, exponent in a sane band") {
    val r = Modeling.dfa(spark, sfDir).collect().head
    assert(r.getAs[Long]("n_scales") == 4)
    val a = r.getAs[Long]("alpha_milli")
    assert(a > 0 && a < 2000, s"alpha_milli=$a")
  }

  test("q375 Atkinson: in [0,1) per region — AM-GM again, welfare form") {
    val rows = Modeling.atkinsonIndex(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach { x =>
      val a = x.getAs[Long]("atkinson_micro")
      assert(a >= 0 && a < 1000000)
    }
  }

  test("q376 RMST: bounded by the 7-day horizon, positive") {
    val r = Modeling.rmst(spark, sfDir).collect().head
    assert(r.getAs[Long]("horizon_days") == 7)
    val rm = r.getAs[Long]("rmst_milli_days")
    assert(rm > 0 && rm <= 7000)
  }

  test("q377 competing risks: CIF1 + CIF2 + S(7) accounts for everyone") {
    val r = Modeling.competingRisks(spark, sfDir).collect().head
    val c1 = r.getAs[Long]("cif_purchase_micro")
    val c2 = r.getAs[Long]("cif_error_micro")
    val s7 = r.getAs[Long]("s7_micro")
    assert(c1 >= 0 && c2 >= 0 && s7 >= 0)
    // identity up to the per-day independent micro rounding
    assert(math.abs(c1 + c2 + s7 - 1000000L) <= 20,
      s"mass not conserved: $c1 + $c2 + $s7")
  }

  test("q378 periodogram: four periods, variance shares in [0,1]") {
    val rows = Modeling.periodogram(spark, sfDir).collect()
    assert(rows.map(_.getAs[Long]("p")).toSeq == Seq(7L, 30L, 91L, 365L))
    rows.foreach { x =>
      val f = x.getAs[Long]("fvar_micro")
      assert(f >= 0 && f <= 1000000 + 10)
    }
  }

  test("q379 Granger: F non-negative (restricted SSE >= unrestricted)") {
    val r = Modeling.granger(spark, sfDir).collect().head
    assert(r.getAs[Long]("n") > 10)
    assert(r.getAs[Long]("f_milli") >= 0)
  }

  test("q380 Engle-Granger: DF slope in (-2,0] — residual mean-reverts, never explodes") {
    val r = Modeling.engleGranger(spark, sfDir).collect().head
    val g = r.getAs[Long]("gamma_milli")
    assert(g <= 0 && g > -2000, s"gamma_milli=$g")
    assert(r.getAs[Long]("df_stat_milli") <= 0)
  }

  test("q381 Borda/Condorcet: at most one Condorcet winner; Borda totals conserved") {
    val rows = Modeling.bordaCondorcet(spark, sfDir).collect()
    assert(rows.nonEmpty)
    assert(rows.map(_.getAs[Int]("is_condorcet")).sum <= 1)
    val n = rows.length.toLong
    val years = Tables(spark, sfDir, "orders")
      .select(year(to_date($"o_orderdate"))).distinct().count()
    // Σ borda = m · Σ_{r=1..n} (n − r) = m·n(n−1)/2
    assert(rows.map(_.getAs[Long]("borda")).sum ==
      years * n * (n - 1) / 2)
  }

  test("q382 cross-lang leakage: complete grid, symmetric-normalized keys") {
    val rows = Modeling.crossLangLeakage(spark, sfDir).collect()
    val k = rows.map(_.getString(0)).distinct.length
    assert(rows.length == k * (k + 1) / 2)
    rows.foreach { x =>
      assert(x.getString(0) <= x.getString(1))
      assert(x.getAs[Long]("n_dup_pairs") >= 0)
      assert(x.getAs[Int]("cross_lang") ==
        (if (x.getString(0) == x.getString(1)) 0 else 1))
    }
  }

  test("q383 participation ratio: between 1 and the ambient dimension") {
    val r = Modeling.participationRatio(spark, sfDir).collect().head
    val pr = r.getAs[Long]("pr_milli")
    assert(pr >= 1000 && pr <= 64000, s"pr_milli=$pr")
    assert(r.getAs[Long]("trace_q") > 0)
  }

  test("q384 xcorr: eight lags, correlations in [-1,1]") {
    val rows = Modeling.xcorr(spark, sfDir).collect()
    assert(rows.map(_.getAs[Long]("lag")).toSeq == (0L to 7L))
    rows.foreach { x =>
      val r = x.getAs[Long]("r_micro")
      assert(r >= -1000000 && r <= 1000000)
    }
  }

  test("q385 novelty: the first document is 100% novel; shares bounded") {
    val rows = Modeling.noveltyShare(spark, sfDir).collect()
    assert(rows.nonEmpty)
    val first = rows.minBy(_.getAs[Long]("doc_id"))
    assert(first.getAs[Long]("novelty_micro") == 1000000)
    rows.foreach { x =>
      val nm = x.getAs[Long]("novelty_micro")
      assert(nm >= 0 && nm <= 1000000)
      assert(x.getAs[Long]("n_new") <= x.getAs[Long]("n_shingles"))
    }
  }

  test("q386 KDE: full grid, one mode, non-negative densities") {
    val rows = Modeling.gaussianKde(spark, sfDir).collect()
    assert(rows.map(_.getAs[Long]("gi")).toSeq == (0L to 20L))
    assert(rows.map(_.getAs[Int]("is_mode")).sum == 1)
    assert(rows.forall(_.getAs[Long]("dens_nano") >= 0))
  }

  test("q387 tail dependence: coefficients bounded near [0,1]") {
    val r = Modeling.tailDependence(spark, sfDir).collect().head
    val lo = r.getAs[Long]("lambda_lower_micro")
    val hi = r.getAs[Long]("lambda_upper_micro")
    assert(lo >= 0 && lo <= 1200000)
    assert(hi >= 0 && hi <= 1200000)
  }

  test("q388 QTE: nine deciles, both arm quantile profiles monotone") {
    val rows = Modeling.quantileTreatmentEffect(spark, sfDir).collect()
    assert(rows.map(_.getAs[Long]("q")).toSeq == (1L to 9L))
    val y1 = rows.map(_.getAs[Long]("y1"))
    val y0 = rows.map(_.getAs[Long]("y0"))
    assert(y1.zip(y1.tail).forall { case (a, b) => a <= b })
    assert(y0.zip(y0.tail).forall { case (a, b) => a <= b })
  }

  test("q389 E-value: at least the (reciprocal-normalized) risk ratio, rr >= 1") {
    val r = Modeling.eValue(spark, sfDir).collect().head
    val rr = r.getAs[Long]("rr_milli")
    val e = r.getAs[Long]("e_value_milli")
    assert(rr >= 1000)
    assert(e >= rr)
  }

  test("q390 Cook's distance: 20 rows, sorted desc, leverage in (0,1)") {
    val rows = Modeling.cooksDistance(spark, sfDir).collect()
    assert(rows.length == 20)
    val ds = rows.map(_.getAs[Long]("cook_micro"))
    assert(ds.zip(ds.tail).forall { case (a, b) => a >= b })
    rows.foreach { x =>
      val h = x.getAs[Long]("leverage_micro")
      assert(h > 0 && h < 1000000)
    }
  }

  test("q391 VIF: every factor at least 1 (definitionally)") {
    val r = Modeling.vif(spark, sfDir).collect().head
    assert(r.getAs[Long]("vif_balance_milli") >= 1000 - 1)
    assert(r.getAs[Long]("vif_age_milli") >= 1000 - 1)
    assert(r.getAs[Long]("vif_lines_milli") >= 1000 - 1)
  }

  test("q392 Breusch-Pagan: LM non-negative, df 2") {
    val r = Modeling.breuschPagan(spark, sfDir).collect().head
    assert(r.getAs[Long]("df") == 2)
    assert(r.getAs[Long]("lm_milli") >= 0)
  }

  test("q393 Durbin-Watson: statistic in (0, 4)") {
    val r = Modeling.durbinWatson(spark, sfDir).collect().head
    val dw = r.getAs[Long]("dw_milli")
    assert(dw > 0 && dw < 4000, s"dw_milli=$dw")
  }

  test("q394 HC1: all four standard errors strictly positive") {
    val r = Modeling.hc1RobustSe(spark, sfDir).collect().head
    assert(r.getAs[Long]("se_b1_classical_milli") > 0)
    assert(r.getAs[Long]("se_b1_robust_milli") > 0)
    assert(r.getAs[Long]("se_b2_classical_milli") > 0)
    assert(r.getAs[Long]("se_b2_robust_milli") > 0)
  }

  test("q395 Oaxaca-Blinder: decomposition parts sum back to the gap") {
    val r = Modeling.oaxacaBlinder(spark, sfDir).collect().head
    val gap = r.getAs[Long]("gap_milli_cents")
    val e = r.getAs[Long]("endowments_milli_cents")
    val c = r.getAs[Long]("coefficients_milli_cents")
    assert(math.abs(gap - (e + c)) <= 1, s"$gap != $e + $c")
  }

  test("q396 SLO burn: rate identity and paging logic per window") {
    val rows = Modeling.sloBurnRate(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach { x =>
      val b6 = x.getAs[Long]("burn_6h_milli")
      val b24 = x.getAs[Long]("burn_24h_milli")
      assert(b6 == 100000L * x.getAs[Long]("e_6h") / x.getAs[Long]("n_6h"))
      assert(x.getAs[Int]("page") ==
        (if (b6 > 10000 && b24 > 2000) 1 else 0))
    }
  }

  test("q397 weighted kappa: micro value bounded above by 1e6") {
    val r = Modeling.weightedKappa(spark, sfDir).collect().head
    assert(r.getAs[Long]("kappa_w_micro") <= 1000000)
    assert(r.getAs[Long]("nn") ==
      Tables(spark, sfDir, "documents").count())
  }

  test("q398 rec coverage: coverage and Gini both within [0,1]") {
    val r = Modeling.recCoverage(spark, sfDir).collect().head
    val cov = r.getAs[Long]("coverage_micro")
    val g = r.getAs[Long]("gini_micro")
    assert(cov >= 0 && cov <= 1000000)
    assert(g >= 0 && g <= 1000000)
    assert(r.getAs[Long]("n_neighbors") <= r.getAs[Long]("n_catalog"))
  }

  test("q399 calibration: LPM scores are exactly mean-matched (bias 0)") {
    // OLS fitted values share the outcome mean BY CONSTRUCTION — the
    // only deviation is the per-row micro rounding of the score
    val r = Modeling.calibrationMoments(spark, sfDir).collect().head
    assert(math.abs(r.getAs[Long]("bias_micro")) <= 1)
    val slope = r.getAs[Long]("slope_milli")
    assert(slope > 0, s"slope_milli=$slope")
  }

  test("q400 PSI by segment: exactly one worst, all PSI non-negative") {
    val rows = Modeling.psiBySegment(spark, sfDir).collect()
    assert(rows.nonEmpty)
    assert(rows.map(_.getAs[Int]("is_worst")).sum == 1)
    rows.foreach(x => assert(x.getAs[Long]("psi_micro") >= 0))
  }

  test("q401 Bland-Altman: mean inside the limits; ~5% outside under normality") {
    val r = Modeling.blandAltman(spark, sfDir).collect().head
    val md = r.getAs[Long]("mean_diff_cents")
    assert(md > r.getAs[Long]("loa_lo_cents") &&
      md < r.getAs[Long]("loa_hi_cents"))
    // 1.96-sigma band: the outside share must stay well below 20%
    assert(r.getAs[Long]("outside_micro") < 200000)
  }

  test("q402 CCC: |CCC| <= |Pearson| (Lin's inequality)") {
    val r = Modeling.linsCcc(spark, sfDir).collect().head
    val ccc = r.getAs[Long]("ccc_micro")
    val p = r.getAs[Long]("pearson_micro")
    assert(math.abs(ccc) <= math.abs(p) + 1)
    assert(math.abs(p) <= 1000000)
  }

  test("q403 Deming: disattenuation whenever the association is material") {
    val r = Modeling.demingRegression(spark, sfDir).collect().head
    val d = r.getAs[Long]("deming_slope_milli")
    val o = r.getAs[Long]("ols_slope_milli")
    // sf0.001's price pair is nearly uncorrelated (ols rounds to 0
    // milli) — the EIV |deming| >= |ols| guarantee only binds when
    // the OLS slope is materially nonzero
    if (math.abs(o) >= 10) {
      assert(math.abs(d) >= math.abs(o) - 1,
        s"deming $d should disattenuate ols $o")
    }
    assert(!r.isNullAt(r.fieldIndex("deming_slope_milli")))
  }

  test("q404 Youden: J in [0,1] and threshold on the score grid") {
    val r = Modeling.youdenThreshold(spark, sfDir).collect().head
    val j = r.getAs[Long]("youden_j_micro")
    assert(j >= 0 && j <= 1000000)
  }

  test("q405 Mann-Kendall: |S| bounded by the pair count") {
    val r = Modeling.mannKendall(spark, sfDir).collect().head
    val n = r.getAs[Long]("n")
    assert(math.abs(r.getAs[Long]("s_stat")) <= n * (n - 1) / 2)
  }

  test("q406 sign test: counts partition the non-tied differences") {
    val r = Modeling.signTest(spark, sfDir).collect().head
    val total = Tables(spark, sfDir, "lineitem").count()
    assert(r.getAs[Long]("pos") + r.getAs[Long]("neg") <= total)
    assert(r.getAs[Long]("pos") > 0 && r.getAs[Long]("neg") > 0)
  }

  test("q407 Hodges-Lehmann: sits inside the daily revenue range") {
    val r = Modeling.hodgesLehmann(spark, sfDir).collect().head
    val daily = Tables(spark, sfDir, "orders")
      .groupBy(to_date($"o_orderdate"))
      .agg(sum(round($"o_totalprice" * 100).cast("long")).as("y"))
      .agg(min($"y"), max($"y")).collect().head
    val hl = r.getAs[Long]("hl_cents")
    assert(hl >= daily.getLong(0) && hl <= daily.getLong(1))
    val nd = Tables(spark, sfDir, "orders")
      .select(to_date($"o_orderdate")).distinct().count()
    assert(r.getAs[Long]("n_walsh") == nd * (nd + 1) / 2)
  }

  test("q351 Gumbel: return level exceeds mu; mu below the block-max mean") {
    val r = Modeling.gumbelBlockMaxima(spark, sfDir).collect().head
    val mu = r.getAs[Long]("mu_cents")
    val beta = r.getAs[Long]("beta_cents")
    val rl = r.getAs[Long]("return_level_100_cents")
    assert(beta > 0)
    assert(mu < r.getAs[Long]("mean_cents"))
    // -ln(-ln(0.99)) ≈ 4.6 > 0 so the 100-block return level sits
    // well above the location parameter
    assert(rl > mu)
  }
}
