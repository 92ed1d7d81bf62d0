package graft

import org.apache.spark.sql.functions._
import graft.queries.Insights

/** Semantic invariants for the round-4 Insights batch (q242-q252).
  * Value-level correctness is the driver's DuckDB gate; these assert
  * the mathematical properties that must hold regardless of data.
  */
class InsightsSpec extends SparkSpec {
  import spark.implicits._

  test("q242 DSIR: scores only non-target docs, every doc has bigrams") {
    val r = Insights.dsirWeights(spark, sfDir).collect()
    assert(r.nonEmpty)
    assert(r.forall(_.getLong(1) >= 1), "doc without bigrams scored")
    val en = Tables(spark, sfDir, "documents")
      .filter($"lang" === "en").select($"doc_id")
      .as[Long].collect().toSet
    assert(r.forall(row => !en.contains(row.getLong(0))),
      "target-language doc leaked into the candidate scores")
  }

  test("q243 chunk dedup: chunk count and retained fraction invariants") {
    val r = Insights.chunkDedup(spark, sfDir)
    val bad = r.filter($"retained_micro" > 1000000L ||
      $"retained_micro" < 0L || $"n_dup_chunks" > $"n_chunks" ||
      $"toks_removed" > $"n_chunks" * 8).count()
    assert(bad == 0)
    // every doc's chunk count is ceil(n_toks / 8)
    val docs = Tables(spark, sfDir, "documents")
      .select($"doc_id",
        expr("(size(filter(split(lower(text), '[^a-z]+'), " +
          "w -> w != '')) + 7) div 8").as("expect"))
    val mismatch = r.join(docs, Seq("doc_id"))
      .filter($"n_chunks" =!= $"expect").count()
    assert(mismatch == 0)
  }

  test("q244 McNemar: discordant cells bounded by the order count") {
    val row = Insights.mcnemar(spark, sfDir).collect()(0)
    val n = Tables(spark, sfDir, "orders").count()
    assert(row.getLong(0) + row.getLong(1) <= n)
    assert(row.getLong(2) >= 0)
  }

  test("q245 matryoshka: recall in [0,1], full self-eval would be 1") {
    val r = Insights.matryoshkaEval(spark, sfDir).collect()
    assert(r.nonEmpty)
    assert(r.forall(x => x.getLong(2) >= 0 && x.getLong(2) <= 1000000))
    assert(r.forall(x => x.getLong(1) * 100000 == x.getLong(2) * 1))
  }

  test("q246 Kendall: pair partition sums to n(n-1)/2, tau in [-1,1]") {
    val row = Insights.kendallTau(spark, sfDir).collect()(0)
    val n = row.getLong(0)
    val pairs = row.getLong(1) + row.getLong(2)
    // conc + disc <= total pairs (the rest are ties)
    assert(pairs <= n * (n - 1) / 2)
    assert(math.abs(row.getLong(5)) <= 1000000)
  }

  test("q247 logreg: gradient descent moves the weights and keeps n") {
    val row = Insights.logregGd(spark, sfDir).collect()(0)
    assert(row.getLong(0) ==
      Tables(spark, sfDir, "lineitem").count())
    // with ~1/3 positives the intercept must have moved negative
    // (the model lowers the base rate below sigma(0) = 0.5)
    assert(row.getLong(1) < 0)
    assert(math.abs(row.getLong(2)) < 10000000 &&
      math.abs(row.getLong(3)) < 10000000, "weights diverged")
  }

  test("q248 Wilson: interval brackets the point estimate") {
    val r = Insights.wilsonCi(spark, sfDir)
    val bad = r.filter($"lo_micro" > $"p_micro" ||
      $"hi_micro" < $"p_micro" || $"hi_micro" > 1000000L ||
      $"lo_micro" < 0L).count()
    assert(bad == 0)
  }

  test("q249 permutation test: p-value well-formed") {
    val row = Insights.permutationTest(spark, sfDir).collect()(0)
    val nExtreme = row.getLong(1)
    assert(nExtreme >= 0 && nExtreme <= 256)
    val p = row.getLong(2)
    assert(p >= 1000000 / 257 && p <= 1000000)
  }

  test("q250 centroid drift: nonnegative, bounded by 2, halves count") {
    val r = Insights.centroidDrift(spark, sfDir).collect()
    assert(r.nonEmpty)
    assert(r.forall(x => x.getLong(3) >= 0 && x.getLong(3) <= 2000000))
    val total = r.map(x => x.getLong(1) + x.getLong(2)).sum
    assert(total == Tables(spark, sfDir, "embeddings").count())
  }

  test("q251 Hill: positive tail index, top-k min consistent") {
    val row = Insights.hillTail(spark, sfDir).collect()(0)
    assert(row.getLong(0) == 100)
    assert(row.getLong(2) >= 0, "mean ln ratio must be nonnegative")
    assert(row.getLong(3) > 0)
  }

  test("q253/q254 ANOVA + Levene: positive sums of squares, F >= 0") {
    for (q <- Seq(Insights.anovaFTest, Insights.leveneTest)) {
      val row = q(spark, sfDir).collect()(0)
      assert(row.getLong(0) >= 2, "needs at least two groups")
      assert(row.getLong(2) >= 0 && row.getLong(3) > 0)
      assert(row.getLong(4) >= 0)
    }
  }

  test("q255 Jarque-Bera: moment invariants") {
    val row = Insights.jarqueBera(spark, sfDir).collect()(0)
    assert(row.getLong(0) ==
      Tables(spark, sfDir, "lineitem").count())
    assert(row.getLong(4) >= 0, "JB statistic is a sum of squares")
    // excess kurtosis is bounded below by -2 (micro units)
    assert(row.getLong(3) >= -2000000)
  }

  test("q256 CUPED: adjusted diff exists and variance cannot inflate " +
    "by more than rounding") {
    val row = Insights.cuped(spark, sfDir).collect()(0)
    assert(row.getLong(0) > 0)
    // theta-adjustment is the least-squares projection: variance
    // reduction is >= 0 up to integer-micro rounding slack
    assert(row.getLong(4) >= -1000)
    assert(row.getLong(4) <= 1000000)
  }

  test("q257 Markov argmax predictor beats or ties the marginal " +
    "baseline per state") {
    val r = Insights.markovPredict(spark, sfDir).collect()
    assert(r.nonEmpty)
    // argmax-of-row accuracy is at least 1/num_states
    val k = r.length.toLong
    assert(r.forall(_.getLong(3) * k >= 1000000 / 2),
      s"suspicious accuracy for ${k} states: ${r.mkString(";")}")
    assert(r.forall(x => x.getLong(2) <= x.getLong(1)))
  }

  test("q258 conformal: coverage near the nominal 90% per priority") {
    val r = Insights.conformalCoverage(spark, sfDir).collect()
    assert(r.nonEmpty)
    // distribution-free guarantee is approximate at finite n; allow
    // a generous band on the tiny test SF
    assert(r.forall(x => x.getLong(5) >= 700000 && x.getLong(5) <= 1000000),
      r.mkString(";"))
  }

  test("q259 local clustering: coefficients in [0,1], triangle " +
    "mass consistent with q105's global count") {
    val r = Insights.localClustering(spark, sfDir)
    assert(r.filter($"lcc_micro" < 0 || $"lcc_micro" > 1000000L)
      .count() == 0)
    // sum of per-node triangle credits = 3 x global triangle count
    val perNode = r.agg(sum($"n_tri")).collect()(0).getLong(0)
    val global = queries.Scale.triangles(spark, sfDir)
      .collect()(0).getAs[Long]("n_triangles")
    assert(perNode == 3 * global,
      s"per-node credit $perNode != 3 * $global")
  }

  test("q260 assortativity: r in [-1,1], edge count matches the graph") {
    val row = Insights.degreeAssortativity(spark, sfDir).collect()(0)
    assert(math.abs(row.getLong(1)) <= 1000000)
    assert(row.getLong(0) > 0)
  }

  test("q261 Friedman: rank sums force Q >= 0 and full blocks") {
    val row = Insights.friedman(spark, sfDir).collect()(0)
    assert(row.getLong(0) > 0 && row.getLong(1) >= 2)
    // Q is nonnegative up to the tie correction (which this data
    // cannot trigger at micro resolution)
    assert(row.getLong(2) >= -1000)
  }

  test("q262 FDR screen: BH rejection set is a prefix of the p-order") {
    val r = Insights.fdrScreen(spark, sfDir)
      .orderBy($"bh_rank").collect()
    assert(r.length > 0)
    val rejected = r.map(_.getBoolean(4))
    // once acceptance starts it never flips back to rejection
    val firstAccept = rejected.indexWhere(!_)
    if (firstAccept >= 0)
      assert(rejected.drop(firstAccept).forall(!_),
        "BH rejections must form a prefix")
    // p-values are valid probabilities with the +1 correction
    assert(r.forall(x => x.getLong(2) >= 1000000 / 5121 &&
      x.getLong(2) <= 1000000))
  }

  test("q263 quality logreg: separates en from non-en at least " +
    "directionally") {
    val row = Insights.qualityLogreg(spark, sfDir).collect()(0)
    assert(row.getLong(0) > 0)
    // majority of docs are non-en, so the intercept moves negative
    assert(row.getLong(1) < 0)
  }

  test("q264 LSH tuning: candidate count is monotone in bands") {
    val r = Insights.lshTuning(spark, sfDir)
      .orderBy($"rows_per_band").collect()
    assert(r.length == 3)
    // more bands with shorter rows => strictly more (or equal)
    // candidates: r=2 (32 bands) >= r=4 (16) >= r=8 (8)
    assert(r(0).getLong(3) >= r(1).getLong(3))
    assert(r(1).getLong(3) >= r(2).getLong(3))
    // analytic p at J=0.5 is monotone the same way
    assert(r(0).getLong(2) >= r(1).getLong(2))
    assert(r(1).getLong(2) >= r(2).getLong(2))
  }

  test("q265 token budget: greedy fill is a prefix and spends the " +
    "budget exactly") {
    val r = Insights.tokenBudget(spark, sfDir)
      .orderBy($"fill_rank").collect()
    val totalTokens = r.map(_.getLong(2)).sum
    val alloc = r.map(_.getLong(4))
    assert(alloc.sum == totalTokens / 2, "budget not exactly spent")
    // allocations form a prefix: full, one partial, then zeros
    val partialIdx = alloc.indices.filter(i =>
      alloc(i) > 0 && alloc(i) < r(i).getLong(2))
    assert(partialIdx.size <= 1)
    val firstZero = alloc.indexWhere(_ == 0)
    if (firstZero >= 0) assert(alloc.drop(firstZero).forall(_ == 0))
  }

  test("q266 embedding norms: bounds ordered, census complete") {
    val r = Insights.embeddingNorms(spark, sfDir)
    assert(r.filter($"min_norm_micro" > $"mean_norm_micro" ||
      $"mean_norm_micro" > $"max_norm_micro" ||
      $"std_norm_micro" < 0).count() == 0)
    val n = r.agg(sum($"n")).collect()(0).getLong(0)
    assert(n == Tables(spark, sfDir, "embeddings").count())
  }

  test("q267 interval merge: coverage bounded by n_events x window") {
    val r = Insights.intervalMerge(spark, sfDir)
    // every merged interval covers at least one 5-min window and at
    // most n_events of them; intervals never exceed event count
    val bad = r.filter($"covered_us" < 300000000L ||
      $"covered_us" > $"n_events" * 300000000L ||
      $"n_intervals" > $"n_events" ||
      $"longest_us" > $"covered_us").count()
    assert(bad == 0)
    val users = Tables(spark, sfDir, "events")
      .select($"user_id").distinct().count()
    assert(r.count() == users)
  }

  test("q268 fairness audit: confusion rates are probabilities and " +
    "the gap brackets every group") {
    val r = Insights.fairnessAudit(spark, sfDir).collect()
    assert(r.nonEmpty)
    val tprs = r.map(_.getLong(2))
    val gap = r.head.getLong(5)
    assert(gap == tprs.max - tprs.min)
    assert(r.forall(x => (2 to 4).forall(i =>
      x.getLong(i) >= 0 && x.getLong(i) <= 1000000)))
  }

  test("q269 IPS: the exploit policy's IPS value dominates or ties " +
    "the logged mean in expectation shape") {
    val r = Insights.offpolicyIps(spark, sfDir).collect()
    assert(r.nonEmpty)
    // per-context census: n sums to the full event count
    val n = r.map(_.getLong(2)).sum
    assert(n == Tables(spark, sfDir, "events").count())
  }

  test("q270 SRM: arms partition the users") {
    val row = Insights.srmCheck(spark, sfDir).collect()(0)
    val users = Tables(spark, sfDir, "events")
      .select($"user_id").distinct().count()
    assert(row.getLong(0) + row.getLong(1) == users)
    assert(row.getLong(2) >= 0 && row.getLong(2) <= 1000000)
  }

  test("q271 DID: identity against the four cell means") {
    val row = Insights.diffInDiff(spark, sfDir).collect()(0)
    val did = (row.getLong(3) - row.getLong(2)) -
      (row.getLong(1) - row.getLong(0))
    assert(row.getLong(4) == did)
  }

  test("q272 Simpson: correlations are valid, pooled repeated " +
    "identically") {
    val r = Insights.simpsonCheck(spark, sfDir).collect()
    assert(r.nonEmpty)
    assert(r.forall(x => math.abs(x.getLong(2)) <= 1000000))
    assert(r.map(_.getLong(3)).distinct.length == 1)
  }

  test("q273 BM25 sweep: the default config overlaps itself fully") {
    val r = Insights.bm25Sweep(spark, sfDir).collect()
    assert(r.length == 3)
    val default = r.find(_.getLong(0) == 1200).get
    val full = r.map(_.getLong(2)).max
    assert(default.getLong(2) == full,
      "default-vs-default overlap must dominate")
    assert(r.forall(_.getLong(2) <= 10))
  }

  test("q274 profile drift: halves partition the orders, drift " +
    "relative to the even half") {
    val r = Insights.profileDrift(spark, sfDir).collect()
    assert(r.length == 5)
    val nr = r.find(_.getString(0) == "n_rows").get
    assert(nr.getLong(1) + nr.getLong(2) ==
      Tables(spark, sfDir, "orders").count())
    assert(r.forall(_.getLong(3) >= 0))
  }

  test("q275 Platt: slope positive (balance predicts the label " +
    "direction the q224 frame encodes)") {
    val row = Insights.plattScaling(spark, sfDir).collect()(0)
    assert(row.getLong(0) ==
      Tables(spark, sfDir, "customer").count())
    // w2 was pinned to a zero feature: it must not move
    assert(row.getLong(3) == 0L)
  }

  test("q276 vocab coverage: monotone in k, bounded by 1") {
    val r = Insights.vocabCoverage(spark, sfDir)
      .orderBy($"k").collect()
    assert(r.length == 3)
    assert(r(0).getLong(4) <= r(1).getLong(4))
    assert(r(1).getLong(4) <= r(2).getLong(4))
    assert(r(2).getLong(4) <= 1000000)
  }

  test("q277 burstiness: Fano nonnegative, df filter honored") {
    val r = Insights.termBurstiness(spark, sfDir).collect()
    assert(r.nonEmpty && r.length <= 20)
    assert(r.forall(x => x.getLong(3) >= 0 && x.getLong(1) >= 20))
    // returned in descending burstiness
    val f = r.map(_.getLong(3))
    assert(f.zip(f.tail).forall { case (a, b) => a >= b })
  }

  test("q278 Q17 shape: the 20% fence keeps a strict subset") {
    val row = Insights.smallOrderRevenue(spark, sfDir).collect()(0)
    assert(row.getLong(0) >= 0 && row.getLong(1) >= 0)
  }

  test("q279 Q18 shape: every row really clears the 300-qty fence") {
    val r = Insights.largeVolumeCustomers(spark, sfDir)
    assert(r.filter($"total_qty" <= 300).count() == 0)
    val viaSql = Tables(spark, sfDir, "lineitem")
      .groupBy($"l_orderkey")
      .agg(sum($"l_quantity".cast("long")).as("q"))
      .filter($"q" > 300).count()
    assert(r.count() == viaSql)
  }

  test("q280 Q22 shape: anti-join excludes every urgent-order " +
    "customer") {
    val urgent = Tables(spark, sfDir, "orders")
      .filter($"o_orderpriority" === "1-URGENT")
      .select($"o_custkey").distinct().count()
    val picked = Insights.globalSalesOpportunity(spark, sfDir)
      .agg(sum($"numcust")).collect()(0).getLong(0)
    val total = Tables(spark, sfDir, "customer").count()
    assert(picked > 0 && picked <= total - urgent)
  }

  test("q281 transition entropy: bounded by ln(successors)") {
    val r = Insights.transitionEntropy(spark, sfDir).collect()
    assert(r.nonEmpty)
    r.foreach { x =>
      val maxH = math.round(1000000.0 * math.log(x.getLong(2).toDouble))
      assert(x.getLong(3) >= 0 && x.getLong(3) <= maxH + x.getLong(2),
        s"entropy ${x.getLong(3)} exceeds ln(k) bound $maxH")
    }
  }

  test("q282 hapax: counts nest (hapax <= vocab <= tokens)") {
    val r = Insights.hapaxRatio(spark, sfDir)
    assert(r.filter($"n_hapax" > $"vocab_size" ||
      $"vocab_size" > $"n_tokens").count() == 0)
    assert(r.count() ==
      Tables(spark, sfDir, "documents")
        .select($"source").distinct().count())
  }

  test("q283 PR curve: recall monotone nonincreasing in threshold") {
    val r = Insights.prCurve(spark, sfDir).orderBy($"threshold_micro")
      .collect()
    assert(r.length == 10)
    val rec = r.map(_.getLong(4))
    assert(rec.zip(rec.tail).forall { case (a, b) => a >= b })
    // threshold 0 catches every positive
    assert(rec.head == 1000000L ||
      r.head.getLong(2) == r.map(_.getLong(2)).max)
  }

  test("q284 MASE: error censuses line up with the day count") {
    val row = Insights.forecastMase(spark, sfDir).collect()(0)
    val n = row.getLong(0)
    assert(n > 7)
    assert(row.getLong(1) > 0 && row.getLong(2) > 0)
    assert(row.getLong(3) > 0)
  }

  test("q285 XYZ: classes partition the eligible parts") {
    val r = Insights.xyzClasses(spark, sfDir).collect()
    assert(r.nonEmpty && r.length <= 3)
    val share = r.map(_.getLong(2)).sum
    // integral-division shares sum to <= 1.0 with < #classes slack
    assert(share <= 1000000 && share > 1000000 - 3)
  }

  test("q286 SAX: motifs are length-3 ternary strings, occurrence " +
    "mass = weeks - 2") {
    val r = Insights.saxMotifs(spark, sfDir).collect()
    assert(r.nonEmpty)
    assert(r.forall(_.getString(0).matches("[012]{3}")))
    val weeks = r.head.getLong(2)
    // top-10 can't exceed the full trigram mass
    assert(r.map(_.getLong(1)).sum <= weeks - 2)
  }

  test("q287 audience overlap: intersection bounded by set sizes") {
    val r = Insights.audienceOverlap(spark, sfDir)
    assert(r.filter($"n_inter" > $"n_a" || $"n_inter" > $"n_b" ||
      $"jaccard_micro" > 1000000L).count() == 0)
    assert(r.count() == 10) // C(5,2) event-type pairs
  }

  test("q288 record days: first year has at least one record, " +
    "records never exceed days") {
    val r = Insights.recordDays(spark, sfDir).orderBy($"yr").collect()
    assert(r.nonEmpty)
    assert(r.head.getLong(2) >= 1, "day one always sets a record")
    assert(r.forall(x => x.getLong(2) <= x.getLong(1)))
  }

  test("q289 BPE sweep: fertility monotone nonincreasing in merges") {
    val r = Insights.bpeMergeSweep(spark, sfDir)
      .orderBy($"merge_rounds").collect()
    assert(r.length == 3)
    val f = r.map(_.getLong(3))
    assert(f(0) >= f(1) && f(1) >= f(2),
      s"more merges can only compress: ${f.mkString(",")}")
    // same corpus every config
    assert(r.map(_.getLong(1)).distinct.length == 1)
  }

  test("q290 context census: loss monotone decreasing in the limit") {
    val r = Insights.contextCensus(spark, sfDir)
      .orderBy($"window_limit").collect()
    assert(r.length == 3)
    val lost = r.map(_.getLong(3))
    assert(lost(0) >= lost(1) && lost(1) >= lost(2))
    assert(r.map(_.getLong(1)).distinct.length == 1)
  }

  test("q291 bigram acceptance: rates are probabilities over the " +
    "full bigram census") {
    val r = Insights.bigramAcceptance(spark, sfDir).collect()
    assert(r.nonEmpty)
    assert(r.forall(x => x.getLong(2) <= x.getLong(1)))
    assert(r.forall(x => x.getLong(3) <= 1000000))
  }

  test("q292 kNN outliers: score complements the mean similarity") {
    val r = Insights.knnOutliers(spark, sfDir).collect()
    assert(r.nonEmpty)
    assert(r.forall(x =>
      x.getLong(2) + x.getLong(3) == 1000000L))
  }

  test("q293 NB moments: users partition per type, milli stats " +
    "positive") {
    val r = Insights.negbinMoments(spark, sfDir).collect()
    assert(r.nonEmpty)
    assert(r.forall(x => x.getLong(2) >= 1000))
    // when a fit exists, p in (0, 1]
    r.filter(!_.isNullAt(5)).foreach { x =>
      assert(x.getLong(5) > 0 && x.getLong(5) <= 1000000)
    }
  }

  test("q294 front coding: savings bounded by total bytes") {
    val row = Insights.frontCoding(spark, sfDir).collect()(0)
    assert(row.getLong(2) >= 0 && row.getLong(2) < row.getLong(1))
    assert(row.getLong(3) < 1000000)
  }

  test("q295 seasonal strength: a valid share in [0, 1]") {
    val row = Insights.seasonalStrength(spark, sfDir).collect()(0)
    assert(row.getLong(1) >= 0 && row.getLong(1) <= 1000000)
  }

  test("q296 dedup pipeline: censuses nest and kept <= total") {
    val r = Insights.dedupPipeline(spark, sfDir)
    assert(r.filter($"n_exact_dup" + $"n_near_dup" > $"n_docs" ||
      $"tokens_kept" > $"tokens_total").count() == 0)
    val total = r.agg(sum($"n_docs")).collect()(0).getLong(0)
    assert(total == Tables(spark, sfDir, "documents").count())
  }

  test("q297 toplist stability: overlap monotone in k and bounded") {
    val r = Insights.toplistStability(spark, sfDir)
      .orderBy($"k").collect()
    assert(r.length == 3)
    assert(r.forall(x => x.getLong(1) <= x.getLong(0)))
    assert(r(0).getLong(1) <= r(1).getLong(1) &&
      r(1).getLong(1) <= r(2).getLong(1))
  }

  test("q298 runs test: run count bounded by sign count") {
    val row = Insights.runsTest(spark, sfDir).collect()(0)
    val n = row.getLong(0) + row.getLong(1)
    assert(row.getLong(2) >= 1 && row.getLong(2) <= n)
  }

  test("q299 retention half-life: decaying curve yields a positive " +
    "half-life") {
    val row = Insights.retentionHalflife(spark, sfDir).collect()(0)
    assert(row.getLong(0) >= 3, "needs at least 3 age points")
    if (!row.isNullAt(2)) assert(row.getLong(2) > 0)
  }

  test("q300 scorecard: five checks, shares are valid probabilities") {
    val r = Insights.corpusScorecard(spark, sfDir).collect()
    assert(r.length == 5)
    assert(r.map(_.getString(0)).distinct.length == 5)
    assert(r.forall(x =>
      x.getLong(1) >= 0 && x.getLong(1) <= 1000000))
  }

  test("q252 kNN accuracy: eval census matches the sample filter") {
    val r = Insights.knnLabelAcc(spark, sfDir).collect()
    val nEval = r.map(_.getLong(1)).sum
    val expect = Tables(spark, sfDir, "embeddings")
      .filter($"vec_id" % 10 === 0).count()
    assert(nEval == expect)
    assert(r.forall(x => x.getLong(2) <= x.getLong(1)))
  }
}
