package graft

import org.scalatest.funsuite.AnyFunSuite

/** Semantic invariants of the round-12 statistics/dedup/embedding
  * additions (q299–q308) that the oracle hash can't express —
  * range bounds, monotonicity, and cross-statistic consistency.
  */
class Round12EvalSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def run(name: String) =
    SparkEntry.queries(name)(spark, TestSpark.sf0001)

  test("q299: Spearman rho lies in [-1, 1] on a non-degenerate grid") {
    val r = run("q299_spearman").head()
    assert(r.getLong(0) > 2L)
    val rho = r.getDouble(1)
    assert(rho >= -1.0 - 1e-12 && rho <= 1.0 + 1e-12, s"rho=$rho")
  }

  test("q300: tau-b in [-1, 1] and C+D bounded by untied pair count") {
    val r = run("q300_kendall_tau").head()
    val (n, c, d) = (r.getLong(0), r.getLong(1), r.getLong(2))
    val tau = r.getDouble(3)
    assert(c >= 0 && d >= 0 && c + d <= n * (n - 1) / 2,
      s"C=$c D=$d n=$n")
    assert(tau >= -1.0 - 1e-12 && tau <= 1.0 + 1e-12, s"tau=$tau")
  }

  test("q301: W+ lies in [0, n(n+1)/2] — the signed-rank sum's exact " +
       "range") {
    val r = run("q301_wilcoxon_signed_rank").head()
    val n = r.getLong(0)
    val w = r.getDouble(1)
    assert(n > 0)
    assert(w >= 0.0 && w <= n.toDouble * (n + 1) / 2, s"W+=$w n=$n")
  }

  test("q302: pairs are canonical (id_a < id_b), distances within the " +
       "threshold, and each pair's length band actually admits it") {
    val rows = run("q302_edit_distance_pairs")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(rows.nonEmpty)
    rows.foreach { case (a, b, lev) =>
      assert(a < b, s"pair ($a,$b) not canonical")
      assert(lev >= 0 && lev <= 20, s"lev=$lev out of threshold")
    }
    assert(rows.distinct.length == rows.length, "duplicate pairs")
  }

  test("q303: TV and Bhattacharyya are complementary-bounded " +
       "divergences over the same distributions") {
    val r = run("q303_source_divergence").head()
    val (va, vb, sh) = (r.getLong(0), r.getLong(1), r.getLong(2))
    val tv = r.getDouble(3)
    val bc = r.getDouble(4)
    assert(sh <= math.min(va, vb), "shared vocab exceeds a side")
    assert(tv >= 0.0 && tv <= 1.0, s"tv=$tv")
    assert(bc >= 0.0 && bc <= 1.0 + 1e-12, s"bc=$bc")
    // Hellinger² = 1 − BC and TV bound each other:
    // H² ≤ TV ≤ H·√2 ⇒ 1 − BC ≤ TV (exact inequality, no floats lost)
    assert(1.0 - bc <= tv + 1e-9, s"1-BC=${1.0 - bc} > TV=$tv")
  }

  test("q304: all three cumulative curves are monotone and vocab never " +
       "exceeds token count") {
    val rows = run("q304_heaps_curve")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .sortBy(_._1)
    assert(rows.nonEmpty)
    rows.foreach { case (_, docs, toks, vocab) =>
      assert(vocab <= toks, "vocabulary larger than token count")
      assert(docs > 0)
    }
    rows.sliding(2).foreach {
      case Array((_, d1, t1, v1), (_, d2, t2, v2)) =>
        assert(d2 >= d1 && t2 >= t1 && v2 >= v1, "curve not monotone")
      case _ => ()
    }
  }

  test("q305: |Hedges' g| < |Cohen's d| (J < 1) and both share d's " +
       "sign") {
    val r = run("q305_effect_sizes").head()
    val d = r.getDouble(3)
    val g = r.getDouble(4)
    assert(math.abs(g) < math.abs(d) + 1e-15,
      s"small-sample correction must shrink: d=$d g=$g")
    assert(d == 0.0 || math.signum(d) == math.signum(g))
  }

  test("q306: exact percentiles are ordered p50 <= p90 <= max") {
    val r = run("q306_convert_time").head()
    assert(r.getLong(0) > 0)
    val (p50, p90, mx) = (r.getLong(1), r.getLong(2), r.getLong(3))
    assert(p50 <= p90 && p90 <= mx, s"p50=$p50 p90=$p90 max=$mx")
  }

  test("q307: mean silhouette per label lies in [-1, 1] and all labels " +
       "report") {
    val rows = run("q307_silhouette")
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getDouble(2)))
    assert(rows.length == 10, s"expected 10 labels, got ${rows.length}")
    rows.foreach { case (l, n, s) =>
      assert(n > 0)
      assert(s >= -1.0 - 1e-9 && s <= 1.0 + 1e-9,
        s"label $l silhouette $s out of range")
    }
  }

  test("q309: Cochran's Q is non-negative (Cauchy–Schwarz numerator) " +
       "and column totals are bounded by n") {
    val r = run("q309_cochran_q").head()
    val n = r.getLong(0)
    Seq(1, 2, 3).foreach(i => assert(r.getLong(i) >= 0 &&
      r.getLong(i) <= n))
    if (!r.isNullAt(4)) assert(r.getDouble(4) >= 0.0)
  }

  test("q310: Friedman chi2 is non-negative over complete week blocks") {
    val r = run("q310_friedman").head()
    assert(r.getLong(0) > 0, "needs at least one complete week")
    if (!r.isNullAt(1)) assert(r.getDouble(1) >= 0.0)
  }

  test("q311: Cliff's delta lies in [-1, 1] and net pairs within total") {
    val r = run("q311_cliffs_delta").head()
    val (net, tot) = (r.getLong(0), r.getLong(1))
    assert(tot > 0 && math.abs(net) <= tot)
    val d = r.getDouble(2)
    assert(d >= -1.0 && d <= 1.0, s"delta=$d")
  }

  test("q312: per-arm error counts bounded by exposures; z shares " +
       "rate_diff's sign") {
    val r = run("q312_poisson_rate").head()
    assert(r.getLong(0) <= r.getLong(1) && r.getLong(2) <= r.getLong(3))
    if (!r.isNullAt(5) && r.getDouble(4) != 0.0)
      assert(math.signum(r.getDouble(4)) == math.signum(r.getDouble(5)))
  }

  test("q313: overlap bounded by both captures and Chapman estimate " +
       "dominates each single detector") {
    val r = run("q313_capture_recapture").head()
    val (n1, n2, m) = (r.getLong(0), r.getLong(1), r.getLong(2))
    assert(m <= math.min(n1, n2), s"overlap $m exceeds a capture")
    assert(m > 0, "detectors should agree on at least one pair here")
    assert(r.getDouble(3) >= math.max(n1, n2) - 1e-9,
      "N-hat must dominate each single detector's catch")
  }

  test("q314: MCC lies in [-1, 1] and the confusion cells partition " +
       "the corpus") {
    val r = run("q314_mcc").head()
    val total = r.getLong(0) + r.getLong(1) + r.getLong(2) + r.getLong(3)
    assert(total > 0)
    if (!r.isNullAt(4)) {
      val mcc = r.getDouble(4)
      assert(mcc >= -1.0 - 1e-12 && mcc <= 1.0 + 1e-12, s"mcc=$mcc")
    }
  }

  test("q315: PR-AUC lies in (0, 1] and positives within docs") {
    val r = run("q315_pr_auc").head()
    val (n, p) = (r.getLong(0), r.getLong(1))
    assert(p > 0 && p <= n)
    val auc = r.getDouble(2)
    // AP is bounded below by the prevalence of a random ranker only in
    // expectation; the hard bounds are (0, 1]
    assert(auc > 0.0 && auc <= 1.0 + 1e-12, s"pr_auc=$auc")
  }

  test("q316: Durbin-Watson lies in the hard [0, 4] range") {
    val r = run("q316_durbin_watson").head()
    assert(r.getLong(0) > 2)
    if (!r.isNullAt(1)) {
      val dw = r.getDouble(1)
      assert(dw >= 0.0 && dw <= 4.0, s"dw=$dw")
    }
  }

  test("q317: leverage in (0, 1], Cook's D non-negative, 5 rows " +
       "descending") {
    val rows = run("q317_ols_influence")
      .collect().map(r => (r.getDouble(2), r.getDouble(3)))
    assert(rows.length == 5)
    rows.foreach { case (h, d) =>
      assert(h > 0.0 && h <= 1.0, s"leverage $h")
      assert(d >= 0.0, s"cooks_d $d")
    }
    rows.sliding(2).foreach {
      case Array((_, d1), (_, d2)) => assert(d1 >= d2, "not descending")
      case _ => ()
    }
  }

  test("q318: active users bounded by total, zero_frac consistent, " +
       "variance non-negative") {
    val rows = run("q318_dispersion").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getLong(1) > 0 && r.getLong(2) > 0)
      assert(r.getDouble(6) >= 0.0 && r.getDouble(6) < 1.0)
      assert(r.getDouble(4) >= 0.0, "variance must be >= 0")
    }
  }

  test("q319: HHI lies in [1/n, 1] and its normalization in [0, 1]") {
    val r = run("q319_hhi").head()
    val n = r.getLong(0)
    val hhi = r.getDouble(2)
    assert(hhi >= 1.0 / n - 1e-12 && hhi <= 1.0 + 1e-12, s"hhi=$hhi")
    val hn = r.getDouble(3)
    assert(hn >= -1e-12 && hn <= 1.0 + 1e-12, s"hhi_norm=$hn")
  }

  test("q320: every source reports and word averages are positive") {
    val rows = run("q320_readability").collect()
    assert(rows.length == 20, s"expected 20 sources, got ${rows.length}")
    rows.foreach { r =>
      assert(r.getLong(1) > 0 && r.getDouble(2) > 0.0)
    }
  }

  test("q321: all three pairwise r and the partial r lie in [-1, 1]") {
    val r = run("q321_partial_correlation").head()
    assert(r.getLong(0) > 2)
    (1 to 4).foreach { i =>
      val v = r.getDouble(i)
      assert(v >= -1.0 - 1e-12 && v <= 1.0 + 1e-12, s"col $i = $v")
    }
  }

  test("q322: trend Z^2 non-negative, sign in {-1,0,1}, finished " +
       "bounded by total") {
    val r = run("q322_cochran_armitage").head()
    assert(r.getLong(1) > 0 && r.getLong(1) <= r.getLong(0))
    assert(math.abs(r.getLong(2)) <= 1)
    assert(r.getDouble(3) >= 0.0, s"z2=${r.getDouble(3)}")
  }

  test("q323: AM-HM inequality holds and Atkinson index in [0, 1)") {
    val r = run("q323_atkinson").head()
    val (mean, hm, a2) = (r.getDouble(1), r.getDouble(2), r.getDouble(3))
    assert(hm > 0.0 && hm <= mean + 1e-9, s"hm=$hm mean=$mean")
    assert(a2 >= -1e-12 && a2 < 1.0, s"atkinson2=$a2")
  }

  test("q324: cumulative share is monotone, ends at 1, deciles 1..10") {
    val rows = run("q324_lorenz_deciles").collect()
    assert(rows.map(_.getLong(0)).toSeq == (1L to 10L))
    val cum = rows.map(_.getDouble(3))
    cum.sliding(2).foreach {
      case Array(a, b) => assert(a <= b + 1e-12, "cum_share not monotone")
      case _ => ()
    }
    assert(math.abs(cum.last - 1.0) < 1e-12)
    rows.foreach(r => assert(r.getDouble(2) >= 0.0))
  }

  test("q325: true FKs flagged as INDs, the planted negative is not") {
    val rows = run("q325_ind_discovery").collect()
      .map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getBoolean(4))).toMap
    assert(rows.size == 7)
    assert(rows("lineitem.l_orderkey IN orders.o_orderkey")._3)
    assert(rows("lineitem.l_partkey IN part.p_partkey")._3)
    assert(!rows("part.p_size IN nation.n_nationkey")._3)
    rows.values.foreach { case (nd, nc, _) =>
      assert(nc >= 0 && nc <= nd)
    }
  }

  test("q326: HL statistic non-negative over at most 10 score bins") {
    val r = run("q326_hosmer_lemeshow").head()
    assert(r.getLong(0) > 0)
    assert(r.getLong(1) >= 1 && r.getLong(1) <= 10)
    assert(r.getDouble(2) >= 0.0, s"hl=${r.getDouble(2)}")
  }

  test("q327: degree mass is twice the edge count and Q lies in " +
       "[-0.5, 1]") {
    val rows = run("q327_dedup_modularity").collect()
    assert(rows.length == 20)
    val m2 = rows.map(_.getLong(3)).sum
    assert(m2 % 2 == 0 && m2 > 0, s"degree mass $m2")
    val intra = rows.map(_.getLong(2)).sum
    assert(intra <= m2 / 2, "intra edges exceed total edges")
    val q = rows.map(_.getDouble(4)).sum
    assert(q >= -0.5 - 1e-12 && q <= 1.0 + 1e-12, s"Q=$q")
  }

  test("q328: candidates are true non-edges with consistent scores, " +
       "cn non-increasing") {
    val rows = run("q328_link_prediction").collect()
    assert(rows.nonEmpty && rows.length <= 20)
    rows.foreach { r =>
      val (cn, j, pa) = (r.getLong(2), r.getDouble(3), r.getLong(4))
      assert(cn >= 1)
      assert(j > 0.0 && j <= 1.0 + 1e-12, s"jaccard $j")
      assert(pa >= cn, s"pref_attach $pa < cn $cn")
    }
    rows.map(_.getLong(2)).sliding(2).foreach {
      case Array(a, b) => assert(a >= b, "cn ranking not monotone")
      case _ => ()
    }
  }

  test("q329: split impurity at most root impurity, gain non-negative") {
    val r = run("q329_gini_split").head()
    assert(r.getLong(1) > 0 && r.getLong(2) > 0)
    val (gs, gr, gg) = (r.getDouble(3), r.getDouble(4), r.getDouble(5))
    assert(gs >= 0.0 && gs <= gr + 1e-12, s"split $gs root $gr")
    assert(gr <= 0.9 + 1e-12, "root Gini exceeds 1 - 1/k for k=10")
    assert(gg >= -1e-12 && math.abs(gg - (gr - gs)) < 1e-12)
  }

  test("q330: interval EWMA >= 1 day and rate = size/interval") {
    val rows = run("q330_croston").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getLong(1) >= 2)
      val (z, p, rate) = (r.getDouble(2), r.getDouble(3), r.getDouble(4))
      assert(z > 0.0 && p >= 1.0 - 1e-6, s"z=$z p=$p")
      assert(math.abs(rate - z / p) < 1e-12)
    }
  }

  test("q331: trim count is n/10 and the trimmed mean is positive") {
    val r = run("q331_trimmed_mean").head()
    val (n, k) = (r.getLong(0), r.getLong(1))
    assert(k == n / 10, s"k=$k n=$n")
    assert(r.getDouble(2) > 0.0 && r.getDouble(3) > 0.0)
  }

  test("q332: J within [0, 2E], variance positive") {
    val r = run("q332_jonckheere").head()
    assert(r.getLong(0) > 0)
    val (j, e, v) = (r.getDouble(1), r.getDouble(2), r.getDouble(3))
    assert(j >= 0.0 && j <= 2.0 * e + 1e-6, s"J=$j E=$e")
    assert(v > 0.0, s"var=$v")
  }

  test("q333: phrases are stopword-free, scores positive and ranked") {
    val rows = run("q333_rake_keywords").collect()
    assert(rows.nonEmpty && rows.length <= 20)
    val stop = Params.stopwords.toSet
    rows.foreach { r =>
      val words = r.getString(0).split(" ")
      assert(words.length == r.getLong(1))
      assert(words.forall(w => !stop.contains(w)), "stopword in phrase")
      assert(r.getLong(2) >= 1)
      assert(r.getDouble(3) > 0.0)
    }
  }

  test("q334: T >= -1/6 (its analytic floor) and groups partition " +
       "the orders") {
    val r = run("q334_cramer_von_mises").head()
    assert(r.getLong(0) > 0 && r.getLong(1) > 0)
    assert(r.getDouble(2) >= 0.0)
    assert(r.getDouble(3) >= -1.0 / 6.0 - 1e-9,
      s"T=${r.getDouble(3)}")
  }

  test("q335: ECE bounded by MCE, both in [0, 1]") {
    val rows = run("q335_ece").collect()
    assert(rows.length == 20)
    rows.foreach { r =>
      val (ece, mce) = (r.getDouble(2), r.getDouble(3))
      assert(ece >= 0.0 && ece <= 1.0 + 1e-12)
      assert(mce >= ece - 1e-12 && mce <= 1.0 + 1e-12,
        s"ece=$ece mce=$mce")
    }
  }

  test("q336: skyline is mutually non-dominated and strictly " +
       "anti-chain ordered") {
    val rows = run("q336_skyline").collect()
      .map(r => (r.getDouble(1), r.getLong(2))).sortBy(_._1)
    assert(rows.nonEmpty)
    // along increasing price the surviving sizes must strictly rise —
    // otherwise the pricier part is dominated by a cheaper one
    rows.sliding(2).foreach {
      case Array((p1, s1), (p2, s2)) =>
        assert(p1 < p2 && s1 < s2,
          s"($p1,$s1) vs ($p2,$s2) not an anti-chain")
      case _ => ()
    }
  }

  test("q337: chi-square non-negative and median within value range") {
    val r = run("q337_mood_median").head()
    assert(r.getLong(0) > 0 && r.getLong(1) > 0)
    assert(r.getDouble(2) >= 0.0)
    assert(r.getDouble(3) >= 0.0, s"chi2=${r.getDouble(3)}")
  }

  test("q338: fertility >= 1 (a word is at least one subword)") {
    val rows = run("q338_bpe_fertility").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getLong(2) > 0 && r.getLong(3) >= r.getLong(2))
      assert(r.getDouble(4) >= 1.0 - 1e-12)
      assert(r.getDouble(5) > 0.0)
    }
  }

  test("q339: survival + both incidences conserve mass at every step") {
    val rows = run("q339_competing_risks").collect()
    assert(rows.nonEmpty)
    var prevSurv = 1000000000000L
    var prevC1 = 0L
    var prevC2 = 0L
    rows.foreach { r =>
      val (s, c1, c2) = (r.getLong(5), r.getLong(6), r.getLong(7))
      assert(s <= prevSurv, "survival must be non-increasing")
      assert(c1 >= prevC1 && c2 >= prevC2, "CIFs must be non-decreasing")
      // floor-div loses at most 1 unit per step per component
      assert(s + c1 + c2 <= 1000000000000L + 1,
        s"mass ${s + c1 + c2} exceeds 1")
      prevSurv = s; prevC1 = c1; prevC2 = c2
    }
  }

  test("q340: Ljung-Box Q non-negative with 7 df") {
    val r = run("q340_ljung_box").head()
    assert(r.getLong(0) > 8, "need more days than max lag")
    assert(r.getDouble(1) >= 0.0, s"Q=${r.getDouble(1)}")
    assert(r.getLong(2) == 7)
  }

  test("q341: Grubbs G within its algebraic bound (n-1)/sqrt(n)") {
    val r = run("q341_grubbs").head()
    val n = r.getLong(1)
    val g = r.getDouble(2)
    assert(n > 2)
    assert(g >= 0.0 && g <= (n - 1).toDouble / math.sqrt(n.toDouble),
      s"G=$g n=$n")
  }

  test("q342: RBO in [0, 1] and overlap@10 at most 10") {
    val r = run("q342_rbo").head()
    val ov = r.getLong(0)
    assert(ov >= 0 && ov <= 10)
    val rbo = r.getDouble(1)
    assert(rbo >= 0.0 && rbo <= 1.0 + 1e-12, s"rbo=$rbo")
  }

  test("q343: control limits bracket the center and D3/D4 order holds") {
    val rows = run("q343_xbar_r_chart").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (xc, ucl, lcl) = (r.getDouble(3), r.getDouble(5), r.getDouble(6))
      assert(lcl < xc && xc < ucl, s"limits $lcl $xc $ucl")
      val (uclR, lclR, rc) = (r.getDouble(7), r.getDouble(8), r.getDouble(4))
      assert(lclR < rc && rc < uclR)
      assert(r.getDouble(2) >= 0.0)
    }
  }

  test("q344: first-day state seeds at u*100 with zero trend; " +
       "forecast = level + trend") {
    val rows = run("q344_holt_forecast").collect()
    assert(rows.length > 2)
    val first = rows.head
    assert(first.getLong(2) == first.getLong(1) * 100)
    assert(first.getLong(3) == 0L)
    rows.foreach { r =>
      assert(r.getLong(4) == r.getLong(2) + r.getLong(3))
    }
  }

  test("q345: L lies within its exact rank-sum bounds") {
    val r = run("q345_page_trend").head()
    val n = r.getLong(0)
    assert(n >= 2)
    val l = r.getDouble(1)
    // per week Σ j·r_j over a permutation of ranks 1..7 lies in
    // [Σ j·(8-j), Σ j·j] = [84, 140]
    assert(l >= 84.0 * n - 1e-9 && l <= 140.0 * n + 1e-9,
      s"L=$l n=$n")
  }

  test("q346: H non-negative, tie-corrected H at least H, 5 groups") {
    val r = run("q346_kruskal_wallis").head()
    assert(r.getLong(0) > 0 && r.getLong(1) == 5)
    val (h, hc) = (r.getDouble(2), r.getDouble(3))
    assert(h >= -1e-9, s"H=$h")
    assert(hc >= h - 1e-9, "tie correction must not shrink H")
  }

  test("q347: Brown-Forsythe F non-negative over the 5 event types") {
    val r = run("q347_brown_forsythe").head()
    assert(r.getLong(0) == 5 && r.getLong(1) > 10)
    assert(r.getDouble(2) >= 0.0, s"F=${r.getDouble(2)}")
  }

  test("q348: LTV is non-decreasing in age within every cohort") {
    val rows = run("q348_cohort_ltv").collect()
    assert(rows.nonEmpty)
    rows.groupBy(_.getLong(0)).foreach { case (_, rs) =>
      val byAge = rs.sortBy(_.getLong(1)).map(_.getDouble(3))
      byAge.sliding(2).foreach {
        case Array(a, b) => assert(b >= a - 1e-9, "LTV decreased")
        case _ => ()
      }
    }
  }

  test("q349: Welch F non-negative with positive Welch-Satterthwaite " +
       "df") {
    val r = run("q349_welch_anova").head()
    assert(r.getLong(0) > 0 && r.getLong(1) == 5)
    assert(r.getDouble(2) >= 0.0, s"F=${r.getDouble(2)}")
    assert(r.getDouble(3) > 0.0, s"df2=${r.getDouble(3)}")
  }

  test("q350: cumulative arms are monotone in depth and the random " +
       "line is hit exactly at full depth") {
    val rows = run("q350_qini").collect().sortBy(_.getLong(0))
    assert(rows.nonEmpty && rows.length <= 10)
    rows.sliding(2).foreach {
      case Array(a, b) =>
        assert(a.getLong(2) <= b.getLong(2) && a.getLong(4) <= b.getLong(4))
      case _ => ()
    }
    assert(math.abs(rows.last.getDouble(7)) < 1e-9,
      "qini_above_random must vanish at full depth")
  }

  test("q351: zero-seeded state — day-1 forecast is level plus a zero " +
       "seasonal; every forecast = l + b + s_next") {
    val rows = run("q351_holt_winters").collect()
    assert(rows.length > 7)
    val first = rows.head
    assert(first.getLong(2) == first.getLong(1) * 100)
    assert(first.getLong(3) == 0L && first.getLong(4) == 0L)
    rows.foreach { r =>
      assert(r.getLong(5) == r.getLong(2) + r.getLong(3) + r.getLong(4))
    }
  }

  test("q352: DTW bounded above by the diagonal path and below by " +
       "the corner cells") {
    import org.apache.spark.sql.functions._
    val g = Tables.load(spark, TestSpark.sf0001, "events")
      .groupBy(expr("unix_micros(ts) div 86400000000").as("day"))
      .agg(sum(when(col("event_type") === "purchase", 1L).otherwise(0L))
        .as("pa"),
        sum(when(col("event_type") === "view", 1L).otherwise(0L))
          .as("pv"))
      .orderBy("day").collect()
    val a = g.map(_.getLong(1)); val b = g.map(_.getLong(2))
    val diag = a.zip(b).map { case (x, y) => math.abs(x - y) }.sum
    val r = run("q352_dtw").head()
    assert(r.getLong(0) == a.length.toLong)
    val dtw = r.getLong(1)
    assert(dtw <= diag, s"DTW $dtw exceeds diagonal path $diag")
    assert(dtw >= math.abs(a.head - b.head) + math.abs(a.last - b.last),
      "DTW below its corner-cell floor")
  }

  test("q353: kernel means are means of squares (>= 0) and the " +
       "V-statistic MMD^2 is non-negative") {
    val r = run("q353_mmd").head()
    assert(r.getLong(0) > 0 && r.getLong(1) > 0)
    (2 to 4).foreach { i =>
      assert(r.getDouble(i) >= 0.0, s"kernel mean $i negative")
    }
    assert(r.getDouble(5) >= -1e-9, s"mmd2=${r.getDouble(5)}")
  }

  test("q308: runs count is within its exact combinatorial range") {
    val r = run("q308_runs_test").head()
    val (runs, n1, n2) = (r.getLong(0), r.getLong(1), r.getLong(2))
    assert(n1 > 0 && n2 > 0, "both directions must occur")
    assert(runs >= 1 && runs <= n1 + n2, s"R=$runs n1=$n1 n2=$n2")
    // R >= 2 whenever both symbols appear
    assert(runs >= 2)
    assert(!r.getDouble(3).isNaN)
  }
}
