package graft

import org.scalatest.funsuite.AnyFunSuite

/** Semantic invariants of the round-14 additions (q389–q398) that the
  * oracle hash can't express — range bounds, cross-statistic
  * identities, and structural properties.
  */
class Round14EvalSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def run(name: String) =
    SparkEntry.queries(name)(spark, TestSpark.sf0001)

  test("q389: Durbin-Watson lies in [0, 4] and adjacency pairs are " +
       "bounded by n - 1") {
    val r = run("q389_durbin_watson").head()
    val (n, np) = (r.getLong(0), r.getLong(1))
    assert(n > 2 && np > 0 && np <= n - 1, s"n=$n np=$np")
    val dw = r.getDouble(2)
    // DW = Σ(e_t − e_{t−1})²/Σe² ≤ 4 by Cauchy–Schwarz on residuals
    assert(dw >= 0.0 && dw <= 4.0, s"dw=$dw")
  }

  test("q390: Bartels RVN is in (0, 4) and pairs bounded by n - 1") {
    val r = run("q390_bartels_rvn").head()
    val (n, np) = (r.getLong(0), r.getLong(1))
    assert(n > 2 && np > 0 && np <= n - 1, s"n=$n np=$np")
    val rvn = r.getDouble(2)
    assert(rvn > 0.0 && rvn < 4.0, s"rvn=$rvn")
  }

  test("q391: Cox-Stuart counts are consistent (pairs = n div 2, " +
       "plus + minus + ties = pairs)") {
    val r = run("q391_cox_stuart").head()
    val (n, np, pl, mi, ti) = (r.getLong(0), r.getLong(1), r.getLong(2),
      r.getLong(3), r.getLong(4))
    assert(np == n / 2, s"np=$np n=$n")
    assert(pl + mi + ti == np, s"pl=$pl mi=$mi ti=$ti np=$np")
    assert(!r.getDouble(5).isNaN)
  }

  test("q392: L-moment system is coherent: l1 > 0, 0 < l2 < l1 " +
       "(positive data), l_cv = l2/l1 and |l_skew| <= 1") {
    val r = run("q392_l_moments").head()
    assert(r.getLong(0) > 2)
    val (l1, l2, lcv, lsk) =
      (r.getDouble(1), r.getDouble(2), r.getDouble(3), r.getDouble(4))
    assert(l1 > 0.0 && l2 > 0.0 && l2 < l1, s"l1=$l1 l2=$l2")
    // l_cv must equal l2/l1 up to the two divisions' rounding
    assert(math.abs(lcv - l2 / l1) < 1e-9, s"lcv=$lcv l2/l1=${l2 / l1}")
    assert(math.abs(lsk) <= 1.0, s"l_skew=$lsk")
  }

  test("q393: Cronbach alpha is <= 1 with k = 7 items and >= 2 weeks") {
    val r = run("q393_cronbach_alpha").head()
    assert(r.getLong(0) >= 2 && r.getLong(1) == 7)
    val a = r.getDouble(2)
    // alpha ≤ 1 always; can be negative for anti-correlated items
    assert(a <= 1.0, s"alpha=$a")
  }

  test("q394: dissimilarities are within range on every source pair " +
       "and the pair grid is the full C(sources, 2)") {
    val rows = run("q394_community_dissimilarity").collect()
    assert(rows.nonEmpty)
    val sources = rows.flatMap(r => Seq(r.getString(0), r.getString(1)))
      .distinct.length
    assert(rows.length == sources * (sources - 1) / 2,
      s"rows=${rows.length} sources=$sources")
    rows.foreach { r =>
      val bc = r.getDouble(4)
      val mh = r.getDouble(5)
      assert(bc >= 0.0 && bc <= 1.0, s"bc=$bc at $r")
      // MH ≤ 1 by AM-GM on the denominator; ≥ 0 since counts are
      assert(mh >= 0.0 && mh <= 1.0 + 1e-12, s"mh=$mh at $r")
    }
  }

  test("q395: assortativity is a correlation (|r| <= 1) on a " +
       "non-trivial graph") {
    val r = run("q395_degree_assortativity").head()
    val (nn, ne) = (r.getLong(0), r.getLong(1))
    assert(nn >= 2 && ne >= 1, s"nodes=$nn edges=$ne")
    val a = r.getDouble(2)
    assert(a >= -1.0 - 1e-12 && a <= 1.0 + 1e-12, s"r=$a")
  }

  test("q396: Wiener/efficiency agree with the q371 histogram " +
       "(wiener = sum d*pairs, diameter = max d, efficiency in (0,1])") {
    val hist = run("q371_graph_distances").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val r = run("q396_wiener_efficiency").head()
    assert(r.getLong(0) === hist.map(_._1).max, "diameter")
    assert(r.getLong(1) === hist.map(_._2).sum, "reached pairs")
    assert(r.getLong(2) === hist.map(h => h._1 * h._2).sum, "wiener")
    val (mp, eff) = (r.getDouble(3), r.getDouble(4))
    assert(mp >= 1.0 && eff > 0.0 && eff <= 1.0, s"mp=$mp eff=$eff")
  }

  test("q397: mean local cc is a probability and max_cc >= mean") {
    val r = run("q397_local_clustering").head()
    assert(r.getLong(0) >= 1)
    val (mean, mx) = (r.getDouble(1), r.getDouble(2))
    assert(mean >= 0.0 && mean <= 1.0, s"mean=$mean")
    assert(mx >= mean - 1e-12 && mx <= 1.0, s"max=$mx mean=$mean")
  }

  test("q399: tau-b is a correlation, C+D bounded by untied pairs") {
    val r = run("q399_kendall_tau_b").head()
    val (n, c, d) = (r.getLong(0), r.getLong(1), r.getLong(2))
    assert(n > 1 && c >= 0 && d >= 0, s"n=$n c=$c d=$d")
    assert(c + d <= n * (n - 1) / 2, "C+D cannot exceed all pairs")
    val t = r.getDouble(3)
    assert(t >= -1.0 - 1e-12 && t <= 1.0 + 1e-12, s"tau_b=$t")
  }

  test("q400: rook lattice edge count is bounded by 2n and both " +
       "coefficients are in their classic ranges") {
    val r = run("q400_moran_geary").head()
    val (n, m) = (r.getLong(0), r.getLong(1))
    assert(n > 7 && m > 0 && m < 2 * n, s"n=$n m=$m")
    val (i, c) = (r.getDouble(2), r.getDouble(3))
    // I in [-1, 1] up to the row-standardization-free slack; C >= 0
    assert(i >= -1.0 - 1e-9 && i <= 1.0 + 1e-9, s"I=$i")
    assert(c >= 0.0 && c <= 3.0, s"C=$c")
  }

  test("q398: Dixon gap ratios are in [0, 1] and sum to <= 1 " +
       "(disjoint gaps of the same range)") {
    val r = run("q398_dixon_q").head()
    assert(r.getLong(0) > 3)
    assert(r.getDouble(1) > 0.0, "range")
    val (qmin, qmax) = (r.getDouble(2), r.getDouble(3))
    assert(qmin >= 0.0 && qmax >= 0.0, s"qmin=$qmin qmax=$qmax")
    // the two extreme gaps are disjoint slices of [x1, xn]
    assert(qmin + qmax <= 1.0 + 1e-12, s"qmin+qmax=${qmin + qmax}")
  }
}
