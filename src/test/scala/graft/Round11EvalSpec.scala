package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Semantic invariants of the round-11 causal/capacity family
  * (q260–q263) that the oracle hash can't express.
  */
class Round11EvalSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def run(name: String) =
    SparkEntry.queries(name)(spark, TestSpark.sf0001)

  test("q260: stratum weights sum to 1 over the kept strata and the " +
       "weighted diffs compose the ATE") {
    val rows = run("q260_stratified_ate")
      .select("w", "diff", "wdiff").collect()
    assert(rows.nonEmpty)
    val wsum = rows.map(_.getDouble(0)).sum
    assert(math.abs(wsum - 1.0) < 1e-9,
      s"weights must sum to 1 over kept strata, got $wsum")
    rows.foreach { r =>
      assert(math.abs(r.getDouble(2) - r.getDouble(0) * r.getDouble(1))
        < 1e-12)
    }
  }

  test("q261: peaks are positive, bounded by open intervals, and " +
       "carry-in never exceeds the previous day's starts") {
    val rows = run("q261_peak_concurrency")
      .select("day", "n_starts", "carry_in", "peak_concurrent")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .sortBy(_._1)
    assert(rows.nonEmpty)
    rows.foreach { case (_, starts, carry, peak) =>
      assert(peak >= 1L && peak <= starts + carry,
        "peak must lie in [1, starts + carry]")
      assert(carry >= 0L)
    }
    rows.sliding(2).foreach {
      case Array((d1, starts1, _, _), (d2, _, carry2, _))
        if d2 == d1 + 1 =>
        assert(carry2 <= starts1,
          "carry-in is a subset of yesterday's started windows")
      case _ => ()
    }
  }

  test("q262: jackknife SE is non-negative and theta_bar stays within " +
       "the bucket-theta envelope") {
    val r = run("q262_jackknife_ratio_se").head()
    assert(r.getLong(0) > 1L)
    assert(r.getDouble(3) >= 0.0)
    // the jackknife mean of leave-one-out ratios should sit near the
    // full-sample ratio for a well-behaved metric
    assert(math.abs(r.getDouble(1) - r.getDouble(2)) <
      10 * (r.getDouble(3) + 1e-9))
  }

  test("q264: decay weights only shrink — score is positive and never " +
       "exceeds the undecayed per-user value sum") {
    val raw = TestSpark.spark.read
      .parquet(TestSpark.sf0001 + "/events.parquet")
      .groupBy("user_id")
      .agg(sum("value").as("rawsum"))
    val out = run("q264_decay_score").join(raw, "user_id")
      .select("decayed_score", "rawsum").collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      assert(r.getDouble(0) > 0.0 && r.getDouble(0) <= r.getDouble(1) + 1e-6)
    }
  }

  test("q265: risk set shrinks and cumulative hazard grows with t") {
    val rows = run("q265_nelson_aalen")
      .select("t", "n_risk", "hazard", "cum_hazard").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2),
        r.getDouble(3)))
      .sortBy(_._1)
    assert(rows.nonEmpty)
    rows.sliding(2).foreach {
      case Array((_, n1, _, ch1), (_, n2, _, ch2)) =>
        assert(n2 < n1, "risk set must strictly shrink across event times")
        assert(ch2 > ch1, "cumulative hazard must strictly grow")
      case _ => ()
    }
    rows.foreach { case (_, _, hz, _) => assert(hz > 0.0 && hz <= 1.0) }
  }

  test("q266: PH statistic is non-negative and alarm matches the " +
       "lambda=30 threshold") {
    val rows = run("q266_page_hinkley")
      .select("ph_max", "alarm").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getDouble(0) >= 0.0)
      assert((r.getDouble(0) > 30.0) === (r.getInt(1) === 1))
    }
  }

  test("q267: EM-updated (m, u, p) stay in (0,1) and every field " +
       "agrees more under match than under non-match") {
    val rows = run("q267_fs_em_step")
      .select("field", "m1", "u1", "p1").collect()
    assert(rows.length === Params.fsFields.length)
    rows.foreach { r =>
      val (m1, u1, p1) =
        (r.getDouble(1), r.getDouble(2), r.getDouble(3))
      assert(m1 > 0.0 && m1 <= 1.0 && u1 > 0.0 && u1 <= 1.0)
      assert(p1 > 0.0 && p1 < 1.0)
      // equality only when the sf0.001 sample leaves a field
      // uninformative (every blocked pair agrees on it)
      assert(m1 >= u1, s"field ${r.getString(0)}: m' must not be " +
        "below u'")
    }
  }

  test("q268: pair and doc survivor counts are non-increasing in the " +
       "threshold") {
    val rows = run("q268_jaccard_threshold_curve")
      .select("threshold", "n_pairs", "n_docs").collect()
      .map(r => (r.getDouble(0), r.getLong(1), r.getLong(2)))
      .sortBy(_._1)
    assert(rows.length === 5)
    rows.sliding(2).foreach {
      case Array((_, p1, d1), (_, p2, d2)) =>
        assert(p2 <= p1 && d2 <= d1)
      case _ => ()
    }
  }

  test("q269: recall sits in [0,1] over a full exact top-k per probe") {
    val rows = run("q269_ann_recall")
      .select("k", "n_hits", "recall").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getLong(0) === Params.topK.toLong)
      assert(r.getLong(1) >= 0L && r.getLong(1) <= r.getLong(0))
      assert(r.getDouble(2) >= 0.0 && r.getDouble(2) <= 1.0)
    }
  }

  test("q270: nested hash subsamples grow monotonically in users and " +
       "purchases") {
    val rows = run("q270_data_scaling_curve")
      .select("pct", "n_users", "n_purchases").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .sortBy(_._1)
    assert(rows.length === 4)
    rows.sliding(2).foreach {
      case Array((_, u1, p1), (_, u2, p2)) =>
        assert(u2 >= u1 && p2 >= p1,
          "larger fractions must contain the smaller samples")
      case _ => ()
    }
  }

  test("q271: four looks, widening information, shrinking boundary") {
    val rows = run("q271_group_sequential")
      .select(col("k").cast("long"), col("cut"), col("x_t"), col("x_c"),
        col("boundary")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getDouble(4)))
      .sortBy(_._1)
    assert(rows.length === 4)
    rows.sliding(2).foreach {
      case Array((_, c1, xt1, xc1, b1), (_, c2, xt2, xc2, b2)) =>
        assert(c2 > c1 && xt2 >= xt1 && xc2 >= xc1)
        assert(b2 < b1, "O'Brien-Fleming boundary must shrink")
      case _ => ()
    }
    assert(math.abs(rows.last._5 - 2.024) < 1e-12)
  }

  test("q272: chi2 is consistent with the arm counts") {
    val r = run("q272_srm_check").head()
    val (nt, nc, chi2) = (r.getLong(0), r.getLong(1), r.getDouble(2))
    assert(nt + nc > 0)
    val expect = (nt - nc).toDouble * (nt - nc) / (nt + nc)
    assert(math.abs(chi2 - expect) < 1e-12)
    assert((chi2 > 3.841) === (r.getInt(3) === 1))
  }

  test("q273: the 90% vocabulary cut actually covers >= 90% with the " +
       "minimal prefix") {
    val r = run("q273_vocab_coverage").head()
    val (nTypes, kept, total, covered) =
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))
    assert(kept >= 1L && kept <= nTypes)
    assert(covered * 10 >= total * 9, "kept prefix must reach the bar")
    assert(r.getDouble(4) >= 0.9 && r.getDouble(4) <= 1.0)
  }

  test("q274: permutation p-values are valid rationals and BH " +
       "respects the step-up order") {
    val rows = run("q274_permutation_fdr")
      .select("p_num", "p_den", "p_value", "bh_reject").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2),
        r.getInt(3)))
    assert(rows.nonEmpty)
    rows.foreach { case (k, d, p, _) =>
      assert(k >= 1L && k <= d)
      assert(math.abs(p - k.toDouble / d) < 1e-15)
    }
    // BH rejections, if any, must be a prefix of the p-value order
    val sorted = rows.sortBy(_._1)
    val firstKeep = sorted.indexWhere(_._4 == 0)
    if (firstKeep >= 0)
      assert(sorted.drop(firstKeep).forall(_._4 == 0),
        "a rejection may not follow an acceptance in p-order")
  }

  test("q275: two unrolled HITS iterations rank by exact integer " +
       "authority, descending") {
    val rows = run("q275_hits_bipartite")
      .select("authority2").collect().map(_.getLong(0))
    assert(rows.length === 20)
    assert(rows.sliding(2).forall(a => a.length < 2 || a(0) >= a(1)))
    assert(rows.forall(_ > 0L))
  }

  test("q276/q277: assortativity is a correlation, ESS is in (0, n]") {
    val a = run("q276_degree_assortativity").head().getDouble(1)
    assert(a >= -1.0 && a <= 1.0)
    val r = run("q277_ess_weights").head()
    assert(r.getDouble(2) > 0.0 && r.getDouble(2) <= r.getLong(0))
    assert(r.getDouble(3) > 0.0 && r.getDouble(3) <= 1.0)
  }

  test("q278: confusion-matrix rows partition each true label") {
    val rows = run("q278_langid_confusion")
      .select("lang", "n", "n_label").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(rows.nonEmpty)
    rows.groupBy(_._1).foreach { case (_, g) =>
      assert(g.map(_._2).sum === g.head._3,
        "per-label cell counts must sum to the label total")
    }
  }

  test("q279: TV distance is a distance and the worst source bounds " +
       "its own contribution") {
    val r = run("q279_sample_bias_tv").head()
    val (tv, gap) = (r.getDouble(3), r.getDouble(5))
    assert(tv >= 0.0 && tv <= 1.0)
    assert(gap >= 0.0 && gap <= 2 * tv + 1e-15)
  }

  test("q280: binseg emits all/left/right per type with ordered " +
       "changepoints") {
    val rows = run("q280_binary_segmentation")
      .select("event_type", "segment", "cp_day").collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    val byType = rows.groupBy(_._1)
    assert(byType.nonEmpty)
    byType.foreach { case (_, g) =>
      val m = g.map(x => x._2 -> x._3).toMap
      assert(m.keySet === Set("all", "left", "right"))
      assert(m("left") <= m("all") && m("all") < m("right"),
        "left split inside [.., cp1], right split after cp1")
    }
  }

  test("q281: ANOVA sums of squares decompose and F is non-negative") {
    val r = run("q281_anova_weekday").head()
    val (ssb, ssw, f) =
      (r.getDouble(2), r.getDouble(3), r.getDouble(4))
    assert(ssb >= -1e-9 && ssw >= -1e-9)
    assert(f >= 0.0)
    assert((f > 2.53) === (r.getInt(5) === 1))
  }

  test("q282: autocorrelations and partials stay in [-1, 1] and " +
       "pacf1 equals r1") {
    val rows = run("q282_pacf").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      (1 to 6).foreach { i =>
        assert(math.abs(r.getDouble(i)) <= 1.0 + 1e-12)
      }
      assert(r.getDouble(1) === r.getDouble(4), "pacf1 must be r1")
    }
  }

  test("q283: eight range buckets cover every order with near-even " +
       "shares") {
    val rows = run("q283_range_partition_plan")
      .select("bucket", "n_orders", "balance").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(rows.map(_._1).toSet === (0L to 7L).toSet)
    val n = rows.map(_._2).sum
    rows.foreach { case (_, c, bal) =>
      assert(math.abs(bal - c.toDouble * 8 / n) < 1e-12)
      assert(bal > 0.5 && bal < 1.5,
        "exact-quantile boundaries must keep buckets near-even")
    }
  }

  test("q284: sketch medians land within the bottom-k error envelope " +
       "of the exact medians") {
    val rows = run("q284_quantile_sketch_error")
      .select("median_exact", "median_est", "rel_err").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getDouble(0) > 0.0)
      assert(r.getDouble(2) >= 0.0 && r.getDouble(2) < 0.5,
        "a k=256 hash sample's median must not be off by 50%")
    }
  }

  test("q285: ARI of a partition with itself is 1; across thresholds " +
       "it stays in [-1, 1] with at least as many strict clusters") {
    val r = run("q285_cluster_stability_ari").head()
    val (ka, kb, ari) = (r.getLong(1), r.getLong(2), r.getDouble(3))
    assert(kb >= ka, "raising the bar can only split clusters")
    assert(ari >= -1.0 && ari <= 1.0)
  }

  test("q286/q287: attribution credit is conserved — channel credits " +
       "sum to the number of credited users (to the 8-dp rail)") {
    Seq("q286_position_attribution", "q287_time_decay_attribution")
      .foreach { name =>
        val rows = run(name).select("event_type", "credit").collect()
        assert(rows.nonEmpty, name)
        val total = rows.map(_.getDouble(1)).sum
        assert(math.abs(total - math.rint(total)) < 1e-5,
          s"$name: total credit $total must be ~the integer user count")
        rows.foreach(r => assert(r.getDouble(1) > 0.0))
      }
  }

  test("q288: churn report has exactly 10 keys per half and flags " +
       "are consistent with the missing side") {
    val rows = run("q288_hot_key_churn")
      .select("rank_first", "rank_second", "entered", "exited")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(rows.count(_._1 > 0) === 10 && rows.count(_._2 > 0) === 10)
    rows.foreach { case (r0, r1, ent, ext) =>
      assert((ent === 1L) === (r0 === 0L))
      assert((ext === 1L) === (r1 === 0L))
    }
  }

  test("q289: yields are in (0, 1] and kept never exceeds raw") {
    val rows = run("q289_dedup_token_yield")
      .select("tokens_raw", "tokens_kept", "yield").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getLong(1) <= r.getLong(0))
      assert(r.getDouble(2) > 0.0 && r.getDouble(2) <= 1.0)
    }
  }

  test("q290: burn rate is breach_days / n_days exactly") {
    val rows = run("q290_slo_burn")
      .select("n_days", "breach_days", "burn_rate").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getLong(1) <= r.getLong(0))
      assert(math.abs(r.getDouble(2) -
        r.getLong(1).toDouble / r.getLong(0)) < 1e-15)
    }
  }

  test("q291-q293: seasonal strength, Cramer's V and Hoover are all " +
       "valid normalized scalars") {
    val st = run("q291_seasonal_strength").head()
    assert(st.getDouble(1) > 0.0, "detrended SS must be positive")
    assert(st.getDouble(3) <= 1.0)
    val v = run("q292_cramers_v").head()
    assert(v.getDouble(3) >= 0.0, "chi2 is non-negative")
    assert(v.getDouble(4) >= 0.0 && v.getDouble(4) <= 1.0)
    val h = run("q293_hoover_index").head()
    assert(h.getDouble(2) >= 0.0 && h.getDouble(2) <= 1.0)
  }

  test("q294: the stationary vector is a probability distribution") {
    val rows = run("q294_markov_stationary")
      .select("pi_stationary", "empirical_share").collect()
    assert(rows.nonEmpty)
    val piSum = rows.map(_.getDouble(0)).sum
    assert(math.abs(piSum - 1.0) < 1e-6,
      s"stationary mass must sum to ~1, got $piSum")
    rows.foreach(r => assert(r.getDouble(0) > 0.0 &&
      r.getDouble(1) > 0.0))
  }

  test("q295: lag percentiles are ordered min <= p50 <= p90 <= max") {
    val rows = run("q295_ship_lag")
      .select("min_lag", "p50_lag", "p90_lag", "max_lag").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getLong(0) <= r.getDouble(1) &&
        r.getDouble(1) <= r.getDouble(2) &&
        r.getDouble(2) <= r.getLong(3))
    }
  }

  test("q263: Wilson bounds bracket the point rate inside [0, 1] and " +
       "step counts are monotone") {
    val rows = run("q263_funnel_wilson")
      .select("step", "n_prev", "n_next", "p", "wilson_lo", "wilson_hi")
      .collect()
    assert(rows.length === 2)
    rows.foreach { r =>
      val (np, nn) = (r.getLong(1), r.getLong(2))
      val (p, lo, hi) =
        (r.getDouble(3), r.getDouble(4), r.getDouble(5))
      assert(nn <= np, "funnel counts must be monotone non-increasing")
      assert(lo >= 0.0 && hi <= 1.0 && lo <= p && p <= hi)
    }
  }
}
