package graft

import org.scalatest.funsuite.AnyFunSuite

/** Plan-shape assertions — the scale properties the operators are
  * designed around must be visible in the physical plan, not just
  * claimed: filter pushdown + column pruning at the scan, broadcast
  * joins for small dims, no cartesian products on the ANN paths, and the
  * one-pass SCD2 merge (2 scans, not 8).
  */
class PlanQualitySpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val dir = TestSpark.sf0001

  private def plan(name: String): String =
    SparkEntry.queries(name)(spark, dir).queryExecution.executedPlan.toString

  test("q02: filters pushed to the parquet scan, columns pruned") {
    val p = plan("q02_filter_project")
    assert(p.contains("PushedFilters: [IsNotNull(l_shipdate)"),
      "expected pushed filters at the scan")
    val readSchema = "ReadSchema: [^\n]+".r.findFirstIn(p).get
    assert(!readSchema.contains("l_comment") && !readSchema.contains("l_tax"),
      s"scan reads more columns than projected: $readSchema")
  }

  test("q03: dimension joins broadcast; no sort-merge join") {
    val p = plan("q03_region_revenue")
    assert("BroadcastHashJoin".r.findAllIn(p).length >= 2)
    assert(!p.contains("SortMergeJoin"))
  }

  test("ANN paths never fall back to a cartesian product") {
    Seq("q31_ann_bucketed", "q37_ann_ivf", "q29_embed_dups").foreach { q =>
      assert(!plan(q).contains("CartesianProduct"), s"$q has a cross join")
    }
  }

  test("q30 brute force broadcasts the probe side only") {
    assert(plan("q30_ann_bruteforce").contains("BroadcastNestedLoopJoin"))
  }

  test("q15 SCD2 merge scans each input once (one-pass merge)") {
    assert("Scan parquet".r.findAllIn(plan("q15_scd2")).length === 2)
  }

  test("q01 aggregation has a map-side partial phase") {
    val p = plan("q01_pricing_summary")
    assert(p.contains("partial_sum"), "expected partial aggregation")
  }

  test("q62 interval aggregation: prefix-grid lookups are broadcast " +
       "equi-joins, no cartesian, no data-sized nested loop") {
    // r14 plan: day-grid prefix sums + two equi-join lookups per
    // window. The only nested-loop node allowed is the 1-row bounds
    // scalar cross join (the house broadcast-scalar pattern) — the
    // window→grid lookups themselves must be broadcast HASH joins.
    val p = plan("q62_range_join")
    assert(!p.contains("CartesianProduct"), "fell back to cartesian")
    assert("BroadcastHashJoin".r.findAllIn(p).size >= 2,
      "prefix-grid lookups must be broadcast equi-joins")
    assert("BroadcastNestedLoopJoin".r.findAllIn(p).size <= 1,
      "only the 1-row bounds scalar may ride a nested loop")
  }

  test("mart star + reports: no cartesian, dimension joins broadcast") {
    Seq("q65_mart_star", "q66_mart_report_rollup",
      "q67_mart_report_cube").foreach { q =>
      val p = plan(q)
      assert(!p.contains("CartesianProduct"), s"$q has a cross join")
      assert("BroadcastHashJoin".r.findAllIn(p).nonEmpty,
        s"$q dimension join is not broadcast")
    }
  }

  test("q66 rollup: no dim_date re-join, grouping sets ride one shuffle") {
    val p = plan("q66_mart_report_rollup")
    // year_month is derived map-side from the fact's own date column; a
    // calendar re-join here was the round-6 ambiguous-self-join defect.
    // The fact is a MATERIALIZED bucketed table (its range join ran at
    // mart-load time), so the report holds exactly ONE join: the
    // product dimension — a dim_date re-join would add a second.
    assert("Join".r.findAllIn(p).length === 1,
      "expected only the product-dimension join")
    assert(p.contains("Expand"), "rollup should expand grouping sets")
    assert(p.contains("partial_sum"),
      "rollup totals need a map-side partial phase")
  }

  test("materialized mart star: the product_sk join is zero-exchange " +
       "over the bucketed tables, even when too big to broadcast") {
    // At 100 TB the dimension no longer broadcasts; the bucketed layout
    // must keep the star join shuffle-free. Force the non-broadcast plan
    // and assert no hash exchange appears anywhere in q65 (its only
    // exchange is the final orderBy's range partitioning).
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val p = plan("q65_mart_star")
      assert(p.contains("SortMergeJoin"),
        "without broadcast the star join should be sort-merge")
      assert("Exchange hashpartitioning".r.findAllIn(p).isEmpty,
        "bucketed fact⋈dim_product must not shuffle")
    } finally
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("basket family (q180/q184/q203): part-dim join is size-gated — " +
       "broadcast while small, a working shuffled join when not") {
    // The item catalog is NOT assumed bounded: with no broadcast hint,
    // Catalyst broadcasts under the threshold and falls back to a
    // shuffled join above it. Lock both plans AND that the fallback
    // computes the same rows (the scale path must be correct, not just
    // planned).
    val names = Seq("q180_basket_rules", "q184_negative_sampling",
      "q203_apriori_triples")
    names.foreach { n =>
      assert(plan(n).contains("BroadcastHashJoin"),
        s"$n: small part dim should auto-broadcast")
    }
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      names.foreach { n =>
        val p = plan(n)
        // q184's bounded brand-DOMAIN broadcasts are hinted and
        // legitimately survive; only the part-KEYED join must not
        // broadcast once the threshold is gone
        assert(!p.linesIterator.exists(l =>
            l.contains("BroadcastHashJoin") && l.contains("p_partkey")),
          s"$n: forced-low threshold must drop the part-dim broadcast")
        assert(p.contains("SortMergeJoin") || p.contains("ShuffledHashJoin"),
          s"$n: expected a shuffled join fallback")
      }
      val rows = SparkEntry.queries("q180_basket_rules")(spark, dir)
        .collect().toSeq
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
      val rowsB = SparkEntry.queries("q180_basket_rules")(spark, dir)
        .collect().toSeq
      assert(rows === rowsB,
        "q180 must return identical rows with and without the broadcast")
    } finally
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("q68 PNG decode is map-only after the parallelize repartition") {
    val p = plan("q68_png_decode")
    assert(!p.contains("SortMergeJoin") && !p.contains("CartesianProduct"))
    assert("Exchange hashpartitioning".r.findAllIn(p).isEmpty,
      "decode path should not shuffle by key")
  }

  test("q69 JPEG tolerance join: equi-join on media_id, no cartesian") {
    val p = plan("q69_jpeg_decode")
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoopJoin"),
      "decoded-vs-expected compare must be an equi-join")
  }

  test("q70 bloom dedup: might_contain gates map-side, residual join " +
       "is the only join") {
    val p = plan("q70_bloom_dedup")
    assert(p.contains("might_contain"),
      "bloom gate must appear as a native filter expression")
    assert(!p.contains("CartesianProduct"))
    // one anti-join for the residual; the definitely-new leg is join-free
    assert("LeftAnti".r.findAllIn(p).length === 1,
      "expected exactly one residual anti-join")
  }

  test("q77 centroids shuffle partial sums, never vectors") {
    val p = plan("q77_embed_centroids")
    assert(p.contains("partial_sum"),
      "per-dim means need map-side partial aggregation")
    assert(!p.contains("CartesianProduct") && !p.contains("SortMergeJoin"))
  }

  test("q80 funnel: filtered aggregates join on user_id, no cartesian") {
    val p = plan("q80_funnel")
    assert(!p.contains("CartesianProduct"))
    assert(p.contains("PushedFilters"),
      "event_type filters should reach the scan")
  }

  test("q76 vocab top-N plans as TakeOrdered, never a full global sort") {
    val p = plan("q76_vocab_topn")
    assert(p.contains("TakeOrderedAndProject"),
      "top-N must ride per-partition heaps")
    assert(p.contains("partial_count"),
      "token counts need a map-side partial phase")
  }

  test("q71 keyword search: postings filtered before the doc aggregate") {
    val p = plan("q71_keyword_search")
    assert(!p.contains("SortMergeJoin") && !p.contains("CartesianProduct"),
      "conjunctive search must be a filter+aggregate, not a join")
    assert(p.contains("partial_count"),
      "term hits need a map-side partial aggregate")
  }

  test("q89 BM25: df/stats broadcast, postings never cartesian, " +
       "top-N planned as TakeOrdered") {
    val p = plan("q89_bm25")
    assert(!p.contains("CartesianProduct"), "BM25 must not cross join")
    assert(p.contains("BroadcastHashJoin") ||
      p.contains("BroadcastNestedLoopJoin"),
      "term df / corpus stats must broadcast")
    assert(p.contains("TakeOrdered"),
      "depth-limited ranking must avoid a global sort")
  }

  test("q90 stratified sample plans on the custom per-key top-k heap") {
    assert(plan("q90_stratified_sample").contains("TopKPerKey"),
      "per-stratum selection must use the heap operator, not a window sort")
  }

  test("q93 centroid similarity enumerates pairs via the dim equi-join") {
    val p = plan("q93_centroid_similarity")
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoopJoin"),
      "pair enumeration must stay an equi-join on dim")
  }

  test("q86 salted join: equi-join on (key, salt), no cartesian") {
    val p = plan("q86_skew_join")
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoopJoin"),
      "salted join must stay an equi-join")
    assert(p.contains("__salt"), "join keys must carry the salt")
  }

  test("q87/q88 image decodes are map-only after the parallelize " +
       "repartition (one shuffle, no join on the decode path)") {
    Seq("q87_gif_decode", "q88_bmp_decode").foreach { q =>
      val p = plan(q)
      assert(!p.contains("SortMergeJoin") && !p.contains("CartesianProduct"),
        s"$q decode path must not join")
    }
  }

  test("q101 chunking generates windows map-side: no join anywhere") {
    val p = plan("q101_chunking")
    assert(!p.contains("Join") && !p.contains("CartesianProduct"),
      "chunk starts must come from explode(sequence), not a join")
    assert(p.contains("Generate"), "expected the explode generator")
  }

  test("q102 normalize runs the native expression inside codegen") {
    val p = plan("q102_normalize_text")
    assert(p.contains("graft_normalize_text"),
      "expected the native expression, not a chain of string ops")
    assert(!p.contains("Join"))
  }

  test("q103 span dedup joins on the span key only — no broadcast of " +
       "the span table, no cartesian") {
    val p = plan("q103_span_dedup")
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoopJoin"))
    assert(p.contains("hashpartitioning(sh"),
      "the span key must be the shuffle key")
  }

  test("q105 fuzzy join is an equi-join on the block key, never a " +
       "nested loop; the id inequality rides as a join residual") {
    val p = plan("q105_fuzzy_join")
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoopJoin"),
      "blocked fuzzy join must hash/sort-merge on (source, lang)")
  }

  test("q106 ppjoin: every join is keyed (shingle or doc id) — no " +
       "cartesian, no nested loop anywhere in the prefix-filtered plan") {
    val p = plan("q106_ppjoin")
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoopJoin"),
      "prefix filter exists to avoid unkeyed joins; the plan must show it")
  }

  test("q106/q28 verify: hash GATE on the 8-byte payload + exact " +
       "confirm behind a survivor-sized broadcast (the r16 exchange " +
       "fix) — the corpus arrays never cross an exchange") {
    Seq("q106_ppjoin", "q28_ngram_jaccard").foreach { q =>
      val p = plan(q)
      assert(p.contains("graft_sorted_long_intersect_count"),
        s"$q: the verify gate must merge the hashed payload")
      // the gate filter is inlined into the join CONDITION in the
      // single-reference (tDen+tNum) form: exactly one merge per
      // candidate (two references would double the gate CPU)
      assert("graft_sorted_long_intersect_count".r.findAllIn(p).length
        === 1, s"$q: gate merge must be evaluated once per candidate")
      assert(p.contains("graft_ppjoin_verify"),
        s"$q: the exact-confirm stage (collision observe) must run")
      // the exact struct intersect is folded into the confirm
      // aggregate's result projection (its pretty name does not print);
      // the observe + the side-reuniting first() aggregate witness it
      assert(p.contains("first(CASE WHEN is_a"),
        s"$q: confirm must reunite the two broadcast-attached sides")
      assert(!p.contains("CartesianProduct") &&
        !p.contains("BroadcastNestedLoopJoin"), s"$q unkeyed join")
    }
  }

  test("q28 executes the prefix-filtered plan, not the naive " +
       "every-shingle inverted index (superlinear at sf3)") {
    val p = plan("q28_ngram_jaccard")
    // the naive index's observable signature is its posting-bucket
    // metric; the prefix plan's is the verify metric
    assert(!p.contains("graft_dedup_buckets_ngram"),
      "q28 must not execute the naive posting-list index")
    assert(p.contains("graft_ppjoin_verify"),
      "q28 must execute the PPJoin verify (prefix-filtered plan)")
  }

  test("q107 MAD: the 5-row median/MAD tables broadcast back onto " +
       "events; the events table is never self-joined") {
    val p = plan("q107_mad_outliers")
    assert("BroadcastHashJoin".r.findAllIn(p).length >= 2,
      "med and mad must join back as broadcasts")
    assert(!p.contains("CartesianProduct"))
  }

  test("q108 textrank: the rank fixpoint runs driver-side over the " +
       "collected bounded graph (r16) — the final plan is a local " +
       "relation, never a corpus join chain") {
    val p = plan("q108_textrank")
    assert(!p.contains("CartesianProduct"))
    assert(p.contains("LocalTableScan"),
      "ranks must assemble from the driver-computed control table")
    assert(!p.contains("Scan parquet"),
      "the corpus passes live in cooccurLocal, not the final plan")
  }

  test("q109 video frames: one corpus scan through a narrow codec " +
       "pipeline — no join, no aggregation shuffle") {
    val p = plan("q109_video_frames")
    assert(!p.contains("Join"), "frame sampling is per-row, joins mean " +
      "the pipeline lost its narrow shape")
    assert("Scan parquet".r.findAllIn(p).length <= 1)
  }

  test("q110 bfs: the relaxation runs driver-side over the collected " +
       "bounded graph (r16) — the final plan is a local relation with " +
       "no corpus scan") {
    val p = plan("q110_bfs_hops")
    assert(!p.contains("CartesianProduct"))
    assert(p.contains("LocalTableScan"),
      "hops must assemble from the driver-computed control table")
    assert("Scan parquet".r.findAllIn(p).length === 0,
      "the corpus passes live in cooccurLocal, not the final plan")
  }

  test("q111 markov: one window shuffle; the row-total join broadcasts") {
    val p = plan("q111_markov_transitions")
    assert(p.contains("BroadcastHashJoin"),
      "the ≤|event_type|-row totals must broadcast")
    assert(!p.contains("SortMergeJoin") && !p.contains("CartesianProduct"))
  }

  test("q112 OLS: pure window + same-key regroup — no join anywhere") {
    val p = plan("q112_groupwise_ols")
    assert(!p.contains("Join"), "the sufficient statistics are window " +
      "aggregates; a join means the shape regressed")
    assert("Scan parquet".r.findAllIn(p).length <= 1)
  }

  test("q113 count-min: the sketch and probe tables are checkpointed " +
       "and the lookup joins broadcast — no sort-merge on a ≤d·w table") {
    val p = plan("q113_countmin")
    assert("BroadcastHashJoin".r.findAllIn(p).length >= 2,
      "sketch lookup + exact-count attach must both broadcast")
    assert(!p.contains("SortMergeJoin") && !p.contains("CartesianProduct"))
    assert("Scan parquet".r.findAllIn(p).length === 0,
      "both bounded inputs are checkpointed; the probe plan must not " +
      "re-scan the corpus")
  }

  test("q115 phrase search: the term filter lands BELOW the window " +
       "shuffle (postings merge, not a corpus sort) and there is no " +
       "join at all") {
    val p = plan("q115_phrase_search")
    assert(!p.contains("Join"),
      "adjacency via lead — a positions self-join would shuffle " +
      "the corpus twice")
    assert("Scan parquet".r.findAllIn(p).length === 1)
    val shuffleIdx = p.indexOf("Exchange")
    val filterIdx = p.lastIndexOf("isin") max p.lastIndexOf("IN (")
    assert(shuffleIdx >= 0 && filterIdx > shuffleIdx,
      "the two-term filter must appear below (after, in explain " +
      "order) the window exchange")
  }

  test("q114 priority sample: TakeOrderedAndProject, one scan, no " +
       "shuffle-and-sort of the corpus") {
    val p = plan("q114_priority_sample")
    assert(p.contains("TakeOrderedAndProject"),
      "weighted top-k must use per-partition heaps")
    assert(!p.contains("Join"))
    assert("Scan parquet".r.findAllIn(p).length === 1)
  }

  test("JoinEliminate on the BUCKETED mart: a BI-generated star query " +
       "drops every unconsumed dim join; inner joins are declined") {
    // BI generators emit every dim join unconditionally and rely on the
    // engine to drop the unused ones — prove the rule does it on the
    // real materialized star (bucketed parquet tables), not just a
    // synthetic fixture.
    import java.sql.Date
    import org.apache.spark.sql.functions._
    import graft.etl.Scd2
    import graft.mart.Mart
    import graft.plans.JoinEliminate
    val spark2 = spark
    import spark2.implicits._

    val attrs = Seq("product_name", "brand")
    val dw = Seq(
      ("A", "prod a", "b1", 10L, 5L), ("B", "prod b", "b2", 20L, 7L))
      .toDF("natural_key", "product_name", "brand", "price",
        "quantity_available")
      .withColumn("dt_load_to_dw", lit(Date.valueOf("2021-03-01")))
      .withColumn("dt_last_update", lit(Scd2.Sentinel))
    val star = Mart.materializeStar(spark,
      Mart.build(spark, dw, attrs, Seq("price", "quantity_available"),
        Date.valueOf("2021-03-01"), Date.valueOf("2021-03-05")),
      "mart_joinelim")

    // the generated shape: fact LEFT JOIN every dim, selection varies
    def biQuery(cols: Seq[String]) = star.fact
      .join(star.dimProduct, star.fact("product_sk") ===
        star.dimProduct("product_sk"), "left_outer")
      .join(star.dimDate, star.fact("date_sk") ===
        star.dimDate("date_sk"), "left_outer")
      .select(cols.map(col): _*)

    spark.experimental.extraOptimizations =
      spark.experimental.extraOptimizations :+ JoinEliminate
    spark.conf.set(JoinEliminate.ConfKey, "product_sk,date_sk")
    try {
      val factOnly = biQuery(Seq("price", "quantity_available"))
      assert(!factOnly.queryExecution.optimizedPlan.toString
        .contains("Join"),
        "both unconsumed dim joins must be eliminated")
      // result equivalence against the no-rule plan
      val expected = star.fact.select("price", "quantity_available")
        .collect().map(_.toSeq).toSet
      assert(factOnly.collect().map(_.toSeq).toSet === expected)

      val oneDim = biQuery(Seq("brand", "price"))
      assert("Join".r.findAllIn(
        oneDim.queryExecution.optimizedPlan.toString).length === 1,
        "a consumed dim survives; the unconsumed one is dropped")

      val inner = star.fact
        .join(star.dimProduct, star.fact("product_sk") ===
          star.dimProduct("product_sk"))
        .select(star.fact("price"))
      assert(inner.queryExecution.optimizedPlan.toString.contains("Join"),
        "inner joins filter unmatched rows — never eliminated")
    } finally {
      spark.conf.unset(JoinEliminate.ConfKey)
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations
          .filterNot(_ == JoinEliminate)
    }
  }

  test("groupedPrefixSumsByRange: data path range-partitioned, only the " +
       "bounded per-group offsets ride a broadcast (contract: bounded " +
       "group count)") {
    import org.apache.spark.sql.functions._
    // AQE's small-data partition coalescing would legally collapse the
    // tiny 10k-row fixture's data exchange to 1 — at real volume the
    // advisory size keeps it wide. Disable coalescing so the assertion
    // sees the declared 8-way shape, which is what survives scale-up.
    val prevCoalesce =
      spark.conf.getOption("spark.sql.adaptive.coalescePartitions.enabled")
    spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "false")
    try {
    val df = spark.range(0, 10000)
      .select((col("id") % 7).as("g"), col("id").as("o"), lit(1L).as("v"))
    val out = graft.ext.Hypothesis.groupedPrefixSumsByRange(
      df, "g", "o", Seq("v"), 8)
    val p = out.queryExecution.executedPlan.toString
    // the range exchange itself sits behind prefixSumsByRange's
    // localCheckpoint (plan truncated there by design, erasing its
    // partitioning from Catalyst's view): the data-side window re-keys
    // on _pid at spark.sql.shuffle.partitions width. The invariant that
    // survives scale-up is that the data path is WIDE — never a single
    // funnel task — while only the two bounded offsets frames are
    // allowed their SinglePartition window.
    assert(out.rdd.getNumPartitions > 1,
      "data path funneled into a single partition")
    // exactly two broadcasts, both of the bounded sides the scaladoc
    // contract names: the numPartitions-row per-partition offsets and
    // the |groups|-row per-group offsets — nothing data-sized
    assert("BroadcastExchange".r.findAllIn(p).length === 2,
      "expected exactly the two bounded offsets broadcasts")
    assert(!p.contains("SortMergeJoin"),
      "offsets must join as broadcasts, not shuffles")
    assert(!p.contains("CartesianProduct"))
    // correctness of the composite shape: per-group running count == rank
    val bad = out.filter(col("cum_v") =!=
        (col("o") - col("g")) / 7 + 1).count()
    assert(bad === 0, s"$bad rows with wrong grouped prefix sum")
    } finally {
      prevCoalesce match {
        case Some(v) => spark.conf.set(
          "spark.sql.adaptive.coalescePartitions.enabled", v)
        case None => spark.conf.unset(
          "spark.sql.adaptive.coalescePartitions.enabled")
      }
    }
  }
}
