package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.ext.{Sketches, Skew}
import graft.sources.Bucketing

/** Scale features: bucketed co-located joins (no exchange in the plan),
  * salted aggregation (same results, bounded reducers), and scan-pruning
  * proofs — the plan must READ only what the query needs, asserted on the
  * scan node's own file/partition listing rather than trusted from docs.
  */
class ScaleFeaturesSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  /** All parquet file-source scans in a physical plan, descending into
    * AQE wrapper nodes (which are leaves to `collect`).
    */
  private def fileScans(plan: org.apache.spark.sql.execution.SparkPlan)
      : Seq[org.apache.spark.sql.execution.FileSourceScanExec] = {
    import org.apache.spark.sql.execution.FileSourceScanExec
    import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
    plan.collect { case f: FileSourceScanExec => f } ++
      plan.collect { case a: AdaptiveSparkPlanExec => a }
        .flatMap(a => fileScans(a.executedPlan))
  }

  private def parquetFilesUnder(dir: java.nio.file.Path): Long = {
    val s = java.nio.file.Files.walk(dir)
    try s.filter(p => p.toString.endsWith(".parquet")).count()
    finally s.close()
  }

  test("joining two tables bucketed on the key needs no shuffle") {
    val orders = Tables.load(spark, TestSpark.sf0001, "orders")
    val customer = Tables.load(spark, TestSpark.sf0001, "customer")
    Bucketing.writeBucketed(orders, "orders_b", "o_custkey", 4,
      Seq("o_custkey"))
    Bucketing.writeBucketed(
      customer.withColumnRenamed("c_custkey", "o_custkey"),
      "customer_b", "o_custkey", 4, Seq("o_custkey"))

    val joined = Bucketing.table(spark, "orders_b")
      .join(Bucketing.table(spark, "customer_b").hint("merge"), "o_custkey")
    assert(Bucketing.isShuffleFree(joined),
      s"bucketed join should not shuffle:\n" +
        joined.queryExecution.executedPlan.toString.take(2000))
    // and it still computes the right thing
    val expected = orders.join(
      customer.withColumnRenamed("c_custkey", "o_custkey"), "o_custkey")
    assert(joined.count() === expected.count())
  }

  test("SCD2 merge over same-key bucketed tables plans with zero shuffles") {
    import spark.implicits._
    import java.sql.Date
    val d1 = Date.valueOf("2024-01-01")
    val d2 = Date.valueOf("2024-01-02")
    val dim0 = Seq(("a", 1, "x"), ("b", 2, "y"))
      .toDF("natural_key", "price", "brand")
      .withColumn(
        "dt_load_to_dw", org.apache.spark.sql.functions.lit(d1))
      .withColumn("dt_last_update",
        org.apache.spark.sql.functions.lit(graft.etl.Scd2.Sentinel))
    val snap = Seq(("a", 5, "x"), ("c", 3, "z"))
      .toDF("natural_key", "price", "brand")
    Bucketing.writeBucketed(dim0, "dw_cur_b", "natural_key", 4,
      Seq("natural_key"))
    Bucketing.writeBucketed(snap, "snap_b", "natural_key", 4,
      Seq("natural_key"))

    val prevThreshold =
      spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val merged = graft.etl.Scd2.merge(
        spark.table("dw_cur_b"), spark.table("snap_b"),
        "natural_key", Seq("price", "brand"), d2)
      assert(Bucketing.isShuffleFree(merged),
        "bucketed SCD2 merge should join without an exchange:\n" +
          merged.queryExecution.executedPlan.toString.take(2000))
      // a closed + a' open + b open + c open
      assert(merged.count() === 4)
      assert(merged.filter(col("dt_last_update") ===
        lit(graft.etl.Scd2.Sentinel)).count() === 3)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
    }
  }

  test("incremental SCD2 merge scans ONLY the committed open set — " +
       "file pruning asserted on the scan node, not assumed") {
    import spark.implicits._
    import java.sql.Date
    import graft.etl.Scd2
    val path = java.nio.file.Files.createTempDirectory("dw_prune").toString
    val tracked = Seq("price", "brand")
    def snap(rows: (String, Int, String)*) =
      rows.toDF("natural_key", "price", "brand")
    Scd2.mergeInPlace(spark, path, snap(("a", 1, "x"), ("b", 2, "y")),
      "natural_key", tracked, Date.valueOf("2024-01-01"))
    Scd2.mergeInPlace(spark, path,
      snap(("a", 5, "x"), ("b", 2, "y"), ("c", 3, "z")),
      "natural_key", tracked, Date.valueOf("2024-01-02"))
    Scd2.mergeInPlace(spark, path,
      snap(("a", 5, "x"), ("b", 9, "y"), ("c", 3, "z")),
      "natural_key", tracked, Date.valueOf("2024-01-03"))

    val st = Scd2.currentState(spark, path).get
    val dataDir = java.nio.file.Paths.get(path, "data")
    val allFiles = parquetFilesUnder(dataDir)
    val curFiles = parquetFilesUnder(dataDir.resolve(st.curDir.get))
    // pruning must be MEANINGFUL: history + superseded open sets hold
    // real parquet the merge-side scan is expected to skip
    assert(st.histDirs.nonEmpty && allFiles > curFiles,
      s"fixture too small to prove pruning: $allFiles total / $curFiles cur")

    // the merge's only table-data read (mergeInPlace scans readCurrent)
    val cur = Scd2.readCurrent(spark, path)
    val scans = fileScans(cur.queryExecution.executedPlan)
    assert(scans.size === 1, "open-set read must be a single parquet scan")
    assert(scans.head.selectedPartitions.totalNumberOfFiles === curFiles,
      "merge-side scan must list exactly the committed open set's files")
  }

  test("date-partitioned star fact: a one-day slice reads exactly one " +
       "partition (the q65 slice at 100x scale)") {
    import spark.implicits._
    import java.sql.Date
    import graft.etl.Scd2
    import graft.mart.Mart
    val attrs = Seq("product_name", "brand")
    val measures = Seq("price", "quantity_available")
    val d0 = Seq(("A", "prod a", "b1", 10L, 5L), ("B", "prod b", "b2", 20L, 7L))
      .toDF("natural_key" +: attrs ++: measures: _*)
      .withColumn("dt_load_to_dw", lit(Date.valueOf("2021-03-01")))
      .withColumn("dt_last_update", lit(Scd2.Sentinel))
    val snap2 = Seq(("A", "prod a", "b1", 99L, 5L), ("B", "prod b", "b2", 20L, 7L))
      .toDF("natural_key" +: attrs ++: measures: _*)
    val dw = Scd2.merge(d0, snap2, "natural_key", attrs ++ measures,
      Date.valueOf("2021-03-10"))
    val star = Mart.build(spark, dw, attrs, measures,
      Date.valueOf("2021-03-01"), Date.valueOf("2021-03-15"))

    val dir = java.nio.file.Files.createTempDirectory("fact_bydate").toString
    star.fact.write.partitionBy("date_sk").mode("overwrite").parquet(dir)
    val lastDay = spark.read.parquet(dir).agg(max("date_sk")).head().get(0)

    val slice = spark.read.parquet(dir).filter(col("date_sk") === lit(lastDay))
    val scan = fileScans(slice.queryExecution.executedPlan).head
    assert(scan.selectedPartitions.partitionCount === 1,
      "a one-day predicate must prune the scan to one partition:\n" +
        scan.toString.take(1500))
    val full = fileScans(
      spark.read.parquet(dir).queryExecution.executedPlan).head
    assert(full.selectedPartitions.partitionCount === 15,
      "unfiltered fixture spans 15 day-partitions")
    assert(slice.count() === 2, "one row per product on the sliced day")
  }

  test("dynamic partition pruning: a dim-side filter prunes fact " +
       "partitions at RUNTIME through the join — the 100-TB star-join " +
       "path where the pruning key is only known after the dim filter") {
    import spark.implicits._
    val factDir =
      java.nio.file.Files.createTempDirectory("fact_dpp").toString
    val dimDir =
      java.nio.file.Files.createTempDirectory("dim_dpp").toString
    (1 to 1000).map(i => (i.toLong, i % 20)).toDF("m", "part_k")
      .write.partitionBy("part_k").mode("overwrite").parquet(factDir)
    (0 until 20).map(k => (k, s"name-$k")).toDF("k", "name")
      .write.mode("overwrite").parquet(dimDir)
    // dim filter selects 2 of 20 partition keys — but only at runtime:
    // the fact-side predicate is on the JOIN, not on part_k directly.
    // The fixture fact is tiny, so pin the planner's benefit estimate
    // (real facts dwarf the broadcast; the heuristic exists for the
    // borderline cases, not this one).
    val saved = spark.conf.getOption(
      "spark.sql.optimizer.dynamicPartitionPruning.useStats")
    spark.conf.set(
      "spark.sql.optimizer.dynamicPartitionPruning.useStats", "false")
    try {
      val dim = spark.read.parquet(dimDir)
      val fact = spark.read.parquet(factDir)
      val q = fact.join(dim.filter(col("name").isin("name-3", "name-7")),
        fact("part_k") === dim("k"))
      assert(q.queryExecution.executedPlan.toString
        .contains("dynamicpruning"),
        "the fact scan must carry a dynamicpruning subquery predicate")
      assert(q.count() === 100L, "2 of 20 keys x 50 rows each")
      val scans = fileScans(q.queryExecution.executedPlan)
        .filter(_.output.exists(_.name == "m"))
      assert(scans.nonEmpty)
      assert(scans.head.metrics("numFiles").value <=
        scans.head.relation.location.inputFiles.length / 5,
        "runtime pruning must skip the filtered-out partitions' files")
    } finally {
      saved match {
        case Some(v) => spark.conf.set(
          "spark.sql.optimizer.dynamicPartitionPruning.useStats", v)
        case None => spark.conf.unset(
          "spark.sql.optimizer.dynamicPartitionPruning.useStats")
      }
    }
  }

  test("runtime bloom-filter join pruning: a selective dim filter " +
       "row-filters the fact side of a shuffle join before the " +
       "exchange — the non-partitioned complement of DPP") {
    import spark.implicits._
    val factDir =
      java.nio.file.Files.createTempDirectory("fact_bloom").toString
    val dimDir =
      java.nio.file.Files.createTempDirectory("dim_bloom").toString
    // NOT partitioned by the key: DPP cannot help here, only the
    // runtime row filter can.
    (1 to 5000).map(i => (i.toLong, (i % 100).toLong)).toDF("m", "fk")
      .write.mode("overwrite").parquet(factDir)
    (0 until 100).map(k => (k.toLong, s"name-$k")).toDF("k", "name")
      .write.mode("overwrite").parquet(dimDir)
    val confs = Seq(
      "spark.sql.autoBroadcastJoinThreshold" -> "-1", // force shuffle join
      // the fixture is tiny; drop the size heuristics that gate the
      // rewrite on real clusters
      "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold" ->
        "10GB",
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold"
        -> "0",
      "spark.sql.optimizer.runtime.bloomFilter.enabled" -> "true")
    val saved = confs.map { case (k, _) => k -> spark.conf.getOption(k) }
    confs.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      val dim = spark.read.parquet(dimDir)
      val fact = spark.read.parquet(factDir)
      val q = fact.join(dim.filter(col("name").isin("name-3", "name-7")),
        fact("fk") === dim("k"))
      val plan = q.queryExecution.executedPlan.toString
      assert(plan.contains("might_contain"),
        s"expected a runtime bloom filter on the fact side in:\n$plan")
      assert(q.count() === 100L, "2 of 100 keys x 50 rows each")
    } finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  test("z-order layout: 2-d box predicates touch fewer files than a " +
       "single-column sort (zone-map pruning, q96's claim)") {
    val nFiles = 32
    val raw = Tables.load(spark, TestSpark.sf0001, "orders")
      .withColumn("x", col("o_custkey").cast("long"))
      .withColumn("y", unix_date(to_date(col("o_orderdate"))).cast("long"))
    // normalize both dims to 10 bits (q96's arithmetic) so neither
    // dimension owns the interleave's high bits
    val st = raw.agg(min("x"), max("x"), min("y"), max("y")).head()
    val (xm, xs) = (st.getLong(0), st.getLong(1) - st.getLong(0) + 1)
    val (ym, ysn) = (st.getLong(2), st.getLong(3) - st.getLong(2) + 1)
    val o = raw
      .withColumn("xn", expr(s"((x - $xm) * 1024) div $xs"))
      .withColumn("yn", expr(s"((y - $ym) * 1024) div $ysn"))
    val z = (0 until 10).map(i =>
      (shiftright(col("xn"), i).bitwiseAND(lit(1L)) * lit(1L << (2 * i))) +
        (shiftright(col("yn"), i).bitwiseAND(lit(1L)) *
          lit(1L << (2 * i + 1)))).reduce(_ + _)
    def zoneBoxes(order: org.apache.spark.sql.Column) = {
      val w = org.apache.spark.sql.expressions.Window
        .orderBy(order, col("o_orderkey"))
      o.withColumn("f", ntile(nFiles).over(w)).groupBy("f")
        .agg(min("x").as("x0"), max("x").as("x1"),
          min("y").as("y0"), max("y").as("y1"))
        .collect()
        .map(r => (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    }
    val zZones = zoneBoxes(z)
    val linZones = zoneBoxes(col("x"))
    // predicate workload: a 4x4 grid of ~25%-of-domain boxes
    def boxes(lo: Long, hi: Long) = {
      val span = hi - lo + 1
      (0 until 4).map(i => (lo + i * span / 4, lo + i * span / 4 + span / 4))
    }
    val workload = for (bx <- boxes(xm, xm + xs - 1);
                        by <- boxes(ym, ym + ysn - 1))
      yield (bx, by)
    def touched(zones: Array[(Long, Long, Long, Long)]) = workload.map {
      case ((bx0, bx1), (by0, by1)) => zones.count { case (x0, x1, y0, y1) =>
        x0 <= bx1 && x1 >= bx0 && y0 <= by1 && y1 >= by0
      }
    }.sum
    val zT = touched(zZones); val linT = touched(linZones)
    // the custkey-only sort leaves y spanning the whole domain in every
    // file: all 2-d boxes touch ~every file. Z-order must do strictly
    // better across the workload.
    assert(zT < linT, s"z-order touched $zT files vs linear $linT")
    assert(zT.toDouble / linT <= 0.6,
      s"expected >=40% pruning win, got z=$zT lin=$linT")
  }

  test("salted aggregation equals plain aggregation") {
    val ev = Tables.load(spark, TestSpark.sf0001, "events")
    val salted = Skew.saltedAgg(ev, Seq("event_type"), col("event_id"),
      col("value"), salts = 8)
    val plain = ev.groupBy("event_type")
      .agg(count(lit(1)).as("n"), sum(col("value").cast("double")).as("total"))
    val diff = salted.alias("s").join(plain.alias("p"), "event_type")
      .filter(col("s.n") =!= col("p.n") ||
        abs(col("s.total") - col("p.total")) > 1e-6)
    assert(diff.isEmpty)
    assert(salted.count() === plain.count())
  }

  test("salted join equals the plain join and shuffles on (key, salt) — " +
       "no single-partition straggler on a hot key") {
    val ev = Tables.load(spark, TestSpark.sf0001, "events")
    val dim = ev.groupBy("event_type")
      .agg(count(lit(1)).as("type_n"), avg("value").as("type_avg"))
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val salted = Skew.saltedJoin(ev, dim, "event_type",
        col("event_id"), salts = 8)
      val plain = ev.join(dim, "event_type")
      assert(salted.exceptAll(plain).isEmpty &&
        plain.exceptAll(salted).isEmpty)
      // the big side's exchange must carry the salt: the hot key's rows
      // land on 8 reducers, not 1
      val planStr = salted.queryExecution.executedPlan.toString
      assert(planStr.contains("__salt"),
        s"salted join must partition on the salt:\n${planStr.take(2000)}")
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
    }
  }

  test("hot-key split join equals the plain join; the hot path is a " +
       "broadcast join") {
    val ev = Tables.load(spark, TestSpark.sf0001, "events")
    val dim = ev.groupBy("event_type")
      .agg(count(lit(1)).as("type_n"))
    // the genuinely hottest key, derived from data — not a guess
    val hot = ev.groupBy("event_type").count()
      .orderBy(col("count").desc).head().getString(0)
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val split = Skew.hotKeySplitJoin(ev, dim, "event_type", Seq(hot))
      val plain = ev.join(dim, "event_type")
      assert(split.exceptAll(plain).isEmpty && plain.exceptAll(split).isEmpty)
      // even with auto-broadcast off, the hot branch is an explicit
      // broadcast: the hot key never rides a shuffle
      assert(split.queryExecution.executedPlan.toString
        .contains("BroadcastHashJoin"),
        "hot branch must plan as a broadcast join")
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
    }
  }

  test("per-group KMV: exact below k, tight estimate above, planned on " +
       "the custom top-k operator") {
    import spark.implicits._
    // 3 groups: 20, 200, 1000 distinct values (k = 64 splits them)
    val rows = Seq(("a", 20), ("b", 200), ("c", 1000)).flatMap {
      case (g, n) => (0 until n).map(v => (g, s"$g-$v"))
    }
    val df = rows.toDF("grp", "v")
    val out = Sketches.kmvDistinctByGroup(df, "grp", col("v"), 64)
    assert(out.queryExecution.executedPlan.toString.contains("TopKPerKey"),
      "k-minima selection must plan on the custom heap operator")
    val got = out.collect().map(r =>
      r.getAs[String]("grp") ->
        (r.getAs[Long]("k_actual"), r.getAs[Double]("distinct_estimate")))
      .toMap
    assert(got("a") === ((20L, 20.0)), "below k the sketch is exact")
    assert(got("b")._1 === 64L && math.abs(got("b")._2 - 200) / 200.0 < 0.35)
    assert(got("c")._1 === 64L && math.abs(got("c")._2 - 1000) / 1000.0 < 0.35)
  }

  test("count-min sketch: bounded grid, one-sided error (est ≥ exact " +
       "for EVERY value), exact when width swallows the domain, and the " +
       "probe join broadcasts") {
    val spark2 = spark
    import spark2.implicits._
    val rows = Seq("a" -> 500, "b" -> 100, "c" -> 20, "d" -> 3, "e" -> 1)
      .flatMap { case (v, n) => Seq.fill(n)(v) }
    val df = rows.toDF("v")
    val cms = Sketches.countMin(df, col("v"), depth = 4, width = 64)
    assert(cms.count() <= 4L * 64L, "sketch size is bounded by d×w")
    val probes = df.distinct()
    val est = Sketches.countMinEstimate(cms, probes, "v", 4, 64)
    assert(est.queryExecution.executedPlan.toString
      .contains("BroadcastHashJoin"), "sketch lookup must broadcast")
    val got = est.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val exact = rows.groupBy(identity).view.mapValues(_.size.toLong).toMap
    exact.foreach { case (v, n) =>
      assert(got(v) >= n, s"$v: CMS may never undercount")
    }
    // 5 values into 4 independent 64-bucket rows: the min over rows is
    // collision-free here, so the sketch is exact on this domain
    assert(got === exact)
    // unseen value estimates 0 (all four rows hit empty buckets) unless
    // it collides everywhere — with 5 values in 64 buckets it does not
    val unseen = Sketches.countMinEstimate(cms,
      Seq("zzz").toDF("v"), "v", 4, 64).collect().head.getLong(1)
    assert(unseen === 0L)
  }
}
