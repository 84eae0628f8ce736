package graft

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.plans.MvRewrite

/** Materialized-aggregate rewrite: a rollup over the registered base
  * scan is answered from the MV (plan scans the MV path, not the base),
  * results are bit-identical to the unrewritten query, the original
  * result types survive (decimal SUM-of-SUMs cast back), and every
  * scope guard (filter, undeclared column, AVG, DISTINCT, conf off)
  * declines the rewrite.
  */
class MvRewriteSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  // A small fact table written to parquet: the rule matches on the
  // relation's qualified root path, so both base and MV must be real
  // file scans.
  private lazy val baseDir = {
    val dir = Files.createTempDirectory("mv_base").toFile
    dir.deleteOnExit()
    val p = dir.getAbsolutePath + "/fact"
    val s2 = spark
    import s2.implicits._
    (1 to 1000).map { i =>
      (s"r${i % 7}", i % 13, i.toLong, BigDecimal(i).setScale(2) * 3)
    }.toDF("region", "day", "qty", "amount")
      .withColumn("amount", col("amount").cast("decimal(12,2)"))
      .write.mode("overwrite").parquet(p)
    p
  }

  private lazy val mvDir = {
    val p = baseDir + "_mv"
    spark.read.parquet(baseDir)
      .groupBy("region", "day")
      .agg(sum("qty").as("sum_qty"), sum("amount").as("sum_amount"),
        min("qty").as("min_qty"), max("qty").as("max_qty"),
        count(lit(1)).as("cnt"))
      .write.mode("overwrite").parquet(p)
    p
  }

  private def withMv[A](f: => A): A = {
    MvRewrite.register(baseDir, spark.read.parquet(mvDir),
      groupCols = Seq("region", "day"),
      sumCols = Map("qty" -> "sum_qty", "amount" -> "sum_amount"),
      minCols = Map("qty" -> "min_qty"),
      maxCols = Map("qty" -> "max_qty"),
      countCol = Some("cnt"))
    spark.experimental.extraOptimizations =
      spark.experimental.extraOptimizations :+ MvRewrite
    spark.conf.set(MvRewrite.ConfKey, "true")
    try f finally {
      spark.conf.unset(MvRewrite.ConfKey)
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations.filterNot(_ == MvRewrite)
      MvRewrite.clear()
    }
  }

  private def base: DataFrame = spark.read.parquet(baseDir)

  // logical-level check: AQE hides the physical scan behind
  // AdaptiveSparkPlanExec, so collect the relations off optimizedPlan
  private def scansMv(df: DataFrame): Boolean = {
    val files = df.queryExecution.optimizedPlan.collect {
      case l: org.apache.spark.sql.execution.datasources.LogicalRelation =>
        l.relation match {
          case fs: org.apache.spark.sql.execution.datasources.HadoopFsRelation =>
            fs.location.rootPaths.map(_.toString)
          case _ => Seq.empty[String]
        }
    }.flatten
    files.nonEmpty && files.forall(_.contains("_mv"))
  }

  private def rollup(df: DataFrame): DataFrame = df
    .groupBy("region")
    .agg(sum("qty").as("s"), sum("amount").as("sa"),
      min("qty").as("mn"), max("qty").as("mx"), count(lit(1)).as("c"))

  test("a grouping-subset rollup is answered from the MV scan with " +
       "identical rows, schema, and result types") {
    val expect = rollup(base)
    val expectRows = expect.collect().map(_.toSeq).toSet
    val expectSchema = expect.schema
    withMv {
      val q = rollup(base)
      assert(scansMv(q), "optimized plan must scan the MV, not the base:\n" +
        q.queryExecution.executedPlan)
      assert(q.schema === expectSchema,
        "rewrite must preserve result types (decimal sum-of-sums cast back)")
      assert(q.collect().map(_.toSeq).toSet === expectRows)
    }
  }

  test("the exact-grain query and a global aggregate also rewrite") {
    withMv {
      val grain = base.groupBy("region", "day").agg(sum("qty").as("s"))
      assert(scansMv(grain))
      val global = base.agg(count(lit(1)).as("c"), max("qty").as("m"))
      assert(scansMv(global))
      assert(global.head().getLong(0) === 1000L)
    }
  }

  test("COUNT(*) stays non-null over an empty-result rollup " +
       "(coalesced to 0, matching COUNT's contract)") {
    withMv {
      val q = base.agg(count(lit(1)).as("c"))
      assert(scansMv(q))
      assert(!q.schema("c").nullable,
        "the rewritten COUNT must stay non-nullable (Coalesce to 0)")
      assert(q.head().getLong(0) === 1000L)
    }
  }

  test("a grain-column WHERE commutes with the aggregation and rides " +
       "onto the MV scan; results and types are unchanged") {
    def q(df: DataFrame): DataFrame = df
      .filter(col("day") >= 3 && col("region") =!= "r0")
      .groupBy("region")
      .agg(sum("qty").as("s"), sum("amount").as("sa"), count(lit(1)).as("c"))
    val expect = q(base)
    val expectRows = expect.collect().map(_.toSeq).toSet
    val expectSchema = expect.schema
    withMv {
      val r = q(base)
      assert(scansMv(r), "grain-only predicates must not defeat the " +
        "rewrite:\n" + r.queryExecution.optimizedPlan)
      assert(r.schema === expectSchema)
      assert(r.collect().map(_.toSeq).toSet === expectRows)
      // filter that empties a group entirely: the group must vanish,
      // exactly as it would aggregating the base
      val none = base.filter(col("day") > 999)
        .groupBy("region").agg(count(lit(1)).as("c"))
      assert(scansMv(none))
      assert(none.count() === 0L)
    }
  }

  test("scope guards decline: filter, non-grain group, AVG, DISTINCT, " +
       "expression argument, and conf off") {
    withMv {
      val filtered = base.filter(col("qty") > 10)
        .groupBy("region").agg(sum("qty").as("s"))
      assert(!scansMv(filtered),
        "a MEASURE-column filter must defeat the rewrite: the MV " +
          "pre-aggregated unfiltered rows")

      val wrongGrain = base.groupBy("qty").agg(count(lit(1)).as("c"))
      assert(!scansMv(wrongGrain), "qty is not in the MV grain")

      val avg0 = base.groupBy("region").agg(avg("qty").as("a"))
      assert(!scansMv(avg0), "AVG needs a per-column non-null count")

      val dist = base.groupBy("region")
        .agg(countDistinct(col("day")).as("d"))
      assert(!scansMv(dist), "DISTINCT aggregates are not re-aggregable")

      val exprArg = base.groupBy("region")
        .agg(sum(col("qty") + 1).as("s"))
      assert(!scansMv(exprArg), "the MV declared columns, not algebra")
    }
    // conf off, registration still present
    MvRewrite.register(baseDir, spark.read.parquet(mvDir),
      groupCols = Seq("region", "day"),
      sumCols = Map("qty" -> "sum_qty"))
    spark.experimental.extraOptimizations =
      spark.experimental.extraOptimizations :+ MvRewrite
    try {
      val q = base.groupBy("region").agg(sum("qty").as("s"))
      assert(!scansMv(q), "disabled by default")
    } finally {
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations.filterNot(_ == MvRewrite)
      MvRewrite.clear()
    }
  }

  test("with several registered MVs the COARSEST covering grain wins, " +
       "and queries it cannot cover fall back to the finer one") {
    val coarseDir = baseDir + "_region_mv" // "_mv" suffix keeps scansMv honest
    spark.read.parquet(baseDir)
      .groupBy("region")
      .agg(sum("qty").as("sum_qty"), count(lit(1)).as("cnt"))
      .write.mode("overwrite").parquet(coarseDir)
    def mvPaths(df: DataFrame): Seq[String] =
      df.queryExecution.optimizedPlan.collect {
        case l: org.apache.spark.sql.execution.datasources.LogicalRelation =>
          l.relation match {
            case fs: org.apache.spark.sql.execution.datasources.HadoopFsRelation =>
              fs.location.rootPaths.map(_.toString)
            case _ => Seq.empty[String]
          }
      }.flatten
    withMv { // registers the (region, day) MV
      MvRewrite.register(baseDir, spark.read.parquet(coarseDir),
        groupCols = Seq("region"),
        sumCols = Map("qty" -> "sum_qty"), countCol = Some("cnt"))
      val regional = base.groupBy("region")
        .agg(sum("qty").as("s"), count(lit(1)).as("c"))
      assert(mvPaths(regional).forall(_.contains("_region_mv")),
        s"region rollup must pick the coarser MV: ${mvPaths(regional)}")
      assert(regional.collect().map(_.toSeq).toSet ===
        base.groupBy("region").agg(sum("qty").as("s"),
          count(lit(1)).as("c")).collect().map(_.toSeq).toSet)
      // day filter is outside the coarse grain -> the finer MV serves it
      val daily = base.filter(col("day") === 4)
        .groupBy("region").agg(sum("qty").as("s"))
      val dp = mvPaths(daily)
      assert(dp.nonEmpty && dp.forall(p =>
        p.contains("fact_mv") && !p.contains("_region_mv")),
        s"day-filtered rollup must fall back to the (region, day) MV: $dp")
      // min/max are not declared on the coarse MV -> finer MV serves
      val mm = base.groupBy("region").agg(min("qty").as("mn"))
      assert(mvPaths(mm).forall(_.contains("fact_mv")))
    }
  }

  test("registration validates declared MV columns") {
    val e = intercept[IllegalArgumentException] {
      MvRewrite.register(baseDir, spark.read.parquet(mvDir),
        groupCols = Seq("region"), sumCols = Map("qty" -> "no_such_col"))
    }
    assert(e.getMessage.contains("no_such_col"))
  }
}
