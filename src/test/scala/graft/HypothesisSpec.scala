package graft

import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.ext.Hypothesis

/** Properties for the distribution-test module:
  *  - prefixSumByRange ≡ a single-partition global window (the scale
  *    refactor may not change a single cumulative value);
  *  - ksTwoSample / mannWhitneyU match brute-force definitions computed
  *    directly from the raw samples (sup over empirical CDFs; pair
  *    counting with half ties);
  *  - chiSquare matches the direct Σ(o−e)²/e on the contingency table.
  */
class HypothesisSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def check(prop: Prop, n: Int = 15): Unit = {
    val r = SCTest.check(SCTest.Parameters.default
      .withMinSuccessfulTests(n), prop)
    assert(r.passed, r.status.toString)
  }

  test("prefixSumByRange ≡ global-window cumulative sum") {
    val gen = Gen.nonEmptyListOf(Gen.zip(Gen.choose(-1000, 1000),
      Gen.choose(-5L, 5L)))
    check(Prop.forAll(gen) { raw =>
      // distinct keys, as the contract requires
      val rows = raw.groupBy(_._1).map { case (k, vs) =>
        (k, vs.map(_._2).sum)
      }.toSeq
      val df = rows.toDF("k", "v")
      val got = Hypothesis.prefixSumByRange(df, "k", "v", 4)
        .select("k", "cum").as[(Int, Long)].collect().toMap
      val want = rows.sortBy(_._1)
        .scanLeft((0, 0L)) { case ((_, acc), (k, v)) => (k, acc + v) }
        .drop(1).toMap
      got == want
    })
  }

  test("groupedPrefixSumsByRange ≡ per-group scan, groups spread " +
       "across range partitions") {
    val gen = Gen.nonEmptyListOf(Gen.zip(Gen.choose(0, 3),
      Gen.zip(Gen.choose(-1000, 1000), Gen.choose(-5L, 5L))))
    check(Prop.forAll(gen) { raw =>
      // distinct (group, key), as the contract requires
      val rows = raw.groupBy(r => (r._1, r._2._1)).map {
        case ((g, k), vs) => (g, k, vs.map(_._2._2).sum)
      }.toSeq
      val df = rows.toDF("g", "k", "v")
      val got = Hypothesis.groupedPrefixSumsByRange(df, "g", "k",
        Seq("v"), 4)
        .select("g", "k", "cum_v").as[(Int, Int, Long)].collect()
        .map(r => (r._1, r._2) -> r._3).toMap
      val want = rows.groupBy(_._1).flatMap { case (g, vs) =>
        vs.sortBy(_._2).scanLeft((0, 0L)) {
          case ((_, acc), (_, k, v)) => (k, acc + v)
        }.drop(1).map { case (k, c) => (g, k) -> c }
      }
      got == want
    })
  }

  test("pettittChangepoint finds a planted mean shift; U is exact vs " +
       "brute-force pair counting") {
    // planted changepoint at t=30 of 50 (group "a"); ties included
    val rnd = new scala.util.Random(7)
    val a = (1 to 50).map(i =>
      ("a", i.toLong, (if (i <= 30) rnd.nextInt(10) else 8 + rnd.nextInt(10)).toDouble))
    val b = (1 to 40).map(i => ("b", i.toLong, (i % 5).toDouble))
    val df = (a ++ b).toDF("g", "ord", "v")
    val got = Hypothesis.pettittChangepoint(df, "g", "v", "ord")
      .select("g", "n", "t_star", "u_at").as[(String, Long, Long, Long)]
      .collect().map(r => r._1 -> r).toMap
    // brute force: U_t = Σ_{i<=t} Σ_{j>t} sgn(x_i - x_j), argmax |U|
    def brute(xs: Seq[Double]): (Long, Long) = {
      val n = xs.length
      val us = (1 until n).map { t =>
        var u = 0L
        for (i <- 0 until t; j <- t until n)
          u += math.signum(xs(i) - xs(j)).toLong
        (t.toLong, u)
      }
      us.maxBy { case (t, u) => (math.abs(u), -t) }
    }
    val (taA, uaA) = brute(a.map(_._3))
    assert(got("a")._3 === taA && got("a")._4 === uaA)
    // the planted shift is found near t=30
    assert(math.abs(got("a")._3 - 30L) <= 5,
      s"changepoint ${got("a")._3} far from planted t=30")
    val (taB, uaB) = brute(b.map(_._3))
    assert(got("b")._3 === taB && got("b")._4 === uaB)
  }

  test("prefixSumByRange survives AQE re-planning of the upstream " +
       "shuffle (q152 sf0.1 regression)") {
    // Regression lock: the ranged frame used to be evaluated once per
    // consumer (local windows + offsets); AQE could coalesce the
    // upstream aggregation shuffle differently per job, so the two
    // passes disagreed on partition boundaries and the sums corrupted
    // silently. A wide aggregated input (tens of thousands of distinct
    // keys through a real shuffle) exercises exactly that shape; the
    // materialized `ranged` must make both passes see one partitioning.
    import spark.implicits._
    val df = spark.range(200000)
      .selectExpr("cast(id % 37117 as double) / 7 as k", "id % 5 as v")
      .groupBy("k").agg(sum("v").cast("long").as("v"))
    val got = Hypothesis.prefixSumByRange(df, "k", "v", 32)
      .select("k", "cum").as[(Double, Long)].collect().sortBy(_._1)
    val rows = df.as[(Double, Long)].collect().sortBy(_._1)
    val want = rows.scanLeft((0.0, 0L)) {
      case ((_, acc), (k, v)) => (k, acc + v)
    }.drop(1)
    assert(got.toSeq == want.toSeq)
  }

  private val twoSampleGen = for {
    as <- Gen.nonEmptyListOf(Gen.choose(0, 8))
    bs <- Gen.nonEmptyListOf(Gen.choose(0, 8))
  } yield (as.map(_.toDouble), bs.map(_.toDouble))

  test("ksTwoSample matches the brute-force sup over empirical CDFs") {
    check(Prop.forAll(twoSampleGen) { case (as, bs) =>
      val df = (as.map(v => (v, "a")) ++ bs.map(v => (v, "b")))
        .toDF("value", "g")
      val row = Hypothesis.ksTwoSample(df, col("value"),
        col("g") === "a", col("g") === "b", partitions = 3)
        .select("n1", "n2", "d_num").as[(Long, Long, Long)].head()
      val grid = (as ++ bs).distinct
      val want = grid.map { v =>
        math.abs(as.count(_ <= v).toLong * bs.size -
          bs.count(_ <= v).toLong * as.size)
      }.max
      row == ((as.size.toLong, bs.size.toLong, want))
    })
  }

  test("mannWhitneyU matches brute-force pair counting with half-ties") {
    check(Prop.forAll(twoSampleGen) { case (as, bs) =>
      val df = (as.map(v => (v, "a")) ++ bs.map(v => (v, "b")))
        .toDF("value", "g")
      val u2 = Hypothesis.mannWhitneyU(df, col("value"),
        col("g") === "a", col("g") === "b", partitions = 3)
        .select("u2").as[Long].head()
      // 2U = 2·#{a > b} + #{a = b}
      val want = (for (a <- as; b <- bs) yield {
        if (a > b) 2L else if (a == b) 1L else 0L
      }).sum
      u2 == want
    })
  }

  test("chiSquare matches the direct statistic on the contingency table") {
    val gen = Gen.nonEmptyListOf(
      Gen.zip(Gen.oneOf("x", "y", "z"), Gen.oneOf("p", "q")))
    check(Prop.forAll(gen) { rows =>
      val df = rows.toDF("a", "b")
      val got = Hypothesis.chiSquare(df, col("a"), col("b"))
        .select("n_cells", "dof", "n", "chi2")
        .as[(Long, Long, Long, Double)].head()
      val cells = rows.groupBy(identity).view.mapValues(_.size.toLong).toMap
      val rTot = rows.groupBy(_._1).view.mapValues(_.size.toLong).toMap
      val cTot = rows.groupBy(_._2).view.mapValues(_.size.toLong).toMap
      val n = rows.size.toLong
      val chi2 = cells.toSeq.map { case ((a, b), o) =>
        val e = rTot(a).toDouble * cTot(b).toDouble / n.toDouble
        math.floor((o.toDouble - e) * (o.toDouble - e) / e * 1e6).toLong
      }.sum.toDouble / 1e6
      got == ((cells.size.toLong,
        (rTot.size.toLong - 1) * (cTot.size.toLong - 1), n, chi2))
    })
  }

  test("q151/q152 single-row shape and bounds on real data") {
    val ev = Tables.load(spark, TestSpark.sf0001, "events")
    val ks = Hypothesis.ksTwoSample(ev, col("value"),
      col("event_type") === "view", col("event_type") === "click")
      .select("n1", "n2", "d_num", "ks")
      .as[(Long, Long, Long, Double)].collect()
    assert(ks.length == 1)
    val (n1, n2, dnum, d) = ks.head
    assert(n1 > 0 && n2 > 0 && dnum >= 0 && dnum <= n1 * n2)
    assert(d >= 0.0 && d <= 1.0)
    val mw = Hypothesis.mannWhitneyU(ev, col("value"),
      col("event_type") === "view", col("event_type") === "click")
      .select("u2", "auc").as[(Long, Double)].collect()
    assert(mw.length == 1)
    assert(mw.head._1 >= 0 && mw.head._1 <= 2 * n1 * n2)
    assert(mw.head._2 >= 0.0 && mw.head._2 <= 1.0)
  }
}
