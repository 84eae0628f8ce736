package graft

import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.ext.{Curation, Dedup, RangeJoin}

/** ScalaCheck properties for the round-9 primitives:
  *  - intervalOverlap ≡ brute-force theta join on random interval sets
  *    at random bucket widths, with every pair emitted exactly once;
  *  - winsorizeByRank keeps a fraction within the requested band and
  *    never keeps a row outside the stratum's trimmed value range;
  *  - containmentPairs scores a doc wholly contained in another at
  *    exactly 1.0, in the sub→sup direction.
  */
class Round9PropertySpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def check(prop: Prop, n: Int = 20): Unit = {
    val r = SCTest.check(SCTest.Parameters.default
      .withMinSuccessfulTests(n), prop)
    assert(r.passed, r.status.toString)
  }

  test("intervalOverlap ≡ brute force on random intervals and widths") {
    val genIv = for {
      lo <- Gen.choose(-50L, 50L)
      len <- Gen.choose(0L, 40L) // len 0 ⇒ empty, must match nothing
    } yield (lo, lo + len)
    val genCase = for {
      l <- Gen.listOfN(12, genIv)
      r <- Gen.listOfN(12, genIv)
      w <- Gen.oneOf(1L, 2L, 7L, 33L, 500L)
    } yield (l, r, w)
    check(Prop.forAll(genCase) { case (lIv, rIv, w) =>
      val left = lIv.zipWithIndex.map { case ((lo, hi), i) =>
        (i.toLong, lo, hi) }.toDF("lid", "lo_l", "hi_l")
      val right = rIv.zipWithIndex.map { case ((lo, hi), i) =>
        (i.toLong, lo, hi) }.toDF("rid", "lo_r", "hi_r")
      val brute = (for {
        ((llo, lhi), li) <- lIv.zipWithIndex
        ((rlo, rhi), ri) <- rIv.zipWithIndex
        if lhi > llo && rhi > rlo && llo < rhi && rlo < lhi
      } yield (li.toLong, ri.toLong)).toSet
      val got = RangeJoin.intervalOverlap(left, right,
          "lo_l", "hi_l", "lo_r", "hi_r", w)
        .select("lid", "rid").as[(Long, Long)].collect()
      got.length == got.toSet.size && got.toSet == brute
    }, n = 15)
  }

  test("winsorizeByRank: kept count matches the exact rank band and " +
       "kept values sit inside the stratum's surviving range") {
    val genDocs = Gen.listOfN(60, for {
      g <- Gen.oneOf("a", "b")
      v <- Gen.choose(0L, 1000L)
    } yield (g, v))
    check(Prop.forAll(genDocs) { rows =>
      val df = rows.zipWithIndex.map { case ((g, v), i) =>
        (i.toLong, g, v) }.toDF("id", "g", "v")
      val kept = Curation.winsorizeByRank(df, Seq("g"), "v", "id",
        1, 19, 20).select("g", "v").as[(String, Long)].collect()
      rows.groupBy(_._1).forall { case (g, grp) =>
        val n = grp.size
        val lo = math.ceil(n / 20.0).toInt
        val hi = math.floor(19.0 * n / 20.0).toInt
        val keptG = kept.filter(_._1 == g).map(_._2).sorted.toSeq
        val expected = grp.map(_._2).sorted.slice(lo - 1, hi).toSeq
        // rank ties break by id, but VALUES kept are determined by the
        // sorted band regardless of tie order
        keptG == expected
      }
    }, n = 15)
  }

  test("containmentPairs: a doc whose shingles all appear in another " +
       "scores exactly 1.0 sub→sup") {
    val words = Gen.listOfN(12, Gen.oneOf(
      "alpha", "beta", "gamma", "delta", "eps", "zeta", "eta", "theta"))
    check(Prop.forAll(words, Gen.choose(4, 10)) { (ws, cut) =>
      val sup = ws.mkString(" ")
      val sub = ws.take(math.max(4, math.min(cut, ws.size))).mkString(" ")
      val docs = Seq((1L, sub), (2L, sup)).toDF("doc_id", "text")
      val out = Dedup.containmentPairs(docs, "doc_id", "text",
          k = 3, cNum = 1, cDen = 1)
        .filter(col("id_sub") === 1L && col("id_sup") === 2L)
        .select("containment").as[Double].collect()
      // sub's shingle set is a subset of sup's (prefix of the same
      // token stream), so containment must be exactly 1.0
      out.toSeq == Seq(1.0)
    }, n = 15)
  }

  test("exactMedianByGroup ≡ sort-based median on random data") {
    // Covers: odd/even counts, heavy ties, constant groups, negative
    // values, and tail sizes that force multiple refinement rounds.
    val genGroup = for {
      sz <- Gen.choose(1, 60)
      // draw from a SMALL value set so ties and all-constant groups occur
      vs <- Gen.listOfN(sz, Gen.oneOf(Gen.choose(-5, 5).map(_.toDouble),
        Gen.choose(-1000000, 1000000).map(_ / 997.0)))
    } yield vs
    val genCase = for {
      gs <- Gen.listOfN(5, genGroup)
      tail <- Gen.oneOf(1L, 2L, 8L, 1000L)
      buckets <- Gen.oneOf(2, 3, 16)
    } yield (gs, tail, buckets)
    check(Prop.forAll(genCase) { case (gs, tail, buckets) =>
      val rows = gs.zipWithIndex.flatMap { case (vs, g) =>
        vs.map(v => (s"g$g", v)) }
      val df = rows.toDF("k", "v")
      val got = graft.ext.Stats
        .exactMedianByGroup(df, "k", "v", buckets = buckets, tail = tail)
        .collect().map(r => (r.getString(0),
          (r.getLong(1), r.getDouble(2)))).toMap
      val want = gs.zipWithIndex.map { case (vs, g) =>
        val s = vs.sorted
        val n = s.length
        val med = (s((n - 1) / 2) + s(n / 2)) / 2.0
        (s"g$g", (n.toLong, med))
      }.toMap
      got == want
    }, n = 25)
  }

  test("exactQuantilesByGroup: bucket-boundary reconstruction keeps " +
       "the top rank (r14 regression: a+(b-a) lands 8 ulps below b)") {
    // found by the random property below: for this exact pair the
    // reconstructed top boundary lo + width*(b2+1)/B rounds BELOW the
    // true max (error scales with ulp(width), not ulp(value)), so the
    // pre-fix two-nextUp widening let rank k2 fall out of the window
    // and the finish returned x_(k1) for EVERY fractional p.
    val a = -705.1213640922768
    val b = 39.229689067201605
    assert(a + (b - a) < b, "the pair must exhibit the cancellation")
    val df = Seq(("g", a), ("g", b)).toDF("k", "v")
    for (p <- Seq(0.5, 0.75, 0.99); tail <- Seq(1L, 1000L)) {
      val want = a * (1.0 - p) + b * p // k1=0, frac=p for n=2
      val got = graft.ext.Stats.exactQuantilesByGroup(df, "k", "v",
        Seq(p), buckets = 8, tail = tail).collect()
      assert(got.length == 1 && got(0).getDouble(3) == want,
        s"p=$p tail=$tail got=${got.map(_.getDouble(3)).mkString(",")} " +
          s"want=$want")
    }
  }

  test("exactQuantilesByGroup ≡ local quantile_cont on random data") {
    val genGroup = for {
      sz <- Gen.choose(1, 60)
      vs <- Gen.listOfN(sz, Gen.oneOf(Gen.choose(-5, 5).map(_.toDouble),
        Gen.choose(-1000000, 1000000).map(_ / 997.0)))
    } yield vs
    val genCase = for {
      gs <- Gen.listOfN(4, genGroup)
      tail <- Gen.oneOf(1L, 4L, 1000L)
      p <- Gen.oneOf(0.0, 0.1, 0.25, 0.5, 0.75, 0.9, 0.99, 1.0)
    } yield (gs, tail, p)
    check(Prop.forAll(genCase) { case (gs, tail, p) =>
      val rows = gs.zipWithIndex.flatMap { case (vs, g) =>
        vs.map(v => (s"g$g", v)) }
      val df = rows.toDF("k", "v")
      val got = graft.ext.Stats
        .exactQuantilesByGroup(df, "k", "v", Seq(p),
          buckets = 8, tail = tail)
        .collect().map(r => (r.getString(0), r.getDouble(3))).toMap
      val want = gs.zipWithIndex.map { case (vs, g) =>
        val s = vs.sorted
        val h = (s.length - 1).toDouble * p
        val k1 = math.floor(h).toInt
        val frac = h - math.floor(h)
        val lo = s(k1)
        val hi = if (frac > 0.0) s(k1 + 1) else s(k1)
        (s"g$g", lo * (1.0 - frac) + hi * frac)
      }.toMap
      got == want
    }, n = 30)
  }

  test("hllDistinct lands within the m=64 error regime on known " +
    "cardinalities") {
    // deterministic keys; true NDV ∈ {500, 2000, 8000} per group —
    // all safely above the raw-estimate floor of ~2.5·m = 160
    val rows = Seq(("a", 500), ("b", 2000), ("c", 8000)).flatMap {
      case (g, n) => (0 until n).flatMap(i => Seq((g, s"k$i"), (g, s"k$i")))
    }
    val df = rows.toDF("g", "k")
    val est = graft.ext.Sketches.hllDistinct(df, Seq("g"), col("k"))
      .collect().map(r => (r.getString(0), r.getDouble(1))).toMap
    for ((g, n) <- Seq(("a", 500.0), ("b", 2000.0), ("c", 8000.0))) {
      val rel = math.abs(est(g) - n) / n
      assert(rel < 0.35, s"group $g: est=${est(g)} exact=$n relerr=$rel")
    }
  }

  test("IncrementalJoin ≡ direct join under any batching") {
    import graft.etl.IncrementalJoin
    val genCase = for {
      na <- Gen.choose(0, 25)
      nb <- Gen.choose(0, 25)
      as <- Gen.listOfN(na, Gen.zip(Gen.choose(0, 6), Gen.choose(0, 99)))
      bs <- Gen.listOfN(nb, Gen.zip(Gen.choose(0, 6), Gen.choose(0, 99)))
      splitA <- Gen.listOfN(na, Gen.choose(0, 2)) // batch id per row
      splitB <- Gen.listOfN(nb, Gen.choose(0, 2))
    } yield (as, bs, splitA, splitB)
    check(Prop.forAll(genCase) { case (as, bs, splitA, splitB) =>
      val a = as.zipWithIndex.map { case ((k, x), i) => (k, x, i) }
        .toDF("ka", "x", "ia")
      val b = bs.zipWithIndex.map { case ((k, y), i) => (k, y, i) }
        .toDF("kb", "y", "ib")
      val st = (0 until 3).foldLeft(
        IncrementalJoin.init(a, b, "ka", "kb")) { (acc, batch) =>
        val dA = a.filter(col("ia").isin(
          splitA.zipWithIndex.filter(_._1 == batch).map(_._2.toLong): _*))
        val dB = b.filter(col("ib").isin(
          splitB.zipWithIndex.filter(_._1 == batch).map(_._2.toLong): _*))
        IncrementalJoin.step(acc, dA, dB, "ka", "kb")
      }
      val direct = a.join(b, col("ka") === col("kb"))
      st.view.exceptAll(direct).isEmpty && direct.exceptAll(st.view).isEmpty
    }, n = 15)
  }

  test("heavyHittersExact ≡ plain GROUP BY HAVING on skewed random data") {
    // Zipf-ish draws over a key domain wider than the sketch, so bucket
    // collisions actually happen and the one-sided gate is exercised.
    val genCase = for {
      keys <- Gen.listOfN(400, Gen.frequency(
        (8, Gen.choose(0, 4)), (3, Gen.choose(5, 30)),
        (1, Gen.choose(31, 200))))
      den <- Gen.oneOf(10L, 25L, 50L)
    } yield (keys, den)
    check(Prop.forAll(genCase) { case (keys, den) =>
      val df = keys.map(k => s"k$k").toDF("v")
      val got = graft.ext.Sketches
        .heavyHittersExact(df, col("v"), 3, 16, den)
        .select("v", "exact_n")
      val total = keys.size.toLong
      val want = df.groupBy("v").agg(count(lit(1)).as("exact_n"))
        .filter(col("exact_n") * den >= total)
      got.exceptAll(want).isEmpty && want.exceptAll(got).isEmpty
    }, n = 12)
  }
}
