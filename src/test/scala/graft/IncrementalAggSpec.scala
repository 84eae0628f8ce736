package graft

import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite
import graft.etl.IncrementalAgg
import graft.ext.Sketches

/** Properties of the round-8 warehouse primitives:
  *  - incremental aggregate state is batching-invariant (ANY split of
  *    the input folds to bit-identical finished metrics — the
  *    materialized-view contract q97 gates on one fixed split);
  *  - KMV join-cardinality estimates land near the true values on real
  *    data (the oracle proves exactness of the ARITHMETIC; this proves
  *    the estimator is also a useful estimator).
  */
class IncrementalAggSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("incremental fold is batching-invariant: any random split " +
       "finishes bit-identically to the single-batch aggregate") {
    import spark.implicits._
    val rows = (1 to 400).map { i =>
      (s"k${i % 7}", math.sin(i) * 1000.0)
    }
    val df = rows.toDF("k", "v").cache()
    val whole = IncrementalAgg.finish(
      IncrementalAgg.partial(df, Seq("k"), col("v")), Seq("k"))
      .orderBy("k").collect().toSeq

    val genCuts: Gen[List[Int]] =
      Gen.listOfN(3, Gen.choose(0, 400)).map(_.sorted)
    val prop = Prop.forAll(genCuts) { cuts =>
      val bounds = (0 +: cuts :+ 400).distinct.sorted
      val batches = bounds.zip(bounds.tail).map { case (lo, hi) =>
        // split by a stable row predicate, not limit/offset (which are
        // order-dependent in a distributed frame)
        df.filter(abs(hash(col("k"), col("v"))) % 400 >= lo &&
          abs(hash(col("k"), col("v"))) % 400 < hi)
      }
      val parts = batches.map(b =>
        IncrementalAgg.partial(b, Seq("k"), col("v")))
      val state = parts.reduce((a, b) => IncrementalAgg.merge(a, b, Seq("k")))
      val folded = IncrementalAgg.finish(state, Seq("k"))
        .orderBy("k").collect().toSeq
      folded == whole
    }
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(20),
      prop)
    assert(res.passed, res.status.toString)
  }

  test("retractable fold: inserts+deletes in any split equal the " +
       "recompute over survivors; full retraction empties the key") {
    import spark.implicits._
    val rows = (1 to 300).map(i => (i, s"k${i % 5}", math.cos(i) * 500.0))
    val df = rows.toDF("id", "k", "v").cache()
    val genDel = Gen.choose(2, 10)
    val prop = Prop.forAll(genDel, Gen.choose(0, 299)) { (mod, cut) =>
      val batch1 = df.filter(col("id") <= cut)
      val batch2 = df.filter(col("id") > cut)
      val deletes = df.filter(col("id") % mod === 0)
      val st = IncrementalAgg.applyDelta(
        IncrementalAgg.partial(batch1, Seq("k"), col("v")),
        batch2, deletes, Seq("k"), col("v"))
      val folded = IncrementalAgg.finish(st, Seq("k"))
        .orderBy("k").collect().toSeq
      val direct = IncrementalAgg.finish(
        IncrementalAgg.partial(df.filter(col("id") % mod =!= 0),
          Seq("k"), col("v")), Seq("k"))
        .orderBy("k").collect().toSeq
      folded == direct
    }
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(15), prop)
    assert(res.passed, res.status.toString)

    // delete everything ever inserted → state has no rows at all
    val all = IncrementalAgg.partial(df, Seq("k"), col("v"))
    val emptied = IncrementalAgg.applyDelta(all,
      df.filter(lit(false)), df, Seq("k"), col("v"))
    assert(emptied.count() === 0)
  }

  test("KMV join-cardinality estimates are near the truth on real data") {
    val ev = Tables.load(spark, TestSpark.sf0001, "events")
    val cust = Tables.load(spark, TestSpark.sf0001, "customer")
    val est = Sketches.kmvJoinCardinality(ev, col("user_id"),
      cust, col("c_custkey"), 64).head()

    val dA = ev.select("user_id").distinct().count().toDouble
    val dB = cust.select("c_custkey").distinct().count().toDouble
    val trueJoin = ev.join(
      cust.withColumnRenamed("c_custkey", "user_id"), "user_id").count()

    def within(got: Double, truth: Double, tol: Double, what: String) =
      assert(math.abs(got - truth) / truth <= tol,
        s"$what: est $got vs true $truth")
    within(est.getAs[Double]("d_a"), dA, 0.35, "distinct(A)")
    within(est.getAs[Double]("d_b"), dB, 0.35, "distinct(B)")
    // the join size compounds three sketch estimates and the uniform-
    // frequency model; a CBO needs order-of-magnitude truth, so the
    // contract is a factor-of-3 band (measured ~2.1x on this fixture:
    // the k=64 Jaccard leg is noisy on a small-overlap domain)
    val js = est.getAs[Double]("join_size_est")
    assert(js >= trueJoin / 3.0 && js <= trueJoin * 3.0,
      s"join size: est $js vs true $trueJoin")
  }
}
