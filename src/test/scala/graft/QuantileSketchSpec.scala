package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.ext.Sketches

/** Merge contract of the bottom-k-by-hash quantile sketch: the state is
  * a pure function of the underlying row SET, so ANY batching — one
  * batch, uneven splits, different fold trees — produces bit-identical
  * state, the same property q97 relies on for decimal partials.
  */
class QuantileSketchSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val k = 16
  private val keys = Seq("g")

  private def data: DataFrame = {
    // 3 groups × 120 rows with a deterministic but scrambled value mix;
    // ids unique across the frame (the hash source).
    val rows = for (g <- 0 until 3; i <- 0 until 120) yield
      (g.toString, (g * 1000 + i).toLong, ((i * 37 + g * 11) % 97).toDouble)
    rows.toDF("g", "id", "v")
  }

  private def state(df: DataFrame): Seq[(String, Long, Seq[(Long, Double)])] =
    df.select(col("g"), col("n"), col("qs_sample"))
      .collect()
      .map(r => (r.getString(0), r.getLong(1),
        r.getSeq[org.apache.spark.sql.Row](2)
          .map(x => (x.getLong(0), x.getDouble(1)))))
      .sortBy(_._1).toSeq

  test("any batching folds to bit-identical state") {
    val d = data.cache()
    val whole = Sketches.quantilePartial(d, keys, $"v", $"id", k)

    // Uneven 3-way split, left fold.
    val s1 = Seq(d.filter($"id" % 7 === 0), d.filter($"id" % 7 === 1),
        d.filter($"id" % 7 >= 2))
      .map(b => Sketches.quantilePartial(b, keys, $"v", $"id", k))
      .reduce((a, b) => Sketches.quantileMerge(a, b, keys, k))

    // Different partitioning AND a right-leaning fold tree.
    val parts = Seq(d.filter($"id" % 3 === 0), d.filter($"id" % 3 === 1),
        d.filter($"id" % 3 === 2))
      .map(b => Sketches.quantilePartial(b, keys, $"v", $"id", k))
    val s2 = Sketches.quantileMerge(parts(0),
      Sketches.quantileMerge(parts(1), parts(2), keys, k), keys, k)

    val w = state(whole)
    assert(state(s1) === w)
    assert(state(s2) === w)
    assert(w.forall(_._3.size == k))
    // counts survive the fold exactly
    assert(w.map(_._2) === Seq(120L, 120L, 120L))
    d.unpersist()
  }

  test("merge is commutative") {
    val d = data
    val a = Sketches.quantilePartial(d.filter($"id" % 2 === 0), keys,
      $"v", $"id", k)
    val b = Sketches.quantilePartial(d.filter($"id" % 2 === 1), keys,
      $"v", $"id", k)
    assert(state(Sketches.quantileMerge(a, b, keys, k)) ===
      state(Sketches.quantileMerge(b, a, keys, k)))
  }

  test("estimates land inside the exact p40-p60 / p85-p95 rank bands " +
       "on real data (k=256 ⇒ ~6% rank error)") {
    val ev = Tables.load(spark, TestSpark.sf0001, "events")
    val est = Sketches.quantileFinish(
      Sketches.quantilePartial(ev, Seq("event_type"), col("value"),
        col("event_id"), 256), Seq("event_type"))
      .select("event_type", "median_est", "p90_est")
      .collect().map(r => r.getString(0) -> ((r.getDouble(1),
        r.getDouble(2)))).toMap
    val bands = ev.groupBy("event_type").agg(
      expr("percentile(value, 0.40)").as("p40"),
      expr("percentile(value, 0.60)").as("p60"),
      expr("percentile(value, 0.85)").as("p85"),
      expr("percentile(value, 0.95)").as("p95"))
      .collect().map(r => r.getString(0) -> ((r.getDouble(1),
        r.getDouble(2), r.getDouble(3), r.getDouble(4)))).toMap
    assert(est.nonEmpty)
    est.foreach { case (k2, (med, p90)) =>
      val (p40, p60, p85, p95) = bands(k2)
      assert(med >= p40 && med <= p60,
        s"$k2: median_est $med outside exact [$p40, $p60]")
      assert(p90 >= p85 && p90 <= p95,
        s"$k2: p90_est $p90 outside exact [$p85, $p95]")
    }
  }

  test("finish computes rank estimates over the value-sorted sample") {
    // k larger than the group: the sample IS the group, so the median
    // and p90 are the exact order statistics.
    val d = Seq(("a", 1L, 10.0), ("a", 2L, 20.0), ("a", 3L, 30.0),
      ("a", 4L, 40.0), ("a", 5L, 50.0)).toDF("g", "id", "v")
    val out = Sketches.quantileFinish(
      Sketches.quantilePartial(d, keys, $"v", $"id", 64), keys)
      .select("g", "n", "n_sampled", "median_est", "p90_est").head()
    assert(out.getLong(1) === 5L && out.getLong(2) === 5L)
    assert(out.getDouble(3) === 30.0) // rank 3 of 5, odd → midLo == midHi
    assert(out.getDouble(4) === 50.0) // ceil(0.9·5) = 5
  }
}
