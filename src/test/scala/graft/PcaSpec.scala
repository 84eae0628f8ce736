package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import graft.ext.{Multimodal, Pca, Wav}

/** PCA on a planted low-rank distribution, and the Walsh spectrum on a
  * pure Walsh tone:
  *  - the top principal component recovers the planted direction
  *    (|cosine| ≥ 0.98) and eigenvalues come back descending;
  *  - components are orthonormal;
  *  - projections onto the top component carry more variance than onto
  *    the second;
  *  - a synthesized Walsh function of sequency k₀ concentrates ALL its
  *    AC spectrum at k₀, so the centroid is exactly k₀; a constant
  *    (DC-only) signal yields a NULL centroid.
  */
class PcaSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val d = 16
  private val rng = new scala.util.Random(7)
  private val planted: Array[Double] = {
    val v = Array.fill(d)(rng.nextGaussian())
    val n = math.sqrt(v.map(x => x * x).sum)
    v.map(_ / n)
  }
  private lazy val data = (0 until 400).map { i =>
    val a = rng.nextGaussian() * 10.0
    (i.toLong, (0 until d).map(j =>
      (planted(j) * a + rng.nextGaussian() * 0.3).toFloat))
  }
  private lazy val df = data.toDF("id", "v")

  test("top component recovers the planted direction; eigs descending") {
    val (comps, eigs) = Pca.principalComponents(df, col("v"), d, 3)
    val cos = comps(0).zip(planted).map { case (a, b) => a * b }.sum
    assert(math.abs(cos) > 0.98, s"cosine to planted direction: $cos")
    assert(eigs(0) >= eigs(1) && eigs(1) >= eigs(2),
      s"eigenvalues not descending: ${eigs.toSeq}")
    assert(eigs(0) > 10 * eigs(1),
      s"planted direction should dominate: ${eigs.toSeq}")
  }

  test("components are orthonormal") {
    val (comps, _) = Pca.principalComponents(df, col("v"), d, 3)
    for (a <- 0 until 3; b <- a until 3) {
      val dot = comps(a).zip(comps(b)).map { case (x, y) => x * y }.sum
      val want = if (a == b) 1.0 else 0.0
      assert(math.abs(dot - want) < 1e-6, s"<c$a, c$b> = $dot")
    }
  }

  test("projection onto pc0 carries more variance than pc1") {
    val (comps, _) = Pca.principalComponents(df, col("v"), d, 2)
    val stats = Pca.project(df, col("v"), comps)
      .agg(variance(col("pc0")).as("v0"), variance(col("pc1")).as("v1"))
      .as[(Double, Double)].head()
    assert(stats._1 > stats._2 * 10,
      s"pc0 variance ${stats._1} should dominate pc1 ${stats._2}")
  }

  private def mediaOf(samples: Array[Short]) = {
    val payload = Wav.encode(Wav.Clip(1, 16000, samples))
    spark.createDataFrame(
      java.util.List.of(Row(1L, "audio/wav", payload,
        Row("audio/x-wav", null, null, java.lang.Long.valueOf(1L)))),
      Multimodal.mediaSchema)
  }

  test("Walsh tone of sequency k0 has centroid exactly k0") {
    val k0 = 13
    val samples = Array.tabulate[Short](64) { i =>
      if ((Integer.bitCount(k0 & i) & 1) == 0) 1000 else -1000
    }
    val row = Multimodal.audioWalshSpectrum(mediaOf(samples), 64, 64)
      .select("num", "den", "centroid")
      .as[(Long, Long, Option[Double])].head()
    assert(row._2 == 64L * 1000 && row._1 == k0 * row._2,
      s"spectrum should concentrate at $k0: $row")
    assert(row._3.contains(k0.toDouble))
  }

  test("constant (DC-only) signal yields NULL centroid") {
    val row = Multimodal.audioWalshSpectrum(
      mediaOf(Array.fill[Short](64)(777)), 64, 64)
      .select("num", "den", "centroid")
      .as[(Long, Long, Option[Double])].head()
    assert(row == ((0L, 0L, None)))
  }
}
