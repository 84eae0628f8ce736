package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.ext.Similarity

class SimilaritySpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def vecs = Seq(
    (1L, Array(1.0f, 0.0f, 0.0f)),
    (2L, Array(0.9f, 0.1f, 0.0f)),
    (3L, Array(0.0f, 1.0f, 0.0f)),
    (4L, Array(-1.0f, 0.0f, 0.0f)),
    (5L, Array(2.0f, 0.0f, 0.0f))).toDF("vec_id", "embedding")

  test("cosine: identity=1, orthogonal=0, opposite=-1, scale-invariant") {
    val df = vecs.alias("a").crossJoin(vecs.alias("b"))
      .select(col("a.vec_id").as("i"), col("b.vec_id").as("j"),
        Similarity.cosine(col("a.embedding"), col("b.embedding")).as("c"))
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    assert(math.abs(df((1L, 1L)) - 1.0) < 1e-12)
    assert(math.abs(df((1L, 3L))) < 1e-12)
    assert(math.abs(df((1L, 4L)) + 1.0) < 1e-12)
    assert(math.abs(df((1L, 5L)) - 1.0) < 1e-12)
  }

  test("bruteForceTopK returns exact neighbors in rank order") {
    val out = Similarity.bruteForceTopK(vecs, vecs.filter($"vec_id" === 1),
      "vec_id", "embedding", k = 3)
      .orderBy("rank").collect()
      .map(r => (r.getAs[Long]("nn_id"), r.getAs[Long]("rank")))
    // cos to 1: v5=1.0, v2≈0.9939, v3=0.0, v4=-1.0 → top3 = 5, 2, 3
    assert(out.toSeq === Seq((5L, 1L), (2L, 2L), (3L, 3L)))
  }

  test("bucketed ANN finds same-bucket neighbors via equi-join only") {
    val out = Similarity.bucketedTopK(vecs, vecs.filter($"vec_id" === 1),
      "vec_id", "embedding", k = 5, bits = 3, dims = 3)
      .collect().map(_.getAs[Long]("nn_id")).toSet
    // under ANY ±1 hyperplane set: v5=2·v1 and v2 (angle ≈ 6°) project to
    // v1's side of every plane → same bucket; v4=−v1 flips every non-zero
    // projection → all bits differ. v3 (orthogonal) is seed-dependent.
    assert(Set(2L, 5L).subsetOf(out), s"expected 2 and 5 in bucket: $out")
    assert(!out.contains(4L), s"opposite vector must land elsewhere: $out")
    val plan = Similarity.bucketedTopK(vecs, vecs, "vec_id", "embedding",
      2, 3, 3).queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"),
      "bucketed path must not fall back to a cross join")
  }

  test("hyperplaneSigns: deterministic, balanced, bit-distinct") {
    val a = Similarity.hyperplaneSigns(42L, 0, 64)
    assert(a.toSeq === Similarity.hyperplaneSigns(42L, 0, 64).toSeq)
    val b = Similarity.hyperplaneSigns(42L, 1, 64)
    assert(a.toSeq !== b.toSeq)
    // Rademacher balance: a wildly skewed plane would make its bit
    // near-constant over centered data (50±25 of 64 positives is lax)
    assert(math.abs(a.count(_ > 0) - 32) <= 16)
    assert(a.forall(s => s == 1 || s == -1))
  }

  // ── Recall floor vs exact brute force on real testdata ──────────────
  // The trustworthiness spec the VERDICT asked for: seeded-hyperplane
  // buckets and multi-probe IVF must actually FIND most true neighbors,
  // not just run fast. Floors are set well under observed recall so the
  // spec survives testdata regeneration with a different RNG stream.
  private lazy val emb =
    Tables.load(spark, "/root/testdata/sf0.01", "embeddings").cache()
  private lazy val probes = emb.filter($"vec_id" < 50)

  private def recallAgainst(corpus: org.apache.spark.sql.DataFrame,
                            probeSet: org.apache.spark.sql.DataFrame,
                            approx: org.apache.spark.sql.DataFrame,
                            k: Int): Double = {
    val exact = Similarity.bruteForceTopK(corpus, probeSet, "vec_id",
      "embedding", k)
      .select($"probe_id", $"nn_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val got = approx.select($"probe_id", $"nn_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    got.intersect(exact).size.toDouble / exact.size
  }

  private def recallOf(approx: org.apache.spark.sql.DataFrame,
                       k: Int): Double = recallAgainst(emb, probes, approx, k)

  test("sign-LSH bucketed ANN recall@10 clears the floor; tables amplify") {
    // measured on this testdata: 1 table ≈ 0.12, 8 tables ≈ 0.64,
    // 16 tables ≈ 0.88 — the 1−(1−p^b)^L amplification curve
    val r1 = recallOf(Similarity.bucketedTopK(emb, probes, "vec_id",
      "embedding", k = 10, bits = Params.annBits, dims = Params.annDims,
      seed = Params.annSeed, tables = 1), 10)
    val rL = recallOf(Similarity.bucketedTopK(emb, probes, "vec_id",
      "embedding", k = 10, bits = Params.annBits, dims = Params.annDims,
      seed = Params.annSeed, tables = Params.annTables), 10)
    info(f"bucketed recall@10: 1 table $r1%.3f, ${Params.annTables} tables $rL%.3f")
    assert(rL >= r1, f"more tables must not lose neighbors: $rL%.3f < $r1%.3f")
    assert(rL >= 0.5, f"bucketed recall@10 $rL%.3f below floor 0.5")
  }

  test("k-means-trained IVF beats the hash-sampled quantizer's recall") {
    // measured: sampled quantizer nprobe=4 ≈ 0.67, trained iters=3 ≈ 0.78
    val sampled = recallOf(Similarity.ivfTopK(emb, probes, "vec_id",
      "embedding", k = 10, nlist = Params.ivfNlist,
      nprobe = Params.ivfNprobe), 10)
    val trained = recallOf(Similarity.ivfTopK(emb, probes, "vec_id",
      "embedding", k = 10, nlist = Params.ivfNlist,
      nprobe = Params.ivfNprobe, trainIters = 3, dims = Params.annDims), 10)
    info(f"ivf recall@10: sampled $sampled%.3f, kmeans-trained $trained%.3f")
    assert(trained >= 0.6, f"trained recall $trained%.3f below floor 0.6")
    // slack for centroid ulp nondeterminism; training must never be a
    // material regression over not training
    assert(trained >= sampled - 0.05,
      f"training regressed recall: $trained%.3f vs $sampled%.3f")
  }

  test("PQ/ADC recall@10 clears the floor; UlpScale domain holds") {
    // the exact-sum scheme needs |v| >= 2^-29 for scaled floats to be
    // integral (Similarity.UlpScale); guard the assumption on the data
    val m = emb.select(explode($"embedding").as("v"))
      .filter($"v" =!= 0.0f)
      .agg(min(abs($"v"))).head().getFloat(0)
    assert(m >= math.pow(2, -29).toFloat,
      f"embedding magnitude $m%.3e below 2^-29: scaled sums would round")
    val pq = recallOf(Similarity.pqTopK(emb, probes, "vec_id", "embedding",
      k = 10, dims = Params.annDims, subspaces = Params.pqSubspaces,
      codebookSize = Params.pqCodebook, trainIters = Params.pqIters), 10)
    info(f"pq recall@10: $pq%.3f")
    assert(pq >= 0.3, f"pq recall@10 $pq%.3f below floor 0.3")
  }

  test("recall floors hold at sf0.1 where cell sizes are realistic") {
    // The sf0.01 floors guard the algorithms; this guards the QUANTIZER
    // at 4× the vectors per cell/bucket (2000 vectors) — a degenerate
    // quantizer (most mass in one cell, rest empty) would pass small-
    // fixture floors yet collapse recall exactly here. Same q31/q37/q56
    // configurations as the bench queries.
    val emb1 = Tables.load(spark, "/root/testdata/sf0.1", "embeddings")
      .cache()
    val probes1 = emb1.filter($"vec_id" < 50)
    val bucketed = recallAgainst(emb1, probes1,
      Similarity.bucketedTopK(emb1, probes1, "vec_id", "embedding", k = 10,
        bits = Params.annBits, dims = Params.annDims, seed = Params.annSeed,
        tables = Params.annTables), 10)
    val sampled = recallAgainst(emb1, probes1,
      Similarity.ivfTopK(emb1, probes1, "vec_id", "embedding", k = 10,
        nlist = Params.ivfNlist, nprobe = Params.ivfNprobe), 10)
    val trained = recallAgainst(emb1, probes1,
      Similarity.ivfTopK(emb1, probes1, "vec_id", "embedding", k = 10,
        nlist = Params.ivfNlist, nprobe = Params.ivfNprobe, trainIters = 3,
        dims = Params.annDims), 10)
    info(f"sf0.1 recall@10: bucketed $bucketed%.3f, ivf-sampled " +
      f"$sampled%.3f, ivf-trained $trained%.3f")
    assert(bucketed >= 0.5, f"sf0.1 bucketed recall $bucketed%.3f < 0.5")
    assert(sampled >= 0.5, f"sf0.1 sampled-IVF recall $sampled%.3f < 0.5")
    assert(trained >= 0.6, f"sf0.1 trained-IVF recall $trained%.3f < 0.6")
    assert(trained >= sampled - 0.05,
      f"training regressed recall at sf0.1: $trained%.3f vs $sampled%.3f")
    emb1.unpersist()
  }

  test("IVF recall@10 clears the floor and multi-probe beats nprobe=1") {
    val r1 = recallOf(Similarity.ivfTopK(emb, probes, "vec_id", "embedding",
      k = 10, nlist = Params.ivfNlist, nprobe = 1), 10)
    val rN = recallOf(Similarity.ivfTopK(emb, probes, "vec_id", "embedding",
      k = 10, nlist = Params.ivfNlist, nprobe = Params.ivfNprobe), 10)
    info(f"ivf recall@10: nprobe=1 $r1%.3f, nprobe=${Params.ivfNprobe} $rN%.3f")
    assert(rN >= r1,
      f"multi-probe must not lose neighbors: $rN%.3f < $r1%.3f")
    assert(rN >= 0.5, f"ivf nprobe=${Params.ivfNprobe} recall@10 $rN%.3f below floor 0.5")
  }

  test("knnGraph (corpus×corpus top-k join) recall floor vs brute force; " +
       "multi-probe amplifies; every vector gets neighbors") {
    val k = 10
    // exact graph over the whole corpus = brute force with probes=corpus
    val r1 = recallAgainst(emb, emb,
      Similarity.knnGraph(emb, "vec_id", "embedding", k,
        nlist = Params.ivfNlist, nprobe = 1), k)
    val r2 = recallAgainst(emb, emb,
      Similarity.knnGraph(emb, "vec_id", "embedding", k,
        nlist = Params.ivfNlist, nprobe = Params.ivfNprobe), k)
    info(f"knnGraph recall@10: nprobe=1 $r1%.3f, nprobe=${Params.ivfNprobe} $r2%.3f")
    assert(r2 >= r1, f"multi-probe must not lose neighbors: $r2%.3f < $r1%.3f")
    assert(r2 >= 0.5, f"knnGraph nprobe=${Params.ivfNprobe} recall@10 $r2%.3f below floor 0.5")
    // graph property: every vector appears as a probe with ≥1 neighbor
    val g = Similarity.knnGraph(emb, "vec_id", "embedding", k,
      nlist = Params.ivfNlist, nprobe = Params.ivfNprobe)
    assert(g.select("probe_id").distinct().count() === emb.count())
    // and no self-loops, no rank beyond k
    assert(g.filter($"probe_id" === $"nn_id").count() === 0L)
    assert(g.agg(org.apache.spark.sql.functions.max($"rank")).head.getLong(0) <= k)
  }
}
