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
      "vec_id", "embedding", k = 5, bits = 3)
      .collect().map(_.getAs[Long]("nn_id")).toSet
    // bucket of v1 = "111" (signs of 1,0,0 → ≥0); v4=(−1,0,0) → "011"
    assert(out === Set(2L, 3L, 5L))
    val plan = Similarity.bucketedTopK(vecs, vecs, "vec_id", "embedding", 2, 3)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"),
      "bucketed path must not fall back to a cross join")
  }
}
