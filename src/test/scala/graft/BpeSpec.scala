package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.ext.TextStats

/** BPE merge-loop training against a hand-computed corpus:
  * words {low×3, lower×2, newest×1} yield the merge sequence
  * (l,o) → (lo,w) → (e,r) → (low,er) with pair counts 5,5,2,2 —
  * exercising the frequency argmax, the lexicographic tie-break
  * ((l,o) vs (o,w) at 5), merged symbols re-entering later pairs
  * (lo, then low, then er as units), and greedy run semantics.
  */
class BpeSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("merge table matches the hand computation, ties broken lexicographically") {
    val docs = Seq("low low low", "lower lower", "newest").toDF("text")
    val got = TextStats.bpeTrain(docs, col("text"), 4)
      .as[(Int, String, String, Long)].collect().toSeq
    assert(got == Seq(
      (1, "l", "o", 5L),
      (2, "lo", "w", 5L),
      (3, "e", "r", 2L),
      (4, "low", "er", 2L)))
  }

  test("encode applies the learned merges: per-doc subword counts") {
    val docs = Seq(
      (10L, "low low low"), (20L, "lower lower"), (30L, "newest"))
      .toDF("doc_id", "text")
    val got = TextStats.bpeEncode(docs, "doc_id", col("text"), 4)
      .as[(Long, Long, Long)].collect().toSeq
    // after (l,o)(lo,w)(e,r)(low,er): low→[low], lower→[lower] (the
    // 4th merge is itself applied), newest untouched (no learned pair
    // is adjacent in it)
    assert(got == Seq((10L, 3L, 3L), (20L, 2L, 2L), (30L, 1L, 6L)))
  }

  test("greedy merge is leftmost-first on runs") {
    // 'aaaa' with pair (a,a) must become [aa, aa], so round 2's top
    // pair is (aa, aa) with one occurrence per word instance
    val docs = Seq("aaaa aaaa aaaa").toDF("text")
    val got = TextStats.bpeTrain(docs, col("text"), 2)
      .as[(Int, String, String, Long)].collect().toSeq
    assert(got == Seq((1, "a", "a", 9L), (2, "aa", "aa", 3L)))
  }
}
