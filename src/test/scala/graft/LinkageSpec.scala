package graft

import org.scalatest.funsuite.AnyFunSuite

/** Invariants of the Fellegi–Sunter pattern table (q164): flipping any
  * field from disagree to agree strictly raises the likelihood ratio
  * (m > u for every field), full agreement dominates, full
  * disagreement sits below 1.
  */
class LinkageSpec extends AnyFunSuite {
  private val scores = Params.fsPatterns.toMap

  test("agreement monotonicity: each 0→1 flip raises the score") {
    for ((p, sc) <- Params.fsPatterns; i <- p.indices if p(i) == '0') {
      val flipped = p.updated(i, '1')
      assert(scores(flipped) > sc,
        s"flip $p → $flipped should raise ${sc} → ${scores(flipped)}")
    }
  }

  test("extremes: all-agree maximal and above threshold, all-disagree below 1") {
    val all1 = "1" * Params.fsFields.size
    val all0 = "0" * Params.fsFields.size
    assert(scores(all1) == scores.values.max)
    assert(scores(all1) >= Params.fsMinScore)
    assert(scores(all0) < 1.0)
    assert(scores.values.toSeq.distinct.size == scores.size)
  }
}
