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

  test("textRank: hub outranks leaves, an isolated node holds exactly " +
       "the teleport mass, total mass is bounded by the scale, and the " +
       "fixed-point ranks are bit-deterministic across materializations") {
    val spark2 = spark
    import spark2.implicits._
    // hub co-occurs with every leaf; leaves only with the hub; iso is in
    // the vocabulary but shares no document with any other token
    val docs = Seq((1L, "hub leaf1"), (2L, "hub leaf2"), (3L, "hub leaf3"),
      (4L, "iso")).toDF("doc_id", "text")
    def run() = Search.textRank(docs, "doc_id", "text", vocab = 10,
      dampNum = 17, dampDen = 20, iters = 3, scale = 100000000L)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    val ranks = run().toMap
    assert(ranks.size === 5)
    // dangling node: no in-edges, so every iteration lands on the bare
    // teleport term (3 · 1e8) div (20 · 5)
    assert(ranks("iso") === 3000000L)
    assert(ranks("hub") > ranks("leaf1"))
    assert(ranks("leaf1") === ranks("leaf2"),
      "symmetric leaves must tie exactly")
    assert(ranks("leaf1") === ranks("leaf3"))
    assert(ranks("leaf1") > ranks("iso"),
      "connected nodes accumulate above the teleport floor")
    val total = ranks.values.sum
    assert(total <= 100000000L, "fixed-point floor can only LOSE mass")
    assert(total > 50000000L)
    assert(run().toMap === ranks, "integer ranks must be bit-stable")
  }

  test("bfsHops: exact hop distances on a path graph, null beyond the " +
       "horizon, and an isolated node never reached") {
    val spark2 = spark
    import spark2.implicits._
    // chain a–b–c–d–e (each doc links two successive tokens) plus iso;
    // 'a' is in the most documents so it is the deterministic source
    val docs = Seq((1L, "a b"), (2L, "b c"), (3L, "c d"), (4L, "d e"),
      (5L, "a x"), (6L, "a y"), (7L, "iso")).toDF("doc_id", "text")
    val hops = Search.bfsHops(docs, "doc_id", "text",
      vocab = 10, iters = 3)
      .collect().map(r => (r.getString(0),
        if (r.isNullAt(1)) -1L else r.getLong(1))).toMap
    assert(hops("a") === 0L, "source is the highest-df token")
    assert(hops("b") === 1L && hops("x") === 1L && hops("y") === 1L)
    assert(hops("c") === 2L)
    assert(hops("d") === 3L)
    assert(hops("e") === -1L, "4 hops away — beyond the 3-iter horizon")
    assert(hops("iso") === -1L, "isolated node is never relaxed")
  }

  test("phraseSearch: true adjacency only (intermediate tokens break " +
       "the phrase), order matters, repeated-token phrases and " +
       "overlapping runs count correctly, positions are 1-based") {
    val spark2 = spark
    import spark2.implicits._
    val docs = Seq(
      (1L, "a b c a b"),     // two hits at pos 1 and 4
      (2L, "a x b"),         // adjacent in the FILTERED set, not corpus
      (3L, "b a"),           // wrong order
      (4L, "a a b"),         // hit at pos 2 (not 1)
      (5L, "c c c")).toDF("doc_id", "text")
    val ab = Search.phraseSearch(docs, "doc_id", "text", "a", "b")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(ab.toSeq === Seq((1L, 2L, 1L), (4L, 1L, 2L)))
    // t1 = t2: "c c c" has runs at pos 1-2 and 2-3 — both count
    val cc = Search.phraseSearch(docs, "doc_id", "text", "c", "c")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(cc.toSeq === Seq((5L, 2L, 1L)))
  }

  test("triangleStats: exact census on a hand-countable graph — one " +
       "triangle, hub wedges, isolated node in the vocab but not the " +
       "degree table") {
    val spark2 = spark
    import spark2.implicits._
    // edges pq, pr, qr (triangle) + ps (pendant); iso has no edges
    val docs = Seq((1L, "p q r"), (2L, "p q"), (3L, "p s"), (4L, "iso"))
      .toDF("doc_id", "text")
    val row = Search.triangleStats(docs, "doc_id", "text", vocab = 10)
      .head()
    assert(row.getLong(0) === 5L, "nodes: p q r s iso")
    assert(row.getLong(1) === 4L, "edges: pq pr qr ps")
    // wedges: p C(3,2)=3, q C(2,2)=1, r 1, s 0 → 5
    assert(row.getLong(2) === 5L)
    assert(row.getLong(3) === 1L, "exactly the p-q-r triangle")
    assert(row.getDouble(4) === 0.6, "3·1/5")
  }
}
