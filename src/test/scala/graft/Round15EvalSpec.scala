package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ext.{Curation, Dedup, Search}

/** Semantic invariants of the round-15 additions (q401–q404) that the
  * oracle hash can't express — the winnowing detection guarantee and
  * tie rule, stress centrality on hand graphs with known counts, and
  * the curriculum's prefix-proportionality contract.
  */
class Round15EvalSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def run(name: String) =
    SparkEntry.queries(name)(spark, TestSpark.sf0001)

  test("q401 winnowing: the Schleimer detection guarantee — two docs " +
       "sharing a token run of >= w+k-1 tokens share a fingerprint") {
    val (k, w) = (Params.winnowK, Params.winnowW)
    val shared = (1 to (w + k - 1)).map(i => s"run$i").mkString(" ")
    val docs = Seq(
      (1L, s"alpha beta gamma $shared tail one two"),
      (2L, s"$shared completely different suffix here"),
      (3L, "no overlap with anything at all whatsoever in this text")
    ).toDF("doc_id", "text")
    val fp = Dedup.winnowingFingerprints(docs, "doc_id", "text", k, w)
      .select("doc_id", "fp_hash").distinct().collect()
      .groupBy(_.getLong(0)).view.mapValues(_.map(_.getLong(1)).toSet)
    assert(fp(1L).intersect(fp(2L)).nonEmpty,
      "shared w+k-1 run must yield a shared fingerprint")
    assert(fp(3L).intersect(fp(1L) ++ fp(2L)).isEmpty,
      "disjoint text must not collide on 28-bit hashes here")
  }

  test("q401 winnowing: rightmost-min tie rule and density bound — a " +
       "constant document selects every window's LAST position") {
    val (k, w) = (Params.winnowK, Params.winnowW)
    val n = 20 // tokens; n-k+1 shingles, all identical => all hash ties
    val docs = Seq((7L, Seq.fill(n)("same").mkString(" ")))
      .toDF("doc_id", "text")
    val sel = Dedup.winnowingFingerprints(docs, "doc_id", "text", k, w)
      .select("fp_pos").as[Long].collect().sorted
    val nSh = n - k + 1
    // every window [p, p+w-1] picks its rightmost position p+w-1
    assert(sel.toSeq === (w - 1 until nSh).map(_.toLong),
      s"got ${sel.toSeq}")
  }

  test("q401/q402 on testdata: density <= windows, pair contract " +
       "(a < b, no dups), and clone pairs surface") {
    val fps = run("q401_winnowing")
    val perDoc = fps.groupBy("doc_id").agg(count(lit(1)).as("nf"))
    assert(perDoc.filter(col("nf") < 1).count() === 0,
      "every document emits at least one fingerprint")
    val pairs = run("q402_winnow_pairs").collect()
    assert(pairs.nonEmpty, "sf0.001 clones must produce candidates")
    pairs.foreach { r =>
      assert(r.getLong(0) < r.getLong(1), s"ordered pair: $r")
      assert(r.getLong(2) >= Params.winnowMinShared)
    }
    assert(pairs.map(r => (r.getLong(0), r.getLong(1))).distinct.length
      === pairs.length, "no duplicate pairs")
  }

  test("q403 stress: path graph a-b-c gives stress(b)=1, ends 0") {
    // co-occurrence support > nd/2: (a,b) and (b,c) in 2 of 3 docs,
    // (a,c) only in 1 => path graph
    val docs = Seq((1L, "aa bb"), (2L, "bb cc"), (3L, "aa bb cc"))
      .toDF("doc_id", "text")
    val out = Search.stressCentrality(docs, "doc_id", "text",
      vocab = 3, supNum = 1, supDen = 2, rounds = 3)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(out === Map("aa" -> 0L, "bb" -> 1L, "cc" -> 0L), out.toString)
  }

  test("q403 stress: 4-cycle — every node carries exactly the one " +
       "opposite-corner pair's two equal shortest paths' single count") {
    // square a-b, b-c, c-d, d-a (each pair in 2 of 8 docs > 8/5);
    // diagonals never co-occur
    val docs = Seq("aa bb", "bb cc", "cc dd", "dd aa")
      .zipWithIndex.flatMap { case (t, i) =>
        Seq((i * 2 + 1L, t), (i * 2 + 2L, t))
      }.toDF("doc_id", "text")
    val out = Search.stressCentrality(docs, "doc_id", "text",
      vocab = 4, supNum = 1, supDen = 5, rounds = 3)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // (a,c) routes a-b-c and a-d-c: one path through b, one through d;
    // (b,d) symmetric => stress 1 everywhere
    assert(out === Map("aa" -> 1L, "bb" -> 1L, "cc" -> 1L, "dd" -> 1L),
      out.toString)
  }

  test("q403 on testdata: stress is non-negative and symmetric-graph " +
       "sane (some interior node carries load iff diameter > 1)") {
    val rows = run("q403_stress_centrality").collect()
    assert(rows.nonEmpty)
    rows.foreach(r => assert(r.getLong(1) >= 0L))
    assert(rows.map(_.getLong(1)).max > 0L,
      "a connected 29-node graph of diameter >= 2 must route paths")
  }

  test("q405 Borůvka: triangle keeps the two heaviest edges") {
    // ab=3, bc=2, ac=1 co-occurrences; support gate passes all
    val docs = (Seq.fill(3)("aa bb") ++ Seq.fill(2)("bb cc") ++ Seq("aa cc"))
      .zipWithIndex.map { case (t, i) => (i + 1L, t) }.toDF("doc_id", "text")
    val out = Search.boruvkaForest(docs, "doc_id", "text",
      vocab = 3, supNum = 1, supDen = 7, rounds = 3)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    assert(out.toSet === Set(("aa", "bb", 3L), ("bb", "cc", 2L)),
      out.toSeq.toString)
  }

  test("q405 Borůvka: weighted 4-cycle drops exactly the lightest edge") {
    // ab=5, bc=4, cd=3, da=2 => forest {ab, bc, cd}
    val texts = Seq.fill(5)("aa bb") ++ Seq.fill(4)("bb cc") ++
      Seq.fill(3)("cc dd") ++ Seq.fill(2)("aa dd")
    val docs = texts.zipWithIndex.map { case (t, i) => (i + 1L, t) }
      .toDF("doc_id", "text")
    val out = Search.boruvkaForest(docs, "doc_id", "text",
      vocab = 4, supNum = 1, supDen = 8, rounds = 3)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    assert(out.toSet === Set(("aa", "bb", 5L), ("bb", "cc", 4L),
      ("cc", "dd", 3L)), out.toSeq.toString)
  }

  test("q405 on testdata: result is a spanning forest — acyclic " +
       "(|E| = |V| - #components) and same components as the graph") {
    val forest = run("q405_boruvka_msf").collect()
    val fEdges = forest.map(r => (r.getString(0), r.getString(1)))
    val nodes = fEdges.flatMap(e => Seq(e._1, e._2)).distinct
    // union-find over the forest edges: acyclicity <=> every edge merges
    val parent = scala.collection.mutable.Map(nodes.map(n => n -> n): _*)
    def find(x: String): String =
      if (parent(x) == x) x else { val r = find(parent(x)); parent(x) = r; r }
    var merges = 0
    fEdges.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      assert(ra != rb, s"cycle via ($a,$b)")
      parent(ra) = rb; merges += 1
    }
    assert(merges == fEdges.length)
    assert(fEdges.nonEmpty && nodes.length - merges >= 1)
  }

  test("q406 dendrogram: monotone levels consistent with the q405 " +
       "forest and the q403 node set") {
    val levels = run("q406_dendrogram").collect()
    val forest = run("q405_boruvka_msf").collect()
    val nNodes = run("q403_stress_centrality").count()
    assert(levels.nonEmpty)
    // ascending threshold => kept edges non-increasing, clusters
    // non-decreasing; every row satisfies the closed form
    levels.sliding(2).foreach {
      case Array(lo, hi) =>
        assert(lo.getLong(0) < hi.getLong(0))
        assert(lo.getLong(1) >= hi.getLong(1))
        assert(lo.getLong(2) <= hi.getLong(2))
      case _ =>
    }
    levels.foreach(r => assert(r.getLong(1) + r.getLong(2) === nNodes))
    // at the lowest threshold every forest edge is kept
    assert(levels.head.getLong(1) === forest.length.toLong)
  }

  test("q407 eccentricity: radius <= diameter <= 2 radius, flags mark " +
       "non-empty center and periphery, diameter matches the q371 census") {
    val rows = run("q407_eccentricity").collect()
    val eccs = rows.map(_.getLong(1))
    val (radius, diameter) = (eccs.min, eccs.max)
    assert(radius >= 1 && radius <= diameter && diameter <= 2 * radius)
    rows.foreach { r =>
      assert((r.getLong(2) == 1L) === (r.getLong(1) == radius))
      assert((r.getLong(3) == 1L) === (r.getLong(1) == diameter))
    }
    val census = run("q371_graph_distances").collect()
    assert(census.map(_.getLong(0)).max === diameter,
      "node eccentricity max must equal the pair-census max distance")
  }

  test("q404 curriculum: f strictly increasing in rank within source, " +
       "f in (0,1), and every source fills ~half of the first half") {
    val rows = run("q404_curriculum").collect()
    assert(rows.nonEmpty)
    val bySrc = rows.groupBy(_.getString(1))
    bySrc.foreach { case (src, rs) =>
      val byRank = rs.sortBy(_.getLong(2))
      byRank.foreach { r =>
        val (rk, n, f) = (r.getLong(2), r.getLong(3), r.getDouble(4))
        assert(f > 0.0 && f < 1.0, s"$src f=$f")
        assert(math.abs(f - (2.0 * rk - 1) / (2.0 * n)) == 0.0)
      }
      // prefix proportionality: ranks with f < 1/2 are exactly the
      // first floor(n/2) (midpoint rule: 2rk-1 < n <=> rk <= n div 2)
      val n = byRank.head.getLong(3)
      val firstHalf = byRank.count(_.getDouble(4) < 0.5)
      assert(firstHalf === (n / 2).toInt, s"$src firstHalf=$firstHalf n=$n")
    }
  }

  test("q404 curriculum: within-source order is quality-descending " +
       "(rank 1 has the max quality)") {
    val docs = TestSpark.spark.read
      .parquet(s"${TestSpark.sf0001}/documents.parquet")
    val q = docs.select(col("doc_id"), col("source"),
      graft.ext.TextStats.qualityScore(col("text"), Params.stopwords)
        .as("quality"))
    val out = Curation.curriculumInterleave(docs, "doc_id", "source",
      "text", Params.stopwords)
    val joined = out.join(q, Seq("doc_id", "source")).collect()
    joined.groupBy(_.getString(1)).foreach { case (_, rs) =>
      val sorted = rs.sortBy(_.getLong(2))
      sorted.sliding(2).foreach {
        case Array(hi, lo) =>
          assert(hi.getDouble(5) > lo.getDouble(5) ||
            (hi.getDouble(5) == lo.getDouble(5) &&
              hi.getLong(0) < lo.getLong(0)),
            s"rank order must follow (quality desc, doc_id): $hi vs $lo")
        case _ =>
      }
    }
  }
}
