package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.ext.{Dedup, Shingles, TextStats}

/** Dedup family semantics on hand-built corpora: exact-by-content,
  * MinHash/LSH recall of true near-dups, SimHash locality, exact n-gram
  * Jaccard values.
  */
class DedupSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val docA  = "the quick brown fox jumps over the lazy dog today"
  private val docA2 = "the quick brown fox jumps over the lazy dog tonight"
  private val docB  = "completely different content about spark engines here"

  private def corpus = Seq(
    (1L, docA), (2L, docA2), (3L, docB),
    (4L, "The quick brown fox jumps over the lazy dog today."), // = 1 normalized
    (5L, docB)).toDF("doc_id", "text")

  test("exact dedup groups case/punctuation-normalized duplicates") {
    val out = Dedup.exactByContent(corpus, "doc_id", "text")
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    // 1≡4 (normalization), 3≡5 (identical), 2 unique
    assert(out.toSeq === Seq((1L, 2L), (2L, 1L), (3L, 2L)))
  }

  test("minhash: identical docs share full signatures; near-dups share bands") {
    val pairs = Dedup.minhashCandidates(corpus, "doc_id", "text",
      shingleK = 3, numHashes = 16, rowsPerBand = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((3L, 5L)), "identical docs must be candidates")
    assert(pairs.contains((1L, 2L)), "one-word-edit near-dups should collide")
    assert(!pairs.contains((1L, 3L)) && !pairs.contains((2L, 3L)),
      "unrelated docs must not be candidates")
  }

  test("minhash signature is deterministic and per-seed minimal") {
    val sig = Dedup.minhashSignatures(corpus.filter($"doc_id" === 1),
      "doc_id", "text", 3, 4, 2)
      .select("signature").head().getSeq[Long](0)
    val toks = docA.split(" ").toSeq
    val shingles = toks.sliding(3).map(_.mkString(" ")).toSeq
    def md5hex(s: String) = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    val bases = shingles.map(sh =>
      java.lang.Long.parseLong(md5hex(sh).take(7), 16))
    val expected = (0 until 4).map(i => bases.map(x =>
      (x * Shingles.affineA(i) + Shingles.affineB(i)) % Shingles.MinHashP).min)
    assert(sig === expected)
  }

  test("simhash: identical docs match; near-dups within small hamming") {
    val fps = corpus.select($"doc_id", Dedup.simhash($"text", 16).as("fp"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(fps(3L) === fps(5L))
    def hamming(a: String, b: String) = a.zip(b).count { case (x, y) => x != y }
    assert(hamming(fps(1L), fps(2L)) <= 4,
      s"near-dup hamming too large: ${hamming(fps(1L), fps(2L))}")
    assert(hamming(fps(1L), fps(3L)) > 0)
  }

  test("ngram jaccard computes the exact set similarity") {
    val out = Dedup.ngramJaccardPairs(
      Seq((1L, docA), (2L, docA2)).toDF("doc_id", "text"),
      "doc_id", "text", k = 3, minJaccard = 0.0)
      .head()
    // 8 distinct 3-shingles each, 7 shared → J = 7 / 9
    assert(out.getLong(0) === 1L && out.getLong(1) === 2L)
    assert(math.abs(out.getDouble(2) - 7.0 / 9.0) < 1e-12)
  }

  test("dedupClusters: transitive closure with min-id labels") {
    // chain 1-2-3-4 (diameter 3, needs >1 propagation round) + pair 9-10
    val pairs = Seq((1L, 2L), (2L, 3L), (3L, 4L), (9L, 10L))
      .toDF("id_a", "id_b")
    val out = Dedup.dedupClusters(pairs).orderBy("id")
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(out.toSeq === Seq((1L, 1L), (2L, 1L), (3L, 1L), (4L, 1L),
      (9L, 9L), (10L, 9L)))
  }

  test("dedupClustersStar ≡ dedupClusters; converges fast on a deep path") {
    // same shallow graph as above
    val pairs = Seq((1L, 2L), (2L, 3L), (3L, 4L), (9L, 10L))
      .toDF("id_a", "id_b")
    val star = Dedup.dedupClustersStar(pairs).orderBy("id")
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(star.toSeq === Seq((1L, 1L), (2L, 1L), (3L, 1L), (4L, 1L),
      (9L, 9L), (10L, 9L)))

    // a 400-node PATH (diameter 399): label propagation would need ~400
    // rounds; star contraction is O(log n) — this completing at all in
    // test time is the point. Shuffled ids so structure ≠ id order.
    val n = 400
    val perm = new scala.util.Random(7).shuffle((0L until n).toVector)
    val path = (0 until n - 1).map(i => (perm(i), perm(i + 1)))
      .toDF("id_a", "id_b")
    val out = Dedup.dedupClustersStar(path).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(out.length === n)
    assert(out.map(_._2).distinct.toSeq === Seq(0L),
      "one component labeled by its min id")

    // random graph: star and propagation must agree exactly
    val rnd = new scala.util.Random(11)
    val randPairs = Seq.fill(300)((rnd.nextInt(120).toLong,
      rnd.nextInt(120).toLong))
      .filter(p => p._1 != p._2).toDF("id_a", "id_b")
    val a = Dedup.dedupClusters(randPairs).collect()
      .map(r => (r.getLong(0), r.getLong(1))).sorted
    val b = Dedup.dedupClustersStar(randPairs).collect()
      .map(r => (r.getLong(0), r.getLong(1))).sorted
    assert(a.toSeq === b.toSeq)
  }

  test("dedupClustersDual ≡ two independent dedupClusters runs " +
       "(full graph + flagged subgraph), including flag-free nodes") {
    // random graph with a random hi flag; nodes incident only to
    // lo edges must come back as their own hi singletons
    val rnd = new scala.util.Random(29)
    val pairs = Seq.fill(300)((rnd.nextInt(120).toLong,
        rnd.nextInt(120).toLong, rnd.nextInt(4) == 0))
      .filter(p => p._1 != p._2).toDF("id_a", "id_b", "hi")
    val dual = Dedup.dedupClustersDual(pairs).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sorted.toSeq
    val all = Dedup.dedupClusters(pairs.select("id_a", "id_b")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    val hi = Dedup.dedupClusters(
        pairs.filter(col("hi")).select("id_a", "id_b")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    val expected = all.keys.toSeq.sorted
      .map(id => (id, all(id), hi.getOrElse(id, id)))
    assert(dual === expected)
    assert(dual.exists { case (id, _, ch) => ch == id && all(id) != id },
      "fixture exercises a lo-edge-only node inside a nontrivial " +
        "full-graph component")
  }

  test("hot bucket: 1000 identical docs stream all pairs, no giant row") {
    // Every doc shares every band key → 4 buckets of size 1000. Round 1
    // materialized each bucket's 499,500 pairs as ONE array value; the
    // streaming expansion emits them row-by-row, so this completes in
    // bounded memory with the full pair set intact.
    val docs = spark.range(1000).select(col("id").as("doc_id"),
      lit("identical boilerplate text repeated across the corpus").as("text"))
    val pairs = Dedup.minhashCandidates(docs, "doc_id", "text",
      shingleK = 3, numHashes = 16, rowsPerBand = 4)
    // identical docs share ALL 4 bands — the minimal-band guard must emit
    // each pair exactly once (count would be 4× on a duplicate leak)
    assert(pairs.count() === 1000L * 999 / 2)
  }

  test("minhash and ngram generators compose in one plan (unique metric names)") {
    // Two different capped generators in one query used to collide on a
    // shared observed-metric name and fail analysis.
    val docs = Seq((1L, docA), (2L, docA2)).toDF("doc_id", "text")
    val u = Dedup.minhashCandidates(docs, "doc_id", "text",
        shingleK = 3, numHashes = 16, rowsPerBand = 4)
      .unionByName(Dedup.ngramJaccardPairs(docs, "doc_id", "text",
        k = 3, minJaccard = 0.0).select("id_a", "id_b"))
    assert(u.count() >= 2)
  }

  test("oversized buckets are dropped, normal pairs survive, drop is observable") {
    // 100 identical docs (degenerate bucket) + one true near-dup pair.
    val degenerate = spark.range(100).select((col("id") + 100).as("doc_id"),
      lit("identical boilerplate text repeated across the corpus").as("text"))
    val docs = Seq((1L, docA), (2L, docA2)).toDF("doc_id", "text")
      .unionByName(degenerate)
    val pairs = Dedup.minhashCandidates(docs, "doc_id", "text",
      shingleK = 3, numHashes = 16, rowsPerBand = 4, maxBucket = 10)
    val got = pairs.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got.contains((1L, 2L)), "capping must not affect normal buckets")
    assert(!got.exists(_._1 >= 100L), "oversized bucket must emit no pairs")
    // no silent caps: the drop count is an observed metric on the query
    val m = pairs.queryExecution.observedMetrics(Dedup.MinhashBucketMetrics)
    assert(m.getAs[Long]("oversized_dropped") === 4L) // all 4 bands hot
  }

  test("ngram jaccard: posting-list cap drops hot shingles observably") {
    val degenerate = spark.range(50).select((col("id") + 100).as("doc_id"),
      lit("spam spam spam spam spam").as("text"))
    val docs = Seq((1L, docA), (2L, docA2)).toDF("doc_id", "text")
      .unionByName(degenerate)
    val out = Dedup.ngramJaccardPairs(docs, "doc_id", "text",
      k = 3, minJaccard = 0.0, maxPosting = 10)
    val got = out.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got === Set((1L, 2L)), "hot-shingle pairs dropped, normal kept")
    val m = out.queryExecution.observedMetrics(Dedup.NgramBucketMetrics)
    assert(m.getAs[Long]("oversized_dropped") >= 1L)
  }

  test("wordShingles: short docs collapse to one whole-doc shingle") {
    val sh = Seq((1L, "two words")).toDF("id", "text")
      .select(Shingles.wordShingles(TextStats.tokens($"text"), 5).as("s"))
      .head().getSeq[String](0)
    assert(sh === Seq("two words"))
  }

  test("incremental dedup: exact dup, near dup, and fresh docs gate correctly") {
    val corpusDocs = Seq((1L, docA), (2L, docB)).toDF("doc_id", "text")
    val batch = Seq(
      (10L, "The quick brown fox jumps over the lazy dog today."), // ≡ 1
      (11L, docA2),                                   // near-dup of 1
      (12L, "entirely novel musings on distributed query planning"))
      .toDF("doc_id", "text")
    val survivors = Dedup.incrementalNew(batch, corpusDocs,
      "doc_id", "text", shingleK = 3, numHashes = 16, rowsPerBand = 4)
      .select("doc_id").as[Long].collect().toSet
    assert(!survivors.contains(10L), "exact duplicate must be dropped")
    assert(!survivors.contains(11L), "near-duplicate must share a band and drop")
    assert(survivors === Set(12L), "novel content must survive")
  }

  test("incremental dedup: empty corpus admits the whole batch") {
    val batch = Seq((1L, docA), (2L, docB)).toDF("doc_id", "text")
    val empty = Seq.empty[(Long, String)].toDF("doc_id", "text")
    val survivors = Dedup.incrementalNew(batch, empty, "doc_id", "text",
      shingleK = 3, numHashes = 16, rowsPerBand = 4)
      .select("doc_id").as[Long].collect().toSet
    assert(survivors === Set(1L, 2L))
  }

  test("bloomNewDocs ≡ plain fingerprint anti-join, any fpp") {
    val docs = Tables.load(spark, TestSpark.sf0001, "documents")
      .select(col("doc_id").cast("long").as("doc_id"), col("text"))
    val gate = Shingles.baseHash(col("doc_id").cast("string")) % 3 === 0
    val batch = docs.filter(gate)
    val corpusDocs = docs.filter(!gate)
    val fp = TextStats.contentFingerprint(col("text"))
    val expected = batch.withColumn("__fp", fp)
      .join(corpusDocs.select(fp.as("__fp")).distinct(), Seq("__fp"),
        "left_anti")
      .select("doc_id").as[Long].collect().toSet
    // a sloppy filter (high fpp) must not change the ANSWER, only how
    // much of the batch rides the residual join
    for (fpp <- Seq(0.01, 0.5)) {
      val got = Dedup.bloomNewDocs(batch, corpusDocs, "text",
        expectedItems = 10000L, fpp = fpp)
        .select("doc_id").as[Long].collect().toSet
      assert(got === expected, s"fpp=$fpp")
    }
  }

  test("bloomNewDocs: exact dup dropped, near-dup kept, empty corpus " +
       "admits all") {
    val corpusDocs = Seq((1L, docA), (2L, docB)).toDF("doc_id", "text")
    val batch = Seq(
      (10L, "The quick brown fox jumps over the lazy dog today."), // ≡ 1
      (11L, docA2), // near-dup: DIFFERENT fingerprint, exact dedup keeps it
      (12L, "entirely novel musings on distributed query planning"))
      .toDF("doc_id", "text")
    val survivors = Dedup.bloomNewDocs(batch, corpusDocs, "text")
      .select("doc_id").as[Long].collect().toSet
    assert(survivors === Set(11L, 12L))
    val empty = Seq.empty[(Long, String)].toDF("doc_id", "text")
    val all = Dedup.bloomNewDocs(batch, empty, "text")
      .select("doc_id").as[Long].collect().toSet
    assert(all === Set(10L, 11L, 12L))
  }

  test("duplicatedSpanStats: verbatim copies score 1.0, unique docs 0.0, " +
       "partial overlap counts exactly the shared spans") {
    val docs = Seq(
      (1L, "a b c d e f"),          // copied verbatim as doc 2
      (2L, "a b c d e f"),
      (3L, "q r s t u v w"),        // entirely unique
      (4L, "x y a b c d z"))        // shares exactly span "a b c d" w/ 1,2
      .toDF("doc_id", "text")
    val out = Dedup.duplicatedSpanStats(docs, "doc_id", "text", k = 4)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
    // 6 tokens, k=4 → 3 spans each for docs 1/2; all shared
    assert(out(1L) === ((3L, 3L, 1.0)))
    assert(out(2L) === ((3L, 3L, 1.0)))
    assert(out(3L) === ((4L, 0L, 0.0)))
    // doc 4: spans xyab/yabc/abcd/bcdz — only "a b c d" appears elsewhere
    assert(out(4L) === ((4L, 1L, 0.25)))
  }

  test("duplicatedSpanStats: short docs (≤ k tokens) collapse to one " +
       "whole-doc span") {
    val docs = Seq((1L, "tiny doc"), (2L, "tiny doc"), (3L, "other one"))
      .toDF("doc_id", "text")
    val out = Dedup.duplicatedSpanStats(docs, "doc_id", "text", k = 5)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2))))
      .toMap
    assert(out(1L) === ((1L, 1L)) && out(2L) === ((1L, 1L)))
    assert(out(3L) === ((1L, 0L)))
  }

  test("duplicateSpanCoverage: overlapping duplicated spans union " +
       "(no double-count), full copies 1.0, unique docs 0.0") {
    val docs = Seq(
      (1L, "a b c d e f g h"),      // copied verbatim as doc 2
      (2L, "a b c d e f g h"),
      (3L, "q r s t u v w x"),      // entirely unique
      (4L, "x a b c d e y z"),      // shares "a b c d" @1 and "b c d e" @2
      (5L, "tiny doc"),             // short-doc whole-span case
      (6L, "tiny doc"))
      .toDF("doc_id", "text")
    val out = Dedup.duplicateSpanCoverage(docs, "doc_id", "text", k = 4)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
    assert(out(1L) === ((8L, 8L, 1.0)))
    assert(out(2L) === ((8L, 8L, 1.0)))
    assert(out(3L) === ((8L, 0L, 0.0)))
    // doc 4: duplicated intervals [1,4] and [2,5] union to [1,5] —
    // 5 covered tokens, NOT 8 (the naive per-span sum)
    assert(out(4L) === ((8L, 5L, 0.625)))
    assert(out(5L) === ((2L, 2L, 1.0)) && out(6L) === ((2L, 2L, 1.0)))
  }

  test("fuzzyBlockedPairs: no cross-block pairs, exact distances, " +
       "threshold inclusive, a<b canonical order") {
    val docs = Seq(
      (1L, "s1", "en", "kitten sat on the mat"),
      (2L, "s1", "en", "sitten sat on the mat"),   // dist 1 from doc 1
      (3L, "s1", "de", "kitten sat on the mat"),   // other block: no pair
      (4L, "s2", "en", "kitten sat on the mat"),   // other block: no pair
      (5L, "s1", "en", "totally different words"))
      .toDF("doc_id", "source", "lang", "text")
    val out = Dedup.fuzzyBlockedPairs(docs, "doc_id",
      Seq("source", "lang"), "text", prefixLen = 40, maxDist = 1)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(out.toSeq === Seq((1L, 2L, 1L)))

    // raising the threshold admits in-block pairs only, never 3 or 4
    val wide = Dedup.fuzzyBlockedPairs(docs, "doc_id",
      Seq("source", "lang"), "text", prefixLen = 40, maxDist = 100)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(wide === Set((1L, 2L), (1L, 5L), (2L, 5L)))

    intercept[IllegalArgumentException] {
      Dedup.fuzzyBlockedPairs(docs, "doc_id", Seq.empty, "text", 40, 1)
    }
  }

  test("containmentPairs: a quoted excerpt scores ~1 despite tiny " +
       "Jaccard; directions are independent; near-identical docs pass " +
       "both ways") {
    val spark2 = spark
    import spark2.implicits._
    val quote = "alpha beta gamma delta epsilon"
    val docs = Seq(
      (1L, quote), // 3 shingles, all inside doc 2
      (2L, s"intro words here $quote and a very long tail of filler " +
        "tokens that keeps the jaccard far below any threshold"),
      (3L, "totally unrelated content with nothing shared at all"),
      (4L, quote + " x"), // superset of doc 1 by one token
      (5L, quote + " x")) // identical to doc 4
      .toDF("doc_id", "text")
    val out = Dedup.containmentPairs(docs, "doc_id", "text", k = 3,
      cNum = 4, cDen = 5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(3)))
    val pairs = out.map(t => (t._1, t._2)).toSet
    assert(pairs.contains((1L, 2L)), "excerpt contained in the long doc")
    assert(!pairs.contains((2L, 1L)), "the long doc is NOT in the excerpt")
    assert(pairs.contains((4L, 5L)) && pairs.contains((5L, 4L)),
      "identical docs contain each other")
    assert(pairs.contains((1L, 4L)), "subset by one trailing shingle")
    assert(!pairs.exists(p => p._1 == 3L || p._2 == 3L))
    assert(out.filter(t => t._1 == 1L && t._2 == 2L).head._3 === 1.0)
    // sanity: the same corpus under the symmetric gate has no (1,2) pair
    val jac = Dedup.ngramJaccardPairs(docs, "doc_id", "text", 3, 0.8)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(!jac.contains((1L, 2L)),
      "jaccard at the same strictness misses the quoted excerpt")
  }

  test("fuzzyBlockAudit: per-block pair counts, largest first, and the " +
       "join's probe side is block-repartitioned to shuffle width") {
    val docs = Seq(
      (1L, "s1", "en", "a"), (2L, "s1", "en", "b"), (3L, "s1", "en", "c"),
      (4L, "s1", "de", "d"), (5L, "s1", "de", "e"),
      (6L, "s2", "en", "f"))
      .toDF("doc_id", "source", "lang", "text")
    val audit = Dedup.fuzzyBlockAudit(docs, Seq("source", "lang"))
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2),
        r.getLong(3)))
    assert(audit.toSeq === Seq(("s1", "en", 3L, 3L), ("s1", "de", 2L, 1L),
      ("s2", "en", 1L, 0L)))

    // The quadratic verify must be parallelized by BLOCK, not by file
    // split — a compact parquet input arrives as one split and would
    // otherwise serialize the whole DP on one task.
    val plan = Dedup.fuzzyBlockedPairs(docs, "doc_id",
      Seq("source", "lang"), "text", 40, 1)
      .queryExecution.executedPlan.toString
    assert(plan.contains("hashpartitioning(source"),
      s"expected an explicit block-key repartition in:\n$plan")
  }

  test("prefixFilterJaccardPairs ≡ ngramJaccardPairs on adversarial " +
       "docs — the prefix filter is lossless, incl. the exact t=1/2 " +
       "boundary, identical docs, whole-doc shingles, and empty docs") {
    val docs = Seq(
      (1L, "p q r s"),   // shingles(k=2): {p q, q r, r s}
      (2L, "p q r t"),   // shares 2 of 4 distinct → jaccard exactly 1/2
      (3L, "p q x y"),   // shares only {p q} → 1/5, filtered out
      (4L, "p q r s"),   // verbatim copy of 1 → 1.0
      (5L, "zz ww"),     // ≤ k tokens → one whole-doc shingle, unique
      (6L, ""), (7L, "")) // empty docs → single empty shingle → pair
      .toDF("doc_id", "text")
    def norm(df: org.apache.spark.sql.DataFrame) = df
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      .sortBy(p => (p._1, p._2)).toSeq
    val pref = norm(Dedup.prefixFilterJaccardPairs(docs, "doc_id", "text",
      shingleK = 2, tNum = 1, tDen = 2))
    val full = norm(Dedup.ngramJaccardPairs(docs, "doc_id", "text", 2, 0.5))
    assert(pref === full, "prefix-filtered result must equal all-pairs")
    assert(pref === Seq((1L, 2L, 0.5), (1L, 4L, 1.0), (2L, 4L, 0.5),
      (6L, 7L, 1.0)))
  }

  test("prefixFilterJaccardPairs ≡ ngramJaccardPairs on the real corpus") {
    val docs = spark.read.parquet(s"${TestSpark.sf0001}/documents.parquet")
    def key(df: org.apache.spark.sql.DataFrame) = df
      .collect().map(r => (r.getLong(0), r.getLong(1),
        math.round(r.getDouble(2) * 1e12))).sortBy(p => (p._1, p._2)).toSeq
    val pref = key(Dedup.prefixFilterJaccardPairs(docs, "doc_id", "text",
      Params.shingleK, Params.ppjTNum, Params.ppjTDen))
    val full = key(Dedup.ngramJaccardPairs(docs, "doc_id", "text",
      Params.shingleK, Params.jaccardMin))
    assert(pref === full)
    assert(pref.nonEmpty, "corpus must exercise the join")
  }
}
