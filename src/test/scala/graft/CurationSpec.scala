package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.ext.Curation

class CurationSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("contaminationPairs finds shared shingles; decontaminate drops " +
       "offenders and only offenders") {
    val bench = Seq((1L, "the quick brown fox jumps over the lazy dog"))
      .toDF("doc_id", "text")
    val train = Seq(
      (10L, "intro text then the quick brown fox jumps over the lazy dog"),
      (11L, "completely unrelated words about spark aggregation plans"),
      (12L, "the quick brown fox appears but the shingle run is broken up"))
      .toDF("doc_id", "text")
    val pairs = Curation.contaminationPairs(train, bench, "doc_id", "text",
      k = 5).collect()
    assert(pairs.map(_.getAs[Long]("train_id")).toSet === Set(10L),
      "only the verbatim-overlap doc shares a 5-gram")
    assert(pairs.head.getAs[Long]("shared_shingles") === 5)
    // the 9-token bench doc has 5 distinct 5-shingles, all inside doc 10

    val clean = Curation.decontaminate(train, bench, "doc_id", "text", 5)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(clean === Set(11L, 12L))
    // broadcast of the bench side, not the corpus
    val plan = Curation.contaminationPairs(train, bench, "doc_id", "text", 5)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), s"expected broadcast in:\n$plan")
  }

  test("packSequences: in-order quota packing, bit-exact pack ids, " +
       "documented oversized-doc behavior") {
    val docs = Seq(
      ("a", 1L, 300L), ("a", 2L, 300L), ("a", 3L, 300L), ("a", 4L, 50L),
      ("b", 5L, 600L), ("b", 6L, 10L))
      .toDF("source", "doc_id", "n_tokens")
    val packed = Curation.packSequences(docs, "doc_id", "n_tokens",
      "source", budget = 512)
      .select("source", "doc_id", "pack_id").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).sorted
    // a: prior sums 0,300,600,900 → packs 0,0,1,1 ; b: 0,600 → 0,1
    assert(packed.toSeq === Seq(("a", 1L, 0L), ("a", 2L, 0L),
      ("a", 3L, 1L), ("a", 4L, 1L), ("b", 5L, 0L), ("b", 6L, 1L)))

    // oversized doc: consumes multiple quota slots → pack ids SKIP (the
    // documented quota-interval contract, distinct from first-fit greedy
    // which would co-pack doc 13 with doc 12)
    val over = Seq(("c", 10L, 100L), ("c", 11L, 1000L), ("c", 12L, 500L),
      ("c", 13L, 100L)).toDF("source", "doc_id", "n_tokens")
    val op = Curation.packSequences(over, "doc_id", "n_tokens", "source",
      budget = 512)
      .select("doc_id", "pack_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).sorted
    // priors 0,100,1100,1600 → packs 0,0,2,3 (pack 1 skipped)
    assert(op.toSeq === Seq((10L, 0L), (11L, 0L), (12L, 2L), (13L, 3L)))
  }

  test("redactPii replaces emails/phones/IPs with typed tokens and " +
       "counts match") {
    val docs = Seq(
      (1L, "contact alice.smith+x@example.co.uk or call 415-555-1234 now"),
      (2L, "server at 10.0.0.1 and 192.168.1.255, mail bob@test.io"),
      (3L, "no pii here, just 1234 and a.b notation and version 1.2.3"),
      (4L, "overlap: 415 555 1234 then 999.1.2.3"))
      .toDF("doc_id", "text")
    val out = docs.select(Seq(col("doc_id"),
      Curation.redactPii(col("text")).as("red")) ++
      Curation.piiCounts(col("text")): _*)
      .orderBy("doc_id").collect()

    assert(out(0).getAs[String]("red") ===
      "contact [EMAIL] or call [PHONE] now")
    assert(out(1).getAs[String]("red") ===
      "server at [IP] and [IP], mail [EMAIL]")
    assert(out(2).getAs[String]("red") ===
      "no pii here, just 1234 and a.b notation and version 1.2.3")
    assert(out(3).getAs[String]("red") === "overlap: [PHONE] then [IP]")
    assert(out(0).getAs[Int]("n_emails") === 1)
    assert(out(0).getAs[Int]("n_phones") === 1)
    assert(out(1).getAs[Int]("n_ips") === 2)
    assert(out(2).getAs[Int]("n_emails") +
      out(2).getAs[Int]("n_phones") + out(2).getAs[Int]("n_ips") === 0)
  }

  test("curateCorpus end-to-end: monotone survivor counts, " +
       "deterministic, packed output") {
    val docs = Tables.load(spark, TestSpark.sf0001, "documents")
    val bench = docs.filter(col("doc_id") < 5)
    val train = docs.filter(col("doc_id") >= 5)
    def run() = graft.ext.Curation.curateCorpus(train, bench,
      "doc_id", "text", "source", minQuality = 0.0,
      stopwords = Seq("the", "a", "of"), shingleK = 5,
      rates = Map("src0" -> 1.0), defaultRate = 0.8, packBudget = 512)

    val (packed, r) = run()
    // every stage may only LOSE rows, never invent them
    assert(r.input >= r.afterQuality)
    assert(r.afterQuality >= r.afterExactDedup)
    assert(r.afterExactDedup >= r.afterNearDedup)
    assert(r.afterNearDedup >= r.afterDecontam)
    assert(r.afterDecontam >= r.afterMix)
    assert(r.afterMix > 0 && r.packs > 0)
    // output carries the pack assignment and survived-row count matches
    assert(packed.columns.contains("pack_id"))
    assert(packed.count() === r.afterMix)

    // end-to-end determinism: a rerun yields the identical corpus
    val (packed2, r2) = run()
    assert(r === r2)
    assert(packed.select("doc_id", "pack_id")
      .exceptAll(packed2.select("doc_id", "pack_id")).isEmpty)
  }

  test("sampleMixture: deterministic, rate-keyed by group, composable " +
       "with itself") {
    val docs = spark.range(2000).select(col("id").as("doc_id"),
      when(col("id") % 2 === 0, "head").otherwise("tail").as("source"))
    val kept = Curation.sampleMixture(docs, "doc_id", "source",
      Map("head" -> 0.9), defaultRate = 0.2)
    val counts = kept.groupBy("source").count().collect()
      .map(r => (r.getString(0), r.getLong(1))).toMap
    // 1000 docs per group; hash gate keeps ≈ rate ± a few percent
    assert(counts("head") > 850 && counts("head") <= 1000, counts.toString)
    assert(counts("tail") > 140 && counts("tail") < 260, counts.toString)
    // deterministic: rerun keeps the exact same rows
    val a = kept.select("doc_id").collect().map(_.getLong(0)).sorted.toSeq
    val b = Curation.sampleMixture(docs, "doc_id", "source",
      Map("head" -> 0.9), defaultRate = 0.2)
      .select("doc_id").collect().map(_.getLong(0)).sorted.toSeq
    assert(a === b)
    // monotone: tightening the rate keeps a subset, never different rows
    val tight = Curation.sampleMixture(docs, "doc_id", "source",
      Map("head" -> 0.5), defaultRate = 0.1)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(tight.subsetOf(a.toSet))
  }

  test("repetitionStats: known duplicate-2gram and top-2gram fractions") {
    val docs = Seq(
      (1L, "a b a b a b"),   // 2-grams: ab,ba,ab,ba,ab → n=5, d=2, top=3
      (2L, "v w x y z"),     // all distinct → n=4, d=4, top=1
      (3L, "solo"))          // short doc → one whole-doc gram
      .toDF("doc_id", "text")
    val got = Curation.repetitionStats(docs, "doc_id", "text", k = 2)
      .orderBy("doc_id")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getDouble(4), r.getDouble(5)))
    assert(got(0) === ((1L, 5L, 2L, 3L, 3.0 / 5.0, 3.0 / 5.0)))
    assert(got(1) === ((2L, 4L, 4L, 1L, 0.0, 0.25)))
    assert(got(2) === ((3L, 1L, 1L, 1L, 0.0, 1.0)))
  }

  test("chunkTokens: window arithmetic, overlap, tail chunk, and " +
       "lossless reconstruction from stride-aligned pieces") {
    val docs = Seq(
      (1L, (1 to 10).map(i => s"w$i").mkString(" ")), // 10 toks
      (2L, "a b c"),                                  // shorter than len
      (3L, ""),                                       // no tokens → no rows
      (4L, "solo"))
      .toDF("doc_id", "text")
    val out = Curation.chunkTokens(docs, "doc_id", "text",
      len = 4, stride = 3)
      .orderBy("doc_id", "chunk_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3),
        r.getLong(4)))

    // doc 1: starts 1,4,7,10 → 4 chunks, last is the 1-token tail
    val d1 = out.filter(_._1 == 1L)
    assert(d1.map(_._3).toSeq === Seq(1L, 4L, 7L, 10L))
    assert(d1.map(_._5).toSeq === Seq(4L, 4L, 4L, 1L))
    assert(d1.head._4 === "w1 w2 w3 w4")
    assert(d1(1)._4 === "w4 w5 w6 w7", "stride 3 < len 4 ⇒ 1-token overlap")
    // reconstruction: first (stride) tokens of every chunk + the tail
    // of the last = the original token stream
    val rebuilt = d1.init.flatMap(_._4.split(" ").take(3)) ++
      d1.last._4.split(" ")
    assert(rebuilt.toSeq === (1 to 10).map(i => s"w$i"))

    assert(out.filter(_._1 == 2L).map(c => (c._3, c._4)).toSeq ===
      Seq((1L, "a b c")))
    assert(!out.exists(_._1 == 3L), "empty doc yields no chunk rows")
    assert(out.filter(_._1 == 4L).map(_._4).toSeq === Seq("solo"))
    // chunk ids are dense from 0 in every doc
    out.groupBy(_._1).foreach { case (_, rows) =>
      assert(rows.map(_._2).toSeq === rows.indices.map(_.toLong))
    }
  }

  test("shareCap: greedy-by-length survivors, integer cap exact, " +
       "per-source independence") {
    // source A: lengths 5,3,2,1 (total 11, cap 1/2 → budget 5.5):
    //   cum 5 ✓, 8 ✗ ⇒ only the length-5 doc survives
    // source B: lengths 4,4 (total 8, cap 1/2 → budget 4):
    //   cum 4 ✓, 8 ✗ ⇒ exactly one survives (boundary is inclusive)
    def words(n: Int) = (1 to n).map(_ => "w").mkString(" ")
    val docs = Seq(
      (1L, "A", words(5)), (2L, "A", words(3)), (3L, "A", words(2)),
      (4L, "A", words(1)),
      (10L, "B", words(4)), (11L, "B", words(4)))
      .toDF("doc_id", "source", "text")
    val kept = Curation.shareCap(docs, "doc_id", "source", "text",
      capNum = 1, capDen = 2)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(3)))
    assert(kept.toSet === Set((1L, "A", 5L), (10L, "B", 4L)),
      "ties break by id asc; boundary 2·cum = total is kept")

    // cap 1/1 keeps everything
    val all = Curation.shareCap(docs, "doc_id", "source", "text", 1, 1)
      .count()
    assert(all === 6L)

    intercept[IllegalArgumentException] {
      Curation.shareCap(docs, "doc_id", "source", "text", 3, 2)
    }
  }

  test("prioritySample: deterministic, ≤ k, positive weights only, " +
       "scale-invariant in the weights, and planned as a top-k — " +
       "never a global sort") {
    val spark2 = spark
    import spark2.implicits._
    val docs = (1L to 200L).map(i => (i, (i % 7) * 10))
      .toDF("doc_id", "w") // ids 7, 14, … carry weight 0 → excluded
    val s1 = Curation.prioritySample(docs, "doc_id", "w", 20)
    assert(s1.queryExecution.executedPlan.toString
      .contains("TakeOrderedAndProject"),
      "global top-k must plan as per-partition heaps, not a full sort")
    val ids1 = s1.collect().map(_.getLong(0)).toSeq
    assert(ids1.size === 20)
    assert(ids1.forall(_ % 7 != 0), "zero-weight rows can never sample")
    assert(ids1 === Curation.prioritySample(docs, "doc_id", "w", 20)
      .collect().map(_.getLong(0)).toSeq, "pure function of the ids")
    // priorities scale uniformly with the weights, so the SELECTED SET
    // is invariant under w → c·w (the DLT estimator's key property)
    val doubled = docs.withColumn("w", col("w") * 2)
    val ids2 = Curation.prioritySample(doubled, "doc_id", "w", 20)
      .collect().map(_.getLong(0)).toSeq
    assert(ids2 === ids1)
  }
}
