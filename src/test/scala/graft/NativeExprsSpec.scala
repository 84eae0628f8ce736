package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.ext.{Shingles, TextStats}
import graft.functions.NativeExprs

/** The native Catalyst expressions must be bit-identical to their
  * built-in higher-order-function reference pipelines on arbitrary input.
  */
class NativeExprsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("MinHashSignatureExpr ≡ HOF minHashSignature (incl. edge docs)") {
    val docs = Seq(
      "the quick brown fox jumps over the lazy dog",
      "one",                      // fewer tokens than k
      "",                         // empty doc → single empty shingle
      "a b",                      // exactly boundary sizes
      "xin chào thế giới việt nam" // multi-byte UTF-8
    ).toDF("text")
    val toks = TextStats.tokens(col("text"))
    val out = docs.select(
      NativeExprs.minHashSignature(toks, 3, 16).as("native"),
      Shingles.minHashSignature(toks, 3, 16).as("hof"))
      .collect()
    out.foreach { r =>
      assert(r.getSeq[Long](0) === r.getSeq[Long](1))
    }
  }

  test("WordShingles / RollingFingerprint / SimHash ≡ HOF references") {
    val docs = Seq(
      "the quick brown fox jumps over the lazy dog",
      "one", "", "a b", "xin chào thế giới việt nam",
      "dup dup dup dup dup").toDF("text")
    val toks = TextStats.tokens(col("text"))
    val out = docs.select(
      NativeExprs.wordShingles(toks, 3, distinct = true).as("sh_n"),
      array_distinct(Shingles.wordShingles(toks, 3)).as("sh_h"),
      NativeExprs.rollingFingerprint(toks, 5).as("rf_n"),
      graft.ext.TextStats.rollingFingerprintHof(col("text"), 5).as("rf_h"),
      NativeExprs.simhash(toks, 16).as("sim_n"),
      graft.ext.Dedup.simhashHof(col("text"), 16).as("sim_h"))
      .collect()
    out.foreach { r =>
      assert(r.getSeq[String](0) === r.getSeq[String](1))
      assert(r.getString(2) === r.getString(3))
      assert(r.getString(4) === r.getString(5))
    }
  }

  test("LangIdExpr ≡ HOF langId on marker-bearing and empty docs") {
    val docs = Seq(
      "the cat and the dog of the house is big",
      "el perro de la casa es que grande la vida",
      "der hund und die katze das ist gut",
      "le chat et le chien les animaux est la",
      "no markers whatsoever xyz", "").toDF("text")
    val out = docs.select(
      TextStats.langId(col("text")).as("native"),
      TextStats.langIdHof(col("text")).as("hof")).collect()
    out.foreach(r => assert(r.getString(0) === r.getString(1)))
  }

  test("DotProductExpr ≡ HOF fold on float arrays and handles nulls") {
    val df = Seq(
      (Array(1.0f, 2.5f, -3.0f), Array(0.5f, 4.0f, 2.0f)),
      (Array(0.0f, 0.0f, 0.0f), Array(1.0f, 1.0f, 1.0f)))
      .toDF("a", "b")
    val hof = aggregate(zip_with(col("a"), col("b"),
      (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, v) => acc + v)
    val rows = df.select(NativeExprs.dot(col("a"), col("b")).as("n"),
      hof.as("h")).collect()
    rows.foreach(r => assert(r.getDouble(0) === r.getDouble(1)))

    val withNull = Seq((Option.empty[Array[Float]], Option(Array(1.0f))))
      .toDF("a", "b")
      .select(NativeExprs.dot(col("a"), col("b")).as("n")).head()
    assert(withNull.isNullAt(0))
  }
}
