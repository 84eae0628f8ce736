package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.ext.TextStats

class TextStatsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("tokenCount / meanWordLen / punctRatio on a known sentence") {
    val r = Seq("the cat sat, on the mat!").toDF("t").select(
      TextStats.tokenCount($"t").as("n"),
      TextStats.meanWordLen($"t").as("m"),
      TextStats.punctRatio($"t").as("p")).head()
    assert(r.getLong(0) === 6L)
    // tokens: the cat sat, on the mat! → lengths 3,3,4,2,3,4 = 19/6
    assert(math.abs(r.getDouble(1) - 19.0 / 6.0) < 1e-12)
    assert(math.abs(r.getDouble(2) - 2.0 / 24.0) < 1e-12)
  }

  test("empty and degenerate text produce zeros, not nulls/NaN") {
    val r = Seq("", "   ").toDF("t").select(
      TextStats.tokenCount($"t").as("n"),
      TextStats.meanWordLen($"t").as("m"),
      TextStats.stopwordRatio($"t", Params.stopwords).as("s"),
      TextStats.punctRatio($"t").as("p")).collect()
    r.foreach { row =>
      assert(row.getLong(0) === 0L)
      assert(row.getDouble(1) === 0.0)
      assert(row.getDouble(2) === 0.0)
      assert(row.getDouble(3) === 0.0)
    }
  }

  test("stopwordRatio is case-insensitive") {
    val r = Seq("The THE the word").toDF("t")
      .select(TextStats.stopwordRatio($"t", Seq("the")).as("s")).head()
    assert(math.abs(r.getDouble(0) - 0.75) < 1e-12)
  }

  test("langId picks the marker-dominant language deterministically") {
    val df = Seq(
      "the cat and the dog of the house is big",
      "el perro de la casa es que grande la vida",
      "der hund und die katze das ist gut",
      "le chat et le chien les animaux est la",
      "no markers whatsoever xyz").toDF("t")
    val out = df.select(TextStats.langId($"t").as("l"))
      .as[String].collect()
    assert(out.toSeq === Seq("en", "es", "de", "fr", "en")) // tie → first lang
  }

  test("contentFingerprint is invariant to case/punct/whitespace") {
    val df = Seq("Hello,  World!", "hello world", "different").toDF("t")
      .select(TextStats.contentFingerprint($"t").as("f")).as[String].collect()
    assert(df(0) === df(1))
    assert(df(0) !== df(2))
  }

  test("rollingFingerprint survives edits away from the minimizing shingle") {
    val base = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    val editTail = base.replace("kappa", "omega")
    val fps = Seq(base, editTail).toDF("t")
      .select(TextStats.rollingFingerprint($"t", 3).as("f"))
      .as[String].collect()
    // both contain the same 3-shingle set except near the tail; min over
    // shingles usually unchanged — deterministic here by construction:
    val toks = base.split(" ").toSeq
    def md5hex(s: String) = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    val minShingle = toks.sliding(3).map(_.mkString(" "))
      .map(s => md5hex(s"0|$s")).min
    assert(fps(0) === minShingle)
  }

  test("subwordCount splits words and punctuation marks") {
    val r = Seq("ab,cd ef!").toDF("t")
      .select(TextStats.subwordCount($"t").as("n")).head()
    // ab , cd ef ! → 5
    assert(r.getLong(0) === 5L)
  }
}
