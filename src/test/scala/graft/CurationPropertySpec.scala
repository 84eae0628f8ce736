package graft

import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.ext.{Curation, Multimodal}

/** ScalaCheck properties for the curation/codec primitives:
  *  - PPM encode∘decode is the identity for any dims/pixels;
  *  - ppmDecode never throws on arbitrary byte garbage;
  *  - packSequences partitions every doc into exactly one pack and
  *    preserves the token sum per (group, pack) partition;
  *  - redactPii leaves PII-free ASCII text untouched.
  */
class CurationPropertySpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def check(prop: Prop, n: Int = 30): Unit = {
    val r = SCTest.check(SCTest.Parameters.default
      .withMinSuccessfulTests(n), prop)
    assert(r.passed, r.status.toString)
  }

  test("PPM roundtrip identity and garbage safety") {
    val genImage = for {
      w <- Gen.choose(1, 8)
      h <- Gen.choose(1, 8)
      px <- Gen.listOfN(3 * w * h, Gen.choose(0, 255))
    } yield (w, h, px.map(_.toByte).toArray)
    check(Prop.forAll(genImage) { case (w, h, px) =>
      Multimodal.ppmDecode(Multimodal.ppmEncode(w, h, px)) match {
        case Some((dw, dh, dpx)) =>
          dw == w && dh == h && dpx.toSeq == px.toSeq
        case None => false
      }
    })
    check(Prop.forAll(Gen.listOf(Gen.choose(-128, 127).map(_.toByte))) {
      bytes =>
        // must return (not throw) on arbitrary garbage, incl. P6 prefixes
        Multimodal.ppmDecode(bytes.toArray)
        Multimodal.ppmDecode(Array[Byte]('P', '6') ++ bytes)
        true
    })
  }

  test("packSequences: total partition, token-sum preservation") {
    import spark.implicits._
    val genDocs = Gen.listOfN(24, Gen.zip(Gen.oneOf("s1", "s2"),
      Gen.choose(1L, 900L)))
    check(Prop.forAll(genDocs) { raw =>
      val docs = raw.zipWithIndex
        .map { case ((g, tok), i) => (g, i.toLong, tok) }
        .toDF("source", "doc_id", "n_tokens")
      val packed = Curation.packSequences(docs, "doc_id", "n_tokens",
        "source", budget = 512).cache()
      val total = packed.count() == raw.length
      val oneEach = packed.groupBy("doc_id").count()
        .filter(col("count") =!= 1).isEmpty
      val sums = packed.groupBy("source").agg(sum("n_tokens").as("s"))
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      val expected = raw.groupBy(_._1).view.mapValues(_.map(_._2).sum).toMap
      packed.unpersist()
      total && oneEach && sums == expected
    }, n = 10)
  }

  test("redactPii is the identity on PII-free ASCII text") {
    import spark.implicits._
    val genWord = Gen.listOfN(5, Gen.alphaChar).map(_.mkString)
    val genText = Gen.listOfN(8, genWord).map(_.mkString(" "))
    check(Prop.forAll(Gen.listOfN(16, genText)) { texts =>
      val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
        .toDF("id", "text")
      df.select(col("text"),
        Curation.redactPii(col("text")).as("red"))
        .filter(col("text") =!= col("red")).isEmpty
    }, n = 10)
  }
}
