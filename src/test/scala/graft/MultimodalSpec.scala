package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.ext.Multimodal

/** Multimodal plumbing: schema/row-count contracts of the batched
  * decode / resize / frame-sample stages (codecs are stubs — the Spark
  * side is the product).
  */
class MultimodalSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private lazy val media = Multimodal.asMediaTable(
    Tables.load(spark, TestSpark.sf0001, "documents"), "doc_id", "text")
    .cache()

  test("media table carries binary payload + typed metadata struct") {
    assert(media.schema("payload").dataType.typeName === "binary")
    val meta = media.schema("meta").dataType
    assert(meta.typeName === "struct")
    assert(media.filter(col("payload").isNull).isEmpty)
  }

  test("decodeFeatures: row-count preserving, deterministic features") {
    val feats = Multimodal.decodeFeatures(media)
    assert(feats.count() === media.count())
    assert(feats.schema.fieldNames.toSeq ===
      Seq("media_id", "byte_len", "feature"))
    val r = feats.orderBy("media_id").head()
    assert(r.getAs[Seq[Double]]("feature").length === 4)
    // deterministic across runs
    val again = Multimodal.decodeFeatures(media).orderBy("media_id").head()
    assert(r === again)
  }

  test("resize: row-count preserving, metadata rewritten to target dims") {
    val out = Multimodal.resize(media, 640, 480)
    assert(out.count() === media.count())
    val m = out.select("meta.width", "meta.height").distinct().collect()
    assert(m.length === 1 && m(0).getInt(0) === 640 && m(0).getInt(1) === 480)
    // payload shrinks or holds, never grows
    val grew = out.alias("o").join(media.alias("i"), "media_id")
      .filter(length(col("o.payload")) > length(col("i.payload")))
    assert(grew.isEmpty)
  }

  test("frameSample: row-expanding, n frames per non-empty payload") {
    val frames = Multimodal.frameSample(media, 4)
    assert(frames.schema.fieldNames.toSeq ===
      Seq("media_id", "frame_no", "frame"))
    val perDoc = frames.groupBy("media_id").count()
    assert(perDoc.filter(col("count") =!= 4).isEmpty)
    assert(frames.count() === media.count() * 4)
  }
}
