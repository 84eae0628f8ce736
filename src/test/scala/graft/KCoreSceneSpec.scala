package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.Row
import graft.ext.{Multimodal, Search, Y4m}

/** k-core peel and scene-cut detection on hand-built fixtures:
  *  - a triangle with a pendant node peels to exactly the triangle at
  *    k = 2, and to nothing at k = 3;
  *  - a two-triangle chain linked by a bridge edge keeps BOTH
  *    triangles at k = 2 (the bridge endpoints have degree 3);
  *  - identical video frames produce zero diff and no cut; an
  *    alternating black/white clip produces the maximal diff and cuts
  *    at every boundary.
  */
class KCoreSceneSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def coreOf(edges: Seq[(String, String)], k: Int) =
    Search.kCore(
      edges.map { case (a, b) => s"$a $b" }.zipWithIndex
        .map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text"),
      "doc_id", "text", vocab = 20, k = k, rounds = 6)
      .as[(String, Long)].collect().toMap

  test("triangle + pendant: 2-core is the triangle, 3-core is empty") {
    val edges = Seq("a" -> "b", "b" -> "c", "a" -> "c", "a" -> "d")
    assert(coreOf(edges, 2) == Map("a" -> 2L, "b" -> 2L, "c" -> 2L))
    assert(coreOf(edges, 3).isEmpty)
  }

  test("bridged triangles both survive the 2-core peel") {
    val edges = Seq("a" -> "b", "b" -> "c", "a" -> "c",
      "x" -> "y", "y" -> "z", "x" -> "z", "c" -> "x")
    val core = coreOf(edges, 2)
    assert(core.keySet == Set("a", "b", "c", "x", "y", "z"))
    assert(core("c") == 3L && core("x") == 3L) // bridge kept
  }

  private def clip(frames: Seq[Array[Byte]], w: Int, h: Int) = {
    val payload = Y4m.encode(Y4m.Video(w, h, 25, 1, frames.toVector))
    spark.createDataFrame(
      java.util.List.of(Row(1L, "video/y4m", payload,
        Row("video/x-yuv4mpeg", w, h, java.lang.Long.valueOf(1L)))),
      Multimodal.mediaSchema)
  }

  test("identical frames: zero diff, no cut") {
    val f = Array.fill[Byte](16)(50)
    val rows = Multimodal.sceneCuts(clip(Seq(f, f, f), 4, 4), 28, 1)
      .as[(Long, Int, Long, Boolean)].collect().toSeq.sortBy(_._2)
    assert(rows == Seq((1L, 1, 0L, false), (1L, 2, 0L, false)))
  }

  test("alternating black/white frames cut at every boundary") {
    val black = Array.fill[Byte](16)(0)
    val white = Array.fill[Byte](16)(-1) // 0xff unsigned
    val rows = Multimodal.sceneCuts(
      clip(Seq(black, white, black), 4, 4), 28, 1)
      .as[(Long, Int, Long, Boolean)].collect().toSeq.sortBy(_._2)
    assert(rows == Seq((1L, 1, 16L * 255, true), (1L, 2, 16L * 255, true)))
  }
}
