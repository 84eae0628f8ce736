package graft

import java.sql.Date
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.etl.Scd2

/** Textbook-SCD2 invariants (SURVEY §2.7, §5.4): exactly one open version
  * per key, closed versions end before the sentinel, re-running the same
  * snapshot is a no-op, change/new/gone handling.
  */
class Scd2Spec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val d1 = Date.valueOf("2024-01-01")
  private val d2 = Date.valueOf("2024-01-02")
  private val d3 = Date.valueOf("2024-01-03")

  private def snap(rows: (String, Int, String)*): DataFrame =
    rows.toSeq.toDF("natural_key", "price", "brand")

  private def init(s: DataFrame, load: Date): DataFrame =
    s.withColumn("dt_load_to_dw", lit(load))
      .withColumn("dt_last_update", lit(Scd2.Sentinel))

  private val tracked = Seq("price", "brand")

  test("new key inserts one open version") {
    val dim0 = init(snap(("a", 1, "x")), d1)
    val merged = Scd2.merge(dim0, snap(("a", 1, "x"), ("b", 9, "y")),
      "natural_key", tracked, d2)
    assert(merged.count() === 2)
    val b = merged.filter($"natural_key" === "b").head()
    assert(b.getAs[Date]("dt_load_to_dw") === d2)
    assert(b.getAs[Date]("dt_last_update") === Scd2.Sentinel)
  }

  test("changed key closes the old version and opens a new one") {
    val dim0 = init(snap(("a", 1, "x")), d1)
    val merged = Scd2.merge(dim0, snap(("a", 2, "x")),
      "natural_key", tracked, d2).cache()
    assert(merged.count() === 2)
    val closed = merged.filter($"dt_last_update" === lit(d2)).head()
    assert(closed.getAs[Int]("price") === 1)
    val open = merged.filter($"dt_last_update" === lit(Scd2.Sentinel)).head()
    assert(open.getAs[Int]("price") === 2)
    assert(open.getAs[Date]("dt_load_to_dw") === d2)
  }

  test("idempotence: merging an identical snapshot changes nothing") {
    val dim0 = init(snap(("a", 1, "x"), ("b", 2, "y")), d1)
    val once = Scd2.merge(dim0, snap(("a", 1, "x"), ("b", 2, "y")),
      "natural_key", tracked, d2)
    assert(once.exceptAll(dim0).isEmpty && dim0.exceptAll(once).isEmpty)
  }

  test("null shift across tracked columns is detected as a change") {
    // xxhash64 skips null children, so without null disambiguation
    // (null,"x") and ("x",null) collide and the change is silently missed.
    val dim0 = Seq(("a", Option.empty[String], Option("x")))
      .toDF("natural_key", "material", "shape")
      .withColumn("dt_load_to_dw", lit(d1))
      .withColumn("dt_last_update", lit(Scd2.Sentinel))
    val merged = Scd2.merge(dim0,
      Seq(("a", Option("x"), Option.empty[String]))
        .toDF("natural_key", "material", "shape"),
      "natural_key", Seq("material", "shape"), d2).cache()
    assert(merged.count() === 2)
    val open = merged.filter($"dt_last_update" === lit(Scd2.Sentinel)).head()
    assert(open.getAs[String]("material") === "x")
    assert(open.getAs[String]("shape") == null)
    val closed = merged.filter($"dt_last_update" === lit(d2)).head()
    assert(closed.getAs[String]("material") == null)
    assert(closed.getAs[String]("shape") === "x")
  }

  test("identical snapshot with nulls stays a no-op (null-safe equality)") {
    val dim0 = Seq(("a", Option.empty[String], Option("x")))
      .toDF("natural_key", "material", "shape")
      .withColumn("dt_load_to_dw", lit(d1))
      .withColumn("dt_last_update", lit(Scd2.Sentinel))
    val once = Scd2.merge(dim0,
      Seq(("a", Option.empty[String], Option("x")))
        .toDF("natural_key", "material", "shape"),
      "natural_key", Seq("material", "shape"), d2)
    assert(once.exceptAll(dim0).isEmpty && dim0.exceptAll(once).isEmpty)
  }

  test("key absent from snapshot is kept as-is (no spurious close)") {
    val dim0 = init(snap(("a", 1, "x"), ("gone", 7, "z")), d1)
    val merged = Scd2.merge(dim0, snap(("a", 1, "x")),
      "natural_key", tracked, d2)
    val gone = merged.filter($"natural_key" === "gone").head()
    assert(gone.getAs[Date]("dt_last_update") === Scd2.Sentinel)
  }

  test("mergeInPlace: history append-only, merges read only the open set") {
    val path = java.nio.file.Files.createTempDirectory("dw_scd2").toString
    Scd2.initPartitioned(snap(("a", 1, "x"), ("b", 2, "y")), path, d1)

    Scd2.mergeInPlace(spark, path, snap(("a", 5, "x"), ("c", 3, "z")),
      "natural_key", tracked, d2)
    val afterDay2 = Scd2.readWarehouse(spark, path)
    assert(afterDay2.count() === 4) // a(closed), a'(open), b(open), c(open)
    val hist1 = Scd2.currentState(spark, path).get.histDirs

    Scd2.mergeInPlace(spark, path, snap(("a", 6, "x"), ("c", 3, "z")),
      "natural_key", tracked, d3)
    val dw = Scd2.readWarehouse(spark, path).cache()
    assert(dw.count() === 5)
    // closed history from day 2 survived (history dirs only accumulate)
    assert(dw.filter($"natural_key" === "a" && $"dt_last_update" === lit(d2))
      .head().getAs[Int]("price") === 1)
    val a = dw.filter($"natural_key" === "a").orderBy("dt_load_to_dw")
      .collect()
    assert(a.map(_.getAs[Int]("price")).toSeq === Seq(1, 5, 6))
    // one open version per key; open rows all carry is_current=true
    val opens = dw.filter($"is_current" === true)
    assert(opens.count() === 3)
    assert(opens.filter($"dt_last_update" =!= lit(Scd2.Sentinel)).isEmpty)
    val st = Scd2.currentState(spark, path).get
    assert(st.version === 3 && hist1.forall(st.histDirs.contains))

    // the merge's scan is pruned by construction: readCurrent touches
    // ONLY the committed cur directory, never history
    val pruned = Scd2.readCurrent(spark, path)
    assert(pruned.inputFiles.nonEmpty &&
      pruned.inputFiles.forall(_.contains("/data/cur_")))
  }

  test("mergeInPlace: injected crash leaves the table unchanged; retry " +
       "converges with no duplicate history") {
    import graft.etl.Failpoints
    val path = java.nio.file.Files.createTempDirectory("dw_crash").toString
    Scd2.initPartitioned(snap(("a", 1, "x"), ("b", 2, "y")), path, d1)
    val day2 = snap(("a", 5, "x"), ("c", 3, "z"))

    // crash between the history write and the open-set write
    Failpoints.arm("scd2.between-writes")
    try intercept[IllegalStateException] {
      Scd2.mergeInPlace(spark, path, day2, "natural_key", tracked, d2)
    } finally Failpoints.disarm("scd2.between-writes")
    // readers still see day-1 exactly: no partial merge is visible
    val dw1 = Scd2.readWarehouse(spark, path).cache()
    assert(dw1.count() === 2)
    assert(dw1.filter($"is_current" === false).isEmpty)
    assert(Scd2.currentState(spark, path).get.version === 1)

    // crash after BOTH staged writes, before the manifest commit
    Failpoints.arm("scd2.before-commit")
    try intercept[IllegalStateException] {
      Scd2.mergeInPlace(spark, path, day2, "natural_key", tracked, d2)
    } finally Failpoints.disarm("scd2.before-commit")
    assert(Scd2.readWarehouse(spark, path).count() === 2)

    // crash INSIDE commit: temp manifest written, atomic rename never
    // runs — the orphan .tmp_ file must be invisible to currentState
    Failpoints.arm("scd2.in-commit")
    try intercept[IllegalStateException] {
      Scd2.mergeInPlace(spark, path, day2, "natural_key", tracked, d2)
    } finally Failpoints.disarm("scd2.in-commit")
    assert(Scd2.readWarehouse(spark, path).count() === 2)
    assert(Scd2.currentState(spark, path).get.version === 1)

    // a torn staged DATA dir (crash mid-parquet-write: directory
    // exists, no committed files) must also be invisible — merges pick
    // fresh UUID dirs and only the manifest names what readers scan
    val torn = new java.io.File(path, "data/hist_99999999_torn")
    assert(torn.mkdirs())
    java.nio.file.Files.write(torn.toPath.resolve("part-torn.parquet"),
      Array[Byte](0x50, 0x41, 0x52))
    assert(Scd2.readWarehouse(spark, path).count() === 2)

    // the crashes orphaned staging dirs; vacuum reclaims them and
    // leaves the committed data intact
    val removed = Scd2.vacuum(spark, path)
    assert(removed.nonEmpty)
    assert(Scd2.readWarehouse(spark, path).count() === 2)

    // retry of the same merge commits once and converges
    Scd2.mergeInPlace(spark, path, day2, "natural_key", tracked, d2)
    val dw2 = Scd2.readWarehouse(spark, path).cache()
    assert(dw2.count() === 4)
    val opens = dw2.filter($"dt_last_update" === lit(Scd2.Sentinel))
      .groupBy("natural_key").count()
    assert(opens.filter($"count" =!= 1).isEmpty && opens.count() === 3)
    // exactly one closed version of 'a' — the crashed attempts left none
    assert(dw2.filter($"natural_key" === "a" &&
      $"dt_last_update" =!= lit(Scd2.Sentinel)).count() === 1)

    // re-running the identical merge is a no-op on the table contents
    Scd2.mergeInPlace(spark, path, day2, "natural_key", tracked, d2)
    val dw3 = Scd2.readWarehouse(spark, path)
    assert(dw3.exceptAll(dw2).isEmpty && dw2.exceptAll(dw3).isEmpty)
  }

  test("time travel: readAt(v) reproduces each committed version " +
       "bit-exactly; vacuum ends travel but never breaks the head") {
    val path = java.nio.file.Files.createTempDirectory("dw_tt").toString
    Scd2.initPartitioned(snap(("a", 1, "x"), ("b", 2, "y")), path, d1)
    val v1 = Scd2.readWarehouse(spark, path).collect().toSet
    Scd2.mergeInPlace(spark, path, snap(("a", 5, "x"), ("c", 3, "z")),
      "natural_key", tracked, d2)
    val v2 = Scd2.readWarehouse(spark, path).collect().toSet
    Scd2.mergeInPlace(spark, path, snap(("a", 5, "x"), ("b", 9, "y")),
      "natural_key", tracked, d3)
    val v3 = Scd2.readWarehouse(spark, path).collect().toSet

    assert(Scd2.versions(spark, path) === Seq(1L, 2L, 3L))
    assert(Scd2.readAt(spark, path, 1).collect().toSet === v1)
    assert(Scd2.readAt(spark, path, 2).collect().toSet === v2)
    assert(Scd2.readAt(spark, path, 3).collect().toSet === v3)
    assert(v1 !== v2); assert(v2 !== v3)
    intercept[IllegalArgumentException] { Scd2.readAt(spark, path, 9) }

    // vacuum keeps only the head's dirs: old OPEN-SET dirs go (travel
    // to superseded versions ends), the head stays bit-exact
    Scd2.vacuum(spark, path)
    assert(Scd2.readAt(spark, path, 3).collect().toSet === v3)
    assert(Scd2.readWarehouse(spark, path).collect().toSet === v3)
    // travel to a vacuumed version fails FAST with a clear message at
    // readAt time (the manifest log survives vacuum, so without the
    // data-dir validation this would surface as a raw mid-read
    // 'Path does not exist' parquet error instead)
    val gone = intercept[IllegalArgumentException] {
      Scd2.readAt(spark, path, 1)
    }
    assert(gone.getMessage.contains("vacuumed"))
  }

  test("invariant holds across multi-day history: one open version per key") {
    val dim0 = init(snap(("a", 1, "x"), ("b", 2, "y")), d1)
    val dim1 = Scd2.merge(dim0, snap(("a", 5, "x"), ("b", 2, "y"),
      ("c", 3, "z")), "natural_key", tracked, d2)
    val dim2 = Scd2.merge(dim1, snap(("a", 6, "x"), ("c", 3, "z")),
      "natural_key", tracked, d3).cache()

    val opens = dim2.filter($"dt_last_update" === lit(Scd2.Sentinel))
      .groupBy("natural_key").count()
    assert(opens.filter($"count" =!= 1).isEmpty)
    // 'a' has three versions: d1 (closed d2), d2 (closed d3), d3 (open)
    val a = dim2.filter($"natural_key" === "a")
      .orderBy("dt_load_to_dw").collect()
    assert(a.map(_.getAs[Int]("price")).toSeq === Seq(1, 5, 6))
    assert(a.map(_.getAs[Date]("dt_last_update")).toSeq ===
      Seq(d2, d3, Scd2.Sentinel))
    // closed versions strictly precede the sentinel
    assert(dim2.filter($"dt_last_update" =!= lit(Scd2.Sentinel) &&
      $"dt_last_update" >= lit(Scd2.Sentinel)).isEmpty)
  }

  test("scd3Merge: per-attribute shadows across two generations") {
    import org.apache.spark.sql.functions._
    // dim after an earlier life: a's shadow already holds 1
    val d0 = Seq(("a", 5, Some(1), 10, Option.empty[Int]),
        ("b", 7, Option.empty[Int], 20, Option.empty[Int]))
      .toDF("k", "x", "prev_x", "y", "prev_y")
    // snapshot: a changes x only (shadow moves, y shadow untouched),
    // b unchanged (both shadows kept), c is new (null shadows)
    val snap = Seq(("a", 6, 10), ("b", 7, 20), ("c", 9, 30))
      .toDF("k", "x", "y")
    val out = Scd2.scd3Merge(d0, snap, "k", Seq("x", "y"))
      .orderBy("k")
      .select("k", "x", "prev_x", "y", "prev_y")
      .as[(String, Int, Option[Int], Int, Option[Int])].collect().toSeq
    assert(out == Seq(
      ("a", 6, Some(5), 10, None),
      ("b", 7, None, 20, None),
      ("c", 9, None, 30, None)))
    // a key absent from the snapshot stays untouched, shadows intact
    val out2 = Scd2.scd3Merge(d0, Seq(("a", 5, 10)).toDF("k", "x", "y"),
        "k", Seq("x", "y"))
      .orderBy("k")
      .select("k", "x", "prev_x", "y", "prev_y")
      .as[(String, Int, Option[Int], Int, Option[Int])].collect().toSeq
    assert(out2 == Seq(
      ("a", 5, Some(1), 10, None),
      ("b", 7, None, 20, None)))
  }
}
