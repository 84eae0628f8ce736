package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.functions.GraftFunctions

/** The native expressions must be callable from plain SQL once
  * registered (FunctionRegistry injection — the same descriptions back
  * the `spark.sql.extensions` entry point `GraftExtensions`).
  */
class GraftExtensionsSpec extends AnyFunSuite {
  private lazy val spark = { val s = TestSpark.spark
    GraftFunctions.register(s); s }

  test("graft_dot from SQL") {
    val v = spark.sql(
      "SELECT graft_dot(array(1.0D, 2.0D), array(3.0D, 4.0D)) AS d")
      .head().getDouble(0)
    assert(v === 11.0)
  }

  test("graft_minhash_signature / shingles / simhash / fingerprint from SQL") {
    val r = spark.sql(
      """SELECT
        graft_minhash_signature(split('a b c d', ' '), 2, 4) AS sig,
        graft_word_shingles(split('a b c d', ' '), 2, true) AS sh,
        graft_simhash(split('a b c', ' '), 8) AS sim,
        graft_rolling_fingerprint(split('a b c d e f', ' '), 3) AS rf""")
      .head()
    assert(r.getSeq[Long](0).length === 4)
    assert(r.getSeq[String](1) === Seq("a b", "b c", "c d"))
    assert(r.getString(2).length === 8)
    assert(r.getString(3).matches("[0-9a-f]{32}"))
  }

  test("graft_sign_lsh_buckets from SQL matches the Column API") {
    val sql = spark.sql(
      """SELECT graft_sign_lsh_buckets(
           array(CAST(0.5 AS FLOAT), CAST(-1.0 AS FLOAT),
                 CAST(2.0 AS FLOAT)), 4, 3, 42, 2) AS bks""")
      .head().getSeq[String](0)
    assert(sql.length === 2)
    assert(sql.forall(b => b.length === 4 && b.forall(c => c == '0' || c == '1')))
    import spark.implicits._
    val api = Seq(Tuple1(Array(0.5f, -1.0f, 2.0f))).toDF("v")
      .select(graft.ext.Similarity.signBuckets($"v", 4, 3, 42L, 2))
      .head().getSeq[String](0)
    assert(sql === api)
  }

  test("non-literal size argument is rejected with a clear error") {
    val e = intercept[Exception] {
      spark.sql("SELECT graft_simhash(split('a', ' '), length('xx'))")
        .collect()
    }
    assert(e.getMessage.contains("integer literal"))
  }

  test("graft_kmv native aggregate: SQL ≡ Column API ≡ the TopKPerKey " +
       "formulation, with map-side partial aggregation in the plan") {
    import org.apache.spark.sql.functions._
    val ev = Tables.load(spark, TestSpark.sf0001, "events")
    ev.createOrReplaceTempView("kmv_ev")
    val viaSql = spark.sql(
      """SELECT event_type, graft_kmv(CAST(user_id AS STRING), 64) AS sk
        FROM kmv_ev GROUP BY event_type""")
      .select("event_type", "sk.k_actual", "sk.kth_hash",
        "sk.distinct_estimate").orderBy("event_type").collect().toSeq
    val viaCol = ev.groupBy("event_type")
      .agg(graft.functions.KmvSketchAgg.kmvAgg(
        col("user_id").cast("string"), 64).as("sk"))
      .select("event_type", "sk.k_actual", "sk.kth_hash",
        "sk.distinct_estimate").orderBy("event_type").collect().toSeq
    val viaOp = graft.ext.Sketches.kmvDistinctByGroup(
      ev, "event_type", col("user_id"), 64)
      .orderBy("event_type").collect().toSeq
    assert(viaSql === viaCol)
    assert(viaCol.map(r => (r.getString(0), r.getLong(1), r.getLong(2))) ===
      viaOp.map(r => (r.getString(0), r.getLong(1), r.getLong(2))))
    assert(viaCol.map(_.getDouble(3)) === viaOp.map(_.getDouble(3)))
    // the engine must plan a PARTIAL aggregate below the exchange —
    // the map-side-combine property the sketch exists for
    val plan = ev.groupBy("event_type")
      .agg(graft.functions.KmvSketchAgg.kmvAgg(
        col("user_id").cast("string"), 64))
      .queryExecution.executedPlan.toString
    assert(plan.contains("partial_graft_kmv"),
      s"expected a partial aggregate phase in:\n$plan")
  }

  test("graft_hll native aggregate: registers equal the operator-level " +
       "sketch, SQL surface works, partial phase planned") {
    import org.apache.spark.sql.functions._
    val ev = Tables.load(spark, TestSpark.sf0001, "events")
    val viaAgg = ev.groupBy("event_type")
      .agg(graft.functions.HllSketchAgg.hllAgg(col("user_id")).as("regs"))
      .select(col("event_type"), posexplode(col("regs")).as(Seq("b", "m")))
      .filter(col("m") > 0)
      .collect().map(r => (r.getString(0), r.getInt(1), r.getInt(2))).toSet
    val viaOp = graft.ext.Sketches.hllRegisters(ev, Seq("event_type"),
      col("user_id").cast("string"))
      .collect()
      .map(r => (r.getString(0), r.getLong(1).toInt, r.getInt(2))).toSet
    assert(viaAgg === viaOp,
      "native registers must be bit-identical to the operator sketch")
    ev.createOrReplaceTempView("hll_ev")
    val viaSql = spark.sql(
      """SELECT event_type, graft_hll(CAST(user_id AS STRING)) AS regs
        FROM hll_ev GROUP BY event_type""")
      .select(col("event_type"), posexplode(col("regs")).as(Seq("b", "m")))
      .filter(col("m") > 0)
      .collect().map(r => (r.getString(0), r.getInt(1), r.getInt(2))).toSet
    assert(viaSql === viaOp)
    val plan = ev.groupBy("event_type")
      .agg(graft.functions.HllSketchAgg.hllAgg(col("user_id")))
      .queryExecution.executedPlan.toString
    assert(plan.contains("partial_graft_hll"),
      s"expected a partial aggregate phase in:\n$plan")
  }

  test("graft_kmv/graft_cms on non-string input: analysis-time type " +
       "error in SQL (not a runtime CCE), automatic cast in Column API") {
    import org.apache.spark.sql.functions._
    val ev = Tables.load(spark, TestSpark.sf0001, "events")
    ev.createOrReplaceTempView("kmv_raw_ev")
    // user_id is BIGINT: before the ExpectsInputTypes contract the SQL
    // path threw a runtime ClassCastException mid-job; now it fails at
    // analysis with the required type named (ANSI coercion does not
    // implicitly cast numeric→string for function inputs)
    val e = intercept[org.apache.spark.sql.AnalysisException] {
      spark.sql(
        """SELECT event_type, graft_kmv(user_id, 64) AS sk
          FROM kmv_raw_ev GROUP BY event_type""").collect()
    }
    assert(e.getMessage.contains("STRING"))
    val e2 = intercept[org.apache.spark.sql.AnalysisException] {
      spark.sql("SELECT graft_cms(user_id, 4, 16) FROM kmv_raw_ev")
        .collect()
    }
    assert(e2.getMessage.contains("STRING"))
    // the Column API casts for the caller: bare bigint column ≡ CAST
    val bare = ev.groupBy("event_type")
      .agg(graft.functions.KmvSketchAgg.kmvAgg(col("user_id"), 64).as("sk"))
      .select("event_type", "sk.k_actual", "sk.kth_hash")
      .orderBy("event_type").collect().toSeq
    val casted = spark.sql(
      """SELECT event_type, graft_kmv(CAST(user_id AS STRING), 64) AS sk
        FROM kmv_raw_ev GROUP BY event_type""")
      .select("event_type", "sk.k_actual", "sk.kth_hash")
      .orderBy("event_type").collect().toSeq
    assert(bare === casted)
  }

  test("graft_cms native aggregate: grid equals the operator-level " +
       "sketch, SQL surface works, partial phase planned") {
    import org.apache.spark.sql.functions._
    val ev = Tables.load(spark, TestSpark.sf0001, "events")
      .select(col("user_id").cast("string").as("v"))
    val (depth, width) = (4, 16)
    val gridDf = ev.agg(graft.functions.CmsSketchAgg.cmsAgg(
      col("v"), depth, width).as("grid"))
    val grid = gridDf.head().getSeq[Long](0)
    val opRows = graft.ext.Sketches.countMin(ev, col("v"), depth, width)
      .collect().map(r => (r.getInt(0) * width + r.getLong(1).toInt,
        r.getLong(2))).toMap
    assert(grid.length === depth * width)
    grid.zipWithIndex.foreach { case (c, i) =>
      assert(c === opRows.getOrElse(i, 0L),
        s"cell $i: native $c vs operator ${opRows.getOrElse(i, 0L)}")
    }
    ev.createOrReplaceTempView("cms_ev")
    val viaSql = spark.sql(s"SELECT graft_cms(v, $depth, $width) FROM cms_ev")
      .head().getSeq[Long](0)
    assert(viaSql === grid)
    assert(gridDf.queryExecution.executedPlan.toString
      .contains("partial_graft_cms"))
  }
}
