package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Table-statistics collection — the ANALYZE primitive a cost-based
  * planner feeds on (row counts, null fractions, NDVs, value ranges,
  * means). Complements the KMV join-cardinality estimator
  * ([[Sketches.kmvJoinCardinality]]): that one prices a specific join,
  * this one materializes the per-column profile a planner consults for
  * every scan and filter.
  *
  * One aggregation pass over the table produces every column's stats
  * (Spark expands multi-distinct aggregates internally — still a single
  * scan); the per-column rows are then exploded from an in-row struct
  * array, so the output is |cols| rows regardless of table size.
  *
  * NDV here is EXACT (`count_distinct`) so the oracle replays it; at
  * 100 TB swap in `approx_count_distinct` (HLL) or the KMV sketch — the
  * one-line change trades oracle-exactness for a bounded-memory pass,
  * and the surrounding shape (one scan, tiny output) is unchanged.
  * Means ride exact decimal sums (Parity discipline).
  */
object Stats {

  /** Per-column stats for NUMERIC columns: `column, n, n_null, ndv,
    * min_v, max_v, mean_v` — one output row per requested column.
    */
  def numericColumnStats(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty, "numericColumnStats with no columns")
    // One single-count_distinct aggregate PER COLUMN, unioned (r16):
    // n distinct aggregates in ONE agg made Spark plan an Expand of
    // (n+1)× every input row through the hash aggregate — 3M expanded
    // rows for lineitem×4 at sf0.1, 2.2 s of the old 3.6 s q132 wall.
    // Per-column aggs plan the expand-free two-stage distinct form,
    // scan only their own parquet column, and the union's branches
    // share one job. Values are identical (same aggregates, same
    // decimal mean rail).
    cols.map { c =>
      df.select(col(c)).agg(
        count(lit(1)).as("n"),
        (count(lit(1)) - count(col(c))).as("n_null"),
        count_distinct(col(c)).as("ndv"),
        min(col(c)).cast("double").as("min_v"),
        max(col(c)).cast("double").as("max_v"),
        (sum(col(c).cast(DecimalType(30, 8))).cast("double") /
          count(col(c)).cast("double")).as("mean_v"))
        .select(lit(c).as("column"), col("n"), col("n_null"), col("ndv"),
          col("min_v"), col("max_v"), col("mean_v"))
    }.reduce(_.unionByName(_))
  }


  /** EXACT per-group median in O(log) aggregation passes — no global
    * sort; the ps = {0.5} case of [[exactQuantilesByGroup]] finished
    * with DuckDB's `median` semantics ((lower + upper) / 2 on the two
    * middle order statistics, which differs from the `quantile_cont`
    * lerp by an ulp).
    */
  def exactMedianByGroup(df: DataFrame, groupCol: String, valueCol: String,
                         buckets: Int = 256, tail: Long = 4096,
                         maxRounds: Int = 64,
                         maxGroups: Int = 100000): DataFrame =
    refineQuantiles(df, groupCol, valueCol, Seq(0.5), buckets, tail,
      maxRounds, maxGroups, medianFinish = true)
      .select(col(groupCol), col("n"), col("quantile").as("median"))

  /** EXACT per-group percentiles for an arbitrary percentile set — no
    * global sort. The sampled-quantile sketches (q55/q116) trade
    * exactness for one pass; this is the other end of the design space:
    * iterative histogram refinement (the classic selection-by-bucketing
    * algorithm) narrows, per (group, percentile), a value window
    * [lo, hi] known to contain that percentile's bracketing ranks until
    * few enough rows remain to rank directly.
    *
    * Per round: ONE partial-aggregable shuffle computes, per active
    * (group, percentile) task, the count below the window (exact rank
    * re-anchoring — immune to float boundary drift, which is also why
    * every narrowed bound is widened by a couple of ulps) and a
    * `buckets`-bin histogram inside it. The driver walks each histogram
    * (tasks × buckets longs — bounded like the ANN centroid collects)
    * and shrinks the window geometrically. The finish ranks only the
    * surviving windows (≤ `tail` rows each) and interpolates with
    * `quantile_cont` semantics: h = (n−1)·p, lower·(1−frac) +
    * upper·frac — every float op written identically to the oracle.
    *
    * At 100 TB: each round is a full scan of the cached (group, value)
    * projection joined to a broadcast task table (|ps| rows per group),
    * rounds are ~log_B(n) ≈ 3-4 for B=256, and nothing driver-side
    * grows with data volume — only with groups × percentiles.
    */
  def exactQuantilesByGroup(df: DataFrame, groupCol: String,
                            valueCol: String, ps: Seq[Double],
                            buckets: Int = 256, tail: Long = 4096,
                            maxRounds: Int = 64,
                            maxGroups: Int = 100000): DataFrame =
    refineQuantiles(df, groupCol, valueCol, ps, buckets, tail,
      maxRounds, maxGroups, medianFinish = false)

  private case class QWin(lo: Double, hi: Double, k1: Long, k2: Long,
                          frac: Double, n: Long, done: Boolean)

  private def refineQuantiles(df: DataFrame, groupCol: String,
                              valueCol: String, ps: Seq[Double],
                              buckets: Int, tail: Long, maxRounds: Int,
                              maxGroups: Int,
                              medianFinish: Boolean): DataFrame = {
    require(buckets >= 2 && tail >= 1 && maxRounds >= 1)
    require(ps.nonEmpty && ps.forall(p => p >= 0.0 && p <= 1.0),
      s"percentiles $ps must be within [0, 1]")
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.types.{DoubleType, IntegerType, LongType,
      StructField, StructType}
    import org.apache.spark.sql.Row
    import org.apache.spark.storage.StorageLevel

    val spark = df.sparkSession
    val vals = df
      .select(col(groupCol).as("g"), col(valueCol).cast("double").as("v"))
      .filter(col("v").isNotNull && !isnan(col("v")))
      .persist(StorageLevel.MEMORY_AND_DISK)
    val gField = vals.schema("g")

    val meta = vals.groupBy("g")
      .agg(count(lit(1)).as("n"), min("v").as("lo"), max("v").as("hi"))
      .collect()
    require(meta.length.toLong * ps.length <= maxGroups,
      s"refineQuantiles: ${meta.length} groups × ${ps.length} percentiles" +
        s" exceeds maxGroups=$maxGroups — driver state would be unbounded")

    // Bracketing ranks per task, 0-indexed, quantile_cont-style:
    // h = (n−1)·p in DOUBLE (the oracle's own float math), k1 = ⌊h⌋,
    // k2 = k1 + 1 iff h is fractional.
    var wins: Map[(Any, Int), QWin] = (for {
      r <- meta
      (p, pi) <- ps.zipWithIndex
    } yield {
      val n = r.getLong(r.fieldIndex("n"))
      val h = (n - 1).toDouble * p
      val k1 = math.floor(h).toLong
      val frac = h - math.floor(h)
      val k2 = if (frac > 0.0) k1 + 1 else k1
      (r.get(r.fieldIndex("g")), pi) -> QWin(
        r.getDouble(r.fieldIndex("lo")), r.getDouble(r.fieldIndex("hi")),
        k1, k2, frac, n, done = false)
    }).toMap

    // Window-narrowing slack (r14 correctness fix, found by
    // Round9PropertySpec): the reconstructed bucket boundary
    // lo + width·k/B carries rounding error at the WIDTH's magnitude,
    // not the boundary value's — measured: a + (b−a) landed 8 ulps
    // BELOW b for (a, b) = (−705.12…, 39.23…), so the previous
    // two-nextUp widening (2 ulps at the VALUE's magnitude) let the
    // top rank silently fall out of the window and the finish
    // interpolated min = max = x_(k1). Edge buckets need no
    // reconstruction at all — bucket 0's lower bound IS w.lo and
    // bucket B−1's upper bound IS w.hi — and interior boundaries get
    // additive slack proportional to ulp(width) + ulp(max |bound|),
    // which dominates the reconstruction error and is still ≪ width/B
    // (convergence unaffected).

    var round = 0
    while (round < maxRounds && wins.values.exists(!_.done)) {
      round += 1
      val active = wins.filter(!_._2.done)
      val lk = spark.createDataFrame(
        spark.sparkContext.parallelize(active.toSeq.map {
          case ((g, pi), w) => Row(g, pi, w.lo, w.hi)
        }, 1),
        StructType(Seq(gField.copy(name = "g"),
          StructField("__pi", IntegerType, nullable = false),
          StructField("__lo", DoubleType), StructField("__hi", DoubleType))))
      val width = col("__hi") - col("__lo")
      val bIdx = least(greatest(
        floor((col("v") - col("__lo")) / width * buckets), lit(0))
        .cast("int"), lit(buckets - 1))
      val hist = vals.join(broadcast(lk), "g")
        .select(col("g"), col("__pi"),
          when(col("v") < col("__lo"), lit(-1))
            .when(col("v") > col("__hi"), lit(buckets))
            .otherwise(when(width > 0.0, bIdx).otherwise(lit(0)))
            .as("b"))
        .groupBy("g", "__pi", "b").agg(count(lit(1)).as("c"))
        .collect()
      val byTask = hist.groupBy(r => (r.get(0), r.getInt(1)))
      wins = wins.map { case (key, w) =>
        if (w.done) key -> w
        else {
          val rows = byTask.getOrElse(key, Array.empty)
          val cnt = Array.fill(buckets)(0L)
          var below = 0L
          rows.foreach { r =>
            val b = r.getInt(r.fieldIndex("b"))
            val c = r.getLong(r.fieldIndex("c"))
            if (b < 0) below += c else if (b < buckets) cnt(b) += c
          }
          def bucketOf(k: Long): Int = {
            var acc = below; var i = 0
            while (i < buckets && acc + cnt(i) <= k) { acc += cnt(i); i += 1 }
            math.min(i, buckets - 1)
          }
          val b1 = bucketOf(w.k1); val b2 = bucketOf(w.k2)
          val inWin = (b1 to b2).map(cnt).sum
          val oldWidth = w.hi - w.lo
          val slack = 4.0 * (Math.ulp(oldWidth) +
            Math.ulp(math.max(math.abs(w.lo), math.abs(w.hi))))
          val nLo = if (b1 == 0) w.lo
            else w.lo + oldWidth * b1 / buckets - slack
          val nHi = if (b2 == buckets - 1) w.hi
            else w.lo + oldWidth * (b2 + 1) / buckets + slack
          val lo2 = math.max(w.lo, nLo); val hi2 = math.min(w.hi, nHi)
          val progressed = (hi2 - lo2) < oldWidth
          key -> w.copy(lo = lo2, hi = hi2,
            done = inWin <= tail || !progressed || lo2 == hi2)
        }
      }
    }

    // A window collapsed to one value IS the answer — short-circuit on
    // the driver (also avoids re-scanning an all-constant group's full
    // tie range in the finish).
    val (degenerate, remaining) = wins.partition { case (_, w) => w.lo == w.hi }
    val outSchema = StructType(Seq(gField.copy(name = groupCol),
      StructField("p", DoubleType, nullable = false),
      StructField("n", LongType, nullable = false),
      StructField("quantile", DoubleType)))
    val degDF = spark.createDataFrame(
      spark.sparkContext.parallelize(degenerate.toSeq.map {
        case ((g, pi), w) => Row(g, ps(pi), w.n, w.lo)
      }, 1), outSchema)

    // Finish: exact ranks inside each surviving window; `below` is
    // recomputed in the same pass, so the global rank is exact.
    val fin = spark.createDataFrame(
      spark.sparkContext.parallelize(remaining.toSeq.map {
        case ((g, pi), w) => Row(g, pi, ps(pi), w.lo, w.hi, w.k1, w.k2,
          w.frac, w.n)
      }, 1),
      StructType(Seq(gField.copy(name = "g"),
        StructField("__pi", IntegerType, nullable = false),
        StructField("__p", DoubleType, nullable = false),
        StructField("__lo", DoubleType), StructField("__hi", DoubleType),
        StructField("__k1", LongType, nullable = false),
        StructField("__k2", LongType, nullable = false),
        StructField("__frac", DoubleType, nullable = false),
        StructField("__n", LongType, nullable = false))))
    val joined = vals.join(broadcast(fin), "g")
    val below = joined.filter(col("v") < col("__lo"))
      .groupBy("g", "__pi").agg(count(lit(1)).as("__below"))
    val wnd = Window.partitionBy("g", "__pi").orderBy("v")
    val finish =
      if (medianFinish) (min(col("v")) + max(col("v"))) / lit(2.0)
      else min(col("v")) * (lit(1.0) - max(col("__frac"))) +
        max(col("v")) * max(col("__frac"))
    val out = joined
      .filter(col("v") >= col("__lo") && col("v") <= col("__hi"))
      .join(below, Seq("g", "__pi"), "left")
      .withColumn("__rk",
        row_number().over(wnd) - 1 + coalesce(col("__below"), lit(0L)))
      .filter(col("__rk") === col("__k1") || col("__rk") === col("__k2"))
      .groupBy("g", "__pi")
      .agg(max(col("__p")).as("p"), max(col("__n")).as("n"),
        finish.as("quantile"))
      .select(col("g").as(groupCol), col("p"), col("n"), col("quantile"))
      .union(degDF)
    // Materialize (output is |groups|·|ps| rows) before dropping the
    // cache the refinement rounds were feeding on.
    val materialized = out.localCheckpoint(true)
    vals.unpersist()
    materialized
  }
}
