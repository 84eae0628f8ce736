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
    val aggs = cols.flatMap { c =>
      Seq(count(col(c)).as(s"__n_$c"),
        count(lit(1)).as(s"__rows_$c"),
        count_distinct(col(c)).as(s"__ndv_$c"),
        min(col(c)).cast("double").as(s"__min_$c"),
        max(col(c)).cast("double").as(s"__max_$c"),
        sum(col(c).cast(DecimalType(30, 8))).cast("double").as(s"__sum_$c"))
    }
    val one = df.agg(aggs.head, aggs.tail: _*)
    val packed = one.select(explode(array(cols.map { c =>
      struct(lit(c).as("column"),
        col(s"__rows_$c").as("n"),
        (col(s"__rows_$c") - col(s"__n_$c")).as("n_null"),
        col(s"__ndv_$c").as("ndv"),
        col(s"__min_$c").as("min_v"),
        col(s"__max_$c").as("max_v"),
        (col(s"__sum_$c") / col(s"__n_$c").cast("double")).as("mean_v"))
    }: _*)).as("s"))
    packed.select(col("s.column").as("column"), col("s.n").as("n"),
      col("s.n_null").as("n_null"), col("s.ndv").as("ndv"),
      col("s.min_v").as("min_v"), col("s.max_v").as("max_v"),
      col("s.mean_v").as("mean_v"))
  }

  /** EXACT per-group median in O(log) aggregation passes — no global
    * sort. The sampled-quantile sketches (q55/q116) trade exactness for
    * one pass; this is the other end of the design space: iterative
    * histogram refinement (the classic selection-by-bucketing algorithm,
    * cf. Blum et al. selection and Münz/Carle histogram median) keeps
    * narrowing a per-group value window [lo, hi] known to contain the
    * median rank(s) until few enough rows remain to rank directly.
    *
    * Per round: ONE partial-aggregable shuffle computes, per group, the
    * count below the window (exact rank re-anchoring — immune to float
    * boundary drift, which is also why the window is widened by a
    * relative epsilon after every narrowing) and a `buckets`-bin
    * histogram inside it. The driver walks the histogram (groups ×
    * buckets counts — bounded, like the ANN centroid collects) and
    * shrinks each window geometrically. The finish is a per-group
    * row_number over only the surviving windows (each ≤ `tail` rows, so
    * the "sort" is trivially small), then DuckDB's median semantics:
    * (lower + upper) / 2 on the two middle order statistics.
    *
    * At 100 TB: each round is a full-scan aggregation (the input should
    * be a cached/materialized projection of (group, value) — the method
    * persists it), rounds are ~log_B(n) ≈ 3-4 for B=256, and driver
    * state is groups × buckets longs. The same skeleton generalizes to
    * any percentile set.
    */
  def exactMedianByGroup(df: DataFrame, groupCol: String, valueCol: String,
                         buckets: Int = 256, tail: Long = 4096,
                         maxRounds: Int = 64,
                         maxGroups: Int = 100000): DataFrame = {
    require(buckets >= 2 && tail >= 1 && maxRounds >= 1)
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.storage.StorageLevel

    val vals = df
      .select(col(groupCol).as("g"), col(valueCol).cast("double").as("v"))
      .filter(col("v").isNotNull && !isnan(col("v")))
      .persist(StorageLevel.MEMORY_AND_DISK)

    // Per-group target ranks (0-indexed): k1 = (n-1)/2, k2 = n/2 for
    // even n (the two middle order statistics), k1 = k2 for odd n.
    case class Win(lo: Double, hi: Double, k1: Long, k2: Long,
                   n: Long, done: Boolean)
    val meta = vals.groupBy("g")
      .agg(count(lit(1)).as("n"), min("v").as("lo"), max("v").as("hi"))
      .collect()
    require(meta.length <= maxGroups,
      s"exactMedianByGroup: ${meta.length} groups exceeds maxGroups=" +
        s"$maxGroups — driver histogram state would be unbounded")
    var wins: Map[Any, Win] = meta.map { r =>
      val n = r.getLong(r.fieldIndex("n"))
      r.get(r.fieldIndex("g")) -> Win(
        r.getDouble(r.fieldIndex("lo")), r.getDouble(r.fieldIndex("hi")),
        (n - 1) / 2, n / 2, n, done = false)
    }.toMap

    // Widen a bound by a few ulps so float rounding in the bucket
    // arithmetic can never push the true order statistic outside the
    // window; the count-below re-anchor keeps ranks exact regardless.
    def widenDown(x: Double) =
      if (x.isInfinite) x else Math.nextDown(Math.nextDown(x))
    def widenUp(x: Double) =
      if (x.isInfinite) x else Math.nextUp(Math.nextUp(x))

    val spark = df.sparkSession
    var round = 0
    while (round < maxRounds && wins.values.exists(!_.done)) {
      round += 1
      val active = wins.filter(!_._2.done)
      val lk = spark.createDataFrame(
        spark.sparkContext.parallelize(active.toSeq.map { case (g, w) =>
          org.apache.spark.sql.Row(g, w.lo, w.hi)
        }, 1),
        org.apache.spark.sql.types.StructType(Seq(
          vals.schema("g").copy(name = "g"),
          org.apache.spark.sql.types.StructField("__lo",
            org.apache.spark.sql.types.DoubleType),
          org.apache.spark.sql.types.StructField("__hi",
            org.apache.spark.sql.types.DoubleType))))
      val width = col("__hi") - col("__lo")
      val bIdx = least(greatest(
        floor((col("v") - col("__lo")) / width * buckets), lit(0))
        .cast("int"), lit(buckets - 1))
      val hist = vals.join(broadcast(lk), "g")
        .select(col("g"),
          when(col("v") < col("__lo"), lit(-1))
            .when(col("v") > col("__hi"), lit(buckets))
            .otherwise(when(width > 0.0, bIdx).otherwise(lit(0)))
            .as("b"))
        .groupBy("g", "b").agg(count(lit(1)).as("c"))
        .collect()
      val byGroup = hist.groupBy(_.get(0))
      wins = wins.map { case (g, w) =>
        if (w.done) g -> w
        else {
          val rows = byGroup.getOrElse(g, Array.empty)
          val cnt = Array.fill(buckets)(0L)
          var below = 0L
          rows.foreach { r =>
            val b = r.getInt(r.fieldIndex("b"))
            val c = r.getLong(r.fieldIndex("c"))
            if (b < 0) below += c else if (b < buckets) cnt(b) += c
          }
          // locate the buckets holding ranks k1 and k2
          def bucketOf(k: Long): Int = {
            var acc = below; var i = 0
            while (i < buckets && acc + cnt(i) <= k) { acc += cnt(i); i += 1 }
            math.min(i, buckets - 1)
          }
          val b1 = bucketOf(w.k1); val b2 = bucketOf(w.k2)
          val inWin = (b1 to b2).map(cnt).sum
          val oldWidth = w.hi - w.lo
          val nLo = widenDown(w.lo + oldWidth * b1 / buckets)
          val nHi = widenUp(w.lo + oldWidth * (b2 + 1) / buckets)
          val lo2 = math.max(w.lo, nLo); val hi2 = math.min(w.hi, nHi)
          val progressed = (hi2 - lo2) < oldWidth
          g -> w.copy(lo = lo2, hi = hi2,
            done = inWin <= tail || !progressed || lo2 == hi2)
        }
      }
    }

    // A window collapsed to one value IS the median — answer those on
    // the driver (also avoids re-scanning an all-constant group's full
    // tie range in the finish).
    val (degenerate, remaining) = wins.partition { case (_, w) => w.lo == w.hi }
    val degDF = spark.createDataFrame(
      spark.sparkContext.parallelize(degenerate.toSeq.map { case (g, w) =>
        org.apache.spark.sql.Row(g, w.n, w.lo)
      }, 1),
      org.apache.spark.sql.types.StructType(Seq(
        vals.schema("g").copy(name = groupCol),
        org.apache.spark.sql.types.StructField("n",
          org.apache.spark.sql.types.LongType, nullable = false),
        org.apache.spark.sql.types.StructField("median",
          org.apache.spark.sql.types.DoubleType))))

    // Finish: exact ranks inside each final window. `below` is
    // recomputed in the same pass, so the global rank is exact.
    val fin = spark.createDataFrame(
      spark.sparkContext.parallelize(remaining.toSeq.map { case (g, w) =>
        org.apache.spark.sql.Row(g, w.lo, w.hi, w.k1, w.k2, w.n)
      }, 1),
      org.apache.spark.sql.types.StructType(Seq(
        vals.schema("g").copy(name = "g"),
        org.apache.spark.sql.types.StructField("__lo",
          org.apache.spark.sql.types.DoubleType),
        org.apache.spark.sql.types.StructField("__hi",
          org.apache.spark.sql.types.DoubleType),
        org.apache.spark.sql.types.StructField("__k1",
          org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("__k2",
          org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("__n",
          org.apache.spark.sql.types.LongType))))
    val joined = vals.join(broadcast(fin), "g")
    val below = joined.filter(col("v") < col("__lo"))
      .groupBy("g").agg(count(lit(1)).as("__below"))
    val wnd = Window.partitionBy("g").orderBy("v")
    val out = joined.filter(col("v") >= col("__lo") && col("v") <= col("__hi"))
      .join(below, Seq("g"), "left")
      .withColumn("__rk",
        row_number().over(wnd) - 1 + coalesce(col("__below"), lit(0L)))
      .filter(col("__rk") === col("__k1") || col("__rk") === col("__k2"))
      .groupBy("g")
      .agg(max(col("__n")).as("n"),
        ((min(col("v")) + max(col("v"))) / lit(2.0)).as("median"))
      .select(col("g").as(groupCol), col("n"), col("median"))
      .union(degDF)
    // Materialize (output is |groups| rows) before dropping the cache
    // the refinement rounds were feeding on.
    val materialized = out.localCheckpoint(true)
    vals.unpersist()
    materialized
  }
}
