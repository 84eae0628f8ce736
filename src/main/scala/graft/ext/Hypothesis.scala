package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.BoundedWindows.boundedWindow
import org.apache.spark.storage.StorageLevel

/** Distribution-comparison statistics over event streams: two-sample
  * Kolmogorov–Smirnov, Mann–Whitney U, and chi-square independence.
  *
  * The reference's reporting layer stops at counts and sums; a
  * training-data pipeline additionally needs DISTRIBUTION monitors —
  * "did the score distribution of source A drift away from source B" —
  * that stay mergeable and integer-exact so the oracle can replay them.
  * All three statistics here are computed in integer (or fixed-order
  * IEEE) arithmetic: the KS sup-gap and the U statistic are pure
  * integer numerators over the rational grid {0, 1/(n1·n2), …}, so the
  * Spark and DuckDB sides agree bit-for-bit with no epsilon.
  *
  * Scale design: every statistic first collapses the input to its
  * DISTINCT-VALUE histogram (`groupBy(value)` — one shuffle that
  * shrinks 100 TB of events to at most the value cardinality), then
  * runs cumulative sums over that histogram. The cumulative pass uses
  * [[prefixSumByRange]] — a two-pass range-partitioned prefix sum —
  * rather than a single-partition global window, so no stage ever
  * funnels the histogram through one task.
  */
object Hypothesis {

  /** Exact prefix sums of `valueCol` in `orderCol` order, distributed.
    *
    * A bare `boundedWindow(x)` (no partitionBy) collapses the input
    * into ONE task — the classic cumulative-sum scale trap. This is the
    * standard two-pass fix, kept entirely in the DataFrame API:
    *
    *  1. range-repartition by the order column, so partition i holds a
    *     contiguous key range below partition i+1;
    *  2. per-partition running sums via a window PARTITIONED by
    *     `spark_partition_id()` (parallel across partitions);
    *  3. per-partition totals (numPartitions rows — broadcast-tiny)
    *     get their own exclusive prefix via a driver-free window over
    *     the tiny frame, then broadcast-join back as offsets.
    *
    * Rows with equal `orderCol` values must be pre-aggregated by the
    * caller (one row per distinct key) — RangePartitioner may split a
    * run of equal keys across adjacent partitions, which would make
    * "running sum at key k" ambiguous mid-run.
    *
    * Returns the input columns plus `cum` = inclusive prefix sum.
    */
  def prefixSumByRange(df: DataFrame, orderCol: String, valueCol: String,
                       partitions: Int): DataFrame =
    prefixSumsByRange(df, orderCol, Seq(valueCol), partitions)
      .withColumnRenamed(s"cum_$valueCol", "cum")

  /** Multi-column form of [[prefixSumByRange]]: ONE range repartition
    * and one per-partition window pass produce `cum_<col>` for every
    * value column — a two-sided CDF (q151/q152) then costs the same
    * shuffles as a one-sided one.
    */
  def prefixSumsByRange(df: DataFrame, orderCol: String,
                        valueCols: Seq[String], partitions: Int): DataFrame = {
    require(valueCols.nonEmpty, "no value columns")
    // ONE materialization, consumed by both the local-window pass and
    // the offsets aggregate. Without it each consumer re-evaluates the
    // range exchange as its own job, and AQE may coalesce the UPSTREAM
    // shuffle differently per job — different input partitioning ⇒
    // different sampled range boundaries ⇒ `_pid` in `local` and
    // `offsets` describe DIFFERENT partitionings, silently corrupting
    // the prefix sums (observed at sf0.1 on q152's 13k-row histogram).
    val ranged = df.repartitionByRange(partitions, col(orderCol))
      .withColumn("_pid", spark_partition_id())
      .localCheckpoint(eager = true, StorageLevel.DISK_ONLY)
    val wLoc = Window.partitionBy("_pid").orderBy(orderCol)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val local = valueCols.foldLeft(ranged) { (d, v) =>
      d.withColumn(s"_local_$v", sum(col(v)).over(wLoc))
    }
    val wPrev = boundedWindow("_pid")
      .rowsBetween(Window.unboundedPreceding, -1)
    val ptots = valueCols.map(v => sum(col(v)).as(s"_ptot_$v"))
    val offsets = ranged.groupBy("_pid")
      .agg(ptots.head, ptots.tail: _*)
      .select(col("_pid") +: valueCols.map(v =>
        coalesce(sum(col(s"_ptot_$v")).over(wPrev), lit(0L))
          .as(s"_off_$v")): _*)
    val joined = local.join(broadcast(offsets), "_pid")
    val withCums = valueCols.foldLeft(joined) { (d, v) =>
      d.withColumn(s"cum_$v", col(s"_local_$v") + col(s"_off_$v"))
    }
    withCums.drop("_pid" +:
      valueCols.flatMap(v => Seq(s"_local_$v", s"_off_$v")): _*)
  }

  /** Per-GROUP prefix sums without per-group sort partitions: range-
    * partition on the composite (group, order) key — one global range
    * exchange regardless of group sizes, so a group larger than a
    * partition still spreads across tasks (the `Window.partitionBy(
    * group).orderBy(...)` formulation would sort each group inside ONE
    * task — the global-order anti-pattern this engine exists to kill).
    * The composite prefix sums bleed across group boundaries by
    * construction; each group then subtracts the totals of all earlier
    * groups — a bounded |groups|-row aggregate broadcast back.
    *
    * CONTRACT — BOUNDED GROUP COUNT REQUIRED. The DATA path is fully
    * range-partitioned, but the OFFSETS path is one row per group fed
    * through an unpartitioned `boundedWindow(group)` and then a
    * broadcast join: both are O(|groups|) in a single task / on the
    * driver. This is the right trade while |groups| is small (a
    * dimension-like column: event_type, source, shard) and WRONG for a
    * high-cardinality group (user_id at 100 TB) — there, call
    * [[prefixSumsByRange]] per group partition or restructure so the
    * group rides the range key. Every in-repo caller (q211's
    * event_type; q151/q152's global order) is bounded; PlanQualitySpec
    * locks the offsets-side broadcast as the only unbounded-looking
    * exchange in the plan.
    */
  def groupedPrefixSumsByRange(df: DataFrame, groupCol: String,
                               orderCol: String, valueCols: Seq[String],
                               partitions: Int): DataFrame = {
    val keyed = df.withColumn("_gord",
      struct(col(groupCol), col(orderCol)))
    val cum = prefixSumsByRange(keyed, "_gord", valueCols, partitions)
    val gtots = valueCols.map(v => sum(col(v)).as(s"_gt_$v"))
    val wg = boundedWindow(groupCol)
      .rowsBetween(Window.unboundedPreceding, -1)
    val offs = df.groupBy(groupCol).agg(gtots.head, gtots.tail: _*)
      .select(col(groupCol) +: valueCols.map(v =>
        coalesce(sum(col(s"_gt_$v")).over(wg), lit(0L))
          .as(s"_goff_$v")): _*)
    // NULL-SAFE join: groupBy emits a NULL-group row in `offs` and the
    // rows carry it too, but an equality join would drop them silently
    // (NULL != NULL) — prefix sums for a nullable group must survive
    val joined = cum.join(broadcast(offs.withColumnRenamed(groupCol,
        "_goff_key")), col(groupCol) <=> col("_goff_key"))
    val adj = valueCols.foldLeft(joined) {
      (d, v) => d.withColumn(s"cum_$v", col(s"cum_$v") - col(s"_goff_$v"))
    }
    adj.drop("_gord" +: "_goff_key" +: valueCols.map(v => s"_goff_$v"): _*)
  }

  /** Pettitt changepoint test (Pettitt 1979) per group: the rank-based
    * CUSUM U_t = Σ_{i≤t} Σ_{j>t} sgn(X_i − X_j), maximized over split
    * points t in the `orderCol` total order; the argmax is the single
    * most likely changepoint. Exact and distributed via the rank
    * identity U_t = Σ_{i≤t} 2·R_i − t(n+1), with 2×MIDRANKS (integer
    * even with ties) so tied values contribute sgn = 0 exactly:
    *   1. per-group value histogram → 2·midrank per distinct value via
    *      one grouped prefix sum over the VALUE order;
    *   2. rank-sum prefix S_t and index t via a second grouped prefix
    *      sum over the TIME order;
    *   3. U_t = S_t − t(n+1), all integer; argmax |U_t| with ties to
    *      the earliest t.
    * Two range exchanges + two joins total — no per-group sort task,
    * no float anywhere. Returns (group, n, t_star, u_at, u_abs, at).
    */
  def pettittChangepoint(df: DataFrame, groupCol: String, valueCol: String,
                         orderCol: String,
                         partitions: Int = 32): DataFrame = {
    // hist is consumed three times (the grouped prefix-sum's cum AND
    // offsets paths, plus `tot` below) and `rows` twice — without the
    // checkpoints each consumer re-runs the raw scan + histogram
    // shuffle as its own job. Both frames are at most one row per
    // (group, distinct value) resp. input row, so the materialization
    // is bounded by the input size it saves re-reading. DISK_ONLY:
    // checkpoint blocks are non-evictable, and input-sized frames in
    // storage memory starve execution memory at scale (the q164 sf1.0
    // UNABLE_TO_ACQUIRE_MEMORY lesson) — re-read IO is the safe price.
    val hist = df.groupBy(col(groupCol), col(valueCol))
      .agg(count(lit(1)).as("_ng"))
      .localCheckpoint(eager = true, StorageLevel.DISK_ONLY)
    val hc = groupedPrefixSumsByRange(hist, groupCol, valueCol,
      Seq("_ng"), partitions)
    val r2 = hc.select(col(groupCol), col(valueCol),
      (lit(2L) * (col("cum__ng") - col("_ng")) + col("_ng") + lit(1L))
        .as("_r2"))
    val rows = df.join(r2, Seq(groupCol, valueCol))
      .withColumn("_one", lit(1L))
      .localCheckpoint(eager = true, StorageLevel.DISK_ONLY)
    val tc = groupedPrefixSumsByRange(rows, groupCol, orderCol,
      Seq("_one", "_r2"), partitions)
    val tot = hist.groupBy(groupCol).agg(sum("_ng").as("n"))
    tc.join(broadcast(tot), groupCol)
      .select(col(groupCol), col(orderCol), col("n"),
        col("cum__one").as("t"),
        (col("cum__r2") - col("cum__one") * (col("n") + lit(1L))).as("u"))
      .filter(col("t") < col("n"))
      .groupBy(groupCol)
      .agg(max("n").as("n"),
        max(struct(abs(col("u")).as("ua"), (-col("t")).as("mt"),
          col("u").as("uv"), col(orderCol).as("oc"))).as("_b"))
      .select(col(groupCol), col("n"), (-col("_b.mt")).as("t_star"),
        col("_b.uv").as("u_at"), col("_b.ua").as("u_abs"),
        col("_b.oc").as("at"))
  }

  /** Two-sample Kolmogorov–Smirnov over `valueCol`, groups selected by
    * the boolean columns `isA` / `isB`.
    *
    * D = sup_v |F_A(v) − F_B(v)| computed on the integer grid: the
    * sup of |cumA·n_B − cumB·n_A| over distinct values, divided by
    * n_A·n_B only at the very end (one floor-quantized division).
    * One row out: n1, n2, d_num (the integer numerator) and `ks`
    * (= d_num/(n1·n2) floored to 1e-8).
    */
  def ksTwoSample(df: DataFrame, valueCol: Column, isA: Column, isB: Column,
                  partitions: Int = 32): DataFrame = {
    val counts = df.filter(isA || isB)
      .groupBy(valueCol.as("v"))
      .agg(sum(when(isA, 1L).otherwise(0L)).as("ca"),
        sum(when(isB, 1L).otherwise(0L)).as("cb"))
    val cum = prefixSumsByRange(counts, "v", Seq("ca", "cb"), partitions)
      .withColumnRenamed("cum_ca", "fa")
      .withColumnRenamed("cum_cb", "fb")
    // totals from the histogram, not a second scan of the input
    val tot = counts.agg(sum("ca").as("n1"), sum("cb").as("n2"))
    cum.crossJoin(broadcast(tot))
      .groupBy("n1", "n2")
      .agg(max(abs(col("fa") * col("n2") - col("fb") * col("n1")))
        .as("d_num"))
      // integer floor division keeps the quantization exact — the
      // numerator stays < 2^63 up to n1·n2 ~ 9e10 (document scale: at
      // larger n switch d_num to decimal and drop the 1e8 grid)
      .select(col("n1"), col("n2"), col("d_num"),
        (expr("d_num * 100000000L div (n1 * n2)").cast("double") /
          lit(1.0e8)).as("ks"))
  }

  /** Mann–Whitney U (rank-sum) between groups A and B on `valueCol`,
    * with the standard midrank treatment of ties, kept integer-exact by
    * carrying DOUBLED rank sums (midranks are half-integers).
    *
    * For a tie block of c = ca+cb equal values starting after `before`
    * smaller observations, each member's midrank is
    * (2·before + c + 1)/2, so A's doubled rank-sum contribution is
    * ca·(2·before + c + 1). Then 2·U_A = 2·R_A − n1·(n1+1).
    * Output: n1, n2, u2 (= 2·U_A, integer) and `auc` = U_A/(n1·n2)
    * floored to 1e-8 — the probability a random A outranks a random B.
    */
  def mannWhitneyU(df: DataFrame, valueCol: Column, isA: Column, isB: Column,
                   partitions: Int = 32): DataFrame = {
    val counts = df.filter(isA || isB)
      .groupBy(valueCol.as("v"))
      .agg(sum(when(isA, 1L).otherwise(0L)).as("ca"),
        sum(when(isB, 1L).otherwise(0L)).as("cb"))
      .withColumn("c", col("ca") + col("cb"))
    val cum = prefixSumByRange(counts, "v", "c", partitions)
      .withColumn("bef", col("cum") - col("c"))
    // totals from the histogram, not a second scan of the input
    val tot = counts.agg(sum("ca").as("n1"), sum("cb").as("n2"))
    cum.crossJoin(broadcast(tot))
      .groupBy("n1", "n2")
      .agg(sum(col("ca") * (lit(2L) * col("bef") + col("c") + lit(1L)))
        .as("r2a"))
      .select(col("n1"), col("n2"),
        (col("r2a") - col("n1") * (col("n1") + lit(1L))).as("u2"),
        (expr("(r2a - n1 * (n1 + 1)) * 50000000L div (n1 * n2)")
          .cast("double") / lit(1.0e8)).as("auc"))
  }

  /** Chi-square test of independence between two categorical columns.
    *
    * Expected counts e = row·col/N are exact rationals; the per-cell
    * term (o−e)²/e is three correctly-rounded IEEE double operations on
    * inputs that are exact integers-in-doubles, so both engines compute
    * the identical double, and the per-cell floor(term·1e6) makes the
    * cross-cell sum order-independent. The contingency table itself is
    * one `groupBy(a, b).count` — the only full-data shuffle; margins
    * are tiny aggregates broadcast back.
    * Output: one row — n_cells, dof, n, chi2 (floored to 1e-6).
    */
  def chiSquare(df: DataFrame, aCol: Column, bCol: Column): DataFrame = {
    val cells = df.groupBy(aCol.as("a"), bCol.as("b"))
      .agg(count(lit(1)).as("o"))
    val rows = cells.groupBy("a").agg(sum("o").as("r"))
    val cols = cells.groupBy("b").agg(sum("o").as("c"))
    val n = cells.agg(sum("o").as("n"))
    cells.join(broadcast(rows), "a").join(broadcast(cols), "b")
      .crossJoin(broadcast(n))
      .withColumn("e", col("r").cast("double") * col("c").cast("double") /
        col("n").cast("double"))
      .withColumn("term_q", floor((col("o").cast("double") - col("e")) *
        (col("o").cast("double") - col("e")) / col("e") * lit(1.0e6))
        .cast("long"))
      .agg(count(lit(1)).as("n_cells"),
        ((countDistinct("a") - lit(1)) * (countDistinct("b") - lit(1)))
          .as("dof"),
        first(col("n")).as("n"),
        (sum(col("term_q")).cast("double") / lit(1.0e6)).as("chi2"))
  }
}
