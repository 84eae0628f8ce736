package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic sketches — estimators whose value is a pure function of
  * the data and the (portable md5) hash family, so a SQL oracle verifies
  * them EXACTLY, unlike HLL-style approx_count_distinct whose registers
  * differ per implementation.
  */
object Sketches {

  /** KMV (k-minimum-values) distinct-count estimate: keep the k smallest
    * hashes of the value domain; estimate = (k−1) / max_kth (hashes
    * mapped to (0,1]). One aggregation with map-side partial top-k
    * (sort_array(slice) over collected mins via groupBy min of exploded
    * ranks is shuffle-heavy; the simple global orderBy+limit is fine
    * because only k tiny rows survive the per-partition top-k pushdown —
    * Spark plans orderBy.limit as TakeOrderedAndProject, no full sort).
    */
  def kmvDistinct(df: DataFrame, valueCol: Column, k: Int): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val hashed = df.select(
      Shingles.baseHash(valueCol.cast("string")).as("h")).distinct()
    val topK = hashed.orderBy($"h".asc).limit(k)
    topK.agg(
      count(lit(1)).as("k_actual"),
      max($"h").as("kth_hash"))
      .select(
        col("k_actual"),
        col("kth_hash"),
        estimateCol(k))
  }

  // hashes are uniform on [0, 2^28); estimate via the classic
  // (k-1)/kth_fraction, exact-integer arithmetic until the final
  // division so the oracle reproduces it bit-for-bit
  private def estimateCol(k: Int): Column =
    when(col("k_actual") < k, col("k_actual").cast("double"))
      .otherwise((col("k_actual") - 1).cast("double") * 268435456.0 /
        col("kth_hash").cast("double"))
      .as("distinct_estimate")

  /** Per-group KMV distinct-count estimates — the grouped form of
    * [[kmvDistinct]], with the k-smallest-hash selection running on the
    * custom heap-based [[graft.plans.TopKPerKey]] physical operator
    * (O(n log k) per partition, no per-group sort, map-side combining),
    * which is exactly the shape a sketch needs at 100 TB: the
    * (group, hash) exchange carries at most k rows per group out of
    * each map task, never a group's full distinct set. Mergeability is
    * structural — partial k-minima sets union into the global k-minima,
    * the same property that lets KMV sketches be maintained per
    * partition/day and folded later.
    */
  def kmvDistinctByGroup(df: DataFrame, groupCol: String, valueCol: Column,
                         k: Int): DataFrame = {
    val hashed = df.select(col(groupCol),
      Shingles.baseHash(valueCol.cast("string")).as("h")).distinct()
    val topK = graft.plans.TopKPerKey.topKPerKey(
      hashed, Seq(groupCol), Seq(graft.plans.TopKPerKey.Sort("h")), k)
    topK.groupBy(groupCol).agg(
      count(lit(1)).as("k_actual"),
      max(col("h")).as("kth_hash"))
      .select(col(groupCol), col("k_actual"), col("kth_hash"),
        estimateCol(k))
  }

  /** KMV join-cardinality estimation — the cost-based-optimizer
    * primitive: from two k-minimum-values sketches, estimate the key
    * domains, their union/intersection (the k smallest of K_A ∪ K_B is
    * the union's KMV; the members present in both sketches estimate the
    * Jaccard), and the equi-join output size
    * |A|/D_A · |B|/D_B · D_∩ (uniform-frequency model). Each side is
    * one scan + a k-row TakeOrdered — the sketch-collection cost a
    * planner can afford at 100 TB — and the estimator is a pure
    * function of the md5 hash family, so the oracle reproduces every
    * number bit-for-bit (integer arithmetic until the final divisions).
    */
  def kmvJoinCardinality(a: DataFrame, keyA: Column, b: DataFrame,
                         keyB: Column, k: Int): DataFrame = {
    def kMin(df: DataFrame, key: Column, flag: String) = df
      .select(Shingles.baseHash(key.cast("string")).as("h")).distinct()
      .orderBy(col("h")).limit(k).withColumn(flag, lit(1))
    def sideStats(km: DataFrame, n: DataFrame, suffix: String) = km
      .agg(count(lit(1)).as("k_actual"), max(col("h")).as("kth_hash"))
      .select(estimateCol(k)).crossJoin(n)
      .select(col("distinct_estimate").as(s"d_$suffix"),
        col("n").as(s"n_$suffix"))
    val kA = kMin(a, keyA, "in_a")
    val kB = kMin(b, keyB, "in_b")
    val statsA = sideStats(kA, a.agg(count(lit(1)).as("n")), "a")
    val statsB = sideStats(kB, b.agg(count(lit(1)).as("n")), "b")
    val u = kA.join(kB, Seq("h"), "full_outer")
      .select(col("h"), coalesce(col("in_a"), lit(0)).as("in_a"),
        coalesce(col("in_b"), lit(0)).as("in_b"))
      .orderBy(col("h")).limit(k)
    u.agg(count(lit(1)).as("k_actual"), max(col("h")).as("kth_hash"),
        sum(col("in_a") * col("in_b")).as("n_both"))
      .select(col("k_actual"), col("kth_hash"), col("n_both"),
        estimateCol(k))
      .withColumnRenamed("distinct_estimate", "d_union")
      .crossJoin(statsA).crossJoin(statsB)
      .select(col("n_a"), col("n_b"), col("n_both"), col("d_a"),
        col("d_b"), col("d_union"),
        ((col("n_both").cast("double") / col("k_actual").cast("double")) *
          col("d_union")).as("d_intersect"),
        (((col("n_a").cast("double") / col("d_a")) *
          (col("n_b").cast("double") / col("d_b"))) *
          ((col("n_both").cast("double") / col("k_actual").cast("double")) *
            col("d_union"))).as("join_size_est"))
  }

  /** KMV A-not-B: estimate the distinct count of keys in A but not B
    * from the two k-minimum-values sketches alone — the set-DIFFERENCE
    * leg of the sketch algebra next to union/intersection
    * ([[kmvJoinCardinality]]): among the union's k minima, the
    * fraction carrying only the A flag scales the union estimate.
    * Preferable to d_union − d_B at scale because it needs no second
    * subtraction of two noisy estimates and is never negative. Each
    * side costs one scan + a k-row TakeOrdered; pure md5-family
    * function, so the oracle replays every number.
    */
  def kmvANotB(a: DataFrame, keyA: Column, b: DataFrame,
               keyB: Column, k: Int): DataFrame = {
    def kMin(df: DataFrame, key: Column, flag: String) = df
      .select(Shingles.baseHash(key.cast("string")).as("h")).distinct()
      .orderBy(col("h")).limit(k).withColumn(flag, lit(1))
    val u = kMin(a, keyA, "in_a").join(kMin(b, keyB, "in_b"),
        Seq("h"), "full_outer")
      .select(col("h"), coalesce(col("in_a"), lit(0)).as("in_a"),
        coalesce(col("in_b"), lit(0)).as("in_b"))
      .orderBy(col("h")).limit(k)
    u.agg(count(lit(1)).as("k_actual"), max(col("h")).as("kth_hash"),
        sum(col("in_a") * (lit(1) - col("in_b"))).as("n_aonly"))
      .select(col("k_actual"), col("n_aonly"), estimateCol(k))
      .withColumnRenamed("distinct_estimate", "d_union")
      .select(col("k_actual"), col("n_aonly"), col("d_union"),
        ((col("n_aonly").cast("double") / col("k_actual").cast("double"))
          * col("d_union")).as("anotb_est"))
  }

  /** Per-row count-min bucket: row j's hash of value `v` is the shared
    * 28-bit md5 base hash ([[Shingles.baseHash]]) of `"j|v"` mod
    * `width` — the same portable seed-prefix family as MinHash, so the
    * oracle reproduces every bucket exactly.
    */
  private def cmsBucket(j: Column, v: Column, width: Int): Column =
    Shingles.baseHash(concat(j.cast("string"), lit("|"), v)) % width

  /** Two-pass EXACT heavy hitters with a count-min prefilter — the
    * production shape for "exact counts of everything above φ of the
    * total" when the full key domain is too wide to exact-count:
    *
    * Pass 1 builds the depth×width sketch (shuffle bounded by the GRID
    * size, map-side combine collapses each partition to ≤ depth·width
    * partials) and collects it to the driver — `depth·width` longs, a
    * few KB at any corpus size. Pass 2 re-scans and gates each
    * occurrence MAP-SIDE on its sketch estimate (the grid rides along
    * as a literal array — no join, no explode: estimate = min over the
    * depth rows of one array index each), so the exact-count shuffle
    * only ever carries occurrences of candidate keys. Count-min error
    * is one-sided (est ≥ true), so the gate provably never drops a true
    * heavy hitter; the final exact filter removes collision-inflated
    * false candidates.
    *
    * Returns (v, exact_n, cms_est) for every v with den·count ≥ total
    * occurrences — i.e. frequency ≥ 1/den of the stream.
    */
  def heavyHittersExact(df: DataFrame, valueCol: Column, depth: Int,
                        width: Int, den: Long): DataFrame = {
    require(den >= 1, s"heavy-hitter denominator $den")
    val vals = df.select(valueCol.cast("string").as("v"))
    val grid = Array.fill(depth * width)(0L)
    countMin(vals, col("v"), depth, width).collect().foreach { r =>
      grid(r.getInt(0) * width + r.getLong(1).toInt) = r.getLong(2)
    }
    // Row 0 of the grid receives exactly one increment per occurrence,
    // so its counter sum IS the stream length — no extra pass.
    val total = grid.take(width).sum
    val gridLit = lit(grid)
    def est(v: Column): Column = least((0 until depth).map { j =>
      element_at(gridLit,
        (lit(j * width) + cmsBucket(lit(j), v, width)).cast("int") + 1)
    }: _*)
    vals.filter(est(col("v")) * den >= total)
      .groupBy("v").agg(count(lit(1)).as("exact_n"))
      .filter(col("exact_n") * den >= total)
      .withColumn("cms_est", est(col("v")))
  }

  /** Count-min sketch (Cormode & Muthukrishnan, J. Algorithms 2005):
    * `depth` hash rows × `width` counters; each occurrence of a value
    * increments one counter per row. Returns the sketch as a
    * `(j, bucket, c)` table — `depth·width` rows at most, regardless of
    * input size: the heavy-hitter summary that fits in one broadcast
    * where the exact per-value counts do not.
    *
    * One shuffle of `depth × |input|` pre-aggregated rows (map-side
    * combine reduces to ≤ depth·width per partition first — the groupBy
    * key space IS the sketch size, so the shuffle is bounded).
    * Deterministic: integer counters, md5 bucket placement.
    */
  def countMin(df: DataFrame, valueCol: Column, depth: Int,
               width: Int): DataFrame = {
    require(depth >= 1 && width >= 1, s"cms ${depth}x$width")
    df.select(valueCol.cast("string").as("v"))
      .select(col("v"),
        explode(array((0 until depth).map(lit(_)): _*)).as("j"))
      .groupBy(col("j"), cmsBucket(col("j"), col("v"), width).as("bucket"))
      .agg(count(lit(1)).as("c"))
  }

  /** Point-query the sketch: estimate(v) = min over rows j of
    * counter(j, bucket_j(v)) — never under the true count, over only on
    * collisions. The sketch side is ≤ depth·width rows, so the lookup
    * join broadcasts.
    */
  def countMinEstimate(cms: DataFrame, probes: DataFrame,
                       probeCol: String, depth: Int,
                       width: Int): DataFrame =
    probes.select(col(probeCol).cast("string").as("v"))
      .select(col("v"),
        explode(array((0 until depth).map(lit(_)): _*)).as("j"))
      .withColumn("bucket", cmsBucket(col("j"), col("v"), width))
      .join(broadcast(cms), Seq("j", "bucket"), "left")
      .groupBy("v")
      .agg(min(coalesce(col("c"), lit(0L))).as("cms_est"))

  // ── Mergeable quantile sketch (bottom-k-by-hash sample) ──────────────
  //
  // The third sketch leg next to KMV (distinct) and count-min
  // (frequency): per-key quantile summaries for length/score
  // distribution monitoring at 100 TB. KLL / t-digest compactions are
  // batching-DEPENDENT (((A⊎B)⊎C ≠ A⊎(B⊎C) bit-for-bit), so instead the
  // summary is a bottom-k sample in the portable md5 hash order (Cohen &
  // Kaplan's bottom-k sampling): keep the k (hash, value) pairs with the
  // smallest hashes per key. The k-smallest of a union is a pure
  // function of the underlying SET — merge is associative, commutative,
  // and bit-stable under ANY batching, exactly the
  // [[graft.etl.IncrementalAgg]] contract — and since the hash order is
  // a uniform permutation of the rows, the sample is uniform and rank
  // estimates carry the usual O(1/√k) error. Deterministic end to end,
  // so a SQL oracle replays every number exactly.

  /** One batch → per-key partials: exact row count `n` plus the bottom-k
    * `(h, v)` sample `qs_sample` (sorted ascending by `(h, v)`).
    *
    * The k-smallest selection runs on the heap-based
    * [[graft.plans.TopKPerKey]] operator — O(n log k) per partition,
    * map-side combined, so the exchange carries ≤ k rows per key per map
    * task, never a key's full value list. `hashSrc` must identify rows
    * uniquely (an event/doc id): the 28-bit hash then gives a uniform
    * row permutation; `(h, v)` tie-break keeps collisions deterministic.
    */
  def quantilePartial(df: DataFrame, keys: Seq[String], valueCol: Column,
                      hashSrc: Column, k: Int): DataFrame = {
    require(k >= 2, s"quantile sketch k=$k")
    val hashed = df.select(keys.map(col) :+
      Shingles.baseHash(hashSrc.cast("string")).as("h") :+
      valueCol.cast("double").as("v"): _*)
    val counts = hashed.groupBy(keys.map(col): _*)
      .agg(count(lit(1)).as("n"))
    val sample = graft.plans.TopKPerKey.topKPerKey(hashed, keys,
        Seq(graft.plans.TopKPerKey.Sort("h"),
          graft.plans.TopKPerKey.Sort("v")), k)
      .groupBy(keys.map(col): _*)
      .agg(sort_array(collect_list(struct(col("h"), col("v"))))
        .as("qs_sample"))
    counts.join(sample, keys)
  }

  /** Fold partials (same schema) — the bottom-k of the concatenated
    * samples IS the bottom-k of the union, so state never grows past k
    * entries per key and the fold shuffles ≤ 2 sketch rows per key.
    *
    * Batches must PARTITION the input (the q97 contract — `n` sums, so
    * re-feeding a row would double-count it); under that contract any
    * batching and any fold tree produce bit-identical state, because the
    * k-minima of a disjoint union is associative and commutative.
    */
  def quantileMerge(state: DataFrame, delta: DataFrame, keys: Seq[String],
                    k: Int): DataFrame =
    state.unionByName(delta)
      .groupBy(keys.map(col): _*)
      .agg(sum(col("n")).as("n"),
        slice(sort_array(flatten(collect_list(col("qs_sample")))),
          1, k).as("qs_sample"))

  /** Read-time view: median / p90 rank estimates over the value-sorted
    * sample (q55's integer rank discipline — midLo/midHi average for the
    * median, ceil(0.9·m) for p90 — so the oracle reproduces the doubles
    * bit-for-bit).
    */
  def quantileFinish(state: DataFrame, keys: Seq[String]): DataFrame = {
    val vals = array_sort(transform(col("qs_sample"), x => x.getField("v")))
    val m = size(vals).cast("long")
    val midLo = floor((m + lit(1)) / lit(2)).cast("int")
    val midHi = floor((m + lit(2)) / lit(2)).cast("int")
    val p90 = ceil(m * lit(0.9)).cast("int")
    state.select(keys.map(col) ++ Seq(
      col("n"), m.as("n_sampled"),
      ((element_at(vals, midLo) + element_at(vals, midHi)) / 2)
        .as("median_est"),
      element_at(vals, p90).as("p90_est")): _*)
  }

  /** HyperLogLog over the portable md5 hash family — the third distinct
    * sketch next to KMV (q46/q73) and exact NDV (q132), and unlike
    * library HLLs (whose registers differ per implementation) this one
    * is a pure function of the data, so the oracle replays it EXACTLY:
    * 48 hash bits split 6/42 into bucket/rest, register = max rank
    * (leading-zero count + 1) per bucket, raw Flajolet estimate
    * α₆₄·m²/Σ2^(−Mⱼ) with absent buckets contributing 2⁰. Every
    * summand is a power of two spanning ≤ 49 mantissa bits, so the
    * float sum is EXACT and order-independent under any partitioning —
    * no decimal detour needed. No small/large-range bias correction:
    * raw-estimate determinism is the point; the accuracy contract is
    * locked against exact NDV in the spec.
    *
    * Scale: registers are one partial-aggregable groupBy on
    * (group, bucket) — 64 rows per group survive; the estimate folds
    * those. Mergeable by construction (max of maxes).
    */
  def hllDistinct(df: DataFrame, groupCols: Seq[String],
                  key: Column): DataFrame =
    hllEstimate(hllRegisters(df, groupCols, key), groupCols)

  /** The register table (`groupCols…, __bucket, __m`) — ≤ 64 rows per
    * group, mergeable by `max(__m)` per (group, bucket): the state a
    * continuously-maintained distinct sketch stores. */
  def hllRegisters(df: DataFrame, groupCols: Seq[String],
                   key: Column): DataFrame = {
    val split = 4398046511104L // 2^42: 6 bucket bits / 42 rank bits
    val gs = groupCols.map(col)
    // r16: codegen'd 48-bit md5 prefix, value-identical to
    // conv(substring(md5(key),1,12),16,10) without the hex-string
    // materialization (NativeExprsSpec locks the equality)
    df.select(gs :+ graft.functions.NativeExprs.md5Prefix(key, 12)
        .as("__h"): _*)
      .withColumn("__bucket", expr(s"__h div ${split}L"))
      .withColumn("__rest", col("__h") % split)
      .withColumn("__rank", when(col("__rest") === 0, 43)
        .otherwise(lit(43) - length(bin(col("__rest")))))
      .groupBy(gs :+ col("__bucket"): _*)
      .agg(max(col("__rank")).as("__m"))
  }

  /** Finish: fold a register table to the raw Flajolet estimate. */
  def hllEstimate(reg: DataFrame, groupCols: Seq[String]): DataFrame = {
    val m = 64
    val gs = groupCols.map(col)
    reg.groupBy(gs: _*)
      .agg((((lit(m) - count(lit(1))) * lit(1.0)) +
        sum(pow(lit(2.0), -col("__m")))).as("__denom"))
      .select(gs :+ (lit(0.709) * lit(64.0) * lit(64.0) / col("__denom"))
        .as("hll_est"): _*)
  }
}
