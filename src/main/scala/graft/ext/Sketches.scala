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
}
