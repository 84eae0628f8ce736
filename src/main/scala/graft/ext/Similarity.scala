package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Similarity search over an embedding column (`Array[Float]`).
  *
  * Baseline: brute-force cosine top-k (exact). Scale path: bucketed ANN —
  * sign-LSH buckets computed per-row, candidates restricted to the probe's
  * bucket, so the join is an equi-join on a short key instead of a cross
  * join. All arithmetic is double-precision, left-to-right `aggregate`
  * folds, so a single-threaded SQL oracle produces bit-identical values.
  */
object Similarity {

  /** Dot product of two float arrays in double precision — the native
    * expression [[graft.functions.NativeExprs.dot]] (sequential fold in a
    * tight loop; deterministic and oracle-exact). The equivalent HOF form
    * `aggregate(zip_with(a, b, _*_), 0.0, _+_)` is interpreted and ~20×
    * slower in the pair-scoring hot path.
    */
  def dot(a: Column, b: Column): Column =
    graft.functions.NativeExprs.dot(a, b)

  def norm(a: Column): Column = sqrt(dot(a, a))

  def cosine(a: Column, b: Column): Column = dot(a, b) / (norm(a) * norm(b))

  /** Exact top-k cosine neighbors for each probe vector.
    * Brute force = one broadcast of the (small) probe set against the full
    * corpus: at 100 TB you broadcast the probes, never the corpus, and the
    * scan stays a single map stage + per-partition top-k via window.
    */
  def bruteForceTopK(corpus: DataFrame, probes: DataFrame, idCol: String,
                     vecCol: String, k: Int): DataFrame = {
    val pairs = probes.select(col(idCol).as("probe_id"),
        col(vecCol).as("probe_vec"))
      .hint("broadcast")
      .crossJoin(corpus.select(col(idCol).as("nn_id"), col(vecCol).as("nn_vec")))
      .filter(col("probe_id") =!= col("nn_id"))
      .withColumn("cos", cosine(col("probe_vec"), col("nn_vec")))
    rankTopK(pairs, k)
  }

  /** Sign-LSH bucket key: the sign bits of the first `bits` dimensions.
    * (A trivially deterministic stand-in for random-hyperplane LSH; at
    * scale, replace the selector with seeded pseudo-random hyperplanes —
    * the plumbing, one short string key per row, is identical.)
    */
  def signBucket(vec: Column, bits: Int): Column =
    concat((0 until bits).map(i =>
      when(element_at(vec, i + 1) >= 0, lit("1")).otherwise(lit("0"))): _*)

  /** IVF-style cell assignment: each vector goes to its nearest centroid
    * (max cosine, ties to the lowest centroid id). Centroids are by
    * construction a SMALL relation (nlist rows) — the assignment is a
    * broadcast nested loop + one hash aggregation with map-side partial
    * `max_by`, so the corpus is scanned once and never shuffled wide.
    * Deterministic "training": centroids are the first `nlist` vectors by
    * id (a seeded coarse quantizer; swap in k-means centroids without
    * touching the plumbing).
    */
  def ivfAssign(vectors: DataFrame, centroids: DataFrame, idCol: String,
                vecCol: String): DataFrame = {
    val cells = vectors.alias("v")
      .crossJoin(broadcast(centroids.select(col(idCol).as("__cid"),
        col(vecCol).as("__cvec"))))
      .withColumn("__cos", cosine(col(s"v.$vecCol"), col("__cvec")))
      .groupBy(col(s"v.$idCol").as(idCol))
      .agg(max_by(col("__cid"), struct(col("__cos"), -col("__cid")))
        .as("cell"))
    vectors.join(cells, idCol)
  }

  /** IVF ANN top-k (nprobe=1): probes search only their own cell.
    * One equi-join on the cell id replaces the cross join; recall is
    * bounded by quantizer quality exactly as in a real IVF index.
    */
  def ivfTopK(corpus: DataFrame, probes: DataFrame, idCol: String,
              vecCol: String, k: Int, nlist: Int): DataFrame = {
    val centroids = corpus.filter(col(idCol) < nlist)
    val c = ivfAssign(corpus, centroids, idCol, vecCol)
      .select(col(idCol).as("nn_id"), col(vecCol).as("nn_vec"), col("cell"))
    val p = ivfAssign(probes, centroids, idCol, vecCol)
      .select(col(idCol).as("probe_id"), col(vecCol).as("probe_vec"),
        col("cell"))
    val pairs = p.join(c, Seq("cell"))
      .filter(col("probe_id") =!= col("nn_id"))
      .withColumn("cos", cosine(col("probe_vec"), col("nn_vec")))
    rankTopK(pairs, k)
  }

  /** Bucketed ANN top-k: candidates share the probe's sign bucket.
    * One equi-join shuffle on the bucket key instead of a cross join.
    */
  def bucketedTopK(corpus: DataFrame, probes: DataFrame, idCol: String,
                   vecCol: String, k: Int, bits: Int = 4): DataFrame = {
    val c = corpus.select(col(idCol).as("nn_id"), col(vecCol).as("nn_vec"),
      signBucket(col(vecCol), bits).as("bucket"))
    val p = probes.select(col(idCol).as("probe_id"),
      col(vecCol).as("probe_vec"),
      signBucket(col(vecCol), bits).as("bucket"))
    val pairs = p.join(c, Seq("bucket"))
      .filter(col("probe_id") =!= col("nn_id"))
      .withColumn("cos", cosine(col("probe_vec"), col("nn_vec")))
    rankTopK(pairs, k)
  }

  /** Per-probe top-k ranking via the custom heap operator
    * ([[graft.plans.TopKPerKey]]): one clustering exchange, no
    * per-partition sort — the window row_number formulation would fully
    * sort every candidate set first.
    */
  private def rankTopK(pairs: DataFrame, k: Int): DataFrame =
    graft.plans.TopKPerKey.topKPerKey(
      pairs.select("probe_id", "nn_id", "cos"),
      Seq("probe_id"),
      Seq(graft.plans.TopKPerKey.Sort("cos", asc = false),
        graft.plans.TopKPerKey.Sort("nn_id")), k)
      .select("probe_id", "nn_id", "cos", "rank")
}
