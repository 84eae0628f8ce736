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

  /** Default LSH seed — any value works; fixed so buckets are stable
    * across runs (re-bucketing an incrementally-growing corpus must not
    * move existing rows).
    */
  val DefaultSeed = 42L

  /** ±1 Rademacher weights of hyperplane `bit` (seeded splitmix64).
    * Driver-side and plan-time only: the weights depend on (seed, bit,
    * dim), never on data, so they are baked into the plan as literals —
    * per-row cost is the projection itself, and an external system (the
    * SQL oracle, a feature store, a retrieval service) can reproduce the
    * exact buckets from the same (seed, bits, dims) triple.
    */
  def hyperplaneSigns(seed: Long, bit: Int, dims: Int): Array[Int] = {
    var x = seed * 0x9E3779B97F4A7C15L + (bit + 1) * 0xBF58476D1CE4E5B9L
    Array.fill(dims) {
      x += 0x9E3779B97F4A7C15L
      var z = x
      z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
      z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
      z ^= (z >>> 31)
      if (z >= 0L) 1 else -1
    }
  }

  /** Sign-LSH bucket key: `bits` random-hyperplane sign bits
    * (Charikar 2002's SimHash for real vectors — P[bit differs] =
    * angle/π). Rademacher (±1) hyperplanes rather than Gaussian: the
    * projection is an add/subtract chain (no multiplies), the LSH
    * property holds, and the left-associated double-precision sum is
    * bit-reproducible by any engine that evaluates `±v1 ±v2 …` in order.
    *
    * Evaluated by the native [[graft.functions.NativeExprs.signLshBuckets
    * SignLshBucketsExpr]] — the column-composed form
    * ([[signBucketCols]]) is `bits × dims` element_at terms whose
    * generated Java breaks janino at production widths, dropping the
    * stage to interpreted mode.
    */
  def signBucket(vec: Column, bits: Int, dims: Int,
                 seed: Long = DefaultSeed): Column =
    element_at(signBuckets(vec, bits, dims, seed, tables = 1), 1)

  /** All `tables` bucket keys at once (table t seeded `seed + t`) — one
    * native expression, one pass over the vector.
    */
  def signBuckets(vec: Column, bits: Int, dims: Int, seed: Long,
                  tables: Int): Column =
    graft.functions.NativeExprs.signLshBuckets(vec, bits, dims, seed, tables)

  /** Column-composed reference implementation of [[signBucket]] (kept as
    * the bit-identity parity twin for specs; do not use in hot paths —
    * see [[signBucket]]'s codegen note).
    */
  private[graft] def signBucketCols(vec: Column, bits: Int, dims: Int,
                                    seed: Long = DefaultSeed): Column =
    concat((0 until bits).map { i =>
      val w = hyperplaneSigns(seed, i, dims)
      val proj = (0 until dims).map { j =>
        val e = element_at(vec, j + 1).cast("double")
        if (w(j) > 0) e else -e
      }.reduce(_ + _)
      when(proj >= 0, lit("1")).otherwise(lit("0"))
    }: _*)

  /** Deterministic pseudo-random coarse quantizer: the `nlist` corpus
    * vectors ranked first by `md5(id)` (hash order ≈ uniform sample,
    * decorrelated from id order — first-`nlist`-by-id would inherit any
    * id-locality in the data). Plans as TakeOrderedAndProject: each task
    * keeps `nlist` (id, vec) rows, the driver merges — no global sort of
    * the corpus. Swap in k-means centroids without touching the plumbing.
    */
  def sampleCentroids(corpus: DataFrame, idCol: String, vecCol: String,
                      nlist: Int): DataFrame =
    corpus.select(col(idCol), col(vecCol))
      .orderBy(md5(col(idCol).cast("string").cast("binary")), col(idCol))
      .limit(nlist)

  /** Distributed Lloyd's k-means over the embedding column — the real
    * IVF coarse quantizer ([[sampleCentroids]] is the train-free
    * fallback). Deterministic init (hash-sampled vectors), fixed `iters`
    * rounds; assignment is by max cosine (spherical k-means, matching
    * the IVF search metric).
    *
    * Scale shape per round: centroids ride to executors as a plan
    * constant (nlist × dims doubles, broadcast-equivalent); assignment is
    * a map-only corpus scan (inline argmax, no shuffle, no join-back —
    * see [[ivfAssign]]); the centroid update is
    * a single hash aggregation with map-side partial sums — `dims`
    * native `sum(element_at(vec, i))` aggregates, so the shuffle carries
    * nlist × (dims+1) doubles per map task, not vectors. The corpus is
    * never shuffled. Train on a sample at 100 TB (pass
    * `corpus.sample(...)`); quantizer quality needs thousands of points
    * per centroid, not the full corpus.
    *
    * Cells that lose all members simply drop (standard Lloyd's; the
    * quantizer then has < nlist cells). Per-dimension sums go through
    * exact DECIMAL(38,12) (associative, no rounding drift), so the
    * trained centroids — and every assignment derived from them — are
    * bit-identical across runs and partitionings, which is what lets
    * q56 verify a TRAINED index against a SQL oracle with unrolled
    * Lloyd iterations.
    */
  def kmeansCentroids(corpus: DataFrame, idCol: String, vecCol: String,
                      nlist: Int, dims: Int, iters: Int = 3): DataFrame = {
    require(iters >= 1 && nlist >= 1 && dims >= 1)
    // the training set is scanned once per Lloyd round — cache it for
    // the loop (it is the SAMPLE at corpus scale, sized to fit memory)
    val train = corpus.select(col(idCol), col(vecCol)).cache()
    var cents = sampleCentroids(train, idCol, vecCol, nlist)
      .localCheckpoint(eager = true)
    var round = 0
    while (round < iters) {
      val assigned = ivfAssign(train, cents, idCol, vecCol)
      // exact DECIMAL per-dimension sums (Parity-style): decimal addition
      // is associative/commutative, so centroids are bit-identical
      // regardless of partitioning — k-means becomes fully deterministic
      // and therefore ORACLE-VERIFIABLE (q56); double sums would drift by
      // partition order in the last ulp and flip boundary assignments
      val sums = assigned.groupBy(col("cell"))
        .agg(count(lit(1)).as("__n"),
          (0 until dims).map(i =>
            sum(element_at(col(vecCol), i + 1).cast("double")
              .cast(org.apache.spark.sql.types.DecimalType(38, 12)))
              .as(s"__s$i")): _*)
      cents = sums.select(col("cell").as(idCol),
        array((0 until dims).map(i =>
          (col(s"__s$i").cast("double") /
            col("__n").cast("double"))): _*).as(vecCol))
        .localCheckpoint(eager = true) // per-round lineage cut
      round += 1
    }
    train.unpersist()
    cents
  }

  /** Driver-side centroid snapshot for inline assignment: (ids, vectors
    * as doubles). A quantizer is SMALL by construction (nlist rows —
    * thousands of points per cell is what makes it a quantizer), so
    * collecting it is the same cost class as the `broadcast()` the old
    * join-based assignment already paid; float→double widening is exact,
    * so values are unchanged. Requires an integral id column.
    */
  private def collectCentroids(centroids: DataFrame, idCol: String,
                               vecCol: String): (Array[Long], Array[Array[Double]]) = {
    // enforce the integral-id contract loudly: a string id would CAST to
    // null and Row.getLong would silently unbox null to 0L, collapsing
    // every such centroid onto cell 0 — wrong answers, no error
    import org.apache.spark.sql.types.{ByteType, ShortType, IntegerType, LongType}
    val idType = centroids.schema(idCol).dataType
    require(Set[org.apache.spark.sql.types.DataType](
      ByteType, ShortType, IntegerType, LongType).contains(idType),
      s"collectCentroids: id column '$idCol' must be integral, got " +
        s"${idType.sql} — non-numeric ids would cast to null and " +
        "silently collapse onto cell 0")
    val rows = centroids.select(col(idCol).cast("long"),
      col(vecCol).cast("array<double>")).collect()
    rows.zipWithIndex.foreach { case (r, i) =>
      require(!r.isNullAt(0), s"collectCentroids: null id at centroid row $i")
    }
    (rows.map(_.getLong(0)), rows.map(_.getSeq[Double](1).toArray))
  }

  /** IVF cell assignment, one row per (vector, probed cell): each vector
    * keeps its `nprobe` nearest centroids (max cosine, ties to the lowest
    * centroid id).
    *
    * Assignment is a pure per-row function of (vec, centroids), so it is
    * computed INLINE by [[graft.functions.NativeExprs.ivfCells]] over the
    * driver-collected centroid array — one codegen'd map stage, zero
    * shuffles. The previous formulation (crossJoin broadcast centroids →
    * groupBy max_by / top-k → join back on the id) paid an avoidable
    * corpus-wide aggregation shuffle plus a sort-merge join-back; at
    * corpus scale that was the dominant cost of every index build and
    * every Lloyd round. nprobe>1 (query-side multi-probe) explodes the
    * per-row cell array — still map-only, and only over the small probe
    * side.
    */
  def ivfAssign(vectors: DataFrame, centroids: DataFrame, idCol: String,
                vecCol: String, nprobe: Int = 1): DataFrame = {
    val (ids, vecs) = collectCentroids(centroids, idCol, vecCol)
    assignInline(vectors, vecCol, ids, vecs, nprobe)
  }

  private def assignInline(vectors: DataFrame, vecCol: String,
                           centIds: Array[Long],
                           centVecs: Array[Array[Double]],
                           nprobe: Int): DataFrame = {
    val cells = graft.functions.NativeExprs
      .ivfCells(col(vecCol), centIds, centVecs, nprobe)
    if (nprobe == 1) vectors.withColumn("cell", cells)
    else vectors.withColumn("cell", explode(cells))
  }

  /** IVF ANN top-k: corpus vectors live in their nearest cell; probes
    * search their `nprobe` nearest cells. Candidate generation is an
    * equi-join on the cell id — nprobe multiplies candidates (and
    * recall), never the corpus side of the shuffle. A corpus vector is in
    * exactly one cell, so multi-probe never produces duplicate pairs.
    */
  def ivfTopK(corpus: DataFrame, probes: DataFrame, idCol: String,
              vecCol: String, k: Int, nlist: Int,
              nprobe: Int = 1, trainIters: Int = 0,
              dims: Int = 0): DataFrame = {
    require(trainIters == 0 || dims > 0,
      "k-means training (trainIters > 0) needs the vector dims")
    val centroids =
      if (trainIters > 0)
        kmeansCentroids(corpus, idCol, vecCol, nlist, dims, trainIters)
      else sampleCentroids(corpus, idCol, vecCol, nlist)
    // one driver-side snapshot serves both assignment sides
    val (cids, cvecs) = collectCentroids(centroids, idCol, vecCol)
    val c = assignInline(corpus, vecCol, cids, cvecs, nprobe = 1)
      .select(col(idCol).as("nn_id"), col(vecCol).as("nn_vec"), col("cell"))
    val p = assignInline(probes, vecCol, cids, cvecs, nprobe)
      .select(col(idCol).as("probe_id"), col(vecCol).as("probe_vec"),
        col("cell"))
    val pairs = p.join(c, Seq("cell"))
      .filter(col("probe_id") =!= col("nn_id"))
      .withColumn("cos", cosine(col("probe_vec"), col("nn_vec")))
    rankTopK(pairs, k)
  }

  /** Bucketed ANN top-k: candidates share the probe's sign bucket in at
    * least one of `tables` independent hash tables (table t's hyperplanes
    * come from `seed + t`). One equi-join shuffle on the short
    * (table, bucket) key instead of a cross join.
    *
    * Multi-table is the standard LSH recall amplifier: a true neighbor at
    * angle θ survives one b-bit table with p = (1−θ/π)^b, but survives
    * SOME of L tables with 1−(1−p)^L — recall is tuned by L without
    * touching precision-critical b. A pair colliding in several tables is
    * emitted only from its lowest shared table (the same minimal-band
    * guard as [[Dedup.minhashCandidates]]), so the candidate set is
    * duplicate-free with NO pair-level distinct shuffle; the guard is an
    * O(L) chain of string compares per pair, all codegen-able.
    */
  def bucketedTopK(corpus: DataFrame, probes: DataFrame, idCol: String,
                   vecCol: String, k: Int, bits: Int, dims: Int,
                   seed: Long = DefaultSeed, tables: Int = 1): DataFrame = {
    require(tables >= 1, "tables must be >= 1")
    def withBuckets(df: DataFrame, pfx: String) =
      df.select(col(idCol).as(s"${pfx}_id"), col(vecCol).as(s"${pfx}_vec"),
        signBuckets(col(vecCol), bits, dims, seed, tables)
          .as(s"${pfx}_bks"))
        .select(col(s"${pfx}_id"), col(s"${pfx}_vec"), col(s"${pfx}_bks"),
          posexplode(col(s"${pfx}_bks")).as(Seq("tbl", "bucket")))
    val c = withBuckets(corpus, "nn")
    val p = withBuckets(probes, "probe")
    val minimalTable = (1 until tables).foldLeft(
      when(col("tbl") === 0, lit(true))) { (acc, t) =>
      acc.when(col("tbl") === t,
        (0 until t).map(j =>
          element_at(col("probe_bks"), j + 1) =!=
            element_at(col("nn_bks"), j + 1))
          .reduce(_ && _))
    }.otherwise(lit(false))
    val pairs = p.join(c, Seq("tbl", "bucket"))
      .filter(col("probe_id") =!= col("nn_id"))
      .filter(minimalTable)
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
