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

  /** 2^53 — the element scale that makes k-means sums exact: multiplying
    * a double by it is a pure exponent shift (never rounds), and any
    * float of magnitude ≥ 2^-29 becomes an integer (float ulp ≥ 2^-53
    * there), so the DECIMAL(38,0) cast in [[kmeansCentroids]] is
    * lossless. Shared with the generated oracle SQL.
    */
  val UlpScale: Double = 9007199254740992.0

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
    * quantizer then has < nlist cells). Per-dimension sums are EXACT:
    * each element is scaled by 2^53 — exact in binary (a power-of-two
    * shift), and integral for any float of magnitude ≥ 2^-29, i.e. any
    * realistic embedding component — then summed as DECIMAL(38,0) with
    * NO rounding anywhere (a fractional-digit decimal like (38,12)
    * would round-to-scale at the cast, and Spark rounds HALF_UP where
    * DuckDB rounds HALF_EVEN — an engine-visible drift PQ's ADC scores
    * exposed). The trained centroids — and every score or assignment
    * derived from them — are therefore bit-identical across runs,
    * partitionings, and engines, which is what lets q56/q85 verify a
    * TRAINED index against a SQL oracle with unrolled Lloyd iterations.
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
      // exact per-dimension sums (Parity-style): elements scale by 2^53
      // (exact; integral for |v| >= 2^-29) into DECIMAL(38,0) — decimal
      // addition is associative/commutative AND the cast never rounds,
      // so centroids are bit-identical regardless of partitioning and
      // across engines — k-means becomes fully deterministic and
      // therefore ORACLE-VERIFIABLE (q56, q85); double sums would drift
      // by partition order in the last ulp and flip boundary assignments
      val sums = assigned.groupBy(col("cell"))
        .agg(count(lit(1)).as("__n"),
          (0 until dims).map(i =>
            sum((element_at(col(vecCol), i + 1).cast("double") *
              lit(UlpScale))
              .cast(org.apache.spark.sql.types.DecimalType(38, 0)))
              .as(s"__s$i")): _*)
      cents = sums.select(col("cell").as(idCol),
        array((0 until dims).map(i =>
          (col(s"__s$i").cast("double") / lit(UlpScale) /
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

  /** kNN-graph construction — the corpus×corpus top-k similarity JOIN
    * (every vector is simultaneously probe and indexed point), the
    * primitive behind semantic-dedup graphs, embedding-space cluster
    * seeding, and link-prediction feature tables.
    *
    * Scale shape (the reason this is not `ivfTopK(corpus, corpus)`):
    * ONE map-only assignment pass computes each vector's `nprobe`
    * nearest cells (inline codegen'd [[graft.functions.NativeExprs
    * .ivfCells]] over the driver-collected quantizer — no join, no
    * corpus shuffle); element 1 of that array is the home cell that
    * indexes the vector, the full array is its probe set, so the two
    * sides of the self-join are projections of the same scan instead of
    * two assignment jobs. Candidates come from the cell equi-join —
    * per-vector candidate count is bounded by nprobe × cell size, never
    * all-pairs — and the per-id top-k is the heap operator
    * ([[graft.plans.TopKPerKey]]), so the only corpus-sized shuffles
    * are the cell join and the final per-id clustering. A vector lives
    * in exactly one home cell, so multi-probe never emits a duplicate
    * pair. At 100 TB: nlist scales with corpus size (cells stay
    * ~constant-sized), the quantizer stays O(nlist·dims) driver-side —
    * the same cost class as the broadcast it feeds.
    */
  def knnGraph(corpus: DataFrame, idCol: String, vecCol: String,
               k: Int, nlist: Int, nprobe: Int = 1): DataFrame = {
    require(nprobe >= 1, "nprobe must be >= 1")
    val centroids = sampleCentroids(corpus, idCol, vecCol, nlist)
    val (cids, cvecs) = collectCentroids(centroids, idCol, vecCol)
    val cells = graft.functions.NativeExprs
      .ivfCells(col(vecCol), cids, cvecs, nprobe)
    val assigned = corpus.select(col(idCol), col(vecCol),
      (if (nprobe == 1) array(cells) else cells).as("cells"))
    val index = assigned.select(col(idCol).as("nn_id"),
      col(vecCol).as("nn_vec"), element_at(col("cells"), 1).as("cell"))
    val probes = assigned.select(col(idCol).as("probe_id"),
      col(vecCol).as("probe_vec"), explode(col("cells")).as("cell"))
    val pairs = probes.join(index, Seq("cell"))
      .filter(col("probe_id") =!= col("nn_id"))
      .withColumn("cos", cosine(col("probe_vec"), col("nn_vec")))
    rankTopK(pairs, k)
  }

  /** All `subspaces` PQ codebooks trained together — ONE corpus scan and
    * ONE aggregation shuffle per Lloyd round, regardless of subspace
    * count (training them as independent [[kmeansCentroids]] runs would
    * pay `subspaces ×` the scans and job overhead for identical
    * results). Same decimal-exact arithmetic as [[kmeansCentroids]]:
    * cosine assignment with ties to the lowest id, 2^53-scaled
    * DECIMAL(38,0) sums, bit-reproducible across engines.
    *
    * Per round: a map-only projection computes every subspace's cell
    * (inline codegen'd [[graft.functions.NativeExprs.ivfCells]]) and
    * explodes to one (subspace, cell, subvector) row per subspace — the
    * single shuffle then carries `subspaces × codebookSize × (subDims+1)`
    * partial sums per map task, never vectors. Returns per-subspace
    * (ids, centroid) arrays, driver-side (quantizer-sized by
    * construction).
    */
  def pqCodebooks(corpus: DataFrame, idCol: String, vecCol: String,
                  dims: Int, subspaces: Int, codebookSize: Int,
                  iters: Int): IndexedSeq[(Array[Long], Array[Array[Double]])] = {
    require(subspaces >= 1 && dims % subspaces == 0,
      s"dims $dims must split evenly into $subspaces subspaces")
    val subDims = dims / subspaces
    // init: ONE hash-ordered sample of full vectors; subspace m's seed
    // codebook is its slice of the same rows (the oracle mirrors this)
    val sample = sampleCentroids(corpus, idCol, vecCol, codebookSize)
      .select(col(idCol).cast("long"), col(vecCol).cast("array<double>"))
      .collect()
    var books: IndexedSeq[(Array[Long], Array[Array[Double]])] =
      (0 until subspaces).map { m =>
        (sample.map(_.getLong(0)),
          sample.map(_.getSeq[Double](1)
            .slice(m * subDims, (m + 1) * subDims).toArray))
      }
    val train =
      if (iters > 1) corpus.select(col(idCol), col(vecCol)).cache()
      else corpus
    var round = 0
    while (round < iters) {
      val perSub = array((0 until subspaces).map { m =>
        val sub = slice(col(vecCol), m * subDims + 1, subDims)
        struct(
          graft.functions.NativeExprs
            .ivfCells(sub, books(m)._1, books(m)._2, 1)
            .as("cell"),
          sub.as("sv"))
      }: _*)
      val sums = train.select(posexplode(perSub).as(Seq("m", "s")))
        .select(col("m"), col("s.cell").as("cell"), col("s.sv").as("sv"))
        .groupBy("m", "cell")
        .agg(count(lit(1)).as("__n"),
          (0 until subDims).map(i =>
            sum((element_at(col("sv"), i + 1).cast("double") *
              lit(UlpScale))
              .cast(org.apache.spark.sql.types.DecimalType(38, 0)))
              .as(s"__s$i")): _*)
      val rows = sums.select(col("m"), col("cell"),
        array((0 until subDims).map(i =>
          (col(s"__s$i").cast("double") / lit(UlpScale) /
            col("__n").cast("double"))): _*).as("cvec"))
        .collect()
      books = (0 until subspaces).map { m =>
        val rs = rows.filter(_.getInt(0) == m).sortBy(_.getLong(1))
        (rs.map(_.getLong(1)), rs.map(_.getSeq[Double](2).toArray))
      }
      round += 1
    }
    if (iters > 1) train.unpersist()
    books
  }

  /** Product-quantization ANN top-k (Jégou et al. 2011's PQ/ADC scoring,
    * spherical flavor): the missing index class between sign-LSH and IVF
    * for 100 TB embedding stores — the CORPUS is reduced to `subspaces`
    * small integer codes per vector (64 floats → 4 longs here), and
    * queries never touch the original corpus vectors.
    *
    *  - **Train**: one codebook per subspace — the same decimal-exact
    *    distributed Lloyd's as [[kmeansCentroids]], run over the vector
    *    SLICE, so codebooks (and everything derived) are bit-reproducible
    *    and oracle-verifiable like q56.
    *  - **Encode**: each corpus vector's subspace code is its nearest
    *    codebook centroid (max cosine, ties to the lowest id) — an inline
    *    codegen'd [[graft.functions.NativeExprs.ivfCells]] per subspace,
    *    map-only, zero shuffles.
    *  - **Score (ADC)**: each probe precomputes its distance table — a
    *    `code → dot(probe_sub, centroid)` map per subspace, built from
    *    plan-literal centroid values — and a candidate's score is the sum
    *    of `subspaces` table lookups. Probes broadcast (never the
    *    corpus); the corpus-side scan reads codes, not vectors: the scan
    *    is `subspaces` longs per row instead of `dims` floats — PQ's
    *    memory-bandwidth win.
    *
    * Approximate by design (scores are asymmetric dot products against
    * quantized corpus vectors); recall floor vs [[bruteForceTopK]] is
    * locked in SimilaritySpec.
    */
  def pqTopK(corpus: DataFrame, probes: DataFrame, idCol: String,
             vecCol: String, k: Int, dims: Int, subspaces: Int,
             codebookSize: Int, trainIters: Int = 2): DataFrame = {
    require(subspaces >= 1 && dims % subspaces == 0,
      s"dims $dims must split evenly into $subspaces subspaces")
    val subDims = dims / subspaces
    def subVec(src: Column, m: Int): Column =
      slice(src, m * subDims + 1, subDims)
    // per-subspace codebooks, trained in one aggregation per round and
    // already driver-side (quantizer-sized, broadcast cost class)
    val books = pqCodebooks(corpus, idCol, vecCol, dims, subspaces,
      codebookSize, trainIters)
    val codes = corpus.select(col(idCol).as("nn_id"),
      array((0 until subspaces).map { m =>
        graft.functions.NativeExprs.ivfCells(
          subVec(col(vecCol), m), books(m)._1, books(m)._2, nprobe = 1)
      }: _*).as("codes"))
    // ADC tables: one native expression computes every (subspace, code)
    // partial dot in a tight left-associated loop — bit-reproducible by
    // a SQL oracle evaluating the same chain, and O(codebook) codes
    // without the literal-expression blowup that breaks janino
    val adc = graft.functions.NativeExprs.pqAdc(col(vecCol),
      books.map(_._1), books.map(_._2))
    // squared-norm tables: ||reconstruction||² = Σ_m ||centroid_m||²
    // (the subspaces are an orthogonal decomposition, so this is exact
    // for the quantized vector) — scoring by the RAW dot would let
    // corpus norm variance corrupt the cosine ranking the exact
    // baseline uses; normalizing by the reconstructed norm keeps the
    // score a pure table lookup
    val norms = array((0 until subspaces).map { m =>
      val (ids, vecs) = books(m)
      map(ids.toSeq.zip(vecs.toSeq).flatMap { case (cid, c) =>
        var acc = 0.0
        var i = 0
        while (i < c.length) { acc += c(i) * c(i); i += 1 }
        Seq(lit(cid), lit(acc))
      }: _*)
    }: _*)
    val pnorm = sqrt((0 until dims).map(i =>
      element_at(col(vecCol), i + 1).cast("double") *
        element_at(col(vecCol), i + 1).cast("double")).reduce(_ + _))
    val p = probes.select(col(idCol).as("probe_id"), adc.as("adc"),
      norms.as("nsq"), pnorm.as("pnorm"))
    def lookup(tables: String): Column = (0 until subspaces).map(m =>
      element_at(element_at(col(tables), m + 1),
        element_at(col("codes"), m + 1))).reduce(_ + _)
    val pairs = p.hint("broadcast").crossJoin(codes)
      .filter(col("probe_id") =!= col("nn_id"))
      .withColumn("score",
        lookup("adc") / (col("pnorm") * sqrt(lookup("nsq"))))
    graft.plans.TopKPerKey.topKPerKey(
      pairs.select("probe_id", "nn_id", "score"),
      Seq("probe_id"),
      Seq(graft.plans.TopKPerKey.Sort("score", asc = false),
        graft.plans.TopKPerKey.Sort("nn_id")), k)
      .select("probe_id", "nn_id", "score", "rank")
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

  /** Nearest-centroid auto-labeling + confusion matrix — the router /
    * weak-classifier shape for embedding corpora: per-label centroids
    * (one bounded-key aggregation), then a MAP-ONLY assignment pass
    * with the |labels|×dims centroid table riding along as literals —
    * no join, no explode, the corpus is scanned once per phase and the
    * output is the ≤ |labels|² confusion matrix.
    *
    * Exactness: components quantize to the `scale` integer grid
    * (float→double widening is exact, ×scale and floor are
    * correctly-rounded and identical on both engines); centroid means
    * are FLOOR-div quantized (pmod form, so both engines agree on
    * negative sums); every dot product is then long arithmetic,
    * |dot| ≤ dims·scale² — no overflow, no float comparison anywhere.
    * Ties (equal dots) break toward the smaller label, stated on both
    * engines.
    */
  def nearestCentroidConfusion(emb: DataFrame, vecCol: String,
                               labelCol: String,
                               scale: Long): DataFrame =
    nearestCentroidAssign(emb, Nil, vecCol, labelCol, scale)
      .groupBy("true_label", "assigned")
      .agg(count(lit(1)).as("n_vecs"))
      .orderBy("true_label", "assigned")

  /** The assignment half of [[nearestCentroidConfusion]]: returns
    * (`carryCols…`, true_label, vq, assigned) — quantized vector and
    * nearest-centroid cell per row, same bounded-collect + map-only
    * plan. Exposed so downstream cluster-local operators (SemDeDup
    * q185) can reuse the cells.
    */
  def nearestCentroidAssign(emb: DataFrame, carryCols: Seq[String],
                            vecCol: String, labelCol: String,
                            scale: Long): DataFrame = {
    val q = emb.select(carryCols.map(col) ++ Seq(
      col(labelCol).as("true_label"),
      transform(col(vecCol), v => floor(v.cast("double") * scale))
        .as("vq")): _*)
    val centRows = q
      .select(col("true_label").as("c"),
        posexplode(col("vq")).as(Seq("dim", "x")))
      .groupBy("c", "dim")
      .agg(sum("x").as("s"), count(lit(1)).as("n"))
      .select(col("c"), col("dim"),
        expr("(s - pmod(s, n)) div n").as("mq"))
      .collect()
    val cents = centRows.groupBy(_.getInt(0)).toSeq.sortBy(_._1)
      .map { case (lab, rows) =>
        val arr = new Array[Long](rows.map(_.getInt(1)).max + 1)
        rows.foreach(r => arr(r.getInt(1)) = r.getLong(2))
        (lab, arr)
      }
    val best = array_min(array(cents.map { case (lab, arr) =>
      struct(
        (-aggregate(zip_with(col("vq"), lit(arr), (x, y) => x * y),
          lit(0L), (acc, x) => acc + x)).as("negdot"),
        lit(lab).as("l"))
    }: _*)).getField("l")
    q.withColumn("assigned", best)
  }

  /** SemDeDup (Abbas et al., 2023): semantic near-dup pruning by
    * cluster-then-compare — embeddings are assigned to nearest-centroid
    * cells, pairwise similarity is computed ONLY within a cell, and all
    * but the lowest-id member of each similar pair are pruned. The
    * quadratic is confined to cells (at 100 TB you raise the cell
    * count so cells stay bounded — that IS the published algorithm);
    * nothing cross-cell ever joins. Similarity is the exact rational
    * test cos ≥ num/den ⟺ dot > 0 ∧ den²·dot² ≥ num²·‖a‖²‖b‖², carried
    * in DECIMAL(38,0) so no float enters the verdict.
    *
    * Returns one row per cell: members, qualifying pairs, pruned count.
    */
  def semDedupCellStats(emb: DataFrame, idCol: String, vecCol: String,
                        labelCol: String, scale: Long,
                        cosNum: Int, cosDen: Int): DataFrame = {
    // One materialization (q106's lesson): assignment + norms feed the
    // pair join twice and the member counts once — localCheckpoint so
    // the corpus is quantized/assigned exactly once, not three times.
    val withNorm = nearestCentroidAssign(emb, Seq(idCol), vecCol,
      labelCol, scale)
      .select(col(idCol).as("id"), col("vq"), col("assigned").as("cell"))
      .withColumn("nn",
        aggregate(zip_with(col("vq"), col("vq"), (x, y) => x * y),
          lit(0L), (acc, x) => acc + x))
      .localCheckpoint()
    val a = withNorm.select(col("cell"), col("id").as("ia"),
      col("vq").as("va"), col("nn").as("na"))
    val b = withNorm.select(col("cell"), col("id").as("ib"),
      col("vq").as("vb"), col("nn").as("nb"))
    val dec = "decimal(38,0)"
    val pairs = a.join(b, Seq("cell")).filter(col("ia") < col("ib"))
      .withColumn("dot",
        aggregate(zip_with(col("va"), col("vb"), (x, y) => x * y),
          lit(0L), (acc, x) => acc + x))
      .filter(col("dot") > 0 &&
        lit(cosDen.toLong * cosDen).cast(dec) *
          col("dot").cast(dec) * col("dot").cast(dec) >=
        lit(cosNum.toLong * cosNum).cast(dec) *
          col("na").cast(dec) * col("nb").cast(dec))
      .select(col("cell"), col("ia"), col("ib"))
    val members = withNorm.groupBy("cell")
      .agg(count(lit(1)).as("n_members"))
    val pairStats = pairs.groupBy("cell")
      .agg(count(lit(1)).as("n_pairs"),
        countDistinct("ib").as("n_pruned"))
    members.join(pairStats, Seq("cell"), "left")
      .select(col("cell"), col("n_members"),
        coalesce(col("n_pairs"), lit(0L)).as("n_pairs"),
        coalesce(col("n_pruned"), lit(0L)).as("n_pruned"))
      .orderBy("cell")
  }

  /** Maximal-marginal-relevance diversified top-k (Carbonell &
    * Goldstein, SIGIR'98) with λ = ½: greedily pick the candidate
    * maximizing relevance − max-similarity-to-already-picked.
    *
    * Scale split: the RELEVANCE pass is the corpus-scale part — a
    * map-only quantized dot against the broadcast probe vector, topped
    * by TakeOrderedAndProject (per-partition heaps, `cand` rows to the
    * driver, no full sort). The greedy re-ranking then runs on the
    * driver over the cand×cand dot matrix — O(cand²) longs, bounded by
    * construction, the same bounded-collect contract as the ANN
    * quantizers. All similarity arithmetic is exact long dots on the
    * `scale` quantization grid; ties break to the smaller id.
    */
  def mmrDiversifiedTopK(emb: DataFrame, idCol: String, vecCol: String,
                         probeId: Long, cand: Int, k: Int,
                         scale: Long): DataFrame = {
    require(cand >= k && k >= 1, s"mmr cand=$cand k=$k")
    val spark = emb.sparkSession
    val q = emb.select(col(idCol).as("id"),
      transform(col(vecCol), v => floor(v.cast("double") * scale))
        .as("vq"))
    val probe = q.filter(col("id") === probeId).limit(2).collect()
    require(probe.length == 1, s"probe id $probeId not unique/found")
    val pv = probe(0).getSeq[Long](1).toArray
    val dotProbe = aggregate(
      zip_with(col("vq"), lit(pv), (x, y) => x * y),
      lit(0L), (acc, x) => acc + x)
    val top = q.filter(col("id") =!= probeId)
      .select(col("id"), col("vq"), dotProbe.as("rel"))
      .orderBy(desc("rel"), col("id")).limit(cand)
      .collect()
      .map(r => (r.getLong(0), r.getSeq[Long](1).toArray, r.getLong(2)))
    def dotLL(a: Array[Long], b: Array[Long]): Long =
      a.indices.foldLeft(0L)((s, i) => s + a(i) * b(i))
    val picked = scala.collection.mutable.ArrayBuffer
      .empty[(Int, Long, Long, Option[Long], Long)]
    val pickedVecs = scala.collection.mutable.ArrayBuffer.empty[Array[Long]]
    val remaining = scala.collection.mutable.LinkedHashMap(
      top.map(t => t._1 -> t): _*)
    for (rank <- 1 to k) {
      val best = remaining.values.map { case (id, vq, rel) =>
        val pen =
          if (pickedVecs.isEmpty) None
          else Some(pickedVecs.map(dotLL(vq, _)).max)
        (id, rel, pen, rel - pen.getOrElse(0L))
      }.reduceLeft { (a, b) =>
        if (b._4 > a._4 || (b._4 == a._4 && b._1 < a._1)) b else a
      }
      picked += ((rank, best._1, best._2, best._3, best._4))
      pickedVecs += remaining(best._1)._2
      remaining.remove(best._1)
    }
    import spark.implicits._
    picked.toSeq
      .map(p => (p._1, p._2, p._3, p._4, p._5))
      .toDF("rank", "vec_id", "relevance", "penalty", "mmr_score")
  }
}
