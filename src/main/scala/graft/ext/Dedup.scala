package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deduplication family for a training-data pipeline:
  * exact, MinHash+LSH, SimHash, exact n-gram Jaccard, embedding cosine.
  *
  * Scale shape (the part that matters at 100 TB):
  *  - signatures (minhash/simhash/fingerprints) are computed in a single
  *    map stage — per-row array expressions, no shuffle, no UDF;
  *  - candidate generation is an equi-join on band/bucket keys (one
  *    shuffle on a short key), never an O(n²) cross join;
  *  - verification (exact Jaccard) runs only on candidate pairs.
  */
object Dedup {

  /** Exact dedup on a content fingerprint, keeping the smallest id.
    * groupBy+min_by is one shuffle with map-side partial aggregation —
    * strictly better than window row_number for a keep-one policy.
    */
  def exactByContent(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs.withColumn("__fp", TextStats.contentFingerprint(col(textCol)))
      .groupBy(col("__fp"))
      .agg(min(col(idCol)).as(idCol), count(lit(1)).as("dup_count"))
      .drop("__fp")

  /** MinHash signatures + LSH band keys per document.
    * Signature computation is the native expression
    * [[graft.functions.NativeExprs.minHashSignature]] (one md5 per
    * shingle + affine permutations in a tight loop); the HOF pipeline
    * [[Shingles.minHashSignature]] is its bit-identical reference
    * implementation.
    */
  def minhashSignatures(docs: DataFrame, idCol: String, textCol: String,
                        shingleK: Int, numHashes: Int, rowsPerBand: Int): DataFrame = {
    val toks = TextStats.tokens(col(textCol))
    docs.select(col(idCol),
      graft.functions.NativeExprs.minHashSignature(toks, shingleK, numHashes)
        .as("signature"))
      .withColumn("band_keys",
        Shingles.bandKeys(col("signature"), numHashes, rowsPerBand))
  }

  /** Stream all (a, b) pairs with a < b out of each bucket's sorted id
    * array via two chained generators: posexplode picks the left element,
    * a second explode over the tail slice emits the rights one row at a
    * time. A bucket of size B still costs O(B²) output ROWS (inherent to
    * pair generation), but peak memory per task is O(B) — the id array —
    * because Generate streams rows through whole-stage codegen. Round 1
    * instead materialized all B²/2 pairs as ONE array value in ONE row
    * (`transform(transform(slice))`), which OOMs a task on a hot bucket
    * (50k-doc bucket ⇒ 1.25B structs in a single value).
    *
    * Input must carry `ids: array`; all other columns are dropped.
    */
  /** Size-gates the per-document build sides of the pair-size joins.
    *
    * A data-sized build can never broadcast at corpus scale — the r11
    * sf1.0 sweep OOMed when Catalyst's post-aggregation estimate
    * undersold one and it broadcast anyway — but an unconditional
    * `shuffle_hash` hint costs ~25% at small SF (q166/q198 regressed
    * 5.0→6.6 s when the hint replaced a legitimately tiny broadcast).
    * The gate sizes the decision on the RAW input's plan stats (parquet
    * scans report honest on-disk bytes; post-aggregation estimates are
    * the ones that lie) inflated by a decompressed-expansion factor —
    * the in-memory hash relation holds decompressed strings/token
    * arrays plus per-row overhead, observed ~8× the compressed scan.
    * Under the session broadcast threshold Catalyst keeps its cheap
    * broadcast plan; over it (or with broadcast disabled) the hint
    * pins the per-partition hash build that survived sf1.0.
    */
  private val BroadcastInflationFactor = 8L

  private def sizeGatedHint(build: DataFrame, raw: DataFrame): DataFrame = {
    val conf = raw.sparkSession.sessionState.conf
    val est = raw.queryExecution.optimizedPlan.stats.sizeInBytes *
      BroadcastInflationFactor
    val thr = conf.autoBroadcastJoinThreshold
    if (thr > 0 && est <= thr) build else build.hint("shuffle_hash")
  }

  private def expandPairs(buckets: DataFrame): DataFrame =
    buckets.select(sort_array(col("ids")).as("ids"))
      .select(col("ids"), posexplode(col("ids")).as(Seq("i", "id_a")))
      .select(col("id_a"),
        explode(slice(col("ids"), col("i") + lit(2),
          size(col("ids")) - col("i") - lit(1))).as("id_b"))

  /** Names of the [[org.apache.spark.sql.Dataset.observe]] metrics
    * emitted by the capped candidate generators — one name per operator,
    * because Spark requires observed-metric names to be unique per query
    * unless the CollectMetrics subtrees are identical, and a plan may
    * compose both generators (e.g. union minhash and n-gram candidate
    * sets). Fields: `buckets` = ALL multi-doc buckets seen, INCLUDING the
    * oversized ones that are then dropped; `oversized_dropped` = buckets
    * over the cap (0 unless the corpus has a degenerate key). No silent
    * caps: attach a `QueryExecutionListener` or an `Observation` upstream
    * to alert when `oversized_dropped > 0`.
    */
  val MinhashBucketMetrics = "graft_dedup_buckets_minhash"
  val NgramBucketMetrics = "graft_dedup_buckets_ngram"
  val ContainmentBucketMetrics = "graft_dedup_buckets_containment"

  /** [[org.apache.spark.sql.Dataset.observe]] metrics of
    * [[prefixFilterJaccardPairs]]'s candidate stage: `prefix_pairs` =
    * pairs surviving the prefix+size filters, `pruned_positional` = of
    * those, pairs the positional/suffix bounds removed before the
    * verify join, `pruned_suffix_only` = the subset only the
    * last-collision (suffix-side) bound caught.
    */
  val PpjoinCandidateMetrics = "graft_ppjoin_candidates"

  /** [[org.apache.spark.sql.Dataset.observe]] metrics of
    * [[prefixFilterJaccardPairs]]'s verify stage: `gate_pairs` = pairs
    * surviving the hashed-overlap gate (= exact output pairs plus
    * collision false positives), `hash_collision_drops` = gate
    * survivors the exact string confirm then rejected — expected 0; a
    * nonzero value is a live 60-bit-collision witness, not an error.
    */
  val PpjoinVerifyMetrics = "graft_ppjoin_verify"

  private def observeBuckets(buckets: DataFrame, arrCol: String, cap: Int,
                             metric: String): DataFrame =
    buckets.observe(metric,
      count(lit(1)).as("buckets"),
      sum(when(size(col(arrCol)) > cap, 1L).otherwise(0L))
        .as("oversized_dropped"))
      .filter(size(col(arrCol)) <= cap)

  /** MinHash+LSH candidate pairs: docs sharing ≥1 band key.
    *
    * Shape: posexplode(band_keys) → groupBy band key (collect docs) →
    * stream in-bucket pairs with a MINIMAL-BAND guard → project. ONE
    * aggregation shuffle and no pair-level shuffle at all: a pair that
    * collides in several bands is emitted only from its lowest shared
    * band (each doc carries xxhash64 fingerprints of its PREFIX bands —
    * compact longs, all the guard reads — into the bucket; the guard
    * checks that no earlier band also collides), so the output is
    * already distinct. The earlier `distinct()` formulation shuffled
    * every expanded pair row — O(ΣB²) rows, the dominant shuffle at
    * corpus scale once buckets approach the cap (4096²/2 ≈ 8.4 M pairs
    * per hot bucket). The guard costs O(numBands) comparisons per pair,
    * all plain codegen-able expressions. Unlike the naive exploded
    * self-join, the expensive signature computation still runs exactly
    * ONCE per document. Buckets of size 1 (the vast majority under any
    * sane band config) are dropped before pair expansion.
    *
    * Degenerate band keys (e.g. millions of empty/boilerplate docs hash
    * to one bucket at corpus scale) are bounded by `maxBucket`: oversized
    * buckets are DROPPED from candidate generation, observably via
    * [[MinhashBucketMetrics]], never silent. Recall notes: (a) byte-
    * identical docs in a dropped bucket are still collapsed by
    * [[exactByContent]] upstream, but genuinely NEAR (non-identical)
    * duplicates whose every shared band is oversized are lost from
    * candidates — if the metric fires, the recall-preserving fix is to
    * re-band the oversized content (more bands / narrower rows) or salt
    * the hot key and verify across salts; (b) under the minimal-band
    * guard, a pair whose LOWEST shared band sits in a dropped bucket is
    * suppressed even when a later shared band's bucket is small — such
    * pairs are near-identical to a >cap-sized cluster in signature
    * space, so they are part of exactly the degenerate content the cap
    * targets. The collect_list row for a dropped bucket is O(B) docs,
    * well under task memory; the quadratic pair stage it used to feed is
    * what the cap prevents.
    */
  def minhashCandidates(docs: DataFrame, idCol: String, textCol: String,
                        shingleK: Int = 5, numHashes: Int = 16,
                        rowsPerBand: Int = 4,
                        maxBucket: Int = 4096): DataFrame = {
    val numBands = numHashes / rowsPerBand
    val sigs = minhashSignatures(docs, idCol, textCol, shingleK, numHashes,
      rowsPerBand)
    // Each bucket member carries compact fingerprints of exactly the bands
    // the minimal-band guard reads: the row exploded for band i needs only
    // bands < i, as xxhash64 longs (8 bytes each), not the full md5-string
    // band_keys array (numBands × ~35-char strings — carrying that through
    // collect_list multiplied the aggregation-shuffle payload ~5× and made
    // every per-pair guard compare a string compare). A 64-bit fingerprint
    // collision falsely suppresses a pair with p ≈ numBands·2⁻⁶⁴ per pair —
    // negligible against LSH's own false-negative rate.
    val buckets = sigs
      .withColumn("bkh", transform(col("band_keys"), k => xxhash64(k)))
      .select(col(idCol), col("bkh"),
        posexplode(col("band_keys")).as(Seq("band", "bk")))
      .select(col(idCol), col("band"), col("bk"),
        slice(col("bkh"), lit(1), col("band")).as("pfx"))
      .groupBy("bk")
      .agg(first(col("band")).as("band"), // constant within a bucket: bk embeds the band index
        collect_list(struct(col(idCol).as("id"), col("pfx")))
          .as("docs"))
      .filter(size(col("docs")) > 1)
    val capped = observeBuckets(buckets, "docs", maxBucket,
      MinhashBucketMetrics)
    // Stream (a, b) with a.id < b.id out of each bucket (sort_array on
    // structs orders by the leading id field), same O(B) peak memory as
    // expandPairs.
    val expanded = capped
      .select(col("band"), sort_array(col("docs")).as("docs"))
      .select(col("band"), col("docs"),
        posexplode(col("docs")).as(Seq("i", "a")))
      .select(col("band"), col("a"),
        explode(slice(col("docs"), col("i") + lit(2),
          size(col("docs")) - col("i") - lit(1))).as("b"))
    // Emit only from the lowest shared band: a static when-chain over the
    // (small, plan-time-known) band count — no higher-order functions in
    // the per-pair hot path.
    val minimalBand = (1 until numBands).foldLeft(
      when(col("band") === 0, lit(true))) { (acc, bi) =>
      acc.when(col("band") === bi,
        (0 until bi).map(j =>
          element_at(col("a.pfx"), j + 1) =!= element_at(col("b.pfx"), j + 1))
          .reduce(_ && _))
    }.otherwise(lit(false))
    expanded.filter(minimalBand)
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"))
  }

  /** Incremental dedup: admit only the rows of a NEW batch that duplicate
    * nothing in the existing CORPUS — the shape of a continuously-growing
    * training set, where each crawl snapshot is deduped against everything
    * already ingested rather than re-clustering the whole corpus.
    *
    * Two gates, both equi-anti-joins on short keys (no pair expansion at
    * all, unlike [[minhashCandidates]] — membership tests, not pair
    * enumeration):
    *   1. EXACT: content fingerprint of the batch row appears in the
    *      corpus fingerprint set;
    *   2. NEAR: ANY of the row's MinHash LSH band keys appears in the
    *      corpus band-key set (a batch doc near-identical to an existing
    *      doc shares ≥1 band with high probability).
    *
    * At 100 TB the corpus-side key sets are precomputed artifacts (a
    * fingerprint table + a band-key table maintained incrementally as
    * batches are admitted); here they are derived inline. Both joins
    * shuffle on the key — each is one short-key exchange of the BATCH
    * (small) against a distinct-key set of the corpus; with the key
    * tables bucketed by key the exchange disappears entirely.
    */
  def incrementalNew(newBatch: DataFrame, corpus: DataFrame,
                     idCol: String, textCol: String,
                     shingleK: Int = 5, numHashes: Int = 16,
                     rowsPerBand: Int = 4): DataFrame = {
    val fp = TextStats.contentFingerprint(col(textCol))
    val corpusFps = corpus.select(fp.as("__fp")).distinct()
    val exactSurvivors = newBatch.withColumn("__fp", fp)
      .join(corpusFps, Seq("__fp"), "left_anti").drop("__fp")
    def bands(d: DataFrame): DataFrame =
      minhashSignatures(d, idCol, textCol, shingleK, numHashes, rowsPerBand)
        .select(col(idCol), explode(col("band_keys")).as("bk"))
    val corpusBands = bands(corpus).select("bk").distinct()
    // a doc survives only if NONE of its bands collide: semi-join the
    // exploded batch bands to find colliding ids, then anti-join those
    val collided = bands(exactSurvivors).join(corpusBands, Seq("bk"))
      .select(idCol).distinct()
    exactSurvivors.join(collided, Seq(idCol), "left_anti")
  }

  /** Bloom-accelerated EXACT incremental dedup: admit only batch docs
    * whose content fingerprint is absent from the corpus, using a Bloom
    * filter of the corpus keys to keep almost all genuinely-new docs off
    * the anti-join shuffle entirely.
    *
    * Three stages, same answer as a plain fingerprint anti-join (Bloom
    * filters have NO false negatives, so correctness never depends on
    * `fpp`):
    *  1. ONE aggregation pass over the corpus builds the filter with
    *     Spark's own `BloomFilterAggregate` (the expression behind
    *     runtime row-level filtering): map-side partial filters, OR-merge
    *     at the reducer, one `numBits/8`-byte blob to the driver.
    *  2. Batch rows failing `BloomFilterMightContain` are DEFINITELY new
    *     — a map-only filter, no shuffle. At fpp=1% that is ~99% of the
    *     genuinely-new rows.
    *  3. Only the residual (true duplicates + fpp false positives)
    *     anti-joins the corpus fingerprint set — the shuffle input
    *     shrinks from |batch| to |dups| + fpp·|new|.
    *
    * Like [[RangeJoin]]'s width probe, step 1 is an EAGER action at
    * definition time (the filter bytes become a plan literal, shipped to
    * tasks with the task binary exactly like a broadcast value). At
    * 100 TB the corpus side is the precomputed fingerprint table, the
    * filter is built once per admission cycle, and `expectedItems` is
    * sized to the corpus key count — beyond the default conf caps
    * (4M items / 8 MiB), raise
    * `spark.sql.optimizer.runtime.bloomFilter.maxNumItems`/`maxNumBits`
    * (a 10⁹-key corpus at 1% is ~1.2 GiB, at which point shard the
    * filter by key range or accept a higher fpp — still exact output,
    * just a larger residual join).
    */
  def bloomNewDocs(newBatch: DataFrame, corpus: DataFrame,
                   textCol: String, expectedItems: Long = 1000000L,
                   fpp: Double = 0.01): DataFrame = {
    import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Literal}
    import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
    import org.apache.spark.sql.graftbridge.ColumnBridge
    import org.apache.spark.sql.types.BinaryType

    require(fpp > 0.0 && fpp < 1.0, s"fpp must be in (0,1): $fpp")
    val fp = TextStats.contentFingerprint(col(textCol))
    val key = xxhash64(fp) // BloomFilterAggregate/MightContain take int64
    // standard sizing: m = -n·ln(p)/ln(2)²
    val numBits = math.ceil(
      -expectedItems * math.log(fpp) / (math.log(2) * math.log(2))).toLong
    val bloomAgg = ColumnBridge.column(new BloomFilterAggregate(
      ColumnBridge.expression(key),
      Literal(expectedItems), Literal(numBits)).toAggregateExpression())
    val bytes = corpus.select(bloomAgg).head.getAs[Array[Byte]](0)
    if (bytes == null) return newBatch // empty corpus: everything is new
    val might = ColumnBridge.column(new BloomFilterMightContain(
      Literal(bytes, BinaryType), ColumnBridge.expression(key)))
    val definitelyNew = newBatch.filter(!might)
    val residualNew = newBatch.filter(might)
      .withColumn("__fp", fp)
      .join(corpus.select(fp.as("__fp")).distinct(), Seq("__fp"), "left_anti")
      .drop("__fp")
    definitelyNew.unionByName(residualNew)
  }

  /** SimHash fingerprint over token hashes, `bits` dimensions.
    * Each token votes per bit using one hex nibble of its portable hash
    * (nibble ≥ 8 → +1, else −1); fingerprint bit = sign of the vote sum.
    * Pure per-row expression (transform over bit positions + aggregate
    * over tokens).
    */
  def simhash(text: Column, bits: Int = 16): Column =
    graft.functions.NativeExprs.simhash(TextStats.tokens(text), bits)

  /** HOF reference implementation of [[simhash]] (bit-identical; kept for
    * the parity spec).
    */
  def simhashHof(text: Column, bits: Int = 16): Column = {
    val toks = TextStats.tokens(text)
    val hashes = transform(toks, t => Shingles.seededHash(t, 0))
    concat(
      (0 until bits).map { i =>
        val vote = aggregate(hashes, lit(0L), (acc, h) =>
          acc + when(substring(h, i + 1, 1)
            .isin("8", "9", "a", "b", "c", "d", "e", "f"), 1L).otherwise(-1L))
        when(vote > 0, lit("1")).otherwise(lit("0"))
      }: _*)
  }

  /** Connected components over a candidate-pair graph → cluster id per
    * document (min doc id in the component): the step that turns
    * near-dup PAIRS into dedup GROUPS (keep one representative per
    * cluster).
    *
    * Iterative min-label propagation: each round every node adopts the
    * smallest label among itself and its neighbors; the driver loops
    * until a round changes nothing (distributed work per round, one
    * scalar count at the driver — the standard Spark iterative-algorithm
    * shape). LSH components are shallow (diameter ≈ 2-3) so this
    * converges in a handful of rounds; for adversarially long chains
    * switch to alternating small-star/large-star for O(log n) rounds.
    */
  def dedupClusters(pairs: DataFrame, aCol: String = "id_a",
                    bCol: String = "id_b"): DataFrame = {
    // localCheckpoint per round, NOT cache: each round's plan references
    // the previous round's labels several times, so lineage carried
    // across rounds grows the analyzed plan exponentially — beyond ~6
    // rounds (graph diameter ~6) the DRIVER dies assembling plan
    // strings, long before any executor works hard. Checkpointing makes
    // every round's plan O(1). Edges are static across rounds: a plain
    // cache is right for them.
    val edges = pairs.select(col(aCol).as("u"), col(bCol).as("v"))
      .unionByName(pairs.select(col(bCol).as("u"), col(aCol).as("v")))
      .distinct().cache()
    var labels = edges.select(col("u").as("id")).distinct()
      .withColumn("label", col("id")).localCheckpoint(eager = true)
    var changed = 1L
    while (changed > 0) {
      val nbrMin = edges
        .join(labels.select(col("id").as("v"), col("label").as("vlab")), "v")
        .groupBy(col("u").as("id")).agg(min(col("vlab")).as("nlab"))
      val updated = labels.join(nbrMin, Seq("id"), "left")
        .select(col("id"), col("label"),
          least(col("label"), coalesce(col("nlab"), col("label")))
            .as("newlab"))
        .localCheckpoint(eager = true)
      changed = updated.filter(col("newlab") =!= col("label")).count()
      labels = updated.select(col("id"), col("newlab").as("label"))
    }
    val out = labels.select(col("id"), col("label").as("cluster"))
      .localCheckpoint(eager = true) // independent of the edges cache
    edges.unpersist()
    out
  }

  /** Components of a pair graph AND of a flagged SUBGRAPH in one joint
    * min-label convergence. The motivating consumer is threshold
    * robustness (q285): the ≥0.9 edges are a subset of the ≥½ edges,
    * so running [[dedupClusters]] twice pays two full convergences and
    * two label joins for partitions that can ride the SAME rounds —
    * here each round's neighbourhood fold emits two mins (all edges /
    * flagged edges only), and the loop stops when NEITHER label moves.
    * Rounds = max(diam_all, diam_flagged) instead of the sum, and the
    * caller gets both labelings pre-aligned on one row per node (no
    * second |docs| join to build a contingency).
    *
    * `cluster_hi` for a node with no flagged incident edge converges to
    * the node's own id (a singleton of the subgraph) — the same value
    * the caller's `coalesce(cluster, id)` would supply, so downstream
    * semantics are identical to two independent runs (locked by
    * DedupSpec against [[dedupClusters]] on both graphs).
    *
    * Scale shape: identical to [[dedupClusters]] — per-round
    * localCheckpoint keeps the plan O(1), edges cached once; the only
    * extra work per round is a second min in the same aggregation.
    */
  def dedupClustersDual(pairs: DataFrame, aCol: String = "id_a",
                        bCol: String = "id_b",
                        hiCol: String = "hi"): DataFrame = {
    val edges = pairs
      .select(col(aCol).as("u"), col(bCol).as("v"),
        col(hiCol).cast("int").as("hi"))
      .unionByName(pairs.select(col(bCol).as("u"), col(aCol).as("v"),
        col(hiCol).cast("int").as("hi")))
      .groupBy("u", "v").agg(max(col("hi")).as("hi"))
      .cache()
    var labels = edges.select(col("u").as("id")).distinct()
      .withColumn("la", col("id")).withColumn("lb", col("id"))
      .localCheckpoint(eager = true)
    var changed = 1L
    while (changed > 0) {
      val nbrMin = edges
        .join(labels.select(col("id").as("v"), col("la").as("vla"),
          col("lb").as("vlb")), "v")
        .groupBy(col("u").as("id"))
        .agg(min(col("vla")).as("nla"),
          min(when(col("hi") === 1, col("vlb"))).as("nlb"))
      val updated = labels.join(nbrMin, Seq("id"), "left")
        .select(col("id"), col("la"), col("lb"),
          least(col("la"), coalesce(col("nla"), col("la"))).as("ua"),
          least(col("lb"), coalesce(col("nlb"), col("lb"))).as("ub"))
        .localCheckpoint(eager = true)
      changed = updated
        .filter(col("ua") =!= col("la") || col("ub") =!= col("lb"))
        .count()
      labels = updated.select(col("id"), col("ua").as("la"),
        col("ub").as("lb"))
    }
    val out = labels.select(col("id"), col("la").as("cluster_all"),
        col("lb").as("cluster_hi"))
      .localCheckpoint(eager = true) // independent of the edges cache
    edges.unpersist()
    out
  }

  /** Connected components by alternating SMALL-STAR / LARGE-STAR
    * contraction (Kiveris et al., "Connected Components in MapReduce and
    * Beyond", SoCC'14) — O(log n) rounds on ANY graph, vs rounds ≈
    * diameter for [[dedupClusters]]' label propagation. Use this variant
    * when the pair graph may contain long chains (e.g. transitive
    * near-dup chains a…z where each hop is a pair but the ends are not);
    * for shallow LSH graphs (diameter 2-3) plain propagation does fewer
    * shuffles per round and wins.
    *
    * Round shape (both stars): one groupBy(u).min shuffle to find each
    * node's minimum neighbor, one equi-join to re-point edges, one
    * distinct. No collect_list anywhere — a hot node's neighborhood is
    * never materialized as one value, so degree skew cannot OOM a task
    * (AQE splits the skewed groupBy partitions instead).
    *
    * Invariant: edges are kept as (hi, lo) with hi > lo; self-loops drop.
    * Convergence: when large-star changes nothing, every node points
    * directly at its component minimum — the edge set IS the labeling.
    */
  def dedupClustersStar(pairs: DataFrame, aCol: String = "id_a",
                        bCol: String = "id_b"): DataFrame = {
    // canonical undirected edge set: (hi, lo), hi > lo, distinct
    def canon(e: DataFrame): DataFrame =
      e.filter(col("u") =!= col("v"))
        .select(greatest(col("u"), col("v")).as("u"),
          least(col("u"), col("v")).as("v"))
        .distinct()
    // both directions of each canonical edge
    def undirected(e: DataFrame): DataFrame =
      e.unionByName(e.select(col("v").as("u"), col("u").as("v")))

    /** large-star: for each node u, every strictly larger neighbor
      * re-points to m(u) = min(Γ(u)∪{u}) — exactly the paper's emission
      * set {(v, m(u)) : v ∈ Γ⁺(u)}, which provably preserves
      * connectivity and never increases the edge count.
      */
    def largeStar(e: DataFrame): DataFrame = {
      val und = undirected(e)
      val m = und.groupBy("u")
        .agg(least(min(col("v")), col("u")).as("m"))
      canon(und.filter(col("v") > col("u")).join(m, "u")
        .select(col("v").as("u"), col("m").as("v")))
    }

    /** small-star: orient each edge toward its larger end u; all of u's
      * smaller neighbors and u itself re-point to m(u) = min of them.
      * ONE join — both emissions ((v, m) and (u, m)) explode out of the
      * same joined row, so the edge set is not shuffled twice per round.
      */
    def smallStar(e: DataFrame): DataFrame = {
      // canonical (hi=u, lo=v) IS the small orientation: group by hi
      val m = e.groupBy("u").agg(min(col("v")).as("m"))
      canon(e.join(m, "u")
        .select(explode(array(
          struct(col("v").as("u"), col("m").as("v")), // smaller nbr → m
          struct(col("u"), col("m").as("v")))) // u itself → m
          .as("e"))
        .select(col("e.u"), col("e.v")))
    }

    // localCheckpoint per round severs lineage — one round references its
    // predecessor ~12× (und/m/join fan-out), so carrying logical plans
    // across rounds would grow the ANALYZED plan exponentially and hang
    // the driver around round 10 even with caching (the cache
    // short-circuits execution, not analysis).
    // Per-phase wall logging: the sf1.0 sweep measured q166/q198 at
    // 239/308 s vs ~6 s at sf0.1 (40-50x on 10x data) and the breakdown
    // between data-intrinsic pair growth and per-round contraction
    // overhead was unknowable from the total alone. A few stderr lines
    // per call make the round structure observable in any run.
    def logPhase(phase: String, t0: Long, extra: String = ""): Unit =
      System.err.println(f"[ccstar] $phase ${(System.nanoTime() - t0) / 1e9}%.2fs$extra")
    val tInit = System.nanoTime()
    var edges = canon(pairs.select(col(aCol).as("u"), col(bCol).as("v")))
      .localCheckpoint(eager = true)
    var edgeCount = edges.count()
    logPhase("init", tInit, s" edges=$edgeCount")
    var converged = edgeCount == 0L
    var round = 0
    while (!converged) {
      round += 1
      val tRound = System.nanoTime()
      // r16 note: fusing the two stars into one checkpoint per round was
      // MEASURED A LOSS (q166 3.5→4.0 s, q45 2.8→3.4 s at sf0.1):
      // small-star references large-star's output twice (argmin groupBy
      // + re-point join), and without the materialization the large-star
      // subplan executes twice — the checkpoint is cheaper than the
      // recomputation. Kept as-is deliberately.
      val ls = largeStar(edges).localCheckpoint(eager = true)
      val next = smallStar(ls).localCheckpoint(eager = true)
      val nextCount = next.count()
      // exact set-equality convergence: same size and no new edges
      converged = nextCount == edgeCount &&
        next.join(edges, Seq("u", "v"), "left_anti").isEmpty
      edges = next
      edgeCount = nextCount
      logPhase(s"round $round", tRound,
        s" edges=$edgeCount converged=$converged")
    }
    // star graph: every non-root points straight at its component min
    edges.select(col("u").as("id"), col("v").as("cluster"))
      .unionByName(edges.select(col("v").as("id"), col("v").as("cluster"))
        .distinct())
      .distinct()
  }

  /** Exact n-gram Jaccard similarity for all pairs sharing ≥1 shingle,
    * via an inverted index (explode distinct shingles → equi-join on
    * shingle → count shared per pair). Exact because J(a,b) > 0 implies a
    * shared shingle; no cross join anywhere. One shuffle on shingle hash +
    * one on the pair key.
    *
    * TEST-ONLY CROSS-CHECK since r16: no production query executes this
    * plan. Its candidate volume is Σ over shingles of |posting|² — at
    * sf3 the hot-shingle lists made it IO-bound and superlinear (7.5×
    * wall on 3× data, SWEEP_SF3.json) — so the exact-Jaccard contract
    * (q28/q313/q327) is served by [[prefixFilterJaccardPairs]], which
    * DedupSpec proves output-equivalent on boundary fixtures and the
    * corpus. This implementation stays as the independent witness of
    * that equivalence.
    *
    * `maxPosting` bounds the quadratic pair stage on hot shingles
    * (stopword-ish n-grams at corpus scale): posting lists over the cap
    * are dropped from the index — their shared-count contribution is
    * lost, so results become a LOWER bound on Jaccard for pairs touching
    * a dropped shingle (the standard "stop shingle" trade). The drop is
    * observable via [[NgramBucketMetrics]], never silent; the default cap
    * is far above any posting list in a corpus without degenerate
    * boilerplate, keeping the exact semantics there.
    */
  def ngramJaccardPairs(docs: DataFrame, idCol: String, textCol: String,
                        k: Int, minJaccard: Double,
                        maxPosting: Int = 8192): DataFrame = {
    val withSh = docs.select(col(idCol),
      graft.functions.NativeExprs
        .wordShingles(TextStats.tokens(col(textCol)), k, distinct = true)
        .as("sh"))
    val sizes = withSh.select(col(idCol), size(col("sh")).cast("long").as("n"))
    // Posting lists per shingle, pairs streamed in-bucket: shingles are
    // computed once per doc (a self-joined inverted index would evaluate
    // the shingling on both branches) and singleton postings — the long
    // tail of any corpus — are dropped before the pair stage.
    val inv = withSh.select(col(idCol), explode(col("sh")).as("shingle"))
    val postings = inv.groupBy("shingle")
      .agg(collect_list(col(idCol)).as("ids"))
      .filter(size(col("ids")) > 1)
    val shared = expandPairs(
      observeBuckets(postings, "ids", maxPosting, NgramBucketMetrics))
      .groupBy(col("id_a"), col("id_b"))
      .agg(count(lit(1)).as("shared"))
    // `sizes` is one row per DOCUMENT — data-sized, so at corpus scale
    // it must never be the build side of a broadcast (the planner's
    // post-aggregation estimate undersells it and the broadcast OOMed
    // at sf1.0). sizeGatedHint keeps Catalyst's cheap broadcast when
    // the raw input is provably tiny and otherwise pins shuffle_hash —
    // per-partition build, no sort of the far larger pairs side.
    shared
      .join(sizeGatedHint(sizes.withColumnRenamed(idCol, "id_a")
        .withColumnRenamed("n", "n_a"), docs), "id_a")
      .join(sizeGatedHint(sizes.withColumnRenamed(idCol, "id_b")
        .withColumnRenamed("n", "n_b"), docs), "id_b")
      .withColumn("jaccard",
        col("shared").cast("double") /
          (col("n_a") + col("n_b") - col("shared")).cast("double"))
      .filter(col("jaccard") >= minJaccard)
      .select("id_a", "id_b", "jaccard")
  }

  /** Containment near-dup pairs — the ASYMMETRIC complement of
    * [[ngramJaccardPairs]]: C(sub, sup) = |sub ∩ sup| / |sub| over
    * k-shingle sets, kept when ≥ `cNum/cDen`. Jaccard misses exactly the
    * case this catches: a short document wholly quoted inside a long one
    * (boilerplate, mirrored excerpts, prompt-template expansion) has
    * tiny Jaccard but containment ≈ 1 — the sub-document duplication a
    * training corpus needs scrubbed even when the documents are not
    * near-identical as wholes.
    *
    * Shape: the same inverted-index pipeline as [[ngramJaccardPairs]]
    * (one shingling pass, posting lists with the hot-shingle cap and
    * its observable-drop metric, pairs streamed in-bucket), then each
    * unordered pair is tested in BOTH directions against its own
    * integer gate `shared·cDen ≥ cNum·n_sub` — no extra shuffle for the
    * direction split, it is a projection of the shared-count table.
    */
  def containmentPairs(docs: DataFrame, idCol: String, textCol: String,
                       k: Int, cNum: Int, cDen: Int,
                       maxPosting: Int = 8192): DataFrame = {
    require(cNum >= 1 && cNum <= cDen, s"containment $cNum/$cDen")
    val withSh = docs.select(col(idCol),
      graft.functions.NativeExprs
        .wordShingles(TextStats.tokens(col(textCol)), k, distinct = true)
        .as("sh"))
    val sizes = withSh.select(col(idCol), size(col("sh")).cast("long").as("n"))
    val inv = withSh.select(col(idCol), explode(col("sh")).as("shingle"))
    val postings = inv.groupBy("shingle")
      .agg(collect_list(col(idCol)).as("ids"))
      .filter(size(col("ids")) > 1)
    val shared = expandPairs(
      observeBuckets(postings, "ids", maxPosting, ContainmentBucketMetrics))
      .groupBy(col("id_a"), col("id_b"))
      .agg(count(lit(1)).as("shared"))
    // per-doc `sizes` must not broadcast at scale (see
    // ngramJaccardPairs): size-gated shuffle_hash
    val sized = shared
      .join(sizeGatedHint(sizes.withColumnRenamed(idCol, "id_a")
        .withColumnRenamed("n", "n_a"), docs), "id_a")
      .join(sizeGatedHint(sizes.withColumnRenamed(idCol, "id_b")
        .withColumnRenamed("n", "n_b"), docs), "id_b")
    // both directions from ONE pass over the shared-count table: a
    // union of two projections would re-derive the whole inverted-index
    // pipeline per branch (observed: 2× scans/shuffles in the plan);
    // exploding a 2-element struct array is the same rows, one subtree
    sized.select(explode(array(
        struct(col("id_a").as("id_sub"), col("id_b").as("id_sup"),
          col("shared"), col("n_a").as("n_sub")),
        struct(col("id_b").as("id_sub"), col("id_a").as("id_sup"),
          col("shared"), col("n_b").as("n_sub")))).as("d"))
      .select(col("d.id_sub").as("id_sub"), col("d.id_sup").as("id_sup"),
        col("d.shared").as("shared"), col("d.n_sub").as("n_sub"))
      .filter(col("shared") * cDen >= lit(cNum) * col("n_sub"))
      .select(col("id_sub"), col("id_sup"), col("shared"),
        (col("shared").cast("double") / col("n_sub").cast("double"))
          .as("containment"))
  }

  /** Duplicated-span statistics — the exact-substring-dedup measurement
    * of "Deduplicating Training Data Makes Language Models Better" (Lee
    * et al. 2022): for each document, the fraction of its k-token spans
    * that also occur in ANOTHER document. Output per doc: `n_spans`,
    * `n_dup_spans`, `dup_frac`.
    *
    * Shape: explode spans → groupBy(span) countDistinct(doc) → join back
    * on span → per-doc fold. Two shuffles on the span key, both
    * partial-aggregated map-side; never all-pairs — the span table is
    * the big side and stays distributed (no broadcast, no collect), so
    * the plan is the one you would run at 100 TB. Lee et al. build a
    * suffix array for arbitrary-length matches; fixed-k spans give the
    * same containment signal as a pure relational pipeline.
    */
  def duplicatedSpanStats(docs: DataFrame, idCol: String, textCol: String,
                          k: Int): DataFrame = {
    val spans = docs.select(col(idCol),
      explode(graft.functions.NativeExprs.wordShingles(
        TextStats.tokens(col(textCol)), k, distinct = false)).as("sh"))
    val ndocs = spans.groupBy("sh")
      .agg(countDistinct(idCol).as("ndocs"))
    spans.join(ndocs, "sh")
      .groupBy(idCol)
      .agg(count(lit(1)).as("n_spans"),
        sum(when(col("ndocs") > 1, 1L).otherwise(0L)).as("n_dup_spans"))
      .withColumn("dup_frac",
        col("n_dup_spans").cast("double") / col("n_spans").cast("double"))
  }

  /** Duplicate-span TOKEN COVERAGE (the Lee et al. dedup accounting
    * metric): the fraction of each document's token POSITIONS that lie
    * inside at least one k-token span occurring in ≥2 distinct
    * documents. [[duplicatedSpanStats]] counts duplicated spans; this
    * measures how much of the doc they actually blanket — overlapping
    * spans must not double-count, so the duplicated spans' intervals
    * `[pos, pos+k-1]` are UNIONed per doc with the classic sweep: sort
    * by start, running max of prior ends, each interval contributes
    * `max(0, end − max(prev_max, start−1))`. Output per doc: `n_tokens`,
    * `covered_tokens`, `coverage_frac`.
    *
    * Shape: q103's two span-key shuffles plus ONE window partitioned by
    * doc id (frame bounded by doc length, never global) and a final
    * doc-keyed left join for the zero-coverage docs. Pure integer
    * arithmetic until the single reported division. Docs shorter than k
    * tokens are one whole-doc span (`[[Shingles.wordShingles]]`
    * convention), so exact short-doc duplicates reach coverage 1.0.
    */
  def duplicateSpanCoverage(docs: DataFrame, idCol: String,
                            textCol: String, k: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val tk = docs.select(col(idCol), TextStats.tokens(col(textCol)).as("tk"))
    val spans = tk
      .select(col(idCol), explode(
        when(size(col("tk")) <= k,
          array(struct(lit(0).as("pos"),
            (size(col("tk")) - 1).as("endp"),
            array_join(col("tk"), " ").as("sh"))))
          .otherwise(transform(
            sequence(lit(0), size(col("tk")) - k),
            p => struct(p.as("pos"), (p + k - 1).as("endp"),
              array_join(slice(col("tk"), p + 1, lit(k)), " ")
                .as("sh"))))).as("sp"))
      .select(col(idCol), col("sp.pos").as("pos"),
        col("sp.endp").as("endp"), col("sp.sh").as("sh"))
    val dupSh = spans.groupBy("sh")
      .agg(countDistinct(idCol).as("ndocs"))
      .filter(col("ndocs") > 1)
      .select("sh")
    val w = Window.partitionBy(idCol).orderBy("pos")
      .rowsBetween(Window.unboundedPreceding, -1)
    val per = spans.join(dupSh, "sh")
      .withColumn("prevmax", max("endp").over(w))
      .withColumn("contrib",
        greatest(col("endp") -
          greatest(coalesce(col("prevmax"), lit(-1)), col("pos") - 1),
          lit(0)))
      .groupBy(idCol).agg(sum("contrib").as("covered"))
    tk.select(col(idCol), size(col("tk")).cast("long").as("n_tokens"))
      .join(per, Seq(idCol), "left")
      .select(col(idCol), col("n_tokens"),
        coalesce(col("covered"), lit(0L)).cast("long")
          .as("covered_tokens"))
      .withColumn("coverage_frac",
        col("covered_tokens").cast("double") /
          col("n_tokens").cast("double"))
  }

  /** Blocked fuzzy self-join (entity resolution / near-match pairs):
    * candidate pairs only WITHIN equal `blockCols` blocks, scored by
    * Levenshtein edit distance over a fixed `prefixLen`-char prefix,
    * kept when ≤ `maxDist`. Output: `doc_a`, `doc_b` (ids, a < b),
    * `dist`.
    *
    * Blocking is the classic step that turns an O(n²) fuzzy join into
    * per-block quadratic work bounded by the largest block: the block
    * key becomes the shuffle key and no executor ever sees the cross
    * product. The prefix cap bounds the DP cost per comparison
    * (len²·pairs is the real budget at scale, not the shuffle) — which
    * is exactly why the probe side is explicitly repartitioned on the
    * block key with the session's shuffle width: the DP cost per row is
    * orders of magnitude above the scan cost, so task granularity must
    * follow BLOCKS, not file splits (a compact parquet input can arrive
    * as one split and serialize the entire quadratic verify on one
    * task; at sf0.1 that was a 4× wall-time difference). The width is
    * pinned rather than left to AQE, because AQE sizes partitions by
    * bytes and would coalesce the small projection right back.
    *
    * Run [[fuzzyBlockAudit]] first when block skew is a risk: the
    * largest block bounds the slowest task.
    */
  def fuzzyBlockedPairs(docs: DataFrame, idCol: String,
                        blockCols: Seq[String], textCol: String,
                        prefixLen: Int, maxDist: Int): DataFrame = {
    require(blockCols.nonEmpty,
      "fuzzyBlockedPairs without block columns is the all-pairs cross " +
        "product — refuse loudly rather than run it by accident")
    val width = docs.sparkSession.conf
      .get("spark.sql.shuffle.partitions").toInt
    // Per-ROW length, computed once before the quadratic join: the
    // |len_a − len_b| ≤ maxDist lower bound (an insertion/deletion per
    // missing character is unavoidable) then rides the join condition,
    // so out-of-band candidates are dropped by an integer compare
    // before any DP runs — pairs are quadratic in the block, lengths
    // are linear in it.
    val d = docs.select((col(idCol) +: blockCols.map(col)) ++ Seq(
      substring(col(textCol), 1, prefixLen).as("pfx"),
      length(substring(col(textCol), 1, prefixLen)).as("plen")): _*)
      .repartition(width, blockCols.map(col): _*)
    val cond = blockCols
      .map(c => col(s"a.$c") === col(s"b.$c"))
      .reduce(_ && _) && (col(s"a.$idCol") < col(s"b.$idCol")) &&
      (abs(col("a.plen") - col("b.plen")) <= maxDist)
    // Verify with the bit-parallel bounded Levenshtein (exact for every
    // kept row — see BoundedLevenshteinExpr): one word of bit-ops per
    // character instead of the built-in's O(len²) DP matrix.
    d.as("a").join(d.as("b"), cond)
      .select(col(s"a.$idCol").as("doc_a"), col(s"b.$idCol").as("doc_b"),
        graft.functions.NativeExprs.boundedLevenshtein(
          col("a.pfx"), col("b.pfx"), maxDist).as("dist"))
      .filter(col("dist") <= maxDist)
  }

  /** Block-size audit for [[fuzzyBlockedPairs]], largest blocks first:
    * per-block row count and the implied candidate-pair count
    * n·(n−1)/2. The largest block bounds the slowest task of the
    * quadratic verify, so at scale this is the pre-flight check — a
    * degenerate block key (one (source, lang) holding half the corpus)
    * shows up here as one row, not as a straggler an hour into the run.
    */
  def fuzzyBlockAudit(docs: DataFrame, blockCols: Seq[String]): DataFrame =
    docs.groupBy(blockCols.map(col): _*)
      .agg(count(lit(1)).as("n"))
      .withColumn("n_pairs", expr("n * (n - 1) div 2"))
      .orderBy(desc("n_pairs"),
        blockCols.map(col).head)

  /** Prefix-filtered exact set-similarity join (the PPJoin-family
    * candidate strategy of Bayardo et al., "Scaling Up All Pairs
    * Similarity Search", WWW'07): all document pairs whose k-shingle-set
    * Jaccard is ≥ `tNum/tDen` — the SAME contract as
    * [[ngramJaccardPairs]], under a plan that generates candidates only
    * where the documents' RARE-SHINGLE PREFIXES intersect, not where any
    * shingle matches.
    *
    * Each doc's distinct shingles are ranked by global document
    * frequency ascending (ties by shingle); a doc of size n keeps only
    * its first `n − ceil(t·n) + 1` shingles as join keys. Pigeonhole: a
    * pair with Jaccard ≥ t has overlap ≥ ceil(t·n) on each side, and the
    * smallest shared shingle (in the global order) provably lands inside
    * BOTH prefixes — so the equi-join on prefix shingles loses nothing,
    * while joining on frequent shingles (the hot key at scale: every doc
    * shares the corpus's most common n-gram) never happens. A rational
    * threshold keeps every overlap / prefix / keep computation in
    * integer arithmetic: the in-prefix test is `tNum·n ≤ tDen·(n−rk+1)`,
    * keep iff `shared·tDen ≥ tNum·(na + nb − shared)`.
    *
    * Shape at 100 TB: df aggregation + rank window + prefix self-join +
    * verify join — every stage keyed on shingle or doc id, no all-pairs,
    * and the size filter `t·na ≤ nb ∧ t·nb ≤ na` prunes candidates
    * before verification.
    *
    * The shingle table feeds two consumers (document frequencies and
    * the per-doc aggregate), and the per-doc aggregate — ONE row per
    * doc carrying its size, rare-shingle prefix, full sorted shingle
    * array, AND the sorted 60-bit hash array the verify gate ships —
    * feeds both sides of the candidate self-join, both verify stages,
    * and the size filters; each is materialized once
    * (`localCheckpoint`) instead of re-tokenizing the corpus per
    * consumer. At cluster scale the equivalent move is a staged write
    * of the per-doc table; the plan shape (one tokenize pass, then
    * joins over the materialized table) is the same.
    */
  def prefixFilterJaccardPairs(docs: DataFrame, idCol: String,
                               textCol: String, shingleK: Int, tNum: Int,
                               tDen: Int): DataFrame = {
    require(tNum >= 1 && tNum <= tDen,
      s"threshold $tNum/$tDen outside (0, 1]")
    import org.apache.spark.sql.expressions.Window
    // Tokenize-and-shingle is CPU-bound, so its parallelism must not be
    // capped by file splits (a compact single-row-group parquet arrives
    // as one split and would serialize the pass on one task — q105's
    // lesson). Widen only when the source is narrower than the session's
    // shuffle width; at real scale the splits already exceed it.
    val width = docs.sparkSession.conf
      .get("spark.sql.shuffle.partitions").toInt
    val src = if (docs.rdd.getNumPartitions < width)
      docs.repartition(width) else docs
    val sh = src
      .select(col(idCol),
        explode(graft.functions.NativeExprs.wordShingles(
          TextStats.tokens(col(textCol)), shingleK, distinct = true))
          .as("tok"))
      .localCheckpoint()
    val dfreq = sh.groupBy("tok").agg(count(lit(1)).as("df"))
    // Prefix of length n − ceil(t·n) + 1 in the global (df, tok) order,
    // derived by sorting each doc's shingle list IN the aggregation
    // (collect → sort_array → slice): a doc's distinct shingles are
    // bounded, so the per-group sort is tiny, and the row_number window
    // this replaces — plus its second full-table sort pass — disappears
    // (measured: ~1.6× on the stage at sf0.1). ONE aggregation yields
    // BOTH per-doc artifacts — the size n and the compact prefix ARRAY —
    // so the checkpoint is one |docs|-row table and the old separate
    // size aggregation over the full shingle table is gone (its two
    // final-join consumers now read a map-only projection of this
    // checkpoint). The exploded prefix rows are re-derived map-only per
    // consumer, which is cheaper than materializing them.
    // ceil(t·n) = (tNum·n + tDen − 1) div tDen — integers end to end.
    val docAgg = sh.join(dfreq, "tok")
      .groupBy(idCol)
      .agg(sort_array(collect_list(struct(col("df"), col("tok"))))
        .as("arr"))
      .select(col(idCol), size(col("arr")).cast("long").as("n"),
        slice(col("arr"), lit(1), expr(
          s"size(arr) - (($tNum * size(arr) + ${tDen - 1}) div $tDen) + 1"))
          .as("pfx"),
        col("arr"),
        // 8-byte verify payload: sorted 60-bit md5 prefixes of the
        // doc's distinct shingles (the hash-GATE side of the two-stage
        // verify below). Computed once here, in the same corpus pass.
        graft.functions.NativeExprs.md5Prefix60Sorted(col("arr.tok"))
          .as("h"))
      .localCheckpoint()
    val ranked = docAgg
      .select(col(idCol), col("n"), posexplode(col("pfx")).as(Seq("pos", "e")))
      .select(col(idCol), col("e.tok").as("tok"), col("n"),
        (col("pos") + 1).cast("int").as("rk"))
    // PPJoin's POSITIONAL + PPJoin+-style SUFFIX-side filter on top of
    // the prefix filter. Key fact: a doc's positions follow the global
    // (df, tok) order, so every shared token smaller than a
    // both-prefix-shared token is itself both-prefix-shared — the M
    // prefix collisions of a pair are exactly its M smallest shared
    // tokens. Two lossless overlap bounds follow, applied per pair
    // AFTER aggregating its collisions (the aggregation replaces the
    // old per-collision filter + distinct at the same shuffle cost):
    //  • first collision (rka_min, rkb_min): no shared token precedes
    //    it, so overlap ≤ 1 + min(n_a − rka_min, n_b − rkb_min) — the
    //    classic positional filter;
    //  • last collision (rka_max, rkb_max): every shared token beyond
    //    the M prefix collisions lies after BOTH its positions, so
    //    overlap ≤ M + min(n_a − rka_max, n_b − rkb_max) — the
    //    suffix-side tightening (the relational form of PPJoin+'s
    //    suffix bound), which prunes pairs whose single shared-prefix
    //    evidence sits deep in both docs.
    // J ≥ t ⇔ overlap·(tDen+tNum) ≥ tNum·(n_a+n_b), all integer.
    val cand = ranked.as("a").join(ranked.as("b"),
        col("a.tok") === col("b.tok") &&
          col(s"a.$idCol") < col(s"b.$idCol") &&
          // size filter: J ≥ t ⇒ min(na,nb) ≥ t·max(na,nb)
          lit(tNum) * col("a.n") <= lit(tDen) * col("b.n") &&
          lit(tNum) * col("b.n") <= lit(tDen) * col("a.n"))
      .groupBy(col(s"a.$idCol").as("id_a"), col(s"b.$idCol").as("id_b"))
      .agg(count(lit(1)).as("m"),
        first(col("a.n")).as("na"), first(col("b.n")).as("nb"),
        min(col("a.rk")).as("rka_min"), min(col("b.rk")).as("rkb_min"),
        max(col("a.rk")).as("rka_max"), max(col("b.rk")).as("rkb_max"))
      .withColumn("ok_first",
        (least(col("na") - col("rka_min"), col("nb") - col("rkb_min")) +
          lit(1)) * lit(tDen + tNum) >=
          lit(tNum) * (col("na") + col("nb")))
      .withColumn("ok_last",
        (least(col("na") - col("rka_max"), col("nb") - col("rkb_max")) +
          col("m")) * lit(tDen + tNum) >=
          lit(tNum) * (col("na") + col("nb")))
      // no silent pruning: the verify-set reduction is observable
      .observe(PpjoinCandidateMetrics,
        count(lit(1)).as("prefix_pairs"),
        sum(when(!col("ok_first") || !col("ok_last"), 1L).otherwise(0L))
          .as("pruned_positional"),
        sum(when(col("ok_first") && !col("ok_last"), 1L).otherwise(0L))
          .as("pruned_suffix_only"))
      .filter(col("ok_first") && col("ok_last"))
      .select(col("id_a"), col("id_b"))
    // Two-stage verify, EXACT end-to-end over the string universe:
    //
    //  1. hash GATE — the candidate joins attach each side's sorted
    //     60-bit hash array (8 bytes/shingle) instead of the full
    //     (df, shingle-string) structs, and a multiset linear merge
    //     (SortedLongIntersectCountExpr) counts the hashed overlap.
    //     The hashed count is an UPPER bound of the exact string
    //     intersection (the hash is a function: each shared string
    //     contributes a matchable hash pair, collisions only add), so
    //     filtering on it NEVER drops a true pair. This payload change
    //     is the sf3 fix: the old verify shipped both docs' full sorted
    //     shingle-STRING arrays per candidate — ~an order of magnitude
    //     more exchange bytes, which exceeded the host's spill budget
    //     at sf3 under both codecs (SCALE.md r15).
    //  2. exact CONFIRM — gate survivors are OUTPUT-sized (true pairs
    //     plus astronomically-rare collision false positives), so the
    //     survivor list BROADCASTS: each pair explodes into its two
    //     (doc, side) rows, ONE map-side broadcast join re-attaches the
    //     exact (df, tok) struct arrays from the checkpoint without the
    //     corpus ever crossing an exchange, a survivor-sized pair-key
    //     aggregation reunites the two sides, and
    //     SortedIntersectCountExpr recounts the true overlap — most
    //     comparisons resolve on the df long, strings only on ties.
    //     The keep filter and the reported jaccard are computed from
    //     the EXACT count, so a collision can only cost a wasted
    //     confirm, never a wrong row; the observe metric below counts
    //     such drops (expected 0 — a nonzero value is a live collision
    //     witness, ~n²/2⁶¹). The single-broadcast shape also means the
    //     gate pipeline has exactly ONE consumer — no checkpoint, so
    //     the candidate observe above stays on this query's execution.
    //
    // Per-doc arrays are bounded by document length, so the widest row
    // is a document, not a corpus property; the only exchanges are the
    // hash-payload candidate joins and the survivor-sized confirm
    // aggregation.
    val gated = cand
      .join(docAgg.select(col(idCol).as("id_a"), col("h").as("ha"),
        col("n").as("na")), "id_a")
      .join(docAgg.select(col(idCol).as("id_b"), col("h").as("hb"),
        col("n").as("nb")), "id_b")
      .select(col("id_a"), col("id_b"),
        graft.functions.NativeExprs.sortedLongIntersectCount(
          col("ha"), col("hb")).as("shared_h"),
        col("na"), col("nb"))
      // single-reference form of shared·tDen ≥ tNum·(na+nb−shared):
      // Catalyst inlines this filter into the hash join's condition,
      // and there the merge expression would be evaluated once per
      // OCCURRENCE — the (tDen+tNum) rearrangement references shared_h
      // exactly once, so the gate costs one merge per candidate
      .filter(col("shared_h") * (tDen + tNum) >=
        lit(tNum) * (col("na") + col("nb")))
      .select("id_a", "id_b", "na", "nb")
    val sides = gated.select(explode(array(
        struct(col("id_a").as("id"), lit(true).as("is_a"),
          col("id_a"), col("id_b"), col("na"), col("nb")),
        struct(col("id_b").as("id"), lit(false).as("is_a"),
          col("id_a"), col("id_b"), col("na"), col("nb")))).as("e"))
      .select(col("e.id").as("id"), col("e.is_a").as("is_a"),
        col("e.id_a").as("id_a"), col("e.id_b").as("id_b"),
        col("e.na").as("na"), col("e.nb").as("nb"))
    docAgg.select(col(idCol).as("id"), col("arr"))
      .join(broadcast(sides), Seq("id"))
      .groupBy("id_a", "id_b", "na", "nb")
      .agg(first(when(col("is_a"), col("arr")), ignoreNulls = true)
          .as("ta"),
        first(when(!col("is_a"), col("arr")), ignoreNulls = true)
          .as("tb"))
      .select(col("id_a"), col("id_b"),
        graft.functions.NativeExprs.sortedIntersectCount(
          col("ta"), col("tb")).as("shared"),
        col("na"), col("nb"))
      .observe(PpjoinVerifyMetrics,
        count(lit(1)).as("gate_pairs"),
        sum(when(col("shared") * tDen <
          lit(tNum) * (col("na") + col("nb") - col("shared")), 1L)
          .otherwise(0L)).as("hash_collision_drops"))
      .filter(col("shared") * tDen >=
        lit(tNum) * (col("na") + col("nb") - col("shared")))
      .select(col("id_a"), col("id_b"),
        (col("shared").cast("double") /
          (col("na") + col("nb") - col("shared")).cast("double"))
          .as("jaccard"))
  }

  /** Benchmark decontamination score (q408): per EVAL document, how
    * much of its distinct k-shingle set appears anywhere in the TRAIN
    * split — the contamination fraction an LLM data pipeline thresholds
    * to DROP evaluation documents that leaked into training data. The
    * SET-level companion of q57's pairwise contamination
    * ([[Curation.contaminationPairs]]: which train/bench PAIRS overlap,
    * bench side broadcastable) and of q242's source-level leakage
    * matrix: here the train side is the whole corpus vocabulary, so no
    * pairing exists at any scale.
    * The split is the house deterministic gate
    * (baseHash(doc_id) % 5 == 0 ⇒ eval), so re-runs and both engines
    * agree on membership.
    *
    * Shape at 100 TB: one tokenize+shingle pass feeds both sides (one
    * materialization); the train side collapses to DISTINCT shingles
    * (map-side combine); the probe is a shingle-keyed LEFT join — no
    * doc×doc pairing anywhere, and at cluster scale the distinct train
    * set can additionally sit behind a Bloom gate exactly like q63/q70's
    * admission joins.
    */
  def decontamination(docs: DataFrame, idCol: String, textCol: String,
                      k: Int): DataFrame = {
    val sh = docs.select(col(idCol),
        (Shingles.baseHash(col(idCol).cast("string")) % 5 === 0)
          .as("is_eval"),
        explode(graft.functions.NativeExprs.wordShingles(
          TextStats.tokens(col(textCol)), k, distinct = true))
          .as("shingle"))
      .localCheckpoint() // one shingle pass, two consumers
    val train = sh.filter(!col("is_eval")).select("shingle").distinct()
    sh.filter(col("is_eval"))
      .join(train.withColumn("hit", lit(1L)), Seq("shingle"), "left")
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_shingles"),
        sum(coalesce(col("hit"), lit(0L))).as("n_shared"))
      .select(col(idCol), col("n_shingles"), col("n_shared"),
        (col("n_shared").cast("double") / col("n_shingles").cast("double"))
          .as("contamination"))
      .orderBy(idCol)
  }

  /** Content-defined chunking (q409) — the FastCDC/rsync idea re-expressed
    * relationally: chunk boundaries come from the CONTENT (a rolling
    * hash over the last 4 tokens), not from fixed offsets, so an
    * insertion early in a document shifts only the chunk it lands in
    * and chunk-level dedup (q410) still matches everything downstream —
    * the property fixed-size blocks lack and the reason CDC is the
    * backbone of large-corpus sub-document dedup.
    *
    * Exact integer contract (identical on both engines): per token
    * position p (1-based), h(p) = bh(tok_p) + 2¹¹·bh(tok_{p−1}) +
    * 2²²·bh(tok_{p−2}) + 2³³·bh(tok_{p−3}) with bh = the 28-bit
    * md5-prefix base hash; a chunk ENDS at p iff p ≥ 4 (min chunk
    * length) and bits 22–27 of h are zero (`(h div 2²²) % 64 == 0`,
    * expected chunk ≈ 64 tokens — the selector bits mix three
    * neighboring tokens' hashes, so the cut is content-local but not
    * single-token). h < 2⁶² — no overflow, no modulus.
    *
    * Shape at 100 TB: one tokenize pass; the rolling hash and the
    * cut-prefix-sum are per-DOCUMENT windows (partition key = doc id —
    * never a global order); chunk assembly is one (doc, chunk)
    * aggregation. Output: (doc_id, chunk_idx, n_tokens, chunk_fp) with
    * chunk_fp = md5 of the chunk's space-joined tokens.
    */
  def cdcChunks(docs: DataFrame, idCol: String,
                textCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(idCol).orderBy("pos")
    val tk = docs.select(col(idCol),
        posexplode(TextStats.tokens(col(textCol))).as(Seq("pos0", "tok")))
      .select(col(idCol), (col("pos0") + 1).cast("long").as("pos"),
        col("tok"), Shingles.baseHash(col("tok")).as("h0"))
    val cut = tk
      .withColumn("h", col("h0") + lit(2048L) * lag("h0", 1).over(w) +
        lit(4194304L) * lag("h0", 2).over(w) +
        lit(8589934592L) * lag("h0", 3).over(w))
      .withColumn("cut", when(col("h").isNotNull &&
        expr("(h div 4194304) % 64") === 0L, 1L).otherwise(0L))
      .withColumn("chunk_idx", coalesce(
        sum("cut").over(w.rowsBetween(Window.unboundedPreceding, -1)),
        lit(0L)))
    cut.groupBy(col(idCol), col("chunk_idx"))
      .agg(count(lit(1)).as("n_tokens"),
        md5(concat_ws(" ", transform(
          sort_array(collect_list(struct(col("pos"), col("tok")))),
          e => e.getField("tok"))).cast("binary")).as("chunk_fp"))
      .orderBy(idCol, "chunk_idx")
  }

  /** Chunk-level dedup savings (q410): collapse [[cdcChunks]] output by
    * chunk fingerprint and report the one-row corpus summary — total vs
    * distinct chunks, total vs saved tokens (copies−1 of every
    * duplicated chunk), and the savings ratio. Identical chunk_fp ⟹
    * identical token content ⟹ identical n_tokens, so `min(n_tokens)`
    * per fingerprint is exact, not an approximation. Two aggregations
    * (chunk-keyed, then scalar) — nothing pairwise.
    */
  def cdcDedupSummary(chunks: DataFrame): DataFrame =
    chunks.groupBy("chunk_fp")
      .agg(count(lit(1)).as("cnt"), min("n_tokens").as("len"))
      .agg(sum("cnt").cast("long").as("total_chunks"),
        count(lit(1)).as("distinct_chunks"),
        sum(col("cnt") * col("len")).cast("long").as("total_tokens"),
        sum((col("cnt") - 1) * col("len")).cast("long").as("saved_tokens"))
      .select(col("total_chunks"), col("distinct_chunks"),
        col("total_tokens"), col("saved_tokens"),
        (col("saved_tokens").cast("double") /
          col("total_tokens").cast("double")).as("savings_ratio"))

  /** Sorted-neighborhood dedup (Hernández & Stolfo, SIGMOD '95): sort
    * the corpus on a content-derived key so near-identical rows land
    * adjacent, then compare each row only against its next `window`
    * neighbors — candidate volume is O(n·w), independent of how hot any
    * single token or shingle is. The classic complement to blocking
    * (q105) and prefix-filtering (q106): it needs no frequency
    * statistics at all, just a sort.
    *
    * Spark-native shape: a GLOBAL sort would serialize into one
    * partition under a `Window.orderBy`, so the sort key's leading
    * character doubles as the partition key — each block range-sorts
    * independently (one shuffle keyed by block, then a per-block
    * window). Pairs that straddle a block boundary are missed, which is
    * the textbook multi-pass SNM tradeoff (run again with a rotated key
    * to recover them); since the sort key's own prefix defines the
    * block, a boundary-straddling pair here differs in its FIRST
    * character and was never going to sort adjacent anyway.
    *
    * Neighbor generation is `lead(id, i)` over the per-block window —
    * one window pass, no self-join on rank arithmetic. Verification is
    * exact distinct-token Jaccard on the candidate pairs only.
    */
  def sortedNeighborhoodPairs(docs: DataFrame, idCol: String,
                              textCol: String, window: Int,
                              minJaccard: Double): DataFrame = {
    require(window >= 1, s"window $window must be >= 1")
    import org.apache.spark.sql.expressions.Window
    val base = docs.select(col(idCol).as("id"),
      array_distinct(TextStats.tokens(col(textCol))).as("toks"),
      TextStats.normalized(col(textCol)).as("sk"))
      .withColumn("blk", substring(col("sk"), 1, 1))
    val w = Window.partitionBy("blk").orderBy(col("sk"), col("id"))
    val pairs = base
      .withColumn("nbrs",
        array((1 to window).map(i => lead(col("id"), i).over(w)): _*))
      .select(col("id").as("src"), explode(col("nbrs")).as("dst"))
      .filter(col("dst").isNotNull)
      .select(least(col("src"), col("dst")).as("id_a"),
        greatest(col("src"), col("dst")).as("id_b"))
    val sz = base.select(col("id"), col("toks"))
    // toks are distinct, so |a ∪ b| = |a| + |b| − |a ∩ b| without a
    // second set operation.
    // `sz` carries a token ARRAY per document — data-sized and heavy;
    // never a broadcast build side at scale (same class as the
    // ngramJaccardPairs sizes join, which OOMed at sf1.0 when the
    // planner's estimate undersold it); size-gated on the raw input
    pairs
      .join(sizeGatedHint(
        sz.select(col("id").as("id_a"), col("toks").as("ta")), docs), "id_a")
      .join(sizeGatedHint(
        sz.select(col("id").as("id_b"), col("toks").as("tb")), docs), "id_b")
      .withColumn("shared", size(array_intersect(col("ta"), col("tb"))))
      .withColumn("jaccard", col("shared").cast("double") /
        (size(col("ta")) + size(col("tb")) - col("shared")).cast("double"))
      .filter(col("jaccard") >= minJaccard)
      .select("id_a", "id_b", "jaccard")
  }

  /** Winnowing fingerprints (Schleimer, Wilkerson & Aiken, "Winnowing:
    * Local Algorithms for Document Fingerprinting", SIGMOD 2003 — the
    * selection scheme MOSS popularized): hash every k-token shingle,
    * slide a window of `w` consecutive shingle hashes over the
    * document, and keep the window MINIMUM. This is STANDARD winnowing
    * with a rightmost-position tie-break — a deterministic stateless
    * rule; the paper's "robust winnowing" variant instead prefers
    * re-selecting the previously selected fingerprint on ties, which is
    * stateful across windows and not needed for the detection floor or
    * density bound below. Guarantee: any token run of length
    * ≥ w + k − 1 shared between two documents contributes at least one
    * IDENTICAL selected fingerprint to both, while expected density is
    * 2/(w+1) — a bounded-size sketch with a detection floor, which is
    * what separates winnowing from "min of everything" (q23's 1-hash
    * MinHash: no locality) and "every shingle" (q103's spans: no
    * compression).
    *
    * Mechanics kept integer-exact and window-friendly: the
    * (hash, position) argmin is ONE `min` over the encoded key
    * `h·2³¹ + (2³¹−1−pos)` — smallest hash first, rightmost position
    * on ties — on a ROWS window of the w following shingles; window
    * starts are `pos ≤ max(n−w, 0)` so sub-window documents still emit
    * exactly one fingerprint. Output: distinct (`doc_id`, `fp_pos`,
    * `fp_hash`), position-ordered.
    *
    * Shape at 100 TB: one tokenize pass, one per-document ROWS window
    * (shuffle keyed on doc id, frames never cross documents), one
    * distinct — no joins, no data-sized broadcast.
    */
  def winnowingFingerprints(docs: DataFrame, idCol: String,
                            textCol: String, k: Int, w: Int): DataFrame = {
    require(w >= 1, s"window $w")
    import org.apache.spark.sql.expressions.Window
    val enc = 2147483648L // 2^31: pos fits below, 28-bit hash above
    // tokenize+hash parallelism must not be capped by file splits
    // (the q105 lesson) — widen only when narrower than the session
    val width = docs.sparkSession.conf
      .get("spark.sql.shuffle.partitions").toInt
    val src = if (docs.rdd.getNumPartitions < width)
      docs.repartition(width) else docs
    val sh = src.select(col(idCol),
      posexplode(Shingles.wordShingles(TextStats.tokens(col(textCol)), k))
        .as(Seq("pos", "sh")))
      .withColumn("key",
        Shingles.baseHash(col("sh")) * enc + (lit(enc - 1) - col("pos")))
    val byDoc = Window.partitionBy(idCol)
    val frame = Window.partitionBy(idCol).orderBy("pos")
      .rowsBetween(Window.currentRow, w - 1)
    sh.withColumn("n", count(lit(1)).over(byDoc))
      .withColumn("wkey", min("key").over(frame))
      .filter(col("pos") <= greatest(col("n") - w, lit(0)))
      .select(col(idCol),
        (lit(enc - 1) - pmod(col("wkey"), lit(enc))).as("fp_pos"),
        expr(s"wkey div $enc").as("fp_hash"))
      .distinct()
      .orderBy(idCol, "fp_pos")
  }

  /** Near-duplicate CANDIDATES from winnowed fingerprints: document
    * pairs sharing ≥ `minShared` distinct selected fingerprints, with
    * the posting-list cap the other pair families carry — fingerprints
    * held by more than `dfCap` documents are boilerplate (the corpus's
    * hottest keys) and are excluded from candidate generation BY
    * CONTRACT, not as a lossy shortcut. Output: (`doc_a` < `doc_b`,
    * `n_shared`).
    *
    * Shape at 100 TB: [[winnowingFingerprints]]'s windows, one
    * document-frequency aggregation, a capped self-join keyed on
    * fingerprint (each posting list ≤ dfCap ⇒ candidate count is
    * output-linear, never all-pairs), one pair aggregation.
    */
  def winnowingCandidates(docs: DataFrame, idCol: String, textCol: String,
                          k: Int, w: Int, dfCap: Int,
                          minShared: Int): DataFrame = {
    val fp = winnowingFingerprints(docs, idCol, textCol, k, w)
      .select(col(idCol), col("fp_hash")).distinct()
      .localCheckpoint(eager = true) // one window pass feeds df + join
    // df table is fingerprint-count sized (corpus-scale) — a plain
    // shuffle join on fp_hash, never a broadcast build side
    val rare = fp.join(
      fp.groupBy("fp_hash").agg(count(lit(1)).as("df"))
        .filter(col("df") <= dfCap),
      "fp_hash")
    rare.select(col("fp_hash"), col(idCol).as("doc_a"))
      .join(rare.select(col("fp_hash"), col(idCol).as("doc_b")), "fp_hash")
      .filter(col("doc_a") < col("doc_b"))
      .groupBy("doc_a", "doc_b").agg(count(lit(1)).as("n_shared"))
      .filter(col("n_shared") >= minShared)
      .orderBy("doc_a", "doc_b")
  }
}
