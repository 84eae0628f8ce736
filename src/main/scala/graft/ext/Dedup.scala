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
  private def expandPairs(buckets: DataFrame): DataFrame =
    buckets.select(sort_array(col("ids")).as("ids"))
      .select(col("ids"), posexplode(col("ids")).as(Seq("i", "id_a")))
      .select(col("id_a"),
        explode(slice(col("ids"), col("i") + lit(2),
          size(col("ids")) - col("i") - lit(1))).as("id_b"))

  /** Name of the [[org.apache.spark.sql.Dataset.observe]] metric emitted
    * by the capped candidate generators: `buckets` usable buckets,
    * `oversized_dropped` buckets over the cap (0 unless the corpus has a
    * degenerate key). No silent caps: attach a `QueryExecutionListener`
    * or an `Observation` upstream to alert when `oversized_dropped > 0`.
    */
  val BucketMetrics = "graft_dedup_buckets"

  private def observeBuckets(buckets: DataFrame, cap: Int): DataFrame =
    buckets.observe(BucketMetrics,
      count(lit(1)).as("buckets"),
      sum(when(size(col("ids")) > cap, 1L).otherwise(0L))
        .as("oversized_dropped"))
      .filter(size(col("ids")) <= cap)

  /** MinHash+LSH candidate pairs: docs sharing ≥1 band key.
    *
    * Shape: explode(band_keys) → groupBy band key (collect ids) → stream
    * in-bucket pairs → distinct. One aggregation shuffle + one distinct
    * shuffle, and — unlike the naive exploded self-join — the expensive
    * signature computation runs exactly ONCE per document (a self-join
    * would re-evaluate the md5 pipeline on both plan branches). Buckets of
    * size 1 (the vast majority under any sane band config) are dropped
    * before pair expansion.
    *
    * Degenerate band keys (e.g. millions of empty/boilerplate docs hash
    * to one bucket at corpus scale) are bounded by `maxBucket`: oversized
    * buckets are DROPPED from candidate generation — near-dup recall on
    * such content should come from [[exactByContent]] upstream, which
    * handles identical docs in one shuffle — and the drop is observable
    * via the [[BucketMetrics]] metric, never silent. The collect_list row
    * for a dropped bucket is O(B) ids (a 50k-doc bucket is ~400 KB), well
    * under task memory; the quadratic pair stage it used to feed is what
    * the cap prevents.
    */
  def minhashCandidates(docs: DataFrame, idCol: String, textCol: String,
                        shingleK: Int = 5, numHashes: Int = 16,
                        rowsPerBand: Int = 4,
                        maxBucket: Int = 4096): DataFrame = {
    val sigs = minhashSignatures(docs, idCol, textCol, shingleK, numHashes,
      rowsPerBand)
    val buckets = sigs.select(col(idCol), explode(col("band_keys")).as("bk"))
      .groupBy("bk").agg(collect_list(col(idCol)).as("ids"))
      .filter(size(col("ids")) > 1)
    expandPairs(observeBuckets(buckets, maxBucket))
      .distinct()
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
    val edges = pairs.select(col(aCol).as("u"), col(bCol).as("v"))
      .unionByName(pairs.select(col(bCol).as("u"), col(aCol).as("v")))
      .distinct().cache()
    var labels = edges.select(col("u").as("id")).distinct()
      .withColumn("label", col("id")).cache()
    var changed = 1L
    while (changed > 0) {
      val nbrMin = edges
        .join(labels.select(col("id").as("v"), col("label").as("vlab")), "v")
        .groupBy(col("u").as("id")).agg(min(col("vlab")).as("nlab"))
      val updated = labels.join(nbrMin, Seq("id"), "left")
        .select(col("id"), col("label"),
          least(col("label"), coalesce(col("nlab"), col("label")))
            .as("newlab"))
        .cache()
      changed = updated.filter(col("newlab") =!= col("label")).count()
      val prev = labels
      labels = updated.select(col("id"), col("newlab").as("label")).cache()
      labels.count() // materialize before dropping the parent cache
      prev.unpersist(); updated.unpersist()
    }
    val out = labels.select(col("id"), col("label").as("cluster"))
      .localCheckpoint(eager = true) // sever lineage from the caches
    edges.unpersist(); labels.unpersist()
    out
  }

  /** Exact n-gram Jaccard similarity for all pairs sharing ≥1 shingle,
    * via an inverted index (explode distinct shingles → equi-join on
    * shingle → count shared per pair). Exact because J(a,b) > 0 implies a
    * shared shingle; no cross join anywhere. One shuffle on shingle hash +
    * one on the pair key.
    *
    * `maxPosting` bounds the quadratic pair stage on hot shingles
    * (stopword-ish n-grams at corpus scale): posting lists over the cap
    * are dropped from the index — their shared-count contribution is
    * lost, so results become a LOWER bound on Jaccard for pairs touching
    * a dropped shingle (the standard "stop shingle" trade). The drop is
    * observable via [[BucketMetrics]], never silent; the default cap is
    * far above any posting list in a corpus without degenerate
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
    val shared = expandPairs(observeBuckets(postings, maxPosting))
      .groupBy(col("id_a"), col("id_b"))
      .agg(count(lit(1)).as("shared"))
    shared
      .join(sizes.withColumnRenamed(idCol, "id_a")
        .withColumnRenamed("n", "n_a"), "id_a")
      .join(sizes.withColumnRenamed(idCol, "id_b")
        .withColumnRenamed("n", "n_b"), "id_b")
      .withColumn("jaccard",
        col("shared").cast("double") /
          (col("n_a") + col("n_b") - col("shared")).cast("double"))
      .filter(col("jaccard") >= minJaccard)
      .select("id_a", "id_b", "jaccard")
  }
}
