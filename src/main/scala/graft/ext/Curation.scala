package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Corpus-curation operators for a training-data pipeline: benchmark
  * decontamination, sequence packing, and domain-mixture sampling.
  * All three are deterministic (hash-gated or order-driven, never RNG at
  * execution time), so a single-threaded SQL oracle reproduces them
  * exactly — the same design rule as the dedup/sketch family.
  */
object Curation {

  /** Benchmark decontamination, step 1: every (train doc, benchmark doc)
    * pair sharing at least one k-word shingle, with the shared-shingle
    * count. The standard pre-training hygiene step — training documents
    * that textually overlap an eval benchmark inflate its score and must
    * be dropped (or at least audited) before training.
    *
    * Scale shape: the BENCHMARK side is small by nature (eval suites are
    * thousands of documents, the corpus is billions), so its exploded
    * shingle index is broadcast — the corpus is shingled in its one map
    * stage and hash-joined locally, no shuffle of the corpus, no
    * inverted-index caps needed. Shingling is the native
    * [[graft.functions.NativeExprs.wordShingles]] expression.
    */
  def contaminationPairs(train: DataFrame, bench: DataFrame, idCol: String,
                         textCol: String, k: Int): DataFrame = {
    def shingled(df: DataFrame, out: String) =
      df.select(col(idCol).as(out),
        explode(graft.functions.NativeExprs.wordShingles(
          TextStats.tokens(col(textCol)), k, distinct = true)).as("shingle"))
    shingled(train, "train_id")
      .join(broadcast(shingled(bench, "bench_id")), "shingle")
      .groupBy("train_id", "bench_id")
      .agg(count(lit(1)).as("shared_shingles"))
  }

  /** Benchmark decontamination, step 2: the corpus minus every document
    * contaminated above a shared-shingle threshold (left anti join on the
    * pair set).
    */
  def decontaminate(train: DataFrame, bench: DataFrame, idCol: String,
                    textCol: String, k: Int,
                    minShared: Long = 1L): DataFrame =
    train.join(
      contaminationPairs(train, bench, idCol, textCol, k)
        .filter(col("shared_shingles") >= minShared)
        .select(col("train_id").as(idCol)).distinct(),
      Seq(idCol), "left_anti")

  /** In-order sequence packing by CUMULATIVE QUOTA: documents are taken
    * in `idCol` order within each `groupCol` partition, and a document
    * lands in pack `floor(priorTokenSum / budget)` — pack p spans the
    * quota interval [p·budget, (p+1)·budget). Precise semantics (NOT
    * first-fit greedy): a document whose tokens straddle a quota
    * boundary overflows its pack by < its own length, and a document
    * longer than `budget` consumes several quota slots, so pack ids may
    * skip and the pack after an oversized document starts underfull.
    * The trade is deliberate: quota packing is ONE window expression —
    * parallel, bit-exact in any engine (the q58 oracle reproduces it
    * verbatim) — while true first-fit greedy needs a sequential
    * running-reset scan that neither parallelizes nor SQL-expresses.
    * Waste is bounded by maxDocTokens/budget per boundary; size packs
    * ≳ 4× the p99 document length and the difference is noise.
    *
    * One shuffle on `groupCol`; at 100 TB `groupCol` should be a real
    * partition key (source, shard) so no window sees unbounded rows.
    */
  def packSequences(docs: DataFrame, idCol: String, tokenCol: String,
                    groupCol: String, budget: Int): DataFrame = {
    val prior = Window.partitionBy(groupCol).orderBy(col(idCol))
      .rowsBetween(Window.unboundedPreceding, -1)
    docs.withColumn("pack_id",
      floor(coalesce(sum(col(tokenCol)).over(prior), lit(0L)) / budget)
        .cast("long"))
  }

  /** Token-window chunking: sliding windows of `len` tokens every
    * `stride` tokens (stride < len ⇒ overlapping context windows, the
    * RAG / long-context-prep shape). Output per chunk: `chunk_id` (dense
    * per doc), `chunk_start` (1-based token offset), `chunk_text`,
    * `n_chunk_tokens`.
    *
    * Window starts are generated MAP-SIDE per row (`sequence` +
    * `explode`) — no join, no shuffle, embarrassingly parallel at any
    * corpus size; output is ~n/stride rows per doc. Docs with zero
    * tokens yield zero chunks (never a null/empty chunk row).
    */
  def chunkTokens(docs: DataFrame, idCol: String, textCol: String,
                  len: Int, stride: Int): DataFrame = {
    require(len >= 1, s"len $len")
    require(stride >= 1, s"stride $stride")
    docs
      .select(col(idCol), TextStats.tokens(col(textCol)).as("tok"))
      .withColumn("n", size(col("tok")))
      .filter(col("n") > 0)
      .select(col(idCol), col("tok"),
        explode(sequence(lit(1), col("n"), lit(stride))).as("chunk_start"))
      .select(col(idCol),
        ((col("chunk_start") - 1) / stride).cast("long").as("chunk_id"),
        col("chunk_start").cast("long").as("chunk_start"),
        array_join(slice(col("tok"), col("chunk_start"), lit(len)), " ")
          .as("chunk_text"),
        size(slice(col("tok"), col("chunk_start"), lit(len)))
          .cast("long").as("n_chunk_tokens"))
  }

  /** Per-domain corpus-share budget enforcement: within each `sourceCol`
    * group, keep the LONGEST documents while the running token total
    * stays within `capNum/capDen` of the group's token mass (greedy by
    * `n_tokens` desc, `idCol` asc). The deterministic budget-capping
    * twin of [[sampleMixture]]'s probabilistic mixer: mixture rebalancing
    * states "no domain exceeds X% of the training mix" as an exact
    * integer predicate `capDen·cum ≤ capNum·total` — no doubles, so the
    * survivor set is bit-determined on any engine.
    *
    * One window shuffle on `sourceCol`. At 100 TB a running sum over an
    * ordered window is a single pass per group; groups are domains
    * (thousands), not rows, so no window sees unbounded skew unless one
    * domain IS the corpus — which is exactly what the cap then cuts.
    */
  def shareCap(docs: DataFrame, idCol: String, sourceCol: String,
               textCol: String, capNum: Int, capDen: Int): DataFrame = {
    require(capNum >= 1 && capDen >= capNum,
      s"cap $capNum/$capDen outside (0, 1]")
    val wOrd = Window.partitionBy(sourceCol)
      .orderBy(col("n_tokens").desc, col(idCol))
    val wAll = Window.partitionBy(sourceCol)
    docs
      .select(col(idCol), col(sourceCol),
        TextStats.tokenCount(col(textCol)).as("n_tokens"))
      .withColumn("cum_tokens", sum("n_tokens").over(wOrd))
      .withColumn("tot_tokens", sum("n_tokens").over(wAll))
      .filter(col("cum_tokens") * capDen <= col("tot_tokens") * capNum)
      .select(col(idCol), col(sourceCol), col("n_tokens"),
        col("cum_tokens"))
  }

  // ── PII scrubbing ───────────────────────────────────────────────────
  // Patterns deliberately restricted to syntax valid AND equivalent in
  // both Java regex (Spark) and RE2 (DuckDB/Go tooling): character
  // classes, bounded repeats, ASCII \b. No lookaround — RE2 has none.

  /** Per-document n-gram REPETITION statistics — the Gopher-style quality
    * rules ("Scaling Language Models", Rae et al. 2021, §A1.1) that catch
    * boilerplate and degenerate generation: a high duplicate-n-gram
    * fraction or a single n-gram dominating the document flags it for
    * removal before training.
    *
    * Output per doc: total k-grams, distinct k-grams, the top k-gram's
    * count, `dup_frac` = (total − distinct) / total and `top_frac` =
    * top / total. Shape: explode k-grams → count per (doc, gram) → fold
    * per doc — two shuffles, both with map-side partial aggregation, both
    * keyed fine-grained (doc_id × gram, then doc_id), so the plan
    * scale-partitions trivially; no per-doc gram map is ever materialized
    * as one value (a 1 GB pathological doc becomes many small counter
    * rows, not one giant hash map).
    */
  def repetitionStats(docs: DataFrame, idCol: String, textCol: String,
                      k: Int): DataFrame = {
    val grams = docs.select(col(idCol),
      explode(Shingles.wordShingles(TextStats.tokens(col(textCol)), k))
        .as("__g"))
    val perGram = grams.groupBy(col(idCol), col("__g"))
      .agg(count(lit(1)).as("__c"))
    perGram.groupBy(col(idCol)).agg(
      sum(col("__c")).as("n_grams"),
      count(lit(1)).as("distinct_grams"),
      max(col("__c")).as("top_count"))
      .withColumn("dup_frac",
        (col("n_grams") - col("distinct_grams")).cast("double") /
          col("n_grams").cast("double"))
      .withColumn("top_frac",
        col("top_count").cast("double") / col("n_grams").cast("double"))
  }

  /** RFC-casual email addresses. */
  val EmailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"

  /** NANP-style phone numbers with -, . or space separators. */
  val PhoneRe = "\\b\\d{3}[-. ]\\d{3}[-. ]\\d{4}\\b"

  /** Dotted-quad IPv4 (syntactic — 999.0.0.1 matches; redaction wants
    * recall over precision).
    */
  val Ipv4Re = "\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b"

  /** Replace emails, phone numbers and IPv4 addresses with typed
    * placeholder tokens. Order matters: emails first (their local part
    * could otherwise be chewed up by later rules), then phones, then
    * IPs (which would also match the separator-digit runs of already-
    * redacted phones if run first — they are gone by then).
    * Map-only, codegen'd `regexp_replace` — no shuffle, no UDF.
    */
  def redactPii(text: Column): Column =
    regexp_replace(
      regexp_replace(
        regexp_replace(text, EmailRe, "[EMAIL]"),
        PhoneRe, "[PHONE]"),
      Ipv4Re, "[IP]")

  /** Per-kind PII match counts (audit columns for the redaction step). */
  def piiCounts(text: Column): Seq[Column] = Seq(
    size(regexp_extract_all(text, lit(EmailRe), lit(0))).as("n_emails"),
    size(regexp_extract_all(text, lit(PhoneRe), lit(0))).as("n_phones"),
    size(regexp_extract_all(text, lit(Ipv4Re), lit(0))).as("n_ips"))

  /** One run's stage-by-stage survivor counts — the audit trail every
    * curation pipeline must emit (silent row loss is the cardinal sin of
    * a training-data pipeline).
    */
  final case class CurationReport(
      input: Long, afterQuality: Long, afterExactDedup: Long,
      afterNearDedup: Long, afterDecontam: Long, afterMix: Long,
      packs: Long)

  /** The assembled corpus-curation pipeline — raw documents in,
    * training-ready packed corpus out:
    *
    * quality floor → PII redaction → exact dedup (content fingerprint,
    * keep min id) → near-dup clustering (MinHash LSH candidates →
    * connected components, keep cluster min) → benchmark decontamination
    * → domain-mixture sampling → sequence packing.
    *
    * Every stage is one of this module's / [[Dedup]]'s deterministic
    * operators, so the whole pipeline is reproducible end-to-end; the
    * returned [[CurationReport]] gives the per-stage survivor counts.
    * Each stage's scale shape is documented on its operator; the
    * composition adds nothing beyond their sum (no extra shuffles, no
    * driver materialization except the report counts themselves).
    */
  def curateCorpus(docs: DataFrame, bench: DataFrame, idCol: String,
                   textCol: String, groupCol: String,
                   minQuality: Double, stopwords: Seq[String],
                   shingleK: Int, rates: Map[String, Double],
                   defaultRate: Double, packBudget: Int)
      : (DataFrame, CurationReport) = {
    val input = docs.count()

    val quality = docs
      .filter(TextStats.qualityScore(col(textCol), stopwords) >= minQuality)
      .withColumn(textCol, redactPii(col(textCol)))
      .cache()
    val nQuality = quality.count()

    val exactReps = Dedup.exactByContent(quality, idCol, textCol)
      .select(col(idCol))
    val exact = quality.join(exactReps, Seq(idCol), "left_semi").cache()
    val nExact = exact.count()

    val clusters = Dedup.dedupClusters(
      Dedup.minhashCandidates(exact, idCol, textCol, shingleK))
    val dropNearDups = clusters.filter(col("id") =!= col("cluster"))
      .select(col("id").as(idCol))
    val near = exact.join(dropNearDups, Seq(idCol), "left_anti").cache()
    val nNear = near.count()

    val clean = decontaminate(near, bench, idCol, textCol, shingleK).cache()
    val nClean = clean.count()

    val mixed = sampleMixture(clean, idCol, groupCol, rates, defaultRate)
      .cache()
    val nMixed = mixed.count()

    val packed = packSequences(
      mixed.withColumn("__tokens", TextStats.tokenCount(col(textCol))),
      idCol, "__tokens", groupCol, packBudget)
    val nPacks = packed.select(groupCol, "pack_id").distinct().count()

    Seq(quality, exact, near, clean, mixed).foreach(_.unpersist())
    (packed, CurationReport(input, nQuality, nExact, nNear, nClean,
      nMixed, nPacks))
  }

  /** Domain-mixture sampling: keep a deterministic per-document hash gate
    * whose rate depends on the document's domain — the "sample web at
    * 30%, keep curated sources at 100%" step of assembling a training
    * mix. Reproducible end-to-end: the kept set is a pure function of
    * (id, rates), so reruns, incremental loads, and the SQL oracle agree
    * row-for-row (RNG-based sampling can guarantee none of that).
    * Map-only, no shuffle.
    */
  def sampleMixture(docs: DataFrame, idCol: String, groupCol: String,
                    rates: Map[String, Double],
                    defaultRate: Double): DataFrame = {
    require((rates.values ++ Seq(defaultRate)).forall(r => r >= 0 && r <= 1),
      "rates must be in [0, 1]")
    // per-mille gate on the portable md5-based hash (same hash as the
    // q51 train/val split, so gates compose consistently)
    val rate = rates.foldLeft(lit((defaultRate * 1000).toInt)) {
      case (acc, (g, r)) =>
        when(col(groupCol) === g, lit((r * 1000).toInt)).otherwise(acc)
    }
    docs.filter(
      pmod(Shingles.baseHash(col(idCol).cast("string")), lit(1000)) < rate)
  }

  /** Weighted sample without replacement — priority sampling (Duffield,
    * Lund & Thorup, "Priority sampling for estimation of arbitrary
    * subset sums", JACM 2007): item i draws u_i uniform on (0,1] and
    * gets priority w_i/u_i; the k highest-priority items form the
    * sample. Here u_i = (h_i+1)/2^28 on the portable 28-bit md5 hash of
    * the id — so like [[sampleMixture]] the sample is a pure function
    * of the ids: reruns, incremental loads, and the oracle agree
    * row-for-row, which no RNG-based sampler can promise.
    *
    * Determinism of the priority itself: w·2^28 is an exact double for
    * w < 2^25, (h+1) is an exact integer, and the one division is
    * correctly rounded — bit-identical on every IEEE engine. Ties break
    * by id.
    *
    * Scale shape: map + global top-k — Spark plans the limit as
    * TakeOrderedAndProject (per-partition heaps, driver merges k rows),
    * never a full sort.
    */
  def prioritySample(docs: DataFrame, idCol: String, weightCol: String,
                     k: Int): DataFrame = {
    require(k >= 1, s"sample size $k")
    docs.filter(col(weightCol) > 0)
      .withColumn("h",
        Shingles.baseHash(concat(lit("ps|"), col(idCol).cast("string"))))
      .select(col(idCol), col(weightCol).as("weight"),
        ((col(weightCol).cast("double") * lit(268435456.0)) /
          (col("h") + 1).cast("double")).as("priority"))
      .orderBy(desc("priority"), col(idCol))
      .limit(k)
  }

  /** Rank-based winsorize gate: keep the rows whose `metricCol` rank
    * (per `groupCols` stratum, ties broken by `idCol`) lies in
    * `[ceil(pLoNum/pDen·n), floor(pHiNum/pDen·n)]` — the tail-trim
    * every curation pipeline applies before training (truncation-style
    * winsorizing: the tails are DROPPED, not clamped). Rank-based, not
    * value-interpolated: the cut is an exact integer predicate, so
    * every engine keeps byte-identical rows — no percentile
    * interpolation semantics to disagree on.
    *
    * One rank window per stratum (strata sort independently — parallel
    * by group key); the count rides the same exchange.
    */
  /** Curriculum interleave: a deterministic TRAINING ORDER over the
    * corpus that is (a) quality-descending within every source and
    * (b) source-proportional at every prefix — each source's documents
    * land at the quantile positions f = (2·rank−1)/(2·n_source) of the
    * schedule (the midpoint rule), so a 10%-of-corpus source occupies
    * ~10% of ANY training window instead of clumping, and no source is
    * exhausted early. The deterministic complement of shuffle-based
    * interleaving: same inputs ⇒ same order, bit for bit.
    *
    * Output: (doc id, source, `rk` quality rank within source, `n_src`,
    * `f`), ordered by (`f`, source, id) — the row order IS the
    * curriculum. `f` is one exact int→double conversion and one IEEE
    * division per row (both engines agree bit-for-bit); quality ties
    * break on document id.
    *
    * Scale shape: one window shuffle keyed on source (rank + count),
    * then a global sort on `f` — exactly the shape of writing a
    * training corpus in schedule order at 100 TB (range-partitioned
    * sort, no global row-number, no driver-side sequencing).
    */
  def curriculumInterleave(docs: DataFrame, idCol: String,
                           srcCol: String, textCol: String,
                           stopwords: Seq[String]): DataFrame = {
    val scored = docs.select(col(idCol), col(srcCol),
      TextStats.qualityScore(col(textCol), stopwords).as("quality"))
    scored
      .withColumn("rk", row_number().over(Window.partitionBy(srcCol)
        .orderBy(desc("quality"), col(idCol))).cast("long"))
      .withColumn("n_src",
        count(lit(1)).over(Window.partitionBy(srcCol)))
      .withColumn("f", (col("rk") * 2 - 1).cast("double") /
        (col("n_src") * 2).cast("double"))
      .select(col(idCol), col(srcCol), col("rk"), col("n_src"), col("f"))
      .orderBy(col("f"), col(srcCol), col(idCol))
  }

  def winsorizeByRank(docs: DataFrame, groupCols: Seq[String],
                      metricCol: String, idCol: String,
                      pLoNum: Int, pHiNum: Int, pDen: Int): DataFrame = {
    require(0 <= pLoNum && pLoNum < pHiNum && pHiNum <= pDen,
      s"winsorize bounds $pLoNum/$pDen..$pHiNum/$pDen")
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(groupCols.map(col): _*)
      .orderBy(col(metricCol), col(idCol))
    val cnt = Window.partitionBy(groupCols.map(col): _*)
    docs
      .withColumn("__rk", row_number().over(w).cast("long"))
      .withColumn("__n", count(lit(1)).over(cnt))
      // rk ≥ ceil(lo·n) ⟺ rk·pDen ≥ lo·n; rk ≤ floor(hi·n) ⟺ rk·pDen ≤ hi·n
      .filter(col("__rk") * pDen >= lit(pLoNum) * col("__n") &&
        col("__rk") * pDen <= lit(pHiNum) * col("__n"))
      .drop("__rk", "__n")
  }
}
