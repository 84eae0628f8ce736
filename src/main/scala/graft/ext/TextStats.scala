package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text-analysis operators for a training-data pipeline, all expressed as
  * pure per-row `Column` pipelines — zero shuffle, full whole-stage
  * codegen, embarrassingly parallel at any scale.
  */
object TextStats {

  /** Whitespace tokenization. `split` with a regex keeps semantics
    * identical to a SQL oracle's single-space split when the corpus is
    * single-space separated; `filter(len > 0)` guards stray empties.
    */
  def tokens(text: Column): Column =
    filter(split(text, " "), t => length(t) > 0)

  /** Token count (whitespace tokens). */
  def tokenCount(text: Column): Column = size(tokens(text)).cast("long")

  /** BPE-ish subword count estimate: words + punctuation marks each
    * count as a token (a cheap deterministic proxy for a BPE tokenizer's
    * granularity). RE2-compatible alternation (no lookaround) so the same
    * pattern runs in any oracle engine.
    */
  def subwordCount(text: Column): Column =
    size(regexp_extract_all(text, lit("[^ .,!?;:]+|[.,!?;:]"), lit(0)))
      .cast("long")

  /** Quality-score components: length score, stopword ratio, punctuation
    * ratio, mean word length. Deterministic arithmetic only (oracle-able).
    */
  def stopwordRatio(text: Column, stopwords: Seq[String]): Column = {
    val toks = tokens(lower(text))
    val stopArr = array(stopwords.map(lit): _*)
    when(size(toks) > 0,
      size(filter(toks, t => array_contains(stopArr, t))).cast("double") /
        size(toks).cast("double")).otherwise(lit(0.0))
  }

  def punctRatio(text: Column): Column =
    when(length(text) > 0,
      (length(text) - length(regexp_replace(text, "[.,!?;:]", "")))
        .cast("double") / length(text).cast("double"))
      .otherwise(lit(0.0))

  def meanWordLen(text: Column): Column = {
    val toks = tokens(text)
    when(size(toks) > 0,
      aggregate(toks, lit(0L), (acc, t) => acc + length(t).cast("long"))
        .cast("double") / size(toks).cast("double"))
      .otherwise(lit(0.0))
  }

  /** Composite quality score in [0,1]: favors mid-length docs with a sane
    * stopword presence and low punctuation noise. Raw IEEE double (no
    * final rounding — engines disagree on decimal rounding of binary
    * doubles at half-way points, while the arithmetic itself is
    * bit-reproducible).
    */
  def qualityScore(text: Column, stopwords: Seq[String]): Column = {
    val lenScore = least(length(text).cast("double") / lit(500.0), lit(1.0))
    val stop     = stopwordRatio(text, stopwords)
    val punct    = punctRatio(text)
    lenScore * lit(0.5) + least(stop * lit(5.0), lit(1.0)) * lit(0.3) +
      (lit(1.0) - least(punct * lit(10.0), lit(1.0))) * lit(0.2)
  }

  /** N-gram-heuristic language ID: score each candidate language by
    * counting its marker tokens; argmax wins (ties broken by fixed
    * language order). Markers are standard high-frequency function words.
    */
  val langMarkers: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "and", "of", "to", "is"),
    "es" -> Seq("el", "la", "de", "que", "es"),
    "de" -> Seq("der", "die", "und", "das", "ist"),
    "fr" -> Seq("le", "la", "et", "les", "est"),
    "zh" -> Seq("的", "是", "了", "在", "我"))

  def langScore(text: Column, markers: Seq[String]): Column = {
    val toks = tokens(lower(text))
    val arr = array(markers.map(lit): _*)
    size(filter(toks, t => array_contains(arr, t))).cast("long")
  }

  def langId(text: Column): Column =
    graft.functions.NativeExprs.langId(tokens(lower(text)), langMarkers)

  /** HOF reference implementation of [[langId]] (bit-identical; kept for
    * the parity spec).
    */
  def langIdHof(text: Column): Column = {
    val scored = langMarkers.map { case (l, m) => (l, langScore(text, m)) }
    // argmax with deterministic tie-break on declaration order
    scored.tail.foldLeft((lit(scored.head._1), scored.head._2)) {
      case ((bestLang, bestScore), (l, s)) =>
        (when(s > bestScore, lit(l)).otherwise(bestLang),
          when(s > bestScore, s).otherwise(bestScore))
    }._1
  }

  /** Document fingerprints.
    * - `contentFingerprint`: md5 of the normalized text (lower, collapse
    *   whitespace, strip punctuation) — a content-defined exact-dup key.
    * - `rollingFingerprint`: min md5 over k-word shingles — a 1-hash
    *   MinHash, stable under local edits away from the minimizing shingle.
    */
  def normalized(text: Column): Column =
    trim(regexp_replace(regexp_replace(lower(text), "[.,!?;:]", ""),
      "\\s+", " "))

  def contentFingerprint(text: Column): Column = md5(normalized(text))

  def rollingFingerprint(text: Column, k: Int = 5): Column =
    graft.functions.NativeExprs.rollingFingerprint(tokens(text), k)

  /** HOF reference implementation of [[rollingFingerprint]]
    * (bit-identical; kept for the parity spec).
    */
  def rollingFingerprintHof(text: Column, k: Int = 5): Column =
    array_min(Shingles.shingleHashes(tokens(text), k, seed = 0))

  /** Per-document lexical-diversity profile: token count, type count,
    * type/token ratio, hapax fraction, and the Simpson concentration
    * Σc²/n² (1/Simpson is the "effective vocabulary size"). The
    * corpus-curation cousin of the n-gram repetition stats: repeated-
    * boilerplate and template-generated docs show low TTR and high
    * concentration long before an n-gram signal fires.
    *
    * All five outputs are ratios of exact integer aggregates (no
    * transcendentals — Shannon entropy would drag in cross-engine libm
    * drift, Simpson is the rational-arithmetic diversity index), so the
    * result is bit-reproducible and oracle-checkable.
    *
    * Scale shape: one explode + two partial-aggregable groupBys, both
    * keyed by doc id — embarrassingly parallel, no corpus-wide state.
    */
  def lexicalDiversity(docs: DataFrame, idCol: String,
                       textCol: String): DataFrame = {
    val perTok = docs
      .select(col(idCol), explode(tokens(col(textCol))).as("tok"))
      .groupBy(col(idCol), col("tok"))
      .agg(count(lit(1)).as("c"))
    perTok.groupBy(col(idCol))
      .agg(sum(col("c")).as("n_tokens"),
        count(lit(1)).as("n_types"),
        sum(when(col("c") === 1, 1L).otherwise(0L)).as("n_hapax"),
        sum(col("c") * col("c")).as("c2"))
      .select(col(idCol),
        col("n_tokens"), col("n_types"),
        (col("n_types").cast("double") / col("n_tokens").cast("double"))
          .as("ttr"),
        (col("n_hapax").cast("double") / col("n_types").cast("double"))
          .as("hapax_frac"),
        (col("c2").cast("double") /
          (col("n_tokens") * col("n_tokens")).cast("double")).as("simpson"))
  }

  /** Count-based bigram predictability per document — the rational-
    * arithmetic stand-in for LM perplexity scoring (CCNet-style corpus
    * quality filtering): score(d) = avg over d's bigrams of the corpus
    * conditional probability c(w₁w₂)/c(w₁·). Natural text scores in a
    * mid band; boilerplate scores near 1 (every bigram is corpus-
    * frequent), gibberish near 0. Each term is quantized to 1e-8 on
    * both engines (floor to a long) so the per-doc sum is an exact
    * integer — order-independent under any partitioning.
    *
    * Scale shape: the corpus pass that builds the bigram/context count
    * tables is two partial-aggregable groupBys; scoring is two equi-
    * joins keyed by bigram/context (the inverted-index shape — never a
    * per-doc scan of the model), then one groupBy doc. At 100 TB the
    * count tables are themselves distributed, so nothing is collected
    * or broadcast.
    */
  def bigramPredictability(docs: DataFrame, idCol: String,
                           textCol: String): DataFrame = {
    val grams = docs.select(col(idCol),
      explode(Shingles.wordShingles(tokens(col(textCol)), 2)).as("bg"))
    val c2 = grams.groupBy("bg").agg(count(lit(1)).as("c2"))
    val c1 = grams
      .groupBy(substring_index(col("bg"), " ", 1).as("w1"))
      .agg(count(lit(1)).as("c1"))
    grams
      .join(c2, "bg")
      .join(c1, substring_index(col("bg"), " ", 1) === col("w1"))
      .select(col(idCol),
        floor(col("c2").cast("double") / col("c1").cast("double") *
          lit(1.0e8)).as("q"))
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_bigrams"),
        (sum(col("q")).cast("double") / lit(1.0e8) / count(lit(1)))
          .as("predictability"))
  }
}
