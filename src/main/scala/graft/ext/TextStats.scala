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

  /** BPE tokenizer TRAINING — the full merge loop, not just the q83
    * pair-counting pass: `steps` rounds of (count adjacent symbol
    * pairs → pick the most frequent → greedily merge its occurrences),
    * returning the learned merge table (step, left, right, pair_count).
    *
    * Scale shape is the textbook one: the corpus is tokenized ONCE into
    * a word-frequency table (vocab-bounded), and every iteration
    * operates on that table — pair counts weight by word frequency, so
    * 100 TB of text costs the same per round as its distinct-word
    * vocabulary. The per-round argmax is a 1-row TakeOrdered with a
    * deterministic (count desc, left, right) tie-break, broadcast back.
    *
    * The greedy merge itself is a sequential fold per word, expressed
    * as a space-delimited string accumulator (`aggregate` over the
    * symbol array): append each symbol unless the accumulator ends
    * with " "+left and the symbol equals right, in which case the tail
    * symbol is replaced by left‖right. Because the merged symbol is
    * strictly longer than `left`, it can never re-match within the
    * same round — the fold IS leftmost-greedy BPE (runs like
    * [a,a,a,a] → [aa,aa]), and the space delimiter anchors symbol
    * boundaries so suffix/prefix collisions (merging (a,b) must skip
    * [xa,b]) are impossible. The identical fold is expressible in
    * DuckDB's `list_reduce`, which keeps the whole loop oracle-exact.
    *
    * Each round's vocab is localCheckpoint'ed: the next round's plan
    * references the materialized table, not `steps` nested folds.
    */
  def bpeTrain(docs: DataFrame, textCol: Column, steps: Int): DataFrame =
    bpeLoop(docs, textCol, steps)._1

  /** Apply the merges [[bpeTrain]] learns back onto the corpus — the
    * ENCODE half of the tokenizer: every distinct word is reduced to
    * its post-merge symbol sequence (the training loop's final vocab
    * table IS that encoding, vocab-bounded), then one broadcast join
    * against the exploded corpus sums subword counts per document.
    * Returns (doc id, n_words, n_subwords); token-free documents drop
    * out (inner-join contract, mirrored by the oracle).
    */
  def bpeEncode(docs: DataFrame, idCol: String, textCol: Column,
                steps: Int): DataFrame = {
    val vocab = bpeLoop(docs, textCol, steps)._2
    docs.select(col(idCol), explode(tokens(textCol)).as("word"))
      .join(broadcast(vocab.select(col("word"),
        size(col("syms")).cast("long").as("n_syms"))), "word")
      .groupBy(idCol)
      .agg(count(lit(1)).as("n_words"), sum("n_syms").as("n_subwords"))
      .orderBy(idCol)
  }

  private def bpeLoop(docs: DataFrame, textCol: Column,
                      steps: Int): (DataFrame, DataFrame) = {
    require(steps >= 1, s"steps $steps")
    val spark = docs.sparkSession
    var vocab = docs
      .select(explode(tokens(textCol)).as("word"))
      .groupBy("word").agg(count(lit(1)).as("wc"))
      .withColumn("syms", expr(
        "transform(sequence(1, length(word)), i -> substring(word, i, 1))"))
      .localCheckpoint(eager = true)
    val merges = Seq.newBuilder[org.apache.spark.sql.DataFrame]
    for (step <- 1 to steps) {
      val best = vocab
        // adjacent pairs via offset slices, NOT sequence(1, n-1):
        // Spark's sequence(1, 0) DESCENDS instead of being empty, so
        // the slice form is what keeps 1-symbol words pair-free
        .select(col("wc"), explode(expr(
          """zip_with(slice(syms, 1, size(syms) - 1),
                      slice(syms, 2, size(syms) - 1),
             (a, b) -> named_struct('l', a, 'r', b))""")).as("p"))
        .groupBy(col("p.l").as("m_left"), col("p.r").as("m_right"))
        .agg(sum("wc").as("pair_count"))
        .orderBy(desc("pair_count"), col("m_left"), col("m_right"))
        .limit(1)
      merges += best.withColumn("step", lit(step))
        .select("step", "m_left", "m_right", "pair_count")
      vocab = vocab.crossJoin(broadcast(best))
        .withColumn("syms", expr(
          """split(substring(aggregate(syms, CAST('' AS STRING),
             (acc, x) -> CASE
               WHEN endswith(acc, concat(' ', m_left)) AND x = m_right
               THEN concat(substring(acc, 1,
                   length(acc) - length(m_left) - 1),
                 ' ', m_left, m_right)
               ELSE concat(acc, ' ', x) END), 2), ' ')"""))
        .select("word", "wc", "syms")
        .localCheckpoint(eager = true)
    }
    (merges.result().reduce(_ unionAll _).orderBy("step"), vocab)
  }
}
