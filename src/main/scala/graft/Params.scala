package graft

/** Shared constants used by BOTH the Spark implementations and the
  * generated DuckDB oracle SQL — single source of truth so the two sides
  * cannot drift.
  */
object Params {
  val stopwords: Seq[String] = Seq("the", "and", "of", "to", "a", "is", "in")
  val shingleK = 3
  val minhashHashes = 16
  val minhashBandRows = 4
  val jaccardMin = 0.5
  val simhashBits = 16
  val annBits = 4
  val annDims = 64
  val annSeed = 42L
  val annTables = 8
  val topK = 5
  val cosineDupMin = 0.95
  val ivfNlist = 8
  val ivfNprobe = 4
  /** Product-quantization ANN (q85): subspace count, per-subspace
    * codebook size, Lloyd training rounds. 16×32 on 64 dims = 4-dim
    * subvectors with 5-bit codes — measured recall@10 ≈ 0.5 vs exact
    * cosine on the testdata (4×8 scored only 0.14; finer subspaces beat
    * bigger codebooks per stored bit here).
    */
  val pqSubspaces = 16
  val pqCodebook = 32
  val pqIters = 1
  val sessionGapMinutes = 30
  val kmvK = 64
  /** Mergeable quantile sketch (q116): bottom-k sample size per key. */
  val quantileK = 256
  /** Sorted-neighborhood dedup (q134): neighbors compared per row. */
  val snmWindow = 3
  /** Perceptual-hash image pairs (q150): max Hamming distance kept. */
  val ahashMaxHamming = 8
  /** Johnson–Lindenstrauss sign projection (q159): output dims. */
  val jlOutDims = 8
  /** BPE tokenizer training (q161): merge rounds learned. */
  val bpeSteps = 4
  /** k-core peel (q162): minimum degree and peel rounds. */
  val kCoreK = 3
  val kCoreRounds = 5
  /** Scene-cut threshold (q163): mean abs luma diff > num/den.
    * 28 sits at the testdata's median adjacent-frame difference, so
    * both verdicts are exercised. */
  val sceneCutNum = 28L
  val sceneCutDen = 1L
  /** Fellegi–Sunter linkage model (q164): per-field (m, u) as exact
    * rationals — agreement multiplies m/u, disagreement (1−m)/(1−u).
    * CONFIGURED model parameters (a trained model would estimate them
    * by EM); the score of each agreement pattern is a product of these
    * constants, precomputed once so no per-row float arithmetic
    * exists anywhere. */
  val fsFields: Seq[(String, Int, Int, Int, Int)] = Seq(
    // (field, mNum, mDen, uNum, uDen)
    ("type", 9, 10, 1, 150),
    ("size", 17, 20, 1, 50),
    ("price", 4, 5, 1, 100))
  /** Keep pairs whose likelihood ratio clears this floor. */
  val fsMinScore = 100.0

  /** Likelihood ratio of one agreement pattern: exact integer
    * numerator/denominator products, ONE correctly-rounded division
    * at the end — both engines then carry the identical double.
    */
  private def fsScore(bits: Seq[Boolean]): Double = {
    var num = BigInt(1)
    var den = BigInt(1)
    fsFields.zip(bits).foreach { case ((_, mN, mD, uN, uD), agree) =>
      if (agree) { num *= mN.toLong * uD; den *= mD.toLong * uN }
      else { num *= (mD - mN).toLong * uD; den *= mD.toLong * (uD - uN) }
    }
    num.toDouble / den.toDouble
  }

  /** Autocorrelation horizon (q168): lags 1..acfMaxLag of the daily
    * volume series. */
  val acfMaxLag = 6
  /** Benford first-digit probabilities (q172): log10(1 + 1/d),
    * computed ONCE here and embedded as literals on both engines — no
    * per-row transcendental anywhere. */
  def benfordP(d: Int): Double = math.log10(1.0 + 1.0 / d)

  /** All 2^|fields| agreement patterns with their precomputed scores
    * (bit order = [[fsFields]] order, '1' = agree). */
  val fsPatterns: Seq[(String, Double)] =
    (0 until (1 << fsFields.size)).map { m =>
      val bits = fsFields.indices.map(i =>
        (m & (1 << (fsFields.size - 1 - i))) != 0)
      (bits.map(b => if (b) "1" else "0").mkString, fsScore(bits))
    }
  /** Fellegi–Sunter EM (q267): prior match probability P(M) = 1/20. */
  val fsEmPriorNum = 1
  val fsEmPriorDen = 20

  /** One EM E-step per agreement pattern: the posterior match weight
    * w(γ) = p·P(γ|M) / (p·P(γ|M) + (1−p)·P(γ|U)) is a RATIONAL of the
    * configured [[fsFields]] (m, u) rationals and the [[fsEmPriorNum]]
    * prior, computed here once in exact BigInt arithmetic and rounded
    * HALF_EVEN to 12 dp — both engines then interpolate the identical
    * decimal literals, so the only data-dependent arithmetic left in
    * q267 is integer counts × fixed-point literals (exact) and the
    * final M-step divisions. Yields (pattern, w, 1−w) as plain strings.
    */
  val fsEmWeights: Seq[(String, String, String)] =
    fsPatterns.map(_._1).map { p =>
      val bits = p.map(_ == '1')
      var aN = BigInt(fsEmPriorNum); var aD = BigInt(fsEmPriorDen)
      var bN = BigInt(fsEmPriorDen - fsEmPriorNum)
      var bD = BigInt(fsEmPriorDen)
      fsFields.zip(bits).foreach { case ((_, mN, mD, uN, uD), g) =>
        if (g) { aN *= mN; aD *= mD; bN *= uN; bD *= uD }
        else { aN *= (mD - mN); aD *= mD; bN *= (uD - uN); bD *= uD }
      }
      // w = (aN/aD) / (aN/aD + bN/bD) = aN·bD / (aN·bD + bN·aD)
      val num = aN * bD
      val den = num + bN * aD
      val w = new java.math.BigDecimal(num.bigInteger).divide(
        new java.math.BigDecimal(den.bigInteger), 12,
        java.math.RoundingMode.HALF_EVEN)
      (p, w.toPlainString, java.math.BigDecimal.ONE.subtract(w)
        .toPlainString)
    }

  /** Containment near-dup pairs (q119): |sub ∩ sup| / |sub| ≥ 4/5. */
  val containNum = 4
  val containDen = 5
  /** Link prediction (q328): strong-edge relative support — tokens
    * must co-occur in MORE than supNum/supDen of all documents (the
    * corpus-size-portable alternative to an absolute count floor).
    */
  val linkSupNum = 63
  val linkSupDen = 100
  /** User-path analysis (q120): journey length (first K events). */
  val pathK = 5
  /** Event de-bounce (q123): same-key duplicate-suppression gap. */
  val debounceSec = 300
  /** OOV-rate monitor (q124): corpus vocabulary size. */
  val oovVocab = 500
  val packBudget = 512
  val mixHeadSources: Seq[String] = (0 until 5).map(i => s"src$i")
  val mixHeadRate = 0.9
  val mixTailRate = 0.3
  /** Conjunctive keyword-search query terms (q71). */
  val searchTerms: Seq[String] = Seq("hash", "scan", "merge")
  /** BM25 ranking (q89): classic k1/b. The oracle-gated scorer uses the
    * RATIONAL odds idf (N − df + ½)/(df + ½) — ln(odds) is the textbook
    * idf and ln is monotone, so per-term ordering is identical, while
    * the rational form keeps every operation correctly-rounded IEEE
    * (+,·,/ only) and therefore bit-identical across engines; ln/exp
    * carry no such guarantee.
    */
  val bm25K1 = 1.2
  val bm25B = 0.75
  val bm25TopN = 50
  /** Stratified sampling (q90): exact docs kept per source stratum. */
  val stratumK = 10
  /** Decay scoring (q91): anchor date; per-day base-2 decay — scaling by
    * 2^(−k) only shifts the FP exponent, so it is EXACT. */
  val decayAnchor = "2024-02-01"
  /** RRF hybrid fusion (q92): leg depth, dampening k, fused top-N. */
  val rrfK = 60
  val rrfDepth = 100
  val rrfTopN = 50
  /** Token-window chunking (q101): chunk length and stride in tokens
    * (stride < length ⇒ overlapping context windows, the RAG shape). */
  val chunkLen = 64
  val chunkStride = 48
  /** Duplicated-span detection (q103): span width in tokens. Real
    * pipelines use ~50 (Lee et al. 2022); 8 keeps the tiny synthetic
    * vocabulary from marking literally every span duplicated. */
  val spanK = 8
  /** Blocked fuzzy join (q105): compared prefix length (chars) and the
    * max accepted edit distance. */
  val fuzzyPrefix = 40
  val fuzzyMaxDist = 30
  /** Prefix-filtered set-similarity join (q106): Jaccard threshold as a
    * RATIONAL tNum/tDen (= [[jaccardMin]]; since r16 the prefix-filtered
    * plan SERVES q28/q313/q327's exact-Jaccard contract too — the naive
    * every-shingle index measured superlinear at sf3 and is now the
    * test-only equivalence witness) — required overlaps and
    * prefix lengths stay integer-exact and the keep predicate
    * `shared·tDen ≥ tNum·(na + nb − shared)` never touches floating
    * point. */
  val ppjTNum = 1
  val ppjTDen = 2
  /** Robust outliers (q107): MAD multiplier (|v − med| > k·MAD). */
  val madK = 3
  /** Winnowing fingerprints (q401/q402, Schleimer et al. SIGMOD'03):
    * shingle width k, window w (guarantee: any shared token run of
    * ≥ w + k − 1 tokens yields a shared fingerprint), document-
    * frequency cap on candidate postings, and the min shared
    * fingerprints for a reported pair. */
  val winnowK = 4
  val winnowW = 6
  val winnowDfCap = 25
  val winnowMinShared = 2
  /** TextRank (q108): vocabulary cap, damping as a rational, iteration
    * count, and the fixed-point scale (ranks held in integer units of
    * 10^-8 — floor division is bit-exact on every engine; decimal
    * HALF_UP vs half-even rounding ties are not). */
  val trVocab = 40
  val trDampNum = 17
  val trDampDen = 20
  val trIters = 3
  val trScale = 100000000L
  /** Video frame-sampling (q109): mono Y4M frame geometry, frame count,
    * and sampling stride (keep frames 0, n, 2n, …). */
  val vidW = 16
  val vidH = 16
  val vidFrames = 6
  val vidEvery = 2
  /** BFS hop distances (q110): relaxation iterations over the same
    * [[trVocab]]-capped co-occurrence graph as TextRank; nodes farther
    * than this many hops report null (unreached). */
  val bfsIters = 3
  /** Count-min sketch (q113): hash rows × counters per row, and how
    * many exact top tokens to probe against the sketch. */
  val cmsDepth = 4
  val cmsWidth = 64
  val cmsTopN = 10
  /** Priority sampling (q114): sample size. */
  val psK = 50
  /** Exact heavy hitters (q175): keep tokens with frequency ≥ 1/hhDen
    * of all occurrences (den·count ≥ total). 30 splits the testdata
    * vocabulary roughly in half, so the count-min gate has real work. */
  val hhDen = 30L
  /** Hashed-feature linear classifier (q176): feature buckets and the
    * weight range — w(b) = baseHash("w|"+b) mod fhWMod − fhWOff, an
    * integer milli-weight in [−1000, 1000] derived from the hash
    * family, so the oracle rebuilds the identical model. */
  val fhDim = 64
  val fhWMod = 2001
  val fhWOff = 1000
  /** Nearest-centroid assignment (q177): embedding components and
    * centroid means quantized to this integer grid (floor), keeping
    * every dot product and comparison in exact long arithmetic. */
  val ncScale = 1000000L
  /** Market-basket mining (q180): keep brand pairs co-ordered in at
    * least 1/basketDen of all orders (s_ab·basketDen ≥ N). */
  val basketDen = 40L
  /** Systematic PPS sampling (q181): target sample size (expected
    * pick count; big rows can be picked more than once). */
  val sysK = 40L
  /** MMR diversified retrieval (q182): probe vector id, relevance
    * candidate pool size, and final diversified picks. */
  val mmrProbeId = 0L
  val mmrCand = 12
  val mmrK = 5
  /** Negative sampling (q184): negatives drawn per customer. */
  val negK = 2
  /** SemDeDup (q185): prune within-cell pairs with cosine ≥ num/den
    * (2/5 sits inside the testdata's similarity range so both verdicts
    * occur; production corpora with real duplicates run ~19/20). */
  val semCosNum = 2
  val semCosDen = 5
  /** Phrase search (q115): the two-token phrase (adjacent, in order). */
  val phraseA = "order"
  val phraseB = "fast"
}
