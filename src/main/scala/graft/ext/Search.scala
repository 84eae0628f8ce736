package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.functions.Parity

/** Ranked retrieval over a document corpus (the q89 surface).
  *
  * BM25 in the inverted-index shape: postings (doc, term, tf) from one
  * tokenize pass, per-term document frequencies and the corpus stats
  * (N, avgdl) broadcast — the big side is touched once, and the
  * per-term score is pure arithmetic inside whole-stage codegen.
  *
  * Two idf variants:
  *  - `lnIdf = false` (default): the RATIONAL odds idf
  *    (N − df + ½)/(df + ½). ln is strictly monotone, so per-term
  *    score ordering matches the textbook ln idf exactly, while the
  *    rational form stays inside correctly-rounded IEEE ops (+,·,/) —
  *    bit-reproducible across engines, which is what the oracle gate
  *    needs.
  *  - `lnIdf = true`: the textbook Robertson–Zaragoza
  *    ln(1 + (N − df + ½)/(df + ½)). Use when interoperating with
  *    Lucene-style scores; not oracle-gated because ln carries no
  *    cross-engine rounding guarantee.
  */
object Search {

  def bm25(docs: DataFrame, idCol: String, textCol: String,
           terms: Seq[String], k1V: Double, bV: Double, topN: Int,
           lnIdf: Boolean = false): DataFrame = {
    val k1 = lit(k1V); val b = lit(bV)
    val toks = docs.select(col(idCol).as("doc_id"),
      TextStats.tokens(col(textCol)).as("toks"))
    val dl = toks.select(col("doc_id"), size(col("toks")).cast("long").as("dl"))
    val stats = dl.agg(count(lit(1)).as("n_docs"),
        sum(col("dl")).as("total_dl"))
      .select(col("n_docs"),
        (col("total_dl").cast("double") / col("n_docs")).as("avgdl"))
    // dl rides the explode so postings don't need a join back to a
    // second tokenize pass: one scan builds (doc, tok, dl), the per-doc
    // length being constant within the group
    val tf = toks.select(col("doc_id"),
        size(col("toks")).cast("long").as("dl"),
        explode(col("toks")).as("tok"))
      .filter(col("tok").isin(terms: _*))
      .groupBy("doc_id", "dl", "tok").agg(count(lit(1)).as("tf"))
    val dfs = tf.groupBy("tok").agg(count(lit(1)).as("df"))
    val odds = (col("n_docs").cast("double") - col("df").cast("double") +
      lit(0.5)) / (col("df").cast("double") + lit(0.5))
    val idf = if (lnIdf) log(lit(1.0) + odds) else odds
    tf.join(broadcast(dfs), "tok")
      .crossJoin(broadcast(stats))
      .withColumn("tscore",
        idf * ((col("tf").cast("double") * (k1 + lit(1.0))) /
          (col("tf").cast("double") + k1 * (lit(1.0) - b +
            b * (col("dl").cast("double") / col("avgdl"))))))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_terms"), Parity.dsum(col("tscore")).as("score"))
      .orderBy(desc("score"), col("doc_id")).limit(topN)
  }

  /** TextRank keyword scoring (Mihalcea & Tarau, EMNLP 2004): weighted
    * PageRank over the token co-occurrence graph, restricted to the top
    * `vocab` tokens by document frequency. Edge (u, v) carries the
    * number of documents containing both tokens; rank flows along edges
    * proportionally to co-occurrence weight, with rational damping
    * `dampNum/dampDen`.
    *
    * Determinism contract: ranks are FIXED-POINT integers (units of
    * 1/scale); every update is integer multiply + floor division —
    * per-edge `(r·c) div W(u)`, damping `(dampNum·Σ) div dampDen`,
    * teleport `((dampDen−dampNum)·scale) div (dampDen·N)` — so
    * iteration k's rank vector is bit-identical on any engine. Floats
    * would need pow/ln-free care; decimals hit HALF_UP-vs-half-even
    * rounding ties; integer floor has neither failure mode. The < 1/scale
    * mass floored away per term is the standard fixed-point trade.
    *
    * Scale shape: the vocab cap makes nodes/edges broadcast-small by
    * construction while the corpus passes (tokenize, df count, postings
    * join) stay distributed; each iteration is one broadcast join + one
    * groupBy over the bounded edge table, so iterations never reshuffle
    * the corpus. Nothing is collected to the driver.
    */
  /** Vocab-capped token co-occurrence graph shared by [[textRank]] and
    * [[bfsHops]]: the top-`vocab` tokens by document frequency (ties by
    * token) and the undirected weighted edge list between them (edge
    * weight = number of documents containing both endpoints, emitted in
    * both directions). Both returns are `localCheckpoint`ed: they are
    * bounded by construction (≤ vocab and ≤ vocab² rows), and cutting
    * the corpus lineage here means the iterative loops built on top
    * never re-tokenize the corpus (the q45 label-propagation lesson;
    * measured on q108: 56 scans and 113 shuffles in the 3-iteration
    * plan vs 2 corpus passes after).
    */
  private[ext] def cooccurGraph(docs: DataFrame, idCol: String,
                                textCol: String, vocab: Int)
  : (DataFrame, DataFrame) = {
    val (vloc, half) = cooccurLocal(docs, idCol, textCol, vocab)
    import docs.sparkSession.implicits._
    val v = vloc.toSeq.toDF("token", "df")
    val edges = (half ++ half.map(e => (e._2, e._1, e._3))).toSeq
      .toDF("src", "dst", "c")
    (v, edges)
  }

  /** Collected vocab co-occurrence graph: top-`vocab` tokens by (df
    * desc, token) and the canonical (src < dst) weighted edges, as
    * driver values. The DISTRIBUTED part is the two corpus passes —
    * (1) per-doc `array_distinct` + explode → map-side-partial df
    * count (the (doc, token) dedup happens inside the row, so no
    * corpus-sized distinct shuffle), (2) per-row pair emission against
    * the vocab shipped in as a literal array (no self-join on doc_id,
    * so no corpus-sized exchange at all; the pair aggregation
    * partial-aggregates to ≤ vocab² keys). Both results are bounded
    * CONTROL tables (≤ vocab and ≤ vocab(vocab−1)/2 rows — the same
    * class as the engine's centroid/boundary collects), so the graph
    * ITERATIONS built on top (BFS / peeling / fixpoints, all
    * O(vocab³) worst case, CONSTANT in the corpus) run as plain Scala
    * instead of driver-scheduled tiny Spark jobs. r16 measurements at
    * sf0.1 (guide §1.1/§1.2): the old explode→distinct→self-join
    * corpus pass was 2.06 s of q371's 3.9 s wall, and each
    * localCheckpoint'd iteration round was another ~0.2–0.3 s of pure
    * scheduling on a ≤ 1 600-row table. Float assembly stays in Spark
    * on the LocalRelation results, so every double is produced by the
    * identical expression tree as the pre-r16 plans.
    */
  private[ext] def cooccurLocal(docs: DataFrame, idCol: String,
                                textCol: String, vocab: Int)
  : (Array[(String, Long)], Array[(String, String, Long)]) = {
    def dtoks = docs.select(col(idCol).as("doc_id"),
      array_distinct(TextStats.tokens(col(textCol))).as("toks"))
    val vloc = dtoks.select(explode(col("toks")).as("token"))
      .groupBy("token").agg(count(lit(1)).as("df"))
      .orderBy(desc("df"), col("token")).limit(vocab)
      .collect().map(r => (r.getString(0), r.getLong(1)))
    val vocabLit = array(vloc.map(t => lit(t._1)).toSeq: _*)
    val vt = array_sort(array_intersect(col("toks"), vocabLit))
    val pairStructs = flatten(transform(vt, x =>
      transform(filter(vt, y => y > x), y =>
        struct(x.as("src"), y.as("dst")))))
    val half =
      if (vloc.isEmpty) Array.empty[(String, String, Long)]
      else dtoks.select(explode(pairStructs).as("p"))
        .select(col("p.src").as("src"), col("p.dst").as("dst"))
        .groupBy("src", "dst").agg(count(lit(1)).as("c"))
        .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    (vloc, half)
  }

  /** [[cooccurLocal]] thinned to STRONG canonical edges (c·supDen >
    * supNum·ndocs — the shared q328/q359/q370/q371/q372 gate, relative
    * so it ports across corpus sizes), with weights.
    */
  private[ext] def strongLocal(docs: DataFrame, idCol: String,
                               textCol: String, vocab: Int,
                               supNum: Int, supDen: Int)
  : Array[(String, String, Long)] = {
    val (_, half) = cooccurLocal(docs, idCol, textCol, vocab)
    val nd = docs.count()
    half.filter(e => e._3 * supDen > supNum.toLong * nd)
  }

  def textRank(docs: DataFrame, idCol: String, textCol: String,
               vocab: Int, dampNum: Int, dampDen: Int, iters: Int,
               scale: Long): DataFrame = {
    require(dampNum >= 0 && dampNum <= dampDen, s"damping $dampNum/$dampDen")
    require(iters >= 1, s"iters $iters")
    // r16: the rank fixpoint runs as plain Scala over the collected
    // vocab graph (bounded control tables, [[cooccurLocal]]); every
    // update is the same nonnegative-long multiply + floor division as
    // the old per-iteration Spark jobs, so iteration k's rank vector is
    // bit-identical. Only the final units→double division runs in Spark.
    val (vloc, halfE) = cooccurLocal(docs, idCol, textCol, vocab)
    val tokens = vloc.map(_._1)
    val n = tokens.length.toLong
    val dirEdges = halfE.flatMap(e =>
      Seq((e._1, e._2, e._3), (e._2, e._1, e._3)))
    val w = dirEdges.groupBy(_._1).map { case (s, es) =>
      s -> es.map(_._3).sum }
    var r: Map[String, Long] = tokens.map(t => t -> scale / n).toMap
    for (_ <- 1 to iters) {
      val contrib = scala.collection.mutable.Map.empty[String, Long]
      dirEdges.foreach { case (src, dst, c) =>
        contrib(dst) = contrib.getOrElse(dst, 0L) + (r(src) * c) / w(src)
      }
      r = tokens.map(t => t ->
        ((dampDen - dampNum).toLong * scale / (dampDen.toLong * n) +
          dampNum.toLong * contrib.getOrElse(t, 0L) / dampDen)).toMap
    }
    import docs.sparkSession.implicits._
    tokens.map(t => (t, r(t))).toSeq.toDF("token", "r")
      .select(col("token"), col("r").as("rank_units"),
        (col("r").cast("double") / lit(scale.toDouble)).as("rank"))
      .orderBy(desc("rank_units"), col("token"))
  }

  /** Personalized PageRank — the retrieval-expansion variant of
    * [[textRank]]: ALL teleport mass returns to one seed node (the
    * highest-df token, [[bfsHops]]'s source), so the stationary scores
    * measure proximity to the seed instead of global centrality — the
    * "related terms" / query-expansion primitive. Same fixed-point
    * integer discipline (multiply + floor-div only), same bounded
    * plan: corpus touched twice, iterations on the checkpointed
    * ≤ vocab² edge table, all broadcast.
    */
  def personalizedPageRank(docs: DataFrame, idCol: String, textCol: String,
                           vocab: Int, dampNum: Int, dampDen: Int,
                           iters: Int, scale: Long): DataFrame = {
    require(dampNum >= 0 && dampNum <= dampDen, s"damping $dampNum/$dampDen")
    require(iters >= 1, s"iters $iters")
    // r16: same driver-side fixpoint as [[textRank]] — collected
    // bounded graph, identical nonnegative integer arithmetic, final
    // units→double division left to Spark.
    val (vloc, halfE) = cooccurLocal(docs, idCol, textCol, vocab)
    val tokens = vloc.map(_._1)
    val seed = tokens.headOption.getOrElse("") // vloc is (df desc, token)
    val dirEdges = halfE.flatMap(e =>
      Seq((e._1, e._2, e._3), (e._2, e._1, e._3)))
    val w = dirEdges.groupBy(_._1).map { case (s, es) =>
      s -> es.map(_._3).sum }
    var r: Map[String, Long] =
      tokens.map(t => t -> (if (t == seed) scale else 0L)).toMap
    for (_ <- 1 to iters) {
      val contrib = scala.collection.mutable.Map.empty[String, Long]
      dirEdges.foreach { case (src, dst, c) =>
        contrib(dst) = contrib.getOrElse(dst, 0L) + (r(src) * c) / w(src)
      }
      r = tokens.map(t => t ->
        ((if (t == seed) (dampDen - dampNum).toLong * scale / dampDen
          else 0L) +
          dampNum.toLong * contrib.getOrElse(t, 0L) / dampDen)).toMap
    }
    import docs.sparkSession.implicits._
    tokens.map(t => (t, r(t))).toSeq.toDF("token", "r")
      .select(col("token"), col("r").as("ppr_units"),
        (col("r").cast("double") / lit(scale.toDouble)).as("ppr"))
      .orderBy(desc("ppr_units"), col("token"))
  }

  /** Sentinel for "unreached" in [[bfsHops]]'s integer relaxation. */
  private[ext] val BfsInf = 999999L

  /** Breadth-first hop distances over the vocab-capped token
    * co-occurrence graph ([[cooccurGraph]]), from the single
    * highest-df token (ties by token order). Iterative min-plus
    * relaxation — `d_k(v) = min(d_{k-1}(v), min over edges (u,v) of
    * d_{k-1}(u) + 1)` — unrolled `iters` times, so the result is the
    * exact hop distance for every node within `iters` hops and null
    * (unreached) beyond. Pure integer arithmetic: bit-identical on any
    * engine, no float anywhere.
    *
    * Completes the graph suite: connected components (q45), PageRank
    * centrality (q108), and now single-source distances — the three
    * primitives a corpus-graph pipeline (co-citation, link dedup,
    * crawl-frontier scoring) leans on.
    *
    * Scale shape: identical to [[textRank]] — the corpus is touched
    * exactly twice (df count + postings join) and each relaxation is a
    * broadcast join + groupBy over the checkpointed ≤ vocab² edge
    * table; nothing collects to the driver.
    */
  def bfsHops(docs: DataFrame, idCol: String, textCol: String,
              vocab: Int, iters: Int): DataFrame = {
    require(iters >= 1, s"iters $iters")
    // r16: driver-side min-plus relaxation over the collected bounded
    // graph ([[cooccurLocal]]) — identical integer recurrence
    // (d_k(v) = min(d_{k-1}(v), min over (u,v) of d_{k-1}(u) + 1) with
    // the same 999999 sentinel), zero per-iteration Spark jobs.
    val (vloc, halfE) = cooccurLocal(docs, idCol, textCol, vocab)
    val tokens = vloc.map(_._1)
    val source = tokens.headOption.getOrElse("")
    val dirEdges = halfE.flatMap(e => Seq((e._1, e._2), (e._2, e._1)))
    var d: Map[String, Long] =
      tokens.map(t => t -> (if (t == source) 0L else BfsInf)).toMap
    for (_ <- 1 to iters) {
      val relax = scala.collection.mutable.Map.empty[String, Long]
      dirEdges.foreach { case (src, dst) =>
        val ds = d(src)
        if (relax.getOrElse(dst, Long.MaxValue) > ds) relax(dst) = ds
      }
      d = tokens.map(t => t ->
        math.min(d(t), relax.get(t).map(_ + 1L).getOrElse(BfsInf))).toMap
    }
    import docs.sparkSession.implicits._
    tokens.map(t => (t, if (d(t) < BfsInf) Some(d(t)) else None)).toSeq
      .toDF("token", "hops")
      .orderBy(col("hops").asc_nulls_last, col("token"))
  }

  /** Triangle census of the vocab-capped co-occurrence graph
    * ([[cooccurGraph]]): node/edge/wedge/triangle counts and the global
    * clustering coefficient 3·triangles / wedges — the cohesion
    * diagnostic that separates hub-and-spoke vocabularies from clique-y
    * ones, completing the graph suite (components q45, PageRank q108,
    * BFS q110).
    *
    * The degree-ordered node-iterator of Suri & Vassilvitskii (WWW'11):
    * each undirected edge is oriented from its lower to its higher
    * endpoint under the total order (degree, token), and a triangle is
    * counted at its unique lowest vertex — the join that enumerates
    * out-neighbor pairs fans out quadratically only in the OUT-degree,
    * which the orientation caps near √|E| even when a hub token touches
    * everything. Pure integer counts plus one final IEEE division, so
    * the oracle replays it exactly.
    *
    * Scale shape: one corpus pass to build the graph (shared
    * [[cooccurGraph]] checkpoint), then every join runs on the
    * ≤ vocab²-bounded edge/degree tables — broadcast-sized by
    * construction, nothing quadratic in the corpus.
    */
  def triangleStats(docs: DataFrame, idCol: String, textCol: String,
                    vocab: Int): DataFrame = {
    // r16: the census runs as plain Scala over the collected bounded
    // graph ([[cooccurLocal]]) — node/edge/wedge/triangle counts are
    // exact integers, so only the final IEEE division is left to Spark
    // (the identical expression tree as the distributed census).
    val (vloc, half) = cooccurLocal(docs, idCol, textCol, vocab)
    val nNodes = vloc.length.toLong
    val nEdges = half.length.toLong
    val deg = scala.collection.mutable.Map.empty[String, Long]
    half.foreach { case (s, d, _) =>
      deg(s) = deg.getOrElse(s, 0L) + 1L
      deg(d) = deg.getOrElse(d, 0L) + 1L
    }
    // sum(deg·(deg−1) div 2) over an EMPTY degree table is SQL null
    val nWedges: Option[Long] =
      if (deg.isEmpty) None
      else Some(deg.valuesIterator.map(dg => dg * (dg - 1) / 2).sum)
    val adj = half.map(e => (e._1, e._2)).toSet
    val nbrs = scala.collection.mutable
      .Map.empty[String, List[String]] // canonical higher neighbours
    half.foreach { case (s, d, _) =>
      nbrs(s) = d :: nbrs.getOrElse(s, Nil)
    }
    // triangle (a < b < c) counted once at edge (a, b) via witness c
    var nTriangles = 0L
    half.foreach { case (s, d, _) =>
      nbrs.getOrElse(s, Nil).foreach { w =>
        if (w > d && adj.contains((d, w))) nTriangles += 1L
      }
    }
    import docs.sparkSession.implicits._
    Seq((nNodes, nEdges, nWedges, nTriangles))
      .toDF("n_nodes", "n_edges", "n_wedges", "n_triangles")
      .select(col("n_nodes"), col("n_edges"), col("n_wedges"),
        col("n_triangles"),
        ((col("n_triangles") * 3).cast("double") /
          col("n_wedges").cast("double")).as("global_clustering"))
  }

  /** Topological link prediction over the vocab-capped co-occurrence
    * graph, thinned to STRONG edges (tokens co-occurring in more than
    * supNum/supDen of all documents — an absolute threshold would not
    * port across corpus sizes): for every NON-edge (a,b) reachable in
    * two hops, the three classic log-free scores — common-neighbour
    * count, neighbourhood Jaccard cn/(deg a + deg b − cn), and
    * preferential attachment deg a · deg b — ranked by (cn desc, a, b),
    * top `topK`.
    *
    * Everything after the one corpus scan inside [[cooccurGraph]] lives
    * on the ≤ vocab²-bounded edge table: the support gate (integer
    * cross-multiplication against the broadcast doc count), the
    * two-hop candidate join, the existing-edge anti-join and the
    * degree lookups are all broadcastable at any corpus scale, so the
    * only full-data cost is the scan the graph itself needs.
    */
  def linkPrediction(docs: DataFrame, idCol: String, textCol: String,
                     vocab: Int, supNum: Int, supDen: Int,
                     topK: Int): DataFrame = {
    // r16: common-neighbour counting runs as plain Scala over the
    // collected strong graph ([[strongLocal]]) — all-integer; the two
    // score divisions stay in Spark (identical expression tree).
    val strong = strongLocal(docs, idCol, textCol, vocab, supNum, supDen)
    val dirEdges = strong.flatMap(e => Seq((e._1, e._2), (e._2, e._1)))
    val deg = dirEdges.groupBy(_._1).map { case (t, es) =>
      t -> es.length.toLong }
    val cn = scala.collection.mutable.Map.empty[(String, String), Long]
    dirEdges.groupBy(_._1).valuesIterator.foreach { es =>
      val ns = es.map(_._2).sorted
      var i = 0
      while (i < ns.length) {
        var j = i + 1
        while (j < ns.length) {
          val k = (ns(i), ns(j))
          cn(k) = cn.getOrElse(k, 0L) + 1L
          j += 1
        }
        i += 1
      }
    }
    val existing = strong.map(e => (e._1, e._2)).toSet
    import docs.sparkSession.implicits._
    cn.iterator.filterNot(kv => existing.contains(kv._1))
      .map { case ((a, b), c) => (a, b, c, deg(a), deg(b)) }.toSeq
      .toDF("a", "b", "cn", "da", "db")
      .select(col("a"), col("b"), col("cn"),
        (col("cn").cast("double") /
          (col("da") + col("db") - col("cn")).cast("double"))
          .as("nb_jaccard"),
        (col("da") * col("db")).as("pref_attach"))
      .orderBy(desc("cn"), col("a"), col("b"))
      .limit(topK)
  }

  /** k-core subgraph of the vocab-capped co-occurrence graph: `rounds`
    * synchronized peel iterations (drop every node whose degree < k,
    * recompute, repeat), returning each surviving node with its degree
    * in the peeled subgraph — the standard cohesion filter that strips
    * hub-and-spoke fringe from a vocabulary graph before community or
    * centrality work.
    *
    * Bounded-unroll contract like [[bfsHops]]: exactly `rounds` peels,
    * so the result is a well-defined pure function of the graph (and
    * equals the true k-core whenever the peel converges within the
    * horizon — each round that changes anything removes ≥ 1 node, so
    * rounds ≥ |V| always converges). Every iteration runs on the
    * ≤ vocab²-bounded edge table with broadcast semi-joins — integer
    * degrees, no corpus re-scan, one localCheckpoint per round so the
    * plan stays flat.
    */
  def kCore(docs: DataFrame, idCol: String, textCol: String, vocab: Int,
            k: Int, rounds: Int): DataFrame = {
    require(k >= 1, s"k $k")
    require(rounds >= 1, s"rounds $rounds")
    // r16: the peel loop runs as plain Scala over the collected bounded
    // graph ([[cooccurLocal]]) — exactly `rounds` synchronized peels,
    // all-integer, zero per-round Spark jobs.
    val (_, halfLoc) = cooccurLocal(docs, idCol, textCol, vocab)
    var half = halfLoc.map(e => (e._1, e._2))
    for (_ <- 1 to rounds) {
      val deg = scala.collection.mutable.Map.empty[String, Long]
      half.foreach { case (s, d) =>
        deg(s) = deg.getOrElse(s, 0L) + 1L
        deg(d) = deg.getOrElse(d, 0L) + 1L
      }
      val keep = deg.iterator.filter(_._2 >= k).map(_._1).toSet
      half = half.filter(e => keep.contains(e._1) && keep.contains(e._2))
    }
    val coreDeg = scala.collection.mutable.Map.empty[String, Long]
    half.foreach { case (s, d) =>
      coreDeg(s) = coreDeg.getOrElse(s, 0L) + 1L
      coreDeg(d) = coreDeg.getOrElse(d, 0L) + 1L
    }
    import docs.sparkSession.implicits._
    coreDeg.toSeq.toDF("token", "core_degree").orderBy("token")
  }

  /** Canonical (src < dst) STRONG edges of the co-occurrence graph:
    * tokens co-occurring in more than supNum/supDen of all documents
    * (the shared q328/q359/q370/q371/q372 gate — relative so it ports
    * across corpus sizes). One corpus pass inside [[cooccurGraph]];
    * the result is ≤ vocab²-bounded and checkpointed for the iterative
    * consumers.
    */
  private[ext] def strongHalf(docs: DataFrame, idCol: String,
                              textCol: String, vocab: Int,
                              supNum: Int, supDen: Int): DataFrame = {
    import docs.sparkSession.implicits._
    strongLocal(docs, idCol, textCol, vocab, supNum, supDen)
      .map(e => (e._1, e._2)).toSeq.toDF("src", "dst")
  }

  /** Maximal k-truss of the STRONG co-occurrence graph: the
    * triangle-reinforced cousin of [[kCore]] — an edge survives only
    * while it closes ≥ k−2 triangles with surviving edges, so a truss
    * certifies COHESION (every retained tie is multiply witnessed)
    * where a core only certifies degree. Strong edges are gated by
    * relative support c·supDen > supNum·|docs| (the q328 gate — an
    * absolute floor would not port across corpus sizes).
    *
    * Peeling loop: per round, common-neighbour support for every
    * surviving edge via the wedge join on the undirected edge list,
    * then drop edges below k−2; `rounds` caps the unrolled iterations
    * (removal is monotone, so any fixpoint reached early just repeats).
    * Output = surviving edges with their support in the FINAL edge set,
    * token-ordered.
    *
    * Scale shape: one corpus pass inside [[cooccurGraph]]; every round
    * runs on the ≤ vocab²-bounded edge table with a broadcast wedge
    * join and one localCheckpoint (flat plan, no lineage growth) —
    * the same at-scale contract as [[kCore]]/[[triangleStats]].
    */
  def kTruss(docs: DataFrame, idCol: String, textCol: String, vocab: Int,
             supNum: Int, supDen: Int, k: Int, rounds: Int): DataFrame = {
    require(k >= 3, s"k $k")
    require(rounds >= 1, s"rounds $rounds")
    // r16: the peel loop runs as plain Scala over the collected strong
    // graph ([[strongLocal]]) — per round, each surviving edge's
    // support is its endpoints' common-neighbour count in the CURRENT
    // edge set (the same wedge count as the old broadcast join),
    // all-integer, zero per-round Spark jobs.
    def support(h: Array[(String, String)])
    : Array[((String, String), Long)] = {
      val nbrs = scala.collection.mutable
        .Map.empty[String, scala.collection.mutable.Set[String]]
      h.foreach { case (s, d) =>
        nbrs.getOrElseUpdate(s,
          scala.collection.mutable.Set.empty[String]) += d
        nbrs.getOrElseUpdate(d,
          scala.collection.mutable.Set.empty[String]) += s
      }
      h.map { case (s, d) =>
        (s, d) -> nbrs(s).iterator.count(nbrs(d).contains).toLong }
    }
    var half = strongLocal(docs, idCol, textCol, vocab, supNum, supDen)
      .map(e => (e._1, e._2))
    for (_ <- 1 to rounds) {
      half = support(half).filter(_._2 >= k - 2).map(_._1)
    }
    import docs.sparkSession.implicits._
    support(half).map { case ((s, d), sup) => (s, d, sup) }.toSeq
      .toDF("src", "dst", "support")
      .orderBy("src", "dst")
  }

  /** Rich-club coefficient φ(k) = 2·E_k / (N_k(N_k−1)) of the strong
    * co-occurrence graph for each degree threshold in `ks`: do the
    * best-connected tokens preferentially tie to EACH OTHER (club) or
    * only fan out to the periphery? The global complement of the
    * per-node degree view ([[kCore]]) and the mixing view (q276
    * assortativity). Everything after [[strongHalf]]'s corpus pass is
    * vocab²-bounded: degree fold, threshold cross join, one filtered
    * edge count per k. φ is NULL when fewer than 2 nodes clear k.
    */
  def richClub(docs: DataFrame, idCol: String, textCol: String,
               vocab: Int, supNum: Int, supDen: Int,
               ks: Seq[Int]): DataFrame = {
    // r16: degree fold + per-k counts run as plain Scala over the
    // collected strong graph ([[strongLocal]]) — all-integer; φ's
    // division stays in Spark (identical expression tree).
    val half = strongLocal(docs, idCol, textCol, vocab, supNum, supDen)
      .map(e => (e._1, e._2))
    val deg = scala.collection.mutable.Map.empty[String, Long]
    half.foreach { case (s, d) =>
      deg(s) = deg.getOrElse(s, 0L) + 1L
      deg(d) = deg.getOrElse(d, 0L) + 1L
    }
    import docs.sparkSession.implicits._
    ks.map { k =>
      val nNodes = deg.valuesIterator.count(_ > k).toLong
      val nEdges = half.count(e =>
        deg(e._1) > k && deg(e._2) > k).toLong
      (k.toLong, nNodes, nEdges)
    }.toDF("k", "n_nodes", "n_edges")
      .withColumn("phi",
        when(col("n_nodes") >= 2L,
          lit(2.0) * col("n_edges").cast("double") /
            (col("n_nodes").cast("double") *
              (col("n_nodes") - 1L).cast("double"))))
      .orderBy("k")
  }

  /** All-pairs shortest-path histogram of the strong co-occurrence
    * graph: (distance, pair count) over canonical unordered pairs —
    * the global-structure summary (diameter = max row, mean path
    * length = weighted mean) completing single-source BFS (q110).
    * Bounded min-plus relaxation: `rounds` frontier extensions reach
    * every distance ≤ rounds+1 (the strong graph's diameter is 3 at
    * the tested SFs; unreached pairs at the cap would simply be
    * absent, documented). Each round runs on the ≤ vocab² distance
    * table with a broadcast edge join + localCheckpoint.
    */
  def distanceHistogram(docs: DataFrame, idCol: String, textCol: String,
                        vocab: Int, supNum: Int, supDen: Int,
                        rounds: Int): DataFrame = {
    require(rounds >= 1, s"rounds $rounds")
    val (_, dists) = apspLocal(
      strongLocal(docs, idCol, textCol, vocab, supNum, supDen)
        .map(e => (e._1, e._2)), rounds + 1L)
    import docs.sparkSession.implicits._
    dists.filter(t => t._1 < t._2)
      .groupBy(_._3).map { case (d, xs) => (d, xs.length.toLong) }.toSeq
      .toDF("dist", "n_pairs")
      .orderBy("dist")
  }

  /** BFS distance table (u, v, d) between DISTINCT nodes of the
    * collected strong graph, capped at `maxD` — the driver-side (r16)
    * twin of the old bounded min-plus relaxation (`rounds` relaxations
    * reach every distance ≤ rounds+1; farther pairs are simply absent,
    * the same contract), shared by [[distanceHistogram]] (q371/q396)
    * and [[eccentricityProfile]] (q407). The old relaxation's
    * d(u,u)=2 self rows are not emitted — both consumers filtered them
    * out anyway.
    */
  private def apspLocal(strong: Array[(String, String)], maxD: Long)
  : (Array[String], Array[(String, String, Long)]) = {
    val nbrs = scala.collection.mutable.Map.empty[String, List[String]]
    strong.foreach { case (s, d) =>
      nbrs(s) = d :: nbrs.getOrElse(s, Nil)
      nbrs(d) = s :: nbrs.getOrElse(d, Nil)
    }
    val nodes = nbrs.keysIterator.toArray.sorted
    val out = scala.collection.mutable
      .ArrayBuffer.empty[(String, String, Long)]
    nodes.foreach { s =>
      val dist = scala.collection.mutable.Map(s -> 0L)
      var frontier: List[String] = List(s)
      var dcur = 0L
      while (frontier.nonEmpty && dcur < maxD) {
        dcur += 1L
        val nf = scala.collection.mutable.ListBuffer.empty[String]
        frontier.foreach(u => nbrs(u).foreach { w =>
          if (!dist.contains(w)) { dist(w) = dcur; nf += w }
        })
        frontier = nf.toList
      }
      dist.foreach { case (v, d) => if (v != s) out += ((s, v, d)) }
    }
    (nodes, out.toArray)
  }

  /** Eccentricity profile of the strong graph: per node the greatest
    * shortest-path distance to any reachable node, plus integer flags
    * for CENTER membership (ecc = radius, the graph's best "broadcast
    * sources") and PERIPHERY membership (ecc = diameter) — the
    * node-level decomposition of the q371 census whose max/min the
    * Wiener/efficiency summaries (q396) collapse. All integer; the
    * radius/diameter scalars broadcast onto the vocab-bounded
    * eccentricity table.
    */
  def eccentricityProfile(docs: DataFrame, idCol: String, textCol: String,
                          vocab: Int, supNum: Int, supDen: Int,
                          rounds: Int): DataFrame = {
    require(rounds >= 1, s"rounds $rounds")
    // r16 driver-side ([[apspLocal]]): self rows never exist here, so
    // the q407 self-distance fix (drop d(u,u)=2 before the max — a node
    // adjacent to ALL others has true ecc 1) is structural. Every
    // non-isolated node keeps its eccentricity; radius/diameter flags
    // are exact integer comparisons.
    val (_, dists) = apspLocal(
      strongLocal(docs, idCol, textCol, vocab, supNum, supDen)
        .map(e => (e._1, e._2)), rounds + 1L)
    val ecc = dists.groupBy(_._1).map { case (u, xs) =>
      u -> xs.map(_._3).max }
    import docs.sparkSession.implicits._
    if (ecc.isEmpty)
      Seq.empty[(String, Long, Long, Long)]
        .toDF("token", "ecc", "is_center", "is_periphery")
    else {
      val radius = ecc.valuesIterator.min
      val diameter = ecc.valuesIterator.max
      ecc.toSeq.map { case (t, e) =>
        (t, e, if (e == radius) 1L else 0L,
          if (e == diameter) 1L else 0L)
      }.toDF("token", "ecc", "is_center", "is_periphery")
        .orderBy("token")
    }
  }

  /** Bounded-horizon Katz centrality on the strong co-occurrence
    * graph: katz(i) = Σ_{r=1..rounds} α^r · walks_r(i), the
    * attenuated-walk member between degree (r=1 exactly) and the
    * eigenvector family (PageRank q108/q196, HITS q275). Walk counts
    * are EXACT integers (p_r = A·p_{r−1}, p_0 = 1), so the score is a
    * literal chain of α powers over longs — both engines assemble
    * identical doubles; α^r literals are emitted by the caller's
    * oracle from the same constant. Each of the `rounds` products is
    * a broadcast join on the ≤ vocab² edge table.
    */
  def katzCentrality(docs: DataFrame, idCol: String, textCol: String,
                     vocab: Int, supNum: Int, supDen: Int,
                     alphaNum: Int, alphaDen: Int,
                     rounds: Int): DataFrame = {
    require(rounds >= 1 && rounds <= 8, s"rounds $rounds")
    // r16: the exact-integer walk counts (p_r = A·p_{r−1}, p_0 = 1)
    // run as plain Scala over the collected strong graph
    // ([[strongLocal]]); each per-round term α^r·w is the same single
    // IEEE multiply as before, and the cross-round decimal(30,8) sum +
    // double cast stays in Spark — the identical assembly tree.
    val dirEdges = strongLocal(docs, idCol, textCol, vocab, supNum,
        supDen)
      .flatMap(e => Seq((e._1, e._2), (e._2, e._1)))
    val nodeArr = dirEdges.map(_._1).distinct.sorted
    var p: Map[String, Long] = nodeArr.map(_ -> 1L).toMap
    val terms = scala.collection.mutable
      .ArrayBuffer.empty[(String, Double)]
    val alpha = alphaNum.toDouble / alphaDen
    for (r <- 1 to rounds) {
      val nxt = scala.collection.mutable.Map.empty[String, Long]
      dirEdges.foreach { case (src, dst) =>
        p.get(src).foreach(w => nxt(dst) = nxt.getOrElse(dst, 0L) + w)
      }
      p = nxt.toMap
      val ar = math.pow(alpha, r)
      p.foreach { case (t, w) => terms += ((t, ar * w.toDouble)) }
    }
    import docs.sparkSession.implicits._
    val nodes = nodeArr.toSeq.toDF("t")
    val acc = terms.toSeq.toDF("t", "x")
    nodes.join(acc.groupBy("t").agg(
        sum(col("x").cast("decimal(30,8)")).cast("double").as("katz")),
      Seq("t"), "left")
      .select(col("t").as("token"),
        coalesce(col("katz"), lit(0.0)).as("katz"))
      .orderBy("token")
  }

  /** Degree assortativity of the STRONG co-occurrence graph: the
    * Pearson correlation of endpoint degrees over the DIRECTED edge
    * list (each undirected edge counted in both orientations, Newman
    * 2002). Hubs-link-to-hubs reads r > 0; a hub-and-spoke periphery
    * reads r < 0 — the one-number mixing summary that rich-club
    * (q370, a curve) refines. By the symmetry of the directed list
    * Σj = Σk and Σj² = Σk², so the sqrt in Pearson's denominator
    * cancels and r = (m·Σjk − (Σj)²) / (m·Σj² − (Σj)²) is ONE exact
    * integer ratio (decimal(38,0) sums, one final double division).
    *
    * Scale shape: one corpus pass in [[cooccurGraph]]; degrees are a
    * groupBy on the ≤ vocab²-bounded edge table and both joins
    * broadcast the bounded degree table.
    */
  def degreeAssortativity(docs: DataFrame, idCol: String, textCol: String,
                          vocab: Int, supNum: Int,
                          supDen: Int): DataFrame = {
    // r16: degrees fold as plain Scala over the collected strong graph
    // ([[strongLocal]]); the exact decimal(38,0) endpoint-degree sums
    // and the one final double division stay in Spark over the
    // ≤ vocab²-row LocalRelation of (du, dv) — identical expressions.
    val dirEdges = strongLocal(docs, idCol, textCol, vocab, supNum,
        supDen)
      .flatMap(e => Seq((e._1, e._2), (e._2, e._1)))
    val deg = dirEdges.groupBy(_._1).map { case (t, es) =>
      t -> es.length.toLong }
    import docs.sparkSession.implicits._
    val e = dirEdges.map { case (s, d) => (deg(s), deg(d)) }.toSeq
      .toDF("du", "dv")
    val m = e.agg(count(lit(1)).as("m"),
      sum(col("du").cast("decimal(38,0)")).as("sj"),
      sum(col("du").cast("decimal(38,0)") * col("dv")).as("sjk"),
      sum(col("du").cast("decimal(38,0)") * col("du")).as("sjj"))
    val nn = Seq(Tuple1(deg.size.toLong)).toDF("n_nodes")
    m.crossJoin(broadcast(nn))
      .select(col("n_nodes"), (expr("m div 2")).as("n_edges"),
        ((col("m") * col("sjk") - col("sj") * col("sj")).cast("double") /
          (col("m") * col("sjj") - col("sj") * col("sj")).cast("double"))
          .as("assortativity"))
  }

  /** Per-node local clustering of the STRONG co-occurrence graph:
    * cc(v) = 2·t(v) / (deg(v)·(deg(v)−1)) over nodes with deg ≥ 2,
    * where t(v) counts edges AMONG v's neighbours — the local texture
    * (Watts–Strogatz) that [[triangleStats]]' single global
    * transitivity averages away (the two disagree exactly when
    * triangles concentrate on hubs). One wedge join keyed on the
    * centre vertex, each wedge closed against the canonical edge list;
    * every cc is ONE deterministic double division, and the mean rides
    * the dsum rail.
    *
    * Scale shape: one corpus pass in [[cooccurGraph]]; wedges and the
    * closing join live on the ≤ vocab²-bounded edge table, edges
    * broadcast.
    */
  def localClustering(docs: DataFrame, idCol: String, textCol: String,
                      vocab: Int, supNum: Int, supDen: Int): DataFrame = {
    // r16: wedge counting runs as plain Scala over the collected strong
    // graph ([[strongLocal]]) — all-integer (t, deg, tv); each cc
    // division and the dsum-rail mean stay in Spark over the
    // ≤ vocab-row LocalRelation (identical expressions).
    val halfLoc = strongLocal(docs, idCol, textCol, vocab, supNum,
        supDen)
      .map(e => (e._1, e._2))
    val nbrsM = scala.collection.mutable
      .Map.empty[String, List[String]]
    halfLoc.foreach { case (s, d) =>
      nbrsM(s) = d :: nbrsM.getOrElse(s, Nil)
      nbrsM(d) = s :: nbrsM.getOrElse(d, Nil)
    }
    val adj = halfLoc.toSet
    import docs.sparkSession.implicits._
    val ccIn = nbrsM.iterator.map { case (t, ns) =>
      val sortedNs = ns.sorted.toArray
      var tv = 0L
      var i = 0
      while (i < sortedNs.length) {
        var j = i + 1
        while (j < sortedNs.length) {
          if (adj.contains((sortedNs(i), sortedNs(j)))) tv += 1L
          j += 1
        }
        i += 1
      }
      (t, ns.length.toLong, if (tv > 0L) Some(tv) else None)
    }.toSeq
    val cc = ccIn.toDF("t", "deg", "tv")
      .filter(col("deg") >= 2L)
      .select(col("t"),
        (lit(2.0) * coalesce(col("tv"), lit(0L)).cast("double") /
          (col("deg").cast("double") * (col("deg") - 1L).cast("double")))
          .as("cc"))
    cc.agg(count(lit(1)).as("n_nodes"),
      Parity.dsum(col("cc")).as("sum_cc"),
      max(col("cc")).as("max_cc"))
      .select(col("n_nodes"),
        (col("sum_cc") / col("n_nodes").cast("double")).as("mean_local_cc"),
        col("max_cc"))
  }

  /** Positional phrase search: documents containing `t1` immediately
    * followed by `t2`, with hit counts and the first match position
    * (1-based). The positional-inverted-index query: where [[bm25]] and
    * keyword search treat documents as bags, this one needs token
    * ADJACENCY.
    *
    * Single corpus pass: tokenize with positions, keep only the two
    * query terms, and test adjacency with `lead` over (doc, pos) — if
    * the next RETAINED posting sits at pos+1 with the right token, the
    * corpus had the phrase (any dropped token in between breaks the
    * +1). Handles t1 = t2 ("order order") and overlapping runs
    * correctly: each phrase start is its own posting pair.
    *
    * Scale shape: the filter lands before the one shuffle (window by
    * doc id over the two terms' postings only — df(t1)+df(t2) rows,
    * not the corpus); at 100 TB this is the classic positional-postings
    * merge, distributed by document.
    */
  def phraseSearch(docs: DataFrame, idCol: String, textCol: String,
                   t1: String, t2: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val toks = docs.select(col(idCol).as("doc_id"),
      posexplode(TextStats.tokens(col(textCol))).as(Seq("pos0", "token")))
      .select(col("doc_id"), (col("pos0") + 1).cast("long").as("pos"),
        col("token"))
    val w = Window.partitionBy("doc_id").orderBy("pos")
    toks.filter(col("token").isin(t1, t2))
      .withColumn("ntok", lead("token", 1).over(w))
      .withColumn("npos", lead("pos", 1).over(w))
      .filter(col("token") === t1 && col("ntok") === t2 &&
        col("npos") === col("pos") + 1)
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_hits"), min("pos").as("first_pos"))
      .orderBy("doc_id")
  }

  /** Stress centrality of the strong co-occurrence graph (Shimbel
    * 1953): stress(w) = Σ_{s<t, w∉{s,t}} σ_st(w), the NUMBER of
    * shortest s–t paths passing through w — the all-integer member of
    * the betweenness family (betweenness divides each term by σ_st;
    * stress keeps the raw count, so the whole computation is exact
    * BIGINT arithmetic end to end, no fraction accumulation).
    *
    * Path counts come from a level-synchronous multi-source BFS: the
    * round-r frontier is (frontier ⋈ edges) minus everything already
    * visited, with σ summed over same-level parents — the textbook
    * σ(s,v) = Σ_{u ∈ pred(v)} σ(s,u) recurrence, unrolled `rounds`
    * times (≥ the graph's diameter; q371 measured 3). Then
    * σ_st(w) = σ(s,w)·σ(w,t) whenever d(s,w)+d(w,t) = d(s,t), summed
    * by a three-way join over the shortest-path table.
    *
    * Scale shape: everything after [[strongHalf]]'s one corpus pass
    * runs on ≤ vocab²-bounded tables (paths ≤ vocab² rows, the triple
    * join ≤ vocab³ candidate rows), broadcast joins throughout, one
    * localCheckpoint per BFS level (flat plans, no lineage growth).
    */
  def stressCentrality(docs: DataFrame, idCol: String, textCol: String,
                       vocab: Int, supNum: Int, supDen: Int,
                       rounds: Int): DataFrame = {
    require(rounds >= 1 && rounds <= 8, s"rounds $rounds")
    // r16: the level-synchronous multi-source BFS (σ recurrence) and
    // the σ_st(w) = σ(s,w)·σ(w,t) fold run as plain Scala over the
    // collected strong graph ([[strongLocal]]) — exact BIGINT
    // arithmetic end to end, same `rounds` horizon, zero per-level
    // Spark jobs.
    val nbrs = scala.collection.mutable.Map.empty[String, List[String]]
    strongLocal(docs, idCol, textCol, vocab, supNum, supDen)
      .foreach { case (s, d, _) =>
        nbrs(s) = d :: nbrs.getOrElse(s, Nil)
        nbrs(d) = s :: nbrs.getOrElse(d, Nil)
      }
    val nodeArr = nbrs.keysIterator.toArray.sorted
    // dist(s)(v) / sig(s)(v) for d(s,v) ≤ rounds (the bounded horizon)
    val dist = scala.collection.mutable
      .Map.empty[String, scala.collection.mutable.Map[String, Long]]
    val sig = scala.collection.mutable
      .Map.empty[String, scala.collection.mutable.Map[String, Long]]
    nodeArr.foreach { s =>
      val ds = scala.collection.mutable.Map(s -> 0L)
      val ss = scala.collection.mutable.Map(s -> 1L)
      var frontier: List[String] = List(s)
      for (r <- 1 to rounds if frontier.nonEmpty) {
        val sigNew = scala.collection.mutable.Map.empty[String, Long]
        frontier.foreach(u => nbrs(u).foreach { w =>
          if (!ds.contains(w))
            sigNew(w) = sigNew.getOrElse(w, 0L) + ss(u)
        })
        sigNew.foreach { case (w, sw) => ds(w) = r.toLong; ss(w) = sw }
        frontier = sigNew.keysIterator.toList
      }
      dist(s) = ds
      sig(s) = ss
    }
    val stress = scala.collection.mutable.Map.empty[String, Long]
    nodeArr.foreach { w =>
      var acc = 0L
      val dw = dist(w)
      val sw = sig(w)
      nodeArr.foreach { s =>
        if (s != w && dist(s).contains(w)) {
          val d1 = dist(s)(w)
          val sig1 = sig(s)(w)
          nodeArr.foreach { t2 =>
            if (s < t2 && t2 != w && dw.contains(t2) &&
                dist(s).contains(t2) &&
                d1 + dw(t2) == dist(s)(t2))
              acc += sig1 * sw(t2)
          }
        }
      }
      if (acc > 0L) stress(w) = acc
    }
    import docs.sparkSession.implicits._
    nodeArr.map(t => (t, stress.getOrElse(t, 0L))).toSeq
      .toDF("token", "stress")
      .orderBy("token")
  }

  /** Borůvka maximum spanning forest of the strong co-occurrence graph
    * (Borůvka 1926 — THE parallel MST algorithm): per round, every
    * component claims its best incident cross-component edge under the
    * TOTAL order (c desc, src, dst), claimed edges join the forest, and
    * components re-merge by connected components of the forest so far;
    * ⌈log₂ V⌉ rounds span every component. Because the tie-broken edge
    * order is a strict total order, the forest is the UNIQUE
    * lexicographic-maximum spanning forest — Borůvka, Kruskal and Prim
    * all produce it, so the oracle's independently-unrolled rounds must
    * agree edge-for-edge, not just in weight.
    *
    * This is single-linkage clustering's backbone: cutting the forest's
    * lightest edges first replays the entire dendrogram of the
    * similarity graph, which is why a dedup pipeline wants the MSF and
    * not just fixed-threshold components (q45) — one artifact answers
    * every threshold.
    *
    * Scale shape: each round is ONE distributed job — tag cross edges
    * via broadcast label maps, per-component argmin via
    * partial-aggregating `min_by` (map-side combine, no window sort),
    * collect the ≤ #components chosen edges — plus a driver union-find
    * over that vocab-bounded chosen set (node state is a bounded
    * CONTROL table, the same class as the engine's centroid collects;
    * the r15 shape ran a star-contraction job chain per round and its
    * wall was pure job-scheduling fixed cost). No sequential EDGE scan
    * anywhere (Kruskal's sort-and-scan does not distribute; Borůvka is
    * the textbook cluster MST); every distributed table after the one
    * corpus pass is ≤ vocab²-bounded. For a DATA-sized graph, swap the
    * driver merge back to [[Dedup.dedupClustersStar]] (the q45 path) —
    * the round structure transfers unchanged.
    */
  def boruvkaForest(docs: DataFrame, idCol: String, textCol: String,
                    vocab: Int, supNum: Int, supDen: Int,
                    rounds: Int): DataFrame =
    boruvkaCore(docs, idCol, textCol, vocab, supNum, supDen, rounds)
      ._2.orderBy("src", "dst")

  /** Single-linkage dendrogram levels read off the [[boruvkaForest]]:
    * for every distinct forest weight `threshold`, the clustering at
    * similarity ≥ threshold keeps exactly the forest edges with
    * c ≥ threshold, so on a FOREST the cluster count is the CLOSED
    * FORM |V| − |{edges ≥ threshold}| — no per-level CC pass, one
    * cumulative window over the ≤ |V|−1 weight levels. This is the
    * payoff the MSF buys over fixed-threshold components (q45): one
    * artifact answers every threshold.
    */
  def dendrogramLevels(docs: DataFrame, idCol: String, textCol: String,
                       vocab: Int, supNum: Int, supDen: Int,
                       rounds: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val (nodes, forest) =
      boruvkaCore(docs, idCol, textCol, vocab, supNum, supDen, rounds)
    val lv = forest.groupBy(col("c").as("threshold"))
      .agg(count(lit(1)).as("n_at"))
    // ≤ |V|−1 weight levels: the bounded-grid global-order contract
    lv.withColumn("n_edges_kept",
        sum("n_at").over(graft.BoundedWindows.boundedWindow(
            desc("threshold"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .crossJoin(broadcast(nodes.agg(count(lit(1)).as("nn"))))
      .select(col("threshold"), col("n_edges_kept"),
        (col("nn") - col("n_edges_kept")).as("n_clusters"))
      .orderBy("threshold")
  }

  private def boruvkaCore(docs: DataFrame, idCol: String, textCol: String,
                          vocab: Int, supNum: Int, supDen: Int,
                          rounds: Int): (DataFrame, DataFrame) = {
    require(rounds >= 1 && rounds <= 8, s"rounds $rounds")
    // Spanning is guaranteed only when components can halve down to one
    // within the round budget: 2^rounds must cover every possible node
    // count (≤ vocab). The oracle's unrolled chain (dBoruvkaChain) has
    // the SAME bound baked into its reachability-squaring depth — a
    // vocab bump without a rounds bump would make both engines silently
    // agree on a truncated forest, so fail loudly here instead.
    require((1L << rounds) >= vocab,
      s"2^$rounds < vocab $vocab: Boruvka may not span; raise rounds")
    // r16: the whole round loop runs as plain Scala over the collected
    // strong graph ([[strongLocal]], a bounded control table like the
    // engine's centroid collects) — the r15 shape still ran one
    // distributed argmin job per round whose wall was pure scheduling
    // fixed cost. Per round, each component claims its best incident
    // cross edge under the SAME total order (c desc, src, dst) as the
    // old min_by struct (−c, src, dst); claimed edges are deduped and
    // components merge by canonical min label, so the forest is
    // edge-for-edge the old one (and the oracle's). For a DATA-sized
    // graph swap the merge back to star contraction
    // ([[Dedup.dedupClustersStar]], still the q45 path) — the round
    // structure transfers unchanged.
    val strong = strongLocal(docs, idCol, textCol, vocab, supNum, supDen)
    val nodeArr = strong.flatMap(e => Seq(e._1, e._2)).distinct.sorted
    val labels = scala.collection.mutable.Map[String, String]()
    nodeArr.foreach(t => labels(t) = t)
    val forestBuf = scala.collection.mutable.ArrayBuffer
      .empty[(String, String, Long)]
    var done = labels.isEmpty
    val pickOrd = Ordering.by((e: (String, String, Long)) =>
      (-e._3, e._1, e._2))
    for (_ <- 1 to rounds if !done) {
      val cross = strong.filter(e => labels(e._1) != labels(e._2))
      if (cross.isEmpty) done = true // spanning: later rounds are no-ops
      else {
        // each cross edge is offered to BOTH endpoint components
        val chosen = cross
          .flatMap(e => Seq(labels(e._1) -> e, labels(e._2) -> e))
          .groupBy(_._1).valuesIterator
          .map(offers => offers.map(_._2).min(pickOrd)).toArray
        forestBuf ++= chosen.distinct
        chosen.foreach { e =>
          val (la, lb) = (labels(e._1), labels(e._2))
          if (la != lb) {
            val (keep, drop) = if (la < lb) (la, lb) else (lb, la)
            labels.mapValuesInPlace((_, v) => if (v == drop) keep else v)
          }
        }
      }
    }
    import docs.sparkSession.implicits._
    val nodes = nodeArr.toSeq.toDF("t")
    val forest = forestBuf.toSeq.toDF("src", "dst", "c")
    (nodes, forest)
  }
}
