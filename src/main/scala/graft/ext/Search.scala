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
    val dt = docs.select(col(idCol).as("doc_id"),
      explode(TextStats.tokens(col(textCol))).as("token")).distinct()
    val v = dt.groupBy("token").agg(count(lit(1)).as("df"))
      .orderBy(desc("df"), col("token")).limit(vocab)
      .localCheckpoint()
    val vt = dt.join(broadcast(v.select("token")), "token")
    val half = vt.select(col("doc_id"), col("token").as("src"))
      .join(vt.select(col("doc_id"), col("token").as("dst")), Seq("doc_id"))
      .filter(col("src") < col("dst"))
      .groupBy("src", "dst").agg(count(lit(1)).as("c"))
    val edges = half.union(
      half.select(col("dst").as("src"), col("src").as("dst"), col("c")))
      .localCheckpoint()
    (v, edges)
  }

  def textRank(docs: DataFrame, idCol: String, textCol: String,
               vocab: Int, dampNum: Int, dampDen: Int, iters: Int,
               scale: Long): DataFrame = {
    require(dampNum >= 0 && dampNum <= dampDen, s"damping $dampNum/$dampDen")
    require(iters >= 1, s"iters $iters")
    val (vFull, edges) = cooccurGraph(docs, idCol, textCol, vocab)
    val v = vFull.select("token")
    // edge table is ≤ vocab² rows — checkpoint the weighted form too:
    // the rank loop below then runs on one flat table
    val ew = edges.join(edges.groupBy("src").agg(sum("c").as("w")), "src")
      .localCheckpoint()
    val vN = v.crossJoin(broadcast(v.agg(count(lit(1)).as("n_nodes"))))
      .localCheckpoint()
    var r = vN.select(col("token"), expr(s"${scale}L div n_nodes").as("r"))
    for (_ <- 1 to iters) {
      val contrib = ew
        .join(broadcast(r.withColumnRenamed("token", "src")), "src")
        .select(col("dst"), expr("(r * c) div w").as("contrib"))
        .groupBy("dst").agg(sum("contrib").as("s"))
      r = vN
        .join(broadcast(contrib.withColumnRenamed("dst", "token")),
          Seq("token"), "left")
        .select(col("token"),
          (expr(s"(${dampDen - dampNum}L * ${scale}L) div " +
             s"(${dampDen}L * n_nodes)") +
           expr(s"(${dampNum}L * coalesce(s, 0L)) div ${dampDen}L"))
            .as("r"))
    }
    r.select(col("token"), col("r").as("rank_units"),
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
    val (vFull, edges) = cooccurGraph(docs, idCol, textCol, vocab)
    val ew = edges.join(edges.groupBy("src").agg(sum("c").as("w")), "src")
      .localCheckpoint()
    val seeded = vFull
      .crossJoin(broadcast(vFull.orderBy(desc("df"), col("token"))
        .limit(1).select(col("token").as("seed_token"))))
      .select(col("token"),
        (col("token") === col("seed_token")).as("is_seed"))
      .localCheckpoint()
    var r = seeded.select(col("token"),
      when(col("is_seed"), lit(scale)).otherwise(lit(0L)).as("r"))
    for (_ <- 1 to iters) {
      val contrib = ew
        .join(broadcast(r.withColumnRenamed("token", "src")), "src")
        .select(col("dst"), expr("(r * c) div w").as("contrib"))
        .groupBy("dst").agg(sum("contrib").as("s"))
      r = seeded
        .join(broadcast(contrib.withColumnRenamed("dst", "token")),
          Seq("token"), "left")
        .select(col("token"),
          (when(col("is_seed"),
            expr(s"(${dampDen - dampNum}L * ${scale}L) div ${dampDen}L"))
            .otherwise(lit(0L)) +
           expr(s"(${dampNum}L * coalesce(s, 0L)) div ${dampDen}L"))
            .as("r"))
    }
    r.select(col("token"), col("r").as("ppr_units"),
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
    val (v, edges) = cooccurGraph(docs, idCol, textCol, vocab)
    val source = v.orderBy(desc("df"), col("token")).limit(1)
      .select(col("token"), lit(0L).as("d0"))
    var d = v.select("token")
      .join(broadcast(source), Seq("token"), "left")
      .select(col("token"), coalesce(col("d0"), lit(BfsInf)).as("d"))
    for (_ <- 1 to iters) {
      val relax = edges
        .join(broadcast(d.select(col("token").as("src"), col("d").as("ds"))),
          "src")
        .groupBy("dst").agg(min(col("ds")).as("m"))
      d = d.join(broadcast(relax.withColumnRenamed("dst", "token")),
          Seq("token"), "left")
        .select(col("token"),
          least(col("d"), coalesce(col("m") + 1L, lit(BfsInf))).as("d"))
    }
    d.select(col("token"), when(col("d") < BfsInf, col("d")).as("hops"))
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
    val (v, edges) = cooccurGraph(docs, idCol, textCol, vocab)
    // canonical token-ordered undirected edges (one row per edge)
    val half = edges.filter(col("src") < col("dst")).select("src", "dst")
      .localCheckpoint()
    val deg = half.select(col("src").as("t"))
      .union(half.select(col("dst").as("t")))
      .groupBy("t").agg(count(lit(1)).as("deg"))
      .localCheckpoint()
    val lowFirst = (col("ds") < col("dd")) ||
      (col("ds") === col("dd") && col("src") < col("dst"))
    val oriented = half
      .join(broadcast(deg.select(col("t").as("src"), col("deg").as("ds"))),
        "src")
      .join(broadcast(deg.select(col("t").as("dst"), col("deg").as("dd"))),
        "dst")
      .select(when(lowFirst, col("src")).otherwise(col("dst")).as("u"),
        when(lowFirst, col("dst")).otherwise(col("src")).as("v"))
      .localCheckpoint()
    // both sides are ≤ vocab²-bounded — broadcast them so the census
    // never sort-merges (checkpointed frames lose the size stats the
    // planner would need to choose this itself)
    val triangles = oriented.as("e1")
      .join(broadcast(oriented.as("e2")),
        col("e1.u") === col("e2.u") && col("e1.v") < col("e2.v"))
      .join(broadcast(half.as("c")),
        col("c.src") === least(col("e1.v"), col("e2.v")) &&
          col("c.dst") === greatest(col("e1.v"), col("e2.v")))
      .agg(count(lit(1)).as("n_triangles"))
    val wedges = deg.agg(
      sum(expr("deg * (deg - 1) div 2")).cast("long").as("n_wedges"))
    v.agg(count(lit(1)).as("n_nodes"))
      .crossJoin(half.agg(count(lit(1)).as("n_edges")))
      .crossJoin(wedges)
      .crossJoin(triangles)
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
    val (_, edges) = cooccurGraph(docs, idCol, textCol, vocab)
    val ndocs = docs.agg(count(lit(1)).as("nd"))
    val nb = edges.crossJoin(broadcast(ndocs))
      .filter(col("c") * supDen > lit(supNum) * col("nd"))
      .select("src", "dst").localCheckpoint()
    val deg = nb.groupBy("src").agg(count(lit(1)).as("deg"))
    val cn = nb.select(col("src").as("a"), col("dst").as("w"))
      .join(nb.select(col("src").as("b"), col("dst").as("w")), Seq("w"))
      .filter(col("a") < col("b"))
      .groupBy("a", "b").agg(count(lit(1)).as("cn"))
    val existing = nb.filter(col("src") < col("dst"))
      .select(col("src").as("a"), col("dst").as("b"))
    cn.join(broadcast(existing), Seq("a", "b"), "left_anti")
      .join(broadcast(deg.select(col("src").as("a"), col("deg").as("da"))),
        Seq("a"))
      .join(broadcast(deg.select(col("src").as("b"), col("deg").as("db"))),
        Seq("b"))
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
    val (_, edges) = cooccurGraph(docs, idCol, textCol, vocab)
    var half = edges.filter(col("src") < col("dst")).select("src", "dst")
      .localCheckpoint(eager = true)
    for (_ <- 1 to rounds) {
      val keep = half.select(col("src").as("t"))
        .union(half.select(col("dst").as("t")))
        .groupBy("t").agg(count(lit(1)).as("deg"))
        .filter(col("deg") >= k).select("t")
      half = half
        .join(broadcast(keep.withColumnRenamed("t", "src")),
          Seq("src"), "left_semi")
        .join(broadcast(keep.withColumnRenamed("t", "dst")),
          Seq("dst"), "left_semi")
        .select("src", "dst")
        .localCheckpoint(eager = true)
    }
    half.select(col("src").as("token"))
      .union(half.select(col("dst").as("token")))
      .groupBy("token").agg(count(lit(1)).as("core_degree"))
      .orderBy("token")
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
    val (_, edges) = cooccurGraph(docs, idCol, textCol, vocab)
    val ndocs = docs.agg(count(lit(1)).as("nd"))
    edges.crossJoin(broadcast(ndocs))
      .filter(col("c") * supDen > lit(supNum) * col("nd"))
      .filter(col("src") < col("dst")).select("src", "dst")
      .localCheckpoint(eager = true)
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
    def support(half: DataFrame): DataFrame = {
      val nb = half.select("src", "dst").union(
        half.select(col("dst").as("src"), col("src").as("dst")))
      half.join(
        broadcast(nb.select(col("src").as("a"), col("dst").as("w"))
          .join(nb.select(col("src").as("b"), col("dst").as("w")),
            Seq("w"))
          .filter(col("a") < col("b"))
          .groupBy(col("a").as("src"), col("b").as("dst"))
          .agg(count(lit(1)).as("support"))),
        Seq("src", "dst"), "left")
        .select(col("src"), col("dst"),
          coalesce(col("support"), lit(0L)).as("support"))
    }
    var half = strongHalf(docs, idCol, textCol, vocab, supNum, supDen)
    for (_ <- 1 to rounds) {
      half = support(half).filter(col("support") >= k - 2)
        .select("src", "dst").localCheckpoint(eager = true)
    }
    support(half).orderBy("src", "dst")
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
    val half = strongHalf(docs, idCol, textCol, vocab, supNum, supDen)
    val deg = half.select(col("src").as("t"))
      .union(half.select(col("dst").as("t")))
      .groupBy("t").agg(count(lit(1)).as("deg"))
      .localCheckpoint(eager = true)
    val ksDf = half.sparkSession.range(1)
      .select(explode(array(ks.map(k => lit(k.toLong)): _*)).as("k"))
    val nk = deg.crossJoin(broadcast(ksDf))
      .filter(col("deg") > col("k"))
      .groupBy("k").agg(count(lit(1)).as("n_nodes"))
    val ek = half
      .join(broadcast(deg.select(col("t").as("src"),
        col("deg").as("ds"))), "src")
      .join(broadcast(deg.select(col("t").as("dst"),
        col("deg").as("dd"))), "dst")
      .crossJoin(broadcast(ksDf))
      .filter(col("ds") > col("k") && col("dd") > col("k"))
      .groupBy("k").agg(count(lit(1)).as("n_edges"))
    ksDf.join(nk, Seq("k"), "left").join(ek, Seq("k"), "left")
      .select(col("k"), coalesce(col("n_nodes"), lit(0L)).as("n_nodes"),
        coalesce(col("n_edges"), lit(0L)).as("n_edges"))
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
    apspDistances(docs, idCol, textCol, vocab, supNum, supDen, rounds)
      .filter(col("u") < col("v"))
      .groupBy(col("d").as("dist")).agg(count(lit(1)).as("n_pairs"))
      .orderBy("dist")
  }

  /** Min-plus relaxed all-pairs distance table (u, v, d) of the strong
    * graph, `rounds` rounds (reaches every distance ≤ rounds+1) — the
    * shared core of [[distanceHistogram]] (q371) and
    * [[eccentricityProfile]] (q407).
    */
  private def apspDistances(docs: DataFrame, idCol: String,
                            textCol: String, vocab: Int, supNum: Int,
                            supDen: Int, rounds: Int): DataFrame = {
    val half = strongHalf(docs, idCol, textCol, vocab, supNum, supDen)
    val nb = half.union(
      half.select(col("dst").as("src"), col("src").as("dst")))
      .localCheckpoint(eager = true)
    var dist = nb.select(col("src").as("u"), col("dst").as("v"),
      lit(1L).as("d")).localCheckpoint(eager = true)
    for (_ <- 1 to rounds) {
      val ext = dist
        .join(broadcast(nb.select(col("src").as("v"),
          col("dst").as("w"))), Seq("v"))
        .select(col("u"), col("w").as("v"), (col("d") + 1L).as("d"))
      dist = dist.union(ext).groupBy("u", "v").agg(min("d").as("d"))
        .localCheckpoint(eager = true)
    }
    dist
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
    // Relaxation manufactures d(u,u)=2 for every non-isolated node (the
    // seed table has no self rows, but u→w→u round trips do), which
    // would floor every eccentricity at 2 — a node adjacent to ALL
    // others has true ecc 1. Self rows are not shortest-path facts, so
    // drop them before the max. Every node keeps ≥1 row: seeding from
    // edges gives each node in nb a d(u, neighbor)=1 entry.
    val ecc = apspDistances(docs, idCol, textCol, vocab, supNum, supDen,
      rounds)
      .filter(col("u") =!= col("v"))
      .groupBy(col("u").as("token")).agg(max("d").as("ecc"))
    ecc.crossJoin(broadcast(ecc.agg(min("ecc").as("radius"),
        max("ecc").as("diameter"))))
      .select(col("token"), col("ecc"),
        (col("ecc") === col("radius")).cast("long").as("is_center"),
        (col("ecc") === col("diameter")).cast("long").as("is_periphery"))
      .orderBy("token")
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
    val half = strongHalf(docs, idCol, textCol, vocab, supNum, supDen)
    val nb = half.union(
      half.select(col("dst").as("src"), col("src").as("dst")))
      .localCheckpoint(eager = true)
    val nodes = nb.select(col("src").as("t")).distinct()
      .localCheckpoint(eager = true)
    var p = nodes.select(col("t"), lit(1L).as("w"))
    var acc: DataFrame = null
    val alpha = alphaNum.toDouble / alphaDen
    for (r <- 1 to rounds) {
      p = nb.join(broadcast(p.select(col("t").as("src"), col("w"))),
          Seq("src"))
        .groupBy(col("dst").as("t")).agg(sum("w").as("w"))
        .localCheckpoint(eager = true)
      val term = p.select(col("t"),
        (lit(math.pow(alpha, r)) * col("w").cast("double")).as("x"))
      acc = if (acc == null) term else acc.union(term)
    }
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
    val half = strongHalf(docs, idCol, textCol, vocab, supNum, supDen)
    val nb = half.union(
      half.select(col("dst").as("src"), col("src").as("dst")))
      .localCheckpoint(eager = true)
    val deg = nb.groupBy(col("src").as("t"))
      .agg(count(lit(1)).as("deg"))
      .localCheckpoint(eager = true)
    val e = nb
      .join(broadcast(deg.select(col("t").as("src"), col("deg").as("du"))),
        "src")
      .join(broadcast(deg.select(col("t").as("dst"), col("deg").as("dv"))),
        "dst")
    val m = e.agg(count(lit(1)).as("m"),
      sum(col("du").cast("decimal(38,0)")).as("sj"),
      sum(col("du").cast("decimal(38,0)") * col("dv")).as("sjk"),
      sum(col("du").cast("decimal(38,0)") * col("du")).as("sjj"))
    val nn = deg.agg(count(lit(1)).as("n_nodes"))
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
    val half = strongHalf(docs, idCol, textCol, vocab, supNum, supDen)
      .localCheckpoint(eager = true) // wedge + closing joins re-read it
    val nb = half.union(
      half.select(col("dst").as("src"), col("src").as("dst")))
      .localCheckpoint(eager = true)
    val deg = nb.groupBy(col("src").as("t"))
      .agg(count(lit(1)).as("deg"))
    // wedges centred at v: unordered neighbour pairs (a < b), closed
    // iff (a, b) is itself a canonical strong edge
    val tri = nb.select(col("src").as("v"), col("dst").as("a"))
      .join(nb.select(col("src").as("v"), col("dst").as("b")), "v")
      .filter(col("a") < col("b"))
      .join(broadcast(half.select(col("src").as("a"), col("dst").as("b"),
        lit(1L).as("closed"))), Seq("a", "b"))
      .groupBy(col("v").as("t")).agg(count(lit(1)).as("tv"))
    val cc = deg.filter(col("deg") >= 2L)
      .join(tri, Seq("t"), "left")
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
    val half = strongHalf(docs, idCol, textCol, vocab, supNum, supDen)
    val nb = half.union(
      half.select(col("dst").as("src"), col("src").as("dst")))
      .localCheckpoint(eager = true)
    val nodes = nb.select(col("src").as("t")).distinct()
      .localCheckpoint(eager = true)
    var vis = nodes.select(col("t").as("s"), col("t").as("v"),
      lit(0L).as("d"), lit(1L).as("sigma")).localCheckpoint(eager = true)
    var frontier = vis
    for (r <- 1 to rounds) {
      val nf = frontier
        .join(broadcast(nb.select(col("src").as("v"), col("dst").as("w"))),
          Seq("v"))
        .groupBy(col("s"), col("w").as("v"))
        .agg(sum("sigma").as("sigma"))
        .join(vis.select("s", "v"), Seq("s", "v"), "left_anti")
        .select(col("s"), col("v"), lit(r.toLong).as("d"), col("sigma"))
        .localCheckpoint(eager = true)
      vis = vis.unionByName(nf).localCheckpoint(eager = true)
      frontier = nf
    }
    val sp = vis.filter(col("s") =!= col("v"))
      .localCheckpoint(eager = true)
    val thru = sp.select(col("s"), col("v").as("w"),
        col("d").as("d1"), col("sigma").as("sig1"))
      .join(broadcast(sp.select(col("s").as("w"), col("v").as("t2"),
        col("d").as("d2"), col("sigma").as("sig2"))), Seq("w"))
      .join(broadcast(sp.select(col("s"), col("v").as("t2"),
        col("d").as("dst"))), Seq("s", "t2"))
      .filter(col("s") < col("t2") && col("w") =!= col("s") &&
        col("w") =!= col("t2") && col("d1") + col("d2") === col("dst"))
      .groupBy("w").agg(sum(col("sig1") * col("sig2")).as("stress"))
    nodes.join(broadcast(thru), nodes("t") === thru("w"), "left")
      .select(col("t").as("token"),
        coalesce(col("stress"), lit(0L)).as("stress"))
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
    val (_, edges) = cooccurGraph(docs, idCol, textCol, vocab)
    val ndocs = docs.agg(count(lit(1)).as("nd"))
    val strong = edges.crossJoin(broadcast(ndocs))
      .filter(col("c") * supDen > lit(supNum) * col("nd"))
      .filter(col("src") < col("dst")).select("src", "dst", "c")
      .localCheckpoint(eager = true)
    val nodes = strong.select(col("src").as("t"))
      .union(strong.select(col("dst").as("t"))).distinct()
      .localCheckpoint(eager = true)
    // Node STATE (labels) is ≤ vocab rows — the same bounded
    // control-table class as the k-means centroid collects the engine
    // already drivers — so labels live on the driver and each round's
    // label map rides a broadcast join. This collapses a round from
    // window-argmin + an O(log) star-contraction job CHAIN + a label
    // join (the r15 shape; its wall was driver-scheduled tiny-job fixed
    // cost, SCALE.md addendum) to ONE distributed job: tag cross edges,
    // per-component argmin via partial-aggregating min_by (no window
    // sort), collect the ≤ #components chosen edges, and merge
    // components by union-find on the driver. The EDGE table stays
    // distributed (vocab²-bounded ≠ vocab-bounded); for a DATA-sized
    // graph swap the driver merge back to star contraction
    // ([[Dedup.dedupClustersStar]], still the q45 path) — everything
    // else transfers unchanged.
    import docs.sparkSession.implicits._
    val labels = scala.collection.mutable.Map[String, String]()
    nodes.collect().foreach(r => labels(r.getString(0)) = r.getString(0))
    val forestBuf = scala.collection.mutable.ArrayBuffer
      .empty[(String, String, Long)]
    var done = labels.isEmpty
    for (_ <- 1 to rounds if !done) {
      val labelDf = labels.toSeq.toDF("t", "comp") // LocalRelation: no job
      val e = strong
        .join(broadcast(labelDf.select(col("t").as("src"),
          col("comp").as("la"))), "src")
        .join(broadcast(labelDf.select(col("t").as("dst"),
          col("comp").as("lb"))), "dst")
        .filter(col("la") =!= col("lb"))
      // each cross edge is offered to BOTH endpoint components; argmin
      // under the total order (c desc, src, dst) = min_by over the
      // struct (−c, src, dst) — unique per component (edges are
      // distinct), so the pick is deterministic and identical to the
      // r15 rank-window's rn = 1
      val offers = e.select(col("la").as("comp"), col("src"), col("dst"),
          col("c"), col("la"), col("lb"))
        .union(e.select(col("lb").as("comp"), col("src"), col("dst"),
          col("c"), col("la"), col("lb")))
      val chosen = offers.groupBy("comp")
        .agg(min_by(struct(col("src"), col("dst"), col("c"), col("la"),
          col("lb")), struct((-col("c")).as("nc"), col("src"),
          col("dst"))).as("m"))
        .select(col("m.src"), col("m.dst"), col("m.c"), col("m.la"),
          col("m.lb"))
        .collect()
      if (chosen.isEmpty) done = true // spanning: later rounds are no-ops
      else {
        // dedupe on the driver (both endpoint components may claim the
        // same edge), then merge components; labels stay canonical
        // (min member) so the groupBy key partition matches star
        // contraction's exactly
        val picked = chosen.map(r => (r.getString(0), r.getString(1),
          r.getLong(2))).distinct
        forestBuf ++= picked
        chosen.foreach { r =>
          val (la, lb) = (labels(r.getString(0)), labels(r.getString(1)))
          if (la != lb) {
            val (keep, drop) = if (la < lb) (la, lb) else (lb, la)
            labels.mapValuesInPlace((_, v) => if (v == drop) keep else v)
          }
        }
      }
    }
    val forest =
      if (forestBuf.isEmpty)
        strong.filter(lit(false)).select("src", "dst", "c")
      else forestBuf.toSeq.toDF("src", "dst", "c")
    (nodes, forest)
  }
}
