package graft

import java.sql.Date

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.BoundedWindows.boundedWindow
import graft.etl.Scd2
import graft.ext.{Curation, Dedup, Multimodal, Shingles, Similarity, TextStats}
import graft.functions.Parity._
import graft.mart.Mart

/** Training-data-pipeline operators (dedup family, similarity search,
  * text analysis, multimodal plumbing, as-of join, JSON, percentiles).
  *
  * The dedup/fingerprint oracle SQL is GENERATED from the same
  * [[Params]] constants as the Spark implementations, and the hash family
  * is md5-as-hex (portable across engines), so even MinHash signatures
  * hash-match DuckDB exactly.
  */
object QueriesExt {

  private def t(s: org.apache.spark.sql.SparkSession, dir: String, n: String) =
    Tables.load(s, dir, n)

  /** CPU-heavy per-row pipelines (hashing, dot products) need the map
    * stage spread across cores even when the input arrives as one split
    * (the local testdata is single-row-group parquet ⇒ one scan task). A
    * round-robin repartition of the raw rows is one cheap shuffle that
    * unlocks full parallelism; on a cluster where the source already has
    * thousands of splits, AQE coalesces it into a near-no-op.
    */
  private def tPar(s: org.apache.spark.sql.SparkSession, dir: String,
                   n: String) =
    Tables.load(s, dir, n).repartition(s.sparkContext.defaultParallelism)

  import Params._

  // ── DuckDB SQL fragment builders (kept in lockstep with Spark ops) ──
  private val dTok = "list_filter(string_split(text, ' '), t -> len(t) > 0)"
  private val dTokLower =
    "list_filter(string_split(lower(text), ' '), t -> len(t) > 0)"
  private def dShingles(tk: String, k: Int): String =
    s"""CASE WHEN len($tk) <= $k THEN [array_to_string($tk, ' ')]
       ELSE list_transform(range(1, len($tk) - ${k - 1} + 1),
         i -> array_to_string($tk[i:i+${k - 1}], ' ')) END"""
  private def dSeedHash(seed: Int, s: String) = s"md5('$seed|' || $s)"
  private def dMinHash(sh: String, seed: Int) =
    s"list_aggregate(list_transform($sh, s -> ${dSeedHash(seed, "s")}), 'min')"
  // numeric MinHash twins of Shingles.baseHash/minHashSignature
  private def dBaseHash(sh: String) =
    s"list_transform($sh, s -> ('0x' || substr(md5(s), 1, 7))::BIGINT)"
  private def dMinHashNum(baseList: String, i: Int) =
    s"""list_aggregate(list_transform($baseList,
       x -> (x * ${Shingles.affineA(i)} + ${Shingles.affineB(i)})
            % ${Shingles.MinHashP}), 'min')"""
  private val dNorm =
    "trim(regexp_replace(regexp_replace(lower(text), '[.,!?;:]', '', 'g'), '\\s+', ' ', 'g'))"

  /** Content-defined-chunking CTE chain (shared by q409/q410) — the
    * exact integer contract of [[graft.ext.Dedup.cdcChunks]]: 28-bit
    * md5-prefix token hashes, rolling 4-token hash via three lags
    * (missing lag ⇒ NULL ⇒ no cut: min chunk length 4), cut iff bits
    * 22–27 are zero, chunk index = prefix-sum of STRICTLY-preceding
    * cuts, chunk fingerprint = md5 of the position-ordered tokens.
    * Ends at `chunks(doc_id, chunk_idx, n_tokens, chunk_fp)`.
    */
  private lazy val dCdcChunkCtes: String =
    s"""tkc AS (SELECT doc_id, unnest($dTok) AS tok,
          CAST(generate_subscripts($dTok, 1) AS BIGINT) AS pos
        FROM documents),
      bhc AS (SELECT doc_id, pos, tok,
          ('0x' || substr(md5(tok), 1, 7))::BIGINT AS h0 FROM tkc),
      rhc AS (SELECT doc_id, pos, tok,
          h0 + 2048 * lag(h0, 1) OVER wc + 4194304 * lag(h0, 2) OVER wc
             + 8589934592 * lag(h0, 3) OVER wc AS h
        FROM bhc WINDOW wc AS (PARTITION BY doc_id ORDER BY pos)),
      ctc AS (SELECT doc_id, pos, tok,
          CASE WHEN h IS NOT NULL AND (h // 4194304) % 64 = 0
               THEN 1 ELSE 0 END AS cut FROM rhc),
      cidc AS (SELECT doc_id, pos, tok,
          CAST(COALESCE(SUM(cut) OVER (PARTITION BY doc_id ORDER BY pos
            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
            AS BIGINT) AS chunk_idx
        FROM ctc),
      chunks AS (SELECT doc_id, chunk_idx,
          CAST(COUNT(*) AS BIGINT) AS n_tokens,
          md5(string_agg(tok, ' ' ORDER BY pos)) AS chunk_fp
        FROM cidc GROUP BY 1, 2)"""

  /** Unrolled-Borůvka CTE chain (shared by q405/q406): strong graph →
    * 6 rounds of (cross edges → per-component rank-window argmin →
    * forest union → components via reachability SQUARING) ending at
    * `f6` (the forest) and `nodes`. The components here come from
    * squaring, NOT star contraction — an independent algorithm whose
    * edge-for-edge agreement with the Spark side is guaranteed only by
    * the uniqueness of the tie-broken MSF.
    *
    * DEPTH CONTRACT (coupled to trVocab): 6 squaring rounds cover
    * forest paths of ≤ 2⁶ = 64 edges and 6 Borůvka rounds span ≤ 2⁶
    * nodes, so this chain is correct only while trVocab ≤ 64. The
    * Spark side fails loudly (`boruvkaCore` requires 2^rounds ≥ vocab);
    * this oracle would go silently wrong instead — hence the matching
    * require in q405/q406's callers stays at rounds = 6 ≥ log₂(trVocab).
    */
  private lazy val dBoruvkaChain: String = {
    val rounds = (1 to 6).map { r =>
      val sq = (1 to 6).map { q =>
        s"""g${r}_$q AS MATERIALIZED (SELECT DISTINCT a.u, b.v
           FROM g${r}_${q - 1} a JOIN g${r}_${q - 1} b ON a.v = b.u)"""
      }.mkString(",\n")
      s"""e$r AS (SELECT s.src, s.dst, s.c,
           la.comp AS la, lb.comp AS lb
         FROM strong s JOIN l${r - 1} la ON la.t = s.src
         JOIN l${r - 1} lb ON lb.t = s.dst
         WHERE la.comp <> lb.comp),
       o$r AS (SELECT la AS comp, src, dst, c FROM e$r
         UNION ALL SELECT lb AS comp, src, dst, c FROM e$r),
       ch$r AS (SELECT src, dst, c FROM (SELECT src, dst, c,
           ROW_NUMBER() OVER (PARTITION BY comp
             ORDER BY c DESC, src, dst) AS rn FROM o$r)
         WHERE rn = 1),
       f$r AS MATERIALIZED (SELECT DISTINCT src, dst, c FROM
         (SELECT src, dst, c FROM f${r - 1}
          UNION ALL SELECT src, dst, c FROM ch$r)),
       g${r}_0 AS MATERIALIZED (SELECT t AS u, t AS v FROM nodes
         UNION SELECT src, dst FROM f$r
         UNION SELECT dst, src FROM f$r),
       $sq,
       l$r AS MATERIALIZED (SELECT u AS t, MIN(v) AS comp
         FROM g${r}_6 GROUP BY u)"""
    }.mkString(",\n")
    s"""dt AS (SELECT DISTINCT doc_id, tok AS token
        FROM (SELECT doc_id, unnest($dTok) AS tok FROM documents)),
      ndt AS (SELECT CAST(COUNT(*) AS BIGINT) AS nd FROM documents),
      v AS (SELECT token FROM (SELECT token, COUNT(*) AS df FROM dt
        GROUP BY 1 ORDER BY df DESC, token LIMIT $trVocab)),
      vt AS (SELECT dt.doc_id, dt.token FROM dt JOIN v USING (token)),
      co AS (SELECT a.token AS src, b.token AS dst,
          CAST(COUNT(*) AS BIGINT) AS c
        FROM vt a JOIN vt b
          ON a.doc_id = b.doc_id AND a.token < b.token
        GROUP BY 1, 2),
      strong AS MATERIALIZED (SELECT src, dst, c FROM co, ndt
        WHERE c * $linkSupDen > $linkSupNum * nd),
      nodes AS MATERIALIZED (SELECT src AS t FROM strong
        UNION SELECT dst FROM strong),
      l0 AS MATERIALIZED (SELECT t, t AS comp FROM nodes),
      f0 AS MATERIALIZED (SELECT src, dst, c FROM strong WHERE 1 = 0),
      $rounds"""
  }

  /** cos/sin(2π·h·r/7) for h∈1..3, r∈0..6 as SHARED decimal literal
    * strings (q360 weekly DFT): the Spark when-chain and the DuckDB
    * CASE both parse the same text into the same IEEE double, so no
    * engine-computed trig ever touches the data path — the literal-
    * chain discipline the transcendental queries follow.
    */
  private[graft] val weeklyTrig: Seq[(Int, Int, String, String)] = Seq(
    (1, 0, "1.0", "0.0"),
    (1, 1, "0.6234898018587336", "0.7818314824680298"),
    (1, 2, "-0.22252093395631434", "0.9749279121818236"),
    (1, 3, "-0.900968867902419", "0.43388373911755823"),
    (1, 4, "-0.9009688679024191", "-0.433883739117558"),
    (1, 5, "-0.2225209339563146", "-0.9749279121818236"),
    (1, 6, "0.6234898018587334", "-0.7818314824680299"),
    (2, 0, "1.0", "0.0"),
    (2, 1, "-0.22252093395631434", "0.9749279121818236"),
    (2, 2, "-0.9009688679024191", "-0.433883739117558"),
    (2, 3, "0.6234898018587334", "-0.7818314824680299"),
    (2, 4, "0.6234898018587337", "0.7818314824680296"),
    (2, 5, "-0.9009688679024189", "0.43388373911755845"),
    (2, 6, "-0.2225209339563148", "-0.9749279121818235"),
    (3, 0, "1.0", "0.0"),
    (3, 1, "-0.900968867902419", "0.43388373911755823"),
    (3, 2, "0.6234898018587334", "-0.7818314824680299"),
    (3, 3, "-0.2225209339563141", "0.9749279121818237"),
    (3, 4, "-0.2225209339563148", "-0.9749279121818235"),
    (3, 5, "0.6234898018587354", "0.7818314824680284"),
    (3, 6, "-0.9009688679024194", "-0.43388373911755757"))

  private[graft] def trigSpark(h: Int, sin: Boolean): Column =
    weeklyTrig.filter(_._1 == h).foldLeft(lit(0.0): Column) {
      case (acc, (_, r, cs, ss)) =>
        when(col("r") === r, lit((if (sin) ss else cs).toDouble))
          .otherwise(acc)
    }

  private def trigSql(h: Int, sin: Boolean): String =
    "CASE r " + weeklyTrig.filter(_._1 == h).map {
      case (_, r, cs, ss) => s"WHEN $r THEN ${if (sin) ss else cs}"
    }.mkString(" ") + " ELSE 0.0 END"

  /** cos/sin(2π·h/24) for h∈0..23 as shared literal strings (q380
    * circular hour statistics) — same literal-chain contract as
    * [[weeklyTrig]].
    */
  private val hourTrig: Seq[(String, String, String)] = Seq(
    ("0", "1.0", "0.0"),
    ("1", "0.9659258262890683", "0.25881904510252074"),
    ("2", "0.8660254037844387", "0.49999999999999994"),
    ("3", "0.7071067811865476", "0.7071067811865475"),
    ("4", "0.5000000000000001", "0.8660254037844386"),
    ("5", "0.25881904510252074", "0.9659258262890683"),
    ("6", "6.123233995736766e-17", "1.0"),
    ("7", "-0.25881904510252063", "0.9659258262890683"),
    ("8", "-0.4999999999999998", "0.8660254037844387"),
    ("9", "-0.7071067811865475", "0.7071067811865476"),
    ("10", "-0.8660254037844387", "0.49999999999999994"),
    ("11", "-0.9659258262890682", "0.258819045102521"),
    ("12", "-1.0", "1.2246467991473532e-16"),
    ("13", "-0.9659258262890683", "-0.2588190451025208"),
    ("14", "-0.8660254037844388", "-0.4999999999999997"),
    ("15", "-0.7071067811865479", "-0.7071067811865471"),
    ("16", "-0.5000000000000004", "-0.8660254037844384"),
    ("17", "-0.25881904510252063", "-0.9659258262890683"),
    ("18", "-1.8369701987210297e-16", "-1.0"),
    ("19", "0.2588190451025203", "-0.9659258262890684"),
    ("20", "0.5000000000000001", "-0.8660254037844386"),
    ("21", "0.7071067811865474", "-0.7071067811865477"),
    ("22", "0.8660254037844384", "-0.5000000000000004"),
    ("23", "0.9659258262890681", "-0.25881904510252157"))

  private def hourTrigSpark(sin: Boolean): Column =
    hourTrig.foldLeft(lit(0.0): Column) { case (acc, (h, cs, ss)) =>
      when(col("h") === h.toLong,
        lit((if (sin) ss else cs).toDouble)).otherwise(acc)
    }

  private def hourTrigSql(sin: Boolean): String =
    "CASE h " + hourTrig.map { case (h, cs, ss) =>
      s"WHEN $h THEN ${if (sin) ss else cs}"
    }.mkString(" ") + " ELSE 0.0 END"

  /** Unrolled k-truss peeling rounds for the q359 oracle — the DuckDB
    * twin of [[graft.ext.Search.kTruss]]'s bounded loop (recursive CTEs
    * can't shrink a set, so the cap is unrolled textually). Every
    * round's edge set is AS MATERIALIZED: each e_i is referenced ~4×
    * by round i+1, so DuckDB's default CTE inlining re-evaluates e0
    * O(4^rounds) times — materializing turns the unroll back into the
    * linear peel the Spark loop (localCheckpoint per round) runs.
    */
  private def kTrussOracleRounds(rounds: Int, minSup: Int): String =
    (0 until rounds).map { i =>
      s"""nb$i AS MATERIALIZED (SELECT src, dst FROM e$i
           UNION ALL SELECT dst, src FROM e$i),
         s$i AS MATERIALIZED (SELECT x.src AS a, y.src AS b,
             CAST(COUNT(*) AS BIGINT) AS sup
           FROM nb$i x JOIN nb$i y ON x.dst = y.dst AND x.src < y.src
           GROUP BY 1, 2),
         e${i + 1} AS MATERIALIZED (SELECT e.src, e.dst
           FROM e$i e JOIN s$i s
           ON e.src = s.a AND e.dst = s.b WHERE s.sup >= $minSup)"""
    }.mkString(",\n")

  /** Fellegi–Sunter scored candidate pairs (q164/q166): brand-blocked
    * part pairs with their agreement pattern over (type, size,
    * price-bucket) and its precomputed likelihood-ratio score — the
    * whole model is the [[Params.fsPatterns]] lookup, so no per-row
    * float arithmetic exists on either engine.
    */
  private def fsScoredPairs(s: org.apache.spark.sql.SparkSession,
                            dir: String): DataFrame = {
    val d = t(s, dir, "part").select(
      col("p_partkey"), col("p_brand"), col("p_type"), col("p_size"),
      floor(col("p_retailprice") / lit(100.0)).cast("long").as("pb"))
      .localCheckpoint()
    // |brands| ≪ cores, so a shuffle join on the block key would cap
    // parallelism at 25 hot partitions (the q105 lesson). The build
    // side is the bounded part DIMENSION — broadcast it and spread the
    // probe side across every core: candidate generation becomes
    // map-side, no block-key shuffle at all. (With an unbounded entity
    // table this switches to the salt-replicated Skew.saltedJoin.)
    val j = d.repartition(s.sparkContext.defaultParallelism).as("a")
      .join(broadcast(d).as("b"),
      col("a.p_brand") === col("b.p_brand") &&
        col("a.p_partkey") < col("b.p_partkey"))
    val bits = Seq(
      col("a.p_type") === col("b.p_type"),
      col("a.p_size") === col("b.p_size"),
      col("a.pb") === col("b.pb"))
    val pattern = concat(bits.map(b =>
      when(b, lit("1")).otherwise(lit("0"))): _*)
    val score = fsPatterns.tail.foldLeft(
      when(pattern === fsPatterns.head._1, lit(fsPatterns.head._2))) {
      case (acc, (p, sc)) => acc.when(pattern === p, lit(sc))
    }
    j.select(col("a.p_partkey").as("id_a"), col("b.p_partkey").as("id_b"),
      pattern.as("pattern"), score.as("score"))
  }

  /** The structural fact that makes tighter blocking EXACT for the
    * threshold consumers (q164/q166/q198): with the configured
    * [[Params.fsFields]] rationals, score ≥ [[Params.fsMinScore]] holds
    * for precisely the patterns agreeing on ≥2 of the 3 fields (the
    * weakest 2-agreement pattern scores ≈342 vs the strongest
    * 1-agreement ≈4.2 against the 100 floor). Verified at runtime from
    * [[Params.fsPatterns]] itself, so a future (m,u) re-configuration
    * that breaks the equivalence falls back to the exhaustive
    * brand-block path instead of silently dropping pairs.
    */
  private lazy val fsTwoFieldBlockingExact: Boolean = {
    val accepted = fsPatterns.filter(_._2 >= fsMinScore).map(_._1).toSet
    val twoPlus = fsPatterns.map(_._1).filter(_.count(_ == '1') >= 2).toSet
    accepted == twoPlus
  }
  /** Comparison columns in [[Params.fsFields]] bit order. */
  private val fsFieldCols = Seq("p_type", "p_size", "pb")
  private val fsPassPairs: Seq[(Int, Int)] =
    for { i <- fsFieldCols.indices; j <- i + 1 until fsFieldCols.size }
      yield (i, j)
  /** Owning pass of an accepted pattern = its lexicographically-first
    * agreeing field pair — the disjointness rule that lets the
    * multi-pass union skip the dedup shuffle entirely.
    */
  private def fsPassOf(p: String): Option[(Int, Int)] =
    fsPassPairs.find { case (i, j) => p(i) == '1' && p(j) == '1' }

  private def fsBlockedDim(s: org.apache.spark.sql.SparkSession,
                           dir: String): DataFrame =
    t(s, dir, "part").select(
      col("p_partkey"), col("p_brand"), col("p_type"), col("p_size"),
      floor(col("p_retailprice") / lit(100.0)).cast("long").as("pb"))
      .localCheckpoint()

  /** Accepted Fellegi–Sunter pairs ONLY (score ≥ fsMinScore), generated
    * by three DISJOINT 2-field-blocked passes instead of the exhaustive
    * brand block + post-filter. Each pass hash-joins on
    * (brand, field_i, field_j), so every produced candidate already
    * agrees on ≥2 fields and is accepted — zero rejected candidates are
    * ever materialized (the sf1.0 profile showed 1.6B brand-block probe
    * visits producing 147.6M accepted pairs; the passes visit only the
    * accepted pairs, ~3.6× fewer rows, with 111-pattern triples
    * deduplicated by the owning-pass rule rather than a distinct
    * shuffle). Output ≡ fsScoredPairs.filter(score ≥ fsMinScore).
    */
  private def fsAcceptedPairs(s: org.apache.spark.sql.SparkSession,
                              dir: String): DataFrame = {
    if (!fsTwoFieldBlockingExact)
      fsScoredPairs(s, dir).filter(col("score") >= fsMinScore)
    else {
      val d = fsBlockedDim(s, dir)
      val probe = d.repartition(s.sparkContext.defaultParallelism)
      val passes = fsPassPairs.map { case (i, j) =>
        val kept = fsPatterns.map(_._1)
          .filter(p => fsPassOf(p).contains((i, j)))
        val keys = Seq("p_brand", fsFieldCols(i), fsFieldCols(j))
        val joined = probe.as("a").join(broadcast(d).as("b"),
          keys.map(k => col(s"a.$k") === col(s"b.$k")).reduce(_ && _) &&
            col("a.p_partkey") < col("b.p_partkey"))
        val bits = fsFieldCols.map(c => col(s"a.$c") === col(s"b.$c"))
        val pattern = concat(bits.map(b =>
          when(b, lit("1")).otherwise(lit("0"))): _*)
        joined.select(col("a.p_partkey").as("id_a"),
            col("b.p_partkey").as("id_b"), pattern.as("pattern"))
          .filter(col("pattern").isin(kept: _*))
      }
      val all = passes.reduce(_ unionAll _)
      val score = fsPatterns.tail.foldLeft(
        when(col("pattern") === fsPatterns.head._1,
          lit(fsPatterns.head._2))) {
        case (acc, (p, sc)) => acc.when(col("pattern") === p, lit(sc))
      }
      all.withColumn("score", score)
    }
  }

  /** Connectivity-preserving compression of the accepted match graph
    * for the CLUSTER consumers (q166/q198): inside one
    * (brand, field_i, field_j) block every pair is accepted, i.e. the
    * block is a CLIQUE — and a clique has the same transitive closure
    * as a star to its minimum member. Emitting per-block star edges
    * (min_member → member) across the three passes yields an edge set
    * whose connected components (and node set — a part has an accepted
    * pair iff it shares a full 2-field block with another part) are
    * IDENTICAL to the 147.6M-edge accepted pair set, at ~3·|part|
    * edges. The sf1.0 profile showed 177 s of the 246 s q166 wall was
    * generating + checkpointing those pairs before contraction; this
    * replaces that head with three bounded groupBy shuffles.
    */
  private def fsMatchStarEdges(s: org.apache.spark.sql.SparkSession,
                               dir: String): DataFrame = {
    if (!fsTwoFieldBlockingExact)
      fsScoredPairs(s, dir).filter(col("score") >= fsMinScore)
        .select("id_a", "id_b")
    else {
      val d = fsBlockedDim(s, dir)
      val passes = fsPassPairs.map { case (i, j) =>
        val keys = Seq("p_brand", fsFieldCols(i), fsFieldCols(j))
        // groupBy + join back (not a window min): the roots table is
        // bounded by |blocks| and AQE broadcasts it, while a window
        // would buffer each block — clique blocks are exactly where
        // skew lives.
        val roots = d.groupBy(keys.map(col): _*)
          .agg(min("p_partkey").as("root"),
            count(lit(1)).as("bn"))
          .filter(col("bn") > 1)
          .drop("bn")
        d.join(roots, keys)
          .filter(col("p_partkey") =!= col("root"))
          .select(col("root").as("id_a"), col("p_partkey").as("id_b"))
      }
      passes.reduce(_ unionAll _)
    }
  }

  /** DuckDB twin of [[fsScoredPairs]] as CTE text ending in `scored`.
    * Score literals are CAST: DuckDB types a bare decimal literal as
    * DECIMAL and the decimal→double hop can land one ulp off the
    * strtod parse Spark does.
    */
  private val dFsCtes: String = {
    val cases = fsPatterns.map { case (p, sc) =>
      s"WHEN pattern = '$p' THEN CAST($sc AS DOUBLE)"
    }.mkString("\n            ")
    s"""d AS (SELECT p_partkey, p_brand, p_type, p_size,
            CAST(floor(p_retailprice / 100.0) AS BIGINT) AS pb
          FROM part),
        fspairs AS (SELECT a.p_partkey AS id_a, b.p_partkey AS id_b,
            (CASE WHEN a.p_type = b.p_type THEN '1' ELSE '0' END ||
             CASE WHEN a.p_size = b.p_size THEN '1' ELSE '0' END ||
             CASE WHEN a.pb = b.pb THEN '1' ELSE '0' END) AS pattern
          FROM d a JOIN d b
            ON a.p_brand = b.p_brand AND a.p_partkey < b.p_partkey),
        scored AS (SELECT id_a, id_b, pattern, CASE
            $cases
            END AS score FROM fspairs)"""
  }

  /** DuckDB twins of [[TextStats.stopwordRatio]]/[[TextStats.qualityScore]]
    * (shared by q21 and the q137 survivor ranking).
    */
  private lazy val dStopRatioExpr: String = {
    val stopList = stopwords.map(w => s"'$w'").mkString("[", ", ", "]")
    s"""CASE WHEN len($dTokLower) > 0 THEN
       CAST(len(list_filter($dTokLower, t -> list_contains($stopList, t)))
         AS DOUBLE) / CAST(len($dTokLower) AS DOUBLE)
       ELSE 0.0::DOUBLE END"""
  }
  private lazy val dQualityExpr: String = {
    val punct =
      s"""CASE WHEN length(text) > 0 THEN
         CAST(length(text) - length(regexp_replace(text, '[.,!?;:]', '', 'g'))
           AS DOUBLE) / CAST(length(text) AS DOUBLE)
         ELSE 0.0::DOUBLE END"""
    val lenScore =
      "least(CAST(length(text) AS DOUBLE) / CAST(500.0 AS DOUBLE), CAST(1.0 AS DOUBLE))"
    s"""$lenScore * CAST(0.5 AS DOUBLE)
       + least(($dStopRatioExpr) * CAST(5.0 AS DOUBLE), CAST(1.0 AS DOUBLE)) * CAST(0.3 AS DOUBLE)
       + (CAST(1.0 AS DOUBLE) - least(($punct) * CAST(10.0 AS DOUBLE), CAST(1.0 AS DOUBLE))) * CAST(0.2 AS DOUBLE)"""
  }

  /** DuckDB twin of the [[TextStats.bpeLoop]] ENCODE half as CTE text
    * (v0 … v`bpeSteps`, each round's best merge greedily folded over
    * every word's symbol list) — shared by q169 and the q338 fertility
    * report so the tokenizer replica lives in exactly one place.
    */
  private lazy val dBpeVocabCtes: String = {
    def fold(b: String) =
      s"""string_split(substr(list_reduce(list_prepend('', syms),
         (acc, x) -> CASE
           WHEN ends_with(acc, ' ' || $b.m_left) AND x = $b.m_right
           THEN substr(acc, 1,
               strlen(acc) - strlen($b.m_left) - 1)
             || ' ' || $b.m_left || $b.m_right
           ELSE acc || ' ' || x END), 2), ' ')"""
    def bestCte(k: Int) =
      s"""b$k AS MATERIALIZED (SELECT p.l AS m_left, p.r AS m_right
       FROM (SELECT wc, unnest(list_transform(range(1, len(syms)),
           i -> {'l': syms[CAST(i AS INT)],
                 'r': syms[CAST(i AS INT) + 1]})) AS p
         FROM v${k - 1}) q
       GROUP BY 1, 2
       ORDER BY SUM(wc) DESC, m_left, m_right LIMIT 1)"""
    def vocabCte(k: Int) =
      s"""v$k AS MATERIALIZED (SELECT word, wc, ${fold(s"b$k")} AS syms
       FROM v${k - 1}, b$k)"""
    (s"""v0 AS MATERIALIZED (SELECT word, COUNT(*) AS wc,
        list_transform(range(1, strlen(word) + 1),
          i -> substr(word, CAST(i AS INT), 1)) AS syms
      FROM (SELECT unnest($dTok) AS word FROM documents)
      GROUP BY word)""" +:
      (1 to bpeSteps).flatMap(k => Seq(bestCte(k), vocabCte(k))))
      .mkString(",\n        ")
  }

  /** Oracle twin of [[TextStats.langId]] as a derived-table expression
    * `(SELECT doc_id, lang, …, lang_pred FROM …)` replicating the Spark
    * fold (strict `>` switches the running best, declaration-order
    * tie-break). Shared by q22 and the q278 confusion matrix.
    */
  private lazy val dLangPredFrom: String = {
    val tkl = dTokLower
    def score(markers: Seq[String]) = {
      val lst = markers.map(w => s"'$w'").mkString("[", ", ", "]")
      s"len(list_filter($tkl, t -> list_contains($lst, t)))"
    }
    val ms = TextStats.langMarkers
    val inner = s"""SELECT doc_id, lang,
      ${ms.zipWithIndex.map { case ((_, m), i) => s"${score(m)} AS s$i" }
        .mkString(", ")} FROM documents"""
    val folded = ms.zipWithIndex.drop(1).foldLeft(
      (s"'${ms.head._1}'", "s0", s"($inner)")) {
      case ((bestL, bestS, from), ((lang, _), i)) =>
        (s"CASE WHEN s$i > __v THEN '$lang' ELSE __b END",
          s"CASE WHEN s$i > __v THEN s$i ELSE __v END",
          s"(SELECT doc_id, lang, ${ms.indices.map(j => s"s$j")
            .mkString(", ")}, $bestL AS __b, $bestS AS __v FROM $from)")
    }
    val (lastL, _, from) = folded
    s"(SELECT doc_id, lang, $lastL AS lang_pred FROM $from)"
  }

  /** Per-doc LSH band keys for the `documents` rows matching `where` —
    * the oracle twin of [[Dedup.minhashSignatures]] + band-key explode.
    * Yields rows (doc_id, bk).
    */
  private def dBandsSql(where: String): String = {
    val sh = dShingles(dTok, shingleK)
    val sigExprs = (0 until minhashHashes)
      .map(seed => s"${dMinHashNum("base", seed)} AS mh_$seed")
    val bandExprs = (0 until minhashHashes / minhashBandRows).map { b =>
      val lo = b * minhashBandRows + 1
      val hi = b * minhashBandRows + minhashBandRows
      s"'$b:' || md5(array_to_string([${(lo to hi).map(i => s"mh_${i - 1}")
        .mkString(", ")}], ','))"
    }
    s"""SELECT doc_id, unnest([${bandExprs.mkString(", ")}]) AS bk
        FROM (SELECT doc_id, ${sigExprs.mkString(", ")}
          FROM (SELECT doc_id, ${dBaseHash(sh)} AS base
                FROM documents WHERE $where))"""
  }

  /** Shared CTE text: MinHash signatures → LSH bands → candidate pairs
    * (the oracle twin of [[Dedup.minhashCandidates]]); yields CTEs named
    * `bands`, `cand`.
    */
  private def dMinhashCandCtes: String =
    s"""bands AS (${dBandsSql("TRUE")}),
      cand AS (SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
        FROM bands a JOIN bands b USING (bk)
        WHERE a.doc_id < b.doc_id)"""
  private def dsumSql(x: String) =
    s"CAST(CAST(SUM(CAST(($x) AS DECIMAL(30,8))) AS VARCHAR) AS DOUBLE)"

  /** n-dim dot product as an explicit left-associated double sum — the
    * bit-exact twin of [[Similarity.dot]]'s sequential fold.
    */
  private def dDotN(a: String, b: String, n: Int): String =
    (1 to n).map(i => s"CAST($a[$i] AS DOUBLE)*CAST($b[$i] AS DOUBLE)")
      .mkString(" + ")
  private def dDot(a: String, b: String): String = dDotN(a, b, annDims)

  /** SQL twin of [[graft.functions.NativeExprs.ZInterleaveExpr]] (q96):
    * x's bit i lands at 2i, y's at 2i+1, pure integer arithmetic. */
  private def dZInterleave(x: String, y: String, bits: Int): String =
    (0 until bits).flatMap { i =>
      Seq(s"(($x >> $i) & 1) * ${1L << (2 * i)}",
        s"(($y >> $i) & 1) * ${1L << (2 * i + 1)}")
    }.mkString(" + ")
  /** Seeded random-hyperplane sign-LSH bucket — the oracle twin of
    * [[Similarity.signBucket]]: the same driver-side Rademacher weights
    * are spliced in as an explicit left-associated ± chain, so the
    * double-precision projection (and thus every bucket bit) is
    * bit-identical across engines.
    */
  private def dBucket(v: String, seed: Long = annSeed): String =
    (0 until annBits).map { i =>
      val w = Similarity.hyperplaneSigns(seed, i, annDims)
      val proj = w.zipWithIndex.map { case (s, j) =>
        val term = s"CAST($v[${j + 1}] AS DOUBLE)"
        if (j == 0) { if (s < 0) s"-$term" else term }
        else { if (s < 0) s" - $term" else s" + $term" }
      }.mkString
      s"(CASE WHEN ($proj) >= 0 THEN '1' ELSE '0' END)"
    }.mkString(" || ")

  /** Table-tagged bucket list for multi-table LSH (table t's hyperplanes
    * seeded `annSeed + t`, tag prefix keeps equal bit-strings of
    * different tables from colliding).
    */
  private def dBucketTables(v: String): String =
    (0 until annTables)
      .map(t => s"'$t:' || (${dBucket(v, annSeed + t)})")
      .mkString("[", ", ", "]")

  /** One persisted SCD2 warehouse per (session, dir), shared by every
    * mart-query star build. The query lambdas return LAZY frames (the
    * driver acts on them later), so a per-invocation pin could never be
    * released at the right time — and re-pinning the identical plan each
    * of 3 bench rounds × 3 queries only emitted "already cached"
    * warnings. One shared pin per session honors [[Mart.build]]'s
    * contract (callers passing a pre-persisted dw use `pin = false`); the
    * dw is a projection of `part` (~200k rows at sf0.1), so the single
    * session-lifetime cache entry is cheap by construction.
    */
  private val martDwCache = scala.collection.concurrent.TrieMap
    .empty[(org.apache.spark.sql.SparkSession, String), DataFrame]

  /** Shared star build for the mart queries (q65–q67): two product
    * snapshots (big parts get a restock on day 20) SCD2-merge into a dw,
    * then [[Mart.build]] derives dim_product + dim_date + the
    * periodic-snapshot fact over the calendar window `[from, until]`.
    */
  private def martStar(s: org.apache.spark.sql.SparkSession, dir: String,
                       from: Date = Date.valueOf("2020-01-01"),
                       until: Date = Date.valueOf("2020-01-31")): Mart.Star = {
    val dw = martDwCache.getOrElseUpdate((s, dir), martDw(s, dir).persist(
      org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))
    Mart.build(s, dw, martAttrs, Seq("price", "quantity_available"),
      from, until, pin = false)
  }

  /** The mart queries read the MATERIALIZED star ([[Mart
    * .materializeStar]]): dim_product and the fact land once per
    * (session, dir, window) as bucketed tables co-located on
    * `product_sk`, and every report join over them is zero-exchange —
    * the load-once/read-many physical layout P4' is for. Built lazily
    * and shared, like [[martDwCache]].
    */
  private val martBucketedCache = scala.collection.concurrent.TrieMap
    .empty[(org.apache.spark.sql.SparkSession, String), Mart.Star]

  private def martStarBucketed(s: org.apache.spark.sql.SparkSession,
                               dir: String,
                               from: Date = Date.valueOf("2020-01-01"),
                               until: Date = Date.valueOf("2020-01-31"))
  : Mart.Star = {
    val key = s"$dir|$from|$until"
    martBucketedCache.getOrElseUpdate((s, key), {
      // table names must be valid identifiers, unique per key, and
      // stable within a session so re-entry hits the catalog cache
      val tag = java.lang.Long.toHexString(
        java.util.UUID.nameUUIDFromBytes(key.getBytes("UTF-8"))
          .getMostSignificantBits & Long.MaxValue)
      Mart.materializeStar(s, martStar(s, dir, from, until), s"mart_$tag")
    })
  }

  private val martAttrs =
    Seq("product_name", "brand", "material", "dimension")

  /** The mart queries' SCD2 warehouse: day-5 part snapshot merged with a
    * day-20 restock of the big parts.
    */
  private def martDw(s: org.apache.spark.sql.SparkSession,
                     dir: String): DataFrame = {
    val base = t(s, dir, "part").select(
      concat_ws("|", col("p_name"), col("p_partkey")).as("natural_key"),
      col("p_name").as("product_name"),
      col("p_brand").as("brand"),
      col("p_type").as("material"),
      col("p_size").cast("long").as("dimension"),
      floor(col("p_retailprice")).cast("long").as("price"),
      (col("p_partkey") % 100).cast("long").as("quantity_available"))
    val d0 = base
      .withColumn("dt_load_to_dw", lit(Date.valueOf("2020-01-05")))
      .withColumn("dt_last_update", lit(Scd2.Sentinel))
    val restocked = base
      .withColumn("price", when(col("dimension") > 25,
        col("price") + 100).otherwise(col("price")))
      .withColumn("quantity_available", when(col("dimension") > 25,
        col("quantity_available") - 5)
        .otherwise(col("quantity_available")))
    Scd2.merge(d0, restocked, "natural_key",
      martAttrs ++ Seq("price", "quantity_available"),
      Date.valueOf("2020-01-20"))
  }

  /** The q65–q67 oracle's shared warehouse CTEs: the DuckDB twin of
    * [[martStar]]'s SCD2 merge (v1 = day-5 load with big parts closed on
    * day 20, v2 = the restocked versions), ending with a `dw` relation of
    * `natural_key, product_name, brand, material, dimension, price,
    * quantity_available, valid_from, valid_to`.
    */
  private def dMartDw: String =
    """base AS (
        SELECT p_name || '|' || CAST(p_partkey AS VARCHAR) AS natural_key,
          p_name AS product_name, p_brand AS brand, p_type AS material,
          CAST(p_size AS BIGINT) AS dimension,
          CAST(floor(p_retailprice) AS BIGINT) AS price,
          p_partkey % 100 AS quantity_available
        FROM part),
      v1 AS (SELECT *, DATE '2020-01-05' AS valid_from,
          CASE WHEN dimension > 25 THEN DATE '2020-01-20'
               ELSE DATE '9999-12-31' END AS valid_to
        FROM base),
      v2 AS (SELECT natural_key, product_name, brand, material, dimension,
          price + 100 AS price, quantity_available - 5 AS quantity_available,
          DATE '2020-01-20' AS valid_from, DATE '9999-12-31' AS valid_to
        FROM base WHERE dimension > 25),
      dw AS (SELECT * FROM v1 UNION ALL SELECT * FROM v2)"""

  val defs: Seq[QueryDef] = Seq(

    // ── Text analysis: token counts + quality components ───────────────
    QueryDef("q20_text_stats",
      (s, dir) => tPar(s, dir, "documents").select(
        col("doc_id"),
        TextStats.tokenCount(col("text")).as("n_tokens"),
        length(col("text")).cast("long").as("len_chars"),
        TextStats.meanWordLen(col("text")).as("mean_word_len"),
        TextStats.punctRatio(col("text")).as("punct_ratio"))
        .orderBy("doc_id"),
      Some(s"""SELECT doc_id,
        CAST(len($dTok) AS BIGINT) AS n_tokens,
        CAST(length(text) AS BIGINT) AS len_chars,
        CASE WHEN len($dTok) > 0 THEN
          CAST(list_sum(list_transform($dTok, t -> len(t))) AS DOUBLE)
            / CAST(len($dTok) AS DOUBLE) ELSE 0.0::DOUBLE END
          AS mean_word_len,
        CASE WHEN length(text) > 0 THEN
          CAST(length(text) - length(regexp_replace(text, '[.,!?;:]', '', 'g'))
            AS DOUBLE) / CAST(length(text) AS DOUBLE)
          ELSE 0.0::DOUBLE END AS punct_ratio
        FROM documents ORDER BY doc_id""")),

    // ── Quality scoring (length/stopword/punct composite) ──────────────
    QueryDef("q21_quality_score",
      (s, dir) => tPar(s, dir, "documents").select(
        col("doc_id"), col("lang"),
        TextStats.stopwordRatio(col("text"), stopwords).as("stopword_ratio"),
        TextStats.qualityScore(col("text"), stopwords).as("quality"))
        .orderBy("doc_id"),
      Some(s"""SELECT doc_id, lang, $dStopRatioExpr AS stopword_ratio,
          $dQualityExpr AS quality
          FROM documents ORDER BY doc_id""")),

    // ── Language ID (marker-token argmax, declaration-order ties) ──────
    QueryDef("q22_lang_id",
      (s, dir) => tPar(s, dir, "documents").select(
        col("doc_id"), col("lang"),
        TextStats.langId(col("text")).as("lang_pred"))
        .orderBy("doc_id"),
      Some(s"""SELECT doc_id, lang, lang_pred FROM $dLangPredFrom
          ORDER BY doc_id""")),

    // ── Document fingerprints (content md5 + 1-hash MinHash rolling) ───
    QueryDef("q23_fingerprint",
      (s, dir) => tPar(s, dir, "documents").select(
        col("doc_id"),
        TextStats.contentFingerprint(col("text")).as("content_fp"),
        TextStats.rollingFingerprint(col("text"), 5).as("rolling_fp"))
        .orderBy("doc_id"),
      Some(s"""SELECT doc_id, md5($dNorm) AS content_fp,
        ${dMinHash(dShingles(dTok, 5), 0)} AS rolling_fp
        FROM documents ORDER BY doc_id""")),

    // ── Exact dedup on normalized-content fingerprint ──────────────────
    QueryDef("q24_dedup_exact",
      (s, dir) => Dedup.exactByContent(tPar(s, dir, "documents"),
        "doc_id", "text").orderBy("doc_id"),
      Some(s"""SELECT min(doc_id) AS doc_id, COUNT(*) AS dup_count
        FROM documents GROUP BY md5($dNorm) ORDER BY doc_id""")),

    // ── MinHash signatures + LSH band keys (flattened columns) ─────────
    QueryDef("q25_minhash_signature",
      (s, dir) => {
        val sigs = Dedup.minhashSignatures(tPar(s, dir, "documents"),
          "doc_id", "text", shingleK, minhashHashes, minhashBandRows)
        val sigCols = (0 until minhashHashes).map(i =>
          element_at(col("signature"), i + 1).as(f"mh_$i%02d"))
        val bandCols = (0 until minhashHashes / minhashBandRows).map(b =>
          element_at(col("band_keys"), b + 1).as(s"band_$b"))
        sigs.select(col("doc_id") +: (sigCols ++ bandCols): _*)
          .orderBy("doc_id")
      },
      Some {
        val sh = dShingles(dTok, shingleK)
        val sigExprs = (0 until minhashHashes)
          .map(seed => s"${dMinHashNum("base", seed)} AS mh_$seed")
        val bands = (0 until minhashHashes / minhashBandRows).map { b =>
          val lo = b * minhashBandRows + 1
          val hi = b * minhashBandRows + minhashBandRows
          s"'$b:' || md5(array_to_string([${(lo to hi).map(i => s"mh_${i - 1}")
            .mkString(", ")}], ',')) AS band_$b"
        }
        val mhAliases = (0 until minhashHashes)
          .map(i => f"mh_$i AS mh_$i%02d")
        s"""SELECT doc_id, ${mhAliases.mkString(", ")},
          ${bands.mkString(", ")}
          FROM (SELECT doc_id, ${sigExprs.mkString(", ")}
            FROM (SELECT doc_id, ${dBaseHash(sh)} AS base FROM documents))
          ORDER BY doc_id"""
      }),

    // ── MinHash+LSH candidate near-dup pairs ───────────────────────────
    QueryDef("q26_minhash_pairs",
      (s, dir) => Dedup.minhashCandidates(tPar(s, dir, "documents"),
        "doc_id", "text", shingleK, minhashHashes, minhashBandRows)
        .orderBy("id_a", "id_b"),
      Some(s"""WITH $dMinhashCandCtes
        SELECT id_a, id_b FROM cand ORDER BY id_a, id_b""")),

    // ── SimHash fingerprints ───────────────────────────────────────────
    QueryDef("q27_simhash",
      (s, dir) => tPar(s, dir, "documents").select(
        col("doc_id"),
        Dedup.simhash(col("text"), simhashBits).as("simhash"))
        .orderBy("doc_id"),
      Some {
        val bits = (0 until simhashBits).map { i =>
          s"""(CASE WHEN list_sum(list_transform($dTok, t ->
             CASE WHEN substr(${dSeedHash(0, "t")}, ${i + 1}, 1) IN
               ('8','9','a','b','c','d','e','f') THEN 1 ELSE -1 END)) > 0
             THEN '1' ELSE '0' END)"""
        }
        s"""SELECT doc_id, ${bits.mkString(" || ")} AS simhash
          FROM documents ORDER BY doc_id"""
      }),

    // ── Exact n-gram Jaccard near-dup pairs ────────────────────────────
    // CONTRACT: all pairs with shingle-set Jaccard ≥ jaccardMin, exact.
    // SERVED by the prefix-filtered PPJoin plan (q106's machinery,
    // jaccardMin = ppjTNum/ppjTDen): the naive every-shingle inverted
    // index (Dedup.ngramJaccardPairs) measured SUPERLINEAR at sf3
    // (7.5× wall on 3× data — hot-shingle posting lists are unbounded),
    // while the prefix-filtered plan is proven output-equivalent on
    // boundary fixtures and the corpus (DedupSpec) and stays linear.
    // The naive index remains as the test-only equivalence witness.
    QueryDef("q28_ngram_jaccard",
      (s, dir) => Dedup.prefixFilterJaccardPairs(
          tPar(s, dir, "documents"), "doc_id", "text", shingleK,
          ppjTNum, ppjTDen)
        .orderBy("id_a", "id_b"),
      Some(s"""WITH sh AS (SELECT doc_id, unnest(list_distinct(
            ${dShingles(dTok, shingleK)})) AS shingle FROM documents),
        sz AS (SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY doc_id),
        p AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS shared
          FROM sh a JOIN sh b USING (shingle)
          WHERE a.doc_id < b.doc_id GROUP BY 1, 2)
        SELECT id_a, id_b,
          CAST(shared AS DOUBLE) / CAST(x.n + y.n - shared AS DOUBLE)
            AS jaccard
        FROM p JOIN sz x ON p.id_a = x.doc_id JOIN sz y ON p.id_b = y.doc_id
        WHERE CAST(shared AS DOUBLE) / CAST(x.n + y.n - shared AS DOUBLE)
          >= $jaccardMin
        ORDER BY id_a, id_b""")),

    // ── Embedding cosine near-dup pairs (sign-LSH bucketed candidates) ─
    QueryDef("q29_embed_dups",
      (s, dir) => {
        val e = tPar(s, dir, "embeddings")
        val v = e.select(col("vec_id"), col("embedding"),
          Similarity.signBucket(col("embedding"), annBits, annDims, annSeed)
            .as("bucket"))
        v.alias("a").join(v.alias("b"),
          col("a.bucket") === col("b.bucket") &&
            col("a.vec_id") < col("b.vec_id"))
          .select(col("a.vec_id").as("id_a"), col("b.vec_id").as("id_b"),
            Similarity.cosine(col("a.embedding"), col("b.embedding"))
              .as("cos"))
          .filter(col("cos") >= 0.4)
          .orderBy("id_a", "id_b")
      },
      Some(s"""WITH v AS (SELECT vec_id, embedding,
          ${dBucket("embedding")} AS bucket FROM embeddings)
        SELECT * FROM (
          SELECT a.vec_id AS id_a, b.vec_id AS id_b,
            (${dDot("a.embedding", "b.embedding")})
              / (sqrt(${dDot("a.embedding", "a.embedding")})
                 * sqrt(${dDot("b.embedding", "b.embedding")})) AS cos
          FROM v a JOIN v b
            ON a.bucket = b.bucket AND a.vec_id < b.vec_id)
        WHERE cos >= CAST(0.4 AS DOUBLE) ORDER BY id_a, id_b""")),

    // ── Brute-force cosine top-k (exact ANN baseline) ──────────────────
    QueryDef("q30_ann_bruteforce",
      (s, dir) => {
        val e = tPar(s, dir, "embeddings")
        Similarity.bruteForceTopK(e, e.filter(col("vec_id") < 20),
          "vec_id", "embedding", topK)
          .orderBy("probe_id", "rank")
      },
      Some(s"""WITH pairs AS (
          SELECT a.vec_id AS probe_id, b.vec_id AS nn_id,
            (${dDot("a.embedding", "b.embedding")})
              / (sqrt(${dDot("a.embedding", "a.embedding")})
                 * sqrt(${dDot("b.embedding", "b.embedding")})) AS cos
          FROM embeddings a JOIN embeddings b ON a.vec_id <> b.vec_id
          WHERE a.vec_id < 20)
        SELECT probe_id, nn_id, cos, rank FROM (
          SELECT *, row_number() OVER (PARTITION BY probe_id
            ORDER BY cos DESC, nn_id ASC) AS rank FROM pairs)
        WHERE rank <= $topK ORDER BY probe_id, rank""")),

    // ── Bucketed ANN top-k (the scale path: equi-join, no cross join;
    //    multi-table sign-LSH for recall amplification) ─────────────────
    QueryDef("q31_ann_bucketed",
      (s, dir) => {
        val e = tPar(s, dir, "embeddings")
        Similarity.bucketedTopK(e, e.filter(col("vec_id") < 20),
          "vec_id", "embedding", topK, annBits, annDims, annSeed, annTables)
          .orderBy("probe_id", "rank")
      },
      // The Spark side's minimal-table guard emits each colliding pair
      // exactly once; DISTINCT over the unnested table join is the same
      // pair set, so the oracle stays equivalent without replicating the
      // guard.
      Some(s"""WITH v AS (SELECT vec_id,
          unnest(${dBucketTables("embedding")}) AS bk FROM embeddings),
        cand AS (
          SELECT DISTINCT a.vec_id AS probe_id, b.vec_id AS nn_id
          FROM v a JOIN v b ON a.bk = b.bk AND a.vec_id <> b.vec_id
          WHERE a.vec_id < 20),
        pairs AS (
          SELECT probe_id, nn_id,
            (${dDot("pa.embedding", "pb.embedding")})
              / (sqrt(${dDot("pa.embedding", "pa.embedding")})
                 * sqrt(${dDot("pb.embedding", "pb.embedding")})) AS cos
          FROM cand
          JOIN embeddings pa ON cand.probe_id = pa.vec_id
          JOIN embeddings pb ON cand.nn_id = pb.vec_id)
        SELECT probe_id, nn_id, cos, rank FROM (
          SELECT *, row_number() OVER (PARTITION BY probe_id
            ORDER BY cos DESC, nn_id ASC) AS rank FROM pairs)
        WHERE rank <= $topK ORDER BY probe_id, rank""")),

    // ── IVF ANN top-k (hash-sampled coarse quantizer, multi-probe) ─────
    QueryDef("q37_ann_ivf",
      (s, dir) => {
        val e = tPar(s, dir, "embeddings")
        Similarity.ivfTopK(e, e.filter(col("vec_id") < 20),
          "vec_id", "embedding", topK, ivfNlist, ivfNprobe)
          .orderBy("probe_id", "rank")
      },
      Some {
        def cos(a: String, b: String) =
          s"""(${dDot(a, b)}) / (sqrt(${dDot(a, a)}) * sqrt(${dDot(b, b)}))"""
        s"""WITH cents AS (
            SELECT vec_id AS cid, embedding AS cvec FROM embeddings
            ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id LIMIT $ivfNlist),
          scored AS (
            SELECT e.vec_id, cid,
              ${cos("e.embedding", "cvec")} AS ccos
            FROM embeddings e CROSS JOIN cents),
          ranked AS (
            SELECT *, row_number() OVER (PARTITION BY vec_id
              ORDER BY ccos DESC, cid ASC) AS rn FROM scored),
          cell AS (
            SELECT vec_id, cid AS cell FROM ranked WHERE rn = 1),
          pcell AS (
            SELECT vec_id, cid AS cell FROM ranked
            WHERE rn <= $ivfNprobe AND vec_id < 20),
          v AS (SELECT e.vec_id, e.embedding, cell
            FROM embeddings e JOIN cell USING (vec_id)),
          pv AS (SELECT e.vec_id, e.embedding, cell
            FROM embeddings e JOIN pcell USING (vec_id)),
          pairs AS (
            SELECT a.vec_id AS probe_id, b.vec_id AS nn_id,
              ${cos("a.embedding", "b.embedding")} AS cos
            FROM pv a JOIN v b ON a.cell = b.cell AND a.vec_id <> b.vec_id)
          SELECT probe_id, nn_id, cos, rank FROM (
            SELECT *, row_number() OVER (PARTITION BY probe_id
              ORDER BY cos DESC, nn_id ASC) AS rank FROM pairs)
          WHERE rank <= $topK ORDER BY probe_id, rank"""
      }),

    // ── Multimodal: binary payload + stubbed batched decode ────────────
    QueryDef("q32_multimodal",
      (s, dir) => {
        val media = Multimodal.asMediaTable(tPar(s, dir, "documents"),
          "doc_id", "text")
        Multimodal.decodeFeatures(media).select(
          col("media_id"), col("byte_len"),
          element_at(col("feature"), 2).as("mean_byte"),
          element_at(col("feature"), 3).as("min_byte"),
          element_at(col("feature"), 4).as("max_byte"))
          .orderBy("media_id")
      },
      Some("""SELECT doc_id AS media_id,
        CAST(strlen(text) AS BIGINT) AS byte_len,
        CAST(list_sum(list_transform(range(1, strlen(text) + 1),
          i -> ascii(substr(text, CAST(i AS INT), 1)))) AS DOUBLE)
          / CAST(strlen(text) AS DOUBLE) AS mean_byte,
        CAST(list_aggregate(list_transform(range(1, strlen(text) + 1),
          i -> ascii(substr(text, CAST(i AS INT), 1))), 'min') AS DOUBLE)
          AS min_byte,
        CAST(list_aggregate(list_transform(range(1, strlen(text) + 1),
          i -> ascii(substr(text, CAST(i AS INT), 1))), 'max') AS DOUBLE)
          AS max_byte
        FROM documents ORDER BY media_id""")),

    // ── REAL image decode: PPM roundtrip channel statistics ────────────
    // Documents' utf-8 bytes are cycled into 16×16 P6 images
    // (asPpmMediaTable), decoded by the real pure-JVM PPM parser, and the
    // per-channel means must match the oracle computing the same cycled
    // statistics straight from the text column. R channel = pixel bytes
    // 0,3,6,…; byte i of the image plane = text byte (i mod len).
    QueryDef("q61_ppm_decode",
      (s, dir) => {
        val media = Multimodal.asPpmMediaTable(tPar(s, dir, "documents"),
          "doc_id", "text", 16, 16)
        Multimodal.decodeFeatures(media).select(
          col("media_id"), col("byte_len"),
          element_at(col("feature"), 1).as("width"),
          element_at(col("feature"), 2).as("height"),
          element_at(col("feature"), 3).as("mean_r"),
          element_at(col("feature"), 4).as("mean_g"),
          element_at(col("feature"), 5).as("mean_b"))
          .orderBy("media_id")
      },
      Some {
        // ascii(substr(...)) cycles CHARACTERS, the Spark side cycles
        // utf-8 BYTES — equivalent only on an ASCII corpus (true of the
        // generated testdata; a non-ASCII corpus needs a blob-typed
        // oracle). Empty text → all-zero pixels on the Spark side, hence
        // the CASE guard instead of a modulo-by-zero NULL.
        def mean(channel: Int) =
          s"""CASE WHEN strlen(text) = 0 THEN 0.0 ELSE
             CAST(list_sum(list_transform(range(0, 256),
             i -> ascii(substr(text,
               CAST((i*3 + $channel) % strlen(text) AS INT) + 1, 1))))
             AS DOUBLE) / 256.0 END"""
        s"""SELECT doc_id AS media_id,
          CAST(13 + 768 AS BIGINT) AS byte_len,
          CAST(16 AS DOUBLE) AS width, CAST(16 AS DOUBLE) AS height,
          ${mean(0)} AS mean_r, ${mean(1)} AS mean_g, ${mean(2)} AS mean_b
        FROM documents ORDER BY media_id"""
      }),

    // ── REAL image decode #2: PNG roundtrip channel statistics ─────────
    // Same cycled-pixel construction as q61, but encoded as 8-bit
    // truecolor PNG (zlib IDAT, per-row scanline filter = doc_id mod 5 so
    // all five unfilter paths are oracle-exercised) and decoded by the
    // pure-JVM PNG codec. byte_len is NOT projected: deflate output size
    // is codec-internal, not SQL-reproducible — the decoded dimensions
    // and channel means are the lossless roundtrip contract.
    QueryDef("q68_png_decode",
      (s, dir) => {
        val media = Multimodal.asPngMediaTable(tPar(s, dir, "documents"),
          "doc_id", "text", 16, 16)
        Multimodal.decodeFeatures(media).select(
          col("media_id"),
          element_at(col("feature"), 1).as("width"),
          element_at(col("feature"), 2).as("height"),
          element_at(col("feature"), 3).as("mean_r"),
          element_at(col("feature"), 4).as("mean_g"),
          element_at(col("feature"), 5).as("mean_b"))
          .orderBy("media_id")
      },
      Some {
        // identical pixel plane to q61's (the formats differ, the decoded
        // bytes must not) — see q61's ASCII-corpus caveat
        def mean(channel: Int) =
          s"""CASE WHEN strlen(text) = 0 THEN 0.0 ELSE
             CAST(list_sum(list_transform(range(0, 256),
             i -> ascii(substr(text,
               CAST((i*3 + $channel) % strlen(text) AS INT) + 1, 1))))
             AS DOUBLE) / 256.0 END"""
        s"""SELECT doc_id AS media_id,
          CAST(16 AS DOUBLE) AS width, CAST(16 AS DOUBLE) AS height,
          ${mean(0)} AS mean_r, ${mean(1)} AS mean_g, ${mean(2)} AS mean_b
        FROM documents ORDER BY media_id"""
      }),

    // ── REAL image decode #3: JPEG (JDK ImageIO) tolerance roundtrip ───
    // JPEG is lossy, so exact channel means are not oracle-able; instead
    // the query itself checks the decode against the EXACT source
    // statistics (computable from the text column, same cycling as q61)
    // and emits the verdict — which IS exactly oracle-able. Tolerance
    // 4.0: measured worst-case mean deviation over 2 000 adversarial
    // 16×16 ASCII-noise images is 2.07, so the bound has 2× headroom yet
    // any real decoder defect (wrong plane order, off-by-one stride,
    // garbage inflate) lands far outside it.
    QueryDef("q69_jpeg_decode",
      (s, dir) => {
        val docs = tPar(s, dir, "documents")
        val media = Multimodal.asJpegMediaTable(docs, "doc_id", "text",
          16, 16)
        val decoded = Multimodal.decodeFeatures(media).select(
          col("media_id"),
          element_at(col("feature"), 1).as("width"),
          element_at(col("feature"), 2).as("height"),
          element_at(col("feature"), 3).as("dec_r"),
          element_at(col("feature"), 4).as("dec_g"),
          element_at(col("feature"), 5).as("dec_b"))
        // exact pre-encode channel mean, from the text (ASCII corpus:
        // chars == utf-8 bytes, see q61's caveat)
        def expMean(c: Int) = expr(
          s"""CASE WHEN length(text) = 0 THEN 0.0D ELSE
             aggregate(transform(sequence(0, 255),
               i -> CAST(ascii(substr(text,
                 CAST((i*3 + $c) % length(text) AS INT) + 1, 1)) AS DOUBLE)),
               0.0D, (acc, x) -> acc + x) / 256.0D END""")
        val expected = docs.select(col("doc_id").cast("long").as("media_id"),
          expMean(0).as("exp_r"), expMean(1).as("exp_g"),
          expMean(2).as("exp_b"))
        decoded.join(expected, "media_id")
          .select(col("media_id"), col("width"), col("height"),
            (abs(col("dec_r") - col("exp_r")) <= 4.0 &&
              abs(col("dec_g") - col("exp_g")) <= 4.0 &&
              abs(col("dec_b") - col("exp_b")) <= 4.0)
              .as("means_within_tol"))
          .orderBy("media_id")
      },
      Some("""SELECT doc_id AS media_id, CAST(16 AS DOUBLE) AS width,
        CAST(16 AS DOUBLE) AS height, true AS means_within_tol
        FROM documents ORDER BY media_id""")),

    // ── REAL image decode #4: GIF (palette-indexed, lossless here) ─────
    // GIF can't hold arbitrary truecolor losslessly, so the table is
    // built GRAYSCALE under an explicit (i,i,i) palette — the encode
    // stores palette + indices verbatim and the decode is bit-exact:
    // r = g = b = src[(3·p) mod len], i.e. q61's channel-0 cycling. All
    // three decoded means are therefore the SAME exact SQL expression.
    QueryDef("q87_gif_decode",
      (s, dir) => {
        val media = Multimodal.asGifMediaTable(tPar(s, dir, "documents"),
          "doc_id", "text", 16, 16)
        Multimodal.decodeFeatures(media).select(
          col("media_id"),
          element_at(col("feature"), 1).as("width"),
          element_at(col("feature"), 2).as("height"),
          element_at(col("feature"), 3).as("mean_r"),
          element_at(col("feature"), 4).as("mean_g"),
          element_at(col("feature"), 5).as("mean_b"))
          .orderBy("media_id")
      },
      Some {
        // q61's caveat: ascii() cycles characters ≡ utf-8 bytes on the
        // ASCII testdata corpus
        val gray =
          s"""CASE WHEN strlen(text) = 0 THEN 0.0 ELSE
             CAST(list_sum(list_transform(range(0, 256),
             i -> ascii(substr(text,
               CAST((i*3) % strlen(text) AS INT) + 1, 1))))
             AS DOUBLE) / 256.0 END"""
        s"""SELECT doc_id AS media_id,
          CAST(16 AS DOUBLE) AS width, CAST(16 AS DOUBLE) AS height,
          $gray AS mean_r, $gray AS mean_g, $gray AS mean_b
        FROM documents ORDER BY media_id"""
      }),

    // ── REAL image decode #5: BMP (uncompressed 24-bit, lossless) ──────
    // The q61/q68 cycled RGB plane through the JDK's BMP writer
    // (BI_RGB): bit-exact roundtrip, so q61's exact channel-mean oracle
    // carries over verbatim (minus byte_len, which is header-dependent).
    QueryDef("q88_bmp_decode",
      (s, dir) => {
        val media = Multimodal.asBmpMediaTable(tPar(s, dir, "documents"),
          "doc_id", "text", 16, 16)
        Multimodal.decodeFeatures(media).select(
          col("media_id"),
          element_at(col("feature"), 1).as("width"),
          element_at(col("feature"), 2).as("height"),
          element_at(col("feature"), 3).as("mean_r"),
          element_at(col("feature"), 4).as("mean_g"),
          element_at(col("feature"), 5).as("mean_b"))
          .orderBy("media_id")
      },
      Some {
        def mean(channel: Int) =
          s"""CASE WHEN strlen(text) = 0 THEN 0.0 ELSE
             CAST(list_sum(list_transform(range(0, 256),
             i -> ascii(substr(text,
               CAST((i*3 + $channel) % strlen(text) AS INT) + 1, 1))))
             AS DOUBLE) / 256.0 END"""
        s"""SELECT doc_id AS media_id,
          CAST(16 AS DOUBLE) AS width, CAST(16 AS DOUBLE) AS height,
          ${mean(0)} AS mean_r, ${mean(1)} AS mean_g, ${mean(2)} AS mean_b
        FROM documents ORDER BY media_id"""
      }),

    // ── BM25 ranked retrieval (q71's TF ranking, upgraded) ─────────────
    // Disjunctive BM25 over the search terms: postings (doc, term, tf)
    // from one tokenize pass, df per term and corpus stats broadcast
    // (3 rows + 1 row — never a big-side shuffle), the per-term score a
    // pure arithmetic expression, per-doc sum on decimal (Parity). The
    // idf is the rational odds form (see Params.bm25K1 doc): identical
    // per-term ORDERING to ln-idf BM25, and bit-exact across engines
    // because it stays inside correctly-rounded IEEE ops. Scale shape:
    // inverted-index postings + two tiny broadcasts; no all-pairs, no
    // global sort (TakeOrdered for the top-N).
    QueryDef("q89_bm25",
      (s, dir) => graft.ext.Search.bm25(tPar(s, dir, "documents"),
        "doc_id", "text", searchTerms, bm25K1, bm25B, bm25TopN),
      Some {
        val inList = searchTerms.map(t => s"'$t'").mkString(", ")
        s"""WITH toks AS (SELECT doc_id, $dTok AS toks FROM documents),
          dl AS (SELECT doc_id, len(toks) AS dl FROM toks),
          stats AS (SELECT COUNT(*) AS n_docs,
            CAST(SUM(dl) AS DOUBLE) / COUNT(*) AS avgdl FROM dl),
          tf AS (SELECT doc_id, tok, COUNT(*) AS tf
            FROM (SELECT doc_id, unnest(toks) AS tok FROM toks)
            WHERE tok IN ($inList) GROUP BY 1, 2),
          dfs AS (SELECT tok, COUNT(*) AS df FROM tf GROUP BY 1),
          term AS (SELECT t.doc_id,
              ((CAST(s.n_docs AS DOUBLE) - CAST(f.df AS DOUBLE) + 0.5)
                / (CAST(f.df AS DOUBLE) + 0.5)) *
              ((CAST(t.tf AS DOUBLE) * ($bm25K1 + 1.0)) /
                (CAST(t.tf AS DOUBLE) + $bm25K1 * ((1.0 - $bm25B) +
                  $bm25B * (CAST(d.dl AS DOUBLE) / s.avgdl)))) AS tscore
            FROM tf t JOIN dfs f USING (tok) JOIN dl d USING (doc_id)
            CROSS JOIN stats s)
        SELECT doc_id, COUNT(*) AS n_terms, ${dsumSql("tscore")} AS score
        FROM term GROUP BY doc_id
        ORDER BY score DESC, doc_id LIMIT $bm25TopN"""
      }),

    // ── Stratified sampling: exact k per stratum on the top-k operator ─
    // Uniform-without-replacement k docs per source: a deterministic
    // md5 priority (retry-safe, re-runs pick the SAME sample) and the
    // custom heap-based per-key top-k physical operator — no per-group
    // sort at 100 TB, state is k rows per stratum. The Bernoulli twin
    // (rate-based, q59) can't promise exact strata sizes; this does.
    QueryDef("q90_stratified_sample",
      (s, dir) => {
        val pri = tPar(s, dir, "documents").select(col("source"),
          col("doc_id"),
          Shingles.baseHash(concat(lit("q90|"),
            col("doc_id").cast("string"))).as("pri"))
        graft.plans.TopKPerKey.topKPerKey(pri, Seq("source"),
          Seq(graft.plans.TopKPerKey.Sort("pri"),
            graft.plans.TopKPerKey.Sort("doc_id")), stratumK)
          .select("source", "doc_id", "pri", "rank")
          .orderBy("source", "rank")
      },
      Some(s"""WITH p AS (SELECT source, doc_id,
          ('0x' || substr(md5('q90|' || CAST(doc_id AS VARCHAR)), 1, 7))
            ::BIGINT AS pri
        FROM documents)
        SELECT source, doc_id, pri, rank FROM (
          SELECT *, row_number() OVER (PARTITION BY source
            ORDER BY pri ASC, doc_id ASC) AS rank FROM p)
        WHERE rank <= $stratumK ORDER BY source, rank""")),

    // ── Recency-decayed engagement score (training-feature staple) ─────
    // Per user: Σ value · 2^(−age_days). Base-2 daily decay multiplies
    // by an exact power of two (exponent shift only), so each term is
    // the correctly-rounded product both engines agree on. The decimal-
    // sum trick is deliberately NOT used here: power-of-2 terms have
    // TERMINATING decimal expansions that land exactly on rounding-tie
    // boundaries, where Spark's decimal cast (HALF_UP) and DuckDB's
    // (half-even) disagree — measured 3e-8 drift. Instead each term is
    // floor-quantized to 1e-8 (floor has no tie cases) and summed as
    // exact longs. One scan, one map-side-partial agg; no window/join.
    QueryDef("q91_decay_score",
      (s, dir) => t(s, dir, "events")
        .withColumn("age", datediff(lit(java.sql.Date.valueOf(decayAnchor)),
          col("ts").cast("date")).cast("double"))
        .groupBy("user_id")
        .agg(count(lit(1)).as("n_events"),
          (sum(floor((col("value") * pow(lit(2.0), -col("age"))) *
            lit(1.0e8))).cast("double") / lit(1.0e8)).as("decay_score"))
        .orderBy("user_id"),
      Some(s"""SELECT user_id, COUNT(*) AS n_events,
        CAST(SUM(CAST(floor((value * pow(2.0,
            -CAST(date_diff('day', CAST(ts AS DATE),
              DATE '$decayAnchor') AS DOUBLE))) * 100000000.0)
          AS BIGINT)) AS DOUBLE) / 100000000.0 AS decay_score
        FROM events GROUP BY user_id ORDER BY user_id""")),

    // ── Hybrid retrieval: reciprocal-rank fusion (RAG-curation shape) ──
    // Fuse the keyword leg (q71's conjunctive TF ranking) with the
    // vector leg (q30's exact cosine ranking, ids aligned doc_id ≡
    // vec_id) by RRF: Σ 1/(k + rank) over the legs a doc appears in.
    // Ranks are integers and 1/(k+r) is one correctly-rounded division,
    // the two-leg sum is one fixed-order addition — bit-exact parity
    // without any decimal detour. Depth-limited legs (top-100 each)
    // keep the fusion a join of two tiny rankings at any corpus scale.
    QueryDef("q92_rrf_fusion",
      (s, dir) => {
        val kw = tPar(s, dir, "documents")
          .select(col("doc_id"), explode(TextStats.tokens(col("text")))
            .as("tok"))
          .filter(col("tok").isin(searchTerms: _*))
          .groupBy("doc_id")
          .agg(countDistinct(col("tok")).as("n_terms"),
            count(lit(1)).as("tf"))
          .filter(col("n_terms") === searchTerms.size)
          .orderBy(desc("tf"), col("doc_id")).limit(rrfDepth)
          .withColumn("kw_rank", row_number().over(
            boundedWindow(desc("tf"), col("doc_id"))).cast("long"))
          .select(col("doc_id").as("id"), col("kw_rank"))
        val vec = Similarity.bruteForceTopK(tPar(s, dir, "embeddings"),
            t(s, dir, "embeddings").filter(col("vec_id") === 0),
            "vec_id", "embedding", rrfDepth)
          .select(col("nn_id").as("id"), col("rank").as("vec_rank"))
        val kR = lit(rrfK.toDouble)
        kw.join(vec, Seq("id"), "full_outer")
          .select(col("id"),
            (coalesce(lit(1.0) / (kR + col("kw_rank").cast("double")),
              lit(0.0)) +
             coalesce(lit(1.0) / (kR + col("vec_rank").cast("double")),
               lit(0.0))).as("rrf"),
            col("kw_rank"), col("vec_rank"))
          .orderBy(desc("rrf"), col("id")).limit(rrfTopN)
      },
      Some {
        val inList = searchTerms.map(t => s"'$t'").mkString(", ")
        s"""WITH kwm AS (SELECT doc_id, COUNT(DISTINCT tok) AS n_terms,
            COUNT(*) AS tf
          FROM (SELECT doc_id, unnest($dTok) AS tok FROM documents)
          WHERE tok IN ($inList) GROUP BY doc_id),
        kw AS (SELECT id, kw_rank FROM (
            SELECT doc_id AS id, CAST(row_number() OVER (
              ORDER BY tf DESC, doc_id) AS BIGINT) AS kw_rank
            FROM kwm WHERE n_terms = ${searchTerms.size})
          WHERE kw_rank <= $rrfDepth),
        pairs AS (SELECT b.vec_id AS id,
            (${dDot("a.embedding", "b.embedding")})
              / (sqrt(${dDot("a.embedding", "a.embedding")})
                 * sqrt(${dDot("b.embedding", "b.embedding")})) AS cos
          FROM embeddings a JOIN embeddings b ON a.vec_id <> b.vec_id
          WHERE a.vec_id = 0),
        vec AS (SELECT id, vec_rank FROM (
            SELECT id, row_number() OVER (ORDER BY cos DESC, id ASC)
              AS vec_rank FROM pairs)
          WHERE vec_rank <= $rrfDepth)
        SELECT COALESCE(kw.id, vec.id) AS id,
          (COALESCE(CAST(1.0 AS DOUBLE)
              / ($rrfK.0 + CAST(kw_rank AS DOUBLE)), 0.0) +
           COALESCE(CAST(1.0 AS DOUBLE)
              / ($rrfK.0 + CAST(vec_rank AS DOUBLE)), 0.0)) AS rrf,
          kw_rank, vec_rank
        FROM kw FULL OUTER JOIN vec ON kw.id = vec.id
        ORDER BY rrf DESC, id LIMIT $rrfTopN"""
      }),

    // ── Embedding-space QC: label-centroid similarity matrix ───────────
    // Pairwise cosine between per-label mean-pool centroids (drift /
    // class-collapse monitoring). The pair enumeration is an EQUI-join
    // on the dimension index — never a cartesian — and every sum rides
    // decimal (q77's discipline), so the 64-term dots are
    // order-independent; sqrt/division happen once at the edge.
    QueryDef("q93_centroid_similarity",
      (s, dir) => {
        val dims = tPar(s, dir, "embeddings")
          .select(col("label"), posexplode(col("embedding"))
            .as(Seq("dim", "v")))
          .groupBy("label", "dim")
          .agg((dsum(col("v")) / count(lit(1))).as("mean_v"))
        val dots = dims.select(col("label").as("label_a"), col("dim"),
            col("mean_v").as("va"))
          .join(dims.select(col("label").as("label_b"), col("dim"),
            col("mean_v").as("vb")), Seq("dim"))
          .filter(col("label_a") < col("label_b"))
          .groupBy("label_a", "label_b")
          .agg(dsum(col("va") * col("vb")).as("dot"))
        val norms = dims.groupBy("label")
          .agg(dsum(col("mean_v") * col("mean_v")).as("nrm"))
        dots
          .join(norms.select(col("label").as("label_a"),
            col("nrm").as("na")), "label_a")
          .join(norms.select(col("label").as("label_b"),
            col("nrm").as("nb")), "label_b")
          .select(col("label_a"), col("label_b"),
            (col("dot") / (sqrt(col("na")) * sqrt(col("nb")))).as("cos"))
          .orderBy("label_a", "label_b")
      },
      Some(s"""WITH e AS (SELECT label,
            generate_subscripts(embedding, 1) - 1 AS dim,
            unnest(embedding) AS v
          FROM embeddings),
        c AS (SELECT label, dim,
            ${dsumSql("CAST(v AS DOUBLE)")} / COUNT(*) AS mean_v
          FROM e GROUP BY label, dim),
        d AS (SELECT a.label AS label_a, b.label AS label_b,
            ${dsumSql("a.mean_v * b.mean_v")} AS dot
          FROM c a JOIN c b ON a.dim = b.dim AND a.label < b.label
          GROUP BY 1, 2),
        n AS (SELECT label, ${dsumSql("mean_v * mean_v")} AS nrm
          FROM c GROUP BY label)
        SELECT label_a, label_b,
          dot / (sqrt(na.nrm) * sqrt(nb.nrm)) AS cos
        FROM d JOIN n na ON d.label_a = na.label
        JOIN n nb ON d.label_b = nb.label
        ORDER BY label_a, label_b""")),

    // ── Unpivot / melt (wide → long reshape) ───────────────────────────
    // The inverse of q39's pivot: three measure columns melt into
    // (measure, val) rows via the native Dataset.unpivot — map-side
    // row expansion, no shuffle beyond the output ordering.
    QueryDef("q94_unpivot",
      (s, dir) => t(s, dir, "lineitem")
        .filter(col("l_orderkey") <= 2000)
        .select(col("l_orderkey"), col("l_linenumber"),
          col("l_quantity").cast("double"),
          col("l_extendedprice").cast("double"),
          col("l_discount").cast("double"))
        .unpivot(Array(col("l_orderkey"), col("l_linenumber")),
          Array(col("l_quantity"), col("l_extendedprice"),
            col("l_discount")),
          "measure", "val")
        .orderBy("l_orderkey", "l_linenumber", "measure"),
      Some("""SELECT l_orderkey, l_linenumber, m AS measure, v AS val
        FROM (
          SELECT l_orderkey, l_linenumber, 'l_quantity' AS m,
            CAST(l_quantity AS DOUBLE) AS v FROM lineitem
          UNION ALL SELECT l_orderkey, l_linenumber, 'l_extendedprice',
            CAST(l_extendedprice AS DOUBLE) FROM lineitem
          UNION ALL SELECT l_orderkey, l_linenumber, 'l_discount',
            CAST(l_discount AS DOUBLE) FROM lineitem)
        WHERE l_orderkey <= 2000
        ORDER BY l_orderkey, l_linenumber, measure""")),

    // ── KMV join-cardinality estimation (the CBO primitive) ────────────
    // Sketch both key domains with k minimum hashes, estimate D_A, D_B,
    // D_∪ (the k smallest of the union), D_∩ (Jaccard from shared
    // sketch members), and the equi-join size under the uniform-
    // frequency model. Each side costs one scan + a k-row TakeOrdered;
    // the estimator is a pure function of the md5 family, so every
    // number — including the final join-size estimate — is oracle-exact.
    QueryDef("q95_join_cardinality",
      (s, dir) => graft.ext.Sketches.kmvJoinCardinality(
        t(s, dir, "events"), col("user_id"),
        t(s, dir, "customer"), col("c_custkey"), kmvK),
      Some {
        def est(kc: String, kth: String) =
          s"""CASE WHEN $kc < $kmvK THEN CAST($kc AS DOUBLE)
             ELSE CAST($kc - 1 AS DOUBLE) * CAST(268435456.0 AS DOUBLE)
               / CAST($kth AS DOUBLE) END"""
        def hcte(src: String, key: String) =
          s"""SELECT DISTINCT ('0x' || substr(md5(CAST($key AS VARCHAR)),
             1, 7))::BIGINT AS h FROM $src"""
        s"""WITH ka AS (SELECT h, 1 AS in_a FROM (${hcte("events", "user_id")})
            ORDER BY h LIMIT $kmvK),
          kb AS (SELECT h, 1 AS in_b FROM (${hcte("customer", "c_custkey")})
            ORDER BY h LIMIT $kmvK),
          sa AS (SELECT COUNT(*) AS kc, MAX(h) AS kth FROM ka),
          sb AS (SELECT COUNT(*) AS kc, MAX(h) AS kth FROM kb),
          na AS (SELECT COUNT(*) AS n_a FROM events),
          nb AS (SELECT COUNT(*) AS n_b FROM customer),
          u AS (SELECT COALESCE(ka.h, kb.h) AS h,
              COALESCE(in_a, 0) AS in_a, COALESCE(in_b, 0) AS in_b
            FROM ka FULL OUTER JOIN kb ON ka.h = kb.h
            ORDER BY h LIMIT $kmvK),
          uu AS (SELECT COUNT(*) AS ku, MAX(h) AS kth_u,
            CAST(SUM(in_a * in_b) AS BIGINT) AS n_both FROM u)
        SELECT n_a, n_b, n_both,
          ${est("sa.kc", "sa.kth")} AS d_a,
          ${est("sb.kc", "sb.kth")} AS d_b,
          ${est("uu.ku", "uu.kth_u")} AS d_union,
          (CAST(n_both AS DOUBLE) / CAST(ku AS DOUBLE))
            * (${est("uu.ku", "uu.kth_u")}) AS d_intersect,
          ((CAST(n_a AS DOUBLE) / (${est("sa.kc", "sa.kth")}))
            * (CAST(n_b AS DOUBLE) / (${est("sb.kc", "sb.kth")})))
            * ((CAST(n_both AS DOUBLE) / CAST(ku AS DOUBLE))
              * (${est("uu.ku", "uu.kth_u")})) AS join_size_est
        FROM uu CROSS JOIN sa CROSS JOIN sb CROSS JOIN na CROSS JOIN nb"""
      }),

    // ── Z-order zone maps (multi-dimensional data skipping) ────────────
    // OPTIMIZE ZORDER, materialized: Morton-interleave (custkey,
    // order-day) into a z-value, cut the z-sorted table into 64
    // equal-size "files" (ntile), and emit each file's ZONE MAP —
    // min/max of z and of BOTH source dimensions — the stats file
    // skipping reads. Z-sorting gives every file a tight box in both
    // dimensions at once, so a 2-d box predicate prunes on min/max
    // alone (a single-column sort leaves the second dimension's
    // min/max spanning the full domain — proven quantitatively in
    // ScaleFeaturesSpec). Pure long arithmetic — oracle-exact. At
    // 100 TB the ntile becomes repartitionByRange(z) (sampled
    // boundaries); the zone-map math is identical.
    QueryDef("q96_zorder_zonemap",
      (s, dir) => {
        // raw dimensions carry UNEQUAL bit widths (1.5k keys vs 2.4k
        // days starting at epoch-day ~9k) — interleaving them directly
        // degenerates to a sort on whichever dimension owns the high
        // bits. Normalize both to a common 10-bit range first (what
        // production z-ordering does), relationally so the oracle can
        // reproduce it: min/max from one tiny agg, integer `div`.
        val o = t(s, dir, "orders").select(col("o_orderkey"),
          col("o_custkey").cast("long").as("x"),
          unix_date(to_date(col("o_orderdate"))).cast("long").as("y"))
        val stats = o.agg(
          min("x").as("xmin"), (max("x") - min("x") + 1L).as("xspan"),
          min("y").as("ymin"), (max("y") - min("y") + 1L).as("yspan"))
        val n = o.crossJoin(broadcast(stats))
          .withColumn("xn", expr("((x - xmin) * 1024) div xspan"))
          .withColumn("yn", expr("((y - ymin) * 1024) div yspan"))
          .withColumn("z",
            graft.functions.NativeExprs.zValue(col("xn"), col("yn"), 10))
          .withColumn("file_id", ntile(64).over(
            boundedWindow(col("z"), col("o_orderkey"))).cast("long"))
        n.groupBy("file_id").agg(
            count(lit(1)).as("n_rows"),
            min("z").as("min_z"), max("z").as("max_z"),
            min("x").as("min_custkey"), max("x").as("max_custkey"),
            min("y").as("min_day"), max("y").as("max_day"))
          .orderBy("file_id")
      },
      Some(s"""WITH o AS (SELECT o_orderkey,
          CAST(o_custkey AS BIGINT) AS x,
          CAST(date_diff('day', DATE '1970-01-01',
            CAST(o_orderdate AS DATE)) AS BIGINT) AS y
        FROM orders),
        s AS (SELECT MIN(x) AS xmin, MAX(x) - MIN(x) + 1 AS xspan,
          MIN(y) AS ymin, MAX(y) - MIN(y) + 1 AS yspan FROM o),
        nrm AS (SELECT o_orderkey, x, y,
          ((x - xmin) * 1024) // xspan AS xn,
          ((y - ymin) * 1024) // yspan AS yn
          FROM o CROSS JOIN s),
        z AS (SELECT o_orderkey, x, y,
          ${dZInterleave("xn", "yn", 10)} AS z FROM nrm),
        f AS (SELECT x, y, z, CAST(ntile(64) OVER (
          ORDER BY z, o_orderkey) AS BIGINT) AS file_id FROM z)
        SELECT file_id, COUNT(*) AS n_rows,
          MIN(z) AS min_z, MAX(z) AS max_z,
          MIN(x) AS min_custkey, MAX(x) AS max_custkey,
          MIN(y) AS min_day, MAX(y) AS max_day
        FROM f GROUP BY 1 ORDER BY file_id""")),

    // ── Token co-occurrence + lift (corpus association mining) ─────────
    // Which vocabulary terms co-occur in documents beyond chance? Doc-
    // level distinct tokens joined against the top-50 vocabulary
    // (BROADCAST — bounds per-doc pairs at C(50,2) regardless of corpus
    // size), pair counts from an equi-join on doc_id, and lift =
    // (c_ab·N)/(c_a·c_b) — the log-free association score: a ratio of
    // exact integers in fixed-order IEEE arithmetic, so it is bit-exact
    // where PMI's logarithm would not be. The vocabulary cap is the
    // scale contract: without it doc-level all-pairs is quadratic.
    QueryDef("q98_token_lift",
      (s, dir) => {
        val docs = tPar(s, dir, "documents")
        val docTok = docs.select(col("doc_id"),
          explode(TextStats.tokens(col("text"))).as("token")).distinct()
        val vocab = docTok.groupBy("token").agg(count(lit(1)).as("c"))
          .orderBy(desc("c"), col("token")).limit(50)
        val nDocs = docs.agg(count(lit(1)).as("n_docs"))
        val vt = docTok.join(broadcast(vocab), "token")
        vt.select(col("doc_id"), col("token").as("ta"), col("c").as("ca"))
          .join(vt.select(col("doc_id"), col("token").as("tb"),
            col("c").as("cb")), Seq("doc_id"))
          .filter(col("ta") < col("tb"))
          .groupBy("ta", "tb", "ca", "cb")
          .agg(count(lit(1)).as("c_ab"))
          .crossJoin(broadcast(nDocs))
          .select(col("ta"), col("tb"), col("c_ab"),
            ((col("c_ab").cast("double") * col("n_docs").cast("double")) /
              (col("ca").cast("double") * col("cb").cast("double")))
              .as("lift"))
          .orderBy(desc("c_ab"), col("ta"), col("tb")).limit(25)
      },
      Some(s"""WITH dt AS (SELECT DISTINCT doc_id, tok AS token
          FROM (SELECT doc_id, unnest($dTok) AS tok FROM documents)),
        v AS (SELECT token, COUNT(*) AS c FROM dt GROUP BY 1
          ORDER BY c DESC, token LIMIT 50),
        n AS (SELECT COUNT(*) AS n_docs FROM documents),
        vt AS (SELECT dt.doc_id, dt.token, v.c FROM dt JOIN v USING (token)),
        p AS (SELECT a.token AS ta, b.token AS tb, a.c AS ca, b.c AS cb,
            COUNT(*) AS c_ab
          FROM vt a JOIN vt b ON a.doc_id = b.doc_id AND a.token < b.token
          GROUP BY 1, 2, 3, 4)
        SELECT ta, tb, c_ab,
          (CAST(c_ab AS DOUBLE) * CAST(n_docs AS DOUBLE))
            / (CAST(ca AS DOUBLE) * CAST(cb AS DOUBLE)) AS lift
        FROM p CROSS JOIN n
        ORDER BY c_ab DESC, ta, tb LIMIT 25""")),

    // ── Time travel: AS-OF read of the versioned dimension ─────────────
    // Reconstruct the dimension EXACTLY as it stood on a historic date
    // from SCD2 validity intervals: dt_load_to_dw ≤ d < dt_last_update
    // (the sentinel keeps open rows). Composes q15's merge output — the
    // Spark side reuses the q15 QueryDef, the oracle wraps q15's SQL in
    // a CTE — so the time-travel read is verified against the SAME
    // lineage the merge gate uses. Interval predicates on the stored
    // dates: a partition-pruned scan at warehouse scale, no join.
    QueryDef("q99_asof_dim",
      (s, dir) => {
        val dim = QueriesCore.defs.find(_.name == "q15_scd2").get
          .fn(s, dir)
        val asOf = lit(Date.valueOf("2020-01-01"))
        dim.filter(col("dt_load_to_dw") <= asOf &&
            asOf < col("dt_last_update"))
          .select("custkey", "n_orders", "max_price")
          .orderBy("custkey")
      },
      Some {
        val q15Sql = QueriesCore.defs.find(_.name == "q15_scd2").get
          .oracle.get
        s"""WITH dim AS ($q15Sql)
        SELECT custkey, n_orders, max_price FROM dim
        WHERE dt_load_to_dw <= DATE '2020-01-01'
          AND DATE '2020-01-01' < dt_last_update
        ORDER BY custkey"""
      }),

    // ── Equal-frequency binning (feature discretization) ───────────────
    // 10 quantile bins of order value per priority class with per-bin
    // zone stats — the categorical-feature builder. ntile over a
    // per-group window (each group sorts independently — parallel by
    // key); deterministic via the orderkey tiebreak.
    QueryDef("q100_ntile_binning",
      (s, dir) => {
        val w = Window.partitionBy("o_orderpriority")
          .orderBy(col("o_totalprice"), col("o_orderkey"))
        t(s, dir, "orders")
          .withColumn("bin", ntile(10).over(w).cast("long"))
          .groupBy("o_orderpriority", "bin")
          .agg(count(lit(1)).as("n"), min("o_totalprice").as("lo"),
            max("o_totalprice").as("hi"))
          .orderBy("o_orderpriority", "bin")
      },
      Some("""SELECT o_orderpriority, bin, COUNT(*) AS n,
          MIN(o_totalprice) AS lo, MAX(o_totalprice) AS hi
        FROM (SELECT o_orderpriority, o_totalprice,
          CAST(ntile(10) OVER (PARTITION BY o_orderpriority
            ORDER BY o_totalprice, o_orderkey) AS BIGINT) AS bin
          FROM orders)
        GROUP BY 1, 2 ORDER BY o_orderpriority, bin""")),

    // ── Incremental aggregate maintenance (materialized-view fold) ─────
    // The input arrives as three day-range batches; each is reduced to
    // mergeable partials (count + exact decimal sum) and folded into
    // state. Decimal associativity makes ANY batching bit-identical to
    // the full recompute — which is precisely what the oracle is: one
    // plain GROUP BY over the whole table. The state fold shuffles
    // per-batch partials (5 rows), never history.
    QueryDef("q97_incremental_agg",
      (s, dir) => {
        import graft.etl.IncrementalAgg
        val ev = t(s, dir, "events")
        val day = dayofmonth(col("ts"))
        val batches = Seq(ev.filter(day <= 10),
          ev.filter(day > 10 && day <= 20), ev.filter(day > 20))
        val state = batches
          .map(b => IncrementalAgg.partial(b, Seq("event_type"),
            col("value")))
          .reduce((a, b) => IncrementalAgg.merge(a, b, Seq("event_type")))
        IncrementalAgg.finish(state, Seq("event_type"))
          .orderBy("event_type")
      },
      Some(s"""SELECT event_type, COUNT(*) AS n,
          ${dsumSql("value")} AS total,
          ${dsumSql("value")} / COUNT(*) AS avg_value
        FROM events GROUP BY event_type ORDER BY event_type""")),

    // ── REAL audio decode: WAV (RIFF/PCM16) channel statistics ─────────
    // The audio leg of the multimodal contract goes real: each doc's
    // bytes become 256 mono PCM16 samples ((byte−128)·256), encoded as
    // canonical WAV, decoded by the pure-JVM chunk-walking parser, and
    // the per-channel mean is integer-exact until one final division —
    // same oracle discipline as q61/q68. Lossless, so exact hash match.
    QueryDef("q75_wav_decode",
      (s, dir) => {
        val media = Multimodal.asWavMediaTable(tPar(s, dir, "documents"),
          "doc_id", "text", 256, 16000)
        Multimodal.decodeFeatures(media).select(
          col("media_id"),
          element_at(col("feature"), 1).as("channels"),
          element_at(col("feature"), 2).as("sample_rate"),
          element_at(col("feature"), 3).as("frames"),
          element_at(col("feature"), 4).as("mean_amp"))
          .orderBy("media_id")
      },
      // ASCII corpus: chars == utf-8 bytes (q61's caveat)
      Some("""SELECT doc_id AS media_id, CAST(1 AS DOUBLE) AS channels,
          CAST(16000 AS DOUBLE) AS sample_rate,
          CAST(256 AS DOUBLE) AS frames,
          CASE WHEN strlen(text) = 0 THEN 0.0 ELSE
            CAST(list_sum(list_transform(range(0, 256),
              i -> (ascii(substr(text,
                CAST(i % strlen(text) AS INT) + 1, 1)) - 128) * 256))
            AS DOUBLE) / 256.0 END AS mean_amp
        FROM documents ORDER BY media_id""")),

    // ── Token counting: whitespace + BPE-ish regex (SURVEY §2.10) ──────
    QueryDef("q43_subword_count",
      (s, dir) => tPar(s, dir, "documents").select(
        col("doc_id"),
        TextStats.tokenCount(col("text")).as("n_ws_tokens"),
        TextStats.subwordCount(col("text")).as("n_subwords"))
        .orderBy("doc_id"),
      Some(s"""SELECT doc_id,
        CAST(len($dTok) AS BIGINT) AS n_ws_tokens,
        CAST(len(regexp_extract_all(text, '[^ .,!?;:]+|[.,!?;:]'))
          AS BIGINT) AS n_subwords
        FROM documents ORDER BY doc_id""")),

    // ── Semi-structured: JSON property extraction + aggregation ────────
    QueryDef("q33_json_extract",
      (s, dir) => t(s, dir, "events")
        .withColumn("k_val",
          get_json_object(col("props"), "$.k").cast("long"))
        .groupBy("event_type")
        .agg(lsum(col("k_val")).as("sum_k"),
          count(col("k_val")).as("n_with_k"))
        .orderBy("event_type"),
      Some("""SELECT event_type,
        CAST(SUM(CAST(json_extract_string(props, '$.k') AS BIGINT))
          AS BIGINT) AS sum_k,
        COUNT(CAST(json_extract_string(props, '$.k') AS BIGINT))
          AS n_with_k
        FROM events GROUP BY event_type ORDER BY event_type""")),

    // ── Exact percentiles via positional selection (engine-portable) ───
    QueryDef("q34_percentiles",
      (s, dir) => {
        val w = Window.partitionBy("c_mktsegment")
          .orderBy(col("c_acctbal").asc, col("c_custkey").asc)
        val ranked = t(s, dir, "customer")
          .withColumn("rn", row_number().over(w).cast("long"))
          .withColumn("n",
            count(lit(1)).over(Window.partitionBy("c_mktsegment")))
        val midLo = floor((col("n") + 1) / 2)
        val midHi = floor((col("n") + 2) / 2)
        val p90 = ceil(col("n") * 0.9)
        ranked.groupBy("c_mktsegment").agg(
          (sum(when(col("rn") === midLo || col("rn") === midHi,
            col("c_acctbal"))) /
            (max(midHi) - max(midLo) + lit(1))).as("median_bal"),
          max(when(col("rn") === p90, col("c_acctbal"))).as("p90_bal"),
          count(lit(1)).as("n_customers"))
          .orderBy("c_mktsegment")
      },
      Some("""WITH ranked AS (SELECT c_mktsegment, c_acctbal,
          row_number() OVER (PARTITION BY c_mktsegment
            ORDER BY c_acctbal ASC, c_custkey ASC) AS rn,
          COUNT(*) OVER (PARTITION BY c_mktsegment) AS n
        FROM customer)
        SELECT c_mktsegment,
          SUM(CASE WHEN rn = floor((n + 1) / CAST(2.0 AS DOUBLE))
            OR rn = floor((n + 2) / CAST(2.0 AS DOUBLE))
            THEN c_acctbal END)
            / (max(floor((n + 2) / CAST(2.0 AS DOUBLE)))
               - max(floor((n + 1) / CAST(2.0 AS DOUBLE))) + 1)
            AS median_bal,
          max(CASE WHEN rn = ceil(n * CAST(0.9 AS DOUBLE))
            THEN c_acctbal END) AS p90_bal,
          COUNT(*) AS n_customers
        FROM ranked GROUP BY c_mktsegment ORDER BY c_mktsegment""")),

    // ── Near-dup clustering: candidate pairs → connected components ────
    QueryDef("q45_dedup_clusters",
      (s, dir) => {
        val pairs = Dedup.minhashCandidates(tPar(s, dir, "documents"),
          "doc_id", "text", shingleK, minhashHashes, minhashBandRows)
        Dedup.dedupClusters(pairs)
          .select(col("id").as("doc_id"), col("cluster"))
          .orderBy("doc_id")
      },
      Some(s"""WITH RECURSIVE $dMinhashCandCtes,
        edges AS (SELECT id_a AS u, id_b AS v FROM cand
                  UNION SELECT id_b, id_a FROM cand),
        nodes AS (SELECT DISTINCT u AS id FROM edges),
        reach(id, r) AS (
          SELECT id, id FROM nodes
          UNION
          SELECT rr.id, e.v FROM reach rr JOIN edges e ON rr.r = e.u)
        SELECT id AS doc_id, min(r) AS cluster
        FROM reach GROUP BY id ORDER BY doc_id""")),

    // ── KMV distinct sketch (deterministic → oracle-verifiable) ────────
    QueryDef("q46_kmv_distinct",
      (s, dir) => graft.ext.Sketches.kmvDistinct(
        tPar(s, dir, "orders"), col("o_custkey"), kmvK),
      Some(s"""WITH h AS (SELECT DISTINCT
          ('0x' || substr(md5(CAST(o_custkey AS VARCHAR)), 1, 7))::BIGINT
            AS h FROM orders),
        top AS (SELECT h FROM h ORDER BY h ASC LIMIT $kmvK)
        SELECT COUNT(*) AS k_actual, max(h) AS kth_hash,
          CASE WHEN COUNT(*) < $kmvK THEN CAST(COUNT(*) AS DOUBLE)
          ELSE CAST(COUNT(*) - 1 AS DOUBLE) * CAST(268435456.0 AS DOUBLE)
               / CAST(max(h) AS DOUBLE) END AS distinct_estimate
        FROM top""")),

    // ── Per-group KMV sketches on the custom top-k physical operator ───
    // Grouped distinct-user estimates per event type; the k-smallest-hash
    // selection runs on plans.TopKPerKey (heap per key, map-side
    // combining — at most k rows per group leave each map task), the
    // sketch-maintenance shape at corpus scale. Deterministic md5 hash
    // family ⇒ the oracle reproduces every estimate bit-for-bit.
    QueryDef("q73_kmv_by_group",
      (s, dir) => graft.ext.Sketches.kmvDistinctByGroup(
        t(s, dir, "events"), "event_type", col("user_id"), kmvK)
        .orderBy("event_type"),
      Some(s"""WITH h AS (SELECT DISTINCT event_type,
          ('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 7))::BIGINT AS h
          FROM events),
        r AS (SELECT event_type, h,
          row_number() OVER (PARTITION BY event_type ORDER BY h ASC) AS rn
          FROM h)
        SELECT event_type, COUNT(*) AS k_actual, max(h) AS kth_hash,
          CASE WHEN COUNT(*) < $kmvK THEN CAST(COUNT(*) AS DOUBLE)
          ELSE CAST(COUNT(*) - 1 AS DOUBLE) * CAST(268435456.0 AS DOUBLE)
               / CAST(max(h) AS DOUBLE) END AS distinct_estimate
        FROM r WHERE rn <= $kmvK GROUP BY event_type
        ORDER BY event_type""")),

    // ── Two-phase salted aggregation (skew mitigation, exact result) ───
    // The salt spreads a hot key over `salts` reducers in phase 1;
    // decimal partials make the two-phase sum bit-equal to the plain
    // single-shuffle GROUP BY the oracle runs — skew mitigation must
    // never change the answer.
    QueryDef("q74_salted_agg",
      (s, dir) => graft.ext.Skew.saltedAgg(t(s, dir, "events"),
        Seq("event_type"), col("event_id"), col("value"), salts = 8)
        .orderBy("event_type"),
      Some(s"""SELECT event_type, COUNT(*) AS n,
        ${dsumSql("value")} AS total
        FROM events GROUP BY event_type ORDER BY event_type""")),

    // ── Skew-mitigated JOIN (q74's join-side sibling) ──────────────────
    // events ⋈ per-type stats on event_type — 5 distinct keys over the
    // whole fact is the worst-case join skew (every key is hot). The
    // salted join spreads each type over 8 reduce tasks; the dim rides
    // the shuffle ×8 (5×8 rows — nothing). Exact: same matched pairs as
    // the plain join, proven against the oracle row-by-row. avg rides
    // the decimal-sum/count Parity discipline so the > comparison is
    // bit-identical.
    QueryDef("q86_skew_join",
      (s, dir) => {
        val ev = t(s, dir, "events")
        val dim = ev.groupBy("event_type").agg(davg(col("value")).as("avg_v"))
        graft.ext.Skew.saltedJoin(ev, dim, "event_type",
            col("event_id"), salts = 8)
          .select(col("event_id"), col("event_type"),
            (col("value") > col("avg_v")).as("above_avg"))
          .orderBy("event_id")
      },
      Some(s"""WITH d AS (SELECT event_type,
          ${dsumSql("value")} / COUNT(value) AS avg_v
        FROM events GROUP BY event_type)
        SELECT e.event_id, e.event_type, e.value > d.avg_v AS above_avg
        FROM events e JOIN d ON e.event_type = d.event_type
        ORDER BY e.event_id""")),

    // ── 7-day moving average (window frame ROWS BETWEEN) ───────────────
    QueryDef("q47_moving_avg",
      (s, dir) => {
        import org.apache.spark.sql.types.DecimalType
        val daily = t(s, dir, "orders")
          .groupBy(to_date(col("o_orderdate")).as("order_date"))
          .agg(sum(col("o_totalprice").cast(DecimalType(30, 8)))
            .as("rev_dec"))
        // a daily series is tiny after aggregation (thousands of rows at
        // any source scale), so the global-order window is deliberate
        val w = boundedWindow("order_date").rowsBetween(-6, 0)
        daily.select(
          col("order_date"),
          col("rev_dec").cast("double").as("revenue"),
          (sum(col("rev_dec")).over(w).cast("double") /
            count(lit(1)).over(w)).as("ma7"))
          .orderBy("order_date")
      },
      Some("""WITH daily AS (
          SELECT CAST(o_orderdate AS DATE) AS order_date,
            SUM(CAST(o_totalprice AS DECIMAL(30,8))) AS rev_dec
          FROM orders GROUP BY 1)
        SELECT order_date,
          CAST(CAST(rev_dec AS VARCHAR) AS DOUBLE) AS revenue,
          CAST(CAST(SUM(rev_dec) OVER w AS VARCHAR) AS DOUBLE)
            / COUNT(*) OVER w AS ma7
        FROM daily
        WINDOW w AS (ORDER BY order_date
          ROWS BETWEEN 6 PRECEDING AND CURRENT ROW)
        ORDER BY order_date""")),

    // ── Time-interval RANGE window frame (vs q47's ROWS frame) ────────
    // Trailing 1-hour per-user totals: the frame is VALUE-based (all
    // events within [t−1h, t] microseconds), not row-count-based — the
    // shape behind rate limiting, rolling spend caps, trailing activity
    // features. RANGE frames include ties as peers, so the result is
    // deterministic under any partition order; sums ride decimal and
    // cast to double at the edge (Parity discipline).
    QueryDef("q72_range_frame",
      (s, dir) => {
        import org.apache.spark.sql.types.DecimalType
        val w = Window.partitionBy("user_id")
          .orderBy(col("ts_us"))
          .rangeBetween(-3600L * 1000000L, 0L)
        t(s, dir, "events")
          .withColumn("ts_us", unix_micros(col("ts")))
          .select(col("event_id"), col("user_id"),
            count(lit(1)).over(w).as("n_1h"),
            sum(col("value").cast(DecimalType(30, 8))).over(w)
              .cast("double").as("sum_1h"))
          .orderBy("event_id")
      },
      Some("""SELECT event_id, user_id,
          COUNT(*) OVER w AS n_1h,
          CAST(CAST(SUM(CAST(value AS DECIMAL(30,8))) OVER w AS VARCHAR)
            AS DOUBLE) AS sum_1h
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts)
          RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW)
        ORDER BY event_id""")),

    // ── Typed Aggregator (UDAF surface; bit-compatible with dsum) ──────
    QueryDef("q49_typed_agg",
      (s, dir) => t(s, dir, "orders")
        .groupBy("o_orderstatus")
        .agg(graft.functions.TypedAggs.exactSumUdaf(col("o_totalprice"))
          .as("revenue"), count(lit(1)).as("n_orders"))
        .orderBy("o_orderstatus"),
      Some(s"""SELECT o_orderstatus, ${dsumSql("o_totalprice")} AS revenue,
        COUNT(*) AS n_orders
        FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus""")),

    // ── Generator / UDTF surface: positional token explode ─────────────
    QueryDef("q50_posexplode",
      (s, dir) => t(s, dir, "documents")
        .filter(col("doc_id") < 20)
        .select(col("doc_id"),
          posexplode(TextStats.tokens(col("text"))).as(Seq("pos", "token")))
        .withColumn("pos", col("pos").cast("long"))
        .orderBy("doc_id", "pos"),
      Some(s"""SELECT doc_id, CAST(pos AS BIGINT) AS pos, tok AS token
        FROM (SELECT doc_id, unnest(toks) AS tok,
                unnest(range(len(toks))) AS pos
              FROM (SELECT doc_id, $dTok AS toks FROM documents
                    WHERE doc_id < 20))
        ORDER BY doc_id, pos""")),

    // ── Deterministic train/val split (hash-mod, retry-safe) ───────────
    QueryDef("q51_train_split",
      (s, dir) => tPar(s, dir, "documents")
        .withColumn("split",
          when(Shingles.baseHash(col("doc_id").cast("string")) % 10 < 9,
            "train").otherwise("val"))
        .groupBy("split")
        .agg(count(lit(1)).as("n_docs"),
          min(col("doc_id")).as("min_doc_id"))
        .orderBy("split"),
      Some("""SELECT CASE WHEN
          ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 7))::BIGINT
            % 10 < 9 THEN 'train' ELSE 'val' END AS split,
        COUNT(*) AS n_docs, min(doc_id) AS min_doc_id
        FROM documents GROUP BY 1 ORDER BY split""")),

    // ── Approximate quantiles via deterministic hash-sampling ──────────
    // Exact quantiles need a full sort per group; a hash-based sample is
    // the scale path — and unlike t-digest/Greenwald-Khanna sketches the
    // estimate is a pure function of the data, so the oracle verifies it
    // EXACTLY (same trick as the KMV sketch in q46).
    QueryDef("q55_sampled_quantiles",
      (s, dir) => {
        val sampled = t(s, dir, "orders")
          .filter(Shingles.baseHash(col("o_orderkey").cast("string"))
            % 100 < 5) // deterministic ~5% sample
        val w = Window.partitionBy("o_orderpriority")
          .orderBy(col("o_totalprice").asc, col("o_orderkey").asc)
        val ranked = sampled
          .withColumn("rn", row_number().over(w).cast("long"))
          .withColumn("n",
            count(lit(1)).over(Window.partitionBy("o_orderpriority")))
        val midLo = floor((col("n") + 1) / 2)
        val midHi = floor((col("n") + 2) / 2)
        val p90 = ceil(col("n") * 0.9)
        ranked.groupBy("o_orderpriority").agg(
          (sum(when(col("rn") === midLo || col("rn") === midHi,
            col("o_totalprice"))) /
            (max(midHi) - max(midLo) + lit(1))).as("median_est"),
          max(when(col("rn") === p90, col("o_totalprice"))).as("p90_est"),
          count(lit(1)).as("n_sampled"))
          .orderBy("o_orderpriority")
      },
      Some("""WITH sampled AS (
          SELECT o_orderpriority, o_totalprice, o_orderkey FROM orders
          WHERE ('0x' || substr(md5(CAST(o_orderkey AS VARCHAR)), 1, 7))
            ::BIGINT % 100 < 5),
        ranked AS (SELECT o_orderpriority, o_totalprice,
          row_number() OVER (PARTITION BY o_orderpriority
            ORDER BY o_totalprice ASC, o_orderkey ASC) AS rn,
          COUNT(*) OVER (PARTITION BY o_orderpriority) AS n
        FROM sampled)
        SELECT o_orderpriority,
          SUM(CASE WHEN rn = floor((n + 1) / CAST(2.0 AS DOUBLE))
            OR rn = floor((n + 2) / CAST(2.0 AS DOUBLE))
            THEN o_totalprice END)
            / (max(floor((n + 2) / CAST(2.0 AS DOUBLE)))
               - max(floor((n + 1) / CAST(2.0 AS DOUBLE))) + 1)
            AS median_est,
          max(CASE WHEN rn = ceil(n * CAST(0.9 AS DOUBLE))
            THEN o_totalprice END) AS p90_est,
          COUNT(*) AS n_sampled
        FROM ranked GROUP BY o_orderpriority ORDER BY o_orderpriority""")),

    // ── IVF ANN with a TRAINED coarse quantizer (Lloyd's k-means) ──────
    // Oracle-EXACT despite iterative training: the Spark side sums each
    // centroid dimension in exact DECIMAL (order-independent), so the
    // oracle UNROLLS the three Lloyd rounds as CTE layers computing the
    // identical decimal means — trained centroids, assignments, and the
    // final multi-probe top-k all hash-match DuckDB bit-for-bit.
    QueryDef("q56_ann_ivf_kmeans",
      (s, dir) => {
        val e = tPar(s, dir, "embeddings")
        Similarity.ivfTopK(e, e.filter(col("vec_id") < 20),
          "vec_id", "embedding", topK, ivfNlist, ivfNprobe,
          trainIters = 3, dims = annDims)
          .orderBy("probe_id", "rank")
      },
      Some {
        def cos(a: String, b: String) =
          s"""(${dDot(a, b)}) / (sqrt(${dDot(a, a)}) * sqrt(${dDot(b, b)}))"""
        // exact mean of dimension i over a group — the SQL twin of the
        // Spark side's 2^53-scaled DECIMAL(38,0) sums: the scale is a
        // pure exponent shift (exact), the scaled floats are integers,
        // so neither cast rounds and the engines cannot drift (VARCHAR
        // hop: DuckDB's direct decimal→double cast is off by one ulp)
        def mean(i: Int) =
          s"""CAST(CAST(SUM(CAST(CAST(embedding[$i] AS DOUBLE)
             * 9007199254740992.0 AS DECIMAL(38,0))) AS VARCHAR) AS DOUBLE)
             / 9007199254740992.0 / CAST(COUNT(*) AS DOUBLE)"""
        val meansList = (1 to annDims).map(mean).mkString("[", ", ", "]")
        // one Lloyd round: assign every vector to its nearest layer-N
        // centroid (ties to lowest cid), then per-cell decimal means
        def layer(n: Int): String =
          s"""s$n AS (
            SELECT e.vec_id, e.embedding, cid,
              ${cos("e.embedding", "cvec")} AS ccos
            FROM embeddings e CROSS JOIN cents${n - 1}),
          a$n AS (
            SELECT vec_id, embedding, cid FROM (
              SELECT *, row_number() OVER (PARTITION BY vec_id
                ORDER BY ccos DESC, cid ASC) AS rn FROM s$n)
            WHERE rn = 1),
          cents$n AS (
            SELECT cid, $meansList AS cvec FROM a$n GROUP BY cid)"""
        s"""WITH cents0 AS (
            SELECT vec_id AS cid, embedding AS cvec FROM embeddings
            ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id LIMIT $ivfNlist),
          ${layer(1)}, ${layer(2)}, ${layer(3)},
          scored AS (
            SELECT e.vec_id, cid, ${cos("e.embedding", "cvec")} AS ccos
            FROM embeddings e CROSS JOIN cents3),
          ranked AS (
            SELECT *, row_number() OVER (PARTITION BY vec_id
              ORDER BY ccos DESC, cid ASC) AS rn FROM scored),
          cell AS (SELECT vec_id, cid AS cell FROM ranked WHERE rn = 1),
          pcell AS (SELECT vec_id, cid AS cell FROM ranked
            WHERE rn <= $ivfNprobe AND vec_id < 20),
          v AS (SELECT e.vec_id, e.embedding, cell
            FROM embeddings e JOIN cell USING (vec_id)),
          pv AS (SELECT e.vec_id, e.embedding, cell
            FROM embeddings e JOIN pcell USING (vec_id)),
          pairs AS (
            SELECT a.vec_id AS probe_id, b.vec_id AS nn_id,
              ${cos("a.embedding", "b.embedding")} AS cos
            FROM pv a JOIN v b ON a.cell = b.cell AND a.vec_id <> b.vec_id)
          SELECT probe_id, nn_id, cos, rank FROM (
            SELECT *, row_number() OVER (PARTITION BY probe_id
              ORDER BY cos DESC, nn_id ASC) AS rank FROM pairs)
          WHERE rank <= $topK ORDER BY probe_id, rank"""
      }),

    // ── Benchmark decontamination: train docs overlapping a bench set ──
    QueryDef("q57_decontaminate",
      (s, dir) => {
        val docs = tPar(s, dir, "documents")
        Curation.contaminationPairs(
          docs.filter(col("doc_id") >= 10),
          docs.filter(col("doc_id") < 10),
          "doc_id", "text", shingleK)
          .orderBy("train_id", "bench_id")
      },
      Some(s"""WITH sh AS (SELECT doc_id, unnest(list_distinct(
            ${dShingles(dTok, shingleK)})) AS shingle FROM documents)
        SELECT a.doc_id AS train_id, b.doc_id AS bench_id,
          COUNT(*) AS shared_shingles
        FROM sh a JOIN sh b USING (shingle)
        WHERE a.doc_id >= 10 AND b.doc_id < 10
        GROUP BY 1, 2 ORDER BY train_id, bench_id""")),

    // ── Sequence packing: fixed token budgets per training context ─────
    QueryDef("q58_sequence_pack",
      (s, dir) => {
        val d = t(s, dir, "documents").select(col("source"), col("doc_id"),
          size(TextStats.tokens(col("text"))).cast("long").as("n_tokens"))
        Curation.packSequences(d, "doc_id", "n_tokens", "source",
          packBudget)
          .groupBy("source", "pack_id")
          .agg(count(lit(1)).as("n_docs"),
            sum(col("n_tokens")).as("pack_tokens"))
          .orderBy("source", "pack_id")
      },
      Some(s"""WITH d AS (SELECT source, doc_id,
          CAST(len($dTok) AS BIGINT) AS n_tokens FROM documents),
        p AS (SELECT source, doc_id, n_tokens,
          CAST(floor(COALESCE(SUM(n_tokens) OVER (PARTITION BY source
            ORDER BY doc_id
            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
            / $packBudget) AS BIGINT) AS pack_id
        FROM d)
        SELECT source, pack_id, COUNT(*) AS n_docs,
          CAST(SUM(n_tokens) AS BIGINT) AS pack_tokens
        FROM p GROUP BY 1, 2 ORDER BY source, pack_id""")),

    // ── Domain-mixture sampling: per-source deterministic keep rates ───
    QueryDef("q59_domain_mix",
      (s, dir) => {
        val rates = mixHeadSources.map(_ -> mixHeadRate).toMap
        Curation.sampleMixture(t(s, dir, "documents"), "doc_id", "source",
          rates, mixTailRate)
          .groupBy("source")
          .agg(count(lit(1)).as("kept_docs"), min(col("doc_id")).as("min_kept"))
          .orderBy("source")
      },
      Some {
        val head = mixHeadSources.map(s => s"'$s'").mkString(", ")
        s"""SELECT source, COUNT(*) AS kept_docs, min(doc_id) AS min_kept
        FROM documents
        WHERE ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 7))::BIGINT
          % 1000 < CASE WHEN source IN ($head)
            THEN ${(mixHeadRate * 1000).toInt}
            ELSE ${(mixTailRate * 1000).toInt} END
        GROUP BY 1 ORDER BY source"""
      }),

    // ── PII redaction audit: typed placeholders + per-kind counts ──────
    // The synthetic corpus carries no real PII (counts are legitimately
    // 0) — the positive-match correctness lives in CurationSpec's inline
    // fixtures; this query proves the map-only scale shape and the exact
    // Spark↔RE2 pattern parity on real data.
    QueryDef("q60_pii_redact",
      (s, dir) => {
        val d = t(s, dir, "documents")
        d.select((col("doc_id") +: Curation.piiCounts(col("text"))) :+
          length(Curation.redactPii(col("text"))).as("redacted_len"): _*)
          .orderBy("doc_id")
      },
      Some(s"""SELECT doc_id,
          len(regexp_extract_all(text, '${Curation.EmailRe}'))
            AS n_emails,
          len(regexp_extract_all(text, '${Curation.PhoneRe}'))
            AS n_phones,
          len(regexp_extract_all(text, '${Curation.Ipv4Re}')) AS n_ips,
          length(regexp_replace(regexp_replace(regexp_replace(text,
            '${Curation.EmailRe}', '[EMAIL]', 'g'),
            '${Curation.PhoneRe}', '[PHONE]', 'g'),
            '${Curation.Ipv4Re}', '[IP]', 'g')) AS redacted_len
        FROM documents ORDER BY doc_id""")),

    // ── As-of join: purchase ← most recent prior view per user ─────────
    // Spark-first: union-and-carry-forward (sort once per user, no
    // range-join explosion) — the classic distributed as-of shape.
    QueryDef("q35_asof_join",
      (s, dir) => {
        val ev = t(s, dir, "events")
          .filter(col("event_type").isin("view", "purchase"))
          .withColumn("pref",
            when(col("event_type") === "view", 0).otherwise(1))
        val w = Window.partitionBy("user_id")
          .orderBy(col("ts").asc, col("pref").asc, col("event_id").asc)
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ev
          .withColumn("view_event_id",
            last(when(col("pref") === 0, col("event_id")), ignoreNulls = true)
              .over(w))
          .withColumn("view_us",
            last(when(col("pref") === 0, unix_micros(col("ts"))),
              ignoreNulls = true).over(w))
          .filter(col("event_type") === "purchase")
          .select(col("event_id"), col("user_id"), col("view_event_id"),
            (unix_micros(col("ts")) - col("view_us")).as("lag_us"))
          .orderBy("event_id")
      },
      Some("""SELECT p.event_id, p.user_id,
          v.event_id AS view_event_id,
          epoch_us(p.ts) - epoch_us(v.ts) AS lag_us
        FROM (SELECT * FROM events WHERE event_type = 'purchase') p
        ASOF LEFT JOIN
          (SELECT * FROM events WHERE event_type = 'view') v
          ON p.user_id = v.user_id AND p.ts >= v.ts
        ORDER BY p.event_id""")),

    // ── Interval aggregation: 7-day shipment windows over orders ───────
    // Shipments falling inside 7-day windows anchored at a deterministic
    // subset of orders. r14 rewrite: because the PER-WINDOW answer is an
    // aggregate (count + exact-decimal quantity sum), the point-window
    // pairs never need to exist — both dates are day-anchored, so a
    // gap-free daily grid of (count, decimal-sum) partials with
    // cumulative prefixes turns every window into TWO equi-join lookups
    // F(hi−1d) − F(lo−1d). Decimal addition is exact and associative,
    // so the prefix DIFFERENCE is bit-identical to the direct dsum.
    // The old bucketized-range-join plan enumerated every matched pair:
    // at fixed calendar span that pair count grows QUADRATICALLY in SF
    // (10× windows × 10× points/day ⇒ sf1.0 measured ~5G pairs, 53 s);
    // this plan is one lineitem fold + a broadcast of the ~2,500-row
    // grid — O(points + windows) at any SF. The materializing range
    // JOIN itself remains a first-class operator
    // (RangeJoin.pointInInterval: Mart dims, RangeJoinSpec,
    // Round9PropertySpec brute-force equivalence).
    QueryDef("q62_range_join",
      (s, dir) => {
        val windows = t(s, dir, "orders")
          .filter(Shingles.baseHash(col("o_orderkey").cast("string"))
            % 50 === 0)
          // parquet NTZ timestamps → epoch seconds; session tz is UTC so
          // the cast is the identity mapping DuckDB's epoch() applies
          .select(col("o_orderkey").as("window_id"),
            unix_seconds(col("o_orderdate").cast("timestamp")).as("lo"))
          .withColumn("hi", col("lo") + lit(7L * 86400))
        val daily = t(s, dir, "lineitem")
          .groupBy(unix_seconds(col("l_shipdate").cast("timestamp"))
            .as("pt"))
          .agg(count(lit(1)).as("c"),
            sum(col("l_quantity").cast("decimal(30,8)")).as("q"))
          .localCheckpoint() // bounds + grid completion read it
        val bounds = daily.agg(min("pt").as("mn"), max("pt").as("mx"))
        // complete (gap-free) day grid so day-anchored lookups are pure
        // equi-joins; bounded by the calendar span, not by data volume
        val cum = bounds
          .select(explode(sequence(col("mn"), col("mx"), lit(86400L)))
            .as("pt"))
          .join(daily, Seq("pt"), "left")
          .select(col("pt"), coalesce(col("c"), lit(0L)).as("c"),
            coalesce(col("q"), lit(0).cast("decimal(30,8)")).as("q"))
          .withColumn("cc",
            sum("c").over(boundedWindow(col("pt"), col("pt"))))
          .withColumn("cq",
            sum("q").over(boundedWindow(col("pt"), col("pt"))))
          .select("pt", "cc", "cq")
          .localCheckpoint() // both lookup sides read it
        // F(x) = inclusive cumulative at day x−1d; clamping BOTH keys to
        // the grid max makes windows entirely past the data difference
        // to zero, and keys before the grid min miss the join and
        // coalesce to zero — exactly the inner-join-then-group semantics
        val wk = windows.crossJoin(broadcast(bounds))
          .select(col("window_id"),
            least(col("lo") - lit(86400L), col("mx")).as("klo"),
            least(col("hi") - lit(86400L), col("mx")).as("khi"))
        wk.join(broadcast(cum.select(col("pt").as("klo"),
            col("cc").as("clo"), col("cq").as("qlo"))), Seq("klo"), "left")
          .join(broadcast(cum.select(col("pt").as("khi"),
            col("cc").as("chi"), col("cq").as("qhi"))), Seq("khi"), "left")
          .select(col("window_id"),
            (coalesce(col("chi"), lit(0L)) - coalesce(col("clo"), lit(0L)))
              .as("n_shipments"),
            (coalesce(col("qhi"), lit(0).cast("decimal(30,8)")) -
              coalesce(col("qlo"), lit(0).cast("decimal(30,8)")))
              .cast("double").as("total_qty"))
          .filter(col("n_shipments") > 0L)
          .orderBy("window_id")
      },
      Some(s"""WITH w AS (SELECT o_orderkey AS window_id,
          CAST(epoch(o_orderdate) AS BIGINT) AS lo,
          CAST(epoch(o_orderdate) AS BIGINT) + 604800 AS hi
        FROM orders
        WHERE ('0x' || substr(md5(CAST(o_orderkey AS VARCHAR)), 1, 7))
          ::BIGINT % 50 = 0)
        SELECT window_id, COUNT(*) AS n_shipments,
          ${dsumSql("l_quantity")} AS total_qty
        FROM w JOIN lineitem
          ON CAST(epoch(l_shipdate) AS BIGINT) >= lo
         AND CAST(epoch(l_shipdate) AS BIGINT) < hi
        GROUP BY window_id ORDER BY window_id""")),

    // ── Incremental dedup: admit a new crawl batch against the corpus ──
    // Membership anti-joins on short keys (fingerprint, band key) — no
    // pair enumeration; the continuous-ingestion shape of corpus growth.
    QueryDef("q63_incremental_dedup",
      (s, dir) => {
        val docs = tPar(s, dir, "documents")
        val isNew =
          Shingles.baseHash(col("doc_id").cast("string")) % 5 === 0
        Dedup.incrementalNew(docs.filter(isNew), docs.filter(!isNew),
          "doc_id", "text", shingleK, minhashHashes, minhashBandRows)
          .select(col("doc_id"), col("source"), col("n_chars"))
          .orderBy("doc_id")
      },
      Some {
        val gate =
          "('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 7))::BIGINT % 5"
        s"""WITH ex AS (
            SELECT doc_id, source, n_chars FROM documents
            WHERE $gate = 0 AND md5($dNorm) NOT IN (
              SELECT md5($dNorm) FROM documents WHERE $gate <> 0)),
          cbk AS (SELECT DISTINCT bk FROM (${dBandsSql(s"$gate <> 0")})),
          hit AS (SELECT DISTINCT doc_id
            FROM (${dBandsSql(s"$gate = 0")})
            WHERE bk IN (SELECT bk FROM cbk))
          SELECT doc_id, source, n_chars FROM ex
          WHERE doc_id NOT IN (SELECT doc_id FROM hit)
          ORDER BY doc_id"""
      }),

    // ── Bloom-gated exact incremental dedup ────────────────────────────
    // Same batch/corpus split as q63 but exact-fingerprint membership
    // only, pre-gated by a corpus Bloom filter (Spark's native
    // BloomFilterAggregate / BloomFilterMightContain): ~99% of
    // genuinely-new docs take a map-only path and never shuffle. Bloom
    // filters have no false negatives, so the result is bit-equal to the
    // plain anti-join the oracle runs — fpp only sizes the residual join.
    QueryDef("q70_bloom_dedup",
      (s, dir) => {
        val docs = tPar(s, dir, "documents")
        val isNew =
          Shingles.baseHash(col("doc_id").cast("string")) % 5 === 0
        Dedup.bloomNewDocs(docs.filter(isNew), docs.filter(!isNew),
          "text", expectedItems = 100000L, fpp = 0.01)
          .select(col("doc_id"), col("source"), col("n_chars"))
          .orderBy("doc_id")
      },
      Some {
        val gate =
          "('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 7))::BIGINT % 5"
        s"""SELECT doc_id, source, n_chars FROM documents
          WHERE $gate = 0 AND md5($dNorm) NOT IN (
            SELECT md5($dNorm) FROM documents WHERE $gate <> 0)
          ORDER BY doc_id"""
      }),

    // ── Keyword search: conjunctive term query, TF-ranked ──────────────
    // The inverted-index query shape: explode tokens, keep only the query
    // terms (a literal IN filter inside the generate's codegen stage —
    // the posting-list selection), then ONE groupBy(doc) shuffle whose
    // payload is just (doc_id, term hits). AND semantics via
    // count(distinct term) = |terms|; ranking by total term frequency is
    // exact integer arithmetic (no BM25 log() floats that would defeat a
    // cross-engine hash compare). At 100 TB the exploded postings are a
    // precomputed term-bucketed index table and this query becomes a
    // short-key lookup join into it; the inline derivation here is the
    // same plan minus the reuse.
    QueryDef("q71_keyword_search",
      (s, dir) => {
        val terms = Params.searchTerms
        tPar(s, dir, "documents")
          .select(col("doc_id"), col("source"),
            explode(TextStats.tokens(col("text"))).as("tok"))
          .filter(col("tok").isin(terms: _*))
          .groupBy("doc_id", "source")
          .agg(countDistinct(col("tok")).as("n_terms"),
            count(lit(1)).as("tf"))
          .filter(col("n_terms") === terms.size)
          .select(col("doc_id"), col("source"), col("tf"))
          .orderBy(desc("tf"), col("doc_id"))
      },
      Some {
        val inList = Params.searchTerms.map(t => s"'$t'").mkString(", ")
        s"""WITH t AS (SELECT doc_id, source, unnest($dTok) AS tok
            FROM documents),
          m AS (SELECT doc_id, source,
              COUNT(DISTINCT tok) AS n_terms, COUNT(*) AS tf
            FROM t WHERE tok IN ($inList) GROUP BY 1, 2)
          SELECT doc_id, source, CAST(tf AS BIGINT) AS tf FROM m
          WHERE n_terms = ${Params.searchTerms.size}
          ORDER BY tf DESC, doc_id"""
      }),

    // ── Embedding pooling: per-label centroids (mean-pool) ─────────────
    // The centroid computation under IVF training / cluster analysis as
    // a user-facing operator: posexplode the vectors once, ONE
    // groupBy(label, dim) with map-side partials (shuffle payload is
    // (label, dim, partial-sum) — never a vector), decimal sums so the
    // per-dimension means are partition-order independent and
    // oracle-exact. At 100 TB this is the only all-corpus pass a
    // centroid build needs.
    QueryDef("q77_embed_centroids",
      (s, dir) => tPar(s, dir, "embeddings")
        .select(col("label"),
          posexplode(col("embedding")).as(Seq("dim", "v")))
        .groupBy("label", "dim")
        .agg((dsum(col("v")) / count(lit(1))).as("mean_v"),
          count(lit(1)).as("n_vecs"))
        .orderBy("label", "dim"),
      Some(s"""WITH e AS (SELECT label,
            generate_subscripts(embedding, 1) - 1 AS dim,
            unnest(embedding) AS v
          FROM embeddings)
        SELECT label, CAST(dim AS INT) AS dim,
          ${dsumSql("CAST(v AS DOUBLE)")} / COUNT(*) AS mean_v,
          COUNT(*) AS n_vecs
        FROM e GROUP BY label, dim ORDER BY label, dim""")),

    // ── Statistical outliers: per-group z-scores, exact two-pass ───────
    // Data-quality shape: per event type, mean/variance from decimal
    // sums (order-independent), then |z| > 2 flags per row; zero-variance
    // groups are guarded identically on both sides (var_v > 0) because
    // Spark and DuckDB order NaN differently in comparisons. Every
    // arithmetic step after the decimal sums is IEEE-correctly-rounded
    // (division, sqrt) and written identically on both sides, so even
    // the outlier COUNTS hash-match the oracle. Two window passes over
    // one partition-by — no join, no second scan.
    QueryDef("q78_zscore_outliers",
      (s, dir) => {
        val w = Window.partitionBy("event_type")
        val ev = t(s, dir, "events")
          .withColumn("sv", sum(col("value")
            .cast(org.apache.spark.sql.types.DecimalType(30, 8))).over(w)
            .cast("double"))
          .withColumn("svv", sum((col("value") * col("value"))
            .cast(org.apache.spark.sql.types.DecimalType(30, 8))).over(w)
            .cast("double"))
          .withColumn("n", count(lit(1)).over(w))
          .withColumn("mean_v", col("sv") / col("n"))
          .withColumn("var_v", greatest(
            col("svv") / col("n") - (col("sv") / col("n")) *
              (col("sv") / col("n")), lit(0.0)))
        ev.groupBy("event_type")
          .agg(count(lit(1)).as("n_events"),
            max(col("mean_v")).as("mean_v"),
            count(when(col("var_v") > 0.0 &&
              abs((col("value") - col("mean_v")) /
                sqrt(col("var_v"))) > 2.0, 1)).as("n_outliers"))
          .orderBy("event_type")
      },
      Some(s"""WITH s AS (SELECT event_type, value,
          CAST(CAST(SUM(CAST(value AS DECIMAL(30,8))) OVER w
            AS VARCHAR) AS DOUBLE) AS sv,
          CAST(CAST(SUM(CAST((value * value) AS DECIMAL(30,8))) OVER w
            AS VARCHAR) AS DOUBLE) AS svv,
          COUNT(*) OVER w AS n
        FROM events WINDOW w AS (PARTITION BY event_type)),
        z AS (SELECT event_type, value, sv / n AS mean_v,
          greatest(svv / n - (sv / n) * (sv / n), 0.0) AS var_v
        FROM s)
        SELECT event_type, COUNT(*) AS n_events, MAX(mean_v) AS mean_v,
          COUNT(CASE WHEN var_v > 0.0
              AND abs((value - mean_v) / sqrt(var_v)) > 2.0
            THEN 1 END) AS n_outliers
        FROM z GROUP BY event_type ORDER BY event_type""")),

    // ── REAL audio frame sampling: windowed energy over WAV clips ──────
    // The frame-sample stage goes real for audio: 64-sample windows,
    // hop 64, one row per window with its EXACT int64 sum-of-squares
    // energy — reproducible in SQL from the same text-derived samples
    // as q75, so the whole row set hash-matches.
    QueryDef("q79_audio_frames",
      (s, dir) => {
        val media = Multimodal.asWavMediaTable(tPar(s, dir, "documents"),
          "doc_id", "text", 256, 16000)
        Multimodal.audioFrames(media, frameLen = 64, hop = 64)
          .orderBy("media_id", "frame_no")
      },
      Some {
        val samp = "CAST((ascii(substr(text, CAST(i % strlen(text) AS INT)" +
          " + 1, 1)) - 128) * 256 AS BIGINT)"
        s"""WITH f AS (SELECT doc_id, text,
            unnest(range(0, 4)) AS frame_no FROM documents)
          SELECT doc_id AS media_id, CAST(frame_no AS INT) AS frame_no,
            CAST(64 AS INT) AS n_samples,
            CASE WHEN strlen(text) = 0 THEN CAST(0 AS BIGINT) ELSE
              CAST(list_sum(list_transform(
                range(frame_no * 64, frame_no * 64 + 64),
                i -> $samp * $samp)) AS BIGINT) END AS energy
          FROM f ORDER BY media_id, frame_no"""
      }),

    // ── BPE merge-pair statistics: top adjacent token pairs ────────────
    // The second half of tokenizer training: after the seed vocabulary
    // (q76), BPE repeatedly merges the most frequent ADJACENT pair —
    // this is that counting pass, corpus-wide. Pairs are 2-gram shingles
    // (one generate stage, no join), one count shuffle with map-side
    // partials, TakeOrdered top-N. Single-token docs contribute no
    // pairs.
    QueryDef("q83_bpe_pairs",
      (s, dir) => {
        val toks = TextStats.tokens(col("text"))
        tPar(s, dir, "documents")
          .select(explode(when(size(toks) >= 2,
            graft.ext.Shingles.wordShingles(toks, 2))
            .otherwise(array())).as("pair"))
          .groupBy("pair")
          .agg(count(lit(1)).as("freq"))
          .orderBy(desc("freq"), col("pair"))
          .limit(25)
      },
      Some(s"""WITH p AS (SELECT unnest(CASE WHEN len($dTok) >= 2
            THEN ${dShingles(dTok, 2)} ELSE [] END) AS pair
          FROM documents)
        SELECT pair, COUNT(*) AS freq FROM p GROUP BY pair
        ORDER BY freq DESC, pair LIMIT 25""")),

    // ── Corpus length profile: fixed-width histogram ───────────────────
    // The first chart anyone draws over a new corpus: document length
    // distribution. Bucketing is integer floor-division (map-side), one
    // aggregation shuffle keyed by bucket; exact token totals ride the
    // same pass so the histogram and the per-bucket token mass come from
    // ONE scan.
    QueryDef("q82_length_histogram",
      (s, dir) => tPar(s, dir, "documents")
        .select((col("n_chars").cast("long") / 50).cast("long")
          .as("bucket"),
          TextStats.tokenCount(col("text")).as("n_tokens"))
        .groupBy("bucket")
        .agg(count(lit(1)).as("n_docs"),
          sum(col("n_tokens")).as("total_tokens"))
        .select((col("bucket") * 50).as("chars_lo"),
          (col("bucket") * 50 + 49).as("chars_hi"),
          col("n_docs"), col("total_tokens"))
        .orderBy("chars_lo"),
      Some(s"""WITH b AS (SELECT CAST(n_chars AS BIGINT) // 50 AS bucket,
            CAST(len($dTok) AS BIGINT) AS n_tokens
          FROM documents)
        SELECT bucket * 50 AS chars_lo, bucket * 50 + 49 AS chars_hi,
          COUNT(*) AS n_docs,
          CAST(SUM(n_tokens) AS BIGINT) AS total_tokens
        FROM b GROUP BY bucket ORDER BY chars_lo""")),

    // ── Cross-source overlap matrix (dedup analytics) ──────────────────
    // How much does each source pair share, content-wise? Distinct
    // (source, fingerprint) pairs self-join on the fingerprint — an
    // equi-join on a short key whose input is already deduplicated, so
    // the join input is bounded by distinct content, not corpus rows.
    // The upper triangle incl. the diagonal (a ≤ b) keeps the matrix
    // canonical; diagonal entries are each source's distinct content
    // count. The shape behind contamination dashboards and
    // source-weighting decisions.
    QueryDef("q81_source_overlap",
      (s, dir) => {
        val fp = TextStats.contentFingerprint(col("text"))
        val sf = tPar(s, dir, "documents")
          .select(col("source"), fp.as("fp")).distinct()
        sf.toDF("src_a", "fp")
          .join(sf.toDF("src_b", "fp"), Seq("fp"))
          .filter(col("src_a") <= col("src_b"))
          .groupBy("src_a", "src_b")
          .agg(count(lit(1)).as("shared_docs"))
          .orderBy("src_a", "src_b")
      },
      Some(s"""WITH sf AS (SELECT DISTINCT source, md5($dNorm) AS fp
          FROM documents)
        SELECT a.source AS src_a, b.source AS src_b,
          COUNT(*) AS shared_docs
        FROM sf a JOIN sf b ON a.fp = b.fp AND a.source <= b.source
        GROUP BY 1, 2 ORDER BY src_a, src_b""")),

    // ── Temporal densification: hourly grid + LOCF gap fill ────────────
    // Feature-store resampling: each user's sparse events become a dense
    // hourly series between their first and last activity, holes filled
    // with the last observation carried forward. The grid is a map-side
    // `sequence`+explode (no join to a calendar), the within-hour winner
    // is deterministic (latest ts, event_id tie-break), and the fill is
    // one `last(ignoreNulls)` window per user — a single shuffle keyed
    // by user_id carries grid and observations together.
    QueryDef("q84_gap_fill",
      (s, dir) => {
        val ev = t(s, dir, "events")
          .withColumn("hour_us",
            floor(unix_micros(col("ts")) / 3600000000L).cast("long")
              * 3600000000L)
        val w = Window.partitionBy("user_id", "hour_us")
          .orderBy(col("ts").desc, col("event_id").desc)
        val hourly = ev.withColumn("rn", row_number().over(w))
          .filter(col("rn") === 1)
          .select(col("user_id"), col("hour_us"), col("value"))
        val grid = ev.groupBy("user_id")
          .agg(min(col("hour_us")).as("lo"), max(col("hour_us")).as("hi"))
          .select(col("user_id"),
            explode(sequence(col("lo"), col("hi"),
              lit(3600000000L))).as("hour_us"))
        val filled = grid.join(hourly, Seq("user_id", "hour_us"), "left")
          .withColumn("value_filled",
            last(col("value"), ignoreNulls = true).over(
              Window.partitionBy("user_id").orderBy("hour_us")
                .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        filled.select(col("user_id"), col("hour_us"),
          col("value").isNotNull.as("observed"), col("value_filled"))
          .orderBy("user_id", "hour_us")
      },
      Some("""WITH ev AS (SELECT user_id, event_id, ts, value,
            (epoch_us(ts) // 3600000000) * 3600000000 AS hour_us
          FROM events),
        hourly AS (SELECT user_id, hour_us, value FROM (
            SELECT user_id, hour_us, value,
              row_number() OVER (PARTITION BY user_id, hour_us
                ORDER BY ts DESC, event_id DESC) AS rn
            FROM ev) WHERE rn = 1),
        grid AS (SELECT user_id,
            unnest(range(lo, hi + 1, 3600000000)) AS hour_us
          FROM (SELECT user_id, MIN(hour_us) AS lo, MAX(hour_us) AS hi
            FROM ev GROUP BY user_id)),
        j AS (SELECT g.user_id, g.hour_us, h.value,
            last_value(h.value IGNORE NULLS) OVER (
              PARTITION BY g.user_id ORDER BY g.hour_us
              ROWS UNBOUNDED PRECEDING) AS value_filled
          FROM grid g LEFT JOIN hourly h
            ON g.user_id = h.user_id AND g.hour_us = h.hour_us)
        SELECT user_id, hour_us, value IS NOT NULL AS observed,
          value_filled
        FROM j ORDER BY user_id, hour_us""")),

    // ── Funnel / conversion analysis: first view → first purchase ──────
    // The classic event-warehouse question: for every user who viewed,
    // the first view, the first purchase AT OR AFTER it, and the lag —
    // two filtered aggregations and one equi-join, all shuffling on
    // user_id (AQE coalesces the tiny post-filter sides), integer
    // microsecond arithmetic end to end.
    QueryDef("q80_funnel",
      (s, dir) => {
        val ev = t(s, dir, "events")
        val firstView = ev.filter(col("event_type") === "view")
          .groupBy("user_id")
          .agg(min(unix_micros(col("ts"))).as("first_view_us"))
        val purchases = ev.filter(col("event_type") === "purchase")
          .select(col("user_id"), unix_micros(col("ts")).as("p_us"))
        firstView.join(purchases, Seq("user_id"), "left")
          .groupBy("user_id")
          .agg(min(col("first_view_us")).as("first_view_us"),
            min(when(col("p_us") >= col("first_view_us"), col("p_us")))
              .as("first_purchase_us"))
          .select(col("user_id"), col("first_view_us"),
            col("first_purchase_us"),
            col("first_purchase_us").isNotNull.as("converted"),
            (col("first_purchase_us") - col("first_view_us")).as("lag_us"))
          .orderBy("user_id")
      },
      Some("""WITH v AS (SELECT user_id,
            MIN(epoch_us(ts)) AS first_view_us
          FROM events WHERE event_type = 'view' GROUP BY user_id),
        p AS (SELECT user_id, epoch_us(ts) AS p_us
          FROM events WHERE event_type = 'purchase'),
        j AS (SELECT v.user_id, MIN(v.first_view_us) AS first_view_us,
            MIN(CASE WHEN p.p_us >= v.first_view_us THEN p.p_us END)
              AS first_purchase_us
          FROM v LEFT JOIN p ON v.user_id = p.user_id
          GROUP BY v.user_id)
        SELECT user_id, first_view_us, first_purchase_us,
          first_purchase_us IS NOT NULL AS converted,
          first_purchase_us - first_view_us AS lag_us
        FROM j ORDER BY user_id""")),

    // ── Corpus vocabulary: global token frequencies, top-N ─────────────
    // The tokenizer-training precursor (BPE seed vocabulary): one
    // groupBy(token) with map-side partials over the exploded corpus,
    // then a global top-N that plans as TakeOrderedAndProject (per-
    // partition heaps, no full sort) — at 100 TB the only full-corpus
    // pass is the count aggregation, and only N rows ever reach the
    // driver side of the limit. Ties break on the token for a total
    // order.
    QueryDef("q76_vocab_topn",
      (s, dir) => tPar(s, dir, "documents")
        .select(explode(TextStats.tokens(col("text"))).as("token"))
        .groupBy("token")
        .agg(count(lit(1)).as("freq"))
        .orderBy(desc("freq"), col("token"))
        .limit(20),
      Some(s"""WITH t AS (SELECT unnest($dTok) AS token FROM documents)
        SELECT token, COUNT(*) AS freq FROM t GROUP BY token
        ORDER BY freq DESC, token LIMIT 20""")),

    // ── Gopher-style repetition quality stats ──────────────────────────
    QueryDef("q64_repetition_stats",
      (s, dir) => Curation.repetitionStats(
        tPar(s, dir, "documents"), "doc_id", "text", 2)
        .orderBy("doc_id"),
      Some(s"""WITH g AS (SELECT doc_id,
            unnest(${dShingles(dTok, 2)}) AS g FROM documents),
          pc AS (SELECT doc_id, g, COUNT(*) AS c FROM g GROUP BY 1, 2)
        SELECT doc_id, CAST(SUM(c) AS BIGINT) AS n_grams,
          CAST(COUNT(*) AS BIGINT) AS distinct_grams,
          CAST(MAX(c) AS BIGINT) AS top_count,
          CAST(SUM(c) - COUNT(*) AS DOUBLE) / CAST(SUM(c) AS DOUBLE)
            AS dup_frac,
          CAST(MAX(c) AS DOUBLE) / CAST(SUM(c) AS DOUBLE) AS top_frac
        FROM pc GROUP BY doc_id ORDER BY doc_id""")),

    // ── P4' mart build: SCD2 dw → star schema → snapshot report ────────
    // The reference's missing load_to_dm.py stage, exercised end-to-end:
    // two product snapshots (big parts get a restock on day 20) SCD2-merge
    // into a dw, Mart.build derives dim_product (hash surrogate keys) +
    // dim_date + the periodic-snapshot fact (calendar × validity range
    // join), and the output is the classic mart consumer — the fact
    // joined back to its dimension. A wrong surrogate key on either side
    // drops rows from the star join and fails the row-count gate.
    QueryDef("q65_mart_star",
      (s, dir) => {
        val star = martStarBucketed(s, dir)
        star.fact
          .join(star.dimProduct.select("product_sk", "brand"), "product_sk")
          .select("full_date", "date_sk", "product_sk", "natural_key",
            "brand", "price", "quantity_available")
          .orderBy("full_date", "natural_key")
      },
      // date_sk: DateDim ids are row_number over the contiguous daily
      // calendar from 2005-01-01, so id = days-since + 1 exactly.
      // product_sk: the same 60-bit md5-prefix surrogate as
      // Mart.surrogateKey.
      Some(s"""WITH $dMartDw,
        dates AS (SELECT CAST(unnest(generate_series(DATE '2020-01-01',
            DATE '2020-01-31', INTERVAL 1 DAY)) AS DATE) AS full_date)
        SELECT full_date,
          CAST(date_diff('day', DATE '2005-01-01', full_date) + 1 AS BIGINT)
            AS date_sk,
          CAST(('0x' || substr(md5(natural_key || '|' ||
            CAST(valid_from AS VARCHAR)), 1, 15)) AS BIGINT) AS product_sk,
          natural_key, brand, price, quantity_available
        FROM dates JOIN dw
          ON full_date >= valid_from AND full_date < valid_to
        ORDER BY full_date, natural_key""")),

    // ── P4' report layer: brand × month rollup over the snapshot fact ──
    // The docx's P4 exists to feed PowerBI reports (docx §1); this is the
    // classic periodic-snapshot report — monthly totals per brand with
    // rollup subtotal rows — reading ONLY the star (fact + dims, no
    // reach-back into the warehouse). Two-month window so the restock on
    // Jan 20 splits visibly across months.
    QueryDef("q66_mart_report_rollup",
      (s, dir) => {
        val star = martStarBucketed(s, dir,
          until = Date.valueOf("2020-02-28"))
        Mart.reportBrandMonth(star)
          .orderBy(col("brand").asc_nulls_first,
            col("year_month").asc_nulls_first)
      },
      Some(s"""WITH $dMartDw,
        dates AS (SELECT CAST(unnest(generate_series(DATE '2020-01-01',
            DATE '2020-02-28', INTERVAL 1 DAY)) AS DATE) AS full_date),
        fact AS (SELECT brand, strftime(full_date, '%Y-%m') AS year_month,
            price, quantity_available
          FROM dates JOIN dw
            ON full_date >= valid_from AND full_date < valid_to)
        SELECT brand, year_month, COUNT(*) AS snapshot_rows,
          CAST(SUM(price) AS BIGINT) AS total_price,
          CAST(SUM(quantity_available) AS BIGINT)
            AS total_quantity_available
        FROM fact GROUP BY ROLLUP (brand, year_month)
        ORDER BY brand ASC NULLS FIRST, year_month ASC NULLS FIRST""")),

    // ── P4' report layer: current-inventory cube ────────────────────────
    // The star's latest snapshot date (a 1-row broadcast, no driver
    // action), cubed over (brand, material) — every subtotal combination
    // a dashboard would slice by.
    QueryDef("q67_mart_report_cube",
      (s, dir) => {
        val star = martStarBucketed(s, dir)
        Mart.reportCurrentInventory(star, Seq("brand", "material"))
          .orderBy(col("brand").asc_nulls_first,
            col("material").asc_nulls_first)
      },
      Some(s"""WITH $dMartDw,
        cur AS (SELECT brand, material, quantity_available FROM dw
          WHERE DATE '2020-01-31' >= valid_from
            AND DATE '2020-01-31' < valid_to)
        SELECT brand, material, COUNT(*) AS n_products,
          CAST(SUM(quantity_available) AS BIGINT)
            AS total_quantity_available
        FROM cur GROUP BY CUBE (brand, material)
        ORDER BY brand ASC NULLS FIRST, material ASC NULLS FIRST""")),

    // ── Product-quantization ANN: per-subspace codebooks + ADC ─────────
    // The index class between sign-LSH and IVF for 100 TB embedding
    // stores: the corpus compresses to pqSubspaces small codes per
    // vector, probes precompute a distance table per subspace, and
    // scoring is table lookups — the scan reads 4 longs per row, not 64
    // floats. Oracle-EXACT like q56: each codebook's Lloyd rounds unroll
    // as CTE layers over the vector SLICE with identical decimal means,
    // and the ADC partial sums are the same left-associated double
    // chains on both sides.
    QueryDef("q85_pq_ann",
      (s, dir) => {
        val e = tPar(s, dir, "embeddings")
        Similarity.pqTopK(e, e.filter(col("vec_id") < 20),
          "vec_id", "embedding", topK, annDims, pqSubspaces, pqCodebook,
          pqIters)
          .orderBy("probe_id", "rank")
      },
      Some {
        val sd = annDims / pqSubspaces
        // every subspace rides ONE long-format plan keyed by m — a
        // per-subspace CTE chain (16 chains × code/adc CTEs) sent
        // DuckDB's join-order search across 30+ relations into the
        // planner weeds; this shape has 3 joins total. Slices use
        // m-computed bounds, so one expression covers all subspaces.
        def sub(v: String) = s"$v[(m * $sd + 1):((m + 1) * $sd)]"
        def cosN(a: String, b: String) =
          s"""(${dDotN(a, b, sd)}) / (sqrt(${dDotN(a, a, sd)}) * sqrt(${dDotN(b, b, sd)}))"""
        // exact mean of subspace dimension i over the sliced vectors
        // `sv` — the 2^53-scaled DECIMAL(38,0) scheme (see q56's mean)
        def mean(i: Int) =
          s"""CAST(CAST(SUM(CAST(CAST(sv[$i] AS DOUBLE)
             * 9007199254740992.0 AS DECIMAL(38,0))) AS VARCHAR) AS DOUBLE)
             / 9007199254740992.0 / CAST(COUNT(*) AS DOUBLE)"""
        val meansList = (1 to sd).map(mean).mkString("[", ", ", "]")
        // Lloyd layer n: assign every (vector, subspace) to its nearest
        // layer-(n-1) centroid (cos desc, cid asc), then exact means
        def layer(n: Int): String =
          s"""a$n AS (
            SELECT m, vec_id, sv, cid FROM (
              SELECT *, row_number() OVER (PARTITION BY m, vec_id
                ORDER BY ccos DESC, cid ASC) AS rn
              FROM (SELECT cb.m, e.vec_id, ${sub("e.embedding")} AS sv,
                  cb.cid, ${cosN(sub("e.embedding"), "cb.cvec")} AS ccos
                FROM embeddings e CROSS JOIN cb${n - 1} cb))
            WHERE rn = 1),
          cb$n AS (SELECT m, cid, $meansList AS cvec
            FROM a$n GROUP BY m, cid)"""
        val layers = (1 to pqIters).map(layer).mkString(",\n")
        // explicit left-associated sums over the m-ordered lookup lists
        // — the bit-exact twin of the Spark side's reduce over subspaces
        def listSum(l: String) =
          (1 to pqSubspaces).map(i => s"$l[$i]").mkString(" + ")
        s"""WITH sample AS (
            SELECT vec_id AS cid, embedding FROM embeddings
            ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id LIMIT $pqCodebook),
          cb0 AS (SELECT m, cid, ${sub("embedding")} AS cvec
            FROM sample CROSS JOIN (SELECT unnest(range($pqSubspaces)) AS m)),
          $layers,
          codes AS (
            SELECT m, vec_id, cid AS code FROM (
              SELECT m, vec_id, cid, row_number() OVER (
                PARTITION BY m, vec_id ORDER BY ccos DESC, cid ASC) AS rn
              FROM (SELECT cb.m, e.vec_id, cb.cid,
                  ${cosN(sub("e.embedding"), "cb.cvec")} AS ccos
                FROM embeddings e CROSS JOIN cb$pqIters cb))
            WHERE rn = 1),
          adc AS (
            SELECT cb.m, p.vec_id AS probe_id, cb.cid,
              ${dDotN(sub("p.embedding"), "cb.cvec", sd)} AS pd,
              ${dDotN("cb.cvec", "cb.cvec", sd)} AS nsq
            FROM embeddings p CROSS JOIN cb$pqIters cb
            WHERE p.vec_id < 20),
          pn AS (SELECT vec_id AS probe_id,
              sqrt(${dDotN("embedding", "embedding", annDims)}) AS pnorm
            FROM embeddings WHERE vec_id < 20),
          parts AS (
            SELECT a.probe_id, c.vec_id AS nn_id,
              list(a.pd ORDER BY a.m) AS pds,
              list(a.nsq ORDER BY a.m) AS nsqs
            FROM codes c JOIN adc a ON a.m = c.m AND a.cid = c.code
            WHERE a.probe_id <> c.vec_id GROUP BY 1, 2),
          scored AS (
            SELECT probe_id, nn_id,
              (${listSum("pds")}) / (pnorm * sqrt(${listSum("nsqs")}))
                AS score
            FROM parts JOIN pn USING (probe_id))
          SELECT probe_id, nn_id, score, rank FROM (
            SELECT *, row_number() OVER (PARTITION BY probe_id
              ORDER BY score DESC, nn_id ASC) AS rank FROM scored)
          WHERE rank <= $topK ORDER BY probe_id, rank"""
      }),

    // ── Token-window chunking (RAG / context-window prep) ──────────────
    // Sliding windows of `chunkLen` tokens every `chunkStride` tokens.
    // Starts are generated MAP-SIDE per row (`sequence` + `explode`) —
    // no join, no shuffle, embarrassingly parallel at any corpus size;
    // the output is ~n/stride rows per doc. Token counts are integers,
    // so the gate is hash-exact.
    QueryDef("q101_chunking",
      (s, dir) => Curation.chunkTokens(tPar(s, dir, "documents"),
          "doc_id", "text", chunkLen, chunkStride)
        .orderBy("doc_id", "chunk_id"),
      Some(s"""SELECT doc_id,
          CAST((g - 1) // $chunkStride AS BIGINT) AS chunk_id,
          CAST(g AS BIGINT) AS chunk_start,
          array_to_string(tok[g:least(g + ${chunkLen - 1}, n)], ' ')
            AS chunk_text,
          CAST(least(g + ${chunkLen - 1}, n) - g + 1 AS BIGINT)
            AS n_chunk_tokens
        FROM (SELECT doc_id, tok, len(tok) AS n,
            unnest(range(1, len(tok) + 1, $chunkStride)) AS g
          FROM (SELECT doc_id, $dTok AS tok FROM documents)
          WHERE len(tok) > 0)
        ORDER BY doc_id, chunk_id""")),

    // ── Text canonicalization (codegen'd NFC + casefold + ws collapse) ─
    // One native expression instead of four chained string ops: the scan
    // stage stays inside whole-stage codegen and each string is walked
    // once. ASCII corpus ⇒ the DuckDB twin is bit-exact (Javadoc on
    // NormalizeTextExpr spells out the contract).
    QueryDef("q102_normalize_text",
      (s, dir) => tPar(s, dir, "documents")
        .select(col("doc_id"),
          graft.functions.NativeExprs.normalizeText(col("text"))
            .as("norm_text"))
        .select(col("doc_id"), col("norm_text"),
          length(col("norm_text")).cast("long").as("norm_len"))
        .orderBy("doc_id"),
      Some("""SELECT doc_id, norm_text,
          CAST(length(norm_text) AS BIGINT) AS norm_len
        FROM (SELECT doc_id,
            trim(regexp_replace(lower(nfc_normalize(text)), '\s+', ' ', 'g'))
              AS norm_text
          FROM documents)
        ORDER BY doc_id""")),

    // ── Duplicated-span statistics (exact substring dedup, Lee et al.) ─
    // Fraction of each doc's k-token spans that also occur in ANOTHER
    // document. Shape: explode spans → groupBy(span) countDistinct(doc)
    // → join back on span → per-doc fold. Two shuffles on the span key,
    // both partial-aggregated map-side; never all-pairs, so the plan is
    // the one you would run at 100 TB (the span table is the big side
    // and stays distributed — no broadcast, no collect).
    QueryDef("q103_span_dedup",
      (s, dir) => Dedup.duplicatedSpanStats(tPar(s, dir, "documents"),
          "doc_id", "text", spanK)
        .orderBy("doc_id"),
      Some {
        val sh = dShingles(dTok, spanK)
        s"""WITH spans AS (
            SELECT doc_id, unnest($sh) AS sh FROM documents),
          nd AS (SELECT sh, COUNT(DISTINCT doc_id) AS ndocs
            FROM spans GROUP BY sh)
          SELECT s.doc_id, COUNT(*) AS n_spans,
            CAST(COALESCE(SUM(CASE WHEN nd.ndocs > 1 THEN 1 ELSE 0 END), 0)
              AS BIGINT) AS n_dup_spans,
            CAST(SUM(CASE WHEN nd.ndocs > 1 THEN 1 ELSE 0 END) AS DOUBLE)
              / CAST(COUNT(*) AS DOUBLE) AS dup_frac
          FROM spans s JOIN nd USING (sh)
          GROUP BY s.doc_id ORDER BY doc_id"""
      }),

    // ── Per-domain share cap (corpus-mix budget enforcement) ───────────
    // Within each source, keep the longest documents while the running
    // token total stays within half the source's token mass. The cap
    // test is `2·cum ≤ total` — pure integer arithmetic, no doubles
    // anywhere, so the survivor set is bit-determined. One window
    // shuffle on source; composes with q59's probabilistic mixer as the
    // deterministic budget-enforcement twin.
    QueryDef("q104_share_cap",
      (s, dir) => Curation.shareCap(tPar(s, dir, "documents"),
          "doc_id", "source", "text", capNum = 1, capDen = 2)
        .orderBy("source", "doc_id"),
      Some(s"""SELECT doc_id, source, n_tokens,
          CAST(cum_tokens AS BIGINT) AS cum_tokens
        FROM (SELECT doc_id, source, n_tokens,
            SUM(n_tokens) OVER (PARTITION BY source
              ORDER BY n_tokens DESC, doc_id
              ROWS UNBOUNDED PRECEDING) AS cum_tokens,
            SUM(n_tokens) OVER (PARTITION BY source) AS tot_tokens
          FROM (SELECT doc_id, source,
              CAST(len($dTok) AS BIGINT) AS n_tokens FROM documents))
        WHERE cum_tokens * 2 <= tot_tokens
        ORDER BY source, doc_id""")),

    // ── Blocked fuzzy self-join (entity resolution / near-match) ───────
    // Candidate pairs only WITHIN (source, lang) blocks — the classic
    // blocking step that turns an O(n²) fuzzy join into per-block
    // quadratic work bounded by the largest block; at scale the block
    // key becomes the shuffle key and no executor ever sees the cross
    // product. Edit distance on a fixed 40-char prefix (both engines
    // implement classic Levenshtein), integer-exact gate.
    QueryDef("q105_fuzzy_join",
      (s, dir) => Dedup.fuzzyBlockedPairs(t(s, dir, "documents"),
          "doc_id", Seq("source", "lang"), "text", fuzzyPrefix,
          fuzzyMaxDist)
        .orderBy("doc_a", "doc_b"),
      Some(s"""SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
          CAST(levenshtein(substr(a.text, 1, $fuzzyPrefix),
            substr(b.text, 1, $fuzzyPrefix)) AS BIGINT) AS dist
        FROM documents a JOIN documents b
          ON a.source = b.source AND a.lang = b.lang
          AND a.doc_id < b.doc_id
        WHERE levenshtein(substr(a.text, 1, $fuzzyPrefix),
          substr(b.text, 1, $fuzzyPrefix)) <= $fuzzyMaxDist
        ORDER BY doc_a, doc_b""")),

    // ── Prefix-filtered exact set-similarity join (PPJoin family) ──────
    // q28's exact contract (shingle-set Jaccard ≥ ½, all qualifying
    // pairs) under the Bayardo et al. WWW'07 plan: each doc joins only
    // on its first n−ceil(t·n)+1 shingles in global df order, so the
    // corpus's most common shingle — the hot key that melts q28's
    // every-shingle index at 100 TB — is never a join key. The oracle
    // states the SEMANTICS (all pairs, exact threshold); the prefix
    // filter is provably lossless and the gate proves it on real data.
    // Rational threshold ⇒ all size/overlap tests are integer-exact;
    // the only double is the reported jaccard (one division).
    QueryDef("q106_ppjoin",
      (s, dir) => Dedup.prefixFilterJaccardPairs(
          tPar(s, dir, "documents"), "doc_id", "text", shingleK,
          ppjTNum, ppjTDen)
        .orderBy("id_a", "id_b"),
      Some(s"""WITH sh AS (SELECT doc_id, unnest(list_distinct(
            ${dShingles(dTok, shingleK)})) AS tok FROM documents),
          sz AS (SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY doc_id),
          p AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b,
              COUNT(*) AS shared
            FROM sh a JOIN sh b USING (tok)
            WHERE a.doc_id < b.doc_id GROUP BY 1, 2)
        SELECT id_a, id_b, CAST(shared AS DOUBLE)
            / CAST(x.n + y.n - shared AS DOUBLE) AS jaccard
        FROM p JOIN sz x ON p.id_a = x.doc_id
          JOIN sz y ON p.id_b = y.doc_id
        WHERE shared * $ppjTDen >= $ppjTNum * (x.n + y.n - shared)
        ORDER BY id_a, id_b""")),

    // ── Robust outliers: median / MAD, rank-exact on both engines ──────
    // The robust twin of q78's z-scores: median and median-absolute-
    // deviation flag outliers without the mean's sensitivity to the very
    // outliers being hunted. Medians are DISCRETE (the value at rank
    // ⌈n/2⌉ in sort order) — an actual data value, zero interpolation
    // arithmetic — so both engines agree bit-for-bit by construction;
    // |v−med| and k·MAD are single correctly-rounded IEEE ops. Shape:
    // two rank windows per event_type + two broadcast joins of 5-row
    // aggregates; the events table is scanned, never self-joined.
    QueryDef("q107_mad_outliers",
      (s, dir) => {
        val ev = t(s, dir, "events").select("event_type", "value")
        val wAll = Window.partitionBy("event_type")
        def discMedian(df: DataFrame, c: String, as: String) = df
          .withColumn("rn", row_number().over(
            Window.partitionBy("event_type").orderBy(c)))
          .withColumn("nn", count(lit(1)).over(wAll))
          .filter(col("rn") === expr("(nn + 1) div 2"))
          .select(col("event_type"), col(c).as(as))
        val med = discMedian(ev, "value", "med")
        val ad = ev.join(broadcast(med), "event_type")
          .withColumn("ad", abs(col("value") - col("med")))
        val mad = discMedian(ad.select(col("event_type"), col("ad")),
          "ad", "mad")
        ad.join(broadcast(mad), "event_type")
          .groupBy("event_type")
          .agg(count(lit(1)).as("n_events"),
            max("med").as("med"), max("mad").as("mad"),
            count(when(col("mad") > 0.0 &&
              col("ad") > lit(madK) * col("mad"), 1)).as("n_outliers"))
          .orderBy("event_type")
      },
      Some(s"""WITH e AS (SELECT event_type, value FROM events),
          r1 AS (SELECT event_type, value,
            row_number() OVER (PARTITION BY event_type ORDER BY value)
              AS rn,
            COUNT(*) OVER (PARTITION BY event_type) AS nn FROM e),
          med AS (SELECT event_type, value AS med FROM r1
            WHERE rn = (nn + 1) // 2),
          ad AS (SELECT e.event_type, abs(e.value - med.med) AS ad,
            med.med FROM e JOIN med USING (event_type)),
          r2 AS (SELECT event_type, ad,
            row_number() OVER (PARTITION BY event_type ORDER BY ad) AS rn,
            COUNT(*) OVER (PARTITION BY event_type) AS nn FROM ad),
          mad AS (SELECT event_type, ad AS mad FROM r2
            WHERE rn = (nn + 1) // 2)
        SELECT ad.event_type, COUNT(*) AS n_events, MAX(ad.med) AS med,
          MAX(mad.mad) AS mad,
          COUNT(CASE WHEN mad.mad > 0.0 AND ad.ad > $madK * mad.mad
            THEN 1 END) AS n_outliers
        FROM ad JOIN mad USING (event_type)
        GROUP BY 1 ORDER BY 1""")),

    // ── TextRank keywords: fixed-point PageRank on co-occurrence ───────
    // Graph centrality joins the engine (complementing q45's connected
    // components): weighted PageRank over the vocab-capped token
    // co-occurrence graph — the TextRank keyword extractor. Every rank
    // update is integer multiply + floor division (units of 1e-8), so
    // three iterations land bit-identically on both engines; the oracle
    // unrolls the same three steps as CTEs with `//`. See
    // Search.textRank for the damping/teleport integer forms.
    QueryDef("q108_textrank",
      (s, dir) => graft.ext.Search.textRank(tPar(s, dir, "documents"),
        "doc_id", "text", trVocab, trDampNum, trDampDen, trIters, trScale),
      Some {
        val tele = s"(${trDampDen - trDampNum} * $trScale) " +
          s"// (${trDampDen} * n_nodes)"
        // DuckDB SUM(BIGINT) widens to HUGEINT → CAST back so the gate
        // compares integers to integers
        def step(prev: String) =
          s"""SELECT v.token,
              CAST($tele + ($trDampNum * COALESCE(q.s, 0))
                // $trDampDen AS BIGINT) AS r
            FROM v CROSS JOIN n LEFT JOIN
              (SELECT e.dst, CAST(SUM((p.r * e.c) // w.w) AS BIGINT) AS s
               FROM e JOIN $prev p ON e.src = p.token
                 JOIN w ON e.src = w.src
               GROUP BY e.dst) q ON v.token = q.dst"""
        s"""WITH dt AS (SELECT DISTINCT doc_id, tok AS token
            FROM (SELECT doc_id, unnest($dTok) AS tok FROM documents)),
          v AS (SELECT token FROM (SELECT token, COUNT(*) AS df FROM dt
            GROUP BY 1 ORDER BY df DESC, token LIMIT $trVocab)),
          vt AS (SELECT dt.doc_id, dt.token FROM dt JOIN v USING (token)),
          h AS (SELECT a.token AS src, b.token AS dst, COUNT(*) AS c
            FROM vt a JOIN vt b
              ON a.doc_id = b.doc_id AND a.token < b.token
            GROUP BY 1, 2),
          e AS (SELECT src, dst, c FROM h
            UNION ALL SELECT dst, src, c FROM h),
          w AS (SELECT src, SUM(c) AS w FROM e GROUP BY 1),
          n AS (SELECT COUNT(*) AS n_nodes FROM v),
          r0 AS (SELECT token, CAST($trScale // n_nodes AS BIGINT) AS r
            FROM v CROSS JOIN n),
          r1 AS (${step("r0")}),
          r2 AS (${step("r1")}),
          r3 AS (${step("r2")})
        SELECT token, CAST(r AS BIGINT) AS rank_units,
          CAST(r AS DOUBLE) / $trScale AS rank
        FROM r3 ORDER BY rank_units DESC, token"""
      }),

    // ── Video frame sampling: REAL Y4M container, exact luma oracle ────
    // The video leg of the multimodal suite: documents → mono YUV4MPEG2
    // streams (frame f's pixel i = text byte (f·w·h+i) mod len — the
    // image tables' cycling with a per-frame offset), then the
    // frame-sample stage keeps every vidEvery-th frame and features it.
    // Deterministic payloads ⇒ the oracle reproduces each SAMPLED
    // frame's mean luma straight from the text (integer sum, one exact
    // division by the power-of-two plane size). Same ASCII-corpus
    // caveat as q61/q68.
    QueryDef("q109_video_frames",
      (s, dir) => {
        val media = Multimodal.asY4mMediaTable(tPar(s, dir, "documents"),
          "doc_id", "text", vidW, vidH, vidFrames)
        Multimodal.sampleFrames(media, vidEvery)
          .orderBy("media_id", "frame_idx")
      },
      Some {
        val plane = vidW * vidH
        val sampled = (0 until vidFrames by vidEvery)
          .mkString("[", ", ", "]")
        s"""SELECT doc_id AS media_id, CAST(f AS INT) AS frame_idx,
          CAST($vidW AS INT) AS width, CAST($vidH AS INT) AS height,
          CASE WHEN strlen(text) = 0 THEN 0.0 ELSE
            CAST(list_sum(list_transform(range(0, $plane),
              i -> ascii(substr(text,
                CAST((f * $plane + i) % strlen(text) AS INT) + 1, 1))))
            AS DOUBLE) / $plane.0 END AS mean_y
        FROM documents CROSS JOIN (SELECT unnest($sampled) AS f)
        ORDER BY media_id, frame_idx"""
      }),

    // ── BFS hop distances on the co-occurrence graph ───────────────────
    // Third graph primitive (components q45, centrality q108, now
    // single-source distances): integer min-plus relaxation from the
    // highest-df token, unrolled bfsIters times — exact hops within the
    // horizon, null beyond. Pure integer arithmetic; the oracle unrolls
    // the same steps with a 999999 sentinel for +∞.
    QueryDef("q110_bfs_hops",
      (s, dir) => graft.ext.Search.bfsHops(tPar(s, dir, "documents"),
        "doc_id", "text", trVocab, bfsIters),
      Some {
        def step(prev: String) =
          s"""SELECT p.token,
              LEAST(p.d, COALESCE(q.m + 1, 999999)) AS d
            FROM $prev p LEFT JOIN
              (SELECT e.dst, MIN(p2.d) AS m FROM e
               JOIN $prev p2 ON e.src = p2.token GROUP BY e.dst) q
              ON p.token = q.dst"""
        s"""WITH dt AS (SELECT DISTINCT doc_id, tok AS token
            FROM (SELECT doc_id, unnest($dTok) AS tok FROM documents)),
          v AS (SELECT token, df FROM (SELECT token, COUNT(*) AS df
            FROM dt GROUP BY 1 ORDER BY df DESC, token LIMIT $trVocab)),
          vt AS (SELECT dt.doc_id, dt.token FROM dt JOIN v USING (token)),
          h AS (SELECT a.token AS src, b.token AS dst FROM vt a JOIN vt b
            ON a.doc_id = b.doc_id AND a.token < b.token GROUP BY 1, 2),
          e AS (SELECT src, dst FROM h
            UNION ALL SELECT dst, src FROM h),
          s AS (SELECT token FROM v ORDER BY df DESC, token LIMIT 1),
          d0 AS (SELECT v.token, CAST(CASE WHEN v.token = s.token
              THEN 0 ELSE 999999 END AS BIGINT) AS d
            FROM v CROSS JOIN s),
          d1 AS (${step("d0")}),
          d2 AS (${step("d1")}),
          d3 AS (${step("d2")})
        SELECT token, CAST(CASE WHEN d < 999999 THEN d END AS BIGINT)
            AS hops
        FROM d3 ORDER BY hops NULLS LAST, token"""
      }),

    // ── Markov transition model on event sequences ─────────────────────
    // Sequence modeling over the event log: per-user next-event
    // transitions (lead over a total order — microsecond timestamp,
    // event_id tiebreak) rolled into a src→dst count matrix with
    // row-normalized probabilities. Counts are exact integers; each
    // probability is ONE correctly-rounded IEEE division of two exact
    // integers, so both engines agree bit-for-bit. One window shuffle
    // on user_id + one tiny aggregation — the row-total join is a
    // broadcast of ≤ |event_type| rows.
    QueryDef("q111_markov_transitions",
      (s, dir) => {
        val ev = t(s, dir, "events").select(col("user_id"),
          unix_micros(col("ts")).as("us"), col("event_id"),
          col("event_type"))
        val w = Window.partitionBy("user_id")
          .orderBy(col("us"), col("event_id"))
        // the transition matrix is ≤ |event_type|² rows by construction:
        // checkpoint it so the totals pass and the normalize join reuse
        // it instead of re-running the corpus window
        val tr = ev.withColumn("next_type", lead("event_type", 1).over(w))
          .filter(col("next_type").isNotNull)
          .groupBy(col("event_type").as("src_type"),
            col("next_type").as("dst_type"))
          .agg(count(lit(1)).as("n"))
          .localCheckpoint()
        val tot = tr.groupBy("src_type").agg(sum("n").as("row_total"))
        tr.join(broadcast(tot), "src_type")
          .select(col("src_type"), col("dst_type"), col("n"),
            (col("n").cast("double") / col("row_total").cast("double"))
              .as("p"))
          .orderBy("src_type", "dst_type")
      },
      Some("""WITH o AS (SELECT user_id, event_type,
            epoch_us(ts) AS us, event_id FROM events),
          tr AS (SELECT event_type AS src_type,
            lead(event_type) OVER (PARTITION BY user_id
              ORDER BY us, event_id) AS dst_type FROM o),
          c AS (SELECT src_type, dst_type, COUNT(*) AS n FROM tr
            WHERE dst_type IS NOT NULL GROUP BY 1, 2),
          s AS (SELECT src_type, CAST(SUM(n) AS BIGINT) AS row_total
            FROM c GROUP BY 1)
        SELECT c.src_type, c.dst_type, CAST(c.n AS BIGINT) AS n,
          CAST(c.n AS DOUBLE) / CAST(s.row_total AS DOUBLE) AS p
        FROM c JOIN s USING (src_type) ORDER BY 1, 2""")),

    // ── Group-wise OLS regression: exact-sum closed form ───────────────
    // Per-event-type least squares of value on seconds since the
    // group's first event — the trend operator the robust (q107) and
    // z-score (q78) outlier queries lean toward. Parity discipline,
    // one step STRICTER than q78's: quantizing a double PRODUCT
    // (x·value ~ 1e10) at 1e-8 is engine-defined noise because the
    // grid sits below the double's own ulp at that magnitude (this
    // failed the sf0.1 gate). So the INPUTS are quantized instead —
    // x is an exact integer (seconds since group start), value at
    // DECIMAL(18,6), both far above their ulp so the cast is
    // unambiguous and tie-free (k+5e-7 is not dyadic) — and every
    // product is formed IN decimal arithmetic: exact on both engines,
    // summed exactly, THEN cast to double. slope/intercept/r² are the
    // same explicit IEEE expression on both engines; degenerate
    // denominators (constant x or y) guarded to null identically.
    QueryDef("q112_groupwise_ols",
      (s, dir) => {
        import org.apache.spark.sql.types.DecimalType
        val w = Window.partitionBy("event_type")
        val ev = t(s, dir, "events")
          .select(col("event_type"), col("value"),
            expr("unix_micros(ts) div 1000000").as("xs"))
          .withColumn("xl", col("xs") - min(col("xs")).over(w))
          .withColumn("xq", col("xl").cast(DecimalType(12, 0)))
          .withColumn("vq", col("value").cast(DecimalType(18, 6)))
          .withColumn("n", count(lit(1)).over(w).cast("double"))
          .withColumn("sx", sum(col("xq")).over(w).cast("double"))
          .withColumn("sy", sum(col("vq")).over(w).cast("double"))
          .withColumn("sxx", sum((col("xl") * col("xl"))
            .cast(DecimalType(38, 0))).over(w).cast("double"))
          .withColumn("sxy", sum(col("xq") * col("vq")).over(w)
            .cast("double"))
          .withColumn("syy", sum(col("vq") * col("vq")).over(w)
            .cast("double"))
        val g = ev.groupBy("event_type").agg(
          max("n").as("n"), max("sx").as("sx"), max("sy").as("sy"),
          max("sxx").as("sxx"), max("sxy").as("sxy"),
          max("syy").as("syy"))
        val den1 = col("n") * col("sxx") - col("sx") * col("sx")
        val num1 = col("n") * col("sxy") - col("sx") * col("sy")
        val den2 = col("n") * col("syy") - col("sy") * col("sy")
        g.select(col("event_type"), col("n").cast("long").as("n_events"),
            when(den1 > 0.0, num1 / den1).as("slope"),
            when(den1 > 0.0,
              (col("sy") - (num1 / den1) * col("sx")) / col("n"))
              .as("intercept"),
            when(den1 > 0.0 && den2 > 0.0,
              (num1 * num1) / (den1 * den2)).as("r2"))
          .orderBy("event_type")
      },
      Some {
        def dsum(e: String) =
          s"CAST(CAST(SUM($e) OVER w AS VARCHAR) AS DOUBLE)"
        s"""WITH b AS (SELECT event_type, value,
            epoch_us(ts) // 1000000 AS xs FROM events),
          c AS (SELECT event_type,
            xs - MIN(xs) OVER w AS xl,
            CAST(value AS DECIMAL(18,6)) AS vq
          FROM b WINDOW w AS (PARTITION BY event_type)),
          st AS (SELECT event_type,
            CAST(COUNT(*) OVER w AS DOUBLE) AS n,
            ${dsum("CAST(xl AS DECIMAL(12,0))")} AS sx,
            ${dsum("vq")} AS sy,
            ${dsum("CAST(xl * xl AS DECIMAL(38,0))")} AS sxx,
            ${dsum("CAST(xl AS DECIMAL(12,0)) * vq")} AS sxy,
            ${dsum("vq * vq")} AS syy
          FROM c WINDOW w AS (PARTITION BY event_type)),
          g AS (SELECT event_type, MAX(n) AS n, MAX(sx) AS sx,
            MAX(sy) AS sy, MAX(sxx) AS sxx, MAX(sxy) AS sxy,
            MAX(syy) AS syy
          FROM st GROUP BY 1)
        SELECT event_type, CAST(n AS BIGINT) AS n_events,
          CASE WHEN (n * sxx - sx * sx) > 0.0
            THEN (n * sxy - sx * sy) / (n * sxx - sx * sx) END AS slope,
          CASE WHEN (n * sxx - sx * sx) > 0.0
            THEN (sy - ((n * sxy - sx * sy) / (n * sxx - sx * sx)) * sx)
              / n END AS intercept,
          CASE WHEN (n * sxx - sx * sx) > 0.0
              AND (n * syy - sy * sy) > 0.0
            THEN ((n * sxy - sx * sy) * (n * sxy - sx * sy))
              / ((n * sxx - sx * sx) * (n * syy - sy * sy)) END AS r2
        FROM g ORDER BY event_type"""
      }),

    // ── Count-min sketch: bounded-size heavy-hitter summary ────────────
    // The frequency twin of KMV (q46/q95): a depth×width counter grid
    // over ALL token occurrences — the sketch is ≤ cmsDepth·cmsWidth
    // rows no matter the corpus size, so it broadcasts where exact
    // per-token counts cannot. Probing the exact top-cmsTopN tokens
    // exposes the one-sided error contract in the output itself
    // (cms_est ≥ exact_n always; overcount = collision mass). md5
    // bucket family ⇒ the oracle rebuilds the identical grid.
    QueryDef("q113_countmin",
      (s, dir) => {
        val toks = tPar(s, dir, "documents")
          .select(explode(TextStats.tokens(col("text"))).as("token"))
        val cms = graft.ext.Sketches.countMin(toks, col("token"),
          cmsDepth, cmsWidth).localCheckpoint()
        val top = toks.groupBy("token").agg(count(lit(1)).as("exact_n"))
          .orderBy(desc("exact_n"), col("token")).limit(cmsTopN)
          .localCheckpoint()
        graft.ext.Sketches.countMinEstimate(cms, top, "token",
          cmsDepth, cmsWidth)
          .withColumnRenamed("v", "token")
          .join(broadcast(top), "token")
          .select(col("token"), col("exact_n"), col("cms_est"),
            (col("cms_est") - col("exact_n")).as("overcount"))
          .orderBy(desc("exact_n"), col("token"))
      },
      Some(s"""WITH tk AS (SELECT unnest($dTok) AS token FROM documents),
          grid AS (SELECT j, ('0x' || substr(md5(j::VARCHAR || '|' ||
              token), 1, 7))::BIGINT % $cmsWidth AS bucket,
            COUNT(*) AS c
          FROM tk CROSS JOIN (SELECT unnest(range(0, $cmsDepth)) AS j)
          GROUP BY 1, 2),
          top AS (SELECT token, COUNT(*) AS exact_n FROM tk
            GROUP BY 1 ORDER BY exact_n DESC, token LIMIT $cmsTopN),
          est AS (SELECT t.token,
            CAST(MIN(COALESCE(g.c, 0)) AS BIGINT) AS cms_est
          FROM top t CROSS JOIN (SELECT unnest(range(0, $cmsDepth)) AS j)
            r LEFT JOIN grid g ON g.j = r.j AND g.bucket =
              ('0x' || substr(md5(r.j::VARCHAR || '|' || t.token), 1, 7))
                ::BIGINT % $cmsWidth
          GROUP BY 1)
        SELECT top.token, CAST(top.exact_n AS BIGINT) AS exact_n,
          est.cms_est, est.cms_est - CAST(top.exact_n AS BIGINT)
            AS overcount
        FROM top JOIN est USING (token)
        ORDER BY exact_n DESC, token""")),

    // ── Priority sampling: weighted sample without replacement ─────────
    // The weighted complement of q90's stratified gate: documents drawn
    // WITHOUT replacement with probability increasing in n_chars
    // (Duffield-Lund-Thorup priorities w/u on the portable md5 hash).
    // Pure function of the ids — reruns and the oracle agree
    // row-for-row. Priority arithmetic is exact-int × exact-int with
    // one correctly-rounded division, so the ranking is bit-identical;
    // ties break by doc_id. Plans as TakeOrderedAndProject: heaps per
    // partition, k rows to the driver, no full sort.
    QueryDef("q114_priority_sample",
      (s, dir) => Curation.prioritySample(tPar(s, dir, "documents"),
        "doc_id", "n_chars", psK),
      Some(s"""WITH s AS (SELECT doc_id, n_chars,
            ('0x' || substr(md5('ps|' || doc_id::VARCHAR), 1, 7))::BIGINT
              AS h
          FROM documents WHERE n_chars > 0)
        SELECT doc_id, n_chars AS weight,
          (CAST(n_chars AS DOUBLE) * 268435456.0) / CAST(h + 1 AS DOUBLE)
            AS priority
        FROM s ORDER BY priority DESC, doc_id LIMIT $psK""")),

    // ── Positional phrase search ───────────────────────────────────────
    // Token ADJACENCY, not bag-of-words (q71/q89's model): the phrase
    // "phraseA phraseB" found via the positional-postings merge — keep
    // the two terms' postings, lead over (doc, pos), hit iff the next
    // retained posting is the right token at exactly pos+1. One corpus
    // pass; the window shuffle carries df(t1)+df(t2) postings, not the
    // corpus. All-integer output.
    QueryDef("q115_phrase_search",
      (s, dir) => graft.ext.Search.phraseSearch(
        tPar(s, dir, "documents"), "doc_id", "text", phraseA, phraseB),
      Some(s"""WITH tk AS (SELECT doc_id,
            unnest($dTok) AS token,
            CAST(generate_subscripts($dTok, 1) AS BIGINT) AS pos
          FROM documents),
          f AS (SELECT doc_id, token, pos,
            lead(token) OVER w AS ntok, lead(pos) OVER w AS npos
          FROM tk WHERE token IN ('$phraseA', '$phraseB')
          WINDOW w AS (PARTITION BY doc_id ORDER BY pos))
        SELECT doc_id, COUNT(*) AS n_hits, MIN(pos) AS first_pos
        FROM f
        WHERE token = '$phraseA' AND ntok = '$phraseB'
          AND npos = pos + 1
        GROUP BY doc_id ORDER BY doc_id""")),

    // ── Mergeable quantile sketch (bottom-k-by-hash sample) ────────────
    // The third sketch leg next to KMV (q46, distinct) and count-min
    // (q113, frequency): per-type value quantiles via the k smallest
    // md5-hash rows per key. The k-minima of a union is a pure function
    // of the underlying set, so — like q97's decimal partials — ANY
    // batching folds to bit-identical state, which the oracle verifies
    // as one single-pass SQL over the whole table. Fed as three
    // day-range batches through partial→merge to exercise the
    // IncrementalAgg-style maintenance path.
    QueryDef("q116_quantile_sketch",
      (s, dir) => {
        val ev = t(s, dir, "events")
        val day = dayofmonth(col("ts"))
        val batches = Seq(ev.filter(day <= 10),
          ev.filter(day > 10 && day <= 20), ev.filter(day > 20))
        val state = batches
          .map(b => graft.ext.Sketches.quantilePartial(b, Seq("event_type"),
            col("value"), col("event_id"), quantileK))
          .reduce((a, b) =>
            graft.ext.Sketches.quantileMerge(a, b, Seq("event_type"), quantileK))
        graft.ext.Sketches.quantileFinish(state, Seq("event_type"))
          .orderBy("event_type")
      },
      Some(s"""WITH h AS (SELECT event_type, CAST(value AS DOUBLE) AS v,
            ('0x' || substr(md5(CAST(event_id AS VARCHAR)), 1, 7))::BIGINT
              AS h
          FROM events),
        tot AS (SELECT event_type, COUNT(*) AS n FROM h
          GROUP BY event_type),
        samp AS (SELECT event_type, v FROM (
            SELECT event_type, v, row_number() OVER (
              PARTITION BY event_type ORDER BY h, v) AS rh
            FROM h) WHERE rh <= $quantileK),
        ranked AS (SELECT event_type, v, row_number() OVER (
              PARTITION BY event_type ORDER BY v) AS rn,
            COUNT(*) OVER (PARTITION BY event_type) AS m
          FROM samp)
        SELECT r.event_type, MAX(t.n) AS n, MAX(m) AS n_sampled,
          (MAX(CASE WHEN rn = floor((m + 1) / 2.0) THEN v END)
           + MAX(CASE WHEN rn = floor((m + 2) / 2.0) THEN v END)) / 2
            AS median_est,
          MAX(CASE WHEN rn = ceil(m * 0.9) THEN v END) AS p90_est
        FROM ranked r JOIN tot t USING (event_type)
        GROUP BY r.event_type ORDER BY r.event_type""")),

    // ── Cohort retention matrix ────────────────────────────────────────
    // The product-analytics staple q80's funnel doesn't cover: users
    // bucketed by their FIRST activity week, then distinct-counted at
    // each later week — the (cohort, age) retention triangle. Weeks are
    // integer indexes (µs div 7·86400·10⁶), so both engines bucket
    // identically with no calendar/timezone semantics in play. Scale
    // shape: the first-activity min rides a user-partitioned window
    // (one shuffle, map-side combinable), the matrix is one partial-agg
    // shuffle keyed by (cohort, age) — history is never re-scanned per
    // cohort, and no join against a first-seen table is needed.
    QueryDef("q117_cohort_retention",
      (s, dir) => {
        val wk = t(s, dir, "events")
          .select(col("user_id"),
            expr("unix_micros(ts) div 604800000000").as("wk"))
        val c = wk.withColumn("cohort",
          min(col("wk")).over(Window.partitionBy("user_id")))
        c.groupBy(col("cohort").as("cohort_week"),
            (col("wk") - col("cohort")).as("age_weeks"))
          .agg(countDistinct(col("user_id")).as("n_users"))
          .orderBy("cohort_week", "age_weeks")
      },
      Some("""WITH w AS (SELECT user_id,
            epoch_us(ts) // 604800000000 AS wk FROM events),
          c AS (SELECT user_id, wk,
            min(wk) OVER (PARTITION BY user_id) AS cohort FROM w)
        SELECT cohort AS cohort_week, wk - cohort AS age_weeks,
          COUNT(DISTINCT user_id) AS n_users
        FROM c GROUP BY 1, 2 ORDER BY cohort_week, age_weeks""")),

    // ── Triangle census / global clustering coefficient ────────────────
    // Suri-Vassilvitskii degree-ordered triangle counting on the q108
    // co-occurrence graph: each triangle counted once at its lowest
    // (degree, token) vertex, so the out-neighbor-pair fanout is capped
    // near √|E| even at a hub token. Integer counts + one IEEE division.
    QueryDef("q118_triangle_count",
      (s, dir) => graft.ext.Search.triangleStats(
        tPar(s, dir, "documents"), "doc_id", "text", trVocab),
      Some(s"""WITH dt AS (SELECT DISTINCT doc_id, tok AS token
            FROM (SELECT doc_id, unnest($dTok) AS tok FROM documents)),
          v AS (SELECT token FROM (SELECT token, COUNT(*) AS df FROM dt
            GROUP BY 1 ORDER BY df DESC, token LIMIT $trVocab)),
          vt AS (SELECT dt.doc_id, dt.token FROM dt JOIN v USING (token)),
          half AS (SELECT a.token AS src, b.token AS dst
            FROM vt a JOIN vt b
              ON a.doc_id = b.doc_id AND a.token < b.token
            GROUP BY 1, 2),
          deg AS (SELECT t, COUNT(*) AS deg FROM
            (SELECT src AS t FROM half UNION ALL SELECT dst FROM half)
            GROUP BY 1),
          orient AS (SELECT
              CASE WHEN ds.deg < dd.deg
                OR (ds.deg = dd.deg AND h.src < h.dst)
                THEN h.src ELSE h.dst END AS u,
              CASE WHEN ds.deg < dd.deg
                OR (ds.deg = dd.deg AND h.src < h.dst)
                THEN h.dst ELSE h.src END AS v
            FROM half h JOIN deg ds ON h.src = ds.t
              JOIN deg dd ON h.dst = dd.t),
          tri AS (SELECT COUNT(*) AS n_triangles
            FROM orient e1 JOIN orient e2
              ON e1.u = e2.u AND e1.v < e2.v
            JOIN half c ON c.src = LEAST(e1.v, e2.v)
              AND c.dst = GREATEST(e1.v, e2.v)),
          wed AS (SELECT CAST(SUM(deg * (deg - 1) // 2) AS BIGINT)
            AS n_wedges FROM deg)
        SELECT (SELECT COUNT(*) FROM v) AS n_nodes,
          (SELECT COUNT(*) FROM half) AS n_edges,
          n_wedges, n_triangles,
          CAST(n_triangles * 3 AS DOUBLE) / CAST(n_wedges AS DOUBLE)
            AS global_clustering
        FROM wed CROSS JOIN tri""")),

    // ── Containment near-dup pairs (asymmetric sub-document dedup) ─────
    // Jaccard (q28/q106) misses a short doc wholly quoted inside a long
    // one; containment |sub ∩ sup| / |sub| ≈ 1 catches exactly that.
    // Same one-pass inverted-index shape as q28; each unordered pair
    // tested in both directions by an integer gate — the direction
    // split is a projection, not a shuffle.
    QueryDef("q119_containment_pairs",
      (s, dir) => Dedup.containmentPairs(tPar(s, dir, "documents"),
        "doc_id", "text", shingleK, containNum, containDen)
        .orderBy("id_sub", "id_sup"),
      Some(s"""WITH sh AS (SELECT doc_id, unnest(list_distinct(
            ${dShingles(dTok, shingleK)})) AS shingle FROM documents),
        sz AS (SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY doc_id),
        p AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS shared
          FROM sh a JOIN sh b USING (shingle)
          WHERE a.doc_id < b.doc_id GROUP BY 1, 2),
        d AS (
          SELECT id_a AS id_sub, id_b AS id_sup, shared, x.n AS n_sub
          FROM p JOIN sz x ON p.id_a = x.doc_id
          UNION ALL
          SELECT id_b, id_a, shared, y.n
          FROM p JOIN sz y ON p.id_b = y.doc_id)
        SELECT id_sub, id_sup, CAST(shared AS BIGINT) AS shared,
          CAST(shared AS DOUBLE) / CAST(n_sub AS DOUBLE) AS containment
        FROM d WHERE shared * $containDen >= $containNum * n_sub
        ORDER BY id_sub, id_sup""")),

    // ── Top user journeys (ordered event-path analysis) ────────────────
    // The path complement of q111's one-step Markov transitions: each
    // user's first pathK events in (ts, event_id) order joined into a
    // journey string, counted across users. Path cardinality is bounded
    // by |event_types|^pathK, so the final aggregate is small no matter
    // the corpus. One user-partitioned window shuffle (row_number and
    // the per-user fold share it); the ordered concat is a sort_array
    // over an rn-keyed struct — deterministic, no order-dependent
    // collect_list contract.
    QueryDef("q120_user_paths",
      (s, dir) => {
        val w = Window.partitionBy("user_id")
          .orderBy(col("ts"), col("event_id"))
        t(s, dir, "events")
          .select(col("user_id"), col("event_type"),
            row_number().over(w).as("rn"))
          .filter(col("rn") <= pathK)
          .groupBy("user_id")
          .agg(array_join(transform(
            array_sort(collect_list(struct(col("rn"), col("event_type")))),
            x => x.getField("event_type")), ">").as("path"))
          .groupBy("path").agg(count(lit(1)).as("n_users"))
          .orderBy(desc("n_users"), col("path"))
      },
      Some(s"""WITH r AS (SELECT user_id, event_type, row_number() OVER (
            PARTITION BY user_id ORDER BY ts, event_id) AS rn
          FROM events),
        p AS (SELECT user_id,
            string_agg(event_type, '>' ORDER BY rn) AS path
          FROM r WHERE rn <= $pathK GROUP BY user_id)
        SELECT path, COUNT(*) AS n_users FROM p
        GROUP BY path ORDER BY n_users DESC, path""")),

    // ── SCD2 snapshot diff (what changed between two AS-OF dates) ──────
    // The audit twin of q99's time travel: keys added / removed /
    // attribute-changed between two as-of reads of the versioned
    // dimension. ONE pass over the version table — per key, validity
    // windows are disjoint, so a conditional max picks each date's
    // single valid version and the diff is a projection of one
    // aggregation; two filtered as-of reads full-outer-joined would
    // derive the SCD2 merge twice and shuffle twice.
    QueryDef("q121_snapshot_diff",
      (s, dir) => {
        val dim = QueriesCore.defs.find(_.name == "q15_scd2").get
          .fn(s, dir)
        def at(d: String, c: String) = max(when(
          col("dt_load_to_dw") <= lit(Date.valueOf(d)) &&
            lit(Date.valueOf(d)) < col("dt_last_update"), col(c)))
        dim.groupBy("custkey").agg(
            at("2020-01-01", "n_orders").as("old_n_orders"),
            at("2020-01-01", "max_price").as("old_max_price"),
            at("2020-01-02", "n_orders").as("new_n_orders"),
            at("2020-01-02", "max_price").as("new_max_price"))
          .withColumn("status",
            when(col("old_n_orders").isNull, "added")
              .when(col("new_n_orders").isNull, "removed")
              .when(col("old_n_orders") =!= col("new_n_orders") ||
                col("old_max_price") =!= col("new_max_price"), "changed")
              .otherwise("unchanged"))
          .filter(col("status") =!= "unchanged")
          .select("custkey", "status", "old_n_orders", "new_n_orders",
            "old_max_price", "new_max_price")
          .orderBy("custkey")
      },
      Some {
        val q15Sql = QueriesCore.defs.find(_.name == "q15_scd2").get
          .oracle.get
        s"""WITH dim AS ($q15Sql),
          d AS (SELECT custkey,
            MAX(CASE WHEN dt_load_to_dw <= DATE '2020-01-01'
              AND DATE '2020-01-01' < dt_last_update
              THEN n_orders END) AS old_n_orders,
            MAX(CASE WHEN dt_load_to_dw <= DATE '2020-01-01'
              AND DATE '2020-01-01' < dt_last_update
              THEN max_price END) AS old_max_price,
            MAX(CASE WHEN dt_load_to_dw <= DATE '2020-01-02'
              AND DATE '2020-01-02' < dt_last_update
              THEN n_orders END) AS new_n_orders,
            MAX(CASE WHEN dt_load_to_dw <= DATE '2020-01-02'
              AND DATE '2020-01-02' < dt_last_update
              THEN max_price END) AS new_max_price
          FROM dim GROUP BY custkey)
        SELECT custkey,
          CASE WHEN old_n_orders IS NULL THEN 'added'
            WHEN new_n_orders IS NULL THEN 'removed'
            WHEN old_n_orders <> new_n_orders
              OR old_max_price <> new_max_price THEN 'changed'
            ELSE 'unchanged' END AS status,
          old_n_orders, new_n_orders, old_max_price, new_max_price
        FROM d
        WHERE CASE WHEN old_n_orders IS NULL THEN 'added'
            WHEN new_n_orders IS NULL THEN 'removed'
            WHEN old_n_orders <> new_n_orders
              OR old_max_price <> new_max_price THEN 'changed'
            ELSE 'unchanged' END <> 'unchanged'
        ORDER BY custkey"""
      }),

    // ── A/B comparison: group-wise Welch t statistic ───────────────────
    // The experiment-analysis primitive: users split into two cohorts by
    // the portable md5 hash (q52's deterministic-split trick), then per
    // event type the two cohorts' value means are compared by Welch's
    // unequal-variance t. Sufficient sums (n, Σv, Σv²) in exact
    // DECIMAL — q112's quantization discipline — then one fixed
    // sequence of correctly-rounded IEEE ops (two divisions, sqrt), so
    // the oracle reproduces every double bit-for-bit. ONE partial-agg
    // shuffle; no window, no join.
    QueryDef("q122_ab_welch",
      (s, dir) => {
        import org.apache.spark.sql.types.DecimalType
        val ev = t(s, dir, "events")
          .select(col("event_type"),
            col("value").cast(DecimalType(18, 6)).as("vq"),
            (Shingles.baseHash(col("user_id").cast("string")) % 2)
              .as("grp"))
        def side(g: Int, e: org.apache.spark.sql.Column) =
          sum(when(col("grp") === g, e))
        val agg = ev.groupBy("event_type").agg(
          side(0, lit(1L)).cast("double").as("na"),
          side(1, lit(1L)).cast("double").as("nb"),
          side(0, col("vq")).cast("double").as("sa"),
          side(1, col("vq")).cast("double").as("sb"),
          side(0, col("vq") * col("vq")).cast("double").as("qa"),
          side(1, col("vq") * col("vq")).cast("double").as("qb"))
        val ma = col("sa") / col("na")
        val mb = col("sb") / col("nb")
        val va = (col("qa") - col("sa") * col("sa") / col("na")) /
          (col("na") - 1.0)
        val vb = (col("qb") - col("sb") * col("sb") / col("nb")) /
          (col("nb") - 1.0)
        val se2 = va / col("na") + vb / col("nb")
        agg.select(col("event_type"),
            col("na").cast("long").as("n_a"),
            col("nb").cast("long").as("n_b"),
            ma.as("mean_a"), mb.as("mean_b"),
            when(col("na") > 1.0 && col("nb") > 1.0 && se2 > 0.0,
              (ma - mb) / sqrt(se2)).as("t_stat"))
          .orderBy("event_type")
      },
      Some {
        def dsum(e: String, g: Int) =
          s"CAST(CAST(SUM($e) FILTER (grp = $g) AS VARCHAR) AS DOUBLE)"
        s"""WITH b AS (SELECT event_type,
            CAST(value AS DECIMAL(18,6)) AS vq,
            ('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 7))::BIGINT
              % 2 AS grp
          FROM events),
        g AS (SELECT event_type,
            CAST(COUNT(*) FILTER (grp = 0) AS DOUBLE) AS na,
            CAST(COUNT(*) FILTER (grp = 1) AS DOUBLE) AS nb,
            ${dsum("vq", 0)} AS sa, ${dsum("vq", 1)} AS sb,
            ${dsum("vq * vq", 0)} AS qa, ${dsum("vq * vq", 1)} AS qb
          FROM b GROUP BY 1)
        SELECT event_type, CAST(na AS BIGINT) AS n_a,
          CAST(nb AS BIGINT) AS n_b,
          sa / na AS mean_a, sb / nb AS mean_b,
          CASE WHEN na > 1.0 AND nb > 1.0 AND
              ((qa - sa * sa / na) / (na - 1.0)) / na
                + ((qb - sb * sb / nb) / (nb - 1.0)) / nb > 0.0
            THEN (sa / na - sb / nb) /
              sqrt(((qa - sa * sa / na) / (na - 1.0)) / na
                + ((qb - sb * sb / nb) / (nb - 1.0)) / nb) END AS t_stat
        FROM g ORDER BY event_type"""
      }),

    // ── Event de-bounce (gap-based duplicate suppression) ──────────────
    // The batch twin of the streaming bounded-state dedup: an event is
    // noise when the SAME (user, type) fired within debounceSec of the
    // previous raw event — one lag over the per-key window, pure
    // integer microsecond arithmetic, no self-join. Gap-based (vs
    // anchored-to-last-kept) keeps the operator one window pass and
    // identical on any engine. Output: per-type kept/dropped audit.
    QueryDef("q123_event_debounce",
      (s, dir) => {
        val w = Window.partitionBy("user_id", "event_type")
          .orderBy(col("ts"), col("event_id"))
        t(s, dir, "events")
          .withColumn("us", unix_micros(col("ts")))
          .withColumn("prev_us", lag(col("us"), 1).over(w))
          .withColumn("keep", col("prev_us").isNull ||
            col("us") - col("prev_us") > lit(debounceSec * 1000000L))
          .groupBy("event_type")
          .agg(count(lit(1)).as("n_events"),
            sum(when(col("keep"), 1L).otherwise(0L)).as("n_kept"),
            sum(when(!col("keep"), 1L).otherwise(0L)).as("n_dropped"))
          .orderBy("event_type")
      },
      Some(s"""WITH l AS (SELECT event_type,
            epoch_us(ts) AS us,
            lag(epoch_us(ts)) OVER (PARTITION BY user_id, event_type
              ORDER BY ts, event_id) AS prev_us
          FROM events)
        SELECT event_type, COUNT(*) AS n_events,
          CAST(SUM(CASE WHEN prev_us IS NULL
            OR us - prev_us > ${debounceSec}000000 THEN 1 ELSE 0 END)
            AS BIGINT) AS n_kept,
          CAST(SUM(CASE WHEN prev_us IS NOT NULL
            AND us - prev_us <= ${debounceSec}000000 THEN 1 ELSE 0 END)
            AS BIGINT) AS n_dropped
        FROM l GROUP BY event_type ORDER BY event_type""")),

    // ── OOV-rate drift monitor (per-source vocabulary coverage) ────────
    // Per source: what fraction of token occurrences fall outside the
    // corpus's top-oovVocab vocabulary — the cheap canary for a source
    // whose distribution drifted from the corpus (new language, new
    // boilerplate, encoding rot). Vocabulary by total occurrences (ties
    // by token) broadcasts; the corpus is touched twice (vocab count +
    // coverage pass), integer counts, one exact division.
    QueryDef("q124_oov_rate",
      (s, dir) => {
        val toks = tPar(s, dir, "documents")
          .select(col("source"),
            explode(TextStats.tokens(col("text"))).as("token"))
        val vocab = toks.groupBy("token").agg(count(lit(1)).as("c"))
          .orderBy(desc("c"), col("token")).limit(oovVocab)
          .select(col("token"), lit(1).as("in_vocab"))
        toks.join(broadcast(vocab), Seq("token"), "left")
          .groupBy("source")
          .agg(count(lit(1)).as("n_tokens"),
            sum(when(col("in_vocab").isNull, 1L).otherwise(0L))
              .as("n_oov"))
          .withColumn("oov_rate",
            col("n_oov").cast("double") / col("n_tokens").cast("double"))
          .orderBy("source")
      },
      Some(s"""WITH toks AS (SELECT source, unnest($dTok) AS token
            FROM documents),
          v AS (SELECT token FROM (SELECT token, COUNT(*) AS c FROM toks
            GROUP BY 1 ORDER BY c DESC, token LIMIT $oovVocab))
        SELECT source, COUNT(*) AS n_tokens,
          CAST(SUM(CASE WHEN v.token IS NULL THEN 1 ELSE 0 END)
            AS BIGINT) AS n_oov,
          CAST(SUM(CASE WHEN v.token IS NULL THEN 1 ELSE 0 END)
            AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) AS oov_rate
        FROM toks LEFT JOIN v ON toks.token = v.token
        GROUP BY source ORDER BY source""")),

    // ── Histogram drift: per-source total-variation distance ───────────
    // The distribution-shift companion of q124's OOV canary, with NO
    // transcendental in sight (PSI/KL need ln — engine-dependent bits):
    // TV(source, corpus) = ½·Σ_bins |c_i/N_s − d_i/N| over a fixed
    // 10-bin doc-length histogram. Cross-multiplying keeps every
    // numerator an exact integer — Σ|c_i·N − d_i·N_s| — so the sum is
    // order-independent and ONE final division produces the double.
    // Zero-count bins included via a generated (source × bin) grid
    // (tiny), corpus histogram broadcast.
    QueryDef("q125_histogram_drift",
      (s, dir) => {
        val d = tPar(s, dir, "documents")
          .select(col("source"),
            least(expr("n_chars div 200"), lit(9L)).as("bin"))
        val sb = d.groupBy("source", "bin").agg(count(lit(1)).as("c"))
        val cb = d.groupBy("bin").agg(count(lit(1)).as("d"))
        val ns = d.groupBy("source").agg(count(lit(1)).as("n_src"))
        val grid = ns.select(col("source"), col("n_src"),
          explode(sequence(lit(0L), lit(9L))).as("bin"))
        grid
          .join(sb, Seq("source", "bin"), "left")
          .join(broadcast(cb), Seq("bin"), "left")
          .crossJoin(broadcast(d.agg(count(lit(1)).as("n_tot"))))
          .withColumn("num", abs(coalesce(col("c"), lit(0L)) * col("n_tot")
            - coalesce(col("d"), lit(0L)) * col("n_src")))
          .groupBy("source")
          .agg(max(col("n_src")).as("n_docs"),
            sum(col("num")).as("tv_num"),
            max(col("n_tot")).as("n_tot"))
          .select(col("source"), col("n_docs"),
            (col("tv_num").cast("double") /
              (lit(2.0) * col("n_docs").cast("double") *
                col("n_tot").cast("double"))).as("tv_dist"))
          .orderBy("source")
      },
      Some("""WITH d AS (SELECT source,
            LEAST(n_chars // 200, 9) AS bin FROM documents),
          sb AS (SELECT source, bin, COUNT(*) AS c FROM d GROUP BY 1, 2),
          cb AS (SELECT bin, COUNT(*) AS dc FROM d GROUP BY 1),
          ns AS (SELECT source, COUNT(*) AS n_src FROM d GROUP BY 1),
          nt AS (SELECT COUNT(*) AS n_tot FROM d),
          grid AS (SELECT ns.source, ns.n_src, g.bin
            FROM ns CROSS JOIN (SELECT unnest(generate_series(0, 9))
              AS bin) g)
        SELECT grid.source, MAX(grid.n_src) AS n_docs,
          CAST(CAST(SUM(ABS(COALESCE(sb.c, 0) * nt.n_tot
              - COALESCE(cb.dc, 0) * grid.n_src)) AS BIGINT) AS DOUBLE)
            / (2.0 * CAST(MAX(grid.n_src) AS DOUBLE)
              * CAST(MAX(nt.n_tot) AS DOUBLE)) AS tv_dist
        FROM grid
        LEFT JOIN sb ON grid.source = sb.source AND grid.bin = sb.bin
        LEFT JOIN cb ON grid.bin = cb.bin
        CROSS JOIN nt
        GROUP BY grid.source ORDER BY grid.source""")),

    // ── Interval-overlap join: concurrent activity bursts ──────────────
    // The interval–interval sibling of q62's point-in-interval join:
    // per (event_type, day) activity bursts [first, last+1) µs, then
    // the cross-type concurrency matrix — how many daily bursts of A
    // overlapped a burst of B. Both sides replicate to hour buckets and
    // each pair is emitted exactly once, in the bucket holding the
    // overlap's START — a map-side predicate, so no DISTINCT shuffle
    // over the pair set (the q62 bucketization, extended to two
    // replicated sides).
    QueryDef("q126_burst_overlap",
      (s, dir) => {
        val b = t(s, dir, "events")
          .groupBy(col("event_type"),
            expr("unix_micros(ts) div 86400000000").as("day"))
          .agg(min(expr("unix_micros(ts)")).as("lo"),
            (max(expr("unix_micros(ts)")) + 1L).as("hi"))
        val l = b.select(col("event_type").as("type_a"),
          col("lo").as("lo_a"), col("hi").as("hi_a"))
        val r = b.select(col("event_type").as("type_b"),
          col("lo").as("lo_b"), col("hi").as("hi_b"))
        graft.ext.RangeJoin.intervalOverlap(l, r,
            "lo_a", "hi_a", "lo_b", "hi_b", 3600000000L)
          .filter(col("type_a") < col("type_b"))
          .groupBy("type_a", "type_b")
          .agg(count(lit(1)).as("n_overlaps"))
          .orderBy("type_a", "type_b")
      },
      Some("""WITH b AS (SELECT event_type,
            epoch_us(ts) // 86400000000 AS day,
            MIN(epoch_us(ts)) AS lo, MAX(epoch_us(ts)) + 1 AS hi
          FROM events GROUP BY 1, 2)
        SELECT a.event_type AS type_a, c.event_type AS type_b,
          COUNT(*) AS n_overlaps
        FROM b a JOIN b c
          ON a.event_type < c.event_type
          AND a.lo < c.hi AND c.lo < a.hi
        GROUP BY 1, 2 ORDER BY type_a, type_b""")),

    // ── Sliding-window distinct users via KMV sketch merge ─────────────
    // The daily-sketch-table pattern a 100 TB warehouse uses for
    // rolling distinct counts: per (type, day) keep the k smallest
    // distinct user hashes (TopKPerKey — ≤ k rows per group leave any
    // map task), then every 7-day window folds just the sketch rows —
    // raw history is never re-scanned per window. Sound because the
    // union of per-day k-minima contains the window's k-minima (any
    // hash in the window's bottom-k is in its own day's bottom-k), the
    // same merge property q116 leans on. The oracle computes each
    // window's bottom-k directly from raw rows — if the merge lost
    // anything, the hashes (and the estimate) would differ.
    QueryDef("q127_sliding_distinct",
      (s, dir) => {
        val k = kmvK
        val hashed = t(s, dir, "events")
          .select(col("event_type"),
            expr("unix_micros(ts) div 86400000000").as("day"),
            Shingles.baseHash(col("user_id").cast("string")).as("h"))
          .distinct()
        val daily = graft.plans.TopKPerKey.topKPerKey(hashed,
            Seq("event_type", "day"),
            Seq(graft.plans.TopKPerKey.Sort("h")), k)
          .groupBy("event_type", "day")
          .agg(sort_array(collect_list(col("h"))).as("sk"))
        val merged = daily
          .select(col("event_type"),
            explode(sequence(col("day"), col("day") + 6))
              .as("window_end"), col("sk"))
          .groupBy("event_type", "window_end")
          .agg(count(lit(1)).as("n_days"),
            slice(array_distinct(sort_array(flatten(
              collect_list(col("sk"))))), 1, k).as("mg"))
        merged.select(col("event_type"), col("window_end"),
            col("n_days"),
            size(col("mg")).cast("long").as("k_actual"),
            element_at(col("mg"), size(col("mg"))).as("kth_hash"))
          .withColumn("distinct_estimate",
            when(col("k_actual") < k, col("k_actual").cast("double"))
              .otherwise((col("k_actual") - 1).cast("double") *
                268435456.0 / col("kth_hash").cast("double")))
          .orderBy("event_type", "window_end")
      },
      Some(s"""WITH h AS (SELECT DISTINCT event_type,
            epoch_us(ts) // 86400000000 AS day,
            ('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 7))::BIGINT
              AS h
          FROM events),
        w AS (SELECT DISTINCT event_type, day + g.i AS window_end, h
          FROM h CROSS JOIN
            (SELECT unnest(generate_series(0, 6)) AS i) g),
        nd AS (SELECT event_type, day + g.i AS window_end,
            COUNT(*) AS n_days
          FROM (SELECT DISTINCT event_type, day FROM h) d
          CROSS JOIN (SELECT unnest(generate_series(0, 6)) AS i) g
          GROUP BY 1, 2),
        r AS (SELECT event_type, window_end, h, row_number() OVER (
            PARTITION BY event_type, window_end ORDER BY h) AS rn
          FROM w),
        topk AS (SELECT event_type, window_end,
            COUNT(*) AS k_actual, MAX(h) AS kth_hash
          FROM r WHERE rn <= $kmvK GROUP BY 1, 2)
        SELECT t.event_type, t.window_end, nd.n_days,
          t.k_actual, t.kth_hash,
          CASE WHEN t.k_actual < $kmvK
            THEN CAST(t.k_actual AS DOUBLE)
            ELSE CAST(t.k_actual - 1 AS DOUBLE) * 268435456.0
              / CAST(t.kth_hash AS DOUBLE) END AS distinct_estimate
        FROM topk t JOIN nd
          ON t.event_type = nd.event_type
          AND t.window_end = nd.window_end
        ORDER BY t.event_type, t.window_end""")),

    // ── Rank-based winsorize gate (tail trim before training) ──────────
    // Keep each source's docs whose length rank lies in [5%, 95%] —
    // truncation-style winsorizing as an exact integer predicate on the
    // per-stratum rank (rk·20 in [1·n, 19·n]), so no engine pair can
    // disagree on percentile interpolation. One rank window per
    // stratum; the audit is a groupBy over the kept rows.
    QueryDef("q128_winsorize",
      (s, dir) => Curation.winsorizeByRank(tPar(s, dir, "documents"),
          Seq("source"), "n_chars", "doc_id", 1, 19, 20)
        .groupBy("source")
        .agg(count(lit(1)).as("n_kept"),
          min(col("n_chars")).as("len_lo"),
          max(col("n_chars")).as("len_hi"))
        .orderBy("source"),
      Some("""WITH r AS (SELECT source, n_chars,
            row_number() OVER (PARTITION BY source
              ORDER BY n_chars, doc_id) AS rk,
            COUNT(*) OVER (PARTITION BY source) AS n
          FROM documents)
        SELECT source, COUNT(*) AS n_kept,
          MIN(n_chars) AS len_lo, MAX(n_chars) AS len_hi
        FROM r
        WHERE rk * 20 >= 1 * n AND rk * 20 <= 19 * n
        GROUP BY source ORDER BY source""")),

    // ── Lag-1 autocorrelation of daily event volume ────────────────────
    // Time-series health per type: Pearson r between each day's event
    // count and the previous day's — the volume-stability canary (a
    // feed that spikes/flatlines shows r collapsing). Counts are exact
    // integers; the (prev, cur) pairs ride one lag window over the tiny
    // per-day table; sufficient sums stay integral (counts ≤ ~1e6 ⇒
    // products ≤ 1e12, sums exact in BIGINT), and r is one fixed IEEE
    // expression over them — q112's discipline with no decimals needed.
    QueryDef("q129_volume_autocorr",
      (s, dir) => {
        val daily = t(s, dir, "events")
          .groupBy(col("event_type"),
            expr("unix_micros(ts) div 86400000000").as("day"))
          .agg(count(lit(1)).as("c"))
        val w = Window.partitionBy("event_type").orderBy(col("day"))
        val pairs = daily
          .withColumn("prev", lag(col("c"), 1).over(w))
          .filter(col("prev").isNotNull)
        val g = pairs.groupBy("event_type").agg(
          count(lit(1)).cast("double").as("n"),
          sum(col("prev")).cast("double").as("sx"),
          sum(col("c")).cast("double").as("sy"),
          sum(col("prev") * col("prev")).cast("double").as("sxx"),
          sum(col("prev") * col("c")).cast("double").as("sxy"),
          sum(col("c") * col("c")).cast("double").as("syy"))
        val den1 = col("n") * col("sxx") - col("sx") * col("sx")
        val den2 = col("n") * col("syy") - col("sy") * col("sy")
        g.select(col("event_type"), col("n").cast("long").as("n_pairs"),
            when(den1 > 0.0 && den2 > 0.0,
              (col("n") * col("sxy") - col("sx") * col("sy")) /
                sqrt(den1 * den2)).as("autocorr"))
          .orderBy("event_type")
      },
      Some("""WITH daily AS (SELECT event_type,
            epoch_us(ts) // 86400000000 AS day, COUNT(*) AS c
          FROM events GROUP BY 1, 2),
        p AS (SELECT event_type, c,
            lag(c) OVER (PARTITION BY event_type ORDER BY day) AS prev
          FROM daily),
        g AS (SELECT event_type,
            CAST(COUNT(*) AS DOUBLE) AS n,
            CAST(SUM(prev) AS DOUBLE) AS sx,
            CAST(SUM(c) AS DOUBLE) AS sy,
            CAST(SUM(prev * prev) AS DOUBLE) AS sxx,
            CAST(SUM(prev * c) AS DOUBLE) AS sxy,
            CAST(SUM(c * c) AS DOUBLE) AS syy
          FROM p WHERE prev IS NOT NULL GROUP BY 1)
        SELECT event_type, CAST(n AS BIGINT) AS n_pairs,
          CASE WHEN (n * sxx - sx * sx) > 0.0
              AND (n * syy - sy * sy) > 0.0
            THEN (n * sxy - sx * sy)
              / sqrt((n * sxx - sx * sx) * (n * syy - sy * sy)) END
            AS autocorr
        FROM g ORDER BY event_type""")),

    // ── Duplicate-cluster size histogram (dedup audit) ─────────────────
    // The number a curation run reports: how big are the near-dup
    // families? q45's connected components over the minhash candidate
    // graph, folded twice — cluster → size, size → cluster count. The
    // histogram is bounded by the largest family, so the output stays
    // tiny at any corpus scale; everything rides the same capped
    // candidate generation as q45.
    QueryDef("q130_cluster_histogram",
      (s, dir) => {
        val pairs = Dedup.minhashCandidates(tPar(s, dir, "documents"),
          "doc_id", "text", shingleK, minhashHashes, minhashBandRows)
        Dedup.dedupClusters(pairs)
          .groupBy("cluster").agg(count(lit(1)).as("family_size"))
          .groupBy("family_size").agg(count(lit(1)).as("n_families"))
          .orderBy("family_size")
      },
      Some(s"""WITH RECURSIVE $dMinhashCandCtes,
        edges AS (SELECT id_a AS u, id_b AS v FROM cand
                  UNION SELECT id_b, id_a FROM cand),
        nodes AS (SELECT DISTINCT u AS id FROM edges),
        reach(id, r) AS (
          SELECT id, id FROM nodes
          UNION
          SELECT rr.id, e.v FROM reach rr JOIN edges e ON rr.r = e.u),
        cl AS (SELECT id, min(r) AS cluster FROM reach GROUP BY id),
        fam AS (SELECT cluster, COUNT(*) AS family_size
          FROM cl GROUP BY 1)
        SELECT family_size, COUNT(*) AS n_families
        FROM fam GROUP BY family_size ORDER BY family_size""")),

    // ── Embedding-quality audit: per-label norm distribution ───────────
    // The broken-embedding canary a vector pipeline runs before
    // indexing: per label, the count, the ‖v‖² range, the decimal-exact
    // mean ‖v‖², and how many vectors are degenerate (zero norm —
    // failed encodes). ‖v‖² is the same left-associated sequential fold
    // as the ANN dot products (bit-exact twin in the oracle); the
    // cross-row mean rides the Parity decimal sum. Map + one
    // partial-agg shuffle.
    QueryDef("q131_embedding_audit",
      (s, dir) => {
        val e = tPar(s, dir, "embeddings")
          .withColumn("norm2",
            Similarity.dot(col("embedding"), col("embedding")))
        e.groupBy("label").agg(
            count(lit(1)).as("n_vecs"),
            sum(when(col("norm2") <= 0.0, 1L).otherwise(0L))
              .as("n_degenerate"),
            min(col("norm2")).as("min_norm2"),
            max(col("norm2")).as("max_norm2"),
            graft.functions.Parity.dsum(col("norm2")).as("total"))
          .select(col("label"), col("n_vecs"), col("n_degenerate"),
            col("min_norm2"), col("max_norm2"),
            (col("total") / col("n_vecs").cast("double"))
              .as("mean_norm2"))
          .orderBy("label")
      },
      Some(s"""WITH n AS (SELECT label,
            (${dDot("embedding", "embedding")}) AS norm2
          FROM embeddings)
        SELECT label, COUNT(*) AS n_vecs,
          CAST(SUM(CASE WHEN norm2 <= 0.0 THEN 1 ELSE 0 END) AS BIGINT)
            AS n_degenerate,
          MIN(norm2) AS min_norm2, MAX(norm2) AS max_norm2,
          ${dsumSql("norm2")} / CAST(COUNT(*) AS DOUBLE) AS mean_norm2
        FROM n GROUP BY label ORDER BY label""")),

    // ── Table statistics collection (the ANALYZE / CBO primitive) ──────
    // Per-column profile of lineitem's measures in ONE scan: row/null
    // counts, exact NDV (swap for HLL/KMV at 100 TB — same shape),
    // min/max, decimal-exact mean. The per-column rows explode from an
    // in-row struct array, so output is |cols| rows at any table size.
    QueryDef("q132_table_stats",
      (s, dir) => graft.ext.Stats.numericColumnStats(
          t(s, dir, "lineitem"),
          Seq("l_quantity", "l_extendedprice", "l_discount", "l_tax"))
        .orderBy("column"),
      Some {
        def one(c: String) =
          s"""SELECT '$c' AS "column", COUNT(*) AS n,
            COUNT(*) - COUNT($c) AS n_null,
            COUNT(DISTINCT $c) AS ndv,
            CAST(MIN($c) AS DOUBLE) AS min_v,
            CAST(MAX($c) AS DOUBLE) AS max_v,
            ${dsumSql(c)} / CAST(COUNT($c) AS DOUBLE) AS mean_v
          FROM lineitem"""
        Seq("l_quantity", "l_extendedprice", "l_discount", "l_tax")
          .map(one).mkString("", " UNION ALL ", " ORDER BY \"column\"")
      }),

    // ── Ratio-to-report: contribution analysis over the star ───────────
    // The BI staple the report suite lacked: each nation's share of its
    // region's revenue and of the grand total — one aggregation, then
    // two window sums OVER THE AGGREGATE (|nations| rows), so the
    // shares cost nothing at any fact size. Numerators/denominators are
    // the q03 decimal-exact revenue doubles; each share is one IEEE
    // division.
    QueryDef("q133_ratio_to_report",
      (s, dir) => {
        val revenue = col("l_extendedprice") * (lit(1) - col("l_discount"))
        val base = t(s, dir, "lineitem")
          .join(t(s, dir, "orders"),
            col("l_orderkey") === col("o_orderkey"))
          .join(t(s, dir, "customer"), col("o_custkey") === col("c_custkey"))
          .join(broadcast(t(s, dir, "nation")),
            col("c_nationkey") === col("n_nationkey"))
          .join(broadcast(t(s, dir, "region")),
            col("n_regionkey") === col("r_regionkey"))
          .groupBy("r_name", "n_name")
          // carry the EXACT decimal alongside the double view: window
          // totals must fold source decimals, not doubles re-cast to
          // decimal — Spark's double→decimal goes through the shortest
          // decimal representation while DuckDB rounds the binary
          // value, so a re-entered decimal can differ at 1e-8 and the
          // share at 1 ulp (seen at sf0.1)
          .agg(dsum(revenue).as("revenue"),
            sum(revenue.cast(org.apache.spark.sql.types
              .DecimalType(30, 8))).as("rev_dec"))
        base
          .withColumn("region_share", col("revenue") /
            sum(col("rev_dec")).over(Window.partitionBy("r_name"))
              .cast("double"))
          .withColumn("total_share", col("revenue") /
            sum(col("rev_dec")).over(Window.partitionBy()).cast("double"))
          .drop("rev_dec")
          .orderBy("r_name", "n_name")
      },
      Some(s"""WITH base AS (SELECT r_name, n_name,
            ${dsumSql("l_extendedprice*(1-l_discount)")} AS revenue,
            SUM(CAST(l_extendedprice*(1-l_discount) AS DECIMAL(30,8)))
              AS rev_dec
          FROM lineitem
          JOIN orders ON l_orderkey = o_orderkey
          JOIN customer ON o_custkey = c_custkey
          JOIN nation ON c_nationkey = n_nationkey
          JOIN region ON n_regionkey = r_regionkey
          GROUP BY r_name, n_name)
        SELECT r_name, n_name, revenue,
          revenue / CAST(CAST(SUM(rev_dec)
            OVER (PARTITION BY r_name) AS VARCHAR) AS DOUBLE)
            AS region_share,
          revenue / CAST(CAST(SUM(rev_dec)
            OVER () AS VARCHAR) AS DOUBLE) AS total_share
        FROM base ORDER BY r_name, n_name""")),

    // ── Sorted-neighborhood dedup (sort-based candidate generation) ────
    // Hernández-Stolfo SNM: the third blocking strategy next to q105's
    // attribute blocks and q106's prefix filter — candidates come from
    // sort adjacency (O(n·w)), needing no frequency statistics. Blocked
    // by the sort key's first character so each block sorts in its own
    // partition (a bare Window.orderBy would serialize the corpus).
    QueryDef("q134_sorted_neighborhood",
      (s, dir) => Dedup.sortedNeighborhoodPairs(tPar(s, dir, "documents"),
        "doc_id", "text", snmWindow, jaccardMin)
        .orderBy("id_a", "id_b"),
      Some(s"""WITH b AS (SELECT doc_id, list_distinct($dTok) AS toks,
            $dNorm AS sk FROM documents),
          r AS (SELECT doc_id, toks, sk, substr(sk, 1, 1) AS blk,
            row_number() OVER (PARTITION BY substr(sk, 1, 1)
              ORDER BY sk, doc_id) AS rn FROM b),
          p AS (SELECT least(a.doc_id, c.doc_id) AS id_a,
              greatest(a.doc_id, c.doc_id) AS id_b,
              len(list_intersect(a.toks, c.toks)) AS shared,
              len(a.toks) + len(c.toks)
                - len(list_intersect(a.toks, c.toks)) AS un
            FROM r a JOIN r c ON a.blk = c.blk
              AND c.rn BETWEEN a.rn + 1 AND a.rn + $snmWindow)
        SELECT id_a, id_b,
          CAST(shared AS DOUBLE) / CAST(un AS DOUBLE) AS jaccard
        FROM p
        WHERE CAST(shared AS DOUBLE) / CAST(un AS DOUBLE) >= $jaccardMin
        ORDER BY id_a, id_b""")),

    // ── Lexical diversity profile (rational-arithmetic, no entropy) ────
    QueryDef("q135_lexical_diversity",
      (s, dir) => TextStats.lexicalDiversity(
        tPar(s, dir, "documents"), "doc_id", "text")
        .orderBy("doc_id"),
      Some(s"""WITH g AS (SELECT doc_id, unnest($dTok) AS tok
            FROM documents),
          pc AS (SELECT doc_id, tok, COUNT(*) AS c FROM g GROUP BY 1, 2)
        SELECT doc_id, CAST(SUM(c) AS BIGINT) AS n_tokens,
          CAST(COUNT(*) AS BIGINT) AS n_types,
          CAST(COUNT(*) AS DOUBLE) / CAST(SUM(c) AS DOUBLE) AS ttr,
          CAST(SUM(CASE WHEN c = 1 THEN 1 ELSE 0 END) AS DOUBLE)
            / CAST(COUNT(*) AS DOUBLE) AS hapax_frac,
          CAST(SUM(c * c) AS DOUBLE)
            / CAST(SUM(c) * SUM(c) AS DOUBLE) AS simpson
        FROM pc GROUP BY doc_id ORDER BY doc_id""")),

    // ── Bigram predictability: count-based LM quality scoring ──────────
    // The CCNet-style perplexity-filter stand-in, kept rational (each
    // conditional probability quantized to 1e-8 before the per-doc sum)
    // so both engines agree bit-for-bit.
    QueryDef("q136_bigram_lm",
      (s, dir) => TextStats.bigramPredictability(
        tPar(s, dir, "documents"), "doc_id", "text")
        .orderBy("doc_id"),
      Some(s"""WITH g AS (SELECT doc_id,
            unnest(${dShingles(dTok, 2)}) AS bg FROM documents),
          c2 AS (SELECT bg, COUNT(*) AS c2 FROM g GROUP BY bg),
          c1 AS (SELECT split_part(bg, ' ', 1) AS w1, COUNT(*) AS c1
            FROM g GROUP BY 1),
          s AS (SELECT doc_id,
            floor(CAST(x.c2 AS DOUBLE) / CAST(y.c1 AS DOUBLE)
              * 100000000.0) AS q
          FROM g JOIN c2 x USING (bg)
            JOIN c1 y ON split_part(g.bg, ' ', 1) = y.w1)
        SELECT doc_id, COUNT(*) AS n_bigrams,
          CAST(SUM(q) AS DOUBLE) / 100000000.0 / COUNT(*)
            AS predictability
        FROM s GROUP BY doc_id ORDER BY doc_id""")),

    // ── Dup-cluster survivorship: canonical doc per near-dup family ────
    // Completes the dedup story (detect → cluster → SELECT): per q45
    // connected component, keep the highest-quality member (q21's score,
    // doc_id tie-break) and count what gets discarded. The ranking is a
    // window over cluster id — families are small by construction (the
    // capped candidate generation bounds them), so the window never sees
    // a corpus-sized partition.
    QueryDef("q137_cluster_survivor",
      (s, dir) => {
        val docs = tPar(s, dir, "documents")
        val pairs = Dedup.minhashCandidates(docs,
          "doc_id", "text", shingleK, minhashHashes, minhashBandRows)
        val cl = Dedup.dedupClusters(pairs)
          .select(col("id").as("doc_id"), col("cluster"))
        val quality = docs.select(col("doc_id"),
          TextStats.qualityScore(col("text"), stopwords).as("quality"))
        val w = Window.partitionBy("cluster")
          .orderBy(col("quality").desc, col("doc_id").asc)
        cl.join(quality, "doc_id")
          .withColumn("rn", row_number().over(w))
          .groupBy("cluster")
          .agg(count(lit(1)).as("family_size"),
            max(when(col("rn") === 1, col("doc_id"))).as("survivor_doc_id"),
            max(when(col("rn") === 1, col("quality"))).as("survivor_quality"),
            (count(lit(1)) - 1).as("n_discarded"))
          .orderBy("cluster")
      },
      Some(s"""WITH RECURSIVE $dMinhashCandCtes,
        edges AS (SELECT id_a AS u, id_b AS v FROM cand
                  UNION SELECT id_b, id_a FROM cand),
        nodes AS (SELECT DISTINCT u AS id FROM edges),
        reach(id, r) AS (
          SELECT id, id FROM nodes
          UNION
          SELECT rr.id, e.v FROM reach rr JOIN edges e ON rr.r = e.u),
        cl AS (SELECT id, min(r) AS cluster FROM reach GROUP BY id),
        q AS (SELECT doc_id, $dQualityExpr AS quality FROM documents),
        rk AS (SELECT cl.cluster, cl.id AS doc_id, q.quality,
            row_number() OVER (PARTITION BY cl.cluster
              ORDER BY q.quality DESC, cl.id) AS rn
          FROM cl JOIN q ON cl.id = q.doc_id)
        SELECT cluster, COUNT(*) AS family_size,
          MAX(CASE WHEN rn = 1 THEN doc_id END) AS survivor_doc_id,
          MAX(CASE WHEN rn = 1 THEN quality END) AS survivor_quality,
          COUNT(*) - 1 AS n_discarded
        FROM rk GROUP BY cluster ORDER BY cluster""")),

    // ── Seasonal anomaly detection: same-weekday volume baseline ───────
    // The pipeline-monitoring staple over q129's daily series: each
    // day's event count against the mean/std of ITS weekday (epoch-day
    // mod 7 — no calendar semantics, so both engines bucket
    // identically), flagged at 2σ. Daily counts are exact longs, so
    // mean and variance come from exact integer sums — the only IEEE
    // ops are the final divisions and the sqrt, identical per-row on
    // both engines. Two partial-agg shuffles (day, then weekday: 7
    // rows) and a broadcast-back join.
    QueryDef("q138_seasonal_anomaly",
      (s, dir) => {
        val daily = t(s, dir, "events")
          .select(expr("unix_micros(ts) div 86400000000").as("d"))
          .groupBy("d").agg(count(lit(1)).as("cnt"))
          .withColumn("dow", col("d") % 7)
        val stats = daily.groupBy("dow")
          .agg(count(lit(1)).as("n_days"), sum(col("cnt")).as("s"),
            sum(col("cnt") * col("cnt")).as("ss"))
        daily.join(broadcast(stats), "dow")
          .withColumn("mean_cnt",
            col("s").cast("double") / col("n_days"))
          .withColumn("var_cnt", when(col("n_days") > 1,
            (col("ss").cast("double") - col("s").cast("double") * col("s")
              / col("n_days")) / (col("n_days") - 1)))
          .select(col("d"), col("dow"), col("cnt"), col("mean_cnt"),
            (abs(col("cnt") - col("mean_cnt")) >
              lit(2.0) * sqrt(col("var_cnt"))).cast("long").as("is_anomaly"))
          .orderBy("d")
      },
      Some("""WITH daily AS (SELECT epoch_us(ts) // 86400000000 AS d,
            COUNT(*) AS cnt FROM events GROUP BY 1),
          dw AS (SELECT d, cnt, d % 7 AS dow FROM daily),
          st AS (SELECT dow, COUNT(*) AS n_days, SUM(cnt) AS s,
            SUM(cnt * cnt) AS ss FROM dw GROUP BY dow)
        SELECT d, dow, cnt,
          CAST(s AS DOUBLE) / n_days AS mean_cnt,
          CAST(abs(cnt - CAST(s AS DOUBLE) / n_days) >
            2.0 * sqrt(CASE WHEN n_days > 1 THEN
              (CAST(ss AS DOUBLE) - CAST(s AS DOUBLE) * s / n_days)
                / (n_days - 1) END) AS BIGINT) AS is_anomaly
        FROM dw JOIN st USING (dow) ORDER BY d""")),

    // ── Leakage-safe grouped train/val split ───────────────────────────
    // q51 splits ROWS by hash; for supervised data that leaks — two
    // events of one user must not straddle train/val. The group key
    // (user) is hashed instead, so every row of a group lands in the
    // same fold deterministically, with no shuffle beyond the audit
    // aggregation itself.
    QueryDef("q139_grouped_split",
      (s, dir) => t(s, dir, "events")
        .withColumn("fold",
          Shingles.baseHash(col("user_id").cast("string")) % 5)
        .groupBy("fold")
        .agg(countDistinct(col("user_id")).as("n_users"),
          count(lit(1)).as("n_events"))
        .orderBy("fold"),
      Some("""SELECT ('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 7))
            ::BIGINT % 5 AS fold,
          COUNT(DISTINCT user_id) AS n_users, COUNT(*) AS n_events
        FROM events GROUP BY 1 ORDER BY fold""")),

    // ── Last-touch attribution over the event stream ───────────────────
    // Which marketing touch (click/view) most recently preceded each
    // purchase? One user-partitioned window with an IGNORE NULLS
    // last_value over the preceding frame — no self-join, no as-of join
    // against a touches table, history scanned once. Purchases with no
    // prior touch attribute to 'none'.
    QueryDef("q140_attribution",
      (s, dir) => {
        val w = Window.partitionBy("user_id")
          .orderBy(col("ts"), col("event_id"))
          .rowsBetween(Window.unboundedPreceding, -1)
        t(s, dir, "events")
          .withColumn("last_touch",
            last(when(col("event_type").isin("click", "view"),
              col("event_type")), ignoreNulls = true).over(w))
          .filter(col("event_type") === "purchase")
          .groupBy(coalesce(col("last_touch"), lit("none")).as("channel"))
          .agg(count(lit(1)).as("n_purchases"),
            graft.functions.Parity.dsum(col("value")).as("revenue"))
          .orderBy("channel")
      },
      Some(s"""WITH t AS (SELECT event_type, value,
            last_value(CASE WHEN event_type IN ('click', 'view')
                THEN event_type END IGNORE NULLS)
              OVER (PARTITION BY user_id ORDER BY ts, event_id
                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
              AS last_touch
          FROM events)
        SELECT COALESCE(last_touch, 'none') AS channel,
          COUNT(*) AS n_purchases,
          CAST(CAST(SUM(CAST(value AS DECIMAL(30,8))) AS VARCHAR)
            AS DOUBLE) AS revenue
        FROM t WHERE event_type = 'purchase'
        GROUP BY 1 ORDER BY channel""")),

    // ── EXACT median without a global sort (histogram refinement) ──────
    // The third leg of the quantile family: q55/q116 are one-pass
    // approximations, q34 is the sort-based exact path — this is exact
    // AND sort-free: O(log) bucket-count passes narrow a per-group
    // window around the median ranks, then only the tiny surviving
    // windows are ranked. tail=32 forces several refinement rounds at
    // test scale, so the loop itself is exercised, not just the finish.
    QueryDef("q141_exact_median",
      (s, dir) => graft.ext.Stats.exactMedianByGroup(
        t(s, dir, "events"), "user_id", "value",
        buckets = 64, tail = 32)
        .orderBy("user_id"),
      Some("""SELECT user_id, COUNT(value) AS n, median(value) AS median
        FROM events GROUP BY user_id ORDER BY user_id""")),

    // ── Linear-interpolation gap fill (the step up from q84's LOCF) ────
    // Missing hours get the straight line between the bracketing
    // observations — prev + (next − prev)·(t − tp)/(tn − tp), written
    // identically on both engines so the IEEE ops agree bit-for-bit.
    // Edges fall back to LOCF/BOCF. Same scale shape as q84: per-user
    // grid explode, one left join, two ignore-nulls windows over the
    // user partition — history scanned once, no self-join per gap.
    QueryDef("q142_linear_interp",
      (s, dir) => {
        // SEGMENT-EXPLODE shape, not grid-join: the dense output grid
        // spans min..max of event hours, so every output point lies
        // inside a segment between consecutive observations (or in the
        // head/tail constant-fill runs). Windows therefore only ever
        // run over the OBSERVATION table (one lead pass); the dense
        // grid is produced map-side by exploding each segment — no
        // dense-grid join, no dense-grid window. The r9 bench caught
        // the old grid-join form at 29 s (two full-grid window sorts
        // plus a full-grid shuffle join); this plan produces the
        // identical rows with the grid appearing only at the final
        // explode.
        val hourUs = 3600000000L
        val ev = t(s, dir, "events")
          .withColumn("hour_us",
            floor(unix_micros(col("ts")) / hourUs).cast("long") * hourUs)
        val w = Window.partitionBy("user_id", "hour_us")
          .orderBy(col("ts").desc, col("event_id").desc)
        val hourly = ev.withColumn("rn", row_number().over(w))
          .filter(col("rn") === 1)
          .select(col("user_id"), col("hour_us"), col("value"))
        val bounds = ev.groupBy("user_id")
          .agg(min(col("hour_us")).as("lo"), max(col("hour_us")).as("hi"))
        // null-valued hours count as UNOBSERVED (the grid-form contract:
        // ignore-nulls windows skipped them) — segment anchors are the
        // non-null observations only
        val obs = hourly.filter(col("value").isNotNull)
        val wl = Window.partitionBy("user_id").orderBy("hour_us")
        val seg = obs
          .withColumn("nh", lead(col("hour_us"), 1).over(wl))
          .withColumn("nv", lead(col("value"), 1).over(wl))
          .withColumn("rn", row_number().over(wl))
        // head run: hours before the first observation take its value
        // (BOCF); a user with no non-null observation fills null
        val firstObs = seg.filter(col("rn") === 1)
          .select(col("user_id"), col("hour_us").as("fh"),
            col("value").as("fv"))
        val head = bounds.join(firstObs, Seq("user_id"), "left")
          .filter(col("fh").isNull || col("lo") < col("fh"))
          .select(col("user_id"),
            explode(sequence(col("lo"),
              coalesce(col("fh") - lit(hourUs), col("hi")),
              lit(hourUs))).as("hour_us"),
            lit(0L).as("observed"), col("fv").as("value_interp"))
        // each observation owns [its hour, next obs hour): interior
        // points interpolate, the last observation's run extends to hi
        // as constant fill (LOCF)
        val mids = seg.join(bounds, Seq("user_id"))
          .withColumn("end_h",
            coalesce(col("nh") - lit(hourUs), col("hi")))
          .withColumnRenamed("hour_us", "ph")
          .select(col("user_id"), col("ph"), col("value"),
            col("nh"), col("nv"),
            explode(sequence(col("ph"), col("end_h"), lit(hourUs)))
              .as("hour_us"))
          .select(col("user_id"), col("hour_us"),
            (col("hour_us") === col("ph")).cast("long").as("observed"),
            when(col("hour_us") === col("ph"), col("value"))
              .when(col("nh").isNull, col("value"))
              .otherwise(col("value") + (col("nv") - col("value")) *
                ((col("hour_us") - col("ph")).cast("double") /
                  (col("nh") - col("ph")).cast("double")))
              .as("value_interp"))
        head.unionByName(mids).orderBy("user_id", "hour_us")
      },
      Some("""WITH ev AS (SELECT user_id, event_id, ts, value,
            (epoch_us(ts) // 3600000000) * 3600000000 AS hour_us
          FROM events),
        hourly AS (SELECT user_id, hour_us, value FROM (
            SELECT user_id, hour_us, value,
              row_number() OVER (PARTITION BY user_id, hour_us
                ORDER BY ts DESC, event_id DESC) AS rn
            FROM ev) WHERE rn = 1),
        grid AS (SELECT user_id,
            unnest(range(lo, hi + 1, 3600000000)) AS hour_us
          FROM (SELECT user_id, MIN(hour_us) AS lo, MAX(hour_us) AS hi
            FROM ev GROUP BY user_id)),
        j AS (SELECT g.user_id, g.hour_us, h.value,
            last_value(h.value IGNORE NULLS) OVER (
              PARTITION BY g.user_id ORDER BY g.hour_us
              ROWS UNBOUNDED PRECEDING) AS pv,
            last_value(CASE WHEN h.value IS NOT NULL THEN g.hour_us END
              IGNORE NULLS) OVER (
              PARTITION BY g.user_id ORDER BY g.hour_us
              ROWS UNBOUNDED PRECEDING) AS ph,
            first_value(h.value IGNORE NULLS) OVER (
              PARTITION BY g.user_id ORDER BY g.hour_us
              ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS nv,
            first_value(CASE WHEN h.value IS NOT NULL THEN g.hour_us END
              IGNORE NULLS) OVER (
              PARTITION BY g.user_id ORDER BY g.hour_us
              ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS nh
          FROM grid g LEFT JOIN hourly h
            ON g.user_id = h.user_id AND g.hour_us = h.hour_us)
        SELECT user_id, hour_us,
          CAST(value IS NOT NULL AS BIGINT) AS observed,
          CASE WHEN value IS NOT NULL THEN value
            WHEN pv IS NULL THEN nv
            WHEN nv IS NULL THEN pv
            ELSE pv + (nv - pv) * (CAST(hour_us - ph AS DOUBLE)
              / CAST(nh - ph AS DOUBLE)) END AS value_interp
        FROM j ORDER BY user_id, hour_us""")),

    // ── Per-doc keyword extraction: top-3 distinctive tokens ───────────
    // tf·idf with the RATIONAL idf N/df (monotone in the log form, so
    // the top-k is identical, and the score stays correctly-rounded
    // IEEE on both engines — same trick as q89's BM25). The labeling /
    // topic-tagging primitive: which tokens best characterize each doc
    // against the corpus. Scale: tf and df are partial-agg shuffles on
    // (doc, token) / token, the corpus size is a broadcast scalar, and
    // the top-3 window partitions by doc — no corpus-wide sort.
    QueryDef("q143_tfidf_keywords",
      (s, dir) => {
        val docs = tPar(s, dir, "documents")
        val tf = docs.select(col("doc_id"),
          explode(TextStats.tokens(col("text"))).as("tok"))
          .groupBy("doc_id", "tok").agg(count(lit(1)).as("tf"))
        val dfreq = tf.groupBy("tok").agg(count(lit(1)).as("df"))
        val total = docs.agg(count(lit(1)).as("n_docs"))
        val w = Window.partitionBy("doc_id")
          .orderBy(col("score").desc, col("tok").asc)
        tf.join(dfreq, "tok").crossJoin(broadcast(total))
          .withColumn("score",
            col("tf").cast("double") * col("n_docs") / col("df"))
          .withColumn("rank", row_number().over(w).cast("long"))
          .filter(col("rank") <= 3)
          .select(col("doc_id"), col("rank"), col("tok"), col("score"))
          .orderBy("doc_id", "rank")
      },
      Some(s"""WITH tf AS (SELECT doc_id, tok, COUNT(*) AS tf
            FROM (SELECT doc_id, unnest($dTok) AS tok FROM documents)
            GROUP BY 1, 2),
          dfreq AS (SELECT tok, COUNT(*) AS df FROM tf GROUP BY tok),
          n AS (SELECT COUNT(*) AS n_docs FROM documents),
          sc AS (SELECT doc_id, tok,
            CAST(tf AS DOUBLE) * n_docs / df AS score
            FROM tf JOIN dfreq USING (tok) CROSS JOIN n),
          rk AS (SELECT doc_id, tok, score,
            row_number() OVER (PARTITION BY doc_id
              ORDER BY score DESC, tok) AS rank FROM sc)
        SELECT doc_id, rank, tok, score FROM rk
        WHERE rank <= 3 ORDER BY doc_id, rank""")),

    // ── Exact p10/p50/p90 bands, sort-free (q141's engine, general) ────
    // The per-(group, percentile) refinement: each percentile tracks its
    // own shrinking window, all percentiles share each round's single
    // scan, and the finish interpolates with quantile_cont semantics
    // (h = (n−1)·p, lower·(1−frac) + upper·frac) — float-op-identical
    // to the oracle.
    QueryDef("q144_exact_percentiles",
      (s, dir) => graft.ext.Stats.exactQuantilesByGroup(
        t(s, dir, "events"), "event_type", "value", Seq(0.1, 0.5, 0.9),
        buckets = 64, tail = 64)
        .orderBy("event_type", "p"),
      Some("""WITH q AS (SELECT event_type, COUNT(value) AS n,
            quantile_cont(value, 0.1) AS p10,
            quantile_cont(value, 0.5) AS p50,
            quantile_cont(value, 0.9) AS p90
          FROM events GROUP BY event_type)
        SELECT event_type, x.p, n,
          CASE x.p WHEN 0.1::DOUBLE THEN p10
                   WHEN 0.5::DOUBLE THEN p50 ELSE p90 END AS quantile
        FROM q CROSS JOIN (VALUES (0.1::DOUBLE), (0.5::DOUBLE),
          (0.9::DOUBLE)) x(p)
        ORDER BY event_type, p""")),

    // ── Right-to-be-forgotten purge cascade (audit counts) ─────────────
    // Erasure requests (a deterministic ~1% of customers) cascade
    // through the star: customer rows, their orders, their orders'
    // LINEITEMS (two-hop — the key never appears on the leaf table, it
    // arrives via a semi-join chain), plus the events of the same ids.
    // Each leg is a LEFT SEMI join against the broadcast-small request
    // set — the scale-safe purge plan: no fact-fact join, no collect;
    // the write side is the existing anti-join machinery (q04).
    QueryDef("q145_purge_cascade",
      (s, dir) => {
        val del = t(s, dir, "customer")
          .filter(Shingles.baseHash(col("c_custkey").cast("string"))
            % 97 === 0)
          .select(col("c_custkey").as("k"))
        def audit(name: String, df: DataFrame, key: Column) = {
          val hit = df.join(broadcast(del), key === col("k"), "left_semi")
          df.agg(count(lit(1)).as("n_before"))
            .crossJoin(hit.agg(count(lit(1)).as("n_deleted")))
            .select(lit(name).as("table_name"), col("n_before"),
              col("n_deleted"),
              (col("n_before") - col("n_deleted")).as("n_after"))
        }
        val delOrders = t(s, dir, "orders")
          .join(broadcast(del), col("o_custkey") === col("k"), "left_semi")
        val liHit = t(s, dir, "lineitem").join(
          broadcast(delOrders.select(col("o_orderkey").as("k"))),
          col("l_orderkey") === col("k"), "left_semi")
        audit("customer", t(s, dir, "customer"), col("c_custkey"))
          .union(audit("orders", t(s, dir, "orders"), col("o_custkey")))
          .union(t(s, dir, "lineitem").agg(count(lit(1)).as("n_before"))
            .crossJoin(liHit.agg(count(lit(1)).as("n_deleted")))
            .select(lit("lineitem").as("table_name"), col("n_before"),
              col("n_deleted"),
              (col("n_before") - col("n_deleted")).as("n_after")))
          .union(audit("events", t(s, dir, "events"), col("user_id")))
          .orderBy("table_name")
      },
      Some("""WITH del AS (SELECT c_custkey AS k FROM customer
            WHERE ('0x' || substr(md5(CAST(c_custkey AS VARCHAR)), 1, 7))
              ::BIGINT % 97 = 0),
          delo AS (SELECT o_orderkey FROM orders
            WHERE o_custkey IN (SELECT k FROM del))
        SELECT 'customer' AS table_name, (SELECT COUNT(*) FROM customer)
            AS n_before,
          (SELECT COUNT(*) FROM customer WHERE c_custkey IN
            (SELECT k FROM del)) AS n_deleted,
          (SELECT COUNT(*) FROM customer) - (SELECT COUNT(*) FROM customer
            WHERE c_custkey IN (SELECT k FROM del)) AS n_after
        UNION ALL
        SELECT 'orders', (SELECT COUNT(*) FROM orders),
          (SELECT COUNT(*) FROM orders WHERE o_custkey IN
            (SELECT k FROM del)),
          (SELECT COUNT(*) FROM orders) - (SELECT COUNT(*) FROM orders
            WHERE o_custkey IN (SELECT k FROM del))
        UNION ALL
        SELECT 'lineitem', (SELECT COUNT(*) FROM lineitem),
          (SELECT COUNT(*) FROM lineitem WHERE l_orderkey IN
            (SELECT o_orderkey FROM delo)),
          (SELECT COUNT(*) FROM lineitem) - (SELECT COUNT(*) FROM lineitem
            WHERE l_orderkey IN (SELECT o_orderkey FROM delo))
        UNION ALL
        SELECT 'events', (SELECT COUNT(*) FROM events),
          (SELECT COUNT(*) FROM events WHERE user_id IN
            (SELECT k FROM del)),
          (SELECT COUNT(*) FROM events) - (SELECT COUNT(*) FROM events
            WHERE user_id IN (SELECT k FROM del))
        ORDER BY table_name""")),

    // ── HyperLogLog distinct (md5 family ⇒ oracle-replayable) ──────────
    // Per-type distinct ACTIVE (user, day) pairs — the DAU-cardinality
    // sketch — next to the exact NDV. 64 registers per group survive
    // the partial agg, every float summand is a power of two (exact,
    // order-independent sum), raw Flajolet estimate with no bias
    // correction so both engines agree bit-for-bit. Raw HLL is the
    // large-range regime (honest above ~2.5·m distinct; ~1600 here);
    // tiny cardinalities belong to the KMV sketch, which is exact below
    // its k.
    QueryDef("q146_hll_distinct",
      (s, dir) => {
        val pairs = t(s, dir, "events").select(col("event_type"),
          concat(col("user_id").cast("string"), lit("|"),
            expr("unix_micros(ts) div 86400000000").cast("string"))
            .as("pair"))
        val est = graft.ext.Sketches.hllDistinct(
          pairs, Seq("event_type"), col("pair"))
        val exact = pairs.groupBy("event_type")
          .agg(countDistinct(col("pair")).as("n_exact"))
        exact.join(est, "event_type").orderBy("event_type")
      },
      Some("""WITH p AS (SELECT event_type,
            CAST(user_id AS VARCHAR) || '|' ||
              CAST(epoch_us(ts) // 86400000000 AS VARCHAR) AS pair
          FROM events),
        h AS (SELECT event_type,
            ('0x' || substr(md5(pair), 1, 12))::BIGINT AS h FROM p),
        r AS (SELECT event_type, h // 4398046511104 AS bucket,
            h % 4398046511104 AS rest FROM h),
        reg AS (SELECT event_type, bucket,
            MAX(CASE WHEN rest = 0 THEN 43
                ELSE 43 - len(bin(rest)) END) AS m
          FROM r GROUP BY 1, 2),
        est AS (SELECT event_type,
            (64 - COUNT(*)) * 1.0 + SUM(pow(2.0, -m)) AS denom
          FROM reg GROUP BY event_type),
        ex AS (SELECT event_type, COUNT(DISTINCT pair) AS n_exact
          FROM p GROUP BY event_type)
        SELECT event_type, n_exact, 0.709 * 64.0 * 64.0 / denom AS hll_est
        FROM ex JOIN est USING (event_type) ORDER BY event_type""")),

    // ── Incremental JOIN-view maintenance (delta rules) ────────────────
    // V = orders ⋈ lineitem kept up to date across three insert batches
    // (both sides split by independent hash gates, so batches pair
    // orders with lineitems that arrived EARLIER and LATER — all three
    // delta terms fire). The final view must equal the plain join over
    // the full inputs, row for row — the q97-style "incremental ≡ full
    // recompute" contract, now for joins.
    QueryDef("q147_incremental_join",
      (s, dir) => {
        import graft.etl.IncrementalJoin
        val ord = t(s, dir, "orders")
          .select("o_orderkey", "o_custkey", "o_orderpriority")
        val li = t(s, dir, "lineitem")
          .select("l_orderkey", "l_linenumber", "l_quantity")
        def gateO(i: Int) = ord.filter(
          Shingles.baseHash(col("o_orderkey").cast("string")) % 3 === i)
        def gateL(i: Int) = li.filter(
          Shingles.baseHash(concat(col("l_orderkey").cast("string"),
            lit("#"), col("l_linenumber").cast("string"))) % 3 === i)
        val st = (0 until 3).foldLeft(
          IncrementalJoin.init(ord, li, "o_orderkey", "l_orderkey")) {
          (acc, i) => IncrementalJoin.step(acc, gateO(i), gateL(i),
            "o_orderkey", "l_orderkey")
        }
        st.view
          .select(col("o_orderkey"), col("l_linenumber"), col("o_custkey"),
            col("o_orderpriority"), col("l_quantity"))
          .orderBy("o_orderkey", "l_linenumber")
      },
      Some("""SELECT o_orderkey, l_linenumber, o_custkey, o_orderpriority,
          l_quantity
        FROM orders JOIN lineitem ON o_orderkey = l_orderkey
        ORDER BY o_orderkey, l_linenumber""")),

    // ── Time-weighted average (TWAP) per user ──────────────────────────
    // Each observation holds until the next one, so its weight is the
    // inter-event gap in µs — one lead() window, no self-join. The
    // per-row value·Δt product is a single deterministic IEEE multiply;
    // the cross-row sum rides the decimal Parity discipline, so the
    // result is partition-order-independent. Same-timestamp ties get
    // Δt = 0 and cannot contribute, so the tie-break order is moot.
    QueryDef("q148_twap",
      (s, dir) => {
        val w = Window.partitionBy("user_id")
          .orderBy(col("us"), col("event_id"))
        t(s, dir, "events")
          .select(col("user_id"), col("event_id"),
            unix_micros(col("ts")).as("us"), col("value"))
          .withColumn("dt", lead(col("us"), 1).over(w) - col("us"))
          .filter(col("dt").isNotNull)
          .groupBy("user_id")
          .agg(count(lit(1)).as("n_segments"),
            sum(col("dt")).as("total_us"),
            // per-row FLOOR quantization (1e-2 of a value·µs unit)
            // instead of a decimal cast: the cast's half-up/half-even
            // tie rounding differs across engines, floor of an
            // identical double cannot. The scale keeps v·Δt·100 around
            // 1e15 — far from the long overflow a 1e6 scale would risk
            // on month-long gaps.
            ((sum(floor(col("value") * col("dt") * lit(100.0))
              .cast(org.apache.spark.sql.types.DecimalType(30, 0)))
              .cast("double") / lit(100.0)) /
              sum(col("dt")).cast("double")).as("twap"))
          .orderBy("user_id")
      },
      Some("""WITH e AS (SELECT user_id, event_id, epoch_us(ts) AS us,
            value FROM events),
          seg AS (SELECT user_id, value,
            lead(us) OVER (PARTITION BY user_id
              ORDER BY us, event_id) - us AS dt FROM e)
        SELECT user_id, COUNT(*) AS n_segments,
          CAST(SUM(dt) AS BIGINT) AS total_us,
          (CAST(CAST(SUM(CAST(floor(value * dt * 100.0)
              AS DECIMAL(30,0))) AS VARCHAR) AS DOUBLE) / 100.0)
            / CAST(SUM(dt) AS DOUBLE) AS twap
        FROM seg WHERE dt IS NOT NULL
        GROUP BY user_id ORDER BY user_id""")),

    // ── Strict 3-step ordered funnel: view → click → purchase ──────────
    // Each step's clock starts at the PREVIOUS step's completion (q80
    // only tracks two steps): t₂ is the first click at-or-after the
    // first view, t₃ the first purchase at-or-after t₂. Two sequential
    // min-aggregation joins on user_id — no per-step window over
    // history, no triple self-join.
    QueryDef("q149_funnel3",
      (s, dir) => {
        val ev = t(s, dir, "events")
        def typed(tp: String, as: String) =
          ev.filter(col("event_type") === tp)
            .select(col("user_id"), unix_micros(col("ts")).as(as))
        val t1 = typed("view", "us1").groupBy("user_id")
          .agg(min(col("us1")).as("t1"))
        val t2 = t1.join(typed("click", "us2"), Seq("user_id"), "left")
          .groupBy("user_id")
          .agg(min(col("t1")).as("t1"),
            min(when(col("us2") >= col("t1"), col("us2"))).as("t2"))
        val t3 = t2.join(typed("purchase", "us3"), Seq("user_id"), "left")
          .groupBy("user_id")
          .agg(min(col("t1")).as("t1"), min(col("t2")).as("t2"),
            min(when(col("us3") >= col("t2"), col("us3"))).as("t3"))
        t3.select(col("user_id"), col("t1"), col("t2"), col("t3"),
          (lit(1) + col("t2").isNotNull.cast("int") +
            col("t3").isNotNull.cast("int")).as("reached"))
          .orderBy("user_id")
      },
      Some("""WITH t1 AS (SELECT user_id, MIN(epoch_us(ts)) AS t1
            FROM events WHERE event_type = 'view' GROUP BY user_id),
          c AS (SELECT user_id, epoch_us(ts) AS us2 FROM events
            WHERE event_type = 'click'),
          t2 AS (SELECT t1.user_id, MIN(t1.t1) AS t1,
              MIN(CASE WHEN c.us2 >= t1.t1 THEN c.us2 END) AS t2
            FROM t1 LEFT JOIN c ON t1.user_id = c.user_id
            GROUP BY t1.user_id),
          p AS (SELECT user_id, epoch_us(ts) AS us3 FROM events
            WHERE event_type = 'purchase'),
          t3 AS (SELECT t2.user_id, MIN(t2.t1) AS t1, MIN(t2.t2) AS t2,
              MIN(CASE WHEN p.us3 >= t2.t2 THEN p.us3 END) AS t3
            FROM t2 LEFT JOIN p ON t2.user_id = p.user_id
            GROUP BY t2.user_id)
        SELECT user_id, t1, t2, t3,
          1 + CAST(t2 IS NOT NULL AS INT) + CAST(t3 IS NOT NULL AS INT)
            AS reached
        FROM t3 ORDER BY user_id""")),

    // ── Visual near-dup pairs via perceptual aHash (q150) ──────────────
    // The multimodal × dedup crossover: the REAL pipeline on the Spark
    // side (PPM decode → codec resampler to 8×8 → integer-luminance
    // threshold hash → banded candidate join → exact Hamming verify),
    // while the oracle replays the whole arithmetic straight from the
    // text bytes the q61 images are cycled from — decode, downsample
    // and hash all collapse to closed-form byte indexing.
    QueryDef("q150_image_ahash_pairs",
      (s, dir) => {
        val media = Multimodal.asPpmMediaTable(tPar(s, dir, "documents"),
          "doc_id", "text", 16, 16)
        Multimodal.aHashPairs(media, ahashMaxHamming)
          .orderBy("id_a", "id_b")
      },
      Some {
        // luminance of 8×8 cell i: NN-downsample picks source pixel
        // (2·(i div 8), 2·(i mod 8)) of the 16×16 image, whose RGB bytes
        // sit at base = 3·(32·(i div 8) + 2·(i mod 8)) in the cycled
        // plane; byte j of the plane is text byte (j mod len).
        def byteAt(j: String) =
          s"""CASE WHEN strlen(text) = 0 THEN 0 ELSE
             ascii(substr(text, CAST(($j) % strlen(text) AS INT) + 1, 1))
             END"""
        val base = "(3 * (32 * (i // 8) + 2 * (i % 8)))"
        val lum = s"(${byteAt(base)} + ${byteAt(s"$base + 1")} + " +
          s"${byteAt(s"$base + 2")})"
        val bandCond = (0 until 4).map(b =>
          s"substr(a.ah, ${b * 16 + 1}, 16) = substr(b.ah, ${b * 16 + 1}, 16)")
          .mkString(" OR ")
        s"""WITH lums AS (SELECT doc_id,
            list_transform(range(0, 64), i -> $lum) AS lums
          FROM documents),
        h AS (SELECT doc_id, array_to_string(
            list_transform(range(0, 64), i ->
              CASE WHEN lums[CAST(i AS INT) + 1] * 64 > list_sum(lums)
                THEN '1' ELSE '0' END), '') AS ah
          FROM lums),
        cand AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b,
            a.ah AS ha, b.ah AS hb
          FROM h a JOIN h b ON a.doc_id < b.doc_id AND ($bandCond))
        SELECT id_a, id_b,
          CAST(len(list_filter(range(1, 65), i ->
            substr(ha, CAST(i AS INT), 1) != substr(hb, CAST(i AS INT), 1)))
            AS BIGINT) AS hamming
        FROM cand WHERE len(list_filter(range(1, 65), i ->
            substr(ha, CAST(i AS INT), 1) != substr(hb, CAST(i AS INT), 1)))
          <= $ahashMaxHamming
        ORDER BY id_a, id_b"""
      }),

    // ── Two-sample Kolmogorov–Smirnov drift monitor (q151) ─────────────
    // Distribution-level drift between the 'view' and 'click' value
    // populations. Integer-exact: the sup gap is max |F_a·n2 − F_b·n1|
    // over the distinct-value histogram (one shrinking groupBy), and
    // the CDF prefix sums run through Hypothesis.prefixSumByRange — a
    // range-partitioned two-pass cumulative sum, NOT a single-partition
    // global window, so the histogram never funnels through one task.
    QueryDef("q151_ks_drift",
      (s, dir) => {
        import graft.ext.Hypothesis
        val ev = t(s, dir, "events")
        Hypothesis.ksTwoSample(ev, col("value"),
          col("event_type") === "view", col("event_type") === "click")
      },
      Some("""WITH c AS (SELECT value AS v,
            SUM(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS ca,
            SUM(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS cb
          FROM events WHERE event_type IN ('view', 'click')
          GROUP BY value),
        cum AS (SELECT SUM(ca) OVER (ORDER BY v) AS fa,
            SUM(cb) OVER (ORDER BY v) AS fb FROM c),
        t AS (SELECT
            SUM(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS n1,
            SUM(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS n2
          FROM events)
        SELECT CAST(n1 AS BIGINT) AS n1, CAST(n2 AS BIGINT) AS n2,
          CAST(MAX(ABS(fa * n2 - fb * n1)) AS BIGINT) AS d_num,
          CAST((MAX(ABS(fa * n2 - fb * n1)) * 100000000) // (n1 * n2)
            AS DOUBLE) / 100000000.0 AS ks
        FROM cum, t GROUP BY n1, n2""")),

    // ── Mann–Whitney U / AUC between two event populations (q152) ──────
    // Rank-sum with textbook midrank ties, carried as DOUBLED integer
    // rank sums so half-integer midranks never touch a float. The AUC
    // form U/(n1·n2) is the probability a random 'view' value outranks
    // a random 'click' value — the drift monitor's effect size.
    QueryDef("q152_mann_whitney",
      (s, dir) => {
        import graft.ext.Hypothesis
        val ev = t(s, dir, "events")
        Hypothesis.mannWhitneyU(ev, col("value"),
          col("event_type") === "view", col("event_type") === "click")
      },
      Some("""WITH c AS (SELECT value AS v,
            SUM(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS ca,
            SUM(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS cb
          FROM events WHERE event_type IN ('view', 'click')
          GROUP BY value),
        cum AS (SELECT ca, cb, ca + cb AS c,
            SUM(ca + cb) OVER (ORDER BY v) - (ca + cb) AS bef FROM c),
        t AS (SELECT
            SUM(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS n1,
            SUM(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS n2
          FROM events)
        SELECT CAST(n1 AS BIGINT) AS n1, CAST(n2 AS BIGINT) AS n2,
          CAST(SUM(ca * (2 * bef + c + 1)) - n1 * (n1 + 1) AS BIGINT)
            AS u2,
          CAST((SUM(ca * (2 * bef + c + 1)) - n1 * (n1 + 1)) * 50000000
            // (n1 * n2) AS DOUBLE) / 100000000.0 AS auc
        FROM cum, t GROUP BY n1, n2""")),

    // ── Chi-square independence: event_type × day-of-week (q153) ───────
    // Is event mix independent of weekday? Contingency counts are the
    // only full-data shuffle; margins broadcast back. Each (o−e)²/e
    // term is three correctly-rounded IEEE ops on exact inputs, so the
    // per-cell floor(·1e6) quantization is engine-identical. Spark's
    // dayofweek is 1=Sunday; DuckDB's is 0=Sunday, hence the +1.
    QueryDef("q153_chi2_independence",
      (s, dir) => {
        import graft.ext.Hypothesis
        Hypothesis.chiSquare(t(s, dir, "events"),
          col("event_type"), dayofweek(col("ts")))
      },
      Some("""WITH cells AS (SELECT event_type AS a,
            dayofweek(ts) + 1 AS b, COUNT(*) AS o
          FROM events GROUP BY 1, 2),
        r AS (SELECT a, SUM(o) AS r FROM cells GROUP BY a),
        c AS (SELECT b, SUM(o) AS c FROM cells GROUP BY b),
        n AS (SELECT SUM(o) AS n FROM cells),
        terms AS (SELECT cells.a, cells.b, cells.o, n.n,
            CAST(r.r AS DOUBLE) * CAST(c.c AS DOUBLE)
              / CAST(n.n AS DOUBLE) AS e
          FROM cells JOIN r USING (a) JOIN c USING (b) CROSS JOIN n)
        SELECT CAST(COUNT(*) AS BIGINT) AS n_cells,
          CAST((COUNT(DISTINCT a) - 1) * (COUNT(DISTINCT b) - 1)
            AS BIGINT) AS dof,
          CAST(MAX(n) AS BIGINT) AS n,
          CAST(SUM(CAST(floor((CAST(o AS DOUBLE) - e)
              * (CAST(o AS DOUBLE) - e) / e * 1000000.0) AS BIGINT))
            AS DOUBLE) / 1000000.0 AS chi2
        FROM terms""")),

    // ── CUSUM change-point per user (q154) ─────────────────────────────
    // Where did a user's value level shift? Classic mean-centered
    // cumulative sum, made integer-exact by clearing denominators:
    // with per-row quantized xq = ⌊value·1e6⌋, prefix sums P_i and
    // total S, the centered cusum at row i is (P_i − i·S/n); n·|…| =
    // |n·P_i − i·S| needs no division at all. Two windows per user —
    // the running prefix and the per-user constants — then an argmax
    // with first-row tie-break via a max-join.
    QueryDef("q154_cusum_changepoint",
      (s, dir) => {
        val w = Window.partitionBy("user_id").orderBy("us", "event_id")
        val wAll = Window.partitionBy("user_id")
        val scored = t(s, dir, "events")
          .select(col("user_id"), col("event_id"),
            unix_micros(col("ts")).as("us"),
            floor(col("value") * lit(1.0e6)).cast("long").as("xq"))
          .withColumn("i", row_number().over(w).cast("long"))
          .withColumn("p", sum("xq").over(w))
          .withColumn("n", count(lit(1)).over(wAll).cast("long"))
          .withColumn("stot", sum("xq").over(wAll))
          .withColumn("stat", abs(col("n") * col("p") - col("i") * col("stot")))
        val m = scored.groupBy(col("user_id").as("m_user"))
          .agg(max("stat").as("mstat"))
        scored.join(m, col("user_id") === col("m_user") &&
            col("stat") === col("mstat"))
          .groupBy("user_id")
          .agg(max("n").as("n"), min("i").as("shift_i"),
            max("stat").as("cusum_num"),
            (max("stat").cast("double") /
              (max("n") * lit(1.0e6))).as("cusum"))
          .orderBy("user_id")
      },
      Some("""WITH e AS (SELECT user_id, event_id, epoch_us(ts) AS us,
            CAST(floor(value * 1000000.0) AS BIGINT) AS xq FROM events),
        s AS (SELECT user_id,
            ROW_NUMBER() OVER (PARTITION BY user_id
              ORDER BY us, event_id) AS i,
            SUM(xq) OVER (PARTITION BY user_id
              ORDER BY us, event_id) AS p,
            COUNT(*) OVER (PARTITION BY user_id) AS n,
            SUM(xq) OVER (PARTITION BY user_id) AS stot FROM e),
        st AS (SELECT user_id, n, i,
            ABS(n * p - i * stot) AS stat FROM s),
        m AS (SELECT user_id, MAX(stat) AS mstat FROM st GROUP BY user_id)
        SELECT st.user_id, CAST(MAX(st.n) AS BIGINT) AS n,
          CAST(MIN(st.i) AS BIGINT) AS shift_i,
          CAST(MAX(st.stat) AS BIGINT) AS cusum_num,
          CAST(MAX(st.stat) AS DOUBLE)
            / (MAX(st.n) * 1000000.0) AS cusum
        FROM st JOIN m ON st.user_id = m.user_id AND st.stat = m.mstat
        GROUP BY st.user_id ORDER BY st.user_id""")),

    // ── EWMA final smoothed value per user, α = ½ (q155) ───────────────
    // The recursive s_i = (x_i + s_{i−1})/2 unrolls to a closed-form
    // weighted sum with weights 2^(rn−n−1) (doubled for the seed row),
    // so one window pass replaces per-row recursion. α = ½ keeps every
    // weight an exact power of two — x·2^k is a pure exponent shift —
    // and the per-row floor(·1e8) makes the cross-row sum
    // order-independent. Weights below the grid floor to 0/−1
    // identically on both engines.
    QueryDef("q155_ewma_smooth",
      (s, dir) => {
        val w = Window.partitionBy("user_id").orderBy("us", "event_id")
        val wAll = Window.partitionBy("user_id")
        t(s, dir, "events")
          .select(col("user_id"), col("event_id"),
            unix_micros(col("ts")).as("us"), col("value"))
          .withColumn("rn", row_number().over(w).cast("long"))
          .withColumn("n", count(lit(1)).over(wAll).cast("long"))
          .withColumn("wq", floor(col("value") *
            pow(lit(2.0), col("rn") - col("n") - lit(1) +
              when(col("rn") === 1, 1).otherwise(0)) *
            lit(1.0e8)).cast("long"))
          .groupBy("user_id")
          .agg(max("n").as("n"),
            (sum("wq").cast("double") / lit(1.0e8)).as("ewma"))
          .orderBy("user_id")
      },
      Some("""WITH e AS (SELECT user_id, event_id, epoch_us(ts) AS us,
            value FROM events),
        r AS (SELECT user_id, value,
            ROW_NUMBER() OVER (PARTITION BY user_id
              ORDER BY us, event_id) AS rn,
            COUNT(*) OVER (PARTITION BY user_id) AS n FROM e)
        SELECT user_id, CAST(MAX(n) AS BIGINT) AS n,
          CAST(SUM(CAST(floor(value * pow(2.0, rn - n - 1 +
              CASE WHEN rn = 1 THEN 1 ELSE 0 END) * 100000000.0)
            AS BIGINT)) AS DOUBLE) / 100000000.0 AS ewma
        FROM r GROUP BY user_id ORDER BY user_id""")),

    // ── Weighted median price per brand (q156) ─────────────────────────
    // p_size-weighted median of p_retailprice: cumulative weights down
    // the per-brand price order, first row where 2·cum ≥ total. All
    // comparisons integer; the tie order is pinned by p_partkey but
    // cannot change the selected PRICE (equal prices cross together).
    QueryDef("q156_weighted_median",
      (s, dir) => {
        val w = Window.partitionBy("p_brand")
          .orderBy("p_retailprice", "p_partkey")
        val wAll = Window.partitionBy("p_brand")
        t(s, dir, "part")
          .select(col("p_brand"), col("p_partkey"), col("p_retailprice"),
            col("p_size").cast("long").as("wt"))
          .withColumn("cw", sum("wt").over(w))
          .withColumn("tw", sum("wt").over(wAll))
          .filter(col("cw") * 2 >= col("tw"))
          .groupBy("p_brand")
          .agg(max("tw").as("total_weight"),
            min("p_retailprice").as("wmedian"))
          .orderBy("p_brand")
      },
      Some("""WITH r AS (SELECT p_brand, p_retailprice,
            SUM(CAST(p_size AS BIGINT)) OVER (PARTITION BY p_brand
              ORDER BY p_retailprice, p_partkey) AS cw,
            SUM(CAST(p_size AS BIGINT)) OVER (PARTITION BY p_brand) AS tw
          FROM part)
        SELECT p_brand, CAST(MAX(tw) AS BIGINT) AS total_weight,
          MIN(p_retailprice) AS wmedian
        FROM r WHERE cw * 2 >= tw
        GROUP BY p_brand ORDER BY p_brand""")),

    // ── Pareto frontier per brand: cheap AND large (q157) ──────────────
    // The 2-D skyline (minimize price, maximize size) needs no
    // quadratic dominance join: ordered by (price asc, size desc), a
    // point survives iff its size strictly beats the running max over
    // everything ordered before it — one window per brand after a
    // dedup groupBy. The oracle states the dominance contract directly
    // as the quadratic NOT EXISTS, proving the sweep ≡ the definition.
    QueryDef("q157_pareto_frontier",
      (s, dir) => {
        val pts = t(s, dir, "part")
          .groupBy("p_brand", "p_retailprice", "p_size")
          .agg(count(lit(1)).as("n_parts"))
        val w = Window.partitionBy("p_brand")
          .orderBy(col("p_retailprice").asc, col("p_size").desc)
          .rowsBetween(Window.unboundedPreceding, -1)
        pts.withColumn("runmax", max("p_size").over(w))
          .filter(col("runmax").isNull || col("p_size") > col("runmax"))
          .select("p_brand", "p_retailprice", "p_size", "n_parts")
          .orderBy("p_brand", "p_retailprice")
      },
      Some("""WITH pts AS (SELECT p_brand, p_retailprice, p_size,
            COUNT(*) AS n_parts
          FROM part GROUP BY 1, 2, 3)
        SELECT p_brand, p_retailprice, p_size, n_parts FROM pts a
        WHERE NOT EXISTS (SELECT 1 FROM pts b
          WHERE b.p_brand = a.p_brand
            AND b.p_retailprice <= a.p_retailprice
            AND b.p_size >= a.p_size
            AND (b.p_retailprice < a.p_retailprice
              OR b.p_size > a.p_size))
        ORDER BY p_brand, p_retailprice""")),

    // ── Embedding covariance matrix, exact-integer (q158) ──────────────
    // The PCA front half as a first-class query: all d(d+1)/2 upper-
    // triangle covariance entries in ONE map-only pair expansion (the
    // Gram shape — n·d²/2 structs from a nested transform, NO self-
    // join) plus one groupBy whose key space IS the d² output, so
    // map-side combine bounds the shuffle at d(d+1)/2 rows per task at
    // any corpus size. Per-element ⌊x·1e4⌋ quantization keeps the sums
    // integer ⇒ partition-order independent ⇒ oracle-exact.
    QueryDef("q158_embedding_covariance",
      (s, dir) => graft.ext.Pca.covariancePairs(
        tPar(s, dir, "embeddings"), col("embedding"), annDims)
        .orderBy("pos_a", "pos_b"),
      Some(s"""WITH x AS (SELECT vec_id, CAST(i AS INT) AS pos,
            CAST(floor(CAST(embedding[CAST(i AS INT) + 1] AS DOUBLE)
              * 10000.0) AS BIGINT) AS xq
          FROM embeddings, range(0, $annDims) t(i)),
        p AS (SELECT a.pos AS pos_a, b.pos AS pos_b,
            a.xq AS xa, b.xq AS xb
          FROM x a JOIN x b ON a.vec_id = b.vec_id AND a.pos <= b.pos)
        SELECT pos_a, pos_b, CAST(COUNT(*) AS BIGINT) AS n,
          CAST(COUNT(*) * SUM(xa * xb) - SUM(xa) * SUM(xb) AS BIGINT)
            AS cov_num,
          CAST(COUNT(*) * SUM(xa * xb) - SUM(xa) * SUM(xb) AS DOUBLE)
            / (CAST(COUNT(*) * COUNT(*) AS DOUBLE) * 100000000.0) AS cov
        FROM p GROUP BY pos_a, pos_b ORDER BY pos_a, pos_b""")),

    // ── Johnson–Lindenstrauss sign projection 64 → 8 dims (q159) ───────
    // Dimensionality reduction with a DATA-FREE projection matrix:
    // entries are ±1 by md5 parity of "j|i" — the same portable hash
    // family as MinHash — so the oracle rebuilds the matrix without
    // shipping it. Map-only per row: one zip_with against an array
    // literal and a sequential aggregate fold per output dim (fixed
    // fold order ⇒ both engines add in the same sequence ⇒ bit-equal
    // before the final ⌊·1e6⌋ grid).
    QueryDef("q159_random_projection",
      (s, dir) => {
        def signOf(j: Int, i: Int): Int = {
          val d = java.security.MessageDigest.getInstance("MD5")
            .digest(s"$j|$i".getBytes("UTF-8"))
          val hex = d.take(4).map(b => f"$b%02x").mkString.take(7)
          if (java.lang.Long.parseLong(hex, 16) % 2 == 0) 1 else -1
        }
        val cols = (0 until jlOutDims).map { j =>
          val arr = (0 until annDims).map(signOf(j, _)).mkString(",")
          (floor(expr(s"""aggregate(zip_with(embedding, array($arr),
            (x, sg) -> CAST(x AS DOUBLE) * sg),
            CAST(0.0 AS DOUBLE), (a, v) -> a + v)""") * lit(1.0e6)) /
            lit(1.0e6)).as(s"y$j")
        }
        t(s, dir, "embeddings")
          .select(col("vec_id") +: cols: _*).orderBy("vec_id")
      },
      Some {
        def sign(j: Int) =
          s"""CASE WHEN ('0x' || substr(md5($j || '|' ||
             CAST(i AS VARCHAR)), 1, 7))::BIGINT % 2 = 0
             THEN 1 ELSE -1 END"""
        val ys = (0 until jlOutDims).map(j =>
          s"""floor(list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
             list_transform(range(0, $annDims), i ->
               CAST(embedding[CAST(i AS INT) + 1] AS DOUBLE)
                 * ${sign(j)})),
             (a, v) -> a + v) * 1000000.0) / 1000000.0 AS y$j""")
          .mkString(",\n          ")
        s"""SELECT vec_id,
          $ys
        FROM embeddings ORDER BY vec_id"""
      }),

    // ── Audio sequency spectrum: Walsh–Hadamard centroid (q160) ────────
    // Real spectral analysis on the decoded WAV path, kept EXACT by
    // using the Walsh–Hadamard transform (±1 integer arithmetic) in
    // place of a DFT whose cos/sin have no cross-engine rounding
    // guarantee. One map stage over payloads, O(n²) per 64-sample
    // frame; the oracle replays decode + WHT + centroid closed-form
    // from the text bytes the WAV fixtures cycle.
    QueryDef("q160_walsh_spectrum",
      (s, dir) => {
        val media = Multimodal.asWavMediaTable(tPar(s, dir, "documents"),
          "doc_id", "text", 256, 16000)
        Multimodal.audioWalshSpectrum(media, 64, 64)
          .orderBy("media_id", "frame_no")
      },
      Some {
        val samp = "CASE WHEN strlen(text) = 0 THEN 0 ELSE " +
          "CAST((ascii(substr(text, CAST((frame_no * 64 + i) % strlen(text)" +
          " AS INT) + 1, 1)) - 128) * 256 AS BIGINT) END"
        s"""WITH f AS (SELECT doc_id, text,
            unnest(range(0, 4)) AS frame_no FROM documents),
        w AS (SELECT doc_id, frame_no,
            list_transform(range(1, 64), k ->
              list_sum(list_transform(range(0, 64), i ->
                CASE WHEN bit_count(CAST(k AS INT) & CAST(i AS INT)) % 2 = 0
                  THEN $samp ELSE -($samp) END))) AS wk
          FROM f),
        c AS (SELECT doc_id, frame_no,
            CAST(list_sum(list_transform(range(1, 64), k ->
              CAST(k AS BIGINT) * abs(wk[CAST(k AS INT)]))) AS BIGINT)
              AS num,
            CAST(list_sum(list_transform(range(1, 64), k ->
              abs(wk[CAST(k AS INT)]))) AS BIGINT) AS den
          FROM w)
        SELECT doc_id AS media_id, CAST(frame_no AS INT) AS frame_no,
          CAST(64 AS INT) AS n_samples, num, den,
          CASE WHEN den = 0 THEN NULL
            ELSE CAST(num * 1000000 // den AS DOUBLE) / 1000000.0
          END AS centroid
        FROM c ORDER BY media_id, frame_no"""
      }),

    // ── BPE tokenizer training: the full merge loop (q161) ─────────────
    // q83 counts one round of pairs; this LEARNS the merge table —
    // `bpeSteps` rounds of count → argmax → greedy merge over the
    // word-frequency table (corpus tokenized once; each round costs
    // the vocabulary, not the corpus). The greedy merge is a
    // sequential string-accumulator fold with identical semantics in
    // Spark `aggregate` and DuckDB `list_reduce` (runs merge
    // leftmost-first: [a,a,a,a] → [aa,aa]; the space delimiter anchors
    // symbol boundaries), so the oracle replays all rounds exactly.
    QueryDef("q161_bpe_train",
      (s, dir) => graft.ext.TextStats.bpeTrain(
        tPar(s, dir, "documents"), col("text"), bpeSteps),
      Some {
        def fold(b: String) =
          s"""string_split(substr(list_reduce(list_prepend('', syms),
             (acc, x) -> CASE
               WHEN ends_with(acc, ' ' || $b.m_left) AND x = $b.m_right
               THEN substr(acc, 1,
                   strlen(acc) - strlen($b.m_left) - 1)
                 || ' ' || $b.m_left || $b.m_right
               ELSE acc || ' ' || x END), 2), ' ')"""
        def bestCte(k: Int) =
          s"""b$k AS (SELECT p.l AS m_left, p.r AS m_right,
             SUM(wc) AS pair_count
           FROM (SELECT wc, unnest(list_transform(range(1, len(syms)),
               i -> {'l': syms[CAST(i AS INT)],
                     'r': syms[CAST(i AS INT) + 1]})) AS p
             FROM v${k - 1}) q
           GROUP BY 1, 2
           ORDER BY pair_count DESC, m_left, m_right LIMIT 1)"""
        def vocabCte(k: Int) =
          s"""v$k AS (SELECT word, wc, ${fold(s"b$k")} AS syms
           FROM v${k - 1}, b$k)"""
        val ctes = (s"""v0 AS (SELECT word, COUNT(*) AS wc,
            list_transform(range(1, strlen(word) + 1),
              i -> substr(word, CAST(i AS INT), 1)) AS syms
          FROM (SELECT unnest($dTok) AS word FROM documents)
          GROUP BY word)""" +:
          (1 to bpeSteps).flatMap(k =>
            Seq(bestCte(k)) ++
              (if (k < bpeSteps) Seq(vocabCte(k)) else Nil)))
          .mkString(",\n        ")
        val out = (1 to bpeSteps).map(k =>
          s"""SELECT $k AS step, m_left, m_right,
             CAST(pair_count AS BIGINT) AS pair_count FROM b$k""")
          .mkString("\n        UNION ALL ")
        s"WITH $ctes\n        $out ORDER BY step"
      }),

    // ── k-core of the co-occurrence graph (q162) ───────────────────────
    // Fourth graph primitive (components q45, PageRank q108, BFS q110,
    // triangles q118): strip the hub-and-spoke fringe by kCoreRounds
    // synchronized peels of nodes with degree < k. Bounded-unroll like
    // q110 — the oracle replays exactly the same peel rounds as CTE
    // stages; every iteration is broadcast semi-joins on the
    // vocab²-bounded edge table, corpus touched once.
    QueryDef("q162_kcore",
      (s, dir) => graft.ext.Search.kCore(tPar(s, dir, "documents"),
        "doc_id", "text", trVocab, kCoreK, kCoreRounds),
      Some {
        // every CTE is MATERIALIZED: DuckDB inlines plain CTEs, and the
        // peel chain references each stage ~3×, so unmaterialized the
        // h5 tree would expand to 3^rounds scans of the parquet file
        // (observed as "Too many open files" before it got slow)
        def degCte(i: Int) =
          s"""d$i AS MATERIALIZED (SELECT t, COUNT(*) AS deg FROM
             (SELECT src AS t FROM h${i - 1}
              UNION ALL SELECT dst FROM h${i - 1}) GROUP BY 1)"""
        def peelCte(i: Int) =
          s"""h$i AS MATERIALIZED (SELECT h.src, h.dst FROM h${i - 1} h
             JOIN d$i a ON h.src = a.t JOIN d$i b ON h.dst = b.t
             WHERE a.deg >= $kCoreK AND b.deg >= $kCoreK)"""
        val peels = (1 to kCoreRounds)
          .flatMap(i => Seq(degCte(i), peelCte(i)))
          .mkString(",\n          ")
        s"""WITH dt AS MATERIALIZED (SELECT DISTINCT doc_id, tok AS token
            FROM (SELECT doc_id, unnest($dTok) AS tok FROM documents)),
          v AS MATERIALIZED (SELECT token FROM
            (SELECT token, COUNT(*) AS df FROM dt
            GROUP BY 1 ORDER BY df DESC, token LIMIT $trVocab)),
          vt AS MATERIALIZED (SELECT dt.doc_id, dt.token
            FROM dt JOIN v USING (token)),
          h0 AS MATERIALIZED (SELECT a.token AS src, b.token AS dst
            FROM vt a JOIN vt b
              ON a.doc_id = b.doc_id AND a.token < b.token
            GROUP BY 1, 2),
          $peels
        SELECT t AS token, CAST(COUNT(*) AS BIGINT) AS core_degree FROM
          (SELECT src AS t FROM h$kCoreRounds
           UNION ALL SELECT dst FROM h$kCoreRounds)
        GROUP BY 1 ORDER BY token"""
      }),

    // ── Video scene-change detection (q163) ────────────────────────────
    // Per adjacent decoded-frame pair, the exact sum of absolute luma
    // differences; a cut when the mean difference clears the rational
    // threshold via integer cross-multiplication. One row-expanding map
    // stage over the Y4M payloads; the oracle replays decode + diff
    // closed-form from the cycled text bytes.
    QueryDef("q163_scene_cuts",
      (s, dir) => {
        val media = Multimodal.asY4mMediaTable(tPar(s, dir, "documents"),
          "doc_id", "text", vidW, vidH, vidFrames)
        Multimodal.sceneCuts(media, sceneCutNum, sceneCutDen)
          .orderBy("media_id", "frame_idx")
      },
      Some {
        val plane = vidW * vidH
        def byteAt(j: String) =
          s"""ascii(substr(text, CAST(($j) % strlen(text) AS INT) + 1, 1))"""
        s"""WITH f AS (SELECT doc_id, text,
            unnest(range(1, $vidFrames)) AS fr FROM documents),
        d AS (SELECT doc_id, fr,
            CASE WHEN strlen(text) = 0 THEN 0 ELSE
              CAST(list_sum(list_transform(range(0, $plane), i ->
                abs(${byteAt(s"fr * $plane + i")} -
                    ${byteAt(s"(fr - 1) * $plane + i")})))
              AS BIGINT) END AS diff_sum
          FROM f)
        SELECT doc_id AS media_id, CAST(fr AS INT) AS frame_idx,
          diff_sum,
          diff_sum * $sceneCutDen > $sceneCutNum * $plane AS is_cut
        FROM d ORDER BY media_id, frame_idx"""
      }),

    // ── Fellegi–Sunter probabilistic record linkage (q164) ─────────────
    // The probabilistic layer the distance-based joins (q105 edit
    // distance, q106 Jaccard) lack: each candidate pair's agreement
    // PATTERN over (type, size, price-bucket) maps to a likelihood
    // ratio Π m/u (agree) · (1−m)/(1−u) (disagree). With 3 fields
    // there are only 8 patterns, so every score is PRECOMPUTED as one
    // exact-rational-to-double literal — zero per-row float arithmetic
    // on either engine. Candidates come brand-blocked (the q105
    // contract: block key = shuffle key, never all-pairs).
    QueryDef("q164_record_linkage",
      (s, dir) => fsAcceptedPairs(s, dir)
        .orderBy("id_a", "id_b"),
      Some(s"""WITH $dFsCtes
        SELECT id_a, id_b, pattern, score FROM scored
        WHERE score >= $fsMinScore ORDER BY id_a, id_b""")),

    // ── Linkage clusters: transitive closure of q164 matches (q166) ────
    // Detect → CLUSTER, the entity-resolution step after scoring: the
    // accepted match pairs feed the q45 label-propagation components
    // machinery, and each part gets its entity id (min member key) and
    // entity size. The oracle states the ground truth as recursive
    // reachability + min-label over the same scored pairs.
    QueryDef("q166_linkage_clusters",
      (s, dir) => {
        // clique-collapsed star edges, not the raw accepted pairs: the
        // transitive closure (and so every output row) is identical,
        // but the edge set is ~3·|part| instead of quadratic-in-block
        // (147.6M pairs at sf1.0) — see fsMatchStarEdges.
        val pairs = fsMatchStarEdges(s, dir)
        // threshold graphs inside a brand block can chain arbitrarily
        // deep — star contraction converges in O(log n) rounds where
        // min-label propagation pays one round per hop of diameter
        // (proven ≡ in DedupSpec)
        val labeled = Dedup.dedupClustersStar(pairs)
        labeled
          .withColumn("cluster_size",
            count(lit(1)).over(Window.partitionBy(col("cluster")))
              .cast("long"))
          .select(col("id").as("p_partkey"), col("cluster"),
            col("cluster_size"))
          .orderBy("p_partkey")
      },
      Some(s"""WITH RECURSIVE $dFsCtes,
        m AS (SELECT id_a, id_b FROM scored WHERE score >= $fsMinScore),
        edges AS (SELECT id_a AS u, id_b AS v FROM m
                  UNION SELECT id_b, id_a FROM m),
        nodes AS (SELECT DISTINCT u AS id FROM edges),
        reach(id, r) AS (
          SELECT id, id FROM nodes
          UNION
          SELECT rr.id, e.v FROM reach rr JOIN edges e ON rr.r = e.u),
        lab AS (SELECT id, MIN(r) AS cluster FROM reach GROUP BY id)
        SELECT id AS p_partkey, cluster,
          CAST(COUNT(*) OVER (PARTITION BY cluster) AS BIGINT)
            AS cluster_size
        FROM lab ORDER BY p_partkey""")),

    // ── Gini concentration of user activity per event type (q165) ──────
    // The inequality monitor for curation mixes: how concentrated is
    // each event type's volume across users? Classic rank formula
    // G = Σ(2i−n−1)x_i / (n·Σx) on the ascending per-user counts —
    // integer end to end (counts are integers, rank windows are exact,
    // one final floor-quantized division). Tie permutations cannot
    // change the sum: within a tie block x is constant and the rank
    // coefficients sum identically.
    QueryDef("q165_gini_activity",
      (s, dir) => {
        val x = t(s, dir, "events")
          .groupBy("event_type", "user_id")
          .agg(count(lit(1)).as("x"))
        val w = Window.partitionBy("event_type").orderBy("x", "user_id")
        val wAll = Window.partitionBy("event_type")
        x.withColumn("i", row_number().over(w).cast("long"))
          .withColumn("n", count(lit(1)).over(wAll).cast("long"))
          .withColumn("s", sum("x").over(wAll))
          .groupBy("event_type")
          .agg(max("n").as("n_users"), max("s").as("volume"),
            sum((lit(2) * col("i") - col("n") - lit(1)) * col("x"))
              .as("g_num"))
          .select(col("event_type"), col("n_users"), col("volume"),
            col("g_num"),
            (expr("g_num * 100000000L div (n_users * volume)")
              .cast("double") / lit(1.0e8)).as("gini"))
          .orderBy("event_type")
      },
      Some("""WITH x AS (SELECT event_type, user_id, COUNT(*) AS x
            FROM events GROUP BY 1, 2),
        r AS (SELECT event_type, x,
            ROW_NUMBER() OVER (PARTITION BY event_type
              ORDER BY x, user_id) AS i,
            COUNT(*) OVER (PARTITION BY event_type) AS n,
            SUM(x) OVER (PARTITION BY event_type) AS s FROM x)
        SELECT event_type, CAST(MAX(n) AS BIGINT) AS n_users,
          CAST(MAX(s) AS BIGINT) AS volume,
          CAST(SUM((2 * i - n - 1) * x) AS BIGINT) AS g_num,
          CAST(SUM((2 * i - n - 1) * x) * 100000000
            // (MAX(n) * MAX(s)) AS DOUBLE) / 100000000.0 AS gini
        FROM r GROUP BY event_type ORDER BY event_type""")),

    // ── Per-user modal event type (q167) ───────────────────────────────
    // The MODE aggregate with a pinned tie contract (max count, then
    // lexicographically smallest type) — engines disagree on native
    // mode() tie-breaks, so it's stated as a rank window over the
    // bounded (user, type) count table; the only full-data shuffle is
    // the count groupBy.
    QueryDef("q167_mode_event",
      (s, dir) => {
        val c = t(s, dir, "events")
          .groupBy("user_id", "event_type")
          .agg(count(lit(1)).as("cnt"))
        val w = Window.partitionBy("user_id")
          .orderBy(desc("cnt"), col("event_type"))
        c.withColumn("rn", row_number().over(w))
          .filter(col("rn") === 1)
          .select(col("user_id"), col("event_type").as("mode_type"),
            col("cnt").as("mode_count"))
          .orderBy("user_id")
      },
      Some("""WITH c AS (SELECT user_id, event_type, COUNT(*) AS cnt
            FROM events GROUP BY 1, 2),
        r AS (SELECT user_id, event_type, cnt,
            ROW_NUMBER() OVER (PARTITION BY user_id
              ORDER BY cnt DESC, event_type) AS rn FROM c)
        SELECT user_id, event_type AS mode_type, cnt AS mode_count
        FROM r WHERE rn = 1 ORDER BY user_id""")),

    // ── Autocorrelation function to lag 6 (q168) ───────────────────────
    // q129 generalized from lag 1 to the full short-range ACF: one
    // window pass computes all acfMaxLag lagged copies of the daily
    // series, an in-row stack unpivots them, and each (type, lag)
    // cell reduces to integer sufficient sums finished by one fixed
    // IEEE expression (sqrt is correctly rounded, so both engines
    // agree bit-for-bit). Lags are series-index lags over observed
    // days — the q129 contract.
    QueryDef("q168_acf",
      (s, dir) => {
        val daily = t(s, dir, "events")
          .groupBy(col("event_type"),
            expr("unix_micros(ts) div 86400000000").as("day"))
          .agg(count(lit(1)).as("c"))
        val w = Window.partitionBy("event_type").orderBy(col("day"))
        val lagged = (1 to acfMaxLag).foldLeft(daily) { (df, l) =>
          df.withColumn(s"p$l", lag(col("c"), l).over(w))
        }
        val stacked = lagged.select(col("event_type"), col("c"),
          explode(expr(s"""arrays_zip(
            array(${(1 to acfMaxLag).mkString(", ")}),
            array(${(1 to acfMaxLag).map(l => s"p$l").mkString(", ")}))"""))
            .as("z"))
          .select(col("event_type"), expr("z.`0`").cast("int").as("lag"),
            col("c"), expr("z.`1`").as("prev"))
          .filter(col("prev").isNotNull)
        val g = stacked.groupBy("event_type", "lag").agg(
          count(lit(1)).cast("double").as("n"),
          sum(col("prev")).cast("double").as("sx"),
          sum(col("c")).cast("double").as("sy"),
          sum(col("prev") * col("prev")).cast("double").as("sxx"),
          sum(col("prev") * col("c")).cast("double").as("sxy"),
          sum(col("c") * col("c")).cast("double").as("syy"))
        val den1 = col("n") * col("sxx") - col("sx") * col("sx")
        val den2 = col("n") * col("syy") - col("sy") * col("sy")
        g.select(col("event_type"), col("lag"),
            col("n").cast("long").as("n_pairs"),
            when(den1 > 0.0 && den2 > 0.0,
              (col("n") * col("sxy") - col("sx") * col("sy")) /
                sqrt(den1 * den2)).as("autocorr"))
          .orderBy("event_type", "lag")
      },
      Some {
        val lagCols = (1 to acfMaxLag).map(l =>
          s"lag(c, $l) OVER (PARTITION BY event_type ORDER BY day) AS p$l")
          .mkString(",\n            ")
        val stack = (1 to acfMaxLag).map(l =>
          s"SELECT event_type, $l AS lag, c, p$l AS prev FROM lagged")
          .mkString("\n          UNION ALL ")
        s"""WITH daily AS (SELECT event_type,
            epoch_us(ts) // 86400000000 AS day, COUNT(*) AS c
          FROM events GROUP BY 1, 2),
        lagged AS (SELECT event_type, day, c,
            $lagCols
          FROM daily),
        stacked AS ($stack),
        g AS (SELECT event_type, lag,
            CAST(COUNT(*) AS DOUBLE) AS n,
            CAST(SUM(prev) AS DOUBLE) AS sx,
            CAST(SUM(c) AS DOUBLE) AS sy,
            CAST(SUM(prev * prev) AS DOUBLE) AS sxx,
            CAST(SUM(prev * c) AS DOUBLE) AS sxy,
            CAST(SUM(c * c) AS DOUBLE) AS syy
          FROM stacked WHERE prev IS NOT NULL GROUP BY 1, 2)
        SELECT event_type, CAST(lag AS INT) AS lag,
          CAST(n AS BIGINT) AS n_pairs,
          CASE WHEN (n * sxx - sx * sx) > 0.0
              AND (n * syy - sy * sy) > 0.0
            THEN (n * sxy - sx * sy)
              / sqrt((n * sxx - sx * sx) * (n * syy - sy * sy)) END
            AS autocorr
        FROM g ORDER BY event_type, lag"""
      }),

    // ── BPE encode: apply the learned merges to the corpus (q169) ──────
    // The tokenizer's second half — q161 TRAINS the merge table, this
    // ENCODES with it: the training loop's final vocab table already
    // holds every distinct word's post-merge symbol sequence, so
    // encoding is one broadcast join against the exploded corpus and a
    // per-doc sum. The oracle replays the whole train+apply chain;
    // every CTE is MATERIALIZED (the vocab chain references each stage
    // ~3×, which DuckDB would otherwise inline exponentially).
    QueryDef("q169_bpe_encode",
      (s, dir) => graft.ext.TextStats.bpeEncode(
        tPar(s, dir, "documents"), "doc_id", col("text"), bpeSteps),
      Some(s"""WITH $dBpeVocabCtes,
        tok AS (SELECT doc_id, unnest($dTok) AS word FROM documents)
        SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_words,
          CAST(SUM(len(v$bpeSteps.syms)) AS BIGINT) AS n_subwords
        FROM tok JOIN v$bpeSteps USING (word)
        GROUP BY doc_id ORDER BY doc_id""")),

    // ── SCD type 3: previous-value shadow columns (q170) ───────────────
    // Completes the SCD family (type 1 = D5 upsert, type 2 = q15's
    // versioned merge): one full-outer join on the key; a changed
    // attribute's old value moves into its per-attribute shadow, new
    // keys insert with null shadows, keys absent from the snapshot
    // stay untouched. No versioning rows — the type-3 trade of exactly
    // one generation of history. Same orders-snapshot fixtures as q15.
    QueryDef("q170_scd3",
      (s, dir) => {
        def snap(cut: String) = t(s, dir, "orders")
          .filter(col("o_orderdate") < lit(cut))
          .groupBy(col("o_custkey").as("custkey"))
          .agg(count(lit(1)).as("n_orders"),
            max(col("o_totalprice")).as("max_price"))
        val d0 = snap("1998-01-01")
          .withColumn("prev_n_orders", lit(null).cast("long"))
          .withColumn("prev_max_price", lit(null).cast("double"))
        Scd2.scd3Merge(d0, snap("2000-01-01"), "custkey",
          Seq("n_orders", "max_price")).orderBy("custkey")
      },
      Some("""WITH s1 AS (
          SELECT o_custkey AS custkey, COUNT(*) AS n_orders,
            max(o_totalprice) AS max_price
          FROM orders WHERE o_orderdate < TIMESTAMP '1998-01-01'
          GROUP BY 1),
        s2 AS (
          SELECT o_custkey AS custkey, COUNT(*) AS n_orders,
            max(o_totalprice) AS max_price
          FROM orders WHERE o_orderdate < TIMESTAMP '2000-01-01'
          GROUP BY 1)
        SELECT COALESCE(s1.custkey, s2.custkey) AS custkey,
          CASE WHEN s2.custkey IS NULL THEN s1.n_orders
               ELSE s2.n_orders END AS n_orders,
          CASE WHEN s1.custkey IS NOT NULL AND s2.custkey IS NOT NULL
                AND s1.n_orders IS DISTINCT FROM s2.n_orders
            THEN s1.n_orders END AS prev_n_orders,
          CASE WHEN s2.custkey IS NULL THEN s1.max_price
               ELSE s2.max_price END AS max_price,
          CASE WHEN s1.custkey IS NOT NULL AND s2.custkey IS NOT NULL
                AND s1.max_price IS DISTINCT FROM s2.max_price
            THEN s1.max_price END AS prev_max_price
        FROM s1 FULL OUTER JOIN s2 ON s1.custkey = s2.custkey
        ORDER BY custkey""")),

    // ── Audio fingerprint dedup: energy-envelope sign bits (q171) ──────
    // The audio leg of the dedup suite (text q24/q106, images q150):
    // each clip reduces to the 15-bit sign sequence of its frame-energy
    // deltas (the Shazam-style envelope fingerprint, integer-exact on
    // the int64 energies), and clips collide on equal fingerprints.
    // One decode pass + two bounded groupBys; the oracle replays
    // energies closed-form from the cycled text bytes and folds the
    // same bits.
    QueryDef("q171_audio_fingerprint",
      (s, dir) => {
        val media = Multimodal.asWavMediaTable(tPar(s, dir, "documents"),
          "doc_id", "text", 256, 16000)
        val fp = Multimodal.audioFrames(media, frameLen = 16, hop = 16)
          .groupBy("media_id")
          .agg(sort_array(collect_list(struct(col("frame_no"),
            col("energy")))).as("arr"))
          .select(col("media_id"), expr(
            """array_join(zip_with(
               slice(arr, 1, size(arr) - 1), slice(arr, 2, size(arr) - 1),
               (a, b) -> CASE WHEN b.energy > a.energy
                 THEN '1' ELSE '0' END), '')""").as("fp"))
        fp.groupBy("fp")
          .agg(count(lit(1)).as("n_docs"), min("media_id").as("canonical"))
          .filter(col("n_docs") > 1)
          .orderBy("fp")
      },
      Some {
        val samp = "CAST((ascii(substr(text, CAST(i % strlen(text) AS INT)" +
          " + 1, 1)) - 128) * 256 AS BIGINT)"
        s"""WITH f AS (SELECT doc_id, text,
            unnest(range(0, 16)) AS fr FROM documents),
        e AS (SELECT doc_id, fr,
            CASE WHEN strlen(text) = 0 THEN CAST(0 AS BIGINT) ELSE
              CAST(list_sum(list_transform(
                range(fr * 16, fr * 16 + 16), i -> $samp * $samp))
              AS BIGINT) END AS energy
          FROM f),
        b AS (SELECT a.doc_id, a.fr,
            CASE WHEN a.energy > p.energy THEN '1' ELSE '0' END AS bit
          FROM e a JOIN e p ON a.doc_id = p.doc_id AND a.fr = p.fr + 1),
        fp AS (SELECT doc_id, string_agg(bit, '' ORDER BY fr) AS fp
          FROM b GROUP BY doc_id)
        SELECT fp, CAST(COUNT(*) AS BIGINT) AS n_docs,
          MIN(doc_id) AS canonical
        FROM fp GROUP BY fp HAVING COUNT(*) > 1 ORDER BY fp"""
      }),

    // ── Benford first-digit conformance test (q172) ────────────────────
    // The fraud/synthetic-data canary: per order status, chi-square of
    // the o_totalprice leading-digit distribution against Benford's
    // log10(1+1/d). First digits come from integer string indexing
    // (never a per-row log); the nine Benford probabilities are
    // PRECOMPUTED double literals shared with the oracle, so the only
    // float work is nine fixed IEEE (o−e)²/e terms per group, each
    // floor-quantized before the sum. One groupBy shuffle.
    QueryDef("q172_benford",
      (s, dir) => {
        val digits = 1 to 9
        val base = t(s, dir, "orders")
          .withColumn("d", substring(
            floor(col("o_totalprice")).cast("long").cast("string"), 1, 1)
            .cast("int"))
          .filter(col("d").between(1, 9))
        val counts = digits.map(d =>
          sum(when(col("d") === d, 1L).otherwise(0L)).as(s"o$d"))
        val aggCols = count(lit(1)).as("n") +: counts
        val agged = base.groupBy("o_orderstatus")
          .agg(aggCols.head, aggCols.tail: _*)
        val chi2 = digits.map { d =>
          val e = col("n").cast("double") * lit(benfordP(d))
          floor((col(s"o$d").cast("double") - e) *
            (col(s"o$d").cast("double") - e) / e * lit(1.0e6))
            .cast("long")
        }.reduce(_ + _)
        agged.select(col("o_orderstatus"), col("n"),
            (chi2.cast("double") / lit(1.0e6)).as("chi2"))
          .orderBy("o_orderstatus")
      },
      Some {
        val obs = (1 to 9).map(d =>
          s"SUM(CASE WHEN d = $d THEN 1 ELSE 0 END) AS o$d")
          .mkString(",\n            ")
        val terms = (1 to 9).map { d =>
          val e = s"(CAST(n AS DOUBLE) * CAST(${benfordP(d)} AS DOUBLE))"
          s"""CAST(floor((CAST(o$d AS DOUBLE) - $e)
             * (CAST(o$d AS DOUBLE) - $e) / $e * 1000000.0) AS BIGINT)"""
        }.mkString(" + ")
        s"""WITH b AS (SELECT o_orderstatus,
            CAST(substr(CAST(CAST(floor(o_totalprice) AS BIGINT)
              AS VARCHAR), 1, 1) AS INT) AS d
          FROM orders),
        g AS (SELECT o_orderstatus, COUNT(*) AS n,
            $obs
          FROM b WHERE d BETWEEN 1 AND 9 GROUP BY o_orderstatus)
        SELECT o_orderstatus, CAST(n AS BIGINT) AS n,
          CAST($terms AS DOUBLE) / 1000000.0 AS chi2
        FROM g ORDER BY o_orderstatus"""
      }),

    // ── Exact rolling 7-day distinct users per day (q173) ──────────────
    // The exact twin of q127's KMV sliding distinct: each (user, day)
    // observation contributes to the 7 windows ending on days
    // d..d+6 — the standard expand-then-distinct-count shape (×7
    // map-side expansion, one distinct-agg shuffle), which is how
    // exact rolling DAU/WAU is computed at scale when the sketch
    // answer isn't enough. Emits every window end the expansion
    // reaches, including the partial tail past the last observed day.
    QueryDef("q173_rolling_dau",
      (s, dir) => {
        val du = t(s, dir, "events")
          .select(col("user_id"),
            expr("unix_micros(ts) div 86400000000").as("day"))
          .distinct()
        du.select(col("user_id"),
            explode(sequence(col("day"), col("day") + 6)).as("rday"))
          .groupBy("rday")
          .agg(countDistinct("user_id").as("wau"))
          .orderBy("rday")
      },
      Some("""WITH du AS (SELECT DISTINCT user_id,
            epoch_us(ts) // 86400000000 AS day FROM events),
        x AS (SELECT user_id, day + o AS rday
          FROM du, range(0, 7) t(o))
        SELECT rday, CAST(COUNT(DISTINCT user_id) AS BIGINT) AS wau
        FROM x GROUP BY rday ORDER BY rday""")),

    // ── Conversion latency: exact view→click delay stats (q174) ────────
    // Composes the funnel timing (q149's first-click-at-or-after-
    // first-view) with the exact sort-free median engine (q141):
    // per-user latency t2−t1 in µs, then count/min/max/median over
    // the converting population, with the median computed by
    // histogram refinement — no global sort, oracle = DuckDB median.
    QueryDef("q174_conversion_latency",
      (s, dir) => {
        val ev = t(s, dir, "events")
        def typed(tp: String, as: String) =
          ev.filter(col("event_type") === tp)
            .select(col("user_id"), unix_micros(col("ts")).as(as))
        val t1 = typed("view", "us1").groupBy("user_id")
          .agg(min(col("us1")).as("t1"))
        val lat = t1.join(typed("click", "us2"), Seq("user_id"))
          .groupBy("user_id")
          .agg(min(col("t1")).as("t1"),
            min(when(col("us2") >= col("t1"), col("us2"))).as("t2"))
          .filter(col("t2").isNotNull)
          .select(lit("all").as("g"),
            (col("t2") - col("t1")).cast("double").as("lat_us"))
        val med = graft.ext.Stats.exactMedianByGroup(lat, "g", "lat_us")
          .select(col("n"), col("median").as("median_us"))
        val ext = lat.groupBy("g")
          .agg(min("lat_us").as("min_us"), max("lat_us").as("max_us"))
          .drop("g")
        med.crossJoin(ext)
      },
      Some("""WITH t1 AS (SELECT user_id, MIN(epoch_us(ts)) AS t1
            FROM events WHERE event_type = 'view' GROUP BY user_id),
          c AS (SELECT user_id, epoch_us(ts) AS us2 FROM events
            WHERE event_type = 'click'),
          lat AS (SELECT CAST(MIN(CASE WHEN c.us2 >= t1.t1
                THEN c.us2 END) - MIN(t1.t1) AS DOUBLE) AS lat_us
            FROM t1 JOIN c ON t1.user_id = c.user_id
            GROUP BY t1.user_id
            HAVING MIN(CASE WHEN c.us2 >= t1.t1 THEN c.us2 END)
              IS NOT NULL)
        SELECT CAST(COUNT(*) AS BIGINT) AS n,
          median(lat_us) AS median_us,
          MIN(lat_us) AS min_us, MAX(lat_us) AS max_us
        FROM lat""")),

    // ── Sketch-gated exact heavy hitters (q175) ────────────────────────
    // The two-pass production answer to "exact counts above φ": pass 1
    // builds the bounded count-min grid (q113's sketch), pass 2 gates
    // every occurrence MAP-SIDE on its broadcast-grid estimate before
    // the exact-count shuffle — one-sided sketch error means no true
    // heavy hitter is ever gated out, and the final exact filter kills
    // collision-inflated impostors. The exact-count shuffle carries
    // only candidate occurrences; the oracle proves the gate is
    // transparent (output ≡ plain GROUP BY … HAVING).
    QueryDef("q175_heavy_hitters",
      (s, dir) => graft.ext.Sketches.heavyHittersExact(
        tPar(s, dir, "documents")
          .select(explode(TextStats.tokens(col("text"))).as("token")),
        col("token"), cmsDepth, cmsWidth, hhDen)
        .withColumnRenamed("v", "token")
        .orderBy(desc("exact_n"), col("token")),
      Some(s"""WITH tk AS (SELECT unnest($dTok) AS token FROM documents),
          tot AS (SELECT COUNT(*) AS total FROM tk),
          hh AS (SELECT token, COUNT(*) AS exact_n FROM tk CROSS JOIN tot
            GROUP BY token, total HAVING COUNT(*) * $hhDen >= total),
          grid AS (SELECT j, ('0x' || substr(md5(j::VARCHAR || '|' ||
              token), 1, 7))::BIGINT % $cmsWidth AS bucket, COUNT(*) AS c
            FROM tk CROSS JOIN (SELECT unnest(range(0, $cmsDepth)) AS j)
            GROUP BY 1, 2),
          est AS (SELECT h.token,
            CAST(MIN(COALESCE(g.c, 0)) AS BIGINT) AS cms_est
          FROM hh h CROSS JOIN (SELECT unnest(range(0, $cmsDepth)) AS j) r
            LEFT JOIN grid g ON g.j = r.j AND g.bucket =
              ('0x' || substr(md5(r.j::VARCHAR || '|' || h.token), 1, 7))
                ::BIGINT % $cmsWidth
          GROUP BY 1)
        SELECT h.token, CAST(h.exact_n AS BIGINT) AS exact_n, e.cms_est
        FROM hh h JOIN est e USING (token)
        ORDER BY exact_n DESC, token""")),

    // ── Hashed-feature linear classifier inference (q176) ──────────────
    // Model scoring at corpus scale — the fastText/CCNet-style quality
    // gate: each token hashes to one of fhDim buckets, each bucket
    // carries an integer milli-weight derived from the portable hash
    // family (a trained model would broadcast real weights; the
    // PLUMBING — map-only scoring, no shuffle, no model join — is
    // identical), and a document's score is the sum over its token
    // occurrences. One `aggregate` fold per row computes bucket,
    // weight, and sum in a single pass; the only shuffle in the plan
    // is the final presentation sort.
    QueryDef("q176_hash_classifier",
      (s, dir) => {
        def score(toks: Column): Column = aggregate(toks, lit(0L),
          (acc, tk) => {
            val b = Shingles.baseHash(tk) % fhDim
            acc + (Shingles.baseHash(concat(lit("w|"), b.cast("string")))
              % fhWMod - fhWOff)
          })
        tPar(s, dir, "documents")
          .select(col("doc_id"),
            size(TextStats.tokens(col("text"))).cast("long")
              .as("n_tokens"),
            score(TextStats.tokens(col("text"))).as("score_milli"))
          .withColumn("label",
            when(col("score_milli") >= 0, lit("keep")).otherwise("drop"))
          .orderBy("doc_id")
      },
      Some(s"""WITH sc AS (SELECT doc_id,
            CAST(len($dTok) AS BIGINT) AS n_tokens,
            CAST(COALESCE(list_sum(list_transform($dTok, t ->
              ('0x' || substr(md5('w|' ||
                  (('0x' || substr(md5(t), 1, 7))::BIGINT % $fhDim)
                    ::VARCHAR), 1, 7))::BIGINT % $fhWMod - $fhWOff)), 0)
              AS BIGINT) AS score_milli
          FROM documents)
        SELECT doc_id, n_tokens, score_milli,
          CASE WHEN score_milli >= 0 THEN 'keep' ELSE 'drop' END AS label
        FROM sc ORDER BY doc_id""")),

    // ── Nearest-centroid auto-labeling: confusion matrix (q177) ────────
    // The classification companion of q93's centroid similarity: train
    // = one bounded (label, dim) aggregation, inference = a MAP-ONLY
    // pass with the centroid table as literals (at 100 TB the corpus is
    // scanned once, nothing is joined). All dots are exact long
    // arithmetic on the shared ncScale quantization grid; ties break to
    // the smaller label on both engines. Output: how often each true
    // label's members sit closest (by inner product) to each label's
    // centroid — the separability audit of the embedding space.
    QueryDef("q177_nearest_centroid",
      (s, dir) => graft.ext.Similarity.nearestCentroidConfusion(
        tPar(s, dir, "embeddings"), "embedding", "label", ncScale),
      Some(s"""WITH e AS (SELECT vec_id, label,
            generate_subscripts(embedding, 1) - 1 AS dim,
            CAST(floor(CAST(unnest(embedding) AS DOUBLE) * $ncScale.0)
              AS BIGINT) AS vq
          FROM embeddings),
        c AS (SELECT label AS cand, dim, SUM(vq) AS s, COUNT(*) AS n
          FROM e GROUP BY 1, 2),
        cq AS (SELECT cand, dim,
            CAST((s - ((s % n) + n) % n) // n AS BIGINT) AS mq FROM c),
        d AS (SELECT e.vec_id, e.label, cq.cand,
            SUM(e.vq * cq.mq) AS dot
          FROM e JOIN cq ON e.dim = cq.dim GROUP BY 1, 2, 3),
        b AS (SELECT vec_id, label, cand, row_number() OVER (
            PARTITION BY vec_id ORDER BY dot DESC, cand) AS rn FROM d)
        SELECT label AS true_label, cand AS assigned,
          CAST(COUNT(*) AS BIGINT) AS n_vecs
        FROM b WHERE rn = 1 GROUP BY 1, 2 ORDER BY 1, 2""")),

    // ── RFM segmentation via the exact-quantile engine (q178) ──────────
    // The classic customer-value cube (recency / frequency / monetary
    // quartiles), built the scale-sane way: NO global ntile window
    // (that's a single-partition sort over every customer) — instead
    // the q144 histogram-refinement engine finds the nine exact
    // quantile_cont boundaries distributed, and assignment is a
    // MAP-SIDE value comparison against nine broadcast literals.
    // Value-based bins (not row-number ntile) also give ties a stable,
    // engine-independent meaning: equal metric ⇒ same bin, stated
    // identically in the oracle.
    QueryDef("q178_rfm_segments",
      (s, dir) => {
        val per = t(s, dir, "orders").groupBy(col("o_custkey").as("ck"))
          .agg(max(expr(
            "unix_micros(cast(o_orderdate as timestamp)) div 86400000000"))
            .as("last_day"), count(lit(1)).as("f"),
            dsum(col("o_totalprice")).as("m"))
        val gmax = per.agg(max("last_day").as("gmax"))
        // rfm feeds both the quantile engine and the final assignment
        // pass — materialize the per-customer aggregate once
        val rfm = per.crossJoin(broadcast(gmax))
          .select(col("ck"),
            (col("gmax") - col("last_day")).cast("double").as("rv"),
            col("f").cast("double").as("fv"), col("m"))
          .localCheckpoint()
        val melted = rfm.select(col("ck"), explode(array(
          struct(lit("r").as("metric"), col("rv").as("value")),
          struct(lit("f").as("metric"), col("fv").as("value")),
          struct(lit("m").as("metric"), col("m").as("value"))))
          .as("mv")).select(col("mv.metric"), col("mv.value"))
        val bounds = graft.ext.Stats.exactQuantilesByGroup(
          melted, "metric", "value", Seq(0.25, 0.5, 0.75),
          buckets = 64, tail = 64)
          .collect().map(r => (r.getString(0), r.getDouble(1)) ->
            r.getDouble(3)).toMap
        def band(v: Column, metric: String): Column =
          Seq(0.25, 0.5, 0.75).map(p =>
            (v > lit(bounds((metric, p)))).cast("int"))
            .foldLeft(lit(1))(_ + _)
        rfm.select(col("ck"), col("m"), concat(
            band(col("rv"), "r").cast("string"),
            band(col("fv"), "f").cast("string"),
            band(col("m"), "m").cast("string")).as("segment"))
          .groupBy("segment")
          .agg(count(lit(1)).as("n_customers"),
            dsum(col("m")).as("monetary_sum"))
          .orderBy("segment")
      },
      Some(s"""WITH per AS (SELECT o_custkey AS ck,
            MAX(epoch_us(o_orderdate) // 86400000000) AS last_day,
            COUNT(*) AS f, ${dsumSql("o_totalprice")} AS m
          FROM orders GROUP BY 1),
        rfm AS (SELECT ck,
            CAST((SELECT MAX(last_day) FROM per) - last_day AS DOUBLE)
              AS rv,
            CAST(f AS DOUBLE) AS fv, m FROM per),
        q AS (SELECT
            quantile_cont(rv, 0.25) AS r1, quantile_cont(rv, 0.5) AS r2,
            quantile_cont(rv, 0.75) AS r3,
            quantile_cont(fv, 0.25) AS f1, quantile_cont(fv, 0.5) AS f2,
            quantile_cont(fv, 0.75) AS f3,
            quantile_cont(m, 0.25) AS m1, quantile_cont(m, 0.5) AS m2,
            quantile_cont(m, 0.75) AS m3 FROM rfm),
        seg AS (SELECT ck, m,
            CAST(1 + (rv > r1)::INT + (rv > r2)::INT + (rv > r3)::INT
              AS VARCHAR) ||
            CAST(1 + (fv > f1)::INT + (fv > f2)::INT + (fv > f3)::INT
              AS VARCHAR) ||
            CAST(1 + (m > m1)::INT + (m > m2)::INT + (m > m3)::INT
              AS VARCHAR) AS segment
          FROM rfm CROSS JOIN q)
        SELECT segment, CAST(COUNT(*) AS BIGINT) AS n_customers,
          ${dsumSql("m")} AS monetary_sum
        FROM seg GROUP BY segment ORDER BY segment""")),

    // ── Kaplan–Meier retention curve (q179) ────────────────────────────
    // Survival analysis for user churn: lifetime = days between a
    // user's first and last event, "churned" iff the last event falls
    // ≥ 7 days before the corpus horizon (otherwise right-censored).
    // The heavy work — per-user lifetimes and the life table — is
    // ordinary distributed aggregation; at-risk counts come from ONE
    // suffix-sum window over the ≤|distinct lifetimes| life table; and
    // the product-limit estimator runs as an in-plan prefix-product
    // fold over that bounded table (S_i = S_{i-1}·(n_i−d_i) div n_i,
    // INTEGER-scaled at 1e12 so each truncation is deterministic — the
    // oracle replays the identical recurrence as a recursive CTE;
    // long arithmetic holds while 1e12·users < 2^63, i.e. up to ~9M
    // at-risk users — above that, swap the fold to DECIMAL).
    QueryDef("q179_kaplan_meier",
      (s, dir) => {
        val day = 86400000000L
        // per-user bounds feed both the horizon and the lifetimes —
        // materialize so the fact table is scanned once, not twice
        val u = t(s, dir, "events").groupBy("user_id")
          .agg(min(unix_micros(col("ts"))).as("fu"),
            max(unix_micros(col("ts"))).as("lu"))
          .localCheckpoint()
        val p = u.crossJoin(broadcast(u.agg(max("lu").as("gmax"))))
          .select(expr("(lu - fu) div 86400000000").as("t"),
            (col("lu") <= col("gmax") - lit(7L * day)).as("died"))
        val lt = p.groupBy("t")
          .agg(sum(when(col("died"), 1L).otherwise(0L)).as("d"),
            sum(when(col("died"), 0L).otherwise(1L)).as("cc"))
        // Suffix sum over the bounded life table (global window is fine:
        // ≤ |distinct lifetime days| rows by construction).
        val w = boundedWindow("t")
          .rowsBetween(Window.currentRow, Window.unboundedFollowing)
        val withRisk = lt.withColumn("n", sum(col("d") + col("cc")).over(w))
        withRisk.agg(sort_array(collect_list(
            struct(col("t"), col("d"), col("cc"), col("n")))).as("arr"))
          .select(posexplode(expr(
            """transform(sequence(1, size(arr)), i -> struct(
               arr[i - 1].t as t, arr[i - 1].d as died,
               arr[i - 1].cc as censored, arr[i - 1].n as at_risk,
               aggregate(slice(arr, 1, i), CAST(1000000000000 AS BIGINT),
                 (acc, x) -> (acc * (x.n - x.d)) div x.n)
                 as surv_scaled))"""))
            .as(Seq("i", "row")))
          .select(col("row.t"), col("row.died"), col("row.censored"),
            col("row.at_risk"), col("row.surv_scaled"))
          .orderBy("t")
      },
      Some("""WITH RECURSIVE u AS (SELECT user_id,
            MIN(epoch_us(ts)) AS fu, MAX(epoch_us(ts)) AS lu
          FROM events GROUP BY 1),
        p AS (SELECT (lu - fu) // 86400000000 AS t,
            (lu <= (SELECT MAX(lu) FROM u) - 7 * 86400000000) AS died
          FROM u),
        lt AS (SELECT t, SUM(CASE WHEN died THEN 1 ELSE 0 END) AS d,
            SUM(CASE WHEN died THEN 0 ELSE 1 END) AS cc
          FROM p GROUP BY t),
        w AS (SELECT t, d, cc, SUM(d + cc) OVER (ORDER BY t
            ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS n,
            row_number() OVER (ORDER BY t) AS rn FROM lt),
        rec AS (
          SELECT rn, t, d, cc, n,
            (1000000000000 * (n - d)) // n AS surv
          FROM w WHERE rn = 1
          UNION ALL
          SELECT w.rn, w.t, w.d, w.cc, w.n,
            (rec.surv * (w.n - w.d)) // w.n
          FROM rec JOIN w ON w.rn = rec.rn + 1)
        SELECT t, CAST(d AS BIGINT) AS died,
          CAST(cc AS BIGINT) AS censored, CAST(n AS BIGINT) AS at_risk,
          CAST(surv AS BIGINT) AS surv_scaled
        FROM rec ORDER BY t""")),

    // ── Market-basket mining: brand pair rules (q180) ──────────────────
    // The retail association shape over the REAL fact table (lineitem,
    // not the doc corpus like q98): support/confidence/lift for brand
    // pairs co-occurring in one order. Scale plan: the only expansion
    // is the per-order pair join, bounded by (brands per order choose
    // 2) — never a brand×brand cross join; brand supports and the
    // order count are broadcast-tiny. Support threshold is relative
    // (s_ab·basketDen ≥ N) so the query is scale-invariant; confidence
    // and lift are single correctly-rounded divisions of exact counts,
    // written operation-for-operation identically in the oracle.
    QueryDef("q180_basket_rules",
      (s, dir) => {
        // materialize once: ob feeds the order count, brand supports,
        // and BOTH sides of the pair join — without this the fact
        // table would be scanned four times (q106's lesson). The
        // part-dim join carries NO broadcast hint: Catalyst's
        // size-gated planning broadcasts it while the catalog is
        // small and falls back to a shuffled join when it is not, so
        // the basket family survives an unbounded item catalog
        // (PlanQualitySpec locks both plans).
        val ob = t(s, dir, "lineitem")
          .join(t(s, dir, "part"),
            col("l_partkey") === col("p_partkey"))
          .select(col("l_orderkey").as("ok"), col("p_brand").as("b"))
          .distinct()
          .localCheckpoint()
        val nOrders = ob.select("ok").distinct()
          .agg(count(lit(1)).as("n"))
        val supp = ob.groupBy(col("b")).agg(count(lit(1)).as("s"))
        val pairs = ob.select(col("ok"), col("b").as("ba"))
          .join(ob.select(col("ok"), col("b").as("bb")), Seq("ok"))
          .filter(col("ba") < col("bb"))
          .groupBy("ba", "bb").agg(count(lit(1)).as("s_ab"))
        pairs.crossJoin(broadcast(nOrders))
          .filter(col("s_ab") * basketDen >= col("n"))
          .join(broadcast(supp.select(col("b").as("ba"),
            col("s").as("s_a"))), "ba")
          .join(broadcast(supp.select(col("b").as("bb"),
            col("s").as("s_b"))), "bb")
          .select(col("ba").as("brand_a"), col("bb").as("brand_b"),
            col("s_ab"), col("s_a"), col("s_b"),
            (col("s_ab").cast("double") / col("s_a")).as("confidence"),
            ((col("n").cast("double") * col("s_ab")) /
              (col("s_a").cast("double") * col("s_b"))).as("lift"))
          .orderBy(desc("s_ab"), col("brand_a"), col("brand_b"))
      },
      Some(s"""WITH ob AS (SELECT DISTINCT l.l_orderkey AS ok,
            p.p_brand AS b
          FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey),
        n AS (SELECT COUNT(DISTINCT ok) AS n FROM ob),
        supp AS (SELECT b, COUNT(*) AS s FROM ob GROUP BY b),
        pr AS (SELECT a.b AS ba, c.b AS bb, COUNT(*) AS s_ab
          FROM ob a JOIN ob c ON a.ok = c.ok AND a.b < c.b
          GROUP BY 1, 2)
        SELECT pr.ba AS brand_a, pr.bb AS brand_b,
          CAST(pr.s_ab AS BIGINT) AS s_ab,
          CAST(sa.s AS BIGINT) AS s_a, CAST(sb.s AS BIGINT) AS s_b,
          CAST(pr.s_ab AS DOUBLE) / sa.s AS confidence,
          (CAST(n.n AS DOUBLE) * pr.s_ab) /
            (CAST(sa.s AS DOUBLE) * sb.s) AS lift
        FROM pr CROSS JOIN n
          JOIN supp sa ON sa.b = pr.ba JOIN supp sb ON sb.b = pr.bb
        WHERE pr.s_ab * $basketDen >= n.n
        ORDER BY s_ab DESC, brand_a, brand_b""")),

    // ── Systematic PPS sampling via distributed prefix sum (q181) ──────
    // The with-replacement complement of q114's priority sampling:
    // probability-proportional-to-size systematic selection — walk the
    // hash-ordered cumulative weight line and pick every W/k-th point.
    // The cumulative weights come from Hypothesis.prefixSumByRange (a
    // range repartition + per-partition windows + one broadcast offset
    // join), so there is NO single-partition global window; selection
    // is a map-side integer predicate: a row with weight w and
    // inclusive cum c is picked ⌊c·k/W⌋ − ⌊(c−w)·k/W⌋ times. Exact
    // long arithmetic end to end (c·k ≤ W·k), deterministic hash
    // order, so the oracle replays the identical walk with one global
    // window.
    QueryDef("q181_systematic_pps",
      (s, dir) => {
        val d = tPar(s, dir, "documents").select(col("doc_id"),
          greatest(lit(1L), col("n_chars")).as("w"),
          concat(md5(col("doc_id").cast("string")), lit("|"),
            col("doc_id").cast("string")).as("ok"))
        val cum = graft.ext.Hypothesis.prefixSumByRange(d, "ok", "w", 32)
        cum.crossJoin(broadcast(d.agg(sum("w").as("tw"))))
          .withColumn("n_picks", expr(
            s"(cum * $sysK) div tw - ((cum - w) * $sysK) div tw"))
          .filter(col("n_picks") >= 1)
          .select(col("doc_id"), col("w"), col("cum"), col("n_picks"))
          .orderBy("doc_id")
      },
      Some(s"""WITH d AS (SELECT doc_id,
            GREATEST(1, n_chars) AS w,
            md5(doc_id::VARCHAR) || '|' || doc_id::VARCHAR AS ok
          FROM documents),
        c AS (SELECT doc_id, w,
            SUM(w) OVER (ORDER BY ok
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
            (SELECT SUM(w) FROM d) AS tw
          FROM d)
        SELECT doc_id, CAST(w AS BIGINT) AS w, CAST(cum AS BIGINT) AS cum,
          CAST((cum * $sysK) // tw - ((cum - w) * $sysK) // tw
            AS BIGINT) AS n_picks
        FROM c
        WHERE (cum * $sysK) // tw - ((cum - w) * $sysK) // tw >= 1
        ORDER BY doc_id""")),

    // ── MMR diversified retrieval (q182) ───────────────────────────────
    // Relevance-vs-redundancy re-ranking (λ = ½) on top of the exact
    // retrieval leg: corpus-scale map-only dots against the broadcast
    // probe, TakeOrdered candidate pool, then the bounded greedy
    // re-rank (see Similarity.mmrDiversifiedTopK). The oracle unrolls
    // the k greedy steps as chained CTEs over the same integer dot
    // matrix — selection, penalties, and tie-breaks replay exactly.
    QueryDef("q182_mmr_rerank",
      (s, dir) => graft.ext.Similarity.mmrDiversifiedTopK(
        tPar(s, dir, "embeddings"), "vec_id", "embedding",
        mmrProbeId, mmrCand, mmrK, ncScale)
        .select(col("rank").cast("long").as("rank"), col("vec_id"),
          col("relevance"), col("penalty"), col("mmr_score"))
        .orderBy("rank"),
      Some {
        val steps = (2 to mmrK).map { j =>
          val sel = (1 until j).map(i => s"SELECT vec_id FROM s$i")
            .mkString(" UNION ALL ")
          s"""s$j AS (SELECT $j AS rank, vec_id, relevance, penalty,
              relevance - penalty AS mmr_score FROM (
            SELECT c.vec_id, c.rel AS relevance,
              (SELECT MAX(p.d) FROM pr p WHERE p.ida = c.vec_id
                AND p.idb IN ($sel)) AS penalty
            FROM cand c WHERE c.vec_id NOT IN ($sel)) t
            ORDER BY mmr_score DESC, vec_id LIMIT 1)"""
        }.mkString(",\n        ")
        val unioned = (1 to mmrK).map(i => s"SELECT * FROM s$i")
          .mkString(" UNION ALL ")
        s"""WITH e AS (SELECT vec_id,
              generate_subscripts(embedding, 1) - 1 AS dim,
              CAST(floor(CAST(unnest(embedding) AS DOUBLE) * $ncScale.0)
                AS BIGINT) AS vq
            FROM embeddings),
          qv AS (SELECT dim, vq FROM e WHERE vec_id = $mmrProbeId),
          rel AS (SELECT e.vec_id, SUM(e.vq * qv.vq) AS rel
            FROM e JOIN qv USING (dim)
            WHERE e.vec_id <> $mmrProbeId GROUP BY 1),
          cand AS (SELECT vec_id, rel FROM rel
            ORDER BY rel DESC, vec_id LIMIT $mmrCand),
          pr AS (SELECT a.vec_id AS ida, b.vec_id AS idb,
              SUM(ea.vq * eb.vq) AS d
            FROM cand a JOIN cand b ON a.vec_id <> b.vec_id
              JOIN e ea ON ea.vec_id = a.vec_id
              JOIN e eb ON eb.vec_id = b.vec_id AND ea.dim = eb.dim
            GROUP BY 1, 2),
          s1 AS (SELECT 1 AS rank, vec_id, rel AS relevance,
              CAST(NULL AS BIGINT) AS penalty, rel AS mmr_score
            FROM cand ORDER BY rel DESC, vec_id LIMIT 1),
          $steps
        SELECT CAST(rank AS BIGINT) AS rank, vec_id,
          CAST(relevance AS BIGINT) AS relevance,
          CAST(penalty AS BIGINT) AS penalty,
          CAST(mmr_score AS BIGINT) AS mmr_score
        FROM ($unioned) ORDER BY rank"""
      }),

    // ── Per-user feature materialization (q183) ────────────────────────
    // The feature-store build: one pass turns raw events into the
    // model-ready per-user vector — counts, activity span, per-day
    // rate, decimal-exact mean value, and an activity TREND (the q112
    // least-squares slope of daily event counts over day index, exact
    // integer sufficient sums, one correctly-rounded division).
    // Two-level aggregation — (user, day) partial then per-user — so
    // both shuffles are partial-agg friendly; no window, no join.
    QueryDef("q183_user_features",
      (s, dir) => {
        val perDay = t(s, dir, "events")
          .select(col("user_id"),
            expr("unix_micros(ts) div 86400000000").as("day"),
            col("value"))
          .groupBy("user_id", "day")
          .agg(count(lit(1)).as("c"), dsum(col("value")).as("sv"))
        perDay.groupBy("user_id")
          .agg(sum("c").as("n_events"),
            count(lit(1)).as("active_days"),
            min("day").as("first_day"), max("day").as("last_day"),
            sum(col("day") * col("c")).as("sxy0"),
            sum("day").as("sx"), sum(col("day") * col("day")).as("sxx"),
            dsum(col("sv")).as("svv"))
          .select(col("user_id"), col("n_events"), col("active_days"),
            (col("last_day") - col("first_day") + 1).as("span_days"),
            (col("n_events").cast("double") / col("active_days"))
              .as("events_per_active_day"),
            (col("svv") / col("n_events")).as("mean_value"),
            when(col("active_days") > 1,
              (col("active_days").cast("double") * col("sxy0") -
                col("sx").cast("double") * col("n_events")) /
              (col("active_days").cast("double") * col("sxx") -
                col("sx").cast("double") * col("sx")))
              .as("daily_trend"))
          .orderBy("user_id")
      },
      Some(s"""WITH pd AS (SELECT user_id,
            epoch_us(ts) // 86400000000 AS day, COUNT(*) AS c,
            ${dsumSql("value")} AS sv
          FROM events GROUP BY 1, 2),
        u AS (SELECT user_id, SUM(c) AS n_events, COUNT(*) AS active_days,
            MIN(day) AS first_day, MAX(day) AS last_day,
            SUM(day * c) AS sxy0, SUM(day) AS sx,
            SUM(day * day) AS sxx, ${dsumSql("sv")} AS svv
          FROM pd GROUP BY 1)
        SELECT user_id, CAST(n_events AS BIGINT) AS n_events,
          CAST(active_days AS BIGINT) AS active_days,
          CAST(last_day - first_day + 1 AS BIGINT) AS span_days,
          CAST(n_events AS DOUBLE) / active_days AS events_per_active_day,
          svv / n_events AS mean_value,
          CASE WHEN active_days > 1 THEN
            (CAST(active_days AS DOUBLE) * sxy0 -
              CAST(sx AS DOUBLE) * n_events) /
            (CAST(active_days AS DOUBLE) * sxx -
              CAST(sx AS DOUBLE) * sx) END AS daily_trend
        FROM u ORDER BY user_id""")),

    // ── Deterministic negative sampling (q184) ─────────────────────────
    // Contrastive-training prep: per customer, sample negK items
    // (brands) they have NOT bought — candidate space = customers ×
    // the BOUNDED brand dimension (a broadcast expansion, never an
    // item-domain cross join — with an unbounded catalog you'd
    // hash-bucket candidates first), positives removed by anti-join,
    // selection by deterministic md5 priority on the custom
    // TopKPerKey heap operator. A pure function of the keys:
    // reruns, retries, and the oracle all pick the same negatives.
    QueryDef("q184_negative_sampling",
      (s, dir) => {
        // part-dim join deliberately unhinted — size-gated broadcast,
        // shuffled above the threshold (see q180)
        val pos = t(s, dir, "lineitem")
          .join(t(s, dir, "orders"),
            col("l_orderkey") === col("o_orderkey"))
          .join(t(s, dir, "part"),
            col("l_partkey") === col("p_partkey"))
          .select(col("o_custkey").as("custkey"),
            col("p_brand").as("brand")).distinct()
        val brands = t(s, dir, "part").select(col("p_brand").as("brand"))
          .distinct()
        val custs = t(s, dir, "orders")
          .select(col("o_custkey").as("custkey")).distinct()
        val neg = custs.crossJoin(broadcast(brands))
          .join(pos, Seq("custkey", "brand"), "left_anti")
          .withColumn("h", md5(concat(col("custkey").cast("string"),
            lit("|"), col("brand"))))
        graft.plans.TopKPerKey.topKPerKey(neg, Seq("custkey"),
          Seq(graft.plans.TopKPerKey.Sort("h"),
            graft.plans.TopKPerKey.Sort("brand")), negK)
          .select(col("custkey"), col("brand"),
            col("rank").cast("long").as("rank"))
          .orderBy("custkey", "rank")
      },
      Some(s"""WITH pos AS (SELECT DISTINCT o.o_custkey AS custkey,
            p.p_brand AS brand
          FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
            JOIN part p ON l.l_partkey = p.p_partkey),
        br AS (SELECT DISTINCT p_brand AS brand FROM part),
        cu AS (SELECT DISTINCT o_custkey AS custkey FROM orders),
        neg AS (SELECT c.custkey, c.brand
          FROM (SELECT custkey, brand FROM cu CROSS JOIN br) c
          ANTI JOIN pos ON pos.custkey = c.custkey
            AND pos.brand = c.brand),
        rk AS (SELECT custkey, brand, row_number() OVER (
            PARTITION BY custkey
            ORDER BY md5(custkey::VARCHAR || '|' || brand), brand)
            AS rank FROM neg)
        SELECT custkey, brand, CAST(rank AS BIGINT) AS rank FROM rk
        WHERE rank <= $negK ORDER BY custkey, rank""")),

    // ── SemDeDup: cluster-then-prune semantic dedup (q185) ─────────────
    // Embedding near-dup pruning in the published cluster-local shape
    // (Abbas et al. 2023): nearest-centroid cells from q177's
    // machinery, pairwise EXACT rational cosine tests confined to each
    // cell, prune all but the lowest id of each similar pair. See
    // Similarity.semDedupCellStats for the scale contract.
    QueryDef("q185_semdedup",
      (s, dir) => graft.ext.Similarity.semDedupCellStats(
        tPar(s, dir, "embeddings"), "vec_id", "embedding", "label",
        ncScale, semCosNum, semCosDen),
      Some {
        val n2 = semCosNum.toLong * semCosNum
        val d2 = semCosDen.toLong * semCosDen
        s"""WITH e AS (SELECT vec_id, label,
              generate_subscripts(embedding, 1) - 1 AS dim,
              CAST(floor(CAST(unnest(embedding) AS DOUBLE) * $ncScale.0)
                AS BIGINT) AS vq
            FROM embeddings),
          c AS (SELECT label AS cand, dim, SUM(vq) AS s, COUNT(*) AS n
            FROM e GROUP BY 1, 2),
          cq AS (SELECT cand, dim,
              CAST((s - ((s % n) + n) % n) // n AS BIGINT) AS mq FROM c),
          d AS (SELECT e.vec_id, cq.cand, SUM(e.vq * cq.mq) AS dot
            FROM e JOIN cq ON e.dim = cq.dim GROUP BY 1, 2),
          asg AS (SELECT vec_id, cand AS cell FROM (
            SELECT vec_id, cand, row_number() OVER (PARTITION BY vec_id
              ORDER BY dot DESC, cand) AS rn FROM d) WHERE rn = 1),
          nn AS (SELECT vec_id, SUM(vq * vq) AS nn FROM e GROUP BY 1),
          pd AS (SELECT aa.cell, ea.vec_id AS ia, eb.vec_id AS ib,
              SUM(ea.vq * eb.vq) AS dot
            FROM asg aa JOIN asg ab ON aa.cell = ab.cell
              AND aa.vec_id < ab.vec_id
              JOIN e ea ON ea.vec_id = aa.vec_id
              JOIN e eb ON eb.vec_id = ab.vec_id AND eb.dim = ea.dim
            GROUP BY 1, 2, 3),
          qual AS (SELECT pd.cell, pd.ia, pd.ib FROM pd
            JOIN nn na ON na.vec_id = pd.ia
            JOIN nn nb ON nb.vec_id = pd.ib
            WHERE pd.dot > 0
              AND $d2 * pd.dot * pd.dot >= $n2 * na.nn * nb.nn),
          mem AS (SELECT cell, COUNT(*) AS n_members FROM asg
            GROUP BY 1),
          ps AS (SELECT cell, COUNT(*) AS n_pairs,
              COUNT(DISTINCT ib) AS n_pruned FROM qual GROUP BY 1)
        SELECT mem.cell, CAST(n_members AS BIGINT) AS n_members,
          CAST(COALESCE(n_pairs, 0) AS BIGINT) AS n_pairs,
          CAST(COALESCE(n_pruned, 0) AS BIGINT) AS n_pruned
        FROM mem LEFT JOIN ps USING (cell) ORDER BY cell"""
      }),

    // ── Data-quality gate report (q186) ────────────────────────────────
    // The oracle-gated face of the quality/Checks machinery: one
    // result set of (table, rule, n_checked, n_violations) rows —
    // key-null counts, duplicate primary keys, referential orphans
    // (each leg a broadcast-able anti-join, never a full outer), and
    // domain-range rules. Every rule is a single aggregate; same-table
    // rules share one scan.
    QueryDef("q186_dq_report",
      (s, dir) => {
        def row(tbl: String, rule: String, checked: Column,
                viol: Column, src: DataFrame) =
          src.agg(checked.as("n_checked"), viol.as("n_violations"))
            .select(lit(tbl).as("table_name"), lit(rule).as("rule"),
              col("n_checked"), col("n_violations"))
        val li = t(s, dir, "lineitem")
        val ord = t(s, dir, "orders")
        val cust = t(s, dir, "customer")
        val orphanLi = li.join(ord.select(col("o_orderkey")),
          col("l_orderkey") === col("o_orderkey"), "left_anti")
        val orphanCust = cust.join(
          broadcast(t(s, dir, "nation").select(col("n_nationkey"))),
          col("c_nationkey") === col("n_nationkey"), "left_anti")
        val dupOrders = ord.groupBy("o_orderkey")
          .agg(count(lit(1)).as("c")).filter(col("c") > 1)
        Seq(
          row("lineitem", "key_not_null", count(lit(1)),
            sum(when(col("l_orderkey").isNull, 1L).otherwise(0L)), li),
          row("lineitem", "fk_orders", count(lit(1)), count(lit(1)),
            orphanLi).withColumn("n_checked",
            lit(null).cast("long")),
          row("orders", "pk_unique", count(lit(1)), count(lit(1)),
            dupOrders).withColumn("n_checked", lit(null).cast("long")),
          row("orders", "price_positive", count(lit(1)),
            sum(when(col("o_totalprice") <= 0, 1L).otherwise(0L)), ord),
          row("customer", "fk_nation", count(lit(1)), count(lit(1)),
            orphanCust).withColumn("n_checked", lit(null).cast("long")),
          row("events", "value_not_null", count(lit(1)),
            sum(when(col("value").isNull || isnan(col("value")), 1L)
              .otherwise(0L)), t(s, dir, "events")))
          .reduce(_.unionByName(_))
          .select(col("table_name"), col("rule"), col("n_checked"),
            col("n_violations"))
          .orderBy("table_name", "rule")
      },
      Some("""SELECT table_name, rule, CAST(n_checked AS BIGINT)
          AS n_checked, CAST(n_violations AS BIGINT) AS n_violations
        FROM (
          SELECT 'lineitem' AS table_name, 'key_not_null' AS rule,
            COUNT(*) AS n_checked,
            SUM(CASE WHEN l_orderkey IS NULL THEN 1 ELSE 0 END)
              AS n_violations FROM lineitem
          UNION ALL
          SELECT 'lineitem', 'fk_orders', NULL,
            (SELECT COUNT(*) FROM lineitem l ANTI JOIN orders o
              ON l.l_orderkey = o.o_orderkey)
          UNION ALL
          SELECT 'orders', 'pk_unique', NULL,
            (SELECT COUNT(*) FROM (SELECT o_orderkey FROM orders
              GROUP BY 1 HAVING COUNT(*) > 1))
          UNION ALL
          SELECT 'orders', 'price_positive', COUNT(*),
            SUM(CASE WHEN o_totalprice <= 0 THEN 1 ELSE 0 END)
          FROM orders
          UNION ALL
          SELECT 'customer', 'fk_nation', NULL,
            (SELECT COUNT(*) FROM customer c ANTI JOIN nation n
              ON c.c_nationkey = n.n_nationkey)
          UNION ALL
          SELECT 'events', 'value_not_null', COUNT(*),
            SUM(CASE WHEN value IS NULL OR isnan(value) THEN 1 ELSE 0
              END)
          FROM events)
        ORDER BY table_name, rule""")),

    // ── KMV A-not-B: set-difference distinct estimate (q187) ───────────
    // "How many users viewed but never purchased" answered from two
    // k-row sketches — the set-difference leg of the KMV algebra after
    // q95's union/intersection: among the union's k minima, the
    // A-only fraction scales the union estimate. The exact anti-join
    // answer rides along as the audit column, q113-style, so the
    // output itself exhibits the estimator's error.
    QueryDef("q187_kmv_anotb",
      (s, dir) => {
        val ev = t(s, dir, "events")
        val viewers = ev.filter(col("event_type") === "view")
          .select(col("user_id"))
        val buyers = ev.filter(col("event_type") === "purchase")
          .select(col("user_id"))
        val est = graft.ext.Sketches.kmvANotB(
          viewers, col("user_id"), buyers, col("user_id"), kmvK)
        val exact = viewers.distinct()
          .join(buyers.distinct(), Seq("user_id"), "left_anti")
          .agg(count(lit(1)).as("anotb_exact"))
        est.crossJoin(exact)
      },
      Some {
        val est = s"""CASE WHEN ku < $kmvK THEN CAST(ku AS DOUBLE)
           ELSE CAST(ku - 1 AS DOUBLE) * CAST(268435456.0 AS DOUBLE)
             / CAST(kth_u AS DOUBLE) END"""
        s"""WITH av AS (SELECT DISTINCT user_id FROM events
            WHERE event_type = 'view'),
          bv AS (SELECT DISTINCT user_id FROM events
            WHERE event_type = 'purchase'),
          ka AS (SELECT ('0x' || substr(md5(CAST(user_id AS VARCHAR)),
              1, 7))::BIGINT AS h, 1 AS in_a FROM av
            ORDER BY h LIMIT $kmvK),
          kb AS (SELECT ('0x' || substr(md5(CAST(user_id AS VARCHAR)),
              1, 7))::BIGINT AS h, 1 AS in_b FROM bv
            ORDER BY h LIMIT $kmvK),
          u AS (SELECT COALESCE(ka.h, kb.h) AS h,
              COALESCE(in_a, 0) AS in_a, COALESCE(in_b, 0) AS in_b
            FROM ka FULL OUTER JOIN kb ON ka.h = kb.h
            ORDER BY h LIMIT $kmvK),
          uu AS (SELECT COUNT(*) AS ku, MAX(h) AS kth_u,
            CAST(SUM(in_a * (1 - in_b)) AS BIGINT) AS n_aonly FROM u),
          ex AS (SELECT COUNT(*) AS anotb_exact
            FROM av ANTI JOIN bv ON av.user_id = bv.user_id)
        SELECT CAST(ku AS BIGINT) AS k_actual, n_aonly,
          $est AS d_union,
          (CAST(n_aonly AS DOUBLE) / CAST(ku AS DOUBLE)) * ($est)
            AS anotb_est,
          CAST(anotb_exact AS BIGINT) AS anotb_exact
        FROM uu CROSS JOIN ex"""
      }),

    // ── Functional-dependency discovery (q188) ─────────────────────────
    // Data profiling's schema-inference primitive (the Metanome/TANE
    // check, pairwise form): does A → B hold — i.e. does any A value
    // map to more than one distinct B? Each candidate costs ONE
    // partial-agg groupBy(A) countDistinct(B); violations = values of
    // A with ≥ 2 images; output includes the violation mass so a
    // "nearly-holds" FD (the interesting kind for cleaning) is visible,
    // not just the boolean.
    QueryDef("q188_fd_discovery",
      (s, dir) => {
        def fd(tbl: String, a: String, b: String) =
          t(s, dir, tbl).groupBy(col(a))
            .agg(countDistinct(col(b)).as("nb"))
            .agg(count(lit(1)).as("n_lhs_values"),
              sum(when(col("nb") > 1, 1L).otherwise(0L))
                .as("n_violating_lhs"))
            .select(lit(tbl).as("table_name"), lit(a).as("determinant"),
              lit(b).as("dependent"), col("n_lhs_values"),
              col("n_violating_lhs"),
              (col("n_violating_lhs") === 0).as("holds"))
        Seq(
          fd("nation", "n_nationkey", "n_name"),
          fd("nation", "n_name", "n_regionkey"),
          fd("customer", "c_nationkey", "c_mktsegment"),
          fd("part", "p_brand", "p_type"),
          fd("orders", "o_custkey", "o_orderpriority"),
          fd("lineitem", "l_orderkey", "l_returnflag"))
          .reduce(_.unionByName(_))
          .orderBy("table_name", "determinant", "dependent")
      },
      Some {
        def fd(tbl: String, a: String, b: String) =
          s"""SELECT '$tbl' AS table_name, '$a' AS determinant,
             '$b' AS dependent,
             CAST(COUNT(*) AS BIGINT) AS n_lhs_values,
             CAST(SUM(CASE WHEN nb > 1 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_violating_lhs,
             SUM(CASE WHEN nb > 1 THEN 1 ELSE 0 END) = 0 AS holds
           FROM (SELECT $a, COUNT(DISTINCT $b) AS nb FROM $tbl
                 GROUP BY $a)"""
        Seq(
          fd("nation", "n_nationkey", "n_name"),
          fd("nation", "n_name", "n_regionkey"),
          fd("customer", "c_nationkey", "c_mktsegment"),
          fd("part", "p_brand", "p_type"),
          fd("orders", "o_custkey", "o_orderpriority"),
          fd("lineitem", "l_orderkey", "l_returnflag"))
          .mkString("SELECT * FROM (\n", "\nUNION ALL\n",
            ")\nORDER BY table_name, determinant, dependent")
      }),

    // ── Transition-timing profile (q189) ───────────────────────────────
    // The temporal layer over q111's Markov matrix: for each observed
    // (from → to) event transition, the count, decimal-exact mean gap,
    // min/max, and EXACT median gap in microseconds — median via the
    // q141 histogram-refinement engine keyed by the transition pair,
    // so there is no global sort and no per-pair re-scan. One lag
    // window over the user timeline feeds everything.
    QueryDef("q189_transition_timing",
      (s, dir) => {
        val w = Window.partitionBy("user_id")
          .orderBy(col("us").asc, col("event_id").asc)
        val tr = t(s, dir, "events")
          .select(col("user_id"), col("event_id"),
            col("event_type"), unix_micros(col("ts")).as("us"))
          .select(col("event_type").as("to_type"),
            lag(col("event_type"), 1).over(w).as("from_type"),
            (col("us") - lag(col("us"), 1).over(w)).as("gap_us"))
          .filter(col("from_type").isNotNull)
          .select(concat(col("from_type"), lit(">"), col("to_type"))
            .as("transition"), col("gap_us").cast("double").as("gap_us"))
          .localCheckpoint()
        val med = graft.ext.Stats.exactMedianByGroup(
          tr, "transition", "gap_us")
          .select(col("transition"), col("n"),
            col("median").as("median_gap_us"))
        val ext = tr.groupBy("transition")
          .agg(davg(col("gap_us")).as("mean_gap_us"),
            min("gap_us").as("min_gap_us"),
            max("gap_us").as("max_gap_us"))
        med.join(ext, "transition")
          .orderBy("transition")
      },
      Some(s"""WITH tr AS (SELECT
            lag(event_type) OVER (PARTITION BY user_id
              ORDER BY epoch_us(ts), event_id) || '>' || event_type
              AS transition,
            CAST(epoch_us(ts) - lag(epoch_us(ts)) OVER (
              PARTITION BY user_id ORDER BY epoch_us(ts), event_id)
              AS DOUBLE) AS gap_us
          FROM events)
        SELECT transition, CAST(COUNT(*) AS BIGINT) AS n,
          median(gap_us) AS median_gap_us,
          ${dsumSql("gap_us")} / COUNT(*) AS mean_gap_us,
          MIN(gap_us) AS min_gap_us, MAX(gap_us) AS max_gap_us
        FROM tr WHERE transition IS NOT NULL
        GROUP BY transition ORDER BY transition""")),

    // ── Retractable incremental aggregation (q190) ─────────────────────
    // q97 handles insert-only maintenance; real CDC feeds also DELETE.
    // (count, decimal sum) form an abelian group, so a retraction folds
    // in as its exact inverse and the maintained state bit-equals the
    // recompute over surviving rows — which is precisely what the
    // oracle states: a plain GROUP BY over events minus the
    // deterministically-deleted subset. Batch membership and the
    // delete set come from the portable hash family, so the replay is
    // engine-independent.
    QueryDef("q190_retractable_agg",
      (s, dir) => {
        import graft.etl.IncrementalAgg
        val ev = t(s, dir, "events")
          .withColumn("b",
            Shingles.baseHash(col("event_id").cast("string")))
          .localCheckpoint()
        val batch1 = ev.filter(col("b") % 2 === 0)
        val batch2 = ev.filter(col("b") % 2 === 1)
        val deletes = ev.filter(col("b") % 10 === 0)
        val st0 = IncrementalAgg.partial(batch1, Seq("event_type"),
          col("value"))
        val st1 = IncrementalAgg.applyDelta(st0, batch2, deletes,
          Seq("event_type"), col("value"))
        IncrementalAgg.finish(st1, Seq("event_type"))
          .orderBy("event_type")
      },
      Some(s"""WITH surv AS (SELECT event_type, value FROM events
          WHERE ('0x' || substr(md5(CAST(event_id AS VARCHAR)), 1, 7))
            ::BIGINT % 10 <> 0)
        SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n,
          ${dsumSql("value")} AS total,
          ${dsumSql("value")} / COUNT(*) AS avg_value
        FROM surv GROUP BY event_type ORDER BY event_type""")),

    // ── KMV as a first-class Catalyst aggregate (q191) ─────────────────
    // q73's per-group sketch re-expressed as a native
    // TypedImperativeAggregate: the bottom-k set IS the aggregation
    // buffer, so map-side partial aggregation, hash-aggregate
    // placement, and AQE shuffle planning all come from the engine —
    // no custom operator needed, and `graft_kmv(...)` works anywhere a
    // built-in aggregate does (including SQL). Same hash family, same
    // estimator, same oracle as q73 — proving operator-formulation vs
    // aggregate-formulation agree bit-for-bit.
    QueryDef("q191_kmv_native_agg",
      (s, dir) => t(s, dir, "events")
        .groupBy("event_type")
        .agg(graft.functions.KmvSketchAgg.kmvAgg(
          col("user_id").cast("string"), kmvK).as("sk"))
        .select(col("event_type"), col("sk.k_actual"),
          col("sk.kth_hash"), col("sk.distinct_estimate"))
        .orderBy("event_type"),
      Some(s"""WITH h AS (SELECT DISTINCT event_type,
          ('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 7))::BIGINT
            AS h
          FROM events),
        r AS (SELECT event_type, h,
          row_number() OVER (PARTITION BY event_type ORDER BY h ASC)
            AS rn
          FROM h)
        SELECT event_type, COUNT(*) AS k_actual, max(h) AS kth_hash,
          CASE WHEN COUNT(*) < $kmvK THEN CAST(COUNT(*) AS DOUBLE)
          ELSE CAST(COUNT(*) - 1 AS DOUBLE) * CAST(268435456.0 AS DOUBLE)
               / CAST(max(h) AS DOUBLE) END AS distinct_estimate
        FROM r WHERE rn <= $kmvK GROUP BY event_type
        ORDER BY event_type""")),

    // ── Backfill planner / partition-completeness audit (q192) ─────────
    // The ops question every daily pipeline answers before a rerun:
    // which partitions are MISSING (calendar day with no rows) and
    // which are PARTIAL (volume < half the per-day average — a
    // truncated load)? The calendar grid generates from one 1-row
    // bounds aggregate (no date-dim scan), the verdict is a
    // cross-multiplied integer comparison (2·c·ndays < total — no
    // float average), and the whole audit is one per-day groupBy plus
    // a broadcast of the bounded day grid.
    QueryDef("q192_backfill_plan",
      (s, dir) => {
        val pd = t(s, dir, "events")
          .select(expr("unix_micros(ts) div 86400000000").as("day"))
          .groupBy("day").agg(count(lit(1)).as("c"))
          .localCheckpoint()
        val bounds = pd.agg(min("day").as("mind"), max("day").as("maxd"),
          sum("c").as("total"), count(lit(1)).as("ndays"))
        val grid = bounds.select(
          explode(sequence(col("mind"), col("maxd"))).as("day"),
          col("total"), col("ndays"))
        grid.join(pd, Seq("day"), "left")
          .select(col("day"),
            coalesce(col("c"), lit(0L)).as("n_rows"),
            when(col("c").isNull, lit("missing"))
              .when(lit(2L) * col("c") * col("ndays") < col("total"),
                lit("partial"))
              .otherwise(lit("ok")).as("status"))
          .orderBy("day")
      },
      Some("""WITH pd AS (SELECT epoch_us(ts) // 86400000000 AS day,
            COUNT(*) AS c
          FROM events GROUP BY 1),
        b AS (SELECT MIN(day) AS mind, MAX(day) AS maxd,
            SUM(c) AS total, COUNT(*) AS ndays FROM pd),
        grid AS (SELECT unnest(range(mind, maxd + 1)) AS gday,
            total, ndays FROM b)
        SELECT grid.gday AS day, CAST(COALESCE(pd.c, 0) AS BIGINT)
          AS n_rows,
          CASE WHEN pd.c IS NULL THEN 'missing'
               WHEN 2 * pd.c * ndays < total THEN 'partial'
               ELSE 'ok' END AS status
        FROM grid LEFT JOIN pd ON grid.gday = pd.day
        ORDER BY day""")),

    // ── CDC log compaction (q193) ──────────────────────────────────────
    // The upsert/delete log → snapshot primitive (Kafka log
    // compaction / CDF apply), distinct from SCD2 which KEEPS history:
    // per key take the latest operation in (ts, event_id) total order;
    // the key survives iff that operation is an upsert. One ranking
    // window per key, no join, no state. The log is synthesized
    // deterministically from events (op = delete on an md5 gate) so
    // the oracle replays the identical compaction.
    QueryDef("q193_cdc_compaction",
      (s, dir) => {
        val log = t(s, dir, "events").select(
          col("user_id").as("k"),
          when(Shingles.baseHash(col("event_id").cast("string"))
            % 7 === 0, lit("D")).otherwise(lit("U")).as("op"),
          unix_micros(col("ts")).as("us"), col("event_id"),
          col("value"))
        val w = Window.partitionBy("k")
          .orderBy(col("us").desc, col("event_id").desc)
        log.withColumn("rn", row_number().over(w))
          .filter(col("rn") === 1 && col("op") === "U")
          .select(col("k").as("user_id"), col("us").as("last_us"),
            col("value").as("last_value"))
          .orderBy("user_id")
      },
      Some("""WITH log AS (SELECT user_id AS k,
            CASE WHEN ('0x' || substr(md5(CAST(event_id AS VARCHAR)),
              1, 7))::BIGINT % 7 = 0 THEN 'D' ELSE 'U' END AS op,
            epoch_us(ts) AS us, event_id, value
          FROM events),
        rk AS (SELECT k, op, us, value, row_number() OVER (
            PARTITION BY k ORDER BY us DESC, event_id DESC) AS rn
          FROM log)
        SELECT k AS user_id, CAST(us AS BIGINT) AS last_us,
          value AS last_value
        FROM rk WHERE rn = 1 AND op = 'U' ORDER BY user_id""")),

    // ── Deterministic Poisson bootstrap (q194) ─────────────────────────
    // Uncertainty for a mean WITHOUT distributional assumptions — the
    // production-stats workhorse, in the online/Poisson form that
    // needs no resample-by-index (Chamandy et al., "Estimating
    // uncertainty for massive data streams", 2012): each row gets a
    // per-replicate weight ~Poisson(1), here drawn DETERMINISTICALLY
    // from the md5 family (P(0), P(1), P(2), P(3) thresholds on a
    // 10000-grid), so both engines build the identical 32 replicates.
    // Replicate means use decimal sums; the 90%-ish band is the 2nd
    // smallest / 2nd largest replicate mean — rank-based, no
    // interpolation. One ×B map-side expansion, two partial-agg
    // shuffles, a 32-row-per-group rank window.
    QueryDef("q194_bootstrap_ci",
      (s, dir) => {
        val B = 32
        val ev = t(s, dir, "events").select(col("event_type"),
          col("event_id"), col("value"))
        val point = ev.groupBy("event_type")
          .agg(davg(col("value")).as("point_mean"))
        val rep = ev
          .select(col("event_type"), col("event_id"), col("value"),
            explode(array((0 until B).map(lit(_)): _*)).as("b"))
          .withColumn("h", Shingles.baseHash(concat(col("b").cast("string"),
            lit("|"), col("event_id").cast("string"))) % 10000)
          .withColumn("w",
            when(col("h") < 3679, 0L).when(col("h") < 7358, 1L)
              .when(col("h") < 9197, 2L).otherwise(3L))
          .groupBy("event_type", "b")
          .agg((dsum(col("w") * col("value")) /
            sum(col("w"))).as("rep_mean"))
        val wAsc = Window.partitionBy("event_type")
          .orderBy(col("rep_mean").asc)
        val wDesc = Window.partitionBy("event_type")
          .orderBy(col("rep_mean").desc)
        rep
          .withColumn("ra", row_number().over(wAsc))
          .withColumn("rd", row_number().over(wDesc))
          .groupBy("event_type")
          .agg(count(lit(1)).as("n_replicates"),
            max(when(col("ra") === 2, col("rep_mean"))).as("boot_lo"),
            max(when(col("rd") === 2, col("rep_mean"))).as("boot_hi"))
          .join(point, "event_type")
          .select(col("event_type"), col("n_replicates"),
            col("point_mean"), col("boot_lo"), col("boot_hi"))
          .orderBy("event_type")
      },
      Some(s"""WITH rep AS (SELECT event_type, b,
            ${dsumSql("w * value")} / SUM(w) AS rep_mean
          FROM (SELECT event_type, value, b,
              CASE WHEN h < 3679 THEN 0 WHEN h < 7358 THEN 1
                   WHEN h < 9197 THEN 2 ELSE 3 END AS w
            FROM (SELECT event_type, value, r.b,
                ('0x' || substr(md5(r.b::VARCHAR || '|' ||
                  event_id::VARCHAR), 1, 7))::BIGINT % 10000 AS h
              FROM events CROSS JOIN
                (SELECT unnest(range(0, 32)) AS b) r))
          GROUP BY 1, 2),
        rk AS (SELECT event_type, rep_mean,
            row_number() OVER (PARTITION BY event_type
              ORDER BY rep_mean ASC) AS ra,
            row_number() OVER (PARTITION BY event_type
              ORDER BY rep_mean DESC) AS rd
          FROM rep),
        band AS (SELECT event_type,
            CAST(COUNT(*) AS BIGINT) AS n_replicates,
            MAX(CASE WHEN ra = 2 THEN rep_mean END) AS boot_lo,
            MAX(CASE WHEN rd = 2 THEN rep_mean END) AS boot_hi
          FROM rk GROUP BY 1),
        pt AS (SELECT event_type,
            ${dsumSql("value")} / COUNT(value) AS point_mean
          FROM events GROUP BY 1)
        SELECT band.event_type, n_replicates, point_mean,
          boot_lo, boot_hi
        FROM band JOIN pt USING (event_type)
        ORDER BY event_type""")),

    // ── Sequential-pattern support (q195) ──────────────────────────────
    // Subsequence patterns "a … then … b" with ANY gap — what the
    // adjacent-only Markov matrix (q111) cannot see: a user supports
    // (a, b) iff some a-event precedes some b-event, i.e.
    // min_ts(a) < max_ts(b). One (user, type) min/max aggregation,
    // then a per-user pair join over the BOUNDED type set (≤ |types|²
    // pairs per user), then a count — the PrefixSpan depth-2 scan
    // without a sequence explosion.
    QueryDef("q195_seq_patterns",
      (s, dir) => {
        val ut = t(s, dir, "events")
          .groupBy(col("user_id"), col("event_type"))
          .agg(min(unix_micros(col("ts"))).as("mn"),
            max(unix_micros(col("ts"))).as("mx"))
          .localCheckpoint()
        val users = ut.select("user_id").distinct()
          .agg(count(lit(1)).as("n_users"))
        ut.select(col("user_id"), col("event_type").as("a"),
            col("mn").as("mn_a"))
          .join(ut.select(col("user_id"), col("event_type").as("b"),
            col("mx").as("mx_b")), Seq("user_id"))
          .filter(col("a") =!= col("b") && col("mn_a") < col("mx_b"))
          .groupBy("a", "b").agg(count(lit(1)).as("n_supporting"))
          .crossJoin(broadcast(users))
          .select(col("a"), col("b"), col("n_supporting"),
            (col("n_supporting").cast("double") / col("n_users"))
              .as("support"))
          .orderBy("a", "b")
      },
      Some("""WITH ut AS (SELECT user_id, event_type,
            MIN(epoch_us(ts)) AS mn, MAX(epoch_us(ts)) AS mx
          FROM events GROUP BY 1, 2),
        n AS (SELECT COUNT(DISTINCT user_id) AS n_users FROM ut),
        sp AS (SELECT x.event_type AS a, y.event_type AS b,
            COUNT(*) AS n_supporting
          FROM ut x JOIN ut y ON x.user_id = y.user_id
            AND x.event_type <> y.event_type AND x.mn < y.mx
          GROUP BY 1, 2)
        SELECT a, b, CAST(n_supporting AS BIGINT) AS n_supporting,
          CAST(n_supporting AS DOUBLE) / n_users AS support
        FROM sp CROSS JOIN n ORDER BY a, b""")),

    // ── Personalized PageRank: seed-anchored relatedness (q196) ────────
    // q108's teleport mass redirected entirely to the highest-df seed
    // token — stationary scores become proximity-to-seed, the
    // query-expansion / related-terms primitive. Same fixed-point
    // integer loop, oracle replays the iterations as chained CTEs.
    QueryDef("q196_personalized_pagerank",
      (s, dir) => graft.ext.Search.personalizedPageRank(
        tPar(s, dir, "documents"), "doc_id", "text",
        trVocab, trDampNum, trDampDen, trIters, trScale),
      Some {
        def step(prev: String) =
          s"""SELECT v.token,
              CAST(CASE WHEN v.token = (SELECT token FROM seed)
                THEN (${trDampDen - trDampNum} * $trScale)
                  // $trDampDen ELSE 0 END
                + ($trDampNum * COALESCE(q.s, 0)) // $trDampDen
                AS BIGINT) AS r
            FROM v LEFT JOIN
              (SELECT e.dst, CAST(SUM((p.r * e.c) // w.w) AS BIGINT) AS s
               FROM e JOIN $prev p ON e.src = p.token
                 JOIN w ON e.src = w.src
               GROUP BY e.dst) q ON v.token = q.dst"""
        s"""WITH dt AS (SELECT DISTINCT doc_id, tok AS token
            FROM (SELECT doc_id, unnest($dTok) AS tok FROM documents)),
          vd AS (SELECT token, COUNT(*) AS df FROM dt
            GROUP BY 1 ORDER BY df DESC, token LIMIT $trVocab),
          v AS (SELECT token FROM vd),
          seed AS (SELECT token FROM vd
            ORDER BY df DESC, token LIMIT 1),
          vt AS (SELECT dt.doc_id, dt.token FROM dt JOIN v USING (token)),
          h AS (SELECT a.token AS src, b.token AS dst, COUNT(*) AS c
            FROM vt a JOIN vt b
              ON a.doc_id = b.doc_id AND a.token < b.token
            GROUP BY 1, 2),
          e AS (SELECT src, dst, c FROM h
            UNION ALL SELECT dst, src, c FROM h),
          w AS (SELECT src, SUM(c) AS w FROM e GROUP BY 1),
          r0 AS (SELECT token, CAST(CASE WHEN token =
              (SELECT token FROM seed) THEN $trScale ELSE 0 END
              AS BIGINT) AS r
            FROM v),
          r1 AS (${step("r0")}),
          r2 AS (${step("r1")}),
          r3 AS (${step("r2")})
        SELECT token, CAST(r AS BIGINT) AS ppr_units,
          CAST(r AS DOUBLE) / $trScale AS ppr
        FROM r3 ORDER BY ppr_units DESC, token"""
      }),

    // ── Seasonal decomposition of daily volume (q197) ──────────────────
    // The classical additive decomposition (trend + seasonal +
    // residual) without loess: trend = centered 7-day moving average
    // (null at the edges — exactly-7-row frames only), seasonal = the
    // per-weekday decimal-exact mean of the detrended series, residual
    // = what's left. Heavy lifting is ONE per-day aggregation; every
    // window after that runs on the bounded day table. The monitoring
    // twin of q138's anomaly flags — this one yields the components.
    QueryDef("q197_seasonal_decompose",
      (s, dir) => {
        val pd = t(s, dir, "events")
          .select(expr("unix_micros(ts) div 86400000000").as("day"))
          .groupBy("day").agg(count(lit(1)).as("volume"))
          .localCheckpoint()
        val w7 = boundedWindow("day").rowsBetween(-3, 3)
        val withTrend = pd
          .withColumn("trend",
            when(count(lit(1)).over(w7) === 7,
              sum("volume").over(w7).cast("double") / 7))
          .withColumn("wd", pmod(col("day"), lit(7L)))
        val seasonal = withTrend.filter(col("trend").isNotNull)
          .groupBy("wd")
          .agg(davg(col("volume") - col("trend")).as("seasonal"))
        withTrend.join(broadcast(seasonal), "wd")
          .select(col("day"), col("volume"), col("trend"),
            col("seasonal"),
            (col("volume") - col("trend") - col("seasonal"))
              .as("residual"))
          .orderBy("day")
      },
      Some(s"""WITH pd AS (SELECT epoch_us(ts) // 86400000000 AS day,
            COUNT(*) AS volume
          FROM events GROUP BY 1),
        tr AS (SELECT day, volume,
            CASE WHEN COUNT(*) OVER w = 7
              THEN CAST(SUM(volume) OVER w AS DOUBLE) / 7 END AS trend,
            day % 7 AS wd
          FROM pd WINDOW w AS (ORDER BY day
            ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING)),
        se AS (SELECT wd,
            ${dsumSql("volume - trend")} / COUNT(*) AS seasonal
          FROM tr WHERE trend IS NOT NULL GROUP BY wd)
        SELECT day, CAST(volume AS BIGINT) AS volume, trend, seasonal,
          volume - trend - seasonal AS residual
        FROM tr JOIN se USING (wd) ORDER BY day""")),

    // ── Golden-record merge (q198) ─────────────────────────────────────
    // The SELECT step after entity resolution (q164 scoring → q166
    // clustering): one surviving record per entity with PER-ATTRIBUTE
    // survivorship rules — mode-with-pinned-tie for the categorical
    // (q167's contract), DISCRETE lower median for the numeric (a data
    // value, no interpolation — q107's contract), min for the price.
    // Every window spans one bounded entity cluster; the expensive
    // parts (pair scoring, clustering) reuse the linkage machinery.
    QueryDef("q198_golden_record",
      (s, dir) => {
        // same clique-collapsed edge set as q166 — identical closure,
        // ~3·|part| edges instead of the quadratic accepted pair set
        val pairs = fsMatchStarEdges(s, dir)
        val members = Dedup.dedupClustersStar(pairs)
          .select(col("id").as("p_partkey"), col("cluster"))
          .join(t(s, dir, "part"), "p_partkey")
          .localCheckpoint()
        val n = members.groupBy("cluster")
          .agg(count(lit(1)).as("n_members"),
            min("p_retailprice").as("min_price"))
        val modeType = members.groupBy("cluster", "p_type")
          .agg(count(lit(1)).as("c"))
          .withColumn("rn", row_number().over(Window
            .partitionBy("cluster")
            .orderBy(desc("c"), col("p_type"))))
          .filter(col("rn") === 1)
          .select(col("cluster"), col("p_type").as("canonical_type"))
        val medSize = members
          .withColumn("rk", row_number().over(Window
            .partitionBy("cluster")
            .orderBy(col("p_size"), col("p_partkey"))))
          .withColumn("nn", count(lit(1)).over(Window
            .partitionBy("cluster")))
          .filter(col("rk") === expr("(nn + 1) div 2"))
          .select(col("cluster"), col("p_size").as("median_size"))
        n.join(modeType, "cluster").join(medSize, "cluster")
          .select(col("cluster"), col("n_members"),
            col("canonical_type"), col("median_size"), col("min_price"))
          .orderBy("cluster")
      },
      Some(s"""WITH RECURSIVE $dFsCtes,
        m AS (SELECT id_a, id_b FROM scored WHERE score >= $fsMinScore),
        edges AS (SELECT id_a AS u, id_b AS v FROM m
                  UNION SELECT id_b, id_a FROM m),
        nodes AS (SELECT DISTINCT u AS id FROM edges),
        reach(id, r) AS (
          SELECT id, id FROM nodes
          UNION
          SELECT rr.id, e.v FROM reach rr JOIN edges e ON rr.r = e.u),
        lab AS (SELECT id, MIN(r) AS cluster FROM reach GROUP BY id),
        mem AS (SELECT lab.cluster, p.p_partkey, p.p_type, p.p_size,
            p.p_retailprice
          FROM lab JOIN part p ON lab.id = p.p_partkey),
        n AS (SELECT cluster, COUNT(*) AS n_members,
            MIN(p_retailprice) AS min_price FROM mem GROUP BY 1),
        mt AS (SELECT cluster, p_type AS canonical_type FROM (
          SELECT cluster, p_type, row_number() OVER (
              PARTITION BY cluster ORDER BY COUNT(*) DESC, p_type)
            AS rn
          FROM mem GROUP BY cluster, p_type) WHERE rn = 1),
        ms AS (SELECT cluster, p_size AS median_size FROM (
          SELECT cluster, p_size, row_number() OVER (
              PARTITION BY cluster ORDER BY p_size, p_partkey) AS rk,
            COUNT(*) OVER (PARTITION BY cluster) AS nn
          FROM mem) WHERE rk = (nn + 1) // 2)
        SELECT cluster, CAST(n_members AS BIGINT) AS n_members,
          canonical_type, median_size, min_price
        FROM n JOIN mt USING (cluster) JOIN ms USING (cluster)
        ORDER BY cluster""")),

    // ── Period-over-period report (q199) ───────────────────────────────
    // The BI staple: week-over-week revenue change per nation —
    // decimal-exact weekly revenue, one lag window per nation over the
    // BOUNDED (nation, week) aggregate, delta and pct_change as single
    // IEEE ops, weekly rank of deltas for the movers board. The fact
    // table is touched once.
    QueryDef("q199_wow_report",
      (s, dir) => {
        val wk = t(s, dir, "orders")
          .join(t(s, dir, "customer"),
            col("o_custkey") === col("c_custkey"))
          .join(broadcast(t(s, dir, "nation")),
            col("c_nationkey") === col("n_nationkey"))
          .groupBy(col("n_name"), expr(
            "unix_micros(cast(o_orderdate as timestamp))" +
              " div 604800000000").as("week"))
          .agg(dsum(col("o_totalprice")).as("revenue"))
        val wLag = Window.partitionBy("n_name").orderBy("week")
        val withDelta = wk
          .withColumn("prev_revenue", lag("revenue", 1).over(wLag))
          .withColumn("delta", col("revenue") - col("prev_revenue"))
          .withColumn("pct_change",
            (col("revenue") - col("prev_revenue")) / col("prev_revenue"))
        withDelta
          .withColumn("week_rank", when(col("delta").isNotNull,
            row_number().over(Window.partitionBy("week")
              .orderBy(desc("delta"), col("n_name")))).cast("long"))
          .select("n_name", "week", "revenue", "prev_revenue", "delta",
            "pct_change", "week_rank")
          .orderBy("n_name", "week")
      },
      Some {
        // Spark ranks only rows with a delta (rows_between excludes the
        // first week per nation from the movers board)
        s"""WITH wk AS (SELECT n_name,
            epoch_us(o_orderdate) // 604800000000 AS week,
            ${dsumSql("o_totalprice")} AS revenue
          FROM orders
          JOIN customer ON o_custkey = c_custkey
          JOIN nation ON c_nationkey = n_nationkey
          GROUP BY 1, 2),
        d AS (SELECT n_name, week, revenue,
            lag(revenue) OVER (PARTITION BY n_name ORDER BY week)
              AS prev_revenue
          FROM wk)
        SELECT n_name, week, revenue, prev_revenue,
          revenue - prev_revenue AS delta,
          (revenue - prev_revenue) / prev_revenue AS pct_change,
          CASE WHEN prev_revenue IS NOT NULL THEN
            CAST(row_number() OVER (PARTITION BY week,
                (prev_revenue IS NOT NULL)
              ORDER BY revenue - prev_revenue DESC, n_name) AS BIGINT)
          END AS week_rank
        FROM d ORDER BY n_name, week"""
      }),

    // ── Corpus dataset card (q200) ─────────────────────────────────────
    // The one-row summary a training-data release ships with: corpus
    // size, token mass, vocabulary, language/source breadth, exact
    // duplicate rate, mean document length. Each number is an exact
    // aggregate the suite already trusts; the card is one scan of the
    // corpus plus the token pass.
    QueryDef("q200_dataset_card",
      (s, dir) => {
        val d = tPar(s, dir, "documents").localCheckpoint()
        val base = d.agg(
          count(lit(1)).as("n_docs"),
          countDistinct("lang").as("n_langs"),
          countDistinct("source").as("n_sources"),
          sum("n_chars").as("total_chars"),
          (dsum(col("n_chars")) / count(lit(1))).as("mean_chars"))
        val toks = d.select(explode(TextStats.tokens(col("text")))
            .as("token"))
          .agg(count(lit(1)).as("total_tokens"),
            countDistinct("token").as("vocab"))
        val dups = d.groupBy(md5(col("text")).as("h"))
          .agg(count(lit(1)).as("c"))
          .agg(sum(col("c") - 1).as("n_exact_dups"))
        base.crossJoin(toks).crossJoin(dups)
      },
      Some(s"""SELECT
          (SELECT CAST(COUNT(*) AS BIGINT) FROM documents) AS n_docs,
          (SELECT CAST(COUNT(DISTINCT lang) AS BIGINT) FROM documents)
            AS n_langs,
          (SELECT CAST(COUNT(DISTINCT source) AS BIGINT) FROM documents)
            AS n_sources,
          (SELECT CAST(SUM(n_chars) AS BIGINT) FROM documents)
            AS total_chars,
          (SELECT ${dsumSql("n_chars")} / COUNT(*) FROM documents)
            AS mean_chars,
          (SELECT CAST(COUNT(*) AS BIGINT) FROM
            (SELECT unnest($dTok) FROM documents)) AS total_tokens,
          (SELECT CAST(COUNT(DISTINCT token) AS BIGINT) FROM
            (SELECT unnest($dTok) AS token FROM documents)) AS vocab,
          (SELECT CAST(SUM(c - 1) AS BIGINT) FROM
            (SELECT md5(text) AS h, COUNT(*) AS c FROM documents
             GROUP BY 1)) AS n_exact_dups""")),

    // ── Split-conformal prediction bands (q201) ────────────────────────
    // Distribution-free intervals with finite-sample guarantees
    // (Vovk et al.; the q194 bootstrap's rigorous cousin): a hash-split
    // "training" half fits the per-type decimal-exact mean, the
    // calibration half's nonconformity scores |v − mean| feed the
    // EXACT p90 engine (q144 machinery, quantile_cont parity), and the
    // band mean ± q is then audited for coverage on the held-out
    // training half — real coverage vs the nominal 90%, as one exact
    // count ratio. Two scans, one quantile refinement, no sort.
    QueryDef("q201_conformal_band",
      (s, dir) => {
        val ev = t(s, dir, "events")
          .withColumn("cal",
            Shingles.baseHash(col("event_id").cast("string")) % 2 === 1)
          .localCheckpoint()
        val means = ev.filter(!col("cal")).groupBy("event_type")
          .agg(davg(col("value")).as("mean_v"),
            count(lit(1)).as("n_train"))
        val scores = ev.filter(col("cal"))
          .join(broadcast(means), "event_type")
          .select(col("event_type"),
            abs(col("value") - col("mean_v")).as("score"))
        val q90 = graft.ext.Stats.exactQuantilesByGroup(
          scores, "event_type", "score", Seq(0.9),
          buckets = 64, tail = 64)
          .select(col("event_type"), col("n").as("n_cal"),
            col("quantile").as("q90"))
        val band = means.join(q90, "event_type")
          .withColumn("lo", col("mean_v") - col("q90"))
          .withColumn("hi", col("mean_v") + col("q90"))
        val cover = ev.filter(!col("cal"))
          .join(broadcast(band.select("event_type", "lo", "hi")),
            "event_type")
          .groupBy("event_type")
          .agg(sum(when(col("value") >= col("lo") &&
            col("value") <= col("hi"), 1L).otherwise(0L)).as("n_in"))
        band.join(cover, "event_type")
          .select(col("event_type"), col("n_train"), col("n_cal"),
            col("mean_v"), col("q90"), col("lo"), col("hi"),
            (col("n_in").cast("double") / col("n_train"))
              .as("coverage_train"))
          .orderBy("event_type")
      },
      Some(s"""WITH ev AS (SELECT event_type, value,
            ('0x' || substr(md5(CAST(event_id AS VARCHAR)), 1, 7))
              ::BIGINT % 2 = 1 AS cal
          FROM events),
        m AS (SELECT event_type,
            ${dsumSql("value")} / COUNT(value) AS mean_v,
            CAST(COUNT(*) AS BIGINT) AS n_train
          FROM ev WHERE NOT cal GROUP BY 1),
        sc AS (SELECT ev.event_type, abs(value - mean_v) AS score
          FROM ev JOIN m USING (event_type) WHERE cal),
        q AS (SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_cal,
            quantile_cont(score, 0.9) AS q90
          FROM sc GROUP BY 1),
        band AS (SELECT m.event_type, n_train, n_cal, mean_v, q90,
            mean_v - q90 AS lo, mean_v + q90 AS hi
          FROM m JOIN q USING (event_type)),
        cov AS (SELECT ev.event_type,
            SUM(CASE WHEN value >= lo AND value <= hi THEN 1 ELSE 0 END)
              AS n_in
          FROM ev JOIN band USING (event_type) WHERE NOT cal
          GROUP BY 1)
        SELECT band.event_type, n_train, n_cal, mean_v, q90, lo, hi,
          CAST(n_in AS DOUBLE) / n_train AS coverage_train
        FROM band JOIN cov USING (event_type)
        ORDER BY event_type""")),

    // ── Count-min as a native Catalyst aggregate (q202) ────────────────
    // q113's grid built by `graft_cms`, the second first-class sketch
    // aggregate after q191: the depth×width counter array IS the
    // aggregation buffer, merge is element-wise addition, so each map
    // task ships ONE bounded grid instead of its token stream — the
    // operator-level q113 pays a (token, j) exchange; this pays
    // grids-per-task. Identical bucket family ⇒ the oracle replays
    // every counter; non-zero cells emitted as (j, bucket, c) rows.
    QueryDef("q202_cms_native_agg",
      (s, dir) => tPar(s, dir, "documents")
        .select(explode(TextStats.tokens(col("text"))).as("token"))
        .agg(graft.functions.CmsSketchAgg.cmsAgg(
          col("token"), cmsDepth, cmsWidth).as("grid"))
        .select(posexplode(col("grid")).as(Seq("idx", "c")))
        .filter(col("c") > 0)
        .select(expr(s"idx div $cmsWidth").as("j"),
          pmod(col("idx"), lit(cmsWidth)).cast("long").as("bucket"),
          col("c"))
        .orderBy("j", "bucket"),
      Some(s"""WITH tk AS (SELECT unnest($dTok) AS token FROM documents)
        SELECT j, ('0x' || substr(md5(j::VARCHAR || '|' || token), 1, 7))
            ::BIGINT % $cmsWidth AS bucket,
          COUNT(*) AS c
        FROM tk CROSS JOIN (SELECT unnest(range(0, $cmsDepth)) AS j)
        GROUP BY 1, 2 ORDER BY j, bucket""")),

    // ── Apriori triples: frequent 3-itemsets (q203) ────────────────────
    // q180 extended one level with the APRIORI prune: a brand triple
    // can only be frequent if all three of its pairs are, so candidate
    // generation semi-joins each extension step against the
    // broadcast-tiny frequent-pair set BEFORE counting — at scale this
    // is what keeps the 3-way expansion proportional to surviving
    // candidates, not (brands per order choose 3). Output is the
    // top-20 triples by support (rank-based — absolute triple support
    // thins as the catalog diversifies with scale, so a fixed relative
    // floor is the wrong contract), each with its three pair supports.
    QueryDef("q203_apriori_triples",
      (s, dir) => {
        // part-dim join deliberately unhinted — size-gated broadcast,
        // shuffled above the threshold (see q180)
        val ob = t(s, dir, "lineitem")
          .join(t(s, dir, "part"),
            col("l_partkey") === col("p_partkey"))
          .select(col("l_orderkey").as("ok"), col("p_brand").as("b"))
          .distinct()
          .localCheckpoint()
        val n = ob.select("ok").distinct().agg(count(lit(1)).as("n"))
        val fp = ob.select(col("ok"), col("b").as("pa"))
          .join(ob.select(col("ok"), col("b").as("pb")), Seq("ok"))
          .filter(col("pa") < col("pb"))
          .groupBy("pa", "pb").agg(count(lit(1)).as("s_pair"))
          .crossJoin(broadcast(n))
          .filter(col("s_pair") * basketDen >= col("n"))
          .select("pa", "pb", "s_pair")
          .localCheckpoint()
        def fpSemi(left: String, right: String) =
          broadcast(fp.select(col("pa").as(left), col("pb").as(right)))
        val tri = ob.select(col("ok"), col("b").as("a"))
          .join(ob.select(col("ok"), col("b").as("bb")), Seq("ok"))
          .filter(col("a") < col("bb"))
          .join(fpSemi("a", "bb"), Seq("a", "bb"), "left_semi")
          .join(ob.select(col("ok"), col("b").as("c")), Seq("ok"))
          .filter(col("bb") < col("c"))
          .join(fpSemi("bb", "c"), Seq("bb", "c"), "left_semi")
          .join(fpSemi("a", "c"), Seq("a", "c"), "left_semi")
          .groupBy("a", "bb", "c").agg(count(lit(1)).as("s_abc"))
          .orderBy(desc("s_abc"), col("a"), col("bb"), col("c"))
          .limit(20)
        tri
          .join(broadcast(fp.select(col("pa").as("a"),
            col("pb").as("bb"), col("s_pair").as("s_ab"))),
            Seq("a", "bb"))
          .join(broadcast(fp.select(col("pa").as("a"),
            col("pb").as("c"), col("s_pair").as("s_ac"))), Seq("a", "c"))
          .join(broadcast(fp.select(col("pa").as("bb"),
            col("pb").as("c"), col("s_pair").as("s_bc"))),
            Seq("bb", "c"))
          .select(col("a").as("brand_a"), col("bb").as("brand_b"),
            col("c").as("brand_c"), col("s_abc"), col("s_ab"),
            col("s_ac"), col("s_bc"))
          .orderBy(desc("s_abc"), col("brand_a"), col("brand_b"),
            col("brand_c"))
      },
      Some(s"""WITH ob AS (SELECT DISTINCT l.l_orderkey AS ok,
            p.p_brand AS b
          FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey),
        n AS (SELECT COUNT(DISTINCT ok) AS n FROM ob),
        fp AS (SELECT a.b AS pa, c.b AS pb, COUNT(*) AS s_pair
          FROM ob a JOIN ob c ON a.ok = c.ok AND a.b < c.b
          GROUP BY 1, 2
          HAVING COUNT(*) * $basketDen >= (SELECT n FROM n)),
        tri AS (SELECT x.b AS a, y.b AS bb, z.b AS c,
            COUNT(*) AS s_abc
          FROM ob x
          JOIN ob y ON x.ok = y.ok AND x.b < y.b
          JOIN fp p1 ON p1.pa = x.b AND p1.pb = y.b
          JOIN ob z ON x.ok = z.ok AND y.b < z.b
          JOIN fp p2 ON p2.pa = y.b AND p2.pb = z.b
          JOIN fp p3 ON p3.pa = x.b AND p3.pb = z.b
          GROUP BY 1, 2, 3
          ORDER BY s_abc DESC, a, bb, c LIMIT 20)
        SELECT tri.a AS brand_a, tri.bb AS brand_b, tri.c AS brand_c,
          CAST(s_abc AS BIGINT) AS s_abc,
          CAST(p1.s_pair AS BIGINT) AS s_ab,
          CAST(p3.s_pair AS BIGINT) AS s_ac,
          CAST(p2.s_pair AS BIGINT) AS s_bc
        FROM tri
        JOIN fp p1 ON p1.pa = tri.a AND p1.pb = tri.bb
        JOIN fp p2 ON p2.pa = tri.bb AND p2.pb = tri.c
        JOIN fp p3 ON p3.pa = tri.a AND p3.pb = tri.c
        ORDER BY s_abc DESC, brand_a, brand_b, brand_c""")),

    // ── Inter-classifier agreement: Cohen's kappa (q204) ───────────────
    // Model-eval primitive: how much do the hashed linear classifier
    // (q176) and the heuristic quality gate (q21 ≥ ½) agree beyond
    // chance? The 2×2 agreement matrix is one map-only scan + one
    // 4-cell aggregate; kappa = (N·agree − Σ marginal products) /
    // (N² − Σ marginal products) carried in DECIMAL(38,0) integers so
    // only the final division is float — exact at any corpus size
    // where N² fits 38 digits.
    QueryDef("q204_cohens_kappa",
      (s, dir) => {
        def score(toks: Column): Column = aggregate(toks, lit(0L),
          (acc, tk) => {
            val b = Shingles.baseHash(tk) % fhDim
            acc + (Shingles.baseHash(concat(lit("w|"), b.cast("string")))
              % fhWMod - fhWOff)
          })
        val d = tPar(s, dir, "documents").select(
          (score(TextStats.tokens(col("text"))) >= 0).as("a"),
          (TextStats.qualityScore(col("text"), stopwords) >= 0.5)
            .as("b"))
        val cells = d.agg(
          sum(when(col("a") && col("b"), 1L).otherwise(0L)).as("n11"),
          sum(when(col("a") && !col("b"), 1L).otherwise(0L)).as("n10"),
          sum(when(!col("a") && col("b"), 1L).otherwise(0L)).as("n01"),
          sum(when(!col("a") && !col("b"), 1L).otherwise(0L)).as("n00"))
        val dec = "decimal(38,0)"
        cells.select(col("n11"), col("n10"), col("n01"), col("n00"),
          ((
            (col("n11") + col("n10") + col("n01") + col("n00"))
              .cast(dec) * (col("n11") + col("n00")).cast(dec) -
            ((col("n11") + col("n10")).cast(dec) *
              (col("n11") + col("n01")).cast(dec) +
             (col("n01") + col("n00")).cast(dec) *
              (col("n10") + col("n00")).cast(dec))
          ).cast("double") /
          (
            (col("n11") + col("n10") + col("n01") + col("n00"))
              .cast(dec) * (col("n11") + col("n10") + col("n01") +
                col("n00")).cast(dec) -
            ((col("n11") + col("n10")).cast(dec) *
              (col("n11") + col("n01")).cast(dec) +
             (col("n01") + col("n00")).cast(dec) *
              (col("n10") + col("n00")).cast(dec))
          ).cast("double")).as("kappa"))
      },
      Some(s"""WITH lab AS (SELECT
            CAST(COALESCE(list_sum(list_transform($dTok, t ->
              ('0x' || substr(md5('w|' ||
                  (('0x' || substr(md5(t), 1, 7))::BIGINT % $fhDim)
                    ::VARCHAR), 1, 7))::BIGINT % $fhWMod - $fhWOff)), 0)
              AS BIGINT) >= 0 AS a,
            $dQualityExpr >= 0.5 AS b
          FROM documents),
        c AS (SELECT
            CAST(SUM(CASE WHEN a AND b THEN 1 ELSE 0 END) AS BIGINT)
              AS n11,
            CAST(SUM(CASE WHEN a AND NOT b THEN 1 ELSE 0 END) AS BIGINT)
              AS n10,
            CAST(SUM(CASE WHEN NOT a AND b THEN 1 ELSE 0 END) AS BIGINT)
              AS n01,
            CAST(SUM(CASE WHEN NOT a AND NOT b THEN 1 ELSE 0 END)
              AS BIGINT) AS n00
          FROM lab)
        SELECT n11, n10, n01, n00,
          CAST(CAST(n11 + n10 + n01 + n00 AS HUGEINT) * (n11 + n00)
              - ((n11 + n10) * CAST(n11 + n01 AS HUGEINT)
                 + (n01 + n00) * CAST(n10 + n00 AS HUGEINT))
            AS DOUBLE) /
          CAST(CAST(n11 + n10 + n01 + n00 AS HUGEINT)
              * (n11 + n10 + n01 + n00)
              - ((n11 + n10) * CAST(n11 + n01 AS HUGEINT)
                 + (n01 + n00) * CAST(n10 + n00 AS HUGEINT))
            AS DOUBLE) AS kappa
        FROM c""")),

    // ── Gains / lift table for the classifier (q205) ───────────────────
    // The model-eval companion of q204: docs bucketed into score
    // deciles by VALUE boundaries from the exact-quantile engine (the
    // q178 discipline — no global ntile sort; ties land in one bin
    // deterministically), response = the q21 quality gate, and the
    // gains table ranks deciles best-first with cumulative capture and
    // lift — exact integer counts, divisions only in the output
    // columns, the 10-row cumulative window costs nothing.
    QueryDef("q205_gains_table",
      (s, dir) => {
        def score(toks: Column): Column = aggregate(toks, lit(0L),
          (acc, tk) => {
            val b = Shingles.baseHash(tk) % fhDim
            acc + (Shingles.baseHash(concat(lit("w|"), b.cast("string")))
              % fhWMod - fhWOff)
          })
        val d = tPar(s, dir, "documents").select(
          score(TextStats.tokens(col("text"))).cast("double").as("sc"),
          when(TextStats.qualityScore(col("text"), stopwords) >= 0.5,
            1L).otherwise(0L).as("resp"))
          .withColumn("g", lit("all"))
          .localCheckpoint()
        val ps = (1 to 9).map(_ / 10.0)
        val bounds = graft.ext.Stats.exactQuantilesByGroup(
          d, "g", "sc", ps, buckets = 64, tail = 64)
          .collect().map(r => r.getDouble(1) -> r.getDouble(3)).toMap
        val decile = ps.map(p => (col("sc") > lit(bounds(p))).cast("int"))
          .foldLeft(lit(1))(_ + _).cast("long")
        val per = d.groupBy(decile.as("decile"))
          .agg(count(lit(1)).as("n_docs"), sum("resp").as("n_resp"))
        val w = boundedWindow(desc("decile"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        per
          .withColumn("cum_docs", sum("n_docs").over(w))
          .withColumn("cum_resp", sum("n_resp").over(w))
          .crossJoin(broadcast(d.agg(count(lit(1)).as("tot_docs"),
            sum("resp").as("tot_resp"))))
          .select(col("decile"), col("n_docs"), col("n_resp"),
            (col("n_resp").cast("double") / col("n_docs"))
              .as("resp_rate"),
            col("cum_docs"), col("cum_resp"),
            (col("cum_resp").cast("double") / col("tot_resp"))
              .as("gain"),
            ((col("cum_resp").cast("double") / col("cum_docs")) /
              (col("tot_resp").cast("double") / col("tot_docs")))
              .as("lift"))
          .orderBy(desc("decile"))
      },
      Some(s"""WITH d AS (SELECT
            CAST(CAST(COALESCE(list_sum(list_transform($dTok, t ->
              ('0x' || substr(md5('w|' ||
                  (('0x' || substr(md5(t), 1, 7))::BIGINT % $fhDim)
                    ::VARCHAR), 1, 7))::BIGINT % $fhWMod - $fhWOff)), 0)
              AS BIGINT) AS DOUBLE) AS sc,
            CASE WHEN $dQualityExpr >= 0.5 THEN 1 ELSE 0 END AS resp
          FROM documents),
        q AS (SELECT ${(1 to 9).map(i =>
            s"quantile_cont(sc, 0.$i) AS b$i").mkString(", ")} FROM d),
        a AS (SELECT 1 ${(1 to 9).map(i =>
            s"+ (sc > b$i)::INT").mkString(" ")} AS decile, resp
          FROM d CROSS JOIN q),
        per AS (SELECT decile, COUNT(*) AS n_docs, SUM(resp) AS n_resp
          FROM a GROUP BY decile),
        cum AS (SELECT decile, n_docs, n_resp,
            SUM(n_docs) OVER w AS cum_docs,
            SUM(n_resp) OVER w AS cum_resp
          FROM per WINDOW w AS (ORDER BY decile DESC
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
        tot AS (SELECT COUNT(*) AS tot_docs, SUM(resp) AS tot_resp
          FROM d)
        SELECT CAST(decile AS BIGINT) AS decile,
          CAST(n_docs AS BIGINT) AS n_docs,
          CAST(n_resp AS BIGINT) AS n_resp,
          CAST(n_resp AS DOUBLE) / n_docs AS resp_rate,
          CAST(cum_docs AS BIGINT) AS cum_docs,
          CAST(cum_resp AS BIGINT) AS cum_resp,
          CAST(cum_resp AS DOUBLE) / tot_resp AS gain,
          (CAST(cum_resp AS DOUBLE) / cum_docs) /
            (CAST(tot_resp AS DOUBLE) / tot_docs) AS lift
        FROM cum CROSS JOIN tot ORDER BY decile DESC""")),

    // ── kNN-graph: corpus×corpus top-k similarity JOIN (q206) ──────────
    // The missing ANN primitive next to the probe-based paths
    // (q30/q31/q37/q56/q85): EVERY vector is probe and indexed point at
    // once — the kNN-graph build behind semantic-dedup graphs and
    // link-prediction features. IVF-cell-blocked (no all-pairs): one
    // map-only assignment pass yields home cell (indexing) and probe
    // cells (element 1 / full array of the same nprobe-cell vector),
    // candidates are the cell equi-join, per-id top-k is the TopKPerKey
    // heap operator. Candidates per vector ≤ nprobe × cell size.
    QueryDef("q206_knn_graph",
      (s, dir) => {
        val e = tPar(s, dir, "embeddings")
        Similarity.knnGraph(e, "vec_id", "embedding", topK,
          nlist = 16, nprobe = 2)
          .orderBy("probe_id", "rank")
      },
      Some {
        def cos(a: String, b: String) =
          s"""(${dDot(a, b)}) / (sqrt(${dDot(a, a)}) * sqrt(${dDot(b, b)}))"""
        s"""WITH cents AS (
            SELECT vec_id AS cid, embedding AS cvec FROM embeddings
            ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id LIMIT 16),
          scored AS (
            SELECT e.vec_id, cid,
              ${cos("e.embedding", "cvec")} AS ccos
            FROM embeddings e CROSS JOIN cents),
          ranked AS (
            SELECT *, row_number() OVER (PARTITION BY vec_id
              ORDER BY ccos DESC, cid ASC) AS rn FROM scored),
          home AS (SELECT vec_id, cid AS cell FROM ranked WHERE rn = 1),
          probe AS (SELECT vec_id, cid AS cell FROM ranked WHERE rn <= 2),
          v AS (SELECT e.vec_id, e.embedding, cell
            FROM embeddings e JOIN home USING (vec_id)),
          pv AS (SELECT e.vec_id, e.embedding, cell
            FROM embeddings e JOIN probe USING (vec_id)),
          pairs AS (
            SELECT a.vec_id AS probe_id, b.vec_id AS nn_id,
              ${cos("a.embedding", "b.embedding")} AS cos
            FROM pv a JOIN v b ON a.cell = b.cell AND a.vec_id <> b.vec_id)
          SELECT probe_id, nn_id, cos, rank FROM (
            SELECT *, row_number() OVER (PARTITION BY probe_id
              ORDER BY cos DESC, nn_id ASC) AS rank FROM pairs)
          WHERE rank <= $topK ORDER BY probe_id, rank"""
      }),

    // ── Classifier eval: exact ROC-AUC from rank statistics (q207) ─────
    // The eval family next to gains (q205) and kappa (q204). AUC is the
    // Mann-Whitney normalization: (Σ midranks of positives −
    // np(np+1)/2) / (np·nn) — computed WITHOUT a global sort or a
    // per-row window. Rows collapse to the bounded (source, score)
    // aggregate (score is a 999-bucket hash); midranks come from one
    // prefix-count window over that aggregate; the whole thing is
    // integer arithmetic with ONE final division per group, so it is
    // bit-exact on both engines at any scale. Ties get textbook
    // midranks: a score group of n_g rows after cb smaller rows
    // contributes p_g·(2·cb + n_g + 1) to 2·Σranks.
    QueryDef("q207_roc_auc",
      (s, dir) => {
        val d = tPar(s, dir, "documents").select(
          col("source"),
          (Shingles.baseHash(col("text")) % 999).as("m"),
          when(TextStats.qualityScore(col("text"), stopwords) >= 0.5,
            1L).otherwise(0L).as("y"))
        val per = d.groupBy("source", "m")
          .agg(count(lit(1)).as("n_g"), sum("y").as("p_g"))
        val w = Window.partitionBy("source").orderBy("m")
          .rowsBetween(Window.unboundedPreceding, -1)
        per.withColumn("cb", coalesce(sum("n_g").over(w), lit(0L)))
          .groupBy("source")
          .agg(sum(col("p_g") * (lit(2) * col("cb") + col("n_g") + lit(1)))
            .as("s2"),
            sum("p_g").as("np"), sum("n_g").as("n"))
          .withColumn("nn", col("n") - col("np"))
          .filter(col("np") > 0 && col("nn") > 0)
          .select(col("source"), col("np"), col("nn"),
            ((col("s2") - col("np") * (col("np") + lit(1))).cast("double") /
              (lit(2) * col("np") * col("nn")).cast("double")).as("auc"))
          .orderBy("source")
      },
      Some(s"""WITH d AS (SELECT source,
            ('0x' || substr(md5(text), 1, 7))::BIGINT % 999 AS m,
            CASE WHEN $dQualityExpr >= 0.5 THEN 1 ELSE 0 END AS y
          FROM documents),
        per AS (SELECT source, m, COUNT(*) AS n_g, SUM(y) AS p_g
          FROM d GROUP BY 1, 2),
        cum AS (SELECT source, m, n_g, p_g,
            COALESCE(SUM(n_g) OVER (PARTITION BY source ORDER BY m
              ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cb
          FROM per),
        g AS (SELECT source,
            SUM(p_g * (2 * cb + n_g + 1)) AS s2,
            SUM(p_g) AS np, SUM(n_g) AS n
          FROM cum GROUP BY 1)
        SELECT source, CAST(np AS BIGINT) AS np,
          CAST(n - np AS BIGINT) AS nn,
          CAST(s2 - np * (np + 1) AS DOUBLE)
            / CAST(2 * np * (n - np) AS DOUBLE) AS auc
        FROM g WHERE np > 0 AND n - np > 0 ORDER BY source""")),

    // ── Calibration / reliability table (q208) ─────────────────────────
    // Per (source, decile-of-predicted-probability) bin: count, mean
    // predicted probability, observed positive rate, and the gap. The
    // prediction is the deterministic 999-bucket hash scaled to [0,1),
    // so every cell is an integer ratio — mean_pred = Σm/(999·n_b) and
    // frac_pos = Σy/n_b are single correctly-rounded divisions, exact
    // on both engines at any scale. One map-only scan + one bounded
    // (source × 10)-key aggregation.
    QueryDef("q208_calibration",
      (s, dir) => {
        val d = tPar(s, dir, "documents").select(
          col("source"),
          (Shingles.baseHash(col("text")) % 999).as("m"),
          when(TextStats.qualityScore(col("text"), stopwords) >= 0.5,
            1L).otherwise(0L).as("y"))
        d.groupBy(col("source"), expr("m div 100").as("bin"))
          .agg(count(lit(1)).as("n_docs"), sum("m").as("sm"),
            sum("y").as("sy"))
          .select(col("source"), col("bin"), col("n_docs"),
            (col("sm").cast("double") /
              (lit(999L) * col("n_docs")).cast("double")).as("mean_pred"),
            (col("sy").cast("double") / col("n_docs").cast("double"))
              .as("frac_pos"))
          .withColumn("gap", abs(col("mean_pred") - col("frac_pos")))
          .orderBy("source", "bin")
      },
      Some(s"""WITH d AS (SELECT source,
            ('0x' || substr(md5(text), 1, 7))::BIGINT % 999 AS m,
            CASE WHEN $dQualityExpr >= 0.5 THEN 1 ELSE 0 END AS y
          FROM documents)
        SELECT source, m // 100 AS bin, CAST(COUNT(*) AS BIGINT) AS n_docs,
          CAST(SUM(m) AS DOUBLE) / CAST(999 * COUNT(*) AS DOUBLE)
            AS mean_pred,
          CAST(SUM(y) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) AS frac_pos,
          abs(CAST(SUM(m) AS DOUBLE) / CAST(999 * COUNT(*) AS DOUBLE)
            - CAST(SUM(y) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE)) AS gap
        FROM d GROUP BY 1, 2 ORDER BY source, bin""")),

    // ── Ranking eval: nDCG@10 per source (q209) ────────────────────────
    // The retrieval-quality metric for the search family (q71/q89):
    // docs ranked by the deterministic hash score, binary relevance =
    // the quality gate. Cross-engine float discipline: the 1/log2(i+1)
    // discounts are PRECOMPUTED 12-dp DECIMAL literals (log() at query
    // time would hash-diverge across libms — the q89 lesson), so DCG
    // and ideal DCG are exact decimal sums and nDCG is one final
    // double division. Top-10 per group via the TopKPerKey heap (no
    // global sort); the ideal DCG needs only the group's positive
    // count, a bounded aggregate.
    QueryDef("q209_ndcg",
      (s, dir) => {
        val disc = Seq("1.000000000000", "0.630929753571",
          "0.500000000000", "0.430676558073", "0.386852807235",
          "0.356207187108", "0.333333333333", "0.315464876786",
          "0.301029995664", "0.289064826318")
        val cumDisc = Seq("1.000000000000", "1.630929753571",
          "2.130929753571", "2.561606311645", "2.948459118879",
          "3.304666305987", "3.637999639321", "3.953464516106",
          "4.254494511770", "4.543559338088")
        def dlit(v: String) = expr(s"CAST($v AS DECIMAL(14,12))")
        val d = tPar(s, dir, "documents").select(
          col("source"), col("doc_id"),
          (Shingles.baseHash(col("text")) % 999).as("m"),
          when(TextStats.qualityScore(col("text"), stopwords) >= 0.5,
            1L).otherwise(0L).as("y"))
          .localCheckpoint()
        val top = graft.plans.TopKPerKey.topKPerKey(d, Seq("source"),
          Seq(graft.plans.TopKPerKey.Sort("m", asc = false),
            graft.plans.TopKPerKey.Sort("doc_id")), 10)
        val dAt = disc.zipWithIndex.tail.foldLeft(
          when(col("rank") === 1, dlit(disc.head))) {
          case (acc, (v, i)) => acc.when(col("rank") === i + 1, dlit(v))
        }
        val dcg = top
          .withColumn("g", when(col("y") === 1, dAt)
            .otherwise(expr("CAST(0 AS DECIMAL(14,12))")))
          .groupBy("source").agg(sum("g").as("dcg"))
        val cumAt = cumDisc.zipWithIndex.tail.foldLeft(
          when(col("k") === 1, dlit(cumDisc.head))) {
          case (acc, (v, i)) => acc.when(col("k") === i + 1, dlit(v))
        }
        val ideal = d.groupBy("source").agg(sum("y").as("np"))
          .filter(col("np") >= 1)
          .withColumn("k", least(col("np"), lit(10L)))
          .select(col("source"), col("np"), cumAt.as("idcg"))
        dcg.join(ideal, "source")
          .select(col("source"), col("np"),
            col("dcg").cast("double").as("dcg"),
            (col("dcg").cast("double") / col("idcg").cast("double"))
              .as("ndcg"))
          .orderBy("source")
      },
      Some {
        val disc = Seq("1.000000000000", "0.630929753571",
          "0.500000000000", "0.430676558073", "0.386852807235",
          "0.356207187108", "0.333333333333", "0.315464876786",
          "0.301029995664", "0.289064826318")
        val cumDisc = Seq("1.000000000000", "1.630929753571",
          "2.130929753571", "2.561606311645", "2.948459118879",
          "3.304666305987", "3.637999639321", "3.953464516106",
          "4.254494511770", "4.543559338088")
        val dCase = disc.zipWithIndex.map { case (v, i) =>
          s"WHEN ${i + 1} THEN CAST($v AS DECIMAL(14,12))" }
          .mkString("CASE rank ", " ", " END")
        val cCase = cumDisc.zipWithIndex.map { case (v, i) =>
          s"WHEN ${i + 1} THEN CAST($v AS DECIMAL(14,12))" }
          .mkString("CASE least(np, 10) ", " ", " END")
        s"""WITH d AS (SELECT source, doc_id,
            ('0x' || substr(md5(text), 1, 7))::BIGINT % 999 AS m,
            CASE WHEN $dQualityExpr >= 0.5 THEN 1 ELSE 0 END AS y
          FROM documents),
        ranked AS (SELECT source, y, row_number() OVER (
            PARTITION BY source ORDER BY m DESC, doc_id) AS rank
          FROM d),
        dcg AS (SELECT source,
            SUM(CASE WHEN y = 1 THEN $dCase
                ELSE CAST(0 AS DECIMAL(14,12)) END) AS dcg
          FROM ranked WHERE rank <= 10 GROUP BY source),
        ideal AS (SELECT source, CAST(SUM(y) AS BIGINT) AS np
          FROM d GROUP BY source HAVING SUM(y) >= 1),
        idcg AS (SELECT source, np, $cCase AS idcg FROM ideal)
        SELECT dcg.source, np, CAST(dcg AS DOUBLE) AS dcg,
          CAST(dcg AS DOUBLE) / CAST(idcg AS DOUBLE) AS ndcg
        FROM dcg JOIN idcg ON dcg.source = idcg.source
        ORDER BY dcg.source"""
      }),

    // ── Brier score + Murphy decomposition per source (q210) ───────────
    // Probability-forecast quality: exact Brier score from integer
    // moments — (Σm² − 2·999·Σmy + 999²·Σy) / (999²·n) is ONE division
    // of exact longs (y² = y) — plus the reliability / resolution /
    // uncertainty decomposition over the 10 calibration bins of q208.
    // Each bin term is a single division of integer numerators
    // ((Σm_b − 999·Σy_b)² and (n·Σy_b − n_b·Σy)²); the ≤10-term sums
    // go through the Parity.dsum decimal contract. Two bounded
    // aggregations + a per-source join of 10-row bin stats.
    QueryDef("q210_brier",
      (s, dir) => {
        val d = tPar(s, dir, "documents").select(
          col("source"),
          (Shingles.baseHash(col("text")) % 999).as("m"),
          when(TextStats.qualityScore(col("text"), stopwords) >= 0.5,
            1L).otherwise(0L).as("y"))
          .localCheckpoint()
        val tot = d.groupBy("source").agg(
          count(lit(1)).as("n"), sum("m").as("sm"),
          sum(col("m") * col("m")).as("smm"), sum("y").as("sy"),
          sum(col("m") * col("y")).as("smy"))
        val bins = d.groupBy(col("source"), expr("m div 100").as("bin"))
          .agg(count(lit(1)).as("n_b"), sum("m").as("sm_b"),
            sum("y").as("sy_b"))
        val terms = bins.join(tot, "source")
          // squares and denominator products happen in DOUBLE (the
          // long forms overflow near 1e5 docs/source under ANSI);
          // operation-for-operation identical in the oracle
          .select(col("source"),
            ((col("sm_b") - lit(999L) * col("sy_b")).cast("double") *
              (col("sm_b") - lit(999L) * col("sy_b")).cast("double"))
              ./(lit(998001.0) * col("n_b").cast("double") *
                col("n").cast("double"))
              .as("rel_t"),
            ((col("n") * col("sy_b") - col("n_b") * col("sy"))
              .cast("double") *
              (col("n") * col("sy_b") - col("n_b") * col("sy"))
                .cast("double"))
              ./(col("n_b").cast("double") * col("n").cast("double") *
                col("n").cast("double") * col("n").cast("double"))
              .as("res_t"))
          .groupBy("source")
          .agg(graft.functions.Parity.dsum(col("rel_t")).as("reliability"),
            graft.functions.Parity.dsum(col("res_t")).as("resolution"))
        tot.join(terms, "source")
          .select(col("source"), col("n"),
            ((col("smm") - lit(1998L) * col("smy") +
              lit(998001L) * col("sy")).cast("double") /
              (lit(998001L) * col("n")).cast("double")).as("brier"),
            ((col("sy") * (col("n") - col("sy"))).cast("double") /
              (col("n") * col("n")).cast("double")).as("uncertainty"),
            col("reliability"), col("resolution"))
          .orderBy("source")
      },
      Some(s"""WITH d AS (SELECT source,
            ('0x' || substr(md5(text), 1, 7))::BIGINT % 999 AS m,
            CASE WHEN $dQualityExpr >= 0.5 THEN 1 ELSE 0 END AS y
          FROM documents),
        tot AS (SELECT source, CAST(COUNT(*) AS BIGINT) AS n,
            CAST(SUM(m) AS BIGINT) AS sm, CAST(SUM(m * m) AS BIGINT) AS smm,
            CAST(SUM(y) AS BIGINT) AS sy, CAST(SUM(m * y) AS BIGINT) AS smy
          FROM d GROUP BY 1),
        bins AS (SELECT source, m // 100 AS bin,
            CAST(COUNT(*) AS BIGINT) AS n_b, CAST(SUM(m) AS BIGINT) AS sm_b,
            CAST(SUM(y) AS BIGINT) AS sy_b
          FROM d GROUP BY 1, 2),
        terms AS (SELECT bins.source,
            CAST(SUM(CAST(
              (CAST(sm_b - 999 * sy_b AS DOUBLE)
                * CAST(sm_b - 999 * sy_b AS DOUBLE))
                / (998001.0 * CAST(n_b AS DOUBLE) * CAST(n AS DOUBLE))
              AS DECIMAL(30,8))) AS DOUBLE) AS reliability,
            CAST(SUM(CAST(
              (CAST(n * sy_b - n_b * sy AS DOUBLE)
                * CAST(n * sy_b - n_b * sy AS DOUBLE))
                / (CAST(n_b AS DOUBLE) * CAST(n AS DOUBLE)
                  * CAST(n AS DOUBLE) * CAST(n AS DOUBLE))
              AS DECIMAL(30,8))) AS DOUBLE) AS resolution
          FROM bins JOIN tot ON bins.source = tot.source
          GROUP BY bins.source)
        SELECT tot.source, n,
          CAST(smm - 1998 * smy + 998001 * sy AS DOUBLE)
            / CAST(998001 * n AS DOUBLE) AS brier,
          CAST(sy * (n - sy) AS DOUBLE) / CAST(n * n AS DOUBLE)
            AS uncertainty,
          reliability, resolution
        FROM tot JOIN terms ON tot.source = terms.source
        ORDER BY tot.source""")),

    // ── Pettitt changepoint per event type (q211) ──────────────────────
    // Nonparametric single-changepoint detection on the value stream —
    // the drift-monitoring complement to CUSUM (q154): rank-based, so
    // it needs no distributional assumption and no float arithmetic.
    // U_t = Σ 2·midranks(≤t) − t(n+1), ALL integer (2×midranks stay
    // integral under ties), via TWO grouped range-partitioned prefix
    // sums (value order for ranks, time order for the CUSUM) — no
    // per-group sort task, the Hypothesis engine's shape. Argmax |U_t|
    // with ties to the earliest split.
    QueryDef("q211_pettitt_changepoint",
      (s, dir) => {
        val ev = t(s, dir, "events").select(
          col("event_type"), col("value"),
          struct(col("ts"), col("event_id")).as("tord"))
        graft.ext.Hypothesis.pettittChangepoint(ev, "event_type", "value", "tord")
          .select(col("event_type"), col("n"), col("t_star"),
            col("u_at"), col("u_abs"),
            date_format(col("at.ts"), "yyyy-MM-dd HH:mm:ss")
              .as("change_ts"))
          .orderBy("event_type")
      },
      Some("""WITH e AS (SELECT event_type AS g, ts, event_id, value AS v
          FROM events),
        r AS (SELECT g, ts, event_id,
            2 * (RANK() OVER (PARTITION BY g ORDER BY v) - 1)
              + COUNT(*) OVER (PARTITION BY g, v) + 1 AS r2
          FROM e),
        s AS (SELECT g, ts,
            ROW_NUMBER() OVER w AS t,
            SUM(r2) OVER w AS s2,
            COUNT(*) OVER (PARTITION BY g) AS n
          FROM r WINDOW w AS (PARTITION BY g ORDER BY ts, event_id
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
        u AS (SELECT g, ts, t, n, s2 - t * (n + 1) AS u FROM s
          WHERE t < n),
        best AS (SELECT g, ts, t, n, u, row_number() OVER (
            PARTITION BY g ORDER BY abs(u) DESC, t ASC) AS rn FROM u)
        SELECT g AS event_type, CAST(n AS BIGINT) AS n,
          CAST(t AS BIGINT) AS t_star, CAST(u AS BIGINT) AS u_at,
          CAST(abs(u) AS BIGINT) AS u_abs,
          strftime(ts, '%Y-%m-%d %H:%M:%S') AS change_ts
        FROM best WHERE rn = 1 ORDER BY event_type""")),

    // ── Leakage-safe K-fold target encoding (q212) ─────────────────────
    // The feature-engineering staple with the trap designed out: each
    // fold's categorical encoding is the OUT-OF-FOLD target mean,
    // derived by subtraction from per-(category, fold) partials —
    // (S_all − S_fold)/(n_all − n_fold) — so the whole thing is ONE
    // bounded aggregation + a bounded self-join, never a per-row
    // anti-join against the fold. Decimal partial sums make the means
    // partition-order-exact; fold assignment is the portable md5 hash,
    // so both engines agree row for row.
    QueryDef("q212_target_encoding",
      (s, dir) => {
        val folds = 5
        val d = t(s, dir, "events").select(
          col("event_type"),
          (Shingles.baseHash(col("event_id").cast("string")) % folds)
            .as("fold"),
          col("value").cast("decimal(30,8)").as("v"))
        val per = d.groupBy("event_type", "fold")
          .agg(count(lit(1)).as("n_f"), sum("v").as("s_f"))
        val all = per.groupBy("event_type")
          .agg(sum("n_f").as("n_all"), sum("s_f").as("s_all"))
        per.join(all, "event_type")
          .select(col("event_type"), col("fold"), col("n_f"),
            ((col("s_all") - col("s_f")).cast("double") /
              (col("n_all") - col("n_f")).cast("double")).as("oof_mean"))
          .orderBy("event_type", "fold")
      },
      Some("""WITH d AS (SELECT event_type,
            ('0x' || substr(md5(CAST(event_id AS VARCHAR)), 1, 7))::BIGINT
              % 5 AS fold,
            CAST(value AS DECIMAL(30,8)) AS v
          FROM events),
        per AS (SELECT event_type, fold, COUNT(*) AS n_f, SUM(v) AS s_f
          FROM d GROUP BY 1, 2),
        al AS (SELECT event_type, CAST(SUM(n_f) AS BIGINT) AS n_all,
            SUM(s_f) AS s_all
          FROM per GROUP BY 1)
        SELECT per.event_type, CAST(fold AS BIGINT) AS fold,
          CAST(n_f AS BIGINT) AS n_f,
          CAST(s_all - s_f AS DOUBLE) / CAST(n_all - n_f AS DOUBLE)
            AS oof_mean
        FROM per JOIN al ON per.event_type = al.event_type
        ORDER BY per.event_type, fold""")),

    // ── k-anonymity / l-diversity audit (q213) ─────────────────────────
    // The privacy gate a training-data release needs next to PII
    // redaction (q59): group by the quasi-identifier tuple, flag
    // equivalence classes smaller than k (re-identifiable) and classes
    // whose sensitive attribute shows fewer than l distinct values
    // (attribute disclosure even at size ≥ k). One aggregation; the
    // risky-class report is the release blocker, ordered worst-first.
    QueryDef("q213_k_anonymity",
      (s, dir) => {
        val k = 10L; val l = 3L
        t(s, dir, "customer")
          .groupBy(col("c_nationkey"), col("c_mktsegment"))
          .agg(count(lit(1)).as("class_size"),
            countDistinct(floor(col("c_acctbal") / 1000.0).cast("long"))
              .as("sensitive_distinct"))
          .withColumn("k_anonymous", col("class_size") >= k)
          .withColumn("l_diverse", col("sensitive_distinct") >= l)
          .filter(!col("k_anonymous") || !col("l_diverse"))
          .orderBy(col("class_size"), col("c_nationkey"),
            col("c_mktsegment"))
      },
      Some("""SELECT c_nationkey, c_mktsegment,
          CAST(COUNT(*) AS BIGINT) AS class_size,
          CAST(COUNT(DISTINCT CAST(floor(c_acctbal / 1000.0) AS BIGINT))
            AS BIGINT) AS sensitive_distinct,
          COUNT(*) >= 10 AS k_anonymous,
          COUNT(DISTINCT CAST(floor(c_acctbal / 1000.0) AS BIGINT)) >= 3
            AS l_diverse
        FROM customer GROUP BY 1, 2
        HAVING NOT (COUNT(*) >= 10) OR NOT
          (COUNT(DISTINCT CAST(floor(c_acctbal / 1000.0) AS BIGINT)) >= 3)
        ORDER BY class_size, c_nationkey, c_mktsegment""")),

    // ── Audio VAD: energy-based activity segments (q214) ───────────────
    // The speech-curation filter over the real WAV codec path: decode,
    // exact integer frame energies Σs², and run-length segmentation all
    // inside ONE map stage — no shuffle, 4 counters out per clip.
    // Deterministic synthesized payloads (q160's machinery) let the
    // oracle recompute every energy from the text bytes and re-derive
    // the segment structure with a gaps-and-islands window. Same
    // ASCII-corpus caveat as q61.
    QueryDef("q214_audio_vad",
      (s, dir) => {
        val media = Multimodal.asWavMediaTable(tPar(s, dir, "documents"),
          "doc_id", "text", 1024, 16000)
        Multimodal.audioVadSegments(media, 64, 8500000000L)
          .orderBy("media_id")
      },
      Some {
        val samp = "CASE WHEN strlen(text) = 0 THEN CAST(0 AS BIGINT) " +
          "ELSE CAST((ascii(substr(text, CAST((f * 64 + i) % strlen(text)" +
          " AS INT) + 1, 1)) - 128) * 256 AS BIGINT) END"
        s"""WITH fr AS (SELECT doc_id, text,
            unnest(range(0, 16)) AS f FROM documents),
        en AS (SELECT doc_id, f,
            list_sum(list_transform(range(0, 64), i ->
              ($samp) * ($samp))) AS e
          FROM fr),
        act AS (SELECT doc_id, f,
            CASE WHEN e > 8500000000 THEN 1 ELSE 0 END AS a FROM en),
        isl AS (SELECT doc_id, f, a, f - row_number() OVER (
            PARTITION BY doc_id, a ORDER BY f) AS grp FROM act),
        runs AS (SELECT doc_id, COUNT(*) AS len FROM isl
          WHERE a = 1 GROUP BY doc_id, grp),
        agg AS (SELECT doc_id, CAST(COUNT(*) AS INT) AS n_segments,
            CAST(SUM(len) AS INT) AS n_active,
            CAST(MAX(len) AS INT) AS longest_run
          FROM runs GROUP BY doc_id)
        SELECT d.doc_id AS media_id, CAST(16 AS INT) AS n_frames,
          COALESCE(n_active, 0) AS n_active,
          COALESCE(n_segments, 0) AS n_segments,
          COALESCE(longest_run, 0) AS longest_run
        FROM documents d LEFT JOIN agg ON d.doc_id = agg.doc_id
        ORDER BY media_id"""
      }),

    // ── Forecast backtest: MASE per nation (q215) ──────────────────────
    // The eval metric for the time-series family (q197/q199): seasonal-
    // naive forecast (s = 4 weeks) scored against the one-step naive
    // scale, per nation. Weekly revenue stays DECIMAL end to end, so
    // lags, absolute errors, and both error sums are exact; each MAE
    // is one correctly-rounded division and MASE their ratio — three
    // IEEE-deterministic float ops total (a decimal×bigint product
    // would hit Spark's precision cap and round where DuckDB widens). All windows ride the
    // bounded (nation, week) aggregate.
    QueryDef("q215_mase_backtest",
      (s, dir) => {
        val wk = t(s, dir, "orders")
          .join(t(s, dir, "customer"),
            col("o_custkey") === col("c_custkey"))
          .join(broadcast(t(s, dir, "nation")),
            col("c_nationkey") === col("n_nationkey"))
          .groupBy(col("n_name"), expr(
            "unix_micros(cast(o_orderdate as timestamp))" +
              " div 604800000000").as("week"))
          .agg(sum(col("o_totalprice").cast("decimal(30,8)")).as("rev"))
        val w = Window.partitionBy("n_name").orderBy("week")
        wk.withColumn("e1", abs(col("rev") - lag("rev", 1).over(w)))
          .withColumn("e4", abs(col("rev") - lag("rev", 4).over(w)))
          .groupBy("n_name")
          .agg(count(lit(1)).as("n_weeks"),
            sum("e1").as("s1"), count("e1").as("c1"),
            sum("e4").as("s4"), count("e4").as("c4"))
          .filter(col("c1") > 0 && col("c4") > 0)
          .select(col("n_name"), col("n_weeks"),
            (col("s1").cast("double") / col("c1").cast("double"))
              .as("naive_mae"),
            (col("s4").cast("double") / col("c4").cast("double"))
              .as("seasonal_mae"),
            ((col("s4").cast("double") / col("c4").cast("double")) /
              (col("s1").cast("double") / col("c1").cast("double")))
              .as("mase"))
          .orderBy("n_name")
      },
      Some("""WITH wk AS (SELECT n_name,
            epoch_us(o_orderdate) // 604800000000 AS week,
            SUM(CAST(o_totalprice AS DECIMAL(30,8))) AS rev
          FROM orders
          JOIN customer ON o_custkey = c_custkey
          JOIN nation ON c_nationkey = n_nationkey
          GROUP BY 1, 2),
        lg AS (SELECT n_name, week, rev,
            abs(rev - lag(rev, 1) OVER w) AS e1,
            abs(rev - lag(rev, 4) OVER w) AS e4
          FROM wk WINDOW w AS (PARTITION BY n_name ORDER BY week)),
        g AS (SELECT n_name, CAST(COUNT(*) AS BIGINT) AS n_weeks,
            SUM(e1) AS s1, CAST(COUNT(e1) AS BIGINT) AS c1,
            SUM(e4) AS s4, CAST(COUNT(e4) AS BIGINT) AS c4
          FROM lg GROUP BY 1)
        SELECT n_name, n_weeks,
          CAST(s1 AS DOUBLE) / CAST(c1 AS DOUBLE) AS naive_mae,
          CAST(s4 AS DOUBLE) / CAST(c4 AS DOUBLE) AS seasonal_mae,
          (CAST(s4 AS DOUBLE) / CAST(c4 AS DOUBLE))
            / (CAST(s1 AS DOUBLE) / CAST(c1 AS DOUBLE)) AS mase
        FROM g WHERE c1 > 0 AND c4 > 0 ORDER BY n_name""")),

    // ── Rendezvous (highest-random-weight) sharding (q216) ─────────────
    // The routing primitive for stateful services over the corpus:
    // shard = argmax over nodes of hash(node | key), MAP-ONLY via an
    // inline array-max over the bounded node set — no shuffle, no
    // lookup table. The defining property — removing a node moves ONLY
    // its own keys — is part of the result: per shard, the population
    // and how many keys would move if node7 left (nonzero only for
    // node7's own row).
    QueryDef("q216_rendezvous_shards",
      (s, dir) => {
        val nodes = (0 until 8).map(i => s"node$i")
        def hrw(ns: Seq[String]) = array_max(array(ns.map(n =>
          struct(Shingles.baseHash(concat(lit(n), lit("|"),
            col("doc_id").cast("string"))).as("h"),
            lit(n).as("node"))): _*))("node")
        tPar(s, dir, "documents")
          .select(col("doc_id"), hrw(nodes).as("shard"),
            hrw(nodes.init).as("shard_without_7"))
          .groupBy("shard")
          .agg(count(lit(1)).as("n_docs"),
            sum(when(col("shard") =!= col("shard_without_7"), 1L)
              .otherwise(0L)).as("moved_if_node7_leaves"))
          .orderBy("shard")
      },
      Some {
        def hrwSql(ns: Seq[String]) = {
          val arms = ns.map(n =>
            s"""{h: ('0x' || substr(md5('$n' || '|' ||
               CAST(doc_id AS VARCHAR)), 1, 7))::BIGINT, node: '$n'}""")
          s"list_max([${arms.mkString(", ")}]).node"
        }
        val nodes = (0 until 8).map(i => s"node$i")
        s"""WITH a AS (SELECT doc_id,
            ${hrwSql(nodes)} AS shard,
            ${hrwSql(nodes.init)} AS shard_without_7
          FROM documents)
        SELECT shard, CAST(COUNT(*) AS BIGINT) AS n_docs,
          CAST(SUM(CASE WHEN shard <> shard_without_7 THEN 1 ELSE 0 END)
            AS BIGINT) AS moved_if_node7_leaves
        FROM a GROUP BY shard ORDER BY shard"""
      }),

    // ── Hellinger drift between time halves (q217) ─────────────────────
    // Distribution drift WITHOUT log(): PSI/KL need ln, which is not
    // bit-portable across libms (the q89/q209 lesson) — the Hellinger
    // affinity Σ√(p·q) needs only sqrt, which IEEE defines correctly
    // rounded, so both engines agree bit for bit. Per event type:
    // value-bucket histograms of the first vs second half of the time
    // range (midpoint from the exact integer micros min/max), affinity
    // over the ≤20 buckets via the dsum contract, H² = 1 − affinity.
    QueryDef("q217_hellinger_drift",
      (s, dir) => {
        val ev = t(s, dir, "events").select(col("event_type"),
          unix_micros(col("ts")).as("us"),
          floor(col("value") / 25.0).cast("long").as("bucket"))
        val mid = ev.agg(expr("(min(us) + max(us)) div 2").as("mid"))
        val h = ev.crossJoin(broadcast(mid))
          .groupBy(col("event_type"), col("bucket"))
          .agg(sum(when(col("us") < col("mid"), 1L).otherwise(0L))
            .as("ca"),
            sum(when(col("us") >= col("mid"), 1L).otherwise(0L))
              .as("cb"))
        val tot = h.groupBy("event_type")
          .agg(sum("ca").as("na"), sum("cb").as("nb"))
        h.join(broadcast(tot), "event_type")
          .select(col("event_type"), col("na"), col("nb"),
            sqrt((col("ca").cast("double") / col("na").cast("double")) *
              (col("cb").cast("double") / col("nb").cast("double")))
              .as("t"))
          .groupBy("event_type", "na", "nb")
          .agg(graft.functions.Parity.dsum(col("t")).as("affinity"))
          .select(col("event_type"), col("na"), col("nb"),
            col("affinity"), (lit(1.0) - col("affinity")).as("h2"))
          .orderBy("event_type")
      },
      Some("""WITH ev AS (SELECT event_type, epoch_us(ts) AS us,
            CAST(floor(value / 25.0) AS BIGINT) AS bucket FROM events),
        m AS (SELECT (MIN(us) + MAX(us)) // 2 AS mid FROM ev),
        h AS (SELECT event_type, bucket,
            SUM(CASE WHEN us < mid THEN 1 ELSE 0 END) AS ca,
            SUM(CASE WHEN us >= mid THEN 1 ELSE 0 END) AS cb
          FROM ev CROSS JOIN m GROUP BY 1, 2),
        tot AS (SELECT event_type, CAST(SUM(ca) AS BIGINT) AS na,
            CAST(SUM(cb) AS BIGINT) AS nb
          FROM h GROUP BY 1),
        t AS (SELECT h.event_type, na, nb,
            sqrt((CAST(ca AS DOUBLE) / CAST(na AS DOUBLE)) *
              (CAST(cb AS DOUBLE) / CAST(nb AS DOUBLE))) AS t
          FROM h JOIN tot ON h.event_type = tot.event_type)
        SELECT event_type, na, nb,
          CAST(SUM(CAST(t AS DECIMAL(30,8))) AS DOUBLE) AS affinity,
          1.0 - CAST(SUM(CAST(t AS DECIMAL(30,8))) AS DOUBLE) AS h2
        FROM t GROUP BY event_type, na, nb ORDER BY event_type""")),

    // ── Dedup savings report: cluster → canonical → bytes (q218) ───────
    // The curation DELIVERABLE on top of the near-dup machinery (q26
    // candidates → q45 components): per duplicate cluster, elect the
    // canonical survivor (longest text, ties to the lowest id — the
    // keep-best-copy rule) and account the bytes deduplication frees.
    // Cluster membership joins back to doc stats by id; the election
    // and byte rollup are one aggregation over clusters whose sizes the
    // LSH band caps already bound.
    QueryDef("q218_dedup_savings",
      (s, dir) => {
        val docs = tPar(s, dir, "documents")
        val pairs = Dedup.minhashCandidates(docs,
          "doc_id", "text", shingleK, minhashHashes, minhashBandRows)
        val members = Dedup.dedupClusters(pairs)
          .select(col("id").as("doc_id"), col("cluster"))
          .join(docs.select(col("doc_id"),
            length(col("text")).cast("long").as("bytes")), "doc_id")
        members.groupBy("cluster")
          .agg(count(lit(1)).as("n_docs"),
            sum("bytes").as("bytes_total"),
            max(struct(col("bytes"), (-col("doc_id")).as("nid")))
              .as("_c"))
          .select(col("cluster"), col("n_docs"), col("bytes_total"),
            (-col("_c.nid")).as("canonical_doc"),
            (col("bytes_total") - col("_c.bytes")).as("bytes_saved"))
          .orderBy("cluster")
      },
      Some(s"""WITH RECURSIVE $dMinhashCandCtes,
        edges AS (SELECT id_a AS u, id_b AS v FROM cand
                  UNION SELECT id_b, id_a FROM cand),
        nodes AS (SELECT DISTINCT u AS id FROM edges),
        reach(id, r) AS (
          SELECT id, id FROM nodes
          UNION
          SELECT rr.id, e.v FROM reach rr JOIN edges e ON rr.r = e.u),
        mem AS (SELECT reach.id AS doc_id, MIN(r) AS cluster
          FROM reach GROUP BY 1),
        m2 AS (SELECT mem.doc_id, cluster,
            CAST(strlen(text) AS BIGINT) AS bytes
          FROM mem JOIN documents d ON mem.doc_id = d.doc_id),
        agg AS (SELECT cluster, CAST(COUNT(*) AS BIGINT) AS n_docs,
            CAST(SUM(bytes) AS BIGINT) AS bytes_total
          FROM m2 GROUP BY 1),
        canon AS (SELECT cluster, doc_id AS canonical_doc, bytes FROM (
          SELECT cluster, doc_id, bytes, row_number() OVER (
              PARTITION BY cluster ORDER BY bytes DESC, doc_id ASC) AS rn
          FROM m2) WHERE rn = 1)
        SELECT agg.cluster, n_docs, bytes_total, canonical_doc,
          bytes_total - canon.bytes AS bytes_saved
        FROM agg JOIN canon ON agg.cluster = canon.cluster
        ORDER BY agg.cluster""")),

    // ── Native HLL aggregate: graft_hll (q219) ─────────────────────────
    // The DISTINCT leg of the native sketch trio (graft_kmv q191,
    // graft_cms q202): the 64-register max-rank table lives IN the
    // aggregation buffer, so each map task ships 64 bytes per group
    // instead of its key stream, and register max (associative,
    // commutative, idempotent) folds exactly under any partitioning.
    // Output: every set register plus the Flajolet estimate (the 2^-m
    // sum is exact in double — ≤64 distinct powers of two spanning 49
    // bits of a 53-bit mantissa), register-identical to the
    // operator-level q146 machinery and the SQL oracle.
    QueryDef("q219_hll_native_agg",
      (s, dir) => {
        val reg = t(s, dir, "events").groupBy("event_type")
          .agg(graft.functions.HllSketchAgg.hllAgg(col("user_id"))
            .as("regs"))
        val denom = aggregate(col("regs"), lit(0.0),
          (acc, m) => acc + when(m === 0, lit(1.0))
            .otherwise(pow(lit(2.0), -m.cast("double"))))
        reg.withColumn("hll_est",
            lit(0.709) * lit(64.0) * lit(64.0) / denom)
          .select(col("event_type"), col("hll_est"),
            posexplode(col("regs")).as(Seq("bucket", "m")))
          .filter(col("m") > 0)
          .select(col("event_type"), col("bucket"), col("m"),
            col("hll_est"))
          .orderBy("event_type", "bucket")
      },
      Some("""WITH h AS (SELECT event_type,
            ('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 12))::BIGINT
              AS h FROM events),
        r AS (SELECT event_type, h // 4398046511104 AS bucket,
            h % 4398046511104 AS rest FROM h),
        reg AS (SELECT event_type, bucket,
            MAX(CASE WHEN rest = 0 THEN 43
                ELSE 43 - len(bin(rest)) END) AS m
          FROM r GROUP BY 1, 2),
        est AS (SELECT event_type,
            (64 - COUNT(*)) * 1.0 + SUM(pow(2.0, -m)) AS denom
          FROM reg GROUP BY 1)
        SELECT reg.event_type, CAST(bucket AS INT) AS bucket,
          CAST(m AS INT) AS m, 0.709 * 64.0 * 64.0 / denom AS hll_est
        FROM reg JOIN est ON reg.event_type = est.event_type
        ORDER BY reg.event_type, bucket""")),

    // ── Prefix autocomplete table (q220) ───────────────────────────────
    // The search-box companion to the retrieval family (q71/q89): for
    // every token prefix of length 1–3, the top-5 completions by corpus
    // frequency (ties to the lexicographically smaller token). One
    // tokenize pass, prefixes exploded MAP-SIDE (≤3 rows per token
    // occurrence), one aggregation, and the per-prefix top-k rides the
    // TopKPerKey heap — no global sort, no per-prefix window sort. At
    // 100 TB this is the precomputed index an autocomplete service
    // ships; prefix cardinality, not corpus size, bounds the output.
    QueryDef("q220_autocomplete",
      (s, dir) => {
        val tf = tPar(s, dir, "documents")
          .select(explode(TextStats.tokens(col("text"))).as("token"))
          .filter(length(col("token")) >= 3)
          .groupBy("token").agg(count(lit(1)).as("tf"))
        val byPrefix = tf.select(col("token"), col("tf"),
            explode(array((1 to 3).map(l =>
              substring(col("token"), 1, l)): _*)).as("prefix"))
        graft.plans.TopKPerKey.topKPerKey(byPrefix, Seq("prefix"),
          Seq(graft.plans.TopKPerKey.Sort("tf", asc = false),
            graft.plans.TopKPerKey.Sort("token")), 5)
          .select(col("prefix"), col("rank"), col("token"), col("tf"))
          .orderBy("prefix", "rank")
      },
      Some(s"""WITH tk AS (SELECT unnest($dTok) AS token FROM documents),
        tf AS (SELECT token, CAST(COUNT(*) AS BIGINT) AS tf FROM tk
          WHERE len(token) >= 3 GROUP BY token),
        p AS (SELECT token, tf, substr(token, 1, l) AS prefix
          FROM tf CROSS JOIN (SELECT unnest([1, 2, 3]) AS l)),
        r AS (SELECT prefix, token, tf, row_number() OVER (
            PARTITION BY prefix ORDER BY tf DESC, token) AS rank
          FROM p)
        SELECT prefix, CAST(rank AS BIGINT) AS rank, token, tf
        FROM r WHERE rank <= 5 ORDER BY prefix, rank""")),

    // ── Character-diversity junk gate: Gini impurity (q221) ────────────
    // The no-log() cousin of byte entropy for junk/binary detection
    // (repeated-character spam, base64 blobs, single-char padding):
    // Gini impurity 1 − Σ(c_i/n)² over the per-doc character histogram
    // is EXACT rational arithmetic — Σc² and n² are integers, one
    // division — where Shannon entropy's log2 would hash-diverge
    // across libms. The 10 lowest-impurity docs are the junk report
    // (rank-based, not a fixed threshold — scale-stable), ranked on
    // the TopKPerKey heap.
    QueryDef("q221_char_gini",
      (s, dir) => {
        // split(text, "") yields UTF-16 code units (surrogate pairs
        // split in half) while the oracle's string_split_regex yields
        // UTF-8 code points — equivalent only on an ASCII corpus (true
        // of the generated testdata; same caveat as q61/q214).
        val ch = tPar(s, dir, "documents")
          .select(col("doc_id"),
            explode(split(col("text"), "")).as("c"))
          .filter(col("c") =!= "")
          .groupBy("doc_id", "c").agg(count(lit(1)).as("cnt"))
        val g = ch.groupBy("doc_id")
          .agg(sum("cnt").as("n"),
            count(lit(1)).as("distinct_chars"),
            sum(col("cnt") * col("cnt")).as("s2"))
          .select(col("doc_id"), col("n"), col("distinct_chars"),
            (lit(1.0) - col("s2").cast("double") /
              (col("n") * col("n")).cast("double")).as("gini"))
          .withColumn("g", lit(1))
        graft.plans.TopKPerKey.topKPerKey(g, Seq("g"),
          Seq(graft.plans.TopKPerKey.Sort("gini"),
            graft.plans.TopKPerKey.Sort("doc_id")), 10)
          .select(col("rank"), col("doc_id"), col("n"),
            col("distinct_chars"), col("gini"))
          .orderBy("rank")
      },
      Some("""WITH ch AS (SELECT doc_id,
            unnest(string_split_regex(text, '')) AS c FROM documents),
        h AS (SELECT doc_id, c, COUNT(*) AS cnt FROM ch
          WHERE c <> '' GROUP BY 1, 2),
        g AS (SELECT doc_id, CAST(SUM(cnt) AS BIGINT) AS n,
            CAST(COUNT(*) AS BIGINT) AS distinct_chars,
            CAST(SUM(cnt * cnt) AS BIGINT) AS s2
          FROM h GROUP BY 1),
        r AS (SELECT doc_id, n, distinct_chars,
            1.0 - CAST(s2 AS DOUBLE) / CAST(n * n AS DOUBLE) AS gini
          FROM g)
        SELECT CAST(row_number() OVER (ORDER BY gini, doc_id) AS BIGINT)
            AS rank, doc_id, n, distinct_chars, gini
        FROM r ORDER BY gini, doc_id LIMIT 10""")),

    // ── A/B conversion two-proportion z-test (q222) ────────────────────
    // The experimentation staple over the event stream: users split
    // into arms by the portable hash, conversion = viewed AND
    // purchased, z = (p1−p2) / sqrt(p̂(1−p̂)(1/n1+1/n2)). Every input
    // to the float expression is an exact integer count; the only
    // float ops are correctly-rounded divisions and ONE IEEE sqrt, so
    // the statistic is bit-identical across engines (the same
    // no-libm discipline as q217 — a normal-CDF p-value would need
    // erf, which is not portable; the z threshold 1.96 is the
    // decision surface instead). One per-user aggregation, then a
    // 2-row reduce.
    QueryDef("q222_conversion_ztest",
      (s, dir) => {
        // (user, day) grain keeps the proportion interior — per-user
        // over a month every user both views and purchases, p̂ = 1 and
        // the variance collapses (caught by the ANSI divide-by-zero
        // gate on first run); a view-day converts if that same day
        // also purchased. Arms split at USER level, as a real
        // experiment would.
        val per = t(s, dir, "events")
          .groupBy(col("user_id"),
            expr("unix_micros(ts) div 86400000000").as("day"))
          .agg(max(when(col("event_type") === "view", 1L).otherwise(0L))
            .as("viewed"),
            max(when(col("event_type") === "purchase", 1L).otherwise(0L))
              .as("purchased"))
          .filter(col("viewed") === 1)
          .select((Shingles.baseHash(col("user_id").cast("string")) % 2)
            .as("arm"), col("purchased"))
        // ONE conditional aggregation always yields the report row —
        // a per-arm groupBy + crossJoin would return ZERO rows when an
        // arm is empty (the report must say 'degenerate', not vanish)
        val ab = per.agg(
          sum(when(col("arm") === 0, 1L).otherwise(0L)).as("n1"),
          sum(when(col("arm") === 0, col("purchased")).otherwise(0L))
            .as("c1"),
          sum(when(col("arm") === 1, 1L).otherwise(0L)).as("n2"),
          sum(when(col("arm") === 1, col("purchased")).otherwise(0L))
            .as("c2"))
        ab
          .select(col("n1"), col("c1"), col("n2"), col("c2"),
            when(col("n1") === 0, lit(null).cast("double"))
              .otherwise(col("c1").cast("double") /
                col("n1").cast("double")).as("p1"),
            when(col("n2") === 0, lit(null).cast("double"))
              .otherwise(col("c2").cast("double") /
                col("n2").cast("double")).as("p2"))
          .withColumn("p_pool",
            when(col("n1") + col("n2") === 0, lit(null).cast("double"))
              .otherwise((col("c1") + col("c2")).cast("double") /
                (col("n1") + col("n2")).cast("double")))
          .withColumn("z", when(
            col("n1") === 0 || col("n2") === 0 ||
            col("p_pool") === 0.0 || col("p_pool") === 1.0, lit(null)
              .cast("double"))
            .otherwise((col("p1") - col("p2")) /
              sqrt(col("p_pool") * (lit(1.0) - col("p_pool")) *
                (lit(1.0) / col("n1").cast("double") +
                  lit(1.0) / col("n2").cast("double")))))
          .withColumn("significant_95", abs(col("z")) > 1.96)
      },
      Some("""WITH per AS (SELECT user_id, epoch_us(ts) // 86400000000 AS day,
            MAX(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END)
              AS viewed,
            MAX(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
              AS purchased
          FROM events GROUP BY user_id, day),
        armed AS (SELECT
            ('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 7))::BIGINT
              % 2 AS arm, purchased
          FROM per WHERE viewed = 1),
        ab AS (SELECT
            CAST(SUM(CASE WHEN arm = 0 THEN 1 ELSE 0 END) AS BIGINT)
              AS n1,
            CAST(SUM(CASE WHEN arm = 0 THEN purchased ELSE 0 END)
              AS BIGINT) AS c1,
            CAST(SUM(CASE WHEN arm = 1 THEN 1 ELSE 0 END) AS BIGINT)
              AS n2,
            CAST(SUM(CASE WHEN arm = 1 THEN purchased ELSE 0 END)
              AS BIGINT) AS c2
          FROM armed),
        d AS (SELECT n1, c1, n2, c2,
            CASE WHEN n1 = 0 THEN NULL
              ELSE CAST(c1 AS DOUBLE) / CAST(n1 AS DOUBLE) END AS p1,
            CASE WHEN n2 = 0 THEN NULL
              ELSE CAST(c2 AS DOUBLE) / CAST(n2 AS DOUBLE) END AS p2,
            CASE WHEN n1 + n2 = 0 THEN NULL
              ELSE CAST(c1 + c2 AS DOUBLE) / CAST(n1 + n2 AS DOUBLE)
            END AS p_pool
          FROM ab)
        SELECT n1, c1, n2, c2, p1, p2, p_pool,
          CASE WHEN n1 = 0 OR n2 = 0 OR p_pool = 0.0 OR p_pool = 1.0
            THEN NULL
            ELSE (p1 - p2) / sqrt(p_pool * (1.0 - p_pool)
              * (1.0 / CAST(n1 AS DOUBLE) + 1.0 / CAST(n2 AS DOUBLE)))
          END AS z,
          abs(CASE WHEN n1 = 0 OR n2 = 0 OR p_pool = 0.0 OR p_pool = 1.0
            THEN NULL
            ELSE (p1 - p2) / sqrt(p_pool * (1.0 - p_pool)
              * (1.0 / CAST(n1 AS DOUBLE) + 1.0 / CAST(n2 AS DOUBLE)))
          END) > 1.96 AS significant_95
        FROM d""")),

    // ── Table diff: version-to-version reconciliation (q223) ───────────
    // The data-diff tool a warehouse migration runs before cutover:
    // keys added / removed / changed between two versions of a table,
    // plus per-column change counts for the changed keys. The "old"
    // version is derived deterministically from `part` (a hash-selected
    // 95% with a hash-selected price perturbation), so both engines
    // diff identical inputs. ONE full-outer join on the key; per-column
    // comparison is null-safe equality inside the join projection — no
    // per-column scans, no row explosion.
    QueryDef("q223_table_diff",
      (s, dir) => {
        val cur = t(s, dir, "part")
        def h(c: Column) = Shingles.baseHash(c.cast("string"))
        val old = cur
          .filter(h(col("p_partkey")) % 20 =!= 0) // 5% "new" keys
          .withColumn("p_retailprice",
            when(h(col("p_partkey") + 1000000) % 7 === 0,
              col("p_retailprice") + 1.0)
              .otherwise(col("p_retailprice")))
        val j = cur.as("c").join(old.as("o"),
          col("c.p_partkey") === col("o.p_partkey"), "full_outer")
        j.agg(
          sum(when(col("o.p_partkey").isNull, 1L).otherwise(0L))
            .as("added"),
          sum(when(col("c.p_partkey").isNull, 1L).otherwise(0L))
            .as("removed"),
          sum(when(col("c.p_partkey").isNotNull &&
            col("o.p_partkey").isNotNull &&
            (!(col("c.p_retailprice") <=> col("o.p_retailprice")) ||
              !(col("c.p_type") <=> col("o.p_type")) ||
              !(col("c.p_size") <=> col("o.p_size"))), 1L)
            .otherwise(0L)).as("changed"),
          sum(when(col("c.p_partkey").isNotNull &&
            col("o.p_partkey").isNotNull &&
            !(col("c.p_retailprice") <=> col("o.p_retailprice")), 1L)
            .otherwise(0L)).as("changed_price"),
          sum(when(col("c.p_partkey").isNotNull &&
            col("o.p_partkey").isNotNull &&
            !(col("c.p_type") <=> col("o.p_type")), 1L)
            .otherwise(0L)).as("changed_type"),
          sum(when(col("c.p_partkey").isNotNull &&
            col("o.p_partkey").isNotNull, 1L).otherwise(0L))
            .as("unchanged_or_changed"))
      },
      Some("""WITH old AS (SELECT p_partkey, p_type, p_size,
            CASE WHEN ('0x' || substr(md5(CAST(p_partkey + 1000000
                  AS VARCHAR)), 1, 7))::BIGINT % 7 = 0
              THEN p_retailprice + 1.0 ELSE p_retailprice END
              AS p_retailprice
          FROM part
          WHERE ('0x' || substr(md5(CAST(p_partkey AS VARCHAR)), 1, 7))
            ::BIGINT % 20 <> 0)
        SELECT
          CAST(SUM(CASE WHEN o.p_partkey IS NULL THEN 1 ELSE 0 END)
            AS BIGINT) AS added,
          CAST(SUM(CASE WHEN c.p_partkey IS NULL THEN 1 ELSE 0 END)
            AS BIGINT) AS removed,
          CAST(SUM(CASE WHEN c.p_partkey IS NOT NULL
              AND o.p_partkey IS NOT NULL
              AND (c.p_retailprice IS DISTINCT FROM o.p_retailprice
                OR c.p_type IS DISTINCT FROM o.p_type
                OR c.p_size IS DISTINCT FROM o.p_size)
            THEN 1 ELSE 0 END) AS BIGINT) AS changed,
          CAST(SUM(CASE WHEN c.p_partkey IS NOT NULL
              AND o.p_partkey IS NOT NULL
              AND c.p_retailprice IS DISTINCT FROM o.p_retailprice
            THEN 1 ELSE 0 END) AS BIGINT) AS changed_price,
          CAST(SUM(CASE WHEN c.p_partkey IS NOT NULL
              AND o.p_partkey IS NOT NULL
              AND c.p_type IS DISTINCT FROM o.p_type
            THEN 1 ELSE 0 END) AS BIGINT) AS changed_type,
          CAST(SUM(CASE WHEN c.p_partkey IS NOT NULL
              AND o.p_partkey IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
            AS unchanged_or_changed
        FROM part c FULL OUTER JOIN old o ON c.p_partkey = o.p_partkey""")),

    // ── Nearest-event tolerance join (q224) ────────────────────────────
    // The BIDIRECTIONAL cousin of the as-of join (q126 looks only
    // backward): each purchase aligned to the SAME user's single
    // nearest view within ±6 hours — the clickstream/sensor alignment
    // primitive. Scale shape: the purchase side explodes to its 13
    // candidate hour buckets (bounded, map-side) and equi-joins the
    // view side on (user, hour) — a view's hour is unique, so no pair
    // duplicates and never a |purchases|×|views| blow-up; candidates
    // per purchase are bounded by the user's views that half-day. The
    // nearest pick is the TopKPerKey heap with k=1 (ties: earlier
    // event id).
    QueryDef("q224_nearest_event",
      (s, dir) => {
        val hour = 3600000000L
        val ev = t(s, dir, "events").select(
          col("user_id"), col("event_id"), col("event_type"),
          unix_micros(col("ts")).as("eus"))
        val views = ev.filter(col("event_type") === "view")
          .select(col("user_id"), col("event_id").as("view_id"),
            col("eus").as("vus"),
            expr(s"eus div ${hour}L").as("hr"))
        val cand = ev.filter(col("event_type") === "purchase")
          .select(col("user_id"), col("event_id").as("purchase_id"),
            col("eus").as("pus"))
          .withColumn("hr", explode(sequence(
            expr(s"pus div ${hour}L") - 6, expr(s"pus div ${hour}L") + 6)))
          .join(views, Seq("user_id", "hr"))
          .withColumn("adt_us", abs(col("vus") - col("pus")))
          .filter(col("adt_us") <= lit(6L * hour))
        graft.plans.TopKPerKey.topKPerKey(
          cand.select("purchase_id", "user_id", "view_id", "adt_us"),
          Seq("purchase_id"),
          Seq(graft.plans.TopKPerKey.Sort("adt_us"),
            graft.plans.TopKPerKey.Sort("view_id")), 1)
          .select(col("purchase_id"), col("user_id"), col("view_id"),
            expr("adt_us div 1000000").as("adt_sec"))
          .orderBy("purchase_id")
      },
      Some("""WITH ev AS (SELECT user_id, event_id, event_type,
            epoch_us(ts) AS eus FROM events),
        v AS (SELECT user_id, event_id AS view_id, eus AS vus FROM ev
          WHERE event_type = 'view'),
        p AS (SELECT user_id, event_id AS purchase_id, eus AS pus FROM ev
          WHERE event_type = 'purchase'),
        cand AS (SELECT purchase_id, p.user_id, view_id,
            abs(vus - pus) AS adt_us
          FROM p JOIN v ON p.user_id = v.user_id
          WHERE abs(vus - pus) <= 6 * 3600000000),
        r AS (SELECT *, row_number() OVER (PARTITION BY purchase_id
            ORDER BY adt_us, view_id) AS rn FROM cand)
        SELECT purchase_id, user_id, view_id,
          adt_us // 1000000 AS adt_sec
        FROM r WHERE rn = 1 ORDER BY purchase_id""")),

    // ── Segmented running balance with resets (q225) ───────────────────
    // The ledger/meter pattern: per user, a running `value` balance
    // that RESETS at every signup event; report each user's segment
    // count, peak within-segment balance, and final balance. One
    // per-user time window computes the global cumulative sum AND the
    // segment id (cumulative signup count) in a single pass; the
    // within-segment balance is cum − cum_at_segment_start, recovered
    // with a per-(user, segment) first-value window on the SAME
    // partitioning — no self-join. Per-entity windows are the correct
    // scale shape here (a user's history is bounded and task-local;
    // the range-partitioned prefix engine is for one GLOBAL order).
    // Balances stay DECIMAL end to end — exact at any partitioning.
    QueryDef("q225_running_balance",
      (s, dir) => {
        val w = Window.partitionBy("user_id")
          .orderBy("eus", "event_id")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        val wSeg = Window.partitionBy("user_id", "seg")
          .orderBy("eus", "event_id")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        val ev = t(s, dir, "events").select(
          col("user_id"), col("event_id"),
          unix_micros(col("ts")).as("eus"),
          // decimal(18,8), NOT (30,8): Spark's window SUM wants
          // precision+10; from 30 that exceeds the precision-38 cap and
          // Spark silently drops scale to 6 (DECIMAL(38,6)) while the
          // oracle keeps scale 8 → exact-hash divergence. From 18 the
          // sum is DECIMAL(28,8) — scale preserved, headroom intact.
          col("value").cast("decimal(18,8)").as("v"),
          when(col("event_type") === "signup", 1L).otherwise(0L)
            .as("is_reset"))
        val wo = Window.partitionBy("user_id")
          .orderBy("eus", "event_id")
        val cum = ev
          .withColumn("cum", sum("v").over(w))
          .withColumn("seg", sum("is_reset").over(w))
          .withColumn("rn", row_number().over(wo))
          .withColumn("base", first("cum").over(wSeg) -
            first("v").over(wSeg))
          .withColumn("bal", col("cum") - col("base"))
        // Output rail: cast to DOUBLE like every other query — the
        // decimal VALUES are bit-identical across engines (r11 judge
        // verified), but the declared parquet decimal PRECISION is not
        // (Spark DECIMAL(28,8) vs DuckDB DECIMAL(38,8)) and the
        // driver's hash is representation-sensitive. Identical decimals
        // cast to identical doubles on both engines.
        cum.groupBy("user_id")
          .agg((max("seg") + lit(1)).as("n_segments"),
            max("bal").cast("double").as("peak_balance"),
            max_by(col("bal"), col("rn")).cast("double")
              .as("final_balance"))
          .orderBy("user_id")
      },
      Some("""WITH ev AS (SELECT user_id, event_id, epoch_us(ts) AS eus,
            CAST(value AS DECIMAL(30,8)) AS v,
            CASE WHEN event_type = 'signup' THEN 1 ELSE 0 END AS is_reset
          FROM events),
        c AS (SELECT user_id, event_id, eus, v,
            SUM(v) OVER w AS cum, SUM(is_reset) OVER w AS seg,
            row_number() OVER (PARTITION BY user_id
              ORDER BY eus, event_id) AS rn
          FROM ev WINDOW w AS (PARTITION BY user_id
            ORDER BY eus, event_id
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
        b AS (SELECT user_id, event_id, eus, seg, rn,
            cum - (first_value(cum) OVER ws - first_value(v) OVER ws)
              AS bal
          FROM c WINDOW ws AS (PARTITION BY user_id, seg
            ORDER BY eus, event_id
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))
        SELECT user_id, CAST(MAX(seg) + 1 AS BIGINT) AS n_segments,
          CAST(MAX(bal) AS DOUBLE) AS peak_balance,
          CAST(max_by(bal, rn) AS DOUBLE) AS final_balance
        FROM b GROUP BY user_id ORDER BY user_id""")),

    // ── Mergeable-sketch rollup: weekly HLL → monthly (q226) ───────────
    // The lakehouse rollup pattern the sketches exist FOR: weekly
    // distinct-user register tables (what a daily pipeline would
    // persist) max-merge into the monthly estimate WITHOUT rescanning
    // raw history — register max is associative, commutative,
    // idempotent, so the rollup is bit-identical to sketching the raw
    // month. Output contrasts the naive sum of weekly estimates
    // (overcounts repeat visitors) with the merged estimate and the
    // exact count it approximates. One raw scan total.
    QueryDef("q226_hll_rollup",
      (s, dir) => {
        import graft.ext.Sketches
        val ev = t(s, dir, "events").select(col("event_type"),
          col("user_id"),
          expr("unix_micros(ts) div 604800000000").as("week"))
        val weekly = Sketches.hllRegisters(ev, Seq("event_type", "week"),
          col("user_id").cast("string")).localCheckpoint()
        val weeklyEst = Sketches.hllEstimate(weekly,
          Seq("event_type", "week"))
          .groupBy("event_type")
          .agg(count(lit(1)).as("n_weeks"),
            graft.functions.Parity.dsum(col("hll_est"))
              .as("sum_weekly_est"))
        val monthlyEst = Sketches.hllEstimate(
          weekly.groupBy(col("event_type"), col("__bucket"))
            .agg(max("__m").as("__m")),
          Seq("event_type"))
          .withColumnRenamed("hll_est", "monthly_est")
        val exact = ev.groupBy("event_type")
          .agg(countDistinct(col("user_id")).as("n_exact"))
        weeklyEst.join(monthlyEst, "event_type")
          .join(exact, "event_type")
          .orderBy("event_type")
      },
      Some("""WITH ev AS (SELECT event_type, user_id,
            epoch_us(ts) // 604800000000 AS week FROM events),
        h AS (SELECT event_type, week,
            ('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 12))::BIGINT
              AS h FROM ev),
        r AS (SELECT event_type, week, h // 4398046511104 AS bucket,
            h % 4398046511104 AS rest FROM h),
        reg AS (SELECT event_type, week, bucket,
            MAX(CASE WHEN rest = 0 THEN 43
                ELSE 43 - len(bin(rest)) END) AS m
          FROM r GROUP BY 1, 2, 3),
        west AS (SELECT event_type, week,
            0.709 * 64.0 * 64.0 /
              ((64 - COUNT(*)) * 1.0 + SUM(pow(2.0, -m))) AS est
          FROM reg GROUP BY 1, 2),
        wsum AS (SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_weeks,
            CAST(SUM(CAST(est AS DECIMAL(30,8))) AS DOUBLE)
              AS sum_weekly_est
          FROM west GROUP BY 1),
        mreg AS (SELECT event_type, bucket, MAX(m) AS m
          FROM reg GROUP BY 1, 2),
        mest AS (SELECT event_type,
            0.709 * 64.0 * 64.0 /
              ((64 - COUNT(*)) * 1.0 + SUM(pow(2.0, -m))) AS monthly_est
          FROM mreg GROUP BY 1),
        ex AS (SELECT event_type,
            CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_exact
          FROM ev GROUP BY 1)
        SELECT event_type, n_weeks, sum_weekly_est, monthly_est, n_exact
        FROM wsum JOIN mest USING (event_type) JOIN ex USING (event_type)
        ORDER BY event_type""")),

    // ── Quantile-sketch rollup: weekly partials → monthly (q227) ───────
    // q226's quantile twin: the weekly bottom-k-by-hash samples a daily
    // pipeline would persist fold into the monthly sketch by re-taking
    // the bottom k of their union — the k-minima of a disjoint union is
    // a pure set function, so the rollup is bit-identical to sketching
    // the raw month, with no raw rescan. Estimates follow q55's integer
    // rank discipline (midLo/midHi median, ceil(0.9·m) p90), so the
    // oracle reproduces the doubles exactly.
    QueryDef("q227_quantile_rollup",
      (s, dir) => {
        import graft.ext.Sketches
        val k = 32
        val ev = t(s, dir, "events").select(col("event_type"),
          col("event_id"), col("value"),
          expr("unix_micros(ts) div 604800000000").as("week"))
        val weekly = Sketches.quantilePartial(ev,
          Seq("event_type", "week"), col("value"), col("event_id"), k)
        val monthly = weekly.groupBy("event_type")
          .agg(sum(col("n")).as("n"),
            slice(sort_array(flatten(collect_list(col("qs_sample")))),
              1, k).as("qs_sample"))
        Sketches.quantileFinish(monthly, Seq("event_type"))
          .orderBy("event_type")
      },
      Some("""WITH ev AS (SELECT event_type, event_id,
            CAST(value AS DOUBLE) AS v,
            epoch_us(ts) // 604800000000 AS week FROM events),
        h AS (SELECT event_type, week,
            ('0x' || substr(md5(CAST(event_id AS VARCHAR)), 1, 7))::BIGINT
              AS h, v FROM ev),
        wk AS (SELECT event_type, week, h, v, row_number() OVER (
            PARTITION BY event_type, week ORDER BY h, v) AS rn FROM h),
        mo AS (SELECT event_type, h, v, row_number() OVER (
            PARTITION BY event_type ORDER BY h, v) AS rn2
          FROM wk WHERE rn <= 32),
        sample AS (SELECT event_type, v FROM mo WHERE rn2 <= 32),
        vs AS (SELECT event_type, v, row_number() OVER (
            PARTITION BY event_type ORDER BY v) AS rv,
            COUNT(*) OVER (PARTITION BY event_type) AS m FROM sample),
        tot AS (SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n
          FROM ev GROUP BY 1),
        fin AS (SELECT event_type, CAST(MAX(m) AS BIGINT) AS n_sampled,
            (MAX(CASE WHEN rv = (m + 1) // 2 THEN v END)
              + MAX(CASE WHEN rv = (m + 2) // 2 THEN v END)) / 2
              AS median_est,
            MAX(CASE WHEN rv = CAST(ceil(m * 0.9) AS INT) THEN v END)
              AS p90_est
          FROM vs GROUP BY event_type)
        SELECT event_type, n, n_sampled, median_est, p90_est
        FROM tot JOIN fin USING (event_type) ORDER BY event_type""")),

    // ── M4 time-series downsampling (q228) ─────────────────────────────
    // The published charting downsample (Jugel et al., VLDB'14): per
    // (series, pixel bucket) keep min, max, first, and last — the four
    // points that make the rendered line pixel-exact at any zoom. One
    // aggregation over (event_type, day); first/last ride min_by/max_by
    // on the in-bucket row number, so the whole thing is a single
    // shuffle with map-side partials — the query a 100 TB metrics store
    // answers per chart tile.
    QueryDef("q228_m4_downsample",
      (s, dir) => {
        val w = Window.partitionBy("event_type", "day")
          .orderBy("eus", "event_id")
        t(s, dir, "events").select(col("event_type"),
            col("event_id"), col("value").as("v"),
            unix_micros(col("ts")).as("eus"))
          .withColumn("day", expr("eus div 86400000000"))
          .withColumn("rn", row_number().over(w))
          .groupBy("event_type", "day")
          .agg(count(lit(1)).as("n_points"),
            min("v").as("v_min"), max("v").as("v_max"),
            min_by(col("v"), col("rn")).as("v_first"),
            max_by(col("v"), col("rn")).as("v_last"))
          .orderBy("event_type", "day")
      },
      Some("""WITH ev AS (SELECT event_type, event_id, value AS v,
            epoch_us(ts) AS eus, epoch_us(ts) // 86400000000 AS day
          FROM events),
        r AS (SELECT event_type, day, v, row_number() OVER (
            PARTITION BY event_type, day ORDER BY eus, event_id) AS rn
          FROM ev)
        SELECT event_type, day, CAST(COUNT(*) AS BIGINT) AS n_points,
          MIN(v) AS v_min, MAX(v) AS v_max,
          min_by(v, rn) AS v_first, max_by(v, rn) AS v_last
        FROM r GROUP BY 1, 2 ORDER BY event_type, day""")),

    // ── Adjacent-bigram collocations by log-free PMI (q229) ────────────
    // Collocation extraction (Church & Hanks 1990) with the same
    // rational trick as q98: rank by lift = n_xy·N / (n_x·n_y), which
    // is monotone in PMI = log(lift) — so the ORDER is PMI's order with
    // zero libm calls. Unlike q98 (doc-level co-occurrence over a
    // capped top-50 vocabulary), this is ADJACENT bigrams over the full
    // vocabulary with a min-support gate; candidates are bounded by
    // distinct bigram types, never doc pairs. Top-50 rides
    // TakeOrderedAndProject (per-partition heaps), not a global sort.
    QueryDef("q229_pmi_collocations",
      (s, dir) => {
        val docs = tPar(s, dir, "documents")
        val uni = docs
          .select(explode(TextStats.tokens(col("text"))).as("tok"))
          .groupBy("tok").agg(count(lit(1)).as("c"))
          .localCheckpoint() // consumed 3x: word_a join, word_b join, N
        val nTot = uni.agg(sum("c").as("n"))
        val bi = docs.select(explode(graft.functions.NativeExprs
            .wordShingles(TextStats.tokens(col("text")), 2,
              distinct = false)).as("bg"))
          .groupBy("bg").agg(count(lit(1)).as("c_xy"))
          .filter(col("c_xy") >= 5)
          .select(split(col("bg"), " ").getItem(0).as("word_a"),
            split(col("bg"), " ").getItem(1).as("word_b"), col("c_xy"))
        bi.join(uni.select(col("tok").as("word_a"), col("c").as("c_a")),
            "word_a")
          .join(uni.select(col("tok").as("word_b"), col("c").as("c_b")),
            "word_b")
          .crossJoin(broadcast(nTot))
          .select(col("word_a"), col("word_b"), col("c_xy"),
            ((col("c_xy") * col("n")).cast("double") /
              (col("c_a") * col("c_b")).cast("double")).as("lift"))
          .orderBy(desc("lift"), col("word_a"), col("word_b"))
          .limit(50)
      },
      Some(s"""WITH t AS (SELECT unnest($dTok) AS tok FROM documents),
        uni AS (SELECT tok, COUNT(*) AS c FROM t GROUP BY tok),
        ntot AS (SELECT SUM(c) AS n FROM uni),
        bgs AS (SELECT unnest(${dShingles(dTok, 2)}) AS bg FROM documents),
        bc AS (SELECT bg, COUNT(*) AS c_xy FROM bgs GROUP BY bg
          HAVING COUNT(*) >= 5),
        sp AS (SELECT string_split(bg, ' ')[1] AS word_a,
          string_split(bg, ' ')[2] AS word_b, c_xy FROM bc)
        SELECT word_a, word_b, CAST(c_xy AS BIGINT) AS c_xy,
          CAST(c_xy * n AS DOUBLE) / CAST(a.c * b.c AS DOUBLE) AS lift
        FROM sp JOIN uni a ON sp.word_a = a.tok
          JOIN uni b ON sp.word_b = b.tok CROSS JOIN ntot
        ORDER BY lift DESC, word_a, word_b LIMIT 50""")),

    // ── Chi-square keyness: distinctive terms per source (q230) ────────
    // The corpus-linguistics "keyword" statistic: per (source, token),
    // chi² over the 2×2 contingency (token-in-source vs rest), top 10
    // per source. All four cells are exact integers; chi² =
    // N·(ad−bc)²/((a+b)(c+d)(a+c)(b+d)) is evaluated in one fixed
    // left-to-right double chain written identically in the oracle, so
    // ranking and values are bit-exact. Shuffles: one on (source,
    // token), one on token (vocab-bounded marginals), one 20-row
    // broadcast of source totals — no per-doc pair work anywhere.
    QueryDef("q230_chisq_keyness",
      (s, dir) => {
        val cnt = tPar(s, dir, "documents")
          .select(col("source"), explode(TextStats.tokens(col("text")))
            .as("token"))
          .groupBy("source", "token").agg(count(lit(1)).as("a"))
          .localCheckpoint() // feeds marginals AND the chi² join
        val tokTot = cnt.groupBy("token").agg(sum("a").as("t"))
        val srcTot = cnt.groupBy("source").agg(sum("a").as("sn"))
        val nTot = cnt.agg(sum("a").as("nn"))
        val cells = cnt.join(tokTot, "token").join(broadcast(srcTot), "source")
          .crossJoin(broadcast(nTot))
          .filter(col("a") >= 5)
          .select(col("source"), col("token"), col("a"),
            (col("t") - col("a")).as("b"), (col("sn") - col("a")).as("c"),
            (col("nn") - col("sn") - (col("t") - col("a"))).as("d"),
            col("nn"))
        val num = (col("a") * col("d") - col("b") * col("c")).cast("double")
        val chi2 = col("nn").cast("double") * num * num /
          ((col("a") + col("b")) * (col("c") + col("d"))).cast("double") /
          ((col("a") + col("c")) * (col("b") + col("d"))).cast("double")
        val rw = Window.partitionBy("source")
          .orderBy(desc("chi2"), col("token"))
        cells.withColumn("chi2", chi2)
          .withColumn("rk", row_number().over(rw))
          .filter(col("rk") <= 10)
          .select(col("source"), col("token"), col("a").as("n_token_src"),
            col("chi2"), col("rk").cast("long").as("rk"))
          .orderBy("source", "rk")
      },
      Some(s"""WITH t AS (SELECT source, unnest($dTok) AS token
            FROM documents),
        cnt AS (SELECT source, token, COUNT(*) AS a FROM t GROUP BY 1, 2),
        tokt AS (SELECT token, SUM(a) AS tt FROM cnt GROUP BY token),
        srct AS (SELECT source, SUM(a) AS sn FROM cnt GROUP BY source),
        ntot AS (SELECT SUM(a) AS nn FROM cnt),
        cells AS (SELECT source, token, a, tt - a AS b, sn - a AS c,
            nn - sn - (tt - a) AS d, nn
          FROM cnt JOIN tokt USING (token) JOIN srct USING (source)
          CROSS JOIN ntot WHERE a >= 5),
        chi AS (SELECT source, token, a,
            CAST(nn AS DOUBLE) * CAST(a*d - b*c AS DOUBLE)
              * CAST(a*d - b*c AS DOUBLE)
              / CAST((a+b)*(c+d) AS DOUBLE) / CAST((a+c)*(b+d) AS DOUBLE)
              AS chi2
          FROM cells),
        rk AS (SELECT *, row_number() OVER (PARTITION BY source
            ORDER BY chi2 DESC, token) AS rk FROM chi)
        SELECT source, token, CAST(a AS BIGINT) AS n_token_src, chi2,
          CAST(rk AS BIGINT) AS rk
        FROM rk WHERE rk <= 10 ORDER BY source, rk""")),

    // ── Simpson diversity of each source's token mix (q231) ────────────
    // The corpus-mix concentration monitor: per source, the probability
    // two sampled tokens differ — D = 1 − Σ nᵢ(nᵢ−1)/(N(N−1)) — plus
    // volume and vocabulary size. The per-DOC twin lives inside q135;
    // this is the per-SOURCE report a mixing stage (q58) reads to spot
    // a source collapsing to boilerplate. Entropy needs log; Simpson is
    // one exact integer sum and a single division, so it oracle-hashes.
    QueryDef("q231_simpson_diversity",
      (s, dir) => tPar(s, dir, "documents")
        .select(col("source"), explode(TextStats.tokens(col("text")))
          .as("tok"))
        .groupBy("source", "tok").agg(count(lit(1)).as("c"))
        .groupBy("source")
        .agg(sum("c").as("n_tokens"), count(lit(1)).as("n_types"),
          sum(col("c") * (col("c") - 1)).as("ss"))
        .select(col("source"), col("n_tokens"), col("n_types"),
          (lit(1.0) - col("ss").cast("double") /
            (col("n_tokens") * (col("n_tokens") - 1)).cast("double"))
            .as("simpson_d"))
        .orderBy("source"),
      Some(s"""WITH t AS (SELECT source, unnest($dTok) AS tok
            FROM documents),
        pc AS (SELECT source, tok, COUNT(*) AS c FROM t GROUP BY 1, 2)
        SELECT source, CAST(SUM(c) AS BIGINT) AS n_tokens,
          CAST(COUNT(*) AS BIGINT) AS n_types,
          1.0 - CAST(SUM(c * (c - 1)) AS DOUBLE)
            / CAST(SUM(c) * (SUM(c) - 1) AS DOUBLE) AS simpson_d
        FROM pc GROUP BY source ORDER BY source""")),

    // ── Mann–Kendall trend test per event-type daily series (q232) ─────
    // The nonparametric "is this metric drifting" monitor: S = Σ_{i<j}
    // sign(vⱼ−vᵢ) over the daily totals, τ = S / C(n,2). Pure integers
    // after the parity-summed daily totals; the pair stage is a
    // self-join on the DAY-bounded series (days grow with time, not
    // data volume — at 100 TB/day the series is still 365 rows/year per
    // type), so the quadratic is capped exactly like q233's.
    QueryDef("q232_mann_kendall",
      (s, dir) => {
        val d = t(s, dir, "events")
          .select(col("event_type"),
            expr("unix_micros(ts) div 86400000000").as("day"), col("value"))
          .groupBy("event_type", "day").agg(dsum(col("value")).as("v"))
          .localCheckpoint() // both sides of the bounded pair self-join
        d.as("a").join(d.as("b"),
            col("a.event_type") === col("b.event_type") &&
              col("a.day") < col("b.day"))
          .select(col("a.event_type").as("event_type"),
            when(col("b.v") > col("a.v"), 1L)
              .when(col("b.v") < col("a.v"), -1L).otherwise(0L).as("sg"))
          .groupBy("event_type")
          .agg(count(lit(1)).as("n_pairs"), sum("sg").as("s_stat"))
          .select(col("event_type"), col("n_pairs"), col("s_stat"),
            (col("s_stat").cast("double") / col("n_pairs").cast("double"))
              .as("tau"))
          .orderBy("event_type")
      },
      Some(s"""WITH dly AS (SELECT event_type,
            epoch_us(ts) // 86400000000 AS day, ${dsumSql("value")} AS v
          FROM events GROUP BY 1, 2),
        p AS (SELECT a.event_type,
            CASE WHEN b.v > a.v THEN 1 WHEN b.v < a.v THEN -1 ELSE 0 END
              AS sg
          FROM dly a JOIN dly b
            ON a.event_type = b.event_type AND a.day < b.day)
        SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_pairs,
          CAST(SUM(sg) AS BIGINT) AS s_stat,
          CAST(CAST(SUM(sg) AS BIGINT) AS DOUBLE)
            / CAST(COUNT(*) AS DOUBLE) AS tau
        FROM p GROUP BY event_type ORDER BY event_type""")),

    // ── Theil–Sen robust trend slope per event type (q233) ─────────────
    // The robust complement of q194's OLS: the MEDIAN of all pairwise
    // slopes of the daily-total series — a 29% breakdown point, immune
    // to the outlier days OLS chases. Pair count is C(days,2) per type
    // (bounded by calendar time, not data volume); the median rides the
    // exact iterative-refinement machinery of q141, so no global sort
    // and no approximate percentile anywhere.
    QueryDef("q233_theil_sen",
      (s, dir) => {
        val d = t(s, dir, "events")
          .select(col("event_type"),
            expr("unix_micros(ts) div 86400000000").as("day"), col("value"))
          .groupBy("event_type", "day").agg(dsum(col("value")).as("v"))
          .localCheckpoint()
        val slopes = d.as("a").join(d.as("b"),
            col("a.event_type") === col("b.event_type") &&
              col("a.day") < col("b.day"))
          .select(col("a.event_type").as("event_type"),
            // try_divide, not /: the median engine's !isnan(slope)
            // filter references both join sides, so Catalyst pushes it
            // INTO the join condition where it can evaluate before the
            // a.day < b.day predicate — on same-day pairs the day delta
            // is 0 and ANSI plain division aborts the job. try_divide
            // yields NULL there; every pair the range predicate keeps
            // has delta ≥ 1, so emitted slopes are bit-identical.
            try_divide(col("b.v") - col("a.v"),
              (col("b.day") - col("a.day")).cast("double")).as("slope"))
        graft.ext.Stats.exactMedianByGroup(slopes, "event_type", "slope",
            buckets = 64, tail = 1024)
          .select(col("event_type"), col("n").as("n_pairs"),
            col("median").as("sen_slope"))
          .orderBy("event_type")
      },
      Some(s"""WITH dly AS (SELECT event_type,
            epoch_us(ts) // 86400000000 AS day, ${dsumSql("value")} AS v
          FROM events GROUP BY 1, 2),
        sl AS (SELECT a.event_type,
            (b.v - a.v) / CAST(b.day - a.day AS DOUBLE) AS slope
          FROM dly a JOIN dly b
            ON a.event_type = b.event_type AND a.day < b.day)
        SELECT event_type, COUNT(slope) AS n_pairs,
          median(slope) AS sen_slope
        FROM sl GROUP BY event_type ORDER BY event_type""")),

    // ── Gopher-rule document filter report (q234) ──────────────────────
    // The Rae et al. 2021 quality gates as a release report: per rule,
    // how many documents fail, plus the any-rule total. Every rule is
    // integer-exact via cross-multiplication (mean word length ∈ [3,10]
    // becomes 3w ≤ L ≤ 10w; top-unigram ≤ 20% becomes 5·max ≤ w), so
    // no per-doc float exists at all. One (doc, token) aggregation
    // cascade → per-doc flags → a single global fold unpivoted to five
    // rows; the report is O(rules) however big the corpus.
    QueryDef("q234_gopher_rules",
      (s, dir) => {
        val flags = tPar(s, dir, "documents")
          .select(col("doc_id"), explode(TextStats.tokens(col("text")))
            .as("tok"))
          .groupBy("doc_id", "tok").agg(count(lit(1)).as("c"))
          .groupBy("doc_id")
          .agg(sum("c").as("w"), max("c").as("maxc"),
            sum(col("c") * length(col("tok"))).as("l"),
            sum(when(col("tok").isin(stopwords: _*), col("c"))
              .otherwise(0L)).as("nstop"))
          .select(
            when(col("w").between(50, 100000), 0L).otherwise(1L).as("f1"),
            when(col("l") >= col("w") * 3 && col("l") <= col("w") * 10, 0L)
              .otherwise(1L).as("f2"),
            when(col("nstop") >= 2, 0L).otherwise(1L).as("f3"),
            when(col("maxc") * 5 <= col("w"), 0L).otherwise(1L).as("f4"))
        val agg = flags.agg(count(lit(1)).as("n_docs"),
          sum("f1").as("s1"), sum("f2").as("s2"), sum("f3").as("s3"),
          sum("f4").as("s4"),
          sum(when(col("f1") + col("f2") + col("f3") + col("f4") > 0, 1L)
            .otherwise(0L)).as("sany"))
        agg.select(explode(array(
            struct(lit("any_rule").as("rule"), col("sany").as("n_fail")),
            struct(lit("mean_word_length").as("rule"), col("s2").as("n_fail")),
            struct(lit("stopword_count").as("rule"), col("s3").as("n_fail")),
            struct(lit("top_unigram_frac").as("rule"), col("s4").as("n_fail")),
            struct(lit("word_count").as("rule"), col("s1").as("n_fail"))))
            .as("r"), col("n_docs"))
          .select(col("r.rule").as("rule"), col("r.n_fail").as("n_fail"),
            col("n_docs"),
            (col("r.n_fail").cast("double") / col("n_docs").cast("double"))
              .as("fail_rate"))
          .orderBy("rule")
      },
      Some {
        val stopList = stopwords.map(w => s"'$w'").mkString("[", ", ", "]")
        s"""WITH pc AS (SELECT doc_id, tok, COUNT(*) AS c
            FROM (SELECT doc_id, unnest($dTok) AS tok FROM documents)
            GROUP BY 1, 2),
          pd AS (SELECT doc_id, SUM(c) AS w, MAX(c) AS maxc,
              SUM(c * len(tok)) AS l,
              SUM(CASE WHEN list_contains($stopList, tok) THEN c ELSE 0
                END) AS nstop
            FROM pc GROUP BY doc_id),
          fl AS (SELECT
              CASE WHEN w BETWEEN 50 AND 100000 THEN 0 ELSE 1 END AS f1,
              CASE WHEN l >= w * 3 AND l <= w * 10 THEN 0 ELSE 1 END AS f2,
              CASE WHEN nstop >= 2 THEN 0 ELSE 1 END AS f3,
              CASE WHEN maxc * 5 <= w THEN 0 ELSE 1 END AS f4
            FROM pd),
          a AS (SELECT COUNT(*) AS n_docs, SUM(f1) AS s1, SUM(f2) AS s2,
              SUM(f3) AS s3, SUM(f4) AS s4,
              SUM(CASE WHEN f1 + f2 + f3 + f4 > 0 THEN 1 ELSE 0 END)
                AS sany
            FROM fl),
          u AS (
            SELECT 'any_rule' AS rule, sany AS n_fail, n_docs FROM a
            UNION ALL
            SELECT 'mean_word_length', s2, n_docs FROM a
            UNION ALL SELECT 'stopword_count', s3, n_docs FROM a
            UNION ALL SELECT 'top_unigram_frac', s4, n_docs FROM a
            UNION ALL SELECT 'word_count', s1, n_docs FROM a)
          SELECT rule, CAST(n_fail AS BIGINT) AS n_fail,
            CAST(n_docs AS BIGINT) AS n_docs,
            CAST(n_fail AS DOUBLE) / CAST(n_docs AS DOUBLE) AS fail_rate
          FROM u ORDER BY rule"""
      }),

    // ── DSIR hashed-importance-weight model (q235) ─────────────────────
    // Data Selection via Importance Resampling (Xie et al. 2023): bag-
    // of-hashed-unigrams densities for a target domain vs the raw pool,
    // add-one smoothed. The model TABLE is the deliverable (a later
    // pass scores docs by Σ log w(bucket) — log-free here because no
    // per-doc score is emitted). One aggregation keyed by the 64-way
    // portable hash bucket — the same conv(md5)-prefix hash as the
    // MinHash family, so both engines bucket identically; the model is
    // O(buckets) however large the corpus.
    QueryDef("q235_dsir_buckets",
      (s, dir) => {
        val nB = 64
        val bt = tPar(s, dir, "documents")
          .select((col("source") === "src1").as("tgt"),
            explode(TextStats.tokens(col("text"))).as("tok"))
          .select((graft.ext.Shingles.baseHash(col("tok")) % nB)
            .as("bucket"), col("tgt"))
          .groupBy("bucket")
          .agg(sum(when(col("tgt"), 1L).otherwise(0L)).as("n_target"),
            sum(when(!col("tgt"), 1L).otherwise(0L)).as("n_raw"))
          .localCheckpoint() // feeds totals AND the weight projection
        val tot = bt.agg(sum("n_target").as("nt"), sum("n_raw").as("nr"))
        bt.crossJoin(broadcast(tot))
          .select(col("bucket"), col("n_target"), col("n_raw"),
            (((col("n_target") + 1) * (col("nr") + nB)).cast("double") /
              ((col("n_raw") + 1) * (col("nt") + nB)).cast("double"))
              .as("weight"))
          .orderBy("bucket")
      },
      Some(s"""WITH t AS (SELECT source = 'src1' AS tgt,
            unnest($dTok) AS tok FROM documents),
        b AS (SELECT ('0x' || substr(md5(tok), 1, 7))::BIGINT % 64
              AS bucket,
            SUM(CASE WHEN tgt THEN 1 ELSE 0 END) AS n_target,
            SUM(CASE WHEN NOT tgt THEN 1 ELSE 0 END) AS n_raw
          FROM t GROUP BY 1),
        tot AS (SELECT SUM(n_target) AS nt, SUM(n_raw) AS nr FROM b)
        SELECT bucket, CAST(n_target AS BIGINT) AS n_target,
          CAST(n_raw AS BIGINT) AS n_raw,
          CAST((n_target + 1) * (nr + 64) AS DOUBLE)
            / CAST((n_raw + 1) * (nt + 64) AS DOUBLE) AS weight
        FROM b CROSS JOIN tot ORDER BY bucket""")),

    // ── Event-type affinity matrix (bipartite projection, q236) ────────
    // Which behaviors co-occur in the same users? The user–event-type
    // bipartite graph projected onto types: per type pair, the count of
    // users doing both and the Jaccard affinity c_ab/(c_a+c_b−c_ab).
    // The self-join fans out ≤ C(|types|,2) pairs PER USER (types are a
    // bounded dimension), so the pair stage is linear in users — the
    // co-occurrence shape that stays cheap when users are 10⁹.
    QueryDef("q236_type_affinity",
      (s, dir) => {
        val ut = t(s, dir, "events")
          .select(col("user_id"), col("event_type")).distinct()
          .localCheckpoint() // three consumers: both join sides + counts
        val c = ut.groupBy("event_type").agg(count(lit(1)).as("c"))
        val p = ut.as("a").join(ut.as("b"),
            col("a.user_id") === col("b.user_id") &&
              col("a.event_type") < col("b.event_type"))
          .select(col("a.event_type").as("type_a"),
            col("b.event_type").as("type_b"))
          .groupBy("type_a", "type_b").agg(count(lit(1)).as("c_ab"))
        p.join(broadcast(c.select(col("event_type").as("type_a"),
            col("c").as("c_a"))), "type_a")
          .join(broadcast(c.select(col("event_type").as("type_b"),
            col("c").as("c_b"))), "type_b")
          .select(col("type_a"), col("type_b"), col("c_ab"), col("c_a"),
            col("c_b"),
            (col("c_ab").cast("double") /
              (col("c_a") + col("c_b") - col("c_ab")).cast("double"))
              .as("jaccard"))
          .orderBy("type_a", "type_b")
      },
      Some("""WITH ut AS (SELECT DISTINCT user_id, event_type FROM events),
        c AS (SELECT event_type, COUNT(*) AS c FROM ut GROUP BY 1),
        p AS (SELECT a.event_type AS type_a, b.event_type AS type_b,
            COUNT(*) AS c_ab
          FROM ut a JOIN ut b ON a.user_id = b.user_id
            AND a.event_type < b.event_type
          GROUP BY 1, 2)
        SELECT type_a, type_b, CAST(c_ab AS BIGINT) AS c_ab,
          CAST(ca.c AS BIGINT) AS c_a, CAST(cb.c AS BIGINT) AS c_b,
          CAST(c_ab AS DOUBLE) / CAST(ca.c + cb.c - c_ab AS DOUBLE)
            AS jaccard
        FROM p JOIN c ca ON p.type_a = ca.event_type
          JOIN c cb ON p.type_b = cb.event_type
        ORDER BY type_a, type_b""")),

    // ── Chao1 vocabulary-richness estimator per source (q237) ──────────
    // "How much vocabulary HAVEN'T we crawled yet?" — the ecology
    // species estimator (Chao 1984) on token types: chao1 = D +
    // f1(f1−1)/(2(f2+1)) from the observed type count and the
    // singleton/doubleton counts (bias-corrected form, so the f2=0 case
    // divides by 2 instead of 0). Everything up to one final division
    // is exact integers off a single (source, token) aggregation —
    // the same cascade shape as q231, O(|sources|) output forever.
    QueryDef("q237_chao1_richness",
      (s, dir) => tPar(s, dir, "documents")
        .select(col("source"), explode(TextStats.tokens(col("text")))
          .as("tok"))
        .groupBy("source", "tok").agg(count(lit(1)).as("c"))
        .groupBy("source")
        .agg(count(lit(1)).as("d_obs"),
          sum(when(col("c") === 1, 1L).otherwise(0L)).as("f1"),
          sum(when(col("c") === 2, 1L).otherwise(0L)).as("f2"))
        .select(col("source"), col("d_obs"), col("f1"), col("f2"),
          (col("d_obs").cast("double") +
            (col("f1") * (col("f1") - 1)).cast("double") /
              (lit(2L) * (col("f2") + 1)).cast("double")).as("chao1"))
        .orderBy("source"),
      Some(s"""WITH t AS (SELECT source, unnest($dTok) AS tok
            FROM documents),
        pc AS (SELECT source, tok, COUNT(*) AS c FROM t GROUP BY 1, 2),
        agg AS (SELECT source, COUNT(*) AS d_obs,
            SUM(CASE WHEN c = 1 THEN 1 ELSE 0 END) AS f1,
            SUM(CASE WHEN c = 2 THEN 1 ELSE 0 END) AS f2
          FROM pc GROUP BY source)
        SELECT source, CAST(d_obs AS BIGINT) AS d_obs,
          CAST(f1 AS BIGINT) AS f1, CAST(f2 AS BIGINT) AS f2,
          CAST(d_obs AS DOUBLE) + CAST(f1 * (f1 - 1) AS DOUBLE)
            / CAST(2 * (f2 + 1) AS DOUBLE) AS chao1
        FROM agg ORDER BY source""")),

    // ── Good–Turing frequency-of-frequencies table (q238) ──────────────
    // The LM smoothing workhorse: N_r per count r, the adjusted count
    // r* = (r+1)·N_{r+1}/N_r (0 when no N_{r+1} exists, the standard
    // convention), and the unseen-probability mass p0 = N_1/N. The
    // whole table derives from one vocabulary aggregation followed by
    // an O(|distinct r|) self-join on r+1 — distinct frequencies grow
    // ~log with corpus size, so the joined table is tiny at any scale.
    QueryDef("q238_good_turing",
      (s, dir) => {
        val ff = tPar(s, dir, "documents")
          .select(explode(TextStats.tokens(col("text"))).as("tok"))
          .groupBy("tok").agg(count(lit(1)).as("r"))
          .groupBy("r").agg(count(lit(1)).as("n_r"))
          .localCheckpoint() // consumed 3x: both join sides + totals
        val tot = ff.agg(sum(col("r") * col("n_r")).as("n_tok"),
          sum(when(col("r") === 1, col("n_r")).otherwise(0L)).as("n1"))
        ff.as("a")
          .join(ff.select((col("r") - 1).as("r"), col("n_r").as("n_r1"))
            .as("b"), Seq("r"), "left")
          .crossJoin(broadcast(tot))
          .select(col("r"), col("a.n_r").as("n_r"),
            (((col("r") + 1) * coalesce(col("n_r1"), lit(0L)))
              .cast("double") / col("a.n_r").cast("double")).as("r_star"),
            (col("n1").cast("double") / col("n_tok").cast("double"))
              .as("unseen_mass"))
          .orderBy("r")
      },
      Some(s"""WITH t AS (SELECT unnest($dTok) AS tok FROM documents),
        cnt AS (SELECT tok, COUNT(*) AS r FROM t GROUP BY tok),
        ff AS (SELECT r, COUNT(*) AS n_r FROM cnt GROUP BY r),
        tot AS (SELECT SUM(r * n_r) AS n_tok,
            SUM(CASE WHEN r = 1 THEN n_r ELSE 0 END) AS n1 FROM ff)
        SELECT a.r AS r, CAST(a.n_r AS BIGINT) AS n_r,
          CAST((a.r + 1) * COALESCE(b.n_r, 0) AS DOUBLE)
            / CAST(a.n_r AS DOUBLE) AS r_star,
          CAST(n1 AS DOUBLE) / CAST(n_tok AS DOUBLE) AS unseen_mass
        FROM ff a LEFT JOIN ff b ON b.r = a.r + 1 CROSS JOIN tot
        ORDER BY r""")),

    // ── Token burstiness: index of dispersion over documents (q239) ────
    // Boilerplate tokens clump (variance ≫ mean across docs); content
    // words approach Poisson (≈1). Fano factor over ALL docs including
    // zeros reduces to exact integers: D = (N·Σc² − (Σc)²)/(N·Σc) from
    // per-doc counts c — the zero docs contribute only through N, so no
    // dense doc×token frame ever exists. Longs hold sf1.0 comfortably
    // (N·Σc² ≲ 1e16); a 100 TB run would move the two products to
    // decimal, same shape. Top-50 rides TakeOrderedAndProject.
    QueryDef("q239_token_burstiness",
      (s, dir) => {
        val nd = t(s, dir, "documents").agg(count(lit(1)).as("n_docs"))
        tPar(s, dir, "documents")
          .select(col("doc_id"), explode(TextStats.tokens(col("text")))
            .as("tok"))
          .groupBy("tok", "doc_id").agg(count(lit(1)).as("c"))
          .groupBy("tok")
          .agg(sum("c").as("s1"), sum(col("c") * col("c")).as("s2"),
            count(lit(1)).as("df_docs"))
          .filter(col("df_docs") >= 50)
          .crossJoin(broadcast(nd))
          .select(col("tok"), col("s1").as("n_occurrences"),
            col("df_docs").as("n_docs_with"),
            ((col("n_docs") * col("s2") - col("s1") * col("s1"))
              .cast("double") /
              (col("n_docs") * col("s1")).cast("double")).as("dispersion"))
          .orderBy(desc("dispersion"), col("tok"))
          .limit(50)
      },
      Some(s"""WITH t AS (SELECT doc_id, unnest($dTok) AS tok
            FROM documents),
        pc AS (SELECT tok, doc_id, COUNT(*) AS c FROM t GROUP BY 1, 2),
        st AS (SELECT tok, SUM(c) AS s1, SUM(c * c) AS s2,
            COUNT(*) AS df_docs
          FROM pc GROUP BY tok HAVING COUNT(*) >= 50),
        nd AS (SELECT COUNT(*) AS n_docs FROM documents)
        SELECT tok, CAST(s1 AS BIGINT) AS n_occurrences,
          CAST(df_docs AS BIGINT) AS n_docs_with,
          CAST(n_docs * s2 - s1 * s1 AS DOUBLE)
            / CAST(n_docs * s1 AS DOUBLE) AS dispersion
        FROM st CROSS JOIN nd ORDER BY dispersion DESC, tok LIMIT 50""")),

    // ── Per-document shingle novelty by arrival order (q240) ───────────
    // The streaming-ingest view of dedup: treating doc_id as arrival
    // order, what fraction of each document's distinct k-shingles is
    // seen here FIRST? A corpus going stale shows novelty decaying
    // toward 0; verbatim re-crawls sit at exactly 0. min(doc_id) per
    // shingle is one map-side-combinable aggregation; the join back is
    // on the same shingle key — two shuffles, never pairwise.
    QueryDef("q240_shingle_novelty",
      (s, dir) => {
        val sh = tPar(s, dir, "documents")
          .select(col("doc_id"), explode(graft.functions.NativeExprs
            .wordShingles(TextStats.tokens(col("text")), shingleK,
              distinct = true)).as("shingle"))
          .localCheckpoint() // min-agg side + join probe side
        val fm = sh.groupBy("shingle").agg(min("doc_id").as("first_doc"))
        sh.join(fm, "shingle")
          .groupBy("doc_id")
          .agg(count(lit(1)).as("n_shingles"),
            sum(when(col("first_doc") === col("doc_id"), 1L).otherwise(0L))
              .as("n_novel"))
          .select(col("doc_id"), col("n_shingles"), col("n_novel"),
            (col("n_novel").cast("double") / col("n_shingles").cast("double"))
              .as("novelty"))
          .orderBy("doc_id")
      },
      Some(s"""WITH sh AS (SELECT doc_id, unnest(list_distinct(
            ${dShingles(dTok, shingleK)})) AS shingle FROM documents),
        fm AS (SELECT shingle, MIN(doc_id) AS first_doc FROM sh
          GROUP BY shingle)
        SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_shingles,
          CAST(SUM(CASE WHEN first_doc = doc_id THEN 1 ELSE 0 END)
            AS BIGINT) AS n_novel,
          CAST(SUM(CASE WHEN first_doc = doc_id THEN 1 ELSE 0 END)
            AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) AS novelty
        FROM sh JOIN fm USING (shingle) GROUP BY doc_id
        ORDER BY doc_id""")),

    // ── Boilerplate shingle report: top in-source templates (q241) ─────
    // The template detector behind span dedup: per source, the 10
    // k-shingles appearing in the largest FRACTION of its documents
    // (countDistinct doc, not raw count — a shingle repeated inside one
    // doc is repetition, q135's business, not boilerplate). Rank-based
    // rather than a fixed ratio cut so the report never comes back
    // empty on a clean corpus; df/n_docs contextualizes each hit. The
    // heavy aggregation is keyed by (source, shingle) — the natural
    // shuffle key — and the per-source top-10 is a bounded window.
    QueryDef("q241_boilerplate_shingles",
      (s, dir) => {
        val docsPer = t(s, dir, "documents").groupBy("source")
          .agg(count(lit(1)).as("n_docs"))
        val df = tPar(s, dir, "documents")
          .select(col("source"), col("doc_id"),
            explode(graft.functions.NativeExprs.wordShingles(
              TextStats.tokens(col("text")), shingleK, distinct = true))
              .as("shingle"))
          .groupBy("source", "shingle")
          .agg(countDistinct("doc_id").as("df"))
        val rw = Window.partitionBy("source")
          .orderBy(desc("df"), col("shingle"))
        df.join(broadcast(docsPer), "source")
          .withColumn("rk", row_number().over(rw))
          .filter(col("rk") <= 10)
          .select(col("source"), col("shingle"), col("df"), col("n_docs"),
            (col("df").cast("double") / col("n_docs").cast("double"))
              .as("df_ratio"), col("rk").cast("long").as("rk"))
          .orderBy("source", "rk")
      },
      Some(s"""WITH sh AS (SELECT source, doc_id, unnest(list_distinct(
            ${dShingles(dTok, shingleK)})) AS shingle FROM documents),
        df AS (SELECT source, shingle, COUNT(DISTINCT doc_id) AS df
          FROM sh GROUP BY 1, 2),
        nd AS (SELECT source, COUNT(*) AS n_docs FROM documents
          GROUP BY source),
        rk AS (SELECT source, shingle, df, n_docs,
            row_number() OVER (PARTITION BY source
              ORDER BY df DESC, shingle) AS rk
          FROM df JOIN nd USING (source))
        SELECT source, shingle, CAST(df AS BIGINT) AS df,
          CAST(n_docs AS BIGINT) AS n_docs,
          CAST(df AS DOUBLE) / CAST(n_docs AS DOUBLE) AS df_ratio,
          CAST(rk AS BIGINT) AS rk
        FROM rk WHERE rk <= 10 ORDER BY source, rk""")),

    // ── Cross-source shingle overlap: leakage matrix (q242) ────────────
    // "Is my eval shard leaking into training?" — Jaccard between each
    // source PAIR's distinct-shingle sets. The pair stage explodes per
    // shingle over the sources sharing it: sources are a bounded
    // dimension (≤ C(|sources|,2) pairs per shingle), so the fan-out is
    // linear in distinct shingles — the same bounded-projection trick
    // as q236, never a doc-pair join.
    QueryDef("q242_source_overlap",
      (s, dir) => {
        val ss = tPar(s, dir, "documents")
          .select(col("source"), explode(graft.functions.NativeExprs
            .wordShingles(TextStats.tokens(col("text")), shingleK,
              distinct = true)).as("shingle"))
          .distinct()
          .localCheckpoint() // both pair-join sides + the size counts
        val sz = ss.groupBy("source").agg(count(lit(1)).as("n"))
        val p = ss.as("a").join(ss.as("b"),
            col("a.shingle") === col("b.shingle") &&
              col("a.source") < col("b.source"))
          .select(col("a.source").as("source_a"),
            col("b.source").as("source_b"))
          .groupBy("source_a", "source_b").agg(count(lit(1)).as("c_ab"))
        p.join(broadcast(sz.select(col("source").as("source_a"),
            col("n").as("n_a"))), "source_a")
          .join(broadcast(sz.select(col("source").as("source_b"),
            col("n").as("n_b"))), "source_b")
          .select(col("source_a"), col("source_b"), col("c_ab"),
            col("n_a"), col("n_b"),
            (col("c_ab").cast("double") /
              (col("n_a") + col("n_b") - col("c_ab")).cast("double"))
              .as("jaccard"))
          .orderBy("source_a", "source_b")
      },
      Some(s"""WITH ss AS (SELECT DISTINCT source, shingle
          FROM (SELECT source, unnest(list_distinct(
            ${dShingles(dTok, shingleK)})) AS shingle FROM documents)),
        sz AS (SELECT source, COUNT(*) AS n FROM ss GROUP BY source),
        p AS (SELECT a.source AS source_a, b.source AS source_b,
            COUNT(*) AS c_ab
          FROM ss a JOIN ss b ON a.shingle = b.shingle
            AND a.source < b.source
          GROUP BY 1, 2)
        SELECT source_a, source_b, CAST(c_ab AS BIGINT) AS c_ab,
          CAST(x.n AS BIGINT) AS n_a, CAST(y.n AS BIGINT) AS n_b,
          CAST(c_ab AS DOUBLE) / CAST(x.n + y.n - c_ab AS DOUBLE)
            AS jaccard
        FROM p JOIN sz x ON p.source_a = x.source
          JOIN sz y ON p.source_b = y.source
        ORDER BY source_a, source_b""")),

    // ── Materialized-aggregate rewrite, oracle-gated (q243) ────────────
    // The MvRewrite optimizer rule end to end: build a (source, lang)
    // rollup MV of `documents`, register it, and run the per-source
    // rollup against the BASE scan — the rule must answer it from the
    // MV (asserted on the optimized plan, not assumed), and the rows
    // the rewritten plan computes must match DuckDB aggregating the
    // base table directly. `localCheckpoint` materializes while the
    // rule is live, so the dumped rows really come from the MV path.
    // At 100 TB this plan never touches the fact table: the scan is
    // |distinct (source, lang)| rows.
    QueryDef("q243_mv_rollup",
      (s, dir) => {
        import graft.plans.MvRewrite
        // plain parquet read on BOTH sides of the registration: the
        // rule matches the scan's qualified root path
        val basePath = s"$dir/documents.parquet"
        val base = s.read.parquet(basePath)
        // fixed path + overwrite, NOT a fresh temp dir per call: bench
        // harnesses build this query many times (warmups × rounds) and
        // per-call temp dirs would accumulate full MV copies in /tmp
        val mvPath = sys.props("java.io.tmpdir") + "/graft_q243_docs_mv"
        base.groupBy("source", "lang")
          .agg(sum("n_chars").as("sum_chars"),
            min("n_chars").as("min_chars"),
            max("n_chars").as("max_chars"),
            count(lit(1)).as("cnt"))
          .write.mode("overwrite").parquet(mvPath)
        MvRewrite.register(basePath, s.read.parquet(mvPath),
          groupCols = Seq("source", "lang"),
          sumCols = Map("n_chars" -> "sum_chars"),
          minCols = Map("n_chars" -> "min_chars"),
          maxCols = Map("n_chars" -> "max_chars"),
          countCol = Some("cnt"))
        val added = s.experimental.synchronized {
          val absent = !s.experimental.extraOptimizations.contains(MvRewrite)
          if (absent) s.experimental.extraOptimizations =
            s.experimental.extraOptimizations :+ MvRewrite
          absent
        }
        s.conf.set(MvRewrite.ConfKey, "true")
        try {
          // the lang predicate reads a GRAIN column, so it commutes
          // with the rollup and must ride onto the MV scan — the
          // filtered-dashboard shape, also answered without the base
          val q = base.filter(col("lang") =!= "zh")
            .groupBy("source")
            .agg(sum("n_chars").as("sum_chars"), count(lit(1)).as("n_docs"),
              min("n_chars").as("min_chars"), max("n_chars").as("max_chars"))
            .orderBy("source")
          val scans = q.queryExecution.optimizedPlan.collect {
            case l: org.apache.spark.sql.execution.datasources.LogicalRelation =>
              l.relation match {
                case fs: org.apache.spark.sql.execution.datasources.HadoopFsRelation =>
                  fs.location.rootPaths.map(_.toString)
                case _ => Seq.empty[String]
              }
          }.flatten
          require(scans.nonEmpty && scans.forall(_.contains("docs_mv")),
            s"q243: the rollup must be answered from the MV scan, got $scans")
          q.localCheckpoint() // materialize THROUGH the rewritten plan
        } finally {
          s.conf.unset(MvRewrite.ConfKey)
          if (added) s.experimental.synchronized {
            s.experimental.extraOptimizations =
              s.experimental.extraOptimizations.filterNot(_ == MvRewrite)
          }
          MvRewrite.clear()
        }
      },
      Some("""SELECT source, CAST(SUM(n_chars) AS BIGINT) AS sum_chars,
          COUNT(*) AS n_docs, MIN(n_chars) AS min_chars,
          MAX(n_chars) AS max_chars
        FROM documents WHERE lang <> 'zh'
        GROUP BY source ORDER BY source""")),

    // ── Mean reciprocal rank @10 (q245) ────────────────────────────────
    // The retrieval-eval metric next to nDCG (q209), same framing: per
    // source, docs ranked by the hash-derived model score m, relevant
    // when the quality score clears 0.5. first_rank = the first
    // relevant position within the top 10 (0 = none), rr = 1/first_rank
    // as a PRECOMPUTED 12-dp decimal literal — like q209's discounts,
    // the lookup table replaces a runtime division, so there is no
    // float-division parity surface at all. Collapse-then-compute: the
    // per-source top-10 rides the TopKPerKey heap (never a global
    // sort), and all arithmetic happens on O(|sources|) rows.
    QueryDef("q245_mrr",
      (s, dir) => {
        val rr = Seq("1.000000000000", "0.500000000000",
          "0.333333333333", "0.250000000000", "0.200000000000",
          "0.166666666667", "0.142857142857", "0.125000000000",
          "0.111111111111", "0.100000000000")
        val d = tPar(s, dir, "documents").select(
          col("source"), col("doc_id"),
          (Shingles.baseHash(col("text")) % 999).as("m"),
          when(TextStats.qualityScore(col("text"), stopwords) >= 0.5,
            1L).otherwise(0L).as("y"))
        val top = graft.plans.TopKPerKey.topKPerKey(d, Seq("source"),
          Seq(graft.plans.TopKPerKey.Sort("m", asc = false),
            graft.plans.TopKPerKey.Sort("doc_id")), 10)
        val first = top.filter(col("y") === 1)
          .groupBy("source").agg(min(col("rank")).as("first_rank"))
        val rrAt = rr.zipWithIndex.tail.foldLeft(
          when(col("first_rank") === 1,
            expr(s"CAST(${rr.head} AS DECIMAL(14,12))"))) {
          case (acc, (v, i)) => acc.when(col("first_rank") === i + 1,
            expr(s"CAST($v AS DECIMAL(14,12))"))
        }
        d.select("source").distinct()
          .join(first, Seq("source"), "left")
          .select(col("source"),
            coalesce(col("first_rank"), lit(0L)).cast("long")
              .as("first_rank"),
            coalesce(rrAt.cast("double"), lit(0.0)).as("rr"))
          .orderBy("source")
      },
      Some {
        val rrCase = Seq("1.000000000000", "0.500000000000",
          "0.333333333333", "0.250000000000", "0.200000000000",
          "0.166666666667", "0.142857142857", "0.125000000000",
          "0.111111111111", "0.100000000000").zipWithIndex.map {
          case (v, i) => s"WHEN ${i + 1} THEN CAST($v AS DECIMAL(14,12))"
        }.mkString("CASE first_rank ", " ", " END")
        s"""WITH d AS (SELECT source, doc_id,
            ('0x' || substr(md5(text), 1, 7))::BIGINT % 999 AS m,
            CASE WHEN $dQualityExpr >= 0.5 THEN 1 ELSE 0 END AS y
          FROM documents),
        ranked AS (SELECT source, y, row_number() OVER (
            PARTITION BY source ORDER BY m DESC, doc_id) AS rank
          FROM d),
        first AS (SELECT source, MIN(rank) AS first_rank
          FROM ranked WHERE rank <= 10 AND y = 1 GROUP BY source)
        SELECT d.source,
          CAST(COALESCE(first_rank, 0) AS BIGINT) AS first_rank,
          COALESCE(CAST($rrCase AS DOUBLE), 0.0) AS rr
        FROM (SELECT DISTINCT source FROM d) d
          LEFT JOIN first ON d.source = first.source
        ORDER BY d.source"""
      }),

    // ── Quantile treatment effect (q254) ───────────────────────────────
    // Experiments move DISTRIBUTIONS, not just means: per-user total
    // purchase value (decimal-exact so the sample values are
    // bit-identical cross-engine before any quantile logic), arms from
    // the q222 hash split, and the exact per-arm quantiles at
    // P25/P50/P75 on the distributed refinement engine (q144's
    // machinery — never a global sort). QTE(p) = q_T(p) − q_C(p).
    QueryDef("q254_qte",
      (s, dir) => {
        val per = t(s, dir, "events")
          .filter(col("event_type") === "purchase")
          .groupBy("user_id")
          .agg(sum(col("value").cast("decimal(18,6)")).cast("double")
            .as("metric"))
          .select((Shingles.baseHash(col("user_id").cast("string")) % 2)
            .as("arm"), col("metric"))
        val q = graft.ext.Stats.exactQuantilesByGroup(
          per, "arm", "metric", Seq(0.25, 0.5, 0.75),
          buckets = 64, tail = 64)
        val qt = q.filter(col("arm") === 1)
          .select(col("p"), col("n").as("n_t"),
            col("quantile").as("q_t"))
        val qc = q.filter(col("arm") === 0)
          .select(col("p").as("p_c"), col("n").as("n_c"),
            col("quantile").as("q_c"))
        qt.join(qc, col("p") === col("p_c"))
          .select(col("p"), col("n_t"), col("n_c"), col("q_t"),
            col("q_c"), (col("q_t") - col("q_c")).as("qte"))
          .orderBy("p")
      },
      Some("""WITH per AS (SELECT
            ('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 7))::BIGINT
              % 2 AS arm,
            CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS metric
          FROM events WHERE event_type = 'purchase' GROUP BY user_id),
        q AS (SELECT arm, COUNT(metric) AS n,
            quantile_cont(metric, 0.25) AS p25,
            quantile_cont(metric, 0.5) AS p50,
            quantile_cont(metric, 0.75) AS p75
          FROM per GROUP BY arm),
        un AS (SELECT arm, n, x.p,
            CASE x.p WHEN 0.25::DOUBLE THEN p25
                     WHEN 0.5::DOUBLE THEN p50 ELSE p75 END AS quantile
          FROM q CROSS JOIN (VALUES (0.25::DOUBLE), (0.5::DOUBLE),
            (0.75::DOUBLE)) x(p))
        SELECT t.p, t.n AS n_t, c.n AS n_c,
          t.quantile AS q_t, c.quantile AS q_c,
          t.quantile - c.quantile AS qte
        FROM (SELECT * FROM un WHERE arm = 1) t
          JOIN (SELECT * FROM un WHERE arm = 0) c ON t.p = c.p
        ORDER BY t.p""")),

    // ── Difference-in-differences (q252) ───────────────────────────────
    // The panel estimator: per-user purchase counts in the pre and
    // post halves (q249's integer midpoint split), arms from the q222
    // user-level hash; DiD = (ȳT,post − ȳT,pre) − (ȳC,post − ȳC,pre),
    // with the standard error from the per-user DIFF variance (the
    // paired formulation, robust to user-level autocorrelation). One
    // per-user conditional aggregation; the panel is 2 arms × exact
    // BIGINT moment sums, so every mean/variance is a single double
    // division of exact operands and the t-statistic is the same
    // literal chain on both engines (sqrt is IEEE-portable).
    QueryDef("q252_did",
      (s, dir) => {
        val ev = t(s, dir, "events")
          .select(col("user_id"), col("event_type"),
            expr("unix_micros(ts) div 86400000000").as("day"))
        val split = ev.agg(min("day").as("mind"), max("day").as("maxd"))
          .select(expr("(mind + maxd) div 2").as("split"))
        val per = ev.crossJoin(broadcast(split))
          .groupBy("user_id")
          .agg(sum(when(col("day") < col("split") &&
            col("event_type") === "purchase", 1L).otherwise(0L))
            .as("y_pre"),
            sum(when(col("day") >= col("split") &&
              col("event_type") === "purchase", 1L).otherwise(0L))
              .as("y_post"))
          .select((Shingles.baseHash(col("user_id").cast("string")) % 2)
            .as("arm"), col("y_pre"), col("y_post"),
            (col("y_post") - col("y_pre")).as("d"))
        val arms = per.groupBy("arm")
          .agg(count(lit(1)).as("n"),
            sum("y_pre").as("sp"), sum("y_post").as("so"),
            sum("d").as("sd"), sum(col("d") * col("d")).as("sdd"))
          .select(col("arm"), col("n"),
            (col("sp").cast("double") / col("n").cast("double"))
              .as("mean_pre"),
            (col("so").cast("double") / col("n").cast("double"))
              .as("mean_post"),
            ((col("n") * col("sdd") - col("sd") * col("sd"))
              .cast("double") /
              (col("n") * (col("n") - 1)).cast("double")).as("var_d"))
        val t0 = arms.filter(col("arm") === 0)
          .select(col("n").as("n_c"), col("mean_pre").as("pre_c"),
            col("mean_post").as("post_c"), col("var_d").as("vd_c"))
        val t1 = arms.filter(col("arm") === 1)
          .select(col("n").as("n_t"), col("mean_pre").as("pre_t"),
            col("mean_post").as("post_t"), col("var_d").as("vd_t"))
        t1.crossJoin(broadcast(t0))
          .select(col("n_t"), col("n_c"),
            col("pre_t"), col("post_t"), col("pre_c"), col("post_c"),
            ((col("post_t") - col("pre_t")) -
              (col("post_c") - col("pre_c"))).as("did"),
            sqrt(col("vd_t") / col("n_t") + col("vd_c") / col("n_c"))
              .as("se"))
          .withColumn("t_stat", col("did") / col("se"))
      },
      Some("""WITH ev AS (SELECT user_id, event_type,
            epoch_us(ts) // 86400000000 AS day FROM events),
        sp AS (SELECT (MIN(day) + MAX(day)) // 2 AS split FROM ev),
        per AS (SELECT
            ('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 7))::BIGINT
              % 2 AS arm,
            CAST(SUM(CASE WHEN day < split AND event_type = 'purchase'
              THEN 1 ELSE 0 END) AS BIGINT) AS y_pre,
            CAST(SUM(CASE WHEN day >= split AND event_type = 'purchase'
              THEN 1 ELSE 0 END) AS BIGINT) AS y_post
          FROM ev CROSS JOIN sp GROUP BY user_id),
        pd AS (SELECT arm, y_pre, y_post, y_post - y_pre AS d FROM per),
        arms AS (SELECT arm, COUNT(*) AS n,
            CAST(SUM(y_pre) AS BIGINT) AS spr,
            CAST(SUM(y_post) AS BIGINT) AS so,
            CAST(SUM(d) AS BIGINT) AS sd,
            CAST(SUM(d * d) AS BIGINT) AS sdd
          FROM pd GROUP BY arm),
        am AS (SELECT arm, n,
            CAST(spr AS DOUBLE) / CAST(n AS DOUBLE) AS mean_pre,
            CAST(so AS DOUBLE) / CAST(n AS DOUBLE) AS mean_post,
            CAST(n * sdd - sd * sd AS DOUBLE) /
              CAST(n * (n - 1) AS DOUBLE) AS var_d
          FROM arms)
        SELECT t.n AS n_t, c.n AS n_c,
          t.mean_pre AS pre_t, t.mean_post AS post_t,
          c.mean_pre AS pre_c, c.mean_post AS post_c,
          (t.mean_post - t.mean_pre) - (c.mean_post - c.mean_pre)
            AS did,
          sqrt(t.var_d / t.n + c.var_d / c.n) AS se,
          ((t.mean_post - t.mean_pre) - (c.mean_post - c.mean_pre)) /
            sqrt(t.var_d / t.n + c.var_d / c.n) AS t_stat
        FROM (SELECT * FROM am WHERE arm = 1) t
          CROSS JOIN (SELECT * FROM am WHERE arm = 0) c""")),

    // ── Required sample size / power calculator (q253) ─────────────────
    // Experiment-design closure of the A/B family: from the two arms'
    // observed (user, day)-grain conversion rates (q222's framing),
    // the standard two-proportion sample size per arm to detect the
    // OBSERVED lift at α = 0.05 (two-sided) and 80% power:
    // n = (z_α·sqrt(2·p̄·q̄) + z_β·sqrt(p1q1 + p2q2))² / δ². The normal
    // quantiles are PRECOMPUTED literals (1.959963984540,
    // 0.841621233573) — the q209 discount-table rule: no libm inverse
    // CDF on either engine. All inputs are exact-integer ratios, so
    // the formula chain and final CEIL are bit-identical.
    QueryDef("q253_power_calc",
      (s, dir) => {
        val za = lit(1.959963984540)
        val zb = lit(0.841621233573)
        val per = t(s, dir, "events")
          .groupBy(col("user_id"),
            expr("unix_micros(ts) div 86400000000").as("day"))
          .agg(max(when(col("event_type") === "view", 1L).otherwise(0L))
            .as("viewed"),
            max(when(col("event_type") === "purchase", 1L).otherwise(0L))
              .as("purchased"))
          .filter(col("viewed") === 1)
          .select((Shingles.baseHash(col("user_id").cast("string")) % 2)
            .as("arm"), col("purchased"))
        val ab = per.agg(
          sum(when(col("arm") === 0, 1L).otherwise(0L)).as("n1"),
          sum(when(col("arm") === 0, col("purchased")).otherwise(0L))
            .as("c1"),
          sum(when(col("arm") === 1, 1L).otherwise(0L)).as("n2"),
          sum(when(col("arm") === 1, col("purchased")).otherwise(0L))
            .as("c2"))
        ab.select(
            (col("c1").cast("double") / col("n1").cast("double")).as("p1"),
            (col("c2").cast("double") / col("n2").cast("double")).as("p2"),
            ((col("c1") + col("c2")).cast("double") /
              (col("n1") + col("n2")).cast("double")).as("pbar"))
          .select(col("p1"), col("p2"), (col("p2") - col("p1")).as("delta"),
            col("pbar"),
            ((za * sqrt(lit(2.0) * col("pbar") * (lit(1.0) - col("pbar")))
              + zb * sqrt(col("p1") * (lit(1.0) - col("p1")) +
                col("p2") * (lit(1.0) - col("p2")))) /
              (col("p2") - col("p1"))).as("root"))
          .select(col("p1"), col("p2"), col("delta"),
            ceil(col("root") * col("root")).cast("long")
              .as("n_per_arm"))
      },
      Some("""WITH per AS (SELECT user_id,
            epoch_us(ts) // 86400000000 AS day,
            MAX(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END)
              AS viewed,
            MAX(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
              AS purchased
          FROM events GROUP BY 1, 2),
        armd AS (SELECT
            ('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 7))::BIGINT
              % 2 AS arm, purchased
          FROM per WHERE viewed = 1),
        ab AS (SELECT
            CAST(SUM(CASE WHEN arm = 0 THEN 1 ELSE 0 END) AS BIGINT)
              AS n1,
            CAST(SUM(CASE WHEN arm = 0 THEN purchased ELSE 0 END)
              AS BIGINT) AS c1,
            CAST(SUM(CASE WHEN arm = 1 THEN 1 ELSE 0 END) AS BIGINT)
              AS n2,
            CAST(SUM(CASE WHEN arm = 1 THEN purchased ELSE 0 END)
              AS BIGINT) AS c2
          FROM armd),
        p AS (SELECT
            CAST(c1 AS DOUBLE) / CAST(n1 AS DOUBLE) AS p1,
            CAST(c2 AS DOUBLE) / CAST(n2 AS DOUBLE) AS p2,
            CAST(c1 + c2 AS DOUBLE) / CAST(n1 + n2 AS DOUBLE) AS pbar
          FROM ab),
        r AS (SELECT p1, p2, p2 - p1 AS delta,
            (1.959963984540 * sqrt(2.0 * pbar * (1.0 - pbar))
              + 0.841621233573 * sqrt(p1 * (1.0 - p1) + p2 * (1.0 - p2)))
              / (p2 - p1) AS root
          FROM p)
        SELECT p1, p2, delta,
          CAST(CEIL(root * root) AS BIGINT) AS n_per_arm
        FROM r""")),

    // ── Shapley channel attribution (q251) ─────────────────────────────
    // Data-driven multi-touch attribution: per (user, day) journey the
    // SET of touch channels and whether it converted; v(S) = observed
    // conversion rate of journeys with exactly coalition S (0 when
    // unobserved); φ_c = Σ_{S ⊆ C\{c}} w(|S|)·(v(S∪{c}) − v(S)) with
    // the exact Shapley kernel w(s) = s!(|C|−1−s)!/|C|!. The |C| = 4
    // channels give 32 (channel, subset) terms — generated ONCE in
    // Scala and interpolated into BOTH the Spark literal frame and the
    // oracle's VALUES list, so the coalition table cannot drift
    // between engines. Collapse-then-compute: journeys reduce to ≤16
    // observed coalition rows; everything after is O(32). Float
    // parity: v is a single division of exact integers, w is a shared
    // double literal, and φ rides the decimal-sum discipline.
    QueryDef("q251_shapley_attribution",
      (s, dir) => {
        val chs = Seq("click", "error", "signup", "view")
        def subsets(xs: Seq[String]): Seq[Seq[String]] =
          xs.foldLeft(Seq(Seq.empty[String])) { (acc, x) =>
            acc ++ acc.map(_ :+ x) }
        val wAt = Map(0 -> 0.25, 1 -> 0.083333333333,
          2 -> 0.083333333333, 3 -> 0.25)
        val pairs = for {
          c <- chs
          sub <- subsets(chs.filterNot(_ == c))
        } yield (c, sub.sorted.mkString(","),
          (c +: sub).sorted.mkString(","), wAt(sub.size))
        val sp2 = s
        import sp2.implicits._
        val pairDf = pairs.toDF("channel", "s_wo", "s_w", "w")
        val j = t(s, dir, "events")
          .select(col("user_id"), col("event_type"),
            expr("unix_micros(ts) div 86400000000").as("day"))
          .groupBy("user_id", "day")
          .agg(array_join(sort_array(collect_set(
            when(col("event_type").isin(chs: _*), col("event_type")))),
            ",").as("sset"),
            max(when(col("event_type") === "purchase", 1L).otherwise(0L))
              .as("conv"))
          .groupBy("sset")
          .agg(count(lit(1)).as("n"), sum("conv").as("c"))
          .select(col("sset"),
            (col("c").cast("double") / col("n").cast("double")).as("v"))
        broadcast(pairDf)
          .join(j.select(col("sset").as("s_wo"), col("v").as("v0")),
            Seq("s_wo"), "left")
          .join(j.select(col("sset").as("s_w"), col("v").as("v1")),
            Seq("s_w"), "left")
          .groupBy("channel")
          .agg(dsum((coalesce(col("v1"), lit(0.0)) -
            coalesce(col("v0"), lit(0.0))) * col("w")).as("phi"))
          .orderBy("channel")
      },
      Some {
        val chs = Seq("click", "error", "signup", "view")
        def subsets(xs: Seq[String]): Seq[Seq[String]] =
          xs.foldLeft(Seq(Seq.empty[String])) { (acc, x) =>
            acc ++ acc.map(_ :+ x) }
        val wAt = Map(0 -> 0.25, 1 -> 0.083333333333,
          2 -> 0.083333333333, 3 -> 0.25)
        val values = (for {
          c <- chs
          sub <- subsets(chs.filterNot(_ == c))
        } yield s"('$c', '${sub.sorted.mkString(",")}', " +
          s"'${(c +: sub).sorted.mkString(",")}', ${wAt(sub.size)})")
          .mkString(",\n          ")
        s"""WITH pairs(channel, s_wo, s_w, w) AS (VALUES
          $values),
        j AS (SELECT user_id, epoch_us(ts) // 86400000000 AS day,
            COALESCE(array_to_string(list_sort(list_distinct(
              list(event_type) FILTER (event_type IN
                ('click', 'error', 'signup', 'view')))), ','), '')
              AS sset,
            MAX(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
              AS conv
          FROM events GROUP BY 1, 2),
        cr AS (SELECT sset,
            CAST(SUM(conv) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) AS v
          FROM j GROUP BY 1)
        SELECT channel,
          ${dsumSql("(COALESCE(b.v, 0.0) - COALESCE(a.v, 0.0)) * w")}
            AS phi
        FROM pairs
          LEFT JOIN cr a ON pairs.s_wo = a.sset
          LEFT JOIN cr b ON pairs.s_w = b.sset
        GROUP BY channel ORDER BY channel"""
      }),

    // ── Column-profile drift report (q250) ─────────────────────────────
    // Profiling-tool drift detection (the whylogs/deequ report): for
    // each monitored column, compare its first-half vs second-half
    // profile — row count, null count, exact distinct count — and emit
    // null-rate delta and the distinct-count ratio. ONE pass over the
    // stream: per-half distinct counts are conditional
    // COUNT(DISTINCT CASE ...) aggregates (Catalyst's Expand handles
    // the 6 distinct branches map-side), then the single profile row
    // fans out to one row per column via an exploded struct array —
    // no per-column rescans. All counts are exact integers; the two
    // derived doubles are single divisions of exact operands.
    QueryDef("q250_profile_drift",
      (s, dir) => {
        val ev = t(s, dir, "events")
          .select(col("user_id"), col("event_type"), col("value"),
            expr("unix_micros(ts) div 86400000000").as("day"))
        val split = ev.agg(min("day").as("mind"), max("day").as("maxd"))
          .select(expr("(mind + maxd) div 2").as("split"))
        def half(a: Boolean) =
          if (a) col("day") < col("split") else col("day") >= col("split")
        def cnt(a: Boolean) = sum(when(half(a), 1L).otherwise(0L))
        def nulls(c: String, a: Boolean) =
          sum(when(half(a) && col(c).isNull, 1L).otherwise(0L))
        def dist(c: String, a: Boolean) =
          countDistinct(when(half(a), col(c)))
        val prof = ev.crossJoin(broadcast(split)).agg(
          cnt(true).as("n_a"), cnt(false).as("n_b"),
          nulls("user_id", true).as("nu_a"),
          nulls("user_id", false).as("nu_b"),
          dist("user_id", true).as("du_a"),
          dist("user_id", false).as("du_b"),
          nulls("event_type", true).as("nt_a"),
          nulls("event_type", false).as("nt_b"),
          dist("event_type", true).as("dt_a"),
          dist("event_type", false).as("dt_b"),
          nulls("value", true).as("nv_a"), nulls("value", false).as("nv_b"),
          dist("value", true).as("dv_a"), dist("value", false).as("dv_b"))
        def rowOf(name: String, nl: String, d: String) =
          struct(lit(name).as("column_name"),
            col("n_a"), col("n_b"),
            col(s"${nl}_a").as("null_a"), col(s"${nl}_b").as("null_b"),
            col(s"${d}_a").as("distinct_a"), col(s"${d}_b").as("distinct_b"))
        prof.select(explode(array(
            rowOf("event_type", "nt", "dt"),
            rowOf("user_id", "nu", "du"),
            rowOf("value", "nv", "dv"))).as("r"))
          .select(col("r.column_name").as("column_name"),
            col("r.n_a").as("n_a"), col("r.n_b").as("n_b"),
            col("r.null_a").as("null_a"), col("r.null_b").as("null_b"),
            col("r.distinct_a").as("distinct_a"),
            col("r.distinct_b").as("distinct_b"),
            (col("r.null_b").cast("double") / col("r.n_b").cast("double") -
              col("r.null_a").cast("double") / col("r.n_a").cast("double"))
              .as("null_rate_delta"),
            (col("r.distinct_b").cast("double") /
              col("r.distinct_a").cast("double")).as("distinct_ratio"))
          .orderBy("column_name")
      },
      Some("""WITH ev AS (SELECT user_id, event_type, value,
            epoch_us(ts) // 86400000000 AS day FROM events),
        sp AS (SELECT (MIN(day) + MAX(day)) // 2 AS split FROM ev),
        prof AS (SELECT
            CAST(SUM(CASE WHEN day < split THEN 1 ELSE 0 END) AS BIGINT)
              AS n_a,
            CAST(SUM(CASE WHEN day >= split THEN 1 ELSE 0 END) AS BIGINT)
              AS n_b,
            CAST(SUM(CASE WHEN day < split AND user_id IS NULL
              THEN 1 ELSE 0 END) AS BIGINT) AS nu_a,
            CAST(SUM(CASE WHEN day >= split AND user_id IS NULL
              THEN 1 ELSE 0 END) AS BIGINT) AS nu_b,
            CAST(COUNT(DISTINCT CASE WHEN day < split THEN user_id END)
              AS BIGINT) AS du_a,
            CAST(COUNT(DISTINCT CASE WHEN day >= split THEN user_id END)
              AS BIGINT) AS du_b,
            CAST(SUM(CASE WHEN day < split AND event_type IS NULL
              THEN 1 ELSE 0 END) AS BIGINT) AS nt_a,
            CAST(SUM(CASE WHEN day >= split AND event_type IS NULL
              THEN 1 ELSE 0 END) AS BIGINT) AS nt_b,
            CAST(COUNT(DISTINCT CASE WHEN day < split THEN event_type END)
              AS BIGINT) AS dt_a,
            CAST(COUNT(DISTINCT CASE WHEN day >= split THEN event_type END)
              AS BIGINT) AS dt_b,
            CAST(SUM(CASE WHEN day < split AND value IS NULL
              THEN 1 ELSE 0 END) AS BIGINT) AS nv_a,
            CAST(SUM(CASE WHEN day >= split AND value IS NULL
              THEN 1 ELSE 0 END) AS BIGINT) AS nv_b,
            CAST(COUNT(DISTINCT CASE WHEN day < split THEN value END)
              AS BIGINT) AS dv_a,
            CAST(COUNT(DISTINCT CASE WHEN day >= split THEN value END)
              AS BIGINT) AS dv_b
          FROM ev CROSS JOIN sp),
        rows_ AS (
          SELECT 'event_type' AS column_name, n_a, n_b,
            nt_a AS null_a, nt_b AS null_b,
            dt_a AS distinct_a, dt_b AS distinct_b FROM prof
          UNION ALL
          SELECT 'user_id', n_a, n_b, nu_a, nu_b, du_a, du_b FROM prof
          UNION ALL
          SELECT 'value', n_a, n_b, nv_a, nv_b, dv_a, dv_b FROM prof)
        SELECT column_name, n_a, n_b, null_a, null_b,
          distinct_a, distinct_b,
          CAST(null_b AS DOUBLE) / CAST(n_b AS DOUBLE) -
            CAST(null_a AS DOUBLE) / CAST(n_a AS DOUBLE)
            AS null_rate_delta,
          CAST(distinct_b AS DOUBLE) / CAST(distinct_a AS DOUBLE)
            AS distinct_ratio
        FROM rows_ ORDER BY column_name""")),

    // ── CUPED variance reduction (q249) ────────────────────────────────
    // The experimentation-platform estimator (Deng et al., WSDM'13):
    // adjust each user's post-period metric Y by their PRE-period
    // activity X — Y_cuped = Y − θ(X − E[X]), θ = cov(X,Y)/var(X) —
    // shrinking metric variance by exactly ρ² without biasing the
    // treatment contrast (X predates assignment). Pre/post split at
    // the integer midpoint day; arms are the q222 user-level hash
    // split. Collapse-then-compute: one per-user conditional
    // aggregation, pooled second moments as exact BIGINT sums, O(1)
    // rows after that. Float parity: θ, means, and the adjusted means
    // are the same literal chains of double divisions over exact
    // integers on both engines; ρ² squares one exact difference.
    QueryDef("q249_cuped",
      (s, dir) => {
        val ev = t(s, dir, "events")
          .select(col("user_id"), col("event_type"),
            expr("unix_micros(ts) div 86400000000").as("day"))
        // `div`, not `/`+cast: Column./ is double division and the
        // long cast TRUNCATES where DuckDB's CAST rounds — on an odd
        // min+max the two engines would split on different days
        val split = ev.agg(min("day").as("mind"), max("day").as("maxd"))
          .select(expr("(mind + maxd) div 2").as("split"))
        val per = ev.crossJoin(broadcast(split))
          .groupBy("user_id")
          .agg(sum(when(col("day") < col("split"), 1L).otherwise(0L))
            .as("x"),
            sum(when(col("day") >= col("split") &&
              col("event_type") === "purchase", 1L).otherwise(0L))
              .as("y"))
          .select((Shingles.baseHash(col("user_id").cast("string")) % 2)
            .as("arm"), col("x"), col("y"))
          .localCheckpoint() // pooled-moments side + per-arm side
        val pooled = per.agg(count(lit(1)).as("n"),
          sum("x").as("sx"), sum("y").as("sy"),
          sum(col("x") * col("y")).as("sxy"),
          sum(col("x") * col("x")).as("sxx"),
          sum(col("y") * col("y")).as("syy"))
          .select(
            (col("n") * col("sxy") - col("sx") * col("sy")).as("covn"),
            (col("n") * col("sxx") - col("sx") * col("sx")).as("varxn"),
            (col("n") * col("syy") - col("sy") * col("sy")).as("varyn"),
            (col("sx").cast("double") / col("n").cast("double"))
              .as("mean_x_pool"))
          .select(
            (col("covn").cast("double") / col("varxn").cast("double"))
              .as("theta"),
            ((col("covn").cast("double") * col("covn").cast("double")) /
              (col("varxn").cast("double") * col("varyn").cast("double")))
              .as("rho2"),
            col("mean_x_pool"))
        per.groupBy("arm")
          .agg(count(lit(1)).as("n_users"),
            sum("x").as("sxa"), sum("y").as("sya"))
          .crossJoin(broadcast(pooled))
          .select(col("arm"), col("n_users"),
            (col("sxa").cast("double") / col("n_users").cast("double"))
              .as("mean_x"),
            (col("sya").cast("double") / col("n_users").cast("double"))
              .as("mean_y"),
            ((col("sya").cast("double") / col("n_users").cast("double")) -
              col("theta") *
              ((col("sxa").cast("double") / col("n_users").cast("double"))
                - col("mean_x_pool"))).as("mean_y_cuped"),
            col("theta"), col("rho2"))
          .orderBy("arm")
      },
      Some("""WITH ev AS (SELECT user_id, event_type,
            epoch_us(ts) // 86400000000 AS day FROM events),
        sp AS (SELECT (MIN(day) + MAX(day)) // 2 AS split FROM ev),
        per AS (SELECT
            ('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 7))::BIGINT
              % 2 AS arm,
            CAST(SUM(CASE WHEN day < split THEN 1 ELSE 0 END) AS BIGINT)
              AS x,
            CAST(SUM(CASE WHEN day >= split AND event_type = 'purchase'
              THEN 1 ELSE 0 END) AS BIGINT) AS y
          FROM ev CROSS JOIN sp GROUP BY user_id),
        mom AS (SELECT COUNT(*) AS n,
            CAST(SUM(x) AS BIGINT) AS sx, CAST(SUM(y) AS BIGINT) AS sy,
            CAST(SUM(x * y) AS BIGINT) AS sxy,
            CAST(SUM(x * x) AS BIGINT) AS sxx,
            CAST(SUM(y * y) AS BIGINT) AS syy FROM per),
        pooled AS (SELECT
            CAST(n * sxy - sx * sy AS DOUBLE) /
              CAST(n * sxx - sx * sx AS DOUBLE) AS theta,
            (CAST(n * sxy - sx * sy AS DOUBLE) *
             CAST(n * sxy - sx * sy AS DOUBLE)) /
              (CAST(n * sxx - sx * sx AS DOUBLE) *
               CAST(n * syy - sy * sy AS DOUBLE)) AS rho2,
            CAST(sx AS DOUBLE) / CAST(n AS DOUBLE) AS mean_x_pool
          FROM mom),
        arms AS (SELECT arm, COUNT(*) AS n_users,
            CAST(SUM(x) AS BIGINT) AS sxa, CAST(SUM(y) AS BIGINT) AS sya
          FROM per GROUP BY arm)
        SELECT arm, n_users,
          CAST(sxa AS DOUBLE) / CAST(n_users AS DOUBLE) AS mean_x,
          CAST(sya AS DOUBLE) / CAST(n_users AS DOUBLE) AS mean_y,
          (CAST(sya AS DOUBLE) / CAST(n_users AS DOUBLE)) - theta *
            ((CAST(sxa AS DOUBLE) / CAST(n_users AS DOUBLE))
              - mean_x_pool) AS mean_y_cuped,
          theta, rho2
        FROM arms CROSS JOIN pooled ORDER BY arm""")),

    // ── Cross-correlation lead-lag matrix (q248) ───────────────────────
    // "Does view traffic LEAD purchases?" — Pearson between two event
    // types' daily counts at every lag in ±3 days, for every type pair.
    // Collapse-then-compute: the raw stream reduces to |types|×|days|
    // daily counts ONCE; the lag join is (bounded pairs) × (7 lags) on
    // the day key, and the correlation is assembled from integer sums
    // (n, Σx, Σy, Σxy, Σx², Σy² — exact in BIGINT at this scale; a
    // 100 TB deployment would widen the Σ products to DECIMAL(38,0))
    // with one double division over a product of IEEE sqrts — both
    // engines evaluate the identical exact operands, so the doubles
    // match bitwise. Zero-variance and short-overlap series are gated
    // out by integer predicates. Days observed for only one of the two
    // types drop out of that pair's overlap (inner join by design).
    QueryDef("q248_xcorr_leadlag",
      (s, dir) => {
        val daily = t(s, dir, "events")
          .select(col("event_type"),
            expr("unix_micros(ts) div 86400000000").as("day"))
          .groupBy("event_type", "day")
          .agg(count(lit(1)).as("c"))
          .localCheckpoint() // both sides of every lag join
        val lags = s.range(-3, 4).select(col("id").as("lag"))
        val a = daily.select(col("event_type").as("type_a"),
          col("day"), col("c").as("x"))
        val b = daily.select(col("event_type").as("type_b"),
          col("day").as("day_b"), col("c").as("y"))
        a.crossJoin(broadcast(lags))
          .join(b, col("day_b") === col("day") + col("lag") &&
            col("type_a") < col("type_b"))
          .groupBy("type_a", "type_b", "lag")
          .agg(count(lit(1)).as("n_days"),
            sum("x").as("sx"), sum("y").as("sy"),
            sum(col("x") * col("y")).as("sxy"),
            sum(col("x") * col("x")).as("sxx"),
            sum(col("y") * col("y")).as("syy"))
          .filter(col("n_days") >= 10 &&
            col("n_days") * col("sxx") > col("sx") * col("sx") &&
            col("n_days") * col("syy") > col("sy") * col("sy"))
          .select(col("type_a"), col("type_b"), col("lag"), col("n_days"),
            ((col("n_days") * col("sxy") - col("sx") * col("sy"))
              .cast("double") /
              (sqrt((col("n_days") * col("sxx") - col("sx") * col("sx"))
                .cast("double")) *
               sqrt((col("n_days") * col("syy") - col("sy") * col("sy"))
                 .cast("double")))).as("xcorr"))
          .orderBy("type_a", "type_b", "lag")
      },
      Some("""WITH daily AS (SELECT event_type,
            epoch_us(ts) // 86400000000 AS day,
            CAST(COUNT(*) AS BIGINT) AS c
          FROM events GROUP BY 1, 2),
        lags AS (SELECT CAST(l AS BIGINT) AS lag
          FROM unnest([-3, -2, -1, 0, 1, 2, 3]) AS t(l)),
        m AS (SELECT a.event_type AS type_a, b.event_type AS type_b,
            lag, a.c AS x, b.c AS y
          FROM daily a CROSS JOIN lags
            JOIN daily b ON b.day = a.day + lag
              AND a.event_type < b.event_type),
        agg AS (SELECT type_a, type_b, lag, COUNT(*) AS n_days,
            CAST(SUM(x) AS BIGINT) AS sx, CAST(SUM(y) AS BIGINT) AS sy,
            CAST(SUM(x * y) AS BIGINT) AS sxy,
            CAST(SUM(x * x) AS BIGINT) AS sxx,
            CAST(SUM(y * y) AS BIGINT) AS syy
          FROM m GROUP BY 1, 2, 3)
        SELECT type_a, type_b, lag, n_days,
          CAST(n_days * sxy - sx * sy AS DOUBLE) /
            (sqrt(CAST(n_days * sxx - sx * sx AS DOUBLE)) *
             sqrt(CAST(n_days * syy - sy * sy AS DOUBLE))) AS xcorr
        FROM agg
        WHERE n_days >= 10 AND n_days * sxx > sx * sx
          AND n_days * syy > sy * sy
        ORDER BY type_a, type_b, lag""")),

    // ── Empirical-Bayes rate shrinkage (q247) ──────────────────────────
    // The shrunken-CTR estimator every ranking/ads stack runs: per-user
    // purchase conversion x/n is noisy at small n, so fit a beta prior
    // by method of moments over users with n ≥ 5 (m1 = E[r],
    // v = E[r²] − m1²; α = m1(m1(1−m1)/v − 1), β = α(1−m1)/m1) and
    // report the posterior-mean rate (x+α)/(n+α+β) — small-n users pull
    // toward the prior, high-n users keep their data. Collapse-then-
    // compute: one per-user aggregation, O(1) moment row broadcast back,
    // top-20 on a TakeOrdered heap. Float parity: moments ride the
    // decimal-sum davg discipline; every later step is the same literal
    // expression chain on both engines.
    QueryDef("q247_eb_shrinkage",
      (s, dir) => {
        val perUser = t(s, dir, "events").groupBy("user_id")
          .agg(count(lit(1)).as("n"),
            sum(when(col("event_type") === "purchase", 1L).otherwise(0L))
              .as("x"))
          .localCheckpoint() // moments side + shrinkage side
        val r = perUser.filter(col("n") >= 5)
          .select((col("x").cast("double") / col("n").cast("double"))
            .as("r"))
        val mom = r.agg(davg(col("r")).as("m1"),
            davg(col("r") * col("r")).as("m2"))
          .select(col("m1"), (col("m2") - col("m1") * col("m1")).as("v"))
          .select(col("m1"), col("v"),
            (col("m1") * (col("m1") * (lit(1.0) - col("m1")) / col("v") -
              lit(1.0))).as("alpha"))
          .select(col("m1"), col("alpha"),
            (col("alpha") * (lit(1.0) - col("m1")) / col("m1")).as("beta"))
        perUser.crossJoin(broadcast(mom))
          .select(col("user_id"), col("n"), col("x"),
            (col("x").cast("double") / col("n").cast("double"))
              .as("raw_rate"),
            ((col("x") + col("alpha")) /
              (col("n") + col("alpha") + col("beta"))).as("shrunk_rate"))
          .orderBy(col("shrunk_rate").desc, col("user_id"))
          .limit(20)
      },
      Some(s"""WITH pu AS (SELECT user_id, COUNT(*) AS n,
            CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
              AS BIGINT) AS x
          FROM events GROUP BY 1),
        rr AS (SELECT CAST(x AS DOUBLE) / CAST(n AS DOUBLE) AS r
          FROM pu WHERE n >= 5),
        mom0 AS (SELECT ${dsumSql("r")} / COUNT(r) AS m1,
            ${dsumSql("r*r")} / COUNT(r) AS m2 FROM rr),
        mom1 AS (SELECT m1, m2 - m1 * m1 AS v FROM mom0),
        mom2 AS (SELECT m1, v,
            m1 * (m1 * (1.0 - m1) / v - 1.0) AS alpha FROM mom1),
        mom AS (SELECT m1, alpha,
            alpha * (1.0 - m1) / m1 AS beta FROM mom2)
        SELECT user_id, n, x,
          CAST(x AS DOUBLE) / CAST(n AS DOUBLE) AS raw_rate,
          (x + alpha) / (n + alpha + beta) AS shrunk_rate
        FROM pu CROSS JOIN mom
        ORDER BY shrunk_rate DESC, user_id LIMIT 20""")),

    // ── HLL intersection via inclusion-exclusion (q246) ────────────────
    // The canonical mergeable-sketch caveat op: HLL unions exactly
    // (register max) but intersections only by |A∩B| ≈ est(A) + est(B)
    // − est(A∪B). Per event-type pair: both marginals, the pair-union
    // estimate from bucket-wise max registers, the inclusion-exclusion
    // intersection, and the exact overlap for error accounting. Every
    // frame after the register build is O(|types|·64) resp.
    // O(users × C(|types|,2)) — the q236 bounded-projection shape; the
    // raw events are scanned once per side, never per pair. Float
    // parity: register ranks are integers, 2^-m sums are exact dyadic
    // rationals (common denominator 2^-43, no rounding), so the single
    // division and the a+b−u chain are bit-identical cross-engine.
    QueryDef("q246_hll_intersect",
      (s, dir) => {
        import graft.ext.Sketches
        val ut = t(s, dir, "events")
          .select(col("event_type"), col("user_id")).distinct()
          .localCheckpoint() // register build + exact-overlap sides
        val reg = Sketches.hllRegisters(ut, Seq("event_type"),
          col("user_id").cast("string")).localCheckpoint() // |types|x64
        val est = Sketches.hllEstimate(reg, Seq("event_type"))
        val types = reg.select(col("event_type").as("t2")).distinct()
        val left = reg.join(types, col("event_type") < col("t2"))
          .select(col("event_type").as("type_a"), col("t2").as("type_b"),
            col("__bucket"), col("__m"))
        val right = reg.join(types, col("t2") < col("event_type"))
          .select(col("t2").as("type_a"), col("event_type").as("type_b"),
            col("__bucket"), col("__m"))
        val uest = Sketches.hllEstimate(
          left.union(right)
            .groupBy("type_a", "type_b", "__bucket")
            .agg(max("__m").as("__m")),
          Seq("type_a", "type_b"))
          .withColumnRenamed("hll_est", "est_union")
        val exact = ut.as("x").join(ut.as("y"),
            col("x.user_id") === col("y.user_id") &&
              col("x.event_type") < col("y.event_type"))
          .groupBy(col("x.event_type").as("type_a"),
            col("y.event_type").as("type_b"))
          .agg(count(lit(1)).as("exact_common"))
        uest
          .join(est.select(col("event_type").as("type_a"),
            col("hll_est").as("est_a")), "type_a")
          .join(est.select(col("event_type").as("type_b"),
            col("hll_est").as("est_b")), "type_b")
          .join(exact, Seq("type_a", "type_b"))
          .select(col("type_a"), col("type_b"), col("exact_common"),
            col("est_a"), col("est_b"), col("est_union"),
            (col("est_a") + col("est_b") - col("est_union"))
              .as("est_intersect"))
          .orderBy("type_a", "type_b")
      },
      Some("""WITH ev AS (SELECT DISTINCT event_type, user_id FROM events),
        h AS (SELECT event_type,
            ('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 12))::BIGINT
              AS h FROM ev),
        r AS (SELECT event_type, h // 4398046511104 AS bucket,
            h % 4398046511104 AS rest FROM h),
        reg AS (SELECT event_type, bucket,
            MAX(CASE WHEN rest = 0 THEN 43
                ELSE 43 - len(bin(rest)) END) AS m
          FROM r GROUP BY 1, 2),
        est AS (SELECT event_type,
            0.709 * 64.0 * 64.0 /
              ((64 - COUNT(*)) * 1.0 + SUM(pow(2.0, -m))) AS e
          FROM reg GROUP BY 1),
        types AS (SELECT DISTINCT event_type FROM reg),
        pairsrc AS (
          SELECT r.event_type AS type_a, t.event_type AS type_b,
            r.bucket, r.m
          FROM reg r JOIN types t ON r.event_type < t.event_type
          UNION ALL
          SELECT t.event_type AS type_a, r.event_type AS type_b,
            r.bucket, r.m
          FROM reg r JOIN types t ON t.event_type < r.event_type),
        ureg AS (SELECT type_a, type_b, bucket, MAX(m) AS m
          FROM pairsrc GROUP BY 1, 2, 3),
        uest AS (SELECT type_a, type_b,
            0.709 * 64.0 * 64.0 /
              ((64 - COUNT(*)) * 1.0 + SUM(pow(2.0, -m))) AS est_union
          FROM ureg GROUP BY 1, 2),
        exact AS (SELECT x.event_type AS type_a, y.event_type AS type_b,
            COUNT(*) AS exact_common
          FROM ev x JOIN ev y ON x.user_id = y.user_id
            AND x.event_type < y.event_type
          GROUP BY 1, 2)
        SELECT u.type_a, u.type_b, exact_common,
          ea.e AS est_a, eb.e AS est_b, est_union,
          ea.e + eb.e - est_union AS est_intersect
        FROM uest u
          JOIN est ea ON u.type_a = ea.event_type
          JOIN est eb ON u.type_b = eb.event_type
          JOIN exact x ON u.type_a = x.type_a AND u.type_b = x.type_b
        ORDER BY u.type_a, u.type_b""")),

    // ── Small-files compaction plan (q244) ─────────────────────────────
    // The lakehouse OPTIMIZE planner: bin-pack each partition's files
    // (here: documents as (source, doc_id, n_chars)) into target-sized
    // output groups by offset-binning the running byte total — file f
    // lands in bucket floor(start_offset / target), the deterministic
    // relational form of sequential packing (a file may straddle, its
    // successor starts a new bin). One window cumsum per partition +
    // one aggregation; integers end to end. At 100 TB the input is the
    // FILE LISTING (one row per file, millions not trillions), the
    // window key is the storage partition, and the output is the
    // rewrite job manifest — exactly how table-maintenance services
    // schedule compaction.
    QueryDef("q244_compaction_plan",
      (s, dir) => {
        val target = 16384L // chars per output group
        val w = Window.partitionBy("source").orderBy("doc_id")
        t(s, dir, "documents")
          .select(col("source"), col("doc_id"), col("n_chars"))
          .withColumn("cum", sum("n_chars").over(w))
          .withColumn("bucket",
            expr(s"(cum - n_chars) div $target"))
          .groupBy("source", "bucket")
          .agg(count(lit(1)).as("n_files"),
            sum("n_chars").as("bytes"),
            min("doc_id").as("first_doc"), max("doc_id").as("last_doc"))
          .filter(col("n_files") > 1) // singleton groups need no rewrite
          .orderBy("source", "bucket")
      },
      Some("""WITH f AS (SELECT source, doc_id, n_chars,
          CAST(SUM(n_chars) OVER (PARTITION BY source ORDER BY doc_id
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
            AS cum
        FROM documents)
        SELECT source, CAST((cum - n_chars) // 16384 AS BIGINT) AS bucket,
          COUNT(*) AS n_files, CAST(SUM(n_chars) AS BIGINT) AS bytes,
          MIN(doc_id) AS first_doc, MAX(doc_id) AS last_doc
        FROM f GROUP BY 1, 2 HAVING COUNT(*) > 1
        ORDER BY source, bucket""")),

    // ── Duplicate-span token coverage (q255) ───────────────────────────
    // q103 counts how many of a doc's k-token spans are duplicated
    // elsewhere; this reports how much of the doc those spans BLANKET —
    // the Lee et al. accounting metric that decides whether dedup is
    // worth a rewrite pass ("X% of the corpus' tokens sit inside
    // cross-doc duplicate substrings"). Overlapping spans must not
    // double-count, so the duplicated intervals [pos, pos+k−1] are
    // unioned per doc by the classic sweep (sort by start, running max
    // of prior ends) — a window PARTITIONED BY doc, frame bounded by
    // doc length, never global. Integer arithmetic end to end; the one
    // double is the reported fraction.
    QueryDef("q255_dup_span_coverage",
      (s, dir) => Dedup.duplicateSpanCoverage(tPar(s, dir, "documents"),
          "doc_id", "text", spanK)
        .orderBy("doc_id"),
      Some(s"""WITH tk AS (SELECT doc_id,
            $dTok AS a FROM documents),
        d AS (SELECT doc_id, len(a) AS n, a FROM tk),
        pos AS (SELECT doc_id, n, a,
            unnest(range(0, greatest(n - $spanK + 1, 1))) AS p FROM d),
        spans AS (SELECT doc_id, p,
            CASE WHEN n <= $spanK THEN n - 1 ELSE p + $spanK - 1 END
              AS endp,
            CASE WHEN n <= $spanK THEN array_to_string(a, ' ')
                 ELSE array_to_string(a[p+1:p+$spanK], ' ') END AS sh
          FROM pos),
        nd AS (SELECT sh FROM spans GROUP BY sh
          HAVING COUNT(DISTINCT doc_id) > 1),
        dup AS (SELECT doc_id, p, endp FROM spans JOIN nd USING (sh)),
        cov AS (SELECT doc_id, p, endp,
            MAX(endp) OVER (PARTITION BY doc_id ORDER BY p
              ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
              AS prevmax
          FROM dup),
        per AS (SELECT doc_id,
            SUM(greatest(endp - greatest(coalesce(prevmax, -1), p - 1),
              0)) AS covered
          FROM cov GROUP BY doc_id)
        SELECT d.doc_id, CAST(d.n AS BIGINT) AS n_tokens,
          CAST(COALESCE(per.covered, 0) AS BIGINT) AS covered_tokens,
          CAST(COALESCE(per.covered, 0) AS DOUBLE) / CAST(d.n AS DOUBLE)
            AS coverage_frac
        FROM d LEFT JOIN per USING (doc_id) ORDER BY doc_id""")),

    // ── l-diversity audit (q256) ───────────────────────────────────────
    // The release-gate companion to q213's k-anonymity: a k-anonymous
    // group is still disclosive when every member shares the SAME
    // sensitive value, so each quasi-identifier group (nation, segment,
    // order year) must carry ≥ l distinct sensitive values (order
    // priority). Machanavajjhala et al.'s distinct-l-diversity as one
    // aggregation over the joined fact — group count + COUNT(DISTINCT
    // sensitive), integers only. At 100 TB the QI table is the
    // aggregation output (bounded by the QI domain), never the fact.
    QueryDef("q256_l_diversity",
      (s, dir) => {
        val j = t(s, dir, "orders").join(t(s, dir, "customer"),
            col("o_custkey") === col("c_custkey"))
          .select(col("c_nationkey").as("nation"),
            col("c_mktsegment").as("segment"),
            year(col("o_orderdate")).as("yr"),
            col("o_orderpriority").as("pri"))
        j.groupBy("nation", "segment", "yr")
          .agg(count(lit(1)).as("n_rows"),
            countDistinct("pri").as("l_div"))
          .select(col("nation"), col("segment"), col("yr"),
            col("n_rows"), col("l_div"),
            when(col("l_div") < 3, 1L).otherwise(0L).as("below_l"))
          .orderBy("nation", "segment", "yr")
      },
      Some("""WITH j AS (SELECT c.c_nationkey AS nation,
            c.c_mktsegment AS segment, year(o.o_orderdate) AS yr,
            o.o_orderpriority AS pri
          FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey)
        SELECT nation, segment, yr, COUNT(*) AS n_rows,
          CAST(COUNT(DISTINCT pri) AS BIGINT) AS l_div,
          CAST(CASE WHEN COUNT(DISTINCT pri) < 3 THEN 1 ELSE 0 END
            AS BIGINT) AS below_l
        FROM j GROUP BY 1, 2, 3 ORDER BY nation, segment, yr""")),

    // ── t-closeness audit (q257) ───────────────────────────────────────
    // The third privacy gate (Li et al. ICDE'07): even an l-diverse
    // group leaks when its sensitive-value DISTRIBUTION skews far from
    // the table's. For the ordinal sensitive attribute (order priority,
    // ordered by its literal '1-URGENT' < … < '5-LOW') the Earth
    // Mover's Distance is the mean |ΔCDF|: per group g,
    // EMD = Σ_i |cum_g(i)/n_g − cum(i)/N| / (m−1). Cross-multiplied to
    // the integer numerator |cum_g·N − cum·n_g| so the only doubles are
    // the final division — exact while n_g·N < 2⁶³ (document scale:
    // fine to ~10⁹ rows/group vs 10⁹ total; beyond that cast the
    // products to DECIMAL(38,0)). The grid is (QI domain × m), both
    // bounded dims, so every shuffle after the first aggregation is
    // over a dimension table, never the fact.
    QueryDef("q257_t_closeness",
      (s, dir) => {
        val j = t(s, dir, "orders").join(t(s, dir, "customer"),
            col("o_custkey") === col("c_custkey"))
          .select(col("c_nationkey").as("nation"),
            col("o_orderpriority").as("pri"))
        val cell = j.groupBy("nation", "pri").agg(count(lit(1)).as("c"))
          .localCheckpoint() // grp + gl + the grid probe all read it
        val grp = cell.groupBy("nation").agg(sum("c").as("ng"))
        val gl = cell.groupBy("pri").agg(sum("c").as("cg"))
        val tot = gl.agg(sum("cg").as("n"), count(lit(1)).as("m"))
        val wv = Window.partitionBy("nation").orderBy("pri")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        val grid = grp.crossJoin(broadcast(gl))
          .join(cell, Seq("nation", "pri"), "left")
          .select(col("nation"), col("pri"), col("ng"), col("cg"),
            coalesce(col("c"), lit(0L)).as("c"))
        val cum = grid
          .withColumn("cumg", sum("c").over(wv))
          .withColumn("cumall", sum("cg").over(wv))
        cum.crossJoin(broadcast(tot))
          .groupBy("nation", "ng", "n", "m")
          .agg(sum(abs(col("cumg") * col("n") - col("cumall") * col("ng")))
            .as("num"))
          .select(col("nation"), col("ng").as("n_rows"),
            (col("num").cast("double") /
              (col("ng") * col("n") * (col("m") - 1)).cast("double"))
              .as("t_emd"))
          .orderBy("nation")
      },
      Some("""WITH j AS (SELECT c.c_nationkey AS nation,
            o.o_orderpriority AS pri
          FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey),
        cell AS (SELECT nation, pri, COUNT(*) AS c FROM j GROUP BY 1, 2),
        grp AS (SELECT nation, SUM(c) AS ng FROM cell GROUP BY nation),
        gl AS (SELECT pri, SUM(c) AS cg FROM cell GROUP BY pri),
        tot AS (SELECT SUM(cg) AS n, COUNT(*) AS m FROM gl),
        grid AS (SELECT g.nation, p.pri, g.ng, p.cg,
            COALESCE(c.c, 0) AS c
          FROM grp g CROSS JOIN gl p
          LEFT JOIN cell c ON c.nation = g.nation AND c.pri = p.pri),
        cum AS (SELECT nation, pri, ng,
            SUM(c) OVER (PARTITION BY nation ORDER BY pri
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cumg,
            SUM(cg) OVER (PARTITION BY nation ORDER BY pri
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cumall
          FROM grid),
        emd AS (SELECT nation, ng,
            SUM(ABS(cumg * n - cumall * ng)) AS num
          FROM cum CROSS JOIN tot GROUP BY nation, ng, n)
        SELECT e.nation, CAST(e.ng AS BIGINT) AS n_rows,
          CAST(e.num AS DOUBLE) /
            (CAST(e.ng AS DOUBLE) * tot.n * (tot.m - 1)) AS t_emd
        FROM emd e CROSS JOIN tot ORDER BY e.nation""")),

    // ── Fleiss' kappa rater agreement (q258) ───────────────────────────
    // Do the corpus' junk heuristics AGREE? Three deterministic
    // "raters" each vote junk/ok per document — word count < 40, top
    // unigram > ⅛ of tokens (cross-multiplied, q234's trick), distinct
    // vocab < ⅓ of tokens — and Fleiss' kappa measures their chance-
    // corrected agreement. With n=3 raters and 2 categories the whole
    // statistic reduces to three corpus integers (N docs, J junk votes,
    // S = Σ_doc [n_j(n_j−1)+n_o(n_o−1)]):
    //   P̄ = S/6N, P_e = (J²+(3N−J)²)/9N²,
    //   κ = (3N·S − 2(J²+(3N−J)²)) / (18N² − 2(J²+(3N−J)²)),
    // one aggregation cascade, three exact double divisions at the end.
    // Low κ (~0 on this corpus) is the actionable answer: the gates
    // fire on DIFFERENT documents, so stacking them multiplies loss.
    QueryDef("q258_fleiss_kappa",
      (s, dir) => {
        val votes = tPar(s, dir, "documents")
          .select(col("doc_id"),
            explode(TextStats.tokens(col("text"))).as("tok"))
          .groupBy("doc_id", "tok").agg(count(lit(1)).as("c"))
          .groupBy("doc_id")
          .agg(sum("c").as("w"), max("c").as("maxc"),
            count(lit(1)).as("dv"))
          .select((when(col("w") < 40, 1L).otherwise(0L) +
            when(col("maxc") * 8 > col("w"), 1L).otherwise(0L) +
            when(col("dv") * 3 < col("w"), 1L).otherwise(0L)).as("nj"))
        votes.agg(count(lit(1)).as("nd"), sum("nj").as("j"),
            sum(col("nj") * (col("nj") - 1) +
              (lit(3L) - col("nj")) * (lit(2L) - col("nj"))).as("sp"))
          .select(col("nd").as("n_docs"), col("j").as("n_junk_votes"),
            (col("sp").cast("double") / (col("nd") * 6).cast("double"))
              .as("p_bar"),
            ((col("j") * col("j") +
              (col("nd") * 3 - col("j")) * (col("nd") * 3 - col("j")))
              .cast("double") /
              (col("nd") * col("nd") * 9).cast("double")).as("p_e"),
            ((col("nd") * 3 * col("sp") -
              (col("j") * col("j") + (col("nd") * 3 - col("j")) *
                (col("nd") * 3 - col("j"))) * 2).cast("double") /
              (col("nd") * col("nd") * 18 -
                (col("j") * col("j") + (col("nd") * 3 - col("j")) *
                  (col("nd") * 3 - col("j"))) * 2).cast("double"))
              .as("kappa"))
      },
      Some(s"""WITH pc AS (SELECT doc_id, tok, COUNT(*) AS c
          FROM (SELECT doc_id, unnest($dTok) AS tok FROM documents)
          GROUP BY 1, 2),
        pd AS (SELECT doc_id, SUM(c) AS w, MAX(c) AS maxc,
            COUNT(*) AS dv FROM pc GROUP BY doc_id),
        votes AS (SELECT doc_id,
            (CASE WHEN w < 40 THEN 1 ELSE 0 END) +
            (CASE WHEN maxc * 8 > w THEN 1 ELSE 0 END) +
            (CASE WHEN dv * 3 < w THEN 1 ELSE 0 END) AS nj
          FROM pd),
        st AS (SELECT COUNT(*) AS nd, CAST(SUM(nj) AS BIGINT) AS j,
            CAST(SUM(nj*(nj-1) + (3-nj)*(2-nj)) AS BIGINT) AS sp
          FROM votes)
        SELECT CAST(nd AS BIGINT) AS n_docs, j AS n_junk_votes,
          CAST(sp AS DOUBLE) / CAST(6*nd AS DOUBLE) AS p_bar,
          CAST(j*j + (3*nd-j)*(3*nd-j) AS DOUBLE)
            / CAST(9*nd*nd AS DOUBLE) AS p_e,
          CAST(3*nd*sp - 2*(j*j + (3*nd-j)*(3*nd-j)) AS DOUBLE)
            / CAST(18*nd*nd - 2*(j*j + (3*nd-j)*(3*nd-j)) AS DOUBLE)
            AS kappa
        FROM st""")),

    // ── Temperature-weighted sampling budget (q259) ────────────────────
    // The corpus-mixing apportionment step (GPT-3/PaLM style): a
    // 100 000-doc sampling budget split across sources by DAMPED token
    // mass w_s = ⌊√tokens_s⌋ (temperature α = ½ — big sources damped,
    // small sources boosted), allocated by largest-remainder so the
    // integer allocations sum EXACTLY to the budget. ⌊√n⌋ of an exact
    // integer and the div/mod apportionment are integer-exact on both
    // engines — no float quota anywhere. The ranking window is over
    // the SOURCE dimension (bounded, here 20), never the corpus.
    QueryDef("q259_temperature_budget",
      (s, dir) => {
        val budget = 100000L
        val wts = tPar(s, dir, "documents")
          .select(col("source"),
            size(TextStats.tokens(col("text"))).cast("long").as("nt"))
          .groupBy("source").agg(sum("nt").as("tokens"))
          .select(col("source"), col("tokens"),
            floor(sqrt(col("tokens"))).cast("long").as("wt"))
        val tot = wts.agg(sum("wt").as("tw"))
        val q = wts.crossJoin(broadcast(tot))
          .select(col("source"), col("tokens"), col("wt"),
            expr(s"($budget * wt) div tw").as("base"),
            expr(s"($budget * wt) % tw").as("rem"))
          .localCheckpoint() // leftover fold + the ranked projection
        val lo = q.agg((lit(budget) - sum("base")).as("leftover"))
        val wr = boundedWindow(col("rem").desc, col("source"))
        q.withColumn("rk", row_number().over(wr))
          .crossJoin(broadcast(lo))
          .select(col("source"), col("tokens"), col("wt").as("weight"),
            col("base").as("base_alloc"),
            when(col("rk") <= col("leftover"), 1L).otherwise(0L)
              .as("extra"),
            (col("base") + when(col("rk") <= col("leftover"), 1L)
              .otherwise(0L)).as("alloc"))
          .orderBy("source")
      },
      Some(s"""WITH st AS (SELECT source,
            CAST(SUM(len($dTok)) AS BIGINT) AS tokens
          FROM documents GROUP BY source),
        w AS (SELECT source, tokens,
            CAST(floor(sqrt(tokens)) AS BIGINT) AS wt FROM st),
        tot AS (SELECT CAST(SUM(wt) AS BIGINT) AS tw FROM w),
        q AS (SELECT source, tokens, wt,
            (100000 * wt) // tw AS base, (100000 * wt) % tw AS rem
          FROM w CROSS JOIN tot),
        lo AS (SELECT CAST(100000 - SUM(base) AS BIGINT) AS leftover
          FROM q),
        r AS (SELECT q.*, ROW_NUMBER()
            OVER (ORDER BY rem DESC, source) AS rk FROM q)
        SELECT source, tokens, wt AS weight,
          CAST(base AS BIGINT) AS base_alloc,
          CAST(CASE WHEN rk <= lo.leftover THEN 1 ELSE 0 END AS BIGINT)
            AS extra,
          CAST(base + CASE WHEN rk <= lo.leftover THEN 1 ELSE 0 END
            AS BIGINT) AS alloc
        FROM r CROSS JOIN lo ORDER BY source""")),

    // ── Post-stratified ATE (q260) ─────────────────────────────────────
    // The causal-family companion to q252/q254: the treatment effect on
    // per-user purchase count, post-stratified on a pre-treatment
    // covariate (the user's NON-purchase activity, integer-binned into
    // 5 fixed strata) — the standard bias-reduction estimator when
    // simple randomization leaves covariate imbalance. Per stratum:
    // arm means (exact BIGINT sums / counts), their difference, and the
    // stratum weight n_h/N; the weighted diffs sum to the ATE. Strata
    // missing either arm are dropped (no estimable contrast), exactly
    // like the oracle's HAVING. Everything is one per-user aggregation
    // + one 5-row pivot — no window over users anywhere.
    QueryDef("q260_stratified_ate",
      (s, dir) => {
        val per = t(s, dir, "events")
          .groupBy("user_id")
          .agg(sum(when(col("event_type") =!= "purchase", 1L)
            .otherwise(0L)).as("cov"),
            sum(when(col("event_type") === "purchase", 1L)
              .otherwise(0L)).as("y"))
          .select((Shingles.baseHash(col("user_id").cast("string")) % 2)
            .as("arm"),
            expr("least(greatest(cov - 35, 0) div 10, 4)").as("stratum"),
            col("y"))
        val wide = per.groupBy("stratum", "arm")
          .agg(count(lit(1)).as("n"), sum("y").as("sy"))
          .groupBy("stratum")
          .agg(max(when(col("arm") === 1, col("n"))).as("n_t"),
            max(when(col("arm") === 1, col("sy"))).as("sy_t"),
            max(when(col("arm") === 0, col("n"))).as("n_c"),
            max(when(col("arm") === 0, col("sy"))).as("sy_c"))
          .filter(col("n_t").isNotNull && col("n_c").isNotNull)
          .localCheckpoint() // total fold + the weighted projection
        val tot = wide.agg(sum(col("n_t") + col("n_c")).as("nn"))
        wide.crossJoin(broadcast(tot))
          .select(col("stratum"), col("n_t"), col("n_c"),
            (col("sy_t").cast("double") / col("n_t")).as("mean_t"),
            (col("sy_c").cast("double") / col("n_c")).as("mean_c"),
            (col("sy_t").cast("double") / col("n_t") -
              col("sy_c").cast("double") / col("n_c")).as("diff"),
            ((col("n_t") + col("n_c")).cast("double") / col("nn"))
              .as("w"),
            (((col("n_t") + col("n_c")).cast("double") / col("nn")) *
              (col("sy_t").cast("double") / col("n_t") -
                col("sy_c").cast("double") / col("n_c"))).as("wdiff"))
          .orderBy("stratum")
      },
      Some("""WITH per AS (SELECT user_id,
            ('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 7))::BIGINT
              % 2 AS arm,
            CAST(SUM(CASE WHEN event_type <> 'purchase' THEN 1 ELSE 0
              END) AS BIGINT) AS cov,
            CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0
              END) AS BIGINT) AS y
          FROM events GROUP BY user_id),
        st AS (SELECT arm, least(greatest(cov - 35, 0) // 10, 4)
            AS stratum, y FROM per),
        cellc AS (SELECT stratum, arm, COUNT(*) AS n,
            CAST(SUM(y) AS BIGINT) AS sy FROM st GROUP BY 1, 2),
        wide AS (SELECT stratum,
            MAX(CASE WHEN arm = 1 THEN n END) AS n_t,
            MAX(CASE WHEN arm = 1 THEN sy END) AS sy_t,
            MAX(CASE WHEN arm = 0 THEN n END) AS n_c,
            MAX(CASE WHEN arm = 0 THEN sy END) AS sy_c
          FROM cellc GROUP BY stratum
          HAVING MAX(CASE WHEN arm = 1 THEN n END) IS NOT NULL
             AND MAX(CASE WHEN arm = 0 THEN n END) IS NOT NULL),
        tot AS (SELECT CAST(SUM(n_t + n_c) AS BIGINT) AS nn FROM wide)
        SELECT CAST(stratum AS BIGINT) AS stratum,
          CAST(n_t AS BIGINT) AS n_t, CAST(n_c AS BIGINT) AS n_c,
          CAST(sy_t AS DOUBLE) / n_t AS mean_t,
          CAST(sy_c AS DOUBLE) / n_c AS mean_c,
          CAST(sy_t AS DOUBLE) / n_t - CAST(sy_c AS DOUBLE) / n_c
            AS diff,
          CAST(n_t + n_c AS DOUBLE) / nn AS w,
          (CAST(n_t + n_c AS DOUBLE) / nn) *
            (CAST(sy_t AS DOUBLE) / n_t - CAST(sy_c AS DOUBLE) / n_c)
            AS wdiff
        FROM wide CROSS JOIN tot ORDER BY stratum""")),

    // ── Peak concurrency per day (q261) ────────────────────────────────
    // The capacity-planning sweep-line: each event opens a 30-minute
    // activity window; the report is each day's PEAK number of
    // simultaneously-open windows. The classic +1/−1 delta sweep, but
    // PARTITIONED BY DAY so no global-order window exists: windows
    // crossing midnight (≤ one boundary, since the window is shorter
    // than a day — documented precondition) are handed to the next day
    // as an aggregated carry-in count, and each day's peak is
    // carry + max running delta sum. Ties at the same microsecond order
    // ends (−1) before starts (half-open intervals); reordering equal
    // deltas can't change any prefix extremum, so the peak is
    // deterministic. Integer arithmetic end to end.
    QueryDef("q261_peak_concurrency",
      (s, dir) => {
        val iv = t(s, dir, "events")
          .select(unix_micros(col("ts")).as("st"),
            (unix_micros(col("ts")) + 1800000000L).as("en"))
          .localCheckpoint() // both delta legs + the carry fold
        val deltas = iv.select(expr("st div 86400000000").as("day"),
            col("st").as("t"), lit(1).as("delta"))
          .union(iv.select(expr("en div 86400000000").as("day"),
            col("en").as("t"), lit(-1).as("delta")))
        val carry = iv
          .filter(expr("en div 86400000000 > st div 86400000000"))
          .groupBy(expr("en div 86400000000").as("day"))
          .agg(count(lit(1)).as("c"))
        val wv = Window.partitionBy("day").orderBy("t", "delta")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        deltas.withColumn("rs", sum("delta").over(wv))
          .groupBy("day")
          .agg(max("rs").as("peak0"),
            sum(when(col("delta") === 1, 1L).otherwise(0L))
              .as("n_starts"))
          .join(carry, Seq("day"), "left")
          .select(col("day"), col("n_starts"),
            coalesce(col("c"), lit(0L)).as("carry_in"),
            (col("peak0") + coalesce(col("c"), lit(0L)))
              .as("peak_concurrent"))
          .orderBy("day")
      },
      Some("""WITH iv AS (SELECT epoch_us(ts) AS st,
            epoch_us(ts) + 1800000000 AS en FROM events),
        deltas AS (
          SELECT st // 86400000000 AS day, st AS t, 1 AS delta FROM iv
          UNION ALL
          SELECT en // 86400000000 AS day, en AS t, -1 AS delta FROM iv),
        carry AS (SELECT en // 86400000000 AS day, COUNT(*) AS c FROM iv
          WHERE en // 86400000000 > st // 86400000000 GROUP BY 1),
        run AS (SELECT day, t, delta,
            SUM(delta) OVER (PARTITION BY day ORDER BY t, delta
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS rs
          FROM deltas),
        pk AS (SELECT day, MAX(rs) AS peak0,
            CAST(SUM(CASE WHEN delta = 1 THEN 1 ELSE 0 END) AS BIGINT)
              AS n_starts
          FROM run GROUP BY day)
        SELECT pk.day, n_starts,
          CAST(COALESCE(carry.c, 0) AS BIGINT) AS carry_in,
          CAST(peak0 + COALESCE(carry.c, 0) AS BIGINT)
            AS peak_concurrent
        FROM pk LEFT JOIN carry USING (day) ORDER BY day""")),

    // ── Grouped-jackknife SE of a ratio metric (q262) ──────────────────
    // The A/B-platform standard for RATIO metrics (q194's bootstrap
    // covers means): mean purchase value = Σvalue/Σcount is a ratio of
    // sums, so its naive SE is biased; the delete-one-GROUP jackknife
    // over 32 user-hash buckets is the published fix (users, not
    // events, are the independent unit). θ_i drops bucket i;
    // SE² = (g−1)/g · Σ(θ_i − θ̄)². Every sum rides the DECIMAL(30,8)
    // parity rail so the 32 θ doubles — and hence θ̄, formed from their
    // re-rounded decimal sum — are bit-identical cross-engine. The
    // whole statistic is one bucket aggregation + O(g) folds.
    QueryDef("q262_jackknife_ratio_se",
      (s, dir) => {
        val bg = t(s, dir, "events")
          .filter(col("event_type") === "purchase")
          .groupBy((Shingles.baseHash(col("user_id").cast("string")) % 32)
            .as("g"))
          .agg(sum(col("value").cast("decimal(30,8)"))
            .cast("decimal(30,8)").as("sv"),
            count(lit(1)).as("nv"))
          .localCheckpoint() // totals fold + the per-bucket θ projection
        val tot = bg.agg(sum("sv").cast("decimal(30,8)").as("stot"),
          sum("nv").as("ntot"), count(lit(1)).as("ngrp"))
        val th = bg.crossJoin(broadcast(tot))
          .select(col("ngrp"), col("stot"), col("ntot"),
            ((col("stot") - col("sv")).cast("double") /
              (col("ntot") - col("nv")).cast("double")).as("theta"))
          .localCheckpoint() // θ̄ fold + the squared-deviation fold
        val tb = th.groupBy("ngrp", "stot", "ntot")
          .agg((sum(col("theta").cast("decimal(30,8)")).cast("double") /
            col("ngrp")).as("theta_bar"))
        th.join(broadcast(tb), Seq("ngrp", "stot", "ntot"))
          .groupBy("ngrp", "stot", "ntot", "theta_bar")
          .agg(sum(((col("theta") - col("theta_bar")) *
            (col("theta") - col("theta_bar"))).cast("decimal(30,8)"))
            .cast("double").as("ssq"))
          .select(col("ngrp").as("n_groups"),
            (col("stot").cast("double") / col("ntot")).as("theta_full"),
            col("theta_bar"),
            sqrt((col("ngrp") - lit(1.0)) / col("ngrp") * col("ssq"))
              .as("se_jack"))
      },
      Some("""WITH pe AS (SELECT
            ('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 7))::BIGINT
              % 32 AS g,
            value FROM events WHERE event_type = 'purchase'),
        bg AS (SELECT g,
            CAST(SUM(CAST(value AS DECIMAL(30,8))) AS DECIMAL(30,8))
              AS sv,
            COUNT(*) AS nv FROM pe GROUP BY g),
        tot AS (SELECT CAST(SUM(sv) AS DECIMAL(30,8)) AS stot,
            CAST(SUM(nv) AS BIGINT) AS ntot, COUNT(*) AS ngrp FROM bg),
        th AS (SELECT g,
            CAST(stot - sv AS DOUBLE) / CAST(ntot - nv AS DOUBLE)
              AS theta
          FROM bg CROSS JOIN tot),
        tb AS (SELECT CAST(CAST(SUM(CAST(theta AS DECIMAL(30,8)))
              AS VARCHAR) AS DOUBLE) / (SELECT ngrp FROM tot)
            AS theta_bar FROM th),
        sq AS (SELECT CAST(CAST(SUM(CAST((theta - theta_bar) *
              (theta - theta_bar) AS DECIMAL(30,8))) AS VARCHAR)
            AS DOUBLE) AS ssq FROM th CROSS JOIN tb)
        SELECT CAST(tot.ngrp AS BIGINT) AS n_groups,
          CAST(tot.stot AS DOUBLE) / tot.ntot AS theta_full,
          tb.theta_bar,
          sqrt((tot.ngrp - 1.0) / tot.ngrp * sq.ssq) AS se_jack
        FROM tot CROSS JOIN tb CROSS JOIN sq""")),

    // ── Deadline funnel with Wilson intervals (q263) ───────────────────
    // q149's strict ordered funnel plus the two things a growth report
    // actually needs: a CONVERSION DEADLINE (next step within 24 h of
    // the previous step's completion — without it this corpus converts
    // everyone) and UNCERTAINTY on each step's rate. The Wilson score
    // interval needs only +, ×, ÷ and one sqrt of exact-integer-derived
    // doubles — every operand chain is written identically in both
    // engines, so the bounds are bit-identical (the reason Wilson is
    // chosen over Clopper–Pearson, which needs Beta quantiles). Two
    // sequential min-aggregation joins, then an O(steps) fold.
    QueryDef("q263_funnel_wilson",
      (s, dir) => {
        val dl = 86400000000L // 24 h in micros
        val ev = t(s, dir, "events")
        def typed(tp: String, as: String) =
          ev.filter(col("event_type") === tp)
            .select(col("user_id"), unix_micros(col("ts")).as(as))
        val t1 = typed("view", "us1").groupBy("user_id")
          .agg(min(col("us1")).as("t1"))
        val t2 = t1.join(typed("click", "us2"), Seq("user_id"), "left")
          .groupBy("user_id")
          .agg(min(col("t1")).as("t1"),
            min(when(col("us2") >= col("t1") &&
              col("us2") < col("t1") + dl, col("us2"))).as("t2"))
        val t3 = t2.join(typed("purchase", "us3"), Seq("user_id"), "left")
          .groupBy("user_id")
          .agg(min(col("t2")).as("t2"),
            min(when(col("us3") >= col("t2") &&
              col("us3") < col("t2") + dl, col("us3"))).as("t3"))
        val cnt = t3.agg(count(lit(1)).as("n1"),
          sum(col("t2").isNotNull.cast("long")).as("n2"),
          sum(col("t3").isNotNull.cast("long")).as("n3"))
        val steps = cnt.select(explode(array(
            struct(lit("view_to_click").as("step"),
              col("n1").as("n_prev"), col("n2").as("n_next")),
            struct(lit("click_to_purchase").as("step"),
              col("n2").as("n_prev"), col("n3").as("n_next")))).as("r"))
          .select(col("r.step").as("step"), col("r.n_prev").as("n_prev"),
            col("r.n_next").as("n_next"))
          .withColumn("p",
            col("n_next").cast("double") / col("n_prev"))
        val z = lit(1.96)
        val center = (col("p") + z * z / (lit(2) * col("n_prev"))) /
          (lit(1) + z * z / col("n_prev"))
        val half = z * sqrt(col("p") * (lit(1) - col("p")) / col("n_prev")
          + z * z / (lit(4) * col("n_prev") * col("n_prev"))) /
          (lit(1) + z * z / col("n_prev"))
        steps.select(col("step"), col("n_prev"), col("n_next"), col("p"),
            (center - half).as("wilson_lo"),
            (center + half).as("wilson_hi"))
          .orderBy("step")
      },
      Some("""WITH t1 AS (SELECT user_id, MIN(epoch_us(ts)) AS t1
            FROM events WHERE event_type = 'view' GROUP BY user_id),
        c AS (SELECT user_id, epoch_us(ts) AS us2 FROM events
          WHERE event_type = 'click'),
        t2 AS (SELECT t1.user_id, MIN(t1.t1) AS t1,
            MIN(CASE WHEN c.us2 >= t1.t1
              AND c.us2 < t1.t1 + 86400000000 THEN c.us2 END) AS t2
          FROM t1 LEFT JOIN c ON t1.user_id = c.user_id
          GROUP BY t1.user_id),
        p AS (SELECT user_id, epoch_us(ts) AS us3 FROM events
          WHERE event_type = 'purchase'),
        t3 AS (SELECT t2.user_id, MIN(t2.t2) AS t2,
            MIN(CASE WHEN p.us3 >= t2.t2
              AND p.us3 < t2.t2 + 86400000000 THEN p.us3 END) AS t3
          FROM t2 LEFT JOIN p ON t2.user_id = p.user_id
          GROUP BY t2.user_id),
        cnt AS (SELECT COUNT(*) AS n1,
            CAST(SUM(CASE WHEN t2 IS NOT NULL THEN 1 ELSE 0 END)
              AS BIGINT) AS n2,
            CAST(SUM(CASE WHEN t3 IS NOT NULL THEN 1 ELSE 0 END)
              AS BIGINT) AS n3 FROM t3),
        steps AS (
          SELECT 'view_to_click' AS step, n1 AS n_prev, n2 AS n_next
          FROM cnt
          UNION ALL
          SELECT 'click_to_purchase', n2, n3 FROM cnt),
        wil AS (SELECT step, n_prev, n_next,
            CAST(n_next AS DOUBLE) / n_prev AS p FROM steps)
        SELECT step, CAST(n_prev AS BIGINT) AS n_prev, n_next, p,
          (p + 1.96*1.96/(2*n_prev)) / (1 + 1.96*1.96/n_prev)
            - 1.96 * sqrt(p*(1-p)/n_prev
                + 1.96*1.96/(4*n_prev*n_prev))
              / (1 + 1.96*1.96/n_prev) AS wilson_lo,
          (p + 1.96*1.96/(2*n_prev)) / (1 + 1.96*1.96/n_prev)
            + 1.96 * sqrt(p*(1-p)/n_prev
                + 1.96*1.96/(4*n_prev*n_prev))
              / (1 + 1.96*1.96/n_prev) AS wilson_hi
        FROM wil ORDER BY step""")),

    // ── Half-life decayed engagement score (q264) ──────────────────────
    // Recency-weighted per-user value with EXACT arithmetic: the usual
    // exp(−age/τ) decay is libm-dependent, but a half-life on the
    // integer WEEK age — weight 2^−⌊age/7⌋ — is a power of two, so
    // value·weight is exact double SCALING (mantissa untouched), and
    // the per-user sum rides the DECIMAL(30,8) parity rail. The shape
    // is one map + one aggregation; the newest week counts full, five
    // weeks back counts 1/32 — the classic engagement-decay curve with
    // none of the transcendental drift.
    QueryDef("q264_decay_score",
      (s, dir) => {
        val ev = t(s, dir, "events")
          .select(col("user_id"),
            expr("unix_micros(ts) div 86400000000").as("day"),
            col("value"))
        val mx = ev.agg(max("day").as("maxd"))
        ev.crossJoin(broadcast(mx))
          .select(col("user_id"),
            (col("value") /
              pow(lit(2.0), expr("(maxd - day) div 7").cast("double")))
              .as("wval"))
          .groupBy("user_id")
          .agg(count(lit(1)).as("n_events"),
            dsum(col("wval")).as("decayed_score"))
          .orderBy("user_id")
      },
      Some(s"""WITH ev AS (SELECT user_id,
            epoch_us(ts) // 86400000000 AS day, value FROM events),
        mx AS (SELECT MAX(day) AS maxd FROM ev),
        wv AS (SELECT user_id,
            value / power(2, (maxd - day) // 7) AS wval
          FROM ev CROSS JOIN mx)
        SELECT user_id, COUNT(*) AS n_events,
          ${dsumSql("wval")} AS decayed_score
        FROM wv GROUP BY user_id ORDER BY user_id""")),

    // ── Nelson–Aalen cumulative hazard (q265) ──────────────────────────
    // The survival-analysis twin of q179's Kaplan–Meier retention:
    // time-to-first-purchase in HOURS from corpus start, observed for
    // 12 hours — users without a purchase by then are right-censored
    // (type I), which is exactly what the estimator exists to handle.
    // Ĥ(t) = Σ_{s≤t} d_s/n_s with the risk set from a REVERSE
    // cumulative count over the bounded distinct-time axis (≤13 rows —
    // the unpartitioned windows run over that axis, never over users).
    // Each hazard term is one division of exact integers; the running
    // cum_hazard adds them in time order, the same left-to-right chain
    // in both engines.
    QueryDef("q265_nelson_aalen",
      (s, dir) => {
        val hrs = t(s, dir, "events")
          .select(col("user_id"),
            expr("unix_micros(ts) div 3600000000").as("hr"),
            col("event_type"))
        val start = hrs.agg(min("hr").as("h0"))
        val per = hrs.crossJoin(broadcast(start))
          .groupBy("user_id")
          .agg(min(when(col("event_type") === "purchase",
            col("hr") - col("h0"))).as("fp"))
        val obs = per.select(
          when(col("fp").isNotNull && col("fp") < 12, col("fp"))
            .otherwise(12L).as("t"),
          when(col("fp").isNotNull && col("fp") < 12, 1L)
            .otherwise(0L).as("ev"))
        val dd = obs.groupBy("t")
          .agg(sum("ev").as("d"), sum(lit(1L) - col("ev")).as("c"))
        val wDesc = boundedWindow(col("t").desc)
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        val wAsc = boundedWindow(col("t").asc)
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        dd.withColumn("n_risk", sum(col("d") + col("c")).over(wDesc))
          .filter(col("d") > 0)
          .withColumn("hazard",
            col("d").cast("double") / col("n_risk"))
          .withColumn("cum_hazard", sum("hazard").over(wAsc))
          .select("t", "n_risk", "d", "hazard", "cum_hazard")
          .orderBy("t")
      },
      Some("""WITH hrs AS (SELECT user_id,
            epoch_us(ts) // 3600000000 AS hr, event_type FROM events),
        start AS (SELECT MIN(hr) AS h0 FROM hrs),
        per AS (SELECT h.user_id,
            MIN(CASE WHEN h.event_type = 'purchase'
              THEN h.hr - s.h0 END) AS fp
          FROM hrs h CROSS JOIN start s GROUP BY h.user_id),
        obs AS (SELECT user_id,
            CASE WHEN fp IS NOT NULL AND fp < 12 THEN fp ELSE 12 END
              AS t,
            CASE WHEN fp IS NOT NULL AND fp < 12 THEN 1 ELSE 0 END
              AS ev
          FROM per),
        dd AS (SELECT t, CAST(SUM(ev) AS BIGINT) AS d,
            CAST(SUM(1 - ev) AS BIGINT) AS c FROM obs GROUP BY t),
        rk AS (SELECT t, d, c,
            CAST(SUM(d + c) OVER (ORDER BY t DESC
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
              AS BIGINT) AS n_risk
          FROM dd)
        SELECT t, n_risk, d, CAST(d AS DOUBLE) / n_risk AS hazard,
          SUM(CAST(d AS DOUBLE) / n_risk) OVER (ORDER BY t
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
            AS cum_hazard
        FROM rk WHERE d > 0 ORDER BY t""")),

    // ── Page–Hinkley drift detector (q266) ─────────────────────────────
    // The third change detector next to CUSUM (q155) and Pettitt
    // (q211): per event type, the daily-mean series x_t, its running
    // mean x̄_t, the drift statistic m_t = Σ(x_i − x̄_i − δ), and
    // — because DuckDB's windowed SUM combines by segment TREE while
    // Spark accumulates left-to-right (a 1-ulp divergence observed at
    // sf0.1) — both running sums of doubles ride the DECIMAL(30,8)
    // rail, making them association-order-free. Then
    // PH_t = m_t − min_{s≤t} m_s; the report is each type's peak PH,
    // its day, and the λ=30 alarm verdict (mixed on this corpus by
    // construction). All windows are PARTITIONED BY event type and
    // ordered by day — bounded series, no global window.
    QueryDef("q266_page_hinkley",
      (s, dir) => {
        val wv = Window.partitionBy("event_type").orderBy("day")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        val dly = t(s, dir, "events")
          .groupBy(col("event_type"),
            expr("unix_micros(ts) div 86400000000").as("day"))
          .agg(davg(col("value")).as("x"))
        val ph = dly
          .withColumn("xb",
            sum(col("x").cast("decimal(30,8)")).over(wv).cast("double") /
              count(lit(1)).over(wv))
          .withColumn("m",
            sum((col("x") - col("xb") - lit(0.005))
              .cast("decimal(30,8)")).over(wv).cast("double"))
          .withColumn("ph", col("m") - min("m").over(wv))
        val best = Window.partitionBy("event_type")
          .orderBy(col("ph").desc, col("day"))
        ph.withColumn("rk", row_number().over(best))
          .filter(col("rk") === 1)
          .select(col("event_type"), col("day").as("peak_day"),
            col("ph").as("ph_max"),
            (col("ph") > 30.0).cast("int").as("alarm"))
          .orderBy("event_type")
      },
      Some(s"""WITH dly AS (SELECT event_type,
            epoch_us(ts) // 86400000000 AS day,
            ${dsumSql("value")} / COUNT(*) AS x
          FROM events GROUP BY 1, 2),
        cm AS (SELECT event_type, day, x,
            CAST(CAST(SUM(CAST(x AS DECIMAL(30,8)))
                OVER (PARTITION BY event_type ORDER BY day
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
              AS VARCHAR) AS DOUBLE)
            / COUNT(*) OVER (PARTITION BY event_type ORDER BY day
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS xb
          FROM dly),
        u AS (SELECT event_type, day,
            CAST(CAST(SUM(CAST((x - xb - 0.005) AS DECIMAL(30,8)))
                OVER (PARTITION BY event_type ORDER BY day
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
              AS VARCHAR) AS DOUBLE) AS m
          FROM cm),
        ph AS (SELECT event_type, day, m,
            m - MIN(m) OVER (PARTITION BY event_type ORDER BY day
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS ph
          FROM u),
        best AS (SELECT event_type, day, ph,
            ROW_NUMBER() OVER (PARTITION BY event_type
              ORDER BY ph DESC, day) AS rk
          FROM ph)
        SELECT event_type, day AS peak_day, ph AS ph_max,
          CAST(ph > 30.0 AS INT) AS alarm
        FROM best WHERE rk = 1 ORDER BY event_type""")),

    // ── Fellegi–Sunter EM parameter update (q267) ──────────────────────
    // q164 scores pairs with CONFIGURED (m, u); this is the missing
    // training step — one full EM iteration re-estimating them from
    // the data. The E-step posterior w(γ) is a RATIONAL of the
    // configured rationals and the 1/20 prior, precomputed once in
    // BigInt arithmetic and interpolated into both engines as the same
    // 12-dp decimal literals ([[Params.fsEmWeights]]); the data's only
    // job is the 8 pattern counts, so the M-step is
    //   m_f' = Σ_{γ_f=1} n_γ·w_γ / Σ n_γ·w_γ   (u_f' with 1−w)
    // — integer × fixed-point products (exact), decimal sums (exact),
    // and a handful of final double divisions. The whole update is
    // O(2^fields) state however many pairs the block join yields.
    QueryDef("q267_fs_em_step",
      (s, dir) => {
        val counts = fsScoredPairs(s, dir)
          .groupBy("pattern").agg(count(lit(1)).as("n"))
        val wtab = counts.sparkSession.range(1)
          .select(explode(array(fsEmWeights.map { case (p, w, wc) =>
            struct(lit(p).as("pattern"),
              lit(new java.math.BigDecimal(w)).as("w"),
              lit(new java.math.BigDecimal(wc)).as("wc"))
          }: _*)).as("r"))
          .select(col("r.pattern").as("pattern"), col("r.w").as("w"),
            col("r.wc").as("wc"))
        val j = counts.join(broadcast(wtab), "pattern")
        val fieldSums = fsFields.zipWithIndex.flatMap { case (_, i) =>
          Seq(sum(when(substring(col("pattern"), i + 1, 1) === "1",
            col("n") * col("w"))).as(s"swf$i"),
            sum(when(substring(col("pattern"), i + 1, 1) === "1",
              col("n") * col("wc"))).as(s"swcf$i"))
        }
        val aggCols = Seq(sum(col("n") * col("w")).as("sw"),
          sum(col("n") * col("wc")).as("swc")) ++ fieldSums
        val agg = j.agg(sum("n").as("sn"), aggCols: _*)
        agg.select(explode(array(fsFields.zipWithIndex.map {
            case ((f, mN, mD, uN, uD), i) =>
              struct(lit(f).as("field"),
                lit(mN.toDouble / mD).as("m0"),
                lit(uN.toDouble / uD).as("u0"),
                (col(s"swf$i").cast("double") /
                  col("sw").cast("double")).as("m1"),
                (col(s"swcf$i").cast("double") /
                  col("swc").cast("double")).as("u1"))
          }: _*)).as("r"),
          (col("sw").cast("double") / col("sn")).as("p1"))
          .select(col("r.field").as("field"), col("r.m0").as("m0"),
            col("r.u0").as("u0"), col("r.m1").as("m1"),
            col("r.u1").as("u1"), col("p1"))
          .orderBy("field")
      },
      Some {
        val wRows = fsEmWeights.map { case (p, w, wc) =>
          s"('$p', CAST('$w' AS DECIMAL(14,12)), " +
            s"CAST('$wc' AS DECIMAL(14,12)))"
        }.mkString(",\n          ")
        val fSums = fsFields.zipWithIndex.map { case (_, i) =>
          s"""SUM(CASE WHEN substr(pattern, ${i + 1}, 1) = '1'
             THEN n * w END) AS swf$i,
           SUM(CASE WHEN substr(pattern, ${i + 1}, 1) = '1'
             THEN n * wc END) AS swcf$i"""
        }.mkString(",\n          ")
        val fRows = fsFields.zipWithIndex.map {
          case ((f, mN, mD, uN, uD), i) =>
            s"""SELECT '$f' AS field,
             CAST(${mN.toDouble / mD} AS DOUBLE) AS m0,
             CAST(${uN.toDouble / uD} AS DOUBLE) AS u0,
             CAST(CAST(swf$i AS VARCHAR) AS DOUBLE)
               / CAST(CAST(sw AS VARCHAR) AS DOUBLE) AS m1,
             CAST(CAST(swcf$i AS VARCHAR) AS DOUBLE)
               / CAST(CAST(swc AS VARCHAR) AS DOUBLE) AS u1,
             CAST(CAST(sw AS VARCHAR) AS DOUBLE) / sn AS p1
           FROM agg"""
        }.mkString("\n          UNION ALL\n          ")
        s"""WITH $dFsCtes,
        cnt AS (SELECT pattern, COUNT(*) AS n FROM scored
          GROUP BY pattern),
        wt(pattern, w, wc) AS (VALUES
          $wRows),
        j AS (SELECT cnt.n, wt.pattern, wt.w, wt.wc
          FROM cnt JOIN wt USING (pattern)),
        agg AS (SELECT CAST(SUM(n) AS BIGINT) AS sn,
            SUM(n * w) AS sw, SUM(n * wc) AS swc,
            $fSums
          FROM j)
        $fRows
        ORDER BY field"""
      }),

    // ── Jaccard threshold sensitivity curve (q268) ─────────────────────
    // The dedup release knob: how many pairs (and how many documents)
    // survive at each candidate similarity cutoff, from q106's exact
    // prefix-filtered pair set at its ½ floor. One fan-out of the pair
    // table over the 5-threshold spine, then pair and distinct-doc
    // counts; thresholds below the generating floor are out of scope
    // by construction (the curve starts where the pair set is exact).
    // Comparisons are on the identical IEEE jaccard doubles both
    // engines already hash-agree on (q106), so the curve is exact.
    QueryDef("q268_jaccard_threshold_curve",
      (s, dir) => {
        val thr = Seq(0.5, 0.6, 0.7, 0.8, 0.9)
        val pairs = Dedup.prefixFilterJaccardPairs(
          tPar(s, dir, "documents"), "doc_id", "text", shingleK,
          ppjTNum, ppjTDen)
        val fan = pairs
          .select(explode(array(thr.map(lit(_)): _*)).as("threshold"),
            col("id_a"), col("id_b"), col("jaccard"))
          .filter(col("jaccard") >= col("threshold"))
          .localCheckpoint() // pair counts + doc counts both read it
        val np = fan.groupBy("threshold").agg(count(lit(1)).as("n_pairs"))
        val nd = fan.select(col("threshold"),
            explode(array(col("id_a"), col("id_b"))).as("d"))
          .groupBy("threshold").agg(countDistinct("d").as("n_docs"))
        fan.sparkSession.range(1)
          .select(explode(array(thr.map(lit(_)): _*)).as("threshold"))
          .join(np, Seq("threshold"), "left")
          .join(nd, Seq("threshold"), "left")
          .select(col("threshold"),
            coalesce(col("n_pairs"), lit(0L)).as("n_pairs"),
            coalesce(col("n_docs"), lit(0L)).as("n_docs"))
          .orderBy("threshold")
      },
      Some(s"""WITH sh AS (SELECT doc_id, unnest(list_distinct(
            ${dShingles(dTok, shingleK)})) AS tok FROM documents),
          sz AS (SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY doc_id),
          p AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b,
              COUNT(*) AS shared
            FROM sh a JOIN sh b USING (tok)
            WHERE a.doc_id < b.doc_id GROUP BY 1, 2),
          jac AS (SELECT id_a, id_b, CAST(shared AS DOUBLE)
              / CAST(x.n + y.n - shared AS DOUBLE) AS jaccard
            FROM p JOIN sz x ON p.id_a = x.doc_id
              JOIN sz y ON p.id_b = y.doc_id
            WHERE shared * $ppjTDen >= $ppjTNum * (x.n + y.n - shared)),
          thr AS (SELECT CAST(t AS DOUBLE) AS threshold
            FROM (VALUES (0.5), (0.6), (0.7), (0.8), (0.9)) v(t)),
          fan AS (SELECT threshold, id_a, id_b FROM jac JOIN thr
            ON jaccard >= threshold),
          np AS (SELECT threshold, COUNT(*) AS n_pairs FROM fan
            GROUP BY 1),
          nd AS (SELECT threshold, COUNT(DISTINCT d) AS n_docs
            FROM (SELECT threshold, unnest([id_a, id_b]) AS d FROM fan)
            GROUP BY 1)
        SELECT t.threshold,
          CAST(COALESCE(np.n_pairs, 0) AS BIGINT) AS n_pairs,
          CAST(COALESCE(nd.n_docs, 0) AS BIGINT) AS n_docs
        FROM thr t LEFT JOIN np USING (threshold)
          LEFT JOIN nd USING (threshold)
        ORDER BY threshold""")),

    // ── ANN recall@k evaluation (q269) ─────────────────────────────────
    // The eval harness as a first-class operator: per probe, how much
    // of the EXACT cosine top-k (q30's brute force) does the sign-LSH
    // bucketed search (q31) recover? recall = |approx ∩ exact| / k.
    // Both sides reuse the locked q30/q31 machinery verbatim, so this
    // measures the production index's quality with zero new similarity
    // arithmetic; at scale the exact side runs on a bounded probe
    // sample (here vec_id < 20) — the standard recall-audit shape.
    QueryDef("q269_ann_recall",
      (s, dir) => {
        val e = tPar(s, dir, "embeddings")
        val probes = e.filter(col("vec_id") < 20)
        val exact = Similarity.bruteForceTopK(e, probes, "vec_id",
            "embedding", topK)
          .select(col("probe_id"), col("nn_id"))
          .localCheckpoint() // spine + the hit join both read it
        val approx = Similarity.bucketedTopK(e, probes, "vec_id",
            "embedding", topK, annBits, annDims, annSeed, annTables)
          .select(col("probe_id"), col("nn_id"))
        val hits = exact.join(approx, Seq("probe_id", "nn_id"))
          .groupBy("probe_id").agg(count(lit(1)).as("n_hits"))
        exact.groupBy("probe_id").agg(count(lit(1)).as("k"))
          .join(hits, Seq("probe_id"), "left")
          .select(col("probe_id"), col("k"),
            coalesce(col("n_hits"), lit(0L)).as("n_hits"))
          .withColumn("recall",
            col("n_hits").cast("double") / col("k"))
          .orderBy("probe_id")
      },
      Some(s"""WITH expairs AS (
          SELECT a.vec_id AS probe_id, b.vec_id AS nn_id,
            (${dDot("a.embedding", "b.embedding")})
              / (sqrt(${dDot("a.embedding", "a.embedding")})
                 * sqrt(${dDot("b.embedding", "b.embedding")})) AS cos
          FROM embeddings a JOIN embeddings b ON a.vec_id <> b.vec_id
          WHERE a.vec_id < 20),
        ex AS (SELECT probe_id, nn_id FROM (
            SELECT *, row_number() OVER (PARTITION BY probe_id
              ORDER BY cos DESC, nn_id ASC) AS rank FROM expairs)
          WHERE rank <= $topK),
        v AS (SELECT vec_id,
            unnest(${dBucketTables("embedding")}) AS bk FROM embeddings),
        cand AS (
          SELECT DISTINCT a.vec_id AS probe_id, b.vec_id AS nn_id
          FROM v a JOIN v b ON a.bk = b.bk AND a.vec_id <> b.vec_id
          WHERE a.vec_id < 20),
        appairs AS (
          SELECT probe_id, nn_id,
            (${dDot("pa.embedding", "pb.embedding")})
              / (sqrt(${dDot("pa.embedding", "pa.embedding")})
                 * sqrt(${dDot("pb.embedding", "pb.embedding")})) AS cos
          FROM cand
          JOIN embeddings pa ON cand.probe_id = pa.vec_id
          JOIN embeddings pb ON cand.nn_id = pb.vec_id),
        ap AS (SELECT probe_id, nn_id FROM (
            SELECT *, row_number() OVER (PARTITION BY probe_id
              ORDER BY cos DESC, nn_id ASC) AS rank FROM appairs)
          WHERE rank <= $topK),
        hits AS (SELECT ex.probe_id, COUNT(*) AS n_hits
          FROM ex JOIN ap ON ex.probe_id = ap.probe_id
            AND ex.nn_id = ap.nn_id
          GROUP BY ex.probe_id),
        spine AS (SELECT probe_id, COUNT(*) AS k FROM ex
          GROUP BY probe_id)
        SELECT s.probe_id, s.k,
          CAST(COALESCE(h.n_hits, 0) AS BIGINT) AS n_hits,
          CAST(COALESCE(h.n_hits, 0) AS DOUBLE) / s.k AS recall
        FROM spine s LEFT JOIN hits h ON s.probe_id = h.probe_id
        ORDER BY s.probe_id""")),

    // ── Data-scaling curve (q270) ──────────────────────────────────────
    // "How much data do we need?" — the metric recomputed on nested
    // deterministic hash subsamples (10/25/50/100% of USERS, so each
    // smaller sample is a strict subset of the larger: the curve is
    // monotone in information, not resampling noise). One per-user
    // aggregation, then a 4-way fan against the bounded fraction
    // spine; per-user value sums ride the decimal rail so every
    // sample's mean is layout-independent.
    QueryDef("q270_data_scaling_curve",
      (s, dir) => {
        val per = t(s, dir, "events")
          .groupBy("user_id")
          .agg(sum(when(col("event_type") === "purchase", 1L)
            .otherwise(0L)).as("np"),
            sum(when(col("event_type") === "purchase",
              col("value").cast("decimal(30,8)"))
              .otherwise(lit(java.math.BigDecimal.ZERO)
                .cast("decimal(30,8)")))
              .cast("decimal(30,8)").as("sv"))
          .select((Shingles.baseHash(col("user_id").cast("string")) % 100)
            .as("h"), col("np"), col("sv"))
        val fr = per.sparkSession.range(1)
          .select(explode(array(Seq(10L, 25L, 50L, 100L)
            .map(lit(_)): _*)).as("pct"))
        per.join(broadcast(fr), col("h") < col("pct"))
          .groupBy("pct")
          .agg(count(lit(1)).as("n_users"),
            sum("np").as("n_purchases"),
            sum(col("sv")).cast("decimal(30,8)").as("svtot"))
          .select(col("pct"), col("n_users"), col("n_purchases"),
            (col("n_purchases").cast("double") / col("n_users"))
              .as("purchases_per_user"),
            (col("svtot").cast("double") / col("n_purchases"))
              .as("mean_purchase"))
          .orderBy("pct")
      },
      Some("""WITH per AS (SELECT user_id,
            ('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 7))::BIGINT
              % 100 AS h,
            CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0
              END) AS BIGINT) AS np,
            CAST(SUM(CASE WHEN event_type = 'purchase'
                THEN CAST(value AS DECIMAL(30,8))
                ELSE CAST(0 AS DECIMAL(30,8)) END) AS DECIMAL(30,8))
              AS sv
          FROM events GROUP BY user_id),
        fr AS (SELECT CAST(f AS BIGINT) AS pct
          FROM (VALUES (10), (25), (50), (100)) v(f)),
        fan AS (SELECT pct, np, sv FROM per JOIN fr ON per.h < fr.pct)
        SELECT pct, COUNT(*) AS n_users,
          CAST(SUM(np) AS BIGINT) AS n_purchases,
          CAST(SUM(np) AS DOUBLE) / COUNT(*) AS purchases_per_user,
          CAST(CAST(SUM(sv) AS VARCHAR) AS DOUBLE)
            / CAST(SUM(np) AS BIGINT) AS mean_purchase
        FROM fan GROUP BY pct ORDER BY pct""")),

    // ── Group-sequential monitoring, O'Brien–Fleming (q271) ────────────
    // The peeking-safe A/B readout: the two-proportion z (q222's exact
    // chain) evaluated at 4 interim looks over the experiment's
    // timeline, against the O'Brien–Fleming-shaped boundary
    // c·√(K/k) with c = 2.024 (the K=4, two-sided α≈0.05 final-look
    // critical value) — conservative early, nominal late. Conversion
    // is first premium purchase (value > 95) by the look cutoff so the
    // rate never saturates. Look cutoffs are integer day quantiles of
    // the observed span; all counts are exact, z and boundary are
    // identical literal chains in both engines.
    QueryDef("q271_group_sequential",
      (s, dir) => {
        val ev = t(s, dir, "events")
          .select(col("user_id"), col("event_type"), col("value"),
            expr("unix_micros(ts) div 86400000000").as("day"))
        val looks = ev.agg(min("day").as("d0"), max("day").as("d1"))
          .select(explode(array((1L to 4L).map(lit(_)): _*)).as("k"),
            col("d0"), col("d1"))
          .select(col("k"),
            expr("d0 + ((d1 - d0 + 1) * k) div 4 - 1").as("cut"))
        val per = ev.groupBy("user_id")
          .agg(min(when(col("event_type") === "purchase" &&
            col("value") > 95, col("day"))).as("fp"))
          .select((Shingles.baseHash(col("user_id").cast("string")) % 2)
            .as("arm"), col("fp"))
        val cum = per.crossJoin(broadcast(looks))
          .groupBy("k", "cut", "arm")
          .agg(count(lit(1)).as("n"),
            sum(when(col("fp").isNotNull && col("fp") <= col("cut"), 1L)
              .otherwise(0L)).as("x"))
        val wide = cum.groupBy("k", "cut")
          .agg(max(when(col("arm") === 1, col("n"))).as("n_t"),
            max(when(col("arm") === 1, col("x"))).as("x_t"),
            max(when(col("arm") === 0, col("n"))).as("n_c"),
            max(when(col("arm") === 0, col("x"))).as("x_c"))
        val pT = col("x_t").cast("double") / col("n_t")
        val pC = col("x_c").cast("double") / col("n_c")
        val pp = (col("x_t") + col("x_c")).cast("double") /
          (col("n_t") + col("n_c"))
        val zv = (pT - pC) / sqrt(pp * (lit(1) - pp) *
          (lit(1.0) / col("n_t") + lit(1.0) / col("n_c")))
        val bd = lit(2.024) * sqrt(lit(4.0) / col("k"))
        wide.select(col("k"), col("cut"), col("n_t"), col("n_c"),
            col("x_t"), col("x_c"), zv.as("z"), bd.as("boundary"),
            (abs(zv) > bd).cast("int").as("crossed"))
          .orderBy("k")
      },
      Some("""WITH ev AS (SELECT user_id, event_type, value,
            epoch_us(ts) // 86400000000 AS day FROM events),
        b AS (SELECT MIN(day) AS d0, MAX(day) AS d1 FROM ev),
        looks AS (SELECT k, d0 + ((d1 - d0 + 1) * k) // 4 - 1 AS cut
          FROM b CROSS JOIN (SELECT unnest(range(1, 5)) AS k)),
        per AS (SELECT user_id,
            ('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 7))::BIGINT
              % 2 AS arm,
            MIN(CASE WHEN event_type = 'purchase' AND value > 95
              THEN day END) AS fp
          FROM ev GROUP BY user_id),
        cum AS (SELECT k, cut, arm, COUNT(*) AS n,
            CAST(SUM(CASE WHEN fp IS NOT NULL AND fp <= cut
              THEN 1 ELSE 0 END) AS BIGINT) AS x
          FROM per CROSS JOIN looks GROUP BY 1, 2, 3),
        wide AS (SELECT k, cut,
            MAX(CASE WHEN arm = 1 THEN n END) AS n_t,
            MAX(CASE WHEN arm = 1 THEN x END) AS x_t,
            MAX(CASE WHEN arm = 0 THEN n END) AS n_c,
            MAX(CASE WHEN arm = 0 THEN x END) AS x_c
          FROM cum GROUP BY 1, 2),
        z AS (SELECT k, cut, n_t, n_c, x_t, x_c,
            CAST(x_t AS DOUBLE) / n_t AS p_t,
            CAST(x_c AS DOUBLE) / n_c AS p_c,
            CAST(x_t + x_c AS DOUBLE) / (n_t + n_c) AS pp FROM wide)
        SELECT k, cut, CAST(n_t AS BIGINT) AS n_t,
          CAST(n_c AS BIGINT) AS n_c, x_t, x_c,
          (p_t - p_c) / sqrt(pp * (1 - pp) * (1.0/n_t + 1.0/n_c)) AS z,
          2.024 * sqrt(4.0 / k) AS boundary,
          CAST(abs((p_t - p_c) /
            sqrt(pp * (1 - pp) * (1.0/n_t + 1.0/n_c)))
            > 2.024 * sqrt(4.0 / k) AS INT) AS crossed
        FROM z ORDER BY k""")),

    // ── Sample-ratio-mismatch check (q272) ─────────────────────────────
    // The experiment health gate that runs BEFORE any readout: with a
    // 50/50 split, the 2-cell χ² against equal expected counts
    // collapses to (n_t − n_c)²/n; flag when it clears the df=1
    // α=0.05 critical value 3.841 (a literal — no CDF). An SRM flag
    // means assignment itself is broken and every downstream metric
    // is suspect. One distinct-user aggregation, O(1) output.
    QueryDef("q272_srm_check",
      (s, dir) => {
        val chi = col("n_t").minus(col("n_c"))
          .multiply(col("n_t").minus(col("n_c"))).cast("double") /
          (col("n_t") + col("n_c"))
        t(s, dir, "events")
          .select(col("user_id")).distinct()
          .select((Shingles.baseHash(col("user_id").cast("string")) % 2)
            .as("arm"))
          .agg(sum(when(col("arm") === 1, 1L).otherwise(0L)).as("n_t"),
            sum(when(col("arm") === 0, 1L).otherwise(0L)).as("n_c"))
          .select(col("n_t"), col("n_c"), chi.as("chi2"),
            (chi > 3.841).cast("int").as("srm_flag"))
      },
      Some("""WITH per AS (SELECT DISTINCT user_id,
            ('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 7))::BIGINT
              % 2 AS arm
          FROM events),
        c AS (SELECT
            CAST(SUM(CASE WHEN arm = 1 THEN 1 ELSE 0 END) AS BIGINT)
              AS n_t,
            CAST(SUM(CASE WHEN arm = 0 THEN 1 ELSE 0 END) AS BIGINT)
              AS n_c
          FROM per)
        SELECT n_t, n_c,
          CAST((n_t - n_c) * (n_t - n_c) AS DOUBLE) / (n_t + n_c)
            AS chi2,
          CAST(CAST((n_t - n_c) * (n_t - n_c) AS DOUBLE) / (n_t + n_c)
            > 3.841 AS INT) AS srm_flag
        FROM c""")),

    // ── Vocabulary coverage cut (q273) ─────────────────────────────────
    // Tokenizer sizing: the smallest frequency-ranked vocabulary
    // covering ≥90% of token mass (the keep rule `(cum − c)·10 <
    // total·9` admits exactly the types whose PRECEDING mass is under
    // the bar — integer cross-multiplication, no float threshold).
    // The ranking window runs over the VOCABULARY (types, not tokens
    // — the q76/q161 shape); output is one row of corpus constants.
    QueryDef("q273_vocab_coverage",
      (s, dir) => {
        val vf = tPar(s, dir, "documents")
          .select(explode(TextStats.tokens(col("text"))).as("tok"))
          .groupBy("tok").agg(count(lit(1)).as("c"))
        val w = boundedWindow(col("c").desc, col("tok"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        vf.withColumn("cumc", sum("c").over(w))
          .withColumn("total", sum("c").over(
            Window.rowsBetween(Window.unboundedPreceding,
              Window.unboundedFollowing)))
          .withColumn("n_types", count(lit(1)).over(
            Window.rowsBetween(Window.unboundedPreceding,
              Window.unboundedFollowing)))
          .filter((col("cumc") - col("c")) * 10 < col("total") * 9)
          .agg(max("n_types").as("n_types"),
            count(lit(1)).as("types_kept"),
            max("total").as("tokens_total"),
            max("cumc").as("tokens_covered"))
          .select(col("n_types"), col("types_kept"),
            col("tokens_total"), col("tokens_covered"),
            (col("tokens_covered").cast("double") / col("tokens_total"))
              .as("coverage"))
      },
      Some(s"""WITH tk AS (SELECT unnest($dTok) AS tok FROM documents),
        vf AS (SELECT tok, COUNT(*) AS c FROM tk GROUP BY tok),
        cum AS (SELECT tok, c,
            SUM(c) OVER (ORDER BY c DESC, tok
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cumc,
            SUM(c) OVER () AS total, COUNT(*) OVER () AS n_types
          FROM vf),
        kept AS (SELECT * FROM cum WHERE (cumc - c) * 10 < total * 9)
        SELECT CAST(MAX(n_types) AS BIGINT) AS n_types,
          CAST(COUNT(*) AS BIGINT) AS types_kept,
          CAST(MAX(total) AS BIGINT) AS tokens_total,
          CAST(MAX(cumc) AS BIGINT) AS tokens_covered,
          CAST(MAX(cumc) AS DOUBLE) / MAX(total) AS coverage
        FROM kept""")),

    // ── Permutation test + Benjamini–Hochberg FDR (q274) ───────────────
    // Exact p-values WITHOUT any CDF: per event type, the observed
    // |arm mean-value difference| (user-hash arms, seed b=0) is ranked
    // against B=32 re-randomized replicas (seeds 1..32, q194's
    // replicate-fan shape), giving the permutation p = (1+#{T_b ≥
    // T_obs})/(B+1) — a RATIONAL. BH then rejects p(i) ≤ α·i/m via the
    // all-integer test 20·m·k ≤ i·(B+1) (α=1/20), so the whole
    // multiple-testing pipeline is arithmetic both engines do exactly.
    // On this null corpus zero rejections IS the correct answer — the
    // machinery is what ships. Value sums ride the decimal rail.
    QueryDef("q274_permutation_fdr",
      (s, dir) => {
        val B = 32
        val dec0 = lit(java.math.BigDecimal.ZERO).cast("decimal(30,8)")
        // Pre-aggregate to (type, USER) once — arms are a function of
        // (user, seed), so the ×(B+1) fan multiplies the bounded
        // user-type table, not the event stream; decimal partials make
        // the regrouped sums bit-identical to the naive per-event fan.
        val per = t(s, dir, "events")
          .groupBy("event_type", "user_id")
          .agg(sum(col("value").cast("decimal(30,8)"))
            .cast("decimal(30,8)").as("sv"),
            count(lit(1)).as("nv"))
        val asg = per
          .select(col("event_type"), col("user_id"), col("sv"),
            col("nv"), explode(array((0 to B).map(lit(_)): _*)).as("b"))
          .withColumn("arm", Shingles.baseHash(
            concat(col("b").cast("string"), lit("|"),
              col("user_id").cast("string"))) % 2)
        val agg = asg.groupBy("event_type", "b")
          .agg(sum(when(col("arm") === 1, col("sv")).otherwise(dec0))
            .cast("double").as("s1"),
            sum(when(col("arm") === 1, col("nv")).otherwise(0L))
              .as("n1"),
            sum(when(col("arm") === 0, col("sv")).otherwise(dec0))
              .cast("double").as("s0"),
            sum(when(col("arm") === 0, col("nv")).otherwise(0L))
              .as("n0"))
          .select(col("event_type"), col("b"),
            abs(col("s1") / col("n1") - col("s0") / col("n0"))
              .as("tstat"))
          .localCheckpoint() // observed row + replica ranking
        val obs = agg.filter(col("b") === 0)
          .select(col("event_type"), col("tstat").as("tobs"))
        val p = agg.join(obs, "event_type")
          .groupBy("event_type")
          .agg((lit(1L) + sum(when(col("b") > 0 &&
            col("tstat") >= col("tobs"), 1L).otherwise(0L))).as("k"))
        val wr = boundedWindow("k", "event_type")
        p.withColumn("i", row_number().over(wr))
          .crossJoin(broadcast(p.agg(count(lit(1)).as("m"))))
          .select(col("event_type"), col("k").as("p_num"),
            lit((B + 1).toLong).as("p_den"),
            (col("k").cast("double") / (B + 1)).as("p_value"),
            (lit(20L) * col("m") * col("k") <=
              col("i") * (B + 1)).cast("int").as("bh_reject"))
          .orderBy("event_type")
      },
      Some("""WITH reps AS (SELECT unnest(range(0, 33)) AS b),
        per AS (SELECT event_type, user_id,
            CAST(SUM(CAST(value AS DECIMAL(30,8))) AS DECIMAL(30,8))
              AS sv,
            COUNT(*) AS nv
          FROM events GROUP BY 1, 2),
        asg AS (SELECT event_type, b, sv, nv,
            ('0x' || substr(md5(CAST(b AS VARCHAR) || '|' ||
              CAST(user_id AS VARCHAR)), 1, 7))::BIGINT % 2 AS arm
          FROM per CROSS JOIN reps),
        agg AS (SELECT event_type, b,
            CAST(CAST(SUM(CASE WHEN arm = 1 THEN sv
              ELSE CAST(0 AS DECIMAL(30,8)) END) AS VARCHAR) AS DOUBLE)
              AS s1,
            CAST(SUM(CASE WHEN arm = 1 THEN nv ELSE 0 END) AS BIGINT)
              AS n1,
            CAST(CAST(SUM(CASE WHEN arm = 0 THEN sv
              ELSE CAST(0 AS DECIMAL(30,8)) END) AS VARCHAR) AS DOUBLE)
              AS s0,
            CAST(SUM(CASE WHEN arm = 0 THEN nv ELSE 0 END) AS BIGINT)
              AS n0
          FROM asg GROUP BY 1, 2),
        t AS (SELECT event_type, b, abs(s1/n1 - s0/n0) AS tstat
          FROM agg),
        obs AS (SELECT event_type, tstat AS tobs FROM t WHERE b = 0),
        p AS (SELECT t.event_type,
            CAST(1 + SUM(CASE WHEN t.b > 0 AND t.tstat >= obs.tobs
              THEN 1 ELSE 0 END) AS BIGINT) AS k
          FROM t JOIN obs USING (event_type) GROUP BY t.event_type),
        rk AS (SELECT event_type, k,
            ROW_NUMBER() OVER (ORDER BY k, event_type) AS i,
            COUNT(*) OVER () AS m FROM p)
        SELECT event_type, k AS p_num, CAST(33 AS BIGINT) AS p_den,
          CAST(k AS DOUBLE) / 33 AS p_value,
          CAST(CASE WHEN 20 * m * k <= i * 33 THEN 1 ELSE 0 END AS INT)
            AS bh_reject
        FROM rk ORDER BY event_type""")),

    // ── HITS authority on the order–part bipartite graph (q275) ────────
    // Kleinberg's hubs-and-authorities next to the PPR/BFS/k-core
    // family: orders are hubs, parts authorities, edges the DISTINCT
    // lineitem pairs. Two UNROLLED unnormalized iterations (a¹ =
    // in-degree, h¹ = Σ a¹, a² = Σ h¹) keep every score an exact
    // BIGINT — normalization only rescales the ranking, so the top-20
    // authority parts are identical to the normalized variant's. Each
    // iteration is one join + one aggregation on the edge key: the
    // textbook iterate-as-relational-pass shape that runs at any edge
    // count.
    QueryDef("q275_hits_bipartite",
      (s, dir) => {
        val e = t(s, dir, "lineitem")
          .select(col("l_orderkey").as("o"), col("l_partkey").as("p"))
          .distinct()
          .localCheckpoint() // three iteration passes re-read the edges
        val a1 = e.groupBy("p").agg(count(lit(1)).as("a"))
        val h1 = e.join(a1, "p").groupBy("o").agg(sum("a").as("h"))
        val a2 = e.join(h1, "o").groupBy("p").agg(sum("h").as("a"))
        graft.plans.TopKPerKey.topKPerKey(
            a2.withColumn("g", lit(1)), Seq("g"),
            Seq(graft.plans.TopKPerKey.Sort("a", asc = false),
              graft.plans.TopKPerKey.Sort("p")), 20)
          .select(col("p").as("partkey"), col("a").as("authority2"))
          .orderBy(desc("authority2"), col("partkey"))
      },
      Some("""WITH e AS (SELECT DISTINCT l_orderkey AS o, l_partkey AS p
            FROM lineitem),
        a1 AS (SELECT p, CAST(COUNT(*) AS BIGINT) AS a FROM e
          GROUP BY p),
        h1 AS (SELECT o, CAST(SUM(a) AS BIGINT) AS h
          FROM e JOIN a1 USING (p) GROUP BY o),
        a2 AS (SELECT p, CAST(SUM(h) AS BIGINT) AS a
          FROM e JOIN h1 USING (o) GROUP BY p)
        SELECT p AS partkey, a AS authority2 FROM a2
        ORDER BY a DESC, p LIMIT 20""")),

    // ── Bipartite degree assortativity (q276) ──────────────────────────
    // Do busy orders buy popular parts? Pearson correlation of the
    // endpoint degrees over every edge — the graph-health scalar that
    // distinguishes hub-concentrated from flat topologies. All five
    // moments are exact BIGINTs in one pass over the degree-joined
    // edges (n·sxy-style products stay under 2⁶³ to ~10⁶ edges ×
    // 10³ degrees; past that the moments cast to DECIMAL(38,0)
    // without changing shape), then one literal double chain.
    QueryDef("q276_degree_assortativity",
      (s, dir) => {
        val e = t(s, dir, "lineitem")
          .select(col("l_orderkey").as("o"), col("l_partkey").as("p"))
          .distinct()
          .localCheckpoint() // two degree passes + the moment join
        val dgo = e.groupBy("o").agg(count(lit(1)).as("x"))
        val dgp = e.groupBy("p").agg(count(lit(1)).as("y"))
        e.join(dgo, "o").join(dgp, "p")
          .agg(count(lit(1)).as("n"), sum("x").as("sx"),
            sum("y").as("sy"), sum(col("x") * col("y")).as("sxy"),
            sum(col("x") * col("x")).as("sxx"),
            sum(col("y") * col("y")).as("syy"))
          .select(col("n"),
            ((col("n") * col("sxy") - col("sx") * col("sy"))
              .cast("double") /
              (sqrt((col("n") * col("sxx") - col("sx") * col("sx"))
                .cast("double")) *
               sqrt((col("n") * col("syy") - col("sy") * col("sy"))
                 .cast("double")))).as("assortativity"))
      },
      Some("""WITH e AS (SELECT DISTINCT l_orderkey AS o, l_partkey AS p
            FROM lineitem),
        dgo AS (SELECT o, CAST(COUNT(*) AS BIGINT) AS x FROM e
          GROUP BY o),
        dgp AS (SELECT p, CAST(COUNT(*) AS BIGINT) AS y FROM e
          GROUP BY p),
        j AS (SELECT x, y FROM e JOIN dgo USING (o) JOIN dgp USING (p)),
        m AS (SELECT CAST(COUNT(*) AS BIGINT) AS n,
            CAST(SUM(x) AS BIGINT) AS sx, CAST(SUM(y) AS BIGINT) AS sy,
            CAST(SUM(x*y) AS BIGINT) AS sxy,
            CAST(SUM(x*x) AS BIGINT) AS sxx,
            CAST(SUM(y*y) AS BIGINT) AS syy FROM j)
        SELECT n, CAST(n*sxy - sx*sy AS DOUBLE) /
            (sqrt(CAST(n*sxx - sx*sx AS DOUBLE)) *
             sqrt(CAST(n*syy - sy*sy AS DOUBLE))) AS assortativity
        FROM m""")),

    // ── Effective sample size of a weighted design (q277) ──────────────
    // The sampling diagnostic for q114/q259-style weighted draws:
    // Kish's ESS = (Σw)²/Σw² — how many EQUAL-weight samples the
    // length-weighted document design is actually worth. ESS/n near 1
    // means weighting costs little variance; a heavy-tailed corpus
    // drives it down and argues for weight clipping before sampling.
    // Two exact integer moments, one row out.
    QueryDef("q277_ess_weights",
      (s, dir) => t(s, dir, "documents")
        .select(col("n_chars").cast("long").as("w"))
        .agg(count(lit(1)).as("n"), sum("w").as("sw"),
          sum(col("w") * col("w")).as("sww"))
        .select(col("n"), col("sw"),
          ((col("sw") * col("sw")).cast("double") / col("sww"))
            .as("ess"),
          ((col("sw") * col("sw")).cast("double") / col("sww") /
            col("n")).as("ess_ratio")),
      Some("""WITH m AS (SELECT CAST(COUNT(*) AS BIGINT) AS n,
            CAST(SUM(n_chars) AS BIGINT) AS sw,
            CAST(SUM(n_chars * n_chars) AS BIGINT) AS sww
          FROM documents)
        SELECT n, sw, CAST(sw*sw AS DOUBLE) / sww AS ess,
          CAST(sw*sw AS DOUBLE) / sww / n AS ess_ratio
        FROM m""")),

    // ── Language-ID confusion matrix (q278) ────────────────────────────
    // q22 predicts; this grades it against the labeled `lang` column —
    // the eval loop every classifier in the curation stack needs. Full
    // (label, prediction) matrix with each row's share of its true
    // label (row-normalized recall view), bounded by |langs|². Counts
    // are exact; the one double per row is n / label total.
    QueryDef("q278_langid_confusion",
      (s, dir) => {
        val pred = tPar(s, dir, "documents")
          .select(col("lang"), TextStats.langId(col("text")).as("lang_pred"))
        val m = pred.groupBy("lang", "lang_pred")
          .agg(count(lit(1)).as("n"))
        val tot = m.groupBy("lang").agg(sum("n").as("n_label"))
        m.join(tot, "lang")
          .select(col("lang"), col("lang_pred"), col("n"),
            col("n_label"),
            (col("n").cast("double") / col("n_label")).as("row_frac"))
          .orderBy("lang", "lang_pred")
      },
      Some(s"""WITH pred AS (SELECT lang, lang_pred FROM $dLangPredFrom),
        m AS (SELECT lang, lang_pred, COUNT(*) AS n FROM pred
          GROUP BY 1, 2),
        tot AS (SELECT lang, CAST(SUM(n) AS BIGINT) AS n_label FROM m
          GROUP BY lang)
        SELECT m.lang, m.lang_pred, m.n, tot.n_label,
          CAST(m.n AS DOUBLE) / tot.n_label AS row_frac
        FROM m JOIN tot USING (lang)
        ORDER BY m.lang, m.lang_pred""")),

    // ── Hash-sample bias audit (q279) ──────────────────────────────────
    // Before trusting any 10% dev sample: the total-variation distance
    // between the sample's and the corpus's source mix, TV = ½·Σ|p_s −
    // q_s|, cross-multiplied to the integer Σ|n_s·N − m_s·M| over
    // 2·M·N — plus the worst-deviating source for the drill-down. One
    // conditional aggregation per source; the audit costs one corpus
    // pass whatever the corpus size.
    QueryDef("q279_sample_bias_tv",
      (s, dir) => {
        val per = t(s, dir, "documents")
          .select(col("source"),
            (Shingles.baseHash(col("doc_id").cast("string")) % 10 === 0)
              .as("insamp"))
          .groupBy("source")
          .agg(count(lit(1)).as("nf"),
            sum(when(col("insamp"), 1L).otherwise(0L)).as("ns"))
          .localCheckpoint() // totals fold + the deviation projection
        val tot = per.agg(sum("nf").as("bigN"), sum("ns").as("bigM"))
        val dev = per.crossJoin(broadcast(tot))
          .select(col("source"),
            abs(col("ns") * col("bigN") - col("nf") * col("bigM"))
              .as("devnum"), col("bigN"), col("bigM"))
          .localCheckpoint() // TV fold + the worst-source ranking
        val wr = boundedWindow(col("devnum").desc, col("source"))
        val worst = dev.withColumn("rk", row_number().over(wr))
          .filter(col("rk") === 1)
          .select(col("source").as("worst_source"),
            col("devnum").as("worst_devnum"))
        dev.groupBy("bigN", "bigM")
          .agg(count(lit(1)).as("n_sources"),
            sum("devnum").as("tvnum"))
          .crossJoin(broadcast(worst))
          .select(col("n_sources"), col("bigN").as("n_full"),
            col("bigM").as("n_sample"),
            (col("tvnum").cast("double") /
              (lit(2L) * col("bigM") * col("bigN")).cast("double"))
              .as("tv_distance"),
            col("worst_source"),
            (col("worst_devnum").cast("double") /
              (col("bigM") * col("bigN")).cast("double"))
              .as("worst_share_gap"))
      },
      Some("""WITH per AS (SELECT source, COUNT(*) AS nf,
            CAST(SUM(CASE WHEN ('0x' || substr(md5(CAST(doc_id AS
              VARCHAR)), 1, 7))::BIGINT % 10 = 0 THEN 1 ELSE 0 END)
              AS BIGINT) AS ns
          FROM documents GROUP BY source),
        tot AS (SELECT CAST(SUM(nf) AS BIGINT) AS bigN,
            CAST(SUM(ns) AS BIGINT) AS bigM FROM per),
        dev AS (SELECT source,
            CAST(abs(ns * bigN - nf * bigM) AS BIGINT) AS devnum,
            bigN, bigM
          FROM per CROSS JOIN tot),
        worst AS (SELECT source AS worst_source,
            devnum AS worst_devnum
          FROM dev ORDER BY devnum DESC, source LIMIT 1),
        agg AS (SELECT bigN, bigM, COUNT(*) AS n_sources,
            CAST(SUM(devnum) AS BIGINT) AS tvnum
          FROM dev GROUP BY bigN, bigM)
        SELECT n_sources, bigN AS n_full, bigM AS n_sample,
          CAST(tvnum AS DOUBLE) / (CAST(2 * bigM * bigN AS DOUBLE))
            AS tv_distance,
          worst_source,
          CAST(worst_devnum AS DOUBLE) / CAST(bigM * bigN AS DOUBLE)
            AS worst_share_gap
        FROM agg CROSS JOIN worst""")),

    // ── Binary-segmentation changepoints, all-integer (q280) ───────────
    // The detector family's recursive member (CUSUM q155 → Pettitt
    // q211 → Page–Hinkley q266 → binseg): on each event type's daily
    // COUNT series the CUSUM statistic is cross-multiplied to
    // C_i = cum_i·T − i·total — pure BIGINTs, so the split argmax is
    // integer-exact with a deterministic day tie-break; the second
    // level reruns the identical pass inside each half. All windows
    // are partitioned by (type[, segment]) over the bounded calendar.
    QueryDef("q280_binary_segmentation",
      (s, dir) => {
        def pass(df: DataFrame, part: Seq[String]): DataFrame = {
          val wo = Window.partitionBy(part.map(col): _*).orderBy("day")
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
          val wa = Window.partitionBy(part.map(col): _*)
            .rowsBetween(Window.unboundedPreceding,
              Window.unboundedFollowing)
          val scored = df
            .withColumn("i", count(lit(1)).over(wo))
            .withColumn("cum", sum("c").over(wo))
            .withColumn("bigT", count(lit(1)).over(wa))
            .withColumn("total", sum("c").over(wa))
            .withColumn("score",
              abs(col("cum") * col("bigT") - col("i") * col("total")))
          val wr = Window.partitionBy(part.map(col): _*)
            .orderBy(col("score").desc, col("day"))
          scored.withColumn("rk", row_number().over(wr))
        }
        val dly = t(s, dir, "events")
          .groupBy(col("event_type"),
            expr("unix_micros(ts) div 86400000000").as("day"))
          .agg(count(lit(1)).as("c"))
          .localCheckpoint() // level-1 pass + the segmented level-2 pass
        val l1 = pass(dly, Seq("event_type"))
        val cp1 = l1.filter(col("rk") === 1)
          .select(col("event_type"), col("day").as("cp1"),
            col("score").as("s1"))
        val l2 = pass(dly.join(cp1.select("event_type", "cp1"),
            "event_type")
          .withColumn("segment",
            when(col("day") <= col("cp1"), "left").otherwise("right")),
          Seq("event_type", "segment"))
        cp1.select(col("event_type"), lit("all").as("segment"),
            col("cp1").as("cp_day"), col("s1").as("score"))
          .union(l2.filter(col("rk") === 1)
            .select(col("event_type"), col("segment"),
              col("day").as("cp_day"), col("score")))
          .orderBy("event_type", "segment")
      },
      Some("""WITH dly AS (SELECT event_type,
            epoch_us(ts) // 86400000000 AS day, COUNT(*) AS c
          FROM events GROUP BY 1, 2),
        l1 AS (SELECT event_type, day,
            abs(SUM(c) OVER (PARTITION BY event_type ORDER BY day
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
              * COUNT(*) OVER (PARTITION BY event_type)
              - (ROW_NUMBER() OVER (PARTITION BY event_type
                  ORDER BY day))
                * SUM(c) OVER (PARTITION BY event_type)) AS score
          FROM dly),
        cp1 AS (SELECT event_type, day AS cp1, score AS s1 FROM (
            SELECT *, ROW_NUMBER() OVER (PARTITION BY event_type
              ORDER BY score DESC, day) AS rk FROM l1)
          WHERE rk = 1),
        seg AS (SELECT d.event_type, d.day, d.c,
            CASE WHEN d.day <= cp1.cp1 THEN 'left' ELSE 'right' END
              AS segment
          FROM dly d JOIN cp1 ON d.event_type = cp1.event_type),
        l2 AS (SELECT event_type, segment, day,
            abs(SUM(c) OVER (PARTITION BY event_type, segment
                ORDER BY day
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
              * COUNT(*) OVER (PARTITION BY event_type, segment)
              - (ROW_NUMBER() OVER (PARTITION BY event_type, segment
                  ORDER BY day))
                * SUM(c) OVER (PARTITION BY event_type, segment))
              AS score
          FROM seg),
        cp2 AS (SELECT event_type, segment, day AS cp_day, score FROM (
            SELECT *, ROW_NUMBER() OVER (PARTITION BY event_type,
              segment ORDER BY score DESC, day) AS rk FROM l2)
          WHERE rk = 1)
        SELECT event_type, 'all' AS segment, cp1 AS cp_day,
          CAST(s1 AS BIGINT) AS score FROM cp1
        UNION ALL
        SELECT event_type, segment, cp_day, CAST(score AS BIGINT)
        FROM cp2
        ORDER BY event_type, segment""")),

    // ── One-way ANOVA: weekday effect on daily volume (q281) ───────────
    // Does day-of-week move traffic? Fisher's F over the 7 weekday
    // groups of the daily event-count series: SSB/SSW from exact
    // integer moments (the only non-integer steps are the textbook
    // double chain and the 7 decimal-railed Σ s_g²/n_g terms), judged
    // against the literal F(6, 23) ≈ 2.53 critical value — no CDF.
    // Weekday = (epoch_day + 4) % 7 (1970-01-01 was a Thursday). On
    // this uniform synthetic corpus "no effect" is the right answer;
    // the machinery is the deliverable.
    QueryDef("q281_anova_weekday",
      (s, dir) => {
        val g = t(s, dir, "events")
          .groupBy(expr("unix_micros(ts) div 86400000000").as("day"))
          .agg(count(lit(1)).as("c"))
          .groupBy(expr("(day + 4) % 7").as("weekday"))
          .agg(count(lit(1)).as("ng"), sum("c").as("sg"),
            sum(col("c") * col("c")).as("sgg"))
          .localCheckpoint() // totals fold + the SSB term fold
        val tot = g.agg(sum("ng").as("n"), sum("sg").as("st"),
          sum("sgg").as("stt"), count(lit(1)).as("k"))
        val ssbTerm = g
          .agg(sum((col("sg").cast("double") * col("sg") / col("ng"))
            .cast("decimal(30,8)")).cast("double").as("sgsq"))
        val sst = col("stt").cast("double") -
          col("st").cast("double") * col("st") / col("n")
        val ssb = col("sgsq") -
          col("st").cast("double") * col("st") / col("n")
        val f = (ssb / (col("k") - 1)) / ((sst - ssb) / (col("n") - col("k")))
        tot.crossJoin(broadcast(ssbTerm))
          .select(col("n"), col("k"), ssb.as("ssb"),
            (sst - ssb).as("ssw"), f.as("f_stat"),
            (f > 2.53).cast("int").as("reject"))
      },
      Some("""WITH dly AS (SELECT epoch_us(ts) // 86400000000 AS day,
            COUNT(*) AS c FROM events GROUP BY 1),
        g AS (SELECT (day + 4) % 7 AS weekday, COUNT(*) AS ng,
            CAST(SUM(c) AS BIGINT) AS sg,
            CAST(SUM(c*c) AS BIGINT) AS sgg
          FROM dly GROUP BY 1),
        tot AS (SELECT CAST(SUM(ng) AS BIGINT) AS n,
            CAST(SUM(sg) AS BIGINT) AS st,
            CAST(SUM(sgg) AS BIGINT) AS stt, COUNT(*) AS k FROM g),
        term AS (SELECT CAST(CAST(SUM(CAST(
              CAST(sg AS DOUBLE) * sg / ng AS DECIMAL(30,8)))
            AS VARCHAR) AS DOUBLE) AS sgsq FROM g),
        ss AS (SELECT n, k,
            CAST(stt AS DOUBLE) - CAST(st AS DOUBLE) * st / n AS sst,
            sgsq - CAST(st AS DOUBLE) * st / n AS ssb
          FROM tot CROSS JOIN term)
        SELECT n, k, ssb, sst - ssb AS ssw,
          (ssb / (k - 1)) / ((sst - ssb) / (n - k)) AS f_stat,
          CAST((ssb / (k - 1)) / ((sst - ssb) / (n - k)) > 2.53 AS INT)
            AS reject
        FROM ss""")),

    // ── Partial autocorrelation to lag 3 (q282) ────────────────────────
    // The AR-order diagnostic q168's ACF can't give: Durbin–Levinson
    // UNROLLED to level 3, so each φ_kk is a literal arithmetic chain
    // over r₁..r₃ — no recursion, no linear solver. The r_k themselves
    // are exact-integer ratios: with w_t = n·x_t − Σx (cross-
    // multiplied centering), r_k = Σ w_t·w_{t+k} / Σ w_t² — BIGINTs
    // end to end, one division per lag. Per event type; the lag
    // windows run over the bounded calendar.
    QueryDef("q282_pacf",
      (s, dir) => {
        val daily = t(s, dir, "events")
          .groupBy(col("event_type"),
            expr("unix_micros(ts) div 86400000000").as("day"))
          .agg(count(lit(1)).as("c"))
        val m = daily.groupBy("event_type")
          .agg(count(lit(1)).as("n"), sum("c").as("s"))
        val wv = Window.partitionBy("event_type").orderBy("day")
        val w = daily.join(broadcast(m), "event_type")
          .withColumn("w", col("n") * col("c") - col("s"))
        val lagged = (1 to 3).foldLeft(w) { (df, k) =>
          df.withColumn(s"w$k", lag(col("w"), k).over(wv))
        }
        val num = lagged.groupBy("event_type")
          .agg(sum(col("w") * col("w")).as("den"),
            sum(col("w") * col("w1")).as("num1"),
            sum(col("w") * col("w2")).as("num2"),
            sum(col("w") * col("w3")).as("num3"))
        val r1 = col("num1").cast("double") / col("den")
        val r2 = col("num2").cast("double") / col("den")
        val r3 = col("num3").cast("double") / col("den")
        val p22 = (r2 - r1 * r1) / (lit(1) - r1 * r1)
        val p21 = r1 - p22 * r1
        val p33 = (r3 - p21 * r2 - p22 * r1) /
          (lit(1) - p21 * r1 - p22 * r2)
        num.select(col("event_type"), r1.as("r1"), r2.as("r2"),
            r3.as("r3"), r1.as("pacf1"), p22.as("pacf2"),
            p33.as("pacf3"))
          .orderBy("event_type")
      },
      Some("""WITH daily AS (SELECT event_type,
            epoch_us(ts) // 86400000000 AS day, CAST(COUNT(*) AS BIGINT)
              AS c
          FROM events GROUP BY 1, 2),
        m AS (SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n,
            CAST(SUM(c) AS BIGINT) AS s FROM daily GROUP BY 1),
        w AS (SELECT d.event_type, d.day, m.n * d.c - m.s AS w
          FROM daily d JOIN m ON d.event_type = m.event_type),
        lagged AS (SELECT event_type, w,
            lag(w, 1) OVER (PARTITION BY event_type ORDER BY day) AS w1,
            lag(w, 2) OVER (PARTITION BY event_type ORDER BY day) AS w2,
            lag(w, 3) OVER (PARTITION BY event_type ORDER BY day) AS w3
          FROM w),
        num AS (SELECT event_type, CAST(SUM(w*w) AS BIGINT) AS den,
            CAST(SUM(w*w1) AS BIGINT) AS num1,
            CAST(SUM(w*w2) AS BIGINT) AS num2,
            CAST(SUM(w*w3) AS BIGINT) AS num3
          FROM lagged GROUP BY 1),
        r AS (SELECT event_type,
            CAST(num1 AS DOUBLE) / den AS r1,
            CAST(num2 AS DOUBLE) / den AS r2,
            CAST(num3 AS DOUBLE) / den AS r3 FROM num),
        p AS (SELECT event_type, r1, r2, r3,
            (r2 - r1*r1) / (1 - r1*r1) AS p22 FROM r),
        p2 AS (SELECT event_type, r1, r2, r3, p22,
            r1 - p22 * r1 AS p21 FROM p)
        SELECT event_type, r1, r2, r3, r1 AS pacf1, p22 AS pacf2,
          (r3 - p21*r2 - p22*r1) / (1 - p21*r1 - p22*r2) AS pacf3
        FROM p2 ORDER BY event_type""")),

    // ── Range-partition planner audit (q283) ───────────────────────────
    // The global-sort/write planner's core decision: 7 boundary keys
    // at the exact eighths of o_totalprice (the distributed quantile
    // refinement engine — no global sort, no driver data), then the
    // realized bucket histogram and each bucket's share. Balanced
    // shares certify the boundaries before a repartitionByRange write;
    // ties land in the lower bucket (strict `boundary < v` count) on
    // both engines' identical quantile doubles.
    QueryDef("q283_range_partition_plan",
      (s, dir) => {
        val ps = (1 to 7).map(_ / 8.0)
        val o = t(s, dir, "orders")
          .select(lit(1).as("g"), col("o_totalprice"))
        val bounds = graft.ext.Stats.exactQuantilesByGroup(
            o, "g", "o_totalprice", ps)
          .agg(sort_array(collect_list("quantile")).as("barr"))
        val tot = o.agg(count(lit(1)).as("n_total"))
        o.crossJoin(broadcast(bounds))
          .select(size(filter(col("barr"),
            b => b < col("o_totalprice"))).as("bucket"))
          .groupBy("bucket").agg(count(lit(1)).as("n_orders"))
          .crossJoin(broadcast(tot))
          .select(col("bucket").cast("long").as("bucket"),
            col("n_orders"),
            (col("n_orders").cast("double") * 8 / col("n_total"))
              .as("balance"))
          .orderBy("bucket")
      },
      Some("""WITH q AS (SELECT quantile_cont(o_totalprice,
            [0.125, 0.25, 0.375, 0.5, 0.625, 0.75, 0.875]) AS barr
          FROM orders),
        tot AS (SELECT COUNT(*) AS n_total FROM orders),
        b AS (SELECT len(list_filter(q.barr,
            x -> x < o.o_totalprice)) AS bucket
          FROM orders o CROSS JOIN q)
        SELECT CAST(bucket AS BIGINT) AS bucket, COUNT(*) AS n_orders,
          CAST(COUNT(*) AS DOUBLE) * 8 / tot.n_total AS balance
        FROM b CROSS JOIN tot GROUP BY bucket, tot.n_total
        ORDER BY bucket""")),

    // ── Quantile-sketch error audit (q284) ─────────────────────────────
    // The last sketch family's accuracy loop (CMS has q113's overcount,
    // HLL has q246's exact-overlap column): per event type, the
    // bottom-k-by-hash sketch median (q116's mergeable estimator)
    // against the EXACT median from the distributed refinement engine,
    // with absolute and relative error. Sketch machinery and exact
    // machinery are both already locked; this query is the standing
    // regression bound between them.
    QueryDef("q284_quantile_sketch_error",
      (s, dir) => {
        val ev = t(s, dir, "events")
        val sk = graft.ext.Sketches.quantileFinish(
          graft.ext.Sketches.quantilePartial(ev, Seq("event_type"),
            col("value"), col("event_id"), quantileK),
          Seq("event_type"))
          .select(col("event_type"), col("n"), col("n_sampled"),
            col("median_est"))
        val ex = graft.ext.Stats.exactMedianByGroup(
          ev.select("event_type", "value"), "event_type", "value")
          .select(col("event_type"), col("median").as("median_exact"))
        sk.join(ex, "event_type")
          .select(col("event_type"), col("n"), col("n_sampled"),
            col("median_exact"), col("median_est"),
            abs(col("median_est") - col("median_exact")).as("abs_err"),
            (abs(col("median_est") - col("median_exact")) /
              col("median_exact")).as("rel_err"))
          .orderBy("event_type")
      },
      Some(s"""WITH h AS (SELECT event_type, CAST(value AS DOUBLE) AS v,
            ('0x' || substr(md5(CAST(event_id AS VARCHAR)), 1, 7))::BIGINT
              AS h
          FROM events),
        tot AS (SELECT event_type, COUNT(*) AS n FROM h
          GROUP BY event_type),
        samp AS (SELECT event_type, v FROM (
            SELECT event_type, v, row_number() OVER (
              PARTITION BY event_type ORDER BY h, v) AS rh
            FROM h) WHERE rh <= $quantileK),
        ranked AS (SELECT event_type, v, row_number() OVER (
              PARTITION BY event_type ORDER BY v) AS rn,
            COUNT(*) OVER (PARTITION BY event_type) AS m
          FROM samp),
        sk AS (SELECT r.event_type, MAX(t.n) AS n,
            CAST(MAX(m) AS BIGINT) AS n_sampled,
            (MAX(CASE WHEN rn = floor((m + 1) / 2.0) THEN v END)
             + MAX(CASE WHEN rn = floor((m + 2) / 2.0) THEN v END)) / 2
              AS median_est
          FROM ranked r JOIN tot t ON r.event_type = t.event_type
          GROUP BY r.event_type),
        ex AS (SELECT event_type, median(CAST(value AS DOUBLE))
            AS median_exact
          FROM events GROUP BY event_type)
        SELECT sk.event_type, sk.n, sk.n_sampled, ex.median_exact,
          sk.median_est,
          abs(sk.median_est - ex.median_exact) AS abs_err,
          abs(sk.median_est - ex.median_exact) / ex.median_exact
            AS rel_err
        FROM sk JOIN ex USING (event_type)
        ORDER BY sk.event_type""")),

    // ── Dedup cluster stability: adjusted Rand index (q285) ────────────
    // How much does the dedup partition move when the similarity bar
    // rises from ½ to 0.9? Both clusterings come from the SAME exact
    // prefix-filtered pair set (q106), and — since r14 — from the SAME
    // label-prop convergence: dedupClustersDual propagates the full-set
    // and the ≥0.9-subgraph labels jointly (rounds = max of the two
    // diameters, not the sum), and emits both labels on one row per
    // node, so the contingency needs no second |docs| join. Unpaired
    // docs are their own singleton clusters. ARI from the contingency's
    // pair counts — every C(x,2) is x(x−1) div 2 in BIGINTs, so the
    // only doubles are the textbook final chain. ARI near 1 says the
    // dedup decision is threshold-robust; a low value flags a corpus
    // whose duplicate structure is borderline.
    QueryDef("q285_cluster_stability_ari",
      (s, dir) => {
        val pairs = Dedup.prefixFilterJaccardPairs(
            tPar(s, dir, "documents"), "doc_id", "text", shingleK,
            ppjTNum, ppjTDen)
          .localCheckpoint() // both union directions of the edge build
        val dual = Dedup.dedupClustersDual(
          pairs.withColumn("hi", col("jaccard") >= 0.9)
            .select("id_a", "id_b", "hi"))
        val docsAll = t(s, dir, "documents").select(col("doc_id"))
        val lab = docsAll.join(
            dual.select(col("id").as("doc_id"), col("cluster_all"),
              col("cluster_hi")),
            Seq("doc_id"), "left")
          .select(col("doc_id"),
            coalesce(col("cluster_all"), col("doc_id")).as("ca"),
            coalesce(col("cluster_hi"), col("doc_id")).as("cb"))
        val cont = lab.groupBy("ca", "cb")
          .agg(count(lit(1)).as("nij"))
          .localCheckpoint() // three marginal folds read it
        val sij = cont.agg(sum(expr("(nij * (nij - 1)) div 2")).as("sij"),
          sum("nij").as("n"))
        val sa = cont.groupBy("ca").agg(sum("nij").as("ai"))
          .agg(sum(expr("(ai * (ai - 1)) div 2")).as("sa"),
            count(lit(1)).as("ka"))
        val sb = cont.groupBy("cb").agg(sum("nij").as("bj"))
          .agg(sum(expr("(bj * (bj - 1)) div 2")).as("sb"),
            count(lit(1)).as("kb"))
        val expct = col("sa").cast("double") * col("sb") /
          expr("(n * (n - 1)) div 2")
        val maxi = (col("sa").cast("double") + col("sb")) / 2
        sij.crossJoin(broadcast(sa)).crossJoin(broadcast(sb))
          .select(col("n").as("n_docs"), col("ka").as("clusters_half"),
            col("kb").as("clusters_ninety"),
            ((col("sij") - expct) / (maxi - expct)).as("ari"))
      },
      Some(s"""WITH RECURSIVE sh AS (SELECT doc_id, unnest(list_distinct(
            ${dShingles(dTok, shingleK)})) AS tok FROM documents),
        sz AS (SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY doc_id),
        p0 AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b,
            COUNT(*) AS shared
          FROM sh a JOIN sh b USING (tok)
          WHERE a.doc_id < b.doc_id GROUP BY 1, 2),
        jac AS (SELECT id_a, id_b, CAST(shared AS DOUBLE)
            / CAST(x.n + y.n - shared AS DOUBLE) AS jaccard
          FROM p0 JOIN sz x ON p0.id_a = x.doc_id
            JOIN sz y ON p0.id_b = y.doc_id
          WHERE shared * $ppjTDen >= $ppjTNum * (x.n + y.n - shared)),
        eA AS (SELECT id_a AS u, id_b AS v FROM jac
          UNION SELECT id_b, id_a FROM jac),
        nA AS (SELECT DISTINCT u AS id FROM eA),
        rA(id, r) AS (SELECT id, id FROM nA
          UNION SELECT rr.id, e.v FROM rA rr JOIN eA e ON rr.r = e.u),
        cA AS (SELECT id, MIN(r) AS cluster FROM rA GROUP BY id),
        eB AS (SELECT id_a AS u, id_b AS v FROM jac WHERE jaccard >= 0.9
          UNION SELECT id_b, id_a FROM jac WHERE jaccard >= 0.9),
        nB AS (SELECT DISTINCT u AS id FROM eB),
        rB(id, r) AS (SELECT id, id FROM nB
          UNION SELECT rr.id, e.v FROM rB rr JOIN eB e ON rr.r = e.u),
        cB AS (SELECT id, MIN(r) AS cluster FROM rB GROUP BY id),
        lab AS (SELECT d.doc_id,
            COALESCE(cA.cluster, d.doc_id) AS ca,
            COALESCE(cB.cluster, d.doc_id) AS cb
          FROM documents d
            LEFT JOIN cA ON d.doc_id = cA.id
            LEFT JOIN cB ON d.doc_id = cB.id),
        cont AS (SELECT ca, cb, COUNT(*) AS nij FROM lab GROUP BY 1, 2),
        sij AS (SELECT CAST(SUM(nij * (nij - 1) // 2) AS BIGINT) AS sij,
            CAST(SUM(nij) AS BIGINT) AS n FROM cont),
        sa AS (SELECT CAST(SUM(ai * (ai - 1) // 2) AS BIGINT) AS sa,
            COUNT(*) AS ka
          FROM (SELECT ca, CAST(SUM(nij) AS BIGINT) AS ai FROM cont
            GROUP BY ca)),
        sb AS (SELECT CAST(SUM(bj * (bj - 1) // 2) AS BIGINT) AS sb,
            COUNT(*) AS kb
          FROM (SELECT cb, CAST(SUM(nij) AS BIGINT) AS bj FROM cont
            GROUP BY cb))
        SELECT n AS n_docs, ka AS clusters_half, kb AS clusters_ninety,
          (sij - CAST(sa AS DOUBLE) * sb / (n * (n - 1) // 2))
            / ((CAST(sa AS DOUBLE) + sb) / 2
               - CAST(sa AS DOUBLE) * sb / (n * (n - 1) // 2)) AS ari
        FROM sij CROSS JOIN sa CROSS JOIN sb""")),

    // ── U-shaped (position-based) attribution (q286) ───────────────────
    // The fourth attribution model beside last-touch funnels (q149),
    // Markov removal (q123) and Shapley (q251): 40% to the first
    // touch, 40% to the last, 20% split across the middles — all
    // RATIONAL shares (1, ½, 2/5, 1/5(m−2)), each a single division
    // of exact integers, folded per channel on the decimal rail so
    // total credit ≡ converting users (to the rail's 8 dp). Touches
    // are pre-conversion view/click events; the position window is
    // per USER, bounded by that user's journey length.
    QueryDef("q286_position_attribution",
      (s, dir) => {
        val ev = t(s, dir, "events")
          .select(col("user_id"), col("event_type"),
            unix_micros(col("ts")).as("us"))
        val conv = ev.groupBy("user_id")
          .agg(min(when(col("event_type") === "purchase", col("us")))
            .as("cu"))
        val wp = Window.partitionBy("user_id")
          .orderBy("us", "event_type")
        val wm = Window.partitionBy("user_id")
        val tch = ev.join(conv, "user_id")
          .filter(col("cu").isNotNull && col("us") < col("cu") &&
            col("event_type").isin("view", "click"))
          .withColumn("pos", row_number().over(wp))
          .withColumn("m", count(lit(1)).over(wm))
        val sh = tch.select(col("user_id"), col("event_type"),
          when(col("m") === 1, lit(1.0))
            .when(col("m") === 2, lit(0.5))
            .when(col("pos") === 1 || col("pos") === col("m"), lit(0.4))
            .otherwise(lit(0.2) / (col("m") - 2)).as("s"))
        sh.groupBy("event_type")
          .agg(countDistinct("user_id").as("n_users"),
            sum(col("s").cast("decimal(30,8)")).cast("double")
              .as("credit"))
          .orderBy("event_type")
      },
      Some("""WITH ev AS (SELECT user_id, event_type, epoch_us(ts) AS us
          FROM events),
        conv AS (SELECT user_id,
            MIN(CASE WHEN event_type = 'purchase' THEN us END) AS cu
          FROM ev GROUP BY user_id),
        tch AS (SELECT e.user_id, e.event_type, e.us,
            ROW_NUMBER() OVER (PARTITION BY e.user_id
              ORDER BY e.us, e.event_type) AS pos,
            COUNT(*) OVER (PARTITION BY e.user_id) AS m
          FROM ev e JOIN conv c ON e.user_id = c.user_id
          WHERE c.cu IS NOT NULL AND e.us < c.cu
            AND e.event_type IN ('view', 'click')),
        sh AS (SELECT user_id, event_type,
            CASE WHEN m = 1 THEN 1.0
                 WHEN m = 2 THEN 0.5
                 WHEN pos = 1 OR pos = m THEN 0.4
                 ELSE 0.2 / (m - 2) END AS s
          FROM tch)
        SELECT event_type, COUNT(DISTINCT user_id) AS n_users,
          CAST(CAST(SUM(CAST(s AS DECIMAL(30,8))) AS VARCHAR) AS DOUBLE)
            AS credit
        FROM sh GROUP BY event_type ORDER BY event_type""")),

    // ── Time-decay attribution (q287) ──────────────────────────────────
    // The recency-weighted attribution model: pre-conversion touches
    // within 7 days earn weight 2^−⌊Δdays/3⌋ (q264's exact power-of-
    // two trick — no libm decay), each user's credit normalizes to 1,
    // and per-channel credit folds on the decimal rail. With position
    // (q286), Markov (q123) and Shapley (q251) this completes the
    // standard attribution-model suite over one journey extraction
    // shape: per-user aggregation + bounded channel output.
    QueryDef("q287_time_decay_attribution",
      (s, dir) => {
        val ev = t(s, dir, "events")
          .select(col("user_id"), col("event_type"),
            expr("unix_micros(ts) div 86400000000").as("day"))
        val conv = ev.groupBy("user_id")
          .agg(min(when(col("event_type") === "purchase", col("day")))
            .as("cd"))
        val peru = ev.join(conv, "user_id")
          .filter(col("cd").isNotNull &&
            col("event_type").isin("view", "click") &&
            col("day") <= col("cd") && col("cd") - col("day") <= 7)
          .select(col("user_id"), col("event_type"),
            (lit(1.0) / pow(lit(2.0),
              expr("(cd - day) div 3").cast("double"))).as("w"))
          .groupBy("user_id", "event_type")
          .agg(sum(col("w").cast("decimal(30,8)")).cast("double")
            .as("wt"))
          .localCheckpoint() // user totals + the share projection
        val tot = peru.groupBy("user_id")
          .agg(sum(col("wt").cast("decimal(30,8)")).cast("double")
            .as("W"))
        peru.join(tot, "user_id")
          .select(col("event_type"), (col("wt") / col("W")).as("sh"))
          .groupBy("event_type")
          .agg(count(lit(1)).as("n_users"),
            sum(col("sh").cast("decimal(30,8)")).cast("double")
              .as("credit"))
          .orderBy("event_type")
      },
      Some("""WITH ev AS (SELECT user_id, event_type,
            epoch_us(ts) // 86400000000 AS day FROM events),
        conv AS (SELECT user_id,
            MIN(CASE WHEN event_type = 'purchase' THEN day END) AS cd
          FROM ev GROUP BY user_id),
        tch AS (SELECT e.user_id, e.event_type,
            1.0 / power(2, (c.cd - e.day) // 3) AS w
          FROM ev e JOIN conv c ON e.user_id = c.user_id
          WHERE c.cd IS NOT NULL
            AND e.event_type IN ('view', 'click')
            AND e.day <= c.cd AND c.cd - e.day <= 7),
        peru AS (SELECT user_id, event_type,
            CAST(CAST(SUM(CAST(w AS DECIMAL(30,8))) AS VARCHAR)
              AS DOUBLE) AS wt
          FROM tch GROUP BY 1, 2),
        tot AS (SELECT user_id,
            CAST(CAST(SUM(CAST(wt AS DECIMAL(30,8))) AS VARCHAR)
              AS DOUBLE) AS W
          FROM peru GROUP BY user_id),
        share AS (SELECT p.event_type, p.wt / t.W AS sh
          FROM peru p JOIN tot t USING (user_id))
        SELECT event_type, COUNT(*) AS n_users,
          CAST(CAST(SUM(CAST(sh AS DECIMAL(30,8))) AS VARCHAR)
            AS DOUBLE) AS credit
        FROM share GROUP BY event_type ORDER BY event_type""")),

    // ── Hot-key churn report (q288) ────────────────────────────────────
    // Which heavy hitters ENTERED or EXITED the top-10 between the
    // corpus's first and second halves? The drift view rank-only
    // monitors miss: full outer join of the two per-half top-10s
    // (TopKPerKey heaps keyed by half) with ranks, counts, and
    // entry/exit flags. Exact counts; output bounded by 2k rows.
    QueryDef("q288_hot_key_churn",
      (s, dir) => {
        val mid = t(s, dir, "documents")
          .agg(expr("(min(doc_id) + max(doc_id)) div 2").as("mid"))
        val cnt = tPar(s, dir, "documents")
          .crossJoin(broadcast(mid))
          .select(when(col("doc_id") <= col("mid"), 0L).otherwise(1L)
            .as("half"), explode(TextStats.tokens(col("text")))
            .as("tok"))
          .groupBy("half", "tok").agg(count(lit(1)).as("c"))
        val top = graft.plans.TopKPerKey.topKPerKey(cnt, Seq("half"),
          Seq(graft.plans.TopKPerKey.Sort("c", asc = false),
            graft.plans.TopKPerKey.Sort("tok")), 10)
        val t0 = top.filter(col("half") === 0)
          .select(col("tok"), col("c").as("c0"), col("rank").as("r0"))
        val t1 = top.filter(col("half") === 1)
          .select(col("tok"), col("c").as("c1"), col("rank").as("r1"))
        t0.join(t1, Seq("tok"), "full_outer")
          .select(col("tok"),
            coalesce(col("r0"), lit(0L)).as("rank_first"),
            coalesce(col("r1"), lit(0L)).as("rank_second"),
            coalesce(col("c0"), lit(0L)).as("n_first"),
            coalesce(col("c1"), lit(0L)).as("n_second"),
            col("r0").isNull.cast("long").as("entered"),
            col("r1").isNull.cast("long").as("exited"))
          .orderBy("tok")
      },
      Some(s"""WITH tk AS (SELECT doc_id, unnest($dTok) AS tok
            FROM documents),
        mx AS (SELECT (MIN(doc_id) + MAX(doc_id)) // 2 AS mid
          FROM documents),
        cnt AS (SELECT tok,
            CASE WHEN doc_id <= mid THEN 0 ELSE 1 END AS half,
            COUNT(*) AS c
          FROM tk CROSS JOIN mx GROUP BY 1, 2),
        rk AS (SELECT tok, half, c, ROW_NUMBER() OVER (
            PARTITION BY half ORDER BY c DESC, tok) AS r FROM cnt),
        t0 AS (SELECT tok, c AS c0, r AS r0 FROM rk
          WHERE half = 0 AND r <= 10),
        t1 AS (SELECT tok, c AS c1, r AS r1 FROM rk
          WHERE half = 1 AND r <= 10)
        SELECT COALESCE(t0.tok, t1.tok) AS tok,
          CAST(COALESCE(r0, 0) AS BIGINT) AS rank_first,
          CAST(COALESCE(r1, 0) AS BIGINT) AS rank_second,
          CAST(COALESCE(c0, 0) AS BIGINT) AS n_first,
          CAST(COALESCE(c1, 0) AS BIGINT) AS n_second,
          CAST(CASE WHEN t0.tok IS NULL THEN 1 ELSE 0 END AS BIGINT)
            AS entered,
          CAST(CASE WHEN t1.tok IS NULL THEN 1 ELSE 0 END AS BIGINT)
            AS exited
        FROM t0 FULL OUTER JOIN t1 ON t0.tok = t1.tok
        ORDER BY tok""")),

    // ── Dedup token-yield accounting (q289) ────────────────────────────
    // Training-data planning's bottom line: after near-dup removal
    // (drop the HIGHER doc of every exact prefix-filtered pair — the
    // keep-first rule on q106's pair set), how many tokens per source
    // actually survive? One semi-join against the dropped-id set +
    // one source-grouped fold; yield is the single division. The
    // pair machinery is the locked q106 plan, so this report prices
    // the dedup decision without new similarity arithmetic.
    QueryDef("q289_dedup_token_yield",
      (s, dir) => {
        val dropped = Dedup.prefixFilterJaccardPairs(
            tPar(s, dir, "documents"), "doc_id", "text", shingleK,
            ppjTNum, ppjTDen)
          .select(col("id_b").as("doc_id")).distinct()
        t(s, dir, "documents")
          .select(col("doc_id"), col("source"),
            size(TextStats.tokens(col("text"))).cast("long").as("nt"))
          .join(dropped.withColumn("isdrop", lit(1L)),
            Seq("doc_id"), "left")
          .groupBy("source")
          .agg(count(lit(1)).as("n_docs"), sum("nt").as("tokens_raw"),
            sum(when(col("isdrop").isNull, 1L).otherwise(0L))
              .as("n_survivors"),
            sum(when(col("isdrop").isNull, col("nt")).otherwise(0L))
              .as("tokens_kept"))
          .withColumn("yield",
            col("tokens_kept").cast("double") / col("tokens_raw"))
          .orderBy("source")
      },
      Some(s"""WITH sh AS (SELECT doc_id, unnest(list_distinct(
            ${dShingles(dTok, shingleK)})) AS tok FROM documents),
        sz AS (SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY doc_id),
        p AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b,
            COUNT(*) AS shared
          FROM sh a JOIN sh b USING (tok)
          WHERE a.doc_id < b.doc_id GROUP BY 1, 2),
        dropped AS (SELECT DISTINCT id_b AS doc_id
          FROM p JOIN sz x ON p.id_a = x.doc_id
            JOIN sz y ON p.id_b = y.doc_id
          WHERE shared * $ppjTDen >= $ppjTNum * (x.n + y.n - shared)),
        d AS (SELECT doc_id, source, CAST(len($dTok) AS BIGINT) AS nt
          FROM documents)
        SELECT d.source, COUNT(*) AS n_docs,
          CAST(SUM(nt) AS BIGINT) AS tokens_raw,
          CAST(SUM(CASE WHEN dr.doc_id IS NULL THEN 1 ELSE 0 END)
            AS BIGINT) AS n_survivors,
          CAST(SUM(CASE WHEN dr.doc_id IS NULL THEN nt ELSE 0 END)
            AS BIGINT) AS tokens_kept,
          CAST(SUM(CASE WHEN dr.doc_id IS NULL THEN nt ELSE 0 END)
            AS DOUBLE) / SUM(nt) AS yield
        FROM d LEFT JOIN dropped dr ON d.doc_id = dr.doc_id
        GROUP BY d.source ORDER BY d.source""")),

    // ── Daily p95 SLO burn report (q290) ───────────────────────────────
    // The observability staple: per event type, each day's DISCRETE
    // p95 of value (rank ⌈0.95·n⌉ inside a (type, day)-partitioned
    // window — an actual data value, rank-exact on both engines), the
    // mean p95 on the decimal rail, and the fraction of days breaching
    // the 145 SLO line. The window partition is one day of one series
    // — the bounded unit an SLO pipeline already processes per tick.
    QueryDef("q290_slo_burn",
      (s, dir) => {
        val wv = Window.partitionBy("event_type", "day").orderBy("v")
        val wn = Window.partitionBy("event_type", "day")
        val p95 = t(s, dir, "events")
          .select(col("event_type"),
            expr("unix_micros(ts) div 86400000000").as("day"),
            col("value").cast("double").as("v"))
          .withColumn("r", row_number().over(wv))
          .withColumn("n", count(lit(1)).over(wn))
          .filter(col("r") === ceil(col("n") * 0.95).cast("long"))
          .select(col("event_type"), col("day"), col("v").as("p95"))
        p95.groupBy("event_type")
          .agg(count(lit(1)).as("n_days"),
            (sum(col("p95").cast("decimal(30,8)")).cast("double") /
              count(lit(1))).as("mean_p95"),
            sum(when(col("p95") > 145.0, 1L).otherwise(0L))
              .as("breach_days"))
          .withColumn("burn_rate",
            col("breach_days").cast("double") / col("n_days"))
          .orderBy("event_type")
      },
      Some("""WITH ev AS (SELECT event_type,
            epoch_us(ts) // 86400000000 AS day,
            CAST(value AS DOUBLE) AS v FROM events),
        rk AS (SELECT event_type, day, v,
            ROW_NUMBER() OVER (PARTITION BY event_type, day
              ORDER BY v) AS r,
            COUNT(*) OVER (PARTITION BY event_type, day) AS n
          FROM ev),
        p95 AS (SELECT event_type, day,
            MAX(CASE WHEN r = CAST(ceil(n * 0.95) AS BIGINT) THEN v
              END) AS p95
          FROM rk GROUP BY 1, 2)
        SELECT event_type, COUNT(*) AS n_days,
          CAST(CAST(SUM(CAST(p95 AS DECIMAL(30,8))) AS VARCHAR)
            AS DOUBLE) / COUNT(*) AS mean_p95,
          CAST(SUM(CASE WHEN p95 > 145.0 THEN 1 ELSE 0 END) AS BIGINT)
            AS breach_days,
          CAST(SUM(CASE WHEN p95 > 145.0 THEN 1 ELSE 0 END) AS DOUBLE)
            / COUNT(*) AS burn_rate
        FROM p95 GROUP BY event_type ORDER BY event_type""")),

    // ── Seasonal strength (q291) ───────────────────────────────────────
    // One scalar from q197's decomposition: F = 1 − Var(residual) /
    // Var(detrended) — how much of the de-trended variation the
    // weekly profile explains (Hyndman's STL strength measure). All
    // sums ride the decimal rail; the variances are the usual exact-
    // operand chains over the bounded trend-complete day set.
    QueryDef("q291_seasonal_strength",
      (s, dir) => {
        val pd = t(s, dir, "events")
          .select(expr("unix_micros(ts) div 86400000000").as("day"))
          .groupBy("day").agg(count(lit(1)).as("volume"))
        val w7 = boundedWindow("day").rowsBetween(-3, 3)
        val tr = pd
          .withColumn("trend",
            when(count(lit(1)).over(w7) === 7,
              sum("volume").over(w7).cast("double") / 7))
          .withColumn("wd", pmod(col("day"), lit(7L)))
          .filter(col("trend").isNotNull)
          .localCheckpoint() // seasonal means + the variance fold
        val se = tr.groupBy("wd")
          .agg(davg(col("volume") - col("trend")).as("seasonal"))
        val d = tr.join(broadcast(se), "wd")
          .select((col("volume") - col("trend")).as("detr"),
            (col("volume") - col("trend") - col("seasonal"))
              .as("resid"))
        d.agg(count(lit(1)).as("n"),
            sum(col("detr").cast("decimal(30,8)")).cast("double")
              .as("sd"),
            sum((col("detr") * col("detr")).cast("decimal(30,8)"))
              .cast("double").as("sdd"),
            sum(col("resid").cast("decimal(30,8)")).cast("double")
              .as("sr"),
            sum((col("resid") * col("resid")).cast("decimal(30,8)"))
              .cast("double").as("srr"))
          .select(col("n"),
            (col("sdd") - col("sd") * col("sd") / col("n"))
              .as("ss_detrended"),
            (col("srr") - col("sr") * col("sr") / col("n"))
              .as("ss_residual"),
            (lit(1) - (col("srr") - col("sr") * col("sr") / col("n")) /
              (col("sdd") - col("sd") * col("sd") / col("n")))
              .as("seasonal_strength"))
      },
      Some("""WITH pd AS (SELECT epoch_us(ts) // 86400000000 AS day,
            COUNT(*) AS volume FROM events GROUP BY 1),
        tr AS (SELECT day, volume,
            CASE WHEN COUNT(*) OVER w = 7
              THEN CAST(SUM(volume) OVER w AS DOUBLE) / 7 END AS trend,
            day % 7 AS wd
          FROM pd WINDOW w AS (ORDER BY day
            ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING)),
        trc AS (SELECT * FROM tr WHERE trend IS NOT NULL),
        se AS (SELECT wd, CAST(CAST(SUM(CAST(volume - trend
              AS DECIMAL(30,8))) AS VARCHAR) AS DOUBLE)
            / COUNT(*) AS seasonal
          FROM trc GROUP BY wd),
        d AS (SELECT trc.volume - trc.trend AS detr,
            trc.volume - trc.trend - se.seasonal AS resid
          FROM trc JOIN se USING (wd)),
        m AS (SELECT COUNT(*) AS n,
            CAST(CAST(SUM(CAST(detr AS DECIMAL(30,8))) AS VARCHAR)
              AS DOUBLE) AS sd,
            CAST(CAST(SUM(CAST(detr*detr AS DECIMAL(30,8)))
              AS VARCHAR) AS DOUBLE) AS sdd,
            CAST(CAST(SUM(CAST(resid AS DECIMAL(30,8))) AS VARCHAR)
              AS DOUBLE) AS sr,
            CAST(CAST(SUM(CAST(resid*resid AS DECIMAL(30,8)))
              AS VARCHAR) AS DOUBLE) AS srr
          FROM d)
        SELECT n, sdd - sd*sd/n AS ss_detrended,
          srr - sr*sr/n AS ss_residual,
          1 - (srr - sr*sr/n) / (sdd - sd*sd/n) AS seasonal_strength
        FROM m""")),

    // ── Cramér's V association (q292) ──────────────────────────────────
    // The effect-size companion to the chi-square tests: how strongly
    // does customer nation associate with order priority? χ² over the
    // full r×k grid (zero cells included via the dimension cross
    // join), then V = √(χ²/(n·(min(r,k)−1))). Per-cell terms ride the
    // decimal rail; expected counts are the identical double chain on
    // both engines. Near-zero V on this synthetic join is correct.
    QueryDef("q292_cramers_v",
      (s, dir) => {
        val cell = t(s, dir, "orders").join(t(s, dir, "customer"),
            col("o_custkey") === col("c_custkey"))
          .groupBy(col("c_nationkey").as("nation"),
            col("o_orderpriority").as("pri"))
          .agg(count(lit(1)).as("o"))
          .localCheckpoint() // marginals + the grid probe
        val rt = cell.groupBy("nation").agg(sum("o").as("rn"))
        val ct = cell.groupBy("pri").agg(sum("o").as("cn"))
        val nt = cell.agg(sum("o").as("n"),
          countDistinct("nation").as("r"), countDistinct("pri").as("k"))
        val e = col("rn").cast("double") * col("cn") / col("n")
        val chi = rt.crossJoin(broadcast(ct))
          .join(cell, Seq("nation", "pri"), "left")
          .select(col("nation"), col("pri"), col("rn"), col("cn"),
            coalesce(col("o"), lit(0L)).as("o"))
          .crossJoin(broadcast(nt))
          .agg(sum(((col("o").cast("double") - e) *
            (col("o").cast("double") - e) / e).cast("decimal(30,8)"))
            .cast("double").as("chi2"))
        chi.crossJoin(broadcast(nt))
          .select(col("n"), col("r"), col("k"), col("chi2"),
            sqrt(col("chi2") / (col("n") * (least(col("r"), col("k"))
              - 1))).as("cramers_v"))
      },
      Some("""WITH j AS (SELECT c.c_nationkey AS nation,
            o.o_orderpriority AS pri
          FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey),
        cell AS (SELECT nation, pri, COUNT(*) AS o FROM j GROUP BY 1, 2),
        rt AS (SELECT nation, CAST(SUM(o) AS BIGINT) AS rn FROM cell
          GROUP BY 1),
        ct AS (SELECT pri, CAST(SUM(o) AS BIGINT) AS cn FROM cell
          GROUP BY 1),
        nt AS (SELECT CAST(SUM(o) AS BIGINT) AS n,
            COUNT(DISTINCT nation) AS r, COUNT(DISTINCT pri) AS k
          FROM cell),
        grid AS (SELECT rt.nation, ct.pri, rt.rn, ct.cn,
            COALESCE(cell.o, 0) AS o
          FROM rt CROSS JOIN ct
          LEFT JOIN cell ON cell.nation = rt.nation
            AND cell.pri = ct.pri),
        chi AS (SELECT CAST(CAST(SUM(CAST(
            (CAST(o AS DOUBLE) - CAST(rn AS DOUBLE)*cn/nt.n)
            * (CAST(o AS DOUBLE) - CAST(rn AS DOUBLE)*cn/nt.n)
            / (CAST(rn AS DOUBLE)*cn/nt.n) AS DECIMAL(30,8)))
            AS VARCHAR) AS DOUBLE) AS chi2
          FROM grid CROSS JOIN nt GROUP BY nt.n)
        SELECT nt.n, nt.r, nt.k, chi.chi2,
          sqrt(chi.chi2 / (nt.n * (least(nt.r, nt.k) - 1)))
            AS cramers_v
        FROM chi CROSS JOIN nt""")),

    // ── Hoover (Robin Hood) index of revenue concentration (q293) ─────
    // The log-free inequality scalar beside Gini (q165): the share of
    // total revenue that would have to move between users to equalize
    // them, ½·Σ|rev_i/T − 1/n|. Revenue sums are decimal-exact; each
    // user's deviation is one identical double chain; the fold rides
    // the rail. One per-user aggregation + one O(1) broadcast.
    QueryDef("q293_hoover_index",
      (s, dir) => {
        val per = t(s, dir, "events")
          .filter(col("event_type") === "purchase")
          .groupBy("user_id")
          .agg(sum(col("value").cast("decimal(30,8)"))
            .cast("decimal(30,8)").as("rev"))
        val tot = per.agg(sum("rev").cast("decimal(30,8)").as("t"),
          count(lit(1)).as("n"))
        per.crossJoin(broadcast(tot))
          .select(col("n"), col("t"),
            abs(col("rev").cast("double") / col("t").cast("double") -
              lit(1.0) / col("n")).as("dev"))
          .groupBy("n", "t")
          .agg((lit(0.5) *
            sum(col("dev").cast("decimal(30,8)")).cast("double"))
            .as("hoover"))
          .select(col("n"), col("t").cast("double").as("total_rev"),
            col("hoover"))
      },
      Some("""WITH per AS (SELECT user_id,
            CAST(SUM(CAST(value AS DECIMAL(30,8))) AS DECIMAL(30,8))
              AS rev
          FROM events WHERE event_type = 'purchase' GROUP BY user_id),
        tot AS (SELECT CAST(SUM(rev) AS DECIMAL(30,8)) AS t,
            COUNT(*) AS n FROM per),
        dev AS (SELECT tot.n, tot.t,
            abs(CAST(CAST(rev AS VARCHAR) AS DOUBLE)
              / CAST(CAST(t AS VARCHAR) AS DOUBLE) - 1.0 / n) AS dev
          FROM per CROSS JOIN tot)
        SELECT n, CAST(CAST(t AS VARCHAR) AS DOUBLE) AS total_rev,
          0.5 * CAST(CAST(SUM(CAST(dev AS DECIMAL(30,8))) AS VARCHAR)
            AS DOUBLE) AS hoover
        FROM dev GROUP BY n, t""")),

    // ── Markov stationary distribution (q294) ──────────────────────────
    // Where does the q111 behavior chain settle? Four unrolled power
    // iterations π ← π·P from the uniform start on the bounded
    // |types|² transition matrix, next to the EMPIRICAL type share
    // for comparison. Each iteration's 5-term sums ride the decimal
    // rail (deterministic re-rounding beats a 5-row aggregation's
    // nondeterministic double order); the whole chain is joins over
    // dimension-bounded tables.
    QueryDef("q294_markov_stationary",
      (s, dir) => {
        val ev = t(s, dir, "events").select(col("user_id"),
          unix_micros(col("ts")).as("us"), col("event_id"),
          col("event_type"))
        val w = Window.partitionBy("user_id")
          .orderBy(col("us"), col("event_id"))
        val tr = ev.withColumn("next_type",
            lead("event_type", 1).over(w))
          .filter(col("next_type").isNotNull)
          .groupBy(col("event_type").as("src"),
            col("next_type").as("dst"))
          .agg(count(lit(1)).as("c"))
          .localCheckpoint() // row totals + 4 iteration joins
        val p = tr.join(broadcast(
            tr.groupBy("src").agg(sum("c").as("rt"))), "src")
          .select(col("src"), col("dst"),
            (col("c").cast("double") / col("rt")).as("p"))
          .localCheckpoint() // reused by every iteration
        val k = ev.select(countDistinct("event_type")).head().getLong(0)
        val pi0 = p.select(col("src").as("state")).distinct()
          .withColumn("pi", lit(1.0) / k)
        val pi4 = (1 to 4).foldLeft(pi0) { (pi, _) =>
          pi.join(p, pi("state") === p("src"))
            .groupBy(col("dst").as("s2"))
            .agg(sum((col("pi") * col("p")).cast("decimal(30,8)"))
              .cast("double").as("pi2"))
            .select(col("s2").as("state"), col("pi2").as("pi"))
        }
        val emp = ev.groupBy(col("event_type").as("state"))
          .agg(count(lit(1)).as("n"))
        val nt = ev.agg(count(lit(1)).as("ntot"))
        pi4.join(emp, "state").crossJoin(broadcast(nt))
          .select(col("state"), col("pi").as("pi_stationary"),
            (col("n").cast("double") / col("ntot"))
              .as("empirical_share"))
          .orderBy("state")
      },
      Some {
        val iters = (1 to 4).map { i =>
          s"""pi$i AS (SELECT p.dst AS state,
             CAST(CAST(SUM(CAST(pi${i - 1}.pi * p.p AS DECIMAL(30,8)))
               AS VARCHAR) AS DOUBLE) AS pi
           FROM pi${i - 1} JOIN p ON pi${i - 1}.state = p.src
           GROUP BY p.dst)"""
        }.mkString(",\n        ")
        s"""WITH o AS (SELECT user_id, event_type, epoch_us(ts) AS us,
            event_id FROM events),
        trn AS (SELECT event_type AS src,
            lead(event_type) OVER (PARTITION BY user_id
              ORDER BY us, event_id) AS dst FROM o),
        c AS (SELECT src, dst, COUNT(*) AS c FROM trn
          WHERE dst IS NOT NULL GROUP BY 1, 2),
        rt AS (SELECT src, CAST(SUM(c) AS BIGINT) AS rt FROM c
          GROUP BY 1),
        p AS (SELECT c.src, c.dst,
            CAST(c.c AS DOUBLE) / rt.rt AS p
          FROM c JOIN rt USING (src)),
        k AS (SELECT COUNT(DISTINCT event_type) AS k FROM events),
        pi0 AS (SELECT DISTINCT src AS state, 1.0 / (SELECT k FROM k)
            AS pi FROM p),
        $iters,
        emp AS (SELECT event_type AS state, COUNT(*) AS n FROM events
          GROUP BY 1),
        nt AS (SELECT COUNT(*) AS ntot FROM events)
        SELECT pi4.state, pi4.pi AS pi_stationary,
          CAST(emp.n AS DOUBLE) / nt.ntot AS empirical_share
        FROM pi4 JOIN emp USING (state) CROSS JOIN nt
        ORDER BY pi4.state"""
      }),

    // ── Ship-lag profile per priority (q295) ───────────────────────────
    // The fulfillment SLA view over the star: order-to-ship lag in
    // days per priority class with exact P50/P90 from the distributed
    // quantile refinement engine — NOT a per-class rank window, which
    // at 100 TB would funnel a fifth of the fact through each of five
    // sort partitions. One broadcast-dim fact pass, then engine
    // refinement plus a min/max fold.
    QueryDef("q295_ship_lag",
      (s, dir) => {
        val l = t(s, dir, "lineitem").join(t(s, dir, "orders"),
            col("l_orderkey") === col("o_orderkey"))
          .select(col("o_orderpriority").as("pri"),
            datediff(col("l_shipdate"), col("o_orderdate")).cast("long")
              .as("lag"))
          .localCheckpoint() // engine rounds + the min/max fold
        val q = graft.ext.Stats.exactQuantilesByGroup(
          l, "pri", "lag", Seq(0.5, 0.9), buckets = 64, tail = 1024)
        val p50 = q.filter(col("p") === 0.5)
          .select(col("pri"), col("n").as("n_items"),
            col("quantile").as("p50_lag"))
        val p90 = q.filter(col("p") === 0.9)
          .select(col("pri"), col("quantile").as("p90_lag"))
        val mm = l.groupBy("pri")
          .agg(min("lag").as("min_lag"), max("lag").as("max_lag"))
        p50.join(p90, "pri").join(mm, "pri")
          .select(col("pri"), col("n_items"), col("min_lag"),
            col("p50_lag"), col("p90_lag"), col("max_lag"))
          .orderBy("pri")
      },
      Some("""WITH l AS (SELECT o.o_orderpriority AS pri,
            CAST(date_diff('day', o.o_orderdate, l.l_shipdate)
              AS BIGINT) AS lag
          FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey)
        SELECT pri, COUNT(*) AS n_items,
          CAST(MIN(lag) AS BIGINT) AS min_lag,
          quantile_cont(CAST(lag AS DOUBLE), 0.5) AS p50_lag,
          quantile_cont(CAST(lag AS DOUBLE), 0.9) AS p90_lag,
          CAST(MAX(lag) AS BIGINT) AS max_lag
        FROM l GROUP BY pri ORDER BY pri""")),

    // ── Paired-classifier McNemar test (q296) ──────────────────────────
    // The significance companion of q204's kappa: do the hashed linear
    // classifier (q176) and the heuristic quality gate (q21) disagree
    // ASYMMETRICALLY? Only the discordant cells matter — b = n10
    // (classifier-only positives), c = n01 (gate-only positives);
    // chi² = (b−c)²/(b+c), continuity-corrected (|b−c|−1)²/(b+c).
    // Numerators are exact integers from the same single map-only scan
    // + 2-cell aggregate as q204; each statistic is ONE double
    // division. Scale shape: map-side partial agg, 2 longs total.
    QueryDef("q296_mcnemar",
      (s, dir) => {
        def score(toks: Column): Column = aggregate(toks, lit(0L),
          (acc, tk) => {
            val b = Shingles.baseHash(tk) % fhDim
            acc + (Shingles.baseHash(concat(lit("w|"), b.cast("string")))
              % fhWMod - fhWOff)
          })
        val d = tPar(s, dir, "documents").select(
          (score(TextStats.tokens(col("text"))) >= 0).as("a"),
          (TextStats.qualityScore(col("text"), stopwords) >= 0.5)
            .as("b"))
        d.agg(
          sum(when(col("a") && !col("b"), 1L).otherwise(0L)).as("n10"),
          sum(when(!col("a") && col("b"), 1L).otherwise(0L)).as("n01"))
          // Degenerate guard (r11 advice): fully-concordant classifiers
          // give b+c = 0 → 0/0 and 1/0; return NULL instead of leaning
          // on either engine's IEEE division behavior. Continuity
          // correction floored at 0 (Edwards' raw (|b−c|−1)² exceeds the
          // uncorrected χ² when |b−c| ≤ 1; the conventional statistic
          // clamps the numerator to max(|b−c|−1, 0)).
          .select(col("n10"), col("n01"),
            when(col("n10") + col("n01") > 0,
              ((col("n10") - col("n01")) * (col("n10") - col("n01")))
                .cast("double") /
                (col("n10") + col("n01")).cast("double")).as("chi2"),
            when(col("n10") + col("n01") > 0,
              (greatest(abs(col("n10") - col("n01")) - 1, lit(0L)) *
                greatest(abs(col("n10") - col("n01")) - 1, lit(0L)))
                .cast("double") /
                (col("n10") + col("n01")).cast("double")).as("chi2_cc"))
      },
      Some(s"""WITH lab AS (SELECT
            CAST(COALESCE(list_sum(list_transform($dTok, t ->
              ('0x' || substr(md5('w|' ||
                  (('0x' || substr(md5(t), 1, 7))::BIGINT % $fhDim)
                    ::VARCHAR), 1, 7))::BIGINT % $fhWMod - $fhWOff)), 0)
              AS BIGINT) >= 0 AS a,
            $dQualityExpr >= 0.5 AS b
          FROM documents),
        c AS (SELECT
            CAST(SUM(CASE WHEN a AND NOT b THEN 1 ELSE 0 END) AS BIGINT)
              AS n10,
            CAST(SUM(CASE WHEN NOT a AND b THEN 1 ELSE 0 END) AS BIGINT)
              AS n01
          FROM lab)
        SELECT n10, n01,
          CASE WHEN n10 + n01 > 0 THEN
            CAST((n10 - n01) * (n10 - n01) AS DOUBLE)
              / CAST(n10 + n01 AS DOUBLE) END AS chi2,
          CASE WHEN n10 + n01 > 0 THEN
            CAST(greatest(abs(n10 - n01) - 1, 0)
                 * greatest(abs(n10 - n01) - 1, 0) AS DOUBLE)
              / CAST(n10 + n01 AS DOUBLE) END AS chi2_cc
        FROM c""")),

    // ── Ranking eval: mean-average-precision AP@10 per source (q297) ───
    // Completes the retrieval-eval family (nDCG q209, MRR q245): the
    // rank-sensitive precision average over the same deterministic
    // hash-score ranking with quality-gate relevance. Float
    // discipline: precision at rank i is an integer count over i, so
    // AP@10's numerator is carried as Σ y_i·cum_i·(2520/i) — 2520 =
    // lcm(1..10) clears every denominator — and AP is ONE double
    // division by 2520·min(np,10). Top-10 per group via the TopKPerKey
    // heap (no global sort); the cum window touches ≤10 rows/source.
    QueryDef("q297_map_at10",
      (s, dir) => {
        val d = tPar(s, dir, "documents").select(
          col("source"), col("doc_id"),
          (Shingles.baseHash(col("text")) % 999).as("m"),
          when(TextStats.qualityScore(col("text"), stopwords) >= 0.5,
            1L).otherwise(0L).as("y"))
          .localCheckpoint()
        val top = graft.plans.TopKPerKey.topKPerKey(d, Seq("source"),
          Seq(graft.plans.TopKPerKey.Sort("m", asc = false),
            graft.plans.TopKPerKey.Sort("doc_id")), 10)
        val w = Window.partitionBy("source").orderBy("rank")
        val apNum = top.withColumn("cum", sum("y").over(w))
          .groupBy("source")
          .agg(sum(col("y") * col("cum") * expr("2520 div rank"))
            .as("ap_num"))
        val np = d.groupBy("source").agg(sum("y").as("np"))
          .filter(col("np") >= 1)
        apNum.join(np, "source")
          .select(col("source"), col("np"),
            (col("ap_num").cast("double") /
              (lit(2520L) * least(col("np"), lit(10L))).cast("double"))
              .as("ap10"))
          .orderBy("source")
      },
      Some(s"""WITH d AS (SELECT source, doc_id,
            ('0x' || substr(md5(text), 1, 7))::BIGINT % 999 AS m,
            CASE WHEN $dQualityExpr >= 0.5 THEN 1 ELSE 0 END AS y
          FROM documents),
        ranked AS (SELECT source, y, row_number() OVER (
            PARTITION BY source ORDER BY m DESC, doc_id) AS rank FROM d),
        t AS (SELECT source, y, rank,
            SUM(y) OVER (PARTITION BY source ORDER BY rank) AS cum
          FROM ranked WHERE rank <= 10),
        a AS (SELECT source, SUM(y * cum * (2520 // rank)) AS ap_num
          FROM t GROUP BY source),
        np AS (SELECT source, CAST(SUM(y) AS BIGINT) AS np FROM d
          GROUP BY source HAVING SUM(y) >= 1)
        SELECT a.source, np,
          CAST(ap_num AS DOUBLE) / CAST(2520 * least(np, 10) AS DOUBLE)
            AS ap10
        FROM a JOIN np ON a.source = np.source ORDER BY a.source""")),

    // ── Two-group log-rank test on the churn lifetimes (q298) ──────────
    // Completes the survival suite (Kaplan–Meier q179, Nelson–Aalen
    // q265): is retention different between the even- and odd-user_id
    // arms? Same lifetime/censoring construction as q179; per distinct
    // death time the hypergeometric expectation E1 = d·n1/n and
    // variance V = d·n1·(n−n1)·(n−d) / (n²·(n−1)) are each a handful
    // of correctly-rounded IEEE ops on exact integer at-risk counts,
    // and the ≤|distinct lifetimes| term sums run through the
    // Parity.dsum decimal contract, so chi² = (O1−E1)²/ΣV is
    // engine-identical. Heavy work is one per-user aggregation; the
    // life table and its two suffix-sum windows are bounded by
    // construction. n² stays in long up to ~3·10⁹ at-risk users.
    QueryDef("q298_logrank",
      (s, dir) => {
        val day = 86400000000L
        val u = t(s, dir, "events").groupBy("user_id")
          .agg(min(unix_micros(col("ts"))).as("fu"),
            max(unix_micros(col("ts"))).as("lu"))
          .localCheckpoint()
        val p = u.crossJoin(broadcast(u.agg(max("lu").as("gmax"))))
          .select(expr("(lu - fu) div 86400000000").as("t"),
            (col("lu") <= col("gmax") - lit(7L * day)).as("died"),
            (col("user_id") % 2 === 0).as("g1"))
        val lt = p.groupBy("t").agg(
          sum(when(col("died"), 1L).otherwise(0L)).as("d"),
          sum(when(col("died") && col("g1"), 1L).otherwise(0L)).as("d1"),
          count(lit(1)).as("c"),
          sum(when(col("g1"), 1L).otherwise(0L)).as("c1"))
        val w = boundedWindow("t")
          .rowsBetween(Window.currentRow, Window.unboundedFollowing)
        val risk = lt
          .withColumn("n", sum("c").over(w))
          .withColumn("n1", sum("c1").over(w))
          .filter(col("d") > 0 && col("n") > 1)
        val terms = risk.select(col("d1"),
          ((col("d") * col("n1")).cast("double") / col("n").cast("double"))
            .as("e1"),
          ((col("d") * col("n1")).cast("double") *
            (col("n") - col("n1")).cast("double") *
            (col("n") - col("d")).cast("double") /
            ((col("n") * col("n")).cast("double") *
              (col("n") - 1).cast("double"))).as("v"))
        terms.agg(sum("d1").as("o1"),
            graft.functions.Parity.dsum(col("e1")).as("e1"),
            graft.functions.Parity.dsum(col("v")).as("v"))
          // Degenerate guard (r11 advice): V = 0 when every qualifying
          // death time has all at-risk users in one arm; NULL instead of
          // engine-dependent 0/0 or x/0.
          .select(col("o1"), col("e1"), col("v"),
            when(col("v") > 0,
              (col("o1").cast("double") - col("e1")) *
                (col("o1").cast("double") - col("e1")) / col("v"))
              .as("chi2"))
      },
      Some(s"""WITH u AS (SELECT user_id, MIN(epoch_us(ts)) AS fu,
            MAX(epoch_us(ts)) AS lu
          FROM events GROUP BY 1),
        p AS (SELECT (lu - fu) // 86400000000 AS t,
            (lu <= (SELECT MAX(lu) FROM u) - 7 * 86400000000) AS died,
            user_id % 2 = 0 AS g1
          FROM u),
        lt AS (SELECT t,
            SUM(CASE WHEN died THEN 1 ELSE 0 END) AS d,
            SUM(CASE WHEN died AND g1 THEN 1 ELSE 0 END) AS d1,
            COUNT(*) AS c,
            SUM(CASE WHEN g1 THEN 1 ELSE 0 END) AS c1
          FROM p GROUP BY t),
        w AS (SELECT t, d, d1,
            SUM(c) OVER (ORDER BY t ROWS BETWEEN CURRENT ROW AND
              UNBOUNDED FOLLOWING) AS n,
            SUM(c1) OVER (ORDER BY t ROWS BETWEEN CURRENT ROW AND
              UNBOUNDED FOLLOWING) AS n1
          FROM lt),
        terms AS (SELECT d1,
            CAST(d * n1 AS DOUBLE) / CAST(n AS DOUBLE) AS e1,
            CAST(d * n1 AS DOUBLE) * CAST(n - n1 AS DOUBLE)
              * CAST(n - d AS DOUBLE)
              / (CAST(n * n AS DOUBLE) * CAST(n - 1 AS DOUBLE)) AS v
          FROM w WHERE d > 0 AND n > 1),
        agg AS (SELECT CAST(SUM(d1) AS BIGINT) AS o1,
            ${dsumSql("e1")} AS e1, ${dsumSql("v")} AS v
          FROM terms)
        SELECT o1, e1, v,
          CASE WHEN v > 0 THEN
            (CAST(o1 AS DOUBLE) - e1) * (CAST(o1 AS DOUBLE) - e1) / v
          END AS chi2
        FROM agg""")),

    // ── Spearman rank correlation: daily volume vs revenue (q299) ──────
    // The monotone-association companion of the Pearson/OLS machinery
    // (q201): does daily event volume co-move with daily revenue
    // WITHOUT assuming linearity? Average ranks over ties carried as
    // 2×rank integers (2·avg_rank = 2·cnt_less + cnt_eq + 1 =
    // 2·rank() + cnt_eq − 1), so every sum is exact long arithmetic on
    // the BOUNDED day grid — the only doubles are the two final sqrts
    // (IEEE-exact on both engines) and one division. Daily revenue
    // rides the decimal rail so rank ties are decided on identical
    // values. Scale: one fact shuffle to the day grid; rank windows
    // span the grid only (the repo's documented bounded-window
    // contract); 2n³ stays in long to ~1M grid days.
    QueryDef("q299_spearman",
      (s, dir) => {
        val grid = t(s, dir, "events")
          .select(expr("unix_micros(ts) div 86400000000").as("day"),
            col("value"))
          .groupBy("day")
          .agg(count(lit(1)).as("x"), dsum(col("value")).as("y"))
        val rx = rank().over(boundedWindow("x")) * 2 +
          count(lit(1)).over(Window.partitionBy("x")) - 1
        val ry = rank().over(boundedWindow("y")) * 2 +
          count(lit(1)).over(Window.partitionBy("y")) - 1
        grid.select(rx.cast("long").as("rx"), ry.cast("long").as("ry"))
          .agg(count(lit(1)).as("n"), sum("rx").as("sx"),
            sum("ry").as("sy"),
            sum(col("rx") * col("rx")).as("sxx"),
            sum(col("ry") * col("ry")).as("syy"),
            sum(col("rx") * col("ry")).as("sxy"))
          .select(col("n"),
            ((col("n") * col("sxy") - col("sx") * col("sy"))
              .cast("double") /
              (sqrt((col("n") * col("sxx") - col("sx") * col("sx"))
                .cast("double")) *
                sqrt((col("n") * col("syy") - col("sy") * col("sy"))
                  .cast("double")))).as("spearman_rho"))
      },
      Some(s"""WITH grid AS (SELECT epoch_us(ts) // 86400000000 AS day,
            COUNT(*) AS x, ${dsumSql("value")} AS y
          FROM events GROUP BY 1),
        r AS (SELECT
            CAST(rank() OVER (ORDER BY x) * 2
              + COUNT(*) OVER (PARTITION BY x) - 1 AS BIGINT) AS rx,
            CAST(rank() OVER (ORDER BY y) * 2
              + COUNT(*) OVER (PARTITION BY y) - 1 AS BIGINT) AS ry
          FROM grid),
        a AS (SELECT CAST(COUNT(*) AS BIGINT) AS n,
            CAST(SUM(rx) AS BIGINT) AS sx, CAST(SUM(ry) AS BIGINT) AS sy,
            CAST(SUM(rx*rx) AS BIGINT) AS sxx,
            CAST(SUM(ry*ry) AS BIGINT) AS syy,
            CAST(SUM(rx*ry) AS BIGINT) AS sxy
          FROM r)
        SELECT n,
          CAST(n*sxy - sx*sy AS DOUBLE)
            / (sqrt(CAST(n*sxx - sx*sx AS DOUBLE))
               * sqrt(CAST(n*syy - sy*sy AS DOUBLE))) AS spearman_rho
        FROM a""")),

    // ── Kendall τ-b: daily volume vs revenue (q300) ────────────────────
    // The pair-concordance twin of q299 — robust to the same monotone
    // transforms but with the classic τ-b tie correction. Concordant /
    // discordant counts come from the day-grid SELF-JOIN (i < j): the
    // grid is BOUNDED (≤ a few thousand days at any corpus scale), so
    // the quadratic pair pass is grid², never facts² — the same
    // bounded-grid contract as the lead–lag matrix (q248). Revenue
    // comparisons happen on decimal-rail doubles, so tie detection is
    // engine-identical. Everything is exact long counting until the
    // final (C−D)/√(n0−n1)/√(n0−n2).
    QueryDef("q300_kendall_tau",
      (s, dir) => {
        val grid = t(s, dir, "events")
          .select(expr("unix_micros(ts) div 86400000000").as("day"),
            col("value"))
          .groupBy("day")
          .agg(count(lit(1)).as("x"), dsum(col("value")).as("y"))
          .localCheckpoint()
        val a = grid.select(col("day").as("da"), col("x").as("xa"),
          col("y").as("ya"))
        val b = grid.select(col("day").as("db"), col("x").as("xb"),
          col("y").as("yb"))
        val cd = a.join(b, col("da") < col("db"))
          .agg(
            sum(when((col("xa") < col("xb") && col("ya") < col("yb")) ||
              (col("xa") > col("xb") && col("ya") > col("yb")), 1L)
              .otherwise(0L)).as("c"),
            sum(when((col("xa") < col("xb") && col("ya") > col("yb")) ||
              (col("xa") > col("xb") && col("ya") < col("yb")), 1L)
              .otherwise(0L)).as("d"))
        val nn = grid.agg(count(lit(1)).as("n"))
        val t1 = grid.groupBy("x").agg(count(lit(1)).as("t"))
          .agg(coalesce(sum(expr("t * (t - 1) div 2")), lit(0L))
            .as("n1"))
        val t2 = grid.groupBy("y").agg(count(lit(1)).as("t"))
          .agg(coalesce(sum(expr("t * (t - 1) div 2")), lit(0L))
            .as("n2"))
        cd.crossJoin(broadcast(nn)).crossJoin(broadcast(t1))
          .crossJoin(broadcast(t2))
          .select(col("n"), col("c"), col("d"),
            ((col("c") - col("d")).cast("double") /
              (sqrt(expr("n * (n - 1) div 2 - n1").cast("double")) *
                sqrt(expr("n * (n - 1) div 2 - n2").cast("double"))))
              .as("tau_b"))
      },
      Some(s"""WITH grid AS (SELECT epoch_us(ts) // 86400000000 AS day,
            COUNT(*) AS x, ${dsumSql("value")} AS y
          FROM events GROUP BY 1),
        cd AS (SELECT
            CAST(SUM(CASE WHEN (a.x < b.x AND a.y < b.y)
              OR (a.x > b.x AND a.y > b.y) THEN 1 ELSE 0 END)
              AS BIGINT) AS c,
            CAST(SUM(CASE WHEN (a.x < b.x AND a.y > b.y)
              OR (a.x > b.x AND a.y < b.y) THEN 1 ELSE 0 END)
              AS BIGINT) AS d
          FROM grid a JOIN grid b ON a.day < b.day),
        nn AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM grid),
        t1 AS (SELECT CAST(COALESCE(SUM(t*(t-1)//2), 0) AS BIGINT) AS n1
          FROM (SELECT COUNT(*) AS t FROM grid GROUP BY x)),
        t2 AS (SELECT CAST(COALESCE(SUM(t*(t-1)//2), 0) AS BIGINT) AS n2
          FROM (SELECT COUNT(*) AS t FROM grid GROUP BY y))
        SELECT n, c, d,
          CAST(c - d AS DOUBLE)
            / (sqrt(CAST(n*(n-1)//2 - n1 AS DOUBLE))
               * sqrt(CAST(n*(n-1)//2 - n2 AS DOUBLE))) AS tau_b
        FROM cd, nn, t1, t2""")),

    // ── Wilcoxon signed-rank: purchases vs views per user (q301) ───────
    // The PAIRED complement of the Mann–Whitney U (q144): each user is
    // their own pair (purchase count vs view count), d = p − v, zeros
    // dropped per the classic test. Ranking |d| over millions of users
    // never runs a data-sized window: |d| is a small-integer count
    // difference, so average ranks come from the DISTRIBUTION FUNCTION
    // over the bounded distinct-|d| grid (avg_rank·2 = 2·cum_less +
    // cnt + 1), the same trick as the exact-median family. W⁺ and the
    // tie-corrected normal approximation are exact integer arithmetic
    // (cubics on the decimal rail / HUGEINT — n³ overflows long past
    // ~2M users) until the single final z division.
    QueryDef("q301_wilcoxon_signed_rank",
      (s, dir) => {
        val d = t(s, dir, "events")
          .groupBy("user_id")
          .agg((sum(when(col("event_type") === "purchase", 1L)
            .otherwise(0L)) -
            sum(when(col("event_type") === "view", 1L).otherwise(0L)))
            .as("d"))
          .filter(col("d") =!= 0)
        val grid = d.groupBy(abs(col("d")).as("a"))
          .agg(count(lit(1)).as("cnt"),
            sum(when(col("d") > 0, 1L).otherwise(0L)).as("pos"))
        val wl = boundedWindow("a")
          .rowsBetween(Window.unboundedPreceding, -1)
        val agg = grid
          .withColumn("cum_less", coalesce(sum("cnt").over(wl), lit(0L)))
          .agg(sum("cnt").as("n"),
            sum(col("pos") * (lit(2) * col("cum_less") + col("cnt") +
              lit(1))).as("w2"),
            sum(col("cnt").cast("decimal(38,0)") *
              col("cnt").cast("decimal(38,0)") *
              col("cnt").cast("decimal(38,0)") -
              col("cnt").cast("decimal(38,0)")).as("ties"))
        agg.select(col("n"),
            (col("w2").cast("double") / 2).as("w_plus"),
            ((lit(2) * col("w2").cast("decimal(38,0)") -
              col("n").cast("decimal(38,0)") *
                (col("n").cast("decimal(38,0)") + 1)).cast("double") /
              (lit(4) * sqrt(
                (lit(2) * col("n").cast("decimal(38,0)") *
                  (col("n").cast("decimal(38,0)") + 1) *
                  (lit(2) * col("n").cast("decimal(38,0)") + 1) -
                  col("ties")).cast("double") / 48.0))).as("z"))
      },
      Some("""WITH d AS (SELECT user_id,
            SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
              - SUM(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END)
              AS d
          FROM events GROUP BY 1),
        nz AS (SELECT d FROM d WHERE d <> 0),
        grid AS (SELECT abs(d) AS a, COUNT(*) AS cnt,
            SUM(CASE WHEN d > 0 THEN 1 ELSE 0 END) AS pos
          FROM nz GROUP BY 1),
        g2 AS (SELECT a, cnt, pos,
            COALESCE(SUM(cnt) OVER (ORDER BY a
              ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
              AS cum_less
          FROM grid),
        agg AS (SELECT CAST(SUM(cnt) AS BIGINT) AS n,
            CAST(SUM(pos * (2*cum_less + cnt + 1)) AS BIGINT) AS w2,
            SUM(CAST(cnt AS HUGEINT)*cnt*cnt - cnt) AS ties
          FROM g2)
        SELECT n, CAST(w2 AS DOUBLE) / 2 AS w_plus,
          CAST(2*CAST(w2 AS HUGEINT) - CAST(n AS HUGEINT)*(n+1)
            AS DOUBLE)
          / (4 * sqrt(CAST(2*CAST(n AS HUGEINT)*(n+1)*(2*n+1) - ties
              AS DOUBLE) / 48.0)) AS z
        FROM agg""")),

    // ── Blocked edit-distance near-dup pairs (q302) ────────────────────
    // The character-level member of the dedup family: MinHash/Jaccard
    // (q25/q26) see token SETS and miss small in-word edits; prefix
    // Levenshtein catches typo-grade clones. NEVER all-pairs: documents
    // block on (lang, n_chars÷32) — the length band is not just a
    // blocker, it is a correctness-preserving filter (edit distance ≥
    // length difference, so cross-band pairs at this threshold need
    // the adjacent-band pass a production sweep would add). Within a
    // block, candidate pairs join on the block key (block size is the
    // shuffle key, same contract as fuzzy-blocked q105) and the O(L²)
    // Levenshtein DP runs on the 80-char normalized prefix — bounded
    // per-pair cost, codegen'd built-in on both engines.
    QueryDef("q302_edit_distance_pairs",
      (s, dir) => {
        val base = tPar(s, dir, "documents").select(
          col("doc_id"), col("lang"),
          expr("n_chars div 32").as("band"),
          substring(lower(col("text")), 1, 80).as("pfx"))
        val a = base.select(col("lang"), col("band"),
          col("doc_id").as("id_a"), col("pfx").as("pfx_a"))
        val b = base.select(col("lang"), col("band"),
          col("doc_id").as("id_b"), col("pfx").as("pfx_b"))
        a.join(b, Seq("lang", "band"))
          .filter(col("id_a") < col("id_b"))
          .select(col("id_a"), col("id_b"),
            levenshtein(col("pfx_a"), col("pfx_b")).cast("long")
              .as("lev"))
          .filter(col("lev") <= 20)
          .orderBy("id_a", "id_b")
      },
      Some("""WITH base AS (SELECT doc_id, lang, n_chars // 32 AS band,
            substr(lower(text), 1, 80) AS pfx
          FROM documents),
        p AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b,
            CAST(levenshtein(a.pfx, b.pfx) AS BIGINT) AS lev
          FROM base a JOIN base b
            ON a.lang = b.lang AND a.band = b.band
              AND a.doc_id < b.doc_id)
        SELECT id_a, id_b, lev FROM p WHERE lev <= 20
        ORDER BY id_a, id_b""")),

    // ── Source-divergence report without log(): TV + Bhattacharyya (q303)
    // The snapshot-drift question ("did src1's token mix move away from
    // src0's?") is usually answered with KL/JS — both need ln, which is
    // NOT hash-portable across engines (the q217 lesson: libm last-ulp
    // divergence). Total-variation distance and the Bhattacharyya
    // coefficient carry the same signal log-free: TV is EXACT rational
    // arithmetic (Σ|c₁T₂ − c₂T₁| over cross-multiplied integer counts,
    // one final division), BC needs only sqrt — IEEE-mandated correct
    // rounding, portable. Counts cross-multiply on the decimal rail /
    // HUGEINT because cᵢ·Tⱼ overflows long at corpus scale. One token
    // aggregation shuffle; totals broadcast as 1-row scalars.
    QueryDef("q303_source_divergence",
      (s, dir) => {
        val tok = tPar(s, dir, "documents")
          .filter(col("source").isin("src0", "src1"))
          .select(col("source"),
            explode(TextStats.tokens(lower(col("text")))).as("token"))
          .groupBy("token")
          .agg(sum(when(col("source") === "src0", 1L).otherwise(0L))
            .as("c1"),
            sum(when(col("source") === "src1", 1L).otherwise(0L))
              .as("c2"))
          .localCheckpoint()
        val tot = tok.agg(sum("c1").as("t1"), sum("c2").as("t2"))
        tok.crossJoin(broadcast(tot))
          .agg(
            sum(when(col("c1") > 0, 1L).otherwise(0L)).as("n_vocab_a"),
            sum(when(col("c2") > 0, 1L).otherwise(0L)).as("n_vocab_b"),
            sum(when(col("c1") > 0 && col("c2") > 0, 1L).otherwise(0L))
              .as("n_shared"),
            sum(abs(col("c1").cast("decimal(38,0)") *
              col("t2").cast("decimal(38,0)") -
              col("c2").cast("decimal(38,0)") *
                col("t1").cast("decimal(38,0)"))).as("tvnum"),
            dsum(sqrt((col("c1").cast("decimal(38,0)") *
              col("c2").cast("decimal(38,0)")).cast("double")))
              .as("sbc"),
            max(col("t1")).as("t1"), max(col("t2")).as("t2"))
          .select(col("n_vocab_a"), col("n_vocab_b"), col("n_shared"),
            (col("tvnum").cast("double") /
              (lit(2) * (col("t1").cast("decimal(38,0)") *
                col("t2").cast("decimal(38,0)")).cast("double")))
              .as("tv_distance"),
            (col("sbc") / sqrt((col("t1").cast("decimal(38,0)") *
              col("t2").cast("decimal(38,0)")).cast("double")))
              .as("bhattacharyya"))
      },
      Some(s"""WITH tok AS (SELECT
            CAST(SUM(CASE WHEN source = 'src0' THEN 1 ELSE 0 END)
              AS BIGINT) AS c1,
            CAST(SUM(CASE WHEN source = 'src1' THEN 1 ELSE 0 END)
              AS BIGINT) AS c2
          FROM (SELECT source, unnest($dTokLower) AS token
                FROM documents WHERE source IN ('src0', 'src1'))
          GROUP BY token),
        tot AS (SELECT CAST(SUM(c1) AS BIGINT) AS t1,
            CAST(SUM(c2) AS BIGINT) AS t2 FROM tok),
        agg AS (SELECT
            CAST(SUM(CASE WHEN c1 > 0 THEN 1 ELSE 0 END) AS BIGINT)
              AS n_vocab_a,
            CAST(SUM(CASE WHEN c2 > 0 THEN 1 ELSE 0 END) AS BIGINT)
              AS n_vocab_b,
            CAST(SUM(CASE WHEN c1 > 0 AND c2 > 0 THEN 1 ELSE 0 END)
              AS BIGINT) AS n_shared,
            SUM(abs(CAST(c1 AS HUGEINT)*t2 - CAST(c2 AS HUGEINT)*t1))
              AS tvnum,
            ${dsumSql("sqrt(CAST(CAST(c1 AS HUGEINT)*c2 AS DOUBLE))")}
              AS sbc,
            MAX(t1) AS t1, MAX(t2) AS t2
          FROM tok, tot)
        SELECT n_vocab_a, n_vocab_b, n_shared,
          CAST(tvnum AS DOUBLE)
            / (2 * CAST(CAST(t1 AS HUGEINT)*t2 AS DOUBLE))
            AS tv_distance,
          sbc / sqrt(CAST(CAST(t1 AS HUGEINT)*t2 AS DOUBLE))
            AS bhattacharyya
        FROM agg""")),

    // ── Heaps-law vocabulary-growth curve (q304) ───────────────────────
    // How fast does vocabulary grow as the corpus grows — the curve
    // that decides tokenizer vocab budgets and dedup payoff estimates.
    // The naive formulation (cumulative DISTINCT over a doc ordering)
    // is a data-sized running set; instead each token contributes to
    // vocabulary exactly once, at its FIRST bucket (min over a 10-slot
    // doc_id decade grid), so the whole curve is: one token
    // aggregation (min bucket per token) + one bounded 10-row
    // cumulative window. Token totals per bucket ride the same scan.
    QueryDef("q304_heaps_curve",
      (s, dir) => {
        val mx = t(s, dir, "documents").agg(max("doc_id").as("mx"))
        val base = tPar(s, dir, "documents")
          .crossJoin(broadcast(mx))
          .select(expr("least(9L, doc_id * 10 div (mx + 1))")
            .as("bucket"),
            col("doc_id"),
            TextStats.tokens(lower(col("text"))).as("toks"))
          .localCheckpoint()
        val perB = base.groupBy("bucket")
          .agg(count(lit(1)).as("docs"),
            sum(size(col("toks")).cast("long")).as("toks"))
        val vocabNew = base
          .select(col("bucket"), explode(col("toks")).as("token"))
          .groupBy("token").agg(min("bucket").as("bucket"))
          .groupBy("bucket").agg(count(lit(1)).as("vnew"))
        val wc = boundedWindow("bucket")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        perB.join(vocabNew, Seq("bucket"), "left")
          .select(col("bucket"), col("docs"), col("toks"),
            coalesce(col("vnew"), lit(0L)).as("vnew"))
          .select(col("bucket"),
            sum("docs").over(wc).as("n_docs"),
            sum("toks").over(wc).as("n_tokens"),
            sum("vnew").over(wc).as("vocab"))
          .orderBy("bucket")
      },
      Some(s"""WITH mx AS (SELECT MAX(doc_id) AS mx FROM documents),
        base AS (SELECT least(9, doc_id * 10 // (mx + 1)) AS bucket,
            doc_id, $dTokLower AS toks
          FROM documents, mx),
        perb AS (SELECT bucket, COUNT(*) AS docs,
            CAST(SUM(len(toks)) AS BIGINT) AS toks
          FROM base GROUP BY 1),
        vn AS (SELECT bucket, CAST(COUNT(*) AS BIGINT) AS vnew
          FROM (SELECT token, MIN(bucket) AS bucket
                FROM (SELECT bucket, unnest(toks) AS token FROM base)
                GROUP BY token)
          GROUP BY bucket),
        j AS (SELECT perb.bucket, perb.docs, perb.toks,
            COALESCE(vn.vnew, 0) AS vnew
          FROM perb LEFT JOIN vn ON perb.bucket = vn.bucket)
        SELECT bucket,
          CAST(SUM(docs) OVER w AS BIGINT) AS n_docs,
          CAST(SUM(toks) OVER w AS BIGINT) AS n_tokens,
          CAST(SUM(vnew) OVER w AS BIGINT) AS vocab
        FROM j WINDOW w AS (ORDER BY bucket
          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        ORDER BY bucket""")),

    // ── Standardized effect sizes: Cohen's d / Hedges' g / Glass's Δ (q305)
    // The magnitude companion of Welch's t (q122): a 100 TB A/B readout
    // needs "how big", not just "how unlikely". Arms are the even/odd
    // user split on purchase values; all three estimators come from ONE
    // map-side aggregate (per-arm n, Σx, Σx² on the decimal rail —
    // squares multiply in double first, the q291 discipline, because
    // decimal×decimal would silently drop scale at the precision cap).
    // The final chain is a handful of identical IEEE ops. Hedges'
    // small-sample factor uses the standard J ≈ 1 − 3/(4·df−1).
    QueryDef("q305_effect_sizes",
      (s, dir) => {
        val agg = t(s, dir, "events")
          .filter(col("event_type") === "purchase")
          .select((col("user_id") % 2 === 0).as("g"), col("value"))
          .agg(
            sum(when(col("g"), 1L).otherwise(0L)).as("n1"),
            dsum(when(col("g"), col("value"))).as("s1"),
            dsum(when(col("g"), (col("value") / 100) *
              (col("value") / 100))).as("ss1"),
            sum(when(!col("g"), 1L).otherwise(0L)).as("n2"),
            dsum(when(!col("g"), col("value"))).as("s2"),
            dsum(when(!col("g"), (col("value") / 100) *
              (col("value") / 100))).as("ss2"))
        agg.select(col("n1"), col("n2"),
            (col("s1") / col("n1") - col("s2") / col("n2"))
              .as("mean_diff"),
            ((col("ss1") * 10000 - col("s1") * col("s1") / col("n1")) /
              (col("n1") - 1)).as("v1"),
            ((col("ss2") * 10000 - col("s2") * col("s2") / col("n2")) /
              (col("n2") - 1)).as("v2"))
          .select(col("n1"), col("n2"), col("mean_diff"),
            (col("mean_diff") / sqrt(
              ((col("n1") - 1) * col("v1") + (col("n2") - 1) * col("v2"))
                / (col("n1") + col("n2") - 2))).as("cohen_d"),
            ((lit(1.0) - lit(3.0) /
              (lit(4) * (col("n1") + col("n2") - 2) - 1)) *
              (col("mean_diff") / sqrt(
                ((col("n1") - 1) * col("v1") +
                  (col("n2") - 1) * col("v2"))
                  / (col("n1") + col("n2") - 2)))).as("hedges_g"),
            (col("mean_diff") / sqrt(col("v2"))).as("glass_delta"))
      },
      Some(s"""WITH p AS (SELECT user_id % 2 = 0 AS g, value
            FROM events WHERE event_type = 'purchase'),
        agg AS (SELECT
            CAST(SUM(CASE WHEN g THEN 1 ELSE 0 END) AS BIGINT) AS n1,
            ${dsumSql("CASE WHEN g THEN value END")} AS s1,
            ${dsumSql("CASE WHEN g THEN (value / 100) * (value / 100) END")}
              AS ss1,
            CAST(SUM(CASE WHEN NOT g THEN 1 ELSE 0 END) AS BIGINT)
              AS n2,
            ${dsumSql("CASE WHEN NOT g THEN value END")} AS s2,
            ${dsumSql(
      "CASE WHEN NOT g THEN (value / 100) * (value / 100) END")} AS ss2
          FROM p),
        m AS (SELECT n1, n2, s1/n1 - s2/n2 AS mean_diff,
            (ss1 * 10000 - s1*s1/n1) / (n1 - 1) AS v1,
            (ss2 * 10000 - s2*s2/n2) / (n2 - 1) AS v2
          FROM agg)
        SELECT n1, n2, mean_diff,
          mean_diff / sqrt(((n1-1)*v1 + (n2-1)*v2) / (n1+n2-2))
            AS cohen_d,
          (1.0 - 3.0 / (4*(n1+n2-2) - 1)) *
            (mean_diff / sqrt(((n1-1)*v1 + (n2-1)*v2) / (n1+n2-2)))
            AS hedges_g,
          mean_diff / sqrt(v2) AS glass_delta
        FROM m""")),

    // ── Funnel time-to-convert, exact percentiles (q306) ───────────────
    // The latency distribution of signup→purchase conversion. Exact
    // p50/p90 over millions of converters without a data-sized sort:
    // lag quantizes to DAYS, so the distribution-function grid
    // (distinct day values × cumulative counts) is bounded, and each
    // percentile is "smallest day with cum ≥ ⌈q·n⌉" — the q107/q141
    // lower-percentile contract stated in pure integer arithmetic.
    // One per-user aggregation is the only data-sized shuffle.
    QueryDef("q306_convert_time",
      (s, dir) => {
        val u = t(s, dir, "events")
          .groupBy("user_id")
          .agg(min(when(col("event_type") === "signup",
            unix_micros(col("ts")))).as("fs"),
            min(when(col("event_type") === "purchase",
              unix_micros(col("ts")))).as("fp"))
          .filter(col("fs").isNotNull && col("fp").isNotNull &&
            col("fp") >= col("fs"))
          .select(expr("(fp - fs) div 86400000000").as("days"))
        val grid = u.groupBy("days").agg(count(lit(1)).as("cnt"))
        val wc = boundedWindow("days")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        val cum = grid.withColumn("cum", sum("cnt").over(wc))
        val n = u.agg(count(lit(1)).as("n"))
        cum.crossJoin(broadcast(n))
          .agg(max("n").as("n_converted"),
            min(when(col("cum") >= expr("(n + 1) div 2"), col("days")))
              .as("p50_days"),
            min(when(col("cum") >= expr("(9 * n + 9) div 10"),
              col("days"))).as("p90_days"),
            max("days").as("max_days"))
      },
      Some("""WITH u AS (SELECT user_id,
            MIN(CASE WHEN event_type = 'signup' THEN epoch_us(ts) END)
              AS fs,
            MIN(CASE WHEN event_type = 'purchase' THEN epoch_us(ts) END)
              AS fp
          FROM events GROUP BY 1),
        c AS (SELECT (fp - fs) // 86400000000 AS days
          FROM u WHERE fs IS NOT NULL AND fp IS NOT NULL AND fp >= fs),
        grid AS (SELECT days, COUNT(*) AS cnt FROM c GROUP BY 1),
        cum AS (SELECT days, SUM(cnt) OVER (ORDER BY days
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
          FROM grid),
        n AS (SELECT COUNT(*) AS n FROM c)
        SELECT CAST(MAX(n) AS BIGINT) AS n_converted,
          CAST(MIN(CASE WHEN cum >= (n + 1) // 2 THEN days END)
            AS BIGINT) AS p50_days,
          CAST(MIN(CASE WHEN cum >= (9 * n + 9) // 10 THEN days END)
            AS BIGINT) AS p90_days,
          CAST(MAX(days) AS BIGINT) AS max_days
        FROM cum, n""")),

    // ── Centroid silhouette of the labeled clusters (q307) ─────────────
    // The cluster-quality score the embedding-QC family was missing:
    // per vector, a = cosine distance to its OWN label centroid, b =
    // min distance to any OTHER centroid, s = (b−a)/max(a,b); the
    // report is the mean simplified silhouette per label. The full
    // silhouette's all-pairs a(i) is vectors² — unbuildable; the
    // centroid variant is the standard at-scale substitute: vectors ×
    // LABELS, with the (label × dim) centroid table bounded and
    // BROADCAST, so the per-vector work is map-side after one
    // dimension-exploded aggregation. Every mean/dot rides the decimal
    // rail; sqrt is the only irrational step.
    QueryDef("q307_silhouette",
      (s, dir) => {
        val ex = tPar(s, dir, "embeddings")
          .select(col("vec_id"), col("label"),
            posexplode(col("embedding")).as(Seq("dim", "v")))
          .select(col("vec_id"), col("label"), col("dim"),
            col("v").cast("double").as("v"))
          .localCheckpoint()
        val cent = ex.groupBy(col("label").as("clabel"), col("dim"))
          .agg((dsum(col("v")) / count(lit(1))).as("m"))
        val cnorm = cent.groupBy("clabel")
          .agg(dsum(col("m") * col("m")).as("cn"))
        val vnorm = ex.groupBy("vec_id")
          .agg(dsum(col("v") * col("v")).as("vn"))
        val dots = ex.join(broadcast(cent), Seq("dim"))
          .groupBy("vec_id", "label", "clabel")
          .agg(dsum(col("v") * col("m")).as("dot"))
        val dist = dots
          .join(broadcast(cnorm), "clabel")
          .join(vnorm, "vec_id")
          .select(col("vec_id"), col("label"), col("clabel"),
            (lit(1.0) - col("dot") / (sqrt(col("vn")) * sqrt(col("cn"))))
              .as("dist"))
        val ab = dist.groupBy("vec_id", "label")
          .agg(max(when(col("label") === col("clabel"), col("dist")))
            .as("a"),
            min(when(col("label") =!= col("clabel"), col("dist")))
              .as("b"))
        ab.select(col("label"),
            when(greatest(col("a"), col("b")) > 0,
              (col("b") - col("a")) / greatest(col("a"), col("b")))
              .otherwise(lit(0.0)).as("sil"))
          .groupBy("label")
          .agg(count(lit(1)).as("n_vectors"),
            davg(col("sil")).as("mean_silhouette"))
          .orderBy("label")
      },
      Some(s"""WITH ex AS (SELECT vec_id, label,
            generate_subscripts(embedding, 1) - 1 AS dim,
            CAST(unnest(embedding) AS DOUBLE) AS v
          FROM embeddings),
        cent AS (SELECT label AS clabel, dim,
            ${dsumSql("v")} / COUNT(*) AS m
          FROM ex GROUP BY 1, 2),
        cnorm AS (SELECT clabel, ${dsumSql("m * m")} AS cn
          FROM cent GROUP BY 1),
        vnorm AS (SELECT vec_id, ${dsumSql("v * v")} AS vn
          FROM ex GROUP BY 1),
        dots AS (SELECT ex.vec_id, ex.label, cent.clabel,
            ${dsumSql("ex.v * cent.m")} AS dot
          FROM ex JOIN cent ON ex.dim = cent.dim
          GROUP BY 1, 2, 3),
        dist AS (SELECT d.vec_id, d.label, d.clabel,
            1.0 - d.dot / (sqrt(vn.vn) * sqrt(cn.cn)) AS dist
          FROM dots d JOIN cnorm cn ON d.clabel = cn.clabel
          JOIN vnorm vn ON d.vec_id = vn.vec_id),
        ab AS (SELECT vec_id, label,
            MAX(CASE WHEN label = clabel THEN dist END) AS a,
            MIN(CASE WHEN label <> clabel THEN dist END) AS b
          FROM dist GROUP BY 1, 2),
        sil AS (SELECT label,
            CASE WHEN greatest(a, b) > 0 THEN (b - a) / greatest(a, b)
              ELSE 0.0 END AS sil
          FROM ab)
        SELECT label, CAST(COUNT(*) AS BIGINT) AS n_vectors,
          ${dsumSql("sil")} / COUNT(*) AS mean_silhouette
        FROM sil GROUP BY label ORDER BY label""")),

    // ── Wald–Wolfowitz runs test on daily volume direction (q308) ──────
    // Randomness check the anomaly family leans on implicitly: are the
    // day-over-day up/down moves serially independent, or does volume
    // trend/oscillate? The up/down sequence lives on the BOUNDED day
    // grid (ties dropped per the classic test), runs are counted with
    // one lag over the filtered sequence, and z = (R−μ)/σ uses the
    // exact integer n1/n2/R with the textbook normal approximation —
    // identical IEEE chains on both engines.
    QueryDef("q308_runs_test",
      (s, dir) => {
        val grid = t(s, dir, "events")
          .select(expr("unix_micros(ts) div 86400000000").as("day"))
          .groupBy("day").agg(count(lit(1)).as("volume"))
        val wd = boundedWindow("day")
        val sgn = grid
          .withColumn("prev", lag("volume", 1).over(wd))
          .filter(col("prev").isNotNull && col("volume") =!= col("prev"))
          .select(col("day"),
            when(col("volume") > col("prev"), 1L).otherwise(0L)
              .as("up"))
        val runs = sgn
          .withColumn("pu", lag("up", 1).over(wd))
          .agg(
            sum(when(col("pu").isNull || col("up") =!= col("pu"), 1L)
              .otherwise(0L)).as("r"),
            sum(col("up")).as("n1"),
            sum(lit(1L) - col("up")).as("n2"))
        runs.select(col("r"), col("n1"), col("n2"),
          ((col("r").cast("double") -
            ((lit(2) * col("n1") * col("n2")).cast("double") /
              (col("n1") + col("n2")) + lit(1.0))) /
            sqrt((lit(2) * col("n1") * col("n2")).cast("double") *
              (lit(2) * col("n1") * col("n2") - col("n1") - col("n2"))
                .cast("double") /
              ((col("n1") + col("n2")).cast("double") *
                (col("n1") + col("n2")) *
                (col("n1") + col("n2") - 1)))).as("z"))
      },
      Some("""WITH grid AS (SELECT epoch_us(ts) // 86400000000 AS day,
            COUNT(*) AS volume FROM events GROUP BY 1),
        sgn AS (SELECT day,
            CASE WHEN volume > prev THEN 1 ELSE 0 END AS up
          FROM (SELECT day, volume,
              lag(volume) OVER (ORDER BY day) AS prev FROM grid)
          WHERE prev IS NOT NULL AND volume <> prev),
        runs AS (SELECT
            CAST(SUM(CASE WHEN pu IS NULL OR up <> pu THEN 1 ELSE 0 END)
              AS BIGINT) AS r,
            CAST(SUM(up) AS BIGINT) AS n1,
            CAST(SUM(1 - up) AS BIGINT) AS n2
          FROM (SELECT up, lag(up) OVER (ORDER BY day) AS pu FROM sgn))
        SELECT r, n1, n2,
          (CAST(r AS DOUBLE)
            - (CAST(2*n1*n2 AS DOUBLE) / (n1 + n2) + 1.0))
          / sqrt(CAST(2*n1*n2 AS DOUBLE)
              * CAST(2*n1*n2 - n1 - n2 AS DOUBLE)
              / (CAST(n1 + n2 AS DOUBLE) * (n1 + n2) * (n1 + n2 - 1)))
            AS z
        FROM runs""")),

    // ── Cochran's Q: three matched binary judges (q309) ────────────────
    // Generalizes McNemar (q296) to k=3 judges per document — the
    // hashed linear classifier, the heuristic quality gate, and the
    // lang-ID 'en' call. Q = k(k−1)·[kΣCⱼ² − (ΣCⱼ)²] / (k·ΣRᵢ −
    // ΣRᵢ²): column totals Cⱼ and the row-sum moments ΣRᵢ, ΣRᵢ² all
    // come from ONE map-only scan + a 5-cell aggregate; Q is one
    // double division, NULL-guarded for the all-agreeing denominator.
    QueryDef("q309_cochran_q",
      (s, dir) => {
        def score(toks: Column): Column = aggregate(toks, lit(0L),
          (acc, tk) => {
            val b = Shingles.baseHash(tk) % fhDim
            acc + (Shingles.baseHash(concat(lit("w|"), b.cast("string")))
              % fhWMod - fhWOff)
          })
        val lab = tPar(s, dir, "documents").select(
          when(score(TextStats.tokens(col("text"))) >= 0, 1L)
            .otherwise(0L).as("a"),
          when(TextStats.qualityScore(col("text"), stopwords) >= 0.5,
            1L).otherwise(0L).as("b"),
          when(col("lang") === "en", 1L).otherwise(0L).as("c"))
        lab.agg(sum("a").as("c1"), sum("b").as("c2"), sum("c").as("c3"),
            count(lit(1)).as("n"),
            sum(col("a") + col("b") + col("c")).as("sr"),
            sum((col("a") + col("b") + col("c")) *
              (col("a") + col("b") + col("c"))).as("srr"))
          .select(col("n"), col("c1"), col("c2"), col("c3"),
            when(lit(3) * col("sr") - col("srr") > 0,
              (lit(2) * (lit(3) * (col("c1") * col("c1") +
                col("c2") * col("c2") + col("c3") * col("c3")) -
                col("sr") * col("sr"))).cast("double") /
                (lit(3) * col("sr") - col("srr")).cast("double"))
              .as("q_stat"))
      },
      Some(s"""WITH lab AS (SELECT
            CASE WHEN CAST(COALESCE(list_sum(list_transform($dTok, t ->
                ('0x' || substr(md5('w|' ||
                    (('0x' || substr(md5(t), 1, 7))::BIGINT % $fhDim)
                      ::VARCHAR), 1, 7))::BIGINT % $fhWMod - $fhWOff)),
                0) AS BIGINT) >= 0 THEN 1 ELSE 0 END AS a,
            CASE WHEN $dQualityExpr >= 0.5 THEN 1 ELSE 0 END AS b,
            CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS c
          FROM documents),
        agg AS (SELECT CAST(SUM(a) AS BIGINT) AS c1,
            CAST(SUM(b) AS BIGINT) AS c2,
            CAST(SUM(c) AS BIGINT) AS c3,
            CAST(COUNT(*) AS BIGINT) AS n,
            CAST(SUM(a + b + c) AS BIGINT) AS sr,
            CAST(SUM((a + b + c) * (a + b + c)) AS BIGINT) AS srr
          FROM lab)
        SELECT n, c1, c2, c3,
          CASE WHEN 3*sr - srr > 0 THEN
            CAST(2 * (3*(c1*c1 + c2*c2 + c3*c3) - sr*sr) AS DOUBLE)
              / CAST(3*sr - srr AS DOUBLE) END AS q_stat
        FROM agg""")),

    // ── Friedman test: weekday effect across week blocks (q310) ────────
    // The rank-based repeated-measures ANOVA the parametric q281
    // assumes away: blocks are complete weeks, treatments the 7
    // weekdays, and ranks live INSIDE a 7-row block window — never a
    // data-sized sort. Average ranks over ties carried as 2×rank
    // integers; on that scale the tie-corrected statistic collapses to
    // χ²_F = (k−1)·Σⱼ(Sⱼ − n(k+1))² / (Σs² − nk(k+1)²) — exact long
    // arithmetic end to end, one final division, NULL-guarded for the
    // all-tied denominator.
    QueryDef("q310_friedman",
      (s, dir) => {
        val k = 7
        val days = t(s, dir, "events")
          .select(expr("unix_micros(ts) div 86400000000").as("day"))
          .groupBy("day").agg(count(lit(1)).as("volume"))
          .withColumn("week", expr("day div 7"))
          .withColumn("wd", pmod(col("day"), lit(7L)))
        val full = days
          .withColumn("nw", count(lit(1))
            .over(Window.partitionBy("week")))
          .filter(col("nw") === k)
        val wB = Window.partitionBy("week").orderBy("volume")
        val wT = Window.partitionBy("week", "volume")
        val ranked = full.select(col("week"), col("wd"),
          (rank().over(wB) * 2 + count(lit(1)).over(wT) - 1)
            .cast("long").as("s2"))
          .localCheckpoint()
        val perWd = ranked.groupBy("wd").agg(sum("s2").as("sj"))
        val moments = ranked.agg(
          (countDistinct(col("week"))).as("n"),
          sum(col("s2") * col("s2")).as("ssq"))
        perWd.crossJoin(broadcast(moments))
          .agg(max("n").as("n_weeks"), max("ssq").as("ssq"),
            sum((col("sj") - col("n") * lit(k + 1)) *
              (col("sj") - col("n") * lit(k + 1))).as("dev"))
          .select(col("n_weeks"),
            when(col("ssq") - col("n_weeks") * lit(k) * lit((k + 1) *
              (k + 1)) > 0,
              (lit(k - 1) * col("dev")).cast("double") /
                (col("ssq") - col("n_weeks") * lit(k) *
                  lit((k + 1) * (k + 1))).cast("double"))
              .as("chi2_f"))
      },
      Some("""WITH days AS (SELECT day, COUNT(*) AS volume,
            day // 7 AS week, day % 7 AS wd
          FROM (SELECT epoch_us(ts) // 86400000000 AS day FROM events)
          GROUP BY day),
        fw AS (SELECT * FROM (SELECT day, volume, week, wd,
            COUNT(*) OVER (PARTITION BY week) AS nw FROM days)
          WHERE nw = 7),
        ranked AS (SELECT week, wd,
            CAST(rank() OVER (PARTITION BY week ORDER BY volume) * 2
              + COUNT(*) OVER (PARTITION BY week, volume) - 1
              AS BIGINT) AS s2
          FROM fw),
        perwd AS (SELECT wd, CAST(SUM(s2) AS BIGINT) AS sj
          FROM ranked GROUP BY wd),
        mom AS (SELECT CAST(COUNT(DISTINCT week) AS BIGINT) AS n,
            CAST(SUM(s2*s2) AS BIGINT) AS ssq FROM ranked),
        agg AS (SELECT MAX(n) AS n_weeks, MAX(ssq) AS ssq,
            CAST(SUM((sj - n*8) * (sj - n*8)) AS BIGINT) AS dev
          FROM perwd, mom)
        SELECT n_weeks,
          CASE WHEN ssq - n_weeks*7*64 > 0 THEN
            CAST(6 * dev AS DOUBLE)
              / CAST(ssq - n_weeks*7*64 AS DOUBLE) END AS chi2_f
        FROM agg""")),

    // ── Cliff's delta: ordinal effect size between arms (q311) ─────────
    // The distribution-free companion of Cohen's d (q305) and the MWU
    // (q144): P(X>Y) − P(X<Y) for per-user purchase counts between the
    // even/odd arms. All n₁·n₂ comparisons collapse to the bounded
    // count-value grid × grid (counts are small integers), so the
    // quadratic pass is grid², never users² — exact integer products,
    // one final division.
    QueryDef("q311_cliffs_delta",
      (s, dir) => {
        val pc = t(s, dir, "events")
          .filter(col("event_type") === "purchase")
          .groupBy("user_id").agg(count(lit(1)).as("v"))
          .select((col("user_id") % 2 === 0).as("g"), col("v"))
        val g1 = pc.filter(col("g")).groupBy(col("v").as("v1"))
          .agg(count(lit(1)).as("f1"))
        val g2 = pc.filter(!col("g")).groupBy(col("v").as("v2"))
          .agg(count(lit(1)).as("f2"))
        val cross = g1.crossJoin(g2)
        cross.agg(
            sum(when(col("v1") > col("v2"), col("f1") * col("f2"))
              .otherwise(0L)).as("gt"),
            sum(when(col("v1") < col("v2"), col("f1") * col("f2"))
              .otherwise(0L)).as("lt"),
            sum(col("f1") * col("f2")).as("tot"))
          .select(
            (col("gt") - col("lt")).as("net_pairs"), col("tot")
              .as("n_pairs"),
            ((col("gt") - col("lt")).cast("double") /
              col("tot").cast("double")).as("cliffs_delta"))
      },
      Some("""WITH pc AS (SELECT user_id % 2 = 0 AS g, COUNT(*) AS v
            FROM events WHERE event_type = 'purchase'
            GROUP BY user_id),
        g1 AS (SELECT v, COUNT(*) AS f1 FROM pc WHERE g GROUP BY v),
        g2 AS (SELECT v, COUNT(*) AS f2 FROM pc WHERE NOT g GROUP BY v),
        agg AS (SELECT
            CAST(SUM(CASE WHEN g1.v > g2.v THEN f1*f2 ELSE 0 END)
              AS BIGINT) AS gt,
            CAST(SUM(CASE WHEN g1.v < g2.v THEN f1*f2 ELSE 0 END)
              AS BIGINT) AS lt,
            CAST(SUM(f1*f2) AS BIGINT) AS tot
          FROM g1 CROSS JOIN g2)
        SELECT gt - lt AS net_pairs, tot AS n_pairs,
          CAST(gt - lt AS DOUBLE) / CAST(tot AS DOUBLE) AS cliffs_delta
        FROM agg""")),

    // ── Two-sample Poisson rate comparison (q312) ──────────────────────
    // The error-budget question: is the error RATE (errors per event)
    // different between the arms? One map-side 4-cell aggregate (error
    // counts + exposures per arm), then the standard large-sample
    // z = (r₁−r₂)/√(c₁/e₁² + c₂/e₂²) as one identical IEEE chain,
    // NULL-guarded when both arms are error-free.
    QueryDef("q312_poisson_rate",
      (s, dir) => {
        val agg = t(s, dir, "events")
          .select((col("user_id") % 2 === 0).as("g"),
            when(col("event_type") === "error", 1L).otherwise(0L)
              .as("e"))
          .agg(sum(when(col("g"), col("e")).otherwise(0L)).as("c1"),
            sum(when(col("g"), 1L).otherwise(0L)).as("e1"),
            sum(when(!col("g"), col("e")).otherwise(0L)).as("c2"),
            sum(when(!col("g"), 1L).otherwise(0L)).as("e2"))
        agg.select(col("c1"), col("e1"), col("c2"), col("e2"),
          (col("c1").cast("double") / col("e1") -
            col("c2").cast("double") / col("e2")).as("rate_diff"),
          when(col("c1") + col("c2") > 0,
            (col("c1").cast("double") / col("e1") -
              col("c2").cast("double") / col("e2")) /
              sqrt(col("c1").cast("double") /
                (col("e1").cast("double") * col("e1")) +
                col("c2").cast("double") /
                  (col("e2").cast("double") * col("e2")))).as("z"))
      },
      Some("""WITH agg AS (SELECT
            CAST(SUM(CASE WHEN user_id % 2 = 0 AND event_type = 'error'
              THEN 1 ELSE 0 END) AS BIGINT) AS c1,
            CAST(SUM(CASE WHEN user_id % 2 = 0 THEN 1 ELSE 0 END)
              AS BIGINT) AS e1,
            CAST(SUM(CASE WHEN user_id % 2 <> 0 AND event_type = 'error'
              THEN 1 ELSE 0 END) AS BIGINT) AS c2,
            CAST(SUM(CASE WHEN user_id % 2 <> 0 THEN 1 ELSE 0 END)
              AS BIGINT) AS e2
          FROM events)
        SELECT c1, e1, c2, e2,
          CAST(c1 AS DOUBLE)/e1 - CAST(c2 AS DOUBLE)/e2 AS rate_diff,
          CASE WHEN c1 + c2 > 0 THEN
            (CAST(c1 AS DOUBLE)/e1 - CAST(c2 AS DOUBLE)/e2)
            / sqrt(CAST(c1 AS DOUBLE)/(CAST(e1 AS DOUBLE)*e1)
                   + CAST(c2 AS DOUBLE)/(CAST(e2 AS DOUBLE)*e2))
          END AS z
        FROM agg""")),

    // ── Capture–recapture audit of the near-dup population (q313) ──────
    // How many near-dup pairs exist that NO single detector sees? Two
    // independent "captures" — the MinHash-LSH candidate pairs (q26)
    // and the exact shingle-Jaccard pairs ≥ threshold (q28) — plus
    // their overlap give the Chapman estimator N̂ = (n₁+1)(n₂+1)/(m+1)
    // − 1 of the true pair population, the standard ecology trick
    // repurposed as a dedup-recall audit. Both pair sets come from the
    // locked bucketed machinery (never all-pairs); the overlap is one
    // pair-key join.
    QueryDef("q313_capture_recapture",
      (s, dir) => {
        val docs = tPar(s, dir, "documents")
        val mh = Dedup.minhashCandidates(docs, "doc_id", "text",
          shingleK, minhashHashes, minhashBandRows)
          .select(col("id_a"), col("id_b")).localCheckpoint()
        // scale-safe q28 plan (prefix-filtered; naive index is
        // superlinear at sf3 — see q28's routing note)
        val jc = Dedup.prefixFilterJaccardPairs(docs, "doc_id", "text",
          shingleK, ppjTNum, ppjTDen)
          .select(col("id_a"), col("id_b")).localCheckpoint()
        val n1 = mh.agg(count(lit(1)).as("n1"))
        val n2 = jc.agg(count(lit(1)).as("n2"))
        val m = mh.join(jc, Seq("id_a", "id_b")).agg(count(lit(1))
          .as("m"))
        n1.crossJoin(broadcast(n2)).crossJoin(broadcast(m))
          .select(col("n1"), col("n2"), col("m"),
            ((col("n1") + 1) * (col("n2") + 1)).cast("double")
              ./((col("m") + 1).cast("double")).minus(lit(1.0))
              .as("n_hat"))
      },
      Some(s"""WITH $dMinhashCandCtes,
        sh AS (SELECT doc_id, unnest(list_distinct(
            ${dShingles(dTok, shingleK)})) AS shingle FROM documents),
        sz AS (SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY doc_id),
        jp AS (SELECT id_a, id_b FROM (
          SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS shared
          FROM sh a JOIN sh b USING (shingle)
          WHERE a.doc_id < b.doc_id GROUP BY 1, 2) p
          JOIN sz x ON p.id_a = x.doc_id JOIN sz y ON p.id_b = y.doc_id
          WHERE CAST(shared AS DOUBLE)
            / CAST(x.n + y.n - shared AS DOUBLE) >= $jaccardMin),
        c1 AS (SELECT CAST(COUNT(*) AS BIGINT) AS n1 FROM cand),
        c2 AS (SELECT CAST(COUNT(*) AS BIGINT) AS n2 FROM jp),
        ov AS (SELECT CAST(COUNT(*) AS BIGINT) AS m
          FROM cand JOIN jp USING (id_a, id_b))
        SELECT n1, n2, m,
          CAST((n1 + 1) * (n2 + 1) AS DOUBLE) / CAST(m + 1 AS DOUBLE)
            - 1.0 AS n_hat
        FROM c1, c2, ov""")),

    // ── Matthews correlation coefficient of the judge pair (q314) ──────
    // The balanced single-number agreement score for the q296 judge
    // pair — unlike raw accuracy it punishes both error directions
    // even under class imbalance. Full 2×2 confusion from the same
    // map-only scan; MCC = (TP·TN − FP·FN)/√((TP+FP)(TP+FN)(TN+FP)
    // (TN+FN)), products on the decimal rail (four marginals multiply
    // past long at corpus scale), NULL-guarded degenerate marginals.
    QueryDef("q314_mcc",
      (s, dir) => {
        def score(toks: Column): Column = aggregate(toks, lit(0L),
          (acc, tk) => {
            val b = Shingles.baseHash(tk) % fhDim
            acc + (Shingles.baseHash(concat(lit("w|"), b.cast("string")))
              % fhWMod - fhWOff)
          })
        val d = tPar(s, dir, "documents").select(
          (score(TextStats.tokens(col("text"))) >= 0).as("a"),
          (TextStats.qualityScore(col("text"), stopwords) >= 0.5)
            .as("b"))
        val agg = d.agg(
          sum(when(col("a") && col("b"), 1L).otherwise(0L)).as("tp"),
          sum(when(col("a") && !col("b"), 1L).otherwise(0L)).as("fp"),
          sum(when(!col("a") && col("b"), 1L).otherwise(0L)).as("fn"),
          sum(when(!col("a") && !col("b"), 1L).otherwise(0L)).as("tn"))
        agg.select(col("tp"), col("fp"), col("fn"), col("tn"),
          when((col("tp") + col("fp")) * (col("tp") + col("fn")) *
            (col("tn") + col("fp")) * (col("tn") + col("fn")) > 0,
            (col("tp").cast("decimal(38,0)") *
              col("tn").cast("decimal(38,0)") -
              col("fp").cast("decimal(38,0)") *
                col("fn").cast("decimal(38,0)")).cast("double") /
              sqrt(((col("tp") + col("fp")).cast("decimal(38,0)") *
                (col("tp") + col("fn")).cast("decimal(38,0)") *
                (col("tn") + col("fp")).cast("decimal(38,0)") *
                (col("tn") + col("fn")).cast("decimal(38,0)"))
                .cast("double"))).as("mcc"))
      },
      Some(s"""WITH lab AS (SELECT
            CAST(COALESCE(list_sum(list_transform($dTok, t ->
              ('0x' || substr(md5('w|' ||
                  (('0x' || substr(md5(t), 1, 7))::BIGINT % $fhDim)
                    ::VARCHAR), 1, 7))::BIGINT % $fhWMod - $fhWOff)), 0)
              AS BIGINT) >= 0 AS a,
            $dQualityExpr >= 0.5 AS b
          FROM documents),
        agg AS (SELECT
            CAST(SUM(CASE WHEN a AND b THEN 1 ELSE 0 END) AS BIGINT)
              AS tp,
            CAST(SUM(CASE WHEN a AND NOT b THEN 1 ELSE 0 END) AS BIGINT)
              AS fp,
            CAST(SUM(CASE WHEN NOT a AND b THEN 1 ELSE 0 END) AS BIGINT)
              AS fn,
            CAST(SUM(CASE WHEN NOT a AND NOT b THEN 1 ELSE 0 END)
              AS BIGINT) AS tn
          FROM lab)
        SELECT tp, fp, fn, tn,
          CASE WHEN CAST(tp+fp AS HUGEINT)*(tp+fn)*(tn+fp)*(tn+fn) > 0
            THEN CAST(CAST(tp AS HUGEINT)*tn - CAST(fp AS HUGEINT)*fn
                AS DOUBLE)
              / sqrt(CAST(CAST(tp+fp AS HUGEINT)*(tp+fn)*(tn+fp)
                  *(tn+fn) AS DOUBLE))
          END AS mcc
        FROM agg""")),

    // ── Precision–recall AUC (average precision) (q315) ────────────────
    // The imbalance-robust companion of q207's ROC-AUC: step-wise
    // average precision AP = (1/P)·Σᵢ posᵢ·(cum_posᵢ/cum_nᵢ) over the
    // distinct-score grid in descending score order. The grid is the
    // classifier's integer score domain (one groupBy), cumulative
    // windows run over the grid — never per-document — and each term
    // is one exact rational division summed on the decimal rail.
    QueryDef("q315_pr_auc",
      (s, dir) => {
        def score(toks: Column): Column = aggregate(toks, lit(0L),
          (acc, tk) => {
            val b = Shingles.baseHash(tk) % fhDim
            acc + (Shingles.baseHash(concat(lit("w|"), b.cast("string")))
              % fhWMod - fhWOff)
          })
        val d = tPar(s, dir, "documents").select(
          score(TextStats.tokens(col("text"))).as("sc"),
          when(TextStats.qualityScore(col("text"), stopwords) >= 0.5,
            1L).otherwise(0L).as("y"))
        val grid = d.groupBy("sc")
          .agg(count(lit(1)).as("n"), sum("y").as("pos"))
        val w = boundedWindow(desc("sc"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        grid
          .withColumn("cum_n", sum("n").over(w))
          .withColumn("cum_pos", sum("pos").over(w))
          .agg(max("cum_n").as("n_docs"), max("cum_pos").as("n_pos"),
            dsum(col("pos").cast("double") * col("cum_pos") /
              col("cum_n")).as("ap_num"))
          .select(col("n_docs"), col("n_pos"),
            (col("ap_num") / col("n_pos")).as("pr_auc"))
      },
      Some(s"""WITH d AS (SELECT
            CAST(COALESCE(list_sum(list_transform($dTok, t ->
              ('0x' || substr(md5('w|' ||
                  (('0x' || substr(md5(t), 1, 7))::BIGINT % $fhDim)
                    ::VARCHAR), 1, 7))::BIGINT % $fhWMod - $fhWOff)), 0)
              AS BIGINT) AS sc,
            CASE WHEN $dQualityExpr >= 0.5 THEN 1 ELSE 0 END AS y
          FROM documents),
        grid AS (SELECT sc, COUNT(*) AS n, SUM(y) AS pos
          FROM d GROUP BY sc),
        cum AS (SELECT pos,
            SUM(n) OVER w AS cum_n, SUM(pos) OVER w AS cum_pos
          FROM grid WINDOW w AS (ORDER BY sc DESC
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
        agg AS (SELECT CAST(MAX(cum_n) AS BIGINT) AS n_docs,
            CAST(MAX(cum_pos) AS BIGINT) AS n_pos,
            ${dsumSql("CAST(pos AS DOUBLE) * cum_pos / cum_n")}
              AS ap_num
          FROM cum)
        SELECT n_docs, n_pos, ap_num / n_pos AS pr_auc FROM agg""")),

    // ── Durbin–Watson residual autocorrelation (q316) ──────────────────
    // The regression-diagnostic the OLS family (q201) was missing: fit
    // daily revenue on daily volume, DW = Σ(eᵢ−eᵢ₋₁)²/Σeᵢ² over the
    // day-ordered residuals. Float discipline (learned the hard way in
    // this query): the OLS moments are EXACT integers — x is the day
    // count, y is the day's decimal(30,8) revenue lifted to 1e-8
    // integer units — cross-multiplied on HUGEINT/decimal(38,0) and
    // cast to double ONCE, because rail-quantizing data-sized double
    // products (x·y ~ 1e15·quantum) lets Spark's shortest-string
    // double→decimal rounding and DuckDB's exact-value rounding
    // disagree by a quantum. Residuals then descend a deterministic
    // pure-IEEE chain; only the two FINAL sums ride the decimal rail,
    // at thousandth scale so their term ulp sits far below the
    // quantum. The lag window runs on the BOUNDED day grid.
    QueryDef("q316_durbin_watson",
      (s, dir) => {
        val grid = t(s, dir, "events")
          .select(expr("unix_micros(ts) div 86400000000").as("day"),
            col("value").cast("decimal(30,8)").as("v"))
          .groupBy("day")
          .agg(count(lit(1)).as("x"),
            (sum(col("v")) * 100000000L).cast("long").as("yi"))
          .localCheckpoint()
        val mom = grid.agg(count(lit(1)).as("n"),
          sum("x").as("sx"), sum("yi").as("sy"),
          sum(col("x") * col("x")).as("sxx"),
          sum(col("x").cast("decimal(38,0)") *
            col("yi").cast("decimal(38,0)")).as("sxy"))
        val wd = boundedWindow("day")
        val res = grid.crossJoin(broadcast(mom))
          .withColumn("b",
            (col("n").cast("decimal(38,0)") * col("sxy") -
              col("sx").cast("decimal(38,0)") *
                col("sy").cast("decimal(38,0)")).cast("double") /
              (col("n") * col("sxx") - col("sx") * col("sx"))
                .cast("double"))
          .withColumn("a", (col("sy").cast("double") -
            col("b") * col("sx").cast("double")) / col("n"))
          .select(col("day"),
            ((col("yi").cast("double") - col("a") -
              col("b") * col("x").cast("double")) / 1.0e8).as("e"))
          .withColumn("ep", lag("e", 1).over(wd))
        res.agg(count(lit(1)).as("n_days"),
            dsum(when(col("ep").isNotNull,
              ((col("e") - col("ep")) / 1000) *
                ((col("e") - col("ep")) / 1000))).as("num"),
            dsum((col("e") / 1000) * (col("e") / 1000)).as("den"))
          .select(col("n_days"),
            when(col("den") > 0, col("num") / col("den")).as("dw"))
      },
      Some(s"""WITH grid AS (SELECT epoch_us(ts) // 86400000000 AS day,
            CAST(COUNT(*) AS BIGINT) AS x,
            CAST(SUM(CAST(value AS DECIMAL(30,8))) * 100000000
              AS BIGINT) AS yi
          FROM events GROUP BY 1),
        mom AS (SELECT CAST(COUNT(*) AS BIGINT) AS n,
            CAST(SUM(x) AS BIGINT) AS sx, CAST(SUM(yi) AS BIGINT) AS sy,
            CAST(SUM(x * x) AS BIGINT) AS sxx,
            SUM(CAST(x AS HUGEINT) * yi) AS sxy
          FROM grid),
        fit AS (SELECT day,
            (CAST(yi AS DOUBLE) - a - b * CAST(x AS DOUBLE)) / 1.0e8
              AS e
          FROM (SELECT day, x, yi, b,
              (CAST(sy AS DOUBLE) - b * CAST(sx AS DOUBLE)) / n AS a
            FROM (SELECT day, x, yi, n, sx, sy,
                CAST(CAST(n AS HUGEINT) * sxy
                    - CAST(sx AS HUGEINT) * sy AS DOUBLE)
                  / CAST(n * sxx - sx * sx AS DOUBLE) AS b
              FROM grid, mom))),
        lagd AS (SELECT e, lag(e) OVER (ORDER BY day) AS ep FROM fit)
        SELECT CAST(COUNT(*) AS BIGINT) AS n_days,
          CASE WHEN ${dsumSql("(e / 1000) * (e / 1000)")} > 0 THEN
            ${dsumSql(
      "CASE WHEN ep IS NOT NULL THEN ((e - ep) / 1000) * ((e - ep) / 1000) END")}
              / ${dsumSql("(e / 1000) * (e / 1000)")} END AS dw
        FROM lagd""")),

    // ── OLS influence diagnostics: leverage + Cook's D (q317) ──────────
    // Which DAYS drive the q316 fit? Leverage hᵢ = 1/n + (xᵢ−x̄)²/Sxx
    // and Cook's Dᵢ = eᵢ²hᵢ/(p·s²·(1−hᵢ)²), p = 2. Same exact-integer
    // moment discipline as q316 (this query OUTPUTS raw residual
    // doubles, so even 1-ulp cross-engine drift in the fit is a hash
    // failure — the sf0.1 sweep caught exactly that under the earlier
    // double-moment rail). s² rides the thousandth-scaled rail; the
    // 1e-6 factors cancel in Cook's D. Top-5 by (D, day) keeps the
    // output deterministic under double ties.
    QueryDef("q317_ols_influence",
      (s, dir) => {
        val grid = t(s, dir, "events")
          .select(expr("unix_micros(ts) div 86400000000").as("day"),
            col("value").cast("decimal(30,8)").as("v"))
          .groupBy("day")
          .agg(count(lit(1)).as("x"),
            (sum(col("v")) * 100000000L).cast("long").as("yi"))
          .localCheckpoint()
        val mom = grid.agg(count(lit(1)).as("n"),
          sum("x").as("sx"), sum("yi").as("sy"),
          sum(col("x") * col("x")).as("sxx"),
          sum(col("x").cast("decimal(38,0)") *
            col("yi").cast("decimal(38,0)")).as("sxy"))
        val withE = grid.crossJoin(broadcast(mom))
          .withColumn("b",
            (col("n").cast("decimal(38,0)") * col("sxy") -
              col("sx").cast("decimal(38,0)") *
                col("sy").cast("decimal(38,0)")).cast("double") /
              (col("n") * col("sxx") - col("sx") * col("sx"))
                .cast("double"))
          .withColumn("a", (col("sy").cast("double") -
            col("b") * col("sx").cast("double")) / col("n"))
          .withColumn("e", (col("yi").cast("double") - col("a") -
            col("b") * col("x").cast("double")) / 1.0e8)
          .withColumn("h", lit(1.0) / col("n") +
            (col("x").cast("double") -
              col("sx").cast("double") / col("n")) *
              (col("x").cast("double") -
                col("sx").cast("double") / col("n")) /
              (col("sxx").cast("double") -
                col("sx").cast("double") *
                  col("sx").cast("double") / col("n")))
          .localCheckpoint()
        val s2 = withE.agg((dsum((col("e") / 1000) * (col("e") / 1000)) /
          (max("n") - lit(2))).as("s2"))
        withE.crossJoin(broadcast(s2))
          .select(col("day"), col("e"), col("h"),
            ((col("e") / 1000) * (col("e") / 1000) * col("h") /
              (lit(2.0) * col("s2") * (lit(1.0) - col("h")) *
                (lit(1.0) - col("h")))).as("cooks_d"))
          .orderBy(desc("cooks_d"), col("day"))
          .limit(5)
      },
      Some(s"""WITH grid AS (SELECT epoch_us(ts) // 86400000000 AS day,
            CAST(COUNT(*) AS BIGINT) AS x,
            CAST(SUM(CAST(value AS DECIMAL(30,8))) * 100000000
              AS BIGINT) AS yi
          FROM events GROUP BY 1),
        mom AS (SELECT CAST(COUNT(*) AS BIGINT) AS n,
            CAST(SUM(x) AS BIGINT) AS sx, CAST(SUM(yi) AS BIGINT) AS sy,
            CAST(SUM(x * x) AS BIGINT) AS sxx,
            SUM(CAST(x AS HUGEINT) * yi) AS sxy
          FROM grid),
        we AS (SELECT day,
            (CAST(yi AS DOUBLE) - ((CAST(sy AS DOUBLE)
                - b * CAST(sx AS DOUBLE)) / n)
              - b * CAST(x AS DOUBLE)) / 1.0e8 AS e,
            1.0 / n + (CAST(x AS DOUBLE) - CAST(sx AS DOUBLE) / n)
              * (CAST(x AS DOUBLE) - CAST(sx AS DOUBLE) / n)
              / (CAST(sxx AS DOUBLE)
                 - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE) / n) AS h,
            n
          FROM (SELECT day, x, yi, n, sx, sy, sxx,
              CAST(CAST(n AS HUGEINT) * sxy
                  - CAST(sx AS HUGEINT) * sy AS DOUBLE)
                / CAST(n * sxx - sx * sx AS DOUBLE) AS b
            FROM grid, mom)),
        s2 AS (SELECT ${dsumSql("(e / 1000) * (e / 1000)")}
            / (MAX(n) - 2) AS s2 FROM we)
        SELECT day, e, h,
          (e / 1000) * (e / 1000) * h
            / (2.0 * s2 * (1.0 - h) * (1.0 - h)) AS cooks_d
        FROM we, s2
        ORDER BY cooks_d DESC, day LIMIT 5""")),

    // ── Overdispersion / zero-inflation report per event type (q318) ───
    // The count-model sanity check before any Poisson assumption
    // (q312): per event type, the variance/mean ratio over ALL users —
    // including the zeros, reconstructed arithmetically from the
    // distinct-user total rather than materialized — plus the zero
    // fraction. One (type, user) aggregation is the only data-sized
    // shuffle; per-type moments are exact integers.
    QueryDef("q318_dispersion",
      (s, dir) => {
        val ev = t(s, dir, "events")
        val u = ev.agg(countDistinct(col("user_id")).as("us"))
        val per = ev.groupBy("event_type", "user_id")
          .agg(count(lit(1)).as("c"))
          .groupBy("event_type")
          .agg(count(lit(1)).as("active"), sum("c").as("n"),
            sum(col("c") * col("c")).as("scc"))
        per.crossJoin(broadcast(u))
          .select(col("event_type"), col("n").as("n_events"),
            col("active").as("n_active_users"),
            (col("n").cast("double") / col("us")).as("mean"),
            ((col("scc").cast("double") -
              col("n").cast("double") * col("n") / col("us")) /
              col("us")).as("variance"),
            ((col("scc").cast("double") -
              col("n").cast("double") * col("n") / col("us")) /
              col("us") / (col("n").cast("double") / col("us")))
              .as("dispersion"),
            ((col("us") - col("active")).cast("double") / col("us"))
              .as("zero_frac"))
          .orderBy("event_type")
      },
      Some("""WITH u AS (SELECT CAST(COUNT(DISTINCT user_id) AS BIGINT)
            AS us FROM events),
        per AS (SELECT event_type,
            CAST(COUNT(*) AS BIGINT) AS active,
            CAST(SUM(c) AS BIGINT) AS n,
            CAST(SUM(c * c) AS BIGINT) AS scc
          FROM (SELECT event_type, user_id, COUNT(*) AS c
                FROM events GROUP BY 1, 2)
          GROUP BY event_type)
        SELECT event_type, n AS n_events, active AS n_active_users,
          CAST(n AS DOUBLE) / us AS mean,
          (CAST(scc AS DOUBLE) - CAST(n AS DOUBLE) * n / us) / us
            AS variance,
          (CAST(scc AS DOUBLE) - CAST(n AS DOUBLE) * n / us) / us
            / (CAST(n AS DOUBLE) / us) AS dispersion,
          CAST(us - active AS DOUBLE) / us AS zero_frac
        FROM per, u ORDER BY event_type""")),

    // ── Herfindahl–Hirschman concentration of source token mass (q319)
    // The antitrust index as a corpus-mix monitor: HHI = Σ shareᵢ² of
    // per-source token mass — an exact rational Σcᵢ²/T² (HUGEINT /
    // decimal products: c² overflows long past ~3·10⁹ tokens/source) —
    // with the 1/n-floor normalization. Complements Gini (q165) and
    // Hoover (q293) with the square-weighted view that punishes a
    // single dominant source hardest.
    QueryDef("q319_hhi",
      (s, dir) => {
        val per = tPar(s, dir, "documents")
          .select(col("source"),
            size(TextStats.tokens(col("text"))).cast("long").as("tk"))
          .groupBy("source").agg(sum("tk").as("c"))
        per.agg(count(lit(1)).as("n_sources"),
            sum("c").as("total_tokens"),
            sum(col("c").cast("decimal(38,0)") *
              col("c").cast("decimal(38,0)")).as("scc"))
          .select(col("n_sources"), col("total_tokens"),
            (col("scc").cast("double") /
              (col("total_tokens").cast("decimal(38,0)") *
                col("total_tokens").cast("decimal(38,0)"))
                .cast("double")).as("hhi"),
            ((col("scc").cast("double") /
              (col("total_tokens").cast("decimal(38,0)") *
                col("total_tokens").cast("decimal(38,0)"))
                .cast("double") -
              lit(1.0) / col("n_sources")) /
              (lit(1.0) - lit(1.0) / col("n_sources")))
              .as("hhi_normalized"))
      },
      Some(s"""WITH per AS (SELECT source,
            CAST(SUM(len($dTok)) AS BIGINT) AS c
          FROM documents GROUP BY source),
        agg AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_sources,
            CAST(SUM(c) AS BIGINT) AS total_tokens,
            SUM(CAST(c AS HUGEINT) * c) AS scc
          FROM per)
        SELECT n_sources, total_tokens,
          CAST(scc AS DOUBLE)
            / CAST(CAST(total_tokens AS HUGEINT) * total_tokens
                AS DOUBLE) AS hhi,
          (CAST(scc AS DOUBLE)
            / CAST(CAST(total_tokens AS HUGEINT) * total_tokens
                AS DOUBLE) - 1.0 / n_sources)
            / (1.0 - 1.0 / n_sources) AS hhi_normalized
        FROM agg""")),

    // ── Flesch readability per source (q320) ───────────────────────────
    // The classic quality heuristic the Gopher-rule report (q234)
    // omits: 206.835 − 1.015·(W/S) − 84.6·(Y/W) with words = tokens,
    // sentences = [.!?]+ runs (floored at 1), syllables ≈ vowel-group
    // runs — all three are regexp COUNTS (identical simple regex
    // class on both engines, no ln anywhere), each doc's score is a
    // literal-coefficient double chain, and the per-source mean rides
    // the decimal rail. Pure map-side + one aggregate.
    QueryDef("q320_readability",
      (s, dir) => {
        val d = tPar(s, dir, "documents").select(
          col("source"),
          size(TextStats.tokens(col("text"))).cast("long").as("w"),
          greatest(regexp_count(col("text"), lit("[.!?]+")), lit(1))
            .cast("long").as("st"),
          regexp_count(lower(col("text")), lit("[aeiouy]+"))
            .cast("long").as("sy"))
          .filter(col("w") > 0)
        d.select(col("source"), col("w"),
            (lit(206.835) -
              lit(1.015) * col("w").cast("double") / col("st") -
              lit(84.6) * col("sy").cast("double") / col("w"))
              .as("flesch"))
          .groupBy("source")
          .agg(count(lit(1)).as("n_docs"),
            davg(col("w").cast("double")).as("avg_words"),
            davg(col("flesch")).as("avg_flesch"))
          .orderBy("source")
      },
      Some(s"""WITH d AS (SELECT source,
            CAST(len($dTok) AS BIGINT) AS w,
            CAST(greatest(len(regexp_extract_all(text, '[.!?]+')), 1)
              AS BIGINT) AS st,
            CAST(len(regexp_extract_all(lower(text), '[aeiouy]+'))
              AS BIGINT) AS sy
          FROM documents),
        f AS (SELECT source, w,
            206.835 - 1.015 * CAST(w AS DOUBLE) / st
              - 84.6 * CAST(sy AS DOUBLE) / w AS flesch
          FROM d WHERE w > 0)
        SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,
          ${dsumSql("CAST(w AS DOUBLE)")} / COUNT(*) AS avg_words,
          ${dsumSql("flesch")} / COUNT(*) AS avg_flesch
        FROM f GROUP BY source ORDER BY source""")),

    // ── Partial correlation: purchases vs clicks, given views (q321) ───
    // The confounder-adjusted companion of the Pearson machinery
    // (q148/q228): r_xy·z = (r_xy − r_xz·r_yz)/√((1−r_xz²)(1−r_yz²))
    // answers "do purchases and clicks co-move beyond what overall
    // traffic explains?". Daily volumes are exact integer COUNTs, so
    // all ten moment sums (Σx, Σx², Σxy, …) are exact longs from ONE
    // bounded day-grid aggregate; each pairwise r takes one
    // literal-mirrored double chain (sqrt per factor keeps every
    // intermediate inside long range). Map-side partials all the way —
    // no window, no self-join.
    QueryDef("q321_partial_correlation",
      (s, dir) => {
        val d = t(s, dir, "events")
          .groupBy(to_date(col("ts")).as("day"))
          .agg(
            sum(when(col("event_type") === "purchase", 1L).otherwise(0L))
              .as("x"),
            sum(when(col("event_type") === "click", 1L).otherwise(0L))
              .as("y"),
            sum(when(col("event_type") === "view", 1L).otherwise(0L))
              .as("z"))
        val m = d.agg(count(lit(1)).as("n"),
          sum("x").as("sx"), sum("y").as("sy"), sum("z").as("sz"),
          sum(col("x") * col("x")).as("sxx"),
          sum(col("y") * col("y")).as("syy"),
          sum(col("z") * col("z")).as("szz"),
          sum(col("x") * col("y")).as("sxy"),
          sum(col("x") * col("z")).as("sxz"),
          sum(col("y") * col("z")).as("syz"))
        def r(sab: Column, sa: Column, sb: Column,
              saa: Column, sbb: Column, n: Column): Column =
          (n * sab - sa * sb).cast("double") /
            (sqrt((n * saa - sa * sa).cast("double")) *
              sqrt((n * sbb - sb * sb).cast("double")))
        val rxy = r(col("sxy"), col("sx"), col("sy"),
          col("sxx"), col("syy"), col("n"))
        val rxz = r(col("sxz"), col("sx"), col("sz"),
          col("sxx"), col("szz"), col("n"))
        val ryz = r(col("syz"), col("sy"), col("sz"),
          col("syy"), col("szz"), col("n"))
        m.select(col("n").as("n_days"), rxy.as("r_xy"), rxz.as("r_xz"),
          ryz.as("r_yz"),
          ((rxy - rxz * ryz) /
            sqrt((lit(1.0) - rxz * rxz) * (lit(1.0) - ryz * ryz)))
            .as("r_xy_given_z"))
      },
      Some("""WITH d AS (SELECT CAST(ts AS DATE) AS day,
            CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
              AS BIGINT) AS x,
            CAST(SUM(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END)
              AS BIGINT) AS y,
            CAST(SUM(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END)
              AS BIGINT) AS z
          FROM events GROUP BY 1),
        m AS (SELECT CAST(COUNT(*) AS BIGINT) AS n,
            CAST(SUM(x) AS BIGINT) AS sx, CAST(SUM(y) AS BIGINT) AS sy,
            CAST(SUM(z) AS BIGINT) AS sz,
            CAST(SUM(x * x) AS BIGINT) AS sxx,
            CAST(SUM(y * y) AS BIGINT) AS syy,
            CAST(SUM(z * z) AS BIGINT) AS szz,
            CAST(SUM(x * y) AS BIGINT) AS sxy,
            CAST(SUM(x * z) AS BIGINT) AS sxz,
            CAST(SUM(y * z) AS BIGINT) AS syz
          FROM d),
        c AS (SELECT n,
            CAST(n * sxy - sx * sy AS DOUBLE) /
              (sqrt(CAST(n * sxx - sx * sx AS DOUBLE)) *
                sqrt(CAST(n * syy - sy * sy AS DOUBLE))) AS r_xy,
            CAST(n * sxz - sx * sz AS DOUBLE) /
              (sqrt(CAST(n * sxx - sx * sx AS DOUBLE)) *
                sqrt(CAST(n * szz - sz * sz AS DOUBLE))) AS r_xz,
            CAST(n * syz - sy * sz AS DOUBLE) /
              (sqrt(CAST(n * syy - sy * sy AS DOUBLE)) *
                sqrt(CAST(n * szz - sz * sz AS DOUBLE))) AS r_yz
          FROM m)
        SELECT n AS n_days, r_xy, r_xz, r_yz,
          (r_xy - r_xz * r_yz) /
            sqrt((1.0 - r_xz * r_xz) * (1.0 - r_yz * r_yz))
            AS r_xy_given_z
        FROM c""")),

    // ── Cochran–Armitage trend test: finish rate vs priority (q322) ────
    // Does order completion trend monotonically across the ORDERED
    // priority ladder? The dose-response test the pairwise χ² (q232
    // family) can't ask. Scores w = the priority's leading digit; the
    // statistic Z² = N·(N·Σwr − R·Σw)² / (R(N−R)(N·Σw² − (Σw)²)) is
    // assembled from five map-side integer sums; the square rides
    // decimal(38,0)/HUGEINT (N·Σwr ≈ 10¹⁰ at sf1.0 and its square
    // overflows BIGINT long before 100 TB). One scan, one 1-row agg.
    QueryDef("q322_cochran_armitage",
      (s, dir) => {
        val o = t(s, dir, "orders").select(
          substring(col("o_orderpriority"), 1, 1).cast("long").as("w"),
          when(col("o_orderstatus") === "F", 1L).otherwise(0L).as("r"))
        o.agg(count(lit(1)).as("n"), sum("r").as("rr"),
            sum(col("w") * col("r")).as("swr"), sum("w").as("sw"),
            sum(col("w") * col("w")).as("sw2"))
          .withColumn("num",
            (col("n") * col("swr") - col("rr") * col("sw"))
              .cast("decimal(38,0)"))
          .select(col("n").as("n_orders"), col("rr").as("n_finished"),
            signum((col("n") * col("swr") - col("rr") * col("sw"))
              .cast("double")).cast("long").as("trend_sign"),
            ((col("n").cast("decimal(38,0)") * col("num") * col("num"))
              .cast("double") /
              ((col("rr") * (col("n") - col("rr"))).cast("decimal(38,0)") *
                (col("n") * col("sw2") - col("sw") * col("sw"))
                  .cast("decimal(38,0)")).cast("double")).as("ca_z2"))
      },
      Some("""WITH o AS (SELECT
            CAST(substr(o_orderpriority, 1, 1) AS BIGINT) AS w,
            CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END AS r
          FROM orders),
        a AS (SELECT CAST(COUNT(*) AS BIGINT) AS n,
            CAST(SUM(r) AS BIGINT) AS rr,
            CAST(SUM(w * r) AS BIGINT) AS swr,
            CAST(SUM(w) AS BIGINT) AS sw,
            CAST(SUM(w * w) AS BIGINT) AS sw2
          FROM o)
        SELECT n AS n_orders, rr AS n_finished,
          CAST(sign(CAST(n * swr - rr * sw AS DOUBLE)) AS BIGINT)
            AS trend_sign,
          CAST(CAST(n AS HUGEINT) * (n * swr - rr * sw)
              * (n * swr - rr * sw) AS DOUBLE) /
            CAST(CAST(rr * (n - rr) AS HUGEINT)
              * (n * sw2 - sw * sw) AS DOUBLE) AS ca_z2
        FROM a""")),

    // ── Atkinson inequality index (ε = 2) of customer spend (q323) ─────
    // The welfare-weighted companion to Gini (q165) / Hoover (q293) /
    // HHI (q319): A₂ = 1 − harmonic-mean/mean needs NO logarithm —
    // exactly the log-free discipline q307 set. Per-customer spend is a
    // decimal-railed SUM; its reciprocal (scaled ×10⁶ so the rail's
    // 1e-8 quantum sits ≪ every term) rides the same rail, so both
    // engines sum identical quantized values in any order. Two
    // aggregations, both with map-side partials — no sort, no window.
    QueryDef("q323_atkinson",
      (s, dir) => {
        val sp = t(s, dir, "orders").groupBy("o_custkey")
          .agg(dsum(col("o_totalprice")).as("spend"))
        sp.select(col("spend"), (lit(1.0e6) / col("spend")).as("inv"))
          .agg(count(lit(1)).as("n"), dsum(col("spend")).as("stot"),
            dsum(col("inv")).as("sinv"))
          .select(col("n").as("n_customers"),
            (col("stot") / col("n")).as("mean_spend"),
            (col("n").cast("double") * lit(1.0e6) / col("sinv"))
              .as("harmonic_mean_spend"),
            (lit(1.0) -
              (col("n").cast("double") * lit(1.0e6) / col("sinv")) /
                (col("stot") / col("n"))).as("atkinson2"))
      },
      Some(s"""WITH sp AS (SELECT o_custkey,
            ${dsumSql("o_totalprice")} AS spend
          FROM orders GROUP BY 1),
        i AS (SELECT spend, 1000000.0 / spend AS inv FROM sp),
        a AS (SELECT CAST(COUNT(*) AS BIGINT) AS n,
            ${dsumSql("spend")} AS stot, ${dsumSql("inv")} AS sinv
          FROM i)
        SELECT n AS n_customers, stot / n AS mean_spend,
          CAST(n AS DOUBLE) * 1000000.0 / sinv AS harmonic_mean_spend,
          1.0 - (CAST(n AS DOUBLE) * 1000000.0 / sinv) / (stot / n)
            AS atkinson2
        FROM a""")),

    // ── Lorenz curve deciles of customer spend (q324) ──────────────────
    // The curve BEHIND the q165 Gini scalar: per spend-decile customer
    // count, decile mass and cumulative share — what a mix report
    // actually plots. Spend rides INTEGER micro-units (floor ×1e6, the
    // q151 quantization) end to end: sums and cumulative sums are exact
    // BIGINTs and each output takes ONE correctly-rounded int→double
    // conversion. (A DECIMAL(38,8) rail here is NOT portable: DuckDB
    // casts scaled decimals to double via hugeint→double then /1e8 —
    // two roundings — and diverges from Spark's correctly-rounded
    // BigDecimal path once the unscaled value passes 2^53.) ntile(10)
    // over the (units, custkey) total order is deterministic under
    // ties; the global ntile ranks the bounded CUSTOMER dimension — at
    // warehouse scale the same report comes from a two-pass
    // quantile-boundary split (SCALE.md).
    QueryDef("q324_lorenz_deciles",
      (s, dir) => {
        val sp = t(s, dir, "orders").groupBy("o_custkey")
          .agg(sum(floor(col("o_totalprice") * lit(1.0e6)).cast("long"))
            .as("units"))
        val d = sp.withColumn("decile",
          ntile(10).over(boundedWindow(col("units"), col("o_custkey")))
            .cast("long"))
        val g = d.groupBy("decile")
          .agg(count(lit(1)).as("n_customers"), sum("units").as("du"))
        val wc = boundedWindow("decile")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        val wt = boundedWindow("decile")
          .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
        g.select(col("decile"), col("n_customers"),
            (col("du").cast("double") / lit(1.0e6)).as("decile_spend"),
            (sum("du").over(wc).cast("double") /
              sum("du").over(wt).cast("double")).as("cum_share"))
          .orderBy("decile")
      },
      Some("""WITH sp AS (SELECT o_custkey,
            CAST(SUM(CAST(floor(o_totalprice * 1000000.0) AS BIGINT))
              AS BIGINT) AS units
          FROM orders GROUP BY 1),
        d AS (SELECT units, NTILE(10) OVER (ORDER BY units, o_custkey)
            AS decile FROM sp),
        g AS (SELECT CAST(decile AS BIGINT) AS decile,
            CAST(COUNT(*) AS BIGINT) AS n_customers,
            CAST(SUM(units) AS BIGINT) AS du
          FROM d GROUP BY 1)
        SELECT decile, n_customers,
          CAST(du AS DOUBLE) / 1000000.0 AS decile_spend,
          CAST(SUM(du) OVER (ORDER BY decile
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE)
            / CAST(SUM(du) OVER () AS DOUBLE) AS cum_share
        FROM g ORDER BY decile""")),

    // ── Inclusion-dependency discovery (FK-candidate audit) (q325) ─────
    // Schema archaeology for an inherited lake: for each candidate
    // (child ⊆ parent) column pair, the distinct-value containment
    // fraction and an exact-IND flag. Each probe is one distinct on the
    // child + a BROADCAST left join against the distinct parent (all
    // parents here are key/dimension columns); candidates that fail
    // loudly (p_size ⊆ n_nationkey) prove the audit discriminates. At
    // 100 TB the exact distinct swaps for a bloom-gated two-pass check
    // per SCALE.md — the report shape is unchanged.
    QueryDef("q325_ind_discovery",
      (s, dir) => {
        def probe(child: DataFrame, cc: String, parent: DataFrame,
                  pc: String, label: String): DataFrame = {
          val cd = child.select(col(cc).cast("long").as("v")).distinct()
          val pd = parent.select(col(pc).cast("long").as("v")).distinct()
            .withColumn("hit", lit(1L))
          cd.join(broadcast(pd), Seq("v"), "left")
            .agg(count(lit(1)).as("n_child_distinct"),
              sum(when(col("hit").isNotNull, 1L).otherwise(0L))
                .as("n_contained"))
            .select(lit(label).as("candidate"), col("n_child_distinct"),
              col("n_contained"))
        }
        val li = t(s, dir, "lineitem"); val or = t(s, dir, "orders")
        val pa = t(s, dir, "part"); val su = t(s, dir, "supplier")
        val cu = t(s, dir, "customer"); val ev = t(s, dir, "events")
        val na = t(s, dir, "nation")
        probe(li, "l_orderkey", or, "o_orderkey",
            "lineitem.l_orderkey IN orders.o_orderkey")
          .unionAll(probe(li, "l_partkey", pa, "p_partkey",
            "lineitem.l_partkey IN part.p_partkey"))
          .unionAll(probe(li, "l_suppkey", su, "s_suppkey",
            "lineitem.l_suppkey IN supplier.s_suppkey"))
          .unionAll(probe(or, "o_custkey", cu, "c_custkey",
            "orders.o_custkey IN customer.c_custkey"))
          .unionAll(probe(cu, "c_custkey", or, "o_custkey",
            "customer.c_custkey IN orders.o_custkey"))
          .unionAll(probe(ev, "user_id", cu, "c_custkey",
            "events.user_id IN customer.c_custkey"))
          .unionAll(probe(pa, "p_size", na, "n_nationkey",
            "part.p_size IN nation.n_nationkey"))
          .select(col("candidate"), col("n_child_distinct"),
            col("n_contained"),
            (col("n_contained").cast("double") /
              col("n_child_distinct").cast("double")).as("containment"),
            (col("n_contained") === col("n_child_distinct")).as("is_ind"))
          .orderBy("candidate")
      },
      Some("""WITH probes AS (
          SELECT 'lineitem.l_orderkey IN orders.o_orderkey' AS candidate,
            CAST(COUNT(*) AS BIGINT) AS n_child_distinct,
            CAST(COUNT(p.v) AS BIGINT) AS n_contained
          FROM (SELECT DISTINCT CAST(l_orderkey AS BIGINT) AS v
                FROM lineitem) c
          LEFT JOIN (SELECT DISTINCT CAST(o_orderkey AS BIGINT) AS v
                FROM orders) p ON c.v = p.v
          UNION ALL
          SELECT 'lineitem.l_partkey IN part.p_partkey',
            CAST(COUNT(*) AS BIGINT), CAST(COUNT(p.v) AS BIGINT)
          FROM (SELECT DISTINCT CAST(l_partkey AS BIGINT) AS v
                FROM lineitem) c
          LEFT JOIN (SELECT DISTINCT CAST(p_partkey AS BIGINT) AS v
                FROM part) p ON c.v = p.v
          UNION ALL
          SELECT 'lineitem.l_suppkey IN supplier.s_suppkey',
            CAST(COUNT(*) AS BIGINT), CAST(COUNT(p.v) AS BIGINT)
          FROM (SELECT DISTINCT CAST(l_suppkey AS BIGINT) AS v
                FROM lineitem) c
          LEFT JOIN (SELECT DISTINCT CAST(s_suppkey AS BIGINT) AS v
                FROM supplier) p ON c.v = p.v
          UNION ALL
          SELECT 'orders.o_custkey IN customer.c_custkey',
            CAST(COUNT(*) AS BIGINT), CAST(COUNT(p.v) AS BIGINT)
          FROM (SELECT DISTINCT CAST(o_custkey AS BIGINT) AS v
                FROM orders) c
          LEFT JOIN (SELECT DISTINCT CAST(c_custkey AS BIGINT) AS v
                FROM customer) p ON c.v = p.v
          UNION ALL
          SELECT 'customer.c_custkey IN orders.o_custkey',
            CAST(COUNT(*) AS BIGINT), CAST(COUNT(p.v) AS BIGINT)
          FROM (SELECT DISTINCT CAST(c_custkey AS BIGINT) AS v
                FROM customer) c
          LEFT JOIN (SELECT DISTINCT CAST(o_custkey AS BIGINT) AS v
                FROM orders) p ON c.v = p.v
          UNION ALL
          SELECT 'events.user_id IN customer.c_custkey',
            CAST(COUNT(*) AS BIGINT), CAST(COUNT(p.v) AS BIGINT)
          FROM (SELECT DISTINCT CAST(user_id AS BIGINT) AS v
                FROM events) c
          LEFT JOIN (SELECT DISTINCT CAST(c_custkey AS BIGINT) AS v
                FROM customer) p ON c.v = p.v
          UNION ALL
          SELECT 'part.p_size IN nation.n_nationkey',
            CAST(COUNT(*) AS BIGINT), CAST(COUNT(p.v) AS BIGINT)
          FROM (SELECT DISTINCT CAST(p_size AS BIGINT) AS v FROM part) c
          LEFT JOIN (SELECT DISTINCT CAST(n_nationkey AS BIGINT) AS v
                FROM nation) p ON c.v = p.v)
        SELECT candidate, n_child_distinct, n_contained,
          CAST(n_contained AS DOUBLE) / CAST(n_child_distinct AS DOUBLE)
            AS containment,
          n_contained = n_child_distinct AS is_ind
        FROM probes ORDER BY candidate""")),

    // ── Hosmer–Lemeshow calibration test (q326) ────────────────────────
    // The TEST STATISTIC behind the q208 reliability table: decile bins
    // of the deterministic 999-bucket predicted score, per-bin observed
    // positives O vs expected E = Σm/999, and
    // HL = Σ (O−E)² / (E·(1−Σm/(999n))). Every per-bin input is an
    // exact integer (O, Σm, n) — the double chain is literal-mirrored
    // so both engines round identically. Bin key is integer floor-div
    // (m·10 div 999): no quantile pass, one scan, a 10-key aggregate.
    QueryDef("q326_hosmer_lemeshow",
      (s, dir) => {
        val d = tPar(s, dir, "documents").select(
          (Shingles.baseHash(col("text")) % 999).as("m"),
          when(TextStats.qualityScore(col("text"), stopwords) >= 0.5,
            1L).otherwise(0L).as("y"))
        val b = d.groupBy(expr("m * 10 div 999").as("bin"))
          .agg(count(lit(1)).as("n"), sum("y").as("o"), sum("m").as("em"))
          .filter(col("em") > 0 && col("em") < lit(999) * col("n"))
        b.select(col("n"), col("o"), col("em"),
            ((col("o").cast("double") - col("em").cast("double") / 999.0) *
              (col("o").cast("double") - col("em").cast("double") / 999.0) /
              ((col("em").cast("double") / 999.0) *
                (lit(1.0) - col("em").cast("double") /
                  (lit(999.0) * col("n"))))).as("contrib"))
          .agg(sum("n").as("n_scored"), count(lit(1)).as("n_bins"),
            dsum(col("contrib")).as("hl_stat"))
      },
      Some(s"""WITH d AS (SELECT
            ('0x' || substr(md5(text), 1, 7))::BIGINT % 999 AS m,
            CASE WHEN $dQualityExpr >= 0.5 THEN 1 ELSE 0 END AS y
          FROM documents),
        b AS (SELECT m * 10 // 999 AS bin,
            CAST(COUNT(*) AS BIGINT) AS n, CAST(SUM(y) AS BIGINT) AS o,
            CAST(SUM(m) AS BIGINT) AS em
          FROM d GROUP BY 1
          HAVING SUM(m) > 0 AND SUM(m) < 999 * COUNT(*)),
        c AS (SELECT n, o, em,
            (CAST(o AS DOUBLE) - CAST(em AS DOUBLE) / 999.0) *
              (CAST(o AS DOUBLE) - CAST(em AS DOUBLE) / 999.0) /
              ((CAST(em AS DOUBLE) / 999.0) *
                (1.0 - CAST(em AS DOUBLE) / (999.0 * n))) AS contrib
          FROM b)
        SELECT CAST(SUM(n) AS BIGINT) AS n_scored,
          CAST(COUNT(*) AS BIGINT) AS n_bins,
          ${dsumSql("contrib")} AS hl_stat
        FROM c""")),

    // ── Modularity of the source partition on the near-dup graph (q327)
    // Does duplication structure ALIGN with sources? Newman modularity
    // of the `source` grouping over the exact shingle-Jaccard pair
    // graph (the q28 edge set): per source c, Q_c = e_c/m − (d_c/2m)²
    // from three exact integer aggregates (intra-edge count, endpoint
    // degree mass, edge total); ΣQ_c near 0 ⇒ near-dups ignore source
    // boundaries (cross-source contamination, the q242 signal), high ⇒
    // duplication is source-local. The only full-data pass is the pair
    // generator; everything after lives on the pair table and a
    // source-cardinality-bounded aggregate.
    QueryDef("q327_dedup_modularity",
      (s, dir) => {
        val docs = tPar(s, dir, "documents")
        val src = docs.select(col("doc_id"), col("source"))
        // scale-safe q28 plan (prefix-filtered; naive index is
        // superlinear at sf3 — see q28's routing note)
        val e = Dedup.prefixFilterJaccardPairs(docs, "doc_id", "text",
            shingleK, ppjTNum, ppjTDen)
          .join(src.select(col("doc_id").as("id_a"),
            col("source").as("sa")), Seq("id_a"))
          .join(src.select(col("doc_id").as("id_b"),
            col("source").as("sb")), Seq("id_b"))
          .select("sa", "sb").localCheckpoint()
        val m = e.agg(count(lit(1)).as("m"))
        val intra = e.filter(col("sa") === col("sb"))
          .groupBy(col("sa").as("source"))
          .agg(count(lit(1)).as("intra_edges"))
        val degs = e.select(col("sa").as("source"))
          .unionAll(e.select(col("sb").as("source")))
          .groupBy("source").agg(count(lit(1)).as("degree_sum"))
        val nd = docs.groupBy("source").agg(count(lit(1)).as("n_docs"))
        nd.join(intra, Seq("source"), "left")
          .join(degs, Seq("source"), "left")
          .crossJoin(broadcast(m))
          .select(col("source"), col("n_docs"),
            coalesce(col("intra_edges"), lit(0L)).as("intra_edges"),
            coalesce(col("degree_sum"), lit(0L)).as("degree_sum"),
            (coalesce(col("intra_edges"), lit(0L)).cast("double") /
              col("m").cast("double") -
              (coalesce(col("degree_sum"), lit(0L)).cast("double") /
                (lit(2.0) * col("m").cast("double"))) *
              (coalesce(col("degree_sum"), lit(0L)).cast("double") /
                (lit(2.0) * col("m").cast("double"))))
              .as("modularity_term"))
          .orderBy("source")
      },
      Some(s"""WITH sh AS (SELECT doc_id, unnest(list_distinct(
            ${dShingles(dTok, shingleK)})) AS shingle FROM documents),
        sz AS (SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY doc_id),
        p AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS shared
          FROM sh a JOIN sh b USING (shingle)
          WHERE a.doc_id < b.doc_id GROUP BY 1, 2),
        e AS (SELECT da.source AS sa, db.source AS sb
          FROM p JOIN sz x ON p.id_a = x.doc_id
            JOIN sz y ON p.id_b = y.doc_id
            JOIN documents da ON p.id_a = da.doc_id
            JOIN documents db ON p.id_b = db.doc_id
          WHERE CAST(shared AS DOUBLE) / CAST(x.n + y.n - shared AS DOUBLE)
            >= $jaccardMin),
        m AS (SELECT CAST(COUNT(*) AS BIGINT) AS m FROM e),
        intra AS (SELECT sa AS source,
            CAST(COUNT(*) AS BIGINT) AS intra_edges
          FROM e WHERE sa = sb GROUP BY 1),
        degs AS (SELECT source, CAST(COUNT(*) AS BIGINT) AS degree_sum
          FROM (SELECT sa AS source FROM e
                UNION ALL SELECT sb FROM e) GROUP BY 1),
        nd AS (SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs
          FROM documents GROUP BY source)
        SELECT nd.source, nd.n_docs,
          COALESCE(intra.intra_edges, 0) AS intra_edges,
          COALESCE(degs.degree_sum, 0) AS degree_sum,
          CAST(COALESCE(intra.intra_edges, 0) AS DOUBLE)
              / CAST(m.m AS DOUBLE) -
            (CAST(COALESCE(degs.degree_sum, 0) AS DOUBLE)
              / (2.0 * CAST(m.m AS DOUBLE))) *
            (CAST(COALESCE(degs.degree_sum, 0) AS DOUBLE)
              / (2.0 * CAST(m.m AS DOUBLE))) AS modularity_term
        FROM nd LEFT JOIN intra ON nd.source = intra.source
          LEFT JOIN degs ON nd.source = degs.source
          CROSS JOIN m
        ORDER BY nd.source""")),

    // ── Link prediction on the token co-occurrence graph (q328) ────────
    // "Which vocabulary pairs SHOULD co-occur but don't yet?" — the
    // graph-completion twin of the q118/q110 centrality stack, on the
    // STRONG-edge graph (relative support > linkSupNum/linkSupDen of
    // all docs; the raw graph is complete, and an absolute floor would
    // not port across corpus sizes): for every two-hop non-edge,
    // common-neighbour count, neighbourhood Jaccard and preferential
    // attachment, top-20 by (cn, a, b). All post-scan work is
    // vocab²-bounded and broadcast (Search.linkPrediction); scores are
    // exact integers + one mirrored division.
    QueryDef("q328_link_prediction",
      (s, dir) => graft.ext.Search.linkPrediction(
        tPar(s, dir, "documents"), "doc_id", "text", trVocab,
        linkSupNum, linkSupDen, 20),
      Some(s"""WITH dt AS (SELECT DISTINCT doc_id, tok AS token
            FROM (SELECT doc_id, unnest($dTok) AS tok FROM documents)),
        ndt AS (SELECT CAST(COUNT(*) AS BIGINT) AS nd FROM documents),
        v AS (SELECT token FROM (SELECT token, COUNT(*) AS df FROM dt
          GROUP BY 1 ORDER BY df DESC, token LIMIT $trVocab)),
        vt AS (SELECT dt.doc_id, dt.token FROM dt JOIN v USING (token)),
        co AS (SELECT a.token AS src, b.token AS dst,
            CAST(COUNT(*) AS BIGINT) AS c
          FROM vt a JOIN vt b
            ON a.doc_id = b.doc_id AND a.token < b.token
          GROUP BY 1, 2),
        half AS (SELECT src, dst FROM co, ndt
          WHERE c * $linkSupDen > $linkSupNum * nd),
        nb AS (SELECT src, dst FROM half
          UNION ALL SELECT dst, src FROM half),
        deg AS (SELECT src, CAST(COUNT(*) AS BIGINT) AS deg
          FROM nb GROUP BY 1),
        cn AS (SELECT x.src AS a, y.src AS b,
            CAST(COUNT(*) AS BIGINT) AS cn
          FROM nb x JOIN nb y ON x.dst = y.dst AND x.src < y.src
          GROUP BY 1, 2),
        cand AS (SELECT cn.* FROM cn
          LEFT JOIN half h ON cn.a = h.src AND cn.b = h.dst
          WHERE h.src IS NULL)
        SELECT a, b, cn,
          CAST(cn AS DOUBLE) / CAST(da.deg + db.deg - cn AS DOUBLE)
            AS nb_jaccard,
          da.deg * db.deg AS pref_attach
        FROM cand JOIN deg da ON cand.a = da.src
          JOIN deg db ON cand.b = db.src
        ORDER BY cn DESC, a, b LIMIT 20""")),

    // ── Best Gini-impurity split of a feature vs label (q329) ──────────
    // The decision-stump primitive behind feature-importance audits
    // (and the log-free sibling of information gain): bucket the first
    // embedding coordinate on the integer 1/100 grid, build per-label
    // cumulative counts over the bounded (bucket × label) DENSE grid,
    // and score every candidate threshold with weighted Gini
    // (n − Σcl²/nl − Σcr²/nr)/n — all-integer inputs, one mirrored
    // double chain, argmin with deterministic (impurity, bucket)
    // tie-break. One scan; everything downstream is grid-bounded. At
    // petabyte label counts the cum² products move to decimal(38,0).
    QueryDef("q329_gini_split",
      (s, dir) => {
        val e = tPar(s, dir, "embeddings").select(
          floor(element_at(col("embedding"), 1).cast("double") *
            lit(100.0)).cast("long").as("b"),
          col("label").cast("long").as("lab"))
        val c = e.groupBy("b", "lab").agg(count(lit(1)).as("c"))
          .localCheckpoint()
        val dense = c.select("b").distinct()
          .crossJoin(c.select("lab").distinct())
          .join(c, Seq("b", "lab"), "left")
          .select(col("b"), col("lab"),
            coalesce(col("c"), lit(0L)).as("c"))
        val cum = dense.withColumn("cum",
          sum("c").over(Window.partitionBy("lab").orderBy("b")))
        val tot = c.groupBy("lab").agg(sum("c").as("tot"))
        val per = cum.join(broadcast(tot), Seq("lab"))
          .groupBy("b")
          .agg(sum("cum").as("nl"),
            sum(col("cum") * col("cum")).as("sl2"),
            sum((col("tot") - col("cum")) * (col("tot") - col("cum")))
              .as("sr2"))
        val stats = tot.agg(sum("tot").as("n"),
          sum(col("tot") * col("tot")).as("st2"))
        per.crossJoin(broadcast(stats))
          .filter(col("nl") > 0 && col("nl") < col("n"))
          .select(col("b").as("split_bucket"), col("nl").as("n_left"),
            (col("n") - col("nl")).as("n_right"),
            ((col("n").cast("double") -
              col("sl2").cast("double") / col("nl").cast("double") -
              col("sr2").cast("double") /
                (col("n") - col("nl")).cast("double")) /
              col("n").cast("double")).as("gini_split"),
            (lit(1.0) - col("st2").cast("double") /
              (col("n").cast("double") * col("n").cast("double")))
              .as("gini_root"))
          .withColumn("gini_gain", col("gini_root") - col("gini_split"))
          .orderBy(col("gini_split"), col("split_bucket"))
          .limit(1)
      },
      Some("""WITH e AS (SELECT
            CAST(floor(CAST(embedding[1] AS DOUBLE) * 100.0) AS BIGINT)
              AS b,
            CAST(label AS BIGINT) AS lab
          FROM embeddings),
        c AS (SELECT b, lab, CAST(COUNT(*) AS BIGINT) AS c
          FROM e GROUP BY 1, 2),
        dense AS (SELECT g.b, g.lab, COALESCE(c.c, 0) AS c
          FROM (SELECT DISTINCT x.b, y.lab
                FROM (SELECT DISTINCT b FROM c) x,
                  (SELECT DISTINCT lab FROM c) y) g
          LEFT JOIN c ON g.b = c.b AND g.lab = c.lab),
        cum AS (SELECT b, lab, c,
            SUM(c) OVER (PARTITION BY lab ORDER BY b) AS cum
          FROM dense),
        tot AS (SELECT lab, CAST(SUM(c) AS BIGINT) AS tot
          FROM c GROUP BY 1),
        per AS (SELECT b, CAST(SUM(cum) AS BIGINT) AS nl,
            CAST(SUM(cum * cum) AS BIGINT) AS sl2,
            CAST(SUM((tot - cum) * (tot - cum)) AS BIGINT) AS sr2
          FROM cum JOIN tot USING (lab) GROUP BY b),
        stats AS (SELECT CAST(SUM(tot) AS BIGINT) AS n,
            CAST(SUM(tot * tot) AS BIGINT) AS st2 FROM tot)
        SELECT b AS split_bucket, nl AS n_left, n - nl AS n_right,
          (CAST(n AS DOUBLE) - CAST(sl2 AS DOUBLE) / CAST(nl AS DOUBLE)
            - CAST(sr2 AS DOUBLE) / CAST(n - nl AS DOUBLE))
            / CAST(n AS DOUBLE) AS gini_split,
          1.0 - CAST(st2 AS DOUBLE)
            / (CAST(n AS DOUBLE) * CAST(n AS DOUBLE)) AS gini_root,
          (1.0 - CAST(st2 AS DOUBLE)
            / (CAST(n AS DOUBLE) * CAST(n AS DOUBLE))) -
          ((CAST(n AS DOUBLE) - CAST(sl2 AS DOUBLE) / CAST(nl AS DOUBLE)
            - CAST(sr2 AS DOUBLE) / CAST(n - nl AS DOUBLE))
            / CAST(n AS DOUBLE)) AS gini_gain
        FROM per CROSS JOIN stats
        WHERE nl > 0 AND nl < n
        ORDER BY gini_split, split_bucket LIMIT 1""")),

    // ── Croston intermittent-demand forecast per user (q330) ───────────
    // Purchase demand is INTERMITTENT (most user-days are zero), where
    // a plain moving average chases zeros; Croston's method maintains
    // two α=½ EWMAs — nonzero demand SIZE and inter-demand INTERVAL —
    // and forecasts their ratio. Both recursions unroll to the q155
    // power-of-two closed form (weights 2^(rn−n−1), seed row doubled;
    // per-term floor ×1e8 makes the sums order-independent), so the
    // whole method is two window passes over the per-user demand-day
    // table + one aggregate. User-partitioned shuffles only.
    QueryDef("q330_croston",
      (s, dir) => {
        val dem = t(s, dir, "events")
          .filter(col("event_type") === "purchase")
          .groupBy(col("user_id"),
            expr("unix_micros(ts) div 86400000000").as("day"))
          .agg(count(lit(1)).as("z"))
        val w = Window.partitionBy("user_id").orderBy("day")
        val r = dem
          .withColumn("rn", row_number().over(w).cast("long"))
          .withColumn("n",
            count(lit(1)).over(Window.partitionBy("user_id"))
              .cast("long"))
          .withColumn("gap", col("day") - lag("day", 1).over(w))
        r.filter(col("n") >= 2)
          .groupBy("user_id")
          .agg(max("n").as("n_demand_days"),
            (sum(floor(col("z") *
              pow(lit(2.0), col("rn") - col("n") - lit(1) +
                when(col("rn") === 1, 1).otherwise(0)) *
              lit(1.0e8)).cast("long")).cast("double") / lit(1.0e8))
              .as("z_hat"),
            (sum(when(col("rn") >= 2,
              floor(col("gap") *
                pow(lit(2.0), col("rn") - col("n") - lit(1) +
                  when(col("rn") === 2, 1).otherwise(0)) *
                lit(1.0e8)).cast("long"))).cast("double") / lit(1.0e8))
              .as("p_hat"))
          .withColumn("demand_rate", col("z_hat") / col("p_hat"))
          .orderBy("user_id")
      },
      Some("""WITH dem AS (SELECT user_id,
            epoch_us(ts) // 86400000000 AS day,
            CAST(COUNT(*) AS BIGINT) AS z
          FROM events WHERE event_type = 'purchase' GROUP BY 1, 2),
        r AS (SELECT user_id, z,
            ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY day)
              AS rn,
            COUNT(*) OVER (PARTITION BY user_id) AS n,
            day - lag(day) OVER (PARTITION BY user_id ORDER BY day)
              AS gap
          FROM dem)
        SELECT user_id, CAST(MAX(n) AS BIGINT) AS n_demand_days,
          CAST(SUM(CAST(floor(z * pow(2.0, rn - n - 1 +
              CASE WHEN rn = 1 THEN 1 ELSE 0 END) * 100000000.0)
            AS BIGINT)) AS DOUBLE) / 100000000.0 AS z_hat,
          CAST(SUM(CASE WHEN rn >= 2 THEN
              CAST(floor(gap * pow(2.0, rn - n - 1 +
                CASE WHEN rn = 2 THEN 1 ELSE 0 END) * 100000000.0)
              AS BIGINT) END) AS DOUBLE) / 100000000.0 AS p_hat,
          (CAST(SUM(CAST(floor(z * pow(2.0, rn - n - 1 +
              CASE WHEN rn = 1 THEN 1 ELSE 0 END) * 100000000.0)
            AS BIGINT)) AS DOUBLE) / 100000000.0)
          / (CAST(SUM(CASE WHEN rn >= 2 THEN
              CAST(floor(gap * pow(2.0, rn - n - 1 +
                CASE WHEN rn = 2 THEN 1 ELSE 0 END) * 100000000.0)
              AS BIGINT) END) AS DOUBLE) / 100000000.0)
            AS demand_rate
        FROM r WHERE n >= 2 GROUP BY user_id ORDER BY user_id""")),

    // ── 10% trimmed mean of order value (q331) ─────────────────────────
    // The outlier-robust location estimate that DROPS the tails (the
    // complement of q139's winsorize, which caps them): rank orders on
    // exact integer micro-units with a deterministic (units, orderkey)
    // total order, discard floor(n/10) rows from each end, and average
    // the interior — kept sums are exact BIGINTs with one int→double
    // conversion (the q324 portability rule). The global rank is the
    // documented exact-order-statistics contract (q141); at warehouse
    // scale the two cut ranks come from a quantile-boundary pre-pass.
    QueryDef("q331_trimmed_mean",
      (s, dir) => {
        val u = t(s, dir, "orders").select(
          floor(col("o_totalprice") * lit(1.0e6)).cast("long").as("u"),
          col("o_orderkey"))
        val r = u.withColumn("rn",
          row_number().over(boundedWindow(col("u"), col("o_orderkey")))
            .cast("long"))
        val nAgg = u.agg(count(lit(1)).as("n"), sum("u").as("su_all"))
        r.crossJoin(broadcast(nAgg))
          .withColumn("k", expr("n div 10"))
          .filter(col("rn") > col("k") && col("rn") <= col("n") - col("k"))
          .agg(max("n").as("n_orders"), max("k").as("k_each_side"),
            count(lit(1)).as("n_kept"), sum("u").as("su"),
            max("su_all").as("sa"))
          .select(col("n_orders"), col("k_each_side"),
            (col("su").cast("double") / col("n_kept").cast("double") /
              lit(1.0e6)).as("trimmed_mean"),
            (col("sa").cast("double") / col("n_orders").cast("double") /
              lit(1.0e6)).as("raw_mean"))
      },
      Some("""WITH u AS (SELECT
            CAST(floor(o_totalprice * 1000000.0) AS BIGINT) AS u,
            o_orderkey
          FROM orders),
        r AS (SELECT u,
            ROW_NUMBER() OVER (ORDER BY u, o_orderkey) AS rn
          FROM u),
        n AS (SELECT CAST(COUNT(*) AS BIGINT) AS n,
            CAST(SUM(u) AS BIGINT) AS sa FROM u),
        kept AS (SELECT r.u, n.n, n.n // 10 AS k, n.sa
          FROM r CROSS JOIN n
          WHERE r.rn > n.n // 10 AND r.rn <= n.n - n.n // 10)
        SELECT MAX(n) AS n_orders, MAX(k) AS k_each_side,
          CAST(SUM(u) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE)
            / 1000000.0 AS trimmed_mean,
          CAST(MAX(sa) AS DOUBLE) / CAST(MAX(n) AS DOUBLE)
            / 1000000.0 AS raw_mean
        FROM kept""")),

    // ── Jonckheere–Terpstra ordered-alternative test (q332) ────────────
    // "Does order value SHIFT monotonically up the priority ladder?" —
    // the ordered-group companion of Mann–Whitney (q144) that a
    // pairwise χ² can't ask with one statistic. Never pairs rows:
    // values land on the bounded floor(price/1000) grid, per-group
    // cumulative counts over the DENSE (bucket × group) grid turn the
    // 2J statistic into Σ c_i·above_j (+ ties) exact-integer products
    // for the 10 ordered group pairs; mean and variance are
    // closed-form moments on decimal(38,0)/HUGEINT (n²(2n+3) nears
    // BIGINT range at sf1.0). One scan + grid-bounded joins.
    QueryDef("q332_jonckheere",
      (s, dir) => {
        val o = t(s, dir, "orders").select(
          substring(col("o_orderpriority"), 1, 1).cast("long").as("g"),
          floor(col("o_totalprice") / lit(1000.0)).cast("long").as("b"))
        val c = o.groupBy("g", "b").agg(count(lit(1)).as("c"))
          .localCheckpoint()
        val dense = c.select("b").distinct()
          .crossJoin(c.select("g").distinct())
          .join(c, Seq("g", "b"), "left")
          .select(col("g"), col("b"),
            coalesce(col("c"), lit(0L)).as("c"))
        val cum = dense.withColumn("cum",
          sum("c").over(Window.partitionBy("g").orderBy("b")))
        val tot = c.groupBy("g").agg(sum("c").as("tot"))
        val withTot = cum.join(broadcast(tot), Seq("g"))
          .select(col("g"), col("b"), col("c"),
            (col("tot") - col("cum")).as("above"))
        val terms = withTot.as("i")
          .join(broadcast(withTot).as("j"),
            col("i.b") === col("j.b") && col("i.g") < col("j.g"))
          .agg(sum(lit(2L) * col("i.c") * col("j.above") +
            col("i.c") * col("j.c")).as("j2"))
        val moments = tot.agg(sum("tot").as("n"),
          sum(col("tot") * col("tot")).as("sn2"),
          sum(col("tot").cast("decimal(38,0)") * col("tot") *
            (lit(2) * col("tot") + lit(3))).as("sn23"))
        terms.crossJoin(broadcast(moments))
          .select(col("n").as("n_orders"),
            (col("j2").cast("double") / lit(2.0)).as("j_stat"),
            ((col("n") * col("n") - col("sn2")).cast("double") / lit(4.0))
              .as("e_j"),
            (((col("n").cast("decimal(38,0)") * col("n") *
              (lit(2) * col("n") + lit(3))) - col("sn23"))
              .cast("double") / lit(72.0)).as("var_j"))
          .withColumn("z",
            (col("j_stat") - col("e_j")) / sqrt(col("var_j")))
      },
      Some("""WITH o AS (SELECT
            CAST(substr(o_orderpriority, 1, 1) AS BIGINT) AS g,
            CAST(floor(o_totalprice / 1000.0) AS BIGINT) AS b
          FROM orders),
        c AS (SELECT g, b, CAST(COUNT(*) AS BIGINT) AS c
          FROM o GROUP BY 1, 2),
        dense AS (SELECT gr.g, gr.b, COALESCE(c.c, 0) AS c
          FROM (SELECT DISTINCT x.b, y.g
                FROM (SELECT DISTINCT b FROM c) x,
                  (SELECT DISTINCT g FROM c) y) gr
          LEFT JOIN c ON gr.g = c.g AND gr.b = c.b),
        cum AS (SELECT g, b, c,
            SUM(c) OVER (PARTITION BY g ORDER BY b) AS cum
          FROM dense),
        tot AS (SELECT g, CAST(SUM(c) AS BIGINT) AS tot
          FROM c GROUP BY 1),
        wt AS (SELECT cum.g, cum.b, cum.c, tot.tot - cum.cum AS above
          FROM cum JOIN tot USING (g)),
        terms AS (SELECT CAST(SUM(2 * i.c * j.above + i.c * j.c)
            AS BIGINT) AS j2
          FROM wt i JOIN wt j ON i.b = j.b AND i.g < j.g),
        m AS (SELECT CAST(SUM(tot) AS BIGINT) AS n,
            CAST(SUM(tot * tot) AS BIGINT) AS sn2,
            SUM(CAST(tot AS HUGEINT) * tot * (2 * tot + 3)) AS sn23
          FROM tot)
        SELECT n AS n_orders,
          CAST(j2 AS DOUBLE) / 2.0 AS j_stat,
          CAST(n * n - sn2 AS DOUBLE) / 4.0 AS e_j,
          CAST(CAST(n AS HUGEINT) * n * (2 * n + 3) - sn23 AS DOUBLE)
            / 72.0 AS var_j,
          (CAST(j2 AS DOUBLE) / 2.0 - CAST(n * n - sn2 AS DOUBLE) / 4.0)
            / sqrt(CAST(CAST(n AS HUGEINT) * n * (2 * n + 3) - sn23
                AS DOUBLE) / 72.0) AS z
        FROM terms CROSS JOIN m""")),

    // ── RAKE keyword extraction (q333) ─────────────────────────────────
    // Rapid Automatic Keyword Extraction over the corpus: candidate
    // phrases are maximal stopword-free token runs (run id = cumulative
    // stopword count per doc), each word scores degree/frequency
    // (degree = Σ length of phrases containing it), and a phrase scores
    // the sum of its words. The per-word score is floored ×1e6 to an
    // exact long BEFORE the per-phrase sum, so phrase scores are
    // order-independent integers; identical phrase texts share one
    // global score (word stats are corpus-global), so the final
    // dedup-and-count is exact. Doc-partitioned windows + two bounded
    // vocabulary aggregates; top-20 by (score, phrase).
    QueryDef("q333_rake_keywords",
      (s, dir) => {
        val tok = tPar(s, dir, "documents")
          .select(col("doc_id"),
            posexplode(TextStats.tokens(lower(col("text")))))
          .withColumnRenamed("col", "tok")
          .withColumn("stop", col("tok").isInCollection(stopwords))
        val runs = tok.withColumn("run",
            sum(when(col("stop"), 1L).otherwise(0L))
              .over(Window.partitionBy("doc_id").orderBy("pos")))
          .filter(!col("stop"))
        val members = runs.groupBy("doc_id", "run")
          .agg(expr("transform(array_sort(collect_list(" +
            "struct(pos, tok))), x -> x.tok)").as("words"))
          .select(col("doc_id"), col("run"),
            array_join(col("words"), " ").as("phrase"),
            size(col("words")).cast("long").as("plen"),
            col("words"))
          .localCheckpoint()
        val mr = members.select(col("doc_id"), col("run"), col("phrase"),
          col("plen"), explode(col("words")).as("tok"))
        val ws = mr.groupBy("tok").agg(count(lit(1)).as("freq"),
          sum("plen").as("deg"))
        val occ = mr.join(ws, Seq("tok"))
          .groupBy("doc_id", "run", "phrase", "plen")
          .agg(sum(floor(col("deg").cast("double") /
            col("freq").cast("double") * lit(1.0e6)).cast("long"))
            .as("sc"))
        occ.groupBy("phrase", "plen")
          .agg(count(lit(1)).as("n_occurrences"), max("sc").as("msc"))
          .orderBy(desc("msc"), col("phrase"))
          .limit(20)
          .select(col("phrase"), col("plen").as("n_words"),
            col("n_occurrences"),
            (col("msc").cast("double") / lit(1.0e6)).as("rake_score"))
      },
      Some {
        val stopList = stopwords.map(w => s"'$w'").mkString("[", ", ", "]")
        s"""WITH d AS (SELECT doc_id, $dTokLower AS tk FROM documents),
        tp AS (SELECT doc_id, tk,
            unnest(range(1, len(tk) + 1)) AS pos FROM d),
        t2 AS (SELECT doc_id, pos, tk[CAST(pos AS INT)] AS tok FROM tp),
        f AS (SELECT doc_id, pos, tok,
            list_contains($stopList, tok) AS stop FROM t2),
        r AS (SELECT doc_id, pos, tok, stop,
            SUM(CASE WHEN stop THEN 1 ELSE 0 END) OVER (
              PARTITION BY doc_id ORDER BY pos) AS run
          FROM f),
        nr AS (SELECT doc_id, run, pos, tok FROM r WHERE NOT stop),
        mem AS (SELECT doc_id, run,
            array_to_string(list(tok ORDER BY pos), ' ') AS phrase,
            CAST(COUNT(*) AS BIGINT) AS plen
          FROM nr GROUP BY 1, 2),
        mr AS (SELECT nr.doc_id, nr.run, nr.tok, mem.phrase, mem.plen
          FROM nr JOIN mem USING (doc_id, run)),
        ws AS (SELECT tok, CAST(COUNT(*) AS BIGINT) AS freq,
            CAST(SUM(plen) AS BIGINT) AS deg
          FROM mr GROUP BY 1),
        occ AS (SELECT mr.doc_id, mr.run, mr.phrase, mr.plen,
            CAST(SUM(CAST(floor(CAST(deg AS DOUBLE) / CAST(freq AS DOUBLE)
              * 1000000.0) AS BIGINT)) AS BIGINT) AS sc
          FROM mr JOIN ws USING (tok) GROUP BY 1, 2, 3, 4)
        SELECT phrase, plen AS n_words,
          CAST(COUNT(*) AS BIGINT) AS n_occurrences,
          CAST(MAX(sc) AS DOUBLE) / 1000000.0 AS rake_score
        FROM occ GROUP BY phrase, plen
        ORDER BY MAX(sc) DESC, phrase LIMIT 20"""
      }),

    // ── Cramér–von Mises two-sample test (q334) ────────────────────────
    // The whole-distribution companion of KS (q151): do finished and
    // open orders draw the same price distribution? The pooled- and
    // within-group ranks come from the exact (micro-units, orderkey)
    // total order (the q141 order-statistics contract); (rᵢ−i)² sums
    // ride decimal(38,0)/HUGEINT (n·Σ(r−i)² passes BIGINT at sf1.0),
    // and T = U/(nmN) − (4mn−1)/(6N) is one literal-mirrored chain
    // from exact integers.
    QueryDef("q334_cramer_von_mises",
      (s, dir) => {
        val u = t(s, dir, "orders").select(
          when(col("o_orderstatus") === "F", 1L).otherwise(0L).as("grp"),
          floor(col("o_totalprice") * lit(1.0e6)).cast("long").as("u"),
          col("o_orderkey"))
        val r = u
          .withColumn("pr", row_number()
            .over(boundedWindow(col("u"), col("o_orderkey")))
            .cast("long"))
          .withColumn("gr", row_number()
            .over(Window.partitionBy("grp")
              .orderBy(col("u"), col("o_orderkey"))).cast("long"))
        val a = r.groupBy("grp").agg(count(lit(1)).as("c"),
          sum(((col("pr") - col("gr")) * (col("pr") - col("gr")))
            .cast("decimal(38,0)")).as("sq"))
        a.agg(
            sum(when(col("grp") === 1, col("c"))).as("n1"),
            sum(when(col("grp") === 0, col("c"))).as("n0"),
            sum(when(col("grp") === 1, col("sq"))).as("s1"),
            sum(when(col("grp") === 0, col("sq"))).as("s0"))
          .select(col("n1").as("n_finished"), col("n0").as("n_open"),
            ((col("n1").cast("decimal(38,0)") * col("s1") +
              col("n0").cast("decimal(38,0)") * col("s0"))
              .cast("double") /
              (col("n1").cast("double") * col("n0").cast("double") *
                (col("n1") + col("n0")).cast("double"))).as("u_scaled"))
          .withColumn("cvm_t", col("u_scaled") -
            (lit(4.0) * col("n_finished").cast("double") *
              col("n_open").cast("double") - lit(1.0)) /
            (lit(6.0) *
              (col("n_finished") + col("n_open")).cast("double")))
      },
      Some("""WITH u AS (SELECT
            CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END AS grp,
            CAST(floor(o_totalprice * 1000000.0) AS BIGINT) AS u,
            o_orderkey
          FROM orders),
        r AS (SELECT grp,
            ROW_NUMBER() OVER (ORDER BY u, o_orderkey) AS pr,
            ROW_NUMBER() OVER (PARTITION BY grp
              ORDER BY u, o_orderkey) AS gr
          FROM u),
        a AS (SELECT grp, CAST(COUNT(*) AS BIGINT) AS c,
            SUM(CAST(pr - gr AS HUGEINT) * (pr - gr)) AS sq
          FROM r GROUP BY 1),
        w AS (SELECT
            CAST(SUM(CASE WHEN grp = 1 THEN c END) AS BIGINT) AS n1,
            CAST(SUM(CASE WHEN grp = 0 THEN c END) AS BIGINT) AS n0,
            SUM(CASE WHEN grp = 1 THEN sq END) AS s1,
            SUM(CASE WHEN grp = 0 THEN sq END) AS s0
          FROM a)
        SELECT n1 AS n_finished, n0 AS n_open,
          CAST(CAST(n1 AS HUGEINT) * s1 + CAST(n0 AS HUGEINT) * s0
              AS DOUBLE) /
            (CAST(n1 AS DOUBLE) * CAST(n0 AS DOUBLE)
              * CAST(n1 + n0 AS DOUBLE)) AS u_scaled,
          CAST(CAST(n1 AS HUGEINT) * s1 + CAST(n0 AS HUGEINT) * s0
              AS DOUBLE) /
            (CAST(n1 AS DOUBLE) * CAST(n0 AS DOUBLE)
              * CAST(n1 + n0 AS DOUBLE))
            - (4.0 * CAST(n1 AS DOUBLE) * CAST(n0 AS DOUBLE) - 1.0)
              / (6.0 * CAST(n1 + n0 AS DOUBLE)) AS cvm_t
        FROM w""")),

    // ── Expected calibration error per source (q335) ───────────────────
    // The SCALAR the q208 reliability table plots and q326 tests: over
    // decile bins of the deterministic 999-bucket score,
    // ECE = Σ_b (n_b/N)·|p̄_b − ō_b| collapses to the EXACT integer
    // form Σ_b |Σm − 999·Σy| / (999·N) — zero float discipline needed;
    // MCE is the max per-bin gap from the same integers. One scan into
    // a (source × 10)-key aggregate.
    QueryDef("q335_ece",
      (s, dir) => {
        val d = tPar(s, dir, "documents").select(
          col("source"),
          (Shingles.baseHash(col("text")) % 999).as("m"),
          when(TextStats.qualityScore(col("text"), stopwords) >= 0.5,
            1L).otherwise(0L).as("y"))
        d.groupBy(col("source"), expr("m div 100").as("bin"))
          .agg(count(lit(1)).as("n"), sum("m").as("sm"), sum("y").as("sy"))
          .groupBy("source")
          .agg(sum("n").as("n_docs"),
            (sum(abs(col("sm") - lit(999L) * col("sy"))).cast("double") /
              (lit(999.0) * sum("n").cast("double"))).as("ece"),
            max(abs(col("sm") - lit(999L) * col("sy")).cast("double") /
              (lit(999.0) * col("n").cast("double"))).as("mce"))
          .orderBy("source")
      },
      Some(s"""WITH d AS (SELECT source,
            ('0x' || substr(md5(text), 1, 7))::BIGINT % 999 AS m,
            CASE WHEN $dQualityExpr >= 0.5 THEN 1 ELSE 0 END AS y
          FROM documents),
        b AS (SELECT source, m // 100 AS bin,
            CAST(COUNT(*) AS BIGINT) AS n, CAST(SUM(m) AS BIGINT) AS sm,
            CAST(SUM(y) AS BIGINT) AS sy
          FROM d GROUP BY 1, 2)
        SELECT source, CAST(SUM(n) AS BIGINT) AS n_docs,
          CAST(SUM(ABS(sm - 999 * sy)) AS DOUBLE)
            / (999.0 * CAST(SUM(n) AS DOUBLE)) AS ece,
          MAX(CAST(ABS(sm - 999 * sy) AS DOUBLE)
            / (999.0 * CAST(n AS DOUBLE))) AS mce
        FROM b GROUP BY source ORDER BY source""")),

    // ── Skyline (Pareto front) of parts: cheap AND large (q336) ────────
    // The dominance operator the TopK/ntile family can't express: a
    // part is on the (min price, max size) skyline iff no other part is
    // ≤ price and ≥ size with one strict. One pass over the (price
    // micro-units asc, size desc, partkey) total order keeps rows whose
    // size strictly exceeds the running max — exact integers, ties
    // resolved to the first representative by partkey (documented
    // canonical-skyline rule). Output is bounded by |distinct sizes|.
    // At warehouse scale the same sweep runs per range-partition with
    // a boundary-merge pass.
    QueryDef("q336_skyline",
      (s, dir) => {
        val p = t(s, dir, "part").select(col("p_partkey"),
          floor(col("p_retailprice") * lit(1.0e6)).cast("long").as("pu"),
          col("p_size").cast("long").as("size"), col("p_retailprice"))
        val w = boundedWindow(col("pu"), col("size").desc,
            col("p_partkey"))
          .rowsBetween(Window.unboundedPreceding, -1)
        p.withColumn("prevmax", max("size").over(w))
          .filter(col("prevmax").isNull || col("size") > col("prevmax"))
          .select(col("p_partkey"), col("p_retailprice").as("price"),
            col("size").as("p_size"))
          .orderBy("p_partkey")
      },
      Some("""WITH p AS (SELECT p_partkey,
            CAST(floor(p_retailprice * 1000000.0) AS BIGINT) AS pu,
            CAST(p_size AS BIGINT) AS size, p_retailprice
          FROM part),
        r AS (SELECT p_partkey, p_retailprice, size,
            MAX(size) OVER (ORDER BY pu, size DESC, p_partkey
              ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
              AS prevmax
          FROM p)
        SELECT p_partkey, p_retailprice AS price, size AS p_size
        FROM r WHERE prevmax IS NULL OR size > prevmax
        ORDER BY p_partkey""")),

    // ── Mood's median test: purchase vs view values (q337) ─────────────
    // The quick-and-robust two-sample location test (the 2×2 cousin of
    // MWU q144): pooled exact median from the (micro-units, event_id)
    // total order, per-group above/at-or-below counts, and the 1-df
    // χ² = N(ad−bc)²/((a+b)(c+d)(a+c)(b+d)) with the square on
    // decimal(38,0)/HUGEINT. One ranked pass + one 4-cell aggregate.
    QueryDef("q337_mood_median",
      (s, dir) => {
        val v = t(s, dir, "events")
          .filter(col("event_type").isin("purchase", "view"))
          .select(
            when(col("event_type") === "purchase", 1L).otherwise(0L)
              .as("grp"),
            floor(col("value") * lit(1.0e6)).cast("long").as("u"),
            col("event_id"))
        val r = v.withColumn("rn", row_number()
          .over(boundedWindow(col("u"), col("event_id"))).cast("long"))
        val med = r.crossJoin(broadcast(v.agg(count(lit(1)).as("n"))))
          .filter(col("rn") === expr("(n + 1) div 2"))
          .select(col("u").as("mu"))
        val cells = v.crossJoin(broadcast(med)).agg(
          sum(when(col("grp") === 1 && col("u") > col("mu"), 1L)
            .otherwise(0L)).as("a"),
          sum(when(col("grp") === 1 && col("u") <= col("mu"), 1L)
            .otherwise(0L)).as("b"),
          sum(when(col("grp") === 0 && col("u") > col("mu"), 1L)
            .otherwise(0L)).as("c"),
          sum(when(col("grp") === 0 && col("u") <= col("mu"), 1L)
            .otherwise(0L)).as("d"))
        cells.crossJoin(broadcast(med))
          .select((col("a") + col("b")).as("n_purchase"),
            (col("c") + col("d")).as("n_view"),
            (col("mu").cast("double") / lit(1.0e6)).as("pooled_median"),
            (((col("a") + col("b") + col("c") + col("d"))
              .cast("decimal(38,0)") *
              ((col("a") * col("d") - col("b") * col("c"))
                .cast("decimal(38,0)") *
               (col("a") * col("d") - col("b") * col("c"))
                .cast("decimal(38,0)"))).cast("double") /
              ((col("a") + col("b")).cast("decimal(38,0)") *
                (col("c") + col("d")).cast("decimal(38,0)") *
                (col("a") + col("c")).cast("decimal(38,0)") *
                (col("b") + col("d")).cast("decimal(38,0)"))
                .cast("double")).as("chi2"))
      },
      Some("""WITH v AS (SELECT
            CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS grp,
            CAST(floor(value * 1000000.0) AS BIGINT) AS u, event_id
          FROM events WHERE event_type IN ('purchase', 'view')),
        r AS (SELECT grp, u,
            ROW_NUMBER() OVER (ORDER BY u, event_id) AS rn FROM v),
        n AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM v),
        med AS (SELECT u AS mu FROM r, n WHERE rn = (n + 1) // 2),
        cells AS (SELECT
            CAST(SUM(CASE WHEN grp = 1 AND u > mu THEN 1 ELSE 0 END)
              AS BIGINT) AS a,
            CAST(SUM(CASE WHEN grp = 1 AND u <= mu THEN 1 ELSE 0 END)
              AS BIGINT) AS b,
            CAST(SUM(CASE WHEN grp = 0 AND u > mu THEN 1 ELSE 0 END)
              AS BIGINT) AS c,
            CAST(SUM(CASE WHEN grp = 0 AND u <= mu THEN 1 ELSE 0 END)
              AS BIGINT) AS d
          FROM v, med)
        SELECT a + b AS n_purchase, c + d AS n_view,
          CAST(mu AS DOUBLE) / 1000000.0 AS pooled_median,
          CAST(CAST(a + b + c + d AS HUGEINT)
              * (CAST(a * d - b * c AS HUGEINT) * (a * d - b * c))
              AS DOUBLE) /
            CAST(CAST(a + b AS HUGEINT) * (c + d) * (a + c) * (b + d)
              AS DOUBLE) AS chi2
        FROM cells, med""")),

    // ── BPE fertility per language (q338) ──────────────────────────────
    // THE tokenizer-quality number a multilingual corpus report leads
    // with: subwords-per-word (fertility) and characters-per-subword
    // under the q161/q169 trained BPE, per language. Reuses the
    // bpeEncode machinery (vocab-bounded greedy merges, broadcast
    // encode join) + one lang-keyed aggregate; ratios are single
    // divisions of exact BIGINT sums. A fertility gap across langs is
    // the standard signal the merge budget under-serves a language.
    QueryDef("q338_bpe_fertility",
      (s, dir) => {
        val docs = tPar(s, dir, "documents")
        val enc = graft.ext.TextStats.bpeEncode(
          docs, "doc_id", col("text"), bpeSteps)
        val chars = docs.select(col("doc_id"), col("lang"),
          size(TextStats.tokens(col("text"))).cast("long").as("nw"),
          aggregate(TextStats.tokens(col("text")), lit(0L),
            (acc, x) => acc + length(x).cast("long")).as("nchars"))
        enc.join(chars, Seq("doc_id"))
          .groupBy("lang")
          .agg(count(lit(1)).as("n_docs"),
            sum("n_words").as("n_words"),
            sum("n_subwords").as("n_subwords"),
            sum("nchars").as("n_chars"))
          .select(col("lang"), col("n_docs"), col("n_words"),
            col("n_subwords"),
            (col("n_subwords").cast("double") /
              col("n_words").cast("double")).as("fertility"),
            (col("n_chars").cast("double") /
              col("n_subwords").cast("double")).as("chars_per_subword"))
          .orderBy("lang")
      },
      Some(s"""WITH $dBpeVocabCtes,
        tok AS (SELECT doc_id, unnest($dTok) AS word FROM documents),
        enc AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_words,
            CAST(SUM(len(v$bpeSteps.syms)) AS BIGINT) AS n_subwords
          FROM tok JOIN v$bpeSteps USING (word)
          GROUP BY doc_id),
        ch AS (SELECT doc_id, lang,
            CAST(list_sum(list_transform($dTok, w -> strlen(w)))
              AS BIGINT) AS nchars
          FROM documents)
        SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_docs,
          CAST(SUM(n_words) AS BIGINT) AS n_words,
          CAST(SUM(n_subwords) AS BIGINT) AS n_subwords,
          CAST(SUM(n_subwords) AS DOUBLE) / CAST(SUM(n_words) AS DOUBLE)
            AS fertility,
          CAST(SUM(nchars) AS DOUBLE) / CAST(SUM(n_subwords) AS DOUBLE)
            AS chars_per_subword
        FROM enc JOIN ch USING (doc_id)
        GROUP BY lang ORDER BY lang""")),

    // ── Competing-risks cumulative incidence (Aalen–Johansen) (q339) ───
    // Completes the survival suite (KM q179, Nelson–Aalen q265,
    // log-rank q298) with the estimator those can't replace when TWO
    // events compete: per user, the FIRST of purchase (cause 1) vs
    // error (cause 2) after entry, censored at last activity.
    // CIF_k(t) = Σ_{s≤t} S(s−)·d_k(s)/n(s) runs as the q179
    // integer-scaled fold extended to a 3-field accumulator
    // (surv, cif1, cif2), each step one floor-div — the oracle replays
    // the identical recurrence as a recursive CTE, so every scaled
    // value is bit-equal. Life table ≤ |distinct days|; the heavy work
    // is one per-user aggregation. (1e12·users needs DECIMAL past ~9M
    // at-risk users, as q179 documents.)
    QueryDef("q339_competing_risks",
      (s, dir) => {
        val ev = t(s, dir, "events")
        val u = ev.groupBy("user_id")
          .agg(min(unix_micros(col("ts"))).as("fu"),
            max(unix_micros(col("ts"))).as("lu"),
            min(when(col("event_type") === "purchase",
              unix_micros(col("ts")))).as("fp"),
            min(when(col("event_type") === "error",
              unix_micros(col("ts")))).as("fe"))
          .localCheckpoint()
        val p = u.select(
          when(col("fp").isNotNull &&
            (col("fe").isNull || col("fp") <= col("fe")),
            expr("(fp - fu) div 86400000000"))
            .when(col("fe").isNotNull,
              expr("(fe - fu) div 86400000000"))
            .otherwise(expr("(lu - fu) div 86400000000")).as("t"),
          when(col("fp").isNotNull &&
            (col("fe").isNull || col("fp") <= col("fe")), 1L)
            .when(col("fe").isNotNull, 2L).otherwise(0L).as("cause"))
        val lt = p.groupBy("t").agg(
          sum(when(col("cause") === 1, 1L).otherwise(0L)).as("d1"),
          sum(when(col("cause") === 2, 1L).otherwise(0L)).as("d2"),
          sum(when(col("cause") === 0, 1L).otherwise(0L)).as("cc"))
        val w = boundedWindow("t")
          .rowsBetween(Window.currentRow, Window.unboundedFollowing)
        val withRisk = lt.withColumn("n",
          sum(col("d1") + col("d2") + col("cc")).over(w))
        withRisk.agg(sort_array(collect_list(
            struct(col("t"), col("d1"), col("d2"), col("cc"), col("n"))))
            .as("arr"))
          .select(posexplode(expr(
            """transform(sequence(1, size(arr)), i -> struct(
               arr[i - 1].t as t, arr[i - 1].d1 as d_purchase,
               arr[i - 1].d2 as d_error, arr[i - 1].cc as censored,
               arr[i - 1].n as at_risk,
               aggregate(slice(arr, 1, i), named_struct(
                   's', CAST(1000000000000 AS BIGINT),
                   'c1', CAST(0 AS BIGINT), 'c2', CAST(0 AS BIGINT)),
                 (acc, x) -> named_struct(
                   's', (acc.s * (x.n - x.d1 - x.d2)) div x.n,
                   'c1', acc.c1 + (acc.s * x.d1) div x.n,
                   'c2', acc.c2 + (acc.s * x.d2) div x.n)) as f))"""))
            .as(Seq("i", "row")))
          .select(col("row.t"), col("row.d_purchase"), col("row.d_error"),
            col("row.censored"), col("row.at_risk"),
            col("row.f.s").as("surv_scaled"),
            col("row.f.c1").as("cif_purchase_scaled"),
            col("row.f.c2").as("cif_error_scaled"))
          .orderBy("t")
      },
      Some("""WITH RECURSIVE u AS (SELECT user_id,
            MIN(epoch_us(ts)) AS fu, MAX(epoch_us(ts)) AS lu,
            MIN(CASE WHEN event_type = 'purchase' THEN epoch_us(ts) END)
              AS fp,
            MIN(CASE WHEN event_type = 'error' THEN epoch_us(ts) END)
              AS fe
          FROM events GROUP BY 1),
        p AS (SELECT
            CASE WHEN fp IS NOT NULL AND (fe IS NULL OR fp <= fe)
              THEN (fp - fu) // 86400000000
              WHEN fe IS NOT NULL THEN (fe - fu) // 86400000000
              ELSE (lu - fu) // 86400000000 END AS t,
            CASE WHEN fp IS NOT NULL AND (fe IS NULL OR fp <= fe) THEN 1
              WHEN fe IS NOT NULL THEN 2 ELSE 0 END AS cause
          FROM u),
        lt AS (SELECT t,
            SUM(CASE WHEN cause = 1 THEN 1 ELSE 0 END) AS d1,
            SUM(CASE WHEN cause = 2 THEN 1 ELSE 0 END) AS d2,
            SUM(CASE WHEN cause = 0 THEN 1 ELSE 0 END) AS cc
          FROM p GROUP BY t),
        w AS (SELECT t, d1, d2, cc,
            SUM(d1 + d2 + cc) OVER (ORDER BY t
              ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS n,
            row_number() OVER (ORDER BY t) AS rn FROM lt),
        rec AS (
          SELECT rn, t, d1, d2, cc, n,
            (1000000000000 * (n - d1 - d2)) // n AS surv,
            (1000000000000 * d1) // n AS c1,
            (1000000000000 * d2) // n AS c2
          FROM w WHERE rn = 1
          UNION ALL
          SELECT w.rn, w.t, w.d1, w.d2, w.cc, w.n,
            (rec.surv * (w.n - w.d1 - w.d2)) // w.n,
            rec.c1 + (rec.surv * w.d1) // w.n,
            rec.c2 + (rec.surv * w.d2) // w.n
          FROM rec JOIN w ON w.rn = rec.rn + 1)
        SELECT t, CAST(d1 AS BIGINT) AS d_purchase,
          CAST(d2 AS BIGINT) AS d_error, CAST(cc AS BIGINT) AS censored,
          CAST(n AS BIGINT) AS at_risk,
          CAST(surv AS BIGINT) AS surv_scaled,
          CAST(c1 AS BIGINT) AS cif_purchase_scaled,
          CAST(c2 AS BIGINT) AS cif_error_scaled
        FROM rec ORDER BY t""")),

    // ── Ljung–Box white-noise test on daily purchases (q340) ───────────
    // The PORTMANTEAU companion of the per-lag ACF (q148) and PACF
    // (q282): one statistic for "is the daily purchase series white
    // noise through lag 7?". Centered products stay exact by the n-
    // scaling trick — y_t = n·x_t − Σx makes every ρ_k an exact
    // integer ratio Σy_t y_{t+k} / Σy_t² — and Q = n(n+2)Σρ_k²/(n−k)
    // is a literal-mirrored chain over 7 bounded-lag terms. Day-grid
    // bounded: the lag join is |days|×7.
    QueryDef("q340_ljung_box",
      (s, dir) => {
        val d = t(s, dir, "events")
          .filter(col("event_type") === "purchase")
          .groupBy(expr("unix_micros(ts) div 86400000000").as("day"))
          .agg(count(lit(1)).as("x"))
        val m = d.agg(count(lit(1)).as("n"), sum("x").as("sx"))
        val y = d.crossJoin(broadcast(m))
          .select(col("day"), (col("n") * col("x") - col("sx")).as("y"),
            col("n"))
          .localCheckpoint()
        // y = n·x − Σx, so y·y scales as n²·dev² — plain 64-bit wraps
        // SILENTLY in Spark while the oracle's BIGINT multiply throws
        // (r12 advice). Route the squares/cross-products through
        // decimal(38,0)/HUGEINT like q341; the ratio ρ_k = sk/dy is
        // still the same exact-integer quotient, just on a wider rail.
        val den = y.agg(sum(col("y").cast("decimal(38,0)") * col("y"))
            .as("dy"),
          max("n").as("n"))
        val lags = y.as("a")
          .join(broadcast(y).as("b"),
            col("b.day") > col("a.day") &&
              col("b.day") <= col("a.day") + 7)
          .select((col("b.day") - col("a.day")).as("k"),
            (col("a.y").cast("decimal(38,0)") * col("b.y")).as("p"))
          .groupBy("k").agg(sum("p").as("sk"))
        lags.crossJoin(broadcast(den))
          .select(col("k"), col("n"),
            (col("sk").cast("double") / col("dy").cast("double"))
              .as("rho"))
          .agg(max("n").as("n_days"),
            dsum((col("rho") * col("rho")) /
              (col("n") - col("k")).cast("double")).as("srho"))
          .select(col("n_days"),
            (col("n_days").cast("double") *
              (col("n_days") + lit(2)).cast("double") * col("srho"))
              .as("lb_q"), lit(7L).as("df"))
      },
      Some("""WITH d AS (SELECT epoch_us(ts) // 86400000000 AS day,
            CAST(COUNT(*) AS BIGINT) AS x
          FROM events WHERE event_type = 'purchase' GROUP BY 1),
        m AS (SELECT CAST(COUNT(*) AS BIGINT) AS n,
            CAST(SUM(x) AS BIGINT) AS sx FROM d),
        y AS (SELECT day, n * x - sx AS y, n FROM d CROSS JOIN m),
        den AS (SELECT SUM(CAST(y AS HUGEINT) * y) AS dy,
            MAX(n) AS n FROM y),
        lags AS (SELECT b.day - a.day AS k,
            SUM(CAST(a.y AS HUGEINT) * b.y) AS sk
          FROM y a JOIN y b
            ON b.day > a.day AND b.day <= a.day + 7
          GROUP BY 1),
        rho AS (SELECT k, den.n,
            CAST(sk AS DOUBLE) / CAST(dy AS DOUBLE) AS rho
          FROM lags CROSS JOIN den)
        SELECT CAST(MAX(n) AS BIGINT) AS n_days,
          CAST(MAX(n) AS DOUBLE) * CAST(MAX(n) + 2 AS DOUBLE) *
            (CAST(SUM(CAST(rho * rho / CAST(n - k AS DOUBLE)
              AS DECIMAL(30,8))) AS VARCHAR)::DOUBLE) AS lb_q,
          CAST(7 AS BIGINT) AS df
        FROM rho""")),

    // ── Grubbs outlier test on daily revenue (q341) ────────────────────
    // "Is the most extreme day a statistical outlier?" — the formal
    // single-outlier test behind the q142 anomaly flags. Daily revenue
    // rides exact micro-unit longs; centered extremes use the q340
    // n-scaling (|n·u_t − Σu| is an exact integer), the variance
    // argument n·Σu² − (Σu)² rides decimal(38,0)/HUGEINT, and
    // G = max|u−ū|/s takes ONE sqrt. Argmax day is the exact-integer
    // tie-broken (deviation desc, day) head. One day aggregate + one
    // bounded-grid pass.
    QueryDef("q341_grubbs",
      (s, dir) => {
        val d = t(s, dir, "events")
          .groupBy(expr("unix_micros(ts) div 86400000000").as("day"))
          .agg(sum(floor(col("value") * lit(1.0e6)).cast("long"))
            .as("u"))
        val m = d.agg(count(lit(1)).as("n"), sum("u").as("su"),
          sum(col("u").cast("decimal(38,0)") * col("u")).as("su2"))
        d.crossJoin(broadcast(m))
          .select(col("day"), col("n"),
            abs(col("n") * col("u") - col("su")).as("dev"),
            ((col("n").cast("decimal(38,0)") * col("su2") -
              col("su").cast("decimal(38,0)") * col("su"))
              .cast("double")).as("nvar"))
          .orderBy(desc("dev"), col("day"))
          .limit(1)
          .select(col("day").as("suspect_day"), col("n").as("n_days"),
            (col("dev").cast("double") /
              (col("n").cast("double") *
                sqrt(col("nvar") /
                  (col("n").cast("double") *
                    (col("n") - lit(1)).cast("double")))))
              .as("g_stat"))
      },
      Some("""WITH d AS (SELECT epoch_us(ts) // 86400000000 AS day,
            CAST(SUM(CAST(floor(value * 1000000.0) AS BIGINT))
              AS BIGINT) AS u
          FROM events GROUP BY 1),
        m AS (SELECT CAST(COUNT(*) AS BIGINT) AS n,
            CAST(SUM(u) AS BIGINT) AS su,
            SUM(CAST(u AS HUGEINT) * u) AS su2 FROM d),
        e AS (SELECT day, n, ABS(n * u - su) AS dev,
            CAST(CAST(n AS HUGEINT) * su2 - CAST(su AS HUGEINT) * su
              AS DOUBLE) AS nvar
          FROM d CROSS JOIN m
          ORDER BY dev DESC, day LIMIT 1)
        SELECT day AS suspect_day, n AS n_days,
          CAST(dev AS DOUBLE) /
            (CAST(n AS DOUBLE) * sqrt(nvar /
              (CAST(n AS DOUBLE) * CAST(n - 1 AS DOUBLE)))) AS g_stat
        FROM e""")),

    // ── Rank-biased overlap of two rankers @10 (q342) ──────────────────
    // How much do the hash-score ranker and the quality ranker AGREE? —
    // the top-weighted list-similarity metric that MRR/MAP/nDCG
    // (q245/q297/q209) can't express because it compares two RANKINGS,
    // not a ranking against labels. RBO@10(p=0.9) =
    // (1−p)·Σ_d p^(d−1)·|A_d∩B_d|/d with the p-powers PRECOMPUTED as
    // exact decimal literals (the q209 discount discipline — no pow()
    // at query time); depth overlaps come from one ≤10×≤10 rank join
    // and the 10-term sum rides the decimal rail. Both top-10s are
    // TakeOrderedAndProject heaps, never a global sort.
    QueryDef("q342_rbo",
      (s, dir) => {
        val base = tPar(s, dir, "documents").select(col("doc_id"),
          (Shingles.baseHash(col("text")) % 999).as("m"),
          TextStats.qualityScore(col("text"), stopwords).as("q"))
          .localCheckpoint()
        val ra = base.orderBy(desc("m"), col("doc_id")).limit(10)
          .select(col("doc_id"),
            row_number().over(boundedWindow(desc("m"), col("doc_id")))
              .cast("long").as("ra"))
        val rb = base.orderBy(desc("q"), col("doc_id")).limit(10)
          .select(col("doc_id"),
            row_number().over(boundedWindow(desc("q"), col("doc_id")))
              .cast("long").as("rb"))
        val joined = ra.join(rb, Seq("doc_id")).localCheckpoint()
        val depths = (1 to 10).map { dd =>
          val pPow = java.math.BigDecimal.valueOf(9, 1).pow(dd - 1)
            .toPlainString
          (dd, pPow)
        }
        val dTab = depths.map { case (dd, _) => (dd.toLong, dd.toLong) }
        import s.implicits._
        val dDf = dTab.toDF("d", "dd").select(col("d"))
        val ov = dDf.join(joined,
            col("ra") <= col("d") && col("rb") <= col("d"), "left")
          .groupBy("d")
          .agg(sum(when(col("doc_id").isNotNull, 1L).otherwise(0L))
            .as("ov"))
        val pCase = depths.tail.foldLeft(
          when(col("d") === depths.head._1,
            lit(depths.head._2).cast("decimal(20,18)"))) {
          case (acc, (dd, pw)) =>
            acc.when(col("d") === dd, lit(pw).cast("decimal(20,18)"))
        }
        ov.select(col("d"), col("ov"),
            (pCase.cast("double") * col("ov").cast("double") /
              col("d").cast("double")).as("term"))
          .agg(max(when(col("d") === 10, col("ov"))).as("overlap_at_10"),
            (lit(0.1) * dsum(col("term"))).as("rbo"))
      },
      Some {
        val pows = (1 to 10).map(dd =>
          s"WHEN d = $dd THEN CAST('${java.math.BigDecimal.valueOf(9, 1)
            .pow(dd - 1).toPlainString}' AS DOUBLE)").mkString(" ")
        s"""WITH base AS (SELECT doc_id,
            ('0x' || substr(md5(text), 1, 7))::BIGINT % 999 AS m,
            $dQualityExpr AS q
          FROM documents),
        ra AS (SELECT doc_id, row_number() OVER (ORDER BY m DESC, doc_id)
            AS ra FROM base ORDER BY m DESC, doc_id LIMIT 10),
        rb AS (SELECT doc_id, row_number() OVER (ORDER BY q DESC, doc_id)
            AS rb FROM base ORDER BY q DESC, doc_id LIMIT 10),
        j AS (SELECT ra.doc_id, ra.ra, rb.rb FROM ra JOIN rb USING (doc_id)),
        depths AS (SELECT unnest(range(1, 11)) AS d),
        ov AS (SELECT d, CAST(SUM(CASE WHEN j.doc_id IS NOT NULL
              THEN 1 ELSE 0 END) AS BIGINT) AS ov
          FROM depths LEFT JOIN j ON j.ra <= d AND j.rb <= d
          GROUP BY d),
        terms AS (SELECT d, ov,
            (CASE $pows END) * CAST(ov AS DOUBLE) / CAST(d AS DOUBLE)
              AS term
          FROM ov)
        SELECT MAX(CASE WHEN d = 10 THEN ov END) AS overlap_at_10,
          0.1 * (CAST(SUM(CAST(term AS DECIMAL(30,8))) AS VARCHAR)::DOUBLE)
            AS rbo
        FROM terms"""
      }),

    // ── X̄-R control chart over weekly revenue subgroups (q343) ────────
    // Classic Shewhart SPC — the subgroup chart CUSUM/EWMA/Page-
    // Hinkley (q153/q155/q280) don't cover: complete calendar weeks
    // are rational subgroups of daily revenue; the chart needs only
    // each week's mean and range plus the n=7 control constants
    // (A2=0.419, D3=0.076, D4=1.924 — table literals on both engines).
    // Daily revenue rides exact micro-units, so means are single
    // int→double divisions and every limit is a literal-mirrored
    // chain; out-of-control flags compare identical doubles. One day
    // aggregate + a |weeks|-bounded pass.
    QueryDef("q343_xbar_r_chart",
      (s, dir) => {
        val d = t(s, dir, "events")
          .groupBy(expr("unix_micros(ts) div 86400000000").as("day"))
          .agg(sum(floor(col("value") * lit(1.0e6)).cast("long"))
            .as("u"))
          .withColumn("week", expr("day div 7"))
        val full = d
          .withColumn("nw", count(lit(1)).over(Window.partitionBy("week")))
          .filter(col("nw") === 7)
        val wk = full.groupBy("week")
          .agg(sum("u").as("su"), (max("u") - min("u")).as("ru"))
          .localCheckpoint()
        val g = wk.agg(count(lit(1)).as("nweeks"), sum("su").as("tsu"),
          sum("ru").as("tru"))
        wk.crossJoin(broadcast(g))
          .select(col("week"), col("nweeks"),
            (col("su").cast("double") / lit(7.0) / lit(1.0e6))
              .as("xbar"),
            (col("ru").cast("double") / lit(1.0e6)).as("r"),
            (col("tsu").cast("double") /
              (lit(7.0) * col("nweeks").cast("double")) / lit(1.0e6))
              .as("x_center"),
            (col("tru").cast("double") / col("nweeks").cast("double") /
              lit(1.0e6)).as("r_center"))
          .withColumn("ucl_x", col("x_center") +
            lit(0.419) * col("r_center"))
          .withColumn("lcl_x", col("x_center") -
            lit(0.419) * col("r_center"))
          .withColumn("ucl_r", lit(1.924) * col("r_center"))
          .withColumn("lcl_r", lit(0.076) * col("r_center"))
          .withColumn("out_x",
            col("xbar") > col("ucl_x") || col("xbar") < col("lcl_x"))
          .withColumn("out_r",
            col("r") > col("ucl_r") || col("r") < col("lcl_r"))
          .drop("nweeks")
          .orderBy("week")
      },
      Some("""WITH d AS (SELECT epoch_us(ts) // 86400000000 AS day,
            CAST(SUM(CAST(floor(value * 1000000.0) AS BIGINT))
              AS BIGINT) AS u
          FROM events GROUP BY 1),
        wd AS (SELECT day, u, day // 7 AS week FROM d),
        wful AS (SELECT week, u,
            COUNT(*) OVER (PARTITION BY week) AS nw FROM wd),
        wk AS (SELECT week, CAST(SUM(u) AS BIGINT) AS su,
            CAST(MAX(u) - MIN(u) AS BIGINT) AS ru
          FROM wful WHERE nw = 7 GROUP BY week),
        g AS (SELECT CAST(COUNT(*) AS BIGINT) AS nweeks,
            CAST(SUM(su) AS BIGINT) AS tsu,
            CAST(SUM(ru) AS BIGINT) AS tru FROM wk),
        b AS (SELECT week,
            CAST(su AS DOUBLE) / 7.0 / 1000000.0 AS xbar,
            CAST(ru AS DOUBLE) / 1000000.0 AS r,
            CAST(tsu AS DOUBLE) / (7.0 * CAST(nweeks AS DOUBLE))
              / 1000000.0 AS x_center,
            CAST(tru AS DOUBLE) / CAST(nweeks AS DOUBLE) / 1000000.0
              AS r_center
          FROM wk CROSS JOIN g)
        SELECT week, xbar, r, x_center, r_center,
          x_center + 0.419 * r_center AS ucl_x,
          x_center - 0.419 * r_center AS lcl_x,
          1.924 * r_center AS ucl_r,
          0.076 * r_center AS lcl_r,
          xbar > x_center + 0.419 * r_center
            OR xbar < x_center - 0.419 * r_center AS out_x,
          r > 1.924 * r_center OR r < 0.076 * r_center AS out_r
        FROM b ORDER BY week""")),

    // ── Holt linear (double exponential) smoothing (q344) ──────────────
    // The trend-aware step past q155's EWMA: level and trend recursions
    // (α = β = ½) over daily revenue. The coupled recursion can't
    // unroll to one closed form, so it runs as the q179/q339
    // integer-scaled fold — state (level, trend) in 1/100 micro-units,
    // each step two floor-divs — over the ≤|days| bounded grid; the
    // oracle replays the identical recurrence as a recursive CTE, so
    // every scaled value is bit-equal. One-step-ahead forecast =
    // level + trend. (State·100 wants DECIMAL past ~9e16 daily
    // micro-units — petabyte-day revenue — as q179 documents.)
    QueryDef("q344_holt_forecast",
      (s, dir) => {
        val d = t(s, dir, "events")
          .groupBy(expr("unix_micros(ts) div 86400000000").as("day"))
          .agg(sum(floor(col("value") * lit(1.0e6)).cast("long"))
            .as("u"))
        d.agg(sort_array(collect_list(struct(col("day"), col("u"))))
            .as("arr"))
          .select(posexplode(expr(
            """transform(sequence(1, size(arr)), i -> struct(
               arr[i - 1].day as day, arr[i - 1].u as u,
               aggregate(slice(arr, 2, i - 1), named_struct(
                   'l', arr[0].u * CAST(100 AS BIGINT),
                   'b', CAST(0 AS BIGINT)),
                 (acc, x) -> named_struct(
                   'l', (x.u * 100 + acc.l + acc.b) div 2,
                   'b', ((x.u * 100 + acc.l + acc.b) div 2 - acc.l
                     + acc.b) div 2)) as st))"""))
            .as(Seq("i", "row")))
          .select(col("row.day").as("day"), col("row.u").as("units"),
            col("row.st.l").as("level_scaled"),
            col("row.st.b").as("trend_scaled"),
            (col("row.st.l") + col("row.st.b")).as("forecast_scaled"))
          .orderBy("day")
      },
      Some("""WITH RECURSIVE d AS (SELECT
            epoch_us(ts) // 86400000000 AS day,
            CAST(SUM(CAST(floor(value * 1000000.0) AS BIGINT))
              AS BIGINT) AS u
          FROM events GROUP BY 1),
        r AS (SELECT day, u,
            row_number() OVER (ORDER BY day) AS rn FROM d),
        rec AS (
          SELECT rn, day, u, u * 100 AS l, CAST(0 AS BIGINT) AS b
          FROM r WHERE rn = 1
          UNION ALL
          SELECT r.rn, r.day, r.u,
            (r.u * 100 + rec.l + rec.b) // 2,
            ((r.u * 100 + rec.l + rec.b) // 2 - rec.l + rec.b) // 2
          FROM rec JOIN r ON r.rn = rec.rn + 1)
        SELECT day, CAST(u AS BIGINT) AS units,
          CAST(l AS BIGINT) AS level_scaled,
          CAST(b AS BIGINT) AS trend_scaled,
          CAST(l + b AS BIGINT) AS forecast_scaled
        FROM rec ORDER BY day""")),

    // ── Page's trend test for ordered weekday effect (q345) ────────────
    // The ORDERED-alternative refinement of Friedman (q310): does
    // volume trend monotonically across the week? Same complete-week
    // midrank machinery on the exact 2× integer scale; L = Σ_j j·R_j
    // against its closed-form null moments (tie correction omitted —
    // documented, volumes essentially never tie across a week). One
    // day aggregate + |weeks|-bounded windows; z is a literal-mirrored
    // chain on exact longs.
    QueryDef("q345_page_trend",
      (s, dir) => {
        val k = 7
        val days = t(s, dir, "events")
          .select(expr("unix_micros(ts) div 86400000000").as("day"))
          .groupBy("day").agg(count(lit(1)).as("volume"))
          .withColumn("week", expr("day div 7"))
          .withColumn("wd", pmod(col("day"), lit(7L)))
        val full = days
          .withColumn("nw", count(lit(1)).over(Window.partitionBy("week")))
          .filter(col("nw") === k)
        val wB = Window.partitionBy("week").orderBy("volume")
        val wT = Window.partitionBy("week", "volume")
        val ranked = full.select(col("week"), col("wd"),
          (rank().over(wB) * 2 + count(lit(1)).over(wT) - 1)
            .cast("long").as("s2"))
        val l2 = ranked.agg(
          countDistinct(col("week")).as("n"),
          sum((col("wd") + 1) * col("s2")).as("l2"))
        l2.select(col("n").as("n_weeks"),
            (col("l2").cast("double") / lit(2.0)).as("l_stat"),
            (col("n").cast("double") * lit((k * (k + 1) * (k + 1))
              .toDouble) / lit(4.0)).as("e_l"))
          .withColumn("z",
            (col("l_stat") - col("e_l")) /
              sqrt(col("n_weeks").cast("double") *
                lit((k.toDouble * k * (k + 1) * (k * k - 1)) / 144.0)))
      },
      Some(s"""WITH days AS (SELECT day, COUNT(*) AS volume,
            day // 7 AS week, day % 7 AS wd
          FROM (SELECT epoch_us(ts) // 86400000000 AS day FROM events)
          GROUP BY day),
        wful AS (SELECT week, wd, volume,
            COUNT(*) OVER (PARTITION BY week) AS nw FROM days),
        ranked AS (SELECT week, wd,
            CAST(rank() OVER (PARTITION BY week ORDER BY volume) * 2
              + COUNT(*) OVER (PARTITION BY week, volume) - 1
              AS BIGINT) AS s2
          FROM wful WHERE nw = 7),
        a AS (SELECT CAST(COUNT(DISTINCT week) AS BIGINT) AS n,
            CAST(SUM((wd + 1) * s2) AS BIGINT) AS l2 FROM ranked)
        SELECT n AS n_weeks,
          CAST(l2 AS DOUBLE) / 2.0 AS l_stat,
          CAST(n AS DOUBLE) * ${7 * 8 * 8}.0 / 4.0 AS e_l,
          (CAST(l2 AS DOUBLE) / 2.0
            - CAST(n AS DOUBLE) * ${7 * 8 * 8}.0 / 4.0)
            / sqrt(CAST(n AS DOUBLE)
              * ${(7.0 * 7 * 8 * (7 * 7 - 1)) / 144.0}) AS z
        FROM a""")),

    // ── Kruskal–Wallis k-group rank test (q346) ────────────────────────
    // The UNPAIRED k-group companion of MWU (q144) / Friedman (q310):
    // does order value differ across the five priorities, rank-based?
    // Pooled MIDRANKS live on the exact 2× integer scale via the
    // distinct-value count grid (midrank2 = 2·cum_below + ties + 1 —
    // one cumulative window over |distinct values|, the documented
    // order-statistics contract); per-group rank sums are exact
    // decimal(38,0) products, the tie correction Σ(t³−t) exact longs,
    // and H is one literal-mirrored chain. Never ranks raw rows twice:
    // the (group × value) grid carries all counts.
    QueryDef("q346_kruskal_wallis",
      (s, dir) => {
        val o = t(s, dir, "orders").select(
          substring(col("o_orderpriority"), 1, 1).cast("long").as("g"),
          floor(col("o_totalprice") * lit(1.0e6)).cast("long").as("u"))
        val gv = o.groupBy("g", "u").agg(count(lit(1)).as("c"))
          .localCheckpoint()
        val v = gv.groupBy("u").agg(sum("c").as("t"))
        val vm = v.withColumn("cb",
            coalesce(sum("t").over(boundedWindow("u")
              .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
          .select(col("u"),
            (lit(2L) * col("cb") + col("t") + 1L).as("mr2"), col("t"))
        val rg = gv.join(vm.select("u", "mr2"), Seq("u"))
          .groupBy("g")
          .agg(sum("c").as("ng"),
            sum(col("c").cast("decimal(38,0)") * col("mr2")).as("r2g"))
        val ties = v.agg(
          sum(col("t") * col("t") * col("t") - col("t")).as("t3"),
          sum("t").as("n"))
        val num = rg.agg(
          dsum((col("r2g") * col("r2g")).cast("double") /
            (lit(4.0) * col("ng").cast("double"))).as("srq"),
          count(lit(1)).as("k"))
        num.crossJoin(broadcast(ties))
          .select(col("n").as("n_orders"), col("k").as("n_groups"),
            (lit(12.0) /
              (col("n").cast("double") * (col("n") + 1).cast("double")) *
              col("srq") -
              lit(3.0) * (col("n") + 1).cast("double")).as("h"),
            (lit(1.0) - col("t3").cast("double") /
              (col("n").cast("decimal(38,0)") * col("n") * col("n") -
                col("n").cast("decimal(38,0)")).cast("double"))
              .as("tie_c"))
          .withColumn("h_corrected", col("h") / col("tie_c"))
          .drop("tie_c")
      },
      Some(s"""WITH o AS (SELECT
            CAST(substr(o_orderpriority, 1, 1) AS BIGINT) AS g,
            CAST(floor(o_totalprice * 1000000.0) AS BIGINT) AS u
          FROM orders),
        gv AS (SELECT g, u, CAST(COUNT(*) AS BIGINT) AS c
          FROM o GROUP BY 1, 2),
        v AS (SELECT u, CAST(SUM(c) AS BIGINT) AS t
          FROM gv GROUP BY 1),
        vm AS (SELECT u,
            2 * COALESCE(SUM(t) OVER (ORDER BY u
              ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
              + t + 1 AS mr2, t
          FROM v),
        rg AS (SELECT g, CAST(SUM(c) AS BIGINT) AS ng,
            SUM(CAST(c AS HUGEINT) * mr2) AS r2g
          FROM gv JOIN vm USING (u) GROUP BY g),
        ties AS (SELECT CAST(SUM(t * t * t - t) AS BIGINT) AS t3,
            CAST(SUM(t) AS BIGINT) AS n FROM v),
        num AS (SELECT ${dsumSql(
          "CAST(r2g * r2g AS DOUBLE) / (4.0 * CAST(ng AS DOUBLE))")}
            AS srq, CAST(COUNT(*) AS BIGINT) AS k FROM rg),
        fin AS (SELECT n, k,
            12.0 / (CAST(n AS DOUBLE) * CAST(n + 1 AS DOUBLE)) * srq
              - 3.0 * CAST(n + 1 AS DOUBLE) AS h,
            1.0 - CAST(t3 AS DOUBLE)
              / CAST(CAST(n AS HUGEINT) * n * n - n AS DOUBLE) AS tie_c
          FROM num CROSS JOIN ties)
        SELECT n AS n_orders, k AS n_groups, h, h / tie_c AS h_corrected
        FROM fin""")),

    // ── Brown–Forsythe variance-homogeneity test (q347) ────────────────
    // Do event types differ in SPREAD, not just location? — the robust
    // Levene variant: per-group deviations from the per-group exact
    // MEDIAN (micro-units; per-group row_number rank cut), then a
    // one-way ANOVA F on |z|. Group sums of z are exact longs, Σz²
    // rides decimal(38,0)/HUGEINT, and the two ANOVA pieces share one
    // railed Σ(S_g²/n_g) term so both engines assemble F from
    // identical doubles. Per-group windows only — no global sort.
    QueryDef("q347_brown_forsythe",
      (s, dir) => {
        val e = t(s, dir, "events").select(col("event_type").as("g"),
          floor(col("value") * lit(1.0e6)).cast("long").as("u"),
          col("event_id"))
        val w = Window.partitionBy("g").orderBy(col("u"), col("event_id"))
        val r = e.withColumn("rn", row_number().over(w).cast("long"))
          .withColumn("ng",
            count(lit(1)).over(Window.partitionBy("g")).cast("long"))
        val med = r.filter(col("rn") === expr("(ng + 1) div 2"))
          .select(col("g"), col("u").as("med"))
        val z = e.join(broadcast(med), Seq("g"))
          .select(col("g"), abs(col("u") - col("med")).as("z"))
        val grp = z.groupBy("g").agg(count(lit(1)).as("ng"),
          sum("z").as("sg"),
          sum(col("z").cast("decimal(38,0)") * col("z")).as("qg"))
        val agg = grp.agg(count(lit(1)).as("k"), sum("ng").as("n"),
          sum("sg").as("s"), sum("qg").as("q"),
          dsum((col("sg").cast("decimal(38,0)") * col("sg"))
            .cast("double") / col("ng").cast("double")).as("sq"))
        agg.select(col("k").as("n_groups"), col("n").as("n_events"),
            (((col("sq") -
              (col("s").cast("decimal(38,0)") * col("s")).cast("double") /
                col("n").cast("double")) /
              (col("k") - 1).cast("double")) /
              ((col("q").cast("double") - col("sq")) /
                (col("n") - col("k")).cast("double"))).as("bf_f"))
      },
      Some(s"""WITH e AS (SELECT event_type AS g,
            CAST(floor(value * 1000000.0) AS BIGINT) AS u, event_id
          FROM events),
        r AS (SELECT g, u,
            ROW_NUMBER() OVER (PARTITION BY g ORDER BY u, event_id)
              AS rn,
            COUNT(*) OVER (PARTITION BY g) AS ng
          FROM e),
        med AS (SELECT g, u AS med FROM r WHERE rn = (ng + 1) // 2),
        z AS (SELECT e.g, ABS(e.u - med.med) AS z
          FROM e JOIN med USING (g)),
        grp AS (SELECT g, CAST(COUNT(*) AS BIGINT) AS ng,
            CAST(SUM(z) AS BIGINT) AS sg,
            SUM(CAST(z AS HUGEINT) * z) AS qg
          FROM z GROUP BY g),
        agg AS (SELECT CAST(COUNT(*) AS BIGINT) AS k,
            CAST(SUM(ng) AS BIGINT) AS n,
            CAST(SUM(sg) AS BIGINT) AS s,
            SUM(qg) AS q,
            ${dsumSql(
          "CAST(CAST(sg AS HUGEINT) * sg AS DOUBLE) / CAST(ng AS DOUBLE)")}
              AS sq
          FROM grp)
        SELECT k AS n_groups, n AS n_events,
          ((sq - CAST(CAST(s AS HUGEINT) * s AS DOUBLE)
              / CAST(n AS DOUBLE)) / CAST(k - 1 AS DOUBLE))
            / ((CAST(q AS DOUBLE) - sq) / CAST(n - k AS DOUBLE)) AS bf_f
        FROM agg""")),

    // ── Cohort LTV accumulation curve (q348) ───────────────────────────
    // The VALUE companion of q117's count-retention matrix: per signup
    // cohort (first-activity week) and age, cumulative spend per
    // cohort member — the curve an LTV model is fit to. Spend rides
    // exact micro-units; the cumulative window runs over the bounded
    // (cohort × age) grid, cohort sizes are one distinct-count, and
    // each output is a single int→double division. Two user-keyed
    // shuffles (cohort assignment, grid aggregation) regardless of
    // corpus size.
    QueryDef("q348_cohort_ltv",
      (s, dir) => {
        val e = t(s, dir, "events").select(col("user_id"),
          expr("unix_micros(ts) div 604800000000").as("wk"),
          floor(col("value") * lit(1.0e6)).cast("long").as("u"))
        val c = e.withColumn("cohort",
          min("wk").over(Window.partitionBy("user_id")))
        val sizes = c.groupBy("cohort")
          .agg(countDistinct(col("user_id")).as("n_users"))
        val grid = c.groupBy(col("cohort"), (col("wk") - col("cohort"))
            .as("age_weeks"))
          .agg(sum("u").as("su"))
        val wc = Window.partitionBy("cohort").orderBy("age_weeks")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        grid.withColumn("cum", sum("su").over(wc))
          .join(broadcast(sizes), Seq("cohort"))
          .select(col("cohort").as("cohort_week"), col("age_weeks"),
            col("n_users"),
            (col("cum").cast("double") / col("n_users").cast("double") /
              lit(1.0e6)).as("ltv_per_user"))
          .orderBy("cohort_week", "age_weeks")
      },
      Some("""WITH e AS (SELECT user_id,
            epoch_us(ts) // 604800000000 AS wk,
            CAST(floor(value * 1000000.0) AS BIGINT) AS u
          FROM events),
        c AS (SELECT user_id, wk, u,
            MIN(wk) OVER (PARTITION BY user_id) AS cohort FROM e),
        sizes AS (SELECT cohort,
            CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users
          FROM c GROUP BY 1),
        grid AS (SELECT cohort, wk - cohort AS age_weeks,
            CAST(SUM(u) AS BIGINT) AS su
          FROM c GROUP BY 1, 2),
        cum AS (SELECT cohort, age_weeks,
            CAST(SUM(su) OVER (PARTITION BY cohort ORDER BY age_weeks
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
              AS BIGINT) AS cum
          FROM grid)
        SELECT cum.cohort AS cohort_week, cum.age_weeks, sizes.n_users,
          CAST(cum.cum AS DOUBLE) / CAST(sizes.n_users AS DOUBLE)
            / 1000000.0 AS ltv_per_user
        FROM cum JOIN sizes USING (cohort)
        ORDER BY cohort_week, age_weeks""")),

    // ── Welch's heteroscedastic one-way ANOVA (q349) ───────────────────
    // The k-group version of the Welch t (q122), closing the ANOVA
    // triptych: classic F assumes equal variances (q281), Brown–
    // Forsythe TESTS the variances (q347), Welch compares MEANS without
    // the equal-variance assumption. Everything assembles from five
    // per-group exact integer moments (n, Σu, Σu² on micro-units;
    // squares on decimal(38,0)/HUGEINT); the weighted grand mean and
    // Σh ride the decimal rail so both engines fold the five group
    // terms in identical order-independence. One scan, one 5-row
    // aggregate, literal-mirrored double chains.
    QueryDef("q349_welch_anova",
      (s, dir) => {
        val o = t(s, dir, "orders").select(
          substring(col("o_orderpriority"), 1, 1).cast("long").as("g"),
          floor(col("o_totalprice") * lit(1.0e6)).cast("long").as("u"))
        val grp = o.groupBy("g").agg(count(lit(1)).as("ng"),
            sum("u").as("sg"),
            sum(col("u").cast("decimal(38,0)") * col("u")).as("qg"))
          // per-group sample variance and weight w = n/s², all from
          // exact moments; mean in micro-units stays a single division
          .select(col("g"), col("ng"),
            (col("sg").cast("double") / col("ng").cast("double") /
              lit(1.0e6)).as("mg"),
            ((col("ng").cast("decimal(38,0)") * col("qg") -
              col("sg").cast("decimal(38,0)") * col("sg"))
              .cast("double") /
              (col("ng").cast("decimal(38,0)") *
                (col("ng") - 1).cast("decimal(38,0)")).cast("double") /
              lit(1.0e12)).as("s2"))
          .select(col("g"), col("ng"), col("mg"),
            (col("ng").cast("double") / col("s2")).as("w"))
          .localCheckpoint()
        val tot = grp.agg(count(lit(1)).as("k"), sum("ng").as("n"),
          dsum(col("w")).as("sw"), dsum(col("w") * col("mg")).as("swm"))
        val h = grp.crossJoin(broadcast(tot))
          .select(col("k"), col("n"), col("sw"), col("swm"),
            ((lit(1.0) - col("w") / col("sw")) *
              (lit(1.0) - col("w") / col("sw")) /
              (col("ng") - 1).cast("double")).as("hg"),
            (col("w") * (col("mg") - col("swm") / col("sw")) *
              (col("mg") - col("swm") / col("sw"))).as("num_g"))
        h.groupBy("k", "n")
          .agg(dsum(col("hg")).as("sh"), dsum(col("num_g")).as("snum"))
          .select(col("n").as("n_orders"), col("k").as("n_groups"),
            ((col("snum") / (col("k") - 1).cast("double")) /
              (lit(1.0) +
                lit(2.0) * (col("k") - 2).cast("double") /
                ((col("k") * col("k") - 1).cast("double")) * col("sh")))
              .as("welch_f"),
            (((col("k") * col("k") - 1).cast("double")) /
              (lit(3.0) * col("sh"))).as("df2"))
      },
      Some(s"""WITH o AS (SELECT
            CAST(substr(o_orderpriority, 1, 1) AS BIGINT) AS g,
            CAST(floor(o_totalprice * 1000000.0) AS BIGINT) AS u
          FROM orders),
        grp0 AS (SELECT g, CAST(COUNT(*) AS BIGINT) AS ng,
            CAST(SUM(u) AS BIGINT) AS sg,
            SUM(CAST(u AS HUGEINT) * u) AS qg
          FROM o GROUP BY g),
        grp1 AS (SELECT g, ng,
            CAST(sg AS DOUBLE) / CAST(ng AS DOUBLE) / 1000000.0 AS mg,
            CAST(CAST(ng AS HUGEINT) * qg - CAST(sg AS HUGEINT) * sg
                AS DOUBLE) /
              CAST(CAST(ng AS HUGEINT) * (ng - 1) AS DOUBLE)
              / 1000000000000.0 AS s2
          FROM grp0),
        grp AS (SELECT g, ng, mg,
            CAST(ng AS DOUBLE) / s2 AS w FROM grp1),
        tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS k,
            CAST(SUM(ng) AS BIGINT) AS n,
            ${dsumSql("w")} AS sw, ${dsumSql("w * mg")} AS swm
          FROM grp),
        h AS (SELECT k, n, sw, swm,
            (1.0 - w / sw) * (1.0 - w / sw) / CAST(ng - 1 AS DOUBLE)
              AS hg,
            w * (mg - swm / sw) * (mg - swm / sw) AS num_g
          FROM grp CROSS JOIN tot),
        f AS (SELECT k, n, ${dsumSql("hg")} AS sh,
            ${dsumSql("num_g")} AS snum
          FROM h GROUP BY k, n)
        SELECT n AS n_orders, k AS n_groups,
          (snum / CAST(k - 1 AS DOUBLE)) /
            (1.0 + 2.0 * CAST(k - 2 AS DOUBLE)
              / CAST(k * k - 1 AS DOUBLE) * sh) AS welch_f,
          CAST(k * k - 1 AS DOUBLE) / (3.0 * sh) AS df2
        FROM f""")),

    // ── Qini uplift curve and coefficient (q350) ───────────────────────
    // Uplift evaluation the plain gains curve (q205) can't do: with
    // hash-randomized arms (the q252 assignment), rank users by the
    // deterministic 999-bucket score, and per score-decile accumulate
    // Qini(k) = Y_t(k) − Y_c(k)·N_t(k)/N_c(k) — incremental
    // conversions vs the control baseline at equal depth. All inputs
    // are exact integer counts on the bounded decile grid; the random
    // baseline is Qini(10)·k/10 and the coefficient sums the per-depth
    // gaps on the decimal rail. One user-level aggregate + a 10-row
    // pass.
    QueryDef("q350_qini",
      (s, dir) => {
        val u = t(s, dir, "events").groupBy("user_id")
          .agg(max(when(col("event_type") === "purchase", 1L)
            .otherwise(0L)).as("y"))
          .select(col("user_id"), col("y"),
            (Shingles.baseHash(col("user_id").cast("string")) % 2)
              .as("arm"),
            (Shingles.baseHash(concat(lit("s|"),
              col("user_id").cast("string"))) % 999).as("m"))
        val d = u.groupBy(expr("m * 10 div 999").as("decile"))
          .agg(sum(when(col("arm") === 1, 1L).otherwise(0L)).as("nt"),
            sum(when(col("arm") === 1, col("y")).otherwise(0L)).as("yt"),
            sum(when(col("arm") === 0, 1L).otherwise(0L)).as("nc"),
            sum(when(col("arm") === 0, col("y")).otherwise(0L)).as("yc"))
        val wc = boundedWindow(desc("decile"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        val cum = d
          .withColumn("cnt", sum("nt").over(wc))
          .withColumn("cyt", sum("yt").over(wc))
          .withColumn("cnc", sum("nc").over(wc))
          .withColumn("cyc", sum("yc").over(wc))
          .withColumn("qini",
            when(col("cnc") > 0,
              col("cyt").cast("double") -
                col("cyc").cast("double") * col("cnt").cast("double") /
                  col("cnc").cast("double")))
          .withColumn("depth",
            row_number().over(boundedWindow(desc("decile")))
              .cast("long"))
          .localCheckpoint()
        val last = cum.orderBy(desc("depth")).limit(1)
          .select(col("qini").as("q_final"),
            col("depth").as("max_depth"))
        cum.crossJoin(broadcast(last))
          .select(col("depth"), col("decile"), col("cnt").as("n_treated"),
            col("cyt").as("y_treated"), col("cnc").as("n_control"),
            col("cyc").as("y_control"), col("qini"),
            (col("qini") - col("q_final") * col("depth").cast("double") /
              col("max_depth").cast("double")).as("qini_above_random"))
          .orderBy("depth")
      },
      Some(s"""WITH u AS (SELECT user_id,
            CAST(MAX(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
              AS BIGINT) AS y
          FROM events GROUP BY 1),
        ua AS (SELECT y,
            ('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 7))::BIGINT
              % 2 AS arm,
            ('0x' || substr(md5('s|' || CAST(user_id AS VARCHAR)), 1, 7))
              ::BIGINT % 999 AS m
          FROM u),
        d AS (SELECT m * 10 // 999 AS decile,
            CAST(SUM(CASE WHEN arm = 1 THEN 1 ELSE 0 END) AS BIGINT)
              AS nt,
            CAST(SUM(CASE WHEN arm = 1 THEN y ELSE 0 END) AS BIGINT)
              AS yt,
            CAST(SUM(CASE WHEN arm = 0 THEN 1 ELSE 0 END) AS BIGINT)
              AS nc,
            CAST(SUM(CASE WHEN arm = 0 THEN y ELSE 0 END) AS BIGINT)
              AS yc
          FROM ua GROUP BY 1),
        cum AS (SELECT decile,
            CAST(SUM(nt) OVER w AS BIGINT) AS cnt,
            CAST(SUM(yt) OVER w AS BIGINT) AS cyt,
            CAST(SUM(nc) OVER w AS BIGINT) AS cnc,
            CAST(SUM(yc) OVER w AS BIGINT) AS cyc,
            CAST(row_number() OVER (ORDER BY decile DESC) AS BIGINT)
              AS depth
          FROM d WINDOW w AS (ORDER BY decile DESC
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
        q AS (SELECT depth, decile, cnt, cyt, cnc, cyc,
            CASE WHEN cnc > 0 THEN CAST(cyt AS DOUBLE)
              - CAST(cyc AS DOUBLE)
              * CAST(cnt AS DOUBLE) / CAST(cnc AS DOUBLE) END AS qini
          FROM cum),
        last AS (SELECT qini AS q_final, depth AS max_depth FROM q
          ORDER BY depth DESC LIMIT 1)
        SELECT depth, decile, cnt AS n_treated, cyt AS y_treated,
          cnc AS n_control, cyc AS y_control, qini,
          qini - q_final * CAST(depth AS DOUBLE)
            / CAST(max_depth AS DOUBLE) AS qini_above_random
        FROM q CROSS JOIN last ORDER BY depth""")),

    // ── Holt–Winters additive triple smoothing (q351) ──────────────────
    // The seasonal step past q344's Holt: level + trend + a 7-slot
    // additive weekly seasonal, α = β = γ = ½, zero-seeded seasonal
    // state (documented init — the recursion washes seeds out at ½ per
    // cycle). The three coupled recursions run as the q179/q339/q344
    // integer-scaled fold with a (l, b, s0…s6) accumulator — each step
    // three floor-divs on 1/100-micro-unit state — and the oracle
    // replays the identical recurrence as a recursive CTE carrying the
    // seven seasonal columns, so every scaled value is bit-equal.
    // One-step forecast = l + b + s[(day+1) mod 7]. One scan onto the
    // bounded day grid; the fold is expression work on one row.
    QueryDef("q351_holt_winters",
      (s, dir) => {
        val d = t(s, dir, "events")
          .groupBy(expr("unix_micros(ts) div 86400000000").as("day"))
          .agg(count(lit(1)).as("x"))
          .withColumn("wd", pmod(col("day"), lit(7L)))
        val sPick = "CASE e.wd WHEN 0 THEN acc.s0 WHEN 1 THEN acc.s1 " +
          "WHEN 2 THEN acc.s2 WHEN 3 THEN acc.s3 WHEN 4 THEN acc.s4 " +
          "WHEN 5 THEN acc.s5 ELSE acc.s6 END"
        val lNew = s"(e.x * 100 - ($sPick) + acc.l + acc.b) div 2"
        def sUpd(k: Int) =
          s"CASE WHEN e.wd = $k THEN (e.x * 100 - ($lNew) + acc.s$k) " +
            s"div 2 ELSE acc.s$k END"
        val foldExpr =
          s"""transform(sequence(1, size(arr)), i -> struct(
             arr[i - 1].day as day, arr[i - 1].x as x,
             arr[i - 1].wd as wd,
             aggregate(slice(arr, 2, i - 1), named_struct(
                 'l', arr[0].x * CAST(100 AS BIGINT),
                 'b', CAST(0 AS BIGINT),
                 's0', CAST(0 AS BIGINT), 's1', CAST(0 AS BIGINT),
                 's2', CAST(0 AS BIGINT), 's3', CAST(0 AS BIGINT),
                 's4', CAST(0 AS BIGINT), 's5', CAST(0 AS BIGINT),
                 's6', CAST(0 AS BIGINT)),
               (acc, e) -> named_struct(
                 'l', $lNew,
                 'b', (($lNew) - acc.l + acc.b) div 2,
                 's0', ${sUpd(0)}, 's1', ${sUpd(1)}, 's2', ${sUpd(2)},
                 's3', ${sUpd(3)}, 's4', ${sUpd(4)}, 's5', ${sUpd(5)},
                 's6', ${sUpd(6)})) as st))"""
        val nextS = "CASE pmod(row.day + 1, 7) WHEN 0 THEN row.st.s0 " +
          "WHEN 1 THEN row.st.s1 WHEN 2 THEN row.st.s2 " +
          "WHEN 3 THEN row.st.s3 WHEN 4 THEN row.st.s4 " +
          "WHEN 5 THEN row.st.s5 ELSE row.st.s6 END"
        d.agg(sort_array(collect_list(
            struct(col("day"), col("x"), col("wd")))).as("arr"))
          .select(posexplode(expr(foldExpr)).as(Seq("i", "row")))
          .select(col("row.day").as("day"), col("row.x").as("x"),
            col("row.st.l").as("level_scaled"),
            col("row.st.b").as("trend_scaled"),
            expr(nextS).as("next_seasonal_scaled"),
            (col("row.st.l") + col("row.st.b") + expr(nextS))
              .as("forecast_next_scaled"))
          .orderBy("day")
      },
      Some("""WITH RECURSIVE d AS (SELECT
            epoch_us(ts) // 86400000000 AS day,
            CAST(COUNT(*) AS BIGINT) AS x
          FROM events GROUP BY 1),
        r AS (SELECT day, x, day % 7 AS wd,
            row_number() OVER (ORDER BY day) AS rn FROM d),
        rec AS (
          SELECT rn, day, x, wd, x * 100 AS l, CAST(0 AS BIGINT) AS b,
            CAST(0 AS BIGINT) AS s0, CAST(0 AS BIGINT) AS s1,
            CAST(0 AS BIGINT) AS s2, CAST(0 AS BIGINT) AS s3,
            CAST(0 AS BIGINT) AS s4, CAST(0 AS BIGINT) AS s5,
            CAST(0 AS BIGINT) AS s6
          FROM r WHERE rn = 1
          UNION ALL
          SELECT r.rn, r.day, r.x, r.wd,
            (r.x * 100 - (CASE r.wd WHEN 0 THEN rec.s0 WHEN 1 THEN rec.s1
              WHEN 2 THEN rec.s2 WHEN 3 THEN rec.s3 WHEN 4 THEN rec.s4
              WHEN 5 THEN rec.s5 ELSE rec.s6 END) + rec.l + rec.b) // 2,
            (((r.x * 100 - (CASE r.wd WHEN 0 THEN rec.s0
              WHEN 1 THEN rec.s1 WHEN 2 THEN rec.s2 WHEN 3 THEN rec.s3
              WHEN 4 THEN rec.s4 WHEN 5 THEN rec.s5 ELSE rec.s6 END)
              + rec.l + rec.b) // 2) - rec.l + rec.b) // 2,
            CASE WHEN r.wd = 0 THEN (r.x * 100 - ((r.x * 100
              - rec.s0 + rec.l + rec.b) // 2) + rec.s0) // 2
              ELSE rec.s0 END,
            CASE WHEN r.wd = 1 THEN (r.x * 100 - ((r.x * 100
              - rec.s1 + rec.l + rec.b) // 2) + rec.s1) // 2
              ELSE rec.s1 END,
            CASE WHEN r.wd = 2 THEN (r.x * 100 - ((r.x * 100
              - rec.s2 + rec.l + rec.b) // 2) + rec.s2) // 2
              ELSE rec.s2 END,
            CASE WHEN r.wd = 3 THEN (r.x * 100 - ((r.x * 100
              - rec.s3 + rec.l + rec.b) // 2) + rec.s3) // 2
              ELSE rec.s3 END,
            CASE WHEN r.wd = 4 THEN (r.x * 100 - ((r.x * 100
              - rec.s4 + rec.l + rec.b) // 2) + rec.s4) // 2
              ELSE rec.s4 END,
            CASE WHEN r.wd = 5 THEN (r.x * 100 - ((r.x * 100
              - rec.s5 + rec.l + rec.b) // 2) + rec.s5) // 2
              ELSE rec.s5 END,
            CASE WHEN r.wd = 6 THEN (r.x * 100 - ((r.x * 100
              - rec.s6 + rec.l + rec.b) // 2) + rec.s6) // 2
              ELSE rec.s6 END
          FROM rec JOIN r ON r.rn = rec.rn + 1)
        SELECT day, x,
          CAST(l AS BIGINT) AS level_scaled,
          CAST(b AS BIGINT) AS trend_scaled,
          CAST(CASE (day + 1) % 7 WHEN 0 THEN s0 WHEN 1 THEN s1
            WHEN 2 THEN s2 WHEN 3 THEN s3 WHEN 4 THEN s4
            WHEN 5 THEN s5 ELSE s6 END AS BIGINT)
            AS next_seasonal_scaled,
          CAST(l + b + CASE (day + 1) % 7 WHEN 0 THEN s0 WHEN 1 THEN s1
            WHEN 2 THEN s2 WHEN 3 THEN s3 WHEN 4 THEN s4
            WHEN 5 THEN s5 ELSE s6 END AS BIGINT)
            AS forecast_next_scaled
        FROM rec ORDER BY day""")),

    // ── Dynamic time warping between two daily series (q352) ───────────
    // Alignment-tolerant series similarity the lead–lag matrix (q248)
    // can't express: the full DTW dynamic program between the daily
    // purchase and view volume curves, exact integer |Δ| costs, run as
    // a nested fold over the bounded day grid — outer fold over rows,
    // inner fold building each DP row left-to-right (the q179 fold
    // idiom squared; |days|² lambda steps on one driver-free row). The
    // oracle replays the identical DP with DuckDB's list_reduce using
    // the seed-by-prepend + singleton-list-element trick (its 2-arg
    // reduce requires accumulator and element types to match). DTW on
    // same-length grids; normalized by path length 2n−1.
    QueryDef("q352_dtw",
      (s, dir) => {
        val g = t(s, dir, "events")
          .groupBy(expr("unix_micros(ts) div 86400000000").as("day"))
          .agg(sum(when(col("event_type") === "purchase", 1L)
            .otherwise(0L)).as("pa"),
            sum(when(col("event_type") === "view", 1L).otherwise(0L))
              .as("pv"))
        val dp =
          """aggregate(slice(ax, 2, size(ax) - 1),
             aggregate(sequence(1, size(bx)),
               cast(array() as array<bigint>),
               (r, j) -> concat(r, array(
                 abs(ax[0] - bx[j - 1]) +
                   coalesce(try_element_at(r, -1), CAST(0 AS BIGINT))))),
             (prev, ai) -> aggregate(sequence(1, size(bx)),
               cast(array() as array<bigint>),
               (r, j) -> concat(r, array(abs(ai - bx[j - 1]) +
                 CASE WHEN j = 1 THEN element_at(prev, 1)
                 ELSE least(element_at(prev, j),
                   element_at(prev, j - 1), element_at(r, -1))
                 END))))"""
        g.agg(sort_array(collect_list(
            struct(col("day"), col("pa"), col("pv")))).as("arr"))
          .select(size(col("arr")).cast("long").as("n_days"),
            expr("transform(arr, e -> e.pa)").as("ax"),
            expr("transform(arr, e -> e.pv)").as("bx"))
          .select(col("n_days"),
            expr(s"element_at($dp, -1)").as("dtw_distance"))
          .select(col("n_days"), col("dtw_distance"),
            (col("dtw_distance").cast("double") /
              (lit(2) * col("n_days") - 1).cast("double"))
              .as("dtw_per_step"))
      },
      Some("""WITH g AS (SELECT epoch_us(ts) // 86400000000 AS day,
            CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
              AS BIGINT) AS pa,
            CAST(SUM(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END)
              AS BIGINT) AS pv
          FROM events GROUP BY 1),
        arrs AS (SELECT
            list(pa ORDER BY day) AS ax, list(pv ORDER BY day) AS bx,
            CAST(COUNT(*) AS BIGINT) AS n_days
          FROM g),
        dp AS (SELECT n_days,
            list_reduce(
              list_prepend(
                list_reduce(
                  list_prepend(CAST([] AS BIGINT[]),
                    list_transform(range(1, len(bx) + 1), j -> [j])),
                  (r, x) -> list_append(r,
                    abs(ax[1] - bx[x[1]]) + COALESCE(r[-1], 0))),
                list_transform(ax[2:], v -> [v])),
              (prev, e) -> list_reduce(
                list_prepend(CAST([] AS BIGINT[]),
                  list_transform(range(1, len(bx) + 1), j -> [j])),
                (r, x) -> list_append(r, abs(e[1] - bx[x[1]]) +
                  CASE WHEN x[1] = 1 THEN prev[1]
                  ELSE least(prev[x[1]], prev[x[1] - 1], r[-1])
                  END))) AS row
          FROM arrs)
        SELECT n_days, CAST(row[-1] AS BIGINT) AS dtw_distance,
          CAST(row[-1] AS DOUBLE) / CAST(2 * n_days - 1 AS DOUBLE)
            AS dtw_per_step
        FROM dp""")),

    // ── Kernel two-sample test: MMD², quadratic kernel (q353) ──────────
    // Do the two embedding label halves come from the same
    // distribution? Maximum mean discrepancy with k(x,y) = (1+⟨x,y⟩)²
    // — chosen because the V-statistic COLLAPSES TO MOMENTS (no ln, no
    // exp, no pairs): Σᵢⱼ⟨xᵢ,xⱼ⟩ = Σ_a s_a² and Σᵢⱼ⟨xᵢ,xⱼ⟩² = Σ_ab
    // m_ab² with s the per-dim sum vector and m the d×d second-moment
    // matrix. So a kernel test over ANY corpus size is two bounded
    // moment tables (d + d² railed sums per group — the outer product
    // is generated map-side per row, no self-join) plus a literal
    // chain. The float→double element casts are exact; every
    // cross-row sum rides the decimal rail.
    QueryDef("q353_mmd",
      (s, dir) => {
        val e = tPar(s, dir, "embeddings").select(
          when(col("label") < 5, lit("x")).otherwise(lit("y")).as("grp"),
          col("embedding"))
        val dims = e.select(col("grp"),
          posexplode(col("embedding")).as(Seq("a", "va")))
          .select(col("grp"), col("a"), col("va").cast("double").as("va"))
        val sVec = dims.groupBy("grp", "a")
          .agg(dsum(col("va")).as("sa")).localCheckpoint()
        val pairs = e.select(col("grp"), explode(expr(
          """flatten(transform(sequence(0, size(embedding) - 1),
             a -> transform(sequence(0, size(embedding) - 1),
               b -> struct(a as a, b as b,
                 CAST(embedding[a] AS DOUBLE) *
                   CAST(embedding[b] AS DOUBLE) as p))))""")).as("e"))
          .select(col("grp"), col("e.a"), col("e.b"), col("e.p"))
        val mMat = pairs.groupBy("grp", "a", "b")
          .agg(dsum(col("p")).as("m")).localCheckpoint()
        val ns = e.groupBy("grp").agg(count(lit(1)).as("n"))
        val nx = ns.filter(col("grp") === "x").select(col("n").as("nx"))
        val ny = ns.filter(col("grp") === "y").select(col("n").as("ny"))
        val s2 = sVec.groupBy("grp")
          .agg(dsum(col("sa") * col("sa")).as("ss"))
        val sCross = sVec.filter(col("grp") === "x").select(col("a"),
            col("sa").as("sx"))
          .join(sVec.filter(col("grp") === "y").select(col("a"),
            col("sa").as("sy")), Seq("a"))
          .agg(dsum(col("sx") * col("sy")).as("sxy"))
        val m2 = mMat.groupBy("grp")
          .agg(dsum(col("m") * col("m")).as("mm"))
        val mCross = mMat.filter(col("grp") === "x").select(col("a"),
            col("b"), col("m").as("mx"))
          .join(mMat.filter(col("grp") === "y").select(col("a"),
            col("b"), col("m").as("my")), Seq("a", "b"))
          .agg(dsum(col("mx") * col("my")).as("mxy"))
        def pick(d: DataFrame, g: String, c: String, as: String) =
          broadcast(d.filter(col("grp") === g).select(col(c).as(as)))
        nx.crossJoin(broadcast(ny))
          .crossJoin(pick(s2, "x", "ss", "ssx"))
          .crossJoin(pick(s2, "y", "ss", "ssy"))
          .crossJoin(broadcast(sCross))
          .crossJoin(pick(m2, "x", "mm", "mmx"))
          .crossJoin(pick(m2, "y", "mm", "mmy"))
          .crossJoin(broadcast(mCross))
          .select(col("nx").as("n_x"), col("ny").as("ny0"),
            (lit(1.0) + lit(2.0) * col("ssx") /
              (col("nx").cast("double") * col("nx").cast("double")) +
              col("mmx") /
              (col("nx").cast("double") * col("nx").cast("double")))
              .as("e_xx"),
            (lit(1.0) + lit(2.0) * col("ssy") /
              (col("ny").cast("double") * col("ny").cast("double")) +
              col("mmy") /
              (col("ny").cast("double") * col("ny").cast("double")))
              .as("e_yy"),
            (lit(1.0) + lit(2.0) * col("sxy") /
              (col("nx").cast("double") * col("ny").cast("double")) +
              col("mxy") /
              (col("nx").cast("double") * col("ny").cast("double")))
              .as("e_xy"))
          .select(col("n_x"), col("ny0").as("n_y"), col("e_xx"),
            col("e_yy"), col("e_xy"),
            (col("e_xx") + col("e_yy") - lit(2.0) * col("e_xy"))
              .as("mmd2"))
      },
      Some(s"""WITH e AS (SELECT
            CASE WHEN label < 5 THEN 'x' ELSE 'y' END AS grp,
            embedding
          FROM embeddings),
        t1 AS (SELECT grp, embedding,
            unnest(range(1, len(embedding) + 1)) AS a FROM e),
        dims AS (SELECT grp, a - 1 AS a,
            CAST(embedding[CAST(a AS INT)] AS DOUBLE) AS va FROM t1),
        svec AS (SELECT grp, a, ${dsumSql("va")} AS sa
          FROM dims GROUP BY 1, 2),
        p1 AS (SELECT grp, embedding, a,
            unnest(range(1, len(embedding) + 1)) AS b FROM t1),
        pairs AS (SELECT grp, a - 1 AS a, b - 1 AS b,
            CAST(embedding[CAST(a AS INT)] AS DOUBLE) *
              CAST(embedding[CAST(b AS INT)] AS DOUBLE) AS p
          FROM p1),
        mmat AS (SELECT grp, a, b, ${dsumSql("p")} AS m
          FROM pairs GROUP BY 1, 2, 3),
        ns AS (SELECT grp, CAST(COUNT(*) AS BIGINT) AS n
          FROM e GROUP BY 1),
        s2 AS (SELECT grp, ${dsumSql("sa * sa")} AS ss
          FROM svec GROUP BY 1),
        scross AS (SELECT ${dsumSql("x.sa * y.sa")} AS sxy
          FROM (SELECT a, sa FROM svec WHERE grp = 'x') x
          JOIN (SELECT a, sa FROM svec WHERE grp = 'y') y USING (a)),
        m2 AS (SELECT grp, ${dsumSql("m * m")} AS mm
          FROM mmat GROUP BY 1),
        mcross AS (SELECT ${dsumSql("x.m * y.m")} AS mxy
          FROM (SELECT a, b, m FROM mmat WHERE grp = 'x') x
          JOIN (SELECT a, b, m FROM mmat WHERE grp = 'y') y
            USING (a, b)),
        fin AS (SELECT
            (SELECT n FROM ns WHERE grp = 'x') AS n_x,
            (SELECT n FROM ns WHERE grp = 'y') AS n_y,
            1.0 + 2.0 * (SELECT ss FROM s2 WHERE grp = 'x')
              / (CAST((SELECT n FROM ns WHERE grp = 'x') AS DOUBLE)
                * CAST((SELECT n FROM ns WHERE grp = 'x') AS DOUBLE))
              + (SELECT mm FROM m2 WHERE grp = 'x')
              / (CAST((SELECT n FROM ns WHERE grp = 'x') AS DOUBLE)
                * CAST((SELECT n FROM ns WHERE grp = 'x') AS DOUBLE))
              AS e_xx,
            1.0 + 2.0 * (SELECT ss FROM s2 WHERE grp = 'y')
              / (CAST((SELECT n FROM ns WHERE grp = 'y') AS DOUBLE)
                * CAST((SELECT n FROM ns WHERE grp = 'y') AS DOUBLE))
              + (SELECT mm FROM m2 WHERE grp = 'y')
              / (CAST((SELECT n FROM ns WHERE grp = 'y') AS DOUBLE)
                * CAST((SELECT n FROM ns WHERE grp = 'y') AS DOUBLE))
              AS e_yy,
            1.0 + 2.0 * (SELECT sxy FROM scross)
              / (CAST((SELECT n FROM ns WHERE grp = 'x') AS DOUBLE)
                * CAST((SELECT n FROM ns WHERE grp = 'y') AS DOUBLE))
              + (SELECT mxy FROM mcross)
              / (CAST((SELECT n FROM ns WHERE grp = 'x') AS DOUBLE)
                * CAST((SELECT n FROM ns WHERE grp = 'y') AS DOUBLE))
              AS e_xy)
        SELECT n_x, n_y, e_xx, e_yy, e_xy,
          e_xx + e_yy - 2.0 * e_xy AS mmd2
        FROM fin""")),

    // ── Hodges–Lehmann shift + pseudo-median (q354) ─────────────────────
    // The ROBUST effect-size companion of Mann–Whitney (q152) and the
    // Wilcoxon signed-rank (q301): those answer "is there a shift?",
    // this answers "HOW BIG is it, in the data's own units" — the
    // median of all pairwise purchase−view daily-value differences
    // (two-sample HL shift) and the median of Walsh averages of the
    // purchase series (one-sample pseudo-median). Day-grid bounded:
    // both pair sets are ≤|days|², micro-unit longs end to end, and
    // the order statistic is picked by row_number with a full
    // deterministic (value, day, day) tie-break; even counts average
    // the two middle longs — one exact sum/count division per engine.
    QueryDef("q354_hodges_lehmann",
      (s, dir) => {
        val daily = t(s, dir, "events")
          .filter(col("event_type").isin("purchase", "view"))
          .groupBy(expr("unix_micros(ts) div 86400000000").as("day"),
            col("event_type"))
          .agg(sum(floor(col("value") * lit(1.0e6)).cast("long")).as("u"))
          .localCheckpoint()
        val x = daily.filter(col("event_type") === "purchase")
          .select(col("day").as("dx"), col("u").as("ux"))
        val y = daily.filter(col("event_type") === "view")
          .select(col("day").as("dy"), col("u").as("uy"))
        val ns = x.agg(count(lit(1)).as("nx"))
          .crossJoin(y.agg(count(lit(1)).as("ny")))
        val diffs = x.crossJoin(broadcast(y))
          .select((col("ux") - col("uy")).as("d"), col("dx"), col("dy"))
          .withColumn("rk", row_number()
            .over(boundedWindow(col("d"), col("dx"), col("dy")))
            .cast("long"))
        val hl = diffs.crossJoin(broadcast(ns))
          .filter(col("rk") === expr("(nx * ny + 1) div 2") ||
            col("rk") === expr("nx * ny div 2 + 1"))
          .agg((sum("d") / count(lit(1)) / lit(1.0e6)).as("hl_shift"))
        val walsh = x.as("a")
          .join(broadcast(x).as("b"), col("a.dx") <= col("b.dx"))
          .select((col("a.ux") + col("b.ux")).as("w"),
            col("a.dx").as("da"), col("b.dx").as("db"))
          .withColumn("rk", row_number()
            .over(boundedWindow(col("w"), col("da"), col("db")))
            .cast("long"))
        val pm = walsh.crossJoin(broadcast(ns))
          .filter(col("rk") === expr("(nx * (nx + 1) div 2 + 1) div 2") ||
            col("rk") === expr("nx * (nx + 1) div 2 div 2 + 1"))
          .agg((sum("w") / count(lit(1)) / lit(2.0e6))
            .as("pseudo_median"))
        ns.crossJoin(broadcast(hl)).crossJoin(broadcast(pm))
          .select(col("nx").as("n_purchase_days"),
            col("ny").as("n_view_days"), col("hl_shift"),
            col("pseudo_median"))
      },
      Some("""WITH daily AS (SELECT epoch_us(ts) // 86400000000 AS day,
            event_type,
            CAST(SUM(CAST(floor(value * 1000000.0) AS BIGINT)) AS BIGINT)
              AS u
          FROM events WHERE event_type IN ('purchase', 'view')
          GROUP BY 1, 2),
        x AS (SELECT day AS dx, u AS ux FROM daily
          WHERE event_type = 'purchase'),
        y AS (SELECT day AS dy, u AS uy FROM daily
          WHERE event_type = 'view'),
        ns AS (SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM x) AS nx,
          (SELECT CAST(COUNT(*) AS BIGINT) FROM y) AS ny),
        diffs AS (SELECT ux - uy AS d, dx, dy,
            CAST(ROW_NUMBER() OVER (ORDER BY ux - uy, dx, dy) AS BIGINT)
              AS rk
          FROM x CROSS JOIN y),
        hl AS (SELECT SUM(d) / COUNT(*) / 1000000.0 AS hl_shift
          FROM diffs CROSS JOIN ns
          WHERE rk = (nx * ny + 1) // 2 OR rk = nx * ny // 2 + 1),
        walsh AS (SELECT a.ux + b.ux AS w, a.dx AS da, b.dx AS db,
            CAST(ROW_NUMBER() OVER (ORDER BY a.ux + b.ux, a.dx, b.dx)
              AS BIGINT) AS rk
          FROM x a JOIN x b ON a.dx <= b.dx),
        pm AS (SELECT SUM(w) / COUNT(*) / 2000000.0 AS pseudo_median
          FROM walsh CROSS JOIN ns
          WHERE rk = (nx * (nx + 1) // 2 + 1) // 2
            OR rk = nx * (nx + 1) // 2 // 2 + 1)
        SELECT nx AS n_purchase_days, ny AS n_view_days, hl_shift,
          pseudo_median
        FROM ns CROSS JOIN hl CROSS JOIN pm""")),

    // ── Two-sample Anderson–Darling on daily revenue (q355) ─────────────
    // The TAIL-sensitive sibling of KS (q151) and Cramér–von Mises
    // (q334): the 1/(B(N−B)) weight makes A² catch distribution
    // differences in the extremes that KS's sup-norm misses — exactly
    // where revenue anomalies live. Weekday vs weekend daily purchase
    // totals (micro-unit longs); the DISCRETE ties form (Pettitt 1976):
    // over pooled distinct values with block-end cumulative counts M
    // (weekday side) and B (pooled), A² = Σ t·(N·M − m·B)²/(m·n·B·(N−B))
    // excluding the last block. Squared terms ride decimal(38,0)/
    // HUGEINT; each block's quotient is one mirrored double; the sum
    // takes the dsum rail. |distinct values| ≤ |days| — grid-bounded.
    QueryDef("q355_anderson_darling",
      (s, dir) => {
        val daily = t(s, dir, "events")
          .filter(col("event_type") === "purchase")
          .groupBy(expr("unix_micros(ts) div 86400000000").as("day"))
          .agg(sum(floor(col("value") * lit(1.0e6)).cast("long")).as("u"))
          .select(col("u"),
            (expr("(day + 4) % 7").isin(0, 6)).cast("long").as("we"))
        val blocks = daily.groupBy("u")
          .agg(count(lit(1)).as("t"), sum(lit(1L) - col("we")).as("a"))
        val cum = blocks
          .withColumn("bb", sum("t").over(boundedWindow("u")))
          .withColumn("mm", sum("a").over(boundedWindow("u")))
          .localCheckpoint()
        val ms = cum.agg(max("bb").as("nn"), max("mm").as("m"))
        cum.crossJoin(broadcast(ms))
          .filter(col("bb") < col("nn"))
          .select(col("t"), col("bb"), col("nn"), col("m"),
            (col("nn").cast("decimal(38,0)") * col("mm") -
              col("m").cast("decimal(38,0)") * col("bb")).as("num"))
          .agg(max("m").as("m_weekday"),
            (max("nn") - max("m")).as("n_weekend"),
            dsum(col("t").cast("double") *
              (col("num") * col("num")).cast("double") /
              (col("m").cast("double") *
                (col("nn") - col("m")).cast("double") *
                col("bb").cast("double") *
                (col("nn") - col("bb")).cast("double"))).as("a2"))
      },
      Some(s"""WITH daily AS (SELECT
            CAST(SUM(CAST(floor(value * 1000000.0) AS BIGINT)) AS BIGINT)
              AS u,
            CASE WHEN (epoch_us(ts) // 86400000000 + 4) % 7 IN (0, 6)
              THEN 1 ELSE 0 END AS we
          FROM events WHERE event_type = 'purchase'
          GROUP BY epoch_us(ts) // 86400000000,
            CASE WHEN (epoch_us(ts) // 86400000000 + 4) % 7 IN (0, 6)
              THEN 1 ELSE 0 END),
        blocks AS (SELECT u, CAST(COUNT(*) AS BIGINT) AS t,
            CAST(SUM(1 - we) AS BIGINT) AS a
          FROM daily GROUP BY 1),
        cum AS (SELECT t,
            CAST(SUM(t) OVER (ORDER BY u) AS BIGINT) AS bb,
            CAST(SUM(a) OVER (ORDER BY u) AS BIGINT) AS mm
          FROM blocks),
        ms AS (SELECT MAX(bb) AS nn, MAX(mm) AS m FROM cum),
        terms AS (SELECT t, bb, nn, m,
            CAST(nn AS HUGEINT) * mm - CAST(m AS HUGEINT) * bb AS num
          FROM cum CROSS JOIN ms WHERE bb < nn)
        SELECT MAX(m) AS m_weekday, MAX(nn) - MAX(m) AS n_weekend,
          ${dsumSql("""CAST(t AS DOUBLE) * CAST(num * num AS DOUBLE)
            / (CAST(m AS DOUBLE) * CAST(nn - m AS DOUBLE)
              * CAST(bb AS DOUBLE) * CAST(nn - bb AS DOUBLE))""")} AS a2
        FROM terms""")),

    // ── Goodman–Kruskal gamma: priority vs price quintile (q356) ────────
    // The ORDINAL-ASSOCIATION member the family still lacked: Kendall
    // τ-b (q300) penalizes ties, Cramér's V (q292) ignores order —
    // gamma measures monotone association among UNTIED pairs only,
    // the right statistic for two ordered categoricals. Priority digit
    // (1–5) × deterministic price quintile: global rank = cumulative
    // count over the DISTINCT micro-unit price grid (the q346 rank
    // shape — never a raw-row global window) + row_number inside each
    // tie group (per-key window, parallel by price), then (rank−1)·5
    // div n. Everything after the 25-cell contingency fold is a
    // bounded 25×25 self-join of exact integer products on the
    // decimal(38,0)/HUGEINT rail.
    QueryDef("q356_goodman_kruskal_gamma",
      (s, dir) => {
        val o = t(s, dir, "orders").select(
          substring(col("o_orderpriority"), 1, 1).cast("long").as("g"),
          floor(col("o_totalprice") * lit(1.0e6)).cast("long").as("u"),
          col("o_orderkey"))
          .localCheckpoint()
        val n = o.agg(count(lit(1)).as("n"))
        val v = o.groupBy("u").agg(count(lit(1)).as("t"))
        val vm = v.withColumn("cb",
          coalesce(sum("t").over(boundedWindow("u")
            .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
        val q = o.withColumn("rw", row_number()
            .over(Window.partitionBy("u").orderBy("o_orderkey"))
            .cast("long"))
          .join(vm.select("u", "cb"), Seq("u"))
          .crossJoin(broadcast(n))
          .select(col("g"), expr("(cb + rw - 1) * 5 div n").as("q"),
            col("n"))
        val cells = q.groupBy("g", "q").agg(count(lit(1)).as("c"))
          .localCheckpoint()
        val pairs = cells.as("a").join(broadcast(cells).as("b"),
          col("b.g") > col("a.g"))
        val cd = pairs.agg(
          sum(when(col("b.q") > col("a.q"),
            col("a.c").cast("decimal(38,0)") * col("b.c"))
            .otherwise(lit(0).cast("decimal(38,0)"))).as("cc"),
          sum(when(col("b.q") < col("a.q"),
            col("a.c").cast("decimal(38,0)") * col("b.c"))
            .otherwise(lit(0).cast("decimal(38,0)"))).as("dd"))
        cd.crossJoin(broadcast(n))
          .select(col("n").as("n_orders"),
            col("cc").cast("long").as("concordant"),
            col("dd").cast("long").as("discordant"),
            ((col("cc") - col("dd")).cast("double") /
              (col("cc") + col("dd")).cast("double")).as("gamma"))
      },
      Some("""WITH o AS (SELECT
            CAST(substr(o_orderpriority, 1, 1) AS BIGINT) AS g,
            CAST(floor(o_totalprice * 1000000.0) AS BIGINT) AS u,
            o_orderkey
          FROM orders),
        n AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM o),
        v AS (SELECT u, CAST(COUNT(*) AS BIGINT) AS t FROM o GROUP BY 1),
        vm AS (SELECT u, COALESCE(SUM(t) OVER (ORDER BY u
            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cb
          FROM v),
        q AS (SELECT g,
            (cb + CAST(ROW_NUMBER() OVER (PARTITION BY o.u
              ORDER BY o_orderkey) AS BIGINT) - 1) * 5 // n AS q
          FROM o JOIN vm ON o.u = vm.u CROSS JOIN n),
        cells AS (SELECT g, q, CAST(COUNT(*) AS BIGINT) AS c
          FROM q GROUP BY 1, 2),
        cd AS (SELECT
            SUM(CASE WHEN b.q > a.q
              THEN CAST(a.c AS HUGEINT) * b.c ELSE 0 END) AS cc,
            SUM(CASE WHEN b.q < a.q
              THEN CAST(a.c AS HUGEINT) * b.c ELSE 0 END) AS dd
          FROM cells a JOIN cells b ON b.g > a.g)
        SELECT n AS n_orders, CAST(cc AS BIGINT) AS concordant,
          CAST(dd AS BIGINT) AS discordant,
          CAST(cc - dd AS DOUBLE) / CAST(cc + dd AS DOUBLE) AS gamma
        FROM cd CROSS JOIN n""")),

    // ── Hoeffding's D: purchases vs clicks dependence (q357) ────────────
    // The NONLINEAR dependence test the correlation stack can't see:
    // Spearman (q299) and Kendall (q300) are blind to non-monotone
    // coupling (a U-shape scores 0); Hoeffding's D tests P(X≤x,Y≤y) =
    // P(X≤x)·P(Y≤y) directly. Daily purchase count vs click count on
    // the shared day grid; one |days|²-bounded self-join yields the
    // per-day lt/eq census, from which doubled midranks R2/S2 and the
    // quarter-scaled bivariate count Q4 are EXACT integers. D1/D2/D3
    // share the uniform /16 rational, so D = 30·((n−2)(n−3)E1 + E2 −
    // 2(n−2)E3) / (16·n(n−1)(n−2)(n−3)(n−4)) with E-sums on the
    // decimal(38,0)/HUGEINT rail — one mirrored final double chain.
    // Ties convention documented here: Q_i = 1 + c_i with c_i the
    // u-function count (1 strict / ½ one-tied / ¼ both-tied, j≠i).
    QueryDef("q357_hoeffding_d",
      (s, dir) => {
        val daily = t(s, dir, "events")
          .filter(col("event_type").isin("purchase", "click"))
          .groupBy(expr("unix_micros(ts) div 86400000000").as("day"))
          .agg(sum(when(col("event_type") === "purchase", 1L)
            .otherwise(0L)).as("x"),
            sum(when(col("event_type") === "click", 1L).otherwise(0L))
              .as("y"))
          .localCheckpoint()
        val cen = daily.as("a").join(broadcast(daily).as("b"),
            col("a.day") =!= col("b.day"))
          .groupBy(col("a.day").as("day"))
          .agg(
            sum(when(col("b.x") < col("a.x"), 1L).otherwise(0L))
              .as("ltx"),
            sum(when(col("b.x") === col("a.x"), 1L).otherwise(0L))
              .as("eqx"),
            sum(when(col("b.y") < col("a.y"), 1L).otherwise(0L))
              .as("lty"),
            sum(when(col("b.y") === col("a.y"), 1L).otherwise(0L))
              .as("eqy"),
            sum(when(col("b.x") < col("a.x") && col("b.y") < col("a.y"),
              4L).otherwise(0L) +
              when(col("b.x") === col("a.x") && col("b.y") < col("a.y"),
                2L).otherwise(0L) +
              when(col("b.x") < col("a.x") && col("b.y") === col("a.y"),
                2L).otherwise(0L) +
              when(col("b.x") === col("a.x") && col("b.y") === col("a.y"),
                1L).otherwise(0L)).as("q4"))
          .select(
            (lit(2L) * col("ltx") + col("eqx") + 2L).as("r2"),
            (lit(2L) * col("lty") + col("eqy") + 2L).as("s2"),
            col("q4"))
        val e = cen.agg(count(lit(1)).as("n"),
          sum(col("q4").cast("decimal(38,0)") * (col("q4") - 4L))
            .as("e1"),
          sum((col("r2") - 2L).cast("decimal(38,0)") * (col("r2") - 4L) *
            (col("s2") - 2L) * (col("s2") - 4L)).as("e2"),
          sum((col("r2") - 4L).cast("decimal(38,0)") * (col("s2") - 4L) *
            col("q4")).as("e3"))
        e.select(col("n").as("n_days"),
          (lit(30.0) *
            ((col("n") - 2L).cast("double") *
              (col("n") - 3L).cast("double") * col("e1").cast("double") +
              col("e2").cast("double") -
              lit(2.0) * (col("n") - 2L).cast("double") *
                col("e3").cast("double")) /
            (lit(16.0) * col("n").cast("double") *
              (col("n") - 1L).cast("double") *
              (col("n") - 2L).cast("double") *
              (col("n") - 3L).cast("double") *
              (col("n") - 4L).cast("double"))).as("hoeffding_d"))
      },
      Some("""WITH daily AS (SELECT epoch_us(ts) // 86400000000 AS day,
            CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
              AS BIGINT) AS x,
            CAST(SUM(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END)
              AS BIGINT) AS y
          FROM events WHERE event_type IN ('purchase', 'click')
          GROUP BY 1),
        cen AS (SELECT a.day,
            CAST(SUM(CASE WHEN b.x < a.x THEN 1 ELSE 0 END) AS BIGINT)
              AS ltx,
            CAST(SUM(CASE WHEN b.x = a.x THEN 1 ELSE 0 END) AS BIGINT)
              AS eqx,
            CAST(SUM(CASE WHEN b.y < a.y THEN 1 ELSE 0 END) AS BIGINT)
              AS lty,
            CAST(SUM(CASE WHEN b.y = a.y THEN 1 ELSE 0 END) AS BIGINT)
              AS eqy,
            CAST(SUM(
              CASE WHEN b.x < a.x AND b.y < a.y THEN 4 ELSE 0 END +
              CASE WHEN b.x = a.x AND b.y < a.y THEN 2 ELSE 0 END +
              CASE WHEN b.x < a.x AND b.y = a.y THEN 2 ELSE 0 END +
              CASE WHEN b.x = a.x AND b.y = a.y THEN 1 ELSE 0 END)
              AS BIGINT) AS q4
          FROM daily a JOIN daily b ON a.day <> b.day
          GROUP BY 1),
        r AS (SELECT 2 * ltx + eqx + 2 AS r2, 2 * lty + eqy + 2 AS s2,
            q4
          FROM cen),
        e AS (SELECT CAST(COUNT(*) AS BIGINT) AS n,
            SUM(CAST(q4 AS HUGEINT) * (q4 - 4)) AS e1,
            SUM(CAST(r2 - 2 AS HUGEINT) * (r2 - 4) * (s2 - 2) * (s2 - 4))
              AS e2,
            SUM(CAST(r2 - 4 AS HUGEINT) * (s2 - 4) * q4) AS e3
          FROM r)
        SELECT n AS n_days,
          30.0 * (CAST(n - 2 AS DOUBLE) * CAST(n - 3 AS DOUBLE)
              * CAST(e1 AS DOUBLE) + CAST(e2 AS DOUBLE)
              - 2.0 * CAST(n - 2 AS DOUBLE) * CAST(e3 AS DOUBLE))
            / (16.0 * CAST(n AS DOUBLE) * CAST(n - 1 AS DOUBLE)
              * CAST(n - 2 AS DOUBLE) * CAST(n - 3 AS DOUBLE)
              * CAST(n - 4 AS DOUBLE)) AS hoeffding_d
        FROM e""")),

    // ── Harrell's C: does engagement predict time-to-purchase? (q358) ───
    // The CENSORING-AWARE ranking metric the survival stack (KM q179,
    // Nelson–Aalen q265, log-rank q298, competing risks q339) still
    // lacked: AUC (q207) needs a binary label NOW; Harrell's C scores a
    // predictor against time-to-event WITH right-censored subjects.
    // Subject = user-week; time = hours from week start to first
    // purchase, censored at 168; risk score = that week's view count
    // capped at 20 (a fixed cap, not a global quantile — no corpus-wide
    // sort at 100 TB). Pairs never materialize per subject: the
    // (time × score × event) contingency grid is ≤169·21·2 cells, and
    // permissible pairs (t_a<t_b with event a, or t_a=t_b event-vs-
    // censored) are counted from the grid self-join in half units —
    // ties in score count ½. Products ride decimal(38,0)/HUGEINT.
    QueryDef("q358_survival_concordance",
      (s, dir) => {
        val e = t(s, dir, "events").select(col("user_id"),
          expr("unix_micros(ts) div 604800000000").as("wk"),
          expr("unix_micros(ts) div 3600000000").as("hr"),
          col("event_type"))
        val uw = e.groupBy("user_id", "wk").agg(
          min(when(col("event_type") === "purchase",
            col("hr") - col("wk") * 168L)).as("tp"),
          sum(when(col("event_type") === "view", 1L).otherwise(0L))
            .as("nv"))
        val cells = uw.select(
            coalesce(col("tp"), lit(168L)).as("tt"),
            col("tp").isNotNull.cast("long").as("ev"),
            least(col("nv"), lit(20L)).as("p"))
          .groupBy("tt", "ev", "p").agg(count(lit(1)).as("c"))
          .localCheckpoint()
        val ns = cells.agg(sum("c").as("n"))
        val cd = cells.filter(col("ev") === 1L).as("a")
          .join(broadcast(cells).as("b"),
            col("b.tt") > col("a.tt") ||
              (col("b.tt") === col("a.tt") && col("b.ev") === 0L))
          .agg(
            sum(col("a.c").cast("decimal(38,0)") * col("b.c")).as("np"),
            sum(col("a.c").cast("decimal(38,0)") * col("b.c") *
              (when(col("a.p") > col("b.p"), 2L)
                .when(col("a.p") === col("b.p"), 1L)
                .otherwise(0L))).as("conc2"))
        cd.crossJoin(broadcast(ns))
          .select(col("n").as("n_subjects"),
            col("np").cast("long").as("n_pairs"),
            (col("conc2").cast("double") /
              (lit(2.0) * col("np").cast("double"))).as("c_index"))
      },
      Some("""WITH e AS (SELECT user_id,
            epoch_us(ts) // 604800000000 AS wk,
            epoch_us(ts) // 3600000000 AS hr, event_type
          FROM events),
        uw AS (SELECT user_id, wk,
            MIN(CASE WHEN event_type = 'purchase'
              THEN hr - wk * 168 END) AS tp,
            CAST(SUM(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END)
              AS BIGINT) AS nv
          FROM e GROUP BY 1, 2),
        cells AS (SELECT COALESCE(tp, 168) AS tt,
            CASE WHEN tp IS NOT NULL THEN 1 ELSE 0 END AS ev,
            LEAST(nv, 20) AS p, CAST(COUNT(*) AS BIGINT) AS c
          FROM uw GROUP BY 1, 2, 3),
        ns AS (SELECT CAST(SUM(c) AS BIGINT) AS n FROM cells),
        cd AS (SELECT
            SUM(CAST(a.c AS HUGEINT) * b.c) AS np,
            SUM(CAST(a.c AS HUGEINT) * b.c *
              (CASE WHEN a.p > b.p THEN 2
                WHEN a.p = b.p THEN 1 ELSE 0 END)) AS conc2
          FROM cells a JOIN cells b
            ON b.tt > a.tt OR (b.tt = a.tt AND b.ev = 0)
          WHERE a.ev = 1)
        SELECT n AS n_subjects, CAST(np AS BIGINT) AS n_pairs,
          CAST(conc2 AS DOUBLE) / (2.0 * CAST(np AS DOUBLE)) AS c_index
        FROM cd CROSS JOIN ns""")),

    // ── Maximal 4-truss of the strong co-occurrence graph (q359) ────────
    // The triangle-reinforced cohesion certificate completing the graph
    // suite: k-core (q162) keeps an edge while its ENDPOINTS stay busy;
    // a 4-truss keeps it only while the edge itself closes ≥2 triangles
    // with surviving edges — the community-detection primitive that
    // separates genuinely clique-y vocabulary from hub-and-spoke. Four
    // peeling rounds (removal is monotone; the strong graph converges
    // in ≤2 at the tested SFs), surviving edges with their final
    // support. Spark loop in Search.kTruss (vocab²-bounded rounds,
    // broadcast wedge joins); the oracle unrolls the same rounds
    // textually — recursive CTEs cannot shrink a set.
    QueryDef("q359_ktruss",
      (s, dir) => graft.ext.Search.kTruss(
        tPar(s, dir, "documents"), "doc_id", "text", trVocab,
        linkSupNum, linkSupDen, 4, 4),
      Some(s"""WITH dt AS (SELECT DISTINCT doc_id, tok AS token
            FROM (SELECT doc_id, unnest($dTok) AS tok FROM documents)),
        ndt AS (SELECT CAST(COUNT(*) AS BIGINT) AS nd FROM documents),
        v AS (SELECT token FROM (SELECT token, COUNT(*) AS df FROM dt
          GROUP BY 1 ORDER BY df DESC, token LIMIT $trVocab)),
        vt AS (SELECT dt.doc_id, dt.token FROM dt JOIN v USING (token)),
        co AS (SELECT a.token AS src, b.token AS dst,
            CAST(COUNT(*) AS BIGINT) AS c
          FROM vt a JOIN vt b
            ON a.doc_id = b.doc_id AND a.token < b.token
          GROUP BY 1, 2),
        e0 AS MATERIALIZED (SELECT src, dst FROM co, ndt
          WHERE c * $linkSupDen > $linkSupNum * nd),
        ${kTrussOracleRounds(4, 2)},
        nbf AS (SELECT src, dst FROM e4
          UNION ALL SELECT dst, src FROM e4),
        sf AS (SELECT x.src AS a, y.src AS b,
            CAST(COUNT(*) AS BIGINT) AS sup
          FROM nbf x JOIN nbf y ON x.dst = y.dst AND x.src < y.src
          GROUP BY 1, 2)
        SELECT e.src, e.dst, COALESCE(s.sup, 0) AS support
        FROM e4 e LEFT JOIN sf s ON e.src = s.a AND e.dst = s.b
        ORDER BY src, dst""")),

    // ── Weekly-frequency DFT power of daily purchases (q360) ────────────
    // The SPECTRAL twin of the rank/sign seasonality stack: seasonal
    // strength (q291), Friedman (q310) and Page (q345) test FOR a
    // weekly pattern; the DFT power at 1/7, 2/7, 3/7 cycles/day says
    // WHERE the energy sits (fundamental vs harmonics — a spiky
    // one-day-a-week series loads the harmonics, a smooth weekly wave
    // only the fundamental). The angle grid is (day mod 7)·h/7, so the
    // whole trig table is 21 SHARED literals ([[weeklyTrig]]) — both
    // engines parse identical decimal strings, and the projections
    // Σx·cos, Σx·sin take the dsum rail. One scan, one bounded agg; the
    // 3-harmonic unpivot is a constant-size stack.
    QueryDef("q360_weekly_spectrum",
      (s, dir) => {
        val d = t(s, dir, "events")
          .filter(col("event_type") === "purchase")
          .groupBy(expr("unix_micros(ts) div 86400000000").as("day"))
          .agg(count(lit(1)).as("x"))
          .select((col("day") % 7L).as("r"), col("x").cast("double").as("x"))
        val agg = d.agg(
          dsum(col("x") * trigSpark(1, sin = false)).as("sc1"),
          dsum(col("x") * trigSpark(1, sin = true)).as("ss1"),
          dsum(col("x") * trigSpark(2, sin = false)).as("sc2"),
          dsum(col("x") * trigSpark(2, sin = true)).as("ss2"),
          dsum(col("x") * trigSpark(3, sin = false)).as("sc3"),
          dsum(col("x") * trigSpark(3, sin = true)).as("ss3"))
        agg.selectExpr(
            "stack(3, 1L, sc1, ss1, 2L, sc2, ss2, 3L, sc3, ss3)" +
              " as (h, sc, ss)")
          .select(col("h"), col("sc"), col("ss"),
            (col("sc") * col("sc") + col("ss") * col("ss")).as("power"))
          .orderBy("h")
      },
      Some(s"""WITH d AS (SELECT day % 7 AS r,
            CAST(COUNT(*) AS DOUBLE) AS x
          FROM (SELECT epoch_us(ts) // 86400000000 AS day FROM events
            WHERE event_type = 'purchase')
          GROUP BY day),
        agg AS (SELECT
            ${dsumSql(s"x * (${trigSql(1, sin = false)})")} AS sc1,
            ${dsumSql(s"x * (${trigSql(1, sin = true)})")} AS ss1,
            ${dsumSql(s"x * (${trigSql(2, sin = false)})")} AS sc2,
            ${dsumSql(s"x * (${trigSql(2, sin = true)})")} AS ss2,
            ${dsumSql(s"x * (${trigSql(3, sin = false)})")} AS sc3,
            ${dsumSql(s"x * (${trigSql(3, sin = true)})")} AS ss3
          FROM d),
        u AS (SELECT CAST(1 AS BIGINT) AS h, sc1 AS sc, ss1 AS ss
            FROM agg
          UNION ALL SELECT CAST(2 AS BIGINT), sc2, ss2 FROM agg
          UNION ALL SELECT CAST(3 AS BIGINT), sc3, ss3 FROM agg)
        SELECT h, sc, ss, sc * sc + ss * ss AS power
        FROM u ORDER BY h""")),

    // ── Lo–MacKinlay variance-ratio test on daily revenue (q361) ────────
    // The RANDOM-WALK diagnostic the autocorrelation stack implies but
    // never states: under independent daily shocks Var(q-day change) =
    // q·Var(1-day change), so VR(q) ≷ 1 reads directly as momentum vs
    // mean-reversion — the one-number summary of the q148/q282 ACF/PACF
    // lags. Overlapping q-day differences via the day-grid self-join
    // (b.day = a.day − q; grid-bounded, broadcast); Σd exact long, Σd²
    // on decimal(38,0)/HUGEINT, unbiased variances assembled in one
    // mirrored double chain, final ratio against the shared q=1 row.
    QueryDef("q361_variance_ratio",
      (s, dir) => {
        val daily = t(s, dir, "events")
          .filter(col("event_type") === "purchase")
          .groupBy(expr("unix_micros(ts) div 86400000000").as("day"))
          .agg(sum(floor(col("value") * lit(1.0e6)).cast("long")).as("u"))
          .localCheckpoint()
        def diffs(q: Int): DataFrame = daily.as("a")
          .join(broadcast(daily).as("b"),
            col("a.day") === col("b.day") + q)
          .select(lit(q.toLong).as("q"),
            (col("a.u") - col("b.u")).as("d"))
        val stats = diffs(1).union(diffs(2)).union(diffs(5))
          .groupBy("q").agg(count(lit(1)).as("n"), sum("d").as("sd"),
            sum(col("d").cast("decimal(38,0)") * col("d")).as("sdd"))
          .select(col("q"), col("n"),
            ((col("sdd").cast("double") -
              (col("sd").cast("decimal(38,0)") * col("sd"))
                .cast("double") / col("n").cast("double")) /
              (col("n") - 1L).cast("double")).as("v"))
          .localCheckpoint()
        val base = stats.filter(col("q") === 1L)
          .select(col("v").as("v1"))
        stats.filter(col("q") =!= 1L).crossJoin(broadcast(base))
          .select(col("q").as("lag_q"), col("n").as("n_diffs"),
            (col("v") / col("q").cast("double") / col("v1")).as("vr"))
          .orderBy("lag_q")
      },
      Some("""WITH daily AS (SELECT epoch_us(ts) // 86400000000 AS day,
            CAST(SUM(CAST(floor(value * 1000000.0) AS BIGINT)) AS BIGINT)
              AS u
          FROM events WHERE event_type = 'purchase' GROUP BY 1),
        d AS (SELECT q, a.u - b.u AS d
          FROM (SELECT CAST(unnest([1, 2, 5]) AS BIGINT) AS q) qs
          JOIN daily a ON true
          JOIN daily b ON a.day = b.day + q),
        stats AS (SELECT q, CAST(COUNT(*) AS BIGINT) AS n,
            (CAST(SUM(CAST(d AS HUGEINT) * d) AS DOUBLE)
              - CAST(CAST(SUM(d) AS HUGEINT) * SUM(d) AS DOUBLE)
                / CAST(COUNT(*) AS DOUBLE))
              / CAST(COUNT(*) - 1 AS DOUBLE) AS v
          FROM d GROUP BY 1),
        base AS (SELECT v AS v1 FROM stats WHERE q = 1)
        SELECT q AS lag_q, n AS n_diffs,
          v / CAST(q AS DOUBLE) / v1 AS vr
        FROM stats CROSS JOIN base WHERE q <> 1
        ORDER BY lag_q""")),

    // ── Yule's K lexical richness per source (q362) ─────────────────────
    // The log-free member of the vocabulary-richness family (Chao1
    // q237, Good–Turing q238, Heaps q304, TTR q135): K = 10⁴(Σf² − N)/N²
    // is scale-invariant repetitiveness — the collision probability of
    // two random tokens, renormalized — so a templated source scores
    // high-K at ANY corpus size where raw TTR just decays. Σf² rides
    // decimal(38,0)/HUGEINT; K is one mirrored double chain. One corpus
    // scan, one (source, token) fold, one per-source fold — the same
    // two-shuffle shape as the other per-source text stats.
    QueryDef("q362_yules_k",
      (s, dir) => {
        val f = tPar(s, dir, "documents")
          .select(col("source"),
            explode(TextStats.tokens(col("text"))).as("token"))
          .groupBy("source", "token").agg(count(lit(1)).as("f"))
        f.groupBy("source").agg(
            sum("f").as("n"),
            count(lit(1)).as("v"),
            sum(col("f").cast("decimal(38,0)") * col("f")).as("s2"))
          .select(col("source"), col("n").as("n_tokens"),
            col("v").as("vocab"),
            (lit(1.0e4) *
              (col("s2").cast("double") - col("n").cast("double")) /
              (col("n").cast("double") * col("n").cast("double")))
              .as("yules_k"))
          .orderBy("source")
      },
      Some(s"""WITH f AS (SELECT source, tok AS token,
            CAST(COUNT(*) AS BIGINT) AS f
          FROM (SELECT source, unnest($dTok) AS tok FROM documents)
          GROUP BY 1, 2)
        SELECT source, CAST(SUM(f) AS BIGINT) AS n_tokens,
          CAST(COUNT(*) AS BIGINT) AS vocab,
          10000.0 * (CAST(SUM(CAST(f AS HUGEINT) * f) AS DOUBLE)
              - CAST(SUM(f) AS DOUBLE))
            / (CAST(SUM(f) AS DOUBLE) * CAST(SUM(f) AS DOUBLE))
            AS yules_k
        FROM f GROUP BY source ORDER BY source""")),

    // ── Quade test: weekday effect weighted by week volatility (q363) ───
    // The BLOCKED rank test between Friedman (q310, equal block
    // weights) and the plain ANOVA (q281, raw values): Quade weights
    // each week-block by the rank of its RANGE, so high-variance weeks
    // — where a weekday effect is actually visible — dominate. With
    // k = 7 treatments, (k+1)/2 = 4 is exact, so doubled midranks make
    // S_ij = Q2_i(r2_ij − 8)/4 quarter-unit INTEGERS — the doubled
    // midrank from a self-INCLUSIVE tie join is 2·#less + #eq(incl) + 1
    // (the +1 restores 2·midrank; r14 fix per ADVICE — without it both
    // censuses sat at 2·midrank − 1 and ranks centered at 4.5, not 4);
    // the uniform /16
    // cancels in F = (n−1)·B/(A−B) = (n−1)·ΣSj²/(n·ΣSij² − ΣSj²) — the
    // whole statistic is one integer ratio on the decimal(38,0)/HUGEINT
    // rail. Complete weeks only (boundary part-weeks dropped); both
    // rank censuses are grid-bounded self-joins.
    QueryDef("q363_quade",
      (s, dir) => {
        val d = t(s, dir, "events")
          .filter(col("event_type") === "purchase")
          .groupBy(expr("unix_micros(ts) div 86400000000").as("day"))
          .agg(count(lit(1)).as("x"))
          .select(expr("day div 7").as("wk"), (col("day") % 7L).as("wd"),
            col("x"))
        val full = d.groupBy("wk").agg(count(lit(1)).as("nd"),
            max("x").as("mx"), min("x").as("mn"))
          .filter(col("nd") === 7L)
          .select(col("wk"), (col("mx") - col("mn")).as("rng"))
          .localCheckpoint()
        val cells = d.join(broadcast(full.select("wk")), Seq("wk"))
          .localCheckpoint()
        val r2 = cells.as("a")
          .join(broadcast(cells).as("b"), col("a.wk") === col("b.wk"))
          .groupBy(col("a.wk").as("wk"), col("a.wd").as("wd"))
          .agg((lit(2L) * sum(when(col("b.x") < col("a.x"), 1L)
              .otherwise(0L)) +
            sum(when(col("b.x") === col("a.x"), 1L).otherwise(0L)) +
            lit(1L)).as("r2"))
        val q2 = full.as("a").crossJoin(broadcast(full).as("b"))
          .groupBy(col("a.wk").as("wk"))
          .agg((lit(2L) * sum(when(col("b.rng") < col("a.rng"), 1L)
              .otherwise(0L)) +
            sum(when(col("b.rng") === col("a.rng"), 1L).otherwise(0L)) +
            lit(1L)).as("q2"))
        val sij = r2.join(broadcast(q2), Seq("wk"))
          .select(col("wk"), col("wd"),
            (col("q2").cast("decimal(38,0)") * (col("r2") - 8L))
              .as("sq"))
        val a = sij.agg(count(lit(1)).as("nk"),
          sum(col("sq") * col("sq")).as("aa"))
        val b = sij.groupBy("wd").agg(sum("sq").as("sj"))
          .agg(sum(col("sj") * col("sj")).as("bb"))
        a.crossJoin(broadcast(b))
          .select(expr("nk div 7").as("n_blocks"), lit(7L).as("k"),
            ((expr("nk div 7") - 1L).cast("double") *
              col("bb").cast("double") /
              (expr("nk div 7").cast("decimal(38,0)") * col("aa") -
                col("bb")).cast("double")).as("quade_f"))
      },
      Some("""WITH d AS (SELECT day // 7 AS wk, day % 7 AS wd,
            CAST(COUNT(*) AS BIGINT) AS x
          FROM (SELECT epoch_us(ts) // 86400000000 AS day FROM events
            WHERE event_type = 'purchase')
          GROUP BY day // 7, day % 7),
        fw AS (SELECT wk, MAX(x) - MIN(x) AS rng
          FROM d GROUP BY wk HAVING COUNT(*) = 7),
        cells AS (SELECT d.wk, d.wd, d.x FROM d JOIN fw USING (wk)),
        r2 AS (SELECT a.wk, a.wd,
            2 * SUM(CASE WHEN b.x < a.x THEN 1 ELSE 0 END)
              + SUM(CASE WHEN b.x = a.x THEN 1 ELSE 0 END) + 1 AS r2
          FROM cells a JOIN cells b ON a.wk = b.wk
          GROUP BY 1, 2),
        q2 AS (SELECT a.wk,
            2 * SUM(CASE WHEN b.rng < a.rng THEN 1 ELSE 0 END)
              + SUM(CASE WHEN b.rng = a.rng THEN 1 ELSE 0 END) + 1 AS q2
          FROM fw a CROSS JOIN fw b
          GROUP BY 1),
        sij AS (SELECT r2.wk, r2.wd,
            CAST(q2.q2 AS HUGEINT) * (r2.r2 - 8) AS sq
          FROM r2 JOIN q2 USING (wk)),
        ta AS (SELECT CAST(COUNT(*) AS BIGINT) AS nk,
            SUM(sq * sq) AS aa FROM sij),
        tb AS (SELECT SUM(sj * sj) AS bb FROM
          (SELECT SUM(sq) AS sj FROM sij GROUP BY wd) t)
        SELECT nk // 7 AS n_blocks, CAST(7 AS BIGINT) AS k,
          CAST(nk // 7 - 1 AS DOUBLE) * CAST(bb AS DOUBLE)
            / CAST(CAST(nk // 7 AS HUGEINT) * aa - bb AS DOUBLE)
            AS quade_f
        FROM ta CROSS JOIN tb""")),

    // ── Gumbel return level from weekly revenue maxima (q364) ───────────
    // EXTREME-VALUE analysis — the missing tail member of the series
    // stack: quantiles (q34/q116) describe the bulk; the Fisher–
    // Tippett route fits the DISTRIBUTION OF BLOCK MAXIMA and
    // extrapolates to events rarer than the observation window. Weekly
    // maxima of daily purchase revenue (complete weeks), Gumbel fitted
    // by method of moments — β = s·√6/π, μ = x̄ − γβ — and the 52-week
    // return level μ + 3.9415…·β. All three shape constants are SHARED
    // literals (√6/π, Euler γ, −ln(−ln(1−1/52))); moments ride exact
    // longs/decimal(38,0), and sqrt is IEEE-correctly-rounded on both
    // engines, so the chain mirrors bit-for-bit. One scan, grid folds.
    QueryDef("q364_gumbel_return_level",
      (s, dir) => {
        val d = t(s, dir, "events")
          .filter(col("event_type") === "purchase")
          .groupBy(expr("unix_micros(ts) div 86400000000").as("day"))
          .agg(sum(floor(col("value") * lit(1.0e6)).cast("long")).as("u"))
        val wkmax = d.select(expr("day div 7").as("wk"), col("u"))
          .groupBy("wk").agg(count(lit(1)).as("nd"), max("u").as("m"))
          .filter(col("nd") === 7L)
        val mom = wkmax.agg(count(lit(1)).as("n"), sum("m").as("sm"),
          sum(col("m").cast("decimal(38,0)") * col("m")).as("smm"))
        mom.select(col("n").as("n_weeks"),
            (col("sm").cast("double") / col("n").cast("double") /
              lit(1.0e6)).as("mean_max"),
            (sqrt((col("smm").cast("double") -
              (col("sm").cast("decimal(38,0)") * col("sm"))
                .cast("double") / col("n").cast("double")) /
              (col("n") - 1L).cast("double")) *
              lit(0.779696801233676) / lit(1.0e6)).as("beta"))
          .select(col("n_weeks"), col("mean_max"), col("beta"),
            (col("mean_max") - lit(0.5772156649015329) * col("beta"))
              .as("mu"))
          .select(col("n_weeks"), col("mu"), col("beta"),
            (col("mu") + lit(3.9415503865226063) * col("beta"))
              .as("return_level_52wk"))
      },
      Some("""WITH d AS (SELECT epoch_us(ts) // 86400000000 AS day,
            CAST(SUM(CAST(floor(value * 1000000.0) AS BIGINT)) AS BIGINT)
              AS u
          FROM events WHERE event_type = 'purchase' GROUP BY 1),
        wkmax AS (SELECT day // 7 AS wk, MAX(u) AS m
          FROM d GROUP BY 1 HAVING COUNT(*) = 7),
        mom AS (SELECT CAST(COUNT(*) AS BIGINT) AS n,
            CAST(SUM(m) AS BIGINT) AS sm,
            SUM(CAST(m AS HUGEINT) * m) AS smm FROM wkmax),
        fit AS (SELECT n AS n_weeks,
            CAST(sm AS DOUBLE) / CAST(n AS DOUBLE) / 1000000.0
              AS mean_max,
            sqrt((CAST(smm AS DOUBLE)
                - CAST(CAST(sm AS HUGEINT) * sm AS DOUBLE)
                  / CAST(n AS DOUBLE))
              / CAST(n - 1 AS DOUBLE)) * 0.779696801233676 / 1000000.0
              AS beta
          FROM mom),
        loc AS (SELECT n_weeks, beta,
            mean_max - 0.5772156649015329 * beta AS mu FROM fit)
        SELECT n_weeks, mu, beta,
          mu + 3.9415503865226063 * beta AS return_level_52wk
        FROM loc""")),

    // ── Theil's U2: does seasonal-naive beat naive? (q365) ──────────────
    // The FORECAST-VALUE ratio completing the eval family: MASE (q215)
    // scores one model against in-sample naive error; U2 directly
    // compares the seasonal-naive forecast (lag 7 — the pattern q360/
    // q291 detect) against the naive benchmark (lag 1) on the SAME
    // days: U2 < 1 means the weekly pattern has real predictive value.
    // Day-grid self-joins for both lags (inner on day−1 and day−7, so
    // n counts only days with both references); squared errors ride
    // decimal(38,0)/HUGEINT; one IEEE sqrt of the mirrored ratio.
    QueryDef("q365_theil_u2",
      (s, dir) => {
        val daily = t(s, dir, "events")
          .filter(col("event_type") === "purchase")
          .groupBy(expr("unix_micros(ts) div 86400000000").as("day"))
          .agg(sum(floor(col("value") * lit(1.0e6)).cast("long")).as("u"))
          .localCheckpoint()
        val j = daily.as("a")
          .join(broadcast(daily).as("b"),
            col("a.day") === col("b.day") + 1L)
          .join(broadcast(daily).as("c"),
            col("a.day") === col("c.day") + 7L)
          .select((col("a.u") - col("c.u")).as("e7"),
            (col("a.u") - col("b.u")).as("e1"))
        j.agg(count(lit(1)).as("n_days"),
            sum(col("e7").cast("decimal(38,0)") * col("e7")).as("s7"),
            sum(col("e1").cast("decimal(38,0)") * col("e1")).as("s1"))
          .select(col("n_days"),
            (col("s7").cast("double") / lit(1.0e12)).as("sse_seasonal"),
            (col("s1").cast("double") / lit(1.0e12)).as("sse_naive"),
            sqrt(col("s7").cast("double") / col("s1").cast("double"))
              .as("theil_u2"))
      },
      Some("""WITH daily AS (SELECT epoch_us(ts) // 86400000000 AS day,
            CAST(SUM(CAST(floor(value * 1000000.0) AS BIGINT)) AS BIGINT)
              AS u
          FROM events WHERE event_type = 'purchase' GROUP BY 1),
        j AS (SELECT a.u - c.u AS e7, a.u - b.u AS e1
          FROM daily a JOIN daily b ON a.day = b.day + 1
          JOIN daily c ON a.day = c.day + 7)
        SELECT CAST(COUNT(*) AS BIGINT) AS n_days,
          CAST(SUM(CAST(e7 AS HUGEINT) * e7) AS DOUBLE) / 1e12
            AS sse_seasonal,
          CAST(SUM(CAST(e1 AS HUGEINT) * e1) AS DOUBLE) / 1e12
            AS sse_naive,
          sqrt(CAST(SUM(CAST(e7 AS HUGEINT) * e7) AS DOUBLE)
            / CAST(SUM(CAST(e1 AS HUGEINT) * e1) AS DOUBLE)) AS theil_u2
        FROM j""")),

    // ── Székely distance correlation: purchases vs clicks (q366) ────────
    // The UNIVERSAL dependence coefficient closing the stack q299/q300/
    // q357 opened: dCor = 0 ⟺ independence (against ANY alternative,
    // not just monotone or quadrant coupling), the modern default for
    // "are these series related at all?". Doubly-centered distance
    // matrices scaled by n² are EXACT integers (Ã = n²|xi−xj| − n·rowi
    // − n·rowj + tot), and the n⁶ normalizations cancel in dCor² =
    // ΣÃB̃ / √(ΣÃ²·ΣB̃²) — so the whole statistic is three
    // decimal(38,0) pair sums and two IEEE sqrts. Both pair passes are
    // |days|²-bounded broadcast self-joins after the one full-data
    // day fold.
    QueryDef("q366_distance_correlation",
      (s, dir) => {
        val daily = t(s, dir, "events")
          .filter(col("event_type").isin("purchase", "click"))
          .groupBy(expr("unix_micros(ts) div 86400000000").as("day"))
          .agg(sum(when(col("event_type") === "purchase", 1L)
            .otherwise(0L)).as("x"),
            sum(when(col("event_type") === "click", 1L).otherwise(0L))
              .as("y"))
          .localCheckpoint()
        val rows0 = daily.as("a").crossJoin(broadcast(daily).as("b"))
          .groupBy(col("a.day").as("day"))
          .agg(sum(abs(col("a.x") - col("b.x"))).as("ra"),
            sum(abs(col("a.y") - col("b.y"))).as("rb"))
        val z = daily.join(broadcast(rows0), Seq("day")).localCheckpoint()
        val tot = z.agg(count(lit(1)).as("n"), sum("ra").as("ta"),
          sum("rb").as("tb"))
        val at = col("n") * col("n") * abs(col("a.x") - col("b.x")) -
          col("n") * col("a.ra") - col("n") * col("b.ra") + col("ta")
        val bt = col("n") * col("n") * abs(col("a.y") - col("b.y")) -
          col("n") * col("a.rb") - col("n") * col("b.rb") + col("tb")
        val sums = z.as("a").crossJoin(broadcast(z).as("b"))
          .crossJoin(broadcast(tot))
          .select(at.as("at"), bt.as("bt"), col("n"))
          .agg(max("n").as("n"),
            sum(col("at").cast("decimal(38,0)") * col("bt")).as("sab"),
            sum(col("at").cast("decimal(38,0)") * col("at")).as("saa"),
            sum(col("bt").cast("decimal(38,0)") * col("bt")).as("sbb"))
        sums.select(col("n").as("n_days"),
          (col("sab").cast("double") /
            (col("n").cast("double") * col("n") * col("n") * col("n") *
              col("n") * col("n"))).as("dcov2"),
          sqrt(col("sab").cast("double") /
            sqrt(col("saa").cast("double") * col("sbb").cast("double")))
            .as("dcor"))
      },
      Some("""WITH daily AS (SELECT epoch_us(ts) // 86400000000 AS day,
            CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
              AS BIGINT) AS x,
            CAST(SUM(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END)
              AS BIGINT) AS y
          FROM events WHERE event_type IN ('purchase', 'click')
          GROUP BY 1),
        rows0 AS (SELECT a.day,
            CAST(SUM(ABS(a.x - b.x)) AS BIGINT) AS ra,
            CAST(SUM(ABS(a.y - b.y)) AS BIGINT) AS rb
          FROM daily a CROSS JOIN daily b GROUP BY 1),
        z AS (SELECT daily.day, x, y, ra, rb
          FROM daily JOIN rows0 ON daily.day = rows0.day),
        tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS n,
            CAST(SUM(ra) AS BIGINT) AS ta, CAST(SUM(rb) AS BIGINT) AS tb
          FROM z),
        p AS (SELECT
            n * n * ABS(a.x - b.x) - n * a.ra - n * b.ra + ta AS at,
            n * n * ABS(a.y - b.y) - n * a.rb - n * b.rb + tb AS bt, n
          FROM z a CROSS JOIN z b CROSS JOIN tot),
        sums AS (SELECT MAX(n) AS n,
            SUM(CAST(at AS HUGEINT) * bt) AS sab,
            SUM(CAST(at AS HUGEINT) * at) AS saa,
            SUM(CAST(bt AS HUGEINT) * bt) AS sbb
          FROM p)
        SELECT n AS n_days,
          CAST(sab AS DOUBLE) / (CAST(n AS DOUBLE) * n * n * n * n * n)
            AS dcov2,
          sqrt(CAST(sab AS DOUBLE)
            / sqrt(CAST(saa AS DOUBLE) * CAST(sbb AS DOUBLE))) AS dcor
        FROM sums""")),

    // ── Seasonal Mann–Kendall trend on daily purchases (q367) ───────────
    // The seasonality-proof upgrade of q232: a weekly cycle (which q360
    // MEASURES) reads as spurious trend or masks a real one in the
    // plain MK statistic — the seasonal variant compares only
    // same-weekday observations across weeks and sums the per-season
    // S and ties-adjusted variances, so the weekly pattern cancels
    // identically. S and the 18·Var numerator are exact integers
    // (pairs live on the bounded week×weekday grid); z applies the
    // standard ±1 continuity correction via one mirrored chain.
    QueryDef("q367_seasonal_mann_kendall",
      (s, dir) => {
        val d = t(s, dir, "events")
          .filter(col("event_type") === "purchase")
          .groupBy(expr("unix_micros(ts) div 86400000000").as("day"))
          .agg(count(lit(1)).as("x"))
          .select((col("day") % 7L).as("wd"), expr("day div 7").as("wk"),
            col("x"))
          .localCheckpoint()
        val sS = d.as("a")
          .join(broadcast(d).as("b"),
            col("a.wd") === col("b.wd") && col("b.wk") > col("a.wk"))
          .agg(sum(signum(col("b.x") - col("a.x")).cast("long")).as("s"))
        val nwd = d.groupBy("wd").agg(count(lit(1)).as("n"))
          .agg(sum(col("n") * (col("n") - 1L) * (lit(2L) * col("n") + 5L))
            .as("vn"))
        val ties = d.groupBy("wd", "x").agg(count(lit(1)).as("t"))
          .agg(sum(col("t") * (col("t") - 1L) * (lit(2L) * col("t") + 5L))
            .as("vt"))
        sS.crossJoin(broadcast(nwd)).crossJoin(broadcast(ties))
          .select(col("s").as("s_total"),
            ((col("vn") - col("vt")).cast("double") / lit(18.0))
              .as("var_s"))
          .select(col("s_total"), col("var_s"),
            ((col("s_total") -
              signum(col("s_total").cast("double")).cast("long"))
              .cast("double") / sqrt(col("var_s"))).as("z"))
      },
      Some("""WITH d AS (SELECT day % 7 AS wd, day // 7 AS wk,
            CAST(COUNT(*) AS BIGINT) AS x
          FROM (SELECT epoch_us(ts) // 86400000000 AS day FROM events
            WHERE event_type = 'purchase')
          GROUP BY 1, 2),
        s AS (SELECT CAST(SUM(CASE WHEN b.x > a.x THEN 1
            WHEN b.x < a.x THEN -1 ELSE 0 END) AS BIGINT) AS s_total
          FROM d a JOIN d b ON a.wd = b.wd AND b.wk > a.wk),
        vn AS (SELECT CAST(SUM(n * (n - 1) * (2 * n + 5)) AS BIGINT)
            AS vn
          FROM (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM d
            GROUP BY wd) t),
        vt AS (SELECT CAST(SUM(t * (t - 1) * (2 * t + 5)) AS BIGINT)
            AS vt
          FROM (SELECT CAST(COUNT(*) AS BIGINT) AS t FROM d
            GROUP BY wd, x) t)
        SELECT s_total, CAST(vn - vt AS DOUBLE) / 18.0 AS var_s,
          CAST(s_total - CASE WHEN s_total > 0 THEN 1
              WHEN s_total < 0 THEN -1 ELSE 0 END AS DOUBLE)
            / sqrt(CAST(vn - vt AS DOUBLE) / 18.0) AS z
        FROM s CROSS JOIN vn CROSS JOIN vt""")),

    // ── Burrows' Delta: stylometric distance between sources (q368) ─────
    // AUTHORSHIP attribution — the classic forensic companion of the
    // divergence stack (q303 TV/Bhattacharyya, q217 Hellinger): those
    // compare raw vocabulary mass; Delta z-normalizes each of the top
    // M=20 tokens ACROSS sources first, so one source's generic
    // wordiness can't dominate, then averages |z₁ − z₂| — the measure
    // that actually separates house styles. Dense (source × top-token)
    // grid with zero fill; per-token mean/sd and the per-pair |Δz|
    // fold both ride the dsum rail; sources² pairs are broadcast-
    // bounded. Top-10 closest pairs (most confusable styles).
    QueryDef("q368_burrows_delta",
      (s, dir) => {
        val tok = tPar(s, dir, "documents")
          .select(col("source"),
            explode(TextStats.tokens(col("text"))).as("token"))
        val cnt = tok.groupBy("source", "token").agg(count(lit(1)).as("c"))
          .localCheckpoint()
        val top = cnt.groupBy("token").agg(sum("c").as("tc"))
          .orderBy(desc("tc"), col("token")).limit(20).select("token")
        val ns = cnt.groupBy("source").agg(sum("c").as("ntok"))
        val dense = ns.select("source").crossJoin(broadcast(top))
          .join(cnt, Seq("source", "token"), "left")
          .join(ns, Seq("source"))
          .select(col("source"), col("token"),
            (coalesce(col("c"), lit(0L)).cast("double") /
              col("ntok").cast("double")).as("f"))
          .localCheckpoint()
        val stats = dense.groupBy("token").agg(
            count(lit(1)).as("k"), dsum(col("f")).as("sf"),
            dsum(col("f") * col("f")).as("sff"))
          .select(col("token"), (col("sf") / col("k")).as("mu"),
            sqrt((col("sff") - col("sf") * col("sf") / col("k")) /
              (col("k") - 1L).cast("double")).as("sd"))
          .filter(col("sd") > 0.0)
        val zs = dense.join(broadcast(stats), Seq("token"))
          .select(col("source"), col("token"),
            ((col("f") - col("mu")) / col("sd")).as("z"))
          .localCheckpoint()
        zs.as("a")
          .join(broadcast(zs).as("b"),
            col("a.token") === col("b.token") &&
              col("a.source") < col("b.source"))
          .groupBy(col("a.source").as("source_a"),
            col("b.source").as("source_b"))
          .agg((dsum(abs(col("a.z") - col("b.z"))) / count(lit(1)))
            .as("delta"))
          .orderBy(col("delta"), col("source_a"), col("source_b"))
          .limit(10)
      },
      Some(s"""WITH tok AS (SELECT source, unnest($dTok) AS token
          FROM documents),
        cnt AS (SELECT source, token, CAST(COUNT(*) AS BIGINT) AS c
          FROM tok GROUP BY 1, 2),
        top AS (SELECT token FROM (SELECT token, SUM(c) AS tc FROM cnt
          GROUP BY 1 ORDER BY tc DESC, token LIMIT 20)),
        ns AS (SELECT source, CAST(SUM(c) AS BIGINT) AS ntok FROM cnt
          GROUP BY 1),
        dense AS (SELECT ns.source, top.token,
            CAST(COALESCE(cnt.c, 0) AS DOUBLE) / CAST(ns.ntok AS DOUBLE)
              AS f
          FROM ns CROSS JOIN top
          LEFT JOIN cnt ON cnt.source = ns.source
            AND cnt.token = top.token),
        stats AS (SELECT token,
            ${dsumSql("f")} / COUNT(*) AS mu,
            sqrt((${dsumSql("f * f")}
                - ${dsumSql("f")} * ${dsumSql("f")} / COUNT(*))
              / CAST(COUNT(*) - 1 AS DOUBLE)) AS sd
          FROM dense GROUP BY 1),
        zs AS (SELECT source, dense.token, (f - mu) / sd AS z
          FROM dense JOIN stats ON dense.token = stats.token
          WHERE sd > 0.0)
        SELECT a.source AS source_a, b.source AS source_b,
          ${dsumSql("ABS(a.z - b.z)")} / COUNT(*) AS delta
        FROM zs a JOIN zs b
          ON a.token = b.token AND a.source < b.source
        GROUP BY 1, 2 ORDER BY delta, source_a, source_b LIMIT 10""")),

    // ── Turning-point randomness test on daily purchases (q369) ─────────
    // The LOCAL-EXTREMA randomness check beside the runs test (q308,
    // sign-vs-median) and Ljung–Box (q340, linear autocorrelation): an
    // i.i.d. series has exactly 2/3 of interior triples as peaks or
    // troughs, so too few turning points reads as smoothness/trend and
    // too many as alternation — sensitive to structure the other two
    // miss. Strict-inequality triples (ties break neither side,
    // documented); the triple join lives on the bounded day grid;
    // E[T] = 2m/3 and Var = (16n−29)/90 are one mirrored literal
    // chain over exact counts.
    QueryDef("q369_turning_point",
      (s, dir) => {
        val daily = t(s, dir, "events")
          .filter(col("event_type") === "purchase")
          .groupBy(expr("unix_micros(ts) div 86400000000").as("day"))
          .agg(count(lit(1)).as("x"))
          .localCheckpoint()
        val tri = daily.as("c")
          .join(broadcast(daily).as("p"),
            col("c.day") === col("p.day") + 1L)
          .join(broadcast(daily).as("f"),
            col("c.day") === col("f.day") - 1L)
          .select(((col("c.x") > col("p.x") && col("c.x") > col("f.x")) ||
            (col("c.x") < col("p.x") && col("c.x") < col("f.x")))
            .cast("long").as("tp"))
        tri.agg(count(lit(1)).as("m"), sum("tp").as("tt"))
          .select((col("m") + 2L).as("n_days"), col("tt").as("n_turning"),
            ((col("tt").cast("double") -
              lit(2.0) * col("m").cast("double") / lit(3.0)) /
              sqrt((lit(16.0) * (col("m") + 2L).cast("double") -
                lit(29.0)) / lit(90.0))).as("z"))
      },
      Some("""WITH daily AS (SELECT epoch_us(ts) // 86400000000 AS day,
            CAST(COUNT(*) AS BIGINT) AS x
          FROM events WHERE event_type = 'purchase' GROUP BY 1),
        tri AS (SELECT CASE WHEN (c.x > p.x AND c.x > f.x)
              OR (c.x < p.x AND c.x < f.x) THEN 1 ELSE 0 END AS tp
          FROM daily c JOIN daily p ON c.day = p.day + 1
          JOIN daily f ON c.day = f.day - 1),
        agg AS (SELECT CAST(COUNT(*) AS BIGINT) AS m,
            CAST(SUM(tp) AS BIGINT) AS tt FROM tri)
        SELECT m + 2 AS n_days, tt AS n_turning,
          (CAST(tt AS DOUBLE) - 2.0 * CAST(m AS DOUBLE) / 3.0)
            / sqrt((16.0 * CAST(m + 2 AS DOUBLE) - 29.0) / 90.0) AS z
        FROM agg""")),

    // ── Rich-club coefficient of the strong token graph (q370) ──────────
    // Do the best-connected tokens tie to EACH OTHER or only to the
    // periphery? φ(k) = 2E_k/(N_k(N_k−1)) over degree thresholds —
    // the global complement of k-core (q162, per-node) and
    // assortativity (q276, one mixing number): a rising φ(k) curve is
    // the hub-club signature neither can see. All work after the one
    // corpus pass is vocab²-bounded (Search.richClub).
    QueryDef("q370_rich_club",
      (s, dir) => graft.ext.Search.richClub(
        tPar(s, dir, "documents"), "doc_id", "text", trVocab,
        linkSupNum, linkSupDen, Seq(5, 10, 15, 20)),
      Some(s"""WITH dt AS (SELECT DISTINCT doc_id, tok AS token
            FROM (SELECT doc_id, unnest($dTok) AS tok FROM documents)),
        ndt AS (SELECT CAST(COUNT(*) AS BIGINT) AS nd FROM documents),
        v AS (SELECT token FROM (SELECT token, COUNT(*) AS df FROM dt
          GROUP BY 1 ORDER BY df DESC, token LIMIT $trVocab)),
        vt AS (SELECT dt.doc_id, dt.token FROM dt JOIN v USING (token)),
        co AS (SELECT a.token AS src, b.token AS dst,
            CAST(COUNT(*) AS BIGINT) AS c
          FROM vt a JOIN vt b
            ON a.doc_id = b.doc_id AND a.token < b.token
          GROUP BY 1, 2),
        half AS (SELECT src, dst FROM co, ndt
          WHERE c * $linkSupDen > $linkSupNum * nd),
        deg AS (SELECT t, CAST(COUNT(*) AS BIGINT) AS deg FROM
          (SELECT src AS t FROM half UNION ALL SELECT dst FROM half)
          GROUP BY 1),
        ks AS (SELECT CAST(unnest([5, 10, 15, 20]) AS BIGINT) AS k),
        nk AS (SELECT k, CAST(COUNT(*) AS BIGINT) AS n_nodes
          FROM deg CROSS JOIN ks WHERE deg > k GROUP BY 1),
        ek AS (SELECT k, CAST(COUNT(*) AS BIGINT) AS n_edges
          FROM half
          JOIN deg ds ON half.src = ds.t
          JOIN deg dd ON half.dst = dd.t
          CROSS JOIN ks WHERE ds.deg > k AND dd.deg > k GROUP BY 1)
        SELECT ks.k, COALESCE(nk.n_nodes, 0) AS n_nodes,
          COALESCE(ek.n_edges, 0) AS n_edges,
          CASE WHEN COALESCE(nk.n_nodes, 0) >= 2
            THEN 2.0 * CAST(COALESCE(ek.n_edges, 0) AS DOUBLE)
              / (CAST(nk.n_nodes AS DOUBLE)
                * CAST(nk.n_nodes - 1 AS DOUBLE)) END AS phi
        FROM ks LEFT JOIN nk ON ks.k = nk.k
        LEFT JOIN ek ON ks.k = ek.k
        ORDER BY ks.k""")),

    // ── All-pairs shortest-path histogram (q371) ────────────────────────
    // The GLOBAL distance structure of the strong token graph —
    // diameter (max row) and mean path length in one bounded census —
    // where q110 walks from a single source. Four min-plus relaxation
    // rounds reach every distance ≤ 5 (measured diameter 3); the
    // oracle unrolls the same rounds with MATERIALIZED CTEs (the q359
    // inlining lesson). Every round is a broadcast join on the
    // ≤ vocab² distance table.
    QueryDef("q371_graph_distances",
      (s, dir) => graft.ext.Search.distanceHistogram(
        tPar(s, dir, "documents"), "doc_id", "text", trVocab,
        linkSupNum, linkSupDen, 4),
      Some(s"""WITH dt AS (SELECT DISTINCT doc_id, tok AS token
            FROM (SELECT doc_id, unnest($dTok) AS tok FROM documents)),
        ndt AS (SELECT CAST(COUNT(*) AS BIGINT) AS nd FROM documents),
        v AS (SELECT token FROM (SELECT token, COUNT(*) AS df FROM dt
          GROUP BY 1 ORDER BY df DESC, token LIMIT $trVocab)),
        vt AS (SELECT dt.doc_id, dt.token FROM dt JOIN v USING (token)),
        co AS (SELECT a.token AS src, b.token AS dst,
            CAST(COUNT(*) AS BIGINT) AS c
          FROM vt a JOIN vt b
            ON a.doc_id = b.doc_id AND a.token < b.token
          GROUP BY 1, 2),
        half AS (SELECT src, dst FROM co, ndt
          WHERE c * $linkSupDen > $linkSupNum * nd),
        nb AS MATERIALIZED (SELECT src, dst FROM half
          UNION ALL SELECT dst, src FROM half),
        d0 AS MATERIALIZED (SELECT src AS u, dst AS v,
          CAST(1 AS BIGINT) AS d FROM nb),
        ${(0 until 4).map { i =>
          s"""d${i + 1} AS MATERIALIZED (SELECT u, v, MIN(d) AS d FROM (
               SELECT u, v, d FROM d$i
               UNION ALL
               SELECT d$i.u, nb.dst AS v, d$i.d + 1
               FROM d$i JOIN nb ON d$i.v = nb.src) t
             GROUP BY 1, 2)"""
        }.mkString(",\n")}
        SELECT d AS dist, CAST(COUNT(*) AS BIGINT) AS n_pairs
        FROM d4 WHERE u < v GROUP BY 1 ORDER BY 1""")),

    // ── Bounded-horizon Katz centrality (q372) ──────────────────────────
    // The attenuated-WALK centrality between degree and the
    // eigenvector family (PageRank q108/q196, HITS q275): Katz counts
    // all walks, damped α^length, so it rewards being near hubs
    // without PageRank's out-degree normalization. Walk counts p_r =
    // A·p_{r−1} are EXACT integers; α^r coefficients are emitted from
    // the SAME JVM math.pow on both sides (literal-chain discipline),
    // and the 4-term per-node fold rides the dsum rail. Four broadcast
    // matrix-vector rounds on the ≤ vocab² edge table.
    QueryDef("q372_katz_centrality",
      (s, dir) => graft.ext.Search.katzCentrality(
        tPar(s, dir, "documents"), "doc_id", "text", trVocab,
        linkSupNum, linkSupDen, 1, 10, 4),
      Some(s"""WITH dt AS (SELECT DISTINCT doc_id, tok AS token
            FROM (SELECT doc_id, unnest($dTok) AS tok FROM documents)),
        ndt AS (SELECT CAST(COUNT(*) AS BIGINT) AS nd FROM documents),
        v AS (SELECT token FROM (SELECT token, COUNT(*) AS df FROM dt
          GROUP BY 1 ORDER BY df DESC, token LIMIT $trVocab)),
        vt AS (SELECT dt.doc_id, dt.token FROM dt JOIN v USING (token)),
        co AS (SELECT a.token AS src, b.token AS dst,
            CAST(COUNT(*) AS BIGINT) AS c
          FROM vt a JOIN vt b
            ON a.doc_id = b.doc_id AND a.token < b.token
          GROUP BY 1, 2),
        half AS (SELECT src, dst FROM co, ndt
          WHERE c * $linkSupDen > $linkSupNum * nd),
        nb AS MATERIALIZED (SELECT src, dst FROM half
          UNION ALL SELECT dst, src FROM half),
        nodes AS MATERIALIZED (SELECT DISTINCT src AS t FROM nb),
        p0 AS (SELECT t, CAST(1 AS BIGINT) AS w FROM nodes),
        ${(1 to 4).map { r =>
          s"""p$r AS MATERIALIZED (SELECT nb.dst AS t,
               CAST(SUM(p.w) AS BIGINT) AS w
             FROM nb JOIN p${r - 1} p ON nb.src = p.t GROUP BY 1)"""
        }.mkString(",\n")},
        terms AS (${(1 to 4).map { r =>
          s"SELECT t, ${math.pow(0.1, r)} * CAST(w AS DOUBLE) AS x FROM p$r"
        }.mkString("\n          UNION ALL ")}),
        k AS (SELECT t, CAST(SUM(CAST(x AS DECIMAL(30,8))) AS DOUBLE)
            AS katz
          FROM terms GROUP BY 1)
        SELECT nodes.t AS token, COALESCE(k.katz, 0.0) AS katz
        FROM nodes LEFT JOIN k ON nodes.t = k.t
        ORDER BY token""")),

    // ── Sen's seasonal slope on daily purchases (q373) ──────────────────
    // The ESTIMATOR to q367's test: seasonal Mann–Kendall says whether
    // a weekly-cycle-proof trend exists; Sen's seasonal slope says how
    // steep — the median of all within-weekday pairwise slopes
    // (x_j − x_i)/(wk_j − wk_i), immune to both outliers and the
    // weekly pattern (same-weekday pairs only). Slopes are one
    // deterministic double division each; the order statistic is
    // picked by row_number with the full (slope, wd, wk, wk) tie-break
    // (the q354 selection shape); even counts average the two middle
    // values. Pairs live on the bounded week×weekday grid.
    QueryDef("q373_sens_seasonal_slope",
      (s, dir) => {
        val d = t(s, dir, "events")
          .filter(col("event_type") === "purchase")
          .groupBy(expr("unix_micros(ts) div 86400000000").as("day"))
          .agg(count(lit(1)).as("x"))
          .select((col("day") % 7L).as("wd"), expr("day div 7").as("wk"),
            col("x"))
          .localCheckpoint()
        val sl = d.as("a")
          .join(broadcast(d).as("b"),
            col("a.wd") === col("b.wd") && col("b.wk") > col("a.wk"))
          .select(
            ((col("b.x") - col("a.x")).cast("double") /
              (col("b.wk") - col("a.wk")).cast("double")).as("slope"),
            col("a.wd").as("wd"), col("a.wk").as("w1"),
            col("b.wk").as("w2"))
          .withColumn("rk", row_number().over(boundedWindow(
            col("slope"), col("wd"), col("w1"), col("w2"))).cast("long"))
        val n = sl.agg(count(lit(1)).as("np"))
        sl.crossJoin(broadcast(n))
          .filter(col("rk") === expr("(np + 1) div 2") ||
            col("rk") === expr("np div 2 + 1"))
          .agg(max("np").as("n_pairs"),
            (sum("slope") / count(lit(1))).as("sen_slope"))
      },
      Some("""WITH d AS (SELECT day % 7 AS wd, day // 7 AS wk,
            CAST(COUNT(*) AS BIGINT) AS x
          FROM (SELECT epoch_us(ts) // 86400000000 AS day FROM events
            WHERE event_type = 'purchase')
          GROUP BY 1, 2),
        sl AS (SELECT
            CAST(b.x - a.x AS DOUBLE) / CAST(b.wk - a.wk AS DOUBLE)
              AS slope,
            a.wd AS wd, a.wk AS w1, b.wk AS w2,
            CAST(ROW_NUMBER() OVER (ORDER BY
              CAST(b.x - a.x AS DOUBLE) / CAST(b.wk - a.wk AS DOUBLE),
              a.wd, a.wk, b.wk) AS BIGINT) AS rk
          FROM d a JOIN d b ON a.wd = b.wd AND b.wk > a.wk),
        n AS (SELECT CAST(COUNT(*) AS BIGINT) AS np FROM sl)
        SELECT MAX(np) AS n_pairs, SUM(slope) / COUNT(*) AS sen_slope
        FROM sl CROSS JOIN n
        WHERE rk = (np + 1) // 2 OR rk = np // 2 + 1""")),

    // ── Energy distance: weekday vs weekend revenue (q374) ──────────────
    // The TWO-SAMPLE member of the q366 energy family: where AD (q355)
    // and KS (q151) compare CDFs through ranks, the energy statistic
    // 2E|X−Y| − E|X−X'| − E|Y−Y'| compares the distributions in their
    // own metric — zero iff identical, consistent against every
    // alternative, and exactly computable: all three expectation sums
    // are integer |difference| folds over the bounded day grid
    // (decimal(38,0)/HUGEINT), divided by exact pair counts in one
    // mirrored chain. T = mn/(m+n)·D² is the permutation-test scale.
    QueryDef("q374_energy_distance",
      (s, dir) => {
        val daily = t(s, dir, "events")
          .filter(col("event_type") === "purchase")
          .groupBy(expr("unix_micros(ts) div 86400000000").as("day"))
          .agg(sum(floor(col("value") * lit(1.0e6)).cast("long")).as("u"))
          .select(col("u"),
            (expr("(day + 4) % 7").isin(0, 6)).cast("long").as("we"))
          .localCheckpoint()
        val x = daily.filter(col("we") === 0L).select(col("u").as("ux"))
        val y = daily.filter(col("we") === 1L).select(col("u").as("uy"))
        val sxy = x.crossJoin(broadcast(y))
          .agg(sum(abs(col("ux") - col("uy")).cast("decimal(38,0)"))
            .as("sxy"), count(lit(1)).as("mn"))
        val sxx = x.as("a").crossJoin(broadcast(x).as("b"))
          .agg(sum(abs(col("a.ux") - col("b.ux")).cast("decimal(38,0)"))
            .as("sxx"), count(lit(1)).as("mm"))
        val syy = y.as("a").crossJoin(broadcast(y).as("b"))
          .agg(sum(abs(col("a.uy") - col("b.uy")).cast("decimal(38,0)"))
            .as("syy"), count(lit(1)).as("nn"))
        val d2 = lit(2.0) * col("sxy").cast("double") /
          col("mn").cast("double") -
          col("sxx").cast("double") / col("mm").cast("double") -
          col("syy").cast("double") / col("nn").cast("double")
        sxy.crossJoin(broadcast(sxx)).crossJoin(broadcast(syy))
          .select(
            sqrt(col("mm").cast("double")).cast("long").as("m_weekday"),
            sqrt(col("nn").cast("double")).cast("long").as("n_weekend"),
            (d2 / lit(1.0e6)).as("energy_dist2"))
          .select(col("m_weekday"), col("n_weekend"), col("energy_dist2"),
            ((col("m_weekday") * col("n_weekend")).cast("double") /
              (col("m_weekday") + col("n_weekend")).cast("double") *
              col("energy_dist2")).as("t_stat"))
      },
      Some("""WITH daily AS (SELECT
            CAST(SUM(CAST(floor(value * 1000000.0) AS BIGINT)) AS BIGINT)
              AS u,
            CASE WHEN (epoch_us(ts) // 86400000000 + 4) % 7 IN (0, 6)
              THEN 1 ELSE 0 END AS we
          FROM events WHERE event_type = 'purchase'
          GROUP BY epoch_us(ts) // 86400000000,
            CASE WHEN (epoch_us(ts) // 86400000000 + 4) % 7 IN (0, 6)
              THEN 1 ELSE 0 END),
        x AS (SELECT u AS ux FROM daily WHERE we = 0),
        y AS (SELECT u AS uy FROM daily WHERE we = 1),
        sxy AS (SELECT SUM(CAST(ABS(ux - uy) AS HUGEINT)) AS sxy,
            CAST(COUNT(*) AS BIGINT) AS mn FROM x CROSS JOIN y),
        sxx AS (SELECT SUM(CAST(ABS(a.ux - b.ux) AS HUGEINT)) AS sxx,
            CAST(COUNT(*) AS BIGINT) AS mm FROM x a CROSS JOIN x b),
        syy AS (SELECT SUM(CAST(ABS(a.uy - b.uy) AS HUGEINT)) AS syy,
            CAST(COUNT(*) AS BIGINT) AS nn FROM y a CROSS JOIN y b),
        f AS (SELECT
            CAST(sqrt(CAST(mm AS DOUBLE)) AS BIGINT) AS m_weekday,
            CAST(sqrt(CAST(nn AS DOUBLE)) AS BIGINT) AS n_weekend,
            (2.0 * CAST(sxy AS DOUBLE) / CAST(mn AS DOUBLE)
              - CAST(sxx AS DOUBLE) / CAST(mm AS DOUBLE)
              - CAST(syy AS DOUBLE) / CAST(nn AS DOUBLE)) / 1000000.0
              AS energy_dist2
          FROM sxy CROSS JOIN sxx CROSS JOIN syy)
        SELECT m_weekday, n_weekend, energy_dist2,
          CAST(m_weekday * n_weekend AS DOUBLE)
            / CAST(m_weekday + n_weekend AS DOUBLE) * energy_dist2
            AS t_stat
        FROM f""")),

    // ── Mantel–Haenszel common odds ratio across weeks (q375) ───────────
    // The STRATIFIED 2×2 estimator the causal family lacked: q252 DiD
    // and q260 stratified ATE handle continuous outcomes; MH pools
    // binary exposure→outcome association (high-view user-weeks →
    // multi-purchase) across week strata, immune to week-level
    // confounding (campaign weeks inflate both). OR_MH = Σ(ad/n) /
    // Σ(bc/n) and the MH χ² both fold per-stratum integer cells
    // through the dsum rail — one grid-bounded contingency per week,
    // subjects never pairwise.
    QueryDef("q375_mantel_haenszel",
      (s, dir) => {
        val uw = t(s, dir, "events").groupBy(col("user_id"),
            expr("unix_micros(ts) div 604800000000").as("wk"))
          .agg(sum(when(col("event_type") === "view", 1L).otherwise(0L))
            .as("v"),
            sum(when(col("event_type") === "purchase", 1L).otherwise(0L))
              .as("p"))
        val cells = uw.groupBy("wk").agg(
            sum(when(col("v") >= 3L && col("p") >= 3L, 1L).otherwise(0L))
              .as("a"),
            sum(when(col("v") >= 3L && col("p") < 3L, 1L).otherwise(0L))
              .as("b"),
            sum(when(col("v") < 3L && col("p") >= 3L, 1L).otherwise(0L))
              .as("c"),
            sum(when(col("v") < 3L && col("p") < 3L, 1L).otherwise(0L))
              .as("d"))
          .select(col("wk"), col("a"), col("b"), col("c"), col("d"),
            (col("a") + col("b") + col("c") + col("d")).as("n"))
        cells.agg(count(lit(1)).as("n_strata"),
            dsum((col("a") * col("d")).cast("double") /
              col("n").cast("double")).as("sad"),
            dsum((col("b") * col("c")).cast("double") /
              col("n").cast("double")).as("sbc"),
            sum("a").cast("long").as("sa"),
            dsum(((col("a") + col("b")) * (col("a") + col("c")))
              .cast("double") / col("n").cast("double")).as("sea"),
            dsum(((col("a") + col("b")) * (col("c") + col("d")))
              .cast("decimal(38,0)").cast("double") *
              (col("a") + col("c")).cast("double") *
              (col("b") + col("d")).cast("double") /
              (col("n").cast("double") * col("n").cast("double") *
                (col("n") - 1L).cast("double"))).as("sva"))
          .select(col("n_strata"), (col("sad") / col("sbc")).as("or_mh"),
            ((col("sa").cast("double") - col("sea")) *
              (col("sa").cast("double") - col("sea")) / col("sva"))
              .as("chi2_mh"))
      },
      Some(s"""WITH uw AS (SELECT user_id,
            epoch_us(ts) // 604800000000 AS wk,
            CAST(SUM(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END)
              AS BIGINT) AS v,
            CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0
              END) AS BIGINT) AS p
          FROM events GROUP BY 1, 2),
        cells AS (SELECT wk,
            CAST(SUM(CASE WHEN v >= 3 AND p >= 3 THEN 1 ELSE 0 END)
              AS BIGINT) AS a,
            CAST(SUM(CASE WHEN v >= 3 AND p < 3 THEN 1 ELSE 0 END)
              AS BIGINT) AS b,
            CAST(SUM(CASE WHEN v < 3 AND p >= 3 THEN 1 ELSE 0 END)
              AS BIGINT) AS c,
            CAST(SUM(CASE WHEN v < 3 AND p < 3 THEN 1 ELSE 0 END)
              AS BIGINT) AS d
          FROM uw GROUP BY 1),
        k AS (SELECT wk, a, b, c, d, a + b + c + d AS n FROM cells),
        agg AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_strata,
            ${dsumSql("CAST(a * d AS DOUBLE) / CAST(n AS DOUBLE)")}
              AS sad,
            ${dsumSql("CAST(b * c AS DOUBLE) / CAST(n AS DOUBLE)")}
              AS sbc,
            CAST(SUM(a) AS BIGINT) AS sa,
            ${dsumSql(
              "CAST((a + b) * (a + c) AS DOUBLE) / CAST(n AS DOUBLE)")}
              AS sea,
            ${dsumSql("""CAST(CAST((a + b) * (c + d) AS HUGEINT)
                AS DOUBLE) * CAST(a + c AS DOUBLE)
                * CAST(b + d AS DOUBLE)
                / (CAST(n AS DOUBLE) * CAST(n AS DOUBLE)
                  * CAST(n - 1 AS DOUBLE))""")} AS sva
          FROM k)
        SELECT n_strata, sad / sbc AS or_mh,
          (CAST(sa AS DOUBLE) - sea) * (CAST(sa AS DOUBLE) - sea) / sva
            AS chi2_mh
        FROM agg""")),

    // ── IPF raking of the weekday × event-type table (q376) ─────────────
    // The SURVEY-WEIGHTING primitive behind post-stratification: scale
    // the observed (weekday × type) counts so weekday margins become
    // UNIFORM while type margins stay observed — the "what would a
    // seasonality-free mix look like" table that q59's domain mix and
    // q279's bias-TV audit both presuppose. Three unrolled
    // row-scale/column-scale rounds on the bounded 7×|types| grid;
    // every within-round margin fold rides the dsum rail so both
    // engines iterate identical doubles. Output = final weights +
    // the achieved row margin (convergence is VISIBLE in the result).
    QueryDef("q376_ipf_raking",
      (s, dir) => {
        // r16: the (wd, event_type) contingency grid is ≤ 7·|types|
        // rows — a bounded control table — so after the one distributed
        // aggregation the 3 IPF rounds run as plain Scala (the old
        // per-round broadcast-join chain was 26 tiny jobs / 0.6 s of
        // job time under a 3.6 s wall — pure scheduling). Per-cell
        // updates are the same IEEE ops in the same order; the margin
        // sums ride Parity.dsumLocal, the bit-identical driver twin of
        // the dsum rail (ParitySpec).
        val base = t(s, dir, "events")
          .groupBy(expr("unix_micros(ts) div 86400000000 % 7").as("wd"),
            col("event_type"))
          .agg(count(lit(1)).as("c"))
          .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
        val nt = base.map(_._3).sum
        val ct = base.groupBy(_._2).map { case (et, xs) =>
          et -> xs.map(_._3).sum }
        var w: Array[(Long, String, Long, Double)] =
          base.map(b => (b._1, b._2, b._3, b._3.toDouble))
        for (_ <- 1 to 3) {
          val rs = w.groupBy(_._1).map { case (wd, xs) =>
            wd -> graft.functions.Parity.dsumLocal(xs.map(_._4)) }
          w = w.map { case (wd, et, c, x) =>
            (wd, et, c, x * (nt.toDouble / 7.0) / rs(wd)) }
          val cs = w.groupBy(_._2).map { case (et, xs) =>
            et -> graft.functions.Parity.dsumLocal(xs.map(_._4)) }
          w = w.map { case (wd, et, c, x) =>
            (wd, et, c, x * ct(et).toDouble / cs(et)) }
        }
        val rowMargin = w.groupBy(_._1).map { case (wd, xs) =>
          wd -> graft.functions.Parity.dsumLocal(xs.map(_._4)) }
        import s.implicits._
        w.map { case (wd, et, c, x) => (wd, et, c, x, rowMargin(wd)) }
          .toSeq
          .toDF("wd", "event_type", "raw", "weight", "row_margin")
          .orderBy("wd", "event_type")
      },
      Some(s"""WITH base AS (SELECT
            epoch_us(ts) // 86400000000 % 7 AS wd, event_type,
            CAST(COUNT(*) AS BIGINT) AS c
          FROM events GROUP BY 1, 2),
        tot AS (SELECT CAST(SUM(c) AS BIGINT) AS nt FROM base),
        colt AS (SELECT event_type, CAST(SUM(c) AS BIGINT) AS ct
          FROM base GROUP BY 1),
        w0 AS (SELECT wd, event_type, nt, c, CAST(c AS DOUBLE) AS w
          FROM base CROSS JOIN tot),
        ${(1 to 3).map { i =>
          s"""r$i AS MATERIALIZED (SELECT w.wd, w.event_type, w.nt, w.c,
               w.w * (CAST(w.nt AS DOUBLE) / 7.0) / rs.rsum AS w
             FROM w${i - 1} w JOIN (SELECT wd, ${dsumSql("w")} AS rsum
               FROM w${i - 1} GROUP BY 1) rs ON w.wd = rs.wd),
           w$i AS MATERIALIZED (SELECT r.wd, r.event_type, r.nt, r.c,
               r.w * CAST(colt.ct AS DOUBLE) / cs.csum AS w
             FROM r$i r JOIN (SELECT event_type, ${dsumSql("w")} AS csum
               FROM r$i GROUP BY 1) cs ON r.event_type = cs.event_type
             JOIN colt ON r.event_type = colt.event_type)"""
        }.mkString(",\n")},
        ra AS (SELECT wd, ${dsumSql("w")} AS row_margin FROM w3
          GROUP BY 1)
        SELECT w3.wd, w3.event_type, w3.c AS raw, w3.w AS weight,
          ra.row_margin
        FROM w3 JOIN ra ON w3.wd = ra.wd
        ORDER BY w3.wd, w3.event_type""")),

    // ── SPRT: sequential purchase-share monitor (q377) ──────────────────
    // The ANYTIME sequential test the experimentation stack stops
    // short of: group-sequential OBF (q271) looks at a few planned
    // interims; Wald's SPRT monitors EVERY day and stops the moment
    // the evidence crosses a boundary, with guaranteed α/β. H0: share
    // of purchases among events = 18% vs H1: 22%, α = β = 0.05. The
    // log-likelihood increments x·ln(p1/p0) + (n−x)·ln(q1/q0) and the
    // ±ln(19) boundaries are SHARED literals; the cumulative LLR walks
    // the bounded day grid in one ordered window, and the verdict is
    // the first boundary crossing (day + decision + final LLR).
    QueryDef("q377_sprt",
      (s, dir) => {
        val d = t(s, dir, "events")
          .groupBy(expr("unix_micros(ts) div 86400000000").as("day"))
          .agg(sum(when(col("event_type") === "purchase", 1L)
            .otherwise(0L)).as("x"), count(lit(1)).as("n"))
        val llr = d.select(col("day"),
            (col("x").cast("double") * lit(0.20067069546215124) +
              (col("n") - col("x")).cast("double") *
                lit(-0.050010420574661305)).as("inc"))
          .withColumn("llr", sum(col("inc").cast("decimal(30,8)"))
            .over(boundedWindow("day")).cast("double"))
          .localCheckpoint()
        val cross = llr
          .filter(col("llr") >= lit(2.9444389791664403) ||
            col("llr") <= lit(-2.9444389791664403))
          .agg(min("day").as("crossing_day"))
        val last = llr.orderBy(desc("day")).limit(1)
          .select(col("llr").as("final_llr"))
        val nd = llr.agg(count(lit(1)).as("n_days"))
        nd.crossJoin(broadcast(cross)).crossJoin(broadcast(last))
          .join(llr.select(col("day"), col("llr").as("cross_llr")),
            col("crossing_day") === col("day"), "left")
          .select(col("n_days"), col("crossing_day"),
            when(col("cross_llr") >= 2.9444389791664403, "accept_h1")
              .when(col("cross_llr") <= -2.9444389791664403, "accept_h0")
              .otherwise("continue").as("decision"),
            col("final_llr"))
      },
      Some("""WITH d AS (SELECT epoch_us(ts) // 86400000000 AS day,
            CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0
              END) AS BIGINT) AS x,
            CAST(COUNT(*) AS BIGINT) AS n
          FROM events GROUP BY 1),
        llr AS (SELECT day,
            CAST(SUM(CAST(CAST(x AS DOUBLE) * 0.20067069546215124
                + CAST(n - x AS DOUBLE) * -0.050010420574661305
              AS DECIMAL(30,8))) OVER (ORDER BY day) AS DOUBLE) AS llr
          FROM d),
        cross_ AS (SELECT MIN(day) AS crossing_day FROM llr
          WHERE llr >= 2.9444389791664403
            OR llr <= -2.9444389791664403),
        lastr AS (SELECT llr AS final_llr FROM llr
          ORDER BY day DESC LIMIT 1),
        nd AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_days FROM llr)
        SELECT n_days, crossing_day,
          CASE WHEN c.llr >= 2.9444389791664403 THEN 'accept_h1'
            WHEN c.llr <= -2.9444389791664403 THEN 'accept_h0'
            ELSE 'continue' END AS decision, final_llr
        FROM nd CROSS JOIN cross_ CROSS JOIN lastr
        LEFT JOIN llr c ON c.day = cross_.crossing_day""")),

    // ── 1-D Wasserstein distance: weekday vs weekend revenue (q378) ─────
    // The OPTIMAL-TRANSPORT metric beside the sup-norm (KS q151), the
    // rank forms (CvM q334, AD q355) and the energy metric (q374): W₁
    // = ∫|F_x − F_y| is the minimal mass×distance to morph one daily-
    // revenue distribution into the other — the number a cost model
    // can use directly. On pooled DISTINCT values, W₁ = Σ Δv·|n·M −
    // m·N|/(m·n) is EXACT: gap × cumulative-count determinant in
    // decimal(38,0)/HUGEINT, one mirrored division. Same grid shapes
    // as q355 (cumulative + lead over the bounded value grid).
    QueryDef("q378_wasserstein_1d",
      (s, dir) => {
        val daily = t(s, dir, "events")
          .filter(col("event_type") === "purchase")
          .groupBy(expr("unix_micros(ts) div 86400000000").as("day"))
          .agg(sum(floor(col("value") * lit(1.0e6)).cast("long")).as("u"))
          .select(col("u"),
            (expr("(day + 4) % 7").isin(0, 6)).cast("long").as("we"))
        val blocks = daily.groupBy("u")
          .agg(sum(lit(1L) - col("we")).as("ax"), sum("we").as("ay"))
        val cum = blocks
          .withColumn("mm", sum("ax").over(boundedWindow("u")))
          .withColumn("nn", sum("ay").over(boundedWindow("u")))
          .withColumn("nx", lead("u", 1).over(boundedWindow("u")))
          .localCheckpoint()
        val ms = cum.agg(max("mm").as("m"), max("nn").as("n"))
        val agg = cum.filter(col("nx").isNotNull)
          .crossJoin(broadcast(ms))
          .select(col("m"), col("n"),
            ((col("nx") - col("u")).cast("decimal(38,0)") *
              abs(col("n") * col("mm") - col("m") * col("nn")))
              .as("term"))
          .agg(max("m").as("m_weekday"), max("n").as("n_weekend"),
            sum("term").as("st"))
        agg.select(col("m_weekday"), col("n_weekend"),
          (col("st").cast("double") /
            (col("m_weekday") * col("n_weekend")).cast("double") /
            lit(1.0e6)).as("w1"))
      },
      Some("""WITH daily AS (SELECT
            CAST(SUM(CAST(floor(value * 1000000.0) AS BIGINT)) AS BIGINT)
              AS u,
            CASE WHEN (epoch_us(ts) // 86400000000 + 4) % 7 IN (0, 6)
              THEN 1 ELSE 0 END AS we
          FROM events WHERE event_type = 'purchase'
          GROUP BY epoch_us(ts) // 86400000000,
            CASE WHEN (epoch_us(ts) // 86400000000 + 4) % 7 IN (0, 6)
              THEN 1 ELSE 0 END),
        blocks AS (SELECT u, CAST(SUM(1 - we) AS BIGINT) AS ax,
            CAST(SUM(we) AS BIGINT) AS ay
          FROM daily GROUP BY 1),
        cum AS (SELECT u,
            CAST(SUM(ax) OVER (ORDER BY u) AS BIGINT) AS mm,
            CAST(SUM(ay) OVER (ORDER BY u) AS BIGINT) AS nn,
            LEAD(u, 1) OVER (ORDER BY u) AS nx
          FROM blocks),
        ms AS (SELECT MAX(mm) AS m, MAX(nn) AS n FROM cum),
        agg AS (SELECT MAX(m) AS m_weekday, MAX(n) AS n_weekend,
            SUM(CAST(nx - u AS HUGEINT)
              * ABS(n * mm - m * nn)) AS st
          FROM cum CROSS JOIN ms WHERE nx IS NOT NULL)
        SELECT m_weekday, n_weekend,
          CAST(st AS DOUBLE)
            / CAST(m_weekday * n_weekend AS DOUBLE) / 1000000.0 AS w1
        FROM agg""")),

    // ── Kuiper test: is the weekly purchase phase uniform? (q379) ───────
    // The CIRCULAR goodness-of-fit member: KS (q151) depends on where
    // the week "starts" — its D changes if the cycle is rotated —
    // while Kuiper's V = D⁺ + D⁻ is rotation-invariant, the correct
    // test for "are purchases uniform over the weekly cycle at all?"
    // (q360 then says at which frequency the deviation lives). The
    // 7-bin discrete form: V = max_r(F_r − U_r) − min_r(F_r − U_r)
    // over cumulative shares vs the uniform ladder — exact rationals
    // into one mirrored max/min fold, plus the standard √n finite-
    // sample scaling (literals + IEEE sqrt).
    QueryDef("q379_kuiper",
      (s, dir) => {
        val r = t(s, dir, "events")
          .filter(col("event_type") === "purchase")
          .groupBy(expr("unix_micros(ts) div 86400000000 % 7").as("r"))
          .agg(count(lit(1)).as("c"))
        val cum = r.withColumn("cc", sum("c").over(boundedWindow("r")))
        val nn = r.agg(sum("c").as("n"))
        val dev = cum.crossJoin(broadcast(nn))
          .select(col("n"),
            (col("cc").cast("double") / col("n").cast("double") -
              (col("r") + 1L).cast("double") / lit(7.0)).as("dev"))
        dev.agg(max("n").as("n_purchases"),
            (max("dev") - min("dev")).as("v_stat"))
          .select(col("n_purchases"), col("v_stat"),
            (col("v_stat") *
              (sqrt(col("n_purchases").cast("double")) + lit(0.155) +
                lit(0.24) / sqrt(col("n_purchases").cast("double"))))
              .as("v_n"))
      },
      Some("""WITH r AS (SELECT
            epoch_us(ts) // 86400000000 % 7 AS r,
            CAST(COUNT(*) AS BIGINT) AS c
          FROM events WHERE event_type = 'purchase' GROUP BY 1),
        cum AS (SELECT r, c,
            CAST(SUM(c) OVER (ORDER BY r) AS BIGINT) AS cc
          FROM r),
        nn AS (SELECT CAST(SUM(c) AS BIGINT) AS n FROM r),
        dev AS (SELECT n,
            CAST(cc AS DOUBLE) / CAST(n AS DOUBLE)
              - CAST(r + 1 AS DOUBLE) / 7.0 AS dev
          FROM cum CROSS JOIN nn),
        agg AS (SELECT MAX(n) AS n_purchases,
            MAX(dev) - MIN(dev) AS v_stat FROM dev)
        SELECT n_purchases, v_stat,
          v_stat * (sqrt(CAST(n_purchases AS DOUBLE)) + 0.155
            + 0.24 / sqrt(CAST(n_purchases AS DOUBLE))) AS v_n
        FROM agg""")),

    // ── Circular statistics of purchase hour-of-day (q380) ──────────────
    // The HOUR axis the day-grid family never touches: the mean
    // resultant vector of purchase times on the 24-hour circle —
    // R̄ near 1 = tightly peaked hour, near 0 = uniform; circular
    // variance 1 − R̄ is the right spread for a quantity where 23:00
    // and 01:00 are 2 hours apart, not 22. Per-type rows (purchase vs
    // view vs error — do failures cluster at different hours than
    // revenue?). The 24-point trig table is shared literals
    // ([[hourTrig]]); projections are hour-bucket counts × literals
    // on the dsum rail — one scan, one bounded fold, no atan2 (both
    // engines' atan2 are NOT guaranteed to agree; the (C, S) vector
    // carries the direction exactly).
    QueryDef("q380_circular_hours",
      (s, dir) => {
        val hb = t(s, dir, "events")
          .filter(col("event_type").isin("purchase", "view", "error"))
          .groupBy(col("event_type"),
            expr("unix_micros(ts) div 3600000000 % 24").as("h"))
          .agg(count(lit(1)).as("c"))
        hb.groupBy("event_type")
          .agg(sum("c").as("n"),
            dsum(col("c").cast("double") *
              hourTrigSpark(sin = false)).as("cs"),
            dsum(col("c").cast("double") * hourTrigSpark(sin = true))
              .as("ss"))
          .select(col("event_type"), col("n").as("n_events"), col("cs"),
            col("ss"),
            (sqrt(col("cs") * col("cs") + col("ss") * col("ss")) /
              col("n").cast("double")).as("r_bar"))
          .withColumn("circ_var", lit(1.0) - col("r_bar"))
          .orderBy("event_type")
      },
      Some(s"""WITH hb AS (SELECT event_type,
            epoch_us(ts) // 3600000000 % 24 AS h,
            CAST(COUNT(*) AS BIGINT) AS c
          FROM events
          WHERE event_type IN ('purchase', 'view', 'error')
          GROUP BY 1, 2),
        agg AS (SELECT event_type, CAST(SUM(c) AS BIGINT) AS n,
            ${dsumSql(s"CAST(c AS DOUBLE) * (${hourTrigSql(sin = false)})")}
              AS cs,
            ${dsumSql(s"CAST(c AS DOUBLE) * (${hourTrigSql(sin = true)})")}
              AS ss
          FROM hb GROUP BY 1)
        SELECT event_type, n AS n_events, cs, ss,
          sqrt(cs * cs + ss * ss) / CAST(n AS DOUBLE) AS r_bar,
          1.0 - sqrt(cs * cs + ss * ss) / CAST(n AS DOUBLE) AS circ_var
        FROM agg ORDER BY event_type""")),

    // ── BWS test: weekday vs weekend revenue (q381) ─────────────────────
    // The HIGH-POWER nonparametric two-sample member: KS (q151)
    // weights all CDF gaps equally and AD (q355) reweights the tails;
    // Baumgartner–Weiß–Schindler standardizes each rank gap by its own
    // variance, which beats both in power across most alternatives —
    // the modern default when only a few dozen observations exist
    // (exactly the block-statistics regime). The day grid's (value,
    // day) total order makes ranks unambiguous; each term is the exact
    // integer square (m·R − (m+n)·i)² times an exact rational, folded
    // through dsum. One grid sort, one per-group window.
    QueryDef("q381_bws_test",
      (s, dir) => {
        val daily = t(s, dir, "events")
          .filter(col("event_type") === "purchase")
          .groupBy(expr("unix_micros(ts) div 86400000000").as("day"))
          .agg(sum(floor(col("value") * lit(1.0e6)).cast("long")).as("u"))
          .select(col("day"), col("u"),
            (expr("(day + 4) % 7").isin(0, 6)).cast("long").as("we"))
        val ranked = daily
          .withColumn("r", row_number()
            .over(boundedWindow(col("u"), col("day"))).cast("long"))
          .withColumn("i", row_number().over(Window.partitionBy("we")
            .orderBy(col("u"), col("day"))).cast("long"))
          .localCheckpoint()
        val ms = ranked.groupBy("we").agg(count(lit(1)).as("sz"))
        val m = ms.filter(col("we") === 0L).select(col("sz").as("m"))
        val n = ms.filter(col("we") === 1L).select(col("sz").as("n"))
        val wide = ranked.crossJoin(broadcast(m)).crossJoin(broadcast(n))
          .select(col("we"), col("r"), col("i"), col("m"), col("n"),
            when(col("we") === 0L, col("m")).otherwise(col("n"))
              .as("sk"),
            when(col("we") === 0L, col("n")).otherwise(col("m"))
              .as("so"))
        val terms = wide.select(col("we"), col("m"), col("n"),
          ((col("sk") * col("r") - (col("m") + col("n")) * col("i"))
            .cast("decimal(38,0)") *
            (col("sk") * col("r") - (col("m") + col("n")) * col("i")))
            .cast("double")
            .multiply((col("sk") + 1L).cast("double") *
              (col("sk") + 1L).cast("double"))
            .divide(col("sk").cast("double") * col("so").cast("double") *
              (col("m") + col("n")).cast("double") *
              col("i").cast("double") *
              (col("sk") + 1L - col("i")).cast("double")).as("term"))
        terms.groupBy("we")
          .agg(max("m").as("m"), max("n").as("n"),
            dsum(col("term")).as("bsum"))
          .select(col("we"), col("m"), col("n"),
            (col("bsum") /
              when(col("we") === 0L, col("m")).otherwise(col("n"))
                .cast("double")).as("b"))
          .agg(max("m").as("m_weekday"), max("n").as("n_weekend"),
            (dsum(col("b")) / lit(2.0)).as("bws_b"))
      },
      Some(s"""WITH daily AS (SELECT day, u,
            CASE WHEN (day + 4) % 7 IN (0, 6) THEN 1 ELSE 0 END AS we
          FROM (SELECT epoch_us(ts) // 86400000000 AS day,
              CAST(SUM(CAST(floor(value * 1000000.0) AS BIGINT))
                AS BIGINT) AS u
            FROM events WHERE event_type = 'purchase' GROUP BY 1)),
        ranked AS (SELECT we,
            CAST(ROW_NUMBER() OVER (ORDER BY u, day) AS BIGINT) AS r,
            CAST(ROW_NUMBER() OVER (PARTITION BY we ORDER BY u, day)
              AS BIGINT) AS i
          FROM daily),
        ms AS (SELECT
            (SELECT CAST(COUNT(*) AS BIGINT) FROM ranked WHERE we = 0)
              AS m,
            (SELECT CAST(COUNT(*) AS BIGINT) FROM ranked WHERE we = 1)
              AS n),
        wide AS (SELECT we, r, i, m, n,
            CASE WHEN we = 0 THEN m ELSE n END AS sk,
            CASE WHEN we = 0 THEN n ELSE m END AS so
          FROM ranked CROSS JOIN ms),
        terms AS (SELECT we, m, n,
            CAST(CAST(sk * r - (m + n) * i AS HUGEINT)
                * (sk * r - (m + n) * i) AS DOUBLE)
              * (CAST(sk + 1 AS DOUBLE) * CAST(sk + 1 AS DOUBLE))
              / (CAST(sk AS DOUBLE) * CAST(so AS DOUBLE)
                * CAST(m + n AS DOUBLE) * CAST(i AS DOUBLE)
                * CAST(sk + 1 - i AS DOUBLE)) AS term
          FROM wide),
        bs AS (SELECT we, MAX(m) AS m, MAX(n) AS n,
            ${dsumSql("term")}
              / CAST(CASE WHEN we = 0 THEN MAX(m) ELSE MAX(n) END
                AS DOUBLE) AS b
          FROM terms GROUP BY we)
        SELECT MAX(m) AS m_weekday, MAX(n) AS n_weekend,
          ${dsumSql("b")} / 2.0 AS bws_b
        FROM bs""")),

    // ── Runs-up-and-down randomness test (q382) ─────────────────────────
    // The DIRECTION-ALTERNATION member beside the level runs test
    // (q308, sign vs median) and turning points (q369, local extrema):
    // it counts maximal monotone runs of the DIFFERENCE sequence, the
    // classic check for slow drift (few long runs) vs overcorrection
    // (many short runs). Zero diffs are dropped (strict signs,
    // documented); runs = 1 + sign changes over the retained bounded
    // sequence; E = (2n−1)/3 and Var = (16n−29)/90 in one mirrored
    // chain.
    QueryDef("q382_runs_up_down",
      (s, dir) => {
        val daily = t(s, dir, "events")
          .filter(col("event_type") === "purchase")
          .groupBy(expr("unix_micros(ts) div 86400000000").as("day"))
          .agg(count(lit(1)).as("x"))
          .localCheckpoint()
        val sg = daily.as("a")
          .join(broadcast(daily).as("b"),
            col("a.day") === col("b.day") + 1L)
          .select(col("a.day").as("day"),
            signum((col("a.x") - col("b.x")).cast("double"))
              .cast("long").as("sg"))
          .filter(col("sg") =!= 0L)
        val runs = sg
          .withColumn("prev", lag("sg", 1).over(boundedWindow("day")))
          .select(when(col("prev").isNull || col("prev") =!= col("sg"),
            1L).otherwise(0L).as("brk"))
          .agg(count(lit(1)).as("nd"), sum("brk").as("runs"))
        runs.select((col("nd") + 1L).as("n_days"), col("runs"),
          ((col("runs").cast("double") -
            (lit(2.0) * (col("nd") + 1L).cast("double") - lit(1.0)) /
              lit(3.0)) /
            sqrt((lit(16.0) * (col("nd") + 1L).cast("double") -
              lit(29.0)) / lit(90.0))).as("z"))
      },
      Some("""WITH daily AS (SELECT epoch_us(ts) // 86400000000 AS day,
            CAST(COUNT(*) AS BIGINT) AS x
          FROM events WHERE event_type = 'purchase' GROUP BY 1),
        sg AS (SELECT a.day,
            CAST(CASE WHEN a.x > b.x THEN 1 WHEN a.x < b.x THEN -1
              ELSE 0 END AS BIGINT) AS sg
          FROM daily a JOIN daily b ON a.day = b.day + 1),
        nz AS (SELECT day, sg FROM sg WHERE sg <> 0),
        brk AS (SELECT CASE WHEN LAG(sg, 1) OVER (ORDER BY day) IS NULL
              OR LAG(sg, 1) OVER (ORDER BY day) <> sg
            THEN 1 ELSE 0 END AS brk
          FROM nz),
        agg AS (SELECT CAST(COUNT(*) AS BIGINT) AS nd,
            CAST(SUM(brk) AS BIGINT) AS runs FROM brk)
        SELECT nd + 1 AS n_days, runs,
          (CAST(runs AS DOUBLE)
              - (2.0 * CAST(nd + 1 AS DOUBLE) - 1.0) / 3.0)
            / sqrt((16.0 * CAST(nd + 1 AS DOUBLE) - 29.0) / 90.0) AS z
        FROM agg""")),

    // ── Records test for trend (q383) ───────────────────────────────────
    // The EXTREME-VALUE trend test: under exchangeability the t-th
    // observation is a running maximum with probability 1/t, so the
    // record count has mean H_n and variance H_n − H_n⁽²⁾ — too many
    // record-breaking revenue days IS the trend signal, detected
    // without ranks or slopes (and the natural companion of the q364
    // Gumbel fit, which models those records' magnitudes). Running max
    // and the harmonic sums both live on the bounded ordered day grid;
    // H_n folds 1/k through the dsum rail in the same k order on both
    // engines.
    QueryDef("q383_records_test",
      (s, dir) => {
        val daily = t(s, dir, "events")
          .filter(col("event_type") === "purchase")
          .groupBy(expr("unix_micros(ts) div 86400000000").as("day"))
          .agg(sum(floor(col("value") * lit(1.0e6)).cast("long")).as("u"))
        val rec = daily
          .withColumn("pmax", max("u").over(boundedWindow("day")
            .rowsBetween(Window.unboundedPreceding, -1)))
          .withColumn("k", row_number().over(boundedWindow("day"))
            .cast("long"))
          .select(col("k"),
            when(col("pmax").isNull || col("u") > col("pmax"), 1L)
              .otherwise(0L).as("rec"))
        rec.agg(count(lit(1)).as("n_days"),
            sum("rec").as("n_records"),
            dsum(lit(1.0) / col("k").cast("double")).as("h1"),
            dsum(lit(1.0) / (col("k") * col("k")).cast("double"))
              .as("h2"))
          .select(col("n_days"), col("n_records"), col("h1").as("e_records"),
            ((col("n_records").cast("double") - col("h1")) /
              sqrt(col("h1") - col("h2"))).as("z"))
      },
      Some(s"""WITH daily AS (SELECT epoch_us(ts) // 86400000000 AS day,
            CAST(SUM(CAST(floor(value * 1000000.0) AS BIGINT)) AS BIGINT)
              AS u
          FROM events WHERE event_type = 'purchase' GROUP BY 1),
        rec AS (SELECT
            CAST(ROW_NUMBER() OVER (ORDER BY day) AS BIGINT) AS k,
            CASE WHEN MAX(u) OVER (ORDER BY day
                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
                IS NULL
              OR u > MAX(u) OVER (ORDER BY day
                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
              THEN 1 ELSE 0 END AS rec
          FROM daily),
        agg AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_days,
            CAST(SUM(rec) AS BIGINT) AS n_records,
            ${dsumSql("1.0 / CAST(k AS DOUBLE)")} AS h1,
            ${dsumSql("1.0 / CAST(k * k AS DOUBLE)")} AS h2
          FROM rec)
        SELECT n_days, n_records, h1 AS e_records,
          (CAST(n_records AS DOUBLE) - h1) / sqrt(h1 - h2) AS z
        FROM agg""")),

    // ── Lepage location–scale test: weekday vs weekend (q384) ───────────
    // The COMBINED two-sample test: Mann–Whitney (q152) sees only
    // location, Brown–Forsythe (q347) only spread — Lepage adds the
    // standardized Wilcoxon and Ansari–Bradley squares, catching a
    // distribution that shifted AND tightened (the classic promo-week
    // signature) that either component alone under-rejects. The (u,
    // day) total order makes ranks unambiguous; W, the end-rank AB
    // scores min(r, N+1−r), and both exact-rational moment sets
    // (N-parity split for AB) feed one mirrored chain.
    QueryDef("q384_lepage",
      (s, dir) => {
        val daily = t(s, dir, "events")
          .filter(col("event_type") === "purchase")
          .groupBy(expr("unix_micros(ts) div 86400000000").as("day"))
          .agg(sum(floor(col("value") * lit(1.0e6)).cast("long")).as("u"))
          .select(col("day"), col("u"),
            (expr("(day + 4) % 7").isin(0, 6)).cast("long").as("we"))
        val ranked = daily
          .withColumn("r", row_number()
            .over(boundedWindow(col("u"), col("day"))).cast("long"))
          .localCheckpoint()
        // least(r, N+1−r) needs N: fold the counts first, then score
        // the checkpointed ranks with N broadcast
        val ns = ranked.agg(count(lit(1)).as("nn"),
          sum(lit(1L) - col("we")).as("m"))
        val scored = ranked.crossJoin(broadcast(ns))
          .select(col("we"), col("r"), col("nn"), col("m"),
            least(col("r"), col("nn") + 1L - col("r")).as("a"))
        val st = scored.agg(max("nn").as("nn"), max("m").as("m"),
          sum(when(col("we") === 0L, col("r")).otherwise(0L)).as("w"),
          sum(when(col("we") === 0L, col("a")).otherwise(0L)).as("ab"))
        val nD = col("nn").cast("double")
        val mD = col("m").cast("double")
        val knD = (col("nn") - col("m")).cast("double")
        val ew = mD * (nD + 1.0) / 2.0
        val vw = mD * knD * (nD + 1.0) / 12.0
        val ea = when(col("nn") % 2L === 0L, mD * (nD + 2.0) / 4.0)
          .otherwise(mD * (nD + 1.0) * (nD + 1.0) / (nD * 4.0))
        val va = when(col("nn") % 2L === 0L,
          mD * knD * (nD + 2.0) * (nD - 2.0) / ((nD - 1.0) * 48.0))
          .otherwise(mD * knD * (nD + 1.0) *
            (nD * nD + 3.0) / (nD * nD * 48.0))
        val zw = (col("w").cast("double") - ew) / sqrt(vw)
        val za = (col("ab").cast("double") - ea) / sqrt(va)
        st.select(col("m").as("m_weekday"),
          (col("nn") - col("m")).as("n_weekend"),
          (zw * zw + za * za).as("lepage_l"))
      },
      Some("""WITH daily AS (SELECT day, u,
            CASE WHEN (day + 4) % 7 IN (0, 6) THEN 1 ELSE 0 END AS we
          FROM (SELECT epoch_us(ts) // 86400000000 AS day,
              CAST(SUM(CAST(floor(value * 1000000.0) AS BIGINT))
                AS BIGINT) AS u
            FROM events WHERE event_type = 'purchase' GROUP BY 1)),
        ranked AS (SELECT we,
            CAST(ROW_NUMBER() OVER (ORDER BY u, day) AS BIGINT) AS r
          FROM daily),
        ns AS (SELECT CAST(COUNT(*) AS BIGINT) AS nn,
            CAST(SUM(1 - we) AS BIGINT) AS m FROM ranked),
        scored AS (SELECT we, r, nn, m,
            LEAST(r, nn + 1 - r) AS a
          FROM ranked CROSS JOIN ns),
        st AS (SELECT MAX(nn) AS nn, MAX(m) AS m,
            CAST(SUM(CASE WHEN we = 0 THEN r ELSE 0 END) AS BIGINT)
              AS w,
            CAST(SUM(CASE WHEN we = 0 THEN a ELSE 0 END) AS BIGINT)
              AS ab
          FROM scored),
        mo AS (SELECT nn, m, w, ab,
            CAST(nn AS DOUBLE) AS nd, CAST(m AS DOUBLE) AS md,
            CAST(nn - m AS DOUBLE) AS kd
          FROM st),
        fin AS (SELECT m, nn - m AS n_weekend,
            (CAST(w AS DOUBLE) - md * (nd + 1.0) / 2.0)
              / sqrt(md * kd * (nd + 1.0) / 12.0) AS zw,
            (CAST(ab AS DOUBLE)
              - CASE WHEN nn % 2 = 0 THEN md * (nd + 2.0) / 4.0
                ELSE md * (nd + 1.0) * (nd + 1.0) / (4.0 * nd) END)
              / sqrt(CASE WHEN nn % 2 = 0
                THEN md * kd * (nd + 2.0) * (nd - 2.0)
                  / (48.0 * (nd - 1.0))
                ELSE md * kd * (nd + 1.0) * (nd * nd + 3.0)
                  / (nd * nd * 48.0) END) AS za
          FROM mo)
        SELECT m AS m_weekday, n_weekend,
          zw * zw + za * za AS lepage_l
        FROM fin""")),

    // ── Quadratic-weighted Cohen's kappa (q385) ─────────────────────────
    // The ORDINAL agreement member: plain κ (q204) scores a 5-class
    // disagreement of 1 step and 4 steps identically; quadratic
    // weights w = (i−j)² make κ_w the standard metric for graded
    // labels (quality tiers, star ratings). Raters = two independent
    // fixed-grid views of each document (char-length tier vs
    // token-count tier — fixed caps, no corpus-wide quantile sort).
    // Multiplying through by N makes κ_w = 1 − N·ΣwO / Σw·(r_i·c_j)
    // an EXACT integer ratio (decimal(38,0)/HUGEINT), one division.
    QueryDef("q385_weighted_kappa",
      (s, dir) => {
        val d = t(s, dir, "documents").select(
          least(col("n_chars") / lit(200), lit(4L)).cast("long")
            .as("r1"),
          least(size(TextStats.tokens(col("text"))) / lit(30),
            lit(4L)).cast("long").as("r2"))
        val o = d.groupBy("r1", "r2").agg(count(lit(1)).as("c"))
          .localCheckpoint()
        val rm = o.groupBy("r1").agg(sum("c").as("rc"))
        val cm = o.groupBy("r2").agg(sum("c").as("cc"))
        val num = o.agg(sum(col("c").cast("decimal(38,0)") *
          (col("r1") - col("r2")) * (col("r1") - col("r2"))).as("swo"),
          sum("c").as("n"))
        val den = rm.crossJoin(broadcast(cm))
          .agg(sum(col("rc").cast("decimal(38,0)") * col("cc") *
            (col("r1") - col("r2")) * (col("r1") - col("r2")))
            .as("swe"))
        num.crossJoin(broadcast(den))
          .select(col("n").as("n_docs"),
            (lit(1.0) -
              (col("n").cast("decimal(38,0)") * col("swo"))
                .cast("double") / col("swe").cast("double"))
              .as("kappa_w"))
      },
      Some(s"""WITH d AS (SELECT
            LEAST(n_chars // 200, 4) AS r1,
            LEAST(len($dTok) // 30, 4) AS r2
          FROM documents),
        o AS (SELECT r1, r2, CAST(COUNT(*) AS BIGINT) AS c
          FROM d GROUP BY 1, 2),
        rm AS (SELECT r1, CAST(SUM(c) AS BIGINT) AS rc FROM o
          GROUP BY 1),
        cm AS (SELECT r2, CAST(SUM(c) AS BIGINT) AS cc FROM o
          GROUP BY 1),
        num AS (SELECT SUM(CAST(c AS HUGEINT)
              * (r1 - r2) * (r1 - r2)) AS swo,
            CAST(SUM(c) AS BIGINT) AS n FROM o),
        den AS (SELECT SUM(CAST(rc AS HUGEINT) * cc
              * (r1 - r2) * (r1 - r2)) AS swe
          FROM rm CROSS JOIN cm)
        SELECT n AS n_docs,
          1.0 - CAST(CAST(n AS HUGEINT) * swo AS DOUBLE)
            / CAST(swe AS DOUBLE) AS kappa_w
        FROM num CROSS JOIN den""")),

    // ── Cochran's C variance-outlier test (q386) ────────────────────────
    // "Is ONE group's variance carrying the heterogeneity?" — the
    // targeted follow-up to Brown–Forsythe's omnibus answer (q347):
    // C = max s²_g / Σ s²_g close to 1/k means homogeneous, close to
    // 1 indicts a single group. Per-event-type micro-unit moments fold
    // map-side; each s² is one mirrored rational; max and sum run
    // over the bounded group table.
    QueryDef("q386_cochrans_c",
      (s, dir) => {
        val g = t(s, dir, "events").select(col("event_type"),
            floor(col("value") * lit(1.0e6)).cast("long").as("u"))
          .groupBy("event_type")
          .agg(count(lit(1)).as("ng"), sum("u").as("su"),
            sum(col("u").cast("decimal(38,0)") * col("u")).as("suu"))
          .select(col("event_type"),
            ((col("ng").cast("decimal(38,0)") * col("suu") -
              col("su").cast("decimal(38,0)") * col("su"))
              .cast("double") /
              (col("ng").cast("decimal(38,0)") * (col("ng") - 1L))
                .cast("double") / lit(1.0e12)).as("s2"))
        g.agg(count(lit(1)).as("n_groups"), max("s2").as("max_s2"),
            dsum(col("s2")).as("sum_s2"))
          .select(col("n_groups"),
            (col("max_s2") / col("sum_s2")).as("c_stat"))
      },
      Some(s"""WITH g AS (SELECT event_type,
            CAST(COUNT(*) AS BIGINT) AS ng,
            CAST(SUM(CAST(floor(value * 1000000.0) AS BIGINT))
              AS BIGINT) AS su,
            SUM(CAST(CAST(floor(value * 1000000.0) AS BIGINT)
              AS HUGEINT)
              * CAST(floor(value * 1000000.0) AS BIGINT)) AS suu
          FROM events GROUP BY 1),
        s AS (SELECT event_type,
            CAST(CAST(ng AS HUGEINT) * suu
                - CAST(su AS HUGEINT) * su AS DOUBLE)
              / CAST(CAST(ng AS HUGEINT) * (ng - 1) AS DOUBLE)
              / 1e12 AS s2
          FROM g)
        SELECT CAST(COUNT(*) AS BIGINT) AS n_groups,
          MAX(s2) / ${dsumSql("s2")} AS c_stat
        FROM s""")),

    // ── Madogram (first-order variogram) of daily revenue (q387) ────────
    // The GEOSTATISTICS roughness summary the series family lacked:
    // γ₁(h) = E|u_t − u_{t+h}| reads structure directly in lag space —
    // γ₁ flat in h means white noise, growing means persistence, and a
    // DIP at h=7 below h=1 is the weekly cycle stated as a distance
    // (the robust, outlier-insensitive cousin of the squared
    // variogram, and the time-axis sibling of q374's energy distance).
    // Per-lag rows (h ∈ {1, 2, 7}) plus each lag's ratio to γ₁(1) as
    // the smoothness index. Exact integer |difference| folds over the
    // bounded day-grid lag joins; two mirrored divisions.
    QueryDef("q387_madogram",
      (s, dir) => {
        val daily = t(s, dir, "events")
          .filter(col("event_type") === "purchase")
          .groupBy(expr("unix_micros(ts) div 86400000000").as("day"))
          .agg(sum(floor(col("value") * lit(1.0e6)).cast("long")).as("u"))
          .localCheckpoint()
        def lagAbs(h: Int): DataFrame = daily.as("a")
          .join(broadcast(daily).as("b"),
            col("a.day") === col("b.day") + h)
          .select(lit(h.toLong).as("lag_h"),
            abs(col("a.u") - col("b.u")).as("d"))
        val g = lagAbs(1).union(lagAbs(2)).union(lagAbs(7))
          .groupBy("lag_h")
          .agg(count(lit(1)).as("n_pairs"),
            sum(col("d").cast("decimal(38,0)")).as("sd"))
          .select(col("lag_h"), col("n_pairs"),
            (col("sd").cast("double") / col("n_pairs").cast("double") /
              lit(1.0e6)).as("gamma1"))
          .localCheckpoint()
        val base = g.filter(col("lag_h") === 1L)
          .select(col("gamma1").as("g1"))
        g.crossJoin(broadcast(base))
          .select(col("lag_h"), col("n_pairs"), col("gamma1"),
            (col("gamma1") / col("g1")).as("ratio_to_lag1"))
          .orderBy("lag_h")
      },
      Some("""WITH daily AS (SELECT epoch_us(ts) // 86400000000 AS day,
            CAST(SUM(CAST(floor(value * 1000000.0) AS BIGINT)) AS BIGINT)
              AS u
          FROM events WHERE event_type = 'purchase' GROUP BY 1),
        d AS (SELECT h AS lag_h, ABS(a.u - b.u) AS d
          FROM (SELECT CAST(unnest([1, 2, 7]) AS BIGINT) AS h) hs
          JOIN daily a ON true
          JOIN daily b ON a.day = b.day + h),
        g AS (SELECT lag_h, CAST(COUNT(*) AS BIGINT) AS n_pairs,
            CAST(SUM(CAST(d AS HUGEINT)) AS DOUBLE)
              / CAST(COUNT(*) AS DOUBLE) / 1000000.0 AS gamma1
          FROM d GROUP BY 1),
        base AS (SELECT gamma1 AS g1 FROM g WHERE lag_h = 1)
        SELECT lag_h, n_pairs, gamma1, gamma1 / g1 AS ratio_to_lag1
        FROM g CROSS JOIN base
        ORDER BY lag_h""")),

    // ── Peak-over-threshold mean excess of daily revenue (q388) ─────────
    // The POT half of extreme-value analysis beside the block-maxima
    // Gumbel fit (q364): everything above the exact empirical p90 day
    // is an exceedance, and the mean-excess value E[u−t | u>t] is the
    // GPD diagnostic (roughly flat ⇒ exponential tail, rising ⇒
    // heavy). The threshold is an exact order statistic on the bounded
    // day grid (row_number cut, q354 selection shape), exceedance sums
    // are exact longs, and the two outputs are mirrored divisions —
    // no distributional fitting, just the sufficient statistics a GPD
    // fit would consume.
    QueryDef("q388_pot_mean_excess",
      (s, dir) => {
        val daily = t(s, dir, "events")
          .filter(col("event_type") === "purchase")
          .groupBy(expr("unix_micros(ts) div 86400000000").as("day"))
          .agg(sum(floor(col("value") * lit(1.0e6)).cast("long")).as("u"))
          .localCheckpoint()
        val n = daily.agg(count(lit(1)).as("n"))
        val thr = daily
          .withColumn("rk", row_number()
            .over(boundedWindow(col("u"), col("day"))).cast("long"))
          .crossJoin(broadcast(n))
          .filter(col("rk") === expr("(n * 9) div 10"))
          .select(col("u").as("t"))
        daily.crossJoin(broadcast(thr)).crossJoin(broadcast(n))
          .filter(col("u") > col("t"))
          .agg(max("n").as("n_days"), count(lit(1)).as("n_exceed"),
            max(col("t")).as("tmax"),
            sum(col("u") - col("t")).as("sx"))
          .select(col("n_days"), col("n_exceed"),
            (col("tmax").cast("double") / lit(1.0e6)).as("threshold"),
            (col("sx").cast("double") / col("n_exceed").cast("double") /
              lit(1.0e6)).as("mean_excess"))
      },
      Some("""WITH daily AS (SELECT epoch_us(ts) // 86400000000 AS day,
            CAST(SUM(CAST(floor(value * 1000000.0) AS BIGINT)) AS BIGINT)
              AS u
          FROM events WHERE event_type = 'purchase' GROUP BY 1),
        n AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM daily),
        thr AS (SELECT u AS t FROM (SELECT u,
              CAST(ROW_NUMBER() OVER (ORDER BY u, day) AS BIGINT) AS rk
            FROM daily) r CROSS JOIN n
          WHERE rk = (n * 9) // 10),
        e AS (SELECT n, t, u - t AS x
          FROM daily CROSS JOIN thr CROSS JOIN n WHERE u > t)
        SELECT MAX(n) AS n_days, CAST(COUNT(*) AS BIGINT) AS n_exceed,
          CAST(MAX(t) AS DOUBLE) / 1000000.0 AS threshold,
          CAST(SUM(x) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) / 1000000.0
            AS mean_excess
        FROM e""")),

    // ── Durbin–Watson serial-correlation statistic (q389) ───────────────
    // The RESIDUAL-space autocorrelation diagnostic beside Ljung–Box's
    // correlogram (q340): DW = Σ(e_t − e_{t−1})²/Σe_t² over
    // mean-centered daily purchase counts, near 2 for white noise,
    // → 0 under positive serial correlation. Residuals are scaled by n
    // (e·n = n·x_t − Σx) so EVERYTHING up to the final division is an
    // exact integer on decimal(38,0)/HUGEINT — the n² factors cancel
    // in the ratio. Adjacent means both calendar days present (the
    // q387 lag-join convention); one scan, bounded-grid lag join.
    QueryDef("q389_durbin_watson",
      (s, dir) => {
        val d = t(s, dir, "events")
          .filter(col("event_type") === "purchase")
          .groupBy(expr("unix_micros(ts) div 86400000000").as("day"))
          .agg(count(lit(1)).as("x"))
        val tot = d.agg(count(lit(1)).as("n"), sum("x").as("sx"))
        val e = d.crossJoin(broadcast(tot))
          .select(col("day"),
            (col("n").cast("decimal(38,0)") * col("x") - col("sx"))
              .as("ee"))
          .localCheckpoint()
        val den = e.agg(count(lit(1)).as("n_days"),
          sum(col("ee") * col("ee")).as("dd"))
        val num = e.as("a")
          .join(broadcast(e).as("b"), col("a.day") === col("b.day") + 1)
          .agg(count(lit(1)).as("n_pairs"),
            sum((col("a.ee") - col("b.ee")) * (col("a.ee") - col("b.ee")))
              .as("nn"))
        den.crossJoin(broadcast(num))
          .select(col("n_days"), col("n_pairs"),
            (col("nn").cast("double") / col("dd").cast("double"))
              .as("dw"))
      },
      Some("""WITH daily AS (SELECT epoch_us(ts) // 86400000000 AS day,
            CAST(COUNT(*) AS BIGINT) AS x
          FROM events WHERE event_type = 'purchase' GROUP BY 1),
        tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS n,
            CAST(SUM(x) AS BIGINT) AS sx FROM daily),
        e AS (SELECT day, CAST(n AS HUGEINT) * x - sx AS ee
          FROM daily CROSS JOIN tot),
        den AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_days,
            SUM(ee * ee) AS dd FROM e),
        num AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_pairs,
            SUM((a.ee - b.ee) * (a.ee - b.ee)) AS nn
          FROM e a JOIN e b ON a.day = b.day + 1)
        SELECT n_days, n_pairs,
          CAST(nn AS DOUBLE) / CAST(dd AS DOUBLE) AS dw
        FROM den CROSS JOIN num""")),

    // ── Bartels rank von Neumann randomness test (q390) ─────────────────
    // The RANK-based randomness test between the sign-pattern tests
    // (runs-up-down q382, turning point q369) and the value-based DW
    // (q389): RVN = Σ(R_t − R_{t+1})²/Σ(R_t − R̄)² on daily-count
    // ranks, ≈2 under randomness, robust to outliers the value tests
    // feel. Ranks are doubled midranks 2·#less + #eq(incl) + 1 (the
    // corrected q363 convention), so R̄ = n+1 EXACTLY and both sums
    // are exact integers — the uniform /4 cancels in the ratio.
    QueryDef("q390_bartels_rvn",
      (s, dir) => {
        val d = t(s, dir, "events")
          .filter(col("event_type") === "purchase")
          .groupBy(expr("unix_micros(ts) div 86400000000").as("day"))
          .agg(count(lit(1)).as("x"))
          .localCheckpoint()
        val r = d.as("a").crossJoin(broadcast(d).as("b"))
          .groupBy(col("a.day").as("day"))
          .agg((lit(2L) * sum(when(col("b.x") < col("a.x"), 1L)
              .otherwise(0L)) +
            sum(when(col("b.x") === col("a.x"), 1L).otherwise(0L)) +
            lit(1L)).as("rr"))
          .localCheckpoint()
        val den = r.crossJoin(broadcast(r.agg(count(lit(1)).as("n"))))
          .agg(max("n").as("n_days"),
            sum((col("rr") - col("n") - 1L).cast("decimal(38,0)") *
              (col("rr") - col("n") - 1L)).as("dd"))
        val num = r.as("a")
          .join(broadcast(r).as("b"), col("a.day") === col("b.day") + 1)
          .agg(count(lit(1)).as("n_pairs"),
            sum((col("a.rr") - col("b.rr")).cast("decimal(38,0)") *
              (col("a.rr") - col("b.rr"))).as("nn"))
        den.crossJoin(broadcast(num))
          .select(col("n_days"), col("n_pairs"),
            (col("nn").cast("double") / col("dd").cast("double"))
              .as("rvn"))
      },
      Some("""WITH daily AS (SELECT epoch_us(ts) // 86400000000 AS day,
            CAST(COUNT(*) AS BIGINT) AS x
          FROM events WHERE event_type = 'purchase' GROUP BY 1),
        r AS (SELECT a.day,
            2 * SUM(CASE WHEN b.x < a.x THEN 1 ELSE 0 END)
              + SUM(CASE WHEN b.x = a.x THEN 1 ELSE 0 END) + 1 AS rr
          FROM daily a CROSS JOIN daily b GROUP BY 1),
        n AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM r),
        den AS (SELECT MAX(n) AS n_days,
            SUM(CAST(rr - n - 1 AS HUGEINT) * (rr - n - 1)) AS dd
          FROM r CROSS JOIN n),
        num AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_pairs,
            SUM(CAST(a.rr - b.rr AS HUGEINT) * (a.rr - b.rr)) AS nn
          FROM r a JOIN r b ON a.day = b.day + 1)
        SELECT n_days, n_pairs,
          CAST(nn AS DOUBLE) / CAST(dd AS DOUBLE) AS rvn
        FROM den CROSS JOIN num""")),

    // ── Cox–Stuart trend sign test (q391) ───────────────────────────────
    // The distribution-free trend test that needs NOTHING but signs:
    // pair the i-th day (rank order, gaps irrelevant) with the
    // (i + ⌈n/2⌉)-th and count sign(later − earlier) — the sign-test
    // reduction of trend, beside Mann–Kendall's all-pairs S (q232) and
    // the seasonal variants (q367/q373). Counts are exact integers;
    // the continuity-corrected normal z is one shared-shape chain with
    // a single IEEE sqrt of an integer.
    QueryDef("q391_cox_stuart",
      (s, dir) => {
        val d = t(s, dir, "events")
          .filter(col("event_type") === "purchase")
          .groupBy(expr("unix_micros(ts) div 86400000000").as("day"))
          .agg(count(lit(1)).as("x"))
        val rk = d.withColumn("rk", row_number()
            .over(boundedWindow(col("day"), col("day"))).cast("long"))
          .localCheckpoint()
        val n = rk.agg(count(lit(1)).as("n"))
        val pairs = rk.as("a").crossJoin(broadcast(n))
          .join(broadcast(rk).as("b"),
            col("b.rk") === col("a.rk") + expr("(n + 1) div 2"))
        val cnt = pairs.agg(max("n").as("n_days"),
          count(lit(1)).as("n_pairs"),
          sum(when(col("b.x") > col("a.x"), 1L).otherwise(0L))
            .as("n_plus"),
          sum(when(col("b.x") < col("a.x"), 1L).otherwise(0L))
            .as("n_minus"))
        cnt.select(col("n_days"), col("n_pairs"), col("n_plus"),
          col("n_minus"),
          (col("n_pairs") - col("n_plus") - col("n_minus")).as("n_ties"),
          ((abs(col("n_plus") - col("n_minus")) - lit(1L)).cast("double") /
            sqrt((col("n_plus") + col("n_minus")).cast("double")))
            .as("z"))
      },
      Some("""WITH daily AS (SELECT epoch_us(ts) // 86400000000 AS day,
            CAST(COUNT(*) AS BIGINT) AS x
          FROM events WHERE event_type = 'purchase' GROUP BY 1),
        rk AS (SELECT day, x,
            CAST(ROW_NUMBER() OVER (ORDER BY day) AS BIGINT) AS rk
          FROM daily),
        n AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM rk),
        p AS (SELECT n, CASE WHEN b.x > a.x THEN 1 ELSE 0 END AS up,
            CASE WHEN b.x < a.x THEN 1 ELSE 0 END AS dn
          FROM rk a CROSS JOIN n
          JOIN rk b ON b.rk = a.rk + (n + 1) // 2),
        c AS (SELECT MAX(n) AS n_days, CAST(COUNT(*) AS BIGINT)
              AS n_pairs,
            CAST(SUM(up) AS BIGINT) AS n_plus,
            CAST(SUM(dn) AS BIGINT) AS n_minus
          FROM p)
        SELECT n_days, n_pairs, n_plus, n_minus,
          n_pairs - n_plus - n_minus AS n_ties,
          CAST(ABS(n_plus - n_minus) - 1 AS DOUBLE)
            / sqrt(CAST(n_plus + n_minus AS DOUBLE)) AS z
        FROM c""")),

    // ── L-moments of daily revenue (q392) ───────────────────────────────
    // The ORDER-STATISTIC moment system (Hosking 1990) the extremes
    // pair (q364 Gumbel, q388 POT) would standardize on at scale:
    // ℓ1/ℓ2/τ2/τ3 are linear in the sorted sample, so they exist for
    // heavy tails where classical skewness diverges. With probability
    // weights b_r = Σ(rk−1)⋯(rk−r)·x the ratios collapse to EXACT
    // integer fractions — τ3 = (6b2n − 6(n−2)b1n + (n−1)(n−2)b0n) /
    // ((n−2)(2b1n − (n−1)b0n)) — on the decimal(38,0)/HUGEINT rail;
    // tie blocks contribute permutation-invariant weight sums, so the
    // row_number tie-break cannot move any output.
    QueryDef("q392_l_moments",
      (s, dir) => {
        val d = t(s, dir, "events")
          .filter(col("event_type") === "purchase")
          .groupBy(expr("unix_micros(ts) div 86400000000").as("day"))
          .agg(sum(floor(col("value") * lit(1.0e6)).cast("long")).as("u"))
        val rk = d.withColumn("rk", row_number()
          .over(boundedWindow(col("u"), col("day"))).cast("long"))
        val b = rk.agg(count(lit(1)).as("n"),
          sum(col("u").cast("decimal(38,0)")).as("b0"),
          sum((col("rk") - 1L).cast("decimal(38,0)") * col("u")).as("b1"),
          sum(((col("rk") - 1L) * (col("rk") - 2L)).cast("decimal(38,0)") *
            col("u")).as("b2"))
        b.select(col("n").as("n_days"),
            (col("b0").cast("double") / col("n").cast("double") /
              lit(1.0e6)).as("l1"),
            (lit(2L) * col("b1") - (col("n") - 1L) * col("b0")).as("l2n"),
            col("n"), col("b0"), col("b1"), col("b2"))
          .select(col("n_days"), col("l1"),
            (col("l2n").cast("double") /
              (col("n") * (col("n") - 1L)).cast("double") / lit(1.0e6))
              .as("l2"),
            (col("l2n").cast("double") /
              ((col("n") - 1L).cast("decimal(38,0)") * col("b0"))
                .cast("double")).as("l_cv"),
            ((lit(6L) * col("b2") - lit(6L) * (col("n") - 2L) * col("b1") +
              ((col("n") - 1L) * (col("n") - 2L)).cast("decimal(38,0)") *
                col("b0")).cast("double") /
              ((col("n") - 2L).cast("decimal(38,0)") * col("l2n"))
                .cast("double")).as("l_skew"))
      },
      Some("""WITH daily AS (SELECT epoch_us(ts) // 86400000000 AS day,
            CAST(SUM(CAST(floor(value * 1000000.0) AS BIGINT)) AS BIGINT)
              AS u
          FROM events WHERE event_type = 'purchase' GROUP BY 1),
        rk AS (SELECT u,
            CAST(ROW_NUMBER() OVER (ORDER BY u, day) AS BIGINT) AS rk
          FROM daily),
        b AS (SELECT CAST(COUNT(*) AS BIGINT) AS n,
            SUM(CAST(u AS HUGEINT)) AS b0,
            SUM(CAST(rk - 1 AS HUGEINT) * u) AS b1,
            SUM(CAST((rk - 1) * (rk - 2) AS HUGEINT) * u) AS b2
          FROM rk),
        l AS (SELECT n, b0, b1, b2,
            2 * b1 - (n - 1) * b0 AS l2n FROM b)
        SELECT n AS n_days,
          CAST(b0 AS DOUBLE) / CAST(n AS DOUBLE) / 1000000.0 AS l1,
          CAST(l2n AS DOUBLE) / CAST(n * (n - 1) AS DOUBLE) / 1000000.0
            AS l2,
          CAST(l2n AS DOUBLE)
            / CAST(CAST(n - 1 AS HUGEINT) * b0 AS DOUBLE) AS l_cv,
          CAST(6 * b2 - 6 * (n - 2) * b1
              + CAST((n - 1) * (n - 2) AS HUGEINT) * b0 AS DOUBLE)
            / CAST(CAST(n - 2 AS HUGEINT) * l2n AS DOUBLE) AS l_skew
        FROM l""")),

    // ── Cronbach's alpha of the weekday "scale" (q393) ──────────────────
    // Internal-consistency reliability with weekdays as the 7 items
    // and complete weeks as subjects — the psychometric summary the
    // blocked tests (Friedman q310, Quade q363) decompose: high α says
    // weekdays co-vary (a week is "one construct"), low α says days
    // move independently. The n(n−1) variance denominators cancel, so
    // α = 7(B−A)/(6B) with A = Σ_j(nΣx² − (Σx)²) and B = nΣT² − (ΣT)²
    // is ONE exact integer ratio on decimal(38,0)/HUGEINT.
    QueryDef("q393_cronbach_alpha",
      (s, dir) => {
        val d = t(s, dir, "events")
          .filter(col("event_type") === "purchase")
          .groupBy(expr("unix_micros(ts) div 86400000000").as("day"))
          .agg(count(lit(1)).as("x"))
          .select(expr("day div 7").as("wk"), (col("day") % 7L).as("wd"),
            col("x"))
        val full = d.groupBy("wk").agg(count(lit(1)).as("nd"),
            sum("x").as("tw"))
          .filter(col("nd") === 7L)
          .localCheckpoint()
        val n = full.agg(count(lit(1)).as("n"))
        val a = d.join(broadcast(full.select("wk")), Seq("wk"))
          .groupBy("wd")
          .agg(sum("x").as("sj"),
            sum(col("x").cast("decimal(38,0)") * col("x")).as("qj"))
          .crossJoin(broadcast(n))
          .agg(sum(col("n") * col("qj") -
            col("sj").cast("decimal(38,0)") * col("sj")).as("aa"))
        val b = full.crossJoin(broadcast(n))
          .agg(max("n").as("n_weeks"),
            (max("n") * sum(col("tw").cast("decimal(38,0)") * col("tw")))
              .as("ntt"),
            sum("tw").as("st"))
          .select(col("n_weeks"),
            (col("ntt") - col("st").cast("decimal(38,0)") * col("st"))
              .as("bb"))
        b.crossJoin(broadcast(a))
          .select(col("n_weeks"), lit(7L).as("k"),
            ((lit(7L) * (col("bb") - col("aa"))).cast("double") /
              (lit(6L) * col("bb")).cast("double")).as("alpha"))
      },
      Some("""WITH d AS (SELECT day // 7 AS wk, day % 7 AS wd,
            CAST(COUNT(*) AS BIGINT) AS x
          FROM (SELECT epoch_us(ts) // 86400000000 AS day FROM events
            WHERE event_type = 'purchase')
          GROUP BY day // 7, day % 7),
        fw AS (SELECT wk, CAST(SUM(x) AS BIGINT) AS tw
          FROM d GROUP BY wk HAVING COUNT(*) = 7),
        n AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM fw),
        a AS (SELECT SUM(n * qj - CAST(sj AS HUGEINT) * sj) AS aa FROM
          (SELECT wd, CAST(SUM(x) AS BIGINT) AS sj,
              SUM(CAST(x AS HUGEINT) * x) AS qj
            FROM d JOIN fw USING (wk) GROUP BY wd) i CROSS JOIN n),
        b AS (SELECT MAX(n) AS n_weeks,
            MAX(n) * SUM(CAST(tw AS HUGEINT) * tw)
              - CAST(CAST(SUM(tw) AS BIGINT) AS HUGEINT) * SUM(tw) AS bb
          FROM fw CROSS JOIN n)
        SELECT n_weeks, CAST(7 AS BIGINT) AS k,
          CAST(7 * (bb - aa) AS DOUBLE) / CAST(6 * bb AS DOUBLE) AS alpha
        FROM b CROSS JOIN a""")),

    // ── Bray–Curtis & Morisita–Horn between sources (q394) ─────────────
    // Community-ecology dissimilarity on token abundance profiles —
    // the ABUNDANCE-aware companions of the set-overlap family
    // (Jaccard q28, containment q?): Bray–Curtis reads shared MASS,
    // Morisita–Horn is the dominance-weighted overlap that ignores
    // rare-type noise. Both collapse to exact integer fractions —
    // BC = (N1+N2−2Σmin)/(N1+N2), MH = 2·Σf1f2·N1N2 /
    // (Σf1²·N2² + Σf2²·N1²) — on decimal(38,0)/HUGEINT; the pair join
    // on token touches only tokens present in both sources (absent ⇒
    // min/product 0). Sources are bounded, so the pair grid is too.
    QueryDef("q394_community_dissimilarity",
      (s, dir) => {
        val f = tPar(s, dir, "documents")
          .select(col("source"),
            explode(TextStats.tokens(col("text"))).as("token"))
          .groupBy("source", "token").agg(count(lit(1)).as("f"))
          .localCheckpoint()
        val stats = f.groupBy("source")
          .agg(sum("f").as("nn"),
            sum(col("f").cast("decimal(38,0)") * col("f")).as("f2"))
          .localCheckpoint()
        val p = f.as("a").join(f.as("b"),
            col("a.token") === col("b.token") &&
              col("a.source") < col("b.source"))
          .groupBy(col("a.source").as("source_a"),
            col("b.source").as("source_b"))
          .agg(sum(least(col("a.f"), col("b.f"))).as("smin"),
            sum(col("a.f").cast("decimal(38,0)") * col("b.f")).as("s12"))
        p.join(broadcast(stats.select(col("source").as("source_a"),
            col("nn").as("n1"), col("f2").as("f21"))), "source_a")
          .join(broadcast(stats.select(col("source").as("source_b"),
            col("nn").as("n2"), col("f2").as("f22"))), "source_b")
          .select(col("source_a"), col("source_b"),
            col("n1"), col("n2"),
            ((col("n1") + col("n2") - lit(2L) * col("smin"))
              .cast("double") /
              (col("n1") + col("n2")).cast("double")).as("bray_curtis"),
            ((lit(2L) * col("s12") *
              (col("n1").cast("decimal(38,0)") * col("n2")))
              .cast("double") /
              (col("f21") * (col("n2").cast("decimal(38,0)") * col("n2")) +
                col("f22") *
                  (col("n1").cast("decimal(38,0)") * col("n1")))
                .cast("double")).as("morisita_horn"))
          .orderBy("source_a", "source_b")
      },
      Some(s"""WITH f AS (SELECT source, tok AS token,
            CAST(COUNT(*) AS BIGINT) AS f
          FROM (SELECT source, unnest($dTok) AS tok FROM documents)
          GROUP BY 1, 2),
        stats AS (SELECT source, CAST(SUM(f) AS BIGINT) AS nn,
            SUM(CAST(f AS HUGEINT) * f) AS f2 FROM f GROUP BY source),
        p AS (SELECT a.source AS source_a, b.source AS source_b,
            CAST(SUM(LEAST(a.f, b.f)) AS BIGINT) AS smin,
            SUM(CAST(a.f AS HUGEINT) * b.f) AS s12
          FROM f a JOIN f b
            ON a.token = b.token AND a.source < b.source
          GROUP BY 1, 2)
        SELECT source_a, source_b, x.nn AS n1, y.nn AS n2,
          CAST(x.nn + y.nn - 2 * smin AS DOUBLE)
            / CAST(x.nn + y.nn AS DOUBLE) AS bray_curtis,
          CAST(2 * s12 * (CAST(x.nn AS HUGEINT) * y.nn) AS DOUBLE)
            / CAST(x.f2 * (CAST(y.nn AS HUGEINT) * y.nn)
                + y.f2 * (CAST(x.nn AS HUGEINT) * x.nn) AS DOUBLE)
            AS morisita_horn
        FROM p JOIN stats x ON p.source_a = x.source
        JOIN stats y ON p.source_b = y.source
        ORDER BY source_a, source_b""")),

    // ── Degree assortativity of the strong token graph (q395) ───────────
    // Newman's one-number mixing coefficient: do hubs tie to hubs
    // (r > 0) or to the periphery (r < 0)? The scalar summary the
    // rich-club CURVE (q370) refines and k-core/k-truss localize. Over
    // the directed edge list Σj = Σk and Σj² = Σk², so Pearson's sqrt
    // cancels and r = (mΣjk − (Σj)²)/(mΣj² − (Σj)²) is one exact
    // integer ratio (Search.degreeAssortativity) — broadcast degree
    // joins on the ≤vocab² edge table after the one corpus pass.
    QueryDef("q395_degree_assortativity",
      (s, dir) => graft.ext.Search.degreeAssortativity(
        tPar(s, dir, "documents"), "doc_id", "text", trVocab,
        linkSupNum, linkSupDen),
      Some(s"""WITH dt AS (SELECT DISTINCT doc_id, tok AS token
            FROM (SELECT doc_id, unnest($dTok) AS tok FROM documents)),
        ndt AS (SELECT CAST(COUNT(*) AS BIGINT) AS nd FROM documents),
        v AS (SELECT token FROM (SELECT token, COUNT(*) AS df FROM dt
          GROUP BY 1 ORDER BY df DESC, token LIMIT $trVocab)),
        vt AS (SELECT dt.doc_id, dt.token FROM dt JOIN v USING (token)),
        co AS (SELECT a.token AS src, b.token AS dst,
            CAST(COUNT(*) AS BIGINT) AS c
          FROM vt a JOIN vt b
            ON a.doc_id = b.doc_id AND a.token < b.token
          GROUP BY 1, 2),
        half AS (SELECT src, dst FROM co, ndt
          WHERE c * $linkSupDen > $linkSupNum * nd),
        nb AS (SELECT src, dst FROM half
          UNION ALL SELECT dst, src FROM half),
        deg AS (SELECT src AS t, CAST(COUNT(*) AS BIGINT) AS deg
          FROM nb GROUP BY 1),
        e AS (SELECT du.deg AS du, dv.deg AS dv
          FROM nb JOIN deg du ON nb.src = du.t
          JOIN deg dv ON nb.dst = dv.t),
        m AS (SELECT CAST(COUNT(*) AS BIGINT) AS m,
            SUM(CAST(du AS HUGEINT)) AS sj,
            SUM(CAST(du AS HUGEINT) * dv) AS sjk,
            SUM(CAST(du AS HUGEINT) * du) AS sjj FROM e),
        nn AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_nodes FROM deg)
        SELECT n_nodes, m // 2 AS n_edges,
          CAST(m * sjk - sj * sj AS DOUBLE)
            / CAST(m * sjj - sj * sj AS DOUBLE) AS assortativity
        FROM m CROSS JOIN nn""")),

    // ── Wiener index & global efficiency of the strong graph (q396) ─────
    // The two closed-form summaries of the q371 distance census:
    // Wiener = Σd·pairs (an exact long — chemistry's oldest topological
    // index) and global efficiency = mean 1/d over reached pairs, the
    // communication-capacity reading that tolerates disconnection
    // where mean path length diverges. 1/d for the ≤5 reachable
    // distances are SHARED literals (no data-path division per row);
    // the efficiency fold rides the dsum rail. Same 4 min-plus rounds
    // as q371, MATERIALIZED in the oracle.
    QueryDef("q396_wiener_efficiency",
      (s, dir) => {
        val h = graft.ext.Search.distanceHistogram(
            tPar(s, dir, "documents"), "doc_id", "text", trVocab,
            linkSupNum, linkSupDen, 4)
          .localCheckpoint()
        val inv = when(col("dist") === 1L, lit(1.0))
          .when(col("dist") === 2L, lit(0.5))
          .when(col("dist") === 3L, lit(0.3333333333333333))
          .when(col("dist") === 4L, lit(0.25))
          .otherwise(lit(0.2))
        h.agg(max("dist").as("diameter"),
            sum("n_pairs").as("n_reached"),
            sum(col("dist") * col("n_pairs")).as("wiener"),
            dsum(col("n_pairs").cast("double") * inv).as("sinv"))
          .select(col("diameter"), col("n_reached"), col("wiener"),
            (col("wiener").cast("double") / col("n_reached").cast("double"))
              .as("mean_path"),
            (col("sinv") / col("n_reached").cast("double"))
              .as("efficiency"))
      },
      Some(s"""WITH dt AS (SELECT DISTINCT doc_id, tok AS token
            FROM (SELECT doc_id, unnest($dTok) AS tok FROM documents)),
        ndt AS (SELECT CAST(COUNT(*) AS BIGINT) AS nd FROM documents),
        v AS (SELECT token FROM (SELECT token, COUNT(*) AS df FROM dt
          GROUP BY 1 ORDER BY df DESC, token LIMIT $trVocab)),
        vt AS (SELECT dt.doc_id, dt.token FROM dt JOIN v USING (token)),
        co AS (SELECT a.token AS src, b.token AS dst,
            CAST(COUNT(*) AS BIGINT) AS c
          FROM vt a JOIN vt b
            ON a.doc_id = b.doc_id AND a.token < b.token
          GROUP BY 1, 2),
        half AS (SELECT src, dst FROM co, ndt
          WHERE c * $linkSupDen > $linkSupNum * nd),
        nb AS MATERIALIZED (SELECT src, dst FROM half
          UNION ALL SELECT dst, src FROM half),
        d0 AS MATERIALIZED (SELECT src AS u, dst AS v,
          CAST(1 AS BIGINT) AS d FROM nb),
        ${(0 until 4).map { i =>
          s"""d${i + 1} AS MATERIALIZED (SELECT u, v, MIN(d) AS d FROM (
               SELECT u, v, d FROM d$i
               UNION ALL
               SELECT d$i.u, nb.dst AS v, d$i.d + 1
               FROM d$i JOIN nb ON d$i.v = nb.src) t
             GROUP BY 1, 2)"""
        }.mkString(",\n")},
        hist AS (SELECT d AS dist, CAST(COUNT(*) AS BIGINT) AS n_pairs
          FROM d4 WHERE u < v GROUP BY 1)
        SELECT MAX(dist) AS diameter,
          CAST(SUM(n_pairs) AS BIGINT) AS n_reached,
          CAST(SUM(dist * n_pairs) AS BIGINT) AS wiener,
          CAST(SUM(dist * n_pairs) AS DOUBLE)
            / CAST(SUM(n_pairs) AS DOUBLE) AS mean_path,
          ${dsumSql("""CAST(n_pairs AS DOUBLE) * (CASE
            WHEN dist = 1 THEN 1.0 WHEN dist = 2 THEN 0.5
            WHEN dist = 3 THEN 0.3333333333333333
            WHEN dist = 4 THEN 0.25 ELSE 0.2 END)""")}
            / CAST(SUM(n_pairs) AS DOUBLE) AS efficiency
        FROM hist""")),

    // ── Mean local clustering coefficient (q397) ────────────────────────
    // The Watts–Strogatz LOCAL texture the single global transitivity
    // (q328-family triangleStats) averages away: cc(v) = 2t(v) /
    // (deg(v)(deg(v)−1)) over deg ≥ 2 nodes, mean + max reported. The
    // two disagree with the global number exactly when triangles
    // concentrate on hubs — the small-world diagnostic. One wedge join
    // keyed on the centre vertex (Search.localClustering); each cc is
    // one deterministic division and the mean rides the dsum rail.
    QueryDef("q397_local_clustering",
      (s, dir) => graft.ext.Search.localClustering(
        tPar(s, dir, "documents"), "doc_id", "text", trVocab,
        linkSupNum, linkSupDen),
      Some(s"""WITH dt AS (SELECT DISTINCT doc_id, tok AS token
            FROM (SELECT doc_id, unnest($dTok) AS tok FROM documents)),
        ndt AS (SELECT CAST(COUNT(*) AS BIGINT) AS nd FROM documents),
        v AS (SELECT token FROM (SELECT token, COUNT(*) AS df FROM dt
          GROUP BY 1 ORDER BY df DESC, token LIMIT $trVocab)),
        vt AS (SELECT dt.doc_id, dt.token FROM dt JOIN v USING (token)),
        co AS (SELECT a.token AS src, b.token AS dst,
            CAST(COUNT(*) AS BIGINT) AS c
          FROM vt a JOIN vt b
            ON a.doc_id = b.doc_id AND a.token < b.token
          GROUP BY 1, 2),
        half AS MATERIALIZED (SELECT src, dst FROM co, ndt
          WHERE c * $linkSupDen > $linkSupNum * nd),
        nb AS MATERIALIZED (SELECT src, dst FROM half
          UNION ALL SELECT dst, src FROM half),
        deg AS (SELECT src AS t, CAST(COUNT(*) AS BIGINT) AS deg
          FROM nb GROUP BY 1),
        tri AS (SELECT w.v AS t, CAST(COUNT(*) AS BIGINT) AS tv FROM
          (SELECT x.src AS v, x.dst AS a, y.dst AS b
            FROM nb x JOIN nb y ON x.src = y.src AND x.dst < y.dst) w
          JOIN half h ON w.a = h.src AND w.b = h.dst
          GROUP BY 1),
        cc AS (SELECT deg.t,
            2.0 * CAST(COALESCE(tv, 0) AS DOUBLE)
              / (CAST(deg AS DOUBLE) * CAST(deg - 1 AS DOUBLE)) AS cc
          FROM deg LEFT JOIN tri ON deg.t = tri.t WHERE deg >= 2)
        SELECT CAST(COUNT(*) AS BIGINT) AS n_nodes,
          ${dsumSql("cc")} / CAST(COUNT(*) AS DOUBLE) AS mean_local_cc,
          MAX(cc) AS max_cc
        FROM cc""")),

    // ── Dixon's Q gap test for revenue outliers (q398) ──────────────────
    // The GAP-based single-outlier verdict beside Grubbs' deviation
    // test (q341): Q = (suspect − nearest neighbour)/range needs no
    // variance at all, so one wild day cannot inflate its own
    // denominator the way it inflates Grubbs' s. Both tails reported.
    // Order statistics on the bounded day grid (row_number cut, the
    // q354 selection shape), gaps exact micro-unit longs, two mirrored
    // single divisions.
    QueryDef("q398_dixon_q",
      (s, dir) => {
        val d = t(s, dir, "events")
          .filter(col("event_type") === "purchase")
          .groupBy(expr("unix_micros(ts) div 86400000000").as("day"))
          .agg(sum(floor(col("value") * lit(1.0e6)).cast("long")).as("u"))
        val rk = d.withColumn("rk", row_number()
          .over(boundedWindow(col("u"), col("day"))).cast("long"))
        val n = rk.agg(count(lit(1)).as("n"))
        rk.crossJoin(broadcast(n))
          .agg(max("n").as("n_days"),
            max(when(col("rk") === 1L, col("u"))).as("x1"),
            max(when(col("rk") === 2L, col("u"))).as("x2"),
            max(when(col("rk") === col("n") - 1L, col("u"))).as("xn1"),
            max(when(col("rk") === col("n"), col("u"))).as("xn"))
          .select(col("n_days"),
            ((col("xn") - col("x1")).cast("double") / lit(1.0e6))
              .as("range"),
            ((col("x2") - col("x1")).cast("double") /
              (col("xn") - col("x1")).cast("double")).as("q_min"),
            ((col("xn") - col("xn1")).cast("double") /
              (col("xn") - col("x1")).cast("double")).as("q_max"))
      },
      Some("""WITH daily AS (SELECT epoch_us(ts) // 86400000000 AS day,
            CAST(SUM(CAST(floor(value * 1000000.0) AS BIGINT)) AS BIGINT)
              AS u
          FROM events WHERE event_type = 'purchase' GROUP BY 1),
        rk AS (SELECT u,
            CAST(ROW_NUMBER() OVER (ORDER BY u, day) AS BIGINT) AS rk
          FROM daily),
        n AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM rk),
        s AS (SELECT MAX(n) AS n_days,
            MAX(CASE WHEN rk = 1 THEN u END) AS x1,
            MAX(CASE WHEN rk = 2 THEN u END) AS x2,
            MAX(CASE WHEN rk = n - 1 THEN u END) AS xn1,
            MAX(CASE WHEN rk = n THEN u END) AS xn
          FROM rk CROSS JOIN n)
        SELECT n_days,
          CAST(xn - x1 AS DOUBLE) / 1000000.0 AS range,
          CAST(x2 - x1 AS DOUBLE) / CAST(xn - x1 AS DOUBLE) AS q_min,
          CAST(xn - xn1 AS DOUBLE) / CAST(xn - x1 AS DOUBLE) AS q_max
        FROM s""")),

    // ── Kendall's τ-b: part size vs price bucket (q399) ────────────────
    // The BIVARIATE ordinal association between two part attributes —
    // where Mann–Kendall (q232) reads τ against TIME and γ (q356)
    // ignores ties entirely, τ-b's tie correction makes heavily-tied
    // integer attributes comparable. All counting happens on the
    // bounded (size × price-bucket) CONTINGENCY grid, never row pairs:
    // concordant/discordant are grid² broadcast folds of cell-count
    // products, tie terms come from the margins, everything rides
    // decimal(38,0)/HUGEINT, and the denominator's one sqrt takes the
    // same deterministically-rounded double on both engines.
    QueryDef("q399_kendall_tau_b",
      (s, dir) => {
        val cells = t(s, dir, "part")
          .select(col("p_size").cast("long").as("sz"),
            // /10 buckets: the testdata's price span is [900, 1000),
            // so the fs-linkage /100 bucket would be a single tied
            // value and n0 = n2 (tau-b undefined, division by zero)
            floor(col("p_retailprice") / lit(10.0)).cast("long").as("pb"))
          .groupBy("sz", "pb").agg(count(lit(1)).as("c"))
          .localCheckpoint()
        val cd = cells.as("a").crossJoin(broadcast(cells).as("b"))
          .filter(col("b.sz") > col("a.sz"))
          .agg(
            sum(when(col("b.pb") > col("a.pb"),
              col("a.c").cast("decimal(38,0)") * col("b.c"))
              .otherwise(lit(0).cast("decimal(38,0)"))).as("cc"),
            sum(when(col("b.pb") < col("a.pb"),
              col("a.c").cast("decimal(38,0)") * col("b.c"))
              .otherwise(lit(0).cast("decimal(38,0)"))).as("dd"))
        val tot = cells.agg(sum("c").as("n"))
          .select(col("n"),
            (col("n").cast("decimal(38,0)") * (col("n") - 1L) / 2)
              .cast("decimal(38,0)").as("n0"))
        val t1 = cells.groupBy("sz").agg(sum("c").as("m"))
          .agg(sum((col("m").cast("decimal(38,0)") * (col("m") - 1L) / 2)
            .cast("decimal(38,0)")).as("n1"))
        val t2 = cells.groupBy("pb").agg(sum("c").as("m"))
          .agg(sum((col("m").cast("decimal(38,0)") * (col("m") - 1L) / 2)
            .cast("decimal(38,0)")).as("n2"))
        cd.crossJoin(broadcast(tot)).crossJoin(broadcast(t1))
          .crossJoin(broadcast(t2))
          .select(col("n").as("n_parts"),
            col("cc").cast("long").as("concordant"),
            col("dd").cast("long").as("discordant"),
            ((col("cc") - col("dd")).cast("double") /
              sqrt((col("n0") - col("n1")).cast("double") *
                (col("n0") - col("n2")).cast("double"))).as("tau_b"))
      },
      Some("""WITH cells AS (SELECT CAST(p_size AS BIGINT) AS sz,
            CAST(floor(p_retailprice / 10.0) AS BIGINT) AS pb,
            CAST(COUNT(*) AS BIGINT) AS c
          FROM part GROUP BY 1, 2),
        cd AS (SELECT
            SUM(CASE WHEN b.pb > a.pb
              THEN CAST(a.c AS HUGEINT) * b.c ELSE 0 END) AS cc,
            SUM(CASE WHEN b.pb < a.pb
              THEN CAST(a.c AS HUGEINT) * b.c ELSE 0 END) AS dd
          FROM cells a CROSS JOIN cells b WHERE b.sz > a.sz),
        tot AS (SELECT CAST(SUM(c) AS BIGINT) AS n,
            CAST(SUM(c) AS HUGEINT) * (SUM(c) - 1) // 2 AS n0
          FROM cells),
        t1 AS (SELECT SUM(CAST(m AS HUGEINT) * (m - 1) // 2) AS n1 FROM
          (SELECT CAST(SUM(c) AS BIGINT) AS m FROM cells GROUP BY sz)),
        t2 AS (SELECT SUM(CAST(m AS HUGEINT) * (m - 1) // 2) AS n2 FROM
          (SELECT CAST(SUM(c) AS BIGINT) AS m FROM cells GROUP BY pb))
        SELECT n AS n_parts, CAST(cc AS BIGINT) AS concordant,
          CAST(dd AS BIGINT) AS discordant,
          CAST(cc - dd AS DOUBLE)
            / sqrt(CAST(n0 - n1 AS DOUBLE) * CAST(n0 - n2 AS DOUBLE))
            AS tau_b
        FROM cd CROSS JOIN tot CROSS JOIN t1 CROSS JOIN t2""")),

    // ── Moran's I & Geary's C on the week×weekday lattice (q400) ───────
    // SPATIAL autocorrelation of daily purchase counts laid out on the
    // 2-D (week, weekday) grid with rook adjacency — a fundamentally
    // different neighbourhood than the 1-D lag correlogram (q340/q389):
    // the week-axis neighbour is the SAME weekday seven days apart, so
    // I > 0 with small C reads "weekday structure repeats week over
    // week" even when day-to-day correlation is weak. Residuals are
    // n-scaled exact integers; the n² factors cancel in both ratios —
    // I = n·Σ_u e_a e_b / (m·Σe²), C = (n−1)·Σ_u (e_a−e_b)² /
    // (2m·Σe²) — so both statistics are single integer-ratio doubles.
    // Adjacency = two composite-key broadcast equi-joins (no OR-join,
    // no cartesian); no wrap across week boundaries by design.
    QueryDef("q400_moran_geary",
      (s, dir) => {
        val d = t(s, dir, "events")
          .filter(col("event_type") === "purchase")
          .groupBy(expr("unix_micros(ts) div 86400000000").as("day"))
          .agg(count(lit(1)).as("x"))
          .select(expr("day div 7").as("wk"), (col("day") % 7L).as("wd"),
            col("x"))
        val tot = d.agg(count(lit(1)).as("n"), sum("x").as("sx"))
        val e = d.crossJoin(broadcast(tot))
          .select(col("wk"), col("wd"),
            (col("n").cast("decimal(38,0)") * col("x") - col("sx"))
              .as("ee"))
          .localCheckpoint()
        val right = e.as("a").join(broadcast(e).as("b"),
          col("a.wk") === col("b.wk") && col("b.wd") === col("a.wd") + 1)
        val down = e.as("a").join(broadcast(e).as("b"),
          col("b.wk") === col("a.wk") + 1 && col("b.wd") === col("a.wd"))
        val pairs = right.select(col("a.ee").as("ea"), col("b.ee").as("eb"))
          .unionAll(down.select(col("a.ee").as("ea"),
            col("b.ee").as("eb")))
        val w = pairs.agg(count(lit(1)).as("m"),
          sum(col("ea") * col("eb")).as("sab"),
          sum((col("ea") - col("eb")) * (col("ea") - col("eb")))
            .as("sd2"))
        val den = e.crossJoin(broadcast(tot))
          .agg(max("n").as("n_cells"), sum(col("ee") * col("ee")).as("se2"))
        den.crossJoin(broadcast(w))
          .select(col("n_cells"), col("m").as("n_edges"),
            ((col("n_cells").cast("decimal(38,0)") * col("sab"))
              .cast("double") /
              (col("m").cast("decimal(38,0)") * col("se2")).cast("double"))
              .as("moran_i"),
            (((col("n_cells") - 1L).cast("decimal(38,0)") * col("sd2"))
              .cast("double") /
              (lit(2L) * col("m").cast("decimal(38,0)") * col("se2"))
                .cast("double")).as("geary_c"))
      },
      Some("""WITH d AS (SELECT day // 7 AS wk, day % 7 AS wd,
            CAST(COUNT(*) AS BIGINT) AS x
          FROM (SELECT epoch_us(ts) // 86400000000 AS day FROM events
            WHERE event_type = 'purchase')
          GROUP BY day // 7, day % 7),
        tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS n,
            CAST(SUM(x) AS BIGINT) AS sx FROM d),
        e AS (SELECT wk, wd, CAST(n AS HUGEINT) * x - sx AS ee
          FROM d CROSS JOIN tot),
        pairs AS (SELECT a.ee AS ea, b.ee AS eb FROM e a JOIN e b
            ON a.wk = b.wk AND b.wd = a.wd + 1
          UNION ALL
          SELECT a.ee, b.ee FROM e a JOIN e b
            ON b.wk = a.wk + 1 AND b.wd = a.wd),
        w AS (SELECT CAST(COUNT(*) AS BIGINT) AS m,
            SUM(ea * eb) AS sab,
            SUM((ea - eb) * (ea - eb)) AS sd2 FROM pairs),
        den AS (SELECT MAX(n) AS n_cells, SUM(ee * ee) AS se2
          FROM e CROSS JOIN tot)
        SELECT n_cells, m AS n_edges,
          CAST(CAST(n_cells AS HUGEINT) * sab AS DOUBLE)
            / CAST(CAST(m AS HUGEINT) * se2 AS DOUBLE) AS moran_i,
          CAST(CAST(n_cells - 1 AS HUGEINT) * sd2 AS DOUBLE)
            / CAST(2 * CAST(m AS HUGEINT) * se2 AS DOUBLE) AS geary_c
        FROM den CROSS JOIN w""")),

    // ── Winnowing fingerprints (q401, Schleimer et al. SIGMOD'03) ──────
    // Standard winnowing (the scheme MOSS popularized): per-window
    // minimum shingle hash, rightmost on ties (the paper's stateful
    // "robust" tie rule is not needed for either bound) — a
    // bounded-density sketch (expected 2/(w+1))
    // with a DETECTION GUARANTEE (any shared run of ≥ w+k−1 tokens
    // yields a shared fingerprint), which neither the 1-hash MinHash
    // (q23, no locality) nor every-shingle spans (q103, no compression)
    // give. The (hash, rightmost-pos) argmin is ONE integer min over
    // the encoded key h·2³¹+(2³¹−1−pos) on a ROWS window — both engines
    // run the identical integer arithmetic.
    QueryDef("q401_winnowing",
      (s, dir) => Dedup.winnowingFingerprints(
        tPar(s, dir, "documents"), "doc_id", "text", winnowK, winnowW),
      Some {
        val shl = dShingles(dTok, winnowK)
        s"""WITH tk AS (SELECT doc_id, $shl AS shl FROM documents),
          ps AS (SELECT doc_id, unnest(shl) AS g,
              CAST(generate_subscripts(shl, 1) AS BIGINT) - 1 AS pos,
              CAST(len(shl) AS BIGINT) AS n FROM tk),
          ky AS (SELECT doc_id, pos, n,
              ('0x' || substr(md5(g), 1, 7))::BIGINT * 2147483648
                + (2147483647 - pos) AS key FROM ps),
          wm AS (SELECT doc_id, pos, n,
              MIN(key) OVER (PARTITION BY doc_id ORDER BY pos
                ROWS BETWEEN CURRENT ROW AND ${winnowW - 1} FOLLOWING)
                AS wkey FROM ky)
        SELECT DISTINCT doc_id,
            2147483647 - (wkey % 2147483648) AS fp_pos,
            wkey // 2147483648 AS fp_hash
        FROM wm WHERE pos <= GREATEST(n - $winnowW, 0)
        ORDER BY doc_id, fp_pos"""
      }),

    // ── Winnowing near-dup candidates (q402) ───────────────────────────
    // Pairs sharing ≥ minShared winnowed fingerprints, with the posting
    // cap the other pair families carry: fingerprints in > dfCap docs
    // are boilerplate and excluded BY CONTRACT (the oracle states the
    // cap), so every posting list is bounded and candidates are
    // output-linear — never all-pairs, never a hot-key join.
    QueryDef("q402_winnow_pairs",
      (s, dir) => Dedup.winnowingCandidates(
        tPar(s, dir, "documents"), "doc_id", "text", winnowK, winnowW,
        winnowDfCap, winnowMinShared),
      Some {
        val shl = dShingles(dTok, winnowK)
        s"""WITH tk AS (SELECT doc_id, $shl AS shl FROM documents),
          ps AS (SELECT doc_id, unnest(shl) AS g,
              CAST(generate_subscripts(shl, 1) AS BIGINT) - 1 AS pos,
              CAST(len(shl) AS BIGINT) AS n FROM tk),
          ky AS (SELECT doc_id, pos, n,
              ('0x' || substr(md5(g), 1, 7))::BIGINT * 2147483648
                + (2147483647 - pos) AS key FROM ps),
          wm AS (SELECT doc_id, pos, n,
              MIN(key) OVER (PARTITION BY doc_id ORDER BY pos
                ROWS BETWEEN CURRENT ROW AND ${winnowW - 1} FOLLOWING)
                AS wkey FROM ky),
          sel AS (SELECT DISTINCT doc_id, wkey // 2147483648 AS fp
            FROM wm WHERE pos <= GREATEST(n - $winnowW, 0)),
          f AS (SELECT fp, COUNT(*) AS df FROM sel GROUP BY fp),
          rare AS (SELECT sel.doc_id, sel.fp FROM sel JOIN f USING (fp)
            WHERE f.df <= $winnowDfCap)
        SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
            CAST(COUNT(*) AS BIGINT) AS n_shared
        FROM rare a JOIN rare b USING (fp)
        WHERE a.doc_id < b.doc_id
        GROUP BY 1, 2 HAVING COUNT(*) >= $winnowMinShared
        ORDER BY doc_a, doc_b"""
      }),

    // ── Stress centrality (q403, Shimbel 1953) ─────────────────────────
    // stress(w) = Σ_{s<t} σ_st(w): the COUNT of shortest paths through
    // each token of the strong graph — the all-integer member of the
    // betweenness family (betweenness normalizes by σ_st and leaves
    // exactness; stress keeps raw counts, BIGINT end to end). Path
    // counts σ(s,v) from a 4-round level-synchronous multi-source BFS
    // (σ sums over same-level parents, visited set anti-joined); the
    // oracle unrolls the identical rounds as MATERIALIZED CTEs (the
    // q359 inlining lesson) and composes σ_st(w) = σ(s,w)·σ(w,t) where
    // distances add — a vocab³-bounded triple join.
    QueryDef("q403_stress_centrality",
      (s, dir) => graft.ext.Search.stressCentrality(
        tPar(s, dir, "documents"), "doc_id", "text", trVocab,
        linkSupNum, linkSupDen, 4),
      Some(s"""WITH dt AS (SELECT DISTINCT doc_id, tok AS token
            FROM (SELECT doc_id, unnest($dTok) AS tok FROM documents)),
        ndt AS (SELECT CAST(COUNT(*) AS BIGINT) AS nd FROM documents),
        v AS (SELECT token FROM (SELECT token, COUNT(*) AS df FROM dt
          GROUP BY 1 ORDER BY df DESC, token LIMIT $trVocab)),
        vt AS (SELECT dt.doc_id, dt.token FROM dt JOIN v USING (token)),
        co AS (SELECT a.token AS src, b.token AS dst,
            CAST(COUNT(*) AS BIGINT) AS c
          FROM vt a JOIN vt b
            ON a.doc_id = b.doc_id AND a.token < b.token
          GROUP BY 1, 2),
        half AS (SELECT src, dst FROM co, ndt
          WHERE c * $linkSupDen > $linkSupNum * nd),
        nb AS MATERIALIZED (SELECT src, dst FROM half
          UNION ALL SELECT dst, src FROM half),
        nodes AS MATERIALIZED (SELECT DISTINCT src AS t FROM nb),
        v0 AS MATERIALIZED (SELECT t AS s, t AS v, CAST(0 AS BIGINT) AS d,
          CAST(1 AS BIGINT) AS sigma FROM nodes),
        ${(1 to 4).map { r =>
          s"""f$r AS MATERIALIZED (SELECT f.s AS s, nb.dst AS v,
               CAST($r AS BIGINT) AS d, CAST(SUM(f.sigma) AS BIGINT)
                 AS sigma
             FROM ${if (r == 1) "v0" else s"f${r - 1}"} f
             JOIN nb ON f.v = nb.src
             WHERE NOT EXISTS (SELECT 1 FROM v${r - 1} x
               WHERE x.s = f.s AND x.v = nb.dst)
             GROUP BY 1, 2),
           v$r AS MATERIALIZED (SELECT * FROM v${r - 1}
             UNION ALL SELECT * FROM f$r)"""
        }.mkString(",\n")},
        sp AS MATERIALIZED (SELECT s, v, d, sigma FROM v4 WHERE s <> v),
        thru AS (SELECT a.v AS w,
            CAST(SUM(a.sigma * b.sigma) AS BIGINT) AS stress
          FROM sp a JOIN sp b ON b.s = a.v
          JOIN sp c ON c.s = a.s AND c.v = b.v
          WHERE a.s < b.v AND a.v <> b.v AND a.d + b.d = c.d
          GROUP BY 1)
        SELECT nodes.t AS token,
          COALESCE(thru.stress, CAST(0 AS BIGINT)) AS stress
        FROM nodes LEFT JOIN thru ON nodes.t = thru.w
        ORDER BY token""")),

    // ── Curriculum interleave (q404) ───────────────────────────────────
    // A deterministic training ORDER: quality-descending within each
    // source, source-proportional at every prefix — each source's
    // rank-r document lands at schedule quantile f = (2r−1)/(2n), so no
    // source clumps or exhausts early. f is one exact int→double
    // conversion + one IEEE division (bit-equal on both engines);
    // quality is q21's composite, ties break on doc_id. At 100 TB this
    // is a per-source window + a range-partitioned sort — no global
    // row-number, no driver-side sequencing.
    // ── Borůvka maximum spanning forest (q405) ─────────────────────────
    // Single-linkage's backbone over the strong graph: per round every
    // component claims its best incident cross edge under the TOTAL
    // order (c desc, src, dst) and components re-merge; 6 rounds span
    // ≥ 2⁶ nodes. The tie-broken order is strict, so the forest is the
    // UNIQUE lexicographic-max spanning forest — the oracle's
    // independently-unrolled rounds (argmin via the same rank window,
    // components via reachability squaring instead of star
    // contraction) must agree edge-for-edge by THEOREM, making this a
    // sharper cross-engine gate than any hash of derived numbers.
    QueryDef("q405_boruvka_msf",
      (s, dir) => graft.ext.Search.boruvkaForest(
        tPar(s, dir, "documents"), "doc_id", "text", trVocab,
        linkSupNum, linkSupDen, 6),
      Some(s"WITH $dBoruvkaChain\n" +
        "SELECT src, dst, c FROM f6 ORDER BY src, dst")),

    // ── Single-linkage dendrogram levels (q406) ────────────────────────
    // The payoff q405's scaladoc promises: per distinct forest weight,
    // the cluster count at that similarity threshold — on a FOREST it
    // is the CLOSED FORM |V| − |{edges ≥ t}| (one cumulative window
    // over ≤ |V|−1 levels, no per-level CC pass). One artifact answers
    // every dedup threshold where q45 answers one.
    QueryDef("q406_dendrogram",
      (s, dir) => graft.ext.Search.dendrogramLevels(
        tPar(s, dir, "documents"), "doc_id", "text", trVocab,
        linkSupNum, linkSupDen, 6),
      Some(s"""WITH $dBoruvkaChain,
          lv AS (SELECT c AS threshold, COUNT(*) AS n_at
            FROM f6 GROUP BY c),
          cum AS (SELECT threshold,
            CAST(SUM(n_at) OVER (ORDER BY threshold DESC
              ROWS UNBOUNDED PRECEDING) AS BIGINT) AS n_edges_kept
            FROM lv),
          nv AS (SELECT CAST(COUNT(*) AS BIGINT) AS nn FROM nodes)
        SELECT threshold, n_edges_kept, nn - n_edges_kept AS n_clusters
        FROM cum CROSS JOIN nv ORDER BY threshold""")),

    // ── Eccentricity / center–periphery profile (q407) ─────────────────
    // The node-level decomposition of the q371 distance census: per
    // token its eccentricity, plus integer flags for the graph CENTER
    // (ecc = radius) and PERIPHERY (ecc = diameter). All integer; the
    // two scalars broadcast onto the vocab-bounded table.
    QueryDef("q407_eccentricity",
      (s, dir) => graft.ext.Search.eccentricityProfile(
        tPar(s, dir, "documents"), "doc_id", "text", trVocab,
        linkSupNum, linkSupDen, 4),
      Some(s"""WITH dt AS (SELECT DISTINCT doc_id, tok AS token
            FROM (SELECT doc_id, unnest($dTok) AS tok FROM documents)),
        ndt AS (SELECT CAST(COUNT(*) AS BIGINT) AS nd FROM documents),
        v AS (SELECT token FROM (SELECT token, COUNT(*) AS df FROM dt
          GROUP BY 1 ORDER BY df DESC, token LIMIT $trVocab)),
        vt AS (SELECT dt.doc_id, dt.token FROM dt JOIN v USING (token)),
        co AS (SELECT a.token AS src, b.token AS dst,
            CAST(COUNT(*) AS BIGINT) AS c
          FROM vt a JOIN vt b
            ON a.doc_id = b.doc_id AND a.token < b.token
          GROUP BY 1, 2),
        half AS (SELECT src, dst FROM co, ndt
          WHERE c * $linkSupDen > $linkSupNum * nd),
        nb AS MATERIALIZED (SELECT src, dst FROM half
          UNION ALL SELECT dst, src FROM half),
        d0 AS MATERIALIZED (SELECT src AS u, dst AS v,
          CAST(1 AS BIGINT) AS d FROM nb),
        ${(0 until 4).map { i =>
          s"""d${i + 1} AS MATERIALIZED (SELECT u, v, MIN(d) AS d FROM (
               SELECT u, v, d FROM d$i
               UNION ALL
               SELECT d$i.u, nb.dst AS v, d$i.d + 1
               FROM d$i JOIN nb ON d$i.v = nb.src) t
             GROUP BY 1, 2)"""
        }.mkString(",\n")},
        ecc AS (SELECT u AS token, MAX(d) AS ecc FROM d4
          WHERE u <> v GROUP BY u),
        r AS (SELECT MIN(ecc) AS radius, MAX(ecc) AS diameter FROM ecc)
        SELECT token, ecc,
          CAST(ecc = radius AS BIGINT) AS is_center,
          CAST(ecc = diameter AS BIGINT) AS is_periphery
        FROM ecc CROSS JOIN r ORDER BY token""")),

    QueryDef("q404_curriculum",
      (s, dir) => Curation.curriculumInterleave(
        tPar(s, dir, "documents"), "doc_id", "source", "text", stopwords),
      Some(s"""SELECT doc_id, source, rk, n_src,
          CAST(2 * rk - 1 AS DOUBLE) / CAST(2 * n_src AS DOUBLE) AS f
        FROM (SELECT doc_id, source,
            CAST(ROW_NUMBER() OVER (PARTITION BY source
              ORDER BY $dQualityExpr DESC, doc_id) AS BIGINT) AS rk,
            CAST(COUNT(*) OVER (PARTITION BY source) AS BIGINT) AS n_src
          FROM documents)
        ORDER BY f, source, doc_id""")),

    // ── Benchmark decontamination (q408) ───────────────────────────────
    // Per EVAL document (house gate: baseHash(doc_id) % 5 == 0), the
    // fraction of its distinct k-shingles appearing anywhere in the
    // TRAIN split — the score a pipeline thresholds to drop evaluation
    // documents that leaked into training data. Doc-level companion of
    // q242's source-level leakage matrix; one shingle pass, train side
    // collapsed to DISTINCT shingles, shingle-keyed LEFT join — never
    // doc×doc. Ratio = one exact BIGINT/BIGINT IEEE division.
    QueryDef("q408_decontamination",
      (s, dir) => Dedup.decontamination(
        tPar(s, dir, "documents"), "doc_id", "text", shingleK),
      Some(s"""WITH sh AS (SELECT doc_id,
            ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 7))::BIGINT
              % 5 AS gate,
            unnest(list_distinct(${dShingles(dTok, shingleK)})) AS shingle
          FROM documents),
        tr AS (SELECT DISTINCT shingle FROM sh WHERE gate <> 0),
        ag AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_shingles,
            CAST(COUNT(tr.shingle) AS BIGINT) AS n_shared
          FROM sh LEFT JOIN tr USING (shingle)
          WHERE gate = 0 GROUP BY 1)
        SELECT doc_id, n_shingles, n_shared,
          CAST(n_shared AS DOUBLE) / CAST(n_shingles AS DOUBLE)
            AS contamination
        FROM ag ORDER BY doc_id""")),

    // ── Content-defined chunking (q409) ────────────────────────────────
    // FastCDC/rsync chunking re-expressed relationally: a chunk ends at
    // token position p iff p ≥ 4 and bits 22–27 of the rolling hash
    // h(p) = bh_p + 2¹¹bh_{p−1} + 2²²bh_{p−2} + 2³³bh_{p−3} are zero
    // (bh = 28-bit md5 prefix; expected chunk ≈ 64 tokens, min 4).
    // Boundaries follow CONTENT, so an early insertion shifts only its
    // own chunk — the property that makes chunk dedup (q410) stable
    // under edits where fixed-size blocks break. All-integer, h < 2⁶²;
    // windows are per-DOCUMENT (never global order).
    QueryDef("q409_cdc_chunks",
      (s, dir) => Dedup.cdcChunks(tPar(s, dir, "documents"),
        "doc_id", "text"),
      Some(s"WITH $dCdcChunkCtes\n" +
        """SELECT doc_id, chunk_idx, n_tokens, chunk_fp FROM chunks
        ORDER BY doc_id, chunk_idx""")),

    // ── Chunk-level dedup savings (q410) ───────────────────────────────
    // Collapse q409's chunks by fingerprint: total vs distinct chunks,
    // total vs SAVED tokens ((copies−1)·len per duplicated chunk), and
    // the savings ratio — the sub-document dedup yield number a corpus
    // owner actually budgets by. Identical fp ⟹ identical content ⟹
    // identical length, so min(n_tokens) per fp is exact. Two
    // aggregations, nothing pairwise.
    QueryDef("q410_chunk_dedup",
      (s, dir) => Dedup.cdcDedupSummary(
        Dedup.cdcChunks(tPar(s, dir, "documents"), "doc_id", "text")),
      Some(s"WITH $dCdcChunkCtes,\n" +
        """g AS (SELECT chunk_fp, CAST(COUNT(*) AS BIGINT) AS cnt,
            MIN(n_tokens) AS len FROM chunks GROUP BY 1)
        SELECT CAST(SUM(cnt) AS BIGINT) AS total_chunks,
          CAST(COUNT(*) AS BIGINT) AS distinct_chunks,
          CAST(SUM(cnt * len) AS BIGINT) AS total_tokens,
          CAST(SUM((cnt - 1) * len) AS BIGINT) AS saved_tokens,
          CAST(SUM((cnt - 1) * len) AS DOUBLE)
            / CAST(SUM(cnt * len) AS DOUBLE) AS savings_ratio
        FROM g""")),
  )
}
