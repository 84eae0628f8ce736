package graft.ext

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Shared shingling + portable hash family used by the dedup operators.
  *
  * The hash family is md5-based so that a SQL oracle (DuckDB) can compute
  * the *identical* values: `h_seed(s) = md5(seed || '|' || s)` compared as
  * fixed-width lowercase hex strings — lexicographic order on the hex is
  * numeric order on the 128-bit value, so `min` works directly. md5 here is
  * a deterministic mixing function, not a security primitive.
  *
  * Everything is per-row array math (transform/aggregate/array_min): no
  * shuffle, no UDF, fully codegen-compatible — the shape you want when the
  * corpus is 100 TB and signatures are computed in a single map stage.
  */
object Shingles {

  /** k-word shingles of a token array: positions i=1..len-k+1, each joined
    * by single spaces. Documents shorter than k words yield the whole doc
    * as one shingle.
    */
  def wordShingles(toks: Column, k: Int): Column =
    when(size(toks) <= k, array(array_join(toks, " ")))
      .otherwise(transform(
        sequence(lit(1), size(toks) - lit(k - 1)),
        i => array_join(slice(toks, i, lit(k)), " ")))

  /** Seeded portable hash of one string. */
  def seededHash(s: Column, seed: Int): Column =
    md5(concat(lit(seed.toString), lit("|"), s))

  /** Hashes of all k-shingles under one seed. */
  def shingleHashes(toks: Column, k: Int, seed: Int): Column =
    transform(wordShingles(toks, k), s => seededHash(s, seed))

  // ── Numeric MinHash family ─────────────────────────────────────────
  // One digest per shingle, then k "permutations" as affine maps
  // (a_i·x + b_i) mod P — the classic construction. 16× less hashing
  // than a digest-per-seed family, and every value is reproducible in
  // plain SQL: base = ('0x' || substr(md5(s),1,7))::BIGINT.
  // Bounds: base < 2^28, a < 2^31 ⇒ a·x + b < 2^60 — no 64-bit overflow
  // in either engine (DuckDB BIGINT overflow would error, Java wraps;
  // neither is reached).

  /** Mersenne-ish prime modulus for the affine permutations. */
  val MinHashP: Long = 1000000007L

  /** Deterministic per-seed affine constants (Knuth multiplier mixes). */
  def affineA(i: Int): Long = (2654435761L * (i + 1)) % 2147483647L
  def affineB(i: Int): Long = (2654435761L * i + 104729L) % MinHashP

  /** 28-bit numeric base hash of one shingle: first 7 md5 hex chars.
    * Codegen'd native expression (r16) — value-identical to the old
    * `conv(substring(md5(s), 1, 7), 16, 10).cast("long")` pipeline
    * (NativeExprsSpec locks the equality) without materializing the
    * 32-char hex string per row.
    */
  def baseHash(s: Column): Column =
    graft.functions.NativeExprs.md5Prefix(s, 7)

  /** MinHash signature as `array<long>`: element i is
    * min over shingles of (a_i·baseHash + b_i) mod P.
    *
    * Built as ONE `aggregate` fold over the base-hash array so each
    * shingle is md5'd exactly once and bound to a lambda variable — the
    * naive per-seed `array_min(transform(...md5...))` form would inline
    * the digest pipeline into all k seed expressions (interpreted
    * higher-order functions get no common-subexpression elimination).
    */
  def minHashSignature(toks: Column, k: Int, numHashes: Int): Column = {
    val ab = array((0 until numHashes).map(i =>
      struct(lit(affineA(i)).as("a"), lit(affineB(i)).as("b"))): _*)
    aggregate(
      transform(wordShingles(toks, k), s => baseHash(s)),
      array_repeat(lit(MinHashP), numHashes),
      (acc, x) => zip_with(acc, ab,
        (m, c) => least(m, (x * c.getField("a") + c.getField("b")) % MinHashP)))
  }

  /** LSH band keys: split the signature into bands of `rowsPerBand` and
    * hash each band to one key. Docs sharing any band key are candidates.
    */
  def bandKeys(signature: Column, numHashes: Int, rowsPerBand: Int): Column = {
    val numBands = numHashes / rowsPerBand
    array((0 until numBands).map { b =>
      concat(lit(s"$b:"),
        md5(array_join(
          transform(slice(signature, b * rowsPerBand + 1, rowsPerBand),
            _.cast("string")), ",")))
    }: _*)
  }
}
