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

  /** MinHash signature: for each seed, the minimum seeded hash over the
    * shingle set (classic one-permutation-per-seed construction).
    */
  def minHashSignature(toks: Column, k: Int, numHashes: Int): Column =
    array((0 until numHashes).map(seed =>
      array_min(shingleHashes(toks, k, seed))): _*)

  /** LSH band keys: split the signature into bands of `rowsPerBand` and
    * hash each band to one key. Docs sharing any band key are candidates.
    */
  def bandKeys(signature: Column, numHashes: Int, rowsPerBand: Int): Column = {
    val numBands = numHashes / rowsPerBand
    array((0 until numBands).map { b =>
      concat(lit(s"$b:"),
        md5(array_join(slice(signature, b * rowsPerBand + 1, rowsPerBand),
          ",")))
    }: _*)
  }
}
