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

  /** MinHash signatures + LSH band keys per document. */
  def minhashSignatures(docs: DataFrame, idCol: String, textCol: String,
                        shingleK: Int, numHashes: Int, rowsPerBand: Int): DataFrame = {
    val toks = TextStats.tokens(col(textCol))
    docs.select(col(idCol),
      Shingles.minHashSignature(toks, shingleK, numHashes).as("signature"))
      .withColumn("band_keys",
        Shingles.bandKeys(col("signature"), numHashes, rowsPerBand))
  }

  /** MinHash+LSH candidate pairs: docs sharing ≥1 band key.
    * explode(band_keys) → self-join on the key → distinct (a, b) with a<b.
    * The join key is a 32-char digest: candidates are found with ONE
    * shuffle on band_key; skewed (very common) bands can be salted — with
    * b bands of r rows the expected bucket sizes stay small for any
    * non-degenerate corpus.
    */
  def minhashCandidates(docs: DataFrame, idCol: String, textCol: String,
                        shingleK: Int = 5, numHashes: Int = 16,
                        rowsPerBand: Int = 4): DataFrame = {
    val sigs = minhashSignatures(docs, idCol, textCol, shingleK, numHashes,
      rowsPerBand)
    val exploded = sigs.select(col(idCol), explode(col("band_keys")).as("bk"))
    exploded.alias("a").join(exploded.alias("b"), Seq("bk"))
      .filter(col(s"a.$idCol") < col(s"b.$idCol"))
      .select(col(s"a.$idCol").as("id_a"), col(s"b.$idCol").as("id_b"))
      .distinct()
  }

  /** SimHash fingerprint over token hashes, `bits` dimensions.
    * Each token votes per bit using one hex nibble of its portable hash
    * (nibble ≥ 8 → +1, else −1); fingerprint bit = sign of the vote sum.
    * Pure per-row expression (transform over bit positions + aggregate
    * over tokens).
    */
  def simhash(text: Column, bits: Int = 16): Column = {
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

  /** Exact n-gram Jaccard similarity for all pairs sharing ≥1 shingle,
    * via an inverted index (explode distinct shingles → equi-join on
    * shingle → count shared per pair). Exact because J(a,b) > 0 implies a
    * shared shingle; no cross join anywhere. One shuffle on shingle hash +
    * one on the pair key.
    */
  def ngramJaccardPairs(docs: DataFrame, idCol: String, textCol: String,
                        k: Int, minJaccard: Double): DataFrame = {
    val withSh = docs.select(col(idCol),
      array_distinct(Shingles.wordShingles(TextStats.tokens(col(textCol)), k))
        .as("sh"))
    val sizes = withSh.select(col(idCol), size(col("sh")).cast("long").as("n"))
    val inv = withSh.select(col(idCol), explode(col("sh")).as("shingle"))
    val shared = inv.alias("a").join(inv.alias("b"), Seq("shingle"))
      .filter(col(s"a.$idCol") < col(s"b.$idCol"))
      .groupBy(col(s"a.$idCol").as("id_a"), col(s"b.$idCol").as("id_b"))
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
