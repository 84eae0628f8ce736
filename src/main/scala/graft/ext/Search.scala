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
}
