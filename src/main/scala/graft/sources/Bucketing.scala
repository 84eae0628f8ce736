package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Bucketed-table support: pre-shuffle fact tables on their join/agg key
  * once at write time so repeated joins and aggregations on that key run
  * WITHOUT an exchange (SURVEY §4 / the 100 TB checklist: "co-locate
  * joins via bucketing").
  *
  * `df.write.bucketBy(n, key).sortBy(key).saveAsTable` hashes rows into
  * n files per partition by the key; a join of two tables bucketed on
  * the same key with the same n is planned as a zero-shuffle sort-merge
  * join. At warehouse scale this turns the nightly fact⋈fact joins from
  * two full shuffles into none.
  */
object Bucketing {

  def writeBucketed(df: DataFrame, table: String, key: String,
                    buckets: Int, sortCols: Seq[String] = Nil): Unit = {
    val w = df.write.mode("overwrite")
      .format("parquet")
      .bucketBy(buckets, key)
    (if (sortCols.nonEmpty) w.sortBy(sortCols.head, sortCols.tail: _*) else w)
      .saveAsTable(table)
  }

  def table(spark: SparkSession, name: String): DataFrame = spark.table(name)

  /** True iff the physical plan of `df` contains no shuffle exchange —
    * the property bucketing is meant to buy.
    */
  def isShuffleFree(df: DataFrame): Boolean =
    !df.queryExecution.executedPlan.toString.contains("Exchange hashpartitioning")
}
