package graft.sources

import org.apache.hadoop.fs.{FileSystem, Path}
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
    val spark = df.sparkSession
    // idempotence across sessions: a previous JVM's managed-table
    // location survives while the in-memory catalog entry doesn't, and
    // saveAsTable refuses to reuse the orphaned directory
    spark.sql(s"DROP TABLE IF EXISTS $table")
    val loc = new Path(spark.conf.get("spark.sql.warehouse.dir"), table)
    val fs = FileSystem.get(loc.toUri,
      spark.sparkContext.hadoopConfiguration)
    if (fs.exists(loc)) fs.delete(loc, true)
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
