package graft.sources

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** Source/sink surface (SURVEY §2.1).
  *
  * The reference moves every byte through driver-local Python: pandas
  * `to_csv` (S3, `extract_file.py:99-137`), B2 upload/download + per-row
  * INSERT (S4-S6, `load_to_staging.py:118-188`), object-store existence
  * checks (S5, `load_to_staging.py:316-359`). Spark-native: the Hadoop
  * FileSystem API abstracts local/S3-compatible stores uniformly, reads
  * are schema-enforced scans, and writes are distributed jobs.
  *
  * OBJECT-STORE TEST DISPOSITION (final, round 13): a live S3A/MinIO
  * contract run is structurally impossible in this build environment —
  * there is no `hadoop-aws`/`aws-sdk` jar under `/opt/spark/jars`, no
  * MinIO binary, dependency resolution is offline-locked, and the
  * sandbox has zero network egress, so `s3a://` cannot even
  * instantiate a FileSystem. The exercised contract is therefore
  * `MemObjectStoreFs` (test tree): a real `FileSystem` implementation
  * registered under a non-`file://` scheme with the three s3a
  * semantics these sinks must survive — flat key space with prefix
  * "directories", non-atomic copy-then-delete rename (the property
  * that breaks naive rename-commit protocols), per-bucket namespaces —
  * driven end-to-end by SourcesSpec through parquet footers and
  * FileOutputCommitter's temp-dir dance. On a real cluster the same
  * code paths take `s3a://` URIs unchanged; deploy-time validation
  * there is a configuration exercise, not a code change.
  */
object Sources {

  /** S6/S7 — schema-enforced CSV scan (no inference in production paths;
    * SURVEY §1.2).
    */
  def readCsv(spark: SparkSession, path: String, schema: StructType,
              header: Boolean = true): DataFrame =
    spark.read.schema(schema)
      .option("header", header.toString)
      .option("encoding", "UTF-8")
      .csv(path)

  /** S3 — deterministic single-file CSV write with the reference's
    * `data_{id}_{name}_{date}_{domain}.csv` naming
    * (`extract_file.py:104-108`): write via a one-partition job to a temp
    * dir, then rename the part file. Only for feed-sized extracts — a
    * deliberate driver-side chokepoint the reference's contract demands;
    * large outputs use [[writeWarehouse]].
    */
  def writeSingleCsv(df: DataFrame, destFile: String): Unit = {
    val spark = df.sparkSession
    val tmp = destFile + ".__tmp__"
    df.coalesce(1).write.mode("overwrite").option("header", "true")
      // the writer trims cell whitespace by default, which would corrupt
      // feeds like the reference's "7900000 " price values on roundtrip
      .option("ignoreLeadingWhiteSpace", "false")
      .option("ignoreTrailingWhiteSpace", "false")
      .csv(tmp)
    val conf = spark.sparkContext.hadoopConfiguration
    val fs = FileSystem.get(new Path(tmp).toUri, conf)
    val part = fs.globStatus(new Path(tmp, "part-*"))(0).getPath
    val dest = new Path(destFile)
    if (fs.exists(dest)) fs.delete(dest, false)
    fs.rename(part, dest)
    fs.delete(new Path(tmp), true)
  }

  /** S5 — existence probe (B2 `get_file_info_by_name` analogue). */
  def exists(spark: SparkSession, path: String): Boolean = {
    val conf = spark.sparkContext.hadoopConfiguration
    FileSystem.get(new Path(path).toUri, conf).exists(new Path(path))
  }

  /** Warehouse writer: parquet partitioned by load date so daily loads
    * append one partition and date-filtered reads prune (the 100 TB
    * layout for `dw` — SURVEY §4: "partition dw by dt_load_to_dw").
    */
  def writeWarehouse(df: DataFrame, path: String,
                     partitionCol: String = "dt_load_to_dw",
                     mode: String = "append"): Unit =
    df.write.mode(mode).partitionBy(partitionCol).parquet(path)

  def readWarehouse(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path)

  /** Small-file compaction: rewrite a parquet dataset into
    * ~`targetMb`-sized files (daily appends accumulate small files; scan
    * task count and namenode pressure grow with file count, so periodic
    * compaction is part of any production warehouse). Writes to a temp
    * dir first and swaps, so readers never observe a half-rewritten
    * dataset.
    */
  def compact(spark: SparkSession, path: String, targetMb: Int = 128): Unit = {
    val conf = spark.sparkContext.hadoopConfiguration
    val fs = FileSystem.get(new Path(path).toUri, conf)
    val bytes = fs.getContentSummary(new Path(path)).getLength
    val parts = math.max(1, math.ceil(bytes / (targetMb * 1024.0 * 1024.0)).toInt)
    val tmp = path + ".__compact__"
    spark.read.parquet(path).repartition(parts)
      .write.mode("overwrite").parquet(tmp)
    val dest = new Path(path)
    val bak = new Path(path + ".__old__")
    if (fs.exists(bak)) fs.delete(bak, true) // leftover from a crashed run
    fs.rename(dest, bak)
    fs.rename(new Path(tmp), dest)
    fs.delete(bak, true)
  }

  /** Malformed-row policy for CSV ingest: PERMISSIVE (default — bad
    * cells null out, row kept + captured in `_corrupt_record`),
    * DROPMALFORMED, or FAILFAST. The reference silently skips rows whose
    * INSERT throws (`load_to_staging.py:166-176` catches per-row) —
    * DROPMALFORMED is its semantic twin; PERMISSIVE is the auditable
    * default here.
    */
  def readCsvWithPolicy(spark: SparkSession, path: String,
                        schema: StructType, mode: String): DataFrame = {
    val withCorrupt = if (mode == "PERMISSIVE")
      schema.add("_corrupt_record", org.apache.spark.sql.types.StringType)
    else schema
    spark.read.schema(withCorrupt)
      .option("header", "true")
      .option("mode", mode)
      .csv(path)
  }

  /** JSON-lines ingest with the same malformed-row policy surface as
    * [[readCsvWithPolicy]] — the event-feed twin of the CSV leg (one
    * JSON object per line, schema enforced, PERMISSIVE nulls bad fields
    * and captures the raw line, DROPMALFORMED skips, FAILFAST throws).
    * Schema-on-read keeps the scan prunable: only projected fields are
    * parsed, so a 2-column query over wide JSON events stays cheap.
    */
  def readJsonWithPolicy(spark: SparkSession, path: String,
                         schema: StructType, mode: String): DataFrame = {
    val withCorrupt = if (mode == "PERMISSIVE")
      schema.add("_corrupt_record", org.apache.spark.sql.types.StringType)
    else schema
    spark.read.schema(withCorrupt)
      .option("mode", mode)
      .json(path)
  }

  /** Columnar interchange beyond parquet: ORC read/write (Spark
    * bundles the ORC datasource; predicate pushdown, column pruning and
    * vectorized reads work exactly as for parquet — SourcesSpec locks
    * the pushdown). Schema enforced on read so a drifted file fails
    * loudly instead of inferring a different shape.
    */
  def writeOrc(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").orc(path)

  def readOrc(spark: SparkSession, path: String,
              schema: StructType): DataFrame =
    spark.read.schema(schema).orc(path)

  /** XML ingest with the same malformed-row policy surface as the
    * CSV/JSON legs (Spark 4 ships the XML data source natively —
    * `rowTag` selects the repeating element, schema enforced,
    * PERMISSIVE nulls bad fields and captures the raw record,
    * DROPMALFORMED skips, FAILFAST throws). The reference keeps its
    * CONFIG in XML (`config.xml`, parsed by [[graft.control.ConfigXml]]);
    * this is the DATA-plane leg for feeds that arrive the same way.
    */
  def readXmlWithPolicy(spark: SparkSession, path: String, rowTag: String,
                        schema: StructType, mode: String): DataFrame = {
    val withCorrupt = if (mode == "PERMISSIVE")
      schema.add("_corrupt_record", org.apache.spark.sql.types.StringType)
    else schema
    spark.read.schema(withCorrupt)
      .option("rowTag", rowTag)
      .option("mode", mode)
      .xml(path)
  }

  def writeXml(df: DataFrame, path: String, rowTag: String): Unit =
    df.write.mode("overwrite").option("rowTag", rowTag).xml(path)

  /** S4 — single-file upload/copy across Hadoop FileSystems (the B2
    * `upload_local_file` analogue, `extract_file.py:397-440`): source and
    * destination resolve their own scheme (`file://`, `s3a://`, `hdfs://`,
    * …), so landing → object store is this one call on a cluster.
    *
    * S3-compatible object-store recipe (B2/R2/minio all speak the S3
    * API; hadoop-aws must be on the cluster classpath):
    * {{{
    * spark.hadoop.fs.s3a.endpoint                 https://<s3-endpoint>
    * spark.hadoop.fs.s3a.path.style.access        true   # non-AWS stores
    * spark.hadoop.fs.s3a.aws.credentials.provider
    *   org.apache.hadoop.fs.s3a.auth.IAMInstanceCredentialsProvider
    *   # or EnvironmentVariableCredentialsProvider reading
    *   # AWS_ACCESS_KEY_ID / AWS_SECRET_ACCESS_KEY — never inline keys
    * }}}
    * then pass `s3a://bucket/key` paths to any function in this object.
    */
  def copyFile(spark: SparkSession, src: String, dest: String): Unit = {
    val conf = spark.sparkContext.hadoopConfiguration
    val srcFs = FileSystem.get(new Path(src).toUri, conf)
    val dstFs = FileSystem.get(new Path(dest).toUri, conf)
    val destPath = new Path(dest)
    if (destPath.getParent != null) dstFs.mkdirs(destPath.getParent)
    org.apache.hadoop.fs.FileUtil.copy(
      srcFs, new Path(src), dstFs, destPath,
      /* deleteSource = */ false, /* overwrite = */ true, conf)
  }

  /** F8 — file metadata for the run log (size KB, rounded to 2 places
    * like `extract_file.py:225-263`).
    */
  def fileStats(spark: SparkSession, path: String): (Long, Double) = {
    val conf = spark.sparkContext.hadoopConfiguration
    val fs = FileSystem.get(new Path(path).toUri, conf)
    val st = fs.getFileStatus(new Path(path))
    (st.getLen, math.round(st.getLen / 1024.0 * 100) / 100.0)
  }
}
