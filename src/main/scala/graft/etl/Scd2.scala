package graft.etl

import java.sql.Date
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Textbook SCD2 merge (SURVEY §2.7). The reference composes this from
  * four sequential Postgres statements (`load_to_dw.py:543-556`: anti-join
  * insert, update-join close, changed re-insert, dim backfill) and carries
  * a duplicate-inflation bug (no open-version guard on the change join,
  * `load_to_dw.py:270-281` — SURVEY B3). We implement the textbook intent:
  * the snapshot is compared against CURRENT versions only.
  *
  * Spark has no in-place UPDATE: [[merge]] rewrites the dimension as ONE
  * full-outer join snapshot↔current with per-key case expansion (1-2
  * output rows per key), history flowing through untouched;
  * [[mergeInPlace]] is the incremental variant over a manifest-committed
  * warehouse where closed history is append-only and never rescanned,
  * and every merge publishes atomically (one manifest rename — the
  * hand-rolled analogue of the reference's Postgres transaction). At
  * 100 TB, bucket both sides by the natural key so the single join
  * co-locates.
  */
object Scd2 {

  val Sentinel: Date = Date.valueOf("9999-12-31")

  /** Merge `snapshot` (one row per `key`, no SCD columns) into `dim`
    * (rows carry `dt_load_to_dw`, `dt_last_update`; open versions have
    * `dt_last_update = 9999-12-31`).
    *
    * @param tracked columns whose change forces a new version (the
    *                reference's 10-column OR, `load_to_dw.py:270-281`)
    */
  def merge(dim: DataFrame, snapshot: DataFrame, key: String,
            tracked: Seq[String], loadDate: Date): DataFrame = {
    val closed  = dim.filter(col("dt_last_update") =!= lit(Sentinel))
    val current = dim.filter(col("dt_last_update") === lit(Sentinel))

    // Change detection via a single hash of the tracked columns. Spark's
    // hash expressions SKIP null children (the seed passes through
    // unchanged), so xxhash64(null, "x") == xxhash64("x", null): a value
    // shifting between adjacent tracked columns across a null swap would
    // be missed. Interleaving a per-column isNull flag disambiguates —
    // with equal flag vectors, the sequence of hashed non-null values maps
    // positionally onto columns, so signature equality implies per-column
    // null-safe equality. Still one expression regardless of column count,
    // and cheaper than a 10-column OR.
    def withSig(df: DataFrame) =
      df.withColumn("__sig",
        xxhash64((tracked.map(col) ++ tracked.map(c => col(c).isNull)): _*))

    val snap = withSig(snapshot)
    val cur  = withSig(current)

    val joined = snap.alias("s").join(cur.alias("c"), Seq(key), "full_outer")

    val isNew     = col("c.__sig").isNull && col("s.__sig").isNotNull
    val isChanged = col("s.__sig").isNotNull && col("c.__sig").isNotNull &&
      col("s.__sig") =!= col("c.__sig")

    // ONE pass over the joined rows: each key emits 1 or 2 output rows
    // (case-built array + explode). Filtering four separate branches out
    // of `joined` would re-execute the join and re-scan both inputs per
    // branch — 8 scans instead of 2 in the physical plan.
    val snapCols = snapshot.columns.toSeq
    val outCols = snapCols ++ Seq("dt_load_to_dw", "dt_last_update")

    val openFromSnap = struct(
      (snapCols.map(c =>
        (if (c == key) col(key) else col(s"s.$c")).as(c)) ++ Seq(
        lit(loadDate).as("dt_load_to_dw"),
        lit(Sentinel).as("dt_last_update"))): _*)
    def fromCur(lastUpdate: Column) = struct(
      (snapCols.map(c =>
        (if (c == key) col(key) else col(s"c.$c")).as(c)) ++ Seq(
        col("c.dt_load_to_dw").as("dt_load_to_dw"),
        lastUpdate.as("dt_last_update"))): _*)

    val emitted = joined.select(explode(
      when(isNew, array(openFromSnap))
        .when(isChanged, array(fromCur(lit(loadDate)), openFromSnap))
        .otherwise(array(fromCur(col("c.dt_last_update"))))) // unchanged/gone
      .as("r"))
      .select(outCols.map(c => col(s"r.$c").as(c)): _*)

    closed.select(outCols.map(col): _*).unionByName(emitted)
  }

  // ───────────────────────────────────────────────────────────────────
  // Incremental warehouse: a minimal manifest-committed table.
  //
  // The reference gets merge atomicity from Postgres transactions
  // (`load_to_dw.py:164-179` commit/rollback). Plain parquet has none:
  // the previous two-write layout (history append + dynamic partition
  // overwrite) re-appended closed rows when a retry followed a crash
  // between the writes. The fix is the same idea Delta/Iceberg use,
  // scaled down to what this merge needs — STAGE everything into fresh
  // directories, then publish with ONE atomic rename of a tiny manifest:
  //
  //   path/_log/v00000007.txn   ← the table IS the latest manifest
  //   path/data/hist_<tx>/      ← closed rows of one merge (append-only:
  //                               every manifest lists all hist dirs)
  //   path/data/cur_<tx>/       ← the full open set after one merge
  //                               (each manifest lists exactly one)
  //
  // Readers resolve the newest manifest and read only the directories it
  // names, so a crash at ANY point before the rename leaves the table
  // bit-identical (orphan staging dirs are invisible; `vacuum` reclaims
  // them) and a retry converges: re-merging the same snapshot closes
  // nothing and rewrites an identical open set. Rename is atomic on
  // POSIX and HDFS; on object stores without atomic rename this is the
  // point where a real deployment swaps in Delta/Iceberg — the merge
  // plan is identical. Single writer assumed (the reference's scheduler
  // guarantees it); a concurrent commit loses the rename race loudly.
  //
  // At 100 TB the shape holds: a merge scans ONLY the committed cur dir
  // (file-level pruning by construction, no partition filter needed),
  // history is never read nor rewritten, manifests grow by one line per
  // merge (365/year — trivial), and hist dirs can be compacted offline.
  // ───────────────────────────────────────────────────────────────────

  /** Committed table state: `histDirs`/`curDir` are names under
    * `path/data/`. `curDir` is None only while the open set is empty.
    */
  final case class WarehouseState(version: Long, histDirs: Seq[String],
                                  curDir: Option[String])

  /** SCD TYPE 3 merge — the previous-value column variant completing
    * the SCD family (type 1 = the D5 upsert, type 2 = [[merge]]):
    * `dim` carries each tracked attribute plus its `prev_<attr>`
    * shadow; merging a snapshot moves a changed attribute's old value
    * into the shadow, leaves unchanged rows' shadows alone, inserts
    * new keys with null shadows, and keeps keys absent from the
    * snapshot as-is. One full-outer join on the key — no versioning
    * rows, so the dimension never grows with history (that's the
    * type-3 trade: exactly ONE generation of history).
    *
    * Comparisons are null-safe (`<=>`), so a null→value transition
    * counts as a change just like value→value.
    */
  def scd3Merge(dim: DataFrame, snapshot: DataFrame, key: String,
                attrs: Seq[String]): DataFrame = {
    require(attrs.nonEmpty, "no tracked attributes")
    val d = dim
      .withColumn("_in_d", lit(1))
      .select(col(key) +: col("_in_d") +:
        attrs.flatMap(a => Seq(col(a).as(s"_d_$a"),
          col(s"prev_$a").as(s"_p_$a"))): _*)
    val s = snapshot
      .withColumn("_in_s", lit(1))
      .select(col(key) +: col("_in_s") +:
        attrs.map(a => col(a).as(s"_s_$a")): _*)
    val j = d.join(s, Seq(key), "full_outer")
    val inBoth = col("_in_d").isNotNull && col("_in_s").isNotNull
    // per-ATTRIBUTE shadows (the textbook type 3): attribute a's shadow
    // moves only when a itself changed, even if a sibling changed too
    val outCols = attrs.flatMap { a =>
      val changedA = !(col(s"_d_$a") <=> col(s"_s_$a"))
      val value =
        when(col("_in_d").isNull, col(s"_s_$a"))          // insert
          .when(col("_in_s").isNull, col(s"_d_$a"))       // untouched
          .otherwise(col(s"_s_$a"))                       // refresh
      val prev =
        when(inBoth && changedA, col(s"_d_$a"))           // shadow moves
          .when(col("_in_d").isNotNull, col(s"_p_$a"))    // shadow kept
      // inserts fall through to null shadows
      Seq(value.as(a), prev.as(s"prev_$a"))
    }
    j.select(col(key) +: outCols: _*)
  }

  private def hadoopFs(spark: org.apache.spark.sql.SparkSession,
                       path: String) =
    new org.apache.hadoop.fs.Path(path)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)

  /** All committed version numbers at `path`, ascending. */
  def versions(spark: org.apache.spark.sql.SparkSession,
               path: String): Seq[Long] = {
    val fs = hadoopFs(spark, path)
    val log = new org.apache.hadoop.fs.Path(path, "_log")
    if (!fs.exists(log)) return Nil
    fs.listStatus(log).map(_.getPath.getName)
      .filter(n => n.startsWith("v") && n.endsWith(".txn"))
      .map(n => n.stripPrefix("v").stripSuffix(".txn").toLong)
      .sorted.toSeq
  }

  private def readManifest(spark: org.apache.spark.sql.SparkSession,
                           path: String, v: Long): WarehouseState = {
    val fs = hadoopFs(spark, path)
    val log = new org.apache.hadoop.fs.Path(path, "_log")
    val in = fs.open(new org.apache.hadoop.fs.Path(log, f"v$v%08d.txn"))
    val text = try scala.io.Source.fromInputStream(in, "UTF-8").mkString
               finally in.close()
    val lines = text.split("\n").map(_.trim).filter(_.nonEmpty)
    val cur = lines.collectFirst {
      case l if l.startsWith("cur=") => l.stripPrefix("cur=")
    }.filter(_.nonEmpty)
    val hist = lines.collect {
      case l if l.startsWith("hist=") => l.stripPrefix("hist=")
    }.toSeq
    WarehouseState(v, hist, cur)
  }

  /** Latest committed state, or None if the path holds no table. */
  def currentState(spark: org.apache.spark.sql.SparkSession,
                   path: String): Option[WarehouseState] = {
    val vs = versions(spark, path)
    if (vs.isEmpty) None
    else Some(readManifest(spark, path, vs.max))
  }

  /** TIME TRAVEL: the full table view exactly as version `v` committed
    * it (same columns as [[readWarehouse]]). Every version's manifest
    * stays in the log forever; its DATA dirs survive until a
    * [[vacuum]] (which keeps only the latest manifest's dirs) — the
    * standard travel-until-vacuum contract. History dirs are
    * append-only so old versions mostly share storage with the head;
    * only each version's open-set dir is version-private.
    */
  def readAt(spark: org.apache.spark.sql.SparkSession, path: String,
             v: Long): DataFrame = {
    require(versions(spark, path).contains(v),
      s"no committed version $v at $path")
    val st = readManifest(spark, path, v)
    // The manifest log survives vacuum but the data dirs may not:
    // validate them NOW so a vacuumed version fails with a clear
    // message instead of a raw mid-read 'Path does not exist'.
    val fs = hadoopFs(spark, path)
    val gone = (st.histDirs ++ st.curDir).filterNot(d =>
      fs.exists(new org.apache.hadoop.fs.Path(
        new org.apache.hadoop.fs.Path(path, "data"), d)))
    require(gone.isEmpty,
      s"version $v at $path was vacuumed: data dirs ${gone.mkString(", ")} " +
        "no longer exist (time travel is valid only until vacuum)")
    viewOf(spark, path, st)
  }

  /** Publish `st` as version `st.version`: write a temp manifest, then
    * atomically rename it into the log. Fails loudly if that version
    * already exists (lost a single-writer race).
    */
  private def commit(spark: org.apache.spark.sql.SparkSession, path: String,
                     st: WarehouseState): Unit = {
    val fs = hadoopFs(spark, path)
    val log = new org.apache.hadoop.fs.Path(path, "_log")
    fs.mkdirs(log)
    val tmp = new org.apache.hadoop.fs.Path(log,
      s".tmp_${java.util.UUID.randomUUID().toString.take(8)}")
    val out = fs.create(tmp, false)
    try out.write(
      (st.curDir.map("cur=" + _).toSeq ++ st.histDirs.map("hist=" + _))
        .mkString("\n").getBytes("UTF-8"))
    finally out.close()
    Failpoints.hit("scd2.in-commit")
    val dst = new org.apache.hadoop.fs.Path(log, f"v${st.version}%08d.txn")
    if (fs.exists(dst) || !fs.rename(tmp, dst)) {
      fs.delete(tmp, false)
      sys.error(s"concurrent commit: version ${st.version} already " +
        s"exists at $path")
    }
  }

  /** Stage `df` into a fresh `path/data/<dirName>/`; None if the write
    * produced no parquet files (empty result on some plans).
    */
  private def stage(df: DataFrame, path: String,
                    dirName: String): Option[String] = {
    val full = s"$path/data/$dirName"
    df.write.mode("error").parquet(full)
    val fs = hadoopFs(df.sparkSession, path)
    val p = new org.apache.hadoop.fs.Path(full)
    val hasData = fs.listStatus(p)
      .exists(_.getPath.getName.endsWith(".parquet"))
    if (hasData) Some(dirName) else { fs.delete(p, true); None }
  }

  private def readDirs(spark: org.apache.spark.sql.SparkSession,
                       path: String, dirs: Seq[String]): DataFrame =
    spark.read.parquet(dirs.map(d => s"$path/data/$d"): _*)

  /** The open versions only — the ONLY table data a merge ever scans.
    * Reads exactly the committed cur directory: file-level pruning by
    * construction, no partition filter required.
    */
  def readCurrent(spark: org.apache.spark.sql.SparkSession,
                  path: String): DataFrame = {
    val st = currentState(spark, path)
      .getOrElse(sys.error(s"no committed SCD2 warehouse at $path"))
    st.curDir match {
      case Some(d) => readDirs(spark, path, Seq(d))
      case None => // open set is empty; derive the schema from history
        readDirs(spark, path, st.histDirs).limit(0)
    }
  }

  /** The hist+cur+`is_current` full-table view of one manifest — the
    * single place the shape lives, shared by head reads and time
    * travel so they can never diverge.
    */
  private def viewOf(spark: org.apache.spark.sql.SparkSession,
                     path: String, st: WarehouseState): DataFrame = {
    val cur = (st.curDir match {
      case Some(d) => readDirs(spark, path, Seq(d))
      case None    => readDirs(spark, path, st.histDirs).limit(0)
    }).withColumn("is_current", lit(true))
    if (st.histDirs.isEmpty) cur
    else readDirs(spark, path, st.histDirs)
      .withColumn("is_current", lit(false)).unionByName(cur)
  }

  /** Full table view — history plus open versions, with the derived
    * `is_current` column the downstream mart convention expects.
    */
  def readWarehouse(spark: org.apache.spark.sql.SparkSession,
                    path: String): DataFrame =
    viewOf(spark, path, currentState(spark, path)
      .getOrElse(sys.error(s"no committed SCD2 warehouse at $path")))

  /** Delete `path/data/` directories the LATEST manifest does not
    * reference — staging left by an injected/real crash, and open-set
    * directories superseded by later merges. Single-writer, quiesced
    * table assumed (a reader pinned to an older manifest would lose its
    * cur dir). Returns the deleted directory names.
    */
  def vacuum(spark: org.apache.spark.sql.SparkSession,
             path: String): Seq[String] = {
    val st = currentState(spark, path)
      .getOrElse(sys.error(s"no committed SCD2 warehouse at $path"))
    val fs = hadoopFs(spark, path)
    val dataDir = new org.apache.hadoop.fs.Path(path, "data")
    if (!fs.exists(dataDir)) return Nil
    val live = (st.histDirs ++ st.curDir).toSet
    val orphans = fs.listStatus(dataDir).map(_.getPath)
      .filter(p => !live.contains(p.getName)).toSeq
    orphans.foreach(p => fs.delete(p, true))
    orphans.map(_.getName)
  }

  /** Incremental SCD2 merge into the manifest-committed warehouse at
    * `path` (bootstraps it when uninitialized). Scans only the committed
    * open set, stages this merge's closed rows and the new open set into
    * fresh directories, and publishes both with one atomic manifest
    * rename — a crash at any point leaves the committed table unchanged
    * and a retry converges (no duplicated history). At 100 TB, bucket
    * the warehouse and snapshot by the natural key so the single join
    * co-locates.
    */
  def mergeInPlace(spark: org.apache.spark.sql.SparkSession, path: String,
                   snapshot: DataFrame, key: String, tracked: Seq[String],
                   loadDate: Date): Unit = currentState(spark, path) match {
    case None => initPartitioned(snapshot, path, loadDate)
    case Some(st) =>
      val current = readCurrent(spark, path)
      // materialize once: both filters below reuse the join result
      // instead of re-executing it
      val merged = merge(current, snapshot, key, tracked, loadDate)
        .localCheckpoint(true)
      val tx = f"${st.version + 1}%08d_" +
        java.util.UUID.randomUUID().toString.take(8)
      val histDelta = stage(
        merged.filter(col("dt_last_update") =!= lit(Sentinel)),
        path, s"hist_$tx")
      Failpoints.hit("scd2.between-writes")
      val cur = stage(
        merged.filter(col("dt_last_update") === lit(Sentinel)),
        path, s"cur_$tx")
      Failpoints.hit("scd2.before-commit")
      commit(spark, path,
        WarehouseState(st.version + 1, st.histDirs ++ histDelta, cur))
  }

  /** Bootstrap the warehouse from a first-day snapshot (version 1: an
    * open set, no history).
    */
  def initPartitioned(snapshot: DataFrame, path: String,
                      loadDate: Date): Unit = {
    val spark = snapshot.sparkSession
    require(currentState(spark, path).isEmpty,
      s"SCD2 warehouse at $path is already initialized")
    val open = snapshot
      .withColumn("dt_load_to_dw", lit(loadDate))
      .withColumn("dt_last_update", lit(Sentinel))
    val tx = "00000001_" + java.util.UUID.randomUUID().toString.take(8)
    val cur = stage(open, path, s"cur_$tx")
    Failpoints.hit("scd2.before-commit")
    commit(spark, path, WarehouseState(1, Nil, cur))
  }
}

/** Named crash-injection points for specs: `arm` a name and the next
  * [[Failpoints.hit]] on it throws, simulating a driver death mid-
  * protocol. Production code paths call `hit` unconditionally — with
  * nothing armed it is a Set lookup.
  */
private[graft] object Failpoints {
  private val active =
    java.util.concurrent.ConcurrentHashMap.newKeySet[String]()
  def arm(name: String): Unit = active.add(name)
  def disarm(name: String): Unit = active.remove(name)
  def hit(name: String): Unit =
    if (active.contains(name))
      throw new IllegalStateException(s"injected crash at failpoint '$name'")
}
