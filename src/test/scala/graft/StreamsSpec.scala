package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.streaming.Streams

/** The streaming path must produce the same result as the batch path for
  * the same input files (identical logical plan, Structured Streaming
  * micro-batch execution).
  */
class StreamsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("file-source stream of events equals the batch windowed aggregate") {
    val batchEvents = Tables.load(spark, TestSpark.sf0001, "events")
    val batch = Streams.windowedCounts(batchEvents)

    // stage the batch frame as parquet so the stream reads identical data
    // with a vanilla TIMESTAMP column (the raw file is TIMESTAMP(NANOS),
    // which the streaming parquet source rejects pre-conversion)
    val dir = java.nio.file.Files.createTempDirectory("events_stream")
      .toString
    batchEvents.write.mode("overwrite").parquet(dir)

    val stream = Streams.eventStream(spark, dir,
      batchEvents.schema)
    val streamed = Streams.runToMemory(
      Streams.windowedCounts(stream, watermark = "100 hours"), "wc_test")

    assert(streamed.exceptAll(batch).isEmpty &&
      batch.exceptAll(streamed).isEmpty)
    assert(batch.count() > 0)
  }

  test("curation operators compose unchanged onto a stream: PII redact " +
       "+ LSH bucket assignment per micro-batch") {
    // stateless curation ops are plain column expressions, so the SAME
    // code path serves batch and streaming — the property that makes the
    // ingest-time scrub/bucket pipeline one implementation, not two
    import org.apache.spark.sql.functions._
    val docs = Tables.load(spark, TestSpark.sf0001, "documents")
    val emb = Tables.load(spark, TestSpark.sf0001, "embeddings")
    val dir = java.nio.file.Files.createTempDirectory("docs_stream").toString
    docs.join(emb, docs("doc_id") === emb("vec_id"))
      .select("doc_id", "text", "embedding")
      .write.mode("overwrite").parquet(dir)

    val stream = spark.readStream
      .schema(spark.read.parquet(dir).schema).parquet(dir)
    def curate(df: org.apache.spark.sql.DataFrame) =
      df.select(col("doc_id"),
        length(graft.ext.Curation.redactPii(col("text"))).as("clean_len"),
        graft.ext.Similarity.signBucket(col("embedding"), 4, 64).as("bucket"))
    val streamed = Streams.runToMemory(curate(stream), "curate_test",
      mode = "append")
    val batch = curate(spark.read.parquet(dir))
    assert(streamed.exceptAll(batch).isEmpty &&
      batch.exceptAll(streamed).isEmpty)
    assert(batch.count() > 0)
  }

  test("session_window sessionize equals the batch gap formulation " +
       "(q41), batch and streaming") {
    import spark.implicits._
    val ev = Tables.load(spark, TestSpark.sf0001, "events")
      .select("event_id", "user_id", "ts")
    // q41's windows-and-running-sum formulation as ground truth
    val q41 = SparkEntry.queries("q41_sessions")(spark, TestSpark.sf0001)
      .select(col("user_id"), col("n_events"),
        col("session_start"), col("session_end"))
    def normalized(df: org.apache.spark.sql.DataFrame) = df.select(
      col("user_id"), col("n_events"),
      date_format(col("session_start_ts"), "yyyy-MM-dd HH:mm:ss")
        .as("session_start"),
      date_format(col("session_end_ts"), "yyyy-MM-dd HH:mm:ss")
        .as("session_end"))
    val batch = normalized(Streams.sessionize(ev))
    assert(batch.exceptAll(q41).isEmpty && q41.exceptAll(batch).isEmpty)

    // streaming: two chronological file drops + a far-future sentinel
    // event to push the watermark past every real session (append mode
    // only emits CLOSED sessions)
    val dir = java.nio.file.Files.createTempDirectory("events_sess").toString
    val cut = ev.agg(expr("percentile_approx(unix_micros(ts), 0.5)"))
      .head().getLong(0)
    // one file per drop: multi-file drops are picked up in arbitrary
    // order, and an out-of-order file behind an advanced watermark
    // would drop events the batch side keeps
    ev.filter(unix_micros(col("ts")) <= cut)
      .coalesce(1).write.mode("append").parquet(dir)
    ev.filter(unix_micros(col("ts")) > cut)
      .coalesce(1).write.mode("append").parquet(dir)
    ev.limit(1).select(lit(-1L).as("event_id"), lit(-1L).as("user_id"),
      (col("ts") + expr("INTERVAL 10000 HOURS")).as("ts"))
      .coalesce(1).write.mode("append").parquet(dir)
    val stream = spark.readStream
      .schema(spark.read.parquet(dir).schema)
      .option("maxFilesPerTrigger", 1).parquet(dir)
    val streamed = normalized(
      Streams.runToMemory(Streams.sessionize(stream), "sess_test",
        mode = "append"))
      .filter(col("user_id") >= 0)
    assert(streamed.exceptAll(batch).isEmpty &&
      batch.exceptAll(streamed).isEmpty)
    assert(batch.count() > 0)
  }

  test("streaming funnel converges to the batch q80 answer across " +
       "micro-batches") {
    import spark.implicits._
    val ev = Tables.load(spark, TestSpark.sf0001, "events")
    val batch = SparkEntry.queries("q80_funnel")(spark, TestSpark.sf0001)
      .select("user_id", "first_view_us", "first_purchase_us",
        "converted", "lag_us")

    val typed = ev.select(col("user_id"), col("event_type"),
      unix_micros(col("ts")).as("ts_us"))
    val dir = java.nio.file.Files.createTempDirectory("events_funnel")
      .toString
    // REVERSE-chronological drops: the second batch carries EARLIER
    // events, exercising the late-view promotion path (pending purchases
    // become the answer retroactively)
    val cut = typed.agg(expr("percentile_approx(ts_us, 0.5)"))
      .head().getLong(0)
    typed.filter(col("ts_us") > cut)
      .coalesce(1).write.mode("append").parquet(dir)
    typed.filter(col("ts_us") <= cut)
      .coalesce(1).write.mode("append").parquet(dir)
    val stream = spark.readStream
      .schema(spark.read.parquet(dir).schema)
      .option("maxFilesPerTrigger", 1).parquet(dir)
      .as[Streams.FunnelEvent]
    val updates = Streams.runToMemory(
      Streams.streamingFunnel(stream).toDF(), "funnel_test",
      mode = "update")
    // n_seen increases monotonically → latest refinement per user
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("user_id").orderBy(col("n_seen").desc)
    val latest = updates.withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select("user_id", "first_view_us", "first_purchase_us",
        "converted", "lag_us")
    assert(latest.exceptAll(batch).isEmpty &&
      batch.exceptAll(latest).isEmpty)
    assert(batch.count() > 0)
  }

  test("streaming aggregate maintenance: the maintained state equals " +
       "the batch fold AND the full recompute, bit-exact") {
    import spark.implicits._
    import graft.etl.IncrementalAgg
    val ev = Tables.load(spark, TestSpark.sf0001, "events")
      .select("event_type", "value")
    val srcDir = java.nio.file.Files.createTempDirectory("agg_src").toString
    val stateDir =
      java.nio.file.Files.createTempDirectory("agg_state").toString + "/state"
    val cp = java.nio.file.Files.createTempDirectory("agg_cp").toString
    // three arbitrary micro-batches (one file per drop)
    ev.filter(abs(hash(col("value"))) % 3 === 0).coalesce(1)
      .write.mode("append").parquet(srcDir)
    ev.filter(abs(hash(col("value"))) % 3 === 1).coalesce(1)
      .write.mode("append").parquet(srcDir)
    ev.filter(abs(hash(col("value"))) % 3 === 2).coalesce(1)
      .write.mode("append").parquet(srcDir)
    val stream = spark.readStream
      .schema(spark.read.parquet(srcDir).schema)
      .option("maxFilesPerTrigger", 1).parquet(srcDir)
    val q = Streams.streamingAggMaintenance(stream, stateDir,
      Seq("event_type"), "value", cp)
    q.processAllAvailable(); q.stop()

    val maintained = IncrementalAgg.finish(
      Streams.readState(spark, stateDir).get, Seq("event_type"))
      .orderBy("event_type").collect().toSeq
    val recompute = IncrementalAgg.finish(
      IncrementalAgg.partial(ev, Seq("event_type"), col("value")),
      Seq("event_type")).orderBy("event_type").collect().toSeq
    assert(maintained === recompute,
      "stream-maintained state must equal the full recompute bit-exactly")
    assert(maintained.nonEmpty)

    // crash-safety contract of the versioned state store: a version dir
    // with no _SUCCESS marker (a crashed mid-write batch) is invisible
    // to readers, and pruning keeps at most the two newest committed
    // versions (the current one plus its replay fallback).
    val stateRoot = new java.io.File(stateDir)
    val committed = stateRoot.listFiles().toSeq
      .filter(f => f.isDirectory && f.getName.startsWith("v="))
      .filter(f => new java.io.File(f, "_SUCCESS").exists())
    assert(committed.size <= 2,
      s"pruning must keep <=2 committed versions, saw ${committed.size}")
    val torn = new java.io.File(stateRoot, "v=999")
    assert(torn.mkdirs())
    java.nio.file.Files.write(torn.toPath.resolve("part-garbage.parquet"),
      Array[Byte](1, 2, 3))
    val afterTorn = IncrementalAgg.finish(
      Streams.readState(spark, stateDir).get, Seq("event_type"))
      .orderBy("event_type").collect().toSeq
    assert(afterTorn === recompute,
      "an uncommitted (no _SUCCESS) version must never be observed")
  }

  test("streaming quantile-sketch maintenance: maintained state equals " +
       "the one-shot sketch over the whole input, bit-exact") {
    import graft.ext.Sketches
    val k = 32
    val ev = Tables.load(spark, TestSpark.sf0001, "events")
      .select("event_id", "event_type", "value")
    val srcDir = java.nio.file.Files.createTempDirectory("qs_src").toString
    val stateDir =
      java.nio.file.Files.createTempDirectory("qs_state").toString + "/state"
    val cp = java.nio.file.Files.createTempDirectory("qs_cp").toString
    // three arbitrary micro-batches (one file per drop)
    (0 until 3).foreach { i =>
      ev.filter(abs(hash(col("event_id"))) % 3 === i).coalesce(1)
        .write.mode("append").parquet(srcDir)
    }
    val stream = spark.readStream
      .schema(spark.read.parquet(srcDir).schema)
      .option("maxFilesPerTrigger", 1).parquet(srcDir)
    val q = Streams.streamingQuantileMaintenance(stream, stateDir,
      Seq("event_type"), "value", "event_id", k, cp)
    q.processAllAvailable(); q.stop()

    val maintained = Sketches.quantileFinish(
      Streams.readState(spark, stateDir).get, Seq("event_type"))
      .orderBy("event_type").collect().toSeq
    val recompute = Sketches.quantileFinish(
      Sketches.quantilePartial(ev, Seq("event_type"), col("value"),
        col("event_id"), k), Seq("event_type"))
      .orderBy("event_type").collect().toSeq
    assert(maintained === recompute,
      "stream-maintained sketch must equal the one-shot sketch bit-exactly")
    assert(maintained.nonEmpty)
  }

  test("streaming decay-state maintenance: maintained (user, day) " +
       "partials and finalized scores equal the one-shot fold, " +
       "bit-exact") {
    val ev = Tables.load(spark, TestSpark.sf0001, "events")
      .select("event_id", "user_id", "ts", "value")
    val srcDir = java.nio.file.Files.createTempDirectory("dc_src").toString
    val stateDir =
      java.nio.file.Files.createTempDirectory("dc_state").toString + "/state"
    val cp = java.nio.file.Files.createTempDirectory("dc_cp").toString
    (0 until 3).foreach { i =>
      ev.filter(abs(hash(col("event_id"))) % 3 === i).coalesce(1)
        .write.mode("append").parquet(srcDir)
    }
    val stream = spark.readStream
      .schema(spark.read.parquet(srcDir).schema)
      .option("maxFilesPerTrigger", 1).parquet(srcDir)
    val q = Streams.streamingDecayMaintenance(stream, stateDir, cp)
    q.processAllAvailable(); q.stop()

    val state = Streams.readState(spark, stateDir).get
    val oneShot = Streams.decayPartial(ev)
    assert(state.exceptAll(oneShot).isEmpty &&
      oneShot.exceptAll(state).isEmpty,
      "maintained (user, day) partials must equal the one-shot fold")
    val maintained = Streams.decayScoresFromState(state)
      .orderBy("user_id").collect().toSeq
    val recompute = Streams.decayScoresFromState(oneShot)
      .orderBy("user_id").collect().toSeq
    assert(maintained === recompute && maintained.nonEmpty,
      "finalized decay scores must match the batch fold bit-exactly")
  }

  test("streaming count-min maintenance: maintained sketch equals the " +
       "one-shot sketch over the whole input, bit-exact") {
    import graft.ext.Sketches
    val (depth, width) = (4, 64)
    val ev = Tables.load(spark, TestSpark.sf0001, "events")
      .select("event_id", "user_id")
    val srcDir = java.nio.file.Files.createTempDirectory("cms_src").toString
    val stateDir =
      java.nio.file.Files.createTempDirectory("cms_state").toString + "/state"
    val cp = java.nio.file.Files.createTempDirectory("cms_cp").toString
    (0 until 3).foreach { i =>
      ev.filter(abs(hash(col("event_id"))) % 3 === i).coalesce(1)
        .write.mode("append").parquet(srcDir)
    }
    val stream = spark.readStream
      .schema(spark.read.parquet(srcDir).schema)
      .option("maxFilesPerTrigger", 1).parquet(srcDir)
    val q = Streams.streamingCountMinMaintenance(stream, stateDir,
      "user_id", depth, width, cp)
    q.processAllAvailable(); q.stop()

    val maintained = Streams.readState(spark, stateDir).get
      .orderBy("j", "bucket").collect().toSeq
    val recompute = Sketches.countMin(ev, col("user_id"), depth, width)
      .orderBy("j", "bucket").collect().toSeq
    assert(maintained === recompute,
      "stream-maintained count-min must equal the one-shot sketch bit-exactly")
    assert(maintained.nonEmpty)
  }

  test("streaming HLL maintenance: maintained registers and estimates " +
       "equal the one-shot sketch, bit-exact") {
    import graft.ext.Sketches
    val ev = Tables.load(spark, TestSpark.sf0001, "events")
      .select("event_id", "event_type", "user_id")
    val srcDir = java.nio.file.Files.createTempDirectory("hll_src").toString
    val stateDir =
      java.nio.file.Files.createTempDirectory("hll_state").toString + "/state"
    val cp = java.nio.file.Files.createTempDirectory("hll_cp").toString
    (0 until 3).foreach { i =>
      ev.filter(abs(hash(col("event_id"))) % 3 === i).coalesce(1)
        .write.mode("append").parquet(srcDir)
    }
    val stream = spark.readStream
      .schema(spark.read.parquet(srcDir).schema)
      .option("maxFilesPerTrigger", 1).parquet(srcDir)
    val q = Streams.streamingHllMaintenance(stream, stateDir,
      "event_type", "user_id", cp)
    q.processAllAvailable(); q.stop()

    val maintained = Streams.readState(spark, stateDir).get
    val recompute = Sketches.hllRegisters(ev, Seq("event_type"),
      col("user_id").cast("string"))
    assert(maintained.orderBy("event_type", "__bucket").collect().toSeq ===
      recompute.orderBy("event_type", "__bucket").collect().toSeq,
      "stream-maintained HLL registers must equal the one-shot sketch")
    val estM = Sketches.hllEstimate(maintained, Seq("event_type"))
      .orderBy("event_type").collect().toSeq
    val estR = Sketches.hllDistinct(ev, Seq("event_type"),
      col("user_id").cast("string"))
      .orderBy("event_type").collect().toSeq
    assert(estM === estR)
    assert(estM.nonEmpty)
  }

  test("stateful streaming dedup keeps exactly one event per key") {
    import spark.implicits._
    val batchEvents = Tables.load(spark, TestSpark.sf0001, "events")
      .select("event_id", "user_id", "event_type", "value")
    val dir = java.nio.file.Files.createTempDirectory("events_dedup").toString
    batchEvents.write.mode("overwrite").parquet(dir)

    val stream = spark.readStream.schema(batchEvents.schema).parquet(dir)
      .as[Streams.Event]
    val out = Streams.runToMemory(
      Streams.streamingDedupFirst(stream).toDF(), "dedup_test", "append")

    val expectedKeys = batchEvents
      .select("user_id", "event_type").distinct().count()
    assert(out.count() === expectedKeys)
    assert(out.groupBy("user_id", "event_type").count()
      .filter(col("count") > 1).isEmpty)
  }

  test("bounded-state dedup: one row per key, dupes within watermark " +
       "suppressed") {
    val batchEvents = Tables.load(spark, TestSpark.sf0001, "events")
      .select("event_id", "user_id", "event_type", "value", "ts")
    val dir = java.nio.file.Files.createTempDirectory("events_wmdedup")
      .toString
    batchEvents.write.mode("overwrite").parquet(dir)

    val stream = spark.readStream.schema(batchEvents.schema).parquet(dir)
    // watermark far wider than the fixture's time span: every duplicate
    // arrives "within watermark", so streaming ≡ batch keep-one
    val out = Streams.runToMemory(
      Streams.dedupBoundedState(stream, Seq("user_id", "event_type"),
        watermark = "1000 hours"),
      "wm_dedup_test", "append")

    val expectedKeys = batchEvents
      .select("user_id", "event_type").distinct().count()
    assert(out.count() === expectedKeys)
    assert(out.groupBy("user_id", "event_type").count()
      .filter(col("count") > 1).isEmpty)
    // batch twin: same keep-one cardinality through the same entry point
    assert(Streams.dedupBoundedState(batchEvents,
      Seq("user_id", "event_type")).count() === expectedKeys)
  }

  test("stream-stream interval join equals the batch range join") {
    val events = Tables.load(spark, TestSpark.sf0001, "events")
    val views = events.filter(col("event_type") === "view")
    val purchases = events.filter(col("event_type") === "purchase")
    val batch = Streams.viewToPurchase(views, purchases)
    assert(batch.count() > 0)

    val vDir = java.nio.file.Files.createTempDirectory("ss_views").toString
    val pDir = java.nio.file.Files.createTempDirectory("ss_purch").toString
    views.write.mode("overwrite").parquet(vDir)
    purchases.write.mode("overwrite").parquet(pDir)
    val vs = spark.readStream.schema(views.schema).parquet(vDir)
    val ps = spark.readStream.schema(purchases.schema).parquet(pDir)
    val streamed = Streams.runToMemory(
      Streams.viewToPurchase(vs, ps, watermark = "1000 hours"),
      "ss_join_test", "append")

    assert(streamed.exceptAll(batch).isEmpty &&
      batch.exceptAll(streamed).isEmpty)
  }

  test("left-outer stream-stream join emits unmatched purchases after " +
    "the watermark passes") {
    val events = Tables.load(spark, TestSpark.sf0001, "events")
    val views = events.filter(col("event_type") === "view")
    val purchases = events.filter(col("event_type") === "purchase")

    val batch = Streams.viewToPurchaseOuter(views, purchases)
    val inner = Streams.viewToPurchase(views, purchases)
    val unmatched = batch.filter(col("view_event_id").isNull)
    // outer = inner ∪ null-extended, and every purchase appears
    assert(batch.count() === inner.count() + unmatched.count())
    assert(batch.select("purchase_event_id").distinct().count() ===
      purchases.count())
    assert(unmatched.count() > 0) // the fixture has un-attributed buys

    val vDir = java.nio.file.Files.createTempDirectory("sso_views").toString
    val pDir = java.nio.file.Files.createTempDirectory("sso_purch").toString
    views.write.mode("overwrite").parquet(vDir)
    purchases.write.mode("overwrite").parquet(pDir)
    val vs = spark.readStream.schema(views.schema).parquet(vDir)
    val ps = spark.readStream.schema(purchases.schema).parquet(pDir)
    val q = Streams.viewToPurchaseOuter(vs, ps, watermark = "1 minute")
      .writeStream.outputMode("append")
      .format("memory").queryName("sso_join_test").start()
    q.processAllAvailable()
    // The final windows' unmatched rows need the GLOBAL watermark (the
    // min across both inputs) to move past them: append one far-future
    // row (different user) to EACH side and re-trigger.
    val maxTs = events.agg(max(col("ts"))).collect()(0).getTimestamp(0)
    def sentinel(src: org.apache.spark.sql.DataFrame) = src.limit(1)
      .withColumn("ts", lit(new java.sql.Timestamp(
        maxTs.getTime + 1000L * 3600 * 24)))
      .withColumn("user_id", lit(-1L))
    sentinel(views).write.mode("append").parquet(vDir)
    sentinel(purchases).write.mode("append").parquet(pDir)
    q.processAllAvailable()
    q.stop()
    val streamed = spark.table("sso_join_test")
      .filter(col("user_id") =!= -1L)
    assert(streamed.exceptAll(batch).isEmpty &&
      batch.exceptAll(streamed).isEmpty)
  }

  test("stateful dedup state survives a stop/restart via checkpointing") {
    import spark.implicits._
    val src = java.nio.file.Files.createTempDirectory("cp_src").toString
    val out = java.nio.file.Files.createTempDirectory("cp_out").toString
    val cp = java.nio.file.Files.createTempDirectory("cp_chk").toString

    def event(id: Long, user: Long, typ: String) =
      Streams.Event(id, user, typ, 1.0)
    val schema = Seq(event(0, 0, "x")).toDF().schema

    def runOnce(): Unit = {
      val stream = spark.readStream.schema(schema).parquet(src)
        .as[Streams.Event]
      val q = Streams.streamingDedupFirst(stream).toDF()
        .writeStream.outputMode("append")
        .format("parquet")
        .option("path", out)
        .option("checkpointLocation", cp)
        .start()
      q.processAllAvailable()
      q.stop()
    }

    // batch 1: two users, one duplicate within the batch
    Seq(event(1, 10, "view"), event(2, 10, "view"), event(3, 20, "buy"))
      .toDF().write.mode("append").parquet(src)
    runOnce()
    val after1 = spark.read.parquet(out)
    assert(after1.count() === 2) // (10,view) once + (20,buy)

    // batch 2 AFTER restart: a key already seen in batch 1 must still be
    // suppressed (state restored from the checkpoint), a new key passes
    Seq(event(4, 10, "view"), event(5, 30, "view"))
      .toDF().write.mode("append").parquet(src)
    runOnce()
    val after2 = spark.read.parquet(out).cache()
    assert(after2.count() === 3)
    assert(after2.filter(col("user_id") === 10).count() === 1)
    assert(after2.filter(col("event_id") === 4).isEmpty,
      "duplicate of a pre-restart key leaked through - state not restored")
    assert(after2.filter(col("user_id") === 30).count() === 1)
  }

  test("stream-static anti-join: arriving docs dedup against a static " +
       "corpus per micro-batch") {
    import spark.implicits._
    val corpus = Seq((100L, "the quick brown fox"), (101L, "old doc"))
      .toDF("doc_id", "text")
    val fp = graft.ext.TextStats.contentFingerprint(col("text"))
    val corpusFps = corpus.select(fp.as("__fp")).distinct()

    val dir = java.nio.file.Files.createTempDirectory("ss_dedup").toString
    Seq((1L, "the quick brown fox"), (2L, "fresh content"))
      .toDF("doc_id", "text").write.mode("append").parquet(dir)
    val stream = spark.readStream
      .schema(corpus.schema).parquet(dir)
      .withColumn("__fp", fp)
      .join(corpusFps, Seq("__fp"), "left_anti") // static side broadcast
      .drop("__fp")
    val out = Streams.runToMemory(stream, "ss_dedup_test", "append")
    assert(out.select("doc_id").as[Long].collect().toSet === Set(2L),
      "doc duplicating static corpus content must be dropped")
  }

  test("streaming SCD2: snapshot stream folds into the warehouse like " +
       "the batch pipeline") {
    import spark.implicits._
    import java.sql.Date
    val src = java.nio.file.Files.createTempDirectory("scd2_src").toString
    val wh = java.nio.file.Files.createTempDirectory("scd2_wh").toString +
      "/dw"
    val cp = java.nio.file.Files.createTempDirectory("scd2_cp").toString

    def snap(rows: (String, Double, String)*) = rows.toDF(
      "natural_key", "price", "load_date_s")
      .withColumn("load_date", col("load_date_s").cast("date"))
      .drop("load_date_s")

    // day 1: A, B
    val d1 = snap(("A", 1.0, "2024-01-01"), ("B", 2.0, "2024-01-01"))
    d1.write.mode("append").parquet(src)
    val stream = spark.readStream.schema(
      spark.read.parquet(src).schema).parquet(src)
    val q = Streams.streamingScd2(stream, wh, "natural_key",
      Seq("price"), "load_date", cp)
    q.processAllAvailable()
    assert(graft.etl.Scd2.readWarehouse(spark, wh).count() === 2)

    // day 2: A changes, C appears (B unchanged)
    snap(("A", 9.0, "2024-01-02"), ("B", 2.0, "2024-01-02"),
      ("C", 3.0, "2024-01-02")).write.mode("append").parquet(src)
    q.processAllAvailable()
    q.stop()

    val dw = graft.etl.Scd2.readWarehouse(spark, wh).cache()
    // closed A(day1) + open A(day2) + open B + open C
    assert(dw.count() === 4)
    val openA = dw.filter(col("natural_key") === "A" &&
      col("is_current") === true).collect()
    assert(openA.length === 1 && openA(0).getAs[Double]("price") === 9.0)
    val closedA = dw.filter(col("natural_key") === "A" &&
      col("is_current") === false).collect()
    assert(closedA.length === 1 &&
      closedA(0).getAs[Double]("price") === 1.0 &&
      closedA(0).getAs[Date]("dt_last_update") ===
        Date.valueOf("2024-01-02"))
    assert(dw.filter(col("is_current") === true).count() === 3)
    // matches the batch formulation on the same two days
    val batchDim = graft.etl.Scd2.merge(
      d1.drop("load_date")
        .withColumn("dt_load_to_dw", lit(Date.valueOf("2024-01-01")))
        .withColumn("dt_last_update", lit(graft.etl.Scd2.Sentinel)),
      snap(("A", 9.0, "2024-01-02"), ("B", 2.0, "2024-01-02"),
        ("C", 3.0, "2024-01-02")).drop("load_date"),
      "natural_key", Seq("price"), Date.valueOf("2024-01-02"))
    val streamed = dw.drop("is_current")
      .select(batchDim.columns.map(col).toSeq: _*)
    assert(streamed.exceptAll(batchDim).isEmpty &&
      batchDim.exceptAll(streamed).isEmpty)
  }

  test("streaming calibration maintenance: state finishes to the " +
       "batch q335 ECE report bit-exactly under 3-way micro-batching") {
    val docs = Tables.load(spark, TestSpark.sf0001, "documents")
    val srcDir = java.nio.file.Files.createTempDirectory("cal_src").toString
    val stateDir =
      java.nio.file.Files.createTempDirectory("cal_state").toString + "/state"
    val cp = java.nio.file.Files.createTempDirectory("cal_cp").toString
    // three arbitrary micro-batches (one file per drop)
    (0 to 2).foreach { i =>
      docs.filter(abs(hash(col("doc_id"))) % 3 === i).coalesce(1)
        .write.mode("append").parquet(srcDir)
    }
    val stream = spark.readStream
      .schema(spark.read.parquet(srcDir).schema)
      .option("maxFilesPerTrigger", 1).parquet(srcDir)
    val q = Streams.streamingCalibrationMaintenance(stream, stateDir, cp)
    q.processAllAvailable(); q.stop()

    val maintained = Streams.eceFromState(
      Streams.readState(spark, stateDir).get).collect().toSeq
    val batch = SparkEntry.queries("q335_ece")(spark, TestSpark.sf0001)
      .collect().toSeq
    assert(maintained === batch,
      "maintained calibration state must finish to the batch q335 " +
        "report bit-for-bit")
    assert(maintained.nonEmpty)
    // state is the tiny (source x 10) integer table, not history
    val stateRows = Streams.readState(spark, stateDir).get.count()
    assert(stateRows <= 20 * 10, s"state has $stateRows rows")
  }

  test("mapGroupsWithState running totals equal batch aggregation") {
    import spark.implicits._
    val batchEvents = Tables.load(spark, TestSpark.sf0001, "events")
      .select("event_id", "user_id", "event_type", "value")
    val dir = java.nio.file.Files.createTempDirectory("events_tot").toString
    batchEvents.write.mode("overwrite").parquet(dir)

    val stream = spark.readStream.schema(batchEvents.schema).parquet(dir)
      .as[Streams.Event]
    val out = Streams.runToMemory(
      Streams.runningUserTotals(stream).toDF("user_id", "n", "sum_value"),
      "totals_test", "update")

    // single micro-batch ⇒ final state equals the batch aggregate
    val expected = batchEvents.groupBy("user_id")
      .agg(count(lit(1)).as("n"), sum(col("value")).as("sum_value"))
    val got = out.groupBy("user_id")
      .agg(max(col("n")).as("n"), max(col("sum_value")).as("sum_value"))
    assert(got.count() === expected.count())
    val joined = got.alias("g").join(expected.alias("e"), "user_id")
      .filter(col("g.n") =!= col("e.n") ||
        abs(col("g.sum_value") - col("e.sum_value")) > 1e-9)
    assert(joined.isEmpty)
  }

  test("maintained day grid is the sufficient statistic: state equals " +
       "the one-shot fold and finishes to the batch q360 spectrum AND " +
       "q364 Gumbel fit bit-exactly under 3-way micro-batching") {
    val events = Tables.load(spark, TestSpark.sf0001, "events")
    val srcDir = java.nio.file.Files.createTempDirectory("dg_src").toString
    val stateDir =
      java.nio.file.Files.createTempDirectory("dg_state").toString + "/state"
    val cp = java.nio.file.Files.createTempDirectory("dg_cp").toString
    (0 to 2).foreach { i =>
      events.filter(abs(hash(col("event_id"))) % 3 === i).coalesce(1)
        .write.mode("append").parquet(srcDir)
    }
    val stream = spark.readStream
      .schema(spark.read.parquet(srcDir).schema)
      .option("maxFilesPerTrigger", 1).parquet(srcDir)
    val q = Streams.streamingDailyGridMaintenance(stream, stateDir, cp)
    q.processAllAvailable(); q.stop()

    val state = Streams.readState(spark, stateDir).get
    // 1) state ≡ one-shot fold, bit-exact, regardless of batching
    val oneShot = Streams.dailyGridPartial(events)
    assert(state.exceptAll(oneShot).isEmpty &&
      oneShot.exceptAll(state).isEmpty,
      "maintained day grid must equal the one-shot fold")
    // 2) finalizers reproduce the batch queries bit-for-bit
    val spec = Streams.spectrumFromState(state).collect().toSeq
    val q360 = SparkEntry.queries("q360_weekly_spectrum")(
      spark, TestSpark.sf0001).collect().toSeq
    assert(spec === q360, "maintained spectrum != batch q360")
    val gum = Streams.gumbelFromState(state).collect().toSeq
    val q364 = SparkEntry.queries("q364_gumbel_return_level")(
      spark, TestSpark.sf0001).collect().toSeq
    assert(gum === q364, "maintained Gumbel fit != batch q364")
    // 3) state is the tiny grid, not history
    assert(state.count() <= 366, "state must stay grid-sized")
  }

  test("streaming linkage maintenance: maintained entity ids equal the " +
       "batch q166 clusters bit-exactly under 3-way micro-batching") {
    // the same blocked dimension q166 builds internally: a part links
    // iff it agrees with another part on >= 2 of (type, size,
    // price-bucket) within its brand == iff they share one of the three
    // (brand, field_i, field_j) blocks
    val parts = Tables.load(spark, TestSpark.sf0001, "part")
      .select(col("p_partkey"), col("p_brand"), col("p_type"),
        col("p_size"),
        floor(col("p_retailprice") / lit(100.0)).cast("long").as("pb"))
    val blockKeySets = Seq(
      Seq("p_brand", "p_type", "p_size"),
      Seq("p_brand", "p_type", "pb"),
      Seq("p_brand", "p_size", "pb"))
    val srcDir = java.nio.file.Files.createTempDirectory("lk_src").toString
    val stateDir =
      java.nio.file.Files.createTempDirectory("lk_state").toString + "/state"
    val cp = java.nio.file.Files.createTempDirectory("lk_cp").toString
    (0 to 2).foreach { i =>
      parts.filter(abs(hash(col("p_partkey"))) % 3 === i).coalesce(1)
        .write.mode("append").parquet(srcDir)
    }
    val stream = spark.readStream
      .schema(spark.read.parquet(srcDir).schema)
      .option("maxFilesPerTrigger", 1).parquet(srcDir)
    val q = Streams.streamingLinkageMaintenance(stream, stateDir,
      "p_partkey", blockKeySets, cp)
    q.processAllAvailable(); q.stop()

    val maintained = Streams.linkageClustersFromState(
      Streams.readState(spark, s"$stateDir/labels").get).collect().toSeq
    val batch = SparkEntry.queries("q166_linkage_clusters")(
      spark, TestSpark.sf0001).collect().toSeq
    assert(maintained === batch,
      "maintained linkage labels must finish to the batch q166 " +
        "clusters bit-for-bit")
    assert(maintained.nonEmpty)
    // block state is per-block sufficient statistics, never pair sets:
    // bounded by 3 blocks per part
    val blocks = Streams.readState(spark, s"$stateDir/blocks").get
    assert(blocks.count() <= 3L * parts.count(),
      "block state must stay dimension-bounded")
  }
}
