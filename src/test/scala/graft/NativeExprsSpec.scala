package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.ext.{Shingles, TextStats}
import graft.functions.NativeExprs

/** The native Catalyst expressions must be bit-identical to their
  * built-in higher-order-function reference pipelines on arbitrary input.
  */
class NativeExprsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("MinHashSignatureExpr ≡ HOF minHashSignature (incl. edge docs)") {
    val docs = Seq(
      "the quick brown fox jumps over the lazy dog",
      "one",                      // fewer tokens than k
      "",                         // empty doc → single empty shingle
      "a b",                      // exactly boundary sizes
      "xin chào thế giới việt nam" // multi-byte UTF-8
    ).toDF("text")
    val toks = TextStats.tokens(col("text"))
    val out = docs.select(
      NativeExprs.minHashSignature(toks, 3, 16).as("native"),
      Shingles.minHashSignature(toks, 3, 16).as("hof"))
      .collect()
    out.foreach { r =>
      assert(r.getSeq[Long](0) === r.getSeq[Long](1))
    }
  }

  test("WordShingles / RollingFingerprint / SimHash ≡ HOF references") {
    val docs = Seq(
      "the quick brown fox jumps over the lazy dog",
      "one", "", "a b", "xin chào thế giới việt nam",
      "dup dup dup dup dup").toDF("text")
    val toks = TextStats.tokens(col("text"))
    val out = docs.select(
      NativeExprs.wordShingles(toks, 3, distinct = true).as("sh_n"),
      array_distinct(Shingles.wordShingles(toks, 3)).as("sh_h"),
      NativeExprs.rollingFingerprint(toks, 5).as("rf_n"),
      graft.ext.TextStats.rollingFingerprintHof(col("text"), 5).as("rf_h"),
      NativeExprs.simhash(toks, 16).as("sim_n"),
      graft.ext.Dedup.simhashHof(col("text"), 16).as("sim_h"))
      .collect()
    out.foreach { r =>
      assert(r.getSeq[String](0) === r.getSeq[String](1))
      assert(r.getString(2) === r.getString(3))
      assert(r.getString(4) === r.getString(5))
    }
  }

  test("LangIdExpr ≡ HOF langId on marker-bearing and empty docs") {
    val docs = Seq(
      "the cat and the dog of the house is big",
      "el perro de la casa es que grande la vida",
      "der hund und die katze das ist gut",
      "le chat et le chien les animaux est la",
      "no markers whatsoever xyz", "").toDF("text")
    val out = docs.select(
      TextStats.langId(col("text")).as("native"),
      TextStats.langIdHof(col("text")).as("hof")).collect()
    out.foreach(r => assert(r.getString(0) === r.getString(1)))
  }

  test("DotProductExpr ≡ HOF fold on float arrays and handles nulls") {
    val df = Seq(
      (Array(1.0f, 2.5f, -3.0f), Array(0.5f, 4.0f, 2.0f)),
      (Array(0.0f, 0.0f, 0.0f), Array(1.0f, 1.0f, 1.0f)))
      .toDF("a", "b")
    val hof = aggregate(zip_with(col("a"), col("b"),
      (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, v) => acc + v)
    val rows = df.select(NativeExprs.dot(col("a"), col("b")).as("n"),
      hof.as("h")).collect()
    rows.foreach(r => assert(r.getDouble(0) === r.getDouble(1)))

    val withNull = Seq((Option.empty[Array[Float]], Option(Array(1.0f))))
      .toDF("a", "b")
      .select(NativeExprs.dot(col("a"), col("b")).as("n")).head()
    assert(withNull.isNullAt(0))
  }

  test("DotProductExpr rejects length mismatch at runtime and bad " +
       "element types at analysis") {
    val mismatch = Seq((Array(1.0f, 2.0f), Array(1.0f)))
      .toDF("a", "b").select(NativeExprs.dot(col("a"), col("b")))
    val e = intercept[Exception](mismatch.collect())
    def causes(t: Throwable): Seq[Throwable] =
      if (t == null) Nil else t +: causes(t.getCause)
    assert(causes(e).exists(c => c.isInstanceOf[IllegalArgumentException] &&
      c.getMessage.contains("length mismatch")), s"got: $e")

    val badType = Seq((Array("x"), Array("y"))).toDF("a", "b")
    intercept[org.apache.spark.sql.AnalysisException] {
      badType.select(NativeExprs.dot(col("a"), col("b"))).schema
    }
  }

  test("SignLshBucketsExpr ≡ column-composed projection on real " +
       "embeddings, both codegen and interpreted") {
    val emb = Tables.load(spark, "/root/testdata/sf0.001", "embeddings")
    val bits = 4; val dims = 64; val tables = 3
    val cols = (0 until tables).map(t =>
      graft.ext.Similarity.signBucketCols(col("embedding"), bits, dims,
        42L + t).as(s"c$t"))
    val rows = emb.select(
      (NativeExprs.signLshBuckets(col("embedding"), bits, dims, 42L,
        tables).as("native") +: cols): _*).collect()
    rows.foreach { r =>
      val native = r.getSeq[String](0)
      assert(native === (1 to tables).map(r.getString),
        "native buckets must equal the column-composed chain")
    }
    // interpreted path (eval) must agree with the codegen'd path
    val interp = emb.select(NativeExprs.signLshBuckets(col("embedding"),
      bits, dims, 42L, tables).as("b"))
    val conf = "spark.sql.codegen.wholeStage"
    val prev = spark.conf.get(conf)
    try {
      spark.conf.set(conf, "false")
      val a = interp.collect().map(_.getSeq[String](0).mkString("|"))
      spark.conf.set(conf, prev)
      val b = interp.collect().map(_.getSeq[String](0).mkString("|"))
      assert(a.toSeq === b.toSeq)
    } finally spark.conf.set(conf, prev)
  }

  test("ZInterleaveExpr ≡ reference bit math, codegen ≡ interpreted, " +
       "and reachable from SQL as graft_zvalue") {
    import spark.implicits._
    def ref(x: Long, y: Long, bits: Int): Long =
      (0 until bits).foldLeft(0L)((z, i) =>
        z | (((x >> i) & 1L) << (2 * i)) | (((y >> i) & 1L) << (2 * i + 1)))
    val pairs = Seq((0L, 0L), (1L, 0L), (0L, 1L), (1023L, 0L), (0L, 1023L),
      (513L, 770L), (65535L, 65535L), (12345L, 54321L))
    val df = pairs.toDF("x", "y")
    val got = df.select(NativeExprs.zValue(col("x"), col("y"), 16).as("z"))
      .collect().map(_.getLong(0)).toSeq
    assert(got === pairs.map { case (x, y) => ref(x, y, 16) })

    val conf = "spark.sql.codegen.wholeStage"
    val prev = spark.conf.get(conf)
    try {
      spark.conf.set(conf, "false")
      val interp = df.select(NativeExprs.zValue(col("x"), col("y"), 16))
        .collect().map(_.getLong(0)).toSeq
      assert(interp === got)
    } finally spark.conf.set(conf, prev)

    graft.functions.GraftFunctions.register(spark)
    df.createOrReplaceTempView("zpairs")
    val sql = spark.sql("SELECT graft_zvalue(x, y, 16) AS z FROM zpairs")
      .collect().map(_.getLong(0)).toSeq
    assert(sql === got)

    // Force-compile the generated code. Spark swallows janino compile
    // errors and falls back to interpreted eval, so the wholeStage
    // toggle above cannot distinguish "codegen works" from "codegen
    // broken but fallback correct" — this call throws on a janino error.
    import org.apache.spark.sql.catalyst.InternalRow
    import org.apache.spark.sql.catalyst.expressions.BoundReference
    import org.apache.spark.sql.catalyst.expressions.codegen.GenerateUnsafeProjection
    import org.apache.spark.sql.types.LongType
    val bound = NativeExprs.ZInterleaveExpr(
      BoundReference(0, LongType, nullable = false),
      BoundReference(1, LongType, nullable = false), 16)
    val proj = GenerateUnsafeProjection.generate(Seq(bound))
    pairs.foreach { case (x, y) =>
      assert(proj(InternalRow(x, y)).getLong(0) === ref(x, y, 16))
    }
  }

  test("NormalizeTextExpr: NFC + casefold + whitespace collapse; " +
      "codegen ≡ interpreted; SQL surface") {
    val cases = Seq(
      // (input, expected) — expected = reference chain in plain Java
      "  Hello\t\tWorld  "        -> "hello world",
      "A\nB\rC\u000BD\fE"         -> "a b c d e",
      ""                          -> "",
      " \t\n "                    -> "",
      "already normal"            -> "already normal",
      // e + COMBINING ACUTE (U+0301) must compose to é (NFC)
      "Café"           -> "café",
      "ÉCOLE Straße"              -> "école straße",
      "xin CHÀO  thế giới"        -> "xin chào thế giới")
    val df = cases.map(_._1).toDF("text")
    val got = df.select(NativeExprs.normalizeText(col("text")).as("n"))
      .collect().map(_.getString(0)).toSeq
    assert(got === cases.map(_._2))

    // reference semantics: the four-step chain the expression fuses
    val ref = cases.map { case (in, _) =>
      java.text.Normalizer
        .normalize(in, java.text.Normalizer.Form.NFC)
        .toLowerCase(java.util.Locale.ROOT)
        .replaceAll("[ \\t\\n\\u000B\\f\\r]+", " ").trim
    }
    assert(got === ref)

    val conf = "spark.sql.codegen.wholeStage"
    val prev = spark.conf.get(conf)
    try {
      spark.conf.set(conf, "false")
      val interp = df.select(NativeExprs.normalizeText(col("text")))
        .collect().map(_.getString(0)).toSeq
      assert(interp === got)
    } finally spark.conf.set(conf, prev)

    graft.functions.GraftFunctions.register(spark)
    df.createOrReplaceTempView("normdocs")
    val sql = spark
      .sql("SELECT graft_normalize_text(text) AS n FROM normdocs")
      .collect().map(_.getString(0)).toSeq
    assert(sql === got)

    // null in → null out
    val nulls = Seq[Option[String]](None, Some("X")).toDF("text")
    val nOut = nulls.select(NativeExprs.normalizeText(col("text")))
      .collect()
    assert(nOut(0).isNullAt(0) && nOut(1).getString(0) == "x")
  }

  test("HammingDistanceExpr ≡ reference, codegen ≡ interpreted, total " +
    "on unequal lengths, SQL surface") {
    import spark.implicits._
    def ref(a: String, b: String): Long = {
      val ab = a.getBytes("UTF-8"); val bb = b.getBytes("UTF-8")
      math.abs(ab.length - bb.length).toLong +
        ab.zip(bb).count { case (x, y) => x != y }
    }
    val pairs = Seq(("", ""), ("0101", "0101"), ("0101", "1010"),
      ("1111", ""), ("", "0"), ("abc", "abd"), ("0001111", "0001"),
      ("0" * 64, "0" * 63 + "1"))
    val df = pairs.toDF("a", "b")
    val got = df.select(NativeExprs.hamming(col("a"), col("b")).as("d"))
      .collect().map(_.getLong(0)).toSeq
    assert(got === pairs.map { case (a, b) => ref(a, b) })

    val conf = "spark.sql.codegen.wholeStage"
    val prev = spark.conf.get(conf)
    try {
      spark.conf.set(conf, "false")
      val interp = df.select(NativeExprs.hamming(col("a"), col("b")))
        .collect().map(_.getLong(0)).toSeq
      assert(interp === got)
    } finally spark.conf.set(conf, prev)

    graft.functions.GraftFunctions.register(spark)
    df.createOrReplaceTempView("hpairs")
    val sql = spark.sql("SELECT graft_hamming(a, b) FROM hpairs")
      .collect().map(_.getLong(0)).toSeq
    assert(sql === got)

    // force-compile: janino failures must not hide behind the
    // interpreted fallback
    import org.apache.spark.sql.catalyst.InternalRow
    import org.apache.spark.sql.catalyst.expressions.BoundReference
    import org.apache.spark.sql.catalyst.expressions.codegen.GenerateUnsafeProjection
    import org.apache.spark.sql.types.StringType
    import org.apache.spark.unsafe.types.UTF8String
    val bound = NativeExprs.HammingDistanceExpr(
      BoundReference(0, StringType, nullable = false),
      BoundReference(1, StringType, nullable = false))
    val proj = GenerateUnsafeProjection.generate(Seq(bound))
    pairs.foreach { case (a, b) =>
      assert(proj(InternalRow(UTF8String.fromString(a),
        UTF8String.fromString(b))).getLong(0) === ref(a, b))
    }
  }

  test("SortedIntersectCountExpr ≡ size(array_intersect) on sorted " +
       "(df, tok) struct arrays incl. df ties, empties, disjoint") {
    // build sorted struct arrays the same way prefixFilterJaccardPairs
    // does: sort_array over struct(df, tok) — df ties force the string
    // branch of the merge
    val rows = Seq(
      (Seq((1L, "aa"), (1L, "bb"), (3L, "cc"), (7L, "dd")),
       Seq((1L, "bb"), (3L, "cc"), (7L, "dd"), (9L, "zz"))), // overlap 3
      (Seq((1L, "aa")), Seq((2L, "aa"))),                    // same tok, diff df
      (Seq.empty[(Long, String)], Seq((1L, "aa"))),          // empty left
      (Seq((5L, "x"), (5L, "y"), (5L, "z")),
       Seq((5L, "y"), (5L, "z"))),                           // all-tie dfs
      (Seq((1L, "a"), (2L, "b")), Seq((3L, "c"), (4L, "d"))) // disjoint
    ).toDF("a", "b")
      .select(
        sort_array(expr(
          "transform(a, e -> struct(e._1 as df, e._2 as tok))")).as("sa"),
        sort_array(expr(
          "transform(b, e -> struct(e._1 as df, e._2 as tok))")).as("sb"))
    val out = rows.select(
      NativeExprs.sortedIntersectCount(col("sa"), col("sb")).as("native"),
      size(array_intersect(col("sa"), col("sb"))).cast("long").as("ref"))
      .collect()
    out.foreach(r => assert(r.getLong(0) === r.getLong(1), r.toString))
    assert(out.map(_.getLong(0)).toSeq === Seq(3L, 0L, 0L, 2L, 0L))

    // interpreted path must agree with codegen
    val conf = "spark.sql.codegen.wholeStage"
    val prev = spark.conf.get(conf)
    try {
      spark.conf.set(conf, "false")
      val interp = rows.select(
        NativeExprs.sortedIntersectCount(col("sa"), col("sb")))
        .collect().map(_.getLong(0)).toSeq
      assert(interp === Seq(3L, 0L, 0L, 2L, 0L))
    } finally spark.conf.set(conf, prev)
  }

  test("BoundedLevenshteinExpr ≡ built-in levenshtein within bound; " +
       "> bound rows are correctly classified (random, multi-byte, >64cp)") {
    val rnd = new scala.util.Random(20260816L)
    val ascii = "abcdefg 0123"
    val viet = "abcxin chào thế giới" // multi-byte code points
    val emoji = "ab😀😁c" // surrogate pairs = 1 cp each
    def randStr(alpha: String, maxLen: Int): String =
      (0 until rnd.nextInt(maxLen + 1)).map { _ =>
        val i = rnd.nextInt(alpha.codePointCount(0, alpha.length))
        val off = alpha.offsetByCodePoints(0, i)
        new String(Character.toChars(alpha.codePointAt(off)))
      }.mkString
    // mutate-a-copy pairs land near the threshold; independent pairs land
    // far above it — both classes exercised
    val pairs =
      (1 to 120).map { _ =>
        val a = randStr(ascii, 45)
        (a, randStr(ascii, 45))
      } ++ (1 to 60).map { _ =>
        val alpha = if (rnd.nextBoolean()) viet else emoji
        (randStr(alpha, 40), randStr(alpha, 40))
      } ++ (1 to 20).map { _ =>   // > 64 code points: DP fallback path
        (randStr(ascii, 90), randStr(ascii, 90))
      } ++ Seq(("", ""), ("", "abc"), ("abc", ""), ("same", "same"))
    val bound = 8
    val df = pairs.toDF("a", "b").select(col("a"), col("b"),
      NativeExprs.boundedLevenshtein(col("a"), col("b"), bound).as("nat"),
      levenshtein(col("a"), col("b")).cast("long").as("ref"))
    val rows = df.collect()
    rows.foreach { r =>
      val (nat, ref) = (r.getLong(2), r.getLong(3))
      if (ref <= bound)
        assert(nat === ref, s"exact within bound: ${r.getString(0)} / " +
          s"${r.getString(1)}")
      else assert(nat > bound, s"over-bound must classify: " +
        s"${r.getString(0)} / ${r.getString(1)} ref=$ref nat=$nat")
    }
    // interpreted path ≡ codegen path
    val gen = rows.map(_.getLong(2)).toSeq
    val conf = "spark.sql.codegen.wholeStage"
    val prev = spark.conf.get(conf)
    try {
      spark.conf.set(conf, "false")
      val interp = pairs.toDF("a", "b").select(
        NativeExprs.boundedLevenshtein(col("a"), col("b"), bound))
        .collect().map(_.getLong(0)).toSeq
      assert(interp === gen)
    } finally spark.conf.set(conf, prev)
  }

  test("Md5Prefix60SortedExpr ≡ sort_array(conv(substring(md5)))) — the " +
       "documented DuckDB hash-universe recipe — on ASCII/multi-byte/" +
       "empty docs; codegen ≡ interpreted") {
    // tokens() output feeds the real caller; include multi-byte strings
    // (hash is over UTF-8 BYTES) and the empty array
    val rows = Seq(
      Seq("aa bb cc", "bb cc dd", "zz"),
      Seq("xin chào", "thế giới", "😀 emoji shingle"),
      Seq("single"),
      Seq.empty[String]
    ).toDF("sh")
      // the real caller passes containsNull=false arrays (struct-field
      // extraction from collect_list output); coalesce in a transform
      // narrows the toDF-inferred containsNull=true to false
      .select(expr("transform(sh, x -> coalesce(x, 'null'))").as("sh"))
    val out = rows.select(
      NativeExprs.md5Prefix60Sorted(col("sh")).as("native"),
      sort_array(expr(
        "transform(sh, s -> cast(conv(substring(md5(cast(s as binary)), " +
          "1, 15), 16, 10) as bigint))")).as("ref"))
      .collect()
    out.foreach { r =>
      assert(r.getSeq[Long](0) === r.getSeq[Long](1), r.toString)
    }
    // every value fits a positive 60-bit long (DuckDB BIGINT-safe)
    out.foreach(_.getSeq[Long](0).foreach(v =>
      assert(v >= 0L && v < (1L << 60))))
    val conf = "spark.sql.codegen.wholeStage"
    val prev = spark.conf.get(conf)
    try {
      spark.conf.set(conf, "false")
      val interp = rows.select(NativeExprs.md5Prefix60Sorted(col("sh")))
        .collect().map(_.getSeq[Long](0))
      assert(interp.toSeq === out.map(_.getSeq[Long](0)).toSeq)
    } finally spark.conf.set(conf, prev)
  }

  test("Md5PrefixExpr ≡ conv(substring(md5(s),1,hexLen),16,10) for " +
       "hexLen 7/12/15 on ASCII/multi-byte/empty strings; codegen ≡ " +
       "interpreted") {
    val rows = Seq("", "a", "0|evt-123", "xin chào thế giới",
      "😀 emoji", "w|17", "the quick brown fox", "42#7").toDF("s")
    for (hexLen <- Seq(7, 12, 15)) {
      val out = rows.select(
        NativeExprs.md5Prefix(col("s"), hexLen).as("native"),
        expr(s"cast(conv(substring(md5(s), 1, $hexLen), 16, 10) " +
          "as bigint)").as("ref"))
        .collect()
      out.foreach(r => assert(r.getLong(0) === r.getLong(1),
        s"hexLen=$hexLen ${r.toString}"))
      out.foreach(r =>
        assert(r.getLong(0) >= 0L && r.getLong(0) < (1L << (4 * hexLen))))
    }
    // null propagates like the built-in pipeline
    val withNull = Seq(Some("x"), None).toDF("s")
    val nulls = withNull.select(
      NativeExprs.md5Prefix(col("s"), 7).as("native"),
      expr("cast(conv(substring(md5(s), 1, 7), 16, 10) as bigint)")
        .as("ref")).collect()
    nulls.foreach { r =>
      assert(r.isNullAt(0) === r.isNullAt(1))
      if (!r.isNullAt(0)) assert(r.getLong(0) === r.getLong(1))
    }
    val conf = "spark.sql.codegen.wholeStage"
    val prev = spark.conf.get(conf)
    try {
      spark.conf.set(conf, "false")
      val interp = rows.select(NativeExprs.md5Prefix(col("s"), 7))
        .collect().map(_.getLong(0)).toSeq
      val gen = rows.select(NativeExprs.md5Prefix(col("s"), 7))
      spark.conf.set(conf, "true")
      assert(gen.collect().map(_.getLong(0)).toSeq === interp)
    } finally spark.conf.set(conf, prev)
  }

  test("SortedLongIntersectCountExpr: multiset merge count incl. " +
       "duplicates, empties, disjoint; codegen ≡ interpreted; " +
       "upper-bounds the distinct-string intersection under collisions") {
    val rows = Seq(
      (Seq(1L, 2L, 3L, 7L), Seq(2L, 3L, 7L, 9L)),       // overlap 3
      (Seq(1L, 1L, 2L), Seq(1L, 1L, 1L, 2L)),           // multiset: 3
      (Seq.empty[Long], Seq(1L)),                       // empty left
      (Seq(5L), Seq.empty[Long]),                       // empty right
      (Seq(1L, 2L), Seq(3L, 4L))                        // disjoint
    ).toDF("a", "b")
      .select(expr("transform(a, x -> coalesce(x, 0L))").as("a"),
        expr("transform(b, x -> coalesce(x, 0L))").as("b"))
    val got = rows.select(
      NativeExprs.sortedLongIntersectCount(col("a"), col("b")))
      .collect().map(_.getLong(0)).toSeq
    assert(got === Seq(3L, 3L, 0L, 0L, 0L))
    val conf = "spark.sql.codegen.wholeStage"
    val prev = spark.conf.get(conf)
    try {
      spark.conf.set(conf, "false")
      val interp = rows.select(
        NativeExprs.sortedLongIntersectCount(col("a"), col("b")))
        .collect().map(_.getLong(0)).toSeq
      assert(interp === got)
    } finally spark.conf.set(conf, prev)

    // the lossless-gate contract the PPJoin verify relies on: for hash
    // arrays of string sets, multiset hash-intersect ≥ exact string
    // intersect (a collision can only ADD matchable pairs, never hide a
    // shared string) — simulate a colliding hash h(x)=x mod 4
    val setsA = Seq("a", "b", "c", "e")
    val setsB = Seq("b", "c", "d", "f")
    def h(s: String): Long = (s.codePointAt(0) - 'a').toLong % 4L
    val exact = setsA.toSet.intersect(setsB.toSet).size.toLong
    val hashed = {
      val ha = setsA.map(h).sorted
      val hb = setsB.map(h).sorted
      Seq((ha, hb)).toDF("a", "b")
        .select(expr("transform(a, x -> coalesce(x, 0L))").as("a"),
          expr("transform(b, x -> coalesce(x, 0L))").as("b"))
        .select(NativeExprs.sortedLongIntersectCount(col("a"), col("b")))
        .collect().head.getLong(0)
    }
    assert(hashed >= exact,
      s"hash-gate must upper-bound exact ($hashed vs $exact)")
  }
}
