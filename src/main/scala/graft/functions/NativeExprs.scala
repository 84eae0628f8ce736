package graft.functions

import java.security.MessageDigest

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

import graft.ext.Shingles

/** Native Catalyst expressions for the hot per-row loops of the dedup /
  * similarity operators (SURVEY §2.10 `[EXT]`).
  *
  * The same semantics are expressible with built-in higher-order
  * functions (`transform`/`aggregate`/`zip_with`) — and were, first —
  * but those are interpreted (CodegenFallback, no common-subexpression
  * elimination), which made signature computation the bench bottleneck.
  * A tight JVM loop per ROW (not per array element) with a reused
  * MessageDigest is 10–50× faster and keeps the surrounding stage inside
  * whole-stage codegen. Values are bit-identical to the HOF pipeline and
  * to the generated DuckDB oracle SQL.
  *
  * Every expression here implements `doGenCode`, so none splits a
  * whole-stage-codegen span: [[DotProductExpr]] (the per-pair hot path)
  * generates its loop inline; the per-row heavyweights (md5 over
  * shingles, tables×bits×dims projections) generate a single call into
  * the expression instance via `addReferenceObj` — one virtual call per
  * row is noise next to the work inside, and the surrounding stage stays
  * fused.
  */
object NativeExprs {

  private val md5Local = ThreadLocal.withInitial[MessageDigest](() =>
    MessageDigest.getInstance("MD5"))

  /** First 28 bits of md5(s) — numerically equal to
    * `('0x' || substr(md5(s),1,7))::BIGINT` / `conv(substring(md5(s),1,7),
    * 16, 10)`.
    */
  private[functions] def baseHash28(bytes: Array[Byte]): Long = {
    val md = md5Local.get()
    md.reset()
    val d = md.digest(bytes)
    ((d(0) & 0xffL) << 20) | ((d(1) & 0xffL) << 12) |
      ((d(2) & 0xffL) << 4) | ((d(3) & 0xf0L) >>> 4)
  }

  /** 48-bit md5 prefix ≡ `('0x' || substr(md5(s),1,12))::BIGINT` —
    * the portable hash the HLL register family uses (6 bucket bits +
    * 42 rank bits).
    */
  private[functions] def baseHash48(bytes: Array[Byte]): Long = {
    val md = md5Local.get()
    md.reset()
    val d = md.digest(bytes)
    ((d(0) & 0xffL) << 40) | ((d(1) & 0xffL) << 32) |
      ((d(2) & 0xffL) << 24) | ((d(3) & 0xffL) << 16) |
      ((d(4) & 0xffL) << 8) | (d(5) & 0xffL)
  }

  /** First 60 bits of md5(s) — numerically equal to
    * `('0x' || substr(md5(s),1,15))::BIGINT` in DuckDB and
    * `conv(substring(md5(s),1,15),16,10)` in Spark SQL: the portable
    * hash universe the PPJoin verify gate uses (large enough that a
    * collision inside one corpus is a ~n²/2⁶¹ event, small enough to
    * stay a positive BIGINT on both engines).
    */
  private[functions] def baseHash60(bytes: Array[Byte]): Long = {
    val md = md5Local.get()
    md.reset()
    val d = md.digest(bytes)
    ((d(0) & 0xffL) << 52) | ((d(1) & 0xffL) << 44) |
      ((d(2) & 0xffL) << 36) | ((d(3) & 0xffL) << 28) |
      ((d(4) & 0xffL) << 20) | ((d(5) & 0xffL) << 12) |
      ((d(6) & 0xffL) << 4) | ((d(7) & 0xf0L) >>> 4)
  }

  /** Sorted [[baseHash60]] hashes of a string array — the 8-byte verify
    * payload `Dedup.prefixFilterJaccardPairs` ships per candidate side
    * instead of the full shingle strings (the exchange volume that blew
    * the sf3 disk budget). One pass, no intermediate hex strings (the
    * built-in `sort_array(transform(a, s -> conv(substring(md5(s),1,15),
    * 16,10)))` allocates three strings per element and loses
    * containsNull=false); output is ascending with DUPLICATES KEPT, so
    * a multiset merge over two outputs upper-bounds the string
    * intersection (each shared string contributes a matchable pair even
    * under collisions) — exactly the lossless-gate contract the caller's
    * exact confirm stage relies on.
    */
  case class Md5Prefix60SortedExpr(child: Expression)
      extends UnaryExpression {

    override def dataType: DataType =
      ArrayType(LongType, containsNull = false)
    override def prettyName: String = "graft_md5_prefix60_sorted"

    override def checkInputDataTypes(): TypeCheckResult =
      child.dataType match {
        case ArrayType(StringType, false) => TypeCheckResult.TypeCheckSuccess
        case t => TypeCheckResult.TypeCheckFailure(
          s"$prettyName requires array<string> with non-null elements, " +
            s"got ${t.catalogString}")
      }

    def evalTokens(a: ArrayData): ArrayData = {
      val n = a.numElements()
      val out = new Array[Long](n)
      var i = 0
      while (i < n) {
        out(i) = baseHash60(a.getUTF8String(i).getBytes)
        i += 1
      }
      java.util.Arrays.sort(out)
      new GenericArrayData(out)
    }

    override def nullSafeEval(input: Any): Any =
      evalTokens(input.asInstanceOf[ArrayData])

    override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val ref = ctx.addReferenceObj("h60Expr", this,
        classOf[Md5Prefix60SortedExpr].getName)
      nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.evalTokens($c);")
    }

    override protected def withNewChildInternal(c: Expression): Expression =
      copy(child = c)
  }

  /** First `4·hexLen` bits of md5(s) as a long — numerically equal to
    * `conv(substring(md5(s),1,hexLen),16,10)` in Spark SQL and
    * `('0x' || substr(md5(s),1,hexLen))::BIGINT` in DuckDB, without
    * materializing the 32-char hex string (the built-in pipeline
    * allocates the hex string plus a substring slice and re-parses the
    * digits per row — measured r16: ~1.5 s of q194's 4.6 s sf0.1 wall
    * across its 3.2M-row bootstrap explode was exactly this pipeline).
    * `hexLen ≤ 15` keeps the value a positive long on both engines.
    */
  case class Md5PrefixExpr(child: Expression, hexLen: Int)
      extends UnaryExpression {
    require(hexLen >= 1 && hexLen <= 15, s"hexLen $hexLen outside [1,15]")

    override def dataType: DataType = LongType
    override def prettyName: String = "graft_md5_prefix"

    override def checkInputDataTypes(): TypeCheckResult =
      child.dataType match {
        case StringType => TypeCheckResult.TypeCheckSuccess
        case t => TypeCheckResult.TypeCheckFailure(
          s"$prettyName requires string, got ${t.catalogString}")
      }

    def evalOne(s: UTF8String): Long = {
      val md = md5Local.get()
      md.reset()
      val d = md.digest(s.getBytes)
      var v = 0L
      var i = 0
      while (i < hexLen) {
        val b = d(i >> 1) & 0xff
        v = (v << 4) | (if ((i & 1) == 0) b >>> 4 else b & 0xf)
        i += 1
      }
      v
    }

    override def nullSafeEval(input: Any): Any =
      evalOne(input.asInstanceOf[UTF8String])

    override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val ref = ctx.addReferenceObj("md5PfxExpr", this,
        classOf[Md5PrefixExpr].getName)
      nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.evalOne($c);")
    }

    override protected def withNewChildInternal(c: Expression): Expression =
      copy(child = c)
  }

  /** Multiset |A ∩ B| of two ascending long arrays by linear merge —
    * the 8-byte-element sibling of [[SortedIntersectCountExpr]] for
    * [[Md5Prefix60SortedExpr]] payloads. Multiset semantics (a value
    * occurring a times in A and b times in B contributes min(a,b)),
    * which is what makes the hashed count an UPPER bound of the exact
    * distinct-string intersection under collisions. Unsorted input
    * silently undercounts — private engine primitive, not a general
    * function.
    */
  case class SortedLongIntersectCountExpr(left: Expression,
                                          right: Expression)
      extends BinaryExpression {

    override def dataType: DataType = LongType
    override def prettyName: String = "graft_sorted_long_intersect_count"

    private def elemOk(e: Expression): Boolean = e.dataType match {
      case ArrayType(LongType, containsNull) => !containsNull
      case _ => false
    }

    override def checkInputDataTypes(): TypeCheckResult =
      if (elemOk(left) && elemOk(right)) TypeCheckResult.TypeCheckSuccess
      else TypeCheckResult.TypeCheckFailure(
        s"$prettyName: both operands must be array<bigint> with " +
          s"non-null elements, got ${left.dataType.catalogString} / " +
          s"${right.dataType.catalogString}")

    def evalArrays(a: ArrayData, b: ArrayData): Long = {
      val na = a.numElements()
      val nb = b.numElements()
      var i = 0
      var j = 0
      var c = 0L
      while (i < na && j < nb) {
        val va = a.getLong(i)
        val vb = b.getLong(j)
        if (va == vb) { c += 1; i += 1; j += 1 }
        else if (va < vb) i += 1
        else j += 1
      }
      c
    }

    override def nullSafeEval(a: Any, b: Any): Any =
      evalArrays(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

    override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val ref = ctx.addReferenceObj("slicExpr", this,
        classOf[SortedLongIntersectCountExpr].getName)
      nullSafeCodeGen(ctx, ev,
        (a, b) => s"${ev.value} = $ref.evalArrays($a, $b);")
    }

    override protected def withNewChildrenInternal(
        l: Expression, r: Expression): Expression = copy(left = l, right = r)
  }

  /** MinHash signature over k-word shingles of a token array: element i =
    * min over shingles of (a_i·h + b_i) mod P with h = [[baseHash28]].
    * Exactly [[Shingles.minHashSignature]]'s HOF semantics (whole-doc
    * shingle when the doc has ≤ k tokens, single empty shingle when it
    * has none).
    */
  case class MinHashSignatureExpr(child: Expression, k: Int, numHashes: Int)
      extends UnaryExpression {

    override def dataType: DataType = ArrayType(LongType, containsNull = false)
    override def prettyName: String = "graft_minhash_signature"

    private val as = Array.tabulate(numHashes)(Shingles.affineA)
    private val bs = Array.tabulate(numHashes)(Shingles.affineB)

    def evalTokens(toks: ArrayData): ArrayData =
      nullSafeEval(toks).asInstanceOf[ArrayData]

    override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val ref = ctx.addReferenceObj("minhashExpr", this,
        classOf[MinHashSignatureExpr].getName)
      nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.evalTokens($c);")
    }

    override def nullSafeEval(input: Any): Any = {
      val toks = input.asInstanceOf[ArrayData]
      val n = toks.numElements()
      val words = new Array[UTF8String](n)
      var i = 0
      while (i < n) { words(i) = toks.getUTF8String(i); i += 1 }

      val mins = Array.fill(numHashes)(Shingles.MinHashP)
      val numShingles = if (n <= k) 1 else n - k + 1
      val width = if (n <= k) n else k
      val sb = new java.lang.StringBuilder(64)
      var s = 0
      while (s < numShingles) {
        sb.setLength(0)
        var j = 0
        while (j < width) {
          if (j > 0) sb.append(' ')
          sb.append(words(s + j).toString)
          j += 1
        }
        val x = baseHash28(
          sb.toString.getBytes(java.nio.charset.StandardCharsets.UTF_8))
        var h = 0
        while (h < numHashes) {
          val v = (x * as(h) + bs(h)) % Shingles.MinHashP
          if (v < mins(h)) mins(h) = v
          h += 1
        }
        s += 1
      }
      new GenericArrayData(mins)
    }

    override protected def withNewChildInternal(c: Expression): Expression =
      copy(child = c)
  }

  /** Sequential-fold dot product of two numeric arrays in double
    * precision — the bit-exact twin of
    * `aggregate(zip_with(a, b, (x, y) => x*y), 0.0, _+_)` and of the
    * oracle's explicit left-associated sum.
    *
    * Length mismatch is an ERROR (fail-fast `IllegalArgumentException`),
    * not silent min-length truncation: a truncated dot product is a
    * plausible-looking wrong similarity, the worst failure mode for a
    * dedup/ANN pipeline. Unsupported element types (decimal, short, byte,
    * …) fail at ANALYSIS via `checkInputDataTypes`, not with a runtime
    * MatchError mid-job.
    */
  case class DotProductExpr(left: Expression, right: Expression)
      extends BinaryExpression {

    override def dataType: DataType = DoubleType
    override def prettyName: String = "graft_dot"

    private def elemType(e: Expression) = e.dataType match {
      case ArrayType(t, _) => t
      case t               => t
    }

    private val supported: Set[DataType] =
      Set(FloatType, DoubleType, LongType, IntegerType)

    override def checkInputDataTypes(): TypeCheckResult =
      (left.dataType, right.dataType) match {
        case (ArrayType(l, _), ArrayType(r, _))
            if supported(l) && supported(r) =>
          TypeCheckResult.TypeCheckSuccess
        case (l, r) => TypeCheckResult.TypeCheckFailure(
          s"$prettyName requires two arrays with float/double/long/int " +
            s"elements, got ${l.sql} and ${r.sql}")
      }

    private def lenMismatch(n: Int, m: Int): Nothing =
      throw new IllegalArgumentException(
        s"graft_dot: vector length mismatch ($n vs $m) — operands must " +
          "share dimensionality; truncating would silently corrupt " +
          "similarity scores")

    override def nullSafeEval(a: Any, b: Any): Any = {
      val x = a.asInstanceOf[ArrayData]
      val y = b.asInstanceOf[ArrayData]
      val n = x.numElements()
      if (y.numElements() != n) lenMismatch(n, y.numElements())
      val (lt, rt) = (elemType(left), elemType(right))
      var acc = 0.0
      var i = 0
      while (i < n) {
        val xv = lt match {
          case FloatType  => x.getFloat(i).toDouble
          case DoubleType => x.getDouble(i)
          case LongType   => x.getLong(i).toDouble
          case IntegerType => x.getInt(i).toDouble
        }
        val yv = rt match {
          case FloatType  => y.getFloat(i).toDouble
          case DoubleType => y.getDouble(i)
          case LongType   => y.getLong(i).toDouble
          case IntegerType => y.getInt(i).toDouble
        }
        acc += xv * yv
        i += 1
      }
      acc
    }

    override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, (a, b) => {
        val n = ctx.freshName("n")
        val i = ctx.freshName("i")
        val acc = ctx.freshName("acc")
        def get(t: DataType, arr: String): String = t match {
          case FloatType   => s"(double) $arr.getFloat($i)"
          case DoubleType  => s"$arr.getDouble($i)"
          case LongType    => s"(double) $arr.getLong($i)"
          case IntegerType => s"(double) $arr.getInt($i)"
        }
        val err = classOf[IllegalArgumentException].getName
        s"""
           |final int $n = $a.numElements();
           |if ($b.numElements() != $n) {
           |  throw new $err("graft_dot: vector length mismatch (" + $n +
           |    " vs " + $b.numElements() + ") - operands must share " +
           |    "dimensionality");
           |}
           |double $acc = 0.0;
           |for (int $i = 0; $i < $n; $i++) {
           |  $acc += ${get(elemType(left), a)} * ${get(elemType(right), b)};
           |}
           |${ev.value} = $acc;
           |""".stripMargin
      })

    override protected def withNewChildrenInternal(
        l: Expression, r: Expression): Expression = copy(left = l, right = r)
  }

  /** All `tables` sign-LSH bucket keys of a numeric vector in ONE pass:
    * element t is the `bits`-char bit string of table t, whose hyperplane
    * i has the ±1 Rademacher weights
    * `Similarity.hyperplaneSigns(seed + t, i, dims)`. Bit-identical to
    * the column-composed projection chain
    * ([[graft.ext.Similarity.signBucketCols]]) and to the DuckDB oracle's
    * left-associated ± chain — the fold here uses `acc ± v(j)`, and IEEE
    * 754 guarantees `acc + (-v) ≡ acc - v`.
    *
    * Why native: the composed form is `tables × bits × dims` element_at
    * casts — 2048 terms at the defaults — whose generated Java blows
    * janino's method limits, kicking the whole stage back to interpreted
    * mode. Here it is a `dims`-double read followed by add/subtract
    * chains over a precomputed sign table.
    */
  case class SignLshBucketsExpr(child: Expression, bits: Int, dims: Int,
                                seed: Long, tables: Int)
      extends UnaryExpression {
    require(bits >= 1 && dims >= 1 && tables >= 1,
      "bits, dims and tables must all be >= 1")

    override def dataType: DataType =
      ArrayType(StringType, containsNull = false)
    override def prettyName: String = "graft_sign_lsh_buckets"

    override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
      case ArrayType(FloatType | DoubleType, _) =>
        TypeCheckResult.TypeCheckSuccess
      case t => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires array<float> or array<double>, got ${t.sql}")
    }

    // row (t*bits + i) = hyperplane i of table t
    @transient private lazy val signs: Array[Array[Int]] =
      Array.tabulate(tables * bits) { r =>
        graft.ext.Similarity.hyperplaneSigns(seed + r / bits, r % bits, dims)
      }

    @transient private lazy val isFloat =
      child.dataType.asInstanceOf[ArrayType].elementType == FloatType

    def evalVec(vec: ArrayData): ArrayData = {
      val n = vec.numElements()
      if (n != dims) throw new IllegalArgumentException(
        s"graft_sign_lsh_buckets: vector has $n dims, hyperplanes have " +
          s"$dims — bucketing a truncated projection would silently " +
          "degrade recall")
      val v = new Array[Double](n)
      var j = 0
      while (j < n) {
        v(j) = if (isFloat) vec.getFloat(j).toDouble else vec.getDouble(j)
        j += 1
      }
      val out = new Array[AnyRef](tables)
      val sb = new java.lang.StringBuilder(bits)
      var t = 0
      while (t < tables) {
        sb.setLength(0)
        var i = 0
        while (i < bits) {
          val w = signs(t * bits + i)
          var acc = if (w(0) > 0) v(0) else -v(0)
          var k = 1
          while (k < dims) {
            if (w(k) > 0) acc += v(k) else acc -= v(k)
            k += 1
          }
          sb.append(if (acc >= 0) '1' else '0')
          i += 1
        }
        out(t) = UTF8String.fromString(sb.toString)
        t += 1
      }
      new GenericArrayData(out)
    }

    override def nullSafeEval(input: Any): Any =
      evalVec(input.asInstanceOf[ArrayData])

    override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val ref = ctx.addReferenceObj("lshExpr", this,
        classOf[SignLshBucketsExpr].getName)
      nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.evalVec($c);")
    }

    override protected def withNewChildInternal(c: Expression): Expression =
      copy(child = c)
  }

  /** k-word shingles of a token array as strings, optionally distinct —
    * the tight-loop twin of [[Shingles.wordShingles]] (whole-doc shingle
    * for docs with ≤ k tokens).
    */
  case class WordShinglesExpr(child: Expression, k: Int, distinct: Boolean)
      extends UnaryExpression {

    override def dataType: DataType =
      ArrayType(StringType, containsNull = false)
    override def prettyName: String = "graft_word_shingles"

    def evalTokens(toks: ArrayData): ArrayData =
      nullSafeEval(toks).asInstanceOf[ArrayData]

    override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val ref = ctx.addReferenceObj("shinglesExpr", this,
        classOf[WordShinglesExpr].getName)
      nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.evalTokens($c);")
    }

    override def nullSafeEval(input: Any): Any = {
      val toks = input.asInstanceOf[ArrayData]
      val n = toks.numElements()
      val words = new Array[UTF8String](n)
      var i = 0
      while (i < n) { words(i) = toks.getUTF8String(i); i += 1 }
      val numShingles = if (n <= k) 1 else n - k + 1
      val width = if (n <= k) n else k
      val out = new Array[AnyRef](numShingles)
      val seen = if (distinct) new java.util.LinkedHashSet[UTF8String]() else null
      val sb = new java.lang.StringBuilder(64)
      var s = 0
      while (s < numShingles) {
        sb.setLength(0)
        var j = 0
        while (j < width) {
          if (j > 0) sb.append(' ')
          sb.append(words(s + j).toString)
          j += 1
        }
        val u = UTF8String.fromString(sb.toString)
        if (distinct) seen.add(u) else out(s) = u
        s += 1
      }
      if (distinct)
        new GenericArrayData(seen.toArray.asInstanceOf[Array[AnyRef]])
      else new GenericArrayData(out)
    }

    override protected def withNewChildInternal(c: Expression): Expression =
      copy(child = c)
  }

  /** Exact |A ∩ B| of two arrays SORTED by the same (long, string) key —
    * a linear merge instead of `size(array_intersect(...))`'s per-row
    * hash-set build + result-array materialization. The motivating hot
    * path is PPJoin verification (`Dedup.prefixFilterJaccardPairs`):
    * per-doc shingle arrays arrive already sorted in the global
    * (document-frequency, shingle) order, and the verify stage is
    * CPU-bound on millions of candidate intersections (measured at
    * sf1.0: broadcast vs shuffled verify joins identical at ~16 s — the
    * cost is the intersects, not the exchange). The merge resolves most
    * comparisons on the LONG first field (document frequencies rarely
    * tie) and touches string bytes only on ties; nothing allocates.
    *
    * Caller contract: both arrays sorted ascending by (field 0, field 1)
    * under Catalyst's struct ordering (`sort_array` output qualifies;
    * string order is UTF8String binary order), elements distinct within
    * each array. Unsorted input silently undercounts — this is a
    * private engine primitive, not a general function.
    */
  case class SortedIntersectCountExpr(left: Expression, right: Expression)
      extends BinaryExpression {

    override def dataType: DataType = LongType
    override def prettyName: String = "graft_sorted_intersect_count"

    // containsNull must be FALSE: the merge dereferences each struct
    // element unconditionally, so a nullable-element array would NPE at
    // runtime — reject it at analysis time instead. (collect_list /
    // sort_array output, the only engine callers, already satisfies it.)
    private def elemOk(e: Expression): Boolean = e.dataType match {
      case ArrayType(StructType(Array(f0, f1)), containsNull) =>
        !containsNull && f0.dataType == LongType &&
          f1.dataType == StringType
      case _ => false
    }

    override def checkInputDataTypes(): TypeCheckResult =
      if (elemOk(left) && elemOk(right)) TypeCheckResult.TypeCheckSuccess
      else TypeCheckResult.TypeCheckFailure(
        s"$prettyName: both operands must be " +
          s"array<struct<long,string>> with non-null elements, " +
          s"got ${left.dataType.catalogString} / " +
          s"${right.dataType.catalogString}")

    def evalArrays(a: ArrayData, b: ArrayData): Long = {
      val na = a.numElements()
      val nb = b.numElements()
      var i = 0
      var j = 0
      var c = 0L
      while (i < na && j < nb) {
        val ra = a.getStruct(i, 2)
        val rb = b.getStruct(j, 2)
        val da = ra.getLong(0)
        val db = rb.getLong(0)
        val cmp =
          if (da < db) -1
          else if (da > db) 1
          else ra.getUTF8String(1).compareTo(rb.getUTF8String(1))
        if (cmp == 0) { c += 1; i += 1; j += 1 }
        else if (cmp < 0) i += 1
        else j += 1
      }
      c
    }

    override def nullSafeEval(a: Any, b: Any): Any =
      evalArrays(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

    override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val ref = ctx.addReferenceObj("sicExpr", this,
        classOf[SortedIntersectCountExpr].getName)
      nullSafeCodeGen(ctx, ev,
        (a, b) => s"${ev.value} = $ref.evalArrays($a, $b);")
    }

    override protected def withNewChildrenInternal(
        l: Expression, r: Expression): Expression = copy(left = l, right = r)
  }

  /** Reused per-thread scratch for [[BoundedLevenshteinExpr]]: the
    * pattern bitmask table is rebuilt per ROW (self-join — both sides
    * vary), so it must cost stores, not allocations. ASCII code points
    * hit a stamped 128-slot array (stamp mismatch ⇒ slot is logically
    * zero — no clearing pass between rows); anything above ASCII falls
    * into a lazily-created map that IS cleared, but only on rows that
    * actually contain non-ASCII.
    */
  private final class LevScratch {
    val peq = new Array[Long](128)
    // Long generation counter: an Int would wrap after 2^31 evals on one
    // executor thread, letting a stale stamp equal the current gen and
    // OR stale pattern bits into a fresh row. A Long cannot wrap within
    // any physical run (2^63 evals at 1/ns ≈ 292 years).
    val stamp = new Array[Long](128)
    var gen = 0L
    var wide: java.util.HashMap[Integer, java.lang.Long] = null
    val cpA = new Array[Int](64)
    val cpB = new Array[Int](64)
  }

  private val levLocal =
    ThreadLocal.withInitial[LevScratch](() => new LevScratch)

  /** Levenshtein distance capped at `bound`: returns the EXACT unit-cost
    * edit distance whenever it is ≤ `bound`, and any value > `bound`
    * (callers must treat the result as a predicate `dist ≤ bound` plus
    * the exact distance on kept rows — exactly the shape of a
    * similarity-join verify stage, `Dedup.fuzzyBlockedPairs`).
    *
    * For inputs of ≤ 64 code points (the only hot case: the fuzzy join
    * compares fixed 40-char prefixes) the distance comes from Myers'
    * bit-parallel algorithm (Myers, "A fast bit-vector algorithm for
    * approximate string matching based on dynamic programming", JACM
    * 1999; the Hyyrö 2001 formulation): one word of bit-ops per text
    * character instead of an O(n·m) DP matrix — ~40 iterations of ~15
    * bitwise ops where the built-in `levenshtein()` fills 1,600 cells
    * with per-cell branching. The result is the exact full distance (the
    * bound only gates the cheap |n−m| pre-check). Longer inputs — never
    * produced by the engine's callers — fall back to a two-row DP with
    * early exit once a row's minimum exceeds `bound`.
    *
    * Distances are over Unicode CODE POINTS (surrogate pairs count
    * once), matching both engines' `levenshtein` on every string the
    * corpus contains.
    */
  case class BoundedLevenshteinExpr(left: Expression, right: Expression,
                                    bound: Int)
      extends BinaryExpression {

    require(bound >= 0, s"bound $bound must be >= 0")

    override def dataType: DataType = LongType
    override def prettyName: String = "graft_bounded_levenshtein"

    override def checkInputDataTypes(): TypeCheckResult =
      (left.dataType, right.dataType) match {
        case (StringType, StringType) => TypeCheckResult.TypeCheckSuccess
        case (l, r) => TypeCheckResult.TypeCheckFailure(
          s"$prettyName requires (string, string), got ${l.sql} / ${r.sql}")
      }

    private def codePoints(s: String, out: Array[Int]): Array[Int] = {
      val n = s.codePointCount(0, s.length)
      val buf = if (n <= out.length) out else new Array[Int](n)
      var i = 0
      var k = 0
      while (i < s.length) {
        val cp = s.codePointAt(i)
        buf(k) = cp
        k += 1
        i += Character.charCount(cp)
      }
      buf
    }

    /** Myers/Hyyrö bit-parallel Levenshtein, pattern length m ≤ 64. */
    private def myers64(p: Array[Int], m: Int, t: Array[Int],
                        n: Int, sc: LevScratch): Int = {
      if (m == 0) return n
      sc.gen += 1
      val gen = sc.gen
      var usedWide = false
      var i = 0
      while (i < m) {
        val c = p(i)
        if (c < 128) {
          if (sc.stamp(c) != gen) { sc.peq(c) = 0L; sc.stamp(c) = gen }
          sc.peq(c) |= 1L << i
        } else {
          if (sc.wide == null)
            sc.wide = new java.util.HashMap[Integer, java.lang.Long]
          if (!usedWide) { sc.wide.clear(); usedWide = true }
          val prev = sc.wide.get(c)
          sc.wide.put(c, if (prev == null) 1L << i else prev | (1L << i))
        }
        i += 1
      }
      var pv = -1L
      var mv = 0L
      var score = m
      val last = 1L << (m - 1)
      var j = 0
      while (j < n) {
        val c = t(j)
        val eq =
          if (c < 128) { if (sc.stamp(c) == gen) sc.peq(c) else 0L }
          else if (usedWide) {
            val v = sc.wide.get(c); if (v == null) 0L else v.longValue()
          } else 0L
        val xv = eq | mv
        val xh = (((eq & pv) + pv) ^ pv) | eq
        var ph = mv | ~(xh | pv)
        var mh = pv & xh
        if ((ph & last) != 0L) score += 1
        if ((mh & last) != 0L) score -= 1
        ph = (ph << 1) | 1L
        mh = mh << 1
        pv = mh | ~(xv | ph)
        mv = ph & xv
        j += 1
      }
      score
    }

    /** Two-row DP with early exit at `bound` — the > 64-code-point
      * fallback only; exact for results ≤ bound, else returns bound+1.
      */
    private def dpBounded(a: Array[Int], na: Int, b: Array[Int],
                          nb: Int): Int = {
      var prev = new Array[Int](nb + 1)
      var cur = new Array[Int](nb + 1)
      var j = 0
      while (j <= nb) { prev(j) = j; j += 1 }
      var i = 1
      while (i <= na) {
        cur(0) = i
        var rowMin = i
        val ca = a(i - 1)
        j = 1
        while (j <= nb) {
          val cost = if (ca == b(j - 1)) 0 else 1
          var v = prev(j - 1) + cost
          val del = prev(j) + 1
          if (del < v) v = del
          val ins = cur(j - 1) + 1
          if (ins < v) v = ins
          cur(j) = v
          if (v < rowMin) rowMin = v
          j += 1
        }
        if (rowMin > bound) return bound + 1
        val tmp = prev; prev = cur; cur = tmp
        i += 1
      }
      math.min(prev(nb), bound + 1)
    }

    def evalDist(a: UTF8String, b: UTF8String): Long = {
      val sa = a.toString
      val sb = b.toString
      val sc = levLocal.get()
      val na = sa.codePointCount(0, sa.length)
      val nb = sb.codePointCount(0, sb.length)
      if (math.abs(na - nb) > bound) return (bound + 1).toLong
      val ca = codePoints(sa, sc.cpA)
      val cb = codePoints(sb, sc.cpB)
      val d =
        if (na <= 64) myers64(ca, na, cb, nb, sc)
        else if (nb <= 64) myers64(cb, nb, ca, na, sc)
        else dpBounded(ca, na, cb, nb)
      d.toLong
    }

    override def nullSafeEval(a: Any, b: Any): Any =
      evalDist(a.asInstanceOf[UTF8String], b.asInstanceOf[UTF8String])

    override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val ref = ctx.addReferenceObj("blevExpr", this,
        classOf[BoundedLevenshteinExpr].getName)
      nullSafeCodeGen(ctx, ev,
        (a, b) => s"${ev.value} = $ref.evalDist($a, $b);")
    }

    override protected def withNewChildrenInternal(
        l: Expression, r: Expression): Expression = copy(left = l, right = r)
  }

  private val hexDigits = "0123456789abcdef".toCharArray

  private def md5Hex(bytes: Array[Byte]): String = {
    val md = md5Local.get()
    md.reset()
    val d = md.digest(bytes)
    val out = new Array[Char](32)
    var i = 0
    while (i < 16) {
      out(2 * i) = hexDigits((d(i) >> 4) & 0xf)
      out(2 * i + 1) = hexDigits(d(i) & 0xf)
      i += 1
    }
    new String(out)
  }

  /** Minimum `md5('0|' + shingle)` hex digest over the k-word shingles —
    * the 1-hash MinHash rolling fingerprint
    * ([[graft.ext.TextStats.rollingFingerprint]]'s tight-loop twin).
    */
  case class RollingFingerprintExpr(child: Expression, k: Int)
      extends UnaryExpression {

    override def dataType: DataType = StringType
    override def prettyName: String = "graft_rolling_fingerprint"

    def evalTokens(toks: ArrayData): UTF8String =
      nullSafeEval(toks).asInstanceOf[UTF8String]

    override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val ref = ctx.addReferenceObj("fingerprintExpr", this,
        classOf[RollingFingerprintExpr].getName)
      nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.evalTokens($c);")
    }

    override def nullSafeEval(input: Any): Any = {
      val toks = input.asInstanceOf[ArrayData]
      val n = toks.numElements()
      val words = new Array[UTF8String](n)
      var i = 0
      while (i < n) { words(i) = toks.getUTF8String(i); i += 1 }
      val numShingles = if (n <= k) 1 else n - k + 1
      val width = if (n <= k) n else k
      var min: String = null
      val sb = new java.lang.StringBuilder(64)
      var s = 0
      while (s < numShingles) {
        sb.setLength(0)
        sb.append("0|")
        var j = 0
        while (j < width) {
          if (j > 0) sb.append(' ')
          sb.append(words(s + j).toString)
          j += 1
        }
        val h = md5Hex(
          sb.toString.getBytes(java.nio.charset.StandardCharsets.UTF_8))
        if (min == null || h.compareTo(min) < 0) min = h
        s += 1
      }
      UTF8String.fromString(min)
    }

    override protected def withNewChildInternal(c: Expression): Expression =
      copy(child = c)
  }

  /** SimHash bit string over token digests: token votes per bit via its
    * md5 hex nibble (≥ 8 → +1, else −1); bit = sign of the vote sum.
    * [[graft.ext.Dedup.simhash]]'s tight-loop twin.
    */
  case class SimHashExpr(child: Expression, bits: Int)
      extends UnaryExpression {

    override def dataType: DataType = StringType
    override def prettyName: String = "graft_simhash"

    def evalTokens(toks: ArrayData): UTF8String =
      nullSafeEval(toks).asInstanceOf[UTF8String]

    override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val ref = ctx.addReferenceObj("simhashExpr", this,
        classOf[SimHashExpr].getName)
      nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.evalTokens($c);")
    }

    override def nullSafeEval(input: Any): Any = {
      val toks = input.asInstanceOf[ArrayData]
      val n = toks.numElements()
      val votes = new Array[Long](bits)
      var i = 0
      while (i < n) {
        val h = md5Hex(("0|" + toks.getUTF8String(i).toString)
          .getBytes(java.nio.charset.StandardCharsets.UTF_8))
        var b = 0
        while (b < bits) {
          if (Character.digit(h.charAt(b), 16) >= 8) votes(b) += 1
          else votes(b) -= 1
          b += 1
        }
        i += 1
      }
      val sb = new java.lang.StringBuilder(bits)
      var b = 0
      while (b < bits) {
        sb.append(if (votes(b) > 0) '1' else '0')
        b += 1
      }
      UTF8String.fromString(sb.toString)
    }

    override protected def withNewChildInternal(c: Expression): Expression =
      copy(child = c)
  }

  /** The `nprobe` nearest centroid ids for a vector — max cosine, ties to
    * the LOWEST centroid id — as a pure per-row expression over
    * driver-collected centroids (an `addReferenceObj` constant, shipped
    * with the task closure exactly like a broadcast variable).
    *
    * This replaces the former assignment plan — crossJoin(broadcast
    * centroids) → groupBy(id).max_by → join back to the vectors — whose
    * join-back was a corpus-wide shuffle + sort-merge join at scale. The
    * assignment is a pure function of (vec, centroids), so no aggregation
    * is needed at all: one codegen'd call per row, corpus never shuffled.
    *
    * Bit-exactness: cosine is computed exactly as
    * `dot(v,c) / (sqrt(dot(v,v)) * sqrt(dot(c,c)))` with the same
    * sequential index-order folds as [[DotProductExpr]], and comparisons
    * use `java.lang.Double.compare`, which orders NaN above +Inf — the
    * same total order Spark's `max_by` struct comparison uses — so cells
    * are identical to the former aggregation formulation and to the SQL
    * oracle. Centroid norms are precomputed once per task from the same
    * fold, so per-row cost is one dot product per centroid.
    *
    * `nprobe == 1` evaluates as a scalar LONG (the common index-build
    * path: no array allocation per row); `nprobe > 1` as array<long>
    * ordered by (cosine desc, id asc), truncated to the centroid count.
    *
    * Centroids are `IndexedSeq`s, not raw arrays: case-class equality on
    * arrays is by REFERENCE, which would make two structurally identical
    * assignments never `semanticEquals` and defeat canonicalization /
    * common-subexpression elimination. The hot loop still runs over
    * flat arrays (transient per-task copies below). The matrix ships in
    * the expression tree via `addReferenceObj` — the same per-task cost
    * class as a broadcast for a quantizer-sized (nlist × dims) constant.
    */
  case class IvfCellsExpr(child: Expression, centIds: IndexedSeq[Long],
                          centVecs: IndexedSeq[IndexedSeq[Double]],
                          nprobe: Int)
      extends UnaryExpression {
    require(centIds.nonEmpty && centIds.length == centVecs.length,
      "graft_ivf_cells needs a non-empty centroid set with one id per vector")
    require(centVecs.forall(_.length == centVecs(0).length),
      "graft_ivf_cells centroids must share dimensionality")
    require(nprobe >= 1, "nprobe must be >= 1")

    override def dataType: DataType =
      if (nprobe == 1) LongType else ArrayType(LongType, containsNull = false)
    override def prettyName: String = "graft_ivf_cells"

    override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
      case ArrayType(FloatType | DoubleType, _) =>
        TypeCheckResult.TypeCheckSuccess
      case t => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires array<float> or array<double>, got ${t.sql}")
    }

    @transient private lazy val isFloat =
      child.dataType.asInstanceOf[ArrayType].elementType == FloatType
    @transient private lazy val dims = centVecs(0).length
    // flat-array copies for the per-row loop (Seq apply() in the hot
    // path would box/indirect); built once per task on first use
    @transient private lazy val cIds: Array[Long] = centIds.toArray
    @transient private lazy val cVecs: Array[Array[Double]] =
      centVecs.map(_.toArray).toArray
    @transient private lazy val centNorms: Array[Double] = cVecs.map { c =>
      var acc = 0.0
      var i = 0
      while (i < c.length) { acc += c(i) * c(i); i += 1 }
      math.sqrt(acc)
    }

    // strict ordering: (cosine desc, id asc); Double.compare for Spark's
    // NaN-highest total order
    private def better(cos: Double, id: Long, thanCos: Double,
                       thanId: Long): Boolean = {
      val c = java.lang.Double.compare(cos, thanCos)
      c > 0 || (c == 0 && id < thanId)
    }

    /** top-`nprobe` (id, cos) by insertion into a sorted buffer — nlist is
      * small (a quantizer, not the corpus) and nprobe smaller still.
      * Returns the filled prefix length.
      */
    private def topCells(vec: ArrayData, outIds: Array[Long],
                         outCos: Array[Double]): Int = {
      val n = vec.numElements()
      if (n != dims) throw new IllegalArgumentException(
        s"graft_ivf_cells: vector has $n dims, centroids have $dims — " +
          "assigning a truncated projection would silently corrupt cells")
      val v = new Array[Double](n)
      var i = 0
      while (i < n) {
        v(i) = if (isFloat) vec.getFloat(i).toDouble else vec.getDouble(i)
        i += 1
      }
      var vn = 0.0
      i = 0
      while (i < n) { vn += v(i) * v(i); i += 1 }
      val vNorm = math.sqrt(vn)
      var filled = 0
      var c = 0
      while (c < cIds.length) {
        val cv = cVecs(c)
        var acc = 0.0
        i = 0
        while (i < dims) { acc += v(i) * cv(i); i += 1 }
        val cos = acc / (vNorm * centNorms(c))
        val id = cIds(c)
        var pos = filled
        while (pos > 0 && better(cos, id, outCos(pos - 1), outIds(pos - 1)))
          pos -= 1
        if (pos < nprobe) {
          var j = math.min(filled, nprobe - 1)
          while (j > pos) {
            outCos(j) = outCos(j - 1); outIds(j) = outIds(j - 1); j -= 1
          }
          outCos(pos) = cos
          outIds(pos) = id
          if (filled < nprobe) filled += 1
        }
        c += 1
      }
      filled
    }

    def evalCell(vec: ArrayData): Long = {
      val ids = new Array[Long](1)
      val cos = new Array[Double](1)
      topCells(vec, ids, cos)
      ids(0)
    }

    def evalCells(vec: ArrayData): ArrayData = {
      val ids = new Array[Long](nprobe)
      val cos = new Array[Double](nprobe)
      val filled = topCells(vec, ids, cos)
      new GenericArrayData(if (filled == nprobe) ids else ids.take(filled))
    }

    override def nullSafeEval(input: Any): Any = {
      val vec = input.asInstanceOf[ArrayData]
      if (nprobe == 1) evalCell(vec) else evalCells(vec)
    }

    override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val ref = ctx.addReferenceObj("ivfCellsExpr", this,
        classOf[IvfCellsExpr].getName)
      val call = if (nprobe == 1) "evalCell" else "evalCells"
      nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.$call($c);")
    }

    override protected def withNewChildInternal(c: Expression): Expression =
      copy(child = c)
  }

  /** Per-probe PQ/ADC distance tables: for subspace m, a map
    * `code → dot(vec[m·subDims+1 .. (m+1)·subDims], centroid)` over every
    * codebook centroid — `subspaces` maps built in one tight loop per
    * row. Partial dots are left-associated double sums (bit-reproducible
    * by the oracle's explicit `a*b + a*b + …` chains). A literal
    * `map(...)` expression tree with subspaces × codebookSize × subDims
    * product terms generates pathological Java at production codebook
    * sizes; this stays one reference-object call.
    */
  case class PqAdcExpr(child: Expression,
                       centIds: IndexedSeq[IndexedSeq[Long]],
                       centVecs: IndexedSeq[IndexedSeq[IndexedSeq[Double]]])
      extends UnaryExpression {
    require(centIds.nonEmpty && centIds.length == centVecs.length,
      "graft_pq_adc needs one codebook per subspace")
    require(centVecs.forall(b => b.nonEmpty &&
      b.forall(_.length == centVecs(0)(0).length)),
      "graft_pq_adc codebooks must share subspace dimensionality")

    override def dataType: DataType = ArrayType(
      MapType(LongType, DoubleType, valueContainsNull = false),
      containsNull = false)
    override def prettyName: String = "graft_pq_adc"

    override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
      case ArrayType(FloatType | DoubleType, _) =>
        TypeCheckResult.TypeCheckSuccess
      case t => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires array<float> or array<double>, got ${t.sql}")
    }

    @transient private lazy val isFloat =
      child.dataType.asInstanceOf[ArrayType].elementType == FloatType
    @transient private lazy val subDims = centVecs(0)(0).length
    @transient private lazy val dims = centVecs.length * subDims
    @transient private lazy val cIds: Array[Array[Long]] =
      centIds.map(_.toArray).toArray
    @transient private lazy val cVecs: Array[Array[Array[Double]]] =
      centVecs.map(_.map(_.toArray).toArray).toArray

    def evalTables(vec: ArrayData): ArrayData = {
      val n = vec.numElements()
      if (n != dims) throw new IllegalArgumentException(
        s"graft_pq_adc: vector has $n dims, codebooks cover $dims")
      val v = new Array[Double](n)
      var i = 0
      while (i < n) {
        v(i) = if (isFloat) vec.getFloat(i).toDouble else vec.getDouble(i)
        i += 1
      }
      val maps = new Array[AnyRef](cIds.length)
      var m = 0
      while (m < cIds.length) {
        val off = m * subDims
        val book = cVecs(m)
        val vals = new Array[Double](book.length)
        var c = 0
        while (c < book.length) {
          val cv = book(c)
          var acc = 0.0
          var j = 0
          while (j < subDims) { acc += v(off + j) * cv(j); j += 1 }
          vals(c) = acc
          c += 1
        }
        maps(m) = new org.apache.spark.sql.catalyst.util.ArrayBasedMapData(
          new GenericArrayData(cIds(m)), new GenericArrayData(vals))
        m += 1
      }
      new GenericArrayData(maps)
    }

    override def nullSafeEval(input: Any): Any =
      evalTables(input.asInstanceOf[ArrayData])

    override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val ref = ctx.addReferenceObj("pqAdcExpr", this,
        classOf[PqAdcExpr].getName)
      nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.evalTables($c);")
    }

    override protected def withNewChildInternal(c: Expression): Expression =
      copy(child = c)
  }

  /** Marker-token language ID over lowercased tokens: count hits per
    * language, argmax with declaration-order tie-break —
    * [[graft.ext.TextStats.langId]]'s tight-loop twin (one pass over the
    * tokens against hash sets instead of `langs × tokens` interpreted
    * array_contains scans).
    */
  case class LangIdExpr(child: Expression,
                        markers: Seq[(String, Seq[String])])
      extends UnaryExpression {

    override def dataType: DataType = StringType
    override def prettyName: String = "graft_lang_id"

    def evalTokens(toks: ArrayData): UTF8String =
      nullSafeEval(toks).asInstanceOf[UTF8String]

    override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val ref = ctx.addReferenceObj("langIdExpr", this,
        classOf[LangIdExpr].getName)
      nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.evalTokens($c);")
    }

    @transient private lazy val langs = markers.map(_._1).toArray
    @transient private lazy val sets: Array[java.util.HashSet[String]] =
      markers.map { case (_, ws) =>
        val s = new java.util.HashSet[String]()
        ws.foreach(s.add); s
      }.toArray

    override def nullSafeEval(input: Any): Any = {
      val toks = input.asInstanceOf[ArrayData]
      val n = toks.numElements()
      val scores = new Array[Long](langs.length)
      var i = 0
      while (i < n) {
        val t = toks.getUTF8String(i).toString
        var l = 0
        while (l < langs.length) {
          if (sets(l).contains(t)) scores(l) += 1
          l += 1
        }
        i += 1
      }
      var best = 0
      var l = 1
      while (l < langs.length) {
        if (scores(l) > scores(best)) best = l
        l += 1
      }
      UTF8String.fromString(langs(best))
    }

    override protected def withNewChildInternal(c: Expression): Expression =
      copy(child = c)
  }

  /** Morton/z-order interleave of two long values' low `bits` bits: x's
    * bit i lands at position 2i, y's at 2i+1 (q96's clustering key).
    * Pure integer arithmetic; the codegen emits the loop inline, so the
    * surrounding stage stays fused with zero per-row calls.
    */
  case class ZInterleaveExpr(left: Expression, right: Expression, bits: Int)
      extends BinaryExpression {

    require(bits >= 1 && bits <= 32, s"bits $bits outside [1, 32]")

    override def dataType: DataType = LongType
    override def prettyName: String = "graft_zvalue"

    override def checkInputDataTypes(): TypeCheckResult =
      (left.dataType, right.dataType) match {
        case (LongType | IntegerType, LongType | IntegerType) =>
          TypeCheckResult.TypeCheckSuccess
        case (l, r) => TypeCheckResult.TypeCheckFailure(
          s"$prettyName requires two integral values, got ${l.sql} and ${r.sql}")
      }

    private def asLong(e: Expression, v: Any): Long = e.dataType match {
      case IntegerType => v.asInstanceOf[Int].toLong
      case _           => v.asInstanceOf[Long]
    }

    override def nullSafeEval(a: Any, b: Any): Any = {
      val x = asLong(left, a); val y = asLong(right, b)
      var z = 0L
      var i = 0
      while (i < bits) {
        z |= (((x >> i) & 1L) << (2 * i)) | (((y >> i) & 1L) << (2 * i + 1))
        i += 1
      }
      z
    }

    // NOTE: the cast is hoisted into locals and each shift operand is a
    // bare variable. Janino mis-parses a parenthesized expression that
    // begins with a cast when a shift follows (`((long) x >> i) << j` →
    // "not a type") and Spark then silently falls back to interpreted
    // eval for the whole stage — the spec force-compiles this codegen to
    // keep that regression loud.
    override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, (xc, yc) => {
        val z = ctx.freshName("z")
        val i = ctx.freshName("i")
        val xl = ctx.freshName("xl")
        val yl = ctx.freshName("yl")
        val xb = ctx.freshName("xb")
        val yb = ctx.freshName("yb")
        s"""
        long $z = 0L;
        long $xl = (long) $xc;
        long $yl = (long) $yc;
        for (int $i = 0; $i < $bits; $i++) {
          long $xb = ($xl >> $i) & 1L;
          long $yb = ($yl >> $i) & 1L;
          $z |= $xb << (2 * $i);
          $z |= $yb << (2 * $i + 1);
        }
        ${ev.value} = $z;
        """
      })

    override protected def withNewChildrenInternal(
        l: Expression, r: Expression): Expression = copy(left = l, right = r)
  }

  /** Byte-wise Hamming distance of two strings — the verify step of
    * every signature-space dedup (simhash q27, image aHash q150). A
    * TOTAL function: positions differing over the common prefix plus
    * the length difference (so unequal-length inputs are "maximally
    * different in the tail", never null). On the '0'/'1' hash strings
    * the pipelines emit, this is exactly the bit distance. The codegen
    * loop compares raw UTF8 bytes — no per-position substring churn
    * like the HOF formulation (`filter(sequence(...))`), which
    * allocates two single-char strings per compared position.
    */
  case class HammingDistanceExpr(left: Expression, right: Expression)
      extends BinaryExpression {

    override def dataType: DataType = LongType
    override def prettyName: String = "graft_hamming"

    override def checkInputDataTypes(): TypeCheckResult =
      (left.dataType, right.dataType) match {
        case (StringType, StringType) => TypeCheckResult.TypeCheckSuccess
        case (l, r) => TypeCheckResult.TypeCheckFailure(
          s"$prettyName requires two strings, got ${l.sql} and ${r.sql}")
      }

    override def nullSafeEval(a: Any, b: Any): Any = {
      val x = a.asInstanceOf[UTF8String]
      val y = b.asInstanceOf[UTF8String]
      val nx = x.numBytes(); val ny = y.numBytes()
      val n = math.min(nx, ny)
      var d = math.abs(nx - ny).toLong
      var i = 0
      while (i < n) {
        if (x.getByte(i) != y.getByte(i)) d += 1
        i += 1
      }
      d
    }

    override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, (xc, yc) => {
        val nx = ctx.freshName("nx")
        val ny = ctx.freshName("ny")
        val n = ctx.freshName("n")
        val d = ctx.freshName("d")
        val i = ctx.freshName("i")
        s"""
        int $nx = $xc.numBytes();
        int $ny = $yc.numBytes();
        int $n = $nx < $ny ? $nx : $ny;
        long $d = (long) ($nx < $ny ? $ny - $nx : $nx - $ny);
        for (int $i = 0; $i < $n; $i++) {
          if ($xc.getByte($i) != $yc.getByte($i)) $d++;
        }
        ${ev.value} = $d;
        """
      })

    override protected def withNewChildrenInternal(
        l: Expression, r: Expression): Expression = copy(left = l, right = r)
  }

  /** Text canonicalization in one pass: Unicode NFC, lower-case
    * (root locale), collapse ASCII-whitespace runs to one space, trim.
    * The pre-tokenization normalize step of every text pipeline
    * (reference cleans field text per-row in
    * `transform_data.py` before load; here it is one codegen'd
    * expression instead of four chained string ops, so the scan stage
    * stays fused and the string is traversed once).
    *
    * Cross-engine contract: on ASCII input this equals DuckDB's
    * `trim(regexp_replace(lower(nfc_normalize(s)), '\s+', ' ', 'g'))`
    * exactly (Java's `\s` and RE2's `\s` are both the ASCII class, and
    * ASCII lower-casing agrees). Non-ASCII case/normalization edge cases
    * (locale-free full case mapping vs utf8proc) are pinned by
    * single-engine specs instead.
    */
  case class NormalizeTextExpr(child: Expression)
      extends UnaryExpression {

    override def dataType: DataType = StringType
    override def prettyName: String = "graft_normalize_text"

    override def checkInputDataTypes(): TypeCheckResult =
      child.dataType match {
        case StringType => TypeCheckResult.TypeCheckSuccess
        case t => TypeCheckResult.TypeCheckFailure(
          s"$prettyName requires a string, got ${t.sql}")
      }

    def evalString(s: UTF8String): UTF8String =
      nullSafeEval(s).asInstanceOf[UTF8String]

    override def nullSafeEval(input: Any): Any = {
      val raw = input.asInstanceOf[UTF8String].toString
      val nfc =
        if (java.text.Normalizer.isNormalized(raw,
            java.text.Normalizer.Form.NFC)) raw
        else java.text.Normalizer.normalize(raw,
          java.text.Normalizer.Form.NFC)
      val lower = nfc.toLowerCase(java.util.Locale.ROOT)
      val sb = new java.lang.StringBuilder(lower.length)
      var i = 0
      var pendingSpace = false
      while (i < lower.length) {
        val c = lower.charAt(i)
        val ws = c == ' ' || c == '\t' || c == '\n' || c == '\u000B' ||
          c == '\f' || c == '\r'
        if (ws) { if (sb.length > 0) pendingSpace = true }
        else {
          if (pendingSpace) { sb.append(' '); pendingSpace = false }
          sb.append(c)
        }
        i += 1
      }
      UTF8String.fromString(sb.toString)
    }

    override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val ref = ctx.addReferenceObj("normExpr", this,
        classOf[NormalizeTextExpr].getName)
      nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.evalString($c);")
    }

    override protected def withNewChildInternal(c: Expression): Expression =
      copy(child = c)
  }

  // ── Column wrappers ─────────────────────────────────────────────────
  def hamming(a: Column, b: Column): Column =
    ColumnBridge.column(HammingDistanceExpr(
      ColumnBridge.expression(a), ColumnBridge.expression(b)))

  def normalizeText(s: Column): Column =
    ColumnBridge.column(NormalizeTextExpr(ColumnBridge.expression(s)))

  def zValue(x: Column, y: Column, bits: Int): Column =
    ColumnBridge.column(
      ZInterleaveExpr(ColumnBridge.expression(x),
        ColumnBridge.expression(y), bits))

  def minHashSignature(tokens: Column, k: Int, numHashes: Int): Column =
    ColumnBridge.column(
      MinHashSignatureExpr(ColumnBridge.expression(tokens), k, numHashes))

  def dot(a: Column, b: Column): Column =
    ColumnBridge.column(
      DotProductExpr(ColumnBridge.expression(a),
        ColumnBridge.expression(b)))

  def signLshBuckets(vec: Column, bits: Int, dims: Int, seed: Long,
                     tables: Int): Column =
    ColumnBridge.column(
      SignLshBucketsExpr(ColumnBridge.expression(vec), bits, dims, seed,
        tables))

  def wordShingles(tokens: Column, k: Int, distinct: Boolean): Column =
    ColumnBridge.column(
      WordShinglesExpr(ColumnBridge.expression(tokens), k, distinct))

  def rollingFingerprint(tokens: Column, k: Int): Column =
    ColumnBridge.column(
      RollingFingerprintExpr(ColumnBridge.expression(tokens), k))

  def simhash(tokens: Column, bits: Int): Column =
    ColumnBridge.column(
      SimHashExpr(ColumnBridge.expression(tokens), bits))

  def ivfCells(vec: Column, centIds: Array[Long],
               centVecs: Array[Array[Double]], nprobe: Int): Column =
    ColumnBridge.column(
      IvfCellsExpr(ColumnBridge.expression(vec),
        centIds.toIndexedSeq,
        centVecs.map(_.toIndexedSeq).toIndexedSeq, nprobe))

  def pqAdc(vec: Column, centIds: Seq[Array[Long]],
            centVecs: Seq[Array[Array[Double]]]): Column =
    ColumnBridge.column(
      PqAdcExpr(ColumnBridge.expression(vec),
        centIds.map(_.toIndexedSeq).toIndexedSeq,
        centVecs.map(_.map(_.toIndexedSeq).toIndexedSeq).toIndexedSeq))

  def langId(lowerTokens: Column,
             markers: Seq[(String, Seq[String])]): Column =
    ColumnBridge.column(
      LangIdExpr(ColumnBridge.expression(lowerTokens), markers))

  def sortedIntersectCount(a: Column, b: Column): Column =
    ColumnBridge.column(
      SortedIntersectCountExpr(ColumnBridge.expression(a),
        ColumnBridge.expression(b)))

  def md5Prefix(a: Column, hexLen: Int): Column =
    ColumnBridge.column(
      Md5PrefixExpr(ColumnBridge.expression(a), hexLen))

  def md5Prefix60Sorted(a: Column): Column =
    ColumnBridge.column(
      Md5Prefix60SortedExpr(ColumnBridge.expression(a)))

  def sortedLongIntersectCount(a: Column, b: Column): Column =
    ColumnBridge.column(
      SortedLongIntersectCountExpr(ColumnBridge.expression(a),
        ColumnBridge.expression(b)))

  def boundedLevenshtein(a: Column, b: Column, bound: Int): Column =
    ColumnBridge.column(
      BoundedLevenshteinExpr(ColumnBridge.expression(a),
        ColumnBridge.expression(b), bound))
}
