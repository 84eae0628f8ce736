package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** KMV distinct sketch as a FIRST-CLASS Catalyst aggregate
  * (`TypedImperativeAggregate`): the per-group bottom-k hash set lives
  * in the aggregation buffer, so Spark gives the sketch everything a
  * built-in aggregate gets — hash-aggregate operator placement,
  * MAP-SIDE partial aggregation (each map task emits ≤ k longs per
  * group, the property the TopKPerKey formulation of q73 had to build
  * as a separate operator), codegen'd grouping, and AQE-planned
  * shuffles. Merge is bottom-k set union — associative, commutative,
  * idempotent — so partials fold exactly under any partitioning.
  *
  * The hash family is the shared portable one ([[NativeExprs]]'s 28-bit
  * md5 prefix ≡ `('0x' || substr(md5(s),1,7))::BIGINT`), so a SQL
  * oracle replays estimates bit-for-bit. Returns a struct
  * (k_actual, kth_hash, distinct_estimate) matching
  * [[graft.ext.Sketches.kmvDistinct]].
  *
  * Cite: Beyer et al., "On synopses for distinct-value estimation under
  * multiset operations" (SIGMOD'07) — the (k−1)/kth-fraction estimator.
  */
case class KmvSketchAgg(child: Expression, k: Int,
                        mutableAggBufferOffset: Int = 0,
                        inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[java.util.TreeSet[java.lang.Long]]
    with UnaryLike[Expression] with ExpectsInputTypes {
  require(k >= 2, s"kmv k=$k")

  // SQL callers (graft_kmv registered in FunctionRegistry) with a
  // non-string argument get an analysis-time type error naming STRING
  // (ANSI coercion does not implicitly cast numerics to string for
  // function inputs — GraftExtensionsSpec locks this) instead of a
  // runtime CCE on non-UTF8String input; they must CAST explicitly.
  override def inputTypes: Seq[DataType] = Seq(StringType)
  override def nullable: Boolean = false
  override def dataType: DataType = StructType(Seq(
    StructField("k_actual", LongType, nullable = false),
    StructField("kth_hash", LongType, nullable = true),
    StructField("distinct_estimate", DoubleType, nullable = false)))

  override def createAggregationBuffer(): java.util.TreeSet[java.lang.Long] =
    new java.util.TreeSet[java.lang.Long]()

  private def add(buf: java.util.TreeSet[java.lang.Long], h: Long): Unit =
    if (buf.size < k) { buf.add(h); () }
    else if (h < buf.last()) {
      // strict insert-then-trim: add() is false on a duplicate, and a
      // duplicate must NOT evict the current kth value
      if (buf.add(h) && buf.size > k) { buf.pollLast(); () }
    }

  override def update(buf: java.util.TreeSet[java.lang.Long],
                      input: InternalRow): java.util.TreeSet[java.lang.Long] = {
    val v = child.eval(input)
    if (v != null) {
      add(buf, NativeExprs.baseHash28(
        v.asInstanceOf[UTF8String].getBytes))
    }
    buf
  }

  override def merge(b1: java.util.TreeSet[java.lang.Long],
                     b2: java.util.TreeSet[java.lang.Long])
      : java.util.TreeSet[java.lang.Long] = {
    val it = b2.iterator()
    while (it.hasNext) add(b1, it.next())
    b1
  }

  override def eval(buf: java.util.TreeSet[java.lang.Long]): Any = {
    val ka = buf.size
    val kth: Any = if (ka == 0) null else buf.last().longValue()
    val est =
      if (ka < k) ka.toDouble
      else (ka - 1).toDouble * 268435456.0 / buf.last().toDouble
    InternalRow(ka.toLong, kth, est)
  }

  override def serialize(buf: java.util.TreeSet[java.lang.Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(4 + 8 * buf.size)
    bb.putInt(buf.size)
    val it = buf.iterator()
    while (it.hasNext) bb.putLong(it.next())
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): java.util.TreeSet[java.lang.Long] = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val buf = createAggregationBuffer()
    var i = 0
    while (i < n) { buf.add(bb.getLong); i += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): KmvSketchAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): KmvSketchAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): KmvSketchAgg =
    copy(child = newChild)
  override def prettyName: String = "graft_kmv"
}

object KmvSketchAgg {
  /** DataFrame-facing column: `kmvAgg(col, k)` usable inside `agg(...)`
    * exactly like a built-in aggregate. Casts to string for the caller;
    * SQL callers of `graft_kmv` on a non-string column get an
    * analysis-time type error (ExpectsInputTypes) telling them to CAST.
    */
  def kmvAgg(c: Column, k: Int): Column =
    ColumnBridge.column(
      KmvSketchAgg(ColumnBridge.expression(c.cast("string")), k)
        .toAggregateExpression())
}

/** Count-min sketch as a native Catalyst aggregate — the frequency twin
  * of [[KmvSketchAgg]]: the depth×width counter grid IS the aggregation
  * buffer (a flat long array, merge = element-wise add — associative
  * and commutative, so partials fold exactly under any partitioning and
  * each map task ships one bounded grid per group, never its token
  * stream). Bucket family is the shared portable one (28-bit md5 prefix
  * of `"j|value"`), identical to [[graft.ext.Sketches.countMin]], so
  * the oracle replays every counter. Returns the grid as
  * `array<long>` of length depth·width, row-major.
  */
case class CmsSketchAgg(child: Expression, depth: Int, width: Int,
                        mutableAggBufferOffset: Int = 0,
                        inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[Array[Long]]
    with UnaryLike[Expression] with ExpectsInputTypes {
  require(depth >= 1 && width >= 1, s"cms ${depth}x$width")

  override def inputTypes: Seq[DataType] = Seq(StringType)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def createAggregationBuffer(): Array[Long] =
    new Array[Long](depth * width)

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) {
      val s = v.asInstanceOf[UTF8String].toString
      var j = 0
      while (j < depth) {
        val h = NativeExprs.baseHash28(
          (j.toString + "|" + s).getBytes("UTF-8"))
        buf(j * width + (h % width).toInt) += 1
        j += 1
      }
    }
    buf
  }

  override def merge(b1: Array[Long], b2: Array[Long]): Array[Long] = {
    var i = 0
    while (i < b1.length) { b1(i) += b2(i); i += 1 }
    b1
  }

  override def eval(buf: Array[Long]): Any =
    org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(buf)

  override def serialize(buf: Array[Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(8 * buf.length)
    buf.foreach(bb.putLong)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val bb = ByteBuffer.wrap(bytes)
    Array.fill(bytes.length / 8)(bb.getLong)
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): CmsSketchAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): CmsSketchAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): CmsSketchAgg =
    copy(child = newChild)
  override def prettyName: String = "graft_cms"
}

object CmsSketchAgg {
  def cmsAgg(c: Column, depth: Int, width: Int): Column =
    ColumnBridge.column(
      CmsSketchAgg(ColumnBridge.expression(c.cast("string")), depth, width)
        .toAggregateExpression())
}

/** HyperLogLog registers as a native Catalyst aggregate — the DISTINCT
  * leg of the native sketch trio ([[KmvSketchAgg]] cardinality-by-
  * bottom-k, [[CmsSketchAgg]] frequency, this one cardinality-by-
  * registers): the 64-register max-rank table IS the aggregation
  * buffer. Register max is associative, commutative, AND idempotent,
  * so partials fold exactly under any partitioning and replay. Hash
  * family is the portable 48-bit md5 prefix (6 bucket bits / 42 rank
  * bits), identical to [[graft.ext.Sketches.hllRegisters]], so the
  * oracle replays every register. Returns `array<int>` of length 64:
  * element b = max rank of bucket b, 0 = bucket never hit.
  */
case class HllSketchAgg(child: Expression,
                        mutableAggBufferOffset: Int = 0,
                        inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[Array[Int]]
    with UnaryLike[Expression] with ExpectsInputTypes {

  override def inputTypes: Seq[DataType] = Seq(StringType)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)

  override def createAggregationBuffer(): Array[Int] = new Array[Int](64)

  override def update(buf: Array[Int], input: InternalRow): Array[Int] = {
    val v = child.eval(input)
    if (v != null) {
      val h = NativeExprs.baseHash48(v.asInstanceOf[UTF8String].getBytes)
      val bucket = (h >>> 42).toInt          // top 6 of 48 bits
      val rest = h & ((1L << 42) - 1)
      // rank = 43 − bitlength(rest); rest == 0 → 43 (all 42 bits zero)
      val rank =
        if (rest == 0L) 43
        else java.lang.Long.numberOfLeadingZeros(rest) - 21
      if (rank > buf(bucket)) buf(bucket) = rank
    }
    buf
  }

  override def merge(b1: Array[Int], b2: Array[Int]): Array[Int] = {
    var i = 0
    while (i < 64) { if (b2(i) > b1(i)) b1(i) = b2(i); i += 1 }
    b1
  }

  override def eval(buf: Array[Int]): Any =
    org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(buf)

  override def serialize(buf: Array[Int]): Array[Byte] = {
    val bb = ByteBuffer.allocate(64)
    buf.foreach(r => bb.put(r.toByte)) // ranks ≤ 43 fit a byte
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Int] =
    bytes.map(_.toInt)

  override def withNewMutableAggBufferOffset(newOffset: Int): HllSketchAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): HllSketchAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): HllSketchAgg =
    copy(child = newChild)
  override def prettyName: String = "graft_hll"
}

object HllSketchAgg {
  def hllAgg(c: Column): Column =
    ColumnBridge.column(
      HllSketchAgg(ColumnBridge.expression(c.cast("string")))
        .toAggregateExpression())
}
