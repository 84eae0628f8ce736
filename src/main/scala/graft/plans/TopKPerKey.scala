package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Attribute, AttributeReference, Expression, JoinedRow, SortOrder, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.expressions.codegen.LazilyGeneratedOrdering
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, UnaryNode}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution}
import org.apache.spark.sql.execution.{SparkPlan, SparkStrategy, UnaryExecNode}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.LongType

/** Custom whole-operator (SURVEY §2.10 / the (c) tier of the custom-op
  * ladder): per-key bounded top-k with an appended `rank` column.
  *
  * The built-in formulation — `row_number().over(partitionBy(key)
  * .orderBy(...))` then `rank <= k` — SORTS every partition fully
  * (WindowExec) and only then discards all but k rows per key. This
  * operator keeps a size-k heap per key instead: O(n log k) per
  * partition, no Sort node, memory bounded by k·keys-per-partition.
  * Distribution requirement is `ClusteredDistribution(keys)`, so
  * EnsureRequirements inserts the single hash exchange (or elides it if
  * the child is already clustered, e.g. bucketed input).
  *
  * The caller's ordering must be TOTAL (include a tie-break key) for
  * deterministic results — same contract as deterministic row_number.
  */
object TopKPerKey {

  final case class TopKPerKeyNode(
      keys: Seq[Expression], order: Seq[SortOrder], k: Int,
      child: LogicalPlan,
      rankAttr: AttributeReference =
        AttributeReference("rank", LongType, nullable = false)())
      extends UnaryNode {
    override def output: Seq[Attribute] = child.output :+ rankAttr
    override def producedAttributes
        : org.apache.spark.sql.catalyst.expressions.AttributeSet =
      org.apache.spark.sql.catalyst.expressions.AttributeSet(rankAttr :: Nil)
    override protected def withNewChildInternal(c: LogicalPlan) =
      copy(child = c)
  }

  /** Shared heap pass: per input partition, keep the best k rows per
    * key; emit per key in ascending rank order, optionally with the
    * 1-based rank appended.
    */
  private def heapTopK(
      iter: Iterator[InternalRow], kk: Int,
      keyProj: UnsafeProjection, ord: Ordering[InternalRow],
      emitRank: Option[UnsafeProjection]): Iterator[InternalRow] = {
    // max-heap under the rank order: the WORST retained row on top,
    // evicted when a better row arrives
    val heaps = new java.util.HashMap[UnsafeRow,
      java.util.PriorityQueue[InternalRow]]()
    val revCmp = new java.util.Comparator[InternalRow] {
      override def compare(a: InternalRow, b: InternalRow): Int =
        ord.compare(b, a)
    }
    iter.foreach { row =>
      val key = keyProj(row)
      var pq = heaps.get(key)
      if (pq == null) {
        pq = new java.util.PriorityQueue[InternalRow](kk, revCmp)
        heaps.put(key.copy(), pq)
      }
      if (pq.size < kk) pq.add(row.copy())
      else if (ord.compare(row, pq.peek) < 0) {
        pq.poll(); pq.add(row.copy())
      }
    }
    val joined = new JoinedRow
    val entries = heaps.values().iterator()
    new Iterator[InternalRow] {
      private var current: Iterator[InternalRow] = Iterator.empty
      override def hasNext: Boolean = {
        while (!current.hasNext && entries.hasNext) {
          val pq = entries.next()
          val rows = new Array[InternalRow](pq.size)
          var i = rows.length - 1
          while (i >= 0) { rows(i) = pq.poll(); i -= 1 } // drain → asc
          current = emitRank match {
            case Some(proj) => rows.iterator.zipWithIndex.map {
              case (r, idx) => proj(joined(r, InternalRow(idx + 1L)))
            }
            case None => rows.iterator
          }
        }
        current.hasNext
      }
      override def next(): InternalRow = current.next()
    }
  }

  /** Map-side combiner: per INPUT partition top-k per key, no
    * distribution requirement, schema unchanged. The global top-k per
    * key is a subset of the union of per-partition top-k's, so the
    * exchange above this node moves at most k·keys-per-partition rows
    * instead of the full input — the aggregation-combiner pattern
    * applied to ranking.
    */
  final case class TopKPerKeyPartialExec(
      keys: Seq[Expression], order: Seq[SortOrder], k: Int,
      child: SparkPlan) extends UnaryExecNode {
    override def output: Seq[Attribute] = child.output

    override protected def doExecute(): RDD[InternalRow] = {
      val (kk, childOutput, keyExprs, sortOrder) =
        (k, child.output, keys, order)
      child.execute().mapPartitions { iter =>
        heapTopK(iter, kk,
          UnsafeProjection.create(keyExprs, childOutput),
          new LazilyGeneratedOrdering(sortOrder, childOutput), None)
      }
    }

    override protected def withNewChildInternal(c: SparkPlan) =
      copy(child = c)
  }

  final case class TopKPerKeyExec(
      keys: Seq[Expression], order: Seq[SortOrder], k: Int,
      rankAttr: Attribute, child: SparkPlan) extends UnaryExecNode {
    override def output: Seq[Attribute] = child.output :+ rankAttr
    override def producedAttributes
        : org.apache.spark.sql.catalyst.expressions.AttributeSet =
      org.apache.spark.sql.catalyst.expressions.AttributeSet(rankAttr :: Nil)
    override def requiredChildDistribution: Seq[Distribution] =
      ClusteredDistribution(keys) :: Nil

    override protected def doExecute(): RDD[InternalRow] = {
      val (kk, childOutput, keyExprs, sortOrder, outAttrs) =
        (k, child.output, keys, order, output)
      child.execute().mapPartitions { iter =>
        heapTopK(iter, kk,
          UnsafeProjection.create(keyExprs, childOutput),
          new LazilyGeneratedOrdering(sortOrder, childOutput),
          Some(UnsafeProjection.create(outAttrs, outAttrs)))
      }
    }

    override protected def withNewChildInternal(c: SparkPlan) =
      copy(child = c)
  }

  object TopKStrategy extends SparkStrategy {
    override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
      case n: TopKPerKeyNode =>
        // partial (map-side) pass below the exchange EnsureRequirements
        // will insert to satisfy the final pass's distribution
        TopKPerKeyExec(n.keys, n.order, n.k, n.rankAttr,
          TopKPerKeyPartialExec(n.keys, n.order, n.k,
            planLater(n.child))) :: Nil
      case _ => Nil
    }
  }

  /** Sort spec: column name + direction (nulls-first for asc,
    * nulls-last for desc — the `Column.asc`/`.desc` defaults).
    */
  final case class Sort(colName: String, asc: Boolean = true)

  /** DataFrame-facing entry: top `k` rows per `keys` under `order`
    * (must be a total order), with a 1-based `rank` column appended.
    * Attributes are resolved here against the analyzed child plan — the
    * analyzer has no resolution rule for a foreign node, so it must
    * receive the node fully resolved.
    */
  def topKPerKey(df: DataFrame, keys: Seq[String], order: Seq[Sort],
                 k: Int): DataFrame = {
    // ClusteredDistribution rejects an empty clustering; a global top-n
    // belongs to WindowExec / ORDER BY + LIMIT, not this operator.
    require(keys.nonEmpty,
      "topKPerKey requires at least one key; use orderBy(...).limit(k) for global top-n")
    val spark = df.sparkSession
    // read-check-append on extraStrategies is racy under concurrent
    // query submission; serialize the registration
    spark.experimental.synchronized {
      if (!spark.experimental.extraStrategies.contains(TopKStrategy))
        spark.experimental.extraStrategies =
          spark.experimental.extraStrategies :+ TopKStrategy
    }
    val plan = ColumnBridge.logicalPlan(df)
    def attr(name: String): Attribute =
      plan.output.find(_.name == name).getOrElse(
        throw new IllegalArgumentException(
          s"column $name not in ${plan.output.map(_.name).mkString(",")}"))
    val sortOrders = order.map { s =>
      import org.apache.spark.sql.catalyst.expressions.{Ascending, Descending}
      SortOrder(attr(s.colName), if (s.asc) Ascending else Descending)
    }
    ColumnBridge.ofRows(spark,
      TopKPerKeyNode(keys.map(attr), sortOrders, k, plan))
  }
}
