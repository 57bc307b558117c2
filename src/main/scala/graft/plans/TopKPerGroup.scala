package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Attribute, Expression, SortOrder, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, UnaryNode}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning, UnspecifiedDistribution}
import org.apache.spark.sql.catalyst.util.TypeUtils
import org.apache.spark.sql.execution.{SparkPlan, SparkStrategy, UnaryExecNode}
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.SparkSession

/** Top-k-per-group as a first-class physical operator.
  *
  * Spark expresses "top k rows per group" as `row_number() OVER (PARTITION
  * BY g ORDER BY v) <= k` — a WindowExec that SORTS every group in full
  * before discarding all but k rows. At 100 TB that is a full shuffle+sort
  * of the fact table to keep a handful of rows per key. This operator keeps
  * a bounded k-element heap per group instead, in two phases exactly like
  * partial aggregation:
  *
  *  - partial exec (no distribution requirement): per input partition,
  *    heap per group → at most k·groups rows leave the partition;
  *  - final exec (requires clustering on the group keys — Catalyst's
  *    EnsureRequirements inserts the hash exchange): merge heaps, emit.
  *
  * The shuffle therefore carries k·|groups| rows instead of the whole
  * input, and nothing is ever fully sorted. This is the pattern the
  * reference would have needed a whole new ExecNode for; here it is ~150
  * lines riding Spark's extension points ([[TopKPerGroupStrategy]] is
  * injected by [[graft.GraftExtensions]]).
  *
  * Demonstrates extension path (c) of the build guidance: LogicalPlan +
  * SparkStrategy + SparkPlan via SparkSessionExtensions.
  */
case class TopKPerGroupPlan(k: Int, groupExprs: Seq[Expression],
                            order: Expression, descending: Boolean,
                            child: LogicalPlan) extends UnaryNode {
  override def output: Seq[Attribute] = child.output
  override protected def withNewChildInternal(c: LogicalPlan): TopKPerGroupPlan =
    copy(child = c)
}

object TopKPerGroupStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case TopKPerGroupPlan(k, groups, order, desc, child) =>
      val planned = planLater(child)
      TopKPerGroupExec(k, groups, order, desc, partial = false,
        TopKPerGroupExec(k, groups, order, desc, partial = true, planned)) :: Nil
    case _ => Nil
  }
}

case class TopKPerGroupExec(k: Int, groupExprs: Seq[Expression],
                            order: Expression, descending: Boolean,
                            partial: Boolean, child: SparkPlan)
    extends UnaryExecNode {

  override def output: Seq[Attribute] = child.output
  override def outputPartitioning: Partitioning = child.outputPartitioning

  override def requiredChildDistribution: Seq[Distribution] =
    if (partial) Seq(UnspecifiedDistribution)
    else Seq(ClusteredDistribution(groupExprs))

  override protected def doExecute(): RDD[InternalRow] = {
    val childOutput = child.output
    val kLocal = k
    val groupLocal = groupExprs
    val orderLocal = order
    val descLocal = descending
    child.execute().mapPartitions { iter =>
      val keyProj = UnsafeProjection.create(groupLocal, childOutput)
      val rowProj = UnsafeProjection.create(childOutput, childOutput)
      val boundOrder = org.apache.spark.sql.catalyst.expressions.BindReferences
        .bindReference(orderLocal, org.apache.spark.sql.catalyst.expressions.AttributeSeq(childOutput))
      val valueOrd = TypeUtils.getInterpretedOrdering(orderLocal.dataType)
      // Heap root = currently-worst retained row; evict when a better one
      // arrives. "Better" = larger when descending (top-k), smaller else.
      val heapOrd: Ordering[(Any, UnsafeRow)] =
        if (descLocal) Ordering.by[(Any, UnsafeRow), Any](_._1)(valueOrd)
        else Ordering.by[(Any, UnsafeRow), Any](_._1)(valueOrd.reverse)
      val heaps = new java.util.HashMap[UnsafeRow, scala.collection.mutable.PriorityQueue[(Any, UnsafeRow)]]()
      // NULL order keys sort after every non-null value. This matches the
      // ROW_NUMBER ... DESC default in Spark (NULLS LAST) and both ASC/DESC
      // in DuckDB — but NOT Spark's ASC default (NULLS FIRST). Ascending
      // callers who need Spark's ASC NULLS FIRST must add an explicit
      // IS NOT NULL pre-filter or an asc_nulls_last comparison instead;
      // the operator's contract is nulls-last in both directions.
      val nullRows = new java.util.HashMap[UnsafeRow, scala.collection.mutable.ArrayBuffer[UnsafeRow]]()
      iter.foreach { row =>
        // copy buffer-backed order values before the iterator advances:
        // UTF8String/arrays/structs from eval() point into the reused
        // UnsafeRow buffer and would mutate inside the heap
        val v = boundOrder.eval(row) match {
          case s: org.apache.spark.unsafe.types.UTF8String => s.clone()
          case a: org.apache.spark.sql.catalyst.util.ArrayData => a.copy()
          case r: InternalRow => r.copy()
          case b: Array[Byte] => b.clone()
          case other => other
        }
        val key = keyProj(row)
        if (v != null) {
          var heap = heaps.get(key)
          if (heap == null) {
            heap = scala.collection.mutable.PriorityQueue.empty(heapOrd.reverse)
            heaps.put(key.copy(), heap)
          }
          if (heap.size < kLocal) heap.enqueue((v, rowProj(row).copy()))
          else if (heapOrd.compare((v, null), heap.head) > 0) {
            heap.dequeue()
            heap.enqueue((v, rowProj(row).copy()))
          }
        } else {
          var buf = nullRows.get(key)
          if (buf == null) {
            buf = scala.collection.mutable.ArrayBuffer.empty[UnsafeRow]
            nullRows.put(key.copy(), buf)
          }
          if (buf.size < kLocal) buf += rowProj(row).copy()
        }
      }
      val out = scala.collection.mutable.ArrayBuffer.empty[InternalRow]
      heaps.forEach { (key, heap) =>
        out ++= heap.iterator.map(_._2)
        val missing = kLocal - heap.size
        val nulls = nullRows.remove(key) // consume OR discard: never leak
        if (missing > 0 && nulls != null) out ++= nulls.take(missing)
      }
      nullRows.forEach((_, buf) => out ++= buf.take(kLocal))
      out.iterator
    }
  }

  override protected def withNewChildInternal(c: SparkPlan): TopKPerGroupExec =
    copy(child = c)
}

object TopKPerGroup {

  /** Rows belonging to the top `k` per group ordered by `order`
    * (descending by default). Output order is unspecified, like any
    * unordered relational result. */
  def topK(df: DataFrame, groupCols: Seq[Column], order: Column, k: Int,
           descending: Boolean = true): DataFrame = {
    val spark = df.sparkSession
    // Hand the analyzer unresolved expressions over the analyzed child —
    // Catalyst's generic resolution rules (ResolveReferences,
    // ResolveFunctions, name-placeholder cleanup) run over custom nodes'
    // expressions like any builtin node's.
    val plan = TopKPerGroupPlan(
      k,
      groupCols.map(ColumnBridge.expressionEager),
      ColumnBridge.expressionEager(order),
      descending,
      df.queryExecution.analyzed)
    org.apache.spark.sql.graft.DatasetBridge.ofRows(spark, plan)
  }
}
