package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.LazilyGeneratedOrdering
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, UnaryNode}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning}
import org.apache.spark.sql.execution.{SparkPlan, SparkStrategy, UnaryExecNode}

/** Whole-operator Catalyst extension: top-k rows per key with an appended
  * rank column — the shape of batch KNN (k nearest candidates per query,
  * reference `ingest/db_handler.py:465-491` / `embeddings/embed.py:363-404`)
  * and of every "best k per group" selection in the pipeline.
  *
  * Spark's own plan for `row_number().over(partitionBy(key).orderBy(o)) <= k`
  * is WindowGroupLimit(Partial) → Exchange → Sort(key, o) → WindowGroupLimit
  * (Final) → Window → Filter: the partial group-limit prunes rows entering
  * the shuffle, but the surviving rows are still fully SORTED per partition
  * (an O(n log n) buffer of every retained row) before the window ranks
  * them. This operator replaces sort-with-limit by bounded heaps on both
  * sides of the same exchange:
  *
  *   PartialTopKPerKeyExec  — per input partition, one k-heap per key;
  *                            at most k·|keys| rows survive into the shuffle
  *   Exchange(key)          — inserted by EnsureRequirements from the
  *                            final operator's required distribution
  *   FinalTopKPerKeyExec    — re-heap per key, emit each key's k rows in
  *                            order with rank 1..k
  *
  * Memory is O(k · keys-per-partition) rows — independent of rows-per-key,
  * which is the term that explodes at 100 TB (a hot query key with millions
  * of candidates costs the sort-based plan a million-row sort buffer; this
  * plan a k-row heap). CAVEAT (the inverse regime): the heaps live in a
  * plain hash map OUTSIDE Spark's memory manager with no spill path, so
  * k·keys must fit executor memory. That holds for rank-over-bounded-key
  * sets (queries × k, users × k); for NEAR-UNIQUE keys per partition
  * (k·keys ≈ rows) the spillable sort-based window plan is the safer
  * choice — `TopK.perKey(useHeap = false)` selects it per call.
  * Semantics match the `row_number` form exactly when
  * the ordering is total (callers pass a tiebreak column, as `Knn.topK`
  * does); with ties the choice among tied rows is arbitrary in both forms.
  *
  * Physical-layer registration: `GraftExtensions` injects
  * [[TopKPerKeyStrategy]] via `injectPlannerStrategy`; the user-facing API
  * (`graft.operators.TopK.perKey`) falls back to the window composition on
  * sessions without the extension, so the logical node never reaches the
  * planner unplannable.
  */
case class TopKPerKey(
    keys: Seq[Expression],
    order: Seq[SortOrder],
    k: Int,
    rankAttr: AttributeReference,
    child: LogicalPlan) extends UnaryNode {
  require(keys.nonEmpty, "TopKPerKey needs at least one key (use orderBy().limit() for global top-k)")
  require(order.nonEmpty, "TopKPerKey needs at least one sort order")
  require(k >= 1, s"k must be >= 1, got $k")
  override def output: Seq[Attribute] = child.output :+ rankAttr
  // rankAttr is minted here, not read from the child — declare it so
  // QueryPlan.missingInput stays empty and CheckAnalysis passes.
  override def producedAttributes: AttributeSet = AttributeSet(rankAttr)
  override def maxRows: Option[Long] = child.maxRows
  override protected def withNewChildInternal(newChild: LogicalPlan): TopKPerKey =
    copy(child = newChild)
}

/** Plans [[TopKPerKey]] as partial-heap → (exchange) → final-heap. */
object TopKPerKeyStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case TopKPerKey(keys, order, k, rankAttr, child) =>
      FinalTopKPerKeyExec(keys, order, k, rankAttr,
        PartialTopKPerKeyExec(keys, order, k, planLater(child))) :: Nil
    case _ => Nil
  }
}

private[plans] object TopKHeaps {
  /** One bounded heap per key over this iterator. Heap head is the WORST
    * retained row (reverse ordering), so admission is an O(1) peek + O(log k)
    * replace. Rows and keys are copied on retention only — at most k·|keys|
    * copies regardless of input size.
    */
  def build(
      iter: Iterator[InternalRow],
      keys: Seq[Expression],
      order: Seq[SortOrder],
      k: Int,
      inputAttrs: Seq[Attribute]): java.util.HashMap[UnsafeRow, java.util.PriorityQueue[InternalRow]] = {
    val keyProj = UnsafeProjection.create(keys, inputAttrs)
    val ord = new LazilyGeneratedOrdering(order, inputAttrs)
    val reverse = new java.util.Comparator[InternalRow] {
      override def compare(a: InternalRow, b: InternalRow): Int = ord.compare(b, a)
    }
    val heaps = new java.util.HashMap[UnsafeRow, java.util.PriorityQueue[InternalRow]]()
    while (iter.hasNext) {
      val row = iter.next()
      val key = keyProj(row)
      var heap = heaps.get(key)
      if (heap == null) {
        heap = new java.util.PriorityQueue[InternalRow](math.min(k, 16) + 1, reverse)
        heaps.put(key.copy(), heap)
      }
      if (heap.size < k) heap.offer(row.copy())
      else if (ord.compare(row, heap.peek()) < 0) {
        heap.poll(); heap.offer(row.copy())
      }
    }
    heaps
  }
}

/** Map-side phase: prune each input partition to at most k rows per key.
  * No distribution requirement — runs directly over the child's partitions,
  * exactly like a partial aggregate.
  */
case class PartialTopKPerKeyExec(
    keys: Seq[Expression],
    order: Seq[SortOrder],
    k: Int,
    child: SparkPlan) extends UnaryExecNode {
  override def output: Seq[Attribute] = child.output
  override def outputPartitioning: Partitioning = child.outputPartitioning
  override protected def doExecute(): RDD[InternalRow] = {
    val (keyExprs, so, kk, attrs) = (keys, order, k, child.output)
    child.execute().mapPartitions({ iter =>
      import scala.jdk.CollectionConverters._
      TopKHeaps.build(iter, keyExprs, so, kk, attrs)
        .values().iterator().asScala.flatMap(_.iterator().asScala)
    }, preservesPartitioning = true)
  }
  override protected def withNewChildInternal(newChild: SparkPlan): PartialTopKPerKeyExec =
    copy(child = newChild)
}

/** Reduce-side phase: requires co-location by key (EnsureRequirements
  * inserts the hash exchange), re-heaps the ≤ k·partitions survivors per
  * key, and emits each key's rows best-first with rank 1..k appended.
  */
case class FinalTopKPerKeyExec(
    keys: Seq[Expression],
    order: Seq[SortOrder],
    k: Int,
    rankAttr: AttributeReference,
    child: SparkPlan) extends UnaryExecNode {
  override def output: Seq[Attribute] = child.output :+ rankAttr
  override def producedAttributes: AttributeSet = AttributeSet(rankAttr)
  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(keys) :: Nil
  override def outputPartitioning: Partitioning = child.outputPartitioning
  override protected def doExecute(): RDD[InternalRow] = {
    val (keyExprs, so, kk, attrs, out) = (keys, order, k, child.output, output)
    child.execute().mapPartitions({ iter =>
      import scala.jdk.CollectionConverters._
      val heaps = TopKHeaps.build(iter, keyExprs, so, kk, attrs)
      val ord = new LazilyGeneratedOrdering(so, attrs)
      val outProj = UnsafeProjection.create(out, attrs :+ rankAttr)
      val joined = new JoinedRow
      val rankRow = new GenericInternalRow(1)
      heaps.values().iterator().asScala.flatMap { heap =>
        val arr = heap.toArray(new Array[InternalRow](heap.size))
        java.util.Arrays.sort(arr, ord)
        arr.iterator.zipWithIndex.map { case (row, i) =>
          rankRow.setInt(0, i + 1)
          outProj(joined(row, rankRow))
        }
      }
    }, preservesPartitioning = false)
  }
  override protected def withNewChildInternal(newChild: SparkPlan): FinalTopKPerKeyExec =
    copy(child = newChild)
}
