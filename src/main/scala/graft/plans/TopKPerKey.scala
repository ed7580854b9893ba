package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, Expression, RowOrdering, SortOrder, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, UnaryNode}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning, UnspecifiedDistribution}
import org.apache.spark.sql.execution.{SparkPlan, SparkStrategy, UnaryExecNode}
import org.apache.spark.sql.graftbridge.ColumnBridge

/** Group-wise top-k as a first-class operator — the full tier-(c)
  * custom-operator stack: logical plan + planner strategy + physical
  * operator, registered through `SparkSessionExtensions`
  * ([[graft.functions.GraftExtensions]]).
  *
  * Why not `row_number().over(Window.partitionBy(key).orderBy(o)) <= k`:
  * that plan is Exchange -> FULL Sort of every row within each partition
  * -> WindowExec (which buffers each key's whole group) -> Filter. All n
  * rows are sorted and materialized before any are discarded, and every
  * row crosses the shuffle. This operator instead keeps a bounded k-row
  * heap per key on BOTH sides of the exchange:
  *
  *  - partial stage (map side, any distribution): each task reduces its
  *    partition to at most k rows per key it has seen — O(n log k) time,
  *    O(keys_in_partition * k) memory, no sort of the full input;
  *  - exchange: hash-partitions at most (k * map_partitions) rows per
  *    key instead of ALL rows — on a skewed key at 100 TB this is the
  *    difference between shuffling k*tasks rows and shuffling the whole
  *    hot key;
  *  - final stage (requires [[ClusteredDistribution]], which
  *    `EnsureRequirements` satisfies with one hash exchange): merges the
  *    partials with the same bounded heap and emits each key's k rows in
  *    sort order.
  *
  * Semantics are EXACTLY the window form's (same rows, verified by
  * `TopKPerKeySpec` against the window plan on random data) provided the
  * ordering is total (tie-break to a unique column), which every
  * registered query does anyway for cross-engine determinism.
  */
case class TopKPerKeyNode(
    keys: Seq[Expression],
    order: Seq[SortOrder],
    k: Int,
    child: LogicalPlan) extends UnaryNode {
  require(keys.nonEmpty, "topKPerKey needs at least one key column")
  require(k > 0, s"topKPerKey needs k > 0, got $k")
  override def output: Seq[Attribute] = child.output
  override def maxRows: Option[Long] = child.maxRows
  override protected def withNewChildInternal(newChild: LogicalPlan): TopKPerKeyNode =
    copy(child = newChild)
}

/** Planner strategy: one logical node -> partial + final physical pair
  * (the same split Spark's own hash aggregate uses). */
object TopKPerKeyStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case TopKPerKeyNode(keys, order, k, child) =>
      TopKPerKeyExec(keys, order, k, partial = false,
        TopKPerKeyExec(keys, order, k, partial = true, planLater(child))) :: Nil
    case _ => Nil
  }
}

/** Physical bounded-heap top-k per key. `partial = true` runs on the
  * child's native partitioning (map-side reduction); `partial = false`
  * declares [[ClusteredDistribution]] on the keys so the planner inserts
  * the one hash exchange between the two. */
case class TopKPerKeyExec(
    keys: Seq[Expression],
    order: Seq[SortOrder],
    k: Int,
    partial: Boolean,
    child: SparkPlan) extends UnaryExecNode {

  override def output: Seq[Attribute] = child.output

  override def outputPartitioning: Partitioning = child.outputPartitioning

  override def requiredChildDistribution: Seq[Distribution] =
    if (partial) UnspecifiedDistribution :: Nil
    else ClusteredDistribution(keys) :: Nil

  override protected def doExecute(): RDD[InternalRow] = {
    val keyExprs = keys
    val sortOrder = order
    val limit = k
    val attrs = child.output
    child.execute().mapPartitions({ iter =>
      val keyProj = UnsafeProjection.create(keyExprs, attrs)
      val ord = RowOrdering.create(sortOrder, attrs)
      // head of each queue = the WORST retained row (max under ord)
      val worstFirst: java.util.Comparator[InternalRow] = ord.reverse
      val heaps = new java.util.HashMap[UnsafeRow, java.util.PriorityQueue[InternalRow]]()
      while (iter.hasNext) {
        val row = iter.next()
        val key = keyProj(row)
        var q = heaps.get(key)
        if (q == null) {
          q = new java.util.PriorityQueue[InternalRow](limit + 1, worstFirst)
          // both the key and the row are reused buffers — copy on retain
          heaps.put(key.copy(), q)
        }
        if (q.size < limit) q.add(row.copy())
        else if (ord.compare(row, q.peek()) < 0) { q.poll(); q.add(row.copy()) }
      }
      val groups = heaps.values().iterator()
      new Iterator[InternalRow] {
        private var current: Iterator[InternalRow] = Iterator.empty
        override def hasNext: Boolean = {
          while (!current.hasNext && groups.hasNext) {
            val q = groups.next()
            val arr = q.toArray(new Array[InternalRow](q.size))
            java.util.Arrays.sort(arr, ord)
            current = arr.iterator
          }
          current.hasNext
        }
        override def next(): InternalRow = current.next()
      }
    }, preservesPartitioning = true)
  }

  override protected def withNewChildInternal(newChild: SparkPlan): TopKPerKeyExec =
    copy(child = newChild)
}

/** Public DataFrame-API surface. */
object TopKPerKey {

  /** The first `k` rows per `keys` group under `order` (give a total
    * order — tie-break on a unique column — for deterministic results).
    * Accepts plain columns (ascending) or explicit `.asc`/`.desc`. */
  def topK(df: DataFrame, keys: Seq[Column], order: Seq[Column], k: Int): DataFrame = {
    val keyExprs = keys.map(ColumnBridge.catalystExpression)
    val sortExprs = order.map(c => ColumnBridge.catalystExpression(c) match {
      case so: SortOrder => so
      case e => SortOrder(e, Ascending)
    })
    ColumnBridge.ofRows(df.sparkSession,
      TopKPerKeyNode(keyExprs, sortExprs, k, ColumnBridge.plan(df)))
  }
}
