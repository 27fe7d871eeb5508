package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{Column, DataFrame, GraftColumnBridge}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute,
  Expression, SortOrder, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.expressions.codegen.LazilyGeneratedOrdering
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, UnaryNode}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution,
  Distribution}
import org.apache.spark.sql.execution.{SparkPlan, SparkStrategy, UnaryExecNode}

/** Whole-operator Catalyst extension: top-k rows per key.
  *
  * The DataFrame formulation (`row_number().over(Window.partitionBy(key)
  * .orderBy(ord)) <= k`) must SORT every partition's full row set before
  * ranking — O(n log n) per partition and the whole input materialized
  * through the sort. This operator keeps a bounded heap of k rows per
  * key instead: O(n log k), memory O(keys·k), no sort buffer. At 100 TB
  * with small k the difference is the sort spill. The per-task
  * distinct-keys × k working set is itself SPILLABLE (backed by
  * Spark's ExternalAppendOnlyMap since round 7), so the many-rows-per-
  * key regime (top products per region, top neighbors per probe) runs
  * entirely in memory while near-unique keys degrade gracefully to
  * disk-merged heap runs instead of OOM.
  *
  * Implementation follows the preference ladder of SURVEY.md §7 (custom
  * LogicalPlan + Strategy + SparkPlan, registered through
  * `SparkSessionExtensions.injectPlannerStrategy` /
  * `experimental.extraStrategies`): the logical node resolves its
  * expressions generically (plain `UnaryNode`), the physical node
  * declares `ClusteredDistribution(keys)` so EnsureRequirements inserts
  * the same hash exchange a groupBy would get, and rows never leave
  * Tungsten format (UnsafeRow in, UnsafeRow out).
  */
case class TopKPerKeyNode(keys: Seq[Expression], order: Seq[SortOrder],
    k: Int, child: LogicalPlan) extends UnaryNode {
  require(k > 0, "k must be positive")
  // Global top-k (no keys) is already served optimally by Spark's
  // TakeOrderedAndProject (orderBy.limit) — and ClusteredDistribution
  // requires a non-empty clustering anyway.
  require(keys.nonEmpty, "keys must be non-empty; use orderBy().limit(k) for global top-k")
  override def output: Seq[Attribute] = child.output
  override protected def withNewChildInternal(c: LogicalPlan): TopKPerKeyNode =
    copy(child = c)
}

/** The shared per-partition heap pass of the two top-k stages: top k
  * rows per key within each input partition. Top-k per key is a
  * semigroup (top-k of a union = top-k of the per-part top-ks merged),
  * so running the SAME pass before and after the key exchange is the
  * partial/final aggregate split (guide: aggregate before you shuffle)
  * — the exchange carries at most keys·k rows per map task instead of
  * every input row. */
private[plans] object TopKHeapPass {
  def run(child: SparkPlan, keys: Seq[Expression], order: Seq[SortOrder],
      k: Int): RDD[InternalRow] = {
    // Locals only in the task closure — capturing `this` would drag the
    // whole plan tree (non-serializable SparkPlan) into the task.
    val childOutput = child.output
    val keyExprs = keys
    val limit = k
    // Serializable, codegen-on-first-use ordering: compare(a,b) < 0 iff
    // a sorts before b, i.e. a is "better".
    val ordering = new LazilyGeneratedOrdering(order, childOutput)
    child.execute().mapPartitions { iter =>
      // The key projection always emits UnsafeRow (stable equals/
      // hashCode for the map); data rows stay InternalRow — a child
      // that satisfies the distribution without an exchange (e.g.
      // columnar scan fallback) may emit non-Unsafe rows.
      val keyProj = UnsafeProjection.create(keyExprs, childOutput)
      // Kept rows become UnsafeRow copies: stable storage off the
      // child's reused buffers AND java-serializable, which the spill
      // path requires. The identity projection only runs for the rare
      // non-Unsafe child rows.
      val toUnsafe = UnsafeProjection.create(childOutput, childOutput)
      val keep: InternalRow => InternalRow = {
        case u: UnsafeRow => u.copy()
        case r => toUnsafe(r).copy()
      }
      // Spillable per-key heaps (SPILL-SAFE since round 7): the
      // distinct-keys-per-task × k map lives in Spark's size-tracked
      // ExternalAppendOnlyMap — it acquires task execution memory,
      // spills heap runs to disk under pressure, and merge-sorts the
      // runs back on iteration (merging two heaps of the same key keeps
      // the top k of their union). Near-unique keys now degrade to
      // disk instead of OOM, so the window rewrite defaults ON
      // (TopKWindowRewrite). The key is copied per row: the map owns
      // its keys, and keyProj reuses one buffer.
      org.apache.spark.graft.GraftSpillBridge
        .combineByKey[UnsafeRow, InternalRow, TopKHeap](
          iter.map(row => (keyProj(row).copy(), row)),
          row => new TopKHeap(limit, ordering).insert(row, keep),
          (h, row) => h.insert(row, keep),
          (a, b) => a.merge(b))
        .flatMap(_._2.rows)
    }
  }
}

/** Map-side (pre-exchange) top-k per key: no distribution requirement,
  * so it runs on whatever layout the child has and bounds what the
  * exchange ships to keys·k rows per task. Correct for exactly the
  * reason the sharded-synopsis operators are: every globally-top-k row
  * of a key is top-k within its own partition too. */
case class TopKPerKeyPartialExec(keys: Seq[Expression],
    order: Seq[SortOrder], k: Int, child: SparkPlan)
    extends UnaryExecNode {
  override def output: Seq[Attribute] = child.output

  override def outputPartitioning:
      org.apache.spark.sql.catalyst.plans.physical.Partitioning =
    child.outputPartitioning

  override protected def doExecute(): RDD[InternalRow] =
    TopKHeapPass.run(child, keys, order, k)

  override protected def withNewChildInternal(
      c: SparkPlan): TopKPerKeyPartialExec = copy(child = c)
}

case class TopKPerKeyExec(keys: Seq[Expression], order: Seq[SortOrder],
    k: Int, child: SparkPlan) extends UnaryExecNode {
  override def output: Seq[Attribute] = child.output

  /** Co-locate each key's rows; any hash partitioning on the keys
    * satisfies this, so AQE sizes the exchange as usual. */
  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(keys) :: Nil

  /** Filtering rows within a partition preserves the child's layout —
    * advertising it lets a downstream groupBy/join on the same keys
    * skip its exchange. */
  override def outputPartitioning:
      org.apache.spark.sql.catalyst.plans.physical.Partitioning =
    child.outputPartitioning

  override protected def doExecute(): RDD[InternalRow] =
    TopKHeapPass.run(child, keys, order, k)

  override protected def withNewChildInternal(c: SparkPlan): TopKPerKeyExec =
    copy(child = c)
}

/** Bounded top-k heap of one key — the spillable map's combiner.
  * Serializable end-to-end (spill runs go through the SparkEnv java
  * serializer): the rows are UnsafeRow copies, the ordering is Spark's
  * `LazilyGeneratedOrdering` (re-generates its comparator after
  * deserialization). `insert` takes the copy function separately so the
  * map's insert path copies ONLY rows that are actually kept — the
  * incoming row may be a reused buffer. Max-heap on sort position:
  * head = worst kept row, evicted when a better row arrives. */
private[plans] final class TopKHeap(limit: Int,
    ord: Ordering[InternalRow]) extends Serializable {
  private val pq =
    new scala.collection.mutable.PriorityQueue[InternalRow]()(ord)

  def insert(row: InternalRow, keep: InternalRow => InternalRow): TopKHeap = {
    if (pq.size < limit) pq += keep(row)
    else if (ord.compare(row, pq.head) < 0) { pq.dequeue(); pq += keep(row) }
    this
  }

  /** Top k of the union of two heaps; `other`'s rows are already owned
    * copies, so no re-copy. */
  def merge(other: TopKHeap): TopKHeap = {
    other.pq.foreach { r =>
      if (pq.size < limit) pq += r
      else if (ord.compare(r, pq.head) < 0) { pq.dequeue(); pq += r }
    }
    this
  }

  def rows: Iterator[InternalRow] = pq.iterator
}

/** Planner rule: one custom logical operator → its physical form. */
object GraftStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case TopKPerKeyNode(keys, order, k, child) =>
      // Partial under final (round 20): EnsureRequirements plants the
      // key exchange between them, so the shuffle ships at most
      // keys·k rows per map task — the partial/final split every
      // built-in aggregate already gets.
      TopKPerKeyExec(keys, order, k,
        TopKPerKeyPartialExec(keys, order, k, planLater(child))) :: Nil
    case _ => Nil
  }
}

object TopKPerKey {
  /** Column-API entry: rows ranking in the first k of `order` within
    * their `keys` group (ties broken by the order itself — pass a total
    * order for deterministic results). Output is unsorted, like any
    * aggregate. */
  def apply(df: DataFrame, keys: Seq[Column], order: Seq[Column],
      k: Int): DataFrame = {
    val spark = df.sparkSession
    val sortOrders = order.map(c =>
      GraftColumnBridge.expression(spark, c) match {
        case s: SortOrder => s
        case e => SortOrder(e, Ascending)
      })
    GraftColumnBridge.ofRows(spark,
      TopKPerKeyNode(keys.map(GraftColumnBridge.expression(spark, _)),
        sortOrders, k, GraftColumnBridge.logicalPlan(df)))
  }
}
