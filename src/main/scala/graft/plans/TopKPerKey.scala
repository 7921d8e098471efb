package graft.plans

import scala.collection.mutable

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Alias, Attribute, Expression, GenericInternalRow, JoinedRow, Literal, SortOrder, UnsafeProjection, WindowExpression}
import org.apache.spark.sql.catalyst.expressions.{Ascending, LessThan, LessThanOrEqual, PredicateHelper, RowNumber}
import org.apache.spark.sql.catalyst.expressions.codegen.GenerateOrdering
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LogicalPlan, UnaryNode, Window}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning, UnspecifiedDistribution}
import org.apache.spark.sql.execution.{SparkPlan, SparkStrategy, UnaryExecNode}
import org.apache.spark.sql.types.IntegerType

/** Per-key top-k as a first-class operator.
  *
  * Users write the idiomatic form —
  * {{{ df.withColumn("rn", row_number().over(Window.partitionBy(k).orderBy(o)))
  *      .filter(col("rn") <= k) }}}
  * — and [[TopKRewriteRule]] rewrites it into [[TopKPerKeyNode]], planned by
  * [[TopKStrategy]] as a TWO-PHASE physical operator:
  *
  *   TopKFinalExec  (requires clustering on the keys; streams each sorted
  *        ^          group emitting the first k rows with their rank)
  *        |  <- Exchange(hash on keys) + Sort inserted by EnsureRequirements
  *   TopKPartialExec (per input partition: bounded max-heap of size k per
  *                    key — only k rows PER KEY PER PARTITION reach the
  *                    shuffle)
  *
  * Why this matters at 100 TB: the stock plan shuffles EVERY row of every
  * key to the window sort, then discards all but k. The partial phase cuts
  * shuffled bytes to ~k × keys × partitions — for a 1000-executor scan
  * keeping top-3 of millions of rows per key, orders of magnitude less
  * network and spill. Same idea as TakeOrderedAndProject, generalized per
  * key. (Registered via SparkSessionExtensions in GraftSession.)
  */
/** Ranking semantics of the rewritten window function: RowNumberMode emits
  * positional ranks over a total order; RankMode emits SQL rank() — equal
  * order-values share a rank, the next distinct value jumps to its
  * position — so boundary ties are all retained (a group can emit more
  * than k rows); DenseRankMode emits SQL dense_rank() — consecutive ranks
  * per distinct value, so the output keeps EVERY row of the k smallest
  * distinct values (its partial phase tracks k distinct order values per
  * key and streams qualifying rows through immediately: bounded memory
  * even though the qualifying row count per key is unbounded).
  */
sealed trait TopKMode
case object RowNumberMode extends TopKMode
case object RankMode extends TopKMode
case object DenseRankMode extends TopKMode

case class TopKPerKeyNode(
    k: Int,
    partitionExprs: Seq[Expression],
    order: Seq[SortOrder],
    rankAttr: Attribute,
    mode: TopKMode,
    child: LogicalPlan)
    extends UnaryNode {
  override def output: Seq[Attribute] = child.output :+ rankAttr
  override protected def withNewChildInternal(newChild: LogicalPlan): LogicalPlan =
    copy(child = newChild)
}

/** Rewrites Filter(rn <= k) over a single-row_number Window into
  * [[TopKPerKeyNode]]. Extra filter conjuncts are preserved above the node;
  * global (un-partitioned) windows are left alone (TakeOrdered territory);
  * k is bounded so the per-key heaps stay small.
  */
object TopKRewriteRule extends Rule[LogicalPlan] with PredicateHelper {

  private val MaxK = 10000

  private object RankLimit {
    /** Matches `rank <= lit` / `rank < lit` and yields the inclusive k. */
    def unapply(e: Expression): Option[(Attribute, Int)] = e match {
      case LessThanOrEqual(a: Attribute, Literal(v: Int, IntegerType)) => Some((a, v))
      case LessThan(a: Attribute, Literal(v: Int, IntegerType)) => Some((a, v - 1))
      // rn = 1 is top-1 (the exact-dedup shape); rn = v for v > 1 is NOT top-k
      case org.apache.spark.sql.catalyst.expressions.EqualTo(
            a: Attribute, Literal(1, IntegerType)) => Some((a, 1))
      case _ => None
    }
  }

  private object RankedWindow {
    /** Matches a single-function ranking window and yields its mode. */
    def unapply(e: Expression): Option[TopKMode] = e match {
      case WindowExpression(_: RowNumber, _) => Some(RowNumberMode)
      case WindowExpression(_: org.apache.spark.sql.catalyst.expressions.Rank, _) =>
        Some(RankMode)
      case WindowExpression(_: org.apache.spark.sql.catalyst.expressions.DenseRank, _) =>
        Some(DenseRankMode)
      case _ => None
    }
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformUp {
    case f @ Filter(cond,
          w @ Window(Seq(alias @ Alias(RankedWindow(mode), _)),
            partitionSpec, orderSpec, child, _))
        if partitionSpec.nonEmpty && orderSpec.nonEmpty =>
      val conjuncts = splitConjunctivePredicates(cond)
      val rankAttr = alias.toAttribute
      conjuncts.collectFirst {
        case rl @ RankLimit(a, k)
            if a.semanticEquals(rankAttr) && k > 0 && k <= MaxK => (rl, k)
      } match {
        case Some((rankPred, k)) =>
          val topk = TopKPerKeyNode(k, partitionSpec, orderSpec, rankAttr, mode, child)
          val rest = conjuncts.filterNot(_ eq rankPred)
          if (rest.isEmpty) topk else Filter(rest.reduce(org.apache.spark.sql.catalyst.expressions.And), topk)
        case None => f
      }
  }
}

object TopKStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case TopKPerKeyNode(k, part, order, rank, mode, child) =>
      TopKFinalExec(k, part, order, rank, mode,
        TopKPartialExec(k, part, order, mode, planLater(child))) :: Nil
    case _ => Nil
  }
}

/** Map-side phase: per input partition, a bounded max-heap of size k per
  * key. No distribution requirement — runs right on the scan output.
  *
  * Memory bound: at most [[TopKPartialExec.MaxTrackedKeys]] keys are
  * tracked (k rows each). Rows of further keys stream straight through
  * un-pruned — the partial phase is a best-effort shuffle reducer, never a
  * correctness point (the final phase prunes everything), so unlike a
  * spillable sort it can simply stop buffering under high key cardinality
  * (e.g. dedup keyed by full document text).
  */
case class TopKPartialExec(
    k: Int,
    partitionExprs: Seq[Expression],
    order: Seq[SortOrder],
    mode: TopKMode,
    child: SparkPlan)
    extends UnaryExecNode {

  override def output: Seq[Attribute] = child.output
  override def outputPartitioning: Partitioning = child.outputPartitioning
  override protected def withNewChildInternal(newChild: SparkPlan): SparkPlan =
    copy(child = newChild)

  override protected def doExecute(): RDD[InternalRow] =
    if (mode == DenseRankMode) doExecuteDenseRank()
    else doExecuteHeap()

  /** row_number / rank(): bounded per-key max-heaps of k rows. */
  private def doExecuteHeap(): RDD[InternalRow] =
    child.execute().mapPartitions({ it =>
      val keyProj = UnsafeProjection.create(partitionExprs, child.output)
      val ord = GenerateOrdering.generate(order, child.output)
      // max-heap: head is the WORST retained row; evict it when a better
      // (ordering-smaller) row arrives and the heap is full
      val heaps = mutable.HashMap.empty[InternalRow, mutable.PriorityQueue[InternalRow]]
      // budget in ROWS, so large k shrinks the tracked-key count
      val maxTrackedKeys = math.max(1, TopKPartialExec.MaxBufferedRows / k)
      val rankTies = mode == RankMode
      val passthrough = it.flatMap { row =>
        val key = keyProj(row)
        heaps.get(key) match {
          case Some(heap) =>
            if (heap.size < k) { heap.enqueue(row.copy()); Iterator.empty }
            else {
              val cmp = ord.compare(row, heap.head)
              if (cmp < 0) {
                val evicted = heap.dequeue()
                heap.enqueue(row.copy())
                // rank() keeps boundary ties: the evicted worst row may tie
                // other retained rows and still rank <= k globally, so it
                // is NOT provably prunable — stream it through un-dropped.
                // (row_number over a total order can never need it.)
                if (rankTies) Iterator.single(evicted) else Iterator.empty
              } else if (cmp > 0) {
                // k rows all ordering-strictly-smaller exist locally, so
                // this row's global rank (and row number) exceeds k under
                // EITHER mode: prunable.
                Iterator.empty
              } else {
                // ties the current worst: for rank() it may share the k-th
                // rank, so it must survive to the final phase
                if (rankTies) Iterator.single(row) else Iterator.empty
              }
            }
          case None if heaps.size < maxTrackedKeys =>
            val heap = mutable.PriorityQueue.empty[InternalRow](ord)
            heap.enqueue(row.copy())
            heaps.put(key.copy(), heap)
            Iterator.empty
          case None => // over the row budget: stop pruning, stream through
            Iterator.single(row)
        }
      }
      passthrough ++ heaps.valuesIterator.flatMap(_.iterator)
    }, preservesPartitioning = true)

  /** dense_rank(): the qualifying ROW count per key is unbounded (every tie
    * of the k smallest distinct values survives), so nothing is buffered —
    * the phase tracks only the k smallest DISTINCT order values per key
    * (bounded: k representative rows) and streams each qualifying row
    * through immediately; rows strictly beyond the local k-th distinct
    * value are provably dense_rank > k and drop.
    */
  private def doExecuteDenseRank(): RDD[InternalRow] =
    child.execute().mapPartitions({ it =>
      val keyProj = UnsafeProjection.create(partitionExprs, child.output)
      val ord = GenerateOrdering.generate(order, child.output)
      implicit val rowOrd: Ordering[InternalRow] = new Ordering[InternalRow] {
        def compare(a: InternalRow, b: InternalRow): Int = ord.compare(a, b)
      }
      val valueSets = mutable.HashMap.empty[InternalRow, mutable.TreeSet[InternalRow]]
      val maxTrackedKeys = math.max(1, TopKPartialExec.MaxBufferedRows / k)
      it.filter { row =>
        val key = keyProj(row)
        valueSets.get(key) match {
          case Some(set) =>
            if (set.size < k) {
              if (!set.contains(row)) set.add(row.copy())
              true
            } else {
              val cmp = ord.compare(row, set.last)
              if (cmp > 0) false // k distinct strictly-smaller values exist
              else {
                if (cmp < 0 && !set.contains(row)) {
                  set.add(row.copy())
                  set.remove(set.last) // the old k-th value is now (k+1)-th
                }
                true
              }
            }
          case None if valueSets.size < maxTrackedKeys =>
            val set = mutable.TreeSet.empty[InternalRow]
            set.add(row.copy())
            valueSets.put(key.copy(), set)
            true
          case None => true // over budget: stop pruning, stream through
        }
      }
    }, preservesPartitioning = true)
}

object TopKPartialExec {
  /** Row-buffering budget per task — bounds partial-phase memory at
    * ~MaxBufferedRows row copies regardless of k or key cardinality
    * (tracked keys = MaxBufferedRows / k).
    */
  val MaxBufferedRows = 1 << 17

  /** Tracked-key budget at k=1 — kept for tests pinning the overflow path. */
  def MaxTrackedKeys: Int = MaxBufferedRows
}

/** Reduce-side phase: child is clustered on the keys and sorted by
  * (keys, order); stream each group emitting the first k rows with their
  * 1-based rank appended.
  */
case class TopKFinalExec(
    k: Int,
    partitionExprs: Seq[Expression],
    order: Seq[SortOrder],
    rankAttr: Attribute,
    mode: TopKMode,
    child: SparkPlan)
    extends UnaryExecNode {

  override def output: Seq[Attribute] = child.output :+ rankAttr

  override def requiredChildDistribution: Seq[Distribution] =
    if (partitionExprs.isEmpty) UnspecifiedDistribution :: Nil
    else ClusteredDistribution(partitionExprs) :: Nil

  override def requiredChildOrdering: Seq[Seq[SortOrder]] =
    Seq(partitionExprs.map(SortOrder(_, Ascending)) ++ order)

  override def outputOrdering: Seq[SortOrder] = child.outputOrdering
  override protected def withNewChildInternal(newChild: SparkPlan): SparkPlan =
    copy(child = newChild)

  override protected def doExecute(): RDD[InternalRow] =
    child.execute().mapPartitions({ it =>
      val keyProj = UnsafeProjection.create(partitionExprs, child.output)
      val toUnsafe = UnsafeProjection.create(output, output)
      val ord = GenerateOrdering.generate(order, child.output)
      var currentKey: InternalRow = null
      var pos = 0
      var rank = 0
      var prevRow: InternalRow = null
      val rankRow = new GenericInternalRow(1)
      val joined = new JoinedRow
      it.flatMap { row =>
        val key = keyProj(row)
        if (currentKey == null || key != currentKey) {
          currentKey = key.copy()
          pos = 0
          rank = 0
          prevRow = null
        }
        pos += 1
        // row_number(): rank IS the position (orderings in this engine's
        // queries are total, so ties cannot arise there); rank(): ties
        // share the first tied row's position; dense_rank(): consecutive
        // per distinct value. Ranks are non-decreasing within a key, so
        // once rank > k the rest of the group emits nothing and state
        // updates stop; prevRow is only re-copied when the order value
        // actually changed (ties keep the existing representative).
        mode match {
          case RowNumberMode => rank = pos
          case RankMode if rank <= k =>
            if (prevRow == null || ord.compare(row, prevRow) != 0) {
              rank = pos
              prevRow = row.copy()
            }
          case DenseRankMode if rank <= k =>
            if (prevRow == null || ord.compare(row, prevRow) != 0) {
              rank += 1
              prevRow = row.copy()
            }
          case _ => // rank already past k for this key: nothing can qualify
        }
        if (rank <= k) {
          rankRow.update(0, rank)
          Iterator.single(toUnsafe(joined(row, rankRow)))
        } else Iterator.empty
      }
    }, preservesPartitioning = true)
}

object TopKPerKey {
  /** SparkSessionExtensions hook (wired in GraftSession.build). */
  def install(e: SparkSessionExtensions): Unit = {
    e.injectOptimizerRule(_ => TopKRewriteRule)
    e.injectPlannerStrategy(_ => TopKStrategy)
  }
}
