package org.apache.spark.sql.graftbridge

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, Expression, SortOrder, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, UnaryNode}
import org.apache.spark.sql.catalyst.plans.physical.{AllTuples, ClusteredDistribution, Distribution}
import org.apache.spark.sql.classic.Dataset
import org.apache.spark.sql.execution.{SparkPlan, SparkStrategy, UnaryExecNode}

/** Whole-operator custom plan: exact top-k rows per key — the missing
  * native shape behind every "best k per group" query. The DataFrame
  * idiom (`row_number() OVER (PARTITION BY key ORDER BY s) <= k`)
  * shuffles and sorts EVERY row; this operator runs the textbook
  * two-phase bounded-heap plan instead:
  *
  *   `TopKPerKeyFinal ← Exchange(key) ← TopKPerKeyPartial ← child`
  *
  * The partial keeps one k-row heap per key per input partition, so at
  * most `partitions × keys × k` rows reach the exchange — the same
  * map-side reduction Spark's own TakeOrderedAndProject applies to
  * global LIMIT, generalized per key (and the reference's combiner
  * discipline applied to a non-algebraic aggregate). The final node
  * declares `ClusteredDistribution(keys)` and re-runs the identical
  * kernel on the collected candidates, which is exact: a key's global
  * top-k is contained in the union of its per-partition top-ks.
  *
  * Ordering contract: `order` ASCENDING decides survivors ("k smallest";
  * wrap/negate for descending), and MUST be a total order per key
  * (include a tiebreaker) for a deterministic result — the
  * [[graft.operators.SortOps.globalRowNumber]] contract.
  *
  * Registered as a real `SparkStrategy` (planner injection), with the
  * logical node / strategy / physical nodes living in the sql package
  * the way connector libraries ship custom operators. */
case class TopKPerKeyNode(
    keys: Seq[Expression], order: Expression, k: Int, child: LogicalPlan)
  extends UnaryNode {
  override def output: Seq[Attribute] = child.output
  override protected def withNewChildInternal(newChild: LogicalPlan)
      : TopKPerKeyNode = copy(child = newChild)
}

/** Shared bounded-heap kernel: one pass, one k-heap per key.
  *
  * Memory contract: the hash map holds one k-row heap per DISTINCT KEY
  * seen since the last flush. `flushKeys` bounds that footprint — when
  * the map reaches `flushKeys` keys, every buffered heap is emitted as
  * candidates and the map clears. Flushing never loses exactness: a row
  * evicted from a heap lost to k rows of its own key in this partition,
  * and those k rows ARE emitted as candidates, so the evicted row
  * provably cannot be in the key's global top-k. The only cost of a
  * flush is extra candidate rows crossing the exchange (the same
  * degradation Spark's ObjectHashAggregate takes when it falls back to
  * sort-based). The FINAL pass must not flush (it must see each key's
  * full candidate set to emit exactly k) — it passes
  * `flushKeys = Int.MaxValue`; its per-partition key count is
  * `total keys / shuffle partitions`, which scales out with the
  * cluster rather than with the data. */
private[graftbridge] object TopKPerKeyKernel {
  def topK(
      it: Iterator[InternalRow],
      keys: Seq[Expression], order: Expression, k: Int,
      inputAttrs: Seq[Attribute],
      flushKeys: Int = Int.MaxValue): Iterator[InternalRow] = {
    val keyProj = UnsafeProjection.create(keys, inputAttrs)
    val ord = org.apache.spark.sql.catalyst.expressions.RowOrdering
      .create(Seq(SortOrder(order, Ascending)), inputAttrs)
    // max-heap: the WORST surviving row (largest by the ascending
    // order) sits at the root and is evicted first
    val worstFirst = new java.util.Comparator[InternalRow] {
      override def compare(a: InternalRow, b: InternalRow): Int =
        ord.compare(b, a)
    }
    val heaps = new java.util.HashMap[UnsafeRow,
      java.util.PriorityQueue[InternalRow]]()
    new Iterator[InternalRow] {
      private var pending: java.util.Iterator[InternalRow] =
        java.util.Collections.emptyIterator()
      private def pump(): Unit =
        while (!pending.hasNext && (it.hasNext || !heaps.isEmpty)) {
          var flushed = false
          while (it.hasNext && !flushed) {
            val row = it.next()
            val key = keyProj(row)
            var heap = heaps.get(key)
            if (heap == null) {
              heap = new java.util.PriorityQueue[InternalRow](
                math.max(1, k), worstFirst)
              heaps.put(key.copy(), heap)
            }
            if (heap.size < k) heap.offer(row.copy())
            else if (ord.compare(row, heap.peek()) < 0) {
              heap.poll()
              heap.offer(row.copy())
            }
            if (heaps.size >= flushKeys) flushed = true
          }
          if (flushed || !it.hasNext) {
            val buf = new java.util.ArrayList[InternalRow]()
            heaps.values().forEach(h => buf.addAll(h))
            heaps.clear()
            pending = buf.iterator()
          }
        }
      override def hasNext: Boolean = { pump(); pending.hasNext }
      override def next(): InternalRow = { pump(); pending.next() }
    }
  }
}

case class TopKPerKeyPartialExec(
    keys: Seq[Expression], order: Expression, k: Int, child: SparkPlan)
  extends UnaryExecNode {
  override def output: Seq[Attribute] = child.output
  override protected def doExecute(): RDD[InternalRow] = {
    // bound the partial's footprint to flushKeys × k rows per task: an
    // input partition can contain EVERY key, so the map is otherwise
    // O(distinct keys). Flushing trades extra exchange rows for bounded
    // memory and stays exact (kernel doc).
    val flushKeys = conf.getConfString(
      TopKPerKey.FlushKeysConf, (1 << 16).toString).toInt
    child.execute().mapPartitionsInternal(
      TopKPerKeyKernel.topK(_, keys, order, k, child.output, flushKeys))
  }
  override protected def withNewChildInternal(newChild: SparkPlan)
      : TopKPerKeyPartialExec = copy(child = newChild)
}

case class TopKPerKeyFinalExec(
    keys: Seq[Expression], order: Expression, k: Int, child: SparkPlan)
  extends UnaryExecNode {
  override def output: Seq[Attribute] = child.output
  // no keys = ONE global top-k: every candidate must meet in a single
  // partition (AllTuples) — UnspecifiedDistribution would leave the
  // final running per partition and return partitions × k rows
  override def requiredChildDistribution: Seq[Distribution] =
    if (keys.isEmpty) AllTuples :: Nil
    else ClusteredDistribution(keys) :: Nil
  override protected def doExecute(): RDD[InternalRow] =
    child.execute().mapPartitionsInternal(
      TopKPerKeyKernel.topK(_, keys, order, k, child.output))
  override protected def withNewChildInternal(newChild: SparkPlan)
      : TopKPerKeyFinalExec = copy(child = newChild)
}

object TopKPerKeyStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case TopKPerKeyNode(keys, order, k, child) =>
      TopKPerKeyFinalExec(keys, order, k,
        TopKPerKeyPartialExec(keys, order, k, planLater(child))) :: Nil
    case _ => Nil
  }
}

/** User-facing builder: `TopKPerKey(df, keys, order, k)` returns the k
  * rows with the SMALLEST `order` value per key (total order required).
  * Installs the planner strategy into the session once, idempotently. */
object TopKPerKey {
  /** Session conf bounding the partial's per-task key map (see kernel
    * doc); default 65536 keys ⇒ at most 65536·k buffered rows. */
  val FlushKeysConf = "spark.graft.topKPerKey.flushKeys"

  def ensureStrategy(spark: SparkSession): Unit = synchronized {
    if (!spark.experimental.extraStrategies.contains(TopKPerKeyStrategy))
      spark.experimental.extraStrategies =
        spark.experimental.extraStrategies :+ TopKPerKeyStrategy
  }

  def apply(df: DataFrame, keys: Seq[Column], order: Column, k: Int)
      : DataFrame = {
    require(k >= 1, s"k must be >= 1: $k")
    ensureStrategy(df.sparkSession)
    // a Column off the public API is an unresolved ColumnNode — project
    // keys/order into helper columns first, so the custom node only ever
    // holds RESOLVED attributes of its analyzed child. Helper names are
    // uniquified against the input columns so a user column literally
    // named __tpk_k0 can neither be mis-bound nor make the final
    // projection ambiguous.
    val taken = df.columns.toSet
    def fresh(n: String): String = {
      var c = n; while (taken(c)) c = "_" + c; c
    }
    val keyNames = keys.indices.map(i => fresh(s"__tpk_k$i"))
    val augmented = df.select(
      (df.columns.map(col).toSeq ++
        keys.zip(keyNames).map { case (c, n) => c.as(n) } :+
        order.as(fresh("__tpk_ord"))): _*)
    val analyzed = augmented.queryExecution.analyzed
    // resolve the helper columns BY POSITION (they were appended last):
    // name-based lookup would bind an input column that happens to be
    // called __tpk_k0/__tpk_ord and silently rank by the wrong key
    val helperAttrs = analyzed.output.takeRight(keys.length + 1)
    val keyAttrs = helperAttrs.dropRight(1)
    val ordAttr = helperAttrs.last
    Dataset.ofRows(df.sparkSession.asInstanceOf[
        org.apache.spark.sql.classic.SparkSession],
      TopKPerKeyNode(keyAttrs, ordAttr, k, analyzed))
      .select(df.columns.map(col).toSeq: _*)
  }
}
