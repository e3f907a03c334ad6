package graft.core

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.execution.LogicalRDD

/** Deterministic cleanup for eager `localCheckpoint` state.
  *
  * Iterative operators (pagerank, BFS, k-core, the connected-components
  * rounds) re-assign `state = next.localCheckpoint()` each round. The
  * superseded round's blocks are pinned at the checkpoint storage level and
  * are only reclaimed when the ContextCleaner notices the dropped JVM
  * reference after a GC — in a long session (or a 20-iteration PageRank over
  * a 100 TB-derived rank table) that lets stale copies of the iterated state
  * accumulate in executor storage. `Dataset.unpersist()` does NOT help: it
  * only evicts CacheManager entries (from `persist`/`cache`), and a local
  * checkpoint's RDD blocks never enter the CacheManager.
  *
  * [[release]] frees those blocks explicitly: a Dataset returned by
  * `localCheckpoint()` analyzes to a root [[LogicalRDD]] whose `rdd` holds
  * the pinned blocks, and unpersisting that RDD drops them immediately.
  *
  * Safety contract: only call release on a checkpoint you own, AFTER the
  * value that supersedes it is itself an eager checkpoint (fully
  * materialized, so nothing can ever recompute through the released blocks).
  * The root-match is deliberate — a Dataset *derived* from a checkpoint
  * (e.g. the pre-loop `nodes.select(...)` seed) is left untouched rather
  * than traversed, so shared upstream checkpoints can never be freed by
  * accident.
  */
object Checkpoints {

  /** Free the storage blocks behind an eager `localCheckpoint` result.
    * No-op (by design) when `ds` is not itself a checkpoint. */
  def release(ds: Dataset[_]): Unit =
    ds.queryExecution.analyzed match {
      case lr: LogicalRDD => lr.rdd.unpersist(blocking = false)
      case _              => ()
    }

  /** Release several checkpoints (order-independent). */
  def releaseAll(ds: Dataset[_]*): Unit = ds.foreach(release)

  /** Free EVERY persisted RDD reachable from `ds`'s physical lineage —
    * for results built *on top of* a pinned checkpoint (the two-level
    * templates in [[graft.operators.SortOps]] return a lazy map over
    * their internally-checkpointed sort), where [[release]]'s root-only
    * match can't see the pinned blocks.
    *
    * Stronger ownership contract than [[release]]: the caller asserts the
    * WHOLE lineage is private — nothing else will ever read any persisted
    * RDD under `ds`. Use it in chained operators right after the next
    * stage has eagerly materialized (e.g. cusumWide releases its cumsum
    * intermediate once groupedRunningMin has checkpointed its own input);
    * never on a dataset sharing a cached/checkpointed ancestor. */
  def releaseLineage(ds: Dataset[_]): Unit = {
    val seen = scala.collection.mutable.Set.empty[Int]
    def walk(rdd: org.apache.spark.rdd.RDD[_]): Unit =
      if (seen.add(rdd.id)) {
        if (rdd.getStorageLevel != org.apache.spark.storage.StorageLevel.NONE)
          rdd.unpersist(blocking = false)
        rdd.dependencies.foreach(d => walk(d.rdd))
      }
    walk(ds.queryExecution.toRdd)
  }
}
