package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.LogicalRDD

/** Cache scoping for multi-consumer operator pipelines.
  *
  * Operators that persist an intermediate consumed by several plan
  * branches (postings, signatures, inverted lists) must not leak that
  * storage past their own lifetime: in a long-lived session running
  * many queries, leaked blocks accumulate in the block manager and
  * the resulting GC pressure taxes every *later* query (the round-2
  * bench regression cluster was exactly this).
  *
  * [[reap]] is the owning-handle pattern in one move: eagerly
  * materialize the operator's (small) result via an executor-local
  * checkpoint — cutting its lineage over the temps — then release the
  * temps' storage. The caller receives a frame whose storage is the
  * result rows only.
  */
object Caching {
  /** Share a multi-consumer intermediate: materialize it ONCE so the
    * consumers never re-execute the subtree. Two interchangeable
    * mechanisms, switched by `spark.graft.share.mode`:
    *
    *  - `checkpoint` (default): eager `localCheckpoint` — rows land in
    *    the block manager as plain serialized row blocks
    *    (MEMORY_AND_DISK). Build cost is one serialization pass;
    *    consumers deserialize rows directly.
    *  - `persist`: lazy columnar cache (`InMemoryRelation`). Build
    *    additionally pays per-column encoding + compression; reads pay
    *    decode. Kept as the fallback because it preserves lineage
    *    (an executor loss recomputes instead of failing the job).
    *
    * Measured on the sf0.1 bench (OPTIMIZATION_r17.md §2): the
    * checkpoint mode is 10–25% faster end-to-end on every
    * postings/grain-persist query, same result rows. At cluster scale
    * both levels spill to disk and hold exactly one copy of the rows;
    * the lineage-truncation trade (guide §5: fine when the
    * intermediate is not the job's sole fault-tolerance point) is the
    * same one [[reap]] already makes for results. */
  def share(df: DataFrame): DataFrame = {
    val mode =
      try df.sparkSession.conf.get("spark.graft.share.mode", "checkpoint")
      catch { case _: Throwable => "checkpoint" }
    if (mode == "persist")
      df.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    else df.localCheckpoint(eager = true)
  }

  /** Materialize `result` eagerly and release every `temps` frame's
    * block-manager storage. The returned frame scans the checkpointed
    * rows; the temps' lineage is no longer referenced.
    *
    * Use when the result is much smaller than the temps (candidate
    * pairs vs postings) — the checkpoint itself occupies storage until
    * the frame is garbage-collected or [[release]]d. */
  def reap(result: DataFrame)(temps: DataFrame*): DataFrame = {
    val out = result.localCheckpoint(eager = true)
    temps.foreach(unshare)
    out
  }

  /** Release a [[share]]d frame's storage regardless of mode:
    * `unpersist` covers the persist-mode columnar cache (and plain
    * `.persist` frames), [[release]] covers the checkpoint-mode
    * LogicalRDD blocks, for which `Dataset.unpersist` is a no-op
    * (localCheckpoint RDDs never enter the cacheManager). Callers that
    * hold a share past a [[reap]] — or never reap at all — must route
    * their cleanup here, not through a bare `.unpersist`. */
  def unshare(df: DataFrame): Unit = {
    df.unpersist(blocking = false)
    release(df)
  }

  /** Release the block-manager storage behind a `localCheckpoint`ed
    * frame (the ContextCleaner would only reclaim it at some future
    * GC; iterative loops need each round freed deterministically).
    *
    * Only fires when the frame's plan ROOT is itself the checkpoint's
    * LogicalRDD — i.e. the frame IS the checkpoint handle. Releasing
    * every LogicalRDD found anywhere in a plan would let a frame
    * merely DERIVED from a still-live checkpointed share drop that
    * share's blocks, which a localCheckpoint cannot recompute
    * ("checkpoint block not found" on the next consumer). A derived
    * frame is a no-op here; its underlying share is released by
    * whoever owns the share handle. */
  def release(df: DataFrame): Unit =
    df.queryExecution.analyzed match {
      case lr: LogicalRDD => lr.rdd.unpersist(blocking = false)
      case _ => ()
    }
}
