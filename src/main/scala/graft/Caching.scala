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
  /** Materialize `result` eagerly and release every `temps` frame's
    * block-manager storage. The returned frame scans the checkpointed
    * rows; the temps' lineage is no longer referenced.
    *
    * Use when the result is much smaller than the temps (candidate
    * pairs vs postings) — the checkpoint itself occupies storage until
    * the frame is garbage-collected or [[release]]d. */
  def reap(result: DataFrame)(temps: DataFrame*): DataFrame = {
    val out = result.localCheckpoint(eager = true)
    temps.foreach(_.unpersist(blocking = false))
    out
  }

  /** Release the block-manager storage behind a `localCheckpoint`ed
    * frame (the ContextCleaner would only reclaim it at some future
    * GC; iterative loops need each round freed deterministically). */
  def release(df: DataFrame): Unit =
    df.queryExecution.analyzed.collect { case lr: LogicalRDD => lr.rdd }
      .foreach(_.unpersist(blocking = false))
}
