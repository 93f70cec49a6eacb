package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Incremental batch pipeline: watermark → filtered read →
  * transform → sink → advance watermark (the reference's
  * `main.py` incremental mode + `watermark_manager.py` loop).
  *
  * The caller supplies a predicate builder so the comparison happens
  * in whatever domain PUSHES DOWN for the source (the stored ts type
  * for the events parquet — see `Tables.eventsAfter`); an
  * incremental read whose filter doesn't reach the scan re-reads
  * history forever. A safety `bufferSeconds` re-reads a small overlap
  * for late arrivals, mirroring the reference's `buffer_minutes`
  * (dedup downstream handles the overlap — exactly what
  * `Silver.dedupLatest` is for).
  */
final class IncrementalRunner(store: WatermarkStore, entity: String, bufferSeconds: Long = 300L) {

  /** Current effective lower bound: stored mark minus buffer, as
    * "yyyy-MM-dd HH:mm:ss". */
  def lowerBound(): String = {
    val f = java.time.format.DateTimeFormatter.ofPattern("yyyy-MM-dd HH:mm:ss")
    java.time.LocalDateTime.parse(store.get(entity), f).minusSeconds(bufferSeconds).format(f)
  }

  /** One incremental tick:
    * @param read    bound-string -> new-rows frame (filter must push)
    * @param process the batch transform
    * @param sink    persists the processed rows
    * @param maxTs   expression extracting the max event time of the
    *                PROCESSED frame, as "yyyy-MM-dd HH:mm:ss" string
    * @return (processed row count, new watermark if advanced)
    */
  def tick(
      read: String => DataFrame,
      process: DataFrame => DataFrame,
      sink: DataFrame => Unit,
      maxTs: Column
  ): (Long, Option[String]) = {
    val fresh = read(lowerBound())
    val out = process(fresh)
    // single pass computes count + max watermark, then sink writes;
    // at scale prefer sinking first and reading the sink's stats
    val stats = out.agg(count(lit(1)).as("n"), max(maxTs).as("m")).collect()(0)
    val n = stats.getLong(0)
    if (n == 0) (0L, None)
    else {
      sink(out)
      val mark = stats.getString(1)
      store.update(entity, mark)
      (n, Some(mark))
    }
  }
}
