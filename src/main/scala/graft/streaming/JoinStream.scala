package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Watermarked stream-stream interval join: last-touch-style
  * attribution pairing every purchase with the same user's clicks
  * inside a trailing horizon — the canonical two-unbounded-sides join
  * Structured Streaming supports ONLY under an event-time interval
  * plus watermarks on both inputs.
  *
  * Why this shape scales: the equi-key (user) drives a streaming
  * symmetric hash join partitioned by user, and the interval bound +
  * watermark give the engine an eviction rule — a buffered click is
  * droppable once the purchase-side watermark passes
  * `click_ts + horizon`, so per-partition state is bounded by (rate ×
  * horizon), independent of stream lifetime. Without the interval
  * condition Spark would (rightly) reject the join: unbounded state
  * on both sides. Joining a stream to a DIMENSION is different —
  * that's a plain stream-static join with no state at all (used by
  * [[MedallionStream]]'s silver enrichment); this operator exists for
  * the fact×fact case.
  *
  * Append-mode output: a pair emits once both sides have arrived and
  * can never retract, so downstream conversion rollups are ordinary
  * streaming aggregations.
  *
  * Inputs carry `(user_id, event_id, ts)`; output one row per
  * (purchase, qualifying click) with the click→purchase lag.
  */
object JoinStream {
  /** @param horizonSeconds max click→purchase gap (inclusive); the
    *                       state-retention bound.
    * @param watermark      allowed lateness on BOTH streams, e.g.
    *                       "10 minutes". */
  def attribution(clicks: DataFrame, purchases: DataFrame,
      horizonSeconds: Long, watermark: String): DataFrame = {
    val c = clicks
      .select(col("user_id").as("c_user"), col("event_id").as("click_id"),
        col("ts").as("click_ts"))
      .withWatermark("click_ts", watermark)
    val p = purchases
      .select(col("user_id"), col("event_id").as("purchase_id"),
        col("ts").as("purchase_ts"))
      .withWatermark("purchase_ts", watermark)
    p.join(c,
      col("c_user") === col("user_id") &&
        col("click_ts") <= col("purchase_ts") &&
        col("click_ts") >= col("purchase_ts") - expr(s"INTERVAL $horizonSeconds SECONDS"),
      "inner")
      .select(col("user_id"), col("purchase_id"), col("purchase_ts"),
        col("click_id"), col("click_ts"),
        (unix_timestamp(col("purchase_ts")) - unix_timestamp(col("click_ts")))
          .as("lag_seconds"))
  }

  /** Batch twin on identical frames — the correctness oracle for the
    * streaming path (replay equivalence, spec-asserted). */
  def attributionBatch(clicks: DataFrame, purchases: DataFrame,
      horizonSeconds: Long): DataFrame = {
    val c = clicks.select(col("user_id").as("c_user"),
      col("event_id").as("click_id"), col("ts").as("click_ts"))
    val p = purchases.select(col("user_id"),
      col("event_id").as("purchase_id"), col("ts").as("purchase_ts"))
    p.join(c,
      col("c_user") === col("user_id") &&
        col("click_ts") <= col("purchase_ts") &&
        col("click_ts") >= col("purchase_ts") - expr(s"INTERVAL $horizonSeconds SECONDS"),
      "inner")
      .select(col("user_id"), col("purchase_id"), col("purchase_ts"),
        col("click_id"), col("click_ts"),
        (unix_timestamp(col("purchase_ts")) - unix_timestamp(col("click_ts")))
          .as("lag_seconds"))
  }
}
