package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Distributed as-of join: for every left row, the most recent right
  * row with the same key and `rightTime <= leftTime`.
  *
  * Spark has no native as-of join; the usual workarounds are a range
  * cross-join (quadratic) or per-key `mapPartitions` merges
  * (imperative). This implementation is the UNION + WINDOW
  * formulation: tag both inputs, union them, and let
  * `last_value(right payload) IGNORE NULLS` over
  * `(key ORDER BY time, side)` carry the latest right row forward
  * into each left row. One shuffle on the key, sorted once,
  * whole-stage codegen throughout — at 100 TB this is a single
  * sort-based pass per key group, the same shape as a sort-merge
  * join. Ties (rightTime == leftTime) match, because right rows sort
  * before left rows at equal timestamps.
  */
object AsOfJoin {
  /** @param left       left (probe) frame
    * @param right      right (reference) frame
    * @param leftKey    join key column name in `left`
    * @param rightKey   join key column name in `right`
    * @param leftTime   event-time column name in `left`
    * @param rightTime  event-time column name in `right`
    * @param rightCols  right columns to carry (must not clash with left)
    * @param joinType   "inner" (drop unmatched left rows) or "left"
    * @param direction  "backward" (latest right with rightTime <=
    *                   leftTime, the default) or "forward" (earliest
    *                   right with rightTime >= leftTime); ties match
    *                   in both directions
    */
  def apply(
      left: DataFrame, right: DataFrame,
      leftKey: String, rightKey: String,
      leftTime: String, rightTime: String,
      rightCols: Seq[String],
      joinType: String = "inner",
      direction: String = "backward"
  ): DataFrame = {
    require(joinType == "inner" || joinType == "left", s"unsupported joinType $joinType")
    require(direction == "backward" || direction == "forward", s"unsupported direction $direction")
    val leftCols = left.columns.toSeq

    // The whole right payload is carried as ONE struct so the window's
    // `last(_, ignoreNulls)` either takes the full latest right row or
    // none of it — carrying columns independently would backfill a
    // legitimately-NULL field from an OLDER right row, mixing
    // attributes of different right rows into one output row.
    val payloadType = right.select(struct(rightCols.map(col).toIndexedSeq: _*).as("__r"))
      .schema("__r").dataType

    val taggedLeft = left
      .withColumn("__k", col(leftKey))
      .withColumn("__t", col(leftTime))
      .withColumn("__side", lit(1))
      .select(Seq(col("__k"), col("__t"), col("__side"),
        lit(null).cast(payloadType).as("__r")) ++ leftCols.map(col): _*)

    val taggedRight = right
      .withColumn("__k", col(rightKey))
      .withColumn("__t", col(rightTime))
      .withColumn("__side", lit(0))
      .select(Seq(col("__k"), col("__t"), col("__side"),
        struct(rightCols.map(col).toIndexedSeq: _*).as("__r")) ++
        leftCols.map(c => lit(null).cast(left.schema(c).dataType).as(c)): _*)

    // forward as-of is the same carry scanned in reverse time order;
    // right rows sort before left at equal timestamps either way, so
    // ties match in both directions
    val timeOrder = if (direction == "backward") col("__t").asc else col("__t").desc
    val w = Window.partitionBy("__k").orderBy(timeOrder, col("__side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    val carried = taggedLeft.unionByName(taggedRight)
      .withColumn("__r", last(col("__r"), ignoreNulls = true).over(w))

    val leftRows = carried.where(col("__side") === 1)
    val filtered = if (joinType == "inner") leftRows.where(col("__r").isNotNull) else leftRows
    filtered
      .select(leftCols.map(col) ++ rightCols.map(c => col("__r").getField(c).as(c)): _*)
  }
}
