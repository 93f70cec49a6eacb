package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Bronze-layer rule-based ingestion gate.
  *
  * Re-expresses the reference's bronze validation split (reference
  * `src/main/main.py:104-137`): a conjunction of named rules divides
  * the raw frame into a valid set and a rejected set, where each
  * rejected row carries the FIRST failing rule's name as
  * `rejection_reason` (order matters — first match wins).
  *
  * Scale: both outputs are single-pass narrow filters over the scan —
  * no shuffle, and Catalyst pushes the conjunction into the parquet
  * reader (`PushedFilters`), so the valid path never materializes
  * rejected rows.
  */
object Bronze {
  /** A named validation rule: `cond` must hold for a row to be valid. */
  final case class Rule(name: String, cond: Column)

  def validCondition(rules: Seq[Rule]): Column =
    rules.map(_.cond).reduce(_ && _)

  /** First-match-wins rejection reason (reference main.py:118-127). */
  def rejectionReason(rules: Seq[Rule]): Column =
    rules
      .foldLeft(when(lit(false), lit(""))) { (acc, r) =>
        acc.when(!coalesce(r.cond, lit(false)), lit(r.name))
      }
      .otherwise(lit("UNKNOWN_REASON"))

  def valid(df: DataFrame, rules: Seq[Rule]): DataFrame =
    df.filter(validCondition(rules))

  def rejected(df: DataFrame, rules: Seq[Rule]): DataFrame =
    df.filter(!coalesce(validCondition(rules), lit(false)))
      .withColumn("rejection_reason", rejectionReason(rules))

  /** Stamp the ingestion date (reference main.py:100). Fixed date in
    * verified paths for determinism (SURVEY §3). */
  def stampIngestion(df: DataFrame, date: Column): DataFrame =
    df.withColumn("ingestion_date", date)

  /** Attach observed ingestion metrics to the frame: total rows,
    * valid rows, and per-rule violation counts are collected as a
    * side effect of whatever action runs downstream — ZERO extra
    * passes (the production alternative, a separate count job per
    * metric, rescans the input once per counter). Read results via
    * `org.apache.spark.sql.Observation` or a QueryExecutionListener. */
  def observed(df: DataFrame, rules: Seq[Rule],
               observation: org.apache.spark.sql.Observation): DataFrame = {
    val perRule = rules.map(r =>
      sum(when(!coalesce(r.cond, lit(false)), 1L).otherwise(0L)).as(s"violations_${r.name}"))
    val metrics = Seq(
      count(lit(1)).as("rows_total"),
      sum(when(validCondition(rules), 1L).otherwise(0L)).as("rows_valid")) ++ perRule
    df.observe(observation, metrics.head, metrics.tail: _*)
  }
}

/** Silver-layer cleaning operators (reference
  * `src/main/transformations/{customer,product,store,sales}_transform.py`).
  *
  * All operators are narrow (no shuffle) except [[Silver.dedupLatest]],
  * which shuffles once on the dedup key — and does so via `max_by`
  * aggregation rather than the reference's `row_number` window so the
  * shuffle benefits from map-side partial aggregation: each map task
  * emits at most one row per key instead of all rows. At 100 TB this
  * is the difference between shuffling the whole fact table and
  * shuffling roughly `keys × mapTasks` rows.
  */
object Silver {
  /** lower(trim(col)) standardization (customer_transform.py §1). */
  def standardize(df: DataFrame, cols: Seq[String]): DataFrame =
    cols.foldLeft(df)((d, c) => d.withColumn(c, lower(trim(col(c)))))

  /** Keep only digits; require at least `minDigits`, else NULL
    * (customer_transform.py §2 phone cleanup). */
  def digitsOnly(c: Column, minDigits: Int): Column = {
    val cleaned = regexp_replace(c, "[^0-9]", "")
    when(cleaned.rlike(s"^[0-9]{$minDigits,}$$"), cleaned).otherwise(lit(null))
  }

  /** If `target < floor` replace with `floor` (product_transform.py §3
    * `updated_date < created_date` correction). */
  def clampDateToFloor(target: Column, floor: Column): Column =
    when(target < floor, floor).otherwise(target)

  /** Latest-record-wins dedup per `keys`, ordered by `orderCols`
    * (descending, lexicographic) with the LAST orderCol expected to be
    * a unique tiebreaker (customer_transform.py §5).
    *
    * `max_by(struct(all cols), struct(orderCols))` does a partial
    * (map-side) aggregate — strictly less shuffle than
    * window+row_number+filter at any scale.
    */
  def dedupLatest(df: DataFrame, keys: Seq[String], orderCols: Seq[Column]): DataFrame = {
    val payload = struct(df.columns.map(col).toIndexedSeq: _*)
    val ordering = struct(orderCols.toIndexedSeq: _*)
    df.groupBy(keys.map(col).toIndexedSeq: _*)
      .agg(max_by(payload, ordering).as("__latest"))
      .select("__latest.*")
  }
}
