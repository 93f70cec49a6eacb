package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distributed MERGE (upsert + delete) into a snapshot.
  *
  * The reference applies incremental loads by full rewrite of the
  * silver table; the general ETL primitive is MERGE: given a base
  * snapshot and a change batch tagged with an operation column,
  * produce the next snapshot — update-else-insert for upserts,
  * removal for deletes.
  *
  * Implementation is two hash-joins' worth of work, all distributed:
  * one left-anti join removes every base row whose key appears in the
  * change batch (superseded or deleted), then the upsert rows are
  * appended. No driver materialization, no per-key loops; both
  * shuffles key on the merge key, so AQE co-plans them, and at 100 TB
  * the change batch (typically ≪ base) broadcast-joins against the
  * base scan.
  */
object Upsert {
  /** Merge `changes` into `base`.
    *
    * @param base    current snapshot
    * @param changes change batch: base's columns plus `opCol`
    * @param keys    merge key columns
    * @param opCol   operation column in `changes`: "D" = delete the
    *                key, anything else = upsert the row
    */
  def apply(base: DataFrame, changes: DataFrame, keys: Seq[String], opCol: String): DataFrame = {
    val touched = changes.select(keys.map(col).toIndexedSeq: _*).distinct()
    val upserts = changes.filter(col(opCol) =!= "D").drop(opCol)
    base.join(touched, keys, "left_anti").unionByName(upserts)
  }
}
