package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Registry of verified queries: name -> (spark, sfDir) -> DataFrame.
  *
  * Each entry is one row of SURVEY.md §2; [[Oracles]] carries the
  * DuckDB-equivalent SQL for the hash-checked ones. Column names and
  * rounding are part of the contract (SURVEY §3).
  */
object Queries {
  type Q = (SparkSession, String) => DataFrame

  def all: Map[String, Q] =
    QueriesEtl.all ++ QueriesAnalytics.all ++ QueriesText.all ++
      QueriesVector.all ++ QueriesScale.all ++ QueriesMart.all
}
