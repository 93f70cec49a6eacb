package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Embedding similarity / ANN verified queries (SURVEY §2 #26–#28).
  * Filled in build-plan step 6. */
object QueriesVector {
  import Queries.Q
  def all: Map[String, Q] = Map()
}
