package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Text-analysis + document-dedup verified queries (SURVEY §2
  * #22–#25, #29–#33). Filled in build-plan step 5/7. */
object QueriesText {
  import Queries.Q
  def all: Map[String, Q] = Map()
}
