package graft
import org.apache.spark.sql.{SparkSession, DataFrame}

/** Driver contract — see /root/repo/SURVEY.md §2 for the inventory
  * each entry implements. Query bodies live in [[QueriesEtl]],
  * [[QueriesAnalytics]], [[QueriesText]], [[QueriesVector]]; oracle
  * SQL in [[Oracles]]. */
object SparkEntry {
  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    QueriesEtl.pricingSummary(GraftSession.tune(spark), "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    Queries.all.map { case (k, f) =>
      k -> ((s: SparkSession, dir: String) => f(GraftSession.tune(s), dir))
    }

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] = Oracles.all
}
