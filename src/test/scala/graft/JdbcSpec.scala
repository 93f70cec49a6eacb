package graft

import java.util.Properties
import org.apache.spark.sql.SaveMode
import org.apache.spark.sql.functions._
import graft.sources.{JdbcSink, JdbcSource}

/** JDBC round-trip against embedded Derby (in-JVM, no server) — the
  * mart-egress path the reference drives against MySQL
  * (write/database_write.py, read/database_read.py). */
class JdbcSpec extends SparkSpec {
  private val url = "jdbc:derby:memory:graftjdbc;create=true"

  test("customer mart round-trips through a JDBC table") {
    val mart = QueriesEtl.customerMetrics(spark, sf)
      .select("c_custkey", "c_name", "total_orders", "total_spent")
    JdbcSink.write(mart, url, "customer_mart", mode = SaveMode.Overwrite)

    val back = JdbcSource.read(spark, url, "customer_mart")
    assert(back.count() == mart.count())
    // values survive: exact join compare, no row may differ
    val diff = back.join(mart,
        back("c_custkey") === mart("c_custkey") &&
          back("total_orders") === mart("total_orders") &&
          back("total_spent") === mart("total_spent"))
      .count()
    assert(diff == mart.count(), s"only $diff of ${mart.count()} rows matched")
  }

  test("partitioned read splits the scan into per-range tasks") {
    val src = Tables.customer(spark, sf).select("c_custkey", "c_acctbal")
    JdbcSink.write(src, url, "cust_part", mode = SaveMode.Overwrite)
    val maxKey = src.agg(max("c_custkey")).head.getLong(0)

    val part = JdbcSource.readPartitioned(
      spark, url, "cust_part", "c_custkey", 1L, maxKey, numPartitions = 4)
    assert(part.rdd.getNumPartitions == 4)
    assert(part.count() == src.count())
  }

  test("append mode accumulates, overwrite replaces") {
    val five = Tables.nation(spark, sf).select("n_nationkey", "n_name").limit(5)
    JdbcSink.write(five, url, "nations", mode = SaveMode.Overwrite)
    JdbcSink.write(five, url, "nations", mode = SaveMode.Append)
    assert(JdbcSource.read(spark, url, "nations").count() == 10)
    JdbcSink.write(five, url, "nations", mode = SaveMode.Overwrite)
    assert(JdbcSource.read(spark, url, "nations").count() == 5)
  }
}
