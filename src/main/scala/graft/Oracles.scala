package graft

/** DuckDB-equivalent ANSI SQL for each hash-checked query in
  * [[Queries]]. Aliases, rounding, literals, and tiebreaks mirror the
  * Spark plans exactly (SURVEY §3). Queries absent here get the
  * driver's rows-only check (non-SQL-expressible operators).
  *
  * Money math mirrors [[graft.functions.Money]]: DECIMAL(12,2)
  * arithmetic, sums emitted as doubles of the exact value, averages
  * via `(2u+n) // (2n)` integer half-up — so Spark and DuckDB produce
  * bit-identical doubles.
  */
object Oracles {
  /** Exact sum of a 2-decimal money column, as double. */
  private def sumx(c: String) = s"CAST(sum(CAST($c AS DECIMAL(12,2))) AS DOUBLE)"

  /** Exact half-up average with `d` decimals (Money.avgFromScaled). */
  private def avgd(c: String, d: Int, n: String = "count(*)") = {
    val p = math.pow(10, d).toLong
    s"CAST((2*CAST(sum(CAST($c AS DECIMAL(12,2)) * $p) AS BIGINT) + $n) // (2*$n) AS DOUBLE)/$p.0"
  }

  /** Exact discounted revenue sum. */
  private val rev =
    "CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2)) * (1 - CAST(l_discount AS DECIMAL(12,2)))) AS DOUBLE)"

  val etl: Map[String, String] = Map(
    "q_pricing_summary" ->
      s"""SELECT l_returnflag, l_linestatus,
        |  ${sumx("l_quantity")} AS sum_qty,
        |  ${sumx("l_extendedprice")} AS sum_base_price,
        |  $rev AS sum_disc_price,
        |  CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2)) * (1 - CAST(l_discount AS DECIMAL(12,2))) * (1 + CAST(l_tax AS DECIMAL(12,2)))) AS DOUBLE) AS sum_charge,
        |  ${avgd("l_quantity", 4)} AS avg_qty,
        |  ${avgd("l_extendedprice", 4)} AS avg_price,
        |  ${avgd("l_discount", 4)} AS avg_disc,
        |  count(*) AS count_order
        |FROM lineitem
        |WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
        |GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin,
    "q_bronze_valid" ->
      """SELECT *, DATE '2026-08-12' AS ingestion_date FROM lineitem
        |WHERE l_orderkey IS NOT NULL AND l_quantity > 0
        |  AND l_extendedprice > 0
        |  AND l_discount BETWEEN 0.0 AND 0.05
        |  AND l_shipdate IS NOT NULL""".stripMargin,
    "q_bronze_rejected" ->
      """SELECT *,
        |  CASE
        |    WHEN l_orderkey IS NULL THEN 'NULL_ORDER_KEY'
        |    WHEN NOT coalesce(l_quantity > 0, FALSE) THEN 'INVALID_QUANTITY'
        |    WHEN NOT coalesce(l_extendedprice > 0, FALSE) THEN 'INVALID_PRICE'
        |    WHEN NOT coalesce(l_discount BETWEEN 0.0 AND 0.05, FALSE) THEN 'DISCOUNT_OUT_OF_RANGE'
        |    WHEN l_shipdate IS NULL THEN 'NULL_SHIP_DATE'
        |    ELSE 'UNKNOWN_REASON'
        |  END AS rejection_reason,
        |  DATE '2026-08-12' AS ingestion_date
        |FROM lineitem
        |WHERE NOT coalesce(
        |  l_orderkey IS NOT NULL AND l_quantity > 0 AND l_extendedprice > 0
        |  AND l_discount BETWEEN 0.0 AND 0.05 AND l_shipdate IS NOT NULL, FALSE)""".stripMargin,
    "q_silver_standardize" ->
      """SELECT c_custkey, lower(trim(c_name)) AS c_name,
        |  lower(trim(c_mktsegment)) AS c_mktsegment, c_acctbal
        |FROM customer""".stripMargin,
    "q_regex_clean" ->
      """SELECT event_id, props,
        |  CASE WHEN regexp_matches(regexp_replace(props, '[^0-9]', '', 'g'), '^[0-9]{2,}$')
        |       THEN regexp_replace(props, '[^0-9]', '', 'g') END AS code
        |FROM events""".stripMargin,
    "q_date_fix" ->
      """SELECT l_orderkey, l_linenumber, l_shipdate, o_orderdate,
        |  CASE WHEN l_shipdate < o_orderdate THEN o_orderdate ELSE l_shipdate END AS fixed_shipdate
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey""".stripMargin,
    "q_dedup_latest" ->
      """SELECT user_id, event_id, ts_s, event_type, value FROM (
        |  SELECT user_id, event_id, CAST(date_trunc('second', ts) AS TIMESTAMP) AS ts_s,
        |         event_type, value,
        |         row_number() OVER (PARTITION BY user_id
        |           ORDER BY date_trunc('second', ts) DESC, event_id DESC) AS rn
        |  FROM events) t
        |WHERE rn = 1""".stripMargin,
    "q_scd2" ->
      """WITH existing AS (
        |  SELECT c_custkey, c_name, c_mktsegment, c_acctbal FROM customer
        |), incoming AS (
        |  SELECT c_custkey, c_name,
        |         CASE WHEN c_custkey % 10 = 0 THEN 'MOVED' ELSE c_mktsegment END AS c_mktsegment,
        |         c_acctbal
        |  FROM customer WHERE c_custkey % 10 <> 5
        |  UNION ALL
        |  SELECT c_custkey + 1000000, c_name || '_new', c_mktsegment, 0.0
        |  FROM customer WHERE c_custkey % 10 = 3
        |), changed AS (
        |  SELECT i.c_custkey FROM incoming i JOIN existing e USING (c_custkey)
        |  WHERE i.c_name <> e.c_name OR i.c_mktsegment <> e.c_mktsegment
        |)
        |SELECT e.c_custkey, e.c_name, e.c_mktsegment, e.c_acctbal,
        |       DATE '2020-01-01' AS valid_from,
        |       CASE WHEN ch.c_custkey IS NOT NULL THEN DATE '2026-08-01' END AS valid_to,
        |       (ch.c_custkey IS NULL) AS is_current
        |FROM existing e LEFT JOIN changed ch ON e.c_custkey = ch.c_custkey
        |UNION ALL
        |SELECT i.c_custkey, i.c_name, i.c_mktsegment, i.c_acctbal,
        |       DATE '2026-08-01', NULL, TRUE
        |FROM incoming i LEFT JOIN existing e ON i.c_custkey = e.c_custkey
        |WHERE e.c_custkey IS NULL
        |UNION ALL
        |SELECT i.c_custkey, i.c_name, i.c_mktsegment, i.c_acctbal,
        |       DATE '2026-08-01', NULL, TRUE
        |FROM incoming i JOIN changed ch ON i.c_custkey = ch.c_custkey""".stripMargin,
    "q_gold_enriched" ->
      """SELECT l_orderkey, l_linenumber, o_orderdate, o_orderpriority,
        |  c_name AS customer_name, n_name AS nation, r_name AS region,
        |  p_name AS part_name, p_brand AS brand, p_type AS category,
        |  s_name AS supplier_name,
        |  l_quantity AS quantity, l_extendedprice AS price, l_discount AS discount,
        |  CAST(round(CAST(l_extendedprice AS DECIMAL(12,2)) * (1 - CAST(l_discount AS DECIMAL(12,2))), 2) AS DOUBLE) AS revenue
        |FROM lineitem
        |JOIN orders   ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation   ON c_nationkey = n_nationkey
        |JOIN region   ON n_regionkey = r_regionkey
        |JOIN part     ON l_partkey = p_partkey
        |JOIN supplier ON l_suppkey = s_suppkey""".stripMargin,
    "q_customer_metrics" ->
      s"""SELECT c.c_custkey, c.c_name, c.c_mktsegment,
        |  m.total_orders, m.total_spent, m.avg_order_value,
        |  m.first_purchase_date, m.last_purchase_date
        |FROM (SELECT o_custkey, count(*) AS total_orders,
        |        ${sumx("o_totalprice")} AS total_spent,
        |        ${avgd("o_totalprice", 2)} AS avg_order_value,
        |        min(o_orderdate) AS first_purchase_date,
        |        max(o_orderdate) AS last_purchase_date
        |      FROM orders GROUP BY o_custkey) m
        |JOIN customer c ON m.o_custkey = c.c_custkey""".stripMargin,
    "q_customer_monthly_mart" ->
      s"""SELECT c.c_custkey, c.c_name, m.sales_month, m.total_sales, m.n_orders
        |FROM (SELECT o_custkey,
        |        CAST(date_trunc('month', o_orderdate) AS TIMESTAMP) AS sales_month,
        |        ${sumx("o_totalprice")} AS total_sales,
        |        count(*) AS n_orders
        |      FROM orders GROUP BY 1, 2) m
        |JOIN customer c ON m.o_custkey = c.c_custkey""".stripMargin,
    "q_incremental_read" ->
      """SELECT event_id, user_id, event_type,
        |  CAST(date_trunc('second', ts) AS TIMESTAMP) AS ts_s, value
        |FROM events WHERE ts > TIMESTAMP '2024-01-15 00:00:00'""".stripMargin,
    "q_dq_summary" ->
      """WITH agg AS (
        |  SELECT count(*) AS row_count,
        |    CAST(sum(CASE WHEN o_custkey IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS not_null_custkey_violations,
        |    count(*) - count(DISTINCT o_orderkey) AS unique_orderkey_violations,
        |    CAST(sum(CASE WHEN NOT (o_totalprice BETWEEN 0.0 AND 1000000.0) THEN 1 ELSE 0 END) AS BIGINT) AS range_totalprice_violations,
        |    CAST(sum(CASE WHEN NOT regexp_matches(o_orderpriority, '^[1-5]-') THEN 1 ELSE 0 END) AS BIGINT) AS regex_priority_violations
        |  FROM orders)
        |SELECT check_name, check_value FROM (
        |  SELECT 'row_count' AS check_name, row_count AS check_value FROM agg
        |  UNION ALL SELECT 'not_null_custkey_violations', not_null_custkey_violations FROM agg
        |  UNION ALL SELECT 'unique_orderkey_violations', unique_orderkey_violations FROM agg
        |  UNION ALL SELECT 'range_totalprice_violations', range_totalprice_violations FROM agg
        |  UNION ALL SELECT 'regex_priority_violations', regex_priority_violations FROM agg) t
        |ORDER BY check_name""".stripMargin
  )

  val analytics: Map[String, String] = Map(
    "q_kpi_summary" ->
      s"""SELECT $rev AS total_revenue,
        |  count(DISTINCT l_orderkey) AS total_orders,
        |  count(*) AS total_line_items,
        |  count(DISTINCT l_partkey) AS distinct_parts,
        |  count(DISTINCT l_suppkey) AS distinct_suppliers,
        |  ${avgd("l_extendedprice", 2)} AS avg_line_price
        |FROM lineitem""".stripMargin,
    "q_top_products" ->
      s"""SELECT p_partkey, p_name, p_brand, revenue, units FROM (
        |  SELECT l_partkey,
        |    $rev AS revenue,
        |    ${sumx("l_quantity")} AS units
        |  FROM lineitem GROUP BY l_partkey) t
        |JOIN part ON l_partkey = p_partkey
        |ORDER BY revenue DESC, p_partkey
        |LIMIT 10""".stripMargin,
    "q_revenue_by_category" ->
      s"""SELECT p_type AS category,
        |  $rev AS revenue,
        |  count(*) AS n_lines
        |FROM lineitem JOIN part ON l_partkey = p_partkey
        |GROUP BY p_type ORDER BY category""".stripMargin,
    "q_revenue_by_region" ->
      s"""SELECT r_name AS region, n_name AS nation,
        |  $rev AS revenue,
        |  count(*) AS n_lines
        |FROM lineitem
        |JOIN orders   ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation   ON c_nationkey = n_nationkey
        |JOIN region   ON n_regionkey = r_regionkey
        |GROUP BY r_name, n_name ORDER BY region, nation""".stripMargin,
    "q_monthly_trend" ->
      s"""SELECT CAST(date_trunc('month', o_orderdate) AS TIMESTAMP) AS month,
        |  ${sumx("o_totalprice")} AS revenue,
        |  count(*) AS n_orders,
        |  count(DISTINCT o_custkey) AS active_customers
        |FROM orders GROUP BY 1 ORDER BY month""".stripMargin,
    "q_top_customers" ->
      s"""SELECT c_custkey, c_name, c_mktsegment, total_spent, total_orders FROM (
        |  SELECT o_custkey, ${sumx("o_totalprice")} AS total_spent,
        |         count(*) AS total_orders
        |  FROM orders GROUP BY o_custkey) m
        |JOIN customer ON o_custkey = c_custkey
        |ORDER BY total_spent DESC, c_custkey
        |LIMIT 10""".stripMargin,
    "q_events_windowed" ->
      s"""SELECT CAST(date_trunc('hour', ts) AS TIMESTAMP) AS window_start, event_type,
        |  count(*) AS n_events,
        |  ${sumx("value")} AS total_value,
        |  count(DISTINCT user_id) AS distinct_users
        |FROM events GROUP BY 1, 2 ORDER BY window_start, event_type""".stripMargin,
    "q_sessionize" ->
      s"""WITH ev AS (
        |  SELECT user_id, event_id, CAST(date_trunc('second', ts) AS TIMESTAMP) AS ts_s, value
        |  FROM events
        |), flagged AS (
        |  SELECT *,
        |    CASE WHEN lag(ts_s) OVER w IS NULL
        |           OR epoch(ts_s) - epoch(lag(ts_s) OVER w) > 1800
        |         THEN 1 ELSE 0 END AS new_session
        |  FROM ev
        |  WINDOW w AS (PARTITION BY user_id ORDER BY ts_s, event_id)
        |), numbered AS (
        |  SELECT *,
        |    CAST(sum(new_session) OVER (PARTITION BY user_id ORDER BY ts_s, event_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_seq
        |  FROM flagged
        |)
        |SELECT user_id, session_seq,
        |  count(*) AS n_events,
        |  min(ts_s) AS session_start,
        |  max(ts_s) AS session_end,
        |  ${sumx("value")} AS total_value
        |FROM numbered
        |GROUP BY user_id, session_seq
        |ORDER BY user_id, session_seq""".stripMargin
  )

  val text: Map[String, String] = Map()
  val vector: Map[String, String] = Map()

  def all: Map[String, String] = etl ++ analytics ++ text ++ vector
}
