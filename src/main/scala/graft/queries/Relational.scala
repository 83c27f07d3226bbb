package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

import graft.Tables._

/** The relational query surface.
  *
  * The reference inherits all non-spatial operators wholesale from Spark
  * SQL (reference: SimbaSessionState.scala:70-73 — stock planner plus
  * extra strategies; SimbaOptimizer.scala:32-37 — stock batches), so
  * "parity" here means exercising the stock engine end-to-end: scans,
  * aggregation, broadcast/semi joins, windows, rollup, set ops.
  *
  * Every query is deterministic (explicit ORDER BY incl. tie-breaks) and
  * keeps double aggregation order-independent via Tables.dsum, so results
  * hash-match the DuckDB oracle bit-for-bit.
  */
object Relational {

  /** TPC-H Q1 shape: pricing summary over lineitem. */
  def pricingSummary(s: SparkSession, d: String): DataFrame =
    lineitem(s, d)
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        dsum(col("l_quantity")).as("sum_qty"),
        dsum(col("l_extendedprice")).as("sum_base_price"),
        dsum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("sum_disc_price"),
        davg(col("l_quantity")).as("avg_qty"),
        count(lit(1)).as("count_order"))
      .orderBy(col("l_returnflag"), col("l_linestatus"))

  /** Star join: revenue per nation. `nation` is broadcast — at 100 TB the
    * fact side streams, only the 25-row dim ships to executors. */
  def revenueByNation(s: SparkSession, d: String): DataFrame =
    customer(s, d)
      .join(broadcast(nation(s, d)), col("c_nationkey") === col("n_nationkey"))
      .join(orders(s, d), col("o_custkey") === col("c_custkey"))
      .groupBy(col("n_name"))
      .agg(dsum(col("o_totalprice")).as("revenue"), count(lit(1)).as("n_orders"))
      .orderBy(col("n_name"))

  /** Top-5 orders per market segment (window + row_number). */
  def topOrdersPerSegment(s: SparkSession, d: String): DataFrame = {
    val joined = orders(s, d)
      .join(customer(s, d), col("o_custkey") === col("c_custkey"))
    val w = Window.partitionBy(col("c_mktsegment"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
    joined
      .withColumn("rnk", row_number().over(w).cast("long"))
      .filter(col("rnk") <= 5)
      .select(col("c_mktsegment"), col("o_orderkey"), col("o_totalprice"), col("rnk"))
      .orderBy(col("c_mktsegment"), col("rnk"))
  }

  /** EXISTS via left-semi join: order priorities with a heavy lineitem. */
  def orderPriorityExists(s: SparkSession, d: String): DataFrame =
    orders(s, d)
      .join(lineitem(s, d).filter(col("l_quantity") > 30),
        col("o_orderkey") === col("l_orderkey"), "left_semi")
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("n"))
      .orderBy(col("o_orderpriority"))

  /** ROLLUP over segment: per-segment + grand-total rows. */
  def segmentRollup(s: SparkSession, d: String): DataFrame =
    customer(s, d)
      .rollup(col("c_mktsegment"))
      .agg(count(lit(1)).as("n_cust"), dsum(col("c_acctbal")).as("total_bal"))
      .orderBy(col("c_mktsegment").asc_nulls_first)

  /** Tumbling-hour aggregation over the events stream table (batch view;
    * the streaming variant lives in graft.streaming). Hour emitted as
    * epoch millis so the oracle compares exactly across engines. */
  def eventsHourly(s: SparkSession, d: String): DataFrame =
    events(s, d)
      .groupBy(unix_millis(date_trunc("hour", col("ts"))).as("hour_ms"),
        col("event_type"))
      .agg(count(lit(1)).as("n"), dsum(col("value")).as("total_value"))
      .orderBy(col("hour_ms"), col("event_type"))

  /** Set algebra: BUILDING customers who never placed a >300k order. */
  def setOpsExcept(s: SparkSession, d: String): DataFrame = {
    val building = customer(s, d).filter(col("c_mktsegment") === "BUILDING")
      .select(col("c_custkey"))
    val bigSpenders = orders(s, d).filter(col("o_totalprice") > 300000.0)
      .select(col("o_custkey").as("c_custkey"))
    building.except(bigSpenders).orderBy(col("c_custkey"))
  }

  /** SQL-mode entry: the identical statement runs through spark.sql over
    * temp views and through DuckDB — exercising the parse->analyze->
    * optimize->execute path end to end (the reference routes SQL through
    * the stock parser the same way, SURVEY.md §3.3). */
  private val sqlModeStmt =
    """SELECT c_mktsegment, o_orderstatus, COUNT(*) AS n,
      | CAST(SUM(CAST(o_totalprice AS DECIMAL(18,6))) AS DOUBLE) AS revenue
      |FROM orders JOIN customer ON o_custkey = c_custkey
      |WHERE o_totalprice > 1000.0
      |GROUP BY c_mktsegment, o_orderstatus
      |ORDER BY c_mktsegment, o_orderstatus""".stripMargin

  def sqlMode(s: SparkSession, d: String): DataFrame = {
    customer(s, d).createOrReplaceTempView("customer")
    orders(s, d).createOrReplaceTempView("orders")
    s.sql(sqlModeStmt)
  }

  /** CUBE over two dimensions (grouping-sets family). */
  def cubeStatus(s: SparkSession, d: String): DataFrame =
    orders(s, d)
      .cube(col("o_orderstatus"), col("o_orderpriority"))
      .agg(count(lit(1)).as("n"), dsum(col("o_totalprice")).as("total"))
      .orderBy(col("o_orderstatus").asc_nulls_first, col("o_orderpriority").asc_nulls_first)

  /** INTERSECT: customers present in two order-value bands. */
  def intersectBands(s: SparkSession, d: String): DataFrame = {
    val low = orders(s, d).filter(col("o_totalprice") < 50000.0)
      .select(col("o_custkey"))
    val high = orders(s, d).filter(col("o_totalprice") > 200000.0)
      .select(col("o_custkey"))
    low.intersect(high).orderBy(col("o_custkey"))
  }

  /** String functions over part names + LIKE filter. */
  def stringFuncs(s: SparkSession, d: String): DataFrame =
    part(s, d)
      .filter(col("p_type").like("%DIUM%"))
      .select(
        col("p_partkey"),
        upper(col("p_brand")).as("brand_u"),
        substring(col("p_name"), 1, 8).as("name8"),
        concat_ws("/", col("p_brand"), col("p_type")).as("brand_type"),
        length(col("p_name")).cast("long").as("name_len"))
      .orderBy(col("p_partkey"))

  /** Date extraction + aggregation by year/month. */
  def dateFuncs(s: SparkSession, d: String): DataFrame =
    orders(s, d)
      .groupBy(year(col("o_orderdate")).as("yr"), month(col("o_orderdate")).as("mo"))
      .agg(count(lit(1)).as("n"), dsum(col("o_totalprice")).as("total"))
      .orderBy(col("yr"), col("mo"))

  /** Exact + approximate distinct counting (approx column checked for
    * sanity in tests; the oracle checks the exact column only would
    * mismatch, so approx stays out of compared output). */
  def distinctCounts(s: SparkSession, d: String): DataFrame =
    lineitem(s, d)
      .groupBy(col("l_returnflag"))
      .agg(countDistinct(col("l_partkey")).as("n_parts"),
        countDistinct(col("l_suppkey")).as("n_supps"))
      .orderBy(col("l_returnflag"))

  /** LEFT OUTER join preserving order-less customers (null-extension). */
  def outerJoinCounts(s: SparkSession, d: String): DataFrame =
    customer(s, d)
      .join(orders(s, d), col("c_custkey") === col("o_custkey"), "left_outer")
      .groupBy(col("c_custkey"))
      .agg(count(col("o_orderkey")).as("n_orders"),
        coalesce(dsum(col("o_totalprice")), lit(0.0)).as("total"))
      .orderBy(col("c_custkey"))

  /** Scalar subquery: orders above their segment's average price. */
  def scalarSubquery(s: SparkSession, d: String): DataFrame = {
    customer(s, d).createOrReplaceTempView("customer")
    orders(s, d).createOrReplaceTempView("orders")
    s.sql(
      """SELECT o_orderkey, o_totalprice FROM orders
        |WHERE o_totalprice > (SELECT CAST(AVG(CAST(o_totalprice AS DECIMAL(18,6))) AS DOUBLE) FROM orders)
        |  AND o_orderkey % 10 = 0
        |ORDER BY o_orderkey""".stripMargin)
  }

  /** HAVING: nations with more than 40 customers. */
  def havingClause(s: SparkSession, d: String): DataFrame =
    customer(s, d)
      .groupBy(col("c_nationkey"))
      .agg(count(lit(1)).as("n"))
      .filter(col("n") > 40)
      .orderBy(col("c_nationkey"))

  /** UNION ALL with a discriminator column. */
  def unionAll(s: SparkSession, d: String): DataFrame = {
    val hi = orders(s, d).filter(col("o_totalprice") > 400000.0)
      .select(col("o_orderkey"), lit("high").as("band"))
    val lo = orders(s, d).filter(col("o_totalprice") < 1000.0)
      .select(col("o_orderkey"), lit("low").as("band"))
    hi.union(lo).orderBy(col("o_orderkey"), col("band"))
  }

  /** NOT EXISTS via left-anti join: customers with no orders at all. */
  def antiJoin(s: SparkSession, d: String): DataFrame =
    customer(s, d)
      .join(orders(s, d), col("c_custkey") === col("o_custkey"), "left_anti")
      .select(col("c_custkey"), col("c_mktsegment"))
      .orderBy(col("c_custkey"))

  /** Array functions: per-order sorted line numbers, flattened to a
    * string so the compared output stays scalar-typed. */
  def arrayAgg(s: SparkSession, d: String): DataFrame =
    lineitem(s, d)
      .groupBy(col("l_orderkey"))
      .agg(concat_ws(",",
        sort_array(collect_list(col("l_linenumber").cast("long")))).as("lines"),
        count(lit(1)).as("n"))
      .filter(col("n") >= 5)
      .orderBy(col("l_orderkey"))

  /** Window frame: running revenue per customer over order dates. */
  def runningTotal(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_orderdate").asc, col("o_orderkey").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    orders(s, d)
      .withColumn("running",
        sum(col("o_totalprice").cast("decimal(18,6)")).over(w).cast("double"))
      .filter(col("o_custkey") % 100 === 0)
      .select(col("o_custkey"), col("o_orderkey"), col("running"))
      .orderBy(col("o_custkey"), col("o_orderkey"))
  }

  /** Exact interpolated percentiles per order status (rounded to cents:
    * interpolation ordering differs across engines in the last float
    * bits, and 2-decimal rounding absorbs it). */
  def percentiles(s: SparkSession, d: String): DataFrame =
    orders(s, d)
      .groupBy(col("o_orderstatus"))
      .agg(
        round(expr("percentile(o_totalprice, 0.5)"), 2).as("p50"),
        round(expr("percentile(o_totalprice, 0.9)"), 2).as("p90"),
        count(lit(1)).as("n"))
      .orderBy(col("o_orderstatus"))

  /** TPC-H Q3 shape (shipping priority): 3-way join, filtered both
    * sides, grouped revenue, top-10 by revenue. */
  def shippingPriority(s: SparkSession, d: String): DataFrame =
    customer(s, d).filter(col("c_mktsegment") === "BUILDING")
      .join(orders(s, d), col("c_custkey") === col("o_custkey"))
      .join(lineitem(s, d), col("o_orderkey") === col("l_orderkey"))
      .filter(col("o_orderdate") < lit("1997-01-01").cast("date"))
      .groupBy(col("l_orderkey"), col("o_orderdate"), col("o_orderpriority"))
      .agg(dsum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("revenue"))
      .orderBy(col("revenue").desc, col("l_orderkey").asc)
      .limit(10)

  /** TPC-H Q5 shape: 5-way join through region, revenue per nation. */
  def localSupplierVolume(s: SparkSession, d: String): DataFrame =
    region(s, d).filter(col("r_name") === "ASIA")
      .join(broadcast(nation(s, d)), col("n_regionkey") === col("r_regionkey"))
      .join(customer(s, d), col("c_nationkey") === col("n_nationkey"))
      .join(orders(s, d), col("o_custkey") === col("c_custkey"))
      .join(lineitem(s, d), col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("n_name"))
      .agg(dsum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("revenue"),
        count(lit(1)).as("n"))
      .orderBy(col("n_name"))

  /** PIVOT: order counts per priority, one column per status. */
  def pivotStatus(s: SparkSession, d: String): DataFrame =
    orders(s, d)
      .groupBy(col("o_orderpriority"))
      .pivot("o_orderstatus", Seq("F", "O", "P"))
      .agg(count(lit(1)))
      .na.fill(0L)
      .orderBy(col("o_orderpriority"))

  /** Semi-structured metadata extraction: the events table's `props`
    * column is a JSON blob; pull `$.k` with the codegen'd JSON path
    * expression and aggregate per event type. The everyday
    * log-analytics shape — extraction rides the scan (no UDF), the
    * aggregate is one partial-agg shuffle; DuckDB replays via
    * json_extract_string. */
  def jsonProps(s: SparkSession, d: String): DataFrame =
    events(s, d)
      .select(col("event_type"),
        get_json_object(col("props"), "$.k").cast("long").as("k"))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("k")).as("sum_k"),
        min(col("k")).as("min_k"), max(col("k")).as("max_k"))
      .orderBy(col("event_type"))

  val oracles: Map[String, String] = Map(
    "q27_json_props" ->
      """SELECT event_type, count(*) AS n,
        | CAST(sum(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
        | min(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS min_k,
        | max(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS max_k
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,
    "q26_pivot" ->
      """SELECT o_orderpriority,
        | COUNT(*) FILTER (WHERE o_orderstatus = 'F') AS "F",
        | COUNT(*) FILTER (WHERE o_orderstatus = 'O') AS "O",
        | COUNT(*) FILTER (WHERE o_orderstatus = 'P') AS "P"
        |FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin,
    "q24_shipping_priority" ->
      """SELECT l_orderkey, o_orderdate, o_orderpriority,
        | CAST(SUM(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(18,6))) AS DOUBLE) AS revenue
        |FROM customer, orders, lineitem
        |WHERE c_mktsegment = 'BUILDING' AND c_custkey = o_custkey
        |  AND o_orderkey = l_orderkey AND o_orderdate < DATE '1997-01-01'
        |GROUP BY l_orderkey, o_orderdate, o_orderpriority
        |ORDER BY revenue DESC, l_orderkey ASC LIMIT 10""".stripMargin,
    "q25_local_supplier_volume" ->
      """SELECT n_name,
        | CAST(SUM(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(18,6))) AS DOUBLE) AS revenue,
        | COUNT(*) AS n
        |FROM region, nation, customer, orders, lineitem
        |WHERE r_name = 'ASIA' AND n_regionkey = r_regionkey
        |  AND c_nationkey = n_nationkey AND o_custkey = c_custkey
        |  AND l_orderkey = o_orderkey
        |GROUP BY n_name ORDER BY n_name""".stripMargin,
    "q23_percentiles" ->
      """SELECT o_orderstatus,
        | round(quantile_cont(o_totalprice, 0.5), 2) AS p50,
        | round(quantile_cont(o_totalprice, 0.9), 2) AS p90,
        | COUNT(*) AS n
        |FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin,
    "q21_array_agg" ->
      """SELECT l_orderkey,
        | array_to_string(list_sort(list(CAST(l_linenumber AS BIGINT))), ',') AS lines,
        | COUNT(*) AS n
        |FROM lineitem GROUP BY l_orderkey HAVING COUNT(*) >= 5
        |ORDER BY l_orderkey""".stripMargin,
    "q22_running_total" ->
      """SELECT o_custkey, o_orderkey,
        | CAST(SUM(CAST(o_totalprice AS DECIMAL(18,6))) OVER (
        |   PARTITION BY o_custkey ORDER BY o_orderdate ASC, o_orderkey ASC
        |   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS running
        |FROM orders QUALIFY o_custkey % 100 = 0
        |ORDER BY o_custkey, o_orderkey""".stripMargin,
    "q16_outer_join" ->
      """SELECT c_custkey, COUNT(o_orderkey) AS n_orders,
        | COALESCE(CAST(SUM(CAST(o_totalprice AS DECIMAL(18,6))) AS DOUBLE), 0.0) AS total
        |FROM customer LEFT OUTER JOIN orders ON c_custkey = o_custkey
        |GROUP BY c_custkey ORDER BY c_custkey""".stripMargin,
    "q17_scalar_subquery" ->
      """SELECT o_orderkey, o_totalprice FROM orders
        |WHERE o_totalprice > (SELECT CAST(AVG(CAST(o_totalprice AS DECIMAL(18,6))) AS DOUBLE) FROM orders)
        |  AND o_orderkey % 10 = 0
        |ORDER BY o_orderkey""".stripMargin,
    "q18_having" ->
      """SELECT c_nationkey, COUNT(*) AS n FROM customer
        |GROUP BY c_nationkey HAVING COUNT(*) > 40 ORDER BY c_nationkey""".stripMargin,
    "q19_union_all" ->
      """SELECT o_orderkey, 'high' AS band FROM orders WHERE o_totalprice > 400000.0
        |UNION ALL
        |SELECT o_orderkey, 'low' AS band FROM orders WHERE o_totalprice < 1000.0
        |ORDER BY o_orderkey, band""".stripMargin,
    "q20_anti_join" ->
      """SELECT c_custkey, c_mktsegment FROM customer
        |WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
        |ORDER BY c_custkey""".stripMargin,
    "q9_sql_mode" -> sqlModeStmt,
    "q10_cube" ->
      """SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n,
        | CAST(SUM(CAST(o_totalprice AS DECIMAL(18,6))) AS DOUBLE) AS total
        |FROM orders GROUP BY CUBE(o_orderstatus, o_orderpriority)
        |ORDER BY o_orderstatus NULLS FIRST, o_orderpriority NULLS FIRST""".stripMargin,
    "q11_intersect" ->
      """SELECT o_custkey FROM orders WHERE o_totalprice < 50000.0
        |INTERSECT
        |SELECT o_custkey FROM orders WHERE o_totalprice > 200000.0
        |ORDER BY o_custkey""".stripMargin,
    "q12_string_funcs" ->
      """SELECT p_partkey, upper(p_brand) AS brand_u, substring(p_name, 1, 8) AS name8,
        | concat_ws('/', p_brand, p_type) AS brand_type,
        | length(p_name) AS name_len
        |FROM part WHERE p_type LIKE '%DIUM%' ORDER BY p_partkey""".stripMargin,
    "q13_date_funcs" ->
      """SELECT CAST(year(o_orderdate) AS INT) AS yr, CAST(month(o_orderdate) AS INT) AS mo,
        | COUNT(*) AS n,
        | CAST(SUM(CAST(o_totalprice AS DECIMAL(18,6))) AS DOUBLE) AS total
        |FROM orders GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "q14_distinct_counts" ->
      """SELECT l_returnflag, COUNT(DISTINCT l_partkey) AS n_parts,
        | COUNT(DISTINCT l_suppkey) AS n_supps
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,
    "q1_pricing_summary" ->
      """SELECT l_returnflag, l_linestatus,
        | CAST(SUM(CAST(l_quantity AS DECIMAL(18,6))) AS DOUBLE) AS sum_qty,
        | CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,6))) AS DOUBLE) AS sum_base_price,
        | CAST(SUM(CAST(l_extendedprice * (CAST(1.0 AS DOUBLE) - l_discount) AS DECIMAL(18,6))) AS DOUBLE) AS sum_disc_price,
        | CAST(SUM(CAST(l_quantity AS DECIMAL(18,6))) AS DOUBLE) / COUNT(*) AS avg_qty,
        | COUNT(*) AS count_order
        |FROM lineitem GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin,
    "q2_revenue_by_nation" ->
      """SELECT n_name,
        | CAST(SUM(CAST(o_totalprice AS DECIMAL(18,6))) AS DOUBLE) AS revenue,
        | COUNT(*) AS n_orders
        |FROM customer
        |JOIN nation ON c_nationkey = n_nationkey
        |JOIN orders ON o_custkey = c_custkey
        |GROUP BY n_name ORDER BY n_name""".stripMargin,
    "q3_top_orders_per_segment" ->
      """SELECT c_mktsegment, o_orderkey, o_totalprice, rnk FROM (
        | SELECT c_mktsegment, o_orderkey, o_totalprice,
        |  ROW_NUMBER() OVER (PARTITION BY c_mktsegment
        |    ORDER BY o_totalprice DESC, o_orderkey ASC) AS rnk
        | FROM orders JOIN customer ON o_custkey = c_custkey) t
        |WHERE rnk <= 5 ORDER BY c_mktsegment, rnk""".stripMargin,
    "q4_order_priority_exists" ->
      """SELECT o_orderpriority, COUNT(*) AS n FROM orders
        |WHERE EXISTS (SELECT 1 FROM lineitem
        |  WHERE l_orderkey = o_orderkey AND l_quantity > 30)
        |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin,
    "q5_segment_rollup" ->
      """SELECT c_mktsegment, COUNT(*) AS n_cust,
        | CAST(SUM(CAST(c_acctbal AS DECIMAL(18,6))) AS DOUBLE) AS total_bal
        |FROM customer GROUP BY ROLLUP(c_mktsegment)
        |ORDER BY c_mktsegment NULLS FIRST""".stripMargin,
    "q6_events_hourly" ->
      """SELECT epoch_ms(date_trunc('hour', ts)) AS hour_ms, event_type,
        | COUNT(*) AS n,
        | CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS total_value
        |FROM events GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "q7_set_except" ->
      """SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'
        |EXCEPT
        |SELECT o_custkey AS c_custkey FROM orders WHERE o_totalprice > 300000.0
        |ORDER BY c_custkey""".stripMargin
  )

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q1_pricing_summary" -> (pricingSummary _),
    "q2_revenue_by_nation" -> (revenueByNation _),
    "q3_top_orders_per_segment" -> (topOrdersPerSegment _),
    "q4_order_priority_exists" -> (orderPriorityExists _),
    "q5_segment_rollup" -> (segmentRollup _),
    "q6_events_hourly" -> (eventsHourly _),
    "q7_set_except" -> (setOpsExcept _),
    "q9_sql_mode" -> (sqlMode _),
    "q10_cube" -> (cubeStatus _),
    "q11_intersect" -> (intersectBands _),
    "q12_string_funcs" -> (stringFuncs _),
    "q13_date_funcs" -> (dateFuncs _),
    "q14_distinct_counts" -> (distinctCounts _),
    "q16_outer_join" -> (outerJoinCounts _),
    "q17_scalar_subquery" -> (scalarSubquery _),
    "q18_having" -> (havingClause _),
    "q19_union_all" -> (unionAll _),
    "q20_anti_join" -> (antiJoin _),
    "q21_array_agg" -> (arrayAgg _),
    "q22_running_total" -> (runningTotal _),
    "q23_percentiles" -> (percentiles _),
    "q24_shipping_priority" -> (shippingPriority _),
    "q25_local_supplier_volume" -> (localSupplierVolume _),
    "q26_pivot" -> (pivotStatus _),
    "q27_json_props" -> (jsonProps _)
  )
}
