package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

import graft.analytics.Tables
import graft.ops._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every query is paired with ANSI SQL in [[oracleSql]] that DuckDB runs on
  * the same parquet tables; the driver hash-compares the two results.
  * Determinism rules used throughout (SURVEY §7.4.3):
  *   - doubles are only ever aggregated after a per-row cast to DECIMAL
  *     (exact, order-independent), then cast back to double at the end;
  *   - `events.ts` is exposed as epoch-µs bigint `ts_us` via ONE
  *     schema-adaptive helper ([[graft.analytics.Tables.epochMicros]]) that
  *     handles both physical writers seen across testdata regenerations
  *     (epoch-ns bigint under nanosAsLong, or a µs timestamp), matching
  *     DuckDB's `epoch_us(ts)` either way;
  *   - every result has an explicit ORDER BY with a unique key prefix and
  *     deterministic tie-breakers inside window specs.
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    queries("q3_join_star")(spark, "/root/testdata/sf0.001")

  // ---- shared builders ----------------------------------------------------

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables(s, dir, name)

  /** events with `ts_us` = epoch microseconds (bigint), schema-adaptive to
    * the testdata writer (epoch-ns bigint OR µs timestamp — see
    * [[graft.analytics.Tables.epochMicros]]). */
  private def events(s: SparkSession, dir: String): DataFrame =
    Tables.withEpochMicros(t(s, dir, "events"))

  /** Exact, order-independent sum of a double expression: per-row cast to
    * decimal, exact decimal sum, final cast back to double. */
  private def dsum(e: Column, scale: Int = 2): Column =
    sum(e.cast(s"decimal(18,$scale)")).cast("double")

  /** One entry per implemented operator from SURVEY.md §2 (core map merged
    * with the [EXT] LLM and relational surfaces). */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    coreQueries ++ LlmQueries.queries ++ RelQueries.queries ++
      MultimodalQueries.queries ++ PipelineQueries.queries

  private def coreQueries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // -- P1 [REF]: int/short -> bigint upcast (00_config_loader.py:46-55)
    "p1_upcast" -> ((s, dir) => {
      Upcast(t(s, dir, "nation")).orderBy(col("n_nationkey"))
    }),

    // -- P5 [REF]: CDC soft-delete filter op != 'D' (02_silver_processing.py:131-135)
    "p5_softdelete" -> ((s, dir) => {
      val withOp = events(s, dir).withColumn(
        "op", when(col("event_type") === "error", "D").otherwise("I"))
      SoftDeleteFilter(withOp)
        .select(col("event_id"), col("op"), col("event_type"), col("value"))
        .orderBy(col("event_id"))
    }),

    // -- P7 [REF]: expect_all_or_drop data-quality gate (02_silver_processing.py:139-141)
    "p7_expectations" -> ((s, dir) => {
      Expectations(t(s, dir, "lineitem"), Map(
        "qty_nonnull" -> "l_quantity IS NOT NULL",
        "disc_range"  -> "l_discount >= 0 AND l_discount <= 1",
        "price_pos"   -> "l_extendedprice > 0"))
        .select(col("l_orderkey"), col("l_linenumber"), col("l_quantity"),
          col("l_discount"), col("l_extendedprice"))
        .orderBy(col("l_orderkey"), col("l_linenumber"))
    }),

    // -- P8 [REF-reserved]: column renaming (README.md:100)
    "p8_rename" -> ((s, dir) => {
      Rename(t(s, dir, "region"),
        Map("r_regionkey" -> "region_id", "r_name" -> "region_name"))
        .orderBy(col("region_id"))
    }),

    // -- W1 [REF]: PK dedup keeping latest (02_silver_processing.py:120-129)
    "w1_dedup_latest" -> ((s, dir) => {
      val ev = events(s, dir)
      Dedup(ev, Seq("user_id"),
        Seq(col("ts_us").desc, col("event_id").desc))
        .select(col("user_id"), col("event_id"), col("ts_us"),
          col("event_type"), col("value"))
        .orderBy(col("user_id"))
    }),

    // -- A1 [EXT]: hash aggregate, TPC-H Q1 shape (partial+final via HashAggregateExec)
    "q1_agg" -> ((s, dir) => {
      t(s, dir, "lineitem")
        .filter(expr("l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'"))
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          dsum(col("l_quantity")).as("sum_qty"),
          dsum(col("l_extendedprice")).as("sum_base_price"),
          dsum(col("l_extendedprice") * (lit(1.0) - col("l_discount")), 6)
            .as("sum_disc_price"),
          (dsum(col("l_quantity")) / count(lit(1))).as("avg_qty"),
          count(lit(1)).as("count_order"))
        .orderBy(col("l_returnflag"), col("l_linestatus"))
    }),

    // -- J1 [EXT]: star-schema inner joins; dims broadcast via AQE
    "q3_join_star" -> ((s, dir) => {
      t(s, dir, "lineitem")
        .join(t(s, dir, "orders"), col("l_orderkey") === col("o_orderkey"))
        .join(t(s, dir, "customer"), col("o_custkey") === col("c_custkey"))
        .join(broadcast(t(s, dir, "nation")),
          col("c_nationkey") === col("n_nationkey"))
        .join(broadcast(t(s, dir, "region")),
          col("n_regionkey") === col("r_regionkey"))
        .groupBy(col("r_name"), col("n_name"))
        .agg(
          dsum(col("l_extendedprice") * (lit(1.0) - col("l_discount")), 6)
            .as("revenue"),
          count(lit(1)).as("n_items"))
        .orderBy(col("r_name"), col("n_name"))
    }),

    // -- J2 [EXT]: left outer join preserving customers with no orders
    "q_join_left" -> ((s, dir) => {
      t(s, dir, "customer")
        .join(t(s, dir, "orders"),
          col("c_custkey") === col("o_custkey"), "left")
        .groupBy(col("c_custkey"))
        .agg(
          count(col("o_orderkey")).as("n_orders"),
          coalesce(dsum(col("o_totalprice")), lit(0.0)).as("total_spend"))
        .orderBy(col("c_custkey"))
    }),

    // -- J3 [EXT]: left semi join (EXISTS)
    "q_join_semi" -> ((s, dir) => {
      val o = t(s, dir, "orders").filter(col("o_orderstatus") === "F")
      t(s, dir, "customer")
        .join(o, col("c_custkey") === col("o_custkey"), "left_semi")
        .select(col("c_custkey"), col("c_name"))
        .orderBy(col("c_custkey"))
    }),

    // -- J3 [EXT]: left anti join (NOT EXISTS); right side pre-filtered so
    //    the predicate pushes into the orders scan
    "q_join_anti" -> ((s, dir) => {
      val recent = t(s, dir, "orders")
        .filter(expr("o_orderdate >= TIMESTAMP '2000-01-01 00:00:00'"))
      t(s, dir, "customer")
        .join(recent, col("c_custkey") === col("o_custkey"), "left_anti")
        .select(col("c_custkey"), col("c_mktsegment"))
        .orderBy(col("c_custkey"))
    }),

    // -- W2/top-k [EXT]: rank-filter rewritten to WindowGroupLimit by Catalyst
    "q_topk_per_group" -> ((s, dir) => {
      val w = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
      t(s, dir, "orders")
        .withColumn("rk", row_number().over(w))
        .filter(col("rk") <= 3)
        .select(col("o_custkey"), col("rk"), col("o_orderkey"),
          col("o_totalprice"))
        .orderBy(col("o_custkey"), col("rk"))
    }),

    // -- A4 [EXT]: rollup grouping sets
    "q_rollup" -> ((s, dir) => {
      t(s, dir, "lineitem")
        .rollup(col("l_returnflag"), col("l_linestatus"))
        .agg(dsum(col("l_quantity")).as("sum_qty"),
          count(lit(1)).as("n_rows"))
        .select(
          coalesce(col("l_returnflag"), lit("ALL")).as("returnflag"),
          coalesce(col("l_linestatus"), lit("ALL")).as("linestatus"),
          col("sum_qty"), col("n_rows"))
        .orderBy(col("returnflag"), col("linestatus"))
    }),

    // -- A2 [EXT]: distinct count + exact decimal average
    "q_distinct_agg" -> ((s, dir) => {
      t(s, dir, "customer")
        .groupBy(col("c_mktsegment"))
        .agg(
          countDistinct(col("c_nationkey")).as("n_nations"),
          count(lit(1)).as("n_customers"),
          (dsum(col("c_acctbal")) / count(lit(1))).as("avg_acctbal"))
        .orderBy(col("c_mktsegment"))
    }),

    // -- W3 [EXT]: lag analytics (event inter-arrival deltas)
    "q_lag_delta" -> ((s, dir) => {
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("ts_us").asc, col("event_id").asc)
      events(s, dir)
        .select(col("user_id"), col("event_id"), col("ts_us"),
          lag(col("ts_us"), 1).over(w).as("prev_ts_us"))
        .withColumn("delta_us", col("ts_us") - col("prev_ts_us"))
        .orderBy(col("user_id"), col("event_id"))
    }),

    // -- W4 [EXT]: frame-spec running sum
    "q_running_sum" -> ((s, dir) => {
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("ts_us").asc, col("event_id").asc)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      events(s, dir)
        .select(col("user_id"), col("event_id"), col("ts_us"),
          sum(col("value").cast("decimal(18,3)")).over(w)
            .cast("double").as("running_value"))
        .orderBy(col("user_id"), col("event_id"))
    }),

    // -- T5-batch [EXT]: gap-based sessionization (the batch equivalent of
    //    session_window; streaming variant with flatMapGroupsWithState in
    //    StreamingSpec). Gap-island: flag gaps > 30 min, running sum of
    //    flags = session ordinal. Scale: ONE hash shuffle on user_id
    //    shared by both window specs (same partitioning), then a narrow
    //    partial-agg into the groupBy on (user_id, session_id) — Spark
    //    reuses the exchange, so sessionization over 100 TB of events is
    //    scan + one shuffle.
    "q_session_gap" -> ((s, dir) => {
      val byUser = Window.partitionBy(col("user_id"))
        .orderBy(col("ts_us").asc, col("event_id").asc)
      val gapUs = 30L * 60 * 1000000
      events(s, dir)
        .withColumn("new_s",
          when(col("ts_us") - lag(col("ts_us"), 1).over(byUser) > gapUs, 1L)
            .otherwise(0L))
        .withColumn("session_id", sum(col("new_s")).over(
          byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        .groupBy(col("user_id"), col("session_id"))
        .agg(min(col("ts_us")).as("session_start_us"),
          max(col("ts_us")).as("session_end_us"),
          count(lit(1)).as("n_events"))
        .orderBy(col("user_id"), col("session_id"))
    }),

    // -- F10 [EXT]: JSON extraction + aggregate. Reads the raw table — it
    //    never touches `ts`, so it must not couple to the ts_us derivation
    //    (analyzable against ANY events schema with props/event_type).
    "q_json_agg" -> ((s, dir) => {
      t(s, dir, "events")
        .withColumn("k", get_json_object(col("props"), "$.k").cast("long"))
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n"), sum(col("k")).as("sum_k"),
          min(col("k")).as("min_k"), max(col("k")).as("max_k"))
        .orderBy(col("event_type"))
    }),

    // -- F7/T3-batch [EXT]: event-time tumbling 1h buckets. Buckets on the
    //    shared ts_us derivation so ONE helper owns the time unit (integer
    //    µs bucketing keeps parity with the oracle's epoch_us // 3600000000;
    //    streaming variant in tests)
    "q_hour_bucket" -> ((s, dir) => {
      events(s, dir)
        .withColumn("hour_bucket", expr("ts_us DIV 3600000000"))
        .groupBy(col("hour_bucket"), col("event_type"))
        .agg(count(lit(1)).as("n"),
          dsum(col("value"), 3).as("sum_value"))
        .orderBy(col("hour_bucket"), col("event_type"))
    })
  )

  /** For each key in `queries`, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    coreOracleSql ++ LlmQueries.oracleSql ++ RelQueries.oracleSql ++
      MultimodalQueries.oracleSql ++ PipelineQueries.oracleSql

  private def coreOracleSql: Map[String, String] = Map(

    "p1_upcast" ->
      """SELECT CAST(n_nationkey AS BIGINT) AS n_nationkey, n_name,
        |CAST(n_regionkey AS BIGINT) AS n_regionkey
        |FROM nation ORDER BY n_nationkey""".stripMargin,

    "p5_softdelete" ->
      """SELECT event_id,
        |  CASE WHEN event_type = 'error' THEN 'D' ELSE 'I' END AS op,
        |  event_type, value
        |FROM events
        |WHERE (CASE WHEN event_type = 'error' THEN 'D' ELSE 'I' END) != 'D'
        |ORDER BY event_id""".stripMargin,

    "p7_expectations" ->
      """SELECT l_orderkey, l_linenumber, l_quantity, l_discount, l_extendedprice
        |FROM lineitem
        |WHERE (l_quantity IS NOT NULL)
        |  AND (l_discount >= 0 AND l_discount <= 1)
        |  AND (l_extendedprice > 0)
        |ORDER BY l_orderkey, l_linenumber""".stripMargin,

    "p8_rename" ->
      """SELECT r_regionkey AS region_id, r_name AS region_name
        |FROM region ORDER BY region_id""".stripMargin,

    "w1_dedup_latest" ->
      """SELECT user_id, event_id, ts_us, event_type, value FROM (
        |  SELECT user_id, event_id, epoch_us(ts) AS ts_us, event_type, value,
        |    ROW_NUMBER() OVER (PARTITION BY user_id
        |      ORDER BY epoch_us(ts) DESC, event_id DESC) AS rn
        |  FROM events) WHERE rn = 1 ORDER BY user_id""".stripMargin,

    "q1_agg" ->
      """SELECT l_returnflag, l_linestatus,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
        |  CAST(SUM(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(18,6))) AS DOUBLE) AS sum_disc_price,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS avg_qty,
        |  COUNT(*) AS count_order
        |FROM lineitem
        |WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
        |GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin,

    "q3_join_star" ->
      """SELECT r_name, n_name,
        |  CAST(SUM(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(18,6))) AS DOUBLE) AS revenue,
        |  COUNT(*) AS n_items
        |FROM lineitem
        |JOIN orders   ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation   ON c_nationkey = n_nationkey
        |JOIN region   ON n_regionkey = r_regionkey
        |GROUP BY r_name, n_name
        |ORDER BY r_name, n_name""".stripMargin,

    "q_join_left" ->
      """SELECT c_custkey, COUNT(o_orderkey) AS n_orders,
        |  COALESCE(CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE), 0.0) AS total_spend
        |FROM customer LEFT JOIN orders ON c_custkey = o_custkey
        |GROUP BY c_custkey ORDER BY c_custkey""".stripMargin,

    "q_join_semi" ->
      """SELECT c_custkey, c_name FROM customer
        |WHERE EXISTS (SELECT 1 FROM orders
        |  WHERE o_custkey = c_custkey AND o_orderstatus = 'F')
        |ORDER BY c_custkey""".stripMargin,

    "q_join_anti" ->
      """SELECT c_custkey, c_mktsegment FROM customer
        |WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey
        |  AND o_orderdate >= TIMESTAMP '2000-01-01 00:00:00')
        |ORDER BY c_custkey""".stripMargin,

    "q_topk_per_group" ->
      """SELECT o_custkey, rk, o_orderkey, o_totalprice FROM (
        |  SELECT o_custkey, o_orderkey, o_totalprice,
        |    ROW_NUMBER() OVER (PARTITION BY o_custkey
        |      ORDER BY o_totalprice DESC, o_orderkey ASC) AS rk
        |  FROM orders) WHERE rk <= 3 ORDER BY o_custkey, rk""".stripMargin,

    "q_rollup" ->
      """SELECT COALESCE(l_returnflag, 'ALL') AS returnflag,
        |  COALESCE(l_linestatus, 'ALL') AS linestatus,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
        |  COUNT(*) AS n_rows
        |FROM lineitem GROUP BY ROLLUP(l_returnflag, l_linestatus)
        |ORDER BY returnflag, linestatus""".stripMargin,

    "q_distinct_agg" ->
      """SELECT c_mktsegment,
        |  COUNT(DISTINCT c_nationkey) AS n_nations,
        |  COUNT(*) AS n_customers,
        |  CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS avg_acctbal
        |FROM customer GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin,

    "q_lag_delta" ->
      """SELECT user_id, event_id, ts_us,
        |  prev_ts_us, ts_us - prev_ts_us AS delta_us FROM (
        |  SELECT user_id, event_id, epoch_us(ts) AS ts_us,
        |    LAG(epoch_us(ts), 1) OVER (PARTITION BY user_id
        |      ORDER BY epoch_us(ts) ASC, event_id ASC) AS prev_ts_us
        |  FROM events) ORDER BY user_id, event_id""".stripMargin,

    "q_running_sum" ->
      """SELECT user_id, event_id, epoch_us(ts) AS ts_us,
        |  CAST(SUM(CAST(value AS DECIMAL(18,3))) OVER (
        |    PARTITION BY user_id ORDER BY epoch_us(ts) ASC, event_id ASC
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE)
        |    AS running_value
        |FROM events ORDER BY user_id, event_id""".stripMargin,

    "q_session_gap" ->
      """WITH flagged AS (
        |  SELECT user_id, event_id, epoch_us(ts) AS ts_us,
        |    CASE WHEN epoch_us(ts) - lag(epoch_us(ts)) OVER (
        |        PARTITION BY user_id ORDER BY epoch_us(ts) ASC, event_id ASC)
        |      > 1800000000 THEN 1 ELSE 0 END AS new_s
        |  FROM events),
        |sess AS (
        |  SELECT user_id, ts_us,
        |    CAST(SUM(new_s) OVER (PARTITION BY user_id
        |      ORDER BY ts_us ASC, event_id ASC
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
        |      AS session_id
        |  FROM flagged)
        |SELECT user_id, session_id,
        |  MIN(ts_us) AS session_start_us, MAX(ts_us) AS session_end_us,
        |  COUNT(*) AS n_events
        |FROM sess GROUP BY user_id, session_id
        |ORDER BY user_id, session_id""".stripMargin,

    "q_json_agg" ->
      """SELECT event_type, COUNT(*) AS n,
        |  CAST(SUM(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
        |  MIN(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS min_k,
        |  MAX(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS max_k
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,

    "q_hour_bucket" ->
      """SELECT epoch_us(ts) // 3600000000 AS hour_bucket, event_type,
        |  COUNT(*) AS n,
        |  CAST(SUM(CAST(value AS DECIMAL(18,3))) AS DOUBLE) AS sum_value
        |FROM events GROUP BY hour_bucket, event_type
        |ORDER BY hour_bucket, event_type""".stripMargin
  )
}
