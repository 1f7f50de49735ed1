package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.QueryDef
import graft.operators.{AsOfJoin, Dedup}
import graft.sources.{Events, Tables}
import graft.util.Det
import graft.util.Det.{dsumSql, epochSecSql}

/** Relational core: scans, filters, joins (all variants), aggregations,
  * windows, set operations, sorts/top-k — SURVEY.md §2.2. Every query
  * ends in a total order and uses only BIGINT/DOUBLE/VARCHAR/DATE output
  * types so schema+hash compare with the DuckDB oracle (§2.3).
  */
object Relational {

  private def t(s: SparkSession, dir: String, n: String) = Tables.load(s, dir, n)

  /** Flagship: TPC-H Q1-style pricing summary. Scan→filter→partial+final
    * agg→sort; filter and pruning push to the parquet scan.
    */
  def tpchQ1(s: SparkSession, dir: String): DataFrame = {
    t(s, dir, "lineitem")
      .filter(col("l_shipdate") <= lit("1998-02-01").cast("timestamp"))
      .groupBy("l_returnflag", "l_linestatus")
      .agg(
        Det.dsum(col("l_quantity")).as("sum_qty"),
        Det.dsum(col("l_extendedprice")).as("sum_base_price"),
        Det.dsum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("sum_disc_price"),
        Det.dsum(col("l_extendedprice") * (lit(1.0) - col("l_discount")) * (lit(1.0) + col("l_tax"))).as("sum_charge"),
        Det.davg(col("l_quantity")).as("avg_qty"),
        Det.davg(col("l_extendedprice")).as("avg_price"),
        Det.davg(col("l_discount")).as("avg_disc"),
        count(lit(1)).as("count_order"))
      .orderBy("l_returnflag", "l_linestatus")
  }

  val defs: Map[String, QueryDef] = Map(
    "q01_agg_pricing_summary" -> QueryDef(
      tpchQ1,
      Some(s"""SELECT l_returnflag, l_linestatus,
        ${dsumSql("l_quantity")} AS sum_qty,
        ${dsumSql("l_extendedprice")} AS sum_base_price,
        ${dsumSql("l_extendedprice*(1-l_discount)")} AS sum_disc_price,
        ${dsumSql("l_extendedprice*(1-l_discount)*(1+l_tax)")} AS sum_charge,
        ${Det.davgSql("l_quantity")} AS avg_qty,
        ${Det.davgSql("l_extendedprice")} AS avg_price,
        ${Det.davgSql("l_discount")} AS avg_disc,
        COUNT(*) AS count_order
      FROM lineitem
      WHERE l_shipdate <= TIMESTAMP '1998-02-01'
      GROUP BY l_returnflag, l_linestatus
      ORDER BY l_returnflag, l_linestatus""")),

    "q02_scan_project" -> QueryDef(
      (s, dir) => t(s, dir, "part")
        .select(col("p_partkey"), col("p_name"), col("p_brand"),
          (col("p_retailprice") * col("p_size")).as("value_density"))
        .orderBy("p_partkey"),
      Some("""SELECT p_partkey, p_name, p_brand,
        p_retailprice * p_size AS value_density
      FROM part ORDER BY p_partkey""")),

    "q03_filter_predicates" -> QueryDef(
      (s, dir) => t(s, dir, "orders")
        .filter(col("o_orderstatus").isin("F", "O")
          && col("o_totalprice").between(1000.0, 300000.0)
          && (col("o_orderpriority").like("%URGENT%") || col("o_orderpriority").like("1%"))
          && col("o_orderdate").isNotNull)
        .select(col("o_orderkey"), col("o_orderstatus"), col("o_totalprice"),
          when(col("o_totalprice") > 200000, "big")
            .when(col("o_totalprice") > 100000, "mid")
            .otherwise("small").as("bucket"))
        .orderBy("o_orderkey"),
      Some("""SELECT o_orderkey, o_orderstatus, o_totalprice,
        CASE WHEN o_totalprice > 200000 THEN 'big'
             WHEN o_totalprice > 100000 THEN 'mid'
             ELSE 'small' END AS bucket
      FROM orders
      WHERE o_orderstatus IN ('F','O')
        AND o_totalprice BETWEEN 1000 AND 300000
        AND (o_orderpriority LIKE '%URGENT%' OR o_orderpriority LIKE '1%')
        AND o_orderdate IS NOT NULL
      ORDER BY o_orderkey""")),

    "q04_null_semantics" -> QueryDef(
      (s, dir) => t(s, dir, "customer")
        .select(col("c_custkey"),
          coalesce(nullif(col("c_mktsegment"), lit("BUILDING")), lit("OTHER")).as("seg"),
          when(col("c_acctbal") < 0, lit(null).cast("double"))
            .otherwise(col("c_acctbal")).as("pos_bal"))
        .orderBy("c_custkey"),
      Some("""SELECT c_custkey,
        COALESCE(NULLIF(c_mktsegment, 'BUILDING'), 'OTHER') AS seg,
        CASE WHEN c_acctbal < 0 THEN NULL ELSE c_acctbal END AS pos_bal
      FROM customer ORDER BY c_custkey""")),

    "q05_join_inner" -> QueryDef(
      (s, dir) => {
        val li = t(s, dir, "lineitem"); val o = t(s, dir, "orders")
        li.join(o, li("l_orderkey") === o("o_orderkey"))
          .groupBy("o_orderpriority")
          .agg(Det.dsum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("revenue"),
            count(lit(1)).as("n_items"))
          .orderBy("o_orderpriority")
      },
      Some(s"""SELECT o_orderpriority,
        ${dsumSql("l_extendedprice*(1-l_discount)")} AS revenue,
        COUNT(*) AS n_items
      FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      GROUP BY o_orderpriority ORDER BY o_orderpriority""")),

    "q06_join_broadcast_dims" -> QueryDef(
      (s, dir) => {
        val c = t(s, dir, "customer")
        val n = t(s, dir, "nation"); val r = t(s, dir, "region")
        // dims are bounded — broadcast them; the fact side never shuffles
        c.join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
          .join(broadcast(r), col("n_regionkey") === r("r_regionkey"))
          .groupBy("r_name", "n_name")
          .agg(count(lit(1)).as("n_cust"), Det.dsum(col("c_acctbal")).as("total_bal"))
          .orderBy("r_name", "n_name")
      },
      Some(s"""SELECT r_name, n_name, COUNT(*) AS n_cust,
        ${dsumSql("c_acctbal")} AS total_bal
      FROM customer
      JOIN nation ON c_nationkey = n_nationkey
      JOIN region ON n_regionkey = r_regionkey
      GROUP BY r_name, n_name ORDER BY r_name, n_name""")),

    "q07_join_left_outer" -> QueryDef(
      (s, dir) => {
        val o = t(s, dir, "orders"); val li = t(s, dir, "lineitem")
        o.join(li, o("o_orderkey") === li("l_orderkey") && li("l_quantity") > 45, "left")
          .groupBy("o_orderstatus")
          .agg(count(lit(1)).as("n_rows"),
            count(li("l_orderkey")).as("n_matched"),
            sum(when(li("l_orderkey").isNull, 1L).otherwise(0L)).as("n_unmatched"))
          .orderBy("o_orderstatus")
      },
      Some("""SELECT o_orderstatus, COUNT(*) AS n_rows,
        COUNT(l_orderkey) AS n_matched,
        CAST(SUM(CASE WHEN l_orderkey IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_unmatched
      FROM orders LEFT JOIN lineitem
        ON o_orderkey = l_orderkey AND l_quantity > 45
      GROUP BY o_orderstatus ORDER BY o_orderstatus""")),

    "q08_join_full_outer" -> QueryDef(
      (s, dir) => {
        val o = t(s, dir, "orders"); val li = t(s, dir, "lineitem")
        o.join(li, o("o_orderkey") === li("l_orderkey"), "full_outer")
          .agg(count(lit(1)).as("n_rows"),
            sum(when(li("l_orderkey").isNull, 1L).otherwise(0L)).as("n_order_only"),
            sum(when(o("o_orderkey").isNull, 1L).otherwise(0L)).as("n_line_only"),
            count(when(o("o_orderkey").isNotNull && li("l_orderkey").isNotNull, 1)).as("n_matched"))
      },
      Some("""SELECT COUNT(*) AS n_rows,
        CAST(SUM(CASE WHEN l_orderkey IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_order_only,
        CAST(SUM(CASE WHEN o_orderkey IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_line_only,
        COUNT(CASE WHEN o_orderkey IS NOT NULL AND l_orderkey IS NOT NULL THEN 1 END) AS n_matched
      FROM orders FULL JOIN lineitem ON o_orderkey = l_orderkey""")),

    "q09_join_left_semi" -> QueryDef(
      (s, dir) => {
        val c = t(s, dir, "customer"); val o = t(s, dir, "orders")
        c.join(o, c("c_custkey") === o("o_custkey"), "left_semi")
          .groupBy("c_mktsegment")
          .agg(count(lit(1)).as("n_cust"))
          .orderBy("c_mktsegment")
      },
      Some("""SELECT c_mktsegment, COUNT(*) AS n_cust
      FROM customer
      WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
      GROUP BY c_mktsegment ORDER BY c_mktsegment""")),

    "q10_join_left_anti" -> QueryDef(
      (s, dir) => {
        val o = t(s, dir, "orders"); val li = t(s, dir, "lineitem")
        o.join(li, o("o_orderkey") === li("l_orderkey"), "left_anti")
          .groupBy("o_orderstatus")
          .agg(count(lit(1)).as("n_orders"), Det.dsum(col("o_totalprice")).as("lost_value"))
          .orderBy("o_orderstatus")
      },
      Some(s"""SELECT o_orderstatus, COUNT(*) AS n_orders,
        ${dsumSql("o_totalprice")} AS lost_value
      FROM orders
      WHERE NOT EXISTS (SELECT 1 FROM lineitem WHERE l_orderkey = o_orderkey)
      GROUP BY o_orderstatus ORDER BY o_orderstatus""")),

    "q11_join_range" -> QueryDef(
      (s, dir) => {
        // errors within 1 h after a purchase, same user: equi-join on
        // user_id + range predicate — never a cartesian product.
        val e = Events.load(s, dir)
          .select(col("event_id"), col("user_id"), col("event_type"), col("sec"))
        val p = e.filter(col("event_type") === "purchase")
          .select(col("user_id").as("u"), col("sec").as("p_sec"))
        val x = e.filter(col("event_type") === "error")
          .select(col("user_id").as("u2"), col("sec").as("e_sec"))
        p.join(x, col("u") === col("u2")
            && col("e_sec") > col("p_sec") && col("e_sec") <= col("p_sec") + 3600)
          .groupBy(col("u"))
          .agg(count(lit(1)).as("n_pairs"))
          .select(col("u").as("user_id"), col("n_pairs"))
          .orderBy("user_id")
      },
      Some(s"""WITH e AS (SELECT user_id, event_type, ${epochSecSql("ts")} AS sec FROM events)
      SELECT p.user_id, COUNT(*) AS n_pairs
      FROM e p JOIN e x ON x.user_id = p.user_id
        AND x.sec > p.sec AND x.sec <= p.sec + 3600
      WHERE p.event_type = 'purchase' AND x.event_type = 'error'
      GROUP BY p.user_id ORDER BY p.user_id""")),

    "q12_join_asof" -> QueryDef(
      (s, dir) => {
        // per purchase: most recent click at-or-before it (same user),
        // encoded as sec*1e8+event_id. Single shuffle — see AsOfJoin.
        val e = Events.load(s, dir)
          .select(col("event_id"), col("user_id"), col("event_type"), col("sec"))
        val probes = e.filter(col("event_type") === "purchase")
          .select(col("user_id"), col("sec"), col("event_id"))
        val srcs = e.filter(col("event_type") === "click")
          .select(col("user_id"), col("sec"),
            (col("sec") * lit(100000000L) + col("event_id")).as("code"))
        AsOfJoin.asOfCode(probes, srcs, "user_id", "sec", "event_id")
          .orderBy("event_id")
      },
      Some(s"""WITH e AS (SELECT event_id, user_id, event_type, ${epochSecSql("ts")} AS sec FROM events),
      p AS (SELECT event_id, user_id, sec FROM e WHERE event_type = 'purchase'),
      c AS (SELECT user_id, sec, sec*100000000 + event_id AS code FROM e WHERE event_type = 'click')
      SELECT p.event_id, p.user_id,
        (SELECT max(c.code) FROM c WHERE c.user_id = p.user_id AND c.sec <= p.sec) AS match_code
      FROM p ORDER BY p.event_id""")),

    // Same as-of semantics as q12 but through the custom whole-operator
    // path (plans.AsOfJoinNode/Exec): one streaming merge per partition
    // instead of union + running-max window. Shares q12's oracle.
    "q69_join_asof_custom" -> QueryDef(
      (s, dir) => {
        val e = Events.load(s, dir)
          .select(col("event_id"), col("user_id"), col("event_type"), col("sec"))
        val probes = e.filter(col("event_type") === "purchase")
          .select(col("user_id"), col("sec"), col("event_id"))
        val srcs = e.filter(col("event_type") === "click")
          .select(col("user_id"), col("sec"),
            (col("sec") * lit(100000000L) + col("event_id")).as("code"))
        graft.plans.AsOfJoinPlan.asOf(probes, srcs).orderBy("event_id")
      },
      Some(s"""WITH e AS (SELECT event_id, user_id, event_type, ${epochSecSql("ts")} AS sec FROM events),
      p AS (SELECT event_id, user_id, sec FROM e WHERE event_type = 'purchase'),
      c AS (SELECT user_id, sec, sec*100000000 + event_id AS code FROM e WHERE event_type = 'click')
      SELECT p.event_id, p.user_id,
        (SELECT max(c.code) FROM c WHERE c.user_id = p.user_id AND c.sec <= p.sec) AS match_code
      FROM p ORDER BY p.event_id""")),

    "q13_join_cross" -> QueryDef(
      (s, dir) => t(s, dir, "region").crossJoin(t(s, dir, "nation"))
        .select(col("r_name"), col("n_name"))
        .orderBy("r_name", "n_name"),
      Some("""SELECT r_name, n_name FROM region CROSS JOIN nation
      ORDER BY r_name, n_name""")),

    "q14_agg_distinct" -> QueryDef(
      (s, dir) => t(s, dir, "lineitem")
        .groupBy("l_returnflag")
        .agg(countDistinct(col("l_suppkey")).as("n_supp"),
          countDistinct(col("l_partkey")).as("n_part"),
          count(lit(1)).as("n_rows"))
        .orderBy("l_returnflag"),
      Some("""SELECT l_returnflag,
        COUNT(DISTINCT l_suppkey) AS n_supp,
        COUNT(DISTINCT l_partkey) AS n_part,
        COUNT(*) AS n_rows
      FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""")),

    "q15_agg_rollup" -> QueryDef(
      (s, dir) => {
        val c = t(s, dir, "customer")
        val n = t(s, dir, "nation"); val r = t(s, dir, "region")
        val joined = c.join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
          .join(broadcast(r), col("n_regionkey") === r("r_regionkey"))
          .select(col("r_name"), col("n_name"), col("c_acctbal"))
        // SQL form: the Dataset rollup trips Spark's self-join ambiguity
        // false-positive when re-selecting grouping columns; GROUP BY
        // ROLLUP through the parser plans identically.
        joined.createOrReplaceTempView("q15_rollup_src")
        s.sql(s"""SELECT COALESCE(r_name, '~ALL') AS r_name,
            COALESCE(n_name, '~ALL') AS n_name,
            COUNT(*) AS n_cust,
            ${Det.dsumSql("c_acctbal")} AS total_bal
          FROM q15_rollup_src
          GROUP BY ROLLUP(r_name, n_name)
          ORDER BY 1, 2""")
      },
      Some(s"""SELECT COALESCE(r_name, '~ALL') AS r_name,
        COALESCE(n_name, '~ALL') AS n_name,
        COUNT(*) AS n_cust, ${dsumSql("c_acctbal")} AS total_bal
      FROM customer
      JOIN nation ON c_nationkey = n_nationkey
      JOIN region ON n_regionkey = r_regionkey
      GROUP BY ROLLUP(r_name, n_name)
      ORDER BY 1, 2""")),

    "q16_agg_filtered" -> QueryDef(
      (s, dir) => t(s, dir, "orders")
        .groupBy("o_orderpriority")
        .agg(count(when(col("o_orderstatus") === "F", 1)).as("n_f"),
          count(when(col("o_orderstatus") === "O", 1)).as("n_o"),
          count(when(col("o_orderstatus") === "P", 1)).as("n_p"),
          Det.dsum(when(col("o_orderstatus") === "F", col("o_totalprice")).otherwise(lit(0.0))).as("f_value"))
        .orderBy("o_orderpriority"),
      Some(s"""SELECT o_orderpriority,
        COUNT(*) FILTER (WHERE o_orderstatus = 'F') AS n_f,
        COUNT(*) FILTER (WHERE o_orderstatus = 'O') AS n_o,
        COUNT(*) FILTER (WHERE o_orderstatus = 'P') AS n_p,
        ${dsumSql("CASE WHEN o_orderstatus = 'F' THEN o_totalprice ELSE 0 END")} AS f_value
      FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority""")),

    "q17_agg_percentile" -> QueryDef(
      (s, dir) => t(s, dir, "orders")
        .groupBy("o_orderstatus")
        .agg(round(expr("percentile(o_totalprice, 0.5)"), 6).as("median_price"),
          round(expr("percentile(o_totalprice, 0.9)"), 6).as("p90_price"),
          min(col("o_totalprice")).as("min_price"),
          max(col("o_totalprice")).as("max_price"))
        .orderBy("o_orderstatus"),
      Some("""SELECT o_orderstatus,
        round(quantile_cont(o_totalprice, 0.5), 6) AS median_price,
        round(quantile_cont(o_totalprice, 0.9), 6) AS p90_price,
        MIN(o_totalprice) AS min_price,
        MAX(o_totalprice) AS max_price
      FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus""")),

    "q18_agg_collect" -> QueryDef(
      (s, dir) => {
        val c = t(s, dir, "customer"); val o = t(s, dir, "orders")
        c.join(o, c("c_custkey") === o("o_custkey"))
          .groupBy("c_custkey")
          // collect_list is unordered across partitions — array_sort
          // before serializing makes it deterministic (SURVEY.md §2.3)
          .agg(concat_ws(",", array_sort(collect_list(col("o_orderstatus")))).as("statuses"),
            count(lit(1)).as("n_orders"))
          .orderBy("c_custkey")
      },
      Some("""SELECT c_custkey,
        string_agg(o_orderstatus, ',' ORDER BY o_orderstatus) AS statuses,
        COUNT(*) AS n_orders
      FROM customer JOIN orders ON o_custkey = c_custkey
      GROUP BY c_custkey ORDER BY c_custkey""")),

    "q19_agg_stats" -> QueryDef(
      (s, dir) => t(s, dir, "lineitem")
        .groupBy("l_returnflag")
        .agg(round(stddev_samp(col("l_quantity")), 4).as("sd_qty"),
          round(var_samp(col("l_quantity")), 4).as("var_qty"),
          round(corr(col("l_quantity"), col("l_extendedprice")), 6).as("corr_qty_price"),
          Det.davg(col("l_quantity")).as("avg_qty"))
        .orderBy("l_returnflag"),
      Some(s"""SELECT l_returnflag,
        round(stddev_samp(l_quantity), 4) AS sd_qty,
        round(var_samp(l_quantity), 4) AS var_qty,
        round(corr(l_quantity, l_extendedprice), 6) AS corr_qty_price,
        ${Det.davgSql("l_quantity")} AS avg_qty
      FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""")),

    // approx_count_distinct has no DuckDB-identical twin → rows-only check
    // (SURVEY.md §2.2); the exact count rides along for eyeballing error.
    "q20_agg_approx_distinct" -> QueryDef(
      (s, dir) => Events.load(s, dir)
        .groupBy("event_type")
        .agg(approx_count_distinct(col("user_id")).as("approx_users"),
          countDistinct(col("user_id")).as("exact_users"))
        .orderBy("event_type"),
      None),

    "q21_win_rank" -> QueryDef(
      (s, dir) => {
        val w = Window.partitionBy("o_custkey")
          .orderBy(col("o_totalprice").desc, col("o_orderkey"))
        t(s, dir, "orders")
          .select(col("o_custkey"), col("o_orderkey"), col("o_totalprice"),
            row_number().over(w).cast("long").as("rn"),
            rank().over(w).cast("long").as("rnk"),
            dense_rank().over(w).cast("long").as("drnk"))
          .filter(col("rn") <= 3)
          .orderBy("o_custkey", "rn")
      },
      Some("""SELECT * FROM (
        SELECT o_custkey, o_orderkey, o_totalprice,
          row_number() OVER w AS rn, rank() OVER w AS rnk, dense_rank() OVER w AS drnk
        FROM orders
        WINDOW w AS (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey))
      WHERE rn <= 3 ORDER BY o_custkey, rn""")),

    "q22_win_lag_lead" -> QueryDef(
      (s, dir) => {
        val w = Window.partitionBy("user_id").orderBy(col("sec"), col("event_id"))
        Events.load(s, dir)
          .select(col("event_id"), col("user_id"), col("event_type"), col("sec"))
          .select(col("event_id"), col("user_id"), col("event_type"),
            lag(col("event_type"), 1).over(w).as("prev_type"),
            (col("sec") - lag(col("sec"), 1).over(w)).as("gap_sec"),
            lead(col("event_id"), 1).over(w).as("next_id"))
          .orderBy("event_id")
      },
      Some(s"""WITH e AS (SELECT event_id, user_id, event_type, ${epochSecSql("ts")} AS sec FROM events)
      SELECT event_id, user_id, event_type,
        lag(event_type, 1) OVER w AS prev_type,
        sec - lag(sec, 1) OVER w AS gap_sec,
        lead(event_id, 1) OVER w AS next_id
      FROM e WINDOW w AS (PARTITION BY user_id ORDER BY sec, event_id)
      ORDER BY event_id""")),

    "q23_win_running_sum" -> QueryDef(
      (s, dir) => {
        val w = Window.partitionBy("o_custkey")
          .orderBy(col("o_orderdate"), col("o_orderkey"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        t(s, dir, "orders")
          .select(col("o_custkey"), col("o_orderkey"),
            sum(col("o_totalprice").cast(Det.D6)).over(w).cast("double").as("run_value"),
            count(lit(1)).over(w).as("run_n"))
          .orderBy("o_custkey", "o_orderkey")
      },
      Some("""SELECT o_custkey, o_orderkey,
        CAST(SUM(CAST(o_totalprice AS DECIMAL(18,6))) OVER w AS DOUBLE) AS run_value,
        COUNT(*) OVER w AS run_n
      FROM orders
      WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
      ORDER BY o_custkey, o_orderkey""")),

    "q24_win_range_frame" -> QueryDef(
      (s, dir) => {
        val od = t(s, dir, "orders")
          .select(col("o_custkey"), col("o_orderkey"),
            datediff(col("o_orderdate").cast("date"), lit("1995-01-01").cast("date"))
              .cast("long").as("day_no"),
            col("o_totalprice"))
        val w = Window.partitionBy("o_custkey").orderBy("day_no").rangeBetween(-6, 0)
        od.select(col("o_custkey"), col("o_orderkey"), col("day_no"),
          count(lit(1)).over(w).as("n7"),
          sum(col("o_totalprice").cast(Det.D6)).over(w).cast("double").as("v7"))
          .orderBy("o_custkey", "o_orderkey")
      },
      Some("""WITH od AS (SELECT o_custkey, o_orderkey,
        CAST(datediff('day', DATE '1995-01-01', CAST(o_orderdate AS DATE)) AS BIGINT) AS day_no,
        o_totalprice FROM orders)
      SELECT o_custkey, o_orderkey, day_no,
        COUNT(*) OVER w AS n7,
        CAST(SUM(CAST(o_totalprice AS DECIMAL(18,6))) OVER w AS DOUBLE) AS v7
      FROM od
      WINDOW w AS (PARTITION BY o_custkey ORDER BY day_no
        RANGE BETWEEN 6 PRECEDING AND CURRENT ROW)
      ORDER BY o_custkey, o_orderkey""")),

    // global ntile: single-partition window — fine for a bounded customer
    // dim; at 100 TB use approx quantile buckets instead.
    "q25_win_ntile" -> QueryDef(
      (s, dir) => {
        val w = Window.orderBy(col("c_acctbal").desc, col("c_custkey"))
        t(s, dir, "customer")
          .select(col("c_custkey"), col("c_acctbal"),
            ntile(4).over(w).cast("long").as("tile"))
          .orderBy("c_custkey")
      },
      Some("""SELECT c_custkey, c_acctbal,
        ntile(4) OVER (ORDER BY c_acctbal DESC, c_custkey) AS tile
      FROM customer ORDER BY c_custkey""")),

    "q26_sort_topk" -> QueryDef(
      (s, dir) => t(s, dir, "lineitem")
        .groupBy("l_partkey")
        .agg(Det.dsum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("revenue"))
        .orderBy(col("revenue").desc, col("l_partkey"))
        .limit(10),
      Some(s"""SELECT l_partkey,
        ${dsumSql("l_extendedprice*(1-l_discount)")} AS revenue
      FROM lineitem GROUP BY l_partkey
      ORDER BY revenue DESC, l_partkey LIMIT 10""")),

    "q27_set_union_all" -> QueryDef(
      (s, dir) => {
        val o = t(s, dir, "orders")
        val a = o.filter(col("o_orderstatus") === "F").select(col("o_custkey").as("custkey"))
        val b = o.filter(col("o_totalprice") > 150000).select(col("o_custkey").as("custkey"))
        a.unionByName(b).groupBy("custkey").agg(count(lit(1)).as("n")).orderBy("custkey")
      },
      Some("""SELECT custkey, COUNT(*) AS n FROM (
        SELECT o_custkey AS custkey FROM orders WHERE o_orderstatus = 'F'
        UNION ALL
        SELECT o_custkey FROM orders WHERE o_totalprice > 150000)
      GROUP BY custkey ORDER BY custkey""")),

    "q28_set_intersect" -> QueryDef(
      (s, dir) => {
        val o = t(s, dir, "orders")
        o.filter(col("o_orderstatus") === "F").select("o_custkey")
          .intersect(o.filter(col("o_orderstatus") === "O").select("o_custkey"))
          .orderBy("o_custkey")
      },
      Some("""SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
      INTERSECT
      SELECT o_custkey FROM orders WHERE o_orderstatus = 'O'
      ORDER BY o_custkey""")),

    "q29_set_except" -> QueryDef(
      (s, dir) => {
        val o = t(s, dir, "orders")
        o.filter(col("o_orderstatus") === "F").select("o_custkey")
          .except(o.filter(col("o_orderstatus") === "P").select("o_custkey"))
          .orderBy("o_custkey")
      },
      Some("""SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
      EXCEPT
      SELECT o_custkey FROM orders WHERE o_orderstatus = 'P'
      ORDER BY o_custkey""")),

    "q30_dedup_first_per_key" -> QueryDef(
      (s, dir) => {
        val e = Events.load(s, dir)
          .select(col("event_id"), col("user_id"), col("event_type"), col("sec"))
        Dedup.firstPerKey(e, Seq("user_id", "event_type"), Seq(col("sec"), col("event_id")))
          .select(col("user_id"), col("event_type"),
            col("event_id").as("first_id"), col("sec").as("first_sec"))
          .orderBy("user_id", "event_type")
      },
      Some(s"""WITH e AS (SELECT event_id, user_id, event_type, ${epochSecSql("ts")} AS sec FROM events),
      r AS (SELECT user_id, event_type, event_id, sec,
        row_number() OVER (PARTITION BY user_id, event_type ORDER BY sec, event_id) AS rn
      FROM e)
      SELECT user_id, event_type, event_id AS first_id, sec AS first_sec
      FROM r WHERE rn = 1 ORDER BY user_id, event_type"""))
  )
}
