package graft

import java.sql.Date
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.Parity._
import graft.etl.{Clean, Scd2}
import graft.dim.DateDim

/** One named query: Spark implementation + (optional) DuckDB oracle SQL
  * over the same parquet tables. Column names/types are aligned on both
  * sides (the driver's compare sorts columns by name and hashes values).
  */
final case class QueryDef(name: String,
                          fn: (SparkSession, String) => DataFrame,
                          oracle: Option[String])

/** Core relational operators (SURVEY §2.1–§2.9 re-expressed Spark-first on
  * the driver's TPC-H-ish testdata).
  *
  * Parity conventions (see also [[graft.functions.Parity]]):
  *  - double aggregates go through exact decimal sums (order-independent);
  *  - derived integer columns are cast to long (DuckDB emits BIGINT);
  *  - every result is ordered by a candidate key of the output;
  *  - raw timestamps are never emitted (formatted as strings/dates).
  */
object QueriesCore {

  private def t(s: SparkSession, dir: String, n: String) = Tables.load(s, dir, n)

  /** CAST(SUM(CAST(x AS DECIMAL(30,8))) AS DOUBLE) — dsum's oracle twin. */
  private def dsumSql(x: String) =
    s"CAST(CAST(SUM(CAST(($x) AS DECIMAL(30,8))) AS VARCHAR) AS DOUBLE)"
  private def davgSql(x: String) = s"${dsumSql(x)} / COUNT($x)"

  val defs: Seq[QueryDef] = Seq(

    // ── A-class aggregation (SURVEY §2.4; TPC-H Q1 shape) ──────────────
    QueryDef("q01_pricing_summary",
      (s, dir) => {
        val li = t(s, dir, "lineitem")
          .filter(col("l_shipdate") <= lit("1999-09-02"))
        li.groupBy("l_returnflag", "l_linestatus").agg(
          dsum(col("l_quantity")).as("sum_qty"),
          dsum(col("l_extendedprice")).as("sum_base_price"),
          dsum(col("l_extendedprice") * (lit(1) - col("l_discount")))
            .as("sum_disc_price"),
          dsum(col("l_extendedprice") * (lit(1) - col("l_discount")) *
            (lit(1) + col("l_tax"))).as("sum_charge"),
          davg(col("l_quantity")).as("avg_qty"),
          davg(col("l_extendedprice")).as("avg_price"),
          davg(col("l_discount")).as("avg_disc"),
          count(lit(1)).as("count_order"))
          .orderBy("l_returnflag", "l_linestatus")
      },
      Some(s"""SELECT l_returnflag, l_linestatus,
        ${dsumSql("l_quantity")} AS sum_qty,
        ${dsumSql("l_extendedprice")} AS sum_base_price,
        ${dsumSql("l_extendedprice*(1-l_discount)")} AS sum_disc_price,
        ${dsumSql("l_extendedprice*(1-l_discount)*(1+l_tax)")} AS sum_charge,
        ${davgSql("l_quantity")} AS avg_qty,
        ${davgSql("l_extendedprice")} AS avg_price,
        ${davgSql("l_discount")} AS avg_disc,
        COUNT(*) AS count_order
        FROM lineitem WHERE l_shipdate <= TIMESTAMP '1999-09-02'
        GROUP BY l_returnflag, l_linestatus
        ORDER BY l_returnflag, l_linestatus""")),

    // ── P-class projection/filter (SURVEY §2.2) — pushdown-friendly ────
    QueryDef("q02_filter_project",
      (s, dir) => t(s, dir, "lineitem")
        .filter(col("l_shipdate") >= lit("1996-01-01") &&
          col("l_shipdate") < lit("1996-07-01") && col("l_quantity") < 10)
        .select("l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice")
        .orderBy("l_orderkey", "l_linenumber"),
      Some("""SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1996-01-01'
          AND l_shipdate < TIMESTAMP '1996-07-01' AND l_quantity < 10
        ORDER BY l_orderkey, l_linenumber""")),

    // ── J1 broadcast-dim join chain (SURVEY §2.3; TPC-H Q5 shape) ──────
    QueryDef("q03_region_revenue",
      (s, dir) => {
        val revenue = col("l_extendedprice") * (lit(1) - col("l_discount"))
        t(s, dir, "lineitem")
          .join(t(s, dir, "orders"),
            col("l_orderkey") === col("o_orderkey"))
          .filter(col("o_orderdate") >= lit("1996-01-01") &&
            col("o_orderdate") < lit("1998-01-01"))
          .join(t(s, dir, "customer"), col("o_custkey") === col("c_custkey"))
          .join(broadcast(t(s, dir, "nation")),
            col("c_nationkey") === col("n_nationkey"))
          .join(broadcast(t(s, dir, "region")),
            col("n_regionkey") === col("r_regionkey"))
          .groupBy("r_name", "n_name")
          .agg(dsum(revenue).as("revenue"), count(lit(1)).as("n_items"))
          .orderBy("r_name", "n_name")
      },
      Some(s"""SELECT r_name, n_name,
        ${dsumSql("l_extendedprice*(1-l_discount)")} AS revenue,
        COUNT(*) AS n_items
        FROM lineitem
        JOIN orders ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        JOIN nation ON c_nationkey = n_nationkey
        JOIN region ON n_regionkey = r_regionkey
        WHERE o_orderdate >= TIMESTAMP '1996-01-01'
          AND o_orderdate < TIMESTAMP '1998-01-01'
        GROUP BY r_name, n_name ORDER BY r_name, n_name""")),

    // ── J2 anti-join (new-rows detection shape, load_to_dw.py:184-202) ─
    QueryDef("q04_anti_join",
      (s, dir) => t(s, dir, "customer")
        .join(t(s, dir, "orders").filter(col("o_orderstatus") === "F")
          .select(col("o_custkey").as("c_custkey")), Seq("c_custkey"),
          "left_anti")
        .select("c_custkey", "c_name", "c_mktsegment")
        .orderBy("c_custkey"),
      Some("""SELECT c_custkey, c_name, c_mktsegment FROM customer
        WHERE c_custkey NOT IN
          (SELECT o_custkey FROM orders WHERE o_orderstatus = 'F')
        ORDER BY c_custkey""")),

    // ── J6 semi-join existence probe (guards C3 shape) ─────────────────
    QueryDef("q05_semi_join",
      (s, dir) => t(s, dir, "customer")
        .join(t(s, dir, "orders")
          .filter(col("o_orderpriority") === "1-URGENT" &&
            col("o_totalprice") > 400000)
          .select(col("o_custkey").as("c_custkey")), Seq("c_custkey"),
          "left_semi")
        .select("c_custkey", "c_name", "c_acctbal")
        .orderBy("c_custkey"),
      Some("""SELECT c_custkey, c_name, c_acctbal FROM customer
        WHERE c_custkey IN (SELECT o_custkey FROM orders
          WHERE o_orderpriority = '1-URGENT' AND o_totalprice > 400000)
        ORDER BY c_custkey""")),

    // ── J3 change detection (theta residual; load_to_dw.py:252-281) ────
    // First vs last event value per (user, event_type); emit changed rows.
    QueryDef("q06_change_detect",
      (s, dir) => {
        val ev = t(s, dir, "events")
        val wAsc = Window.partitionBy("user_id", "event_type")
          .orderBy(col("ts").asc, col("event_id").asc)
        val wDesc = Window.partitionBy("user_id", "event_type")
          .orderBy(col("ts").desc, col("event_id").desc)
        val ranked = ev
          .withColumn("rn_a", row_number().over(wAsc))
          .withColumn("rn_d", row_number().over(wDesc))
        val first = ranked.filter(col("rn_a") === 1)
          .select(col("user_id"), col("event_type"),
            col("value").as("first_value"))
        val last = ranked.filter(col("rn_d") === 1)
          .select(col("user_id"), col("event_type"),
            col("value").as("last_value"))
        first.join(last, Seq("user_id", "event_type"))
          .filter(col("first_value") =!= col("last_value"))
          .orderBy("user_id", "event_type")
      },
      Some("""WITH ranked AS (
          SELECT user_id, event_type, value,
            row_number() OVER (PARTITION BY user_id, event_type
              ORDER BY ts ASC, event_id ASC) AS rn_a,
            row_number() OVER (PARTITION BY user_id, event_type
              ORDER BY ts DESC, event_id DESC) AS rn_d
          FROM events),
        f AS (SELECT user_id, event_type, value AS first_value
              FROM ranked WHERE rn_a = 1),
        l AS (SELECT user_id, event_type, value AS last_value
              FROM ranked WHERE rn_d = 1)
        SELECT user_id, event_type, first_value, last_value
        FROM f JOIN l USING (user_id, event_type)
        WHERE first_value <> last_value
        ORDER BY user_id, event_type""")),

    // ── A1 keep-first dedup (load_to_staging.py:220-227 shape) ─────────
    QueryDef("q07_dedup_first",
      (s, dir) => Clean.dedupFirst(t(s, dir, "events"),
        Seq("user_id", "event_type"),
        Seq(col("ts").asc, col("event_id").asc))
        .select("event_id", "user_id", "event_type", "value")
        .orderBy("user_id", "event_type"),
      Some("""SELECT event_id, user_id, event_type, value FROM (
          SELECT *, row_number() OVER (PARTITION BY user_id, event_type
            ORDER BY ts ASC, event_id ASC) AS rn FROM events)
        WHERE rn = 1 ORDER BY user_id, event_type""")),

    // ── Window ranking / per-group top-N (SURVEY §2.10) ────────────────
    QueryDef("q08_window_topn",
      (s, dir) => {
        val w = Window.partitionBy("o_custkey")
          .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
        t(s, dir, "orders")
          .withColumn("rank", row_number().over(w).cast("long"))
          .filter(col("rank") <= 3)
          .select("o_custkey", "o_orderkey", "o_totalprice", "rank")
          .orderBy("o_custkey", "rank")
      },
      Some("""SELECT o_custkey, o_orderkey, o_totalprice, rank FROM (
          SELECT o_custkey, o_orderkey, o_totalprice,
            row_number() OVER (PARTITION BY o_custkey
              ORDER BY o_totalprice DESC, o_orderkey ASC) AS rank
          FROM orders) WHERE rank <= 3 ORDER BY o_custkey, rank""")),

    // ── Custom physical operator: heap-based per-key top-k ─────────────
    // Same semantics as q08, executed by TopKPerKeyExec (custom
    // LogicalPlan + Strategy + SparkPlan; no per-partition sort) and
    // verified against the identical row_number oracle.
    QueryDef("q54_topk_custom_op",
      (s, dir) => graft.plans.TopKPerKey.topKPerKey(
        t(s, dir, "orders"),
        Seq("o_custkey"),
        Seq(graft.plans.TopKPerKey.Sort("o_totalprice", asc = false),
          graft.plans.TopKPerKey.Sort("o_orderkey")), 3)
        .select("o_custkey", "o_orderkey", "o_totalprice", "rank")
        .orderBy("o_custkey", "rank"),
      Some("""SELECT o_custkey, o_orderkey, o_totalprice, rank FROM (
          SELECT o_custkey, o_orderkey, o_totalprice,
            row_number() OVER (PARTITION BY o_custkey
              ORDER BY o_totalprice DESC, o_orderkey ASC) AS rank
          FROM orders) WHERE rank <= 3 ORDER BY o_custkey, rank""")),

    // ── ROLLUP (mart layer P4 reconstruction, SURVEY §2.10) ────────────
    QueryDef("q09_rollup",
      (s, dir) => t(s, dir, "orders")
        .withColumn("order_year", year(col("o_orderdate")).cast("long"))
        .rollup("order_year", "o_orderstatus")
        .agg(dsum(col("o_totalprice")).as("total_price"),
          count(lit(1)).as("n_orders"))
        .orderBy(col("order_year").asc_nulls_first,
          col("o_orderstatus").asc_nulls_first),
      Some(s"""SELECT CAST(year(o_orderdate) AS BIGINT) AS order_year,
        o_orderstatus, ${dsumSql("o_totalprice")} AS total_price,
        COUNT(*) AS n_orders
        FROM orders GROUP BY ROLLUP (order_year, o_orderstatus)
        ORDER BY order_year ASC NULLS FIRST,
          o_orderstatus ASC NULLS FIRST""")),

    // ── CUBE ───────────────────────────────────────────────────────────
    QueryDef("q10_cube",
      (s, dir) => t(s, dir, "lineitem")
        .cube("l_returnflag", "l_linestatus")
        .agg(dsum(col("l_quantity")).as("sum_qty"),
          count(lit(1)).as("n_items"))
        .orderBy(col("l_returnflag").asc_nulls_first,
          col("l_linestatus").asc_nulls_first),
      Some(s"""SELECT l_returnflag, l_linestatus,
        ${dsumSql("l_quantity")} AS sum_qty, COUNT(*) AS n_items
        FROM lineitem GROUP BY CUBE (l_returnflag, l_linestatus)
        ORDER BY l_returnflag ASC NULLS FIRST,
          l_linestatus ASC NULLS FIRST""")),

    // ── GROUPING SETS via the SQL surface (mart layer, SURVEY §2.10) ───
    QueryDef("q44_grouping_sets",
      (s, dir) => {
        t(s, dir, "orders").createOrReplaceTempView("orders_v")
        s.sql(s"""
          SELECT CAST(year(o_orderdate) AS BIGINT) AS order_year,
            o_orderpriority,
            CAST(CAST(SUM(CAST(o_totalprice AS DECIMAL(30,8))) AS DOUBLE)
              AS DOUBLE) AS revenue,
            COUNT(*) AS n_orders
          FROM orders_v
          GROUP BY GROUPING SETS ((order_year), (o_orderpriority), ())
          ORDER BY order_year ASC NULLS FIRST,
            o_orderpriority ASC NULLS FIRST""")
      },
      Some(s"""SELECT CAST(year(o_orderdate) AS BIGINT) AS order_year,
        o_orderpriority,
        ${dsumSql("o_totalprice")} AS revenue,
        COUNT(*) AS n_orders
        FROM orders
        GROUP BY GROUPING SETS ((order_year), (o_orderpriority), ())
        ORDER BY order_year ASC NULLS FIRST,
          o_orderpriority ASC NULLS FIRST""")),

    // ── Set operations (SURVEY §2.10) ──────────────────────────────────
    QueryDef("q11_setops",
      (s, dir) => {
        val o = t(s, dir, "orders")
        val open = o.filter(col("o_orderstatus") === "O")
          .select(col("o_custkey"))
        val urgent = o.filter(col("o_orderpriority") === "1-URGENT")
          .select(col("o_custkey"))
        val big = o.filter(col("o_totalprice") > 450000)
          .select(col("o_custkey"))
        open.intersect(urgent).except(big).orderBy("o_custkey")
      },
      Some("""SELECT o_custkey FROM (
          SELECT o_custkey FROM orders WHERE o_orderstatus = 'O'
          INTERSECT
          SELECT o_custkey FROM orders WHERE o_orderpriority = '1-URGENT'
          EXCEPT
          SELECT o_custkey FROM orders WHERE o_totalprice > 450000)
        ORDER BY o_custkey""")),

    // ── F-class scalar string pipeline (SURVEY §2.5 F1/F2/F4/F5) ───────
    QueryDef("q12_string_clean",
      (s, dir) => t(s, dir, "part").select(
        col("p_partkey"),
        Clean.naturalKey(col("p_name"), col("p_brand")).as("natural_key"),
        Clean.digitsOnly(col("p_brand")).as("brand_num"),
        Clean.firstToken(col("p_name")).as("name_token"),
        upper(col("p_type")).as("type_upper"),
        length(col("p_name")).cast("long").as("name_len"),
        Clean.normalizePrice(
          concat(col("p_size").cast("string"), lit(",000₫/box")))
          .as("price_clean"))
        .orderBy("p_partkey"),
      Some("""SELECT p_partkey,
        concat_ws('-', p_name, p_brand) AS natural_key,
        CAST(regexp_replace(p_brand, '[^0-9]', '', 'g') AS BIGINT)
          AS brand_num,
        string_split(trim(p_name), ' ')[1] AS name_token,
        upper(p_type) AS type_upper,
        CAST(length(p_name) AS BIGINT) AS name_len,
        CAST(regexp_replace(string_split(
            CAST(p_size AS VARCHAR) || ',000₫/box', '/')[1],
          '[₫,\\s]', '', 'g') AS BIGINT) AS price_clean
        FROM part ORDER BY p_partkey""")),

    // ── F3 typed null-fill (load_to_staging.py:204-216 shape) ──────────
    QueryDef("q13_null_fill",
      (s, dir) => {
        val withNulls = t(s, dir, "customer")
          .withColumn("acctbal_raw",
            when(col("c_acctbal") < 0, lit(null)).otherwise(col("c_acctbal")))
          .withColumn("segment",
            when(col("c_mktsegment") === "AUTOMOBILE", lit(null))
              .otherwise(col("c_mktsegment")))
        Clean.nullFill(withNulls, Seq("segment"), Seq("acctbal_raw"))
          .select(col("c_custkey"), col("segment"),
            col("acctbal_raw").as("acctbal_filled"))
          .orderBy("c_custkey")
      },
      Some("""SELECT c_custkey,
        COALESCE(CASE WHEN c_mktsegment = 'AUTOMOBILE' THEN NULL
          ELSE c_mktsegment END, 'N/A') AS segment,
        COALESCE(CASE WHEN c_acctbal < 0 THEN NULL
          ELSE c_acctbal END, -1.0) AS acctbal_filled
        FROM customer ORDER BY c_custkey""")),

    // ── Calendar dimension generation (SURVEY §2.8) ────────────────────
    QueryDef("q14_date_dim",
      (s, _) => DateDim.generate(s).select(
        "id", "full_date", "day_of_month", "month", "year", "day_of_year",
        "day_name", "month_name", "iso_week", "quarter", "quarter_num",
        "is_weekend")
        .orderBy("full_date"),
      Some("""SELECT
        CAST(row_number() OVER (ORDER BY d) AS BIGINT) AS id,
        CAST(d AS DATE) AS full_date,
        CAST(day(d) AS BIGINT) AS day_of_month,
        CAST(month(d) AS BIGINT) AS month,
        CAST(year(d) AS BIGINT) AS year,
        CAST(dayofyear(d) AS BIGINT) AS day_of_year,
        dayname(d) AS day_name,
        monthname(d) AS month_name,
        CAST(week(d) AS BIGINT) AS iso_week,
        CAST(year(d) AS VARCHAR) || '-Q0' || CAST(quarter(d) AS VARCHAR)
          AS quarter,
        CAST(quarter(d) AS BIGINT) AS quarter_num,
        CASE WHEN isodow(d) IN (6, 7) THEN 'Weekend' ELSE 'Weekday' END
          AS is_weekend
        FROM (SELECT unnest(generate_series(DATE '2005-01-01',
          DATE '2026-01-01', INTERVAL 1 DAY)) AS d) ORDER BY full_date""")),

    // ── SCD2 merge, textbook semantics (SURVEY §2.7) ───────────────────
    // Two per-customer snapshots cut from orders at different dates are
    // merged sequentially; the result carries full version history.
    QueryDef("q15_scd2",
      (s, dir) => {
        def snap(cut: String) = t(s, dir, "orders")
          .filter(col("o_orderdate") < lit(cut))
          .groupBy(col("o_custkey").as("custkey"))
          .agg(count(lit(1)).as("n_orders"),
            max(col("o_totalprice")).as("max_price"))
        val s1 = snap("1998-01-01")
        val s2 = snap("2000-01-01")
        val d0 = s1
          .withColumn("dt_load_to_dw", lit(Date.valueOf("2020-01-01")))
          .withColumn("dt_last_update", lit(Scd2.Sentinel))
        val d1 = Scd2.merge(d0, s2, "custkey",
          Seq("n_orders", "max_price"), Date.valueOf("2020-01-02"))
        d1.orderBy("custkey", "dt_load_to_dw", "dt_last_update")
      },
      Some("""WITH s1 AS (
          SELECT o_custkey AS custkey, COUNT(*) AS n_orders,
            max(o_totalprice) AS max_price
          FROM orders WHERE o_orderdate < TIMESTAMP '1998-01-01'
          GROUP BY 1),
        s2 AS (
          SELECT o_custkey AS custkey, COUNT(*) AS n_orders,
            max(o_totalprice) AS max_price
          FROM orders WHERE o_orderdate < TIMESTAMP '2000-01-01'
          GROUP BY 1),
        changed AS (
          SELECT s2.custkey FROM s2 JOIN s1 USING (custkey)
          WHERE s2.n_orders <> s1.n_orders OR s2.max_price <> s1.max_price),
        kept AS (
          SELECT custkey, n_orders, max_price,
            DATE '2020-01-01' AS dt_load_to_dw,
            DATE '9999-12-31' AS dt_last_update
          FROM s1 WHERE custkey NOT IN (SELECT custkey FROM changed)),
        closed AS (
          SELECT custkey, n_orders, max_price,
            DATE '2020-01-01' AS dt_load_to_dw,
            DATE '2020-01-02' AS dt_last_update
          FROM s1 WHERE custkey IN (SELECT custkey FROM changed)),
        newver AS (
          SELECT custkey, n_orders, max_price,
            DATE '2020-01-02' AS dt_load_to_dw,
            DATE '9999-12-31' AS dt_last_update
          FROM s2 WHERE custkey IN (SELECT custkey FROM changed)
             OR custkey NOT IN (SELECT custkey FROM s1))
        SELECT * FROM (
          SELECT * FROM kept UNION ALL SELECT * FROM closed
          UNION ALL SELECT * FROM newver)
        ORDER BY custkey, dt_load_to_dw, dt_last_update""")),

    // ── Global top-k with deterministic tie-break ──────────────────────
    QueryDef("q16_topk",
      (s, dir) => t(s, dir, "orders")
        .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
        .select("o_orderkey", "o_custkey", "o_totalprice")
        .limit(10),
      Some("""SELECT o_orderkey, o_custkey, o_totalprice FROM orders
        ORDER BY o_totalprice DESC, o_orderkey ASC LIMIT 10""")),

    // ── F6 date bucketing + monthly revenue (mart report shape) ────────
    QueryDef("q17_monthly_revenue",
      (s, dir) => t(s, dir, "orders")
        .groupBy(date_format(col("o_orderdate"), "yyyy-MM").as("order_month"))
        .agg(dsum(col("o_totalprice")).as("revenue"),
          count(lit(1)).as("n_orders"))
        .orderBy("order_month"),
      Some(s"""SELECT strftime(o_orderdate, '%Y-%m') AS order_month,
        ${dsumSql("o_totalprice")} AS revenue, COUNT(*) AS n_orders
        FROM orders GROUP BY 1 ORDER BY order_month""")),

    // ── Reference-parity calendar (golden vs date_dim.csv; §2.8) ───────
    QueryDef("q36_date_dim_parity",
      (s, _) => DateDim.referenceParity(s).orderBy("full_date"),
      Some("""WITH cal AS (
          SELECT unnest(generate_series(DATE '2005-01-01',
            DATE '2026-01-01', INTERVAL 1 DAY))::DATE AS d),
        wk AS (SELECT d,
          (d - CAST(dayofweek(d) AS INT)) AS sun_start,
          date_trunc('week', d)::DATE AS mon_start FROM cal),
        anch AS (SELECT *, sun_start - 1 AS sat, mon_start + 3 AS thu
          FROM wk)
        SELECT
          CAST(date_diff('day', DATE '2005-01-01', d) + 1 AS BIGINT) AS id,
          d AS full_date,
          CAST(date_diff('day', DATE '2005-01-01', d) + 1 AS BIGINT)
            AS day_of_month,
          CAST((year(d) - 2005) * 12 + month(d) AS BIGINT) AS month,
          dayname(d) AS day_name,
          monthname(d) AS month_name,
          CAST(year(d) AS BIGINT) AS year,
          CAST(year(d) AS VARCHAR) || '-' || strftime(d, '%b')
            AS start_of_week,
          CAST(day(d) AS BIGINT) AS day_of_week,
          CAST(dayofyear(d) AS BIGINT) AS day_of_year,
          CAST((dayofyear(sat) - 1) // 7 + 1 AS BIGINT) AS iso_week,
          CAST(year(sat) AS VARCHAR) || '-W' ||
            lpad(CAST((dayofyear(sat) - 1) // 7 + 1 AS VARCHAR), 2, '0')
            AS iso_week_year,
          sun_start AS start_of_iso_week,
          CAST((dayofyear(thu) - 1) // 7 + 1 AS BIGINT) AS iso_week_alt,
          CAST(year(mon_start) AS VARCHAR) || '-W' ||
            lpad(CAST((dayofyear(thu) - 1) // 7 + 1 AS VARCHAR), 2, '0')
            AS iso_week_year_alt,
          mon_start AS start_of_iso_alt,
          CAST(year(d) AS VARCHAR) || '-Q' ||
            lpad(CAST(quarter(d) AS VARCHAR), 2, '0') AS quarter,
          CAST((year(d) - 2005) * 4 + quarter(d) AS BIGINT) AS quarter_num,
          'Non-Holiday' AS holiday_flag,
          CASE WHEN dayofweek(d) IN (0, 6) THEN 'Weekend' ELSE 'Weekday' END
            AS is_weekend
        FROM anch ORDER BY full_date""")),

    // ── C2 run-log state machine shape: latest status per entity ───────
    QueryDef("q18_latest_status",
      (s, dir) => {
        val w = Window.partitionBy("user_id")
          .orderBy(col("ts").desc, col("event_id").desc)
        t(s, dir, "events")
          .withColumn("rn", row_number().over(w))
          .withColumn("n_events",
            count(lit(1)).over(Window.partitionBy("user_id")))
          .filter(col("rn") === 1)
          .select(col("user_id"), col("event_type").as("last_event_type"),
            col("value").as("last_value"), col("n_events"))
          .orderBy("user_id")
      },
      Some("""SELECT user_id, event_type AS last_event_type,
          value AS last_value, n_events
        FROM (SELECT *,
          row_number() OVER (PARTITION BY user_id
            ORDER BY ts DESC, event_id DESC) AS rn,
          COUNT(*) OVER (PARTITION BY user_id) AS n_events
          FROM events)
        WHERE rn = 1 ORDER BY user_id""")),

    // ── Full outer join + coalesce (dimension conformance shape) ───────
    QueryDef("q38_outer_join",
      (s, dir) => {
        val cust = t(s, dir, "customer").groupBy(col("c_nationkey")
          .as("nationkey")).agg(count(lit(1)).as("n_cust"))
        val supp = t(s, dir, "supplier").groupBy(col("s_nationkey")
          .as("nationkey")).agg(count(lit(1)).as("n_supp"))
        cust.join(supp, Seq("nationkey"), "full_outer")
          .select(col("nationkey"),
            coalesce(col("n_cust"), lit(0L)).as("n_cust"),
            coalesce(col("n_supp"), lit(0L)).as("n_supp"))
          .orderBy("nationkey")
      },
      Some("""SELECT COALESCE(c.nationkey, s.nationkey) AS nationkey,
          COALESCE(n_cust, 0) AS n_cust, COALESCE(n_supp, 0) AS n_supp
        FROM (SELECT c_nationkey AS nationkey, COUNT(*) AS n_cust
              FROM customer GROUP BY 1) c
        FULL OUTER JOIN
             (SELECT s_nationkey AS nationkey, COUNT(*) AS n_supp
              FROM supplier GROUP BY 1) s
        USING (nationkey)
        ORDER BY nationkey""")),

    // ── Pivot (mart-layer crosstab; Spark .pivot ↔ CASE aggregation) ───
    QueryDef("q39_pivot",
      (s, dir) => t(s, dir, "orders")
        .withColumn("order_year", year(col("o_orderdate")).cast("long"))
        .groupBy("order_year")
        .pivot("o_orderstatus", Seq("F", "O", "P"))
        .agg(dsum(col("o_totalprice")))
        .na.fill(0.0, Seq("F", "O", "P"))
        .orderBy("order_year"),
      Some(s"""SELECT CAST(year(o_orderdate) AS BIGINT) AS order_year,
        COALESCE(${dsumSql("CASE WHEN o_orderstatus = 'F' THEN o_totalprice END")}, 0.0) AS "F",
        COALESCE(${dsumSql("CASE WHEN o_orderstatus = 'O' THEN o_totalprice END")}, 0.0) AS "O",
        COALESCE(${dsumSql("CASE WHEN o_orderstatus = 'P' THEN o_totalprice END")}, 0.0) AS "P"
        FROM orders GROUP BY 1 ORDER BY order_year""")),

    // ── Lag/lead analytics (time-series deltas per entity) ─────────────
    QueryDef("q40_lag_lead",
      (s, dir) => {
        val w = Window.partitionBy("user_id")
          .orderBy(col("ts").asc, col("event_id").asc)
        t(s, dir, "events")
          .withColumn("prev_value", lag(col("value"), 1).over(w))
          .withColumn("next_value", lead(col("value"), 1).over(w))
          .withColumn("delta", col("value") - col("prev_value"))
          .select("event_id", "user_id", "value", "prev_value",
            "next_value", "delta")
          .orderBy("event_id")
      },
      Some("""SELECT event_id, user_id, value,
          lag(value) OVER w AS prev_value,
          lead(value) OVER w AS next_value,
          value - lag(value) OVER w AS delta
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts ASC, event_id ASC)
        ORDER BY event_id""")),

    // ── Gap-based sessionization (batch; 30-min inactivity gap) ────────
    QueryDef("q41_sessions",
      (s, dir) => {
        val gapUs = Params.sessionGapMinutes * 60L * 1000000L
        val w = Window.partitionBy("user_id")
          .orderBy(col("ts").asc, col("event_id").asc)
        t(s, dir, "events")
          .withColumn("prev_us", lag(unix_micros(col("ts")), 1).over(w))
          .withColumn("is_new",
            (col("prev_us").isNull ||
              unix_micros(col("ts")) - col("prev_us") > gapUs).cast("long"))
          .withColumn("session_id", sum(col("is_new")).over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
          .groupBy("user_id", "session_id")
          .agg(count(lit(1)).as("n_events"),
            date_format(min(col("ts")), "yyyy-MM-dd HH:mm:ss")
              .as("session_start"),
            date_format(max(col("ts")), "yyyy-MM-dd HH:mm:ss")
              .as("session_end"))
          .orderBy("user_id", "session_id")
      },
      Some(s"""WITH flagged AS (
          SELECT user_id, event_id, ts,
            CASE WHEN lag(ts) OVER w IS NULL
              OR epoch_us(ts) - epoch_us(lag(ts) OVER w)
                 > ${Params.sessionGapMinutes * 60L * 1000000L}
              THEN 1 ELSE 0 END AS is_new
          FROM events
          WINDOW w AS (PARTITION BY user_id ORDER BY ts ASC, event_id ASC)),
        sessions AS (
          SELECT user_id, ts,
            CAST(SUM(is_new) OVER (PARTITION BY user_id
              ORDER BY ts ASC, event_id ASC
              ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_id
          FROM flagged)
        SELECT user_id, session_id, COUNT(*) AS n_events,
          strftime(min(ts), '%Y-%m-%d %H:%M:%S') AS session_start,
          strftime(max(ts), '%Y-%m-%d %H:%M:%S') AS session_end
        FROM sessions GROUP BY user_id, session_id
        ORDER BY user_id, session_id""")),

    // ── Distinct aggregates ────────────────────────────────────────────
    QueryDef("q42_distinct_agg",
      (s, dir) => t(s, dir, "orders")
        .groupBy("o_orderpriority")
        .agg(countDistinct(col("o_custkey")).as("n_customers"),
          count(lit(1)).as("n_orders"),
          dsum(col("o_totalprice")).as("revenue"))
        .orderBy("o_orderpriority"),
      Some(s"""SELECT o_orderpriority,
        COUNT(DISTINCT o_custkey) AS n_customers, COUNT(*) AS n_orders,
        ${dsumSql("o_totalprice")} AS revenue
        FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority""")),

    // ── Scalar + correlated subqueries via the SQL surface ─────────────
    QueryDef("q48_subqueries",
      (s, dir) => {
        t(s, dir, "customer").createOrReplaceTempView("customer_v")
        t(s, dir, "orders").createOrReplaceTempView("orders_sq_v")
        s.sql("""
          SELECT c_custkey, c_mktsegment, c_acctbal
          FROM customer_v c
          WHERE c_acctbal > (SELECT CAST(SUM(CAST(c_acctbal AS
                  DECIMAL(30,8))) AS DOUBLE) / COUNT(*) FROM customer_v)
            AND EXISTS (SELECT 1 FROM orders_sq_v o
                        WHERE o.o_custkey = c.c_custkey
                          AND o.o_totalprice > 300000)
          ORDER BY c_custkey""")
      },
      Some(s"""SELECT c_custkey, c_mktsegment, c_acctbal
        FROM customer c
        WHERE c_acctbal > (SELECT ${dsumSql("c_acctbal")} / COUNT(*)
                           FROM customer)
          AND EXISTS (SELECT 1 FROM orders o
                      WHERE o.o_custkey = c.c_custkey
                        AND o.o_totalprice > 300000)
        ORDER BY c_custkey""")),

    // ── Window distribution functions (ntile / percent_rank / cume) ────
    QueryDef("q52_window_dist",
      (s, dir) => {
        val w = Window.partitionBy("c_mktsegment")
          .orderBy(col("c_acctbal").asc, col("c_custkey").asc)
        t(s, dir, "customer").select(
          col("c_custkey"), col("c_mktsegment"), col("c_acctbal"),
          ntile(4).over(w).cast("long").as("quartile"),
          percent_rank().over(w).as("pct_rank"),
          cume_dist().over(w).as("cume"))
          .orderBy("c_custkey")
      },
      Some("""SELECT c_custkey, c_mktsegment, c_acctbal,
          CAST(ntile(4) OVER w AS BIGINT) AS quartile,
          percent_rank() OVER w AS pct_rank,
          cume_dist() OVER w AS cume
        FROM customer
        WINDOW w AS (PARTITION BY c_mktsegment
          ORDER BY c_acctbal ASC, c_custkey ASC)
        ORDER BY c_custkey""")),

    // ── Array aggregation over nested types (sorted collect_set) ───────
    // The array ops (collect_set, sort_array, size, array_contains) stay
    // internal; the emitted event_types is array_join'd to a string so the
    // driver's pandas sort/hash comparator can handle it (a raw array
    // column is unhashable there — CORRECTNESS_r01 q53).
    QueryDef("q53_array_agg",
      (s, dir) => t(s, dir, "events")
        .groupBy("user_id")
        .agg(sort_array(collect_set(col("event_type"))).as("types_arr"))
        .select(col("user_id"),
          array_join(col("types_arr"), ",").as("event_types"),
          size(col("types_arr")).cast("long").as("n_distinct_types"),
          array_contains(col("types_arr"), "purchase").as("has_purchase"))
        .orderBy("user_id"),
      Some("""SELECT user_id,
          array_to_string(list_sort(list(DISTINCT event_type)), ',')
            AS event_types,
          CAST(len(list_sort(list(DISTINCT event_type))) AS BIGINT)
            AS n_distinct_types,
          list_contains(list(DISTINCT event_type), 'purchase')
            AS has_purchase
        FROM events GROUP BY user_id ORDER BY user_id""")),

    // ── Tumbling-window aggregation (batch twin of the streaming path) ─
    QueryDef("q19_hourly_window",
      (s, dir) => graft.streaming.Streams
        .windowedCounts(t(s, dir, "events"))
        .orderBy("hour_start", "event_type"),
      Some(s"""SELECT
        strftime(time_bucket(INTERVAL '1 hour', ts), '%Y-%m-%d %H:%M:%S')
          AS hour_start,
        event_type, COUNT(*) AS n_events,
        ${dsumSql("value")} AS sum_value
        FROM events GROUP BY 1, 2 ORDER BY hour_start, event_type"""))
  )
}
