package graft.operators

import graft.{QuerySpec, Tables}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame, SparkSession}

import Ops._

/** Relational operator inventory (SURVEY.md §2.8 Q1–Q20, Q24).
  *
  * Design rules (SURVEY.md §7.4 hard part 4 — DuckDB/Spark alignment):
  *  - every query ends in a total ORDER BY (unique key suffix);
  *  - double aggregates go through [[Ops]] exact-decimal helpers;
  *  - NULLS FIRST is explicit wherever a sort key can be null;
  *  - integer-typed outputs are cast to the same width on both engines
  *    (DuckDB `year()`/`date_diff` return BIGINT, `sum(int)` returns
  *    HUGEINT — avoided or cast).
  *
  * Scale notes: all plans are declarative DataFrame ops — Catalyst pushes
  * filters/pruning into the parquet scan, picks partial+final hash
  * aggregation, and AQE handles skew. Dimension sides of joins carry NO
  * explicit broadcast() hint: base-relation size stats are accurate at
  * every scale, so Catalyst broadcasts customer/part at test SF and
  * correctly switches to a shuffle join when the table outgrows
  * `autoBroadcastJoinThreshold` — an explicit hint would override that
  * forever and force a driver OOM at 100 TB (SF-proportional tables).
  * The one exception is q08, whose OPERATOR under test is the explicit
  * broadcast hint itself. Fact-fact self-joins shuffle on their equi-key
  * only.
  */
object Relational {

  private def li(s: SparkSession, d: String) = Tables.lineitem(s, d)
  private def ord(s: SparkSession, d: String) = Tables.orders(s, d)
  private def cust(s: SparkSession, d: String) = Tables.customer(s, d)

  // ---------------------------------------------------------------- Q1
  val q01 = QuerySpec(
    "q01_filter_project",
    (s, d) =>
      li(s, d)
        .filter(col("l_quantity") > 30)
        .select("l_orderkey", "l_linenumber", "l_quantity")
        .orderBy("l_orderkey", "l_linenumber"),
    Some("""SELECT l_orderkey, l_linenumber, l_quantity FROM lineitem
            WHERE l_quantity > 30
            ORDER BY l_orderkey, l_linenumber""")
  )

  // ---------------------------------------------------------------- Q2
  val q02 = QuerySpec(
    "q02_predicate_combo",
    (s, d) =>
      ord(s, d)
        .filter(
          col("o_orderstatus").isin("F", "P") &&
            col("o_orderdate").between(
              lit("1995-06-01 00:00:00").cast("timestamp"),
              lit("1998-12-31 00:00:00").cast("timestamp")) &&
            (col("o_orderpriority").like("%URGENT%") || col("o_totalprice") > 250000))
        .select("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice")
        .orderBy("o_orderkey"),
    Some("""SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice FROM orders
            WHERE o_orderstatus IN ('F','P')
              AND o_orderdate BETWEEN TIMESTAMP '1995-06-01 00:00:00'
                                  AND TIMESTAMP '1998-12-31 00:00:00'
              AND (o_orderpriority LIKE '%URGENT%' OR o_totalprice > 250000)
            ORDER BY o_orderkey""")
  )

  // ---------------------------------------------------------------- Q3
  // events has no native NULLs, so nulls are synthesized with NULLIF/CASE
  // and then handled with COALESCE / IS NULL — identical on both engines.
  val q03 = QuerySpec(
    "q03_null_semantics",
    (s, d) => {
      val bigValue = when(col("value") > 100, col("value"))
      Tables.events(s, d)
        .select(
          col("event_id"),
          coalesce(nullif(col("event_type"), lit("click")), lit("(clicked)"))
            .as("et_or_default"),
          bigValue.as("big_value"),
          coalesce(bigValue, lit(-1.0)).as("big_or_neg"),
          bigValue.isNull.as("is_small"))
        .orderBy("event_id")
    },
    Some("""SELECT event_id,
              COALESCE(NULLIF(event_type, 'click'), '(clicked)') AS et_or_default,
              CASE WHEN value > 100 THEN value END AS big_value,
              COALESCE(CASE WHEN value > 100 THEN value END, -1.0) AS big_or_neg,
              (CASE WHEN value > 100 THEN value END) IS NULL AS is_small
            FROM events ORDER BY event_id""")
  )

  // ---------------------------------------------------------------- Q4
  val q04 = QuerySpec(
    "q04_agg_basic",
    (s, d) =>
      li(s, d)
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
          dsum(col("l_quantity")).as("sum_qty"),
          dsum(col("l_extendedprice")).as("sum_price"),
          davg(col("l_discount")).as("avg_disc"),
          min(col("l_quantity")).as("min_qty"),
          max(col("l_quantity")).as("max_qty"),
          count(lit(1)).as("cnt"))
        .orderBy("l_returnflag", "l_linestatus"),
    Some("""SELECT l_returnflag, l_linestatus,
              CAST(ROUND(SUM(CAST(l_quantity AS DECIMAL(30,10))), 2) AS DOUBLE) AS sum_qty,
              CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(30,10))), 2) AS DOUBLE) AS sum_price,
              CAST(FLOOR(CAST(SUM(CAST(l_discount AS DECIMAL(30,10))) AS DOUBLE) / COUNT(*) * 100.0) AS DOUBLE) / 100.0 AS avg_disc,
              MIN(l_quantity) AS min_qty,
              MAX(l_quantity) AS max_qty,
              COUNT(*) AS cnt
            FROM lineitem
            GROUP BY l_returnflag, l_linestatus
            ORDER BY l_returnflag, l_linestatus""")
  )

  // ---------------------------------------------------------------- Q5
  val q05 = QuerySpec(
    "q05_agg_distinct",
    (s, d) =>
      ord(s, d)
        .join(cust(s, d), col("o_custkey") === col("c_custkey"))
        .groupBy("c_nationkey")
        .agg(
          countDistinct(col("o_custkey")).as("n_cust"),
          count(lit(1)).as("n_orders"))
        .orderBy("c_nationkey"),
    Some("""SELECT c_nationkey,
              COUNT(DISTINCT o_custkey) AS n_cust, COUNT(*) AS n_orders
            FROM orders JOIN customer ON o_custkey = c_custkey
            GROUP BY c_nationkey ORDER BY c_nationkey""")
  )

  // ---------------------------------------------------------------- Q6
  val q06 = QuerySpec(
    "q06_agg_having",
    (s, d) =>
      cust(s, d)
        .groupBy("c_nationkey")
        .agg(count(lit(1)).as("n_cust"), dsum(col("c_acctbal")).as("sum_bal"))
        .filter(col("n_cust") > 60)
        .orderBy("c_nationkey"),
    Some("""SELECT c_nationkey, COUNT(*) AS n_cust,
              CAST(ROUND(SUM(CAST(c_acctbal AS DECIMAL(30,10))), 2) AS DOUBLE) AS sum_bal
            FROM customer GROUP BY c_nationkey
            HAVING COUNT(*) > 60 ORDER BY c_nationkey""")
  )

  // ---------------------------------------------------------------- Q7
  val q07 = QuerySpec(
    "q07_join_inner_equi",
    (s, d) =>
      ord(s, d)
        .join(cust(s, d), col("o_custkey") === col("c_custkey"))
        .groupBy("c_nationkey")
        .agg(count(lit(1)).as("n_orders"), dsum(col("o_totalprice")).as("sum_price"))
        .orderBy("c_nationkey"),
    Some("""SELECT c_nationkey, COUNT(*) AS n_orders,
              CAST(ROUND(SUM(CAST(o_totalprice AS DECIMAL(30,10))), 2) AS DOUBLE) AS sum_price
            FROM orders JOIN customer ON o_custkey = c_custkey
            GROUP BY c_nationkey ORDER BY c_nationkey""")
  )

  // ---------------------------------------------------------------- Q8
  val q08 = QuerySpec(
    "q08_join_broadcast",
    (s, d) =>
      li(s, d)
        .join(
          broadcast(Tables.part(s, d).filter(col("p_brand").isin("Brand#12", "Brand#23", "Brand#34"))),
          col("l_partkey") === col("p_partkey"))
        .groupBy("p_brand")
        .agg(
          dsum(col("l_quantity")).as("sum_qty"),
          dsum(col("l_extendedprice")).as("sum_price"),
          count(lit(1)).as("cnt"))
        .orderBy("p_brand"),
    Some("""SELECT p_brand,
              CAST(ROUND(SUM(CAST(l_quantity AS DECIMAL(30,10))), 2) AS DOUBLE) AS sum_qty,
              CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(30,10))), 2) AS DOUBLE) AS sum_price,
              COUNT(*) AS cnt
            FROM lineitem JOIN part ON l_partkey = p_partkey
            WHERE p_brand IN ('Brand#12','Brand#23','Brand#34')
            GROUP BY p_brand ORDER BY p_brand""")
  )

  // ---------------------------------------------------------------- Q9
  val q09 = QuerySpec(
    "q09_join_semi_anti",
    (s, d) => {
      val c = cust(s, d)
      val o = ord(s, d).select("o_custkey")
      val semi = c
        .join(o, col("c_custkey") === col("o_custkey"), "left_semi")
        .groupBy("c_nationkey").agg(count(lit(1)).as("n"))
        .select(lit("with_orders").as("tag"), col("c_nationkey"), col("n"))
      val anti = c
        .join(o, col("c_custkey") === col("o_custkey"), "left_anti")
        .groupBy("c_nationkey").agg(count(lit(1)).as("n"))
        .select(lit("no_orders").as("tag"), col("c_nationkey"), col("n"))
      semi.unionAll(anti).orderBy("tag", "c_nationkey")
    },
    Some("""SELECT 'with_orders' AS tag, c_nationkey, COUNT(*) AS n
            FROM customer WHERE EXISTS
              (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
            GROUP BY c_nationkey
            UNION ALL
            SELECT 'no_orders' AS tag, c_nationkey, COUNT(*) AS n
            FROM customer WHERE NOT EXISTS
              (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
            GROUP BY c_nationkey
            ORDER BY tag, c_nationkey""")
  )

  // ---------------------------------------------------------------- Q10
  val q10 = QuerySpec(
    "q10_join_outer",
    (s, d) =>
      cust(s, d)
        .join(ord(s, d), col("c_custkey") === col("o_custkey"), "left_outer")
        .groupBy("c_mktsegment")
        .agg(
          count(lit(1)).as("n_rows"),
          count(col("o_orderkey")).as("n_matched"),
          count(when(col("o_orderkey").isNull, lit(1))).as("n_unmatched"))
        .orderBy("c_mktsegment"),
    Some("""SELECT c_mktsegment, COUNT(*) AS n_rows,
              COUNT(o_orderkey) AS n_matched,
              COUNT(CASE WHEN o_orderkey IS NULL THEN 1 END) AS n_unmatched
            FROM customer LEFT JOIN orders ON c_custkey = o_custkey
            GROUP BY c_mktsegment ORDER BY c_mktsegment""")
  )

  // ---------------------------------------------------------------- Q11
  // Range self-join (as-of analog): pairs of events of the same user within
  // a 30-minute forward window. Implemented as a BUCKETED equi-join — the
  // scale-correct range-join plan: a 30-min window means bucket(ts2) ∈
  // {bucket(ts1), bucket(ts1)+1} for 30-min buckets, so the left side is
  // replicated into its two probe buckets and the join key becomes the
  // pure equi (user_id, bucket). Candidates per key are bounded by bucket
  // density instead of per-user event count² — a plain equi-join with a
  // range residual degrades quadratically on dense users at 100 TB.
  val q11 = QuerySpec(
    "q11_join_range",
    (s, d) => {
      val bucketMs = 1800000L // = the window width
      val e = Tables.events(s, d)
      val e1 = e.select(
          col("user_id"), col("ts").as("ts1"), col("event_id").as("id1"),
          floor(unix_millis(col("ts")) / bucketMs).cast("long").as("b1"))
        .withColumn("bucket", explode(array(col("b1"), col("b1") + 1)))
      val e2 = e.select(
        col("user_id"), col("ts").as("ts2"),
        floor(unix_millis(col("ts")) / bucketMs).cast("long").as("bucket"))
      e1.join(e2, Seq("user_id", "bucket"))
        .filter(
          col("ts2") > col("ts1") &&
            col("ts2") <= col("ts1") + expr("INTERVAL 30 MINUTES"))
        .groupBy("user_id")
        .agg(count(lit(1)).as("n_pairs"))
        .orderBy("user_id")
    },
    Some("""WITH e AS (SELECT user_id, event_id, CAST(ts AS TIMESTAMP) AS ts
                       FROM events)
            SELECT e1.user_id, COUNT(*) AS n_pairs
            FROM e e1 JOIN e e2
              ON e1.user_id = e2.user_id
             AND e2.ts > e1.ts
             AND e2.ts <= e1.ts + INTERVAL 30 MINUTE
            GROUP BY e1.user_id ORDER BY e1.user_id""")
  )

  // ---------------------------------------------------------------- Q12
  val q12 = QuerySpec(
    "q12_rollup_cube",
    (s, d) =>
      li(s, d)
        .rollup(col("l_returnflag"), col("l_linestatus"))
        .agg(
          grouping(col("l_returnflag")).cast("int").as("g_flag"),
          grouping(col("l_linestatus")).cast("int").as("g_status"),
          dsum(col("l_quantity")).as("sum_qty"),
          count(lit(1)).as("cnt"))
        .orderBy(
          col("g_flag"), col("g_status"),
          col("l_returnflag").asc_nulls_first,
          col("l_linestatus").asc_nulls_first),
    Some("""SELECT l_returnflag, l_linestatus,
              CAST(GROUPING(l_returnflag) AS INTEGER) AS g_flag,
              CAST(GROUPING(l_linestatus) AS INTEGER) AS g_status,
              CAST(ROUND(SUM(CAST(l_quantity AS DECIMAL(30,10))), 2) AS DOUBLE) AS sum_qty,
              COUNT(*) AS cnt
            FROM lineitem GROUP BY ROLLUP(l_returnflag, l_linestatus)
            ORDER BY g_flag, g_status,
              l_returnflag NULLS FIRST, l_linestatus NULLS FIRST""")
  )

  // ---------------------------------------------------------------- Q13
  val q13 = QuerySpec(
    "q13_window_rank",
    (s, d) => {
      val w = Window.partitionBy(col("c_nationkey"))
        .orderBy(col("c_acctbal").desc, col("c_custkey"))
      cust(s, d)
        .select(
          col("c_nationkey"), col("c_custkey"), col("c_acctbal"),
          row_number().over(w).as("rn"),
          rank().over(w).as("rnk"),
          dense_rank().over(w).as("drnk"))
        .filter(col("rn") <= 5)
        .orderBy("c_nationkey", "rn")
    },
    Some("""SELECT * FROM (
              SELECT c_nationkey, c_custkey, c_acctbal,
                ROW_NUMBER() OVER w AS rn,
                RANK() OVER w AS rnk,
                DENSE_RANK() OVER w AS drnk
              FROM customer
              WINDOW w AS (PARTITION BY c_nationkey
                           ORDER BY c_acctbal DESC, c_custkey))
            WHERE rn <= 5 ORDER BY c_nationkey, rn""")
  )

  // ---------------------------------------------------------------- Q14
  val q14 = QuerySpec(
    "q14_window_analytic",
    (s, d) => {
      val w = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_orderdate"), col("o_orderkey"))
      ord(s, d)
        .select(
          col("o_custkey"), col("o_orderkey"),
          col("o_orderdate").cast("date").as("o_date"),
          col("o_totalprice"),
          dsumOver(col("o_totalprice"),
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
            .as("running_total"),
          lag(col("o_totalprice"), 1).over(w).as("prev_price"),
          lead(col("o_totalprice"), 1).over(w).as("next_price"))
        .orderBy("o_custkey", "o_orderkey")
    },
    Some("""SELECT o_custkey, o_orderkey, CAST(o_orderdate AS DATE) AS o_date,
              o_totalprice,
              CAST(ROUND(SUM(CAST(o_totalprice AS DECIMAL(30,10))) OVER (
                PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2) AS DOUBLE)
                AS running_total,
              LAG(o_totalprice, 1) OVER w AS prev_price,
              LEAD(o_totalprice, 1) OVER w AS next_price
            FROM orders
            WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
            ORDER BY o_custkey, o_orderkey""")
  )

  // ---------------------------------------------------------------- Q15
  val q15 = QuerySpec(
    "q15_window_frame",
    (s, d) => {
      val w = Window.partitionBy(col("l_suppkey"))
        .orderBy(col("l_shipdate"), col("l_orderkey"), col("l_linenumber"))
        .rowsBetween(-2, Window.currentRow)
      li(s, d)
        .filter(col("l_quantity") >= 45)
        .select(
          col("l_suppkey"), col("l_orderkey"), col("l_linenumber"),
          dsumOver(col("l_extendedprice"), w).as("moving_sum"))
        .orderBy("l_suppkey", "l_orderkey", "l_linenumber")
    },
    Some("""SELECT l_suppkey, l_orderkey, l_linenumber,
              CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(30,10))) OVER (
                PARTITION BY l_suppkey
                ORDER BY l_shipdate, l_orderkey, l_linenumber
                ROWS BETWEEN 2 PRECEDING AND CURRENT ROW), 2) AS DOUBLE)
                AS moving_sum
            FROM lineitem WHERE l_quantity >= 45
            ORDER BY l_suppkey, l_orderkey, l_linenumber""")
  )

  // ---------------------------------------------------------------- Q16
  val q16 = QuerySpec(
    "q16_topk_per_group",
    (s, d) => {
      val w = Window.partitionBy(col("c_nationkey"))
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      ord(s, d)
        .join(cust(s, d), col("o_custkey") === col("c_custkey"))
        .select(col("c_nationkey"), col("o_orderkey"), col("o_totalprice"))
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") <= 3)
        .orderBy("c_nationkey", "rn")
    },
    Some("""SELECT * FROM (
              SELECT c_nationkey, o_orderkey, o_totalprice,
                ROW_NUMBER() OVER (PARTITION BY c_nationkey
                  ORDER BY o_totalprice DESC, o_orderkey) AS rn
              FROM orders JOIN customer ON o_custkey = c_custkey)
            WHERE rn <= 3 ORDER BY c_nationkey, rn""")
  )

  // ---------------------------------------------------------------- Q17
  val q17 = QuerySpec(
    "q17_set_ops",
    (s, d) => {
      val c = cust(s, d)
      val auto = c.filter(col("c_mktsegment") === "AUTOMOBILE").select("c_custkey")
      val bld = c.filter(col("c_mktsegment") === "BUILDING").select("c_custkey")
      val u = auto.union(bld).distinct()
      val holders = ord(s, d).select(col("o_custkey").as("c_custkey"))
      val rich = c.filter(col("c_acctbal") > 5000).select("c_custkey")
      def cnt(df: DataFrame, tag: String) =
        df.agg(count(lit(1)).as("n")).select(lit(tag).as("tag"), col("n"))
      cnt(u, "union_segs")
        .unionAll(cnt(u.intersect(holders), "intersect_holders"))
        .unionAll(cnt(u.except(rich), "except_rich"))
        .orderBy("tag")
    },
    Some("""WITH u AS (
              SELECT c_custkey FROM customer WHERE c_mktsegment = 'AUTOMOBILE'
              UNION
              SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING')
            SELECT 'union_segs' AS tag, COUNT(*) AS n FROM u
            UNION ALL
            SELECT 'intersect_holders' AS tag, COUNT(*) AS n FROM
              (SELECT c_custkey FROM u INTERSECT SELECT o_custkey FROM orders)
            UNION ALL
            SELECT 'except_rich' AS tag, COUNT(*) AS n FROM
              (SELECT c_custkey FROM u EXCEPT
               SELECT c_custkey FROM customer WHERE c_acctbal > 5000)
            ORDER BY tag""")
  )

  // ---------------------------------------------------------------- Q18
  val q18 = QuerySpec(
    "q18_string_funcs",
    (s, d) =>
      Tables.part(s, d)
        .select(
          col("p_partkey"),
          upper(col("p_name")).as("name_upper"),
          length(col("p_name")).as("name_len"),
          substring(col("p_name"), 1, 5).as("name_pfx"),
          concat_ws(":", col("p_brand"), col("p_type")).as("brand_type"),
          regexp_replace(col("p_brand"), "[0-9]+", "#").as("brand_mask"),
          regexp_extract(col("p_name"), "[a-z]+", 0).as("first_word"),
          trim(lit("  pad  ")).as("trimmed"))
        .orderBy("p_partkey"),
    Some("""SELECT p_partkey,
              UPPER(p_name) AS name_upper,
              LENGTH(p_name) AS name_len,
              SUBSTRING(p_name, 1, 5) AS name_pfx,
              CONCAT(p_brand, ':', p_type) AS brand_type,
              REGEXP_REPLACE(p_brand, '[0-9]+', '#', 'g') AS brand_mask,
              REGEXP_EXTRACT(p_name, '[a-z]+') AS first_word,
              TRIM('  pad  ') AS trimmed
            FROM part ORDER BY p_partkey""")
  )

  // ---------------------------------------------------------------- Q19
  val q19 = QuerySpec(
    "q19_date_funcs",
    (s, d) =>
      ord(s, d)
        .groupBy(date_trunc("month", col("o_orderdate")).cast("date").as("month"))
        .agg(count(lit(1)).as("n_orders"), dsum(col("o_totalprice")).as("sum_price"))
        .select(
          col("month"),
          year(col("month")).as("yr"),
          month(col("month")).as("mon"),
          datediff(col("month"), to_date(lit("1995-01-01"))).as("days_since"),
          col("n_orders"), col("sum_price"))
        .orderBy("month"),
    Some("""SELECT month,
              CAST(YEAR(month) AS INTEGER) AS yr,
              CAST(MONTH(month) AS INTEGER) AS mon,
              CAST(DATE_DIFF('day', DATE '1995-01-01', month) AS INTEGER) AS days_since,
              n_orders, sum_price
            FROM (
              SELECT CAST(DATE_TRUNC('month', o_orderdate) AS DATE) AS month,
                COUNT(*) AS n_orders,
                CAST(ROUND(SUM(CAST(o_totalprice AS DECIMAL(30,10))), 2) AS DOUBLE) AS sum_price
              FROM orders GROUP BY 1)
            ORDER BY month""")
  )

  // ---------------------------------------------------------------- Q20
  val q20 = QuerySpec(
    "q20_math_case",
    (s, d) =>
      ord(s, d)
        .select(
          when(col("o_totalprice") < 100000, "low")
            .when(col("o_totalprice") < 250000, "mid")
            .otherwise("high").as("tier"),
          col("o_totalprice"))
        .groupBy("tier")
        .agg(
          count(lit(1)).as("n"),
          dsum(col("o_totalprice")).as("sum_price"),
          davg(col("o_totalprice")).as("avg_price"),
          round(abs(min(col("o_totalprice")) - lit(200000.0)), 2).as("min_dist"))
        .orderBy("tier"),
    Some("""SELECT tier, COUNT(*) AS n,
              CAST(ROUND(SUM(CAST(o_totalprice AS DECIMAL(30,10))), 2) AS DOUBLE) AS sum_price,
              CAST(FLOOR(CAST(SUM(CAST(o_totalprice AS DECIMAL(30,10))) AS DOUBLE) / COUNT(*) * 100.0) AS DOUBLE) / 100.0 AS avg_price,
              ROUND(ABS(MIN(o_totalprice) - 200000.0), 2) AS min_dist
            FROM (
              SELECT CASE WHEN o_totalprice < 100000 THEN 'low'
                          WHEN o_totalprice < 250000 THEN 'mid'
                          ELSE 'high' END AS tier,
                     o_totalprice
              FROM orders)
            GROUP BY tier ORDER BY tier""")
  )

  // ---------------------------------------------------------------- Q24
  // The reference's routing/rotation math expressed relationally
  // (TopicPartitionWriter.java:194,231-237,268-285): records are routed to
  // (kafka partition ≅ user_id % 8, hourly time bucket), files rotate every
  // flush.size=100 records, and each file is named by its min offset.
  val q24 = QuerySpec(
    "q24_partition_routing",
    (s, d) =>
      Tables.events(s, d)
        .groupBy(
          (col("user_id") % 8).cast("long").as("part"),
          date_format(date_trunc("hour", col("ts")), "yyyy-MM-dd-HH").as("hour_bucket"))
        .agg(
          count(lit(1)).as("n_records"),
          min(col("event_id")).as("start_offset"),
          ceil(count(lit(1)) / lit(100.0)).cast("long").as("n_files"))
        .orderBy("part", "hour_bucket"),
    Some("""SELECT CAST(user_id % 8 AS BIGINT) AS part,
              STRFTIME(DATE_TRUNC('hour', CAST(ts AS TIMESTAMP)), '%Y-%m-%d-%H') AS hour_bucket,
              COUNT(*) AS n_records,
              MIN(event_id) AS start_offset,
              CAST(CEIL(COUNT(*) / 100.0) AS BIGINT) AS n_files
            FROM events
            GROUP BY 1, 2 ORDER BY part, hour_bucket""")
  )

  val all: Seq[QuerySpec] = Seq(
    q01, q02, q03, q04, q05, q06, q07, q08, q09, q10, q11, q12,
    q13, q14, q15, q16, q17, q18, q19, q20, q24)
}
