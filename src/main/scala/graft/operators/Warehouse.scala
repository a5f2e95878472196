package graft.operators

import graft.{QuerySpec, Tables}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import Ops._

/** Star-schema warehouse staples — the multi-way dimensional join shapes
  * (TPC-H Q5/Q3 class), percent-of-total reporting, SCD2 history builds,
  * and windowed anomaly scoring that a lakehouse serving layer runs daily.
  *
  * Scale posture: every dimension (region/nation/customer/supplier) is
  * broadcast — the only shuffles are the fact-fact join (lineitem⋈orders,
  * keyed on orderkey) and the final small aggregate. The revenue expression
  * is computed entirely in DECIMAL(18,4) so the per-row product
  * `price·(1−discount)` is EXACT — `(18,4)×(19,4)` fits both engines'
  * 38-digit decimals without scale truncation, which makes the aggregate
  * bit-deterministic under any partitioning/ordering (the property every
  * oracled sum here leans on; see Ops.dsum).
  *
  * The reference connector has no analytics surface (SURVEY.md §2.7);
  * these queries are part of the engine's own inventory.
  */
object Warehouse {

  /** Exact per-row revenue: price·(1−discount) in decimal arithmetic. */
  private val D184 = DecimalType(18, 4)
  private def revenue: Column =
    col("l_extendedprice").cast(D184) * (lit(1).cast(D184) - col("l_discount").cast(D184))
  private val revenueSql =
    "CAST(l_extendedprice AS DECIMAL(18,4)) * (CAST(1 AS DECIMAL(18,4)) - CAST(l_discount AS DECIMAL(18,4)))"

  /** Decimal-exact revenue sum, rounded to 2 decimals, as double. */
  private def drevSum: Column = round(sum(revenue), 2).cast("double")
  private val drevSumSql = s"CAST(ROUND(SUM($revenueSql), 2) AS DOUBLE)"

  // --------------------------------------------------------------- q132
  /** TPC-H Q5 shape: revenue per nation for one region and order-date
    * year, through the full star — lineitem ⋈ orders ⋈ customer ⋈ nation
    * ⋈ region, with the supplier leg pinned to the customer's nation
    * (local supply). Plan: all four dimensions broadcast (they are KB–MB
    * at any corpus scale); the only real shuffle is lineitem⋈orders on
    * orderkey, and AQE coalesces the final 25-row aggregate. The
    * o_orderdate range predicate pushes to the orders scan.
    */
  val q132 = QuerySpec(
    "q132_star_revenue",
    (s, d) => {
      val li = Tables.lineitem(s, d)
      val ord = Tables.orders(s, d)
        .filter(col("o_orderdate") >= lit("1996-01-01").cast("timestamp") &&
          col("o_orderdate") < lit("1998-01-01").cast("timestamp"))
      val cust = Tables.customer(s, d)
      val sup = Tables.supplier(s, d)
      val nat = Tables.nation(s, d)
      val reg = Tables.region(s, d).filter(col("r_name") === "ASIA")
      li.join(ord, col("l_orderkey") === col("o_orderkey"))
        .join(sup, col("l_suppkey") === col("s_suppkey"))
        .join(cust,
          col("o_custkey") === col("c_custkey") &&
            col("c_nationkey") === col("s_nationkey"))
        .join(nat, col("c_nationkey") === col("n_nationkey"))
        .join(reg, col("n_regionkey") === col("r_regionkey"))
        .groupBy("n_name")
        .agg(drevSum.as("revenue"), count(lit(1)).as("n_items"))
        .orderBy("n_name")
    },
    Some(s"""SELECT n_name, $drevSumSql AS revenue, COUNT(*) AS n_items
            FROM lineitem
            JOIN orders   ON l_orderkey = o_orderkey
            JOIN supplier ON l_suppkey = s_suppkey
            JOIN customer ON o_custkey = c_custkey AND c_nationkey = s_nationkey
            JOIN nation   ON c_nationkey = n_nationkey
            JOIN region   ON n_regionkey = r_regionkey
            WHERE r_name = 'ASIA'
              AND o_orderdate >= TIMESTAMP '1996-01-01'
              AND o_orderdate <  TIMESTAMP '1998-01-01'
            GROUP BY n_name ORDER BY n_name""")
  )

  // --------------------------------------------------------------- q133
  /** TPC-H Q3 shape: top-10 unshipped orders by revenue for one market
    * segment. The `orderBy(...).limit(10)` compiles to
    * TakeOrderedAndProject — per-partition top-10 heaps merged on the
    * driver, never a global sort (the q107/q16 top-k discipline). The
    * date predicates push to both fact scans; customer is broadcast.
    * Ties on the rounded revenue are broken by (o_orderdate, l_orderkey)
    * so the emitted set is unique across engines.
    */
  val q133 = QuerySpec(
    "q133_shipping_priority",
    (s, d) => {
      val cut = lit("1998-01-01").cast("timestamp")
      val cust = Tables.customer(s, d).filter(col("c_mktsegment") === "BUILDING")
      val ord = Tables.orders(s, d).filter(col("o_orderdate") < cut)
      val li = Tables.lineitem(s, d).filter(col("l_shipdate") > cut)
      li.join(ord, col("l_orderkey") === col("o_orderkey"))
        .join(cust, col("o_custkey") === col("c_custkey"))
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(drevSum.as("revenue"))
        .orderBy(col("revenue").desc, col("o_orderdate"), col("l_orderkey"))
        .limit(10)
    },
    Some(s"""SELECT l_orderkey, o_orderdate, o_orderpriority,
              $drevSumSql AS revenue
            FROM lineitem
            JOIN orders   ON l_orderkey = o_orderkey
            JOIN customer ON o_custkey = c_custkey
            WHERE c_mktsegment = 'BUILDING'
              AND o_orderdate < TIMESTAMP '1998-01-01'
              AND l_shipdate  > TIMESTAMP '1998-01-01'
            GROUP BY l_orderkey, o_orderdate, o_orderpriority
            ORDER BY revenue DESC, o_orderdate, l_orderkey
            LIMIT 10""")
  )

  // --------------------------------------------------------------- q134
  /** Percent-of-total reporting: each nation's share of its region's
    * revenue. Two stages: the star rollup aggregates to 25 rows FIRST,
    * then the share window runs over that tiny aggregate — the window
    * never sees fact-table rows, so partition-by-region is fine at any
    * scale (contrast q59's stratum-window caveat). The region total is a
    * decimal window sum over already-rounded doubles, so the share
    * division has bit-identical operands in both engines.
    */
  val q134 = QuerySpec(
    "q134_revenue_share",
    (s, d) => {
      val li = Tables.lineitem(s, d)
      val ord = Tables.orders(s, d)
      val cust = Tables.customer(s, d)
      val nat = Tables.nation(s, d)
      val reg = Tables.region(s, d)
      val byNation = li.join(ord, col("l_orderkey") === col("o_orderkey"))
        .join(cust, col("o_custkey") === col("c_custkey"))
        .join(nat, col("c_nationkey") === col("n_nationkey"))
        .join(reg, col("n_regionkey") === col("r_regionkey"))
        .groupBy("r_name", "n_name")
        .agg(drevSum.as("revenue"))
      val w = Window.partitionBy("r_name")
      byNation
        .withColumn("region_total", dsumOver(col("revenue"), w))
        .withColumn("share", ffloor(col("revenue") / col("region_total"), 6))
        .select("r_name", "n_name", "revenue", "region_total", "share")
        .orderBy("r_name", "n_name")
    },
    Some(s"""WITH bn AS (
              SELECT r_name, n_name, $drevSumSql AS revenue
              FROM lineitem
              JOIN orders   ON l_orderkey = o_orderkey
              JOIN customer ON o_custkey = c_custkey
              JOIN nation   ON c_nationkey = n_nationkey
              JOIN region   ON n_regionkey = r_regionkey
              GROUP BY r_name, n_name)
            SELECT r_name, n_name, revenue,
              CAST(ROUND(SUM(CAST(revenue AS DECIMAL(30,10)))
                OVER (PARTITION BY r_name), 2) AS DOUBLE) AS region_total,
              CAST(FLOOR(revenue / (CAST(ROUND(SUM(CAST(revenue AS DECIMAL(30,10)))
                OVER (PARTITION BY r_name), 2) AS DOUBLE)) * 1000000.0) AS DOUBLE)
                / 1000000.0 AS share
            FROM bn ORDER BY r_name, n_name""")
  )

  // --------------------------------------------------------------- q135
  /** SCD2 history build from a change log: each user's event stream
    * becomes validity intervals [valid_from, valid_to) with an is_current
    * flag — the slowly-changing-dimension type-2 load every warehouse
    * runs on ingest. One window shuffle keyed on user_id (the natural
    * change-log key; bounded per-key rows), then pure projection. The
    * user_id filter keeps the oracled output small; the plan is identical
    * without it.
    */
  val q135 = QuerySpec(
    "q135_scd2_history",
    (s, d) => {
      val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
      Tables.events(s, d)
        .filter(col("user_id") % 50 === 0)
        .select(
          col("user_id"), col("event_type").as("state"),
          col("ts").as("valid_from"),
          lead(col("ts"), 1).over(w).as("valid_to"),
          lead(col("ts"), 1).over(w).isNull.as("is_current"))
        // valid_to as the final key makes the sort UNIQUE (two events with
        // equal (user_id, ts, event_type) still differ in their lead), so
        // row order — and the order-sensitive hash gate — is engine-stable.
        // NULLS FIRST is Spark's ASC default but NOT DuckDB's — both spelled
        // explicitly so the open-ended current row sorts identically.
        .orderBy(col("user_id"), col("valid_from"),
          col("state"), col("valid_to").asc_nulls_first)
    },
    Some("""SELECT user_id, event_type AS state,
              CAST(ts AS TIMESTAMP) AS valid_from,
              LEAD(CAST(ts AS TIMESTAMP), 1) OVER w AS valid_to,
              LEAD(CAST(ts AS TIMESTAMP), 1) OVER w IS NULL AS is_current
            FROM events
            WHERE user_id % 50 = 0
            WINDOW w AS (PARTITION BY user_id ORDER BY CAST(ts AS TIMESTAMP), event_id)
            ORDER BY user_id, valid_from, state, valid_to NULLS FIRST""")
  )

  // --------------------------------------------------------------- q138
  /** Event-rate anomaly scoring: per event type, minute-bucket counts
    * z-scored against the trailing 30 full buckets. The aggregate
    * reduces the stream to (type, minute) rows BEFORE any window — the
    * window operates on the bucket series (≤ minutes-in-retention rows
    * per type), never raw events. All moments are exact integer sums
    * over the frame (sum, sum of squares, n); the mean/variance/z chain
    * is a fixed IEEE op sequence on those integers, so the truncated z
    * is bit-deterministic. Variance is clamped at 0 (catastrophic
    * cancellation can land at −ε) and a zero std yields NULL z via
    * nullif, dropped by the |z| filter.
    */
  val q138 = QuerySpec(
    "q138_event_rate_anomaly",
    (s, d) => {
      val perMin = Tables.events(s, d)
        .groupBy(col("event_type"), date_trunc("minute", col("ts")).as("minute"))
        .agg(count(lit(1)).as("cnt"))
      val w = Window.partitionBy("event_type").orderBy("minute")
        .rowsBetween(-30, -1)
      val mean = col("s").cast("double") / col("n")
      val variance = greatest(
        col("sq").cast("double") / col("n") - mean * mean, lit(0.0))
      perMin
        .withColumn("s", sum(col("cnt")).over(w))
        .withColumn("sq", sum(col("cnt") * col("cnt")).over(w))
        .withColumn("n", count(lit(1)).over(w))
        .filter(col("n") === 30)
        .withColumn("z", ffloor(
          (col("cnt") - mean) / nullif(sqrt(variance), lit(0.0)), 4))
        .filter(abs(col("z")) >= 2.0)
        .select("event_type", "minute", "cnt", "z")
        .orderBy("event_type", "minute")
    },
    Some("""WITH pm AS (
              SELECT event_type,
                date_trunc('minute', CAST(ts AS TIMESTAMP)) AS minute,
                COUNT(*) AS cnt
              FROM events GROUP BY 1, 2),
            fr AS (
              SELECT event_type, minute, cnt,
                SUM(cnt) OVER w AS s,
                SUM(cnt * cnt) OVER w AS sq,
                COUNT(*) OVER w AS n
              FROM pm
              WINDOW w AS (PARTITION BY event_type ORDER BY minute
                           ROWS BETWEEN 30 PRECEDING AND 1 PRECEDING)),
            z AS (
              SELECT event_type, minute, cnt,
                CAST(FLOOR((cnt - CAST(s AS DOUBLE) / n) /
                  NULLIF(sqrt(GREATEST(CAST(sq AS DOUBLE) / n
                    - (CAST(s AS DOUBLE) / n) * (CAST(s AS DOUBLE) / n), 0.0)), 0.0)
                  * 10000.0) AS DOUBLE) / 10000.0 AS z
              FROM fr WHERE n = 30)
            SELECT event_type, minute, cnt, z FROM z
            WHERE abs(z) >= 2.0
            ORDER BY event_type, minute""")
  )

  // --------------------------------------------------------------- q143
  /** Last-touch attribution: each purchase is attributed to the user's
    * most recent click within the preceding 7 days — the canonical
    * marketing-attribution join. Implemented as ONE pass over the
    * per-user event stream: `last(click_ts, ignoreNulls)` over an
    * unbounded-preceding frame carries the latest click forward, so no
    * self-join and no per-purchase scan — the shuffle is the single
    * user_id window (bounded per-key rows), the exact shape an as-of
    * join compiles to when the right side is the same stream. Daily
    * rollup of attach rate on top.
    */
  val q143 = QuerySpec(
    "q143_last_touch_attribution",
    (s, d) => {
      val w = Window.partitionBy("user_id")
        .orderBy(col("ts"), col("event_id"))
        .rowsBetween(Window.unboundedPreceding, -1)
      val sevenDaysUs = 7L * 86400L * 1000000L
      Tables.events(s, d)
        .withColumn("last_click",
          last(when(col("event_type") === "click", col("ts")), ignoreNulls = true)
            .over(w))
        .filter(col("event_type") === "purchase")
        .withColumn("attributed",
          col("last_click").isNotNull &&
            unix_micros(col("ts")) - unix_micros(col("last_click")) <= sevenDaysUs)
        .groupBy(date_trunc("day", col("ts")).as("day"))
        .agg(count(lit(1)).as("n_purchases"),
          count(when(col("attributed"), lit(1))).as("n_attributed"))
        .withColumn("attach_rate",
          ffloor(col("n_attributed").cast("double") / col("n_purchases"), 4))
        .orderBy("day")
    },
    Some("""WITH ev AS (
              SELECT user_id, event_id, event_type, CAST(ts AS TIMESTAMP) AS ts
              FROM events),
            lc AS (
              SELECT *, LAST_VALUE(CASE WHEN event_type = 'click' THEN ts END IGNORE NULLS)
                OVER (PARTITION BY user_id ORDER BY ts, event_id
                      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS last_click
              FROM ev),
            pur AS (
              SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS day,
                last_click IS NOT NULL AND
                  epoch_us(ts) - epoch_us(last_click) <= CAST(604800000000 AS BIGINT) AS attributed
              FROM lc WHERE event_type = 'purchase')
            SELECT day, COUNT(*) AS n_purchases,
              COUNT(CASE WHEN attributed THEN 1 END) AS n_attributed,
              CAST(FLOOR(CAST(COUNT(CASE WHEN attributed THEN 1 END) AS DOUBLE)
                / COUNT(*) * 10000.0) AS DOUBLE) / 10000.0 AS attach_rate
            FROM pur GROUP BY day ORDER BY day""")
  )

  // --------------------------------------------------------------- q150
  /** Recency-weighted scoring: per event type, total value and its
    * exponentially time-decayed sum (30-day half-life scale, anchored at
    * the corpus's own max timestamp so the query is re-runnable) — the
    * "what has this source/type done for me LATELY" metric feeding
    * freshness-aware mixing and trending dashboards. Determinism: the
    * decay weight is truncated to integer micro-units PER ROW (exp()
    * sits behind a floor, q93's contract), the value is exact cents, and
    * their product is a LONG — the per-type sum is order-free integer
    * arithmetic. Cents·micro products bound: |value| < 2^33 cents and
    * weight ≤ 1e6 keep the per-row product under 2^53; the LONG sum
    * holds ~2^63/(v·1e8) rows per type — at larger scales drop weight
    * precision to 1e4 (documented, not silently lossy).
    */
  val q150 = QuerySpec(
    "q150_time_decay_score",
    (s, d) => {
      val ev = Tables.events(s, d)
      val anchor = ev.agg(max(unix_micros(col("ts"))).as("t_max"))
      val scaleUs = lit(30.0 * 86400.0 * 1000000.0)
      val wMicro = floor(
        exp(-((col("t_max") - unix_micros(col("ts"))).cast("double") / scaleUs))
          * lit(1e6)).cast("long")
      val cents = floor(col("value") * lit(100.0)).cast("long")
      ev.crossJoin(broadcast(anchor))
        .select(col("event_type"), col("value"),
          (cents * wMicro).as("contrib"))
        .groupBy("event_type")
        .agg(count(lit(1)).as("n_events"),
          dsum(col("value")).as("sum_value"),
          ffloor(sum(col("contrib")).cast("double") / lit(1e6) / lit(100.0), 4)
            .as("decayed_value"))
        .orderBy("event_type")
    },
    Some("""WITH anchor AS (
              SELECT MAX(epoch_us(CAST(ts AS TIMESTAMP))) AS t_max FROM events),
            w AS (
              SELECT event_type, value,
                CAST(FLOOR(value * 100.0) AS BIGINT) *
                CAST(FLOOR(exp(-(CAST(t_max - epoch_us(CAST(ts AS TIMESTAMP)) AS DOUBLE)
                  / (30.0 * 86400.0 * 1000000.0))) * 1000000.0) AS BIGINT) AS contrib
              FROM events CROSS JOIN anchor)
            SELECT event_type, COUNT(*) AS n_events,
              CAST(ROUND(SUM(CAST(value AS DECIMAL(30,10))), 2) AS DOUBLE) AS sum_value,
              CAST(FLOOR(CAST(SUM(contrib) AS DOUBLE) / 1000000.0 / 100.0
                * 10000.0) AS DOUBLE) / 10000.0 AS decayed_value
            FROM w GROUP BY event_type ORDER BY event_type""")
  )

  // --------------------------------------------------------------- q151
  /** Referential-integrity audit: orphan counts across every fact→dim
    * edge of the schema — the data-quality gate a lakehouse runs after
    * each load (a non-zero row here means a broken ingest). Each edge is
    * one left-anti join against its dimension's key set (dims broadcast;
    * the fact scan reads ONLY the key column — column pruning makes this
    * audit cheap even at 100 TB). Clean data returns all-zero orphan
    * rows by design; WarehouseSpec plants orphans to prove detection.
    */
  val q151 = QuerySpec(
    "q151_referential_audit",
    (s, d) => {
      def edge(name: String, fact: DataFrame, fk: String,
               dim: DataFrame, pk: String): DataFrame = {
        val keys = fact.select(col(fk))
        keys.agg(count(lit(1)).as("n_rows"))
          .crossJoin(
            keys.join(dim.select(col(pk)), col(fk) === col(pk),
                "left_anti")
              .agg(count(lit(1)).as("n_orphans")))
          .select(lit(name).as("edge"), col("n_rows"), col("n_orphans"),
            ffloor(col("n_orphans").cast("double") / col("n_rows"), 6)
              .as("orphan_rate"))
      }
      val li = Tables.lineitem(s, d)
      edge("lineitem.orderkey", li, "l_orderkey", Tables.orders(s, d), "o_orderkey")
        .unionAll(edge("lineitem.partkey", li, "l_partkey", Tables.part(s, d), "p_partkey"))
        .unionAll(edge("lineitem.suppkey", li, "l_suppkey", Tables.supplier(s, d), "s_suppkey"))
        .unionAll(edge("orders.custkey", Tables.orders(s, d), "o_custkey",
          Tables.customer(s, d), "c_custkey"))
        .orderBy("edge")
    },
    Some("""WITH e1 AS (
              SELECT 'lineitem.orderkey' AS edge, COUNT(*) AS n_rows,
                COUNT(CASE WHEN NOT EXISTS (SELECT 1 FROM orders
                  WHERE o_orderkey = l_orderkey) THEN 1 END) AS n_orphans
              FROM lineitem),
            e2 AS (
              SELECT 'lineitem.partkey', COUNT(*),
                COUNT(CASE WHEN NOT EXISTS (SELECT 1 FROM part
                  WHERE p_partkey = l_partkey) THEN 1 END)
              FROM lineitem),
            e3 AS (
              SELECT 'lineitem.suppkey', COUNT(*),
                COUNT(CASE WHEN NOT EXISTS (SELECT 1 FROM supplier
                  WHERE s_suppkey = l_suppkey) THEN 1 END)
              FROM lineitem),
            e4 AS (
              SELECT 'orders.custkey', COUNT(*),
                COUNT(CASE WHEN NOT EXISTS (SELECT 1 FROM customer
                  WHERE c_custkey = o_custkey) THEN 1 END)
              FROM orders),
            u AS (SELECT * FROM e1 UNION ALL SELECT * FROM e2
                  UNION ALL SELECT * FROM e3 UNION ALL SELECT * FROM e4)
            SELECT edge, n_rows, n_orphans,
              CAST(FLOOR(CAST(n_orphans AS DOUBLE) / n_rows * 1000000.0) AS DOUBLE)
                / 1000000.0 AS orphan_rate
            FROM u ORDER BY edge""")
  )

  // --------------------------------------------------------------- q152
  /** Deletion-propagation manifest (right-to-be-forgotten planning): for
    * a deletion list of customer keys, count the rows each table must
    * drop — including the TWO-HOP cascade lineitem←orders←customer — and
    * the fraction of each table affected. The manifest is what a
    * compliance pipeline reviews before rewriting files. Every hop is a
    * LEFT-SEMI join (never materializing joined rows); the deletion set
    * broadcasts (deletion lists are small relative to the lake by
    * nature); fact scans read only their key columns.
    */
  val q152 = QuerySpec(
    "q152_deletion_manifest",
    (s, d) => {
      val delCust = Tables.customer(s, d)
        .filter(col("c_custkey") % 97 === 0).select("c_custkey")
      val delOrders = Tables.orders(s, d)
        .join(delCust, col("o_custkey") === col("c_custkey"),
          "left_semi")
      def entry(name: String, full: DataFrame, hit: DataFrame): DataFrame =
        full.agg(count(lit(1)).as("n_rows"))
          .crossJoin(hit.agg(count(lit(1)).as("n_delete")))
          .select(lit(name).as("table_name"), col("n_rows"), col("n_delete"),
            ffloor(col("n_delete").cast("double") / col("n_rows"), 6)
              .as("delete_frac"))
      entry("customer", Tables.customer(s, d),
          Tables.customer(s, d).join(delCust, Seq("c_custkey"), "left_semi"))
        .unionAll(entry("orders", Tables.orders(s, d), delOrders))
        .unionAll(entry("lineitem", Tables.lineitem(s, d),
          Tables.lineitem(s, d).join(delOrders.select("o_orderkey"),
            col("l_orderkey") === col("o_orderkey"), "left_semi")))
        .unionAll(entry("events", Tables.events(s, d),
          Tables.events(s, d).join(delCust,
            col("user_id") === col("c_custkey"), "left_semi")))
        .orderBy("table_name")
    },
    Some("""WITH del AS (SELECT c_custkey FROM customer WHERE c_custkey % 97 = 0),
            t AS (
              SELECT 'customer' AS table_name, COUNT(*) AS n_rows,
                COUNT(CASE WHEN EXISTS (SELECT 1 FROM del WHERE del.c_custkey = c.c_custkey)
                  THEN 1 END) AS n_delete
              FROM customer c
              UNION ALL
              SELECT 'orders', COUNT(*),
                COUNT(CASE WHEN EXISTS (SELECT 1 FROM del WHERE del.c_custkey = o_custkey)
                  THEN 1 END)
              FROM orders
              UNION ALL
              SELECT 'lineitem', COUNT(*),
                COUNT(CASE WHEN EXISTS (SELECT 1 FROM orders o JOIN del
                    ON o.o_custkey = del.c_custkey
                    WHERE o.o_orderkey = l_orderkey) THEN 1 END)
              FROM lineitem
              UNION ALL
              SELECT 'events', COUNT(*),
                COUNT(CASE WHEN EXISTS (SELECT 1 FROM del WHERE del.c_custkey = user_id)
                  THEN 1 END)
              FROM events)
            SELECT table_name, n_rows, n_delete,
              CAST(FLOOR(CAST(n_delete AS DOUBLE) / n_rows * 1000000.0) AS DOUBLE)
                / 1000000.0 AS delete_frac
            FROM t ORDER BY table_name""")
  )

  // --------------------------------------------------------------- q153
  /** Week-over-week change: per event type, weekly event counts and the
    * percent change vs the previous week — the trend table behind every
    * operations dashboard. Events reduce to (type, ISO week) counts
    * first (map-side combined); the lag window runs over the tiny weekly
    * series. First weeks emit NULL change (no fabricated zero).
    */
  val q153 = QuerySpec(
    "q153_wow_change",
    (s, d) => {
      val w = Window.partitionBy("event_type").orderBy("week")
      Tables.events(s, d)
        .groupBy(col("event_type"), date_trunc("week", col("ts")).as("week"))
        .agg(count(lit(1)).as("n"))
        .withColumn("prev", lag(col("n"), 1).over(w))
        .withColumn("wow_change",
          ffloor((col("n") - col("prev")).cast("double") / col("prev"), 4))
        .select("event_type", "week", "n", "wow_change")
        .orderBy("event_type", "week")
    },
    Some("""WITH wk AS (
              SELECT event_type,
                CAST(date_trunc('week', CAST(ts AS TIMESTAMP)) AS TIMESTAMP) AS week,
                COUNT(*) AS n
              FROM events GROUP BY 1, 2)
            SELECT event_type, week, n,
              CAST(FLOOR(CAST(n - LAG(n, 1) OVER w AS DOUBLE)
                / (LAG(n, 1) OVER w) * 10000.0) AS DOUBLE) / 10000.0 AS wow_change
            FROM wk
            WINDOW w AS (PARTITION BY event_type ORDER BY week)
            ORDER BY event_type, week""")
  )

  // --------------------------------------------------------------- q157
  /** Cumulative distinct active users by day — the "total users ever"
    * growth curve. Running COUNT(DISTINCT) is an anti-pattern (holds the
    * full distinct set per frame); the scale-correct form reduces each
    * user to ONE row at their FIRST day (keyed min aggregate), counts
    * first-appearances per day, and prefix-sums the tiny daily series —
    * the window sees days, never users.
    */
  val q157 = QuerySpec(
    "q157_cumulative_actives",
    (s, d) => {
      val firstDay = Tables.events(s, d)
        .groupBy("user_id")
        .agg(min(date_trunc("day", col("ts"))).as("first_day"))
      val w = Window.orderBy("day")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      firstDay.groupBy(col("first_day").as("day"))
        .agg(count(lit(1)).as("new_users"))
        .withColumn("cumulative_users", sum(col("new_users")).over(w))
        .orderBy("day")
    },
    Some("""WITH fd AS (
              SELECT user_id,
                MIN(CAST(date_trunc('day', CAST(ts AS TIMESTAMP)) AS TIMESTAMP)) AS first_day
              FROM events GROUP BY user_id),
            daily AS (
              SELECT first_day AS day, COUNT(*) AS new_users
              FROM fd GROUP BY 1)
            SELECT day, new_users,
              CAST(SUM(new_users) OVER (ORDER BY day
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
                AS cumulative_users
            FROM daily ORDER BY day""")
  )

  // --------------------------------------------------------------- q213
  /** Generic per-column table profile of `orders` — the data-quality
    * card every warehouse publishes per table: row count, null count,
    * exact distinct count, and min/max per column. The q66 idea (corpus
    * profile) applied to an arbitrary relational table.
    *
    * Plan shape — one aggregate PER COLUMN over a column-PRUNED scan,
    * unioned: six narrow parquet reads whose total I/O equals ONE
    * full-width scan (columnar at rest), each internally parallel, and
    * none of them pays the q36 anti-pattern (a single pass computing six
    * `countDistinct`s would Expand the corpus 6x before the shuffle).
    * Values are rendered engine-portably: integers/strings verbatim,
    * timestamps as epoch-micros strings, doubles via plain-notation cast
    * (price domain < 1e7 — the q161 guard; Spark renders larger doubles
    * in scientific notation, DuckDB never does).
    */
  val q213 = QuerySpec(
    "q213_table_profile",
    (s, d) => {
      val t = Tables.orders(s, d)
      def prof(cn: String, v: Column): DataFrame =
        t.select(col(cn)).agg(
          count(lit(1)).as("n_rows"),
          (count(lit(1)) - count(col(cn))).as("n_nulls"),
          countDistinct(col(cn)).as("n_distinct"),
          min(v).cast("string").as("vmin"),
          max(v).cast("string").as("vmax"))
          .select(lit(cn).as("column_name"), col("n_rows"), col("n_nulls"),
            col("n_distinct"), col("vmin"), col("vmax"))
      prof("o_orderkey", col("o_orderkey"))
        .unionByName(prof("o_custkey", col("o_custkey")))
        .unionByName(prof("o_orderstatus", col("o_orderstatus")))
        .unionByName(prof("o_totalprice", col("o_totalprice")))
        .unionByName(prof("o_orderdate", unix_micros(col("o_orderdate"))))
        .unionByName(prof("o_orderpriority", col("o_orderpriority")))
        .orderBy("column_name")
    },
    Some("""WITH p AS (
              SELECT 'o_orderkey' AS column_name, COUNT(*) AS n_rows,
                COUNT(*) - COUNT(o_orderkey) AS n_nulls,
                COUNT(DISTINCT o_orderkey) AS n_distinct,
                CAST(MIN(o_orderkey) AS VARCHAR) AS vmin,
                CAST(MAX(o_orderkey) AS VARCHAR) AS vmax
              FROM orders
            UNION ALL
              SELECT 'o_custkey', COUNT(*), COUNT(*) - COUNT(o_custkey),
                COUNT(DISTINCT o_custkey),
                CAST(MIN(o_custkey) AS VARCHAR), CAST(MAX(o_custkey) AS VARCHAR)
              FROM orders
            UNION ALL
              SELECT 'o_orderstatus', COUNT(*), COUNT(*) - COUNT(o_orderstatus),
                COUNT(DISTINCT o_orderstatus),
                MIN(o_orderstatus), MAX(o_orderstatus)
              FROM orders
            UNION ALL
              SELECT 'o_totalprice', COUNT(*), COUNT(*) - COUNT(o_totalprice),
                COUNT(DISTINCT o_totalprice),
                CAST(MIN(o_totalprice) AS VARCHAR),
                CAST(MAX(o_totalprice) AS VARCHAR)
              FROM orders
            UNION ALL
              SELECT 'o_orderdate', COUNT(*), COUNT(*) - COUNT(o_orderdate),
                COUNT(DISTINCT o_orderdate),
                CAST(MIN(epoch_us(CAST(o_orderdate AS TIMESTAMP))) AS VARCHAR),
                CAST(MAX(epoch_us(CAST(o_orderdate AS TIMESTAMP))) AS VARCHAR)
              FROM orders
            UNION ALL
              SELECT 'o_orderpriority', COUNT(*), COUNT(*) - COUNT(o_orderpriority),
                COUNT(DISTINCT o_orderpriority),
                MIN(o_orderpriority), MAX(o_orderpriority)
              FROM orders)
            SELECT * FROM p ORDER BY column_name""")
  )

  // --------------------------------------------------------------- q219
  /** SMALL-FILE COMPACTION PLAN — the relational form of the grouping
    * decision [[graft.sink.Compaction]] executes: given a landed-file
    * listing (here each order stands in as one landed file, its record
    * count the per-order lineitem count; a real lake feeds
    * [[graft.sources.LandedFiles]] metadata in), assign files to
    * compaction groups of ~target records, never splitting a file and
    * never reordering (offset order is the sink's D1 naming invariant —
    * the compacted file inherits the group's FIRST offset as its name).
    *
    * The rule is pure prefix arithmetic: group = ⌊cumulative-records-
    * before / target⌋ — a group closes once the running total crosses the
    * next target boundary, so overshoot is bounded by one file and, more
    * importantly, membership is a PURE FUNCTION of (partition, order,
    * sizes): re-running the planner after a crash reproduces the exact
    * same groups — the property that makes compaction idempotent (D3).
    * A state-machine next-fit (reset the accumulator per group) would
    * pack marginally tighter but is not expressible as one window pass
    * and loses nothing at scale: both close every group within one file
    * of the boundary.
    *
    * Scale shape: the input is file METADATA (one row per landed file —
    * a 100 TB lake has ~10⁶–10⁷ such rows, not 10¹²); one window keyed
    * by lake partition, one keyed aggregate. The order→count derivation
    * here is one fact-table aggregate standing in for the listing scan.
    */
  val q219 = QuerySpec(
    "q219_compaction_plan",
    (s, d) => {
      val target = 1000L
      val files = Tables.lineitem(s, d)
        .groupBy(col("l_orderkey").as("file_id"))
        .agg(count(lit(1)).as("n_records"))
        .join(Tables.orders(s, d).select(col("o_orderkey").as("file_id"),
          col("o_orderpriority").as("part_key")), "file_id")
      val w = Window.partitionBy("part_key").orderBy("file_id")
        .rowsBetween(Window.unboundedPreceding, -1)
      files
        .withColumn("cum_before", coalesce(sum("n_records").over(w), lit(0L)))
        .withColumn("grp", expr(s"cum_before div $target"))
        .groupBy("part_key", "grp")
        .agg(count(lit(1)).as("n_files"),
          sum("n_records").cast("long").as("n_records"),
          min("file_id").as("first_file"),
          max("file_id").as("last_file"))
        .orderBy("part_key", "grp")
    },
    Some("""WITH files AS (
              SELECT l_orderkey AS file_id,
                CAST(COUNT(*) AS BIGINT) AS n_records
              FROM lineitem GROUP BY 1),
            listed AS (
              SELECT o.o_orderpriority AS part_key, f.file_id, f.n_records
              FROM files f JOIN orders o ON f.file_id = o.o_orderkey),
            planned AS (
              SELECT part_key, file_id, n_records,
                COALESCE(CAST(SUM(n_records) OVER (
                  PARTITION BY part_key ORDER BY file_id
                  ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
                  AS BIGINT), 0) // 1000 AS grp
              FROM listed)
            SELECT part_key, grp,
              CAST(COUNT(*) AS BIGINT) AS n_files,
              CAST(SUM(n_records) AS BIGINT) AS n_records,
              MIN(file_id) AS first_file, MAX(file_id) AS last_file
            FROM planned GROUP BY 1, 2 ORDER BY 1, 2""")
  )

  val all: Seq[QuerySpec] = Seq(q132, q133, q134, q135, q138, q143, q150, q151,
    q152, q153, q157, q213, q219)
}
