package graft.operators

import graft.{QuerySpec, Tables}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{DataFrame, SparkSession}

import Ops._

/** Advanced relational operators beyond the core §2.8 inventory: as-of
  * join, cube, approximate-distinct sketches, and sessionization.
  */
object Advanced {

  // ---------------------------------------------------------------- q34
  /** As-of join: for each purchase event, the value of that user's most
    * recent click at-or-before the purchase timestamp.
    *
    * Spark lacks a native ASOF JOIN (DuckDB's is the oracle). Instead of a
    * range join (quadratic within key), this uses the union + ordered
    * carry-forward trick: tag both sides, sort by (ts, side) within each
    * user, and carry the last non-null right value forward with
    * `last(ignoreNulls)` over a running frame. ONE shuffle on user_id,
    * linear work — the scale-correct plan for 100 TB event streams.
    * The right side is pre-deduped per (user, ts) so ties are
    * deterministic; right sorts before left at equal ts → inclusive (>=)
    * as-of semantics, matching DuckDB.
    */
  val q34 = QuerySpec(
    "q34_asof_join",
    (s, d) => {
      val e = Tables.events(s, d)
      val purchases = e.filter(col("event_type") === "purchase")
        .select(col("user_id"), col("ts"), lit(1).as("is_left"),
          col("event_id"), lit(null).cast("double").as("click_value"))
      val clicks = e.filter(col("event_type") === "click")
        .groupBy("user_id", "ts").agg(max("value").as("click_value"))
        .select(col("user_id"), col("ts"), lit(0).as("is_left"),
          lit(null).cast("long").as("event_id"), col("click_value"))
      val w = Window.partitionBy("user_id").orderBy(col("ts"), col("is_left"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      purchases.unionByName(clicks)
        .withColumn("asof_value", last(col("click_value"), ignoreNulls = true).over(w))
        .filter(col("is_left") === 1)
        .select(col("event_id"), col("user_id"), col("asof_value"))
        .orderBy("event_id")
    },
    Some("""WITH e AS (SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ts,
                              event_type, value FROM events),
            p AS (SELECT event_id, user_id, ts FROM e WHERE event_type = 'purchase'),
            c AS (SELECT user_id, ts, MAX(value) AS click_value
                  FROM e WHERE event_type = 'click' GROUP BY 1, 2)
            SELECT p.event_id, p.user_id, c.click_value AS asof_value
            FROM p ASOF LEFT JOIN c
              ON p.user_id = c.user_id AND p.ts >= c.ts
            ORDER BY p.event_id""")
  )

  // ---------------------------------------------------------------- q35
  /** CUBE over (returnflag, linestatus) with grouping flags — the full
    * grouping-sets lattice (q12 covers ROLLUP).
    */
  val q35 = QuerySpec(
    "q35_cube_grouping",
    (s, d) =>
      // fanOut: CUBE expands every row ×4 before the partial aggregate;
      // on a single-split scan that whole expansion runs on one core
      fanOut(Tables.lineitem(s, d))
        .cube(col("l_returnflag"), col("l_linestatus"))
        .agg(
          grouping(col("l_returnflag")).cast("int").as("g_flag"),
          grouping(col("l_linestatus")).cast("int").as("g_status"),
          dsum(col("l_extendedprice")).as("sum_price"),
          count(lit(1)).as("cnt"))
        .orderBy(
          col("g_flag"), col("g_status"),
          col("l_returnflag").asc_nulls_first,
          col("l_linestatus").asc_nulls_first),
    Some("""SELECT l_returnflag, l_linestatus,
              CAST(GROUPING(l_returnflag) AS INTEGER) AS g_flag,
              CAST(GROUPING(l_linestatus) AS INTEGER) AS g_status,
              CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(30,10))), 2) AS DOUBLE) AS sum_price,
              COUNT(*) AS cnt
            FROM lineitem GROUP BY CUBE(l_returnflag, l_linestatus)
            ORDER BY g_flag, g_status,
              l_returnflag NULLS FIRST, l_linestatus NULLS FIRST""")
  )

  // ---------------------------------------------------------------- q36
  /** HLL++ approximate distinct counts next to the exact answer. Engine
    * sketches differ across systems, so no SQL oracle (rows-only check);
    * the ScalaTest asserts <5% relative error vs exact. The sketch
    * matters at 100 TB: approx_count_distinct is a fixed-size mergeable
    * aggregate (no distinct shuffle of the key universe).
    *
    * Plan shape: `agg(approx_count_distinct, countDistinct, count)` in one
    * step makes Catalyst plan the mixed distinct/non-distinct aggregate
    * via Expand — every input row duplicated per aggregate group before
    * the shuffle (the round-2 bench flagged exactly this). Pre-aggregating
    * on (status, custkey) first removes the Expand: HLL is duplicate-
    * insensitive (identical estimate over pre-deduped keys), the exact
    * distinct becomes a plain count, and the total comes from summing the
    * per-key counts — two keyed shuffles of |distinct keys| rows instead
    * of one shuffle of 2× all rows.
    */
  val q36 = QuerySpec(
    "q36_approx_distinct",
    (s, d) =>
      // fanOut: the HLL partial-update loop is the CPU cost here; give it
      // session width when the scan is a single split
      fanOut(Tables.orders(s, d))
        .groupBy("o_orderstatus", "o_custkey")
        .agg(count(lit(1)).as("__per_key"))
        .groupBy("o_orderstatus")
        .agg(
          approx_count_distinct(col("o_custkey"), 0.02).as("approx_cust"),
          // count(o_custkey), not count(1): countDistinct ignored NULLs, so
          // the pre-grouped rewrite must skip the NULL-key group too —
          // count(1) would silently count it as one distinct customer
          count(col("o_custkey")).as("exact_cust"),
          sum("__per_key").cast("long").as("n"))
        // In-query exact-vs-sketch audit (q149's pattern): the estimate
        // itself is engine-specific (rows-only), but the ≤5% error bound
        // is an invariant — carried here as a column fuzz must keep TRUE,
        // and hash-enforced by the oracled twin q246. An all-NULL key
        // group has exact 0 and HLL 0: equality, not a ratio, is the
        // vacuous-case contract.
        .withColumn("err_ok",
          when(col("exact_cust") === 0L, col("approx_cust") === 0L)
            .otherwise(
              abs(col("approx_cust").cast("double") / col("exact_cust") - 1.0) <= 0.05))
        .orderBy("o_orderstatus"),
    None
  )

  // ---------------------------------------------------------------- q246
  /** Driver-enforced twin of q36's HLL audit: the same pre-grouped plan,
    * but the output carries only the ANSI-reproducible side — exact
    * distinct, group size, and the `err_ok` bound verdict — so DuckDB
    * recomputes every column and pins err_ok TRUE. The estimate column
    * stays in q36 (rows-only by nature: HLL++ register layouts are
    * engine-specific); what becomes hash-enforced here is the CONTRACT
    * that the sketch tracks the exact count within 5% relative error. A
    * broken rsd mapping, a lost partial merge, or the round-2 Expand
    * regression each break this row.
    */
  val q246 = QuerySpec(
    "q246_hll_error_audit",
    (s, d) =>
      fanOut(Tables.orders(s, d))
        .groupBy("o_orderstatus", "o_custkey")
        .agg(count(lit(1)).as("__per_key"))
        .groupBy("o_orderstatus")
        .agg(
          approx_count_distinct(col("o_custkey"), 0.02).as("__approx"),
          count(col("o_custkey")).as("exact_cust"),
          sum("__per_key").cast("long").as("n"))
        .select(col("o_orderstatus"), col("exact_cust"), col("n"),
          when(col("exact_cust") === 0L, col("__approx") === 0L)
            .otherwise(
              abs(col("__approx").cast("double") / col("exact_cust") - 1.0) <= 0.05)
            .as("err_ok"))
        .orderBy("o_orderstatus"),
    Some("""SELECT o_orderstatus,
              COUNT(DISTINCT o_custkey) AS exact_cust,
              COUNT(*) AS n,
              true AS err_ok
            FROM orders GROUP BY 1 ORDER BY 1""")
  )

  // ---------------------------------------------------------------- q37
  /** Sessionization: batch `session_window` (4h gap) per user — Spark's
    * native session operator; the oracle reproduces it with the
    * gaps-and-islands idiom (lag → new-session flag → running sum → island
    * id). Both close a session when the next event is ≥ gap after the
    * previous event.
    */
  val q37 = QuerySpec(
    "q37_sessionization",
    (s, d) =>
      Tables.events(s, d)
        .groupBy(session_window(col("ts"), "4 hours"), col("user_id"))
        .agg(count(lit(1)).as("n_events"), dsum(col("value")).as("sum_value"))
        .select(
          col("user_id"),
          unix_micros(col("session_window.start")).as("session_start_us"),
          col("n_events"), col("sum_value"))
        .orderBy("user_id", "session_start_us"),
    Some("""WITH e AS (SELECT user_id, CAST(ts AS TIMESTAMP) AS ts, value FROM events),
            g AS (SELECT user_id, ts, value,
                    CASE WHEN LAG(ts) OVER w IS NULL THEN 1
                         WHEN ts >= LAG(ts) OVER w + INTERVAL 4 HOUR THEN 1
                         ELSE 0 END AS new_s
                  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts)),
            i AS (SELECT user_id, ts, value,
                    SUM(new_s) OVER (PARTITION BY user_id ORDER BY ts
                      ROWS UNBOUNDED PRECEDING) AS sid
                  FROM g)
            SELECT user_id, epoch_us(MIN(ts)) AS session_start_us,
              COUNT(*) AS n_events,
              CAST(ROUND(SUM(CAST(value AS DECIMAL(30,10))), 2) AS DOUBLE) AS sum_value
            FROM i GROUP BY user_id, sid
            ORDER BY user_id, session_start_us""")
  )

  // ---------------------------------------------------------------- q39
  /** Pivot: order counts + price sums per priority, one column per status.
    * Spark's `pivot` with an explicit value list compiles to the same
    * conditional-aggregation shape as the oracle's CASE columns — no extra
    * pass to discover pivot values (which at scale would be a full scan).
    */
  val q39 = QuerySpec(
    "q39_pivot",
    (s, d) =>
      Tables.orders(s, d)
        .groupBy("o_orderpriority")
        .pivot("o_orderstatus", Seq("F", "O", "P"))
        .agg(count(lit(1)))
        .na.fill(0L)
        .orderBy("o_orderpriority"),
    Some("""SELECT o_orderpriority,
              COUNT(CASE WHEN o_orderstatus = 'F' THEN 1 END) AS "F",
              COUNT(CASE WHEN o_orderstatus = 'O' THEN 1 END) AS "O",
              COUNT(CASE WHEN o_orderstatus = 'P' THEN 1 END) AS "P"
            FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority""")
  )

  // ---------------------------------------------------------------- q40
  /** JSON scalar functions over the `events.props` JSON column:
    * path extraction + typed cast, aggregated. Spark `get_json_object` /
    * DuckDB `json_extract` — both RFC-style `$.k` paths.
    */
  val q40 = QuerySpec(
    "q40_json_funcs",
    (s, d) =>
      // fanOut: per-row JSON parsing is ~µs-scale CPU work; single-split
      // scans would serialize it on one core
      fanOut(Tables.events(s, d))
        .select(
          get_json_object(col("props"), "$.k").cast("long").as("k"),
          col("value"))
        .groupBy((col("k") % 10).as("k_mod"))
        .agg(count(lit(1)).as("n"), dsum(col("value")).as("sum_value"),
          min(col("k")).as("min_k"), max(col("k")).as("max_k"))
        .orderBy(col("k_mod").asc_nulls_first),
    Some("""SELECT CAST(json_extract_string(props, '$.k') AS BIGINT) % 10 AS k_mod,
              COUNT(*) AS n,
              CAST(ROUND(SUM(CAST(value AS DECIMAL(30,10))), 2) AS DOUBLE) AS sum_value,
              MIN(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS min_k,
              MAX(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS max_k
            FROM events GROUP BY 1 ORDER BY k_mod NULLS FIRST""")
  )

  // ---------------------------------------------------------------- q41
  /** Correlated scalar subquery through the `spark.sql` entry path:
    * orders priced > 1.5× their customer's (exact-decimal) average.
    * Catalyst decorrelates this into an aggregate + join — same plan the
    * DataFrame formulation would produce, demonstrating the SQL surface.
    */
  val q41 = QuerySpec(
    "q41_scalar_subquery",
    (s, d) => {
      Tables.orders(s, d).createOrReplaceTempView("graft_orders")
      s.sql("""
        SELECT o_orderkey, o_custkey, o_totalprice
        FROM graft_orders o
        WHERE o_totalprice > 1.5 * (
          SELECT CAST(SUM(CAST(i.o_totalprice AS DECIMAL(30,10))) AS DOUBLE) / COUNT(*)
          FROM graft_orders i WHERE i.o_custkey = o.o_custkey)
        ORDER BY o_orderkey""")
    },
    Some("""SELECT o_orderkey, o_custkey, o_totalprice
            FROM orders o
            WHERE o_totalprice > 1.5 * (
              SELECT CAST(SUM(CAST(i.o_totalprice AS DECIMAL(30,10))) AS DOUBLE) / COUNT(*)
              FROM orders i WHERE i.o_custkey = o.o_custkey)
            ORDER BY o_orderkey""")
  )

  // ---------------------------------------------------------------- q81
  /** q81: out-of-order-arrival audit — per event type, how many events
    * arrive with a timestamp BEHIND the max already seen on their source
    * shard, and by how much at worst. This is the measurement that SIZES
    * a streaming watermark (`withWatermark(delay)` must absorb the
    * observed lateness; the parity pipeline's event-time rotation has the
    * same exposure): run it on a landed sample, set delay ≥ the observed
    * bound.
    *
    * Arrival order is `event_id` (the ingest sequence); the disorder
    * window partitions by (event_type, user_id % 16) — the SOURCE-SHARD
    * grain, matching how a real stream is per-partition-ordered, and
    * bounding every window at a shard of a type (q64's shard idiom, not
    * q59's whole-stratum sort).
    *
    * The generator's events are ts-ordered (audit would be vacuously
    * zero), so lateness is PLANTED deterministically — every 97th event's
    * timestamp is pulled back 24 hours ("arrived late" — the pull must
    * exceed the ~6 h inter-event gap within a shard to register) — and the oracle
    * plants the same: the hash match proves the audit measures disorder,
    * not that it prints zeros (q63/q65's synth→measure pattern).
    */
  val q81 = QuerySpec(
    "q81_event_disorder_audit",
    (s, d) => {
      val e = Tables.events(s, d)
        .select(col("event_id"), col("event_type"),
          (col("user_id") % 16).as("shard"),
          when(col("event_id") % 97 === 0,
            col("ts") - expr("INTERVAL 24 HOURS"))
            .otherwise(col("ts")).as("ts"))
      val w = Window.partitionBy("event_type", "shard").orderBy("event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
      e.withColumn("prior_max", max("ts").over(w))
        .withColumn("late_us",
          when(col("ts") < col("prior_max"),
            unix_micros(col("prior_max")) - unix_micros(col("ts"))))
        .groupBy("event_type")
        .agg(
          count(lit(1)).as("n_events"),
          count(col("late_us")).as("n_late"),
          coalesce(max("late_us"), lit(0L)).as("max_late_us"))
        .orderBy("event_type")
    },
    Some("""WITH e AS (
              SELECT event_id, event_type, user_id % 16 AS shard,
                CASE WHEN event_id % 97 = 0
                     THEN CAST(ts AS TIMESTAMP) - INTERVAL 24 HOUR
                     ELSE CAST(ts AS TIMESTAMP) END AS ts
              FROM events),
            m AS (
              SELECT event_type, ts,
                MAX(ts) OVER (PARTITION BY event_type, shard ORDER BY event_id
                  ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS prior_max
              FROM e)
            SELECT event_type, COUNT(*) AS n_events,
              COUNT(CASE WHEN ts < prior_max THEN 1 END) AS n_late,
              COALESCE(MAX(CASE WHEN ts < prior_max
                THEN epoch_us(prior_max) - epoch_us(ts) END), 0) AS max_late_us
            FROM m GROUP BY event_type ORDER BY event_type""")
  )

  // --------------------------------------------------------------- q114
  /** Ordered conversion funnel — the staple event-analytics query: of the
    * users who VIEWed, how many went on to CLICK after that view, and
    * then PURCHASE after that click, with the mean seconds between
    * reached steps. Step semantics are strict ordering (each step's
    * timestamp must EXCEED the previous step's first-reach time), which
    * is what separates a funnel from three independent counts.
    *
    * Plan shape: one keyed aggregate per step over the (events ⋈
    * prior-step) join — user_id-keyed shuffles only, no windows, no
    * per-user sort. Mean seconds are computed from an INTEGER micro sum
    * (ffloor'd once at output), not an avg of doubles — summation-order-
    * free across engines and layouts.
    */
  val q114 = QuerySpec(
    "q114_event_funnel",
    (s, d) => {
      val e = Tables.events(s, d).select(col("user_id"), col("event_type"), col("ts"))
      val s1 = e.filter(col("event_type") === "view")
        .groupBy("user_id").agg(min("ts").as("t1"))
      val s2 = e.filter(col("event_type") === "click")
        .join(s1, "user_id").filter(col("ts") > col("t1"))
        .groupBy("user_id").agg(min("ts").as("t2"), max("t1").as("t1"))
      val s3 = e.filter(col("event_type") === "purchase")
        .join(s2.select("user_id", "t2"), "user_id").filter(col("ts") > col("t2"))
        .groupBy("user_id").agg(min("ts").as("t3"), max("t2").as("t2"))
      def report(step: Int, name: String, df: DataFrame,
                 from: Option[(String, String)]): DataFrame = {
        val base = from match {
          case Some((a, b)) => df.agg(
            count(lit(1)).as("n_users"),
            sum(unix_micros(col(b)) - unix_micros(col(a))).cast("long").as("__tot"))
            .select(col("n_users"),
              ffloor(col("__tot").cast("double") / lit(1e6) /
                col("n_users").cast("double"), 2).as("avg_secs_from_prev"))
          case None => df.agg(count(lit(1)).as("n_users"))
            .select(col("n_users"), lit(null).cast("double").as("avg_secs_from_prev"))
        }
        base.select(lit(step).as("step"), lit(name).as("event"),
          col("n_users"), col("avg_secs_from_prev"))
      }
      report(1, "view", s1, None)
        .union(report(2, "click", s2, Some(("t1", "t2"))))
        .union(report(3, "purchase", s3, Some(("t2", "t3"))))
        .orderBy("step")
    },
    Some("""WITH e AS (
              SELECT user_id, event_type, CAST(ts AS TIMESTAMP) AS ts FROM events),
            s1 AS (SELECT user_id, MIN(ts) AS t1 FROM e
                   WHERE event_type = 'view' GROUP BY user_id),
            s2 AS (SELECT e.user_id, MIN(e.ts) AS t2, MAX(t1) AS t1
                   FROM e JOIN s1 ON e.user_id = s1.user_id
                   WHERE e.event_type = 'click' AND e.ts > s1.t1
                   GROUP BY e.user_id),
            s3 AS (SELECT e.user_id, MIN(e.ts) AS t3, MAX(t2) AS t2
                   FROM e JOIN s2 ON e.user_id = s2.user_id
                   WHERE e.event_type = 'purchase' AND e.ts > s2.t2
                   GROUP BY e.user_id)
            SELECT CAST(1 AS INTEGER) AS step, 'view' AS event,
              COUNT(*) AS n_users, CAST(NULL AS DOUBLE) AS avg_secs_from_prev
            FROM s1
            UNION ALL
            SELECT CAST(2 AS INTEGER), 'click', COUNT(*),
              CAST(FLOOR(CAST(CAST(SUM(epoch_us(t2) - epoch_us(t1)) AS BIGINT) AS DOUBLE)
                / 1000000.0 / CAST(COUNT(*) AS DOUBLE) * 100.0) AS DOUBLE) / 100.0
            FROM s2
            UNION ALL
            SELECT CAST(3 AS INTEGER), 'purchase', COUNT(*),
              CAST(FLOOR(CAST(CAST(SUM(epoch_us(t3) - epoch_us(t2)) AS BIGINT) AS DOUBLE)
                / 1000000.0 / CAST(COUNT(*) AS DOUBLE) * 100.0) AS DOUBLE) / 100.0
            FROM s3
            ORDER BY step""")
  )

  // --------------------------------------------------------------- q115
  /** Retention cohort matrix — the other event-analytics staple: users
    * grouped by FIRST-ACTIVITY week (cohort), counted in each subsequent
    * activity week. Pure integer date arithmetic (days since the corpus
    * epoch, integer-divided into weeks) and two keyed aggregates — the
    * (user, week) distinct rides the first aggregate's shuffle and the
    * cohort join is user-keyed. No windows, no corpus stratum sorts.
    */
  val q115 = QuerySpec(
    "q115_retention_cohorts",
    (s, d) => {
      val week = expr("datediff(CAST(ts AS DATE), DATE '2024-01-01') div 7")
        .cast("long")
      val e = Tables.events(s, d).select(col("user_id"), week.as("week"))
      val cohort = e.groupBy("user_id").agg(min("week").as("cohort_week"))
      e.distinct()
        .join(cohort, "user_id")
        .groupBy("cohort_week", "week")
        .agg(count(lit(1)).as("n_active"))
        .select(col("cohort_week"), col("week").as("activity_week"), col("n_active"))
        .orderBy("cohort_week", "activity_week")
    },
    Some("""WITH e AS (
              SELECT user_id,
                CAST(date_diff('day', DATE '2024-01-01', CAST(ts AS DATE)) // 7 AS BIGINT) AS week
              FROM events),
            cohort AS (SELECT user_id, MIN(week) AS cohort_week FROM e GROUP BY user_id),
            act AS (SELECT DISTINCT user_id, week FROM e)
            SELECT cohort_week, week AS activity_week, COUNT(*) AS n_active
            FROM act JOIN cohort USING (user_id)
            GROUP BY cohort_week, week
            ORDER BY cohort_week, activity_week""")
  )

  // --------------------------------------------------------------- q122
  /** Event-transition matrix — the Markov-chain summary of user behavior
    * (which event follows which, with what probability) that feeds funnel
    * design (q114) and anomaly detection. `lead` over (user_id, ts) gives
    * each event its successor; the window partitions by USER — bounded by
    * one user's history, the q37 sessionization contract, never a corpus
    * stratum. Counts aggregate by (from, to) — event-type² cells, tiny —
    * and the per-from totals broadcast back for the probability. Ties on
    * ts break by event_id so both engines see one deterministic order.
    */
  val q122 = QuerySpec(
    "q122_event_transitions",
    (s, d) => {
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("user_id").orderBy(col("ts"), col("event_id"))
      val pairs = Tables.events(s, d)
        .select(col("user_id"), col("ts"), col("event_id"), col("event_type"))
        .withColumn("to_type", lead(col("event_type"), 1).over(w))
        .filter(col("to_type").isNotNull)
        .groupBy(col("event_type").as("from_type"), col("to_type"))
        .agg(count(lit(1)).as("n"))
      val totals = pairs.groupBy("from_type").agg(sum("n").as("tot"))
      pairs.join(broadcast(totals), "from_type")
        .select(col("from_type"), col("to_type"), col("n"),
          ffloor(col("n").cast("double") / col("tot"), 4).as("p"))
        .orderBy("from_type", "to_type")
    },
    Some("""WITH s AS (
              SELECT event_type AS from_type,
                LEAD(event_type) OVER (PARTITION BY user_id
                  ORDER BY ts, event_id) AS to_type
              FROM events),
            c AS (SELECT from_type, to_type, COUNT(*) AS n FROM s
                  WHERE to_type IS NOT NULL GROUP BY 1, 2),
            t AS (SELECT from_type, SUM(n) AS tot FROM c GROUP BY 1)
            SELECT c.from_type, c.to_type, c.n,
              CAST(FLOOR(CAST(c.n AS DOUBLE) / t.tot * 10000.0) AS DOUBLE)
                / 10000.0 AS p
            FROM c JOIN t USING (from_type)
            ORDER BY from_type, to_type""")
  )

  // --------------------------------------------------------------- q125
  /** Per-event-type inter-arrival quantiles — latency/cadence profiling
    * composed from two round-5 engines: per-user `lag` gives each event
    * its gap (seconds) since the user's previous event (user-bounded
    * window, the q37/q122 contract), then
    * [[Quantiles.exactQuantilesByGroup]] finds each event type's exact
    * p50/p90 gap WITHOUT per-group sorts — histogram rounds + a
    * ≤threshold-row refine window, per group. The gap table is
    * materialized once so the engine's passes don't replay the window.
    */
  val q125 = QuerySpec(
    "q125_interarrival_quantiles",
    (s, d) => {
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("user_id").orderBy(col("ts"), col("event_id"))
      val gaps = graft.core.Materialize(
        Tables.events(s, d)
          .select(col("user_id"), col("ts"), col("event_id"), col("event_type"))
          .withColumn("prev_us", lag(unix_micros(col("ts")), 1).over(w))
          .filter(col("prev_us").isNotNull)
          .select(col("event_type"),
            expr("(unix_micros(ts) - prev_us) div 1000000").as("gap_secs")))
      Quantiles.exactQuantilesByGroup(gaps, "event_type", "gap_secs",
        Seq(50, 90), refineThreshold = 4096)
    },
    Some("""WITH g AS (
              SELECT event_type,
                (epoch_us(CAST(ts AS TIMESTAMP)) - LAG(epoch_us(CAST(ts AS TIMESTAMP)))
                  OVER (PARTITION BY user_id ORDER BY ts, event_id)) // 1000000
                  AS gap_secs
              FROM events),
            gg AS (SELECT event_type, gap_secs FROM g WHERE gap_secs IS NOT NULL),
            n AS (SELECT event_type, COUNT(*) AS n FROM gg GROUP BY 1),
            t(pct) AS (VALUES (50), (90)),
            ks AS (SELECT event_type, pct,
                     CAST((pct * n + 99) // 100 AS BIGINT) AS k
                   FROM t CROSS JOIN n),
            r AS (SELECT event_type, gap_secs AS x,
                    row_number() OVER (PARTITION BY event_type
                                       ORDER BY gap_secs) AS rn
                  FROM gg)
            SELECT ks.event_type, pct, k, x AS value
            FROM ks JOIN r ON r.event_type = ks.event_type AND rn = k
            ORDER BY ks.event_type, pct""")
  )

  // --------------------------------------------------------------- q176
  /** Peak session CONCURRENCY per day — the capacity-planning staple
    * ("how many users were on at once"), and this engine's demonstration
    * of the DISTRIBUTED PREFIX SUM: a naive sweep line is one GLOBAL
    * ordered running sum over every session endpoint — the textbook
    * unscalable window. The scalable form is the classic two-pass scan
    * algorithm:
    *   1. endpoints (+1 at session start, −1 at end, end-exclusive: at a
    *      tied instant the −1 sorts first) partition by DAY; each
    *      partition computes its LOCAL running sum and local max — keyed
    *      shuffle, bounded per key by that day's endpoint count;
    *   2. per-day TOTALS (a d-row series) prefix-sum into the
    *      carried-in offset each day starts at — the only "global"
    *      window, over days, not endpoints;
    *   3. day max = offset + local max. Exactly the global sweep's
    *      answer at every endpoint instant, with no global sort.
    * Semantics note: the reported max samples the running count AT
    * ENDPOINT INSTANTS of that day (the global sweep's per-day max);
    * days with zero endpoints carry silent concurrency and emit no row.
    * Sessions are q37's native session_window(4h); the oracle rebuilds
    * them via gaps-and-islands and runs the straight global sweep — the
    * two-pass decomposition must match it bit-for-bit. The (t, delta,
    * user_id) sort key is a UNIQUE total order (a user's sessions are
    * ≥ gap apart), so ties cannot flake the hash.
    */
  val q176 = QuerySpec(
    "q176_peak_concurrency",
    (s, d) => {
      val sess = Tables.events(s, d)
        .groupBy(session_window(col("ts"), "4 hours"), col("user_id"))
        .agg(count(lit(1)).as("n"))
        .select(unix_micros(col("session_window.start")).as("s_us"),
          unix_micros(col("session_window.end")).as("e_us"), col("user_id"))
      val pts = sess.select(col("s_us").as("t"), lit(1L).as("delta"), col("user_id"))
        .unionAll(sess.select(col("e_us").as("t"), lit(-1L).as("delta"),
          col("user_id")))
        .withColumn("day", expr("t div 86400000000"))
      val wLocal = Window.partitionBy("day")
        .orderBy(col("t"), col("delta"), col("user_id"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val perDay = pts.withColumn("run", sum(col("delta")).over(wLocal))
        .groupBy("day")
        .agg(max(col("run")).as("local_max"),
          sum(col("delta")).as("day_total"),
          count(when(col("delta") === 1L, lit(1))).as("n_session_starts"))
      val wDays = Window.orderBy("day")
        .rowsBetween(Window.unboundedPreceding, -1)
      perDay
        .withColumn("offset", coalesce(sum(col("day_total")).over(wDays), lit(0L)))
        .select(col("day"), (col("offset") + col("local_max")).as("max_concurrency"),
          col("n_session_starts"))
        .orderBy("day")
    },
    Some("""WITH e AS (SELECT user_id, CAST(ts AS TIMESTAMP) AS ts FROM events),
            g AS (SELECT user_id, ts,
                    CASE WHEN LAG(ts) OVER w IS NULL THEN 1
                         WHEN ts >= LAG(ts) OVER w + INTERVAL 4 HOUR THEN 1
                         ELSE 0 END AS new_s
                  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts)),
            i AS (SELECT user_id, ts,
                    CAST(SUM(new_s) OVER (PARTITION BY user_id ORDER BY ts
                      ROWS UNBOUNDED PRECEDING) AS BIGINT) AS sid
                  FROM g),
            sess AS (
              SELECT user_id, epoch_us(MIN(ts)) AS s_us,
                epoch_us(MAX(ts) + INTERVAL 4 HOUR) AS e_us
              FROM i GROUP BY user_id, sid),
            pts AS (
              SELECT s_us AS t, 1 AS delta, user_id FROM sess
              UNION ALL
              SELECT e_us AS t, -1 AS delta, user_id FROM sess),
            sweep AS (
              SELECT t // 86400000000 AS day, delta,
                CAST(SUM(delta) OVER (ORDER BY t, delta, user_id
                  ROWS UNBOUNDED PRECEDING) AS BIGINT) AS rs
              FROM pts)
            SELECT day, MAX(rs) AS max_concurrency,
              COUNT(CASE WHEN delta = 1 THEN 1 END) AS n_session_starts
            FROM sweep GROUP BY day ORDER BY day""")
  )

  // --------------------------------------------------------------- q190
  /** INTERVAL-OVERLAP JOIN, the bucketed way: which user sessions were
    * live during per-type traffic BURSTS (hours whose event count is
    * ≥ 2.4× that type's mean active-hour rate — the exact integer
    * cross-multiply 5·cnt·n_hours ≥ 12·total — merged into maximal
    * runs)? An interval×interval theta-join is Spark's classic
    * scale trap — BroadcastNestedLoop on `s.start < b.end AND b.start
    * < s.end` — so the engine form maps BOTH interval sets onto their
    * covering DAY buckets (`sequence` over epoch-days) and equi-joins on
    * the bucket, turning the theta-join into a keyed shuffle; the exact
    * overlap predicate then prunes bucket neighbours that don't truly
    * intersect, and a `distinct` collapses intervals that met in several
    * buckets. Work per bucket is (sessions live that day × bursts that
    * day) — the data's real temporal density, not |sessions|×|bursts|.
    * The oracle runs the straight theta-join; the decomposition must
    * reproduce it bit-for-bit.
    *
    * Sessions are q37's native session_window(4h); bursts use exact
    * integer cross-multiplied thresholds (no division anywhere) and
    * gaps-and-islands hour merging. All interval math is
    * epoch-micros longs; the overlap sum is exact.
    */
  val q190 = QuerySpec(
    "q190_interval_overlap_join",
    (s, d) => {
      val ev = Tables.events(s, d)
      val sess = ev.groupBy(session_window(col("ts"), "4 hours"), col("user_id"))
        .agg(count(lit(1)).as("n"))
        .select(col("user_id"),
          unix_micros(col("session_window.start")).as("s_us"),
          unix_micros(col("session_window.end")).as("e_us"))
      val mins = ev.select(col("event_type"),
          expr("unix_micros(ts) div 3600000000").as("m"))
        .groupBy("event_type", "m").agg(count(lit(1)).as("cnt"))
      val stats = mins.groupBy("event_type")
        .agg(sum(col("cnt")).as("tot"), count(lit(1)).as("nm"))
      val hot = mins.join(stats, "event_type")
        .filter(lit(5L) * col("cnt") * col("nm") >= lit(12L) * col("tot"))
        .select("event_type", "m")
      val w = Window.partitionBy("event_type").orderBy("m")
      val wRun = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val newB = when(lag(col("m"), 1).over(w).isNull
        .or(col("m") > lag(col("m"), 1).over(w) + 1), 1L).otherwise(0L)
      val bursts = hot.withColumn("b", sum(newB).over(wRun))
        .groupBy("event_type", "b")
        .agg((min(col("m")) * lit(3600000000L)).as("b_s"),
          ((max(col("m")) + lit(1L)) * lit(3600000000L)).as("b_e"))
      val sb = sess.withColumn("h",
        explode(sequence(expr("s_us div 86400000000"),
          expr("(e_us - 1) div 86400000000"))))
      val bb = bursts.withColumn("h",
        explode(sequence(expr("b_s div 86400000000"),
          expr("(b_e - 1) div 86400000000"))))
      sb.join(bb, "h")
        .filter(col("s_us") < col("b_e") && col("b_s") < col("e_us"))
        .select("user_id", "s_us", "e_us", "event_type", "b_s", "b_e")
        .distinct()
        .groupBy("user_id", "event_type")
        .agg(count(lit(1)).as("n_bursts"),
          sum(least(col("e_us"), col("b_e")) - greatest(col("s_us"), col("b_s")))
            .cast("long").as("overlap_us"))
        .orderBy("user_id", "event_type")
    },
    Some("""WITH e AS (SELECT user_id, CAST(ts AS TIMESTAMP) AS ts FROM events),
            g AS (SELECT user_id, ts,
                    CASE WHEN LAG(ts) OVER w IS NULL THEN 1
                         WHEN ts >= LAG(ts) OVER w + INTERVAL 4 HOUR THEN 1
                         ELSE 0 END AS new_s
                  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts)),
            i AS (SELECT user_id, ts,
                    CAST(SUM(new_s) OVER (PARTITION BY user_id ORDER BY ts
                      ROWS UNBOUNDED PRECEDING) AS BIGINT) AS sid
                  FROM g),
            sess AS (
              SELECT user_id, epoch_us(MIN(ts)) AS s_us,
                epoch_us(MAX(ts) + INTERVAL 4 HOUR) AS e_us
              FROM i GROUP BY user_id, sid),
            mins AS (
              SELECT event_type,
                epoch_us(CAST(ts AS TIMESTAMP)) // 3600000000 AS m,
                COUNT(*) AS cnt
              FROM events GROUP BY 1, 2),
            stats AS (SELECT event_type, CAST(SUM(cnt) AS BIGINT) AS tot,
                        COUNT(*) AS nm
                      FROM mins GROUP BY 1),
            hot AS (SELECT m.event_type, m.m FROM mins m
                    JOIN stats s USING (event_type)
                    WHERE 5 * m.cnt * s.nm >= 12 * s.tot),
            fl AS (SELECT event_type, m,
                     CASE WHEN LAG(m) OVER w IS NULL
                            OR m > LAG(m) OVER w + 1 THEN 1 ELSE 0 END AS nb
                   FROM hot WINDOW w AS (PARTITION BY event_type ORDER BY m)),
            isl AS (SELECT event_type, m,
                      SUM(nb) OVER (PARTITION BY event_type ORDER BY m
                        ROWS UNBOUNDED PRECEDING) AS b
                    FROM fl),
            bursts AS (SELECT event_type, b, MIN(m) * 3600000000 AS b_s,
                         (MAX(m) + 1) * 3600000000 AS b_e
                       FROM isl GROUP BY 1, 2)
            SELECT s.user_id, b.event_type, COUNT(*) AS n_bursts,
              CAST(SUM(LEAST(s.e_us, b.b_e) - GREATEST(s.s_us, b.b_s))
                AS BIGINT) AS overlap_us
            FROM sess s JOIN bursts b
              ON s.s_us < b.b_e AND b.b_s < s.e_us
            GROUP BY 1, 2 ORDER BY user_id, event_type""")
  )

  val all: Seq[QuerySpec] = Seq(q34, q35, q36, q37, q39, q40, q41, q81, q114,
    q115, q122, q125, q176, q190, q246)
}
