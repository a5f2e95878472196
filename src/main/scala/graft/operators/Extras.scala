package graft.operators

import graft.{QuerySpec, Tables}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import Ops._

/** Additional analytic surface: distribution window functions, exact
  * percentiles, ordered string aggregation, and array functions.
  */
object Extras {

  // ---------------------------------------------------------------- q42
  /** Distribution window functions — ntile/percent_rank/cume_dist produce
    * exact rationals of row counts, so they compare bit-exact across
    * engines.
    */
  val q42 = QuerySpec(
    "q42_window_distribution",
    (s, d) => {
      val w = Window.partitionBy(col("c_nationkey"))
        .orderBy(col("c_acctbal"), col("c_custkey"))
      Tables.customer(s, d)
        .select(
          col("c_nationkey"), col("c_custkey"),
          ntile(4).over(w).as("quartile"),
          percent_rank().over(w).as("pct_rank"),
          cume_dist().over(w).as("cume"))
        .filter(col("c_custkey") % 10 === 0)
        .orderBy("c_nationkey", "c_custkey")
    },
    Some("""SELECT c_nationkey, c_custkey,
              NTILE(4) OVER w AS quartile,
              PERCENT_RANK() OVER w AS pct_rank,
              CUME_DIST() OVER w AS cume
            FROM customer
            WINDOW w AS (PARTITION BY c_nationkey ORDER BY c_acctbal, c_custkey)
            QUALIFY c_custkey % 10 = 0
            ORDER BY c_nationkey, c_custkey""")
  )

  // ---------------------------------------------------------------- q43
  /** Exact linear-interpolation percentiles (Spark `percentile` ≡ DuckDB
    * `quantile_cont`), truncated to 2 decimals via scaled floor.
    */
  val q43 = QuerySpec(
    "q43_percentiles",
    (s, d) =>
      Tables.customer(s, d)
        .groupBy("c_nationkey")
        .agg(
          ffloor(expr("percentile(c_acctbal, 0.25)"), 2).as("p25"),
          ffloor(expr("percentile(c_acctbal, 0.5)"), 2).as("median"),
          ffloor(expr("percentile(c_acctbal, 0.75)"), 2).as("p75"),
          count(lit(1)).as("n"))
        .orderBy("c_nationkey"),
    Some("""SELECT c_nationkey,
              CAST(FLOOR(quantile_cont(c_acctbal, 0.25) * 100.0) AS DOUBLE) / 100.0 AS p25,
              CAST(FLOOR(quantile_cont(c_acctbal, 0.5) * 100.0) AS DOUBLE) / 100.0 AS median,
              CAST(FLOOR(quantile_cont(c_acctbal, 0.75) * 100.0) AS DOUBLE) / 100.0 AS p75,
              COUNT(*) AS n
            FROM customer GROUP BY c_nationkey ORDER BY c_nationkey""")
  )

  // ---------------------------------------------------------------- q44
  /** Ordered string aggregation: lexicographically sorted collect_list
    * joined with a delimiter ≡ `string_agg(... ORDER BY ...)`.
    */
  val q44 = QuerySpec(
    "q44_string_agg",
    (s, d) =>
      Tables.customer(s, d)
        .filter(col("c_acctbal") > 9000)
        .groupBy("c_nationkey")
        .agg(
          concat_ws(",", array_sort(collect_list(col("c_name")))).as("top_names"),
          count(lit(1)).as("n"))
        .orderBy("c_nationkey"),
    Some("""SELECT c_nationkey,
              string_agg(c_name, ',' ORDER BY c_name) AS top_names,
              COUNT(*) AS n
            FROM customer WHERE c_acctbal > 9000
            GROUP BY c_nationkey ORDER BY c_nationkey""")
  )

  // ---------------------------------------------------------------- q45
  /** Array functions over token arrays — sort/slice/distinct/contains,
    * rendered to scalars for engine-neutral comparison.
    */
  val q45 = QuerySpec(
    "q45_array_funcs",
    (s, d) => {
      val ts = split(asciiLower(col("text")), " ")
      Tables.documents(s, d)
        .select(
          col("doc_id"),
          size(ts).as("n_tokens"),
          concat_ws("|", slice(array_sort(ts), 1, 3)).as("first3_sorted"),
          size(array_distinct(ts)).as("n_distinct"),
          array_contains(ts, "spark").as("has_spark"),
          element_at(ts, 1).as("first_token"),
          element_at(ts, -1).as("last_token"))
        .orderBy("doc_id")
    },
    Some(s"""SELECT doc_id,
              CAST(len(string_split(${asciiLowerSql("text")}, ' ')) AS INTEGER) AS n_tokens,
              array_to_string(list_sort(string_split(${asciiLowerSql("text")}, ' '))[1:3], '|') AS first3_sorted,
              CAST(len(list_distinct(string_split(${asciiLowerSql("text")}, ' '))) AS INTEGER) AS n_distinct,
              list_contains(string_split(${asciiLowerSql("text")}, ' '), 'spark') AS has_spark,
              string_split(${asciiLowerSql("text")}, ' ')[1] AS first_token,
              string_split(${asciiLowerSql("text")}, ' ')[-1] AS last_token
            FROM documents ORDER BY doc_id""")
  )

  // ---------------------------------------------------------------- q49
  /** Bag-semantics set ops: EXCEPT ALL / INTERSECT ALL keep duplicate
    * multiplicities (q17 covers the DISTINCT variants).
    */
  val q49 = QuerySpec(
    "q49_set_ops_all",
    (s, d) => {
      val li = Tables.lineitem(s, d)
      val a = li.filter(col("l_quantity") >= 25).select("l_partkey")
      val b = li.filter(col("l_returnflag") === "R").select("l_partkey")
      def cnt(df: org.apache.spark.sql.DataFrame, tag: String) =
        df.agg(count(lit(1)).as("n")).select(lit(tag).as("tag"), col("n"))
      cnt(a.exceptAll(b), "except_all")
        .unionAll(cnt(a.intersectAll(b), "intersect_all"))
        .orderBy("tag")
    },
    Some("""WITH a AS (SELECT l_partkey FROM lineitem WHERE l_quantity >= 25),
                 b AS (SELECT l_partkey FROM lineitem WHERE l_returnflag = 'R')
            SELECT 'except_all' AS tag, COUNT(*) AS n FROM
              (SELECT * FROM a EXCEPT ALL SELECT * FROM b)
            UNION ALL
            SELECT 'intersect_all' AS tag, COUNT(*) AS n FROM
              (SELECT * FROM a INTERSECT ALL SELECT * FROM b)
            ORDER BY tag""")
  )

  // ---------------------------------------------------------------- q50
  /** Conditional aggregates: count_if / bool_or / bool_and — identical
    * names and semantics on both engines.
    */
  val q50 = QuerySpec(
    "q50_conditional_agg",
    (s, d) =>
      Tables.orders(s, d)
        .groupBy("o_orderstatus")
        .agg(
          expr("count_if(o_totalprice > 200000)").as("n_big"),
          expr("bool_or(o_orderpriority = '1-URGENT')").as("any_urgent"),
          expr("bool_and(o_totalprice >= 0)").as("all_nonneg"),
          count(lit(1)).as("n"))
        .orderBy("o_orderstatus"),
    Some("""SELECT o_orderstatus,
              CAST(count_if(o_totalprice > 200000) AS BIGINT) AS n_big,
              bool_or(o_orderpriority = '1-URGENT') AS any_urgent,
              bool_and(o_totalprice >= 0) AS all_nonneg,
              COUNT(*) AS n
            FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus""")
  )

  // ---------------------------------------------------------------- q51
  /** Navigation window functions: first/last/nth value over an explicit
    * full frame (deterministic with a unique ordering).
    */
  val q51 = QuerySpec(
    "q51_window_navigation",
    (s, d) => {
      val w = Window.partitionBy(col("c_nationkey"))
        .orderBy(col("c_acctbal").desc, col("c_custkey"))
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
      Tables.customer(s, d)
        .select(
          col("c_nationkey"), col("c_custkey"),
          first(col("c_custkey")).over(w).as("richest"),
          last(col("c_custkey")).over(w).as("poorest"),
          nth_value(col("c_custkey"), 2).over(w).as("second"))
        .filter(col("c_custkey") % 20 === 0)
        .orderBy("c_nationkey", "c_custkey")
    },
    Some("""SELECT c_nationkey, c_custkey, richest, poorest, second FROM (
              SELECT c_nationkey, c_custkey,
                FIRST_VALUE(c_custkey) OVER w AS richest,
                LAST_VALUE(c_custkey) OVER w AS poorest,
                NTH_VALUE(c_custkey, 2) OVER w AS second
              FROM customer
              WINDOW w AS (PARTITION BY c_nationkey
                ORDER BY c_acctbal DESC, c_custkey
                ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING))
            WHERE c_custkey % 20 = 0
            ORDER BY c_nationkey, c_custkey""")
  )

  // ---------------------------------------------------------------- q52
  /** Explicit GROUPING SETS (beyond rollup q12 / cube q35): two single-
    * dimension sets plus the grand total, via the SQL surface.
    */
  val q52 = QuerySpec(
    "q52_grouping_sets",
    (s, d) => {
      Tables.lineitem(s, d).createOrReplaceTempView("graft_lineitem")
      s.sql("""
        SELECT l_returnflag, l_linestatus,
          CAST(ROUND(SUM(CAST(l_quantity AS DECIMAL(30,10))), 2) AS DOUBLE) AS sum_qty,
          COUNT(*) AS cnt
        FROM graft_lineitem
        GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
        ORDER BY l_returnflag ASC NULLS FIRST, l_linestatus ASC NULLS FIRST""")
    },
    Some("""SELECT l_returnflag, l_linestatus,
              CAST(ROUND(SUM(CAST(l_quantity AS DECIMAL(30,10))), 2) AS DOUBLE) AS sum_qty,
              COUNT(*) AS cnt
            FROM lineitem
            GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
            ORDER BY l_returnflag ASC NULLS FIRST, l_linestatus ASC NULLS FIRST""")
  )

  // ---------------------------------------------------------------- q53
  /** LATERAL correlated derived table: top-2 customers per nation —
    * the SQL-standard lateral join both engines support.
    */
  val q53 = QuerySpec(
    "q53_lateral_topk",
    (s, d) => {
      Tables.nation(s, d).createOrReplaceTempView("graft_nation")
      Tables.customer(s, d).createOrReplaceTempView("graft_customer")
      s.sql("""
        SELECT n_name, t.c_custkey, t.c_acctbal
        FROM graft_nation,
        LATERAL (SELECT c_custkey, c_acctbal FROM graft_customer
                 WHERE c_nationkey = n_nationkey
                 ORDER BY c_acctbal DESC, c_custkey LIMIT 2) t
        ORDER BY n_name, t.c_custkey""")
    },
    Some("""SELECT n_name, t.c_custkey, t.c_acctbal
            FROM nation,
            LATERAL (SELECT c_custkey, c_acctbal FROM customer
                     WHERE c_nationkey = n_nationkey
                     ORDER BY c_acctbal DESC, c_custkey LIMIT 2) t
            ORDER BY n_name, t.c_custkey""")
  )

  // ---------------------------------------------------------------- q54
  /** Value-RANGE window frame (peers included by value distance, not row
    * count): running sum over prices within 10000 below the current row's
    * price, per order status.
    */
  val q54 = QuerySpec(
    "q54_range_frame",
    (s, d) => {
      val w = Window.partitionBy(col("o_orderstatus"))
        .orderBy(col("o_totalprice"))
        .rangeBetween(-10000L, Window.currentRow)
      Tables.orders(s, d)
        .filter(col("o_orderkey") % 10 === 0)
        .select(
          col("o_orderkey"), col("o_orderstatus"), col("o_totalprice"),
          dsumOver(col("o_totalprice"), w).as("near_sum"))
        .orderBy("o_orderkey")
    },
    Some("""SELECT o_orderkey, o_orderstatus, o_totalprice,
              CAST(ROUND(SUM(CAST(o_totalprice AS DECIMAL(30,10))) OVER (
                PARTITION BY o_orderstatus ORDER BY o_totalprice
                RANGE BETWEEN 10000 PRECEDING AND CURRENT ROW), 2) AS DOUBLE)
                AS near_sum
            FROM orders
            WHERE o_orderkey % 10 = 0
            ORDER BY o_orderkey""")
  )

  // --------------------------------------------------------------- q129
  /** Salted skew join, oracled — [[SkewJoin.saltedEquiJoin]] must produce
    * EXACTLY a plain equi-join's rows (salting is a physical rewrite, not
    * a semantic one), so the revenue-by-priority rollup through the salted
    * path is hash-checked against DuckDB's plain join. The salted plan
    * splits each orderkey's lineitem rows across 8 salt partitions
    * (hash of the unique linenumber-composite) and replicates the orders
    * side 8× — the manual fallback when one key is so hot that even AQE's
    * skew split leaves a straggler. Decimal-exact revenue sum.
    */
  val q129 = QuerySpec(
    "q129_salted_skew_join",
    (s, d) => {
      val li = Tables.lineitem(s, d)
        .select(col("l_orderkey"), col("l_linenumber"), col("l_extendedprice"))
      val ord = Tables.orders(s, d)
        .select(col("o_orderkey").as("l_orderkey"), col("o_orderpriority"))
      SkewJoin.saltedEquiJoin(li, ord, "l_orderkey",
          leftUniqueCol = "l_linenumber", salts = 8)
        .groupBy("o_orderpriority")
        .agg(count(lit(1)).as("n_items"),
          graft.operators.Ops.dsum(col("l_extendedprice")).as("revenue"))
        .orderBy("o_orderpriority")
    },
    Some("""SELECT o_orderpriority, COUNT(*) AS n_items,
              CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(30,10))), 2) AS DOUBLE) AS revenue
            FROM lineitem JOIN orders ON l_orderkey = o_orderkey
            GROUP BY o_orderpriority ORDER BY o_orderpriority""")
  )

  val all: Seq[QuerySpec] = Seq(q42, q43, q44, q45, q49, q50, q51, q52, q53,
    q54, q129)
}
