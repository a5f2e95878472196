package graft.operators

import graft.{QuerySpec, Tables}
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Exact order statistics WITHOUT a global sort — iterative histogram-refine
  * (q106's sketch→exact pattern applied to ranks).
  *
  * The naive exact quantile (`ORDER BY x` + pick rank k, what q43's
  * percentile aggregates do internally per group) is a full shuffle-sort of
  * the corpus: at 100 TB that is the single most expensive plan Spark can
  * produce. But the rank-k VALUE can be found exactly from repeated narrow
  * passes:
  *
  *   1. bounds pass — per-group min/max/count collected to the driver (one
  *      G-row aggregate; inlined as literals so later passes don't re-scan
  *      for them);
  *   2. histogram pass — bucket every row of each still-active target range
  *      into one of B=1024 fixed-width bins (map-side partial count, one
  *      ≤targets×B-row result collected to the driver); the cumulative bin
  *      counts locate, for each target rank, WHICH bucket holds it and the
  *      residual rank inside that bucket;
  *   3. recurse — any candidate bucket still holding more than
  *      `refineThreshold` rows becomes the next round's range, narrowed to
  *      the bucket's OBSERVED [min,max] (not its nominal bounds, so the
  *      range shrinks to actual data extent every round). A bucket whose
  *      min==max is a point mass: the answer is that value, no further work.
  *      This is what kills the skew hazard — a column where 80% of rows
  *      share one value resolves that value in the round where the mass
  *      first isolates into a bucket, because the observed extent collapses.
  *   4. refine pass — only when a target's candidate set is ≤refineThreshold
  *      rows does a `row_number` window run, partitioned per target, bounded
  *      by the threshold BY CONSTRUCTION (the loop guarantees it), never by
  *      hoping the data is uniform.
  *
  * Termination: each round either resolves a target (point mass) or strictly
  * shrinks its value range to the observed extent of a 1/B-width bucket;
  * doubles have finite precision, so ranges cannot shrink forever without
  * min==max. `maxRounds` is a loud backstop (IllegalStateException), never a
  * silent degradation to a corpus sort.
  *
  * Cross-engine determinism is free: bucket boundaries are internal
  * bookkeeping (integer counts decide everything), and the emitted value is
  * the exact rank-k order statistic — identical under any tie permutation,
  * so the DuckDB oracle can use the textbook `row_number` form. Rank
  * convention: k = ceil(pct·n/100) computed in pure integer arithmetic
  * ((pct·n+99) div 100) so no engine's decimal-vs-double literal typing can
  * shift a rank.
  *
  * Driver-side state is O(groups × pcts) rows plus one ≤targets×B histogram
  * collect per round — constant in the corpus size (the grouped form
  * `require`s the bounded-group contract explicitly). Each distributed pass
  * is a scan filtered to the union of active ranges (range predicates push
  * to the parquet reader) feeding a map-side-combined count/min/max
  * aggregate: the shape you want at 1000 executors. Contrast with q43's
  * per-group `percentile` aggregates — those sort every group's rows inside
  * the aggregate buffer; this engine's per-group cost is histogram counts
  * until the final ≤threshold-row window.
  *
  * The reference connector has no analytics surface (SURVEY.md §2.7); this
  * is part of the engine's own inventory.
  */
object Quantiles {

  /** One still-unresolved rank target: find the value of rank `off`
    * (1-based) among rows of group `g` with x in [lo, hi]; `cnt` rows are
    * known to be in range. */
  private final case class Target(tid: Int, g: String, pct: Int, k: Long,
                                  lo: Double, hi: Double, off: Long, cnt: Long)

  /** The shared engine over a (g: string, x: numeric) projection.
    * Returns (g, pct, k, value). `singleGroup=true` skips the group-equality
    * clause in scan filters so pure x-range predicates reach parquet.
    */
  private def engine(
      gx: DataFrame, pcts: Seq[Int], B: Int, refineThreshold: Long,
      maxRounds: Int, maxGroups: Int): DataFrame = {
    val spark = gx.sparkSession
    import spark.implicits._

    val li = gx.filter(col("x").isNotNull)
    val xType = li.schema("x").dataType

    // Bounds pass: one G-row aggregate to the driver. The grouped-quantile
    // contract is BOUNDED group cardinality (a report dimension, not a key);
    // the cap is checked, not assumed.
    val bounds = li.groupBy("g")
      .agg(min(col("x").cast("double")).as("mn"),
        max(col("x").cast("double")).as("mx"), count(lit(1)).as("n"))
      .limit(maxGroups + 1)
      .collect()
    require(bounds.length <= maxGroups,
      s"exactQuantiles: more than $maxGroups groups — grouped exact " +
        "quantiles are for bounded report dimensions; use a sketch for keys")
    if (bounds.isEmpty)
      return li.select(col("g"), lit(0).as("pct"), lit(0L).as("k"),
        col("x").as("value")).limit(0)
    val single = bounds.length == 1

    val sortedPcts = pcts.distinct.sorted
    val init = bounds.toSeq.sortBy(_.getString(0)).zipWithIndex.flatMap {
      case (r, gi) =>
        val (g, mn, mx, n) = (r.getString(0), r.getDouble(1), r.getDouble(2),
          r.getLong(3))
        sortedPcts.zipWithIndex.map { case (p, pi) =>
          val k = (p.toLong * n + 99) / 100
          Target(gi * sortedPcts.size + pi, g, p, k, mn, mx, k, n)
        }
    }

    def isBig(t: Target): Boolean = t.lo < t.hi && t.cnt > refineThreshold
    var active = init.filter(isBig)
    var small = init.filterNot(isBig)
    val resolved = scala.collection.mutable.ArrayBuffer.empty[(String, Int, Long, Double)]
    val (pm, rest) = small.partition(t => t.lo >= t.hi)
    resolved ++= pm.map(t => (t.g, t.pct, t.k, t.lo))
    small = rest

    // Union-of-active-ranges scan predicate. With one group the clauses are
    // pure x ranges (push to parquet untouched); with many, each clause
    // pins the group value too — both sides of the AND are scan columns.
    def scanFilter(ts: Seq[Target]): Column = ts.map { t =>
      val r = col("x") >= lit(t.lo) && col("x") <= lit(t.hi)
      if (single) r else col("g") === lit(t.g) && r
    }.reduce(_ || _)

    var round = 0
    while (active.nonEmpty) {
      round += 1
      if (round > maxRounds) throw new IllegalStateException(
        s"exactQuantiles: ${active.size} target(s) unresolved after $maxRounds " +
          s"histogram rounds (ranges: ${active.map(t => s"${t.g}[${t.lo},${t.hi}]x${t.cnt}")
            .mkString(", ")}) — refusing to fall back to a corpus-scale sort")

      val tdf = broadcast(active.map(t => (t.tid, t.g, t.lo, t.hi))
        .toDF("tid", "tg", "lo", "hi"))
      val hist = li.filter(scanFilter(active))
        .join(tdf, col("g") === col("tg") &&
          col("x") >= col("lo") && col("x") <= col("hi"))
        .select(col("tid"),
          when(col("hi") > col("lo"),
            least(floor((col("x") - col("lo")) /
              ((col("hi") - col("lo")) / lit(B))), lit(B - 1L)))
            .otherwise(lit(0L)).cast("long").as("bucket"),
          col("x").cast("double").as("xd"))
        .groupBy("tid", "bucket")
        .agg(count(lit(1)).as("cnt"), min("xd").as("bmin"), max("xd").as("bmax"))
        .collect()

      val byTid = hist.groupBy(_.getInt(0))
      val next = scala.collection.mutable.ArrayBuffer.empty[Target]
      active.foreach { t =>
        val bins = byTid(t.tid).sortBy(_.getLong(1))
        var cum = 0L
        var placedT: Option[Target] = None
        bins.foreach { r =>
          val (c, bmin, bmax) = (r.getLong(2), r.getDouble(3), r.getDouble(4))
          if (placedT.isEmpty && t.off > cum && t.off <= cum + c)
            placedT = Some(Target(t.tid, t.g, t.pct, t.k, bmin, bmax, t.off - cum, c))
          cum += c
        }
        val p = placedT.getOrElse(throw new IllegalStateException(
          s"exactQuantiles: rank ${t.off} not found in histogram of " +
            s"${t.g}[${t.lo},${t.hi}] (${cum} rows) — bucket arithmetic drift"))
        if (p.lo >= p.hi) resolved += ((p.g, p.pct, p.k, p.lo)) // point mass
        else if (p.cnt <= refineThreshold) small = small :+ p
        else next += p
      }
      active = next.toSeq
    }

    // Refine pass: rank ONLY the surviving candidate ranges; each window
    // partition holds ≤refineThreshold rows by the loop's guarantee.
    val fromWindow: Seq[DataFrame] =
      if (small.isEmpty) Nil
      else {
        val tdf = broadcast(
          small.map(t => (t.tid, t.g, t.pct, t.k, t.lo, t.hi, t.off))
            .toDF("tid", "tg", "pct", "k", "lo", "hi", "off"))
        Seq(li.filter(scanFilter(small))
          .join(tdf, col("g") === col("tg") &&
            col("x") >= col("lo") && col("x") <= col("hi"))
          .withColumn("rn",
            row_number().over(Window.partitionBy("tid").orderBy("x")))
          .filter(col("rn") === col("off"))
          .select(col("g"), col("pct"), col("k"), col("x").as("value")))
      }
    val fromResolved: Seq[DataFrame] =
      if (resolved.isEmpty) Nil
      else Seq(resolved.toSeq.toDF("g", "pct", "k", "value")
        .select(col("g"), col("pct"), col("k"), col("value").cast(xType)))

    (fromWindow ++ fromResolved).reduce(_ unionByName _)
  }

  /** Exact values at `ceil(pct·n/100)` ranks of `xCol` (non-null rows).
    * Returns (pct:int, k:long, value).
    */
  def exactQuantiles(
      df: DataFrame,
      xCol: String,
      pcts: Seq[Int],
      B: Int = 1024,
      refineThreshold: Long = 1 << 20,
      maxRounds: Int = 64): DataFrame =
    engine(df.select(lit("").as("g"), col(xCol).as("x")), pcts, B,
        refineThreshold, maxRounds, maxGroups = 1)
      .select(col("pct"), col("k"), col("value"))
      .orderBy("pct")

  /** Per-group exact quantiles: (group, pct, k, value). The group column
    * must be string-typed and BOUNDED (`maxGroups` is `require`d) — this is
    * a report dimension, not a join key. Per-group ranks use each group's
    * own row count.
    */
  def exactQuantilesByGroup(
      df: DataFrame,
      groupCol: String,
      xCol: String,
      pcts: Seq[Int],
      B: Int = 1024,
      refineThreshold: Long = 1 << 20,
      maxRounds: Int = 64,
      maxGroups: Int = 1024): DataFrame =
    engine(df.select(col(groupCol).as("g"), col(xCol).as("x"))
        .filter(col("g").isNotNull), pcts, B, refineThreshold, maxRounds,
        maxGroups)
      .select(col("g").as(groupCol), col("pct"), col("k"), col("value"))
      .orderBy(groupCol, "pct")

  // ---------------------------------------------------------------- q118
  /** Exact p25/p50/p75/p90/p99 of `l_extendedprice` → (pct, k, value). */
  val q118 = QuerySpec(
    "q118_exact_quantiles_nosort",
    (s, d) => exactQuantiles(
      Tables.lineitem(s, d), "l_extendedprice", Seq(25, 50, 75, 90, 99),
      // sf0.01-sized threshold so the oracle run actually exercises the
      // recursion (production default 1M rows per refine partition).
      refineThreshold = 4096),
    Some("""WITH n AS (SELECT COUNT(*) AS n FROM lineitem
                       WHERE l_extendedprice IS NOT NULL),
            t(pct) AS (VALUES (25), (50), (75), (90), (99)),
            ks AS (SELECT pct, CAST((pct * n + 99) // 100 AS BIGINT) AS k
                   FROM t CROSS JOIN n),
            r AS (SELECT l_extendedprice AS x,
                    row_number() OVER (ORDER BY l_extendedprice) AS rn
                  FROM lineitem WHERE l_extendedprice IS NOT NULL)
            SELECT pct, k, x AS value FROM ks JOIN r ON rn = k
            ORDER BY pct""")
  )

  // ---------------------------------------------------------------- q120
  /** Grouped exact quantiles: p50/p90/p99 of `l_extendedprice` per
    * `l_returnflag` — what q43 computes with per-group sort aggregates,
    * re-expressed on the histogram-refine engine so group size never
    * dictates a task's memory. The DuckDB oracle is the textbook
    * per-group row_number form.
    */
  val q120 = QuerySpec(
    "q120_grouped_quantiles_nosort",
    (s, d) => exactQuantilesByGroup(
      Tables.lineitem(s, d), "l_returnflag", "l_extendedprice",
      Seq(50, 90, 99), refineThreshold = 4096),
    Some("""WITH n AS (SELECT l_returnflag, COUNT(*) AS n FROM lineitem
                       WHERE l_extendedprice IS NOT NULL GROUP BY 1),
            t(pct) AS (VALUES (50), (90), (99)),
            ks AS (SELECT l_returnflag, pct,
                     CAST((pct * n + 99) // 100 AS BIGINT) AS k
                   FROM t CROSS JOIN n),
            r AS (SELECT l_returnflag, l_extendedprice AS x,
                    row_number() OVER (PARTITION BY l_returnflag
                                       ORDER BY l_extendedprice) AS rn
                  FROM lineitem WHERE l_extendedprice IS NOT NULL)
            SELECT ks.l_returnflag, pct, k, x AS value
            FROM ks JOIN r ON r.l_returnflag = ks.l_returnflag AND rn = k
            ORDER BY ks.l_returnflag, pct""")
  )

  // --------------------------------------------------------------- q234
  /** MEDIAN treatment effect — [[graft.operators.TimeSeries.q226]]'s mean
    * uplift is dragged by revenue's heavy tail (one whale in either arm
    * moves it more than the treatment does); the per-arm MEDIAN of
    * post-period user revenue is the robust readout. Medians come from
    * [[exactQuantilesByGroup]] — the iterative histogram-refine engine,
    * so the corpus is never globally sorted — on the user-keyed cents
    * table (integer cents, q150's idiom), and the effect is reported as
    * an EXACT integer cents difference: no double appears anywhere in
    * this query.
    *
    * Scale shape: scan → user-keyed aggregate → the quantile engine's
    * bounded narrow passes per arm (2 groups) → 1-row output.
    */
  val q234 = QuerySpec(
    "q234_median_uplift",
    (s, d) => {
      val cut = lit("2024-01-15").cast("timestamp")
      val arm = conv(substring(md5(concat(col("user_id").cast("string"),
        lit(":ab"))), 8, 1), 16, 10).cast("long") % 2
      val users = Tables.events(s, d)
        .groupBy("user_id")
        .agg(sum(when(col("ts") >= cut,
          floor(col("value") * lit(100.0)).cast("long")).otherwise(0L))
          .cast("long").as("y"))
        .select(arm.cast("string").as("arm"), col("y"))
      val med = exactQuantilesByGroup(users, "arm", "y", Seq(50),
        refineThreshold = 4096)
      med.groupBy()
        .agg(
          max(when(col("arm") === "0", col("value"))).cast("long")
            .as("median0_cents"),
          max(when(col("arm") === "1", col("value"))).cast("long")
            .as("median1_cents"))
        .select(col("median0_cents"), col("median1_cents"),
          (col("median1_cents") - col("median0_cents")).as("uplift_cents"))
    },
    Some("""WITH users AS (
              SELECT user_id,
                CAST(SUM(CASE WHEN ts >= TIMESTAMP '2024-01-15'
                  THEN CAST(FLOOR(value * 100.0) AS BIGINT) ELSE 0 END)
                  AS BIGINT) AS y
              FROM events GROUP BY 1),
            armed AS (
              SELECT CAST(('0x' || substr(md5(CAST(user_id AS VARCHAR) || ':ab'),
                  8, 1)) AS BIGINT) % 2 AS arm, y
              FROM users),
            n AS (SELECT arm, COUNT(*) AS n FROM armed GROUP BY 1),
            ks AS (SELECT arm, CAST((50 * n + 99) // 100 AS BIGINT) AS k FROM n),
            r AS (SELECT arm, y,
                    row_number() OVER (PARTITION BY arm ORDER BY y) AS rn
                  FROM armed),
            med AS (SELECT r.arm, r.y FROM ks JOIN r
                    ON r.arm = ks.arm AND r.rn = ks.k)
            SELECT MAX(CASE WHEN arm = 0 THEN y END) AS median0_cents,
              MAX(CASE WHEN arm = 1 THEN y END) AS median1_cents,
              MAX(CASE WHEN arm = 1 THEN y END)
                - MAX(CASE WHEN arm = 0 THEN y END) AS uplift_cents
            FROM med""")
  )

  val all: Seq[QuerySpec] = Seq(q118, q120, q234)
}
