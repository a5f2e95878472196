package graft.operators

import graft.{QuerySpec, Tables}
import org.apache.spark.sql.DataFrame
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
  *   1. bounds pass — min/max/count collected to the driver (one 1-row
  *      aggregate; inlined as literals so later passes don't re-scan for
  *      them);
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
  * Driver-side state is O(targets) rows plus one ≤targets×B histogram
  * collect per round — constant in the corpus size. Each distributed pass is
  * a scan filtered to the union of active ranges (range predicates push to
  * the parquet reader) feeding a map-side-combined count/min/max aggregate:
  * the shape you want at 1000 executors.
  *
  * The reference connector has no analytics surface (SURVEY.md §2.7); this
  * is part of the engine's own inventory.
  */
object Quantiles {

  /** One still-unresolved rank target: find the value of rank `off` (1-based)
    * among rows with x in [lo, hi]; `cnt` rows are known to be in range. */
  private final case class Target(
      tid: Int, pct: Int, k: Long, lo: Double, hi: Double, off: Long, cnt: Long)

  /** Exact values at `ceil(pct·n/100)` ranks of `xCol` (must be numeric,
    * non-null rows only are ranked). Returns (pct:int, k:long, value).
    *
    * @param refineThreshold max rows a single refine-window partition may
    *   hold; candidate buckets above it are re-histogrammed instead.
    * @param maxRounds loud failure bound on the narrowing loop.
    */
  def exactQuantiles(
      df: DataFrame,
      xCol: String,
      pcts: Seq[Int],
      B: Int = 1024,
      refineThreshold: Long = 1 << 20,
      maxRounds: Int = 64): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._

    val li = df.select(col(xCol).as("x")).filter(col("x").isNotNull)

    // Bounds pass: one 1-row aggregate to the driver; every later pass gets
    // minv/maxv/n as literals instead of a re-scanned crossJoin.
    val bRow = li.agg(min(col("x").cast("double")), max(col("x").cast("double")),
      count(lit(1))).head()
    val n = bRow.getLong(2)
    if (n == 0L)
      return li.select(lit(0).as("pct"), lit(0L).as("k"), col("x").as("value"))
        .limit(0)
    val (minv, maxv) = (bRow.getDouble(0), bRow.getDouble(1))

    val init = pcts.distinct.sorted.zipWithIndex.map { case (p, i) =>
      Target(i, p, (p.toLong * n + 99) / 100, minv, maxv, (p.toLong * n + 99) / 100, n)
    }

    var active = init.filter(t => t.lo < t.hi && t.cnt > refineThreshold)
    var small = init.filterNot(t => t.lo < t.hi && t.cnt > refineThreshold)
    val resolved = scala.collection.mutable.ArrayBuffer.empty[(Int, Long, Double)]
    // Point-mass whole column: every row is minv.
    val (pm, rest) = small.partition(t => t.lo >= t.hi)
    resolved ++= pm.map(t => (t.pct, t.k, t.lo))
    small = rest

    var round = 0
    while (active.nonEmpty) {
      round += 1
      if (round > maxRounds) throw new IllegalStateException(
        s"exactQuantiles: ${active.size} target(s) unresolved after $maxRounds " +
          s"histogram rounds (ranges: ${active.map(t => s"[${t.lo},${t.hi}]x${t.cnt}")
            .mkString(", ")}) — refusing to fall back to a corpus-scale sort")

      // Histogram pass over the union of active ranges. The containment join
      // is a ≤targets-row broadcast; the OR-of-ranges filter pushes down.
      val tdf = broadcast(active.map(t => (t.tid, t.lo, t.hi))
        .toDF("tid", "lo", "hi"))
      val rangeFilter = active.map(t =>
        col("x") >= lit(t.lo) && col("x") <= lit(t.hi)).reduce(_ || _)
      val hist = li.filter(rangeFilter)
        .join(tdf, col("x") >= col("lo") && col("x") <= col("hi"))
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
            placedT = Some(Target(t.tid, t.pct, t.k, bmin, bmax, t.off - cum, c))
          cum += c
        }
        val p = placedT.getOrElse(throw new IllegalStateException(
          s"exactQuantiles: rank ${t.off} not found in histogram of " +
            s"[${t.lo},${t.hi}] (${cum} rows) — bucket arithmetic drift"))
        if (p.lo >= p.hi) resolved += ((p.pct, p.k, p.lo)) // point mass
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
        val tdf = broadcast(small.map(t => (t.tid, t.pct, t.k, t.lo, t.hi, t.off))
          .toDF("tid", "pct", "k", "lo", "hi", "off"))
        val rangeFilter = small.map(t =>
          col("x") >= lit(t.lo) && col("x") <= lit(t.hi)).reduce(_ || _)
        Seq(li.filter(rangeFilter)
          .join(tdf, col("x") >= col("lo") && col("x") <= col("hi"))
          .withColumn("rn",
            row_number().over(Window.partitionBy("tid").orderBy("x")))
          .filter(col("rn") === col("off"))
          .select(col("pct"), col("k"), col("x").as("value")))
      }
    val fromResolved: Seq[DataFrame] =
      if (resolved.isEmpty) Nil
      else Seq(resolved.toSeq.toDF("pct", "k", "value")
        .select(col("pct"), col("k"), col("value").cast(li.schema("x").dataType)))

    (fromWindow ++ fromResolved).reduce(_ unionByName _).orderBy("pct")
  }

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

  val all: Seq[QuerySpec] = Seq(q118)
}
