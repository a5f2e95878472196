package graft.operators

import graft.{QuerySpec, Tables}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Exact order statistics WITHOUT a global sort — the two-pass
  * histogram-refine idiom (q106's sketch→exact pattern applied to ranks).
  *
  * The naive exact quantile (`ORDER BY x` + pick rank k, what q43's
  * percentile aggregates do internally per group) is a full shuffle-sort of
  * the corpus: at 100 TB that is the single most expensive plan Spark can
  * produce. But the rank-k VALUE can be found exactly from two narrow
  * passes:
  *
  *   1. histogram pass — bucket every row into one of B=1024 fixed-width
  *      bins (map-side partial count, one ~B-row shuffle); the cumulative
  *      bin counts locate, for each target rank k, WHICH bucket holds the
  *      k-th value and the residual rank inside it;
  *   2. refine pass — re-scan filtered to the ≤|targets| candidate buckets
  *      (everything else never leaves the scan) and rank only those rows
  *      per-bucket. Each bucket holds ~N/B of the data under bounded
  *      density; production recurses the same two passes when a bucket is
  *      still too large (pathological point-mass), which terminates because
  *      each round divides the candidate range by B.
  *
  * Both windows here are bounded by construction, never by the data: the
  * cumulative-count window runs over the ≤B-row histogram table, and the
  * refine window partitions by candidate bucket (~N/B rows each). Nothing
  * sorts the corpus.
  *
  * Cross-engine determinism is free: bucket boundaries are internal
  * bookkeeping (integer counts decide everything), and the emitted value is
  * the exact rank-k order statistic — identical under any tie permutation,
  * so the DuckDB oracle can use the textbook `row_number` form. Rank
  * convention: k = ceil(pct·n/100) computed in pure integer arithmetic
  * ((pct·n+99) div 100) so no engine's decimal-vs-double literal typing can
  * shift a rank.
  *
  * The reference connector has no analytics surface (SURVEY.md §2.7); this
  * is part of the engine's own inventory.
  */
object Quantiles {

  // ---------------------------------------------------------------- q118
  /** Exact p25/p50/p75/p90/p99 of `l_extendedprice` → (pct, k, value). */
  val q118 = QuerySpec(
    "q118_exact_quantiles_nosort",
    (s, d) => {
      import s.implicits._
      val B = 1024
      val li = Tables.lineitem(s, d)
        .select(col("l_extendedprice").as("x"))
        .filter(col("x").isNotNull)

      val bounds = li.agg(min("x").as("minv"), max("x").as("maxv"),
        count(lit(1)).as("n"))

      // Pass 1: fixed-width bucketing + per-bucket counts.
      val bucketed = li.crossJoin(broadcast(bounds)).select(
        col("x"),
        when(col("maxv") > col("minv"),
          least(floor((col("x") - col("minv")) /
            ((col("maxv") - col("minv")) / lit(B))), lit(B - 1L)))
          .otherwise(lit(0L)).cast("long").as("bucket"))

      val hist = bucketed.groupBy("bucket").agg(count(lit(1)).as("cnt"))
      // ≤B rows by construction — the single-task window is bounded by the
      // histogram resolution, not the data.
      val wCum = Window.orderBy("bucket")
        .rowsBetween(Window.unboundedPreceding, -1)
      val cum = hist.withColumn("cum_before",
        coalesce(sum("cnt").over(wCum), lit(0L)))

      val targets = Seq(25, 50, 75, 90, 99).toDF("pct")
        .crossJoin(broadcast(bounds))
        .select(col("pct"), expr("(pct * n + 99) div 100").as("k"))

      // Which bucket holds rank k, and the residual rank inside it.
      val placed = targets.join(broadcast(cum),
          col("k") > col("cum_before") &&
            col("k") <= col("cum_before") + col("cnt"))
        .select(col("pct"), col("k"), col("bucket"),
          (col("k") - col("cum_before")).as("off"))

      // Pass 2: rank ONLY the candidate buckets (~N/B rows per bucket).
      val candBuckets = placed.select("bucket").distinct()
      val ranked = bucketed.join(broadcast(candBuckets), "bucket")
        .withColumn("rn",
          row_number().over(Window.partitionBy("bucket").orderBy("x")))

      ranked.join(broadcast(placed),
          ranked("bucket") === placed("bucket") && col("rn") === col("off"))
        .select(col("pct"), col("k"), col("x").as("value"))
        .orderBy("pct")
    },
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
