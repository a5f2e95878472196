package graft.operators

import graft.QuerySpec
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame}

/** Z-order (Morton) file clustering — the layout half of scan pruning at
  * 100 TB. Parquet row-group skipping works off per-file/per-group min/max
  * stats; a lake sorted by ONE column prunes only predicates on that
  * column. Interleaving the bits of two normalized sort keys gives every
  * file a small min/max envelope in BOTH dimensions, so
  * `WHERE a BETWEEN … AND b BETWEEN …` prunes on either predicate alone or
  * both — the standard technique in lakehouse table formats, expressed
  * here with nothing but codegen'd bitwise built-ins.
  *
  * Scale shape: one broadcast min/max aggregate (two scalars per column),
  * a per-row integer expression (5 shift/mask ops per operand — the
  * classic bit-spreading sequence), and one range repartition + in-file
  * sort, which is exactly what any compaction/write pass already pays.
  * Nothing here is driver-side except the 1-row bounds table.
  */
object ZOrder {

  /** Spread the low 16 bits of non-negative `x` to even bit positions
    * (0bxyz → 0b0x0y0z), the Morton interleave half-step.
    */
  private[operators] def spread16(x: Column): Column = {
    val a = x.bitwiseOR(shiftleft(x, 8)).bitwiseAND(lit(0x00FF00FFL))
    val b = a.bitwiseOR(shiftleft(a, 4)).bitwiseAND(lit(0x0F0F0F0FL))
    val c = b.bitwiseOR(shiftleft(b, 2)).bitwiseAND(lit(0x33333333L))
    c.bitwiseOR(shiftleft(c, 1)).bitwiseAND(lit(0x55555555L))
  }

  /** Min/max-normalize `v` (long) into [0, 65535]. Constant columns map
    * to 0 (degenerate dimension contributes nothing to the order). The
    * scale product stays in Long for any |v - min| < 2^47 — true for
    * every id/timestamp/count column this engine handles; callers with
    * wider domains pre-scale.
    */
  private[operators] def norm16(v: Column, mn: Column, mx: Column): Column =
    // `/` on longs is TRUE division (double) in Spark SQL; floor+cast
    // recovers the integer quotient (operands are non-negative here)
    when(mx > mn,
      floor((v - mn) * lit(65535L) / (mx - mn)).cast("long"))
      .otherwise(lit(0L))

  /** The 32-bit Morton code of two 16-bit normalized dimensions. */
  private[operators] def morton(v1: Column, v2: Column): Column =
    spread16(v1).bitwiseOR(shiftleft(spread16(v2), 1))

  /** Re-layout `df` into `nFiles` write partitions z-ordered on two long
    * columns: rows whose (c1, c2) are close land in the same file, so the
    * written files carry tight min/max envelopes on BOTH columns. Use as
    * the clustering stage of a compaction pass:
    * `ZOrder.clusterBy(landed, "user_id", "ts_bucket", 64).write.parquet(…)`.
    *
    * The range repartition samples z-values to pick balanced bounds (the
    * same mechanism any global sort uses — no skew hotspot when z values
    * cluster); the in-partition sort makes row-group stats tight WITHIN
    * each file too, so predicates prune at row-group grain, not just file
    * grain.
    */
  // --------------------------------------------------------------- q220
  /** Z-ORDER LOCALITY AUDIT — the measurable claim behind [[clusterBy]],
    * expressed relationally so the driver hash-checks the bit math: for a
    * 2-D box predicate (a custkey band × an order-date band), how many of
    * 64 files does the box touch when files are cut along the Morton
    * curve of (custkey, day) versus along custkey alone? The z layout
    * bounds EVERY file's envelope in both dimensions, so the box predicate
    * prunes files on either axis; the 1-D layout cannot prune on the date
    * axis at all and the box smears across every file its custkey band
    * crosses.
    *
    * Exactness: normalization is integer floor division
    * ((v−min)·65535 div (max−min)), the interleave is the shift/mask
    * chain of [[spread16]] (replicated operation-for-operation in the
    * oracle — this is the cross-engine proof that the engine's Morton
    * bits are the standard ones), and file assignment is equi-WIDTH on
    * the code ((z·64) div 2³²) — a pure per-row expression, where a
    * production writer uses sampled range bounds ([[clusterBy]]'s
    * repartitionByRange; equi-height, but not ANSI-replayable). No IEEE
    * op, no window, no sort anywhere.
    *
    * Scale shape: one 4-scalar bounds aggregate broadcast back, then a
    * single narrow per-row pass and two ≤64-group aggregates. The audit
    * is scan-shaped at any corpus size.
    */
  val q220 = QuerySpec(
    "q220_zorder_locality",
    (s, d) => {
      val base = graft.Tables.orders(s, d).select(
        col("o_custkey").cast("long").as("x"),
        expr("CAST(datediff(CAST(o_orderdate AS DATE), DATE '1970-01-01') AS BIGINT)")
          .as("y"))
      val bounds = base.agg(
        min("x").as("mn1"), max("x").as("mx1"),
        min("y").as("mn2"), max("y").as("mx2"))
      val g = base.crossJoin(broadcast(bounds))
        .withColumn("nx",
          expr("CASE WHEN mx1 > mn1 THEN ((x - mn1) * 65535) div (mx1 - mn1) ELSE 0 END"))
        .withColumn("ny",
          expr("CASE WHEN mx2 > mn2 THEN ((y - mn2) * 65535) div (mx2 - mn2) ELSE 0 END"))
        .withColumn("z", morton(col("nx"), col("ny")))
        .withColumn("zfile", expr("(z * 64) div 4294967296"))
        .withColumn("lfile", expr("nx div 1024"))
        .filter(
          expr("x >= mn1 + ((mx1 - mn1) * 45) div 100") &&
          expr("x <= mn1 + ((mx1 - mn1) * 55) div 100") &&
          expr("y >= mn2 + ((mx2 - mn2) * 45) div 100") &&
          expr("y <= mn2 + ((mx2 - mn2) * 55) div 100"))
      // ONE aggregation computes both layouts' file counts (Spark plans
      // the two distincts as a single Expand pass — one scan, one
      // Morton-coding, not two), then the 1-row result unpivots to the
      // two output rows.
      val both = g.agg(count(lit(1)).as("rows_matched"),
        countDistinct(col("zfile")).as("z_files"),
        countDistinct(col("lfile")).as("l_files"))
      both.select(explode(array(
          struct(lit("linear").as("layout"), col("rows_matched"),
            col("l_files").as("files_touched")),
          struct(lit("zorder").as("layout"), col("rows_matched"),
            col("z_files").as("files_touched")))).as("r"))
        .select(col("r.layout"), col("r.rows_matched"), col("r.files_touched"))
        .orderBy("layout")
    },
    Some("""WITH base AS (
              SELECT CAST(o_custkey AS BIGINT) AS x,
                CAST(date_diff('day', DATE '1970-01-01',
                  CAST(o_orderdate AS DATE)) AS BIGINT) AS y
              FROM orders),
            bounds AS (
              SELECT MIN(x) AS mn1, MAX(x) AS mx1,
                     MIN(y) AS mn2, MAX(y) AS mx2 FROM base),
            nrm AS (
              SELECT
                CASE WHEN mx1 > mn1
                  THEN ((x - mn1) * 65535) // (mx1 - mn1) ELSE 0 END AS nx,
                CASE WHEN mx2 > mn2
                  THEN ((y - mn2) * 65535) // (mx2 - mn2) ELSE 0 END AS ny,
                x, y, mn1, mx1, mn2, mx2
              FROM base CROSS JOIN bounds),
            s1 AS (
              SELECT *,
                (nx | (nx << 8)) & 16711935 AS a1,
                (ny | (ny << 8)) & 16711935 AS a2
              FROM nrm),
            s2 AS (SELECT *, (a1 | (a1 << 4)) & 252645135 AS b1,
                             (a2 | (a2 << 4)) & 252645135 AS b2 FROM s1),
            s3 AS (SELECT *, (b1 | (b1 << 2)) & 858993459 AS c1,
                             (b2 | (b2 << 2)) & 858993459 AS c2 FROM s2),
            s4 AS (SELECT *, (c1 | (c1 << 1)) & 1431655765 AS e1,
                             (c2 | (c2 << 1)) & 1431655765 AS e2 FROM s3),
            coded AS (
              SELECT *, e1 | (e2 << 1) AS z FROM s4),
            boxed AS (
              SELECT (z * 64) // 4294967296 AS zfile, nx // 1024 AS lfile
              FROM coded
              WHERE x >= mn1 + ((mx1 - mn1) * 45) // 100
                AND x <= mn1 + ((mx1 - mn1) * 55) // 100
                AND y >= mn2 + ((mx2 - mn2) * 45) // 100
                AND y <= mn2 + ((mx2 - mn2) * 55) // 100)
            SELECT 'linear' AS layout, CAST(COUNT(*) AS BIGINT) AS rows_matched,
              CAST(COUNT(DISTINCT lfile) AS BIGINT) AS files_touched FROM boxed
            UNION ALL
            SELECT 'zorder', CAST(COUNT(*) AS BIGINT),
              CAST(COUNT(DISTINCT zfile) AS BIGINT) FROM boxed
            ORDER BY layout""")
  )

  val all: Seq[graft.QuerySpec] = Seq(q220)

  def clusterBy(df: DataFrame, col1: String, col2: String, nFiles: Int): DataFrame = {
    val bounds = df.agg(
      min(col(col1)).cast("long").as("__mn1"), max(col(col1)).cast("long").as("__mx1"),
      min(col(col2)).cast("long").as("__mn2"), max(col(col2)).cast("long").as("__mx2"))
    df.crossJoin(broadcast(bounds))
      .withColumn("__z", morton(
        norm16(col(col1).cast("long"), col("__mn1"), col("__mx1")),
        norm16(col(col2).cast("long"), col("__mn2"), col("__mx2"))))
      .repartitionByRange(nFiles, col("__z"))
      .sortWithinPartitions("__z")
      .drop("__mn1", "__mx1", "__mn2", "__mx2", "__z")
  }
}
