package graft.operators

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
