package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.expressions.WindowSpec
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, DoubleType}

/** Determinism helpers shared by the query inventory.
  *
  * The driver hash-compares Spark output against DuckDB, so floating-point
  * aggregates must be *bit-identical*, not merely close. Plain `sum(double)`
  * is order-dependent (Spark sums per-partition in arbitrary order; DuckDB
  * sums in its own order), so any double aggregate is computed over an exact
  * `DECIMAL(30,10)` widening — decimal addition is associative and exact —
  * then rounded to 2 decimals and cast back to double. The DuckDB oracle SQL
  * uses the literal same formula:
  *
  *   dsum:  CAST(ROUND(SUM(CAST(x AS DECIMAL(30,10))), 2) AS DOUBLE)
  *   davg:  ROUND(CAST(SUM(CAST(x AS DECIMAL(30,10))) AS DOUBLE) / COUNT(*), 2)
  *
  * (For averages the final division is done in IEEE double on both engines —
  * identical operands, identical op, identical result.)
  *
  * At scale this costs one widened decimal per aggregate buffer — still a
  * map-side partial aggregate, no extra shuffle.
  */
object Ops {
  val Dec: DecimalType = DecimalType(30, 10)

  /** Exact decimal sum, rounded to 2 decimals, as double. */
  def dsum(c: Column): Column = round(sum(c.cast(Dec)), 2).cast(DoubleType)

  /** Truncate a double expression to `digits` decimals via scaled floor.
    * `round(double)` is NOT engine-portable: Spark rounds the shortest
    * decimal string of the double (BigDecimal.valueOf → 4.725 → 4.73)
    * while DuckDB rounds the binary value (4.7249999… → 4.72). Scaled
    * floor is a pure IEEE op sequence — identical everywhere. DuckDB
    * equivalent: CAST(FLOOR(x * 1eN) AS DOUBLE) / 1eN.
    */
  def ffloor(c: Column, digits: Int): Column = {
    val p = math.pow(10, digits)
    floor(c * lit(p)).cast(DoubleType) / lit(p)
  }

  /** Exact-sum average truncated to 2 decimals (double division last). */
  def davg(c: Column): Column =
    ffloor(sum(c.cast(Dec)).cast(DoubleType) / count(lit(1)), 2)

  /** Exact decimal sum over a window frame, rounded, as double. */
  def dsumOver(c: Column, w: WindowSpec): Column =
    round(sum(c.cast(Dec)).over(w), 2).cast(DoubleType)

  /** ASCII-only case folding via char translation. Full-Unicode `lower()`
    * is library-dependent (JDK folds İ to "i"+combining-dot, utf8proc to
    * "i") — content-addressed fingerprints, dedup keys, and token stats
    * must be bit-stable across engines and runtimes, so text pipelines
    * fold ASCII only. DuckDB equivalent:
    * translate(x, 'ABCDEFGHIJKLMNOPQRSTUVWXYZ', 'abcdefghijklmnopqrstuvwxyz').
    */
  val AsciiUpper: String = ('A' to 'Z').mkString
  val AsciiLower: String = ('a' to 'z').mkString
  def asciiLower(c: Column): Column = translate(c, AsciiUpper, AsciiLower)

  /** The DuckDB-side spelling of [[asciiLower]]. */
  def asciiLowerSql(expr: String): String =
    s"translate($expr, '$AsciiUpper', '$AsciiLower')"

  /** Fan a CPU-dense pipeline out to session parallelism when the source
    * scan cannot supply it. Parquet splits at row-group boundaries, so a
    * small single-row-group file yields ONE input partition no matter what
    * `files.maxPartitionBytes` says — and an expensive per-row projection
    * sitting directly on such a scan (JSON path extraction, sketch
    * updates, wide Expand) runs single-threaded.
    *
    * Scale-safe by construction: the repartition is inserted only when the
    * scan has fewer files than the configured shuffle width. A production
    * corpus arrives in hundreds of splits → this is a no-op passthrough
    * (no shuffle); the check reads only file metadata (no job).
    *
    * `keys` (round-15, guide §2.4 "two operations keyed the same way can
    * share one exchange"): when the immediate downstream is keyed — every
    * shingle pipeline window-partitions the token stream by doc_id — a
    * KEYED repartition hash-partitions on that key instead of round-robin,
    * so (a) the downstream Window/aggregate finds its required
    * ClusteredDistribution already satisfied and inserts NO second
    * exchange (measured: the round-robin form exchanged the post-explode
    * token stream a second time), and (b) the keyless form's
    * sort-before-repartition local sort of the whole input
    * (SPARK-23207 retry determinism) disappears — hash routing is already
    * deterministic per row. Results are unchanged either way: partitioning
    * affects placement only, proven registry-wide by the 7-way/32-way
    * layout sweep.
    *
    * `keys` must be HIGH-CARDINALITY relative to the shuffle width
    * (round-15 ADVICE): the keyed form bounds parallelism by distinct-key
    * count and hash spread, not round-robin's even row split — doc_id
    * over a corpus qualifies by many orders of magnitude, but a
    * low-cardinality key (source, lang, a date) would silently collapse
    * the fan-out this operator promises; such callers should pass no
    * keys and let the downstream exchange re-key.
    */
  def fanOut(df: org.apache.spark.sql.DataFrame,
             keys: Column*): org.apache.spark.sql.DataFrame = {
    val target = df.sparkSession.sessionState.conf.numShufflePartitions
    if (df.inputFiles.length >= target) df
    else if (keys.nonEmpty) df.repartition(target, keys: _*)
    else df.repartition(target)
  }

  /** The skew guard shared by every candidate-generation operator (shingle
    * doc-frequency cap, LSH bucket cap, fingerprint frequency cap): drop
    * rows whose key occurs more than `maxFreq` times. Without it, one
    * stop-phrase / degenerate bucket makes the downstream candidate
    * equi-join quadratic at corpus scale. The window's shuffle key is the
    * same key the join shuffles on, so the cap rides partitioning the
    * join needs anyway.
    */
  def capKeyFreq(df: org.apache.spark.sql.DataFrame, maxFreq: Int,
                 keys: Column*): org.apache.spark.sql.DataFrame = {
    val w = org.apache.spark.sql.expressions.Window.partitionBy(keys: _*)
    df.withColumn("__keyfreq", count(lit(1)).over(w))
      .filter(col("__keyfreq") <= maxFreq)
      .drop("__keyfreq")
  }
}
