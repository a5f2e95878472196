package graft.llmops

import graft.{QuerySpec, Tables}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.operators.Ops.{asciiLower, asciiLowerSql, fanOut}

/** Persisted COUNT–MIN SKETCH store — approximate per-key COUNTS in fixed
  * space, completing the sketch-store algebra family:
  *
  *   - [[BloomStore]]  membership, OR-merge  (idempotent → no epoch guard)
  *   - CMSStore        counts,     SUM-merge (associative/commutative but
  *                                 NOT idempotent → epoch guard, like
  *                                 [[TopKStore]]'s MG counters)
  *   - [[CardinalityStore]] distinct counts, MAX-merge (idempotent HLL)
  *
  * Geometry: d = 4 hash rows × w = 1024 counters; row j of key g indexes
  * `hex(md5(g)[8j+1 .. 8j+8]) mod w` — the same partition-the-digest
  * scheme as [[BloomStore]], so the ENTIRE counter table is
  * DuckDB-replayable and the driver hash-checks estimates as VALUES, not
  * invariant booleans ([[q231]]); the one-sided guarantee est ≥ true is
  * structural (every update lands on the counter), and the standard
  * error bound is overcount ≤ 2N/w per row with prob ≥ 1/2 per row,
  * so the min over 4 independent rows concentrates hard.
  *
  * Store layout: `state/counters.parquet` (row_idx, counter_idx, cnt)
  * ≤ d·w rows; `state/meta.parquet` (n_total, last_epoch) — both files
  * committed as ONE atomic [[StoreCommit]] directory rename (a torn
  * counters-without-meta commit would let an at-least-once replay pass
  * the epoch guard and double-count); epoch-guarded `update` (the
  * `foreachBatch` contract — a replayed batch would double-count).
  *
  * Scale shape: inserts are O(d · batch vocab) narrow expressions + one
  * (row, counter)-keyed aggregate; estimates are d keyed lookups + a
  * min; the counter table is KBs here and stays ≤ d·w at any corpus
  * size — the lake is never rescanned.
  */
object CMSStore {

  val Depth = 4
  val Width = 1024

  /** Per-term exact counts of a batch (vocab-bounded). */
  private[llmops] def termCounts(docs: DataFrame): DataFrame =
    fanOut(docs)
      .select(explode(split(asciiLower(col("text")), " ")).as("term"))
      .filter(col("term") =!= "")
      .groupBy("term").agg(count(lit(1)).as("c"))

  /** (row_idx, counter_idx, cnt) sketch table for a (term, c) table. */
  private[llmops] def sketchTable(counts: DataFrame): DataFrame =
    counts.select(col("c"),
        explode(array((0 until Depth).map(j => struct(
          lit(j).as("row_idx"),
          (conv(substring(md5(col("term")), 1 + 8 * j, 8), 16, 10)
            .cast("long") % Width).as("counter_idx"))): _*)).as("p"))
      .select(col("p.row_idx"), col("p.counter_idx"), col("c"))
      .groupBy("row_idx", "counter_idx")
      .agg(sum("c").cast("long").as("cnt"))

  /** Committed counter table (rolls forward a crashed commit first). */
  def counters(spark: SparkSession, dir: String): DataFrame =
    spark.read.parquet(s"${StoreCommit.resolve(spark, dir)}/counters.parquet")

  /** The counter table the store WOULD hold after `batch`: stored + batch
    * sketches, summed per cell. O(d·w + d·batch vocab).
    */
  def updatedCounters(spark: SparkSession, dir: String, batch: DataFrame): DataFrame =
    counters(spark, dir)
      .unionByName(sketchTable(termCounts(batch)))
      .groupBy("row_idx", "counter_idx")
      .agg(sum("cnt").cast("long").as("cnt"))

  def build(docs: DataFrame, dir: String): Unit = {
    val spark = docs.sparkSession
    val stage = StoreCommit.stagePath(dir)
    sketchTable(termCounts(docs))
      .write.mode("overwrite").parquet(s"$stage/counters.parquet")
    spark.createDataFrame(Seq((tokenTotal(docs), -1L)))
      .toDF("n_total", "last_epoch")
      .write.mode("overwrite").parquet(s"$stage/meta.parquet")
    StoreCommit.commit(spark, dir)
  }

  private def tokenTotal(docs: DataFrame): Long =
    termCounts(docs).agg(sum("c")).collect()(0) match {
      case r if r.isNullAt(0) => 0L
      case r => r.getLong(0)
    }

  /** Committing increment with the [[TopKStore]] epoch guard: SUM-merge
    * is not idempotent, so a batch with epoch ≤ last_epoch is a no-op.
    * counters+meta commit as ONE [[StoreCommit]] directory rename, so a
    * crash can never land counters including the batch next to a stale
    * `last_epoch` (the torn-commit double-count hazard).
    */
  def update(spark: SparkSession, dir: String, batch: DataFrame,
             epoch: Long = -1L): Unit = {
    val state = StoreCommit.resolve(spark, dir)
    val meta = spark.read.parquet(s"$state/meta.parquet").collect()(0)
    val (nTotal, lastEpoch) = (meta.getLong(0), meta.getLong(1))
    if (epoch >= 0 && epoch <= lastEpoch) return
    val stage = StoreCommit.stagePath(dir)
    updatedCounters(spark, dir, batch)
      .write.mode("overwrite").parquet(s"$stage/counters.parquet")
    spark.createDataFrame(Seq((nTotal + tokenTotal(batch),
        if (epoch >= 0) epoch else lastEpoch)))
      .toDF("n_total", "last_epoch")
      .write.mode("overwrite").parquet(s"$stage/meta.parquet")
    StoreCommit.commit(spark, dir)
  }

  /** Point-count estimates for `keys` (column `term`): min over the d
    * row counters (missing cell → 0). The counter table is broadcast
    * (≤ d·w rows).
    */
  def estimate(spark: SparkSession, dir: String, keys: DataFrame): DataFrame =
    estimateAgainst(keys, counters(spark, dir))

  private[llmops] def estimateAgainst(keys: DataFrame, counters: DataFrame): DataFrame =
    keys.select(col("term"),
        explode(array((0 until Depth).map(j => struct(
          lit(j).as("row_idx"),
          (conv(substring(md5(col("term")), 1 + 8 * j, 8), 16, 10)
            .cast("long") % Width).as("counter_idx"))): _*)).as("p"))
      .select(col("term"), col("p.row_idx"), col("p.counter_idx"))
      .join(broadcast(counters), Seq("row_idx", "counter_idx"), "left")
      .groupBy("term")
      .agg(min(coalesce(col("cnt"), lit(0L))).as("est"))

  /** STREAMING twin — epoch-guarded `foreachBatch` merge (at-least-once
    * replay safe through the guard, not the algebra).
    */
  def stream(docs: DataFrame, dir: String): org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row] =
    docs.writeStream
      .foreachBatch { (batch: DataFrame, epoch: Long) =>
        if (!batch.isEmpty) update(batch.sparkSession, dir, batch, epoch)
      }

  // ------------------------------------------------------------- store dir
  private val builtFor = scala.collection.concurrent.TrieMap.empty[String, String]
  private def storeDir(s: SparkSession, d: String): String =
    builtFor.getOrElseUpdate(d, {
      val dir = graft.core.TempDirs.scratch("graft-cmsstore-")
      build(Tables.documents(s, d).filter(col("doc_id") % 2 === 0), dir)
      dir
    })

  private def toksCte: String = s"""toks AS (
              SELECT doc_id, t.term FROM documents,
                unnest(string_split(${asciiLowerSql("text")}, ' ')) AS t(term)
              WHERE t.term <> '')"""

  private def sketchSql(countsCte: String): String =
    s"""SELECT j.j AS row_idx,
          CAST(('0x' || substr(md5(term), 1 + 8 * j.j, 8)) AS BIGINT)
            % $Width AS counter_idx,
          CAST(SUM(c) AS BIGINT) AS cnt
        FROM $countsCte CROSS JOIN (SELECT unnest(range(0, $Depth)) AS j) j
        GROUP BY 1, 2"""

  // --------------------------------------------------------------- q231
  /** CMS CONSTRUCTION + point-query audit — the q212/q221 "oracle the
    * STATE" discipline for the count sketch: DuckDB rebuilds the full
    * d×w counter table from the same md5 arithmetic and replays the
    * min-over-rows estimate for the corpus's top-20 exact terms, so the
    * driver hash-checks the ESTIMATES as values (est, overcount) — a
    * wrong slice, a lost cell, or a broken min turns a number, not a
    * boolean. est ≥ true is structural (every occurrence lands in every
    * row); the overcount column shows the collision mass at this
    * 1024-counter geometry.
    */
  val q231 = QuerySpec(
    "q231_cms_audit",
    (s, d) => {
      val counts = graft.core.Materialize(
        termCounts(Tables.documents(s, d)))
      val sketch = sketchTable(counts)
      val top = counts.orderBy(col("c").desc, col("term")).limit(20)
      estimateAgainst(top.select("term"), sketch)
        .join(top, "term")
        .select(col("term"), col("c").as("exact_c"), col("est").as("est_c"),
          (col("est") - col("c")).as("overcount"),
          (col("est") >= col("c")).as("one_sided_ok"))
        .orderBy(col("exact_c").desc, col("term"))
    },
    Some(s"""WITH $toksCte,
            counts AS (SELECT term, CAST(COUNT(*) AS BIGINT) AS c
                       FROM toks GROUP BY 1),
            sketch AS (${sketchSql("counts")}),
            top AS (SELECT term, c FROM counts ORDER BY c DESC, term LIMIT 20),
            probes AS (
              SELECT t.term, t.c, j.j AS row_idx,
                CAST(('0x' || substr(md5(t.term), 1 + 8 * j.j, 8)) AS BIGINT)
                  % $Width AS counter_idx
              FROM top t CROSS JOIN (SELECT unnest(range(0, $Depth)) AS j) j),
            est AS (
              SELECT p.term, MAX(p.c) AS c,
                CAST(MIN(COALESCE(s.cnt, 0)) AS BIGINT) AS est
              FROM probes p
              LEFT JOIN sketch s ON s.row_idx = p.row_idx
                AND s.counter_idx = p.counter_idx
              GROUP BY p.term)
            SELECT term, c AS exact_c, est AS est_c, est - c AS overcount,
              est >= c AS one_sided_ok
            FROM est ORDER BY exact_c DESC, term""")
  )

  // --------------------------------------------------------------- q232
  /** Warm-increment CMS STORE audit — [[q222]]'s shape for the additive
    * sketch: the store holds the even-doc sketch, odd docs land as the
    * increment, and DuckDB rebuilds the full-corpus sketch COLD, which
    * must match cell-for-cell because SUM-merge is associative and
    * commutative over the disjoint batches (idempotence it does NOT
    * have — that is what the epoch guard is for, and CMSStoreSpec
    * proves the replayed-epoch no-op).
    */
  val q232 = QuerySpec(
    "q232_cms_store_audit",
    (s, d) => {
      val warm = updatedCounters(s, storeDir(s, d),
        Tables.documents(s, d).filter(col("doc_id") % 2 === 1))
      warm.orderBy("row_idx", "counter_idx")
    },
    Some(s"""WITH $toksCte,
            counts AS (SELECT term, CAST(COUNT(*) AS BIGINT) AS c
                       FROM toks GROUP BY 1),
            sketch AS (${sketchSql("counts")})
            SELECT row_idx, counter_idx, cnt FROM sketch
            ORDER BY row_idx, counter_idx""")
  )

  val all: Seq[QuerySpec] = Seq(q231, q232)
}
